package graft.queries

import graft.SparkSpec

/** The count-plan-collapse gate (round-18 verdict #6): ProbePlan's
  * join-count comparison, promoted from a diagnostic tool to a failing
  * test.
  *
  * Background (round 17's bench-honesty finding): Catalyst deletes left
  * joins against grouped-by-key relations — and every column feeding
  * them — when no output column is consumed, so a `.count()`-style
  * probe of a classification-shaped query can measure a bare scan (15
  * of the suite's queries collapse to zero joins under count; a 22 s
  * query benched as 2.4 s until Bench switched to full-row
  * evaluation). The failure MODE is recurring, not historical: every
  * new query written against the old "count() forces the work"
  * intuition re-creates it. This spec freezes the known collapsed set;
  * a NEW query whose count-plan collapses fails the suite until its
  * author either consumes the join's columns or adds it here
  * deliberately — acknowledging that count-based probes of it measure
  * nothing.
  *
  * The allowlist is intentionally a SUBSET check: entries that stop
  * collapsing (a plan improvement) don't fail the gate; entries that
  * start do. */
class ProbePlanGateSpec extends SparkSpec {

  /** Queries whose count-plan is KNOWN to lose every join (probed at
    * sf0.001, round 18). All are honest plans for their real consumers
    * — the collapse only afflicts actions that consume no columns.
    *
    * The three `*_recall/quality_audit` entries joined the set in round
    * 18 when their shared brute-truth relation ([[SimilarityOps]]'
    * `knnBruteCosine`) became session-cached: the 50-row ground truth
    * now enters their plans as an InMemoryRelation leaf, and with no
    * output column consumed Catalyst deletes the reconciliation joins
    * above it exactly as it does for the grouped-by-key cases below.
    * Deliberate allowlist, not a fix-needed: Bench's full-row rule (the
    * bit_xor(xxhash64(...)) action) consumes every column, so the
    * measured plans keep all joins — only count()-style probes of these
    * three measure a bare cache scan. */
  private val knownCollapsed = Set(
    "ann_graph_delete_audit",
    "ann_graph_insert_audit",
    "ann_recall_audit",
    "asof_snapshot",
    "countsketch_depth_sweep",
    "decontaminate_bloom",
    "decontaminate_minhash",
    "decontaminate_ngrams",
    "dup_span_incremental",
    "export_manifest_drift",
    "line_dedup",
    "ngram_novelty",
    "range_join_count",
    "retrieval_quality_audit",
    "semantic_dedup",
    "sq8_recall_audit",
    "text_repetition",
    "triangle_count")

  test("no NEW query collapses to zero joins under a count() action") {
    val dir = "/root/testdata/sf0.001"
    val collapsed = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap {
      name =>
        val (full, cnt) =
          graft.tools.ProbePlan.joinCounts(spark, dir, name)
        if (full > 0 && cnt == 0) Some(name) else None
    }
    val fresh = collapsed.filterNot(knownCollapsed)
    assert(fresh.isEmpty,
      s"NEW count-plan-collapsed queries: ${fresh.mkString(", ")} — " +
        "count()-based probes of these measure a bare scan; consume " +
        "the join columns or add to the allowlist DELIBERATELY " +
        "(see ProbePlanGateSpec scaladoc)")
    // the gate must still be observing the phenomenon it guards
    assert(collapsed.nonEmpty,
      "zero collapsed queries — if Catalyst stopped deleting unconsumed " +
        "joins, retire this gate and the Bench full-row rule note")
  }
}
