package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Full-surface physical-plan guard: a TRUE cartesian product (both sides
  * unbounded — CartesianProductExec) must never appear in any query's
  * plan. Every intentional crossJoin in the suite is a one-row/bounded
  * scalar against `broadcast(...)`, which plans as
  * BroadcastNestedLoopJoin — allowed. This pins the invariant the
  * per-round plan audits check by hand, for every query at once, so a
  * future edit that drops a broadcast hint (or re-derives a join key into
  * non-equi form) fails CI instead of surfacing as a 100× blowup in
  * SCALECHECK.
  *
  * Known limits (review finding): construction is planning-only for the
  * declarative queries, but the trainer-backed ones (bpe_*,
  * tokenizer_fertility via the BPE cache, kmeans_train_rounds) RUN their
  * driver loops at construction — this sweep therefore also costs their
  * (session-cached, sf0.001-sized) training time — and for those the
  * final plan is a local relation of collected rows, so their per-round
  * INNER plans are not inspectable here; the scalar broadcasts inside
  * those loops are covered by their own specs' runtimes instead (a
  * cartesian there would blow the suite's time budget loudly). */
class PlanGuardSpec extends SparkSpec {

  test("no query plans CartesianProductExec (full surface, sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // executedPlan forces full planning (join strategy selection)
        // without running a job; under AQE the wrapper's toString renders
        // the current inner physical tree, which is what explain shows
        val planStr = fn(spark, dir).queryExecution.executedPlan.toString
        if (planStr.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products planned in: $offenders")
  }
}
