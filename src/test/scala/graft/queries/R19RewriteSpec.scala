package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Focused pins for the round-19 internal rewrites — each test asserts a
  * THEOREM of the rewritten operator on real testdata, so a botched
  * physical restructure (the HOF descent, the fused CELF action, the
  * split sketch aggregate, the trainer argmax+fold fusion) fails here
  * even before the cross-engine oracle gate runs.
  *
  *  - cms_rank_*: the dyadic-CMS one-sided laws (point queries never
  *    underestimate ⇒ rank_ok; dominating estimates stop the descent no
  *    later ⇒ v_ok; per-source cells sum to the corpus cells ⇒
  *    merge_exact). The descent/estimate moved from 16 chained codegen
  *    projections (which blew the 64 KB method limit) to one aggregate()
  *    HOF — these laws hold only if the HOF replays the identical probe
  *    math.
  *  - coverage_greedy_rounds: submodularity of the marginal gains (the
  *    CELF correctness theorem) plus the running-sum/coverage columns —
  *    the argmax, stale bound and skippable count now come out of ONE
  *    fused action.
  *  - approx_sketches: the sketch-vs-exact bound booleans, now that the
  *    exact-distinct leg is a separate aggregate joined back.
  *  - wordpiece/bpe trainers: definitional per-round invariants of the
  *    merge table, now read back from the fused fold checkpoint instead
  *    of a separate take(1). bpe pair counts are non-increasing across
  *    rounds (a merge never creates a more frequent pair than the one
  *    it consumed — the argmax maximum is monotone under BPE merges).
  */
class R19RewriteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()

  test("cms_rank_audit: HOF descent + estimate satisfy both one-sided laws") {
    val rows = run("cms_rank_audit")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("v_ok"), s"v_ok violated: $r")
      assert(r.getAs[Boolean]("rank_ok"), s"rank_ok violated: $r")
      assert(r.getAs[Long]("rank_over") >= 0L, s"negative overestimate: $r")
    }
  }

  test("cms_rank_merge_audit: per-source cells merge exactly; laws hold") {
    val rows = run("cms_rank_merge_audit")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("merge_exact"), s"merge law violated: $r")
      assert(r.getAs[Boolean]("v_ok"), s"v_ok violated: $r")
      assert(r.getAs[Boolean]("rank_ok"), s"rank_ok violated: $r")
    }
  }

  test("coverage_greedy_rounds: fused CELF action preserves submodularity") {
    val rows = run("coverage_greedy_rounds").sortBy(_.getAs[Long]("round"))
    assert(rows.nonEmpty)
    var cum = 0L
    var prevGain = Long.MaxValue
    rows.foreach { r =>
      val gain = r.getAs[Long]("gain_df")
      assert(gain <= prevGain,
        s"marginal gains must be non-increasing (submodularity): $r")
      prevGain = gain
      cum += gain
      assert(r.getAs[Long]("cum_df") == cum, s"cum_df != running sum: $r")
      assert(r.getAs[Boolean]("bound_ok"), s"CELF bound violated: $r")
      // the stale bound, when present, upper-bounds the fresh gain
      if (!r.isNullAt(r.fieldIndex("bound_df")))
        assert(r.getAs[Long]("bound_df") >= gain, s"stale bound < gain: $r")
    }
  }

  test("approx_sketches: split exact-distinct leg keeps both bounds green") {
    val rows = run("approx_sketches")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_in_bound"), s"HLL out of bound: $r")
      assert(r.getAs[Boolean]("median_in_bound"), s"median out of bound: $r")
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("trainer fusion: wordpiece merge table stays definitionally sound") {
    val rows = run("wordpiece_train_rounds").sortBy(_.getAs[Int]("round"))
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("round") == i + 1, s"round gap: $r")
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
      assert(r.getAs[Long]("pair_count") <= r.getAs[Long]("left_count"),
        s"pair > left marginal: $r")
      assert(r.getAs[Long]("pair_count") <= r.getAs[Long]("right_count"),
        s"pair > right marginal: $r")
      assert(r.getAs[Long]("score_nano") >= 0L)
    }
  }

  test("trainer fusion: bpe top pair counts are non-increasing") {
    val rows = run("bpe_merge_rounds").sortBy(_.getAs[Int]("round"))
    assert(rows.nonEmpty)
    var prev = Long.MaxValue
    rows.foreach { r =>
      val cnt = r.getAs[Long]("pair_count")
      assert(cnt <= prev, s"top pair count increased after a merge: $r")
      prev = cnt
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
    }
  }
}
