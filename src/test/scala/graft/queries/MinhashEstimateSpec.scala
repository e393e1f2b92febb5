package graft.queries

import graft.{SparkEntry, SparkSpec}

/** minhash_estimate_audit invariants on the real sf0.001 corpus: the
  * estimator-calibration contracts the per-value oracle compare doesn't
  * state (exactness at J = 1, bounded milli ranges, bucket/mean
  * consistency). */
class MinhashEstimateSpec extends SparkSpec {

  test("estimator audit: exact at J=1, bounded elsewhere, buckets coherent") {
    val rows = SparkEntry.queries("minhash_estimate_audit")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "sampled universe must yield candidate pairs")
    rows.foreach { r =>
      val b = r.getAs[Long]("j_bucket")
      val est = r.getAs[Long]("mean_est_milli")
      val ex = r.getAs[Long]("mean_exact_milli")
      val err = r.getAs[Long]("mean_abs_err_milli")
      assert(b >= 0 && b <= 10)
      assert(est >= 0 && est <= 1000)
      assert(ex >= 0 && ex <= 1000)
      // the bucket's mean exact-J must lie in the bucket's own range
      assert(ex >= b * 100 && (b == 10 || ex < (b + 1) * 100))
      // |mean est − mean exact| can never exceed the mean absolute error
      // (+2: the three means floor-divide independently)
      assert(math.abs(est - ex) <= err + 2)
      if (b == 10) {
        // J = 1 pairs have identical word sets → identical signatures:
        // the estimator is structurally exact there
        assert(est == 1000 && err == 0)
      }
      assert(r.getAs[Long]("n_pairs") > 0)
    }
    // the seeded corpus plants exact duplicates in the sample: the audit
    // must observe the J=1 bucket, or the estimator never sees its anchor
    assert(rows.exists(_.getAs[Long]("j_bucket") == 10L))
  }
}
