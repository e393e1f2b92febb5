package graft.queries

import graft.{SparkEntry, SparkSpec}

/** minhash_band_sweep: monotone cost/recall in the band budget, and the
  * b = 4 point reconciles exactly with lsh_recall_audit's totals (same
  * truth, same banding — the ivf_probe_sweep ↔ ann_recall_audit pin,
  * text edition). */
class BandSweepSpec extends SparkSpec {

  test("sweep is monotone and its full-budget point equals the recall audit") {
    val dir = "/root/testdata/sf0.001"
    val sweep = SparkEntry.queries("minhash_band_sweep")(spark, dir)
      .collect().sortBy(_.getAs[Int]("b"))
    assert(sweep.map(_.getAs[Int]("b")).toSeq == Seq(1, 2, 3, 4))
    val truth = sweep.head.getAs[Long]("n_truth")
    sweep.foreach { r =>
      assert(r.getAs[Long]("n_truth") == truth)
      assert(r.getAs[Long]("n_found") <= truth)
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_cand_pairs") + truth)
    }
    // more bands can only add candidates and hits
    sweep.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_cand_pairs") <= b.getAs[Long]("n_cand_pairs"))
        assert(a.getAs[Long]("n_found") <= b.getAs[Long]("n_found"))
        assert(a.getAs[Long]("recall_milli") <= b.getAs[Long]("recall_milli"))
      case _ =>
    }
    val audit = SparkEntry.queries("lsh_recall_audit")(spark, dir).collect()
    val auditTruth = audit.map(_.getAs[Long]("n_exact")).sum
    val auditFound = audit.map(_.getAs[Long]("n_lsh_hit")).sum
    val b4 = sweep.last
    assert(b4.getAs[Long]("n_truth") == auditTruth, "truth sets differ")
    assert(b4.getAs[Long]("n_found") == auditFound, "full-budget hits differ")
  }
}
