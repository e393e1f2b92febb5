package graft.queries

import graft.{SparkEntry, SparkSpec}

/** `ann_recall_audit` must agree with an independent intersection of the
  * two component queries it audits: per query vector, n_hits equals
  * |brute top-5 ∩ IVF result| recomputed from the component outputs, and
  * recall_milli is exactly n_hits × 200. On the real corpus the audit
  * must also show the trade is real but bounded — aggregate recall
  * strictly above 500‰ (probe-2 finds most true neighbors), with every
  * per-query value in [0, 1000]. */
class AnnRecallAuditSpec extends SparkSpec {

  test("audit matches an independent intersection of brute and IVF (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val brute = SparkEntry.queries("knn_brute_cosine")(spark, dir).collect()
      .filter(_.getAs[Int]("rk") <= 5)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val ivf = SparkEntry.queries("ann_ivf_cosine")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val expect = brute.groupBy(_._1).map { case (q, ns) =>
      q -> ns.count(ivf.contains).toLong
    }

    val got = SparkEntry.queries("ann_recall_audit")(spark, dir).collect()
    assert(got.map(_.getAs[Long]("query_id")).toSet == expect.keySet)
    got.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val hits = r.getAs[Long]("n_hits")
      assert(hits == expect(q), s"query $q")
      assert(r.getAs[Long]("recall_milli") == hits * 200)
      assert(hits >= 0 && hits <= 5)
    }
    // probe-2 IVF must find most true neighbors on the real corpus
    val totalMilli = got.map(_.getAs[Long]("n_hits")).sum * 200 / got.length
    assert(totalMilli > 500, s"aggregate recall $totalMilli too low")
  }
}
