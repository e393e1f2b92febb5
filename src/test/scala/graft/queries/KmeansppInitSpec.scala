package graft.queries

import graft.{SparkEntry, SparkSpec}

/** k-means|| init contract: the oversampling rounds replayed in
  * straight-line Scala on the real sf0.001 embeddings — seed choice,
  * exact int64 distances, the integer sampling predicate, and the
  * deterministic φ-descent law. */
class KmeansppInitSpec extends SparkSpec {

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u32(x: String): Long =
    java.lang.Long.parseLong(md5hex(x).take(8), 16)

  test("kmeanspp_init_audit ≡ plain-Scala k-means|| rounds; φ descends; " +
    "chosen centers never resample") {
    val dir = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(round(cast(x as double) * 1000, 0) as long)) AS q")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .map { case (id, q) => (id, q, q.map(x => x * x).sum) }
      .filter(_._3 > 0L)
      .sortBy(_._1)
    def d2(q: Array[Long], nrm: Long, c: (Long, Array[Long], Long)): Long =
      nrm - 2L * q.zip(c._2).map { case (a, b) => a * b }.sum + c._3
    val c0 = base.minBy { case (id, _, _) => (u32(s"kpp0:$id"), id) }
    var cents = Vector(c0)
    val expected = scala.collection.mutable.Buffer.empty[
      (Long, Long, Option[Long], Option[Long], Boolean)]
    var prevPhi: Option[Long] = None
    for (r <- 0 to SimilarityOps.kppRounds) {
      val dmin = base.map { case (id, q, nrm) =>
        id -> cents.map(c => d2(q, nrm, c)).min }.toMap
      val phi = if (base.isEmpty) None else Some(dmin.values.sum)
      val sampled = if (r < SimilarityOps.kppRounds)
        Some(base.filter { case (id, _, _) =>
          phi.exists(p => p > 0 &&
            u32(s"kpp${r + 1}:$id") <
              SimilarityOps.kppEll * dmin(id) * 4294967296L / p)
        })
      else None
      expected += ((r.toLong, cents.size.toLong, phi,
        sampled.map(_.length.toLong),
        prevPhi.forall(pp => phi.exists(_ <= pp))))
      // an existing center has d² = 0 so the predicate can never fire
      sampled.foreach(sel =>
        assert(sel.map(_._1).toSet.intersect(cents.map(_._1).toSet).isEmpty))
      sampled.foreach(sel => cents = cents ++ sel)
      prevPhi = phi
    }
    val got = SparkEntry.queries("kmeanspp_init_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4))).toSeq
    assert(got == expected.toSeq)
    // the audit really grows the center set (≈ℓ per round in expectation)
    assert(got.last._2 > 1L)
    // φ-descent law on every row
    assert(got.forall(_._5))
  }
}
