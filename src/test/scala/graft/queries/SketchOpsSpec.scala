package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Sketch-tier contract tests: every estimator recomputed in straight-line
  * Scala on the real sf0.001 corpus (Count-Min counters, KMV bottom-k
  * boundaries, DLT priorities), plus the defining theorems — CMS never
  * underestimates; KMV merge ≡ direct; every sampled priority clears τ. */
class SketchOpsSpec extends SparkSpec {

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u32(x: String): Long = java.lang.Long.parseLong(md5hex(x).take(8), 16)
  private def u24(x: String): Long = java.lang.Long.parseLong(md5hex(x).take(6), 16)

  private def trigrams(text: String): Seq[String] = {
    val w = Option(text).getOrElse("").split(" ", -1)
    if (w.length < 3) Seq.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
  }

  private def docs(dir: String): Seq[(Option[Long], String, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text", "source").collect().toSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) "" else r.getString(2)))

  test("cms_topk_audit ≡ plain-Scala sketch; CMS never underestimates") {
    val dir = "/root/testdata/sf0.001"
    val stream = docs(dir).flatMap(d => trigrams(d._2))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (g <- stream; i <- 0 until SketchOps.cmsDepth) {
      val k = (i, u32(s"$i:$g") % SketchOps.cmsWidth)
      cells(k) = cells.getOrElse(k, 0L) + 1L
    }
    val topk = exact.toSeq.sortBy { case (g, c) => (-c, g) }
      .take(SketchOps.cmsTopK)
    val expected = topk.map { case (g, c) =>
      val est = (0 until SketchOps.cmsDepth)
        .map(i => cells((i, u32(s"$i:$g") % SketchOps.cmsWidth))).min
      g -> ((c, est, est - c, est >= c))
    }.toMap
    val got = SparkEntry.queries("cms_topk_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got == expected)
    assert(got.values.forall(_._4), "CMS one-sided error law violated")
    assert(got.size == SketchOps.cmsTopK)
  }

  test("kmv audits ≡ plain-Scala bottom-k; merge law holds") {
    val dir = "/root/testdata/sf0.001"
    val bySource = docs(dir)
      .flatMap(d => trigrams(d._2).map(g => (d._3, g))).distinct
    def est(n: Long, hk: Long): Long =
      if (n <= SketchOps.kmvK) n
      else (SketchOps.kmvK - 1) * SketchOps.kmvDomain / hk
    val expected = bySource.groupBy(_._1).map { case (src, gs) =>
      val hs = gs.map(g => (u32(g._2), g._2)).sorted
      val n = hs.size.toLong
      val hk = if (n >= SketchOps.kmvK) Some(hs(SketchOps.kmvK - 1)._1) else None
      src -> ((n, hk, Some(est(n, hk.getOrElse(1L)))))
    }
    val got = SparkEntry.queries("kmv_distinct_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got == expected)

    // merge law: union of per-source bottom-k re-sketched == direct sketch
    val allGrams = bySource.map(_._2).distinct.map(g => (u32(g), g)).sorted
    val direct = allGrams.take(SketchOps.kmvK)
    val mergedPool = bySource.groupBy(_._1).values.flatMap(gs =>
      gs.map(g => (u32(g._2), g._2)).sorted.take(SketchOps.kmvK))
      .toSeq.distinct.sorted
    val merged = mergedPool.take(SketchOps.kmvK)
    assert(direct == merged, "JVM merge law recount")
    val mrow = SparkEntry.queries("kmv_merge_audit")(spark, dir)
      .collect().head
    assert(mrow.getLong(0) == allGrams.size.toLong)
    assert(mrow.getLong(1) == est(allGrams.size.toLong, direct.last._1))
    assert(mrow.getLong(1) == mrow.getLong(2))
    assert(mrow.getBoolean(3), "merge_exact must be structurally true")
  }

  test("priority_sample_audit ≡ plain-Scala DLT; sampled priorities clear τ") {
    val dir = "/root/testdata/sf0.001"
    val d = docs(dir).collect { case (Some(id), text, src) =>
      val w = Option(text).getOrElse("").split(" ", -1)
        .count(_.nonEmpty).toLong
      val u = u24(id.toString) + 1L
      (src, id, w, w * SketchOps.prioScale / u)
    }
    val expected = d.groupBy(_._1).map { case (src, rows) =>
      val ranked = rows.sortBy { case (_, id, _, p) => (-p, id) }
      val sample = ranked.take(SketchOps.prioK)
      val tau = if (ranked.size > SketchOps.prioK)
        ranked(SketchOps.prioK)._4 else 0L
      val exact = rows.map(_._3).sum
      val estT = sample.map(r => math.max(r._3, tau)).sum
      src -> ((rows.size.toLong, exact, sample.size.toLong, tau, estT,
        if (exact > 0) Some(1000L * estT / exact) else None))
    }
    val got = SparkEntry.queries("priority_sample_audit")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    assert(got == expected.toMap)
    // τ theorem: every sampled doc's priority ≥ its source's τ
    d.groupBy(_._1).foreach { case (_, rows) =>
      val ranked = rows.sortBy { case (_, id, _, p) => (-p, id) }
      if (ranked.size > SketchOps.prioK) {
        val tau = ranked(SketchOps.prioK)._4
        assert(ranked.take(SketchOps.prioK).forall(_._4 >= tau))
      }
    }
  }
}
