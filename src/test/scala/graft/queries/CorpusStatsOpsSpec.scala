package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Corpus-statistics contract tests: Good–Turing class masses and the
  * Heaps growth curve recomputed in straight-line Scala on the real
  * sf0.001 corpus, plus the structural laws — GT/actual milli columns
  * NULL-guard on empty halves, the growth curve is non-decreasing, and
  * the OLS fit equals the shared JVM twin bit-for-bit. */
class CorpusStatsOpsSpec extends SparkSpec {

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u32(x: String): Long =
    java.lang.Long.parseLong(md5hex(x).take(8), 16)

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

  test("good_turing_audit ≡ plain-Scala class masses; prediction and " +
    "actual are exact milli-fractions of the halves") {
    val dir = "/root/testdata/sf0.001"
    val d = docs(dir)
    def heldCoin(id: Option[Long]): Long =
      id.map(i => u32(i.toString) % 2L).getOrElse(0L)
    val byGram = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((id, text, _) <- d; g <- trigrams(text)) {
      val (tr, he) = byGram.getOrElse(g, (0L, 0L))
      if (heldCoin(id) == 0L) byGram(g) = (tr + 1L, he)
      else byGram(g) = (tr, he + 1L)
    }
    val n = byGram.values.map(_._1).sum
    val h = byGram.values.map(_._2).sum
    val expected = (0L to CorpusStatsOps.gtMaxR).map { r =>
      val cls = byGram.values.filter(_._1 == r)
      val np1 = byGram.values.count(_._1 == r + 1).toLong
      val mHeld = cls.map(_._2).sum
      r -> ((cls.size.toLong, mHeld,
        if (n > 0) Some(1000L * (r + 1) * np1 / n) else None,
        if (h > 0) Some(1000L * mHeld / h) else None, n, h))
    }.toMap
    val got = SparkEntry.queries("good_turing_audit")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected)
    assert(got.size == CorpusStatsOps.gtMaxR + 1)
    // both halves are non-trivially populated on the real corpus, so the
    // audit really is a held-out measurement, not a degenerate one
    assert(n > 0 && h > 0)
    // class masses are disjoint: total actual mass across all classes
    // plus the unaudited tail equals 1000 within truncation
    val audited = got.values.flatMap(_._4).sum
    assert(audited <= 1000L)
  }

  test("heaps_law_audit ≡ plain-Scala growth curve; curve non-decreasing;" +
    " OLS equals the JVM twin") {
    val dir = "/root/testdata/sf0.001"
    val d = docs(dir)
    val bySrc = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, text, src) <- d; g <- trigrams(text))
      bySrc((src, g)) = bySrc.getOrElse((src, g), 0L) + 1L
    val sources = bySrc.keys.map(_._1).toSeq.distinct.sorted
    val firstSrc = bySrc.keys.groupBy(_._2).view
      .mapValues(_.map(_._1).min).toMap
    val curve = sources.zipWithIndex.map { case (_, i) =>
      val pref = sources.take(i + 1).toSet
      val tokens = bySrc.collect {
        case ((s, _), c) if pref(s) => c }.sum
      val vocab = firstSrc.values.count(pref).toLong
      (i + 1L, sources(i), tokens, vocab)
    }
    def lg(c: Long): Long = graft.queries.SketchOps.lgJvm(c)
    val pts = curve.filter(r => r._3 > 0 && r._4 > 0)
      .map(r => (lg(r._3), lg(r._4)))
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxx, sxy, syy) = (pts.map(p => p._1 * p._1).sum,
      pts.map(p => p._1 * p._2).sum, pts.map(p => p._2 * p._2).sum)
    val (slope, intercept, r2) =
      graft.queries.SketchOps.olsJvm(pts.size, sx, sy, sxx, sxy, syy)
    val rows = SparkEntry.queries("heaps_law_audit")(spark, dir).collect()
    val gotCurve = rows.map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3))).toSeq
    assert(gotCurve == curve)
    assert(rows.forall(_.getBoolean(4)), "growth curve not monotone")
    rows.foreach { r =>
      assert(r.getLong(5) == pts.size.toLong)
      assert((if (r.isNullAt(6)) None else Some(r.getDouble(6))) == slope)
      assert((if (r.isNullAt(7)) None else Some(r.getDouble(7))) == intercept)
      assert((if (r.isNullAt(8)) None else Some(r.getDouble(8))) == r2)
    }
    // Heaps regime on the real corpus: sublinear growth, 0 < β < 1
    assert(slope.exists(b => b > 0 && b < 1))
  }

  test("source_tv_drift ≡ plain-Scala total variation incl. absent-gram " +
    "mass; range law holds") {
    val dir = "/root/testdata/sf0.001"
    val d = docs(dir)
    val bySrc = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((_, text, src) <- d; g <- trigrams(text))
      bySrc((src, g)) = bySrc.getOrElse((src, g), 0L) + 1L
    val gc = bySrc.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val dt = gc.values.sum
    val qMicro = gc.view.mapValues(dg => 1000000L * dg / dt).toMap
    val qtot = qMicro.values.sum
    val expected = bySrc.groupBy(_._1._1).map { case (src, m) =>
      val ct = m.values.sum
      val grams = m.map { case ((_, g), c) => g -> c }
      val pq = grams.map { case (g, c) =>
        g -> ((1000000L * c / ct, qMicro(g))) }
      val sad = pq.values.map { case (p, q) => math.abs(p - q) }.sum
      val sq = pq.values.map(_._2).sum
      val (topG, topD) = pq.map { case (g, (p, q)) => (g, math.abs(p - q)) }
        .toSeq.sortBy { case (g, ad) => (-ad, g) }.head
      val tv = (sad + qtot - sq) / 2
      src -> ((grams.size.toLong, ct, tv,
        tv >= 0 && tv <= 1000000L, topG, topD))
    }
    val got = SparkEntry.queries("source_tv_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getString(5), r.getLong(6)))).toMap
    assert(got == expected.toMap)
    assert(got.values.forall(_._4), "TV range law violated")
    // drift is non-degenerate on the real corpus: no source matches the
    // corpus distribution exactly
    assert(got.values.forall(_._3 > 0L))
  }
}
