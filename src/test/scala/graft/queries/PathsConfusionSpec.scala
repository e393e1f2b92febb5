package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Cross-query contracts for langid_confusion and event_paths. */
class PathsConfusionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("langid_confusion: cells recount from text_langid's per-doc output") {
    val perDoc = SparkEntry.queries("text_langid")(spark, dir).collect()
    val expect = perDoc.groupBy(r =>
        (Option(r.getAs[String]("lang_label")).getOrElse(""),
          r.getAs[String]("lang_pred")))
      .map { case (k, g) => k -> g.length.toLong }
    val got = SparkEntry.queries("langid_confusion")(spark, dir).collect()
    assert(got.map(r => (r.getAs[String]("lang_label"),
      r.getAs[String]("lang_pred")) -> r.getAs[Long]("n")).toMap == expect)
    // per-label shares are a milli distribution (floor loses < 1 per cell)
    got.groupBy(_.getAs[String]("lang_label")).foreach { case (_, cells) =>
      val s = cells.map(_.getAs[Long]("label_share_milli")).sum
      assert(s <= 1000 && s > 1000 - cells.length)
      val tot = cells.head.getAs[Long]("label_total")
      assert(cells.map(_.getAs[Long]("n")).sum == tot)
    }
  }

  test("event_paths: bounded, ranked, sessions consistent with sessionize") {
    val got = SparkEntry.queries("event_paths")(spark, dir).collect()
    assert(got.nonEmpty && got.length <= 10)
    val ns = got.map(_.getAs[Long]("n_sessions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "ranked desc")
    got.foreach { r =>
      assert(r.getAs[Long]("n_sessions") > 0)
      assert(r.getAs[String]("path").split(">").length <= 5,
        "a path is a session's first 5 events at most")
    }
    // the top-10 can never contain more sessions than exist corpus-wide
    val totalSessions = SparkEntry.queries("sessionize")(spark, dir)
      .collect().map(_.getAs[Long]("n_sessions")).sum
    assert(ns.sum <= totalSessions)
  }
}
