package graft.plans

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}

/** The native AsOfJoinExec operator: planted-fixture semantics, plan-shape
  * assertions, and row-for-row parity with the composed window formulation
  * on real data. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("planted fixture: latest-quote-at-or-before, inclusive, key-isolated") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 10:05:00"), "p2"), // equal-ts quote: inclusive
      (2L, ts("2024-01-01 10:00:00"), "p3"), // other key's quotes invisible
      (3L, ts("2024-01-01 09:00:00"), "p4")) // before every quote → NULL
      .toDF("k", "t", "p")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:30:00"), "q_early"),
      (1L, ts("2024-01-01 09:55:00"), "q_mid"),
      (1L, ts("2024-01-01 10:05:00"), "q_equal"),
      (3L, ts("2024-01-01 12:00:00"), "q_late"))
      .toDF("qk", "qt", "q")
    val out = GraftAsOf.asof(probe, quotes, Seq("k"), Seq("qk"), "t", "qt")
      .collect().map(r => r.getAs[String]("p") -> Option(r.getAs[String]("q")))
      .toMap
    assert(out("p1") == Some("q_mid"))   // latest ≤ 10:00
    assert(out("p2") == Some("q_equal")) // ts >= quote_ts is inclusive
    assert(out("p3") == None)            // key 2 has no quotes at all
    assert(out("p4") == None)            // key 3's only quote is later
    assert(out.size == 4, "left join: every probe row emits exactly once")
  }

  test("plan: AsOfJoinExec with per-side exchange+sort, no Window, no union") {
    val df = SparkEntry.queries("asof_join_native")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native operator missing:\n$plan")
    assert(!plan.contains("Window"), "native plan must not fall back to a window")
    assert(!plan.contains("Union"), "native plan must not union the sides")
  }

  test("self-join lineage: shared exprIds are re-aliased, right binds right") {
    // probe and quotes derive from ONE frame: without the re-aliasing rewrite
    // the analyzed plans share exprIds for k/t and the result projection
    // silently binds quote columns to probe values. The quote side renames v
    // to v_q = v || "_q", so a mis-bound projection is VISIBLE: the matched
    // quote value must carry the suffix.
    val base = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (2L, ts("2024-01-01 10:30:00"), "c")).toDF("k", "t", "v")
    val quotes = base.withColumn("vq",
      org.apache.spark.sql.functions.concat($"v",
        org.apache.spark.sql.functions.lit("_q"))).drop("v")
    val out = GraftAsOf.asof(base, quotes, Seq("k"), Seq("k"), "t", "t")
      .collect().map(r => r.getAs[String]("v") -> r.getAs[String]("vq")).toMap
    // inclusive bound: every row matches itself as its own latest quote
    assert(out == Map("a" -> "a_q", "b" -> "b_q", "c" -> "c_q"))
  }

  test("validate=true rejects NULL keys/times and duplicate (key,time) quotes") {
    val probe = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "p")
    val quotes = Seq((1L, ts("2024-01-01 09:00:00"), "q")).toDF("qk", "qt", "q")
    val nullKeyProbe = Seq((Option.empty[Long], ts("2024-01-01 10:00:00"), "p"))
      .toDF("k", "t", "p")
    val eNk = intercept[IllegalArgumentException] {
      GraftAsOf.asof(nullKeyProbe, quotes, Seq("k"), Seq("qk"), "t", "qt",
        validate = true)
    }
    assert(eNk.getMessage.contains("NULL key/time"))
    val nullTimeQuotes =
      Seq((1L, Option.empty[Timestamp], "q")).toDF("qk", "qt", "q")
    val eNt = intercept[IllegalArgumentException] {
      GraftAsOf.asof(probe, nullTimeQuotes, Seq("k"), Seq("qk"), "t", "qt",
        validate = true)
    }
    assert(eNt.getMessage.contains("NULL key/time"))
    val dupQuotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), "q1"),
      (1L, ts("2024-01-01 09:00:00"), "q2")).toDF("qk", "qt", "q")
    val eDup = intercept[IllegalArgumentException] {
      GraftAsOf.asof(probe, dupQuotes, Seq("k"), Seq("qk"), "t", "qt",
        validate = true)
    }
    assert(eDup.getMessage.contains(">1 quote"))
    // clean inputs pass validation and answer normally
    val ok = GraftAsOf.asof(probe, quotes, Seq("k"), Seq("qk"), "t", "qt",
      validate = true).collect()
    assert(ok.length == 1 && ok.head.getAs[String]("q") == "q")
  }

  test("schema preconditions fail loudly without running a job") {
    val probe = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "p")
    val strKeyQuotes = Seq(("1", ts("2024-01-01 09:00:00"), "q"))
      .toDF("qk", "qt", "q")
    val eKey = intercept[IllegalArgumentException] {
      GraftAsOf.asof(probe, strKeyQuotes, Seq("k"), Seq("qk"), "t", "qt")
    }
    assert(eKey.getMessage.contains("key type mismatch"))
    val eEmpty = intercept[IllegalArgumentException] {
      GraftAsOf.asof(probe, strKeyQuotes, Seq(), Seq(), "t", "qt")
    }
    assert(eEmpty.getMessage.contains("non-empty"))
    val eMissing = intercept[IllegalArgumentException] {
      GraftAsOf.asof(probe, strKeyQuotes, Seq("nope"), Seq("qk"), "t", "qt")
    }
    assert(eMissing.getMessage.contains("no column 'nope'"))
  }

  test("parity: native operator ≡ composed window formulation (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    def canon(name: String) =
      SparkEntry.queries(name)(spark, dir).collect().map { r =>
        (r.getAs[Long]("purchase_id"), r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("purchase_ts"),
          Option(r.getAs[Any]("click_id")), Option(r.getAs[Any]("click_ts")))
      }.toSeq
    val native = canon("asof_join_native")
    val composed = canon("asof_join")
    assert(native.nonEmpty)
    assert(native == composed)
  }
}
