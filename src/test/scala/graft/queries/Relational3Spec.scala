package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic checks for the round-2 operators on the sf0.001 testdata —
  * properties the DuckDB oracle can't express directly (cross-formulation
  * equivalence, transitivity), plus known-answer spot checks. */
class Relational3Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("asof_join: every matched click is at-or-before its purchase, and is the latest such") {
    import spark.implicits._
    val out = q("asof_join").cache()
    // click_ts <= purchase_ts wherever a click matched
    assert(out.filter(col("click_ts") > col("purchase_ts")).count() == 0)
    // brute-force check on a handful of purchases
    val ev = Util.t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val sample = out.limit(20).collect()
    val bySample = sample.map { r =>
      val (uid, pts) = (r.getLong(1), r.getTimestamp(2))
      val best = clicks.filter(col("cu") === uid && col("cts") <= pts)
        .orderBy(col("cts").desc, col("cid").desc).limit(1).collect()
      (r, best.headOption)
    }
    bySample.foreach { case (r, best) =>
      best match {
        case Some(b) =>
          assert(r.getTimestamp(4) == b.getTimestamp(1),
            s"purchase ${r.getLong(0)}: asof ts ${r.getTimestamp(4)} != brute ${b.getTimestamp(1)}")
        case None => assert(r.isNullAt(3), s"purchase ${r.getLong(0)} should have no click")
      }
    }
    out.unpersist()
  }

  test("range_join_count matches a brute-force inequality join") {
    val ev = Util.t(spark, dir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("cus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), unix_micros(col("ts")).as("pus"))
    val brute = p.join(c, col("user_id") === col("cu") &&
        col("cus") > col("pus") - 600000000L && col("cus") <= col("pus"), "left")
      .groupBy("purchase_id").agg(count(col("cus")).as("n_brute"))
    val diff = q("range_join_count").join(brute, "purchase_id")
      .filter(col("n_clicks_10m") =!= col("n_brute"))
    assert(diff.count() == 0)
  }

  test("salted_agg equals the direct (unsalted) aggregation") {
    val ev = Util.t(spark, dir, "events")
    val direct = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(Util.cents(col("value"))).as("value_cents"))
    val diff = q("salted_agg").as("s")
      .join(direct.as("d"), "user_id")
      .filter(col("s.n_events") =!= col("d.n_events") ||
        col("s.value_cents") =!= col("d.value_cents"))
    assert(diff.count() == 0)
  }

  test("hash_sample keeps a plausible unbiased fraction") {
    val total = Util.t(spark, dir, "orders").count()
    val kept = q("hash_sample").count()
    val frac = kept.toDouble / total
    assert(frac > 0.03 && frac < 0.10, s"sample fraction $frac outside [0.03, 0.10]")
  }

  test("gap_fill_hours: the hour grid is complete and forward-fill is monotone-defined") {
    val out = q("gap_fill_hours").cache()
    // expected grid derived INDEPENDENTLY from the events table, so a
    // truncated hour range in the query cannot self-certify
    val ev = Util.t(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
    val b = ev.agg(min("h"), max("h")).head()
    val expHours =
      (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 3600000L + 1
    val expTypes = ev.select("event_type").distinct().count()
    assert(out.select("hour").distinct().count() == expHours, "hour span truncated")
    assert(out.count() == expTypes * expHours, "grid must be the full cross product")
    // after the first non-null fill value, ffill never returns to null
    val badResets = out.selectExpr("event_type", "hour", "ffill_cents")
      .collect().groupBy(_.getString(0)).count { case (_, rows) =>
        val seq = rows.sortBy(_.getTimestamp(1).getTime).map(r => r.isNullAt(2))
        val firstDefined = seq.indexOf(false)
        firstDefined >= 0 && seq.drop(firstDefined).contains(true)
      }
    assert(badResets == 0, "forward fill must not reset to null")
    out.unpersist()
  }

  test("quartiles_disc: q2 equals the row_number-selected median element") {
    import org.apache.spark.sql.functions._
    val q2 = q("quartiles_disc").select("o_orderpriority", "q2_cents")
    // independent brute check: sort each group's cents, take element ceil(n/2)
    val ev = Util.t(spark, dir, "orders")
      .select(col("o_orderpriority"), Util.cents(col("o_totalprice")).as("c"),
        col("o_orderkey"))
    val brute = ev.collect().groupBy(_.getString(0)).map { case (g, rows) =>
      val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(identity)
      g -> sorted((math.ceil(sorted.length * 0.5).toInt - 1))._1
    }
    q2.collect().foreach { r =>
      assert(r.getLong(1) == brute(r.getString(0)),
        s"median mismatch for ${r.getString(0)}")
    }
  }

  test("connected_components: components are label-closed over the edge relation") {
    val cc = graft.SparkEntry.queries("connected_components")(spark, dir).cache()
    // component id must be a member doc_id (min label reached)
    val ids = cc.select("doc_id").collect().map(_.getLong(0)).toSet
    cc.select("component").distinct().collect().foreach { r =>
      assert(ids.contains(r.getLong(0)), s"component ${r.getLong(0)} is not a node")
    }
    // comp_size sums to node count
    val n = cc.count()
    val sums = cc.groupBy("component").agg(count(lit(1)).as("k"), first("comp_size").as("sz"))
      .filter(col("k") =!= col("sz")).count()
    assert(sums == 0)
    assert(n == cc.select("doc_id").distinct().count())
    cc.unpersist()
  }
}
