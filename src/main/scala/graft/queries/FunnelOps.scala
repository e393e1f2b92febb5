package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** Event-analytics operators over the `events` log: the ordered conversion
  * funnel and weekly cohort retention — the two product-analytics shapes
  * every warehouse gets asked for daily, here in the engine's exact-
  * arithmetic form (integer milli shares, explicit floor division, unique
  * sort keys) so the DuckDB twin hash-matches.
  *
  * Both are per-user aggregations: the natural 100 TB layout shuffles once
  * on user_id and keeps everything downstream user-partitioned. Neither
  * collects to the driver; funnel output is 4 rows, retention output is
  * (weeks × offsets)-sized however big the log.
  */
object FunnelOps {

  /** Ordered conversion funnel signup → view → click → purchase: a user
    * reaches step k only via an event STRICTLY AFTER their first step-(k-1)
    * event (the product-analytics contract — wandering into a later page
    * before signing up does not count).
    *
    * Shape: one filtered min-aggregate per step, each joined to the
    * previous step's first-event time on user_id — partial aggregation
    * collapses each step to one row per user before its shuffle, and every
    * join is user-keyed so a user-bucketed layout would run it with zero
    * extra exchanges. The final counts are four scalar aggregates unioned,
    * with conversion as exact integer milli of the entry step. */
  private def eventFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    def firstAfter(step: String, prev: DataFrame, prevTs: String,
        outTs: String): DataFrame =
      e.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col(prevTs)), "user_id")
        .filter(col("ts") > col(prevTs))
        .groupBy("user_id").agg(min(col("ts")).as(outTs))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = firstAfter("view", s1, "t1", "t2")
    val s3 = firstAfter("click", s2, "t2", "t3")
    val s4 = firstAfter("purchase", s3, "t3", "t4")
    val n = Seq("1_signup" -> s1, "2_view" -> s2, "3_click" -> s3,
      "4_purchase" -> s4)
      .map { case (nm, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(nm).as("step"),
          col("n_users"))
      }.reduce(_ union _)
    val base = s1.agg(count(lit(1)).as("n0"))
    n.crossJoin(broadcast(base))
      .select(col("step"), col("n_users"),
        floor(lit(1000.0) * col("n_users") / col("n0")).as("conv_milli"))
      .orderBy("step")
  }

  private val eventFunnelSql =
    """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1),
      |s4 AS (SELECT e.user_id, MIN(e.ts) AS t4 FROM events e JOIN s3 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY 1),
      |n AS (
      |  SELECT '1_signup' AS step, COUNT(*) AS n_users FROM s1
      |  UNION ALL SELECT '2_view', COUNT(*) FROM s2
      |  UNION ALL SELECT '3_click', COUNT(*) FROM s3
      |  UNION ALL SELECT '4_purchase', COUNT(*) FROM s4),
      |b AS (SELECT COUNT(*) AS n0 FROM s1)
      |SELECT step, n_users, CAST(floor(1000.0 * n_users / n0) AS BIGINT) AS conv_milli
      |FROM n CROSS JOIN b ORDER BY step""".stripMargin

  /** Weekly cohort retention: users grouped by the Monday week of their
    * first event; n_users = distinct users of that cohort active in each
    * later week. Week offset is an EXPLICIT floor of the day difference
    * over 7 (non-negative by construction — activity never precedes the
    * first event — but the floor keeps both engines' division semantics
    * pinned, per the value_bucket lesson).
    *
    * Shape: first-event aggregate (one row per user), join back on
    * user_id, then a distinct-count aggregate on (cohort, offset) — two
    * user-keyed shuffles and one small output. The join side is
    * user-dimension-sized, not log-sized; no hint forced so the optimizer
    * broadcasts it only while it fits. */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"), col("ts"))
    val firsts = e.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    e.join(firsts, "user_id")
      .select(col("cohort_week"), col("user_id"),
        floor(datediff(to_date(col("ts")), to_date(col("cohort_week"))) / lit(7.0))
          .as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  private val cohortRetentionSql =
    """WITH f AS (SELECT user_id,
      |             -- DuckDB date_trunc('week') yields DATE; Spark yields
      |             -- TIMESTAMP — cast so the dtypes agree
      |             CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      |           FROM events GROUP BY 1)
      |SELECT cohort_week,
      |  CAST(floor(date_diff('day', CAST(cohort_week AS DATE), CAST(e.ts AS DATE))
      |             / 7.0) AS BIGINT) AS week_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM events e JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** SCD Type-2 interval derivation via gaps-and-islands: collapse each
    * user's CONSECUTIVE same-type events into one validity interval
    * (valid_from = first event of the run, valid_to = start of the next
    * run, NULL while current) — the standard warehouse history pattern
    * (the reference's hist table keeps raw snapshots; this is the
    * dimension-history view a consumer derives from it).
    *
    * The island key is the two-row_number difference (rn_overall −
    * rn_within_type): constant exactly along a run of equal types,
    * distinct across runs — the classic gaps-and-islands identity, all
    * inside ONE user-keyed shuffle (three window functions and the final
    * aggregate all share the user_id partitioning; many small groups, so
    * no straggler risk at scale). */
  private def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val islands = t(s, dir, "events")
      // validity intervals need a timeline: drop NULL ts on BOTH sides
      // (fuzz gate: engine NULL-ordering would seat them in different runs)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("island",
        row_number().over(byUser) - row_number().over(byUserType))
      .groupBy(col("user_id"), col("event_type"), col("island"))
      .agg(min(col("ts")).as("valid_from"), min(col("event_id")).as("first_id"),
        count(lit(1)).as("n_events"))
    // first_id is the unique tiebreak: duplicate timestamps can give two
    // runs the same valid_from, and lead() over a tied ordering is
    // nondeterministic
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("first_id"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(seq))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("n_events"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "valid_from")
  }

  private val scd2IntervalsSql =
    """WITH isl AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    - row_number() OVER (PARTITION BY user_id, event_type
      |                         ORDER BY ts, event_id) AS island
      |  FROM events WHERE ts IS NOT NULL),
      |runs AS (
      |  SELECT user_id, event_type, island,
      |    MIN(ts) AS valid_from, MIN(event_id) AS first_id,
      |    COUNT(*) AS n_events
      |  FROM isl GROUP BY 1, 2, 3)
      |SELECT user_id, event_type, valid_from,
      |  lead(valid_from, 1) OVER (PARTITION BY user_id
      |    ORDER BY valid_from, first_id) AS valid_to,
      |  n_events,
      |  lead(valid_from, 1) OVER (PARTITION BY user_id
      |    ORDER BY valid_from, first_id) IS NULL AS is_current
      |FROM runs ORDER BY user_id, valid_from""".stripMargin

  /** Daily active users + 7-day rolling actives (the DAU/WAU board): WAU
    * is exact distinct-over-a-sliding-window, computed WITHOUT a range
    * join or a window-distinct (neither distributes): each (day, user)
    * pair is exploded to the ≤ 7 window days it contributes to, then one
    * (day, user) distinct + count. The corpus collapses to day×user
    * FIRST (map-side distinct), so the ×7 explode runs on the collapsed
    * relation — at 100 TB that is days × users, not events. Window days
    * with no activity of their own still report (left semi against the
    * observed-day set keeps the output calendar-honest). */
  private def dauWau(s: SparkSession, dir: String): DataFrame = {
    val du = t(s, dir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
    val dau = du.groupBy("d").agg(countDistinct(col("user_id")).as("dau"))
    val wau = du
      .select(explode(sequence(col("d"), date_add(col("d"), 6))).as("d"),
        col("user_id"))
      .distinct()
      .join(du.select("d").distinct(), Seq("d"), "left_semi")
      .groupBy("d").agg(countDistinct(col("user_id")).as("wau7"))
    dau.join(wau, "d")
      .select(col("d").as("day"), col("dau"), col("wau7"))
      .orderBy("day")
  }

  private val dauWauSql =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |dau AS (SELECT d, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY 1),
      |w AS (
      |  SELECT DISTINCT CAST(wd AS DATE) AS d, user_id
      |  FROM du, UNNEST(generate_series(CAST(d AS TIMESTAMP),
      |    CAST(d AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) t(wd)),
      |wau AS (
      |  SELECT w.d, COUNT(DISTINCT w.user_id) AS wau7
      |  FROM w SEMI JOIN du ON w.d = du.d GROUP BY 1)
      |SELECT dau.d AS day, dau.dau, wau.wau7
      |FROM dau JOIN wau ON dau.d = wau.d
      |ORDER BY day""".stripMargin

  /** Top navigation paths — the path-analysis report beside the funnel
    * (the funnel checks ONE prescribed sequence; this surfaces which
    * sequences actually happen): events sessionize by the 30-minute gap
    * rule (the `sessionize` contract), each session's first 5 event types
    * join into a path string, and the output is the top-10 paths by
    * session count.
    *
    * Determinism: within-session order is (ts, event_id) — unique — and
    * Spark's order-free collect_list is made deterministic by sorting the
    * collected (ts, event_id, type) structs (lexicographic struct sort ≡
    * the window order) before the types are joined; ties in the top-10 cut
    * break on the path string.
    *
    * Scale shape: one user-keyed shuffle for the session windows (shared
    * shape with sessionize/funnel), one (user, session)-keyed aggregate,
    * then a path-keyed count whose cardinality is bounded by distinct
    * paths (≤ |event types|⁵) — the top-10 is a TakeOrdered, never a
    * global sort of the log. */
  private def eventPaths(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"), col("et"))
    val gapUs = 30L * 60 * 1000000
    t(s, dir, "events")
      .filter(col("ts").isNotNull)
      // NULL types bucket as '' BEFORE any aggregation (the
      // cross_source_leakage rule) — found by the fuzz gate: Spark's
      // array_join FILTERS null elements (an all-NULL session joined to
      // "") while DuckDB's string_agg over an all-NULL group returns
      // NULL, so the two engines split the same sessions across two
      // different path keys. '' is also the full tie-break's third key:
      // a dirty corpus can repeat (ts, event_id) with different types,
      // and a two-key order would seat them engine-dependently.
      .withColumn("et", coalesce(col("event_type"), lit("")))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sess_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("sess_id"))
          .orderBy(col("ts"), col("event_id"), col("et"))))
      .filter(col("rn") <= 5)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("et")))).as("evs"))
      .select(array_join(expr("transform(evs, x -> x.et)"), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(10)
  }

  private val eventPathsSql =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, COALESCE(event_type, '') AS et,
      |    CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, COALESCE(event_type, ''))),
      |sessed AS (
      |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id, et ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM flagged),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, sess_id
      |    ORDER BY ts, event_id, et) AS rn FROM sessed),
      |paths AS (
      |  SELECT user_id, sess_id,
      |    string_agg(et, '>' ORDER BY ts, event_id, et) AS path
      |  FROM ranked WHERE rn <= 5 GROUP BY 1, 2)
      |SELECT path, COUNT(*) AS n_sessions
      |FROM paths GROUP BY 1
      |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin

  val all: Seq[Q] = Seq(
    Q("event_paths", eventPaths, Some(eventPathsSql)),
    Q("dau_wau", dauWau, Some(dauWauSql)),
    Q("event_funnel", eventFunnel, Some(eventFunnelSql)),
    Q("cohort_retention", cohortRetention, Some(cohortRetentionSql)),
    Q("scd2_intervals", scd2Intervals, Some(scd2IntervalsSql)))
}
