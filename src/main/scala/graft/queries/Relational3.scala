package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** Third relational wave (round 2): temporal joins, subqueries, ordered
  * string aggregation, arg-min/max, regexp battery, deterministic sampling,
  * value-window battery, and a salted two-phase aggregation — the skew
  * pattern that keeps a 100 TB groupBy from hot-spotting one reducer.
  *
  * Determinism contract as everywhere in graft.queries: identical column
  * names both sides, exact integer/string arithmetic (no float aggregation),
  * DuckDB SUMs cast back to BIGINT (HUGEINT → float64 in the driver's
  * pandas otherwise), unique ORDER BY keys.
  */
object Relational3 {

  // ---------------------------------------------------------------- as-of

  /** AS-OF join: each purchase event picks the most recent click at-or-
    * before it by the same user.
    *
    * Spark lacks a native as-of join; the scalable formulation is NOT a
    * range join (quadratic per user) but a tagged union + ordered window:
    * one shuffle on user_id, then `last(click_id, ignoreNulls)` over rows
    * up to the current one. Clicks are pre-deduped to one per (user, ts)
    * (max event_id) so ties are deterministic in both engines; clicks sort
    * before purchases at equal ts (tag 0 < 1) to implement ts >= click_ts
    * inclusively, matching DuckDB's ASOF `>=` semantics. */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // as-of semantics need a timeline AND an entity: NULL-ts and NULL-user
    // rows are dropped on BOTH sides (fuzz gate: Spark's window seats NULL
    // ts first and groups NULL users into ONE partition, while DuckDB's
    // ASOF equality rejects NULL = NULL — either kept class diverges)
    val ev = t(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val tagged = clicks
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("click_id"), lit(null).cast("long").as("event_id"))
      .unionByName(purchases
        .select(col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast("long").as("click_id"), col("event_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), coalesce(col("event_id"), col("click_id")))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_ts",
        last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("asof_click_id").as("click_id"), col("asof_click_ts").as("click_ts"))
      .orderBy("purchase_id")
  }

  private val asofJoinSql =
    """WITH clicks AS (
      |  SELECT user_id, ts, MAX(event_id) AS click_id
      |  FROM events
      |  WHERE event_type = 'click' AND ts IS NOT NULL AND user_id IS NOT NULL
      |  GROUP BY user_id, ts),
      |p AS (SELECT user_id, ts, event_id FROM events
      |      WHERE event_type = 'purchase' AND ts IS NOT NULL
      |        AND user_id IS NOT NULL)
      |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |  c.click_id, c.ts AS click_ts
      |FROM p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin

  // ----------------------------------------------------------- range join

  /** Interval/range join: clicks within the 10 minutes before each purchase
    * by the same user.
    *
    * The scalable plan buckets time into 10-minute epochs and equi-joins on
    * (user_id, bucket ∈ {b, b−1}) — each purchase expands to exactly two
    * join keys, every candidate click joins at most once, and the exact
    * range predicate filters after the (hash-partitioned, broadcast-free)
    * equi-join. A naive θ-join on the inequality alone would be a BNL join:
    * quadratic per user, dead at scale. */
  private def rangeJoinCount(s: SparkSession, dir: String): DataFrame = {
    val winUs = 600L * 1000000 // 10 min in µs
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("cus"))
      .withColumn("cb", expr(s"cus div ${winUs}L"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("pus"))
    val expanded = purchases.withColumn("cb",
      explode(array(expr(s"pus div ${winUs}L"), expr(s"pus div ${winUs}L - 1"))))
    val matched = expanded.join(clicks, Seq("user_id", "cb"))
      .filter(col("cus") > col("pus") - winUs && col("cus") <= col("pus"))
      .groupBy(col("purchase_id")).agg(count(lit(1)).as("n_clicks_10m"))
    purchases.join(matched, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"),
        coalesce(col("n_clicks_10m"), lit(0L)).as("n_clicks_10m"))
      .orderBy("purchase_id")
  }

  private val rangeJoinCountSql =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS cus FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, p.user_id, COUNT(c.cus) AS n_clicks_10m
      |FROM p LEFT JOIN c ON p.user_id = c.user_id
      |  AND c.cus > p.pus - 600000000 AND c.cus <= p.pus
      |GROUP BY p.purchase_id, p.user_id
      |ORDER BY purchase_id""".stripMargin

  // ----------------------------------------------------------- subqueries

  /** Correlated subquery battery: scalar COUNT subquery, EXISTS, and IN —
    * one SQL text for both engines. Catalyst decorrelates all three into
    * joins (scalar → left outer agg join, EXISTS → left semi, IN → left
    * semi), so the executed plan is three hash joins, not nested loops. */
  private val subqueryBatterySql =
    """SELECT c_custkey, c_name,
      |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |  AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 2)
      |ORDER BY c_custkey""".stripMargin

  private def subqueryBattery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "orders").createOrReplaceTempView("orders")
    t(s, dir, "nation").createOrReplaceTempView("nation")
    s.sql(subqueryBatterySql)
  }

  // ------------------------------------------------- ordered string_agg

  /** Ordered string aggregation per group. Spark's collect_list is
    * unordered by contract, so order is imposed by sorting an array of
    * (sort-key, value) structs before joining — the portable spelling of
    * DuckDB's string_agg(... ORDER BY). Sampled to keep cell sizes sane. */
  private def stringAggGroup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") % 25 === 0)
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("c_custkey"), col("c_name")))),
            x => x.getField("c_name")),
          ",").as("names"))
      .orderBy("c_nationkey")

  private val stringAggGroupSql =
    """SELECT c_nationkey, COUNT(*) AS n,
      |  -- COALESCE: both engines skip NULL names, but an all-NULL group is
      |  -- '' in Spark (array_join) and NULL in string_agg (fuzz seed 10)
      |  COALESCE(string_agg(c_name, ',' ORDER BY c_custkey), '') AS names
      |FROM customer WHERE c_custkey % 25 = 0
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // --------------------------------------------------------- min/max_by

  /** arg-min/arg-max per group. Ties are broken by folding the unique
    * o_orderkey into the ordering value (cents · 10^7 + key), so both
    * engines pick the same row without relying on tie behavior. */
  private def minmaxBy(s: SparkSession, dir: String): DataFrame = {
    val ord = cents(col("o_totalprice")) * 10000000L + col("o_orderkey")
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        max_by(col("o_orderkey"), ord).as("top_orderkey"),
        min_by(col("o_orderkey"), ord).as("bottom_orderkey"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  private val minmaxBySql =
    s"""SELECT o_orderpriority,
       |  max_by(o_orderkey, ${centsSql("o_totalprice")} * 10000000 + o_orderkey) AS top_orderkey,
       |  min_by(o_orderkey, ${centsSql("o_totalprice")} * 10000000 + o_orderkey) AS bottom_orderkey,
       |  COUNT(*) AS n
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------- regexp

  /** Regexp battery: replace / extract-all / match, ASCII-only patterns
    * where Java regex and RE2 semantics coincide. Array results are
    * comma-joined (driver compare requires scalar cells). */
  private def regexpBattery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        concat_ws(",", regexp_extract_all(col("p_name"), lit("(\\w+)"), lit(1)))
          .as("words"),
        col("p_type").rlike("^PROMO").as("is_promo"),
        regexp_extract(col("p_brand"), "([0-9]+)$", 1).as("brand_num"))
      .orderBy("p_partkey")

  private val regexpBatterySql =
    """SELECT p_partkey,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  -- COALESCE: Spark's concat_ws skips NULL args and never returns
      |  -- NULL (a NULL p_name gives ''), DuckDB's array_to_string
      |  -- propagates it (fuzz gate finding)
      |  COALESCE(array_to_string(regexp_extract_all(p_name, '(\w+)', 1), ','), '')
      |    AS words,
      |  regexp_matches(p_type, '^PROMO') AS is_promo,
      |  regexp_extract(p_brand, '([0-9]+)$', 1) AS brand_num
      |FROM part ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------ sampling

  /** Deterministic hash sample: md5(key) first hex digit = '0' keeps an
    * unbiased ~1/16 of rows, reproducibly, on any engine — the portable
    * alternative to TABLESAMPLE (whose seeding is engine-private). The
    * predicate evaluates at the scan: no shuffle, no state, and at 100 TB
    * the sample never sees a coordinator. */
  private def hashSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .orderBy("o_orderkey")

  private val hashSampleSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
      |ORDER BY o_orderkey""".stripMargin

  // ----------------------------------------------------- value windows

  /** first/last/nth_value battery with explicit full-partition frames and a
    * unique ordering key (o_orderdate, o_orderkey). */
  private def windowValues(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"),
        first(col("o_orderkey")).over(full).as("first_key"),
        last(col("o_orderkey")).over(full).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_key"),
        lead(col("o_orderkey"), 1).over(base).as("next_key"),
        lag(col("o_orderkey"), 1).over(base).as("prev_key"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  private val windowValuesSql =
    """SELECT o_orderpriority, o_orderkey,
      |  first_value(o_orderkey) OVER wf AS first_key,
      |  last_value(o_orderkey) OVER wf AS last_key,
      |  nth_value(o_orderkey, 2) OVER wf AS second_key,
      |  lead(o_orderkey, 1) OVER w AS next_key,
      |  lag(o_orderkey, 1) OVER w AS prev_key
      |FROM orders WHERE o_orderkey % 100 = 0
      |-- NULLS FIRST = Spark's ASC default; DuckDB defaults NULLS LAST
      |-- (fuzz gate finding, same class as window_running)
      |WINDOW
      |  w AS (PARTITION BY o_orderpriority
      |        ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST),
      |  wf AS (PARTITION BY o_orderpriority
      |         ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  // ----------------------------------------------------- salted groupBy

  /** Salted two-phase aggregation: phase 1 groups by (key, salt) — spreading
    * a hot key over `nSalt` reducers — phase 2 combines the partials. The
    * result is provably identical to a direct groupBy (sums are associative)
    * and the oracle checks exactly that. This is the standard mitigation
    * when one key owns a disproportionate share of a 100 TB shuffle and AQE
    * skew handling can't split a single hash partition further. */
  private def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    val nSalt = 8
    t(s, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(nSalt)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(cents(col("value"))).as("pc"))
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"), sum(col("pc")).as("value_cents"))
      .orderBy("user_id")
  }

  private val saltedAggSql =
    s"""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(${centsSql("value")}) AS BIGINT) AS value_cents
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------ sketches

  /** Approximate-distinct (HLL++) and approximate-quantile sketches CHECKED
    * against their exact answers. Sketch estimates are engine-
    * implementation-specific, so the raw estimate can't hash-match a DuckDB
    * twin — instead the output carries the exact values, the exact error-
    * bound columns, and booleans asserting each estimate lands inside its
    * documented bound (HLL++ rsd=0.05 → 3σ ≈ ±15 %; percentile_approx
    * accuracy=1000 → rank error ≤ 1e-3·n, checked against a 10×-looser
    * ±0.01 rank window). The twin computes the identical exact values and
    * bounds and asserts the booleans TRUE, so a sketch drifting outside its
    * contract hash-mismatches the driver gate. At 100 TB the sketch is the
    * difference between a fixed-size mergeable partial aggregate (HLL
    * registers < 2 KB per group at rsd=0.05) and an exact distinct that
    * shuffles every key. */
  private def approxSketches(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, dir, "lineitem")
    // The exact-distinct leg runs as its OWN aggregate, joined back on
    // the ≤|flags|-row key: combined with the object-buffered sketches
    // in one groupBy, Catalyst's distinct rewrite keys the FIRST
    // aggregate by (flag, partkey) — which builds and merges an HLL
    // sketch and a percentile buffer PER DISTINCT PARTKEY (~200 k
    // object buffers at sf0.1; measured 5.8–10.8 s for an aggregate
    // whose four functions cost 1–1.7 s EACH when planned alone). Two
    // single-purpose aggregates over the same scan are each map-side-
    // combining with 3-group final states; the join is broadcast-sized.
    // Output values are identical — same functions, same groups.
    val sketchAgg = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.05).as("approx_parts"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("amed"),
        // count the QUANTITY values, not rows: the quantile ranks below
        // run over non-null quantities, and a NULL-quantity row would
        // shift them in engine-dependent NULL order (fuzz gate finding)
        count(col("l_quantity")).as("n"))
    val exactAgg = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val agg = sketchAgg.join(exactAgg, "l_returnflag")
    // exact discrete quantiles at ranks ceil(0.49·n)/ceil(0.51·n). The
    // value at ascending rank r equals MIN v whose cumulative value-count
    // reaches r, so the rank selection runs over the (flag, quantity)
    // VALUE HISTOGRAM — a map-side-combining aggregate plus a window over
    // ~|distinct quantities| rows per flag — instead of a row_number
    // window over every row of a ≤|flags|-partition sort (guide §2.5:
    // with 3 flags that window was 3 whole-corpus single-task sorts; at
    // 100 TB, 3 stragglers sorting a third of the fact table each).
    // Identical output: value-at-rank is deterministic under ties either
    // way, and n (the per-flag non-null count) is unchanged.
    val vc = li.select(col("l_returnflag"), col("l_quantity"))
      .filter(col("l_quantity").isNotNull)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val qb = vc.join(agg.select(col("l_returnflag"), col("n")), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cum") >= ceil(col("n") * lit(0.49)).cast("long"),
          col("l_quantity"))).as("qlo"),
        min(when(col("cum") >= ceil(col("n") * lit(0.51)).cast("long"),
          col("l_quantity"))).as("qhi"))
    agg.join(qb, "l_returnflag")
      .select(col("l_returnflag"), col("exact_parts"), col("n"),
        cents(col("qlo")).as("qlo_cents"), cents(col("qhi")).as("qhi_cents"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          ceil(col("exact_parts") * lit(0.15)).cast("long")).as("parts_in_bound"),
        (col("amed") >= col("qlo") && col("amed") <= col("qhi")).as("median_in_bound"))
      .orderBy("l_returnflag")
  }

  private val approxSketchesSql =
    """WITH agg AS (
      |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |    COUNT(l_quantity) AS n
      |  FROM lineitem GROUP BY 1),
      |rk AS (
      |  SELECT l_returnflag, l_quantity,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rk
      |  FROM lineitem WHERE l_quantity IS NOT NULL),
      |qb AS (
      |  SELECT r.l_returnflag,
      |    MAX(CASE WHEN r.rk = CAST(ceil(a.n*0.49) AS BIGINT) THEN r.l_quantity END) AS qlo,
      |    MAX(CASE WHEN r.rk = CAST(ceil(a.n*0.51) AS BIGINT) THEN r.l_quantity END) AS qhi
      |  FROM rk r JOIN agg a USING (l_returnflag) GROUP BY 1)
      |SELECT a.l_returnflag, a.exact_parts, a.n,
      |  CAST(round(qlo*100, 0) AS BIGINT) AS qlo_cents,
      |  CAST(round(qhi*100, 0) AS BIGINT) AS qhi_cents,
      |  TRUE AS parts_in_bound, TRUE AS median_in_bound
      |FROM agg a JOIN qb USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------- unpivot

  /** UNPIVOT (wide → long): two metric columns melted into (metric, value)
    * rows via Dataset.unpivot — the inverse of pivot_status. Narrow: each
    * input row emits exactly |metrics| rows, no shuffle before the final
    * sort. */
  private def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"),
        cents(col("o_totalprice")).as("totalprice_cents"),
        col("o_custkey").cast("long").as("custkey"))
    base.unpivot(
      Array(col("o_orderkey")),
      Array(col("totalprice_cents"), col("custkey")),
      "metric", "value")
      .orderBy("o_orderkey", "metric")
  }

  private val unpivotMetricsSql =
    s"""SELECT o_orderkey, 'totalprice_cents' AS metric,
       |  ${centsSql("o_totalprice")} AS value
       |FROM orders WHERE o_orderkey % 100 = 0
       |UNION ALL
       |SELECT o_orderkey, 'custkey', CAST(o_custkey AS BIGINT)
       |FROM orders WHERE o_orderkey % 100 = 0
       |ORDER BY o_orderkey, metric""".stripMargin

  // ------------------------------------------------------------ gap fill

  /** Time-series gap filling: the full hour × event_type grid (generated,
    * not scanned), hourly counts with absent hours as 0, and a forward-
    * filled last-known sum (`last(..., ignoreNulls)` over an ordered
    * frame). The grid comes from one tiny sequence explode crossed with the
    * distinct types — generation is O(grid), never a scan of the fact
    * table, and the fill window shuffles grid-sized (not fact-sized) data. */
  private def gapFillHours(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events")
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("vc"))
    val hours = hourly.agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hour"))
    val grid = hours.crossJoin(broadcast(ev.select("event_type").distinct()))
    val ffill = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("hour", "event_type"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("vc"), ignoreNulls = true).over(ffill).as("ffill_cents"))
      .orderBy("event_type", "hour")
  }

  private val gapFillHoursSql =
    s"""WITH hourly AS (
       |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       |    CAST(SUM(${centsSql("value")}) AS BIGINT) AS vc
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT MIN(hour) AS mn, MAX(hour) AS mx FROM hourly),
       |hours AS (SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour FROM b),
       |grid AS (SELECT hour, event_type FROM hours
       |         CROSS JOIN (SELECT DISTINCT event_type FROM events))
       |SELECT g.event_type, g.hour, CAST(COALESCE(h.n, 0) AS BIGINT) AS n,
       |  last_value(h.vc IGNORE NULLS) OVER (PARTITION BY g.event_type
       |    ORDER BY g.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_cents
       |FROM grid g LEFT JOIN hourly h
       |  ON g.hour = h.hour AND g.event_type = h.event_type
       |ORDER BY g.event_type, g.hour""".stripMargin

  // ----------------------------------------------------------- histogram

  /** Fixed-width histogram in exact integers: bucket = cents div 10^6
    * ($10k buckets). One hash aggregate keyed by bucket — the shape that
    * histograms 100 TB in a single pass with map-side partials. */
  private def histogramTotalprice(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(cents(col("o_totalprice")).as("c"))
      .groupBy(expr("c div 1000000").as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("c")).as("min_cents"), max(col("c")).as("max_cents"))
      .orderBy("bucket")

  private val histogramTotalpriceSql =
    s"""SELECT ${centsSql("o_totalprice")} // 1000000 AS bucket, COUNT(*) AS n,
       |  MIN(${centsSql("o_totalprice")}) AS min_cents,
       |  MAX(${centsSql("o_totalprice")}) AS max_cents
       |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  // ------------------------------------------------------- mode / quantile

  /** Exact per-group mode with a deterministic tiebreak (highest count,
    * then smallest value): value-count hash-agg → rank window → rn = 1.
    * Two shuffles, both on bounded-cardinality keys. */
  private def modePerGroup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cnt").desc, col("qv"))
    t(s, dir, "orders")
      // MODE ignores NULL inputs (standard aggregate semantics; fuzz gate:
      // a NULL qv group tied on count resolves in engine NULL order)
      .filter(col("o_custkey").isNotNull)
      .select(col("o_orderpriority"), (col("o_custkey") % 100).as("qv"))
      .groupBy(col("o_orderpriority"), col("qv"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderpriority"), col("qv").as("mode_value"), col("cnt").as("mode_count"))
      .orderBy("o_orderpriority")
  }

  private val modePerGroupSql =
    """SELECT o_orderpriority, qv AS mode_value, cnt AS mode_count FROM (
      |  SELECT o_orderpriority, qv, cnt,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY cnt DESC, qv) AS rn
      |  FROM (SELECT o_orderpriority, o_custkey % 100 AS qv, COUNT(*) AS cnt
      |        FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1, 2))
      |WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin

  /** Exact discrete quartiles (percentile_disc semantics: the element at
    * ceil(q·n), never interpolated — interpolation is float-divergent
    * cross-engine, element selection is not): one rank window, three
    * element picks per group. */
  private def quartilesDisc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cents"), col("o_orderkey"))
    val ranked = t(s, dir, "orders")
      // percentile_disc ignores NULL inputs (and the filter kills the
      // engine NULL-ordering divergence the fuzz gate found)
      .filter(col("o_totalprice").isNotNull)
      .withColumn("cents", cents(col("o_totalprice")))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
    ranked
      .groupBy(col("o_orderpriority"))
      .agg(
        max(when(col("rn") === ceil(col("n") * 0.25), col("cents"))).as("q1_cents"),
        max(when(col("rn") === ceil(col("n") * 0.50), col("cents"))).as("q2_cents"),
        max(when(col("rn") === ceil(col("n") * 0.75), col("cents"))).as("q3_cents"),
        max(col("n")).as("n"))
      .orderBy("o_orderpriority")
  }

  private val quartilesDiscSql =
    s"""SELECT o_orderpriority,
       |  MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN cents END) AS q1_cents,
       |  MAX(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN cents END) AS q2_cents,
       |  MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN cents END) AS q3_cents,
       |  MAX(n) AS n
       |FROM (
       |  SELECT o_orderpriority, ${centsSql("o_totalprice")} AS cents,
       |    row_number() OVER (PARTITION BY o_orderpriority
       |      ORDER BY ${centsSql("o_totalprice")}, o_orderkey) AS rn,
       |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
       |  FROM orders WHERE o_totalprice IS NOT NULL)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------- RANGE frames

  /** Rolling 7-day revenue per customer with a RANGE frame (value-based:
    * all rows whose order day falls in [day−6, day] — NOT the last 7 rows;
    * the two differ whenever a customer places several orders on one day,
    * and RANGE is the correct rolling-window semantics). Order key is the
    * integer epoch day, so the frame bound is exact integer arithmetic. */
  private def windowRangeRolling(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-6, 0)
    t(s, dir, "orders")
      // an undated order has no place in a date-RANGE frame; dropped on
      // BOTH sides (fuzz-gate NULL-ordering class)
      .filter(col("o_custkey") % 50 === 0 && col("o_orderdate").isNotNull)
      .withColumn("day", datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long"))
      .withColumn("cents", cents(col("o_totalprice")))
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        sum(col("cents")).over(w).as("rolling7d_cents"),
        count(lit(1)).over(w).as("rolling7d_orders"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val windowRangeRollingSql =
    s"""SELECT o_custkey, o_orderkey, day,
       |  CAST(SUM(cents) OVER w AS BIGINT) AS rolling7d_cents,
       |  COUNT(*) OVER w AS rolling7d_orders
       |FROM (
       |  SELECT o_custkey, o_orderkey,
       |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
       |    ${centsSql("o_totalprice")} AS cents
       |  FROM orders WHERE o_custkey % 50 = 0 AND o_orderdate IS NOT NULL)
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
       |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
       |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------- fuzzy match

  /** Fuzzy string matching: Levenshtein distance over candidate pairs of
    * part names bucketed by first word (never all-pairs — the same
    * block-then-verify discipline as every dedup operator here). Both
    * engines implement the identical integer DP, so distances are exact. */
  private def fuzzyMatchLevenshtein(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey"), col("p_name"),
        substring_index(col("p_name"), " ", 1).as("blk"))
    val a = p.select(col("p_partkey").as("a_key"), col("p_name").as("a_name"), col("blk"))
    val b = p.select(col("p_partkey").as("b_key"), col("p_name").as("b_name"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("a_key") < col("b_key"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 12)
      .select(col("a_key"), col("b_key"), col("dist"))
      .orderBy("a_key", "b_key")
  }

  private val fuzzyMatchLevenshteinSql =
    """WITH p AS (
      |  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
      |  FROM part WHERE p_partkey % 10 = 0)
      |SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      |FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 12
      |ORDER BY a_key, b_key""".stripMargin

  /** The SAME as-of semantics as [[asofJoin]], executed by the engine's
    * native [[graft.plans.AsOfJoinExec]] merge operator instead of the
    * tagged-union window — two physical strategies sharing one DuckDB ASOF
    * oracle (the knn_topk_agg discipline applied to a whole operator; the
    * hash compare proves the custom plan's semantics, the plan proves the
    * shape: per-side Exchange+Sort and a streaming O(1)-state merge, no
    * Window, no union). Quote side renamed c_* so the merged output keeps
    * both sides' columns addressable. */
  private def asofJoinNative(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.plans.GraftAsOf.asof(purchases, clicks,
        Seq("user_id"), Seq("c_user_id"), "ts", "c_ts")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("click_id"), col("c_ts").as("click_ts"))
      .orderBy("purchase_id")
  }

  /** The THIRD as-of formulation sharing the one DuckDB ASOF oracle: the
    * snapshot-collapse plan of the STREAMING twin
    * ([[graft.streaming.StreamingPipeline.asofEnrichStream]] — per-user
    * ts-ascending quote arrays, broadcast equi-join, row-local array
    * probe), executed here on static frames so the streaming operator's
    * exact plan is hash-checked against DuckDB like every batch query.
    * Three strategies, one oracle: tagged-union window (`asof_join`,
    * scalable both-sides-large), native merge operator
    * (`asof_join_native`, independent per-side exchanges), snapshot
    * broadcast (THIS — quote side bounded, probe side never shuffles;
    * the streaming/serving regime). */
  private def asofSnapshot(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    graft.streaming.StreamingPipeline.asofEnrichStream(ev,
        graft.streaming.StreamingPipeline.asofQuoteSnapshot(ev))
      .orderBy("purchase_id")
  }

  val all: Seq[Q] = Seq(
    Q("asof_snapshot", asofSnapshot, Some(asofJoinSql)),
    Q("asof_join_native", asofJoinNative, Some(asofJoinSql)),
    Q("approx_sketches", approxSketches, Some(approxSketchesSql)),
    Q("mode_per_group", modePerGroup, Some(modePerGroupSql)),
    Q("quartiles_disc", quartilesDisc, Some(quartilesDiscSql)),
    Q("fuzzy_match_levenshtein", fuzzyMatchLevenshtein, Some(fuzzyMatchLevenshteinSql)),
    Q("window_range_rolling", windowRangeRolling, Some(windowRangeRollingSql)),
    Q("unpivot_metrics", unpivotMetrics, Some(unpivotMetricsSql)),
    Q("gap_fill_hours", gapFillHours, Some(gapFillHoursSql)),
    Q("histogram_totalprice", histogramTotalprice, Some(histogramTotalpriceSql)),
    Q("asof_join", asofJoin, Some(asofJoinSql)),
    Q("range_join_count", rangeJoinCount, Some(rangeJoinCountSql)),
    Q("subquery_battery", subqueryBattery, Some(subqueryBatterySql)),
    Q("string_agg_group", stringAggGroup, Some(stringAggGroupSql)),
    Q("minmax_by", minmaxBy, Some(minmaxBySql)),
    Q("regexp_battery", regexpBattery, Some(regexpBatterySql)),
    Q("hash_sample", hashSample, Some(hashSampleSql)),
    Q("window_values", windowValues, Some(windowValuesSql)),
    Q("salted_agg", saltedAgg, Some(saltedAggSql)))
}
