package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** The relational capability surface Spark gives the engine for free
  * (SURVEY §2.4 "absent" rows): group-by aggregation, multi-way joins,
  * windows, set ops, rollup/cube, top-k, JSON access, string functions —
  * each expressed Catalyst-first and oracle-checked.
  *
  * Scale discipline: aggregates use partial (map-side) aggregation by
  * construction; dimension joins (region/nation/customer) are broadcast;
  * every query's sort key is unique for deterministic output.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: filter → groupBy → decimal sums.
    * Filter + column pruning push into the parquet scan.
    *
    * Aggregation is exact decimal; the FINAL projection casts to DOUBLE
    * because the driver's pandas compare sees Spark parquet DECIMAL as
    * `decimal.Decimal` objects but DuckDB DECIMAL as float64 — a dtype
    * mismatch that hashes unequal even when values are identical (r01
    * lesson). decimal→double is the same nearest-double in both engines. */
  private def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(18,2)"
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast(dec).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast(dec).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("decimal(28,4)").cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-12-01'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** 3-dim star join: revenue per region/nation. Dimensions broadcast. */
  private def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(cents(col("o_totalprice"))).as("revenue_cents"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  private val revenueByNationSql =
    s"""SELECT r_name, n_name, CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents,
       |  COUNT(*) AS n_orders
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Top-3 orders per priority: ranking window with unique tiebreak. */
  private def groupTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rk")
  }

  private val groupTopkSql =
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
      |        ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders)
      |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin

  /** Exact distinct aggregation per group. */
  private def distinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val distinctAggSql =
    """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** INTERSECT / EXCEPT / UNION in one tagged result. */
  private def setOps(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    val b = t(s, dir, "customer").filter(col("c_nationkey") < 12)
      .select(col("c_custkey").as("k"))
    a.intersect(b).withColumn("tag", lit("both"))
      .unionByName(a.except(b).withColumn("tag", lit("only_building")))
      .unionByName(b.except(a).withColumn("tag", lit("only_lownation")))
      .select("tag", "k").orderBy("tag", "k")
  }

  private val setOpsSql =
    """WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     b AS (SELECT c_custkey AS k FROM customer WHERE c_nationkey < 12)
      |SELECT 'both' AS tag, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      |UNION ALL SELECT 'only_building', k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
      |UNION ALL SELECT 'only_lownation', k FROM (SELECT k FROM b EXCEPT SELECT k FROM a)
      |ORDER BY tag, k""".stripMargin

  /** Global top-k with unique tiebreak; doubles pass through bit-exact. */
  private def topkOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select("o_orderkey", "o_totalprice")

  private val topkOrdersSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Running total + lag per customer (frame-spec windows, exact cents). */
  private def windowRunning(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("order_cents", cents(col("o_totalprice")))
      .withColumn("running_cents",
        sum(col("order_cents")).over(byCust.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prev_cents", lag(col("order_cents"), 1).over(byCust))
      .select("o_custkey", "o_orderkey", "order_cents", "running_cents", "prev_cents")
      .orderBy("o_custkey", "o_orderkey")
  }

  // NULLS FIRST on every window ORDER BY key: Spark's ASC default — DuckDB
  // defaults NULLS LAST, so a NULL o_orderdate would walk the running sum
  // in a different order (differential fuzz gate finding; applies to every
  // nullable window key in this file's oracles)
  private val windowRunningSql =
    s"""SELECT o_custkey, o_orderkey, ${centsSql("o_totalprice")} AS order_cents,
       |  CAST(SUM(${centsSql("o_totalprice")}) OVER (PARTITION BY o_custkey
       |    ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
       |  lag(${centsSql("o_totalprice")}, 1) OVER (PARTITION BY o_custkey
       |    ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST) AS prev_cents
       |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ROLLUP with subtotal rows. */
  private def rollupAgg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("acctbal_cents"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  private val rollupAggSql =
    s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
       |  CAST(SUM(${centsSql("c_acctbal")}) AS BIGINT) AS acctbal_cents
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** CUBE over two order dimensions. */
  private def cubeAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val cubeAggSql =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** JSON field access (events.props is a JSON object). */
  private def jsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        // try_cast + oracle json_valid guard: Spark's get_json_object
        // returns NULL on malformed JSON while DuckDB's json_extract
        // ERRORS, and an ANSI cast of a non-numeric extract would throw
        // here — both found by the differential fuzz gate
        get_json_object(col("props"), "$.k").try_cast("long").as("k"))
      .orderBy("event_id")

  private val jsonExtractSql =
    """SELECT event_id,
      |  CASE WHEN json_valid(props)
      |       THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** Tumbling 1-hour windows per event type (batch twin of the streaming
    * windowed aggregation). */
  private def windowTumbling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
      .orderBy("hour", "event_type")

  private val windowTumblingSql =
    s"""SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       |  CAST(SUM(${centsSql("value")}) AS BIGINT) AS value_cents
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Gap-based sessionization (30-min inactivity): lag → flag → cumulative
    * session id → per-user counts. Exact µs integer arithmetic. */
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    t(s, dir, "events")
      // an event with no timestamp cannot be placed on a session timeline —
      // drop it on BOTH sides (fuzz gate: Spark orders NULL ts first,
      // DuckDB last, so keeping them makes gap flags engine-dependent)
      .filter(col("ts").isNotNull)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sess_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"))
      .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  private val sessionizeSql =
    """WITH flagged AS (
      |  SELECT user_id,
      |    CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events WHERE ts IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** String-function battery over part names. */
  private def stringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        size(split(col("p_name"), " ")).as("n_words"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        substring(col("p_brand"), 1, 5).as("brand_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        translate(col("p_type"), " ", "_").as("type_snake"))
      .orderBy("p_partkey")

  private val stringFuncsSql =
    """SELECT p_partkey, upper(p_name) AS name_upper,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
      |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  substring(p_brand, 1, 5) AS brand_prefix,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  translate(p_type, ' ', '_') AS type_snake
      |FROM part ORDER BY p_partkey""".stripMargin

  /** GROUP BY + HAVING, joined back to the dimension. */
  private def havingFilter(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val agg = o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("spend_cents"))
      .filter(col("n_orders") >= 12)
    agg.join(broadcast(c), agg("o_custkey") === c("c_custkey"))
      .select(col("o_custkey"), col("c_name"), col("n_orders"), col("spend_cents"))
      .orderBy("o_custkey")
  }

  private val havingFilterSql =
    s"""SELECT o_custkey, c_name, n_orders, spend_cents FROM (
       |  SELECT o_custkey, COUNT(*) AS n_orders,
       |    CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS spend_cents
       |  FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12) a
       |JOIN customer ON o_custkey = c_custkey ORDER BY o_custkey""".stripMargin

  /** UNION-distinct of two key sets. */
  private def unionDedup(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("k"))
    val b = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    a.union(b).distinct().orderBy("k")
  }

  private val unionDedupSql =
    """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
      |UNION SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY k""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q1_agg", q1Agg, Some(q1AggSql)),
    Q("revenue_by_nation", revenueByNation, Some(revenueByNationSql)),
    Q("group_topk", groupTopk, Some(groupTopkSql)),
    Q("distinct_agg", distinctAgg, Some(distinctAggSql)),
    Q("set_ops", setOps, Some(setOpsSql)),
    Q("topk_orders", topkOrders, Some(topkOrdersSql)),
    Q("window_running", windowRunning, Some(windowRunningSql)),
    Q("rollup_agg", rollupAgg, Some(rollupAggSql)),
    Q("cube_agg", cubeAgg, Some(cubeAggSql)),
    Q("json_extract", jsonExtract, Some(jsonExtractSql)),
    Q("window_tumbling", windowTumbling, Some(windowTumblingSql)),
    Q("sessionize", sessionize, Some(sessionizeSql)),
    Q("string_funcs", stringFuncs, Some(stringFuncsSql)),
    Q("having_filter", havingFilter, Some(havingFilterSql)),
    Q("union_dedup", unionDedup, Some(unionDedupSql)))
}
