package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** Second relational wave: rank-function battery, calendar functions,
  * pivot, grouping sets, array functions, conditional functions. */
object Relational2 {

  /** dense_rank / rank / ntile / percent_rank / cume_dist in one window.
    * percent_rank and cume_dist are single IEEE divisions of exact ints —
    * deterministic cross-engine. */
  private def windowRanks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"),
        dense_rank().over(w).as("drk"),
        rank().over(w).as("rk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("prk"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  private val windowRanksSql =
    """SELECT o_orderpriority, o_orderkey,
      |  CAST(dense_rank() OVER w AS INT) AS drk,
      |  CAST(rank() OVER w AS INT) AS rk,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS prk,
      |  cume_dist() OVER w AS cd
      |FROM orders WHERE o_orderkey % 20 = 0
      |-- NULLS FIRST = Spark's ASC default; DuckDB defaults NULLS LAST, so
      |-- a NULL o_custkey would rank at opposite ends (fuzz gate finding)
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Calendar-function battery. Spark dayofweek is 1=Sunday; DuckDB's is
    * 0=Sunday — the oracle compensates. */
  private def dateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow1"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        last_day(col("o_orderdate")).as("month_end"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).as("days_since_95"))
      .orderBy("o_orderkey")

  private val dateFuncsSql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow1,
      |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
      |  CAST(last_day(o_orderdate) AS DATE) AS month_end,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Pivot order counts by status (fixed pivot values → stable schema).
    * Oracle expresses the same as conditional aggregation. */
  private def pivotStatus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  private val pivotStatusSql =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Explicit GROUPING SETS (via SQL — the DataFrame API spells it cube/
    * rollup; arbitrary sets need the SQL form in both engines). */
  private def groupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  SUM(${centsSql("o_totalprice")}) AS total_cents
         |FROM orders_gs
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  private val groupingSetsSql =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Array-function battery over quantized embeddings (exact ints).
    *
    * Array-valued results are rendered as comma-joined strings in the final
    * projection: the driver's pandas compare cannot hash list cells (r01
    * array_funcs crashed with "unhashable type: numpy.ndarray"), so output
    * columns must be scalar. */
  private def arrayFuncs(s: SparkSession, dir: String): DataFrame = {
    val q = transform(col("embedding"), x => round(x.cast("double") * 1000, 0).cast("long"))
    t(s, dir, "embeddings")
      .select(col("vec_id"), q.as("q"))
      .select(col("vec_id"),
        size(col("q")).as("dims"),
        // size-guarded: ANSI element_at throws INVALID_ARRAY_INDEX on an
        // empty array, while DuckDB q[1] is NULL — guard to the DuckDB
        // (and pre-ANSI) semantics so a degenerate vector degrades, not dies
        when(size(col("q")) > 0, element_at(col("q"), 1)).as("first_q"),
        when(size(col("q")) > 0, element_at(col("q"), -1)).as("last_q"),
        concat_ws(",", slice(col("q"), 1, 4)).as("head4"),
        array_max(col("q")).as("max_q"),
        array_min(col("q")).as("min_q"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("sum_q"),
        array_position(col("q"), array_max(col("q"))).cast("long").as("argmax1"),
        size(array_distinct(col("q"))).as("n_distinct"),
        array_contains(col("q"), 0L).as("has_zero"),
        concat_ws(",", reverse(slice(sort_array(col("q"), asc = false), 1, 3))).as("top3_asc"))
      .orderBy("vec_id")
  }

  private val arrayFuncsSql =
    s"""WITH e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000, 0) AS BIGINT)) AS q
       |  FROM embeddings)
       |SELECT vec_id,
       |  CAST(len(q) AS INT) AS dims,
       |  q[1] AS first_q,
       |  q[-1] AS last_q,
       |  -- COALESCE: Spark's concat_ws never returns NULL (a NULL array
       |  -- gives ''), DuckDB's array_to_string propagates it (fuzz gate)
       |  COALESCE(array_to_string(q[1:4], ','), '') AS head4,
       |  list_max(q) AS max_q,
       |  list_min(q) AS min_q,
       |  -- empty array: Spark's aggregate() returns its 0 seed, DuckDB's
       |  -- list_sum returns NULL; a NULL array is NULL in both (fuzz gate)
       |  CASE WHEN q IS NULL THEN NULL
       |       ELSE COALESCE(CAST(list_sum(q) AS BIGINT), 0) END AS sum_q,
       |  CAST(list_position(q, list_max(q)) AS BIGINT) AS argmax1,
       |  CAST(len(list_distinct(q)) AS INT) AS n_distinct,
       |  list_contains(q, 0) AS has_zero,
       |  COALESCE(array_to_string(
       |    list_reverse(list_slice(list_reverse_sort(q), 1, 3)), ','), '') AS top3_asc
       |FROM e ORDER BY vec_id""".stripMargin

  /** Conditional/null-handling battery. */
  private def condFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)")).as("seg_or"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_band"),
        greatest(col("c_nationkey"), lit(10)).as("nk_floor10"),
        least(col("c_nationkey"), lit(10)).as("nk_cap10"),
        (col("c_custkey") % 7 === 0).as("lucky"))
      .orderBy("c_custkey")

  private val condFuncsSql =
    """SELECT c_custkey,
      |  nullif(c_mktsegment, 'BUILDING') AS seg_nb,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg_or,
      |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid'
      |       ELSE 'high' END AS bal_band,
      |  CAST(greatest(c_nationkey, 10) AS INT) AS nk_floor10,
      |  CAST(least(c_nationkey, 10) AS INT) AS nk_cap10,
      |  c_custkey % 7 = 0 AS lucky
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Exact median (lower of the two middle elements) per group via
    * row_number selection — deterministic where percentile interpolation
    * would be float-divergent cross-engine. */
  private def exactMedian(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cents"), col("o_orderkey"))
    t(s, dir, "orders")
      // a median ignores NULL inputs (standard aggregate semantics); the
      // filter also kills the engine NULL-ordering divergence the fuzz
      // gate found (Spark ranks NULL cents first, DuckDB last)
      .filter(col("o_totalprice").isNotNull)
      .withColumn("cents", cents(col("o_totalprice")))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
      .filter(col("rn") === floor((col("n") + 1) / 2)) // integer lower-median index
      .select(col("o_orderpriority"), col("cents").as("median_lo_cents"), col("n"))
      .orderBy("o_orderpriority")
  }

  private val exactMedianSql =
    s"""SELECT o_orderpriority, cents AS median_lo_cents, n FROM (
       |  SELECT o_orderpriority, ${centsSql("o_totalprice")} AS cents,
       |    row_number() OVER (PARTITION BY o_orderpriority
       |      ORDER BY ${centsSql("o_totalprice")}, o_orderkey) AS rn,
       |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
       |  FROM orders WHERE o_totalprice IS NOT NULL)
       |WHERE rn = (n + 1) // 2 ORDER BY o_orderpriority""".stripMargin

  /** Exact moment sums per segment (n, Σ, Σ²) — the sufficient statistics
    * for mean/variance, kept in exact integers so downstream float math is
    * the consumer's single division, not the engine's aggregation.
    *
    * Domain bound (StarPoisonSpec documents it): the int64 Σc² overflows
    * once any |cents| exceeds ~3.0e9 (a ~30M-unit balance in one row) or
    * the squared mass accumulates past 2⁶³ — and it overflows IDENTICALLY
    * in both engines (Spark ANSI ARITHMETIC_OVERFLOW, DuckDB BIGINT
    * overflow), which is the engine-faithful contract. A deployment whose
    * balances approach that bound widens both sides to DECIMAL(38,0). */
  private def statsAgg(s: SparkSession, dir: String): DataFrame = {
    val c = cents(col("c_acctbal"))
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(c).as("sum_cents"),
        sum(c * c).as("sum_sq_cents"),
        min(c).as("min_cents"),
        max(c).as("max_cents"))
      .orderBy("c_mktsegment")
  }

  private val statsAggSql = {
    val c = centsSql("c_acctbal")
    s"""SELECT c_mktsegment, COUNT(*) AS n,
       |  CAST(SUM($c) AS BIGINT) AS sum_cents,
       |  CAST(SUM($c * $c) AS BIGINT) AS sum_sq_cents,
       |  MIN($c) AS min_cents, MAX($c) AS max_cents
       |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("exact_median", exactMedian, Some(exactMedianSql)),
    Q("stats_agg", statsAgg, Some(statsAggSql)),
    Q("window_ranks", windowRanks, Some(windowRanksSql)),
    Q("date_funcs", dateFuncs, Some(dateFuncsSql)),
    Q("pivot_status", pivotStatus, Some(pivotStatusSql)),
    Q("grouping_sets", groupingSets, Some(groupingSetsSql)),
    Q("array_funcs", arrayFuncs, Some(arrayFuncsSql)),
    Q("cond_funcs", condFuncs, Some(condFuncsSql)))
}
