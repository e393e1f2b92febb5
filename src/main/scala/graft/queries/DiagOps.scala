package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** Data-engineering diagnostics and sampling operators: the pre-flight
  * queries a pipeline owner runs BEFORE committing a 100 TB job — key-skew
  * profiling (is this join salt-worthy?), equi-depth histograms (where do
  * the values actually live?), deterministic stratified/per-group sampling
  * (cut a debug corpus that is reproducible on any engine), and event
  * debouncing (kill the duplicate-fire noise before sessionizing).
  *
  * Shared determinism rules (Util scaladoc): exact integer arithmetic
  * (cents / milli shares, `div` floor-equivalent only on non-negative
  * operands), md5-based portable hashing instead of engine-private
  * TABLESAMPLE seeding, unique ORDER BY keys everywhere.
  */
object DiagOps {

  // ------------------------------------------------- equi-depth histogram

  /** Equi-depth (equal-frequency) histogram of order totals, 8 buckets —
    * the complement of the equi-width `histogram_totalprice`: bucket
    * boundaries adapt to the distribution, which is what an optimizer (or
    * a human sizing shuffle partitions) actually wants to see.
    *
    * Scale shape: the same VALUE-HISTOGRAM trick as `quartiles_cont` —
    * aggregate to (value → count) with map-side combine, then one
    * cumulative window over DISTINCT VALUES (price-domain-bounded however
    * big the table; never a row-sized sort). A value's bucket is
    * floor(8 · rank_before / n): all rows of a tied value land in one
    * bucket, so heavy ties make buckets uneven — the standard equi-depth-
    * with-ties contract. Operands are non-negative counts, so Spark `div`
    * and DuckDB `//` agree (truncation = floor here; the value_bucket
    * lesson). */
  private def equiDepthHistogram(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val vc = t(s, dir, "orders")
      // NULL prices carry no depth information and would cumulate in
      // engine-dependent order (fuzz gate finding)
      .filter(col("o_totalprice").isNotNull)
      .select(cents(col("o_totalprice")).as("cents"))
      .groupBy(col("cents")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(all.orderBy(col("cents"))))
      .withColumn("n", sum(col("c")).over(all))
    vc.select((((col("cum") - col("c")) * 8) / col("n")).cast("long")
        .as("bucket"), col("cents"), col("c"))
      .groupBy(col("bucket"))
      .agg(min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"),
        sum(col("c")).as("n_rows"))
      .orderBy("bucket")
  }

  private val equiDepthHistogramSql = {
    val c = centsSql("o_totalprice")
    s"""WITH vc AS (
       |  SELECT $c AS cents, COUNT(*) AS c FROM orders
       |  WHERE o_totalprice IS NOT NULL GROUP BY 1),
       |w AS (
       |  SELECT cents, c, SUM(c) OVER (ORDER BY cents) AS cum,
       |    SUM(c) OVER () AS n
       |  FROM vc)
       |SELECT CAST((cum - c) * 8 // n AS BIGINT) AS bucket,
       |  MIN(cents) AS lo_cents, MAX(cents) AS hi_cents,
       |  CAST(SUM(c) AS BIGINT) AS n_rows
       |FROM w GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------- skew profiler

  /** Shuffle-key skew profile of the event log's user_id — the pre-flight
    * check behind every salting decision (`salted_agg` is the mitigation;
    * this is the detector). Emits the 10 heaviest keys with exact milli
    * share of total rows, plus the global distinct-key / total-row counts
    * on every row so one result answers "how bad, and how concentrated?".
    *
    * Scale shape: one map-side-combining count aggregate (key-domain-sized
    * output), a global top-10 — Spark's sort-limit pushes the limit into
    * each partition, so no full sort materializes — and a broadcast of the
    * 2-column totals row. Nothing row-sized crosses the wire twice. */
  private def skewProfile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val totals = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"))
    val top = counts.orderBy(col("n").desc, col("user_id")).limit(10)
      .withColumn("rnk",
        row_number().over(Window.partitionBy()
          .orderBy(col("n").desc, col("user_id"))))
    top.crossJoin(broadcast(totals))
      .select(col("rnk"), col("user_id"), col("n"),
        ((col("n") * 1000) / col("n_rows")).cast("long").as("share_milli"),
        col("n_keys"), col("n_rows"))
      .orderBy("rnk")
  }

  private val skewProfileSql =
    """WITH counts AS (
      |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
      |totals AS (
      |  SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows
      |  FROM counts),
      |top AS (
      |  SELECT user_id, n,
      |    row_number() OVER (ORDER BY n DESC, user_id) AS rnk
      |  FROM counts ORDER BY n DESC, user_id LIMIT 10)
      |SELECT rnk, user_id, n, n * 1000 // n_rows AS share_milli,
      |  n_keys, n_rows
      |FROM top CROSS JOIN totals ORDER BY rnk""".stripMargin

  // ------------------------------------------------------- event debounce

  /** Debounce the event log: drop an event that fires within 5 minutes of
    * the PREVIOUS event of the same (user, type) — the duplicate-fire /
    * retry-storm cleaner that runs before sessionization or funnels.
    * Lag-based (each event compares to its immediate predecessor, kept or
    * not), which makes the operator IDEMPOTENT: surviving events are
    * ≥ 5 min apart pairwise-adjacent, so a second pass keeps everything
    * (InvariantSpec pins this).
    *
    * Scale shape: one user-keyed shuffle feeding a lag window ordered by
    * (ts, event_id) — the unique tiebreak keeps equal-timestamp bursts
    * deterministic (the duplicate collapses, whichever sorts first
    * survives). Comparison in epoch MICROseconds: exact integers, no
    * truncation ambiguity between engines. */
  private def eventDebounce(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      // no timestamp → no debounce timeline; drop on BOTH sides (fuzz
      // gate: engine NULL-ordering would otherwise pick different
      // previous-event neighbors)
      .filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") >= 300000000L)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .orderBy("event_id")
  }

  private val eventDebounceSql =
    """SELECT event_id, user_id, event_type, ts FROM (
      |  SELECT event_id, user_id, event_type, ts,
      |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS prev_us
      |  FROM events WHERE ts IS NOT NULL)
      |WHERE prev_us IS NULL OR epoch_us(ts) - prev_us >= 300000000
      |ORDER BY event_id""".stripMargin

  // --------------------------------------------------- stratified sample

  /** Deterministic stratified sample of the corpus: English docs at 4/16
    * (the over-represented stratum, downsampled), every other language at
    * 8/16 — the dataset-mix rebalancing cut, reported per stratum so the
    * realized rates are auditable. Membership is the first hex digit of
    * md5(doc_id): portable, reproducible, and evaluated at the scan (no
    * shuffle, no state — the same contract as `hash_sample`, extended to
    * per-stratum rates). NULL/unknown lang takes the non-English rate via
    * an explicit COALESCE, so poisoned catalogs don't silently drop rows.
    *
    * Scale shape: scan-level predicate, then ONE map-side-combining
    * aggregate to the per-lang report. The sampled rows themselves never
    * re-shuffle. */
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    val isEn = coalesce(col("lang"), lit("")) === "en"
    t(s, dir, "documents")
      .select(col("doc_id"), coalesce(col("lang"), lit("??")).as("lang"),
        (when(isEn, h < "4").otherwise(h < "8")).as("kept"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("lang"), col("n_total"), col("n_kept"),
        ((col("n_kept") * 1000) / col("n_total")).cast("long").as("kept_milli"))
      .orderBy("lang")
  }

  private val stratifiedSampleSql =
    """WITH s AS (
      |  SELECT doc_id, COALESCE(lang, '??') AS lang,
      |    CASE WHEN COALESCE(lang, '') = 'en'
      |      THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
      |      ELSE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
      |    END AS kept
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) * 1000 // COUNT(*)
      |    AS BIGINT) AS kept_milli
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------- per-group k-sample

  /** Exactly-k-per-group deterministic sample: 3 documents per language,
    * chosen by md5(doc_id) order — the "show me a few examples of each
    * stratum" debug cut, reproducible across engines and runs (the
    * portable stand-in for per-group reservoir sampling; a true streaming
    * reservoir is the same top-k-by-random-rank shape with the hash as the
    * rank). Groups with fewer than k docs return what they have.
    *
    * Scale shape: one lang-keyed shuffle into a row_number window; the
    * rank key (md5, doc_id) is unique so ties cannot flip between runs.
    * At 100 TB this is the standard two-phase candidate cut: partial
    * top-k per partition would bound it further, and Spark's
    * WindowGroupLimit pushes exactly that below the shuffle. */
  private def groupSampleK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    t(s, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("lang", "rk")
  }

  private val groupSampleKSql =
    """SELECT lang, doc_id, n_chars, rk FROM (
      |  SELECT lang, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin

  // ------------------------------------------------ hourly error z-score

  /** Hourly error-rate anomaly flags with an EXACT integer z-score test —
    * the observability query every ingest pipeline runs, made
    * hash-comparable across engines: flag hour x when
    * (x − μ)² > 9·σ² over the trailing 24 observed hours, evaluated as
    * (n·x − S1)² > 9·(n·S2 − S1²) in BIGINT — no float mean, no float
    * stddev, no sqrt, so the |z| > 3 cut is bit-identical in Spark and
    * DuckDB (rate ≤ 1000 milli and n ≤ 24 bound every product under
    * 2⁶³). A constant history (σ = 0) flags any deviation and never
    * flags equality — the strict inequality's natural limit.
    *
    * Scale shape: the corpus collapses to one row per HOUR in the first
    * map-side-combining aggregate; the trailing window then runs over the
    * hour relation, whose size is calendar-bounded (8 760 rows/year) —
    * a single-partition window over hours is fine at ANY corpus size
    * because no per-event row survives the first aggregate. */
  private def errorZscoreHours(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("hour")).rowsBetween(-24, -1)
    t(s, dir, "events")
      // no timestamp → no hour; and a NULL hour group would enter the
      // trailing window at engine-dependent ends (fuzz gate finding)
      .filter(col("ts").isNotNull)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_tot"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
      .select(col("hour"), col("n_tot"), col("n_err"),
        floor(lit(1000.0) * col("n_err") / col("n_tot")).cast("long").as("rate_milli"))
      .withColumn("n_hist", count(lit(1)).over(w))
      .withColumn("s1", coalesce(sum(col("rate_milli")).over(w), lit(0L)))
      .withColumn("s2",
        coalesce(sum(col("rate_milli") * col("rate_milli")).over(w), lit(0L)))
      .select(col("hour"), col("n_tot"), col("n_err"), col("rate_milli"),
        col("n_hist"),
        (col("n_hist") >= 12 &&
          (col("n_hist") * col("rate_milli") - col("s1")) *
          (col("n_hist") * col("rate_milli") - col("s1")) >
          lit(9L) * (col("n_hist") * col("s2") - col("s1") * col("s1")))
          .as("is_anomaly"))
      .orderBy("hour")
  }

  private val errorZscoreHoursSql =
    """WITH h AS (
      |  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_tot,
      |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
      |r AS (
      |  SELECT hour, n_tot, CAST(n_err AS BIGINT) AS n_err,
      |    CAST(floor(1000.0 * n_err / n_tot) AS BIGINT) AS rate_milli
      |  FROM h),
      |win AS (
      |  SELECT hour, n_tot, n_err, rate_milli,
      |    COUNT(*) OVER tw AS n_hist,
      |    COALESCE(CAST(SUM(rate_milli) OVER tw AS BIGINT), 0) AS s1,
      |    COALESCE(CAST(SUM(rate_milli * rate_milli) OVER tw AS BIGINT), 0) AS s2
      |  FROM r
      |  WINDOW tw AS (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT hour, n_tot, n_err, rate_milli, n_hist,
      |  (n_hist >= 12 AND
      |   (n_hist * rate_milli - s1) * (n_hist * rate_milli - s1)
      |     > 9 * (n_hist * s2 - s1 * s1)) AS is_anomaly
      |FROM win ORDER BY hour""".stripMargin

  // ------------------------------------------------- join-size pre-flight

  /** Exact join-cardinality prediction WITHOUT running the join — the
    * pre-flight a pipeline owner runs before committing a 100 TB
    * fact-fact join: |A ⋈ B on k| = Σ_k cnt_A(k)·cnt_B(k), computed from
    * the two per-key count aggregates (each corpus-collapsed map-side)
    * joined on the KEY-COUNT relation, never the fact rows. Also reports
    * the single hottest key's contribution (the skew headline: one key
    * owning >10% of output is the salt-or-broadcast signal) and both
    * input cardinalities for selectivity math.
    *
    * Probes the three star relationships; a run costs two aggregates +
    * one dimension-sized join per relationship — seconds where the real
    * join would be hours. */
  private def joinSizeProbe(s: SparkSession, dir: String): DataFrame = {
    def probe(rel: String, a: DataFrame, b: DataFrame): DataFrame = {
      val ca = a.groupBy("k").agg(count(lit(1)).as("na"))
      val cb = b.groupBy("k").agg(count(lit(1)).as("nb"))
      ca.join(cb, "k")
        .select((col("na") * col("nb")).as("prod"))
        .agg(coalesce(sum(col("prod")), lit(0L)).as("join_rows"),
          coalesce(max(col("prod")), lit(0L)).as("max_key_rows"))
        .crossJoin(a.agg(count(lit(1)).as("n_left")))
        .crossJoin(b.agg(count(lit(1)).as("n_right")))
        .select(lit(rel).as("relationship"), col("n_left"), col("n_right"),
          col("join_rows"), col("max_key_rows"))
    }
    val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
    val c = t(s, dir, "customer")
    probe("lineitem*orders",
        l.select(col("l_orderkey").as("k")), o.select(col("o_orderkey").as("k")))
      .unionByName(probe("orders*customer",
        o.select(col("o_custkey").as("k")), c.select(col("c_custkey").as("k"))))
      .unionByName(probe("lineitem*lineitem_by_part",
        l.select(col("l_partkey").as("k")), l.select(col("l_partkey").as("k"))))
      .orderBy("relationship")
  }

  private val joinSizeProbeSql = {
    def probe(rel: String, aSel: String, bSel: String) =
      s"""SELECT '$rel' AS relationship,
         |  (SELECT COUNT(*) FROM ($aSel)) AS n_left,
         |  (SELECT COUNT(*) FROM ($bSel)) AS n_right,
         |  CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS join_rows,
         |  CAST(COALESCE(MAX(na * nb), 0) AS BIGINT) AS max_key_rows
         |FROM (SELECT k, COUNT(*) AS na FROM ($aSel) GROUP BY 1) ca
         |JOIN (SELECT k, COUNT(*) AS nb FROM ($bSel) GROUP BY 1) cb USING (k)"""
    Seq(
      probe("lineitem*orders",
        "SELECT l_orderkey AS k FROM lineitem", "SELECT o_orderkey AS k FROM orders"),
      probe("orders*customer",
        "SELECT o_custkey AS k FROM orders", "SELECT c_custkey AS k FROM customer"),
      probe("lineitem*lineitem_by_part",
        "SELECT l_partkey AS k FROM lineitem", "SELECT l_partkey AS k FROM lineitem"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
      .stripMargin
  }

  /** Z-order layout packing with measured data-skipping benefit — the
    * 100 TB storage-layout decision as an oracle-checked query. Rows get a
    * 16-bit Morton code interleaving two pruning dimensions (customer
    * bucket `d1` = pmod(o_custkey, 256) and a 0-255 day-of-year scale
    * `d2`), are packed into 16 equal "files" two ways (z-ordered vs
    * time-ordered linear ingest), and the output is each file's min/max
    * envelope per dimension plus `probe_hit` — whether a selective 2-dim
    * probe rectangle (d1, d2 ∈ [64, 79]) intersects the envelope, i.e.
    * whether a min/max-pruning reader (parquet row-group stats, Delta
    * file stats) must read that file. Two independent probes, one per
    * dimension (d1 ∈ [64, 79]; d2 ∈ [64, 79]): the z-order layout bounds
    * BOTH dimensions per file so both probes prune to a few files, while
    * the time-ordered linear layout prunes only the time probe — the
    * customer-keyed probe must read every linear file. ZorderSpec asserts
    * the measured benefit, not just shape.
    *
    * The bit interleave is an unrolled integer expression (exact on both
    * engines; pmod keeps dirty negative keys total). ntile needs a global
    * sort here for the deterministic oracle; the production write path is
    * `repartitionByRange(z)` + sortWithinPartitions — same layout, no
    * single-partition window. NULL dims are filtered identically on both
    * sides (a NULL key can't be range-pruned); sort ties share one z —
    * interchangeable for every output column, so engine tie order can't
    * diverge. */
  private def zorderPack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val zExpr = (0 until 8).map(i =>
      s"(shiftleft(shiftright(d1, $i) & 1, ${2 * i + 1}) + shiftleft(shiftright(d2, $i) & 1, ${2 * i}))")
      .mkString(" + ")
    val base = t(s, dir, "orders")
      .where(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(
        coalesce(col("o_orderkey"), lit(-1L)).as("k"),
        expr("CAST(((o_custkey % 256) + 256) % 256 AS INT)").as("d1"),
        expr("CAST(floor(((dayofyear(o_orderdate) - 1) * 256) / 366.0) AS INT)").as("d2"))
      .withColumn("z", expr(zExpr))
    val zFiles = base
      .withColumn("file_id", ntile(16).over(Window.orderBy(col("z"), col("k"))))
      .withColumn("layout", lit("zorder"))
    val linFiles = base
      .withColumn("file_id", ntile(16).over(Window.orderBy(col("d2"), col("k"), col("d1"))))
      .withColumn("layout", lit("linear"))
    zFiles.unionByName(linFiles)
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min("d1").as("min_d1"), max("d1").as("max_d1"),
        min("d2").as("min_d2"), max("d2").as("max_d2"))
      .withColumn("probe_d1_hit", col("max_d1") >= 64 && col("min_d1") <= 79)
      .withColumn("probe_d2_hit", col("max_d2") >= 64 && col("min_d2") <= 79)
      .orderBy("layout", "file_id")
  }

  private val zorderPackSql = {
    val zExpr = (0 until 8).map(i =>
      s"((((d1 >> $i) & 1) << ${2 * i + 1}) + (((d2 >> $i) & 1) << ${2 * i}))")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT COALESCE(o_orderkey, -1) AS k,
       |    CAST(((o_custkey % 256) + 256) % 256 AS INT) AS d1,
       |    CAST(floor(((dayofyear(o_orderdate) - 1) * 256) / 366.0) AS INT) AS d2
       |  FROM orders
       |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
       |z AS (SELECT k, d1, d2, $zExpr AS z FROM base),
       |files AS (
       |  SELECT 'zorder' AS layout,
       |    CAST(NTILE(16) OVER (ORDER BY z, k) AS INT) AS file_id, d1, d2 FROM z
       |  UNION ALL
       |  SELECT 'linear' AS layout,
       |    CAST(NTILE(16) OVER (ORDER BY d2, k, d1) AS INT) AS file_id, d1, d2 FROM z)
       |SELECT layout, file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(d1) AS min_d1, MAX(d1) AS max_d1,
       |  MIN(d2) AS min_d2, MAX(d2) AS max_d2,
       |  (MAX(d1) >= 64 AND MIN(d1) <= 79) AS probe_d1_hit,
       |  (MAX(d2) >= 64 AND MIN(d2) <= 79) AS probe_d2_hit
       |FROM files GROUP BY layout, file_id
       |ORDER BY layout, file_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("zorder_pack", zorderPack, Some(zorderPackSql)),
    Q("join_size_probe", joinSizeProbe, Some(joinSizeProbeSql)),
    Q("error_zscore_hours", errorZscoreHours, Some(errorZscoreHoursSql)),
    Q("equi_depth_histogram", equiDepthHistogram, Some(equiDepthHistogramSql)),
    Q("skew_profile", skewProfile, Some(skewProfileSql)),
    Q("event_debounce", eventDebounce, Some(eventDebounceSql)),
    Q("stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    Q("group_sample_k", groupSampleK, Some(groupSampleKSql)))
}
