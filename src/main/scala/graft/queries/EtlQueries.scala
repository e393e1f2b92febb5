package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Dedup, Merge, Parsers}
import Util._

/** The reference's own operator surface (SURVEY §2) exercised over the
  * driver testdata, each with a DuckDB oracle twin:
  *
  *  - O-20 window dedup            → dedup_latest
  *  - O-23 conditional merge       → conditional_merge
  *  - O-17/18 anti-join discovery  → anti_join / semi_join
  *  - O-15/E-6 date parsing        → parse_dates_roundtrip
  *  - O-15/E-8 decimal parsing     → parse_decimals_localized
  *  - E-2 key gate                 → nfe_key_gate
  *  - O-14 lineage column          → lineage_file_counts
  *  - O-8/E-15 backfill rendering  → backfill_render
  *  - O-24 archive audit counts    → archive_audit
  */
object EtlQueries {

  /** O-20: latest event per user (events plays staging; user_id plays
    * chave_nfe, ts plays data_ultima_ocr; event_id is the deterministic
    * tiebreak the reference gets from data_insercao). */
  private def dedupLatest(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    Dedup.latestPerKey(ev, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("user_id")
  }

  private val dedupLatestSql =
    """SELECT user_id, event_id, ts, event_type, value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** O-23: two event snapshots merged with the reference's three policies.
    * cur = latest even-id event per user, upd = latest odd-id event per user
    * (value NULLed below 50 to exercise COALESCE). ts guards newer-wins. */
  private def conditionalMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    def snap(parity: Int): DataFrame =
      Dedup.latestPerKey(ev.filter(col("event_id") % 2 === parity),
        Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("ts"), col("event_type"),
          when(col("value") < 50, lit(null)).otherwise(col("value")).as("value"))
    val merged = Merge.conditionalMerge(
      snap(0), snap(1), key = "user_id", eventTs = "ts",
      policies = Map(
        "ts" -> Merge.NewerEventWins,
        "event_type" -> Merge.NewerEventWins,
        "value" -> Merge.CoalesceKeepOld))
    merged.orderBy("user_id")
  }

  private val conditionalMergeSql =
    """WITH snap0 AS (
      |  SELECT user_id, ts, event_type, CASE WHEN value < 50 THEN NULL ELSE value END AS value
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events WHERE event_id % 2 = 0) WHERE rn = 1),
      |snap1 AS (
      |  SELECT user_id, ts, event_type, CASE WHEN value < 50 THEN NULL ELSE value END AS value
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events WHERE event_id % 2 = 1) WHERE rn = 1)
      |SELECT COALESCE(u.user_id, c.user_id) AS user_id,
      |  CASE WHEN c.user_id IS NULL THEN u.ts
      |       WHEN u.user_id IS NULL THEN c.ts
      |       WHEN u.ts > c.ts THEN u.ts ELSE c.ts END AS ts,
      |  CASE WHEN c.user_id IS NULL THEN u.event_type
      |       WHEN u.user_id IS NULL THEN c.event_type
      |       WHEN u.ts > c.ts THEN u.event_type ELSE c.event_type END AS event_type,
      |  CASE WHEN c.user_id IS NULL THEN u.value
      |       WHEN u.user_id IS NULL THEN c.value
      |       ELSE COALESCE(u.value, c.value) END AS value
      |FROM snap0 c FULL OUTER JOIN snap1 u ON c.user_id = u.user_id
      |ORDER BY user_id""".stripMargin

  /** O-17/18: orders whose customer is NOT in a segment (left_anti). */
  private def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "AUTOMOBILE")
    o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
  }

  private val antiJoinSql =
    """SELECT o_orderkey, o_custkey FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM customer c
      |  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'AUTOMOBILE')
      |ORDER BY o_orderkey""".stripMargin

  /** Semi-join twin (EXISTS). */
  private def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "AUTOMOBILE")
    o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
  }

  private val semiJoinSql =
    """SELECT o_orderkey, o_custkey FROM orders o
      |WHERE EXISTS (SELECT 1 FROM customer c
      |  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'AUTOMOBILE')
      |ORDER BY o_orderkey""".stripMargin

  /** E-6 roundtrip: render o_orderdate into the five accepted input formats
    * (rotating by key) plus the zero sentinel, parse with parseBrDate; the
    * oracle states the expected RESULT (the identity) rather than mirroring
    * the mechanism. */
  private def parseDatesRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val d = col("o_orderdate")
    val rendered = when(col("o_orderkey") % 97 === 0, lit("00/00/0000"))
      .when(col("o_orderkey") % 5 === 0, date_format(d, "dd/MM/yyyy"))
      .when(col("o_orderkey") % 5 === 1, date_format(d, "dd/MM/yyyy HH:mm:ss"))
      .when(col("o_orderkey") % 5 === 2, date_format(d, "yyyy-MM-dd"))
      .when(col("o_orderkey") % 5 === 3, date_format(d, "yyyyMMdd"))
      .otherwise(date_format(d, "dd-MM-yyyy"))
    o.select(col("o_orderkey"), Parsers.parseBrDate(rendered).as("parsed_date"))
      .orderBy("o_orderkey")
  }

  private val parseDatesRoundtripSql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE CAST(o_orderdate AS DATE) END AS parsed_date
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** E-8 roundtrip: build localized decimal strings from integer parts
    * (exact in both engines), parse with parseValor; oracle computes the
    * expected decimal from the same integers via string cast. */
  private def parseDecimalsLocalized(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val whole = (col("o_orderkey") % 90000 + 1000).cast("long")
    val frac = (col("o_orderkey") % 100).cast("long")
    val ptBr = concat((whole / 1000).cast("long"), lit("."),
      lpad((whole % 1000).cast("string"), 3, "0"), lit(","),
      lpad(frac.cast("string"), 2, "0"))
    val enUs = concat((whole / 1000).cast("long"), lit(","),
      lpad((whole % 1000).cast("string"), 3, "0"), lit("."),
      lpad(frac.cast("string"), 2, "0"))
    val plain = concat(whole, lit(","), lpad(frac.cast("string"), 2, "0"))
    val fallback = concat(lit("R$ "), ptBr)
    val rendered = when(col("o_orderkey") % 4 === 0, ptBr)
      .when(col("o_orderkey") % 4 === 1, enUs)
      .when(col("o_orderkey") % 4 === 2, plain)
      .otherwise(fallback)
    // Output as exact integer cents, not DECIMAL: the driver's pandas
    // compare sees Spark DECIMAL as Decimal objects vs DuckDB's float64
    // (r01 hash mismatch). DECIMAL(15,2)*100 → BIGINT is lossless.
    o.select(col("o_orderkey"),
        (Parsers.parseValor(rendered) * 100).cast("long").as("parsed_cents"))
      .orderBy("o_orderkey")
  }

  private val parseDecimalsLocalizedSql =
    """SELECT o_orderkey,
      |  CAST(CAST((o_orderkey % 90000 + 1000) || '.' || lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0')
      |       AS DECIMAL(15,2)) * 100 AS BIGINT) AS parsed_cents
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** E-2: the 44-digit key gate over synthesized keys (clean / punctuated /
    * too-short by key mod 3). */
  private def nfeKeyGate(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val base = lpad(col("o_orderkey").cast("string"), 44, "0")
    val input = when(col("o_orderkey") % 3 === 0, base)
      .when(col("o_orderkey") % 3 === 1,
        concat(substring(base, 1, 4), lit("."), substring(base, 5, 40)))
      .otherwise(substring(base, 1, 40))
    o.select(col("o_orderkey"), Parsers.nfeKey44(input).as("nfe_key"))
      .orderBy("o_orderkey")
  }

  private val nfeKeyGateSql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 2 THEN NULL
      |       ELSE lpad(CAST(o_orderkey AS VARCHAR), 44, '0') END AS nfe_key
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** O-14: lineage via input_file_name() aggregated to per-file row counts. */
  private def lineageFileCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("file", element_at(split(input_file_name(), "/"), -1))
      .groupBy("file").agg(count(lit(1)).as("n_rows"))
      .orderBy("file")

  private val lineageFileCountsSql =
    "SELECT 'lineitem.parquet' AS file, COUNT(*) AS n_rows FROM lineitem"

  /** O-8/E-15: schema-driven rendering of typed columns back to staging
    * text (timestamp → dd/MM/yyyy HH:mm:ss, int → plain string, missing →
    * NULL). */
  private def backfillRender(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.select(
      col("o_orderkey"),
      Parsers.renderAsText(col("o_orderdate"),
        org.apache.spark.sql.types.TimestampType).as("orderdate_text"),
      Parsers.renderAsText(col("o_custkey"),
        org.apache.spark.sql.types.LongType).as("custkey_text"),
      lit(null).cast("string").as("missing_col"))
      .orderBy("o_orderkey")
  }

  private val backfillRenderSql =
    """SELECT o_orderkey, strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS orderdate_text,
      |  CAST(o_custkey AS VARCHAR) AS custkey_text,
      |  CAST(NULL AS VARCHAR) AS missing_col
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** O-24/O-22: archive audit counts (moved == source rows, one batch id —
    * the invariant the reference asserts at 04_archive_pedidos.py:49-50). */
  private def archiveAudit(s: SparkSession, dir: String): DataFrame = {
    val staged = t(s, dir, "events")
      .withColumn("batch_id", lit("batch-0"))
      .withColumn("hist_id", monotonically_increasing_id())
    staged.agg(
      count(lit(1)).as("moved"),
      countDistinct(col("batch_id")).as("n_batches"),
      countDistinct(col("hist_id")).as("n_unique_ids"))
  }

  private val archiveAuditSql =
    """SELECT COUNT(*) AS moved, CAST(1 AS BIGINT) AS n_batches,
      |  COUNT(*) AS n_unique_ids FROM events""".stripMargin

  /** Schema-driven column profiling: per-column null and distinct counts in
    * ONE aggregate pass over the table (the agg list is generated from
    * df.schema — the same schema-walking idiom as the reference's backfill
    * renderer, O-8), then unpivoted to long form. At 100 TB profiling must
    * be one scan, never one scan per column. */
  /** Single source of truth for the profiled column set — the Spark side
    * asserts the live schema matches so drift fails fast with a clear
    * message instead of as a confusing oracle hash mismatch. */
  private val profiledOrdersCols = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  private def profileColumns(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cols = o.schema.fieldNames.toSeq
    require(cols.sorted == profiledOrdersCols.sorted,
      s"orders schema drifted: live=$cols, oracle mirrors=$profiledOrdersCols")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"))
    }
    val wide = o.agg(aggs.head, aggs.tail: _*)
    val pairs = cols.map(c =>
      struct(lit(c).as("col_name"), col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct")))
    wide.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.n_null").as("n_null"),
        col("p.n_distinct").as("n_distinct"))
      .orderBy("col_name")
  }

  private def profileColumnsSql: String = {
    profiledOrdersCols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Referential-integrity audit: child/orphan counts for the star-schema
    * relationships via anti-joins on the parent keys (the reference's key
    * gates generalized to cross-table contracts). No broadcast hint: the
    * parent side ranges from 25 rows (nation) to the orders key set, and a
    * forced broadcast of a fact-sized key set would OOM the driver at
    * scale — the planner (plus AQE) picks broadcast vs shuffle per side. */
  private def refIntegrityAudit(s: SparkSession, dir: String): DataFrame = {
    def audit(rel: String, child: DataFrame, key: String,
        parentKeys: DataFrame): DataFrame = {
      val orphans = child.join(parentKeys, Seq(key), "left_anti")
      child.agg(count(lit(1)).as("n_child")).crossJoin(
        orphans.agg(count(lit(1)).as("n_orphan")))
        .select(lit(rel).as("relationship"), col("n_child"), col("n_orphan"))
    }
    val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
    val l = t(s, dir, "lineitem"); val n = t(s, dir, "nation")
    audit("orders->customer",
        o.select(col("o_custkey").as("k")), "k", c.select(col("c_custkey").as("k")))
      .unionByName(audit("lineitem->orders",
        l.select(col("l_orderkey").as("k")), "k", o.select(col("o_orderkey").as("k"))))
      .unionByName(audit("customer->nation",
        c.select(col("c_nationkey").as("k")), "k", n.select(col("n_nationkey").as("k"))))
      .orderBy("relationship")
  }

  private val refIntegrityAuditSql =
    """SELECT 'orders->customer' AS relationship, (SELECT COUNT(*) FROM orders) AS n_child,
      |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |     (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)) AS n_orphan
      |UNION ALL
      |SELECT 'lineitem->orders', (SELECT COUNT(*) FROM lineitem),
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM orders WHERE o_orderkey = l.l_orderkey))
      |UNION ALL
      |SELECT 'customer->nation', (SELECT COUNT(*) FROM customer),
      |  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
      |     (SELECT 1 FROM nation WHERE n_nationkey = c.c_nationkey))
      |ORDER BY relationship""".stripMargin

  /** Snapshot reconciliation (the DW audit after any backfill/migration):
    * classify every key as added / removed / changed / unchanged between
    * two snapshots of the orders table, using a ROW HASH so the shuffle
    * carries (key, 32-byte digest) instead of whole rows — the plan that
    * still works when the row is 400 columns wide. The two snapshots are
    * deterministic slices of the same base (old drops key%10=0, new drops
    * key%7=3 and bumps totalprice on key%11=0), so the result is stable
    * and oracle-checkable without a second table on disk.
    *
    * Scale shape: hash computed AT THE SCAN (row-local, codegen), one
    * full-outer sort-merge join on the key, then a 4-group aggregate.
    * Min/max key per class bound the blast radius for the on-call reading
    * the audit. */
  private def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders").select(
      col("o_orderkey").as("key"),
      cents(col("o_totalprice")).as("cents"),
      col("o_orderpriority").as("prio"))
    def hashed(df: DataFrame, h: String): DataFrame =
      df.select(col("key"), md5(concat_ws("|", col("cents"), col("prio"))).as(h))
    val old = hashed(base.filter(col("key") % 10 =!= 0), "h_old")
    val neu = hashed(
      base.filter(col("key") % 7 =!= 3)
        .withColumn("cents",
          when(col("key") % 11 === 0, col("cents") + 100).otherwise(col("cents"))),
      "h_new")
    old.join(neu, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_rows"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key"))
      .orderBy("status")
  }

  private val snapshotDiffSql =
    s"""WITH base AS (
       |  SELECT o_orderkey AS key, ${centsSql("o_totalprice")} AS cents,
       |    o_orderpriority AS prio
       |  FROM orders),
       |old AS (
       |  SELECT key, md5(concat_ws('|', cents, prio)) AS h_old
       |  FROM base WHERE key % 10 <> 0),
       |neu AS (
       |  SELECT key, md5(concat_ws('|',
       |      CASE WHEN key % 11 = 0 THEN cents + 100 ELSE cents END, prio)) AS h_new
       |  FROM base WHERE key % 7 <> 3)
       |SELECT CASE WHEN h_old IS NULL THEN 'added'
       |            WHEN h_new IS NULL THEN 'removed'
       |            WHEN h_old <> h_new THEN 'changed'
       |            ELSE 'unchanged' END AS status,
       |  COUNT(*) AS n_rows, MIN(key) AS min_key, MAX(key) AS max_key
       |FROM old FULL OUTER JOIN neu USING (key)
       |GROUP BY 1 ORDER BY status""".stripMargin

  val all: Seq[Q] = Seq(
    Q("snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
    Q("profile_columns", profileColumns, Some(profileColumnsSql)),
    Q("ref_integrity_audit", refIntegrityAudit, Some(refIntegrityAuditSql)),
    Q("dedup_latest", dedupLatest, Some(dedupLatestSql)),
    Q("conditional_merge", conditionalMerge, Some(conditionalMergeSql)),
    Q("anti_join", antiJoin, Some(antiJoinSql)),
    Q("semi_join", semiJoin, Some(semiJoinSql)),
    Q("parse_dates_roundtrip", parseDatesRoundtrip, Some(parseDatesRoundtripSql)),
    Q("parse_decimals_localized", parseDecimalsLocalized, Some(parseDecimalsLocalizedSql)),
    Q("nfe_key_gate", nfeKeyGate, Some(nfeKeyGateSql)),
    Q("lineage_file_counts", lineageFileCounts, Some(lineageFileCountsSql)),
    Q("backfill_render", backfillRender, Some(backfillRenderSql)),
    Q("archive_audit", archiveAudit, Some(archiveAuditSql)))
}
