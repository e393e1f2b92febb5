package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** Privacy operators for a training-data pipeline over the `events` log:
  * PII pseudonymization/generalization and a k-anonymity audit — the
  * scrub-before-train pass a 100 TB corpus needs (GDPR/CCPA-style
  * de-identification of user logs before they become training data).
  *
  * Both are single-pass shapes: the anonymizer is one codegen'd projection
  * (scan → project → write, no shuffle beyond the output sort); the audit
  * is one map-side-combining hash aggregate on the generalized
  * quasi-identifier. Determinism: md5 pseudonyms (identical hex in both
  * engines), integer cent/bucket arithmetic, date_trunc generalization,
  * unique sort keys.
  */
object PrivacyOps {

  /** De-identify the event log:
    *  - direct identifiers (event_id, user_id) become salted md5 tokens —
    *    joinable within the release, not linkable back without the salt
    *    (the fixed literal salt here stands in for a secret; the plan
    *    shape is what matters);
    *  - quasi-identifiers generalize: ts → hour, value → 100-unit bucket
    *    via exact cents math (round(v·100) → BIGINT) followed by an
    *    EXPLICIT floor division (floor(cents/10000.0)) — toward-−∞ on both
    *    engines, because Spark's `div` truncates toward zero while other
    *    engines' integer division may floor, so a negative value would
    *    silently bucket differently (-18522¢ → -200 under floor, -100
    *    under truncation);
    *  - freeform props JSON gets numeric literals scrubbed (a measurement
    *    can re-identify; `{"k": 87}` → `{"k": 0}`). */
  private def piiAnonymize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      substring(md5(concat(lit("esalt:"), col("event_id").cast("string"))), 1, 16)
        .as("event_token"),
      substring(md5(concat(lit("usalt:"), col("user_id").cast("string"))), 1, 16)
        .as("user_token"),
      date_trunc("hour", col("ts")).as("ts_hour"),
      col("event_type"),
      (floor(expr("CAST(round(value * 100) AS BIGINT)") / lit(10000.0)) * 100)
        .as("value_bucket"),
      regexp_replace(col("props"), "[0-9]+", "0").as("props_scrubbed"))
      .orderBy("event_token")

  private val piiAnonymizeSql =
    """SELECT
      |  substr(md5('esalt:' || CAST(event_id AS VARCHAR)), 1, 16) AS event_token,
      |  substr(md5('usalt:' || CAST(user_id AS VARCHAR)), 1, 16) AS user_token,
      |  date_trunc('hour', ts) AS ts_hour,
      |  event_type,
      |  CAST(floor(CAST(round(value * 100) AS BIGINT) / 10000.0) AS BIGINT) * 100 AS value_bucket,
      |  regexp_replace(props, '[0-9]+', '0', 'g') AS props_scrubbed
      |FROM events ORDER BY event_token""".stripMargin

  /** k-anonymity audit of the generalized release: group size per
    * quasi-identifier combination (ts_hour, event_type, value_bucket) and
    * whether it meets k = 5 — the groups that fail are the ones a
    * suppression pass must widen or drop before release. One hash
    * aggregate; the quasi-identifier is low-cardinality by construction
    * (that is the point of generalization), so no skew path is needed. */
  private def kAnonymityAudit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      date_trunc("hour", col("ts")).as("ts_hour"),
      col("event_type"),
      (floor(expr("CAST(round(value * 100) AS BIGINT)") / lit(10000.0)) * 100)
        .as("value_bucket"))
      .groupBy("ts_hour", "event_type", "value_bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("k_ok", col("n") >= 5)
      .orderBy("ts_hour", "event_type", "value_bucket")

  private val kAnonymityAuditSql =
    """SELECT ts_hour, event_type, value_bucket, COUNT(*) AS n,
      |  COUNT(*) >= 5 AS k_ok
      |FROM (SELECT date_trunc('hour', ts) AS ts_hour, event_type,
      |        CAST(floor(CAST(round(value * 100) AS BIGINT) / 10000.0) AS BIGINT) * 100 AS value_bucket
      |      FROM events)
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** l-diversity audit — the k-anonymity follow-up (Machanavajjhala et
    * al., public ICDE 2006): a group can be k-large yet still leak if
    * every member shares one SENSITIVE value (the homogeneity attack k
    * alone misses). Quasi-identifier = (ts_hour, value_bucket) — one
    * step COARSER than the k-audit's triple, because here `event_type`
    * plays the sensitive attribute: per QI group, the distinct sensitive
    * count (l), the l ≥ 3 verdict, and the top sensitive value's share
    * in exact milli (the input to a recursive (c,l)-diversity or
    * entropy check — a group passing l but with top_share ≈ 1000 is
    * still near-homogeneous). NULL sensitive values bucket as '' on
    * both engines (the cross_source_leakage rule) so they count as one
    * real value instead of vanishing from COUNT(DISTINCT).
    *
    * Scale shape: two stacked map-side-combining hash aggregates on the
    * generalized keys (low-cardinality by construction); no joins, no
    * windows. */
  private def lDiversityAudit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
        date_trunc("hour", col("ts")).as("ts_hour"),
        (floor(expr("CAST(round(value * 100) AS BIGINT)") / lit(10000.0)) * 100)
          .as("value_bucket"),
        coalesce(col("event_type"), lit("")).as("sens"))
      .groupBy("ts_hour", "value_bucket", "sens")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("ts_hour", "value_bucket")
      .agg(sum("cnt").as("n"), count(lit(1)).as("l_distinct"),
        max("cnt").as("max_cnt"))
      .select(col("ts_hour"), col("value_bucket"), col("n"),
        col("l_distinct"), (col("l_distinct") >= 3).as("l_ok"),
        floor(lit(1000.0) * col("max_cnt") / col("n")).cast("long")
          .as("top_share_milli"))
      .orderBy(col("ts_hour").asc_nulls_last,
        col("value_bucket").asc_nulls_last)

  private val lDiversityAuditSql =
    """WITH g AS (
      |  SELECT date_trunc('hour', ts) AS ts_hour,
      |    CAST(floor(CAST(round(value * 100) AS BIGINT) / 10000.0) AS BIGINT) * 100 AS value_bucket,
      |    COALESCE(event_type, '') AS sens
      |  FROM events),
      |i AS (SELECT ts_hour, value_bucket, sens, COUNT(*) AS cnt
      |      FROM g GROUP BY 1, 2, 3)
      |SELECT ts_hour, value_bucket, CAST(SUM(cnt) AS BIGINT) AS n,
      |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
      |  COUNT(*) >= 3 AS l_ok,
      |  CAST(floor(1000.0 * MAX(cnt) / SUM(cnt)) AS BIGINT) AS top_share_milli
      |FROM i GROUP BY 1, 2
      |ORDER BY ts_hour NULLS LAST, value_bucket NULLS LAST""".stripMargin

  /** t-closeness threshold in micro units (t = 0.2). */
  val tCloseMicro = 200000L

  /** t-closeness audit — the last rung of the k → l → t ladder (Li et
    * al., ICDE 2007): a group can be k-large and l-diverse yet still
    * leak if its SENSITIVE-value distribution differs sharply from the
    * table's (an attacker's posterior moves from the global prior to
    * the group's skew). Here the sensitive attribute is the ORDERED
    * value bucket (QI = ts_hour × event_type — the dual of the
    * l-audit's assignment), so closeness is the paper's ordered-
    * attribute Earth Mover's Distance: with buckets in value order,
    * EMD(P, Q) = Σᵢ |Σ_{j≤i}(p_j − q_j)| / (m−1) — mass moves only
    * between adjacent buckets, and the cumulative-difference sum counts
    * every unit·step of work. Exact integer micro units throughout
    * (10⁶·cnt div n per side); EMD ≥ 0 is pinned per row, and the
    * verdict emd ≤ [[tCloseMicro]] is the release gate. A single-bucket
    * table (m = 1) has EMD 0 by definition (everyone's distribution is
    * the prior).
    *
    * Scale shape: the sensitive histogram per group and globally are
    * stacked map-side-combining aggregates on generalized keys
    * (low-cardinality by construction — the privacy-tier invariant);
    * the alignment is groups × buckets, both generalization-bounded;
    * the cumulative sum is one window per group over ≤ m rows. NULL
    * event_type buckets as '' (the l-audit rule); NULL values order
    * first via a sentinel bucket. */
  /** NULL-hour sentinel: NULL ts rows must still form their own QI group,
    * but a NULL JOIN KEY is poison for the oracle — DuckDB 1.0's
    * IS-NULL handling of `date_trunc(ts)` is broken in predicates
    * (`WHERE date_trunc('hour', ts) IS NULL` returns 0 rows while the
    * GROUP BY emits a NULL group; an IS NOT DISTINCT FROM join on it is
    * NONDETERMINISTIC across runs — caught by fuzz seed 58). Every stage
    * therefore keys on a sentinel hour (year 1, outside any event
    * domain), mapped back to NULL only in the final projection. */
  private val tCloseNullHour = "0001-01-01 00:00:00"

  private def tClosenessAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // coalesce the RAW ts, then truncate: DuckDB 1.0's null tracking of
    // date_trunc output is broken (COALESCE over it never fires, IS NULL
    // on it returns false) while NULL checks on the raw column work
    val g = t(s, dir, "events").select(
      date_trunc("hour",
        coalesce(col("ts"), to_timestamp(lit(tCloseNullHour))))
        .as("ts_hour"),
      coalesce(col("event_type"), lit("")).as("event_type"),
      coalesce(
        (floor(expr("CAST(round(value * 100) AS BIGINT)") / lit(10000.0))
          * 100).cast("long"),
        lit(-(1L << 40))).as("sv"))
    val global = g.groupBy(col("sv")).agg(count(lit(1)).as("gc"))
    val tot = global.agg(sum(col("gc")).as("n_tot"),
      count(lit(1)).as("m_buckets"))
    val groups = g.groupBy(col("ts_hour"), col("event_type"), col("sv"))
      .agg(count(lit(1)).as("pc"))
    val groupTot = groups.groupBy(col("ts_hour"), col("event_type"))
      .agg(sum(col("pc")).as("n"))
    val gp = groups.select(col("ts_hour").as("p_ts"),
      col("event_type").as("p_et"), col("sv").as("p_sv"), col("pc"))
    // plain equality is safe: the sentinel made every hour key non-NULL
    val aligned = groupTot.crossJoin(global)
      .join(gp, col("p_ts") === col("ts_hour") &&
        col("p_et") === col("event_type") && col("p_sv") === col("sv"),
        "left")
      .crossJoin(broadcast(tot))
      .select(col("ts_hour"), col("event_type"), col("n"),
        col("m_buckets"), col("sv"),
        (expr("(1000000 * coalesce(pc, 0)) div n") -
          expr("(1000000 * gc) div n_tot")).as("d"))
    val wCum = Window.partitionBy(col("ts_hour"), col("event_type"))
      .orderBy(col("sv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aligned.withColumn("cum", sum(col("d")).over(wCum))
      .groupBy(col("ts_hour"), col("event_type"), col("n"),
        col("m_buckets"))
      .agg(sum(abs(col("cum"))).as("work"))
      .select(
        when(col("ts_hour") === to_timestamp(lit(tCloseNullHour)),
          lit(null).cast("timestamp")).otherwise(col("ts_hour"))
          .as("ts_hour"),
        col("event_type"), col("n"), col("m_buckets"),
        expr("CASE WHEN m_buckets > 1 THEN work div (m_buckets - 1) " +
          "ELSE 0 END").as("emd_micro"))
      .withColumn("emd_ok", col("emd_micro") >= 0)
      .withColumn("t_ok", col("emd_micro") <= tCloseMicro)
      .orderBy(col("ts_hour").asc_nulls_last, col("event_type"))
  }

  private val tClosenessAuditSql =
    s"""WITH g AS (
       |  SELECT date_trunc('hour',
       |      COALESCE(ts, TIMESTAMP '$tCloseNullHour')) AS ts_hour,
       |    COALESCE(event_type, '') AS event_type,
       |    COALESCE(CAST(floor(CAST(round(value * 100) AS BIGINT)
       |      / 10000.0) AS BIGINT) * 100, ${-(1L << 40)}) AS sv
       |  FROM events),
       |global_ AS (SELECT sv, COUNT(*) AS gc FROM g GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(gc) AS BIGINT) AS n_tot,
       |    CAST(COUNT(*) AS BIGINT) AS m_buckets
       |  FROM global_),
       |grp AS (
       |  SELECT ts_hour, event_type, sv, COUNT(*) AS pc
       |  FROM g GROUP BY 1, 2, 3),
       |grptot AS (
       |  SELECT ts_hour, event_type, CAST(SUM(pc) AS BIGINT) AS n
       |  FROM grp GROUP BY 1, 2),
       |aligned AS (
       |  SELECT t.ts_hour, t.event_type, t.n, o.m_buckets, gl.sv,
       |    (1000000 * COALESCE(p.pc, 0)) // t.n
       |      - (1000000 * gl.gc) // o.n_tot AS d
       |  FROM grptot t CROSS JOIN global_ gl
       |  LEFT JOIN grp p ON p.ts_hour = t.ts_hour
       |    AND p.event_type = t.event_type AND p.sv = gl.sv
       |  CROSS JOIN tot o),
       |cums AS (
       |  SELECT ts_hour, event_type, n, m_buckets,
       |    CAST(SUM(d) OVER (PARTITION BY ts_hour, event_type ORDER BY sv
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM aligned),
       |emd AS (
       |  SELECT ts_hour, event_type, n, m_buckets,
       |    CASE WHEN m_buckets > 1
       |      THEN CAST(SUM(abs(cum)) AS BIGINT) // (m_buckets - 1)
       |      ELSE 0 END AS emd_micro
       |  FROM cums GROUP BY 1, 2, 3, 4)
       |SELECT CASE WHEN ts_hour = TIMESTAMP '$tCloseNullHour' THEN NULL
       |    ELSE ts_hour END AS ts_hour,
       |  event_type, n, m_buckets, emd_micro,
       |  emd_micro >= 0 AS emd_ok,
       |  emd_micro <= $tCloseMicro AS t_ok
       |FROM emd
       |ORDER BY CASE WHEN ts_hour = TIMESTAMP '$tCloseNullHour' THEN NULL
       |  ELSE ts_hour END NULLS LAST, event_type""".stripMargin

  /** Laplace-scale sweep (ε in milli): 0.1, 0.5, 2.0 — spanning the
    * strong-privacy / strong-utility tradeoff two decades wide. */
  val dpEpsGrid: Seq[Long] = Seq(100L, 500L, 2000L)
  /** milli-log₂ of the micro unit (2²⁰ > 10⁶ > 2¹⁹): the max-noise bound's
    * log term, lg(10⁶) computed once by the shared integer-lg rule. */
  private val lgMicro = {
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(1000000L)
    1000L * (bits - 1) + (1000L * 1000000L) / (1L << (bits - 1)) - 1000L
  }

  /** ε-differential-privacy release of the per-type event histogram by
    * the Laplace mechanism (Dwork–McSherry–Nissim–Smith 2006) — the
    * rung ABOVE the k → l → t ladder: those audit what a release leaks
    * structurally; this releases counts with calibrated noise and audits
    * the MECHANISM's arithmetic. Each bin's count (sensitivity 1 under
    * add/remove-one-event adjacency) gets noise b·sgn(u−½)·ln(1−2|u−½|)
    * with b = 1/ε — the exact inverse-CDF Laplace draw — swept over
    * [[dpEpsGrid]] with the SAME uniform draw per bin so the
    * noise-vs-budget monotonicity is a per-row law, not a statistical
    * claim.
    *
    * Integer contract, fully cross-engine: u_micro is an md5 coin in
    * [0, 10⁶); t_micro = max(1, 10⁶ − 2|u − 5·10⁵|) (the 1-clamp is the
    * coin's resolution floor — it also bounds the max noise);
    * ln(1/t) via the shared milli-log₂ rule × ln2: lgdiff·693147 is
    * ln(1/t) in NANO units (milli-log₂ × ln2·10⁶), and eps_milli is ε
    * in MILLI units, so the micro-unit draw is their plain quotient —
    * noise_micro = (lgdiff · 693147) div eps_milli (nano/milli = micro).
    * Laws pinned per row: `bound_ok` (noise ≤ the t = 1 micro ceiling
    * (lg(10⁶)·693147) div eps_milli) and `mono_ok` (same draw, bigger
    * ε ⇒ no more noise — b = 1/ε monotone survives the integer floor
    * because only the denominator grows). released_micro may go negative
    * (a DP release does; post-processing clamps are the consumer's
    * choice and would not change ε).
    *
    * Deterministic md5 coins are the audit stand-in for the mechanism's
    * CSPRNG (the kmeanspp/stochastic-greedy convention): what is being
    * certified is the CALIBRATION — that the engine adds exactly the
    * noise the budget prescribes — which is the part of a DP pipeline a
    * cross-engine oracle can pin. A deployment swaps the coin for secure
    * randomness; ε accounting is unchanged.
    *
    * Scale shape: ONE map-side-combining aggregate on event_type
    * (|bins| rows), then a |bins|·|grid| projection and a |bins|-window —
    * nothing corpus-scale after the count. */
  private def dpHistogramRelease(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = t(s, dir, "events")
      .select(coalesce(col("event_type"), lit("")).as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n_true"))
    val grid = s.createDataFrame(dpEpsGrid.map(Tuple1(_)))
      .toDF("eps_milli")
    val w = Window.partitionBy(col("event_type")).orderBy(col("eps_milli"))
    hist.crossJoin(broadcast(grid))
      .withColumn("u_micro",
        conv(substring(md5(concat(lit("dp:"), col("event_type"))), 1, 8),
          16, 10).cast("long") % 1000000L)
      .withColumn("t_micro",
        greatest(lit(1L), lit(1000000L) -
          lit(2L) * abs(col("u_micro") - 500000L)))
      .withColumn("noise_abs_micro",
        expr(s"((${CurationOps.lg("t_micro")} * -1L + ${lgMicro}L) * 693147L)" +
          " div eps_milli"))
      .withColumn("noise_micro",
        when(col("u_micro") >= 500000L, col("noise_abs_micro"))
          .otherwise(-col("noise_abs_micro")))
      .withColumn("released_micro",
        col("n_true") * 1000000L + col("noise_micro"))
      .withColumn("bound_micro",
        expr(s"(${lgMicro}L * 693147L) div eps_milli"))
      .withColumn("bound_ok", col("noise_abs_micro") <= col("bound_micro"))
      .withColumn("mono_ok", coalesce(
        col("noise_abs_micro") <= lag(col("noise_abs_micro"), 1).over(w),
        lit(true)))
      .select(col("event_type"), col("eps_milli"), col("n_true"),
        col("u_micro"), col("noise_micro"), col("released_micro"),
        col("bound_micro"), col("bound_ok"), col("mono_ok"))
      .orderBy("event_type", "eps_milli")
  }

  private val dpHistogramReleaseSql = {
    val gridSql = dpEpsGrid
      .map(e => s"SELECT CAST($e AS BIGINT) AS eps_milli")
      .mkString(" UNION ALL ")
    s"""WITH hist AS (
       |  SELECT COALESCE(event_type, '') AS event_type,
       |    CAST(COUNT(*) AS BIGINT) AS n_true
       |  FROM events GROUP BY 1),
       |grid AS ($gridSql),
       |noised AS (
       |  SELECT event_type, eps_milli, n_true, u_micro,
       |    ((CAST($lgMicro AS BIGINT) - ${CurationOps.lgSql("t_micro")})
       |       * CAST(693147 AS BIGINT))
       |      // eps_milli AS noise_abs_micro
       |  FROM (
       |    SELECT event_type, eps_milli, n_true, u_micro,
       |      greatest(1, 1000000 - 2 * abs(u_micro - 500000)) AS t_micro
       |    FROM (
       |      SELECT h.event_type, g.eps_milli, h.n_true,
       |        CAST('0x' || substr(md5('dp:' || event_type), 1, 8)
       |          AS BIGINT) % 1000000 AS u_micro
       |      FROM hist h CROSS JOIN grid g)))
       |SELECT event_type, eps_milli, n_true, u_micro,
       |  CAST(CASE WHEN u_micro >= 500000 THEN noise_abs_micro
       |    ELSE -noise_abs_micro END AS BIGINT) AS noise_micro,
       |  CAST(n_true * 1000000 + CASE WHEN u_micro >= 500000
       |    THEN noise_abs_micro ELSE -noise_abs_micro END AS BIGINT)
       |    AS released_micro,
       |  CAST((CAST($lgMicro AS BIGINT) * 693147) // eps_milli AS BIGINT)
       |    AS bound_micro,
       |  noise_abs_micro <= (CAST($lgMicro AS BIGINT) * 693147) // eps_milli
       |    AS bound_ok,
       |  COALESCE(noise_abs_micro <= lag(noise_abs_micro)
       |    OVER (PARTITION BY event_type ORDER BY eps_milli), TRUE)
       |    AS mono_ok
       |FROM noised
       |ORDER BY event_type, eps_milli""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("pii_anonymize", piiAnonymize, Some(piiAnonymizeSql)),
    Q("k_anonymity_audit", kAnonymityAudit, Some(kAnonymityAuditSql)),
    Q("l_diversity_audit", lDiversityAudit, Some(lDiversityAuditSql)),
    Q("t_closeness_audit", tClosenessAudit, Some(tClosenessAuditSql)),
    Q("dp_histogram_release", dpHistogramRelease,
      Some(dpHistogramReleaseSql)))
}
