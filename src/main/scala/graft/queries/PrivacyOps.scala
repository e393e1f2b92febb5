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

  /** How many event types the exponential-mechanism release selects. */
  val dpTopK = 3
  /** milli-log₂ of the nano unit (for the Gumbel double-log). */
  private val lgNano = SketchOps.lgJvm(1000000000L)
  /** Bounds of the integer Gumbel draw, from the coin's resolution:
    * max at −ln u = the 1-clamp floor (lg = 0), min at u_micro = 1
    * (−ln u = ln 10⁶, the largest the coin can express). */
  private val gumbelMaxNano = lgNano * 693147L
  private val gumbelMinNano =
    (lgNano - SketchOps.lgJvm(lgMicro * 693147L)) * 693147L
  /** Shift making every Gumbel draw non-negative before the nano→micro
    * truncating division: g_nano ∈ [gumbelMinNano, gumbelMaxNano] and
    * gumbelMinNano < 0, so (g_nano + gumbelShiftNano) ≥ 0 — Spark's
    * `div` (truncate toward zero) and DuckDB's `//` (floor) agree on
    * non-negative operands, the div/floor cross-engine trap. The shift
    * is constant per row, so per-ε score RANKS are unchanged BY THE
    * SHIFT — but the accompanying nano→micro rescale coarsens the
    * Gumbel term 1000×, so selected sets can legitimately differ from
    * the round-≤16 nano-form history even without overflow: micro
    * quantization is a semantic change (both engines + the spec were
    * updated in lockstep), and round-≤16 outputs are NOT comparable. */
  private[queries] val gumbelShiftNano = -gumbelMinNano

  /** ε-DP top-k selection of event types by the EXPONENTIAL mechanism
    * (McSherry–Talwar 2007) — the second classical release primitive
    * next to [[dpHistogramRelease]]'s Laplace rung: instead of noising
    * every count, SELECT k types with probability ∝ exp(ε·u/2Δu),
    * utility u = the type's count (sensitivity 1). Implemented one-shot
    * via the Gumbel-max equivalence (Durfee–Rogers 2019, "Practical
    * differentially private top-k selection"): adding an independent
    * Gumbel draw to each ε·u/2 and taking the top k IS the k-round
    * peeling exponential mechanism, so the whole release is ONE
    * rank-window over |bins| rows — no per-round renormalization loop.
    *
    * Integer contract, fully cross-engine:
    *  - Gumbel draw G = −ln(−ln u) by composing the shared milli-log₂
    *    rule twice: −ln u in NANO units is (lg(10⁶) − lg(u_micro))·
    *    693147 (clamped ≥ 1 — the coin's resolution floor, as the
    *    histogram's t-clamp), then g_nano = (lg(10⁹) − lg(lnu_nano))·
    *    693147. Both lg operands are positive, so truncating division
    *    never sees a negative (the div/floor cross-engine trap).
    *  - score_micro = eps_milli·n_true·500 + (g_nano +
    *    [[gumbelShiftNano]]) div 1000 (ε·u/2 in MICRO units; the shift
    *    keeps the dividend non-negative so truncate ≡ floor, and being
    *    constant per row it never reorders a per-ε rank). Micro scale
    *    buys 1000× count headroom over the nano form: the product
    *    eps_milli·n_true·500 stays inside BIGINT up to n_true ≈ 9.2·10¹²
    *    at the grid max ε = 2.0 (the nano form overflowed at ≈ 9.2·10⁹,
    *    where Spark wraps silently while DuckDB raises — the engines
    *    would diverge exactly at the scale this engine targets).
    *    `sel_rank` = the per-ε rank by (score desc, type); selected ⇔
    *    rank ≤ [[dpTopK]].
    *  - Round-1 selection PROBABILITIES in exact integer micro, the
    *    max-shifted stable form: the log-weight deficit of a bin vs the
    *    argmax count is mag_micro = eps_milli·(n_max−n)·500 ≥ 0; its
    *    milli-log₂ is l2 = (mag·1000) div 693147, and the weight is the
    *    EXACT INVERSE of the lg rule's in-octave interpolation,
    *    w_micro = 10⁹ div ((1000 + l2 mod 1000) << (l2 div 1000))
    *    (0 once l2 ≥ 20000 — the shift that floors below 1 micro, so no
    *    overflow and no libm exp anywhere); p_micro = w·10⁶ div Σw.
    *
    * Laws pinned per row: `prob_sum_ok` (per ε, 10⁶ − Σp ∈ [0, |bins|] —
    * floor losses only), `mono_ok` (same draw, bigger ε ⇒ the argmax
    * bin's p never falls and every other bin's weight never rises —
    * the mechanism's concentration direction, exact under the integer
    * floor because w is monotone in l2 across octave wraps), and `g_ok`
    * (the Gumbel draw lands in the coin-resolution bounds). The md5
    * coin stands in for the CSPRNG exactly as in the histogram release;
    * what the oracle certifies is the calibration arithmetic and the
    * selection rule.
    *
    * Scale shape: ONE map-side-combining aggregate on event_type
    * (|bins| rows), then |bins|·|grid| projection + two windows — nothing
    * corpus-scale after the count. */
  private def dpTopkRelease(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = t(s, dir, "events")
      .select(coalesce(col("event_type"), lit("")).as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n_true"))
    val grid = s.createDataFrame(dpEpsGrid.map(Tuple1(_)))
      .toDF("eps_milli")
    val wEps = Window.partitionBy(col("eps_milli"))
    val wRank = Window.partitionBy(col("eps_milli"))
      .orderBy(col("score_micro").desc, col("event_type"))
    val wType = Window.partitionBy(col("event_type")).orderBy(col("eps_milli"))
    hist.crossJoin(broadcast(grid))
      .withColumn("u_micro",
        greatest(lit(1L),
          conv(substring(md5(concat(lit("dptk:"), col("event_type"))), 1, 8),
            16, 10).cast("long") % 1000000L))
      .withColumn("lnu_nano",
        greatest(lit(1L),
          expr(s"(${lgMicro}L - ${CurationOps.lg("u_micro")}) * 693147L")))
      .withColumn("g_nano",
        expr(s"(${lgNano}L - ${CurationOps.lg("lnu_nano")}) * 693147L"))
      .withColumn("score_micro",
        col("eps_milli") * col("n_true") * 500L +
          expr(s"(g_nano + ${gumbelShiftNano}L) div 1000"))
      .withColumn("rk", rank().over(wRank).cast("long"))
      .withColumn("sel_rank", when(col("rk") <= dpTopK, col("rk")))
      .withColumn("mag_micro",
        col("eps_milli") * (max(col("n_true")).over(wEps) - col("n_true"))
          * 500L)
      .withColumn("l2_milli", expr("(mag_micro * 1000L) div 693147L"))
      .withColumn("w_micro", when(col("l2_milli") >= 20000L, lit(0L))
        .otherwise(expr("1000000000L div ((1000L + l2_milli % 1000L) * " +
          "shiftleft(1L, CAST(l2_milli div 1000L AS INT)))")))
      .withColumn("p_micro",
        expr("(w_micro * 1000000L) div " +
          "(sum(w_micro) OVER (PARTITION BY eps_milli))"))
      .withColumn("p_sum", sum(col("p_micro")).over(wEps))
      .withColumn("prob_sum_ok",
        col("p_sum") <= 1000000L &&
          lit(1000000L) - col("p_sum") <= count(lit(1)).over(wEps))
      .withColumn("mono_ok", coalesce(
        when(col("mag_micro") === 0L,
          col("p_micro") >= lag(col("p_micro"), 1).over(wType))
          .otherwise(col("w_micro") <= lag(col("w_micro"), 1).over(wType)),
        lit(true)))
      .withColumn("g_ok",
        col("g_nano") <= gumbelMaxNano && col("g_nano") >= gumbelMinNano)
      .select(col("event_type"), col("eps_milli"), col("n_true"),
        col("u_micro"), col("g_nano"), col("score_micro"), col("sel_rank"),
        col("w_micro"), col("p_micro"), col("prob_sum_ok"), col("mono_ok"),
        col("g_ok"))
      .orderBy("eps_milli", "event_type")
  }

  private val dpTopkReleaseSql = {
    val gridSql = dpEpsGrid
      .map(e => s"SELECT CAST($e AS BIGINT) AS eps_milli")
      .mkString(" UNION ALL ")
    s"""WITH hist AS (
       |  SELECT COALESCE(event_type, '') AS event_type,
       |    CAST(COUNT(*) AS BIGINT) AS n_true
       |  FROM events GROUP BY 1),
       |grid AS ($gridSql),
       |coins AS (
       |  SELECT event_type, eps_milli, n_true,
       |    greatest(1, CAST('0x' || substr(md5('dptk:' || event_type), 1, 8)
       |      AS BIGINT) % 1000000) AS u_micro
       |  FROM hist CROSS JOIN grid),
       |lnu AS (
       |  SELECT *, greatest(1,
       |      (CAST($lgMicro AS BIGINT) - ${CurationOps.lgSql("u_micro")})
       |        * 693147) AS lnu_nano
       |  FROM coins),
       |gum AS (
       |  SELECT *, (CAST($lgNano AS BIGINT) - ${CurationOps.lgSql("lnu_nano")})
       |      * 693147 AS g_nano
       |  FROM lnu),
       |scored AS (
       |  SELECT *, eps_milli * n_true * 500
       |      + (g_nano + $gumbelShiftNano) // 1000 AS score_micro,
       |    eps_milli * ((MAX(n_true) OVER (PARTITION BY eps_milli)) - n_true)
       |      * 500 AS mag_micro
       |  FROM gum),
       |ranked AS (
       |  SELECT *,
       |    CAST(rank() OVER (PARTITION BY eps_milli
       |      ORDER BY score_micro DESC, event_type) AS BIGINT) AS rk,
       |    (mag_micro * 1000) // 693147 AS l2_milli
       |  FROM scored),
       |weighted AS (
       |  SELECT *,
       |    CASE WHEN l2_milli >= 20000 THEN CAST(0 AS BIGINT)
       |      ELSE CAST(1000000000 AS BIGINT) //
       |        ((1000 + l2_milli % 1000) *
       |         (CAST(1 AS BIGINT) << CAST(l2_milli // 1000 AS INTEGER)))
       |    END AS w_micro
       |  FROM ranked),
       |probs AS (
       |  SELECT *,
       |    CAST((w_micro * 1000000) //
       |      CAST(SUM(w_micro) OVER (PARTITION BY eps_milli) AS BIGINT)
       |      AS BIGINT) AS p_micro
       |  FROM weighted)
       |SELECT event_type, eps_milli, n_true, u_micro, g_nano,
       |  CAST(score_micro AS BIGINT) AS score_micro,
       |  CASE WHEN rk <= $dpTopK THEN rk END AS sel_rank,
       |  w_micro, p_micro,
       |  SUM(p_micro) OVER (PARTITION BY eps_milli) <= 1000000
       |    AND 1000000 - SUM(p_micro) OVER (PARTITION BY eps_milli)
       |      <= COUNT(*) OVER (PARTITION BY eps_milli) AS prob_sum_ok,
       |  COALESCE(CASE WHEN mag_micro = 0
       |      THEN p_micro >= lag(p_micro) OVER
       |        (PARTITION BY event_type ORDER BY eps_milli)
       |      ELSE w_micro <= lag(w_micro) OVER
       |        (PARTITION BY event_type ORDER BY eps_milli) END,
       |    TRUE) AS mono_ok,
       |  g_nano <= $gumbelMaxNano AND g_nano >= $gumbelMinNano AS g_ok
       |FROM probs
       |ORDER BY eps_milli, event_type""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("pii_anonymize", piiAnonymize, Some(piiAnonymizeSql)),
    Q("k_anonymity_audit", kAnonymityAudit, Some(kAnonymityAuditSql)),
    Q("l_diversity_audit", lDiversityAudit, Some(lDiversityAuditSql)),
    Q("t_closeness_audit", tClosenessAudit, Some(tClosenessAuditSql)),
    Q("dp_histogram_release", dpHistogramRelease,
      Some(dpHistogramReleaseSql)),
    Q("dp_topk_release", dpTopkRelease, Some(dpTopkReleaseSql)))
}
