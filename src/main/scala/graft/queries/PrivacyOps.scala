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

  val all: Seq[Q] = Seq(
    Q("pii_anonymize", piiAnonymize, Some(piiAnonymizeSql)),
    Q("k_anonymity_audit", kAnonymityAudit, Some(kAnonymityAuditSql)),
    Q("l_diversity_audit", lDiversityAudit, Some(lDiversityAuditSql)))
}
