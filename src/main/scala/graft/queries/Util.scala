package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One named query with its DuckDB oracle twin (SURVEY §5.1).
  *
  * Determinism contract for the driver's hash-compare:
  *  - identical output column NAMES on both sides (compare sorts by name);
  *  - value-exact arithmetic only: integer/decimal aggregation (doubles pass
  *    through untouched or are converted via round()*100 → BIGINT "cents",
  *    which is bit-deterministic in both engines);
  *  - explicit ORDER BY on a unique key in both plans.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Util {
  /** Read one testdata table.
    *
    * `events.ts` is TIMESTAMP(NANOS) in the parquet, which Spark 4 rejects
    * outright ([PARQUET_TYPE_ILLEGAL]). Read it as a nanos long (legacy
    * conf) and truncate to microseconds with integer division — exactly the
    * ns→µs truncation DuckDB applies when it reads the same file, so both
    * engines see identical timestamp values. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else s.read.parquet(s"$dir/$name.parquet")
  }

  /** Exact integer cents from a 2-dp double: round half-up then widen.
    * round() is half-away-from-zero in both Spark and DuckDB for positives;
    * the result is an integral double exactly representable, so the BIGINT
    * cast is lossless in both engines. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** SQL twin of [[cents]]. */
  def centsSql(expr: String): String = s"CAST(round($expr * 100, 0) AS BIGINT)"
}
