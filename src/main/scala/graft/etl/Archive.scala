package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staging → history archive with audit columns.
  *
  * The reference moves staging rows to `hist.archive_pedidos` in 5000-row
  * ctid-batched transactions under an advisory lock
  * (/root/reference/python/04_archive_pedidos.py:30-51,74-100). Batching and
  * locking there are PostgreSQL lock-hygiene concerns, not semantics; the
  * semantic contract is: every staging row lands in hist exactly once with
  * `processed_ts` (:37) and a per-run `batch_id` uuid (:68), and staging ends
  * empty, with inserted == deleted (:49-50).
  *
  * Spark-first: take one snapshot of staging, stamp audit columns, append to
  * hist, then truncate staging — a single distributed job over the snapshot;
  * exactly-once within a run comes from operating on the one snapshot.
  * Concurrency control (the advisory lock) belongs to the pipeline runner
  * (one run at a time), not the engine.
  */
object Archive {

  case class Audit(moved: Long, batchId: String)

  /** Stamp audit columns on a staging snapshot (ref :37-38,68).
    * `hist_id` is a surrogate technical id: monotonically_increasing_id is
    * unique-per-run (not gapless), which matches the reference's bigserial
    * purpose. */
  def stamp(staging: DataFrame, batchId: String): DataFrame =
    staging
      .withColumn("hist_id", monotonically_increasing_id())
      .withColumn("processed_ts", current_timestamp())
      .withColumn("batch_id", lit(batchId))
      .select(Schemas.histSchema.fieldNames.map(col).toIndexedSeq: _*)

  /** Archive `stagingPath` parquet into `histPath` parquet and truncate
    * staging (overwrite with an empty DataFrame of the same schema).
    * Returns the audit counts the reference logs (:49-50).
    *
    * CRASH-RECOVERY CONTRACT: hist-append and staging-truncate are two
    * filesystem operations, not one transaction (the reference wraps each
    * batch in a PostgreSQL transaction; plain parquet directories have no
    * cross-directory atomicity). A crash between them leaves the archived
    * rows in BOTH hist and staging, and a naive re-run would re-archive
    * them under a new batch_id. `dedupOnReplay = true` closes that window
    * by anti-joining the snapshot against hist on the full staging content
    * before appending — exactly-once across crashed runs, at the cost of
    * one hist scan. It is OFF by default because it also suppresses
    * legitimately re-staged identical content (the reference would archive
    * such rows twice); choose per pipeline. */
  def run(spark: SparkSession, stagingPath: String, histPath: String,
          dedupOnReplay: Boolean = false): Audit = {
    val batchId = java.util.UUID.randomUUID().toString
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(stagingPath)))
      return Audit(0, batchId) // nothing ever staged — a no-op run, not an error
    val snapshot = spark.read.schema(Schemas.stagingSchema).parquet(stagingPath)
    val toArchive =
      if (dedupOnReplay && java.nio.file.Files.exists(java.nio.file.Paths.get(histPath))) {
        val contentCols = Schemas.stagingSchema.fieldNames.toIndexedSeq
        val hist = spark.read.parquet(histPath).select(contentCols.map(col): _*)
        // Null-safe equality on every content column: a NULL cell must still
        // match its archived twin, or replayed rows with NULLs re-archive.
        val cond = contentCols.map(c => snapshot(c) <=> hist(c)).reduce(_ && _)
        snapshot.join(hist, cond, "left_anti")
      } else snapshot
    // persist: (a) the count and the append share one evaluation of the
    // (possibly hist-scanning) anti-join instead of two; (b) on a dedup
    // replay the append's input is materialized BEFORE writing into
    // histPath, so the job never reads the directory it is appending to
    val stamped = stamp(toArchive, batchId).persist()
    try {
      val moved = stamped.count()
      if (moved > 0) {
        stamped.write.mode("append").parquet(histPath)
      }
      // Truncate even when moved == 0 on a dedup replay: the rows are
      // already in hist, staging must still end empty.
      if (moved > 0 || (dedupOnReplay && !snapshot.isEmpty)) {
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          Schemas.stagingSchema)
          .write.mode("overwrite").parquet(stagingPath)
      }
      Audit(moved, batchId)
    } finally stamped.unpersist()
  }
}
