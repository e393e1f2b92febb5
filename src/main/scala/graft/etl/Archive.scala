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
  * Concurrency control (the reference's advisory lock) lives one level up:
  * [[Pipeline.archive]] wraps this in [[RunLock]], so concurrent runners
  * no-op cleanly instead of double-moving.
  */
object Archive {

  /** `lockBusy = true` marks a run that no-oped because another runner held
    * the staging run lock — the clean abort of the reference
    * (04_archive_pedidos.py:82), not an error and not an empty staging. */
  case class Audit(moved: Long, batchId: String, lockBusy: Boolean = false)

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
    * with an OCCURRENCE-NUMBERED anti-join against hist on the full staging
    * content: copy i of a content row is suppressed iff hist already holds
    * ≥ i copies, so a staging snapshot carrying k identical rows while hist
    * holds m archives exactly max(0, k − m) of them — multiplicity is
    * preserved (k genuinely new duplicates all archive; a pure replay
    * archives nothing), at the cost of one hist scan. It is OFF by default
    * because a crash-free pipeline doesn't need the scan; choose per
    * pipeline. */
  def run(spark: SparkSession, stagingPath: String, histPath: String,
          dedupOnReplay: Boolean = false): Audit = {
    val batchId = java.util.UUID.randomUUID().toString
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(stagingPath)))
      return Audit(0, batchId) // nothing ever staged — a no-op run, not an error
    val snapshot = spark.read.schema(Schemas.stagingSchema).parquet(stagingPath)
    val toArchive =
      if (dedupOnReplay && java.nio.file.Files.exists(java.nio.file.Paths.get(histPath))) {
        import org.apache.spark.sql.expressions.Window
        val contentCols = Schemas.stagingSchema.fieldNames.toIndexedSeq
        val hist = spark.read.parquet(histPath).select(contentCols.map(col): _*)
        // Number the copies of each identical content row on both sides
        // (rows within a partition are identical, so the constant ordering
        // is immaterial), then anti-join on (content, occurrence): copy i
        // survives iff hist holds fewer than i copies — multiplicity-
        // preserving replay suppression. Null-safe equality on every
        // content column: a NULL cell must still match its archived twin,
        // or replayed rows with NULLs re-archive. Window partitioning
        // groups NULL keys together, consistent with <=>.
        val w = Window.partitionBy(contentCols.map(col): _*).orderBy(lit(1))
        val snapN = snapshot.withColumn("__occ", row_number().over(w))
        val histN = hist.withColumn("__occ", row_number().over(w))
        val cond = contentCols.map(c => snapN(c) <=> histN(c)).reduce(_ && _) &&
          snapN("__occ") === histN("__occ")
        snapN.join(histN, cond, "left_anti").drop("__occ")
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
