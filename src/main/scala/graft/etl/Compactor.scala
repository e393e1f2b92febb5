package graft.etl

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, SparkSession}

/** Small-files compaction — the lake-maintenance job a per-file append
  * pipeline needs: [[Pipeline.loadStage]] appends one parquet file set
  * per loaded CSV, so a staging directory that has seen N loads holds
  * ≥ N small files and every downstream scan pays N file-open/footer
  * costs. At 100 TB the same pressure appears on any
  * micro-batch-appended table; the standard fix is a periodic rewrite
  * into ~[[defaultTargetBytes]]-sized files, which is exactly what
  * [[compact]] does (count → size → `repartition(ceil(bytes/target))` →
  * atomic write-swap via the [[Pipeline.atomicOverwrite]] protocol).
  *
  * Ordering note: a plain compaction makes NO ordering promise (parquet
  * appends never did either). For a directory laid out by
  * [[ZOrderWriter]], use [[ZOrderWriter.compact]] instead — it re-sorts
  * on the Morton key and regenerates the min/max manifest, so pruning
  * survives the rewrite. */
object Compactor {

  /** 128 MiB — the classic healthy-parquet-file size (one HDFS block /
    * one comfortable scan task). */
  val defaultTargetBytes: Long = 128L * 1024 * 1024

  private[graft] def dataFiles(path: Path): Seq[Path] = {
    if (!Files.exists(path)) return Nil
    val s = Files.walk(path)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => Files.isRegularFile(p) && {
        val n = p.getFileName.toString
        // the Spark hidden-path convention: a _- or .-prefixed COMPONENT
        // anywhere under the root (e.g. ZOrderWriter's _graft_manifest
        // directory) is metadata, not data
        n.endsWith(".parquet") &&
          path.relativize(p).iterator().asScala.forall { c =>
            val cn = c.toString
            !cn.startsWith("_") && !cn.startsWith(".")
          }
      }).toSeq
    } finally s.close()
  }

  /** One compaction outcome, queryable like the pipeline's audits. */
  case class Audit(filesBefore: Int, bytesBefore: Long, filesAfter: Int,
      rows: Long, skipped: Boolean)

  /** Rewrite `path` into ⌈bytes/targetBytes⌉ files (atomic swap; readers
    * see old or new generation, never a mix). No-ops (skipped = true)
    * when the directory already has ≤ that many files — a scheduled
    * compactor must be idempotent and cheap when there is nothing to do. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = defaultTargetBytes): Audit = {
    val p = Paths.get(path)
    val files = dataFiles(p)
    if (files.isEmpty) return Audit(0, 0L, 0, 0L, skipped = true)
    val bytes = files.map(Files.size).sum
    val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (files.size <= want)
      return Audit(files.size, bytes, files.size, -1L, skipped = true)
    Pipeline.atomicOverwrite(spark.read.parquet(path).repartition(want), path)
    // audit row count from the NEW generation's parquet footers — a
    // metadata read, no data scan and no whole-table cache residency
    val rows = spark.read.parquet(path).count()
    Audit(files.size, bytes, dataFiles(p).size, rows, skipped = false)
  }
}
