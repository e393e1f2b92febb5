package graft.tools

import org.apache.spark.sql.SparkSession

import graft.etl.Compactor

/** Scale probe for the small-files compactor: stages a dir's orders
  * table as `nSmall` separate appends (the loadStage accumulation
  * shape), times [[Compactor.compact]], and reports the file-count and
  * wall-time line (ScaleCheck discipline).
  *
  * Usage: runMain graft.tools.CompactProbe <dataDir> [nSmall] */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: CompactProbe <dataDir> [nSmall]"))
    val nSmall = args.lift(1).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Files.createTempDirectory("compactprobe")
      .toString + "/t"
    // the accumulation shape: one parquet file set per append
    spark.read.parquet(s"$dir/orders.parquet").repartition(nSmall)
      .write.parquet(out)
    val before = Compactor.dataFiles(java.nio.file.Paths.get(out)).size
    val t0 = System.nanoTime()
    val audit = Compactor.compact(spark, out)
    val sec = (System.nanoTime() - t0) / 1e9
    require(!audit.skipped && audit.filesBefore == before,
      s"probe setup mismatch: $audit vs $before files")
    println(s"""{"metric":"compact_probe","dir":${ScaleCheck.jsonString(dir)},""" +
      s""""rows":${audit.rows},"files_before":${audit.filesBefore},""" +
      s""""bytes_before":${audit.bytesBefore},""" +
      s""""files_after":${audit.filesAfter},""" +
      f""""compact_sec":$sec%.3f}""")
    spark.stop()
  }
}
