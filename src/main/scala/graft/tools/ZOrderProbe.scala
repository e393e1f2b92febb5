package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.ZOrderWriter

/** Scale probe for the z-order write path: times the layout write (zorder
  * + linear baselines) over a dir's orders table, then reports per-layout
  * pruned-file counts and pruned-read times for the two zorder_pack probe
  * dimensions. One JSON line, the ScaleCheck discipline.
  *
  * Usage: runMain graft.tools.ZOrderProbe <dataDir> [numFiles] */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: ZOrderProbe <dataDir> [numFiles]"))
    val numFiles = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val d1 = expr("CAST(((o_custkey % 256) + 256) % 256 AS INT)")
    val d2 = expr("CAST(floor(((dayofyear(o_orderdate) - 1) * 256) / 366.0) AS INT)")
    val probe = Some((64, 79))
    val root = java.nio.file.Files.createTempDirectory("zprobe").toString

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tWriteZ) = time(
      ZOrderWriter.write(orders, s"$root/z", d1, d2, numFiles, ZOrderWriter.ZOrder))
    val (_, tWriteL) = time(
      ZOrderWriter.write(orders, s"$root/lin", d1, d2, numFiles, ZOrderWriter.Linear))

    def probeStats(path: String, d1R: Option[(Int, Int)], d2R: Option[(Int, Int)])
        : (Int, Long, Double) = {
      val files = ZOrderWriter.prunedFiles(spark, path, d1R, d2R)
      val pred = d1R.map { case (lo, hi) => d1.between(lo, hi) }
        .orElse(d2R.map { case (lo, hi) => d2.between(lo, hi) }).get
      val (n, t) = time(
        ZOrderWriter.readPruned(spark, path, d1R, d2R).filter(pred).count())
      (files.size, n, t)
    }
    val (zf1, zn1, zt1) = probeStats(s"$root/z", probe, None)
    val (zf2, zn2, zt2) = probeStats(s"$root/z", None, probe)
    val (lf1, ln1, lt1) = probeStats(s"$root/lin", probe, None)
    val (lf2, ln2, lt2) = probeStats(s"$root/lin", None, probe)
    require(zn1 == ln1 && zn2 == ln2,
      s"layouts must agree on probe answers: z=($zn1,$zn2) lin=($ln1,$ln2)")

    println(s"""{"metric":"zorder_probe","dir":${ScaleCheck.jsonString(dir)},""" +
      s""""rows":${orders.count()},"files":$numFiles,""" +
      f""""write_z_sec":$tWriteZ%.3f,"write_lin_sec":$tWriteL%.3f,""" +
      s""""d1_probe":{"z_files":$zf1,"lin_files":$lf1,"rows":$zn1,""" +
      f""""z_sec":$zt1%.3f,"lin_sec":$lt1%.3f},""" +
      s""""d2_probe":{"z_files":$zf2,"lin_files":$lf2,"rows":$zn2,""" +
      f""""z_sec":$zt2%.3f,"lin_sec":$lt2%.3f}}""")
    spark.stop()
  }
}
