package graft.tools

import org.apache.spark.sql.SparkSession

/** Row dump for scale/value spot-checks: run named SparkEntry queries
  * against a data dir with optional session confs and print the rows.
  * This is how a ScaleCheck run's LAW COLUMNS get verified BY VALUE on a
  * corpus whose knobs are overridden (graft.Verify correctly refuses
  * conf overrides because its DuckDB oracles interpolate the defaults —
  * a value dump has no oracle side, so the override is fine here).
  *
  * Usage: runMain graft.tools.ShowQ <dataDir> [key=value ...] <query ...>
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      throw new IllegalArgumentException(
        "usage: ShowQ <dataDir> [key=value ...] <query ...>"))
    val (confs, names) = args.drop(1).toSeq.partition(_.contains("="))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    names.foreach { name =>
      println(s"== $name")
      graft.SparkEntry.queries(name)(spark, dir).show(100, truncate = false)
    }
    spark.stop()
  }
}
