package graft.tools

import org.apache.spark.sql.SparkSession

/** Row dump for scale/value spot-checks: run named SparkEntry queries
  * against a data dir with optional session confs and print the rows.
  * This is how a ScaleCheck run's LAW COLUMNS get verified BY VALUE on a
  * corpus whose knobs are overridden (graft.Verify correctly refuses
  * conf overrides because its DuckDB oracles interpolate the defaults —
  * a value dump has no oracle side, so the override is fine here).
  *
  * Usage: runMain graft.tools.ShowQ <dataDir> [key=value ...] <query ...> [n]
  * (a trailing integer is the row limit, default 100 — the historical
  * positional form; unknown query names fail with a usage message
  * instead of a bare NoSuchElementException).
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      throw new IllegalArgumentException(
        "usage: ShowQ <dataDir> [key=value ...] <query ...> [rowLimit]"))
    val rest = args.drop(1).toSeq
    val (limitArg, nonLimit) = rest.lastOption
      .filter(s => s.nonEmpty && s.forall(_.isDigit)) match {
      case Some(n) => (n.toInt, rest.init)
      case None    => (100, rest)
    }
    val (confs, names) = nonLimit.partition(_.contains("="))
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (names.isEmpty || unknown.nonEmpty)
      throw new IllegalArgumentException(
        (if (unknown.nonEmpty) s"unknown queries: ${unknown.mkString(", ")}. "
         else "no queries named. ") +
          "usage: ShowQ <dataDir> [key=value ...] <query ...> [rowLimit]")
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
      graft.SparkEntry.queries(name)(spark, dir).show(limitArg, truncate = false)
    }
    spark.stop()
  }
}
