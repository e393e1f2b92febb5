package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a named SparkEntry query's first rows against an arbitrary data
  * dir — the scale-debugging companion to ScaleCheck/ForceQ (those print
  * seconds and hashes; sometimes the VALUES are the question, e.g. "is
  * the pair relation populated at the 100× corpus under this quantizer
  * override?").
  *
  * Usage: runMain graft.tools.ShowQ <dataDir> [key=value ...] <query> [n]
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val (confs, rest) = args.drop(1).toSeq.partition(_.contains("="))
    val name = rest.head
    val n = rest.drop(1).headOption.map(_.toInt).getOrElse(20)
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
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    graft.SparkEntry.queries(name)(spark, dir).show(n, truncate = false)
    spark.stop()
  }
}
