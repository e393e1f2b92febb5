package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase timer for connected_components: edge discovery vs the iterative
  * label loop — the per-phase attribution the bench total can't show.
  * Usage: runMain graft.tools.CcProbe [sfDir] */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc-probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val (bl, edges0) = graft.queries.DedupOps.ccEdgeDiscovery(spark, dir)
    val nEdges = time("edge discovery") { edges0.count() }
    bl.unpersist()
    println(s"[cc-probe] edges: $nEdges")
    val n = time("full query") {
      graft.SparkEntry.queries("connected_components")(spark, dir).count()
    }
    println(s"[cc-probe] rows: $n")
    spark.stop()
  }
}
