package graft.tools
import org.apache.spark.sql.SparkSession

/** Full-evaluation query timer. `count()` (CountQ/ScaleCheck/Bench) lets
  * Catalyst ELIMINATE provably-cardinality-preserving subtrees — e.g. a
  * left join against a unique-keyed aggregate, the shape of every
  * "anchored audit" query (decontaminate_*, the drift audits) — so a
  * count-based timing measures only the anchor scan. This forces every
  * output column through xxhash64 into one aggregate, which nothing can
  * prune, at ~zero overhead beyond the plan itself. */
object ForceQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, args(0))
      val cols = df.columns.map(c => s"`$c`").mkString(", ")
      val t0 = System.nanoTime()
      // bit_xor, not sum: an int64 sum of row hashes overflows under ANSI
      val h = df.selectExpr(s"bit_xor(xxhash64($cols)) AS h").collect()(0)
      println(s"[forceq] $name hash=${h.get(0)} sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
