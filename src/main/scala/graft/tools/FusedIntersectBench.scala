package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-session A/B of the size∘array_intersect fusion: the SAME aggregate
  * over the SAME cached synthetic pair corpus, once with the composed
  * builtin pair (rule disabled), once with the fused expression — same
  * JVM, same cache, warm-up uncounted, so the delta is the expression
  * cost and not box noise (the lesson of every cross-session bench
  * comparison in PLAN.md). Prints one JSON line.
  *
  * Usage: runMain graft.tools.FusedIntersectBench [nRows] [arrLen]
  */
object FusedIntersectBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(2000000)
    val arrLen = args.drop(1).headOption.map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    // word arrays with realistic overlap (~half the alphabet shared)
    val base = spark.range(nRows.toLong)
      .select(col("id"),
        transform(sequence(lit(0), lit(arrLen - 1)),
          i => concat(lit("w"), pmod(col("id") + i * 7, lit(arrLen * 2)))).as("a"),
        transform(sequence(lit(0), lit(arrLen - 1)),
          i => concat(lit("v"), pmod(col("id") + i * 11, lit(arrLen * 4)))).as("bV"))
      .select(col("id"), col("a"),
        // b shares ~half of a's universe: alternate sources
        transform(sequence(lit(0), lit(arrLen - 1)), i =>
          when(i % 2 === 0, concat(lit("w"), pmod(col("id") * 3 + i, lit(arrLen * 2))))
            .otherwise(element_at(col("bV"), i + 1))).as("b"))
      .persist()
    base.count() // materialize

    def composed() = base
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    def fused() = base
      .select(call_function("intersect_count", col("a"), col("b")).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)

    // disable the rewrite for the composed runs so A is really A
    val saved = spark.experimental.extraOptimizations
    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val v = f(); ((System.nanoTime() - t0) / 1e9, v)
    }
    // warm-up both paths (JIT + codegen cache), uncounted
    spark.experimental.extraOptimizations = Seq()
    composed()
    spark.experimental.extraOptimizations = saved
    fused()

    val runs = 3
    val results = (1 to runs).map { _ =>
      spark.experimental.extraOptimizations = Seq()
      val (tc, vc) = time(composed _)
      spark.experimental.extraOptimizations = saved
      val (tf, vf) = time(fused _)
      require(vc == vf, s"fusion changed the answer: $vc vs $vf")
      (tc, tf)
    }
    val tc = results.map(_._1).min
    val tf = results.map(_._2).min
    println(s"""{"metric":"fused_intersect","rows":$nRows,"arr_len":$arrLen,"composed_sec":$tc,"fused_sec":$tf,"speedup":${tc / tf}}""")
    spark.stop()
  }
}
