package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-session A/B of the canon_norm fusion: the normalize-then-hash
  * grouping (the dedup_canonical scan shape) over the same corpus, once
  * with the composed regex pipeline (rewrite rule disabled), once fused —
  * same JVM, warm-up uncounted, answers asserted identical. The measured
  * gap at scale100 (500k docs, ~320 chars): composed ~23 s — ~22 s of it
  * the `[^a-z0-9 ]` RegExpReplace alone, ~40× the same pattern's
  * replaceAll cost in plain Java on the same data — vs fused ~1.2 s.
  * Prints one JSON line.
  *
  * Usage: runMain graft.tools.CanonProbe [dataDir]
  */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scale100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val d = spark.read.parquet(dir + "/documents.parquet").persist()
    d.count() // materialize: measure the expression, not the scan

    val canon = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    def run() = d.groupBy(md5(canon).as("h")).count().count()

    val saved = spark.experimental.extraOptimizations
    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val v = f(); ((System.nanoTime() - t0) / 1e9, v)
    }
    // warm both paths, uncounted
    spark.experimental.extraOptimizations = Seq(); run()
    spark.experimental.extraOptimizations = saved; run()

    val (tc, vc) = { spark.experimental.extraOptimizations = Seq(); time(run _) }
    val (tf, vf) = { spark.experimental.extraOptimizations = saved; time(run _) }
    require(vc == vf, s"fusion changed the answer: $vc vs $vf")
    println(s"""{"metric":"canon_norm_ab","composed_sec":$tc,"fused_sec":$tf,""" +
      s""""speedup":${tc / tf},"groups":$vc,"dir":${ScaleCheck.jsonString(dir)}}""")
    spark.stop()
  }
}
