package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for temperature_mix_weights and ngram_novelty on the real
  * sf0.001 corpus — the cross-row contracts the per-value oracle compare
  * doesn't state explicitly. */
class CorpusMixNoveltySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("temperature_mix_weights: flattens toward uniform, preserves order") {
    val rows = SparkEntry.queries("temperature_mix_weights")(spark, dir).collect()
    assert(rows.length > 1)
    // both weight columns are ~milli distributions (floor rounding loses
    // at most 1 per source)
    val pSum = rows.map(_.getAs[Long]("p_milli")).sum
    val tSum = rows.map(_.getAs[Long]("t_milli")).sum
    assert(pSum <= 1000 && pSum > 1000 - rows.length)
    assert(tSum <= 1000 && tSum > 1000 - rows.length)
    // α = ½ tempering: the heaviest source is weighted at or below its
    // natural share, the lightest at or above (flattening, not inversion)
    val byP = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(byP.last.getAs[Long]("t_milli") <= byP.last.getAs[Long]("p_milli") + 1)
    assert(byP.head.getAs[Long]("t_milli") + 1 >= byP.head.getAs[Long]("p_milli"))
    // monotone: more tokens never means a smaller temperature weight
    byP.map(_.getAs[Long]("t_milli")).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1) // +1: independent floor rounding
      case _ =>
    }
  }

  test("source_entropy: one source recounts by hand; bounds hold") {
    val rows = SparkEntry.queries("source_entropy")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("ttr_milli") <= 1000)
      // bin-length entropy is bounded by 1000·⌊log₂N⌋
      val cap = 1000L * (63 - java.lang.Long.numberOfLeadingZeros(
        r.getAs[Long]("n_tokens")))
      assert(r.getAs[Long]("entropy_milli") >= 0 &&
        r.getAs[Long]("entropy_milli") <= cap)
    }
    // independent recount of the first source
    val src = rows.head.getAs[String]("source")
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .where(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.lit("")) === src)
      .select("text").collect()
      .flatMap(r => Option(r.getAs[String]("text")).getOrElse("")
        .split(" ", -1).filter(_.nonEmpty))
    def l2(x: Long) = java.lang.Long.toBinaryString(x).length
    val cnts = words.groupBy(identity).map(_._2.length.toLong)
    val n = cnts.sum
    val h = cnts.map(c => c * 1000L * (l2(n) - l2(c))).sum / n
    val got = rows.head
    assert(got.getAs[Long]("n_tokens") == n)
    assert(got.getAs[Long]("n_distinct") == cnts.size)
    assert(got.getAs[Long]("entropy_milli") == h)
  }

  test("ngram_novelty: first doc is all-novel, novel counts tile the gram space") {
    val rows = SparkEntry.queries("ngram_novelty")(spark, dir).collect()
    val withGrams = rows.filter(_.getAs[Long]("n_grams") > 0)
    assert(withGrams.nonEmpty)
    // the earliest doc with grams can only contain first occurrences
    val first = withGrams.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_milli") == 1000L)
    // every distinct gram is novel in exactly one doc
    import org.apache.spark.sql.functions._
    val distinctGrams = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(split(col("text"), " ").as("w"))
      .select(explode(CorpusOps.wordGrams(col("w"), 3)).as("g"))
      .distinct().count()
    assert(withGrams.map(_.getAs[Long]("n_novel")).sum == distinctGrams)
    rows.foreach { r =>
      val m = r.getAs[Long]("novelty_milli")
      assert(m >= 0 && m <= 1000)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams"))
    }
  }
}
