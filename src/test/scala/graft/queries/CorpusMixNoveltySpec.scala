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
