package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The row-local repetition gate (`TextOps.repetitionLocal` — sorted-gram
  * run-length fold, the streaming-safe form) must compute FIELD-FOR-FIELD
  * the same statistics as the batch `text_repetition` query (posexplode +
  * per-doc gram aggregation) — on the real corpus and on a poison corpus
  * (empty text, single word, all-identical words, unicode, exact 20 % /
  * 18 % boundary shapes). A drift here would let the streaming prune gate
  * disagree with the batch verdict table. */
class RepetitionLocalParitySpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("n_tokens", "top2_cnt", "top2gram_milli",
    "dup3_tokens", "dup3gram_milli", "keep")

  private def localRows(df: org.apache.spark.sql.DataFrame) = df
    .filter(col("text").isNotNull)
    .select(col("doc_id"), TextOps.repetitionLocal(col("text")).as("r"))
    .select(col("doc_id") +: fields.map(f => col(s"r.$f").as(f)): _*)
    .collect().map(r => r.getAs[Long]("doc_id") -> fields.map(r.getAs[Any])).toMap

  test("row-local fold equals the batch gram aggregation on the real corpus (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("text_repetition")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> fields.map(r.getAs[Any])).toMap
    val local = localRows(spark.read.parquet(s"$dir/documents.parquet"))
    assert(batch.nonEmpty && batch.keySet == local.keySet)
    batch.foreach { case (id, exp) => assert(local(id) == exp, s"doc $id") }
    // the gate must actually discriminate on the real corpus
    assert(batch.values.exists(_.last == true) && batch.values.exists(_.last == false))
  }

  test("row-local fold handles poison shapes (empty, single word, all-repeat, unicode)") {
    val docs = Seq(
      1L -> "", 2L -> "one", 3L -> "a a a a a a a a",
      4L -> "x y x y x y x y x y", 5L -> "ü ber ü ber ü ber",
      6L -> "p q r s t u v w x y z", 7L -> "a b a b c d e f g h",
      8L -> ("unique" + (1 to 40).map(i => s" w$i").mkString))
      .toDF("doc_id", "text")
    val local = localRows(docs)
    // brute-force recount per doc
    docs.collect().foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val w = row.getAs[String]("text").split(" ", -1)
      def grams(k: Int) = (0 to w.length - k).map(i => w.slice(i, i + k).mkString(" "))
      val c2 = grams(2).groupBy(identity).map(_._2.size)
      val c3 = grams(3).groupBy(identity).map(_._2.size)
      val top2 = if (c2.isEmpty) 0L else c2.max.toLong
      val dup3 = 3L * c3.filter(_ > 1).sum
      val m2 = math.floor(1000.0 * 2 * top2 / w.length).toLong
      val m3 = math.floor(1000.0 * dup3 / w.length).toLong
      assert(local(id) ==
        Seq(w.length, top2, m2, dup3, m3, m2 <= 200 && m3 <= 180), s"doc $id")
    }
  }
}
