package graft.queries

import graft.{SparkEntry, SparkSpec}

/** rake_keyphrases: structural contracts + an independent recount of the
  * RAKE word-score relation on the real corpus. */
class RakeSpec extends SparkSpec {

  test("phrases are stopword-free, <= 4 tokens; scores recount") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("rake_keyphrases")(spark, dir).collect()
    assert(got.length == 20)
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    got.foreach { r =>
      val toks = r.getAs[String]("phrase").split(" ")
      assert(toks.length == r.getAs[Int]("n_words"))
      assert(toks.length <= 4)
      assert(toks.forall(t => t.nonEmpty && !stop(t)), "stopword leaked in")
      assert(r.getAs[Long]("n_occurrences") >= 1)
    }
    val ranks = got.sortBy(_.getAs[Int]("rk"))
    ranks.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getAs[Long]("score_milli"), b.getAs[Long]("score_milli"))
        assert(sa > sb || (sa == sb &&
          a.getAs[String]("phrase") < b.getAs[String]("phrase")))
      case _ =>
    }

    // independent recount of degree/freq for every token of the top phrase:
    // rebuild phrase instances in plain Scala and check the score sum
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(r => Option(r.getAs[String]("text")).getOrElse(""))
    val instances = docs.flatMap { t =>
      val runs = collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      t.split(" ", -1).foreach { w =>
        if (w.isEmpty || stop(w)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur = w :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs.map(_.take(4))
    }
    val freq = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val degree = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    instances.foreach { p =>
      p.foreach { w => freq(w) += 1; degree(w) += p.length }
    }
    val top = ranks.head
    val expect = top.getAs[String]("phrase").split(" ")
      .map(w => degree(w) * 1000 / freq(w)).sum
    assert(top.getAs[Long]("score_milli") == expect,
      s"top phrase score: got ${top.getAs[Long]("score_milli")}, recount $expect")
  }
}
