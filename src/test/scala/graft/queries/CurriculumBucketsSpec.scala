package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The bucketing rule recounted independently: take the per-doc surprisal
  * frame from the already-pinned `word_bigram_surprisal`, re-derive the
  * nine value-histogram decile cuts and every doc's bucket in plain
  * Scala, and require the aggregated buckets to match row for row. */
class CurriculumBucketsSpec extends SparkSpec {

  test("curriculum_buckets: independent recount of cuts and bucket aggregates") {
    val sf = "/root/testdata/sf0.001"
    val surp = SparkEntry.queries("word_bigram_surprisal")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("surprisal_milli")))
    val n = surp.length
    val sorted = surp.map(_._3).sorted
    // cut_d = value at rank ceil(d*n/10): the smallest v whose cumulative
    // count reaches the rank
    val cuts = (1 to 9).map(d => sorted(((d * n + 9) / 10) - 1))
    def decile(s: Long): Int = 1 + cuts.count(_ < s)
    val expected = surp.groupBy(t => decile(t._3)).map { case (dec, rows) =>
      dec -> ((rows.length.toLong, rows.map(_._3).min, rows.map(_._3).max,
        rows.map(_._2).sum))
    }
    val got = SparkEntry.queries("curriculum_buckets")(spark, sf).collect()
      .map(r => r.getAs[Int]("decile") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("surprisal_lo"),
          r.getAs[Long]("surprisal_hi"), r.getAs[Long]("total_bigrams"))))
      .toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == n.toLong)
    assert(got.keySet.forall(d => d >= 1 && d <= 10))
  }
}
