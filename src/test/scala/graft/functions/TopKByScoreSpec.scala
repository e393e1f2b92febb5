package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopKByScoreSpec extends AnyFunSuite {
  private val agg = new TopKByScore(3)

  test("reduce keeps k best by (score desc, id asc)") {
    val buf = Seq((1L, 0.9), (2L, 0.5), (3L, 0.1))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq((1L, 0.9), (2L, 0.5), (3L, 0.1)))
    val buf2 = agg.reduce(buf, (4L, 0.7))
    assert(buf2 == Seq((1L, 0.9), (4L, 0.7), (2L, 0.5)))
    val worse = agg.reduce(buf2, (5L, 0.01))
    assert(worse == buf2)
  }

  test("ties break on smaller id") {
    val buf = Seq((9L, 0.5), (2L, 0.5), (5L, 0.5), (1L, 0.5))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq((1L, 0.5), (2L, 0.5), (5L, 0.5)))
  }

  test("merge of partial buffers equals global top-k") {
    val items = (1L to 100L).map(i => (i, (i % 17).toDouble / 17))
    val (l, r) = items.splitAt(50)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val global = items.sortBy { case (id, s) => (-s, id) }.take(3)
    assert(merged == global)
    // merge with zero is identity
    assert(agg.merge(merged, agg.zero) == merged)
    assert(agg.merge(agg.zero, merged) == merged)
  }
}
