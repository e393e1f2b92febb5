package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The Misra–Gries Aggregator's guarantees, checked directly (no Spark):
  * the three theorems hold for every item under sequential reduction AND
  * under arbitrary partition/merge trees — the property partial
  * aggregation relies on. */
class MisraGriesSpec extends AnyFunSuite {

  private def truth(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  private def check(mg: MisraGries, k: Int, xs: Seq[String],
      sketch: Map[String, Long]): Unit = {
    val n = xs.size.toLong
    val eps = n / (k + 1)
    assert(sketch.size <= k, "counter budget exceeded")
    truth(xs).foreach { case (w, t) =>
      val est = sketch.getOrElse(w, 0L)
      assert(est <= t, s"$w overcounted: $est > $t")
      assert(t - est <= eps, s"$w undercounted past N/(k+1): $t - $est > $eps")
      if (t > eps) assert(sketch.contains(w), s"guaranteed item $w missing")
    }
    // no phantom items
    sketch.keys.foreach(w => assert(xs.contains(w)))
  }

  test("sequential reduction on a known stream") {
    val k = 3
    val mg = new MisraGries(k)
    val xs = Seq("a", "a", "a", "b", "b", "c", "d", "a", "e", "a")
    val sketch = xs.foldLeft(mg.zero)(mg.reduce)
    check(mg, k, xs, sketch)
    // 'a' (5 of 10, eps = 2) is guaranteed present with est ≥ 3
    assert(sketch.getOrElse("a", 0L) >= 3)
  }

  test("bounds survive arbitrary partition/merge trees (seeded)") {
    val k = 8
    val mg = new MisraGries(k)
    val rnd = new Random(42)
    for (_ <- 1 to 20) {
      // zipf-ish stream over a vocabulary larger than k
      val xs = Seq.fill(2000)("w" + (math.sqrt(rnd.nextInt(900)).toInt))
      // random partitioning into 1..8 chunks, left-fold merge of partials
      val parts = xs.grouped(1 + rnd.nextInt(300)).toSeq
      val partials = parts.map(_.foldLeft(mg.zero)(mg.reduce))
      val merged = partials.reduceLeft(mg.merge)
      check(mg, k, xs, merged)
      // and a right-leaning merge tree must obey the same bounds
      val mergedR = partials.reduceRight(mg.merge)
      check(mg, k, xs, mergedR)
    }
  }

  test("merge respects the counter budget and never invents counts") {
    val k = 4
    val mg = new MisraGries(k)
    val a = Map("x" -> 10L, "y" -> 5L, "z" -> 2L, "w" -> 1L)
    val b = Map("p" -> 7L, "q" -> 6L, "x" -> 3L, "r" -> 2L)
    val m = mg.merge(a, b)
    assert(m.size <= k)
    // pointwise-sum-then-cut: x must dominate (13 before the cut)
    assert(m.contains("x"))
    m.foreach { case (w, c) =>
      assert(c <= a.getOrElse(w, 0L) + b.getOrElse(w, 0L))
      assert(c > 0)
    }
  }
}
