package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed, MERGEABLE Aggregator —
  * the one-pass frequent-items shape for a 100 TB token stream: the
  * vocabulary never shuffles; each map task carries at most k counters and
  * the combine is the Agarwal et al. (Mergeable Summaries, PODS '12) rule,
  * so partial aggregation composes under ANY partitioning with the classic
  * MG guarantee intact over the merged stream of N items:
  *
  *   est ≤ true_count                      (counts only grow on exact hits)
  *   true_count − est ≤ N/(k+1)           (≤ N/(k+1) decrement rounds)
  *   true_count > N/(k+1) ⇒ item present  (its count can't reach zero)
  *
  * The summary CONTENTS (which sub-threshold items survive, their exact
  * estimates) depend on merge order — only the bounds above are
  * deterministic, which is why the oracle-checked query
  * (`heavy_hitters_sketch`) emits exact counts + bound-verdict booleans,
  * never raw estimates (the approx_sketches discipline).
  *
  * Buffer is an immutable Map (clean ExpressionEncoder round-trip at
  * shuffle boundaries; within a partition the buffer stays deserialized).
  * The decrement-all step is O(k) on a miss with a full buffer — the
  * textbook trade; k is small by design. */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"MisraGries needs k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // MG step: the arriving item and every counter give up one credit
        b.flatMap { case (w, c) => if (c > 1) Some(w -> (c - 1)) else None }
    }

  /** Mergeable-summaries combine: add counters pointwise, then subtract the
    * (k+1)-th largest combined count from everything and drop nonpositive —
    * at most k counts can exceed that cut, so the result respects k, and
    * the subtraction is exactly a batch of MG decrement rounds (error stays
    * ≤ N/(k+1) over the union stream). */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
