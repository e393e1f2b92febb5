package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k by (score desc, id asc) as a typed Aggregator — the custom
  * aggregate SURVEY §7.4/§7.5 anticipated for similarity search.
  *
  * Why an Aggregator and not a ranking window: a window top-k must shuffle
  * and sort EVERY candidate row per partition key; this aggregate keeps a
  * bounded k-element buffer and combines map-side (partial aggregation), so
  * the shuffle carries at most k rows per key per map task — the shape that
  * survives a 100 TB corpus with millions of candidates per query key.
  *
  * The buffer is a sorted Seq capped at k; merge is a bounded merge of two
  * sorted buffers. Total order (score desc, id asc) makes results
  * deterministic under any partitioning.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  /** Total order: score desc, NaN ranked WORST (not Spark's sort-as-largest
    * — a NaN similarity must never outrank a real one), id asc tiebreak. */
  private def better(a: (Long, Double), b: (Long, Double)): Boolean = {
    val an = a._2.isNaN; val bn = b._2.isNaN
    if (an && bn) a._1 < b._1
    else if (an) false
    else if (bn) true
    else a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
  }

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)], item: (Long, Double)): Seq[(Long, Double)] =
    insert(buf, item)

  private def insert(buf: Seq[(Long, Double)], item: (Long, Double)): Seq[(Long, Double)] = {
    // A full buffer only admits an item strictly better than its tail; this
    // also rejects NaN-scored items (better() is false both ways for NaN),
    // preserving the ≤ k invariant instead of growing past it.
    if (buf.size >= k && !better(item, buf.last)) buf
    else {
      val i = buf.indexWhere(b => better(item, b)) match {
        case -1 => buf.size
        case x => x
      }
      val (pre, post) = buf.splitAt(i)
      ((pre :+ item) ++ post).take(k)
    }
  }

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
