package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise MAX merge of fixed-width register arrays — the custom
  * aggregate the HyperANF/HyperBall deployment shape needs: one PACKED
  * m-register sketch per node instead of m (node, j, rho) rows, so the
  * per-round shuffle carries |V| array rows (m longs each, combined
  * map-side) rather than |V|·m skinny rows. This is exactly how
  * Boldi–Rosa–Vigna's implementation holds its counters (contiguous
  * register banks max-merged in place).
  *
  * Why an Aggregator and not an expression chain: element-wise max is a
  * fold over GROUP members, which only an aggregate can do map-side;
  * the zip_with(max) expression form would need collect_list first —
  * materializing every neighbor's registers per node, the memory shape
  * the sketch exists to avoid.
  *
  * Buffers mutate in place (the Aggregator contract allows reusing the
  * reduce buffer); inputs are never mutated. Empty buffers (zero) are
  * all-0 arrays — rho ≥ 1 for every present register, so 0 IS the
  * "empty register" encoding and max-merge preserves it. */
class RegisterMax(m: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(m)(0L)

  private def maxInto(b: Array[Long], a: Array[Long]): Array[Long] = {
    var i = 0
    while (i < m && i < a.length) {
      if (a(i) > b(i)) b(i) = a(i)
      i += 1
    }
    b
  }

  override def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
    maxInto(b, a)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    maxInto(a, b)

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
