package graft.queries

import graft.SparkSpec

/** The decode-stub plumbing: typed mapPartitions over (id, payload) with a
  * real schema and deterministic features. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub: schema, determinism, empty payload") {
    val items = Seq(
      (1L, "fake-image-bytes".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, Array.tabulate(1000)(_.toByte))).toDS()
    val out = MultimodalOps.decodeStub(items).collect().sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(f => f.width >= 64 && f.height >= 64 && f.channels == 3))
    assert(out(1).meanByte == 0.0 && out(1).nBytes == 0)
    assert(out(2).nBytes == 1000)
    // deterministic across runs
    val again = MultimodalOps.decodeStub(items).collect().sortBy(_.id)
    assert(out.toSeq == again.toSeq)
  }
}
