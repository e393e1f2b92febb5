package graft.queries

import graft.{SparkEntry, SparkSpec}

/** pca_power_step: independent recount of the accumulation vector and the
  * near-unit-norm contract of the emitted direction. */
class PcaPowerStepSpec extends SparkSpec {

  test("s recomputes from raw embeddings; v1 is unit-norm up to quantization") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("pca_power_step")(spark, dir).collect()
    assert(rows.length == 64)

    // independent recount: s_d = Σ q[0]·q[d] over the zero-norm-filtered base
    val qs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("transform(embedding, x -> cast(round(cast(x as double)*1000, 0) as bigint)) as q")
      .selectExpr("q", "aggregate(q, 0L, (a, x) -> a + x*x) as nrm")
      .where("nrm > 0")
      .select("q").collect().map(_.getSeq[Long](0))
    val sExpect = Array.tabulate(64)(d => qs.map(q => q.head * q(d)).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("s") == sExpect(r.getAs[Int]("dim")))
    }

    // the direction must be ~unit in milli: Σ v² within quantization slack
    // (64 dims, each off by < 1 milli after two floor divisions)
    val v = rows.map(r => r.getAs[Long]("v1_milli"))
    val n2 = v.map(x => x * x).sum
    assert(n2 <= 1002000, s"norm too large: $n2")
    assert(n2 >= 990000, s"norm too small: $n2")
    // one power step from e0 on a generic corpus keeps a dominant dim-0
    // component (the start direction never flips sign in one step)
    val d0 = rows.find(_.getAs[Int]("dim") == 0).get.getAs[Long]("v1_milli")
    assert(d0 > 0)
  }
}
