package graft.queries

import graft.{SparkEntry, SparkSpec}

/** embedding_anisotropy: recomputes one dimension's moments independently
  * and pins the cross-row anisotropy identity. */
class EmbeddingAnisotropySpec extends SparkSpec {

  test("per-dim moments match an independent recount; ratio is corpus-wide") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("embedding_anisotropy")(spark, dir).collect()
    assert(rows.length == 64)
    val n = rows.head.getAs[Long]("n_vecs")
    assert(rows.forall(_.getAs[Long]("n_vecs") == n), "all dims see every vector")

    // independent recount of dim 0 over the same zero-norm-filtered base
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("transform(embedding, x -> cast(round(cast(x as double)*1000, 0) as bigint)) as q")
      .selectExpr("q", "aggregate(q, 0L, (a, x) -> a + x*x) as nrm")
      .where("nrm > 0")
      .selectExpr("q[0] as v").collect().map(_.getAs[Long]("v"))
    assert(vs.length == n)
    val s = vs.sum
    val sq = vs.map(v => v * v).sum
    val mean = math.floor(s.toDouble / n).toLong
    val vr = math.floor(sq.toDouble / n -
      (s.toDouble / n) * (s.toDouble / n)).toLong
    val d0 = rows.find(_.getAs[Int]("dim") == 0).get
    assert(d0.getAs[Long]("mean_q") == mean)
    assert(d0.getAs[Long]("var_q") == vr)

    // anisotropy: one corpus-wide value on every row, the max/min identity
    val vars = rows.map(_.getAs[Long]("var_q"))
    val expect =
      if (vars.min > 0) Some(vars.max * 1000 / vars.min) else None
    rows.foreach { r =>
      assert(Option(r.getAs[Any]("anisotropy_milli"))
        .map(_.asInstanceOf[Long]) == expect)
    }
    // a ratio below 1000 would mean max < min
    expect.foreach(a => assert(a >= 1000))
  }
}
