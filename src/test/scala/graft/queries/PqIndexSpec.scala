package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** PqIndex: a saved-then-loaded index serves bit-identically to the
  * in-session ADC pipeline, and the artifacts have the deployment shape
  * (tiny codebook, 4 codes per vector). */
class PqIndexSpec extends SparkSpec {

  test("save + serve ≡ in-session pq_adc_topk; artifact shapes correct") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("pqindex").toString
    PqIndex.save(spark, dir, out)

    val cb = spark.read.parquet(s"$out/codebook.parquet")
    assert(cb.count() == PqOps.pqM * PqOps.pqK)
    val codes = spark.read.parquet(s"$out/codes.parquet")
    val nVecs = codes.select("vec_id").distinct().count()
    assert(codes.count() == nVecs * PqOps.pqM, "4 codes per encoded vector")

    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter("vec_id < 5")
    val served = PqIndex.serveAdcTopk(spark, out, queries)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_dist"))).toSeq
    val inSession = SparkEntry.queries("pq_adc_topk")(spark, dir)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_dist"))).toSeq
    assert(served.nonEmpty)
    assert(served == inSession)
  }
}
