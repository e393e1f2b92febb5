package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Hand-checked tier semantics for the incremental-ingest dedup: exact
  * beats near, near requires a shared band AND verified Jaccard, unmatched
  * docs come back 'new'. */
class DedupOpsSpec extends SparkSpec {

  test("dedup_incremental: exact / near / new tiers against the corpus slice") {
    val dir = java.nio.file.Files.createTempDirectory("incdedup").toString
    import spark.implicits._
    Seq(
      // corpus (doc_id % 10 != 0)
      (1L, "alpha beta gamma delta", "en", "src0", 0L),
      (2L, "completely different words here", "en", "src0", 0L),
      // increment (doc_id % 10 == 0)
      (10L, "alpha beta gamma delta", "en", "src0", 0L), // byte-identical → exact
      // same word SET as doc 1 (all bands shared, J = 1) but different
      // byte text → near, not exact
      (20L, "delta gamma beta alpha", "en", "src0", 0L),
      (30L, "zeta eta theta iota", "en", "src0", 0L))    // no match → new
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("dedup_incremental")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("dup_of"))))).toMap
    assert(out(10L) == (("exact_dup", Some(1L))))
    assert(out(20L) == (("near_dup", Some(1L))))
    assert(out(30L) == (("new", None)))
    assert(out.size == 3) // corpus docs are not classified
  }
}
