package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Hand-computed integer-milli PageRank on a 4-node bipartite graph:
  * p1—{s1,s2}, p2—{s1}, with one duplicate lineitem row (must count once).
  *
  * Node ids: p1=2, p2=4, s1=3, s2=5; out-degrees 2,1,2,1. Tracing the
  * update mass'(v) = 150 + 850·Σ(mass(u) div outd(u)) div 1000 through 4
  * iterations gives (1285, 1285, 710, 710) for (p1, s1, p2, s2). */
class GraphOpsSpec extends SparkSpec {

  test("pagerank_links: 4-iteration integer-milli trace; duplicate pairs count once") {
    val dir = java.nio.file.Files.createTempDirectory("graphops").toString
    import spark.implicits._
    Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)) // (partkey, suppkey), one dup
      .toDF("l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("pagerank_links")(spark, dir).collect()
      .map(x => (x.getAs[Long]("node"), x.getAs[Boolean]("is_part"),
        x.getAs[Long]("entity_id"), x.getAs[Long]("mass_milli"))).toSeq
    assert(r == Seq(
      (2L, true, 1L, 1285L),  // p1: hub, highest rank
      (3L, false, 1L, 1285L), // s1: symmetric hub
      (4L, true, 2L, 710L),   // p2: leaf
      (5L, false, 2L, 710L))) // s2: leaf
    // floor-division losses only ever shed mass: total ≤ nodes × 1000
    assert(r.map(_._4).sum <= 4000L)
  }
}
