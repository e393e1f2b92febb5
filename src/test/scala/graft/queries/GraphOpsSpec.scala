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

  /** Market-basket fixture: baskets {1,2,3}×2, {1,4}×2, {2,5}×1, with one
    * duplicated item row (must count once). Support-2 edges: (1,2), (1,3),
    * (2,3), (1,4) — parts 1-2-3 close a triangle, part 4 hangs off 1,
    * part 5 never reaches support. */
  private def writeBaskets(): String = {
    val dir = java.nio.file.Files.createTempDirectory("baskets").toString
    import spark.implicits._
    Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 3L), // dup item row
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 4L),
      (13L, 1L), (13L, 4L),
      (14L, 2L), (14L, 5L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("part_cooccurrence: hand-checked support and lift; support-1 pairs absent") {
    val dir = writeBaskets()
    val r = SparkEntry.queries("part_cooccurrence")(spark, dir).collect()
      .map(x => (x.getAs[Long]("pa"), x.getAs[Long]("pb")) ->
        ((x.getAs[Long]("n_co"), x.getAs[Long]("n_a"), x.getAs[Long]("n_b"),
          x.getAs[Long]("lift_milli")))).toMap
    // N = 5 orders; part order-counts: 1→4, 2→3, 3→2, 4→2, 5→1
    assert(r((1L, 2L)) == ((2L, 4L, 3L, 1000 * 2 * 5 / (4 * 3))))  // 833
    assert(r((1L, 3L)) == ((2L, 4L, 2L, 1250L)))
    assert(r((2L, 3L)) == ((2L, 3L, 2L, 1666L)))
    assert(r((1L, 4L)) == ((2L, 4L, 2L, 1250L)))
    assert(!r.contains((2L, 5L))) // support 1 → thresholded out
    assert(r.size == 4)
  }

  test("triangle_count: the 1-2-3 triangle is counted once per corner; pendant and leaf get zero") {
    val dir = writeBaskets()
    val r = SparkEntry.queries("triangle_count")(spark, dir).collect()
      .map(x => x.getAs[Long]("node") ->
        ((x.getAs[Long]("deg"), x.getAs[Long]("n_tri"),
          x.getAs[Long]("clustering_milli")))).toMap
    assert(r(1L) == ((3L, 1L, 333L)))  // 2000·1 div (3·2)
    assert(r(2L) == ((2L, 1L, 1000L)))
    assert(r(3L) == ((2L, 1L, 1000L)))
    assert(r(4L) == ((1L, 0L, 0L)))    // pendant: degree 1, no triangle
    assert(!r.contains(5L))            // no surviving edge → not a node
    assert(r.size == 4)
  }
}
