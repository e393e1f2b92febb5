package graft.queries

import graft.{SparkEntry, SparkSpec}

/** kcore_peel: full independent JVM recount of the synchronous peel on the
  * same support-thresholded graph, plus the convergence/consistency
  * contracts. */
class KcorePeelSpec extends SparkSpec {

  test("peel rounds match an independent in-memory peel; core is consistent") {
    val dir = "/root/testdata/sf0.001"
    // rebuild the graph exactly as the query family does: distinct
    // (order, part) items, basket pairs, support >= 2
    val items = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter("l_orderkey is not null and l_partkey is not null")
      .selectExpr("l_orderkey as o", "l_partkey as p").distinct()
    val pairs = items.as("a").join(items.as("b"),
        org.apache.spark.sql.functions.expr("a.o = b.o and a.p < b.p"))
      .groupBy("a.p", "b.p").count().filter("count >= 2")
      .selectExpr("a.p as u", "b.p as v").collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")))

    // independent synchronous peel, k = 2
    var adj = collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    pairs.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    val deg0 = adj.map { case (n, ns) => n -> ns.size.toLong }.toMap
    var alive = adj.keySet.toSet
    val peelRound = collection.mutable.Map.empty[Long, Int]
    for (r <- 1 to 8) {
      val dying = alive.filter(n => (adj(n) & alive).size < 2)
      dying.foreach(n => peelRound(n) = r)
      alive = alive -- dying
    }

    val got = SparkEntry.queries("kcore_peel")(spark, dir).collect()
    assert(got.length == deg0.size)
    got.foreach { r =>
      val n = r.getAs[Long]("node")
      assert(r.getAs[Long]("deg0") == deg0(n), s"deg0 of $n")
      assert(r.getAs[Int]("peel_round") == peelRound.getOrElse(n, 0),
        s"peel_round of $n")
      val core = r.getAs[Int]("peel_round") == 0
      val dc = r.getAs[Long]("deg_core")
      if (core) assert(dc >= 2, s"survivor $n below k")
      else assert(dc == 0L, s"peeled $n keeps core degree")
    }
    // the fixed 8 rounds CONVERGE on this graph (the scaladoc claim):
    // nothing falls in the last round
    assert(got.forall(_.getAs[Int]("peel_round") < 8))
    assert(got.exists(_.getAs[Int]("peel_round") == 0), "a 2-core exists")
    // (sf0.001's thresholded graph is all-core — the peeled-periphery path
    // is exercised by the sf0.01 oracle run: rounds 1-3 remove 345 nodes)
  }
}
