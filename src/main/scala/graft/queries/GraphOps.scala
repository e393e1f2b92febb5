package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** Iterative graph analytics beyond connected components: fixed-iteration
  * PageRank over the part↔supplier co-occurrence graph — the centrality
  * score a catalog/recommendation pipeline derives from a bipartite
  * relation ("which parts/suppliers sit at the densest crossroads?").
  *
  * Determinism is the hard part of cross-engine iterative rank: float
  * PageRank accumulates in engine-specific order, so the twins could
  * differ in the last bits. This implementation keeps ALL mass in integer
  * MILLI units with explicit floor division at both distribution points —
  * integer sums are order-independent, so Spark and DuckDB agree bit-for-
  * bit after any number of iterations (floor losses are part of the
  * defined semantics, exactly like the conv_milli/ share_milli contract
  * elsewhere in the suite).
  */
object GraphOps {

  /** 4-iteration integer-milli PageRank (d = 0.85 as 850/1000) over the
    * bipartite part↔supplier graph from lineitem's DISTINCT pairs, with
    * edges in BOTH directions (so every node has out-degree ≥ 1 — no
    * dangling-mass redistribution needed, and inner joins preserve every
    * node because every node also has an in-edge).
    *
    * Update rule, all BIGINT: contrib(u→v) = mass(u) div outdeg(u);
    * mass'(v) = 150 + (850 · Σ contrib) div 1000. Node ids pack the two
    * entity spaces as part·2 / supplier·2+1.
    *
    * Scale shape: edges⋈deg is built ONCE and persisted (it feeds all 4
    * iterations); each iteration is one mass-relation join (node-keyed,
    * dimension-sized — it broadcasts while it fits) plus one map-side-
    * combining sum keyed on dst. The iteration count is FIXED, so lineage
    * depth is bounded and needs no checkpointing (unlike the fixpoint
    * loop in connected_components); at a billion edges each round is the
    * same single dst-keyed shuffle a groupBy costs. */
  private def pagerankLinks(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select(col("p").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("p").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outd"))
    // one relation carrying (src, dst, outd): persisted because all 4
    // iterations re-join it (LazyPlanSpec pattern — lazy persist, single
    // construction)
    val edgesW = edges.join(deg, "src").persist()
    var mass = deg.select(col("src").as("node"), lit(1000L).as("mass"))
    for (_ <- 1 to 4) {
      mass = edgesW.join(mass, edgesW("src") === mass("node"))
        .select(col("dst"), expr("mass div outd").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("in_mass"))
        .select(col("dst").as("node"),
          (lit(150L) + expr("850 * in_mass div 1000")).as("mass"))
    }
    mass
      .select(col("node"), (col("node") % 2 === 0).as("is_part"),
        expr("node div 2").as("entity_id"), col("mass").as("mass_milli"))
      .orderBy("node")
  }

  /** The DuckDB twin unrolls the 4 iterations as chained CTEs (recursive
    * CTEs restrict aggregation in the recursive term, and a fixed unroll
    * is portable to any engine). HUGEINT intermediates are cast back to
    * BIGINT at each step so dtypes match. */
  private val pagerankLinksSql = {
    def step(prev: String, out: String) =
      s"""$out AS (
         |  SELECT e.dst AS node,
         |    CAST(150 + 850 * SUM(m.mass // e.outd) // 1000 AS BIGINT) AS mass
         |  FROM edgesw e JOIN $prev m ON e.src = m.node GROUP BY 1)"""
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
       |  FROM lineitem),
       |edges AS (
       |  SELECT p AS src, s AS dst FROM pairs
       |  UNION ALL SELECT s AS src, p AS dst FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS outd FROM edges GROUP BY 1),
       |edgesw AS (
       |  SELECT e.src, e.dst, d.outd FROM edges e JOIN deg d USING (src)),
       |m0 AS (SELECT src AS node, CAST(1000 AS BIGINT) AS mass FROM deg),
       |${step("m0", "m1")},
       |${step("m1", "m2")},
       |${step("m2", "m3")},
       |${step("m3", "m4")}
       |SELECT node, node % 2 = 0 AS is_part, node // 2 AS entity_id,
       |  mass AS mass_milli
       |FROM m4 ORDER BY node""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("pagerank_links", pagerankLinks, Some(pagerankLinksSql)))
}
