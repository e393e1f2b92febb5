package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Curve-shape invariants plus cross-checks against the independently
  * implemented probe-2 audit. */
class IvfProbeSweepSpec extends SparkSpec {

  test("ivf_probe_sweep: monotone curve; nprobe=2 point matches ann_recall_audit") {
    val dir = "/root/testdata/sf0.001"
    val sweep = SparkEntry.queries("ivf_probe_sweep")(spark, dir).collect()
      .map(r => (r.getAs[Int]("nprobe"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_milli")))
      .sortBy(_._1)
    assert(sweep.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // candidates, hits, and recall are non-decreasing in nprobe: a larger
    // probe set is a superset, so the re-ranked top-5 can only gain truth
    sweep.sliding(2).foreach { case Array(a, b) =>
      // non-strict: a regenerated corpus could leave a probe-rank list
      // adding nothing for some query; the superset property is the law
      assert(a._2 <= b._2, s"candidates must not shrink: $a -> $b")
      assert(a._3 <= b._3 && a._4 <= b._4, s"recall must not drop: $a -> $b")
    }
    assert(sweep.head._2 < sweep.last._2, "the sweep never widened at all")
    // the nprobe=2 point IS the shipped path: hits must equal the
    // per-query audit's total
    val auditHits = SparkEntry.queries("ann_recall_audit")(spark, dir)
      .collect().map(_.getAs[Long]("n_hits")).sum
    assert(sweep.find(_._1 == 2).get._3 == auditHits)
  }
}
