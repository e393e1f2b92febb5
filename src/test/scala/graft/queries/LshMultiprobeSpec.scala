package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Cross-query invariants for the multiprobe audit: the probe-0 row IS
  * plain LSH (ann_lsh_cosine's candidate relation), so its counts must
  * match that query exactly; probe-1 rows are by construction pairs plain
  * LSH cannot see. */
class LshMultiprobeSpec extends SparkSpec {

  test("lsh_multiprobe_audit: probe-0 equals plain LSH; probe-1 is extra") {
    val sf = "/root/testdata/sf0.001"
    val mp = SparkEntry.queries("lsh_multiprobe_audit")(spark, sf).collect()
      .map(r => r.getAs[Int]("probe_dist") ->
        ((r.getAs[Long]("n_candidate_pairs"), r.getAs[Long]("n_tau_pairs"))))
      .toMap
    val lsh = SparkEntry.queries("ann_lsh_cosine")(spark, sf).collect()
    assert(mp.contains(0))
    assert(mp(0)._1 == lsh.length.toLong,
      "probe-0 candidates must equal the plain LSH candidate pairs")
    assert(mp(0)._2 == lsh.count(_.getAs[Double]("cos") >= 0.4).toLong,
      "probe-0 tau pairs must equal the plain LSH tau pairs")
    // probe-1 rows (if any) are pairs in no shared exact bucket — counts
    // are non-negative and tau hits bounded by candidates
    mp.get(1).foreach { case (c, t) =>
      assert(c > 0 && t >= 0 && t <= c)
    }
    assert(mp.keySet.subsetOf(Set(0, 1)))
  }
}
