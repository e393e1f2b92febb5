package graft.queries

import graft.{SparkEntry, SparkSpec}

/** `zorder_pack` must show the MEASURED data-skipping benefit, not just a
  * plausible shape: on the real corpus the z-ordered layout prunes BOTH
  * single-dimension probes to a strict subset of files, while the
  * time-ordered linear layout passes the time probe but must read every
  * file for the customer probe (each linear file spans ~all of d1). Also
  * pins the packing invariants: 16 files per layout, ntile-even row
  * counts, and both layouts packing the same total row count. */
class ZorderSpec extends SparkSpec {

  test("z-order prunes both probe dimensions; linear layout fails the non-time probe (sf0.001)") {
    val rows = SparkEntry.queries("zorder_pack")(spark, "/root/testdata/sf0.001")
      .collect()
    val byLayout = rows.groupBy(_.getAs[String]("layout"))
    assert(byLayout.keySet == Set("zorder", "linear"))
    byLayout.values.foreach(fs => assert(fs.length == 16))

    // ntile evenness: file sizes differ by at most 1 within a layout, and
    // the two layouts pack the same corpus
    val sizes = byLayout.map { case (l, fs) => l -> fs.map(_.getAs[Long]("n_rows")) }
    sizes.values.foreach(ns => assert(ns.max - ns.min <= 1))
    assert(sizes("zorder").sum == sizes("linear").sum)

    def hits(layout: String, c: String): Int =
      byLayout(layout).count(_.getAs[Boolean](c))

    // customer-dimension probe: z-order reads a strict subset; the
    // time-sorted layout has no d1 locality — every file is hit
    assert(hits("linear", "probe_d1_hit") == 16)
    assert(hits("zorder", "probe_d1_hit") < 16)
    // time-dimension probe: BOTH layouts prune (z-order keeps d2 bounded
    // too — that is the point of interleaving vs single-column sorting)
    assert(hits("linear", "probe_d2_hit") < 16)
    assert(hits("zorder", "probe_d2_hit") < 16)
  }
}
