package graft.queries

import graft.{SparkEntry, SparkSpec}

/** kmeans_seeded_convergence: the Bahmani Table-1 experiment as a query.
  * Pins reconciliation with BOTH parents (the ad-hoc arm IS
  * kmeans_train_rounds' rows; seeded_k IS the k-means|| audit's final
  * center count), the ratio arithmetic, the φ/inertia cross-query
  * inequality, and — on this deterministic corpus — the seeded-wins
  * outcome the experiment exists to measure. */
class KmeansSeededSpec extends SparkSpec {

  test("sf0.001: arms reconcile with kmeans_train_rounds and " +
    "kmeanspp_init_audit; ratio arithmetic; seeded wins every round") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("kmeans_seeded_convergence")(spark, dir)
      .collect().map(r => (r.getAs[Long]("round"),
        r.getAs[Long]("seeded_k"), r.getAs[Long]("inertia_seeded"),
        r.getAs[Long]("active_seeded"), r.getAs[Long]("adhoc_k"),
        r.getAs[Long]("inertia_adhoc"), r.getAs[Long]("active_adhoc"),
        Option(r.getAs[Any]("ratio_milli")).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("seeded_wins")))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))

    // the ad-hoc arm IS the trainer: inertia and live-centroid columns
    // must equal kmeans_train_rounds row for row
    val trainer = SparkEntry.queries("kmeans_train_rounds")(spark, dir)
      .collect().map(r => (r.getAs[Long]("round"),
        r.getAs[Long]("inertia"), r.getAs[Long]("n_active"))).toSeq
    assert(out.map(x => (x._1, x._6, x._7)).toSeq == trainer)

    // seeded_k IS the k-means|| audit's final boundary center count
    val kppFinal = SparkEntry.queries("kmeanspp_init_audit")(spark, dir)
      .collect().maxBy(_.getAs[Long]("r"))
    assert(out.forall(_._2 == kppFinal.getAs[Long]("n_centers")))

    // cross-query inequality: the audit's final φ is the MIN-L2 potential
    // of the seed set; Lloyd assigns by max cosine (the serve rule), which
    // can only do worse on the L2 objective — so round-1 seeded inertia
    // is bounded below by φ_final
    val phiFinal = kppFinal.getAs[Long]("phi")
    assert(out.head._3 >= phiFinal,
      s"round-1 seeded inertia ${out.head._3} < final φ $phiFinal")

    // ratio arithmetic + the build-rule center counts
    out.foreach { x =>
      assert(x._5 == 8L)
      assert(x._8.contains(1000L * x._3 / x._6))
      assert(x._9 == (x._3 <= x._6))
      // live centroids never exceed the arm's seed count
      assert(x._4 <= x._2 && x._7 <= x._5)
    }
    // the measured Bahmani outcome on this deterministic corpus: the
    // oversampled seed set beats the ad-hoc 8 at every equal round
    // (data pin — a regression guard, not a theorem)
    assert(out.forall(_._9), s"seeded arm lost a round: ${out.toSeq}")
    // both inertia curves descend (floor-mean Lloyd on this corpus)
    val si = out.map(_._3)
    val ai = out.map(_._6)
    assert(si.zip(si.tail).forall { case (a, b) => b <= a })
    assert(ai.zip(ai.tail).forall { case (a, b) => b <= a })
  }
}
