package graft.queries

import graft.{SparkEntry, SparkSpec}

/** `corpus_prune_verdicts` must agree row-for-row with the component
  * queries it composes — the cross-query consistency contract: a doc is
  * canonical iff `dedup_canonical` names it, the gate flags equal
  * `text_quality`/`text_repetition` keeps, and `keep`/`reason` follow
  * the documented precedence. Checked on the real sf0.001 corpus. */
class CorpusPruneSpec extends SparkSpec {

  test("verdicts agree with dedup_canonical, text_quality and text_repetition (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val canonicalIds = SparkEntry.queries("dedup_canonical")(spark, dir)
      .collect().map(_.getAs[Long]("canonical_id")).toSet
    val qKeep = SparkEntry.queries("text_quality")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val rKeep = SparkEntry.queries("text_repetition")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap

    val got = SparkEntry.queries("corpus_prune_verdicts")(spark, dir).collect()
    assert(got.nonEmpty)
    // some of each verdict class must exist on the real corpus, or the
    // composition proves nothing
    assert(got.exists(_.getAs[Boolean]("keep")))
    assert(got.exists(r => !r.getAs[Boolean]("keep")))
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("is_canonical") == canonicalIds(id))
      assert(r.getAs[Boolean]("quality_ok") == qKeep.getOrElse(id, false))
      assert(r.getAs[Boolean]("repetition_ok") == rKeep.getOrElse(id, false))
      val expectKeep = canonicalIds(id) && qKeep.getOrElse(id, false) &&
        rKeep.getOrElse(id, false)
      assert(r.getAs[Boolean]("keep") == expectKeep)
      val expectReason =
        if (!canonicalIds(id)) "exact_dup"
        else if (!qKeep.getOrElse(id, false)) "quality"
        else if (!rKeep.getOrElse(id, false)) "repetition"
        else "ok"
      assert(r.getAs[String]("reason") == expectReason, s"doc $id")
    }
  }
}
