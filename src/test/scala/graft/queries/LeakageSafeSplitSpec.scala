package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The split-hygiene invariant: a component never spans splits, and the
  * component→split rule is the documented md5 hash (independently
  * recomputed here in the JVM). */
class LeakageSafeSplitSpec extends SparkSpec {

  private def expectedSplit(component: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(component.toString.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 8)
    if (java.lang.Long.parseLong(hex, 16) % 10 < 8) "train" else "heldout"
  }

  test("leakage_safe_split: components never span splits; hash rule matches") {
    val dir = java.nio.file.Files.createTempDirectory("lss").toString
    import spark.implicits._
    Seq(
      // a guaranteed near-dup pair (same word set, reordered) + singletons
      (10L, "alpha beta gamma delta"),
      (20L, "delta gamma beta alpha"),
      (30L, "completely different words here"),
      (40L, "another unrelated document text"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("leakage_safe_split")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[Long]("comp_size"), r.getAs[String]("split")))
    assert(out.map(_._1).toSet == Set(10L, 20L, 30L, 40L))
    // the dup pair shares a component and therefore a split
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(10L)._2 == 10L && byId(20L)._2 == 10L && byId(10L)._3 == 2L)
    assert(byId(10L)._4 == byId(20L)._4)
    // every row follows the md5 rule, recomputed independently
    out.foreach { case (id, comp, _, split) =>
      assert(split == expectedSplit(comp), s"doc $id comp $comp")
    }
  }

  test("leakage_safe_split: no component spans splits on real sf0.01 data") {
    val out = SparkEntry.queries("leakage_safe_split")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[String]("split")))
    assert(out.nonEmpty)
    val perComp = out.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(perComp.values.forall(_ == 1), "a component spans splits")
    // both-splits-nonempty would be data-dependent (sf0.01's sampled
    // universe collapses to 3 components, which can all hash one way);
    // the VALUE set is the contract, the proportion is the hash's job
    assert(out.map(_._2).toSet.subsetOf(Set("train", "heldout")))
  }
}
