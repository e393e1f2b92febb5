package graft.queries

import org.apache.spark.sql.functions.col

import graft.{SparkEntry, SparkSpec}

/** `semantic_dedup` vs a from-scratch in-memory recount of the whole
  * SemDeDup contract (quantize → per-label centroid → nearest-centroid
  * assignment → within-cluster τ=0.4 pairs → keep-lowest-id), on the real
  * sf0.001 corpus. The recount shares no Spark code with the query. */
class SemanticDedupSpec extends SparkSpec {

  test("semantic_dedup matches an exact in-memory recount (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](2).map(x => math.rint(x.toDouble * 1000).toLong).toArray))

    val e = raw.map { case (id, lbl, q) => (id, lbl, q, q.map(x => x * x).sum) }
      .filter(_._4 > 0)
    def dot(a: Array[Long], b: Array[Long]): Long =
      (0 until math.min(a.length, b.length)).map(i => a(i) * b(i)).sum

    // per-label centroid: floor(sum/n) per dim, dims from any member vector
    val cen = e.groupBy(_._2).map { case (lbl, vs) =>
      val nd = vs.map(_._3.length).max
      val c = (0 until nd).map { d =>
        val comps = vs.filter(_._3.length > d).map(_._3(d))
        math.floor(comps.sum.toDouble / comps.length).toLong
      }.toArray
      lbl -> (c, c.map(x => x * x).sum)
    }.filter(_._2._2 > 0)

    // nearest centroid by (cos desc, label asc)
    val assigned = e.map { case (id, lbl, q, nrm) =>
      val scored = cen.toSeq.map { case (cl, (c, cnrm)) =>
        (dot(q, c).toDouble / math.sqrt((nrm * cnrm).toDouble), cl)
      }
      val (ccos, cl) = scored.minBy { case (s, cl) => (-s, cl) }
      (id, lbl, cl, q, nrm, ccos)
    }

    val dropped = (for {
      a <- assigned; b <- assigned
      if a._3 == b._3 && a._1 < b._1
      cos = dot(a._4, b._4).toDouble / math.sqrt((a._5 * b._5).toDouble)
      if cos >= 0.4
    } yield b._1).toSet

    val expected = assigned
      .map { case (id, lbl, cl, _, _, ccos) => (id, lbl, cl, ccos, !dropped(id)) }
      .sortBy(_._1).toSeq

    val got = SparkEntry.queries("semantic_dedup")(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Int]("cluster"), r.getAs[Double]("ccos"),
        r.getAs[Boolean]("keep"))).toSeq

    assert(got == expected)
    // the corpus itself: every valid vector gets exactly one verdict row
    assert(got.size == e.length)
  }
}
