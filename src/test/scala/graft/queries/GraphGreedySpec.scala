package graft.queries

import graft.{SparkEntry, SparkSpec}

/** ann_graph_greedy_audit: replay the ENTIRE pipeline in plain Scala —
  * quantization, top-4 graph off the public LSH pair query, entry rule,
  * three strict-improvement hops, brute truth — and require exact
  * agreement (ids and IEEE cosines) with the query output. */
class GraphGreedySpec extends SparkSpec {

  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => BigDecimal(x.toDouble * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
    s
  }

  test("independent JVM replay of the whole greedy walk (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ann_graph_greedy_audit")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("entry_id"), r.getAs[Long]("final_id"),
          r.getAs[Double]("final_cos"), r.getAs[Long]("true_nn_id"),
          r.getAs[Double]("true_cos"), r.getAs[Boolean]("found_exact"),
          r.getAs[Long]("moves")))).toMap
    assert(out.nonEmpty)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .flatMap { r =>
        Option(r.getAs[Any]("embedding")).map(_ =>
          r.getAs[Long]("vec_id") -> quant(r.getSeq[Float](
            r.fieldIndex("embedding"))))
      }.toMap
    val nrm = emb.map { case (id, q) => id -> dot(q, q) }
    val live = emb.filter { case (id, _) => nrm(id) > 0 }
    def cos(a: Long, b: Long): Double =
      dot(live(a), live(b)).toDouble / math.sqrt((nrm(a) * nrm(b)).toDouble)

    // graph: top-4 per node over the public LSH pair relation
    val pairs = SparkEntry.queries("ann_lsh_cosine")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cos")))
    val adj = pairs.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .groupBy(_._1).map { case (n, es) =>
        n -> es.sortBy { case (_, nbr, c) => (-c, nbr) }.take(4).map(_._2).toSeq
      }
    val nodes = adj.keys.toSeq.sorted
    assert(nodes.size >= 2, "graph too small for the walk")
    val (n1, n2) = (nodes(0), nodes(1))

    val queries = live.keys.filter(_ < 5).toSeq.sorted
    assert(queries.nonEmpty)
    for (qid <- queries) {
      val entry = if (qid == n1) n2 else n1
      var cur = entry
      var ccos = cos(qid, cur)
      var moves = 0L
      for (_ <- 1 to 3) {
        val cands = adj.getOrElse(cur, Seq.empty).filter(_ != qid)
        if (cands.nonEmpty) {
          val best = cands.map(n => (n, cos(qid, n)))
            .minBy { case (n, c) => (-c, n) }
          if (best._2 > ccos) { cur = best._1; ccos = best._2; moves += 1 }
        }
      }
      val truth = live.keys.filter(_ != qid).map(n => (n, cos(qid, n)))
        .minBy { case (n, c) => (-c, n) }
      val got = out(qid)
      assert(got == ((entry, cur, ccos, truth._1, truth._2,
        cur == truth._1, moves)), s"query $qid: got $got, " +
        s"replay (${(entry, cur, ccos, truth._1, truth._2, cur == truth._1, moves)})")
    }
    // the audit is honest only if the walk sometimes moves on this corpus
    assert(out.values.exists(_._7 > 0) || out.values.forall(_._6),
      "no movement and no exact hits — degenerate graph, check the build")
  }

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Plain-Scala HNSW build off the public LSH pair relation: insert
    * clock, per-node top-8 earlier-inserted candidate pool, the
    * Malkov–Yashunin greedy prune, symmetric built edges (duplicates
    * preserved — the engine unions without distinct). Returns
    * (candidates by node in rank order with cos, kept nbrs by node in
    * rank order, symmetric built edge list). */
  private def replayBuild(pairs: Seq[(Long, Long, Double)],
      cos: (Long, Long) => Double)
      : (Map[Long, Seq[(Long, Double)]], Map[Long, Seq[Long]],
         Seq[(Long, Long, Double)]) = {
    def insH(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"ins:$id").take(12), 16)
    val dire = pairs.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .filter { case (n, nbr, _) =>
        val (hn, hb) = (insH(n), insH(nbr))
        hb < hn || (hb == hn && nbr < n)
      }
    val cand = dire.groupBy(_._1).map { case (n, es) =>
      n -> es.sortBy { case (_, nbr, c) => (-c, nbr) }.take(8)
        .map(e => (e._2, e._3))
    }
    val kept = cand.map { case (n, cs) =>
      val k = scala.collection.mutable.ArrayBuffer[Long]()
      for ((nbr, cq) <- cs)
        if (!k.exists(s => cos(nbr, s) >= cq)) k += nbr
      n -> k.toSeq
    }
    val bsym = kept.toSeq.flatMap { case (n, ks) =>
      ks.flatMap(nbr => Seq((n, nbr, cos(n, nbr)), (nbr, n, cos(n, nbr))))
    }
    (cand, kept, bsym)
  }

  private def topAdj4(es: Seq[(Long, Long, Double)]): Map[Long, Seq[Long]] =
    es.groupBy(_._1).map { case (n, xs) =>
      n -> xs.sortBy { case (_, nbr, c) => (-c, nbr) }.take(4)
        .map(_._2).toSeq
    }

  test("ann_graph_layered_audit: full JVM replay — HNSW build, both " +
    "layer walks, flat baseline; descent law") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ann_graph_layered_audit")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("l1_entry_id"), r.getAs[Long]("l1_final_id"),
          r.getAs[Long]("moves_l1"), r.getAs[Long]("final_id"),
          r.getAs[Double]("final_cos"), r.getAs[Long]("moves_l0"),
          r.getAs[Double]("flat_cos"), r.getAs[Boolean]("descent_ok"),
          r.getAs[Boolean]("layered_ge_flat")))).toMap
    assert(out.nonEmpty)

    def promoted(id: Long): Boolean =
      java.lang.Long.parseLong(md5hex(s"lvl:$id").take(6), 16) % 4 == 0

    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .flatMap { r =>
        Option(r.getAs[Any]("embedding")).map(_ =>
          r.getAs[Long]("vec_id") -> quant(r.getSeq[Float](
            r.fieldIndex("embedding"))))
      }.toMap
    val nrm = emb.map { case (id, q) => id -> dot(q, q) }
    val live = emb.filter { case (id, _) => nrm(id) > 0 }
    def cos(a: Long, b: Long): Double =
      dot(live(a), live(b)).toDouble / math.sqrt((nrm(a) * nrm(b)).toDouble)

    val pairs = SparkEntry.queries("ann_lsh_cosine")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cos"))).toSeq
    val (_, kept, bsym) = replayBuild(pairs, cos)
    assert(kept.nonEmpty, "empty build — no candidates, re-check")
    val adj = topAdj4(bsym)
    val adj1 = topAdj4(bsym.filter { case (a, b, _) =>
      promoted(a) && promoted(b) })
    assert(adj1.nonEmpty, "no promoted built edges — coin degenerate")

    def walk(g: Map[Long, Seq[Long]], qid: Long, start: Long)
        : (Long, Double, Long) = {
      var cur = start
      var ccos = cos(qid, cur)
      var moves = 0L
      for (_ <- 1 to 3) {
        val cands = g.getOrElse(cur, Seq.empty).filter(_ != qid)
        if (cands.nonEmpty) {
          val best = cands.map(n => (n, cos(qid, n)))
            .minBy { case (n, c) => (-c, n) }
          if (best._2 > ccos) { cur = best._1; ccos = best._2; moves += 1 }
        }
      }
      (cur, ccos, moves)
    }
    val n0 = adj.keys.toSeq.sorted
    val n1s = adj1.keys.toSeq.sorted
    for (qid <- live.keys.filter(_ < 5).toSeq.sorted) {
      val l1Entry = if (qid == n1s(0) && n1s.size > 1) n1s(1) else n1s(0)
      val (l1Cur, l1Cos, l1Moves) = walk(adj1, qid, l1Entry)
      val (fCur, fCos, fMoves) = walk(adj, qid, l1Cur)
      val flatEntry = if (qid == n0(0)) n0(1) else n0(0)
      val (_, flatCos, _) = walk(adj, qid, flatEntry)
      val got = out(qid)
      assert(got == ((l1Entry, l1Cur, l1Moves, fCur, fCos, fMoves,
        flatCos, fCos >= l1Cos, fCos >= flatCos)),
        s"query $qid: got $got, replay ${(l1Entry, l1Cur, l1Moves, fCur,
          fCos, fMoves, flatCos, fCos >= l1Cos, fCos >= flatCos)}")
      // the strict-improvement law can never fail by construction of the
      // walk — pin that the emitted column agrees
      assert(got._8, s"descent violated at $qid")
    }
  }

  test("ann_graph_build_vs_static reconciles with both parent walks") {
    val dir = "/root/testdata/sf0.001"
    val ab = SparkEntry.queries("ann_graph_build_vs_static")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Double]("built_cos"), r.getAs[Double]("static_cos"),
          r.getAs[Long]("built_moves"), r.getAs[Long]("static_moves"),
          r.getAs[Boolean]("built_ge_static")))).toMap
    assert(ab.nonEmpty)
    // built arm ≡ the layered audit's flat column: same walk, same
    // built graph, same lowest-node entry rule
    val flat = SparkEntry.queries("ann_graph_layered_audit")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Double]("flat_cos")).toMap
    // static arm ≡ the flat greedy audit's final cosine
    val greedy = SparkEntry.queries("ann_graph_greedy_audit")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Double]("final_cos"), r.getAs[Long]("moves")))).toMap
    ab.foreach { case (q, (bc, sc, _, sm, ge)) =>
      assert(bc == flat(q), s"built arm drifted from layered flat at $q")
      assert((sc, sm) == greedy(q),
        s"static arm drifted from the greedy audit at $q")
      assert(ge == (bc >= sc), s"built_ge_static inconsistent at $q")
    }
  }

  test("ann_graph_maintain_audit: intact arm ≡ built arm; maintenance " +
    "accounting laws; deletes genuinely bit") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ann_graph_maintain_audit")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    // the intact arm IS build_vs_static's built arm: same checkpointed
    // graph, same armed walk, same lowest-node entry rule
    val ab = SparkEntry.queries("ann_graph_build_vs_static")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Double]("built_cos"), r.getAs[Long]("built_moves"))))
      .toMap
    // independent decile-9 count straight off the embeddings file (the
    // audit's deletion rule, recomputed JVM-side)
    val md = java.security.MessageDigest.getInstance("MD5")
    def insDecile(id: Long): Long = {
      val h = md.digest(s"ins:$id".getBytes("UTF-8"))
        .take(6).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      (h * 10) >> 48
    }
    // quantizedBase's validity rule, replayed: quantize then norm > 0
    val validIds = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .flatMap { r =>
        Option(r.getAs[Any]("embedding")).flatMap { _ =>
          val q = quant(r.getSeq[Float](r.fieldIndex("embedding")))
          if (dot(q, q) > 0L) Some(r.getAs[Long]("vec_id")) else None
        }
      }.toSet
    val expDeleted = validIds.count(insDecile(_) == 9).toLong
    out.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert((r.getAs[Double]("intact_cos"),
        r.getAs[Long]("intact_moves")) == ab(q),
        s"intact arm drifted from build_vs_static's built arm at $q")
      assert(r.getAs[Long]("n_deleted") == expDeleted,
        s"n_deleted != independent decile-9 count at $q")
      assert(r.getAs[Long]("n_reinserted") <= expDeleted)
      assert(r.getAs[Boolean]("law_ok"), s"law_ok false at $q")
      assert(r.getAs[Boolean]("maint_ge_intact") ==
        (r.getAs[Double]("maint_cos") >= r.getAs[Double]("intact_cos")))
      assert(r.getAs[Long]("delta_milli") ==
        math.floor((r.getAs[Double]("maint_cos") -
          r.getAs[Double]("intact_cos")) * 1000).toLong)
    }
    // the cycle must genuinely bite or the A/B is vacuous
    assert(expDeleted > 0, "degenerate corpus: empty delete decile")
    assert(out.map(_.getAs[Long]("n_reinserted")).head > 0)
  }

  test("ann_graph_delete_audit: full JVM replay — decile-9 delete, " +
    "donated candidate pools, shared prune repair, per-decile deltas") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ann_graph_delete_audit")(spark, dir)
      .collect()
    assert(out.length == 9)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .flatMap { r =>
        Option(r.getAs[Any]("embedding")).map(_ =>
          r.getAs[Long]("vec_id") -> quant(r.getSeq[Float](
            r.fieldIndex("embedding"))))
      }.toMap
    val nrm = emb.map { case (id, q) => id -> dot(q, q) }
    val live = emb.filter { case (id, _) => nrm(id) > 0 }
    def cos(a: Long, b: Long): Double =
      dot(live(a), live(b)).toDouble / math.sqrt((nrm(a) * nrm(b)).toDouble)
    val pairs = SparkEntry.queries("ann_lsh_cosine")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cos"))).toSeq
    val (_, _, bsym) = replayBuild(pairs, cos)
    // duplicate-free symmetric kept adjacency
    val adjSet = bsym.map { case (n, b, _) => (n, b) }.toSet
    val adjBy = adjSet.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def insH(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"ins:$id").take(12), 16)
    def dec(id: Long): Long = insH(id) * 10 / (1L << 48)
    def cm(c: Double): Long = math.floor(c * 1000).toLong + 1000L
    val dels = live.keys.filter(dec(_) == 9L).toSet
    val surv = live.keys.filterNot(dels).toSet
    case class Agg(var n: Long = 0, var aff: Long = 0, var lost: Long = 0,
      var nc: Long = 0, var nk: Long = 0, var reconn: Long = 0,
      var withCand: Long = 0, var befE: Long = 0, var befCm: Long = 0,
      var keptCm: Long = 0)
    val byDec = scala.collection.mutable.Map.empty[Long, Agg]
    surv.foreach(u => byDec.getOrElseUpdate(dec(u), Agg()).n += 1)
    for (u <- surv; nbrs = adjBy.getOrElse(u, Set.empty)
         if nbrs.exists(dels)) {
      val a = byDec(dec(u))
      a.aff += 1
      a.lost += nbrs.count(dels)
      a.befE += nbrs.size
      nbrs.foreach(w => a.befCm += cm(cos(u, w)))
      val oldc = nbrs.filter(surv)
      val newc = for (v <- nbrs if dels(v);
                      w <- adjBy.getOrElse(v, Set.empty)
                      if w != u && surv(w)) yield w
      val rcand = (oldc ++ newc).toSeq.distinct
        .map(w => (w, cos(u, w)))
        .sortBy { case (w, c) => (-c, w) }.take(8)
      val rkept = {
        val k = scala.collection.mutable.ArrayBuffer[Long]()
        for ((w, cq) <- rcand)
          if (!k.exists(s => cos(w, s) >= cq)) k += w
        k.toSeq
      }
      a.nc += rcand.length; a.nk += rkept.length
      if (rcand.nonEmpty) a.withCand += 1
      if (rkept.nonEmpty) a.reconn += 1
      rkept.foreach(w => a.keptCm += cm(cos(u, w)))
    }
    val expected = byDec.toSeq.sortBy(_._1).map { case (d, a) =>
      (d, a.n, a.aff, a.lost, a.nc, a.nk,
        if (a.nc > 0) 1000 * (a.nc - a.nk) / a.nc else 0L,
        if (a.aff > 0) 1000 * a.befE / a.aff else 0L,
        if (a.aff > 0) 1000 * a.nk / a.aff else 0L,
        if (a.aff > 0) 1000 * a.reconn / a.aff else 0L,
        if (a.befE > 0) Some(a.befCm / a.befE - 1000) else None,
        if (a.nk > 0) Some(a.keptCm / a.nk - 1000) else None,
        a.nk <= a.nc && a.reconn == a.withCand)
    }
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7), r.getLong(8), r.getLong(9),
      if (r.isNullAt(10)) None else Some(r.getLong(10)),
      if (r.isNullAt(11)) None else Some(r.getLong(11)),
      r.getBoolean(12))).toSeq
    assert(got == expected)
    // accounting laws hold in every decile, and deletes genuinely bit:
    // some decile lost edges and repaired through non-empty pools
    assert(got.forall(_._13))
    assert(got.map(_._4).sum > 0 && got.map(_._6).sum > 0)
  }

  test("ann_graph_insert_audit: full JVM replay of the build — insert " +
    "clock, candidate pools, greedy prune, decile stats and laws") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ann_graph_insert_audit")(spark, dir)
      .collect()
    assert(out.nonEmpty)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .flatMap { r =>
        Option(r.getAs[Any]("embedding")).map(_ =>
          r.getAs[Long]("vec_id") -> quant(r.getSeq[Float](
            r.fieldIndex("embedding"))))
      }.toMap
    val nrm = emb.map { case (id, q) => id -> dot(q, q) }
    val live = emb.filter { case (id, _) => nrm(id) > 0 }
    def cos(a: Long, b: Long): Double =
      dot(live(a), live(b)).toDouble / math.sqrt((nrm(a) * nrm(b)).toDouble)
    val pairs = SparkEntry.queries("ann_lsh_cosine")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cos"))).toSeq
    val (cand, kept, _) = replayBuild(pairs, cos)

    def insH(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"ins:$id").take(12), 16)
    def cm(c: Double): Long = math.floor(c * 1000).toLong + 1000L
    case class Agg(var n: Long = 0, var nc: Long = 0, var nk: Long = 0,
      var maxDeg: Long = 0, var degZero: Long = 0,
      var keptSum: Long = 0, var keptN: Long = 0,
      var topSum: Long = 0, var topN: Long = 0)
    val byDecile = scala.collection.mutable.Map.empty[Long, Agg]
    for (node <- live.keys) {
      val d = insH(node) * 10 / (1L << 48)
      val a = byDecile.getOrElseUpdate(d, Agg())
      val cs = cand.getOrElse(node, Seq.empty)
      val ks = kept.getOrElse(node, Seq.empty)
      a.n += 1; a.nc += cs.length; a.nk += ks.length
      a.maxDeg = math.max(a.maxDeg, ks.length.toLong)
      if (cs.nonEmpty && ks.isEmpty) a.degZero += 1
      // pairwise cosines among the KEPT set and among the same-size
      // top-by-cos prefix of the candidate pool
      for (i <- ks.indices; j <- 0 until i) {
        a.keptSum += cm(cos(ks(i), ks(j))); a.keptN += 1
      }
      val top = cs.take(ks.length).map(_._1)
      for (i <- top.indices; j <- 0 until i) {
        a.topSum += cm(cos(top(i), top(j))); a.topN += 1
      }
    }
    val expected = byDecile.toSeq.sortBy(_._1).map { case (d, a) =>
      (d, a.n, a.nc, a.nk, 1000 * a.nc / a.n, 1000 * a.nk / a.n,
        if (a.nc > 0) 1000 * (a.nc - a.nk) / a.nc else 0L,
        if (a.keptN > 0) Some(a.keptSum / a.keptN - 1000) else None,
        if (a.topN > 0) Some(a.topSum / a.topN - 1000) else None,
        if (a.keptN > 0 && a.topN > 0)
          a.keptSum / a.keptN <= a.topSum / a.topN else true,
        a.maxDeg <= 8 && a.nk <= a.nc && a.degZero == 0)
    }
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      if (r.isNullAt(7)) None else Some(r.getLong(7)),
      if (r.isNullAt(8)) None else Some(r.getLong(8)),
      r.getBoolean(9), r.getBoolean(10))).toSeq
    assert(got == expected)
    // laws hold everywhere; the prune demonstrably fired somewhere
    assert(out.forall(_.getAs[Boolean]("deg_ok")))
    assert(out.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_cand")),
      "the heuristic never pruned anything — degenerate corpus?")
  }

  test("ann_graph_beam_sweep: beam-1 cos parity with the greedy walk; widening never hurts") {
    val dir = "/root/testdata/sf0.001"
    val sweep = SparkEntry.queries("ann_graph_beam_sweep")(spark, dir)
      .collect().map(r => (r.getAs[Long]("beam_width"),
        r.getAs[Long]("query_id")) ->
        ((r.getAs[Double]("final_cos"), r.getAs[Boolean]("found_exact"),
          r.getAs[Long]("n_states"))))
      .toMap
    val greedy = SparkEntry.queries("ann_graph_greedy_audit")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Double]("final_cos")).toMap
    assert(sweep.nonEmpty)
    val queries = greedy.keys.toSeq.sorted
    for (q <- queries) {
      // beam-1 and the greedy walk rank by the same cosines; only the
      // exact-tie rule differs, so the landed SCORE must agree
      assert(sweep((1L, q))._1 == greedy(q), s"beam-1 cos for query $q")
      // measured monotone on THIS corpus (a regression pin, not a
      // theorem: a dropped low-scoring intermediate can in principle
      // outrun a wider beam — if the corpus ever regenerates into that
      // geometry, re-measure before weakening the query)
      assert(sweep((2L, q))._1 >= sweep((1L, q))._1, s"beam 2 worse at $q")
      assert(sweep((3L, q))._1 >= sweep((2L, q))._1, s"beam 3 worse at $q")
      assert(sweep((3L, q))._3 <= 3L && sweep((1L, q))._3 == 1L)
    }
  }
}
