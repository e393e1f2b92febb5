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

  test("ann_graph_layered_audit: full JVM replay of both layers; " +
    "descent law; flat column reconciles with the greedy audit") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ann_graph_layered_audit")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("l1_entry_id"), r.getAs[Long]("l1_final_id"),
          r.getAs[Long]("moves_l1"), r.getAs[Long]("final_id"),
          r.getAs[Double]("final_cos"), r.getAs[Long]("moves_l0"),
          r.getAs[Double]("flat_cos"), r.getAs[Boolean]("descent_ok"),
          r.getAs[Boolean]("layered_ge_flat")))).toMap
    assert(out.nonEmpty)

    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
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
        r.getAs[Double]("cos")))
    def topAdj(es: Seq[(Long, Long, Double)]): Map[Long, Seq[Long]] =
      es.flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
        .groupBy(_._1).map { case (n, xs) =>
          n -> xs.sortBy { case (_, nbr, c) => (-c, nbr) }.take(4)
            .map(_._2).toSeq
        }
    val adj = topAdj(pairs.toSeq)
    val adj1 = topAdj(pairs.toSeq.filter { case (a, b, _) =>
      promoted(a) && promoted(b) })
    assert(adj1.nonEmpty, "no promoted edges — coin degenerate, re-check")

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
    // flat_cos must reconcile with the flat greedy audit row for row
    val greedy = SparkEntry.queries("ann_graph_greedy_audit")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Double]("final_cos")).toMap
    out.foreach { case (q, g) => assert(g._7 == greedy(q),
      s"flat column drifted from the greedy audit at $q") }
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
