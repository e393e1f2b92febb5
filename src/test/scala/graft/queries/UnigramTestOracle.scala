package graft.queries

/** Plain-Scala replay of the unigram trainer — word freqs, piece counts,
  * capped vocab, half-bit costs, exhaustive segmentation search with the
  * engine's exact string-encoded tie-break — shared by UnigramOpsSpec
  * (batch recount) and StreamingFuzzParitySpec (stream recount). */
object UnigramTestOracle {

  val MaxPiece = 4
  val Sentinel = 1000000000L

  def universe(words: Seq[String]): Seq[String] =
    words.filter(w => w != null && w.matches("^[a-z]+$") &&
      w.length >= 2 && w.length <= 64)

  def halfBits(c: Long): Long =
    java.lang.Long.toBinaryString(
      math.min(c, 2147483647L) * math.min(c, 2147483647L)).length.toLong

  /** (piece → cost, word → (cost, nPieces, seg)) for the given corpus
    * word occurrences (pre-filter; the universe filter is applied here). */
  def train(wordsRaw: Seq[String])
      : (Map[String, Long], Map[String, (Long, Long, String)]) = {
    val words = universe(wordsRaw)
    val freq = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val pieceCnt = collection.mutable.Map.empty[String, Long]
    for ((w, f) <- freq; s <- 0 until w.length;
         p <- 1 to math.min(MaxPiece, w.length - s))
      pieceCnt(w.substring(s, s + p)) =
        pieceCnt.getOrElse(w.substring(s, s + p), 0L) + f
    val multi = pieceCnt.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(500)
    val vocab = (pieceCnt.filter(_._1.length == 1).toSeq ++ multi).toMap
    val n = vocab.values.sum
    val cost = vocab.map { case (p, c) =>
      p -> 500L * (halfBits(n) - halfBits(c)) }
    (cost, freq.keys.map(w => w -> best(w, cost)).toMap)
  }

  /** WordPiece greedy longest-match-first segmentation (the runtime
    * algorithm `wordpiece_greedy_audit` audits): at each position take
    * the longest vocabulary piece, advance by its length. Singles are
    * always in vocabulary on this universe, so no UNK branch. */
  def greedy(w: String, cost: Map[String, Long]): (Long, Long, String) = {
    var pos = 0
    var c = 0L
    var n = 0L
    val seg = Seq.newBuilder[String]
    while (pos < w.length) {
      val j = (math.min(MaxPiece, w.length - pos) to 1 by -1)
        .find(j => cost.contains(w.substring(pos, pos + j))).get
      val p = w.substring(pos, pos + j)
      c = math.min(c + cost(p), 999999999999L)
      n = math.min(n + 1, 9999L)
      seg += p
      pos += j
    }
    (c, n, seg.result().mkString("·"))
  }

  /** Exhaustive min-cost segmentation under the engine's encoded
    * tie-break; unknown pieces cost [[Sentinel]] (with the engine's
    * saturation ceilings applied, so the comparison mirrors the DP even
    * on pathological inputs). */
  def best(w: String, cost: Map[String, Long]): (Long, Long, String) = {
    def all(i: Int): Seq[List[String]] =
      if (i == w.length) Seq(Nil)
      else for {
        p <- (1 to math.min(MaxPiece, w.length - i)).toSeq
        rest <- all(i + p)
      } yield w.substring(i, i + p) :: rest
    val m = all(0).map { ps =>
      val c = math.min(ps.map(p => cost.getOrElse(p, Sentinel)).sum,
        999999999999L)
      val k = math.min(ps.size.toLong, 9999L)
      (f"$c%012d" + f"$k%04d" + ps.mkString("·"), c, k, ps.mkString("·"))
    }.minBy(_._1)
    (m._2, m._3, m._4)
  }
}
