package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** Corpus-preparation operators a pre-training data pipeline runs after
  * cleaning/dedup: benchmark decontamination and token-budget shard
  * packing. Extends the reference's staging→curated movement (SURVEY §2
  * O-24) with the two steps every LLM corpus build adds between "curated"
  * and "training shards".
  */
object CorpusOps {

  /** Word n-gram array of a text column (possibly with duplicates) — the
    * ONE tokenization shared by the batch decontamination query and its
    * streaming twin ([[graft.streaming.StreamingPipeline.decontaminateStream]]):
    * a change here changes both sides together, preserving the
    * twin-equivalence contract. */
  def wordGrams(w: Column, n: Int): Column =
    // w must be a MATERIALIZED word-array column (an attribute), never an
    // inline split(...): the lambda below reads it n times per gram, and
    // an inline expression would re-run the regex split per element_at —
    // the measured 2× shingle-stage regression the trigramShingles
    // scaladoc documents. Callers split once in a projection first.
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Benchmark decontamination: flag training documents that share any
    * word n-gram with a held-out benchmark set — the standard pre-training
    * hygiene step (the n-gram-overlap test popularized by the GPT-3 and
    * C4/PaLM corpus reports, run here at n=3 so the synthetic corpus
    * yields a non-trivial contaminated set).
    *
    * Scale shape: a real benchmark side is an eval set, not a corpus —
    * small enough that the optimizer broadcasts it (no hint forced: this
    * synthetic split is corpus-proportional, so a hard `broadcast()`
    * would OOM at the 100 TB target; with auto-broadcast the plan
    * degrades gracefully to a shuffle join when the bench side outgrows
    * the threshold). No skew risk either way: a hot train gram meets
    * ≤ 1 distinct bench row, so the join fans out at most 1:1. Every
    * train doc is emitted with its hit count (0 = clean) so the
    * keep/drop decision is a filter downstream.
    *
    * Determinism: distinct-gram counting in exact integers; the benchmark
    * split (doc_id % 97) is content-independent on both engines. */
  private def decontaminateNgrams(s: SparkSession, dir: String): DataFrame = {
    val n = 3
    val docs = t(s, dir, "documents")
    val g = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(array_distinct(wordGrams(col("w"), n))).as("g"))
    val bench = g.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
    val train = g.filter(col("doc_id") % 97 =!= 0)
    val hits = train.join(bench, Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    val trainTotals = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    // anchor on the documents table, not the gram relation: a short doc
    // with zero grams must still be emitted (clean), or it silently skips
    // the decontamination verdict
    t(s, dir, "documents").filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
      .join(trainTotals, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("is_contaminated", col("n_contaminated") >= 1)
      .orderBy("doc_id")
  }

  private val decontaminateNgramsSql =
    """WITH d AS (SELECT doc_id, string_split(text,' ') w FROM documents),
      |g AS (SELECT DISTINCT doc_id, s AS g
      |      FROM d, UNNEST(list_transform(range(greatest(len(w)-2, 0)),
      |        i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)),
      |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
      |train AS (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0),
      |hits AS (SELECT t.doc_id, COUNT(*) AS n_contaminated
      |         FROM train t JOIN bench b USING (g) GROUP BY 1),
      |totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY 1)
      |SELECT d.doc_id, COALESCE(t.n_grams, 0) AS n_grams,
      |  COALESCE(h.n_contaminated, 0) AS n_contaminated,
      |  COALESCE(h.n_contaminated, 0) >= 1 AS is_contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
      |LEFT JOIN totals t ON d.doc_id = t.doc_id
      |LEFT JOIN hits h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** log2 of the bloom bitmap width for [[decontaminateBloom]] (bits; the
    * bitmap is 2^this bits = 2^(this-3) bytes broadcast to every task).
    * Default 2^20 bits = 128 KiB — ~100× headroom over the sf0.1 bench-gram
    * count, FPR ≈ (k·n/m)^k ≈ 1e-8 there. A deployment sizes this to its
    * eval set: ~1e8 eval grams want 2^30 bits = 128 MiB (still one
    * broadcast; beyond that, shard the eval set and run the gate per
    * shard). Session conf `graft.bloom.log2bits` overrides; values outside
    * [6, 62] are rejected loudly — `1L << b` wraps mod 64 in Scala, so an
    * unchecked 63+ would silently yield a negative/degenerate modulus (and
    * pmod against it negative bit positions) instead of a wider bitmap. */
  val bloomLog2BitsDefault = 20
  def bloomLog2Bits(s: SparkSession): Int = {
    val b = s.conf.getOption("graft.bloom.log2bits").map(_.toInt)
      .getOrElse(bloomLog2BitsDefault)
    require(b >= 6 && b <= 62,
      s"graft.bloom.log2bits=$b out of range [6, 62]: the bitmap width is " +
        "1L << b, which wraps (shifts are mod 64) at 63+ and degenerates " +
        "below one 64-bit word at <6")
    b
  }

  /** The k position expressions of a gram in a 2^log2m-bit bloom bitmap —
    * THE single definition of the bloom hash scheme, shared by the batch
    * build, the batch probe, and the streaming gate
    * ([[graft.streaming.StreamingPipeline.bloomGateStream]]): build and
    * probe MUST agree bit-for-bit or the no-false-negative contract
    * silently breaks, so there is exactly one copy of this math. */
  private val bloomHashes = 4
  private def bloomPositions(gram: Column, m: Long): Seq[Column] =
    (0 until bloomHashes).map(h => pmod(xxhash64(lit(h), gram), lit(m)))

  /** One-row bloom bitmap (`bm: array<bigint>`, the DENSE m/64-word
    * bitmap; word i = element i+1) over a gram relation (column `g`).
    * The build is one explode + two hash-aggs + a one-row dense fill;
    * the row is m/8 bytes regardless of gram count (128 KiB at the
    * default 2^20 bits). */
  def bloomBitmapOf(grams: DataFrame, m: Long): DataFrame = {
    val words = m >> 6
    grams
      .select(explode(array(bloomPositions(col("g"), m): _*)).as("pos"))
      .groupBy(shiftright(col("pos"), 6).as("wi"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        col("pos").bitwiseAND(lit(63L)).cast("int"))).as("bits"))
      // DENSE array, not a map: Spark's element_at on a MapType is a
      // LINEAR SCAN of the keys, so a map-shaped bitmap turns every probe
      // into O(occupied words) — measured 103 s for decontaminate_bloom
      // at the 100× corpus (4 probes × ~50M grams × ~k-thousand-entry
      // scans) where the dense-array probe is O(1) per lookup. The fill
      // is ONE row's fold over the sorted occupied words (zero-padding
      // the gaps), O(words) copy — 16 K longs at the default 2^20 bits;
      // a 2^30-bit deployment shards the eval set per the sizing note
      // above rather than growing this build.
      .agg(array_sort(collect_list(struct(col("wi"), col("bits"))))
        .as("ws"))
      .select(expr(
        """aggregate(ws, CAST(array() AS ARRAY<BIGINT>), (acc, w) ->
          |  concat(acc,
          |    array_repeat(CAST(0 AS BIGINT), CAST(w.wi AS INT) - size(acc)),
          |    array(w.bits)))""".stripMargin).as("partial"))
      .select(concat(col("partial"), expr(
        s"array_repeat(CAST(0 AS BIGINT), $words - size(partial))"))
        .as("bm"))
  }

  /** Probe verdict for one gram against the broadcast bitmap column.
    * Positions are in [0, m), so the 1-based dense-array index is always
    * in range — no absent-key fallback exists by construction. */
  def bloomHitExpr(gram: Column, bm: Column, m: Long): Column =
    bloomPositions(gram, m).map { p =>
      element_at(bm, (shiftright(p, 6) + lit(1L)).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          p.bitwiseAND(lit(63L)).cast("int"))) =!= 0L
    }.reduce(_ && _)

  /** Bloom-prefiltered decontamination: same verdict table as
    * [[decontaminateNgrams]] (one row per train doc: gram totals, bench-gram
    * hits, contamination flag), but the train side is screened against a
    * bloom bitmap of the bench grams BEFORE any join, and only bloom
    * survivors reach the exact semi-join verify. Bloom filters admit no
    * false negatives, and the exact verify removes the false positives, so
    * the output is bit-identical to the exact query — the oracle twin IS
    * the exact SQL.
    *
    * 100 TB rationale: exact decontamination semi-joins EVERY train gram
    * (the full corpus, shuffled on gram) against the eval set. The bloom
    * pass inverts that: the eval set compresses to a 2^[[bloomLog2Bits]]-bit
    * bitmap (built in one hash-agg over k·|bench| positions, collected to a
    * single-row map and broadcast), the corpus probes it map-side in a
    * codegen'd projection (k xxhash64 + bit tests per gram, zero shuffle),
    * and only the ~FPR + true-hit fraction of grams — for a clean corpus,
    * almost nothing — pays the shuffle into the verify join. Same shape
    * Spark's AQE runtime bloom filter injects for selective joins, made
    * explicit and contract-checked here: the gate composes with any join
    * strategy and its width is an auditable session knob rather than a
    * planner heuristic.
    *
    * Build plumbing: positions are `xxhash64(h, gram) mod m` for seed index
    * h < k — k independent 64-bit hashes via seed-column mixing, all
    * codegen'd; the bitmap is a `map<long, long>` of 64-bit words keyed by
    * position >> 6 (bit_or-aggregated), so an UNSET word is simply absent
    * (element_at → NULL → coalesce 0 → probe miss) and bitmap size tracks
    * OCCUPIED words, not width. */
  private def decontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val n = 3
    val m = 1L << bloomLog2Bits(s)
    val docs = t(s, dir, "documents")
    val g = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(array_distinct(wordGrams(col("w"), n))).as("g"))
    val bench = g.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
    val train = g.filter(col("doc_id") % 97 =!= 0)
    val bitmap = bloomBitmapOf(bench, m)
    val bloomHit = bloomHitExpr(col("g"), col("bm"), m)
    // the probe verdict is folded INTO the join key (gram on hit, NULL on
    // miss) rather than kept as a boolean filter: Catalyst's unconditional
    // PushDownLeftSemiAntiJoin would happily push the exact verify join
    // BELOW a plain bloom-hit Filter (output-identical, prefilter-defeating
    // — the join would again see every gram); a key computed from the
    // broadcast bitmap cannot be pushed below the probe, so the plan is
    // pinned to probe → filter → verify. NULLs are filtered before the
    // join so misses never shuffle.
    val candidates = train.crossJoin(broadcast(bitmap))
      .select(col("doc_id"), when(bloomHit, col("g")).as("g"))
      .filter(col("g").isNotNull)
    val hits = candidates.join(bench, Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    val trainTotals = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    t(s, dir, "documents").filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
      .join(trainTotals, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("is_contaminated", col("n_contaminated") >= 1)
      .orderBy("doc_id")
  }

  /** Fuzzy-contamination Jaccard threshold (milli): a train doc whose best
    * bench near-dup reaches word-set J ≥ this is contaminated — the same
    * 0.5 cut as the CC near-dup edge rule, so "fuzzy-contaminated" means
    * exactly "near-duplicate of a bench doc" in this suite's terms. */
  val deconJaccardMilli = 500L

  /** Fuzzy (near-duplicate) benchmark decontamination — the FOURTH tier
    * of the family: [[decontaminateNgrams]] catches verbatim n-gram
    * overlap, the bloom tier accelerates it, the semantic tier catches
    * paraphrase by embedding; this tier catches lightly-edited copies of
    * eval items (the fuzzy-dedup decontamination pass the Llama/GPT-4
    * corpus reports describe) that exact grams miss once a few words
    * change, at lexical rather than embedding cost. Train and bench
    * splits are banded with the SAME 16-seed / 4-band MinHash scheme as
    * the dedup tier ([[DedupOps.minhashBandsOfShingles]] — one copy of the
    * signature math), candidates are band-bucket collisions between the
    * two sides, and each candidate is verified with exact word-set
    * Jaccard on row-local arrays. One row per train doc: candidate
    * count, best bench Jaccard, the nearest bench witness (max-J,
    * min-id tiebreak — the semdedup_increment convention), and the
    * contamination verdict at J ≥ [[deconJaccardMilli]].
    *
    * The shingle universe is word TRIGRAMS on both the signature and the
    * verify side — NOT the dedup tier's word unigrams: contamination is a
    * claim about shared PHRASING, and on any corpus whose vocabulary is
    * small relative to document length (this synthetic one extremely so:
    * 31 words), word-SET Jaccard saturates — measured here, word-set J
    * flags 83 % of train docs against a 6-doc bench set while trigram J
    * tops out at 0.03 for genuinely unrelated docs. Trigram banding also
    * keeps the candidate join selective at scale for the same reason.
    *
    * Scale shape: the bench side is an EVAL SET, so its band relation is
    * tiny and the band equi-join degrades gracefully to broadcast; the
    * train side is one signature aggregate (16 min-columns, map-side
    * combining) — never a token-scale shuffle onto a gram key. The
    * verify reads each candidate's two trigram ARRAYS row-locally
    * (`array_intersect`, candidate-pair-sized — the ccEdgeDiscovery
    * choice), so no gram key ever becomes a join key. A degenerate bench
    * bucket (an eval item duplicated enough to collide everywhere) is
    * capped at [[DedupOps.maxCcBucket]] and drop-logged — fan-out per
    * train row is bounded by the cap. Recall contract is the banding
    * curve `lsh_recall_audit` measures: a J ≥ 0.5 pair is caught with
    * p = 1−(1−J⁴)⁴; the oracle applies IDENTICAL banding, so the compare
    * checks the scheme, not exhaustive recall.
    *
    * Determinism: candidates sharing no trigram are dropped before
    * scoring (their J is 0 and the division would be 0/0); j_milli is
    * floor(1000·i/u) — the [[DedupOps]] pair convention. NULL-text and
    * sub-3-word docs have no shingles, hence no candidates, and are
    * emitted clean via the documents-anchored left join. */
  private def decontaminateMinhash(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val bb = DedupOps.minhashBandsOfShingles(DedupOps.trigramShingles(bench))
    val bsz = bb.groupBy(col("band"), col("band_sig")).agg(count(lit(1)).as("k"))
    val okb = withDropMetric(s, bsz, "graft_drop_decon_bucket",
        sum(when(col("k") > DedupOps.maxCcBucket(s), 1L).otherwise(0L)))
      .filter(col("k") <= DedupOps.maxCcBucket(s))
      .select(col("band"), col("band_sig"))
    val bbok = bb.join(okb, Seq("band", "band_sig"), "left_semi")
    val cand = DedupOps
      .minhashBandsOfShingles(DedupOps.trigramShingles(train)).as("x")
      .join(bbok.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_sig") === col("y.band_sig"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("bench_id"))
      .distinct()
    def triSets(d: DataFrame) = d
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), array_distinct(wordGrams(col("w"), 3)).as("ws"))
    val wa = triSets(train)
      .select(col("doc_id"), col("ws").as("wa"), size(col("ws")).as("na"))
    val wb = triSets(bench).select(col("doc_id").as("bench_id"),
      col("ws").as("wb"), size(col("ws")).as("nb"))
    val scored = cand.join(wa, "doc_id").join(wb, "bench_id")
      .withColumn("i", size(array_intersect(col("wa"), col("wb"))))
      .filter(col("i") >= 1)
      .withColumn("j_milli", floor(lit(1000.0) * col("i") /
        (col("na") + col("nb") - col("i"))).cast("long"))
    val agg = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bench_cands"),
        max(struct(col("j_milli").as("j"), (-col("bench_id")).as("nb"))).as("mx"))
      .select(col("doc_id"), col("n_bench_cands"),
        col("mx.j").as("best_j_milli"), (-col("mx.nb")).as("nearest_bench"))
    docs.filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bench_cands"), lit(0L)).as("n_bench_cands"),
        col("best_j_milli"), col("nearest_bench"),
        coalesce(col("best_j_milli") >= deconJaccardMilli, lit(false))
          .as("is_contaminated"))
      .orderBy("doc_id")
  }

  private def decontaminateMinhashSql =
    s"""WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w
       |  FROM documents),
       |tr AS (SELECT * FROM dw WHERE doc_id % 97 <> 0),
       |be AS (SELECT * FROM dw WHERE doc_id % 97 = 0),
       |tsh AS (SELECT DISTINCT doc_id, s AS sh
       |  FROM tr, UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)),
       |bsh AS (SELECT DISTINCT doc_id, s AS sh
       |  FROM be, UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)),
       |${DedupOps.minhashBandsSqlCteOverShingles("t")},
       |${DedupOps.minhashBandsSqlCteOverShingles("b")},
       |okb AS (SELECT band, band_sig FROM bbands GROUP BY 1, 2
       |        HAVING COUNT(*) <= ${DedupOps.maxCcBucketDefault}),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS bench_id
       |  FROM tbands x
       |  JOIN (SELECT b.* FROM bbands b JOIN okb USING (band, band_sig)) y
       |    ON x.band = y.band AND x.band_sig = y.band_sig),
       |sza AS (SELECT doc_id, COUNT(*) AS n FROM tsh GROUP BY 1),
       |szb AS (SELECT doc_id, COUNT(*) AS n FROM bsh GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_id, c.bench_id, COUNT(*) AS i
       |  FROM cand c
       |  JOIN tsh a ON a.doc_id = c.doc_id
       |  JOIN bsh b ON b.doc_id = c.bench_id AND b.sh = a.sh
       |  GROUP BY 1, 2),
       |sc AS (
       |  SELECT i.doc_id, i.bench_id,
       |    CAST(floor(1000.0 * i / (sa.n + sb.n - i)) AS BIGINT) AS j_milli
       |  FROM inter i
       |  JOIN sza sa ON sa.doc_id = i.doc_id
       |  JOIN szb sb ON sb.doc_id = i.bench_id
       |  WHERE i >= 1),
       |ag AS (
       |  SELECT doc_id, COUNT(*) AS n_bench_cands,
       |    MAX(j_milli) AS best_j_milli
       |  FROM sc GROUP BY 1),
       |nd AS (
       |  SELECT s.doc_id, MIN(s.bench_id) AS nearest_bench
       |  FROM sc s JOIN ag ON s.doc_id = ag.doc_id
       |    AND s.j_milli = ag.best_j_milli
       |  GROUP BY 1)
       |SELECT d.doc_id, COALESCE(ag.n_bench_cands, 0) AS n_bench_cands,
       |  ag.best_j_milli, nd.nearest_bench,
       |  COALESCE(ag.best_j_milli >= $deconJaccardMilli, FALSE)
       |    AS is_contaminated
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
       |LEFT JOIN ag USING (doc_id) LEFT JOIN nd USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Token-budget shard packing: assign documents to fixed-budget training
    * shards (512 whitespace tokens here) by running token offset, packing
    * greedily in doc_id order WITHIN each source — documents are never
    * split; the straddling document overflows its shard, the standard
    * "document-boundary" packing trade-off.
    *
    * Scale shape: packing is per-source (one window partition each), so
    * sources pack in parallel and the only movement is one hash partition
    * per source — a GLOBAL greedy pack would serialize the corpus through
    * one task. At 100 TB the unit is whatever the shard-group key is
    * (source, date, domain-bucket…); the plan is identical. The running
    * cumsum is exact int64 in both engines. */
  private def packTokenShards(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 512L
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard_id", floor(col("start_offset") / budget).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("start_offset"), col("shard_id"))
      .orderBy("doc_id")
  }

  private val packTokenShardsSql =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |      AS BIGINT) AS start_offset
      |  FROM toks)
      |SELECT doc_id, source, n_tokens, start_offset,
      |  CAST(floor(start_offset / 512.0) AS BIGINT) AS shard_id
      |FROM packed ORDER BY doc_id""".stripMargin

  /** Document chunking for embedding/RAG prep: split each document into
    * fixed-size token windows (64 tokens, stride 48 → 16-token overlap),
    * the standard shape feeding an embedding model whose context is
    * smaller than a document. Purely narrow — an array expression plus
    * one posexplode, no shuffle until the output sort; at 100 TB chunking
    * is embarrassingly parallel and the chunk count per doc is bounded by
    * ⌈tokens/stride⌉. Empty docs emit zero chunks. Window arithmetic is
    * identical integer logic in both engines. */
  private def chunkDocuments(s: SparkSession, dir: String): DataFrame = {
    val win = 64
    val stride = 48
    // materialize the tokenization once per row (the wordGrams contract:
    // an inline split inside the transform lambda would re-run per chunk)
    val w = col("w")
    val n = size(w)
    // sequence() throws on an empty range in ANSI mode — guard n >= 1
    val starts = when(n >= 1, sequence(lit(0), n - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    val chunks = transform(starts, st => struct(
      st.as("start"),
      least(lit(win), n - st).as("n_chunk_tokens"),
      concat_ws(" ", slice(w, st + 1, lit(win))).as("chunk_text")))
    t(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => x =!= "").as("w"))
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("c.n_chunk_tokens").cast("long").as("n_chunk_tokens"),
        col("c.chunk_text").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  private val chunkDocumentsSql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(st // 48 AS BIGINT) AS chunk_id,
      |  CAST(least(64, len(w) - st) AS BIGINT) AS n_chunk_tokens,
      |  array_to_string(list_slice(w, st + 1, st + 64), ' ') AS chunk_text
      |FROM toks, UNNEST(range(0, len(w), 48)) u(st)
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** 24-bit uniform hash of a doc id — the deterministic coin for sampling
    * decisions, built nibble-wise from the md5 hex prefix (the engine-
    * portable digit trick simhash uses; no engine-specific hex parse). */
  private[graft] def u24(id: Column): Column = {
    val h = md5(id.cast("string"))
    (0 until 6).map { i =>
      (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1)
        .cast("long") * (1L << (4 * (5 - i)))
    }.reduce((a: Column, b: Column) => a + b)
  }

  private def u24Sql(expr: String): String =
    (0 until 6).map { i =>
      s"(strpos('0123456789abcdef', substr(md5(CAST($expr AS VARCHAR)), ${i + 1}, 1)) - 1) * ${1L << (4 * (5 - i))}"
    }.mkString("(", " + ", ")")

  /** Language-balanced downsampling — the data-mixing step that keeps a
    * dominant language from drowning the rest: each language is sampled
    * down toward HALF the smallest language's count. The keep decision is
    * a pure integer inequality on a per-doc hash coin
    * (2·u24·cnt_lang < min_cnt·2²⁴ ⟺ u24/2²⁴ < min_cnt/(2·cnt_lang)),
    * so it is exact in both engines, reproducible run-to-run, and
    * embarrassingly parallel: per-language counts broadcast (languages are
    * few), the corpus itself is never shuffled — scan → filter → write at
    * 100 TB. Expected (not exact) per-language quota is the deliberate
    * trade: an exact-k quota needs a per-stratum global rank, and a window
    * over a handful of language partitions is the skew anti-pattern. */
  private def corpusBalanceLangs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val counts = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
    val minCnt = counts.agg(min(col("cnt")).as("min_cnt"))
    d.select(col("doc_id"), col("lang"), u24(col("doc_id")).as("coin"))
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(minCnt))
      .filter(lit(2) * col("coin") * col("cnt") < col("min_cnt") * lit(1L << 24))
      .select(col("doc_id"), col("lang"), col("coin"))
      .orderBy("doc_id")
  }

  private val corpusBalanceLangsSql =
    s"""WITH counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
       |m AS (SELECT MIN(cnt) AS min_cnt FROM counts),
       |coins AS (SELECT doc_id, lang, ${u24Sql("doc_id")} AS coin FROM documents)
       |SELECT doc_id, coins.lang, coin
       |FROM coins JOIN counts ON coins.lang = counts.lang CROSS JOIN m
       |WHERE 2 * coin * cnt < min_cnt * ${1L << 24}
       |ORDER BY doc_id""".stripMargin

  /** Epoch-weighted source mixing — upsampling curated sources by an
    * integer epoch factor (the Pile/LLaMA-style "epochs per subset" mix):
    * each doc is emitted `epochs` times with an epoch index, so the
    * downstream shard packer sees the mixed stream without the corpus
    * being copied at rest. Factor here derives from the source id (mod 3,
    * 1–3 epochs) as a stand-in for a curated weight table — the plan
    * shape (narrow posexplode of a repeat array, zero shuffles) is the
    * contract. */
  private def mixUpsample(s: SparkSession, dir: String): DataFrame = {
    // try_cast, not cast: ANSI mode (Spark 4 default) throws on a source
    // name outside the srcN convention — a dirty catalog must degrade to
    // the 1-epoch default, not kill the corpus build
    val epochs = coalesce(
      substring(col("source"), 4, 10).try_cast("int") % 3 + 1, lit(1))
      .as("epochs")
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"), epochs)
      .select(col("doc_id"), col("source"), col("n_chars"), col("epochs"),
        posexplode(array_repeat(lit(1), col("epochs"))).as(Seq("epoch", "one")))
      .select(col("doc_id"), col("source"), col("n_chars"), col("epochs"),
        col("epoch"))
      .orderBy("doc_id", "epoch")
  }

  private val mixUpsampleSql =
    """WITH e AS (SELECT doc_id, source, n_chars,
      |             COALESCE(TRY_CAST(substr(source, 4, 10) AS INT) % 3 + 1, 1) AS epochs
      |           FROM documents)
      |SELECT doc_id, source, n_chars, epochs, CAST(i AS INT) AS epoch
      |FROM e, UNNEST(range(epochs)) t(i)
      |ORDER BY doc_id, epoch""".stripMargin

  /** Vocabulary growth curve per source — the Heaps-law saturation audit
    * behind "is this source exhausted?": order each source's docs by
    * doc_id (the ingest proxy), cut them into 10 equal deciles, and count
    * how many DISTINCT words each decile sees for the FIRST time plus the
    * running vocabulary size. A source whose n_new_words collapses to
    * near-zero by decile 3 is saturated boilerplate (upsampling it buys
    * duplicate n-grams, not coverage); a still-climbing curve justifies
    * more epochs — the measured input to [[mixUpsample]] /
    * [[corpusBalanceLangs]] weight decisions.
    *
    * Scale shape: the heavy stage is the (source, word) → min(decile)
    * aggregate — vocabulary-sized with map-side combine, the tfidf/df
    * family shape. Doc→decile assignment is one doc-granular window per
    * source (rank by doc_id, integer ((rn−1)·10) div n — never a float
    * ntile), and the final cumsum runs over ≤ 10·|sources| rows. NULL
    * sources bucket as ''; NULL texts contribute zero words on both
    * engines. */
  private def vocabGrowthCurve(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents").select(col("doc_id"),
      coalesce(col("source"), lit("")).as("source"), col("text"))
    val wSrc = Window.partitionBy(col("source"))
    val byId = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val bucketed = docs
      .withColumn("n_src", count(lit(1)).over(wSrc))
      .withColumn("rn", row_number().over(byId))
      .withColumn("decile", expr("((rn - 1) * 10) div n_src").cast("int"))
    val firstSeen = bucketed
      // break the window's source-partitioning before the word stage: left
      // in place, Catalyst elides the (source, w) exchange (source alone
      // already co-locates every (source, w) group) and the WHOLE word
      // aggregate of a source runs in its one window partition — a
      // per-source serialization bottleneck at corpus scale. A doc-granular
      // reshuffle is cheap (docs, not words, move) and restores the tfidf
      // family shape: map-side-combined partials everywhere, then one
      // vocabulary-sized (source, w) exchange.
      .repartition(col("doc_id"))
      .select(col("source"), col("decile"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(min(col("decile")).as("first_decile"))
    firstSeen
      .groupBy(col("source"), col("first_decile").as("decile"))
      .agg(count(lit(1)).as("n_new_words"))
      .withColumn("cum_vocab", sum(col("n_new_words")).over(
        Window.partitionBy(col("source")).orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("source", "decile")
  }

  private val vocabGrowthCurveSql =
    """WITH d AS (
      |  SELECT doc_id, COALESCE(source, '') AS source, text,
      |    COUNT(*) OVER (PARTITION BY COALESCE(source, '')) AS n_src,
      |    ROW_NUMBER() OVER (PARTITION BY COALESCE(source, '')
      |                       ORDER BY doc_id) AS rn
      |  FROM documents),
      |words AS (
      |  SELECT source, CAST(((rn - 1) * 10) // n_src AS INT) AS decile, w
      |  FROM d, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) t(w)),
      |first_seen AS (
      |  SELECT source, w, MIN(decile) AS first_decile
      |  FROM words GROUP BY 1, 2),
      |curve AS (
      |  SELECT source, first_decile AS decile, COUNT(*) AS n_new_words
      |  FROM first_seen GROUP BY 1, 2)
      |SELECT source, decile, n_new_words,
      |  CAST(SUM(n_new_words) OVER (PARTITION BY source ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_vocab
      |FROM curve ORDER BY source, decile""".stripMargin

  /** Corpus composition report — the dataset-card table: per (lang,
    * source) slice, document/token/char volumes and each slice's milli
    * share of the corpus by documents and by tokens. One map-side-
    * combining hash aggregate over a codegen'd projection plus two
    * broadcast scalars; the report is slice-count-sized however big the
    * corpus — the shape you run over 100 TB to decide the mixing weights
    * [[corpusBalanceLangs]]/[[mixUpsample]] then apply. */
  private def corpusMixReport(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("lang"), col("source"),
      size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("toks"),
      length(col("text")).cast("long").as("chars"))
    val slices = d.groupBy("lang", "source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("toks")).as("n_tokens"),
      sum(col("chars")).as("n_chars_sum"))
    val totals = slices.agg(sum(col("n_docs")).as("t_docs"),
      sum(col("n_tokens")).as("t_tokens"))
    slices.crossJoin(broadcast(totals))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        col("n_chars_sum"),
        floor(lit(1000.0) * col("n_docs") / col("t_docs")).cast("long")
          .as("doc_share_milli"),
        floor(lit(1000.0) * col("n_tokens") / col("t_tokens")).cast("long")
          .as("token_share_milli"))
      .orderBy("lang", "source")
  }

  private val corpusMixReportSql =
    """WITH d AS (SELECT lang, source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS toks,
      |    CAST(length(text) AS BIGINT) AS chars
      |  FROM documents),
      |slices AS (
      |  SELECT lang, source, COUNT(*) AS n_docs,
      |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
      |    CAST(SUM(chars) AS BIGINT) AS n_chars_sum
      |  FROM d GROUP BY 1, 2),
      |t AS (SELECT SUM(n_docs) AS t_docs, SUM(n_tokens) AS t_tokens FROM slices)
      |SELECT lang, source, n_docs, n_tokens, n_chars_sum,
      |  CAST(floor(1000.0 * n_docs / t_docs) AS BIGINT) AS doc_share_milli,
      |  CAST(floor(1000.0 * n_tokens / t_tokens) AS BIGINT) AS token_share_milli
      |FROM slices CROSS JOIN t
      |ORDER BY lang, source""".stripMargin

  /** C4-style line-level corpus dedup, expressed over 8-token chunks (the
    * synthetic corpus has no newlines, so the dedup unit is a deterministic
    * token window — the plan shape is the contract): every chunk keeps only
    * its corpus-wide FIRST occurrence in (doc_id, chunk_idx) order; later
    * occurrences — including repeats inside the same document — are
    * removed, and each document is reassembled from its surviving chunks.
    * This is the cross-document counterpart of [[TextOps]]'s per-document
    * repetition filter: the C4 report removed any three-sentence span seen
    * before, corpus-wide, which is exactly this shape.
    *
    * Scale: first-occurrence selection is a map-side-combining hash
    * aggregate (min of a packed (doc_id, idx) key per chunk value), NOT a
    * row_number window partitioned by chunk — a boilerplate chunk occurring
    * a billion times would make that window partition a straggler, while
    * the aggregate folds it map-side. The join back is a shuffle equi-join
    * on chunk text (AQE skew-split absorbs hot chunks); reassembly is one
    * shuffle on doc_id with a row-local sort (chunk count is bounded by
    * document length). Documents whose every chunk was seen before still
    * appear, with n_kept = 0 and empty text. */
  /** The 8-token chunk relation (doc_id, chunk_idx, chunk) — THE single
    * chunking definition, shared by batch [[lineDedup]] and its streaming
    * twin ([[graft.streaming.StreamingPipeline.lineDedupStream]]): the two
    * must cut identical windows or first-occurrence parity is meaningless.
    * Expects (doc_id, text) columns; row-local, stream-safe. */
  def tokenChunks(docs: DataFrame, w: Int = 8): DataFrame =
    docs
      // null text ≡ empty text: the doc must still be reported, and
      // sequence()/range() over a NULL length would drop (or throw on) it
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), floor((size(col("toks")) - 1) / lit(w.toDouble))),
          i => concat_ws(" ", slice(col("toks"), (i * w + 1).cast("int"), lit(w)))))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"))

  private def lineDedup(s: SparkSession, dir: String): DataFrame = {
    val chunks = tokenChunks(t(s, dir, "documents"))
    def pos = col("doc_id") * 1000000L + col("chunk_idx")
    val firsts = chunks.groupBy("chunk").agg(min(pos).as("first_pos"))
    val kept = chunks.join(firsts, "chunk").filter(pos === col("first_pos"))
    val totals = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val re = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      // row-local ordered reassembly; tie on chunk_idx (possible only under
      // duplicate doc_ids) breaks on chunk text, mirroring the oracle's
      // ORDER BY chunk_idx, chunk
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
        x => x.getField("chunk"))).as("text_clean"))
    totals.join(re, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
      .orderBy("doc_id")
  }

  private val lineDedupSql =
    """WITH tk AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks
      |            FROM documents),
      |chunks AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
      |    array_to_string(toks[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ') AS chunk
      |  FROM tk, UNNEST(range(CAST(floor((len(toks) - 1) / 8.0) AS BIGINT) + 1)) t(i)),
      |firsts AS (SELECT chunk, MIN(doc_id*1000000 + chunk_idx) AS first_pos
      |           FROM chunks GROUP BY 1),
      |kept AS (SELECT c.doc_id, c.chunk_idx, c.chunk
      |         FROM chunks c JOIN firsts f USING (chunk)
      |         WHERE c.doc_id*1000000 + c.chunk_idx = f.first_pos),
      |tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY 1),
      |re AS (SELECT doc_id, COUNT(*) AS n_kept,
      |         string_agg(chunk, ' ' ORDER BY chunk_idx, chunk) AS text_clean
      |       FROM kept GROUP BY 1)
      |SELECT tot.doc_id, n_chunks, COALESCE(n_kept, 0) AS n_kept,
      |       COALESCE(text_clean, '') AS text_clean
      |FROM tot LEFT JOIN re USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Tokenizer-vocabulary candidates: corpus-wide token frequencies, top 50
    * by count with rank and cumulative corpus share (milli) — the first
    * artifact of a BPE/vocab build and the sanity check on any new corpus
    * (a Zipf curve that is too flat or too steep flags extraction bugs).
    *
    * Scale: explode → one map-side-combining hash aggregate (the explode is
    * corpus-token-sized, but partial aggregation collapses it to distinct
    * vocab per partition before the shuffle); the global top-50 is a
    * TakeOrderedAndProject over the aggregated vocab (never a full sort),
    * and the rank/cumulative window runs on 50 rows. The corpus total rides
    * along as a broadcast scalar. */
  private def vocabTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t(s, dir, "documents")
      .select(explode(filter(split(col("text"), " "), x => x =!= "")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val order = Seq(col("cnt").desc, col("token"))
    val top = counts.orderBy(order: _*).limit(50)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)).cast("long"))
    top.crossJoin(broadcast(total))
      .withColumn("cum_cnt", sum(col("cnt")).over(Window.orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("token"), col("cnt"), col("rank"),
        floor(lit(1000.0) * col("cum_cnt") / col("total")).as("cum_milli"))
      .orderBy("rank")
  }

  private val vocabTopkSql =
    """WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
      |                            x -> x <> '')) AS token FROM documents),
      |counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
      |top AS (SELECT token, cnt,
      |          CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
      |        FROM counts ORDER BY cnt DESC, token LIMIT 50)
      |SELECT token, cnt, rank,
      |  CAST(floor(1000.0 * CAST(SUM(cnt) OVER (ORDER BY rank) AS BIGINT) / total)
      |       AS BIGINT) AS cum_milli
      |FROM top CROSS JOIN tot ORDER BY rank""".stripMargin

  /** ExactSubstr-style duplicated-span table (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", §3.2 —
    * they dedup 50-BPE-token repeats via a suffix array; the synthetic
    * corpus' short docs use 8-word windows): for every document, the
    * MAXIMAL token spans whose every 8-token window occurs at least twice
    * corpus-wide — another document or another position in the same one
    * (self-repeats are duplicated text too, per the paper). This is the
    * span-level member of the dedup family: [[lineDedup]] removes repeated
    * fixed 8-token CHUNKS (aligned), this finds repeated REGIONS at any
    * alignment and reports their exact token extents, the input a
    * cut-the-span-out dedup pass consumes.
    *
    * Mechanics: stride-1 8-gram positions per doc; occurrence counts by
    * gram (map-side-combining hash aggregate — a boilerplate gram seen 10⁹
    * times folds before the shuffle, the same argument as line_dedup's
    * first-occurrence aggregate); grams with occ ≥ 2 join back (equi-join
    * on gram — AQE skew-split absorbs hot grams); per-doc gaps-and-islands
    * over start positions (two overlapping/adjacent duplicated windows —
    * gap ≤ 8 — merge into one span; the window partition is doc-keyed, so
    * its size is doc-length-bounded, never corpus-bounded). A suffix array
    * is the single-node data structure for this; the gram-join is its
    * shuffle-native equivalent at the fixed window width.
    *
    * Determinism on dirty corpora: islands order by (pos, gram) so
    * duplicate doc_ids (two rows sharing an id interleave their positions)
    * still give one deterministic island assignment; equal positions have
    * gap 0 ≤ 8 and always merge, so span extents are order-free. NULL/short
    * texts produce no grams and simply emit no spans. */
  private def substringDupSpans(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val grams = t(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(coalesce(col("text"), lit("")), " "), x => x =!= "")
          .as("toks"))
      .select(col("doc_id"),
        posexplode(wordGrams(col("toks"), k)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("gram"))
    val occ = grams.groupBy("gram").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
    val dup = grams.join(occ, "gram")
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("pos"), col("gram"))
    // first row of a doc: lag is NULL → condition NULL → otherwise(1) —
    // identical to the oracle's CASE (NULL test falls to ELSE 1)
    val isl = dup
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, 0L)
          .otherwise(1L))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1).cast("long")).as("span_end"),
        (max(col("pos")) + lit(k.toLong) - min(col("pos"))).as("span_tokens"),
        count(lit(1)).as("n_windows"),
        max(col("occ")).as("max_occ"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("span_tokens"), col("n_windows"), col("max_occ"))
      .orderBy("doc_id", "span_start")
  }

  private val substringDupSpansSql =
    """WITH tk AS (SELECT doc_id,
      |    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |    array_to_string(toks[CAST(i+1 AS INT):CAST(i+8 AS INT)], ' ') AS gram
      |  FROM tk, UNNEST(range(len(toks) - 7)) t(i)
      |  WHERE len(toks) >= 8),
      |occ AS (SELECT gram, COUNT(*) AS occ FROM g GROUP BY 1 HAVING COUNT(*) >= 2),
      |d AS (SELECT g.doc_id, g.pos, g.gram, occ.occ FROM g JOIN occ USING (gram)),
      |b AS (SELECT doc_id, pos, gram, occ,
      |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos, gram) <= 8
      |         THEN 0 ELSE 1 END AS brk
      |  FROM d),
      |i AS (SELECT doc_id, pos, occ,
      |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos, gram
      |                   ROWS UNBOUNDED PRECEDING) AS island
      |  FROM b)
      |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
      |  MAX(pos) + 8 - MIN(pos) AS span_tokens,
      |  COUNT(*) AS n_windows, MAX(occ) AS max_occ
      |FROM i GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin

  /** DSIR-flavored data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling"): score every document by how much
    * its vocabulary looks like a TARGET distribution (here: the corpus's
    * own `lang = 'en'` slice, the stand-in for "high-quality reference
    * corpus"), then keep the top half per source. The published method
    * weights docs by an n-gram importance ratio and resamples; this exact-
    * arithmetic variant scores affinity_milli = ⌊1000·Σ tf·cnt_target(w) /
    * Σ tf·cnt_raw(w)⌋ — occurrence-weighted mass of the doc's words inside
    * the target slice — and takes a deterministic rank-based keep decision
    * (affinity desc, doc_id tiebreak) within each source.
    *
    * NULL/empty handling pinned by the fuzz-gate classes: empty-string
    * words are filtered before counting (the tfidf contract), docs with no
    * surviving words or NULL doc_id are excluded on BOTH sides, a NULL
    * lang simply contributes 0 to the target mass, and a NULL source forms
    * its own keep-partition on both engines.
    *
    * Scale shape: token-scale work is one (doc, word) map-side-combining
    * hash aggregate; the word-stats relation is vocabulary-sized (Zipf);
    * the affinity join is word-keyed at (doc, word) grain — the tfidf_topk
    * plan family. The keep decision is one source-partitioned window over
    * doc-count-sized rows (per-source sort; a skew-heavy source set would
    * salt exactly like salted_agg). Nothing is all-pairs. */
  private def targetAffinityResample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = t(s, dir, "documents").filter(col("doc_id").isNotNull)
    val tf = d
      .select(col("doc_id"), col("lang"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("word"))
      .groupBy("doc_id", "lang", "word").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("word")
      .agg(sum("tf").as("cnt_r"),
        sum(when(col("lang") === "en", col("tf")).otherwise(0L)).as("cnt_t"))
    val aff = tf.join(stats, "word")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_words"),
        expr("1000 * sum(tf * cnt_t) div sum(tf * cnt_r)").as("affinity_milli"))
    val w = Window.partitionBy("source")
      .orderBy(col("affinity_milli").desc, col("doc_id"))
    val n = Window.partitionBy("source")
    d.select(col("doc_id"), col("source")).join(aff, "doc_id")
      .withColumn("rk", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(n))
      .select(col("doc_id"), col("source"), col("n_words"),
        col("affinity_milli"),
        (col("rk") * 2 <= col("n_src") + 1).as("keep"))
      .orderBy("doc_id")
  }

  private val targetAffinityResampleSql =
    """WITH tf AS (
      |  SELECT doc_id, lang, word, COUNT(*) AS tf FROM (
      |    SELECT doc_id, lang, w AS word
      |    FROM documents, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) t(w)
      |    WHERE doc_id IS NOT NULL)
      |  GROUP BY 1, 2, 3),
      |stats AS (
      |  SELECT word, CAST(SUM(tf) AS BIGINT) AS cnt_r,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS BIGINT) AS cnt_t
      |  FROM tf GROUP BY 1),
      |aff AS (
      |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_words,
      |    CAST(1000 * SUM(tf * cnt_t) // SUM(tf * cnt_r) AS BIGINT) AS affinity_milli
      |  FROM tf JOIN stats USING (word) GROUP BY 1),
      |ranked AS (
      |  SELECT d.doc_id, d.source, a.n_words, a.affinity_milli,
      |    row_number() OVER (PARTITION BY d.source
      |      ORDER BY a.affinity_milli DESC, d.doc_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY d.source) AS n_src
      |  FROM documents d JOIN aff a ON d.doc_id = a.doc_id)
      |SELECT doc_id, source, n_words, affinity_milli,
      |  rk * 2 <= n_src + 1 AS keep
      |FROM ranked ORDER BY doc_id""".stripMargin

  /** Temperature-scaled source sampling weights — the multilingual/multi-
    * source mixing rule (p_i^α renormalized, here α = ½) that flattens a
    * heavy-head source distribution without inverting it: dominant sources
    * sample BELOW their token share, tail sources above, ordering
    * preserved. α = ½ is chosen deliberately: p^½ = √p is ONE correctly-
    * rounded IEEE op, so the whole query stays engine-deterministic with
    * no libm pow — and the normalizer is a sum of INTEGER ⌊√n_tokens⌋
    * terms (exact, order-independent), never a float sum whose
    * accumulation order could diverge between engines.
    *
    * Output per source: token share p_milli, temperature weight t_milli,
    * and boost_milli = 1000·t/p — the upsample factor a sampler applies
    * (> 1000 ⇒ sampled above natural share).
    *
    * Scale shape: one token-count projection + a source-keyed hash-agg
    * (map-side combined), then arithmetic over |sources| rows with two
    * scalar aggregates broadcast back. Corpus is scanned once; nothing
    * wider than the source dimension ever shuffles. */
  /** Unordered temperature-weights frame (source, n_docs, n_tokens,
    * p_milli, t_milli, boost_milli) — shared by the weights report and
    * the sampler-execution audit so the target and the applied rate can
    * never drift. */
  private def tempWeightsFrame(s: SparkSession, dir: String): DataFrame =
    tempWeightsOf(t(s, dir, "documents"))

  private def tempWeightsOf(docs: DataFrame): DataFrame = {
    val bySrc = docs
      .select(coalesce(col("source"), lit("")).as("source"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .withColumn("rt", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val tot = bySrc.agg(sum(col("n_tokens")).as("tot_tokens"),
      sum(col("rt")).as("tot_rt"))
    bySrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(n_tokens * 1000) div tot_tokens").as("p_milli"),
        expr("(rt * 1000) div tot_rt").as("t_milli"))
      .withColumn("boost_milli",
        when(col("p_milli") > 0, expr("(t_milli * 1000) div p_milli")))
  }

  private def temperatureMixWeights(s: SparkSession, dir: String): DataFrame =
    tempWeightsFrame(s, dir).orderBy("source")

  /** One-row broadcastable source→boost map (the dsirModelRow /
    * knModelRow collapse) for the streaming sampler twin — built from
    * the SAME weights relation as the batch audit, NULL boosts already
    * coalesced to the neutral 1000. |sources|-sized, so it broadcasts at
    * any corpus scale. */
  def tempWeightsRow(docs: DataFrame): DataFrame =
    tempWeightsOf(docs)
      .select(col("source"),
        coalesce(col("boost_milli"), lit(1000L)).as("b"))
      .agg(map_from_entries(collect_list(struct(col("source"), col("b"))))
        .as("bm"))

  /** The bysrc → wgt CTE chain of the temperature-mix oracles. */
  private val tempWeightsSqlCtes =
    """bysrc AS (
      |  SELECT COALESCE(source, '') AS source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |rooted AS (
      |  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS rt
      |  FROM bysrc),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
      |               CAST(SUM(rt) AS BIGINT) AS tot_rt FROM rooted),
      |wgt AS (
      |  SELECT source, n_docs, n_tokens,
      |    (n_tokens * 1000) // tot_tokens AS p_milli,
      |    (rt * 1000) // tot_rt AS t_milli,
      |    CASE WHEN (n_tokens * 1000) // tot_tokens > 0
      |      THEN (((rt * 1000) // tot_rt) * 1000) // ((n_tokens * 1000) // tot_tokens)
      |    END AS boost_milli
      |  FROM rooted CROSS JOIN tot)""".stripMargin

  private val temperatureMixWeightsSql =
    s"""WITH $tempWeightsSqlCtes
       |SELECT source, n_docs, n_tokens, p_milli, t_milli, boost_milli
       |FROM wgt ORDER BY source""".stripMargin

  /** Execution audit of the temperature mix — the deterministic sampler a
    * distributed exporter actually runs to HIT [[temperatureMixWeights]]'
    * per-source rates without RNG: each doc is emitted
    * k = boost div 1000 whole copies plus one extra copy iff its md5 coin
    * ([[u24]] mod 1000) clears the fractional part — reproducible across
    * engines, retries and partitionings (the same property
    * corpus_balance_langs' coin rule and hash_sample rely on; a
    * rand()-based sampler is none of those). A NULL boost (a source with
    * a 0-milli token share) degrades to the neutral 1000 — emit once —
    * on both engines.
    *
    * Output is the achieved-vs-target audit per source: whole-copy
    * factor, fractional acceptances, emitted rows and the realized
    * exact-milli rate. Nothing materializes the emitted stream here —
    * the audit sums copy counts arithmetically (the materializing plan
    * is mix_upsample's posexplode shape applied to these factors).
    *
    * Plan: the token-scale pass lives in the shared weights frame; the
    * apply side is a doc-grain (source, coin) projection, a broadcast
    * join of the |sources|-row weights relation, and one |sources|-row
    * hash aggregate — no window, no explosion, no extra shuffle beyond
    * the final aggregate's. */
  private def temperatureSampleAudit(s: SparkSession, dir: String): DataFrame = {
    val w = tempWeightsFrame(s, dir)
      .select(col("source"), coalesce(col("boost_milli"), lit(1000L)).as("b"))
    t(s, dir, "documents")
      .select(coalesce(col("source"), lit("")).as("source"),
        u24(col("doc_id")).as("coin"))
      .join(broadcast(w), "source")
      .withColumn("k", expr("b div 1000"))
      .withColumn("extra",
        when(col("coin") % 1000L < col("b") % 1000L, 1L).otherwise(0L))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        max(col("b")).as("boost_milli"),
        sum(col("k") + col("extra")).as("n_out"),
        sum(col("extra")).as("n_frac_accepted"))
      .withColumn("achieved_milli", expr("(1000 * n_out) div n_docs"))
      .orderBy("source")
  }

  private val temperatureSampleAuditSql =
    s"""WITH $tempWeightsSqlCtes,
       |w AS (SELECT source, COALESCE(boost_milli, 1000) AS b FROM wgt),
       |c AS (SELECT COALESCE(source, '') AS source,
       |        ${u24Sql("doc_id")} AS coin
       |      FROM documents),
       |j AS (
       |  SELECT c.source, b, b // 1000 AS k,
       |    CASE WHEN coin % 1000 < b % 1000 THEN 1 ELSE 0 END AS extra
       |  FROM c JOIN w USING (source))
       |SELECT source, COUNT(*) AS n_docs, MAX(b) AS boost_milli,
       |  CAST(SUM(k + extra) AS BIGINT) AS n_out,
       |  CAST(SUM(extra) AS BIGINT) AS n_frac_accepted,
       |  (1000 * CAST(SUM(k + extra) AS BIGINT)) // COUNT(*) AS achieved_milli
       |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** Epoch-capped, quality-weighted token allocation across sources — the
    * data-constrained-scaling mixing decision (repeating data beyond ~4
    * epochs adds ≈ no value, so an allocator must CAP repetition, not just
    * weight sources): given a training budget of 2× the corpus (fixed,
    * knob-free — the token_budget_fill convention), each source s receives
    * alloc_s = min(4·tok_s, r·q_s·tok_s/10⁶), one global rate r scaled by
    * the source's quality share q_s (milli, the row-local gate) under the
    * 4-epoch cap. Completes the mixing family: mix_upsample reweights
    * WITHIN a source, token_budget_fill picks BETWEEN sources greedily,
    * temperature_mix_weights flattens shares — this adds the repetition
    * ceiling those ignore.
    *
    * The water-fill rate is solved in CLOSED FORM by rank windows — no
    * iteration, no driver loop: sort sources in cap-binding order (q desc,
    * source; the capping threshold is 4·10⁶/q), for each prefix length k
    * compute r_k = (T − Σ_{i≤k}4·tok_i)·10⁶ div Σ_{i>k}q_i·tok_i, and keep
    * the FIRST k whose rate actually caps its prefix (r_k·q_k ≥ 4·10⁶) and
    * not its successor (r_k·q_{k+1} < 4·10⁶) — integer cross-
    * multiplications, never rational comparisons, so both engines select
    * the identical k even at exact boundaries. A wsum = 0 tail (all
    * remaining sources quality-zero) allocates nothing and is valid by
    * construction; floors make Σ alloc ≤ T always (never over-commit).
    *
    * Unit contract: all int64; T·10⁶ < 2⁶³ ⇒ budgets to ~9·10¹² tokens.
    * A larger deployment rescales the unit (kilotokens) before
    * allocating — the formulas are unit-invariant.
    *
    * Scale shape: ONE corpus scan into a per-source map-side aggregate;
    * every window after runs on the |sources|-row slice relation (single-
    * partition by design — the token_budget_fill dimension-sized-window
    * pattern) and the chosen (k, r) broadcasts back as a one-row scalar. */
  private def epochAllocation(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // session-cached (lazy persist): the plan references this slice
    // relation THREE times (the allocation probe side, the candidate
    // ranks, and the k = 0 union row) — without the cache Catalyst
    // re-derives the corpus scan + quality gate per reference (the
    // bigramSurprisalFrame lesson), turning one scan into three
    val slices = cachedRelation(s, dir, "epochSlices", "") {
      t(s, dir, "documents").select(
          coalesce(col("source"), lit("")).as("source"),
          size(split(col("text"), " ")).cast("long").as("toks"),
          coalesce(TextOps.qualityKeepLocal(col("text")), lit(false)).as("ok"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          coalesce(sum(col("toks")), lit(0L)).as("tok"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_q"))
        .withColumn("q", expr("(1000 * n_q) div n_docs"))
    }
    val w = Window.orderBy(col("q").desc, col("source"))
    val ranked = slices
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cap_cum", sum(col("tok") * 4)
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("w_cum", sum(col("q") * col("tok"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t_budget", expr("2 * sum(tok) over ()"))
      .withColumn("w_tot", expr("sum(q * tok) over ()"))
      .withColumn("q_next", lead(col("q"), 1).over(w))
    val candK = ranked.select(col("k"), col("cap_cum").as("cap_tok"),
        (col("w_tot") - col("w_cum")).as("wsum"), col("q").as("q_k"),
        col("q_next"), col("t_budget"))
      .unionByName(ranked.filter(col("k") === 1).select(
        lit(0L).as("k"), lit(0L).as("cap_tok"), col("w_tot").as("wsum"),
        lit(null).cast("long").as("q_k"), col("q").as("q_next"),
        col("t_budget")))
    val chosen = candK
      .withColumn("r",
        when(col("wsum") > 0 && col("cap_tok") <= col("t_budget"),
          expr("((t_budget - cap_tok) * 1000000) div wsum")))
      .filter(
        col("cap_tok") <= col("t_budget") &&
          (col("k") === 0 ||
            (col("q_k") > 0 &&
              (col("wsum") === 0 || col("r") * col("q_k") >= 4000000L))) &&
          (col("q_next").isNull || col("wsum") === 0 ||
            col("r") * col("q_next") < 4000000L))
      .orderBy("k").limit(1)
      .select(col("k").as("k_star"), col("r").as("r_star"))
    ranked.crossJoin(broadcast(chosen)) // one-row scalar
      .withColumn("alloc_tokens",
        when(col("k") <= col("k_star"), col("tok") * 4)
          .when(col("r_star").isNotNull,
            expr("(r_star * q * tok) div 1000000"))
          .otherwise(lit(0L)))
      .select(col("source"), col("n_docs"), col("tok").as("n_tokens"),
        col("q").as("quality_milli"), col("alloc_tokens"),
        when(col("tok") > 0, expr("(1000 * alloc_tokens) div tok"))
          .otherwise(lit(0L)).as("epochs_milli"),
        (col("k") <= col("k_star")).as("capped"))
      .orderBy("source")
  }

  private val epochAllocationSql =
    s"""WITH d AS (
       |  SELECT COALESCE(source, '') AS source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
       |    COALESCE(${TextOps.qualityKeepSql}, FALSE) AS ok
       |  FROM documents),
       |slices AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(COALESCE(SUM(toks), 0) AS BIGINT) AS tok,
       |    CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_q
       |  FROM d GROUP BY 1),
       |r0 AS (SELECT *, (1000 * n_q) // n_docs AS q FROM slices),
       |ranked AS (
       |  SELECT *,
       |    CAST(ROW_NUMBER() OVER (ORDER BY q DESC, source) AS BIGINT) AS k,
       |    SUM(tok * 4) OVER (ORDER BY q DESC, source
       |      ROWS UNBOUNDED PRECEDING) AS cap_cum,
       |    SUM(q * tok) OVER (ORDER BY q DESC, source
       |      ROWS UNBOUNDED PRECEDING) AS w_cum,
       |    2 * SUM(tok) OVER () AS t_budget,
       |    SUM(q * tok) OVER () AS w_tot,
       |    LEAD(q, 1) OVER (ORDER BY q DESC, source) AS q_next
       |  FROM r0),
       |candk AS (
       |  SELECT k, cap_cum AS cap_tok, w_tot - w_cum AS wsum, q AS q_k,
       |    q_next, t_budget
       |  FROM ranked
       |  UNION ALL
       |  SELECT 0, 0, w_tot, NULL, q, t_budget FROM ranked WHERE k = 1),
       |withr AS (
       |  SELECT *, CASE WHEN wsum > 0 AND cap_tok <= t_budget
       |    THEN ((t_budget - cap_tok) * 1000000) // wsum END AS r
       |  FROM candk),
       |chosen AS (
       |  SELECT k AS k_star, r AS r_star FROM withr
       |  WHERE cap_tok <= t_budget
       |    AND (k = 0 OR (q_k > 0 AND (wsum = 0 OR r * q_k >= 4000000)))
       |    AND (q_next IS NULL OR wsum = 0 OR r * q_next < 4000000)
       |  ORDER BY k LIMIT 1),
       |alloc AS (
       |  SELECT source, n_docs, tok, q, k, k_star,
       |    CASE WHEN k <= k_star THEN tok * 4
       |         WHEN r_star IS NOT NULL THEN (r_star * q * tok) // 1000000
       |         ELSE 0 END AS alloc_tokens
       |  FROM ranked CROSS JOIN chosen)
       |SELECT source, n_docs, tok AS n_tokens, q AS quality_milli,
       |  CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
       |  CAST(CASE WHEN tok > 0 THEN (1000 * alloc_tokens) // tok
       |       ELSE 0 END AS BIGINT) AS epochs_milli,
       |  k <= k_star AS capped
       |FROM alloc ORDER BY source""".stripMargin

  /** Per-document n-gram novelty — what fraction of a doc's distinct word
    * trigrams appear here FIRST (no earlier doc_id contains them)?  The
    * redundancy signal behind "is the tail of this source new content or
    * re-paste?": a novelty collapse along ingest order marks a source
    * whose marginal docs add token count but no new n-gram coverage
    * (the doc-granular companion to [[vocabGrowthCurve]]'s per-source
    * decile view).
    *
    * Scale shape: the heavy stage is gram → min(doc_id), vocabulary-sized
    * with map-side combine (the df family); the join back to grams is
    * keyed on the gram and fans out 1:1. Docs with < 3 words have no
    * grams and are emitted with zeros (never divided — the milli ratio is
    * guarded, ANSI-safe). */
  private def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(array_distinct(wordGrams(col("w"), 3))).as("g"))
    val firstDoc = g.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    val perDoc = g.join(firstDoc, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
    t(s, dir, "documents").select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_milli",
        when(col("n_grams") > 0, expr("(n_novel * 1000) div n_grams"))
          .otherwise(lit(0L)))
      .orderBy("doc_id")
  }

  private val ngramNoveltySql =
    """WITH d AS (SELECT doc_id, string_split(text,' ') w FROM documents),
      |g AS (SELECT DISTINCT doc_id, s AS g
      |      FROM d, UNNEST(list_transform(range(greatest(len(w)-2, 0)),
      |        i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)),
      |fd AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY 1),
      |per AS (
      |  SELECT g.doc_id, COUNT(*) AS n_grams,
      |    CAST(SUM(CASE WHEN fd.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      |  FROM g JOIN fd USING (g) GROUP BY 1)
      |SELECT d2.doc_id, COALESCE(p.n_grams, 0) AS n_grams,
      |  COALESCE(p.n_novel, 0) AS n_novel,
      |  CASE WHEN COALESCE(p.n_grams, 0) > 0
      |    THEN (p.n_novel * 1000) // p.n_grams ELSE 0 END AS novelty_milli
      |FROM (SELECT doc_id FROM documents) d2
      |LEFT JOIN per p ON d2.doc_id = p.doc_id
      |ORDER BY d2.doc_id""".stripMargin

  /** Per-source lexical diversity — the "is this source repetitive
    * boilerplate?" companion to [[temperatureMixWeights]] (that query
    * reweights by VOLUME; this one says whether the volume carries
    * variety): per source, token count, distinct-word count, type-token
    * ratio in milli, and the word-distribution entropy in bin-length
    * surprisal units — H = Σ cnt·1000·(⌊log₂N⌋−⌊log₂cnt⌋) div N, the
    * libm-free log₂ of the word_bigram_surprisal family, exact integers
    * end to end. A near-zero entropy source repeats a handful of words
    * regardless of its token share; temperature weights alone would
    * upsample it.
    *
    * Scale shape: one token-scale (source, word) map-side-combined agg;
    * the entropy aggregate runs over the vocabulary-sized count relation
    * with its per-source total attached by ONE window that reuses the
    * same source partitioning. */
  private def sourceEntropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnts = t(s, dir, "documents")
      .select(coalesce(col("source"), lit("")).as("source"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("source"))))
    cnts.groupBy(col("source"))
      .agg(max(col("n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(expr("cnt * 1000 * (length(bin(n)) - length(bin(cnt)))"))
          .as("h_raw"))
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        expr("(n_distinct * 1000) div n_tokens").as("ttr_milli"),
        expr("h_raw div n_tokens").as("entropy_milli"))
      .orderBy("source")
  }

  private val sourceEntropySql =
    """WITH w AS (
      |  SELECT COALESCE(source, '') AS source, t.w AS word
      |  FROM documents,
      |    UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) t(w)),
      |cnts AS (
      |  SELECT source, word, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
      |withn AS (
      |  SELECT *, CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
      |  FROM cnts)
      |SELECT source,
      |  CAST(MAX(n) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_distinct,
      |  (COUNT(*) * 1000) // MAX(n) AS ttr_milli,
      |  CAST(SUM(cnt * 1000 * (length(bin(n)) - length(bin(cnt)))) AS BIGINT)
      |    // MAX(n) AS entropy_milli
      |FROM withn GROUP BY source ORDER BY source""".stripMargin

  /** Padding-waste policy report at context length 512 (the
    * `pack_token_shards` budget): per source, the contexts and wasted
    * pad tokens under the two standard packing policies — PAD-PER-DOC
    * (each doc rounds up to its own ⌈len/L⌉ contexts; the fine-tuning
    * default, Krell et al. 2022 measure up to ~50% waste on short-doc
    * corpora) vs CROSS-DOC CONCAT (the GPT-pretraining default: one
    * running token stream per source, waste only in the final partial
    * context). The per-mille waste gap is the decision signal for
    * whether a corpus needs the packed/attention-mask path at all.
    *
    * Exact integers throughout (⌈x/L⌉ = (x+L−1) div L; per-mille via
    * div); zero-token docs occupy zero contexts under both policies; a
    * source with no tokens reports NULL waste rates via explicit
    * guards. One scan, row-local token counts, a |sources|-row
    * aggregate — nothing shuffles but the final groupBy. */
  private def packPaddingReport(s: SparkSession, dir: String): DataFrame = {
    val L = 512L
    t(s, dir, "documents")
      .select(coalesce(col("source"), lit("")).as("source"),
        size(filter(split(coalesce(col("text"), lit("")), " "),
          x => x =!= "")).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        sum(expr(s"(n + ${L - 1}) div $L")).as("ctx_padded"))
      .withColumn("ctx_packed", expr(s"(n_tokens + ${L - 1}) div $L"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("ctx_padded"),
        (col("ctx_padded") * L - col("n_tokens")).as("waste_padded"),
        when(col("ctx_padded") > 0,
          expr(s"(1000 * (ctx_padded * $L - n_tokens)) div (ctx_padded * $L)"))
          .as("waste_padded_milli"),
        col("ctx_packed"),
        (col("ctx_packed") * L - col("n_tokens")).as("waste_packed"),
        when(col("ctx_packed") > 0,
          expr(s"(1000 * (ctx_packed * $L - n_tokens)) div (ctx_packed * $L)"))
          .as("waste_packed_milli"))
      .orderBy("source")
  }

  /** The context-length grid of the packing sweep (brackets the deployed
    * 512 of [[packPaddingReport]]). */
  val packLenGrid: Seq[Long] = Seq(512L, 2048L, 8192L)

  /** Context-length sweep for the packing decision — the other axis of
    * [[packPaddingReport]]: that query fixes L = 512 and varies the
    * policy; this one varies L over [[packLenGrid]] (the
    * semdedup_eps_sweep / minhash_band_sweep grid contract) and reports,
    * per candidate length, the corpus-wide cost of all three deployment
    * policies — PAD-PER-DOC contexts and waste (grows with L: short docs
    * waste almost the whole window at 8k), CROSS-DOC CONCAT contexts and
    * waste (≈ L-independent, the packing literature's point), and
    * TRUNCATE-AT-L losses (docs cut and the exact-milli share of corpus
    * tokens lost — shrinks with L). Reading the three columns against
    * each other is how a run picks its context length before committing
    * compute.
    *
    * Plan: one token-count projection (doc-grain), exploded ×|grid|,
    * one |grid|-row hash aggregate; every per-L figure is exact integer
    * arithmetic on (n, l) so the grid explode adds 3 small rows per doc,
    * never a second corpus scan. */
  private def packLengthSweep(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(size(filter(split(coalesce(col("text"), lit("")), " "),
        x => x =!= "")).cast("long").as("n"))
      .withColumn("l", explode(array(packLenGrid.map(lit): _*)))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        sum(expr("(n + l - 1) div l")).as("ctx_padded"),
        sum(when(col("n") > col("l"), 1L).otherwise(0L))
          .as("n_docs_truncated"),
        sum(when(col("n") > col("l"), col("n") - col("l")).otherwise(0L))
          .as("tokens_truncated"))
      .withColumn("ctx_packed", expr("(n_tokens + l - 1) div l"))
      .select(col("l").as("ctx_len"), col("n_docs"), col("n_tokens"),
        col("ctx_padded"),
        when(col("ctx_padded") > 0,
          expr("(1000 * (ctx_padded * l - n_tokens)) div (ctx_padded * l)"))
          .as("waste_padded_milli"),
        col("ctx_packed"),
        when(col("ctx_packed") > 0,
          expr("(1000 * (ctx_packed * l - n_tokens)) div (ctx_packed * l)"))
          .as("waste_packed_milli"),
        col("n_docs_truncated"),
        when(col("n_tokens") > 0,
          expr("(1000 * tokens_truncated) div n_tokens"))
          .as("tokens_trunc_milli"))
      .orderBy("ctx_len")

  private val packLengthSweepSql =
    s"""WITH toks AS (
       |  SELECT CAST(len(list_filter(string_split(COALESCE(text, ''), ' '),
       |    x -> x <> '')) AS BIGINT) AS n
       |  FROM documents),
       |g AS (SELECT n, CAST(l AS BIGINT) AS l
       |      FROM toks, UNNEST([${packLenGrid.mkString(", ")}]) t(l)),
       |agg AS (
       |  SELECT l, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
       |    CAST(SUM((n + l - 1) // l) AS BIGINT) AS ctx_padded,
       |    CAST(SUM(CASE WHEN n > l THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_docs_truncated,
       |    CAST(SUM(CASE WHEN n > l THEN n - l ELSE 0 END) AS BIGINT)
       |      AS tokens_truncated
       |  FROM g GROUP BY l)
       |SELECT l AS ctx_len, n_docs, n_tokens, ctx_padded,
       |  CASE WHEN ctx_padded > 0 THEN
       |    (1000 * (ctx_padded * l - n_tokens)) // (ctx_padded * l)
       |  END AS waste_padded_milli,
       |  (n_tokens + l - 1) // l AS ctx_packed,
       |  CASE WHEN n_tokens > 0 THEN
       |    (1000 * (((n_tokens + l - 1) // l) * l - n_tokens))
       |      // (((n_tokens + l - 1) // l) * l)
       |  END AS waste_packed_milli,
       |  n_docs_truncated,
       |  CASE WHEN n_tokens > 0 THEN (1000 * tokens_truncated) // n_tokens
       |  END AS tokens_trunc_milli
       |FROM agg ORDER BY ctx_len""".stripMargin

  private val packPaddingReportSql =
    """WITH toks AS (
      |  SELECT COALESCE(source, '') AS source,
      |    CAST(len(list_filter(string_split(COALESCE(text, ''), ' '),
      |      x -> x <> '')) AS BIGINT) AS n
      |  FROM documents),
      |agg AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n) AS BIGINT) AS n_tokens,
      |    CAST(SUM((n + 511) // 512) AS BIGINT) AS ctx_padded
      |  FROM toks GROUP BY 1)
      |SELECT source, n_docs, n_tokens, ctx_padded,
      |  ctx_padded * 512 - n_tokens AS waste_padded,
      |  CASE WHEN ctx_padded > 0 THEN
      |    (1000 * (ctx_padded * 512 - n_tokens)) // (ctx_padded * 512)
      |  END AS waste_padded_milli,
      |  (n_tokens + 511) // 512 AS ctx_packed,
      |  ((n_tokens + 511) // 512) * 512 - n_tokens AS waste_packed,
      |  CASE WHEN n_tokens > 0 THEN
      |    (1000 * (((n_tokens + 511) // 512) * 512 - n_tokens))
      |      // (((n_tokens + 511) // 512) * 512)
      |  END AS waste_packed_milli
      |FROM agg ORDER BY source""".stripMargin

  /** Width grid of the bloom FPR sweep (log₂ bits). Deliberately BELOW
    * the deployed 2^[[bloomLog2BitsDefault]]: the sweep exists to make
    * false positives measurable (at the deployed width the expected FPR
    * on this corpus is ~1e-8 — every grid row would read 0 and teach
    * nothing); the deployed width sits two doublings past the last
    * measured point on the same (kn/m)^k curve the sweep traces. */
  val bloomSweepGrid: Seq[Int] = Seq(10, 12, 14)

  /** The sweep grid, session-overridable via `graft.bloom.sweepGrid`
    * (comma-joined log₂ widths) — the ivfCentroids pattern: the DEFAULT
    * grid makes false positives measurable on the sf corpora, but a
    * heavy-tailed scale corpus (ScaleGen --heaps at 100× carries ~6M
    * distinct train grams) saturates every default width to occupancy
    * 1000‰ / FPR 10⁶, which is a true reading of "all widths too small"
    * and teaches nothing; a ScaleCheck run passes a grid sized to its
    * corpus (kn/m around 1) to measure the DISCRIMINATIVE regime at
    * scale. ENGINE SIDE ONLY: the DuckDB oracle interpolates the
    * default, so Verify refuses oracle replay under an override. */
  def bloomSweepGridFor(s: SparkSession): Seq[Int] =
    s.conf.getOption("graft.bloom.sweepGrid") match {
      case None => bloomSweepGrid
      case Some(raw) =>
        val g = raw.split(",").toSeq.map(_.trim.toInt)
        require(g.nonEmpty && g.forall(b => b >= 6 && b <= 62),
          s"graft.bloom.sweepGrid=$raw out of range [6, 62]")
        g
    }

  /** Bloom false-positive-rate calibration sweep — the sizing audit for
    * the [[decontaminateBloom]] gate (the cms_width_sweep contract on
    * the membership filter): per width m ∈ 2^[[bloomSweepGrid]], insert
    * the bench gram set, probe every train-ONLY gram (ground truth
    * known exactly: none belong), and report the measured FPR beside
    * the closed-form bound. Emitted per row: occupancy (set bits/m),
    * measured fpr_micro, the (kn/m)^k upper bound in micro via a nested
    * integer-division ladder with a least(10^6, ·) cap on EVERY stage
    * (overflow-free at any corpus size and libm-free; the per-stage cap
    * is exact because a stage grows only when kn ≥ m, where the true
    * bound already exceeds 10^6 — it dominates 1−e^(−kn/m) so it bounds
    * the expected FPR), and the
    * defining NO-FALSE-NEGATIVE theorem (`no_fn`: every inserted bench
    * gram still probes positive) hash-pinned per width.
    *
    * Two deliberate deltas from the gate itself, both auditability
    * choices: positions here are md5-derived (the sketch-tier portable
    * hash — the gate's xxhash64 has no cross-engine twin, and FPR
    * statistics are hash-agnostic for any uniform family), and the
    * bitmap is RELATIONAL (an occupied-position set probed by
    * semi-join) rather than a broadcast dense array — same verdicts,
    * grid-as-data over one position relation, and a trivially equal
    * oracle. The gate keeps the O(1) dense-array probe; the sweep
    * measures what its width buys.
    *
    * Scale shape: gram sets build once (session-cached); positions are
    * |grams|·k·|grid| narrow rows; everything aggregates with map-side
    * combine on (m, pos)/(m, g). Grid rows survive empty corpora (LEFT
    * join from the grid). */
  private def bloomFprSweep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val g = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(array_distinct(wordGrams(col("w"), 3))).as("g"))
    val bench = Util.cachedRelation(s, dir, "bloomSweepBench", "")(
      g.filter(col("doc_id") % 97 === 0).select(col("g")).distinct())
    val tOnly = Util.cachedRelation(s, dir, "bloomSweepTrainOnly", "")(
      g.filter(col("doc_id") % 97 =!= 0).select(col("g")).distinct()
        .join(bench, Seq("g"), "left_anti"))
    val grid = s.createDataFrame(bloomSweepGridFor(s).map(b =>
      Tuple2(b.toLong, 1L << b))).toDF("log2m", "m")
    def positions(grams: DataFrame): DataFrame = grams.crossJoin(grid)
      .select(col("g"), col("log2m"), col("m"),
        explode(sequence(lit(0), lit(3))).as("h"))
      .withColumn("pos",
        conv(substring(md5(concat(lit("bf"), col("h"), lit(":"), col("g"))),
          1, 8), 16, 10).cast("long") % col("m"))
    val occ = positions(bench).select(col("log2m"), col("pos")).distinct()
    val nSet = occ.groupBy(col("log2m")).agg(count(lit(1)).as("n_set_bits"))
    def allHit(grams: DataFrame): DataFrame =
      positions(grams).join(occ, Seq("log2m", "pos"), "left_semi")
        .groupBy(col("log2m"), col("g")).agg(count(lit(1)).as("nm"))
        .filter(col("nm") === 4)
        .groupBy(col("log2m")).agg(count(lit(1)).as("n_hit"))
    val fp = allHit(tOnly).withColumnRenamed("n_hit", "n_fp")
    val bHit = allHit(bench).withColumnRenamed("n_hit", "n_bench_hit")
    val nBench = bench.agg(count(lit(1)).as("n_bench"))
    val nProbe = tOnly.agg(count(lit(1)).as("n_probes"))
    grid.join(nSet, Seq("log2m"), "left")
      .join(fp, Seq("log2m"), "left")
      .join(bHit, Seq("log2m"), "left")
      .crossJoin(broadcast(nBench)).crossJoin(broadcast(nProbe))
      .select(col("log2m"), col("m"), col("n_bench"),
        coalesce(col("n_set_bits"), lit(0L)).as("n_set_bits"),
        expr("(1000 * coalesce(n_set_bits, 0)) div m")
          .as("occupancy_milli"),
        col("n_probes"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        expr("CASE WHEN n_probes > 0 THEN " +
          "(1000000 * coalesce(n_fp, 0)) div n_probes ELSE 0 END")
          .as("fpr_micro"),
        // (kn/m)^k in micro via a PER-STAGE-capped integer ladder:
        // b_{i+1} = least(10^6, b_i·kn div m), b_0 = 10^6. The cap is
        // exact, not an approximation: a stage grows only when kn ≥ m,
        // where the true bound is already ≥ 10^6 (and integer div keeps
        // b_i·kn div m ≥ b_i there, so once capped it stays capped);
        // when kn < m no cap ever binds and the ladder equals the
        // uncapped one. Capping each stage keeps every intermediate
        // product ≤ 10^6·4·n_bench — no int64 overflow at any corpus
        // size below ~2.3e12 bench grams (the uncapped ladder overflowed
        // once kn/m > 1 at n_bench ≈ 3e5, m = 2^10).
        expr("least(1000000, (least(1000000, (least(1000000, " +
          "(least(1000000, (1000000 * (4 * n_bench)) div m) " +
          "* (4 * n_bench)) div m) * (4 * n_bench)) div m) " +
          "* (4 * n_bench)) div m)").as("bound_micro"),
        (coalesce(col("n_bench_hit"), lit(0L)) === col("n_bench"))
          .as("no_fn"))
      .orderBy("log2m")
  }

  private val bloomFprSweepSql = {
    val gridSql = bloomSweepGrid.map(b =>
      s"SELECT CAST($b AS BIGINT) AS log2m, CAST(${1L << b} AS BIGINT) AS m")
      .mkString(" UNION ALL ")
    s"""WITH gset AS (
       |  SELECT doc_id, s AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
       |  UNNEST(list_distinct(list_transform(range(greatest(len(w) - 2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) t(s)),
       |bench AS (SELECT DISTINCT g FROM gset WHERE doc_id % 97 = 0),
       |tonly AS (
       |  SELECT DISTINCT g FROM gset WHERE doc_id % 97 <> 0
       |  EXCEPT SELECT g FROM bench),
       |grid AS ($gridSql),
       |bpos AS (
       |  SELECT b.g, gr.log2m, gr.m, h,
       |    CAST('0x' || substr(md5('bf' || h || ':' || b.g), 1, 8) AS BIGINT)
       |      % gr.m AS pos
       |  FROM bench b CROSS JOIN grid gr, UNNEST(range(4)) u(h)),
       |tpos AS (
       |  SELECT t.g, gr.log2m, gr.m, h,
       |    CAST('0x' || substr(md5('bf' || h || ':' || t.g), 1, 8) AS BIGINT)
       |      % gr.m AS pos
       |  FROM tonly t CROSS JOIN grid gr, UNNEST(range(4)) u(h)),
       |occ AS (SELECT DISTINCT log2m, pos FROM bpos),
       |nset AS (SELECT log2m, CAST(COUNT(*) AS BIGINT) AS n_set_bits
       |         FROM occ GROUP BY 1),
       |fp AS (
       |  SELECT log2m, CAST(COUNT(*) AS BIGINT) AS n_fp FROM (
       |    SELECT p.log2m, p.g FROM tpos p SEMI JOIN occ o
       |      ON p.log2m = o.log2m AND p.pos = o.pos
       |    GROUP BY 1, 2 HAVING COUNT(*) = 4)
       |  GROUP BY 1),
       |bhit AS (
       |  SELECT log2m, CAST(COUNT(*) AS BIGINT) AS n_bench_hit FROM (
       |    SELECT p.log2m, p.g FROM bpos p SEMI JOIN occ o
       |      ON p.log2m = o.log2m AND p.pos = o.pos
       |    GROUP BY 1, 2 HAVING COUNT(*) = 4)
       |  GROUP BY 1),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bench FROM bench),
       |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes FROM tonly)
       |SELECT gr.log2m, gr.m, n_bench,
       |  COALESCE(n_set_bits, 0) AS n_set_bits,
       |  (1000 * COALESCE(n_set_bits, 0)) // gr.m AS occupancy_milli,
       |  n_probes,
       |  COALESCE(n_fp, 0) AS n_fp,
       |  CASE WHEN n_probes > 0 THEN
       |    (1000000 * COALESCE(n_fp, 0)) // n_probes ELSE 0 END AS fpr_micro,
       |  least(1000000, (least(1000000, (least(1000000,
       |    (least(1000000, (1000000 * (4 * n_bench)) // gr.m)
       |    * (4 * n_bench)) // gr.m) * (4 * n_bench)) // gr.m)
       |    * (4 * n_bench)) // gr.m) AS bound_micro,
       |  COALESCE(n_bench_hit, 0) = n_bench AS no_fn
       |FROM grid gr
       |LEFT JOIN nset USING (log2m)
       |LEFT JOIN fp USING (log2m)
       |LEFT JOIN bhit USING (log2m)
       |CROSS JOIN nb CROSS JOIN np
       |ORDER BY gr.log2m""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("bloom_fpr_sweep", bloomFprSweep, Some(bloomFprSweepSql)),
    Q("pack_padding_report", packPaddingReport, Some(packPaddingReportSql)),
    Q("pack_length_sweep", packLengthSweep, Some(packLengthSweepSql)),
    Q("source_entropy", sourceEntropy, Some(sourceEntropySql)),
    Q("temperature_mix_weights", temperatureMixWeights,
      Some(temperatureMixWeightsSql)),
    Q("temperature_sample_audit", temperatureSampleAudit,
      Some(temperatureSampleAuditSql)),
    Q("ngram_novelty", ngramNovelty, Some(ngramNoveltySql)),
    Q("target_affinity_resample", targetAffinityResample,
      Some(targetAffinityResampleSql)),
    Q("line_dedup", lineDedup, Some(lineDedupSql)),
    Q("substring_dup_spans", substringDupSpans, Some(substringDupSpansSql)),
    Q("vocab_topk", vocabTopk, Some(vocabTopkSql)),
    Q("decontaminate_ngrams", decontaminateNgrams, Some(decontaminateNgramsSql)),
    // exact SQL as the oracle on purpose: the bloom is a prefilter whose
    // false positives the verify join removes, so outputs must be identical
    Q("decontaminate_bloom", decontaminateBloom, Some(decontaminateNgramsSql)),
    Q("decontaminate_minhash", decontaminateMinhash,
      Some(decontaminateMinhashSql)),
    Q("pack_token_shards", packTokenShards, Some(packTokenShardsSql)),
    Q("chunk_documents", chunkDocuments, Some(chunkDocumentsSql)),
    Q("corpus_balance_langs", corpusBalanceLangs, Some(corpusBalanceLangsSql)),
    Q("mix_upsample", mixUpsample, Some(mixUpsampleSql)),
    Q("corpus_mix_report", corpusMixReport, Some(corpusMixReportSql)),
    Q("vocab_growth_curve", vocabGrowthCurve, Some(vocabGrowthCurveSql)),
    Q("epoch_allocation", epochAllocation, Some(epochAllocationSql)))
}
