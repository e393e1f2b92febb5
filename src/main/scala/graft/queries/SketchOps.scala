package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Util._

/** Mergeable-summary operators — the sketch tier a 100 TB pipeline runs
  * where exact global state is unaffordable or must compose across
  * shards/streams: Count-Min frequency estimation (Cormode & Muthukrishnan
  * 2005), KMV/bottom-k distinct counting (Bar-Yossef et al. 2002 — the
  * theta-sketch core), HyperLogLog registers (Flajolet et al. 2007), AMS
  * tug-of-war second moments (Alon–Matias–Szegedy 1996), and
  * Duffield–Lund–Thorup priority sampling (Duffield et al. 2007) for
  * weighted subset-sum estimation — each with a width/size calibration
  * sweep where that is the deployment's memory knob. Complements the
  * existing sketch surface (`approx_sketches` = engine HLL++/quantile
  * contracts, `heavy_hitters_sketch` = Misra–Gries): these are hand-rolled
  * from the published constructions so their MERGE/linearity laws are
  * first-class, audited facts rather than engine internals.
  *
  * House determinism contract: engine-portable md5 hashing
  * (`conv(substring(md5(x), 1, 8), 16, 10)` ↔ DuckDB
  * `CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)`), exact integer
  * arithmetic only (every estimate is an integer division of int64s),
  * explicit ORDER BY on a unique key. The audited universe throughout is
  * the word-TRIGRAM stream of the documents table — the same shingle
  * universe as the dedup/decontamination tiers, and (unlike the corpus's
  * 31-word unigram vocabulary) large enough that the sketches actually
  * approximate. */
object SketchOps {

  /** Count-Min depth (independent hash rows). */
  val cmsDepth = 4
  /** Count-Min width (buckets per row). 256 on a ~16k-distinct-gram
    * verify corpus makes collisions — hence visible overestimates —
    * certain, which is what an audit wants; a deployment sizes
    * w = ⌈e/ε⌉ for additive error εN. */
  val cmsWidth = 256L
  /** Keys audited against their exact counts. */
  val cmsTopK = 20

  /** u32 md5 bucket of a gram under seed row `i` (the md5-nibble idiom —
    * seed-prefixed so rows are independent). */
  private def cmsBucket(i: Int, g: Column): Column =
    conv(substring(md5(concat(lit(s"$i:"), g)), 1, 8), 16, 10)
      .cast("long") % cmsWidth
  private def cmsBucketSql(i: Int, g: String): String =
    s"CAST('0x' || substr(md5('$i:' || $g), 1, 8) AS BIGINT) % $cmsWidth"

  /** Corpus gram-count relation (g, cnt) — registry-cached: every
    * frequency-sketch audit derives from counts, and |vocabulary| ≪
    * occurrences (the bpe_pair_stats lesson), so the token-scale explode
    * runs ONCE per session and the counter/estimate/top-k stages all run
    * vocabulary-sized. The sketch-build math is unchanged: a counter
    * over occurrences equals the cnt-weighted sum over distinct grams. */
  private def gramCounts(s: SparkSession, dir: String): DataFrame =
    Util.cachedRelation(s, dir, "sketchGramCounts", "")(
      gramCountsBySrc(s, dir).groupBy(col("g")).agg(sum(col("cnt")).as("cnt")))

  /** Per-source gram counts (source, g, cnt) — the finer grain the AMS
    * merge-law audit needs; the corpus-level [[gramCounts]] derives from
    * it, so the session pays ONE token-scale aggregate for the whole
    * sketch family. The occurrence projection is [[gramOccBySrc]]
    * itself — counts ARE that relation grouped — so the batch and the
    * streaming twin share the rule by construction, not by parity. */
  private[queries] def gramCountsBySrc(s: SparkSession, dir: String): DataFrame =
    Util.cachedRelation(s, dir, "sketchGramCountsBySrc", "")(
      gramOccBySrc(t(s, dir, "documents"))
        .groupBy(col("source"), col("g")).agg(count(lit(1)).as("cnt")))

  /** (row, bucket) CMS cell keys of a doc frame's trigram occurrences —
    * the STREAMING twin's projection
    * ([[graft.streaming.StreamingPipeline.cmsCellStream]]; a stream
    * cannot pre-aggregate to counts). The batch build aggregates the
    * cached count relation instead, but through the SAME [[cmsBucket]]
    * seed-hash — the one copy whose drift would silently break
    * counter additivity (the bloomPositions discipline). */
  def cmsCellKeys(docs: DataFrame): DataFrame =
    docs.select(split(col("text"), " ").as("w"))
      .select(explode(CorpusOps.wordGrams(col("w"), 3)).as("g"))
      .select(explode(array((0 until cmsDepth).map(i =>
        struct(lit(i).as("row"), cmsBucket(i, col("g")).as("bucket"))): _*))
        .as("c"))
      .select(col("c.row").as("row"), col("c.bucket").as("bucket"))

  /** Per-occurrence trigram projection of a doc frame — the zipf drift
    * monitor's input grain
    * ([[graft.streaming.StreamingPipeline.zipfDriftStream]]); ONE copy of
    * the gram rule with the batch [[gramCounts]] pipeline, so the
    * stream's counts and the batch audit's counts cannot drift. */
  def gramOccKeyed(docs: DataFrame): DataFrame =
    docs.select(split(col("text"), " ").as("w"))
      .select(explode(CorpusOps.wordGrams(col("w"), 3)).as("g"))

  /** Per-occurrence (source, trigram) projection of a doc frame — the TV
    * drift monitor's input grain
    * ([[graft.streaming.StreamingPipeline.tvDriftStream]]); ONE copy of
    * the source-coalesce + gram rule with the batch [[gramCountsBySrc]],
    * so the stream's per-source counts and `source_tv_drift`'s cannot
    * drift. */
  def gramOccBySrc(docs: DataFrame): DataFrame =
    docs.select(coalesce(col("source"), lit("")).as("source"),
      split(col("text"), " ").as("w"))
      .select(col("source"), explode(CorpusOps.wordGrams(col("w"), 3)).as("g"))

  /** JVM twin of `CurationOps.lg` — the integer milli-log₂
    * (1000·(bits−1) + 1000·c/2^(bits−1) − 1000, truncating division,
    * c ≥ 1). Positive operands only, so it matches both engines' SQL
    * exactly; the streaming drift monitor computes it row-locally in
    * state where Column expressions cannot reach. */
  def lgJvm(c: Long): Long = {
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(c)
    1000L * (bits - 1) + (1000L * c) / (1L << (bits - 1)) - 1000L
  }

  /** JVM twin of [[Util.olsSlope]]/olsIntercept/olsR2 over the integer
    * moment sums — the SAME cast-each-operand-then-multiply order as the
    * SQL, so the IEEE doubles are bit-identical to the batch audit's
    * (correctly-rounded primitives on identical inputs). */
  def olsJvm(n: Long, sx: Long, sy: Long, sxx: Long, sxy: Long, syy: Long)
      : (Option[Double], Option[Double], Option[Double]) = {
    val det = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val detY = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
    (if (det > 0) Some(num / det) else None,
      if (det > 0) Some((sy.toDouble - (num / det) * sx.toDouble) / n.toDouble)
      else None,
      if (det > 0 && detY > 0) Some((num * num) / (det * detY)) else None)
  }

  /** (source, gram, hash) distinct-universe projection of a doc frame —
    * the KMV sketch's input grain, shared by the batch audits and the
    * streaming bottom-k twin
    * ([[graft.streaming.StreamingPipeline.kmvSketchStream]]). NOTE the
    * streaming side must NOT pre-distinct (a blocking op on a stream);
    * the bottom-k state merge is idempotent in duplicates, which is why
    * sharing the HASH math (not the distinct) is what the parity
    * contract needs. */
  def kmvKeyed(docs: DataFrame): DataFrame =
    docs.select(coalesce(col("source"), lit("")).as("source"),
        split(col("text"), " ").as("w"))
      .select(col("source"), explode(CorpusOps.wordGrams(col("w"), 3)).as("g"))
      .withColumn("h", kmvHash(col("g")))

  /** SQL-side trigram OCCURRENCE stream (the oracles aggregate from
    * occurrences directly; the Spark side aggregates once into the
    * cached count relations above — same math, one token-scale pass). */
  private val gramStreamSql =
    """gs AS (
      |  SELECT s AS g
      |  FROM (SELECT string_split(text, ' ') AS w FROM documents) d,
      |  UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
      |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s))""".stripMargin

  /** Count-Min sketch audit: build a [[cmsDepth]]×[[cmsWidth]] counter
    * table over the corpus trigram stream, then audit the exact
    * top-[[cmsTopK]] grams against their sketch estimates
    * (est = min over rows of the gram's bucket counter). The one-sided
    * error law — CMS NEVER underestimates — is emitted per row
    * (`ok = est ≥ exact`), so the driver's hash compare pins the sketch's
    * defining theorem cross-engine, and `over = est − exact` IS the
    * measured collision noise the ε·N bound caps.
    *
    * Scale shape: the build is ONE map-side-combining hash aggregate to
    * d·w = 1024 rows no matter the corpus (each gram occurrence explodes
    * to d (row, bucket) cells — token-scale map work, constant-size
    * reduce); counters are sums, so shards/streams merge by addition —
    * the reason CMS is the standard distributed frequency sketch. The
    * audit side joins the k exact keys against the constant-size counter
    * relation (broadcast). The exact top-k (the audit's ground truth) is
    * the only token-keyed aggregate, and it is what any corpus already
    * computes as `vocab_topk`. */
  private def cmsTopkAudit(s: SparkSession, dir: String): DataFrame = {
    val gc = gramCounts(s, dir)
    // counters from the cached count relation: Σ over occurrences of a
    // bucket ≡ Σ cnt over its distinct grams, at vocabulary scale — the
    // seed hash stays the one shared cmsBucket definition (the streaming
    // twin, which cannot pre-aggregate, uses it via cmsCellKeys).
    val cells = gc.select(col("cnt"), explode(array((0 until cmsDepth).map(i =>
        struct(lit(i).as("row"), cmsBucket(i, col("g")).as("bucket"))): _*))
        .as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val exact = gc.select(col("g"), col("cnt").as("exact"))
      .orderBy(col("exact").desc, col("g")).limit(cmsTopK)
    val probes = exact.select(col("g"), col("exact"),
      explode(array((0 until cmsDepth).map(i =>
        struct(lit(i).as("row"), cmsBucket(i, col("g")).as("bucket"))): _*))
        .as("p"))
      .select(col("g"), col("exact"), col("p.row").as("row"),
        col("p.bucket").as("bucket"))
    probes.join(cells, Seq("row", "bucket"))
      .groupBy(col("g"), col("exact"))
      .agg(min(col("cnt")).as("est"))
      .select(col("g"), col("exact"), col("est"),
        (col("est") - col("exact")).as("over"),
        (col("est") >= col("exact")).as("ok"))
      .orderBy("g")
  }

  private def cmsTopkAuditSql = {
    val cellUnion = (0 until cmsDepth).map(i =>
      s"SELECT $i AS row, ${cmsBucketSql(i, "g")} AS bucket FROM gs")
      .mkString("\n  UNION ALL ")
    val probeUnion = (0 until cmsDepth).map(i =>
      s"SELECT g, exact, $i AS row, ${cmsBucketSql(i, "g")} AS bucket FROM exact")
      .mkString("\n  UNION ALL ")
    s"""WITH $gramStreamSql,
       |cellkeys AS (
       |  $cellUnion),
       |cells AS (
       |  SELECT row, bucket, COUNT(*) AS cnt FROM cellkeys GROUP BY 1, 2),
       |exact AS (
       |  SELECT g, COUNT(*) AS exact FROM gs GROUP BY 1
       |  ORDER BY exact DESC, g LIMIT $cmsTopK),
       |probes AS (
       |  $probeUnion)
       |SELECT p.g, p.exact, MIN(c.cnt) AS est,
       |  MIN(c.cnt) - p.exact AS over,
       |  MIN(c.cnt) >= p.exact AS ok
       |FROM probes p JOIN cells c USING (row, bucket)
       |GROUP BY p.g, p.exact
       |ORDER BY p.g""".stripMargin
  }

  /** KMV sketch size (minimum hash values retained). */
  val kmvK = 32
  /** Hash domain size: u32 hashes from 8 md5 nibbles. */
  val kmvDomain = 4294967296L

  /** u32 content hash of a gram — seed-free so the SAME gram hashes
    * identically in every source's sketch (the merge law depends on it). */
  private def kmvHash(g: Column): Column =
    conv(substring(md5(g), 1, 8), 16, 10).cast("long")
  private val kmvHashSql = "CAST('0x' || substr(md5(g), 1, 8) AS BIGINT)"

  /** Distinct (source, gram, hash) universe, NULL source bucketed as ''
    * (the fuzz-gate NULL-key contract). Registry-cached: the kmv
    * audits, the k sweep and the HLL audit reference it repeatedly, and
    * without the cache each reference re-runs the token-scale explode +
    * distinct (the cachedRelation discipline — plan audit counted the
    * redundant scans). */
  private def kmvUniverse(s: SparkSession, dir: String): DataFrame =
    Util.cachedRelation(s, dir, "kmvUniverse", s"k=$kmvK")(
      kmvKeyed(t(s, dir, "documents")).distinct())

  private val kmvUniverseSql =
    """u AS (
      |  SELECT DISTINCT COALESCE(source, '') AS source, s AS g
      |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents) d,
      |  UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
      |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s))""".stripMargin

  /** KMV (bottom-k) distinct-count audit, per source: keep the
    * [[kmvK]] smallest u32 gram hashes; with n > k the (k)th smallest
    * hash h_k estimates distinct count as (k−1)·2³²/h_k (the classic
    * bottom-k estimator), and with n ≤ k the sketch IS the exact set.
    * Each source row reports the exact distinct count, the sketch
    * boundary hash, the estimate, and ratio_milli = ⌊1000·est/exact⌋ —
    * the audit a deployment reads before trusting the sketch for corpus
    * accounting.
    *
    * Determinism: ranks order by (hash, gram) so a u32 collision cannot
    * flip the boundary between engines; estimates guard h_k > 0 (an
    * all-zero-prefix md5 is one in 4·10⁹ but would divide by zero).
    *
    * Scale shape: one distinct-aggregate to (source, gram) grain, one
    * rank window per source (hash-partitioned), k rows retained per
    * source — the sketch state is k·|sources| no matter the corpus. At
    * 100 TB each executor keeps its partition's k smallest and the merge
    * is "union, re-take bottom k" ([[kmvMergeAudit]] pins that law). */
  private def kmvDistinctAudit(s: SparkSession, dir: String): DataFrame = {
    // single pass: the rank window and the per-source exact count share
    // one Exchange on source; the k-th row's hash surfaces through the
    // aggregate as max(h where rk = k) — no second scan, no self-join
    val ranked = kmvUniverse(s, dir).withColumn("rk", row_number().over(
      Window.partitionBy(col("source")).orderBy(col("h"), col("g")))
      .cast("long"))
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_exact"),
        max(when(col("rk") === kmvK, col("h"))).as("h_k"))
      .select(col("source"), col("n_exact"), col("h_k"),
        when(col("n_exact") <= kmvK, col("n_exact"))
          .otherwise(when(col("h_k") > 0,
            expr(s"(${kmvK - 1} * $kmvDomain) div h_k"))).as("est"))
      .withColumn("ratio_milli",
        expr("CASE WHEN n_exact > 0 THEN (1000 * est) div n_exact END"))
      .orderBy("source")
  }

  private def kmvDistinctAuditSql =
    s"""WITH $kmvUniverseSql,
       |hh AS (SELECT source, g, $kmvHashSql AS h FROM u),
       |ranked AS (
       |  SELECT source, h,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, g)
       |      AS BIGINT) AS rk
       |  FROM hh),
       |nsrc AS (SELECT source, COUNT(*) AS n_exact FROM hh GROUP BY 1),
       |hk AS (SELECT source, h AS h_k FROM ranked WHERE rk = $kmvK)
       |SELECT n.source, n.n_exact, hk.h_k,
       |  CASE WHEN n.n_exact <= $kmvK THEN n.n_exact
       |       WHEN hk.h_k > 0 THEN (${kmvK - 1} * $kmvDomain) // hk.h_k
       |  END AS est,
       |  CASE WHEN n.n_exact > 0
       |    THEN (1000 * (CASE WHEN n.n_exact <= $kmvK THEN n.n_exact
       |       WHEN hk.h_k > 0 THEN (${kmvK - 1} * $kmvDomain) // hk.h_k END))
       |      // n.n_exact
       |  END AS ratio_milli
       |FROM nsrc n LEFT JOIN hk ON n.source = hk.source
       |ORDER BY n.source""".stripMargin

  /** KMV merge law audit — the fact that makes bottom-k sketches THE
    * distributed distinct counter: merging the per-source sketches
    * (union their ≤ k retained hashes, re-take the bottom k) yields
    * EXACTLY the sketch of the unioned universe, because the corpus's k
    * smallest gram hashes each sit inside their own source's bottom k.
    * One row: the corpus-wide exact distinct count, the estimate from a
    * sketch built directly on the corpus, the estimate from merging the
    * 20 per-source sketches, and `merge_exact` — which the construction
    * forces TRUE, so a hash-green row is a cross-engine proof of the
    * merge law on this corpus, not an assertion.
    *
    * Scale shape: the merged side touches only k·|sources| retained
    * rows — increment/shard maintenance is sketch-sized, never
    * corpus-sized (the kn_model_drift contract for distinct counts). */
  private def kmvMergeAudit(s: SparkSession, dir: String): DataFrame = {
    val u = kmvUniverse(s, dir)
    // global bottom-k via orderBy+limit (TakeOrderedAndProject — a
    // distributed top-k, never a whole-relation single-partition window)
    val direct = u.select(col("g"), col("h")).distinct()
      .orderBy(col("h"), col("g")).limit(kmvK)
    val perSource = u.withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("g")))
        .cast("long"))
      .filter(col("rk") <= kmvK)
    val merged = perSource.select(col("g"), col("h")).distinct()
      .orderBy(col("h"), col("g")).limit(kmvK)
    val nAll = u.select(col("g")).distinct().agg(count(lit(1)).as("n_exact"))
    val dAgg = direct.agg(max(col("h")).as("dh"), count(lit(1)).as("dn"))
    val mAgg = merged.agg(max(col("h")).as("mh"), count(lit(1)).as("mn"))
    nAll.crossJoin(broadcast(dAgg)).crossJoin(broadcast(mAgg))
      .select(col("n_exact"),
        when(col("n_exact") <= kmvK, col("n_exact"))
          .otherwise(when(col("dh") > 0,
            expr(s"(${kmvK - 1} * $kmvDomain) div dh"))).as("est_direct"),
        when(col("n_exact") <= kmvK, col("n_exact"))
          .otherwise(when(col("mh") > 0,
            expr(s"(${kmvK - 1} * $kmvDomain) div mh"))).as("est_merged"),
        (col("dh") <=> col("mh") && col("dn") <=> col("mn"))
          .as("merge_exact"))
  }

  private def kmvMergeAuditSql =
    s"""WITH $kmvUniverseSql,
       |hh AS (SELECT source, g, $kmvHashSql AS h FROM u),
       |dg AS (SELECT DISTINCT g, h FROM hh),
       |direct AS (
       |  SELECT h FROM (
       |    SELECT h, CAST(row_number() OVER (ORDER BY h, g) AS BIGINT) rk
       |    FROM dg) WHERE rk <= $kmvK),
       |ps AS (
       |  SELECT g, h FROM (
       |    SELECT g, h, CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY h, g) AS BIGINT) rk FROM hh) WHERE rk <= $kmvK),
       |merged AS (
       |  SELECT h FROM (
       |    SELECT h, CAST(row_number() OVER (ORDER BY h, g) AS BIGINT) rk
       |    FROM (SELECT DISTINCT g, h FROM ps)) WHERE rk <= $kmvK),
       |na AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS n_exact FROM hh),
       |da AS (SELECT MAX(h) AS dh, COUNT(*) AS dn FROM direct),
       |ma AS (SELECT MAX(h) AS mh, COUNT(*) AS mn FROM merged)
       |SELECT n_exact,
       |  CASE WHEN n_exact <= $kmvK THEN n_exact
       |       WHEN dh > 0 THEN (${kmvK - 1} * $kmvDomain) // dh
       |  END AS est_direct,
       |  CASE WHEN n_exact <= $kmvK THEN n_exact
       |       WHEN mh > 0 THEN (${kmvK - 1} * $kmvDomain) // mh
       |  END AS est_merged,
       |  dh IS NOT DISTINCT FROM mh AND dn IS NOT DISTINCT FROM mn
       |    AS merge_exact
       |FROM na CROSS JOIN da CROSS JOIN ma""".stripMargin

  /** Priority-sample size per source. */
  val prioK = 8
  /** Coin scale: u24 md5 coins, u ∈ [1, 2²⁴]. */
  val prioScale = 16777216L

  /** Duffield–Lund–Thorup priority sampling audit, per source: each doc
    * gets priority p = ⌊w·2²⁴/u⌋ from its token-count weight w and a
    * deterministic md5-u24 coin u (reproducible across engines, retries
    * and partitionings — the temperature_sample_audit coin discipline);
    * the k highest-priority docs form the sample, τ is the (k+1)th
    * priority, and the subset-sum estimator assigns each sampled doc
    * weight max(w, τ) — giving `est_tokens` for the source's total token
    * count from k docs. With n ≤ k the sample is the source and the
    * estimate exact. Reported per source: doc/sample counts, exact total,
    * τ, the estimate and ratio_milli — the accuracy a deployment reads
    * before replacing per-source token accounting with a sample.
    *
    * Priorities use integer floor division (identical truncation both
    * engines, positive operands only); zero-weight docs get priority 0
    * and never displace a weighted doc, contributing 0 to the true total
    * regardless. NULL doc_id rows are excluded — the coin is a function
    * of the id (documented; the exact total is over the same universe so
    * the estimator audits apples against apples).
    *
    * Scale shape: one row-local projection (weight, coin, priority), one
    * rank window per source, a k-row-per-source aggregate. The sample is
    * mergeable the same way KMV is (keep the k highest priorities seen;
    * τ re-derives on merge), which is why this — not uniform
    * subsampling — is the published estimator for skewed weights. */
  /** (source, doc_id, w, p) priority projection of a doc frame — the
    * weight/coin/priority math shared by the batch audit and the
    * streaming twin
    * ([[graft.streaming.StreamingPipeline.prioritySampleStream]]): one
    * copy or the estimator sides drift. */
  def prioKeyed(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id").isNotNull)
      .select(coalesce(col("source"), lit("")).as("source"), col("doc_id"),
        size(filter(split(coalesce(col("text"), lit("")), " "),
          x => x =!= "")).cast("long").as("w"))
      .withColumn("u",
        conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long") + 1L)
      .withColumn("p", expr(s"(w * $prioScale) div u"))
      .drop("u")

  private def prioritySampleAudit(s: SparkSession, dir: String): DataFrame = {
    val d = prioKeyed(t(s, dir, "documents"))
    // single pass: rank + τ broadcast as windows inside ONE Exchange on
    // source, then one aggregate — a plan audit found the naive
    // three-relation join re-scanned documents 8× for the same answer
    val w = Window.partitionBy(col("source"))
    val ranked = d
      .withColumn("rk", row_number().over(
        w.orderBy(col("p").desc, col("doc_id"))).cast("long"))
      .withColumn("tau", coalesce(
        max(when(col("rk") === prioK + 1, col("p"))).over(w), lit(0L)))
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("exact_tokens"),
        sum(when(col("rk") <= prioK, 1L).otherwise(0L)).as("n_sampled"),
        max(col("tau")).as("tau"),
        coalesce(sum(when(col("rk") <= prioK,
          greatest(col("w"), col("tau")))), lit(0L)).as("est_tokens"))
      .withColumn("ratio_milli", expr(
        "CASE WHEN exact_tokens > 0 THEN (1000 * est_tokens) div exact_tokens END"))
      .orderBy("source")
  }

  private def prioritySampleAuditSql =
    s"""WITH d AS (
       |  SELECT COALESCE(source, '') AS source, doc_id,
       |    CAST(len(list_filter(string_split(COALESCE(text, ''), ' '),
       |      x -> x <> '')) AS BIGINT) AS w,
       |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
       |      AS BIGINT) + 1 AS u
       |  FROM documents WHERE doc_id IS NOT NULL),
       |p AS (SELECT *, (w * $prioScale) // u AS p FROM d),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY source
       |    ORDER BY p DESC, doc_id) AS BIGINT) AS rk
       |  FROM p),
       |tau AS (SELECT source, p AS tau FROM ranked WHERE rk = ${prioK + 1}),
       |totals AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(w) AS BIGINT) AS exact_tokens
       |  FROM d GROUP BY 1),
       |est AS (
       |  SELECT r.source, COUNT(*) AS n_sampled,
       |    CAST(SUM(greatest(r.w, COALESCE(t.tau, 0))) AS BIGINT)
       |      AS est_tokens
       |  FROM ranked r LEFT JOIN tau t ON r.source = t.source
       |  WHERE r.rk <= $prioK GROUP BY 1)
       |SELECT tt.source, tt.n_docs, tt.exact_tokens,
       |  COALESCE(e.n_sampled, 0) AS n_sampled,
       |  COALESCE(t.tau, 0) AS tau,
       |  COALESCE(e.est_tokens, 0) AS est_tokens,
       |  CASE WHEN tt.exact_tokens > 0
       |    THEN (1000 * COALESCE(e.est_tokens, 0)) // tt.exact_tokens
       |  END AS ratio_milli
       |FROM totals tt LEFT JOIN est e ON tt.source = e.source
       |LEFT JOIN tau t ON tt.source = t.source
       |ORDER BY tt.source""".stripMargin

  /** HLL precision: p = 6 → m = 64 registers; α₆₄ = 0.709 (Flajolet
    * et al. 2007, Fig. 3 — the m = 64 bias constant), held in milli. */
  val hllRegisters = 64L
  val hllAlphaMilli = 709L
  /** Width of the ρ field: u32 hash minus the 6 register-index bits. */
  val hllRhoBits = 26

  /** HyperLogLog register audit — the third canonical sketch beside the
    * CMS frequency counter and the KMV boundary: 64 registers over the
    * corpus's distinct-gram u32 hashes (top 6 bits pick the register,
    * ρ = leading-zero rank of the remaining 26 via the libm-free
    * bit-length idiom), the harmonic estimate computed EXACTLY — each
    * 2^−M term is the integer 2³⁰ ≫ M, so the indicator sum Z is an
    * int64 and est_raw = α·m²·2³⁰ div Z involves no float — and the
    * small-range linear-counting correction (est ≤ 5m/2 with empty
    * registers → m·ln(m/V)) in the octave-linear milli-bit log of the
    * DSIR family (ln x = lg_milli(x)·ln2, one integer division).
    * The merge law (per-register MAX composes) is audited exactly like
    * [[kmvMergeAudit]]: per-source register maxes max-merged must equal
    * the direct registers — structurally true, emitted as merge_exact
    * so a hash-green row is a cross-engine proof.
    *
    * Scale shape: rides the session-cached KMV universe; the register
    * table is a 64-row aggregate (map-side combining to ≤ 64 rows per
    * task), the merged side is ≤ 64·|sources| rows, and sketch state is
    * CONSTANT at any corpus size — why HLL is the standard cardinality
    * sketch where KMV's k·2³² hash range needs tuning. The exact
    * distinct count (the audit's baseline) is the only corpus-sized
    * aggregate. */
  private def hllDistinctAudit(s: SparkSession, dir: String): DataFrame = {
    val u = kmvUniverse(s, dir)
    val rhoW = 1L << hllRhoBits
    def withReg(d: DataFrame): DataFrame = d
      .withColumn("j", expr(s"h div $rhoW"))
      .withColumn("r", col("h") % rhoW)
      .withColumn("rho", when(col("r") === 0, lit(hllRhoBits + 1))
        .otherwise(lit(hllRhoBits + 1) - length(bin(col("r")))).cast("long"))
    val grid = s.range(hllRegisters).select(col("id").as("j"))
    val direct = grid.join(
        withReg(u.select(col("g"), col("h")).distinct())
          .groupBy(col("j")).agg(max(col("rho")).as("m_direct")),
        Seq("j"), "left")
      .select(col("j"), coalesce(col("m_direct"), lit(0L)).as("m_direct"))
    val merged = grid.join(
        withReg(u).groupBy(col("source"), col("j"))
          .agg(max(col("rho")).as("m_src"))
          .groupBy(col("j")).agg(max(col("m_src")).as("m_merged")),
        Seq("j"), "left")
      .select(col("j"), coalesce(col("m_merged"), lit(0L)).as("m_merged"))
    val regs = direct.join(merged, "j")
    val nAll = u.select(col("g")).distinct().agg(count(lit(1)).as("n_exact"))
    val aggd = regs.agg(
      sum(call_function("shiftleft", lit(1L),
        (lit(30) - col("m_direct")).cast("int"))).as("z_scaled"),
      sum(when(col("m_direct") === 0, 1L).otherwise(0L)).as("v_empty"),
      max(when(col("m_direct") =!= col("m_merged"), 1L).otherwise(0L))
        .as("m_drift"))
    val m = hllRegisters
    // precomputed Long: interpolating the factors would parse as INT
    // literals and overflow the 32-bit multiply under ANSI
    val estNum = hllAlphaMilli * m * m * (1L << 30)
    nAll.crossJoin(broadcast(aggd))
      .withColumn("est_raw", expr(
        s"(${estNum}L div (1000 * z_scaled))"))
      .withColumn("est", expr(
        s"CASE WHEN est_raw <= ${5 * m / 2} AND v_empty > 0 THEN " +
          s"($m * (${CurationOps.lg(m.toString)} - " +
          s"${CurationOps.lg("v_empty")}) * 693147) div 1000000000 " +
          "ELSE est_raw END"))
      .select(col("n_exact"), col("v_empty"), col("z_scaled"),
        col("est_raw"), col("est"),
        expr("CASE WHEN n_exact > 0 THEN (1000 * est) div n_exact END")
          .as("ratio_milli"),
        (col("m_drift") === 0).as("merge_exact"))
  }

  /** The precision grid of the HLL sweep: p register-index bits → m = 2^p
    * registers, bracketing the deployed p = 6 an octave either side. */
  val hllPGrid: Seq[Int] = Seq(4, 6, 8)

  /** α_m in milli (Flajolet et al. 2007): the published small-m constants
    * for m = 16/32/64, the closed form ⌊721.3·m/(m + 1.079)⌋ beyond. */
  def hllAlphaMilliFor(m: Long): Long = m match {
    case 16L => 673L
    case 32L => 697L
    case 64L => 709L
    case _ => (721300L * m) / (1000L * m + 1079L)
  }

  /** HLL precision calibration sweep — the sketch-memory sizing decision
    * (the cms_width_sweep / kmv_k_sweep contract applied to the register
    * count): per p ∈ [[hllPGrid]], the full estimator pipeline of
    * [[hllDistinctAudit]] — register maxes over the SAME cached
    * distinct-hash universe, exact-integer harmonic estimate with the
    * published per-m α, small-range linear-counting correction — and the
    * exact-milli accuracy ratio. Relative stderr falls as 1.04/√m, so
    * the sweep shows where registers stop buying accuracy (m = 256 on a
    * ~16k-distinct corpus is already past the knee).
    *
    * Plan shape: the (p, j, ρ) projection explodes the vocabulary-sized
    * distinct-hash relation ×|grid| with p as a data column (different ρ
    * widths per p — each grid row re-slices, never re-hashes); registers
    * aggregate to Σ 2^p ≤ 336 cells via the LEFT-joined full (p, j)
    * grid, so EVERY grid row appears even on an empty corpus (all-empty
    * registers → linear counting → est 0, the documented degenerate
    * row); the exact distinct count is the one corpus-sized aggregate,
    * shared across the grid. */
  private def hllPSweep(s: SparkSession, dir: String): DataFrame = {
    val u = kmvUniverse(s, dir)
    val dh = u.select(col("g"), col("h")).distinct()
    val byP = hllPGrid.map { p =>
      val rhoBits = 32 - p
      val rhoW = 1L << rhoBits
      dh.select(lit(p).as("p"), expr(s"h div $rhoW").as("j"),
          (col("h") % rhoW).as("r"))
        .withColumn("rho", when(col("r") === 0, lit(rhoBits + 1))
          .otherwise(lit(rhoBits + 1) - length(bin(col("r")))).cast("long"))
        .select(col("p"), col("j"), col("rho"))
    }.reduce(_ unionByName _)
    val grid = hllPGrid.map(p =>
      s.range(1L << p).select(lit(p).as("p"), col("id").as("j")))
      .reduce(_ unionByName _)
    val cells = grid.join(
        byP.groupBy(col("p"), col("j")).agg(max(col("rho")).as("mj")),
        Seq("p", "j"), "left")
      .select(col("p"), coalesce(col("mj"), lit(0L)).as("mj"))
    val agg = cells.groupBy(col("p")).agg(
      sum(call_function("shiftleft", lit(1L),
        (lit(30) - col("mj")).cast("int"))).as("z_scaled"),
      sum(when(col("mj") === 0, 1L).otherwise(0L)).as("v_empty"))
    // per-p constants as CASE expressions (3 literals; the numerators are
    // precomputed Longs — interpolated INT factors would overflow 32-bit)
    val mCase = hllPGrid.map(p =>
      s"WHEN p = $p THEN CAST(${1L << p} AS BIGINT)")
      .mkString("CASE ", " ", " END")
    val estNumCase = hllPGrid.map { p =>
      val m = 1L << p
      s"WHEN p = $p THEN ${hllAlphaMilliFor(m) * m * m * (1L << 30)}"
    }.mkString("CASE ", " ", " END")
    val nAll = u.select(col("g")).distinct().agg(count(lit(1)).as("n_exact"))
    agg.crossJoin(broadcast(nAll))
      .withColumn("m", expr(mCase))
      .withColumn("est_raw", expr(s"($estNumCase) div (1000 * z_scaled)"))
      .withColumn("est", expr(
        s"CASE WHEN est_raw <= (5 * m) div 2 AND v_empty > 0 THEN " +
          s"(m * (${CurationOps.lg("m")} - ${CurationOps.lg("v_empty")}) " +
          "* 693147) div 1000000000 ELSE est_raw END"))
      .select(col("p"), col("m"), col("n_exact"), col("v_empty"),
        col("z_scaled"), col("est_raw"), col("est"),
        expr("CASE WHEN n_exact > 0 THEN (1000 * est) div n_exact END")
          .as("ratio_milli"))
      .orderBy("p")
  }

  private def hllPSweepSql = {
    val rhoUnion = hllPGrid.map { p =>
      val rhoBits = 32 - p
      val rhoW = 1L << rhoBits
      s"""SELECT $p AS p, h // $rhoW AS j,
         |    CAST(CASE WHEN h % $rhoW = 0 THEN ${rhoBits + 1}
         |         ELSE ${rhoBits + 1} - length(bin(h % $rhoW)) END
         |      AS BIGINT) AS rho
         |  FROM dh""".stripMargin
    }.mkString("\n  UNION ALL ")
    val gridUnion = hllPGrid.map(p =>
      s"SELECT $p AS p, CAST(range AS BIGINT) AS j FROM range(${1L << p})")
      .mkString("\n  UNION ALL ")
    val mCase = hllPGrid.map(p =>
      s"WHEN p = $p THEN CAST(${1L << p} AS BIGINT)")
      .mkString("CASE ", " ", " END")
    val estNumCase = hllPGrid.map { p =>
      val m = 1L << p
      s"WHEN p = $p THEN ${hllAlphaMilliFor(m) * m * m * (1L << 30)}"
    }.mkString("CASE ", " ", " END")
    s"""WITH $kmvUniverseSql,
       |hh AS (SELECT source, g, $kmvHashSql AS h FROM u),
       |dh AS (SELECT DISTINCT g, h FROM hh),
       |na AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS n_exact FROM hh),
       |rho AS (
       |  $rhoUnion),
       |grid AS (
       |  $gridUnion),
       |regs AS (SELECT p, j, MAX(rho) AS mj FROM rho GROUP BY 1, 2),
       |cells AS (
       |  SELECT grid.p, COALESCE(regs.mj, 0) AS mj
       |  FROM grid LEFT JOIN regs ON grid.p = regs.p AND grid.j = regs.j),
       |ag AS (
       |  SELECT p,
       |    CAST(SUM(CAST(1 AS BIGINT) << CAST(30 - mj AS INTEGER))
       |      AS BIGINT) AS z_scaled,
       |    CAST(SUM(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS v_empty
       |  FROM cells GROUP BY 1),
       |e1 AS (
       |  SELECT p, $mCase AS m, n_exact, v_empty, z_scaled,
       |    ($estNumCase) // (1000 * z_scaled) AS est_raw
       |  FROM ag CROSS JOIN na),
       |e2 AS (
       |  SELECT *,
       |    CASE WHEN est_raw <= (5 * m) // 2 AND v_empty > 0 THEN
       |      (m * (${CurationOps.lgSql("m")} -
       |        ${CurationOps.lgSql("v_empty")}) * 693147) // 1000000000
       |    ELSE est_raw END AS est
       |  FROM e1)
       |SELECT p, m, n_exact, v_empty, z_scaled, est_raw, est,
       |  CASE WHEN n_exact > 0 THEN (1000 * est) // n_exact END
       |    AS ratio_milli
       |FROM e2 ORDER BY p""".stripMargin
  }

  private def hllDistinctAuditSql = {
    val rhoW = 1L << hllRhoBits
    val m = hllRegisters
    s"""WITH $kmvUniverseSql,
       |hh AS (SELECT source, g, $kmvHashSql AS h FROM u),
       |rr AS (
       |  SELECT source, g, h // $rhoW AS j, h % $rhoW AS r FROM hh),
       |rho AS (
       |  SELECT source, g, j,
       |    CAST(CASE WHEN r = 0 THEN ${hllRhoBits + 1}
       |         ELSE ${hllRhoBits + 1} - length(bin(r)) END AS BIGINT) AS rho
       |  FROM rr),
       |grid AS (SELECT CAST(range AS BIGINT) AS j FROM range($m)),
       |direct AS (
       |  SELECT grid.j, COALESCE(d.m_direct, 0) AS m_direct
       |  FROM grid LEFT JOIN (
       |    SELECT j, MAX(rho) AS m_direct
       |    FROM (SELECT DISTINCT g, j, rho FROM rho) GROUP BY 1) d
       |  ON grid.j = d.j),
       |merged AS (
       |  SELECT grid.j, COALESCE(d.m_merged, 0) AS m_merged
       |  FROM grid LEFT JOIN (
       |    SELECT j, MAX(m_src) AS m_merged FROM (
       |      SELECT source, j, MAX(rho) AS m_src FROM rho GROUP BY 1, 2)
       |    GROUP BY 1) d
       |  ON grid.j = d.j),
       |regs AS (SELECT * FROM direct JOIN merged USING (j)),
       |na AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS n_exact FROM hh),
       |ag AS (
       |  SELECT
       |    CAST(SUM(CAST(1 AS BIGINT) << CAST(30 - m_direct AS INTEGER))
       |      AS BIGINT) AS z_scaled,
       |    CAST(SUM(CASE WHEN m_direct = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS v_empty,
       |    MAX(CASE WHEN m_direct <> m_merged THEN 1 ELSE 0 END) AS m_drift
       |  FROM regs),
       |e1 AS (
       |  SELECT n_exact, v_empty, z_scaled, m_drift,
       |    ${hllAlphaMilli * m * m * (1L << 30)} // (1000 * z_scaled)
       |      AS est_raw
       |  FROM na CROSS JOIN ag),
       |e2 AS (
       |  SELECT *,
       |    CASE WHEN est_raw <= ${5 * m / 2} AND v_empty > 0 THEN
       |      ($m * (${CurationOps.lgSql(m.toString)} -
       |        ${CurationOps.lgSql("v_empty")}) * 693147) // 1000000000
       |    ELSE est_raw END AS est
       |  FROM e1)
       |SELECT n_exact, v_empty, z_scaled, est_raw, est,
       |  CASE WHEN n_exact > 0 THEN (1000 * est) // n_exact END
       |    AS ratio_milli,
       |  m_drift = 0 AS merge_exact
       |FROM e2""".stripMargin
  }

  /** How many top-frequency grams the Zipf fit reads (bounded so the
    * milli-bit moment products stay far inside int64). */
  val zipfTopN = 256

  /** Zipf-slope audit: OLS of log₂(count) on log₂(rank) over the top-
    * [[zipfTopN]] corpus trigrams — the corpus-statistics sanity check a
    * pipeline runs on ingest (natural text fits slope ≈ −1; a synthetic
    * or deduplicated-to-death corpus drifts visibly; Piantadosi 2014
    * reviews the law). Logs are the octave-linear milli-bit log₂ (exact
    * integers both engines), moments are exact int64 sums, and
    * slope/intercept/R² evaluate through the SHARED OLS expressions
    * ([[Util.olsSlope]] — the ppl_length_ols contract) so degenerate
    * corpora (fewer than 2 distinct counts) yield NULLs, not a divide.
    *
    * Plan: the gram count is the only token-scale aggregate; the top-N
    * cut is a distributed TakeOrdered (never a global sort), the rank
    * window runs over the N retained rows, and the fit is a one-row
    * aggregate. */
  private def zipfSlopeAudit(s: SparkSession, dir: String): DataFrame = {
    val top = gramCounts(s, dir)
      .orderBy(col("cnt").desc, col("g")).limit(zipfTopN)
    val ranked = top.withColumn("rk", row_number().over(
      Window.orderBy(col("cnt").desc, col("g"))).cast("long"))
      .withColumn("x", expr(CurationOps.lg("rk")))
      .withColumn("y", expr(CurationOps.lg("cnt")))
    ranked.agg(count(lit(1)).as("n_docs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n_docs").as("n_points"),
        expr(Util.olsSlope).as("slope_milli_per_milli"),
        expr(Util.olsIntercept).as("intercept_milli"),
        expr(Util.olsR2).as("r2"))
  }

  private def zipfSlopeAuditSql =
    s"""WITH $gramStreamSql,
       |top AS (
       |  SELECT g, COUNT(*) AS cnt FROM gs GROUP BY 1
       |  ORDER BY cnt DESC, g LIMIT $zipfTopN),
       |ranked AS (
       |  SELECT cnt,
       |    CAST(row_number() OVER (ORDER BY cnt DESC, g) AS BIGINT) AS rk
       |  FROM top),
       |xy AS (
       |  SELECT ${CurationOps.lgSql("rk")} AS x,
       |    ${CurationOps.lgSql("cnt")} AS y
       |  FROM ranked),
       |m AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy,
       |    CAST(SUM(y * y) AS BIGINT) AS syy
       |  FROM xy)
       |SELECT n_docs AS n_points,
       |  ${Util.olsSlope} AS slope_milli_per_milli,
       |  ${Util.olsIntercept} AS intercept_milli,
       |  ${Util.olsR2} AS r2
       |FROM m""".stripMargin

  /** The width grid of the CMS sweep (brackets the deployed
    * [[cmsWidth]] = 256 an octave either side, ×4 steps). */
  val cmsWidthGrid: Seq[Long] = Seq(64L, 256L, 1024L)

  /** CMS width calibration sweep — the sizing decision a deployment
    * reads before committing sketch memory (the minhash_band_sweep /
    * semdedup_eps_sweep grid-as-data contract applied to the sketch
    * tier): per candidate width w, the total and worst overestimate of
    * the exact top-[[cmsTopK]] grams, the one-sided law verdict, and
    * whether the worst error sat under the paper's e·N/w Markov bound.
    * Wider is monotonically cheaper in error and linearly costlier in
    * memory — the sweep shows exactly where the curve flattens.
    *
    * Plan shape: the u32 seed hashes are computed ONCE per (occurrence,
    * row) and exploded ×|grid| with the width as a data column (bucket
    * = h % w) — nothing re-hashes per width; counters are one hash
    * aggregate to Σ d·w ≤ 5 376 cells; the audited keys join the
    * constant-size counter relation. Every grid row always appears
    * (the LEFT-join-the-grid rule does not even arise: the counter
    * build emits every width by construction and the top-k is
    * non-empty whenever the corpus has any trigram; an EMPTY corpus
    * yields zero rows on both engines). */
  private def cmsWidthSweep(s: SparkSession, dir: String): DataFrame = {
    val gc = gramCounts(s, dir)
    val hashed = gc.select(col("cnt"),
        explode(array((0 until cmsDepth).map(i =>
          struct(lit(i).as("row"), cmsBucket2(i, col("g")).as("h"))): _*))
          .as("c"))
      .select(col("cnt"), col("c.row").as("row"), col("c.h").as("h"))
      .withColumn("w", explode(array(cmsWidthGrid.map(lit): _*)))
    val cells = hashed.groupBy(col("w"), col("row"),
        (col("h") % col("w")).as("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val nTot = gc.agg(sum(col("cnt")).as("n_grams"))
    val exact = gc.select(col("g"), col("cnt").as("exact"))
      .orderBy(col("exact").desc, col("g")).limit(cmsTopK)
    val probes = exact.select(col("g"), col("exact"),
        explode(array((0 until cmsDepth).map(i =>
          struct(lit(i).as("row"), cmsBucket2(i, col("g")).as("h"))): _*))
          .as("p"))
      .select(col("g"), col("exact"), col("p.row").as("row"), col("p.h").as("h"))
      .withColumn("w", explode(array(cmsWidthGrid.map(lit): _*)))
      .withColumn("bucket", col("h") % col("w"))
    val ests = probes.join(cells, Seq("w", "row", "bucket"))
      .groupBy(col("w"), col("g"), col("exact"))
      .agg(min(col("cnt")).as("est"))
    ests.groupBy(col("w"))
      .agg(count(lit(1)).as("n_audited"),
        sum(col("est") - col("exact")).as("total_over"),
        max(col("est") - col("exact")).as("max_over"),
        min(when(col("est") >= col("exact"), 1L).otherwise(0L)).as("okm"))
      .crossJoin(broadcast(nTot))
      .select(col("w"), (col("w") * cmsDepth).as("n_cells"),
        col("n_grams"), col("n_audited"), col("total_over"), col("max_over"),
        (col("okm") === 1L).as("all_ok"),
        (col("max_over") * 1000L * col("w") <= lit(2718L) * col("n_grams"))
          .as("under_markov_bound"))
      .orderBy("w")
  }

  /** Raw u32 seed hash of a gram (the [[cmsBucket]] math without the
    * deployed-width modulus — the sweep applies its own widths). */
  private def cmsBucket2(i: Int, g: Column): Column =
    conv(substring(md5(concat(lit(s"$i:"), g)), 1, 8), 16, 10).cast("long")

  private def cmsWidthSweepSql = {
    val hashUnion = (0 until cmsDepth).map(i =>
      s"SELECT $i AS row, CAST('0x' || substr(md5('$i:' || g), 1, 8) AS BIGINT) AS h FROM gs")
      .mkString("\n  UNION ALL ")
    val probeUnion = (0 until cmsDepth).map(i =>
      s"SELECT g, exact, $i AS row, CAST('0x' || substr(md5('$i:' || g), 1, 8) AS BIGINT) AS h FROM exact")
      .mkString("\n  UNION ALL ")
    s"""WITH $gramStreamSql,
       |hashed AS (
       |  SELECT row, h, CAST(w AS BIGINT) AS w FROM (
       |    $hashUnion) x, UNNEST([${cmsWidthGrid.mkString(", ")}]) t(w)),
       |cells AS (
       |  SELECT w, row, h % w AS bucket, COUNT(*) AS cnt
       |  FROM hashed GROUP BY 1, 2, 3),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_grams FROM gs),
       |exact AS (
       |  SELECT g, COUNT(*) AS exact FROM gs GROUP BY 1
       |  ORDER BY exact DESC, g LIMIT $cmsTopK),
       |probes AS (
       |  SELECT g, exact, row, h, CAST(w AS BIGINT) AS w, h % CAST(w AS BIGINT) AS bucket FROM (
       |    $probeUnion) x, UNNEST([${cmsWidthGrid.mkString(", ")}]) t(w)),
       |ests AS (
       |  SELECT p.w, p.g, p.exact, MIN(c.cnt) AS est
       |  FROM probes p JOIN cells c USING (w, row, bucket)
       |  GROUP BY 1, 2, 3)
       |SELECT w, w * $cmsDepth AS n_cells, nt.n_grams,
       |  COUNT(*) AS n_audited,
       |  CAST(SUM(est - exact) AS BIGINT) AS total_over,
       |  MAX(est - exact) AS max_over,
       |  MIN(CASE WHEN est >= exact THEN 1 ELSE 0 END) = 1 AS all_ok,
       |  MAX(est - exact) * 1000 * w <= 2718 * nt.n_grams
       |    AS under_markov_bound
       |FROM ests CROSS JOIN nt
       |GROUP BY w, nt.n_grams ORDER BY w""".stripMargin
  }

  /** df-cap for the [[kmvIntersectAudit]] EXACT baseline's gram-keyed
    * self-join: a gram present in more than this many sources contributes
    * df² join rows, the classic quadratic key ([[graft.queries.DedupOps]]
    * `maxTokenDf` discipline applied here for symmetry). The cap restricts
    * the exact-intersection UNIVERSE (both the join and what n_exact_inter
    * counts — a consistent sub-universe, never a mixed-universe
    * undercount), drops are logged via `graft_drop_kmv_exact_gram`, and
    * the SKETCH side is untouched — it never joins on grams. Never binds
    * at test scale (≤ 20 sources, so max df = 20 < 1000), so oracle
    * output is unchanged there. Session conf `graft.cap.kmvExactDf`
    * overrides per deployment — ENGINE SIDE ONLY: the DuckDB oracle
    * interpolates the default, so Verify refuses replay under an
    * override. */
  val kmvExactDfDefault = 1000
  def kmvExactDf(s: SparkSession): Int =
    s.conf.getOption("graft.cap.kmvExactDf").map(_.toInt)
      .getOrElse(kmvExactDfDefault)

  /** KMV set-intersection audit — the theta-sketch estimator for
    * CROSS-SOURCE content overlap (the sketch-tier sibling of
    * `cross_source_leakage`, which verifies pairs exactly): for every
    * unordered source pair, the union sketch is the bottom-k of the two
    * retained hash sets and θ its k-th smallest hash; following the
    * classical estimator, only entries STRICTLY below θ form the uniform
    * sample (inclusion probability θ/2³²), so m counts below-θ items
    * present in BOTH sketches and the intersection estimate is
    * m·est_union/(k−1) = m·2³²/θ — membership is EXACT for those items
    * because any x ∈ A with h(x) < θ ≤ θ_A is necessarily inside A's
    * bottom-k (the theta-sketch composability fact this audit pins; the
    * strict inequality also makes it immune to a u32 hash tie AT a
    * source's own boundary). A pair whose union pool retains fewer than
    * k items is in the exact regime (the sketches jointly saw
    * everything: estimate ≡ m over the whole pool). Every pair is
    * emitted with its exact intersection for the accuracy read.
    *
    * Scale shape: all sketch-side work runs on k·|sources| retained
    * rows (640 here) — pair grids, union ranks and m are tiny no matter
    * the corpus; only the exact baseline touches the vocabulary (one
    * gram-keyed self-join, df-capped by [[kmvExactDf]] so no stop-gram
    * can go quadratic). At 100 TB a deployment drops the exact side and
    * keeps the sketch-only plan — this is precisely why theta sketches
    * are the standard cross-dataset overlap tool. */
  private def kmvIntersectAudit(s: SparkSession, dir: String): DataFrame = {
    val u = kmvUniverse(s, dir)
    val sk = u.withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("g")))
        .cast("long"))
      .filter(col("rk") <= kmvK)
      .select(col("source"), col("g"), col("h"))
    val srcs = u.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("sa"))
      .join(srcs.select(col("source").as("sb")), col("sa") < col("sb"))
    val pool = pairs
      .join(sk.withColumnRenamed("source", "sa"), Seq("sa"))
      .select(col("sa"), col("sb"), col("g"), col("h"), lit(1L).as("in_a"),
        lit(0L).as("in_b"))
      .unionByName(pairs
        .join(sk.withColumnRenamed("source", "sb"), Seq("sb"))
        .select(col("sa"), col("sb"), col("g"), col("h"), lit(0L).as("in_a"),
          lit(1L).as("in_b")))
      .groupBy(col("sa"), col("sb"), col("g"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val ranked = pool.withColumn("rk", row_number().over(
      Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"), col("g")))
      .cast("long"))
    val agg = ranked.filter(col("rk") <= kmvK)
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("n_pool"),
        max(when(col("rk") === kmvK, col("h"))).as("theta"),
        sum(col("in_a") * col("in_b")).as("m_all"),
        sum(when(col("rk") < kmvK, col("in_a") * col("in_b"))
          .otherwise(lit(0L))).as("m_below"))
    // u is distinct (source, g), so the per-gram count IS source fan-out
    val okG = Util.withDropMetric(s, u.groupBy(col("g"))
          .agg(count(lit(1)).as("df")), "graft_drop_kmv_exact_gram",
        sum(when(col("df") > kmvExactDf(s), 1L).otherwise(0L)))
      .filter(col("df") <= kmvExactDf(s))
      .select(col("g"))
    val exact = u.join(okG, Seq("g"), "left_semi")
      .select(col("source").as("sa"), col("g"))
      .join(u.select(col("source").as("sb"), col("g")), Seq("g"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n_exact_inter"))
    // exact-regime test: theta.isNull is true for both the unsaturated
    // pool AND the no-pool (left-join-null) pair, so one predicate
    // covers the empty-source COALESCE path of the oracle
    val exactRegime = col("n_pool") < kmvK || col("theta").isNull
    pairs.join(agg, Seq("sa", "sb"), "left")
      .join(exact, Seq("sa", "sb"), "left")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        coalesce(col("n_exact_inter"), lit(0L)).as("n_exact_inter"),
        when(exactRegime, coalesce(col("m_all"), lit(0L)))
          .otherwise(col("m_below")).as("m"),
        when(exactRegime, coalesce(col("m_all"), lit(0L)))
          .otherwise(when(col("theta") > 0, expr(
            s"(m_below * ((${kmvK - 1} * $kmvDomain) div theta)) " +
              s"div ${kmvK - 1}")))
          .as("est_inter"))
      .orderBy("source_a", "source_b")
  }

  private def kmvIntersectAuditSql =
    s"""WITH $kmvUniverseSql,
       |hh AS (SELECT source, g, $kmvHashSql AS h FROM u),
       |sk AS (
       |  SELECT source, g, h FROM (
       |    SELECT source, g, h, CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY h, g) AS BIGINT) AS rk
       |    FROM hh) WHERE rk <= $kmvK),
       |srcs AS (SELECT DISTINCT source FROM hh),
       |pairs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |pool AS (
       |  SELECT sa, sb, g, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
       |    SELECT p.sa, p.sb, k.g, k.h, 1 AS in_a, 0 AS in_b
       |    FROM pairs p JOIN sk k ON k.source = p.sa
       |    UNION ALL
       |    SELECT p.sa, p.sb, k.g, k.h, 0 AS in_a, 1 AS in_b
       |    FROM pairs p JOIN sk k ON k.source = p.sb)
       |  GROUP BY 1, 2, 3, 4),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY sa, sb
       |    ORDER BY h, g) AS BIGINT) AS rk
       |  FROM pool),
       |ag AS (
       |  SELECT sa, sb, COUNT(*) AS n_pool,
       |    MAX(CASE WHEN rk = $kmvK THEN h END) AS theta,
       |    CAST(SUM(in_a * in_b) AS BIGINT) AS m_all,
       |    CAST(SUM(CASE WHEN rk < $kmvK THEN in_a * in_b ELSE 0 END)
       |      AS BIGINT) AS m_below
       |  FROM ranked WHERE rk <= $kmvK GROUP BY 1, 2),
       |okg AS (SELECT g FROM hh GROUP BY g
       |  HAVING COUNT(*) <= $kmvExactDfDefault),
       |ex AS (
       |  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_exact_inter
       |  FROM hh a JOIN okg USING (g) JOIN hh b
       |    ON a.g = b.g AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT p.sa AS source_a, p.sb AS source_b,
       |  COALESCE(ex.n_exact_inter, 0) AS n_exact_inter,
       |  CASE WHEN ag.n_pool < $kmvK OR ag.theta IS NULL
       |       THEN COALESCE(ag.m_all, 0) ELSE ag.m_below END AS m,
       |  CASE WHEN ag.n_pool < $kmvK OR ag.theta IS NULL
       |       THEN COALESCE(ag.m_all, 0)
       |       WHEN ag.theta > 0 THEN
       |         (ag.m_below * ((${kmvK - 1} * $kmvDomain) // ag.theta))
       |           // ${kmvK - 1}
       |  END AS est_inter
       |FROM pairs p LEFT JOIN ag USING (sa, sb) LEFT JOIN ex
       |  ON p.sa = ex.sa AND p.sb = ex.sb
       |ORDER BY p.sa, p.sb""".stripMargin

  /** The k grid of the KMV sweep (brackets the deployed [[kmvK]] = 32 an
    * octave-squared either side). */
  val kmvKGrid: Seq[Int] = Seq(8, 32, 128)

  /** KMV sketch-size calibration sweep — the memory/accuracy decision
    * for the distinct counter (the cms_width_sweep contract applied to
    * the bottom-k sketch): per candidate k, the corpus-wide estimate
    * from the k-th smallest distinct-gram hash and its exact-milli
    * ratio to the true distinct count. The relative stderr falls as
    * 1/√(k−2), so the sweep shows where extra retained hashes stop
    * buying accuracy.
    *
    * Plan shape: ONE distributed bottom-max(k) TakeOrdered over the
    * cached universe serves every grid point (the rank window then runs
    * over ≤ 128 retained rows); the exact distinct count is the only
    * corpus-sized aggregate. Every grid row appears even if the corpus
    * has fewer than k distinct grams (saturated rows report the exact
    * count — LEFT join the grid). */
  private def kmvKSweep(s: SparkSession, dir: String): DataFrame = {
    val kMax = kmvKGrid.max
    val bottom = kmvUniverse(s, dir).select(col("g"), col("h")).distinct()
      .orderBy(col("h"), col("g")).limit(kMax)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("h"), col("g"))).cast("long"))
    val hks = bottom.select(explode(array(kmvKGrid.map(lit): _*)).as("k"),
        col("rk"), col("h"))
      .filter(col("rk") === col("k"))
      .select(col("k").cast("long").as("k"), col("h").as("h_k"))
    val nAll = kmvUniverse(s, dir).select(col("g")).distinct()
      .agg(count(lit(1)).as("n_exact"))
    nAll.select(explode(array(kmvKGrid.map(k => lit(k.toLong)): _*)).as("k"),
        col("n_exact"))
      .join(hks, Seq("k"), "left")
      .select(col("k"), col("n_exact"), col("h_k"),
        when(col("n_exact") <= col("k"), col("n_exact"))
          .otherwise(when(col("h_k") > 0,
            expr(s"((k - 1) * $kmvDomain) div h_k"))).as("est"))
      .withColumn("ratio_milli",
        expr("CASE WHEN n_exact > 0 THEN (1000 * est) div n_exact END"))
      .orderBy("k")
  }

  private def kmvKSweepSql =
    s"""WITH $kmvUniverseSql,
       |hh AS (SELECT DISTINCT g, $kmvHashSql AS h FROM u),
       |bottom AS (
       |  SELECT h, CAST(row_number() OVER (ORDER BY h, g) AS BIGINT) AS rk
       |  FROM (SELECT g, h FROM hh ORDER BY h, g LIMIT ${kmvKGrid.max})),
       |hks AS (
       |  SELECT CAST(k AS BIGINT) AS k, h AS h_k
       |  FROM bottom, UNNEST([${kmvKGrid.mkString(", ")}]) t(k)
       |  WHERE rk = k),
       |na AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS n_exact FROM hh),
       |grid AS (
       |  SELECT CAST(k AS BIGINT) AS k, n_exact
       |  FROM na, UNNEST([${kmvKGrid.mkString(", ")}]) t(k))
       |SELECT g.k, g.n_exact, hks.h_k,
       |  CASE WHEN g.n_exact <= g.k THEN g.n_exact
       |       WHEN hks.h_k > 0 THEN ((g.k - 1) * $kmvDomain) // hks.h_k
       |  END AS est,
       |  CASE WHEN g.n_exact > 0 THEN
       |    (1000 * (CASE WHEN g.n_exact <= g.k THEN g.n_exact
       |       WHEN hks.h_k > 0 THEN ((g.k - 1) * $kmvDomain) // hks.h_k END))
       |      // g.n_exact
       |  END AS ratio_milli
       |FROM grid g LEFT JOIN hks ON g.k = hks.k
       |ORDER BY g.k""".stripMargin

  /** AMS estimator count (the paper's s₂; mean over these — with 8 the
    * relative stderr is √2/√8 = 50 %, honest for an audit; a deployment
    * scales d for its ε). */
  val amsDepth = 8

  /** AMS/Tug-of-War second-moment audit (Alon–Matias–Szegedy 1996):
    * F₂ = Σ_g cnt(g)² — the SELF-JOIN SIZE on the gram key, the quantity
    * `join_size_probe` computes exactly for its pre-flight and every
    * query optimizer estimates — sketched by [[amsDepth]] ±1-signed
    * sums X_i = Σ_g s_i(g)·cnt(g) with est = mean X_i². Signs are
    * md5-parity (engine-portable), every accumulation is exact int64,
    * and the estimate is one integer division. The sketch is LINEAR, so
    * per-source sketches compose by ADDITION — `merge_exact` audits
    * Σ_sources X_i(src) = X_i(corpus) per estimator (structurally true;
    * a hash-green row is the cross-engine proof, the kmv_merge_audit
    * contract). Completes the frequency-moment story: F₀ = KMV/HLL,
    * F₂ = AMS, heavy hitters = CMS/Misra–Gries.
    *
    * Scale shape: rides the cached per-source count relation; the
    * sketch state is d numbers per shard/source at any corpus size; the
    * exact F₂ (the audit's baseline) is the only vocabulary-sized
    * aggregate, and nothing is ever pair-wise — the point: the true
    * self-join size is quadratic to MATERIALIZE but constant-state to
    * sketch. */
  private def amsF2Audit(s: SparkSession, dir: String): DataFrame = {
    val bySrc = gramCountsBySrc(s, dir)
    val gc = gramCounts(s, dir)
    def sign(g: Column, i: Column): Column =
      lit(1L) - lit(2L) * (conv(substring(md5(
        concat(i.cast("string"), lit(":"), g)), 1, 8), 16, 10)
        .cast("long") % 2L)
    val est = gc.select(col("g"), col("cnt"),
        explode(sequence(lit(0), lit(amsDepth - 1))).as("i"))
      .groupBy(col("i"))
      .agg(sum(sign(col("g"), col("i")) * col("cnt")).as("x"))
      .agg(sum(col("x") * col("x")).as("sx2"),
        min(col("x") * col("x")).as("x2_min"),
        max(col("x") * col("x")).as("x2_max"))
    val merged = bySrc.select(col("source"), col("g"), col("cnt"),
        explode(sequence(lit(0), lit(amsDepth - 1))).as("i"))
      .groupBy(col("source"), col("i"))
      .agg(sum(sign(col("g"), col("i")) * col("cnt")).as("xs"))
      .groupBy(col("i")).agg(sum(col("xs")).as("xm"))
      .agg(sum(col("xm") * col("xm")).as("sx2m"))
    val base = gc.agg(sum(col("cnt")).as("n_grams"),
      count(lit(1)).as("n_distinct"),
      sum(col("cnt") * col("cnt")).as("f2_exact"))
    base.crossJoin(broadcast(est)).crossJoin(broadcast(merged))
      .select(col("n_grams"), col("n_distinct"), col("f2_exact"),
        expr(s"sx2 div $amsDepth").as("est"),
        col("x2_min"), col("x2_max"),
        expr(s"CASE WHEN f2_exact > 0 THEN (1000 * (sx2 div $amsDepth))" +
          " div f2_exact END").as("ratio_milli"),
        (col("sx2") <=> col("sx2m")).as("merge_exact"))
  }

  private def amsF2AuditSql = {
    val signSql =
      "(1 - 2 * (CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || g), 1, 8) AS BIGINT) % 2))"
    s"""WITH bysrc AS (
       |  SELECT COALESCE(source, '') AS source, s AS g, COUNT(*) AS cnt
       |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents) d,
       |  UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)
       |  GROUP BY 1, 2),
       |gc AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS cnt FROM bysrc GROUP BY 1),
       |xs AS (
       |  SELECT i, CAST(SUM($signSql * cnt) AS BIGINT) AS x
       |  FROM gc, UNNEST(range(0, $amsDepth)) t(i) GROUP BY 1),
       |est AS (
       |  SELECT CAST(SUM(x * x) AS BIGINT) AS sx2,
       |    MIN(x * x) AS x2_min, MAX(x * x) AS x2_max
       |  FROM xs),
       |xsm AS (
       |  SELECT i, CAST(SUM(xsrc) AS BIGINT) AS xm FROM (
       |    SELECT source, i, CAST(SUM($signSql * cnt) AS BIGINT) AS xsrc
       |    FROM bysrc, UNNEST(range(0, $amsDepth)) t(i) GROUP BY 1, 2)
       |  GROUP BY 1),
       |mg AS (SELECT CAST(SUM(xm * xm) AS BIGINT) AS sx2m FROM xsm),
       |base AS (
       |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_grams,
       |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
       |    CAST(SUM(cnt * cnt) AS BIGINT) AS f2_exact
       |  FROM gc)
       |SELECT n_grams, n_distinct, f2_exact,
       |  sx2 // $amsDepth AS est, x2_min, x2_max,
       |  CASE WHEN f2_exact > 0
       |    THEN (1000 * (sx2 // $amsDepth)) // f2_exact END AS ratio_milli,
       |  sx2 IS NOT DISTINCT FROM sx2m AS merge_exact
       |FROM base CROSS JOIN est CROSS JOIN mg""".stripMargin
  }

  // ------------------------------------------------ dyadic rank/quantile

  /** Dyadic levels of the rank sketch — value universe [0, 2^16). */
  val rankLevels = 16
  /** Largest representable value; longer docs clip into this bucket. */
  val rankVMax = 65535L
  /** Quantile grid audited (per-mille). */
  val rankQGrid: Seq[Long] = Seq(100L, 250L, 500L, 750L, 900L, 990L)
  /** Dense cell count of the packed sketch: levels × depth × width. */
  val rankCells: Int = rankLevels * cmsDepth * cmsWidth.toInt

  /** Hash key of a dyadic node — level:prefix, the ONE string both
    * engines and the recount spec md5. */
  private def rankKey(l: Column, p: Column): Column =
    concat(l.cast("string"), lit(":"), p.cast("string"))

  /** Per-source doc token-length counts (source, v, cnt), v clipped into
    * the universe, NULL source bucketed as '' — the finer grain the
    * merge-law audit shards on; the corpus-level [[rankValCounts]]
    * derives from it, so the session pays ONE token-scale pass for the
    * whole rank-sketch family (the gramCountsBySrc discipline). */
  private def rankValCountsBySrc(s: SparkSession, dir: String): DataFrame =
    Util.cachedRelation(s, dir, "rankValCountsBySrc", "")(
      t(s, dir, "documents").where(col("text").isNotNull)
        .select(coalesce(col("source"), lit("")).as("source"),
          least(size(split(col("text"), " ")).cast("long"),
            lit(rankVMax)).as("v"))
        .groupBy("source", "v").agg(count(lit(1)).as("cnt")))

  /** Doc token-length counts (v, cnt), v clipped into the universe —
    * the audited value distribution (the per-document length histogram a
    * packing/curriculum pipeline needs percentiles of). Registry-cached:
    * the exact side, the sketch build and the grid all re-read it. */
  private def rankValCounts(s: SparkSession, dir: String): DataFrame =
    Util.cachedRelation(s, dir, "rankValCounts", "")(
      rankValCountsBySrc(s, dir)
        .groupBy("v").agg(sum(col("cnt")).as("cnt")))

  /** The (level, seed-row) dimension relation of the dyadic sketch —
    * rankLevels × cmsDepth rows, broadcast into the cell builds so the
    * per-row index math is ONE md5 expression instead of the 64 inlined
    * trees of [[rankCellIdxArray]] (whose generated hashAgg function
    * exceeded janino's method limits: ERROR CodeGenerator + interpreted
    * fallback, and the failed giant-class compile re-ran on every
    * action — the round-19 profile's cms_rank cost). Same cells: the
    * dimension join enumerates exactly the (l, i) pairs the array
    * enumerated, through the same [[cmsBucket]]/[[rankKey]] math. */
  private def rankDims(s: SparkSession): DataFrame = {
    import s.implicits._
    (for { l <- 0 until rankLevels; i <- 0 until cmsDepth }
      yield (l.toLong, i.toLong)).toDF("l", "i0")
  }

  /** Packed cell index of (v, l, i0) rows — the dynamic single-md5 twin
    * of one [[rankCellIdxArray]] element: (l·d + i)·w + bucket_i(l:v≫l).
    * The seed prefix renders identically (i0 ∈ 0..3 casts to the same
    * "i:" string the literal form embeds), so indices are bit-equal. */
  private def rankCellIdxDyn: Column =
    (col("l") * cmsDepth + col("i0")) * cmsWidth +
      conv(substring(md5(concat(col("i0").cast("string"), lit(":"),
        rankKey(col("l"), expr("shiftright(v, CAST(l AS INT))")))), 1, 8),
        16, 10).cast("long") % cmsWidth

  /** Corpus sketch cells (i, cnt) from a (v, cnt) histogram — the build
    * half shared by the audit and the merge audit's corpus side. */
  private def rankCellsOf(vc: DataFrame): DataFrame =
    vc.crossJoin(broadcast(rankDims(vc.sparkSession)))
      .select(col("cnt"), rankCellIdxDyn.as("i"))
      .groupBy(col("i")).agg(sum(col("cnt")).as("cnt"))

  /** Dense-pack a (i, cnt) cell relation into one [[rankCells]]-long
    * array column named `arr` (grouped by any carried key columns). */
  private def rankDensePack(cells: DataFrame, keys: Seq[String]): DataFrame = {
    val grouped =
      if (keys.isEmpty) cells.agg(
        array_sort(collect_list(struct(col("i"), col("cnt")))).as("ws"))
      else cells.groupBy(keys.map(col): _*).agg(
        array_sort(collect_list(struct(col("i"), col("cnt")))).as("ws"))
    grouped.select(keys.map(col) :+ expr(
        """aggregate(ws, CAST(array() AS ARRAY<BIGINT>), (acc, w) ->
          |  concat(acc,
          |    array_repeat(CAST(0 AS BIGINT), CAST(w.i AS INT) - size(acc)),
          |    array(w.cnt)))""".stripMargin).as("partial"): _*)
      .select(keys.map(col) :+ concat(col("partial"), expr(
        s"array_repeat(CAST(0 AS BIGINT), $rankCells - size(partial))"))
        .as("arr"): _*)
  }

  /** Packed dyadic cell indices of a value column — the ONE copy of the
    * level/seed hash-and-pack math ((l·d + seed)·w + bucket) shared by
    * the batch build, the probes and the streaming twin
    * ([[graft.streaming.StreamingPipeline.rankCellStream]]): build/probe
    * drift would silently break counter additivity (the bloomPositions
    * discipline). One array of levels·depth indices per value. */
  def rankCellIdxArray(v: Column): Column =
    array((for {
      l <- 0 until rankLevels
      i <- 0 until cmsDepth
    } yield lit((l.toLong * cmsDepth + i) * cmsWidth) +
      cmsBucket(i, rankKey(lit(l), shiftright(v, l)))): _*)

  /** Per-doc packed cell indices of a doc frame's token lengths — the
    * STREAMING twin's projection (a stream cannot pre-aggregate to the
    * length histogram; cell counters are sums, so per-occurrence updates
    * and cnt-weighted batch aggregation land on identical state). */
  def rankCellKeys(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(least(size(split(col("text"), " ")).cast("long"),
        lit(rankVMax)).as("v"))
      .select(explode(rankCellIdxArray(col("v"))).as("i"))

  /** Point query of dyadic node (level `l`, prefix column `p`) against
    * the dense-packed cell array: min over the d seed rows. */
  private def rankPointQ(arr: Column, l: Int, p: Column): Column =
    (0 until cmsDepth).map { i =>
      element_at(arr, (lit((l.toLong * cmsDepth + i) * cmsWidth) +
        cmsBucket(i, rankKey(lit(l), p)) + 1L).cast("int"))
    }.reduce(least(_, _))

  /** Estimated rank (# values strictly below `x`, x ∈ [0, 2^16)) via the
    * canonical dyadic decomposition of [0, x): one point query per set
    * bit of x — the level-ℓ interval starting at x with bits ≤ ℓ
    * cleared, whose prefix is 2·(x >> (ℓ+1)). */
  private def rankEstExpr(arr: Column, x: Column): Column =
    (0 until rankLevels).map { l =>
      when(shiftright(x, l).bitwiseAND(lit(1L)) === 1L,
        rankPointQ(arr, l, shiftright(x, l + 1) * 2L)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** [[rankPointQ]] as a SQL fragment with DYNAMIC level/prefix
    * subexpressions — the HOF-descent building block. Identical math:
    * min over the [[cmsDepth]] seed rows of the dense-array probe at
    * (l·d + i)·w + bucket_i("l:p"). */
  private def pointqSqlDyn(l: String, p: String): String =
    (0 until cmsDepth).map { i =>
      s"element_at(arr, CAST(($l * $cmsDepth + $i) * $cmsWidth + " +
        s"CAST(conv(substring(md5('$i:' || CAST($l AS STRING) || ':' || " +
        s"CAST($p AS STRING)), 1, 8), 16, 10) AS BIGINT) % $cmsWidth + 1 " +
        "AS INT))"
    }.mkString("least(", ", ", ")")

  /** The 16-level greedy root-to-leaf descent as ONE `aggregate()`
    * higher-order-function expression over the level sequence, returning
    * the leaf value p. Replaces the former 16 chained projections: those
    * inlined 64 md5 probe trees into the enclosing whole-stage-codegen
    * function, which grew beyond the JVM's 64 KB method limit ("Code
    * grows beyond 64 KB", ERROR CodeGenerator) — the plan then ran
    * interpreted anyway AND re-attempted the failed giant compile on
    * every action (janino failures are not cached). The HOF is
    * CodegenFallback by design: interpreted once per row over a ≤
    * |sources|-row relation, with no giant class to compile. State is
    * (p, cur) exactly as the loop carried it; the probe value is the
    * same [[pointqSqlDyn]] expression evaluated at (l, 2p), duplicated
    * across the branch arms (deterministic, so recomputation is exact).
    * Requires columns `arr` and `r` in scope. */
  private def rankDescentExpr: Column = {
    val pq = pointqSqlDyn("l", "(2 * st.p)")
    expr(
      s"""aggregate(sequence(${rankLevels - 1}, 0, -1),
         |  named_struct('p', CAST(0 AS BIGINT), 'cur', CAST(0 AS BIGINT)),
         |  (st, l) -> CASE WHEN st.cur + $pq < r
         |    THEN named_struct('p', 2 * st.p + 1, 'cur', st.cur + $pq)
         |    ELSE named_struct('p', 2 * st.p, 'cur', st.cur) END).p"""
        .stripMargin)
  }

  /** [[rankEstExpr]] as one `aggregate()` HOF over the level sequence —
    * same 64-KB-method rationale as [[rankDescentExpr]], same dyadic
    * decomposition values (NULL handling stays with the caller's outer
    * `when`, exactly as the inlined form relied on it). */
  private def rankEstHofExpr(x: String): Column =
    expr(
      s"""aggregate(sequence(0, ${rankLevels - 1}), CAST(0 AS BIGINT),
         |  (acc, l) -> acc + CASE WHEN (shiftright($x, l) & 1) = 1
         |    THEN ${pointqSqlDyn("l", s"(2 * shiftright($x, l + 1))")}
         |    ELSE CAST(0 AS BIGINT) END)""".stripMargin)

  /** Dyadic Count-Min rank/quantile sketch audit — the QUANTILE member
    * of the mergeable-sketch tier (Cormode & Muthukrishnan 2005 §4,
    * "range queries and quantiles": one CMS per dyadic level of a
    * bounded value universe; rank(x) = Σ of ≤ log U point queries over
    * the canonical decomposition of [0, x); quantile = the greedy root-
    * to-leaf descent inverting it). The audited values are per-document
    * token lengths — the distribution a sequence-packing / curriculum
    * pipeline needs percentiles of without a global sort.
    *
    * Per q ∈ [[rankQGrid]] (per-mille): the exact quantile value (rank-
    * selection semantics, the value at ascending position ⌈q·n/1000⌉),
    * the sketch's descent value, the exact strict rank below the exact
    * quantile and its dyadic estimate. BOTH one-sided laws are theorems
    * and emitted as audited booleans, so a hash-green row pins them
    * cross-engine: point queries never underestimate ⇒ `rank_ok`
    * (est_rank ≥ exact_rank), and the descent stops at the first leaf
    * whose estimated rank reaches the target — pointwise-dominating
    * estimates reach it no later ⇒ `v_ok` (est_v ≤ exact_v).
    *
    * Scale shape: the only corpus-scale work is ONE map-side-combining
    * length histogram (no explode — one length per document); the sketch
    * is a constant [[rankCells]]-cell array (levels·d·w = 16 384) built
    * vocabulary-sized from the cached histogram and dense-packed into
    * one broadcast row (the bloom dense-array lesson: element_at on a
    * map is a linear scan, on an array O(1)). Cells are sums, so
    * shards/streams merge by addition like every CMS. The descent is 16
    * chained projections over a |grid|-row relation — each level's
    * md5 probes materialize once per level (CollapseProject keeps
    * non-cheap multiply-referenced expressions in their own project). */
  private def cmsRankAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vc = rankValCounts(s, dir)
    // dense-packed cells: explode the histogram ×levels ×depth through
    // the ONE shared index math, sum per cell, pack into one array row
    val arr = rankDensePack(rankCellsOf(vc), Seq.empty)
    val nRow = vc.agg(coalesce(sum(col("cnt")), lit(0L)).as("n_docs"))
    val cum = vc.select(col("v"), col("cnt"),
      sum(col("cnt")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"))
    val grid = rankQGrid.toDF("q_milli")
      .crossJoin(broadcast(nRow))
      .withColumn("r", expr("(q_milli * n_docs + 999) div 1000"))
    val exact = grid.join(cum, col("cum") >= col("r"), "left")
      .groupBy("q_milli", "n_docs", "r")
      .agg(min(col("v")).as("exact_v"))
    val withRank = exact.join(
        cum.select(col("v"), (col("cum") - col("cnt")).as("exact_rank")),
        col("v") === col("exact_v"), "left")
      .drop("v")
    // descent + rank estimate as interpreted HOF expressions — see
    // rankDescentExpr: the chained-projection form blew the 64 KB
    // codegen method limit and re-ran the failed compile per action
    val d = withRank.crossJoin(broadcast(arr))
      .withColumn("p", rankDescentExpr)
    val estRank = when(col("exact_v").isNull, lit(null).cast("long"))
      .otherwise(rankEstHofExpr("exact_v"))
    val estV = when(col("n_docs") === 0L, lit(null).cast("long"))
      .otherwise(col("p"))
    d.withColumn("est_rank", estRank)
      .select(col("q_milli"), col("n_docs"), col("exact_v"),
        estV.as("est_v"),
        (estV <= col("exact_v")).as("v_ok"),
        col("exact_rank"),
        col("est_rank"),
        (col("est_rank") - col("exact_rank")).as("rank_over"),
        (col("est_rank") >= col("exact_rank")).as("rank_ok"))
      .orderBy("q_milli")
  }

  private def cmsRankAuditSql: String = {
    def keySql(l: String, p: String) =
      s"CAST($l AS VARCHAR) || ':' || CAST($p AS VARCHAR)"
    def bucketSql(i: Int, key: String) =
      s"CAST('0x' || substr(md5('$i:' || $key), 1, 8) AS BIGINT) % $cmsWidth"
    def pointqSql(l: String, p: String) =
      (0 until cmsDepth).map { i =>
        s"list_extract(arr, ($l * $cmsDepth + $i) * $cmsWidth + " +
          s"${bucketSql(i, keySql(l, p))} + 1)"
      }.mkString("LEAST(", ",\n      ", ")")
    val cellArms = (0 until cmsDepth).map { i =>
      s"SELECT (l * $cmsDepth + $i) * $cmsWidth + " +
        s"${bucketSql(i, keySql("l", "p"))} AS i, cnt FROM lv"
    }.mkString("\n  UNION ALL ")
    val estRankSql = (0 until rankLevels).map { l =>
      s"CASE WHEN ((exact_v >> $l) & 1) = 1 THEN " +
        s"${pointqSql(l.toString, s"2 * (exact_v >> ${l + 1})")} ELSE 0 END"
    }.mkString("(", "\n    + ", ")")
    val descent = (rankLevels - 1) to 0 by -1
    val descentCtes = descent.map { lvl =>
      s"""d$lvl AS (
         |  SELECT q_milli, n_docs, exact_v, exact_rank, est_rank, r,
         |    CASE WHEN cur + pq < r THEN 2 * p + 1 ELSE 2 * p END AS p,
         |    CASE WHEN cur + pq < r THEN cur + pq ELSE cur END AS cur
         |  FROM (SELECT d${lvl + 1}.*, ${pointqSql(lvl.toString, "2 * p")} AS pq
         |        FROM d${lvl + 1}, arr) s)""".stripMargin
    }.mkString(",\n")
    s"""WITH vals AS (
       |  SELECT LEAST(len(string_split(text, ' ')), $rankVMax) AS v
       |  FROM documents WHERE text IS NOT NULL),
       |vc AS MATERIALIZED (SELECT v, COUNT(*) AS cnt FROM vals GROUP BY 1),
       |lv AS (SELECT cnt, l, (v >> l) AS p
       |       FROM vc, UNNEST(range(0, $rankLevels)) t(l)),
       |cells AS (
       |  SELECT i, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
       |  $cellArms) GROUP BY 1),
       |arr AS MATERIALIZED (
       |  SELECT list(COALESCE(c.cnt, 0) ORDER BY r.i) AS arr
       |  FROM range(0, $rankCells) r(i) LEFT JOIN cells c ON r.i = c.i),
       |n AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_docs FROM vc),
       |cum AS MATERIALIZED (
       |  SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
       |  FROM vc),
       |grid AS (SELECT CAST(UNNEST([${rankQGrid.mkString(", ")}]) AS BIGINT)
       |         AS q_milli),
       |g2 AS (SELECT q_milli, n_docs,
       |         CAST((q_milli * n_docs + 999) // 1000 AS BIGINT) AS r
       |       FROM grid, n),
       |ex AS (SELECT q_milli, n_docs, r, MIN(c.v) AS exact_v
       |       FROM g2 LEFT JOIN cum c ON c.cum >= g2.r GROUP BY 1, 2, 3),
       |er AS (
       |  SELECT ex.q_milli, ex.n_docs, ex.r, ex.exact_v,
       |    CAST(c.cum - c.cnt AS BIGINT) AS exact_rank,
       |    CASE WHEN ex.exact_v IS NULL THEN NULL ELSE CAST($estRankSql
       |      AS BIGINT) END AS est_rank
       |  FROM ex LEFT JOIN cum c ON c.v = ex.exact_v, arr),
       |d$rankLevels AS (
       |  SELECT q_milli, n_docs, exact_v, exact_rank, est_rank, r,
       |    CAST(0 AS BIGINT) AS p, CAST(0 AS BIGINT) AS cur FROM er),
       |$descentCtes
       |SELECT q_milli, n_docs, exact_v,
       |  CASE WHEN n_docs = 0 THEN NULL ELSE p END AS est_v,
       |  CASE WHEN n_docs = 0 THEN NULL ELSE p END <= exact_v AS v_ok,
       |  exact_rank, est_rank,
       |  est_rank - exact_rank AS rank_over,
       |  est_rank >= exact_rank AS rank_ok
       |FROM d0 ORDER BY q_milli""".stripMargin
  }

  /** Rank-sketch MERGE-law audit — the shard story of [[cmsRankAudit]]
    * (every sketch family here carries one: kmv_merge_audit, the HLL
    * register merge, ams_f2_audit's linearity column): cells are sums,
    * so per-SOURCE sketches built independently must sum — cell for
    * cell — to the corpus sketch built in one pass; `merge_exact` audits
    * exactly that (two different aggregation paths over the same packed
    * index math), hash-proven cross-engine. Per source the audit then
    * serves the shard-local question a 100 TB deployment actually asks
    * of a merged quantile sketch — the MEDIAN doc length: exact rank-
    * selection median vs the sketch descent from the source's own cells,
    * both one-sided laws emitted per row like the corpus audit.
    *
    * Scale shape: rides the ONE cached per-source length histogram;
    * sketch state is |sources| dense [[rankCells]]-cell arrays (a few MB
    * at any corpus size); the descent is the same 16 chained projections
    * over |sources| rows. */
  private def cmsRankMergeAudit(s: SparkSession, dir: String): DataFrame = {
    val vcs = rankValCountsBySrc(s, dir)
    // dimension-join cell build (see rankCellIdxDyn): one md5 per row,
    // codegen-compilable — the exploded 64-tree array form made this
    // hashAgg fail janino and run interpreted, with the failed compile
    // re-attempted per action
    val cs = vcs.crossJoin(broadcast(rankDims(s)))
      .select(col("source"), col("cnt"), rankCellIdxDyn.as("i"))
      .groupBy(col("source"), col("i")).agg(sum(col("cnt")).as("cnt"))
    // merge law: per-source cells summed ≡ corpus cells built in one pass
    val mergeOk = cs.groupBy(col("i")).agg(sum(col("cnt")).as("mcnt"))
      .join(rankCellsOf(rankValCounts(s, dir)), Seq("i"), "full_outer")
      .agg(coalesce(bool_and(
        coalesce(col("mcnt"), lit(0L)) === coalesce(col("cnt"), lit(0L))),
        lit(true)).as("merge_exact"))
    val arrs = rankDensePack(cs, Seq("source"))
    val n = vcs.groupBy("source").agg(sum(col("cnt")).as("n_docs"))
    val w = Window.partitionBy(col("src2")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vcs.select(col("source").as("src2"), col("v"), col("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
    val grid = n.withColumn("r", expr("(500 * n_docs + 999) div 1000"))
    val exact = grid
      .join(cum, col("src2") === col("source") && col("cum") >= col("r"),
        "left")
      .groupBy("source", "n_docs", "r")
      .agg(min(col("v")).as("exact_med"))
    val withRank = exact.join(
        cum.select(col("src2"), col("v"),
          (col("cum") - col("cnt")).as("exact_rank")),
        col("src2") === col("source") && col("v") === col("exact_med"),
        "left")
      .drop("src2", "v")
    // same HOF descent/estimate as the corpus audit (rankDescentExpr):
    // one interpreted expression per row instead of 16 chained projects
    // whose codegen exceeded the 64 KB method limit
    val d = withRank.join(arrs, "source")
      .withColumn("p", rankDescentExpr)
    val estRank = when(col("exact_med").isNull, lit(null).cast("long"))
      .otherwise(rankEstHofExpr("exact_med"))
    d.withColumn("est_rank", estRank)
      .crossJoin(broadcast(mergeOk))
      .select(col("source"), col("n_docs"), col("exact_med"),
        col("p").as("est_med"),
        (col("p") <= col("exact_med")).as("v_ok"),
        col("exact_rank"),
        col("est_rank"),
        (col("est_rank") - col("exact_rank")).as("rank_over"),
        (col("est_rank") >= col("exact_rank")).as("rank_ok"),
        col("merge_exact"))
      .orderBy("source")
  }

  private def cmsRankMergeAuditSql: String = {
    def keySql(l: String, p: String) =
      s"CAST($l AS VARCHAR) || ':' || CAST($p AS VARCHAR)"
    def bucketSql(i: Int, key: String) =
      s"CAST('0x' || substr(md5('$i:' || $key), 1, 8) AS BIGINT) % $cmsWidth"
    def pointqSql(l: String, p: String) =
      (0 until cmsDepth).map { i =>
        s"list_extract(arr, ($l * $cmsDepth + $i) * $cmsWidth + " +
          s"${bucketSql(i, keySql(l, p))} + 1)"
      }.mkString("LEAST(", ",\n      ", ")")
    val cellArms = (0 until cmsDepth).map { i =>
      s"SELECT source, (l * $cmsDepth + $i) * $cmsWidth + " +
        s"${bucketSql(i, keySql("l", "p"))} AS i, cnt FROM lv"
    }.mkString("\n  UNION ALL ")
    val estRankSql = (0 until rankLevels).map { l =>
      s"CASE WHEN ((exact_med >> $l) & 1) = 1 THEN " +
        s"${pointqSql(l.toString, s"2 * (exact_med >> ${l + 1})")} ELSE 0 END"
    }.mkString("(", "\n    + ", ")")
    val descentCtes = ((rankLevels - 1) to 0 by -1).map { lvl =>
      s"""d$lvl AS (
         |  SELECT source, n_docs, exact_med, exact_rank, est_rank, r, arr,
         |    CASE WHEN cur + pq < r THEN 2 * p + 1 ELSE 2 * p END AS p,
         |    CASE WHEN cur + pq < r THEN cur + pq ELSE cur END AS cur
         |  FROM (SELECT d${lvl + 1}.*, ${pointqSql(lvl.toString, "2 * p")} AS pq
         |        FROM d${lvl + 1}) s)""".stripMargin
    }.mkString(",\n")
    s"""WITH vcs AS MATERIALIZED (
       |  SELECT COALESCE(source, '') AS source,
       |    LEAST(len(string_split(text, ' ')), $rankVMax) AS v,
       |    COUNT(*) AS cnt
       |  FROM documents WHERE text IS NOT NULL GROUP BY 1, 2),
       |lv AS (SELECT source, cnt, l, (v >> l) AS p
       |       FROM vcs, UNNEST(range(0, $rankLevels)) t(l)),
       |cs AS MATERIALIZED (
       |  SELECT source, i, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
       |  $cellArms) GROUP BY 1, 2),
       |lvc AS (SELECT cnt, l, (v >> l) AS p
       |        FROM (SELECT v, SUM(cnt) AS cnt FROM vcs GROUP BY 1) vc,
       |        UNNEST(range(0, $rankLevels)) t(l)),
       |corpuscells AS (
       |  SELECT i, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
       |  ${cellArms.replace("FROM lv", "FROM lvc")
                    .replace("SELECT source, (", "SELECT (")}) GROUP BY 1),
       |merged AS (
       |  SELECT i, CAST(SUM(cnt) AS BIGINT) AS mcnt FROM cs GROUP BY 1),
       |mergeok AS (
       |  SELECT COALESCE(bool_and(
       |    COALESCE(m.mcnt, 0) = COALESCE(c.cnt, 0)), TRUE) AS merge_exact
       |  FROM merged m FULL OUTER JOIN corpuscells c USING (i)),
       |arrs AS MATERIALIZED (
       |  SELECT s.source, list(COALESCE(c.cnt, 0) ORDER BY r.i) AS arr
       |  FROM (SELECT DISTINCT source FROM vcs) s
       |  CROSS JOIN range(0, $rankCells) r(i)
       |  LEFT JOIN cs c ON c.source = s.source AND c.i = r.i
       |  GROUP BY s.source),
       |n AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_docs
       |      FROM vcs GROUP BY 1),
       |cum AS MATERIALIZED (
       |  SELECT source AS src2, v, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY v)
       |      AS BIGINT) AS cum
       |  FROM vcs),
       |grid AS (SELECT source, n_docs,
       |           CAST((500 * n_docs + 999) // 1000 AS BIGINT) AS r
       |         FROM n),
       |ex AS (SELECT g.source, g.n_docs, g.r, MIN(c.v) AS exact_med
       |       FROM grid g LEFT JOIN cum c
       |         ON c.src2 = g.source AND c.cum >= g.r
       |       GROUP BY 1, 2, 3),
       |er AS (
       |  SELECT ex.source, ex.n_docs, ex.r, ex.exact_med, a.arr,
       |    CAST(c.cum - c.cnt AS BIGINT) AS exact_rank,
       |    CASE WHEN ex.exact_med IS NULL THEN NULL ELSE CAST($estRankSql
       |      AS BIGINT) END AS est_rank
       |  FROM ex JOIN arrs a USING (source)
       |  LEFT JOIN cum c ON c.src2 = ex.source AND c.v = ex.exact_med),
       |d$rankLevels AS (
       |  SELECT source, n_docs, exact_med, exact_rank, est_rank, r, arr,
       |    CAST(0 AS BIGINT) AS p, CAST(0 AS BIGINT) AS cur FROM er),
       |$descentCtes
       |SELECT source, n_docs, exact_med, p AS est_med,
       |  p <= exact_med AS v_ok,
       |  exact_rank, est_rank,
       |  est_rank - exact_rank AS rank_over,
       |  est_rank >= exact_rank AS rank_ok,
       |  merge_exact
       |FROM d0, mergeok ORDER BY source""".stripMargin
  }

  // ------------------------------------------------ CountSketch (signed)

  /** CountSketch depth (signed counter rows) — ODD, so the median
    * estimate is an order statistic: an exact int64 both engines hold
    * identically, never an interpolated midpoint. */
  val csDepth = 5
  /** CountSketch width — matches [[cmsWidth]] so the two frequency
    * sketches see the same collision regime and the audit's CMS
    * column is an apples-to-apples comparison. */
  val csWidth = 256L
  /** Keys audited against their exact counts. */
  val csTopK = 20

  /** u32 md5 bucket of a gram under signed-sketch seed row `i` — the
    * `cs` seed prefix keeps the rows independent of the CMS family's
    * unprefixed seeds. */
  private def csBucket(i: Int, g: Column): Column =
    conv(substring(md5(concat(lit(s"cs$i:"), g)), 1, 8), 16, 10)
      .cast("long") % csWidth
  private def csBucketSql(i: Int, g: String): String =
    s"CAST('0x' || substr(md5('cs$i:' || $g), 1, 8) AS BIGINT) % $csWidth"

  /** ±1 md5-parity sign of a gram under seed row `i` (the AMS sign
    * idiom, `css` seed space). */
  private def csSign(i: Int, g: Column): Column =
    lit(1L) - lit(2L) * (conv(substring(md5(
      concat(lit(s"css$i:"), g)), 1, 8), 16, 10).cast("long") % 2L)
  private def csSignSql(i: Int, g: String): String =
    s"(1 - 2 * (CAST('0x' || substr(md5('css$i:' || $g), 1, 8) AS BIGINT) % 2))"

  /** Signed (row, bucket, sgn) CMS cell keys of a doc frame's trigram
    * occurrences — the STREAMING twin's projection
    * ([[graft.streaming.StreamingPipeline.countSketchStream]]; a stream
    * cannot pre-aggregate to counts). The batch build aggregates the
    * cached count relation through the SAME [[csBucket]]/[[csSign]]
    * definitions — the one copy whose drift would silently break signed
    * counter additivity (the cmsCellKeys discipline). */
  def csCellKeys(docs: DataFrame): DataFrame =
    docs.select(split(col("text"), " ").as("w"))
      .select(explode(CorpusOps.wordGrams(col("w"), 3)).as("g"))
      .select(explode(array((0 until csDepth).map(i =>
        struct(lit(i).as("row"), csBucket(i, col("g")).as("bucket"),
          csSign(i, col("g")).as("sgn"))): _*)).as("c"))
      .select(col("c.row").as("row"), col("c.bucket").as("bucket"),
        col("c.sgn").as("sgn"))

  /** CountSketch audit (Charikar–Chen–Farach-Colton 2002): the SIGNED
    * frequency sketch — C[i][b] = Σ_g s_i(g)·cnt(g) over grams with
    * bucket_i(g) = b, per-key estimate = MEDIAN over rows of
    * s_i(g)·C[i][bucket_i(g)]. Where CMS is biased one-sided (collisions
    * only ADD), CountSketch collisions carry random signs, so the
    * estimate is unbiased and the error two-sided — the audit emits the
    * same top-[[csTopK]] grams with BOTH estimates side by side
    * (`err` signed vs `cms_over` ≥ 0, `cms_ok` pinning the one-sided
    * law), which is the measured version of the textbook comparison.
    * The median over an ODD [[csDepth]] is an order statistic
    * (`element_at(sort_array(...), 3)`), exact int64 on both engines.
    *
    * Merge law: signed counters are LINEAR, so per-source sketches sum
    * to the corpus sketch cell-by-cell — `merge_exact` recomputes every
    * cell from the per-source grain and pins equality cross-engine (the
    * AMS linearity discipline at cell granularity).
    *
    * Scale shape: both counter tables build from the session-cached
    * vocabulary-sized count relation (Σ over occurrences ≡ cnt-weighted
    * Σ over distinct grams) into d·w = 1280 cells regardless of corpus
    * size; the merge side adds one |sources|·d·w-row aggregate; probes
    * broadcast-join k keys against the constant-size cells. */
  private def countsketchTopkAudit(s: SparkSession, dir: String): DataFrame = {
    val gc = gramCounts(s, dir)
    val cells = gc.select(col("cnt"), explode(array((0 until csDepth).map(i =>
        struct(lit(i).as("row"), csBucket(i, col("g")).as("bucket"),
          csSign(i, col("g")).as("sgn"))): _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(sum(col("c.sgn") * col("cnt")).as("cnt"))
    // linearity audit: rebuild every cell from the per-source grain and
    // compare — a full-outer join of two d·w-row relations
    val mergedCells = gramCountsBySrc(s, dir)
      .select(col("source"), col("cnt"), explode(array((0 until csDepth).map(i =>
        struct(lit(i).as("row"), csBucket(i, col("g")).as("bucket"),
          csSign(i, col("g")).as("sgn"))): _*)).as("c"))
      .groupBy(col("source"), col("c.row").as("row"),
        col("c.bucket").as("bucket"))
      .agg(sum(col("c.sgn") * col("cnt")).as("cs"))
      .groupBy(col("row"), col("bucket")).agg(sum(col("cs")).as("cntm"))
    val mergeOk = cells.join(mergedCells, Seq("row", "bucket"), "full_outer")
      .agg(max(when(coalesce(col("cnt"), lit(0L)) =!=
        coalesce(col("cntm"), lit(0L)), 1L).otherwise(0L)).as("m_drift"))
      .select((col("m_drift") === 0).as("merge_exact"))
    // CMS side of the comparison: unsigned counters over the SAME cached
    // count relation through the CMS family's own seed hash
    val cmsCells = gc.select(col("cnt"), explode(array((0 until cmsDepth).map(i =>
        struct(lit(i).as("row"), cmsBucket(i, col("g")).as("bucket"))): _*))
        .as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val exact = gc.select(col("g"), col("cnt").as("exact"))
      .orderBy(col("exact").desc, col("g")).limit(csTopK)
    val csProbes = exact.select(col("g"), col("exact"),
        explode(array((0 until csDepth).map(i =>
          struct(lit(i).as("row"), csBucket(i, col("g")).as("bucket"),
            csSign(i, col("g")).as("sgn"))): _*)).as("p"))
      .select(col("g"), col("exact"), col("p.row").as("row"),
        col("p.bucket").as("bucket"), col("p.sgn").as("sgn"))
    val csEst = csProbes.join(cells, Seq("row", "bucket"))
      .groupBy(col("g"), col("exact"))
      .agg(element_at(
        sort_array(collect_list(col("sgn") * col("cnt"))),
        csDepth / 2 + 1).as("est"))
    val cmsProbes = exact.select(col("g"),
        explode(array((0 until cmsDepth).map(i =>
          struct(lit(i).as("row"), cmsBucket(i, col("g")).as("bucket"))): _*))
        .as("p"))
      .select(col("g"), col("p.row").as("row"), col("p.bucket").as("bucket"))
    val cmsEst = cmsProbes.join(cmsCells, Seq("row", "bucket"))
      .groupBy(col("g")).agg(min(col("cnt")).as("cms_est"))
    csEst.join(cmsEst, "g")
      .crossJoin(broadcast(mergeOk))
      .select(col("g"), col("exact"), col("est"),
        (col("est") - col("exact")).as("err"),
        col("cms_est"), (col("cms_est") - col("exact")).as("cms_over"),
        (col("cms_est") >= col("exact")).as("cms_ok"),
        col("merge_exact"))
      .orderBy("g")
  }

  private def countsketchTopkAuditSql = {
    val med = csDepth / 2 + 1
    val csCellUnion = (0 until csDepth).map(i =>
      s"SELECT $i AS row, ${csBucketSql(i, "g")} AS bucket, " +
        s"${csSignSql(i, "g")} AS sgn, cnt FROM gc")
      .mkString("\n  UNION ALL ")
    val csSrcUnion = (0 until csDepth).map(i =>
      s"SELECT source, $i AS row, ${csBucketSql(i, "g")} AS bucket, " +
        s"${csSignSql(i, "g")} AS sgn, cnt FROM bysrc")
      .mkString("\n  UNION ALL ")
    val csProbeUnion = (0 until csDepth).map(i =>
      s"SELECT g, exact, $i AS row, ${csBucketSql(i, "g")} AS bucket, " +
        s"${csSignSql(i, "g")} AS sgn FROM exact")
      .mkString("\n  UNION ALL ")
    val cmsCellUnion = (0 until cmsDepth).map(i =>
      s"SELECT $i AS row, ${cmsBucketSql(i, "g")} AS bucket, cnt FROM gc")
      .mkString("\n  UNION ALL ")
    val cmsProbeUnion = (0 until cmsDepth).map(i =>
      s"SELECT g, $i AS row, ${cmsBucketSql(i, "g")} AS bucket FROM exact")
      .mkString("\n  UNION ALL ")
    s"""WITH bysrc AS (
       |  SELECT COALESCE(source, '') AS source, s AS g, COUNT(*) AS cnt
       |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents) d,
       |  UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)
       |  GROUP BY 1, 2),
       |gc AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS cnt FROM bysrc GROUP BY 1),
       |cells AS (
       |  SELECT row, bucket, CAST(SUM(sgn * cnt) AS BIGINT) AS cnt FROM (
       |  $csCellUnion) GROUP BY 1, 2),
       |mcells AS (
       |  SELECT row, bucket, CAST(SUM(cs) AS BIGINT) AS cntm FROM (
       |    SELECT source, row, bucket, CAST(SUM(sgn * cnt) AS BIGINT) AS cs
       |    FROM ($csSrcUnion) GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2),
       |mergeok AS (
       |  SELECT MAX(CASE WHEN COALESCE(c.cnt, 0) <> COALESCE(m.cntm, 0)
       |    THEN 1 ELSE 0 END) = 0 AS merge_exact
       |  FROM cells c FULL OUTER JOIN mcells m USING (row, bucket)),
       |cmscells AS (
       |  SELECT row, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
       |  $cmsCellUnion) GROUP BY 1, 2),
       |exact AS (
       |  SELECT g, cnt AS exact FROM gc ORDER BY exact DESC, g LIMIT $csTopK),
       |csest AS (
       |  SELECT g, exact,
       |    (list_sort(list(p.sgn * c.cnt)))[$med] AS est
       |  FROM ($csProbeUnion) p JOIN cells c USING (row, bucket)
       |  GROUP BY 1, 2),
       |cmsest AS (
       |  SELECT g, CAST(MIN(c.cnt) AS BIGINT) AS cms_est
       |  FROM ($cmsProbeUnion) p JOIN cmscells c USING (row, bucket)
       |  GROUP BY 1)
       |SELECT g, exact, est, est - exact AS err,
       |  cms_est, cms_est - exact AS cms_over, cms_est >= exact AS cms_ok,
       |  merge_exact
       |FROM csest JOIN cmsest USING (g) CROSS JOIN mergeok
       |ORDER BY g""".stripMargin
  }

  /** Depth grid of the CountSketch sweep — odd depths only (the median
    * stays an order statistic at every grid point). */
  val csDepthGrid: Seq[Int] = Seq(1, 3, 5)

  /** CountSketch depth calibration sweep — the memory/accuracy knob the
    * signed sketch has that CMS lacks a twin for (more rows shrink the
    * MEDIAN's two-sided noise as the per-row variance stays F₂/w):
    * per depth d ∈ [[csDepthGrid]], the exact top-[[csTopK]] grams'
    * median-of-d estimates and the summed/worst absolute error. The
    * whole grid rides ONE build: a depth-d sketch is the first d rows
    * of the depth-[[csDepth]] sketch (independent seeds), so the sweep
    * reuses the audit's cells and medians PREFIXES of the same row
    * estimates — no second counter table exists at any grid point.
    * `rows_complete` pins per grid row that every probed gram collected
    * exactly d row estimates, so index (d+1)/2 is a genuine order
    * statistic over d values — exact int64, never an interpolated
    * midpoint (a probe row that missed its cell would fail the pin).
    *
    * Scale shape: identical to the audit — vocabulary-sized cached
    * counts into d·w cells, probes broadcast; the grid multiplies only
    * the k·|grid| probe rows. */
  private def countsketchDepthSweep(s: SparkSession, dir: String): DataFrame = {
    val gc = gramCounts(s, dir)
    val cells = gc.select(col("cnt"), explode(array((0 until csDepth).map(i =>
        struct(lit(i).as("row"), csBucket(i, col("g")).as("bucket"),
          csSign(i, col("g")).as("sgn"))): _*)).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(sum(col("c.sgn") * col("cnt")).as("cnt"))
    val exact = gc.select(col("g"), col("cnt").as("exact"))
      .orderBy(col("exact").desc, col("g")).limit(csTopK)
    val probes = exact.select(col("g"), col("exact"),
        explode(array((0 until csDepth).map(i =>
          struct(lit(i).as("row"), csBucket(i, col("g")).as("bucket"),
            csSign(i, col("g")).as("sgn"))): _*)).as("p"))
      .select(col("g"), col("exact"), col("p.row").as("row"),
        col("p.bucket").as("bucket"), col("p.sgn").as("sgn"))
    val rowEsts = probes.join(cells, Seq("row", "bucket"))
      .select(col("g"), col("exact"), col("row"),
        (col("sgn") * col("cnt")).as("e"))
    val grid = s.createDataFrame(csDepthGrid.map(Tuple1(_))).toDF("d")
      .select(col("d").cast("long").as("d"))
    val perKey = rowEsts.crossJoin(grid).filter(col("row") < col("d"))
      .groupBy(col("d"), col("g"), col("exact"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("d"), col("g"), col("exact"),
        element_at(col("es"), ((col("d") + 1L) / 2L).cast("int")).as("est"),
        // falsifiable pin: all d row estimates were collected, so index
        // (d+1)/2 is a genuine order statistic over d values (a probe row
        // that missed its cell would make size(es) < d and fail this)
        (size(col("es")).cast("long") === col("d")).as("rows_complete"))
    grid.join(perKey.groupBy(col("d")).agg(
        count(lit(1)).as("n_keys"),
        sum(abs(col("est") - col("exact"))).as("sum_abs_err"),
        max(abs(col("est") - col("exact"))).as("max_abs_err"),
        min(when(col("rows_complete"), 1L).otherwise(0L)).as("rc")),
      Seq("d"), "left")
      .select(col("d"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"),
        coalesce(col("sum_abs_err"), lit(0L)).as("sum_abs_err"),
        coalesce(col("max_abs_err"), lit(0L)).as("max_abs_err"),
        (coalesce(col("rc"), lit(1L)) === 1L).as("rows_complete"))
      .orderBy("d")
  }

  private def countsketchDepthSweepSql = {
    val cellUnion = (0 until csDepth).map(i =>
      s"SELECT $i AS row, ${csBucketSql(i, "g")} AS bucket, " +
        s"${csSignSql(i, "g")} AS sgn, cnt FROM gc")
      .mkString("\n  UNION ALL ")
    val probeUnion = (0 until csDepth).map(i =>
      s"SELECT g, exact, $i AS row, ${csBucketSql(i, "g")} AS bucket, " +
        s"${csSignSql(i, "g")} AS sgn FROM exact")
      .mkString("\n  UNION ALL ")
    val gridSql = csDepthGrid.map(d => s"SELECT CAST($d AS BIGINT) AS d")
      .mkString(" UNION ALL ")
    s"""WITH gs0 AS (
       |  SELECT s AS g
       |  FROM (SELECT string_split(text, ' ') AS w FROM documents) dd,
       |  UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)),
       |gc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt FROM gs0 GROUP BY 1),
       |cells AS (
       |  SELECT row, bucket, CAST(SUM(sgn * cnt) AS BIGINT) AS cnt FROM (
       |  $cellUnion) GROUP BY 1, 2),
       |exact AS (
       |  SELECT g, cnt AS exact FROM gc ORDER BY exact DESC, g LIMIT $csTopK),
       |rowests AS (
       |  SELECT p.g, p.exact, p.row, p.sgn * c.cnt AS e
       |  FROM ($probeUnion) p JOIN cells c USING (row, bucket)),
       |grid AS ($gridSql),
       |perkey AS (
       |  SELECT d, g, exact,
       |    (list_sort(list(e)))[CAST((d + 1) // 2 AS INT)] AS est,
       |    CAST(COUNT(*) AS BIGINT) = d AS rc
       |  FROM rowests r CROSS JOIN grid
       |  WHERE r.row < grid.d
       |  GROUP BY 1, 2, 3)
       |SELECT grid.d,
       |  COALESCE(a.n_keys, 0) AS n_keys,
       |  COALESCE(a.sum_abs_err, 0) AS sum_abs_err,
       |  COALESCE(a.max_abs_err, 0) AS max_abs_err,
       |  COALESCE(a.rc, 1) = 1 AS rows_complete
       |FROM grid LEFT JOIN (
       |  SELECT d, CAST(COUNT(*) AS BIGINT) AS n_keys,
       |    CAST(SUM(abs(est - exact)) AS BIGINT) AS sum_abs_err,
       |    CAST(MAX(abs(est - exact)) AS BIGINT) AS max_abs_err,
       |    MIN(CASE WHEN rc THEN 1 ELSE 0 END) AS rc
       |  FROM perkey GROUP BY 1) a USING (d)
       |ORDER BY grid.d""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("countsketch_topk_audit", countsketchTopkAudit,
      Some(countsketchTopkAuditSql)),
    Q("countsketch_depth_sweep", countsketchDepthSweep,
      Some(countsketchDepthSweepSql)),
    Q("ams_f2_audit", amsF2Audit, Some(amsF2AuditSql)),
    Q("cms_rank_audit", cmsRankAudit, Some(cmsRankAuditSql)),
    Q("cms_rank_merge_audit", cmsRankMergeAudit,
      Some(cmsRankMergeAuditSql)),
    Q("cms_topk_audit", cmsTopkAudit, Some(cmsTopkAuditSql)),
    Q("cms_width_sweep", cmsWidthSweep, Some(cmsWidthSweepSql)),
    Q("hll_distinct_audit", hllDistinctAudit, Some(hllDistinctAuditSql)),
    Q("hll_p_sweep", hllPSweep, Some(hllPSweepSql)),
    Q("zipf_slope_audit", zipfSlopeAudit, Some(zipfSlopeAuditSql)),
    Q("kmv_distinct_audit", kmvDistinctAudit, Some(kmvDistinctAuditSql)),
    Q("kmv_merge_audit", kmvMergeAudit, Some(kmvMergeAuditSql)),
    Q("kmv_k_sweep", kmvKSweep, Some(kmvKSweepSql)),
    Q("kmv_intersect_audit", kmvIntersectAudit,
      Some(kmvIntersectAuditSql)),
    Q("priority_sample_audit", prioritySampleAudit,
      Some(prioritySampleAuditSql)))
}
