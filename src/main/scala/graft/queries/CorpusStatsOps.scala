package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Util._

/** Corpus-statistics audits — the two classical vocabulary laws a
  * training-data pipeline sizes itself by, each validated against the
  * corpus rather than assumed:
  *
  *  - Good–Turing (Good 1953, validated empirically by Church & Gale
  *    1991): the count-of-counts estimate of how much probability mass
  *    lives in grams a sample has NOT seen — the number that decides
  *    whether a source is exhausted (near-zero unseen mass) or worth
  *    more crawl budget. Audited the only honest way: a held-out half
  *    of the corpus measures the ACTUAL new-gram mass the estimate
  *    predicts.
  *  - Heaps' law (Heaps 1978): vocabulary grows as V ∝ N^β — the dual
  *    of the Zipf rank-frequency law `zipf_slope_audit` fits; β sizes
  *    vocabulary-keyed state (dedup signatures, tokenizer vocab, df
  *    tables) ahead of a 100× corpus growth.
  *
  * House determinism contract: md5 coins/hashes only, exact integer
  * arithmetic (milli-fractions via `div`), the shared octave-linear
  * fixed-point log ([[CurationOps.lg]]) and OLS-over-integer-moments
  * ([[Util.olsSlope]]) expressions, explicit ORDER BY. The audited
  * universe is the word-trigram stream — the same shingle universe as
  * the dedup/decontamination/sketch tiers. */
object CorpusStatsOps {

  /** Highest train-count class audited (r = 0..4; the r = 0 row is the
    * unseen-mass row, the headline number). */
  val gtMaxR = 4

  /** Good–Turing held-out audit. Docs split by an md5 coin into a train
    * half and a held half (NULL doc_id buckets as train — one fixed,
    * documented side, the streaming-split discipline). For each train
    * count class r, Good–Turing predicts the TRAIN distribution assigns
    * total probability mass (r+1)·n_{r+1}/N to the class (n_r = number
    * of distinct grams seen exactly r times in train, N = train
    * occurrences); the audit measures the class's ACTUAL mass in the
    * held half — Σ held-occurrences of class-r grams over H. The r = 0
    * row is the celebrated unseen-mass estimate n_1/N vs the held
    * half's genuinely-new-gram mass.
    *
    * Emitted per r ∈ [0, [[gtMaxR]]]: the class size `n_grams` (for
    * r = 0: grams the held half saw that train never did), the class's
    * held occurrences `m_held`, `gt_milli` vs `act_milli` (exact
    * integer milli-fractions), and the corpus-wide totals. The grid is
    * LEFT-joined so every r row survives an empty/degenerate corpus
    * (the hll_p_sweep discipline); N = 0 or H = 0 yield NULL milli
    * columns via div guards.
    *
    * Scale shape: ONE token-scale (gram, half)-keyed aggregate with
    * map-side combine — the gramCounts shape plus a coin column; every
    * later stage is count-of-counts-sized (≤ distinct train counts) or
    * a 5-row grid join. Nothing is pairwise; the audit costs what
    * `vocab_topk` costs. */
  private def goodTuringAudit(s: SparkSession, dir: String): DataFrame = {
    val held = coalesce(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 2L, lit(0L))
    val gc = t(s, dir, "documents")
      .select(held.as("held"), split(col("text"), " ").as("w"))
      .select(col("held"), explode(CorpusOps.wordGrams(col("w"), 3)).as("g"))
      .groupBy(col("g"))
      .agg(sum(when(col("held") === 0L, 1L).otherwise(0L)).as("ctr"),
        sum(when(col("held") === 1L, 1L).otherwise(0L)).as("che"))
    val base = gc.agg(coalesce(sum(col("ctr")), lit(0L)).as("n_train"),
      coalesce(sum(col("che")), lit(0L)).as("n_held"))
    // class stats up to r = gtMaxR + 1 (the GT estimate for class r
    // reads n_{r+1})
    val classes = gc.filter(col("ctr") <= gtMaxR + 1)
      .groupBy(col("ctr").as("r"))
      .agg(count(lit(1)).as("n_grams"), sum(col("che")).as("m_held"))
    val grid = s.range(gtMaxR + 1).select(col("id").as("r"))
    grid.join(classes, Seq("r"), "left")
      .join(classes.select((col("r") - 1).as("r"), col("n_grams").as("np1")),
        Seq("r"), "left")
      .crossJoin(broadcast(base))
      .select(col("r"), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("m_held"), lit(0L)).as("m_held"),
        expr(s"CASE WHEN n_train > 0 THEN " +
          s"(1000 * (r + 1) * coalesce(np1, 0)) div n_train END")
          .as("gt_milli"),
        expr("CASE WHEN n_held > 0 THEN " +
          "(1000 * coalesce(m_held, 0)) div n_held END").as("act_milli"),
        col("n_train"), col("n_held"))
      .orderBy("r")
  }

  private val goodTuringAuditSql =
    s"""WITH d AS (
       |  SELECT COALESCE(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
       |      1, 8) AS BIGINT) % 2, 0) AS held,
       |    string_split(text, ' ') AS w
       |  FROM documents),
       |gc AS (
       |  SELECT s AS g,
       |    CAST(SUM(CASE WHEN held = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ctr,
       |    CAST(SUM(CASE WHEN held = 1 THEN 1 ELSE 0 END) AS BIGINT) AS che
       |  FROM d, UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)
       |  GROUP BY 1),
       |base AS (
       |  SELECT CAST(COALESCE(SUM(ctr), 0) AS BIGINT) AS n_train,
       |    CAST(COALESCE(SUM(che), 0) AS BIGINT) AS n_held
       |  FROM gc),
       |classes AS (
       |  SELECT ctr AS r, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |    CAST(SUM(che) AS BIGINT) AS m_held
       |  FROM gc WHERE ctr <= ${gtMaxR + 1} GROUP BY 1),
       |grid AS (SELECT CAST(range AS BIGINT) AS r FROM range(${gtMaxR + 1}))
       |SELECT grid.r, COALESCE(c.n_grams, 0) AS n_grams,
       |  COALESCE(c.m_held, 0) AS m_held,
       |  CASE WHEN n_train > 0 THEN
       |    (1000 * (grid.r + 1) * COALESCE(c1.n_grams, 0)) // n_train
       |  END AS gt_milli,
       |  CASE WHEN n_held > 0 THEN
       |    (1000 * COALESCE(c.m_held, 0)) // n_held END AS act_milli,
       |  n_train, n_held
       |FROM grid
       |LEFT JOIN classes c ON c.r = grid.r
       |LEFT JOIN classes c1 ON c1.r = grid.r + 1
       |CROSS JOIN base
       |ORDER BY grid.r""".stripMargin

  /** Heaps'-law audit: vocabulary size as a function of corpus size,
    * measured over cumulative SOURCE prefixes — order the sources by
    * name, and for prefix p take tokens_p = occurrences in sources 1..p
    * and vocab_p = distinct grams first contributed by sources 1..p.
    * The cumulative-distinct is EXACT without re-scanning per prefix:
    * each gram carries its first source (min over its sources), so
    * vocab_p is one cumsum over the |sources|-row first-source
    * histogram — the arrival-order trick that makes a growth curve
    * affordable at any corpus size.
    *
    * Emits the (p, tokens, vocab) curve plus the OLS fit of milli-log₂
    * vocab against milli-log₂ tokens over all prefixes ([[Util.olsSlope]]
    * — slope IS Heaps' β, log-base-invariant) replicated per row, so the
    * driver hash pins curve AND fit cross-engine. `mono_ok` pins the
    * structural law that both curves are non-decreasing in p.
    *
    * Scale shape: rides the session-cached per-source gram-count
    * relation ([[SketchOps.gramCountsBySrc]] — the one token-scale pass
    * the whole sketch/stats family shares); the first-source reduction
    * is vocabulary-sized with map-side combine; everything after runs
    * on ≤ |sources| rows. */
  private def heapsLawAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySrc = SketchOps.gramCountsBySrc(s, dir)
    val srcTok = bySrc.groupBy(col("source")).agg(sum(col("cnt")).as("tok"))
    val firstSrc = bySrc.groupBy(col("g")).agg(min(col("source")).as("fs"))
      .groupBy(col("fs").as("source")).agg(count(lit(1)).as("nv"))
    val byName = Window.orderBy(col("source"))
    val curve = srcTok.join(firstSrc, Seq("source"), "left")
      .withColumn("p", row_number().over(byName).cast("long"))
      .withColumn("tokens", sum(col("tok")).over(
        byName.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("vocab", sum(coalesce(col("nv"), lit(0L))).over(
        byName.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("p"), col("source"), col("tokens"), col("vocab"))
    val pts = curve.filter(col("tokens") > 0 && col("vocab") > 0)
      .select(expr(CurationOps.lg("tokens")).as("x"),
        expr(CurationOps.lg("vocab")).as("y"))
    val fit = pts.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("x")), lit(0L)).as("sx"),
        coalesce(sum(col("y")), lit(0L)).as("sy"),
        coalesce(sum(col("x") * col("x")), lit(0L)).as("sxx"),
        coalesce(sum(col("x") * col("y")), lit(0L)).as("sxy"),
        coalesce(sum(col("y") * col("y")), lit(0L)).as("syy"))
      .select(col("n_docs").as("n_points"),
        expr(Util.olsSlope).as("beta"),
        expr(Util.olsIntercept).as("intercept_milli"),
        expr(Util.olsR2).as("r2"))
    curve.crossJoin(broadcast(fit))
      .withColumn("mono_ok",
        (col("tokens") >= coalesce(lag(col("tokens"), 1)
          .over(Window.orderBy(col("p"))), lit(0L))) &&
        (col("vocab") >= coalesce(lag(col("vocab"), 1)
          .over(Window.orderBy(col("p"))), lit(0L))))
      .select(col("p"), col("source"), col("tokens"), col("vocab"),
        col("mono_ok"), col("n_points"), col("beta"),
        col("intercept_milli"), col("r2"))
      .orderBy("p")
  }

  private val heapsLawAuditSql =
    s"""WITH bysrc AS (
       |  SELECT COALESCE(source, '') AS source, s AS g, COUNT(*) AS cnt
       |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents) d,
       |  UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)
       |  GROUP BY 1, 2),
       |srctok AS (
       |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS tok
       |  FROM bysrc GROUP BY 1),
       |firstsrc AS (
       |  SELECT fs AS source, CAST(COUNT(*) AS BIGINT) AS nv FROM (
       |    SELECT g, MIN(source) AS fs FROM bysrc GROUP BY 1)
       |  GROUP BY 1),
       |curve AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY t.source) AS BIGINT) AS p,
       |    t.source,
       |    CAST(SUM(t.tok) OVER (ORDER BY t.source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS tokens,
       |    CAST(SUM(COALESCE(f.nv, 0)) OVER (ORDER BY t.source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS vocab
       |  FROM srctok t LEFT JOIN firstsrc f ON t.source = f.source),
       |xy AS (
       |  SELECT ${CurationOps.lgSql("tokens")} AS x,
       |    ${CurationOps.lgSql("vocab")} AS y
       |  FROM curve WHERE tokens > 0 AND vocab > 0),
       |m AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx,
       |    CAST(COALESCE(SUM(y), 0) AS BIGINT) AS sy,
       |    CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS sxx,
       |    CAST(COALESCE(SUM(x * y), 0) AS BIGINT) AS sxy,
       |    CAST(COALESCE(SUM(y * y), 0) AS BIGINT) AS syy
       |  FROM xy),
       |fit AS (
       |  SELECT n_docs AS n_points, ${Util.olsSlope} AS beta,
       |    ${Util.olsIntercept} AS intercept_milli, ${Util.olsR2} AS r2
       |  FROM m)
       |SELECT p, source, tokens, vocab,
       |  tokens >= COALESCE(lag(tokens) OVER (ORDER BY p), 0)
       |    AND vocab >= COALESCE(lag(vocab) OVER (ORDER BY p), 0) AS mono_ok,
       |  n_points, beta, intercept_milli, r2
       |FROM curve CROSS JOIN fit
       |ORDER BY p""".stripMargin

  /** Per-source distribution drift as total-variation distance from the
    * corpus: TV(P_src, Q) = ½·Σ_g |p_g − q_g| over the trigram
    * vocabulary, in exact integer MICRO units (p_micro = 10⁶·c_g div
    * C_src — milli would truncate a 16k-gram vocabulary's typical
    * probability to 0). The mixing/reweighting tier's pre-flight: a
    * source with tv ≈ 0 adds no distributional coverage no matter its
    * volume; the emitted argmax gram (`top_gram`) is the drift's
    * actionable witness. TV's range law 0 ≤ tv ≤ 10⁶ survives the
    * per-gram truncation (each side's micro masses sum to ≤ 10⁶) and is
    * pinned per row as `tv_ok`.
    *
    * The absent-gram mass needs NO outer join: grams missing from a
    * source contribute exactly q_g each, so their total is the global
    * Σq minus the source's own Σq — one corpus-wide scalar plus
    * per-source sums over the source's OWN grams.
    *
    * Scale shape: rides the session-cached per-source gram counts
    * joined to the corpus counts on the gram key (vocabulary-sized,
    * map-side combine); the argmax is one per-source window over the
    * same relation; output is |sources| rows. */
  private def sourceTvDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySrc = SketchOps.gramCountsBySrc(s, dir)
    val gc = bySrc.groupBy(col("g")).agg(sum(col("cnt")).as("dg"))
    val srcTot = bySrc.groupBy(col("source")).agg(sum(col("cnt")).as("ct"))
    val corpTot = gc.agg(sum(col("dg")).as("dt"))
    val qtot = gc.crossJoin(broadcast(corpTot))
      .select(expr("(1000000 * dg) div dt").as("q"))
      .agg(sum(col("q")).as("qtot"))
    val perGram = bySrc.join(gc, "g").join(srcTot, "source")
      .crossJoin(broadcast(corpTot))
      .select(col("source"), col("g"),
        expr("(1000000 * cnt) div ct").as("p"),
        expr("(1000000 * dg) div dt").as("q"))
      .withColumn("ad", abs(col("p") - col("q")))
    val wTop = Window.partitionBy(col("source"))
      .orderBy(col("ad").desc, col("g"))
    val top = perGram.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("source"), col("g").as("top_gram"),
        col("ad").as("top_diff_micro"))
    perGram.groupBy(col("source"))
      .agg(count(lit(1)).as("n_grams"), sum(col("ad")).as("sad"),
        sum(col("q")).as("sq"))
      .join(srcTot, "source")
      .crossJoin(broadcast(qtot))
      .select(col("source"), col("n_grams"), col("ct").as("n_tok"),
        expr("(sad + qtot - sq) div 2").as("tv_micro"))
      .withColumn("tv_ok", col("tv_micro") >= 0 &&
        col("tv_micro") <= 1000000L)
      .join(top, "source")
      .select(col("source"), col("n_grams"), col("n_tok"),
        col("tv_micro"), col("tv_ok"), col("top_gram"),
        col("top_diff_micro"))
      .orderBy("source")
  }

  private val sourceTvDriftSql =
    s"""WITH bysrc AS (
       |  SELECT COALESCE(source, '') AS source, s AS g, COUNT(*) AS cnt
       |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents) d,
       |  UNNEST(list_transform(range(greatest(len(w) - 2, 0)),
       |    i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) t(s)
       |  GROUP BY 1, 2),
       |gc AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS dg FROM bysrc GROUP BY 1),
       |srctot AS (
       |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS ct FROM bysrc GROUP BY 1),
       |corptot AS (SELECT CAST(SUM(dg) AS BIGINT) AS dt FROM gc),
       |qtot AS (
       |  SELECT CAST(SUM((1000000 * dg) // dt) AS BIGINT) AS qtot
       |  FROM gc CROSS JOIN corptot),
       |pergram AS (
       |  SELECT b.source, b.g,
       |    (1000000 * b.cnt) // s.ct AS p,
       |    (1000000 * g2.dg) // c.dt AS q
       |  FROM bysrc b JOIN gc g2 USING (g) JOIN srctot s USING (source)
       |  CROSS JOIN corptot c),
       |top AS (
       |  SELECT source, g AS top_gram,
       |    CAST(abs(p - q) AS BIGINT) AS top_diff_micro
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY source
       |      ORDER BY abs(p - q) DESC, g) AS rn
       |    FROM pergram)
       |  WHERE rn = 1),
       |agg AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |    CAST(SUM(abs(p - q)) AS BIGINT) AS sad,
       |    CAST(SUM(q) AS BIGINT) AS sq
       |  FROM pergram GROUP BY 1)
       |SELECT a.source, a.n_grams, s.ct AS n_tok,
       |  (a.sad + q.qtot - a.sq) // 2 AS tv_micro,
       |  (a.sad + q.qtot - a.sq) // 2 >= 0
       |    AND (a.sad + q.qtot - a.sq) // 2 <= 1000000 AS tv_ok,
       |  t.top_gram, t.top_diff_micro
       |FROM agg a JOIN srctot s USING (source) CROSS JOIN qtot q
       |JOIN top t USING (source)
       |ORDER BY a.source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("good_turing_audit", goodTuringAudit, Some(goodTuringAuditSql)),
    Q("heaps_law_audit", heapsLawAudit, Some(heapsLawAuditSql)),
    Q("source_tv_drift", sourceTvDrift, Some(sourceTvDriftSql)))
}
