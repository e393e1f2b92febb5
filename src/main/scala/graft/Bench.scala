package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark harness: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query wall seconds.
  * Queries run in sorted name order after a small uncounted JVM warm-up so
  * first-query JIT noise doesn't land on an arbitrary query. */
object Bench {
  /** The measured action: force FULL-ROW evaluation by hashing every
    * column into one aggregate (ScaleCheck's ForceQ rule). A bare
    * `.count()` is NOT an honest measure: Catalyst deletes left joins
    * against grouped-by-key relations (and the columns feeding them)
    * when no output column is consumed — a round-17 probe found 47 of
    * 248 queries lose joins under count(), 15 of them COLLAPSING to a
    * bare scan (dup_span_incremental's count-plan was one parquet scan
    * of doc_id — the bench would have reported a 22 s classification
    * query as 2.4 s). Map-typed columns are excluded from the hash
    * (xxhash64 rejects MapType); if nothing is hashable the action
    * falls back to count(). SPARK_GRAFT_BENCH_COUNTRULE=1 restores the
    * pre-round-17 count() rule for apples-to-apples continuity
    * captures against old trees. */
  private def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
  }
  private val countRule = sys.env.get("SPARK_GRAFT_BENCH_COUNTRULE")
    .exists(_ == "1")
  private def benchAction(df: org.apache.spark.sql.DataFrame): Unit = {
    // escape backticks inside names: a raw backtick would terminate the
    // quoted identifier early and misreport the query as FAILED
    val hashable = df.schema.fields
      .filterNot(f => hasMap(f.dataType))
      .map(f => s"`${f.name.replace("`", "``")}`")
    if (countRule || hashable.isEmpty) { df.count(); () }
    else {
      df.selectExpr(s"bit_xor(xxhash64(${hashable.mkString(", ")})) AS h",
        "count(*) AS n").collect()
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Scan-parallelism floor (guide §6): the test tables are single
      // parquet files of a few MB, far below maxPartitionBytes (128 MB),
      // so without a floor EVERY scan-side stage — scan + expand +
      // partial aggregate + explode, i.e. the bulk of most queries —
      // planned as ONE task and ran single-threaded on a 32-core
      // session (round-19 profile: approx_sketches spent 8 s in 18
      // tasks). minPartitionNum is scale-adaptive by construction
      // (derived from the session's core count, not a tuned constant):
      // bytesPerCore = totalBytes/minPartitionNum only LOWERS the split
      // size when files are small relative to cores — at production
      // scale splits abound and the floor is a no-op, and the 512 KB
      // open-cost keeps genuinely tiny tables at one task. Same floor
      // as a cluster deployment would set (defaultParallelism).
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Uncounted JIT/codegen warm-up: exercise the hot code paths (hash agg,
    // parquet scan, window, join) on tiny sf0.001 data so one-time class
    // loading + whole-stage-codegen compilation doesn't land on whichever
    // benchmarked query happens to run first. The benchmarked sfDir's data
    // is NOT touched here.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      // never warm the benchmarked dataset itself: pick the SMALLEST sibling
      // sf dir of sfDir (derived from its parent, not hardcoded) so
      // page/file-listing caches stay cold for the measured queries
      // toRealPath: a symlinked or non-canonical sfDir must not match as
      // its own "sibling" and warm the measured dataset
      val sfPath = java.nio.file.Paths.get(sfDir).toRealPath()
      val warmDir = {
        import scala.jdk.CollectionConverters._
        val st = java.nio.file.Files.list(sfPath.getParent)
        val siblings =
          try st.iterator().asScala.filter(p =>
            java.nio.file.Files.isDirectory(p) &&
              p.toRealPath() != sfPath &&
              java.nio.file.Files.exists(p.resolve("orders.parquet"))).toSeq
          finally st.close()
        // recursive regular-file sum: orders.parquet may be a Spark-written
        // DIRECTORY of part files, where Files.size returns the inode size
        // (~4 KB) for every candidate and the "smallest sibling" pick
        // silently degenerates to directory order
        def dataSize(p: java.nio.file.Path): Long =
          if (!java.nio.file.Files.isDirectory(p)) java.nio.file.Files.size(p)
          else {
            val w = java.nio.file.Files.walk(p)
            try w.iterator().asScala
              .filter(java.nio.file.Files.isRegularFile(_))
              .map(java.nio.file.Files.size).sum
            finally w.close()
          }
        siblings.sortBy(p => dataSize(p.resolve("orders.parquet")))
          .headOption.getOrElse(
            throw new java.io.FileNotFoundException(
              s"no sibling sf dir of $sfDir with orders.parquet"))
      }
      val o = spark.read.parquet(s"$warmDir/orders.parquet").limit(1000)
      o.withColumn("rn",
          row_number().over(Window.partitionBy("o_orderstatus").orderBy("o_orderkey")))
        .join(o.select("o_orderkey"), "o_orderkey")
        .groupBy("o_orderstatus").agg(sum("o_totalprice")).collect()
    } catch { case e: Throwable =>
      // a skipped warm-up must be VISIBLE: first-query JIT cost lands on a
      // measured query, so flag it in the bench log
      System.err.println(s"[bench] WARM-UP SKIPPED (${e.getMessage}) — " +
        "first-query timing will include JIT/codegen cost")
    }

    // Optional cache-release ladder (off by default so round-over-round
    // benches stay comparable): SPARK_GRAFT_RELEASE_EVERY=N unpersists the
    // whole session-cache registry at every Nth query boundary. This is
    // the memory-ceiling control for constrained heaps — the r12 scale
    // finding: four cache-heavy families back-to-back at the 100× corpus
    // OOM an 8 GB session when 32 concurrent hash builds land on top of
    // accumulated registries; a release boundary trades rebuild time for
    // a bounded peak. The released queries then pay their cold builds
    // again, which is exactly the trade the flag's presence documents.
    val releaseEvery = sys.env.get("SPARK_GRAFT_RELEASE_EVERY")
      .map(_.toInt).filter(_ > 0)

    // Family cache boundaries: these cached relations are consumed ONLY
    // inside their name-prefix wave of the sorted walk, so once the walk
    // leaves the prefix they have no future reader this run — release them
    // (the r15 finding: resident hanf register levels displaced
    // pagerank_links' warm state, 2.6 → 5.6 s in-suite, with zero code
    // change). The release runs OUTSIDE any query's timed window.
    //
    // Round 19 extends the two original boundaries to the whole session
    // registry (the round-18 verdict's item 2: new caches — insGateCand,
    // knnBrute, the shared MinHash signatures, the span-doubling levels —
    // stayed resident for the remaining walk and the 8 GB heap paid for
    // them). Each prefix's release list names ONLY caches whose last
    // consumer sorts inside that prefix wave (consumer map in
    // OPTIMIZATION_r19.md); a wrongly-released cache would silently
    // rebuild inside a later query's timed window, so additions here must
    // re-verify the map.
    val familyBoundaries: Seq[(String, SparkSession => Int)] = {
      import graft.queries.{Util => QU}
      Seq(
        "ann_graph_" -> ((sp: SparkSession) =>
          graft.queries.SimilarityOps.releaseServeGraphCaches(sp)),
        // the batch insert gate is the candidate pool's only consumer
        "ann_insert_gate" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "insGateCand")),
        "bloom_fpr_sweep" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "bloomSweep")),
        // rankValCounts/BySrc feed only the two cms_rank_* audits
        "cms_rank_" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "rankValCounts")),
        "coverage_" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "covDocGram")),
        // the increment chain's token/map caches end with dup_span_incremental
        "dup_" -> ((sp: SparkSession) => QU.releaseFamily(sp, "dupDblInc")),
        "dsir_" -> ((sp: SparkSession) => QU.releaseFamily(sp, "dsirOcc")),
        "epoch_" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "epochSlices")),
        "graph_" -> ((sp: SparkSession) =>
          graft.queries.GraphOps.releaseHanfCaches(sp)),
        // full + sampled signature relations and the recall-audit bands:
        // last consumers are minhash_band_sweep / minhash_estimate_audit
        "minhash_" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "minhashSigs", "recallAudit")),
        "pagerank_links" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "pagerankEdges")),
        // the PQ codebooks and the IVF serve index end with pq_residual_gain
        "pq_" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "pqEncoded", "pqResidualEncoded",
            "ivfServeAssigned")),
        // knFrame/selfFrame span ccnet→rho_excess_select (LmOps)
        "rho_excess_select" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "knPplFrame", "knTrainCounts")),
        "semdedup_" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "semanticDedupAssigned")),
        // last embedding-family consumer in the sorted walk
        "sq8_" -> ((sp: SparkSession) =>
          graft.queries.SimilarityOps.releaseBase(sp) +
            QU.releaseFamily(sp, "knnBrute")),
        // span-doubling levels + apply segments end with substring_dedup_*
        "substring_" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "dupDbl", "dupApply")),
        "tfidf_topk" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "tfRelation")),
        "word_bigram_surprisal" -> ((sp: SparkSession) =>
          QU.releaseFamily(sp, "bigramSurprisal")))
    }

    // A failed query is reported as NEGATIVE elapsed seconds (not a normal
    // measurement) and forces a nonzero exit, so breakage can't masquerade
    // as a fast run.
    // SPARK_GRAFT_BENCH_ONLY=a,b,c scopes the run to named queries (local
    // A/B iteration on one family); unknown names fail loudly. The driver
    // never sets it, so round captures stay full-surface.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_BENCH_ONLY unknown: $unknown")
    }
    val sortedQs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = sortedQs.zipWithIndex.map { case ((name, fn), i) =>
      releaseEvery.foreach { n =>
        if (i > 0 && i % n == 0) {
          graft.queries.Util.releaseCaches(spark)
          System.err.println(s"[bench] cache release boundary before #$i")
        }
      }
      val t0 = System.nanoTime()
      val ok =
        try { benchAction(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      familyBoundaries.foreach { case (prefix, release) =>
        val leaving = name.startsWith(prefix) &&
          sortedQs.lift(i + 1).forall(!_._1.startsWith(prefix))
        if (leaving) {
          val n = release(spark)
          System.err.println(s"[bench] family boundary after $name: " +
            s"released $n '$prefix' cached relations")
        }
      }
      name -> (if (ok) secs else -secs)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    // sfDir is env-supplied: escape it so a quote/backslash in the path
    // can't produce malformed JSON (same encoder as ScaleCheck)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":${graft.tools.ScaleCheck.jsonString(sfDir)}}"""
    println(json)
    // also persist to a file: a truncated stdout capture (seen when the
    // harness logs clip the tail) must not lose the per-query record
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_last_run.json"), json + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH_last_run.json: $e")
    }
    spark.stop()
    // The harness records only the LAST 2000 chars of this process's output
    // (BENCH_r09.json: "tail" len 2000, "parsed": null — the full per-query
    // line is ~3.6 KB at 131 queries, so its head fell outside the window
    // and nothing parsed). Emit a SHORT self-contained JSON line as the
    // final stdout — same shape ("metric"/"value"/"unit"/"queries"/"sf"),
    // queries trimmed to the slowest 25 plus every failure, seconds at 3 dp
    // — sized to fit the window with room for sbt's closing lines. The full
    // record stays in the long line above and BENCH_last_run.json.
    val headline = results
      .sortBy { case (_, v) => (v >= 0, -math.abs(v)) } // failures first, then slowest
      .take(25).sortBy(_._1)
      // Double.toString, not %f: %f is default-locale (a comma decimal
      // separator would corrupt the JSON); Double.toString is always '.'
      .map { case (k, v) =>
        s""""$k":${math.round(v * 1000.0) / 1000.0}""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$headline,"failed":$failed,"n_queries":${results.size},"queries_shown":${math.min(25, results.size)},"full":"BENCH_last_run.json","sf":${graft.tools.ScaleCheck.jsonString(sfDir)}}""")
    System.out.flush()
    if (failed > 0) sys.exit(1)
  }
}
