package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ index PERSISTENCE — the lifecycle piece the serve-family queries
  * imply (`ivf_list_drift` audits a deployed index whose quantizer is
  * held fixed between retrains; this is how that index exists on disk):
  *
  *  - [[save]] writes the two artifacts a PQ deployment stores — the
  *    pqM·pqK-row codebook and the 4-codes-per-vector encoded corpus
  *    (codes.parquet is ~64× smaller than the float vectors it replaces;
  *    at 100 TB of embeddings that is the difference between a
  *    serveable index and an unloadable one);
  *  - [[serveAdcTopk]] answers top-k from the SAVED artifacts alone:
  *    query vectors quantize row-locally, build their 32-entry ADC
  *    tables against the loaded codebook (broadcast — it is tiny by
  *    construction), and rank encoded vectors by summed table lookups.
  *    The corpus embeddings are never read at serve time — the index IS
  *    the data, which is the entire point of storing codes.
  *
  * PqIndexSpec pins that a saved-then-served index answers bit-for-bit
  * identically to the in-session `pq_adc_topk` pipeline on the same
  * corpus and queries. */
object PqIndex {

  /** Write the codebook + encoded codes for `dir`'s embeddings corpus
    * under `out` (out/codebook.parquet, out/codes.parquet). Rides the
    * session-cached encode relation — saving after querying costs only
    * the writes. */
  def save(s: SparkSession, dir: String, out: String): Unit = {
    graft.functions.GraftFunctions.register(s)
    val e = SimilarityOps.quantizedBase(s, dir)
    PqOps.subvectors(e.filter(col("vec_id") < PqOps.pqK))
      .select(col("m"), col("vec_id").as("code"),
        col("sub").as("csub"), col("ss").as("cc"))
      .write.mode("overwrite").parquet(s"$out/codebook.parquet")
    PqOps.pqEncoded(s, dir)
      .write.mode("overwrite").parquet(s"$out/codes.parquet")
  }

  /** Top-k ADC search over a SAVED index for `queries`
    * (vec_id, embedding) rows: per query, the k nearest encoded vectors
    * by summed per-subspace table distances (adc asc, id ties — the
    * pq_adc_topk rule). Self-matches are EXCLUDED: an id present in both
    * the query set and the index never matches itself — the same
    * `vec_id <> query_id` rule every serve query in the suite applies, so
    * a saved-then-served index answers bit-for-bit like the in-session
    * pipeline (PqIndexSpec pins this, including the self-match case). */
  def serveAdcTopk(s: SparkSession, indexDir: String, queries: DataFrame,
      k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val cb = s.read.parquet(s"$indexDir/codebook.parquet")
    val codes = s.read.parquet(s"$indexDir/codes.parquet")
    val q = SimilarityOps.quantize(queries)
      .select(col("vec_id").as("query_id"), col("q"))
    val tab = PqOps.subvectors(q.withColumnRenamed("query_id", "vec_id"))
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("code"),
        (col("ss") - lit(2L) *
          graft.functions.GraftFunctions.quantized_dot(col("sub"), col("csub"))
          + col("cc")).as("pd"))
    val cand = codes.join(broadcast(tab), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd")).as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("vec_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id").as("neighbor_id"),
        col("adc_dist"))
      .orderBy("query_id", "rk")
  }
}
