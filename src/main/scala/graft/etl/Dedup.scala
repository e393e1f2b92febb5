package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-per-key dedup via ranking window.
  *
  * Generalization of the reference's `ranked` CTE
  * (/root/reference/python/03_upsert_dw_pedidos.py:173-181):
  * `row_number() OVER (PARTITION BY chave_nfe ORDER BY data_ultima_ocr_ts
  * DESC NULLS LAST, data_insercao DESC NULLS LAST)` keep rn=1.
  *
  * Scale notes: one hash-partition shuffle on the key, then a per-partition
  * sort — the canonical Spark plan (Exchange hashpartitioning → WindowExec).
  * At 100 TB the key (a 44-digit invoice id) is effectively unique-ish and
  * high-cardinality, so the shuffle is balanced; skew would only come from a
  * hot NULL key, which the reference filters out anyway (rn gate + NOT NULL).
  */
object Dedup {

  /** Keep the first row per key under `order`. */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** The reference's exact dedup: newest event per chave_nfe, with NULL keys
    * dropped (03_upsert_dw_pedidos.py:200-201). Expects typed columns. */
  def latestPedido(typed: DataFrame): DataFrame =
    latestPerKey(
      typed.filter(col("chave_nfe").isNotNull),
      Seq("chave_nfe"),
      Seq(col("data_ultima_ocr").desc_nulls_last,
        col("data_insercao").desc_nulls_last))
}
