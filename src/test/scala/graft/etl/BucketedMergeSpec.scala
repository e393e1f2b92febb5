package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import java.sql.Timestamp

/** Scale evidence for the merge (SURVEY §4 / Merge scaladoc): persisting the
  * DW table bucketed by the merge key removes the DW-side shuffle from the
  * full-outer merge join — only the (small) update batch exchanges. At 100 TB
  * this is the difference between re-shuffling the warehouse every merge and
  * shuffling just the delta. */
class BucketedMergeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fatRow(key: String, evTs: Timestamp, origem: String): Row =
    Row(Schemas.fatSchema.fields.map { f =>
      f.name match {
        case "chave_nfe" => key
        case "data_ultima_ocr" => evTs
        case "arquivo_origem" => origem
        case "data_insercao" => ts("2024-01-01 00:00:00")
        case _ => null
      }
    }.toIndexedSeq: _*)

  private def mkFat(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Schemas.fatSchema)

  // exchanges are inserted by EnsureRequirements → executedPlan, not
  // sparkPlan; AQE is disabled in this scope so the plan isn't wrapped
  private def countShuffles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  test("bucketed DW eliminates its merge-side exchange; results identical") {
    // tiny test data would take a BroadcastNestedLoopJoin (no shuffle at
    // all); disable auto-broadcast to observe the at-scale SMJ plan shape
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try bucketedScenario()
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  private def bucketedScenario(): Unit = {
    val keys = (1 to 200).map(i => f"$i%044d")
    val dwRows = keys.map(k => fatRow(k, ts("2024-02-01 00:00:00"), "old.csv"))
    val updRows = keys.take(50).map(k => fatRow(k, ts("2024-03-01 00:00:00"), "new.csv"))

    spark.sql("DROP TABLE IF EXISTS dw_bucketed")
    mkFat(dwRows).write
      .bucketBy(8, "chave_nfe").sortBy("chave_nfe")
      .format("parquet").saveAsTable("dw_bucketed")

    val updates = mkFat(updRows)
    val mergedPlain = Merge.mergePedidos(mkFat(dwRows), updates)
    val mergedBucketed = Merge.mergePedidos(spark.table("dw_bucketed"), updates)

    val plainShuffles = countShuffles(mergedPlain)
    val bucketedShuffles = countShuffles(mergedBucketed)
    assert(plainShuffles >= 2, s"plain merge should shuffle both sides, got $plainShuffles")
    assert(bucketedShuffles == plainShuffles - 1,
      s"bucketed DW side must not exchange: plain=$plainShuffles bucketed=$bucketedShuffles")

    // same semantics either way
    val a = mergedPlain.orderBy("chave_nfe").collect()
    val b = mergedBucketed.orderBy("chave_nfe").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.count(_.getAs[String]("arquivo_origem") == "new.csv") == 50)
    spark.sql("DROP TABLE IF EXISTS dw_bucketed")
  }
}
