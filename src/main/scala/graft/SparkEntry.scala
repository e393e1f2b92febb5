package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Dedup, Merge, Schemas, Typed}
import graft.queries._

/** Driver contract — see SURVEY.md §7 and the per-group scaladocs under
  * graft.queries. */
object SparkEntry {

  /** Flagship query (SURVEY §7.2): the reference's stages 2+3 fused — an
    * all-string staging batch (synthesized from sf0.001 orders in the
    * reference's own input formats) through the typed projection, the
    * latest-per-key window dedup, and the conditional merge into an empty
    * DW. One Catalyst plan: scan → projection (codegen) → Exchange(key) →
    * Window → filter → full-outer merge join → resolve projection. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val key = col("o_orderkey")
    val staged = o.select(Schemas.colunasDestino.map {
      case "id" => key.cast("string").as("id")
      case "pedido" => concat(lit("P"), key).as("pedido")
      case "chave_nfe" => lpad(key.cast("string"), 44, "0").as("chave_nfe")
      case "valor_nfe" =>
        concat(floor(col("o_totalprice")).cast("long"), lit(","),
          lpad((key % 100).cast("string"), 2, "0")).as("valor_nfe")
      case "peso" => concat((key % 500).cast("string"), lit(",5")).as("peso")
      case "qtd_volumes" => (key % 9).cast("string").as("qtd_volumes")
      case "data_nfe" => date_format(col("o_orderdate"), "dd/MM/yyyy").as("data_nfe")
      case "data_ultima_ocr" =>
        date_format(col("o_orderdate"), "dd/MM/yyyy HH:mm:ss").as("data_ultima_ocr")
      case "data_insercao" =>
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("data_insercao")
      case "uf" => when(key % 2 === 0, lit("SP")).otherwise(lit("rj")).as("uf")
      case "arquivo_origem" => lit("orders_backfill.csv").as("arquivo_origem")
      case other => lit("").as(other)
    }: _*)
    val typed = Typed.project(staged)
    val updates = Dedup.latestPedido(typed)
    val emptyDw = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.fatSchema)
    Merge.mergePedidos(emptyDw, updates)
  }

  /** All implemented operators, one entry each (SURVEY §2 inventory). */
  private val groups: Seq[Q] =
    EtlQueries.all ++ Relational.all ++ Relational2.all ++ Relational3.all ++
      TextOps.all ++ DedupOps.all ++ SimilarityOps.all ++ MultimodalOps.all ++
      CorpusOps.all ++ PrivacyOps.all ++ FunnelOps.all ++ RobustStatsOps.all ++
      DiagOps.all ++ GraphOps.all ++ PqOps.all ++ CatalogOps.all ++
      UnigramOps.all ++ LmOps.all ++ CurationOps.all ++ SketchOps.all ++
      CorpusStatsOps.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    groups.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
