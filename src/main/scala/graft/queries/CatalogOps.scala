package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-addressed querying — the table-name access path
  * [[graft.etl.GraftCatalog]] provides for the medallion tables (SURVEY
  * §1.1), exercised over the driver testdata: the query registers the
  * parquet directory as an external table in a `graft_td` namespace and
  * reads it back through `spark.table(...)` — proving the engine's SQL
  * surface resolves catalog names, infers the parquet schema, and pushes
  * filters/pruning through a catalog relation exactly as through a
  * path-addressed one (CatalogOpsSpec asserts the scan carries the
  * pushed filter). */
object CatalogOps {

  /** Idempotently (re-)register `dir`'s orders table under the
    * `graft_td` namespace — DROP + CREATE so a session that switches
    * scale dirs re-points the location instead of reading stale data. */
  private def registerOrders(s: SparkSession, dir: String): Unit = {
    s.sql("CREATE DATABASE IF NOT EXISTS graft_td")
    s.sql("DROP TABLE IF EXISTS graft_td.orders")
    s.sql(s"CREATE TABLE graft_td.orders USING parquet " +
      s"LOCATION '$dir/orders.parquet'")
  }

  /** Priority mix of 1995+ orders read via `spark.table` — counts and
    * exact integer cents per priority class. The date predicate reaches
    * the parquet scan as a pushed filter through the catalog relation. */
  private def catalogScan(s: SparkSession, dir: String): DataFrame = {
    registerOrders(s, dir)
    s.table("graft_td.orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("date"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Util.cents(col("o_totalprice"))).as("total_cents"))
      .orderBy("o_orderpriority")
  }

  private val catalogScanSql =
    s"""SELECT o_orderpriority,
       |  COUNT(*) AS n_orders,
       |  CAST(SUM(${Util.centsSql("o_totalprice")}) AS BIGINT) AS total_cents
       |FROM orders
       |WHERE o_orderdate >= DATE '1995-01-01'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("catalog_scan", catalogScan, Some(catalogScanSql)))
}
