package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Catalog surface for the medallion tables — the SQL-side addressing
  * SURVEY §1.1 sketches (`spark.sql.catalog` namespaces staging/dw/hist,
  * reference schemas at `sql/ddl_stg_pedidos:1`, `sql/ddl_fat_pedidos:1`,
  * `sql/ddl_hist_pedidos:6`): [[register]] creates the three namespaces
  * and external parquet tables over the SAME directories [[Pipeline]]
  * writes, so `spark.table("dw.fat_pedidos")` and
  * `spark.sql("SELECT ... FROM staging.stg_pedidos")` work next to the
  * path-addressed API with one storage copy.
  *
  * The DW table is declared PARTITIONED BY its [[Pipeline.dwPartitionCol]]
  * month column, so a catalog reader's month predicate prunes directories
  * exactly like [[Pipeline.readDwMonth]] — and because
  * [[Pipeline.atomicOverwrite]] swaps the directory under a FIXED
  * location, registration survives every rewrite; callers run [[refresh]]
  * after a write to drop stale file listings and re-sync the partition
  * set (MSCK ... SYNC PARTITIONS adds new months and drops vanished
  * ones). At 100 TB this is the metastore discipline: locations are
  * stable, partitions are discovered, and no query hard-codes a path. */
object GraftCatalog {

  val stagingTable = "staging.stg_pedidos"
  val dwTable = "dw.fat_pedidos"
  val histTable = "hist.archive_pedidos"

  private def ddl(schema: StructType): String = schema.toDDL

  private def createExternal(s: SparkSession, table: String,
      schema: StructType, path: String, partitionCols: Seq[String]): Unit = {
    // idempotent re-registration: the location is authoritative, so a
    // re-register (e.g. after a path change in tests) replaces the entry
    s.sql(s"DROP TABLE IF EXISTS $table")
    val partClause =
      if (partitionCols.isEmpty) ""
      else partitionCols.mkString(" PARTITIONED BY (", ", ", ")")
    s.sql(s"CREATE TABLE $table (${ddl(schema)}) USING parquet" +
      s"$partClause LOCATION '$path'")
  }

  /** Register the three medallion namespaces and tables over the
    * pipeline's directories. Safe before any data exists (an empty
    * location reads as an empty table) and idempotent. */
  def register(s: SparkSession, stagingPath: String, dwPath: String,
      histPath: String): Unit = {
    // an external table over a not-yet-written location must read as an
    // EMPTY table, not throw FileNotFound — materialize the directories
    // (idempotent; the pipeline's first write lands in them unchanged)
    Seq(stagingPath, dwPath, histPath).foreach(p =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p)))
    Seq("staging", "dw", "hist").foreach(db =>
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db"))
    createExternal(s, stagingTable, Schemas.stagingSchema, stagingPath, Nil)
    createExternal(s, dwTable,
      StructType(Schemas.fatSchema.fields :+
        StructField(Pipeline.dwPartitionCol, StringType)),
      dwPath, Seq(Pipeline.dwPartitionCol))
    createExternal(s, histTable, Schemas.histSchema, histPath, Nil)
    refresh(s)
  }

  /** Re-sync the catalog with the directories after a pipeline write:
    * refresh drops cached file listings (the swapped-in generation gets
    * picked up), MSCK SYNC re-discovers the DW month partitions (new
    * months appear, vanished ones drop). */
  def refresh(s: SparkSession): Unit = {
    Seq(stagingTable, dwTable, histTable).foreach(s.catalog.refreshTable)
    s.sql(s"MSCK REPAIR TABLE $dwTable SYNC PARTITIONS")
  }
}
