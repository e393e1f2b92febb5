package graft.queries

import graft.{SparkEntry, SparkSpec}

/** catalog_scan: catalog-name addressing resolves to the same data and
  * the same optimized scan as path addressing. */
class CatalogOpsSpec extends SparkSpec {

  test("catalog_scan ≡ the identical path-addressed aggregation") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val viaCatalog = SparkEntry.queries("catalog_scan")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val viaPath = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("date"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Util.cents(col("o_totalprice"))).as("total_cents"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaCatalog.nonEmpty)
    assert(viaCatalog == viaPath)
  }

  test("the date filter is PUSHED through the catalog relation to the scan") {
    val df = SparkEntry.queries("catalog_scan")(spark, "/root/testdata/sf0.001")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("o_orderdate"),
      s"expected a pushed o_orderdate filter in:\n$scan")
  }

  test("re-registration re-points the location (no stale reads across dirs)") {
    val a = SparkEntry.queries("catalog_scan")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(1)).sum
    val b = SparkEntry.queries("catalog_scan")(spark, "/root/testdata/sf0.01")
      .collect().map(_.getLong(1)).sum
    assert(b > a, s"sf0.01 ($b orders) must exceed sf0.001 ($a)")
    // and back again — the DROP+CREATE re-point is symmetric
    val a2 = SparkEntry.queries("catalog_scan")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(1)).sum
    assert(a2 == a)
  }
}
