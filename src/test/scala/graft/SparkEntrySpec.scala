package graft

/** Driver-contract smoke: entry yields rows at sf0.001; every declared query
  * runs there; every query has distinct, stable column names. */
class SparkEntrySpec extends SparkSpec {

  test("entry (flagship ETL slice) returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq == graft.etl.Schemas.fatSchema.fieldNames.toSeq)
    // one row per key — the merge invariant
    assert(df.select("chave_nfe").distinct().count() == df.count())
  }

  test("every query runs at sf0.001 and returns rows") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.columns.distinct.length == df.columns.length, s"$name dup cols")
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
