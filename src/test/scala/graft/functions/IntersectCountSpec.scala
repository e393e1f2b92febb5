package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

/** `intersect_count` + `RewriteSizeOfIntersect` contract: exact
  * `size(array_intersect(l, r))` semantics on string/bigint arrays
  * (dups, NULL elements, NULL arrays, empties), the rewrite firing in
  * optimized plans of registered sessions, and NOT firing out of scope
  * (double arrays). Expected values are computed in plain Scala — never
  * by the builtin in the same session, where the rule would rewrite the
  * reference to the expression under test. */
class IntersectCountSpec extends SparkSpec with TableDrivenPropertyChecks {

  private def expected(a: Seq[String], b: Seq[String]): Int =
    if (a == null || b == null) -1 // sentinel: SQL NULL expected
    else a.distinct.count(x => (x == null && b.contains(null)) || (x != null && b.contains(x)))

  test("string semantics match size∘array_intersect including dups and NULL elements") {
    GraftFunctions.register(spark)
    val cases: Seq[(Seq[String], Seq[String])] = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b", "b"), Seq("a", "b")), // left dups count once
      (Seq("a", "b"), Seq("b", "b", "a", "a")), // right dups too
      (Seq(), Seq("a")),
      (Seq("a"), Seq()),
      (Seq(), Seq()),
      (Seq("a", null, "b"), Seq(null, "b")),    // null matches null
      (Seq(null, null), Seq(null)),             // null counts once
      (Seq("a", "b"), Seq(null)),               // null only right
      (null, Seq("a")),                          // NULL array → NULL
      (Seq("a"), null),
      (Seq("x", "y", "z"), Seq("p", "q")))
    import spark.implicits._
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        call_function("intersect_count", col("a"), col("b")).as("ic"))
    df.collect().zip(cases).foreach { case (r, (a, b)) =>
      val exp = expected(a, b)
      if (exp == -1) assert(r.isNullAt(2), s"case ($a, $b)")
      else assert(r.getInt(2) == exp, s"case ($a, $b)")
    }
  }

  test("bigint semantics, via the REWRITE on a registered session") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // RDD-backed source: a pure-literal LocalRelation would be constant-
    // folded into values before any optimizer rule could be observed
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (Seq(1L, 2L, 2L, 3L), Seq(2L, 3L, 3L, 4L)),
      (Seq(1L, 1L), Seq(1L)),
      (Seq(0L, -5L), Seq(-5L, 0L)),
      (Seq(7L), Seq(8L))), 2))
      .toDF("a", "b")
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    // the composed form must now BE the fused expression in the plan...
    assert(df.queryExecution.optimizedPlan.toString.contains("intersect_count"),
      df.queryExecution.optimizedPlan.toString)
    // ...and produce the composed form's values
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 2))
  }

  test("rewrite does NOT fire on double arrays (NaN semantics out of scope)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1.0, Double.NaN), Seq(Double.NaN, 2.0)))
      .toDF("a", "b")
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("intersect_count"))
    // Spark's own NaN-equal semantics preserved (array_intersect matches NaN)
    assert(df.collect().head.getInt(0) == 1)
  }

  test("fused and composed forms agree on randomized corpora (both codegen paths)") {
    GraftFunctions.register(spark)
    val r = new scala.util.Random(42)
    val cases = Seq.fill(200) {
      def arr() = Seq.fill(r.nextInt(12))(
        if (r.nextInt(10) == 0) null else s"w${r.nextInt(8)}")
      (arr(), arr())
    }
    import spark.implicits._
    val df = cases.toDF("a", "b")
      .select(call_function("intersect_count", col("a"), col("b")).as("ic"))
    val expectedVals = cases.map { case (a, b) => expected(a, b) }
    // generated code path (default)
    assert(df.collect().map(_.getInt(0)).toSeq == expectedVals)
    // interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.collect().map(_.getInt(0)).toSeq == expectedVals)
    finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("the hot verify path gets the fused expression: containment_prefix_pairs plan") {
    val df = graft.SparkEntry.queries("containment_prefix_pairs")(
      spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.optimizedPlan.toString.contains("intersect_count"),
      "row-local verify should be fused")
  }
}
