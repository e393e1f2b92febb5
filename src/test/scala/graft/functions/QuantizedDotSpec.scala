package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizedDotSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val df = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)), // 4+10+18 = 32
    (Seq(-2L, 7L), Seq(3L, -1L)), // -6-7 = -13
    (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")

  test("column API matches the higher-order composition") {
    val got = df.select(GraftFunctions.quantized_dot(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == Seq(32L, -13L, 0L))
    val viaHof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (s, v) => s + v))
      .as[Long].collect()
    assert(got.toSeq == viaHof.toSeq)
  }

  test("null propagation and prefix semantics") {
    val got = Seq((Option(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(GraftFunctions.quantized_dot(col("a"), col("b"))).collect()
    assert(got.head.isNullAt(0)) // null array → null result
    val prefix = Seq((Seq(2L, 3L, 9L), Seq(10L, 10L))).toDF("a", "b")
      .select(GraftFunctions.quantized_dot(col("a"), col("b"))).as[Long].collect()
    assert(prefix.head == 50L)
  }

  test("SQL registration (temp function + extensions builder)") {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("qd_test")
    val got = spark.sql("SELECT quantized_dot(a, b) FROM qd_test").as[Long].collect()
    assert(got.sorted.toSeq == Seq(-13L, 0L, 32L))
  }

  test("survives both codegen and interpreted paths on a large batch") {
    val big = spark.range(10000)
      .select(col("id"),
        transform(sequence(lit(0), lit(63)), i => i + col("id")).as("a"))
      .withColumn("dot", GraftFunctions.quantized_dot(col("a"), col("a")))
    // Σ (id+i)² for i in 0..63
    val r = big.filter(col("id") === 2).select("dot").as[Long].head()
    val expect = (0 until 64).map(i => (i + 2).toLong * (i + 2)).sum
    assert(r == expect)
    assert(big.agg(count(lit(1))).as[Long].head() == 10000)
  }
}
