package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expression: exact int64 dot product of two
  * `array<bigint>` columns (quantized embedding vectors).
  *
  * This replaces the `aggregate(zip_with(a, b, _*_), 0L, _+_)` composition in
  * the similarity operators: higher-order functions evaluate their lambda
  * per element through the interpreter (closure dispatch + per-element
  * boxing + an intermediate zipped array), while this expression is one
  * tight primitive loop in both interpreted and generated code — the
  * preference-order (b) case of SURVEY §7.4: a scalar op Spark can't express
  * efficiently with built-ins, small enough to not need a custom operator.
  *
  * NULL elements contribute 0 (quantized vectors never contain them; the
  * guard keeps the expression total). Mismatched lengths dot the common
  * prefix.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantized_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Engine function registry: Column builders + SQL registration. */
object GraftFunctions {

  /** Exact int64 dot product of two array<bigint> columns (codegen'd).
    * Resolves through the session FunctionRegistry — call [[register]] on
    * the session first (query fns below do it idempotently). */
  def quantized_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("quantized_dot", a, b)

  private val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "quantized_dot" -> (exprs => QuantizedDot(exprs.head, exprs(1))),
    "intersect_count" -> (exprs => IntersectCount(exprs.head, exprs(1))),
    "canon_norm" -> (exprs => CanonNorm(exprs.head)))

  /** Make the functions callable from SQL in an existing session, and
    * inject [[RewriteSizeOfIntersect]] into the session's optimizer (the
    * public `experimental.extraOptimizations` hook works on an ALREADY
    * BUILT session — no SparkSessionExtensions rebuild needed — and the
    * idempotence guard keeps repeated register() calls from stacking the
    * rule). */
  def register(spark: SparkSession): Unit = {
    registry.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    val withIntersect = {
      val cur = spark.experimental.extraOptimizations
      if (cur.contains(RewriteSizeOfIntersect)) cur
      else cur :+ RewriteSizeOfIntersect
    }
    spark.experimental.extraOptimizations =
      if (withIntersect.contains(RewriteCanonNorm)) withIntersect
      else withIntersect :+ RewriteCanonNorm
  }
}

/** SparkSessionExtensions hook: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) get the engine
  * functions as first-class SQL functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
      (exprs: Seq[Expression]) => QuantizedDot(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[IntersectCount].getName, "intersect_count"),
      (exprs: Seq[Expression]) => IntersectCount(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("canon_norm"),
      new ExpressionInfo(classOf[CanonNorm].getName, "canon_norm"),
      (exprs: Seq[Expression]) => CanonNorm(exprs.head)))
    e.injectOptimizerRule(_ => RewriteSizeOfIntersect)
    e.injectOptimizerRule(_ => RewriteCanonNorm)
    // whole-operator extension (class (c)): the native as-of merge join
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
