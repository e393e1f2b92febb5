package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension — preference class (c) of the engine's
  * extension ladder (compose > custom Expression > custom
  * LogicalPlan/Strategy/SparkPlan > mapPartitions): a native AS-OF join.
  *
  * Spark has no as-of join operator. The engine's composed formulation
  * (`asof_join`, Relational3: tagged union + ignoreNulls last() window) is
  * the declarative answer and stays the default; THIS operator is the
  * physical-plan answer — the two produce identical rows (they share one
  * DuckDB ASOF oracle) and differ only in plan shape:
  *
  *   composed:  union both sides → one Exchange(user) → full Sort →
  *              Window(last) over probe+quote rows → filter probes back out
  *   native:    Exchange(key) + in-partition Sort on EACH side (planned by
  *              EnsureRequirements from requiredChildDistribution/Ordering,
  *              so AQE sizes them like any join shuffle) → one streaming
  *              zipPartitions merge pass, O(1) state: the single most
  *              recent quote row — never a window buffer
  *
  * At 100 TB the difference is material: the window plan carries quote
  * columns through the union for every probe row and pays the window
  * machinery; the merge join streams both sorted sides once — the classic
  * MERGE_ASOF/SortMergeJoin shape.
  *
  * Semantics (matches DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >=
  * r.t`): per probe row, the quote with the greatest time ≤ probe time for
  * the same key; unmatched probes emit NULL quote columns. Callers supply
  * NULL-free keys/times and at most one quote per (key, time) — the same
  * preconditions the composed query establishes (dedup + NULL filters). */
case class AsOfJoinNode(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, rk, lt, rt, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. Declares the same child requirements as a
  * sort-merge join (clustered on the key, sorted by (key, time) within
  * partitions) so EnsureRequirements co-partitions both sides and AQE
  * treats the exchanges like any join shuffle; execution is one forward
  * merge pass per partition holding exactly one buffered quote row. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // input schema marks the right side NULLABLE: bindReference takes
      // nullability from the INPUT attribute, and a non-nullable bound ref
      // would skip the null check and read garbage off the all-null row
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // O(1) merge state: the single most recent quote ≤ the probe frontier
      var lastQuote: InternalRow = null
      var lastQuoteKey: UnsafeRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l).copy() // rTimeProj below reuses its buffer class
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKeyProj(r)
          val c = keyOrd.compare(rk, lk)
          if (c < 0 || (c == 0 && timeOrd.compare(rTimeProj(r), lt) <= 0)) {
            lastQuote = r.copy()
            lastQuoteKey = rk.copy()
            rBuf.next()
          } else advancing = false
        }
        val matched = lastQuote != null && keyOrd.compare(lastQuoteKey, lk) == 0
        resultProj(joined(l, if (matched) lastQuote else nullRight))
      }
    }
  }
}

/** Engine API + session wiring for the native as-of join. */
object GraftAsOf {

  /** Idempotently add the planner strategy to an already-built session
    * (the GraftFunctions.register contract); sessions built with
    * `spark.sql.extensions=graft.functions.GraftExtensions` get it at
    * build time via injectPlannerStrategy instead. */
  def register(s: SparkSession): Unit = synchronized {
    val exp = GraftPlanShim.experimental(s)
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** AS-OF join `probe` to `quotes`: for each probe row, the quote row with
    * the greatest `quoteTime` ≤ `probeTime` on equal keys; NULL quote
    * columns when none exists. Column-name based, resolved against each
    * side's analyzed output. */
  def asof(probe: DataFrame, quotes: DataFrame,
      probeKeys: Seq[String], quoteKeys: Seq[String],
      probeTime: String, quoteTime: String): DataFrame = {
    val s = probe.sparkSession
    register(s)
    val lPlan = probe.queryExecution.analyzed
    val rPlan = quotes.queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asof: no column '$n' in [${plan.output.map(_.name).mkString(", ")}]"))
    GraftPlanShim.ofRows(s, AsOfJoinNode(
      probeKeys.map(attr(lPlan, _)), quoteKeys.map(attr(rPlan, _)),
      attr(lPlan, probeTime), attr(rPlan, quoteTime), lPlan, rPlan))
  }
}
