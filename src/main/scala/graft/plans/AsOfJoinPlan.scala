package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.SparkSession

/** Native AS-OF JOIN — the whole-operator extension rung the prompt's
  * ladder reserves for semantics the built-ins can't express directly:
  * a custom logical node, a planner [[Strategy]] injected through
  * `SparkSessionExtensions.injectPlannerStrategy`, and a physical
  * [[AsOfJoinExec]] that declares its distribution/ordering needs and
  * lets EnsureRequirements place the exchanges and sorts.
  *
  * Semantics (left outer, backward): every left row is joined to the
  * LATEST right row of the same key with `rightTime <= leftTime`, or
  * nulls — DuckDB's `ASOF LEFT JOIN`, the feature-store
  * point-in-time rule (q49/q145 express the same thing by
  * union-tagged carry-forward windows; this operator is the dedicated
  * physical form: one co-partitioned sorted MERGE, no union frame, no
  * window state).
  *
  * Scale story: requiredChildDistribution clusters both sides on the
  * key (one hash Exchange each at most), requiredChildOrdering asks
  * for (key, time) sort, and the merge is a single forward pass per
  * partition holding ONE buffered right row — O(left + right) time,
  * O(1) state, the exact shape of SortMergeJoin's streamed side.
  * Restrictions (deliberate, for the showcase): LongType key,
  * TimestampType/LongType times (evaluated as long micros); no
  * codegen (doExecute only).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; injected via
  * [[GraftExtensions]] (`injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides clustered on the key — EnsureRequirements inserts the
    * (at most two) hash Exchanges and aligns partition counts. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  /** (key, time) per side — EnsureRequirements inserts the sorts. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions
      .Ascending), SortOrder(leftTime,
      org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions
      .Ascending), SortOrder(rightTime,
      org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  /** Rows stream out in left-partition order, so the operator PRESERVES
    * the left child's hash clustering — downstream key-compatible
    * aggregates/joins reuse it instead of re-shuffling (PlanSpec pins
    * this for q315's roll-up). Same contract SortMergeJoinExec declares
    * for its streamed side. */
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val schema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(schema, schema)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // one-row lookahead over the sorted right side
      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      // the latest right row already consumed, and its key
      var lastR: InternalRow = null
      var lastRKey = 0L
      lIter.map { l =>
        // NULL semantics (DuckDB ASOF parity): a NULL key or NULL time on
        // either side NEVER matches — boxed evals here; the raw
        // asInstanceOf[Long] unbox turned null into 0L, silently matching
        // key 0 / epoch 0 (r12 ADVICE). Ascending sort puts NULLS FIRST on
        // both sides, so null right rows are skipped as encountered and
        // null left rows emit the null-extended row before any real key.
        val lkA = lkB.eval(l)
        val ltA = ltB.eval(l)
        if (lkA == null || ltA == null) {
          proj(joined(l, nullRight))
        } else {
          val lk = lkA.asInstanceOf[Long]
          val lt = ltA.asInstanceOf[Long]
          // consume right rows with (key, time) <= (lk, lt)
          var advancing = true
          while (advancing && rNext != null) {
            val rkA = rkB.eval(rNext)
            if (rkA == null) {
              rNext = if (rIter.hasNext) rIter.next() else null
            } else {
              val rk = rkA.asInstanceOf[Long]
              val rtA = rtB.eval(rNext)
              if (rk < lk || (rk == lk &&
                  rtA != null && rtA.asInstanceOf[Long] <= lt)) {
                if (rtA != null) { // null-time rows are never candidates
                  lastR = rNext.copy() // buffered past iterator reuse
                  lastRKey = rk
                }
                rNext = if (rIter.hasNext) rIter.next() else null
              } else if (rk == lk && rtA == null) {
                // null time sorts first within the key group: skip past it
                rNext = if (rIter.hasNext) rIter.next() else null
              } else advancing = false
            }
          }
          val r = if (lastR != null && lastRKey == lk) lastR else nullRight
          proj(joined(l, r))
        }
      }
    }
  }
}

/** User-facing constructor: `AsOfJoinOps.asof(left, right, ...)` builds
  * the logical node from ANALYZED child frames (so the key/time
  * expressions are already-resolved attributes) and returns a DataFrame
  * through the bridge. The session must carry [[GraftExtensions]] (or
  * inject [[AsOfJoinStrategy]]) for the node to plan. */
object AsOfJoinOps {
  def asof(spark: SparkSession,
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): org.apache.spark.sql.DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output}"))
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      AsOfJoin(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime)))
  }
}
