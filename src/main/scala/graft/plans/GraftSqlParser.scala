package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL-SYNTAX extension seam — the fourth and last injection point the
  * reference's pluggable design implies (it hand-rolls a full SQL layer,
  * `src/sql/parser.rs` + `src/sql/planner.rs`; Spark's counterpart for
  * "my library adds a statement the stock grammar lacks" is
  * `SparkSessionExtensions.injectParser`). This parser delegates EVERY
  * stock production to Spark's own parser untouched and recognizes ONE
  * extra statement:
  *
  *   ASOF JOIN <left> KEY <lk> TIME <lt> TO <right> KEY <rk> TIME <rt>
  *
  * which plans to the native [[AsOfJoin]] operator (AsOfJoinPlan.scala)
  * — so the custom physical merge is reachable from pure SQL, the same
  * way DuckDB exposes `ASOF LEFT JOIN`. Table names may be multipart
  * (`catalog.db.tbl`) and resolve through the normal relation-resolution
  * path (temp views included); key/time names resolve strictly PER SIDE
  * via [[ResolveAsOfJoin]], so the common "both sides call it user_id"
  * shape is not ambiguous (generic ResolveReferences would refuse it).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private val Asof =
    ("""(?is)\s*ASOF\s+JOIN\s+([\w.]+)\s+KEY\s+(\w+)\s+TIME\s+(\w+)""" +
      """\s+TO\s+([\w.]+)\s+KEY\s+(\w+)\s+TIME\s+(\w+)\s*""").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Asof(l, lk, lt, r, rk, rt) =>
      UnresolvedAsOfJoin(
        UnresolvedRelation(l.split('.').toIndexedSeq),
        UnresolvedRelation(r.split('.').toIndexedSeq),
        lk, rk, lt, rt)
    case _ => delegate.parsePlan(sqlText)
  }

  /** MUST delegate explicitly: the interface default drops the
    * parameter context on the floor (it just calls parsePlan), which
    * left q220's named parameters unbound. The ASOF statement takes no
    * parameters, so the custom arm routes through parsePlan. */
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan = sqlText match {
    case Asof(_*) => parsePlan(sqlText)
    case _ => delegate.parsePlanWithParameters(sqlText, ctx)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Parse-time form of the ASOF statement: key/time names stay STRINGS
  * (not UnresolvedAttributes), so the analyzer's generic expression
  * resolution cannot touch them — [[ResolveAsOfJoin]] is the only rule
  * that resolves them, per side. `resolved = false` forces the analyzer
  * to keep iterating until the rewrite to [[AsOfJoin]] happens.
  */
case class UnresolvedAsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String) extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Analyzer extension (`injectResolutionRule`): once both children are
  * resolved, bind each key/time name against ITS OWN side and rewrite to
  * the executable [[AsOfJoin]] node. */
object ResolveAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j: UnresolvedAsOfJoin if j.childrenResolved =>
        def res(side: LogicalPlan, name: String): Expression =
          side.resolve(Seq(name), conf.resolver).getOrElse(
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "FIELD_NOT_FOUND",
              messageParameters = Map(
                "fieldName" -> name,
                "fields" -> side.output.map(_.name).mkString(", "))))
        AsOfJoin(j.left, j.right,
          res(j.left, j.leftKey), res(j.right, j.rightKey),
          res(j.left, j.leftTime), res(j.right, j.rightTime))
    }
}
