package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Expression, LambdaFunction, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating parser that resolves `reduce_agg(input, init, f, g)` into a
  * pre-built [[AggregateExpression]] over [[ReduceAgg]] at PARSE time.
  * This cannot go through the function registry: the analyzer's
  * ResolveFunctions wraps registry aggregates in AggregateExpression and
  * then rejects any call whose original argument list contains a
  * LambdaFunction unless the wrapper itself is a HigherOrderFunction
  * (INVALID_LAMBDA_FUNCTION_CALL) — a check written for scalar HOFs that
  * no registry-registered aggregate can pass. Rewriting before analysis
  * sidesteps it; ResolveLambdaVariables then binds the lambdas on the
  * ReduceAgg node like any other higher-order function.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def isReduceAgg(u: UnresolvedFunction): Boolean =
    u.nameParts.length == 1 && u.nameParts.head.equalsIgnoreCase("reduce_agg")

  private def rewriteExpr(e: Expression): Expression = e.transformUp {
    case u: UnresolvedFunction if isReduceAgg(u) =>
      u.arguments match {
        case Seq(in, init, f: LambdaFunction, g: LambdaFunction) =>
          AggregateExpression(ReduceAgg(in, init, f, g), Complete, isDistinct = u.isDistinct)
        case other => throw new IllegalArgumentException(
          s"reduce_agg(input, initialState, inputFn, combineFn) expects two lambdas, got ${other.length} arguments")
      }
    case s: SubqueryExpression => s.withNewPlan(rewritePlan(s.plan))
  }

  private def rewritePlan(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e: Expression => rewriteExpr(e) }

  override def parsePlan(sqlText: String): LogicalPlan = rewritePlan(delegate.parsePlan(sqlText))
  override def parseExpression(sqlText: String): Expression = rewriteExpr(delegate.parseExpression(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = rewritePlan(delegate.parseQuery(sqlText))
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}
