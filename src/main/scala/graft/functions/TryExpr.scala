package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Trino's `TRY(expr)` (`core/trino-main/.../operator/scalar/TryFunction.java`):
  * evaluate the argument and yield NULL instead of failing on arithmetic
  * errors, bad casts, division by zero etc. Spark only has per-function
  * `try_*` variants; this is the generic form, registered as `try` so
  * Trino SQL text parses unchanged.
  *
  * CodegenFallback is deliberate: a catch-all needs a JVM try/catch frame
  * around arbitrary child code, which whole-stage codegen cannot inline.
  * TRY sites are error-edge paths, not scan-hot loops.
  */
case class TryExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "try"

  override def eval(input: InternalRow): Any =
    try child.eval(input)
    catch { case _: Exception => null }

  override protected def withNewChildInternal(newChild: Expression): TryExpr =
    copy(child = newChild)
}

object TryExpr {
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "try", (exprs: Seq[Expression]) => TryExpr(exprs.head), "built-in")
}
