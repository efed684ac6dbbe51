package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd sorted-merge intersection count over two pre-sorted
  * `array<bigint>` columns — the inner loop of exact set-similarity joins
  * (n-gram Jaccard dedup). `array_intersect` builds a hash set per row
  * evaluation; on millions of candidate pairs that allocation dominates.
  * A merge over sorted primitive longs is branch-cheap, allocation-free
  * and stays inside WholeStageCodegen — this is what makes exact-Jaccard
  * verification viable on 100 TB-scale candidate sets.
  *
  * Sets are represented as sorted xxhash64 values of their elements
  * (collision probability ~n²/2⁻⁶⁴ — negligible vs. any sampling noise).
  * Reference analog: the intersection path in SetDigest
  * (`core/trino-main/.../type/setdigest/SetDigest.java`).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed identifiers — two instances in one codegen
      // scope (e.g. join condition + projection) must not collide
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |int $n = $a.numElements(), $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      (exprs: Seq[Expression]) => SortedIntersectCountExpr(exprs(0), exprs(1)),
      "built-in")
}
