package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd sorted-merge sparse dot product:
  * `sorted_dot(keys_a, weights_a, keys_b, weights_b)` where each `keys`
  * is a SORTED `array<bigint>` (token hashes) and `weights` the aligned
  * `array<double>`. Sums `w_a·w_b` over equal keys — the verification
  * inner loop of cosine-similarity pair joins (TF-IDF near-dup): the
  * groupBy-sum formulation must SHUFFLE one row per shared token per
  * candidate pair, which is what fills the disk at corpus scale; this
  * expression evaluates the whole dot inside the join condition instead,
  * allocation-free, inside WholeStageCodegen.
  *
  * Keys are xxhash64(token) — same collision stance as the shingle sets
  * in [[SortedIntersectCountExpr]] (~v²·2⁻⁶⁴, negligible).
  */
case class SortedDotExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val keysOk = Seq(first, third).forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    })
    val wsOk = Seq(second, fourth).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })
    if (keysOk && wsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<double>, array<bigint>, array<double>)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_dot"

  override def nullSafeEval(ka: Any, wa: Any, kb: Any, wb: Any): Any = {
    val xk = ka.asInstanceOf[ArrayData]; val xw = wa.asInstanceOf[ArrayData]
    val yk = kb.asInstanceOf[ArrayData]; val yw = wb.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var acc = 0.0
    val n = xk.numElements(); val m = yk.numElements()
    while (i < n && j < m) {
      val xi = xk.getLong(i); val yj = yk.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { acc += xw.getDouble(i) * yw.getDouble(j); i += 1; j += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ka, wa, kb, wb) => {
      // freshName, not fixed identifiers: two instances can land in one
      // codegen scope (tfidfPairs uses sorted_dot in both the join
      // condition and the projection) and fixed names would collide
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0;
         |double $acc = 0.0;
         |int $n = $ka.numElements(), $m = $kb.numElements();
         |while ($i < $n && $j < $m) {
         |  long $x = $ka.getLong($i); long $y = $kb.getLong($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { $acc += $wa.getDouble($i) * $wb.getDouble($j); $i++; $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): SortedDotExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

object SortedDotExpr {
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_dot",
      (exprs: Seq[Expression]) =>
        SortedDotExpr(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
}
