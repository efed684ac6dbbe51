package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character n-gram hasher: `shingle_hashes(text, n)` returns the
  * SORTED array of distinct FNV-64 hashes of all n-character windows.
  *
  * Composing this from builtins
  * (`array_sort(transform(transform(sequence(...), substring...)))`)
  * costs O(len²): each `substring(s, i, n)` re-scans the UTF-8 bytes to
  * find the char offset, and the intermediate string arrays allocate per
  * window. One fused pass is O(len·log len) with a single long[] buffer —
  * on a 100 TB corpus the shingling stage is pure scan work, so this is
  * the operator's dominant cost.
  *
  * Output feeds [[SortedIntersectCountExpr]] (exact Jaccard) and minhash
  * signatures (reference analog: SetDigest,
  * `core/trino-main/.../type/setdigest/SetDigest.java`).
  */
case class ShingleHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int) arguments")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(
      ShingleHash.compute(a.asInstanceOf[UTF8String].toString, b.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gad = classOf[GenericArrayData].getName
      val helper = ShingleHash.getClass.getName.stripSuffix("$")
      s"${ev.value} = new $gad($helper.compute($a.toString(), $b));"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashesExpr =
    copy(left = newLeft, right = newRight)
}

object ShingleHash {
  /** Sorted distinct FNV-64 hashes of every n-char sliding window. */
  def compute(s: String, n: Int): Array[Long] = {
    if (n <= 0) return Array.empty
    val len = s.length
    val count = if (len <= n) 1 else len - n + 1
    val hashes = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 0xcbf29ce484222325L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
      hashes(i) = h
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // dedup in place
    var w = 0
    i = 0
    while (i < count) {
      if (w == 0 || hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    if (w == count) hashes else java.util.Arrays.copyOf(hashes, w)
  }
}

object ShingleHashesExpr {
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      (exprs: Seq[Expression]) => ShingleHashesExpr(exprs(0), exprs(1)),
      "built-in")
}
