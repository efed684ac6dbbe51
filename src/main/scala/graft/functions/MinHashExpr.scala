package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused k-minhash: `minhash(hashes, k)` computes all k minimum values in
  * ONE pass over the input hash array — the builtin composition
  * `transform(sequence(0, k-1), s -> array_min(transform(hsh, ...)))`
  * materializes k intermediate arrays and walks the input k times. Each
  * seed's rehash is a splitmix64 finalizer over (hash ^ seeded-constant),
  * a standard minwise hash family. The shingle/minhash stage is pure
  * scan work — at corpus scale it IS the dedup pipeline's cost.
  *
  * Reference analog: SetDigest's k minwise registers
  * (`core/trino-main/.../type/setdigest/SetDigest.java`).
  */
case class MinHashExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, int) arguments")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"

  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(
      MinHash.compute(a.asInstanceOf[ArrayData].toLongArray(), b.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val gad = classOf[GenericArrayData].getName
      val helper = MinHash.getClass.getName.stripSuffix("$")
      s"${ev.value} = new $gad($helper.compute($a.toLongArray(), $b));"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashExpr =
    copy(left = newLeft, right = newRight)
}

object MinHash {
  /** min over the input of splitmix64(h ^ seedConst(s)) for each seed s —
    * one pass, k running minima, no intermediate arrays.
    */
  def compute(hashes: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val seeds = new Array[Long](k)
    var s = 0
    while (s < k) { seeds(s) = 0x9e3779b97f4a7c15L * (s + 1); s += 1 }
    var i = 0
    while (i < hashes.length) {
      val h0 = hashes(i)
      var j = 0
      while (j < k) {
        var x = h0 ^ seeds(j)
        x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
        x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
        x = x ^ (x >>> 31)
        if (x < out(j)) out(j) = x
        j += 1
      }
      i += 1
    }
    out
  }
}

object MinHashExpr {
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash",
      (exprs: Seq[Expression]) => MinHashExpr(exprs(0), exprs(1)),
      "built-in")
}
