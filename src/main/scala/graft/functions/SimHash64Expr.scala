package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenizer + 64-bit simhash: `simhash64_native(text)` ≡
  * `simhash64(split(text, ' '))` (same FNV-1a-per-token bit voting as the
  * registered UDF) but computed in one pass over the UTF-8 bytes — token
  * boundaries are the 0x20 byte, which never occurs inside a multibyte
  * sequence, so no per-token string or array is ever allocated and the
  * expression stays inside whole-stage codegen. On a 100 TB corpus the
  * signature stage is pure scan work; the UDF boundary (deserialize row →
  * split → Seq[String] → box) was the dominant per-row cost.
  *
  * Reference analog for the fingerprint-based near-dup family: SetDigest
  * (`core/trino-main/.../type/setdigest/SetDigest.java`).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_native"

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = SimHash.getClass.getName.stripSuffix("$")
      s"${ev.value} = $helper.compute($a.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash {
  /** Simhash of the space-delimited segments of a UTF-8 buffer. Empty
    * segments vote too (split semantics: `split("", " ") == [""]`), so
    * the result is bit-identical to the array-of-tokens UDF path.
    */
  def compute(bytes: Array[Byte]): Long = {
    val acc = new Array[Int](64)
    val len = bytes.length
    var segStart = 0
    while (segStart <= len) {
      var h = 0xcbf29ce484222325L
      var j = segStart
      while (j < len && bytes(j) != 0x20) { h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
      segStart = j + 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

object SimHash64Expr {
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64_native",
      (exprs: Seq[Expression]) => SimHash64Expr(exprs.head),
      "built-in")
}
