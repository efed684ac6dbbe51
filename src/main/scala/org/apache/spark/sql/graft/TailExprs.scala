package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SpookyHashV2

/** regexp_position (JoniRegexpFunctions.java:325-384): 1-based codepoint
  * index of the `occurrence`-th match at/after codepoint `start`; -1 when
  * no such match. Empty matches advance one codepoint (the reference's
  * getNextStart). Scalar lookup, not a hot kernel — CodegenFallback.
  */
case class RegexpPositionExpr(
    source: Expression, pattern: Expression,
    start: Expression, occurrence: Expression)
    extends QuaternaryExpression with ExpectsInputTypes with CodegenFallback {

  override def first: Expression = source
  override def second: Expression = pattern
  override def third: Expression = start
  override def fourth: Expression = occurrence
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, IntegerType, IntegerType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_position"

  @transient private var lastPattern: String = _
  @transient private var compiled: java.util.regex.Pattern = _

  override def nullSafeEval(s: Any, p: Any, st: Any, oc: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    val pat = p.asInstanceOf[UTF8String].toString
    val startPos = st.asInstanceOf[Int]
    val occurN = oc.asInstanceOf[Int]
    if (startPos < 1)
      throw new IllegalArgumentException("start position cannot be smaller than 1")
    if (occurN < 1)
      throw new IllegalArgumentException("occurrence cannot be smaller than 1")
    if (startPos > str.codePointCount(0, str.length)) return -1
    if (compiled == null || lastPattern != pat) {
      compiled = java.util.regex.Pattern.compile(pat)
      lastPattern = pat
    }
    val m = compiled.matcher(str)
    var next = str.offsetByCodePoints(0, startPos - 1)
    var count = 0
    while (next <= str.length && m.find(next)) {
      count += 1
      if (count == occurN) return str.codePointCount(0, m.start()) + 1
      next =
        if (m.end() == m.start()) {
          if (m.start() < str.length) m.start() + Character.charCount(str.codePointAt(m.start()))
          else m.end() + 1
        } else m.end()
    }
    -1
  }

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression,
      third: Expression, fourth: Expression): Expression =
    copy(source = first, pattern = second, start = third, occurrence = fourth)
}

/** Polymorphic `cosine_similarity` — the reference's OWN signature is the
  * sparse map form (`MathFunctions.java:1313`,
  * `cosine_similarity(map(varchar,double), map(varchar,double))`); the
  * dense array form is this engine's embedding-column extension (kept
  * with its established semantics: length mismatch or zero norm → NULL).
  * Map semantics follow the reference exactly: a NULL map value → NULL,
  * zero norms are NOT guarded (0/0 → NaN, as the reference divides
  * unconditionally). Scalar dispatch, not a hot kernel (the codegen'd
  * dense path is `cosine_sim_native`) — CodegenFallback.
  */
case class CosineSimilarityAny(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  // def, not val: TypeCollection is not Serializable and must not become
  // a field of the (task-serialized) expression tree
  private def accepted: AbstractDataType =
    TypeCollection(ArrayType(DoubleType), MapType(StringType, DoubleType))
  override def inputTypes: Seq[AbstractDataType] = Seq(accepted, accepted)

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else (left.dataType, right.dataType) match {
      case (_: ArrayType, _: ArrayType) | (_: MapType, _: MapType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity arguments must both be array<double> or both " +
          s"map(varchar, double), got (${l.simpleString}, ${r.simpleString})")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = left.dataType match {
    case _: ArrayType =>
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n == 0 || n != y.numElements()) null
      else {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) return null
          val xi = x.getDouble(i); val yi = y.getDouble(i)
          dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
        }
        val d = math.sqrt(na) * math.sqrt(nb)
        if (d == 0.0) null else dot / d
      }
    case _ =>
      val lm = a.asInstanceOf[MapData]; val rm = b.asInstanceOf[MapData]
      val rk = rm.keyArray(); val rv = rm.valueArray()
      val lookup = new java.util.HashMap[UTF8String, java.lang.Double](rm.numElements() * 2)
      var i = 0
      var normR = 0.0
      while (i < rm.numElements()) {
        if (rv.isNullAt(i)) return null
        val v = rv.getDouble(i)
        normR += v * v
        lookup.put(rk.getUTF8String(i), java.lang.Double.valueOf(v))
        i += 1
      }
      val lk = lm.keyArray(); val lv = lm.valueArray()
      var dot = 0.0; var normL = 0.0
      i = 0
      while (i < lm.numElements()) {
        if (lv.isNullAt(i)) return null
        val v = lv.getDouble(i)
        normL += v * v
        val w = lookup.get(lk.getUTF8String(i))
        if (w != null) dot += v * w.doubleValue()
        i += 1
      }
      // unguarded division, per the reference (zero norm → NaN/Inf)
      dot / (math.sqrt(normL) * math.sqrt(normR))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
