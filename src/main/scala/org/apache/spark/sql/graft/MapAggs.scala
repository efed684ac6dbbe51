package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Generic key/value aggregates registered under the reference's SQL
  * names (`core/trino-main/.../aggregation/`): `histogram` (value →
  * count), `map_agg` (first value per key), `multimap_agg` (key → array
  * of values), the type-dispatched sketch `merge`, and the Ben-Haim &
  * Tom-Tov streaming `numeric_histogram`. All are
  * TypedImperativeAggregates whose state serializes through an
  * UnsafeProjection of the OUTPUT map type — the same single-field-row
  * trick `ReduceAgg` uses, so partial aggregation and shuffle-side merge
  * work untyped.
  */
abstract class MapLikeAgg extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, Any]] {

  override def nullable: Boolean = true
  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Any] =
    mutable.LinkedHashMap.empty

  protected def keyType: DataType

  // state <-> bytes through the output map type
  @transient private lazy val proj = UnsafeProjection.create(Array(dataType))
  override def serialize(buffer: mutable.LinkedHashMap[Any, Any]): Array[Byte] =
    proj(InternalRow(evalMap(buffer))).getBytes
  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    fromMapData(row.get(0, dataType).asInstanceOf[MapData])
  }

  protected def evalMap(buffer: mutable.LinkedHashMap[Any, Any]): MapData = {
    val keys = new GenericArrayData(buffer.keys.toArray)
    val values = new GenericArrayData(buffer.values.toArray)
    new ArrayBasedMapData(keys, values)
  }
  protected def fromMapData(m: MapData): mutable.LinkedHashMap[Any, Any]

  override def eval(buffer: mutable.LinkedHashMap[Any, Any]): Any =
    if (buffer.isEmpty) null else evalMap(buffer)
}

/** histogram(x) → map(x, bigint) — per-value counts
  * (reference Histogram.java).
  */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MapLikeAgg with UnaryLike[Expression] {

  override def prettyName: String = "histogram"
  override protected def keyType: DataType = child.dataType
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: AtomicType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"histogram expects an atomic key type, got ${other.sql}")
  }

  override def update(buffer: mutable.LinkedHashMap[Any, Any], row: InternalRow)
      : mutable.LinkedHashMap[Any, Any] = {
    val v = child.eval(row)
    if (v != null) {
      val k = InternalRow.copyValue(v)
      buffer.update(k, buffer.getOrElse(k, 0L).asInstanceOf[Long] + 1L)
    }
    buffer
  }

  override def merge(a: mutable.LinkedHashMap[Any, Any], b: mutable.LinkedHashMap[Any, Any])
      : mutable.LinkedHashMap[Any, Any] = {
    b.foreach { case (k, n) =>
      a.update(k, a.getOrElse(k, 0L).asInstanceOf[Long] + n.asInstanceOf[Long])
    }
    a
  }

  override protected def fromMapData(m: MapData): mutable.LinkedHashMap[Any, Any] = {
    val out = mutable.LinkedHashMap.empty[Any, Any]
    m.foreach(keyType, LongType, (k, v) => out.update(InternalRow.copyValue(k), v))
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistogramAgg =
    copy(child = newChild)
}

/** map_agg(k, v) → map(k, v), first value per key kept
  * (reference MapAggregationFunction.java).
  */
case class MapAggAgg(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MapLikeAgg with BinaryLike[Expression] {

  override def prettyName: String = "map_agg"
  override def left: Expression = key
  override def right: Expression = value
  override protected def keyType: DataType = key.dataType
  override def dataType: DataType =
    MapType(key.dataType, value.dataType, valueContainsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case _: AtomicType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"map_agg expects an atomic key type, got ${other.sql}")
  }

  override def update(buffer: mutable.LinkedHashMap[Any, Any], row: InternalRow)
      : mutable.LinkedHashMap[Any, Any] = {
    val k = key.eval(row)
    if (k != null) {
      val kc = InternalRow.copyValue(k)
      if (!buffer.contains(kc))
        buffer.update(kc, InternalRow.copyValue(value.eval(row)))
    }
    buffer
  }

  override def merge(a: mutable.LinkedHashMap[Any, Any], b: mutable.LinkedHashMap[Any, Any])
      : mutable.LinkedHashMap[Any, Any] = {
    b.foreach { case (k, v) => if (!a.contains(k)) a.update(k, v) }
    a
  }

  override protected def fromMapData(m: MapData): mutable.LinkedHashMap[Any, Any] = {
    val out = mutable.LinkedHashMap.empty[Any, Any]
    m.foreach(keyType, value.dataType,
      (k, v) => out.update(InternalRow.copyValue(k), InternalRow.copyValue(v)))
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MapAggAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapAggAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : MapAggAgg = copy(key = newLeft, value = newRight)
}

/** multimap_agg(k, v) → map(k, array(v)) — all values per key in
  * arrival order (reference MultimapAggregationFunction.java).
  */
case class MultimapAggAgg(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MapLikeAgg with BinaryLike[Expression] {

  override def prettyName: String = "multimap_agg"
  override def left: Expression = key
  override def right: Expression = value
  override protected def keyType: DataType = key.dataType
  private def valueArrayType: ArrayType = ArrayType(value.dataType, containsNull = true)
  override def dataType: DataType =
    MapType(key.dataType, valueArrayType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case _: AtomicType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multimap_agg expects an atomic key type, got ${other.sql}")
  }

  override def update(buffer: mutable.LinkedHashMap[Any, Any], row: InternalRow)
      : mutable.LinkedHashMap[Any, Any] = {
    val k = key.eval(row)
    if (k != null) {
      val kc = InternalRow.copyValue(k)
      val vs = buffer.getOrElseUpdate(kc, mutable.ArrayBuffer.empty[Any])
        .asInstanceOf[mutable.ArrayBuffer[Any]]
      vs += InternalRow.copyValue(value.eval(row))
    }
    buffer
  }

  override def merge(a: mutable.LinkedHashMap[Any, Any], b: mutable.LinkedHashMap[Any, Any])
      : mutable.LinkedHashMap[Any, Any] = {
    b.foreach { case (k, vs) =>
      val acc = a.getOrElseUpdate(k, mutable.ArrayBuffer.empty[Any])
        .asInstanceOf[mutable.ArrayBuffer[Any]]
      acc ++= vs.asInstanceOf[mutable.ArrayBuffer[Any]]
    }
    a
  }

  override protected def evalMap(buffer: mutable.LinkedHashMap[Any, Any]): MapData = {
    val keys = new GenericArrayData(buffer.keys.toArray)
    val values = new GenericArrayData(buffer.values.toArray.map(vs =>
      new GenericArrayData(vs.asInstanceOf[mutable.ArrayBuffer[Any]].toArray): Any))
    new ArrayBasedMapData(keys, values)
  }

  override protected def fromMapData(m: MapData): mutable.LinkedHashMap[Any, Any] = {
    val out = mutable.LinkedHashMap.empty[Any, Any]
    m.foreach(keyType, valueArrayType, (k, v) => {
      val buf = mutable.ArrayBuffer.empty[Any]
      v.asInstanceOf[ArrayData].foreach(value.dataType, (_, e) => buf += InternalRow.copyValue(e))
      out.update(InternalRow.copyValue(k), buf)
    })
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultimapAggAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultimapAggAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : MultimapAggAgg = copy(key = newLeft, value = newRight)
}

/** merge(sketch) — the reference's polymorphic sketch rollup, dispatched
  * on the input type: binary = HLL (`MergeHyperLogLogAggregation`),
  * array&lt;bigint&gt; = qdigest (`MergeQuantileDigestFunction`). The
  * tdigest/setdigest reprs live behind typed Aggregators with their own
  * merge_* spellings.
  */
case class MergeSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Any] with UnaryLike[Expression] {

  override def prettyName: String = "merge"
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  private def isQdigest: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"merge expects an HLL (binary) or qdigest (array<bigint>) sketch, got ${other.sql}")
  }

  override def createAggregationBuffer(): Any = null

  private def merge2(a: Any, b: Any): Any = {
    if (a == null) return b
    if (b == null) return a
    if (isQdigest) {
      val qa = graft.functions.QDigest.deserialize(
        a.asInstanceOf[ArrayData].toLongArray())
      val qb = graft.functions.QDigest.deserialize(
        b.asInstanceOf[ArrayData].toLongArray())
      new GenericArrayData(qa.merge(qb).serialize())
    } else {
      // mergeInPlace indexes a fixed register count into both arrays;
      // validate up front (mirroring the qdigest deserialize checks) so a
      // malformed binary value raises a clear error, not an AIOOBE
      val ba = a.asInstanceOf[Array[Byte]]
      val bb = b.asInstanceOf[Array[Byte]]
      val m = graft.functions.Hll.M
      if (ba.length != m || bb.length != m)
        throw new IllegalArgumentException(
          s"merge: malformed HLL sketch (${ba.length}/${bb.length} bytes, expected $m)")
      graft.functions.Hll.mergeInPlace(ba.clone(), bb)
    }
  }

  override def update(buffer: Any, row: InternalRow): Any = {
    val v = child.eval(row)
    if (v == null) buffer
    else merge2(buffer, InternalRow.copyValue(v))
  }
  override def merge(a: Any, b: Any): Any = merge2(a, b)
  override def eval(buffer: Any): Any = buffer

  @transient private lazy val proj = UnsafeProjection.create(Array(dataType))
  override def serialize(buffer: Any): Array[Byte] =
    proj(InternalRow(buffer)).getBytes
  override def deserialize(bytes: Array[Byte]): Any = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    InternalRow.copyValue(row.get(0, dataType))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MergeSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MergeSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MergeSketchAgg =
    copy(child = newChild)
}

/** numeric_histogram(buckets, x) → map(double, double): the Ben-Haim &
  * Tom-Tov streaming histogram the reference uses
  * (`NumericHistogram.java`): keep at most `buckets` centroids, merging
  * the closest adjacent pair on overflow. Mergeable, bounded state.
  */
case class NumericHistogramAgg(
    buckets: Expression,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Double)]]
    with BinaryLike[Expression] {

  override def prettyName: String = "numeric_histogram"
  override def nullable: Boolean = true
  override def left: Expression = buckets
  override def right: Expression = child
  override def dataType: DataType = MapType(DoubleType, DoubleType, valueContainsNull = false)

  @transient private lazy val b: Int = buckets.eval(InternalRow.empty) match {
    case n: Number if n.intValue() >= 2 => n.intValue()
    case other => throw new IllegalArgumentException(
      s"numeric_histogram bucket count must be a constant >= 2, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!buckets.foldable)
      TypeCheckResult.TypeCheckFailure("numeric_histogram bucket count must be constant")
    else child.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"numeric_histogram expects a numeric value, got ${other.sql}")
    }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Double)] =
    mutable.ArrayBuffer.empty

  /** Insert keeping the buffer sorted by centroid; compress on overflow
    * by merging the closest adjacent pair (BHTT update rule).
    */
  private def insert(buf: mutable.ArrayBuffer[(Double, Double)], x: Double, w: Double): Unit = {
    val i = buf.indexWhere(_._1 >= x)
    if (i >= 0 && buf(i)._1 == x) buf(i) = (x, buf(i)._2 + w)
    else if (i < 0) buf.append((x, w))
    else buf.insert(i, (x, w))
    compress(buf)
  }

  private def compress(buf: mutable.ArrayBuffer[(Double, Double)]): Unit =
    while (buf.length > b) {
      var best = 0; var bestGap = Double.MaxValue
      var i = 0
      while (i < buf.length - 1) {
        val gap = buf(i + 1)._1 - buf(i)._1
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val (x1, w1) = buf(best); val (x2, w2) = buf(best + 1)
      buf(best) = ((x1 * w1 + x2 * w2) / (w1 + w2), w1 + w2)
      buf.remove(best + 1)
    }

  @transient private lazy val toDouble: Any => Double = child.dataType match {
    case _: IntegralType => v => v.asInstanceOf[Number].longValue().toDouble
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case DoubleType => v => v.asInstanceOf[Double]
    case d: DecimalType => v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }

  override def update(buf: mutable.ArrayBuffer[(Double, Double)], row: InternalRow)
      : mutable.ArrayBuffer[(Double, Double)] = {
    val v = child.eval(row)
    if (v != null) insert(buf, toDouble(v), 1.0)
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Double)],
      other: mutable.ArrayBuffer[(Double, Double)]): mutable.ArrayBuffer[(Double, Double)] = {
    other.foreach { case (x, w) => insert(a, x, w) }
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any =
    if (buf.isEmpty) null
    else new ArrayBasedMapData(
      new GenericArrayData(buf.map(_._1).toArray),
      new GenericArrayData(buf.map(_._2).toArray))

  @transient private lazy val proj = UnsafeProjection.create(Array(dataType))
  override def serialize(buf: mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val m = if (buf.isEmpty)
      new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any]))
    else eval(buf).asInstanceOf[MapData]
    proj(InternalRow(m)).getBytes
  }
  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Double)] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val m = row.get(0, dataType).asInstanceOf[MapData]
    val out = mutable.ArrayBuffer.empty[(Double, Double)]
    m.foreach(DoubleType, DoubleType,
      (k, v) => out += ((k.asInstanceOf[Double], v.asInstanceOf[Double])))
    out.sortInPlaceBy(_._1)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): NumericHistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NumericHistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : NumericHistogramAgg = copy(buckets = newLeft, child = newRight)
}

/** checksum(x) — the reference's ChecksumAggregationFunction
  * (`core/trino-main/.../aggregation/ChecksumAggregationFunction.java`):
  * an order-independent ADDITIVE accumulation of xxhash64(x) * PRIME64
  * over wrapping 64-bit arithmetic, with a distinct +PRIME64 contribution
  * per NULL row. Addition (unlike xor) does NOT cancel duplicate rows
  * pairwise — checksum({x,x}) != checksum({}) — which is the aggregate's
  * main use: detecting duplicated/dropped rows between two relations.
  * DeclarativeAggregate with EvalMode.LEGACY add/multiply so the wrapping
  * semantics survive ANSI mode and stay inside whole-stage codegen.
  */
case class ChecksumAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  private val Prime64 = Literal(0x9E3779B185EBCA87L)
  override def prettyName: String = "checksum"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  private lazy val acc = AttributeReference("checksum", LongType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = acc :: Nil
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    Add(acc,
      If(IsNull(child), Prime64,
        Multiply(new XxHash64(Seq(child)), Prime64, EvalMode.LEGACY)),
      EvalMode.LEGACY))
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Add(acc.left, acc.right, EvalMode.LEGACY))
  override lazy val evaluateExpression: Expression = acc
  override protected def withNewChildInternal(newChild: Expression): ChecksumAgg =
    copy(child = newChild)
}

object MapAggs {
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("histogram",
      es => HistogramAgg(es.head), "built-in")
    reg.createOrReplaceTempFunction("map_agg",
      es => MapAggAgg(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("multimap_agg",
      es => MultimapAggAgg(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("merge",
      es => MergeSketchAgg(es.head), "built-in")
    reg.createOrReplaceTempFunction("numeric_histogram",
      es => NumericHistogramAgg(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("checksum",
      es => ChecksumAgg(es.head), "built-in")
    // geometric_mean = exp(avg(ln x)), with non-positive inputs poisoning
    // the mean to NaN as in the reference's GeometricMeanAggregations
    // (Spark's ln alone would return NULL for x <= 0 and avg would then
    // silently SKIP the row — a different answer)
    reg.createOrReplaceTempFunction("geometric_mean",
      es => {
        val x = es.head
        val ln = CaseWhen(
          Seq(LessThanOrEqual(x, Literal(0)) -> Literal(Double.NaN)),
          Some(Log(x)))
        Exp(aggregate.Average(ln).toAggregateExpression())
      }, "built-in")
  }
}
