package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import graft.functions.QDigest

/** `qdigest_agg(x)` / `merge_qdigest(sketch)` — true q-digest aggregates
  * (reference `QuantileDigestAggregationFunction.java`); the live digest
  * is the buffer, serialization to the array<bigint> wire form happens
  * only at shuffle boundaries and eval.
  */
abstract class QDigestAggBase extends TypedImperativeAggregate[QDigest]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QDigest = QDigest()

  override def merge(buffer: QDigest, other: QDigest): QDigest = buffer.merge(other)

  override def eval(buffer: QDigest): Any = {
    buffer.compress()
    new GenericArrayData(buffer.serialize())
  }

  override def serialize(buffer: QDigest): Array[Byte] = {
    buffer.compress() // ship the compact form
    val longs = buffer.serialize()
    val out = new Array[Byte](longs.length * 8)
    val bb = java.nio.ByteBuffer.wrap(out)
    longs.foreach(bb.putLong)
    out
  }

  override def deserialize(bytes: Array[Byte]): QDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val longs = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < longs.length) { longs(i) = bb.getLong(); i += 1 }
    QDigest.deserialize(longs)
  }
}

case class QDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends QDigestAggBase {

  override def prettyName: String = "qdigest_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"qdigest_agg expects a numeric input, got ${other.sql}")
    }

  @transient private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def update(buffer: QDigest, row: InternalRow): QDigest = {
    val v = child.eval(row)
    if (v != null) {
      val d = toDouble(v)
      if (!d.isNaN) buffer.add(d)
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QDigestAgg =
    copy(child = newChild)
}

case class QDigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends QDigestAggBase {

  override def prettyName: String = "merge_qdigest"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"merge_qdigest expects a qdigest (array<bigint>), got ${other.sql}")
    }

  override def update(buffer: QDigest, row: InternalRow): QDigest = {
    val v = child.eval(row)
    if (v != null)
      buffer.merge(QDigest.deserialize(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QDigestMergeAgg =
    copy(child = newChild)
}

object QDigestAgg {
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("qdigest_agg",
      (exprs: Seq[Expression]) => QDigestAgg(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("merge_qdigest",
      (exprs: Seq[Expression]) => QDigestMergeAgg(exprs.head), "built-in")
  }
}
