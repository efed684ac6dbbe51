package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** `reduce_agg(input, initialState, (s, x) -> ..., (s1, s2) -> ...)` —
  * the reference's generic lambda aggregate
  * (`core/trino-main/.../operator/aggregation/ReduceAggregationFunction
  * .java`): fold input values into a state with the input lambda, combine
  * partial states with the combine lambda. The state type is the initial
  * value's type; null inputs are ignored (SQL aggregate convention), and
  * like the reference the state must not be array/map-typed (use array_agg
  * + lambdas for that).
  *
  * Implemented as a TypedImperativeAggregate whose lambdas bind through
  * the analyzer's HigherOrderFunction machinery, so partial aggregation
  * (map-side combine) applies — the combine lambda IS the merge, which is
  * what makes this distribute; a fold-only definition would not.
  */
case class ReduceAgg(
    input: Expression,
    initialState: Expression,
    inputFunction: Expression,
    combineFunction: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Any] with HigherOrderFunction with CodegenFallback {

  override def arguments: Seq[Expression] = Seq(input, initialState)
  override def argumentTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)
  override def functions: Seq[Expression] = Seq(inputFunction, combineFunction)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)

  override def dataType: DataType = initialState.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "reduce_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    initialState.dataType match {
      case _: ArrayType | _: MapType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "reduce_agg state must be a scalar type (reference restriction)")
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }

  override protected def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction = {
    val stateT = initialState.dataType
    val inputT = input.dataType
    copy(
      inputFunction = f(inputFunction, Seq((stateT, true), (inputT, true))),
      combineFunction = f(combineFunction, Seq((stateT, true), (stateT, true))))
  }

  @transient private lazy val LambdaFunction(_, Seq(
    inStateVar: NamedLambdaVariable, inValueVar: NamedLambdaVariable), _) = inputFunction
  @transient private lazy val LambdaFunction(_, Seq(
    cbLeftVar: NamedLambdaVariable, cbRightVar: NamedLambdaVariable), _) = combineFunction

  @transient private lazy val inputFnForEval: Expression = functionsForEval.head
  @transient private lazy val combineFnForEval: Expression = functionsForEval(1)

  override def createAggregationBuffer(): Any = null // null = "no state yet"

  override def update(buffer: Any, row: InternalRow): Any = {
    val v = input.eval(row)
    if (v == null) return buffer // SQL aggregates skip null inputs
    val state = if (buffer == null) initialState.eval(row) else buffer
    inStateVar.value.set(state)
    inValueVar.value.set(v)
    inputFnForEval.eval(row)
  }

  override def merge(buffer: Any, other: Any): Any = {
    if (other == null) return buffer
    if (buffer == null) return other
    cbLeftVar.value.set(buffer)
    cbRightVar.value.set(other)
    combineFnForEval.eval(InternalRow.empty)
  }

  override def eval(buffer: Any): Any = buffer

  // state serialization: single-field UnsafeRow of the state type
  @transient private lazy val proj = UnsafeProjection.create(Array(dataType))
  override def serialize(buffer: Any): Array[Byte] = {
    val row = proj(InternalRow(buffer))
    row.getBytes
  }
  override def deserialize(bytes: Array[Byte]): Any = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.get(0, dataType)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ReduceAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReduceAgg =
    copy(inputAggBufferOffset = newOffset)

  override def children: Seq[Expression] = Seq(input, initialState, inputFunction, combineFunction)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReduceAgg =
    copy(input = newChildren(0), initialState = newChildren(1),
      inputFunction = newChildren(2), combineFunction = newChildren(3))
}

object ReduceAgg {
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "reduce_agg",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(in, init, f: LambdaFunction, g: LambdaFunction) => ReduceAgg(in, init, f, g)
        case other => throw new IllegalArgumentException(
          "reduce_agg(input, initialState, inputFn, combineFn) expects two lambdas, got " +
            other.length + " arguments")
      },
      "built-in")
}
