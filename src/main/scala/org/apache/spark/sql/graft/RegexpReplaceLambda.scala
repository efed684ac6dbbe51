package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `regexp_replace(string, pattern, g -> replacement)` — the reference's
  * lambda-replacement form (`core/trino-main/.../operator/scalar/
  * JoniRegexpReplaceLambdaFunction.java:40`): for every match, the lambda
  * receives the CAPTURING GROUPS as `array<varchar>` (null entries for
  * unmatched groups) and produces the replacement text; a null replacement
  * nulls the whole result, matching the reference.
  *
  * Implemented as a Catalyst HigherOrderFunction so the SQL-text lambda
  * binds through the analyzer exactly like `transform`/`filter` do. This
  * file sits under `org.apache.spark.sql` because the HOF contract names
  * `AbstractDataType`, which Spark 4 makes private[sql] — the standard
  * extension-point workaround, no Spark internals are modified.
  *
  * CodegenFallback: regex matching is already the dominant cost; the
  * match loop allocates one groups array per match, not per row.
  */
case class RegexpReplaceLambda(input: Expression, regex: Expression, function: Expression)
    extends HigherOrderFunction with CodegenFallback {

  override def arguments: Seq[Expression] = Seq(input, regex)
  override def argumentTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_replace"

  override protected def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction =
    copy(function = f(function, Seq((ArrayType(StringType, containsNull = true), false))))

  @transient private lazy val LambdaFunction(_, Seq(groupsVar: NamedLambdaVariable), _) = function

  @transient private lazy val replacementForEval: Expression = functionsForEval.head

  // compile once when the pattern is a literal (the overwhelmingly common case)
  @transient private lazy val staticPattern: java.util.regex.Pattern =
    regex match {
      case Literal(v, StringType) if v != null => java.util.regex.Pattern.compile(v.toString)
      case _ => null
    }

  override def eval(row: InternalRow): Any = {
    val str = input.eval(row)
    if (str == null) return null
    val p =
      if (staticPattern != null) staticPattern
      else {
        val r = regex.eval(row)
        if (r == null) return null
        java.util.regex.Pattern.compile(r.toString)
      }
    val s = str.toString
    val m = p.matcher(s)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start)
      val groups = new Array[Any](m.groupCount())
      var i = 0
      while (i < m.groupCount()) {
        val g = m.group(i + 1)
        groups(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      groupsVar.value.set(new GenericArrayData(groups))
      val rep = replacementForEval.eval(row)
      if (rep == null) return null // reference: null replacement -> null result
      sb.append(rep.toString)
      last = m.end
    }
    sb.append(s, last, s.length)
    UTF8String.fromString(sb.toString)
  }

  override def children: Seq[Expression] = Seq(input, regex, function)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegexpReplaceLambda =
    copy(input = newChildren(0), regex = newChildren(1), function = newChildren(2))
}

object RegexpReplaceLambda {
  /** Re-registers `regexp_replace` to dispatch on the third argument:
    * lambda → [[RegexpReplaceLambda]]; otherwise Spark's built-in
    * RegExpReplace (all its arities preserved).
    */
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "regexp_replace",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(x, p, f: LambdaFunction) => RegexpReplaceLambda(x, p, f)
        case Seq(x, p) => RegExpReplace(x, p, Literal(UTF8String.fromString(""), StringType))
        case Seq(x, p, r) => RegExpReplace(x, p, r)
        case Seq(x, p, r, pos) => RegExpReplace(x, p, r, pos)
        case other => throw new IllegalArgumentException(
          s"regexp_replace expects 2-4 arguments, got ${other.length}")
      },
      "built-in")
}
