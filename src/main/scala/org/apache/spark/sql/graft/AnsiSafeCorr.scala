package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.PearsonCorrelation
import org.apache.spark.sql.types.DoubleType

/** ANSI-safe `corr` as a REAL aggregate function (r12 advice): the prior
  * override built `covar_pop / nullif(stddev·stddev, 0)` — a Divide
  * COMPOSITE of aggregate expressions, which computes the same values but
  * is not itself an AggregateFunction, so `corr(y, x) FILTER (WHERE …)`,
  * `corr(DISTINCT y, x)`, and window attachment through the DataFrame API
  * failed analysis (the analyzer can only hang FILTER/DISTINCT/OVER off a
  * true AggregateFunction node).
  *
  * This subclasses Spark's own `PearsonCorrelation` (the shared
  * co-moment buffer: n, xAvg, yAvg, ck, xMk, yMk with pair-null-skipping
  * update and the guarded merge — all ANSI-safe), overriding ONLY the
  * final evaluation: Spark's `Corr` evaluates `ck / sqrt(xMk · yMk)`,
  * which under ANSI throws DIVIDE_BY_ZERO whenever either variance is
  * zero (a single pair, a constant side — probed on 4.1.2; the one
  * statistical aggregate that does). The reference returns NULL there
  * (`aggregation/CentralMomentsAggregation.java`, as do DuckDB and
  * PostgreSQL), so the evaluation guards: NULL when n < 1 or either
  * accumulated second moment is zero, and the division itself is LEGACY
  * mode so no ANSI path remains even in principle. Healthy groups are
  * bit-identical to native `corr` — same buffer, same arithmetic, same
  * final expression shape.
  *
  * Welford accumulation keeps a constant column's M2 at exactly 0.0
  * (each delta is exactly zero), so the `<= 0` test is an exact match
  * for the degenerate class, not an epsilon heuristic.
  */
case class AnsiSafeCorr(x: Expression, y: Expression)
    extends PearsonCorrelation(x, y, true) {

  override def prettyName: String = "corr"

  override val evaluateExpression: Expression = {
    val nullD = Literal.create(null, DoubleType)
    val zero = Literal(0.0d)
    val degenerate = Or(LessThanOrEqual(xMk, zero), LessThanOrEqual(yMk, zero))
    val res = Divide(ck, Sqrt(Multiply(xMk, yMk)), EvalMode.LEGACY)
    // NaN/Infinity INPUTS poison the moments (NaN fails every <= test, so
    // the degenerate guard passes it through): the reference emits corr
    // only when `Double.isFinite(result)` and NULL otherwise
    // (DoubleCorrelationAggregation.java:52) — gate the final value the
    // same way (r13 advice)
    val nonFinite = Or(IsNaN(res),
      Or(EqualTo(res, Literal(Double.PositiveInfinity)),
        EqualTo(res, Literal(Double.NegativeInfinity))))
    If(LessThan(n, Literal(1.0d)), nullD,
      If(degenerate, nullD, If(nonFinite, nullD, res)))
  }

  override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AnsiSafeCorr =
    copy(x = newLeft, y = newRight)
}
