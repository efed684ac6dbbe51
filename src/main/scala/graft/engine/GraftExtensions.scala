package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** `SparkSessionExtensions` injection point so the engine's native
  * expressions are available in any session created with
  * `--conf spark.sql.extensions=graft.engine.GraftExtensions` — the
  * deployment analog of the reference's plugin loading
  * (`io.trino.spi.Plugin#getFunctions`). Interactive/test sessions get the
  * same registrations via `GraftFunctions.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    inject("cosine_sim_native", es => CosineSimilarityExpr(es(0), es(1)))
    inject("sorted_intersect_count", es => SortedIntersectCountExpr(es(0), es(1)))
    inject("shingle_hashes", es => ShingleHashesExpr(es(0), es(1)))
    inject("simhash64_native", es => SimHash64Expr(es.head))
    inject("minhash", es => MinHashExpr(es(0), es(1)))
    inject("try", es => TryExpr(es.head))
    // ANSI-safe corr override: Spark's native Corr is the ONE statistical
    // aggregate that throws DIVIDE_BY_ZERO under ANSI on degenerate
    // groups (a single pair, zero variance — covar/regr/skew/kurt all
    // guard; probed on 4.1.2, caught by the r12 window property sweep's
    // batch follow-up). The reference returns NULL there
    // (aggregation/CentralMomentsAggregation.java). r13 (advice): the
    // override is a REAL AggregateFunction — Spark's own co-moment
    // buffer with a guarded final evaluation — so FILTER, DISTINCT,
    // and window attachment all still resolve (the prior covar/stddev
    // Divide composite computed the same values but broke those forms).
    // SQL-text corr WINDOWS still lower to moment sums before analysis
    // (WindowFrames fragile routing); this builder carries the
    // DataFrame-API / expr() / named-window-free paths.
    inject("corr", es =>
      org.apache.spark.sql.graft.AnsiSafeCorr(es(0), es(1)))
    // reference-parity moments (r13 verdict #6): `skewness`/`kurtosis`
    // keep Spark's population g1/g2 (batch/window self-consistency, a
    // documented divergence); these registered variants give a parity
    // user the reference's n<3/n<4 NULL guards and bias-corrected
    // kurtosis without hand-rolling the closed-form correction
    inject("skewness_ref", es => org.apache.spark.sql.graft.RefSkewness(es.head))
    inject("kurtosis_ref", es => org.apache.spark.sql.graft.RefKurtosis(es.head))
    // reduce_agg needs parse-time resolution — see GraftSqlParser scaladoc
    ext.injectParser((_, parser) => new org.apache.spark.sql.graft.GraftSqlParser(parser))
  }
}
