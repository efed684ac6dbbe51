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
    // (aggregation/CentralMomentsAggregation.java), so corr re-registers
    // as covar_pop(y', x') / nullif(stddev_pop(y')·stddev_pop(x'), 0)
    // over PAIR-MASKED sides — identical values on healthy groups,
    // NULL instead of a crash on degenerate ones. Window uses never
    // reach this builder: the SQL entry lowers every corr window to
    // moment sums (WindowFrames fragile routing).
    inject("corr", es => {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.catalyst.expressions.aggregate.{CovPopulation, StddevPop}
      import org.apache.spark.sql.types.DoubleType
      val Seq(y0, x0) = es.toSeq
      val both = And(IsNotNull(y0), IsNotNull(x0))
      val nullD = Literal.create(null, DoubleType)
      val y = If(both, Cast(y0, DoubleType), nullD)
      val x = If(both, Cast(x0, DoubleType), nullD)
      val cov = new CovPopulation(y, x, true).toAggregateExpression()
      val sy = new StddevPop(y, true).toAggregateExpression()
      val sx = new StddevPop(x, true).toAggregateExpression()
      new Divide(cov, new NullIf(new Multiply(sy, sx), Literal(0.0d)))
    })
    // reduce_agg needs parse-time resolution — see GraftSqlParser scaladoc
    ext.injectParser((_, parser) => new org.apache.spark.sql.graft.GraftSqlParser(parser))
  }
}
