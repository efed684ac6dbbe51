package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Per-operator coverage of SURVEY §2 — each entry exercises one physical
  * operator family from the reference inventory (joins §2.3, aggregations
  * §2.4, window §2.5, sort/limit §2.6, set ops §2.7, unnest/lateral §2.8)
  * as an idiomatic Catalyst plan.
  */
object OperatorQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- joins
  private val joinQueries: Map[String, Q] = Map(
    // LookupJoinOperator INNER (reference join/LookupJoinOperator.java:36)
    "join_inner" -> ((s, dir) => {
      t(s, dir, "nation").join(t(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name"), col("r_name"))
    }),
    // LEFT outer with probe-side nulls (LookupOuterOperator.java:38)
    "join_left" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),
    // RIGHT outer
    "join_right" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
        .join(t(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"), "right_outer")
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),
    // FULL outer over disjoint-ish key ranges
    "join_full" -> ((s, dir) => {
      val lo = t(s, dir, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey").as("k"), col("c_acctbal"))
      val hi = t(s, dir, "customer").filter(col("c_custkey") >= 50 && col("c_custkey") < 150)
        .select(col("c_custkey").as("k2"), col("c_name"))
      lo.join(hi, col("k") === col("k2"), "full_outer")
        .select(col("k"), col("k2"), col("c_acctbal"), col("c_name"))
    }),
    // NestedLoopJoinOperator — cross join of two tiny dims
    "join_cross" -> ((s, dir) => {
      t(s, dir, "region").crossJoin(
          t(s, dir, "nation").filter(col("n_nationkey") < 3)
            .select(col("n_name")))
        .select(col("r_name"), col("n_name"))
    }),
    // HashSemiJoinOperator (SemiJoinNode → left_semi)
    "join_semi" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),
    // anti join (NOT EXISTS path); build side filtered so the anti set
    // is non-empty at every SF
    "join_anti" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    // theta join: equi key + range residual (reference keeps residual as
    // compiled filterFunction on the hash join — Catalyst does the same)
    "join_theta" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
          col("l_extendedprice") > col("o_totalprice") * 0.5)
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_big_lines"))
    }),
    // pure inequality join (no equi key → nested loop), kept tiny
    "join_range_nl" -> ((s, dir) => {
      val r = t(s, dir, "region").select(col("r_regionkey"))
      val n = t(s, dir, "nation").filter(col("n_nationkey") < 5).select(col("n_nationkey"))
      r.join(n, col("n_nationkey") > col("r_regionkey"))
        .groupBy(col("r_regionkey")).agg(count(lit(1)).as("n_gt"))
    }),
    // the SCALE form of the range join: banding turns p BETWEEN s AND e
    // into an equi-join on the band id + residual (operators.RangeJoin) —
    // same result as the nested-loop spelling the oracle states, but the
    // plan is a shuffle equi-join (asserted NL-free in PlanSpec)
    "join_range_banded" -> ((s, dir) => {
      val ints = t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"), (col("o_totalprice") * 0.1).as("lo"),
          (col("o_totalprice") * 0.1 + 500.0).as("hi"))
      val pts = t(s, dir, "lineitem").select(col("l_extendedprice"))
      graft.operators.RangeJoin.pointInInterval(pts, "l_extendedprice", ints, "lo", "hi", 500.0)
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_in_range"))
    }),
    // Dynamic partition pruning as a DRIVER ROW (reference
    // DynamicFilterSourceOperator.java:55 / DynamicFilterService.java:102
    // — the collected-values side of a join pruning the probe-side scan):
    // a fact copy partitioned by o_orderstatus (repartitioned by the
    // partition column first, so exactly one file per partition and
    // files == partitions deterministically) is joined to a dim whose
    // status values are only knowable at RUNTIME (read from a parquet it
    // just wrote, behind a keep-flag filter) — static pruning can't fire,
    // so the 1-of-3-partitions scan the metrics report is dynamic
    // filtering at work. The row states the pruned scan's runtime metrics
    // (partitions/files read) next to the static totals the oracle pins.
    "join_dpp_pruned" -> ((s, dir) => {
      import s.implicits._
      val factDir = graft.engine.TempArtifacts.dir("graft_dpp_fact")
      t(s, dir, "orders").repartition(col("o_orderstatus"))
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(factDir)
      val dimDir = graft.engine.TempArtifacts.dir("graft_dpp_dim")
      Seq(("F", 1), ("O", 0), ("P", 0)).toDF("st", "keep")
        .coalesce(1).write.mode("overwrite").parquet(dimDir)
      val fact = s.read.parquet(factDir)
      val dim = s.read.parquet(dimDir).filter(col("keep") === 1).select(col("st"))
      val joined = fact.join(dim, col("o_orderstatus") === col("st"))
        .groupBy(col("st").as("status")).agg(count(lit(1)).as("n_orders"))
      val Array(row) = joined.collect() // execute → runtime metrics populate
      // unwrap the AQE-final plan and read the pruned fact scan's metrics
      import org.apache.spark.sql.execution._
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case w: WholeStageCodegenExec => walk(w.child)
        case i: InputAdapter => walk(i.child)
        case r: ReusedExchangeExec => walk(r.child)
        case other => other +: other.children.flatMap(walk)
      }
      val plan = joined.queryExecution.executedPlan
      val factScan = walk(plan).collectFirst {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains(factDir)) => f
      }.getOrElse(sys.error("fact scan not found in executed plan"))
      val partsRead = factScan.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
      val filesRead = factScan.metrics.get("numFiles").map(_.value).getOrElse(-1L)
      val dppFired = factScan.toString.toLowerCase.contains("dynamicpruning")
      Seq((row.getString(0), row.getLong(1), 3L, partsRead, filesRead, dppFired))
        .toDF("status", "n_orders", "partitions_total", "partitions_read",
          "files_read", "dpp_fired")
    }))

  // --------------------------------------------------------- aggregations
  private val aggQueries: Map[String, Q] = Map(
    // AggregationOperator — global, no keys
    "agg_global" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        sum("l_quantity").as("total_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        avg("l_discount").as("avg_disc"))
    }),
    // multiple DISTINCT aggregates (MarkDistinctOperator analog — Spark
    // plans this with Expand; reference uses mark-distinct markers)
    "agg_multi_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("n"))
    }),
    // StreamingAggregationOperator analog (reference streams groups of a
    // pre-sorted input, `StreamingAggregationOperator.java`): Spark's
    // SortAggregate — chosen here because the agg buffer holds an array
    // (min over array<string> is declarative but not hash-agg eligible),
    // so the plan sorts by the group key and streams group-at-a-time
    // exactly like the reference operator. Values oracle-checked; the
    // SortAggregate plan shape is asserted in PlanSpec.
    "agg_sort_streaming" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(min(split(col("text"), " ")).as("arr"), count(lit(1)).as("n"))
        .select(col("lang"), array_join(col("arr"), " ").as("min_tokens"),
          col("n"))
    }),
    // count_if / bool_and / bool_or (reference CountIfAggregation.java,
    // BooleanAndAggregation.java)
    "agg_conditional" -> ((s, dir) => {
      t(s, dir, "orders").groupBy(col("o_orderstatus")).agg(
        count_if(col("o_totalprice") > 200000.0).as("n_big"),
        bool_and(col("o_totalprice") > 0.0).as("all_pos"),
        bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"))
    }),
    // min_by/max_by (reference minmaxby/)
    "agg_minmax_by" -> ((s, dir) => {
      t(s, dir, "orders").groupBy(col("o_orderstatus")).agg(
        min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_order"),
        max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_order"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
    }),
    // statistical moments (VarianceAggregation, CentralMomentsAggregation)
    "agg_stats" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        var_samp(col("l_quantity")).as("var_qty"),
        var_pop(col("l_quantity")).as("varp_qty"),
        stddev_samp(col("l_extendedprice")).as("sd_price"),
        stddev_pop(col("l_extendedprice")).as("sdp_price"),
        skewness(col("l_discount")).as("skew_disc"),
        kurtosis(col("l_discount")).as("kurt_disc"))
    }),
    // bivariate stats (DoubleCorrelationAggregation, DoubleRegressionAggregation)
    "agg_corr_regr" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        corr(col("l_quantity"), col("l_extendedprice")).as("c_qty_price"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cov_s"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("cov_p"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("slope"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("intercept"))
    }),
    // SQL-text LISTAGG in the reference's own spelling (r14): WITHIN
    // GROUP ordering + the ON OVERFLOW ERROR clause (SqlBase.g4:439) —
    // the dialect shim strips the overflow clause (the engine has no
    // output cap, so the error path can never fire; documented superset
    // of the reference's 1 MB limit) and Spark 4's native listagg takes
    // the rest.
    "agg_listagg_sql" -> ((s, dir) => {
      graft.engine.Tables.sql(s, dir,
        """SELECT n_regionkey,
          |  listagg(n_name, '|' ON OVERFLOW ERROR)
          |    WITHIN GROUP (ORDER BY n_name) AS nations
          |FROM nation GROUP BY n_regionkey
          |ORDER BY n_regionkey""".stripMargin)
    }),
    // reference-parity moments (r13 verdict #6): skewness_ref/kurtosis_ref
    // carry the reference's n<3/n<4 NULL guards and bias-corrected
    // kurtosis (CentralMomentsAggregation.java:58-86). The mod-600 groups
    // over the filtered orders land at n≈1..8, so both guards and both
    // live formulas are exercised; the oracle recomputes the same
    // quantities two-pass from a window mean (the agg_stats convention).
    "agg_moments_ref" -> ((s, dir) => {
      graft.engine.Tables.sql(s, dir,
        """SELECT g, count(*) AS n,
          |  skewness_ref(v) AS sk, kurtosis_ref(v) AS ku
          |FROM (SELECT o_orderkey % 600 AS g, o_totalprice / 1000 AS v
          |      FROM orders WHERE o_orderkey % 7 = 0) t
          |GROUP BY g
          |ORDER BY g""".stripMargin)
    }),
    // geometric_mean (GeometricMeanAggregations.java) = exp(avg(ln x))
    "agg_geometric_mean" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_quantity") > 0)
        .groupBy(col("l_linestatus"))
        .agg(exp(avg(log(col("l_quantity")))).as("geomean_qty"))
    }),
    // array_agg with deterministic order (ArrayAggregationFunction.java;
    // sort_array canonicalizes the collected order; rendered as a joined
    // string because the driver's comparator cannot sort raw array columns)
    "agg_array_collect" -> ((s, dir) => {
      t(s, dir, "nation").groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), "|").as("nations"))
    }),
    // listagg (ListaggAggregationFunction.java) with within-group order
    "agg_listagg" -> ((s, dir) => {
      t(s, dir, "nation").groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nation_csv"))
    }),
    // GROUPING SETS (GroupIdOperator.java:32)
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.sql(s, dir,
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
          |grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
    }),
    "agg_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
    }),
    "agg_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    }),
    // exact interpolated percentiles (reference approx_percentile family —
    // here the exact form both engines define identically)
    "agg_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(100000)).as("p50_approx"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
        .drop("p50_approx")
    }),
    // HAVING (filter over aggregate)
    "agg_having" -> ((s, dir) => {
      t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), avg("c_acctbal").as("avg_bal"))
        .filter(col("n") > 50)
    }))

  // --------------------------------------------------------------- window
  private val windowQueries: Map[String, Q] = Map(
    // RowNumberOperator / TopNRankingOperator: top-3 per group — Spark
    // plans WindowGroupLimit before the full window at scale
    "win_topn_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),
    // rank / dense_rank / percent_rank / cume_dist / ntile
    "win_ranking" -> ((s, dir) => {
      val w = Window.partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
      t(s, dir, "nation").select(
        col("n_nationkey"), col("n_regionkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(3).over(w).as("tile"))
    }),
    // lag/lead (LagFunction, LeadFunction)
    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        lag(col("value"), 2, 0.0).over(w).as("lag2_value"))
    }),
    // value functions + ROWS frame (FirstValueFunction, NthValueFunction,
    // RowsFraming)
    "win_value_rows_frame" -> ((s, dir) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wFrame = wOrd.rowsBetween(-2, 0)
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        first(col("value")).over(wFrame).as("first_in_frame"),
        last(col("value")).over(wFrame).as("last_in_frame"),
        sum(col("value")).over(wFrame).as("moving_sum3"),
        avg(col("value")).over(wFrame).as("moving_avg3"))
    }),
    // RANGE frame (RangeFraming): value-based window over totalprice —
    // double-typed range bounds require the SQL frame syntax
    "win_range_frame" -> ((s, dir) => {
      t(s, dir, "orders").selectExpr(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        """count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
          |RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS n_within_10k""".stripMargin,
        // 2-dp rounding on both sides: frame sums at sf0.1 can straddle
        // the comparator's 9-significant-digit boundary on add order
        """round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
          |RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW), 2) AS sum_within_10k""".stripMargin)
    }),
    // custom AGGREGATE EXTENSION used as a window function — the §2.12
    // "window-function extension point" Spark lacks natively: a
    // registered UDAF (the HLL sketch) evaluates over frames like any
    // builtin. 10-row frames hold ≤ 5 distinct priorities, where the
    // dense-HLL linear-counting regime is exact → oracle-matchable.
    "win_sketch_running" -> ((s, dir) => {
      Tables.sql(s, dir,
        """SELECT o_orderkey,
          |hll_cardinality(approx_set_agg(o_orderpriority)
          |  OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
          |        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) AS run_nd
          |FROM orders WHERE o_orderkey <= 2000""".stripMargin)
    }),
    // running aggregate over unbounded preceding (AggregateWindowFunction)
    "win_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        sum(col("value")).over(w).as("running_value"),
        count(lit(1)).over(w).as("running_n"))
    }))

  // ------------------------------------------- sort/limit/distinct/setops
  private val shapeQueries: Map[String, Q] = Map(
    // TopNOperator → TakeOrderedAndProject
    "topn" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(15)
    }),
    // OFFSET / FETCH (ImplementOffset.java analog — native in both)
    "limit_offset" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .offset(100).limit(10)
    }),
    // DistinctLimitOperator
    "distinct_values" -> ((s, dir) => {
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
    }),
    // ValuesOperator
    "values_inline" -> ((s, dir) => {
      s.sql("""SELECT * FROM VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, NULL, NULL)
              |AS v(id, tag, score)""".stripMargin)
    }),
    // scan + projection pruning + pushed filter (ScanFilterAndProjectOperator)
    "scan_pruned" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_size") > 40)
        .select(col("p_partkey"), col("p_size"))
    }),
    // set operations (§2.7 — reference lowers INTERSECT/EXCEPT to
    // union+marker agg; Spark has native physical ops)
    "setop_union_all" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_nationkey") === 1).select(col("c_custkey"))
        .unionAll(t(s, dir, "customer").filter(col("c_acctbal") > 9000.0).select(col("c_custkey")))
    }),
    "setop_union_distinct" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_nationkey") === 1).select(col("c_custkey"))
        .union(t(s, dir, "customer").filter(col("c_acctbal") > 9000.0).select(col("c_custkey")))
        .distinct()
    }),
    "setop_intersect" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_nationkey") === 1).select(col("c_custkey"))
        .intersect(t(s, dir, "customer").filter(col("c_acctbal") > 5000.0).select(col("c_custkey")))
    }),
    "setop_intersect_all" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_custkey"))
        .intersectAll(t(s, dir, "orders").filter(col("o_orderstatus") === "O").select(col("o_custkey")))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    }),
    "setop_except" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_nationkey") < 13).select(col("c_custkey"))
        .except(t(s, dir, "customer").filter(col("c_acctbal") > 5000.0).select(col("c_custkey")))
    }),
    "setop_except_all" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_custkey"))
        .exceptAll(t(s, dir, "orders").filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    }),
    // TABLESAMPLE (SampleNode) — nondeterministic across engines, so the
    // checkable claim is the row-count band, asserted in the spec; here we
    // return sampled rows (rows-only driver check).
    "sample_bernoulli" -> ((s, dir) => {
      t(s, dir, "lineitem").sample(withReplacement = false, 0.05, seed = 42)
        .select(col("l_orderkey"), col("l_linenumber"))
    }),
    // Content-addressed Bernoulli sampling: u(row-key) < p with a Knuth
    // multiplicative hash — the engine's DETERMINISTIC sampling path
    // (reproducible across engines, retries, and partitionings, which a
    // seeded rand() is not once partition boundaries move). The reference
    // lowers TABLESAMPLE BERNOULLI to a rand() < p filter
    // (core/trino-main/.../ImplementBernoulliSampleAsFilter.java:45); a
    // pure hash filter is the faithful scan-stage analog, and DuckDB
    // reproduces it exactly — full row/schema/hash oracle match.
    "sample_bernoulli_hash" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(((col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(40503L))
          % lit(4294967296L)).cast("double") / lit(4294967296.0) < 0.05)
        .select(col("l_orderkey"), col("l_linenumber"))
    }))

  // ------------------------------------------------------------ subqueries
  private val subqueryQueries: Map[String, Q] = Map(
    // uncorrelated scalar subquery (EnforceSingleRowOperator)
    "subq_scalar" -> ((s, dir) => {
      Tables.sql(s, dir,
        """SELECT o_orderkey, o_totalprice,
          |o_totalprice / (SELECT avg(o_totalprice) FROM orders) AS price_ratio
          |FROM orders WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)""".stripMargin)
    }),
    // IN subquery (SemiJoinNode)
    "subq_in" -> ((s, dir) => {
      Tables.sql(s, dir,
        """SELECT c_custkey, c_name FROM customer
          |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""".stripMargin)
    }),
    // NOT IN over nullable expression — null-aware anti join semantics
    "subq_not_in" -> ((s, dir) => {
      Tables.sql(s, dir,
        """SELECT c_custkey FROM customer
          |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""".stripMargin)
    }),
    // correlated EXISTS (TransformExistsApplyToCorrelatedJoin)
    "subq_exists" -> ((s, dir) => {
      Tables.sql(s, dir,
        """SELECT s_suppkey, s_name FROM supplier
          |WHERE EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_suppkey = s_suppkey AND l_quantity > 49)""".stripMargin)
    }),
    // correlated scalar subquery in SELECT list
    "subq_correlated_scalar" -> ((s, dir) => {
      Tables.sql(s, dir,
        """SELECT n_nationkey, n_name,
          |(SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
          |FROM nation""".stripMargin)
    }),
    // quantified comparison (> ALL) — expressed via max() rewrite, the same
    // rewrite the reference's TransformQuantifiedComparisonApply does
    "subq_quantified_all" -> ((s, dir) => {
      Tables.sql(s, dir,
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.95 FROM orders)""".stripMargin)
    }),
    // LATERAL correlated derived table (CorrelatedJoinNode)
    "lateral_topn" -> ((s, dir) => {
      Tables.sql(s, dir,
        """SELECT r.r_name, x.n_name FROM region r,
          |LATERAL (SELECT n_name FROM nation
          |         WHERE n_regionkey = r.r_regionkey
          |         ORDER BY n_nationkey LIMIT 2) x""".stripMargin)
    }))

  val queries: Map[String, Q] =
    joinQueries ++ aggQueries ++ windowQueries ++ shapeQueries ++ subqueryQueries

  val oracles: Map[String, String] = Map(
    "join_inner" ->
      "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey",
    "join_left" ->
      """SELECT c_custkey, o_orderkey, o_totalprice FROM customer
        |LEFT OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
        |ON c_custkey = o_custkey""".stripMargin,
    "join_right" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
        |RIGHT OUTER JOIN customer ON c_custkey = o_custkey""".stripMargin,
    "join_full" ->
      """SELECT lo.k, hi.k2, lo.c_acctbal, hi.c_name FROM
        |(SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_custkey < 100) lo
        |FULL OUTER JOIN
        |(SELECT c_custkey AS k2, c_name FROM customer WHERE c_custkey >= 50 AND c_custkey < 150) hi
        |ON lo.k = hi.k2""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region
        |CROSS JOIN (SELECT n_name FROM nation WHERE n_nationkey < 3) n""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer WHERE c_custkey IN
        |(SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS
        |(SELECT 1 FROM orders WHERE o_custkey = c_custkey
        | AND o_orderstatus = 'P')""".stripMargin,
    "join_theta" ->
      """SELECT o_orderkey, count(*) AS n_big_lines FROM orders JOIN lineitem
        |ON o_orderkey = l_orderkey AND l_extendedprice > o_totalprice * 0.5
        |WHERE o_orderkey < 500 GROUP BY o_orderkey""".stripMargin,
    "join_range_nl" ->
      """SELECT r_regionkey, count(*) AS n_gt FROM region
        |JOIN (SELECT n_nationkey FROM nation WHERE n_nationkey < 5) n
        |ON n_nationkey > r_regionkey GROUP BY r_regionkey""".stripMargin,
    "join_range_banded" ->
      """SELECT o_orderkey, count(*) AS n_in_range
        |FROM orders JOIN lineitem
        |  ON l_extendedprice BETWEEN o_totalprice * 0.1 AND o_totalprice * 0.1 + 500
        |WHERE o_orderkey < 500
        |GROUP BY o_orderkey""".stripMargin,
    // the static half (status, n_orders, totals) is recomputable; the
    // runtime half (partitions/files read = 1 of 3, dpp_fired) is exactly
    // what dynamic pruning guarantees for a 1-status dim over a 3-status
    // partitioned fact with one file per partition
    "join_dpp_pruned" ->
      """SELECT 'F' AS status,
        |(SELECT count(*) FROM orders WHERE o_orderstatus = 'F') AS n_orders,
        |3::bigint AS partitions_total, 1::bigint AS partitions_read,
        |1::bigint AS files_read, true AS dpp_fired""".stripMargin,
    "agg_global" ->
      """SELECT count(*) AS n, sum(l_quantity) AS total_qty,
        |min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |avg(l_discount) AS avg_disc FROM lineitem""".stripMargin,
    "agg_multi_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
        |count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // DuckDB list comparison is lexicographic with shorter-prefix-first,
    // the same total order Spark uses for array<string> — verified on the
    // fixture and in the inline probe (['a','z'] < ['a','z','z'])
    "agg_sort_streaming" ->
      """SELECT lang, array_to_string(min(string_split(text, ' ')), ' ') AS min_tokens,
        |count(*) AS n FROM documents GROUP BY lang""".stripMargin,
    "agg_conditional" ->
      """SELECT o_orderstatus, count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
        |bool_and(o_totalprice > 0.0) AS all_pos,
        |bool_or(o_orderpriority = '1-URGENT') AS any_urgent
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "agg_minmax_by" ->
      """SELECT o_orderstatus, min_by(o_orderkey, o_totalprice) AS cheapest_order,
        |max_by(o_orderkey, o_totalprice) AS priciest_order,
        |min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    // DuckDB's skewness/kurtosis apply sample-bias correction; Spark's are
    // population central moments (m3/m2^1.5, m4/m2^2-3) — state Spark's
    // definition algebraically so the oracle computes the same quantity.
    "agg_stats" ->
      """SELECT l_returnflag, var_samp(l_quantity) AS var_qty, var_pop(l_quantity) AS varp_qty,
        |stddev_samp(l_extendedprice) AS sd_price, stddev_pop(l_extendedprice) AS sdp_price,
        |(avg(pow(l_discount - md, 3))) / pow(stddev_pop(l_discount), 3) AS skew_disc,
        |(avg(pow(l_discount - md, 4))) / pow(var_pop(l_discount), 2) - 3 AS kurt_disc
        |FROM (SELECT l.*, avg(l_discount) OVER (PARTITION BY l_returnflag) AS md
        |      FROM lineitem l) t
        |GROUP BY l_returnflag""".stripMargin,
    "agg_corr_regr" ->
      """SELECT corr(l_quantity, l_extendedprice) AS c_qty_price,
        |covar_samp(l_quantity, l_extendedprice) AS cov_s,
        |covar_pop(l_quantity, l_extendedprice) AS cov_p,
        |regr_slope(l_extendedprice, l_quantity) AS slope,
        |regr_intercept(l_extendedprice, l_quantity) AS intercept
        |FROM lineitem""".stripMargin,
    "agg_listagg_sql" ->
      """SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin,
    "agg_moments_ref" ->
      """SELECT g, count(*) AS n,
        |  CASE WHEN count(*) >= 3 THEN
        |    sqrt(count(*)) * sum(pow(v - mu, 3)) / pow(sum(pow(v - mu, 2)), 1.5)
        |  END AS sk,
        |  CASE WHEN count(*) >= 4 THEN
        |    (count(*) - 1) * count(*) * (count(*) + 1)
        |      / ((count(*) - 2) * (count(*) - 3))
        |      * sum(pow(v - mu, 4)) / pow(sum(pow(v - mu, 2)), 2)
        |    - 3.0 * (count(*) - 1) * (count(*) - 1)
        |      / ((count(*) - 2) * (count(*) - 3))
        |  END AS ku
        |FROM (SELECT o_orderkey % 600 AS g, o_totalprice / 1000 AS v,
        |      avg(o_totalprice / 1000) OVER (PARTITION BY o_orderkey % 600) AS mu
        |      FROM orders WHERE o_orderkey % 7 = 0) t
        |GROUP BY g
        |ORDER BY g""".stripMargin,
    "agg_geometric_mean" ->
      """SELECT l_linestatus, exp(avg(ln(l_quantity))) AS geomean_qty
        |FROM lineitem WHERE l_quantity > 0 GROUP BY l_linestatus""".stripMargin,
    "agg_array_collect" ->
      """SELECT n_regionkey, string_agg(n_name, '|' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "agg_listagg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nation_csv
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,
    "agg_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, sum(o_totalprice) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50,
        |quantile_cont(l_extendedprice, 0.95) AS p95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "agg_having" ->
      """SELECT c_nationkey, count(*) AS n, avg(c_acctbal) AS avg_bal
        |FROM customer GROUP BY c_nationkey HAVING count(*) > 50""".stripMargin,
    "win_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders) t WHERE rn <= 3""".stripMargin,
    "win_ranking" ->
      """SELECT n_nationkey, n_regionkey,
        |rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |percent_rank() OVER w AS prnk, cume_dist() OVER w AS cdist,
        |ntile(3) OVER w AS tile
        |FROM nation WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey)""".stripMargin,
    "win_lag_lead" ->
      """SELECT user_id, event_id,
        |lag(event_type, 1) OVER w AS prev_type,
        |lead(event_type, 1) OVER w AS next_type,
        |lag(value, 2, 0.0) OVER w AS lag2_value
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "win_value_rows_frame" ->
      """SELECT user_id, event_id,
        |first_value(value) OVER w AS first_in_frame,
        |last_value(value) OVER w AS last_in_frame,
        |sum(value) OVER w AS moving_sum3,
        |avg(value) OVER w AS moving_avg3
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "win_range_frame" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |count(*) OVER w AS n_within_10k,
        |round(sum(o_totalprice) OVER w, 2) AS sum_within_10k
        |FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)""".stripMargin,
    "win_running_sum" ->
      """SELECT user_id, event_id,
        |sum(value) OVER w AS running_value, count(*) OVER w AS running_n
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "win_sketch_running" ->
      """SELECT o_orderkey,
        |len(list_distinct(list(o_orderpriority) OVER
        |  (PARTITION BY o_orderstatus ORDER BY o_orderkey
        |   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS run_nd
        |FROM orders WHERE o_orderkey <= 2000""".stripMargin,
    "topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,
    "limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 10 OFFSET 100""".stripMargin,
    "distinct_values" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "values_inline" ->
      """SELECT * FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, NULL, NULL))
        |AS v(id, tag, score)""".stripMargin,
    "scan_pruned" ->
      "SELECT p_partkey, p_size FROM part WHERE p_size > 40",
    "setop_union_all" ->
      """SELECT c_custkey FROM customer WHERE c_nationkey = 1
        |UNION ALL SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0""".stripMargin,
    "setop_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_nationkey = 1
        |UNION SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0""".stripMargin,
    "setop_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_nationkey = 1
        |INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0""".stripMargin,
    "setop_intersect_all" ->
      """SELECT o_custkey, count(*) AS n FROM (
        |SELECT o_custkey FROM orders
        |INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
        |GROUP BY o_custkey""".stripMargin,
    "setop_except" ->
      """SELECT c_custkey FROM customer WHERE c_nationkey < 13
        |EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0""".stripMargin,
    "setop_except_all" ->
      """SELECT o_custkey, count(*) AS n FROM (
        |SELECT o_custkey FROM orders
        |EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY o_custkey""".stripMargin,
    "sample_bernoulli_hash" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE ((l_orderkey * 2654435761 + l_linenumber * 40503) % 4294967296)
        |      / 4294967296.0 < 0.05""".stripMargin,
    "subq_scalar" ->
      """SELECT o_orderkey, o_totalprice,
        |o_totalprice / (SELECT avg(o_totalprice) FROM orders) AS price_ratio
        |FROM orders WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)""".stripMargin,
    "subq_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)""".stripMargin,
    "subq_not_in" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')""".stripMargin,
    "subq_exists" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity > 49)""".stripMargin,
    "subq_correlated_scalar" ->
      """SELECT n_nationkey, n_name,
        |(SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
        |FROM nation""".stripMargin,
    "subq_quantified_all" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.95 FROM orders)""".stripMargin,
    "lateral_topn" ->
      """SELECT r.r_name, x.n_name FROM region r,
        |LATERAL (SELECT n_name FROM nation
        |         WHERE n_regionkey = r.r_regionkey
        |         ORDER BY n_nationkey LIMIT 2) x""".stripMargin)
}
