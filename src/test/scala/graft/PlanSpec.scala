package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan shape assertions — the scale contract. These pin the
  * properties that make the queries viable at 100 TB: filters reaching
  * the parquet scan, column pruning, broadcast for small dims, window
  * group-limit pushdown, and no accidental cartesian products.
  * (Reference analog: `TestQueryPlanDeterminism` + `AddExchanges` tests.)
  */
class PlanSpec extends GraftSuite {

  private def plan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan
  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfTiny)

  test("scan_pruned pushes the filter and prunes columns at the parquet scan") {
    val s = formatted(q("scan_pruned"))
    assert(s.contains("PushedFilters"), s)
    assert(s.contains("GreaterThan(p_size,40)") || s.contains("GreaterThan(p_size, 40)"), s)
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_partkey") && readSchema.contains("p_size"))
    assert(!readSchema.contains("p_name"), s"columns not pruned: $readSchema")
  }

  test("tpch_q6 pushes all range predicates into the scan") {
    val s = formatted(q("tpch_q6"))
    assert(s.contains("PushedFilters"))
    assert(s.contains("l_discount") && s.contains("l_shipdate"), s)
  }

  test("tpch_q5 broadcasts the small dimensions") {
    val s = plan(q("tpch_q5")).toString
    assert(s.contains("BroadcastHashJoin"), s)
  }

  test("topn compiles to TakeOrderedAndProject (no global sort)") {
    val s = plan(q("topn")).toString
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("win_topn_per_group gets a WindowGroupLimit below the window") {
    val s = plan(q("win_topn_per_group")).toString
    assert(s.contains("WindowGroupLimit"), s)
  }

  test("tpcds_q10's OR'd EXISTS pair decorrelates to ExistenceJoins, not a cartesian") {
    // the required EXISTS plans as a semi join; the two OR'd EXISTS
    // cannot (a row may satisfy either), so Spark marks each with an
    // ExistenceJoin flag feeding a disjunctive filter — the q10/q35
    // decorrelation shape. A cartesian/nested-loop anywhere = failure.
    val s = plan(q("tpcds_q10_exists_or")).toString
    assert(s.contains("ExistenceJoin"), s.take(3000))
    assert(!s.contains("CartesianProduct"), s"EXISTS-OR degenerated to cartesian:\n${s.take(3000)}")
  }

  test("tpcds_q23 plans the scalar threshold as a subquery and the INs as semi joins (r15)") {
    val s = plan(q("tpcds_q23_cte_scalar")).toString
    assert(s.contains("Subquery") || s.contains("scalar-subquery"), s.take(3000))
    assert(s.contains("LeftSemi"), s"IN-subqueries did not plan as semi joins:\n${s.take(3000)}")
    assert(!s.contains("CartesianProduct"), s.take(3000))
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
  }

  test("tpcds_q64's nine-relation chain broadcasts every dim — no cartesian, no SMJ dim join (r15)") {
    // the fact (lineitem) is the only scale-out input: customer/nation/
    // region/supplier/part are broadcast-size at any SF, and the
    // returned-order probe plans as a semi/hash join on the fact key
    val s = plan(q("tpcds_q64_wide_chain")).toString
    assert(s.contains("BroadcastHashJoin"), s.take(3000))
    assert(!s.contains("CartesianProduct"), s.take(3000))
    graft.engine.CachedPlans.releaseAll()
    graft.engine.TempArtifacts.cleanupAll(spark)
  }

  test("tpcds_q77 rolls up through ONE Expand over the stitched channels") {
    // ROLLUP(channel, id) lowers to a single ExpandExec (3 grouping
    // sets from one input pass), not one aggregate per grouping set
    val s = plan(q("tpcds_q77_channel_report")).toString
    assert("Expand".r.findAllIn(s).length >= 1, s.take(3000))
    assert(s.contains("spark_grouping_id"), s.take(3000))
  }

  test("tpcds_q88 shapes: 8 one-row agg subtrees cross-join vs one conditional-count scan") {
    // the 8-slot report: eight independent single-row counts must chain
    // through one-row broadcast nested-loop joins (a one-row cartesian
    // is the CORRECT plan here — each side is exactly one row), with
    // eight fact subtrees; the one-scan rewrite must read lineitem ONCE
    val s8 = plan(q("tpcds_q88_time_slots")).toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(s8).length >= 7, s8.take(3000))
    assert("lineitem".r.findAllIn(s8).length >= 8, s8.take(3000))
    val s1 = plan(q("tpcds_q88_one_scan")).toString
    assert("lineitem".r.findAllIn(s1).length == 1,
      s"one-scan variant reads the fact more than once:\n${s1.take(3000)}")
  }

  test("tpcds_q3_star probes the fact scan with broadcast dims (date_dim, part)") {
    // execute first: the derived date_dim is an aggregate whose static
    // size estimate is fact-sized, so the broadcast decision is AQE's —
    // assert on the FINAL adaptive plan
    val df = q("tpcds_q3_star")
    df.collect()
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s"star probe degenerated to SMJ:\n$s")
  }

  test("incremental-index consume reads the prefix store bucketed, corpus side exchange-free") {
    graft.queries.PipelineQueries.incrementalIndexBuild(spark, sfTiny)
    val df = graft.queries.PipelineQueries.incrementalIndexConsume(spark, sfTiny)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val finalPlan = s.split("== Initial Plan ==")(0)
    assert(s.contains("Bucketed: true"),
      s"prefix store not read as bucketed:\n${s.take(4000)}")
    val ptokExchanges = "hashpartitioning\\(ptok".r.findAllIn(finalPlan).length
    assert(ptokExchanges <= 1,
      s"expected at most the increment-side ptok exchange, got $ptokExchanges:\n${finalPlan.take(4000)}")
  }

  test("tpch_q18 takes the top-100 before the customer join (broadcast probe, no customer shuffle)") {
    val s = plan(q("tpch_q18")).toString
    // the limit must sit BELOW the customer join: a TakeOrderedAndProject
    // feeds the broadcast side, so the customer table is probed by ≤100
    // rows instead of being shuffled (the r5 soak's scaling exchange)
    val bcastIdx = s.indexOf("BroadcastExchange")
    val topIdx = s.indexOf("TakeOrderedAndProject", bcastIdx)
    assert(bcastIdx >= 0 && topIdx > bcastIdx,
      s"expected TakeOrderedAndProject under the broadcast side:\n$s")
  }

  test("dedup_minhash_lsh candidate join is an equi-join, not cartesian") {
    val s = plan(q("dedup_minhash_lsh")).toString
    assert(!s.contains("CartesianProduct"), s)
  }

  test("dedup_substring gram join is an equi-join, not cartesian") {
    val s = plan(q("dedup_substring")).toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"), s)
  }

  test("dedup_incremental restricts the increment side BELOW the pair join (increment×corpus, not corpus×corpus)") {
    val s = plan(q("dedup_incremental")).toString
    // the PPJoin pair join is the SortMergeJoin keyed on ptok; in the
    // top-down plan print its subtree follows it, and both of its inputs
    // must carry the increment-boundary filter (doc_id % 5) — i.e. the
    // restriction happens BEFORE pairing, so the executed join is
    // increment×corpus
    val smj = s.linesIterator.indexWhere(l =>
      l.contains("SortMergeJoin") && l.contains("ptok"))
    assert(smj >= 0, s"no ptok pair join found:\n$s")
    val below = s.linesIterator.drop(smj).mkString("\n")
    assert(below.contains("% 5"),
      s"increment filter not below the pair join:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"), s)
  }

  test("pipeline_seq_pack is one partitioned window pass — no joins, no driver fold") {
    val s = plan(q("pipeline_seq_pack")).toString
    assert(!s.contains("Join"), s"packing must not join:\n$s")
    assert(s.contains("Window"), s)
    // exactly one window (the offset cumsum); the agg above it reuses the
    // source partitioning
    assert(s.sliding("Window [".length).count(_ == "Window [") == 1, s)
  }

  test("dedup_semantic pair join is an equi-join on the cluster id") {
    val s = plan(q("dedup_semantic")).toString
    assert(!s.contains("CartesianProduct"), s)
    // the only nested-loop allowed is the 8-row broadcast centroid
    // assignment; the PAIR join itself must hash/merge on cid
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin") ||
      s.contains("ShuffledHashJoin"), s)
  }

  test("text_unigram_xent is scan + aggregates, no pair joins") {
    val s = plan(q("text_unigram_xent")).toString
    assert(!s.contains("CartesianProduct") && !s.contains("NestedLoop")
      || s.contains("BroadcastNestedLoop"), s) // 1-row total crossJoin only
    assert(!s.contains("CartesianProduct"), s)
  }

  test("sim_bm25_topk broadcasts query terms and df — postings never shuffle for a join") {
    val s = plan(q("sim_bm25_topk")).toString
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("BroadcastHashJoin"), s)
    // the only sort-merge-shuffle joins allowed would be corpus-sized;
    // every join in this plan must ride a broadcast
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("pipeline_inverted_index is two map-side-combinable aggregates, no joins") {
    val s = plan(q("pipeline_inverted_index")).toString
    assert(!s.contains("Join"), s)
    assert(s.contains("HashAggregate") || s.contains("ObjectHashAggregate") ||
      s.contains("SortAggregate"), s)
  }

  test("pipeline_unimax_mixture windows ride the k-row source frame (single corpus pass)") {
    val df = q("pipeline_unimax_mixture")
    val s = plan(df).toString
    assert(!s.contains("CartesianProduct"), s)
    // exactly one scan of documents: the corpus-linear token-count agg
    val scans = "FileScan|BatchScan".r.findAllIn(s).length
    assert(scans == 1, s"expected 1 documents scan, saw $scans:\n$s")
  }

  test("graph_pagerank materializes the pair set once (edge-list checkpoint)") {
    val s = plan(q("graph_pagerank")).toString
    // the near-dup pair subtree must be behind a cache scan: without it
    // Catalyst prunes each graph reference differently and re-executes
    // the pair join per iteration
    assert(s.contains("InMemoryTableScan") || s.contains("InMemoryRelation"), s.take(2000))
    assert(!s.contains("CartesianProduct"), s.take(2000))
  }

  test("dedup_jaccard blocks on language (no cartesian product)") {
    val s = plan(q("dedup_jaccard")).toString
    assert(!s.contains("CartesianProduct"), s)
  }

  test("sim_ann_lsh candidate join is an equi-join on the LSH bucket") {
    val s = plan(q("sim_ann_lsh")).toString
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin") ||
      s.contains("ShuffledHashJoin"), s)
  }

  test("whole-stage codegen covers the q1 aggregation pipeline") {
    val df = q("tpch_q1")
    df.collect() // materialize so AQE finalizes the physical plan
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    val s = plan(df).toString
    assert(s.contains("WholeStageCodegen") || s.contains("*("), s)
  }

  test("agg_sort_streaming plans SortAggregate (group-at-a-time over sorted input)") {
    // the reference's StreamingAggregationOperator consumes pre-sorted
    // input group-at-a-time; Spark's equivalent physical operator is
    // SortAggregate, forced here by the array-typed agg buffer
    val s = plan(q("agg_sort_streaming")).toString
    assert(s.contains("SortAggregate"), s)
  }

  test("agg_global plans partial + final aggregation (map-side combine)") {
    val s = plan(q("agg_global")).toString
    val hashAggs = s.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$s")
  }

  test("text_redact_pii is a pure scan -> project plan (zero exchanges)") {
    val df = q("text_redact_pii"); df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s"redaction must not shuffle:\n$s")
  }

  test("pipeline_chunk_overlap is a pure scan -> explode plan (zero exchanges)") {
    val df = q("pipeline_chunk_overlap"); df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s)
  }

  test("text_decontaminate_fuzzy broadcasts the benchmark shingle side") {
    val s = plan(q("text_decontaminate_fuzzy")).toString
    assert(s.contains("BroadcastHashJoin"), s)
  }

  test("text_decontaminate broadcasts the benchmark gram set") {
    val df = q("text_decontaminate"); df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"),
      s"eval grams must broadcast (corpus side stays scan-shaped):\n$s")
  }

  test("sim_tfidf_pairs_abscap computes the prefix+vector stage once (ReusedExchange)") {
    val df = q("sim_tfidf_pairs_abscap"); df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("ReusedExchange"), s)
  }

  test("pipeline_mixture_sample filters at the scan stage (one aggregate exchange)") {
    val df = q("pipeline_mixture_sample"); df.collect()
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = s.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"expected only the aggregate exchange (+AQE read):\n$s")
  }

  test("pipeline_dsir scores via a broadcast model join and a TakeOrdered top-k") {
    val df = q("pipeline_dsir"); df.collect()
    val s = df.queryExecution.executedPlan.toString
    // the B-row log-ratio table must broadcast to the token stream —
    // the corpus side stays scan-shaped at any scale
    assert(s.contains("BroadcastHashJoin"), s"model join must broadcast:\n$s")
    // top-k is TakeOrderedAndProject, never a global sort of all docs
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("pipeline_bpe_train rounds are groupBy + 1-row TakeOrdered argmax, no collect") {
    val df = q("pipeline_bpe_train"); df.collect()
    val s = df.queryExecution.executedPlan.toString
    // each round's argmax is TakeOrderedAndProject(limit=1) feeding a
    // broadcast — the merge stays fully declarative (no driver loop)
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("ROWS EXCLUDE slice lowering shares one partition exchange across its windows") {
    // the slice recombination (win_sql_exclude_rows_minmax) evaluates
    // helper windows (row_number/rank/peer counts), the collected frame
    // and the recombine — all partitioned by the same key, so the plan
    // must hash-exchange on that key ONCE and sort within partitions,
    // never re-shuffle per window (at 100 TB the exchange is the cost)
    val df = q("win_sql_exclude_rows_minmax"); df.collect()
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // a reused exchange prints as ReusedExchange, so counting the
    // Exchange nodes alone is the strict one-shuffle assertion (the old
    // `|| reused` escape made the test vacuous whenever any reuse existed)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(exchanges <= 1,
      s"expected one hash exchange for the slice lowering, got $exchanges:\n$s")
  }

  test("corr-family EXCLUDE lowering shares one partition exchange across its windows") {
    // the co-moment recombination evaluates six moment windows per call
    // plus rn/g/pivot helpers — partitioned by (status) and the finer
    // (status, peer-group), and HashPartitioning(status) satisfies
    // clustering on both, so the plan must exchange ONCE; the six sums
    // ride the same sorted partition (at 100 TB the exchange is the cost)
    val df = q("win_sql_exclude_rows_corr"); df.collect()
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(exchanges <= 1,
      s"expected one hash exchange for the corr lowering, got $exchanges:\n$s")
  }

  test("the ORDER BY-position window lift adds no exchange beyond the select-list form (r13)") {
    // the lift wraps the query in one projection layer (inner select
    // carries the window under an alias, outer drops it) — Catalyst
    // collapses the projections, so the physical plan must be the same
    // exchange/sort/window pipeline as the equivalent select-list query
    // plus the top-k sort (at 100 TB an accidental second shuffle here
    // would double the query's cost)
    import graft.engine.Tables
    def exchanges(sql: String): Int = {
      val df = Tables.sql(spark, sfTiny, sql); df.collect()
      val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      // ORDER BY + LIMIT must compile to top-k, never a global sort —
      // at 100 TB a global sort of the windowed output is the failure
      assert(s.contains("TakeOrderedAndProject"), s"no top-k in:\n$s")
      "Exchange ".r.findAllIn(s).length
    }
    val lifted = exchanges(
      """SELECT o_orderkey, o_orderstatus FROM orders
        |ORDER BY sum(o_orderkey % 97) OVER (PARTITION BY o_orderstatus
        |  ORDER BY o_orderkey GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) DESC, o_orderkey
        |LIMIT 5""".stripMargin)
    val selectList = exchanges(
      """SELECT o_orderkey, o_orderstatus FROM (
        |  SELECT o_orderkey, o_orderstatus,
        |    sum(o_orderkey % 97) OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_orderkey GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS w
        |  FROM orders) t
        |ORDER BY w DESC, o_orderkey LIMIT 5""".stripMargin)
    assert(lifted == selectList,
      s"lift grew the exchange count: lifted=$lifted selectList=$selectList")
  }

  test("ANN centroid/code assignment is a zero-shuffle per-row argmax — no window, no exchange (r14 verdict #1)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 6 corpus vectors, 3 centroids, hand-checkable cosines
    val vecs = Seq(
      (10L, Array(1f, 0f)), (11L, Array(0f, 1f)), (12L, Array(1f, 1f)),
      (13L, Array(-1f, 0f)), (14L, Array(0.9f, 0.1f)), (15L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((1, Array(1f, 0f)), (2, Array(0f, 1f)), (3, Array(1f, 1f)))
      .toDF("cid", "cent")
    val assigned = graft.queries.PipelineQueries.nearestCentroid(vecs, cents)
    val s = plan(assigned).toString
    // the whole assign stage: scan -> broadcast(1-row codebook) -> project.
    // At 100 TB the old row_number shape shuffled + sorted the k×-exploded
    // corpus; this pin keeps it exchange- and window-free.
    assert(!s.contains("Window"), s"window crept back into assign:\n$s")
    assert(!s.contains("Exchange hashpartitioning"), s"assign shuffles:\n$s")
    assert(!s.contains("Sort "), s"assign sorts:\n$s")
    val got = assigned.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // ties (vec 12/15 cos to c3 is 1.0) and orthogonals land deterministically
    assert(got === Map(10L -> 1, 11L -> 2, 12L -> 3, 13L -> 2, 14L -> 1, 15L -> 3), got.toString)
    // PQ sub-code assignment: same contract per (vec_id, m)
    val subs = Seq(
      (10L, 0, Array(0.0, 0.0)), (10L, 1, Array(1.0, 1.0)),
      (11L, 0, Array(0.5, 0.5)), (11L, 1, Array(0.0, 0.1)))
      .toDF("vec_id", "m", "sv")
    val cb = Seq(
      (0, 1, Array(0.0, 0.0)), (0, 2, Array(1.0, 1.0)),
      (1, 1, Array(0.0, 0.0)), (1, 2, Array(1.0, 1.0)))
      .toDF("m", "scid", "scent")
    val codes = graft.queries.PipelineQueries.nearestSubCode(subs, cb)
    val s2 = plan(codes).toString
    assert(!s2.contains("Window"), s"window crept back into PQ encode:\n$s2")
    assert(!s2.replace("Exchange hashpartitioning(m#", "")
      .contains("Exchange hashpartitioning"), s"PQ encode shuffles the corpus:\n$s2")
    val gotPq = codes.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    // (11,0) is equidistant 0.72 from both codes -> lowest scid wins
    assert(gotPq === Map((10L, 0) -> 1, (10L, 1) -> 2, (11L, 0) -> 1, (11L, 1) -> 1),
      gotPq.toString)
  }
}
