package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The engine surface = catalog over parquet (graft.engine.Tables), the
  * Trino-compat function pack (graft.functions), and the query inventory
  * (graft.queries.*), each entry mapping to a SURVEY §2 operator family.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: TPC-H Q5-style star join —
    * scan+filter+broadcast joins+shuffle join+agg in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    TpchQueries.queries("tpch_q5")(spark, "/root/testdata/sf0.001")

  /** Approx/sketch operators: results are estimates, so no DuckDB
    * hash-match is possible (different sketch algorithms) — these are
    * rows-only checked by the driver; their accuracy bounds are asserted
    * in the ScalaTest specs instead.
    */
  private val sketchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference: ApproximateCountDistinctAggregation.java (HLL)
    "sketch_approx_distinct" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("nd_part_approx"),
          count(lit(1)).as("n"))
    }),
    // reference: ApproximateSetAggregation + HyperLogLogFunctions —
    // sketch-as-a-value: build per-group HLLs, merge them, read
    // cardinality; typed (long) input path, no per-row String round-trip
    "sketch_hll_merge" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """SELECT hll_cardinality(merge_hll(sketch)) AS nd_merged
          |FROM (SELECT l_returnflag, approx_set_agg_long(l_partkey) AS sketch
          |      FROM lineitem GROUP BY l_returnflag)""".stripMargin)
    }),
    // reference: ApproximateLongPercentileAggregations (tdigest)
    "sketch_approx_percentile" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem").groupBy(col("l_linestatus"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"))
    }),
    // reference: ApproximateMostFrequentHistogram (space-saving); capacity
    // 64 > true distinct count here, so counts are exact → oracle-matched
    "sketch_top_k" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """SELECT t.item, t.cnt FROM (
          |  SELECT approx_top_k(o_orderpriority) AS m FROM orders
          |) LATERAL VIEW explode(m) t AS item, cnt""".stripMargin)
    }),
    // qdigest/tdigest analog: sketch-as-value quantiles — build per-group,
    // merge across groups, read quantiles from the merged sketch
    // (reference QuantileDigestAggregationFunction + MergeQuantileDigest)
    "sketch_qdigest" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """SELECT round(value_at_quantile(m, 0.5), 2) AS p50,
          |round(value_at_quantile(m, 0.95), 2) AS p95,
          |round(value_at_quantile(m, 0.99), 2) AS p99
          |FROM (SELECT merge_qdigest(sk) AS m FROM (
          |  SELECT l_returnflag, qdigest_agg(l_extendedprice) AS sk
          |  FROM lineitem GROUP BY l_returnflag))""".stripMargin)
    }),
    // tdigest proper (reference TDigestAggregationFunction.java): build
    // per-group, merge across groups, read tail quantiles from the merged
    // digest — estimates, rows-only (error bounds asserted in TDigestSpec)
    "sketch_tdigest" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """SELECT round(tdigest_value_at_quantile(m, 0.5), 2) AS p50,
          |round(tdigest_value_at_quantile(m, 0.95), 2) AS p95,
          |round(tdigest_value_at_quantile(m, 0.99), 2) AS p99
          |FROM (SELECT merge_tdigest(sk) AS m FROM (
          |  SELECT l_returnflag, tdigest_agg(l_extendedprice) AS sk
          |  FROM lineitem GROUP BY l_returnflag))""".stripMargin)
    }),
    // SetDigest sketch-as-value (reference SetDigestFunctions.java):
    // per-language token digests, pairwise similarity from the sketches
    // alone — estimates, so rows-only (accuracy bounded in SetDigestSpec)
    "sketch_setdigest" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """WITH tok AS (
          |  SELECT lang, explode(split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')) AS token
          |  FROM documents),
          |dig AS (SELECT lang, make_set_digest(token) AS d FROM tok GROUP BY lang)
          |SELECT a.lang AS lang_a, b.lang AS lang_b,
          |  set_digest_cardinality(a.d) AS card_a,
          |  round(jaccard_index(a.d, b.d), 3) AS jac,
          |  intersection_cardinality(a.d, b.d) AS est_common
          |FROM dig a JOIN dig b ON a.lang < b.lang
          |ORDER BY lang_a, lang_b""".stripMargin)
    }),
    // multimodal decode pipeline (operators.Multimodal): per-doc synthetic
    // PNGs → REAL javax.imageio decode (format/width/height from the codec)
    "mm_decode" -> ((s, dir) => graft.operators.Multimodal.pipeline(s, dir)),
    // order-independent checksum over rows (ChecksumAggregationFunction):
    // xor of xxhash64 is associative+commutative → distributes freely and
    // cannot overflow under ANSI arithmetic
    "sketch_checksum" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .agg(bit_xor(xxhash64(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
          .as("table_checksum"))
    }))

  private val sketchOracles: Map[String, String] = Map(
    // capacity > distinct ⇒ exact counts; plain GROUP BY reproduces them
    "sketch_top_k" ->
      """SELECT o_orderpriority AS item, count(*) AS cnt
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // the PNG generator keys dimensions off doc_id; the oracle restates
    // that arithmetic, so the row is green only if ImageIO's decode of the
    // encoded PNG recovers the generator's numbers exactly
    "mm_decode" ->
      """SELECT doc_id AS media_id, 'png' AS format,
        |(8 + doc_id % 56)::int AS width,
        |(8 + (doc_id * 7) % 56)::int AS height,
        |((8 + doc_id % 56) * (8 + (doc_id * 7) % 56))::int AS npixels,
        |1.0::double AS self_cos
        |FROM documents""".stripMargin)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.queries ++ OperatorQueries.queries ++ FunctionQueries.queries ++
      EventQueries.queries ++ PipelineQueries.queries ++ ExtendedQueries.queries ++
      GeoQueries.queries ++ EngineQueries.queries ++ sketchQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible /
    * approximate ops → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    TpchQueries.oracles ++ OperatorQueries.oracles ++ FunctionQueries.oracles ++
      EventQueries.oracles ++ PipelineQueries.oracles ++ ExtendedQueries.oracles ++
      GeoQueries.oracles ++ EngineQueries.oracles ++ sketchOracles
}
