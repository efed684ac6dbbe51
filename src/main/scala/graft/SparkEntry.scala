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
    }),

    // ---- r6: sketch-BOUND rows — each no_oracle sketch family gains a
    // derived row whose claim IS oracle-checkable: |estimate − exact| ≤
    // bound as a boolean (estimates are deterministic given the hashes).
    // Where the exact side is plain SQL, DuckDB recomputes it; where it
    // is engine arithmetic (rank of an estimate, hash checksums), the
    // oracle states the deterministic booleans. ----
    // HLL estimate within 5% of the exact distinct count, per group;
    // DuckDB independently recomputes nd_exact
    "sketch_approx_distinct_bound" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("est"),
          countDistinct(col("l_partkey")).as("nd_exact"))
        .select(col("l_returnflag"), col("nd_exact"),
          (abs(col("est") - col("nd_exact")) <= col("nd_exact") * 0.05)
            .as("within_bound"))
    }),
    // merged-HLL cardinality within 10% of the exact global distinct
    "sketch_hll_merge_bound" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """SELECT nd_exact,
          |  abs(est - nd_exact) <= nd_exact * 0.10 AS within_bound
          |FROM (SELECT hll_cardinality(merge_hll(sketch)) AS est
          |      FROM (SELECT l_returnflag, approx_set_agg_long(l_partkey) AS sketch
          |            FROM lineitem GROUP BY l_returnflag)),
          |     (SELECT count(DISTINCT l_partkey) AS nd_exact FROM lineitem)""".stripMargin)
    }),
    // percentile_approx estimates land within 2% RANK error of exact:
    // the estimate's rank fraction (share of rows ≤ estimate) must
    // bracket the target quantile — the sketch's own guarantee
    // (accuracy 10000 ⇒ ε = 1e-4; 0.02 slack absorbs value ties)
    "sketch_approx_percentile_bound" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val est = li.groupBy(col("l_linestatus"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"))
      li.join(est, "l_linestatus").groupBy(col("l_linestatus"))
        .agg((sum(when(col("l_extendedprice") <= col("p50"), 1L).otherwise(0L))
            / count(lit(1))).as("f50"),
          (sum(when(col("l_extendedprice") <= col("p99"), 1L).otherwise(0L))
            / count(lit(1))).as("f99"))
        .select(col("l_linestatus"),
          (col("f50") >= 0.48 && col("f50") <= 0.52).as("p50_rank_ok"),
          (col("f99") >= 0.97).as("p99_rank_ok"))
    }),
    // merged qdigest/tdigest quantiles within 2% rank error of exact
    // (QDigestSpec pins ε = 64/k; TDigestSpec pins ≤1.5% merged)
    "sketch_qdigest_bound" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """WITH m AS (SELECT merge_qdigest(sk) AS m FROM (
          |    SELECT l_returnflag, qdigest_agg(l_extendedprice) AS sk
          |    FROM lineitem GROUP BY l_returnflag)),
          |est AS (SELECT max(value_at_quantile(m, 0.5)) AS p50,
          |               max(value_at_quantile(m, 0.95)) AS p95 FROM m)
          |SELECT
          |  sum(CASE WHEN l_extendedprice <= est.p50 THEN 1 ELSE 0 END) / count(*)
          |    BETWEEN 0.48 AND 0.52 AS p50_rank_ok,
          |  sum(CASE WHEN l_extendedprice <= est.p95 THEN 1 ELSE 0 END) / count(*)
          |    BETWEEN 0.93 AND 0.97 AS p95_rank_ok
          |FROM lineitem, est""".stripMargin)
    }),
    "sketch_tdigest_bound" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """WITH m AS (SELECT merge_tdigest(sk) AS m FROM (
          |    SELECT l_returnflag, tdigest_agg(l_extendedprice) AS sk
          |    FROM lineitem GROUP BY l_returnflag)),
          |est AS (SELECT max(tdigest_value_at_quantile(m, 0.5)) AS p50,
          |               max(tdigest_value_at_quantile(m, 0.99)) AS p99 FROM m)
          |SELECT
          |  sum(CASE WHEN l_extendedprice <= est.p50 THEN 1 ELSE 0 END) / count(*)
          |    BETWEEN 0.48 AND 0.52 AS p50_rank_ok,
          |  sum(CASE WHEN l_extendedprice <= est.p99 THEN 1 ELSE 0 END) / count(*)
          |    >= 0.97 AS p99_rank_ok
          |FROM lineitem, est""".stripMargin)
    }),
    // SetDigest jaccard estimates within the bottom-k 4σ band (±0.18,
    // SetDigestSpec) of the EXACT token jaccard, which DuckDB recomputes
    // independently from the token sets
    "sketch_setdigest_bound" -> ((s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """WITH tok AS (
          |  SELECT DISTINCT lang, token FROM (
          |    SELECT lang,
          |      explode(split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')) AS token
          |    FROM documents)),
          |sz AS (SELECT lang, count(*) AS n FROM tok GROUP BY lang),
          |common AS (SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS c
          |           FROM tok a JOIN tok b ON a.token = b.token AND a.lang < b.lang
          |           GROUP BY a.lang, b.lang),
          |ex AS (SELECT lang_a, lang_b,
          |         c / cast(sa.n + sb.n - c AS double) AS jac_exact
          |       FROM common JOIN sz sa ON sa.lang = lang_a
          |                   JOIN sz sb ON sb.lang = lang_b),
          |dig AS (SELECT lang, make_set_digest(token) AS d FROM tok GROUP BY lang),
          |est AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
          |          jaccard_index(a.d, b.d) AS jest
          |        FROM dig a JOIN dig b ON a.lang < b.lang)
          |SELECT ex.lang_a, ex.lang_b, round(ex.jac_exact, 3) AS jac_exact,
          |  abs(est.jest - ex.jac_exact) <= 0.18 AS within_bound
          |FROM ex JOIN est ON ex.lang_a = est.lang_a AND ex.lang_b = est.lang_b
          |ORDER BY lang_a, lang_b""".stripMargin)
    }),
    // ---- r8: sketch WIRE-FORMAT round-trip (r7 verdict #8) — the one
    // sketch property no other row exercises: a sketch column written
    // to parquet, read back, and merged must behave exactly like the
    // never-serialized sketch. That is the contract that lets 100 TB
    // pipelines stage per-partition sketches in tables and merge them
    // later (the reference's qdigest/tdigest/HLL/SetDigest types are
    // all defined by their wire format — e.g. its SetDigest ships as
    // varbinary). Each family's merged post-roundtrip estimate is
    // compared to the direct in-plan merge; booleans pinned TRUE. ----
    "sketch_wire_roundtrip" -> ((s, dir) => {
      Tables.register(s, dir)
      // dirs/views registered with TempArtifacts: the returned plan still
      // reads them, so the RUNNER deletes them after the action (r8
      // verdict #3 — repeated Verify runs were leaking /tmp dirs + views)
      val out1 = graft.engine.TempArtifacts.dir("graft-sketchrt1")
      val out2 = graft.engine.TempArtifacts.dir("graft-sketchrt2")
      val perGroup =
        """SELECT l_returnflag, approx_set_agg_long(l_partkey) AS hll,
          |  qdigest_agg(l_extendedprice) AS qd,
          |  tdigest_agg(l_extendedprice) AS td
          |FROM lineitem GROUP BY l_returnflag""".stripMargin
      // two cascaded round-trips: store2 = parquet(read(parquet(build))).
      // Byte equality store1 = store2 pins deserialize∘serialize =
      // identity for every family with NO dependence on sketch-build
      // determinism; merged-estimate equality is additionally claimed
      // for HLL (bucket-max merge — provably order-insensitive) against
      // the never-serialized build, and for qdigest/tdigest between the
      // two stores (single-file scans, deterministic row order — their
      // merges, like the reference's, are accumulation-order-sensitive,
      // so a direct-vs-store merged comparison would race scan order).
      s.sql(perGroup).coalesce(1).write.mode("overwrite").parquet(out1)
      s.read.parquet(out1).coalesce(1).write.mode("overwrite").parquet(out2)
      s.read.parquet(out1).createOrReplaceTempView(graft.engine.TempArtifacts.view("graft_sketch_store"))
      s.read.parquet(out2).createOrReplaceTempView(graft.engine.TempArtifacts.view("graft_sketch_store2"))
      s.sql(perGroup).createOrReplaceTempView(graft.engine.TempArtifacts.view("graft_sketch_direct"))
      s.sql(
        """WITH pg AS (SELECT bool_and(a.hll = b.hll) AS hll_b,
          |    bool_and(a.qd = b.qd) AS qd_b, bool_and(a.td = b.td) AS td_b
          |  FROM graft_sketch_store a JOIN graft_sketch_store2 b
          |    USING (l_returnflag)),
          |dm AS (SELECT merge_hll(hll) AS mh FROM graft_sketch_direct),
          |r1 AS (SELECT merge_hll(hll) AS mh, merge_qdigest(qd) AS mq,
          |    merge_tdigest(td) AS mt FROM graft_sketch_store),
          |r2 AS (SELECT merge_qdigest(qd) AS mq, merge_tdigest(td) AS mt
          |  FROM graft_sketch_store2)
          |SELECT
          |  pg.hll_b AND hll_cardinality(dm.mh) = hll_cardinality(r1.mh)
          |    AS hll_stable,
          |  pg.qd_b AND value_at_quantile(r1.mq, 0.5) = value_at_quantile(r2.mq, 0.5)
          |    AS qdigest_stable,
          |  pg.td_b AND tdigest_value_at_quantile(r1.mt, 0.5) =
          |    tdigest_value_at_quantile(r2.mt, 0.5) AS tdigest_stable
          |FROM pg CROSS JOIN dm CROSS JOIN r1 CROSS JOIN r2""".stripMargin)
    }),

    // setdigest round-trip: per-lang token digests through parquet; the
    // pairwise jaccard estimates from stored sketches must equal the
    // direct path bit-for-bit
    "sketch_setdigest_roundtrip" -> ((s, dir) => {
      Tables.register(s, dir)
      val out = graft.engine.TempArtifacts.dir("graft-sdrt")
      val perLang =
        """SELECT lang, make_set_digest(token) AS d FROM (
          |  SELECT lang, explode(split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')) AS token
          |  FROM documents) GROUP BY lang""".stripMargin
      s.sql(perLang).write.mode("overwrite").parquet(out)
      s.read.parquet(out).createOrReplaceTempView(graft.engine.TempArtifacts.view("graft_sd_store"))
      s.sql(perLang).createOrReplaceTempView(graft.engine.TempArtifacts.view("graft_sd_direct"))
      s.sql(
        """SELECT a.lang AS lang_a, b.lang AS lang_b,
          |  x.jd = jaccard_index(a.d, b.d) AS jaccard_stable,
          |  set_digest_cardinality(a.d) = set_digest_cardinality(x.da) AS card_stable
          |FROM graft_sd_store a JOIN graft_sd_store b ON a.lang < b.lang
          |JOIN (SELECT a2.lang AS la, b2.lang AS lb,
          |        jaccard_index(a2.d, b2.d) AS jd, a2.d AS da
          |      FROM graft_sd_direct a2 JOIN graft_sd_direct b2 ON a2.lang < b2.lang) x
          |  ON x.la = a.lang AND x.lb = b.lang
          |ORDER BY lang_a, lang_b""".stripMargin)
    }),

    // checksum properties the reference contract implies: invariant to
    // row order/partitioning, sensitive to any value change
    "sketch_checksum_bound" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      def ck(df: org.apache.spark.sql.DataFrame) =
        df.agg(bit_xor(xxhash64(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))).as("c"))
      val base = ck(orders)
      val shuffled = ck(orders.repartition(7, col("o_custkey")))
      val mutated = ck(orders.withColumn("o_totalprice",
        when(col("o_orderkey") === 1, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice"))))
      base.crossJoin(shuffled.withColumnRenamed("c", "c_shuffled"))
        .crossJoin(mutated.withColumnRenamed("c", "c_mutated"))
        .select((col("c") === col("c_shuffled")).as("order_invariant"),
          (col("c") =!= col("c_mutated")).as("sensitive"))
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
        |FROM documents""".stripMargin,
    // ---- r6 sketch-bound rows: exact sides DuckDB recomputes; rank /
    // hash claims are deterministic booleans ----
    "sketch_approx_distinct_bound" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_exact,
        |true AS within_bound FROM lineitem GROUP BY 1""".stripMargin,
    "sketch_hll_merge_bound" ->
      "SELECT count(DISTINCT l_partkey) AS nd_exact, true AS within_bound FROM lineitem",
    "sketch_approx_percentile_bound" ->
      """SELECT l_linestatus, true AS p50_rank_ok, true AS p99_rank_ok
        |FROM lineitem GROUP BY 1""".stripMargin,
    "sketch_qdigest_bound" ->
      "SELECT true AS p50_rank_ok, true AS p95_rank_ok",
    "sketch_tdigest_bound" ->
      "SELECT true AS p50_rank_ok, true AS p99_rank_ok",
    "sketch_setdigest_bound" ->
      """WITH tok AS (SELECT DISTINCT lang, token FROM (
        |  SELECT lang, unnest(string_split(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents)),
        |sz AS (SELECT lang, count(*) AS n FROM tok GROUP BY lang),
        |common AS (SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS c
        |           FROM tok a JOIN tok b ON a.token = b.token AND a.lang < b.lang
        |           GROUP BY 1, 2)
        |SELECT lang_a, lang_b,
        |  round(c / (sa.n + sb.n - c)::double, 3) AS jac_exact,
        |  true AS within_bound
        |FROM common JOIN sz sa ON sa.lang = lang_a
        |            JOIN sz sb ON sb.lang = lang_b
        |ORDER BY lang_a, lang_b""".stripMargin,
    "sketch_checksum_bound" ->
      "SELECT true AS order_invariant, true AS sensitive",
    // r8 wire-format round-trips: serialized-form stability is a
    // deterministic engine property — the oracle states the booleans
    // (and, for setdigest, the pair frame DuckDB can enumerate)
    "sketch_wire_roundtrip" ->
      "SELECT true AS hll_stable, true AS qdigest_stable, true AS tdigest_stable",
    "sketch_setdigest_roundtrip" ->
      """SELECT a.lang AS lang_a, b.lang AS lang_b,
        |  true AS jaccard_stable, true AS card_stable
        |FROM (SELECT DISTINCT lang FROM documents) a
        |JOIN (SELECT DISTINCT lang FROM documents) b ON a.lang < b.lang
        |ORDER BY lang_a, lang_b""".stripMargin)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.queries ++ TpcdsQueries.queries ++ OperatorQueries.queries ++
      FunctionQueries.queries ++
      EventQueries.queries ++ PipelineQueries.queries ++ ExtendedQueries.queries ++
      GeoQueries.queries ++ EngineQueries.queries ++ sketchQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible /
    * approximate ops → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    TpchQueries.oracles ++ TpcdsQueries.oracles ++ OperatorQueries.oracles ++
      FunctionQueries.oracles ++
      EventQueries.oracles ++ PipelineQueries.oracles ++ ExtendedQueries.oracles ++
      GeoQueries.oracles ++ EngineQueries.oracles ++ sketchOracles
}
