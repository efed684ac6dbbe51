package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Tables

/** Extended SURVEY §2 coverage: UNNEST variants (§2.8), map functions
  * (§2.10), the TRY dialect shim and FETCH FIRST ... WITH TIES lowering
  * (§4.3), numeric_histogram and map_agg analogs (§2.4).
  */
object ExtendedQueries {
  type Q = (SparkSession, String) => DataFrame

  private def q(sql: String): Q = (s, dir) => Tables.sql(s, dir, sql)

  private val defs: Map[String, (String, String)] = Map(
    // UNNEST WITH ORDINALITY (reference unnest/UnnestOperator.java:39)
    "unnest_ordinality" -> (
      """SELECT doc_id, pos + 1 AS ord, tok
        |FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents WHERE doc_id < 20)
        |LATERAL VIEW posexplode(toks) t AS pos, tok""".stripMargin,
      """SELECT doc_id, i AS ord, toks[i] AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20) d,
        |LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) g""".stripMargin),
    // multi-argument zip unnest (UNNEST(a, b) in Trino zips arrays)
    "unnest_zip" -> (
      """SELECT n_nationkey, pos + 1 AS i, z.a AS a_val, z.b AS b_val
        |FROM (SELECT n_nationkey,
        |        sequence(1, 3) AS a,
        |        sequence(n_regionkey, n_regionkey + 2) AS b
        |      FROM nation)
        |LATERAL VIEW posexplode(arrays_zip(a, b)) t AS pos, z""".stripMargin,
      """SELECT n_nationkey, i, a[i] AS a_val, b[i] AS b_val
        |FROM (SELECT n_nationkey, range(1, 4) AS a,
        |        range(n_regionkey, n_regionkey + 3) AS b FROM nation) d,
        |LATERAL (SELECT unnest(range(1, 4)) AS i) g""".stripMargin),
    // map unnest (MapUnnester.java)
    "unnest_map" -> (
      """SELECT n_nationkey, k, v
        |FROM (SELECT n_nationkey, map('nat', n_nationkey, 'reg', n_regionkey) AS m FROM nation)
        |LATERAL VIEW explode(m) t AS k, v""".stripMargin,
      """SELECT n_nationkey, 'nat' AS k, n_nationkey AS v FROM nation
        |UNION ALL
        |SELECT n_nationkey, 'reg' AS k, n_regionkey AS v FROM nation""".stripMargin),
    // Trino's own UNNEST spelling, driven through the dialect shim
    // (Dialect.rewriteUnnest lowers CROSS JOIN UNNEST ... WITH ORDINALITY
    // to a Spark lateral posexplode subquery)
    "unnest_trino_ordinality" -> (
      """SELECT doc_id, ord, tok
        |FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents WHERE doc_id < 20)
        |CROSS JOIN UNNEST(toks) WITH ORDINALITY AS t(tok, ord)""".stripMargin,
      """SELECT doc_id, i AS ord, toks[i] AS tok
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 20) d,
        |LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) g""".stripMargin),
    // map-typed UNNEST (two output columns, no ordinality → entries)
    "unnest_trino_map" -> (
      """SELECT n_nationkey, k, v
        |FROM (SELECT n_nationkey, map('nat', n_nationkey, 'reg', n_regionkey) AS m FROM nation)
        |CROSS JOIN UNNEST(m) AS t(k, v)""".stripMargin,
      """SELECT n_nationkey, 'nat' AS k, n_nationkey AS v FROM nation
        |UNION ALL
        |SELECT n_nationkey, 'reg' AS k, n_regionkey AS v FROM nation""".stripMargin),
    // map function family (Map*.java); scalar/array outputs for comparison
    "fn_map" -> (
      """SELECT n_nationkey,
        |element_at(m, 'reg') AS reg_val,
        |size(m) AS m_size,
        |array_join(sort_array(map_keys(m)), ',') AS keys_sorted,
        |array_max(map_values(m)) AS max_val,
        |element_at(map_concat(m, map('extra', 99)), 'extra') AS extra_val,
        |size(map_filter(m, (k, v) -> v > 2)) AS n_big,
        |element_at(transform_values(m, (k, v) -> v * 10), 'nat') AS nat_x10,
        |element_at(str_to_map('a:1,b:2', ',', ':'), 'b') AS from_str
        |FROM (SELECT n_nationkey, map('nat', n_nationkey, 'reg', n_regionkey) AS m FROM nation)""".stripMargin,
      """SELECT n_nationkey,
        |n_regionkey AS reg_val,
        |2::int AS m_size,
        |'nat,reg' AS keys_sorted,
        |greatest(n_nationkey, n_regionkey) AS max_val,
        |99 AS extra_val,
        |((CASE WHEN n_nationkey > 2 THEN 1 ELSE 0 END) +
        | (CASE WHEN n_regionkey > 2 THEN 1 ELSE 0 END))::int AS n_big,
        |n_nationkey * 10 AS nat_x10,
        |'2' AS from_str
        |FROM nation""".stripMargin),
    // generic TRY (TryFunction.java) over ANSI error paths
    "fn_try" -> (
      """SELECT c_custkey,
        |try(cast(c_name AS int)) AS bad_cast,
        |try(c_custkey div (c_nationkey - c_nationkey)) AS div_zero,
        |try(element_at(array(1, 2), 99)) AS oob,
        |try(c_acctbal / 2.0) AS fine
        |FROM customer WHERE c_custkey <= 100""".stripMargin,
      """SELECT c_custkey,
        |NULL::int AS bad_cast,
        |NULL::bigint AS div_zero,
        |NULL::int AS oob,
        |c_acctbal / 2.0 AS fine
        |FROM customer WHERE c_custkey <= 100""".stripMargin),
    // FETCH FIRST ... WITH TIES via the dialect shim (ImplementLimitWithTies)
    "fetch_with_ties" -> (
      """SELECT o_custkey, o_totalprice FROM orders
        |ORDER BY floor(o_totalprice / 100000) DESC
        |FETCH FIRST 5 ROWS WITH TIES""".stripMargin,
      """SELECT o_custkey, o_totalprice FROM (
        |  SELECT o_custkey, o_totalprice,
        |    rank() OVER (ORDER BY floor(o_totalprice / 100000) DESC) AS r
        |  FROM orders) t WHERE r <= 5""".stripMargin),
    // numeric_histogram analog (NumericHistogramAggregation): fixed-width
    // buckets via width_bucket + group-count
    "agg_histogram" -> (
      """SELECT width_bucket(o_totalprice, 0, 600000, 12) AS bucket,
        |count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1""".stripMargin,
      """SELECT least(greatest(floor(o_totalprice / 50000)::bigint + 1, 0), 13) AS bucket,
        |count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1""".stripMargin),
    // GROUPS window frames (reference GroupsFraming.java; no native Spark
    // or DuckDB support): lowered to dense_rank + RANGE over the rank —
    // the defining equivalence of GROUPS semantics. "GROUPS n PRECEDING"
    // ≡ "RANGE n PRECEDING over the peer-group index".
    "win_groups_frame" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |count(*) OVER (PARTITION BY o_orderstatus ORDER BY g
        |  RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS rows_in_2_groups
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders))""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |count(*) OVER (PARTITION BY o_orderstatus ORDER BY g
        |  RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS rows_in_2_groups
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t) t2""".stripMargin),
    // SQL-2016 frame exclusion (reference GroupsFraming.java handles
    // EXCLUDE alongside GROUPS): Spark has no EXCLUDE clause, so
    // EXCLUDE GROUP is emulated as frame-sum minus peer-group-sum over
    // the dense_rank lowering. The ORACLE uses DuckDB's NATIVE
    // "EXCLUDE GROUP" (supported for ROWS/RANGE since 0.9) over the
    // same rank framing — the emulation is pinned against a real
    // implementation of the clause, not against itself. coalesce(., 0)
    // aligns the empty-frame case (first group: native EXCLUDE yields
    // an empty frame → NULL; the subtraction yields 0).
    // All three EXCLUDE modes are subtraction-emulable for INVERTIBLE
    // (sum-class) aggregates: GROUP = frame − peer-group; TIES = frame
    // − peer-group + current value; CURRENT ROW = frame − current
    // value. PRECONDITION (r8 advisory): the subtraction is exact only
    // when the current row's peer group is wholly contained in the
    // frame — guaranteed here because the frame is RANGE-mode and ends
    // at CURRENT ROW (RANGE CURRENT ROW = end of peer group; any RANGE
    // frame bounded at CURRENT ROW or later qualifies). Do NOT reuse
    // this emulation under ROWS/GROUPS frames or frames ending before
    // CURRENT ROW, where the peer group can straddle the frame edge —
    // there, use the two-segment recompute (win_groups_exclude_minmax
    // below), which never relies on invertibility or containment.
    // Non-invertible aggregates: min/max → win_groups_exclude_minmax;
    // collect-class → win_groups_exclude_list. No EXCLUDE gap remains.
    "win_groups_exclude" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  s_frame - s_peer AS sum_excl_group,
        |  s_frame - s_peer + o_orderkey AS sum_excl_ties,
        |  s_frame - o_orderkey AS sum_excl_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s_frame,
        |    sum(o_orderkey) OVER (PARTITION BY o_orderstatus, g) AS s_peer
        |  FROM (
        |    SELECT o_orderkey, o_orderstatus, bucket,
        |      dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |    FROM (SELECT o_orderkey, o_orderstatus,
        |          cast(floor(o_totalprice / 100000) AS bigint) AS bucket
        |          FROM orders)))""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  coalesce(sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE GROUP), 0)::bigint
        |    AS sum_excl_group,
        |  coalesce(sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE TIES), 0)::bigint
        |    AS sum_excl_ties,
        |  coalesce(sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW), 0)::bigint
        |    AS sum_excl_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 100000)::bigint AS bucket
        |        FROM orders) t) t2""".stripMargin),
    // EXCLUDE for NON-INVERTIBLE aggregates (min/max) — the r8 documented
    // gap, closed by two-segment recompute instead of subtraction
    // (reference window/GroupsFraming.java recomputes the frame after
    // exclusion; so do we, as segment minima). Frame is RANGE BETWEEN
    // 1 PRECEDING AND 1 FOLLOWING over the dense_rank group index g, so
    // the frame spans peer groups {g−1, g, g+1} and the excluded current
    // group sits strictly INSIDE the frame — the two segments are
    //   before: RANGE 1 PRECEDING AND 1 PRECEDING   (all of group g−1)
    //   after:  RANGE 1 FOLLOWING AND 1 FOLLOWING   (all of group g+1)
    // EXCLUDE GROUP      = least/greatest(before, after)
    // EXCLUDE TIES       = least/greatest(before, after, own value)
    // EXCLUDE CURRENT ROW= least/greatest(before, after, peer-minus-self)
    // where peer-minus-self splits the CURRENT GROUP around the row by a
    // deterministic within-group order (o_orderkey is unique):
    // ROWS UNBOUNDED PRECEDING..1 PRECEDING ∪ 1 FOLLOWING..UNBOUNDED
    // FOLLOWING over PARTITION BY (status, g). Spark's least/greatest
    // skip NULLs, so empty segments fall out and an all-empty exclusion
    // frame yields NULL — matching DuckDB's native EXCLUDE (the oracle).
    "win_groups_exclude_minmax" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  least(m_prev, m_next) AS min_excl_group,
        |  least(m_prev, m_next, o_orderkey) AS min_excl_ties,
        |  least(m_prev, m_next, m_self_lo, m_self_hi) AS min_excl_current,
        |  greatest(x_prev, x_next) AS max_excl_group,
        |  greatest(x_prev, x_next, o_orderkey) AS max_excl_ties,
        |  greatest(x_prev, x_next, x_self_lo, x_self_hi) AS max_excl_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS m_prev,
        |    min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS m_next,
        |    min(o_orderkey) OVER (PARTITION BY o_orderstatus, g ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_self_lo,
        |    min(o_orderkey) OVER (PARTITION BY o_orderstatus, g ORDER BY o_orderkey
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS m_self_hi,
        |    max(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS x_prev,
        |    max(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS x_next,
        |    max(o_orderkey) OVER (PARTITION BY o_orderstatus, g ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS x_self_lo,
        |    max(o_orderkey) OVER (PARTITION BY o_orderstatus, g ORDER BY o_orderkey
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS x_self_hi
        |  FROM (
        |    SELECT o_orderkey, o_orderstatus, bucket,
        |      dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |    FROM (SELECT o_orderkey, o_orderstatus,
        |          cast(floor(o_totalprice / 100000) AS bigint) AS bucket
        |          FROM orders)))""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS min_excl_group,
        |  min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS min_excl_ties,
        |  min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS min_excl_current,
        |  max(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS max_excl_group,
        |  max(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS max_excl_ties,
        |  max(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS max_excl_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 100000)::bigint AS bucket
        |        FROM orders) t) t2""".stripMargin),

    // EXCLUDE for COLLECT-class aggregates — with min/max closed above,
    // this removes the last of the "min/max/collect under EXCLUDE"
    // family: the same two-segment decomposition, recombined by ARRAY
    // CONCAT instead of least/greatest (concatenation of segment
    // collections = collection over the excluded frame, up to order —
    // both sides compare canonically SORTED and rendered to strings,
    // per the driver's array-column rule). EXCLUDE TIES re-adds the
    // current row's own value; EXCLUDE CURRENT ROW splits the current
    // group around the row. The o_orderkey % 50 slice bounds the output
    // (whole peer groups appear in every row's list). Oracle: DuckDB's
    // native list(...) OVER (... EXCLUDE ...), list_sort'ed; an empty
    // exclusion frame is [] on both sides (Spark concat of empty
    // collect_lists; DuckDB coalesce(list(...), [])).
    "win_groups_exclude_list" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  array_join(sort_array(concat(l_prev, l_next)), ',') AS list_excl_group,
        |  array_join(sort_array(concat(l_prev, array(o_orderkey), l_next)), ',') AS list_excl_ties,
        |  array_join(sort_array(concat(l_prev, l_lo, l_hi, l_next)), ',') AS list_excl_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    collect_list(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS l_prev,
        |    collect_list(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING) AS l_next,
        |    collect_list(o_orderkey) OVER (PARTITION BY o_orderstatus, g ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS l_lo,
        |    collect_list(o_orderkey) OVER (PARTITION BY o_orderstatus, g ORDER BY o_orderkey
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS l_hi
        |  FROM (
        |    SELECT o_orderkey, o_orderstatus, bucket,
        |      dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |    FROM (SELECT o_orderkey, o_orderstatus,
        |          cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |          FROM orders WHERE o_orderkey % 50 = 0)))""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  array_to_string(list_sort(coalesce(list(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP), [])), ',') AS list_excl_group,
        |  array_to_string(list_sort(coalesce(list(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES), [])), ',') AS list_excl_ties,
        |  array_to_string(list_sort(coalesce(list(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW), [])), ',') AS list_excl_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 30000)::bigint AS bucket
        |        FROM orders WHERE o_orderkey % 50 = 0) t) t2""".stripMargin),

    // ---- GROUPS/EXCLUDE as INPUT SYNTAX (r9 verdict, Missing #1) ----
    // The five rows below carry the SQL-2016 window syntax in their
    // Spark-side TEXT: `GROUPS BETWEEN ...` frames and `EXCLUDE GROUP /
    // TIES / CURRENT ROW` clauses, lowered at the SQL entry by
    // sqlcompat/WindowFrames (reference trino-parser
    // tree/WindowFrame.java:30 parses these; window/GroupsFraming.java
    // executes them). The hand-lowered siblings above pin the RECIPES;
    // these pin the PARSER+REWRITE: same oracle discipline (DuckDB's
    // native EXCLUDE where it exists; the dense_rank lowering for GROUPS,
    // which DuckDB also lacks).
    "win_sql_groups_frame" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |count(*) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |  GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS rows_in_2_groups
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |count(*) OVER (PARTITION BY o_orderstatus ORDER BY g
        |  RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS rows_in_2_groups
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t) t2""".stripMargin),
    // sum (invertible) under a GROUPS frame: the entry lowers EXCLUDE to
    // the two-segment recompute — empty excluded frames are NULL on both
    // sides (no coalesce needed, unlike the hand-written subtraction
    // sibling where Spark produced 0)
    "win_sql_exclude_sum" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS sum_excl_group,
        |  sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS sum_excl_ties,
        |  sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS sum_excl_current
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  (sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP))::bigint AS sum_excl_group,
        |  (sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES))::bigint AS sum_excl_ties,
        |  (sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW))::bigint AS sum_excl_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t) t2""".stripMargin),
    // min/max (non-invertible) under GROUPS EXCLUDE: entry-lowered
    // two-segment recompute, pinned against native EXCLUDE
    "win_sql_exclude_minmax" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS min_excl_group,
        |  min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS min_excl_ties,
        |  min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS min_excl_current,
        |  max(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS max_excl_group
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS min_excl_group,
        |  min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS min_excl_ties,
        |  min(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS min_excl_current,
        |  max(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS max_excl_group
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t) t2""".stripMargin),
    // collect-class under GROUPS EXCLUDE: entry-lowered segment concat;
    // canonical sorted-string rendering per the driver's array rule
    "win_sql_exclude_list" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  array_join(sort_array(collect_list(o_orderkey) OVER (PARTITION BY o_orderstatus
        |    ORDER BY bucket GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP)), ',')
        |    AS list_excl_group,
        |  array_join(sort_array(collect_list(o_orderkey) OVER (PARTITION BY o_orderstatus
        |    ORDER BY bucket GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)), ',')
        |    AS list_excl_current
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  array_to_string(list_sort(coalesce(list(o_orderkey) OVER (PARTITION BY o_orderstatus
        |    ORDER BY g RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP), [])), ',')
        |    AS list_excl_group,
        |  array_to_string(list_sort(coalesce(list(o_orderkey) OVER (PARTITION BY o_orderstatus
        |    ORDER BY g RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW), [])), ',')
        |    AS list_excl_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 30000)::bigint AS bucket
        |        FROM orders WHERE o_orderkey % 50 = 0) t) t2""".stripMargin),
    // EXCLUDE on a plain RANGE frame: the entry lowers it by
    // frame-minus-peer-group subtraction (exact for invertible
    // aggregates; the oracle runs the same frame's native EXCLUDE
    // directly over bucket — no dense_rank needed)
    "win_sql_exclude_range" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS sr_group,
        |  sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE TIES) AS sr_ties,
        |  sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS sr_current,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS cr_group,
        |  avg(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS ar_current
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  (sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE GROUP))::bigint AS sr_group,
        |  (sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE TIES))::bigint AS sr_ties,
        |  (sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW))::bigint AS sr_current,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS cr_group,
        |  avg(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS ar_current
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t""".stripMargin),

    // ---- r11: named windows + variance EXCLUDE + GROUPS in a CTE ----
    // Named-window definitions (`WINDOW w AS (...)`, reference grammar
    // SqlBase.g4 windowDefinition) carrying a GROUPS frame, including a
    // base-window refinement chain (`w AS (base GROUPS ...)`) and a
    // leading base reference inside an inline OVER. The engine inlines
    // the definitions before lowering; DuckDB lacks GROUPS frames, so
    // the oracle is the dense_rank lowering with native EXCLUDE.
    "win_sql_named_groups" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  count(*) OVER w AS rows_in_2_groups,
        |  sum(o_orderkey) OVER (base GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
        |    EXCLUDE GROUP) AS sum_excl_group
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t
        |WINDOW base AS (PARTITION BY o_orderstatus ORDER BY bucket),
        |  w AS (base GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW)""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS rows_in_2_groups,
        |  (sum(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP))::bigint AS sum_excl_group
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t) t2""".stripMargin),
    // variance family under EXCLUDE (r10 verdict #2): the two-segment
    // recompute generalized to accumulated moments (n, Σx, Σx²) — GROUPS
    // EXCLUDE GROUP/TIES and the RANGE frame-minus-peer subtraction.
    // The %50 filter keeps frames small so the naive-moment form stays
    // >7 decimal digits inside the round-2 grid vs DuckDB's exact pass.
    "win_sql_exclude_stddev" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  round(stddev(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP), 2) AS sd_excl_group,
        |  round(var_pop(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES), 2) AS vp_excl_ties,
        |  round(stddev(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW), 2) AS sd_range_excl_cur
        |FROM (SELECT o_orderkey, o_orderstatus, o_totalprice,
        |      cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  round(stddev(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP), 2) AS sd_excl_group,
        |  round(var_pop(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES), 2) AS vp_excl_ties,
        |  round(stddev(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW), 2) AS sd_range_excl_cur
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus, o_totalprice,
        |        floor(o_totalprice / 30000)::bigint AS bucket
        |        FROM orders WHERE o_orderkey % 50 = 0) t) t2""".stripMargin),
    // FILTER (WHERE ...) on a windowed aggregate under GROUPS/EXCLUDE
    // (r11; reference SqlBase.g4 filter rule): the clause folds into the
    // argument as CASE WHEN cond THEN arg END — exact because every
    // supported aggregate skips NULLs. DuckDB runs FILTER + its native
    // EXCLUDE over the dense_rank lowering.
    "win_sql_exclude_filter" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  sum(o_orderkey) FILTER (WHERE o_orderkey % 4 = 0) OVER (
        |    PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS sf_group,
        |  count(*) FILTER (WHERE o_orderkey % 4 = 0) OVER (
        |    PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS cf_ties
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  (sum(o_orderkey) FILTER (WHERE o_orderkey % 4 = 0) OVER (
        |    PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP))::bigint AS sf_group,
        |  count(*) FILTER (WHERE o_orderkey % 4 = 0) OVER (
        |    PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS cf_ties
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t) t2""".stripMargin),
    // GROUPS window inside a FROM-subquery (r11): parenthesized SELECT
    // bodies rewrite as their own blocks, innermost-first, with
    // g-columns unique across nesting levels.
    "win_sql_groups_subquery" -> (
      """SELECT o_orderkey, o_orderstatus, bucket, rows_in_2_groups
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    count(*) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |      GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS rows_in_2_groups
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t
        |) sub
        |WHERE o_orderkey % 10 = 0""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket, rows_in_2_groups
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    count(*) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS rows_in_2_groups
        |  FROM (
        |    SELECT o_orderkey, o_orderstatus, bucket,
        |      dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |    FROM (SELECT o_orderkey, o_orderstatus,
        |          floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t) t2
        |) sub
        |WHERE o_orderkey % 10 = 0""".stripMargin),
    // GROUPS window inside a CTE body (r10 verdict, Missing #1): the
    // rewrite now restructures each WITH definition independently, so
    // the dense_rank wrapper lands inside the defining block.
    "win_sql_groups_cte" -> (
      """WITH b AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders
        |), w AS (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    count(*) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |      GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS rows_in_2_groups
        |  FROM b
        |)
        |SELECT o_orderkey, o_orderstatus, bucket, rows_in_2_groups
        |FROM w WHERE o_orderkey % 10 = 0""".stripMargin,
      """WITH b AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    floor(o_totalprice / 100000)::bigint AS bucket FROM orders
        |), w AS (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    count(*) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS rows_in_2_groups
        |  FROM (SELECT *, dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |        FROM b) t2
        |)
        |SELECT o_orderkey, o_orderstatus, bucket, rows_in_2_groups
        |FROM w WHERE o_orderkey % 10 = 0""".stripMargin),

    // ---- r12: GROUPS over grouped queries, ROWS EXCLUDE GROUP/TIES,
    // DISTINCT + IGNORE NULLS under the lowering, pivot-centered moments.
    // Same oracle discipline: DuckDB native EXCLUDE (it has all modes on
    // all frame types) over the dense_rank lowering where the frame is
    // GROUPS, or over the verbatim text where it is ROWS.
    //
    // A window over a grouped query's output (r11 verdict, Missing #1):
    // the entry wraps the aggregation as an inner subquery (the reference
    // plans windows after aggregation in one scope, QueryPlanner.java),
    // extracting sum(o_orderkey) under an alias so the GROUPS window and
    // the select list share one aggregate. Aggregating o_orderkey keeps
    // every compared value integer-exact.
    "win_sql_groups_grouped" -> (
      """SELECT o_orderstatus, bucket, cast(sum(o_orderkey) AS bigint) AS total,
        |  count(*) OVER (ORDER BY bucket GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS cnt_2g,
        |  avg(sum(o_orderkey)) OVER (ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS avg_excl
        |FROM (SELECT o_orderstatus, o_orderkey,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t
        |GROUP BY o_orderstatus, bucket
        |HAVING count(*) > 2""".stripMargin,
      """SELECT o_orderstatus, bucket, total,
        |  count(*) OVER (ORDER BY g RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS cnt_2g,
        |  avg(total) OVER (ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS avg_excl
        |FROM (
        |  SELECT o_orderstatus, bucket, total,
        |    dense_rank() OVER (ORDER BY bucket) AS g
        |  FROM (SELECT o_orderstatus, bucket, sum(o_orderkey)::bigint AS total
        |        FROM (SELECT o_orderstatus, o_orderkey,
        |              floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t
        |        GROUP BY o_orderstatus, bucket HAVING count(*) > 2) t1) t2""".stripMargin),
    // Positional GROUP BY under the degroup pre-pass (r12 verdict,
    // Missing #2): same query as win_sql_groups_grouped with GROUP BY
    // 1, 2 — the pre-pass resolves each ordinal to its select item's
    // expression before extraction (the reference resolves ordinals
    // during analysis, StatementAnalyzer.java); a surviving ordinal
    // would silently regroup the rebuilt inner select list.
    "win_sql_groups_grouped_ordinal" -> (
      """SELECT o_orderstatus, bucket, cast(sum(o_orderkey) AS bigint) AS total,
        |  count(*) OVER (ORDER BY bucket GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS cnt_2g,
        |  avg(sum(o_orderkey)) OVER (ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS avg_excl
        |FROM (SELECT o_orderstatus, o_orderkey,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t
        |GROUP BY 1, 2
        |HAVING count(*) > 2""".stripMargin,
      """SELECT o_orderstatus, bucket, total,
        |  count(*) OVER (ORDER BY g RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS cnt_2g,
        |  avg(total) OVER (ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS avg_excl
        |FROM (
        |  SELECT o_orderstatus, bucket, total,
        |    dense_rank() OVER (ORDER BY bucket) AS g
        |  FROM (SELECT o_orderstatus, bucket, sum(o_orderkey)::bigint AS total
        |        FROM (SELECT o_orderstatus, o_orderkey,
        |              floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t
        |        GROUP BY 1, 2 HAVING count(*) > 2) t1) t2""".stripMargin),
    // Lowered windows in ORDER BY position (r12 verdict, Missing #1): a
    // GROUPS EXCLUDE window over a GROUPED query's output decides which
    // rows LIMIT keeps — the engine lifts the window into an inner select
    // list under a generated alias and orders by the alias (the reference
    // plans window functions anywhere in the select scope; Spark's Sort
    // rejects them outright). The window key depends only on bucket and
    // integer-exact sums, and the tie-break covers the full grouping key,
    // so the kept set is deterministic on both engines. DuckDB runs its
    // window directly in ORDER BY (native EXCLUDE over the dense_rank
    // lowering of the GROUPS frame).
    "win_sql_groups_orderby" -> (
      """SELECT o_orderstatus, bucket, cast(sum(o_orderkey) AS bigint) AS total
        |FROM (SELECT o_orderstatus, o_orderkey,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) t
        |GROUP BY o_orderstatus, bucket
        |ORDER BY avg(sum(o_orderkey)) OVER (ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) DESC NULLS LAST,
        |  o_orderstatus, bucket
        |LIMIT 7""".stripMargin,
      """SELECT o_orderstatus, bucket, total
        |FROM (
        |  SELECT o_orderstatus, bucket, total,
        |    dense_rank() OVER (ORDER BY bucket) AS g
        |  FROM (SELECT o_orderstatus, bucket, sum(o_orderkey)::bigint AS total
        |        FROM (SELECT o_orderstatus, o_orderkey,
        |              floor(o_totalprice / 100000)::bigint AS bucket FROM orders) t
        |        GROUP BY o_orderstatus, bucket) t1) t2
        |ORDER BY avg(total) OVER (ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) DESC NULLS LAST,
        |  o_orderstatus, bucket
        |LIMIT 7""".stripMargin),
    // PLAIN windows in ORDER BY position lift too (Spark rejects every
    // window expression in Sort, not just lowered ones). Integer-exact
    // window sums keep the ordering engine-identical; the tie-break is
    // the full key. DuckDB executes the same text natively.
    "win_sql_plain_orderby" -> (
      """SELECT o_orderkey, o_orderstatus
        |FROM orders WHERE o_orderkey % 20 = 0
        |ORDER BY sum(o_orderkey % 97) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) DESC,
        |  o_orderkey
        |LIMIT 10""".stripMargin,
      """SELECT o_orderkey, o_orderstatus
        |FROM orders WHERE o_orderkey % 20 = 0
        |ORDER BY sum(o_orderkey % 97) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) DESC,
        |  o_orderkey
        |LIMIT 10""".stripMargin),
    // Qualified star under the GROUPS/EXCLUDE lowering (r13 verdict,
    // Missing #2): the restructure wraps the FROM in a subquery, so the
    // engine preserves a single-relation FROM's alias on the wrapper and
    // re-projects `t.* EXCEPT (helpers)` — the user-visible schema is
    // exactly t's columns plus the window. EXCLUDE TIES here keeps the
    // current row and drops its bucket peers; the frame contains the
    // current row, so DuckDB's EXCLUDE agrees with the standard, and the
    // sum depends only on bucket values (tie-order-safe). Total ORDER BY
    // on the unique key keeps the dump order-deterministic end to end.
    "win_sql_qualified_star" -> (
      """SELECT t.*, cast(sum(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE TIES) AS bigint) AS s
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 10 = 0) t
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  (sum(bucket) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE TIES))::bigint AS s
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 100000)::bigint AS bucket
        |        FROM orders WHERE o_orderkey % 10 = 0) t) t2
        |ORDER BY o_orderkey""".stripMargin),
    // Windowed reference-parity moments (r14, extends r13 verdict #6):
    // skewness_ref/kurtosis_ref attach to plain ROWS frames natively
    // (DeclarativeAggregate over the central-moment buffer). The 5-row
    // ramp frames exercise n=1..5, so both n-guards, both live formulas,
    // and the constant-frame NaN (reference Java 0/0) all appear. v is a
    // small integer, so the oracle recomputes the moments from
    // INTEGER-EXACT window power sums (M2 = n·s2−s1², M3 = n²s3−3n·s1·s2
    // +2s1³, M4 = n³s4−4n²s1·s3+6n·s1²s2−3s1⁴; sk = M3/M2^1.5,
    // ku·(n−2)(n−3) terms fold the n's) — no catastrophic cancellation
    // at any frame, per the win_sql_stddev_pivot lesson.
    // Both spellings clamp |x| < 1e-10 to +0.0: a symmetric frame's true
    // sk is exactly 0, which the oracle certificate hits while Spark's
    // Welford leaves a ~1e-15 residual that renders as -0.0 after the
    // driver's rounding; the smallest possible NONZERO values are
    // ≥ 7.7e-7 (sk) / ~1.1e-9 (ku) for this integer fixture, so the
    // clamp cannot touch a live value. NULL/NaN pass through the CASE.
    "win_sql_moments_ref" -> (
      """SELECT o_orderkey, g,
        |  CASE WHEN abs(sk0) < 1e-10 THEN cast(0.0 AS double) ELSE sk0 END AS sk,
        |  CASE WHEN abs(ku0) < 1e-10 THEN cast(0.0 AS double) ELSE ku0 END AS ku
        |FROM (SELECT o_orderkey, g,
        |  skewness_ref(v) OVER (PARTITION BY g ORDER BY o_orderkey
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sk0,
        |  kurtosis_ref(v) OVER (PARTITION BY g ORDER BY o_orderkey
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ku0
        |FROM (SELECT o_orderkey, o_orderkey % 20 AS g,
        |      cast(o_orderkey % 23 AS double) AS v
        |      FROM orders WHERE o_orderkey % 7 = 0) t) z
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey, g,
        |  CASE WHEN abs(sk0) < 1e-10 THEN 0.0 ELSE sk0 END AS sk,
        |  CASE WHEN abs(ku0) < 1e-10 THEN 0.0 ELSE ku0 END AS ku
        |FROM (SELECT o_orderkey, g,
        |  CASE WHEN n >= 3 THEN
        |    CASE WHEN n*s2 - s1*s1 <= 0 THEN 'NaN'::DOUBLE
        |         ELSE (n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1)
        |              / pow(n*s2 - s1*s1, 1.5) END
        |  END AS sk0,
        |  CASE WHEN n >= 4 THEN
        |    CASE WHEN n*s2 - s1*s1 <= 0 THEN 'NaN'::DOUBLE
        |         ELSE (n-1)*(n+1)/((n-2)*(n-3))
        |              * (n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1)
        |              / ((n*s2 - s1*s1)*(n*s2 - s1*s1))
        |           - 3.0*(n-1)*(n-1)/((n-2)*(n-3)) END
        |  END AS ku0
        |FROM (SELECT o_orderkey, g,
        |      count(*) OVER w AS n,
        |      sum(v) OVER w AS s1, sum(v*v) OVER w AS s2,
        |      sum(v*v*v) OVER w AS s3, sum(v*v*v*v) OVER w AS s4
        |  FROM (SELECT o_orderkey, o_orderkey % 20 AS g, o_orderkey % 23 AS v
        |        FROM orders WHERE o_orderkey % 7 = 0) t
        |  WINDOW w AS (PARTITION BY g ORDER BY o_orderkey
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) m) z
        |ORDER BY o_orderkey""".stripMargin),
    // EXCLUDE GROUP/TIES on ROWS frames (r11 verdict, Missing #2): the
    // peer run is contiguous in the frame order, so subtraction against a
    // peer-clamped positional window is exact for invertible aggregates.
    // Every aggregated value is the ORDER key itself, so the result
    // MULTISET is tie-order-safe on both engines. Frames here all
    // CONTAIN the current row: on frames that don't, DuckDB diverges
    // from the standard's removal-only exclusion rule (it bridges the
    // frame across to the current position, pulling in non-peer rows —
    // measured on `2 FOLLOWING..5 FOLLOWING EXCLUDE GROUP/TIES`), so
    // that corner is pinned by the WindowFramesSpec row-level model
    // instead of an oracle row. DuckDB executes the same text natively
    // as the oracle.
    "win_sql_exclude_rows_group" -> (
      """SELECT o_orderstatus, bucket,
        |  cast(sum(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS bigint) AS sb_group,
        |  cast(sum(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES) AS bigint) AS sb_ties,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS cb_group,
        |  round(avg(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES), 6) AS ab_ties,
        |  round(stddev(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING EXCLUDE GROUP), 6) AS sd_group
        |FROM (SELECT o_orderstatus, cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderstatus, bucket,
        |  (sum(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP))::bigint AS sb_group,
        |  (sum(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES))::bigint AS sb_ties,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS cb_group,
        |  round(avg(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES), 6) AS ab_ties,
        |  round(stddev(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING EXCLUDE GROUP), 6) AS sd_group
        |FROM (SELECT o_orderstatus, floor(o_totalprice / 30000)::bigint AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin),
    // Non-invertible aggregates under ROWS EXCLUDE GROUP/TIES (r12): the
    // excluded peer run is a contiguous slice of the positional frame, so
    // the engine collects the frame's values and recombines from the
    // prefix + suffix around the peer extent — min/max/first/last/collect
    // all lower exactly (reference RowsFraming.java + frame exclusion
    // supports every aggregate under every mode). Every aggregated value
    // is the ORDER key itself, so each output is position-determined and
    // the MULTISET is tie-order-safe on both engines; frames all CONTAIN
    // the current row (DuckDB bridges on frames that don't). DuckDB
    // executes the same text natively as the oracle.
    "win_sql_exclude_rows_minmax" -> (
      """SELECT o_orderstatus, bucket,
        |  min(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS mn_group,
        |  max(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES) AS mx_ties,
        |  first_value(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS fv_group,
        |  last_value(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES) AS lv_ties
        |FROM (SELECT o_orderstatus, cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderstatus, bucket,
        |  min(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS mn_group,
        |  max(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES) AS mx_ties,
        |  first_value(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS fv_group,
        |  last_value(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES) AS lv_ties
        |FROM (SELECT o_orderstatus, floor(o_totalprice / 30000)::bigint AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin),
    // RANGE EXCLUDE for non-invertible aggregates (r12): value-based
    // frames make every output row-independent and value-deterministic
    // (ties ARE the peers). Same slice recombination, with the peer run
    // located by a [frame-lo, CURRENT ROW] count minus the peer size;
    // EXCLUDE CURRENT ROW re-inserts the other peers. DuckDB native.
    "win_sql_exclude_range_minmax" -> (
      """SELECT o_orderstatus, bucket,
        |  min(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS mn_group,
        |  max(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS mx_cur,
        |  first_value(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS fv_ties,
        |  last_value(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS lv_cur
        |FROM (SELECT o_orderstatus, cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderstatus, bucket,
        |  min(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS mn_group,
        |  max(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS mx_cur,
        |  first_value(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS fv_ties,
        |  last_value(bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS lv_cur
        |FROM (SELECT o_orderstatus, floor(o_totalprice / 30000)::bigint AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin),
    // Plain DISTINCT window aggregates (r12): no GROUPS/EXCLUDE at all —
    // Spark rejects aggregate DISTINCT in a window context outright, so
    // the entry folds the collected frame (frameless, partition-only and
    // running windows alike; the collect inherits the same implicit-frame
    // rules). The running column carries a unique tiebreaker so both
    // engines see the same frame at every row. DuckDB runs DISTINCT
    // windowed aggregates natively as the oracle.
    "win_sql_distinct_window" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  count(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus) AS cd_part,
        |  cast(sum(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus) AS bigint) AS sd_part,
        |  count(DISTINCT bucket % 7) OVER (PARTITION BY o_orderstatus
        |    ORDER BY bucket, o_orderkey) AS cd_run
        |FROM (SELECT o_orderkey, o_orderstatus,
        |        cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  count(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus) AS cd_part,
        |  (sum(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus))::bigint AS sd_part,
        |  count(DISTINCT bucket % 7) OVER (PARTITION BY o_orderstatus
        |    ORDER BY bucket, o_orderkey) AS cd_run
        |FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 30000)::bigint AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin),
    // DISTINCT aggregates under ROWS/RANGE EXCLUDE (r12): the kept-array
    // slice folds through array_distinct — every exclusion mode, incl.
    // CURRENT ROW. Arguments are bucket-derived (a ROWS frame's member
    // VALUES are position-determined under any tie order), frames all
    // contain the current row. DuckDB runs DISTINCT windowed aggregates
    // with native EXCLUDE as the oracle.
    "win_sql_exclude_rows_distinct" -> (
      """SELECT o_orderstatus, bucket,
        |  count(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS cd_group,
        |  count(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW) AS cd_cur,
        |  cast(sum(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES) AS bigint) AS sd_ties,
        |  count(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS cd_range
        |FROM (SELECT o_orderstatus, cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderstatus, bucket,
        |  count(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS cd_group,
        |  count(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW) AS cd_cur,
        |  (sum(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES))::bigint AS sd_ties,
        |  count(DISTINCT bucket % 5) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS cd_range
        |FROM (SELECT o_orderstatus, floor(o_totalprice / 30000)::bigint AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin),
    // DISTINCT aggregates under GROUPS frames (r11 verdict, Missing #3):
    // Spark rejects DISTINCT window aggregates outright, so the entry
    // lowers them through per-segment collect_list + array_distinct;
    // DuckDB runs DISTINCT windowed aggregates natively over the
    // dense_rank lowering with native EXCLUDE.
    "win_sql_exclude_distinct" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  count(DISTINCT ck) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS cd_plain,
        |  count(DISTINCT ck) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS cd_group,
        |  cast(sum(DISTINCT ck) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS bigint) AS sd_ties,
        |  coalesce(array_join(sort_array(array_agg(DISTINCT ck) OVER (
        |    PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)), ','), '') AS la_current
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 100000) AS bigint) AS bucket,
        |      o_custkey % 7 AS ck FROM orders WHERE o_orderkey % 20 = 0) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  count(DISTINCT ck) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS cd_plain,
        |  count(DISTINCT ck) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS cd_group,
        |  (sum(DISTINCT ck) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES))::bigint AS sd_ties,
        |  coalesce(array_to_string(list_sort(coalesce(list_distinct(list(ck) OVER (
        |    PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)), [])), ','), '') AS la_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket, ck,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 100000)::bigint AS bucket,
        |        o_custkey % 7 AS ck FROM orders WHERE o_orderkey % 20 = 0) t) t2""".stripMargin),
    // IGNORE NULLS on first_value/last_value under GROUPS frames
    // (r11 verdict, Missing #3): passthrough on the plain frame,
    // coalesce over per-segment ignore-null firsts/lasts under EXCLUDE,
    // count-guarded CASE for the RESPECT NULLS default. The argument is
    // group-CONSTANT (null for every third bucket), so the positional
    // functions are tie-order-safe.
    "win_sql_ignore_nulls" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  first_value(nv) IGNORE NULLS OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND CURRENT ROW) AS fp,
        |  first_value(nv) IGNORE NULLS OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS fg,
        |  last_value(nv) IGNORE NULLS OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS lt,
        |  first_value(nv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS fr
        |FROM (SELECT o_orderkey, o_orderstatus, bucket,
        |      CASE WHEN bucket % 3 = 0 THEN NULL ELSE bucket * 10 END AS nv
        |      FROM (SELECT o_orderkey, o_orderstatus,
        |            cast(floor(o_totalprice / 100000) AS bigint) AS bucket FROM orders) b) t
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  first_value(nv IGNORE NULLS) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS fp,
        |  first_value(nv IGNORE NULLS) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS fg,
        |  last_value(nv IGNORE NULLS) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS lt,
        |  first_value(nv) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS fr
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket, nv,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus, bucket,
        |        CASE WHEN bucket % 3 = 0 THEN NULL ELSE bucket * 10 END AS nv
        |        FROM (SELECT o_orderkey, o_orderstatus,
        |              floor(o_totalprice / 100000)::bigint AS bucket FROM orders) b) t) t2
        |ORDER BY o_orderkey""".stripMargin),
    // Pivot-centered moments (r11 advice #3): values ~1e8 with spread ~3
    // — the naive Σx² − (Σx)²/n recompute loses most significant digits
    // at this scale (ulp(1e16) = 2); centering on avg(x) over the
    // partition keeps the recompute exact to ~1e-13. Pinned against
    // DuckDB's native EXCLUDE via the INTEGER moment certificate
    // var·n·(n−1) = n·Σx² − (Σx)² (shift-invariant, so integer-valued
    // for integer x even at the 1e8 offset): rounding a rational
    // statistic to a fixed decimal grid can land exactly on a half
    // boundary where two correct engines disagree by an ulp, while the
    // certificate's true values sit ON integers — compared exactly, no
    // tolerance. Without the pivot the certificate is off by thousands.
    "win_sql_stddev_pivot" -> (
      """SELECT o_orderkey, bucket,
        |  cast(round(stddev(v) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |      GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)
        |    * stddev(v) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |      GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)
        |    * (count(v) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |      GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) - 1)
        |    * count(v) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |      GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)) AS bigint) AS m2n_g,
        |  cast(round(var_samp(v) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |      GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)
        |    * (count(v) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |      GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) - 1)
        |    * count(v) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |      GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)) AS bigint) AS m2n_t
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      cast(floor(o_totalprice / 30000) AS bigint) AS bucket,
        |      cast(100000000 + o_orderkey % 7 AS double) AS v
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderkey, bucket,
        |  round(stddev(v) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)
        |    * stddev(v) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)
        |    * (count(v) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) - 1)
        |    * count(v) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP))::bigint AS m2n_g,
        |  round(var_samp(v) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)
        |    * (count(v) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) - 1)
        |    * count(v) OVER (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES))::bigint AS m2n_t
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, bucket, v,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        floor(o_totalprice / 30000)::bigint AS bucket,
        |        (100000000 + o_orderkey % 7)::double AS v
        |        FROM orders WHERE o_orderkey % 50 = 0) t) t2""".stripMargin),

    // corr/covar/regr under EXCLUDE (r12): the co-moment recombination —
    // n, Σy, Σx, Σy², Σx², Σxy over pair-masked, pivot-centered values —
    // on all three lowering paths (GROUPS segment recompute, RANGE
    // frame-minus-peer, ROWS peer-clamped subtraction). A pair with a
    // NULL on either side is dropped entirely (xv is NULL on every 7th
    // key, so the mask is exercised). yv scales o_totalprice down three
    // decades so the round-grid slack dwarfs the accumulated double
    // error. DuckDB runs the corr family natively under its own EXCLUDE
    // over the dense_rank lowering (GROUPS) or the verbatim frame.
    "win_sql_exclude_corr" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  round(corr(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP), 4) + 0 AS corr_group,
        |  round(covar_samp(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES), 2) + 0 AS covs_ties,
        |  round(covar_pop(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW), 2) + 0 AS covp_current,
        |  round(regr_slope(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW), 6) + 0 AS sl_current,
        |  regr_count(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS rc_ties,
        |  round(regr_r2(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP), 6) + 0 AS r2_group
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      o_totalprice / 1000 AS yv,
        |      CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 997 END AS xv,
        |      cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  round(corr(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP), 4) + 0 AS corr_group,
        |  round(covar_samp(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES), 2) + 0 AS covs_ties,
        |  round(covar_pop(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW), 2) + 0 AS covp_current,
        |  round(regr_slope(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW), 6) + 0 AS sl_current,
        |  (regr_count(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES))::bigint AS rc_ties,
        |  round(regr_r2(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP), 6) + 0 AS r2_group
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, yv, xv, bucket,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderkey, o_orderstatus,
        |        o_totalprice / 1000 AS yv,
        |        CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 997 END AS xv,
        |        floor(o_totalprice / 30000)::bigint AS bucket
        |        FROM orders WHERE o_orderkey % 50 = 0) t) t2""".stripMargin),
    // the tie-heavy ROWS legs: every argument is a function of the ORDER
    // key (bucket), so each output is position-determined and the
    // MULTISET is tie-order-safe; frames all CONTAIN the current row
    // (DuckDB bridges on frames that don't). min(DISTINCT) pins the
    // DISTINCT-invariant normalization (the engine drops the keyword and
    // slice-recombines; DuckDB runs DISTINCT windows natively).
    "win_sql_exclude_rows_corr" -> (
      """SELECT o_orderstatus, bucket,
        |  round(corr(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP), 4) + 0 AS corr_group,
        |  round(regr_slope(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES), 6) + 0 AS sl_ties,
        |  regr_count(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS rc_group,
        |  round(covar_pop(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES), 6) + 0 AS cp_ties,
        |  min(DISTINCT bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS mnd_group
        |FROM (SELECT o_orderstatus, bucket,
        |      CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 17 END AS yv,
        |      (bucket * bucket) % 13 AS xv
        |      FROM (SELECT o_orderstatus,
        |            cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |            FROM orders WHERE o_orderkey % 50 = 0) b) t""".stripMargin,
      """SELECT o_orderstatus, bucket,
        |  round(corr(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP), 4) + 0 AS corr_group,
        |  round(regr_slope(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES), 6) + 0 AS sl_ties,
        |  (regr_count(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP))::bigint AS rc_group,
        |  round(covar_pop(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES), 6) + 0 AS cp_ties,
        |  min(DISTINCT bucket) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS mnd_group
        |FROM (SELECT o_orderstatus, bucket,
        |      CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 17 END AS yv,
        |      (bucket * bucket) % 13 AS xv
        |      FROM (SELECT o_orderstatus,
        |            floor(o_totalprice / 30000)::bigint AS bucket
        |            FROM orders WHERE o_orderkey % 50 = 0) b) t""".stripMargin),

    // skewness/kurtosis under EXCLUDE (r12): the same moment machinery
    // one and two orders higher (S3, S4 are plain sums over the segment
    // windows). Definitions are Spark's population g1/g2 — matching the
    // plain-frame passthrough and the batch `agg_stats` convention — so
    // DuckDB (whose natives are bias-corrected) recomputes the same
    // formulas from windowed moment sums under its native EXCLUDE, with
    // nullif giving the same NULL at n<=1 that the engine's
    // cancellation-scale zero test produces. yv is NULL on every 7th key
    // to exercise the non-null count discipline.
    "win_sql_exclude_skew" -> (
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  round(skewness(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP), 4) + 0 AS sk_group,
        |  round(kurtosis(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES), 4) + 0 AS kt_ties,
        |  round(skewness(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW), 4) + 0 AS sk_current
        |FROM (SELECT o_orderkey, o_orderstatus,
        |      CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice / 1000 END AS yv,
        |      cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice / 1000 END AS yv,
        |    floor(o_totalprice / 30000)::bigint AS bucket
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |cent AS (
        |  SELECT *, dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g,
        |    yv - avg(yv) OVER (PARTITION BY o_orderstatus) AS c
        |  FROM base),
        |w AS (
        |  SELECT o_orderkey, o_orderstatus, bucket,
        |    count(c) OVER wg AS ng, sum(c) OVER wg AS s1g,
        |    sum(c*c) OVER wg AS s2g, sum(c*c*c) OVER wg AS s3g,
        |    count(c) OVER wt AS nt, sum(c) OVER wt AS s1t, sum(c*c) OVER wt AS s2t,
        |    sum(c*c*c) OVER wt AS s3t, sum(c*c*c*c) OVER wt AS s4t,
        |    count(c) OVER wc AS nc, sum(c) OVER wc AS s1c,
        |    sum(c*c) OVER wc AS s2c, sum(c*c*c) OVER wc AS s3c
        |  FROM cent
        |  WINDOW
        |    wg AS (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP),
        |    wt AS (PARTITION BY o_orderstatus ORDER BY g
        |      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES),
        |    wc AS (PARTITION BY o_orderstatus ORDER BY bucket
        |      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW))
        |SELECT o_orderkey, o_orderstatus, bucket,
        |  round(sqrt(ng) * (s3g - 3*s1g*s2g/ng + 2*s1g*s1g*s1g/(ng*ng))
        |    / nullif(pow(s2g - s1g*s1g/ng, 1.5), 0), 4) + 0 AS sk_group,
        |  round(nt * (s4t - 4*s1t*s3t/nt + 6*s1t*s1t*s2t/(nt*nt)
        |      - 3*s1t*s1t*s1t*s1t/(nt*nt*nt))
        |    / nullif((s2t - s1t*s1t/nt) * (s2t - s1t*s1t/nt), 0) - 3, 4) + 0 AS kt_ties,
        |  round(sqrt(nc) * (s3c - 3*s1c*s2c/nc + 2*s1c*s1c*s1c/(nc*nc))
        |    / nullif(pow(s2c - s1c*s1c/nc, 1.5), 0), 4) + 0 AS sk_current
        |FROM w""".stripMargin),

    // stddev/variance DISTINCT windows (r12): Spark rejects DISTINCT
    // window aggregates outright; the engine folds n, Σc, Σc² from the
    // deduplicated kept array (centered on its first element) through
    // the shared moment formulas, on plain windows and under EXCLUDE
    // alike. DuckDB runs DISTINCT windowed stddev natively as the
    // oracle. ROWS-leg arguments are functions of the ORDER key so the
    // multiset stays tie-order-safe; stddev's sqrt keeps rounded values
    // off exact decimal boundaries (and the rational corner is
    // parity-impossible at the half-grid).
    "win_sql_distinct_stddev" -> (
      """SELECT o_orderstatus, bucket,
        |  round(stddev(DISTINCT yv) OVER (PARTITION BY o_orderstatus), 4) + 0 AS sd_part,
        |  round(stddev_pop(DISTINCT yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP), 4) + 0 AS sp_group,
        |  round(stddev(DISTINCT yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES), 4) + 0 AS sd_ties
        |FROM (SELECT o_orderstatus, bucket,
        |      CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 7 END AS yv
        |      FROM (SELECT o_orderstatus,
        |            cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |            FROM orders WHERE o_orderkey % 50 = 0) b) t""".stripMargin,
      """SELECT o_orderstatus, bucket,
        |  round(stddev(DISTINCT yv) OVER (PARTITION BY o_orderstatus), 4) + 0 AS sd_part,
        |  round(stddev_pop(DISTINCT yv) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP), 4) + 0 AS sp_group,
        |  round(stddev(DISTINCT yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES), 4) + 0 AS sd_ties
        |FROM (
        |  SELECT o_orderstatus, bucket, yv,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderstatus, bucket,
        |        CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 7 END AS yv
        |        FROM (SELECT o_orderstatus,
        |              floor(o_totalprice / 30000)::bigint AS bucket
        |              FROM orders WHERE o_orderkey % 50 = 0) b) t) t2""".stripMargin),
    // nth_value under EXCLUDE + IGNORE NULLS (r12): the engine indexes
    // the kept sequence (per-segment collects on GROUPS, the slice
    // recombination on ROWS/RANGE); every argument is a function of the
    // ORDER key, so intra-peer-group collection order — which the SQL
    // standard leaves unspecified — cannot change any output. DuckDB
    // spells IGNORE NULLS inside the call (`nth_value(x, 2 IGNORE
    // NULLS)`); the engine accepts the reference grammar's postfix form.
    "win_sql_exclude_nth" -> (
      """SELECT o_orderstatus, bucket,
        |  nth_value(yv, 2) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS n2_group,
        |  nth_value(yv, 3) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS n3_ties,
        |  nth_value(yv, 2) IGNORE NULLS OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS n2_group_in,
        |  nth_value(yv, 2) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS n2_rows,
        |  nth_value(yv, 2) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS n2_range
        |FROM (SELECT o_orderstatus, bucket,
        |      CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 17 END AS yv
        |      FROM (SELECT o_orderstatus,
        |            cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |            FROM orders WHERE o_orderkey % 50 = 0) b) t""".stripMargin,
      """SELECT o_orderstatus, bucket,
        |  nth_value(yv, 2) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS n2_group,
        |  nth_value(yv, 3) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS n3_ties,
        |  nth_value(yv, 2 IGNORE NULLS) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) AS n2_group_in,
        |  nth_value(yv, 2) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS n2_rows,
        |  nth_value(yv, 2) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS n2_range
        |FROM (
        |  SELECT o_orderstatus, bucket, yv,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderstatus, bucket,
        |        CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 17 END AS yv
        |        FROM (SELECT o_orderstatus,
        |              floor(o_totalprice / 30000)::bigint AS bucket
        |              FROM orders WHERE o_orderkey % 50 = 0) b) t) t2""".stripMargin),

    // Order statistics + the r12 stragglers under EXCLUDE: median and
    // percentile recombine as a linear-interpolated quantile of the kept
    // sequence (the rule Spark's percentile and DuckDB's median/
    // quantile_cont share), count_if delegates to the count lowering
    // over the predicate's true-mask, and bit_xor subtracts by XOR-ing
    // again (self-inverse). All arguments are functions of the ORDER
    // key, so positional frames stay tie-order-safe.
    "win_sql_exclude_orderstat" -> (
      """SELECT o_orderstatus, bucket,
        |  round(median(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP), 6) + 0 AS med_group,
        |  round(percentile(yv, 0.25) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES), 6) + 0 AS p25_ties,
        |  round(median(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW), 6) + 0 AS med_current,
        |  count_if(bucket % 3 = 0) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS ci_ties,
        |  count_if(bucket % 3 = 0) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP) AS ci_group,
        |  bit_xor(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS bx_group,
        |  bit_xor(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS bx_current
        |FROM (SELECT o_orderstatus, bucket,
        |      CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 17 END AS yv
        |      FROM (SELECT o_orderstatus,
        |            cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |            FROM orders WHERE o_orderkey % 50 = 0) b) t""".stripMargin,
      """SELECT o_orderstatus, bucket,
        |  round((median(yv) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP))::double, 6) + 0 AS med_group,
        |  round((quantile_cont(yv, 0.25) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE TIES))::double, 6) + 0 AS p25_ties,
        |  round((median(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW))::double, 6) + 0 AS med_current,
        |  (count(*) FILTER (WHERE bucket % 3 = 0) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES))::bigint AS ci_ties,
        |  (count(*) FILTER (WHERE bucket % 3 = 0) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP))::bigint AS ci_group,
        |  bit_xor(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS bx_group,
        |  bit_xor(yv) OVER (PARTITION BY o_orderstatus ORDER BY g
        |    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS bx_current
        |FROM (
        |  SELECT o_orderstatus, bucket, yv,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS g
        |  FROM (SELECT o_orderstatus, bucket,
        |        CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 17 END AS yv
        |        FROM (SELECT o_orderstatus,
        |              floor(o_totalprice / 30000)::bigint AS bucket
        |              FROM orders WHERE o_orderkey % 50 = 0) b) t) t2""".stripMargin),

    // PLAIN windows of the fragile families (r12): Spark's native corr
    // throws ANSI DIVIDE_BY_ZERO on degenerate frames (empty at the
    // partition head, single pair, zero variance) and its native
    // median/percentile reject any ORDER BY or frame outright — so the
    // engine lowers these even WITHOUT a GROUPS/EXCLUDE token, through
    // the same ANSI-safe moment / kept-array forms. The r2_headless leg
    // is the exact crash shape: a pure-preceding frame that is EMPTY for
    // the first rows of every partition.
    "win_sql_plain_fragile" -> (
      """SELECT o_orderstatus, bucket,
        |  round(corr(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket), 4)
        |    + 0 AS corr_run,
        |  round(median(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6) + 0 AS med_rows,
        |  round(percentile(yv, 0.75) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 6) + 0 AS p75_range,
        |  round(regr_r2(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING), 6) + 0 AS r2_headless
        |FROM (SELECT o_orderstatus, bucket,
        |      CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 17 END AS yv,
        |      (bucket * bucket) % 13 AS xv
        |      FROM (SELECT o_orderstatus,
        |            cast(floor(o_totalprice / 30000) AS bigint) AS bucket
        |            FROM orders WHERE o_orderkey % 50 = 0) b) t""".stripMargin,
      """SELECT o_orderstatus, bucket,
        |  round(corr(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket), 4)
        |    + 0 AS corr_run,
        |  round((median(yv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))::double, 6) + 0 AS med_rows,
        |  round((quantile_cont(yv, 0.75) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING))::double, 6) + 0 AS p75_range,
        |  round(regr_r2(yv, xv) OVER (PARTITION BY o_orderstatus ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING), 6) + 0 AS r2_headless
        |FROM (SELECT o_orderstatus, bucket,
        |      CASE WHEN bucket % 5 = 0 THEN NULL ELSE bucket % 17 END AS yv,
        |      (bucket * bucket) % 13 AS xv
        |      FROM (SELECT o_orderstatus,
        |            floor(o_totalprice / 30000)::bigint AS bucket
        |            FROM orders WHERE o_orderkey % 50 = 0) b) t""".stripMargin),

    // Degenerate BATCH corr (r12): Spark's native Corr throws ANSI
    // DIVIDE_BY_ZERO on a single pair or zero variance; the engine's
    // corr override (GraftExtensions) returns the reference's NULL.
    // DuckDB runs the same text natively as the oracle — the row exists
    // because it CRASHED before the override.
    "agg_corr_degenerate" -> (
      """SELECT
        |  round(corr(CASE WHEN o_orderkey = 350 THEN o_totalprice END,
        |             o_orderkey % 97), 4) + 0 AS single_pair,
        |  round(corr(o_totalprice, 0.0 * o_orderkey), 4) + 0 AS zero_var,
        |  round(corr(o_totalprice / 1000, o_orderkey % 97), 4) + 0 AS healthy,
        |  round(corr(CAST(NULL AS DOUBLE), o_orderkey), 4) + 0 AS all_null
        |FROM orders WHERE o_orderkey % 50 = 0""".stripMargin,
      """SELECT
        |  round(corr(CASE WHEN o_orderkey = 350 THEN o_totalprice END,
        |             o_orderkey % 97), 4) + 0 AS single_pair,
        |  round(corr(o_totalprice, 0.0 * o_orderkey), 4) + 0 AS zero_var,
        |  round(corr(o_totalprice / 1000, o_orderkey % 97), 4) + 0 AS healthy,
        |  round(corr(CAST(NULL AS DOUBLE), o_orderkey), 4) + 0 AS all_null
        |FROM orders WHERE o_orderkey % 50 = 0""".stripMargin),

    // FILTER on nth_value under the window lowering (r12 verdict,
    // Missing #3): the condition cannot fold into the argument (a
    // masked-to-NULL value would still hold a RESPECT NULLS position),
    // so it travels as a boolean field of the collected struct and masks
    // the kept sequence AFTER the exclusion slice. DuckDB has no FILTER
    // on non-aggregate window functions, so the oracle states the same
    // semantics explicitly: list_filter over its native EXCLUDE frame
    // collect, indexed 1-based. ORDER key unique → positions exact.
    "win_sql_nth_filter" -> (
      """SELECT o_orderkey,
        |  nth_value(val, 2) FILTER (WHERE val % 2 = 0) OVER (ORDER BY o_orderkey
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW) AS nf
        |FROM (SELECT o_orderkey, (o_orderkey * 7) % 19 AS val
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin,
      """SELECT o_orderkey,
        |  list_filter(list(val) OVER (ORDER BY o_orderkey
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW),
        |    x -> x % 2 = 0)[2] AS nf
        |FROM (SELECT o_orderkey, (o_orderkey * 7) % 19 AS val
        |      FROM orders WHERE o_orderkey % 50 = 0) t""".stripMargin),

    // corr FILTER / DISTINCT (r13, advice closure): the override is a
    // real AggregateFunction now (sql.graft.AnsiSafeCorr — Spark's own
    // co-moment buffer, guarded evaluation), so the forms only a true
    // aggregate can carry resolve again: FILTER (including a FILTER
    // that leaves a degenerate single-pair group → NULL, not an ANSI
    // throw), and DISTINCT pair dedup. DuckDB runs FILTER natively;
    // the DISTINCT leg's oracle dedups pairs in a subquery (same
    // multiset by construction).
    "agg_corr_filter" -> (
      """SELECT
        |  round(corr(o_totalprice, o_orderkey % 97)
        |    FILTER (WHERE o_orderkey % 3 = 0), 4) + 0 AS corr_filtered,
        |  round(corr(o_totalprice, o_orderkey % 97)
        |    FILTER (WHERE o_orderkey = 350), 4) + 0 AS corr_filter_degenerate,
        |  round(corr(DISTINCT cast(o_orderkey % 7 AS double),
        |             cast(o_orderkey % 5 AS double)), 4) + 0 AS corr_distinct
        |FROM orders WHERE o_orderkey % 50 = 0""".stripMargin,
      """SELECT
        |  round(corr(o_totalprice, o_orderkey % 97)
        |    FILTER (WHERE o_orderkey % 3 = 0), 4) + 0 AS corr_filtered,
        |  round(corr(o_totalprice, o_orderkey % 97)
        |    FILTER (WHERE o_orderkey = 350), 4) + 0 AS corr_filter_degenerate,
        |  (SELECT round(corr(a, b), 4) + 0 FROM
        |     (SELECT DISTINCT (o_orderkey % 7)::double AS a,
        |             (o_orderkey % 5)::double AS b
        |      FROM orders WHERE o_orderkey % 50 = 0) d) AS corr_distinct
        |FROM orders WHERE o_orderkey % 50 = 0""".stripMargin),

    // WITH RECURSIVE as input text through the engine SQL entry
    // (reference: SqlBase.g4:172 `WITH RECURSIVE?`, bounded expansion in
    // StatementAnalyzer/QueryPlanner). Spark 4 executes recursive CTEs
    // natively; what this row pins is the ENTRY — CteMaterialize must
    // recognize RECURSIVE and stand down (materializing a self-referencing
    // definition would sever the recursion), and the dialect rewrites must
    // pass the text through intact. The query is a linked-list walk: each
    // region's nations chained in key order via a lead() next-pointer,
    // the recursion following the chain while accumulating depth and a
    // name path — a genuinely iterative join no single window can express.
    "sql_recursive_cte" -> (
      """WITH RECURSIVE
        |step AS (
        |  SELECT n_regionkey AS rk, n_nationkey AS nk, n_name,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS nxt,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
        |  FROM nation),
        |walk(rk, nk, nxt, depth, path) AS (
        |  SELECT rk, nk, nxt, cast(1 AS bigint), cast(n_name AS string)
        |  FROM step WHERE rn = 1
        |  UNION ALL
        |  SELECT s.rk, s.nk, s.nxt, w.depth + 1, concat(w.path, '>', s.n_name)
        |  FROM walk w JOIN step s ON s.nk = w.nxt)
        |SELECT rk AS region_key, depth AS chain_len, path
        |FROM walk WHERE nxt IS NULL""".stripMargin,
      """WITH RECURSIVE
        |step AS (
        |  SELECT n_regionkey AS rk, n_nationkey AS nk, n_name,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS nxt,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rn
        |  FROM nation),
        |walk(rk, nk, nxt, depth, path) AS (
        |  SELECT rk, nk, nxt, 1::bigint, n_name::varchar
        |  FROM step WHERE rn = 1
        |  UNION ALL
        |  SELECT s.rk, s.nk, s.nxt, w.depth + 1, concat(w.path, '>', s.n_name)
        |  FROM walk w JOIN step s ON s.nk = w.nxt)
        |SELECT rk AS region_key, depth AS chain_len, path
        |FROM walk WHERE nxt IS NULL""".stripMargin),

    // broadcast spatial join (SpatialJoinOperator analog): tiny geometry
    // side replicated, containment as the join residual
    "geo_spatial_join" -> (
      """SELECT b.box_id, count(*) AS n_points,
        |round(avg(st_distance(p.x, p.y, b.xmin, b.ymin)), 6) AS avg_dist_to_corner
        |FROM (SELECT c_custkey, c_acctbal / 1000.0 AS x, c_nationkey + 0.5 AS y
        |      FROM customer) p
        |JOIN (VALUES (1, 0.0, 0.0, 5.0, 12.5), (2, 5.0, 0.0, 11.0, 12.5),
        |             (3, 0.0, 12.5, 5.0, 25.5), (4, 5.0, 12.5, 11.0, 25.5))
        |  AS b(box_id, xmin, ymin, xmax, ymax)
        |ON st_contains_box(b.xmin, b.ymin, b.xmax, b.ymax, p.x, p.y)
        |GROUP BY b.box_id""".stripMargin,
      """SELECT b.box_id, count(*) AS n_points,
        |round(avg(sqrt((p.x - b.xmin)*(p.x - b.xmin) + (p.y - b.ymin)*(p.y - b.ymin))), 6) AS avg_dist_to_corner
        |FROM (SELECT c_custkey, c_acctbal / 1000.0 AS x, c_nationkey + 0.5 AS y
        |      FROM customer) p
        |JOIN (VALUES (1, 0.0, 0.0, 5.0, 12.5), (2, 5.0, 0.0, 11.0, 12.5),
        |             (3, 0.0, 12.5, 5.0, 25.5), (4, 5.0, 12.5, 11.0, 25.5))
        |  AS b(box_id, xmin, ymin, xmax, ymax)
        |ON p.x >= b.xmin AND p.x <= b.xmax AND p.y >= b.ymin AND p.y <= b.ymax
        |GROUP BY b.box_id""".stripMargin),
    // WKT geometry pack: parse/write, point-in-polygon (with a hole),
    // polygon-polygon containment/intersection, area/centroid/envelope/
    // npoints/length/distance. Coordinates chosen so no point ever lies
    // on a ring boundary (half-integer points vs non-integer edges) —
    // boundary semantics differ between ray-casting implementations.
    "geo_wkt" -> (
      """SELECT n_nationkey,
        |st_contains(tri, pt) AS in_tri,
        |st_within(pt, holed) AS in_holed,
        |round(st_area(tri), 6) AS tri_area,
        |round(st_area(holed), 6) AS holed_area,
        |round(st_x(st_centroid(tri)), 6) AS cx,
        |st_astext(st_envelope(tri)) AS env,
        |st_npoints(holed) AS np,
        |st_contains('POLYGON ((-1 -1, 30 -1, 30 30, -1 30, -1 -1))', tri) AS poly_in_poly,
        |st_intersects(tri, holed) AS tri_meets_rect,
        |round(st_distance_wkt(pt, 'POINT (0 0)'), 6) AS d0,
        |round(st_length('LINESTRING (0 0, 3 4, 3 8)'), 6) AS llen,
        |st_astext(st_geometry_from_text('POINT (3 4)')) AS rt
        |FROM (SELECT n_nationkey,
        |  st_point(n_nationkey + 0.5, n_regionkey * 2 + 0.5) AS pt,
        |  'POLYGON ((0 0, 20.3 0, 0 20.3, 0 0))' AS tri,
        |  'POLYGON ((-0.1 -0.1, 24.6 -0.1, 24.6 9.7, -0.1 9.7, -0.1 -0.1), (10.2 2.1, 14.3 2.1, 14.3 6.2, 10.2 6.2, 10.2 2.1))' AS holed
        |  FROM nation)""".stripMargin,
      """SELECT n_nationkey,
        |(x > 0 AND y > 0 AND x + y < 20.3) AS in_tri,
        |(x > -0.1 AND x < 24.6 AND y > -0.1 AND y < 9.7
        | AND NOT (x > 10.2 AND x < 14.3 AND y > 2.1 AND y < 6.2)) AS in_holed,
        |round(20.3 * 20.3 / 2, 6) AS tri_area,
        |round((24.6 - (-0.1)) * (9.7 - (-0.1)) - (14.3 - 10.2) * (6.2 - 2.1), 6) AS holed_area,
        |round(20.3 / 3, 6) AS cx,
        |'POLYGON ((0 0, 20.3 0, 20.3 20.3, 0 20.3, 0 0))' AS env,
        |10::int AS np,
        |true AS poly_in_poly, true AS tri_meets_rect,
        |round(sqrt(x * x + y * y), 6) AS d0,
        |9.0::double AS llen,
        |'POINT (3 4)' AS rt
        |FROM (SELECT n_nationkey, n_nationkey + 0.5 AS x, n_regionkey * 2 + 0.5 AS y
        |      FROM nation) t""".stripMargin),
    // great-circle distance: the reference's exact semantics
    // (GeoFunctions.java:1511) — KILOMETERS via the Vincenty-form atan2
    // on the 6371.01 km sphere. Restated term-by-term in the oracle;
    // rounded to 0.1 m so last-ULP libm differences cannot flip a digit
    "geo_great_circle" -> (
      """SELECT n_nationkey,
        |round(great_circle_distance(cast(n_nationkey AS double),
        |  cast(n_regionkey * 10 AS double), 0.0d, 0.0d), 4) AS d_origin_km
        |FROM nation""".stripMargin,
      """SELECT n_nationkey,
        |round(atan2(sqrt(
        |    pow(cos(radians(0)) * sin(radians(n_regionkey * 10)), 2) +
        |    pow(cos(radians(n_nationkey)) * sin(radians(0))
        |        - sin(radians(n_nationkey)) * cos(radians(0)) * cos(radians(n_regionkey * 10)), 2)),
        |  sin(radians(n_nationkey)) * sin(radians(0))
        |    + cos(radians(n_nationkey)) * cos(radians(0)) * cos(radians(n_regionkey * 10)))
        |  * 6371.01, 4) AS d_origin_km
        |FROM nation""".stripMargin),
    // geo scalars: distance + ray-cast polygon containment (square,
    // off-boundary points, so the oracle states it as range checks)
    // constructive geometry (GeoConstructive: Greiner–Hormann clipping +
    // Minkowski buffer): rectangles built from nation coords cross
    // properly (two edge intersections, no shared vertices), so the
    // clipped areas have closed-form oracles
    "geo_constructive" -> (
      """SELECT n_nationkey,
        |round(st_area(st_intersection(ra, rb)), 6) AS inter_area,
        |round(st_area(st_union(ra, rb)), 6) AS union_area,
        |round(st_area(st_buffer(st_point(cast(n_nationkey AS double), cast(n_regionkey AS double)), 1.0)), 6) AS buf_area
        |FROM (
        |  SELECT n_nationkey, n_regionkey,
        |    concat('POLYGON ((0 0, ', xa, ' 0, ', xa, ' ', ya, ', 0 ', ya, ', 0 0))') AS ra,
        |    concat('POLYGON ((1 1, ', xa + 1, ' 1, ', xa + 1, ' ', ya + 1, ', 1 ', ya + 1, ', 1 1))') AS rb
        |  FROM (SELECT n_nationkey, n_regionkey,
        |        n_nationkey + 2 AS xa, n_regionkey + 2 AS ya FROM nation))""".stripMargin,
      """SELECT n_nationkey,
        |round(((n_nationkey + 1) * (n_regionkey + 1))::double, 6) AS inter_area,
        |round((2.0 * (n_nationkey + 2) * (n_regionkey + 2)
        |  - (n_nationkey + 1) * (n_regionkey + 1))::double, 6) AS union_area,
        |round(32 * sin(pi() / 32), 6) AS buf_area
        |FROM nation""".stripMargin),
    // Bing tile quadtree addressing (BingTileFunctions.java) — the tile
    // math is deterministic integer/Mercator arithmetic, restated in the
    // oracle directly
    "geo_bingtile" -> (
      """SELECT n_nationkey,
        |bing_tile_coordinates(t)[0] AS tx,
        |bing_tile_coordinates(t)[1] AS ty,
        |bing_tile_quadkey(t) AS qk,
        |bing_tile_zoom_level(t) AS z
        |FROM (SELECT n_nationkey,
        |      bing_tile_at(n_nationkey * 3.0 - 30, n_nationkey * 12.0 - 150, 8) AS t
        |      FROM nation)""".stripMargin,
      """WITH pts AS (SELECT n_nationkey,
        |  n_nationkey * 3.0 - 30 AS lat, n_nationkey * 12.0 - 150 AS lon FROM nation),
        |t AS (SELECT n_nationkey,
        |  cast(floor((lon + 180) / 360 * 256) AS int) AS tx,
        |  cast(floor((0.5 - ln((1 + sin(radians(lat))) / (1 - sin(radians(lat)))) / (4 * pi())) * 256) AS int) AS ty
        |  FROM pts)
        |SELECT n_nationkey, tx, ty,
        |  list_aggregate(list_transform(range(1, 9),
        |    i -> (((tx >> (8 - i)) & 1) + 2 * ((ty >> (8 - i)) & 1))::varchar),
        |    'string_agg', '') AS qk,
        |  8 AS z
        |FROM t""".stripMargin),
    "geo_scalars" -> (
      """SELECT n_nationkey,
        |round(st_distance(n_nationkey + 0.5, n_regionkey + 0.5, 0.0, 0.0), 6) AS d_origin,
        |st_contains_poly(array(0.0, 10.0, 10.0, 0.0), array(0.0, 0.0, 10.0, 10.0),
        |  n_nationkey + 0.5, n_regionkey + 0.5) AS in_square,
        |st_area_box(0.0, 0.0, cast(n_nationkey AS double), cast(n_regionkey AS double)) AS area
        |FROM nation""".stripMargin,
      """SELECT n_nationkey,
        |round(sqrt((n_nationkey + 0.5)*(n_nationkey + 0.5) + (n_regionkey + 0.5)*(n_regionkey + 0.5)), 6) AS d_origin,
        |(n_nationkey + 0.5 < 10 AND n_regionkey + 0.5 < 10) AS in_square,
        |(n_nationkey * n_regionkey)::double AS area
        |FROM nation""".stripMargin),
    // WKB IO (GeoFunctions.java:257 ST_AsBinary, :296 ST_GeomFromBinary):
    // round-trip through the binary form plus exact byte lengths (OGC WKB
    // layout: point = 1+4+16 = 21 bytes, 1-ring 5-pt polygon =
    // 1+4+4+4+5·16 = 93) and the
    // canonical little-endian hex of a fixed point, stated literally in
    // the oracle
    "geo_wkb" -> (
      """SELECT n_nationkey,
        |st_geomfrombinary(st_asbinary(poly)) AS rt_poly,
        |st_geomfrombinary(st_asbinary(pt)) AS rt_pt,
        |length(st_asbinary(pt)) AS pt_len,
        |length(st_asbinary(poly)) AS poly_len,
        |lower(hex(st_asbinary('POINT (1 2)'))) AS pt_hex
        |FROM (SELECT n_nationkey,
        |  concat('POLYGON ((0 0, ', k, ' 0, ', k, ' ', k, ', 0 ', k, ', 0 0))') AS poly,
        |  concat('POINT (', n_nationkey, ' ', n_regionkey, ')') AS pt
        |  FROM (SELECT n_nationkey, n_regionkey, n_nationkey + 1 AS k FROM nation))""".stripMargin,
      """SELECT n_nationkey,
        |'POLYGON ((0 0, ' || k || ' 0, ' || k || ' ' || k || ', 0 ' || k || ', 0 0))' AS rt_poly,
        |'POINT (' || n_nationkey || ' ' || n_regionkey || ')' AS rt_pt,
        |21 AS pt_len, 93 AS poly_len,
        |'0101000000000000000000f03f0000000000000040' AS pt_hex
        |FROM (SELECT n_nationkey, n_regionkey, n_nationkey + 1 AS k FROM nation)""".stripMargin),
    // convex hull (GeoFunctions.java:472) + simplify + accessor family:
    // the hull of {corners of a k-square} ∪ {2 interior points} is the
    // square itself, emitted CCW from the min-(x,y) vertex by the
    // monotone-chain construction, so the full WKT is predictable
    "geo_convexhull" -> (
      """SELECT n_nationkey,
        |st_astext(ch) AS hull_wkt,
        |round(st_area(ch), 6) AS hull_area,
        |st_npoints(ch) AS np,
        |st_exterior_ring(ch) AS xr,
        |st_xmax(ch) AS xmax, st_ymin(ch) AS ymin,
        |st_geometry_type(ch) AS gtype,
        |st_simplify('LINESTRING (0 0, 1 0.01, 2 -0.01, 3 0.02, 4 0, 4 5)', 0.1) AS simp
        |FROM (SELECT n_nationkey,
        |  st_convex_hull(concat('MULTIPOINT (0 0, ', k, ' 0, 0 ', k, ', ', k, ' ', k, ', 1 1, 2 1)')) AS ch
        |  FROM (SELECT n_nationkey, n_nationkey + 3 AS k FROM nation))""".stripMargin,
      """SELECT n_nationkey,
        |'POLYGON ((0 0, ' || k || ' 0, ' || k || ' ' || k || ', 0 ' || k || ', 0 0))' AS hull_wkt,
        |round((k * k)::double, 6) AS hull_area,
        |5 AS np,
        |'LINESTRING (0 0, ' || k || ' 0, ' || k || ' ' || k || ', 0 ' || k || ', 0 0)' AS xr,
        |k::double AS xmax, 0.0::double AS ymin,
        |'ST_Polygon' AS gtype,
        |'LINESTRING (0 0, 4 0, 4 5)' AS simp
        |FROM (SELECT n_nationkey, n_nationkey + 3 AS k FROM nation)""".stripMargin),
    // aggregate completion pack (org.apache.spark.sql.graft.MapAggs):
    // the reference's own SQL names — histogram / map_agg / multimap_agg
    // (generic TypedImperativeAggregates), numeric_histogram (Ben-Haim &
    // Tom-Tov, exact when distinct <= buckets as here), geometric_mean.
    // Nation names are unique per region so every map is deterministic;
    // multimap values are sorted to erase arrival order. Map/array results
    // are rendered to canonical 'k:v,k:v' strings so the driver harness
    // (pandas sort) can compare them — same rule as the reference's own
    // golden-file tests, which render rows to text
    "agg_trino_names" -> (
      """SELECT n_regionkey,
        |array_join(transform(array_sort(map_entries(histogram(n_name))),
        |  e -> concat(e.key, ':', cast(e.value AS string))), ',') AS hist,
        |array_join(transform(array_sort(map_entries(map_agg(n_nationkey, n_name))),
        |  e -> concat(cast(e.key AS string), ':', e.value)), ',') AS kv,
        |array_join(transform(map_entries(transform_values(multimap_agg(0, n_name), (k, v) -> array_sort(v))),
        |  e -> concat(cast(e.key AS string), ':', array_join(e.value, '|'))), ',') AS mm,
        |array_join(transform(array_sort(map_entries(numeric_histogram(30, cast(n_nationkey AS double) + 0.5))),
        |  e -> concat(cast(e.key AS string), ':', cast(e.value AS string))), ',') AS nh,
        |round(geometric_mean(cast(n_nationkey AS double) + 1.0), 6) AS gm
        |FROM nation
        |GROUP BY n_regionkey""".stripMargin,
      """SELECT n_regionkey,
        |string_agg(n_name || ':1', ',' ORDER BY n_name) AS hist,
        |string_agg(n_nationkey || ':' || n_name, ',' ORDER BY n_nationkey) AS kv,
        |'0:' || string_agg(n_name, '|' ORDER BY n_name) AS mm,
        |string_agg((n_nationkey + 0.5)::double || ':' || 1.0::double, ',' ORDER BY n_nationkey) AS nh,
        |round(exp(avg(ln(n_nationkey + 1.0))), 6) AS gm
        |FROM nation
        |GROUP BY n_regionkey""".stripMargin),
    // core-scalar completion pack (TrinoCompat2): lambda matchers,
    // logical/arithmetic shifts, IEEE-754 byte images, ISO date parts,
    // nanos timestamps, unix-time doubles, multimap_from_entries —
    // every answer a closed form (2024-03-04 is a Monday; session zone
    // is UTC so epoch arithmetic is exact)
    "fn_trino_compat2" -> (
      """SELECT n_nationkey,
        |all_match(array(2, n_nationkey * 2, 6), x -> x % 2 = 0) AS am,
        |any_match(array(1, 3, n_nationkey * 2 + 1, 4), x -> x % 2 = 0) AS anym,
        |none_match(array(1, 3, 5), x -> x % 2 = 0) AS nonem,
        |bitwise_left_shift(cast(5 AS bigint), 2) AS bls,
        |bitwise_right_shift(cast(-8 AS bigint), 1) AS brs,
        |bitwise_right_shift_arithmetic(cast(-8 AS bigint), 1) AS brsa,
        |codepoint('€') AS cp,
        |lower(hex(to_ieee754_64(1.5d))) AS ieee_hex,
        |from_ieee754_64(to_ieee754_64(cast(n_nationkey AS double) + 0.25)) AS ieee_rt,
        |lower(hex(to_ieee754_32(cast(1.5 AS float)))) AS ieee32_hex,
        |combine_hash(cast(n_nationkey AS bigint), 5) AS ch,
        |is_nan(nan()) AS isn,
        |truncate(-2.7d) AS trunc_neg, truncate(2.7d) AS trunc_pos,
        |day_of_week(date_add(DATE '2024-03-04', n_nationkey)) AS dow,
        |day_of_year(date_add(DATE '2024-03-04', n_nationkey)) AS doy,
        |week(date_add(DATE '2024-03-04', n_nationkey * 7)) AS wk,
        |year_of_week(DATE '2021-01-01') AS yow,
        |last_day_of_month(DATE '2024-02-05') AS ldom,
        |millisecond(TIMESTAMP '2024-01-01 00:00:00.123') AS ms,
        |from_iso8601_date('2024-03-05') AS fid,
        |cast(from_unixtime_nanos(1500000000123456789) AS string) AS funn,
        |to_unixtime(TIMESTAMP '2024-01-01 00:00:00') AS tux,
        |timezone_hour(TIMESTAMP '2024-01-01 00:00:00') AS tzh,
        |array_join(map_keys(multimap_from_entries(array(struct('a', 'x'), struct('b', 'y'), struct('a', 'z')))), ',') AS mm_keys,
        |array_join(transform(map_values(multimap_from_entries(array(struct('a', 'x'), struct('b', 'y'), struct('a', 'z')))), v -> array_join(v, '|')), ',') AS mm_vals
        |FROM nation""".stripMargin,
      """SELECT n_nationkey,
        |true AS am,
        |true AS anym,
        |true AS nonem,
        |20::bigint AS bls,
        |9223372036854775804::bigint AS brs,
        |(-4)::bigint AS brsa,
        |8364 AS cp,
        |'3ff8000000000000' AS ieee_hex,
        |n_nationkey + 0.25 AS ieee_rt,
        |'3fc00000' AS ieee32_hex,
        |n_nationkey::bigint * 31 + 5 AS ch,
        |true AS isn,
        |(-2.0)::double AS trunc_neg, 2.0::double AS trunc_pos,
        |(n_nationkey % 7) + 1 AS dow,
        |64 + n_nationkey AS doy,
        |10 + n_nationkey AS wk,
        |2020 AS yow,
        |DATE '2024-02-29' AS ldom,
        |123 AS ms,
        |DATE '2024-03-05' AS fid,
        |'2017-07-14 02:40:00.123456' AS funn,
        |1704067200.0::double AS tux,
        |0 AS tzh,
        |'a,b' AS mm_keys,
        |'x|z,y' AS mm_vals
        |FROM nation""".stripMargin),
    // remaining UDF-pack scalars (word_stem, hamming, levenshtein ratio,
    // data-size parse, human-readable durations, MySQL date_parse, format)
    "fn_misc" -> (
      """SELECT word_stem('running') AS st1, word_stem('tables') AS st2,
        |word_stem('quickly') AS st3,
        |hamming_distance('karolin', 'kathrin') AS ham,
        |round(levenshtein_distance_ratio('kitten', 'sitting'), 6) AS lev_ratio,
        |hamming_distance64(255, 0) AS ham64,
        |parse_data_size('2.3MB') AS dsize,
        |human_readable_seconds(93784.0) AS hsecs,
        |date_parse('2024-03-05 07:08:09', '%Y-%m-%d %H:%i:%s') AS dparsed,
        |format_string('%s scored %.2f', 'alice', cast(12.345 AS double)) AS fmt,
        |format_number(1234567.891, 2) AS fnum""".stripMargin,
      """SELECT 'runn' AS st1, 'table' AS st2, 'quick' AS st3,
        |3::bigint AS ham, round(3.0/7.0, 6) AS lev_ratio, 8::int AS ham64,
        |2411724::bigint AS dsize,
        |'1 day, 2 hours, 3 minutes, 4 seconds' AS hsecs,
        |TIMESTAMP '2024-03-05 07:08:09' AS dparsed,
        |'alice scored 12.35' AS fmt,
        |'1,234,567.89' AS fnum""".stripMargin),
    // map_agg analog (MapAggregationFunction): key→value assembly per
    // group, rendered as a canonical string for engine-neutral comparison
    "agg_map_agg" -> (
      """SELECT n_regionkey,
        |array_join(transform(sort_array(collect_list(struct(n_nationkey, n_name))),
        |  e -> concat(e.n_nationkey, ':', e.n_name)), ',') AS kv_csv
        |FROM nation GROUP BY n_regionkey""".stripMargin,
      """SELECT n_regionkey,
        |string_agg(n_nationkey || ':' || n_name, ',' ORDER BY n_nationkey) AS kv_csv
        |FROM nation GROUP BY n_regionkey""".stripMargin))

  val queries: Map[String, Q] = defs.map { case (k, (sparkSql, _)) => k -> q(sparkSql) } ++ Map[String, Q](
    // session-statement surface (SqlBase.g4:153-157): PREPARE registers
    // the parameterized text, EXECUTE binds positional ? params and runs
    // through the full dialect path — the oracle states the bound query
    "stmt_prepare_execute" -> ((s, dir) => {
      Tables.sql(s, dir,
        "PREPARE q_nat FROM SELECT n_name, n_nationkey FROM nation " +
          "WHERE n_nationkey < ? AND n_name LIKE ? ORDER BY n_nationkey")
      Tables.sql(s, dir, "EXECUTE q_nat USING 10, 'NATION%'")
    }),
    // EXECUTE ... USING with parameters binding in predicate, aggregate
    // AND projected positions (r14 verdict #8: the surface passed in
    // StatementsSpec but had no dedicated driver row) — three markers of
    // distinct types bound in one statement
    "stmt_execute_using" -> ((s, dir) => {
      Tables.sql(s, dir,
        "PREPARE q_eu FROM SELECT c_mktsegment, count(*) AS n, " +
          "max(c_acctbal + ?) AS maxbal FROM customer " +
          "WHERE c_custkey % ? = 0 AND c_mktsegment <> ? GROUP BY c_mktsegment")
      Tables.sql(s, dir, "EXECUTE q_eu USING 100, 7, 'AUTOMOBILE'")
    }),
    // DESCRIBE INPUT (SqlBase.g4:156): positional parameter types inferred
    // from the columns adjacent to each ? marker
    "stmt_describe_input" -> ((s, dir) => {
      Tables.sql(s, dir,
        "PREPARE q_di FROM SELECT n_name FROM nation " +
          "WHERE n_nationkey < ? AND n_name LIKE ?")
      Tables.sql(s, dir, "DESCRIBE INPUT q_di")
    }),
    // START TRANSACTION / COMMIT / ROLLBACK: acknowledged no-ops over the
    // parquet catalog (statements are individually atomic via staged file
    // swaps, like the reference's auto-commit connectors)
    "stmt_transaction" -> ((s, dir) => {
      Tables.sql(s, dir, "START TRANSACTION")
      val inTxn = Tables.sql(s, dir, "SELECT count(*) AS n FROM nation")
      Tables.sql(s, dir, "COMMIT")
      inTxn
    }),
    // EXPLAIN ANALYZE (reference ExplainAnalyzeOperator.java:34): executes
    // the statement and reports one row per physical operator with its
    // runtime metrics. The driver row projects the deterministic columns
    // (operator sequence + numOutputRows); the timing/size metrics column
    // is exercised in StatementsSpec
    "stmt_explain_analyze" -> ((s, dir) => {
      Tables.sql(s, dir,
        "EXPLAIN ANALYZE SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
        .select("step", "operator", "output_rows")
    }),
    // SHOW COLUMNS (Trino shape: Column/Type/Extra/Comment) and
    // SHOW STATS FOR (ShowStatsRewrite shape: per-column ndv / nulls
    // fraction / low / high + a summary row_count row) — stats computed
    // exactly in one aggregate pass, so the oracle recomputes them
    "stmt_show_columns" -> ((s, dir) =>
      Tables.sql(s, dir, "SHOW COLUMNS FROM nation")),
    "stmt_show_stats" -> ((s, dir) =>
      Tables.sql(s, dir, "SHOW STATS FOR region")),
    // r6: SHOW SCHEMAS / TABLES / FUNCTIONS as driver rows over their
    // catalog-STABLE slices — the unfiltered listings vary with session
    // history (managed tables other rows create) and Spark's builtin
    // inventory, so the rows pin the fixture tables and graft-registered
    // functions, which are constants of the engine
    "stmt_show_schemas" -> ((s, dir) =>
      Tables.sql(s, dir, "SHOW SCHEMAS")),
    "stmt_show_tables" -> ((s, dir) =>
      Tables.sql(s, dir, "SHOW TABLES LIKE '%ion'")),
    "stmt_show_functions" -> ((s, dir) =>
      Tables.sql(s, dir, "SHOW FUNCTIONS")
        .filter(org.apache.spark.sql.functions.col("Function").isin(
          "make_set_digest", "merge_tdigest", "tdigest_agg", "sorted_dot",
          "sorted_intersect_count", "simhash64_native", "hamming_distance64",
          "cosine_sim_native", "merge_hll"))),
    // CREATE TABLE AS / INSERT INTO over the managed parquet store
    // (SqlBase.g4 createTableAsSelect / insertInto): CTAS materializes a
    // query, INSERT appends through a staged swap, and the read-back is
    // what the oracle reproduces
    "stmt_ctas_insert" -> ((s, dir) => {
      Tables.sql(s, dir,
        "CREATE TABLE ctas_rt AS SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
      Tables.sql(s, dir,
        "INSERT INTO ctas_rt SELECT 99 AS n_regionkey, 0 AS n")
      Tables.sql(s, dir, "SELECT n_regionkey, n FROM ctas_rt")
    }),
    // the full SQL DML statement surface end-to-end: CTAS a managed copy,
    // DELETE / UPDATE / MERGE by their SQL spellings (lowered onto the
    // partition-pruned copy-on-write engine), read the final state back
    "stmt_sql_dml" -> ((s, dir) => {
      Tables.sql(s, dir,
        "CREATE TABLE sqldml AS SELECT n_nationkey, n_name, n_regionkey FROM nation")
      Tables.sql(s, dir, "DELETE FROM sqldml WHERE n_regionkey = 4")
      Tables.sql(s, dir,
        "UPDATE sqldml SET n_name = concat(n_name, '_u') WHERE n_regionkey = 0")
      Tables.sql(s, dir,
        "MERGE INTO sqldml USING (SELECT 1 AS k, 'ONE' AS v UNION ALL SELECT 55, 'NEW') s " +
          "ON n_nationkey = s.k " +
          "WHEN MATCHED THEN UPDATE SET n_name = s.v " +
          "WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey) VALUES (s.k, s.v, 9)")
      Tables.sql(s, dir,
        "SELECT n_nationkey, n_name, cast(n_regionkey AS int) AS n_regionkey FROM sqldml")
    }))

  val oracles: Map[String, String] = defs.map { case (k, (_, duck)) => k -> duck } ++ Map(
    "stmt_prepare_execute" ->
      """SELECT n_name, n_nationkey FROM nation
        |WHERE n_nationkey < 10 AND n_name LIKE 'NATION%'
        |ORDER BY n_nationkey""".stripMargin,
    "stmt_execute_using" ->
      """SELECT c_mktsegment, count(*) AS n, max(c_acctbal + 100) AS maxbal
        |FROM customer WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'AUTOMOBILE'
        |GROUP BY c_mktsegment""".stripMargin,
    "stmt_describe_input" ->
      "SELECT * FROM (VALUES (0, 'int'), (1, 'string')) AS t(position, type)",
    "stmt_transaction" ->
      "SELECT count(*) AS n FROM nation",
    // the physical plan of a single-key parquet group-by at local[32]
    // under AQE with partition coalescing disabled (SessionDefaults, r7):
    // final agg directly over the shuffle of the partial agg over the
    // columnar scan — row counts are exact, not sampled
    "stmt_explain_analyze" ->
      """SELECT * FROM (VALUES
        |  (0, 'HashAggregate', 5::bigint),
        |  (1, 'Exchange', NULL::bigint),
        |  (2, 'HashAggregate', 5::bigint),
        |  (3, 'ColumnarToRow', 25::bigint),
        |  (4, 'Scan', 25::bigint)) AS t(step, operator, output_rows)""".stripMargin,
    "stmt_show_columns" ->
      """SELECT * FROM (VALUES
        |  ('n_nationkey', 'int', '', ''),
        |  ('n_name', 'string', '', ''),
        |  ('n_regionkey', 'int', '', '')) AS t("Column", "Type", "Extra", "Comment")""".stripMargin,
    "stmt_show_schemas" ->
      """SELECT * FROM (VALUES ('default'), ('information_schema')) AS t("Schema")""",
    "stmt_show_tables" ->
      """SELECT * FROM (VALUES ('nation'), ('region')) AS t("Table")""",
    "stmt_show_functions" ->
      """SELECT * FROM (VALUES ('cosine_sim_native'), ('hamming_distance64'),
        |  ('make_set_digest'), ('merge_hll'), ('merge_tdigest'),
        |  ('simhash64_native'), ('sorted_dot'), ('sorted_intersect_count'),
        |  ('tdigest_agg')) AS t("Function")""".stripMargin,
    "stmt_show_stats" ->
      """SELECT 'r_regionkey' AS column_name,
        |  count(DISTINCT r_regionkey)::bigint AS distinct_values_count,
        |  avg(CASE WHEN r_regionkey IS NULL THEN 1.0 ELSE 0.0 END)::double AS nulls_fraction,
        |  NULL::bigint AS row_count,
        |  min(r_regionkey)::varchar AS low_value, max(r_regionkey)::varchar AS high_value
        |FROM region
        |UNION ALL
        |SELECT 'r_name', count(DISTINCT r_name)::bigint,
        |  avg(CASE WHEN r_name IS NULL THEN 1.0 ELSE 0.0 END)::double,
        |  NULL::bigint, min(r_name), max(r_name) FROM region
        |UNION ALL
        |SELECT NULL, NULL::bigint, NULL::double, count(*)::bigint, NULL, NULL
        |FROM region""".stripMargin,
    "stmt_ctas_insert" ->
      """SELECT n_regionkey, count(*)::bigint AS n FROM nation GROUP BY n_regionkey
        |UNION ALL SELECT 99, 0::bigint""".stripMargin,
    "stmt_sql_dml" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey = 1 THEN 'ONE'
        |       WHEN n_regionkey = 0 THEN n_name || '_u'
        |       ELSE n_name END AS n_name,
        |  n_regionkey
        |FROM nation WHERE n_regionkey <> 4
        |UNION ALL SELECT 55, 'NEW', 9""".stripMargin)
}
