package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** TPC-H workload, adapted to the driver fixtures (FIXTURES.md §A: doubles
  * not decimals, timestamps not dates, several columns/tables dropped).
  * This is the reference's own conformance+benchmark workload
  * (`plugin/trino-tpch/.../TpchMetadata.java:93`,
  * `testing/trino-benchto-benchmarks/.../tpch.yaml`).
  *
  * All plans are declarative DataFrame compositions: Catalyst handles
  * predicate pushdown to the parquet scan, column pruning, join reordering
  * and broadcast selection (nation/region/supplier are broadcast-size at
  * any SF; AQE picks that up from runtime stats — we add explicit
  * `broadcast()` hints only where the dimension is guaranteed tiny).
  */
object TpchQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The fixture drops `partsupp` (FIXTURES.md §A), so the five queries
    * that need it (q2/q9/q11/q16/q20) run against a pseudo-partsupp
    * derived from lineitem: supply cost = min observed unit price,
    * availability = 10× observed line count. Grouping on (partkey,
    * suppkey) is one shuffle; at scale this is the same partial-agg
    * pattern as any fact rollup, and the oracle derives it identically.
    */
  private val psCte =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice / l_quantity) AS ps_supplycost,
      |         count(*) * 10 AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** SQL-entry queries: the seven partsupp/decorrelation-heavy TPC-H
    * members are expressed as SQL text so the engine's SQL surface —
    * and Catalyst's subquery decorrelation (q2's correlated min, q20's
    * nested IN + correlated scalar, q21's EXISTS/NOT EXISTS pair) — is
    * what gets exercised, exactly how the reference runs them
    * (`testing/trino-benchto-benchmarks/.../tpch.yaml:8-39`).
    */
  private val sqlDefs: Map[String, (String, String)] = {
    // Spark and DuckDB accept the same ANSI spelling for all seven;
    // only the interval literal differs (quoted unit count in Spark).
    def both(sql: String): (String, String) =
      (sql.replace("INTERVAL_30D", "INTERVAL '30' DAY").replace("INTERVAL_60D", "INTERVAL '60' DAY"),
       sql.replace("INTERVAL_30D", "INTERVAL 30 DAY").replace("INTERVAL_60D", "INTERVAL 60 DAY"))
    Map(
      // Q2: min-cost supplier per part in a region — correlated scalar
      // subquery against min() (the classic decorrelation stress test)
      "tpch_q2" -> both(psCte +
        """
          |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
          |FROM part, supplier, ps, nation, region
          |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          |  AND p_size <= 15 AND p_type = 'LARGE'
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
          |  AND ps_supplycost = (
          |    SELECT min(ps2.ps_supplycost) FROM ps ps2, supplier s2, nation n2, region r2
          |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
          |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          |      AND r2.r_name = 'EUROPE')
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin),
      // Q9: product-type profit by nation and year (6-way join). Spark
      // spelling computes the pseudo-partsupp cost as a window min over
      // (partkey, suppkey) — ONE lineitem scan and one hash exchange,
      // where the ps-CTE self-join form scans the fact table twice (the
      // oracle keeps the equivalent CTE form: every row joins to its own
      // group's min ≡ the window min).
      "tpch_q9" -> (
        """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit FROM (
          |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
          |    l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
          |  FROM (SELECT l_suppkey, l_orderkey, l_quantity, l_extendedprice, l_discount,
          |          min(l_extendedprice / l_quantity)
          |            OVER (PARTITION BY l_partkey, l_suppkey) AS ps_supplycost
          |        FROM lineitem
          |        WHERE l_partkey IN (SELECT p_partkey FROM part
          |                            WHERE p_name LIKE '%widget%')) l,
          |       supplier, orders, nation
          |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          |    AND s_nationkey = n_nationkey) profit
          |GROUP BY nation, o_year""".stripMargin,
        psCte +
        """
          |SELECT nation, o_year, round(sum(amount), 2) AS sum_profit FROM (
          |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
          |    l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
          |  FROM part, supplier, lineitem, ps, orders, nation
          |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
          |    AND p_partkey = l_partkey AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          |    AND p_name LIKE '%widget%') profit
          |GROUP BY nation, o_year""".stripMargin),
      // Q11: important stock — HAVING against a scalar subquery over the
      // same aggregated CTE (region-scoped: nation-level filters can go
      // empty at sf0.001 with only 10 suppliers)
      "tpch_q11" -> both(psCte +
        """,
          |val AS (
          |  SELECT ps_partkey, sum(ps_supplycost * ps_availqty) AS value
          |  FROM ps, supplier, nation, region
          |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          |    AND n_regionkey = r_regionkey AND r_name = 'ASIA'
          |  GROUP BY ps_partkey)
          |SELECT ps_partkey, value FROM val
          |WHERE value > (SELECT sum(value) * 0.001 FROM val)""".stripMargin),
      // Q12: late-shipment priority counts; the fixture has no
      // l_commitdate/l_receiptdate/l_shipmode, so "late" = shipped >30
      // days after order date and linestatus stands in for shipmode
      "tpch_q12" -> both(
        """SELECT l_linestatus AS shipmode,
          |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
          |  cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS bigint) AS low_line_count
          |FROM orders, lineitem
          |WHERE o_orderkey = l_orderkey
          |  AND l_shipdate > o_orderdate + INTERVAL_30D
          |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          |GROUP BY l_linestatus""".stripMargin),
      // Q16: supplier count per part descriptor, excluding a supplier
      // subquery via NOT IN (no s_comment in fixture → balance filter)
      "tpch_q16" -> both(psCte +
        """
          |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
          |FROM ps, part
          |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_type, p_size""".stripMargin),
      // Q20: nested IN subqueries + correlated scalar aggregate
      "tpch_q20" -> both(psCte +
        """
          |SELECT s_name, s_acctbal FROM supplier, nation, region
          |WHERE s_suppkey IN (
          |  SELECT ps_suppkey FROM ps
          |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
          |    AND ps_availqty > (
          |      SELECT 0.5 * sum(l_quantity) FROM lineitem
          |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          |        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'))
          |AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA'""".stripMargin),
      // Q21: suppliers who were the sole late shipper on a finished
      // multi-supplier order — EXISTS + NOT EXISTS pair ("late" =
      // shipped >60 days after order date, see q12 note). The Spark
      // spelling folds both correlated subqueries into per-order
      // aggregates — EXISTS(other supplier) ≡ the order has ≥ 2 distinct
      // suppliers, NOT EXISTS(other late supplier) ≡ exactly one distinct
      // late supplier — so lineitem is scanned ONCE instead of the three
      // times Catalyst's decorrelation pays for the subquery form (which
      // stays as the oracle, pinning the rewrite's equivalence).
      "tpch_q21" -> (
        """WITH lo AS (
          |  SELECT /*+ REPARTITION(l_orderkey) */ l_orderkey, l_suppkey,
          |    CASE WHEN l_shipdate > o_orderdate + INTERVAL '60' DAY THEN 1 ELSE 0 END AS is_late
          |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          |  WHERE o_orderstatus = 'F'),
          |per_supp AS (
          |  SELECT l_orderkey, l_suppkey, sum(is_late) AS my_late
          |  FROM lo GROUP BY l_orderkey, l_suppkey),
          |flagged AS (
          |  SELECT l_orderkey, l_suppkey, my_late,
          |    count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
          |    sum(CASE WHEN my_late > 0 THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY l_orderkey) AS n_late_supp
          |  FROM per_supp)
          |SELECT s_name, sum(my_late) AS numwait
          |FROM flagged
          |JOIN supplier ON s_suppkey = l_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE my_late > 0 AND n_supp >= 2 AND n_late_supp = 1
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
        """SELECT s_name, count(*) AS numwait
          |FROM supplier, lineitem l1, orders, nation
          |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          |  AND o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          |  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
          |              AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
          |              AND l3.l_suppkey <> l1.l_suppkey
          |              AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
          |  AND s_nationkey = n_nationkey
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin))
  }

  val queries: Map[String, Q] =
    sqlDefs.map { case (k, (sparkSql, _)) =>
      k -> ((s: SparkSession, dir: String) => Tables.sql(s, dir, sparkSql))
    } ++ Map(
    // Q1: scan + filter + wide grouped aggregation. Partial aggregation
    // (map-side combine) reduces the shuffle to |groups| * partitions rows.
    "tpch_q1" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          avg("l_quantity").as("avg_qty"),
          avg("l_extendedprice").as("avg_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Q3: 3-way join + agg + top-k. The sort+limit becomes
    // TakeOrderedAndProject (no global sort at scale).
    "tpch_q3" -> ((s, dir) => {
      val cutoff = lit("1998-03-15").cast("timestamp")
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders").filter(col("o_orderdate") < cutoff),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q4-style: order priority count with correlated EXISTS (Catalyst
    // decorrelates to a left-semi join).
    "tpch_q4" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      o.join(t(s, dir, "lineitem").select("l_orderkey").distinct(),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q5: 6-way star join; nation/region broadcast, fact-fact join shuffles
    // on orderkey.
    "tpch_q5" -> ((s, dir) => {
      val y0 = lit("1996-01-01").cast("timestamp"); val y1 = lit("1997-01-01").cast("timestamp")
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        // 2-dp rounding on BOTH sides: at sf0.1 the raw sum can straddle
        // the comparator's 9-significant-digit boundary on summation order
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    // Q6: the minimum end-to-end slice (SURVEY §7) — filter + global agg;
    // predicates all push to the parquet scan.
    "tpch_q6" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    }),

    // Q7-style: volume shipping between two nations — double nation join
    // with symmetric pair condition + year rollup.
    "tpch_q7" -> ((s, dir) => {
      val n1 = broadcast(t(s, dir, "nation"))
        .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
      val n2 = broadcast(t(s, dir, "nation"))
        .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
      t(s, dir, "supplier")
        .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("supp_nk"))
        .join(n2, col("c_nationkey") === col("cust_nk"))
        .filter(
          (col("supp_nation") === "NATION_6" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_6"))
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    // Q8-style: market share of one nation's suppliers within a region's
    // orders — 7-way join + conditional share aggregation per year.
    "tpch_q8" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_type") === "PROMO")
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").filter(
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation"))
            .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk")),
          col("c_nationkey") === col("c_nk"))
        .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "AMERICA"),
          col("c_rk") === col("r_regionkey"))
        .join(broadcast(t(s, dir, "nation"))
            .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")),
          col("s_nationkey") === col("s_nk"))
        .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_2", col("volume")).otherwise(0.0)) /
          sum(col("volume"))).as("mkt_share"))
    }),

    // Q15-style: top supplier by quarter revenue — aggregate subquery +
    // join against its own max (the reference plans the revenue CTE twice).
    "tpch_q15" -> ((s, dir) => {
      val revenue = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"))
      val maxRev = revenue.agg(max("total_revenue").as("max_revenue"))
      t(s, dir, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(maxRev, col("total_revenue") === col("max_revenue"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // Q10-style: returned-item ranking, 4-way join + top-k.
    "tpch_q10" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(
            col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q13-style: customer order-count distribution — LEFT OUTER join with a
    // filtered build side + two-level aggregation.
    "tpch_q13" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q14-style: promo revenue share — join + conditional aggregation.
    "tpch_q14" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * sum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) /
            sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("promo_revenue"))
    }),

    // Q17-style: small-quantity revenue vs per-part average — correlated
    // scalar subquery, decorrelated by Catalyst into an aggregate+join.
    "tpch_q17" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val partAvg = l.groupBy(col("l_partkey").as("avg_partkey"))
        .agg((avg("l_quantity") * 0.5).as("qty_threshold"))
      l.join(t(s, dir, "part").filter(col("p_brand") === "Brand#1" && col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("avg_partkey"))
        .filter(col("l_quantity") < col("qty_threshold"))
        .agg((sum("l_extendedprice") / 7.0).as("avg_yearly"))
    }),

    // Q18-style: large-volume orders — HAVING over grouped sum, then join
    // back to headers (semi-join on the aggregated key set).
    //
    // Exchange diet (r5 soak finding: q18 was the worst headline ratio at
    // 100×): the HAVING passes ~20% of orders at this threshold, so in
    // the post-broadcast regime the old plan shuffled orders, the join
    // result AND customer. The top-100 is computed BEFORE the customer
    // join: o_custkey → customer is a 1:1 FK lookup (TPC-H integrity), so
    // it commutes with the limit, and TakeOrderedAndProject is
    // exchange-free (per-partition top-K, driver merge). The customer
    // side becomes a 100-row broadcast probe instead of a full shuffle —
    // two scaling exchanges gone, identical result.
    "tpch_q18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("big_orderkey"))
        .agg(sum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 150)
      val top = t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("big_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
      broadcast(top)
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q19-style: disjunctive join predicates — Catalyst extracts the common
    // equi-key (partkey) and keeps the OR residual as a join filter.
    "tpch_q19" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 30) && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 45) && col("l_quantity").between(20, 30)))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }),

    // Q22-style: customers with above-average balance and no orders —
    // scalar subquery + null-aware anti join.
    "tpch_q22" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(avg("c_acctbal").as("ab")).select("ab")
      c.join(avgBal).filter(col("c_acctbal") > col("ab"))
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .select("o_custkey").distinct(),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), sum("c_acctbal").as("totacctbal"))
    }))

  val oracles: Map[String, String] =
    sqlDefs.map { case (k, (_, duck)) => k -> duck } ++ Map(
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |sum(l_extendedprice) AS sum_base_price,
        |sum(l_extendedprice*(1-l_discount)) AS sum_disc_price,
        |sum(l_extendedprice*(1-l_discount)*(1+l_tax)) AS sum_charge,
        |avg(l_quantity) AS avg_qty, avg(l_extendedprice) AS avg_price,
        |avg(l_discount) AS avg_disc, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |sum(l_extendedprice*(1-l_discount)) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority""".stripMargin,
    "tpch_q5" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "tpch_q6" ->
      """SELECT sum(l_extendedprice*l_discount) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |year(l_shipdate) AS l_year,
        |round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_6'))
        |AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,
    "tpch_q8" ->
      """SELECT year(o_orderdate) AS o_year,
        |sum(CASE WHEN n2.n_name = 'NATION_2'
        |    THEN l_extendedprice*(1-l_discount) ELSE 0.0 END) /
        |sum(l_extendedprice*(1-l_discount)) AS mkt_share
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
        |AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(l_extendedprice*(1-l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin,
    "tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |sum(l_extendedprice*(1-l_discount)) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin,
    "tpch_q14" ->
      """SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO'
        |THEN l_extendedprice*(1-l_discount) ELSE 0.0 END) /
        |sum(l_extendedprice*(1-l_discount)) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "tpch_q17" ->
      """SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1' AND p_type = 'PROMO'
        |AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        |                  WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey AS big_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) b
        |ON o_orderkey = big_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "tpch_q19" ->
      """SELECT sum(l_extendedprice*(1-l_discount)) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 20)
        |OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q22" ->
      """SELECT c_nationkey, count(*) AS numcust, sum(c_acctbal) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey""".stripMargin)
}
