package graft.tools_dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SoakHarness._

/** Scale probe for the r12 window lowerings: the co-moment EXCLUDE
  * rewrite turns ONE corr window into ~13 windowed sums plus two
  * partition-mean pivots, and nth_value's slice path collects a
  * frame-sized array per row — this measures what that costs against
  * the native single-window baseline at 15M rows (100× key-shifted
  * orders), with 1024 partition keys so the window exchange actually
  * spreads across the 32 threads (a 3-way status partition would
  * measure stragglers, not the lowering).
  *
  * Protocol: one session, gcDrain once per variant BEFORE its prewarms
  * (r12 drain placement), then three INTERLEAVED measurement rounds
  * (variant order fixed, runs in execution order) so a load burst taxes
  * every variant equally. Per-run count+checksum pins in-session
  * determinism; the per-variant physical plan's exchange count pins the
  * one-shuffle property at scale.
  *
  * Usage: SPARK_DRIVER_MEM=24g runMain graft.tools_dev.R12MomentProbe
  * Output: one JSON line → R12MOMENT_PROBE_r12.json (builder-curated).
  *
  * NOTE (post-fragile-routing): `corr_plain` passed through natively
  * when the committed artifact was quoted; the tree now lowers EVERY
  * corr window (native throws ANSI DIVIDE_BY_ZERO on degenerate
  * frames), so a re-run's corr_plain measures the lowered form — see
  * R12FRAGILE_AB_r12.json for the native-vs-lowered quote on the
  * final tree.
  */
object R12MomentProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/r12moment"
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session(shuffleParts = "64")
    buildOrders100x(spark, dir)

    val base =
      s"""(SELECT pmod(o_custkey, 1024) AS pk,
         |  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice / 1000 END AS yv,
         |  CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderkey % 997 END AS xv,
         |  cast(floor(o_totalprice / 30000) AS bigint) AS bucket
         |  FROM parquet.`$dir/orders.parquet`) t""".stripMargin
    def q(call: String) =
      s"SELECT pk, bucket, $call AS r FROM $base"
    val variants: Seq[(String, String)] = Seq(
      "corr_plain" -> q("corr(yv, xv) OVER (PARTITION BY pk ORDER BY bucket " +
        "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)"),
      "corr_excl_range" -> q("corr(yv, xv) OVER (PARTITION BY pk ORDER BY bucket " +
        "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)"),
      "corr_excl_rows" -> q("corr(yv, xv) OVER (PARTITION BY pk ORDER BY bucket " +
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP)"),
      "stddev_excl_rows" -> q("stddev(yv) OVER (PARTITION BY pk ORDER BY bucket " +
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP)"),
      "nth_excl_rows" -> q("nth_value(yv, 2) OVER (PARTITION BY pk ORDER BY bucket " +
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE GROUP)"))

    def consume(sql: String): (Long, Long) = {
      val df = spark.sql(graft.sqlcompat.Dialect.rewrite(sql))
      val h = df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
      val r = h.agg(count(lit(1)).as("n"), bit_xor(col("h")).as("ck")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def exchanges(sql: String): Int = {
      val df = spark.sql(graft.sqlcompat.Dialect.rewrite(sql))
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
        .sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
    }

    // per-variant drain + prewarms, recording checksum + exchange count
    val meta = variants.map { case (name, sql) =>
      gcDrain()
      val (n, ck) = consume(sql); consume(sql) // 2 prewarms
      val ex = exchanges(sql)
      println(s"[r12moment] $name prewarmed n=$n ck=$ck exchanges=$ex")
      name -> (n, ck, ex)
    }.toMap

    // three interleaved rounds
    val runs = scala.collection.mutable.Map[String, Vector[(Double, Boolean, Double)]]()
      .withDefaultValue(Vector.empty)
    for (round <- 1 to 3; (name, sql) <- variants) {
      val l0 = load1
      val t0 = System.nanoTime()
      val (n, ck) = consume(sql)
      val wall = (System.nanoTime() - t0) / 1e9
      val stable = (n, ck) == ((meta(name)._1, meta(name)._2))
      runs(name) = runs(name) :+ ((wall, stable, l0))
      println(f"[r12moment] round $round $name $wall%.2f s stable=$stable load=$l0%.1f")
    }

    val plainMedian = {
      val s = runs("corr_plain").map(_._1).sorted; s(s.length / 2)
    }
    val sb = new StringBuilder
    sb.append("{")
    sb.append(variants.map { case (name, _) =>
      val rs = runs(name)
      val sorted = rs.map(_._1).sorted
      val med = sorted(sorted.length / 2)
      val (n, ck, ex) = meta(name)
      f""""$name":{"median_s":$med%.3f,"runs":[${rs.map(r => f"${r._1}%.3f").mkString(",")}],""" +
        f""""loads":[${rs.map(r => f"${r._3}%.1f").mkString(",")}],""" +
        s""""rows":$n,"checksum":$ck,"stable":${rs.forall(_._2)},""" +
        f""""exchanges":$ex,"vs_plain":${med / plainMedian}%.2f}"""
    }.mkString(","))
    sb.append(f""","rows_total":${meta("corr_plain")._1},"load_start":$loadStart%.2f,""")
    sb.append(s""""load_waits":$waits,"load_warning":$warn,""")
    sb.append(s""""protocol":"gcDrain per variant before prewarms; 2 prewarms; 3 interleaved rounds"}""")
    println("[r12moment-json] " + sb.toString)
  }

  /** 100× key-shifted orders (the ScaleSoakTpch100 recipe, orders only). */
  private def buildOrders100x(spark: SparkSession, dir: String): Unit = {
    if (new java.io.File(s"$dir/orders.parquet/_SUCCESS").exists) return
    val src = graft.engine.Tables.load(spark, "/root/testdata/sf0.1", "orders")
    val shifts = Seq("o_orderkey", "o_custkey")
    val maxes = shifts.map(c => c -> (src.agg(max(col(c))).head().getLong(0) + 1L)).toMap
    val out = (0 until 100).map { i =>
      shifts.foldLeft(src) { (d, c) => d.withColumn(c, col(c) + lit(i * maxes(c))) }
    }.reduce(_ unionAll _)
    out.repartition(64).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    println(s"[r12moment] built $dir/orders.parquet rows=" +
      spark.read.parquet(s"$dir/orders.parquet").count())
  }
}
