package graft.tools_dev

import org.apache.spark.sql.functions._
import SoakHarness._

/** Single-variable A/B for the cval optimization: the SAME six moment
  * sums over the SAME sliding windows, arguments spelled (A) inline —
  * the pair-masked, pivot-centered CASE/CAST trees evaluated per frame
  * position — vs (B) as precomputed inner-select columns read per frame
  * position. One session, alternating arms, 4 rounds each after 2
  * prewarms; identical checksums assert result equivalence.
  */
object R12CvalAb {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/r12moment"
    require(new java.io.File(s"$dir/orders.parquet/_SUCCESS").exists, "run R12MomentProbe first")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session(shuffleParts = "64")

    val both = "(o_orderkey % 7 != 0 AND o_orderkey % 11 != 0)"
    val yRaw = "o_totalprice / 1000"
    val xRaw = "o_orderkey % 997"
    val pivY = s"coalesce(avg(CASE WHEN $both THEN ($yRaw) END) OVER (PARTITION BY pk), 0.0D)"
    val pivX = s"coalesce(avg(CASE WHEN $both THEN ($xRaw) END) OVER (PARTITION BY pk), 0.0D)"
    val w = "OVER (PARTITION BY pk ORDER BY bucket ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"
    val src = s"""(SELECT pmod(o_custkey, 1024) AS pk, o_orderkey, o_totalprice,
                 |  cast(floor(o_totalprice / 30000) AS bigint) AS bucket
                 |  FROM parquet.`$dir/orders.parquet`) t""".stripMargin

    // arm A: the six sums evaluate the full centered CASE trees per frame row
    val cyInl = s"(CASE WHEN $both THEN (CAST(($yRaw) AS DOUBLE) - $pivY) END)"
    val cxInl = s"(CASE WHEN $both THEN (CAST(($xRaw) AS DOUBLE) - $pivX) END)"
    def sums(cy: String, cx: String, one: String) = Seq(
      s"count($one) $w", s"sum($cy) $w", s"sum($cx) $w",
      s"sum($cy * $cy) $w", s"sum($cx * $cx) $w", s"sum($cy * $cx) $w")
      .zipWithIndex.map { case (e, i) => s"$e AS m$i" }.mkString(", ")
    val qInline =
      s"SELECT pk, bucket, ${sums(cyInl, cxInl, s"(CASE WHEN $both THEN 1 END)")} FROM $src"
    // arm B: the centered sides are inner-select columns
    val qCval =
      s"""SELECT pk, bucket, ${sums("cy", "cx", "one")} FROM (
         |  SELECT pk, bucket,
         |    CASE WHEN $both THEN 1 END AS one,
         |    CASE WHEN $both THEN (CAST(($yRaw) AS DOUBLE) - $pivY) END AS cy,
         |    CASE WHEN $both THEN (CAST(($xRaw) AS DOUBLE) - $pivX) END AS cx
         |  FROM $src) inner_t""".stripMargin

    def consume(sql: String): (Long, Long) = {
      val df = spark.sql(sql)
      val h = df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
      val r = h.agg(count(lit(1)).as("n"), bit_xor(col("h")).as("ck")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val arms = Seq("inline" -> qInline, "cval" -> qCval)
    gcDrain()
    val cks = arms.map { case (n, q) => n -> consume(q) }.toMap // prewarm 1
    arms.foreach { case (_, q) => consume(q) } // prewarm 2
    println(s"[r12cval] checksums: $cks equal=${cks("inline") == cks("cval")}")
    val runs = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    for (round <- 1 to 4; (name, q) <- arms) {
      val t0 = System.nanoTime(); consume(q)
      val wall = (System.nanoTime() - t0) / 1e9
      runs(name) = runs(name) :+ wall
      println(f"[r12cval] round $round $name $wall%.2f s load=${load1}%.1f")
    }
    def med(v: Vector[Double]) = { val s = v.sorted; s(s.length / 2) }
    val (mi, mc) = (med(runs("inline")), med(runs("cval")))
    println(f"""[r12cval-json] {"inline_median_s":$mi%.3f,"cval_median_s":$mc%.3f,""" +
      f""""cval_vs_inline":${mc / mi}%.3f,""" +
      s""""inline_runs":[${runs("inline").map(r => f"$r%.3f").mkString(",")}],""" +
      s""""cval_runs":[${runs("cval").map(r => f"$r%.3f").mkString(",")}],""" +
      s""""checksums_equal":${cks("inline") == cks("cval")},""" +
      f""""load_start":$loadStart%.2f,"load_warning":$warn}""")
  }
}
