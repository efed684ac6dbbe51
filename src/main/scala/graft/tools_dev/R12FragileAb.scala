package graft.tools_dev

import org.apache.spark.sql.functions._
import SoakHarness._

/** Cost of the fragile-window routing on the COMMON shape — a running
  * correlation (`corr(y, x) OVER (PARTITION BY pk ORDER BY bucket)`,
  * implicit growing frame): the engine now lowers it (native Spark corr
  * throws ANSI DIVIDE_BY_ZERO on degenerate frames), and growing frames
  * evaluate incrementally in Spark, so the 13 moment accumulators
  * should cost far less than the sliding-frame 8×. Arms: (A) raw native
  * corr submitted directly to spark.sql, bypassing the dialect — runs
  * only because THIS data has ≥2 pairs and nonzero variance in every
  * frame; (B) the same text through Dialect.rewrite (lowered). One
  * session, alternating, 4 rounds after 2 prewarms. The sliding-frame
  * arm repeats the comparison on RANGE 1P..1F.
  */
object R12FragileAb {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/r12moment"
    require(new java.io.File(s"$dir/orders.parquet/_SUCCESS").exists, "run R12MomentProbe first")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = session(shuffleParts = "64")
    val src = s"""(SELECT pmod(o_custkey, 1024) AS pk,
                 |  o_totalprice / 1000 AS yv, o_orderkey % 997 AS xv,
                 |  cast(floor(o_totalprice / 30000) AS bigint) AS bucket
                 |  FROM parquet.`$dir/orders.parquet`) t""".stripMargin
    val running =
      s"SELECT pk, bucket, corr(yv, xv) OVER (PARTITION BY pk ORDER BY bucket) AS r FROM $src"
    val sliding =
      s"SELECT pk, bucket, corr(yv, xv) OVER (PARTITION BY pk ORDER BY bucket " +
        s"RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS r FROM $src"
    def consume(sql: String, lower: Boolean): (Long, Long) = {
      val text = if (lower) graft.sqlcompat.Dialect.rewrite(sql) else sql
      val df = spark.sql(text)
      val h = df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
      val r = h.agg(count(lit(1)).as("n"), bit_xor(col("h")).as("ck")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val arms = Seq(
      ("running_native", running, false), ("running_lowered", running, true),
      ("sliding_native", sliding, false), ("sliding_lowered", sliding, true))
    gcDrain()
    arms.foreach { case (n, q, l) =>
      val (rows, ck) = consume(q, l); consume(q, l)
      println(s"[r12fragile] $n prewarmed rows=$rows ck=$ck")
    }
    val runs = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector.empty)
    for (round <- 1 to 4; (name, q, l) <- arms) {
      val t0 = System.nanoTime(); consume(q, l)
      val wall = (System.nanoTime() - t0) / 1e9
      runs(name) = runs(name) :+ wall
      println(f"[r12fragile] round $round $name $wall%.2f s load=${load1}%.1f")
    }
    def med(v: Vector[Double]) = { val s = v.sorted; s(s.length / 2) }
    val parts = arms.map { case (name, _, _) =>
      f""""$name":{"median_s":${med(runs(name))}%.3f,""" +
        s""""runs":[${runs(name).map(r => f"$r%.3f").mkString(",")}]}"""
    }
    println("[r12fragile-json] {" + parts.mkString(",") +
      f""","running_overhead":${med(runs("running_lowered")) / med(runs("running_native"))}%.2f""" +
      f""","sliding_overhead":${med(runs("sliding_lowered")) / med(runs("sliding_native"))}%.2f""" +
      f""","load_start":$loadStart%.2f,"load_warning":$warn}""")
  }
}
