package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbench (not part of the product): the two spellings of a
  * per-peer-group "suffix" aggregate, interleaved in ONE session — the
  * shape behind the r15-opt EXCLUDE CURRENT ROW lowering change.
  *
  *  A (old): fn OVER (PARTITION BY grp ORDER BY const
  *           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
  *           — Spark's UnboundedFollowingWindowFunctionFrame re-evaluates
  *           the aggregate from scratch per row: O(peer²).
  *  B (new): fn OVER (PARTITION BY grp ORDER BY rn DESC
  *           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
  *           — running frame, incremental: O(peer).
  *
  * Sized so the quadratic actually bites: args = [nRows] [peerSize].
  */
object R15SuffixFrameAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val peer = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val spark = graft.engine.SessionDefaults(
      SparkSession.builder().withExtensions(new graft.engine.GraftExtensions)
        .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n.toLong)
      .select(col("id"), (col("id") / peer).cast("long").as("grp"),
        pmod(col("id") * 2654435761L, lit(1000003L)).as("x"))
    df.createOrReplaceTempView("t")
    val a = """SELECT grp, min(x) OVER (PARTITION BY grp ORDER BY grp
              |  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS m,
              |  sum(x) OVER (PARTITION BY grp ORDER BY grp
              |  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS s
              |FROM t""".stripMargin
    val b = """SELECT grp, min(x) OVER (PARTITION BY grp ORDER BY id DESC
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m,
              |  sum(x) OVER (PARTITION BY grp ORDER BY id DESC
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s
              |FROM t""".stripMargin
    def run(sql: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 2).foreach { _ => run(a); run(b) } // prewarm
    val as = scala.collection.mutable.ArrayBuffer[Double]()
    val bs = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to 3).foreach { _ => as += run(a); bs += run(b); bs += run(b); as += run(a) }
    def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.length / 2) }
    println(f"[sfx] n=$n peer=$peer old=${med(as.toSeq)}%.3f new=${med(bs.toSeq)}%.3f " +
      f"ratio=${med(bs.toSeq) / med(as.toSeq)}%.4f " +
      s"olds=${as.map(x => f"$x%.2f").mkString(",")} news=${bs.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
