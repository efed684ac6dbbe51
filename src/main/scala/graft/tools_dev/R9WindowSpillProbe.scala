package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import SoakHarness._

/** Window-operator spill coverage (companion to [[R9SpillSoak]]): at a
  * 6 GB heap the window queries never spill because a window buffers at
  * most ONE partition's rows (60M/256 ≈ 234k rows ≈ 20 MB — fits), so
  * the heap lever can't reach the operator. Spark's own spilled-window
  * tests force it through the buffer thresholds instead; this probe sets
  * `spark.sql.windowExec.buffer.{in.memory,spill}.threshold` low —
  * every window buffer beyond the threshold goes through
  * UnsafeExternalSorter — and re-runs the three window-shaped queries at
  * the 100× corpus, checking their count+checksum against the
  * unthrottled 48g reference pass (/tmp/r9spill_reference.json).
  * Reference analog: TestSpilledWindowQueries / TestSpilledAggregations.
  */
object R9WindowSpillProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sftpch100"
    val refPath = "/tmp/r9spill_reference.json"
    require(new java.io.File(s"$dir/lineitem.parquet").exists, s"$dir missing")
    require(new java.io.File(refPath).exists, "run the R9SpillSoak 48g pass first")
    val (loadStart, waits, warn) = waitForQuiet()
    val spark = graft.engine.SessionDefaults(SparkSession.builder()
      .withExtensions(new graft.engine.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256"))
      .config("spark.sql.windowExec.buffer.in.memory.threshold", "512")
      .config("spark.sql.windowExec.buffer.spill.threshold", "512"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spill = attachSpillStats(spark)
    val refFps: Map[String, (Long, Long)] = {
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(refPath))
      """\{"query":"([^"]+)","n":(-?\d+),"ck":(-?\d+)\}""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> (m.group(2).toLong, m.group(3).toLong)).toMap
    }
    val rows = new StringBuilder
    var first = true
    var allMatch = true
    for (name <- Seq("win_topn_per_group", "mr_funnel", "evt_sessionize")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val hashed = df.select(
        xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
      spill.reset()
      val t0 = System.nanoTime()
      val r = hashed.agg(count(lit(1)).as("n"), bit_xor(col("h")).as("ck")).head()
      val wall = (System.nanoTime() - t0) / 1e9
      val (n, ck) = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      val (memSp, diskSp) = spill.snapshot()
      val ok = refFps.get(name).contains((n, ck))
      allMatch &&= ok
      if (!first) rows.append(",")
      first = false
      rows.append(f"""{"query":"$name","n":$n,"ck":$ck,"wall_s":$wall%.2f,""" +
        s""""spill_mem_bytes":$memSp,"spill_disk_bytes":$diskSp,"matches_48g":$ok}""")
      println(f"[r9wspill] $name $wall%.1f s spill mem ${memSp / 1e9}%.2f GB " +
        f"disk ${diskSp / 1e9}%.2f GB match=$ok")
    }
    // The three driver queries window over HIGH-cardinality keys (user,
    // ticket), so each buffered group is tiny and never crosses even a
    // 512-row threshold — that finding is itself recorded above. To
    // drive the spill path for real, a WIDE-GROUP running window:
    // PARTITION BY (returnflag, month) gives ~250 groups of ~240k rows
    // each at 100×, so every window buffer overflows the forced
    // threshold into UnsafeExternalSorter. Correctness pin: the same query's checksum
    // with default thresholds (no spill), same session (the thresholds
    // are runtime SQLConf).
    def wideWindow(): (Long, Long) = {
      val df = graft.engine.Tables.load(spark, dir, "lineitem")
        // project BEFORE the window: the buffer holds whole rows, and a
        // wide group of full 16-column lineitem rows would be GBs; and
        // partition by (returnflag, month) — ~250 groups of ~240k rows:
        // every group is far beyond the 65536-row spill threshold (real
        // spill) while merge fan-in stays ~4 files/group (a 3×20M-row
        // grouping at a 512-row threshold produced ~40k spill files per
        // group, whose merge read-ahead buffers OOM'd the JVM)
        .select(col("l_returnflag"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity").cast("bigint").as("qty"))
        .withColumn("mth", date_trunc("month", col("l_shipdate")))
        .withColumn("rs", sum(col("qty")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("l_returnflag"), col("mth"))
            .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), max(col("rs")).as("mx"),
          bit_xor(xxhash64(col("l_orderkey"), col("rs").cast("string"))).as("ck"))
      val r = df.agg(bit_xor(col("ck")).as("c"), sum(col("n")).as("n")).head()
      (r.getLong(1), r.getLong(0))
    }
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", 4096)
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", 2147483632)
    val (nRef, ckRef) = wideWindow() // unthrottled reference, same session
    // 65536-row threshold: a handful of spill files per ~240k-row group.
    // (The first attempt — 512-row threshold over 3×20M-row groups —
    // creates ~40k spill files per group and the merge phase's per-file
    // read-ahead buffers OOM the JVM with 16k threads; the lesson is
    // itself part of the spill story: spill GRANULARITY must scale with
    // the buffered volume.)
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", 65536)
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", 65536)
    spill.reset()
    val t0 = System.nanoTime()
    val (nSp, ckSp) = wideWindow()
    val wallW = (System.nanoTime() - t0) / 1e9
    val (memW, diskW) = spill.snapshot()
    val okW = nSp == nRef && ckSp == ckRef && diskW > 0
    allMatch &&= okW
    println(f"[r9wspill] wide_group_running_sum $wallW%.1f s spill mem " +
      f"${memW / 1e9}%.2f GB disk ${diskW / 1e9}%.2f GB match=${nSp == nRef && ckSp == ckRef} " +
      s"disk_spill_nonzero=${diskW > 0}")
    rows.append("," + f"""{"query":"wide_group_running_sum (~250 groups x 240k rows)","n":$nSp,"ck":$ckSp,""" +
      f""""wall_s":$wallW%.2f,"spill_mem_bytes":$memW,"spill_disk_bytes":$diskW,""" +
      s""""matches_unthrottled":${nSp == nRef && ckSp == ckRef},"disk_spill_nonzero":${diskW > 0}}""")
    writeArtifact("/root/repo/R9WINDOW_SPILL_r09.json",
      s"""{"soak":"r9_window_forced_spill","corpus":"$dir",""" +
        s""""method":"windowExec buffer thresholds forced low; driver window queries group by high-cardinality keys (tiny buffers, no spill possible - recorded as the finding) so a wide-group running sum (PARTITION BY returnflag+month: ~250 groups x 240k rows, threshold 65536) drives the actual spill path; checksums vs the unthrottled same-session run",""" +
        f""""load_start":$loadStart%.2f,"load_waits":$waits,"load_warning":$warn,""" +
        s""""all_match":$allMatch,"rows":[${rows.toString}],""" +
        f""""load_end":${load1}%.2f}""")
    spark.stop()
  }
}
