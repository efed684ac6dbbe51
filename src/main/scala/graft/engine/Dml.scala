package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{expr, not}

/** Row-level DML over parquet tables — the reference's DeleteOperator /
  * UpdateOperator / MergeOperator family
  * (`core/trino-main/.../operator/DeleteOperator.java`,
  * `UpdateOperator.java`), emulated the way lakehouse formats do it:
  * copy-on-write. The surviving (respectively transformed) rows are
  * written to a staging directory and atomically swapped in, so readers
  * see either the old or the new table, never a partial state.
  *
  * Scale note: COW rewrites the whole table per statement here; a
  * partition-pruned implementation would rewrite only affected
  * partitions (predicate → partition keys), which is exactly how the
  * production formats bound DML cost. Both the rewrite and the swap are
  * driver-light: one distributed write + one filesystem rename.
  */
object Dml {

  /** DELETE FROM <tablePath> WHERE <predicate>; returns rows deleted. */
  def delete(spark: SparkSession, tablePath: String, predicate: String): Long = {
    val df = spark.read.parquet(tablePath)
    val total = df.count()
    val remaining = df.filter(not(expr(predicate)))
    val staging = s"$tablePath.__staging"
    remaining.write.mode("overwrite").parquet(staging)
    val kept = spark.read.parquet(staging).count()
    Fs.swapIn(spark, tablePath, staging)
    total - kept
  }

  /** UPDATE <tablePath> SET col = expr, ... WHERE <predicate>; returns
    * rows updated. All assignments are evaluated in ONE projection, so
    * every right-hand side — and the predicate — sees the PRE-update row
    * (standard UPDATE semantics; a sequential withColumn fold would let
    * later assignments observe earlier ones).
    */
  def update(spark: SparkSession, tablePath: String, predicate: String,
      set: Map[String, String]): Long = {
    val df = spark.read.parquet(tablePath)
    val cond = expr(predicate)
    val projected = df.columns.map { c =>
      if (set.contains(c))
        org.apache.spark.sql.functions.when(cond, expr(set(c)))
          .otherwise(org.apache.spark.sql.functions.col(c)).as(c)
      else org.apache.spark.sql.functions.col(c)
    }
    val updated = df.select(projected.toIndexedSeq: _*)
    val n = df.filter(cond).count()
    val staging = s"$tablePath.__staging"
    updated.write.mode("overwrite").parquet(staging)
    Fs.swapIn(spark, tablePath, staging)
    n
  }

  /** One WHEN MATCHED branch: optional extra condition (sees both target
    * and `s.`-qualified source columns); `set` = None means DELETE,
    * Some(assignments) means UPDATE.
    */
  final case class WhenMatched(condition: Option[String], set: Option[Map[String, String]])

  /** MERGE INTO <tablePath> USING <source> s ON <onCond>
    * [WHEN MATCHED (AND c)? THEN UPDATE SET ... | DELETE]*
    * [WHEN NOT MATCHED THEN INSERT (assignments over s.*)]
    * (reference grammar `SqlBase.g4:163` #merge; MergeOperator family).
    *
    * Copy-on-write like DELETE/UPDATE: the merged row set is staged and
    * atomically swapped. Branches apply in declaration order, first
    * match wins (SQL standard). A target row matched by MORE than one
    * source row raises, per the standard's cardinality rule — checked
    * distributedly (a groupBy on a synthetic target-row id, no driver
    * materialization). Returns (updated, deleted, inserted).
    */
  def merge(spark: SparkSession, tablePath: String,
      source: org.apache.spark.sql.DataFrame, onCond: String,
      whenMatched: Seq[WhenMatched],
      whenNotMatchedInsert: Option[Map[String, String]]): (Long, Long, Long) = {
    import org.apache.spark.sql.functions._
    val target = spark.read.parquet(tablePath)
    val tCols = target.columns.toSeq
    val t = target.withColumn("__tid", monotonically_increasing_id())
    val s = source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, s"s_$c"))
      .withColumn("__smatch", lit(1))
    // `s.x` spellings in conditions/assignments resolve to the renamed cols
    def rewrite(e: String): String = "(?i)\\bs\\.([A-Za-z_]\\w*)".r
      .replaceAllIn(e, m => "s_" + m.group(1))
    val joined = t.join(s, expr(rewrite(onCond)), "left_outer")
    // SQL-standard cardinality check: no target row may match twice
    val dup = joined.filter(col("__smatch").isNotNull)
      .groupBy(col("__tid")).count().filter(col("count") > 1).limit(1).count()
    if (dup > 0) throw new IllegalStateException(
      "MERGE: one target row matched more than one source row")

    val matched = col("__smatch").isNotNull
    // branch selector: index of the first applicable WHEN MATCHED branch,
    // -1 = no branch applies (row is kept unchanged)
    val branch = whenMatched.zipWithIndex.foldRight(lit(-1): org.apache.spark.sql.Column) {
      case ((wm, i), alt) =>
        val c = wm.condition.map(c0 => expr(rewrite(c0))).getOrElse(lit(true))
        when(c, lit(i)).otherwise(alt)
    }
    val withBranch = joined.withColumn("__branch", when(matched, branch).otherwise(lit(-1)))
    val deletes = whenMatched.zipWithIndex.collect { case (WhenMatched(_, None), i) => i }
    val survivorsBase = withBranch.filter(!col("__branch").isInCollection(
      if (deletes.isEmpty) Seq(-999) else deletes))
    val survivors = survivorsBase.select(tCols.map { c =>
      whenMatched.zipWithIndex.foldRight(col(c)) {
        case ((WhenMatched(_, Some(set)), i), alt) if set.contains(c) =>
          when(col("__branch") === i, expr(rewrite(set(c)))).otherwise(alt)
        case (_, alt) => alt
      }.as(c)
    }: _*)
    val inserts = whenNotMatchedInsert.map { ins =>
      s.join(t, expr(rewrite(onCond)), "left_anti")
        .select(tCols.map(c => expr(rewrite(ins.getOrElse(c, "NULL"))).cast(
          target.schema(c).dataType).as(c)): _*)
    }
    val nUpdated = withBranch.filter(col("__branch") >= 0 &&
      !col("__branch").isInCollection(if (deletes.isEmpty) Seq(-999) else deletes)).count()
    val nDeleted = if (deletes.isEmpty) 0L
      else withBranch.filter(col("__branch").isInCollection(deletes)).count()
    val nInserted = inserts.map(_.count()).getOrElse(0L)

    val result = inserts.map(survivors.unionByName(_)).getOrElse(survivors)
    val staging = s"$tablePath.__staging"
    result.write.mode("overwrite").parquet(staging)
    Fs.swapIn(spark, tablePath, staging)
    (nUpdated, nDeleted, nInserted)
  }
}

/** Shared staging-swap: write-new-then-rename so readers see either the
  * old or the new table, never a partial one (used by DML and MV refresh).
  */
object Fs {
  def swapIn(spark: SparkSession, path: String, staging: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    // The path's OWN filesystem, not the default one — tablePath may be
    // scheme-qualified (s3a://, hdfs://) while staging was written next to it.
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(path + ".__backup")
    fs.delete(backup, true)
    // Rename old aside, rename staging in, then drop the backup: a crash at
    // any point leaves either the old or the new table recoverable — never
    // the delete-then-rename window where readers see no table at all.
    val hadOld = fs.exists(target)
    if (hadOld && !fs.rename(target, backup))
      throw new java.io.IOException(s"swapIn: could not move $target aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), target)) {
      if (hadOld) fs.rename(backup, target) // roll back
      throw new java.io.IOException(s"swapIn: could not move $staging into place")
    }
    fs.delete(backup, true)
  }
}
