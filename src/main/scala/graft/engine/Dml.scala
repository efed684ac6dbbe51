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
