package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level DML over parquet tables — the reference's DeleteOperator /
  * UpdateOperator / MergeOperator family
  * (`core/trino-main/.../operator/DeleteOperator.java`,
  * `UpdateOperator.java`), emulated the way lakehouse formats do it:
  * copy-on-write. The surviving (respectively transformed) rows are
  * written to a staging directory and atomically swapped in, so readers
  * see either the old or the new table, never a partial state.
  *
  * Scale shape:
  *   - PARTITION-PRUNED rewrites: on a Hive-layout table (`k=v/`
  *     directories) only the partitions that can contain matching rows
  *     are rewritten and swapped; untouched partition directories are
  *     never read for the rewrite and keep their files byte-for-byte
  *     (the reference bounds DML the same way via connector rowIds —
  *     `DeleteOperator.java:23`; lakehouse COW bounds it by predicate →
  *     partition keys). A one-row DELETE on a 100 TB table costs one
  *     partition, not the table.
  *   - ONE JOB per statement: affected-row counts come from
  *     `Dataset.observe` (CollectMetrics inside the write job) — exact,
  *     native, no pre/post `count()` rescans, and consistent with the
  *     written data even when the source plan is nondeterministic,
  *     because they are measured on the very rows that were written.
  */
object Dml {

  /** Hive-layout partition spec of `path`: partition column names (outer
    * to inner) and one (values, directory) entry per leaf partition.
    * Empty column list = unpartitioned table.
    */
  private[engine] def partitionLayout(spark: SparkSession, path: String)
      : (Seq[String], Seq[(Seq[String], String)]) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val Part = """([^=/]+)=(.*)""".r
    def walk(dir: org.apache.hadoop.fs.Path, values: Seq[String])
        : (Seq[String], Seq[(Seq[String], String)]) = {
      val subdirs = fs.listStatus(dir).filter(_.isDirectory)
        .map(s => s.getPath).filterNot(_.getName.startsWith("."))
        // a crash can strand swap workspaces next to real partitions;
        // they must never parse as partition values
        .filterNot(p => p.getName.endsWith(".__staging") || p.getName.endsWith(".__backup"))
      val parts = subdirs.flatMap(p => p.getName match {
        case Part(k, v) => Some((k,
          java.net.URLDecoder.decode(v, "UTF-8"), p))
        case _ => None
      })
      if (parts.isEmpty || parts.length != subdirs.length) (Nil, Nil)
      else {
        val names = parts.map(_._1).distinct
        if (names.length != 1) (Nil, Nil) // mixed keys: not a Hive layout
        else {
          val children = parts.map { case (_, v, p) => walk(p, values :+ v) }
          val deeper = children.head._1
          if (children.forall(_._1 == deeper) && deeper.nonEmpty)
            (names.head +: deeper, children.flatMap(_._2).toSeq)
          else
            (Seq(names.head),
              parts.map { case (_, v, p) => (values :+ v, p.toString) }.toSeq)
        }
      }
    }
    walk(root, Nil)
  }

  private[engine] val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Leaf partitions whose directory can hold a row matching `predicate`.
    * When the predicate references only partition columns the decision is
    * made on the directory VALUES alone (no data read at all); otherwise
    * one pruned `distinct` scan asks the data which partitions match —
    * Catalyst still prunes that scan by whatever partition-column
    * conjuncts the predicate carries.
    *
    * Matching is TYPED in both branches: directory strings are cast to
    * the table's discovered partition column types before comparison
    * (null partitions via the `__HIVE_DEFAULT_PARTITION__` sentinel), so
    * renderings that differ from `String.valueOf` of the typed value —
    * zero-padded numerics (`month=01`), timestamp partitions, nulls —
    * still prune correctly instead of silently matching nothing.
    */
  private[engine] def touchedPartitions(spark: SparkSession, df: DataFrame,
      partCols: Seq[String], parts: Seq[(Seq[String], String)],
      predicate: String): Seq[(Seq[String], String)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import scala.jdk.CollectionConverters._
    val refs = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate).collect {
        case a: UnresolvedAttribute => a.nameParts.last.toLowerCase
      }.toSet
    val partLower = partCols.map(_.toLowerCase)
    // one row per leaf partition, directory values cast to the types
    // Spark inferred for the partition columns on read
    val rows = parts.zipWithIndex.map { case ((vs, _), i) =>
      org.apache.spark.sql.Row.fromSeq(i.toLong +: vs)
    }.asJava
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pidx",
        org.apache.spark.sql.types.LongType) +:
        partCols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)))
    val partTypes = partCols.map { c =>
      df.schema.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
        .getOrElse(org.apache.spark.sql.types.StringType)
    }
    val typedDirs = partCols.zip(partTypes)
      .foldLeft(spark.createDataFrame(rows, schema)) { case (d, (c, t)) =>
        d.withColumn(c, when(col(c) === lit(HiveDefaultPartition), lit(null))
          .otherwise(col(c)).cast(t))
      }
    val hit: Set[Long] =
      if (refs.subsetOf(partLower.toSet)) {
        // decide per-directory from the typed values: a tiny local job
        // over |partitions| rows, zero table data read
        typedDirs.filter(expr(predicate)).select("__pidx")
          .collect().map(_.getLong(0)).toSet
      } else {
        // typed-to-typed null-safe semi-join against the pruned distinct
        // scan — no string rendering on either side
        val matching = df.filter(expr(predicate))
          .select(partCols.map(col): _*).distinct()
        val cond = partCols.map(c => typedDirs(c) <=> matching(c)).reduce(_ && _)
        typedDirs.join(matching, cond, "left_semi").select("__pidx")
          .collect().map(_.getLong(0)).toSet
      }
    parts.zipWithIndex.collect { case (p, i) if hit(i.toLong) => p }
  }

  private[engine] def partitionFilter(partCols: Seq[String], values: Seq[String]): Column =
    partCols.zip(values).map { case (c, v) =>
      // directory value is a string; === lets Catalyst coerce it to the
      // column's type. The null partition sentinel must test IS NULL —
      // an equality against it can never match.
      if (v == HiveDefaultPartition) col(c).isNull else col(c) === lit(v)
    }.reduce(_ && _)

  /** DELETE FROM <tablePath> WHERE <predicate>; returns rows deleted. */
  def delete(spark: SparkSession, tablePath: String, predicate: String): Long = {
    val df = spark.read.parquet(tablePath)
    val (partCols, parts) = partitionLayout(spark, tablePath)
    def rewrite(slice: DataFrame, dest: String, dropCols: Seq[String]): Long = {
      val obs = Observation()
      val survivors = slice
        .observe(obs, sum(when(expr(predicate), 1L).otherwise(0L)).as("matched"))
        .filter(!expr(predicate))
        .drop(dropCols: _*)
      val staging = s"$dest.__staging"
      survivors.write.mode("overwrite").parquet(staging)
      Fs.swapIn(spark, dest, staging)
      Option(obs.get("matched")).map(_.asInstanceOf[Long]).getOrElse(0L)
    }
    if (partCols.isEmpty) rewrite(df, tablePath, Nil)
    else touchedPartitions(spark, df, partCols, parts, predicate).map {
      case (values, dir) =>
        rewrite(df.filter(partitionFilter(partCols, values)), dir, partCols)
    }.sum
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
    val (partCols, parts) = partitionLayout(spark, tablePath)
    require(!set.keys.exists(k => partCols.exists(_.equalsIgnoreCase(k))),
      s"UPDATE of a partition column is not supported: ${set.keys.mkString(", ")}")
    val cond = expr(predicate)
    def rewrite(slice: DataFrame, dest: String, dropCols: Seq[String]): Long = {
      val projected = slice.columns.filterNot(dropCols.contains).map { c =>
        if (set.contains(c)) when(cond, expr(set(c))).otherwise(col(c)).as(c)
        else col(c)
      }
      val obs = Observation()
      val updated = slice
        .observe(obs, sum(when(cond, 1L).otherwise(0L)).as("matched"))
        .select(projected.toIndexedSeq: _*)
      val staging = s"$dest.__staging"
      updated.write.mode("overwrite").parquet(staging)
      Fs.swapIn(spark, dest, staging)
      Option(obs.get("matched")).map(_.asInstanceOf[Long]).getOrElse(0L)
    }
    if (partCols.isEmpty) rewrite(df, tablePath, Nil)
    else touchedPartitions(spark, df, partCols, parts, predicate).map {
      case (values, dir) =>
        rewrite(df.filter(partitionFilter(partCols, values)), dir, partCols)
    }.sum
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
    *
    * The target-source join is PERSISTED and computed once: the
    * cardinality check reads it, and the single staged write (survivors
    * ∪ inserts) reuses it, with all three counts observed inside that
    * write job — so the reported counts are exactly the written rows
    * even when `source` is nondeterministic across recomputations.
    * (Matched rows stay whole-table COW: which partitions they live in
    * is only known from the join itself, not from a static predicate.)
    */
  def merge(spark: SparkSession, tablePath: String,
      source: DataFrame, onCond: String,
      whenMatched: Seq[WhenMatched],
      whenNotMatchedInsert: Option[Map[String, String]]): (Long, Long, Long) = {
    val target = spark.read.parquet(tablePath)
    val tCols = target.columns.toSeq
    val t = target.withColumn("__tid", monotonically_increasing_id())
    val s = source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, s"s_$c"))
      .withColumn("__smatch", lit(1))
    // `s.x` spellings in conditions/assignments resolve to the renamed cols
    def rewrite(e: String): String = "(?i)\\bs\\.([A-Za-z_]\\w*)".r
      .replaceAllIn(e, m => "s_" + m.group(1))
    val joined = t.join(s, expr(rewrite(onCond)), "full_outer")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val fromTarget = col("__tid").isNotNull
      // SQL-standard cardinality check: no target row may match twice
      val dup = joined.filter(fromTarget && col("__smatch").isNotNull)
        .groupBy(col("__tid")).count().filter(col("count") > 1).limit(1).count()
      if (dup > 0) throw new IllegalStateException(
        "MERGE: one target row matched more than one source row")

      val matched = fromTarget && col("__smatch").isNotNull
      // branch selector: index of the first applicable WHEN MATCHED branch,
      // -1 = no branch applies (row is kept unchanged)
      val branch = whenMatched.zipWithIndex.foldRight(lit(-1): Column) {
        case ((wm, i), alt) =>
          val c = wm.condition.map(c0 => expr(rewrite(c0))).getOrElse(lit(true))
          when(c, lit(i)).otherwise(alt)
      }
      val deletes = whenMatched.zipWithIndex.collect { case (WhenMatched(_, None), i) => i }
      val deleteSet = if (deletes.isEmpty) Seq(-999) else deletes
      val insertable = whenNotMatchedInsert.isDefined
      val withBranch = joined
        .withColumn("__branch", when(matched, branch).otherwise(lit(-1)))
        // -2 marks a source-only row that WHEN NOT MATCHED will insert
        .withColumn("__branch", when(fromTarget, col("__branch"))
          .otherwise(lit(if (insertable) -2 else -999)))
        .filter(col("__branch") =!= -999)
      val obs = Observation()
      val observed = withBranch.observe(obs,
        sum(when(col("__branch") >= 0 && !col("__branch").isInCollection(deleteSet), 1L)
          .otherwise(0L)).as("updated"),
        sum(when(col("__branch").isInCollection(deleteSet), 1L).otherwise(0L)).as("deleted"),
        sum(when(col("__branch") === -2, 1L).otherwise(0L)).as("inserted"))
      val survivorsAndInserts = observed
        .filter(!col("__branch").isInCollection(deleteSet))
        .select(tCols.map { c =>
          val updated = whenMatched.zipWithIndex.foldRight(col(c)) {
            case ((WhenMatched(_, Some(set)), i), alt) if set.contains(c) =>
              when(col("__branch") === i, expr(rewrite(set(c)))).otherwise(alt)
            case (_, alt) => alt
          }
          val value = whenNotMatchedInsert match {
            case Some(ins) => when(col("__branch") === -2,
              expr(rewrite(ins.getOrElse(c, "NULL"))).cast(target.schema(c).dataType))
              .otherwise(updated)
            case None => updated
          }
          value.as(c)
        }: _*)
      val staging = s"$tablePath.__staging"
      // a Hive-layout target must keep its layout through the rewrite —
      // a flat staging write would silently de-partition the table
      val (partCols, _) = partitionLayout(spark, tablePath)
      val w = survivorsAndInserts.write.mode("overwrite")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(staging)
      Fs.swapIn(spark, tablePath, staging)
      def metric(name: String): Long =
        Option(obs.get(name)).map(_.asInstanceOf[Long]).getOrElse(0L)
      (metric("updated"), metric("deleted"), metric("inserted"))
    } finally joined.unpersist()
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
