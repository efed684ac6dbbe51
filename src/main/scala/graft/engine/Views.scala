package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** View / materialized-view emulation over the parquet catalog
  * (reference: `#createView` / `#createMaterializedView` /
  * `RefreshMaterializedViewOperator`, grammar `SqlBase.g4:80-90`). Spark
  * has no MV object, so the semantics are implemented the way a warehouse
  * would on top of it:
  *   - logical view  = named SQL plan, re-expanded at every use
  *   - materialized view = the plan's result persisted as parquet and
  *     registered as a scan; queries hit the files, not the plan
  *   - refresh = recompute + atomically swap (write to a staging dir,
  *     then move — parquet overwrite-in-place would let readers see a
  *     half-written table)
  *
  * Scale note: the MV write is a distributed parquet write (same path as
  * any sink); refresh cost is the view query itself, storage is columnar.
  */
object Views {

  /** CREATE VIEW name AS query — logical, always-fresh. */
  def createView(spark: SparkSession, dir: String, name: String, query: String): Unit =
    Tables.sql(spark, dir, query).createOrReplaceTempView(name)

  private def storagePath(storageDir: String, name: String) = s"$storageDir/$name"

  /** CREATE MATERIALIZED VIEW name AS query, persisted under
    * `storageDir/name` and registered as a temp view over the files.
    * `partitionBy` lays the MV out Hive-style, which is what makes
    * partition-scoped refresh possible.
    */
  def createMaterializedView(
      spark: SparkSession, dir: String, name: String, query: String,
      storageDir: String, partitionBy: Seq[String] = Nil): Unit = {
    val path = storagePath(storageDir, name)
    val w = Tables.sql(spark, dir, query).write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    spark.read.parquet(path).createOrReplaceTempView(name)
  }

  /** REFRESH MATERIALIZED VIEW: recompute into a staging directory, swap,
    * re-register. Readers holding the old DataFrame keep the old files
    * until the swap's delete (best-effort local semantics; an object
    * store would version instead).
    */
  def refreshMaterializedView(
      spark: SparkSession, dir: String, name: String, query: String,
      storageDir: String): Unit = {
    val path = storagePath(storageDir, name)
    val staging = s"$path.__staging"
    Tables.sql(spark, dir, query).write.mode("overwrite").parquet(staging)
    Fs.swapIn(spark, path, staging)
    spark.read.parquet(path).createOrReplaceTempView(name)
  }

  /** INCREMENTAL refresh: recompute only the MV slice selected by
    * `predicate` (over the view query's output columns) and swap only
    * the partition directories that slice can live in — everything else
    * keeps its files untouched. This is the partition-scoped refresh a
    * real 100 TB deployment runs nightly ("refresh day X"): the view
    * query executes with the predicate pushed into it, so Catalyst
    * prunes the SOURCE scan too, and the rewrite cost is proportional to
    * the refreshed slice, not the view.
    *
    * The predicate must reference only the MV's partition columns (the
    * reference's full-rebuild `RefreshMaterializedViewOperator.java:151`
    * has no such scoping; this is parity-plus). Partitions the fresh
    * slice no longer produces are rewritten empty; brand-new partitions
    * are created. Returns the number of partition directories touched.
    */
  def refreshMaterializedViewPartitions(
      spark: SparkSession, dir: String, name: String, query: String,
      storageDir: String, predicate: String): Long = {
    import org.apache.spark.sql.functions._
    val path = storagePath(storageDir, name)
    val (partCols, parts) = Dml.partitionLayout(spark, path)
    require(partCols.nonEmpty,
      s"partition-scoped refresh needs a partitionBy'd materialized view: $name")
    // enforce the documented contract: a predicate on a data column would
    // rewrite each touched partition with ONLY the predicate-matching
    // rows, silently deleting every other row of that partition
    val refs = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(predicate).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.last.toLowerCase
      }.toSet
    require(refs.subsetOf(partCols.map(_.toLowerCase).toSet),
      s"partition-scoped refresh predicate must reference only partition " +
        s"columns ${partCols.mkString("[", ", ", "]")}; got: $predicate")
    val fresh = Tables.sql(spark, dir, query).filter(expr(predicate))
    // on-disk partitions the predicate covers (values-only decision) ∪
    // partitions the fresh slice produces (covers brand-new ones)
    val disk = Dml.touchedPartitions(spark, fresh, partCols, parts, predicate)
      .map(_._1)
    val produced = fresh.select(partCols.map(col): _*).distinct()
      .collect().map(_.toSeq.map(String.valueOf).toSeq).toSeq
    val touched = (disk ++ produced).distinct
    touched.foreach { values =>
      val dest = path + "/" + partCols.zip(values)
        .map { case (c, v) => s"$c=$v" }.mkString("/")
      val staging = s"$dest.__staging"
      fresh.filter(Dml.partitionFilter(partCols, values))
        .drop(partCols: _*)
        .write.mode("overwrite").parquet(staging)
      Fs.swapIn(spark, dest, staging)
    }
    spark.read.parquet(path).createOrReplaceTempView(name)
    touched.length.toLong
  }
}
