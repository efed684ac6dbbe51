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
    */
  def createMaterializedView(
      spark: SparkSession, dir: String, name: String, query: String,
      storageDir: String): Unit = {
    val path = storagePath(storageDir, name)
    Tables.sql(spark, dir, query).write.mode("overwrite").parquet(path)
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
}
