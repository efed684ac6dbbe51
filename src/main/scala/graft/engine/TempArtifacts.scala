package graft.engine

import org.apache.spark.sql.SparkSession

/** Registry for filesystem/catalog artifacts a query body creates as part
  * of its own plan — round-trip temp parquet dirs, `graft_*` temp views,
  * and the persisted `graft_idx_*` index tables.
  *
  * Same contract as [[CachedPlans]]: a query entry must stay LAZY for the
  * driver contract, so the body cannot delete what its returned plan still
  * reads — it never sees the action. The body registers here and the
  * RUNNERS (Verify / Bench / soaks) call [[cleanupAll]] after
  * materializing each query, so repeated Verify/bench invocations do not
  * leave the box dirtier each run (r8 verdict: /tmp dirs and
  * `graft_sketch*`/`graft_idx*` entries accumulated per invocation).
  *
  * Catalog TABLES (the bucketed index store) are deliberately NOT dropped
  * by default: `dedup_incremental_indexed`'s build/consume split means a
  * later invocation may legitimately read a store built by an earlier one,
  * and `Writer.writeBucketed` already drops-and-recreates on rebuild. They
  * are tracked so [[cleanupAll]](dropTables = true) — used by Verify at
  * session end — can clear them.
  */
object TempArtifacts {
  private val dirs = scala.collection.mutable.ArrayBuffer[String]()
  private val views = scala.collection.mutable.ArrayBuffer[String]()
  private val tables = scala.collection.mutable.ArrayBuffer[String]()

  /** Create and track a fresh temp directory; returns its path. */
  def dir(prefix: String): String = synchronized {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    dirs += p
    p
  }

  /** Track a temp view name for later drop; returns the name unchanged. */
  def view(name: String): String = synchronized { views += name; name }

  /** Track a catalog table name for later (opt-in) drop. */
  def table(name: String): String = synchronized { tables += name; name }

  private def deleteRecursively(path: java.io.File): Unit = {
    val children = path.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    path.delete(): Unit
  }

  /** Delete tracked temp dirs and drop tracked temp views (and, when
    * `dropTables`, tracked catalog tables). Idempotent; failures are
    * swallowed — cleanup must never fail a green run.
    */
  def cleanupAll(spark: SparkSession, dropTables: Boolean = false): Unit =
    synchronized {
      dirs.foreach(d =>
        try deleteRecursively(new java.io.File(d)) catch { case _: Throwable => () })
      dirs.clear()
      views.foreach(v =>
        try { spark.catalog.dropTempView(v); () } catch { case _: Throwable => () })
      if (views.nonEmpty) {
        // defense in depth for view-name collisions: if a tracked view
        // shadowed a registered base table, dropping it above removed the
        // base view too — invalidate the registration cache so the next
        // Tables.sql re-registers instead of trusting `registeredDir`
        Tables.invalidateRegistration(spark)
      }
      views.clear()
      if (dropTables) {
        tables.foreach(t =>
          try spark.sql(s"DROP TABLE IF EXISTS $t") catch { case _: Throwable => () })
        tables.clear()
      }
    }
}
