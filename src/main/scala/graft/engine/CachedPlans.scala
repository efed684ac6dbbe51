package graft.engine

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames a query body persists as part of its own plan
  * (e.g. `graph_pagerank` materializes the near-dup edge list once so the
  * iterative join does not re-execute the pair join per iteration — the
  * production edge-list-checkpoint shape).
  *
  * A query entry must stay LAZY for the driver contract, so the query
  * itself cannot unpersist after its action — it never sees the action.
  * Instead the body registers its persisted inputs here and the RUNNERS
  * (Verify / Bench / soaks) call [[releaseAll]] after materializing each
  * query, so a long-lived shared session does not accumulate executor
  * memory/disk from cached edge lists (r7 advice). Spark's CacheManager
  * already dedupes identical plans, so double-tracking the same plan
  * across invocations costs one entry; releaseAll is idempotent.
  */
object CachedPlans {
  private val tracked = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Track a persisted DataFrame for later release; returns it unchanged. */
  def track(df: DataFrame): DataFrame = synchronized { tracked += df; df }

  /** Unpersist every tracked plan (blocking=false: async cleanup is fine —
    * the point is dropping the CacheManager entry, not fencing IO).
    */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    tracked.clear()
  }
}
