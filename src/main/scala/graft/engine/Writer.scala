package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink-side layout control — the TableWriterOperator analog
  * (`core/trino-main/.../operator/TableWriterOperator.java:64`; the
  * reference scales writer parallelism in `ScaledWriterScheduler`).
  * At 100 TB the write layout IS the read performance of every downstream
  * query: partition columns drive partition pruning, bucketing pre-shuffles
  * for co-located joins, and file sizing bounds task counts.
  */
object Writer {

  /** Hive-style partitioned parquet write with per-partition file-count
    * control: repartition by the partition columns first so each output
    * partition is written by a bounded number of tasks (avoids the
    * many-small-files failure mode of naive partitioned writes).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(
        math.max(1, filesPerPartition * 8),
        partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed managed table: pre-shuffles on the bucket key at write time
    * so equi-joins/aggregations on that key skip their exchange at read
    * time (the reference's fixed `BucketPartitionFunction` analog).
    * Requires a warehouse-backed catalog (saveAsTable).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }
}
