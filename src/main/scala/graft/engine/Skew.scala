package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling toolbox. First line of defense is AQE's runtime skew-join
  * splitting (on by default in the bench session); explicit salting is for
  * the cases AQE can't fix — aggregations over hot keys and joins where
  * the skewed side must stay co-partitioned across stages.
  *
  * Reference analog: the reference relies on its partitioning handles and
  * scaled writers (`SystemPartitioningHandle`,
  * `ScaledWriterScheduler`); salting is the Spark-idiomatic equivalent
  * the pipeline author applies at the DataFrame level.
  */
object Skew {

  /** Two-phase aggregation over a hot grouping key: group on
    * (key, salt) first, then re-aggregate per key. `partialAggs` must be
    * decomposable (sum/count/min/max style) with a matching `finalAggs`
    * re-combination.
    */
  /** Per-row salt = hash(row content, monotonically_increasing_id).
    * Content alone is retry-stable but maps byte-identical duplicate
    * rows — the canonical hot-key skew shape — to ONE salt bucket,
    * no-opting the salting; the id alone spreads duplicates but is the
    * retry-sensitive part. Mixing both spreads duplicates while the id
    * stays stable in the common salting position (directly over a
    * deterministic scan, where a retried task re-reads the same split in
    * the same order); salting above a nondeterministically-ordered
    * shuffle inherits the id's retry caveat.
    */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64((df.columns.map(col) :+ monotonically_increasing_id()).toIndexedSeq: _*),
      lit(salts))

  def saltedAggregate(
      df: DataFrame,
      key: Column,
      salts: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame =
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col("__key"))
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** Salted broadcast-free join of a skewed fact side against a small-ish
    * dimension: the fact side gets a random salt in [0, salts), the dim
    * side is replicated `salts` times, and the join key becomes
    * (key, salt) — splitting each hot key's rows across `salts` tasks.
    * Use when the dim side is too big to broadcast but small enough to
    * replicate `salts`×.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", rowSalt(fact, salts))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
        saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
