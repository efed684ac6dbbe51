package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** HyperLogLog sketch-as-a-value, the analog of the reference's
  * `HyperLogLog` type + `approx_set`/`merge`/`cardinality`
  * (`core/trino-spi/.../type/HyperLogLogType.java`,
  * `operator/aggregation/ApproximateSetAggregation.java`,
  * `operator/scalar/HyperLogLogFunctions.java`). Semantic — not wire —
  * compatibility (SURVEY §7). Dense layout only: p=12 → 4096 registers,
  * 4 KiB per group; standard error ≈ 1.04/√4096 ≈ 1.6 %.
  *
  * Scale note: the sketch is a fixed-size byte array merged associatively,
  * so partial aggregation (map-side combine) applies and shuffle traffic
  * per group is O(4 KiB) regardless of input cardinality.
  */
object Hll {
  val P = 12
  val M = 1 << P // 4096 registers

  def empty: Array[Byte] = new Array[Byte](M)

  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    val rest = hash << P
    val rank = (if (rest == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    out
  }

  /** Register-max merge of `b` into `a` — the partial-agg hot path. */
  def mergeInPlace(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def cardinality(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += 1.0 / (1L << (regs(i) & 0xff)).toDouble
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * M * M / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }
}

// approx_set_agg / approx_set_agg_long / merge_hll are registered as
// TypedImperativeAggregates over the raw column (no per-row String render)
// — see `org.apache.spark.sql.graft.HllAgg`.

/** Space-saving top-k (reference `ApproximateMostFrequentHistogram.java`).
  * With `capacity` ≥ true distinct count the counts are EXACT — the
  * correctness suite exploits that; at 100 TB the fixed capacity bounds
  * state per group to O(capacity) with the classic ±(n/capacity) error.
  */
object SpaceSaving {
  /** In-place per-row update on a mutable buffer: O(1) for seen keys, one
    * O(capacity) min-scan only on eviction, zero per-row allocation (the
    * round-2 immutable buffer rebuilt a persistent Map per evicting row).
    */
  def reduceMut(m: mutable.HashMap[String, Long], a: String, capacity: Int): mutable.HashMap[String, Long] = {
    if (a == null) return m
    val cur = m.getOrElse(a, -1L)
    if (cur >= 0L) m.update(a, cur + 1L)
    else if (m.size < capacity) m.update(a, 1L)
    else {
      var minK: String = null; var minV = Long.MaxValue
      m.foreach { case (k, v) => if (v < minV) { minK = k; minV = v } }
      m.remove(minK); m.update(a, minV + 1L)
    }
    m
  }

  def reduce(b: Map[String, Long], a: String, capacity: Int): Map[String, Long] = {
    if (a == null) return b
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1)
      case None if b.size < capacity => b.updated(a, 1L)
      case None =>
        val (minK, minV) = b.minBy(_._2)
        (b - minK).updated(a, minV + 1)
    }
  }

  /** Classic mergeable-summaries merge: a key absent from a saturated side
    * may have been counted up to that side's minimum, so the absent side
    * contributes its min as an offset — keeps the overestimate invariant
    * (±n/capacity) across merges instead of silently dropping mass.
    */
  def merge(a: Map[String, Long], b: Map[String, Long], capacity: Int): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val minA = if (a.size < capacity) 0L else a.values.min
    val minB = if (b.size < capacity) 0L else b.values.min
    val m = mutable.Map.empty[String, Long]
    a.foreach { case (k, v) => m.update(k, v + b.getOrElse(k, minB)) }
    b.foreach { case (k, v) => if (!a.contains(k)) m.update(k, v + minA) }
    if (m.size <= capacity) m.toMap
    else m.toSeq.sortBy { case (k, v) => (-v, k) }.take(capacity).toMap
  }
}

class SpaceSavingAggregator(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty
  def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] =
    SpaceSaving.reduceMut(b, a, capacity)
  def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    mutable.HashMap.from(SpaceSaving.merge(a.toMap, b.toMap, capacity))
  def finish(r: mutable.HashMap[String, Long]): Map[String, Long] = r.toMap
  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

/** min_n(x, n) / max_n(x, n): the reference's `min(x, n)`/`max(x, n)`
  * overloads (`MinMaxNAggregations`) — bounded top-n kept sorted in a
  * primitive array (UnsafeRow-encoded tuple buffer, no kryo), so shuffle
  * state is O(n) per group regardless of input size. Per-row update is a
  * binary search + arraycopy shift into the SAME array (the r2/r3 version
  * rebuilt an immutable Vector per row); a value past the current n-th
  * bound is rejected in O(log n) with zero writes.
  *
  * `asc = true` keeps the n smallest (ascending), `asc = false` the n
  * largest (descending).
  */
abstract class BoundedNAggregator(asc: Boolean)
    extends Aggregator[(java.lang.Double, Int), (Int, Int, Array[Double]), Seq[Double]] {
  // buffer = (n, size, sorted values in preference order, capacity n)
  def zero: (Int, Int, Array[Double]) = (0, 0, Array.emptyDoubleArray)

  @inline private def key(v: Double): Double = if (asc) v else -v

  def reduce(b: (Int, Int, Array[Double]), a: (java.lang.Double, Int)): (Int, Int, Array[Double]) = {
    if (a._1 == null) return b // SQL aggregates ignore nulls
    val v = key(a._1.doubleValue())
    val n = if (b._1 > 0) b._1 else math.max(a._2, 1)
    var size = b._2
    val arr = if (b._3.length >= n) b._3 else java.util.Arrays.copyOf(b._3, n)
    if (size == n && v >= arr(n - 1)) return (n, size, arr) // reject, no shift
    var idx = java.util.Arrays.binarySearch(arr, 0, size, v)
    if (idx < 0) idx = -idx - 1
    val last = if (size < n) size else n - 1
    if (last > idx) System.arraycopy(arr, idx, arr, idx + 1, last - idx)
    arr(idx) = v
    if (size < n) size += 1
    (n, size, arr)
  }

  def merge(a: (Int, Int, Array[Double]), b: (Int, Int, Array[Double])): (Int, Int, Array[Double]) = {
    val n = math.max(a._1, b._1)
    if (n == 0) return zero
    val out = new Array[Double](n)
    var i = 0; var j = 0; var k = 0
    while (k < n && (i < a._2 || j < b._2)) {
      val takeA = j >= b._2 || (i < a._2 && a._3(i) <= b._3(j))
      if (takeA) { out(k) = a._3(i); i += 1 } else { out(k) = b._3(j); j += 1 }
      k += 1
    }
    (n, k, out)
  }

  def finish(r: (Int, Int, Array[Double])): Seq[Double] =
    (0 until r._2).map(i => if (asc) r._3(i) else -r._3(i))

  def bufferEncoder: Encoder[(Int, Int, Array[Double])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, Int, Array[Double])]()
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

class MinNAggregator extends BoundedNAggregator(asc = true)
class MaxNAggregator extends BoundedNAggregator(asc = false)

/** approx_most_frequent(value, k): parameterized-capacity variant
  * (reference `ApproximateMostFrequentHistogram.java` takes the bucket
  * count as a call argument; k is constant per call, read off the rows).
  */
class SpaceSavingKAggregator
    extends Aggregator[(String, Int), (Int, mutable.HashMap[String, Long]), Map[String, Long]] {
  def zero: (Int, mutable.HashMap[String, Long]) = (0, mutable.HashMap.empty)
  def reduce(b: (Int, mutable.HashMap[String, Long]), a: (String, Int)): (Int, mutable.HashMap[String, Long]) = {
    val cap = if (b._1 > 0) b._1 else math.max(a._2, 1)
    (cap, SpaceSaving.reduceMut(b._2, a._1, cap))
  }
  def merge(a: (Int, mutable.HashMap[String, Long]), b: (Int, mutable.HashMap[String, Long])): (Int, mutable.HashMap[String, Long]) = {
    val cap = math.max(a._1, b._1)
    if (cap == 0) (0, mutable.HashMap.empty)
    else (cap, mutable.HashMap.from(SpaceSaving.merge(a._2.toMap, b._2.toMap, cap)))
  }
  def finish(r: (Int, mutable.HashMap[String, Long])): Map[String, Long] = r._2.toMap
  def bufferEncoder: Encoder[(Int, mutable.HashMap[String, Long])] =
    Encoders.kryo[(Int, mutable.HashMap[String, Long])]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
