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

/** approx_set(x): HLL sketch over any input rendered to string. */
class HllAggregator extends Aggregator[String, Array[Byte], Array[Byte]] {
  def zero: Array[Byte] = Hll.empty
  def reduce(b: Array[Byte], a: String): Array[Byte] = {
    if (a != null) Hll.add(b, Hashing.fnv64Seeded(a, 0x5bd1e995L))
    b
  }
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
  def finish(r: Array[Byte]): Array[Byte] = r
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** approx_set_agg_long(x): HLL over bigint without the String round-trip
  * (the round-1 hot path allocated a string per row and hashed UTF-8;
  * here the key is avalanched directly — splitmix64 finalizer).
  */
class HllLongAggregator extends Aggregator[Long, Array[Byte], Array[Byte]] {
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  def zero: Array[Byte] = Hll.empty
  def reduce(b: Array[Byte], a: Long): Array[Byte] = { Hll.add(b, mix(a)); b }
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
  def finish(r: Array[Byte]): Array[Byte] = r
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** merge(hll): re-aggregate previously built sketches (rollup path —
  * reference `MergeHyperLogLogAggregation.java`).
  */
class HllMergeAggregator extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  def zero: Array[Byte] = Hll.empty
  def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
    if (a == null) b else Hll.merge(b, a)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
  def finish(r: Array[Byte]): Array[Byte] = r
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

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
  * overloads (`MinMaxNAggregations`) — bounded top-n kept sorted in the
  * buffer, so shuffle state is O(n) per group regardless of input size.
  */
class MinNAggregator extends Aggregator[(java.lang.Double, Int), (Int, Vector[Double]), Seq[Double]] {
  def zero: (Int, Vector[Double]) = (0, Vector.empty)
  def reduce(b: (Int, Vector[Double]), a: (java.lang.Double, Int)): (Int, Vector[Double]) = {
    if (a._1 == null) return b // SQL aggregates ignore nulls
    val v = a._1.doubleValue()
    val n = if (b._1 > 0) b._1 else math.max(a._2, 1)
    val idx = b._2.indexWhere(_ > v)
    val ins = if (idx < 0) b._2 :+ v else (b._2.take(idx) :+ v) ++ b._2.drop(idx)
    (n, ins.take(n))
  }
  def merge(a: (Int, Vector[Double]), b: (Int, Vector[Double])): (Int, Vector[Double]) = {
    val n = math.max(a._1, b._1)
    if (n == 0) (0, Vector.empty)
    else (n, (a._2 ++ b._2).sorted.take(n))
  }
  def finish(r: (Int, Vector[Double])): Seq[Double] = r._2
  def bufferEncoder: Encoder[(Int, Vector[Double])] = Encoders.kryo[(Int, Vector[Double])]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

class MaxNAggregator extends Aggregator[(java.lang.Double, Int), (Int, Vector[Double]), Seq[Double]] {
  def zero: (Int, Vector[Double]) = (0, Vector.empty)
  def reduce(b: (Int, Vector[Double]), a: (java.lang.Double, Int)): (Int, Vector[Double]) = {
    if (a._1 == null) return b // SQL aggregates ignore nulls
    val v = a._1.doubleValue()
    val n = if (b._1 > 0) b._1 else math.max(a._2, 1)
    val idx = b._2.indexWhere(_ < v)
    val ins = if (idx < 0) b._2 :+ v else (b._2.take(idx) :+ v) ++ b._2.drop(idx)
    (n, ins.take(n))
  }
  def merge(a: (Int, Vector[Double]), b: (Int, Vector[Double])): (Int, Vector[Double]) = {
    val n = math.max(a._1, b._1)
    if (n == 0) (0, Vector.empty)
    else (n, (a._2 ++ b._2).sorted(Ordering[Double].reverse).take(n))
  }
  def finish(r: (Int, Vector[Double])): Seq[Double] = r._2
  def bufferEncoder: Encoder[(Int, Vector[Double])] = Encoders.kryo[(Int, Vector[Double])]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

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
