package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch — the engine's qdigest/tdigest analog
  * (reference: `QuantileDigestAggregationFunction.java`,
  * `TDigestAggregationFunction.java`, scalar readers in
  * `operator/scalar/QuantileDigestFunctions.java`). Semantic, not wire,
  * compatibility (SURVEY §7).
  *
  * Representation: a fixed base-1.01 log-scale histogram over
  * |value|, with sign split — giving ~1% relative value error for any
  * quantile, independent of distribution. The state is a dense long
  * vector, so merge is element-wise addition: partial aggregation
  * (map-side combine) applies and per-group shuffle state is O(32 KiB)
  * regardless of input cardinality — the property that matters at 100 TB.
  */
object QuantileSketch extends Serializable {
  // 4096 log1.01 buckets span |v| up to 1.01^2047 ≈ 6.9e8 at ~1% relative
  // error; 32 KiB of state per group
  val Buckets = 4096
  private val HalfB = Buckets / 2
  private val LogBase = math.log(1.01)
  // value→bucket: [0, HalfB) negative values (descending |v|), HalfB = zero,
  // (HalfB, Buckets) positive; |v| mapped by floor(log1.01(1+|v|)) capped
  def bucketOf(v: Double): Int = {
    val mag = math.min(HalfB - 1, math.floor(math.log1p(math.abs(v)) / LogBase).toInt)
    if (v >= 0) HalfB + mag else HalfB - 1 - mag
  }
  /** Representative value (bucket lower edge). */
  def valueOf(bucket: Int): Double = {
    val mag = if (bucket >= HalfB) bucket - HalfB else HalfB - 1 - bucket
    val v = math.expm1(mag * LogBase)
    if (bucket >= HalfB) v else -v
  }

  /** Bucket edges in ascending VALUE order (negative buckets flip). */
  def lowerOf(b: Int): Double =
    if (b >= HalfB) math.expm1((b - HalfB) * LogBase)
    else -math.expm1((HalfB - b) * LogBase)
  def upperOf(b: Int): Double =
    if (b >= HalfB) math.expm1((b - HalfB + 1) * LogBase)
    else -math.expm1((HalfB - 1 - b) * LogBase)

  /** Interpolated quantile: locate the bucket holding the target rank,
    * then linearly interpolate by rank position within the bucket — the
    * same read-side refinement the reference's tdigest applies
    * (`TDigestFunctions.java` valueAt), vs the round-1 lower-edge answer
    * whose error was a full bucket width.
    */
  def valueAtQuantile(counts: Array[Long], q: Double): Double = {
    val total = counts.sum
    if (total == 0) return Double.NaN
    val target = math.max(1L, math.ceil(q * total).toLong)
    var acc = 0L
    var i = 0
    while (i < counts.length) {
      if (acc + counts(i) >= target) {
        val frac = (target - acc - 0.5) / counts(i).toDouble
        val lo = lowerOf(i); val hi = upperOf(i)
        return lo + math.max(0.0, math.min(1.0, frac)) * (hi - lo)
      }
      acc += counts(i)
      i += 1
    }
    valueOf(counts.length - 1)
  }
}

/** qdigest_agg(x): build the sketch from doubles. */
class QuantileSketchAggregator extends Aggregator[Double, Array[Long], Array[Long]] {
  def zero: Array[Long] = new Array[Long](QuantileSketch.Buckets)
  def reduce(b: Array[Long], a: Double): Array[Long] = {
    b(QuantileSketch.bucketOf(a)) += 1; b
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: Encoder[Array[Long]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** merge_qdigest(sketch): re-aggregate previously built sketches. */
class QuantileSketchMergeAggregator extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  def zero: Array[Long] = new Array[Long](QuantileSketch.Buckets)
  def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
    if (a != null) { var i = 0; while (i < b.length) { b(i) += a(i); i += 1 } }
    b
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: Encoder[Array[Long]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
