package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** t-digest proper (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", arXiv:1902.04023) — the reference's tdigest
  * type (`core/trino-main/.../operator/aggregation/
  * TDigestAggregationFunction.java`, `TDigestFunctions.java`; the
  * companion qdigest lives in `QDigest.scala` with its deterministic
  * rank bound — tdigest trades that for tail-concentrated accuracy).
  * Centroid sizes follow the k₁ scale function k(q) = δ/(2π)·asin(2q−1):
  * tail centroids hold O(1) points, so relative error CONCENTRATES AT THE
  * TAILS (p99/p999), which is what distinguishes tdigest from an
  * equi-width histogram.
  *
  * Scale note: state is ≤ ~2δ centroids (δ=100 → ≤ 1.6 KiB), merge is
  * associative-in-distribution (merging digests = merging their centroid
  * multisets + recompress) — partial aggregation applies, shuffle carries
  * one digest per group.
  */
object TDigest {
  val Compression = 100.0

  /** Serialized layout: [int n][n × (double mean, double weight)]. */
  def serialize(means: Array[Double], weights: Array[Double], n: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }

  def parse(d: Array[Byte]): (Array[Double], Array[Double]) = {
    val bb = java.nio.ByteBuffer.wrap(d)
    val n = bb.getInt()
    val means = new Array[Double](n); val weights = new Array[Double](n)
    var i = 0
    while (i < n) { means(i) = bb.getDouble(); weights(i) = bb.getDouble(); i += 1 }
    (means, weights)
  }

  /** Mutable build state: unsorted point/centroid buffer, compressed on
    * overflow with the merging-digest pass.
    */
  final class Builder(val compression: Double) extends Serializable {
    private val cap = (32 * compression).toInt
    var means = new Array[Double](cap + 16)
    var weights = new Array[Double](cap + 16)
    var n = 0

    def add(x: Double, w: Double = 1.0): Unit = {
      if (n >= cap) compress()
      means(n) = x; weights(n) = w; n += 1
    }

    def addAll(other: Builder): Unit = {
      var i = 0
      while (i < other.n) { add(other.means(i), other.weights(i)); i += 1 }
    }

    /** k₁ scale function and its inverse — centroid weight bound comes
      * from the k-size invariant |k(q₁) − k(q₀)| ≤ 1.
      */
    private def k(q: Double): Double =
      compression / (2 * math.Pi) * math.asin(2 * math.min(math.max(q, 0.0), 1.0) - 1)
    private def kInv(y: Double): Double =
      if (y >= compression / 4) 1.0 // k(1) = δ/4; sin past π/2 would fold back
      else (math.sin(y * 2 * math.Pi / compression) + 1) / 2

    def compress(): Unit = {
      if (n == 0) return
      // sort (mean, weight) pairs by mean
      val idx = (0 until n).sortBy(i => means(i))
      val sm = idx.map(means).toArray
      val sw = idx.map(weights).toArray
      val total = sw.sum
      val om = new Array[Double](means.length)
      val ow = new Array[Double](weights.length)
      var on = 0
      var accMean = sm(0); var accW = sw(0); var soFar = 0.0
      var i = 1
      while (i < n) {
        val qRight = kInv(k(soFar / total) + 1.0) // furthest q this centroid may span
        if ((soFar + accW + sw(i)) / total <= qRight + 1e-12) {
          // merge into the accumulating centroid (weighted mean)
          val wNew = accW + sw(i)
          accMean += (sm(i) - accMean) * sw(i) / wNew
          accW = wNew
        } else {
          om(on) = accMean; ow(on) = accW; on += 1
          soFar += accW
          accMean = sm(i); accW = sw(i)
        }
        i += 1
      }
      om(on) = accMean; ow(on) = accW; on += 1
      System.arraycopy(om, 0, means, 0, on)
      System.arraycopy(ow, 0, weights, 0, on)
      n = on
    }

    def result(): Array[Byte] = {
      compress()
      serialize(means, weights, n)
    }
  }

  /** Quantile from a serialized digest: linear interpolation between
    * centroid midpoints (the reference's AVL/merging digest estimator).
    */
  def valueAtQuantile(d: Array[Byte], q: Double): Double = {
    val (means, weights) = parse(d)
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val total = weights.sum
    val target = q * total
    // cumulative weight at centroid midpoints
    var cum = 0.0
    var i = 0
    while (i < n) {
      val mid = cum + weights(i) / 2
      if (target < mid) {
        if (i == 0) return means(0)
        val prevMid = cum - weights(i - 1) / 2
        val frac = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + frac * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val bld = new Builder(Compression)
    val (ma, wa) = parse(a); val (mb, wb) = parse(b)
    var i = 0
    while (i < ma.length) { bld.add(ma(i), wa(i)); i += 1 }
    i = 0
    while (i < mb.length) { bld.add(mb(i), wb(i)); i += 1 }
    bld.result()
  }
}

/** tdigest_agg(x): build a t-digest over doubles (nulls ignored). */
class TDigestAggregator extends Aggregator[java.lang.Double, TDigest.Builder, Array[Byte]] {
  def zero: TDigest.Builder = new TDigest.Builder(TDigest.Compression)
  def reduce(b: TDigest.Builder, a: java.lang.Double): TDigest.Builder = {
    if (a != null) b.add(a.doubleValue())
    b
  }
  def merge(a: TDigest.Builder, b: TDigest.Builder): TDigest.Builder = { a.addAll(b); a }
  def finish(r: TDigest.Builder): Array[Byte] = r.result()
  def bufferEncoder: Encoder[TDigest.Builder] = Encoders.kryo[TDigest.Builder]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** merge_tdigest(digest): rollup previously built digests. */
class TDigestMergeAggregator extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  def zero: Array[Byte] = TDigest.serialize(Array.empty, Array.empty, 0)
  def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
    if (a == null) b else TDigest.merge(b, a)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = TDigest.merge(a, b)
  def finish(r: Array[Byte]): Array[Byte] = r
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
