package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed closed-form linear regression — the engine's take on the
  * reference's ml plugin (`plugin/trino-ml/.../MLFunctions.java`,
  * `LearnRegressorAggregation.java`). The reference trains a libsvm
  * model inside an aggregate; here the aggregate accumulates the normal
  * equations (XᵀX, Xᵀy) — sums over rows, so partial aggregation applies
  * and the result is ORDER-INDEPENDENT up to fp rounding, unlike SGD:
  * the learned weights are reproducible and oracle-checkable. The
  * finish step solves the (d+1)×(d+1) system by Gaussian elimination
  * with partial pivoting (intercept = augmented 1-feature).
  *
  * State is O(d²) per group — broadcast-size for any sane feature count;
  * at 100 TB the scan dominates and the aggregation is one map-side
  * combine + tiny final solve.
  */
class LinearRegressorAggregator
    extends Aggregator[(Seq[Double], Double), LinReg.Buf, Seq[Double]] {
  def zero: LinReg.Buf = LinReg.Buf(0, Array.empty, Array.empty)
  def reduce(b: LinReg.Buf, a: (Seq[Double], Double)): LinReg.Buf =
    if (a._1 == null) b else LinReg.add(b, a._1.toArray, a._2)
  def merge(a: LinReg.Buf, b: LinReg.Buf): LinReg.Buf = LinReg.merge(a, b)
  def finish(r: LinReg.Buf): Seq[Double] = LinReg.solve(r)
  def bufferEncoder: Encoder[LinReg.Buf] = Encoders.kryo[LinReg.Buf]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Nearest-centroid classifier (trino-ml `LearnClassifierAggregation` /
  * `classify` analog). Training accumulates per-class (sum, count) —
  * associative, order-independent — so the model (class → mean vector)
  * is deterministic and the oracle can recompute it in SQL; classify is
  * argmin euclidean distance to the centroids.
  */
class NearestCentroidAggregator extends Aggregator[
    (Seq[Double], String), Map[String, (Array[Double], Long)], Map[String, Seq[Double]]] {
  def zero: Map[String, (Array[Double], Long)] = Map.empty
  def reduce(b: Map[String, (Array[Double], Long)], a: (Seq[Double], String)): Map[String, (Array[Double], Long)] = {
    if (a._1 == null || a._2 == null) return b
    val x = a._1
    b.get(a._2) match {
      case Some((s, n)) =>
        var i = 0
        while (i < s.length) { s(i) += x(i); i += 1 }
        b.updated(a._2, (s, n + 1))
      case None => b.updated(a._2, (x.toArray, 1L))
    }
  }
  def merge(a: Map[String, (Array[Double], Long)], b: Map[String, (Array[Double], Long)]): Map[String, (Array[Double], Long)] =
    b.foldLeft(a) { case (acc, (k, (s, n))) =>
      acc.get(k) match {
        case Some((s0, n0)) =>
          var i = 0
          while (i < s0.length) { s0(i) += s(i); i += 1 }
          acc.updated(k, (s0, n0 + n))
        case None => acc.updated(k, (s, n))
      }
    }
  def finish(r: Map[String, (Array[Double], Long)]): Map[String, Seq[Double]] =
    r.map { case (k, (s, n)) => k -> s.map(_ / n).toSeq }
  def bufferEncoder: Encoder[Map[String, (Array[Double], Long)]] =
    Encoders.kryo[Map[String, (Array[Double], Long)]]
  def outputEncoder: Encoder[Map[String, Seq[Double]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Seq[Double]]]()
}

object Centroids {
  def classify(x: Seq[Double], model: Map[String, Seq[Double]]): String = {
    if (x == null || model == null || model.isEmpty) return null
    var bestLabel: String = null
    var bestDist = Double.MaxValue
    model.foreach { case (label, c) =>
      var d = 0.0
      var i = 0
      while (i < x.length) { val t = x(i) - c(i); d += t * t; i += 1 }
      if (d < bestDist || (d == bestDist && (bestLabel == null || label < bestLabel))) {
        bestDist = d; bestLabel = label
      }
    }
    bestLabel
  }
}

object LinReg {
  /** d = augmented dimension (features + intercept); xtx is the packed
    * upper triangle row-major, xty the augmented right-hand side.
    */
  final case class Buf(d: Int, xtx: Array[Double], xty: Array[Double])

  private def init(d: Int): Buf = Buf(d, new Array[Double](d * d), new Array[Double](d))

  def add(b0: Buf, x: Array[Double], y: Double): Buf = {
    val d = x.length + 1
    val b = if (b0.d == 0) init(d) else b0
    require(b.d == d, s"feature dimension changed: ${b.d - 1} vs ${x.length}")
    val xa = new Array[Double](d)
    System.arraycopy(x, 0, xa, 0, x.length)
    xa(d - 1) = 1.0 // intercept column
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { b.xtx(i * d + j) += xa(i) * xa(j); j += 1 }
      b.xty(i) += xa(i) * y
      i += 1
    }
    b
  }

  def merge(a: Buf, b: Buf): Buf =
    if (a.d == 0) b
    else if (b.d == 0) a
    else {
      require(a.d == b.d, s"feature dimension mismatch: ${a.d} vs ${b.d}")
      var i = 0
      while (i < a.xtx.length) { a.xtx(i) += b.xtx(i); i += 1 }
      i = 0
      while (i < a.d) { a.xty(i) += b.xty(i); i += 1 }
      a
    }

  /** Gaussian elimination with partial pivoting on [XᵀX | Xᵀy]. */
  def solve(b: Buf): Seq[Double] = {
    val d = b.d
    if (d == 0) return Seq.empty
    val m = Array.tabulate(d)(i => Array.tabulate(d + 1)(j =>
      if (j < d) b.xtx(i * d + j) else b.xty(i)))
    var col = 0
    while (col < d) {
      var piv = col
      var r = col + 1
      while (r < d) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      val t = m(col); m(col) = m(piv); m(piv) = t
      require(math.abs(m(col)(col)) > 1e-12, "singular design matrix")
      r = col + 1
      while (r < d) {
        val f = m(r)(col) / m(col)(col)
        var j = col
        while (j <= d) { m(r)(j) -= f * m(col)(j); j += 1 }
        r += 1
      }
      col += 1
    }
    val w = new Array[Double](d)
    var i = d - 1
    while (i >= 0) {
      var s = m(i)(d)
      var j = i + 1
      while (j < d) { s -= m(i)(j) * w(j); j += 1 }
      w(i) = s / m(i)(i)
      i -= 1
    }
    w.toSeq // weights ++ intercept (last element)
  }

  /** regress(features, model): dot(features, weights) + intercept. */
  def predict(x: Seq[Double], model: Seq[Double]): java.lang.Double = {
    if (x == null || model == null || model.length != x.length + 1) return null
    var s = model.last
    var i = 0
    while (i < x.length) { s += x(i) * model(i); i += 1 }
    java.lang.Double.valueOf(s)
  }
}
