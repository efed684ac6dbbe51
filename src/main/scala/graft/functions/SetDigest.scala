package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SetDigest: a mergeable set sketch combining an HLL (cardinality) with a
  * bottom-k minhash (similarity) — the analog of the reference's SetDigest
  * type and its function family (`core/trino-main/.../type/setdigest/
  * SetDigest.java`, `SetDigestFunctions.java`: make_set_digest,
  * merge_set_digest, cardinality, intersection_cardinality, jaccard_index).
  * Semantic — not wire — compatibility, like the HLL sketch (SURVEY §7).
  *
  * Layout: [int32 k][int32 m][m sorted int64 minima][4096 HLL registers].
  * Bottom-k (k-minimum-values) rather than k independent permutations: one
  * hash per element, the k smallest retained — mergeable by multiset-union
  * + re-truncate, and the Jaccard estimator |bottomK(A∪B) ∩ A ∩ B| / k is
  * unbiased (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002 — the same KMV family the reference's minhash uses).
  *
  * Scale note: fixed k=512 + 4 KiB HLL ⇒ ≤ 8.2 KiB per group regardless of
  * input cardinality; partial aggregation applies (associative,
  * commutative merge), so the shuffle carries one digest per group.
  */
object SetDigest {
  val K = 512
  private val HLL_M = Hll.M

  def empty: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + HLL_M)
    bb.putInt(K); bb.putInt(0)
    bb.array()
  }

  /** (k, minima, hllRegisters) view of a serialized digest. */
  def parse(d: Array[Byte]): (Int, Array[Long], Array[Byte]) = {
    val bb = java.nio.ByteBuffer.wrap(d)
    val k = bb.getInt(); val m = bb.getInt()
    val mins = new Array[Long](m)
    var i = 0
    while (i < m) { mins(i) = bb.getLong(); i += 1 }
    val hll = new Array[Byte](HLL_M)
    bb.get(hll)
    (k, mins, hll)
  }

  def serialize(k: Int, mins: Array[Long], hll: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * mins.length + HLL_M)
    bb.putInt(k); bb.putInt(mins.length)
    var i = 0
    while (i < mins.length) { bb.putLong(mins(i)); i += 1 }
    bb.put(hll)
    bb.array()
  }

  /** Mutable build state: bounded sorted minima + HLL registers. */
  final class Builder(val k: Int) extends Serializable {
    var mins: Array[Long] = new Array[Long](k)
    var size: Int = 0
    val hll: Array[Byte] = Hll.empty

    def add(hash: Long): Unit = {
      Hll.add(hll, hash)
      // signed-sorted bottom-k over the avalanched hash
      if (size == k && hash >= mins(size - 1)) return
      val pos = {
        val p = java.util.Arrays.binarySearch(mins, 0, size, hash)
        if (p >= 0) return // already present (set semantics)
        -(p + 1)
      }
      val newSize = math.min(size + 1, k)
      System.arraycopy(mins, pos, mins, pos + 1, newSize - pos - 1)
      mins(pos) = hash
      size = newSize
    }

    def result(): Array[Byte] = serialize(k, java.util.Arrays.copyOf(mins, size), hll)
  }

  /** Merge two serialized digests: HLL register-max + sorted-union of
    * minima truncated to k.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (ka, ma, ha) = parse(a); val (kb, mb, hb) = parse(b)
    val k = math.max(ka, kb)
    val out = new Array[Long](math.min(k, ma.length + mb.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < ma.length || j < mb.length)) {
      val take =
        if (i >= ma.length) { val v = mb(j); j += 1; v }
        else if (j >= mb.length) { val v = ma(i); i += 1; v }
        else if (ma(i) < mb(j)) { val v = ma(i); i += 1; v }
        else if (ma(i) > mb(j)) { val v = mb(j); j += 1; v }
        else { val v = ma(i); i += 1; j += 1; v }
      out(n) = take; n += 1
    }
    serialize(k, java.util.Arrays.copyOf(out, n), Hll.merge(ha, hb))
  }

  def cardinality(d: Array[Byte]): Long = Hll.cardinality(parse(d)._3)

  /** |bottomK(A ∪ B) ∩ A ∩ B| and the Jaccard estimate it induces. */
  def intersectionOfBottomK(a: Array[Byte], b: Array[Byte]): (Long, Double) = {
    val (ka, ma, _) = parse(a); val (kb, mb, _) = parse(b)
    val k = math.max(ka, kb)
    var i = 0; var j = 0; var seen = 0; var both = 0
    while (seen < k && (i < ma.length || j < mb.length)) {
      if (i < ma.length && j < mb.length && ma(i) == mb(j)) {
        both += 1; i += 1; j += 1
      } else if (j >= mb.length || (i < ma.length && ma(i) < mb(j))) i += 1
      else j += 1
      seen += 1
    }
    val jac = if (seen == 0) 0.0 else both.toDouble / seen.toDouble
    (both.toLong, jac)
  }

  def jaccard(a: Array[Byte], b: Array[Byte]): Double = intersectionOfBottomK(a, b)._2

  /** Estimated |A ∩ B| = jaccard × |A ∪ B| (reference
    * `SetDigestFunctions.java` intersection_cardinality contract).
    */
  def intersectionCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val unionCard = Hll.cardinality(Hll.merge(parse(a)._3, parse(b)._3))
    math.round(jaccard(a, b) * unionCard)
  }

  def hashString(s: String): Long = Hashing.fnv64Seeded(s, 0x5bd1e995L)
}

/** make_set_digest(x) over string-rendered input. */
class SetDigestAggregator extends Aggregator[String, SetDigest.Builder, Array[Byte]] {
  def zero: SetDigest.Builder = new SetDigest.Builder(SetDigest.K)
  def reduce(b: SetDigest.Builder, a: String): SetDigest.Builder = {
    if (a != null) b.add(SetDigest.hashString(a))
    b
  }
  def merge(a: SetDigest.Builder, b: SetDigest.Builder): SetDigest.Builder = {
    var i = 0
    while (i < b.size) { a.add(b.mins(i)); i += 1 }
    Hll.merge(a.hll, b.hll).copyToArray(a.hll)
    a
  }
  def finish(r: SetDigest.Builder): Array[Byte] = r.result()
  def bufferEncoder: Encoder[SetDigest.Builder] = Encoders.kryo[SetDigest.Builder]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** merge_set_digest(digest): re-aggregate previously built digests. */
class SetDigestMergeAggregator extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  def zero: Array[Byte] = SetDigest.empty
  def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
    if (a == null) b else SetDigest.merge(b, a)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = SetDigest.merge(a, b)
  def finish(r: Array[Byte]): Array[Byte] = r
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
