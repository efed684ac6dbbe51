package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GeoRelations, Hashing, MinHash, QDigest, ShingleHash, SimHash, SpaceSaving, Wkt}

/** Randomized property checks (seeded → reproducible) for the
  * hand-written kernels — the code most likely to hide an off-by-one,
  * since no builtin cross-checks it (reference analog: the randomized
  * operator tests under `core/trino-main/src/test/java/io/trino/operator/`).
  * Pure JVM, no Spark session needed.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def randWord(max: Int): String =
    (0 until (1 + rnd.nextInt(max))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  test("shingle_hashes = sorted distinct FNV of every n-window (200 cases)") {
    for (_ <- 1 to 200) {
      val s = randWord(40)
      val n = 1 + rnd.nextInt(5)
      val naive = (if (s.length <= n) Seq(s)
        else (0 to s.length - n).map(i => s.substring(i, i + n)))
        .distinct.map { w =>
          var h = 0xcbf29ce484222325L
          w.foreach(c => { h ^= c.toLong; h *= 0x100000001b3L })
          h
        }.sorted
      assert(ShingleHash.compute(s, n).toSeq == naive, s"s=$s n=$n")
    }
  }

  test("minhash: element order never matters, k respected (200 cases)") {
    for (_ <- 1 to 200) {
      val xs = Array.fill(1 + rnd.nextInt(50))(rnd.nextLong())
      val k = 1 + rnd.nextInt(32)
      val a = MinHash.compute(xs, k)
      val shuffled = rnd.shuffle(xs.toSeq).toArray
      val b = MinHash.compute(shuffled, k)
      assert(a.length == k && a.toSeq == b.toSeq)
    }
  }

  test("simhash(bytes) equals per-token FNV voting (200 cases)") {
    for (_ <- 1 to 200) {
      val text = (0 until rnd.nextInt(12)).map(_ => randWord(8)).mkString(" ")
      val acc = new Array[Int](64)
      text.split(" ", -1).foreach { t =>
        val h = Hashing.fnv64(t)
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
      }
      var expect = 0L
      for (b <- 0 until 64) if (acc(b) > 0) expect |= (1L << b)
      assert(SimHash.compute(text.getBytes("UTF-8")) == expect, s"text='$text'")
    }
  }

  test("space-saving merge keeps every count an overestimate of the truth") {
    for (_ <- 1 to 200) {
      val cap = 8
      def stream() = List.fill(rnd.nextInt(120))(s"k${rnd.nextInt(20)}")
      val xs = stream(); val ys = stream()
      val a = xs.foldLeft(Map.empty[String, Long])(SpaceSaving.reduce(_, _, cap))
      val b = ys.foldLeft(Map.empty[String, Long])(SpaceSaving.reduce(_, _, cap))
      val merged = SpaceSaving.merge(a, b, cap)
      val truth = (xs ++ ys).groupBy(identity).view.mapValues(_.size.toLong).toMap
      merged.foreach { case (k, est) =>
        assert(est >= truth.getOrElse(k, 0L), s"$k: est=$est true=${truth.getOrElse(k, 0L)}")
      }
      assert(merged.size <= cap)
    }
  }

  test("q-digest: exact in the sub-k regime, rank-bounded always") {
    for (_ <- 1 to 50) {
      val xs = List.fill(50 + rnd.nextInt(2000))(rnd.nextDouble() * 2e6 - 1e6)
      val q = 0.05 + rnd.nextDouble() * 0.9
      // split into two digests and merge — bound must survive the merge
      val (l, r) = xs.splitAt(rnd.nextInt(xs.length))
      val d1 = QDigest(); l.foreach(d1.add)
      val d2 = QDigest(); r.foreach(d2.add)
      val est = d1.merge(d2).valueAtQuantile(q)
      val sorted = xs.sorted
      // n < k here → the digest never compresses → exact quantile value
      val exact = sorted(math.min(sorted.length - 1,
        math.max(0, math.ceil(q * sorted.length).toInt - 1)))
      assert(est == exact, s"q=$q est=$est exact=$exact n=${xs.length}")
    }
  }

  test("Wkt.distance is symmetric, non-negative, zero when intersecting") {
    def seg() = {
      def p() = Wkt.Pt(rnd.nextDouble() * 100 - 50, rnd.nextDouble() * 100 - 50)
      Wkt.LineString(Vector(p(), p()))
    }
    for (_ <- 1 to 500) {
      val a = seg(); val b = seg()
      val dab = Wkt.distance(a, b)
      val dba = Wkt.distance(b, a)
      assert(math.abs(dab - dba) < 1e-9, s"asymmetric: $dab vs $dba ($a, $b)")
      assert(dab >= 0.0)
      if (Wkt.intersects(a, b)) assert(dab == 0.0)
    }
  }

  test("spatial relations on random integer rectangles agree with interval logic (300 cases)") {
    def rect(x0: Int, y0: Int, x1: Int, y1: Int): Wkt.Geom =
      Wkt.parse(s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))")
    for (_ <- 1 to 300) {
      val ax0 = rnd.nextInt(10); val ay0 = rnd.nextInt(10)
      val ax1 = ax0 + 1 + rnd.nextInt(6); val ay1 = ay0 + 1 + rnd.nextInt(6)
      val bx0 = rnd.nextInt(10); val by0 = rnd.nextInt(10)
      val bx1 = bx0 + 1 + rnd.nextInt(6); val by1 = by0 + 1 + rnd.nextInt(6)
      val a = rect(ax0, ay0, ax1, ay1); val b = rect(bx0, by0, bx1, by1)
      val ix = math.min(ax1, bx1) - math.max(ax0, bx0) // interval overlaps
      val iy = math.min(ay1, by1) - math.max(ay0, by0)
      val label = s"A=($ax0,$ay0)-($ax1,$ay1) B=($bx0,$by0)-($bx1,$by1)"
      val interiorsMeet = ix > 0 && iy > 0
      val boundariesMeet = ix >= 0 && iy >= 0
      assert(GeoRelations.interiorsIntersect(a, b) === interiorsMeet, s"interiors $label")
      assert(GeoRelations.touches(a, b) === (boundariesMeet && !interiorsMeet), s"touches $label")
      val aInB = ax0 >= bx0 && ax1 <= bx1 && ay0 >= by0 && ay1 <= by1
      val bInA = bx0 >= ax0 && bx1 <= ax1 && by0 >= ay0 && by1 <= ay1
      assert(GeoRelations.overlaps(a, b) === (interiorsMeet && !aInB && !bInA), s"overlaps $label")
      assert(GeoRelations.equalsGeom(a, b) === (aInB && bInA), s"equals $label")
      assert(GeoRelations.covers(a, b) === bInA, s"covers $label")
      // symmetry of the symmetric predicates
      assert(GeoRelations.touches(a, b) === GeoRelations.touches(b, a))
      assert(GeoRelations.overlaps(a, b) === GeoRelations.overlaps(b, a))
    }
  }

  test("checksum laws on random multisets: additive, commutative, null-branch (200 cases)") {
    // reference semantics (ChecksumAggregationFunction): wrapping sum of
    // xxhash64(x)*PRIME64 — the laws, checked against a direct model
    val Prime64 = 0x9E3779B185EBCA87L
    def model(xs: Seq[Long]): Long = xs.map(_ * Prime64).sum // wrapping
    for (_ <- 1 to 200) {
      val xs = Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong())
      // order independence
      assert(model(xs) == model(rnd.shuffle(xs)))
      // additivity over concatenation (partial-agg merge law)
      val (l, r) = xs.splitAt(rnd.nextInt(xs.length))
      assert(model(l) + model(r) == model(xs))
      // duplicate-pair sensitivity: doubling never cancels (unless sum=0)
      if (model(xs) != 0) assert(model(xs ++ xs) != model(Seq.empty))
    }
  }

  test("q-digest canonical wire form survives random merge trees (50 cases)") {
    for (_ <- 1 to 50) {
      val xs = Array.fill(300 + rnd.nextInt(700))(rnd.nextInt(1000).toDouble)
      // same multiset, two different random merge trees over 4 shards
      def build(order: Seq[Double], splits: Int): QDigest = {
        val shards = order.grouped(math.max(1, order.length / splits)).map { g =>
          val d = new QDigest(640); g.foreach(d.add); d
        }.toSeq
        val merged = rnd.shuffle(shards).reduce(_.merge(_))
        merged.compress()
        merged
      }
      val d1 = build(xs.toSeq, 4)
      // a digest rebuilt from its own wire form serializes byte-equal
      assert(java.util.Arrays.equals(
        QDigest.deserialize(d1.serialize()).serialize(), d1.serialize()))
      // and both answer within the deterministic bound of the true median
      val sorted = xs.sorted
      val est = d1.valueAtQuantile(0.5)
      val rank = sorted.count(_ < est)
      val slack = math.ceil(64.0 / 640 * xs.length).toLong + 1
      assert(math.abs(rank - xs.length / 2) <= slack, s"rank=$rank n=${xs.length}")
    }
  }

}
