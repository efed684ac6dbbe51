package graft

import graft.functions.QDigest

/** True q-digest (Shrivastava et al. SenSys'04): the deterministic
  * ε·n = (64/k)·n rank-error bound the log-histogram stand-in could not
  * honor, checked on an adversarial distribution (huge point mass + long
  * tail + negatives), through merges, and on the SQL surface.
  */
class QDigestSpec extends GraftSuite {

  private def rankRange(sorted: Array[Double], v: Double): (Long, Long) = {
    // rank as a range to handle duplicates: [#(< v), #(≤ v)]
    var lo = 0L; var hi = 0L
    sorted.foreach { x => if (x < v) lo += 1; if (x <= v) hi += 1 }
    (lo, hi)
  }

  private def assertBound(xs: Array[Double], ds: Seq[QDigest], qs: Seq[Double]): Unit = {
    val merged = ds.reduce(_.merge(_))
    val n = xs.length.toLong
    val eps = 64.0 / merged.k
    val sorted = xs.sorted
    for (q <- qs) {
      val est = merged.valueAtQuantile(q)
      val target = math.max(1L, math.ceil(q * n).toLong)
      val (rLo, rHi) = rankRange(sorted, est)
      // the target rank must fall within ε·n of est's rank interval
      val slack = math.max(1L, math.ceil(eps * n).toLong)
      assert(rHi >= target - slack && rLo <= target + slack,
        s"q=$q est=$est rank=[$rLo,$rHi] target=$target slack=$slack n=$n")
    }
  }

  test("deterministic rank bound on an adversarial skewed distribution") {
    // 60% point mass at 1.0, geometric tail to 1e9, 10% negatives —
    // the shape that breaks value-binned histograms
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(120000) {
      val u = rnd.nextDouble()
      if (u < 0.6) 1.0
      else if (u < 0.9) math.pow(10, rnd.nextDouble() * 9)
      else -math.pow(10, rnd.nextDouble() * 6)
    }
    // small k (coarse digest) so compression actually engages: ε = 64/640 = 10%
    val d = new QDigest(640)
    xs.foreach(d.add)
    assert(d.nodes.size < 5000, s"digest did not compress: ${d.nodes.size} nodes")
    assertBound(xs, Seq(d), Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
  }

  test("bound survives arbitrary merge trees") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(80000)(if (rnd.nextDouble() < 0.5) 42.0 else rnd.nextGaussian() * 1e4)
    val parts = xs.grouped(5000).map { chunk =>
      val d = new QDigest(640); chunk.foreach(d.add); d
    }.toSeq
    assertBound(xs, parts, Seq(0.05, 0.5, 0.95))
  }

  test("exact regime below k: quantiles are exact input values") {
    val xs = Array.tabulate(1000)(i => (i * 37 % 1000).toDouble)
    val d = QDigest() // default k = 12800 > n → never compresses
    xs.foreach(d.add)
    for (q <- Seq(0.01, 0.5, 0.99)) {
      val sorted = xs.sorted
      val exact = sorted(math.max(0, math.ceil(q * xs.length).toInt - 1))
      assert(d.valueAtQuantile(q) == exact, s"q=$q")
    }
  }

  test("serialize round-trips and the SQL read path answers the same") {
    val rnd = new scala.util.Random(3)
    val d = new QDigest(640)
    (1 to 50000).foreach(_ => d.add(rnd.nextDouble() * 1e6))
    d.compress()
    val wire = d.serialize()
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(QDigest.valueAtQuantile(wire, q) == d.valueAtQuantile(q))
  }

  test("serialize is canonical: byte-equal wire forms for equal digests") {
    // The wire form is a SQL value: equal digests must compare equal.
    // (1) Hash-map iteration order must not leak into the bytes — rebuild
    // a digest from a node-permuted copy of its own wire form.
    val src = new QDigest(640)
    val rnd = new scala.util.Random(3)
    (1 to 50000).foreach(_ => src.add(rnd.nextDouble() * 1e6))
    src.compress()
    val wire = src.serialize()
    val m = wire(4).toInt
    val triples = (0 until m).map(i => wire.slice(5 + 3 * i, 8 + 3 * i))
    val permuted = wire.take(5) ++ rnd.shuffle(triples).flatten
    assert(java.util.Arrays.equals(QDigest.deserialize(permuted).serialize(), wire))
    // (2) Data insertion order must not matter either, in the regime where
    // that is guaranteed (leaf count below the streaming-compression
    // trigger, one final compress): the tree then depends only on the
    // value multiset and the deterministic bottom-up walk.
    val xs = (1 to 5000).map(i => (i * 2654435761L % 2003).toDouble)
    val fwd = new QDigest(640); xs.foreach(fwd.add); fwd.compress()
    val rev = new QDigest(640); xs.reverse.foreach(rev.add); rev.compress()
    val shuf = new QDigest(640)
    new scala.util.Random(7).shuffle(xs).foreach(shuf.add); shuf.compress()
    assert(java.util.Arrays.equals(fwd.serialize(), rev.serialize()))
    assert(java.util.Arrays.equals(fwd.serialize(), shuf.serialize()))
  }

  test("SQL surface: build, merge, query through qdigest_agg") {
    val est = Tables
      .sql(spark, sfTiny,
        """SELECT value_at_quantile(merge_qdigest(sk), 0.5) AS p50
          |FROM (SELECT l_returnflag, qdigest_agg(l_extendedprice) AS sk
          |      FROM lineitem GROUP BY l_returnflag)""".stripMargin)
      .collect().head.getDouble(0)
    val exact = Tables.load(spark, sfTiny, "lineitem")
      .selectExpr("percentile(l_extendedprice, 0.5) AS p50").collect().head.getDouble(0)
    // sub-k regime at sf0.001 → near-exact (within one value step)
    assert(math.abs(est - exact) / exact < 0.001, s"est=$est exact=$exact")
  }

  private def Tables = graft.engine.Tables
}
