package graft.functions

import Wkt._

/** Geospatial tranche 4 — spatial relations, validity, linear
  * referencing, GeoJSON / encoded-polyline IO, nearest points, n-ary
  * union and the spherical-geography read family. Completes the
  * reference's planar `@ScalarFunction` inventory
  * (`plugin/trino-geospatial/.../GeoFunctions.java`: ST_Boundary `:1129`,
  * ST_Crosses `:1298`, ST_Equals `:1328`, ST_Overlaps `:1355`,
  * ST_Relate `:1370`, ST_Touches `:1382`, ST_IsSimple `:519`,
  * ST_IsValid `:528`, line_locate_point `:630`, line_interpolate_point
  * `:656`, geometry_union `:851`, geometry_nearest_points `:1196`,
  * ST_Points `:1061`, ST_Geometries `:947`, ST_EnvelopeAsPts `:1155`;
  * spherical excess area `:1779`, great-circle distance `:1511`;
  * `EncodedPolylineFunctions.java` for the polyline pair).
  *
  * The relation predicates are DE-9IM-style but evaluated by sampling
  * (ring vertices + edge midpoints) against exact edge/containment
  * primitives. Exact for geometries whose boundaries meet in finitely
  * many points or shared collinear segments — the classes the fixture
  * and specs exercise — and documented approximate beyond that.
  */
object GeoRelations extends Serializable {
  private val Eps = 1e-9

  // ---------- point classification ----------

  private def dedupClosed(r: Vector[Pt]): Vector[Pt] =
    if (r.length > 1 && r.head == r.last) r.dropRight(1) else r

  private def onSeg(p: Pt, a: Pt, b: Pt): Boolean = {
    val cross = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
    val len = math.hypot(b.x - a.x, b.y - a.y)
    if (len < Eps) return math.hypot(p.x - a.x, p.y - a.y) < Eps
    if (math.abs(cross) / len > Eps) return false
    val dot = (p.x - a.x) * (b.x - a.x) + (p.y - a.y) * (b.y - a.y)
    dot >= -Eps * len && dot <= len * len + Eps * len
  }

  private def ringEdges(r0: Vector[Pt]): Vector[(Pt, Pt)] = {
    val r = dedupClosed(r0)
    r.indices.toVector.map(i => (r(i), r((i + 1) % r.length)))
  }

  private def rayInRing(r0: Vector[Pt], p: Pt): Boolean = {
    val r = dedupClosed(r0)
    var inside = false
    var i = 0; var j = r.length - 1
    while (i < r.length) {
      if ((r(i).y > p.y) != (r(j).y > p.y) &&
          p.x < (r(j).x - r(i).x) * (p.y - r(i).y) / (r(j).y - r(i).y) + r(i).x)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** 0 = exterior, 1 = boundary, 2 = interior (w.r.t. the closed set). */
  def classify(g: Geom, p: Pt): Int = g match {
    case Point(q) => if (math.hypot(p.x - q.x, p.y - q.y) < Eps) 2 else 0
    case MultiPoint(ps) => if (ps.exists(q => math.hypot(p.x - q.x, p.y - q.y) < Eps)) 2 else 0
    case LineString(ps) =>
      val segs = ps.sliding(2).collect { case Vector(a, b) => (a, b) }.toVector
      if (!segs.exists { case (a, b) => onSeg(p, a, b) }) 0
      else {
        val closed = ps.length > 1 && ps.head == ps.last
        val atEnd = !closed &&
          (math.hypot(p.x - ps.head.x, p.y - ps.head.y) < Eps ||
           math.hypot(p.x - ps.last.x, p.y - ps.last.y) < Eps)
        if (atEnd) 1 else 2
      }
    case Polygon(rings) if rings.nonEmpty =>
      if (rings.exists(r => ringEdges(r).exists { case (a, b) => onSeg(p, a, b) })) 1
      else if (rayInRing(rings.head, p) && !rings.tail.exists(rayInRing(_, p))) 2
      else 0
    case MultiPolygon(polys) => polys.map(classify(_, p)).maxOption.getOrElse(0)
    case MultiLineString(ls) => ls.map(l => classify(LineString(l), p)).maxOption.getOrElse(0)
    case Collection(gs) => gs.map(classify(_, p)).maxOption.getOrElse(0)
    case _ => 0
  }

  // ---------- segment primitives ----------

  private def orient(p: Pt, q: Pt, r: Pt): Double =
    (q.x - p.x) * (r.y - q.y) - (q.y - p.y) * (r.x - q.x)

  /** Interiors of both segments cross at a single point. */
  private def properCross(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    (o1 > Eps && o2 < -Eps || o1 < -Eps && o2 > Eps) &&
      (o3 > Eps && o4 < -Eps || o3 < -Eps && o4 > Eps)
  }

  /** Collinear segments sharing more than a single point. */
  private def collinearOverlap(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    if (math.abs(orient(a, b, c)) > Eps || math.abs(orient(a, b, d)) > Eps) return false
    // project onto the dominant axis
    def t(p: Pt): Double = if (math.abs(b.x - a.x) >= math.abs(b.y - a.y)) p.x else p.y
    val (lo1, hi1) = (math.min(t(a), t(b)), math.max(t(a), t(b)))
    val (lo2, hi2) = (math.min(t(c), t(d)), math.max(t(c), t(d)))
    math.min(hi1, hi2) - math.max(lo1, lo2) > Eps
  }

  private def midpoints(e: Seq[(Pt, Pt)]): Seq[Pt] =
    e.map { case (a, b) => Pt((a.x + b.x) / 2, (a.y + b.y) / 2) }

  /** Sample points whose classification is representative: every vertex
    * plus every edge midpoint.
    */
  private def samples(g: Geom): Seq[Pt] = {
    val e = Wkt.edges(g)
    GeoExtras.allPoints(g) ++ midpoints(e)
  }

  private def anyProperCross(a: Geom, b: Geom): Boolean = {
    val ea = Wkt.edges(a); val eb = Wkt.edges(b)
    ea.exists { case (p, q) => eb.exists { case (r, s) => properCross(p, q, r, s) } }
  }

  private def anyCollinearOverlap(a: Geom, b: Geom): Boolean = {
    val ea = Wkt.edges(a); val eb = Wkt.edges(b)
    ea.exists { case (p, q) => eb.exists { case (r, s) => collinearOverlap(p, q, r, s) } }
  }

  private def dim(g: Geom): Int = GeoExtras.dimension(g)

  /** Open-set interiors share a point. Witness rules per dimension pair:
    * a boundary sample of a 2D region that lies STRICTLY inside the other
    * geometry witnesses interior overlap (every neighborhood of a
    * boundary point contains interior points); transversal boundary
    * crossings and collinear 1D overlap are the other witnesses; mutual
    * covering (equality / containment with shared boundary) is the
    * remaining case where no sample is strict.
    */
  def interiorsIntersect(a: Geom, b: Geom): Boolean = (dim(a), dim(b)) match {
    case (0, _) => GeoExtras.allPoints(a).exists(p => classify(b, p) == 2)
    case (_, 0) => GeoExtras.allPoints(b).exists(p => classify(a, p) == 2)
    case (1, 1) =>
      anyProperCross(a, b) || anyCollinearOverlap(a, b) ||
        samples(a).exists(p => classify(a, p) == 2 && classify(b, p) == 2)
    case (1, 2) =>
      anyProperCross(a, b) ||
        samples(a).exists(p => classify(a, p) == 2 && classify(b, p) == 2)
    case (2, 1) => interiorsIntersect(b, a)
    case _ => // 2D vs 2D
      anyProperCross(a, b) ||
        samples(a).exists(p => classify(b, p) == 2) ||
        samples(b).exists(p => classify(a, p) == 2) ||
        covers(a, b) || covers(b, a)
  }

  /** A covers B: no point of B is exterior to A (closed-set containment,
    * boundary contact allowed), witnessed on B's samples plus absence of
    * proper boundary crossings.
    */
  def covers(a: Geom, b: Geom): Boolean =
    samples(b).forall(p => classify(a, p) > 0) && !anyProperCross(a, b)

  /** OGC ST_Contains: covers + interiors intersect. */
  def containsOgc(a: Geom, b: Geom): Boolean =
    covers(a, b) && interiorsIntersect(a, b)

  def equalsGeom(a: Geom, b: Geom): Boolean = (dim(a) == dim(b)) && {
    (a, b) match {
      case (Point(p), Point(q)) => math.hypot(p.x - q.x, p.y - q.y) < Eps
      case _ => covers(a, b) && covers(b, a)
    }
  }

  def touches(a: Geom, b: Geom): Boolean =
    !interiorsIntersect(a, b) && Wkt.distance(a, b) < Eps &&
      !(dim(a) == 0 && dim(b) == 0) // point/point: interiors are the points

  def crosses(a: Geom, b: Geom): Boolean = (dim(a), dim(b)) match {
    case (1, 1) => anyProperCross(a, b) && !anyCollinearOverlap(a, b)
    case (da, db) if da != db =>
      val (lo, hi) = if (da < db) (a, b) else (b, a)
      // interior of the lower-dim geometry meets both interior and
      // exterior of the higher-dim one. A strictly-exterior endpoint also
      // witnesses the exterior part: the interior extends to it.
      val s = samples(lo).filter(p => classify(lo, p) == 2)
      val in = s.exists(p => classify(hi, p) == 2) || anyProperCross(lo, hi)
      val out = samples(lo).exists(p => classify(hi, p) == 0)
      in && out
    case _ => false // equal-dim 0 or 2: crosses is never true per OGC
  }

  def overlaps(a: Geom, b: Geom): Boolean = (dim(a) == dim(b)) && {
    dim(a) match {
      case 0 =>
        val pa = GeoExtras.allPoints(a).toSet
        val pb = GeoExtras.allPoints(b).toSet
        (pa & pb).nonEmpty && (pa -- pb).nonEmpty && (pb -- pa).nonEmpty
      case 1 =>
        anyCollinearOverlap(a, b) && !covers(a, b) && !covers(b, a)
      case _ =>
        interiorsIntersect(a, b) && !covers(a, b) && !covers(b, a)
    }
  }

  // ---------- DE-9IM (sampled) ----------

  /** Dimension of the intersection of region `ra` of A with region `rb`
    * of B, where regions are 2=interior, 1=boundary, 0=exterior; -1 if
    * empty. Evaluated on the joint sample set plus crossing witnesses.
    */
  def relateMatrix(a: Geom, b: Geom): Array[Int] = {
    val pool = samples(a) ++ samples(b)
    val cross = anyProperCross(a, b) // boundaries cross transversally
    def W(pred: ((Int, Int)) => Boolean): Boolean =
      pool.exists(p => pred((classify(a, p), classify(b, p))))
    // region codes: 2 = interior, 1 = boundary, 0 = exterior. For a 2D
    // geometry a sampled point can never classify as strict interior of
    // itself (samples ride the rings), so each cell has its own witness:
    // a boundary sample of one geometry landing strictly inside/outside
    // the other, or a transversal crossing.
    def has(ra: Int, rb: Int): Boolean = (ra, rb) match {
      case (2, 2) => interiorsIntersect(a, b)
      case (2, 1) => W { case (ca, cb) => ca == 2 && cb == 1 } ||
        (dim(a) == 2 && dim(b) >= 1 && cross)
      case (1, 2) => W { case (ca, cb) => ca == 1 && cb == 2 } ||
        (dim(b) == 2 && dim(a) >= 1 && cross)
      case (1, 1) => W { case (ca, cb) => ca == 1 && cb == 1 } || cross
      case (2, 0) =>
        if (dim(a) == 2) W { case (ca, cb) => ca >= 1 && cb == 0 } || cross
        else W { case (ca, cb) => ca == 2 && cb == 0 }
      case (0, 2) =>
        if (dim(b) == 2) W { case (ca, cb) => ca == 0 && cb >= 1 } || cross
        else W { case (ca, cb) => ca == 0 && cb == 2 }
      case (1, 0) => W { case (ca, cb) => ca == 1 && cb == 0 } ||
        (dim(a) == 2 && cross)
      case (0, 1) => W { case (ca, cb) => ca == 0 && cb == 1 } ||
        (dim(b) == 2 && cross)
      case _ => true // (0,0): exteriors always meet for bounded geometries
    }
    def cellDim(ra: Int, rb: Int): Int = {
      if (!has(ra, rb)) -1
      else {
        val da = if (ra == 0) 2 else if (ra == 2) dim(a) else math.max(dim(a) - 1, 0)
        val db = if (rb == 0) 2 else if (rb == 2) dim(b) else math.max(dim(b) - 1, 0)
        // shared collinear segments raise 0-dim boundary contacts to 1
        val base = math.min(da, db)
        if (ra == 1 && rb == 1 && base >= 1)
          if (anyCollinearOverlap(boundaryOf(a), boundaryOf(b))) 1 else 0
        else base
      }
    }
    Array(
      cellDim(2, 2), cellDim(2, 1), cellDim(2, 0),
      cellDim(1, 2), cellDim(1, 1), cellDim(1, 0),
      cellDim(0, 2), cellDim(0, 1), 2)
  }

  def relate(a: Geom, b: Geom, pattern: String): Boolean = {
    require(pattern.length == 9, s"DE-9IM pattern must have 9 characters: $pattern")
    val m = relateMatrix(a, b)
    pattern.toUpperCase.zip(m).forall {
      case ('*', _) => true
      case ('T', d) => d >= 0
      case ('F', d) => d < 0
      case (c, d) if c >= '0' && c <= '2' => d == c - '0'
      case (c, _) => throw new IllegalArgumentException(s"bad DE-9IM symbol: $c")
    }
  }

  // ---------- boundary / validity ----------

  private def closeRing(r: Vector[Pt]): Vector[Pt] =
    if (r.nonEmpty && r.head != r.last) r :+ r.head else r

  def boundaryOf(g: Geom): Geom = g match {
    case Point(_) | MultiPoint(_) | EmptyGeom => EmptyGeom
    case LineString(ps) if ps.isEmpty => EmptyGeom
    case LineString(ps) =>
      if (ps.head == ps.last) EmptyGeom else MultiPoint(Vector(ps.head, ps.last))
    case MultiLineString(ls) =>
      // mod-2 rule: points that terminate an odd number of component ends
      val ends = ls.filter(l => l.nonEmpty && l.head != l.last).flatMap(l => Seq(l.head, l.last))
      val odd = ends.groupBy(identity).collect { case (p, occ) if occ.size % 2 == 1 => p }.toVector
      if (odd.isEmpty) EmptyGeom else MultiPoint(odd.sortBy(p => (p.x, p.y)))
    case Polygon(rings) =>
      if (rings.isEmpty) EmptyGeom
      else if (rings.length == 1) LineString(closeRing(rings.head))
      else MultiLineString(rings.map(closeRing))
    case MultiPolygon(polys) =>
      MultiLineString(polys.flatMap(p => p.rings.map(closeRing)))
    case Collection(gs) => Collection(gs.map(boundaryOf).filter(_ != EmptyGeom))
  }

  /** No anomalous self-intersection / self-tangency (OGC isSimple). */
  def isSimple(g: Geom): Boolean = g match {
    case Point(_) | EmptyGeom => true
    case MultiPoint(ps) => ps.distinct.length == ps.length
    case LineString(ps) =>
      val segs = ps.sliding(2).collect { case Vector(a, b) => (a, b) }.toVector
      val closed = ps.length > 1 && ps.head == ps.last
      segs.indices.forall { i =>
        (i + 1 until segs.length).forall { j =>
          val (a, b) = segs(i); val (c, d) = segs(j)
          if (properCross(a, b, c, d) || collinearOverlap(a, b, c, d)) false
          else if (j == i + 1 || (closed && i == 0 && j == segs.length - 1)) true
          else // non-adjacent segments may not even touch
            !(onSeg(c, a, b) || onSeg(d, a, b) || onSeg(a, c, d) || onSeg(b, c, d))
        }
      }
    case MultiLineString(ls) => ls.forall(l => isSimple(LineString(l)))
    case Polygon(rings) => rings.forall(r => isSimple(LineString(closeRing(r))))
    case MultiPolygon(polys) => polys.forall(isSimple)
    case Collection(gs) => gs.forall(isSimple)
  }

  /** None = valid; Some(reason) mirrors geometry_invalid_reason. */
  def invalidReason(g: Geom): Option[String] = g match {
    case Polygon(rings) =>
      rings.zipWithIndex.collectFirst {
        case (r, _) if dedupClosed(r).length < 3 =>
          "Polygon is not valid: a loop contains less then 3 vertices."
        case (r, i) if !isSimple(LineString(closeRing(r))) =>
          if (i == 0) "Self-intersection at or near point"
          else "Hole ring self-intersection at or near point"
      } orElse {
        rings.drop(1).collectFirst {
          case hole if !dedupClosed(hole).forall(p => rayInRing(rings.head, p) ||
            ringEdges(rings.head).exists { case (a, b) => onSeg(p, a, b) }) =>
            "Hole lies outside shell"
        }
      }
    case LineString(ps) if ps.length == 1 =>
      Some("Invalid line string: must have at least 2 points")
    case MultiPolygon(polys) => polys.flatMap(p => invalidReason(p)).headOption
    case Collection(gs) => gs.flatMap(invalidReason).headOption
    case _ => None
  }

  def isValid(g: Geom): Boolean = invalidReason(g).isEmpty

  // ---------- nearest points ----------

  private def closestOnSeg(p: Pt, a: Pt, b: Pt): Pt = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val l2 = dx * dx + dy * dy
    val t = if (l2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / l2))
    Pt(a.x + t * dx, a.y + t * dy)
  }

  /** Closest point pair (onA, onB); for intersecting inputs returns a
    * shared witness point.
    */
  def nearestPoints(a: Geom, b: Geom): (Pt, Pt) = {
    val ptsA = GeoExtras.allPoints(a)
    val ptsB = GeoExtras.allPoints(b)
    val ea = Wkt.edges(a); val eb = Wkt.edges(b)
    var best: (Pt, Pt) = null
    var bestD = Double.MaxValue
    def consider(p: Pt, q: Pt): Unit = {
      val d = math.hypot(p.x - q.x, p.y - q.y)
      if (d < bestD) { bestD = d; best = (p, q) }
    }
    if (ea.isEmpty && eb.isEmpty) {
      for (p <- ptsA; q <- ptsB) consider(p, q)
    } else {
      for (p <- ptsA) {
        if (eb.isEmpty) ptsB.foreach(q => consider(p, q))
        else eb.foreach { case (c, d) => consider(p, closestOnSeg(p, c, d)) }
      }
      for (q <- ptsB) {
        if (ea.isEmpty) ()
        else ea.foreach { case (c, d) => consider(closestOnSeg(q, c, d), q) }
      }
      // proper crossings: the crossing point is the witness
      for ((p1, q1) <- ea; (p2, q2) <- eb if properCross(p1, q1, p2, q2)) {
        val d1x = q1.x - p1.x; val d1y = q1.y - p1.y
        val d2x = q2.x - p2.x; val d2y = q2.y - p2.y
        val denom = d1x * d2y - d1y * d2x
        val t = ((p2.x - p1.x) * d2y - (p2.y - p1.y) * d2x) / denom
        val x = Pt(p1.x + t * d1x, p1.y + t * d1y)
        consider(x, x)
      }
    }
    // interior containment: any contained vertex is its own witness
    ptsA.find(p => classify(b, p) == 2).foreach(p => consider(p, p))
    ptsB.find(q => classify(a, q) == 2).foreach(q => consider(q, q))
    best
  }

  // ---------- linear referencing ----------

  private def lineCoords(g: Geom): Vector[Pt] = g match {
    case LineString(ps) => ps
    case MultiLineString(ls) => ls.flatten
    case _ => throw new IllegalArgumentException(
      s"line function requires a LineString, got: ${GeoExtras.geometryType(g)}")
  }

  /** Fraction of total length at the closest point to `p` (reference
    * line_locate_point, JTS LengthIndexedLine semantics).
    */
  def lineLocatePoint(line: Geom, p: Pt): Double = {
    val ps = lineCoords(line)
    val segs = ps.sliding(2).collect { case Vector(a, b) => (a, b) }.toVector
    val total = segs.map { case (a, b) => math.hypot(b.x - a.x, b.y - a.y) }.sum
    if (total < Eps) return 0.0
    var bestD = Double.MaxValue; var bestAt = 0.0; var acc = 0.0
    for ((a, b) <- segs) {
      val c = closestOnSeg(p, a, b)
      val d = math.hypot(p.x - c.x, p.y - c.y)
      if (d < bestD) { bestD = d; bestAt = acc + math.hypot(c.x - a.x, c.y - a.y) }
      acc += math.hypot(b.x - a.x, b.y - a.y)
    }
    bestAt / total
  }

  def lineInterpolatePoint(line: Geom, fraction: Double): Pt = {
    require(fraction >= 0 && fraction <= 1, "fraction must be between 0 and 1")
    val ps = lineCoords(line)
    if (fraction == 0) return ps.head
    if (fraction == 1) return ps.last
    val segs = ps.sliding(2).collect { case Vector(a, b) => (a, b) }.toVector
    val total = segs.map { case (a, b) => math.hypot(b.x - a.x, b.y - a.y) }.sum
    var target = fraction * total
    for ((a, b) <- segs) {
      val l = math.hypot(b.x - a.x, b.y - a.y)
      if (target <= l + Eps)
        return if (l < Eps) a else Pt(a.x + (b.x - a.x) * target / l, a.y + (b.y - a.y) * target / l)
      target -= l
    }
    ps.last
  }

  /** Points at fractions step, 2·step, … ≤ 1 (reference
    * line_interpolate_points: floor(1/step) points).
    */
  def lineInterpolatePoints(line: Geom, step: Double): Vector[Pt] = {
    require(step >= 0 && step <= 1, "fraction must be between 0 and 1")
    if (step == 0) return Vector(lineCoords(line).head)
    if (step == 1) return Vector(lineCoords(line).last)
    val n = math.floor(1 / step).toInt
    (1 to n).toVector.map(i => lineInterpolatePoint(line, math.min(1.0, i * step)))
  }

  // ---------- n-ary union ----------

  /** Point-set union over any number of point/polygon geometries.
    * Disjoint polygons stay separate MultiPolygon pieces (the pairwise
    * clipping kernel only composes overlapping shells); a new piece is
    * chain-merged into every existing piece whose interior it meets, so
    * the result is independent of input order — which makes the
    * aggregate form sound under Spark's arbitrary partial-merge order.
    * Touching-only (shared edge, disjoint interiors) pieces are kept
    * separate: same point set, degenerate-free.
    */
  def unionAll(gs: Seq[Geom]): Geom = {
    var pieces = Vector.empty[Polygon]
    var pts = Vector.empty[Pt]
    def addPoly(p0: Polygon): Unit = {
      var cur = p0
      var merged = true
      while (merged && cur != null) {
        merged = false
        val i = pieces.indexWhere(q => interiorsIntersect(q, cur))
        if (i >= 0) {
          val q = pieces(i)
          pieces = pieces.patch(i, Nil, 1)
          GeoConstructive.union(q, cur) match {
            case pg: Polygon => cur = pg; merged = true
            case MultiPolygon(ps) =>
              // overlapping inputs can only produce a connected result;
              // defensive: keep all pieces, stop chaining
              pieces ++= ps; cur = null
            case EmptyGeom => cur = null
            case other => throw new IllegalStateException(
              s"unexpected union result: ${Wkt.write(other)}")
          }
        }
      }
      if (cur != null) pieces :+= cur
    }
    def add(g: Geom): Unit = g match {
      case EmptyGeom =>
      case p: Polygon => addPoly(p)
      case MultiPolygon(ps) => ps.foreach(addPoly)
      case Point(p) => pts :+= p
      case MultiPoint(ps) => pts ++= ps
      case Collection(inner) => inner.foreach(add)
      case other => throw new IllegalArgumentException(
        s"geometry_union supports point/polygon inputs, got ${Wkt.write(other)}")
    }
    gs.foreach(add)
    // points covered by an area piece are absorbed by the union
    val freePts = pts.distinct.filterNot(p => pieces.exists(q => classify(q, p) > 0))
      .sortBy(p => (p.x, p.y))
    val polyPart: Option[Geom] = pieces.sortBy(p => {
      val ps = GeoExtras.allPoints(p); (ps.map(_.x).min, ps.map(_.y).min)
    }) match {
      case Vector() => None
      case Vector(one) => Some(canonical(one))
      case many => Some(MultiPolygon(many.map(p => canonical(p).asInstanceOf[Polygon])))
    }
    (polyPart, freePts) match {
      case (None, Vector()) => EmptyGeom
      case (None, Vector(p)) => Point(p)
      case (None, ps) => MultiPoint(ps)
      case (Some(g), Vector()) => g
      case (Some(g), ps) => Collection(Vector(g) ++ ps.map(Point.apply))
    }
  }

  /** Order-independent canonical form: every ring closed, rotated to its
    * lexicographically smallest vertex, shell counter-clockwise and holes
    * clockwise — so WKT output is stable however the pieces were merged.
    */
  def canonical(g: Geom): Geom = g match {
    case Polygon(rings) if rings.nonEmpty =>
      def signedArea(r: Vector[Pt]): Double = {
        var s = 0.0; var i = 0; val n = r.length
        while (i < n) { val j = (i + 1) % n; s += r(i).x * r(j).y - r(j).x * r(i).y; i += 1 }
        s / 2
      }
      def canonRing(r0: Vector[Pt], ccw: Boolean): Vector[Pt] = {
        var r = dedupClosed(r0)
        if ((signedArea(r) > 0) != ccw) r = r.reverse
        val k = r.indices.minBy(i => (r(i).x, r(i).y))
        val rot = r.drop(k) ++ r.take(k)
        rot :+ rot.head
      }
      Polygon(canonRing(rings.head, ccw = true) +: rings.tail.map(canonRing(_, ccw = false)))
    case MultiPolygon(ps) => MultiPolygon(ps.map(p => canonical(p).asInstanceOf[Polygon]))
    case other => other
  }

  // ---------- GeoJSON ----------

  private def num(d: Double): String =
    if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def coordsJson(ps: Seq[Pt]): String =
    ps.map(p => s"[${num(p.x)},${num(p.y)}]").mkString("[", ",", "]")

  def toGeoJson(g: Geom): String = g match {
    case Point(p) => s"""{"type":"Point","coordinates":[${num(p.x)},${num(p.y)}]}"""
    case LineString(ps) => s"""{"type":"LineString","coordinates":${coordsJson(ps)}}"""
    case Polygon(rings) =>
      val rs = rings.map(r => coordsJson(closeRing(r))).mkString("[", ",", "]")
      s"""{"type":"Polygon","coordinates":$rs}"""
    case MultiPoint(ps) => s"""{"type":"MultiPoint","coordinates":${coordsJson(ps)}}"""
    case MultiLineString(ls) =>
      s"""{"type":"MultiLineString","coordinates":${ls.map(coordsJson).mkString("[", ",", "]")}}"""
    case MultiPolygon(polys) =>
      val ps = polys.map(p => p.rings.map(r => coordsJson(closeRing(r))).mkString("[", ",", "]"))
        .mkString("[", ",", "]")
      s"""{"type":"MultiPolygon","coordinates":$ps}"""
    case Collection(gs) =>
      s"""{"type":"GeometryCollection","geometries":${gs.map(toGeoJson).mkString("[", ",", "]")}}"""
    case EmptyGeom => """{"type":"GeometryCollection","geometries":[]}"""
  }

  def fromGeoJson(json: String): Geom = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    parseGeoJsonNode(mapper.readTree(json))
  }

  private def parseGeoJsonNode(n: com.fasterxml.jackson.databind.JsonNode): Geom = {
    def pt(c: com.fasterxml.jackson.databind.JsonNode): Pt = Pt(c.get(0).asDouble(), c.get(1).asDouble())
    def pts(c: com.fasterxml.jackson.databind.JsonNode): Vector[Pt] = {
      val b = Vector.newBuilder[Pt]
      c.forEach(e => b += pt(e)); b.result()
    }
    def rings(c: com.fasterxml.jackson.databind.JsonNode): Vector[Vector[Pt]] = {
      val b = Vector.newBuilder[Vector[Pt]]
      c.forEach(e => b += pts(e)); b.result()
    }
    val c = n.get("coordinates")
    n.get("type").asText() match {
      case "Point" => Point(pt(c))
      case "LineString" => LineString(pts(c))
      case "Polygon" => Polygon(rings(c))
      case "MultiPoint" => MultiPoint(pts(c))
      case "MultiLineString" => MultiLineString(rings(c))
      case "MultiPolygon" =>
        val b = Vector.newBuilder[Polygon]
        c.forEach(e => b += Polygon(rings(e)))
        MultiPolygon(b.result())
      case "GeometryCollection" =>
        val b = Vector.newBuilder[Geom]
        n.get("geometries").forEach(e => b += parseGeoJsonNode(e))
        val gs = b.result()
        if (gs.isEmpty) EmptyGeom else Collection(gs)
      case other => throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
    }
  }

  // ---------- encoded polyline (Google polyline5; reference
  // EncodedPolylineFunctions.java) ----------

  def toEncodedPolyline(g: Geom): String = {
    val ps = g match {
      case LineString(ps0) => ps0
      case MultiPoint(ps0) => ps0
      case _ => throw new IllegalArgumentException(
        "to_encoded_polyline requires a LineString or MultiPoint")
    }
    val sb = new StringBuilder
    var prevLat = 0L; var prevLon = 0L
    def emit(v: Long): Unit = {
      var value = if (v < 0) ~(v << 1) else v << 1
      while (value >= 0x20) {
        sb.append(((0x20 | (value & 0x1f)) + 63).toChar)
        value >>= 5
      }
      sb.append((value + 63).toChar)
    }
    for (p <- ps) {
      // GeoJSON/WKT order is (lon, lat); polyline encodes (lat, lon)
      val lat = math.round(p.y * 1e5); val lon = math.round(p.x * 1e5)
      emit(lat - prevLat); emit(lon - prevLon)
      prevLat = lat; prevLon = lon
    }
    sb.toString
  }

  def fromEncodedPolyline(s: String): Geom = {
    val pts = Vector.newBuilder[Pt]
    var i = 0; var lat = 0L; var lon = 0L
    def read(): Long = {
      var result = 0L; var shift = 0; var b = 0
      while ({ b = s.charAt(i) - 63; i += 1; result |= (b.toLong & 0x1f) << shift; shift += 5; b >= 0x20 }) ()
      if ((result & 1) != 0) ~(result >> 1) else result >> 1
    }
    while (i < s.length) {
      lat += read(); lon += read()
      pts += Pt(lon / 1e5, lat / 1e5)
    }
    LineString(pts.result())
  }

  // ---------- Hadoop/Hive Esri shape ingestion ----------

  /** geometry_from_hadoop_shape (reference GeoFunctions.java:326): 4-byte
    * WKID + 1-byte Hadoop shape type, then the little-endian Esri
    * shapefile record — type int32, then point (1) / polyline (3) /
    * polygon (5) / multipoint (8) payloads. Polygon rings regroup by
    * orientation: a clockwise ring opens a new shell (the shapefile
    * convention), counter-clockwise rings are holes of the current one.
    */
  def fromHadoopShape(bytes: Array[Byte]): Geom = {
    require(bytes.length > 5, "Hadoop shape input is too short")
    val buf = java.nio.ByteBuffer.wrap(bytes, 5, bytes.length - 5)
      .slice().order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def pt(): Pt = Pt(buf.getDouble(), buf.getDouble())
    def skipBbox(): Unit = { buf.getDouble(); buf.getDouble(); buf.getDouble(); buf.getDouble() }
    def parts(): Vector[Vector[Pt]] = {
      skipBbox()
      val numParts = buf.getInt(); val numPoints = buf.getInt()
      val offsets = Vector.fill(numParts)(buf.getInt()) :+ numPoints
      val pts = Vector.fill(numPoints)(pt())
      (0 until numParts).toVector.map(i => pts.slice(offsets(i), offsets(i + 1)))
    }
    def clockwise(r: Vector[Pt]): Boolean = {
      val ring = if (r.length > 1 && r.head == r.last) r.dropRight(1) else r
      var s = 0.0; var i = 0; val n = ring.length
      while (i < n) { val j = (i + 1) % n; s += ring(i).x * ring(j).y - ring(j).x * ring(i).y; i += 1 }
      s < 0
    }
    buf.getInt() match {
      case 0 => EmptyGeom
      case 1 => Point(pt())
      case 8 =>
        skipBbox()
        MultiPoint(Vector.fill(buf.getInt())(pt()))
      case 3 => parts() match {
        case Vector(one) => LineString(one)
        case many => MultiLineString(many)
      }
      case 5 =>
        val polys = Vector.newBuilder[Polygon]
        var current: Polygon = null
        for (ring <- parts()) {
          if (current == null || clockwise(ring)) {
            if (current != null) polys += current
            current = Polygon(Vector(ring))
          } else current = Polygon(current.rings :+ ring)
        }
        if (current != null) polys += current
        polys.result() match {
          case Vector(one) => one
          case many => MultiPolygon(many)
        }
      case other => throw new IllegalArgumentException(s"Invalid Hadoop shape: esri type $other")
    }
  }

  // ---------- spherical geography ----------

  // the reference's constants (GeoFunctions.java:141-142)
  private val EarthRadiusKm = 6371.01
  private val EarthRadiusM = EarthRadiusKm * 1000.0

  private def checkLatitude(v: Double): Unit =
    require(v >= -90 && v <= 90 && !v.isNaN, "Latitude must be between -90 and 90")
  private def checkLongitude(v: Double): Unit =
    require(v >= -180 && v <= 180 && !v.isNaN, "Longitude must be between -180 and 180")

  /** Validates coordinate ranges + geometry class; geography shares the
    * WKT representation (the reference's to_spherical_geography is also
    * an identity on the serialized form after validation).
    */
  def toSphericalGeography(g: Geom): Geom = {
    GeoExtras.allPoints(g).foreach { p => checkLongitude(p.x); checkLatitude(p.y) }
    g match {
      case Point(_) | MultiPoint(_) | LineString(_) | MultiLineString(_) |
           Polygon(_) | MultiPolygon(_) | EmptyGeom => g
      case Collection(_) => throw new IllegalArgumentException(
        "Cannot convert geometry of this type to spherical geography: GeometryCollection")
    }
  }

  /** Vincenty-form great-circle distance in KILOMETERS on the reference's
    * 6371.01 km sphere (GeoFunctions.greatCircleDistance `:1511`) —
    * accurate down to antipodal points, unlike plain haversine.
    */
  def greatCircleKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    checkLatitude(lat1); checkLongitude(lon1); checkLatitude(lat2); checkLongitude(lon2)
    val phi1 = math.toRadians(lat1); val phi2 = math.toRadians(lat2)
    val sin1 = math.sin(phi1); val cos1 = math.cos(phi1)
    val sin2 = math.sin(phi2); val cos2 = math.cos(phi2)
    val dLam = math.toRadians(lon1) - math.toRadians(lon2)
    val cosDLam = math.cos(dLam)
    val t1 = cos2 * math.sin(dLam)
    val t2 = cos1 * sin2 - sin1 * cos2 * cosDLam
    val t3 = sin1 * sin2 + cos1 * cos2 * cosDLam
    math.atan2(math.sqrt(t1 * t1 + t2 * t2), t3) * EarthRadiusKm
  }

  /** ST_Distance on SphericalGeography (points), meters. */
  def sphericalDistanceM(a: Geom, b: Geom): Double = (a, b) match {
    case (Point(p), Point(q)) => greatCircleKm(p.y, p.x, q.y, q.x) * 1000
    case _ => throw new IllegalArgumentException(
      "When applied to SphericalGeography inputs, ST_Distance only supports Point")
  }

  /** ST_Length on SphericalGeography (line strings), meters. */
  def sphericalLengthM(g: Geom): Double = g match {
    case LineString(ps) =>
      ps.sliding(2).collect { case Vector(a, b) => greatCircleKm(a.y, a.x, b.y, b.x) }.sum * 1000
    case MultiLineString(ls) => ls.map(l => sphericalLengthM(LineString(l))).sum
    case _ => throw new IllegalArgumentException(
      "When applied to SphericalGeography inputs, ST_Length only supports LineString or MultiLineString")
  }

  /** ST_Area on SphericalGeography via per-ring spherical excess
    * (reference computeSphericalExcess: L'Huilier edge terms
    * 2·atan2(tan(Δλ/2)(t1+t2), 1+t1·t2)), m². Holes subtract. Valid for
    * pole-free rings — the same pre-condition the reference's
    * bearing-correction handles; documented limitation here.
    */
  def sphericalAreaM2(g: Geom): Double = g match {
    case Polygon(rings) if rings.nonEmpty =>
      def ringExcess(r0: Vector[Pt]): Double = {
        val r = dedupClosed(r0)
        require(r.length >= 3, "Polygon is not valid: a loop contains less then 3 vertices.")
        var excess = 0.0
        var prev = r.last
        for (p <- r) {
          val t1 = math.tan(math.toRadians(prev.y) / 2)
          val t2 = math.tan(math.toRadians(p.y) / 2)
          val dLam = math.toRadians(p.x) - math.toRadians(prev.x)
          excess += 2 * math.atan2(math.tan(dLam / 2) * (t1 + t2), 1 + t1 * t2)
          prev = p
        }
        math.abs(excess)
      }
      val shell = ringExcess(rings.head)
      val holes = rings.tail.map(ringExcess).sum
      math.abs((shell - holes)) * EarthRadiusM * EarthRadiusM
    case MultiPolygon(polys) => polys.map(sphericalAreaM2).sum
    case _ => throw new IllegalArgumentException(
      "When applied to SphericalGeography inputs, ST_Area only supports Polygon or MultiPolygon")
  }
}

/** geometry_union_agg (reference aggregation/GeometryUnionAgg.java):
  * n-ary point-set union as an aggregate. Buffer = running union WKT —
  * associative and commutative, so partial aggregation and arbitrary
  * merge order are sound.
  */
class GeometryUnionAggregator
    extends org.apache.spark.sql.expressions.Aggregator[String, String, String] {
  import org.apache.spark.sql.{Encoder, Encoders}
  override def zero: String = null
  override def reduce(buf: String, in: String): String =
    if (in == null) buf
    else if (buf == null) Wkt.write(GeoRelations.unionAll(Seq(Wkt.parse(in))))
    else Wkt.write(GeoRelations.unionAll(Seq(Wkt.parse(buf), Wkt.parse(in))))
  override def merge(a: String, b: String): String = reduce(a, b)
  override def finish(buf: String): String = buf
  override def bufferEncoder: Encoder[String] = Encoders.STRING
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** convex_hull_agg (reference aggregation/ConvexHullAggregation.java).
  * Buffer = MULTIPOINT of the running hull's vertices: re-hulling after
  * every reduce keeps the buffer at the hull's vertex count (bounded by
  * the output complexity, not the input size), so partial aggregates
  * stay small on skewed groups.
  */
class ConvexHullAggregator
    extends org.apache.spark.sql.expressions.Aggregator[String, String, String] {
  import org.apache.spark.sql.{Encoder, Encoders}
  override def zero: String = null
  private def hullOfPoints(ps: Vector[Wkt.Pt]): String =
    Wkt.write(Wkt.MultiPoint(GeoExtras.allPoints(GeoExtras.convexHull(Wkt.MultiPoint(ps)))))
  override def reduce(buf: String, in: String): String =
    if (in == null) buf
    else {
      val prev = if (buf == null) Vector.empty else GeoExtras.allPoints(Wkt.parse(buf))
      hullOfPoints(prev ++ GeoExtras.allPoints(Wkt.parse(in)))
    }
  override def merge(a: String, b: String): String = reduce(a, b)
  override def finish(buf: String): String =
    if (buf == null) null
    else Wkt.write(GeoExtras.convexHull(Wkt.parse(buf)))
  override def bufferEncoder: Encoder[String] = Encoders.STRING
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
