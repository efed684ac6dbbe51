package graft.functions

import Wkt._

/** Constructive planar geometry — the second geospatial tranche (r2
  * verdict #8): ST_Intersection (`plugin/trino-geospatial/.../
  * GeoFunctions.java:1236`), ST_Union (`:843`), ST_Buffer (`:397`).
  *
  * Polygon×polygon clipping is Greiner–Hormann ("Efficient clipping of
  * arbitrary polygons", ACM TOG 17(2), 1998): intersect the two vertex
  * rings, insert crossing vertices into both (alpha-ordered), mark
  * entry/exit by point-in-polygon parity, then trace result rings —
  * INTERSECTION walks forward from entries, UNION walks the complement
  * marking. Handles simple (non-self-intersecting) shells without holes;
  * coincident-edge degeneracies are out of scope and raise (the reference
  * delegates those to Esri's full arrangement machinery).
  *
  * ST_Buffer: points → regular 64-gon disc; polygons → Minkowski sum with
  * the disc (outward edge offset + arc-sampled corners) for CONVEX
  * shells, the dominant analytic use (buffer-then-contains joins).
  */
object GeoConstructive extends Serializable {

  private val Eps = 1e-9

  // ---- shared ring utilities ------------------------------------------

  /** Open ring (no repeated last point), forced counter-clockwise. */
  private def openCcw(r: Vector[Pt]): Vector[Pt] = {
    val open = if (r.length > 1 && r.head == r.last) r.dropRight(1) else r
    var s = 0.0
    var i = 0
    val n = open.length
    while (i < n) {
      val j = (i + 1) % n
      s += (open(j).x - open(i).x) * (open(j).y + open(i).y)
      i += 1
    }
    if (s > 0) open.reverse else open // negative sum = CCW in this form
  }

  private def closeRing(r: Vector[Pt]): Vector[Pt] = r :+ r.head

  private def pointInRing(ring: Vector[Pt], p: Pt): Boolean = {
    var inside = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val a = ring(i); val b = ring(j)
      if ((a.y > p.y) != (b.y > p.y) &&
          p.x < (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Segment intersection with parametric positions; None if parallel or
    * outside (0,1) on either segment (touching endpoints → degenerate,
    * handled by caller's perturbation check).
    */
  private def segX(p1: Pt, p2: Pt, q1: Pt, q2: Pt): Option[(Double, Double, Pt)] = {
    val dx1 = p2.x - p1.x; val dy1 = p2.y - p1.y
    val dx2 = q2.x - q1.x; val dy2 = q2.y - q1.y
    val den = dx1 * dy2 - dy1 * dx2
    if (math.abs(den) < Eps) return None
    val t = ((q1.x - p1.x) * dy2 - (q1.y - p1.y) * dx2) / den
    val u = ((q1.x - p1.x) * dy1 - (q1.y - p1.y) * dx1) / den
    if (t <= Eps || t >= 1 - Eps || u <= Eps || u >= 1 - Eps) None
    else Some((t, u, Pt(p1.x + t * dx1, p1.y + t * dy1)))
  }

  // ---- Greiner–Hormann ------------------------------------------------

  private final class V(val p: Pt) {
    var next: V = _
    var prev: V = _
    var neighbor: V = _ // twin vertex in the other ring (intersections)
    var intersect = false
    var entry = false
    var visited = false
  }

  private def buildList(ring: Vector[Pt]): V = {
    val vs = ring.map(new V(_))
    for (i <- vs.indices) {
      vs(i).next = vs((i + 1) % vs.length)
      vs(i).prev = vs((i + vs.length - 1) % vs.length)
    }
    vs.head
  }

  private def vertices(start: V): Vector[V] = {
    val b = Vector.newBuilder[V]
    var c = start
    while ({ b += c; c = c.next; c ne start }) ()
    b.result()
  }

  /** Insert intersection vertices into both rings; returns count. */
  private def insertIntersections(subj: V, clip: V): Int = {
    var count = 0
    for (sv <- vertices(subj).filterNot(_.intersect)) {
      // collect intersections on edge (sv, sv.nextNonIntersect)
      val sEnd = { var c = sv.next; while (c.intersect) c = c.next; c }
      val hits = Vector.newBuilder[(Double, Double, Pt, V, V)]
      for (cv <- vertices(clip).filterNot(_.intersect)) {
        val cEnd = { var c = cv.next; while (c.intersect) c = c.next; c }
        segX(sv.p, sEnd.p, cv.p, cEnd.p).foreach { case (t, u, pt) =>
          hits += ((t, u, pt, cv, cEnd))
        }
      }
      // insert into subject edge in t order; into clip edge by u position
      for ((t, u, pt, cv, cEnd) <- hits.result().sortBy(_._1)) {
        val vs = new V(pt); vs.intersect = true
        val vc = new V(pt); vc.intersect = true
        vs.neighbor = vc; vc.neighbor = vs
        // insert keeping parametric order among already-inserted vertices
        var at = sv
        while (at.next != sEnd && ordAlong(sv.p, sEnd.p, at.next.p) < t) at = at.next
        link(at, vs, at.next)
        var ac = cv
        while (ac.next != cEnd && ordAlong(cv.p, cEnd.p, ac.next.p) < u) ac = ac.next
        link(ac, vc, ac.next)
        count += 1
      }
    }
    count
  }

  private def ordAlong(a: Pt, b: Pt, p: Pt): Double = {
    val dx = b.x - a.x; val dy = b.y - a.y
    if (math.abs(dx) >= math.abs(dy)) (p.x - a.x) / dx else (p.y - a.y) / dy
  }

  private def link(before: V, v: V, after: V): Unit = {
    before.next = v; v.prev = before
    v.next = after; after.prev = v
  }

  /** Alternate entry/exit flags along a ring, starting from whether the
    * first (non-intersection) vertex is inside the other ring. For
    * intersection: first intersection is ENTRY iff start is outside.
    * Union uses the inverted marking.
    */
  private def markEntries(start: V, otherRing: Vector[Pt], forUnion: Boolean): Unit = {
    var entry = !pointInRing(otherRing, start.p)
    if (forUnion) entry = !entry
    var c = start
    do {
      if (c.intersect) { c.entry = entry; entry = !entry }
      c = c.next
    } while (c ne start)
  }

  private def trace(subj: V): Vector[Vector[Pt]] = {
    val out = Vector.newBuilder[Vector[Pt]]
    var start = firstUnvisited(subj)
    while (start != null) {
      val ring = Vector.newBuilder[Pt]
      var c = start
      var guard = 0
      val limit = 1 << 20 // malformed-degeneracy backstop, never hit on simple input
      do {
        c.visited = true
        if (c.neighbor != null) c.neighbor.visited = true
        ring += c.p
        // walk along the current list in the direction the flag dictates
        // until the next intersection, then jump to its twin in the other list
        var n = if (c.entry) c.next else c.prev
        while (!n.intersect) {
          ring += n.p
          n = if (c.entry) n.next else n.prev
        }
        n.visited = true
        if (n.neighbor != null) n.neighbor.visited = true
        c = n.neighbor
        guard += 1
      } while ((c ne start) && guard < limit)
      require(guard < limit, "polygon clipping did not terminate (degenerate input)")
      out += ring.result()
      start = firstUnvisited(subj)
    }
    out.result()
  }

  private def firstUnvisited(start: V): V = {
    var c = start
    do {
      if (c.intersect && !c.visited) return c
      c = c.next
    } while (c ne start)
    null
  }

  private def shell(g: Geom): Vector[Pt] = g match {
    case Polygon(rings) =>
      require(rings.length == 1, "constructive ops support hole-free polygons")
      openCcw(rings.head)
    case other => throw new IllegalArgumentException(s"expected POLYGON, got $other")
  }

  // ---- three-mode ring clip (hole-free rings in, pieces out) ----------

  private sealed trait Mode
  private case object MInter extends Mode
  private case object MUnion extends Mode
  private case object MDiff extends Mode // subject minus clip

  /** Clip two simple rings. Each returned Polygon is hole-free EXCEPT the
    * MDiff containment case (clip strictly inside subject), which returns
    * one polygon whose second ring is the hole.
    */
  private def clipRings(ra0: Vector[Pt], rb0: Vector[Pt], mode: Mode): Vector[Polygon] = {
    val ra = openCcw(ra0); val rb = openCcw(rb0)
    val subj = buildList(ra); val clip = buildList(rb)
    val n = insertIntersections(subj, clip)
    def poly(r: Vector[Pt]) = Polygon(Vector(closeRing(r)))
    if (n == 0) {
      val aInB = ra.forall(p => pointInRing(rb, p))
      val bInA = rb.forall(p => pointInRing(ra, p))
      return mode match {
        case MInter =>
          if (aInB) Vector(poly(ra)) else if (bInA) Vector(poly(rb)) else Vector.empty
        case MUnion =>
          if (aInB) Vector(poly(rb)) else if (bInA) Vector(poly(ra))
          else Vector(poly(ra), poly(rb))
        case MDiff =>
          if (aInB) Vector.empty
          else if (bInA) Vector(Polygon(Vector(closeRing(ra), closeRing(rb))))
          else Vector(poly(ra))
      }
    }
    // entry parity: intersection = both direct; union = both inverted;
    // difference = SUBJECT inverted only (subject walked forward where it
    // is outside the clip, clip boundary walked backward inside) —
    // inverting the clip instead yields clip∖subject
    markEntries(subj, rb, forUnion = mode != MInter)
    markEntries(clip, ra, forUnion = mode == MUnion)
    trace(subj).filter(_.length >= 3).map(r => poly(openCcw(r)))
  }

  private def shellOf(p: Polygon): Vector[Pt] = p.rings.head
  private def holesOf(p: Polygon): Vector[Vector[Pt]] = p.rings.tail

  private def ringsIntersect(a: Vector[Pt], b: Vector[Pt]): Boolean =
    Wkt.intersects(Polygon(Vector(closeRing(openCcw(a)))),
                   Polygon(Vector(closeRing(openCcw(b)))))

  /** Union-merge rings until pairwise disjoint (hole rings from the two
    * inputs may overlap; a point is outside the result iff it lies in ANY
    * hole, so overlapping holes merge into one).
    */
  private def mergeRings(rs0: Vector[Vector[Pt]]): Vector[Vector[Pt]] = {
    var rs = rs0
    var changed = true
    while (changed) {
      changed = false
      val idx = (for {
        i <- rs.indices; j <- (i + 1) until rs.length
        if ringsIntersect(rs(i), rs(j))
      } yield (i, j)).headOption
      idx.foreach { case (i, j) =>
        val u = clipRings(rs(i), rs(j), MUnion)
        require(u.forall(_.rings.length == 1),
          "hole merge produced a nested ring (hole-in-hole input out of scope)")
        rs = rs.zipWithIndex.collect { case (r, k) if k != i && k != j => r } ++
          u.map(shellOf)
        changed = true
      }
    }
    rs
  }

  private def geomOf(pieces: Vector[Polygon]): Geom = pieces match {
    case Vector() => EmptyGeom
    case Vector(p) => p
    case ps => MultiPolygon(ps)
  }

  /** Subtract hole rings from a piece: clip each hole to the piece shell,
    * merge overlaps, drop the piece if a hole swallows it.
    */
  private def subtractHoles(piece: Polygon, holes: Vector[Vector[Pt]]): Option[Polygon] = {
    val sh = openCcw(shellOf(piece))
    val clipped = holes.flatMap { h =>
      clipRings(h, shellOf(piece), MInter).map(p => openCcw(shellOf(p)))
    }
    val merged = mergeRings(clipped)
    if (merged.exists(h => sh.forall(p => pointInRing(h, p) || h.contains(p))))
      None // hole covers the whole piece
    else Some(Polygon(piece.rings ++ merged.map(closeRing)))
  }

  /** Polygon×polygon with holes:
    * x ∈ A∩B ⟺ x ∈ shellA∩shellB and x is in no hole of either.
    */
  private def interPolygons(a: Polygon, b: Polygon): Geom = {
    val s = clipRings(shellOf(a), shellOf(b), MInter)
    val holes = holesOf(a) ++ holesOf(b)
    geomOf(s.flatMap(piece => subtractHoles(piece, holes)))
  }

  /** x is a hole of A∪B ⟺ x ∉ A and x ∉ B inside the outer shell union:
    * holes(A∪B) = (hᵃ∩hᵇ) ∪ (hᵃ∖shellB) ∪ (hᵇ∖shellA) — three pairwise
    * disjoint families, so no merge pass is needed.
    */
  private def unionPolygons(a: Polygon, b: Polygon): Geom = {
    val u = clipRings(shellOf(a), shellOf(b), MUnion)
    val ha = holesOf(a); val hb = holesOf(b)
    def diffRings(r: Vector[Pt], s: Vector[Pt]): Vector[Vector[Pt]] =
      clipRings(r, s, MDiff).map { p =>
        require(p.rings.length == 1,
          "hole minus shell produced an island (nested geometry out of scope)")
        openCcw(shellOf(p))
      }
    val holes =
      (for (x <- ha; y <- hb; p <- clipRings(x, y, MInter)) yield openCcw(shellOf(p))) ++
        ha.flatMap(diffRings(_, shellOf(b))) ++
        hb.flatMap(diffRings(_, shellOf(a)))
    val out = u.map { piece =>
      val sh = shellOf(piece)
      val mine = holes.filter(h => pointInRing(openCcw(sh), h.head))
      Polygon(piece.rings ++ mine.map(closeRing))
    }
    geomOf(out)
  }

  /** x ∈ A∖B ⟺ x ∈ shellA, not in a hole of A, and (outside shellB or in
    * a hole of B): base = (shellA∖shellB) ∪ (shellA∩hᵇ), minus holes of A.
    */
  private def diffPolygons(a: Polygon, b: Polygon): Geom = {
    val base = clipRings(shellOf(a), shellOf(b), MDiff) ++
      holesOf(b).flatMap(hb => clipRings(shellOf(a), hb, MInter))
    geomOf(base.flatMap(piece => subtractHoles(piece, holesOf(a))))
  }

  def intersection(a: Geom, b: Geom): Geom = (a, b) match {
    case (p @ Point(_), g) => if (Wkt.contains(g, p)) p else EmptyGeom
    case (g, p @ Point(_)) => if (Wkt.contains(g, p)) p else EmptyGeom
    case (pa: Polygon, pb: Polygon) => interPolygons(pa, pb)
    case _ => throw new IllegalArgumentException(
      s"ST_Intersection supports point/polygon inputs, got ${Wkt.write(a)} × ${Wkt.write(b)}")
  }

  def union(a: Geom, b: Geom): Geom = (a, b) match {
    case (Point(p1), Point(p2)) =>
      if (p1 == p2) Point(p1) else MultiPoint(Vector(p1, p2).sortBy(p => (p.x, p.y)))
    case (pa: Polygon, pb: Polygon) => unionPolygons(pa, pb)
    case _ => throw new IllegalArgumentException(
      s"ST_Union supports point/polygon inputs, got ${Wkt.write(a)} × ${Wkt.write(b)}")
  }

  def difference(a: Geom, b: Geom): Geom = (a, b) match {
    case (p @ Point(_), g) => if (Wkt.contains(g, p)) EmptyGeom else p
    case (pa: Polygon, Point(_)) => pa // a point has no area to remove
    // point-set-equal polygons difference to nothing — without this the
    // no-crossing fallback of the clipper would return the minuend whole
    case (pa: Polygon, pb: Polygon) if GeoRelations.equalsGeom(pa, pb) => EmptyGeom
    case (pa: Polygon, pb: Polygon) => diffPolygons(pa, pb)
    case _ => throw new IllegalArgumentException(
      s"ST_Difference supports point/polygon inputs, got ${Wkt.write(a)} × ${Wkt.write(b)}")
  }

  def symDifference(a: Geom, b: Geom): Geom = {
    def pieces(g: Geom): Vector[Polygon] = g match {
      case p: Polygon => Vector(p)
      case MultiPolygon(ps) => ps
      case EmptyGeom => Vector.empty
      case other => throw new IllegalArgumentException(
        s"ST_SymDifference supports polygon inputs, got ${Wkt.write(other)}")
    }
    (a, b) match {
      case (Point(p1), Point(p2)) =>
        if (p1 == p2) EmptyGeom
        else MultiPoint(Vector(p1, p2).sortBy(p => (p.x, p.y)))
      case _ => geomOf(pieces(difference(a, b)) ++ pieces(difference(b, a)))
    }
  }

  /** Disc approximation segments for buffers. */
  private val Segs = 64

  def buffer(g: Geom, r: Double): Geom = {
    require(r >= 0, "ST_Buffer with negative distance not supported")
    if (r == 0) return g
    g match {
      case Point(c) =>
        val ring = (0 until Segs).map { i =>
          val th = 2 * math.Pi * i / Segs
          Pt(c.x + r * math.cos(th), c.y + r * math.sin(th))
        }.toVector
        Polygon(Vector(closeRing(ring)))
      case p: Polygon =>
        val ring = shell(p)
        require(isConvex(ring), "ST_Buffer on polygons requires a convex shell")
        val n = ring.length
        val out = Vector.newBuilder[Pt]
        for (i <- 0 until n) {
          val prev = ring((i + n - 1) % n); val cur = ring(i); val next = ring((i + 1) % n)
          // outward normals of the two incident edges (CCW ring → outward = right-hand)
          val n1 = normal(prev, cur); val n2 = normal(cur, next)
          var a1 = math.atan2(n1._2, n1._1)
          var a2 = math.atan2(n2._2, n2._1)
          if (a2 < a1) a2 += 2 * math.Pi
          val steps = math.max(1, math.ceil((a2 - a1) / (2 * math.Pi / Segs)).toInt)
          for (k <- 0 to steps) {
            val th = a1 + (a2 - a1) * k / steps
            out += Pt(cur.x + r * math.cos(th), cur.y + r * math.sin(th))
          }
        }
        Polygon(Vector(closeRing(out.result())))
      case other => throw new IllegalArgumentException(
        s"ST_Buffer supports POINT and convex POLYGON, got ${Wkt.write(other)}")
    }
  }

  private def normal(a: Pt, b: Pt): (Double, Double) = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val len = math.hypot(dx, dy)
    (dy / len, -dx / len) // right-hand normal of a CCW edge = outward
  }

  private def isConvex(ring: Vector[Pt]): Boolean = {
    val n = ring.length
    var sign = 0
    for (i <- 0 until n) {
      val a = ring(i); val b = ring((i + 1) % n); val c = ring((i + 2) % n)
      val cr = (b.x - a.x) * (c.y - b.y) - (b.y - a.y) * (c.x - b.x)
      if (math.abs(cr) > Eps) {
        val s = if (cr > 0) 1 else -1
        if (sign == 0) sign = s else if (sign != s) return false
      }
    }
    true
  }
}
