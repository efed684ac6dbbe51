package graft.functions

import Wkt._

/** Geospatial tranche 3 — WKB IO, convex hull, simplification, and the
  * geometry-accessor family from the reference's geospatial plugin
  * (`plugin/trino-geospatial/.../GeoFunctions.java`: ST_AsBinary `:257`,
  * ST_GeomFromBinary `:296`, ST_ConvexHull `:472`, ST_Simplify,
  * ST_ExteriorRing / ST_InteriorRingN / ST_GeometryN / ST_PointN and the
  * min/max/type/dimension accessors).
  *
  * WKB is the OGC 1.2 well-known-binary layout: 1 byte order marker
  * (0 = big-endian, 1 = little-endian), uint32 geometry type
  * (1 point … 7 collection), then doubles; multi-geometries and
  * collections nest complete WKB records per element. We always WRITE
  * little-endian (the de-facto standard, what PostGIS/GEOS emit) and
  * READ either byte order.
  */
object GeoExtras extends Serializable {

  // ---- WKB ------------------------------------------------------------

  private val TPoint = 1
  private val TLineString = 2
  private val TPolygon = 3
  private val TMultiPoint = 4
  private val TMultiLineString = 5
  private val TMultiPolygon = 6
  private val TCollection = 7

  def toWkb(g: Geom): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeGeom(out, g)
    out.toByteArray
  }

  private def writeGeom(out: java.io.ByteArrayOutputStream, g: Geom): Unit = {
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u32(v: Int): Unit = { u8(v); u8(v >>> 8); u8(v >>> 16); u8(v >>> 24) }
    def f64(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 0
      while (i < 8) { u8((bits >>> (8 * i)).toInt); i += 1 }
    }
    def pt(p: Pt): Unit = { f64(p.x); f64(p.y) }
    def ring(r: Vector[Pt]): Unit = { u32(r.length); r.foreach(pt) }
    u8(1) // little-endian
    g match {
      case Point(p) => u32(TPoint); pt(p)
      case LineString(ps) => u32(TLineString); ring(ps)
      case Polygon(rs) => u32(TPolygon); u32(rs.length); rs.foreach(ring)
      case MultiPoint(ps) =>
        u32(TMultiPoint); u32(ps.length)
        ps.foreach(p => writeGeom(out, Point(p)))
      case MultiLineString(ls) =>
        u32(TMultiLineString); u32(ls.length)
        ls.foreach(l => writeGeom(out, LineString(l)))
      case MultiPolygon(polys) =>
        u32(TMultiPolygon); u32(polys.length)
        polys.foreach(writeGeom(out, _))
      case Collection(gs) =>
        u32(TCollection); u32(gs.length)
        gs.foreach(writeGeom(out, _))
      case EmptyGeom => u32(TCollection); u32(0)
    }
  }

  def fromWkb(bytes: Array[Byte]): Geom = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val g = readGeom(buf)
    g
  }

  private def readGeom(buf: java.nio.ByteBuffer): Geom = {
    val order = buf.get()
    buf.order(if (order == 0) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
    val tpe = buf.getInt()
    def pt(): Pt = Pt(buf.getDouble(), buf.getDouble())
    def ring(): Vector[Pt] = Vector.fill(buf.getInt())(pt())
    tpe match {
      case TPoint => Point(pt())
      case TLineString => LineString(ring())
      case TPolygon => Polygon(Vector.fill(buf.getInt())(ring()))
      case TMultiPoint =>
        MultiPoint(Vector.fill(buf.getInt())(readGeom(buf) match {
          case Point(p) => p
          case other => throw new IllegalArgumentException(s"bad WKB multipoint element: $other")
        }))
      case TMultiLineString =>
        MultiLineString(Vector.fill(buf.getInt())(readGeom(buf) match {
          case LineString(ps) => ps
          case other => throw new IllegalArgumentException(s"bad WKB multilinestring element: $other")
        }))
      case TMultiPolygon =>
        MultiPolygon(Vector.fill(buf.getInt())(readGeom(buf) match {
          case p: Polygon => p
          case other => throw new IllegalArgumentException(s"bad WKB multipolygon element: $other")
        }))
      case TCollection =>
        val n = buf.getInt()
        if (n == 0) EmptyGeom else Collection(Vector.fill(n)(readGeom(buf)))
      case other => throw new IllegalArgumentException(s"unsupported WKB type: $other")
    }
  }

  // ---- convex hull (Andrew's monotone chain, O(n log n)) ---------------

  def convexHull(g: Geom): Geom = {
    val ps = allPoints(g).distinct.sortBy(p => (p.x, p.y))
    if (ps.isEmpty) return EmptyGeom
    if (ps.length == 1) return Point(ps.head)
    def cross(o: Pt, a: Pt, b: Pt): Double =
      (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
    def chain(pts: Vector[Pt]): Vector[Pt] = {
      val h = scala.collection.mutable.ArrayBuffer.empty[Pt]
      for (p <- pts) {
        while (h.length >= 2 && cross(h(h.length - 2), h(h.length - 1), p) <= 0)
          h.remove(h.length - 1)
        h += p
      }
      h.toVector
    }
    val lower = chain(ps)
    val upper = chain(ps.reverse)
    val hull = lower.dropRight(1) ++ upper.dropRight(1)
    if (hull.length == 2) LineString(hull) // collinear input
    else Polygon(Vector(hull :+ hull.head)) // CCW, starts at min (x, y)
  }

  // ---- Douglas–Peucker simplification ----------------------------------

  private def dpSimplify(pts: Vector[Pt], tol: Double): Vector[Pt] = {
    if (pts.length < 3) return pts
    val keep = Array.fill(pts.length)(false)
    keep(0) = true; keep(pts.length - 1) = true
    def perpDist(p: Pt, a: Pt, b: Pt): Double = {
      val dx = b.x - a.x; val dy = b.y - a.y
      val l = math.hypot(dx, dy)
      if (l == 0) math.hypot(p.x - a.x, p.y - a.y)
      else math.abs(dy * p.x - dx * p.y + b.x * a.y - b.y * a.x) / l
    }
    def rec(lo: Int, hi: Int): Unit = if (hi > lo + 1) {
      var maxD = -1.0; var maxI = -1
      var i = lo + 1
      while (i < hi) {
        val d = perpDist(pts(i), pts(lo), pts(hi))
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      if (maxD > tol) { keep(maxI) = true; rec(lo, maxI); rec(maxI, hi) }
    }
    rec(0, pts.length - 1)
    pts.indices.collect { case i if keep(i) => pts(i) }.toVector
  }

  def simplify(g: Geom, tol: Double): Geom = {
    require(tol >= 0, "ST_Simplify tolerance must be non-negative")
    if (tol == 0) return g
    def ringSimplify(r: Vector[Pt]): Vector[Pt] = {
      // closed ring: pin the start vertex, simplify the open walk, re-close;
      // fall back to the original if the ring would collapse (< 3 distinct)
      val s = dpSimplify(r, tol)
      if (s.length >= 4) s else r
    }
    g match {
      case LineString(ps) => LineString(dpSimplify(ps, tol))
      case Polygon(rs) => Polygon(rs.map(ringSimplify))
      case MultiPolygon(polys) => MultiPolygon(polys.map(p => Polygon(p.rings.map(ringSimplify))))
      case MultiLineString(ls) => MultiLineString(ls.map(dpSimplify(_, tol)))
      case other => other // points are already minimal
    }
  }

  // ---- accessors -------------------------------------------------------

  def allPoints(g: Geom): Vector[Pt] = g match {
    case Point(p) => Vector(p)
    case LineString(ps) => ps
    case Polygon(rs) => rs.flatten
    case MultiPoint(ps) => ps
    case MultiLineString(ls) => ls.flatten
    case MultiPolygon(polys) => polys.flatMap(p => p.rings.flatten)
    case Collection(gs) => gs.flatMap(allPoints)
    case EmptyGeom => Vector.empty
  }

  def geometryType(g: Geom): String = g match {
    case _: Point => "ST_Point"
    case _: LineString => "ST_LineString"
    case _: Polygon => "ST_Polygon"
    case _: MultiPoint => "ST_MultiPoint"
    case _: MultiLineString => "ST_MultiLineString"
    case _: MultiPolygon => "ST_MultiPolygon"
    case _: Collection | EmptyGeom => "ST_GeomCollection"
  }

  def dimension(g: Geom): Int = g match {
    case _: Point | _: MultiPoint => 0
    case _: LineString | _: MultiLineString => 1
    case _: Polygon | _: MultiPolygon => 2
    case Collection(gs) => if (gs.isEmpty) 0 else gs.map(dimension).max
    case EmptyGeom => 0
  }

  def numGeometries(g: Geom): Int = g match {
    case EmptyGeom => 0
    case MultiPoint(ps) => ps.length
    case MultiLineString(ls) => ls.length
    case MultiPolygon(polys) => polys.length
    case Collection(gs) => gs.length
    case _ => 1
  }

  /** 1-based, Trino convention; null (None) out of range. */
  def geometryN(g: Geom, n: Int): Option[Geom] = {
    val parts: Vector[Geom] = g match {
      case MultiPoint(ps) => ps.map(Point.apply)
      case MultiLineString(ls) => ls.map(LineString.apply)
      case MultiPolygon(polys) => polys
      case Collection(gs) => gs
      case EmptyGeom => Vector.empty
      case single => Vector(single)
    }
    if (n >= 1 && n <= parts.length) Some(parts(n - 1)) else None
  }

  def exteriorRing(g: Geom): Option[Geom] = g match {
    case Polygon(rs) if rs.nonEmpty => Some(LineString(rs.head))
    case _ => None
  }

  def numInteriorRing(g: Geom): Option[Int] = g match {
    case Polygon(rs) if rs.nonEmpty => Some(rs.length - 1)
    case _ => None
  }

  def interiorRingN(g: Geom, n: Int): Option[Geom] = g match {
    case Polygon(rs) if n >= 1 && n < rs.length => Some(LineString(rs(n)))
    case _ => None
  }

  def pointN(g: Geom, n: Int): Option[Geom] = g match {
    case LineString(ps) if n >= 1 && n <= ps.length => Some(Point(ps(n - 1)))
    case _ => None
  }

  def isClosed(g: Geom): Option[Boolean] = g match {
    case LineString(ps) => Some(ps.length > 1 && ps.head == ps.last)
    case MultiLineString(ls) => Some(ls.forall(ps => ps.length > 1 && ps.head == ps.last))
    case _ => None
  }

  def isEmpty(g: Geom): Boolean = g match {
    case EmptyGeom => true
    case Collection(gs) => gs.isEmpty
    case _ => allPoints(g).isEmpty
  }
}
