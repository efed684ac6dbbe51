package graft.functions

import org.apache.spark.sql.SparkSession

/** Minimal geospatial pack — the planar subset of the reference's
  * geospatial plugin (`plugin/trino-geospatial/.../GeoFunctions.java`,
  * 75 ST_* functions; SURVEY §2.10 optional surface). Coordinates are
  * plain doubles / double arrays (no geometry UDT): distance,
  * bounding-box and ray-casting polygon containment — enough for the
  * broadcast spatial-join pattern (`ExtractSpatialJoins.java:151` maps to
  * a broadcast join with a containment residual here).
  */
object GeoFunctions {
  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("st_distance", (x1: Double, y1: Double, x2: Double, y2: Double) =>
      math.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)))
    u.register("st_contains_box",
      (xmin: Double, ymin: Double, xmax: Double, ymax: Double, x: Double, y: Double) =>
        x >= xmin && x <= xmax && y >= ymin && y <= ymax)
    // ray casting; polygon as parallel coordinate arrays, implicit closure
    u.register("st_contains_poly",
      (xs: Seq[Double], ys: Seq[Double], x: Double, y: Double) => {
        var inside = false
        var i = 0
        var j = xs.length - 1
        while (i < xs.length) {
          if ((ys(i) > y) != (ys(j) > y) &&
              x < (xs(j) - xs(i)) * (y - ys(i)) / (ys(j) - ys(i)) + xs(i)) {
            inside = !inside
          }
          j = i; i += 1
        }
        inside
      })
    u.register("st_area_box", (xmin: Double, ymin: Double, xmax: Double, ymax: Double) =>
      math.max(0.0, xmax - xmin) * math.max(0.0, ymax - ymin))

    // --- WKT geometry subset (reference GeoFunctions.java ships 75 ST_*
    // functions over a geometry type; here geometry IS its WKT string —
    // POINT / LINESTRING / POLYGON (with holes) — parsed per call. The
    // predicates (contains/intersects/within) implement standard
    // ray-casting + segment-intersection tests over simple polygons. ---
    u.register("st_geometry_from_text", (wkt: String) =>
      if (wkt == null) null
      else Wkt.write(Wkt.parse(wkt))) // validate + canonicalize
    u.register("st_astext", (g: String) =>
      if (g == null) null else Wkt.write(Wkt.parse(g)))
    u.register("st_point", (x: Double, y: Double) => s"POINT (${Wkt.fmt(x)} ${Wkt.fmt(y)})")
    u.register("st_x", (g: String) => Wkt.parse(g) match {
      case Wkt.Point(p) => java.lang.Double.valueOf(p.x); case _ => null
    })
    u.register("st_y", (g: String) => Wkt.parse(g) match {
      case Wkt.Point(p) => java.lang.Double.valueOf(p.y); case _ => null
    })
    u.register("st_npoints", (g: String) =>
      if (g == null) null else Integer.valueOf(Wkt.npoints(Wkt.parse(g))))
    u.register("st_area", (g: String) => Wkt.area(Wkt.parse(g)))
    u.register("st_length", (g: String) => Wkt.length(Wkt.parse(g)))
    u.register("st_centroid", (g: String) => Wkt.write(Wkt.centroid(Wkt.parse(g))))
    u.register("st_envelope", (g: String) => Wkt.write(Wkt.envelope(Wkt.parse(g))))
    u.register("st_contains", (a: String, b: String) =>
      java.lang.Boolean.valueOf(Wkt.contains(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_within", (a: String, b: String) =>
      java.lang.Boolean.valueOf(Wkt.contains(Wkt.parse(b), Wkt.parse(a))))
    u.register("st_intersects", (a: String, b: String) =>
      java.lang.Boolean.valueOf(Wkt.intersects(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_distance_wkt", (a: String, b: String) =>
      Wkt.distance(Wkt.parse(a), Wkt.parse(b)))
    // constructive tranche (GeoFunctions.java:397/843/1236) — see
    // GeoConstructive scaladoc for the supported input classes
    u.register("st_intersection", (a: String, b: String) =>
      if (a == null || b == null) null
      else Wkt.write(GeoConstructive.intersection(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_union", (a: String, b: String) =>
      if (a == null || b == null) null
      else Wkt.write(GeoConstructive.union(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_buffer", (g: String, r: Double) =>
      if (g == null) null
      else Wkt.write(GeoConstructive.buffer(Wkt.parse(g), r)))
    // --- tranche 3: WKB IO, hull, simplify, accessor family ---
    u.register("st_asbinary", (g: String) =>
      if (g == null) null else GeoExtras.toWkb(Wkt.parse(g)))
    u.register("st_geomfrombinary", (b: Array[Byte]) =>
      if (b == null) null else Wkt.write(GeoExtras.fromWkb(b)))
    u.register("st_convex_hull", (g: String) =>
      if (g == null) null else Wkt.write(GeoExtras.convexHull(Wkt.parse(g))))
    u.register("st_simplify", (g: String, tol: Double) =>
      if (g == null) null else Wkt.write(GeoExtras.simplify(Wkt.parse(g), tol)))
    u.register("st_geometry_type", (g: String) =>
      if (g == null) null else GeoExtras.geometryType(Wkt.parse(g)))
    u.register("st_dimension", (g: String) =>
      if (g == null) null else Integer.valueOf(GeoExtras.dimension(Wkt.parse(g))))
    u.register("st_is_empty", (g: String) =>
      if (g == null) null else java.lang.Boolean.valueOf(GeoExtras.isEmpty(Wkt.parse(g))))
    u.register("st_is_closed", (g: String) =>
      if (g == null) null
      else GeoExtras.isClosed(Wkt.parse(g)).map(java.lang.Boolean.valueOf).orNull)
    u.register("st_num_geometries", (g: String) =>
      if (g == null) null else Integer.valueOf(GeoExtras.numGeometries(Wkt.parse(g))))
    u.register("st_geometry_n", (g: String, n: Int) =>
      if (g == null) null else GeoExtras.geometryN(Wkt.parse(g), n).map(Wkt.write).orNull)
    u.register("st_exterior_ring", (g: String) =>
      if (g == null) null else GeoExtras.exteriorRing(Wkt.parse(g)).map(Wkt.write).orNull)
    u.register("st_num_interior_ring", (g: String) =>
      if (g == null) null
      else GeoExtras.numInteriorRing(Wkt.parse(g)).map(Integer.valueOf).orNull)
    u.register("st_interior_ring_n", (g: String, n: Int) =>
      if (g == null) null else GeoExtras.interiorRingN(Wkt.parse(g), n).map(Wkt.write).orNull)
    u.register("st_point_n", (g: String, n: Int) =>
      if (g == null) null else GeoExtras.pointN(Wkt.parse(g), n).map(Wkt.write).orNull)
    u.register("st_start_point", (g: String) =>
      if (g == null) null else GeoExtras.pointN(Wkt.parse(g), 1).map(Wkt.write).orNull)
    u.register("st_end_point", (g: String) =>
      if (g == null) null else (Wkt.parse(g) match {
        case Wkt.LineString(ps) if ps.nonEmpty => Some(Wkt.write(Wkt.Point(ps.last)))
        case _ => None
      }).orNull)
    u.register("st_xmin", (g: String) =>
      if (g == null) null else minMax(g).map(m => java.lang.Double.valueOf(m._1)).orNull)
    u.register("st_xmax", (g: String) =>
      if (g == null) null else minMax(g).map(m => java.lang.Double.valueOf(m._2)).orNull)
    u.register("st_ymin", (g: String) =>
      if (g == null) null else minMax(g).map(m => java.lang.Double.valueOf(m._3)).orNull)
    u.register("st_ymax", (g: String) =>
      if (g == null) null else minMax(g).map(m => java.lang.Double.valueOf(m._4)).orNull)
    u.register("st_disjoint", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(!Wkt.intersects(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_difference", (a: String, b: String) =>
      if (a == null || b == null) null
      else Wkt.write(GeoConstructive.difference(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_sym_difference", (a: String, b: String) =>
      if (a == null || b == null) null
      else Wkt.write(GeoConstructive.symDifference(Wkt.parse(a), Wkt.parse(b))))
    // great_circle_distance(lat1, lon1, lat2, lon2) → KILOMETERS, exactly
    // the reference's semantics (GeoFunctions.java:1511: Vincenty-form
    // atan2 on the 6371.01 km sphere — NOT haversine, NOT meters)
    u.register("great_circle_distance",
      (lat1: Double, lon1: Double, lat2: Double, lon2: Double) =>
        GeoRelations.greatCircleKm(lat1, lon1, lat2, lon2))

    // --- tranche 4: relations, validity, linear referencing, IO,
    // geography + the reference's exact case-insensitive spellings ---
    u.register("st_boundary", (g: String) =>
      if (g == null) null else Wkt.write(GeoRelations.boundaryOf(Wkt.parse(g))))
    u.register("st_coorddim", (g: String) =>
      if (g == null) null else { Wkt.parse(g); java.lang.Byte.valueOf(2.toByte) })
    u.register("st_issimple", (g: String) =>
      if (g == null) null else java.lang.Boolean.valueOf(GeoRelations.isSimple(Wkt.parse(g))))
    u.register("st_isvalid", (g: String) =>
      if (g == null) null else java.lang.Boolean.valueOf(GeoRelations.isValid(Wkt.parse(g))))
    u.register("geometry_invalid_reason", (g: String) =>
      if (g == null) null else GeoRelations.invalidReason(Wkt.parse(g)).orNull)
    u.register("st_isring", (g: String) =>
      if (g == null) null
      else Wkt.parse(g) match {
        case l @ Wkt.LineString(ps) =>
          java.lang.Boolean.valueOf(ps.length > 1 && ps.head == ps.last && GeoRelations.isSimple(l))
        case other => throw new IllegalArgumentException(
          s"ST_IsRing only applies to LINE_STRING. Input type is: ${GeoExtras.geometryType(other)}")
      })
    u.register("st_crosses", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoRelations.crosses(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_touches", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoRelations.touches(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_overlaps", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoRelations.overlaps(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_equals", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Boolean.valueOf(GeoRelations.equalsGeom(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_relate", (a: String, b: String, pattern: String) =>
      if (a == null || b == null || pattern == null) null
      else java.lang.Boolean.valueOf(GeoRelations.relate(Wkt.parse(a), Wkt.parse(b), pattern)))
    u.register("geometry_nearest_points", (a: String, b: String) =>
      if (a == null || b == null) null
      else {
        val (p, q) = GeoRelations.nearestPoints(Wkt.parse(a), Wkt.parse(b))
        // reference returns row(Geometry, Geometry); a 2-element array of
        // points is the closest representable shape over WKT strings
        Seq(Wkt.write(Wkt.Point(p)), Wkt.write(Wkt.Point(q)))
      })
    u.register("geometry_union", (gs: Seq[String]) =>
      if (gs == null) null
      else {
        val parsed = gs.filter(_ != null).map(Wkt.parse)
        if (parsed.isEmpty) null else Wkt.write(GeoRelations.unionAll(parsed))
      })
    u.register("st_points", (g: String) =>
      if (g == null) null
      else {
        val ps = GeoExtras.allPoints(Wkt.parse(g))
        if (ps.isEmpty) null else ps.map(p => Wkt.write(Wkt.Point(p)))
      })
    u.register("st_geometries", (g: String) =>
      if (g == null) null
      else Wkt.parse(g) match {
        case Wkt.EmptyGeom => null
        case Wkt.MultiPoint(ps) => ps.map(p => Wkt.write(Wkt.Point(p)))
        case Wkt.MultiLineString(ls) => ls.map(l => Wkt.write(Wkt.LineString(l)))
        case Wkt.MultiPolygon(polys) => polys.map(Wkt.write)
        case Wkt.Collection(geoms) => geoms.map(Wkt.write)
        case single => Seq(Wkt.write(single))
      })
    u.register("st_interiorrings", (g: String) =>
      Option(g).map(Wkt.parse).flatMap {
        case Wkt.Polygon(rings) if rings.nonEmpty =>
          Some(rings.tail.map(r => Wkt.write(Wkt.LineString(
            if (r.nonEmpty && r.head != r.last) r :+ r.head else r))))
        case _: Wkt.Polygon => Some(Seq.empty[String])
        case other => throw new IllegalArgumentException(
          s"ST_InteriorRings only applies to POLYGON. Input type is: ${GeoExtras.geometryType(other)}")
      }.orNull)
    u.register("st_envelopeaspts", (g: String) =>
      if (g == null) null
      else minMax(g).map { case (x0, x1, y0, y1) =>
        Seq(Wkt.write(Wkt.Point(Wkt.Pt(x0, y0))), Wkt.write(Wkt.Point(Wkt.Pt(x1, y1))))
      }.orNull)
    // constructors (reference ST_LineFromText :?, ST_LineString, ST_MultiPoint, ST_Polygon)
    u.register("st_linefromtext", (wkt: String) =>
      if (wkt == null) null
      else Wkt.parse(wkt) match {
        case l: Wkt.LineString => Wkt.write(l)
        case other => throw new IllegalArgumentException(
          s"ST_LineFromText only applies to LINE_STRING. Input type is: ${GeoExtras.geometryType(other)}")
      })
    u.register("st_polygon", (wkt: String) =>
      if (wkt == null) null
      else Wkt.parse(wkt) match {
        case p: Wkt.Polygon => Wkt.write(p)
        case other => throw new IllegalArgumentException(
          s"ST_Polygon only applies to POLYGON. Input type is: ${GeoExtras.geometryType(other)}")
      })
    u.register("st_linestring", (points: Seq[String]) =>
      if (points == null) null
      else Wkt.write(Wkt.LineString(points.filter(_ != null).toVector.map(Wkt.parse(_) match {
        case Wkt.Point(p) => p
        case other => throw new IllegalArgumentException(
          s"ST_LineString takes an array of points, got: ${GeoExtras.geometryType(other)}")
      }))))
    u.register("st_multipoint", (points: Seq[String]) =>
      if (points == null) null
      else Wkt.write(Wkt.MultiPoint(points.filter(_ != null).toVector.map(Wkt.parse(_) match {
        case Wkt.Point(p) => p
        case other => throw new IllegalArgumentException(
          s"ST_MultiPoint takes an array of points, got: ${GeoExtras.geometryType(other)}")
      }))))
    // linear referencing
    u.register("line_locate_point", (line: String, point: String) =>
      if (line == null || point == null) null
      else Wkt.parse(point) match {
        case Wkt.Point(p) => java.lang.Double.valueOf(GeoRelations.lineLocatePoint(Wkt.parse(line), p))
        case other => throw new IllegalArgumentException(
          s"Second argument to line_locate_point must be a Point. Got: ${GeoExtras.geometryType(other)}")
      })
    u.register("line_interpolate_point", (line: String, fraction: Double) =>
      if (line == null) null
      else Wkt.write(Wkt.Point(GeoRelations.lineInterpolatePoint(Wkt.parse(line), fraction))))
    u.register("line_interpolate_points", (line: String, step: Double) =>
      if (line == null) null
      else GeoRelations.lineInterpolatePoints(Wkt.parse(line), step)
        .map(p => Wkt.write(Wkt.Point(p))))
    u.register("simplify_geometry", (g: String, tol: Double) =>
      if (g == null) null else Wkt.write(GeoExtras.simplify(Wkt.parse(g), tol)))
    // GeoJSON + encoded-polyline IO
    u.register("to_geojson_geometry", (g: String) =>
      if (g == null) null else GeoRelations.toGeoJson(Wkt.parse(g)))
    u.register("from_geojson_geometry", (j: String) =>
      if (j == null) null else Wkt.write(GeoRelations.fromGeoJson(j)))
    u.register("to_encoded_polyline", (g: String) =>
      if (g == null) null else GeoRelations.toEncodedPolyline(Wkt.parse(g)))
    u.register("from_encoded_polyline", (s: String) =>
      if (s == null) null else Wkt.write(GeoRelations.fromEncodedPolyline(s)))
    u.register("geometry_from_hadoop_shape", (b: Array[Byte]) =>
      if (b == null) null else Wkt.write(GeoRelations.fromHadoopShape(b)))
    // spherical geography (reference overloads ST_Distance/Length/Area by
    // the SphericalGeography type; over WKT strings the overload collapses
    // to the st_geography_* spellings)
    u.register("to_spherical_geography", (g: String) =>
      if (g == null) null else Wkt.write(GeoRelations.toSphericalGeography(Wkt.parse(g))))
    u.register("to_geometry", (g: String) =>
      if (g == null) null else Wkt.write(Wkt.parse(g)))
    u.register("st_geography_distance", (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(GeoRelations.sphericalDistanceM(Wkt.parse(a), Wkt.parse(b))))
    u.register("st_geography_length", (g: String) =>
      if (g == null) null
      else java.lang.Double.valueOf(GeoRelations.sphericalLengthM(Wkt.parse(g))))
    u.register("st_geography_area", (g: String) =>
      if (g == null) null
      else java.lang.Double.valueOf(GeoRelations.sphericalAreaM2(Wkt.parse(g))))
    // aggregates (reference aggregation/GeometryUnionAgg.java,
    // ConvexHullAggregation.java)
    u.register("geometry_union_agg",
      org.apache.spark.sql.functions.udaf(new GeometryUnionAggregator))
    u.register("convex_hull_agg",
      org.apache.spark.sql.functions.udaf(new ConvexHullAggregator))

    // the reference's own case-insensitive spellings (ST_ConvexHull →
    // st_convexhull after SQL lowercasing) — a user pasting a Trino query
    // must not hit "undefined function" because this pack registered only
    // the snake_case variant
    u.register("st_geometryfromtext", (wkt: String) =>
      if (wkt == null) null else Wkt.write(Wkt.parse(wkt)))
    u.register("st_convexhull", (g: String) =>
      if (g == null) null else Wkt.write(GeoExtras.convexHull(Wkt.parse(g))))
    u.register("st_geometrytype", (g: String) =>
      if (g == null) null else GeoExtras.geometryType(Wkt.parse(g)))
    u.register("st_isempty", (g: String) =>
      if (g == null) null else java.lang.Boolean.valueOf(GeoExtras.isEmpty(Wkt.parse(g))))
    u.register("st_isclosed", (g: String) =>
      if (g == null) null
      else GeoExtras.isClosed(Wkt.parse(g)).map(java.lang.Boolean.valueOf).orNull)
    u.register("st_numgeometries", (g: String) =>
      if (g == null) null else Integer.valueOf(GeoExtras.numGeometries(Wkt.parse(g))))
    u.register("st_geometryn", (g: String, n: Int) =>
      if (g == null) null else GeoExtras.geometryN(Wkt.parse(g), n).map(Wkt.write).orNull)
    u.register("st_exteriorring", (g: String) =>
      if (g == null) null else GeoExtras.exteriorRing(Wkt.parse(g)).map(Wkt.write).orNull)
    u.register("st_numinteriorring", (g: String) =>
      if (g == null) null
      else GeoExtras.numInteriorRing(Wkt.parse(g)).map(Integer.valueOf).orNull)
    u.register("st_interiorringn", (g: String, n: Int) =>
      if (g == null) null else GeoExtras.interiorRingN(Wkt.parse(g), n).map(Wkt.write).orNull)
    u.register("st_pointn", (g: String, n: Int) =>
      if (g == null) null else GeoExtras.pointN(Wkt.parse(g), n).map(Wkt.write).orNull)
    u.register("st_startpoint", (g: String) =>
      if (g == null) null else GeoExtras.pointN(Wkt.parse(g), 1).map(Wkt.write).orNull)
    u.register("st_endpoint", (g: String) =>
      if (g == null) null else (Wkt.parse(g) match {
        case Wkt.LineString(ps) if ps.nonEmpty => Some(Wkt.write(Wkt.Point(ps.last)))
        case _ => None
      }).orNull)
    u.register("st_numpoints", (g: String) =>
      if (g == null) null else Integer.valueOf(Wkt.npoints(Wkt.parse(g))))
    u.register("st_symdifference", (a: String, b: String) =>
      if (a == null || b == null) null
      else Wkt.write(GeoConstructive.symDifference(Wkt.parse(a), Wkt.parse(b))))
  }

  private def minMax(wkt: String): Option[(Double, Double, Double, Double)] = {
    val ps = GeoExtras.allPoints(Wkt.parse(wkt))
    if (ps.isEmpty) None
    else Some((ps.map(_.x).min, ps.map(_.x).max, ps.map(_.y).min, ps.map(_.y).max))
  }
}

/** WKT parse/write + planar geometry kernels. Simple (non-self-
  * intersecting) polygons; first ring is the shell, the rest are holes.
  */
object Wkt extends Serializable {
  final case class Pt(x: Double, y: Double)
  sealed trait Geom
  final case class Point(p: Pt) extends Geom
  final case class LineString(pts: Vector[Pt]) extends Geom
  final case class Polygon(rings: Vector[Vector[Pt]]) extends Geom
  final case class MultiPoint(pts: Vector[Pt]) extends Geom
  final case class MultiLineString(lines: Vector[Vector[Pt]]) extends Geom
  final case class MultiPolygon(polys: Vector[Polygon]) extends Geom
  final case class Collection(geoms: Vector[Geom]) extends Geom
  case object EmptyGeom extends Geom

  def fmt(d: Double): String =
    if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  def parse(wkt: String): Geom = {
    val s = wkt.trim
    if (s.toUpperCase.endsWith(" EMPTY")) return EmptyGeom
    val open = s.indexOf('(')
    require(open > 0, s"bad WKT: $wkt")
    val kind = s.substring(0, open).trim.toUpperCase
    val body = s.substring(open, s.lastIndexOf(')') + 1)
    def coords(t: String): Vector[Pt] =
      t.split(",").iterator.map { c =>
        val xy = c.trim.split("\\s+")
        Pt(xy(0).toDouble, xy(1).toDouble)
      }.toVector
    kind match {
      case "POINT" =>
        Point(coords(body.stripPrefix("(").stripSuffix(")")).head)
      case "LINESTRING" =>
        LineString(coords(body.stripPrefix("(").stripSuffix(")")))
      case "POLYGON" =>
        // split top-level rings: ( (...), (...) )
        val inner = body.trim.stripPrefix("(").stripSuffix(")")
        val rings = Vector.newBuilder[Vector[Pt]]
        var depth = 0; var start = -1
        for (i <- inner.indices) inner.charAt(i) match {
          case '(' => if (depth == 0) start = i + 1; depth += 1
          case ')' => depth -= 1; if (depth == 0) rings += coords(inner.substring(start, i))
          case _ =>
        }
        Polygon(rings.result())
      case "MULTIPOINT" =>
        // both spellings: MULTIPOINT (1 2, 3 4) and MULTIPOINT ((1 2), (3 4))
        val inner = body.trim.stripPrefix("(").stripSuffix(")")
        MultiPoint(coords(inner.replace("(", " ").replace(")", " ")))
      case "MULTILINESTRING" =>
        val inner = body.trim.stripPrefix("(").stripSuffix(")")
        val lines = Vector.newBuilder[Vector[Pt]]
        var depth = 0; var start = -1
        for (i <- inner.indices) inner.charAt(i) match {
          case '(' => if (depth == 0) start = i + 1; depth += 1
          case ')' => depth -= 1; if (depth == 0) lines += coords(inner.substring(start, i))
          case _ =>
        }
        MultiLineString(lines.result())
      case "MULTIPOLYGON" =>
        val inner = body.trim.stripPrefix("(").stripSuffix(")")
        val polys = Vector.newBuilder[Polygon]
        var depth = 0; var start = -1
        for (i <- inner.indices) inner.charAt(i) match {
          case '(' => if (depth == 0) start = i; depth += 1
          case ')' => depth -= 1
            if (depth == 0) polys += parse("POLYGON " + inner.substring(start, i + 1))
              .asInstanceOf[Polygon]
          case _ =>
        }
        MultiPolygon(polys.result())
      case "GEOMETRYCOLLECTION" if body.replaceAll("[()\\s]", "").isEmpty => EmptyGeom
      case "GEOMETRYCOLLECTION" =>
        // split top-level comma-separated members: POINT (..), POLYGON (..)
        val inner = body.trim.stripPrefix("(").stripSuffix(")")
        val members = Vector.newBuilder[String]
        var depth = 0; var start = 0
        for (i <- inner.indices) inner.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 => members += inner.substring(start, i); start = i + 1
          case _ =>
        }
        members += inner.substring(start)
        Collection(members.result().map(m => parse(m.trim)))
      case other => throw new IllegalArgumentException(s"unsupported WKT type: $other")
    }
  }

  def write(g: Geom): String = g match {
    case Point(p) => s"POINT (${fmt(p.x)} ${fmt(p.y)})"
    case LineString(ps) => "LINESTRING (" + ps.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(", ") + ")"
    case Polygon(rs) =>
      "POLYGON (" + rs.map(r => "(" + r.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(", ") + ")").mkString(", ") + ")"
    case MultiPoint(ps) =>
      "MULTIPOINT (" + ps.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(", ") + ")"
    case MultiLineString(ls) =>
      "MULTILINESTRING (" + ls.map(l =>
        "(" + l.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(", ") + ")").mkString(", ") + ")"
    case MultiPolygon(polys) =>
      "MULTIPOLYGON (" + polys.map(pg =>
        pg.rings.map(r => "(" + r.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(", ") + ")")
          .mkString("(", ", ", ")")).mkString(", ") + ")"
    case Collection(gs) =>
      "GEOMETRYCOLLECTION (" + gs.map(write).mkString(", ") + ")"
    case EmptyGeom => "GEOMETRYCOLLECTION EMPTY"
  }

  def npoints(g: Geom): Int = g match {
    case Point(_) => 1
    case LineString(ps) => ps.length
    case Polygon(rs) => rs.map(_.length).sum
    case MultiPoint(ps) => ps.length
    case MultiLineString(ls) => ls.map(_.length).sum
    case MultiPolygon(polys) => polys.map(npoints).sum
    case Collection(gs) => gs.map(npoints).sum
    case EmptyGeom => 0
  }

  /** Shoelace area of one ring (absolute). */
  private def ringArea(r: Vector[Pt]): Double = {
    var s = 0.0; var i = 0; val n = r.length
    while (i < n) { val j = (i + 1) % n; s += r(i).x * r(j).y - r(j).x * r(i).y; i += 1 }
    math.abs(s) / 2
  }

  def area(g: Geom): Double = g match {
    case Polygon(rs) if rs.nonEmpty => ringArea(rs.head) - rs.tail.map(ringArea).sum
    case MultiPolygon(polys) => polys.map(area).sum
    case Collection(gs) => gs.map(area).sum
    case _ => 0.0
  }

  def length(g: Geom): Double = g match {
    case LineString(ps) =>
      ps.sliding(2).map { case Vector(a, b) => math.hypot(b.x - a.x, b.y - a.y) }.sum
    case MultiLineString(ls) => ls.map(ps => length(LineString(ps))).sum
    case Collection(gs) => gs.map(length).sum
    case _ => 0.0
  }

  def centroid(g: Geom): Geom = g match {
    case p: Point => p
    case LineString(ps) =>
      Point(Pt(ps.map(_.x).sum / ps.length, ps.map(_.y).sum / ps.length))
    case Polygon(rs) =>
      // shell centroid (area-weighted shoelace form); holes ignored like
      // the vertex count, documented simplification
      val r = dedupClosed(rs.head)
      var cx = 0.0; var cy = 0.0; var a = 0.0
      val n = r.length
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val cross = r(i).x * r(j).y - r(j).x * r(i).y
        cx += (r(i).x + r(j).x) * cross; cy += (r(i).y + r(j).y) * cross; a += cross
        i += 1
      }
      Point(Pt(cx / (3 * a), cy / (3 * a)))
  }

  def envelope(g: Geom): Geom = {
    val ps = GeoExtras.allPoints(g)
    if (ps.isEmpty) return EmptyGeom
    val (x0, x1) = (ps.map(_.x).min, ps.map(_.x).max)
    val (y0, y1) = (ps.map(_.y).min, ps.map(_.y).max)
    Polygon(Vector(Vector(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1), Pt(x0, y0))))
  }

  private def dedupClosed(r: Vector[Pt]): Vector[Pt] =
    if (r.length > 1 && r.head == r.last) r.dropRight(1) else r

  private def pointInRing(r0: Vector[Pt], p: Pt): Boolean = {
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

  private def pointInPolygon(poly: Polygon, p: Pt): Boolean =
    poly.rings.nonEmpty && pointInRing(poly.rings.head, p) &&
      !poly.rings.tail.exists(h => pointInRing(h, p))

  private def segIntersect(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
    def orient(p: Pt, q: Pt, r: Pt): Int =
      math.signum((q.y - p.y) * (r.x - q.x) - (q.x - p.x) * (r.y - q.y)).toInt
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    o1 != o2 && o3 != o4
  }

  def edges(g: Geom): Seq[(Pt, Pt)] = g match {
    case Point(_) | MultiPoint(_) | EmptyGeom => Seq.empty
    case LineString(ps) => ps.sliding(2).collect { case Vector(a, b) => (a, b) }.toSeq
    case MultiLineString(ls) => ls.flatMap(ps => edges(LineString(ps)))
    case Polygon(rs) => rs.flatMap { r0 =>
      val r = dedupClosed(r0)
      r.indices.map(i => (r(i), r((i + 1) % r.length)))
    }
    case MultiPolygon(polys) => polys.flatMap(edges)
    case Collection(gs) => gs.flatMap(edges)
  }

  private def anyEdgeCross(a: Geom, b: Geom): Boolean = {
    val ea = edges(a); val eb = edges(b)
    ea.exists { case (p, q) => eb.exists { case (r, s) => segIntersect(p, q, r, s) } }
  }

  /** A contains B: every vertex of B inside A and no proper edge crossing
    * (exact for simple polygons whose boundaries don't touch).
    */
  def contains(a: Geom, b: Geom): Boolean = (a, b) match {
    case (pa: Polygon, Point(p)) => pointInPolygon(pa, p)
    case (pa: Polygon, LineString(ps)) =>
      ps.forall(pointInPolygon(pa, _)) && !anyEdgeCross(pa, LineString(ps))
    case (pa: Polygon, pb: Polygon) =>
      pb.rings.headOption.exists(_.forall(pointInPolygon(pa, _))) && !anyEdgeCross(pa, pb)
    case _ => false
  }

  def intersects(a: Geom, b: Geom): Boolean = (a, b) match {
    case (Point(p), Point(q)) => p == q
    case (pa: Polygon, Point(p)) => pointInPolygon(pa, p)
    case (Point(p), pb: Polygon) => pointInPolygon(pb, p)
    case _ =>
      anyEdgeCross(a, b) ||
        contains(a, b) || contains(b, a) ||
        // linestring endpoint inside polygon
        ((a, b) match {
          case (pa: Polygon, LineString(ps)) => ps.exists(pointInPolygon(pa, _))
          case (LineString(ps), pb: Polygon) => ps.exists(pointInPolygon(pb, _))
          case _ => false
        })
  }

  def distance(a: Geom, b: Geom): Double = (a, b) match {
    case (Point(p), Point(q)) => math.hypot(p.x - q.x, p.y - q.y)
    case (Point(p), other) => pointGeomDist(p, other)
    case (other, Point(p)) => pointGeomDist(p, other)
    case _ =>
      if (intersects(a, b)) 0.0
      else {
        // when two segments don't intersect, the closest pair always
        // involves an endpoint — but it may be an endpoint of EITHER
        // geometry against the other's edge interior, so minimize over
        // both directions (one direction alone is wrong and asymmetric)
        val aToB = edges(a).flatMap { case (p, q) => Seq(p, q) }
          .map(pointGeomDist(_, b)).min
        val bToA = edges(b).flatMap { case (p, q) => Seq(p, q) }
          .map(pointGeomDist(_, a)).min
        math.min(aToB, bToA)
      }
  }

  private def pointSegDist(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val l2 = dx * dx + dy * dy
    val t = if (l2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / l2))
    math.hypot(p.x - (a.x + t * dx), p.y - (a.y + t * dy))
  }

  private def pointGeomDist(p: Pt, g: Geom): Double = g match {
    case Point(q) => math.hypot(p.x - q.x, p.y - q.y)
    case poly: Polygon if pointInPolygon(poly, p) => 0.0
    case _ => edges(g).map { case (a, b) => pointSegDist(p, a, b) }.min
  }
}
