package graft

import graft.functions.{GeoExtras, Wkt}

/** Tranche-3 geometry kernels. WKB is pinned against externally-known
  * byte layouts (the same vectors PostGIS/GEOS emit for little-endian
  * WKB), hull/simplify against hand-computable shapes.
  */
class GeoExtrasSpec extends GraftSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("WKB point matches the canonical little-endian layout") {
    // POINT (1 2): 01 01000000 x=1.0 y=2.0
    assert(hex(GeoExtras.toWkb(Wkt.parse("POINT (1 2)"))) ==
      "0101000000000000000000f03f0000000000000040")
  }

  test("WKB linestring matches the canonical layout") {
    // LINESTRING (1 2, 3 4): 01 02000000 02000000 + 4 doubles
    assert(hex(GeoExtras.toWkb(Wkt.parse("LINESTRING (1 2, 3 4)"))) ==
      "010200000002000000000000000000f03f000000000000004000000000000008400000000000001040")
  }

  test("WKB round-trips every geometry kind") {
    val wkts = Seq(
      "POINT (3 4)",
      "LINESTRING (0 0, 3 4, 3 8)",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
      "MULTIPOINT (1 2, 3 4)",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
      "GEOMETRYCOLLECTION EMPTY")
    for (w <- wkts) {
      val g = Wkt.parse(w)
      assert(Wkt.write(GeoExtras.fromWkb(GeoExtras.toWkb(g))) == Wkt.write(g), w)
    }
  }

  test("WKB big-endian input is readable") {
    // POINT (1 2) big-endian: 00 00000001 3ff0... 4000...
    val bytes = ("00" + "00000001" + "3ff0000000000000" + "4000000000000000")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(Wkt.write(GeoExtras.fromWkb(bytes)) == "POINT (1 2)")
  }

  test("convex hull of a point grid is the bounding square") {
    val pts = for (x <- 0 to 4; y <- 0 to 4) yield s"$x $y"
    val g = Wkt.parse("MULTIPOINT (" + pts.mkString(", ") + ")")
    val hull = GeoExtras.convexHull(g)
    assert(math.abs(Wkt.area(hull) - 16.0) < 1e-9, Wkt.write(hull))
    assert(Wkt.write(hull) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
  }

  test("convex hull drops interior and reflex points") {
    val g = Wkt.parse("LINESTRING (0 0, 5 1, 10 0, 9 5, 10 10, 0 10, 2 5)")
    val hull = GeoExtras.convexHull(g)
    assert(Wkt.write(hull) == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
  }

  test("convex hull degenerate inputs: point and collinear set") {
    assert(Wkt.write(GeoExtras.convexHull(Wkt.parse("POINT (2 3)"))) == "POINT (2 3)")
    assert(Wkt.write(GeoExtras.convexHull(Wkt.parse("MULTIPOINT (0 0, 1 1, 2 2)"))) ==
      "LINESTRING (0 0, 2 2)")
  }

  test("simplify removes sub-tolerance zigzag, keeps the rest") {
    val zig = "LINESTRING (0 0, 1 0.01, 2 -0.01, 3 0.02, 4 0, 4 5)"
    val s = GeoExtras.simplify(Wkt.parse(zig), 0.1)
    assert(Wkt.write(s) == "LINESTRING (0 0, 4 0, 4 5)")
    // below-tolerance: unchanged
    val keep = GeoExtras.simplify(Wkt.parse(zig), 0.001)
    assert(Wkt.npoints(keep) == 6)
  }

  test("simplify preserves polygon closure and area within tolerance") {
    val p = Wkt.parse(
      "POLYGON ((0 0, 5 0.01, 10 0, 10 10, 5 10.01, 0 10, 0 0))")
    val s = GeoExtras.simplify(p, 0.1)
    assert(Wkt.write(s) == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
  }

  test("accessor family: type, dimension, rings, points, bounds") {
    val holed = Wkt.parse(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(GeoExtras.geometryType(holed) == "ST_Polygon")
    assert(GeoExtras.dimension(holed) == 2)
    assert(GeoExtras.numInteriorRing(holed).contains(1))
    assert(GeoExtras.exteriorRing(holed).map(Wkt.write).contains(
      "LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)"))
    assert(GeoExtras.interiorRingN(holed, 1).map(Wkt.write).contains(
      "LINESTRING (4 4, 6 4, 6 6, 4 6, 4 4)"))
    assert(GeoExtras.interiorRingN(holed, 2).isEmpty)

    val ls = Wkt.parse("LINESTRING (0 0, 3 4, 3 8)")
    assert(GeoExtras.pointN(ls, 2).map(Wkt.write).contains("POINT (3 4)"))
    assert(GeoExtras.isClosed(ls).contains(false))
    assert(GeoExtras.isClosed(Wkt.parse("LINESTRING (0 0, 1 0, 1 1, 0 0)")).contains(true))

    val mp = Wkt.parse("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    assert(GeoExtras.numGeometries(mp) == 2)
    assert(GeoExtras.geometryN(mp, 2).map(Wkt.write).contains(
      "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"))
    assert(GeoExtras.geometryN(mp, 3).isEmpty)

    val ps = GeoExtras.allPoints(mp)
    assert(ps.map(_.x).min == 0 && ps.map(_.x).max == 6)
    assert(GeoExtras.isEmpty(Wkt.parse("GEOMETRYCOLLECTION EMPTY")))
    assert(!GeoExtras.isEmpty(mp))
  }
}
