package graft

import graft.functions.{GeoConstructive, Wkt}

/** Constructive geometry laws checked by area identities — the same
  * oracle style the reference's TestGeoFunctions uses for clipping:
  * area(A ∪ B) = area(A) + area(B) − area(A ∩ B), plus exact shapes for
  * axis-aligned cases where the answer is computable by hand.
  */
class GeoConstructiveSpec extends GraftSuite {

  private def poly(pts: (Double, Double)*): Wkt.Geom =
    Wkt.Polygon(Vector(pts.toVector.map { case (x, y) => Wkt.Pt(x, y) }))

  private val sq10 = poly((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)) // area 100
  private val sqOff = poly((5, 5), (15, 5), (15, 15), (5, 15), (5, 5)) // area 100, overlap 25
  private val sqFar = poly((20, 20), (25, 20), (25, 25), (20, 25), (20, 20)) // disjoint
  private val sqIn = poly((2, 2), (4, 2), (4, 4), (2, 4), (2, 2)) // contained, area 4

  test("intersection of overlapping squares is the 5x5 overlap") {
    val g = GeoConstructive.intersection(sq10, sqOff)
    assert(math.abs(Wkt.area(g) - 25.0) < 1e-9, Wkt.write(g))
    assert(Wkt.write(g).startsWith("POLYGON"))
  }

  test("union of overlapping squares: inclusion-exclusion area identity") {
    val u = GeoConstructive.union(sq10, sqOff)
    assert(math.abs(Wkt.area(u) - 175.0) < 1e-9, Wkt.write(u))
  }

  test("triangle x square clipping obeys inclusion-exclusion") {
    val tri = poly((-5, 3), (15, 3), (5, 13), (-5, 3))
    val inter = Wkt.area(GeoConstructive.intersection(sq10, tri))
    val uni = Wkt.area(GeoConstructive.union(sq10, tri))
    assert(inter > 0 && uni > 0)
    assert(math.abs(uni - (100.0 + Wkt.area(tri) - inter)) < 1e-9)
  }

  test("disjoint polygons: empty intersection, MULTIPOLYGON union") {
    assert(GeoConstructive.intersection(sq10, sqFar) == Wkt.EmptyGeom)
    val u = GeoConstructive.union(sq10, sqFar)
    assert(Wkt.write(u).startsWith("MULTIPOLYGON"))
    assert(math.abs(Wkt.area(u) - 125.0) < 1e-9)
  }

  test("containment: intersection = inner, union = outer") {
    assert(math.abs(Wkt.area(GeoConstructive.intersection(sq10, sqIn)) - 4.0) < 1e-9)
    assert(math.abs(Wkt.area(GeoConstructive.union(sq10, sqIn)) - 100.0) < 1e-9)
  }

  test("point cases: point-in-polygon intersection, two-point union") {
    val pIn = Wkt.Point(Wkt.Pt(3, 3)); val pOut = Wkt.Point(Wkt.Pt(50, 50))
    assert(GeoConstructive.intersection(pIn, sq10) == pIn)
    assert(GeoConstructive.intersection(pOut, sq10) == Wkt.EmptyGeom)
    assert(Wkt.write(GeoConstructive.union(pIn, pOut)) == "MULTIPOINT (3 3, 50 50)")
  }

  test("buffer of a point approximates the disc area from below") {
    val disc = GeoConstructive.buffer(Wkt.Point(Wkt.Pt(0, 0)), 2.0)
    val a = Wkt.area(disc)
    // inscribed 64-gon: area = 1/2 n r^2 sin(2pi/n)
    val expected = 0.5 * 64 * 4.0 * math.sin(2 * math.Pi / 64)
    assert(math.abs(a - expected) < 1e-9)
    assert(a < math.Pi * 4.0 && a > 0.99 * math.Pi * 4.0)
  }

  test("buffer of a convex square: area = A + perimeter*r + pi*r^2 (within arc error)") {
    val buf = GeoConstructive.buffer(sq10, 1.0)
    val a = Wkt.area(buf)
    val expected = 100.0 + 40.0 * 1.0 + math.Pi // Minkowski sum area
    assert(math.abs(a - expected) < 0.02, s"area=$a expected=$expected")
    // buffered square contains the original
    assert(Wkt.contains(buf, Wkt.Point(Wkt.Pt(0, 0))))
    assert(Wkt.contains(buf, Wkt.Point(Wkt.Pt(10.5, 5))))
  }

  test("MULTIPOLYGON round-trips through parse/write and sums areas") {
    val u = GeoConstructive.union(sq10, sqFar)
    val rt = Wkt.parse(Wkt.write(u))
    assert(math.abs(Wkt.area(rt) - 125.0) < 1e-9)
    assert(Wkt.npoints(rt) == Wkt.npoints(u))
  }
}
