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

  // ---- tranche 3: difference + holed polygons -------------------------

  private def holed(shellPts: Seq[(Double, Double)], holePts: Seq[(Double, Double)]): Wkt.Polygon =
    Wkt.Polygon(Vector(shellPts.toVector.map { case (x, y) => Wkt.Pt(x, y) },
      holePts.toVector.map { case (x, y) => Wkt.Pt(x, y) }))

  // 10x10 square with a 2x2 hole at (4,4)-(6,6): area 96
  private val sqHoled = holed(
    Seq((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
    Seq((4, 4), (6, 4), (6, 6), (4, 6), (4, 4)))

  test("difference of overlapping squares leaves the L-shape") {
    val d = GeoConstructive.difference(sq10, sqOff)
    assert(math.abs(Wkt.area(d) - 75.0) < 1e-9, Wkt.write(d))
    // complement direction too
    val d2 = GeoConstructive.difference(sqOff, sq10)
    assert(math.abs(Wkt.area(d2) - 75.0) < 1e-9, Wkt.write(d2))
  }

  test("difference with contained polygon produces a holed polygon") {
    val d = GeoConstructive.difference(sq10, sqIn)
    assert(math.abs(Wkt.area(d) - 96.0) < 1e-9, Wkt.write(d))
    val rings = d.asInstanceOf[Wkt.Polygon].rings
    assert(rings.length == 2, Wkt.write(d))
    // the hole region is no longer inside
    assert(!Wkt.contains(d, Wkt.Point(Wkt.Pt(3, 3))))
    assert(Wkt.contains(d, Wkt.Point(Wkt.Pt(1, 1))))
  }

  test("difference: disjoint → subject; covered → empty") {
    assert(math.abs(Wkt.area(GeoConstructive.difference(sq10, sqFar)) - 100.0) < 1e-9)
    assert(GeoConstructive.difference(sqIn, sq10) == Wkt.EmptyGeom)
  }

  test("symmetric difference area = union - intersection") {
    val sd = GeoConstructive.symDifference(sq10, sqOff)
    assert(math.abs(Wkt.area(sd) - 150.0) < 1e-9, Wkt.write(sd))
  }

  test("intersection with a holed polygon subtracts the hole overlap") {
    // clip window (3,3)-(7,7): 16 minus hole (4,4)-(6,6) fully inside = 12
    val win = poly((3, 3), (7, 3), (7, 7), (3, 7), (3, 3))
    val g = GeoConstructive.intersection(sqHoled, win)
    assert(math.abs(Wkt.area(g) - 12.0) < 1e-9, Wkt.write(g))
    assert(!Wkt.contains(g, Wkt.Point(Wkt.Pt(5, 5)))) // inside the hole
    assert(Wkt.contains(g, Wkt.Point(Wkt.Pt(3.5, 3.5))))
    // window that clips the hole partially: (5,5)-(9,9) → 16 - 1 = 15
    val win2 = poly((5, 5), (9, 5), (9, 9), (5, 9), (5, 5))
    val g2 = GeoConstructive.intersection(sqHoled, win2)
    assert(math.abs(Wkt.area(g2) - 15.0) < 1e-9, Wkt.write(g2))
  }

  test("union with a holed polygon: hole filled by the other operand shrinks") {
    // patch (5,5)-(8,8) covers the hole quadrant [5,6]x[5,6]: hole shrinks to 3
    val patch = poly((5, 5), (8, 5), (8, 8), (5, 8), (5, 5))
    val u = GeoConstructive.union(sqHoled, patch)
    assert(math.abs(Wkt.area(u) - 97.0) < 1e-9, Wkt.write(u))
    assert(!Wkt.contains(u, Wkt.Point(Wkt.Pt(4.5, 4.5)))) // still a hole
    assert(Wkt.contains(u, Wkt.Point(Wkt.Pt(5.5, 5.5)))) // filled
    // disjoint patch far away leaves the hole untouched
    val u2 = GeoConstructive.union(sqHoled, sqFar)
    assert(math.abs(Wkt.area(u2) - 121.0) < 1e-9, Wkt.write(u2))
  }

  test("union of two holed polygons: overlapping holes intersect") {
    // second square (2,2)-(12,12) with hole (5,5)-(7,7); union holes:
    // ha∩hb = [5,6]^2 (1) + ha∖B (0, ha inside B) + hb∖A (0) → area
    // = union_shells (10x10 ∪ 10x10 offset 2 = 100+100-64=136) - 1
    val other = holed(
      Seq((2, 2), (12, 2), (12, 12), (2, 12), (2, 2)),
      Seq((5, 5), (7, 5), (7, 7), (5, 7), (5, 5)))
    val u = GeoConstructive.union(sqHoled, other)
    assert(math.abs(Wkt.area(u) - 135.0) < 1e-9, Wkt.write(u))
    assert(!Wkt.contains(u, Wkt.Point(Wkt.Pt(5.5, 5.5)))) // common hole part
    assert(Wkt.contains(u, Wkt.Point(Wkt.Pt(4.5, 4.5)))) // covered by other
  }

  test("difference against a holed polygon keeps the hole region") {
    // window (3,3)-(7,7) ∖ sqHoled = just the hole [4,6]²: area 4
    val win = poly((3, 3), (7, 3), (7, 7), (3, 7), (3, 3))
    val d = GeoConstructive.difference(win, sqHoled)
    assert(math.abs(Wkt.area(d) - 4.0) < 1e-9, Wkt.write(d))
    assert(Wkt.contains(d, Wkt.Point(Wkt.Pt(5, 5))))
  }
}
