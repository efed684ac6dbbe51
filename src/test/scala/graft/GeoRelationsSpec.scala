package graft

import graft.functions.{GeoRelations, Wkt}
import graft.functions.Wkt._

/** Tranche-4 geospatial kernels: spatial relations, boundary/validity,
  * linear referencing, GeoJSON + encoded-polyline IO, nearest points,
  * n-ary union, spherical geography, and the two geometry aggregates.
  */
class GeoRelationsSpec extends GraftSuite {

  private def g(wkt: String): Geom = Wkt.parse(wkt)

  private val sqA = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
  private val sqB = "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))" // shares edge x=4 with A
  private val sqC = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))" // overlaps A
  private val sqFar = "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))"

  test("touches: edge-adjacent squares touch, overlapping and far ones do not") {
    assert(GeoRelations.touches(g(sqA), g(sqB)))
    assert(!GeoRelations.touches(g(sqA), g(sqC)))
    assert(!GeoRelations.touches(g(sqA), g(sqFar)))
    // corner touch
    assert(GeoRelations.touches(g(sqA), g("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")))
    // point on boundary touches; interior point does not
    assert(GeoRelations.touches(g(sqA), g("POINT (4 2)")))
    assert(!GeoRelations.touches(g(sqA), g("POINT (2 2)")))
  }

  test("overlaps: partial overlap yes; containment, equality, touching no") {
    assert(GeoRelations.overlaps(g(sqA), g(sqC)))
    assert(!GeoRelations.overlaps(g(sqA), g(sqB)))
    assert(!GeoRelations.overlaps(g(sqA), g(sqA)))
    assert(!GeoRelations.overlaps(g(sqA), g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")))
    // collinear line overlap
    assert(GeoRelations.overlaps(g("LINESTRING (0 0, 4 0)"), g("LINESTRING (2 0, 6 0)")))
    assert(!GeoRelations.overlaps(g("LINESTRING (0 0, 4 0)"), g("LINESTRING (4 0, 8 0)")))
  }

  test("crosses: line through polygon, proper line crossing; not containment") {
    assert(GeoRelations.crosses(g("LINESTRING (-1 2, 5 2)"), g(sqA)))
    assert(GeoRelations.crosses(g(sqA), g("LINESTRING (-1 2, 5 2)")))
    assert(!GeoRelations.crosses(g("LINESTRING (1 1, 3 3)"), g(sqA))) // fully inside
    assert(GeoRelations.crosses(g("LINESTRING (0 0, 4 4)"), g("LINESTRING (0 4, 4 0)")))
    assert(!GeoRelations.crosses(g("LINESTRING (0 0, 4 0)"), g("LINESTRING (2 0, 6 0)"))) // overlap, dim 1
    assert(!GeoRelations.crosses(g(sqA), g(sqC))) // polygon/polygon never crosses
  }

  test("equals: ring rotation and orientation do not matter") {
    assert(GeoRelations.equalsGeom(g(sqA), g("POLYGON ((4 4, 0 4, 0 0, 4 0, 4 4))")))
    assert(GeoRelations.equalsGeom(g(sqA), g("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))")))
    assert(!GeoRelations.equalsGeom(g(sqA), g(sqC)))
    assert(GeoRelations.equalsGeom(g("LINESTRING (0 0, 2 2)"), g("LINESTRING (2 2, 0 0)")))
  }

  test("relate: DE-9IM patterns for overlap / touch / containment") {
    // partial overlap: interiors meet, both have exterior parts
    assert(GeoRelations.relate(g(sqA), g(sqC), "T*T***T**"))
    // touch: interiors disjoint, boundaries meet
    assert(GeoRelations.relate(g(sqA), g(sqB), "F***T****"))
    // A contains D strictly: DE-9IM containment T*****FF*
    val sqD = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    assert(GeoRelations.relate(g(sqA), g(sqD), "T*****FF*"))
    assert(!GeoRelations.relate(g(sqA), g(sqFar), "T********"))
  }

  test("boundary: polygon ring, open line endpoints, closed line empty") {
    assert(Wkt.write(GeoRelations.boundaryOf(g(sqA))) ===
      "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)")
    assert(Wkt.write(GeoRelations.boundaryOf(g("LINESTRING (1 1, 5 1)"))) ===
      "MULTIPOINT (1 1, 5 1)")
    assert(GeoRelations.boundaryOf(g("LINESTRING (0 0, 1 0, 1 1, 0 0)")) === EmptyGeom)
    assert(GeoRelations.boundaryOf(g("POINT (3 3)")) === EmptyGeom)
    // holed polygon boundary = shell + hole rings
    val holed = "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))"
    assert(Wkt.write(GeoRelations.boundaryOf(g(holed))) ===
      "MULTILINESTRING ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))")
  }

  test("isSimple / isValid / invalid reason") {
    assert(GeoRelations.isSimple(g("LINESTRING (0 0, 4 0, 4 4)")))
    assert(!GeoRelations.isSimple(g("LINESTRING (0 0, 4 4, 4 0, 0 4)"))) // self-cross
    assert(GeoRelations.isSimple(g(sqA)))
    val bowtie = "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"
    assert(!GeoRelations.isValid(g(bowtie)))
    assert(GeoRelations.invalidReason(g(bowtie)).exists(_.contains("Self-intersection")))
    assert(GeoRelations.isValid(g(sqA)))
    assert(GeoRelations.invalidReason(g(sqA)).isEmpty)
    // hole outside shell
    val badHole = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (10 10, 11 10, 11 11, 10 11, 10 10))"
    assert(GeoRelations.invalidReason(g(badHole)).contains("Hole lies outside shell"))
  }

  test("nearest points between disjoint and intersecting geometries") {
    val (p, q) = GeoRelations.nearestPoints(g(sqA), g("POLYGON ((7 1, 9 1, 9 3, 7 3, 7 1))"))
    assert(math.abs(p.x - 4) < 1e-9 && math.abs(q.x - 7) < 1e-9)
    assert(math.abs(math.hypot(q.x - p.x, q.y - p.y) - 3.0) < 1e-9)
    // point vs segment interior
    val (a, b) = GeoRelations.nearestPoints(g("POINT (2 5)"), g("LINESTRING (0 0, 4 0)"))
    assert(a == Pt(2, 5) && b == Pt(2, 0))
    // intersecting: witness point is shared
    val (s, t) = GeoRelations.nearestPoints(g(sqA), g(sqC))
    assert(s == t)
  }

  test("linear referencing: locate + interpolate on an L-shaped line") {
    val line = g("LINESTRING (0 0, 4 0, 4 4)") // total length 8
    assert(math.abs(GeoRelations.lineLocatePoint(line, Pt(4, 2)) - 0.75) < 1e-12)
    assert(math.abs(GeoRelations.lineLocatePoint(line, Pt(2, 1)) - 0.25) < 1e-12)
    assert(GeoRelations.lineInterpolatePoint(line, 0.25) === Pt(2, 0))
    assert(GeoRelations.lineInterpolatePoint(line, 0.0) === Pt(0, 0))
    assert(GeoRelations.lineInterpolatePoint(line, 1.0) === Pt(4, 4))
    assert(GeoRelations.lineInterpolatePoints(line, 0.5) === Vector(Pt(4, 0), Pt(4, 4)))
    assert(GeoRelations.lineInterpolatePoints(line, 0.25) ===
      Vector(Pt(2, 0), Pt(4, 0), Pt(4, 2), Pt(4, 4)))
  }

  test("GeoJSON round trip incl. holes, multis and collections") {
    val wkts = Seq(
      "POINT (3 4)",
      "LINESTRING (0 0, 4 0, 4 4)",
      "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))",
      "MULTIPOINT (1 2, 3 4)",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    for (w <- wkts)
      assert(Wkt.write(GeoRelations.fromGeoJson(GeoRelations.toGeoJson(g(w)))) === w)
    assert(GeoRelations.toGeoJson(g("POINT (3 4)")) ===
      """{"type":"Point","coordinates":[3,4]}""")
  }

  test("encoded polyline: Google reference vector + round trip") {
    // canonical example from the polyline algorithm spec:
    // (38.5,-120.2) (40.7,-120.95) (43.252,-126.453)
    val line = LineString(Vector(Pt(-120.2, 38.5), Pt(-120.95, 40.7), Pt(-126.453, 43.252)))
    val enc = GeoRelations.toEncodedPolyline(line)
    assert(enc === "_p~iF~ps|U_ulLnnqC_mqNvxq`@")
    assert(GeoRelations.fromEncodedPolyline(enc) === line)
  }

  test("great-circle distance matches the reference formula (km, R=6371.01)") {
    // Nashville -> LA, the classic test pair
    val d = GeoRelations.greatCircleKm(36.12, -86.67, 33.94, -118.40)
    assert(math.abs(d - 2886.45) < 0.05)
    assert(GeoRelations.greatCircleKm(0, 0, 0, 0) === 0.0)
    // 1 degree along the equator = R * pi/180
    assert(math.abs(GeoRelations.greatCircleKm(0, 0, 0, 1) - 6371.01 * math.Pi / 180) < 1e-9)
  }

  test("spherical geography: distance, length, area") {
    val dm = GeoRelations.sphericalDistanceM(g("POINT (0 0)"), g("POINT (1 0)"))
    assert(math.abs(dm - 6371010 * math.Pi / 180) < 1e-6)
    val lm = GeoRelations.sphericalLengthM(g("LINESTRING (0 0, 0 1, 0 2)"))
    assert(math.abs(lm - 2 * 6371010 * math.Pi / 180) < 1e-6)
    // spherical triangle (0 0)-(90 0)-(0 90): an octant of the sphere
    val a = GeoRelations.sphericalAreaM2(g("POLYGON ((0 0, 90 0, 0 90, 0 0))"))
    val octant = 4 * math.Pi * 6371010.0 * 6371010.0 / 8
    assert(math.abs(a - octant) / octant < 1e-9)
    // range validation
    assertThrows[IllegalArgumentException](
      GeoRelations.toSphericalGeography(g("POINT (200 0)")))
  }

  test("unionAll: overlapping chain, disjoint pieces, absorbed points — order independent") {
    // rect_i: x in [i, i+2], y in [-h_i, h_i], h_i = 1 + 0.1·i — heights
    // increase so every pairwise boundary meeting is a proper crossing
    // (the clipping kernel's supported class; collinear shared edges are
    // out of scope, as documented on GeoConstructive).
    // Union area = 2·(Σ h_i + h_last) = 2·(3.3 + 1.2) = 9.
    val strip = (0 until 3).map { i =>
      val h = 1.0 + 0.1 * i
      g(s"POLYGON ((${i} ${-h}, ${i + 2} ${-h}, ${i + 2} $h, ${i} $h, ${i} ${-h}))")
    }
    for (perm <- strip.permutations) {
      val u = GeoRelations.unionAll(perm)
      assert(math.abs(Wkt.area(u) - 9.0) < 1e-9, s"area for $perm")
    }
    // disjoint stays multi; point inside a piece is absorbed
    val mixed = GeoRelations.unionAll(Seq(g(sqA), g(sqFar), g("POINT (1 1)"), g("POINT (20 20)")))
    assert(Wkt.area(mixed) === 4 * 4 + 2 * 2)
    assert(Wkt.write(mixed).startsWith("GEOMETRYCOLLECTION"))
    assert(Wkt.write(mixed).contains("POINT (20 20)"))
    assert(!Wkt.write(mixed).contains("POINT (1 1)"))
  }

  test("SQL surface: relations, referencing, IO, geography, aggregates, Trino spellings") {
    val df = spark.sql(
      s"""SELECT
         |  st_touches('$sqA', '$sqB') AS t,
         |  st_overlaps('$sqA', '$sqC') AS o,
         |  st_crosses('LINESTRING (-1 2, 5 2)', '$sqA') AS c,
         |  st_equals('$sqA', 'POLYGON ((4 4, 0 4, 0 0, 4 0, 4 4))') AS e,
         |  st_relate('$sqA', '$sqC', 'T*T***T**') AS r,
         |  st_boundary('$sqA') AS bd,
         |  st_issimple('LINESTRING (0 0, 4 4, 4 0, 0 4)') AS simple,
         |  st_isvalid('POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))') AS valid,
         |  geometry_invalid_reason('POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))') AS reason,
         |  st_isring('LINESTRING (0 0, 1 0, 1 1, 0 0)') AS ring,
         |  line_locate_point('LINESTRING (0 0, 4 0, 4 4)', 'POINT (4 2)') AS loc,
         |  line_interpolate_point('LINESTRING (0 0, 4 0, 4 4)', 0.25) AS interp,
         |  line_interpolate_points('LINESTRING (0 0, 4 0, 4 4)', 0.5) AS interps,
         |  geometry_nearest_points('POINT (2 5)', 'LINESTRING (0 0, 4 0)') AS np,
         |  geometry_union(array('$sqA', '$sqFar')) AS gu,
         |  to_geojson_geometry('POINT (3 4)') AS gj,
         |  from_geojson_geometry('{"type":"Point","coordinates":[3,4]}') AS fgj,
         |  from_encoded_polyline(to_encoded_polyline('LINESTRING (1 1, 2 2)')) AS pl,
         |  round(st_geography_distance('POINT (0 0)', 'POINT (1 0)'), 0) AS gd,
         |  round(great_circle_distance(36.12, -86.67, 33.94, -118.4), 2) AS gc,
         |  st_points('LINESTRING (1 1, 2 2)') AS pts,
         |  st_geometries('MULTIPOINT (1 1, 2 2)') AS geoms,
         |  st_interiorrings('POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))') AS irs,
         |  st_envelopeaspts('$sqC') AS env,
         |  st_boundary(st_polygon('$sqA')) AS bd2,
         |  st_linefromtext('LINESTRING (0 0, 1 1)') AS lft,
         |  st_linestring(array('POINT (0 0)', 'POINT (1 1)')) AS lsc,
         |  st_multipoint(array('POINT (0 0)', 'POINT (1 1)')) AS mpc,
         |  st_coorddim('$sqA') AS cd,
         |  st_convexhull('MULTIPOINT (0 0, 2 0, 2 2, 0 2, 1 1)') AS hull,
         |  st_geometryfromtext('POINT (1 2)') AS gft,
         |  st_geometrytype('$sqA') AS gt,
         |  st_numpoints('$sqA') AS npt,
         |  st_symdifference('$sqA', '$sqA') AS sd
         |""".stripMargin)
    val row = df.collect()(0)
    assert(row.getAs[Boolean]("t") && row.getAs[Boolean]("o") && row.getAs[Boolean]("c"))
    assert(row.getAs[Boolean]("e") && row.getAs[Boolean]("r"))
    assert(row.getAs[String]("bd") === "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)")
    assert(!row.getAs[Boolean]("simple") && !row.getAs[Boolean]("valid"))
    assert(row.getAs[String]("reason").contains("Self-intersection"))
    assert(row.getAs[Boolean]("ring"))
    assert(row.getAs[Double]("loc") === 0.75)
    assert(row.getAs[String]("interp") === "POINT (2 0)")
    assert(row.getSeq[String](row.fieldIndex("interps")) === Seq("POINT (4 0)", "POINT (4 4)"))
    assert(row.getSeq[String](row.fieldIndex("np")) === Seq("POINT (2 5)", "POINT (2 0)"))
    assert(row.getAs[String]("gj") === """{"type":"Point","coordinates":[3,4]}""")
    assert(row.getAs[String]("fgj") === "POINT (3 4)")
    assert(row.getAs[String]("pl") === "LINESTRING (1 1, 2 2)")
    assert(row.getAs[Double]("gd") === math.round(6371010 * math.Pi / 180).toDouble)
    assert(row.getAs[Double]("gc") === 2886.45)
    assert(row.getSeq[String](row.fieldIndex("pts")) === Seq("POINT (1 1)", "POINT (2 2)"))
    assert(row.getSeq[String](row.fieldIndex("geoms")) === Seq("POINT (1 1)", "POINT (2 2)"))
    assert(row.getSeq[String](row.fieldIndex("irs")) === Seq("LINESTRING (3 3, 6 3, 6 6, 3 6, 3 3)"))
    assert(row.getSeq[String](row.fieldIndex("env")) === Seq("POINT (2 2)", "POINT (6 6)"))
    assert(row.getAs[String]("lft") === "LINESTRING (0 0, 1 1)")
    assert(row.getAs[String]("lsc") === "LINESTRING (0 0, 1 1)")
    assert(row.getAs[String]("mpc") === "MULTIPOINT (0 0, 1 1)")
    assert(row.getAs[Byte]("cd") === 2.toByte)
    assert(row.getAs[String]("hull") === "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert(row.getAs[String]("gft") === "POINT (1 2)")
    assert(row.getAs[String]("gt") === "ST_Polygon")
    assert(row.getAs[Int]("npt") === 5)
    assert(row.getAs[String]("sd") === "GEOMETRYCOLLECTION EMPTY")
  }

  test("geometry_from_hadoop_shape parses point, multipoint, polyline, holed polygon") {
    import java.nio.{ByteBuffer, ByteOrder}
    def shape(esri: ByteBuffer => Unit, size: Int): Array[Byte] = {
      val buf = ByteBuffer.allocate(5 + size).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(0); buf.put(1.toByte) // wkid + hadoop type byte
      esri(buf)
      buf.array()
    }
    def xy(b: ByteBuffer, x: Double, y: Double): Unit = { b.putDouble(x); b.putDouble(y) }
    // point
    val p = shape(b => { b.putInt(1); xy(b, 3, 4) }, 4 + 16)
    assert(GeoRelations.fromHadoopShape(p) === Point(Pt(3, 4)))
    // multipoint: bbox + count + 2 points
    val mp = shape(b => { b.putInt(8); (1 to 4).foreach(_ => b.putDouble(0))
      b.putInt(2); xy(b, 1, 2); xy(b, 3, 4) }, 4 + 32 + 4 + 32)
    assert(GeoRelations.fromHadoopShape(mp) === MultiPoint(Vector(Pt(1, 2), Pt(3, 4))))
    // polyline, 2 parts
    val pl = shape(b => { b.putInt(3); (1 to 4).foreach(_ => b.putDouble(0))
      b.putInt(2); b.putInt(4); b.putInt(0); b.putInt(2)
      xy(b, 0, 0); xy(b, 1, 1); xy(b, 5, 5); xy(b, 6, 5) }, 4 + 32 + 8 + 8 + 64)
    assert(Wkt.write(GeoRelations.fromHadoopShape(pl)) ===
      "MULTILINESTRING ((0 0, 1 1), (5 5, 6 5))")
    // polygon: clockwise shell + counter-clockwise hole
    val pg = shape(b => { b.putInt(5); (1 to 4).foreach(_ => b.putDouble(0))
      b.putInt(2); b.putInt(10); b.putInt(0); b.putInt(5)
      // shell CW: (0,0) (0,9) (9,9) (9,0) (0,0)
      xy(b, 0, 0); xy(b, 0, 9); xy(b, 9, 9); xy(b, 9, 0); xy(b, 0, 0)
      // hole CCW: (3,3) (6,3) (6,6) (3,6) (3,3)
      xy(b, 3, 3); xy(b, 6, 3); xy(b, 6, 6); xy(b, 3, 6); xy(b, 3, 3) },
      4 + 32 + 8 + 8 + 10 * 16)
    val poly = GeoRelations.fromHadoopShape(pg)
    assert(Wkt.area(poly) === 81.0 - 9.0)
    assert(poly.asInstanceOf[Polygon].rings.length === 2)
    // SQL surface
    val hex = p.map("%02x".format(_)).mkString
    assert(spark.sql(s"SELECT geometry_from_hadoop_shape(unhex('$hex')) AS g")
      .collect()(0).getString(0) === "POINT (3 4)")
  }

  test("geometry_union_agg and convex_hull_agg distribute correctly") {
    import spark.implicits._
    // 8 growing-height rects chained along x (proper crossings only):
    // union area = 2·(Σ h_i + h_7) = 2·(10.8 + 1.7) = 25
    val strip = (0 until 8).map { i =>
      val h = 1.0 + 0.1 * i
      (i, s"POLYGON ((${i} ${-h}, ${i + 2} ${-h}, ${i + 2} $h, ${i} $h, ${i} ${-h}))")
    }.toDF("id", "geom").repartition(4)
    strip.createOrReplaceTempView("strip_geo")
    val area = spark.sql(
      "SELECT st_area(geometry_union_agg(geom)) AS a FROM strip_geo").collect()(0).getDouble(0)
    assert(math.abs(area - 25.0) < 1e-9)

    val pts = (0 to 20).map(i => (i, s"POINT (${i % 5} ${i % 7})")).toDF("id", "geom")
      .repartition(4)
    pts.createOrReplaceTempView("pts_geo")
    val hull = spark.sql(
      "SELECT convex_hull_agg(geom) AS h FROM pts_geo").collect()(0).getString(0)
    // hull of the (i%5, i%7) grid: (0 0, 4 0, 4 5, 3 6, 0 6) — area 23.5
    assert(Wkt.area(Wkt.parse(hull)) === 23.5)
  }
}
