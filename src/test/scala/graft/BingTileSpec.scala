package graft

import graft.functions.{BingTile, Wkt}

/** Bing tile system laws (reference TestBingTileFunctions territory). */
class BingTileSpec extends GraftSuite {

  test("quadkey round-trips tile coordinates at every zoom") {
    for (zoom <- 1 to 12; x <- Seq(0, 1, (1 << zoom) - 1); y <- Seq(0, (1 << zoom) / 2)) {
      val t = BingTile.Tile(x, y, zoom)
      assert(BingTile.fromQuadkey(BingTile.quadkey(t)) == t)
      assert(BingTile.quadkey(t).length == zoom)
    }
  }

  test("bing_tile_at is consistent with the tile polygon (point inside)") {
    // strictly interior points: (0, 0) is a tile CORNER at every zoom and
    // ray-casting containment excludes the boundary
    for ((lat, lon) <- Seq((47.61, -122.33), (-33.86, 151.21), (0.01, 0.01), (84.0, 179.0))) {
      val t = BingTile.at(lat, lon, 10)
      val poly = Wkt.parse(BingTile.polygon(t))
      assert(Wkt.contains(poly, Wkt.Point(Wkt.Pt(lon, lat))),
        s"($lat, $lon) not in ${BingTile.polygon(t)}")
    }
  }

  test("adjacent tiles tile the plane: polygons share edges, areas sum") {
    val t = BingTile.Tile(5, 7, 4)
    val right = BingTile.Tile(6, 7, 4)
    val p1 = Wkt.parse(BingTile.polygon(t)).asInstanceOf[Wkt.Polygon]
    val p2 = Wkt.parse(BingTile.polygon(right)).asInstanceOf[Wkt.Polygon]
    val e1 = p1.rings.head.map(_.x).max
    val w2 = p2.rings.head.map(_.x).min
    assert(math.abs(e1 - w2) < 1e-12) // shared meridian
  }

  test("bing_tiles_around returns 9 distinct tiles in the interior, fewer at edges") {
    assert(BingTile.around(47.6, -122.3, 8).distinct.length == 9)
    assert(BingTile.around(85.0, -180.0, 3).length == 4) // corner of the grid
  }

  test("lat clamps at the Mercator bound, zoom 0 is the single world tile") {
    assert(BingTile.at(89.9, 10, 5).y == 0)
    assert(BingTile.at(0, 0, 0) == BingTile.Tile(0, 0, 0))
  }

  test("SQL surface: quadkey/from_quadkey inverse through the session") {
    graft.engine.Tables.register(spark, sfTiny)
    val r = spark.sql(
      """SELECT bing_tile_quadkey(bing_tile_from_quadkey('0231010')) AS qk,
        |       bing_tile_polygon(bing_tile_at(47.61, -122.33, 10)) AS poly""".stripMargin)
      .collect().head
    assert(r.getString(0) == "0231010")
    assert(r.getString(1).startsWith("POLYGON"))
  }
}
