package graft.functions

import org.apache.spark.sql.SparkSession

/** Bing tile system (reference `plugin/trino-geospatial/.../BingTileFunctions
  * .java`): Web-Mercator quadtree addressing — tile (x, y, zoom), quadkey
  * string, tile polygon, neighborhood. The reference models tiles as a
  * TILE type; here a tile is its canonical string `"x y zoom"` (the same
  * trade the WKT pack makes: geometry IS its text form), so tiles flow
  * through joins/groupBys as ordinary columns.
  *
  * The projection math is the published Bing Maps tile-system derivation
  * (Schwartz, "Bing Maps Tile System", MSDN) — lat clamped to ±85.05112878
  * like the reference.
  */
object BingTile {
  val MaxZoom = 23
  private val MinLat = -85.05112878
  private val MaxLat = 85.05112878

  final case class Tile(x: Int, y: Int, zoom: Int) {
    require(zoom >= 0 && zoom <= MaxZoom, s"zoom $zoom outside [0, $MaxZoom]")
    require(x >= 0 && x < (1 << zoom) && y >= 0 && y < (1 << zoom),
      s"tile ($x, $y) outside zoom-$zoom grid")
    override def toString: String = s"$x $y $zoom"
  }

  def parse(s: String): Tile = {
    val parts = s.trim.split("\\s+")
    require(parts.length == 3, s"bad tile: $s")
    Tile(parts(0).toInt, parts(1).toInt, parts(2).toInt)
  }

  def at(lat: Double, lon: Double, zoom: Int): Tile = {
    val phi = math.max(MinLat, math.min(MaxLat, lat))
    val lam = math.max(-180.0, math.min(180.0, lon))
    val n = 1 << zoom
    val xf = (lam + 180.0) / 360.0
    val sinPhi = math.sin(math.toRadians(phi))
    val yf = 0.5 - math.log((1 + sinPhi) / (1 - sinPhi)) / (4 * math.Pi)
    val x = math.min(n - 1, math.max(0, math.floor(xf * n).toInt))
    val y = math.min(n - 1, math.max(0, math.floor(yf * n).toInt))
    Tile(x, y, zoom)
  }

  def quadkey(t: Tile): String = {
    val sb = new StringBuilder
    var i = t.zoom
    while (i > 0) {
      val mask = 1 << (i - 1)
      var d = 0
      if ((t.x & mask) != 0) d += 1
      if ((t.y & mask) != 0) d += 2
      sb.append(d)
      i -= 1
    }
    sb.toString
  }

  def fromQuadkey(qk: String): Tile = {
    var x = 0; var y = 0
    qk.foreach { c =>
      x <<= 1; y <<= 1
      c match {
        case '0' =>
        case '1' => x += 1
        case '2' => y += 1
        case '3' => x += 1; y += 1
        case other => throw new IllegalArgumentException(s"bad quadkey digit: $other")
      }
    }
    Tile(x, y, qk.length)
  }

  /** Tile bounds as a WKT polygon (inverse Web-Mercator of the corners). */
  def polygon(t: Tile): String = {
    val n = 1 << t.zoom
    def lon(x: Double) = x / n * 360.0 - 180.0
    def lat(y: Double) = {
      val yc = 0.5 - y / n
      90.0 - 360.0 * math.atan(math.exp(-yc * 2 * math.Pi)) / math.Pi
    }
    val (w, e) = (lon(t.x), lon(t.x + 1))
    val (north, south) = (lat(t.y), lat(t.y + 1))
    def f(d: Double) = Wkt.fmt(d)
    s"POLYGON ((${f(w)} ${f(south)}, ${f(e)} ${f(south)}, ${f(e)} ${f(north)}, " +
      s"${f(w)} ${f(north)}, ${f(w)} ${f(south)}))"
  }

  /** The ≤ 9 tiles around the point's tile (fewer at grid edges). */
  def around(lat: Double, lon: Double, zoom: Int): Seq[String] = {
    val c = at(lat, lon, zoom)
    val n = 1 << zoom
    for {
      dx <- -1 to 1
      dy <- -1 to 1
      x = c.x + dx
      y = c.y + dy
      if x >= 0 && x < n && y >= 0 && y < n
    } yield Tile(x, y, zoom).toString
  }

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("bing_tile", (x: Int, y: Int, zoom: Int) => Tile(x, y, zoom).toString)
    u.register("bing_tile_from_quadkey", (qk: String) =>
      if (qk == null) null else fromQuadkey(qk).toString)
    u.register("bing_tile_at", (lat: Double, lon: Double, zoom: Int) =>
      at(lat, lon, zoom).toString)
    u.register("bing_tile_quadkey", (t: String) =>
      if (t == null) null else quadkey(parse(t)))
    u.register("bing_tile_coordinates", (t: String) =>
      if (t == null) null else { val p = parse(t); Seq(p.x, p.y) })
    u.register("bing_tile_zoom_level", (t: String) =>
      if (t == null) null else java.lang.Integer.valueOf(parse(t).zoom))
    u.register("bing_tile_polygon", (t: String) =>
      if (t == null) null else polygon(parse(t)))
    u.register("bing_tiles_around", (lat: Double, lon: Double, zoom: Int) =>
      around(lat, lon, zoom))
  }
}
