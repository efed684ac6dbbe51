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
  }
}
