package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Geospatial tranche 4 driver queries: spatial relations (ST_Touches /
  * Crosses / Overlaps / Equals / Relate / Boundary / IsSimple / IsValid),
  * linear referencing (line_locate_point / line_interpolate_point*s*),
  * GeoJSON + encoded-polyline IO, spherical geography, and the two
  * geometry aggregates (geometry_union_agg / convex_hull_agg). Geometry
  * fixtures are parameterized squares/rectangles whose pairwise boundary
  * contacts are closed-form, so every answer is restatable as DuckDB
  * arithmetic. Reference: `plugin/trino-geospatial/.../GeoFunctions.java`
  * and `aggregation/GeometryUnionAgg.java` / `ConvexHullAggregation.java`.
  */
object GeoQueries {
  type Q = (SparkSession, String) => DataFrame

  private def q(sql: String): Q = (s, dir) => Tables.sql(s, dir, sql)

  private val defs: Map[String, (String, String)] = Map(
    // relations over a k-square A, its edge-neighbor B, a half-shifted
    // overlapper C and a crossing line L: every DE-9IM-level predicate
    // has a literal truth value by construction
    "geo_relations" -> (
      """SELECT n_nationkey,
        |st_touches(a, b) AS ab_touch,
        |st_overlaps(a, b) AS ab_overlap,
        |st_touches(a, c) AS ac_touch,
        |st_overlaps(a, c) AS ac_overlap,
        |st_crosses(l, a) AS la_cross,
        |st_crosses(a, l) AS al_cross,
        |st_equals(a, concat('POLYGON ((', k, ' 0, ', k, ' ', k, ', 0 ', k, ', 0 0, ', k, ' 0))')) AS a_eq_rot,
        |st_equals(a, b) AS a_eq_b,
        |st_relate(a, c, 'T*T***T**') AS ac_relate,
        |st_astext(st_boundary(a)) AS a_boundary,
        |st_issimple(concat('LINESTRING (0 0, ', k, ' ', k, ', ', k, ' 0, 0 ', k, ')')) AS fig8_simple,
        |st_isvalid(concat('POLYGON ((0 0, ', k, ' ', k, ', ', k, ' 0, 0 ', k, ', 0 0))')) AS bowtie_valid,
        |st_isvalid(a) AS a_valid,
        |st_isring(concat('LINESTRING (0 0, ', k, ' 0, ', k, ' ', k, ', 0 0)')) AS tri_ring,
        |element_at(geometry_nearest_points(a, f), 1) AS near_a,
        |element_at(geometry_nearest_points(a, f), 2) AS near_f,
        |round(st_area(geometry_union(array(a, c))), 6) AS union_area
        |FROM (SELECT n_nationkey, k,
        |  concat('POLYGON ((0 0, ', k, ' 0, ', k, ' ', k, ', 0 ', k, ', 0 0))') AS a,
        |  concat('POLYGON ((', k, ' 0, ', 2 * k, ' 0, ', 2 * k, ' ', k, ', ', k, ' ', k, ', ', k, ' 0))') AS b,
        |  concat('POLYGON ((', h, ' ', h, ', ', k + h, ' ', h, ', ', k + h, ' ', k + h, ', ', h, ' ', k + h, ', ', h, ' ', h, '))') AS c,
        |  concat('LINESTRING (-1 ', h, ', ', k + 1, ' ', h, ')') AS l,
        |  concat('POLYGON ((', k + 3, ' 0, ', k + 4, ' 0, ', k + 4, ' 1, ', k + 3, ' 1, ', k + 3, ' 0))') AS f
        |  FROM (SELECT n_nationkey, (n_nationkey + 1) * 2 AS k, n_nationkey + 1 AS h
        |        FROM nation))""".stripMargin,
      """SELECT n_nationkey,
        |true AS ab_touch, false AS ab_overlap,
        |false AS ac_touch, true AS ac_overlap,
        |true AS la_cross, true AS al_cross,
        |true AS a_eq_rot, false AS a_eq_b, true AS ac_relate,
        |'LINESTRING (0 0, ' || k || ' 0, ' || k || ' ' || k || ', 0 ' || k || ', 0 0)' AS a_boundary,
        |false AS fig8_simple, false AS bowtie_valid, true AS a_valid, true AS tri_ring,
        |'POINT (' || k || ' 0)' AS near_a,
        |'POINT (' || k + 3 || ' 0)' AS near_f,
        |round((2 * k * k - (k - h) * (k - h))::double, 6) AS union_area
        |FROM (SELECT n_nationkey, (n_nationkey + 1) * 2 AS k, n_nationkey + 1 AS h
        |      FROM nation)""".stripMargin),
    // linear referencing on the L-shaped line (0 0)->(k 0)->(k k):
    // total length 2k makes every fraction a closed form; the
    // constructor/accessor Trino spellings ride along
    "geo_linear_ref" -> (
      """SELECT n_nationkey,
        |round(line_locate_point(l, concat('POINT (', k, ' ', h, ')')), 6) AS loc_a,
        |round(line_locate_point(l, concat('POINT (', h, ' 1)')), 6) AS loc_b,
        |line_interpolate_point(l, 0.25d) AS interp_q,
        |array_join(line_interpolate_points(l, 0.5d), '; ') AS interp_halves,
        |st_startpoint(l) AS sp, st_endpoint(l) AS ep,
        |st_pointn(l, 2) AS p2, st_numpoints(l) AS np,
        |simplify_geometry(concat('LINESTRING (0 0, ', h, ' 0, ', k, ' 0)'), 0.1d) AS simp,
        |st_linestring(array(st_point(0.0d, 0.0d), concat('POINT (', k, ' ', k, ')'))) AS built_line,
        |st_multipoint(array(st_point(0.0d, 0.0d), concat('POINT (', k, ' ', k, ')'))) AS built_mp,
        |array_join(st_points(l), '; ') AS pts,
        |array_join(st_envelopeaspts(l), '; ') AS env,
        |array_join(st_interiorrings(concat('POLYGON ((0 0, ', 3 * k, ' 0, ', 3 * k, ' ', 3 * k, ', 0 ', 3 * k, ', 0 0), (', k, ' ', k, ', ', 2 * k, ' ', k, ', ', 2 * k, ' ', 2 * k, ', ', k, ' ', 2 * k, ', ', k, ' ', k, '))')), '; ') AS irings,
        |array_join(st_geometries(concat('MULTIPOINT (1 1, ', k, ' ', k, ')')), '; ') AS parts,
        |st_coorddim(l) AS cd
        |FROM (SELECT n_nationkey, (n_nationkey + 1) * 2 AS k, n_nationkey + 1 AS h,
        |  concat('LINESTRING (0 0, ', (n_nationkey + 1) * 2, ' 0, ',
        |         (n_nationkey + 1) * 2, ' ', (n_nationkey + 1) * 2, ')') AS l
        |  FROM nation)""".stripMargin,
      """SELECT n_nationkey,
        |round(0.75::double, 6) AS loc_a,
        |round((h::double) / (4 * h), 6) AS loc_b,
        |'POINT (' || h || ' 0)' AS interp_q,
        |'POINT (' || k || ' 0); POINT (' || k || ' ' || k || ')' AS interp_halves,
        |'POINT (0 0)' AS sp,
        |'POINT (' || k || ' ' || k || ')' AS ep,
        |'POINT (' || k || ' 0)' AS p2, 3 AS np,
        |'LINESTRING (0 0, ' || k || ' 0)' AS simp,
        |'LINESTRING (0 0, ' || k || ' ' || k || ')' AS built_line,
        |'MULTIPOINT (0 0, ' || k || ' ' || k || ')' AS built_mp,
        |'POINT (0 0); POINT (' || k || ' 0); POINT (' || k || ' ' || k || ')' AS pts,
        |'POINT (0 0); POINT (' || k || ' ' || k || ')' AS env,
        |'LINESTRING (' || k || ' ' || k || ', ' || 2 * k || ' ' || k || ', ' || 2 * k || ' ' || 2 * k || ', ' || k || ' ' || 2 * k || ', ' || k || ' ' || k || ')' AS irings,
        |'POINT (1 1); POINT (' || k || ' ' || k || ')' AS parts,
        |2::tinyint AS cd
        |FROM (SELECT n_nationkey, (n_nationkey + 1) * 2 AS k, n_nationkey + 1 AS h
        |      FROM nation)""".stripMargin),
    // GeoJSON + encoded-polyline IO: literal JSON for fixed shapes,
    // round trips for parameterized ones, plus the reference's
    // case-insensitive spellings (ST_GeometryFromText, ST_ConvexHull)
    "geo_geojson" -> (
      """SELECT n_nationkey,
        |to_geojson_geometry(concat('POINT (', k, ' ', k + 1, ')')) AS gj_point,
        |to_geojson_geometry(a) AS gj_poly,
        |from_geojson_geometry(to_geojson_geometry(holed)) AS rt_holed,
        |from_encoded_polyline(to_encoded_polyline(concat('LINESTRING (', k, ' ', k, ', ', k + 1, ' ', k + 2, ')'))) AS rt_line,
        |st_geometryfromtext(concat('POINT (', k, ' 2)')) AS gft,
        |st_astext(st_convexhull(concat('MULTIPOINT (0 0, ', k, ' 0, 0 ', k, ', ', k, ' ', k, ', 1 1)'))) AS hull,
        |st_geometrytype(a) AS gtype,
        |st_numgeometries(concat('MULTIPOINT (1 1, 2 2, ', k, ' ', k, ')')) AS ngeoms,
        |st_geometryn(concat('MULTIPOINT (1 1, ', k, ' ', k, ')'), 2) AS g2,
        |st_exteriorring(a) AS xring,
        |st_numinteriorring(holed) AS nir,
        |st_symdifference(a, a) AS sd_self
        |FROM (SELECT n_nationkey, k,
        |  concat('POLYGON ((0 0, ', k, ' 0, ', k, ' ', k, ', 0 ', k, ', 0 0))') AS a,
        |  concat('POLYGON ((0 0, ', 3 * k, ' 0, ', 3 * k, ' ', 3 * k, ', 0 ', 3 * k, ', 0 0), (', k, ' ', k, ', ', 2 * k, ' ', k, ', ', 2 * k, ' ', 2 * k, ', ', k, ' ', 2 * k, ', ', k, ' ', k, '))') AS holed
        |  FROM (SELECT n_nationkey, n_nationkey + 2 AS k FROM nation))""".stripMargin,
      """SELECT n_nationkey,
        |'{"type":"Point","coordinates":[' || k || ',' || k + 1 || ']}' AS gj_point,
        |'{"type":"Polygon","coordinates":[[[0,0],[' || k || ',0],[' || k || ',' || k || '],[0,' || k || '],[0,0]]]}' AS gj_poly,
        |'POLYGON ((0 0, ' || 3 * k || ' 0, ' || 3 * k || ' ' || 3 * k || ', 0 ' || 3 * k || ', 0 0), (' || k || ' ' || k || ', ' || 2 * k || ' ' || k || ', ' || 2 * k || ' ' || 2 * k || ', ' || k || ' ' || 2 * k || ', ' || k || ' ' || k || '))' AS rt_holed,
        |'LINESTRING (' || k || ' ' || k || ', ' || k + 1 || ' ' || k + 2 || ')' AS rt_line,
        |'POINT (' || k || ' 2)' AS gft,
        |'POLYGON ((0 0, ' || k || ' 0, ' || k || ' ' || k || ', 0 ' || k || ', 0 0))' AS hull,
        |'ST_Polygon' AS gtype, 3 AS ngeoms,
        |'POINT (' || k || ' ' || k || ')' AS g2,
        |'LINESTRING (0 0, ' || k || ' 0, ' || k || ' ' || k || ', 0 ' || k || ', 0 0)' AS xring,
        |1 AS nir,
        |'GEOMETRYCOLLECTION EMPTY' AS sd_self
        |FROM (SELECT n_nationkey, n_nationkey + 2 AS k FROM nation)""".stripMargin),
    // spherical geography: equator/meridian arcs and the spherical
    // triangle (0 0)-(w 0)-(0 h), whose L'Huilier excess collapses to
    // 2·atan(tan(w/2)·tan(h/2)); great_circle_distance now carries the
    // reference's exact semantics — KILOMETERS via the Vincenty-form
    // atan2 on the 6371.01 km sphere (GeoFunctions.java:1511)
    "geo_geography" -> (
      """SELECT n_nationkey,
        |round(st_geography_distance(concat('POINT (', w, ' 0)'), 'POINT (0 0)'), 3) AS d_equator_m,
        |round(st_geography_length(concat('LINESTRING (0 0, 0 ', h, ', 0 ', h + 1, ')')), 3) AS len_meridian_m,
        |round(st_geography_area(concat('POLYGON ((0 0, ', w, ' 0, 0 ', h, ', 0 0))')) / 1e6, 3) AS tri_area_km2,
        |round(great_circle_distance(cast(h AS double), 0.0d, 0.0d, 0.0d), 6) AS gc_km,
        |st_astext(to_spherical_geography(concat('POINT (', w, ' ', h, ')'))) AS geog_rt,
        |st_astext(to_geometry(concat('POINT (', w, ' ', h, ')'))) AS geom_rt
        |FROM (SELECT n_nationkey, n_regionkey * 10 + 1 AS w, n_nationkey + 1 AS h
        |      FROM nation)""".stripMargin,
      """SELECT n_nationkey,
        |round(radians(w) * 6371010.0, 3) AS d_equator_m,
        |round(radians(h + 1) * 6371010.0, 3) AS len_meridian_m,
        |round(2 * atan(tan(radians(w) / 2) * tan(radians(h) / 2)) * 6371010.0 * 6371010.0 / 1e6, 3) AS tri_area_km2,
        |round(atan2(abs(sin(radians(h))), cos(radians(h))) * 6371.01, 6) AS gc_km,
        |'POINT (' || w || ' ' || h || ')' AS geog_rt,
        |'POINT (' || w || ' ' || h || ')' AS geom_rt
        |FROM (SELECT n_nationkey, n_regionkey * 10 + 1 AS w, n_nationkey + 1 AS h
        |      FROM nation)""".stripMargin),
    // geometry aggregates per region: 5 growing-height rects chained
    // along x (scaled to integers so WKT formatting is exact in both
    // engines; every boundary meeting is a proper crossing — the
    // clipping kernel's supported class). Union area and the collinear-
    // pruned convex hull are closed forms.
    "geo_union_agg" -> (
      """SELECT n_regionkey,
        |round(st_area(geometry_union_agg(rect)), 6) AS union_area,
        |st_astext(convex_hull_agg(rect)) AS hull
        |FROM (SELECT n_regionkey,
        |  concat('POLYGON ((', 10 * j, ' ', -(10 + j), ', ', 10 * j + 20, ' ', -(10 + j),
        |         ', ', 10 * j + 20, ' ', 10 + j, ', ', 10 * j, ' ', 10 + j,
        |         ', ', 10 * j, ' ', -(10 + j), '))') AS rect
        |  FROM (SELECT n_regionkey,
        |        cast(row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) - 1 AS int) AS j
        |        FROM nation))
        |GROUP BY n_regionkey""".stripMargin,
      """SELECT n_regionkey,
        |round(1480.0::double, 6) AS union_area,
        |'POLYGON ((0 -10, 40 -14, 60 -14, 60 14, 40 14, 0 10, 0 -10))' AS hull
        |FROM (SELECT DISTINCT n_regionkey FROM nation)""".stripMargin))

  /** KDB-partitioned spatial join (operators.SpatialPartition): customer
    * points against supplier boxes as a shuffled EQUI-join on the leaf
    * id — the partitioned-mode SpatialJoinOperator analog, where neither
    * side needs to fit in a broadcast. Oracle = the same join as plain
    * DuckDB theta arithmetic (the result is partitioning-independent by
    * construction).
    */
  private val partitionedJoin: Q = (s, dir) => {
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        (col("c_acctbal") / 1000.0).as("x"),
        (col("c_nationkey") + 0.5).as("y"))
    val boxes = Tables.load(s, dir, "supplier")
      .select(col("s_suppkey"),
        ((col("s_suppkey") % 7) * 1.4 - 1.0).as("bxmin"),
        ((col("s_suppkey") % 11) * 2.2).as("bymin"))
      .withColumn("bxmax", col("bxmin") + 2.5)
      .withColumn("bymax", col("bymin") + 3.5)
    val tree = graft.operators.SpatialPartition.kdbTree(cust, "x", "y",
      sampleN = 500, leafCap = 50)
    graft.operators.SpatialPartition
      .pointInBoxJoin(cust, "x", "y", boxes, "bxmin", "bymin", "bxmax", "bymax", tree)
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_pts"), min(col("c_custkey")).as("min_cust"))
  }

  private val partitionedJoinOracle: String =
    """SELECT s_suppkey, count(*) AS n_pts, min(c_custkey) AS min_cust
      |FROM (SELECT c_custkey, c_acctbal / 1000.0 AS x, c_nationkey + 0.5 AS y
      |      FROM customer) p
      |JOIN (SELECT s_suppkey,
      |        (s_suppkey % 7) * 1.4 - 1.0 AS bxmin,
      |        (s_suppkey % 11) * 2.2 AS bymin,
      |        (s_suppkey % 7) * 1.4 - 1.0 + 2.5 AS bxmax,
      |        (s_suppkey % 11) * 2.2 + 3.5 AS bymax
      |      FROM supplier) b
      |  ON p.x >= b.bxmin AND p.x <= b.bxmax AND p.y >= b.bymin AND p.y <= b.bymax
      |GROUP BY s_suppkey""".stripMargin

  def queries: Map[String, Q] =
    defs.map { case (k, (sql, _)) => k -> q(sql) } +
      ("geo_partitioned_join" -> partitionedJoin)
  def oracles: Map[String, String] =
    defs.map { case (k, (_, o)) => k -> o } +
      ("geo_partitioned_join" -> partitionedJoinOracle)
}
