package graft.queries

import org.apache.spark.sql.functions._

import graft.geo.TriMesh

/** Mesh INGESTION as a declared, oracled operator (SURVEY.md §2 M22,
  * closing the reference's `pv.read` → normals/centroids path,
  * MeshWallExtractror.py:36-49): Wavefront OBJ text is parsed in-engine
  * by [[TriMesh.fromObj]] (quad faces fan-triangulated, v/vt/vn refs,
  * one face per mesh in negative-index form — the parser surface
  * ObjMeshSpec pins on the checked-in fixture), per-triangle normals
  * and centroids are computed from the cross product, and the declared
  * output aggregates them per mesh.
  *
  * Each supplier row carries one deterministic "building" (an
  * axis-aligned box with key-derived dims/offsets), so mesh COUNT
  * scales with sf while triangles-per-mesh stays constant — the same
  * bounded-kernel shape as the panorama queries. The oracle never
  * parses OBJ: it recomputes every aggregate from the box closed
  * forms (surface area 2(wh+wd+hd), per-axis projected areas, and the
  * fan-triangulation identity Σ centroids = 12 × box center), so a
  * matching hash proves the parse, the triangulation, and the
  * cross-product math all at once.
  *
  * Scale shape: map-only fan-out (1 mesh row → 12 triangle rows) into
  * a map-side-combined aggregate keyed by mesh_id — no join, no
  * broadcast, no skew (every group is exactly 12 rows).
  */
object MeshIngest {

  /** Deterministic OBJ document for mesh `k`: an axis-aligned box,
    * quad faces (exercising fan triangulation), vt/vn noise lines and
    * v/vt/vn face refs (exercising ref parsing), and the top face in
    * negative-index form. Dims are 1-decimal quantities so every
    * oracle closed form is exact at 2 decimals — far from the
    * round(·, 6) boundary any cross-engine double drift could reach.
    */
  def objText(k: Long): Seq[String] = {
    val w = 2.0 + (k * 7 % 50) / 10.0
    val h = 3.0 + (k * 11 % 40) / 10.0
    val d = 1.0 + (k * 13 % 30) / 10.0
    val ox = k * 5.0
    val oy = (k % 10) * 2.0
    val oz = 0.0
    def v(x: Double, y: Double, z: Double) = s"v $x $y $z"
    Seq(
      s"# mesh $k",
      "o building",
      v(ox, oy, oz), v(ox + w, oy, oz), v(ox + w, oy + h, oz), v(ox, oy + h, oz),
      v(ox, oy, oz + d), v(ox + w, oy, oz + d), v(ox + w, oy + h, oz + d), v(ox, oy + h, oz + d),
      "vt 0.0 0.0", "vt 1.0 1.0",
      "vn 0.0 0.0 1.0",
      "f 1/1/1 2/2/1 3/1/1 4/2/1", // bottom (v/vt/vn refs)
      "f -4 -3 -2 -1",             // top (negative indices)
      "f 1 2 6 5",                 // front
      "f 4 3 7 8",                 // back
      "f 1 4 8 5",                 // left
      "f 2 3 7 6")                 // right
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q105_obj_normals",
      Some("""
        WITH m AS (SELECT s_suppkey::BIGINT AS mesh_id,
                          2.0 + (s_suppkey * 7 % 50) / 10.0 AS w,
                          3.0 + (s_suppkey * 11 % 40) / 10.0 AS h,
                          1.0 + (s_suppkey * 13 % 30) / 10.0 AS d,
                          s_suppkey * 5.0 AS ox,
                          (s_suppkey % 10) * 2.0 AS oy,
                          0.0 AS oz
                   FROM supplier)
        SELECT mesh_id,
               CAST(12 AS BIGINT) AS n_tris,
               round(2 * (w*h + w*d + h*d), 6) AS total_area,
               round(2 * h * d, 6) AS area_x,
               round(2 * w * d, 6) AS area_y,
               round(2 * w * h, 6) AS area_z,
               round(12 * (ox + w / 2), 6) AS cx_sum,
               round(12 * (oy + h / 2), 6) AS cy_sum,
               round(12 * (oz + d / 2), 6) AS cz_sum
        FROM m ORDER BY mesh_id"""))( (spark, dir) => {
      import spark.implicits._
      val tris = graft.sources.Tables.supplier(spark, dir)
        .select(col("s_suppkey").cast("long")).as[Long]
        .flatMap { k =>
          val t = TriMesh.fromObj(objText(k))
          (0 until t.length / 9).iterator.map { i =>
            val o = i * 9
            val e1x = t(o + 3) - t(o); val e1y = t(o + 4) - t(o + 1); val e1z = t(o + 5) - t(o + 2)
            val e2x = t(o + 6) - t(o); val e2y = t(o + 7) - t(o + 1); val e2z = t(o + 8) - t(o + 2)
            val cxp = e1y * e2z - e1z * e2y
            val cyp = e1z * e2x - e1x * e2z
            val czp = e1x * e2y - e1y * e2x
            // |cross|/2 is the triangle area; |cross_axis|/2 its
            // projection onto the axis plane (area·|n_axis|).
            val area = math.sqrt(cxp * cxp + cyp * cyp + czp * czp) / 2.0
            (k, area, math.abs(cxp) / 2.0, math.abs(cyp) / 2.0, math.abs(czp) / 2.0,
              (t(o) + t(o + 3) + t(o + 6)) / 3.0,
              (t(o + 1) + t(o + 4) + t(o + 7)) / 3.0,
              (t(o + 2) + t(o + 5) + t(o + 8)) / 3.0)
          }
        }
        .toDF("mesh_id", "area", "ax", "ay", "az", "cx", "cy", "cz")
      tris.groupBy(col("mesh_id"))
        .agg(count(lit(1)).as("n_tris"),
          round(sum(col("area")), 6).as("total_area"),
          round(sum(col("ax")), 6).as("area_x"),
          round(sum(col("ay")), 6).as("area_y"),
          round(sum(col("az")), 6).as("area_z"),
          round(sum(col("cx")), 6).as("cx_sum"),
          round(sum(col("cy")), 6).as("cy_sum"),
          round(sum(col("cz")), 6).as("cz_sum"))
        .orderBy(col("mesh_id"))
    }))
}
