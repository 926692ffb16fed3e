package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.geo.TriMesh

/** Ray–mesh first-hit intersection (SURVEY.md §2 M21/U7) — the
  * `point_and_mesh_intersection` stage (street_level_grouping.py:203-234)
  * as a Spark operator.
  *
  * The mesh is a model artifact, not a table (SURVEY §2 S9): built once
  * on the driver, BROADCAST to executors, probed inside `mapPartitions`.
  * Rays stream through; output adds nullable hit coordinates (a miss
  * keeps the original vertex semantics of the reference: only hits
  * overwrite, slg.py:222-226). No shuffle is introduced — the operator
  * is map-shaped, so it composes with whatever partitioning the ray
  * producer already has.
  */
object RayMesh {

  /** The synthetic "building": four wall rings around the pose-grid
    * origin area, deterministic literals only — the harness stand-in for
    * the reference's LiDAR OBJ.
    */
  def syntheticBuilding(): TriMesh = {
    val walls = Array(
      // Near box around origins (poses sit at x∈[0,~550], y∈[-300,0], z≈50-200).
      TriMesh.wallQuad(-200, -500, 800, -500, 0, 300),
      TriMesh.wallQuad(-200, 200, 800, 200, 0, 300),
      TriMesh.wallQuad(-200, -500, -200, 200, 0, 300),
      TriMesh.wallQuad(800, -500, 800, 200, 0, 300),
      // A far shell so up/down-tilted rays can still land.
      TriMesh.wallQuad(-5000, -5000, 5000, -5000, -2000, 2000),
      TriMesh.wallQuad(-5000, 5000, 5000, 5000, -2000, 2000),
      TriMesh.wallQuad(-5000, -5000, -5000, 5000, -2000, 2000),
      TriMesh.wallQuad(5000, -5000, 5000, 5000, -2000, 2000))
    TriMesh.build(walls.flatten.toArray)
  }

  /** Intersect rays (ox,oy,oz)→(rx,ry,rz) with the broadcast mesh;
    * direction = endpoint − origin (see TriMesh scaladoc on the
    * reference's direction accident). Appends nullable hit_x/y/z/t.
    */
  def firstHits(rays: DataFrame, mesh: TriMesh): DataFrame = {
    val spark = rays.sparkSession
    val bc = spark.sparkContext.broadcast(mesh)
    val schema = StructType(rays.schema.fields ++ Seq(
      StructField("hit_x", DoubleType), StructField("hit_y", DoubleType),
      StructField("hit_z", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val oxI = rays.schema.fieldIndex("ox"); val oyI = rays.schema.fieldIndex("oy")
    val ozI = rays.schema.fieldIndex("oz")
    val rxI = rays.schema.fieldIndex("rx"); val ryI = rays.schema.fieldIndex("ry")
    val rzI = rays.schema.fieldIndex("rz")
    rays.mapPartitions { rows =>
      val m = bc.value
      rows.map { r =>
        val ox = r.getDouble(oxI); val oy = r.getDouble(oyI); val oz = r.getDouble(ozI)
        val hit = m.firstHit(ox, oy, oz,
          r.getDouble(rxI) - ox, r.getDouble(ryI) - oy, r.getDouble(rzI) - oz)
        val extra = hit match {
          case Some((px, py, pz, _)) => Seq[Any](px, py, pz)
          case None => Seq[Any](null, null, null)
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }
}
