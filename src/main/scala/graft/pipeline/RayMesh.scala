package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * reference's direction accident). Appends nullable hit_x/y/z.
    *
    * Shape: a scalar UDF over the six coordinate doubles, evaluated
    * inside whole-stage codegen — the previous mapPartitions+RowEncoder
    * version serialized EVERY column of every ray through a Row round
    * trip; this boxes six doubles and one small result struct, and
    * passthrough columns never leave Tungsten rows.
    */
  def firstHits(rays: DataFrame, mesh: TriMesh): DataFrame = {
    val spark = rays.sparkSession
    val bc = spark.sparkContext.broadcast(mesh)
    val hit = udf { (ox: Double, oy: Double, oz: Double, rx: Double, ry: Double, rz: Double) =>
      bc.value.firstHit(ox, oy, oz, rx - ox, ry - oy, rz - oz)
        .map { case (px, py, pz, _) => (px, py, pz) }
    }
    rays
      .withColumn("_hit", hit(col("ox"), col("oy"), col("oz"),
        col("rx"), col("ry"), col("rz")))
      .withColumn("hit_x", col("_hit._1"))
      .withColumn("hit_y", col("_hit._2"))
      .withColumn("hit_z", col("_hit._3"))
      .drop("_hit")
  }
}
