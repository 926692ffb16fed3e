package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.geo.Dbscan

/** One mesh cell entering the clustering kernel. `tile` is the spatial
  * partition key — the reference fits one global DBSCAN on a decimated
  * mesh (MeshWallExtractror.py:36,65); the scale path is tiling: bound
  * the O(n²) kernel per tile and merge margin-sharing clusters.
  */
final case class CellRow(
    tile: Long, cell_id: Long,
    nx: Double, ny: Double, nz: Double,
    cx: Double, cy: Double, cz: Double,
    f0: Double, f1: Double, f2: Double)

/** Wall-plane extraction (SURVEY.md §2 F6/M17/M18/A7/A8/A11) — Spark port
  * of heritage-guard/heritage_guard/helpers/MeshWallExtractror.py:34-89.
  *
  * Relational stages (vertical filter, azimuth angle, feature weighting,
  * z-normalization) are plain codegen'd column ops; only the DBSCAN core
  * drops into a typed kernel. StandardScaler's fit is a global
  * avg/stddev_pop aggregate — map-side partial, one tiny shuffle.
  */
object WallPlanes {

  /** @param cells (cell_id, nx, ny, nz, cx, cy, cz)
    * @param tiles  number of spatial tiles for the clustering kernel;
    *               1 reproduces the reference's global fit.
    */
  /** The SQL-expressible prologue (F6 vertical filter + M17 azimuth + M18
    * weighting + StandardScaler z-norm) — shared by [[wallPlanes]] and the
    * q93 partial oracle, so the oracled query runs the exact code path
    * the DBSCAN stage consumes.
    */
  def scaledFeatures(
      cells: DataFrame,
      verticalThreshold: Double = 0.1,
      angleWeight: Double = 10000.0,
      centroidWeight: Double = 0.001): DataFrame = {
    // F6 vertical filter + M17 azimuth + M18 weighting, all pushed-down
    // column arithmetic (MeshWallExtractror.py:43-59).
    val vertical = cells.filter(abs(col("nz")) < verticalThreshold)
    val feat = vertical
      .withColumn("angle", pmod(degrees(atan2(col("ny"), col("nx"))), lit(360.0)))
      .withColumn("w0", col("angle") * angleWeight)
      .withColumn("w1", col("cx") * centroidWeight)
      .withColumn("w2", col("cy") * centroidWeight)

    // StandardScaler fit: population std, ddof=0 (sklearn convention,
    // MeshWallExtractror.py:62-63) as a broadcast 1-row aggregate.
    val stats = feat.agg(
      avg("w0").as("m0"), coalesce(stddev_pop("w0"), lit(1.0)).as("s0"),
      avg("w1").as("m1"), coalesce(stddev_pop("w1"), lit(1.0)).as("s1"),
      avg("w2").as("m2"), coalesce(stddev_pop("w2"), lit(1.0)).as("s2"))
    def nz(s: org.apache.spark.sql.Column) = when(s === 0.0, 1.0).otherwise(s)
    feat.crossJoin(broadcast(stats))
      .withColumn("f0", (col("w0") - col("m0")) / nz(col("s0")))
      .withColumn("f1", (col("w1") - col("m1")) / nz(col("s1")))
      .withColumn("f2", (col("w2") - col("m2")) / nz(col("s2")))
  }

  def wallPlanes(
      cells: DataFrame,
      verticalThreshold: Double = 0.1,
      angleWeight: Double = 10000.0,
      centroidWeight: Double = 0.001,
      eps: Double = 0.03,
      minSamples: Int = 20,
      tiles: Int = 1): DataFrame = {
    import cells.sparkSession.implicits._

    val scaled = scaledFeatures(cells, verticalThreshold, angleWeight, centroidWeight)
      .withColumn("tile", pmod(col("cell_id"), lit(tiles.toLong)))
      .select(col("tile").cast("long"), col("cell_id").cast("long"),
        col("nx"), col("ny"), col("nz"), col("cx"), col("cy"), col("cz"),
        col("f0"), col("f1"), col("f2"))
      .as[CellRow]

    // A11: DBSCAN per tile. Cells sorted by id for deterministic labels;
    // tile id is folded into the cluster id so labels stay globally unique.
    val labeled = scaled.groupByKey(_.tile).flatMapGroups { (tile, rows) =>
      val cs = rows.toIndexedSeq.sortBy(_.cell_id)
      val labels = Dbscan.fit(cs.map(c => Array(c.f0, c.f1, c.f2)), eps, minSamples)
      cs.iterator.zip(labels.iterator).map { case (c, l) =>
        (c.cell_id, c.nx, c.ny, c.nz, c.cx, c.cy, c.cz,
          if (l == Dbscan.Noise) -1L else tile + l.toLong * tiles)
      }
    }.toDF("cell_id", "nx", "ny", "nz", "cx", "cy", "cz", "cluster")

    // F8 noise drop + A7 per-cluster means + A8 bounds
    // (MeshWallExtractror.py:75-89).
    labeled.filter(col("cluster") =!= -1L)
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n"),
        avg("nx").as("avg_nx"), avg("ny").as("avg_ny"), avg("nz").as("avg_nz"),
        avg("cx").as("avg_cx"), avg("cy").as("avg_cy"), avg("cz").as("avg_cz"),
        min("cx").as("min_x"), max("cx").as("max_x"),
        min("cy").as("min_y"), max("cy").as("max_y"),
        min("cz").as("min_z"), max("cz").as("max_z"))
      .orderBy(col("cluster"))
  }
}
