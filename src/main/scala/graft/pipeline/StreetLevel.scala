package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.geo.{BBox, BBoxGrouping, Orientation, Projection}

/** One detection row entering the grouping kernel — the typed shape of
  * the reference's per-panorama frame (street_level_grouping.py:104-124).
  */
final case class Detection(
    file_name: String, det_idx: Long,
    x1: Double, y1: Double, x2: Double, y2: Double,
    score: Double, cls: Int)

final case class GroupedDetection(
    file_name: String, det_idx: Long,
    x1: Double, y1: Double, x2: Double, y2: Double,
    score: Double, cls: Int, group_idx: Int)

/** Street-level pipeline builders (SURVEY.md §3 entry point 2, §7 phase 3).
  *
  * The reference's joblib process pool fanned out per panorama
  * (street_level_grouping.py:191-192) IS Spark's partition parallelism:
  * `groupByKey(file_name)` shuffles each panorama's detections to one
  * task, and the order-dependent greedy kernel runs partition-locally.
  * At 100 TB the shuffle key (file_name) has ~millions of distinct values
  * with tens of rows each — near-uniform, no skew salting needed; AQE
  * coalesces the small post-shuffle partitions.
  */
object StreetLevel {

  val ImageWidth = 8000.0
  val ImageHeight = 4000.0

  /** A2+J4+A5+J5 in one pass: per-panorama greedy IoU grouping.
    * flatMapGroups port of grouped_detected_objects
    * (street_level_grouping.py:100-135) over [[graft.geo.BBoxGrouping]].
    * Rows are ordered by det_idx inside the kernel — the reference's
    * `reset_index()` makes positional order the grouping order, and
    * Spark's group iterator order is not guaranteed, so the sort restores
    * determinism.
    */
  def groupedDetections(
      detections: Dataset[Detection],
      iouThreshold: Double = 0.01,
      imageWidth: Double = ImageWidth,
      imageHeight: Double = ImageHeight): Dataset[GroupedDetection] = {
    import detections.sparkSession.implicits._
    val stats = SweepStats.forSession(detections.sparkSession)
    val denseCutoff = SweepStats.threshold(detections.sparkSession)
    // Relational groupBy(col).as[K, V], not the typed groupByKey(_.file_
    // name): the typed form appends the key via a per-row lambda, which
    // deserializes every row ONCE JUST TO READ THE KEY before the
    // shuffle; grouping on the column keeps the pre-shuffle side fully
    // unboxed (measured 0.55 → 0.40 s warm, 1.64 → 0.67 s cold at sf0.1
    // for the identical kernel). Same per-key grouping, same rows.
    detections.groupBy(col("file_name")).as[String, Detection].flatMapGroups { (fn, rows) =>
      val dets = rows.toIndexedSeq.sortBy(_.det_idx)
      val boxes = dets.map(d =>
        BBox((d.x1, d.y1, d.x2, d.y2), d.score, d.cls, imageWidth, imageHeight))
      val toGroup = BBoxGrouping.groupIndex(boxes, iouThreshold,
        (n, pairs) => stats.record(fn, n, pairs, denseCutoff))
      dets.iterator.zipWithIndex.map { case (d, i) =>
        GroupedDetection(d.file_name, d.det_idx, d.x1, d.y1, d.x2, d.y2,
          d.score, d.cls, toGroup(i))
      }
    }
  }

  /** A4: best-scoring detection per (file_name, group_idx). `idxmax`
    * returns the first max in index order (street_level_grouping.py:157),
    * so det_idx is the tiebreaker.
    */
  def bestPerGroup(grouped: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("file_name"), col("group_idx"))
      .orderBy(col("score").desc, col("det_idx"))
    grouped.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Pixel→3D-ray UDF over [[Projection.pointTo3dLine]] (SURVEY §2 U2).
    * Pose fixups (roll negated, heading+90, deg→rad) are applied inside,
    * mirroring best_lines_3d (street_level_grouping.py:184-189).
    */
  private val rayUdf = udf {
    (x: Double, y: Double, roll: Double, pitch: Double, heading: Double,
     ox: Double, oy: Double, oz: Double, w: Double, h: Double) =>
      val o = Orientation(roll = -roll, pitch = pitch, heading = heading + 90).rads
      Projection.pointTo3dLine(x, y, o, (ox, oy, oz), w, h)
  }

  /** J1+A4+M10+U2: the best_lines_3d stage (street_level_grouping.py:
    * 175-199) ending in exploded per-vertex rays — the shape the ray-mesh
    * intersection consumes. Picks the best row per group, broadcast-joins
    * the small pose table, stride-subsamples the rectangle ring implied by
    * the bbox (the synthetic analogue of the mask polygon; the `[0::
    * spacing]` stride at street_level_grouping.py:166), and casts each
    * vertex to a 3D ray endpoint.
    * Poses: (file_name, roll, pitch, heading, ox, oy, oz).
    */
  def vertexRays(
      grouped: DataFrame,
      poses: DataFrame,
      spacing: Int = 1,
      imageWidth: Double = ImageWidth,
      imageHeight: Double = ImageHeight,
      // r19 optimization (guide §2.4, remove shuffles outright): when the
      // caller's (file_name, group_idx) is unique BY CONSTRUCTION (q95's
      // degenerate one-box-per-group assignment, group_idx = det_idx − 1),
      // bestPerGroup is the identity — but its row_number window still
      // shuffled and double-sorted every detection (one hash exchange +
      // two sorts at sf0.1, ~21 MB). The caller asserts uniqueness and the
      // window is skipped; group shapes with real contention (q82) keep it.
      inputIsBestPerGroup: Boolean = false): DataFrame = {
    val best = if (inputIsBestPerGroup) grouped else bestPerGroup(grouped)
    val ring = array(
      struct(col("x1").as("x"), col("y1").as("y")),
      struct(col("x2").as("x"), col("y1").as("y")),
      struct(col("x2").as("x"), col("y2").as("y")),
      struct(col("x1").as("x"), col("y2").as("y")),
      struct(col("x1").as("x"), col("y1").as("y")))
    best
      .join(broadcast(poses), "file_name")
      .select(col("file_name"), col("group_idx"), col("score"),
        col("roll"), col("pitch"), col("heading"),
        col("ox"), col("oy"), col("oz"),
        posexplode(ring).as(Seq("v_idx", "v")))
      .filter(col("v_idx") % spacing === 0)
      .withColumn("ray", rayUdf(
        col("v.x"), col("v.y"), col("roll"), col("pitch"), col("heading"),
        col("ox"), col("oy"), col("oz"), lit(imageWidth), lit(imageHeight)))
      .select(col("file_name"), col("group_idx"), col("score"), col("v_idx"),
        col("ray._1").as("rx"), col("ray._2").as("ry"), col("ray._3").as("rz"),
        // Carry the camera origin: the ray–mesh consumer needs (origin,
        // endpoint) pairs, and re-deriving the origin would mean joining
        // the pose table a second time downstream.
        col("ox"), col("oy"), col("oz"))
  }
}
