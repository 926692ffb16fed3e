package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{BBox, BBoxGrouping, Mat3, Orientation, Projection}

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
    *
    * r19 (guide §2.3/§2.4): spelled as a min_by aggregate over the
    * ordering-key struct (−score, det_idx) instead of a row_number
    * window — same row selected (the window's first row under
    * score DESC, det_idx IS the struct minimum; det_idx is unique per
    * file so there are no ties), but the aggregate partial-reduces
    * map-side to one row per group per task and never sorts, where the
    * window shuffled and double-sorted every detection. The q82/q86 eps
    * oracles keep the declarative row_number spelling and race this
    * relation end-to-end every Verify run.
    */
  def bestPerGroup(grouped: DataFrame): DataFrame = {
    val others = grouped.columns.filterNot(c => c == "file_name" || c == "group_idx")
    grouped
      .groupBy(col("file_name"), col("group_idx"))
      .agg(min_by(struct(others.map(col): _*),
        struct((-col("score")).as("ns"), col("det_idx"))).as("best"))
      .select(col("file_name") +: col("group_idx") +:
        others.map(c => col(s"best.`$c`").as(c)): _*)
  }

  /** Pixel→3D-ray UDF over [[Projection.pointTo3dLine]] (SURVEY §2 U2).
    * Pose fixups (roll negated, heading+90, deg→rad) are applied inside,
    * mirroring best_lines_3d (street_level_grouping.py:184-189).
    * Retained as the REFERENCE implementation the split form below is
    * spec-pinned against (RayColumnsSpec, bit-exact).
    */
  private[pipeline] val rayUdf = udf {
    (x: Double, y: Double, roll: Double, pitch: Double, heading: Double,
     ox: Double, oy: Double, oz: Double, w: Double, h: Double) =>
      val o = Orientation(roll = -roll, pitch = pitch, heading = heading + 90).rads
      Projection.pointTo3dLine(x, y, o, (ox, oy, oz), w, h)
  }

  /** Per-POSE half of the ray math (r19 optimization, guide §2.3/§4):
    * [[rayUdf]] rebuilt the pose's rotation matrix — six trig calls, two
    * 3×3 matrix products, five array allocations — for EVERY exploded
    * vertex row, though it depends only on (roll, pitch, heading). This
    * computes the identical matrix (same fixups, same [[Mat3.mul]] code
    * path, same bits) ONCE per pose row on the broadcast side; the
    * per-vertex remainder is the codegen column math in [[rayColumns]].
    */
  private[pipeline] val rotMatUdf = udf {
    (roll: Double, pitch: Double, heading: Double) =>
      val o = Orientation(roll = -roll, pitch = pitch, heading = heading + 90).rads
      val cr = math.cos(o.roll); val sr = math.sin(o.roll)
      val cp = math.cos(o.pitch); val sp = math.sin(o.pitch)
      val ch = math.cos(o.heading); val sh = math.sin(o.heading)
      val rx: Mat3.M = Array(1, 0, 0, 0, cr, -sr, 0, sr, cr)
      val ry: Mat3.M = Array(cp, 0, sp, 0, 1, 0, -sp, 0, cp)
      val rz: Mat3.M = Array(ch, sh, 0, -sh, ch, 0, 0, 0, 1)
      Mat3.mul(rz, Mat3.mul(ry, rx)).toSeq
  }

  /** Per-VERTEX half: spherical conversion + matvec + origin translate as
    * pure codegen column expressions, operation-for-operation the double
    * arithmetic of [[Projection.pointTo3dLine]] (same literals, same
    * associativity, java.lang.Math trig = the scala.math the kernel
    * calls), over the per-pose matrix `rm`. RayColumnsSpec pins the
    * (rx, ry, rz) triple bit-exactly against [[rayUdf]] on corpus poses
    * and adversarial grids.
    */
  private[pipeline] def rayColumns(
      x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      rm: org.apache.spark.sql.Column,
      ox: org.apache.spark.sql.Column, oy: org.apache.spark.sql.Column,
      oz: org.apache.spark.sql.Column,
      imageWidth: Double, imageHeight: Double):
      (org.apache.spark.sql.Column, org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val theta = lit(2 * math.Pi) * (lit(imageWidth) - x) / lit(imageWidth)
    val phi = lit(math.Pi) * y / lit(imageHeight)
    val xc = sin(phi) * cos(theta)
    val yc = sin(phi) * sin(theta)
    val zc = cos(phi)
    def m(i: Int) = rm.getItem(i)
    (m(0) * xc + m(1) * yc + m(2) * zc + ox,
     m(3) * xc + m(4) * yc + m(5) * zc + oy,
     m(6) * xc + m(7) * yc + m(8) * zc + oz)
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
    // r20 (guide §1.2 order #1 — don't compute things twice): the
    // CLOSING ring vertex (v_idx 4) is the SAME point as v_idx 0, so
    // running it through the trig chain re-computed a third of every
    // surviving ray (spacing 2 keeps {0, 2, 4}: two distinct points,
    // three trig evaluations). The ring now carries the four DISTINCT
    // vertices; rays are computed once per distinct surviving vertex in
    // the projection UNDER the final Generate, and the closing row is
    // emitted by duplicating the v_idx-0 row's COMPUTED values with
    // v_idx = 4 — bit-identical by construction (same doubles, copied).
    // Emission matches the old filter exactly: v_idx 4 appears iff
    // 4 % spacing == 0, v_idx i < 4 iff i % spacing == 0. Row ORDER
    // within a partition changes (…0,4,2… vs …0,2,4…); every consumer
    // sorts or aggregates (q82/q89/q95 declare ORDER BY; q86/q94
    // aggregate; the specs join on keys), so output is unchanged.
    val ring = array(
      struct(lit(0).as("i"), col("x1").as("x"), col("y1").as("y")),
      struct(lit(1).as("i"), col("x2").as("x"), col("y1").as("y")),
      struct(lit(2).as("i"), col("x2").as("x"), col("y2").as("y")),
      struct(lit(3).as("i"), col("x1").as("x"), col("y2").as("y")))
    val vIdxOut =
      if (4 % spacing == 0)
        when(col("i") === 0, array(lit(0), lit(4))).otherwise(array(col("i")))
      else array(col("i"))
    // r19: the pose's rotation matrix rides the BROADCAST side, computed
    // once per pose row (rotMatUdf); the per-vertex remainder is codegen
    // column math (rayColumns) — bit-identical to the old per-vertex
    // rayUdf (RayColumnsSpec) at a fraction of its trig/allocation cost.
    val posesR = poses.withColumn("rm",
      rotMatUdf(col("roll"), col("pitch"), col("heading")))
    val (rx, ry, rz) = rayColumns(col("v.x"), col("v.y"), col("rm"),
      col("ox"), col("oy"), col("oz"), imageWidth, imageHeight)
    best
      .join(broadcast(posesR), "file_name")
      .select(col("file_name"), col("group_idx"), col("score"), col("rm"),
        col("ox"), col("oy"), col("oz"), explode(ring).as("v"))
      .filter(col("v.i") % spacing === 0)
      // Rays materialize HERE, once per distinct surviving vertex; the
      // select below only duplicates computed attributes.
      .select(col("file_name"), col("group_idx"), col("score"),
        col("v.i").as("i"),
        rx.as("rx"), ry.as("ry"), rz.as("rz"),
        // Carry the camera origin: the ray–mesh consumer needs (origin,
        // endpoint) pairs, and re-deriving the origin would mean joining
        // the pose table a second time downstream.
        col("ox"), col("oy"), col("oz"))
      .select(col("file_name"), col("group_idx"), col("score"),
        explode(vIdxOut).as("v_idx"),
        col("rx"), col("ry"), col("rz"), col("ox"), col("oy"), col("oz"))
  }
}
