package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{GeoFunctions, GeoSql}
import graft.pipeline.{Detection, RayMesh, StreetLevel, Synthetic, WallPlanes}

/** Domain-parity suite (SURVEY.md §7 phase 3): the reference's street-level
  * pipeline operators run against detections derived deterministically from
  * the harness tables. SQL-expressible stages carry full DuckDB oracles;
  * the order-dependent greedy grouping, the trig-heavy ray cast, and DBSCAN
  * are rows-only here (libm ulp drift would poison a float hash) and are
  * instead pinned by the golden specs, which execute the reference's own
  * Python against the Scala port.
  */
object Domain {

  /** The grouped-detections intermediate is shared by q80/q82/q86 (the
    * per-panorama greedy kernel is the expensive stage). Cache it once
    * per (session, sfDir) — the materialized-intermediate pattern any
    * real pipeline uses for a reused stage; Spark's lazy persist means
    * the first consumer pays, the rest read columnar cache.
    */
  private def grouped(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.pipeline.SessionCache.getOrPersist(spark, s"grouped:$dir") {
      import spark.implicits._
      val det = Synthetic.detectionsCached(spark, dir)
        .withColumnRenamed("class", "cls").as[Detection]
      StreetLevel.groupedDetections(det, 0.01).toDF()
    }

  val all: Seq[QueryDef] = Seq(

    // ── The synthetic detection derivation itself, fully oracled — if
    // this drifts, every downstream domain query is suspect.
    QueryDef(
      "q85_synthetic_detections",
      Some(s"""
        SELECT file_name, det_idx, x1, y1, x2, y2, score, class
        FROM (${Synthetic.detectionsSql})
        ORDER BY file_name, det_idx"""))((spark, dir) =>
      Synthetic.detectionsCached(spark, dir).orderBy(col("file_name"), col("det_idx"))),

    // ── U1 as a codegen'd column expression on the J4 self-join shape:
    // all pairs within a panorama with seam-aware cylindrical IoU over
    // the pair threshold. The join key (file_name) bounds the O(n²) to
    // one panorama — the 100 TB plan shuffles by file_name once and
    // never crosses panoramas.
    QueryDef(
      "q81_iou_pairs",
      Some(s"""
        WITH det AS (${Synthetic.detectionsSql}),
        inv AS (
          SELECT file_name, det_idx, y1, y2, ${GeoSql.boxInvariantsSelect(8000.0)}
          FROM det)
        SELECT a.file_name AS file_name, a.det_idx AS a_idx, b.det_idx AS b_idx,
               round(${GeoSql.iouFromInvariantsExpr("a", "b")}, 9) AS iou
        FROM inv a JOIN inv b
          ON a.file_name = b.file_name AND a.det_idx < b.det_idx
        WHERE ${GeoSql.iouFromInvariantsExpr("a", "b")} >= 0.02
        ORDER BY file_name, a_idx, b_idx"""))( (spark, dir) => {
      // Native codegen kernel (one static call) rather than the expanded
      // Column tree: Catalyst pushes the >= 0.02 filter into the join
      // condition AND re-derives the round() projection, duplicating the
      // expression; the expanded tree blew whole-stage codegen past the
      // JVM method limit and fell back to interpreted eval (11 s → 193 s
      // at sf0.1 under honest materialization). The kernel computes the
      // invariants per pair — ~40 extra flops against a 17× win. At
      // 100 TB the join still shuffles on file_name once.
      val det = Synthetic.detectionsCached(spark, dir)
      // y-band bucketing refines the join key from file_name to
      // (file_name, band): each box explodes to the ≤2 512-px bands its
      // y-span covers, and a pair is kept only in the CANONICAL band —
      // the one containing max(ay1, by1), which any y-overlapping pair
      // provably co-covers (overlap start lies inside both y-spans), so
      // each qualifying pair survives exactly once. Σ n_band² per
      // panorama is ~3× smaller than n² — the pair-enumeration loop, not
      // the kernel, dominates this join.
      // Band height: 512 px is the measured knee. Boxes average ~244 px
      // tall (max 369), so halving to 256 raises replication 1.47→1.95
      // bands/box and GROWS enumerated pairs (44.6M → 47.7M at sf0.1;
      // 128 px → 57.8M). Finer bands only pay when bands stay ≳2× the
      // typical box height.
      val bandOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        y => floor(y / 512.0).cast("long")
      val a = det.select(col("file_name"), col("det_idx").as("a_idx"),
          col("x1").as("ax1"), col("y1").as("ay1"), col("x2").as("ax2"), col("y2").as("ay2"))
        .withColumn("band", explode(sequence(bandOf(col("ay1")), bandOf(col("ay2")))))
      val b = det.select(col("file_name").as("fn_b"), col("det_idx").as("b_idx"),
          col("x1").as("bx1"), col("y1").as("by1"), col("x2").as("bx2"), col("y2").as("by2"))
        .withColumn("band_b", explode(sequence(bandOf(col("by1")), bandOf(col("by2")))))
      val iou = org.apache.spark.sql.graft.CylindricalIou.column(
        col("ax1"), col("ay1"), col("ax2"), col("ay2"),
        col("bx1"), col("by1"), col("bx2"), col("by2"), lit(8000.0), lit(4000.0))
      // Exact pre-filters ahead of the kernel — answer-preserving, so
      // the oracle is untouched:
      // (1) IoU ≥ t > 0 requires y-overlap > 0: a_y1 < b_y2 ∧ b_y1 < a_y2
      //     (boxes have positive height).
      // (2) θ-interval precondition for PLAIN pairs: when neither box
      //     wraps the seam (x1 ≤ x2, span ≤ 0.95·W — the kernel's swap
      //     rule, mirrored bitwise via the same 0.95·W product), both
      //     arcs live inside [0, W) and circle intersection reduces to
      //     linear interval intersection; the x→θ map is monotone, so
      //     ax1 ≥ bx2 ⟹ θ-overlap = 0. Wrapped/giant boxes (a few %)
      //     skip the precondition and go straight to the kernel.
      val seamSpan = lit(8000.0 * 0.95)
      val plainA = col("ax2") >= col("ax1") && (col("ax2") - col("ax1")) <= seamSpan
      val plainB = col("bx2") >= col("bx1") && (col("bx2") - col("bx1")) <= seamSpan
      a.join(b, col("file_name") === col("fn_b") && col("band") === col("band_b")
          && col("band") === bandOf(greatest(col("ay1"), col("by1")))
          && col("a_idx") < col("b_idx")
          && col("ay1") < col("by2") && col("by1") < col("ay2")
          && (!plainA || !plainB || (col("ax1") < col("bx2") && col("bx1") < col("ax2"))))
        .withColumn("iou_raw", iou)
        .filter(col("iou_raw") >= 0.02)
        .select(col("file_name"), col("a_idx"), col("b_idx"),
          round(col("iou_raw"), 9).as("iou"))
        .orderBy(col("file_name"), col("a_idx"), col("b_idx"))
    }),

    // ── A5/U6: the order-dependent greedy grouping inside flatMapGroups.
    // Not SQL-expressible (rows-only check); semantics pinned by
    // BBoxSpec's golden fixtures. group_size histogram keeps the output
    // small and order-insensitive while still covering the kernel.
    QueryDef("q80_grouped_detections", None)( (spark, dir) =>
      grouped(spark, dir)
        .groupBy(col("file_name"), col("group_idx"))
        .agg(count(lit(1)).as("group_size"), max(col("score")).as("best_score"))
        .groupBy(col("group_size")).agg(count(lit(1)).as("n_groups"))
        .orderBy(col("group_size"))),

    // ── A4+J1+M10+U2: best-per-group → broadcast pose join → stride
    // subsample → pixel-to-3D ray. Rows-only (libm trig drift).
    QueryDef("q82_best_rays", None)( (spark, dir) =>
      StreetLevel.vertexRays(grouped(spark, dir), Synthetic.poses(spark, dir), spacing = 2)
        .select(col("file_name"), col("group_idx"), col("v_idx"),
          round(col("rx"), 6).as("rx"), round(col("ry"), 6).as("ry"),
          round(col("rz"), 6).as("rz"))
        .orderBy(col("file_name"), col("group_idx"), col("v_idx"))),

    // ── F6/M17/M18/A7/A8/A11: wall planes — vertical filter, azimuth,
    // weighting, z-norm, DBSCAN, per-cluster aggregates. Rows-only
    // (DBSCAN); kernel pinned by DbscanSpec; the prologue is oracled by
    // q93. tiles=8 runs the margin-merge tiled path (multi-task DBSCAN —
    // the 100 TB shape), label-identical to the global fit per
    // WallPlanesTilingSpec.
    QueryDef("q83_wall_planes", None)( (spark, dir) =>
      WallPlanes.wallPlanes(Synthetic.meshCells(spark, dir), tiles = 8)
        .select(col("cluster"), col("n"),
          round(col("avg_nx"), 6).as("avg_nx"), round(col("avg_ny"), 6).as("avg_ny"),
          round(col("avg_cx"), 6).as("avg_cx"), round(col("avg_cy"), 6).as("avg_cy"),
          round(col("min_x"), 6).as("min_x"), round(col("max_x"), 6).as("max_x"))),

    // ── M21/U7: ray–mesh first hit over a broadcast BVH. The full
    // street-level chain: detections → grouping → best-per-group →
    // pose join → rays → intersect with the synthetic building mesh.
    // Rows-only (BVH + trig); TriMeshSpec pins the kernel against
    // brute-force all-triangle intersection.
    QueryDef("q86_mesh_intersect", None, releases = Seq("grouped"))( (spark, dir) => {
      // vertexRays carries ox/oy/oz through, so no second pose join here.
      val rays = StreetLevel.vertexRays(grouped(spark, dir), Synthetic.poses(spark, dir), spacing = 2)
      RayMesh.firstHits(rays, RayMesh.syntheticBuilding())
        .groupBy(col("file_name"))
        .agg(count(lit(1)).as("n_rays"),
          count(col("hit_x")).as("n_hits"),
          round(avg(col("hit_z")), 6).as("avg_hit_z"))
        .orderBy(col("file_name"))
    }),

    // ── P3/U5: GeoJSON-style ring → WKT. Integer-snapped coords so the
    // oracle can build the identical string with SQL concat.
    QueryDef(
      "q84_wkt_polygons",
      Some(s"""
        WITH det AS (${Synthetic.detectionsSql}),
        snapped AS (
          SELECT det_idx, floor(x1)::BIGINT AS ix1, floor(y1)::BIGINT AS iy1,
                 floor(x2)::BIGINT AS ix2, floor(y2)::BIGINT AS iy2
          FROM det WHERE score >= 0.05)
        SELECT det_idx,
               CASE WHEN ix2 <= ix1 THEN 'POLYGON EMPTY'
                    ELSE 'POLYGON ((' || ix1 || ' ' || iy1 || ', ' || ix2 || ' ' || iy1 || ', ' ||
                         ix2 || ' ' || iy2 || ', ' || ix1 || ' ' || iy2 || ', ' ||
                         ix1 || ' ' || iy1 || '))' END AS wkt
        FROM snapped ORDER BY det_idx, wkt"""))( (spark, dir) => {
      val wktUdf = udf { (x1: Long, y1: Long, x2: Long, y2: Long) =>
        if (x2 <= x1) graft.geo.Wkt.empty
        else graft.geo.Wkt.polygon(Seq(
          (x1.toDouble, y1.toDouble), (x2.toDouble, y1.toDouble),
          (x2.toDouble, y2.toDouble), (x1.toDouble, y2.toDouble)))
      }
      Synthetic.detectionsCached(spark, dir)
        .filter(col("score") >= 0.05)
        .select(col("det_idx"),
          floor(col("x1")).as("ix1"), floor(col("y1")).as("iy1"),
          floor(col("x2")).as("ix2"), floor(col("y2")).as("iy2"))
        .select(col("det_idx"), wktUdf(col("ix1"), col("iy1"), col("ix2"), col("iy2")).as("wkt"))
        .orderBy(col("det_idx"), col("wkt"))
    })
  )
}
