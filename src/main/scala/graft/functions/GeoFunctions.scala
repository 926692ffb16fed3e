package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression forms of the geometry kernels (SURVEY.md §2 M11/U1).
  *
  * The seam-aware cylindrical IoU is pure arithmetic + conditionals
  * (heritage-guard/heritage_guard/entities/bbox.py:16-109), so it is
  * expressed here entirely with built-in `Column` functions — whole-stage
  * codegen applies, no UDF boxing on the hot O(n²)-per-panorama join path.
  * [[graft.geo.BBox]] is the same math as plain Scala for `flatMapGroups`
  * kernels; GeoFunctionsSpec cross-checks the two, and the golden suite
  * pins both to the reference's executed code.
  *
  * [[GeoSql]] spells the identical formula in DuckDB SQL so declared
  * queries using these columns keep a first-class oracle.
  */
object GeoFunctions {

  /** Python-style modulo as a Column (pmod built-in matches: sign of divisor). */
  private def pymod(a: Column, m: Column): Column = pmod(a, m)

  private def overlap(min1: Column, max1: Column, min2: Column, max2: Column): Column =
    greatest(lit(0.0), least(max1, max2) - greatest(min1, min2))

  /** Per-detection invariants of the IoU — the seam swap, normalized θ
    * range, and area depend on ONE box only, so on an O(n²) pair join
    * they are computed here map-side (n evaluations) instead of inside
    * the join condition (n² evaluations). Returns
    * (θmin_norm, θmax_norm, area) as columns.
    */
  def boxInvariants(x1: Column, y1: Column, x2: Column, y2: Column,
      w: Column): (Column, Column, Column) = {
    val swap = (x2 - x1) > w * 0.95
    val xMin = when(swap, x2).otherwise(x1)
    val xMax = when(swap, x1).otherwise(x2)
    val tMin = pymod(xMin / w * 360.0, lit(360.0))
    val tMax = pymod(xMax / w * 360.0, lit(360.0))
    val width = pymod(xMax - xMin, w)
    val area = width * (y2 - y1)
    (tMin, tMax, area)
  }

  /** Pair IoU from precomputed invariants (the join-side remainder). */
  def iouFromInvariants(
      atMin: Column, atMax: Column, aArea: Column, ay1: Column, ay2: Column,
      btMin: Column, btMax: Column, bArea: Column, by1: Column, by2: Column): Column = {
    val crosses1 = atMax < atMin
    val crosses2 = btMax < btMin
    val ax1adj = when(crosses1, atMax + 360.0).otherwise(atMax)
    val ax2adj = when(crosses2, btMax + 360.0).otherwise(btMax)
    val thetaOv = when(!crosses1 && !crosses2, overlap(atMin, atMax, btMin, btMax))
      .otherwise(least(overlap(atMin, ax1adj, btMin, ax2adj), lit(360.0)))
    val yOv = overlap(ay1, ay2, by1, by2)
    val inter = thetaOv * yOv
    val union = aArea + bArea - inter
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  /** Seam-aware cylindrical IoU of two raw `[x1, y1, x2, y2]` boxes on a
    * W×H equirectangular image. Inputs are the RAW detection coords; the
    * >95%-span seam swap (bbox.py:16-20) is applied inside. Prefer
    * [[boxInvariants]] + [[iouFromInvariants]] on pair joins.
    */
  def cylindricalIou(
      ax1: Column, ay1: Column, ax2: Column, ay2: Column,
      bx1: Column, by1: Column, bx2: Column, by2: Column,
      w: Column, h: Column): Column = {
    val (atMin, atMax, aArea) = boxInvariants(ax1, ay1, ax2, ay2, w)
    val (btMin, btMax, bArea) = boxInvariants(bx1, by1, bx2, by2, w)
    iouFromInvariants(atMin, atMax, aArea, ay1, ay2, btMin, btMax, bArea, by1, by2)
  }
}

/** DuckDB spelling of the same formula, for oracle SQL. Emits a scalar
  * expression over column-name prefixes: `a` and `b` must expose
  * `{p}x1,{p}y1,{p}x2,{p}y2`, with image dims as literals.
  */
object GeoSql {

  /** SELECT-list fragment computing the [[GeoFunctions.boxInvariants]]
    * columns (t_min, t_max, area) from raw x1/y1/x2/y2 — the staged
    * oracle mirror for pair joins.
    */
  def boxInvariantsSelect(w: Double): String = {
    def pm(e: String, m: String) =
      s"(CASE WHEN (($e) % $m) < 0 THEN (($e) % $m) + $m ELSE (($e) % $m) END)"
    val xMin = s"(CASE WHEN (x2 - x1) > $w*0.95 THEN x2 ELSE x1 END)"
    val xMax = s"(CASE WHEN (x2 - x1) > $w*0.95 THEN x1 ELSE x2 END)"
    s"""${pm(s"$xMin / $w * 360.0", "360.0")} AS t_min,
        ${pm(s"$xMax / $w * 360.0", "360.0")} AS t_max,
        (${pm(s"$xMax - $xMin", s"$w")} * (y2 - y1)) AS area"""
  }

  /** Pair-side mirror of [[GeoFunctions.iouFromInvariants]]; `a`/`b` must
    * expose t_min, t_max, area, y1, y2.
    */
  def iouFromInvariantsExpr(a: String, b: String): String = {
    def ov(p: String, q: String, r: String, s: String) =
      s"greatest(0.0, least($q, $s) - greatest($p, $r))"
    val cross1 = s"($a.t_max < $a.t_min)"
    val cross2 = s"($b.t_max < $b.t_min)"
    val adj1 = s"(CASE WHEN $cross1 THEN $a.t_max + 360.0 ELSE $a.t_max END)"
    val adj2 = s"(CASE WHEN $cross2 THEN $b.t_max + 360.0 ELSE $b.t_max END)"
    val thetaOv =
      s"""(CASE WHEN NOT $cross1 AND NOT $cross2
               THEN ${ov(s"$a.t_min", s"$a.t_max", s"$b.t_min", s"$b.t_max")}
               ELSE least(${ov(s"$a.t_min", adj1, s"$b.t_min", adj2)}, 360.0) END)"""
    val yOv = s"greatest(0.0, least($a.y2, $b.y2) - greatest($a.y1, $b.y1))"
    val inter = s"($thetaOv * $yOv)"
    val union = s"($a.area + $b.area - $inter)"
    s"(CASE WHEN $union = 0.0 THEN 0.0 ELSE $inter / $union END)"
  }
  def cylindricalIouExpr(a: String, b: String, w: Double): String = {
    // Operation-for-operation mirror of GeoFunctions.cylindricalIou so
    // double-precision results are bitwise identical (the driver compares
    // floats exactly). pmod(x, m) for m > 0 ≡ ((x % m) + m) % m.
    def xMin(p: String) =
      s"""(CASE WHEN ($p.x2 - $p.x1) > $w*0.95 THEN $p.x2 ELSE $p.x1 END)"""
    def xMax(p: String) =
      s"""(CASE WHEN ($p.x2 - $p.x1) > $w*0.95 THEN $p.x1 ELSE $p.x2 END)"""
    def t(e: String) = s"(($e) / $w * 360.0)"
    // Exact float mirror of Spark's pmod: negative remainder gets +m (an
    // exact op since the result lands in [0, m)); positive is untouched —
    // unlike ((x%m)+m)%m whose positive branch drifts by an ulp.
    def pm(e: String, m: String) =
      s"(CASE WHEN (($e) % $m) < 0 THEN (($e) % $m) + $m ELSE (($e) % $m) END)"
    val (aMin, aMax) = (t(xMin(a)), t(xMax(a)))
    val (bMin, bMax) = (t(xMin(b)), t(xMax(b)))
    val (n1, x1) = (pm(aMin, "360.0"), pm(aMax, "360.0"))
    val (n2, x2) = (pm(bMin, "360.0"), pm(bMax, "360.0"))
    val aArea = s"(${pm(s"${xMax(a)} - ${xMin(a)}", s"$w")} * ($a.y2 - $a.y1))"
    val bArea = s"(${pm(s"${xMax(b)} - ${xMin(b)}", s"$w")} * ($b.y2 - $b.y1))"
    def ov(p: String, q: String, r: String, s: String) =
      s"greatest(0.0, least($q, $s) - greatest($p, $r))"
    val cross1 = s"($x1 < $n1)"
    val cross2 = s"($x2 < $n2)"
    val adj1 = s"(CASE WHEN $cross1 THEN $x1 + 360.0 ELSE $x1 END)"
    val adj2 = s"(CASE WHEN $cross2 THEN $x2 + 360.0 ELSE $x2 END)"
    val thetaOv =
      s"""(CASE WHEN NOT $cross1 AND NOT $cross2 THEN ${ov(n1, x1, n2, x2)}
              ELSE least(${ov(n1, adj1, n2, adj2)}, 360.0) END)"""
    val yOv = s"greatest(0.0, least($a.y2, $b.y2) - greatest($a.y1, $b.y1))"
    val inter = s"($thetaOv * $yOv)"
    val union = s"($aArea + $bArea - $inter)"
    s"(CASE WHEN $union = 0.0 THEN 0.0 ELSE $inter / $union END)"
  }
}
