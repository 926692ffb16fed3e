package graft.functions

/** DuckDB spelling of [[graft.geo.Projection.pointTo3dLine]] — the
  * pixel→3D-ray chain (SURVEY.md §2 M1-M4/U2;
  * heritage-guard/heritage_guard/assets/street_level_grouping/street_level_grouping.py:257-299)
  * as generated oracle SQL.
  *
  * Every arithmetic op mirrors the Scala op-for-op (same literals, same
  * association), so the ONLY divergence source is libm sin/cos (≈1-2 ulp
  * on this container, measured). Consumers must round ray outputs; the
  * raw columns are bit-stable enough for round(·, 6).
  *
  * The rotation matrices are composed SYMBOLICALLY with the exact
  * multiply-add order of [[graft.geo.Mat3.mul]] — including the ×0 and ×1
  * terms — so signed-zero and rounding behavior match the JVM exactly.
  */
object ProjectionSql {

  /** r[i][j] = a[i][0]*b[0][j] + a[i][1]*b[1][j] + a[i][2]*b[2][j],
    * left-associated like Mat3.mul.
    */
  private def mul(a: IndexedSeq[String], b: IndexedSeq[String]): IndexedSeq[String] =
    (for (i <- 0 until 3; j <- 0 until 3) yield
      s"((${a(i * 3)})*(${b(j)}) + (${a(i * 3 + 1)})*(${b(j + 3)}) + (${a(i * 3 + 2)})*(${b(j + 6)}))")
      .toIndexedSeq

  /** Two chained CTE select bodies that, given a relation exposing
    * (vx, vy, roll, pitch, heading, ox, oy, oz), append columns
    * rx/ry/rz = the 3D ray endpoint with the reference pose fixups
    * (roll negated, heading+90, deg→rad) applied — exactly
    * [[graft.pipeline.StreetLevel]]'s rayUdf.
    *
    * Usage: `..., trig AS (${trigCte("src")}), rays AS (${rayCte("trig")})`.
    */
  def trigCte(from: String): String =
    s"""SELECT *,
        cos((-(roll)) / 180.0 * pi()) AS cr, sin((-(roll)) / 180.0 * pi()) AS sr,
        cos((pitch) / 180.0 * pi()) AS cp, sin((pitch) / 180.0 * pi()) AS sp,
        cos(((heading) + 90.0) / 180.0 * pi()) AS ch,
        sin(((heading) + 90.0) / 180.0 * pi()) AS sh,
        sin(pi() * (vy) / 4000.0) AS sphi, cos(pi() * (vy) / 4000.0) AS cphi,
        sin(2.0 * pi() * (8000.0 - (vx)) / 8000.0) AS sth,
        cos(2.0 * pi() * (8000.0 - (vx)) / 8000.0) AS cth
        FROM $from"""

  def rayCte(from: String): String = {
    // Matrix literals exactly as Projection.pointTo3dLine builds them.
    val rxM = IndexedSeq("1.0", "0.0", "0.0", "0.0", "cr", "-(sr)", "0.0", "sr", "cr")
    val ryM = IndexedSeq("cp", "0.0", "sp", "0.0", "1.0", "0.0", "-(sp)", "0.0", "cp")
    val rzM = IndexedSeq("ch", "sh", "0.0", "-(sh)", "ch", "0.0", "0.0", "0.0", "1.0")
    val m = mul(rzM, mul(ryM, rxM))
    val xc = "((sphi)*(cth))"; val yc = "((sphi)*(sth))"; val zc = "(cphi)"
    def rot(r: Int) =
      s"((${m(r * 3)})*($xc) + (${m(r * 3 + 1)})*($yc) + (${m(r * 3 + 2)})*($zc))"
    s"""SELECT *,
        (${rot(0)}) + (ox) AS rx,
        (${rot(1)}) + (oy) AS ry,
        (${rot(2)}) + (oz) AS rz
        FROM $from"""
  }
}
