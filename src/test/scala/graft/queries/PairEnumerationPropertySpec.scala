package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property guard for q81's pair-enumeration refinements (y-band
  * bucketing with canonical-band dedupe, exact y-overlap prune, plain-
  * pair θ-interval precondition): on ADVERSARIAL boxes — exact band
  * boundaries, zero-width touching intervals, seam wraps (x2 < x1),
  * >95%-span giants, boxes spanning multiple bands — the refined join
  * must return exactly the pair set of the naive all-pairs formulation.
  * The real-data oracle can't probe these edges densely; this generator
  * does.
  */
class PairEnumerationPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val W = 8000.0
  private val H = 4000.0

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic adversarial boxes: mixes exact 512-multiples (band
    * boundaries), touching y-intervals, wrapped boxes, giants, and
    * pseudo-random fill, across 4 panoramas.
    */
  private def boxes: Seq[(String, Long, Double, Double, Double, Double)] = {
    def pr(i: Int, m: Int) = ((i * 2654435761L) % m + m) % m
    (0 until 240).map { i =>
      val pano = s"p${i % 4}"
      val kind = i % 6
      val (x1, x2) = kind match {
        case 0 => (pr(i, 7000).toDouble, pr(i, 7000) + 200.0)             // plain
        case 1 => (7800.0 + pr(i, 150), pr(i + 1, 300).toDouble)          // wrapped: x2 < x1
        case 2 => (pr(i, 100).toDouble, pr(i, 100) + 7700.0)              // giant: span > 0.95W
        case 3 => (pr(i, 7000).toDouble, pr(i, 7000) + 7600.0)            // exactly at the swap boundary span
        case _ => (pr(i * 3 + 1, 7500).toDouble, (pr(i * 3 + 1, 7500) + 100 + pr(i, 400)).toDouble)
      }
      val y1 = kind match {
        case 4 => (pr(i, 7) * 512).toDouble          // exact band boundary
        case 5 => pr(i - 1, 3400).toDouble           // shares y1 with a neighbor sometimes
        case _ => pr(i * 7 + 3, 3400).toDouble
      }
      val y2 = y1 + (if (kind == 4) 512.0 else 50.0 + pr(i, 550))  // may span 2+ bands
      (pano, i.toLong, x1, y1, math.min(x2, W - 0.001), y2)
    }
  }

  private def df: DataFrame = {
    val s = spark; import s.implicits._
    boxes.toDF("file_name", "det_idx", "x1", "y1", "x2", "y2")
  }

  private def iouCol = org.apache.spark.sql.graft.CylindricalIou.column(
    col("ax1"), col("ay1"), col("ax2"), col("ay2"),
    col("bx1"), col("by1"), col("bx2"), col("by2"), lit(W), lit(H))

  private def sides(d: DataFrame): (DataFrame, DataFrame) = (
    d.select(col("file_name"), col("det_idx").as("a_idx"), col("x1").as("ax1"),
      col("y1").as("ay1"), col("x2").as("ax2"), col("y2").as("ay2")),
    d.select(col("file_name").as("fn_b"), col("det_idx").as("b_idx"), col("x1").as("bx1"),
      col("y1").as("by1"), col("x2").as("bx2"), col("y2").as("by2")))

  /** Naive spec: all within-panorama pairs, kernel on every one. */
  private def naivePairs(threshold: Double): Set[(Long, Long)] = {
    val (a, b) = sides(df)
    a.join(b, col("file_name") === col("fn_b") && col("a_idx") < col("b_idx"))
      .withColumn("iou", iouCol).filter(col("iou") >= threshold)
      .select("a_idx", "b_idx").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** The refined enumeration, mirroring q81/DomainOracles exactly. */
  private def refinedPairs(threshold: Double): Set[(Long, Long)] = {
    val bandOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      y => floor(y / 512.0).cast("long")
    val (a0, b0) = sides(df)
    val a = a0.withColumn("band", explode(sequence(bandOf(col("ay1")), bandOf(col("ay2")))))
    val b = b0.withColumn("band_b", explode(sequence(bandOf(col("by1")), bandOf(col("by2")))))
    val seamSpan = lit(W * 0.95)
    val plainA = col("ax2") >= col("ax1") && (col("ax2") - col("ax1")) <= seamSpan
    val plainB = col("bx2") >= col("bx1") && (col("bx2") - col("bx1")) <= seamSpan
    a.join(b, col("file_name") === col("fn_b") && col("band") === col("band_b")
        && col("band") === bandOf(greatest(col("ay1"), col("by1")))
        && col("a_idx") < col("b_idx")
        && col("ay1") < col("by2") && col("by1") < col("ay2")
        && (!plainA || !plainB || (col("ax1") < col("bx2") && col("bx1") < col("ax2"))))
      .withColumn("iou", iouCol).filter(col("iou") >= threshold)
      .select("a_idx", "b_idx").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** The round-4 sweep-line kernel (the declared q81 form). */
  private def sweepPairs(threshold: Double): Set[(Long, Long)] =
    Domain.sweepIouPairs(df, W, H, threshold)
      .select("a_idx", "b_idx").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("sweep-line kernel ≡ naive all-pairs on adversarial boxes (t = 0.02)") {
    val n = naivePairs(0.02); val s = sweepPairs(0.02)
    info(s"naive=${n.size} sweep=${s.size}")
    assert(n == s, s"missing: ${n -- s}; spurious: ${s -- n}")
  }

  test("sweep-line kernel ≡ naive all-pairs at the iou > 0 slice threshold") {
    // Double.MinPositiveValue makes `iou >= t` exactly `iou > 0` — the
    // isolated-slice rule; any pruned positive-IoU pair would corrupt
    // the slice feeding q88/q89/q94. The oracle uses the SAME boundary
    // (not some epsilon like 1e-12), so a kernel missing a
    // positive-but-tiny-IoU pair cannot slip through.
    val n = naivePairs(java.lang.Double.MIN_VALUE)
    val s = sweepPairs(java.lang.Double.MIN_VALUE)
    assert(n == s, s"missing: ${n -- s}; spurious: ${s -- n}")
  }

  test("marking kernel ≡ endpoints of the naive iou > 0 pair set") {
    // sweepPartneredIds must equal exploding the strictly-positive pair
    // relation to both endpoints — the isolated-slice feed for
    // q88/q89/q94. Adversarial boxes probe the mark short-circuit
    // (marked(i) && marked(j) skips the kernel) and every seam class.
    val want = naivePairs(java.lang.Double.MIN_VALUE).flatMap(p => Seq(p._1, p._2))
    val got = Domain.sweepPartneredIds(df, W, H)
      .select("det_idx").collect().map(_.getLong(0)).toSet
    assert(got == want, s"missing: ${want -- got}; spurious: ${got -- want}")
  }

  test("refined enumeration ≡ naive all-pairs on adversarial boxes (t = 0.02)") {
    val naive = refinedVsNaive(0.02)
    assert(naive._1 == naive._2, s"missing: ${naive._1 -- naive._2}; spurious: ${naive._2 -- naive._1}")
  }

  test("refined enumeration ≡ naive all-pairs at the iou > 0 slice threshold") {
    // DomainOracles.isolated uses strictly-positive IoU — the tightest
    // setting for the preconditions (any pruned positive-IoU pair would
    // corrupt the isolated slice).
    val naive = refinedVsNaive(java.lang.Double.MIN_VALUE)
    assert(naive._1 == naive._2, s"missing: ${naive._1 -- naive._2}; spurious: ${naive._2 -- naive._1}")
  }

  private def refinedVsNaive(t: Double): (Set[(Long, Long)], Set[(Long, Long)]) = {
    val n = naivePairs(t); val r = refinedPairs(t)
    info(s"t=$t: naive=${n.size} refined=${r.size}")
    (n, r)
  }

  test("the generator actually covers the edge classes") {
    val all = boxes
    assert(all.exists { case (_, _, x1, _, x2, _) => x2 < x1 }, "wrapped boxes present")
    assert(all.exists { case (_, _, x1, _, x2, _) => x2 - x1 > W * 0.95 }, "giants present")
    assert(all.exists { case (_, _, _, y1, _, _) => y1 % 512.0 == 0.0 }, "band-boundary y present")
    assert(all.exists { case (_, _, _, y1, _, y2) => y2 - y1 > 512.0 }, "multi-band spans present")
  }
}
