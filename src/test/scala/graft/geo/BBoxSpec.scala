package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import Golden._

/** Cylindrical-IoU + greedy-grouping port vs the reference's own executed
  * code (golden fixtures) plus seeded randomized invariants
  * (SURVEY.md §5.2-5.3).
  */
class BBoxSpec extends AnyFunSuite {

  private def mk(n: com.fasterxml.jackson.databind.JsonNode, field: String, W: Double, H: Double) = {
    val b = n.darr(field)
    BBox((b(0), b(1), b(2), b(3)), 0.0, 0, W, H)
  }

  test("IoU and derived properties match the reference on 120 golden cases") {
    Golden.load("iou_cases").foreach { c =>
      val (w, h) = (c.d("W"), c.d("H"))
      val a = mk(c, "a", w, h)
      val b = mk(c, "b", w, h)
      assert(math.abs(a.iou(b) - c.d("iou")) <= 1e-12, s"iou for $c")
      val p = c.get("a_props")
      assert(math.abs(a.width - p.d("width")) <= 1e-9)
      assert(math.abs(a.height - p.d("height")) <= 1e-9)
      assert(math.abs(a.area - p.d("area")) <= 1e-6)
      assert(math.abs(a.thetaMin - p.d("theta_min")) <= 1e-9)
      assert(math.abs(a.thetaMax - p.d("theta_max")) <= 1e-9)
      assert(a.xMin == p.d("x_min") && a.xMax == p.d("x_max"), "seam swap")
      val ctr = p.darr("center")
      assert(math.abs(a.center._1 - ctr(0)) <= 1e-9 && math.abs(a.center._2 - ctr(1)) <= 1e-9)
    }
  }

  test("greedy grouping reproduces the reference's order-dependent groups") {
    Golden.load("group_cases").foreach { c =>
      val (w, h) = (c.d("W"), c.d("H"))
      val boxes = c.arr("boxes").map { b =>
        val v = b.elements(); val x1 = v.next().asDouble(); val y1 = v.next().asDouble()
        val x2 = v.next().asDouble(); val y2 = v.next().asDouble()
        BBox((x1, y1, x2, y2), 0.0, 0, w, h)
      }
      val got = BBoxGrouping.group(boxes, c.d("threshold"))
      val want = c.arr("groups").map(g => g.elements().asScala.map(_.asInt()).toVector)
      assert(got == want, s"groups for ${c.get("boxes")}")
    }
  }

  test("IoU invariant under reference-computed seam shifts") {
    Golden.load("shift_cases").foreach { c =>
      val (w, h) = (c.d("W"), c.d("H"))
      val shift = c.d("shift")
      val a = c.darr("a"); val b = c.darr("b")
      def shifted(v: Vector[Double]) =
        BBox((BBox.shiftSeam(v(0), shift, w), v(1), BBox.shiftSeam(v(2), shift, w), v(3)), 0.0, 0, w, h)
      val i0 = mk(c, "a", w, h).iou(mk(c, "b", w, h))
      val i1 = shifted(a).iou(shifted(b))
      assert(math.abs(i0 - c.d("iou_orig")) <= 1e-12)
      assert(math.abs(i1 - c.d("iou_shifted")) <= 1e-12)
    }
  }

  private def randBox(rng: scala.util.Random): BBox = {
    val x1 = rng.nextDouble() * 7999
    val x2 = rng.nextDouble() * 7999
    val y1 = rng.nextDouble() * 3500
    BBox((x1, y1, x2, y1 + 1 + rng.nextDouble() * 498), 0.0, 0, 8000, 4000)
  }

  test("property: IoU is symmetric and non-negative (500 seeded cases)") {
    val rng = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val a = randBox(rng); val b = randBox(rng)
      val ab = a.iou(b)
      assert(math.abs(ab - b.iou(a)) <= 1e-12)
      assert(ab >= 0.0)
    }
  }

  test("property: every box lands in exactly one group (200 seeded cases)") {
    val rng = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val boxes = IndexedSeq.fill(rng.nextInt(13))(randBox(rng))
      val groups = BBoxGrouping.group(boxes, 0.01)
      assert(groups.flatten.sorted == boxes.indices.toVector)
    }
  }

  /** The dense-matrix greedy loop the sweep-line sparse adjacency
    * replaced — kept here as the equality oracle for the property below.
    */
  private def groupDense(bboxes: IndexedSeq[BBox], iouThreshold: Double): Vector[Vector[Int]] = {
    val n = bboxes.length
    val sim = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i + 1 until n) {
      val v = bboxes(i).iou(bboxes(j)); sim(i)(j) = v; sim(j)(i) = v
    }
    val grouped = Array.fill(n)(false)
    val groups = Vector.newBuilder[Vector[Int]]
    for (i <- 0 until n)
      if (!(0 until n).exists(j => j != i && sim(i)(j) > 0)) {
        groups += Vector(i); grouped(i) = true
      }
    for (i <- 0 until n) if (!grouped(i)) {
      val current = scala.collection.mutable.ArrayBuffer(i)
      grouped(i) = true
      for (j <- 0 until n)
        if (!grouped(j) && current.exists(m => sim(m)(j) >= iouThreshold)) {
          current += j; grouped(j) = true
        }
      groups += current.toVector
    }
    groups.result()
  }

  test("property: sweep-line sparse grouping equals the dense matrix (400 seeded cases)") {
    val rng = new scala.util.Random(29)
    (0 until 400).foreach { k =>
      val n = rng.nextInt(16)
      val boxes = IndexedSeq.fill(n) {
        // Adversarial mix: seam-crossing spans, shared y1 values,
        // zero-height degenerates, and the regular randBox shape.
        rng.nextInt(4) match {
          case 0 => // seam-crossing (raw span > 95% of width triggers swap)
            val y1 = rng.nextInt(8) * 500.0
            BBox((10.0, y1, 7990.0, y1 + rng.nextDouble() * 400), 0.0, 0, 8000, 4000)
          case 1 => // zero-height degenerate on a shared y
            val y = rng.nextInt(4) * 1000.0
            val x1 = rng.nextDouble() * 7000
            BBox((x1, y, x1 + 100, y), 0.0, 0, 8000, 4000)
          case _ => randBox(rng)
        }
      }
      // Threshold 0.0 exercises the keepZeros dense fallback; positive
      // thresholds exercise the sparse sweep.
      Seq(0.0, 0.01, 0.3).foreach { t =>
        assert(BBoxGrouping.group(boxes, t) == groupDense(boxes, t), s"case $k threshold $t")
      }
    }
    // Denser panoramas (production shape is ~150 boxes): fewer cases,
    // bigger n, so chained absorptions cross many sweep neighborhoods.
    (0 until 8).foreach { k =>
      val boxes = IndexedSeq.fill(120 + rng.nextInt(60))(randBox(rng))
      Seq(0.01, 0.3).foreach { t =>
        assert(BBoxGrouping.group(boxes, t) == groupDense(boxes, t), s"dense case $k threshold $t")
      }
    }
  }

  test("python-style modulo matches the divisor-sign convention") {
    assert(BBox.pmod(-3, 8000) == 7997.0)
    assert(BBox.pmod(8003, 8000) == 3.0)
    assert(BBox.pmod(0, 8000) == 0.0)
  }
}
