package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** The r19 dense-adjacency fast path must be indistinguishable from the
  * sparse LongMap layout: both receive identical put calls and an un-put
  * dense slot reads the sparse default 0.0, so the order-dependent greedy
  * grouping must emit IDENTICAL groups in identical order. Raced here on
  * random corpora (seam-crossers, duplicates, degenerate y-spans) across
  * thresholds, including the keepZeros regime (threshold ≤ 0).
  */
class DenseVsSparseAdjacencySpec extends AnyFunSuite {

  private def randomBoxes(rnd: java.util.Random, n: Int): IndexedSeq[BBox] =
    (0 until n).map { _ =>
      val w = 8000.0; val h = 4000.0
      val x1 = rnd.nextDouble() * w
      val span = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 50          // tight box
        case 1 => rnd.nextDouble() * 1000        // wide box
        case 2 => w * (0.95 + rnd.nextDouble() * 0.05) // seam-crosser
        case _ => 0.0                            // degenerate
      }
      val y1 = rnd.nextDouble() * h
      val dy = (rnd.nextInt(3) - 1) * rnd.nextDouble() * 300 // incl. negative spans
      BBox((x1, y1, (x1 + span) % (w * 1.2), y1 + dy),
        rnd.nextDouble(), rnd.nextInt(5), w, h)
    }

  test("dense and sparse adjacency layouts emit identical greedy groups") {
    val rnd = new java.util.Random(1234)
    for (trial <- 0 until 40) {
      val n = 1 + rnd.nextInt(300)
      val boxes = randomBoxes(rnd, n)
      for (thresh <- Seq(-0.5, 0.0, 0.01, 0.3, 0.9)) {
        var pairsDense = -1L
        var pairsSparse = -2L
        val dense = BBoxGrouping.groupImpl(boxes, thresh,
          (_, p) => pairsDense = p, denseMax = Int.MaxValue)
        val sparse = BBoxGrouping.groupImpl(boxes, thresh,
          (_, p) => pairsSparse = p, denseMax = 0)
        assert(dense == sparse, s"trial=$trial n=$n thresh=$thresh")
        assert(pairsDense == pairsSparse,
          s"enumeration accounting diverged: trial=$trial n=$n thresh=$thresh")
      }
    }
  }

  test("duplicate-heavy corpora (identical boxes) group identically") {
    val rnd = new java.util.Random(99)
    val base = randomBoxes(rnd, 20)
    val boxes = (0 until 200).map(i => base(i % base.length))
    for (thresh <- Seq(0.01, 0.5)) {
      val dense = BBoxGrouping.groupImpl(boxes, thresh, (_, _) => (), Int.MaxValue)
      val sparse = BBoxGrouping.groupImpl(boxes, thresh, (_, _) => (), 0)
      assert(dense == sparse)
    }
  }
}
