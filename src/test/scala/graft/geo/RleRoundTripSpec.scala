package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Property: encodeCounts is the exact inverse of parseCounts (the
  * pycocotools LEB128 layout incl. the index≥3 delta coding and the
  * sign-extension continuation rule), and decode(encode(runs)) rebuilds
  * the mask the runs describe. Seeded exhaustive-ish sweep — no external
  * property framework needed.
  */
class RleRoundTripSpec extends AnyFunSuite {

  test("parseCounts(encodeCounts(runs)) == runs across 500 seeded run lists") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = 1 + rnd.nextInt(12)
      val runs = Array.fill(n)(rnd.nextInt(5001))
      assert(Rle.parseCounts(Rle.encodeCounts(runs)).toSeq == runs.toSeq,
        s"round trip failed for ${runs.mkString(",")}")
    }
    // Delta coding kicks in at index 3 — descending runs exercise the
    // negative-delta sign-extension path explicitly.
    val tricky = Seq(
      Array(4000, 1, 3, 2, 5000, 0, 17),
      Array(0, 0, 0, 0),
      Array(1000000, 999999, 1, 2, 1))
    tricky.foreach(r =>
      assert(Rle.parseCounts(Rle.encodeCounts(r)).toSeq == r.toSeq))
  }

  test("decode(encode) lays runs down a column-major mask") {
    val h = 5; val w = 4
    val runs = Array(7, 5, 8) // 7 bg, 5 fg, 8 bg in Fortran order
    val mask = Rle.decode(Rle.encodeCounts(runs), h, w)
    val flat = for (x <- 0 until w; y <- 0 until h) yield mask(y)(x)
    assert(flat.toSeq == Seq.fill(7)(0.toByte) ++ Seq.fill(5)(1.toByte) ++ Seq.fill(8)(0.toByte))
  }
}
