package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class WktSpec extends AnyFunSuite {
  test("polygon WKT matches shapely's trimmed format") {
    assert(Wkt.polygon(Seq((120.0, 340.0), (480.0, 340.0), (480.0, 900.0), (120.0, 900.0))) ==
      "POLYGON ((120 340, 480 340, 480 900, 120 900, 120 340))")
    assert(Wkt.polygon(Seq((1.5, 2.25), (3.0, 2.25), (3.0, 4.0))) ==
      "POLYGON ((1.5 2.25, 3 2.25, 3 4, 1.5 2.25))")
  }

  test("degenerate input falls back to POLYGON EMPTY like the reference's bare except") {
    assert(Wkt.polygon(Nil) == "POLYGON EMPTY")
    assert(Wkt.polygon(Seq((0.0, 0.0), (1.0, 1.0))) == "POLYGON EMPTY")
    assert(Wkt.fromGeoJsonCoords(null) == "POLYGON EMPTY")
    assert(Wkt.fromGeoJsonCoords(Seq.empty) == "POLYGON EMPTY")
  }

  test("GeoJSON coordinates use the first (exterior) ring only") {
    val coords = Seq(Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(4.0, 4.0), Seq(0.0, 4.0), Seq(0.0, 0.0)))
    assert(Wkt.fromGeoJsonCoords(coords) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
  }
}

class JpegDimsSpec extends AnyFunSuite {
  test("fixedOffset reads big-endian height then width at byte 163") {
    val bytes = new Array[Byte](200)
    bytes(163) = 0x0f; bytes(164) = 0xa0.toByte // height 4000
    bytes(165) = 0x1f; bytes(166) = 0x40        // width  8000
    assert(JpegDims.fixedOffset(bytes) == (8000, 4000))
  }

  test("fromHeaders walks markers to SOF0") {
    // SOI, APP0 (len 16), SOF0 with 2000x1000
    val b = collection.mutable.ArrayBuffer[Int](0xff, 0xd8)
    b ++= Seq(0xff, 0xe0, 0x00, 0x10); b ++= Seq.fill(14)(0)
    b ++= Seq(0xff, 0xc0, 0x00, 0x11, 0x08, 0x03, 0xe8, 0x07, 0xd0)
    b ++= Seq.fill(20)(0)
    assert(JpegDims.fromHeaders(b.map(_.toByte).toArray).contains((2000, 1000)))
    assert(JpegDims.fromHeaders(Array[Byte](1, 2, 3, 4)).isEmpty)
  }
}

class RleSpec extends AnyFunSuite {

  /** Inverse of parseCounts per the COCO spec (relative runs from index 2,
    * LEB128-ish base-48 chars) — used for round-trip testing only.
    */
  private def encodeCounts(runs: Array[Int]): String = {
    val sb = new StringBuilder
    runs.indices.foreach { i =>
      // COCO: runs after the first three are delta-encoded vs runs[i-2].
      var x = if (i > 2) runs(i) - runs(i - 2) else runs(i)
      var more = true
      while (more) {
        var c = (x & 0x1f)
        x >>= 5
        more = if ((c & 0x10) != 0) x != -1 else x != 0
        if (more) c |= 0x20
        sb += (c + 48).toChar
      }
    }
    sb.toString
  }

  test("counts round-trip through encode/parse") {
    val runs = Array(3, 10, 4, 12, 0, 7)
    assert(Rle.parseCounts(encodeCounts(runs)).toSeq == runs.toSeq)
  }

  test("decode expands column-major runs") {
    // 3x3 mask, runs: 1 zero, 2 ones, 6 zeros (column-major).
    val m = Rle.decode(encodeCounts(Array(1, 2, 6)), 3, 3)
    assert(m(0).toSeq == Seq[Byte](0, 0, 0))
    assert(m(1).toSeq == Seq[Byte](1, 0, 0))
    assert(m(2).toSeq == Seq[Byte](1, 0, 0))
  }

  test("firstContour traces a filled rectangle to its 4 corners") {
    val mask = Array.tabulate(10, 10)((y, x) => if (x >= 2 && x <= 6 && y >= 3 && y <= 8) 1.toByte else 0.toByte)
    val contour = Rle.firstContour(mask)
    assert(contour.isDefined)
    val pts = contour.get.toSet
    assert(Set((2, 3), (6, 3), (6, 8), (2, 8)).subsetOf(pts), s"corners in $pts")
    assert(contour.get.size == 4, "CHAIN_APPROX_SIMPLE keeps only corners on a rectangle")
  }

  test("degenerate masks yield no contour like the reference's None") {
    assert(Rle.firstContour(Array.ofDim[Byte](5, 5)).isEmpty)
    val single = Array.ofDim[Byte](5, 5); single(2)(2) = 1
    assert(Rle.firstContour(single).isEmpty)
  }
}

class DbscanSpec extends AnyFunSuite {
  test("two dense blobs cluster separately; far point is noise") {
    val blob1 = (0 until 25).map(i => Array(0.0 + (i % 5) * 0.01, 0.0 + (i / 5) * 0.01))
    val blob2 = (0 until 25).map(i => Array(5.0 + (i % 5) * 0.01, 5.0 + (i / 5) * 0.01))
    val noise = IndexedSeq(Array(100.0, 100.0))
    val pts = blob1 ++ blob2 ++ noise
    val labels = Dbscan.fit(pts, eps = 0.05, minSamples = 10)
    assert(labels.take(25).toSet == Set(0))
    assert(labels.slice(25, 50).toSet == Set(1))
    assert(labels.last == Dbscan.Noise)
  }

  test("standardScale matches population-std z-normalization") {
    val pts = IndexedSeq(Array(1.0), Array(2.0), Array(3.0))
    val scaled = Dbscan.standardScale(pts).map(_(0))
    val expectedStd = math.sqrt(2.0 / 3.0)
    assert(math.abs(scaled(0) + 1.0 / expectedStd) <= 1e-12)
    assert(math.abs(scaled(1)) <= 1e-12)
    assert(math.abs(scaled(2) - 1.0 / expectedStd) <= 1e-12)
  }

  test("min_samples counts the point itself (sklearn convention)") {
    // 3 identical points, minSamples=3 → all one cluster, no noise.
    val pts = IndexedSeq(Array(1.0, 1.0), Array(1.0, 1.0), Array(1.0, 1.0))
    assert(Dbscan.fit(pts, 0.1, 3).toSet == Set(0))
  }
}
