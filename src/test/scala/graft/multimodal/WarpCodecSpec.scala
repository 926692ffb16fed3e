package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{Mat3, Projection}

/** The REAL image-decode path (VERDICT r10 #4): checked-in JPEG/PNG
  * fixtures through [[Warp.imageIoPixelDecoder]] and the full
  * equirect→perspective warp. The fixtures encode the SAME closed-form
  * pattern as [[Warp.pixel]] (id=7, 64×32), so the real path has an
  * independent ground truth: PNG is lossless ⇒ bit-exact against the
  * formula; JPEG is the reference's actual on-disk format ⇒ bounded
  * decode error against it, with the fixture frozen so the bound is
  * deterministic. q75/q87/q90-92 keep the fake codec (analytic
  * oracles); this spec proves the seam carries a real decoder.
  */
class WarpCodecSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private val srcW = 64
  private val srcH = 32
  private val id = 7L
  private def pattern: Array[Byte] =
    Array.tabulate(srcW * srcH)(i => Warp.pixel(id, i % srcW, i / srcW))

  test("encodePng → imageIoPixelDecoder round-trips the pattern bit-exact (the q104 path)") {
    val Some((px, w, h)) = Warp.imageIoPixelDecoder(Warp.encodePng(id, srcW, srcH))
    assert(w == srcW && h == srcH)
    assert(px.sameElements(pattern),
      "lossless PNG encode/decode must reproduce the generating formula exactly")
  }

  test("PNG fixture decodes bit-exact to the closed-form pattern") {
    val Some((px, w, h)) = Warp.imageIoPixelDecoder(resource("pano_64x32.png"))
    assert(w == srcW && h == srcH)
    assert(px.sameElements(pattern),
      "lossless decode must reproduce the generating formula exactly")
  }

  test("real-PNG warp is bit-identical to the FakeCodec warp of the same scene") {
    val Some((realPx, w, h)) = Warp.imageIoPixelDecoder(resource("pano_64x32.png"))
    val fakeBytes = Warp.encodeImage(id, srcW, srcH)
    val Some((fakePx, fw, fh)) = Warp.fakePixelDecoder(fakeBytes)
    assert((w, h) == ((fw, fh)))
    for (theta <- Seq(0, 90, 180, 270)) {
      val real = Warp.warpView(realPx, w, h, 90.0, theta, -15.0, 20, 12)
      val fake = Warp.warpView(fakePx, fw, fh, 90.0, theta, -15.0, 20, 12)
      assert(real.sameElements(fake),
        s"theta=$theta: the oracled fake-codec geometry and the real-codec path diverge")
    }
  }

  test("JPEG fixture decodes within a deterministic error bound of the pattern") {
    val Some((px, w, h)) = Warp.imageIoPixelDecoder(resource("pano_64x32.jpg"))
    assert(w == srcW && h == srcH)
    val ref = pattern
    val diffs = px.indices.map(i => math.abs((px(i) & 0xff) - (ref(i) & 0xff)))
    val mean = diffs.sum.toDouble / diffs.size
    // Frozen fixture ⇒ frozen decode: measured meanAbs 4.22, max 33
    // (stock-JDK reader). Bounds are 2-3× headroom in case a future JDK
    // swaps its IDCT; a broken decode (shifted rows, channel mixup)
    // lands far outside them.
    assert(mean < 12.0, s"mean abs decode error $mean")
    assert(diffs.max < 96, s"max abs decode error ${diffs.max}")
  }

  test("perspectiveViews runs real JPEGs end-to-end; sampling obeys the projection chain") {
    val jpegBytes = resource("pano_64x32.jpg")
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, jpegBytes),
      org.apache.spark.sql.Row(2L, Array[Byte](9, 9, 9)), // corrupt → dropped
      org.apache.spark.sql.Row(3L, null))                 // null → dropped
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("bytes", BinaryType, nullable = true)))
    val df = spark.createDataFrame(rows, schema)
    val outW = 16; val outH = 10; val fov = 100.0; val phi = -10.0
    val out = Warp.perspectiveViews(df, fov, Seq(0, 120, 240), phi, outW, outH,
        Warp.imageIoPixelDecoder)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2))).toSeq
    assert(out.map(_._1).distinct == Seq(1L), "undecodable rows must drop, not crash")
    assert(out.map(_._2).sorted == Seq(0, 120, 240))

    // Independent per-pixel check of the M13 sampling equation over the
    // REAL decoded pixels: out(x,y) = src at the lon/lat-projected
    // source coordinate (Equirec2Perspec.py:74-91 semantics; the
    // Projection chain itself is pinned by the golden suite).
    val Some((src, w, h)) = Warp.imageIoPixelDecoder(jpegBytes)
    val (_, kInv) = Projection.calibMatrix(outW, outH, fov)
    for ((_, theta, view) <- out) {
      assert(view.length == outW * outH)
      val r = Projection.viewRotation(theta, phi)
      for (y <- 0 until outH; x <- 0 until outW) {
        val cam = Mat3.apply(kInv, (x.toDouble, y.toDouble, 1.0))
        val (wx, wy, wz) = Mat3.apply(r, cam)
        val (lon, lat) = Projection.xyzToLonLat(wx, wy, wz)
        val (sx, sy) = Projection.lonLatToXY(lon, lat, w, h)
        val px = java.lang.Math.floorMod(java.lang.Math.round(sx).toInt, w)
        val py = math.min(h - 1, math.max(0, java.lang.Math.round(sy).toInt))
        assert(view(y * outW + x) == src(py * w + px),
          s"theta=$theta out($x,$y) != src($px,$py)")
      }
    }
  }

  test("color JPEG round trip stays under ColorJpegPixelTolerance per pixel (the q106 bound)") {
    // q106's eps-oracle atol is outW·outH·ColorJpegPixelTolerance — this
    // measurement is what makes that a DERIVED bound, not a magic
    // number: the smooth-ramp family at quality 0.95 must round-trip
    // within the pinned per-pixel error on every channel, across ids.
    val w = 128; val h = 64
    var worst = 0
    for (id <- Seq(0L, 7L, 990L, 123457L)) {
      val Some((r, g, b, dw, dh)) = Warp.decodeColorRgb(Warp.encodeColorJpeg(id, w, h))
      assert((dw, dh) == ((w, h)))
      val chans = Seq((r, 0), (g, 1), (b, 2))
      for ((chan, c) <- chans; y <- 0 until h; x <- 0 until w) {
        val d = math.abs((chan(y * w + x) & 0xff) - Warp.colorPixel(id, x, y, c, w, h))
        if (d > worst) worst = d
      }
    }
    info(s"measured max per-pixel color round-trip error: $worst")
    assert(worst <= Warp.ColorJpegPixelTolerance,
      s"codec drifted past the pinned bound: $worst > ${Warp.ColorJpegPixelTolerance}")
    assert(worst > 0, "JPEG is lossy — a zero error means the measurement is vacuous")
  }

  test("colorPerspectiveSums: undecodable rows drop; sums match a direct per-channel warp") {
    val jpeg = Warp.encodeColorJpeg(5L, 64, 32)
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(5L, jpeg),
      org.apache.spark.sql.Row(6L, Array[Byte](1, 2, 3)),
      org.apache.spark.sql.Row(7L, null))
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("bytes", BinaryType, nullable = true)))
    val df = spark.createDataFrame(rows, schema)
    val out = Warp.colorPerspectiveSums(df, 75.0, Seq(30, 210), 0.0, 12, 12)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).distinct.toSeq == Seq(5L))
    assert(out.map(_._2).sorted.toSeq == Seq(30, 210))
    val Some((r, g, b, w, h)) = Warp.decodeColorRgb(jpeg)
    def s(a: Array[Byte]): Long = a.foldLeft(0L)((acc, v) => acc + (v & 0xff))
    for ((_, theta, sr, sg, sb) <- out) {
      assert(sr == s(Warp.warpView(r, w, h, 75.0, theta, 0.0, 12, 12)))
      assert(sg == s(Warp.warpView(g, w, h, 75.0, theta, 0.0, 12, 12)))
      assert(sb == s(Warp.warpView(b, w, h, 75.0, theta, 0.0, 12, 12)))
    }
  }

  test("imageIo decoder rejects FakeCodec bytes and corrupt input as None") {
    assert(Warp.imageIoPixelDecoder(Warp.encodeImage(3L, 8, 8)).isEmpty)
    assert(Warp.imageIoPixelDecoder(null).isEmpty)
    assert(Warp.imageIoPixelDecoder(Array[Byte](0x42, 0x4d, 1)).isEmpty) // torn BMP magic
  }
}
