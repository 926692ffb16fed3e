package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.geo.{Mat3, Projection}

/** Equirectangular→perspective image warp (SURVEY.md §2 M13) — the
  * `GetPerspective` kernel (Equirec2Perspec.py:74-91) as a Spark
  * operator: per-view meshgrid of pixel rays through K⁻¹ and the view
  * rotation, lon/lat → source XY, sample with horizontal wrap.
  *
  * The geometry is graft.geo.Projection — the exact functions the golden
  * suite pins against the reference's executed code. Sampling is
  * nearest-neighbor (the reference uses OpenCV cubic; interpolation
  * choice is a kernel detail, the dataflow is the operator). Pixels come
  * from [[Multimodal.FakeCodec]] grayscale images (no codecs in this
  * container); a real decoder swaps in at the same seam.
  *
  * Scale shape: pure fan-out map — images × thetas with zero shuffle
  * (the reference's per-photo loop, tpp.py:43-49); K⁻¹ and R are
  * computed once per (view geometry), not per pixel.
  */
object Warp {

  // ImageIO's default disk cache would create+delete a temp file per
  // decoded blob; every input here is already fully in memory, so the
  // cache is pure per-row I/O overhead (and /tmp contention) in the
  // codec queries' timed path. Runs once per JVM at first Warp use —
  // executors included, since the module initializes on reference.
  javax.imageio.ImageIO.setUseCache(false)

  /** Grayscale fake image: header + w·h pixel bytes, pixel(x, y) =
    * (id·31 + x·7 + y·13) mod 256 — closed form for analytic tests.
    */
  def encodeImage(id: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](Multimodal.FakeCodec.HeaderLen + w * h)
    val header = Multimodal.FakeCodec.encode(id).take(Multimodal.FakeCodec.HeaderLen)
    System.arraycopy(header, 0, out, 0, header.length)
    // Overwrite header dims with the true pixel dims.
    out(5) = (w >> 24).toByte; out(6) = (w >> 16).toByte
    out(7) = (w >> 8).toByte; out(8) = w.toByte
    out(9) = (h >> 24).toByte; out(10) = (h >> 16).toByte
    out(11) = (h >> 8).toByte; out(12) = h.toByte
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(Multimodal.FakeCodec.HeaderLen + y * w + x) = pixel(id, x, y)
        x += 1
      }
      y += 1
    }
    out
  }

  def pixel(id: Long, x: Int, y: Int): Byte = ((id * 31 + x * 7 + y * 13) % 256).toByte

  /** The closed-form pattern as a REAL grayscale PNG (stock-JDK
    * javax.imageio writer). PNG is lossless, so
    * [[imageIoPixelDecoder]] of this blob reproduces [[pixel]]
    * bit-exactly — which is what lets q104 drive the real
    * encode→decode→warp path against the same analytic oracle family
    * as the fake-codec queries (WarpCodecSpec proves the equivalence
    * on the checked-in fixture; q104 proves it in the declared-query
    * gate at every SF).
    */
  def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = pixel(id, x, y); x += 1 }
      y += 1
    }
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The PIXEL decode seam (VERDICT r10 #4): bytes → (grayscale
    * row-major pixels, width, height), None on undecodable input. The
    * warp kernel below is decoder-agnostic; declared queries keep
    * [[fakePixelDecoder]] (closed-form bytes ⇒ analytic oracles), and
    * [[imageIoPixelDecoder]] is the REAL path a production deployment
    * uses — WarpCodecSpec drives actual checked-in JPEG/PNG fixtures
    * through it and the full warp.
    */
  type PixelDecoder = Array[Byte] => Option[(Array[Byte], Int, Int)]

  /** [[Multimodal.FakeCodec]] image: header + w·h payload bytes. */
  val fakePixelDecoder: PixelDecoder = bytes =>
    Multimodal.FakeCodec.decodeMeta(bytes).map { case (_, w, h, _) =>
      (java.util.Arrays.copyOfRange(
        bytes, Multimodal.FakeCodec.HeaderLen, bytes.length), w, h)
    }

  /** Real decode via the stock JDK's javax.imageio (JPEG/PNG/GIF/BMP —
    * no native libs), converted to luminance with PIL's integer 'L'
    * formula `(299·R + 587·G + 114·B) / 1000` — the reference opens
    * panoramas with PIL (hg/entities/panorama_photo.py:36) and feeds
    * OpenCV BGR to the warp (hg/helpers/Equirec2Perspec.py:65-67);
    * grayscale is this port's pixel model, so the PIL luma is the
    * honest single-channel analogue. Already-gray images pass their
    * raster through untouched (lossless for gray PNG fixtures).
    * Corrupt input ⇒ None, same contract as the metadata seam.
    */
  val imageIoPixelDecoder: PixelDecoder = bytes => {
    if (bytes == null) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Byte](w * h)
        if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
          img.getRaster.getDataElements(0, 0, w, h, out)
        } else {
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              out(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
              x += 1
            }
            y += 1
          }
        }
        Some((out, w, h))
      }
    } catch {
      // NonFatal: the JDK plugins throw unchecked exceptions on
      // valid-magic-corrupt-internals inputs; seam contract is
      // corrupt blob ⇒ null row, never a task crash.
      case scala.util.control.NonFatal(_) => None
    }
  }

  // ── Color JPEG path (VERDICT r11 #4) ────────────────────────────────
  // The reference decodes COLOR JPEGs (cv2.imread at Equirec2Perspec.py:
  // 65-67, PIL at panorama_photo.py:36); q104 proved the lossless
  // grayscale round trip, this family proves the lossy 3-channel one.
  // The closed-form channels are SMOOTH integer ramps (unit steps), so
  // DCT loss at quality 0.95 stays a few counts per pixel and a
  // per-view channel sum is verifiable under a DERIVED tolerance:
  // outW·outH · ColorJpegPixelTolerance (WarpCodecSpec measures the
  // actual per-pixel round-trip error and pins it under the bound).

  /** Closed-form color channels (c = 0 r, 1 g, 2 b): a per-image base
    * offset plus a smooth spatial ramp, all integer arithmetic so the
    * oracle mirrors it exactly with // division. Max value 96+100 < 256.
    */
  def colorPixel(id: Long, x: Int, y: Int, c: Int, w: Int, h: Int): Int = c match {
    case 0 => (id * 37 % 97).toInt + x * 100 / (w - 1)
    case 1 => (id * 53 % 97).toInt + y * 100 / (h - 1)
    case _ => (id * 71 % 97).toInt + (x + y) * 100 / (w + h - 2)
  }

  /** Measured per-pixel |decode − closed form| bound for
    * [[encodeColorJpeg]]→[[decodeColorRgb]] at quality 0.95 on the ramp
    * family (observed max 4 across ids/channels at 128×64; margin 2×).
    * WarpCodecSpec re-measures and fails if the codec drifts past it.
    */
  val ColorJpegPixelTolerance = 8

  /** The ramp image as a REAL color JPEG (stock-JDK writer, explicit
    * quality 0.95). Deterministic for a given JDK; the declared query's
    * eps oracle never sees the bytes — only sums under the derived
    * tolerance — so encoder-version drift cannot flip a verdict while
    * the codec stays within [[ColorJpegPixelTolerance]].
    */
  def encodeColorJpeg(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (colorPixel(id, x, y, 0, w, h) << 16) |
          (colorPixel(id, x, y, 1, w, h) << 8) |
          colorPixel(id, x, y, 2, w, h))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.95f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Real 3-channel decode: bytes → (r, g, b row-major rasters, w, h);
    * None on undecodable input (same seam contract as the gray path).
    */
  def decodeColorRgb(bytes: Array[Byte]): Option[(Array[Byte], Array[Byte], Array[Byte], Int, Int)] = {
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val r = new Array[Byte](w * h); val g = new Array[Byte](w * h)
        val b = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y); val i = y * w + x
            r(i) = ((rgb >> 16) & 0xff).toByte
            g(i) = ((rgb >> 8) & 0xff).toByte
            b(i) = (rgb & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Some((r, g, b, w, h))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** images × thetas → per-view per-channel pixel sums through the REAL
    * color JPEG decode and the SAME [[warpView]] kernel, once per
    * channel (the reference warps all three BGR planes with one map —
    * Equirec2Perspec.py:87-91; per-plane nearest-neighbor sampling is
    * identical math). Same zero-shuffle fan-out shape as
    * [[perspectiveViews]].
    */
  def colorPerspectiveSums(
      images: DataFrame,
      fovDeg: Double, thetas: Seq[Int], phiDeg: Double,
      outW: Int, outH: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("theta", IntegerType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idI = images.schema.fieldIndex("media_id")
    val bI = images.schema.fieldIndex("bytes")
    def sum(view: Array[Byte]): Long = {
      var s = 0L; view.foreach(v => s += (v & 0xff)); s
    }
    images.mapPartitions { rows =>
      rows.flatMap { row =>
        val id = row.getLong(idI)
        decodeColorRgb(row.getAs[Array[Byte]](bI)).iterator.flatMap {
          case (r, g, b, w, h) =>
            thetas.iterator.map { theta =>
              org.apache.spark.sql.Row(id, theta,
                sum(warpView(r, w, h, fovDeg, theta, phiDeg, outW, outH)),
                sum(warpView(g, w, h, fovDeg, theta, phiDeg, outW, outH)),
                sum(warpView(b, w, h, fovDeg, theta, phiDeg, outW, outH)))
            }
        }
      }
    }(enc)
  }

  /** Pure kernel: warp one equirectangular grayscale image to a
    * perspective view (nearest-neighbor, horizontal wrap / vertical
    * clamp like BORDER_WRAP on the seam axis).
    */
  def warpView(
      src: Array[Byte], srcW: Int, srcH: Int,
      fovDeg: Double, thetaDeg: Double, phiDeg: Double,
      outW: Int, outH: Int): Array[Byte] = {
    val (_, kInv) = Projection.calibMatrix(outW, outH, fovDeg)
    val r = Projection.viewRotation(thetaDeg, phiDeg)
    val out = new Array[Byte](outW * outH)
    var y = 0
    while (y < outH) {
      var x = 0
      while (x < outW) {
        val cam = Mat3.apply(kInv, (x.toDouble, y.toDouble, 1.0))
        val (wx, wy, wz) = Mat3.apply(r, cam)
        val (lon, lat) = Projection.xyzToLonLat(wx, wy, wz)
        val (sx, sy) = Projection.lonLatToXY(lon, lat, srcW, srcH)
        val px = java.lang.Math.floorMod(java.lang.Math.round(sx).toInt, srcW)
        val py = math.min(srcH - 1, math.max(0, java.lang.Math.round(sy).toInt))
        out(y * outW + x) = src(py * srcW + px)
        x += 1
      }
      y += 1
    }
    out
  }

  /** The operator: images × theta subdivisions → perspective views.
    * Input (media_id LONG, bytes BINARY); output one row per (image,
    * theta) with the warped view bytes and a content checksum.
    */
  def perspectiveViews(
      images: DataFrame,
      fovDeg: Double, thetas: Seq[Int], phiDeg: Double,
      outW: Int, outH: Int,
      decoder: PixelDecoder = fakePixelDecoder): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("theta", IntegerType),
      StructField("view", BinaryType), StructField("view_checksum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idI = images.schema.fieldIndex("media_id")
    val bI = images.schema.fieldIndex("bytes")
    images.mapPartitions { rows =>
      rows.flatMap { row =>
        val id = row.getLong(idI)
        val bytes = row.getAs[Array[Byte]](bI)
        decoder(bytes).iterator.flatMap { case (pixels, w, h) =>
          thetas.iterator.map { theta =>
            val view = warpView(pixels, w, h, fovDeg, theta, phiDeg, outW, outH)
            var check = 0L
            view.foreach(b => check = (check * 33 + (b & 0xff)) % 1000003L)
            org.apache.spark.sql.Row(id, theta, view, check)
          }
        }
      }
    }(enc)
  }
}
