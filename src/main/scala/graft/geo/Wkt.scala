package graft.geo

/** WKT serialization of 2D polygons (SURVEY.md §2 P3/U5).
  *
  * The reference builds WKT through shapely
  * (heritage-guard/heritage_guard/assets/detected_objects_processing/detected_objects_processing.py:10-15):
  * `Polygon(coords).to_wkt()`, with a bare-except fallback to the empty
  * polygon. WKT is just string formatting — no geometry library needed.
  * Matches shapely's trimmed number format: integral values render with no
  * decimal point, others with Java's shortest round-trip representation.
  */
object Wkt {

  val empty: String = "POLYGON EMPTY"

  private def num(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  /** Exterior-ring-only polygon. Closes the ring if the input does not
    * (shapely closes implicitly). Fewer than 3 distinct vertices → empty
    * polygon, mirroring the reference's try/except default.
    */
  def polygon(ring: Seq[(Double, Double)]): String = {
    if (ring == null || ring.size < 3) empty
    else {
      val closed = if (ring.head == ring.last) ring else ring :+ ring.head
      closed.map { case (x, y) => s"${num(x)} ${num(y)}" }
        .mkString("POLYGON ((", ", ", "))")
    }
  }

  /** GeoJSON-style nested coordinates → WKT, the exact input shape of
    * `parse_polygon` (`{'coordinates': [[...ring...]]}`). Any failure →
    * empty polygon (the reference's bare except).
    */
  def fromGeoJsonCoords(coords: Seq[Seq[Seq[Double]]]): String =
    try {
      if (coords == null || coords.isEmpty) empty
      else polygon(coords.head.map(p => (p(0), p(1))))
    } catch { case _: Exception => empty }
}

/** JPEG dimension sniff without a full decode (SURVEY.md §2 S8/U8).
  *
  * Port of `get_image_dimensions`
  * (heritage-guard/heritage_guard/assets/street_level_grouping/street_level_grouping.py:302-310):
  * reads big-endian height then width at byte offset 163 — where the SOF0
  * segment's dimension words sit for the reference's specific camera
  * output. Kept verbatim (same offset) plus a robust marker-walking
  * variant for arbitrary JPEGs.
  */
object JpegDims {

  /** The reference's fixed-offset trick: (width, height). */
  def fixedOffset(bytes: Array[Byte]): (Int, Int) = {
    def u(b: Byte): Int = b & 0xff
    val height = (u(bytes(163)) << 8) + u(bytes(164))
    val width = (u(bytes(165)) << 8) + u(bytes(166))
    (width, height)
  }

  /** Marker-walking SOF parse: correct for any baseline/progressive JPEG.
    * Returns None when no SOF marker is found.
    */
  def fromHeaders(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u(i: Int): Int = bytes(i) & 0xff
    if (bytes.length < 4 || u(0) != 0xff || u(1) != 0xd8) return None
    var i = 2
    while (i + 3 < bytes.length) {
      if (u(i) != 0xff) return None
      val marker = u(i + 1)
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (i + 8 >= bytes.length) return None
        val height = (u(i + 5) << 8) + u(i + 6)
        val width = (u(i + 7) << 8) + u(i + 8)
        return Some((width, height))
      }
      val len = (u(i + 2) << 8) + u(i + 3)
      i += 2 + len
    }
    None
  }
}

/** COCO run-length-encoded mask decode + contour extraction
  * (SURVEY.md §2 S10/M14).
  *
  * The reference calls `pycocotools.mask.decode` then
  * `cv2.findContours(..., RETR_TREE, CHAIN_APPROX_SIMPLE)` and keeps the
  * first contour (heritage-guard/heritage_guard/helpers/Equirec2Perspec.py:121-127).
  * Ported: the LEB128-style counts parser and column-major run expansion
  * follow the COCO spec; contouring is Moore boundary tracing of the first
  * foreground region in raster order with collinear-point compression —
  * semantically CHAIN_APPROX_SIMPLE, though vertex order may differ from
  * OpenCV on exotic shapes (documented divergence, SURVEY §7).
  */
object Rle {

  /** Parse a compressed COCO `counts` string into run lengths. */
  def parseCounts(counts: String): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var pos = 0
    while (pos < counts.length) {
      var x = 0L
      var k = 0
      var more = true
      while (more) {
        val c = counts.charAt(pos).toLong - 48
        x |= (c & 0x1f) << (5 * k)
        more = (c & 0x20) != 0
        pos += 1
        if (!more && (c & 0x10) != 0) x |= -1L << (5 * (k + 1))
        k += 1
      }
      if (out.length > 2) x += out(out.length - 2)
      out += x.toInt
    }
    out.toArray
  }

  /** Decode to a dense binary mask, column-major (Fortran) order like
    * pycocotools: runs alternate background/foreground down columns.
    * @return row-major Array[Array[Byte]] of 0/1, dims (height, width).
    */
  def decode(countsStr: String, height: Int, width: Int): Array[Array[Byte]] = {
    val runs = parseCounts(countsStr)
    val mask = Array.ofDim[Byte](height, width)
    var idx = 0
    var value: Byte = 0
    runs.foreach { run =>
      var r = 0
      while (r < run) {
        mask(idx % height)(idx / height) = value
        idx += 1
        r += 1
      }
      value = (1 - value).toByte
    }
    mask
  }

  /** Exterior contour of the first foreground region (raster-scan order):
    * Moore-neighbor tracing, then collinear-run compression. Returns null
    * analogue None for degenerate (<3 point) regions, matching
    * Equirec2Perspec.py:126-127.
    */
  def firstContour(mask: Array[Array[Byte]]): Option[Vector[(Int, Int)]] = {
    val h = mask.length
    if (h == 0) return None
    val w = mask(0).length
    def at(x: Int, y: Int): Boolean = x >= 0 && x < w && y >= 0 && y < h && mask(y)(x) == 1

    // First foreground pixel in raster order.
    var sx = -1; var sy = -1
    var y = 0
    while (y < h && sx < 0) {
      var x = 0
      while (x < w && sx < 0) { if (mask(y)(x) == 1) { sx = x; sy = y }; x += 1 }
      y += 1
    }
    if (sx < 0) return None

    // Moore-neighbor tracing (clockwise, 8-connectivity).
    val dirs = Array((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1))
    val contour = scala.collection.mutable.ArrayBuffer((sx, sy))
    var (cx, cy) = (sx, sy)
    var backtrack = 6 // came from above (start pixel is topmost-leftmost)
    var done = false
    var steps = 0
    val maxSteps = 4 * (h * w + 4)
    while (!done && steps < maxSteps) {
      var found = false
      var i = 0
      while (i < 8 && !found) {
        val d = (backtrack + 1 + i) % 8
        val (nx, ny) = (cx + dirs(d)._1, cy + dirs(d)._2)
        if (at(nx, ny)) {
          if (nx == sx && ny == sy) done = true
          else {
            contour += ((nx, ny))
            backtrack = (d + 4) % 8
            cx = nx; cy = ny
          }
          found = true
        }
        i += 1
      }
      if (!found) done = true // isolated pixel
      steps += 1
    }

    // CHAIN_APPROX_SIMPLE analogue: drop interior points of straight runs.
    val pts = contour.toVector
    val compressed =
      if (pts.size < 3) pts
      else pts.indices.collect {
        case i if {
          val p = pts((i - 1 + pts.size) % pts.size); val c = pts(i); val n = pts((i + 1) % pts.size)
          (c._1 - p._1, c._2 - p._2) != (n._1 - c._1, n._2 - c._2)
        } => pts(i)
      }.toVector
    if (compressed.size < 3) None else Some(compressed)
  }

  /** decode + firstContour, the composed shape the pipeline consumes. */
  def maskToPolygon(countsStr: String, height: Int, width: Int): Option[Vector[(Int, Int)]] =
    firstContour(decode(countsStr, height, width))

  /** Inverse of [[parseCounts]] — pycocotools `rleToString` (K-side RLE
    * encode; also the fixture generator for the S10 scan queries): 5-bit
    * groups with a 0x20 continuation bit, runs at index ≥ 3 delta-coded
    * against index − 2.
    */
  def encodeCounts(runs: Array[Int]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < runs.length) {
      var x: Long = if (i > 2) runs(i).toLong - runs(i - 2) else runs(i).toLong
      var more = true
      while (more) {
        var c = x & 0x1f
        x >>= 5
        more = if ((c & 0x10) != 0) x != -1 else x != 0
        if (more) c |= 0x20
        sb += (c + 48).toChar
      }
      i += 1
    }
    sb.toString
  }
}
