package graft.geo

/** Density-based clustering for the wall-plane extraction pipeline
  * (SURVEY.md §2 A11; heritage-guard/heritage_guard/helpers/MeshWallExtractror.py:56-68).
  *
  * Pure-Scala DBSCAN matching sklearn's semantics: a point is core when
  * its ε-neighborhood (including itself) has ≥ minSamples members; clusters
  * are expanded from core points in index order; border points join the
  * first cluster that reaches them; unreachable points are noise (-1).
  * Deterministic for a fixed input order.
  *
  * Scale note: this is the O(n²) partition-local kernel. At 100 TB the
  * driver pattern is spatial tiling — `groupByKey(tile)` with overlap
  * margins, DBSCAN per tile inside `flatMapGroups`, then merging clusters
  * that share margin points — so the quadratic cost is bounded per tile,
  * never global. The reference runs one global fit on a decimated mesh
  * (~10⁴ cells), which one tile covers.
  */
object Dbscan {

  private val Unclassified = -2
  val Noise: Int = -1

  /** @param points   feature rows (any dimension, already weighted/scaled)
    * @return cluster label per point; -1 = noise.
    */
  def fit(points: IndexedSeq[Array[Double]], eps: Double, minSamples: Int): Array[Int] = {
    val n = points.length
    val eps2 = eps * eps

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    val neighbors: Array[Array[Int]] = Array.tabulate(n) { i =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      var j = 0
      while (j < n) { if (dist2(points(i), points(j)) <= eps2) buf += j; j += 1 }
      buf.toArray
    }
    val core = Array.tabulate(n)(i => neighbors(i).length >= minSamples)

    val labels = Array.fill(n)(Unclassified)
    var cluster = 0
    var i = 0
    while (i < n) {
      if (labels(i) == Unclassified) {
        if (!core(i)) labels(i) = Noise
        else {
          labels(i) = cluster
          val queue = scala.collection.mutable.Queue(neighbors(i).toIndexedSeq: _*)
          while (queue.nonEmpty) {
            val q = queue.dequeue()
            if (labels(q) == Noise) labels(q) = cluster
            else if (labels(q) == Unclassified) {
              labels(q) = cluster
              if (core(q)) queue.enqueueAll(neighbors(q))
            }
          }
          cluster += 1
        }
      }
      i += 1
    }
    labels
  }

  /** Column-wise z-normalization matching sklearn's StandardScaler
    * (population std, ddof=0) — MeshWallExtractror.py:62-63.
    */
  def standardScale(points: IndexedSeq[Array[Double]]): IndexedSeq[Array[Double]] = {
    if (points.isEmpty) return points
    val dims = points.head.length
    val n = points.length.toDouble
    val mean = new Array[Double](dims)
    points.foreach { p => var d = 0; while (d < dims) { mean(d) += p(d); d += 1 } }
    (0 until dims).foreach(d => mean(d) /= n)
    val std = new Array[Double](dims)
    points.foreach { p => var d = 0; while (d < dims) { val v = p(d) - mean(d); std(d) += v * v; d += 1 } }
    (0 until dims).foreach { d => std(d) = math.sqrt(std(d) / n); if (std(d) == 0.0) std(d) = 1.0 }
    points.map { p => Array.tabulate(dims)(d => (p(d) - mean(d)) / std(d)) }
  }
}
