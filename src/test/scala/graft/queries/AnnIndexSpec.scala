package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.SessionCache

/** The persisted ANN serving index (VERDICT r17 #6): a reuse tick must
  * reconstruct the EXACT in-memory index the live derivation builds —
  * anchors verbatim (hash-rank order, float/double bit round-trip),
  * corpus count, and the two-level coarse route — while reading only
  * the ≤ K-row index table, never the corpus.
  */
class AnnIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("reuse tick rebuilds the live index exactly, reading only the index table") {
    // Live truth on a session with NO committed table.
    AnnIndexTable.invalidate(sf)
    val liveSession = spark.newSession()
    val live = Similarity.annIndex(liveSession, sf)
    assert(live.anchors.size == math.min(live.k.toLong, live.n).toInt)

    // Commit the table, then seed a brand-new session from it while
    // counting records read (corpus = 500 rows at sf0.01, index = 88 —
    // a live re-derivation is unmistakable in the read volume).
    AnnIndexTable.ensure(liveSession, sf)
    val reuseSession = spark.newSession()
    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        read.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      AnnIndexTable.ensure(reuseSession, sf)
      AnnIndexTable.seedSessionCaches(reuseSession, sf)
      // Listener delivery is async — poll until the count stabilizes.
      var last = -1L
      var spins = 0
      while (read.get != last && spins < 50) {
        last = read.get; Thread.sleep(100); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(SessionCache.liveKeys(reuseSession).contains(s"annIndex:$sf"),
      "seed must populate the index cache on the reuse path")
    assert(SessionCache.liveKeys(reuseSession).contains(s"embN:$sf"),
      "the persisted corpus_n must seed embN — no full-corpus count on reuse")
    val reused = Similarity.annIndex(reuseSession, sf)
    assert(reused.n == live.n)
    assert(reused.anchors == live.anchors,
      "persisted anchors must round-trip verbatim in hash-rank order")
    assert(reused.route == live.route,
      "the persisted coarse route must equal the live routing table")
    assert(read.get <= live.anchors.size + 8,
      s"reuse tick read ${read.get} records — more than the index table " +
        s"(${live.anchors.size} rows); it must not scan the corpus")
  }
}
