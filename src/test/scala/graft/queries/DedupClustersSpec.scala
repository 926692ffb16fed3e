package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Connected-component invariants for q55's label propagation, checked
  * against the pair relation it consumes.
  */
class DedupClustersSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("labels are component minima and consistent across every edge") {
    val clusters = graft.SparkEntry.queries("q55_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.SparkEntry.queries("q41_ngram_jaccard")(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))

    // Every edge endpoint is labeled; both endpoints share a cluster.
    for ((a, b) <- pairs) {
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a) == clusters(b), s"edge ($a,$b) crosses clusters")
    }
    // A cluster id is the min member of its component and labels itself.
    for ((doc, c) <- clusters) {
      assert(c <= doc)
      assert(clusters(c) == c, s"cluster id $c is not its own label")
    }
    // The corpus's 3-way near-dup cluster (45, 267, 413) must merge even
    // though pair (45, 413) may arrive only transitively.
    assert(clusters.get(267L) == clusters.get(413L) &&
      clusters.get(45L) == clusters.get(267L),
      "transitive merge of the 3-way cluster")
    // Vertex set is exactly the edge endpoints.
    assert(clusters.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("pointer jumping converges in O(log diameter) rounds on a chain") {
    val ss = spark
    import ss.implicits._
    // A 64-node path graph: diameter 63. One-hop propagation needs ~63
    // rounds; the label-of-label shortcut doubles reach per round, so
    // convergence must land in ~log2(63)+slack. (The +2 covers the final
    // no-change round and the asymmetric first hop.)
    val n = 64
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val sym = edges.toDF("src", "dst")
      .unionByName(edges.map(_.swap).toDF("src", "dst"))
    val (labels, rounds) = Dedup.minLabelPropagation(sym)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels.unpersist()
    assert((0L until n).forall(out(_) == 0L), "chain must collapse to node 0")
    assert(rounds <= math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 2,
      s"expected O(log n) rounds, got $rounds")
  }
}
