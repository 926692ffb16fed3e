package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ANN ingest against the persisted index (VERDICT r17 #7):
  * an append batch assigns to existing cells map-only with UNCHANGED
  * anchors, the re-anchor policy fires only past the K(n) slack step,
  * and serving on the stale quantizer at the appended point loses
  * almost no recall vs a fresh re-anchor — the IVF mirror of the
  * streaming near-dup segment store's assignment-only ingest.
  */
class AnnIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def cos(a: scala.collection.Seq[Float], b: scala.collection.Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  test("10% append assigns map-only with unchanged anchors; re-anchor fires only past the K(n) slack") {
    AnnIndexTable.ensure(spark, sf)
    val idx = Similarity.annIndex(spark, sf)
    val batch = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000L).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * 1.001 AS FLOAT))").as("embedding"))
    val assigned = AnnIngest.assignBatch(spark, sf, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(assigned.size == 50)
    // Anchors unchanged: the ingest path serves off the cached index.
    assert(Similarity.annIndex(spark, sf) eq idx,
      "assignBatch must not rebuild or re-derive the index")
    // Assignment equals brute-force nearest anchor (score DESC, id ASC)
    // — the same fold/tie rule the flat quantizer and its oracle use.
    val vecs = batch.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toIndexedSeq)).toMap
    vecs.foreach { case (id, v) =>
      val best = idx.anchors.map { case (aid, av, _) => (aid, cos(v, av.map(_.toFloat))) }
        .maxBy { case (aid, s) => (s, -aid) }._1
      assert(assigned(id) == best, s"row $id assigned ${assigned(id)}, brute $best")
    }
    // Policy: a 10% append serves on the stale quantizer; ~60% growth
    // crosses the 1.25x K slack and demands a re-anchor tick.
    assert(!AnnIngest.needsReanchor(idx.k, idx.n + 50),
      "a 10% append must not force a re-anchor")
    assert(AnnIngest.needsReanchor(idx.k, (idx.n * 1.6).toLong),
      "60% growth must trip the re-anchor policy")
  }

  test("re-anchor tick rebuilds at the scaled K; stale-quantizer recall holds at the appended point") {
    AnnIndexTable.ensure(spark, sf)
    val stale = Similarity.annIndex(spark, sf)
    val s2 = spark; import s2.implicits._
    val base = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toIndexedSeq))
    val appended = base.filter(_._1 < 50)
      .map { case (id, v) => (id + 10000L, v.map(x => (x * 1.001f))) }
    val merged = base ++ appended

    // The re-anchor tick: the grown corpus materializes its own index
    // (the fingerprint moves with the corpus — InputTable's stamp
    // chain), at the corpus-scaled K.
    val tmp = java.nio.file.Files.createTempDirectory("annIngest").toString
    merged.toSeq.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    AnnIndexTable.ensure(spark, tmp)
    val fresh = Similarity.annIndex(spark, tmp)
    assert(fresh.n == merged.length)
    assert(fresh.k == Similarity.anchorKFor(merged.length.toLong))
    assert(fresh.k > stale.k, "the grown corpus must re-anchor at a larger K")

    // Recall at the appended point, stale vs fresh quantizer: exact
    // top-5 vs cells-probe top-5 (nprobe = ceil(K/64), q54's budget)
    // over a 25-query batch (125 truth slots — the q49-convention 5
    // queries put single-hit noise at 4% of the ratio).
    def recallWith(anchors: Seq[(Long, Seq[Float], Double)], k: Int): Double = {
      def cell(v: Seq[Float]): Long =
        anchors.map { case (aid, av, _) => (aid, cos(v, av.map(_.toFloat))) }
          .maxBy { case (aid, s) => (s, -aid) }._1
      val cells = merged.map { case (id, v) => (id, cell(v), v) }
      val p = (k + 63) / 64
      val queries = merged.filter(_._1 < 25)
      val hits = queries.map { case (qid, qv) =>
        val truth = merged.filter(_._1 != qid)
          .map { case (id, v) => (id, cos(qv, v)) }
          .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
        val probes = anchors.map { case (aid, av, _) => (aid, cos(qv, av.map(_.toFloat))) }
          .sortBy { case (aid, s) => (-s, aid) }.take(p).map(_._1).toSet
        val cand = cells.filter { case (id, c, _) => probes(c) && id != qid }
        val approx = cand.map { case (id, _, v) => (id, cos(qv, v)) }
          .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
        (truth & approx).size
      }.sum
      hits / (5.0 * queries.length)
    }
    val rStale = recallWith(stale.anchors, stale.k)
    val rFresh = recallWith(fresh.anchors, fresh.k)
    info(s"appended-point recall@5: stale quantizer $rStale vs re-anchored $rFresh")
    assert(rStale >= 0.9 * rFresh,
      s"stale-quantizer recall $rStale fell below 0.9x the re-anchored $rFresh")
  }
}
