package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Independent semantic references for the round-10 curation queries:
  * each is re-derived through a DIFFERENT plan shape than the production
  * query (window argmax instead of struct-max aggregation; per-member
  * recompute instead of the fused join+agg), so an aggregation-path bug
  * can't hide behind a shared implementation.
  */
class DeconCanonicalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q101 equals a window-argmax reference over the raw cross scores") {
    import graft.functions.{VectorFunctions => VF}
    val got = graft.SparkEntry.queries("q101_semantic_decon")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // Reference: materialize EVERY train×eval cosine, then rank with a
    // window ordered (c desc, eval_id asc) and keep rank 1 where the max
    // clears τ — the row_number path exercises none of the production
    // struct-max code.
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), VF.norm(col("embedding")).as("nrm"))
    val ev = e.filter(graft.queries.EvalSet.isEval(col("vec_id")))
      .select(col("vec_id").as("eval_id"), col("embedding").as("evv"), col("nrm").as("en"))
    val all = e.filter(graft.queries.EvalSet.isTrain(col("vec_id"))).crossJoin(ev)
      .withColumn("c", VF.dot(col("embedding"), col("evv")) / (col("nrm") * col("en")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("c").desc, col("eval_id"))
    val want = all.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("c") >= 0.3)
      .select(col("vec_id"), col("eval_id"), round(col("c"), 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got.nonEmpty, "τ must bite on the test corpus")
    assert(got == want, s"diff: ${(got diff want).take(3)} / ${(want diff got).take(3)}")
  }

  test("q102 keeps the max-quality member (min doc_id on ties) of every cluster") {
    import graft.functions.{TextFunctions => TF}
    val out = graft.SparkEntry.queries("q102_canonical_best")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty, "clusters must exist on the test corpus")

    // Per-member recompute, driver-side: labels + per-doc quality
    // through the same public kernels but NONE of the query's join/agg.
    val labels = Dedup.dedupClustersRel(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val quality = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("toks", TF.tokens(col("text")))
      .select(col("doc_id"), TF.qualityScore(col("text"), col("toks")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = labels.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap

    assert(out.map(_._1).toSet == members.keySet, "one row per cluster")
    for ((cluster, nMembers, keepId, q) <- out) {
      val ms = members(cluster)
      assert(nMembers == ms.size, s"cluster $cluster size")
      assert(ms.contains(keepId), s"cluster $cluster keeper must be a member")
      val best = ms.map(quality).max
      assert(quality(keepId) == best, s"cluster $cluster keeper not max-quality")
      assert(keepId == ms.filter(m => quality(m) == best).min,
        s"cluster $cluster tie must resolve to smallest doc_id")
      assert(q == BigDecimal(best).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"cluster $cluster reported quality $q != round($best, 6)")
    }
  }
}
