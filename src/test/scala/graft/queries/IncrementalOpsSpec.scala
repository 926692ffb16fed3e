package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Guards for the round-4 incremental/training-mix queries:
  *
  *  - q57: the bloom prefilter must be exact end-to-end (result equals
  *    the plain anti-join it accelerates — false positives die in the
  *    confirm, false negatives cannot exist), the re-crawl rows must be
  *    eliminated, and the confirm path must never shuffle the corpus
  *    (broadcast joins only).
  *  - q58: the stratified sample is a pure function of doc_id (same
  *    rows across runs), realized rates sit near the per-stratum
  *    targets, and the plan is map-only (no exchange).
  *  - q49: recall is well-defined per query (exactly 5 rows, n_hit in
  *    [0,5], recall = n_hit/5) and its truth arm agrees with q50's
  *    declared top-10 prefix.
  */
class IncrementalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("q57 equals the plain exact anti-join (bloom is an accelerator, not an approximation)") {
    val d = graft.sources.Tables.documents(spark, dir)
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
      .select(md5(col("text").cast("binary")).as("digest"))
    val batch = d.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("digest"))
      .unionByName(d.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 1)
        .select((col("doc_id") + 200000).as("doc_id"),
          md5(col("text").cast("binary")).as("digest")))
    val plain = batch.join(corpus, Seq("digest"), "left_anti")
      .select(col("doc_id"), col("digest")).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = q("q57_bloom_incremental")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sameElements(plain), s"bloom path diverged: got ${got.length}, want ${plain.length}")
    // The re-crawl rows (shifted ids) must all be eliminated.
    assert(got.forall(_._1 < 200000), "a re-crawled corpus doc survived the membership check")
    assert(got.nonEmpty)
  }

  test("q57 confirm path broadcasts; the corpus is never shuffle-exchanged") {
    val plan = q("q57_bloom_incremental").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "corpus-sized shuffle join in the confirm path:\n" + plan.take(800))
  }

  test("q58 is deterministic, honors per-stratum rates, and is map-only") {
    val a = q("q58_stratified_sample").collect().map(_.getLong(0))
    val b = q("q58_stratified_sample").collect().map(_.getLong(0))
    assert(a.sameElements(b), "sample membership must be reproducible")
    val d = graft.sources.Tables.documents(spark, dir)
    val totals = d.groupBy(col("lang") === "en").count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val sampled = q("q58_stratified_sample").groupBy(col("lang") === "en").count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val enRate = sampled(true).toDouble / totals(true)
    val restRate = sampled(false).toDouble / totals(false)
    // Binomial 99.9% bands at n≈218/282 around the 0.30/0.80 targets.
    assert(enRate > 0.18 && enRate < 0.42, s"en keep-rate $enRate vs target 0.30")
    assert(restRate > 0.70 && restRate < 0.90, s"non-en keep-rate $restRate vs target 0.80")
    val plan = q("q58_stratified_sample").queryExecution.executedPlan.toString
    // One exchange is allowed for the global ORDER BY; the sampling
    // itself must not add any (filter over the scan, nothing keyed).
    assert(!plan.contains("hashpartitioning"),
      "stratified sampling must not introduce a keyed shuffle:\n" + plan.take(800))
  }

  test("q49 recall rows are well-formed and its truth arm matches q50's top-5 prefix") {
    val rows = q("q49_ann_recall").collect()
    assert(rows.length == 5, s"one row per query id, got ${rows.length}")
    rows.foreach { r =>
      val nHit = r.getLong(1)
      assert(nHit >= 0 && nHit <= 5)
      assert(math.abs(r.getDouble(2) - nHit / 5.0) < 1e-9)
    }
    // q50 declares brute-force top-10 with the same tie-break; its
    // rnk<=5 prefix is q49's ground truth by construction.
    val q50Top5 = q("q50_knn_brute").filter(col("rnk") <= 5)
      .select(col("q_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q50Top5.size == 25, s"5 queries x 5 neighbors, got ${q50Top5.size}")
  }

  test("q59 probes the corpus against a broadcast eval set; flags match set intersection") {
    val plan = q("q59_decontaminate").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "corpus shingles must not shuffle into the probe join:\n" + plan.take(800))
    // Independent reference: collect the (tiny) eval shingle union and
    // intersect per training doc with array ops — no join at all.
    val d = graft.sources.Tables.documents(spark, dir)
    val sh5 = d.select(col("doc_id"),
      graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(col("text")), 5).as("sh"))
    val evalUnion = sh5.filter(graft.queries.EvalSet.isEval(col("doc_id")))
      .select(explode(col("sh")).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    val expected = sh5.filter(graft.queries.EvalSet.isTrain(col("doc_id")))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).count(evalUnion))
      .filter(_._2 > 0).toMap
    val got = q("q59_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expected, s"got $got want $expected")
    assert(got.nonEmpty, "the sf0.01 gate must exercise a non-empty contamination set")
  }

  test("q66 block-partitioned prefix sum equals the global-window definition") {
    val got = q("q66_sequence_pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Reference: the single unpartitioned window (fine at spec scale).
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("pack_id",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / 4096L).cast("long"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(ref))
    // Packing invariants: ids start at 0, never decrease, never skip.
    val packs = got.map(_._3)
    assert(packs.head == 0L)
    assert(packs.zip(packs.tail).forall { case (a, b) => b - a >= 0 && b - a <= 1 },
      "pack ids must be a non-decreasing, gap-free sequence in doc order")
    // The executed plan's window runs PARTITIONED (by block) — the
    // whole point of the two-phase sum is no single-task global window.
    val plan = q("q66_sequence_pack").queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(blk"),
      "window must be partitioned by blk:\n" + plan.take(800))
  }

  test("q100 budgetBefore ≡ the global ordered window on adversarial quality layouts") {
    val ss = spark
    import ss.implicits._
    val rng = new scala.util.Random(7)
    // The layouts that stress the range bucketing: all mass in ONE
    // bucket (equal quality — the within-bucket window carries
    // everything, correctness must hold even where the parallelism
    // argument doesn't), the {0.0, 1.0} boundary values (the clamped
    // 256→255 edge), a cluster of near-identical qualities straddling a
    // bucket boundary, and uniform random with gapped ids.
    val cases: Seq[Seq[(Long, Double, Long)]] = Seq(
      (1 to 300).map(i => (i * 7L, 0.5, (i % 17 + 1).toLong)),
      (1 to 300).map(i => (i * 3L, if (i % 2 == 0) 0.0 else 1.0, (i % 11 + 1).toLong)),
      (1 to 300).map(i => (i.toLong, 0.50390625 + (i % 5 - 2) * 1e-6, (i % 13 + 1).toLong)),
      Seq.tabulate(500)(i =>
        (rng.nextInt(1000000).toLong, math.rint(rng.nextDouble() * 1e6) / 1e6,
          rng.nextInt(50).toLong)).distinctBy(_._1)
    )
    for ((rows, ci) <- cases.zipWithIndex) {
      val df = rows.toDF("doc_id", "quality", "n_tokens")
      val got = TextAnalysis.budgetBefore(df)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val want = df
        .withColumn("tok_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("quality"), col("n_tokens"), col("tok_before"))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"case $ci diverged from the global-window definition")
    }
  }

  test("packTokens handles gapped/sparse ids and block-boundary budgets exactly") {
    val ss = spark
    import ss.implicits._
    // Ids straddle empty blocks (blockSz=4 → blocks 0,1,5,25 present,
    // 2-4 and 6-24 absent) and a doc spans a pack boundary.
    val rows = Seq((0L, 3L), (1L, 4L), (3L, 5L), (6L, 2L), (7L, 10L),
      (21L, 1L), (100L, 6L), (103L, 8L))
    val got = TextAnalysis.packTokens(rows.toDF("doc_id", "n_tokens"),
        budget = 8L, blockSz = 4L)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // Exclusive running sums: 0,3,7,12,14,24,25,31 → /8 floors.
    val expected = Seq(0L -> 0L, 1L -> 0L, 3L -> 0L, 6L -> 1L, 7L -> 1L,
      21L -> 3L, 100L -> 3L, 103L -> 3L)
    assert(got.toSeq == expected, s"got ${got.toSeq}")
  }

  test("packTokens equals the sequential cumsum on random sparse corpora (property)") {
    val ss = spark
    import ss.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 50 + rng.nextInt(150)
      val ids = Iterator.iterate(rng.nextInt(5).toLong)(_ + 1 + rng.nextInt(40))
        .take(n).toSeq
      val rows = ids.map(id => (id, 1L + rng.nextInt(500).toLong))
      val budget = 64L + rng.nextInt(4000)
      val blockSz = 1L + rng.nextInt(64)
      val got = TextAnalysis.packTokens(rows.toDF("doc_id", "n_tokens"), budget, blockSz)
        .orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(2)))
      var acc = 0L
      val want = rows.sortBy(_._1).map { case (id, t) =>
        val p = acc / budget; acc += t; (id, p)
      }
      assert(got.toSeq == want,
        s"trial $trial (budget=$budget blockSz=$blockSz): got ${got.take(8).toSeq}…")
    }
  }

  test("q44's result is independent of the block count (B is a pure scale dial)") {
    def run(blocks: Option[String]): Seq[(Long, Long, Double)] = {
      blocks match {
        case Some(b) => spark.conf.set("graft.similarity.blocks", b)
        case None => spark.conf.unset("graft.similarity.blocks")
      }
      try q("q44_embedding_neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      finally spark.conf.unset("graft.similarity.blocks")
    }
    val default = run(None)
    assert(default.nonEmpty)
    for (b <- Seq("3", "5", "16"))
      assert(run(Some(b)) == default, s"blocks=$b diverged from the default partitioning")
  }

  test("q69 equals the cross-set slice of the exact near-dup relation (recall 1.0 here)") {
    // q41 is the EXACT all-pairs Jaccard >= 0.5 relation (a_id < b_id).
    // Its mixed-parity slice re-keyed as (batch, corpus) is the ground
    // truth for q69; on this corpus the banding catches every pair, so
    // equality (not just subset) must hold.
    val exact = q("q41_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b, j) => if (a % 5 == 0) (a, b, j) else (b, a, j) }
      .sortBy(p => (p._1, p._2))
    val got = q("q69_neardup_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq == exact.toSeq,
      s"got ${got.length} pairs, exact slice has ${exact.length}")
    assert(got.nonEmpty, "the sf0.01 gate must exercise a non-empty cross-set pair set")
  }

  test("q99 curation invariants: no dups, no eval docs, no contamination, gap-free packs") {
    val out = q("q99_curation_pipeline").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    val ids = out.map(_._1).toSet
    // Not benchmark docs; above the quality floor.
    assert(out.forall(_._1 >= graft.queries.EvalSet.N))
    assert(out.forall(_._4 >= 15))
    // Survivors are exact-unique: no two share a text digest.
    val d = graft.sources.Tables.documents(spark, dir)
    val dups = d.filter(col("doc_id").isInCollection(ids))
      .groupBy(md5(col("text").cast("binary"))).count()
      .filter(col("count") > 1).count()
    assert(dups == 0, "two curated docs share a text digest")
    // No surviving near-dup pair: at most one member of any q41 pair.
    val pairSurvivors = q("q41_ngram_jaccard").collect()
      .count(r => ids.contains(r.getLong(0)) && ids.contains(r.getLong(1)))
    assert(pairSurvivors == 0, s"$pairSurvivors near-dup pairs fully survived curation")
    // No contaminated doc: q59's flag set is disjoint from the output.
    val contaminated = q("q59_decontaminate").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(contaminated).isEmpty)
    // Pack ids are non-decreasing and gap-free in doc order.
    val packs = out.sortBy(_._1).map(_._5)
    assert(packs.head == 0L)
    assert(packs.zip(packs.tail).forall { case (a, b) => b - a >= 0 && b - a <= 1 })
  }

  test("q67 shares sum to 1 and repeat factors invert the token shares") {
    val rows = q("q67_mix_weights").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 5, "one row per language")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4,
      s"shares must sum to ~1: ${rows.map(_._3).sum}")
    val total = rows.map(_._2).sum.toDouble
    rows.foreach { case (lang, tokens, share, repeat) =>
      assert(math.abs(share - tokens / total) < 1e-5)
      assert(math.abs(repeat * tokens - total / rows.length) < total * 1e-4,
        s"$lang: repeat_factor must equalize token mass")
    }
    // The dominant language needs down-weighting; minority langs up.
    val en = rows.find(_._1 == "en").get
    assert(en._4 < 1.0, s"en repeat factor ${en._4} must be < 1 (dominant)")
    assert(rows.filter(_._1 != "en").forall(_._4 > 1.0),
      "minority languages must up-weight")
  }
}
