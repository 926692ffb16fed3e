package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming near-dup state machine: corpus / cross-batch /
  * within-batch rejection over the shared MinHash-LSH family, the
  * one-round min-label within-batch policy, restart rehydration,
  * auto-compaction, and a real foreachBatch drive — plus a many-batch
  * model check against an independent Scala reimplementation of the
  * exact semantics (same hash constants, so band-collision behavior is
  * reproduced bit-for-bit, not approximated).
  */
class NearDupIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ── Independent model of the production semantics (plain Scala, no
  // Spark): the SAME constants as DedupFunctions/TextFunctions, so LSH
  // candidate behavior is reproduced exactly rather than approximated.
  private object Model {
    import graft.functions.DedupFunctions.{A, B, Bands, P, R}
    val Mod = 1000000007L

    def toks(text: String): Array[String] =
      text.toLowerCase.split("\\s+").filter(_.nonEmpty)

    def shingles(text: String): Set[String] = {
      val t = toks(text)
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }

    def polyHash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % Mod)

    def bandKeys(sh: Set[String]): Set[(Int, Long)] =
      if (sh.isEmpty) Set.empty
      else {
        val hs = sh.map(polyHash)
        val sig = (0 until A.size).map(i => hs.map(h => (h * A(i) + B(i)) % P).min)
        (0 until Bands).map(b => (b, sig(b * R) * P + sig(b * R + 1))).toSet
      }

    def jaccard(a: Set[String], b: Set[String]): Double = {
      val i = (a & b).size.toDouble
      i / (a.size + b.size - i)
    }
  }

  /** Reference run of one batch against model state; returns accepted
    * ids and folds them into `state` ((id, shingles, bandKeys) tuples).
    */
  private def modelBatch(
      batch: Seq[(Long, String)],
      corpus: Seq[(Long, Set[String], Set[(Int, Long)])],
      state: scala.collection.mutable.ArrayBuffer[(Long, Set[String], Set[(Int, Long)])],
      threshold: Double = 0.5): Seq[Long] = {
    val docs = batch.map { case (id, t) =>
      val sh = Model.shingles(t); (id, sh, Model.bandKeys(sh))
    }
    val accepted = docs.filter { case (id, sh, bk) =>
      def dups(c: Seq[(Long, Set[String], Set[(Int, Long)])]) =
        c.exists { case (_, csh, cbk) =>
          (bk & cbk).nonEmpty && Model.jaccard(sh, csh) >= threshold
        }
      val smaller = docs.filter(_._1 < id)
      !dups(corpus) && !dups(state.toSeq) && !dups(smaller)
    }
    state ++= accepted
    accepted.map(_._1)
  }

  /** (doc_id, text) corpus → the (doc_id, shingles) input relation, via
    * the production column functions.
    */
  private def corpusShingles(rows: Seq[(Long, String)]) = {
    val ss = spark; import ss.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("toks"), 3).as("shingles"))
  }

  // Distinct-token texts with exact shingle-overlap arithmetic: A has
  // tokens a1..a30; B replaces the last 6 (jac(A,B) = 22/34 ≈ 0.65);
  // C replaces B's first 6 (jac(B,C) ≈ 0.65, jac(A,C) = 16/40 = 0.4 —
  // a chain where C near-dups B but NOT A).
  private val tA = (1 to 30).map(i => s"a$i").mkString(" ")
  private val tB = ((1 to 24).map(i => s"a$i") ++ (25 to 30).map(i => s"b$i")).mkString(" ")
  private val tC = ((1 to 6).map(i => s"c$i") ++ (7 to 24).map(i => s"a$i") ++
    (25 to 30).map(i => s"b$i")).mkString(" ")
  private val tFresh1 = (1 to 30).map(i => s"f$i").mkString(" ")
  private val tFresh2 = (1 to 30).map(i => s"g$i").mkString(" ")

  test("corpus, cross-batch, and within-batch near-dups all rejected; short docs pass") {
    val ss = spark; import ss.implicits._
    val d = new NearDupIngestDeduper(corpusShingles(Seq((1L, tA))))
    try {
      // Sanity: the planted pairs land on the intended sides of 0.5.
      assert(Model.jaccard(Model.shingles(tA), Model.shingles(tB)) >= 0.5)
      assert(Model.jaccard(Model.shingles(tA), Model.shingles(tC)) < 0.5)
      val out1 = d(Seq(
        (10L, tA),          // exact corpus dup → rejected
        (11L, tFresh1),     // fresh → accepted
        (12L, tFresh1 + " tail1 tail2"), // within-batch near-dup of 11 → rejected
        (13L, "just two")   // < 3 tokens: no shingle identity → accepted
      ).toDF("doc_id", "text")).collect().map(_.getLong(0)).sorted
      assert(out1.toSeq == Seq(11L, 13L), s"got ${out1.toSeq}")
      val out2 = d(Seq(
        (20L, tFresh1),     // dup of batch-1-accepted 11 → rejected
        (21L, tB),          // near-dup of corpus doc → rejected
        (22L, tFresh2)      // fresh → accepted
      ).toDF("doc_id", "text")).collect().map(_.getLong(0)).sorted
      assert(out2.toSeq == Seq(22L), s"got ${out2.toSeq}")
    } finally d.close()
  }

  test("null texts drop explicitly; empty-shingle docs never become candidates") {
    val ss = spark; import ss.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("neardup-null").toString
    val d = new NearDupIngestDeduper(corpusShingles(Seq((1L, tA))),
      statePath = Some(statePath))
    try {
      val out = d(Seq((1L, Option("one two")), (2L, Option.empty[String]),
        (3L, Option("one two")), (4L, Option(tFresh1)))
        .toDF("doc_id", "text"), 0L).collect().map(_.getLong(0)).sorted
      // 1 and 3 are IDENTICAL two-token docs — but with no 3-shingles
      // they have no n-gram identity, so BOTH pass (exact dedup is the
      // digest deduper's job); the null row vanishes.
      assert(out.toSeq == Seq(1L, 3L, 4L), s"got ${out.toSeq}")
      // The state BAND INDEX carries no dead rows: empty-shingle docs
      // contribute nothing (null keys never join), so only doc 4's six
      // band rows persist for the next thousand batches to scan.
      val seg = new java.io.File(statePath).listFiles()
        .filter(_.getName.startsWith("b")).head
      val bands = spark.read.parquet(s"$seg/bands")
      assert(bands.filter(col("key").isNull).count() == 0)
      assert(bands.select("doc_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(4L))
    } finally {
      d.close()
      graft.Fs.rmTree(new java.io.File(statePath))
    }
  }

  test("within-batch chain collapses to the component head (one-round min-label)") {
    val ss = spark; import ss.implicits._
    val d = new NearDupIngestDeduper(corpusShingles(Seq((999L, tFresh2))))
    try {
      // C near-dups B (0.65) but not A (0.4): sequential greedy would
      // KEEP C (its only dup B was itself rejected); the one-round
      // min-label policy rejects any doc with a smaller verified
      // neighbor — B and C both drop, A survives, matching q55's
      // cluster-collapse-to-min semantics.
      assert(Model.jaccard(Model.shingles(tB), Model.shingles(tC)) >= 0.5)
      val out = d(Seq((1L, tA), (2L, tB), (3L, tC)).toDF("doc_id", "text"))
        .collect().map(_.getLong(0)).sorted
      assert(out.toSeq == Seq(1L), s"got ${out.toSeq}")
    } finally d.close()
  }

  test("many-batch run: exact vs the model, driver state stays path-only") {
    val ss = spark; import ss.implicits._
    val corpusRows = (1 to 20).map(i =>
      (i.toLong, (1 to 25).map(j => s"c${i}w$j").mkString(" ")))
    val corpusModel = corpusRows.map { case (id, t) =>
      val sh = Model.shingles(t); (id, sh, Model.bandKeys(sh))
    }
    val d = new NearDupIngestDeduper(corpusShingles(corpusRows))
    try {
      val rng = new scala.util.Random(43)
      val state = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Set[String], Set[(Int, Long)])]
      val streamTexts = scala.collection.mutable.ArrayBuffer.empty[String]
      var nextId = 100L
      for (batchNo <- 1 to 6) {
        val rows = (1 to 25).map { _ =>
          nextId += 1
          val t = rng.nextInt(5) match {
            case 0 => // corpus doc, mutated in 0–4 trailing tokens
              val (_, base) = corpusRows(rng.nextInt(corpusRows.size))
              mutate(base, rng)
            case 1 if streamTexts.nonEmpty => // earlier stream doc, mutated
              mutate(streamTexts(rng.nextInt(streamTexts.size)), rng)
            case _ => // fresh (recurring base pool → within-batch dups)
              val k = rng.nextInt(30)
              mutate((1 to 25).map(j => s"s${k}w$j").mkString(" "), rng)
          }
          streamTexts += t
          (nextId, t)
        }
        val got = d(rows.toDF("doc_id", "text"), batchNo.toLong)
          .collect().map(_.getLong(0)).sorted.toSeq
        val want = modelBatch(rows, corpusModel, state)
        assert(got == want.sorted, s"batch $batchNo: got $got want ${want.sorted}")
      }
      assert(d.retainedBatchCount == 6)
      d.compact()
      assert(d.retainedBatchCount == 1)
      // Post-compaction: rejection behavior unchanged — re-offer exact
      // copies of every text the model accepted (ids were assigned
      // 101, 102, … in streamTexts order); all must reject.
      val acceptedTexts = state.toSeq.map { case (id, _, _) =>
        streamTexts((id - 101L).toInt)
      }
      assert(acceptedTexts.nonEmpty)
      val re = d(acceptedTexts.zipWithIndex
        .map { case (t, i) => (20000L + i, t) }.toDF("doc_id", "text"), 7L)
      assert(re.count() == 0, "every previously-accepted text must reject on re-offer")
    } finally d.close()
  }

  /** Replace the trailing 0–4 tokens with run-specific ones: jaccard to
    * the base stays ≥ ~0.8 (a true near-dup), while distinct mutations
    * differ from each other only in the tail (also near-dups of each
    * other — exercising chains).
    */
  private def mutate(base: String, rng: scala.util.Random): String = {
    val t = base.split(" ")
    val k = rng.nextInt(5)
    (t.dropRight(k) ++ (1 to k).map(j => s"m${rng.nextInt(1000)}x$j")).mkString(" ")
  }

  test("restart over a caller-provided statePath rehydrates accepted state") {
    val ss = spark; import ss.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("neardup-restart").toString
    val corpus = corpusShingles(Seq((1L, tA)))
    val d1 = new NearDupIngestDeduper(corpus, statePath = Some(statePath))
    try {
      assert(d1(Seq((10L, tFresh1)).toDF("doc_id", "text"), 0L).count() == 1)
      assert(d1(Seq((11L, tFresh2)).toDF("doc_id", "text"), 1L).count() == 1)
    } finally d1.close()
    val d2 = new NearDupIngestDeduper(corpus, statePath = Some(statePath))
    try {
      // Near-dups (mutated copies) of pre-restart accepted docs reject;
      // corpus near-dups still reject; fresh passes.
      val out = d2(Seq(
        (20L, tFresh1 + " zz1 zz2"), (21L, tFresh2 + " zz3"),
        (22L, tB),
        (23L, (1 to 30).map(i => s"h$i").mkString(" "))
      ).toDF("doc_id", "text"), 2L).collect().map(_.getLong(0)).sorted
      assert(out.toSeq == Seq(23L), s"got ${out.toSeq}")
    } finally {
      d2.close()
      graft.Fs.rmTree(new java.io.File(statePath))
    }
  }

  test("auto-compaction bounds segment fan-out with rejection intact across folds") {
    val ss = spark; import ss.implicits._
    val N = 2
    val d = new NearDupIngestDeduper(corpusShingles(Seq((1L, tA))),
      autoCompactSegments = N)
    try {
      val texts = (1 to 2 * N + 1).map(b => (1 to 30).map(i => s"t${b}q$i").mkString(" "))
      for (b <- 1 to 2 * N + 1) {
        // One fresh doc per batch, plus (from batch 2 on) a near-dup of
        // batch 1's doc — cross-batch rejection across the fold.
        val rows = Seq((b.toLong, texts(b - 1))) ++
          (if (b > 1) Seq((100L + b, texts(0) + " tail")) else Nil)
        val got = d(rows.toDF("doc_id", "text"), b.toLong)
          .collect().map(_.getLong(0)).toSeq
        assert(got == Seq(b.toLong), s"batch $b: got $got")
        assert(d.retainedBatchCount <= N + 1,
          s"batch $b: ${d.retainedBatchCount} segments exceed N+1")
      }
    } finally d.close()
  }

  test("a pre-built corpus band index yields identical decisions") {
    val ss = spark; import ss.implicits._
    val corpus = corpusShingles(Seq((1L, tA), (2L, tFresh2)))
    // The production shape: the index is a persisted artifact (here a
    // parquet round-trip standing in for the bucketed table) handed to
    // the deduper instead of re-deriving signatures at construction.
    val idxDir = java.nio.file.Files.createTempDirectory("neardup-idx").toString
    graft.functions.DedupFunctions.bandRows(corpus)
      .write.mode("overwrite").parquet(idxDir)
    val derived = new NearDupIngestDeduper(corpus)
    val prebuilt = new NearDupIngestDeduper(corpus,
      corpusBandIndex = Some(spark.read.parquet(idxDir)))
    try {
      val batch = Seq((10L, tB), (11L, tFresh1), (12L, tFresh2 + " pp1"))
        .toDF("doc_id", "text")
      val a = derived(batch, 0L).collect().map(_.getLong(0)).sorted.toSeq
      val b = prebuilt(batch, 0L).collect().map(_.getLong(0)).sorted.toSeq
      assert(a == b, s"derived=$a prebuilt=$b")
      assert(a == Seq(11L), s"corpus near-dups tB and tFresh2+' pp1' must reject; got $a")
    } finally {
      derived.close(); prebuilt.close()
      graft.Fs.rmTree(new java.io.File(idxDir))
    }
  }

  test("explicit batchId retry is idempotent") {
    val ss = spark; import ss.implicits._
    val d = new NearDupIngestDeduper(corpusShingles(Seq((1L, tA))))
    try {
      val b0 = Seq((10L, tFresh1)).toDF("doc_id", "text")
      assert(d(b0, 0L).collect().map(_.getLong(0)).toSeq == Seq(10L))
      // Retry of batch 0 must NOT self-reject against its own attempt.
      assert(d(b0, 0L).collect().map(_.getLong(0)).toSeq == Seq(10L))
      // The next batch still rejects the near-dup exactly once.
      assert(d(Seq((20L, tFresh1 + " x1"), (21L, tFresh2)).toDF("doc_id", "text"), 1L)
        .collect().map(_.getLong(0)).toSeq == Seq(21L))
    } finally d.close()
  }

  test("drives a real foreachBatch streaming query") {
    val ss = spark; import ss.implicits._
    val d = new NearDupIngestDeduper(corpusShingles(Seq((1L, tA))))
    val results = scala.collection.mutable.ArrayBuffer.empty[Long]
    implicit val sc = ss.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        results ++= d(df, batchId).collect().map(_.getLong(0))
        (): Unit
      }
      .start()
    try {
      mem.addData((10L, tB), (11L, tFresh1))
      q.processAllAvailable()
      mem.addData((20L, tFresh1 + " y1 y2"), (21L, tFresh2))
      q.processAllAvailable()
      assert(results.sorted.toSeq == Seq(11L, 21L), s"got ${results.sorted.toSeq}")
    } finally { q.stop(); d.close() }
  }
}
