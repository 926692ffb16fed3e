package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ingest-dedup state machine: within-batch dedup, corpus
  * rejection, cross-batch rejection via the table-backed accepted state,
  * exactness under bloom false positives, bounded driver state over many
  * batches, and idempotent batch retries — plus a real Structured
  * Streaming foreachBatch drive.
  */
class IngestDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("per-batch semantics: corpus, cross-batch, and within-batch dups all rejected") {
    val ss = spark; import ss.implicits._
    val corpus = Seq("A", "B").toDF("digest")
    val d = new IngestDeduper(corpus, expectedItems = 100)
    try {
      val out1 = d(Seq((1L, "A"), (2L, "C"), (3L, "C"), (4L, "D")).toDF("doc_id", "digest"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(out1.toSeq == Seq((2L, "C"), (4L, "D")),
        s"batch1: corpus dup A and within-batch dup C(3) must drop; got ${out1.toSeq}")
      val out2 = d(Seq((5L, "C"), (6L, "E"), (7L, "B")).toDF("doc_id", "digest"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(out2.toSeq == Seq((6L, "E")),
        s"batch2: prior-batch dup C and corpus dup B must drop; got ${out2.toSeq}")
      // Re-offering everything accepted so far yields nothing.
      val out3 = d(Seq((8L, "C"), (9L, "D"), (10L, "E")).toDF("doc_id", "digest"))
      assert(out3.count() == 0)
    } finally d.close()
  }

  test("exact under adversarial fpp: a saturated bloom still yields the exact answer") {
    val ss = spark; import ss.implicits._
    // expectedItems=1 with 200 corpus digests drives the fpp toward 1 —
    // nearly every probe says "maybe" — yet the exact confirm keeps the
    // output identical to the plain anti-join.
    val corpus = (1 to 200).map(i => s"c$i").toDF("digest")
    val d = new IngestDeduper(corpus, expectedItems = 1)
    try {
      val batch = ((1 to 50).map(i => (i.toLong, s"c$i")) ++
        Seq((900L, "n1"), (901L, "n2"))).toDF("doc_id", "digest")
      val got = d(batch).collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(got.toSeq == Seq((900L, "n1"), (901L, "n2")), s"got ${got.toSeq}")
    } finally d.close()
  }

  test("null digests are dropped explicitly, never accepted or crashed on") {
    val ss = spark; import ss.implicits._
    val d = new IngestDeduper(Seq("A").toDF("digest"), expectedItems = 10)
    try {
      val batch = Seq((1L, Option("A")), (2L, Option.empty[String]), (3L, Option("B")))
        .toDF("doc_id", "digest")
      val got = d(batch).collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((3L, "B")), s"got ${got.toSeq}")
    } finally d.close()
  }

  test("many-batch run: exact vs a sequential model, driver state stays path-only") {
    val ss = spark; import ss.implicits._
    val corpus = (1 to 300).map(i => s"c$i").toDF("digest")
    val d = new IngestDeduper(corpus, expectedItems = 300)
    try {
      val rng = new scala.util.Random(41)
      val seen = scala.collection.mutable.HashSet.empty[String] // model state
      var nextId = 0L
      for (batchNo <- 1 to 12) {
        // Each batch mixes corpus dups, dups of earlier batches, fresh
        // digests, and within-batch dups.
        val rows = (1 to 60).map { _ =>
          nextId += 1
          val dg = rng.nextInt(4) match {
            case 0 => s"c${1 + rng.nextInt(300)}"        // corpus dup
            case 1 => s"s${1 + rng.nextInt(40)}"          // recurring stream digest
            case _ => s"b${batchNo}_${rng.nextInt(40)}"   // fresh-ish, within-batch dups
          }
          (nextId, dg)
        }
        val got = d(rows.toDF("doc_id", "digest"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        // Sequential model: first occurrence of a digest not in corpus
        // and not accepted before wins (min doc_id — ids are increasing).
        val want = rows.filter { case (_, dg) => !dg.startsWith("c") }
          .groupBy(_._2).map { case (dg, rs) => (rs.map(_._1).min, dg) }
          .filter { case (_, dg) => !seen.contains(dg) }
          .toSeq.sortBy(_._1)
        assert(got.toSeq == want, s"batch $batchNo")
        seen ++= want.map(_._2)
      }
      // Bounded driver state: one path string per batch, nothing
      // per-digest (the accepted table holds the digests).
      assert(d.retainedBatchCount == 12)
      // Compaction folds the 12 segments into one base segment with
      // identical rejection behavior afterwards.
      d.compact()
      assert(d.retainedBatchCount == 1)
      val reoffer = (1 to 30).map(i => (10000L + i, s"s$i")) // all accepted earlier
        .toDF("doc_id", "digest")
      assert(d(reoffer).count() == (1 to 30).count(i => !seen.contains(s"s$i")))
    } finally d.close()
  }

  test("auto-compaction bounds segment fan-out across a long run with state intact") {
    val ss = spark; import ss.implicits._
    val N = 3
    val d = new IngestDeduper(Seq("A").toDF("digest"), expectedItems = 10,
      autoCompactSegments = N)
    try {
      // 2N batches, one fresh digest each plus a dup of batch 1's digest
      // from batch 2 on — every batch exercises cross-batch rejection
      // across the compaction boundary.
      for (b <- 1 to 2 * N) {
        val rows = Seq((b.toLong, s"g$b")) ++ (if (b > 1) Seq((100L + b, "g1")) else Nil)
        val got = d(rows.toDF("doc_id", "digest"), b.toLong)
          .collect().map(_.getString(1)).toSeq
        assert(got == Seq(s"g$b"),
          s"batch $b: fresh digest accepted, compacted-away g1 still rejected; got $got")
        assert(d.retainedBatchCount <= N + 1,
          s"batch $b: segment count ${d.retainedBatchCount} exceeds N+1=${N + 1}")
      }
      // Every digest ever accepted still rejects after multiple folds.
      val reoffer = (1 to 2 * N).map(i => (1000L + i, s"g$i")).toDF("doc_id", "digest")
      assert(d(reoffer, (2 * N + 1).toLong).count() == 0)
      // The just-committed batch's relation survives its own
      // auto-compaction (it is excluded from the fold).
      val out = d(Seq((5000L, "fresh")).toDF("doc_id", "digest"), (2 * N + 2).toLong)
      assert(out.collect().map(_.getString(1)).toSeq == Seq("fresh"))
    } finally d.close()
  }

  test("restart after auto-compaction rehydrates base + batch segments with state intact") {
    val ss = spark; import ss.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("ingest-ac-restart").toString
    val d1 = new IngestDeduper(Seq("A").toDF("digest"), expectedItems = 10,
      statePath = Some(statePath), autoCompactSegments = 2)
    try {
      // Four batches with threshold 2: state on disk ends as a compacted
      // base segment plus the last batch's own segment.
      for (b <- 1 to 4)
        assert(d1(Seq((b.toLong, s"h$b")).toDF("doc_id", "digest"), b.toLong).count() == 1)
      assert(d1.retainedBatchCount <= 3)
    } finally d1.close()
    // Driver restart over the same path: everything accepted before —
    // whether folded into the base or still in a batch segment — must
    // keep rejecting, and the auto-id high-water must not reset (a
    // fresh auto-id batch would otherwise supersede an existing one).
    val d2 = new IngestDeduper(Seq("A").toDF("digest"), expectedItems = 10,
      statePath = Some(statePath), autoCompactSegments = 2)
    try {
      val got = d2((1 to 4).map(i => (100L + i, s"h$i")).toDF("doc_id", "digest"))
        .collect()
      assert(got.isEmpty, s"all pre-restart digests must reject; got ${got.toSeq}")
      assert(d2(Seq((200L, "fresh")).toDF("doc_id", "digest"))
        .collect().map(_.getString(1)).toSeq == Seq("fresh"))
    } finally {
      d2.close()
      graft.Fs.rmTree(new java.io.File(statePath))
    }
  }

  test("explicit batchId is idempotent: a retried batch reproduces its output") {
    val ss = spark; import ss.implicits._
    val d = new IngestDeduper(Seq("A").toDF("digest"), expectedItems = 10)
    try {
      val b0 = Seq((1L, "A"), (2L, "X")).toDF("doc_id", "digest")
      assert(d(b0, 0L).collect().map(_.getString(1)).toSeq == Seq("X"))
      // Retry of batch 0 after its state write must NOT self-reject X.
      assert(d(b0, 0L).collect().map(_.getString(1)).toSeq == Seq("X"))
      // And the next batch still rejects X exactly once.
      assert(d(Seq((3L, "X"), (4L, "Y")).toDF("doc_id", "digest"), 1L)
        .collect().map(_.getString(1)).toSeq == Seq("Y"))
    } finally d.close()
  }

  test("restart over a caller-provided statePath rehydrates accepted state") {
    val ss = spark; import ss.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("ingest-restart").toString
    val corpus = Seq("A").toDF("digest")
    val d1 = new IngestDeduper(corpus, expectedItems = 10, statePath = Some(statePath))
    try {
      assert(d1(Seq((1L, "X"), (2L, "Y")).toDF("doc_id", "digest"), 0L).count() == 2)
      assert(d1(Seq((3L, "Z")).toDF("doc_id", "digest"), 1L).count() == 1)
    } finally d1.close() // caller-provided path survives close
    // Simulated driver restart: a fresh deduper over the same path must
    // keep rejecting everything accepted before it.
    val d2 = new IngestDeduper(corpus, expectedItems = 10, statePath = Some(statePath))
    try {
      val got = d2(Seq((4L, "X"), (5L, "Z"), (6L, "W"), (7L, "A")).toDF("doc_id", "digest"), 2L)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((6L, "W")), s"got ${got.toSeq}")
    } finally {
      d2.close()
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(statePath))
    }
  }

  test("rehydration sweeps orphan tmps, ignores uncommitted dirs, stamps legacy segments") {
    val ss = spark; import ss.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("ingest-orphan").toString
    val d1 = new IngestDeduper(Seq("A").toDF("digest"), expectedItems = 10,
      statePath = Some(statePath))
    try assert(d1(Seq((1L, "X")).toDF("doc_id", "digest"), 0L).count() == 1)
    finally d1.close()
    // A crash between the parquet write and the commit rename leaves a
    // t<seq>.tmp behind; by construction it is uncommitted state.
    val orphan = new java.io.File(statePath, "t9.tmp")
    orphan.mkdirs()
    java.nio.file.Files.writeString(orphan.toPath.resolve("part-0.parquet"), "junk")
    // A pattern-matching dir with NEITHER marker nor _SUCCESS is an
    // uncommitted write — never rehydrated.
    val torn = new java.io.File(statePath, "b6_60")
    torn.mkdirs()
    java.nio.file.Files.writeString(torn.toPath.resolve("part-0.parquet"), "junk")
    // A _SUCCESS-only dir matching our pattern is a LEGACY commit (the
    // pre-marker code produced exactly this): accepted once, stamped.
    val legacy = new java.io.File(statePath, "b5_50")
    legacy.mkdirs()
    java.nio.file.Files.writeString(legacy.toPath.resolve("_SUCCESS"), "")
    val d2 = new IngestDeduper(Seq("A").toDF("digest"), expectedItems = 10,
      statePath = Some(statePath))
    try {
      assert(!orphan.exists(), "orphaned tmp dirs are swept on rehydration")
      assert(d2.retainedBatchCount == 2, "real + legacy rehydrate; uncommitted ignored")
      assert(new java.io.File(legacy, "_graft_commit").exists(),
        "legacy segment stamped with our marker")
      // The real segment still rejects its digest after the sweep, and
      // the empty legacy segment contributes nothing.
      assert(d2(Seq((2L, "X"), (3L, "Q")).toDF("doc_id", "digest"), 1L)
        .collect().map(_.getString(1)).toSeq == Seq("Q"))
    } finally {
      d2.close()
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(statePath))
    }
  }

  test("duplicate segments on disk (crash between commit and cleanup) stay exact") {
    val ss = spark; import ss.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("ingest-dup-seg").toString
    val d1 = new IngestDeduper(Seq("A").toDF("digest"), expectedItems = 10,
      statePath = Some(statePath))
    try {
      assert(d1(Seq((1L, "X"), (2L, "Y")).toDF("doc_id", "digest"), 0L).count() == 2)
    } finally d1.close()
    // Simulate a crash that left BOTH the old and a superseding segment
    // behind: clone batch 0's committed segment under a fresh name so
    // its rows exist twice in the rehydrated prior state.
    val seg = new java.io.File(statePath).listFiles().filter(_.getName.startsWith("b")).head
    def cp(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) { dst.mkdirs(); src.listFiles().foreach(f => cp(f, new java.io.File(dst, f.getName))) }
      else java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    cp(seg, new java.io.File(statePath, "b7_99"))
    val d2 = new IngestDeduper(Seq("A").toDF("digest"), expectedItems = 10,
      statePath = Some(statePath))
    try {
      assert(d2.retainedBatchCount == 2, "both segments rehydrate")
      val got = d2(Seq((3L, "X"), (4L, "Z")).toDF("doc_id", "digest"), 8L)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((4L, "Z")), s"duplicated X must reject exactly once; got ${got.toSeq}")
      // Compaction folds the duplicated state away and stays exact.
      d2.compact()
      assert(d2.retainedBatchCount == 1)
      assert(d2(Seq((5L, "X"), (6L, "Z"), (7L, "W")).toDF("doc_id", "digest"), 9L)
        .collect().map(_.getString(1)).toSeq == Seq("W"))
    } finally {
      d2.close()
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(statePath))
    }
  }

  test("drives a real foreachBatch streaming query") {
    val ss = spark; import ss.implicits._
    val corpus = Seq("A").toDF("digest")
    val d = new IngestDeduper(corpus, expectedItems = 100)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    implicit val sc = ss.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "digest")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // Thread the stream's own batchId through — the idempotent
        // entry point is the correct foreachBatch wiring (a retried
        // micro-batch must reuse its id, not auto-increment).
        results ++= d(df, batchId).collect().map(r => (r.getLong(0), r.getString(1)))
        (): Unit
      }
      .start()
    try {
      mem.addData((1L, "A"), (2L, "X"))
      q.processAllAvailable()
      mem.addData((3L, "X"), (4L, "Y"))
      q.processAllAvailable()
      assert(results.sortBy(_._1).toSeq == Seq((2L, "X"), (4L, "Y")),
        s"got ${results.sortBy(_._1).toSeq}")
    } finally { q.stop(); d.close() }
  }
}
