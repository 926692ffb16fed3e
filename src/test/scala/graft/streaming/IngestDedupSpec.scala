package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ingest-dedup state machine: within-batch dedup, corpus
  * rejection, cross-batch rejection (both via the updated bloom and via
  * the exact accepted-state), and exactness under bloom false positives
  * — plus a real Structured Streaming foreachBatch drive.
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

  test("drives a real foreachBatch streaming query") {
    val ss = spark; import ss.implicits._
    val corpus = Seq("A").toDF("digest")
    val d = new IngestDeduper(corpus, expectedItems = 100)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    implicit val sc = ss.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "digest")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        results ++= d(df).collect().map(r => (r.getLong(0), r.getString(1)))
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
