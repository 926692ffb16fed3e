package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NearestCellsTwoLevel
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The two-level IVF routing kernel (q109) must reproduce the
  * declarative two-window formulation it replaces — fine→coarse routing
  * and both per-row ranking levels, including row_number tie-breaks —
  * on the REAL sf0.01 corpus with the real anchor derivation.
  */
class NearestCellsTwoLevelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("two-level cell assignment equals the declarative two-window ranking on sf0.01") {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.norm(col("embedding")).as("nrm"))
    // Same derivation as q109: anchors by min-hash rank, Kc = ceil(sqrt(K)).
    val hash = (col("vec_id") % 1000003L) * 2654435761L % 1000000007L
    val n = e.count()
    val k = math.max(64L, math.min(65536L,
      4L * math.floor(math.sqrt(n.toDouble)).toLong)).toInt
    val anchors = e.orderBy(hash, col("vec_id")).limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2))).toSeq
    val kc = math.ceil(math.sqrt(anchors.size.toDouble)).toInt

    val kernel = e.select(col("vec_id"),
        NearestCellsTwoLevel.column(col("embedding"), col("nrm"), anchors, kc).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // Declarative arm: coarse = first kc anchors by rank; route fine
    // anchors by windowed rank; route corpus rows coarse-then-fine.
    val s2 = spark; import s2.implicits._
    val aDf = anchors.zipWithIndex
      .map { case ((id, v, nr), i) => (id, v, nr, i + 1) }
      .toDF("a_id", "av", "anrm", "hrnk")
    val coarse = aDf.filter(col("hrnk") <= kc)
      .select(col("a_id").as("c_id"), col("av").as("cv"), col("anrm").as("cnrm"))
    def cos(v: org.apache.spark.sql.Column, nrm: org.apache.spark.sql.Column,
        av: org.apache.spark.sql.Column, anrm: org.apache.spark.sql.Column) =
      VectorFunctions.dot(v, av) / (nrm * anrm)
    val wf = Window.partitionBy(col("a_id"))
      .orderBy(cos(col("av"), col("anrm"), col("cv"), col("cnrm")).desc, col("c_id"))
    val froute = aDf.crossJoin(coarse)
      .withColumn("crnk", row_number().over(wf)).filter(col("crnk") === 1)
      .select(col("a_id"), col("av"), col("anrm"), col("c_id"))
    val presentCoarse = froute.select(col("c_id")).distinct()
      .join(coarse, "c_id")
    val w1 = Window.partitionBy(col("vec_id"))
      .orderBy(cos(col("embedding"), col("nrm"), col("cv"), col("cnrm")).desc, col("c_id"))
    val lvl1 = e.crossJoin(presentCoarse)
      .withColumn("crnk", row_number().over(w1)).filter(col("crnk") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"))
    val w2 = Window.partitionBy(col("vec_id"))
      .orderBy(cos(col("embedding"), col("nrm"), col("av"), col("anrm")).desc, col("a_id"))
    val declarative = lvl1.join(froute.withColumnRenamed("c_id", "fc"),
        col("fc") === col("c_id"))
      .withColumn("frnk", row_number().over(w2)).filter(col("frnk") === 1)
      .select(col("vec_id"), col("a_id").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(kernel.size == n && declarative.size == n)
    val diff = kernel.collect { case (id, c) if declarative(id) != c =>
      (id, c, declarative(id)) }
    assert(diff.isEmpty, s"two-level kernel diverges from the declarative " +
      s"ranking on ${diff.size} rows, e.g. ${diff.take(3)}")
  }

  test("ac=6 widened assignment + probeColumn equal the declarative multi-probe windows on sf0.01") {
    // The r17 operating point (VERDICT r16 #2): corpus rows assign
    // through their ac=6 nearest coarse cells; queries probe wc coarse
    // cells and keep the pf best fine cells in the union. Both kernels
    // must reproduce the declarative crnk<=ac / crnk<=wc / frnk<=pf
    // window formulation the oracle uses, tie-breaks included.
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.norm(col("embedding")).as("nrm"))
    val hash = (col("vec_id") % 1000003L) * 2654435761L % 1000000007L
    val n = e.count()
    val k = math.max(64L, math.min(65536L,
      4L * math.floor(math.sqrt(n.toDouble)).toLong)).toInt
    val anchors = e.orderBy(hash, col("vec_id")).limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2))).toSeq
    val kc = math.min(2L * math.ceil(math.sqrt(k.toDouble)).toLong, anchors.size.toLong).toInt
    val wc = ((2L * 2L * math.ceil(math.sqrt(k.toDouble)).toLong + 4L) / 5L).toInt
    val pf = (k + 63) / 64
    val ac = 6

    val kernel = e.select(col("vec_id"),
        NearestCellsTwoLevel.column(col("embedding"), col("nrm"), anchors, kc, ac).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val probeK = e.filter(col("vec_id") < 5).select(col("vec_id"),
        NearestCellsTwoLevel.probeColumn(col("embedding"), col("nrm"),
          anchors, kc, wc, pf).as("cells"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap

    val s2 = spark; import s2.implicits._
    val aDf = anchors.zipWithIndex
      .map { case ((id, v, nr), i) => (id, v, nr, i + 1) }
      .toDF("a_id", "av", "anrm", "hrnk")
    val coarse = aDf.filter(col("hrnk") <= kc)
      .select(col("a_id").as("c_id"), col("av").as("cv"), col("anrm").as("cnrm"))
    def cos(v: org.apache.spark.sql.Column, nrm: org.apache.spark.sql.Column,
        av: org.apache.spark.sql.Column, anrm: org.apache.spark.sql.Column) =
      VectorFunctions.dot(v, av) / (nrm * anrm)
    val wf = Window.partitionBy(col("a_id"))
      .orderBy(cos(col("av"), col("anrm"), col("cv"), col("cnrm")).desc, col("c_id"))
    val froute = aDf.crossJoin(coarse)
      .withColumn("crnk", row_number().over(wf)).filter(col("crnk") === 1)
      .select(col("a_id"), col("av"), col("anrm"), col("c_id"))
    val presentCoarse = froute.select(col("c_id")).distinct().join(coarse, "c_id")
    val w1 = Window.partitionBy(col("vec_id"))
      .orderBy(cos(col("embedding"), col("nrm"), col("cv"), col("cnrm")).desc, col("c_id"))
    val w2 = Window.partitionBy(col("vec_id"))
      .orderBy(cos(col("embedding"), col("nrm"), col("av"), col("anrm")).desc, col("a_id"))
    // Declarative assignment: union of the ac nearest coarse cells.
    val lvl1 = e.crossJoin(presentCoarse)
      .withColumn("crnk", row_number().over(w1)).filter(col("crnk") <= ac)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"))
    val declarative = lvl1.join(froute.withColumnRenamed("c_id", "fc"),
        col("fc") === col("c_id"))
      .withColumn("frnk", row_number().over(w2)).filter(col("frnk") === 1)
      .select(col("vec_id"), col("a_id").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kernel.size == n && declarative.size == n)
    val diff = kernel.collect { case (id, c) if declarative(id) != c => (id, c, declarative(id)) }
    assert(diff.isEmpty, s"ac=$ac kernel diverges on ${diff.size} rows, e.g. ${diff.take(3)}")

    // Declarative probe: wc coarse cells, pf best fine in the union,
    // kept in rank order.
    val qprobe = e.filter(col("vec_id") < 5).crossJoin(presentCoarse)
      .withColumn("crnk", row_number().over(w1)).filter(col("crnk") <= wc)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"))
    val fprobe = qprobe.join(froute.withColumnRenamed("c_id", "fc"),
        col("fc") === col("c_id"))
      .withColumn("frnk", row_number().over(w2)).filter(col("frnk") <= pf)
      .select(col("vec_id"), col("a_id"), col("frnk"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    assert(probeK.keySet == fprobe.keySet)
    val pdiff = probeK.collect { case (id, cs) if fprobe(id) != cs => (id, cs, fprobe(id)) }
    assert(pdiff.isEmpty, s"probe kernel diverges on ${pdiff.size} queries, e.g. ${pdiff.take(2)}")
  }

  test("identical-vector twin anchors: empty coarse cells drop from level-1 routing (degenerate branch)") {
    val s2 = spark; import s2.implicits._
    // Anchors 10 and 20 are IDENTICAL vectors: both route (ties to the
    // lower coarse id) under coarse anchor 10, so coarse cell 20 owns
    // no fine anchors and must vanish from level-1 routing — without the
    // constructor's drop, a vector nearest to 20 would route into an
    // empty cell. Anchor 30 is far away on another axis.
    val anchors: Seq[(Long, Seq[Float], Double)] = Seq(
      (10L, Seq(1f, 0f, 0f), 1.0),
      (20L, Seq(1f, 0f, 0f), 1.0),
      (30L, Seq(0f, 0f, 1f), 1.0))
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 0.0f)), // nearest 10/20 family
      (2L, Seq(0.0f, 0.1f, 0.9f))  // nearest 30
    ).toDF("vec_id", "embedding")
      .withColumn("nrm", sqrt(VectorFunctions.dot(col("embedding"), col("embedding"))))
    // kc = 3: every anchor is coarse; cell 20 routes to 10 and empties.
    val got = df.select(col("vec_id"),
        NearestCellsTwoLevel.column(col("embedding"), col("nrm"), anchors, 3).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // Row 1: level-1 over {10, 30} (20 dropped) → 10; level-2 within
    // cell 10 = {10, 20} → tie on identical vectors → lower id 10.
    // Row 2: → coarse 30 → fine 30.
    assert(got == Map(1L -> 10L, 2L -> 30L), s"got $got")
  }

  test("zero-norm rows route deterministically instead of crashing (ADVICE r17 NaN fallback)") {
    val s2 = spark; import s2.implicits._
    // A zero-norm vector makes every cosine 0/0 = NaN: no strict-max
    // comparison fires, so pre-fix bestC stayed -1 and used(-1) threw.
    // The fallback routes through the first (lowest-id) cells.
    val anchors: Seq[(Long, Seq[Float], Double)] = Seq(
      (10L, Seq(1f, 0f, 0f), 1.0),
      (20L, Seq(0f, 1f, 0f), 1.0),
      (30L, Seq(0f, 0f, 1f), 1.0))
    val df = Seq(
      (1L, Seq(0f, 0f, 0f)),       // zero norm → all-NaN scores
      (2L, Seq(0.0f, 0.1f, 0.9f))  // healthy row, unaffected
    ).toDF("vec_id", "embedding")
      .withColumn("nrm", sqrt(VectorFunctions.dot(col("embedding"), col("embedding"))))
    val got = df.select(col("vec_id"),
        NearestCellsTwoLevel.column(col("embedding"), col("nrm"), anchors, 3, 2).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // Zero row: coarse fallback = first unused cells, fine fallback =
    // lowest fine id scanned → 10. Healthy row still routes to 30.
    assert(got == Map(1L -> 10L, 2L -> 30L), s"got $got")
    val probed = df.select(col("vec_id"),
        NearestCellsTwoLevel.probeColumn(col("embedding"), col("nrm"),
          anchors, 3, 2, 2).as("cells"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    // Zero row probes the first two cells in array order — stable, no throw.
    assert(probed(1L) == Seq(10L, 20L), s"got ${probed(1L)}")
    assert(probed(2L).head == 30L, s"got ${probed(2L)}")
  }

  test("nf=2 multi-assignment equals the declarative frnk<=2 window on sf0.01 (q111's r19 dial (a))") {
    // The promoted beyond-cap operating point multi-assigns each corpus
    // row to its TOP-2 fine cells in the ac-coarse union (rank order).
    // The kernel must reproduce the declarative frnk<=2 formulation the
    // q111 oracle uses, tie-breaks included, and its rank-1 cell must
    // equal the single-assign kernel's cell on every row.
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.norm(col("embedding")).as("nrm"))
    val hash = (col("vec_id") % 1000003L) * 2654435761L % 1000000007L
    val n = e.count()
    val k = math.max(64L, math.min(65536L,
      4L * math.floor(math.sqrt(n.toDouble)).toLong)).toInt
    val anchors = e.orderBy(hash, col("vec_id")).limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2))).toSeq
    val kc = math.min(2L * math.ceil(math.sqrt(k.toDouble)).toLong, anchors.size.toLong).toInt
    val ac = 6

    val multi = e.select(col("vec_id"),
        NearestCellsTwoLevel.column(col("embedding"), col("nrm"), anchors, kc, ac,
          nf = 2).as("cells"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val single = e.select(col("vec_id"),
        NearestCellsTwoLevel.column(col("embedding"), col("nrm"), anchors, kc, ac).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val s2 = spark; import s2.implicits._
    val aDf = anchors.zipWithIndex
      .map { case ((id, v, nr), i) => (id, v, nr, i + 1) }
      .toDF("a_id", "av", "anrm", "hrnk")
    val coarse = aDf.filter(col("hrnk") <= kc)
      .select(col("a_id").as("c_id"), col("av").as("cv"), col("anrm").as("cnrm"))
    def cos(v: org.apache.spark.sql.Column, nrm: org.apache.spark.sql.Column,
        av: org.apache.spark.sql.Column, anrm: org.apache.spark.sql.Column) =
      VectorFunctions.dot(v, av) / (nrm * anrm)
    val wf = Window.partitionBy(col("a_id"))
      .orderBy(cos(col("av"), col("anrm"), col("cv"), col("cnrm")).desc, col("c_id"))
    val froute = aDf.crossJoin(coarse)
      .withColumn("crnk", row_number().over(wf)).filter(col("crnk") === 1)
      .select(col("a_id"), col("av"), col("anrm"), col("c_id"))
    val presentCoarse = froute.select(col("c_id")).distinct().join(coarse, "c_id")
    val w1 = Window.partitionBy(col("vec_id"))
      .orderBy(cos(col("embedding"), col("nrm"), col("cv"), col("cnrm")).desc, col("c_id"))
    val w2 = Window.partitionBy(col("vec_id"))
      .orderBy(cos(col("embedding"), col("nrm"), col("av"), col("anrm")).desc, col("a_id"))
    val lvl1 = e.crossJoin(presentCoarse)
      .withColumn("crnk", row_number().over(w1)).filter(col("crnk") <= ac)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"))
    val declarative = lvl1.join(froute.withColumnRenamed("c_id", "fc"),
        col("fc") === col("c_id"))
      .withColumn("frnk", row_number().over(w2)).filter(col("frnk") <= 2)
      .select(col("vec_id"), col("a_id"), col("frnk"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap

    assert(multi.size == n && declarative.size == n)
    val diff = multi.collect { case (id, cs) if declarative(id) != cs =>
      (id, cs, declarative(id)) }
    assert(diff.isEmpty, s"nf=2 kernel diverges from the declarative frnk<=2 " +
      s"window on ${diff.size} rows, e.g. ${diff.take(3)}")
    val rankDiff = multi.collect { case (id, cs) if cs.head != single(id) => id }
    assert(rankDiff.isEmpty,
      s"nf=2 rank-1 cell diverges from single-assign on ${rankDiff.size} rows")
    assert(multi.values.forall(_.length == 2),
      "every sf0.01 row has >=2 fine anchors in its ac-union")
  }

  test("nf=2 zero-norm rows fall back to the first two candidates deterministically") {
    val s2 = spark; import s2.implicits._
    val anchors: Seq[(Long, Seq[Float], Double)] = Seq(
      (10L, Seq(1f, 0f, 0f), 1.0),
      (20L, Seq(0f, 1f, 0f), 1.0),
      (30L, Seq(0f, 0f, 1f), 1.0))
    val df = Seq(
      (1L, Seq(0f, 0f, 0f)),       // zero norm → all-NaN scores
      (2L, Seq(0.0f, 0.1f, 0.9f))  // healthy row
    ).toDF("vec_id", "embedding")
      .withColumn("nrm", sqrt(VectorFunctions.dot(col("embedding"), col("embedding"))))
    val got = df.select(col("vec_id"),
        NearestCellsTwoLevel.column(col("embedding"), col("nrm"), anchors, 3, 2,
          nf = 2).as("cells"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    // Zero row: first-unused fallback at both levels → candidates in
    // pick order (cells 10, 20), take the first two.
    assert(got(1L) == Seq(10L, 20L), s"got ${got(1L)}")
    // Healthy row: best fine 30, runner-up 20 (0.1 on the y axis).
    assert(got(2L) == Seq(30L, 20L), s"got ${got(2L)}")
  }

  test("kernel assignment is identical on the interpreted (NO_CODEGEN) path") {
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.norm(col("embedding")).as("nrm"))
    val hash = (col("vec_id") % 1000003L) * 2654435761L % 1000000007L
    val anchors = e.orderBy(hash, col("vec_id")).limit(88).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2))).toSeq
    def run(): Map[Long, Long] =
      e.select(col("vec_id"),
          NearestCellsTwoLevel.column(col("embedding"), col("nrm"), anchors, 10).as("cell"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val gen = run()
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == gen, "interpreted path diverges from codegen")
    finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
