package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NearestCells
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import graft.functions.{VectorFunctions => VF}
import graft.streaming.SegmentStore

/** The servable ANN ingest path (VERDICT r18 #1): appended vectors as
  * table-backed SEGMENTS next to the persisted [[AnnIndexTable]], the
  * IVF mirror of the streaming near-dup deduper's state machine
  * ([[graft.streaming.NearDupIngestDeduper]] / [[SegmentStore]] — same
  * commit discipline, crash rehydration, idempotent batchId retries,
  * supersede-after-commit).
  *
  * Flow per append batch (the q69-shaped map-only ingest,
  * [[AnnIngest.assignBatch]] made durable):
  *   1. assign each new vector to its nearest fine cell through the
  *      SERVING quantizer's anchors — anchors ride inside the
  *      expression (driver-held, ≤ 65536 rows), so the batch is the
  *      only distributed input: no corpus scan, no shuffle;
  *   2. commit (vec_id, embedding, nrm, cell) as a segment
  *      (`vecs/` subdir — the layout leaves room for sibling
  *      relations, and the base segment adds one: `anchors/`);
  *   3. serving reads base ∪ segments: base corpus rows assign
  *      map-side at query time (the q51/q54 shape — never persisted),
  *      segment rows read their PERSISTED cells (assigned once at
  *      ingest, exactly the inverted-list entry a real IVF append
  *      writes).
  *
  * Re-anchor tick ([[maybeReanchor]]): while the corpus (base +
  * appends) stays within [[AnnIngest.reanchorSlack]] of the quantizer's
  * K, appends serve on the stale anchors (recall floor measured by
  * AnnIngestSpec). Past it, the tick derives FRESH anchors over the
  * union, REASSIGNS every segment row under them, and folds all
  * segments into one base segment that carries the new anchors as its
  * `anchors/` relation — so a RESTARTED store rehydrates the exact
  * serving quantizer (anchors are state, not session memory). The base
  * corpus needs no rewrite: its rows assign at query time through
  * whatever anchors [[servingIndex]] currently holds. That is the
  * 100 TB shape — appends are map-only column writes, the re-anchor is
  * a scheduled rebuild amortized over the rows that forced it.
  *
  * Consistency invariant: segment-row cells are ALWAYS assignments
  * under the CURRENT serving anchors — batch commits assign under them,
  * and the re-anchor fold rewrites every retained row in the same
  * commit that makes the new anchors durable. A crash between the fold
  * commit and old-segment retirement leaves old + new segments whose
  * union duplicates rows; [[segments]] dedups exactly like the
  * near-dup reader (duplicates are harmless no-ops).
  *
  * NOT synchronized internally beyond the SegmentStore contract:
  * callers serialize access (the deduper convention).
  */
final class AnnIngestStore(
    spark: SparkSession,
    dir: String,
    statePath: Option[String] = None) extends Serializable {

  import AnnIngestStore.ServingState

  private[queries] val store = new SegmentStore(statePath)

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType),
    StructField("cell", LongType),
    // Quantizer epoch the cell was assigned under (VERDICT r18 #7) —
    // see [[servingState]]. Reads as null from pre-epoch segments,
    // which then count as stale (reassigned at serve time).
    StructField("base_fp", StringType)))
  private val anchorSchema = StructType(Seq(
    StructField("a_id", LongType),
    StructField("av", ArrayType(FloatType)),
    StructField("anrm", DoubleType),
    StructField("hrnk", IntegerType),
    StructField("corpus_n", LongType),
    // AnnIndexTable.sourceStamp at fold time: the base corpus these
    // anchors were derived against. Drift against the CURRENT stamp
    // means the base moved under the fold — the re-anchor tick fires.
    StructField("base_fp", StringType)))


  /** The serving quantizer: a re-anchored base segment's persisted
    * anchors when one exists (rehydrated on restart — newest base wins
    * by construction: compaction leaves exactly one), else the
    * committed [[AnnIndexTable]] / live derivation. `n` is the corpus
    * count the anchors were derived over (the K the slack policy
    * compares against).
    */
  def servingIndex(): Similarity.AnnIndex = servingState().idx

  private[queries] def servingState(): ServingState = synchronized {
    val folded = store.priorDirs(excluding = -1L)
      .map(d => new java.io.File(d, "anchors"))
      .filter(_.isDirectory) match {
      case Seq() => None
      case ds =>
        // At most one base segment holds anchors (compaction retires
        // predecessors); a crash window can briefly leave two — the
        // highest corpus_n is the latest derivation.
        val rows = spark.read.schema(anchorSchema)
          .parquet(ds.map(_.toString): _*).collect()
        if (rows.isEmpty) None
        else {
          val n = rows.map(_.getAs[Long]("corpus_n")).max
          val latest = rows.filter(_.getAs[Long]("corpus_n") == n)
            .sortBy(_.getAs[Int]("hrnk"))
          // Pre-epoch folds (no base_fp column) read null → "" — never
          // equal to a real stamp, so drift reads true and the next
          // re-anchor tick restamps everything.
          val foldFp = Option(latest.head.getAs[String]("base_fp")).getOrElse("")
          Some(ServingState(
            Similarity.AnnIndex(
              latest.map(r => (r.getAs[Long]("a_id"),
                r.getSeq[Float](r.fieldIndex("av")).toIndexedSeq,
                r.getAs[Double]("anrm"))).toSeq,
              n, Map.empty),
            epoch = s"fold:$n:$foldFp", baseFp = foldFp))
        }
    }
    folded.getOrElse {
      val fp = AnnIndexTable.sourceStamp(dir)
      ServingState(Similarity.annIndex(spark, dir), s"base:$fp", fp)
    }
  }

  /** Committed appended vectors (vec_id, embedding, nrm, cell), all
    * segments unioned, DEDUPED on vec_id (min cell is arbitrary-but-
    * deterministic; duplicates only exist inside the crash window the
    * class doc describes, where both copies carry identical rows).
    */
  def segments(): DataFrame = synchronized {
    val dirs = store.priorDirs(excluding = -1L).map(_ + "/vecs")
      .filter(d => new java.io.File(d).isDirectory)
    SegmentStore.readOrEmpty(spark, vecSchema, dirs).distinct()
  }

  /** Append one batch of (vec_id, embedding) — idempotent per batchId
    * (a retry supersedes its own earlier attempt, never double-serves).
    * Assignment is map-only through the current serving anchors.
    * Returns the committed segment's relation. Caller contract: vec_ids
    * are globally unique across base and batches (the near-dup doc_id
    * convention).
    */
  def append(batch: DataFrame, batchId: Long): DataFrame = synchronized {
    store.checkBatchId(batchId)
    val state = servingState()
    val assigned = batch
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .withColumn("nrm", VF.norm(col("embedding")))
      .withColumn("cell", element_at(
        NearestCells.column(col("embedding"), col("nrm"), state.idx.anchors, 1), 1))
      .withColumn("base_fp", lit(state.epoch))
    val seg = store.commitBatch(batchId) { tmp =>
      assigned.write.mode("overwrite").parquet(s"$tmp/vecs")
      // Chaos kill gate (rehearsal-only, never set by the driver): die
      // INSIDE the torn-commit window — vecs written, marker + rename
      // not yet done — the exact window tools/ann_chaos exercises.
      if (sys.env.get("SPARK_GRAFT_ANN_KILL").contains(s"pre:b$batchId"))
        Runtime.getRuntime.halt(137)
    }
    spark.read.schema(vecSchema).parquet(s"$seg/vecs")
  }

  def appendedCount(): Long = segments().count()

  /** Committed segments with their SERVE-TIME cells: a row stamped with
    * the serving epoch uses its persisted cell (the IVF fast path — the
    * inverted-list entry its ingest wrote); a row from ANOTHER epoch —
    * a rebuilt session whose base corpus moved since the assignment, or
    * a pre-epoch segment — reassigns map-only under the current serving
    * anchors, so no query ever routes by a cell that belongs to a
    * quantizer that is no longer the serving one (VERDICT r18 #7). The
    * reassignment is per-row arithmetic on the already-read embedding
    * (the same cost base rows pay at every query); [[maybeReanchor]]
    * fires on the same drift and restores the persisted-cell fast path
    * by restamping everything at the fold.
    */
  private[queries] def servedSegments(
      anchors: Seq[(Long, Seq[Float], Double)], epoch: String): DataFrame =
    segments()
      .withColumn("cell",
        when(col("base_fp") === lit(epoch), col("cell"))
          .otherwise(element_at(
            NearestCells.column(col("embedding"), col("nrm"), anchors, 1), 1)))
      .drop("base_fp")

  /** True when any durable state was stamped under a quantizer epoch
    * other than the serving one: folded anchors derived against a base
    * corpus that has since moved, or segment rows assigned under a
    * superseded quantizer. Serving stays correct through it
    * ([[servedSegments]] reassigns) — drift is the signal that the
    * persisted fast path is degraded and the re-anchor should fold.
    */
  private[queries] def epochDrift(): Boolean = synchronized {
    val state = servingState()
    if (state.baseFp != AnnIndexTable.sourceStamp(dir)) true
    else !segments()
      .filter(col("base_fp").isNull || col("base_fp") =!= lit(state.epoch))
      .isEmpty
  }

  /** Fire the re-anchor when base + appended rows have outgrown the
    * serving quantizer's K by [[AnnIngest.reanchorSlack]]; returns
    * whether it fired. The tick: fresh anchors over base ∪ segments,
    * every segment row reassigned under them, one base segment carrying
    * vecs + anchors committed BEFORE the old segments retire.
    */
  def maybeReanchor(): Boolean = synchronized {
    val idx = servingIndex()
    // idx.n counts whatever corpus the quantizer was DERIVED over (base
    // only for the table index; base + then-appended after a re-anchor)
    // — the slack compares the quantizer's K against the corpus NOW,
    // which is always base count + all currently-appended rows. Epoch
    // drift fires the tick even INSIDE the slack: a base corpus that
    // moved under committed segments leaves serving correct but on the
    // reassign-at-read slow path, and the quantizer derived over a
    // corpus that no longer exists — the fold below restamps both.
    val baseN = Similarity.corpusCount(spark, dir)
    val appended = appendedCount()
    if (!AnnIngest.needsReanchor(idx.k, baseN + appended) && !epochDrift()) false
    else {
      val base = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
          VF.norm(col("embedding")).as("nrm"))
      val union = base.unionByName(
        segments().select(col("vec_id"), col("embedding"), col("nrm")))
      val n = baseN + appended
      val k = Similarity.anchorKFor(n)
      val anchors = Similarity.collectAnchors(union, k)
      val s2 = spark; import s2.implicits._
      // The fold's stamps: anchors record the base corpus they were
      // derived against; vecs record the resulting quantizer epoch —
      // the exact strings servingState()/servedSegments compare, so a
      // completed fold always reads drift-free.
      val foldFp = AnnIndexTable.sourceStamp(dir)
      val anchorDf = anchors.zipWithIndex
        .map { case ((id, v, nr), i) => (id, v, nr, i + 1, n, foldFp) }
        .toDF("a_id", "av", "anrm", "hrnk", "corpus_n", "base_fp")
      store.compactExcept(None, force = true) { (olds, tmp) =>
        val oldVecs = SegmentStore.readOrEmpty(spark, vecSchema,
          olds.map(_ + "/vecs")
            .filter(d => new java.io.File(d).isDirectory))
          .distinct()
        oldVecs
          .drop("cell", "base_fp")
          .withColumn("cell", element_at(
            NearestCells.column(col("embedding"), col("nrm"), anchors, 1), 1))
          .withColumn("base_fp", lit(s"fold:$n:$foldFp"))
          .write.mode("overwrite").parquet(s"$tmp/vecs")
        anchorDf.write.mode("overwrite").parquet(s"$tmp/anchors")
      }
      true
    }
  }

  /** IVF top-k over the SERVED corpus (base ∪ segments) — the q54 shape:
    * base rows assign map-side at query time, segment rows read their
    * persisted cells, the tiny query batch broadcasts with its probe
    * cells exploded, and ranking ties break (cos DESC, vec_id ASC)
    * exactly like q50/q54 so a full-probe call is row-identical to
    * brute force over the union.
    *
    * @param queries (q_id, qv) — a driver-small query batch
    * @param k       neighbors per query
    * @param nprobe  probed cells; None = the operating point
    *                nprobeFor(K); Some(anchors.size) = full scan
    *                (the brute-force-equal mode the spec pins)
    */
  def topK(queries: DataFrame, k: Int = 5, nprobe: Option[Int] = None): DataFrame =
    synchronized {
    val state = servingState()
    val anchors = state.idx.anchors
    val p = math.min(nprobe.getOrElse(Similarity.nprobeFor(state.idx.k)), anchors.size)
    val base = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), VF.norm(col("embedding")).as("nrm"))
      .withColumn("cell", element_at(
        NearestCells.column(col("embedding"), col("nrm"), anchors, 1), 1))
    val corpus = base.unionByName(servedSegments(anchors, state.epoch))
    val q = queries
      .select(col("q_id").cast("long").as("q_id"), col("qv"))
      .withColumn("qn", VF.norm(col("qv")))
      .withColumn("qcell", explode(
        NearestCells.column(col("qv"), col("qn"), anchors, p)))
    val scored = corpus.join(broadcast(q),
        col("cell") === col("qcell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (VF.dot(col("qv"), col("embedding")) / (col("qn") * col("nrm"))).as("c"))
      // The compaction crash window (new base committed, old segments
      // not yet retired) can briefly serve a vector under BOTH its old
      // and new cell — identical bits, so the (q_id, neighbor_id, c)
      // rows are byte-equal and this distinct makes double-routing a
      // no-op (the near-dup reader's "duplicates are harmless" rule,
      // realized here at the scoring relation).
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("c").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("neighbor_id"), col("rnk").cast("long").as("rnk"),
        round(col("c"), 6).as("cos"))
      .orderBy(col("q_id"), col("rnk"))
  }

  def segmentCount: Int = synchronized(store.segmentCount)

  def close(): Unit = synchronized(store.close())
}

object AnnIngestStore {

  /** The serving quantizer plus the stamp chain VERDICT r18 #7 asks for:
    *
    *  - `epoch` names the quantizer segment cells are assigned under.
    *    Every committed segment row carries the epoch current at its
    *    assignment; `servedSegments` trusts a persisted cell ONLY when
    *    its epoch matches the serving one, else reassigns map-only. A
    *    REBUILT session over a changed base corpus (new AnnIndexTable
    *    fingerprint → new live quantizer) therefore cannot route by
    *    cells assigned under the quantizer that no longer serves.
    *  - `baseFp` is the base-corpus stamp the quantizer was DERIVED
    *    against ([[AnnIndexTable.sourceStamp]]): current by construction
    *    on the live path, frozen at fold time for folded anchors — so
    *    `baseFp != sourceStamp` detects a base corpus that moved under
    *    a folded quantizer, and `maybeReanchor` fires on it even
    *    inside the growth slack.
    */
  private[queries] final case class ServingState(
      idx: Similarity.AnnIndex, epoch: String, baseFp: String)
}
