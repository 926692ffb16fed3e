package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.{AccumulatorV2, LongAccumulator}

/** Skew diagnosability for the per-panorama sweep kernels (VERDICT r5 ask
  * #5). The greedy grouping and the pair/partner sweeps are bounded by
  * the per-GROUP box count: one pathological panorama whose boxes all
  * y-overlap makes a single task O(n²) in time and adjacency memory —
  * inherent to the order-dependent semantics, so it cannot be re-planned
  * away, only DIAGNOSED. At 100 TB an opaque straggler task is a
  * debugging session; these accumulators turn it into three numbers on
  * the driver (worst group size, total enumerated pairs, count of groups
  * over the threshold) plus an executor-side WARN naming the offending
  * group key.
  *
  * Threshold: `graft.sweep.denseGroupThreshold` (conf, default
  * [[SweepStats.DefaultDenseGroupThreshold]] boxes). At the default,
  * a fully-overlapping group costs ~2×10⁸ kernel calls (~minutes in one
  * task) — the point where a skewed input deserves a named warning
  * rather than a silent straggler. The harness detections average ~150
  * boxes per panorama; production inputs that trip this are either
  * upstream bugs (a degenerate file_name) or genuinely dense panoramas
  * that need pre-splitting.
  */
object SweepStats {

  val DefaultDenseGroupThreshold: Int = 20000
  val ThresholdConfKey = "graft.sweep.denseGroupThreshold"

  /** max-merge accumulator (LongAccumulator sums; we want the worst
    * single group across all tasks).
    */
  final class MaxAccumulator extends AccumulatorV2[Long, Long] {
    private var v = 0L
    override def isZero: Boolean = v == 0L
    override def copy(): MaxAccumulator = { val c = new MaxAccumulator; c.v = v; c }
    override def reset(): Unit = v = 0L
    override def add(x: Long): Unit = v = math.max(v, x)
    override def merge(o: AccumulatorV2[Long, Long]): Unit = v = math.max(v, o.value)
    override def value: Long = v
  }

  /** The serializable recorder kernels capture into their closures; the
    * accumulators inside are driver-registered and merge from executors.
    * Diagnostic, not transactional: stage retries can re-apply updates
    * (the standard Spark accumulator caveat) — fine for a skew signal,
    * never something correctness may read.
    */
  final class Handle private[SweepStats] (
      val maxGroupBoxes: MaxAccumulator,
      val pairsEnumerated: LongAccumulator,
      val denseGroups: LongAccumulator) extends Serializable {

    /** Called once per processed group, executor-side. */
    def record(groupKey: String, boxes: Int, pairs: Long, threshold: Int): Unit = {
      maxGroupBoxes.add(boxes.toLong)
      pairsEnumerated.add(pairs)
      if (boxes > threshold) {
        denseGroups.add(1L)
        org.slf4j.LoggerFactory.getLogger(classOf[Handle]).warn(
          s"dense sweep group '$groupKey': $boxes boxes (> $threshold), $pairs enumerated " +
            "pairs; one task pays this group's O(n^2) - consider pre-splitting the input")
      }
    }
  }

  private val handles =
    scala.collection.mutable.Map.empty[SparkSession, Handle]

  /** The per-session handle (accumulators registered on first use;
    * evicted when the owning context ends, mirroring SessionCache).
    */
  def forSession(spark: SparkSession): Handle = synchronized {
    handles.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          SweepStats.synchronized { handles.remove(spark): Unit }
      })
      val h = new Handle(new MaxAccumulator, new LongAccumulator, new LongAccumulator)
      spark.sparkContext.register(h.maxGroupBoxes, "graft.sweep.maxGroupBoxes")
      spark.sparkContext.register(h.pairsEnumerated, "graft.sweep.pairsEnumerated")
      spark.sparkContext.register(h.denseGroups, "graft.sweep.denseGroups")
      h
    })
  }

  /** Driver-side threshold read, resolved per kernel invocation so specs
    * (and operators) can tune it through the session conf.
    */
  def threshold(spark: SparkSession): Int =
    spark.conf.getOption(ThresholdConfKey).map(_.toInt)
      .getOrElse(DefaultDenseGroupThreshold)
}
