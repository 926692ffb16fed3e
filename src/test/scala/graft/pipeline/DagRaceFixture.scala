package graft.pipeline

import org.apache.spark.sql.functions._

/** Shared fixture for the CROSS-PROCESS incremental backfill race
  * (VERDICT r15 #6): one incremental stage over an external partitioned
  * corpus, identical in the parent test JVM and the forked child JVM so
  * both race the SAME delta protocol over one workDir. The child's build
  * drops a `building` marker and then sleeps, widening the window in
  * which the parent mutates day-1 and runs its own tick — the
  * adversarial ordering r13's whole-stage race never exercised.
  */
object DagRaceFixture {

  /** @param sleepMs build-side stall AFTER the marker drops (child arm);
    *                0 in the parent.
    * @param marker  file touched at build start, or empty for none.
    */
  def stages(evDir: String, sleepMs: Long, marker: String): Seq[Dag.Stage] = Seq(
    Dag.Stage("ing", Nil,
      (_, up) => {
        if (marker.nonEmpty)
          java.nio.file.Files.writeString(java.nio.file.Paths.get(marker), "building")
        if (sleepMs > 0) Thread.sleep(sleepMs)
        up("events").withColumn("v", col("id") * 2)
      },
      partitionBy = Seq("ds"), incrementalOn = Some("ds"),
      externalInputs = Map("events" -> evDir)))
}

/** Child-JVM entry for the race: one incremental tick over the shared
  * workDir with a stalled build. Exit 0 on a clean tick, 1 on any
  * throw — the RACE contract is convergence-after-quiesce, not that
  * both racers win, so the parent tolerates either exit.
  */
object DagRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(evDir, workDir, sleepMs) = args.take(3)
    val spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rc =
      try {
        Dag.materialize(spark,
          DagRaceFixture.stages(evDir, sleepMs.toLong, s"$workDir/child.building"),
          workDir, refresh = false)
        println("CHILD_TICK_OK")
        0
      } catch { case e: Throwable =>
        println(s"CHILD_TICK_THREW: ${e.getClass.getSimpleName}: ${e.getMessage}")
        1
      }
    spark.stop()
    sys.exit(rc)
  }
}
