package graft

/** Throwaway measurement experiments for the optimization round; never
  * run by the driver, deleted when the round's questions are answered.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val b = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // Optional conf overrides: SCRATCH_CONF="k=v;k=v" (core confs need
    // to land before getOrCreate).
    sys.env.get("SCRATCH_CONF").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new Profile.StageTally
    spark.sparkContext.addSparkListener(tally)
    def timed(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        val (st, tk, rms, _, _) = tally.snapshotAndReset()
        println(f"[micro] $label%-34s iter=$i dt=$dt%7.3fs stages=$st tasks=$tk execRunMs=$rms msPerTask=${if (tk > 0) rms.toDouble / tk else 0}%6.1f")
      }
    }
    import org.apache.spark.sql.functions._
    for (n <- Seq(3200L, 100000L, 1000000L, 10000000L)) {
      timed(s"agg-shuffle n=$n") {
        spark.range(0, n, 1, 32).groupBy((col("id") % 1000).as("k"))
          .count().write.format("noop").mode("overwrite").save()
      }
      timed(s"repartition n=$n") {
        spark.range(0, n, 1, 32).repartition(32)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
