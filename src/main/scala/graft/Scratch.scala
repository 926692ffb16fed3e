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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tally = new Profile.StageTally
    spark.sparkContext.addSparkListener(tally)
    def timed(label: String, iters: Int = 3)(f: => Unit): Unit = {
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        val (st, tk, rms, _, _) = tally.snapshotAndReset()
        println(f"[micro] $label%-34s iter=$i dt=$dt%7.3fs stages=$st tasks=$tk execRunMs=$rms")
      }
    }
    import org.apache.spark.sql.functions._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm shared state the way Bench's setup does.
    Seq(graft.pipeline.DetectionsTable).foreach { t =>
      t.ensure(spark, dir); t.seedSessionCaches(spark, dir)
    }

    // ── Q95: does the range-sort's sample pass re-execute the ray math,
    // and does a pre-sort localCheckpoint pay off?
    def q95Base() = {
      val det = graft.pipeline.Synthetic.detectionsCached(spark, dir)
        .withColumn("group_idx", (col("det_idx") - 1).cast("int"))
      graft.pipeline.StreetLevel.vertexRays(det,
          graft.pipeline.Synthetic.poses(spark, dir), spacing = 2,
          inputIsBestPerGroup = true)
        .select(col("file_name"), col("group_idx"), col("v_idx"),
          round(col("rx") - col("ox"), 6).as("dx"),
          round(col("ry") - col("oy"), 6).as("dy"),
          round(col("rz") - col("oz"), 6).as("dz"))
    }
    timed("q95 base (sort)") { noop(q95Base().orderBy(col("file_name"), col("group_idx"), col("v_idx"))) }
    timed("q95 ckpt (sort)") {
      val pre = q95Base().localCheckpoint(false)
      noop(pre.orderBy(col("file_name"), col("group_idx"), col("v_idx")))
    }
    timed("q95 base (sort)") { noop(q95Base().orderBy(col("file_name"), col("group_idx"), col("v_idx"))) }
    timed("q95 nosort") { noop(q95Base()) }

    // ── Q17: broadcast (current) vs shuffle strategies for the 600k-row
    // self-join.
    def li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    def q17Of(right: org.apache.spark.sql.DataFrame) = {
      val a = li.as("a"); val bb = right.as("b")
      a.join(bb, col("a.l_orderkey") === col("b.l_orderkey")
          && col("a.l_linenumber") < col("b.l_linenumber")
          && abs(col("a.l_extendedprice") - col("b.l_extendedprice")) < 1000.0)
        .groupBy(col("a.l_orderkey")).agg(count(lit(1)).as("n_close_pairs"))
        .orderBy(col("a.l_orderkey"))
    }
    timed("q17 broadcast (current)") { noop(q17Of(li)) }
    timed("q17 shuffle_hash") { noop(q17Of(li.hint("shuffle_hash"))) }
    timed("q17 merge") { noop(q17Of(li.hint("merge"))) }
    timed("q17 broadcast (current)") { noop(q17Of(li)) }

    spark.stop()
  }
}
