package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction so Verify, Bench, and tests agree on
  * the config that affects correctness and local performance.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder = {
    // Master override (r13 multi-JVM rehearsal, VERDICT r12 next-round
    // #1): `SPARK_GRAFT_MASTER=local-cluster[W,C,MB]` forks a real
    // standalone Worker per W and real executor JVMs, so task/broadcast
    // serialization of the native expressions, executor-side
    // classloading, closure transport of the UDF kernels, and netty
    // cross-process shuffle ALL actually execute — `local[*]` exercises
    // none of them by construction (everything stays in the driver
    // process). Unset (the driver's case) this is byte-identical to the
    // old local[cpus] session.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = SparkSession.builder()
      .master(master)
      // graft SQL surface: vector_dot, cylindrical_iou, … available to
      // spark.sql() callers (see org.apache.spark.sql.graft.GraftExtensions).
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Default 64 MB advisory lets AQE coalesce small-but-CPU-heavy
      // shuffles (greedy-grouping kernels, pair joins over few-MB inputs)
      // down to one task. 1 MB keeps those parallel; large scans still
      // coalesce sanely at harness scale.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      // testdata events.ts is parquet TIMESTAMP(NANOS); Spark 4 otherwise
      // refuses the file (PARQUET_TYPE_ILLEGAL). Tables.events converts
      // the long back to TimestampType.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // r19 (guide §2.2 per-block overhead): below this reducer count
      // Spark's bypass-merge shuffle writer opens ONE FILE PER REDUCER
      // per map task (32 reducers × 32 map tasks = 1024 file
      // creates/commits per tiny exchange) — profiled here at
      // ~50-170 ms of executor time per map task on KB-sized shuffles,
      // i.e. the dominant fixed cost of every small exchange in the
      // sweep. Threshold 1 selects the serialized (Unsafe) writer — one
      // spill file + index per task regardless of reducer count —
      // measured 2-4× cheaper per task on the micro and no slower on
      // MB-sized shuffles. SCALE-NEUTRAL: any shuffle with > 200
      // reducers (every production-sized exchange) already takes the
      // serialized path; this only changes the small-reducer-count
      // regime the local harness lives in. Env override restores the
      // Spark default for A/B.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE", "1"))
      // r20 (guide §1.2 per-task work / §7.2): the driver's generated-code
      // cache (CodeGenerator.cache) holds 100 entries by default; a
      // 111-query sweep creates several hundred distinct codegen
      // fragments, so by the time sweep 2 re-plans a query its fragments
      // have been evicted and every WholeStageCodegen unit pays Janino
      // compilation AGAIN — and, because compilation produces a fresh
      // class, the JVM also re-pays C2 JIT warm-up on code it already
      // optimized. Profiled here: per-query warm-vs-cold deltas of
      // 0.2-0.8 s (q06 1.49 cold / 0.71 warm, q101 1.19 / 0.42) with
      // identical plans and shuffle bytes. 4096 entries keeps every
      // fragment of the whole declared-query suite resident (~900
      // needed), so repeated plans — the production serving shape as
      // much as the bench's sweep 2 — reuse both the compiled class and
      // its JIT state. Memory cost is bounded (generated classes are
      // KB-sized; the cache is size-, not byte-bounded, and 4096 is two
      // decades under any heap concern). Env override restores the Spark
      // default for A/B.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      // Cached blocks that overflow the storage pool hit local disk
      // UNCOMPRESSED by default; the corpus-sized shared caches
      // (tokenArrays, shingleSets, srpsig) overflow by design one decade
      // above whatever fits memory, and the decade-4 probe measured the
      // raw spill at ~5x the parquet input (q78's token-array build
      // filled a 35 GB scratch disk that the compressed form fits
      // easily). Compressing disk-stored blocks through the io codec is
      // the production default for cache-heavy corpora; in-memory-only
      // runs (every gate SF) never hit this path.
      .config("spark.rdd.compress", "true")
    if (master.startsWith("local-cluster")) {
      // Forked executors are fresh JVMs: they inherit the Spark dist
      // classpath via SPARK_HOME but NOT the sbt launch classpath — ship
      // the graft classes dir explicitly (same box, same path). Executor
      // heap defaults to 1g in standalone; size it to the worker grant.
      val classes = Sessions.getClass.getProtectionDomain.getCodeSource.getLocation.getPath
      // Executor heap defaults to the full worker grant (the third
      // local-cluster field, MiB) — one executor per worker, so asking
      // for less just wastes the grant and asking for more refuses to
      // start.
      val workerMb = "local-cluster\\[\\s*\\d+\\s*,\\s*\\d+\\s*,\\s*(\\d+)"
        .r.findFirstMatchIn(master).map(_.group(1)).getOrElse("4096")
      val b2 = b.config("spark.executor.extraClassPath", classes)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", s"${workerMb}m"))
      // Executor-JVM flag pass-through (r16 JIT slow-mode A/B,
      // VERDICT r15 #1): the worker-forked executor JVMs are where the
      // bimodal kernel mode lives, so the rehearsal arms need to vary
      // THEIR flags (code-cache, tiered-compilation, JFR), not the
      // driver's. Unset = byte-identical config to before.
      sys.env.get("SPARK_GRAFT_EXECUTOR_OPTS")
        .map(opts => b2.config("spark.executor.extraJavaOptions", opts))
        .getOrElse(b2)
    } else b
  }
}
