package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Central SparkSession factory.
  *
  * Every entry point (Verify, Bench, tests, interactive use) funnels through
  * here so the scale-relevant knobs are set once:
  *
  *   - `spark.sql.shuffle.partitions` = 32 — matches local[32]; on a real
  *     cluster this would be ~2-3x total cores (or left to AQE coalescing).
  *   - AQE on — runtime re-planning (skew-join splitting, partition
  *     coalescing) is the main defense when a 100 TB input has skewed keys.
  *   - UTC session timezone — the reference's `datetime.fromtimestamp` is
  *     local-time; we pin UTC (SURVEY §7.4) so results are host-independent.
  */
object GraftSession {

  /** Shuffle/spill scratch directory. Spark's default (`/tmp`) sits on the
    * sandbox's ext4 root disk; driver stack-sampling of a trivial 2-job
    * query showed the per-shuffle latency dominated by shuffle-block file
    * management (DiskBlockObjectWriter.initialize / copyFileStreamNIO /
    * writeMetadataFile — ~60% of RUNNABLE driver+executor samples), i.e.
    * ext4 metadata ops, not compute. Production deployments always point
    * `spark.local.dir` at the fastest local scratch (NVMe arrays); this
    * host's equivalent is tmpfs. Deployment-matched tuning, same class as
    * parallelPartitionDiscovery.threshold: override with
    * SPARK_GRAFT_LOCAL_DIR (or unset by pointing it at /tmp) for hosts
    * where shuffle working sets exceed RAM — at bench SF the whole
    * shuffle footprint is tens of MB against a 126 GiB tmpfs. */
  private def localDir: Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-spark-local") else None
    }

  def builder(master: String = "local[32]", app: String = "graft"): SparkSession.Builder = {
    val b0 = SparkSession
      .builder()
      .master(master)
      .appName(app)
    localDir.foreach(d => b0.config("spark.local.dir", d))
    b0
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark otherwise
      // rejects outright; see Tables.events for the lossless conversion.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate turns explode(expensive_expr) into a
      // pushed-down `size(expensive_expr) > 0` filter, re-evaluating the
      // full expression per input row (measured 70s vs 2s on the MinHash
      // pipeline, and it can never prune here — decoded packet maps and
      // shingle arrays are non-empty by construction). The rule only pays
      // off when a generator's input is often empty AND cheap.
      .config(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // The generated-class cache holds only 100 entries by default; a
      // battery of 140+ queries (each plan = several generated classes)
      // thrashes it, so a query's passes RE-janino-and-RE-JIT every
      // stage — measured as q_sparse_cosine swinging 2.2 → 14-44 s
      // in-battery with cpu_ratio ~25 and zero GC (C2 compiler threads,
      // not query work; cold-JVM profile of the same query decays
      // 13.5 → 7.4 → 3.0 s as compilation drains). A long-lived
      // production session serving many queries wants this high for the
      // same reason. (Spark 4's cache is capacity-evicted only — entries
      // are keyed on (weakref(classloader), source), NOT soft-referenced,
      // so heap pressure cannot silently shrink it; the other compiled-
      // code budget that DOES silently degrade is the JVM code cache —
      // see ReservedCodeCacheSize in build.sbt.)
      .config("spark.sql.codegen.cache.maxEntries", "3000")
      // Generated class names embed the codegen stage id by default
      // (GeneratedIteratorForCodegenStage<N>) — but under AQE the ids are
      // assigned in runtime stage-COMPLETION order, which is
      // nondeterministic, so the same physical stage can be named Stage1
      // on one execution and Stage2 on the next. The codegen cache keys
      // on source TEXT, so every renamed stage is a fresh janino compile
      // + C2 JIT: measured 50 recompiles on pass 2 of a single solo
      // q_mad_outliers run (r10 battery: 484 timed-pass recompiles across
      // 47 queries, with the C2 churn bleeding into neighbors' numbers —
      // the r10 "battery-scale pressure" regressions). With the id kept
      // in a comment instead (comments are excluded from cache-key
      // equality), re-executions hit the cache, and structurally
      // identical stages across DIFFERENT queries dedupe too — the same
      // reason a long-lived production session serving a query workload
      // wants this off. Measured (CodegenAudit, q_mad_outliers solo,
      // cold/warm/warm): 189/50/2 compiles → 85/0/0 — warm passes fully
      // cache-hit, and the COLD pass halves because structurally
      // identical stages now dedupe across the query too. Debuggability
      // cost is nil (the id still prints in the comment header and in
      // explain output).
      .config("spark.sql.codegen.useIdInClassName", "false")
      // Partition discovery above 32 dirs defaults to a DISTRIBUTED
      // listing job with one task per directory — the right call against
      // an object store (each LIST is a ~50 ms network round trip), but
      // on a local filesystem each listing is a ~20 µs syscall and the
      // job is pure scheduler overhead: the 2,499-day small-files
      // fixture cost a 2,499-task, 3.5 s listing job per q_compaction_exec
      // pass (53% of the gate; measured with CompactionProfile's
      // per-job listener) where the driver lists the same tree in well
      // under a second. Deployment-matched tuning, same class as
      // shuffle.partitions=32: a cluster reading S3/ABFS keeps the
      // default 32.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      // Use the sort-based (serialized) shuffle writer at EVERY reducer
      // count, not only above the 200-reducer bypass threshold. The
      // bypass-merge writer opens one spill file PER REDUCER per map task
      // (32 reducers × 32 maps = 1024 file creates + 1024 32 KB write
      // buffers ≈ 32 MB zeroed per shuffle) — measured 448 → 191 ms on a
      // 1M-row groupBy noop and 534 → 174 ms on its 2-shuffle form, i.e.
      // ~250 ms of pure map-side file-management latency per shuffle at
      // bench scale. A 100 TB cluster never runs the bypass writer (every
      // real shuffle has > 200 reducers), so forcing the sort writer
      // locally makes the measured plan the SAME writer the production
      // deployment uses — deployment-matching in the faithful direction,
      // not a local-only tune.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      // Allow shuffled-hash join where its size conditions hold instead of
      // always preferring sort-merge (optimization guide §3.1/§9 baseline
      // config): SMJ pays two full sorts; SHJ builds a per-partition hash
      // table on the smaller side. AQE's skew-join splitting and the
      // size conditions (build side must fit a partition) bound the OOM
      // risk that motivated Spark's conservative default.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      // Catalyst extensions: the edit-distance prefilter rewrite (a sound
      // length-difference bound ahead of every levenshtein<=k predicate)
      // and the graft codegen expressions as SQL-callable functions, so
      // `spark.sql` users get the same operators as the Column API.
      .withExtensions { ext =>
        ext.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
        def fn(name: String, clazz: Class[_])(build: Seq[Expression] => Expression): Unit =
          ext.injectFunction(
            (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), build))
        fn("jaro_winkler", classOf[graft.expressions.JaroWinkler])(a =>
          graft.expressions.JaroWinkler(a(0), a(1)))
        fn("simhash32", classOf[graft.expressions.SimHash32])(a =>
          graft.expressions.SimHash32(a(0)))
        fn("rolling_hash", classOf[graft.expressions.RollingHash])(a =>
          graft.expressions.RollingHash(a(0)))
        fn("dot_product", classOf[graft.expressions.DotProduct]) (a =>
          graft.expressions.DotProduct(a(0), a(1)))
        fn("minhash_hex", classOf[graft.expressions.MinHashHex]) { a =>
          val seed = a(1) match {
            case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
            case _ => throw new IllegalArgumentException(
              "minhash_hex(shingles, seed): seed must be a literal integer")
          }
          graft.expressions.MinHashHex(a(0), seed)
        }
        fn("winnow_fps", classOf[graft.expressions.WinnowFps]) { a =>
          def litInt(e: Expression, name: String): Int = e match {
            case x if x.foldable => x.eval().asInstanceOf[Number].intValue()
            case _ => throw new IllegalArgumentException(
              s"winnow_fps(text, k, w): $name must be a literal integer")
          }
          graft.expressions.WinnowFps(a(0), litInt(a(1), "k"), litInt(a(2), "w"))
        }
      }
  }

  /** Get-or-create with graft defaults; used by tests. */
  def get(master: String = "local[32]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
