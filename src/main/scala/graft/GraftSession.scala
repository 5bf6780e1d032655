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

  def builder(master: String = "local[32]", app: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(app)
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

  /** Get-or-create with graft defaults; used by tests. */
  def get(master: String = "local[32]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
