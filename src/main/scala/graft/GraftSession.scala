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
      .config("spark.ui.enabled", "false")
      // Catalyst extensions: the edit-distance prefilter rewrite (a sound
      // length-difference bound ahead of every levenshtein<=k predicate)
      // and jaro_winkler as a SQL-callable function.
      .withExtensions { ext =>
        ext.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
        ext.injectFunction((
          new FunctionIdentifier("jaro_winkler"),
          new ExpressionInfo(
            classOf[graft.expressions.JaroWinkler].getName, "jaro_winkler"),
          (args: Seq[Expression]) =>
            graft.expressions.JaroWinkler(args(0), args(1))))
      }

  /** Get-or-create with graft defaults; used by tests. */
  def get(master: String = "local[32]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
