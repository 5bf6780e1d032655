package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation and (when expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names and row order must match exactly between the two —
  * the driver sorts columns by name and hashes values in row order, so every
  * query here ends in a deterministic ORDER BY on both sides.
  *
  * Conventions for oracle parity:
  *   - every computed double is wrapped in `round(x, k)` on BOTH sides so
  *     partial-aggregation summation order can't flip the last ulp;
  *   - counts / ranks are cast to BIGINT on both sides;
  *   - regex semantics: Spark's regexp_replace is global by default, DuckDB
  *     needs the 'g' flag — oracles always pass it explicitly.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  def sql(name: String, oracle: String, doc: String = "")(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle), doc)

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def rowsOnly(name: String, doc: String = "")(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None, doc)
}
