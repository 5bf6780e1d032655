package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the LLM-pipeline
  * extensions) surfaces here as a named query; queries with an ANSI-SQL
  * equivalent also publish the oracle the driver runs in DuckDB.
  */
object SparkEntry {

  /** All registered verifiable queries, grouped by domain. */
  def registry: Seq[Q] =
    CoreQueries.all ++ StarQueries.all ++ TimeSeriesQueries.all ++ SolarQueries.all ++
      TextQueries.all ++ RankQueries.all ++ StatsQueries.all ++
      PrepQueries.all ++ LayoutQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ ExtraQueries.all ++ GraphQueries.all ++
      InferenceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1Agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
