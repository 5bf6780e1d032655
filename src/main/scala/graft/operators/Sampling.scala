package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the data-mixing/balancing step of
  * a training-data pipeline (equalize language/source representation,
  * apply per-domain mixing weights).
  *
  * Spark's `sampleBy` draws per-row Bernoulli RNG whose outcome depends
  * on partitioning and row order — unreproducible across runs and
  * engines. Here membership is a pure function of the row id: a Knuth
  * multiplicative hash maps each id to a basis-point bucket
  * (`(id * 2654435761) mod 10000`), and a stratum keeps ids whose bucket
  * falls under its rate. Same inputs → same sample, on any cluster
  * layout, in any engine — which is also what makes the op oracle-
  * checkable and training runs repeatable.
  *
  * Scale shape: one partial+final count per stratum (tiny), broadcast
  * back onto the fact side, then a narrow filter — no extra shuffle of
  * the data itself.
  */
object Sampling {

  val Buckets = 10000L // basis points
  private val Knuth = 2654435761L // 2^32 / golden ratio, coprime to 10000

  private def bucket(idCol: String) = (col(idCol) * Knuth) % Buckets

  /** Keep each stratum's rows whose hash bucket < rates(stratum)·10000.
    * Rows of strata absent from `rates` are dropped. */
  def stratifiedDeterministic(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Double]): DataFrame = {
    val rateDf = rates.toSeq
      .map { case (k, v) => (k, (v * Buckets).toLong) }
      .foldLeft(Seq.empty[(String, Long)])(_ :+ _)
    val spark = df.sparkSession
    import spark.implicits._
    df.join(broadcast(rateDf.toDF(strataCol, "__bp")), strataCol)
      .filter(bucket(idCol) < col("__bp"))
      .drop("__bp")
  }

  /** Downsample every stratum to (approximately) the size of the smallest
    * one: rate = floor(10000·min_n / n) basis points, derived from the
    * data in one tiny aggregation. */
  def balanceStrata(df: DataFrame, strataCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__mn"))))
      .select(col(strataCol), expr(s"($Buckets * __mn) div __n").as("__bp"))
    df.join(broadcast(rates), strataCol)
      .filter(bucket(idCol) < col("__bp"))
      .drop("__bp")
  }
}
