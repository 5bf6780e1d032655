package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling, both layers: AQE must split a skewed sort-merge join
  * partition at runtime, and the salted-join fallback must produce
  * exactly the plain join's result while spreading the hot key.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  import spark.implicits._

  private def skewedFact = {
    // 50k rows on the hot key, ~50 on each of 1000 cold keys
    spark.range(100000).select(
      when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(1000))).as("k"),
      col("id").as("row_id"),
      (col("id") % 97).cast("double").as("v"))
  }
  private def dim =
    spark.range(1000).select(col("id").as("k"), concat(lit("d"), col("id")).as("label"))

  test("AQE splits the skewed sort-merge join partition at runtime") {
    val prev = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      // test-scale thresholds so the 50k-row hot partition counts as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = skewedFact.join(dim, "k")
      joined.collect() // finalize the adaptive plan on THIS QueryExecution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split in:\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("salted join == plain join, hot key spread across salt buckets") {
    val expected = skewedFact.join(dim, "k")
      .select("k", "row_id", "v", "label")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(skewedFact, dim, "k", saltBy = col("row_id"), buckets = 8)
      .select("k", "row_id", "v", "label")
    assert(salted.collect().map(_.toSeq).toSet === expected)

    // the hot key's rows really do land in >1 salt bucket
    val spread = skewedFact
      .withColumn("salt", pmod(hash(col("row_id")), lit(8)))
      .filter(col("k") === 0L)
      .select("salt").distinct().count()
    assert(spread === 8)
  }
}
