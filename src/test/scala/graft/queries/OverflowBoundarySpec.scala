package graft.queries

import graft.GraftSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary pins for the exact-arithmetic guards (ADVICE r9/r10): each of
  * these folds was rewritten to be exact past 64-bit — these tests drive
  * the PRODUCTION expression (factored helpers, not copies) with operands
  * at and beyond the 2⁶³ line, where a silently-wrapping BIGINT fold
  * would return garbage instead of the BigInt-checked expected value.
  */
class OverflowBoundarySpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("spearman rank-moment fold is exact past the 2^63 product boundary") {
    // doubled ranks at ~3.1e9 — one rx*ry product is 9.61e18 > Long.Max;
    // a BIGINT fold wraps on the FIRST row, the decimal(19,0)-before-
    // product fold must equal the BigInt recompute
    val r = 3100000000L
    val rows = Seq.fill(4)(Row("A", r, r))
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("rx2", LongType),
      StructField("ry2", LongType)))
    val j = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = StatsQueries.rankMoments(j).collect()
    assert(out.length == 1)
    val sxx = BigDecimal(out.head.getDecimal(out.head.fieldIndex("sxx"))).toBigInt
    val expected = BigInt(r) * BigInt(r) * 4
    assert(expected > BigInt(Long.MaxValue), "test operands must exceed 2^63")
    assert(sxx == expected)
  }

  test("TWA integral numerator is exact past the 2^63 per-term boundary") {
    // vq=5e12 (a 5e6-unit reading at 1e-6 quantum) x dt=5e6 s — one term
    // is 2.5e19 > Long.Max; two terms plus the null-dt tail row
    val rows = Seq(
      Row("E", 5000000000000L, java.lang.Long.valueOf(5000000L)),
      Row("E", 5000000000000L, java.lang.Long.valueOf(5000000L)),
      Row("E", 5000000000000L, null))
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("vq", LongType),
      StructField("dt", LongType, nullable = true)))
    val g = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = g.groupBy("event_type").agg(TimeSeriesQueries.twaNumerator.as("num")).collect()
    val num = BigDecimal(out.head.getDecimal(1)).toBigInt
    val expected = BigInt("50000000000000000000") // 2 * 2.5e19
    assert(expected > BigInt(Long.MaxValue))
    assert(num == expected)
  }

  test("dbscan packed cell: distinct keys at the +-(2^20 - 1) corners, loud failure at 2^20") {
    val edge = (1L << 20) - 1
    val inRows = Seq((edge, edge), (-edge, -edge), (edge, -edge), (-edge, edge), (0L, 0L))
    val in = spark.createDataFrame(inRows).toDF("cx", "cy")
      .select(SimilarityQueries.dbscanPackedCell.as("c"))
      .collect().map(_.getLong(0))
    assert(in.distinct.length == inRows.length, "corner cells must pack to distinct keys")
    val out = spark.createDataFrame(Seq((1L << 20, 0L))).toDF("cx", "cy")
      .select(SimilarityQueries.dbscanPackedCell.as("c"))
    val e = intercept[Exception](out.collect())
    assert(e.getMessage.contains("packing range"),
      s"expected the loud packing guard, got: ${e.getMessage}")
  }

  test("isotonic ppm division is exact past the ~4.6e12 positive-count boundary") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // a single block with 5e12 positives of 1e13 trials: 2000000*bp =
    // 1e19 > Long.Max — the BigInt ppm must land on the true half-up
    // 500000, where a 64-bit product wraps negative
    val one = graft.expressions.IsotonicPpm.fit(
      new GenericArrayData(Array(5000000000000L)),
      new GenericArrayData(Array(10000000000000L)))
    assert(one.toLongArray().toSeq == Seq(500000L))
    // pooling across the boundary: a violating pair pools into one
    // giant block first, then divides exactly
    val pooled = graft.expressions.IsotonicPpm.fit(
      new GenericArrayData(Array(5000000000000L, 0L)),
      new GenericArrayData(Array(5000000000000L, 5000000000000L)))
    assert(pooled.toLongArray().toSeq == Seq(500000L, 500000L))
  }

  test("dtw_dist is NULL when no warp path exists, a distance otherwise") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq(1L, 2L, 3L), Seq(1L, 2L, 4L)), // aligned: |3-4| = 1
      (2L, Seq(1L), Seq(1L, 2L, 3L, 4L, 5L)), // |n-m|=4 > band=1: no path
      (3L, Seq.empty[Long], Seq(1L, 2L)) // empty side: no path
    )).toDF("id", "xs", "ys")
      .select(col("id"), graft.expressions.DtwDist.dtwDist(col("xs"), col("ys"), 1).as("d"))
      .orderBy("id").collect()
    assert(!df(0).isNullAt(1) && df(0).getLong(1) == 1L)
    assert(df(1).isNullAt(1), "band-unreachable alignment must be NULL, not the Inf sentinel")
    assert(df(2).isNullAt(1), "empty-side alignment must be NULL")
  }
}
