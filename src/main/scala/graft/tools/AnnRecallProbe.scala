package graft.tools

import graft.GraftSession
import graft.queries.SimilarityQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic: recall@5-in-10 of every IVF-PQ variant (raw vs residual
  * PQ × first-K vs Lloyd-trained coarse centroids × seed vs trained PQ
  * codebook) against the exact cosine top-5, measured over 16 query
  * vectors (80 truth neighbors — the gates' own 4-query set has ±0.05
  * granularity, too coarse to rank variants). Also prints each coarse
  * geometry's probe CEILING (exact re-rank within probed cells): recall
  * above it is impossible for ANY quantizer, so the gap ceiling−recall
  * is what PQ distortion actually costs.
  *
  * Usage: `runMain graft.tools.AnnRecallProbe [sfDir]` (default sf0.01).
  */
object AnnRecallProbe {
  val Nq = 16

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("local[8]")
    spark.sparkContext.setLogLevel("WARN")

    val exact = SimilarityQueries.qEmbedTopk.run(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    def recallOf(df: DataFrame): Double = {
      // (q_id, rn, vec_id/n_id, score) — neighbor id at index 2
      val approx = df.collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
      val per = approx.toSeq.sortBy(_._1).map { case (qid, a) =>
        (a & exact(qid)).size.toDouble / exact(qid).size
      }
      if (per.isEmpty) 0.0 else per.sum / per.size
    }

    val all = SimilarityQueries.vecsOf(spark, sf)
    val firstK = all.filter(col("vec_id") < SimilarityQueries.IvfCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    def lloyd(iters: Int) =
      SimilarityQueries.lloydCentroids(all, SimilarityQueries.IvfCells, iters)

    // probe CEILING per coarse geometry: exact top-10 cosine within the
    // probed cells — the best ANY quantizer could recall there
    def ceiling(icents: DataFrame): DataFrame = {
      val assigned = SimilarityQueries.assignCells(all, icents)
      val probes = SimilarityQueries
        .probeCells(all.filter(col("vec_id") < Nq), icents, SimilarityQueries.NProbe)
        .select(col("vec_id").as("q_id"), col("cid").as("pcell"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
      broadcast(probes)
        .join(assigned.as("c"),
          col("c.cell") === col("pcell") && col("c.vec_id") =!= col("q_id"))
        .join(broadcast(all.as("q")), col("q.vec_id") === col("q_id"))
        .select(col("q_id"), col("c.vec_id").as("n_id"),
          (graft.expressions.VectorOps.dot(col("q.v"), col("c.v")) /
            (col("q.nrm") * col("c.nrm"))).as("cos"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= SimilarityQueries.PqSearchK)
        .select(col("q_id"), col("rn"), col("n_id"), col("cos"))
    }

    def raw(ic: DataFrame) = SimilarityQueries.ivfPqRawSearch(spark, sf, all, ic, Nq)
    def resid(ic: DataFrame, cb: Int) = SimilarityQueries.residualAdcSearch(all, ic, cb, Nq)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "ceiling_firstK" -> (() => ceiling(firstK)),
      "ceiling_lloyd2" -> (() => ceiling(lloyd(2))),
      "ceiling_lloyd3" -> (() => ceiling(lloyd(3))),
      "raw_firstK" -> (() => raw(firstK)),
      "resid_firstK" -> (() => resid(firstK, 0)),
      "raw_lloyd2" -> (() => raw(lloyd(2))),
      "resid_lloyd2" -> (() => resid(lloyd(2), 0)),
      "resid_lloyd3" -> (() => resid(lloyd(3), 0)),
      "resid_l2_cb1" -> (() => resid(lloyd(2), 1)),
      "resid_l2_cb2" -> (() => resid(lloyd(2), 2)),
      "resid_l2_cb3" -> (() => resid(lloyd(2), 3)),
      "resid_fk_cb2" -> (() => resid(firstK, 2)))
    variants.foreach { case (name, run) =>
      println(f"RECALL $name%-14s ${recallOf(run())}%.3f")
    }
    spark.stop()
  }
}
