package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Writes plans/r14/<query>_after.txt — the formatted physical plan of
  * every query touched in the round-14 optimization pass, at the same
  * settings DumpPlans uses (sf0.01, local[8]) so the *_before.txt files
  * extracted from the pre-optimization PLANS.md diff cleanly.
  * `runMain graft.tools.DumpPlansR14`
  */
object DumpPlansR14 {
  val touched = Seq(
    "q_jpeg_decode", "q_jpeg_color", "q_kneser_ney", "q_cooccurrence",
    "q_sparse_cosine", "q_rrf_hybrid", "q_mad_outliers", "q_spearman",
    "q_triangles", "q_kcore", "q_random_walk", "q_link_pred",
    "q_assortativity", "q_bfs_hops", "q_assoc_rules", "q_percentiles")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val suffix = if (args.length > 1) args(1) else "after"
    val spark = GraftSession.get("local[8]")
    Files.createDirectories(Paths.get("plans/r14"))
    for (name <- touched) {
      SparkEntry.registry.find(_.name == name).foreach { q =>
        val df = q.run(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
          .replaceAll("0x[0-9A-F]{120,}", "0x…<bloom-filter bytes redacted>…")
        Files.writeString(
          Paths.get(s"plans/r14/${name}_$suffix.txt"),
          s"## $name — ${q.doc}\n\n" + formatted)
        graft.ScratchCache.releaseAll()
      }
    }
    println(s"wrote ${touched.size} plans to plans/r14 ($suffix)")
    spark.stop()
  }
}
