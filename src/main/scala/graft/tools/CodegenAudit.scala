package graft.tools

import org.apache.spark.sql.functions._

/** Attribution tool for per-pass janino recompiles (offline, not benched).
  *
  * BENCH_PASSES r10 showed 47 queries janino-compiling during their TIMED
  * passes — passes that run back-to-back after the same query's own warmup,
  * so no other query's classes can have evicted theirs. Solo fresh-JVM runs
  * reproduce it (q_mad_outliers jc = 30/20/4 with nothing else in the JVM),
  * which rules out battery cache pressure entirely: the generated SOURCE
  * must differ from pass to pass. This main makes the differing fragment
  * visible: it raises the codegen compiler's logger to DEBUG (Spark logs
  * the full formatted source exactly once per CACHE MISS, inside the cache
  * loader), runs one query Bench-style (clearCache + noop write per pass)
  * with a stderr marker line between passes, and leaves the segmentation
  * and text diff to a driver-side script.
  *
  * Usage: runMain graft.tools.CodegenAudit <query_name> [passes]
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_mad_outliers")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    // every janino compile (= cache miss) logs its formatted source at
    // DEBUG from these two; everything else stays at WARN so the output
    // is segmentable
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Seq(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      "org.apache.spark.sql.execution.WholeStageCodegenExec"
    ).foreach(Configurator.setLevel(_, Level.DEBUG))
    val q = graft.SparkEntry.registry.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
    import org.apache.spark.metrics.source.CodegenMetrics
    (0 until passes).foreach { p =>
      spark.catalog.clearCache()
      val jc0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      System.err.println(s"=== GRAFT_AUDIT_PASS $p START ===")
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      val jc = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - jc0
      System.err.println(s"=== GRAFT_AUDIT_PASS $p END compiles=$jc ===")
      graft.ScratchCache.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
