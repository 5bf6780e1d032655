package graft.tools

import org.apache.spark.sql.functions._

/** Offline phase breakdown of q_compaction_exec (not benched): times the
  * small-bucket scan, the plan, the rewrite, and the read-back rollup
  * separately so the gate's fixed cost is attributable instead of one
  * 6.5 s blob.
  */
object CompactionProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.get()
    import graft.operators.IndexStore
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm pass: fixture build if stale + one full gate run
    t("warm_full_gate") {
      graft.queries.LayoutQueries.qCompactionExec.run(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    graft.ScratchCache.releaseAll()
    // per-job timing listener: shows exactly which Spark jobs a gate pass
    // launches and what each costs
    val jobT = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        val tasks = j.stageInfos.map(_.numTasks).sum
        jobT.put(j.jobId, (j.time, site, tasks))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, site, tasks) = jobT.getOrDefault(j.jobId, (j.time, "?", 0))
        println(f"JOB ${j.jobId}%3d ${(j.time - t0) / 1e3}%6.2f s  tasks=$tasks%5d  $site")
      }
    })
    // the full gate, warm, bench-style (clearCache + noop write per pass)
    (1 to 3).foreach { p =>
      spark.catalog.clearCache()
      t(s"g$p.full_gate_run_only")(
        graft.queries.LayoutQueries.qCompactionExec.run(spark, d))
      t(s"g$p.full_gate") {
        graft.queries.LayoutQueries.qCompactionExec.run(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      graft.ScratchCache.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    (1 to 2).foreach { p =>
      spark.catalog.clearCache()
      val smallDir = IndexStore.dirFor(d, "smallfiles")
      val stamp0 = IndexStore.sourceStamp(s"$d/lineitem.parquet")
      val fresh = t(s"p$p.freshness")(IndexStore.isFresh(spark, smallDir, stamp0))
      println(s"PHASE p$p.fresh_value        $fresh")
      val small = graft.ScratchCache.tracked(
        IndexStore.read(spark, smallDir, "files", "day DATE, qty DECIMAL(27,2)"))
      t(s"p$p.scan_small_count")(small.count())
      val f = small.groupBy(col("day")).agg(count(lit(1)).as("rows_"))
      val tt = f.agg(sum(col("rows_")).as("total"))
      val wC = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val dayGrp = f.crossJoin(broadcast(tt))
        .withColumn("__cum", sum(col("rows_")).over(wC).cast("long"))
        .select(col("day"),
          expr("(__cum - rows_) DIV greatest(1, total DIV 8)").cast("long").as("group_id"))
      val compactDir = IndexStore.dirFor(d, "compacted")
      t(s"p$p.rewrite_write") {
        small.join(broadcast(dayGrp), "day")
          .repartition(col("group_id"))
          .write.mode("overwrite").partitionBy("group_id")
          .parquet(s"$compactDir/files")
      }
      t(s"p$p.rollup_readback") {
        IndexStore.read(spark, compactDir, "files", "day DATE, qty DECIMAL(27,2), group_id LONG")
          .groupBy(col("group_id"))
          .agg(count(lit(1)).cast("long").as("n_rows"),
            countDistinct(col("day")).cast("long").as("n_files"),
            sum(col("qty")).cast("double").as("sum_qty"),
            min(col("day")).as("min_day"), max(col("day")).as("max_day"))
          .orderBy("group_id")
          .write.format("noop").mode("overwrite").save()
      }
      graft.ScratchCache.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // freshness-path pieces the p-probe skipped
    (1 to 2).foreach { p =>
      val smallDir = IndexStore.dirFor(d, "smallfiles")
      val stamp = t(s"f$p.source_stamp")(
        IndexStore.sourceStamp(s"$d/lineitem.parquet"))
      t(s"f$p.is_fresh")(IndexStore.isFresh(spark, smallDir, stamp))
    }
    spark.stop()
  }
}
