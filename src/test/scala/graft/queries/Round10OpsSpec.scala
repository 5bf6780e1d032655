package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 pins: the persisted IVF index must serve results IDENTICAL to
  * the inline-build path, survive staleness, and lay out one file per
  * cell; the executed compaction must preserve every row and value; the
  * GramFold aggregate must match a driver-side exact recompute including
  * past-long-range sums.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q_ivf_index_search: result rows identical to the inline q_ann_ivf path") {
    val inline = rows(SimilarityQueries.qAnnIvf.run(spark, sf))
    val stored = rows(SimilarityQueries.qIvfIndexSearch.run(spark, sf))
    assert(inline.nonEmpty)
    assert(stored == inline)
  }

  test("q_ivf_index_update: incrementally-maintained index serves identical results") {
    val inline = rows(SimilarityQueries.qAnnIvf.run(spark, sf))
    val updated = rows(SimilarityQueries.qIvfIndexUpdate.run(spark, sf))
    assert(updated == inline)
    // the batch really APPENDED: cell dirs hold base + batch files
    val vecDir = graft.operators.IndexStore.dirFor(sf, "ivf_inc") + "/vectors"
    val cellDirs = new java.io.File(vecDir).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    val multiFile = cellDirs.count(_.listFiles().count(_.getName.endsWith(".parquet")) >= 2)
    assert(multiFile > 0, "no cell shows an appended batch file — update looks like a rebuild")
  }

  test("q_pq_index_search: result rows identical to the inline q_pq_search path") {
    val inline = rows(SimilarityQueries.qPqSearch.run(spark, sf))
    val stored = rows(SimilarityQueries.qPqIndexSearch.run(spark, sf))
    assert(inline.nonEmpty)
    assert(stored == inline)
  }

  test("ivf index: build writes one parquet file per cell; stale meta rebuilds") {
    val dir = SimilarityQueries.qIvfIndexBuild.run(spark, sf)
      .collect() // forces a fresh build
    assert(dir.nonEmpty)
    val vecDir = graft.operators.IndexStore.dirFor(sf, "ivf") + "/vectors"
    val cellDirs = new java.io.File(vecDir).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { cd =>
      val files = cd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${cd.getName}: expected 1 file, got ${files.length}")
    }
    // freshness: poison the meta (wrong stamp) → ensure() must rebuild
    val meta = graft.operators.IndexStore.dirFor(sf, "ivf")
    val stamp = graft.operators.IndexStore.sourceStamp(s"$sf/embeddings.parquet")
    spark.range(1).select(lit(-1L).as("n"), lit(12345L).as("stamp")).coalesce(1)
      .write.mode("overwrite").parquet(s"$meta/_meta")
    assert(!graft.operators.IndexStore.isFresh(spark, meta, stamp))
    SimilarityQueries.ivfIndexDir(spark, sf) // rebuilds
    assert(graft.operators.IndexStore.isFresh(spark, meta, stamp))
    assert(graft.operators.IndexStore.publishedCount(spark, meta).contains(
      graft.Tables.embeddings(spark, sf).count()))
  }

  test("q_compaction_exec: rollup from compacted files equals a direct lineitem recompute") {
    val exec = LayoutQueries.qCompactionExec.run(spark, sf).collect()
    assert(exec.nonEmpty)
    // recompute group extents + totals straight from the source table
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("date").as("day"),
        col("l_quantity").cast("decimal(27,2)").as("qty"))
      .collect().map(r => (r.getDate(0), r.getDecimal(1)))
    val byDay = li.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val days = byDay.keys.toSeq.sortBy(_.getTime)
    val total = byDay.values.sum
    val target = math.max(1L, total / 8)
    var cum = 0L
    val dayGrp = days.map { d => val g = cum / target; cum += byDay(d); d -> g }.toMap
    val expected = li.groupBy { case (d, _) => dayGrp(d) }.toSeq.sortBy(_._1).map {
      case (g, rs) =>
        val ds = rs.map(_._1).distinct
        (g, rs.length.toLong, ds.length.toLong,
          rs.map(r => BigDecimal(r._2)).sum.toDouble,
          ds.minBy(_.getTime), ds.maxBy(_.getTime))
    }
    assert(exec.length == expected.length)
    exec.zip(expected).foreach { case (row, (g, n, nf, sq, dmin, dmax)) =>
      assert(row.getLong(0) == g)
      assert(row.getLong(1) == n)
      assert(row.getLong(2) == nf)
      assert(math.abs(row.getDouble(3) - sq) < 1e-6)
      assert(row.getDate(4).toString == dmin.toString)
      assert(row.getDate(5).toString == dmax.toString)
    }
    // the compacted layout really is few files (one per group)
    val cdir = new java.io.File(
      graft.operators.IndexStore.dirFor(sf, "compacted") + "/files")
    val groupDirs = cdir.listFiles().filter(_.getName.startsWith("group_id="))
    assert(groupDirs.length == expected.length)
    groupDirs.foreach { gd =>
      assert(gd.listFiles().count(_.getName.endsWith(".parquet")) == 1, gd.getName)
    }
  }

  test("GramFold: 128-bit cells match BigInt recompute, including past-long sums") {
    import spark.implicits._
    // vectors engineered so one cell's running sum exceeds Long.MaxValue:
    // product 4e18 per row x 40 rows = 1.6e20 >> 9.2e18
    val big = 2000000000L // 2e9; 2e9 * 2e9 = 4e18 per-row product
    val dim = 4
    val data = Seq.fill(40)(Seq(big, -big, 3L, 0L)) :+ Seq(1L, 2L, 3L, 4L)
    val df = data.toDF("qa")
    val out = df.agg(graft.expressions.GramFold.gramFold(col("qa"), dim).as("g"))
      .select(posexplode(col("g")).as(Seq("pos", "sq"))).collect()
      .map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
    val exp = Array.fill(dim * dim)(BigInt(0))
    data.foreach { v =>
      for (i <- 0 until dim; j <- 0 until dim)
        exp(i * dim + j) += BigInt(v(i)) * BigInt(v(j))
    }
    assert(exp(0) > BigInt(Long.MaxValue), "test must actually cross 2^63")
    (0 until dim * dim).foreach(p => assert(out(p) == exp(p), s"cell $p"))
  }

  test("GramFold: rejects wrong-width vectors loudly") {
    import spark.implicits._
    val df = Seq(Seq(1L, 2L, 3L)).toDF("qa")
    val e = intercept[Exception] {
      df.agg(graft.expressions.GramFold.gramFold(col("qa"), 4)).collect()
    }
    assert(e.getMessage != null)
  }
}
