package graft.queries

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the training-data-prep and layout operators — the
  * invariants the DuckDB value gate can't express directly.
  */
class PrepLayoutSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")
  private val sf = "/root/testdata/sf0.001"

  test("q_chunk: chunks tile every document with stride overlap") {
    val rows = PrepQueries.qChunk.run(spark, sf)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("nc"),
        max(col("n_tok")).as("max_tok"),
        min(col("n_tok")).as("min_tok"),
        max(col("chunk_id")).as("last_id"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nc = r.getAs[Long]("nc")
      assert(r.getAs[Long]("last_id") == nc - 1, s"chunk ids not dense: $r")
      assert(r.getAs[Long]("max_tok") <= PrepQueries.ChunkWindow)
      assert(r.getAs[Long]("min_tok") >= 1)
    }
    // a specific doc: chunk texts re-join to the token stream (overlap removed)
    val doc = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("w"))
      .filter(size(col("w")) > PrepQueries.ChunkWindow)
      .limit(1).collect()(0)
    val toks = doc.getSeq[String](1)
    val chunks = PrepQueries.qChunk.run(spark, sf)
      .filter(col("doc_id") === doc.getLong(0))
      .orderBy("chunk_id").collect()
    chunks.zipWithIndex.foreach { case (c, i) =>
      val start = i * PrepQueries.ChunkStride
      val expect = toks.slice(start, start + PrepQueries.ChunkWindow).mkString(" ")
      assert(c.getAs[String]("chunk") == expect, s"chunk $i mismatch")
    }
  }

  test("q_pack: offsets are consistent cumulative cuts within each shard") {
    val rows = PrepQueries.qPack.run(spark, sf).collect()
    val C = PrepQueries.PackCap
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_.getAs[Long]("doc_id"))
      var excl = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("seq_id") == excl / C)
        assert(r.getAs[Long]("seq_off") == excl % C)
        val spans = (excl + r.getAs[Long]("n_tok") - 1) / C > excl / C
        assert(r.getAs[Long]("spans_boundary") == (if (spans) 1L else 0L))
        excl += r.getAs[Long]("n_tok")
      }
    }
  }

  test("q_decontaminate: reported pairs really share >= 2 distinct 5-grams") {
    import graft.text.TextFunctions._
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(gram5Of(tokens(col("text")))).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val pairs = PrepQueries.qDecontaminate.run(spark, sf).collect()
    pairs.foreach { r =>
      val shared = docs(r.getAs[Long]("doc_id")).intersect(docs(r.getAs[Long]("eval_id")))
      assert(shared.size == r.getAs[Long]("n_shared"))
      assert(shared.size >= 2)
    }
  }

  test("q_zorder: every z-bucket spans <= 1/16 of each key dimension") {
    val rows = LayoutQueries.qZorder.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_p8") - r.getAs[Long]("min_p8") <= 15, s"p8 envelope wide: $r")
      assert(r.getAs[Long]("max_s8") - r.getAs[Long]("min_s8") <= 15, s"s8 envelope wide: $r")
    }
  }

  test("bloom prune: no false negatives, real pruning, exact final result") {
    val li = graft.Tables.lineitem(spark, sf)
    val dim = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
      .select(col("o_orderkey"))
    val pruned = graft.operators.BloomPrune.pruneByDim(li, "l_orderkey", dim, "o_orderkey")
    val total = li.count()
    val kept = pruned.count()
    val trueMatches = li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept >= trueMatches, "bloom dropped a true match")
    assert(kept < total, "bloom pruned nothing on a selective dim")
    // final joined result identical to the unpruned join
    val a = pruned.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(a == li.join(dim, col("l_orderkey") === col("o_orderkey")).count())
  }

  test("bloom prune: non-integral (string) keys keep every true match") {
    // regression: a plain cast("long") on a string key yields NULL,
    // might_contain(bf, NULL) is NULL, and the filter dropped EVERY row —
    // keys must hash via xxhash64 on both sides instead
    val docs = graft.Tables.documents(spark, sf)
    val dim = docs.filter(col("lang") === "en").select(col("lang")).distinct()
    val pruned = graft.operators.BloomPrune.pruneByDim(docs, "lang", dim, "lang")
    val trueMatches = docs.filter(col("lang") === "en").count()
    assert(trueMatches > 0, "fixture has no 'en' docs — vacuous")
    assert(pruned.join(dim, Seq("lang"), "left_semi").count() === trueMatches,
      "string-keyed bloom prune lost true matches")
  }

  test("partitioned write: lang=... directories, partition-pruned scan on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      graft.Tables.documents(spark, sf)
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
      val back = spark.read.parquet(dir).filter(col("lang") === "en")
      val plan = back.queryExecution.executedPlan.toString
      // the filter must prune at the DIRECTORY level (PartitionFilters on
      // the scan), not read every partition and filter rows afterwards
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        s"no partition pruning in: ${plan.linesIterator.take(8).mkString("\n")}")
      val expect = graft.Tables.documents(spark, sf).filter(col("lang") === "en").count()
      assert(back.count() === expect)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("q_topic_mix: weights normalize; tail languages upsample, head downsamples") {
    val rows = PrepQueries.qTopicMix.run(spark, sf).collect()
    assert(math.abs(rows.map(_.getAs[Double]("mix_frac")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("nat_frac")).sum - 1.0) < 1e-4)
    val byLang = rows.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_docs"), r.getAs[Double]("rate"))).toMap
    val (maxLang, _) = byLang.maxBy(_._2._1)
    val (minLang, _) = byLang.minBy(_._2._1)
    assert(byLang(maxLang)._2 < 1.0, "most-common language must downsample")
    assert(byLang(minLang)._2 > 1.0, "rarest language must upsample")
  }

  test("q_merge_upsert: action classes partition the key space") {
    val rows = PrepQueries.qMergeUpsert.run(spark, sf).collect()
    val byAction = rows.groupBy(_.getAs[String]("action")).view.mapValues(_.length).toMap
    assert(byAction.keySet == Set("update", "insert", "keep"))
    rows.foreach { r =>
      r.getAs[String]("action") match {
        case "insert" => assert(r.isNullAt(r.fieldIndex("old_bal")))
        case _        => assert(!r.isNullAt(r.fieldIndex("old_bal")))
      }
    }
  }
}
