package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — the iterative merge-selection loop
  * (Sennrich et al. 2016) that produces the vocabulary q_bpe_encode /
  * q_bpe_pairs consume. One round = count all adjacent symbol pairs,
  * pick the most frequent, fuse it everywhere; repeat.
  *
  * Scale design: training runs over the WORD-TYPE table (distinct word,
  * corpus frequency), not the corpus — by Heaps' law the type table is
  * sublinear in corpus size (and aggregating to it is one map-side-combined
  * shuffle), so a 100 TB corpus trains over a few hundred million short
  * rows. Per round: pair counting is explode + hash aggregation weighted
  * by word frequency; the winning pair is a single tiny
  * `orderBy.limit(1)` collect (the same driver-side scalar KMeans uses
  * for centroids); the merge application is a narrow per-row fold inside
  * codegen. Tie-breaks are total (count desc, then lexicographic pair),
  * so the merge table is deterministic across partitionings and runs.
  */
object BpeTrain {

  /** One learned rule: merge `left`+`right` (rank = training order). */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Greedy left-to-right non-overlapping application of one merge rule
    * to a symbol array, as a codegen HOF fold: carry one symbol of
    * lookbehind; when (carry, x) is the rule, emit the fused symbol and
    * clear the carry (the fused symbol is a NEW symbol — it cannot chain
    * within the same rule pass, matching the classic implementation). */
  def applyMerge(seg: Column, l: String, r: String): Column = {
    val fused = l + r
    val init = struct(
      typedLit(Seq.empty[String]).as("out"),
      lit("").as("carry"),
      lit(false).as("has"))
    aggregate(
      seg,
      init,
      (acc, x) => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        val has = acc.getField("has")
        when(!has, struct(out.as("out"), x.as("carry"), lit(true).as("has")))
          .when(carry === l && x === r,
            struct(concat(out, array(lit(fused))).as("out"),
              lit("").as("carry"), lit(false).as("has")))
          .otherwise(
            struct(concat(out, array(carry)).as("out"),
              x.as("carry"), lit(true).as("has")))
      },
      acc =>
        when(acc.getField("has"),
          concat(acc.getField("out"), array(acc.getField("carry"))))
          .otherwise(acc.getField("out")))
  }

  /** Train `nMerges` merge rules over `words` (columns `word`, `freq`).
    * Stops early if no pair occurs at least twice (weighted). */
  def train(words: DataFrame, nMerges: Int): Seq[Merge] = {
    var segs = graft.ScratchCache.tracked(
      words.select(split(col("word"), "").as("seg"), col("freq")))
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val n = size(col("seg"))
      val top = segs
        .select(
          explode(zip_with(
            slice(col("seg"), lit(1), n - 1),
            slice(col("seg"), lit(2), n - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"),
          col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty || top(0).getAs[Long]("f") < 2) exhausted = true
      else {
        val l = top(0).getAs[String]("l")
        val r = top(0).getAs[String]("r")
        val f = top(0).getAs[Long]("f")
        out += Merge(rank, l, r, f)
        // materialized per round (the next round's count reads it once);
        // tracked so the caller's releaseAll() drains the whole chain
        segs = graft.ScratchCache.tracked(
          segs.select(applyMerge(col("seg"), l, r).as("seg"), col("freq")))
        rank += 1
      }
    }
    out.result()
  }
}
