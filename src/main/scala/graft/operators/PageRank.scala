package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank by power iteration over a weighted edge list — the
  * standard source-authority signal a web-scale training pipeline computes
  * over its domain link graph (used by e.g. the CommonCrawl harmonic /
  * PageRank rankings that public corpus-quality work filters on).
  *
  * Input: `edges(src, dst, weight)` (weights need not be normalized).
  * Output: `(node, rank)` with ranks summing to ~1 (simplified model:
  * dangling mass is dropped, like most map-reduce formulations).
  *
  * Scale design:
  *   - edge normalization is one `groupBy(src)` + an equi-join — both
  *     keyed shuffles on the edge list, never materialized on the driver;
  *   - each iteration is contrib = join(edges, ranks on src) →
  *     `groupBy(dst).sum` — i.e. one shuffle per iteration keyed by node
  *     id; the rank vector (|V| rows, 2 cols) is the only thing that
  *     iterates, the edge list is scanned but never re-shuffled if it is
  *     pre-partitioned/bucketed by `src`;
  *   - per the lineage rule for iterative DataFrame algorithms (see
  *     NOTES.md #10 and [[ConnectedComponents]]), deep iteration must
  *     truncate the growing logical plan: every `checkpointEvery` rounds
  *     the rank frame is `localCheckpoint(eager)`-ed so Catalyst
  *     re-analysis stays O(1) per round instead of O(rounds).
  */
object PageRank {

  def run(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      checkpointEvery: Int = 4): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    // |V| as a broadcast single-row aggregate — never a driver collect
    val nStat = broadcast(nodes.agg(count(lit(1)).cast("double").as("n")))
    val outW = edges.groupBy(col("src")).agg(sum(col("weight")).as("ow"))
    val norm = edges
      .join(outW, "src")
      .select(col("src"), col("dst"), (col("weight").cast("double") / col("ow")).as("w"))
    val base = nodes.crossJoin(nStat)

    var ranks = base.select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (i <- 1 to iters) {
      val contrib = norm
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst"))
        .agg(sum(col("w") * col("rank")).as("inflow"))
      ranks = base
        .join(contrib, col("node") === col("dst"), "left")
        .select(
          col("node"),
          ((lit(1.0) - lit(damping)) / col("n")
            + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      if (i % checkpointEvery == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
