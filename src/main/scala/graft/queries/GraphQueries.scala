package graft.queries

import graft.Tables._
import org.apache.spark.sql.functions._

/** Graph analytics over join-derived edge lists — the second iterative
  * graph operator next to [[graft.operators.ConnectedComponents]] (which
  * powers dedup clustering): source-authority ranking via
  * [[graft.operators.PageRank]].
  *
  * The edge list here is the nation "trade graph" distilled from the TPC-H
  * fact tables (customer nation → supplier nation, weighted by lineitem
  * count) — the same shape as a web-domain link graph distilled from a
  * crawl: a heavy fact-table aggregation produces a small weighted graph,
  * then the iterative rank runs on the graph alone.
  */
object GraphQueries {

  val PrIters = 3
  val PrDamping = 0.85

  private def dotIter(prev: String, next: String): String =
    s"""$next AS (
       |  SELECT b.node, (1 - 0.85) / b.n + 0.85 * coalesce(s.inflow, 0.0) AS r
       |  FROM (SELECT node, n FROM nodes CROSS JOIN nn) b
       |  LEFT JOIN (
       |    SELECT wn.dst, sum(wn.w * $prev.r) AS inflow
       |    FROM wn JOIN $prev ON $prev.node = wn.src
       |    GROUP BY wn.dst) s ON s.dst = b.node)""".stripMargin

  /** PageRank over the nation trade graph: 3 damped power iterations,
    * unrolled in the oracle as 3 CTEs (DuckDB has no iteration; the Spark
    * side runs the real iterative operator).
    *
    * Scale design: the expensive part is the EDGE DISTILLATION — a
    * fact-scale join (lineitem ⋈ orders shuffles on orderkey; customer /
    * supplier / nation are broadcast dims) aggregated down to |V|² max
    * edge rows. The iteration then touches only the small graph: one
    * keyed shuffle per round (see [[graft.operators.PageRank]] for the
    * lineage-truncation discipline when rounds go deep). Float parity:
    * edge weights are integer counts (exact in doubles), normalization is
    * a single division, and ranks only round at the output edge. */
  val qPagerank: Q = Q.sql(
    "q_pagerank", {
      val iters = (1 to PrIters).map(i => dotIter(s"r${i - 1}", s"r$i")).mkString(",\n")
      s"""WITH e AS (
         |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, CAST(count(*) AS DOUBLE) AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
         |wn AS (SELECT e.src, e.dst, e.w / ow.ow AS w FROM e JOIN ow ON ow.src = e.src),
         |r0 AS (SELECT node, 1.0 / n AS r FROM nodes CROSS JOIN nn),
         |$iters
         |SELECT n.n_name, round(r$PrIters.r, 6) AS rank
         |FROM r$PrIters JOIN nation n ON n.n_nationkey = r$PrIters.node
         |ORDER BY n.n_name""".stripMargin
    },
    doc = s"PageRank ($PrIters damped iterations) over the nation trade graph") { (s, d) =>
    val edges = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))
    val ranks = graft.operators.PageRank.run(edges, PrIters, PrDamping)
    ranks
      .join(broadcast(nation(s, d)), col("n_nationkey") === col("node"))
      .select(col("n_name"), round(col("rank"), 6).as("rank"))
      .orderBy("n_name")
  }

  val all: Seq[Q] = Seq(qPagerank)
}
