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

  /** TextRank keyword-graph thresholds: content words are tokens of
    * length ≥ [[TrMinWordLen]]; an edge needs ≥ [[TrMinCooc]] adjacent
    * co-occurrences (thresholds the long boilerplate tail out of the
    * graph and keeps the oracle's unrolled iterations tractable). */
  val TrMinWordLen = 4
  val TrMinCooc = 3
  val TrTopK = 20

  /** TextRank keyword extraction (Mihalcea & Tarau 2004, "TextRank:
    * Bringing Order into Text" — public): build the word co-occurrence
    * graph (adjacent content-word pairs, undirected, weighted by count)
    * and rank vocabulary by damped PageRank; the top-ranked words are
    * the corpus's keywords — the classic unsupervised keyphrase signal a
    * curation pipeline computes next to TF-IDF. Reuses
    * [[graft.operators.PageRank]] verbatim: the fact-scale work is ONE
    * bigram explode + pair count (map-side combined), the iteration then
    * touches only the vocabulary-sized graph — same distill-then-iterate
    * shape as [[qPagerank]], whose float-parity argument (integer edge
    * weights, one normalization division, round at the output edge)
    * carries over unchanged. Undirectedness = both directed edges with
    * the same weight, exactly the paper's symmetric formulation. Output
    * order keys on the ROUNDED rank then keyword, so ties are total. */
  val qTextrank: Q = Q.sql(
    "q_textrank", {
      val tokensSql = graft.text.TextFunctions.tokensSql
      val wordBigramsSql =
        s"list_transform(generate_series(1, len($tokensSql) - 1), " +
          s"i -> $tokensSql[i] || ' ' || $tokensSql[i+1])"
      val iters = (1 to PrIters).map(i => dotIter(s"r${i - 1}", s"r$i")).mkString(",\n")
      s"""WITH bg AS (
         |  SELECT split_part(g, ' ', 1) AS a, split_part(g, ' ', 2) AS b
         |  FROM (SELECT unnest($wordBigramsSql) AS g FROM documents) _g
         |), pr AS (
         |  SELECT a, b FROM bg
         |  WHERE length(a) >= $TrMinWordLen AND length(b) >= $TrMinWordLen AND a <> b
         |), ec AS (
         |  SELECT least(a, b) AS l, greatest(a, b) AS r, CAST(count(*) AS DOUBLE) AS c
         |  FROM pr GROUP BY 1, 2 HAVING count(*) >= $TrMinCooc
         |), e AS (
         |  SELECT l AS src, r AS dst, c AS w FROM ec
         |  UNION ALL SELECT r, l, c FROM ec
         |),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
         |wn AS (SELECT e.src, e.dst, e.w / ow.ow AS w FROM e JOIN ow ON ow.src = e.src),
         |r0 AS (SELECT node, 1.0 / n AS r FROM nodes CROSS JOIN nn),
         |$iters
         |SELECT node AS keyword, round(r$PrIters.r, 6) AS rank
         |FROM r$PrIters
         |ORDER BY round(r$PrIters.r, 6) DESC, keyword
         |LIMIT $TrTopK""".stripMargin
    },
    doc = s"TextRank keywords: co-occurrence graph + $PrIters PageRank iterations, top-$TrTopK") {
    (s, d) =>
      import graft.text.TextFunctions.tokens
      val w = col("w")
      val pairs = documents(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(tokens(col("text")).as("w"))
        .select(explode(when(size(w) >= 2,
          transform(sequence(lit(1), size(w) - 1),
            i => struct(element_at(w, i).as("a"), element_at(w, i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(
          length(col("a")) >= TrMinWordLen && length(col("b")) >= TrMinWordLen &&
            col("a") =!= col("b"))
      val ec = pairs
        .groupBy(least(col("a"), col("b")).as("l"), greatest(col("a"), col("b")).as("r"))
        .agg(count(lit(1)).cast("double").as("c"))
        .filter(col("c") >= TrMinCooc)
      val edges = ec.select(col("l").as("src"), col("r").as("dst"), col("c").as("weight"))
        .union(ec.select(col("r").as("src"), col("l").as("dst"), col("c").as("weight")))
      graft.operators.PageRank.run(edges, PrIters, PrDamping)
        .select(col("node").as("keyword"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("keyword"))
        .limit(TrTopK)
  }

  /** Minimum shared-order count for a co-supply edge — thresholds the
    * nearly-complete raw co-occurrence graph down to a meaningful one. */
  val TriMinShared = 5

  /** The co-supply edge list (suppliers sharing ≥ [[TriMinShared]] orders,
    * `a < b`), distilled from the fact table WITHOUT a fact-scale
    * self-join: one groupBy(l_orderkey) with a map-side-combined
    * collect_set builds each order's (small, bounded — TPC-H caps
    * lineitems/order at 7) supplier set, and ordered pairs are generated
    * IN-ROW by nested array transforms (whole-stage codegen, no join).
    * Two shuffles total (orderkey, then pair) vs four for the
    * distinct + self-join + pair-count shape this replaces — and the
    * orderkey shuffle moves ~one row per order, not one per lineitem,
    * thanks to the partial aggregation. At 100 TB the per-group state is
    * the per-order supplier set, bounded by order width, never the
    * corpus. Shared by [[qTriangles]] and [[qKcore]]. */
  private def coSupplyEdges(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val sets = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
    sets
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= TriMinShared)
      .select(col("a"), col("b"))
  }

  /** The same edge list as [[coSupplyEdges]] for the DuckDB oracle (the
    * simple distinct + self-join form — the gate hash-proves the
    * join-free Spark distillation equivalent). */
  private val coSupplyEdgesSql: String =
    s"""SELECT l1.l_suppkey AS a, l2.l_suppkey AS b
       |  FROM lineitem l1 JOIN lineitem l2
       |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey
       |  GROUP BY 1, 2
       |  HAVING count(DISTINCT l1.l_orderkey) >= $TriMinShared""".stripMargin

  /** Triangle counting + local clustering coefficients over the supplier
    * co-supply graph (suppliers sharing ≥ [[TriMinShared]] orders) — the
    * third iterative-graph-family operator next to connected components
    * and PageRank, and the standard cohesion metric for community /
    * fraud-ring analysis over a link graph distilled from fact tables.
    *
    * Scale design — DEGREE-ORDERED wedge enumeration (Latapy 2008
    * "compact-forward"; Suri & Vassilvitskii 2011 for the MapReduce
    * form): every edge is oriented from its lower-(degree, id) endpoint
    * to its higher one, wedges are pairs of out-edges at their lowest
    * vertex, and the closure test is one equi-join back on the oriented
    * edge list. Each triangle is found exactly once, and per-vertex
    * wedge work is bounded by out-degree ≤ O(√|E|) — the hub that ruins
    * the naive a<b enumeration (its wedge count is deg², concentrated
    * in one task) never materializes. The oracle replays the same
    * triangle set with the simple a<b<c triple join, so the gate
    * hash-proves the oriented enumeration exact. */
  val qTriangles: Q = Q.sql(
    "q_triangles",
    s"""WITH e AS (
       |  $coSupplyEdgesSql
       |), t AS (
       |  SELECT e1.a, e1.b, e2.b AS c
       |  FROM e e1
       |  JOIN e e2 ON e2.a = e1.b
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
       |), pn AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
       |    SELECT a AS node FROM t
       |    UNION ALL SELECT b FROM t
       |    UNION ALL SELECT c FROM t
       |  ) GROUP BY node
       |), deg AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
       |    SELECT a AS node FROM e UNION ALL SELECT b FROM e
       |  ) GROUP BY node
       |)
       |SELECT d.node, d.degree, CAST(coalesce(pn.tri, 0) AS BIGINT) AS n_triangles,
       |  CASE WHEN d.degree < 2 THEN 0.0
       |       ELSE round(2.0 * coalesce(pn.tri, 0) / (d.degree * (d.degree - 1)), 6)
       |  END AS clustering
       |FROM deg d LEFT JOIN pn ON pn.node = d.node
       |ORDER BY d.node""".stripMargin,
    doc = "degree-ordered triangle counting + clustering coefficients (co-supply graph)") { (s, d) =>
    // node-bounded edge list; scratch-cached because degrees, orientation,
    // and the final report all read it — and materialized with one cheap
    // action BEFORE its consumers launch: persist() does not dedupe
    // concurrent first computation (NOTES lesson 11b)
    val e = graft.ScratchCache.tracked(coSupplyEdges(s, d))
    e.count()
    // degrees; consumed by the orientation (twice) and the final report
    val deg = graft.ScratchCache.tracked(
      e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree")))
    deg.count()
    // orient each edge from its lower-(degree, id) endpoint to the higher
    val da = deg.select(col("node").as("a"), col("degree").as("dega"))
    val db = deg.select(col("node").as("b"), col("degree").as("degb"))
    val aLower = (col("dega") < col("degb")) ||
      (col("dega") === col("degb") && col("a") < col("b"))
    // consumed three times (both wedge legs + the closure probe):
    // scratch-cached so the fact-table self-join materializes once
    val oriented = graft.ScratchCache.tracked(
      e.join(broadcast(da), "a").join(broadcast(db), "b")
        .select(
          when(aLower, col("a")).otherwise(col("b")).as("src"),
          when(aLower, col("b")).otherwise(col("a")).as("dst"),
          when(aLower, col("degb")).otherwise(col("dega")).as("degdst")))
    oriented.count()
    // wedges at the lowest-order vertex: two out-edges, canonically ordered
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("degdst").as("dv"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("degdst").as("dw"))
    val vLower = (col("dv") < col("dw")) ||
      (col("dv") === col("dw") && col("v") < col("w"))
    val wedges = o1.join(o2, "src").filter(vLower)
    // closure: the (v, w) edge, if present, is oriented v→w (v is lower)
    val closure = oriented.select(col("src").as("v"), col("dst").as("w"))
    val tris = wedges.join(closure, Seq("v", "w"))
      .select(col("src").as("x"), col("v").as("y"), col("w").as("z"))
    val perNode = tris.select(col("x").as("node"))
      .unionAll(tris.select(col("y").as("node")))
      .unionAll(tris.select(col("z").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(
        col("node"), col("degree").cast("long").as("degree"),
        coalesce(col("tri"), lit(0L)).cast("long").as("n_triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(round(
            lit(2.0) * coalesce(col("tri"), lit(0L)) / (col("degree") * (col("degree") - 1)), 6))
          .as("clustering"))
      .orderBy("node")
  }

  /** Peel-round cap for [[qKcore]] — both engines run EXACTLY this many
    * rounds (the Spark loop may exit early only at a fixpoint, where
    * further rounds are no-ops), so the gate holds round-for-round with
    * the oracle's unrolled CTE chain whether or not the peel has
    * converged. Measured convergence on the co-supply graph: 5 rounds at
    * sf0.1 (the only tested SF where the peel prunes at all — smaller SFs
    * are complete graphs and fix in one round); 8 leaves headroom. */
  val KcoreRounds = 8

  /** K-core decomposition (Seidman 1983; Batagelj & Zaveršnik 2003 for
    * the peeling algorithm) at a DATA-DERIVED threshold k = ⌊¾·avg
    * degree⌋ (integer form (6·|E|)/(4·|V|), exact in both engines):
    * repeatedly delete nodes of
    * degree < k until the remainder — the k-core — is stable. The core is
    * the standard "dense backbone" extraction for community mining and
    * for pruning low-connectivity noise before expensive per-node graph
    * work; on the co-supply graph the derived k lands ON the graph's
    * degeneracy at sf0.1 (k=71), so the peel is a real multi-round
    * cascade there, not a single filter.
    *
    * Output keeps EVERY initial node with an `in_core` flag and its
    * before/after degrees, so the result is never empty even where the
    * core is (and the pruned set is visible, not silently dropped).
    *
    * Scale design: the fact-scale work is the one-pass edge distillation
    * ([[coSupplyEdges]]); each peel round on the node-bounded graph is
    * one degree aggregation plus two BROADCAST semi-joins of the
    * (tiny, shrinking) keep-set against the edge list, with
    * `localCheckpoint` truncating lineage per round (NOTES lesson 10 —
    * an iterative rebind without it re-analyzes a plan that nests every
    * prior round). k itself derives from two scalar counts, never a
    * collected table. The oracle unrolls the same [[KcoreRounds]] rounds
    * as chained CTEs. */
  val qKcore: Q = Q.sql(
    "q_kcore", {
      val rounds = (1 to KcoreRounds).map { r =>
        val prev = if (r == 1) "e" else s"g${r - 1}"
        s"""n$r AS MATERIALIZED (
           |  SELECT node FROM (SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev) _u$r
           |  GROUP BY node HAVING count(*) >= (SELECT k FROM kk)
           |), g$r AS MATERIALIZED (
           |  SELECT t.a, t.b FROM $prev t
           |  JOIN n$r x ON t.a = x.node JOIN n$r y ON t.b = y.node
           |)""".stripMargin
      }.mkString(", ")
      // every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and the
      // round chain references each round several times — inlined, the
      // plan (and the parquet-scan count) grows exponentially in rounds
      s"""WITH e AS MATERIALIZED (
         |  $coSupplyEdgesSql
         |), an AS MATERIALIZED (
         |  SELECT node, count(*) AS deg
         |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) _n GROUP BY node
         |), kk AS MATERIALIZED (
         |  SELECT (6 * (SELECT count(*) FROM e)) // (4 * (SELECT count(*) FROM an)) AS k
         |), $rounds,
         |cd AS (
         |  SELECT node, count(*) AS cdeg
         |  FROM (SELECT a AS node FROM g$KcoreRounds UNION ALL SELECT b FROM g$KcoreRounds) _c
         |  GROUP BY node
         |)
         |SELECT an.node, CAST(an.deg AS BIGINT) AS degree,
         |  CAST(CASE WHEN cd.node IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core,
         |  CAST(coalesce(cd.cdeg, 0) AS BIGINT) AS core_degree,
         |  CAST((SELECT k FROM kk) AS BIGINT) AS k
         |FROM an LEFT JOIN cd ON cd.node = an.node
         |ORDER BY an.node""".stripMargin
    },
    doc = s"k-core peel at k=(6|E|)/(4|V|), $KcoreRounds fixed rounds (co-supply graph)") {
    (s, d) =>
      val e = graft.ScratchCache.tracked(coSupplyEdges(s, d))
      val m = e.count() // materializes the fan-out cache AND supplies |E|
      val an = graft.ScratchCache.tracked(
        e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg")))
      val v = an.count()
      // plan-choice scalar, not data movement: k is two counts combined
      val k = if (v == 0) 0L else (6L * m) / (4L * v)
      var g = e
      var prev = m
      var r = 0
      var stable = false
      // ONE peel round per checkpoint+count: unlike ConnectedComponents'
      // two-rounds-per-probe cadence, batching rounds here LOSES — the
      // second round's keep-set derives from the un-materialized first
      // round, so the first peel evaluates twice (broadcast build + probe
      // side); measured 6.1 s vs 5.0 s at sf0.1. The degree aggregate
      // forces a materialization point per round.
      while (r < KcoreRounds && !stable) {
        val keep = g.select(col("a").as("node")).unionAll(g.select(col("b").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("kd"))
          .filter(col("kd") >= k).select(col("node"))
        g = g
          .join(broadcast(keep.withColumnRenamed("node", "a")), "a")
          .join(broadcast(keep.withColumnRenamed("node", "b")), "b")
          .localCheckpoint(true)
        val n = g.count()
        // a fixpoint makes every further round a no-op, so stopping here
        // is exactly the oracle's round-$KcoreRounds state
        stable = n == prev
        prev = n
        r += 1
      }
      val cd = g.select(col("a").as("node")).unionAll(g.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("cdeg"))
      an.join(cd, Seq("node"), "left")
        .select(
          col("node"),
          col("deg").cast("long").as("degree"),
          when(col("cdeg").isNotNull, 1L).otherwise(0L).as("in_core"),
          coalesce(col("cdeg"), lit(0L)).cast("long").as("core_degree"),
          lit(k).as("k"))
        .orderBy("node")
  }

  /** Walk length for [[qRandomWalk]] (3 hops → 4-node walks, the short
    * end of node2vec's typical 3–80 range — enough to exercise the
    * per-step plan shape without bloating the gate). */
  val WalkSteps = 3

  /** Step-seeded edge hash for [[qRandomWalk]] — shared arithmetic between
    * engines: pure BIGINT multiply-add mod a prime, so both compute the
    * identical value (multipliers sized so suppkeys up to ~1e12 cannot
    * overflow int64). */
  private def walkHashSql(src: String, dst: String, step: Int): String =
    s"(CAST($src AS BIGINT) * 1103515 + CAST($dst AS BIGINT) * 2654435 + $step * 97) % 1000003"

  /** Hash-seeded random walks over the co-supply graph — the corpus
    * generator for graph-embedding training (DeepWalk, Perozzi 2014;
    * node2vec, Grover 2016): from every node, [[WalkSteps]] hops, each
    * hop choosing the neighbor minimizing a step-seeded hash. A real
    * deployment swaps the hash for a seeded PRNG with the same shape;
    * keeping it a pure arithmetic hash makes the walk bit-deterministic,
    * so the gate hash-proves the whole distributed pipeline.
    *
    * Scale design: the hop-i choice depends only on (current node, step),
    * so ALL [[WalkSteps]] transition tables — argmin over each node's
    * neighbors, one per step — come out of a SINGLE map-side-combined
    * aggregation over the edge list (`min(struct(h_i, dst))` per step in
    * one groupBy: one edge shuffle total, never a per-walk window, never
    * a walk × edge shuffle of fanout degree). The walk table then chains
    * [[WalkSteps]] equi-joins against these node-bounded transition
    * tables, each shuffling walk rows on the current-node key (broadcast
    * when the graph is small enough, as here). The oracle replays the
    * same argmin with row_number windows. */
  val qRandomWalk: Q = Q.sql(
    "q_random_walk", {
      val steps = (1 to WalkSteps).map { i =>
        s"""b$i AS (
           |  SELECT src, dst FROM (
           |    SELECT src, dst, row_number() OVER (PARTITION BY src
           |      ORDER BY ${walkHashSql("src", "dst", i)}, dst) AS rn
           |    FROM sym) _r$i WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val joins = (1 to WalkSteps).map { i =>
        val prev = if (i == 1) "nodes.n0" else s"b${i - 1}.dst"
        s"JOIN b$i ON b$i.src = $prev"
      }.mkString("\n")
      val outs = (1 to WalkSteps).map(i => s"b$i.dst AS n$i").mkString(", ")
      s"""WITH e AS (
         |$coSupplyEdgesSql
         |), sym AS (
         |  SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e
         |), nodes AS (
         |  SELECT DISTINCT src AS n0 FROM sym
         |),
         |$steps
         |SELECT n0, $outs
         |FROM nodes
         |$joins
         |ORDER BY n0""".stripMargin
    },
    doc = s"deterministic $WalkSteps-hop random walks (DeepWalk corpus) on the co-supply graph") {
    (s, d) =>
      val e = graft.ScratchCache.tracked(coSupplyEdges(s, d))
      e.count() // materialize before the fan-out (NOTES lesson 11b)
      val sym = e.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
      def h(step: Int) =
        (col("src").cast("long") * 1103515L + col("dst").cast("long") * 2654435L +
          lit(step * 97L)) % 1000003L
      // ALL per-step transition tables from one aggregation pass over the
      // edge list (one shuffle; min(struct) combines map-side, ties break
      // on dst inside the struct) — scratch-cached for its WalkSteps join
      // consumers and materialized before the fan-out (NOTES lesson 11b)
      val trans = graft.ScratchCache.tracked(
        sym
          .groupBy(col("src"))
          .agg(
            (1 to WalkSteps).map(i => min(struct(h(i).as("h"), col("dst"))).as(s"m$i")).head,
            (2 to WalkSteps).map(i => min(struct(h(i).as("h"), col("dst"))).as(s"m$i")): _*))
      trans.count()
      def best(step: Int) =
        trans.select(col("src"), col(s"m$step.dst").as(s"n$step"))
      val nodes = trans.select(col("src").as("n0"))
      (1 to WalkSteps)
        .foldLeft(nodes) { (walk, i) =>
          val prev = if (i == 1) "n0" else s"n${i - 1}"
          walk.join(broadcast(best(i)), col(prev) === col("src")).drop("src")
        }
        .orderBy("n0")
  }

  /** Neighbors kept per node when building the kNN graph. */
  val LpKnnK = 3

  /** kNN-graph construction + common-neighbor link prediction. The
    * thresholded co-supply graph is a clique at small scale (every
    * supplier pair shares orders), so the graph here is the standard
    * sparsifier instead: each supplier keeps its [[LpKnnK]] strongest
    * partners by shared-order count (ties to the smaller id), and the
    * union of those picks is the undirected kNN graph — the construction
    * that precedes most graph clustering and ANN-graph serving. On it,
    * every NON-adjacent pair sharing a neighbor is scored with the
    * Jaccard of neighbor sets (Liben-Nowell & Kleinberg 2003) and the
    * top 20 candidate edges come back — the open wedges [[qTriangles]]
    * discards, ranked.
    *
    * Scale design: pair weights come from the same join-free in-row
    * distillation as [[coSupplyEdges]] (per-order supplier sets, pairs
    * generated in-row — no fact-scale self-join); the per-node top-k is
    * a rank window Spark executes as WindowGroupLimit (bounded state, no
    * full per-node sort); one symmetric adjacency feeds degrees and both
    * wedge sides; existing edges leave via one anti-join; the global
    * top-20 is TakeOrderedAndProject. Per-node degree is bounded by k
    * out-picks plus in-picks, so wedge fan-out Σdeg² stays near-linear
    * in nodes. Jaccard = cn/(da+db−cn) is one division on integer
    * inputs, so the ranking is engine-exact. */
  val qLinkPred: Q = Q.sql(
    "q_link_pred",
    s"""WITH pc AS (
       |  SELECT l1.l_suppkey AS a, l2.l_suppkey AS b,
       |    CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS shared
       |  FROM lineitem l1 JOIN lineitem l2
       |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey
       |  GROUP BY 1, 2),
       |dir AS (SELECT a AS u, b AS v, shared FROM pc
       |  UNION ALL SELECT b AS u, a AS v, shared FROM pc),
       |knn AS (SELECT u, v FROM (
       |  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY shared DESC, v) AS rn
       |  FROM dir) t WHERE rn <= $LpKnnK),
       |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM knn),
       |und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
       |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS dg FROM und GROUP BY u),
       |cn AS (SELECT p.v AS a, q.v AS b, CAST(count(*) AS BIGINT) AS cn
       |  FROM und p JOIN und q ON q.u = p.u AND p.v < q.v GROUP BY p.v, q.v),
       |nb AS (SELECT c.a, c.b, c.cn FROM cn c
       |  LEFT JOIN e ON e.a = c.a AND e.b = c.b WHERE e.a IS NULL)
       |SELECT nb.a, nb.b, nb.cn AS common_neighbors,
       |  CAST(nb.cn AS DOUBLE) / (da.dg + db.dg - nb.cn) AS jacc
       |FROM nb JOIN deg da ON da.u = nb.a JOIN deg db ON db.u = nb.b
       |ORDER BY jacc DESC, nb.a, nb.b LIMIT 20""".stripMargin,
    doc = "kNN graph build + common-neighbor Jaccard link prediction, top-20 open wedges") {
    (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // join-free pair weights: per-order supplier sets, in-row pairs
      val pc = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
        .select(explode(flatten(transform(col("ss"), (x, i) =>
          transform(slice(col("ss"), i + lit(2), size(col("ss"))),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).cast("long").as("shared"))
      val dir = pc.select(col("a").as("u"), col("b").as("v"), col("shared"))
        .unionByName(pc.select(col("b").as("u"), col("a").as("v"), col("shared")))
      val wk = Window.partitionBy(col("u")).orderBy(col("shared").desc, col("v"))
      val knn = dir.withColumn("rn", row_number().over(wk)).filter(col("rn") <= LpKnnK)
      val e = graft.ScratchCache.tracked(
        knn.select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
          .distinct())
      e.count() // four consumers: symmetric adjacency (x2 wedge sides) + anti-join
      val und = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val deg = und.groupBy(col("u")).agg(count(lit(1)).cast("long").as("dg"))
      val cn = und.as("p").join(und.as("q"),
          col("p.u") === col("q.u") && col("p.v") < col("q.v"))
        .groupBy(col("p.v").as("a"), col("q.v").as("b"))
        .agg(count(lit(1)).cast("long").as("cn"))
      val nb = cn.join(e, Seq("a", "b"), "left_anti")
      nb.join(deg.select(col("u").as("a"), col("dg").as("da")), "a")
        .join(deg.select(col("u").as("b"), col("dg").as("db")), "b")
        .select(col("a"), col("b"), col("cn").as("common_neighbors"),
          (col("cn").cast("double") / (col("da") + col("db") - col("cn"))).as("jacc"))
        .orderBy(col("jacc").desc, col("a"), col("b"))
        .limit(20)
  }

  /** Degree assortativity of the part CO-PURCHASE graph (Newman 2002,
    * "Assortative mixing in networks") — do frequently-bundled parts link
    * to other hubs (r > 0) or to the periphery (r < 0)? The one-number
    * structural summary next to [[qTriangles]]' clustering and
    * [[qKcore]]'s shells. Parts rather than [[coSupplyEdges]]' suppliers:
    * the supplier graph is COMPLETE (hence regular, r undefined) below
    * sf0.1, while the part graph has real degree variance at every SF.
    *
    * Exactness: with M edges and end degrees (j, k), Newman's r rewrites
    * over EXACT integer edge sums S_jk = Σjk, S_1 = Σ(j+k), S_2 = Σ(j²+k²)
    * as r = (4M·S_jk − S_1²) / (2M·S_2 − S_1²) — numerator and denominator
    * are exact DECIMAL(38,0)/HUGEINT products (good to ~10⁹ edges at
    * degree ~10⁴), the statistic is one division of their double casts,
    * round(9). A regular graph (denominator 0) yields NULL in both
    * engines via an explicit integer-zero CASE, not a float-inf skew.
    *
    * Scale shape: edges are generated IN-ROW from per-order part sets
    * (the [[coSupplyEdges]] move — pairs bounded by order width², linear
    * in orders, no self-join) then deduplicated on the pair key; degrees
    * are one count over the exploded endpoint list; the per-edge degree
    * pickup is two joins against that vertex-grain map (dwarfed by the
    * edge list — broadcast at bench SF); one hash aggregate folds the
    * four sums. No window, no sort. */
  val qAssortativity: Q = Q.sql(
    "q_assortativity",
    s"""WITH e AS (
       |  SELECT l1.l_partkey AS a, l2.l_partkey AS b
       |  FROM lineitem l1 JOIN lineitem l2
       |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
       |  GROUP BY 1, 2
       |), deg AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS dg
       |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) _u GROUP BY 1
       |), j AS (
       |  SELECT da.dg AS ja, db.dg AS jb
       |  FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
       |), s AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS m,
       |    CAST(sum(ja * jb) AS HUGEINT) AS sjk,
       |    CAST(sum(ja + jb) AS HUGEINT) AS s1,
       |    CAST(sum(ja * ja + jb * jb) AS HUGEINT) AS s2
       |  FROM j)
       |SELECT CAST(m AS BIGINT) AS m_edges,
       |  (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
       |  CASE WHEN 2 * m * s2 - s1 * s1 = 0 THEN NULL
       |    ELSE round(CAST(4 * m * sjk - s1 * s1 AS DOUBLE)
       |      / CAST(2 * m * s2 - s1 * s1 AS DOUBLE), 9) END AS assortativity
       |FROM s""".stripMargin,
    doc = "Newman degree assortativity of the part co-purchase graph (exact integer edge sums)") {
    (s, d) =>
      // in-row pair generation from per-order part sets — linear in orders
      val e = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + lit(2), size(col("ps"))),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .distinct()
      val deg = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
      val dec = "decimal(38,0)"
      val j = e
        .join(broadcast(deg.select(col("v").as("a"), col("dg").as("ja"))), "a")
        .join(broadcast(deg.select(col("v").as("b"), col("dg").as("jb"))), "b")
      val sums = j.agg(
        count(lit(1)).cast(dec).as("m"),
        sum(col("ja") * col("jb")).cast(dec).as("sjk"),
        sum(col("ja") + col("jb")).cast(dec).as("s1"),
        sum(col("ja") * col("ja") + col("jb") * col("jb")).cast(dec).as("s2"))
      val nv = deg.agg(count(lit(1)).cast("long").as("n_vertices"))
      val den = lit(2) * col("m") * col("s2") - col("s1") * col("s1")
      sums.crossJoin(broadcast(nv))
        .select(
          col("m").cast("long").as("m_edges"),
          col("n_vertices"),
          when(den === 0, lit(null).cast("double"))
            .otherwise(round((lit(4) * col("m") * col("sjk") - col("s1") * col("s1"))
              .cast("double") / den.cast("double"), 9))
            .as("assortativity"))
  }

  /** BFS hop cap shared by the Spark frontier loop and the oracle's
    * recursive CTE — both clip at the same depth, so the reached sets
    * are identical by construction. */
  val BfsMaxHops = 8

  /** Single-source BFS hop-distance profile over the repeat-co-purchase
    * part graph (pairs sharing ≥ 2 orders), from the highest-degree hub
    * (ties → lowest id) — the reachability primitive missing next to
    * PageRank / components / k-core / triangles: "how much of the graph
    * is within k hops of the hub" is the expansion curve a
    * recommendation or fraud traversal budget is sized from.
    *
    * Scale design — frontier BFS, never per-pair paths: edges come from
    * the same in-row pair generation as [[qAssortativity]] (linear in
    * orders, no fact self-join) with the ≥2-shared-orders filter; the
    * adjacency is checkpointed ONCE and reused by every round; each
    * round is one frontier⋈adjacency equi-join + one anti-join against
    * the settled set (first discovery = min distance, so no
    * min-aggregate over revisits), with `localCheckpoint` truncating
    * the loop's lineage (NOTES lesson 10). Rounds are capped at
    * [[BfsMaxHops]]; per-round work is frontier-edge-bounded. The
    * oracle replays the traversal as a recursive CTE with the same
    * cap and a min-per-node collapse. All-integer output. */
  val qBfsHops: Q = Q.sql(
    "q_bfs_hops",
    s"""WITH RECURSIVE e AS (
       |  SELECT l1.l_partkey AS a, l2.l_partkey AS b
       |  FROM lineitem l1 JOIN lineitem l2
       |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
       |  GROUP BY 1, 2 HAVING count(DISTINCT l1.l_orderkey) >= 2
       |), adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
       |deg AS (SELECT u, count(*) AS dg FROM adj GROUP BY 1),
       |src AS (SELECT u FROM deg ORDER BY dg DESC, u LIMIT 1),
       |walk AS (
       |  -- seed FROM src directly (not a scalar subquery): an empty edge
       |  -- set then seeds zero rows, matching the Spark frontier loop,
       |  -- instead of a phantom NULL-node (dist=0, n=1) row
       |  SELECT u AS node, 0 AS dist FROM src
       |  UNION
       |  SELECT adj.v, walk.dist + 1
       |  FROM walk JOIN adj ON adj.u = walk.node
       |  WHERE walk.dist < $BfsMaxHops
       |), d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY 1)
       |SELECT CAST(dist AS INT) AS dist, CAST(count(*) AS BIGINT) AS n_nodes
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    doc = "BFS hop-distance histogram from the co-purchase hub (frontier loop vs recursive CTE)") {
    (s, d) =>
      val e = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + lit(2), size(col("ps"))),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .select(col("a"), col("b"))
      val adj = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint(true)
      val src = adj.groupBy("u").agg(count(lit(1)).as("dg"))
        .orderBy(col("dg").desc, col("u")).limit(1)
      var dist = src.select(col("u").as("node"), lit(0).as("dist")).localCheckpoint(true)
      var frontier = dist
      var r = 1
      while (r <= BfsMaxHops && !frontier.isEmpty) {
        val next = frontier.join(adj, col("node") === col("u"))
          .select(col("v").as("node")).distinct()
          .join(dist, Seq("node"), "left_anti")
          .select(col("node"), lit(r).as("dist"))
          .localCheckpoint(true)
        dist = dist.unionAll(next).localCheckpoint(true)
        frontier = next
        r += 1
      }
      dist.groupBy("dist")
        .agg(count(lit(1)).as("n_nodes"))
        .select(col("dist").cast("int").as("dist"), col("n_nodes"))
        .orderBy("dist")
  }

  val all: Seq[Q] = Seq(qPagerank, qTextrank, qTriangles, qKcore, qRandomWalk, qLinkPred,
    qAssortativity, qBfsHops)
}
