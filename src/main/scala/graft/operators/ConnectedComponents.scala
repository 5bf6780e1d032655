package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step a dedup pipeline runs AFTER near-duplicate pair detection:
  * similarity pairs are transitive in intent (A≈B, B≈C ⇒ one document
  * survives of {A,B,C}), so canonical selection needs components, not
  * pairs.
  *
  * Algorithm: iterative minimum-label propagation with pointer doubling.
  * Every node starts labeled with itself; each round every node takes the
  * min of its own and its neighbors' labels, then jumps to its label's
  * label; stop when a round changes nothing — O(log diameter) rounds,
  * each a constant number of hash shuffles on the (post-LSH, corpus-≪)
  * pair graph. The driver only ever sees one aggregate per round (the
  * label-sum convergence probe), never the data.
  *
  * Round cost engineering (this operator is fixed-overhead-bound at
  * small scale, shuffle-bound at 100 TB — both favor fewer stages):
  *   - self-loops are added during symmetrization, so a node's own label
  *     rides the same neighbor-min aggregation and the hop is ONE join +
  *     ONE groupBy — no separate "keep my own label" left-join per round;
  *   - labels only ever decrease, so Σ(labels) is strictly monotone and
  *     "sum unchanged" ⟺ "no node changed": convergence is a cheap
  *     aggregate over the just-checkpointed frame, not a join against the
  *     previous round;
  *   - every round localCheckpoints (lineage MUST truncate — see below).
  */
object ConnectedComponents {

  /** @param edges two-column frame of undirected edges (src, dst) — any
    *   orientation, duplicates fine.
    * @return (node, component) — component = min node id reachable;
    *   every node appearing in any edge is present. */
  def components(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val src = edges.columns(0)
    val dst = edges.columns(1)
    // materialize the pair list ONCE: the caller's edge frame is typically
    // the whole near-dup detection pipeline, and the 4-branch
    // symmetrization below would otherwise re-run it per branch
    val e = edges.localCheckpoint(true)
    // symmetrize once, with self-loops. Iterative DataFrame algorithms
    // MUST truncate lineage each round (localCheckpoint): otherwise every
    // iteration's logical plan embeds the previous one's and Catalyst
    // re-analysis grows without bound (measured: the loop "hangs" in
    // planning after a few rounds) — the same reason GraphFrames
    // checkpoints. Checkpointing also mints fresh attribute ids, so
    // sym⋈labels is never a same-lineage self-join.
    // sym and every round's labels checkpoint LAZILY: the convergence
    // probe that immediately follows is the materializing action, so each
    // round costs ONE job (probe = materialize) instead of two (eager
    // checkpoint job + probe job); wall-clock is shuffle-bound so this
    // trims scheduler overhead, not stage work. Only `e` stays eager: it
    // guards the caller's whole near-dup pipeline from the 4-way
    // symmetrization fan-out, where lazy first-touch could recompute the
    // upstream per branch. (Pre-partitioning sym on the join key was
    // tried and reverted: localCheckpoint drops outputPartitioning — the
    // LogicalRDD replans with a fresh Exchange regardless.)
    val sym = e.select(col(src).as("a"), col(dst).as("b"))
      .union(e.select(col(dst).as("a"), col(src).as("b")))
      .union(e.select(col(src).as("a"), col(src).as("b")))
      .union(e.select(col(dst).as("a"), col(dst).as("b")))
      .distinct()
      .localCheckpoint(false)
    // round 0 fused into initialization: with self-loops in sym, the
    // neighbor-min aggregation IS "min(self, direct neighbors)" — exactly
    // the first propagation round, for one aggregation.
    val init = sym.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("component"))
      .localCheckpoint(false)

    // CONTRACTION: project the graph onto its init labels and iterate on
    // THAT. After the init round every node points at the min of its
    // closed neighborhood, so connectivity between labels fully encodes
    // connectivity between nodes (labels are node ids; the global min of
    // a component labels itself). The quotient graph has one node per
    // distinct label and one edge per adjacent label pair — on a dedup
    // pair graph (dense near-clique clusters) that is orders of magnitude
    // below the node/edge count, so every propagation round shuffles
    // label-sized frames, not corpus-sized ones. Bench: 5 rounds × 0.35 s
    // on the full graph became 0.35 s of quotient build + rounds too
    // small to measure; at 100 TB the same contraction bounds iterative
    // shuffle volume by the cluster-count, not the corpus.
    val la = init.select(col("node").as("qa"), col("component").as("la"))
    val lb = init.select(col("node").as("qb"), col("component").as("lb"))
    val quotient = sym
      .join(la, col("a") === col("qa"))
      .join(lb, col("b") === col("qb"))
      .select(col("la").as("a"), col("lb").as("b"))
      .filter(col("a") =!= col("b"))
      .union(init.select(col("component").as("a"), col("component").as("b")).distinct())
      .distinct()
      .localCheckpoint(false)

    // pointer-doubling min-label propagation on the quotient graph
    var labels = quotient.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("component"))
      .localCheckpoint(false)
    // sum() over an empty frame is SQL NULL — an edge frame with zero rows
    // (LSH found no near-dup pairs) must yield an empty labels frame, not
    // an NPE, so the convergence probe reads the aggregate as nullable.
    var prevSum = labels.agg(coalesce(sum(col("component")), lit(0L))).first().getLong(0)
    // one propagation round: hop (every label-node takes min over its
    // neighborhood's labels — own label included via the quotient
    // self-loops), then a pointer-doubling jump to the label OF the
    // current label (labels are node ids, so it's a self-lookup).
    // Propagation distance doubles per round → O(log diameter) rounds
    // instead of O(diameter).
    def step(cur: DataFrame): DataFrame = {
      val hop = quotient
        .join(cur, quotient("a") === cur("node"))
        .groupBy(col("b").as("node"))
        .agg(min(col("component")).as("component"))
      val m = hop.select(col("node").as("cnode"), col("component").as("ccomp"))
      hop
        .join(m, hop("component") === m("cnode"), "left")
        .select(
          col("node"),
          least(col("component"), coalesce(col("ccomp"), col("component"))).as("component"))
    }
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      // TWO rounds per convergence probe: on the contracted graph the
      // data is label-count-sized, so a round's cost is job/stage
      // latency, not shuffle volume — probing half as often halves the
      // loop's blocking actions at the price of (at most) one redundant
      // tiny round after the fixed point.
      val next = step(step(labels)).localCheckpoint(false)
      // labels are node ids and only ever decrease, so the label sum is
      // strictly monotone decreasing until convergence: sum unchanged ⟺
      // fixed point. One aggregate over checkpointed data, no join.
      val s = next.agg(coalesce(sum(col("component")), lit(0L))).first().getLong(0)
      changed = s != prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    // map every node through its init label's final component
    init
      .join(
        labels.select(col("node").as("cnode"), col("component").as("ccomp")),
        col("component") === col("cnode"), "left")
      .select(col("node"), coalesce(col("ccomp"), col("component")).as("component"))
  }
}
