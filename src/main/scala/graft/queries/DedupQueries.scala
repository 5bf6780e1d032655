package graft.queries

import graft.Tables._
import graft.text.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`: exact (content-hash groupBy),
  * MinHash signatures, and MinHash-LSH near-duplicate candidate pairs with
  * exact n-gram Jaccard verification.
  *
  * Scale design: exact dedup is one hash-shuffle on a 16-byte key; the
  * LSH path is the classic shingle → minhash → band → bucket-join
  * pipeline — candidate generation is an equi-join on (band, value), so
  * the quadratic all-pairs comparison collapses to per-bucket pairs. Only
  * candidate pairs (a vanishing fraction at 100 TB) pay the exact-Jaccard
  * set intersection.
  */
object DedupQueries {

  /** Exact dedup: group docs by content hash, mark non-canonical rows. */
  val qDedupExact: Q = Q.sql(
    "q_dedup_exact",
    """SELECT doc_id, md5(text) AS content_hash,
      |  CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS group_n,
      |  CAST(min(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT) AS keep_id,
      |  CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 0 ELSE 1 END AS is_dup
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    doc = "exact dedup via content-hash groupBy (hash shuffle on md5)") { (s, d) =>
    val w = Window.partitionBy(md5(col("text")))
    documents(s, d)
      .select(
        col("doc_id"),
        md5(col("text")).as("content_hash"),
        count(lit(1)).over(w).as("group_n"),
        min(col("doc_id")).over(w).as("keep_id"),
        when(col("doc_id") === min(col("doc_id")).over(w), 0L).otherwise(1L).as("is_dup"))
      .orderBy("doc_id")
  }

  /** MinHash signatures: k=8 seeded min-hashes over word 3-gram shingles. */
  val qMinhashSignature: Q = Q.sql(
    "q_minhash_signature",
    (0 until MinhashK)
      .map(j => s"  ${minhashSql(j)} AS h$j")
      .mkString("SELECT doc_id,\n", ",\n", "\nFROM documents\nORDER BY doc_id"),
    doc = "MinHash signatures (k=8) over word 3-gram shingles") { (s, d) =>
    sigsOf(documents(s, d).repartition(s.sparkContext.defaultParallelism)).orderBy("doc_id")
  }

  /** Staged signature pipeline: tokens → shingles → k minhashes. Each stage
    * is its own select so the expensive upstream column is computed once
    * per row (CollapseProject won't re-inline a non-cheap expression that
    * is referenced k times). */
  private def sigsOf(docs: org.apache.spark.sql.DataFrame) =
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), shinglesOf(col("w")).as("sh"))
      .select(
        col("doc_id") +: (0 until MinhashK).map(j => minhashOf(col("sh"), j).as(s"h$j")): _*)

  /** MinHash-LSH near-dup pairs: 4 bands × 2 rows; candidates share a
    * band; exact Jaccard (distinct shingle sets) filters ≥ 0.5. */
  val qDedupMinhash: Q = Q.sql(
    "q_dedup_minhash", {
      val sigCols = (0 until MinhashK).map(j => s"${minhashSql(j)} AS h$j").mkString(", ")
      val bandRows = (0 until MinhashK / 2)
        .map(b => s"SELECT doc_id, $b AS band, h${2 * b} || h${2 * b + 1} AS bv FROM sigs")
        .mkString("\nUNION ALL\n")
      s"""WITH sigs AS (
         |  SELECT doc_id, $sigCols FROM documents
         |), bands AS (
         |$bandRows
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
         |), sh AS (
         |  SELECT doc_id, list_distinct($shinglesSql) AS s FROM documents
         |)
         |SELECT c.id1, c.id2,
         |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(x.s || y.s)) AS jaccard
         |FROM cand c JOIN sh x ON c.id1 = x.doc_id JOIN sh y ON c.id2 = y.doc_id
         |WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / len(list_distinct(x.s || y.s)) >= 0.5
         |ORDER BY id1, id2""".stripMargin
    },
    doc = "MinHash-LSH candidate pairs + exact Jaccard >= 0.5") { (s, d) =>
    // the corpus arrives as one small parquet file = one partition; the
    // per-row hashing is CPU-bound, so spread it across the cluster first
    // (at 100 TB the scan is naturally parallel and this is a no-op cost)
    val docs = documents(s, d).repartition(s.sparkContext.defaultParallelism)
    // one pass computes all bands (posexplode, not a 4-way union that
    // would recompute the signatures per branch); persisted because the
    // self-join below reads it twice — at scale this materialization is
    // the standard "signature table" of an LSH pipeline (tiny vs corpus)
    val bands = sigsOf(docs)
      .select(
        col("doc_id"),
        array((0 until MinhashK / 2).map(b =>
          concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))): _*).as("bvs"))
      .select(col("doc_id"), posexplode(col("bvs")).as(Seq("band", "bv")))
      .transform(graft.ScratchCache.tracked)
    val a = bands.as("a"); val b = bands.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val sh = docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), array_distinct(shinglesOf(col("w"))).as("s"))
      .transform(graft.ScratchCache.tracked)
    val jac = size(array_intersect(col("x.s"), col("y.s"))).cast("double") /
      size(array_distinct(concat(col("x.s"), col("y.s"))))
    cand
      .join(sh.as("x"), col("id1") === col("x.doc_id"))
      .join(sh.as("y"), col("id2") === col("y.doc_id"))
      .select(col("id1"), col("id2"), jac.as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy("id1", "id2")
  }

  /** SimHash near-dup pairs: hamming(sig_a, sig_b) <= 3 over the 32-bit
    * signatures, found via hamming-LSH banding — the signature splits into
    * 4 8-bit bands and, by pigeonhole, any pair within distance 3 shares
    * at least one untouched band. So the band equi-join is not an
    * approximation here: it finds EXACTLY the pairs a quadratic scan
    * would, while touching only per-bucket pairs (the standard SimHash
    * dedup index; at 100 TB the band table shuffles once on (band, bits)).
    */
  val qDedupSimhash: Q = Q.sql(
    "q_dedup_simhash", {
      val sigInt = "CAST(list_sum(list_transform(generate_series(1, 32), " +
        "i -> CASE WHEN substr(sig, i, 1) = '1' THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE 0 END)) AS BIGINT)"
      val bandRows = (0 until 4)
        .map(b => s"SELECT doc_id, si, $b AS band, substr(sig, ${8 * b + 1}, 8) AS bv FROM sigs")
        .mkString("\nUNION ALL\n")
      s"""WITH hashed AS (
         |  SELECT doc_id, $tokenHashesSql AS hs FROM documents
         |), sigs0 AS (
         |  SELECT doc_id, ${simhashOfSql("hs")} AS sig FROM hashed
         |), sigs AS (
         |  SELECT doc_id, sig, $sigInt AS si FROM sigs0
         |), bands AS (
         |$bandRows
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.si AS i1, b.si AS i2
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
         |)
         |SELECT id1, id2, CAST(bit_count(xor(i1, i2)) AS BIGINT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(i1, i2)) <= 3
         |ORDER BY id1, id2""".stripMargin
    },
    doc = "SimHash near-dup pairs (hamming <= 3) via exact 4-band hamming-LSH") { (s, d) =>
    // signature carried as the integer form: the hamming check is one
    // bit_count(xor) per candidate instead of a 32-element HOF walk, and
    // the candidate distinct dedups longs, not 32-char strings
    val sigs = documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), simhashFast(col("text")).as("sig"))
      .select(col("doc_id"), col("sig"), conv(col("sig"), 2, 10).cast("long").as("si"))
    val bands = sigs
      .select(
        col("doc_id"),
        col("si"),
        posexplode(array((0 until 4).map(b => substring(col("sig"), 8 * b + 1, 8)): _*))
          .as(Seq("band", "bv")))
      .transform(graft.ScratchCache.tracked)
    val cand = bands.as("a")
      .join(
        bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.si").as("i1"), col("b.si").as("i2"))
      .distinct()
    cand
      .select(
        col("id1"), col("id2"),
        bit_count(col("i1").bitwiseXOR(col("i2"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("id1", "id2")
  }

  /** Exact n-gram Jaccard similarity via an inverted-index join — the
    * no-approximation dedup path: explode each doc's distinct word
    * 3-grams, self-join on the gram, count shared grams per pair,
    * jaccard = inter / (n1 + n2 - inter). No hashing error: every pair
    * sharing a gram is scored exactly.
    *
    * Scale note: the gram-key join is skew-sensitive (a stop-gram shared
    * by half the corpus makes a quadratic bucket). [[jaccardPrefixJoin]]
    * is the result-identical PPJoin-style hardening for that regime; at
    * bench scale the direct join is ~4× faster (1.8 s vs 7.5 s at
    * sf0.1), so it stays the benched form — `JaccardEquivalenceSpec`
    * pins that both produce exactly the same pairs. */
  val qJaccardNgram: Q = Q.sql(
    "q_jaccard_ngram",
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct($shinglesSql) AS s FROM documents
       |), ex AS (
       |  SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh
       |), pairs AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS n1, b.n AS n2,
       |    CAST(count(*) AS BIGINT) AS inter
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT id1, id2, inter,
       |  round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 6) AS jaccard
       |FROM pairs
       |WHERE round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 6) >= 0.5
       |ORDER BY id1, id2""".stripMargin,
    doc = "exact n-gram Jaccard >= 0.5 via inverted-index join (no LSH)") { (s, d) =>
    jaccardDirect(documents(s, d).repartition(s.sparkContext.defaultParallelism))
  }

  /** Distinct word-3-gram shingle sets: the shared first stage of every
    * exact-Jaccard variant. */
  private def shingleSets(docs: org.apache.spark.sql.DataFrame) =
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), array_distinct(shinglesOf(col("w"))).as("s"))

  /** Direct inverted-index exact Jaccard (the benign-distribution plan —
    * see [[qJaccardNgram]] scale note). */
  def jaccardDirect(
      docs: org.apache.spark.sql.DataFrame,
      tau: Double = 0.5): org.apache.spark.sql.DataFrame = {
    val ex = shingleSets(docs)
      .select(col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("g"))
    val jac = round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6)
    ex.as("a")
      .join(ex.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(count(lit(1)).as("inter"))
      .select(col("id1"), col("id2"), col("inter"), jac.as("jaccard"))
      .filter(jac >= lit(tau))
      .orderBy("id1", "id2")
  }

  /** Skew-hardened exact Jaccard join (PPJoin-style prefix filtering).
    *
    * Theorem: J(A,B) >= τ implies |A∩B| >= τ·max(|A|,|B|), so under any
    * global gram order two qualifying docs must share a gram within
    * their first |S| - ceil(τ·|S|) + 1 grams. Ordering each doc's grams
    * by GLOBAL FREQUENCY ascending puts only the rarest grams in the
    * index: a stop-gram shared by half the corpus never lands in a
    * prefix, so the quadratic hot bucket that kills the direct
    * inverted-index join at 100 TB cannot form. Only surviving candidate
    * pairs pay the exact set intersection. Result-identical to
    * [[qJaccardNgram]] (candidates are pruned, true positives never) —
    * pinned by JaccardEquivalenceSpec. Costs ~4× the direct join at
    * small SF (frequency pass + per-doc ranking), which is why it is the
    * hostile-distribution variant, not the benched default. */
  def jaccardPrefixJoin(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      tau: Double = 0.5): org.apache.spark.sql.DataFrame =
    jaccardPrefixJoin(documents(s, d).repartition(s.sparkContext.defaultParallelism), tau)

  /** [[jaccardPrefixJoin]] over any (doc_id, text) frame. */
  def jaccardPrefixJoin(
      docs: org.apache.spark.sql.DataFrame,
      tau: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingleSets(docs) // read 3×: index build + both sides of the verify join
      .transform(graft.ScratchCache.tracked)
    val ex = sh.select(col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("g"))
    val freq = ex.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    val ranked = ex
      .join(freq, "g")
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("cnt"), col("g"))))
      .filter(col("rk") <= col("n") - ceil(lit(tau) * col("n")) + 1)
      .select(col("doc_id"), col("g"))
    val cand = ranked.as("a")
      .join(ranked.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val inter = size(array_intersect(col("x.s"), col("y.s"))).cast("long")
    val jac = round(
      col("inter").cast("double") / (size(col("x.s")) + size(col("y.s")) - col("inter")), 6)
    cand
      .join(sh.as("x"), col("id1") === col("x.doc_id"))
      .join(sh.as("y"), col("id2") === col("y.doc_id"))
      .withColumn("inter", inter)
      .select(col("id1"), col("id2"), col("inter"), jac.as("jaccard"))
      .filter(col("jaccard") >= lit(tau))
      .orderBy("id1", "id2")
  }

  /** What [[jaccardAdaptive]] decided and why: `hotShare` is the fraction
    * of probed docs containing the most common gram. */
  final case class JaccardChoice(
      hotShare: Double,
      usedPrefixJoin: Boolean,
      result: org.apache.spark.sql.DataFrame)

  /** Adaptive exact-Jaccard plan choice.
    *
    * The direct inverted-index join is ~4× faster on benign corpora but
    * quadratic in the hottest gram bucket: a boilerplate shingle shared by
    * a fraction f of N docs alone produces (fN)²/2 joined rows — at 100 TB
    * a single hot gram is a job-killer. The prefix-filtered join is immune
    * (hot grams never land in a prefix) but pays a frequency pass +
    * per-doc ranking. So: probe a cheap sample's gram document-frequency
    * first and pick the plan the distribution actually needs —
    * Catalyst-style cost-based choice at the operator level, decided from
    * data statistics rather than guessed. AQE's skew-split cannot save the
    * direct join here: splitting a hot bucket still materializes its
    * quadratic pair count; the fix is a different algorithm, not a finer
    * partition.
    *
    * Both plans produce IDENTICAL pairs (JaccardEquivalenceSpec /
    * AdaptiveJaccardSpec), so the choice affects cost only.
    *
    * @param hotShareThreshold document-share of the hottest gram above
    *   which the corpus counts as skewed. 0.05 ⇒ the worst bucket alone
    *   would contribute ≥ (0.05N)²/2 ≈ N²/800 pairs — already far beyond
    *   linear work at any real N, while harmless for the sub-percent
    *   shares benign shingle corpora show.
    * @param probeFraction doc sample rate for the frequency probe; the
    *   probe is two tiny jobs over the sample, not a pass over the corpus.
    */
  def jaccardAdaptive(
      docs: org.apache.spark.sql.DataFrame,
      tau: Double = 0.5,
      hotShareThreshold: Double = 0.05,
      probeFraction: Double = 0.1): JaccardChoice = {
    val probe = (if (probeFraction >= 1.0) docs else docs.sample(probeFraction, 7L)).persist()
    val nProbe = probe.count().max(1L)
    val hottest = shingleSets(probe)
      .select(explode(col("s")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .agg(max(col("cnt")).as("m"))
      .collect()(0)
    val hotShare =
      if (hottest.isNullAt(0)) 0.0 else hottest.getLong(0).toDouble / nProbe
    probe.unpersist()
    val skewed = hotShare >= hotShareThreshold
    val out = if (skewed) jaccardPrefixJoin(docs, tau) else jaccardDirect(docs, tau)
    JaccardChoice(hotShare, skewed, out)
  }

  /** The adaptive chooser as a gated registry query. Its RESULT is
    * plan-independent (both variants return identical pairs — spec-pinned),
    * so the oracle is exactly [[qJaccardNgram]]'s SQL: the gate checks the
    * full probe→choose→join pipeline lands on the same exact answer. */
  val qJaccardAdaptive: Q = Q.sql(
    "q_jaccard_adaptive",
    qJaccardNgram.oracle.get,
    doc = "exact Jaccard with probe-driven plan choice (direct vs prefix-filtered)") { (s, d) =>
    jaccardAdaptive(documents(s, d).repartition(s.sparkContext.defaultParallelism)).result
  }

  /** Dedup CLUSTERING: near-dup pairs are transitive in intent (A≈B, B≈C
    * ⇒ keep one of {A,B,C}), so canonical selection runs connected
    * components over the pair graph — here the SimHash near-dup pairs,
    * clustered by [[graft.operators.ConnectedComponents]] (iterative
    * min-label propagation, one shuffle per round, diameter-bounded).
    * The oracle replays components with a recursive CTE over the SAME
    * pair SQL. Output: every paired doc, its cluster id (min doc id in
    * the component), and whether it is the canonical survivor. */
  val qDedupClusters: Q = Q.sql(
    "q_dedup_clusters",
    s"""WITH RECURSIVE pairs AS (
       |${qDedupSimhash.oracle.get}
       |), e2 AS (
       |  SELECT id1 AS a, id2 AS b FROM pairs
       |  UNION
       |  SELECT id2, id1 FROM pairs
       |), walk AS (
       |  SELECT a AS node, a AS label FROM e2
       |  UNION
       |  SELECT e2.a AS node, walk.label FROM e2 JOIN walk ON e2.b = walk.node
       |)
       |SELECT node AS doc_id,
       |  CAST(min(label) AS BIGINT) AS cluster,
       |  CAST(CASE WHEN node = min(label) THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
       |FROM walk GROUP BY node
       |ORDER BY doc_id""".stripMargin,
    doc = "dedup clustering: connected components over SimHash near-dup pairs") { (s, d) =>
    clustersOf(s, d)
      .select(col("doc_id"), col("cluster"),
        when(col("doc_id") === col("cluster"), 1L).otherwise(0L).as("is_canonical"))
      .orderBy("doc_id")
  }

  /** The unsorted (doc_id, cluster) component frame behind
    * [[qDedupClusters]] — shared with [[qClusterSplit]], which joins it
    * and must NOT pay the presentation orderBy (a global range sort the
    * join immediately destroys). */
  private def clustersOf(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val pairs = qDedupSimhash.run(s, d).select(col("id1"), col("id2"))
    graft.operators.ConnectedComponents
      .components(pairs)
      .select(col("node").as("doc_id"), col("component").cast("long").as("cluster"))
  }

  /** Cluster-aware train/val/test split — the leakage guard a naive
    * per-document hash split (q_hash_split) lacks: near-duplicate
    * documents in the same cluster must land in the SAME split, or the
    * test set contains paraphrases of training documents. Every document
    * maps to its near-dup cluster (its own id when unpaired) and the
    * 80/10/10 assignment hashes the CLUSTER id, so a cluster cannot
    * straddle splits by construction (`ClusterSplitSpec` additionally
    * shows the per-document split DOES straddle — the negative control).
    *
    * Scale design: reuses the q_dedup_clusters component frame (banded
    * LSH pairs + rounds-bounded connected components) plus one left
    * join and one aggregate; the split function is a pure per-row hash.
    */
  val qClusterSplit: Q = Q.sql(
    "q_cluster_split",
    s"""WITH comp0 AS (
       |${qDedupClusters.oracle.get}
       |), grp AS (
       |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS gid
       |  FROM documents d LEFT JOIN comp0 c ON d.doc_id = c.doc_id
       |), assigned AS (
       |  SELECT doc_id, gid,
       |    CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'test' ELSE 'val' END AS split
       |  FROM (SELECT doc_id, gid,
       |    CAST(('0x' || substr(md5(CAST(gid AS VARCHAR)), 1, 6)) AS BIGINT) % 10000 AS b
       |    FROM grp) t
       |)
       |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT gid) AS BIGINT) AS n_groups
       |FROM assigned GROUP BY split
       |ORDER BY split""".stripMargin,
    doc = "cluster-aware 80/10/10 split: near-dup clusters assigned atomically (no leakage)") {
    (s, d) =>
      val clusters = clustersOf(s, d).select(col("doc_id").as("cid"), col("cluster"))
      val grp = documents(s, d)
        .join(clusters, col("doc_id") === col("cid"), "left")
        .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("gid"))
      val b = conv(substring(md5(col("gid").cast("string")), 1, 6), 16, 10).cast("long") % 10000
      grp
        .select(col("doc_id"), col("gid"),
          when(b < 8000, "train").when(b < 9000, "test").otherwise("val").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("gid")).as("n_groups"))
        .orderBy("split")
  }

  /** Shingle CONTAINMENT — the asymmetric cousin of Jaccard that catches
    * near-SUPERSETS (a doc whose text swallows another doc's: boilerplate
    * wrapping, quote-and-extend, template stuffing). J(A,B) stays low when
    * |A| ≪ |B| even if A ⊂ B; C = |A∩B| / min(|A|,|B|) is 1.0 there.
    * Same inverted-index join shape as [[qJaccardNgram]] (and the same
    * skew caveat → [[jaccardPrefixJoin]] hardening applies); integer
    * counts + one exact division, so the oracle matches bit-for-bit. */
  val qContainment: Q = Q.sql(
    "q_containment",
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct($shinglesSql) AS s FROM documents
       |), ex AS (
       |  SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh
       |), pairs AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n AS n1, b.n AS n2,
       |    CAST(count(*) AS BIGINT) AS inter
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT id1, id2, inter,
       |  round(CAST(inter AS DOUBLE) / least(n1, n2), 6) AS containment,
       |  round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 6) AS jaccard
       |FROM pairs
       |WHERE CAST(inter AS DOUBLE) / least(n1, n2) >= 0.8
       |ORDER BY id1, id2""".stripMargin,
    doc = "near-superset detection: shingle containment >= 0.8 (inverted-index join)") { (s, d) =>
    val ex = shingleSets(documents(s, d).repartition(s.sparkContext.defaultParallelism))
      .select(col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("g"))
    val cont = col("inter").cast("double") / least(col("n1"), col("n2"))
    val jac = round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6)
    ex.as("a")
      .join(ex.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(count(lit(1)).as("inter"))
      .filter(cont >= 0.8)
      .select(col("id1"), col("id2"), col("inter"),
        round(cont, 6).as("containment"), jac.as("jaccard"))
      .orderBy("id1", "id2")
  }

  /** INCREMENTAL dedup: a new batch (odd doc ids — "today's crawl")
    * deduped against the existing corpus (even doc ids — "all previous
    * snapshots") without ever comparing the base corpus to itself.
    *
    * The base side's (band, bits) table is the persisted dedup INDEX a
    * real pipeline maintains: built once per snapshot, appended as
    * batches are accepted. Each new batch computes its own band table
    * and equi-joins the index — work scales with |batch| × bucket hit
    * rate, not |corpus|², and by the 4-band pigeonhole the join finds
    * EXACTLY the pairs within hamming ≤ 3 (same guarantee as
    * [[qDedupSimhash]]). Output: every batch doc with a base match —
    * how many base docs it collides with, the earliest one, and the
    * closest distance. */
  /** Shared incremental-dedup oracle: signature build, banding, the
    * base(even)/batch(odd) split, band-bucket probe, hamming ≤ 3 verify,
    * per-batch-doc rollup — used verbatim by the inline gate
    * [[qDedupIncremental]] and the persisted-index gate
    * [[qDedupIndexProbe]] (the stored band table IS the even half of the
    * `bands` CTE, materialized). */
  private val dedupIncrementalOracleSql: String = {
      val sigInt = "CAST(list_sum(list_transform(generate_series(1, 32), " +
        "i -> CASE WHEN substr(sig, i, 1) = '1' THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE 0 END)) AS BIGINT)"
      val bandRows = (0 until 4)
        .map(b => s"SELECT doc_id, si, $b AS band, substr(sig, ${8 * b + 1}, 8) AS bv FROM sigs")
        .mkString("\nUNION ALL\n")
      s"""WITH hashed AS (
         |  SELECT doc_id, $tokenHashesSql AS hs FROM documents
         |), sigs0 AS (
         |  SELECT doc_id, ${simhashOfSql("hs")} AS sig FROM hashed
         |), sigs AS (
         |  SELECT doc_id, sig, $sigInt AS si FROM sigs0
         |), bands AS (
         |$bandRows
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS base_id, b.doc_id AS batch_id,
         |    CAST(bit_count(xor(a.si, b.si)) AS BIGINT) AS h
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
         |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
         |    AND bit_count(xor(a.si, b.si)) <= 3
         |)
         |SELECT batch_id AS doc_id,
         |  CAST(count(*) AS BIGINT) AS n_base_matches,
         |  CAST(min(base_id) AS BIGINT) AS first_match,
         |  CAST(min(h) AS BIGINT) AS min_hamming
         |FROM pairs
         |GROUP BY batch_id
         |ORDER BY doc_id""".stripMargin
  }

  /** One row per (doc, band): 32-bit SimHash split into 4 8-bit bands,
    * carrying the integer signature for the hamming verify — the dedup
    * index row shape, shared by the inline and persisted gates AND by the
    * streaming probe ([[graft.streaming.StreamingDedup.probeBandIndex]]):
    * one definition, so a band-layout change can never silently break
    * batch/stream parity. */
  private[graft] def simhashBands(docs: org.apache.spark.sql.DataFrame) =
    docs
      .select(col("doc_id"), simhashFast(col("text")).as("sig"))
      .select(col("doc_id"), col("sig"), conv(col("sig"), 2, 10).cast("long").as("si"))
      .select(
        col("doc_id"), col("si"),
        posexplode(array((0 until 4).map(b => substring(col("sig"), 8 * b + 1, 8)): _*))
          .as(Seq("band", "bv")))

  /** Probe a batch band table against a base band index: band-bucket
    * equi-join, hamming ≤ 3 verify, one report row per matched batch
    * doc — the shared serving shape. */
  private def dedupProbe(
      batch: org.apache.spark.sql.DataFrame,
      base: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    batch.join(base, Seq("band", "bv"))
      .select(
        col("base_id"), col("doc_id").as("batch_id"),
        bit_count(col("base_si").bitwiseXOR(col("si"))).cast("long").as("h"))
      .filter(col("h") <= 3)
      .distinct()
      .groupBy(col("batch_id").as("doc_id"))
      .agg(
        count(lit(1)).as("n_base_matches"),
        min(col("base_id")).as("first_match"),
        min(col("h")).as("min_hamming"))
      .orderBy("doc_id")

  val qDedupIncremental: Q = Q.sql(
    "q_dedup_incremental",
    dedupIncrementalOracleSql,
    doc = "incremental dedup: new batch vs persisted base-corpus band index") { (s, d) =>
    val bands = simhashBands(
      documents(s, d).repartition(s.sparkContext.defaultParallelism))
    // base index: in production this is the PERSISTED table appended per
    // accepted batch ([[qDedupIndexProbe]] stores it for real); here both
    // sides derive from the same scan
    val base = bands.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id").as("base_id"), col("si").as("base_si"), col("band"), col("bv"))
    dedupProbe(bands.filter(pmod(col("doc_id"), lit(2)) === 1), base)
  }

  /** The dedup band index PERSISTED — completing the store-backed family
    * (IVF / IVF-PQ / PQ / BPE → dedup): the base corpus's (band, bits,
    * signature) table is built ONCE under the usual stamp/meta freshness
    * bracket, and every incoming batch dedups against the STORED table —
    * the index a crawl pipeline maintains across snapshots, probed
    * thousands of times between rebuilds. Work per probe is
    * |batch| × bucket hit rate; the base corpus is never rescanned.
    * Output row-identical to [[qDedupIncremental]] (shared oracle;
    * equality + store-not-recompute pinned in Round12OpsSpec). */
  val qDedupIndexProbe: Q = Q.sql(
    "q_dedup_index_probe",
    dedupIncrementalOracleSql,
    doc = "incremental dedup served from the PERSISTED base band index") { (s, d) =>
    import graft.operators.IndexStore
    val dir = IndexStore.dirFor(d, "dedup_bands")
    val stamp = IndexStore.sourceStamp(s"$d/documents.parquet")
    if (!IndexStore.isFresh(s, dir, stamp)) {
      val n = documents(s, d).count()
      val base = simhashBands(
        documents(s, d).repartition(s.sparkContext.defaultParallelism))
        .filter(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id").as("base_id"), col("si").as("base_si"), col("band"), col("bv"))
      IndexStore.publish(s, dir, n, Seq(("bands", base, Nil)), stamp)
    }
    val base = IndexStore
      .read(s, dir, "bands", "base_id LONG, base_si LONG, band INT, bv STRING")
    val batch = simhashBands(
      documents(s, d).repartition(s.sparkContext.defaultParallelism))
      .filter(pmod(col("doc_id"), lit(2)) === 1)
    dedupProbe(batch, base)
  }

  /** INCREMENTAL dedup-index maintenance — the lifecycle step between
    * [[qDedupIndexProbe]]'s build-once and a crawl pipeline's reality:
    * accepted batches are APPENDED into the stored band table so the
    * NEXT batch dedups against base + everything accepted since, without
    * ever rebuilding. Here: the base snapshot (even ids) is built, the
    * first batch (ids ≡ 1 mod 4) is appended — SimHash bands carry no
    * trained state, so append is pure accretion — and the second batch
    * (ids ≡ 3 mod 4) probes the STORED accreted table. Crash safety via
    * the usual meta bracket (invalidate first, meta last); appended-files
    * layout + inline row-identity pinned in Round12OpsSpec. */
  val qDedupIndexUpdate: Q = Q.sql(
    "q_dedup_index_update", {
      val sigInt = "CAST(list_sum(list_transform(generate_series(1, 32), " +
        "i -> CASE WHEN substr(sig, i, 1) = '1' THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE 0 END)) AS BIGINT)"
      val bandRows = (0 until 4)
        .map(b => s"SELECT doc_id, si, $b AS band, substr(sig, ${8 * b + 1}, 8) AS bv FROM sigs")
        .mkString("\nUNION ALL\n")
      s"""WITH hashed AS (
         |  SELECT doc_id, $tokenHashesSql AS hs FROM documents
         |), sigs0 AS (
         |  SELECT doc_id, ${simhashOfSql("hs")} AS sig FROM hashed
         |), sigs AS (
         |  SELECT doc_id, sig, $sigInt AS si FROM sigs0
         |), bands AS (
         |$bandRows
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS base_id, b.doc_id AS batch_id,
         |    CAST(bit_count(xor(a.si, b.si)) AS BIGINT) AS h
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
         |  WHERE (a.doc_id % 2 = 0 OR a.doc_id % 4 = 1) AND b.doc_id % 4 = 3
         |    AND bit_count(xor(a.si, b.si)) <= 3
         |)
         |SELECT batch_id AS doc_id,
         |  CAST(count(*) AS BIGINT) AS n_base_matches,
         |  CAST(min(base_id) AS BIGINT) AS first_match,
         |  CAST(min(h) AS BIGINT) AS min_hamming
         |FROM pairs
         |GROUP BY batch_id
         |ORDER BY doc_id""".stripMargin
    },
    doc = "dedup-index maintenance: batch 1 APPENDED, batch 2 probes the accreted index") {
    (s, d) =>
    import graft.operators.IndexStore
    val dir = IndexStore.dirFor(d, "dedup_bands_inc")
    val stamp = IndexStore.sourceStamp(s"$d/documents.parquet")
    if (!IndexStore.isFresh(s, dir, stamp)) {
      val n = documents(s, d).count()
      def bandsOf(pred: org.apache.spark.sql.Column) = simhashBands(
        documents(s, d).repartition(s.sparkContext.defaultParallelism))
        .filter(pred)
        .select(col("doc_id").as("base_id"), col("si").as("base_si"), col("band"), col("bv"))
      IndexStore.invalidate(dir)
      IndexStore.write(bandsOf(pmod(col("doc_id"), lit(2)) === 0), dir, "bands", Nil)
      // accepted batch 1 accretes into the SAME table — no rebuild
      IndexStore.append(bandsOf(pmod(col("doc_id"), lit(4)) === 1), dir, "bands", Nil)
      IndexStore.writeMeta(s, dir, n, stamp)
    }
    val base = IndexStore
      .read(s, dir, "bands", "base_id LONG, base_si LONG, band INT, bv STRING")
    val batch2 = simhashBands(
      documents(s, d).repartition(s.sparkContext.defaultParallelism))
      .filter(pmod(col("doc_id"), lit(4)) === 3)
    dedupProbe(batch2, base)
  }

  /** Similarity bar for [[qFuzzyVerify]] and the matching Levenshtein
    * band: a pair passes at sim ≥ 0.8, i.e. d ≤ 0.2·maxlen. The banded
    * distance is only lossless when 0.2·maxlen ≤ [[FuzzyBand]], i.e.
    * maxlen ≤ [[FuzzyBandSafeLen]] — pairs longer than that fall back to
    * the full DP per row (see [[qFuzzyVerify]]), so correctness never
    * rests on an unenforced fixture-length assumption. */
  val FuzzySimBar = 0.8
  val FuzzyBand = 120

  /** Longest pair (in max normalized chars) for which [[FuzzyBand]]
    * provably cannot exclude a sim ≥ [[FuzzySimBar]] pair: 120/0.2 = 600. */
  val FuzzyBandSafeLen: Int = (FuzzyBand / (1.0 - FuzzySimBar)).toInt

  /** Edit-distance VERIFICATION of the SimHash candidates — the
    * exact-verify stage a high-precision dedup pipeline runs last:
    * signatures propose, Levenshtein on normalized text disposes.
    *
    * Scale shape (a naive version measured 222 s at sf0.1 — the dense
    * template corpus yields 96k candidate pairs and full O(len²) DP per
    * pair is exactly the quadratic work LSH existed to avoid):
    *   - each doc verifies only its CLOSEST candidate (min hamming,
    *     id tiebreak) — canonical-assignment verify, linear in docs,
    *     and the rank≤1 window plans as `WindowGroupLimit`;
    *   - Spark computes the distance BANDED (`levenshtein(l, r, 120)`,
    *     O(len·band) with early exit, −1 beyond the band) whenever the
    *     band provably covers the passing region (maxlen ≤ 600 ⇒
    *     d ≤ 0.2·maxlen ≤ 120), and falls back to the full DP per row
    *     for longer pairs — a lazy CASE branch, so the output is
    *     bit-identical to the oracle's full-DP + sim filter for ANY
    *     document length, not just the current fixtures'.
    * ~3.3 s warm at sf0.1 (vs 222 s naive — 67×), same exact
    * semantics on the kept rows.
    *
    * Growth caveat: the VERIFY stage is linear in docs, but the gate's
    * candidate stage inherits [[qDedupSimhash]]'s fixed 4×8-bit bands
    * (256 buckets/band), whose in-bucket pairs grow n²/256 — measured
    * 80× wall at a 10× corpus. The corpus-size path is
    * [[fuzzyVerifyAuto]] over [[simhashPairsAuto]] (bands widen with
    * log₂ n, recall still exact by pigeonhole), probed by ScaleProbe;
    * the fixed width stays here for oracle parity. */
  val qFuzzyVerify: Q = Q.sql(
    "q_fuzzy_verify",
    s"""WITH pairs AS (
       |${qDedupSimhash.oracle.get}
       |), best AS (
       |  SELECT id1, id2, hamming FROM (
       |    SELECT id1, id2, hamming,
       |      row_number() OVER (PARTITION BY id1 ORDER BY hamming, id2) AS rk
       |    FROM pairs) WHERE rk = 1
       |), n AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
       |  FROM documents
       |)
       |SELECT b.id1, b.id2, b.hamming,
       |  CAST(levenshtein(x.norm, y.norm) AS BIGINT) AS edit_dist,
       |  round(1.0 - CAST(levenshtein(x.norm, y.norm) AS DOUBLE)
       |    / greatest(length(x.norm), length(y.norm)), 6) AS sim
       |FROM best b JOIN n x ON b.id1 = x.doc_id JOIN n y ON b.id2 = y.doc_id
       |WHERE 1.0 - CAST(levenshtein(x.norm, y.norm) AS DOUBLE)
       |    / greatest(length(x.norm), length(y.norm)) >= $FuzzySimBar
       |ORDER BY id1""".stripMargin,
    doc = "banded edit-distance verify of each doc's best SimHash candidate") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val pairs = qDedupSimhash.run(s, d)
    val w = Window.partitionBy(col("id1")).orderBy(col("hamming"), col("id2"))
    val best = pairs
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
    val n = documents(s, d).select(
      col("doc_id"), trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
    val maxLen = greatest(length(col("x.norm")), length(col("y.norm")))
    // CaseWhen branches evaluate lazily (interpreted and codegen), so the
    // O(len²) full DP only ever runs for pairs the band can't cover.
    val lev = when(maxLen <= FuzzyBandSafeLen, levenshtein(col("x.norm"), col("y.norm"), FuzzyBand))
      .otherwise(levenshtein(col("x.norm"), col("y.norm")))
    val sim = lit(1.0) - lev.cast("double") / maxLen
    best
      .join(n.as("x"), col("id1") === col("x.doc_id"))
      .join(n.as("y"), col("id2") === col("y.doc_id"))
      // AQE coalesces the join output by BYTES (~tens of MB → 1-2
      // partitions), blind to the O(band·len) edit-distance DP each row
      // is about to pay — the whole verify ran on ~2 cores (cpu_ratio
      // 1.8, 4.4 s). A pinned fan-out shuffle of the pair frame is
      // microseconds next to the DP it parallelizes; same fix shape at
      // 100 TB, where the candidate frame is still tiny next to its CPU.
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("id1"), col("id2"), col("hamming"),
        lev.cast("long").as("edit_dist"), sim.as("sim0"))
      .filter(col("edit_dist") >= 0 && col("sim0") >= FuzzySimBar)
      .select(col("id1"), col("id2"), col("hamming"), col("edit_dist"),
        round(col("sim0"), 6).as("sim"))
      .orderBy("id1")
  }

  /** End-to-end dedup RESULT: the cleaned corpus. Composes the whole
    * near-dup pipeline — SimHash signatures → band LSH → exact hamming
    * pairs → connected components → canonical survivors — and reports
    * per-language totals: how many documents the corpus had, how many
    * survive dedup (non-paired docs plus one canonical per cluster), and
    * how many were removed. Identical docs hash to hamming 0, so exact
    * duplicates collapse through the same path. This is the number a
    * data team actually ships: corpus size before/after dedup by
    * language. */
  val qCorpusClean: Q = Q.sql(
    "q_corpus_clean",
    s"""WITH comp AS (
       |${qDedupClusters.oracle.get}
       |), removed AS (
       |  SELECT doc_id FROM comp WHERE is_canonical = 0
       |)
       |SELECT d.lang,
       |  CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(count(*) FILTER (WHERE r.doc_id IS NULL) AS BIGINT) AS n_kept,
       |  CAST(count(*) FILTER (WHERE r.doc_id IS NOT NULL) AS BIGINT) AS n_removed
       |FROM documents d LEFT JOIN removed r ON d.doc_id = r.doc_id
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin,
    doc = "cleaned-corpus report: per-language totals after near-dup dedup") { (s, d) =>
    val removed = qDedupClusters.run(s, d)
      .filter(col("is_canonical") === 0)
      .select(col("doc_id").as("rid"))
    documents(s, d)
      .join(removed, col("doc_id") === col("rid"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("rid").isNull, 1)).as("n_kept"),
        count(col("rid")).as("n_removed"))
      .orderBy("lang")
  }

  /** SUBSTRING-level duplication — the dedup mode whole-document
    * signatures cannot see: a document that copies a paragraph from
    * another while the rest differs (boilerplate, license headers,
    * templated spans). Per document: how many of its distinct word
    * 5-gram windows also occur in at least one OTHER document, i.e. the
    * exact-substring contamination fraction a
    * dedup-before-training pass thresholds on.
    *
    * Scale shape — this is NOT pairwise: distinct grams explode once,
    * document frequency per gram is one hash aggregation (map-side
    * combined), and the per-doc share is a second aggregation after an
    * equi-join back on the gram. Hot grams skew a reduce key, never
    * build a pair bucket — the same inverted-index discipline as
    * [[qJaccardNgram]], with no candidate pairs at all. */
  val qSubstringDup: Q = Q.sql(
    "q_substring_dup",
    s"""WITH g AS (
       |  SELECT doc_id, unnest(list_distinct($gram5Sql)) AS g FROM documents
       |), f AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY g
       |)
       |SELECT g.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |  round(CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
       |    AS shared_frac
       |FROM g JOIN f USING (g)
       |GROUP BY g.doc_id
       |ORDER BY doc_id""".stripMargin,
    doc = "substring-level duplication: shared 5-gram window fraction via inverted index") { (s, d) =>
    val g = documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(array_distinct(gram5Of(col("w")))).as("g"))
    // distinct grams per doc ⇒ df = plain count per gram
    val f = g.groupBy(col("g")).agg(count(lit(1)).as("df"))
    g.join(f, "g")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1).otherwise(0)).cast("long").as("n_shared"),
        round(
          sum(when(col("df") >= 2, 1).otherwise(0)).cast("double") / count(lit(1)), 6)
          .as("shared_frac"))
      .orderBy("doc_id")
  }

  /** Jaro-Winkler similarity over consecutive-doc text pairs — the
    * second fuzzy-match primitive next to q_fuzzy_verify's levenshtein:
    * O(n·window) instead of O(n²), prefix-weighted (entity/title
    * matching semantics). Scored by the custom codegen expression
    * [[graft.expressions.JaroWinkler]]; the oracle replays DuckDB's
    * built-in `jaro_winkler_similarity`, so the gate fuzz-checks the
    * whole algorithm (match window, transposition count, 0.7 boost
    * threshold, prefix cap) over every pair at three corpus sizes.
    * Raw doubles, no round() (NOTES lesson 12) — both engines build the
    * same (m, t, prefix) integers and the same IEEE formula tree.
    *
    * Scale shape: the pair generator is a self-join on adjacent ids
    * (shuffle on doc_id) feeding a narrow per-row scorer; a production
    * matcher would swap the generator for LSH candidates (q_dedup_minhash)
    * and keep the scorer unchanged. */
  val qJaroPairs: Q = Q.sql(
    "q_jaro_pairs",
    """SELECT d1.doc_id AS id1, d2.doc_id AS id2,
      |  jaro_winkler_similarity(d1.text, d2.text) AS jw
      |FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      |ORDER BY id1""".stripMargin,
    doc = "Jaro-Winkler fuzzy similarity (custom codegen expression vs DuckDB built-in)") { (s, d) =>
    val d1 = documents(s, d).select(col("doc_id").as("id1"), col("text").as("t1"))
    val d2 = documents(s, d).select(col("doc_id").as("id2"), col("text").as("t2"))
    d1.join(d2, col("id2") === col("id1") + 1)
      .select(
        col("id1"), col("id2"),
        graft.expressions.JaroWinkler.jaroWinkler(col("t1"), col("t2")).as("jw"))
      .orderBy("id1")
  }

  /** Chunk width (tokens) for line-level dedup — the "line" analogue for
    * a corpus whose documents carry no newlines: non-overlapping 8-token
    * windows, the paragraph-ish unit MassiveText/C4-style pipelines dedup
    * at below whole-document granularity. */
  val LineChunk = 8

  /** LINE-level exact dedup (Rae et al. 2021 "MassiveText" repetition
    * removal; C4's duplicate-span drop): split every document into
    * non-overlapping [[LineChunk]]-token chunks, compute each chunk's
    * document frequency across the corpus, and REMOVE chunks occurring in
    * ≥ 2 distinct documents — the span-level cleanup that whole-document
    * and near-dup dedup both miss (boilerplate headers, license blocks,
    * navigation text repeated across pages).
    *
    * Output per document: chunk counts before/after and an
    * order-independent checksum of the SURVIVING text — Σ over kept
    * chunks of a 48-bit integer fingerprint of (position, chunk). The
    * integer sum associates, so the cleaned-corpus fingerprint needs no
    * per-document ordered reassembly buffer (the q_bigram_lm lesson:
    * never hold a whole document in one aggregation buffer when an
    * order-independent form exists).
    *
    * Scale shape — inverted index, never pairwise: chunking is a narrow
    * per-row HOF (no shuffle), document frequency is one distinct +
    * count aggregation keyed on the chunk's md5 (16 bytes in the shuffle,
    * never the chunk text), and the verdict join is an equi-join back on
    * that hash. A viral chunk skews one reduce key, never builds a pair
    * bucket. */
  val qLineDedup: Q = Q.sql(
    "q_line_dedup", {
      val K = LineChunk
      s"""WITH t AS (
         |  SELECT doc_id, $tokensSql AS w FROM documents
         |), c AS (
         |  SELECT doc_id,
         |    CAST(generate_subscripts(chunks, 1) - 1 AS BIGINT) AS cid,
         |    unnest(chunks) AS chunk
         |  FROM (
         |    SELECT doc_id,
         |      list_transform(
         |        generate_series(0, (len(w) + ${K - 1}) // $K - 1),
         |        i -> array_to_string(list_slice(w, i*$K + 1, i*$K + $K), ' ')) AS chunks
         |    FROM t)
         |), f AS (
         |  SELECT md5(chunk) AS h, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM c GROUP BY md5(chunk)
         |)
         |SELECT c.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(count(*) FILTER (WHERE f.df >= 2) AS BIGINT) AS n_removed,
         |  round(CAST(count(*) FILTER (WHERE f.df < 2) AS DOUBLE) / count(*), 6) AS kept_frac,
         |  CAST(coalesce(sum(CASE WHEN f.df < 2
         |    THEN ('0x' || substr(md5(CAST(c.cid AS VARCHAR) || ':' || c.chunk), 1, 12))::BIGINT
         |    END), 0) AS BIGINT) AS kept_sig
         |FROM c JOIN f ON md5(c.chunk) = f.h
         |GROUP BY c.doc_id
         |ORDER BY doc_id""".stripMargin
    },
    doc = "line-level exact dedup: corpus-wide duplicate-chunk removal via inverted index") { (s, d) =>
    val K = LineChunk
    val t = documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id"), tokens(col("text")).as("w"))
    val nc = floor((size(col("w")) + (K - 1)) / lit(K.toDouble)).cast("long")
    val c = t
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), nc - 1),
          i => array_join(slice(col("w"), (i * K + 1).cast("int"), lit(K)), " ")))
          .as(Seq("cid", "chunk")))
      .select(
        col("doc_id"), col("cid").cast("long").as("cid"), col("chunk"),
        md5(col("chunk")).as("h"))
    val f = c.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val kept = col("df") < 2
    c.join(f, "h")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("df") >= 2, 1).otherwise(0)).cast("long").as("n_removed"),
        round(sum(when(kept, 1).otherwise(0)).cast("double") / count(lit(1)), 6)
          .as("kept_frac"),
        coalesce(
          sum(when(kept,
            conv(
              substring(md5(concat(col("cid").cast("string"), lit(":"), col("chunk"))), 1, 12),
              16, 10).cast("long"))),
          lit(0L)).cast("long").as("kept_sig"))
      .orderBy("doc_id")
  }

  /** Fixed-point quantum for sparse tf-idf weights (1e-6 resolution):
    * dot products and norms become exact integer/decimal sums, immune to
    * partial-aggregation order on both engines. */
  private val SparseQuantum = 1e6

  /** Absolute document-frequency cap for [[qSparseCosine]]'s inverted
    * index — the term that makes candidate volume LINEAR in corpus size
    * (see the qSparseCosine Scaladoc for the 10× probe measurement). */
  val SparseDfCap = 256L

  /** Weighted sparse cosine all-pairs (Bayardo, Ma & Srikant 2007,
    * "Scaling Up All Pairs Similarity Search"): document pairs with
    * tf-idf 3-gram cosine ≥ 0.5 — the WEIGHTED lexical similarity join
    * next to the set-based [[qJaccardNgram]] (Jaccard treats a shingle
    * shared once like one shared ten times and weighs boilerplate like
    * signal; idf-weighted cosine is what search-style near-dup scoring
    * actually uses).
    *
    * Scale design — inverted index with a DOCUMENT-FREQUENCY CAP: only
    * grams with df ≤ min((n+400)/20, [[SparseDfCap]]) enter the index.
    * The corpus-fraction term keeps small corpora meaningful; the
    * ABSOLUTE term is what makes the operator linear — a purely relative
    * cap (df ≤ n/20) lets per-gram pair fanout grow as (n/20)², i.e.
    * quadratically with corpus size, which the 10× ScaleProbe measured
    * as a 28× blowup (103 s) before the absolute cap. With it, candidate
    * volume is ≤ #grams·cap² ∝ n — probe re-measured 31 s for 10× the
    * corpus and exactly 10× the output pairs, i.e. linear against the
    * 3.7 s 1× time. A gram shared by >256 documents identifies nothing at
    * any scale; this is the frequency-pruning half of the all-pairs
    * algorithm (its remaining prefix ordering is [[jaccardPrefixJoin]]'s
    * territory). The cap is part of the operator's DEFINITION (weights,
    * norms, and cosines are computed over the capped representation on
    * both engines). Weights are quantized to [[SparseQuantum]] and
    * accumulated as DECIMAL — bit-identical across engines; one sqrt +
    * one division at the edge.
    *
    * Grams are keyed by a 60-bit md5-prefix INTEGER on both engines —
    * the minhash-family convention: int64 join/shuffle keys instead of
    * ~30-byte 3-word strings through the index's three shuffles, and
    * any astronomically-unlikely collision merges the same two grams on
    * both sides (part of the operator definition, not a divergence). */
  val qSparseCosine: Q = Q.sql(
    "q_sparse_cosine",
    s"""WITH tok AS (
       |  SELECT doc_id, CAST(('0x' || substr(md5(t0), 1, 15)) AS BIGINT) AS t
       |  FROM (SELECT doc_id, unnest($shinglesSql) AS t0 FROM documents) _t
       |), tf AS (
       |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
       |), df AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |w AS (
       |  SELECT tf.doc_id, tf.t,
       |    CAST(round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)) * $SparseQuantum, 0) AS BIGINT)
       |      AS wq
       |  FROM tf JOIN df ON tf.t = df.t CROSS JOIN n
       |  WHERE 20 * df.df <= n.n + 400 AND df.df <= $SparseDfCap
       |), nrm AS (
       |  SELECT doc_id, sqrt(CAST(sum(CAST(wq AS DECIMAL(19,0)) * CAST(wq AS DECIMAL(19,0)))
       |    AS DOUBLE)) AS nrm
       |  FROM w GROUP BY 1
       |), dot AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2,
       |    CAST(sum(CAST(a.wq AS DECIMAL(19,0)) * CAST(b.wq AS DECIMAL(19,0))) AS DOUBLE) AS dot
       |  FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT d.id1, d.id2, round(d.dot / (n1.nrm * n2.nrm), 6) AS cos
       |FROM dot d
       |JOIN nrm n1 ON n1.doc_id = d.id1
       |JOIN nrm n2 ON n2.doc_id = d.id2
       |WHERE d.dot / (n1.nrm * n2.nrm) >= 0.5
       |ORDER BY id1, id2""".stripMargin,
    doc = "weighted sparse cosine all-pairs: df-capped tf-idf inverted index (Bayardo 2007)") {
    (s, d) => sparseCosine(documents(s, d)).orderBy("id1", "id2")
  }

  /** tf-idf sparse cosine pairs over `docs(doc_id, text)` — see
    * [[qSparseCosine]] for the scale/parity design. Exposed for
    * planted-corpus property tests. */
  def sparseCosine(
      docs: org.apache.spark.sql.DataFrame,
      tau: Double = 0.5): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val gramKey = conv(substring(md5(col("t0")), 1, 15), 16, 10).cast("long")
    val tf = docs
      .repartition(spark.sparkContext.defaultParallelism)
      // stage tokens() before shinglesOf: shingles(text) inlines the
      // regex split into the shingle lambda, re-splitting per element
      // (O(tokens²) per doc — a large share of this query's historic
      // cpu_ratio ~20)
      .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(graft.text.TextFunctions.shinglesOf(col("w"))).as("t0"))
      .select(col("doc_id"), gramKey.as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    // df as a count-over-window on the SAME t-shuffle (not a groupBy +
    // self-join): tf then has exactly one consumer, so it needs no cache
    val wDf = Window.partitionBy(col("t"))
    val n = docs.agg(count(lit(1)).as("n"))
    val wq = round(
      col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)) * SparseQuantum, 0).cast("long")
    val w = graft.ScratchCache.tracked(
      tf.withColumn("df", count(lit(1)).over(wDf))
        .crossJoin(broadcast(n))
        .filter(lit(20) * col("df") <= col("n") + 400 && col("df") <= SparseDfCap)
        .select(col("doc_id"), col("t"), wq.as("wq")))
    // Materialize the cache with ONE cheap action before fan-out:
    // `persist()` does NOT dedupe a cold frame's CONCURRENT first
    // computation — the pair join's two sides and the norm aggregate are
    // independent stages that all launch at once and each recompute the
    // whole index while the cache is still filling (measured: 2.9 s →
    // 14-26 s in-battery, cpu_ratio ~20 — real duplicated work, shape
    // set by scheduler timing). One count() fills the cache exactly once.
    w.count()
    val wd = col("wq").cast("decimal(19,0)")
    val nrm = w.groupBy("doc_id")
      .agg(sqrt(sum(wd * wd).cast("double")).as("nrm"))
    val dot = w.as("a")
      .join(w.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(sum(col("a.wq").cast("decimal(19,0)") * col("b.wq").cast("decimal(19,0)"))
        .cast("double").as("dot"))
    val cos = col("dot") / (col("n1") * col("n2"))
    dot
      .join(nrm.select(col("doc_id").as("d1"), col("nrm").as("n1")), col("id1") === col("d1"))
      .join(nrm.select(col("doc_id").as("d2"), col("nrm").as("n2")), col("id2") === col("d2"))
      .filter(cos >= tau)
      .select(col("id1"), col("id2"), round(cos, 6).as("cos"))
  }

  /** SCALE PATH for SimHash near-dup as the corpus grows (the simhash
    * sibling of [[graft.queries.SimilarityQueries.nearDupLshAuto]]):
    * [[qDedupSimhash]]'s gate form pins a 32-bit signature in 4×8-bit
    * bands — 256 buckets per band, so in-bucket candidate pairs grow as
    * n²/256 (measured: the fuzzy-verify pipeline went 80× wall at a 10×
    * corpus). Here signatures are 64-bit
    * ([[graft.expressions.SimHash64]]) and the 4 DISJOINT top-bit bands
    * widen with log₂(n/targetBucket) (clamped to [8, 16] bits), holding
    * expected bucket occupancy — and therefore candidates per doc —
    * constant as n grows.
    *
    * Banding stays EXACT for maxHamming ≤ 3: the bands are disjoint bit
    * subsets, so by pigeonhole any pair differing in ≤ 3 of the 64 bits
    * agrees on at least one whole band and is GUARANTEED to surface as a
    * candidate. Widening bands only shrinks buckets, never recall
    * (`Round8OpsSpec` pins pairs == brute-force 64-bit hamming pairs).
    * One count() job probes n — the cheap-probe-then-choose shape of
    * [[jaccardAdaptive]]. Not oracle-gated: the band width depends on
    * the data, which statically-generated oracle SQL cannot; the
    * fixed-width [[qDedupSimhash]] stays the parity gate and this is the
    * documented 100 TB path (`ScaleProbe` drives it). */
  def simhashPairsAuto(
      docs: org.apache.spark.sql.DataFrame,
      maxHamming: Int = 3,
      targetBucket: Int = 64): org.apache.spark.sql.DataFrame = {
    // the pigeonhole exactness argument needs maxHamming + 1 disjoint
    // bands; with the fixed 4 bands the contract only holds to 3 —
    // enforce it rather than silently returning lossy recall
    require(maxHamming >= 0 && maxHamming <= 3,
      s"simhashPairsAuto's 4 disjoint bands guarantee exact recall only for " +
        s"maxHamming <= 3 (got $maxHamming)")
    val s = docs.sparkSession
    val n = docs.count()
    val w = math.min(16, math.max(8,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2)).toInt))
    val sigs = docs
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id"),
        graft.expressions.SimHash64
          .simhash64(graft.text.TextFunctions.tokens(col("text"))).as("si"))
    // bucket key = band · 2^w + band bits — ONE long per (doc, band), so
    // the candidate self-join shuffles ints and the band id rides inside
    // the key (the nearDupLsh convention)
    val bands = sigs
      .select(col("doc_id"), col("si"),
        explode(array((0 until 4).map { b =>
          shiftrightunsigned(col("si"), 64 - (b + 1) * w)
            .bitwiseAND(lit((1L << w) - 1)) + lit(b.toLong * (1L << w))
        }: _*)).as("bucket"))
      .transform(graft.ScratchCache.tracked)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.si").as("i1"), col("b.si").as("i2"))
      .distinct()
    cand
      .select(col("id1"), col("id2"),
        bit_count(col("i1").bitwiseXOR(col("i2"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** [[qFuzzyVerify]]'s full pipeline on the [[simhashPairsAuto]] scale
    * path: log-scaled banding proposes, the same canonical-assignment
    * banded-DP verify disposes. The verify stage is linear in docs (one
    * best candidate per doc); with the auto banding the PROPOSE stage is
    * too, so the end-to-end pipeline tracks corpus size. */
  def fuzzyVerifyAuto(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = simhashPairsAuto(documents(s, d))
    val w = Window.partitionBy(col("id1")).orderBy(col("hamming"), col("id2"))
    val best = pairs
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
    val n = documents(s, d).select(
      col("doc_id"), trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
    val maxLen = greatest(length(col("x.norm")), length(col("y.norm")))
    val lev = when(maxLen <= FuzzyBandSafeLen, levenshtein(col("x.norm"), col("y.norm"), FuzzyBand))
      .otherwise(levenshtein(col("x.norm"), col("y.norm")))
    val sim = lit(1.0) - lev.cast("double") / maxLen
    best
      .join(n.as("x"), col("id1") === col("x.doc_id"))
      .join(n.as("y"), col("id2") === col("y.doc_id"))
      .repartition(s.sparkContext.defaultParallelism) // DP is per-row CPU
      .select(col("id1"), col("id2"), col("hamming"),
        lev.cast("long").as("edit_dist"), sim.as("sim0"))
      .filter(col("edit_dist") >= 0 && col("sim0") >= FuzzySimBar)
      .select(col("id1"), col("id2"), col("hamming"), col("edit_dist"),
        round(col("sim0"), 6).as("sim"))
  }

  /** Duplicated-span window length (tokens). Any cross-document duplicate
    * run of ≥ [[DupSpanW]] tokens is guaranteed to contain at least one
    * shared window, so spans are found with single-token resolution at
    * their interiors and ≤ W−1 token slack at the ends. */
  val DupSpanW = 8

  /** Duplicated-SPAN detection — the windowed-hash approximation of
    * suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": remove repeated SPANS,
    * not whole near-dup documents): hash every [[DupSpanW]]-token sliding
    * window, keep windows whose content recurs in ≥2 DISTINCT documents,
    * and merge each document's surviving window positions into maximal
    * spans with a gaps-and-islands pass (consecutive start positions =
    * one span; the span covers [start, last_start + W − 1]). Per doc:
    * span count, duplicated-token total, longest span, and an EXACT
    * parts-per-million duplicated fraction (integer arithmetic — no
    * float rounding to diverge cross-engine).
    *
    * This catches what document-level dedup ([[qDedupSimhash]]) and
    * whole-doc fingerprints miss: boilerplate paragraphs and quoted
    * blocks inside otherwise-unique documents — the spans a span-level
    * cleaner would cut.
    *
    * Scale design: windows are one row per corpus token keyed by a
    * 16-byte md5 — the standard inverted-index shuffle, never all-pairs;
    * the recurrence count is a partial-aggregated single-distinct
    * groupBy (no Expand), and only recurring windows (a vanishing
    * fraction) flow into the join back. The islands pass windows by
    * doc_id — per-task state is one document's positions, bounded by doc
    * length like every per-doc fold here. */
  val qDupSpans: Q = Q.sql(
    "q_dup_spans",
    s"""WITH tok AS (
       |  SELECT doc_id, $tokensSql AS ts FROM documents
       |), wins AS (
       |  SELECT doc_id, len(ts) AS n, unnest(generate_series(1, len(ts) - ${DupSpanW - 1})) AS i, ts
       |  FROM tok WHERE len(ts) >= $DupSpanW
       |), keyed AS (
       |  SELECT doc_id, n, i,
       |    md5(array_to_string(list_slice(ts, i, i + ${DupSpanW - 1}), ' ')) AS k
       |  FROM wins
       |), dup AS (
       |  SELECT k FROM keyed GROUP BY k HAVING count(DISTINCT doc_id) >= 2
       |), hits AS (
       |  SELECT w.doc_id, w.n, w.i FROM keyed w JOIN dup USING (k)
       |), isl AS (
       |  SELECT doc_id, n, i,
       |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |  FROM hits
       |), spans AS (
       |  SELECT doc_id, max(n) AS n, min(i) AS s, max(i) + ${DupSpanW - 1} AS e
       |  FROM isl GROUP BY doc_id, grp
       |)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
       |  CAST(max(e - s + 1) AS BIGINT) AS max_span,
       |  CAST((1000000 * sum(e - s + 1)) // max(n) AS BIGINT) AS dup_ppm
       |FROM spans GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin,
    doc = s"duplicated-span detection: shared $DupSpanW-token windows merged into maximal spans") {
    (s, d) =>
      val W = DupSpanW
      val keyed = documents(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(col("doc_id"), tokens(col("text")).as("ts"))
        .withColumn("n", size(col("ts")))
        .filter(col("n") >= W)
        .select(col("doc_id"), col("n"),
          explode(transform(sequence(lit(1), col("n") - (W - 1)), i =>
            struct(i.as("i"),
              md5(concat_ws(" ", slice(col("ts"), i, lit(W)))).as("k")))).as("w"))
        .select(col("doc_id"), col("n"), col("w.i").as("i"), col("w.k").as("k"))
      val dup = keyed.groupBy(col("k"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("k"))
      val hits = keyed.join(dup, "k")
      val isl = hits.withColumn("grp",
        col("i") - row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("i"))))
      val spans = isl.groupBy(col("doc_id"), col("grp"))
        .agg(max(col("n")).as("n"), min(col("i")).as("s"),
          (max(col("i")) + (W - 1)).as("e"))
      spans.groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_spans"),
          sum(col("e") - col("s") + 1).cast("long").as("dup_tokens"),
          max(col("e") - col("s") + 1).cast("long").as("max_span"),
          max(col("n")).cast("long").as("ntok"))
        // integer `div`, matching the oracle's `//` — a double division
        // here could truncate an exact quotient one off
        .select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("max_span"),
          expr("1000000L * dup_tokens div ntok").as("dup_ppm"))
        .orderBy("doc_id")
  }

  /** Minimum duplicated-substring length (tokens) for the published
    * exact-substring semantics of [[qExactSubstr]]. */
  val ExactSubstrL = 8

  /** EXACT-SUBSTRING dedup at published fidelity (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * ExactSubstr tool): the positions to cut from each document are
    * the union of ALL duplicated substrings of length ≥ L tokens,
    * where "duplicated" means the substring occurs at ≥ 2 sites in the
    * corpus — ANY two sites, including twice inside one document
    * (self-repetition is exactly what the published method removes and
    * what [[qDupSpans]]'s distinct-doc recurrence cannot see).
    *
    * Distributed form: a substring of length M ≥ L is duplicated iff
    * each of its length-L windows is (every window of a duplicated
    * span recurs at the partner site; conversely a duplicated window
    * IS a duplicated substring of length L) — so the union of
    * duplicated substrings ≥ L equals the union of duplicated
    * length-L windows, and the suffix array of the published tool
    * reduces to an index-join over window keys. Two windows [i, i+L)
    * and [j, j+L), i < j, overlap-or-touch iff j ≤ i + L, so maximal
    * covered spans fall out of a lag-based gaps-and-islands pass
    * (break when the gap exceeds L). Unlike [[qDupSpans]]'s
    * strictly-consecutive islands, this never double-counts a token:
    * `dup_tokens` here is the TRUE covered-position count — the number
    * of tokens ExactSubstr would cut.
    *
    * Scale design: one row per corpus token keyed by a 16-byte md5
    * (inverted-index shuffle, never all-pairs); recurrence is a PLAIN
    * count ≥ 2 (map-side combinable — cheaper than q_dup_spans'
    * distinct-doc count, no Expand); only recurring windows flow into
    * the join back; the islands pass windows by doc_id with per-task
    * state bounded by one document's positions. The brute-force
    * all-pairs longest-common-extension ground truth exists ONLY in
    * `ExactSubstrSpec`, which proves the window-union reduction
    * non-circularly at spec scale. */
  val qExactSubstr: Q = Q.sql(
    "q_exact_substr",
    s"""WITH tok AS (
       |  SELECT doc_id, $tokensSql AS ts FROM documents
       |), wins AS (
       |  SELECT doc_id, len(ts) AS n,
       |    unnest(generate_series(1, len(ts) - ${ExactSubstrL - 1})) AS i, ts
       |  FROM tok WHERE len(ts) >= $ExactSubstrL
       |), keyed AS (
       |  SELECT doc_id, n, i,
       |    md5(array_to_string(list_slice(ts, i, i + ${ExactSubstrL - 1}), ' ')) AS k
       |  FROM wins
       |), dup AS (
       |  SELECT k FROM keyed GROUP BY k HAVING count(*) >= 2
       |), hits AS (
       |  SELECT w.doc_id, w.n, w.i FROM keyed w JOIN dup USING (k)
       |), brk AS (
       |  SELECT doc_id, n, i,
       |    CASE WHEN lag(i) OVER w IS NULL
       |      OR i - lag(i) OVER w > $ExactSubstrL THEN 1 ELSE 0 END AS b
       |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY i)
       |), isl AS (
       |  SELECT doc_id, n, i,
       |    sum(b) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
       |  FROM brk
       |), spans AS (
       |  SELECT doc_id, max(n) AS n, min(i) AS s, max(i) + ${ExactSubstrL - 1} AS e
       |  FROM isl GROUP BY doc_id, grp
       |)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
       |  CAST(max(e - s + 1) AS BIGINT) AS max_span,
       |  CAST((1000000 * sum(e - s + 1)) // max(n) AS BIGINT) AS dup_ppm
       |FROM spans GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin,
    doc = s"exact-substring dedup (Lee et al.): variable-length duplicated spans >= " +
      s"$ExactSubstrL tokens, union coverage, within-doc repeats counted") { (s, d) =>
    val L = ExactSubstrL
    val keyed = documents(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") >= L)
      .select(col("doc_id"), col("n"),
        explode(transform(sequence(lit(1), col("n") - (L - 1)), i =>
          struct(i.as("i"),
            md5(concat_ws(" ", slice(col("ts"), i, lit(L)))).as("k")))).as("w"))
      .select(col("doc_id"), col("n"), col("w.i").as("i"), col("w.k").as("k"))
    // plain occurrence count — map-side combined, within-doc repeats count
    val dup = keyed.groupBy(col("k")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select(col("k"))
    val hits = keyed.join(dup, "k")
    val wD = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val isl = hits
      .withColumn("b",
        when(lag(col("i"), 1).over(wD).isNull ||
          col("i") - lag(col("i"), 1).over(wD) > L, 1).otherwise(0))
      .withColumn("grp", sum(col("b")).over(
        wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = isl.groupBy(col("doc_id"), col("grp"))
      .agg(max(col("n")).as("n"), min(col("i")).as("s"),
        (max(col("i")) + (L - 1)).as("e"))
    spans.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("dup_tokens"),
        max(col("e") - col("s") + 1).cast("long").as("max_span"),
        max(col("n")).cast("long").as("ntok"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("max_span"),
        expr("1000000L * dup_tokens div ntok").as("dup_ppm"))
      .orderBy("doc_id")
  }

  /** Sorted-neighborhood window (sorted-rank distance ≤ W−1 pairs up). */
  val SnWindow = 4
  /** Jaro-Winkler match threshold for the verify stage. */
  val SnTau = 0.90

  /** Sorted-neighborhood dedup blocking (Hernández & Stolfo 1995, the
    * merge/purge method) — the third candidate-generation strategy next
    * to LSH bucketing ([[qDedupMinhash]]) and inverted-index prefix
    * joins ([[qJaccardNgram]]): sort records by a normalized blocking
    * key (here the first 24 alphanumeric chars of the lowercased text),
    * pair each record with its ≤ [[SnWindow]]−1 successors in sort
    * order, and verify candidates with Jaro-Winkler ≥ [[SnTau]]. Where
    * LSH recall depends on hash luck and prefix joins on token overlap,
    * sorted neighborhood catches the "same opening, small edits" family
    * with exactly w−1 candidates per record — linear, tunable, and the
    * classic choice for record linkage.
    *
    * Scale design: the global order comes from a distributed RANGE sort
    * (`orderBy` = sampled range partitioning) plus one `zipWithIndex`
    * pass for exact contiguous ranks — NOT a global row_number window
    * (which would single-partition the corpus; lesson 10's foldable-key
    * trap is the same failure). Neighbor pairing is ONE equi-join on the
    * rank after exploding each record into its w−1 probe ranks — ranks
    * are unique and uniform, so the join cannot skew. Only window pairs
    * (w−1 per record) pay the O(len²) similarity. */
  val qSortedNeighborhood: Q = Q.sql(
    "q_sorted_neighborhood",
    s"""WITH nk AS (
       |  SELECT doc_id, text,
       |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24) AS k
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, text, row_number() OVER (ORDER BY k, doc_id) AS rk FROM nk
       |)
       |SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(b.rk - a.rk AS BIGINT) AS gap,
       |  jaro_winkler_similarity(a.text, b.text) AS jw
       |FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + ${SnWindow - 1}
       |WHERE jaro_winkler_similarity(a.text, b.text) >= $SnTau
       |ORDER BY id1, id2""".stripMargin,
    doc = s"sorted-neighborhood blocking (window $SnWindow) + Jaro-Winkler >= $SnTau verify") {
    (s, d) =>
      val nk = documents(s, d).select(col("doc_id"), col("text"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 24).as("k"))
      val ranked = s.createDataFrame(
        nk.orderBy("k", "doc_id").rdd.zipWithIndex().map { case (row, i) =>
          org.apache.spark.sql.Row(row.getLong(0), row.getString(1), i + 1L)
        },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType, nullable = true),
          org.apache.spark.sql.types.StructField("rk",
            org.apache.spark.sql.types.LongType, nullable = false))))
      val probe = ranked.select(col("doc_id").as("id1"), col("text").as("t1"),
        col("rk").as("rk0"),
        explode(array((1 until SnWindow).map(o => col("rk") + o): _*)).as("rk"))
      val jw = graft.expressions.JaroWinkler.jaroWinkler(col("t1"), col("t2"))
      probe
        .join(ranked.select(col("rk"), col("doc_id").as("id2"), col("text").as("t2")), "rk")
        .filter(jw >= SnTau)
        .select(col("id1"), col("id2"), (col("rk") - col("rk0")).cast("long").as("gap"),
          jw.as("jw"))
        .orderBy("id1", "id2")
  }

  /** Survivorship — the step AFTER candidate grouping that every dedup
    * deployment needs: inside each duplicate block, elect ONE canonical
    * record by an explicit quality policy (here: longest text, ties to
    * the smallest doc_id) instead of [[qDedupExact]]'s arbitrary
    * keep-first. Blocks are shared-prefix hashes (the corpus's near-dups
    * share 64-char prefixes but differ in length, so exact-hash groups
    * would all be singletons); the policy metadata (member count, elected
    * id, its length, distinct sources feeding the block) is the merge
    * audit record.
    *
    * Scale design: ONE hash shuffle on the block key; the election is
    * `max(struct(quality, -id))` — an ordinary map-side-combined
    * aggregate, NOT a per-block window sort (no row buffering; the
    * mixed count(DISTINCT source) adds Spark's Expand ×2 over this one
    * aggregation, the cheapest exact form). The oracle replays the
    * election as a row_number window. */
  val qSurvivorship: Q = Q.sql(
    "q_survivorship",
    """WITH b AS (
      |  SELECT doc_id, n_chars, source, md5(substr(text, 1, 64)) AS block FROM documents
      |), r AS (
      |  SELECT block, doc_id, n_chars, source,
      |    row_number() OVER (PARTITION BY block ORDER BY n_chars DESC, doc_id) AS rk,
      |    count(*) OVER (PARTITION BY block) AS c
      |  FROM b
      |)
      |SELECT block,
      |  CAST(max(c) AS BIGINT) AS group_n,
      |  CAST(max(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS keep_id,
      |  CAST(max(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT) AS keep_chars,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      |FROM r
      |GROUP BY block
      |HAVING max(c) > 1
      |ORDER BY block""".stripMargin,
    doc = "dedup survivorship: per-block canonical election by quality, one aggregation") {
    (s, d) =>
      documents(s, d)
        .select(
          col("doc_id"), col("n_chars"), col("source"),
          md5(substring(col("text"), 1, 64)).as("block"))
        .groupBy(col("block"))
        .agg(
          count(lit(1)).as("group_n"),
          max(struct(col("n_chars"), (-col("doc_id")).as("negid"))).as("m"),
          countDistinct(col("source")).as("n_sources"))
        .filter(col("group_n") > 1)
        .select(
          col("block"),
          col("group_n").cast("long").as("group_n"),
          (-col("m.negid")).cast("long").as("keep_id"),
          col("m.n_chars").cast("long").as("keep_chars"),
          col("n_sources").cast("long").as("n_sources"))
        .orderBy("block")
  }

  /** Bloom-filter bits (2^20) and hash count for [[qBloomDedup]]. */
  val BloomM = 1048576L
  val BloomK = 3

  /** Bloom-filter dedup at a shard boundary: an arriving batch is
    * screened against the HISTORY's chunk membership using only a Bloom
    * filter of the history — the O(bits) state that replaces rescanning
    * (or even retaining) the historical corpus, the way long-running
    * ingest pipelines actually gate near-boundary duplicates. History =
    * docs outside the batch (doc_id % 10 ≠ 0); each 16-token chunk sets
    * [[BloomK]] bit positions carved from disjoint md5 substrings
    * (deterministic, so the ORACLE replays the filter bit-for-bit — no
    * engine-private bloom layout involved); a batch chunk is flagged iff
    * all k bits are set. Exact membership rides along, so the output
    * exposes the realized false-positive rate per language; false
    * NEGATIVES are structurally impossible (a member's bits are all
    * set), which the spec pins.
    *
    * Scale design: the "filter" is a distinct-positions frame (≤ 2^20
    * rows regardless of corpus size) joined on bit position — broadcast
    * at real scale; the batch side touches each chunk k times. No
    * history rescan appears anywhere downstream of the bits frame. */
  val qBloomDedup: Q = Q.sql(
    "q_bloom_dedup",
    s"""WITH t AS (SELECT doc_id, lang, $tokensSql AS w FROM documents),
       |c AS (SELECT doc_id, lang,
       |    unnest(list_transform(generate_series(0, (len(w) + 15) // 16 - 1),
       |      i -> array_to_string(list_slice(w, i*16 + 1, i*16 + 16), ' '))) AS chunk
       |  FROM t),
       |base AS (SELECT DISTINCT chunk FROM c WHERE doc_id % 10 <> 0),
       |js AS (SELECT unnest([0, 1, 2]) AS j),
       |bits AS (SELECT DISTINCT
       |    CAST(('0x' || substr(md5(chunk), 1 + 5*j, 5)) AS BIGINT) % $BloomM AS pos
       |  FROM base, js),
       |batch AS (SELECT DISTINCT lang, chunk FROM c WHERE doc_id % 10 = 0),
       |bpos AS (SELECT lang, chunk,
       |    CAST(('0x' || substr(md5(chunk), 1 + 5*j, 5)) AS BIGINT) % $BloomM AS pos
       |  FROM batch, js),
       |fl AS (SELECT b.lang, b.chunk, CAST(count(bits.pos) AS BIGINT) AS nhit
       |  FROM bpos b LEFT JOIN bits ON bits.pos = b.pos GROUP BY b.lang, b.chunk),
       |tm AS (SELECT bt.lang, bt.chunk,
       |    CASE WHEN ba.chunk IS NOT NULL THEN 1 ELSE 0 END AS tru
       |  FROM batch bt LEFT JOIN base ba ON ba.chunk = bt.chunk),
       |j AS (SELECT f.lang, CASE WHEN f.nhit = $BloomK THEN 1 ELSE 0 END AS flag, t.tru
       |  FROM fl f JOIN tm t ON t.lang = f.lang AND t.chunk = f.chunk)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(flag) AS BIGINT) AS flagged,
       |  CAST(sum(tru) AS BIGINT) AS in_base,
       |  CAST(sum(CASE WHEN flag = 1 AND tru = 0 THEN 1 ELSE 0 END) AS BIGINT) AS false_pos,
       |  CAST(sum(CASE WHEN flag = 1 AND tru = 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / nullif(count(*) - sum(tru), 0) AS fp_rate
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    doc = "Bloom-filter shard-boundary dedup: O(bits) history state, realized FP rate") {
    (s, d) =>
      val K = 16
      val t = documents(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
      val nc = floor((size(col("w")) + (K - 1)) / lit(K.toDouble)).cast("long")
      val c = graft.ScratchCache.tracked(
        t.select(
          col("doc_id"), col("lang"),
          explode(transform(
            sequence(lit(0L), nc - 1),
            i => array_join(slice(col("w"), (i * K + 1).cast("int"), lit(K)), " ")))
            .as("chunk")))
      c.count() // two consumers: history side + batch side
      def posOf(j: org.apache.spark.sql.Column) =
        conv(substring(md5(col("chunk")), lit(1) + lit(5) * j, lit(5)), 16, 10)
          .cast("long") % BloomM
      val js = broadcast(s.range(1).select(
        explode(array(lit(0), lit(1), lit(2))).as("j")))
      val base = c.filter(col("doc_id") % 10 =!= 0).select("chunk").distinct()
      val bits = base.crossJoin(js).select(posOf(col("j")).as("pos")).distinct()
      val batch = c.filter(col("doc_id") % 10 === 0).select("lang", "chunk").distinct()
      val bpos = batch.crossJoin(js).select(col("lang"), col("chunk"), posOf(col("j")).as("pos"))
      val fl = bpos.join(bits.withColumn("hit", lit(1)), Seq("pos"), "left")
        .groupBy(col("lang"), col("chunk"))
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("nhit"))
      val tm = batch.join(base.withColumn("tru1", lit(1)), Seq("chunk"), "left")
        .select(col("lang"), col("chunk"), coalesce(col("tru1"), lit(0)).as("tru"))
      val flag = when(col("nhit") === BloomK, 1).otherwise(0)
      fl.join(tm, Seq("lang", "chunk"))
        .select(col("lang"), flag.as("flag"), col("tru"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("n_chunks"),
          sum(col("flag")).cast("long").as("flagged"),
          sum(col("tru")).cast("long").as("in_base"),
          sum(when(col("flag") === 1 && col("tru") === 0, 1).otherwise(0)).cast("long")
            .as("false_pos"),
          (sum(when(col("flag") === 1 && col("tru") === 0, 1).otherwise(0)).cast("double") /
            nullif(count(lit(1)) - sum(col("tru")), lit(0))).as("fp_rate"))
        .orderBy("lang")
  }

  /** Content-defined chunking (CDC) dedup audit — the rsync/FastCDC/
    * data-lake trick: chunk boundaries are declared wherever a rolling
    * hash of the last 8 characters hits a mask (h % 64 == 0, expected
    * ~64-char chunks), so an insertion early in a document shifts ONLY
    * the chunk containing it — every later chunk re-aligns and
    * re-deduplicates, which fixed-width shingles never do. Per source:
    * chunk count, distinct chunk count (by md5), duplicate occurrences,
    * and mean chunk length.
    *
    * The rolling hash is position-wise h(p) = Σₖ code(p−k)·31ᵏ
    * (k = 0..7) over exact integer character codes — engine-identical,
    * replayed by the oracle from substr/ascii. No greedy min-chunk
    * constraint: that's a sequential fold a declarative plan (and the
    * SQL oracle) can't express; the mask alone bounds expected chunk
    * size, which is the dedup-relevant property.
    *
    * Scale: everything is per-row narrow work (one codes array staged
    * per document — referenced 8× so CollapseProject keeps it, lesson
    * 3 — then one O(len) filter) until the single chunk-hash groupBy;
    * no joins, no windows over the corpus. */
  val qCdcDedup: Q = {
    val terms31 = (0 to 7)
      .map(k => s"element_at(codes, CAST(p - $k AS INT)) * ${math.pow(31.0, k).toLong}L")
      .mkString(" + ")
    val sqlTerms = (0 to 7)
      .map(k =>
        s"CAST(ascii(substr(text, CAST(p AS INT) - $k, 1)) AS BIGINT) * ${math.pow(31.0, k).toLong}")
      .mkString(" + ")
    Q.sql(
      "q_cdc_dedup",
      s"""WITH d AS (
         |  SELECT doc_id, source, text, CAST(n_chars AS BIGINT) AS n FROM documents),
         |pp AS (
         |  SELECT doc_id, text, u.p AS p FROM d, unnest(range(8, n + 1)) u(p)),
         |b AS (
         |  SELECT doc_id, p FROM pp WHERE ($sqlTerms) % 64 = 0),
         |bb AS (
         |  SELECT doc_id, p FROM b UNION SELECT doc_id, n AS p FROM d),
         |c AS (
         |  SELECT doc_id,
         |    coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) AS lo, p AS hi
         |  FROM bb),
         |ch AS (
         |  SELECT d.source,
         |    md5(substr(d.text, CAST(c.lo AS INT) + 1, CAST(c.hi - c.lo AS INT))) AS h,
         |    c.hi - c.lo AS ln
         |  FROM c JOIN d USING (doc_id)),
         |g AS (
         |  SELECT source, h, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(ln) AS BIGINT) AS lsum
         |  FROM ch GROUP BY 1, 2)
         |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_chunks,
         |  CAST(count(*) AS BIGINT) AS n_distinct_chunks,
         |  CAST(sum(cnt) - count(*) AS BIGINT) AS dup_chunks,
         |  CAST(sum(lsum) AS DOUBLE) / sum(cnt) AS mean_chunk_len
         |FROM g GROUP BY source ORDER BY source""".stripMargin,
      doc = "content-defined chunking dedup audit per source (rolling-hash mask boundaries)") {
      (s, d) =>
        // the per-character codes array + O(len) boundary filter is pure
        // CPU per row — spread the single-file scan across cores first
        // (no-op once the input has real partition counts at scale)
        val staged = documents(s, d)
          .transform(graft.Tables.spread(s, _))
          .select(col("doc_id"), col("source"), col("text"),
            col("n_chars").cast("long").as("n"),
            expr("transform(sequence(1, length(text)), i -> ascii(substr(text, i, 1)))")
              .as("codes"))
        val withBounds = staged
          .select(col("source"), col("text"),
            // sequence(8, n) REVERSES when n < 8 — guard tiny docs to []
            array_sort(array_distinct(concat(
              when(col("n") >= 8,
                expr(s"filter(sequence(8L, n), p -> ($terms31) % 64 = 0)"))
                .otherwise(expr("array()").cast("array<long>")),
              array(col("n"))))).as("bs"))
        val chunks = withBounds
          .select(col("source"), col("text"), col("bs"),
            posexplode(col("bs")).as(Seq("k", "hi")))
          .select(col("source"), col("hi"),
            when(col("k") === 0, lit(0L)).otherwise(element_at(col("bs"), col("k"))).as("lo"),
            col("text"))
          .select(col("source"), (col("hi") - col("lo")).as("ln"),
            md5(expr("substr(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))")).as("h"))
        chunks.groupBy(col("source"), col("h"))
          .agg(count(lit(1)).cast("long").as("cnt"), sum(col("ln")).cast("long").as("lsum"))
          .groupBy(col("source"))
          .agg(
            sum(col("cnt")).cast("long").as("n_chunks"),
            count(lit(1)).cast("long").as("n_distinct_chunks"),
            (sum(col("cnt")) - count(lit(1))).cast("long").as("dup_chunks"),
            (sum(col("lsum")).cast("double") / sum(col("cnt"))).as("mean_chunk_len"))
          .orderBy("source")
    }
  }

  val all: Seq[Q] =
    Seq(qDedupExact, qMinhashSignature, qDedupMinhash, qDedupSimhash, qJaccardNgram,
      qJaccardAdaptive, qDedupClusters, qClusterSplit, qContainment, qDedupIncremental,
      qDedupIndexProbe, qDedupIndexUpdate,
      qFuzzyVerify, qCorpusClean, qSubstringDup, qJaroPairs, qLineDedup, qSparseCosine,
      qDupSpans, qExactSubstr, qSortedNeighborhood, qSurvivorship, qBloomDedup, qCdcDedup)
}
