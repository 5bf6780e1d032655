package graft.queries

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k (the exact baseline), cosine near-duplicate
  * pairs, and a random-hyperplane LSH-bucketed ANN variant (the scale
  * path — candidates come from an equi-join on the bucket signature
  * instead of a full cross product).
  *
  * Implementation notes:
  *   - dot products / norms are UNROLLED 64-term expressions (left-assoc
  *     addition), not HOF lambdas: fully codegen'd, and the identical
  *     op order makes Spark and DuckDB produce bit-identical doubles —
  *     the oracle needs no epsilon;
  *   - norms are precomputed per row BEFORE the join, so each pair costs
  *     one dot product, not three;
  *   - the query side of the top-k join is broadcast — the big side
  *     streams through without a shuffle;
  *   - LSH hyperplane signs are derived in Scala from md5 (deterministic)
  *     and embedded as literals in both the Spark plan and the oracle SQL.
  */
object SimilarityQueries {

  val Dim = 64
  val NumQueries = 16 // vec_id < 16 act as query vectors
  val TopK = 5
  val LshPlanes = 6

  // ---- shared expression builders (Spark + SQL twins) ------------------
  // Spark side: graft.expressions.DotProduct — a codegen loop (the unrolled
  // 64-term form blew janino's 64 KB method limit and forced interpreted
  // fallback). SQL side: left-associated term sums, which accumulate in
  // the same index order → bit-identical doubles.

  private def dotCol(a: String, b: String): Column =
    graft.expressions.VectorOps.dot(col(s"$a.v"), col(s"$b.v"))
  private def dotSql(a: String, b: String): String =
    (0 until Dim).map(i => s"$a.v[${i + 1}] * $b.v[${i + 1}]").mkString(" + ")

  private def normSelfCol: Column = graft.expressions.VectorOps.l2norm(col("v"))
  private def normSelfSql: String =
    "sqrt(" + (0 until Dim).map(i => s"v[${i + 1}] * v[${i + 1}]").mkString(" + ") + ")"

  /** Vectors with precomputed norm: (vec_id, v double[], nrm). */
  def vecsOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = vecs(s, d)

  private def vecs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(
        col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", normSelfCol)

  private val vecsSqlNested =
    s"SELECT vec_id, v, $normSelfSql AS nrm FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) _inner"

  private def cosCol: Column = dotCol("q", "c") / (col("q.nrm") * col("c.nrm"))
  private def cosSql: String = s"(${dotSql("q", "c")}) / (q.nrm * c.nrm)"

  // ---- queries ---------------------------------------------------------

  /** Brute-force exact cosine top-k for the first NumQueries vectors. */
  val qEmbedTopk: Q = Q.sql(
    "q_embed_topk",
    s"""WITH vecs AS ($vecsSqlNested)
       |SELECT q_id, n_id, rn, cos FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    $cosSql AS cos,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY $cosSql DESC, c.vec_id) AS BIGINT) AS rn
       |  FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NumQueries) t
       |WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin,
    doc = s"brute-force cosine top-$TopK (broadcast queries, codegen dot)") { (s, d) =>
    val all = vecs(s, d)
    val q = all.filter(col("vec_id") < NumQueries).as("q")
    val c = all.as("c")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    broadcast(q)
      .join(c, col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("n_id"), cosCol.as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select("q_id", "n_id", "rn", "cos")
      .orderBy("q_id", "rn")
  }

  // ---- embedding near-dup (LSH-prefiltered default) --------------------

  val NdPlanes = 4
  val NdTables = 12
  val NdThreshold = 0.35

  /** Deterministic ±1 hyperplanes for the near-dup signature, seeded
    * distinctly from the ANN tables ("nd:planes:p:d"). */
  def ndSigns(planes: Int, tables: Int, tag: String = "nd"): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables * planes, Dim) { (p, dd) =>
      val h = md.digest(s"$tag:$planes:$p:$dd".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  /** LSH-prefiltered near-duplicate pairs over a (vec_id, v, nrm) frame:
    * per-table bucket signatures (sign pattern of `planes` hyperplane
    * projections), candidates = pairs sharing a bucket in ANY of the
    * `tables` tables (one keyed equi-join — NO cross product anywhere),
    * exact cosine threshold on candidates only. Precision is exact (every
    * emitted pair passed the true cosine test); recall is the union over
    * tables of P(all planes agree) and rises steeply with pair similarity.
    */
  def nearDupLsh(
      vecsDf0: DataFrame,
      threshold: Double,
      planes: Int = NdPlanes,
      tables: Int = NdTables): DataFrame = {
    // tables×planes 128-dim dot products per row is pure CPU — spread the
    // single-file scan across cores first (cpu_ratio was pinned at ~2.0;
    // no-op once the input has real partition counts at scale). The same
    // spread parallelizes the exact-cosine re-rank scans below.
    val vecsDf = graft.Tables.spread(vecsDf0.sparkSession, vecsDf0)
    val signs = ndSigns(planes, tables)
    // bucket key = table * 2^planes + sign bits — ONE int per (vector,
    // table), so the candidate self-join shuffles/compares ints, not
    // strings, and the table id rides inside the key (no compound join)
    val bucketOf = (t: Int) =>
      (0 until planes).map { p =>
        val proj = graft.expressions.VectorOps.dot(
          col("v"), typedLit(signs(t * planes + p).toSeq))
        when(proj >= 0, 1 << p).otherwise(0)
      }.reduce(_ + _) + lit(t * (1 << planes))
    // the signature table is read by both sides of the candidate self-join;
    // persisting it is the standard LSH "index build" materialization
    // (signatures are tables*planes bits per vector — tiny vs the corpus)
    val tbl = vecsDf
      .select(
        col("vec_id"),
        explode(array((0 until tables).map(bucketOf): _*)).as("bucket"))
      .transform(graft.ScratchCache.tracked)
    val cand = tbl.as("a")
      .join(tbl.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
      .distinct()
    cand
      .join(vecsDf.as("q"), col("q.vec_id") === col("id1"))
      .join(vecsDf.as("c"), col("c.vec_id") === col("id2"))
      .select(col("id1"), col("id2"), cosCol.as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("id1", "id2")
  }

  /** [[nearDupLsh]] with the plane count chosen from the corpus SIZE —
    * the knob that keeps LSH linear as the corpus grows. With a FIXED
    * signature width, buckets fill linearly with n and the in-bucket
    * candidate self-join grows as n² (measured by the 10× ScaleProbe:
    * 13× wall time at 10× vectors with 4 planes). Expected bucket
    * occupancy n / 2^planes stays constant when planes grows with
    * log2(n): each doubling of the corpus adds one plane. The recall
    * per table falls with each added plane (P(all planes agree)), so a
    * production deployment raises `tables` alongside — the standard
    * width/tables tradeoff; here tables stays fixed and the 10× probe's
    * job is bounding candidate volume, not recall.
    *
    * One count() job probes n — the same cheap-probe-then-choose shape
    * as [[graft.queries.DedupQueries.jaccardAdaptive]]. Not oracle-gated:
    * the DuckDB oracle SQL is generated statically and cannot depend on
    * the data; the fixed-plane [[qEmbedNearDup]] stays the parity gate
    * and this is the documented 100 TB path (`ScaleProbe` drives it). */
  def nearDupLshAuto(
      vecsDf: DataFrame,
      threshold: Double,
      targetBucket: Int = 64,
      tables: Int = NdTables): DataFrame = {
    val n = vecsDf.count()
    val planes = math.max(
      NdPlanes,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2)).toInt)
    nearDupLsh(vecsDf, threshold, planes, tables)
  }

  /** All-pairs exact near-dup — the RECALL ORACLE for [[nearDupLsh]]
    * (`EmbedNearDupRecallSpec`), O(n²) by construction: spec ground truth
    * only, deliberately NOT the benched default (a cartesian self-join is
    * a scale-killer at 100 TB). */
  def embedNearDupExact(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      threshold: Double = NdThreshold): DataFrame = {
    val all = vecs(s, d)
    all.as("q")
      .join(all.as("c"), col("q.vec_id") < col("c.vec_id"))
      .select(col("q.vec_id").as("id1"), col("c.vec_id").as("id2"), cosCol.as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy("id1", "id2")
  }

  /** Embedding-cosine near-dup pairs, LSH-prefiltered (the scale path).
    *
    * Candidates come from a bucket equi-join, so at 100 TB this is keyed
    * shuffles, never a cross product. The cost is bounded recall: measured
    * honestly against the all-pairs truth, 0.86 at sf0.01 — this corpus's
    * qualifying pairs sit at cos 0.35-0.51 (borderline similarity, the
    * hardest operating point for ANY blocking scheme; hyperplane-LSH,
    * IVF-cell and SimHash blocking all measured <=0.86 recall below 55%
    * candidate fraction here). On real near-dup corpora, where duplicate
    * pairs live at cos >= 0.9, the same operator measures recall 1.0
    * (planted-duplicate test in EmbedNearDupRecallSpec) with far smaller
    * buckets. The oracle replays the LSH deterministically, so the gate
    * checks the full pipeline bit-for-bit. */
  val qEmbedNearDup: Q = Q.sql(
    "q_embed_neardup", {
      val signs = ndSigns(NdPlanes, NdTables)
      val bucketSqlOf = (t: Int) =>
        (0 until NdPlanes).map { p =>
          val proj = (0 until Dim).map { i =>
            if (signs(t * NdPlanes + p)(i) > 0) s"v[${i + 1}]" else s"-v[${i + 1}]"
          }.mkString(" + ")
          s"CASE WHEN $proj >= 0 THEN '1' ELSE '0' END"
        }.mkString("concat(", ", ", ")")
      val bucketCols = (0 until NdTables).map(t => s"${bucketSqlOf(t)} AS b$t").mkString(",\n  ")
      val tableRows = (0 until NdTables)
        .map(t => s"SELECT vec_id, $t AS tbl, b$t AS bv FROM bucketed")
        .mkString("\nUNION ALL\n")
      s"""WITH vecs AS ($vecsSqlNested),
         |bucketed AS (SELECT vec_id, $bucketCols FROM vecs),
         |tables AS (
         |$tableRows
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
         |  FROM tables a JOIN tables b ON a.tbl = b.tbl AND a.bv = b.bv AND a.vec_id < b.vec_id
         |)
         |SELECT cd.id1, cd.id2, $cosSql AS cos
         |FROM cand cd
         |JOIN vecs q ON q.vec_id = cd.id1
         |JOIN vecs c ON c.vec_id = cd.id2
         |WHERE $cosSql >= $NdThreshold
         |ORDER BY id1, id2""".stripMargin
    },
    doc = s"embedding near-dup pairs (cos >= $NdThreshold) via $NdTables-table LSH prefilter + exact re-rank") {
    (s, d) => nearDupLsh(vecs(s, d), NdThreshold)
  }

  // ---- LSH ANN ---------------------------------------------------------

  val LshTables = 3 // L independent hash tables — the recall knob

  /** Deterministic ±1 hyperplane matrix: sign from md5("p:d"); plane
    * index space covers all tables (table l uses planes l*LshPlanes ..). */
  lazy val lshSigns: Array[Array[Int]] = {
    val mdigest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(LshTables * LshPlanes, Dim) { (p, d) =>
      val h = mdigest.digest(s"$p:$d".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1 else -1
    }
  }

  private def bucketCol(table: Int): Column =
    concat((0 until LshPlanes).map { p =>
      // proj = dot(v, ±1 vector): multiplying by ±1.0 is exact, so this
      // equals the SQL's ±v[i] sum term-for-term
      val signs = typedLit(lshSigns(table * LshPlanes + p).map(_.toDouble).toSeq)
      val proj = graft.expressions.VectorOps.dot(col("v"), signs)
      when(proj >= 0, "1").otherwise("0")
    }: _*)

  private def bucketSql(v: String, table: Int): String =
    (0 until LshPlanes).map { p =>
      val proj = (0 until Dim).map { i =>
        if (lshSigns(table * LshPlanes + p)(i) > 0) s"$v[${i + 1}]" else s"-$v[${i + 1}]"
      }.mkString(" + ")
      s"CASE WHEN $proj >= 0 THEN '1' ELSE '0' END"
    }.mkString("concat(", ", ", ")")

  /** ANN via multi-table random-hyperplane LSH (the production shape:
    * L independent tables, candidates = union of per-table bucket
    * matches — one table's false negatives are another's hits). Each
    * table is an equi-join on its bucket key, so at scale the cross
    * product becomes L keyed shuffles; exact cosine re-ranks the
    * deduplicated candidate set. */
  val qAnnLsh: Q = Q.sql(
    "q_ann_lsh", {
      val bucketCols = (0 until LshTables)
        .map(l => s"${bucketSql("v", l)} AS b$l").mkString(",\n  ")
      val tableRows = (0 until LshTables)
        .map(l => s"SELECT vec_id, $l AS tbl, b$l AS bv FROM bucketed")
        .mkString("\nUNION ALL\n")
      s"""WITH vecs AS ($vecsSqlNested),
         |bucketed AS (SELECT vec_id, $bucketCols FROM vecs),
         |tables AS (
         |$tableRows
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id
         |  FROM tables a JOIN tables b ON a.tbl = b.tbl AND a.bv = b.bv AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id < $NumQueries
         |)
         |SELECT q_id, n_id, rn, cos FROM (
         |  SELECT cd.q_id, cd.n_id,
         |    $cosSql AS cos,
         |    CAST(row_number() OVER (PARTITION BY cd.q_id
         |      ORDER BY $cosSql DESC, cd.n_id) AS BIGINT) AS rn
         |  FROM cand cd
         |  JOIN vecs q ON q.vec_id = cd.q_id
         |  JOIN vecs c ON c.vec_id = cd.n_id) t
         |WHERE rn <= $TopK
         |ORDER BY q_id, rn""".stripMargin
    },
    doc = s"multi-table LSH ANN (L=$LshTables × $LshPlanes planes, bucket equi-joins)") { (s, d) =>
    val all = vecs(s, d)
    val bucketed = all.select(
      col("vec_id") +: (0 until LshTables).map(l => bucketCol(l).as(s"b$l")): _*)
    val tables = bucketed.select(
      col("vec_id"),
      posexplode(array((0 until LshTables).map(l => col(s"b$l")): _*)).as(Seq("tbl", "bv")))
    val cand = tables.as("a")
      .join(tables.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .filter(col("a.vec_id") < NumQueries)
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    cand
      .join(all.as("q"), col("q.vec_id") === col("q_id"))
      .join(all.as("c"), col("c.vec_id") === col("n_id"))
      .select(col("q_id"), col("n_id"), cosCol.as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select("q_id", "n_id", "rn", "cos")
      .orderBy("q_id", "rn")
  }

  // ---- IVF ANN ---------------------------------------------------------

  val IvfCells = 16
  val NProbe = 2

  /** IVF (inverted-file) ANN: vectors are assigned to their nearest coarse
    * centroid ("cell"); a query probes only its NProbe nearest cells, so
    * the search cost is `nprobe/cells` of the corpus — the partition-prune
    * pattern for vector search. Centroids here are the first IvfCells
    * vectors (deterministic so the DuckDB oracle can replay assignment
    * bit-for-bit); production would train them with spark.ml KMeans — the
    * query path, which is what scales, is identical.
    *
    * Cell assignment ranks by the same dot/norm arithmetic as the oracle
    * (ties broken by centroid id), candidates come from an equi-join on
    * cell, and exact cosine ranks within the probed cells.
    */
  /** Shared IVF oracle: replays fixed-centroid assignment, probing, and
    * in-cell exact re-rank — used by both the inline-build gate
    * [[qAnnIvf]] and the persisted-index gate [[qIvfIndexSearch]] (the
    * index is just the materialized `assigned` CTE, so the search result
    * is identical by construction). */
  private val ivfOracleSql: String =
    s"""WITH vecs AS ($vecsSqlNested),
       |cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM vecs WHERE vec_id < $IvfCells),
       |scored AS (
       |  SELECT q.vec_id, q.v, q.nrm, c.cid,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY (${dotSql("q", "c").replace("c.v[", "c.cv[")}) / (q.nrm * c.cnrm) DESC, c.cid)
       |      AS BIGINT) AS crank
       |  FROM vecs q JOIN cents c ON true
       |),
       |assigned AS (SELECT vec_id, v, nrm, cid AS cell FROM scored WHERE crank = 1),
       |probes AS (SELECT vec_id, cid AS cell FROM scored WHERE crank <= $NProbe AND vec_id < $NumQueries)
       |SELECT q_id, n_id, rn, cos FROM (
       |  SELECT p.vec_id AS q_id, a.vec_id AS n_id,
       |    $cosSql AS cos,
       |    CAST(row_number() OVER (PARTITION BY p.vec_id
       |      ORDER BY $cosSql DESC, a.vec_id) AS BIGINT) AS rn
       |  FROM probes p
       |  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.vec_id
       |  JOIN vecs q ON q.vec_id = p.vec_id
       |  JOIN vecs c ON c.vec_id = a.vec_id) t
       |WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin

  val qAnnIvf: Q = Q.sql(
    "q_ann_ivf",
    ivfOracleSql,
    doc = s"IVF ANN: $IvfCells cells, nprobe=$NProbe, exact re-rank in probed cells") { (s, d) =>
    val all = vecs(s, d)
    val cents = all
      .filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    ivfSearch(all, cents)
  }

  /** The IVF query path, shared by the oracle-checked fixed-centroid query
    * and the KMeans-trained index: assign every vector to its nearest cell
    * (in-row argmin against the flat broadcast centroid array), probe the
    * NProbe nearest cells per query, exact cosine re-rank inside the
    * probed cells. `cents` is any (cid, cv double[], cnrm) frame — tiny,
    * always broadcast. */
  def ivfSearch(all: DataFrame, cents: DataFrame, nProbe: Int = NProbe): DataFrame = {
    val assigned = assignCells(all, cents)
    val probes = probeCells(all.filter(col("vec_id") < NumQueries), cents, nProbe)
      .select(col("vec_id").as("q_id"), col("cid").as("pcell"))
    ivfSearchAssigned(probes, all, assigned)
  }

  /** One-row frame of a (cid, cv, cnrm) centroid table flattened for the
    * in-row argmin ([[graft.expressions.VecTopCells]]): centroid ids
    * sorted ascending — index order IS id order, so the expression's
    * keep-the-earlier tiebreak equals the oracle's `ORDER BY … , cid` —
    * the vectors as one flat row-major array, the norms aligned. Always
    * tiny (K centroids); always broadcast by the caller. */
  private def centFlat(cents: DataFrame): DataFrame =
    cents.agg(array_sort(collect_list(struct(col("cid"), col("cv"), col("cnrm")))).as("ca"))
      .select(
        transform(col("ca"), e => e.getField("cid")).as("__cids"),
        flatten(transform(col("ca"), e => e.getField("cv"))).as("__cvs"),
        transform(col("ca"), e => e.getField("cnrm")).as("__cnrms"))

  /** Top-`n` coarse cells per vector of `df` against a (cid, cv, cnrm)
    * centroid table: all of `df`'s columns plus `cells` (array<long>,
    * rank order). ONE row per vector in and out — this replaced the
    * crossJoin-×K + rank-window shape whose per-task sort buffer peaked
    * at 250 MiB in the 10× ScaleProbe (r12 verdict item); the scoring
    * loop lives in [[graft.expressions.VecTopCells]], score bits and
    * tiebreaks identical to the windowed form, so every oracle is
    * unchanged. */
  private def coarseTop(df: DataFrame, cents: DataFrame, n: Int, byCos: Boolean): DataFrame =
    df.crossJoin(broadcast(centFlat(cents)))
      .withColumn("cells", graft.expressions.VectorOps.topCells(
        col("__cids"), col("__cvs"), col("__cnrms"), col("v"), n, byCos))
      .drop("__cids", "__cvs", "__cnrms")

  /** Coarse cell assignment (cosine, id tiebreak): (vec_id, v, nrm, cell). */
  private[graft] def assignCells(df: DataFrame, cents: DataFrame): DataFrame =
    coarseTop(df, cents, 1, byCos = true)
      .select(col("vec_id"), col("v"), col("nrm"), element_at(col("cells"), 1).as("cell"))

  /** Probe list (cosine): one (vec_id, cid) row per probed cell. */
  private[graft] def probeCells(df: DataFrame, cents: DataFrame, n: Int): DataFrame =
    coarseTop(df, cents, n, byCos = true).select(col("vec_id"), explode(col("cells")).as("cid"))

  /** Search half of the IVF pipeline: probe cells equi-join the assigned
    * corpus (`assigned`: vec_id, v, nrm, cell — inline-computed or read
    * back from the persisted index), exact cosine re-rank inside the
    * probed cells. `probes`/`queries` are query-grain (tiny, broadcast). */
  private def ivfSearchAssigned(
      probes: DataFrame, queries: DataFrame, assigned: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bc}
    val q = queries.as("q"); val c = assigned.as("c")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    bc(probes)
      .join(c, col("c.cell") === col("pcell") && col("c.vec_id") =!= col("q_id"))
      .join(bc(q), col("q.vec_id") === col("q_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        (graft.expressions.VectorOps.dot(col("q.v"), col("c.v")) /
          (col("q.nrm") * col("c.nrm"))).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select("q_id", "n_id", "rn", "cos")
      .orderBy("q_id", "rn")
  }

  /** Production centroid training: seeded spark.ml KMeans over the vector
    * column — one pass of distributed Lloyd iterations, centroids come
    * back to the driver (k × dim doubles, tiny) and feed [[ivfSearch]] as
    * a broadcast frame. Vectors are L2-NORMALIZED before training
    * (spherical KMeans): the index assigns by cosine, and on the unit
    * sphere cosine order == euclidean order, so the learned cells match
    * the assignment geometry. The oracle-checked q_ann_ivf keeps
    * deterministic first-K centroids (DuckDB cannot replay KMeans); this
    * is the production path for real corpora — on THIS synthetic corpus
    * the early data vectors happen to sample the generative cluster axes
    * directly, so first-K cells measure higher recall (0.92 vs 0.46/0.56;
    * see AnnRecallSpec for the full comparison). */
  def trainedCentroids(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      k: Int = IvfCells,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val features = vecs(s, d)
      .select(array_to_vector(transform(col("v"), _ / col("nrm"))).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(features)
    val rows = model.clusterCenters.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toArray.toSeq)
    }
    import s.implicits._
    rows.toDF("cid", "cv").withColumn("cnrm", graft.expressions.VectorOps.l2norm(col("cv")))
  }

  /** Deterministic fixed-point Lloyd training — [[qKmeans]]'s pattern
    * generalized to any (k, iters), returning a (cid, cv, cnrm) centroid
    * frame the IVF family can consume. Init = the first `k` vectors;
    * assignment = argmin squared L2 (`|q|² − 2q·c + |c|²`, id tiebreak)
    * via the in-row [[graft.expressions.VecTopCells]] argmin; update =
    * exact fixed-point means ([[KmQuantum]]-quantized integer sums, one
    * division) — order-independent, hence bit-identical across engines
    * and partitionings, which is what lets a DuckDB oracle replay the
    * whole training run ([[lloydSql]]). Unlike [[trainedCentroids]]
    * (spark.ml KMeans — not replayable), every gate built on this
    * trainer keeps a full hash-checked oracle.
    *
    * Scale shape per iteration: ONE narrow pass over the corpus (in-row
    * argmin, no ×k blowup) + one 64-column integer hash aggregate with
    * map-side combine. Empty cells drop out (their group never appears),
    * exactly like the oracle's GROUP BY. */
  def lloydCentroids(all: DataFrame, k: Int, iters: Int): DataFrame = {
    def qcol(c: Column): Column = round(c * KmQuantum, 0).cast("long")
    var cents = all.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    for (_ <- 1 to iters) {
      val assigned = coarseTop(all, cents, 1, byCos = false)
        .select(col("v"), element_at(col("cells"), 1).as("cell"))
      val sums = (0 until Dim).map(i => sum(qcol(element_at(col("v"), i + 1))).as(s"s$i"))
      val m = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"), sums: _*)
      cents = m
        .select(col("cell").as("cid"),
          array((0 until Dim).map(i => col(s"s$i").cast("double") / KmQuantum / col("n")): _*)
            .as("cv"))
        .withColumn("cnrm", graft.expressions.VectorOps.l2norm(col("cv")))
    }
    cents
  }

  /** KMeans-trained IVF ANN — same plan as q_ann_ivf, learned cells. */
  def annIvfTrained(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      nProbe: Int = NProbe): DataFrame =
    ivfSearch(vecs(s, d), trainedCentroids(s, d), nProbe)

  // ---- persisted IVF index ----------------------------------------------

  /** Persisted-index schemas: the vectors table is PARTITIONED BY cell, so
    * a probe that touches nprobe of the cells reads nprobe/cells of the
    * corpus off disk — the partition-prune story an inline rebuild can
    * never have. */
  private val IvfVecSchema = "vec_id LONG, v ARRAY<DOUBLE>, nrm DOUBLE, cell LONG"
  private val IvfCentSchema = "cid LONG, cv ARRAY<DOUBLE>, cnrm DOUBLE"

  /** Write the IVF index for `d`: cell-assigned vectors bucketed one
    * parquet file per cell, the (tiny) centroid table, and the freshness
    * meta. Deterministic first-[[IvfCells]] centroids, same as
    * [[qAnnIvf]], so the DuckDB oracle replays the whole index. */
  private def buildIvfIndex(
      s: org.apache.spark.sql.SparkSession, d: String, dir: String, n: Long): Unit = {
    val all = vecs(s, d)
    val cents = all.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val assigned = assignCells(all, cents)
    graft.operators.IndexStore.publish(s, dir, n, Seq(
      // repartition by cell first → exactly one file per cell directory
      ("vectors", assigned.repartition(col("cell")), Seq("cell")),
      ("centroids", cents, Nil)),
      graft.operators.IndexStore.sourceStamp(s"$d/embeddings.parquet"))
  }

  /** Build-if-stale: the amortized path every search gate takes. The
    * freshness probe is the source parquet's size+mtime stamp — no data
    * scan, and a regenerated source can never serve a stale index even
    * when its row count collides. */
  def ivfIndexDir(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val dir = graft.operators.IndexStore.dirFor(d, "ivf")
    val stamp = graft.operators.IndexStore.sourceStamp(s"$d/embeddings.parquet")
    if (!graft.operators.IndexStore.isFresh(s, dir, stamp))
      buildIvfIndex(s, d, dir, embeddings(s, d).count())
    dir
  }

  /** Index BUILD as a gate: (re)writes the persisted IVF index, then
    * reports per-cell occupancy READ BACK FROM THE WRITTEN FILES — the
    * oracle replays the assignment from the base table, so the gate
    * proves the round-tripped layout, not just the in-memory frame.
    * This is the amortization half of the 100 TB search story: build
    * once (this gate's honest cost), serve millions of probes from the
    * bucketed layout ([[qIvfIndexSearch]]). */
  val qIvfIndexBuild: Q = Q.sql(
    "q_ivf_index_build",
    s"""WITH vecs AS ($vecsSqlNested),
       |cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM vecs WHERE vec_id < $IvfCells),
       |scored AS (
       |  SELECT q.vec_id, c.cid,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY (${dotSql("q", "c").replace("c.v[", "c.cv[")}) / (q.nrm * c.cnrm) DESC, c.cid)
       |      AS BIGINT) AS crank
       |  FROM vecs q JOIN cents c ON true
       |),
       |assigned AS (SELECT vec_id, cid AS cell FROM scored WHERE crank = 1)
       |SELECT CAST(cell AS BIGINT) AS cell, CAST(count(*) AS BIGINT) AS n_vectors,
       |  CAST(min(vec_id) AS BIGINT) AS min_vec_id, CAST(max(vec_id) AS BIGINT) AS max_vec_id
       |FROM assigned GROUP BY 1 ORDER BY cell""".stripMargin,
    doc = s"persisted IVF index build: cell-bucketed parquet, occupancy read back from disk") {
    (s, d) =>
      val dir = graft.operators.IndexStore.dirFor(d, "ivf")
      buildIvfIndex(s, d, dir, embeddings(s, d).count())
      graft.operators.IndexStore.read(s, dir, "vectors", IvfVecSchema)
        .groupBy(col("cell"))
        .agg(count(lit(1)).cast("long").as("n_vectors"),
          min(col("vec_id")).as("min_vec_id"), max(col("vec_id")).as("max_vec_id"))
        .orderBy("cell")
  }

  /** Index SEARCH against the persisted layout: probe cells come from
    * scoring the query vectors against the STORED centroid table, the
    * candidate set from an equi-join against the cell-bucketed vectors
    * parquet — no corpus-wide assignment work at query time. Identical
    * output to [[qAnnIvf]] (same oracle; equality also spec-pinned):
    * the index is the materialized assignment, nothing more. */
  val qIvfIndexSearch: Q = Q.sql(
    "q_ivf_index_search",
    ivfOracleSql,
    doc = s"IVF ANN served from the persisted cell-bucketed index (build amortized)") {
    (s, d) =>
      val dir = ivfIndexDir(s, d)
      val idx = graft.operators.IndexStore.read(s, dir, "vectors", IvfVecSchema)
      val cents = graft.operators.IndexStore.read(s, dir, "centroids", IvfCentSchema)
      val queries = vecs(s, d).filter(col("vec_id") < NumQueries)
      val probes = probeCells(queries, cents, NProbe)
        .select(col("vec_id").as("q_id"), col("cid").as("pcell"))
      ivfSearchAssigned(probes, queries, idx)
  }

  /** Int8 scalar quantization of the embedding column — the storage op a
    * 100 TB embedding corpus runs before indexing (4× smaller vectors,
    * ANN-compatible). Per-vector symmetric scale = 127/max|v_i|;
    * quantized byte = round(v_i·scale); reconstruction MSE reported per
    * vector. Narrow per-row transform (zero shuffles — the ORDER BY is
    * oracle determinism only); the oracle replays the same arithmetic
    * element-wise, with the float-sum MSE rounded on both sides per the
    * [[Q]] convention. */
  val qEmbedQuantize: Q = Q.sql(
    "q_embed_quantize",
    s"""WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s AS (
       |  SELECT vec_id, v,
       |    127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
       |  FROM vecs
       |), q AS (
       |  SELECT vec_id, scale,
       |    list_transform(v, x -> CAST(round(x * scale) AS INT)) AS qv,
       |    list_sum(list_transform(v, x -> power(x - round(x * scale) / scale, 2))) / $Dim AS mse
       |  FROM s
       |)
       |SELECT vec_id, scale,
       |  md5(array_to_string(qv, ',')) AS qhash,
       |  round(mse, 9) AS mse_r
       |FROM q
       |ORDER BY vec_id""".stripMargin,
    doc = "int8 scalar quantization: per-vector scale, quantized hash, recon MSE") { (s, d) =>
    val v = col("v")
    val absmax = aggregate(transform(v, x => abs(x)), lit(0.0), (a, x) => greatest(a, x))
    val scale = lit(127.0) / col("am")
    val qv = transform(v, x => round(x * scale).cast("int"))
    val errSum = aggregate(
      transform(v, x => pow(x - round(x * scale) / scale, 2)),
      lit(0.0), (a, x) => a + x)
    embeddings(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .select(col("vec_id"), v, absmax.as("am"))
      .select(
        col("vec_id"),
        scale.as("scale"),
        md5(concat_ws(",", transform(qv, _.cast("string")))).as("qhash"),
        round((errSum / Dim).as("mse"), 9).as("mse_r"))
      .orderBy("vec_id")
  }

  val PqBlocks = 8
  val PqSubDim = Dim / PqBlocks // 8 dims per sub-block
  val PqCents = 16 // codebook entries per block (vec_id < 16, like IVF fixed cells)

  /** Product quantization — the standard ANN compression: each vector
    * splits into [[PqBlocks]] sub-vectors, each encoded as the id of its
    * nearest codebook centroid, so a 64-dim float vector becomes 8 small
    * codes (64× compression at scale).
    *
    * Scale design: the codebook is a fixed tiny table (here the first
    * [[PqCents]] vectors' sub-blocks, the same deterministic convention as
    * the IVF fixed cells — a trained codebook would plug in identically)
    * broadcast against the corpus exploded to one row per (vector, block):
    * a narrow broadcast join, no shuffle proportional to the corpus.
    * Distances are position-ordered left folds, so Spark and DuckDB agree
    * bit-for-bit; per-block argmin ties break on centroid id. */
  /** Shared DuckDB CTE chain for the PQ family: vectors → sub-vector
    * blocks → codebook → per-(vector, block) nearest-centroid assignment
    * (`best`: vec_id, b, cid, d2). */
  private val pqCtesSql =
    s"""vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |blocked AS (
       |  SELECT vec_id, b, list_slice(v, b * $PqSubDim + 1, b * $PqSubDim + $PqSubDim) AS x
       |  FROM vecs CROSS JOIN (SELECT unnest(generate_series(0, ${PqBlocks - 1})) AS b) _b
       |), cents AS (
       |  SELECT vec_id AS cid, b, list_slice(v, b * $PqSubDim + 1, b * $PqSubDim + $PqSubDim) AS c
       |  FROM vecs CROSS JOIN (SELECT unnest(generate_series(0, ${PqBlocks - 1})) AS b) _b
       |  WHERE vec_id < $PqCents
       |), dists AS (
       |  SELECT vec_id, blocked.b, cid,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(generate_series(1, $PqSubDim),
       |        i -> (x[i] - c[i]) * (x[i] - c[i]))), (a, y) -> a + y) AS d2,
       |    row_number() OVER (PARTITION BY vec_id, blocked.b
       |      ORDER BY list_reduce(list_prepend(0.0,
       |        list_transform(generate_series(1, $PqSubDim),
       |          i -> (x[i] - c[i]) * (x[i] - c[i]))), (a, y) -> a + y), cid) AS rn
       |  FROM blocked JOIN cents ON blocked.b = cents.b
       |), best AS (
       |  SELECT vec_id, b, CAST(cid AS BIGINT) AS cid, d2 FROM dists WHERE rn = 1
       |)""".stripMargin

  val qEmbedPq: Q = Q.sql(
    "q_embed_pq", {
      val codeCols = (0 until PqBlocks).map(b => s"max(CASE WHEN b = $b THEN cid END) AS c$b")
        .mkString(",\n  ")
      val errSum = (0 until PqBlocks).map(b => s"max(CASE WHEN b = $b THEN d2 END)")
        .mkString(" + ")
      s"""WITH $pqCtesSql
         |SELECT vec_id,
         |  $codeCols,
         |  round($errSum, 6) AS sqerr
         |FROM best GROUP BY vec_id
         |ORDER BY vec_id""".stripMargin
    },
    doc = s"product quantization: $PqBlocks blocks × $PqCents-entry codebook, broadcast assign") {
    (s, d) =>
      val vecsAll = pqVecs(s, d)
      val best = pqBest(pqBlockify(vecsAll, "vec_id").withColumnRenamed("s", "x"),
        pqCentsOf(vecsAll))
      val codeCols = (0 until PqBlocks).map(b =>
        max(when(col("b") === b, col("cid").cast("long"))).as(s"c$b"))
      val errSum = (0 until PqBlocks).map(b => max(when(col("b") === b, col("d2")))).reduce(_ + _)
      best.groupBy(col("vec_id"))
        .agg(codeCols.head, (codeCols.tail :+ round(errSum, 6).as("sqerr")): _*)
        .orderBy("vec_id")
  }

  private def pqVecs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))

  /** One row per (id, block): the block's sub-vector as `s`. */
  private def pqBlockify(df: DataFrame, idAs: String): DataFrame = df.select(
    col("vec_id").as(idAs),
    explode(array((0 until PqBlocks).map(b =>
      struct(lit(b).as("b"), slice(col("v"), b * PqSubDim + 1, PqSubDim).as("s"))): _*))
      .as("e"))
    .select(col(idAs), col("e.b").as("b"), col("e.s").as("s"))

  private def pqCentsOf(vecsAll: DataFrame): DataFrame =
    pqBlockify(vecsAll.filter(col("vec_id") < PqCents), "cid").withColumnRenamed("s", "c")

  /** Position-ordered left fold of the block squared distance — the same
    * accumulation order as the oracle's list_reduce, so distances are
    * bit-identical. Expects sub-vectors in columns `x` and `c`. */
  private def pqD2: Column = aggregate(
    zip_with(col("x"), col("c"), (a, b) => (a - b) * (a - b)),
    lit(0.0), (acc, y) => acc + y)

  /** PQ assignment: per (vector, block) the nearest codebook entry —
    * (vec_id, b, cid, d2), ties on centroid id. */
  private def pqBest(blocked: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("b")).orderBy(col("d2"), col("cid"))
    blocked.join(broadcast(cents), "b")
      .select(col("vec_id"), col("b"), col("cid"), pqD2.as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  val PqSearchQueries = 4 // vec_id < 4 act as ADC query vectors
  val PqSearchK = 10

  /** PQ asymmetric-distance search (ADC — Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): approximate top-k over
    * the COMPRESSED corpus. Each query precomputes a lookup table of its
    * exact sub-vector distance to every codebook entry; a base vector's
    * approximate distance is then just [[PqBlocks]] table lookups summed —
    * the corpus's raw floats are never touched at query time.
    *
    * Scale design: this is why PQ exists at 100 TB — the scan reads 8
    * small codes per vector instead of 64 floats, the LUT
    * ([[PqSearchQueries]]·[[PqBlocks]]·[[PqCents]] rows) is broadcast, and
    * the per-query top-k plans through a rank window whose running-limit
    * (WindowGroupLimit) caps every partition at k before the final merge.
    * Parity: per-block distances are position-ordered folds; the
    * cross-block sum is a FIXED-order conditional-aggregate chain — both
    * bit-identical across engines, so `ad2` ships raw (no round). */
  /** Shared ADC-search oracle: replays codebook build, code assignment,
    * query LUTs, and the lookup-sum top-k — used by the inline gate
    * [[qPqSearch]] and the persisted-index gate [[qPqIndexSearch]] (the
    * stored codes/codebook ARE the `best`/`cents` CTEs, materialized). */
  private val pqSearchOracleSql: String = {
      val adcSum = (0 until PqBlocks).map(b => s"max(CASE WHEN b = $b THEN ld2 END)")
        .mkString(" + ")
      s"""WITH $pqCtesSql,
         |qb AS (
         |  SELECT vec_id AS q_id, b, x FROM blocked WHERE vec_id < $PqSearchQueries
         |), lut AS (
         |  SELECT q_id, cents.b AS b, CAST(cid AS BIGINT) AS cid,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(generate_series(1, $PqSubDim),
         |        i -> (x[i] - c[i]) * (x[i] - c[i]))), (a, y) -> a + y) AS ld2
         |  FROM qb JOIN cents ON qb.b = cents.b
         |), adc0 AS (
         |  SELECT lut.q_id, best.vec_id, best.b, lut.ld2
         |  FROM best JOIN lut ON best.b = lut.b AND best.cid = lut.cid
         |), adc AS (
         |  SELECT q_id, vec_id, $adcSum AS ad2 FROM adc0 GROUP BY q_id, vec_id
         |), r AS (
         |  SELECT q_id, vec_id, ad2,
         |    row_number() OVER (PARTITION BY q_id ORDER BY ad2, vec_id) AS rn
         |  FROM adc
         |)
         |SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, ad2
         |FROM r WHERE rn <= $PqSearchK
         |ORDER BY q_id, rn""".stripMargin
  }

  val qPqSearch: Q = Q.sql(
    "q_pq_search",
    pqSearchOracleSql,
    doc = s"PQ asymmetric-distance top-$PqSearchK: LUT broadcast, codes-only corpus scan") {
    (s, d) =>
      val vecsAll = pqVecs(s, d)
      val blocked = pqBlockify(vecsAll, "vec_id").withColumnRenamed("s", "x")
      val cents = pqCentsOf(vecsAll)
      val codes = pqBest(blocked, cents).select(col("vec_id"), col("b"), col("cid"))
      val lut = blocked
        .filter(col("vec_id") < PqSearchQueries)
        .select(col("vec_id").as("q_id"), col("b"), col("x"))
        .join(cents, "b")
        .select(col("q_id"), col("b"), col("cid"), pqD2.as("ld2"))
      pqAdcSearch(codes, lut)
  }

  /** Layout guard for a flat block-major LUT: [[graft.expressions.PqAdc]]
    * derives the stride as `lut.length / codes.length`, so a tall LUT
    * missing (b, cid) pairs in a way that PRESERVES divisibility (e.g.
    * one missing cid per block) would pass its length check and silently
    * score against neighboring entries. Pin the exact expected size here
    * instead; the guard is folded into the value (slice offset) so column
    * pruning can never skip it, and `slice(lt, 1, n)` is the identity on
    * a correctly-sized array — oracle hashes unchanged. */
  private def lutChecked(lt: Column, expected: Int): Column = {
    val guard = coalesce(
      assert_true(size(lt) === expected,
        concat(lit(s"pq LUT misaligned: expected $expected (blocks*cents) entries, got "),
          size(lt))).cast("int"),
      lit(0))
    slice(lt, lit(1) + guard, lit(expected))
  }

  /** Fold the tall per-(q_id, b, cid) lookup table into ONE flat
    * array<double> row per query, block-major (`lt[b*PqCents + cid]`):
    * the broadcast payload [[graft.expressions.PqAdc]] indexes. Every
    * (block, centroid) pair is present exactly once, so the sorted
    * struct order IS the layout order; [[lutChecked]] fails loudly if a
    * pair is missing rather than letting the stride misalign. */
  private def pqLutFlat(lut: DataFrame): DataFrame =
    lut.groupBy(col("q_id")).agg(
      lutChecked(
        transform(
          array_sort(collect_list(struct(col("b"), col("cid"), col("ld2")))),
          e => e.getField("ld2")),
        PqBlocks * PqCents).as("lt"))

  /** The in-row ADC sum over a wide code row + its flat LUT column `lt`
    * ([[graft.expressions.PqAdc]]) — no explode, no re-aggregation. */
  private def pqAdcScore: Column =
    graft.expressions.VectorOps.pqAdc(col("lt"),
      array((0 until PqBlocks).map(b => col(s"c$b").cast("int")): _*))

  /** Per-query top-k over in-row-scored (q_id, vec_id, ad2) rows: the
    * rank window's running limit (WindowGroupLimit) caps every partition
    * at k before the final merge. */
  private def pqAdcFinish(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("ad2"), col("vec_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= PqSearchK)
      .select(col("q_id"), col("rn"), col("vec_id"), col("ad2"))
      .orderBy("q_id", "rn")
  }

  /** ADC rank over WIDE candidate rows (q_id, vec_id, c0..c7): joins the
    * one-row-per-query flat LUT (broadcast, 128 doubles) and computes the
    * whole ADC sum in-row — no explode, no re-aggregation in the serve
    * path. Shared by the inline and persisted-index IVF-PQ search gates. */
  private def pqAdcRank(cand: DataFrame, lut: DataFrame): DataFrame =
    pqAdcFinish(cand
      .join(broadcast(pqLutFlat(lut)), "q_id")
      .select(col("q_id"), col("vec_id"), pqAdcScore.as("ad2")))

  /** Pivot a tall (vec_id, b, cid) code table to one wide row per vector
    * (vec_id, c0..c7) — the stored-index layout, derived once so the
    * inline gates score through the same wide ADC path the serving
    * gates use. */
  private def pqWiden(codes: DataFrame): DataFrame = {
    val codeCols = (0 until PqBlocks).map(b =>
      max(when(col("b") === b, col("cid").cast("long"))).as(s"c$b"))
    codes.groupBy(col("vec_id")).agg(codeCols.head, codeCols.tail: _*)
  }

  /** ADC top-k over a (vec_id, b, cid) code table against EVERY query in
    * `lut` (the full-corpus ADC scan, no candidate pruning) — shared by
    * the inline and persisted-index PQ search gates. */
  private def pqAdcSearch(codes: DataFrame, lut: DataFrame): DataFrame =
    pqAdcSearchWide(pqWiden(codes), lut)

  /** [[pqAdcSearch]] over the wide code layout directly (what the
    * persisted index stores — no explode round-trip): the flat LUT row
    * itself fans the corpus out per query, so the query-side subtree is
    * built exactly once. */
  private def pqAdcSearchWide(wide: DataFrame, lut: DataFrame): DataFrame =
    pqAdcFinish(wide
      .crossJoin(broadcast(pqLutFlat(lut)))
      .select(col("q_id"), col("vec_id"), pqAdcScore.as("ad2")))

  /** INCREMENTAL index maintenance — the path a living 100 TB index
    * actually takes: the index is built once over the base corpus
    * (75%, vec_id % 4 ≠ 3), then the remaining 25% arrives as a batch
    * and is ASSIGNED AGAINST THE STORED (frozen) CENTROIDS and APPENDED
    * into the existing cell partitions — no rebuild, nothing rewritten
    * (the batch's files accrete next to the base files; spec-pinned).
    * Because an IVF assignment depends only on the centroid table, the
    * incrementally-maintained index is row-identical to a full build,
    * so the search result shares [[qAnnIvf]]'s oracle verbatim. Crash
    * safety: the meta marker is dropped before the append and
    * re-written after, so a half-appended index reads as stale and
    * rebuilds. */
  val qIvfIndexUpdate: Q = Q.sql(
    "q_ivf_index_update",
    ivfOracleSql,
    doc = "IVF search after INCREMENTAL index update (batch appended to stored cells)") {
    (s, d) =>
      import graft.operators.IndexStore
      val dir = IndexStore.dirFor(d, "ivf_inc")
      val stamp = IndexStore.sourceStamp(s"$d/embeddings.parquet")
      if (!IndexStore.isFresh(s, dir, stamp)) {
        val n = embeddings(s, d).count()
        val all = vecs(s, d)
        // centroids come from the full key space (vec_id < IvfCells) —
        // the frozen coarse quantizer; cells accrete, centroids never move
        val cents = all.filter(col("vec_id") < IvfCells)
          .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
        IndexStore.invalidate(dir)
        IndexStore.write(
          assignCells(all.filter(pmod(col("vec_id"), lit(4)) =!= 3), cents)
            .repartition(col("cell")),
          dir, "vectors", Seq("cell"))
        IndexStore.write(cents, dir, "centroids", Nil)
        // the incremental batch: assigned against the STORED centroid
        // table (not the in-memory one — the maintenance job only has
        // the index), appended into the existing cell directories
        val storedCents = IndexStore.read(s, dir, "centroids", IvfCentSchema)
        IndexStore.append(
          assignCells(all.filter(pmod(col("vec_id"), lit(4)) === 3), storedCents)
            .repartition(col("cell")),
          dir, "vectors", Seq("cell"))
        IndexStore.writeMeta(s, dir, n, stamp)
      }
      val idx = IndexStore.read(s, dir, "vectors", IvfVecSchema)
      val cents = IndexStore.read(s, dir, "centroids", IvfCentSchema)
      val queries = vecs(s, d).filter(col("vec_id") < NumQueries)
      val probes = probeCells(queries, cents, NProbe)
        .select(col("vec_id").as("q_id"), col("cid").as("pcell"))
      ivfSearchAssigned(probes, queries, idx)
  }

  /** PQ index persisted the way a compressed 100 TB corpus actually
    * ships: ONE row per vector holding its [[PqBlocks]] codes (the
    * 64×-compressed layout — raw floats never stored), plus the tiny
    * codebook table. Search reads codes + codebook from disk, computes
    * the query LUT from the live query vectors, and never touches the
    * corpus floats — identical output to [[qPqSearch]] (same oracle;
    * equality spec-pinned). Freshness via the [[graft.operators.IndexStore]]
    * count meta, like the IVF index. */
  val qPqIndexSearch: Q = Q.sql(
    "q_pq_index_search",
    pqSearchOracleSql,
    doc = s"PQ ADC top-$PqSearchK served from the persisted codes+codebook index") {
    (s, d) =>
      val dir = graft.operators.IndexStore.dirFor(d, "pq")
      val stamp = graft.operators.IndexStore.sourceStamp(s"$d/embeddings.parquet")
      if (!graft.operators.IndexStore.isFresh(s, dir, stamp)) {
        val n = embeddings(s, d).count()
        val vecsAll = pqVecs(s, d)
        val blocked = pqBlockify(vecsAll, "vec_id").withColumnRenamed("s", "x")
        val cents = pqCentsOf(vecsAll)
        val wideCodes = pqWiden(pqBest(blocked, cents))
        graft.operators.IndexStore.publish(s, dir, n, Seq(
          ("codes", wideCodes, Nil), ("codebook", cents, Nil)), stamp)
      }
      val codeDdl = "vec_id LONG, " + (0 until PqBlocks).map(b => s"c$b LONG").mkString(", ")
      val wide = graft.operators.IndexStore.read(s, dir, "codes", codeDdl)
      val codebook = graft.operators.IndexStore
        .read(s, dir, "codebook", "cid LONG, b INT, c ARRAY<DOUBLE>")
      val lut = pqBlockify(pqVecs(s, d).filter(col("vec_id") < PqSearchQueries), "q_id")
        .withColumnRenamed("s", "x")
        .join(codebook, "b")
        .select(col("q_id"), col("b"), col("cid"), pqD2.as("ld2"))
      // stored wide rows flow straight into the in-row ADC — the serve
      // path never explodes a candidate into per-block rows
      pqAdcSearchWide(wide, lut)
  }

  /** IVF-PQ search (Jégou et al. 2011 §V, the FAISS `IVFx,PQy` index —
    * THE standard billion-scale ANN layout): the coarse IVF quantizer
    * prunes the corpus to nprobe cells per query, and PQ asymmetric
    * distance scores only those candidates from their 8-byte codes. The
    * two stages compose the engine's existing oracle-gated parts:
    * [[qAnnIvf]]'s cosine cell assignment and [[qPqSearch]]'s
    * broadcast-LUT ADC scoring.
    *
    * Scale design — this is the 100 TB search plan: the scan cost is
    * `nprobe/cells` of the corpus AND reads codes instead of floats
    * (here 16× cell pruning × 32× byte compression); the LUT and the
    * probe list broadcast; the candidate join is an equi-join on cell;
    * the per-query top-k caps through the rank window's running limit.
    * Parity: both stages reuse the exact expression forms their parent
    * gates pin, so `ad2` ships raw. (This variant PQ-encodes raw
    * vectors, not cell residuals — the residual refinement changes
    * codebook training, not the dataflow shape.) */
  /** Shared IVF-PQ oracle: coarse assignment + probes, PQ codes, query
    * LUTs, candidate join on cell, ADC sum, top-k — used verbatim by the
    * inline gate [[qIvfPq]] and the persisted-index gate
    * [[qIvfPqIndexSearch]] (the stored codes/codebook/coarse-centroid
    * tables ARE the `best`/`cents`/`icents` CTEs, materialized). */
  private val ivfPqOracleSql: String = {
      val adcSum = (0 until PqBlocks).map(b => s"max(CASE WHEN b = $b THEN ld2 END)")
        .mkString(" + ")
      s"""WITH $pqCtesSql,
         |nv AS (SELECT vec_id, v, $normSelfSql AS nrm FROM vecs),
         |icents AS (SELECT vec_id AS icid, v AS cv, nrm AS cnrm FROM nv WHERE vec_id < $IvfCells),
         |iscored AS (
         |  SELECT q.vec_id, c.icid,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY (${dotSql("q", "c").replace("c.v[", "c.cv[")}) / (q.nrm * c.cnrm) DESC,
         |        c.icid) AS BIGINT) AS crank
         |  FROM nv q JOIN icents c ON true
         |),
         |iassigned AS (SELECT vec_id, icid AS cell FROM iscored WHERE crank = 1),
         |iprobes AS (
         |  SELECT vec_id AS q_id, icid AS cell FROM iscored
         |  WHERE crank <= $NProbe AND vec_id < $PqSearchQueries
         |),
         |qb AS (
         |  SELECT vec_id AS q_id, b, x FROM blocked WHERE vec_id < $PqSearchQueries
         |), lut AS (
         |  SELECT q_id, cents.b AS b, CAST(cid AS BIGINT) AS cid,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(generate_series(1, $PqSubDim),
         |        i -> (x[i] - c[i]) * (x[i] - c[i]))), (a, y) -> a + y) AS ld2
         |  FROM qb JOIN cents ON qb.b = cents.b
         |), cand AS (
         |  SELECT p.q_id, a.vec_id
         |  FROM iprobes p JOIN iassigned a ON a.cell = p.cell AND a.vec_id <> p.q_id
         |), adc0 AS (
         |  SELECT cand.q_id, best.vec_id, best.b, lut.ld2
         |  FROM cand
         |  JOIN best ON best.vec_id = cand.vec_id
         |  JOIN lut ON lut.q_id = cand.q_id AND lut.b = best.b AND lut.cid = best.cid
         |), adc AS (
         |  SELECT q_id, vec_id, $adcSum AS ad2 FROM adc0 GROUP BY q_id, vec_id
         |), r AS (
         |  SELECT q_id, vec_id, ad2,
         |    row_number() OVER (PARTITION BY q_id ORDER BY ad2, vec_id) AS rn
         |  FROM adc
         |)
         |SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, ad2
         |FROM r WHERE rn <= $PqSearchK
         |ORDER BY q_id, rn""".stripMargin
  }

  val qIvfPq: Q = Q.sql(
    "q_ivfpq", ivfPqOracleSql,
    doc = s"IVF-PQ: $IvfCells cells nprobe=$NProbe coarse prune, PQ-ADC scoring of codes only") {
    (s, d) =>
      val all = vecs(s, d)
      val icents = all.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      ivfPqRawSearch(s, d, all, icents)
  }

  /** The raw-vector IVF-PQ search against an arbitrary (cid, cv, cnrm)
    * coarse-centroid frame — [[qIvfPq]]'s body with the centroids
    * factored out, so the recall spec can drive it with Lloyd-trained
    * cells next to the residual variant on the SAME probe geometry. */
  private[graft] def ivfPqRawSearch(
      s: org.apache.spark.sql.SparkSession, d: String,
      all: DataFrame, icents: DataFrame, nq: Int = PqSearchQueries): DataFrame = {
      // coarse IVF stage — same score bits q_ann_ivf pins, via the
      // in-row argmin (no ×K blowup, no rank window)
      val iassigned = assignCells(all, icents).select(col("vec_id"), col("cell"))
      val iprobes = probeCells(all.filter(col("vec_id") < nq), icents, NProbe)
        .select(col("vec_id").as("q_id"), col("cid").as("pcell"))
      // PQ stage — same helpers q_pq_search pins
      val vecsAll = pqVecs(s, d)
      val blocked = pqBlockify(vecsAll, "vec_id").withColumnRenamed("s", "x")
      val cents = pqCentsOf(vecsAll)
      val codes = pqBest(blocked, cents).select(col("vec_id"), col("b"), col("cid"))
      val lut = blocked
        .filter(col("vec_id") < nq)
        .select(col("vec_id").as("q_id"), col("b"), col("x"))
        .join(cents, "b")
        .select(col("q_id"), col("b"), col("cid"), pqD2.as("ld2"))
      val cand = broadcast(iprobes)
        .join(iassigned, col("cell") === col("pcell") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"))
      // candidates pick up their wide code row, then the in-row ADC —
      // the same serve shape the persisted-index gate uses
      pqAdcRank(pqWiden(codes).join(cand, "vec_id"), lut)
  }

  /** The FULL billion-scale serving layout, persisted: IVF-PQ where the
    * stored index is (a) ONE row per vector holding its cell id and its
    * [[PqBlocks]] codes, partition-bucketed BY CELL — so a search reads
    * only the probed cells' files and only codes, never corpus floats —
    * plus (b) the tiny PQ codebook and (c) the coarse-centroid table.
    * This closes the PQ half of the amortization story the IVF family
    * already has ([[qIvfIndexSearch]]): [[qIvfPq]] re-derives coarse
    * assignment and code assignment inline per query, which a real
    * 100 TB corpus would never do. Search-time work is: score the live
    * query vectors against the stored coarse centroids (broadcast,
    * tiny), compute the query LUT against the stored codebook
    * (broadcast, tiny), then one equi-join of the broadcast probe list
    * against the cell-partitioned code table and the ADC rank — output
    * row-identical to [[qIvfPq]] (same oracle verbatim; equality
    * spec-pinned in Round11OpsSpec). Freshness/crash-safety via the
    * [[graft.operators.IndexStore]] stamp meta, like the IVF index. */
  private val IvfPqCodeDdl = "vec_id LONG, " +
    (0 until PqBlocks).map(b => s"c$b LONG").mkString(", ") + ", cell LONG"

  /** Coarse IVF scoring against a (broadcastable) centroid table: the
    * top-`maxRank` cells per vector as (vec_id, icid) — same score bits
    * q_ann_ivf pins, via the in-row argmin. ONE definition serves both
    * the build-side assignment (rank 1) and the query-side probe list
    * (rank ≤ NProbe), so the tie-break order can never diverge between
    * them. */
  private def ivfPqCoarse(df: DataFrame, icents: DataFrame, maxRank: Int): DataFrame =
    probeCells(df, icents.withColumnRenamed("icid", "cid"), maxRank)
      .select(col("vec_id"), col("cid").as("icid"))

  /** Coarse IVF cell assignment: (vec_id, cell). */
  private def ivfPqAssignCells(df: DataFrame, icents: DataFrame): DataFrame =
    ivfPqCoarse(df, icents, 1).select(col("vec_id"), col("icid").as("cell"))

  /** Wide PQ code rows for a vector subset against a (possibly stored)
    * codebook, joined with their coarse cell: (vec_id, c0..c7, cell). */
  private def ivfPqWideCodes(
      vecsSub: DataFrame, cents: DataFrame, iassigned: DataFrame): DataFrame =
    pqWiden(pqBest(pqBlockify(vecsSub, "vec_id").withColumnRenamed("s", "x"), cents))
      .join(iassigned, "vec_id")

  /** Search the persisted IVF-PQ index at `dir`: live query vectors are
    * coarse-scored against the STORED centroids (broadcast), the query
    * LUT computed against the STORED codebook (broadcast), candidates
    * pulled from the cell-bucketed code table by one equi-join — only
    * probed cells' files are read, never corpus floats. */
  private def ivfPqServe(s: org.apache.spark.sql.SparkSession, d: String, dir: String)
      : DataFrame = {
    import graft.operators.IndexStore
    val wide = IndexStore.read(s, dir, "codes", IvfPqCodeDdl)
    val codebook = IndexStore.read(s, dir, "codebook", "cid LONG, b INT, c ARRAY<DOUBLE>")
    val storedIcents = IndexStore
      .read(s, dir, "icentroids", "icid LONG, cv ARRAY<DOUBLE>, cnrm DOUBLE")
    val queries = vecs(s, d).filter(col("vec_id") < PqSearchQueries)
    val iprobes = ivfPqCoarse(queries, storedIcents, NProbe)
      .select(col("vec_id").as("q_id"), col("icid").as("pcell"))
    val lut = pqBlockify(pqVecs(s, d).filter(col("vec_id") < PqSearchQueries), "q_id")
      .withColumnRenamed("s", "x")
      .join(codebook, "b")
      .select(col("q_id"), col("b"), col("cid"), pqD2.as("ld2"))
    // candidate pull: broadcast probe list against the cell-bucketed
    // code table — only probed cells' partitions are read, codes only;
    // each candidate row then carries its 8 codes straight into the
    // in-row ADC sum (no per-block explode, no re-aggregation)
    val cand = broadcast(iprobes)
      .join(wide, col("cell") === col("pcell") && col("vec_id") =!= col("q_id"))
    pqAdcRank(cand, lut)
  }

  val qIvfPqIndexSearch: Q = Q.sql(
    "q_ivfpq_index_search",
    ivfPqOracleSql,
    doc = s"IVF-PQ ADC top-$PqSearchK served from the persisted cell-bucketed code index") {
    (s, d) =>
      import graft.operators.IndexStore
      val dir = IndexStore.dirFor(d, "ivfpq")
      val stamp = IndexStore.sourceStamp(s"$d/embeddings.parquet")
      if (!IndexStore.isFresh(s, dir, stamp)) {
        val n = embeddings(s, d).count()
        val all = vecs(s, d)
        val icents = all.filter(col("vec_id") < IvfCells)
          .select(col("vec_id").as("icid"), col("v").as("cv"), col("nrm").as("cnrm"))
        val cents = pqCentsOf(pqVecs(s, d))
        val wideCodes = ivfPqWideCodes(pqVecs(s, d), cents, ivfPqAssignCells(all, icents))
          .repartition(col("cell"))
        IndexStore.publish(s, dir, n, Seq(
          ("codes", wideCodes, Seq("cell")),
          ("codebook", cents, Nil),
          ("icentroids", icents, Nil)), stamp)
      }
      ivfPqServe(s, d, dir)
  }

  /** INCREMENTAL IVF-PQ maintenance — the compressed-index counterpart
    * of [[qIvfIndexUpdate]], completing the operational story for the
    * billion-scale layout: the index is built once over the base corpus
    * (75%, vec_id % 4 ≠ 3), then the remaining 25% arrives as a batch,
    * is coarse-assigned AND PQ-encoded against the STORED (frozen)
    * centroid + codebook tables — the maintenance job only has the
    * index — and APPENDED into the existing cell partitions; nothing is
    * rewritten. Both assignments depend only on the frozen tables, so
    * the incrementally-maintained index is row-identical to a full
    * build and the search shares [[qIvfPq]]'s oracle verbatim. Crash
    * safety via the usual meta bracket (invalidate first, meta last). */
  val qIvfPqIndexUpdate: Q = Q.sql(
    "q_ivfpq_index_update",
    ivfPqOracleSql,
    doc = "IVF-PQ search after INCREMENTAL update (batch PQ-encoded against stored codebook)") {
    (s, d) =>
      import graft.operators.IndexStore
      val dir = IndexStore.dirFor(d, "ivfpq_inc")
      val stamp = IndexStore.sourceStamp(s"$d/embeddings.parquet")
      if (!IndexStore.isFresh(s, dir, stamp)) {
        val n = embeddings(s, d).count()
        val all = vecs(s, d)
        // frozen quantizers come from the full key space (vec_id <
        // IvfCells / PqCents) — cells and codes accrete, neither moves
        val icents = all.filter(col("vec_id") < IvfCells)
          .select(col("vec_id").as("icid"), col("v").as("cv"), col("nrm").as("cnrm"))
        val cents = pqCentsOf(pqVecs(s, d))
        val isBatch = pmod(col("vec_id"), lit(4)) === 3
        IndexStore.invalidate(dir)
        IndexStore.write(
          ivfPqWideCodes(pqVecs(s, d).filter(!isBatch), cents,
            ivfPqAssignCells(all.filter(!isBatch), icents))
            .repartition(col("cell")),
          dir, "codes", Seq("cell"))
        IndexStore.write(cents, dir, "codebook", Nil)
        IndexStore.write(icents, dir, "icentroids", Nil)
        // the incremental batch: encoded against the STORED tables (not
        // the in-memory ones), appended into the existing cell dirs
        val storedCents = IndexStore
          .read(s, dir, "codebook", "cid LONG, b INT, c ARRAY<DOUBLE>")
        val storedIcents = IndexStore
          .read(s, dir, "icentroids", "icid LONG, cv ARRAY<DOUBLE>, cnrm DOUBLE")
        IndexStore.append(
          ivfPqWideCodes(pqVecs(s, d).filter(isBatch), storedCents,
            ivfPqAssignCells(all.filter(isBatch), storedIcents))
            .repartition(col("cell")),
          dir, "codes", Seq("cell"))
        IndexStore.writeMeta(s, dir, n, stamp)
      }
      ivfPqServe(s, d, dir)
  }

  // RETIRED GATE `q_ivfpq_residual` (r14, the r13 verdict's item 3):
  // the first-K-seeded residual IVFADC measured recall 0.30 vs raw 0.50
  // (untrained centroids don't concentrate residuals on this corpus), so
  // the registry no longer ships a gate that loses to its own baseline —
  // the winning, Lloyd-trained form is [[qIvfAdcTrained]] (fully
  // oracle-replayed), and the untrained dataflow stays exercised as a
  // spec fixture through [[residualAdcSearch]] (AnnRecallSpec reports
  // its recall; Round12OpsSpec pins its in-row PqAdc serve shape).

  /** Per-block fixed-point Lloyd training of a PQ codebook over a
    * blocked (vec_id, b, x) frame — the sub-quantizer half of what FAISS
    * trains for an IVFADC index (Jégou et al. 2011 §III). Init = the
    * first [[PqCents]] rows' sub-blocks per block (the untrained
    * convention, now just the seed); assignment = argmin of the SAME
    * position-ordered (x−c)² fold the encoder uses ([[pqD2]] — identical
    * bits, centroid-id tiebreak) via a broadcast join + one struct-min
    * hash aggregate (map-side combined, no window); update = exact
    * [[KmQuantum]]-quantized integer means per (block, centroid) —
    * order-independent, so a DuckDB oracle replays the training
    * bit-for-bit. A centroid whose cluster empties carries forward
    * unchanged (the left-join coalesce), keeping the codebook at exactly
    * blocks × cents entries — [[lutChecked]] relies on that. */
  private[graft] def lloydCodebook(blocked: DataFrame, iters: Int): DataFrame = {
    def qcol(c: Column): Column = round(c * KmQuantum, 0).cast("long")
    var cents = blocked.filter(col("vec_id") < PqCents)
      .select(col("vec_id").as("cid"), col("b"), col("x").as("c"))
    for (_ <- 1 to iters) {
      val assigned = blocked.join(broadcast(cents), "b")
        .select(col("vec_id"), col("b"), col("x"), col("cid"), pqD2.as("d2"))
        .groupBy(col("vec_id"), col("b"))
        .agg(min(struct(col("d2"), col("cid"), col("x"))).as("m"))
        .select(col("b"), col("m.cid").as("cid"), col("m.x").as("x"))
      val sums = (0 until PqSubDim).map(i => sum(qcol(element_at(col("x"), i + 1))).as(s"s$i"))
      val m = assigned.groupBy(col("b"), col("cid")).agg(count(lit(1)).as("n"), sums: _*)
        .select(col("b"), col("cid"),
          array((0 until PqSubDim).map(i =>
            col(s"s$i").cast("double") / KmQuantum / col("n")): _*).as("cnew"))
      cents = cents.join(m, Seq("b", "cid"), "left")
        .select(col("cid"), col("b"), coalesce(col("cnew"), col("c")).as("c"))
    }
    cents
  }

  /** The residual (IVFADC) search against an arbitrary (cid, cv, cnrm)
    * coarse-centroid frame (Jégou et al. 2011 §V.A): PQ encodes each
    * vector's residual r = v − c(cell) with a PER-PROBED-CELL query LUT
    * (queries × nprobe × blocks × cents rows — tiny and broadcast);
    * candidates score through the in-row [[graft.expressions.PqAdc]].
    * The Lloyd-trained persisted gate ([[qIvfAdcTrained]]) and the
    * recall spec feed trained cells through this IDENTICAL dataflow.
    * `codebookIters` > 0 additionally Lloyd-trains the residual PQ
    * codebook ([[lloydCodebook]]); 0 keeps the first-[[PqCents]] seed
    * codebook (the untrained convention — since r14 a spec fixture
    * only; see the retirement note above [[lloydCodebook]]). */
  private[graft] def residualAdcSearch(
      all: DataFrame, icents0: DataFrame, codebookIters: Int = 0,
      nq: Int = PqSearchQueries): DataFrame = {
      val icents = icents0.withColumnRenamed("cid", "icid")
      // residual per vector against its OWN cell centroid: one exact
      // IEEE subtraction per element, fused into the encode scan
      val resid = ivfPqAssignCells(all, icents)
        .join(all.select(col("vec_id"), col("v")), "vec_id")
        .join(broadcast(icents.select(col("icid").as("cell"), col("cv"))), "cell")
        .select(col("vec_id"), col("cell"),
          zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
      val rblocked = pqBlockify(resid, "vec_id").withColumnRenamed("s", "x")
      val rcents =
        if (codebookIters <= 0)
          rblocked.filter(col("vec_id") < PqCents)
            .select(col("vec_id").as("cid"), col("b"), col("x").as("c"))
        else lloydCodebook(rblocked, codebookIters)
      val wideCodes = pqWiden(pqBest(rblocked, rcents))
        .join(resid.select(col("vec_id"), col("cell")), "vec_id")
      residualServe(all.filter(col("vec_id") < nq),
        icents0.withColumnRenamed("icid", "cid"), rcents, wideCodes)
  }

  /** Query-side residual ADC serve — shared VERBATIM by the inline
    * residual gates and the persisted trained-index gate (which reads
    * every input frame from the store): probe cells by cosine against
    * `icents` (cid, cv, cnrm); PER-PROBED-CELL query residuals (the
    * residual depends on which cell is probed — nprobe LUTs per query);
    * LUT against `rcents` (cid, b, c); candidates from `wideCodes`
    * (vec_id, c0.., cell) by one broadcast probe equi-join; in-row
    * [[graft.expressions.PqAdc]] scoring. */
  private def residualServe(
      queries: DataFrame, icents: DataFrame, rcents: DataFrame,
      wideCodes: DataFrame): DataFrame = {
      val iprobes = probeCells(queries, icents, NProbe)
        .select(col("vec_id").as("q_id"), col("cid").as("pcell"))
      val qresid = iprobes
        .join(queries.select(col("vec_id").as("q_id"), col("v")), "q_id")
        .join(broadcast(icents.select(col("cid").as("pcell"), col("cv"))), "pcell")
        .select(col("q_id"), col("pcell"),
          zip_with(col("v"), col("cv"), (a, b) => a - b).as("rq"))
      val qblocked = qresid.select(
        col("q_id"), col("pcell"),
        posexplode(array((0 until PqBlocks).map(b =>
          struct(lit(b).as("b"),
            slice(col("rq"), b * PqSubDim + 1, PqSubDim).as("x"))): _*)).as(Seq("_p", "e")))
        .select(col("q_id"), col("pcell"), col("e.b").as("b"), col("e.x").as("x"))
      val lut = qblocked.join(rcents, "b")
        .select(col("q_id"), col("pcell"), col("b"), col("cid"), pqD2.as("ld2"))
      // flat LUT per (query, probed cell) — the broadcast payload the
      // in-row ADC indexes, one row per candidate afterwards
      val lutFlat = lut.groupBy(col("q_id"), col("pcell")).agg(
        lutChecked(
          transform(
            array_sort(collect_list(struct(col("b"), col("cid"), col("ld2")))),
            e => e.getField("ld2")),
          PqBlocks * PqCents).as("lt"))
      val cand = broadcast(iprobes)
        .join(wideCodes, col("cell") === col("pcell") && col("vec_id") =!= col("q_id"))
      pqAdcFinish(cand
        .join(broadcast(lutFlat), Seq("q_id", "pcell"))
        .select(col("q_id"), col("vec_id"), pqAdcScore.as("ad2")))
  }

  /** Training depth of the persisted trained-IVFADC index: Lloyd
    * iterations for the coarse quantizer and for the per-block residual
    * PQ codebook. 2/2 chosen by measurement (AnnRecallProbe at sf0.01,
    * 16 queries): recall@5-in-10 = 0.575 vs 0.525 (untrained codebook),
    * 0.488 (raw PQ, same trained cells) and 0.538 (raw PQ, first-K
    * cells) — the residual refinement finally WINNING, which was r12's
    * top ask; deeper training measured flat-to-worse (cb3 = 0.575,
    * lloyd3 coarse lowered the probe ceiling 0.850 → 0.825). */
  val LloydIters = 2
  val CbIters = 2

  /** DuckDB CTE chain replaying [[lloydCentroids]] over `nv`: k0 = the
    * first-`k` seed, then per iteration squared-L2 argmin assignment
    * (rank by `|q|² − 2q·c + |c|²`, id tiebreak — identical bits to
    * [[graft.expressions.VecTopCells]] byCos=false) and exact
    * [[KmQuantum]]-quantized integer means. Ends at CTE `k<iters>`
    * (cid, cv, cnrm). The same fixed-point design [[qKmeans]] pins. */
  private def lloydSqlCtes(k: Int, iters: Int): String = {
    def dotCvSql(q: String, c: String) =
      (0 until Dim).map(i => s"$q.v[${i + 1}] * $c.cv[${i + 1}]").mkString(" + ")
    val qsum = (0 until Dim)
      .map(i => s"CAST(sum(CAST(round(v[${i + 1}] * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS s$i")
      .mkString(", ")
    val meansArr = (0 until Dim)
      .map(i => s"CAST(s$i AS DOUBLE) / 1000000.0 / n").mkString("[", ", ", "]")
    def cnrmSql(arr: String) =
      "sqrt(" + (0 until Dim).map(i => s"$arr[${i + 1}] * $arr[${i + 1}]").mkString(" + ") + ")"
    val k0 = s"k0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM nv WHERE vec_id < $k)"
    val iterCtes = (1 to iters).map { t =>
      s"""ks$t AS (
         |  SELECT q.vec_id, q.v, c.cid,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY q.nrm * q.nrm - 2 * (${dotCvSql("q", "c")}) + c.cnrm * c.cnrm, c.cid)
         |      AS rk
         |  FROM nv q JOIN k${t - 1} c ON true
         |), ka$t AS (SELECT vec_id, v, cid AS cell FROM ks$t WHERE rk = 1),
         |km$t AS (SELECT cell, CAST(count(*) AS BIGINT) AS n, $qsum FROM ka$t GROUP BY cell),
         |k$t AS (
         |  SELECT cell AS cid, cv, ${cnrmSql("cv")} AS cnrm
         |  FROM (SELECT cell, $meansArr AS cv FROM km$t) _m$t
         |)""".stripMargin
    }
    (k0 +: iterCtes).mkString(",\n")
  }

  /** DuckDB CTE chain replaying [[lloydCodebook]] over `rblocked`
    * (vec_id, cell, b, x): cb0 = the first-[[PqCents]] seed per block,
    * then per iteration the position-ordered (x−c)² argmin (the same
    * fold the encoder pins) and quantized means per (block, centroid),
    * empty entries carried forward by the LEFT JOIN coalesce. Ends at
    * CTE `cb<iters>` (cid, b, c). */
  private def cbSqlCtes(iters: Int): String = {
    val d2 = s"""list_reduce(list_prepend(0.0,
       |      list_transform(generate_series(1, $PqSubDim),
       |        i -> (x[i] - c[i]) * (x[i] - c[i]))), (a, y) -> a + y)""".stripMargin
    val qsum8 = (0 until PqSubDim)
      .map(i => s"CAST(sum(CAST(round(x[${i + 1}] * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS s$i")
      .mkString(", ")
    val means8 = (0 until PqSubDim)
      .map(i => s"CAST(s$i AS DOUBLE) / 1000000.0 / n").mkString("[", ", ", "]")
    // MATERIALIZED: each cb<t> is read twice (next iteration's assign +
    // carry-forward) and the chain hangs off the multiply-referenced
    // rblocked — without it DuckDB re-inlines the whole training tree
    // per reference and the plan blows past the memory limit
    val cb0 =
      s"cb0 AS MATERIALIZED (SELECT vec_id AS cid, b, x AS c FROM rblocked WHERE vec_id < $PqCents)"
    val iterCtes = (1 to iters).map { t =>
      s"""cbs$t AS (
         |  SELECT rblocked.vec_id, rblocked.b, rblocked.x, cid,
         |    row_number() OVER (PARTITION BY rblocked.vec_id, rblocked.b
         |      ORDER BY $d2, cid) AS rn
         |  FROM rblocked JOIN cb${t - 1} ON rblocked.b = cb${t - 1}.b
         |), cba$t AS (SELECT b, cid, x FROM cbs$t WHERE rn = 1),
         |cbm$t AS (
         |  SELECT b, cid, CAST(count(*) AS BIGINT) AS n, $qsum8
         |  FROM cba$t GROUP BY b, cid
         |), cb$t AS MATERIALIZED (
         |  SELECT p.cid, p.b, coalesce(m.cnew, p.c) AS c
         |  FROM cb${t - 1} p LEFT JOIN (SELECT b, cid, $means8 AS cnew FROM cbm$t) m
         |    ON p.b = m.b AND p.cid = m.cid
         |)""".stripMargin
    }
    (cb0 +: iterCtes).mkString(",\n")
  }

  /** Trained residual IVF-PQ, PERSISTED — the full IVFADC index the way
    * FAISS ships it (Jégou et al. 2011 §V.A with BOTH quantizers
    * trained): coarse centroids from [[lloydCentroids]] (2 fixed-point
    * Lloyd iterations, seeded from the first-K rows), per-block residual
    * PQ codebook from [[lloydCodebook]] (2 iterations, seeded from the
    * first-K residuals), corpus residual-encoded against the STORED
    * artifacts and stored as cell-bucketed code rows. This closes r12's
    * top ask: the residual refinement now WINS (see [[LloydIters]];
    * `AnnRecallSpec` asserts trained-residual > raw on the same probe
    * geometry AND > the first-K raw variant).
    *
    * The ENTIRE training run is DuckDB-replayed — quantized integer
    * means make every centroid coordinate bit-identical across engines,
    * so the oracle hash-pins training, encoding, and search end to end
    * (spark.ml KMeans could never do this). Build happens once under
    * the usual stamp/meta freshness bracket, with the codebook trained
    * and WRITTEN before the codes are encoded — the encode provably
    * reads the stored quantizers, like the incremental-update gates.
    * Serve reads only the probed cells' code files and the two tiny
    * quantizer tables, through the same [[residualServe]] the inline
    * gate uses. Queries: the [[NumQueries]] set (16) — the 4-query
    * PQ set ranks variants at ±0.05 granularity, too coarse for the
    * recall claims this gate carries. */
  val qIvfAdcTrained: Q = Q.sql(
    "q_ivfadc_trained", {
      val adcSum = (0 until PqBlocks).map(b => s"max(CASE WHEN b = $b THEN ld2 END)")
        .mkString(" + ")
      val blockGen = s"CROSS JOIN (SELECT unnest(generate_series(0, ${PqBlocks - 1})) AS b) _b"
      val d2Fold = s"""list_reduce(list_prepend(0.0,
         |      list_transform(generate_series(1, $PqSubDim),
         |        i -> (x[i] - c[i]) * (x[i] - c[i]))), (a, y) -> a + y)""".stripMargin
      s"""WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nv AS MATERIALIZED (SELECT vec_id, v, $normSelfSql AS nrm FROM vecs),
         |${lloydSqlCtes(IvfCells, LloydIters)},
         |icents AS MATERIALIZED (SELECT cid AS icid, cv, cnrm FROM k$LloydIters),
         |iscored AS MATERIALIZED (
         |  SELECT q.vec_id, c.icid,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY (${dotSql("q", "c").replace("c.v[", "c.cv[")}) / (q.nrm * c.cnrm) DESC,
         |        c.icid) AS BIGINT) AS crank
         |  FROM nv q JOIN icents c ON true
         |),
         |iassigned AS MATERIALIZED (SELECT vec_id, icid AS cell FROM iscored WHERE crank = 1),
         |resid AS MATERIALIZED (
         |  SELECT a.vec_id, a.cell,
         |    list_transform(generate_series(1, $Dim), i -> q.v[i] - c.cv[i]) AS r
         |  FROM iassigned a JOIN nv q ON q.vec_id = a.vec_id JOIN icents c ON c.icid = a.cell
         |),
         |rblocked AS MATERIALIZED (
         |  SELECT vec_id, cell, b, list_slice(r, b * $PqSubDim + 1, b * $PqSubDim + $PqSubDim) AS x
         |  FROM resid $blockGen
         |),
         |${cbSqlCtes(CbIters)},
         |rcents AS MATERIALIZED (SELECT cid, b, c FROM cb$CbIters),
         |dists AS (
         |  SELECT rblocked.vec_id, rblocked.cell, rblocked.b, cid, $d2Fold AS d2,
         |    row_number() OVER (PARTITION BY rblocked.vec_id, rblocked.b
         |      ORDER BY $d2Fold, cid) AS rn
         |  FROM rblocked JOIN rcents ON rblocked.b = rcents.b
         |),
         |best AS MATERIALIZED (SELECT vec_id, cell, b, CAST(cid AS BIGINT) AS cid FROM dists WHERE rn = 1),
         |iprobes AS (
         |  SELECT vec_id AS q_id, icid AS pcell FROM iscored
         |  WHERE crank <= $NProbe AND vec_id < $NumQueries
         |),
         |qresid AS (
         |  SELECT p.q_id, p.pcell,
         |    list_transform(generate_series(1, $Dim), i -> q.v[i] - c.cv[i]) AS rq
         |  FROM iprobes p JOIN nv q ON q.vec_id = p.q_id JOIN icents c ON c.icid = p.pcell
         |),
         |qblocked AS (
         |  SELECT q_id, pcell, b, list_slice(rq, b * $PqSubDim + 1, b * $PqSubDim + $PqSubDim) AS x
         |  FROM qresid $blockGen
         |),
         |lut AS MATERIALIZED (
         |  SELECT q_id, pcell, rcents.b AS b, CAST(cid AS BIGINT) AS cid, $d2Fold AS ld2
         |  FROM qblocked JOIN rcents ON qblocked.b = rcents.b
         |),
         |cand AS (
         |  SELECT p.q_id, p.pcell, a.vec_id
         |  FROM iprobes p JOIN iassigned a ON a.cell = p.pcell AND a.vec_id <> p.q_id
         |),
         |adc0 AS (
         |  SELECT cand.q_id, cand.vec_id, best.b, lut.ld2
         |  FROM cand
         |  JOIN best ON best.vec_id = cand.vec_id
         |  JOIN lut ON lut.q_id = cand.q_id AND lut.pcell = cand.pcell
         |    AND lut.b = best.b AND lut.cid = best.cid
         |),
         |adc AS (SELECT q_id, vec_id, $adcSum AS ad2 FROM adc0 GROUP BY q_id, vec_id),
         |r AS (
         |  SELECT q_id, vec_id, ad2,
         |    row_number() OVER (PARTITION BY q_id ORDER BY ad2, vec_id) AS rn
         |  FROM adc
         |)
         |SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, ad2
         |FROM r WHERE rn <= $PqSearchK
         |ORDER BY q_id, rn""".stripMargin
    },
    doc = s"trained residual IVF-PQ (IVFADC) served from the persisted index: " +
      s"$LloydIters-iter Lloyd cells + $CbIters-iter residual codebook, oracle-replayed") {
    (s, d) =>
      import graft.operators.IndexStore
      val dir = IndexStore.dirFor(d, "ivfadc")
      val stamp = IndexStore.sourceStamp(s"$d/embeddings.parquet")
      if (!IndexStore.isFresh(s, dir, stamp)) {
        val n = embeddings(s, d).count()
        val all = vecs(s, d)
        IndexStore.invalidate(dir)
        // train + publish the coarse quantizer FIRST; everything after
        // reads it back, so the stored artifact is provably what the
        // codes were encoded against
        IndexStore.write(
          lloydCentroids(all, IvfCells, LloydIters), dir, "icentroids", Nil)
        val icents = IndexStore
          .read(s, dir, "icentroids", "cid LONG, cv ARRAY<DOUBLE>, cnrm DOUBLE")
        // residual per vector against its OWN (stored, trained) cell
        // centroid — one exact IEEE subtraction per element
        val resid = assignCells(all, icents)
          .join(broadcast(icents.select(col("cid").as("cell"), col("cv"))), "cell")
          .select(col("vec_id"), col("cell"),
            zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
        val rblocked = pqBlockify(resid, "vec_id").withColumnRenamed("s", "x")
        // train + publish the residual codebook, then encode against the
        // STORED copy
        IndexStore.write(lloydCodebook(rblocked, CbIters), dir, "codebook", Nil)
        val rcents = IndexStore
          .read(s, dir, "codebook", "cid LONG, b INT, c ARRAY<DOUBLE>")
        IndexStore.write(
          pqWiden(pqBest(rblocked, rcents))
            .join(resid.select(col("vec_id"), col("cell")), "vec_id")
            .repartition(col("cell")),
          dir, "codes", Seq("cell"))
        IndexStore.writeMeta(s, dir, n, stamp)
      }
      ivfAdcServe(s, d, dir)
  }

  /** Serve the persisted trained-IVFADC index at `dir`: live query
    * vectors probe the STORED trained centroids, the per-(query, cell)
    * residual LUT is computed against the STORED codebook, candidates
    * come from the cell-bucketed code table — only probed cells' files
    * read, never corpus floats — all through the same [[residualServe]]
    * the inline residual gate uses. */
  private def ivfAdcServe(
      s: org.apache.spark.sql.SparkSession, d: String, dir: String): DataFrame = {
    import graft.operators.IndexStore
    val wide = IndexStore.read(s, dir, "codes", IvfPqCodeDdl)
    val rcents = IndexStore.read(s, dir, "codebook", "cid LONG, b INT, c ARRAY<DOUBLE>")
    val icents = IndexStore
      .read(s, dir, "icentroids", "cid LONG, cv ARRAY<DOUBLE>, cnrm DOUBLE")
    residualServe(vecs(s, d).filter(col("vec_id") < NumQueries), icents, rcents, wide)
  }

  val SemClusters = 8
  val SemThreshold = NdThreshold // 0.35 — same "near-dup" bar as the LSH path

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    * cluster the embedding space coarsely, then search for near-duplicate
    * pairs ONLY within each cluster and drop the higher-id member of every
    * duplicate pair. Output is the per-cluster dedup report: member count,
    * duplicate-pair count, and how many documents the policy removes.
    *
    * Scale design: this is the third pair-pruning geometry next to the
    * hyperplane-LSH ([[nearDupLsh]]) and IVF cells ([[qAnnIvf]]) — the
    * cluster id acts as the blocking key, so the pair search is a keyed
    * equi-join on `cell`, never a cross product. At 100 TB you pick
    * k ≈ corpus/⟨target cluster size⟩ so per-cell pair cost stays bounded,
    * and train the centroids with [[trainedCentroids]] (spark.ml KMeans);
    * the oracle-checked query keeps the deterministic first-K convention
    * (same as q_ann_ivf) so DuckDB can replay assignment bit-for-bit.
    * Assignment itself is a broadcast of k tiny centroids against the
    * corpus — no shuffle proportional to the data. */
  val qSemDedup: Q = Q.sql(
    "q_semdedup",
    s"""WITH vecs AS ($vecsSqlNested),
       |cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM vecs WHERE vec_id < $SemClusters),
       |assign AS (
       |  SELECT vec_id, v, nrm, cid AS cell FROM (
       |    SELECT q.vec_id, q.v, q.nrm, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY (${dotSql("q", "c").replace("c.v[", "c.cv[")}) / (q.nrm * c.cnrm) DESC, c.cid)
       |        AS crank
       |    FROM vecs q JOIN cents c ON true) t
       |  WHERE crank = 1),
       |pairs AS (
       |  SELECT q.cell, q.vec_id AS id1, c.vec_id AS id2
       |  FROM assign q JOIN assign c ON c.cell = q.cell AND q.vec_id < c.vec_id
       |  WHERE (${dotSql("q", "c")}) / (q.nrm * c.nrm) >= $SemThreshold),
       |m AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_members FROM assign GROUP BY cell),
       |p AS (
       |  SELECT cell, CAST(count(*) AS BIGINT) AS n_dup_pairs,
       |    CAST(count(DISTINCT id2) AS BIGINT) AS n_removed
       |  FROM pairs GROUP BY cell)
       |SELECT m.cell, m.n_members,
       |  coalesce(p.n_dup_pairs, 0) AS n_dup_pairs,
       |  coalesce(p.n_removed, 0) AS n_removed
       |FROM m LEFT JOIN p ON p.cell = m.cell
       |ORDER BY m.cell""".stripMargin,
    doc = s"SemDeDup: $SemClusters-cell blocking, within-cell cos>=$SemThreshold dedup report") {
    (s, d) =>
      val all = vecs(s, d)
      val cents = all
        .filter(col("vec_id") < SemClusters)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      val assign = semAssign(all, cents)
      val pairs = semDedupPairs(assign, SemThreshold)
      val members = assign.groupBy(col("cell")).agg(count(lit(1)).cast("long").as("n_members"))
      val pairAgg = pairs.groupBy(col("cell")).agg(
        count(lit(1)).cast("long").as("n_dup_pairs"),
        countDistinct(col("id2")).cast("long").as("n_removed"))
      members
        .join(pairAgg, Seq("cell"), "left")
        .select(
          col("cell"), col("n_members"),
          coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"))
        .orderBy("cell")
  }

  /** Cluster assignment for SemDeDup: argmax cosine against a broadcast
    * centroid frame (cid, cv, cnrm), ties to the lower cid — the shared
    * in-row argmin ([[assignCells]]). Returns (vec_id, v, nrm, cell). */
  def semAssign(vecsDf: DataFrame, cents: DataFrame): DataFrame =
    assignCells(vecsDf, cents)

  /** Within-cell near-dup pairs over a [[semAssign]] output — the keyed
    * equi-join on `cell` that replaces the all-pairs cross product.
    * Returns (cell, id1, id2), id1 < id2, exact cosine ≥ threshold. */
  def semDedupPairs(assign: DataFrame, threshold: Double): DataFrame =
    assign.as("q")
      .join(assign.as("c"),
        col("q.cell") === col("c.cell") && col("q.vec_id") < col("c.vec_id"))
      .filter(cosCol >= threshold)
      .select(col("q.cell").as("cell"), col("q.vec_id").as("id1"), col("c.vec_id").as("id2"))

  val RpOutDim = 16

  /** Deterministic ±1 signs for the random projection, seeded like the
    * LSH planes ("rp:j:d"). */
  def rpSigns: Array[Array[Double]] = ndSigns(RpOutDim, 1, tag = "rp")

  /** Johnson-Lindenstrauss random projection (Achlioptas 2003 ±1 variant,
    * public): project 64-dim embeddings to [[RpOutDim]] dims with a
    * deterministic ±1 matrix scaled by 1/√k — the dimensionality-reduction
    * step a 100 TB embedding corpus runs before LSH/clustering when the
    * full dimension is too wide (4× narrower vectors here, norms preserved
    * in expectation; the output reports the per-vector norm ratio so the
    * distortion is inspectable).
    *
    * Scale design: narrow per-row map — k dot products against broadcast
    * sign literals, zero shuffles (the ORDER BY is gate determinism only).
    * Float parity: each projection is the same index-ordered accumulation
    * on both sides ([[graft.expressions.VectorOps.dot]] ↔ left-associated
    * SQL term chain) — identical per-row IEEE trees, so dims and ratio
    * are RAW doubles (NOTES Lesson 12: round() only where accumulation
    * order varies). */
  val qRandomProjection: Q = Q.sql(
    "q_random_projection", {
      val signs = rpSigns
      def projSql(j: Int): String =
        "(" + (0 until Dim).map(i => s"v[${i + 1}] * ${signs(j)(i)}").mkString(" + ") + ") / 4.0"
      val pNorm = "sqrt(" + (0 until RpOutDim).map(j => s"p$j * p$j").mkString(" + ") + ")"
      s"""WITH vecs AS ($vecsSqlNested),
         |p AS (
         |  SELECT vec_id, nrm,
         |${(0 until RpOutDim).map(j => s"    ${projSql(j)} AS p$j").mkString(",\n")}
         |  FROM vecs)
         |SELECT vec_id,
         |${(0 until RpOutDim).map(j => s"  p$j").mkString(",\n")},
         |  $pNorm / nrm AS norm_ratio
         |FROM p
         |ORDER BY vec_id""".stripMargin
    },
    doc = s"JL ±1 random projection $Dim→$RpOutDim: rounded dims + norm-preservation ratio") {
    (s, d) =>
      val signs = rpSigns
      val projs = (0 until RpOutDim).map { j =>
        (graft.expressions.VectorOps.dot(col("v"), typedLit(signs(j).toSeq)) / lit(4.0))
          .as(s"p$j")
      }
      val pNorm = sqrt((0 until RpOutDim).map(j => col(s"p$j") * col(s"p$j")).reduce(_ + _))
      vecs(s, d)
        .transform(graft.Tables.spread(s, _))
        .select(col("vec_id") +: col("nrm") +: projs: _*)
        .select(
          col("vec_id") +:
            (0 until RpOutDim).map(j => col(s"p$j")) :+
            (pNorm / col("nrm")).as("norm_ratio"): _*)
        .orderBy("vec_id")
  }


  // ---- oracle-replayed KMeans -----------------------------------------

  val KmK = 8
  /** Fixed-point quantum for centroid means and inertia: coordinates are
    * quantized to 1e-6 before the per-cluster sums, so every mean is an
    * exact-integer sum divided once — order-independent, hence
    * bit-identical across engines and across partitionings (the same
    * design as the bigram-LM's NllQuantum). */
  val KmQuantum = 1e6

  /** Two Lloyd iterations of KMeans over the embeddings, FULLY replayed
    * by the DuckDB oracle — the gate trained-IVF cannot have (spark.ml
    * KMeans is not replayable; this operator's explicitly-unrolled
    * iterations are). Init = the first [[KmK]] vectors (deterministic);
    * assignment = argmin squared L2 (computed as |q|² − 2q·c + |c|²,
    * identical expression both engines), id tiebreak; update = fixed-
    * point exact means ([[KmQuantum]]).
    *
    * Scale shape per iteration: centroids broadcast (K rows); assignment
    * is a narrow map + ONE codegen hash aggregate with map-side combine
    * (`min(struct(dist, cid, …))` — argmin without a window, no per-key
    * sort, no row explosion); the update is 64 integer sum aggregates in
    * one pass (no posexplode shuffle). Nothing buffers a cluster.
    *
    * Output: per surviving cluster — member count, exact-quantized
    * inertia, and the first 4 final-mean coordinates. */
  val qKmeans: Q = {
    def dotCvSql(q: String, c: String) =
      (0 until Dim).map(i => s"$q.v[${i + 1}] * $c.cv[${i + 1}]").mkString(" + ")
    def cnrmSql(arr: String) =
      "sqrt(" + (0 until Dim).map(i => s"$arr[${i + 1}] * $arr[${i + 1}]").mkString(" + ") + ")"
    val qsum = (0 until Dim)
      .map(i => s"CAST(sum(CAST(round(v[${i + 1}] * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS s$i")
      .mkString(",\n    ")
    val meansArr = (0 until Dim)
      .map(i => s"CAST(s$i AS DOUBLE) / 1000000.0 / n")
      .mkString("[", ", ", "]")
    def roundSql(t: String) =
      s"""  SELECT q.vec_id, q.v, q.nrm, c.cid,
         |    q.nrm * q.nrm - 2 * (${dotCvSql("q", "c")}) + c.cnrm * c.cnrm AS dist,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY q.nrm * q.nrm - 2 * (${dotCvSql("q", "c")}) + c.cnrm * c.cnrm, c.cid)
         |      AS rk
         |  FROM vecs q JOIN $t c ON true""".stripMargin
    Q.sql(
      "q_kmeans",
      s"""WITH vecs AS ($vecsSqlNested),
         |c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM vecs WHERE vec_id < $KmK),
         |sc1 AS (
         |${roundSql("c0")}
         |), a1 AS (SELECT vec_id, v, cid AS cell, dist FROM sc1 WHERE rk = 1),
         |m1 AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS n,
         |    $qsum
         |  FROM a1 GROUP BY cell
         |), c1 AS (
         |  SELECT cell AS cid, cv, ${cnrmSql("cv")} AS cnrm
         |  FROM (SELECT cell, $meansArr AS cv FROM m1) _m
         |), sc2 AS (
         |${roundSql("c1")}
         |), a2 AS (SELECT vec_id, v, cid AS cell, dist FROM sc2 WHERE rk = 1),
         |m2 AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(round(dist * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS qi,
         |    $qsum
         |  FROM a2 GROUP BY cell
         |)
         |SELECT cell AS cluster, n AS n_vecs,
         |  round(CAST(qi AS DOUBLE) / 1000000.0, 6) AS inertia,
         |  round(CAST(s0 AS DOUBLE) / 1000000.0 / n, 6) AS c0,
         |  round(CAST(s1 AS DOUBLE) / 1000000.0 / n, 6) AS c1,
         |  round(CAST(s2 AS DOUBLE) / 1000000.0 / n, 6) AS c2,
         |  round(CAST(s3 AS DOUBLE) / 1000000.0 / n, 6) AS c3
         |FROM m2
         |ORDER BY cluster""".stripMargin,
      doc = s"KMeans, 2 Lloyd iterations, $KmK cells: fixed-point exact means, oracle-replayed") {
      (s, d) =>
      val all = vecs(s, d)
      val init = all.filter(col("vec_id") < KmK)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      def assign(cents: DataFrame): DataFrame = {
        val dist = col("nrm") * col("nrm") -
          lit(2) * graft.expressions.VectorOps.dot(col("v"), col("cv")) +
          col("cnrm") * col("cnrm")
        all
          .crossJoin(broadcast(cents))
          .select(col("vec_id"), col("v"), col("nrm"), col("cid"), dist.as("dist"))
          .groupBy(col("vec_id"))
          // argmin via struct-min: lexicographic (dist, cid) — cid is
          // unique per group row, so v/nrm ride along untouched; one
          // codegen hash aggregate, no window, no re-join
          .agg(min(struct(col("dist"), col("cid"), col("v"), col("nrm"))).as("m"))
          .select(
            col("vec_id"), col("m.v").as("v"), col("m.nrm").as("nrm"),
            col("m.cid").as("cell"), col("m.dist").as("dist"))
      }
      def qcol(c: Column): Column = round(c * KmQuantum, 0).cast("long")
      def moments(assigned: DataFrame, extra: Seq[Column]): DataFrame = {
        val sums = (0 until Dim).map(i => sum(qcol(element_at(col("v"), i + 1))).as(s"s$i"))
        assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"), extra ++ sums: _*)
      }
      def centsOf(m: DataFrame): DataFrame = m
        .select(col("cell").as("cid"),
          array((0 until Dim).map(i => col(s"s$i").cast("double") / KmQuantum / col("n")): _*)
            .as("cv"))
        .withColumn("cnrm", graft.expressions.VectorOps.l2norm(col("cv")))
      val a1 = assign(init)
      val c1 = centsOf(moments(a1, Nil))
      val a2 = assign(c1)
      val m2 = moments(a2, Seq(sum(qcol(col("dist"))).as("qi")))
      m2.select(
        col("cell").as("cluster"), col("n").as("n_vecs"),
        round(col("qi").cast("double") / KmQuantum, 6).as("inertia"),
        round(col("s0").cast("double") / KmQuantum / col("n"), 6).as("c0"),
        round(col("s1").cast("double") / KmQuantum / col("n"), 6).as("c1"),
        round(col("s2").cast("double") / KmQuantum / col("n"), 6).as("c2"),
        round(col("s3").cast("double") / KmQuantum / col("n"), 6).as("c3"))
        .orderBy("cluster")
    }
  }

  // ---- MMR diverse selection -------------------------------------------

  /** MMR selection size and candidate-pool bound. */
  val MmrK = 10
  val MmrCand = 64
  val MmrLambda = 0.5

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998):
    * greedily pick [[MmrK]] items maximizing
    * λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s) — the diversity-aware
    * curation step after retrieval (dedup keeps one copy of equals; MMR
    * additionally spreads the SURVIVORS apart in embedding space).
    *
    * Scale split: relevance (cosine to the query vector) and the
    * candidate×candidate cosine matrix are computed DISTRIBUTED with the
    * codegen dot kernel over a candidate pool that is bounded by design
    * ([[MmrCand]] — in a real pipeline the pool is the distributed
    * top-N retrieval result, here the deterministic prefix vec_id ≤ 64).
    * Only the bounded N + N·(N−1) score rows ever reach the driver; the
    * greedy argmax loop is O(K·N) over them — MMR is inherently
    * sequential (pick i+1 depends on picks 1..i), so the driver loop IS
    * the algorithm, not a shortcut. The oracle replays the same greedy
    * as a DuckDB recursive CTE over the identical score matrix; both
    * engines' doubles are bit-identical (same-order dot sums, exact 0.5
    * multiplier), so ties and ranks agree by construction. */
  val qMmrSelect: Q = Q.sql(
    "q_mmr_select",
    s"""WITH RECURSIVE vecs AS ($vecsSqlNested),
       |qv AS (SELECT v, nrm FROM vecs WHERE vec_id = 0),
       |cand AS (SELECT vec_id, v, nrm FROM vecs WHERE vec_id >= 1 AND vec_id <= $MmrCand),
       |rel AS (
       |  SELECT c.vec_id, (${dotSql("c", "q")}) / (c.nrm * q.nrm) AS rel
       |  FROM cand c CROSS JOIN qv q
       |),
       |pairs AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    (${dotSql("a", "b")}) / (a.nrm * b.nrm) AS cos
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
       |),
       |sel(step, picked, score, ids) AS (
       |  (SELECT 1, vec_id, rel, [vec_id] FROM rel ORDER BY rel DESC, vec_id LIMIT 1)
       |  UNION ALL
       |  (SELECT s.step + 1, nxt.id, nxt.sc, list_append(s.ids, nxt.id)
       |  FROM sel s, LATERAL (
       |    SELECT c.vec_id AS id,
       |      $MmrLambda * c.rel - ${1 - MmrLambda} * (SELECT max(p.cos) FROM pairs p
       |        WHERE p.ia = c.vec_id AND list_contains(s.ids, p.ib)) AS sc
       |    FROM rel c WHERE NOT list_contains(s.ids, c.vec_id)
       |    ORDER BY sc DESC, c.vec_id LIMIT 1) nxt
       |  WHERE s.step < $MmrK)
       |)
       |SELECT CAST(step AS BIGINT) AS step, CAST(picked AS BIGINT) AS vec_id,
       |  round(score, 9) AS score
       |FROM sel ORDER BY step""".stripMargin,
    doc = s"MMR diverse top-$MmrK (distributed scoring, bounded-pool greedy; recursive-CTE oracle)") {
    (s, d) =>
      val all = vecs(s, d)
      val qv = all.filter(col("vec_id") === 0).select(col("v"), col("nrm")).as("q")
      val cand = all.filter(col("vec_id") >= 1 && col("vec_id") <= MmrCand)
      val rel = cand.as("c")
        .crossJoin(broadcast(qv))
        .select(col("c.vec_id"), (dotCol("c", "q") / (col("c.nrm") * col("q.nrm"))).as("rel"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
      val cos = cand.as("a")
        .join(broadcast(cand.as("b")), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
          (dotCol("a", "b") / (col("a.nrm") * col("b.nrm"))).as("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // greedy argmax, same arithmetic + (score DESC, id ASC) tiebreak as
      // the oracle's recursive CTE
      val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val chosen = scala.collection.mutable.LinkedHashSet.empty[Long]
      while (picked.length < MmrK) {
        val best = rel.iterator
          .filterNot { case (id, _) => chosen(id) }
          .map { case (id, r) =>
            val sc =
              if (chosen.isEmpty) r
              else MmrLambda * r - (1 - MmrLambda) * chosen.iterator.map(sid => cos(id -> sid)).max
            (id, sc)
          }
          .reduceLeft((x, y) => if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x)
        picked += ((picked.length + 1L, best._1, best._2))
        chosen += best._1
      }
      import s.implicits._
      picked.toSeq.toDF("step", "vec_id", "score")
        .select(col("step"), col("vec_id"), round(col("score"), 9).as("score"))
        .orderBy("step")
  }

  /** Candidate pool per query for [[qAnnRefine]]'s exact-rerank phase. */
  val RefineC = 32

  /** Two-phase quantized scan + exact rerank — the standard production
    * ANN serving shape (coarse pass over compressed vectors, exact pass
    * over a small candidate pool; e.g. ScaNN, Guo 2020): phase 1 scores
    * every vector against each query with the INT8 scalar-quantized dot
    * product ([[qEmbedQuantize]]'s encoding — 4× less memory traffic,
    * SIMD-friendly integer math at scale) and keeps the top
    * [[RefineC]] candidates; phase 2 reranks only those with the exact
    * float cosine and keeps the top [[TopK]].
    *
    * Determinism: quantized codes are integral doubles (|Σ terms| ≤
    * 64·127² ≪ 2⁵³), so the coarse scores are exact on both engines in
    * any summation order; the refine cosine reuses the bit-identical
    * position-ordered dot. Both rank edges tie-break on vec_id.
    *
    * Scale design: the corpus-sized work is ONE narrow scan of the
    * quantized codes with the 16-row query side broadcast; the rank is a
    * per-query top-C (WindowGroupLimit pushes the limit before the full
    * sort); the exact phase touches |queries|·C rows — invariant to
    * corpus growth. */
  val qAnnRefine: Q = {
    val qdSql =
      "list_transform(v, x -> round(x * (127.0 / list_max(list_transform(v, y -> abs(y))))))"
    def qdotSql(a: String, b: String) =
      (0 until Dim).map(i => s"$a.qd[${i + 1}] * $b.qd[${i + 1}]").mkString(" + ")
    Q.sql(
      "q_ann_refine",
      s"""WITH vecs AS ($vecsSqlNested),
         |qz AS (SELECT vec_id, v, nrm, $qdSql AS qd FROM vecs),
         |cand AS (
         |  SELECT q_id, n_id, ascore, rn_c FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |      CAST(${qdotSql("q", "c")} AS BIGINT) AS ascore,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${qdotSql("q", "c")} DESC, c.vec_id) AS rn_c
         |    FROM qz q JOIN qz c ON c.vec_id <> q.vec_id
         |    WHERE q.vec_id < $NumQueries) t
         |  WHERE rn_c <= $RefineC)
         |SELECT q_id, n_id, rn, ascore, cos FROM (
         |  SELECT cand.q_id, cand.n_id, cand.ascore,
         |    $cosSql AS cos,
         |    CAST(row_number() OVER (PARTITION BY cand.q_id
         |      ORDER BY $cosSql DESC, cand.n_id) AS BIGINT) AS rn
         |  FROM cand
         |  JOIN vecs q ON q.vec_id = cand.q_id
         |  JOIN vecs c ON c.vec_id = cand.n_id) r
         |WHERE rn <= $TopK
         |ORDER BY q_id, rn""".stripMargin,
      doc = s"two-phase ANN: int8-quantized coarse top-$RefineC, exact cosine rerank top-$TopK") {
      (s, d) =>
        // quantized + float vectors in one frame; 4 consumers (both coarse
        // sides, both refine sides) → scratch-cache and materialize first
        // (NOTES lesson 11b)
        val absmax = aggregate(transform(col("v"), y => abs(y)), lit(0.0), (a, y) => greatest(a, y))
        val qz = graft.ScratchCache.tracked(
          vecs(s, d)
            .withColumn("am", absmax)
            .withColumn("qd", transform(col("v"), x => round(x * (lit(127.0) / col("am")))))
            .drop("am"))
        qz.count()
        val wc = Window.partitionBy(col("q_id")).orderBy(col("ascore").desc, col("n_id"))
        val cand = broadcast(qz.filter(col("vec_id") < NumQueries).as("q"))
          .join(qz.as("c"), col("c.vec_id") =!= col("q.vec_id"))
          .select(
            col("q.vec_id").as("q_id"), col("c.vec_id").as("n_id"),
            graft.expressions.VectorOps.dot(col("q.qd"), col("c.qd")).as("ascore"))
          .withColumn("rn_c", row_number().over(wc))
          .filter(col("rn_c") <= RefineC)
          .select(col("q_id"), col("n_id"), col("ascore").cast("long").as("ascore"))
        val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
        cand
          .join(broadcast(qz.as("q")), col("q.vec_id") === col("q_id"))
          .join(qz.as("c"), col("c.vec_id") === col("n_id"))
          .select(col("q_id"), col("n_id"), col("ascore"), cosCol.as("cos"))
          .withColumn("rn", row_number().over(wr).cast("long"))
          .filter(col("rn") <= TopK)
          .select("q_id", "n_id", "rn", "ascore", "cos")
          .orderBy("q_id", "rn")
    }
  }

  /** RRF parameters: query count, the standard k=60 damping, list
    * truncation depth, and the output top-k. */
  val RrfQ = 4
  val RrfDepth = 100
  val RrfTopK = 10

  /** Reciprocal-rank fusion of a LEXICAL and a SEMANTIC ranking
    * (Cormack, Clarke & Buettcher 2009) — the standard hybrid-retrieval
    * combiner: for each query document, rank candidates by shared word
    * 3-grams (inverted index) and by embedding cosine (brute force over
    * the embedded corpus), truncate both lists at [[RrfDepth]], and fuse
    * with Σ 1/(60 + rank). Candidates are documents that HAVE an
    * embedding (ids align with `vec_id`; at sf0.1 only a prefix of the
    * corpus is embedded, which is exactly the real-world shape).
    *
    * Determinism: contributions are 1/(60+r) in 1e-12 fixed point
    * (BIGINT — the sum of two list contributions is exact, so the fused
    * order cannot hinge on a float ulp); both input ranks tie-break on
    * candidate id; cosine reuses the bit-identical position-ordered dot.
    *
    * Scale design: query grams and query vectors broadcast ([[RrfQ]]
    * rows of each); the lexical side is one inverted-index equi-join;
    * both rank windows carry a `rank <= depth` filter that plans as
    * WindowGroupLimit (per-partition top-D, no full per-query sort
    * materializes); the fusion full-outer join moves at most
    * queries × 2·depth rows. */
  val qRrfHybrid: Q = {
    import graft.text.TextFunctions
    Q.sql(
      "q_rrf_hybrid",
      s"""WITH g AS (SELECT doc_id, unnest(list_distinct(${TextFunctions.shinglesSql})) AS t FROM documents),
         |ids AS (SELECT vec_id FROM embeddings),
         |lex AS (
         |  SELECT q.doc_id AS q_id, c.doc_id AS c_id, count(*) AS shared
         |  FROM g q JOIN g c ON q.t = c.t AND c.doc_id <> q.doc_id
         |  JOIN ids ON ids.vec_id = c.doc_id
         |  WHERE q.doc_id < $RrfQ
         |  GROUP BY 1, 2),
         |lr AS (SELECT q_id, c_id, rl FROM (
         |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id ORDER BY shared DESC, c_id) AS rl FROM lex) _l
         |  WHERE rl <= $RrfDepth),
         |vecs AS ($vecsSqlNested),
         |sem AS (SELECT q_id, c_id, rs FROM (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY ($cosSql) DESC, c.vec_id) AS rs
         |  FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $RrfQ) _s WHERE rs <= $RrfDepth),
         |fuse AS (
         |  SELECT coalesce(lr.q_id, sem.q_id) AS q_id, coalesce(lr.c_id, sem.c_id) AS c_id,
         |    coalesce(CAST(round(1000000000000 / (60.0 + lr.rl)) AS BIGINT), 0)
         |      + coalesce(CAST(round(1000000000000 / (60.0 + sem.rs)) AS BIGINT), 0) AS score,
         |    lr.rl AS rl, sem.rs AS rs
         |  FROM lr FULL OUTER JOIN sem ON lr.q_id = sem.q_id AND lr.c_id = sem.c_id)
         |SELECT q_id, c_id, rn, score, CAST(rl AS BIGINT) AS lex_rank, CAST(rs AS BIGINT) AS sem_rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS BIGINT) AS rn FROM fuse) _f
         |WHERE rn <= $RrfTopK ORDER BY q_id, rn""".stripMargin,
      doc = s"hybrid retrieval: RRF of 3-gram and cosine rankings, depth $RrfDepth, top $RrfTopK") {
      (s, d) =>
        // tokens staged before the shingle lambda (the inline form
        // re-splits per element — the 15.7 s cold pass in the r14
        // baseline battery)
        val g = documents(s, d)
          .transform(graft.Tables.spread(s, _))
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
          .select(col("doc_id"),
            explode(array_distinct(TextFunctions.shinglesOf(col("w")))).as("t"))
        val qg = g.filter(col("doc_id") < RrfQ).select(col("doc_id").as("q_id"), col("t"))
        val ids = embeddings(s, d).select(col("vec_id").as("c_id"))
        val wl = Window.partitionBy(col("q_id")).orderBy(col("shared").desc, col("c_id"))
        val lr = broadcast(qg)
          .join(g.select(col("doc_id").as("c_id"), col("t")), "t")
          .filter(col("c_id") =!= col("q_id"))
          .join(broadcast(ids), "c_id")
          .groupBy(col("q_id"), col("c_id"))
          .agg(count(lit(1)).as("shared"))
          .withColumn("rl", row_number().over(wl))
          .filter(col("rl") <= RrfDepth)
          .select("q_id", "c_id", "rl")
        val v = vecs(s, d)
        val ws = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
        val sem = broadcast(v.filter(col("vec_id") < RrfQ).as("q"))
          .join(v.as("c"), col("c.vec_id") =!= col("q.vec_id"))
          .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("c_id"), cosCol.as("cos"))
          .withColumn("rs", row_number().over(ws))
          .filter(col("rs") <= RrfDepth)
          .select("q_id", "c_id", "rs")
        val contrib = (r: Column) =>
          coalesce(round(lit(1000000000000L) / (lit(60.0) + r)).cast("long"), lit(0L))
        val wr = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
        lr.join(sem, Seq("q_id", "c_id"), "full_outer")
          .select(
            col("q_id"), col("c_id"),
            (contrib(col("rl")) + contrib(col("rs"))).as("score"),
            col("rl").cast("long").as("lex_rank"), col("rs").cast("long").as("sem_rank"))
          .withColumn("rn", row_number().over(wr).cast("long"))
          .filter(col("rn") <= RrfTopK)
          .select("q_id", "c_id", "rn", "score", "lex_rank", "sem_rank")
          .orderBy("q_id", "rn")
    }
  }

  /** Hard-negative mining for contrastive training (the in-batch-negatives
    * upgrade every embedding-model pipeline runs; cf. DPR, Karpukhin
    * 2020): for each anchor, the top-3 most similar vectors with a
    * DIFFERENT label (the hard negatives — near the anchor yet wrong)
    * plus its nearest same-label positive, i.e. ready-made (anchor,
    * positive, negative…) triplets. First use of the embeddings table's
    * `label` column.
    *
    * Scale design: anchors broadcast against one corpus scan; the
    * negative and positive rankings are two label-predicated windows
    * over the same scored frame (rank filters → WindowGroupLimit), and
    * the positive joins back on the anchor key — queries × 1 rows. */
  val qHardNegatives: Q = {
    val vecsLblSql =
      s"SELECT vec_id, label, v, $normSelfSql AS nrm FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) _i"
    Q.sql(
      "q_hard_negatives",
      s"""WITH vecs AS ($vecsLblSql),
         |scored AS (
         |  SELECT q.vec_id AS q_id, q.label AS q_label, c.vec_id AS c_id, c.label AS c_label,
         |    $cosSql AS cos
         |  FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $NumQueries),
         |neg AS (
         |  SELECT q_id, c_id, c_label, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
         |  FROM scored WHERE c_label <> q_label),
         |pos AS (
         |  SELECT q_id, c_id AS pos_id, cos AS pos_cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rp
         |  FROM scored WHERE c_label = q_label)
         |SELECT n.q_id, CAST(n.rn AS BIGINT) AS rn, n.c_id AS neg_id,
         |  CAST(n.c_label AS BIGINT) AS neg_label, n.cos AS neg_cos,
         |  p.pos_id, p.pos_cos
         |FROM neg n JOIN pos p ON p.q_id = n.q_id AND p.rp = 1
         |WHERE n.rn <= 3
         |ORDER BY n.q_id, n.rn""".stripMargin,
      doc = "hard-negative mining: top-3 cross-label neighbors + nearest positive per anchor") {
      (s, d) =>
        val v = graft.ScratchCache.tracked(
          embeddings(s, d)
            .select(col("vec_id"), col("label"),
              transform(col("embedding"), _.cast("double")).as("v"))
            .withColumn("nrm", normSelfCol))
        v.count() // two consumers of the scored frame's build side
        val scored = broadcast(v.filter(col("vec_id") < NumQueries).as("q"))
          .join(v.as("c"), col("c.vec_id") =!= col("q.vec_id"))
          .select(
            col("q.vec_id").as("q_id"), col("q.label").as("q_label"),
            col("c.vec_id").as("c_id"), col("c.label").as("c_label"), cosCol.as("cos"))
        val wn = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
        val neg = scored.filter(col("c_label") =!= col("q_label"))
          .withColumn("rn", row_number().over(wn))
          .filter(col("rn") <= 3)
        val pos = scored.filter(col("c_label") === col("q_label"))
          .withColumn("rp", row_number().over(wn))
          .filter(col("rp") === 1)
          .select(col("q_id"), col("c_id").as("pos_id"), col("cos").as("pos_cos"))
        neg
          .join(broadcast(pos), "q_id")
          .select(
            col("q_id"), col("rn").cast("long").as("rn"), col("c_id").as("neg_id"),
            col("c_label").cast("long").as("neg_label"), col("cos").as("neg_cos"),
            col("pos_id"), col("pos_cos"))
          .orderBy("q_id", "rn")
    }
  }

  // ---- distributed Gram / second-moment matrix -------------------------

  /** Shared builder: the 64×64 second-moment (uncentered Gram) matrix
    * X^T X of the corpus at fixed-point quantization 10^`q`, folded by
    * [[graft.expressions.GramFold]] — ONE imperative aggregate holding a
    * flat 128-bit accumulator per task (upper triangle, mirrored at
    * eval), zero per-row allocation, one serialized buffer per partition
    * on the shuffle. Value-identical to a DECIMAL(38,0) sum of the
    * per-row outer products (the previous declarative form — nested
    * `transform` → `posexplode` → 4096-key groupBy — allocated three
    * 4096-slot boxed arrays PER ROW, the round-9 in-battery GC-growth
    * culprit). The single result row explodes into the (i, j, sq) cell
    * frame every consumer reads. */
  private def gramFrame(s: org.apache.spark.sql.SparkSession, d: String, q: Int): DataFrame = {
    val scale = math.pow(10, q)
    embeddings(s, d)
      .transform(graft.Tables.spread(s, _))
      .select(transform(col("embedding"),
        x => round(x.cast("double") * scale).cast("long")).as("qa"))
      .agg(graft.expressions.GramFold.gramFold(col("qa"), Dim).as("g"))
      .select(posexplode(col("g")).as(Seq("pos", "sq")))
      .select((col("pos") / Dim).cast("long").as("i"),
        pmod(col("pos"), lit(Dim)).cast("long").as("j"), col("sq"))
  }

  /** Shared DuckDB twin of [[gramFrame]] (self-join form — different
    * plan, identical exact-integer values). */
  private def gramSql(q: Int): String =
    s"""e AS (
       |  SELECT vec_id, CAST(t.i AS BIGINT) AS i,
       |    CAST(round(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE) * ${"1" + "0" * q}) AS BIGINT) AS xq
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, $Dim)) AS i) t),
       |g AS (
       |  SELECT a.i AS i, b.i AS j,
       |    CAST(sum(CAST(a.xq AS DECIMAL(18,0)) * CAST(b.xq AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sq
       |  FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2)""".stripMargin

  /** The corpus second-moment matrix E[x_i·x_j] — the input to PCA
    * whitening, covariance shrinkage, and embedding-drift monitoring.
    * At 100 TB this is THE distributed-linear-algebra primitive: the
    * only fact-scale work is one narrow projection + one aggregation
    * into 4096 cells (map-side combined), and everything downstream
    * (eigen-decomposition, whitening transform) runs on the 64×64
    * result.
    *
    * Determinism: inputs quantize to 1e-6 fixed point (the
    * [[qEmbedQuantize]] round() convention), products stay exact longs
    * (≤ 2.8e11), sums fold as DECIMAL(38,0); the final normalization is
    * a fixed double expression over exact values. */
  val qGramMatrix: Q = Q.sql(
    "q_gram_matrix",
    s"""WITH ${gramSql(6)},
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
       |SELECT g.i, g.j, n.n, CAST(g.sq AS DOUBLE) / n.n / 1000000000000.0 AS gram
       |FROM g CROSS JOIN n ORDER BY i, j""".stripMargin,
    doc = "distributed 64x64 second-moment matrix of embeddings (exact fixed-point fold)") {
    (s, d) =>
      val n = embeddings(s, d).agg(count(lit(1)).cast("long").as("n"))
      gramFrame(s, d, 6)
        .crossJoin(broadcast(n))
        // n = 0 only on an EMPTY corpus: the fold then emits 4096 zero
        // cells where the old groupBy emitted none — drop them so the
        // degenerate shape (0 rows, no ANSI divide-by-zero) is preserved
        .where(col("n") > 0)
        .select(col("i"), col("j"), col("n"),
          (col("sq").cast("double") / col("n") / 1e12).as("gram"))
        .orderBy("i", "j")
  }

  /** Effective rank (participation ratio) of the embedding space:
    * PR = trace(G)² / ||G||_F² — how many dimensions the corpus
    * actually uses (64 = isotropic, →1 = collapsed to a line). The
    * standard representation-collapse diagnostic for an embedding
    * pipeline, computed from the same one-pass Gram fold.
    *
    * Quantization is 1e-3 here (coarser than [[qGramMatrix]]) so the
    * entry SQUARES stay inside DECIMAL(38,0) in BOTH engines — DuckDB
    * rejects a multiply whose operand precisions sum past 38, and a
    * double-space Frobenius sum would reintroduce partial-order ulps.
    * Entries ≤ 1e12 even at 1000× the bench corpus, squares ≤ 1e24,
    * and the final ratio is one double division of exact images. */
  val qEffectiveRank: Q = Q.sql(
    "q_effective_rank",
    s"""WITH ${gramSql(3)},
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN i = j THEN sq ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS tr,
       |    CAST(sum(CAST(sq AS DECIMAL(19,0)) * CAST(sq AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS fro2
       |  FROM g)
       |SELECT CAST($Dim AS BIGINT) AS dims, n.n,
       |  CAST(a.tr AS DOUBLE) / n.n / 1000000.0 AS trace_moment,
       |  CAST(a.tr AS DOUBLE) * CAST(a.tr AS DOUBLE) / CAST(a.fro2 AS DOUBLE) AS effective_rank
       |FROM a CROSS JOIN n""".stripMargin,
    doc = "embedding effective rank (participation ratio trace^2/frobenius^2, one Gram fold)") {
    (s, d) =>
      val n = embeddings(s, d).agg(count(lit(1)).cast("long").as("n"))
      val sqd = col("sq").cast("decimal(19,0)")
      gramFrame(s, d, 3)
        .agg(
          sum(when(col("i") === col("j"), col("sq"))
            .otherwise(lit(0).cast("decimal(38,0)"))).cast("decimal(38,0)").as("tr"),
          sum(sqd * sqd).cast("decimal(38,0)").as("fro2"))
        .crossJoin(broadcast(n))
        // empty-corpus degradation: the fold yields all-zero sums, so the
        // ratios guard to NULL instead of raising ANSI divide-by-zero
        .select(lit(Dim.toLong).as("dims"), col("n"),
          when(col("n") > 0, col("tr").cast("double") / col("n") / 1e6)
            .as("trace_moment"),
          when(col("fro2") =!= 0, col("tr").cast("double") * col("tr").cast("double") /
            col("fro2").cast("double")).as("effective_rank"))
  }

  /** Per-source embedding centroids and their pairwise cosine — the
    * corpus-composition drift monitor: two sources whose centroids sit at
    * cosine ≈ 1 are stylistically interchangeable; a source drifting away
    * from the rest flags a scraper change or contamination. Cosine of
    * centroids needs no division by n (the 1/n scale cancels), so the
    * whole computation runs on per-source integer component SUMS.
    *
    * Scale design: the only fact-scale work is one narrow projection +
    * one (source, dim) hash aggregate — 64× row fan-out collapsed by
    * map-side combine to sources×64 partials per task; everything
    * downstream (norms, the source-pair join) touches ≤ sources² rows.
    * Determinism: components quantize to 1e-6 fixed point, per-dim sums
    * are exact BIGINT, cross/self products fold in DECIMAL(38,0) (sums
    * can pass 2^63 at corpus scale), and the final ratio is one pinned
    * double expression; round(6) absorbs the sqrt/cast last ulp. */
  val qSourceCentroids: Q = Q.sql(
    "q_source_centroids",
    s"""WITH e AS (
       |  SELECT d.source, CAST(t.i AS BIGINT) AS i,
       |    CAST(round(CAST(embedding[CAST(t.i AS INT) + 1] AS DOUBLE) * 1000000) AS BIGINT) AS xq
       |  FROM embeddings v JOIN documents d ON d.doc_id = v.vec_id
       |  CROSS JOIN (SELECT unnest(range(0, $Dim)) AS i) t),
       |s AS (SELECT source, i, CAST(sum(xq) AS BIGINT) AS sq FROM e GROUP BY 1, 2),
       |n AS (
       |  SELECT d.source, CAST(count(*) AS BIGINT) AS n
       |  FROM embeddings v JOIN documents d ON d.doc_id = v.vec_id GROUP BY 1),
       |nrm AS (
       |  SELECT source,
       |    CAST(sum(CAST(sq AS DECIMAL(19,0)) * CAST(sq AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS n2
       |  FROM s GROUP BY 1),
       |dots AS (
       |  SELECT a.source AS s1, b.source AS s2,
       |    CAST(sum(CAST(a.sq AS DECIMAL(19,0)) * CAST(b.sq AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS dp
       |  FROM s a JOIN s b ON a.i = b.i AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT dt.s1, dt.s2, na.n AS n1, nb.n AS n2,
       |  CASE WHEN x.n2 = 0 OR y.n2 = 0 THEN NULL
       |    ELSE round(CAST(dt.dp AS DOUBLE) /
       |      (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))), 6) END AS cos_centroid
       |FROM dots dt
       |JOIN nrm x ON x.source = dt.s1 JOIN nrm y ON y.source = dt.s2
       |JOIN n na ON na.source = dt.s1 JOIN n nb ON nb.source = dt.s2
       |ORDER BY s1, s2""".stripMargin,
    doc = "per-source embedding centroids: pairwise centroid cosine drift matrix") { (s, d) =>
    val withSource = embeddings(s, d)
      .transform(graft.Tables.spread(s, _))
      .join(
        documents(s, d).select(col("doc_id"), col("source")),
        col("doc_id") === col("vec_id"))
    val e = withSource.select(
      col("source"),
      posexplode(transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long"))).as(Seq("i", "xq")))
    val sums = e.groupBy("source", "i").agg(sum(col("xq")).cast("long").as("sq"))
    val n = withSource.groupBy("source").agg(count(lit(1)).as("n"))
    val sqd = col("sq").cast("decimal(19,0)")
    val nrm = sums.groupBy("source")
      .agg(sum(sqd * sqd).cast("decimal(38,0)").as("n2"))
    val dots = sums.as("a")
      .join(sums.as("b"), col("a.i") === col("b.i") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(sum(col("a.sq").cast("decimal(19,0)") * col("b.sq").cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("dp"))
    dots
      .join(broadcast(nrm.select(col("source").as("s1"), col("n2").as("x2"))), "s1")
      .join(broadcast(nrm.select(col("source").as("s2"), col("n2").as("y2"))), "s2")
      .join(broadcast(n.select(col("source").as("s1"), col("n").as("n1"))), "s1")
      .join(broadcast(n.select(col("source").as("s2"), col("n").as("n2"))), "s2")
      .select(col("s1"), col("s2"), col("n1"), col("n2"),
        when(col("x2") === 0 || col("y2") === 0, lit(null).cast("double"))
          .otherwise(round(col("dp").cast("double") /
            (sqrt(col("x2").cast("double")) * sqrt(col("y2").cast("double"))), 6))
          .as("cos_centroid"))
      .orderBy("s1", "s2")
  }

  /** Grid cell width for [[qDbscanGrid]] (embedding dims span ~[−0.4, 0.4],
    * so ~16×16 occupied cells). */
  val DbscanCellW = 0.05

  /** Grid-based density clustering (the GriDBSCAN / STING family —
    * Uncu 2006, Wang 1997): the density-based complement to [[qKmeans]]'s
    * centroid clustering, finding arbitrarily-shaped clusters and
    * explicitly labeling sparse NOISE. Points land in a 2-D grid over
    * embedding dims 1–2 ([[DbscanCellW]] cells); a cell is CORE when it
    * holds ≥ max(3, n/200) points (data-relative, so every SF exercises
    * the full path); clusters are connected components of 8-adjacent core
    * cells; non-core points report as the cluster_id = −1 noise row.
    *
    * Scale design: the per-point work is two floor()s and one grid-key
    * groupBy (map-side combined) — the grid frame, not the point set, is
    * what everything downstream touches. Adjacency is an EQUI-join: each
    * core cell explodes its 9 neighbor offsets and joins back on the
    * packed cell key (no range/BNL join at any scale); components run on
    * the cell graph via [[graft.operators.ConnectedComponents]]
    * (pointer-doubling min-label, O(log diameter) rounds, cells ≪
    * points). The oracle replays the components with a recursive
    * min-label CTE over the same (tiny) core-cell graph. Floor parity:
    * float→double cast is exact, /0.05 is one correctly-rounded IEEE op
    * on identical operands in both engines. */
  /** Packed 1-D grid key for a (`cx`, `cy`) cell pair. The key spans
    * ±2²⁰ cells per axis (±52k embedding units at 0.05 width) and FAILS
    * LOUDLY beyond it in both engines — a silent collision would merge
    * unrelated clusters (the Quantiles-guard convention: the assert is
    * folded into the value so column pruning can't skip it). Factored
    * out so OverflowBoundarySpec can drive the production guard at and
    * past the packing boundary. */
  private[queries] def dbscanPackedCell: Column = {
    val inRange = abs(col("cx")) < (1L << 20) && abs(col("cy")) < (1L << 20)
    val cellGuard = coalesce(
      assert_true(inRange,
        concat(lit("grid cell coordinate out of packing range (|c| >= 2^20): ("),
          col("cx"), lit(","), col("cy"), lit(")"))).cast("long"),
      lit(0L))
    (col("cx") + (1L << 20)) * (1L << 21) + (col("cy") + (1L << 20)) + cellGuard
  }

  val qDbscanGrid: Q = Q.sql(
    "q_dbscan_grid",
    s"""WITH RECURSIVE pts AS (
       |  SELECT vec_id,
       |    CAST(floor(CAST(embedding[1] AS DOUBLE) / $DbscanCellW) AS BIGINT) AS cx,
       |    CAST(floor(CAST(embedding[2] AS DOUBLE) / $DbscanCellW) AS BIGINT) AS cy
       |  FROM embeddings
       |), cells AS (
       |  SELECT cx, cy,
       |    CASE WHEN abs(cx) < 1048576 AND abs(cy) < 1048576
       |      THEN (cx + 1048576) * 2097152 + (cy + 1048576)
       |      ELSE CAST(error('grid cell coordinate out of packing range (|c| >= 2^20)') AS BIGINT)
       |    END AS c,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM pts GROUP BY 1, 2
       |), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
       |core AS (
       |  SELECT c, cx, cy FROM cells, n WHERE cnt >= greatest(3, n // 200)
       |), adj AS (
       |  SELECT a.c AS src, b.c AS dst FROM core a JOIN core b
       |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       |), lbl AS (
       |  SELECT c, c AS l FROM core
       |  UNION
       |  SELECT a.src AS c, l.l FROM adj a JOIN lbl l ON a.dst = l.c
       |), comp AS (SELECT c, min(l) AS comp FROM lbl GROUP BY 1)
       |SELECT coalesce(comp.comp, -1) AS cluster_id,
       |  CAST(count(DISTINCT cl.c) AS BIGINT) AS n_cells,
       |  CAST(count(*) AS BIGINT) AS n_points
       |FROM pts p
       |  JOIN cells cl ON p.cx = cl.cx AND p.cy = cl.cy
       |  LEFT JOIN comp ON cl.c = comp.c
       |GROUP BY 1 ORDER BY n_points DESC, cluster_id""".stripMargin,
    doc = "grid DBSCAN over embedding dims 1-2: density core cells + CC, noise row = -1") {
    (s, d) =>
      val pts = embeddings(s, d).select(
        col("vec_id"),
        floor(element_at(col("embedding"), 1).cast("double") / DbscanCellW).cast("long").as("cx"),
        floor(element_at(col("embedding"), 2).cast("double") / DbscanCellW).cast("long").as("cy"))
      val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("cnt"))
        .select(col("cx"), col("cy"), col("cnt"), dbscanPackedCell.as("c"))
      val n = pts.agg(count(lit(1)).as("n"))
      val core = cells.crossJoin(broadcast(n))
        .filter(col("cnt") >= greatest(lit(3L), expr("n DIV 200")))
        .select("c", "cx", "cy")
      // 9-offset explode + equi-join: the scale-safe adjacency (no BNL)
      val offs = array((for { dx <- -1 to 1; dy <- -1 to 1 }
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
      val adj = core
        .select(col("c").as("src"), explode(offs).as("o"), col("cx"), col("cy"))
        .select(col("src"), (col("cx") + col("o.dx")).as("nx"), (col("cy") + col("o.dy")).as("ny"))
        .join(core.select(col("c").as("dst"), col("cx").as("nx"), col("cy").as("ny")),
          Seq("nx", "ny"))
        .select(col("src"), col("dst"))
      val comp = graft.operators.ConnectedComponents.components(adj)
        .toDF("node", "comp")
      pts
        .join(cells, Seq("cx", "cy"))
        .join(broadcast(comp), col("c") === col("node"), "left")
        .groupBy(coalesce(col("comp"), lit(-1L)).as("cluster_id"))
        .agg(countDistinct(col("c")).cast("long").as("n_cells"),
          count(lit(1)).cast("long").as("n_points"))
        .orderBy(col("n_points").desc, col("cluster_id"))
  }

  /** Clustering quality against ground truth — adjusted Rand index
    * (Hubert & Arabie 1985) and purity of the IVF cell assignment vs
    * the embeddings' labels: the external-validation readout every
    * clustering pass (kmeans, DBSCAN, IVF partitioning) is judged by.
    *
    * ALL-INTEGER: ARI reduces to pair-count algebra on the bounded
    * cells × labels contingency table — with doubled pair counts
    * I₂ = Σnᵢⱼ(nᵢⱼ−1), A₂ = Σaᵢ(aᵢ−1), B₂ = Σbⱼ(bⱼ−1), N₂ = n(n−1):
    * ARI = 2(N₂I₂ − A₂B₂) / (N₂(A₂+B₂) − 2A₂B₂) — every product folds
    * in DECIMAL(38,0)/HUGEINT (exact to ~10⁹ rows; beyond, scale the
    * counts), the statistic is ONE division, round(9). Purity is a
    * half-up ppm of Σ per-cell max label count.
    *
    * Scale design: the only fact-scale work is the broadcast centroid
    * assignment + ONE (cell, label) aggregate; all pair algebra runs on
    * the ≤ cells·labels contingency frame. */
  /** Shared cells × labels contingency for [[qAri]] / [[qVmeasure]]:
    * IVF cell assignment joined to the embedding labels, counted — the
    * only fact-scale work either external-validation gate does. */
  private def cellLabelCounts(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    val cents = all.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    assignCells(all, cents)
      .select(col("vec_id"), col("cell"))
      .join(embeddings(s, d).select(col("vec_id"), col("label")), "vec_id")
      .groupBy("cell", "label")
      .agg(count(lit(1)).cast("decimal(19,0)").as("nij"))
  }

  /** The matching oracle CTEs: `ct(cell, label, nij)` in HUGEINT. */
  private val cellLabelCountsSql: String =
    s"""vecs AS ($vecsSqlNested),
       |cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM vecs WHERE vec_id < $IvfCells),
       |scored AS (
       |  SELECT q.vec_id, c.cid,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY (${dotSql("q", "c").replace("c.v[", "c.cv[")}) / (q.nrm * c.cnrm) DESC, c.cid)
       |      AS BIGINT) AS crank
       |  FROM vecs q JOIN cents c ON true
       |),
       |ct AS (
       |  SELECT s.cid AS cell, e.label, CAST(count(*) AS HUGEINT) AS nij
       |  FROM scored s JOIN embeddings e ON e.vec_id = s.vec_id
       |  WHERE s.crank = 1
       |  GROUP BY 1, 2
       |)""".stripMargin

  val qAri: Q = Q.sql(
    "q_ari",
    s"""WITH $cellLabelCountsSql,
       |rows_ AS (SELECT cell, CAST(sum(nij) AS HUGEINT) AS ai FROM ct GROUP BY 1),
       |cols_ AS (SELECT label, CAST(sum(nij) AS HUGEINT) AS bj FROM ct GROUP BY 1),
       |pmax AS (SELECT cell, max(nij) AS mx FROM ct GROUP BY 1),
       |agg AS (
       |  SELECT
       |    (SELECT CAST(coalesce(sum(nij), 0) AS HUGEINT) FROM ct) AS n,
       |    (SELECT CAST(coalesce(sum(nij * (nij - 1)), 0) AS HUGEINT) FROM ct) AS i2,
       |    (SELECT CAST(coalesce(sum(ai * (ai - 1)), 0) AS HUGEINT) FROM rows_) AS a2,
       |    (SELECT CAST(coalesce(sum(bj * (bj - 1)), 0) AS HUGEINT) FROM cols_) AS b2,
       |    (SELECT CAST(count(*) AS BIGINT) FROM rows_) AS n_clusters,
       |    (SELECT CAST(count(*) AS BIGINT) FROM cols_) AS n_labels,
       |    (SELECT CAST(coalesce(sum(mx), 0) AS HUGEINT) FROM pmax) AS pm
       |)
       |SELECT CAST(n AS BIGINT) AS n, n_clusters, n_labels,
       |  CASE WHEN n * (n - 1) * (a2 + b2) - 2 * a2 * b2 = 0 THEN NULL
       |    ELSE round(CAST(2 * (n * (n - 1) * i2 - a2 * b2) AS DOUBLE)
       |      / CAST(n * (n - 1) * (a2 + b2) - 2 * a2 * b2 AS DOUBLE), 9) END AS ari,
       |  CASE WHEN n = 0 THEN NULL
       |    ELSE CAST((2000000 * pm + n) // (2 * n) AS BIGINT) END AS purity_ppm
       |FROM agg""".stripMargin,
    doc = "adjusted Rand index + purity of the IVF cell clustering vs embedding labels") {
    (s, d) =>
      val dec = "decimal(38,0)"
      val ct = cellLabelCounts(s, d)
      val rowsS = ct.groupBy("cell").agg(sum(col("nij")).cast("decimal(19,0)").as("ai"))
      val colsS = ct.groupBy("label").agg(sum(col("nij")).cast("decimal(19,0)").as("bj"))
      val pmax = ct.groupBy("cell").agg(max(col("nij")).as("mx"))
      val agg = ct.agg(
        coalesce(sum(col("nij")), lit(0)).cast(dec).as("n"),
        coalesce(sum(col("nij") * (col("nij") - 1)), lit(0)).cast(dec).as("i2"))
        .crossJoin(broadcast(rowsS.agg(
          coalesce(sum(col("ai") * (col("ai") - 1)), lit(0)).cast(dec).as("a2"),
          count(lit(1)).cast("long").as("n_clusters"))))
        .crossJoin(broadcast(colsS.agg(
          coalesce(sum(col("bj") * (col("bj") - 1)), lit(0)).cast(dec).as("b2"),
          count(lit(1)).cast("long").as("n_labels"))))
        .crossJoin(broadcast(pmax.agg(
          coalesce(sum(col("mx")), lit(0)).cast(dec).as("pm"))))
      val n2 = col("n") * (col("n") - 1)
      val den = n2 * (col("a2") + col("b2")) - lit(2) * col("a2") * col("b2")
      agg.select(
        col("n").cast("long").as("n"), col("n_clusters"), col("n_labels"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(round((lit(2) * (n2 * col("i2") - col("a2") * col("b2"))).cast("double")
            / den.cast("double"), 9)).as("ari"),
        when(col("n") === 0, lit(null).cast("long"))
          // integer DIV (the qCalibration convention) — decimal `/` would
          // round at its result scale before a truncating cast
          .otherwise(expr(
            "CAST((2000000 * CAST(pm AS BIGINT) + CAST(n AS BIGINT)) " +
              "DIV (2 * CAST(n AS BIGINT)) AS BIGINT)")).as("purity_ppm"))
  }

  val all: Seq[Q] =
    Seq(qEmbedTopk, qKmeans, qEmbedNearDup, qAnnLsh, qAnnIvf, qIvfPq, qEmbedQuantize, qEmbedPq, qPqSearch,
      qSemDedup, qRandomProjection, qMmrSelect, qAnnRefine, qRrfHybrid, qHardNegatives,
      qGramMatrix, qEffectiveRank, qDbscanGrid, qIvfIndexBuild, qIvfIndexSearch,
      qIvfIndexUpdate, qPqIndexSearch, qIvfPqIndexSearch, qIvfPqIndexUpdate,
      qIvfAdcTrained,
      qSourceCentroids, qAri, qVmeasure)

  /** V-measure clustering validation (Rosenberg & Hirschberg 2007) —
    * homogeneity h = I/H(labels), completeness c = I/H(cells), and
    * their harmonic mean V = 2I/(H(labels)+H(cells)), the
    * entropy-based complement to [[qAri]]'s pair counting (ARI rewards
    * agreement; V separates "each cell is pure" from "each label is
    * gathered").
    *
    * Determinism: entropies and mutual information are sums of ln
    * terms over the bounded contingency — each term is computed on
    * EXACT integer counts (identical ln arguments in both engines) and
    * quantized to 1e-12 fixed point BEFORE the fold (the
    * [[StatsQueries.qPsiDrift]] convention) so summation order can
    * never flip a bit; the three final ratios are round(6). Same
    * fact-scale profile as qAri: one broadcast assignment + one
    * aggregate, everything else on the cells×labels frame. */
  lazy val qVmeasure: Q = Q.sql(
    "q_vmeasure",
    s"""WITH $cellLabelCountsSql,
       |rows_ AS (SELECT cell, CAST(sum(nij) AS HUGEINT) AS ai FROM ct GROUP BY 1),
       |cols_ AS (SELECT label, CAST(sum(nij) AS HUGEINT) AS bj FROM ct GROUP BY 1),
       |tot AS (SELECT CAST(coalesce(sum(nij), 0) AS HUGEINT) AS n FROM ct),
       |terms AS (
       |  SELECT
       |    (SELECT coalesce(sum(CAST(round(
       |        (CAST(nij AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) * nij / (ai * bj)) * 1e12)
       |        AS BIGINT)), 0)
       |     FROM ct JOIN rows_ USING (cell) JOIN cols_ USING (label) CROSS JOIN tot) AS mi_q,
       |    (SELECT coalesce(sum(CAST(round(
       |        -(CAST(bj AS DOUBLE) / n) * ln(CAST(bj AS DOUBLE) / n) * 1e12) AS BIGINT)), 0)
       |     FROM cols_ CROSS JOIN tot) AS hl_q,
       |    (SELECT coalesce(sum(CAST(round(
       |        -(CAST(ai AS DOUBLE) / n) * ln(CAST(ai AS DOUBLE) / n) * 1e12) AS BIGINT)), 0)
       |     FROM rows_ CROSS JOIN tot) AS hc_q,
       |    (SELECT CAST(n AS BIGINT) FROM tot) AS n
       |)
       |SELECT n,
       |  round(mi_q / 1e12, 6) AS mi_nats,
       |  CASE WHEN hl_q = 0 THEN NULL ELSE round(CAST(mi_q AS DOUBLE) / hl_q, 6) END AS homogeneity,
       |  CASE WHEN hc_q = 0 THEN NULL ELSE round(CAST(mi_q AS DOUBLE) / hc_q, 6) END AS completeness,
       |  CASE WHEN hl_q + hc_q = 0 THEN NULL
       |    ELSE round(2.0 * mi_q / (CAST(hl_q AS DOUBLE) + hc_q), 6) END AS v_measure
       |FROM terms""".stripMargin,
    doc = "V-measure (homogeneity/completeness) of the IVF cell clustering vs labels") {
    (s, d) =>
      val ct = cellLabelCounts(s, d)
      val rowsS = ct.groupBy("cell").agg(sum(col("nij")).cast("decimal(19,0)").as("ai"))
      val colsS = ct.groupBy("label").agg(sum(col("nij")).cast("decimal(19,0)").as("bj"))
      val tot = ct.agg(coalesce(sum(col("nij")), lit(0)).cast("decimal(19,0)").as("n"))
      def q12(c: Column): Column = round(c * 1e12).cast("long")
      val nD = col("n").cast("double")
      val mi = ct
        .join(rowsS, "cell").join(colsS, "label").crossJoin(broadcast(tot))
        .agg(coalesce(sum(q12(
          (col("nij").cast("double") / nD)
            * log(nD * col("nij").cast("double")
              / (col("ai") * col("bj")).cast("double")))), lit(0L)).as("mi_q"))
      def entropy(m: org.apache.spark.sql.DataFrame, cnt: String, out: String) = m
        .crossJoin(broadcast(tot))
        .agg(coalesce(sum(q12(
          -(col(cnt).cast("double") / nD) * log(col(cnt).cast("double") / nD))),
          lit(0L)).as(out))
      mi
        .crossJoin(broadcast(entropy(colsS, "bj", "hl_q")))
        .crossJoin(broadcast(entropy(rowsS, "ai", "hc_q")))
        .crossJoin(broadcast(tot))
        .select(
          col("n").cast("long").as("n"),
          round(col("mi_q") / 1e12, 6).as("mi_nats"),
          when(col("hl_q") === 0, lit(null).cast("double"))
            .otherwise(round(col("mi_q").cast("double") / col("hl_q"), 6)).as("homogeneity"),
          when(col("hc_q") === 0, lit(null).cast("double"))
            .otherwise(round(col("mi_q").cast("double") / col("hc_q"), 6)).as("completeness"),
          when(col("hl_q") + col("hc_q") === 0, lit(null).cast("double"))
            .otherwise(round(lit(2.0) * col("mi_q")
              / (col("hl_q").cast("double") + col("hc_q")), 6)).as("v_measure"))
  }
}
