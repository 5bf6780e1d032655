package graft.queries

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: scans, filters, aggregation, joins (broadcast + shuffle,
  * semi/anti), analytic windows, sort/limit (top-k), set ops, scalar
  * functions. The reference delegates all query execution to InfluxDB's Flux
  * engine (SURVEY §2, §4); here the same — and wider — semantics are
  * declared through the DataFrame API so Catalyst gets full freedom
  * (pushdown, pruning, join selection, partial aggregation, AQE).
  *
  * Scale notes (100 TB):
  *   - dimension joins (`nation`, `region`) are explicitly `broadcast()` —
  *     no shuffle of the fact side;
  *   - fact-fact joins shuffle on the join key only after filters/pruning;
  *   - top-k is `orderBy().limit(n)` which Spark plans as
  *     `TakeOrderedAndProject` — per-partition heaps, no global sort;
  *   - all aggregations are partial+final hash aggregates (map-side combine)
  *     planned automatically by Catalyst.
  */
object CoreQueries {

  /** Exact-decimal accumulation pattern used by every money-sum here and
    * below: floating sums are order-dependent (Spark's partial aggregation
    * order is nondeterministic), so the input is cast to DECIMAL, summed
    * exactly, and only the final exact value is cast back to DOUBLE. Both
    * engines then produce bit-identical doubles at every scale factor — no
    * `round()` epsilon games. */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(s"decimal(27,$scale)")).cast("double")

  /** TPC-H Q1-style pricing summary: wide-row scan reduced to 6 groups.
    * Predicate and the 7 needed columns are pushed to the parquet scan. */
  val q1Agg: Q = Q.sql(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (1.00 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (1.00 - CAST(l_discount AS DECIMAL(8,2))) * (1.00 + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(27,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    doc = "TPC-H Q1 pricing summary (agg over pruned scan, exact decimal sums)") { (s, d) =>
    val one = lit(java.math.BigDecimal.valueOf(100, 2)) // 1.00 as DECIMAL(3,2)
    val price = col("l_extendedprice").cast("decimal(20,2)")
    val disc = col("l_discount").cast("decimal(8,2)")
    val tax = col("l_tax").cast("decimal(8,2)")
    // disc_price is staged once per row and charge derives from it — the
    // same left-associated product tree as the SQL, so values are
    // bit-identical, but 2 decimal multiplies per row instead of 3. The
    // averages are post-projections over the summed outputs (one aggregate
    // per distinct sum, not one per output column), and the decimal-heavy
    // aggregation runs on a spread scan (single small file would otherwise
    // put every BigDecimal op on one core — NOTES.md lesson 6).
    val spreadScan = graft.Tables.spread(
      s,
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-12-01 00:00:00"))))
    spreadScan
      .select(
        col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"),
        (price * (one - disc)).as("dp"),
        (price * (one - disc) * (one + tax)).as("charge"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("dp")).cast("double").as("sum_disc_price"),
        sum(col("charge")).cast("double").as("sum_charge"),
        dsum(col("l_discount")).as("sum_disc"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"), col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
        (col("sum_qty") / col("count_order")).as("avg_qty"),
        (col("sum_base_price") / col("count_order")).as("avg_price"),
        (col("sum_disc") / col("count_order")).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Star join: fact (orders) ⋈ customer shuffles on the key; the two tiny
    * dims ride along as broadcasts. */
  val qJoinAgg: Q = Q.sql(
    "q_join_agg",
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin,
    doc = "orders⋈customer⋈nation⋈region revenue rollup (broadcast dims)") { (s, d) =>
    val o = orders(s, d); val c = customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(nation(s, d)), c("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  /** TPC-H Q3 shape (shipping priority): segment-filtered customer dim
    * BROADCAST into the orders⋈lineitem fact join (which shuffles on
    * orderkey), date predicates pushed to both fact scans, decimal-exact
    * revenue, and the top-10 plans as TakeOrderedAndProject — the
    * never-global-sort rule for "hottest groups" queries. The synthetic
    * orders table has no shippriority column, so the group carries
    * o_orderpriority instead (same shape, same cardinality class). */
  val qShipPriority: Q = Q.sql(
    "q_ship_priority",
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (1.00 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin,
    doc = "TPC-H Q3 shape: broadcast segment dim, pushed date bounds, exact top-10 revenue") {
    (s, d) =>
      val one = lit(java.math.BigDecimal.valueOf(100, 2))
      val cut = lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00"))
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < cut)
      val l = lineitem(s, d).filter(col("l_shipdate") > cut)
      broadcast(c)
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(20,2)")
          * (one - col("l_discount").cast("decimal(8,2)"))).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
  }

  /** TPC-H Q5 shape (local supplier volume): revenue where the customer
    * and the supplier share a nation, region-filtered. The "local"
    * predicate (c_nationkey = s_nationkey) rides the supplier broadcast
    * join — no extra shuffle; region/nation prune the tiny dims before
    * broadcast. Decimal-exact revenue makes the DESC output order
    * deterministic (no float ties to wobble). */
  val qLocalVolume: Q = Q.sql(
    "q_local_volume",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2)) * (1.00 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin,
    doc = "TPC-H Q5 shape: local-supplier revenue by nation, broadcast dims") { (s, d) =>
    val one = lit(java.math.BigDecimal.valueOf(100, 2))
    val o = orders(s, d).filter(
      col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(20,2)")
        * (one - col("l_discount").cast("decimal(8,2)"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-k: plans as TakeOrderedAndProject (no global sort at scale). */
  val qTopK: Q = Q.sql(
    "q_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin,
    doc = "top-100 orders by price (TakeOrderedAndProject)") { (s, d) =>
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** Anti join — customers that never ordered. */
  val qAntiJoin: Q = Q.sql(
    "q_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin,
    doc = "left_anti join (NOT EXISTS): customers with no large order") { (s, d) =>
    customer(s, d)
      .join(
        orders(s, d).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Semi join — customers with at least one big order. */
  val qSemiJoin: Q = Q.sql(
    "q_semi_join",
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin,
    doc = "left_semi join (EXISTS) with pushed filter") { (s, d) =>
    val bigOrders = orders(s, d).filter(col("o_totalprice") > 400000.0)
    customer(s, d)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Analytic window: top-2 orders per customer by row_number. */
  val qWindowRank: Q = Q.sql(
    "q_window_rank",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) t
      |WHERE rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin,
    doc = "ranking window function (row_number per group)") { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Set operation: INTERSECT (distinct semantics on both engines). */
  val qSetOps: Q = Q.sql(
    "q_set_ops",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT DISTINCT o_custkey FROM orders
      |ORDER BY c_custkey""".stripMargin,
    doc = "INTERSECT of building-segment customers and active customers") { (s, d) =>
    val building = customer(s, d).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val active = orders(s, d).select(col("o_custkey").as("c_custkey")).distinct()
    building.intersect(active).orderBy("c_custkey")
  }

  /** Scalar function battery: date parts, string ops, math, conditionals. */
  val qScalarFns: Q = Q.sql(
    "q_scalar_fns",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
      |  upper(substr(o_orderpriority, 1, 4)) AS pri4,
      |  concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
      |  CAST(CAST(o_totalprice AS DECIMAL(20,2)) * 0.9 AS DOUBLE) AS disc_price,
      |  CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS kbucket,
      |  CAST(o_orderkey % 7 AS BIGINT) AS k7,
      |  CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS size_class
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin,
    doc = "scalar string/date/math/conditional functions") { (s, d) =>
    orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        upper(substring(col("o_orderpriority"), 1, 4)).as("pri4"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        (col("o_totalprice").cast("decimal(20,2)") * lit(java.math.BigDecimal.valueOf(9, 1)))
          .cast("double").as("disc_price"),
        floor(col("o_totalprice") / 1000.0).cast("long").as("kbucket"),
        (col("o_orderkey") % 7).cast("long").as("k7"),
        when(col("o_totalprice") > 200000.0, "big").otherwise("small").as("size_class"))
      .orderBy("o_orderkey")
  }

  /** Set operation: EXCEPT (distinct semantics) — completes the set-op
    * family next to q_set_ops' INTERSECT. */
  val qExcept: Q = Q.sql(
    "q_except",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |EXCEPT
      |SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000.0
      |ORDER BY c_custkey""".stripMargin,
    doc = "EXCEPT: automobile-segment customers minus big spenders") { (s, d) =>
    val auto = customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    val big = orders(s, d)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("c_custkey"))
    auto.except(big).orderBy("c_custkey")
  }

  /** JSON functions — the metadata-parsing surface every training-data
    * pipeline needs: documents carry a synthesized JSON envelope; the
    * query parses it back with get_json_object / from_json (DuckDB:
    * json_extract_string). Round-trip through REAL json-parser code
    * paths on both engines, not string ops. */
  val qJsonExtract: Q = Q.sql(
    "q_json_extract",
    """WITH j AS (
      |  SELECT doc_id,
      |    '{"id": ' || doc_id || ', "lang": "' || lang || '", "n": ' || length(text) || '}' AS meta
      |  FROM documents
      |)
      |SELECT doc_id,
      |  json_extract_string(meta, '$.lang') AS lang,
      |  CAST(json_extract(meta, '$.n') AS BIGINT) AS n_chars,
      |  CAST(json_extract(meta, '$.id') AS BIGINT) = doc_id AS id_roundtrip
      |FROM j
      |ORDER BY doc_id""".stripMargin,
    doc = "JSON metadata envelope parse (get_json_object round-trip)") { (s, d) =>
    val meta = concat(
      lit("{\"id\": "), col("doc_id"),
      lit(", \"lang\": \""), col("lang"),
      lit("\", \"n\": "), length(col("text")), lit("}"))
    documents(s, d)
      .select(col("doc_id"), meta.as("meta"))
      .select(
        col("doc_id"),
        get_json_object(col("meta"), "$.lang").as("lang"),
        get_json_object(col("meta"), "$.n").cast("long").as("n_chars"),
        (get_json_object(col("meta"), "$.id").cast("long") === col("doc_id")).as("id_roundtrip"))
      .orderBy("doc_id")
  }

  /** Salted skew join, oracle-proved semantics-preserving: the
    * fact-side salt in [0,16) + 16× replication of the (tiny) customer
    * side turns any one hot user into 16 evenly-sized join partitions —
    * the mitigation for the skew cases AQE cannot rewrite (a skewed key
    * feeding a window, streaming stateful joins, pinned plans; see
    * [[graft.operators.SkewOps]]). The oracle is the PLAIN join: salting
    * must be invisible in the result, and this gate hash-proves it at
    * every SF rather than asserting it in a spec alone. Salt is
    * deterministic (hash of event_id, not randomness) so retries and
    * oracles reproduce. */
  val qSkewJoin: Q = Q.sql(
    "q_skew_join",
    """SELECT c.c_mktsegment AS segment,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(e.value AS DECIMAL(27,2))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1
      |ORDER BY 1""".stripMargin,
    doc = "salted skew join (16 buckets) hash-matched against the plain-join oracle") { (s, d) =>
    val big = events(s, d).select(col("event_id"), col("user_id"), col("value"))
    val small = customer(s, d).select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.operators.SkewOps
      .saltedJoin(big, small, "user_id", saltBy = col("event_id"), buckets = 16)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy("segment")
  }

  /** TPC-H Q2-shaped correlated scalar subquery ("the supplier achieving
    * the minimum cost for each part"), expressed as LITERAL SQL through
    * `spark.sql` — the registry entry that exercises the SQL front door
    * and Catalyst's subquery decorrelation: `RewriteCorrelatedScalarSubquery`
    * turns the per-part `(SELECT min ...)` into an aggregate joined back
    * on `p_partkey`, so the physical plan re-executes nothing per row.
    * The identical string runs unmodified in DuckDB as its own oracle.
    *
    * Parity: `min` over doubles is order-independent and the equality
    * compares two mins of the same set — exact on both engines. */
  val qMinCostSupplier: Q = {
    val sql =
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT p.p_partkey, p.p_name, s.s_name, c.cost
        |FROM part p
        |JOIN cost c ON c.l_partkey = p.p_partkey
        |JOIN supplier s ON s.s_suppkey = c.l_suppkey
        |WHERE p.p_size <= 10
        |  AND c.cost = (SELECT min(c2.cost) FROM cost c2 WHERE c2.l_partkey = p.p_partkey)
        |ORDER BY p.p_partkey, s.s_name""".stripMargin
    Q.sql(
      "q_min_cost_supplier",
      sql,
      doc = "TPC-H Q2 shape: correlated scalar subquery via spark.sql (decorrelated)") {
      (s, d) =>
        lineitem(s, d).createOrReplaceTempView("lineitem")
        part(s, d).createOrReplaceTempView("part")
        supplier(s, d).createOrReplaceTempView("supplier")
        s.sql(sql)
    }
  }

  /** TPC-H Q4 shape — priority counts over orders having at least one
    * qualifying line item, via correlated EXISTS. Catalyst rewrites the
    * EXISTS into a left-semi join (`RewritePredicateSubquery`); the same
    * string is its own DuckDB oracle. */
  val qExistsPriority: Q = {
    val sql =
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0)
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin
    Q.sql(
      "q_exists_priority",
      sql,
      doc = "TPC-H Q4 shape: correlated EXISTS via spark.sql (rewritten to semi join)") {
      (s, d) =>
        orders(s, d).createOrReplaceTempView("orders")
        lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(sql)
    }
  }

  /** TPC-H Q17 shape — revenue from "small" orders: line items whose
    * quantity is below 20% of the PER-PART average quantity. The
    * correlated aggregate subquery decorrelates to a per-part average
    * joined back (one aggregate over the fact table, not one per row) —
    * the canonical decorrelation benchmark. avg parity: DuckDB's avg over
    * doubles is a running sum whose order its sequential scan fixes;
    * Spark's partial aggregation would reorder it, so BOTH sides
    * accumulate the exact two-decimal quantities as DECIMAL (sum exact,
    * one division at the edge) — the q1_agg exact-decimal pattern applied
    * inside a subquery. */
  val qSmallOrderRevenue: Q = {
    val sql =
      """SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem l
        |WHERE l.l_quantity < 0.2 * (
        |  SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(27,2))) AS DOUBLE)
        |      / count(*)
        |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin
    Q.sql(
      "q_small_order_revenue",
      sql,
      doc = "TPC-H Q17 shape: correlated avg subquery via spark.sql (decorrelated)") {
      (s, d) =>
        lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(sql)
    }
  }

  /** TPC-H Q21 shape — fault attribution on multi-party orders: suppliers
    * who, on finalized multi-supplier orders, were the ONLY supplier with
    * a returned line. The hardest decorrelation combo in the TPC-H suite:
    * a correlated EXISTS (→ left-semi join) AND a correlated NOT EXISTS
    * (→ left-anti join) against the same fact table, inside one query.
    * (This testdata has no receipt/commit dates, so "returned" stands in
    * for Q21's "late"; the plan shape is identical.) Tie-broken ORDER BY
    * so the LIMIT cut is engine-independent. */
  val qFaultSupplier: Q = {
    val sql =
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numfault
        |FROM supplier s
        |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numfault DESC, s.s_name
        |LIMIT 20""".stripMargin
    Q.sql(
      "q_fault_supplier",
      sql,
      doc = "TPC-H Q21 shape: EXISTS + NOT EXISTS decorrelation (semi + anti join)") {
      (s, d) =>
        supplier(s, d).createOrReplaceTempView("supplier")
        orders(s, d).createOrReplaceTempView("orders")
        lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(sql)
    }
  }

  /** TPC-H Q20 shape — dominant suppliers: suppliers holding > 20% of the
    * corpus-wide shipped quantity of ANY part, via a nested IN whose
    * grouped subquery carries a correlated scalar aggregate in HAVING
    * (Q20's partsupp availability test, restated over lineitem since this
    * testdata ships no partsupp). Catalyst decorrelates the inner
    * aggregate to a per-part total joined back, and the IN to a
    * left-semi join. Quantity sums accumulate as exact DECIMAL on both
    * sides and the threshold is the integer-exact `5·x > total` form, so
    * the comparison needs no float tolerance. */
  val qDominantSupplier: Q = {
    val sql =
      """SELECT s.s_name, round(s.s_acctbal, 2) AS acctbal
        |FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l.l_suppkey FROM lineitem l
        |  GROUP BY l.l_suppkey, l.l_partkey
        |  HAVING 5 * sum(CAST(l.l_quantity AS DECIMAL(27,2))) > (
        |    SELECT sum(CAST(l2.l_quantity AS DECIMAL(27,2)))
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey))
        |ORDER BY s.s_name""".stripMargin
    Q.sql(
      "q_dominant_supplier",
      sql,
      doc = "TPC-H Q20 shape: nested IN + correlated aggregate in HAVING (decorrelated)") {
      (s, d) =>
        supplier(s, d).createOrReplaceTempView("supplier")
        lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(sql)
    }
  }

  /** TPC-H Q15 shape — the top supplier(s) by shipped revenue over a
    * quarter: an aggregate "view" (CTE) consumed twice, once as the fact
    * frame and once under an UNcorrelated scalar `max` subquery that
    * Catalyst plans as a single-row aggregate broadcast into the filter.
    * The equality `total_revenue = (SELECT max ...)` is float-hostile if
    * revenue sums reorder, so revenue accumulates as exact
    * DECIMAL(27,4) (price·(1−discount) has exactly 4 decimals) and the
    * max/equality compare identical bits; one cast at the edge. */
  val qTopSupplier: Q = {
    val sql =
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice AS DECIMAL(27,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(27,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey
        |)
        |SELECT s.s_suppkey, s.s_name,
        |  CAST(r.total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier s
        |JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin
    Q.sql(
      "q_top_supplier",
      sql,
      doc = "TPC-H Q15 shape: aggregate view + uncorrelated scalar max subquery") {
      (s, d) =>
        supplier(s, d).createOrReplaceTempView("supplier")
        lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(sql)
    }
  }

  /** TPC-H Q22 shape — "global sales opportunity": customers with an
    * above-average positive balance and no order in 1996 H1, rolled up
    * by nation (this testdata carries no phone column and every customer
    * orders continuously 1995–2001, so nation replaces Q22's phone-prefix
    * bucketing and a half-year absence window replaces "never ordered" —
    * the plan shape — uncorrelated scalar avg subquery + correlated
    * NOT EXISTS → one single-row broadcast + one left-anti join — is
    * identical, and the gate stays non-vacuous at every SF). The avg
    * threshold accumulates as exact DECIMAL on both engines (the Q17
    * pattern), so the > comparison needs no tolerance. */
  val qGlobalOpportunity: Q = {
    val sql =
      """SELECT c.c_nationkey,
        |  CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS totacctbal
        |FROM customer c
        |WHERE c.c_acctbal > (
        |    SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
        |        / count(*)
        |    FROM customer c2 WHERE c2.c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00')
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""".stripMargin
    Q.sql(
      "q_global_opportunity",
      sql,
      doc = "TPC-H Q22 shape: scalar avg subquery + NOT EXISTS anti join") {
      (s, d) =>
        customer(s, d).createOrReplaceTempView("customer")
        orders(s, d).createOrReplaceTempView("orders")
        s.sql(sql)
    }
  }

  /** TPC-H Q7 shape — volume shipping between two trade blocs, by
    * directed nation pair and ship year: the DOUBLE-dimension join
    * (nation joined twice under different roles, supplier-side and
    * customer-side) plus a cross-filter keeping only cross-bloc flows in
    * either direction (Q7's two-nation IN-pair filter widened to
    * 5-nation blocs so the gate stays non-vacuous at sf0.001). Both
    * nation joins broadcast; the year extraction is identical on both
    * engines; revenue is the exact-decimal pattern. */
  val qNationVolume: Q = {
    val sql =
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(volume) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |    CAST(l.l_extendedprice AS DECIMAL(20,2))
        |      * (1.00 - CAST(l.l_discount AS DECIMAL(8,2))) AS volume
        |  FROM supplier s
        |  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_nationkey < 5 AND n2.n_nationkey >= 20)
        |     OR (n1.n_nationkey >= 20 AND n2.n_nationkey < 5)
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
    Q.sql(
      "q_nation_volume",
      sql,
      doc = "TPC-H Q7 shape: dual-role nation dims, directed-pair volume by year") {
      (s, d) =>
        supplier(s, d).createOrReplaceTempView("supplier")
        lineitem(s, d).createOrReplaceTempView("lineitem")
        orders(s, d).createOrReplaceTempView("orders")
        customer(s, d).createOrReplaceTempView("customer")
        nation(s, d).createOrReplaceTempView("nation")
        s.sql(sql)
    }
  }

  /** TPC-H Q9 shape — product-line profit by supplier nation and year:
    * the 5-table star join with an arithmetic that MIXES two fact/dim
    * columns (revenue minus cost·quantity; this testdata ships no
    * partsupp, so the part's retail price at a 10% margin-factor stands
    * in for ps_supplycost — same join/agg shape). Part filter is a
    * substring match ("widget" product line). All money stays DECIMAL
    * until the output edge so the per-(nation, year) sums are exact. */
  val qProductProfit: Q = {
    val sql =
      """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n.n_name AS nation,
        |    CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l.l_extendedprice AS DECIMAL(20,2))
        |      * (1.00 - CAST(l.l_discount AS DECIMAL(8,2)))
        |      - CAST(0.10 AS DECIMAL(8,2)) * CAST(p.p_retailprice AS DECIMAL(20,2))
        |        * CAST(l.l_quantity AS DECIMAL(20,2)) AS amount
        |  FROM part p
        |  JOIN lineitem l ON p.p_partkey = l.l_partkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE p.p_name LIKE '%widget%'
        |) profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin
    Q.sql(
      "q_product_profit",
      sql,
      doc = "TPC-H Q9 shape: 5-table star join, mixed revenue-minus-cost decimal arithmetic") {
      (s, d) =>
        part(s, d).createOrReplaceTempView("part")
        lineitem(s, d).createOrReplaceTempView("lineitem")
        supplier(s, d).createOrReplaceTempView("supplier")
        orders(s, d).createOrReplaceTempView("orders")
        nation(s, d).createOrReplaceTempView("nation")
        s.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(
    q1Agg, qJoinAgg, qShipPriority, qLocalVolume, qTopK, qAntiJoin, qSemiJoin,
    qWindowRank, qSetOps, qExcept, qScalarFns, qJsonExtract, qSkewJoin, qMinCostSupplier,
    qExistsPriority, qSmallOrderRevenue, qFaultSupplier, qDominantSupplier,
    qTopSupplier, qGlobalOpportunity, qNationVolume, qProductProfit)
}
