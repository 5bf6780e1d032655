package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The remaining classic TPC-H join/agg shapes not yet covered by
  * [[CoreQueries]] — each exercises a distinct plan pattern the engine must
  * get right at 100 TB:
  *
  *  - Q8 market share: a 7-table star with TWO nation roles and a
  *    conditional-numerator / full-denominator share per group;
  *  - Q10 returned items: fact-side filter + 4-table join + top-k by a
  *    computed aggregate (TakeOrderedAndProject, not a full sort);
  *  - Q11 important parts: group aggregate compared against a broadcast
  *    global scalar (aggregate-vs-aggregate-of-aggregates);
  *  - Q14 promo share: conditional aggregation ratio on a time slice;
  *  - Q16 supplier variety: count(DISTINCT) + null-aware NOT IN anti join;
  *  - Q18 large orders: IN over a HAVING aggregate (semi join against an
  *    aggregated fact) + re-aggregation of the surviving orders.
  *
  * The SQL string is shared verbatim with the DuckDB oracle, so Catalyst
  * plans the exact text the oracle replays. Money arithmetic follows the
  * [[CoreQueries.qProductProfit]] discipline: everything stays DECIMAL
  * (exact, partial-aggregation-order invariant) until the output edge, and
  * ratios divide two exactly-summed decimals as doubles — deterministic on
  * both engines. All dims (region/nation/supplier/part/customer at their
  * post-filter sizes) broadcast under Catalyst's threshold; only
  * lineitem ⋈ orders shuffles, on the join key.
  */
object StarQueries {

  private def views(s: SparkSession, d: String, names: String*): Unit =
    names.foreach {
      case "lineitem" => lineitem(s, d).createOrReplaceTempView("lineitem")
      case "orders" => orders(s, d).createOrReplaceTempView("orders")
      case "customer" => customer(s, d).createOrReplaceTempView("customer")
      case "supplier" => supplier(s, d).createOrReplaceTempView("supplier")
      case "part" => part(s, d).createOrReplaceTempView("part")
      case "nation" => nation(s, d).createOrReplaceTempView("nation")
      case "region" => region(s, d).createOrReplaceTempView("region")
      case n => throw new IllegalArgumentException(n)
    }

  private def sqlQ(name: String, sql: String, doc: String, tables: String*): Q =
    Q.sql(name, sql, doc) { (s, d) => views(s, d, tables: _*); s.sql(sql) }

  /** TPC-H Q8 shape — a supplier nation's share of a region's order volume
    * per year. Two nation dims play different roles (customer-side filter
    * path through region, supplier-side grouping path); the share keeps an
    * exact decimal numerator AND denominator in one aggregation pass
    * (conditional sum — no second scan, no self-join). */
  val qMarketShare: Q = sqlQ(
    "q_market_share",
    """WITH vol AS (
      |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l.l_extendedprice AS DECIMAL(20,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(8,2))) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      |  JOIN region r ON r.r_regionkey = n1.n_regionkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      |  WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
      |)
      |SELECT o_year,
      |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(20,2)) END) AS DOUBLE)
      |    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
      |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,
    "TPC-H Q8 shape: 7-table dual-role-nation star, yearly market share",
    "lineitem", "part", "orders", "customer", "nation", "region", "supplier")

  /** TPC-H Q10 shape — top returned-item customers by lost revenue over a
    * 1-year slice. The LIMIT rides the computed aggregate: Catalyst plans
    * TakeOrderedAndProject (per-partition top-20 + driver merge), never a
    * global sort of all customers. Revenue is an exact decimal sum, so the
    * DESC order (ties broken on custkey) is engine-identical. */
  val qReturnedCustomers: Q = sqlQ(
    "q_returned_customers",
    """SELECT c.c_custkey, c.c_name, n.n_name,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |WHERE l.l_returnflag = 'R'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c.c_custkey
      |LIMIT 20""".stripMargin,
    "TPC-H Q10 shape: returned-item revenue top-k (TakeOrderedAndProject)",
    "customer", "orders", "lineitem", "nation")

  /** TPC-H Q11 shape — parts whose inventory value exceeds 1.2× the mean
    * per-part value. The global total/count is a single-row aggregate
    * broadcast against the per-part aggregate (no second fact scan, no
    * correlated re-evaluation); the threshold is RELATIVE, so the query is
    * scale-invariant — a fixed fraction (TPC-H's 0.0001/SF) would return
    * the empty set at one scale and everything at another. */
  val qImportantParts: Q = sqlQ(
    "q_important_parts",
    """WITH pv AS (
      |  SELECT l.l_partkey,
      |    sum(CAST(l.l_extendedprice AS DECIMAL(20,2)) * CAST(l.l_quantity AS DECIMAL(12,2))) AS val
      |  FROM lineitem l GROUP BY l.l_partkey),
      |tot AS (SELECT sum(val) AS t, count(*) AS cnt FROM pv)
      |SELECT pv.l_partkey AS partkey, CAST(pv.val AS DOUBLE) AS part_value
      |FROM pv CROSS JOIN tot
      |WHERE CAST(pv.val AS DOUBLE) > CAST(tot.t AS DOUBLE) / tot.cnt * 1.2
      |ORDER BY part_value DESC, partkey""".stripMargin,
    "TPC-H Q11 shape: per-group value vs broadcast global-mean threshold",
    "lineitem")

  /** TPC-H Q14 shape — promo revenue share per ship month: one conditional
    * decimal aggregation produces numerator and denominator together; the
    * ship-date slice is pushed to the parquet scan. */
  val qPromoShare: Q = sqlQ(
    "q_promo_share",
    """SELECT CAST(year(l.l_shipdate) AS BIGINT) AS y, CAST(month(l.l_shipdate) AS BIGINT) AS m,
      |  round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN
      |      CAST(l.l_extendedprice AS DECIMAL(20,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(8,2)))
      |    ELSE CAST(0 AS DECIMAL(20,2)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE), 6) AS promo_share
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY y, m ORDER BY y, m""".stripMargin,
    "TPC-H Q14 shape: conditional-aggregation revenue share per month",
    "lineitem", "part")

  /** TPC-H Q16 shape — how many distinct suppliers serve each
    * (brand, type) among selected sizes, excluding flagged suppliers. The
    * NOT IN compiles to a null-aware anti join (s_suppkey is non-null, so
    * it stays a broadcast anti join, not a cartesian null check);
    * count(DISTINCT) runs as the two-level Expand-free distinct aggregate
    * over the already-grouped keys. */
  val qPartVariety: Q = sqlQ(
    "q_part_variety",
    """SELECT p.p_brand, p.p_type, CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
      |WHERE p.p_size IN (1, 5, 9, 13, 17, 21)
      |  AND l.l_suppkey NOT IN (SELECT s.s_suppkey FROM supplier s WHERE s.s_acctbal < 0)
      |GROUP BY p.p_brand, p.p_type
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type""".stripMargin,
    "TPC-H Q16 shape: count-distinct suppliers + null-aware NOT IN anti join",
    "part", "lineitem", "supplier")

  /** TPC-H Q18 shape — large-volume orders: IN over a HAVING aggregate is
    * a left-semi join of orders against the aggregated fact (the aggregate
    * runs ONCE, map-side combined on l_orderkey — the same key the fact is
    * already shuffled on for the re-aggregation, so AQE reuses the
    * exchange). Quantities sum as exact decimals on both engines. */
  val qBigOrders: Q = sqlQ(
    "q_big_orders",
    """SELECT c.c_name, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
      |  CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderkey IN (
      |  SELECT l2.l_orderkey FROM lineitem l2 GROUP BY l2.l_orderkey
      |  HAVING sum(CAST(l2.l_quantity AS DECIMAL(12,2))) > 300)
      |GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
      |ORDER BY o_totalprice DESC, o.o_orderkey
      |LIMIT 50""".stripMargin,
    "TPC-H Q18 shape: semi join against a HAVING aggregate + top-k",
    "customer", "orders", "lineitem")

  /** TPC-H Q6 shape — the forecast-revenue-change scan: a pure
    * filter-and-sum whose every predicate (date range, discount band,
    * quantity cap) must reach the parquet scan as a pushed filter — at
    * 100 TB this query is row-group pruning or it is nothing. No join,
    * no shuffle beyond the single-row aggregate merge. */
  val qRevenueScan: Q = sqlQ(
    "q_revenue_scan",
    """SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2)) * CAST(l.l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem l
      |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l.l_discount >= 0.05 AND l.l_discount <= 0.07 AND l.l_quantity < 24""".stripMargin,
    "TPC-H Q6 shape: pure pushed-predicate scan + single aggregate",
    "lineitem")

  /** TPC-H Q19 shape — disjunctive mixed-table predicates (OR of ANDs
    * spanning both part and lineitem columns). The planner must still
    * push the COMMON implied part of each disjunct: Catalyst extracts
    * `p_brand IN (...)` / `p_size <= 35` / quantity bounds toward the
    * scans while the full disjunction evaluates post-join — the filter
    * shape naive pushdown gives up on. */
  val qBrandRevenue: Q = sqlQ(
    "q_brand_revenue",
    """SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 15 AND l.l_quantity >= 1 AND l.l_quantity <= 20)
      |   OR (p.p_brand = 'Brand#2' AND p.p_size <= 25 AND l.l_quantity >= 10 AND l.l_quantity <= 30)
      |   OR (p.p_brand = 'Brand#3' AND p.p_size <= 35 AND l.l_quantity >= 20 AND l.l_quantity <= 40)""".stripMargin,
    "TPC-H Q19 shape: disjunctive two-table predicate with common-factor pushdown",
    "lineitem", "part")

  /** TPC-H Q13 shape — customer order-count distribution: a LEFT OUTER
    * join with a predicate ON THE JOIN (not a WHERE — filtering after
    * the join would silently drop the zero-order customers the query
    * exists to count), aggregated twice (orders per customer, then
    * customers per count). The second aggregate is domain-bounded
    * (distinct counts), so the histogram shuffle is tiny regardless of
    * customer cardinality. Completes the expressible TPC-H set: every
    * shape from Q1–Q22 is now covered except Q12, whose l_shipmode /
    * l_commitdate / l_receiptdate columns this testdata does not carry. */
  val qOrderDistribution: Q = sqlQ(
    "q_order_distribution",
    """WITH co AS (
      |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey)
      |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM co GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "TPC-H Q13 shape: outer join with ON-predicate + aggregate-of-aggregate histogram",
    "customer", "orders")

  val all: Seq[Q] = Seq(
    qMarketShare, qReturnedCustomers, qImportantParts, qPromoShare,
    qPartVariety, qBigOrders, qRevenueScan, qBrandRevenue, qOrderDistribution)
}
