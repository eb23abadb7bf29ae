package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational queries over the TPC-H-ish star tables — these exercise
  * the aggregation/join/window surface of the reference (SURVEY.md
  * §2.4-2.7) at bench scale. Money math follows the Registry decimal
  * policy: exact DECIMAL sums, DOUBLE at the edge.
  */
object RelationalQueries {

  /** Money columns: exact at 4 dp, wide enough for prices. */
  private def dec4(c: String) = col(c).cast(DecimalType(12, 4))

  /** Rate columns (discount/tax ∈ [0,1]): narrow so chained decimal
    * multiplies stay within precision 38 and remain EXACT — a wider
    * type would force Spark's DecimalPrecision rule to round the
    * product scale down (and diverge from DuckDB).
    */
  private def rate4(c: String) = col(c).cast(DecimalType(6, 4))

  /** TPC-H-Q1-style pricing summary: wide conditional-free aggregation,
    * partial+final HashAggregate, scan-level filter pushdown.
    */
  val q1Pricing: Q = Q(
    "q1_pricing",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      l.filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec4("l_quantity")).cast("double").as("sum_qty"),
          sum(dec4("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec4("l_extendedprice") * (lit(1).cast(DecimalType(6, 4)) - rate4("l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(
            dec4("l_extendedprice") * (lit(1).cast(DecimalType(6, 4)) - rate4("l_discount")) *
              (lit(1).cast(DecimalType(6, 4)) + rate4("l_tax"))
          ).cast("double").as("sum_charge"),
          (sum(dec4("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec4("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec4("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / count(*) AS avg_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / count(*) AS avg_price,
             CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / count(*) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """)
  )

  /** TPC-H-Q3-style shipping priority: three-way join. Only the
    * filtered customer DIM carries a broadcast hint (small at every
    * scale); the orders side is left to AQE — at bench scale its size
    * estimate broadcasts it anyway (asserted in PlanSpec), while at
    * 100 TB a pinned orders broadcast would outgrow the driver, so no
    * hint there. Revenue follows the exact-decimal policy.
    */
  val q3TopOrders: Q = Q(
    "q3_orders",
    (s, dir) => {
      val cutoff = lit("1998-01-01").cast("timestamp")
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "MACHINERY").select("c_custkey")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"),
          (dec4("l_extendedprice") * (lit(1).cast(DecimalType(6, 4)) - rate4("l_discount")))
            .as("rev"))
      l.join(o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
    },
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                           * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))
                  AS VARCHAR) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'MACHINERY'
        AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2, 3
    """)
  )

  /** Snapshot reconciliation via FULL OUTER join: every order matched
    * against its lineitem rollup, tagged present / missing_order /
    * missing_lines — the CDC-audit shape (compare a dimension snapshot
    * with an aggregated fact delta, keep the orphans on BOTH sides,
    * which inner/left joins silently drop).
    *
    * Scale: full-outer can't broadcast (both sides' unmatched rows
    * must survive) — it shuffles both sides on the key; the fact side
    * is pre-aggregated map-side so the exchange carries one row per
    * orderkey, and the groupBy and join reuse one partitioning.
    */
  val orderReconcile: Q = Q(
    "order_reconcile",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(20, 4))).cast("double")
          .as("li_total"), count(lit(1)).as("n_lines"))
      Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
        .join(li, col("o_orderkey") === col("l_orderkey"), "full_outer")
        .select(
          coalesce(col("o_orderkey"), col("l_orderkey")).as("orderkey"),
          col("o_totalprice"), col("li_total"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"),
          when(col("o_orderkey").isNull, "missing_order")
            .when(col("l_orderkey").isNull, "missing_lines")
            .otherwise("present").as("status"),
          when(col("o_orderkey").isNotNull && col("l_orderkey").isNotNull,
            col("o_totalprice") - col("li_total")).as("price_diff"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS li_total,
               count(*) AS n_lines
        FROM lineitem GROUP BY 1)
      SELECT coalesce(o_orderkey, l_orderkey) AS orderkey,
             o_totalprice, li_total,
             coalesce(n_lines, 0) AS n_lines,
             CASE WHEN o_orderkey IS NULL THEN 'missing_order'
                  WHEN l_orderkey IS NULL THEN 'missing_lines'
                  ELSE 'present' END AS status,
             CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
                  THEN o_totalprice - li_total END AS price_diff
      FROM orders FULL JOIN li ON o_orderkey = l_orderkey
    """)
  )

  /** TPC-H-Q5-style local-supplier revenue: six-table join (region →
    * nation → customer → orders → lineitem → supplier with the
    * s_nationkey = c_nationkey locality constraint). The shape the
    * optimizer section of SURVEY.md §4 is about: date + region
    * filters push to the scans, AQE broadcasts every dimension side,
    * and only orders ⋈ lineitem shuffles on the fact keys — at 100 TB
    * that single shuffle pair is the whole network cost.
    */
  val q5RegionRevenue: Q = Q(
    "q5_region_revenue",
    (s, dir) => {
      val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(dec4("l_extendedprice") *
            (lit(1).cast(DecimalType(6, 4)) - rate4("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT n_name,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM region r
      JOIN nation n ON n_regionkey = r_regionkey
      JOIN customer c ON c_nationkey = n_nationkey
      JOIN orders o ON o_custkey = c_custkey
      JOIN lineitem l ON l_orderkey = o_orderkey
      JOIN supplier s ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    """)
  )

  /** TPC-H-Q13-style customer order-count distribution: LEFT join so
    * zero-order customers survive, then a histogram of counts.
    *
    * Scale: orders is aggregated to one row per custkey BEFORE the
    * join, so the custkey exchange carries |customers-with-orders|
    * rows, not |orders| — at 100 TB that is the difference between
    * shuffling the fact table and shuffling a key list. The second
    * aggregate's domain is the tiny count histogram, all map-side.
    */
  val q13CustDist: Q = Q(
    "q13_custdist",
    (s, dir) => {
      val perCust = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("c_count"))
      Tables.customer(s, dir).select("c_custkey")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY 1
    """)
  )

  /** TPC-H-Q18-style large-volume orders: a HAVING filter on a fact
    * aggregate, then enrichment joins.
    *
    * Scale: the quantity rollup runs first (one fact shuffle with
    * map-side partial sums); the >threshold survivors are a tiny
    * fraction (1.4% here, far less at TPC-H's 300 cutoff), so THAT
    * side is broadcast into orders — the orders/customer tables are
    * never shuffled for a handful of hot keys. Pinned with an
    * explicit `broadcast()` because the pre-AQE size estimate of an
    * aggregate output is the input size (Catalyst would plan
    * sort-merge and only AQE might rescue it; the hint makes the
    * plan deterministic at every scale).
    */
  val q18BigOrders: Q = Q(
    "q18_big_orders",
    (s, dir) => {
      val hot = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec4("l_quantity")).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      val o = Tables.orders(s, dir)
        .join(broadcast(hot), col("o_orderkey") === col("l_orderkey"))
      o.join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
    },
    Some("""
      WITH hot AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING sum_qty > 250.0)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM hot JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
    """)
  )

  /** TPC-H-Q10-style returned-item revenue by customer: which
    * customers returned the most value in a quarter.
    *
    * Scale: returnflag + date filters push to both scans; the only
    * big-big exchange is lineitem ⋈ orders on orderkey; revenue is
    * pre-aggregated per custkey BEFORE joining the customer
    * dimension, so the custkey join carries aggregate rows; nation
    * (25 rows) is broadcast.
    */
  val q10Returns: Q = Q(
    "q10_returns",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (dec4("l_extendedprice") * (lit(1).cast(DecimalType(6, 4)) - rate4("l_discount")))
            .as("rev"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val revPerCust = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_returned"))
      revPerCust
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"), col("revenue"), col("n_returned"))
    },
    Some("""
      WITH rpc AS (
        SELECT o_custkey,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))
                             * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))
                    AS VARCHAR) AS DOUBLE) AS revenue,
               count(*) AS n_returned
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY 1)
      SELECT c_custkey, c_name, c_acctbal, n_name, revenue, n_returned
      FROM rpc JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
    """)
  )

  /** Data-quality constraint report over the fact/dim pair — the
    * publish gate of an ingest pipeline. All row-local checks
    * (completeness, uniqueness cardinality, ranges) fuse into ONE
    * aggregate pass over lineitem (DataQuality.run); the two
    * referential checks are key-projected anti-joins. The testdata
    * makes the report non-trivial: (l_orderkey, l_linenumber) is NOT
    * unique and 257 orders have no lineitems — two true failures
    * among four passes.
    */
  val dqReport: Q = Q(
    "dq_report",
    (s, dir) => {
      import graft.ops.DataQuality
      import DataQuality._
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      DataQuality.run(li, Seq(
        Completeness("l_orderkey"),
        Uniqueness(Seq("l_orderkey", "l_linenumber")),
        InRange("l_discount", 0.0, 0.5),
        InRange("l_quantity", 1.0, 50.0),
        SubsetOf("l_orderkey", o, "o_orderkey", "orders")))
        .unionByName(DataQuality.run(o, Seq(
          SubsetOf("o_orderkey", li, "l_orderkey", "lineitem"))))
    },
    Some("""
      WITH li AS (
        SELECT count(*) AS n, count(l_orderkey) AS c_ok,
               count(DISTINCT (l_orderkey, l_linenumber)) AS u,
               sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS r_disc,
               sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS r_qty
        FROM lineitem),
      ri1 AS (SELECT count(*) AS v
              FROM (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) l
              LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                ON l_orderkey = o_orderkey
              WHERE o_orderkey IS NULL),
      ri2 AS (SELECT count(*) AS v
              FROM (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL) o
              LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
                ON o_orderkey = l_orderkey
              WHERE l_orderkey IS NULL)
      SELECT 'completeness.l_orderkey' AS check_name,
             CAST(c_ok AS DOUBLE) / n AS metric,
             CAST(c_ok AS DOUBLE) / n >= 1.0 AS passed FROM li
      UNION ALL SELECT 'uniqueness.l_orderkey_l_linenumber',
             CAST(u AS DOUBLE) / n, u = n FROM li
      UNION ALL SELECT 'range.l_discount', CAST(r_disc AS DOUBLE), r_disc = 0 FROM li
      UNION ALL SELECT 'range.l_quantity', CAST(r_qty AS DOUBLE), r_qty = 0 FROM li
      UNION ALL SELECT 'subset.l_orderkey_in_orders',
             CAST((SELECT v FROM ri1) AS DOUBLE), (SELECT v FROM ri1) = 0
      UNION ALL SELECT 'subset.o_orderkey_in_lineitem',
             CAST((SELECT v FROM ri2) AS DOUBLE), (SELECT v FROM ri2) = 0
    """)
  )

  val all: Seq[Q] = Seq(q1Pricing, q3TopOrders, orderReconcile, q5RegionRevenue,
    q13CustDist, q18BigOrders, q10Returns, dqReport)
}
