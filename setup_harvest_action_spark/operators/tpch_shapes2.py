"""The remaining TPC-H-shaped composites (r10 late) — Q6/Q8/Q9/Q10/
Q11/Q13/Q15/Q20, completing all 22 decision-support shapes across the
catalog (Q1 `q_pricing_summary`, Q2/Q3/Q5/Q17/Q18/Q21 in aggregates/
joins, Q4/Q7/Q12/Q14/Q16/Q19/Q22 in tpch_shapes.py).

The fixture (TESTDATA.md) has no ``partsupp`` table and no
``l_commitdate``/``c_phone``/comment columns, so the Q9/Q11/Q20
adaptations keep each query's PLAN structure — the optimizer contract
being tested — over the columns that exist, with the substitution
documented per query.  Why these shapes matter at 100 TB:

  * Q6  shape: pure scan-side aggregate — every predicate must push
    into the parquet scan; zero joins, zero shuffles beyond the
    one-row final agg.  The canonical "is pushdown working" probe.
  * Q8  shape: two independent dimension snowflakes (supplier-side
    nation, customer-side nation→region) meeting at the fact, with a
    conditional market-share ratio in ONE aggregate pass.
  * Q9  shape: amount expression spanning fact AND dimension columns
    (profit = revenue − cost), LIKE-filtered part dimension,
    group-by (nation, year).
  * Q10 shape: top-k by aggregate over a 4-table join —
    TakeOrderedAndProject after the agg, never a global sort.
  * Q11 shape: group-by + HAVING against a scalar fraction of the
    GLOBAL sum (scalar subquery → broadcast one-row aggregate).
  * Q13 shape: outer join with a join-condition filter (not a WHERE
    — zero-order customers must survive) followed by a second
    aggregation over the first's result (the distribution-of-counts
    double aggregate).
  * Q15 shape: aggregate-then-argmax — suppliers tying the max
    revenue, the max attached as a broadcast scalar, equality on the
    EXACT decimal so ties are bit-deterministic.
  * Q20 shape: a semi-join CHAIN (supplier ← parts ← qty-thresholded
    shipments) — each hop shrinks multiplicity without ever
    duplicating supplier rows.

Money accumulates in DECIMAL(18,6) (exact at the fixture's ≤ 4
decimal places — the r9 oracle-stability rule: accumulation order
cannot flip the rounded hash); counts cast to BIGINT on both engines.
Reference parity: the reference (harvest.py) is a SPARQL+sqlite
client with no analytic surface — these belong to SURVEY.md §2.2
joins / aggregation / top-k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table

_DEC = "decimal(18,6)"
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (1 - CAST(l_discount AS DECIMAL(18,6)))"
)


def _rev_col():
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )


@query(
    "q_discount_revenue_delta",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS forecast_revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def q_discount_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — the forecasting-revenue-change aggregate, verbatim
    (every column it needs exists in the fixture): one year of
    shipments in a discount band below a quantity cap, summing the
    discounted-away revenue.

    Plan contract: this is the canonical scan-pushdown probe — all
    three predicates (date range, discount band, quantity cap) appear
    in the parquet scan's PushedFilters and only two columns survive
    pruning into the aggregate; no join, no shuffle except the
    one-row final agg.  At 100 TB this query's cost is exactly "read
    the pruned row-groups once"."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    delta = F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(
        _DEC
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(delta), 2)
            .cast("double")
            .alias("forecast_revenue_delta")
        )
    )


@query(
    "q_national_market_share",
    oracle=f"""
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
       CAST(round(
         100.0 * sum(CASE WHEN ns.n_name = 'NATION_2' THEN {_REV_SQL}
                          ELSE CAST(0 AS DECIMAL(18,6)) END)
         / sum({_REV_SQL}), 4) AS DOUBLE) AS mkt_share_pct
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = nc.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY year(o.o_orderdate)
""",
)
def q_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: of the PROMO-part
    revenue sold to ASIA-region customers over two years, what
    fraction came from NATION_2 suppliers, per order year.  (The
    fixture keeps all 8 tables this query needs; only the literals
    are fixture values.)

    Plan contract: TWO independent dimension snowflakes — the
    customer side (customer→nation→region, region filter) and the
    supplier side (supplier→nation) — meet at the lineitem/orders
    fact join; nation and region broadcast explicitly (bounded
    dimensions), part/supplier/customer are left to AQE (broadcast
    at fixture scale, shuffled-hash at 100 TB where customer is a
    fact-sized side), so the only guaranteed data-scale shuffle is
    the fact–fact join on l_orderkey.  Numerator and denominator accumulate in the SAME
    single aggregate pass (CASE inside sum — no self-join, no second
    scan), both in DECIMAL(18,6) so the division sees exact operands
    (the Q14 convention, `q_promo_revenue_ratio`)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    nc = nation.alias("nc")
    ns = nation.alias("ns")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    rev = _rev_col()
    nat_rev = F.when(F.col("ns.n_name") == "NATION_2", rev).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        lineitem.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(nc),
            F.col("nc.n_nationkey") == F.col("c_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("nc.n_regionkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(ns),
            F.col("ns.n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            part.filter(F.col("p_type") == "PROMO"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            F.year("o_orderdate").cast("int").alias("order_year")
        )
        .agg(
            F.round(F.lit(100.0) * F.sum(nat_rev) / F.sum(rev), 4)
            .cast("double")
            .alias("mkt_share_pct")
        )
    )


@query(
    "q_product_type_profit",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(round(sum({_REV_SQL}
             - CAST(p.p_retailprice AS DECIMAL(18,6))
               * CAST(l.l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, year(l.l_shipdate)
""",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-type profit by (supplier nation,
    ship year).  The fixture has no ``partsupp``, so the cost side of
    the profit expression substitutes ``p_retailprice`` for
    ``ps_supplycost`` (documented adaptation); the PLAN structure is
    Q9 verbatim: a LIKE filter on the part dimension, a profit
    amount spanning fact columns (extendedprice, discount, quantity)
    AND a dimension column (retailprice), grouped by a second
    dimension's attribute crossed with a date part.

    Plan contract: the LIKE pushes into the part scan (substring
    filters are parquet-pushable as residuals and prune before the
    join); part/supplier/nation all broadcast; the profit expression
    evaluates post-join inside whole-stage codegen in DECIMAL, so
    accumulation order cannot flip the rounded hash.  One shuffle:
    the final (nation, year) aggregate."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = _rev_col() - (
        F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    )
    return (
        lineitem.join(
            part.filter(F.col("p_name").like("%gear%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


@query(
    "q_returned_items_topk",
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(round(revenue_exact, 2) AS DOUBLE) AS revenue,
       CAST(round(c_acctbal, 2) AS DOUBLE) AS acctbal,
       nation
FROM (
  SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
         sum({_REV_SQL}) AS revenue_exact,
         any_value(c.c_acctbal) AS c_acctbal,
         any_value(n.n_name) AS nation
  FROM customer c
  JOIN orders o   ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1999-10-01'
    AND o.o_orderdate < TIMESTAMP '2000-01-01'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name
)
ORDER BY revenue_exact DESC, c_custkey
LIMIT 20
""",
)
def q_returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: the 20 customers
    who generated the most revenue on returned ('R') lines for orders
    placed in one quarter.

    Plan contract: the returnflag filter pushes into the lineitem
    scan and the quarter window into the orders scan BEFORE the fact
    join; nation broadcasts explicitly, customer by AQE; the top-20 compiles to
    TakeOrderedAndProject over the aggregate (per-partition heaps +
    driver merge of 20-row heads — never a global sort).  Ties at the
    20th row are decided on the EXACT decimal revenue then c_custkey,
    so both engines cut the same set.  At 100 TB the shuffled agg is
    customer-cardinality; the ordered selection is O(k) memory."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1999-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    agg = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(nation),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(_rev_col()).alias("revenue_exact"),
            F.any_value(F.col("c_acctbal")).alias("c_acctbal_raw"),
            F.any_value(F.col("n_name")).alias("nation"),
        )
    )
    return (
        agg.orderBy(F.col("revenue_exact").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("revenue_exact", 2).cast("double").alias("revenue"),
            F.round("c_acctbal_raw", 2).cast("double").alias("acctbal"),
            "nation",
        )
    )


@query(
    "q_important_parts_value",
    oracle=f"""
SELECT part_value.l_partkey AS partkey,
       CAST(round(part_value.val, 2) AS DOUBLE) AS part_value
FROM (
  SELECT l.l_partkey, sum({_REV_SQL}) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
) part_value
WHERE CAST(part_value.val AS DOUBLE) > (
  SELECT 0.002 * CAST(sum({_REV_SQL}) AS DOUBLE)
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
)
""",
)
def q_important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — important stock identification: per-part
    value restricted to one nation's suppliers, keeping parts whose
    value exceeds a FIXED FRACTION of the global (same-filtered) sum.
    The fixture has no ``partsupp``, so value = lineitem revenue
    instead of ``ps_supplycost * ps_availqty`` (documented
    adaptation); the plan contract — group-by + HAVING against a
    scalar subquery over the same relation — is Q11 verbatim.

    Plan contract: ONE aggregation computes the per-part values; the
    global total re-aggregates THOSE (vocabulary-sized) rows rather
    than rescanning lineitem, and attaches as a broadcast one-row
    aggregate (the repo's standard scalar-subquery shape — zero
    driver collects, and one fact scan where the literal SQL writes
    two).  The threshold comparison happens on DOUBLE on both
    engines (exact decimal inputs, identical IEEE product), so the
    cut is bit-deterministic."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_part = (
        lineitem.join(
            F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(_rev_col()).alias("val"))
    )
    total = per_part.agg(
        (F.lit(0.002) * F.sum("val").cast("double")).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("val", 2).cast("double").alias("part_value"),
        )
    )


@query(
    "q_customer_order_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def q_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape — customer order-count distribution: how many
    customers placed exactly N (non-urgent) orders, INCLUDING the
    zero-order customers.  The fixture has no order comment column,
    so the NOT-LIKE comment exclusion becomes a priority exclusion
    (documented adaptation); the plan contract is Q13 verbatim.

    Plan contract: the exclusion predicate lives in the JOIN
    CONDITION, not a WHERE — a WHERE after a left join would silently
    drop the zero-order customers that are the point of the query
    (count(o_orderkey) counts only matched rows, so they aggregate to
    0).  The orders side filters BEFORE the join; the first aggregate
    shuffles at customer cardinality, the second at distinct-count
    cardinality (tiny).  The double aggregation reuses the first
    shuffle's partitioning where AQE allows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@query(
    "q_top_supplier_revenue",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, sum({_REV_SQL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
    AND l_shipdate < TIMESTAMP '1999-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
       CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — top supplier(s) by one quarter's revenue,
    verbatim: the revenue "view" aggregates shipments per supplier,
    and the outer query keeps every supplier TYING the maximum (the
    spec deliberately returns all ties, not LIMIT 1).

    Plan contract: the quarter window pushes into the ONE lineitem
    scan; the revenue view materializes once in the plan and serves
    both the max (re-aggregated from supplier-cardinality rows,
    attached as a broadcast one-row aggregate) and the equality
    filter — the literal SQL's two view references collapse to one.
    Equality is on the EXACT DECIMAL(18,6) total, so revenue ties
    are bit-deterministic on both engines — never compare rounded
    doubles for an argmax cut.  Supplier joins by broadcast."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_col()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2)
            .cast("double")
            .alias("total_revenue"),
        )
    )


@query(
    "q_promotable_suppliers",
    oracle="""
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_1'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%widget%'
      AND l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > 40)
""",
)
def q_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — potential part promotion: NATION_1 suppliers
    who shipped more than a threshold quantity (40) of some widget-named
    part during 1998.  The fixture has no ``partsupp``, so the
    "excess of half the available quantity" threshold becomes a fixed
    quantity threshold over the same (suppkey, partkey) grain
    (documented adaptation); the nested semi-join CHAIN — supplier ←
    qualifying (supplier, part) pairs ← LIKE-filtered parts — is Q20
    verbatim.

    Plan contract: the LIKE filter prunes part BEFORE the fact join;
    the HAVING aggregate runs at (suppkey, partkey) grain, then
    collapses to a distinct supplier set that drives a LEFT-SEMI join
    — supplier rows are never multiplied by their qualifying parts
    (an inner join would need a distinct and shuffle supplier ×
    parts rows).  Quantity sums are integer-valued doubles — exact
    under IEEE summation in any order (< 2^53), so the HAVING cut is
    engine-stable."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    qualifying = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(
            part.filter(F.col("p_name").like("%widget%")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            qualifying,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )
