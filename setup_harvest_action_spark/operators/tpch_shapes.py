"""Additional TPC-H-shaped composite queries (r10) — the decision-
support shapes not yet covered by the catalog's Q2/Q3/Q5/Q17/Q18/Q21
family, adapted to the fixture's columns (TESTDATA.md; the fixture
lacks l_commitdate/l_receiptdate/p_container/c_phone, so each shape
keeps its PLAN structure — the thing being tested — over the columns
that exist).

Why these matter at 100 TB: each exercises a distinct optimizer
contract —

  * Q4  shape: EXISTS → left-semi with a cross-side inequality
  * Q7  shape: a 6-table snowflake with two aliases of one dimension
  * Q12 shape: conditional two-way aggregate (CASE inside sum)
  * Q14 shape: conditional-ratio aggregate (one pass, no self-join)
  * Q16 shape: count(DISTINCT) + NOT-IN anti-join on the fact side
  * Q19 shape: disjunctive OR-of-ANDs predicate spanning both join
    sides (must evaluate post-join without degenerating to a
    cartesian; per-clause scan filters still push down)
  * Q22 shape: scalar subquery (global aggregate) + anti-join

Revenue sums accumulate in DECIMAL(18,6) — exact at the fixture's
≤ 4 decimal places, so accumulation ORDER cannot flip the rounded
hash (the r9 oracle-stability rule); counts cast to BIGINT on both
engines.  Reference parity: the reference's engine is a SPARQL+sqlite
client (harvest.py) with no analytic surface — these shapes belong to
the north-star extension categories (SURVEY.md §2.2 joins /
aggregation).
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
    "q_priority_late_ship",
    oracle="""
SELECT o.o_orderpriority AS orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
)
def q_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS as a LEFT-SEMI join whose condition
    spans both sides (key equality + ship-date 60 days past the order
    date, standing in for the fixture-absent commit/receipt pair):
    orders in one year counted by priority when at least one line
    shipped late.

    Plan contract: the date window pushes into the orders scan; the
    semi-join keeps orders-side row multiplicity (a 7-line late order
    counts ONCE — a plain inner join would need a distinct); the
    inequality rides the same hash join on l_orderkey, never a
    cartesian.  Reference: this is O5's OPTIONAL-existence semantics
    (harvest.py:84-101) inverted into a filter."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    late = o.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy(
        F.col("o_orderpriority").alias("orderpriority")
    ).agg(F.count(F.lit(1)).cast("long").alias("order_count"))


@query(
    "q_bilateral_trade",
    oracle=f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
""",
)
def q_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — the 6-table snowflake with TWO ALIASES of one
    dimension: lineitem resolves its supplier's nation and (through
    orders → customer) its customer's nation, keeping only the
    NATION_1↔NATION_2 pairs (the fixture's synthetic nation names), revenue by (supp_nation, cust_nation,
    ship year).

    Plan contract: nation is broadcast TWICE under different aliases
    (self-join of a dimension never shuffles the fact side); the
    nation-pair disjunction applies after both lookups; the fact
    table is scanned once and flows through hash joins keyed on its
    own columns — at 100 TB the only shuffles are orders⋈lineitem
    and the final partial/final aggregate, everything else
    broadcast."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        lineitem.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(F.round(F.sum(_rev_col()), 2).cast("double").alias("revenue"))
    )


@query(
    "q_lineitem_priority_matrix",
    oracle="""
SELECT l.l_linestatus AS linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
  AND l.l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l.l_linestatus
""",
)
def q_lineitem_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — the conditional TWO-WAY aggregate: one pass
    over a date-windowed orders⋈lineitem join producing urgent/other
    counts per line status (the fixture carries no l_shipmode, so
    l_linestatus keys the matrix; the CASE-inside-sum plan shape is
    the point).  One join, one aggregate, both counts computed in the
    same partial-aggregation pass — never two scans or a pivot
    shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@query(
    "q_promo_revenue_ratio",
    oracle=f"""
SELECT CAST(round(
         100.0 * sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                          ELSE CAST(0 AS DECIMAL(18,6)) END)
         / sum({_REV_SQL}), 4) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1999-01-01'
  AND l.l_shipdate < TIMESTAMP '1999-07-01'
""",
)
def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — the conditional-RATIO aggregate: promo share
    of revenue in one window, numerator and denominator accumulated in
    the SAME single-pass aggregate (CASE inside one sum, no self-join,
    no second scan).  Both sums run in DECIMAL(18,6) so the division
    sees exact operands; one broadcast join (part is the dimension),
    one partial/final agg, one output row."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _rev_col()
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-07-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo_rev) / F.sum(rev), 4)
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@query(
    "q_part_supplier_diversity",
    oracle="""
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 10 AND p.p_type <> 'PROMO'
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — count(DISTINCT) with a NOT-IN exclusion:
    distinct suppliers per (brand, type, size) over small non-promo
    parts, excluding "complained-about" suppliers (negative account
    balance stands in for the fixture-absent comments column).

    Plan contract: the NOT IN becomes a LEFT-ANTI join against the
    (tiny, broadcast) bad-supplier set applied on the FACT side
    before the expensive distinct aggregate; the part predicates push
    into the dimension scan; count(DISTINCT) plans as the two-level
    partial-distinct aggregate, never a driver-side set."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(
                part.filter(
                    (F.col("p_size") <= 10) & (F.col("p_type") != "PROMO")
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "q_disjunctive_revenue",
    oracle=f"""
SELECT CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 5 AND 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 10 AND 40)
""",
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — the DISJUNCTIVE predicate spanning both join
    sides: three OR'd (brand, size-range, quantity-range) clauses
    where brand/size live on part and quantity on lineitem.

    Plan contract: the join stays a hash equi-join on partkey with
    the OR evaluated as a post-join filter (never a nested-loop on
    the disjunction), while the per-side IMPLIED predicates —
    p_brand ∈ {{three brands}}, l_quantity ∈ [1, 40] — are what an
    optimizer can push to the scans; the aggregate is a single
    DECIMAL sum."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(5, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(10, 40)
        )
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        .agg(F.round(F.sum(_rev_col()), 2).cast("double").alias("revenue"))
    )


@query(
    "q_dormant_rich_customers",
    oracle="""
SELECT c.c_nationkey AS nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(c.c_acctbal), 2) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_nationkey
""",
)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar subquery + anti-join: customers whose
    balance exceeds the positive-balance average (a GLOBAL scalar
    aggregate) and who placed no order since 2000 (NOT EXISTS →
    left-anti on the date-filtered orders), grouped by nation.

    Plan contract: the scalar average is ONE tiny aggregate attached
    via crossJoin(broadcast(...)) — the repo's standard
    scalar-subquery shape, zero driver collects; the anti-join's
    right side is date-pruned BEFORE the join so the probe set is the
    recent slice, not the full history.  The fixture has no c_phone,
    so nationkey replaces the country-code substring; every other
    plan element is Q22 verbatim."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).cast("double").alias("totacctbal"),
        )
    )
