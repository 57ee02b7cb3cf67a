"""Core relational read path — the reference's query semantics on fixtures.

The reference's entire read side is one SPARQL SELECT (reference:
harvest.py:54-87): DISTINCT projection (O3), membership equi-filter
(O4), three OPTIONAL patterns = left outer joins (O5), ORDER BY (O6),
LIMIT/OFFSET pagination (O7).  ``q_harvest_read_path`` reproduces that
exact operator composition on the TPC-H-ish fixtures; the rest of this
module covers the scan/filter/project primitives it builds on.

Scale notes: dimension joins (nation, region) are explicit
``broadcast()``; fact-fact joins shuffle on their keys and AQE picks
SMJ vs broadcast at runtime.  LIMIT/OFFSET pagination is kept as a
compat shim — at 100 TB you process the whole DataFrame partitioned,
you don't paginate (SURVEY.md §2 O7).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table


@query(
    "q_harvest_read_path",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_orderstatus, o_totalprice
FROM (
    SELECT DISTINCT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderstatus,
                    o.o_totalprice
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
)
ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST
LIMIT 1000 OFFSET 500
""",
)
def q_harvest_read_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's read path (O3-O7) re-expressed.

    DISTINCT projection over an OPTIONAL (left outer) join, globally
    ordered, paginated with LIMIT/OFFSET — exactly the operator stack
    of the harvest SELECT (reference: harvest.py:74-87), with
    customer⋈orders standing in for concept⋈prefLabel.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return (
        joined.select("c_custkey", "c_name", "o_orderkey", "o_orderstatus", "o_totalprice")
        .distinct()
        .orderBy(F.asc_nulls_first("c_custkey"), F.asc_nulls_first("o_orderkey"))
        .offset(500)
        .limit(1000)
    )


@query(
    "q_filter_project",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       o_totalprice * 0.5 AS half_price
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0
""",
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filter + computed projection (O4/O9 analogue).

    Both predicates reach the parquet scan as PushedFilters; the scan
    reads only the 4 referenced columns (check ``ReadSchema``).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 1000.0))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            (F.col("o_totalprice") * 0.5).alias("half_price"),
        )
    )


@query(
    "q_regex_filter",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE regexp_matches(c_name, '.*[02468]$') AND c_mktsegment IN ('BUILDING', 'MACHINERY')
""",
)
def q_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate — the reference's URI validation as a column op
    (reference: harvest.py:28-51, regex at :42)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(
        F.col("c_name").rlike(".*[02468]$")
        & F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_distinct_projection",
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders
""",
)
def q_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a narrow projection (O3; reference: harvest.py:74).

    Plans as a partial/final hash aggregate — map-side combine first,
    so the shuffle carries only distinct pairs per partition.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "q_count_distinct_members",
    oracle="""
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS member_count
FROM orders
WHERE o_orderstatus <> 'P'
""",
)
def q_count_distinct_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar COUNT(DISTINCT) pre-query — the loop-sizing count the
    reference ships to the endpoint (O2; reference: harvest.py:90-113,
    agg at :97)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") != "P")
        .select(F.count_distinct("o_custkey").alias("member_count"))
    )


@query(
    "q_parameterized_sql",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_totalprice > 250000.0
GROUP BY o_orderstatus
""",
)
def q_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized-SQL front door (O10, fixed): named parameters are
    bound AFTER parsing (`spark.sql(text, args=...)`), removing the
    injection class the reference's f-string interpolation carries
    (reference: harvest.py:54-87).  The oracle inlines the same
    values."""
    from setup_harvest_action_spark.sql_api import register_fixture_views, run_sql

    register_fixture_views(spark, sf_dir)
    return run_sql(
        spark,
        """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice > :min_price
        GROUP BY o_orderstatus
        """,
        {"cutoff": "1996-01-01 00:00:00", "min_price": 250000.0},
    )


@query(
    "q_pagination_page",
    oracle="""
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderkey NULLS FIRST
LIMIT 1000 OFFSET 2000
""",
)
def q_pagination_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One LIMIT/OFFSET page over a global sort (O6+O7; reference:
    harvest.py:81-87, page loop at :405-416).  Kept as a compat shim —
    the at-scale idiom is partitioned whole-table processing."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.asc_nulls_first("o_orderkey"))
        .offset(2000)
        .limit(1000)
    )


@query(
    "q_pagination_keyset",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_custkey > 700
ORDER BY c_custkey
LIMIT 100
""",
)
def q_pagination_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination — the scale idiom the OFFSET shim
    (q_pagination_page) should be traded for at 100 TB: the cursor is
    the last key of the previous page, so the predicate pushes into the
    parquet scan (row groups below the cursor are never read) and the
    sort+limit compiles to TakeOrderedAndProject — a per-partition
    top-k merged on the driver, O(k) memory, no global sort, no
    single-partition offset gather."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_custkey") > 700)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
        .limit(100)
    )
