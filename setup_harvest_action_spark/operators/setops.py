"""Set operations: union / unionByName / intersect(All) / except(All).

Absent from the reference (SURVEY.md §2.3); §2.2 north-star breadth.

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions.
Every *distinct* set op (UNION, INTERSECT, EXCEPT) plans as a shuffle
on the full row — fine on narrow projections, an anti-pattern on wide
rows; all queries here project to narrow key sets first, which is the
shape that survives 100 TB.  INTERSECT ALL / EXCEPT ALL add a per-row
count aggregate (bag semantics) — same shuffle, one extra count column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table


def _seg(spark: SparkSession, sf_dir: str, segment: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == segment)
        .select("c_custkey", "c_nationkey")
    )


@query(
    "q_setop_union_all",
    oracle="""
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
""",
)
def q_setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — partition concatenation, no shuffle, no dedup."""
    return _seg(spark, sf_dir, "BUILDING").union(_seg(spark, sf_dir, "MACHINERY"))


@query(
    "q_setop_union_distinct",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — concat + hash-aggregate dedup on the key."""
    orders = load_table(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.union(done).distinct()


@query(
    "q_setop_union_by_name",
    oracle="""
SELECT c_custkey AS custkey, CAST(c_acctbal AS DOUBLE) AS balance, 'customer' AS side
FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT s_suppkey AS custkey, CAST(s_acctbal AS DOUBLE) AS balance, 'supplier' AS side
FROM supplier WHERE s_acctbal > 9000
""",
)
def q_setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName — schema aligned by column NAME, not position; the
    two inputs deliberately build their columns in different orders."""
    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("balance"),
            F.lit("customer").alias("side"),
        )
    )
    supplier = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(  # different column order on purpose
            F.lit("supplier").alias("side"),
            F.col("s_suppkey").alias("custkey"),
            F.col("s_acctbal").alias("balance"),
        )
    )
    return customer.unionByName(supplier)


@query(
    "q_setop_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — customers with both an open and a finished order."""
    orders = load_table(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(done)


@query(
    "q_setop_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
)
def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set semantics) — open-order customers with no
    pending order.  ``subtract`` is Spark's EXCEPT DISTINCT; it removes
    a key entirely if it appears on the right at all, unlike
    ``exceptAll`` which only subtracts multiplicities."""
    orders = load_table(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    pend = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return open_.subtract(pend)


@query(
    "q_setop_intersect_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: min(multiplicity) copies kept."""
    orders = load_table(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    done = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return open_.intersectAll(done)


@query(
    "q_setop_except_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
""",
)
def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: multiplicity-subtracting difference."""
    orders = load_table(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    pend = orders.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return open_.exceptAll(pend)
