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


@query(
    "q_table_diff",
    oracle="""
WITH old AS (
  SELECT o_orderkey, round(o_totalprice, 2) AS price
  FROM orders WHERE o_orderkey % 7 <> 0
),
new AS (
  SELECT o_orderkey,
         round(o_totalprice, 2)
         + CASE WHEN o_orderkey % 3 = 0 THEN 1000.0 ELSE 0.0 END AS price
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'added'
            WHEN new.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       CAST(old.price AS DOUBLE) AS old_price,
       CAST(new.price AS DOUBLE) AS new_price
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
   OR old.price <> new.price
""",
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the CDC/reconciliation primitive: classify every
    key across two table versions as added / removed / changed
    (unchanged rows are suppressed, so the result is delta-sized, not
    table-sized).  The two versions here derive deterministically from
    the orders fixture (disjoint key filters + a price bump) so both
    engines diff identical inputs.

    One full-outer shuffle join on the key is the whole cost; on
    bucketed/co-partitioned snapshots (io/layout, harvest/bucketed) it
    runs exchange-free.  The value comparison happens on rounded
    prices on BOTH sides — the shared-precision boundary rule used
    throughout (semantic dedup, kmeans)."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("old_price")
    )
    new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("new_key"),
        (
            F.round("o_totalprice", 2)
            # additive bump, not multiplicative: a *1.1 product lands on
            # half-cent rounding boundaries that Spark and DuckDB break
            # in different directions; adding an integer constant to the
            # already-rounded value is exact in both engines
            + F.when(F.col("o_orderkey") % 3 == 0, 1000.0).otherwise(0.0)
        ).alias("new_price"),
    )
    joined = old.join(
        new, old["o_orderkey"] == new["new_key"], "full_outer"
    )
    change = (
        F.when(old["o_orderkey"].isNull(), "added")
        .when(new["new_key"].isNull(), "removed")
        .otherwise("changed")
    )
    return (
        joined.filter(
            old["o_orderkey"].isNull()
            | new["new_key"].isNull()
            | (F.col("old_price") != F.col("new_price"))
        )
        .select(
            F.coalesce(old["o_orderkey"], new["new_key"]).alias("o_orderkey"),
            change.alias("change"),
            "old_price",
            "new_price",
        )
    )
