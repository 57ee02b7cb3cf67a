"""Slowly-changing-dimension (SCD Type 2) merge: attribute history
with validity intervals.

The reference's load path is SCD Type 1 — updates overwrite in place,
only ``updated_at`` advances (`/root/reference/harvest.py:332-338`).
Type 2 is the warehouse-standard alternative a translation-workflow
store would need to audit WHO saw WHICH definition WHEN: a changed
attribute closes the current version row (``valid_to`` stamped) and
appends a new open one, so every historical state stays queryable
with a ``valid_to IS NULL`` / as-of predicate.

The catalog query applies one deterministic update batch to the
``customer`` dimension: rows whose md5 hex-prefix falls under
``UPDATE_BUCKET`` get a new ``c_mktsegment``.  Hash membership makes
the batch a pure function of the key — bit-identical in DuckDB, so
the whole merge (close + insert + passthrough) is exactly oracled.

At scale this is ONE equi-join keyed by the business key plus a
union: the update batch (daily deltas, far smaller than the
dimension) is broadcast; the dimension side is scanned once and never
shuffled.  Delta Lake expresses the same thing as two MERGE branches;
this is the engine-portable algebra underneath.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table

UPDATE_BUCKET = "20"  # md5 hex-prefix < '20' -> in the update batch
V0 = "2024-01-01"  # initial load date
V1 = "2024-06-01"  # update-batch arrival date
NEW_SEGMENT = "RELOCATED"


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attr: str,
    change_date,
) -> DataFrame:
    """Merge ``updates`` (one row per key: ``key``, ``attr``) into the
    open versions of ``current`` (``key``, ``attr``, ``valid_from``,
    ``valid_to``): a changed attribute closes the open row at
    ``change_date`` and appends a new open row; unchanged and
    untouched rows pass through.  Closed history rows must be filtered
    out by the caller if ``current`` carries them (they never change).

    The update side is broadcast — deltas are small by construction;
    the dimension is scanned once, left-joined, and unioned."""
    u = F.broadcast(
        updates.select(
            F.col(key), F.col(attr).alias("__new_attr")
        )
    )
    joined = current.join(u, key, "left")
    changed = F.col("__new_attr").isNotNull() & (
        F.col("__new_attr") != F.col(attr)
    )
    passthrough = joined.filter(~changed).drop("__new_attr")
    closed = (
        joined.filter(changed)
        .withColumn("valid_to", F.lit(change_date).cast("date"))
        .drop("__new_attr")
    )
    opened = (
        joined.filter(changed)
        .withColumn(attr, F.col("__new_attr"))
        .withColumn("valid_from", F.lit(change_date).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .drop("__new_attr")
    )
    return passthrough.unionByName(closed).unionByName(opened)


@query(
    "q_scd2_customer_segment",
    oracle=f"""
WITH current AS (
  SELECT c_custkey, c_mktsegment,
         DATE '{V0}' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM customer
),
updates AS (
  SELECT c_custkey, '{NEW_SEGMENT}' AS c_mktsegment
  FROM customer
  WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < '{UPDATE_BUCKET}'
    AND c_mktsegment <> '{NEW_SEGMENT}'
),
joined AS (
  SELECT c.*, u.c_mktsegment AS new_attr
  FROM current c LEFT JOIN updates u USING (c_custkey)
)
SELECT c_custkey, c_mktsegment, valid_from, valid_to
FROM joined WHERE new_attr IS NULL
UNION ALL
SELECT c_custkey, c_mktsegment, valid_from, DATE '{V1}' AS valid_to
FROM joined WHERE new_attr IS NOT NULL
UNION ALL
SELECT c_custkey, new_attr AS c_mktsegment, DATE '{V1}' AS valid_from,
       CAST(NULL AS DATE) AS valid_to
FROM joined WHERE new_attr IS NOT NULL
""",
)
def q_scd2_customer_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 over ``customer.c_mktsegment``: a deterministic
    ~12.5% update batch (md5 hex-prefix) relocates segments; changed
    keys get their open version closed at {V1} and a new open version
    appended, everyone else passes through.  Output rows =
    |dimension| + |changed keys|, each with a validity interval."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.lit(V0).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    updates = (
        load_table(spark, sf_dir, "customer")
        .filter(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2)
            < UPDATE_BUCKET
        )
        .select("c_custkey", F.lit(NEW_SEGMENT).alias("c_mktsegment"))
    )
    return scd2_merge(cust, updates, "c_custkey", "c_mktsegment", V1)


PIT_V0 = "1990-01-01"  # history epoch for the point-in-time query
PIT_V1 = "1998-01-01"  # segment relocation date (mid orders range)


@query(
    "q_scd2_point_in_time",
    oracle=f"""
WITH current AS (
  SELECT c_custkey, c_mktsegment,
         DATE '{PIT_V0}' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM customer
),
updates AS (
  SELECT c_custkey, '{NEW_SEGMENT}' AS c_mktsegment
  FROM customer
  WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < '{UPDATE_BUCKET}'
    AND c_mktsegment <> '{NEW_SEGMENT}'
),
joined AS (
  SELECT c.*, u.c_mktsegment AS new_attr
  FROM current c LEFT JOIN updates u USING (c_custkey)
),
history AS (
  SELECT c_custkey, c_mktsegment, valid_from, valid_to
  FROM joined WHERE new_attr IS NULL
  UNION ALL
  SELECT c_custkey, c_mktsegment, valid_from, DATE '{PIT_V1}' AS valid_to
  FROM joined WHERE new_attr IS NOT NULL
  UNION ALL
  SELECT c_custkey, new_attr, DATE '{PIT_V1}', CAST(NULL AS DATE)
  FROM joined WHERE new_attr IS NOT NULL
)
SELECT h.c_mktsegment AS segment_at_order,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS total_price
FROM orders o
JOIN history h
  ON h.c_custkey = o.o_custkey
 AND o.o_orderdate >= h.valid_from
 AND (h.valid_to IS NULL OR o.o_orderdate < CAST(h.valid_to AS TIMESTAMP))
GROUP BY h.c_mktsegment
""",
)
def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join over the SCD2 history — the feature-store
    temporal-correctness primitive: each order resolves the customer
    segment that was valid AT its order date, not the current one
    (training a model on current attributes is label leakage; this
    join is the fix).  The history places the relocation at
    {PIT_V1}, mid order-date range, so orders genuinely split across
    versions.

    Plan shape: an EQUI-join on the business key with the validity
    interval as a residual filter — each key carries at most
    (1 + changes) version rows, so key multiplicity is bounded by
    update frequency and the join never degenerates to an interval
    cartesian; the history side (dimension-sized) broadcasts or
    shuffles by key like any dimension.  Totals accumulate in
    DECIMAL(18,6).  Contrast with `q_join_asof`: as-of picks the
    nearest past event via union+window (one Exchange, no join);
    point-in-time picks the COVERING interval via join — the right
    tool when versions are materialized as rows."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.lit(PIT_V0).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    updates = (
        load_table(spark, sf_dir, "customer")
        .filter(
            (
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2)
                < UPDATE_BUCKET
            )
            & (F.col("c_mktsegment") != NEW_SEGMENT)
        )
        .select("c_custkey", F.lit(NEW_SEGMENT).alias("c_mktsegment"))
    )
    history = scd2_merge(cust, updates, "c_custkey", "c_mktsegment", PIT_V1)
    orders = load_table(spark, sf_dir, "orders")
    h = history.select(
        F.col("c_custkey").alias("h_custkey"),
        F.col("c_mktsegment").alias("segment_at_order"),
        "valid_from",
        "valid_to",
    )
    return (
        orders.join(
            h,
            (F.col("h_custkey") == F.col("o_custkey"))
            & (F.col("o_orderdate") >= F.col("valid_from").cast("timestamp"))
            & (
                F.col("valid_to").isNull()
                | (F.col("o_orderdate") < F.col("valid_to").cast("timestamp"))
            ),
        )
        .groupBy("segment_at_order")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_price"),
        )
    )
