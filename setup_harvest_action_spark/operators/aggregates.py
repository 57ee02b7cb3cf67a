"""Aggregation operators: hash aggregates, multi-dim grouping, approx sketches.

All plain ``groupBy().agg()`` — Catalyst plans these as partial
(map-side combine) + final hash aggregates, so the shuffle carries one
row per (partition × group), not per input row.  That is the property
that makes these queries survive a 100× scale-up: shuffle volume is
bounded by group cardinality.

Floating aggregates are rounded to a fixed scale on BOTH the Spark and
oracle side so accumulation order cannot flip the value hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.operators.ranked import ranked_ntile


@query(
    "q_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(round(sum(l_quantity), 2) AS DOUBLE)       AS sum_qty,
       CAST(round(sum(l_extendedprice), 2) AS DOUBLE)  AS sum_base_price,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS DOUBLE) AS sum_charge,
       CAST(round(avg(l_quantity), 4) AS DOUBLE)       AS avg_qty,
       CAST(round(avg(l_extendedprice), 4) AS DOUBLE)  AS avg_price,
       CAST(round(avg(l_discount), 4) AS DOUBLE)       AS avg_disc,
       count(*)                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical partial/final hash
    aggregate.  Group cardinality is 6 (3 returnflags × 2 linestatuses),
    so the final shuffle is 6 rows per map partition regardless of SF."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_revenue_by_nation",
    oracle="""
SELECT n.n_name AS nation,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
""",
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup: fact-fact shuffle join (lineitem⋈orders) plus
    dimension joins.  Only the true dimensions (nation 25 rows, region
    5 rows) are force-broadcast; customer scales with the fact tables,
    so its join is left to AQE — broadcast when it turns out small,
    shuffle join at 100 TB.  The region filter is applied before the
    join so the broadcast side is pre-pruned."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    ).select("c_custkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_rollup_order_stats",
    oracle="""
SELECT o_orderstatus,
       o_orderpriority,
       CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def q_rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — hierarchical subtotals (status, status×priority, grand
    total) in one pass; Spark expands grouping sets before the hash agg."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "q_cube_lineitem_flags",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^2 grouping-set combinations in one aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_grouping_sets",
    oracle="""
SELECT o_orderstatus,
       o_orderpriority,
       count(*) AS n_orders,
       CAST(round(avg(o_totalprice), 4) AS DOUBLE) AS avg_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent group-bys in one scan."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "q_approx_count_distinct",
    oracle="""
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
       abs(approx_count_distinct(o_custkey)
           - count(DISTINCT o_custkey))
         <= 0.06 * count(DISTINCT o_custkey) AS approx_ok
FROM orders
""",
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct sketch — the at-scale replacement for the
    reference's exact COUNT(DISTINCT) sizing query (O2) when a ±2%
    answer is enough to plan with.

    Sketch values differ across engines, so the hash oracle asserts
    the SKETCH CONTRACT instead of the value: each engine emits its
    exact distinct count (hash-compared as a real value) plus a
    boolean that its own HLL estimate lands within 3×rsd (6%) of that
    exact count — Spark's ±2% HLL++ and DuckDB's HLL both clear it
    with margin, and a drifting sketch flips the boolean and fails the
    gate.  The exact count rides the same scan (one extra shuffle-free
    partial aggregate), so promoting the oracle costs no second corpus
    pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count_distinct("o_custkey").alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.02)
                - F.count_distinct("o_custkey")
            )
            <= 0.06 * F.count_distinct("o_custkey")
        ).alias("approx_ok"),
    )


@query(
    "q_agg_minmax_stats",
    oracle="""
SELECT l_returnflag,
       CAST(min(l_quantity) AS DOUBLE)  AS min_qty,
       CAST(max(l_quantity) AS DOUBLE)  AS max_qty,
       CAST(round(stddev_samp(l_quantity), 4) AS DOUBLE) AS std_qty,
       CAST(min(l_shipdate) AS TIMESTAMP) AS first_ship,
       CAST(max(l_shipdate) AS TIMESTAMP) AS last_ship
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/stddev over numeric + timestamp columns in one hash agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "q_agg_pivot",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(coalesce(count(*) FILTER (o_orderstatus = 'F'), 0) AS BIGINT) AS n_f,
       CAST(coalesce(count(*) FILTER (o_orderstatus = 'O'), 0) AS BIGINT) AS n_o,
       CAST(coalesce(count(*) FILTER (o_orderstatus = 'P'), 0) AS BIGINT) AS n_p
FROM orders
GROUP BY year(o_orderdate)
""",
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide, the inverse of O12's unpivot — SURVEY.md §2.2):
    order counts per year with one column per order status.

    The pivot values are an EXPLICIT list: without it Spark runs an
    extra distinct-scan job to discover them, and the output schema
    becomes data-dependent — both wrong at 100 TB.  With the list the
    plan is a single partial/final hash aggregate (pivot compiles to
    `count(CASE WHEN status = v THEN 1 END)` per value, exactly the
    oracle's FILTER form); absent combinations surface as null and are
    coalesced to 0 like SQL's FILTER-count."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_year",
        *[
            F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}")
            for s in ("F", "O", "P")
        ],
    )


@query(
    "q_agg_percentiles",
    oracle="""
SELECT l_returnflag,
       CAST(round(quantile_cont(l_extendedprice, 0.25), 4) AS DOUBLE) AS p25,
       CAST(round(quantile_cont(l_extendedprice, 0.50), 4) AS DOUBLE) AS p50,
       CAST(round(quantile_cont(l_extendedprice, 0.95), 4) AS DOUBLE) AS p95
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation — Spark `percentile`
    ≡ DuckDB `quantile_cont`).  Exact percentile is a full-sort-per-
    group aggregate: fine as ground truth, the sketch below is the
    100 TB path."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95"),
    )


APPROX_Q_WINDOW = 0.002  # ±rank window, 20× the sketch's 1e-4 bound


@query(
    "q_agg_approx_quantiles",
    oracle=f"""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25)
         BETWEEN quantile_cont(l_extendedprice, {0.25 - APPROX_Q_WINDOW})
             AND quantile_cont(l_extendedprice, {0.25 + APPROX_Q_WINDOW})
         AS p25_ok,
       quantile_cont(l_extendedprice, 0.50)
         BETWEEN quantile_cont(l_extendedprice, {0.50 - APPROX_Q_WINDOW})
             AND quantile_cont(l_extendedprice, {0.50 + APPROX_Q_WINDOW})
         AS p50_ok,
       quantile_cont(l_extendedprice, 0.95)
         BETWEEN quantile_cont(l_extendedprice, {0.95 - APPROX_Q_WINDOW})
             AND quantile_cont(l_extendedprice, {0.95 + APPROX_Q_WINDOW})
         AS p95_ok,
       CAST(round(quantile_cont(l_extendedprice, 0.25), 2) AS DOUBLE)
         AS p25_exact,
       CAST(round(quantile_cont(l_extendedprice, 0.50), 2) AS DOUBLE)
         AS p50_exact,
       CAST(round(quantile_cont(l_extendedprice, 0.95), 2) AS DOUBLE)
         AS p95_exact
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via the KLL-style percentile_approx sketch
    (Greenwald-Khanna variant): mergeable per-partition summaries, so
    the shuffle carries one bounded sketch per group instead of every
    value — the only viable shape at 100 TB, where exact percentile
    means sorting the full column per group.

    accuracy=10000 bounds rank error at 1/10000; sketch VALUES differ
    across engines, so the hash oracle asserts the contract: each
    engine emits per-group booleans that its own pNN estimate lies
    inside its own exact [p−0.002, p+0.002] rank window (20× the
    bound).  Spark checks the GK sketch against F.percentile's exact
    interpolated values; DuckDB checks quantile_cont against itself.

    The DuckDB booleans alone would be vacuously true (quantile_cont
    is monotone in p), so the query ALSO emits the exact interpolated
    percentile VALUES (rounded to cents) from both engines — Spark's
    F.percentile vs DuckDB's quantile_cont share the rank = p·(n−1)
    linear-interpolation definition, so the hash pins the exact
    ground truth while the booleans pin the sketch contract
    (tests/test_aggregates.py keeps the per-rank assertion)."""
    li = load_table(spark, sf_dir, "lineitem")

    def ok(p: float) -> Column:
        approx = F.percentile_approx(
            "l_extendedprice", F.lit(p), F.lit(10000)
        )
        return approx.between(
            F.percentile("l_extendedprice", F.lit(p - APPROX_Q_WINDOW)),
            F.percentile("l_extendedprice", F.lit(p + APPROX_Q_WINDOW)),
        )

    def exact(p: float) -> Column:
        return F.round(
            F.percentile("l_extendedprice", F.lit(p)), 2
        ).cast("double")

    return li.groupBy("l_returnflag").agg(
        ok(0.25).alias("p25_ok"),
        ok(0.50).alias("p50_ok"),
        ok(0.95).alias("p95_ok"),
        exact(0.25).alias("p25_exact"),
        exact(0.50).alias("p50_exact"),
        exact(0.95).alias("p95_exact"),
    )


@query(
    "q_agg_hll_partitioned",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         <= 0.06 * count(DISTINCT user_id) AS approx_ok
FROM events GROUP BY event_type
UNION ALL
SELECT '__all__' AS event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         <= 0.06 * count(DISTINCT user_id) AS approx_ok
FROM events
""",
)
def q_agg_hll_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — the pattern that replaces
    COUNT(DISTINCT) at 100 TB: build one HLL sketch per partition key
    (here event_type), and derive the GLOBAL distinct count by merging
    the per-group sketches (``hll_union_agg``) — five tiny binary blobs
    — instead of re-shuffling the raw corpus a second time.  In a real
    pipeline the per-day/per-shard sketches land in a stats table and
    any rollup (weekly, global, per-segment) is a union of blobs.

    SKETCH-CONTRACT oracle (promoted r9 from the gate-scale-only
    exact oracle): each engine emits exact COUNT(DISTINCT) per key —
    hash-compared as real values — plus a boolean that its OWN sketch
    estimate (including the '__all__' row derived by MERGING the
    per-key sketches, the operation under test) lands within 6% of
    that exact count.  Green at sf0.01 AND sf0.1 (where the old
    oracle broke: 1500 distinct estimated ~1488, outside the sparse-
    exact regime); the 2%-at-sf0.1 tolerance pytest stays as the
    tighter self-check."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    ok = lambda est: (
        F.abs(est - F.col("n_exact")) <= 0.06 * F.col("n_exact")
    )
    by_type = per.select(
        "event_type",
        "n_exact",
        ok(F.hll_sketch_estimate("sk")).alias("approx_ok"),
    )
    merged = (
        per.agg(
            F.hll_union_agg("sk").alias("sk"),
        )
        .crossJoin(
            F.broadcast(
                ev.agg(F.count_distinct("user_id").alias("n_exact"))
            )
        )
        .select(
            F.lit("__all__").alias("event_type"),
            "n_exact",
            ok(F.hll_sketch_estimate("sk")).alias("approx_ok"),
        )
    )
    return by_type.unionByName(merged)


SHIP_PRIORITY_TOP = 10


@query(
    "q_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey AS orderkey,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE)
           AS revenue,
       o.o_orderdate AS orderdate,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderdate, orderkey
LIMIT {SHIP_PRIORITY_TOP}
""",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the canonical selective multi-join composite:
    filtered customer segment ⋈ date-filtered orders ⋈ ship-date-
    filtered lineitem, revenue per order, global top-{SHIP_PRIORITY_TOP}.

    What the plan must do at 100 TB (and Catalyst does from this
    declarative form): push all three filters into the parquet scans
    (PushedFilters), prune to the 4 needed lineitem columns, pick
    broadcast vs shuffle join per post-filter size via AQE, aggregate
    partial/final on l_orderkey, and fold ORDER BY+LIMIT into
    TakeOrderedAndProject — never a global sort of every order.  Ties
    beyond revenue break on (orderdate, orderkey) so the LIMIT row set
    is deterministic on both engines."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # mid-corpus cutoff: orders span 1995-2001 in the fixture
    cutoff = "1998-06-01"
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.desc("revenue"), "orderdate", "orderkey")
        .limit(SHIP_PRIORITY_TOP)
    )


LARGE_ORDER_QTY = 250.0  # HAVING threshold for the large-order probe


@query(
    "q_large_orders",
    oracle=f"""
SELECT c.c_name, o.o_orderkey AS orderkey, o.o_orderdate AS orderdate,
       CAST(round(o.o_totalprice, 2) AS DOUBLE) AS totalprice,
       CAST(round(sum(l.l_quantity), 2) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > {LARGE_ORDER_QTY})
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — aggregate-then-semi-join: find orders whose
    total line quantity exceeds {LARGE_ORDER_QTY}, then rebuild the
    customer-level report for just those orders.

    The scale-critical ordering is AGGREGATE FIRST: the HAVING
    aggregate reduces lineitem to one row per order BEFORE any join
    touches it, and the surviving key set drives a semi-join — so the
    expensive fact⋈fact work happens on the filtered keys, never the
    full table.  Catalyst plans the IN-subquery as exactly that
    left-semi; the final customer join is a dimension lookup on the
    (tiny) surviving row set."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big_keys = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > LARGE_ORDER_QTY)
        .select("l_orderkey")
    )
    return (
        orders.join(
            big_keys, orders["o_orderkey"] == big_keys["l_orderkey"], "left_semi"
        )
        .join(lineitem, F.col("o_orderkey") == lineitem["l_orderkey"])
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )

LATE_DAYS = 1500  # "late" lag; the fixture's synthetic ship lag spans
# ±~2400 days (p90 ≈ 1404), so 1500 keeps ~8% of lines and the
# exists/not-exists branches both selective
BLAME_TOP = 20


@query(
    "q_late_supplier_blame",
    oracle=f"""
SELECT s.s_name AS supplier,
       CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_blamed_orders
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate
                                        + INTERVAL {LATE_DAYS} DAY)
GROUP BY s.s_name
ORDER BY n_blamed_orders DESC, supplier
LIMIT {BLAME_TOP}
""",
)
def q_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the canonical EXISTS + NOT-EXISTS correlated
    composition: suppliers who were the SOLE late shipper in a
    multi-supplier order (lag > {LATE_DAYS}d against the fixture's
    synthetic ship-lag spread), counted by distinct blamed order.

    The decorrelation the engine must find (and Catalyst does from
    this explicit spelling): both subqueries correlate on
    ``l_orderkey`` with a ``suppkey <>`` residual, so EXISTS becomes a
    LEFT SEMI and NOT EXISTS a LEFT ANTI hash join (both confirmed in
    the executed plan), and every join keys on ``l_orderkey`` — the
    probe side shuffles onto that key once and keeps its partitioning
    through semi → anti, so no stage ever re-partitions the corpus by
    a second key.  The NOT-EXISTS side pre-filters to late
    lines before joining (the anti build side is ~8% of lineitem),
    and ORDER BY + LIMIT folds into TakeOrderedAndProject.  Supplier
    is dimension-sized at any SF where suppliers are a catalog, but
    no broadcast is forced — AQE decides from post-filter sizes."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    late_cut = F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
    l1 = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    blamed = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        blamed.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(F.count_distinct("l_orderkey").alias("n_blamed_orders"))
        .orderBy(F.desc("n_blamed_orders"), "supplier")
        .limit(BLAME_TOP)
    )


# Incremental-rollup batch boundary: rows shipped before the cutoff are
# the "already materialized" state; rows at/after it are the new batch.
ROLLUP_CUTOFF = "1998-01-01"


def partial_rollup_state(li: DataFrame) -> DataFrame:
    """Mergeable per-key aggregate state: (count, sums, min/max).

    Every column here is a COMMUTATIVE MONOID — merging two state rows
    with sum/sum/min/max is exact, so a stored rollup can absorb any
    number of delta batches without rescanning history.  avg is NOT in
    the state (it does not merge); it is derived at finalize time as
    sum/count."""
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("s_qty"),
        F.sum("l_extendedprice").alias("s_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@query(
    "q_agg_incremental_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(l_extendedprice) / count(*), 4) AS DOUBLE) AS avg_price,
       min(l_shipdate) AS min_ship,
       max(l_shipdate) AS max_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: merge a stored
    partial-aggregate state with a new delta batch and get EXACTLY the
    full recompute — the oracle is the plain one-shot GROUP BY over
    everything, so the driver hash proves state-merge == recompute.

    Here both halves are derived from the fixture by a shipdate split
    (< {ROLLUP_CUTOFF} = stored state, >= = delta batch); in production
    the base state is a persisted table and ONLY the delta is scanned —
    O(batch) I/O per refresh instead of O(history), which is the whole
    point at 100 TB (a day's delta vs years of history).  Both split
    filters push down to the parquet scan; each side partial-aggregates
    map-side, and the merge groups |keys|-many state rows — shuffle
    volume is bounded by group cardinality, not row count."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit(ROLLUP_CUTOFF).cast("timestamp")
    base_state = partial_rollup_state(li.filter(F.col("l_shipdate") < cutoff))
    delta_state = partial_rollup_state(li.filter(F.col("l_shipdate") >= cutoff))
    merged = (
        base_state.unionByName(delta_state)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s_qty").alias("s_qty"),
            F.sum("s_price").alias("s_price"),
            F.min("min_ship").alias("min_ship"),
            F.max("max_ship").alias("max_ship"),
        )
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        F.round("s_qty", 2).alias("sum_qty"),
        F.round(F.col("s_price") / F.col("n"), 4).alias("avg_price"),
        "min_ship",
        "max_ship",
    )


HEAVY_HITTER_FRACTION = 0.008  # report users with >= 0.8% of all events


@query(
    "q_agg_heavy_hitters",
    oracle=f"""
SELECT user_id,
       count(*) AS n_events,
       CAST(round(count(*) * 1.0 / (SELECT count(*) FROM events), 6) AS DOUBLE)
           AS share
FROM events
GROUP BY user_id
HAVING count(*) >= {HEAVY_HITTER_FRACTION} * (SELECT count(*) FROM events)
""",
)
def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: keys holding >= {HEAVY_HITTER_FRACTION:.1%}
    of all rows, with their share of the total.

    Two aggregates over one scan: the grand total collapses to ONE row
    broadcast-cross-joined onto the per-key counts (never an action,
    never a second pass through the driver), and the per-key count
    partial-aggregates map-side so the shuffle carries |distinct keys|
    rows.  At 100 TB the candidate set above an s-fraction threshold is
    at most 1/s keys by pigeonhole — the output is tiny by
    construction, which is what makes the threshold form (rather than
    a global top-N sort) the scalable way to ask "who dominates the
    traffic"."""
    ev = load_table(spark, sf_dir, "events")
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_events") >= HEAVY_HITTER_FRACTION * F.col("total"))
        .select(
            "user_id",
            "n_events",
            F.round(F.col("n_events") / F.col("total"), 6).alias("share"),
        )
    )


@query(
    "q_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE)
           AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the 6-table join composite: revenue from orders
    where customer and supplier sit in the same ASIA nation, grouped by
    nation.  The widest declarative join chain in the catalog, and the
    classic join-ORDER test: region (1 row after filter) must reduce
    nation (5 rows) before either touches a fact table, customer joins
    orders before the lineitem explosion, and the supplier join carries
    the extra same-nation equality — Catalyst gets all of this from the
    declarative form (broadcast for the dim chain, shuffle joins for
    fact⋈fact, both date filters pushed to the orders scan).  At
    100 TB the dangerous wrong plan is joining lineitem×supplier first
    — the optimizer's cardinality estimates avoid it here precisely
    because the filters are visible in the plan, the lesson this query
    exists to pin."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        region.join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(F.col("n_name").alias("nation"), "revenue")
    )


@query(
    "q_agg_statistics",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         count(*)                    AS n,
         avg(l_quantity)             AS mu,
         avg(l_quantity * l_quantity)                           AS m2r,
         avg(l_quantity * l_quantity * l_quantity)              AS m3r,
         avg(l_quantity * l_quantity * l_quantity * l_quantity) AS m4r,
         CAST(round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS DOUBLE)
             AS corr_qty_price,
         CAST(round(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS DOUBLE)
             AS covar_qty_price,
         CAST(round(var_samp(l_quantity), 6) AS DOUBLE) AS var_qty
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n, corr_qty_price, covar_qty_price, var_qty,
       CAST(round((m3r - 3 * mu * m2r + 2 * mu * mu * mu)
                  / pow(m2r - mu * mu, 1.5), 6) + 0.0 AS DOUBLE) AS skew_qty,
       CAST(round((m4r - 4 * mu * m3r + 6 * mu * mu * m2r
                       - 3 * mu * mu * mu * mu)
                  / pow(m2r - mu * mu, 2) - 3, 6) + 0.0 AS DOUBLE) AS kurt_qty
FROM m
""",
)
def q_agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family in one partial/final hash agg:
    correlation, sample covariance/variance, and the population
    skewness / excess kurtosis of quantity per return flag — the
    profile pass a feature-engineering pipeline runs before
    normalization decisions.

    All of these are single-pass MERGEABLE aggregates (co-moment
    sketches: Spark maintains central moments incrementally per
    partition and merges them pairwise), so the shuffle carries one
    small state row per (partition × group) — the same scale property
    as count/sum, just with a wider state.  Engine caveat pinned here:
    DuckDB's skewness/kurtosis apply SAMPLE bias correction while
    Spark's are POPULATION moments, so the oracle derives the
    population forms from raw moments (numerically safe for a bounded
    column like quantity; for wide-magnitude columns prefer the
    engines' stable central-moment paths)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        # signed-zero sweep (r13): `+ 0.0` folds rounded -0.0 to +0.0
        # on signed outputs (driver hash distinguishes signed zeros).
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0)).alias(
            "corr_qty_price"
        ),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias(
            "covar_qty_price"
        ),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        (F.round(F.skewness("l_quantity"), 6) + F.lit(0.0)).alias("skew_qty"),
        (F.round(F.kurtosis("l_quantity"), 6) + F.lit(0.0)).alias("kurt_qty"),
    )


@query(
    "q_agg_hll_set_algebra",
    oracle="""
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
ex AS (
  SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
         CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
         CAST((SELECT count(*) FROM (SELECT * FROM c UNION SELECT * FROM p))
              AS BIGINT) AS n_union,
         CAST((SELECT count(*) FROM c
               WHERE user_id IN (SELECT user_id FROM p))
              AS BIGINT) AS n_intersection
),
sk AS (
  SELECT approx_count_distinct(CASE WHEN event_type = 'click'
                                    THEN user_id END) AS a_click,
         approx_count_distinct(CASE WHEN event_type = 'purchase'
                                    THEN user_id END) AS a_purchase,
         approx_count_distinct(CASE WHEN event_type IN ('click', 'purchase')
                                    THEN user_id END) AS a_union
  FROM events
)
SELECT ex.n_click, ex.n_purchase, ex.n_union, ex.n_intersection,
       abs(sk.a_click - ex.n_click) <= 0.06 * ex.n_click AS click_ok,
       abs(sk.a_purchase - ex.n_purchase)
         <= 0.06 * ex.n_purchase AS purchase_ok,
       abs(sk.a_union - ex.n_union) <= 0.06 * ex.n_union AS union_ok,
       abs((sk.a_click + sk.a_purchase - sk.a_union) - ex.n_intersection)
         <= 0.2 * ex.n_union AS intersection_ok
FROM ex CROSS JOIN sk
""",
)
def q_agg_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: audience overlap between two behaviors
    (clickers vs purchasers) from mergeable HLL sketches — |A|, |B|,
    |A∪B| by sketch union, and |A∩B| by inclusion-exclusion
    (|A|+|B|-|A∪B|), never touching raw user ids after the first pass.

    This is how overlap questions are answered at 100 TB: per-segment
    sketches are built once (one scan, map-side partial sketches),
    stored as blobs, and ANY pairwise overlap query afterwards is
    arithmetic over a handful of bytes — an exact-distinct answer
    would re-shuffle both audiences per question.  Inclusion-exclusion
    inherits the union estimate's error (relative to the UNION size,
    so small intersections of large sets get noisy — the documented
    caveat that pushes exact-needed cases to the semi-join instead).

    SKETCH-CONTRACT oracle (promoted r9, the q_agg_approx_quantiles
    pattern): exact cardinalities ride the same scan as hash-compared
    VALUES, and each engine emits booleans that its OWN sketch lands
    within 6% of its own exact counts (20% of union for the
    inclusion-exclusion intersection, whose error is union-relative
    by construction) — green at sf0.01 AND sf0.1, where the previous
    exact-only oracle held only in the sparse-exact regime."""
    ev = load_table(spark, sf_dir, "events")
    is_c = F.col("event_type") == "click"
    is_p = F.col("event_type") == "purchase"
    sk = ev.agg(
        F.hll_sketch_agg(F.when(is_c, F.col("user_id"))).alias("sk_c"),
        F.hll_sketch_agg(F.when(is_p, F.col("user_id"))).alias("sk_p"),
        F.count_distinct(F.when(is_c, F.col("user_id"))).alias("n_click"),
        F.count_distinct(F.when(is_p, F.col("user_id"))).alias("n_purchase"),
        F.count_distinct(
            F.when(is_c | is_p, F.col("user_id"))
        ).alias("n_union"),
    )
    n_c = F.hll_sketch_estimate("sk_c")
    n_p = F.hll_sketch_estimate("sk_p")
    n_u = F.hll_sketch_estimate(F.hll_union("sk_c", "sk_p"))
    inter_exact = F.col("n_click") + F.col("n_purchase") - F.col("n_union")
    return sk.select(
        "n_click",
        "n_purchase",
        "n_union",
        inter_exact.alias("n_intersection"),
        (F.abs(n_c - F.col("n_click")) <= 0.06 * F.col("n_click")).alias(
            "click_ok"
        ),
        (
            F.abs(n_p - F.col("n_purchase")) <= 0.06 * F.col("n_purchase")
        ).alias("purchase_ok"),
        (F.abs(n_u - F.col("n_union")) <= 0.06 * F.col("n_union")).alias(
            "union_ok"
        ),
        (
            F.abs((n_c + n_p - n_u) - inter_exact) <= 0.2 * F.col("n_union")
        ).alias("intersection_ok"),
    )


HISTOGRAM_BUCKETS = 10  # equi-depth histogram resolution


@query(
    "q_agg_equidepth_histogram",
    oracle=f"""
SELECT CAST(nt AS BIGINT) AS bucket,
       CAST(round(min(o_totalprice), 2) AS DOUBLE) AS lo,
       CAST(round(max(o_totalprice), 2) AS DOUBLE) AS hi,
       CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT o_totalprice,
         ntile({HISTOGRAM_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey)
             AS nt
  FROM orders
)
GROUP BY nt
""",
)
def q_agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals: {HISTOGRAM_BUCKETS}
    buckets of equal row count with their value boundaries — the
    statistic cost-based optimizers and data-profiling passes build
    (equal-WIDTH bins mislead on skewed money-like distributions;
    equal-depth boundaries are the honest shape summary).  Tie rows
    order by (value, key) so bucket assignment is deterministic on
    both engines.

    The bucket cut is EXACT yet distributed: ranked_ntile
    (operators/ranked.py) range-partitions on the value, ranks within
    partitions, and recovers the global rank from broadcast offsets —
    bit-identical to the oracle's ntile window with no single-task
    global sort (plan pinned in tests/test_plans.py).  The mergeable
    `approx_percentile` sketch (q_agg_approx_quantiles) remains the
    cheaper approximate alternative; this exact form is its ground
    truth."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        ranked_ntile(
            orders.select("o_totalprice", "o_orderkey"),
            HISTOGRAM_BUCKETS,
            "o_totalprice",
            ["o_orderkey"],
            out="bucket",
        )
        .groupBy("bucket")
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_agg_chi_square",
    oracle="""
WITH obs AS (
  SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
),
margins AS (
  SELECT o.lang, o.source, o.o,
         sum(o.o) OVER (PARTITION BY o.lang)   AS row_tot,
         sum(o.o) OVER (PARTITION BY o.source) AS col_tot,
         sum(o.o) OVER ()                      AS n
  FROM obs o
)
SELECT CAST(round(sum(
         (o - row_tot * col_tot / CAST(n AS DOUBLE))
         * (o - row_tot * col_tot / CAST(n AS DOUBLE))
         / (row_tot * col_tot / CAST(n AS DOUBLE))), 6) AS DOUBLE)
           AS chi_square,
       CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
            AS BIGINT) AS dof,
       CAST(count(*) AS BIGINT) AS n_cells
FROM margins
""",
)
def q_agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between two categorical columns
    (lang × source) — the data-profiling primitive behind "is feature
    A informative about feature B" checks and drift monitors: observed
    cell counts vs the independence expectation row·col/N, summed into
    the χ² statistic with its degrees of freedom.

    One corpus-scale aggregate (the contingency counts, map-side
    partial combine, shuffle = |lang|·|source| cells) and everything
    after runs on the CELL table — marginals as windows over the
    vocabulary-sized cells, never a second corpus pass.  Both engines
    sum (o−e)²/e over identical exact-integer marginals; only the
    final statistic is rounded for accumulation-order parity."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    e = F.col("row_tot") * F.col("col_tot") / F.col("n").cast("double")
    margins = obs.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("source")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    return margins.agg(
        F.round(
            F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6
        ).alias("chi_square"),
        (
            (F.count_distinct("lang") - 1) * (F.count_distinct("source") - 1)
        ).alias("dof"),
        F.count(F.lit(1)).alias("n_cells"),
    )


MIN_COST_PARTS = 100  # bounded part slice for the gate fixture


@query(
    "q_min_cost_supplier",
    oracle=f"""
WITH best AS (
  SELECT l_partkey,
         CAST(round(min(l_extendedprice), 2) AS DOUBLE) AS best_price,
         min_by(l_suppkey,
                CAST(round(l_extendedprice * 100) AS BIGINT) * 100000
                  + l_suppkey) AS best_suppkey
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_partkey AS partkey, p.p_name AS part_name,
       s.s_name AS supplier, b.best_price
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey
JOIN supplier s ON s.s_suppkey = b.best_suppkey
WHERE p.p_partkey <= {MIN_COST_PARTS}
ORDER BY partkey
""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — min-cost supplier per part — spelled as the
    ONE-PASS decorrelation: where the textbook form runs a correlated
    scalar subquery (min price per part) and joins the fact table
    AGAINST ITSELF to recover the row achieving it, ``min_by`` carries
    the argmin through the same partial/final aggregate that computes
    the min — one fact scan, one shuffle, no join-back, no window.

    Tie-breaking must be deterministic for the hash gate, and DuckDB's
    min_by cannot order by a struct — so both engines order by the
    exact BIGINT composite round(price·100)·100000 + suppkey (prices
    are cent-precision and suppkeys < 100000, so the packing is
    collision-free and overflow-safe), which means "lowest price, then
    lowest supplier key" as ONE comparable value.  The dimension joins
    (part slice, supplier names) run on the vocabulary-sized argmin
    output, never on the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    ordkey = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint") * 100000
        + F.col("l_suppkey")
    )
    best = li.groupBy("l_partkey").agg(
        F.round(F.min("l_extendedprice"), 2).alias("best_price"),
        F.min_by("l_suppkey", ordkey).alias("best_suppkey"),
    )
    return (
        best.join(
            part.filter(F.col("p_partkey") <= MIN_COST_PARTS),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("best_suppkey"))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier"),
            "best_price",
        )
        .orderBy("partkey")
    )


SMALL_QTY_BRAND_PREFIX = "Brand#1"  # Brand#1 and Brand#10..#19
SMALL_QTY_FRACTION = 0.5  # l_quantity below this fraction of the part avg


@query(
    "q_small_quantity_revenue",
    oracle=f"""
WITH perpart AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand AS brand,
       CAST(count(*) AS BIGINT) AS n_small,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) / 7.0, 2)
            AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN perpart a ON a.l_partkey = l.l_partkey
WHERE p.p_brand LIKE '{SMALL_QTY_BRAND_PREFIX}%'
  AND l.l_quantity < {SMALL_QTY_FRACTION} * a.avg_qty
GROUP BY p.p_brand
ORDER BY brand
""",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — the canonical CORRELATED-SCALAR-SUBQUERY
    decorrelation: revenue from line items whose quantity falls below
    {SMALL_QTY_FRACTION}x the average quantity of their own part,
    grouped per brand (reference runs no such query; north-star
    extension per SURVEY.md S2.2 aggregation/join families).

    100 TB shape: the correlated subquery ``l_quantity < f * (SELECT
    avg(l_quantity) WHERE l_partkey = outer.l_partkey)`` is written
    decorrelated — ONE partial/final average per part key, then an
    equi-join back to the fact table on the SAME key, so the agg
    output arrives already hash-partitioned on l_partkey and the join
    reuses that exchange on the build side (no second corpus shuffle
    of the aggregate).  The brand slice joins via broadcast (part is
    dimension-sized) and prunes fact rows BEFORE the per-part join.
    Revenue accumulates in DECIMAL(18,6) — prices are exact at <= 4
    decimals, so the sum is order-independent and the oracle hash is
    scale-independent (the r9 q_join_runtime_filter lesson)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").startswith(SMALL_QTY_BRAND_PREFIX)
    )
    per_part = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    branded = li.join(
        F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")
    )
    return (
        branded.join(per_part.withColumnRenamed("l_partkey", "a_partkey"),
                     F.col("a_partkey") == branded["l_partkey"])
        .filter(F.col("l_quantity") < SMALL_QTY_FRACTION * F.col("avg_qty"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_small"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly"),
        )
        .orderBy("brand")
    )


CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 256  # counters per row
CMS_PROBES = 20  # heaviest keys verified against the sketch


@query(
    "q_agg_count_min_sketch",
    oracle=f"""
WITH base AS (SELECT l_partkey AS key FROM lineitem),
hrows AS (SELECT unnest(range({CMS_DEPTH})) AS i),
cnt AS (
    SELECT i,
           CAST('0x' || substring(md5(i || ':' || key), 1, 8) AS BIGINT)
               % {CMS_WIDTH} AS b,
           CAST(count(*) AS BIGINT) AS c
    FROM base, hrows
    GROUP BY 1, 2
),
exact AS (
    SELECT key, CAST(count(*) AS BIGINT) AS exact_count
    FROM base GROUP BY key
    ORDER BY exact_count DESC, key LIMIT {CMS_PROBES}
),
est AS (
    SELECT e.key, min(c.c) AS cms_estimate
    FROM exact e
    JOIN hrows r ON TRUE
    JOIN cnt c
      ON c.i = r.i
     AND c.b = CAST('0x' || substring(md5(r.i || ':' || e.key), 1, 8)
                    AS BIGINT) % {CMS_WIDTH}
    GROUP BY e.key
)
SELECT e.key AS partkey,
       e.exact_count,
       est.cms_estimate,
       est.cms_estimate >= e.exact_count AS never_underestimates
FROM exact e JOIN est ON est.key = e.key
""",
)
def q_agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH frequency estimation (Cormode & Muthukrishnan
    2005) — the mergeable frequency sketch beside the HLL cardinality
    family: every key increments one counter per hash row; a key's
    estimate is the MIN of its CMS_DEPTH counters, which can only
    OVER-estimate (collisions add, never subtract) — the output's
    ``never_underestimates`` column states the guarantee per probe.

    The hash family is the repo's sketch-contract md5 (row-salted,
    first 32 bits, mod width), so DuckDB rebuilds the identical
    sketch and the whole query is hash-ORACLED — same discipline as
    the HLL set-algebra queries.

    Scale design: the sketch is CMS_DEPTH x CMS_WIDTH counters
    REGARDLESS of corpus size — one scan with map-side partial
    combine collapses to <= 1024 rows, the mergeable-state property
    that lets 1000 executors each fold their partition and union.
    The exact side exists only to verify the sketch at gate scale
    (same pattern as q_agg_hll_partitioned's verification pass); the
    production shape is sketch-only.  Probes join the counter table
    broadcast (it is O(1) sized)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(F.col("l_partkey").alias("key"))

    def bucket(i, key_col):
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(i), key_col)), 1, 8
            ),
            16,
            10,
        ).cast("long") % CMS_WIDTH

    counters = (
        base.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            bucket(i, F.col("key")).alias("b"),
                        )
                        for i in range(CMS_DEPTH)
                    ]
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.i").alias("i"), F.col("rb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        base.groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), "key")
        .limit(CMS_PROBES)
    )
    probes = exact.select(
        "key",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        bucket(i, F.col("key")).alias("b"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    )
    est = (
        probes.join(
            F.broadcast(counters),
            (F.col("rb.i") == F.col("i")) & (F.col("rb.b") == F.col("b")),
        )
        .groupBy("key", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        F.col("key").alias("partkey"),
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_count")).alias(
            "never_underestimates"
        ),
    )


SKEW_TILES = 100  # percentile resolution of the concentration report


@query(
    "q_agg_skew_report",
    oracle=f"""
WITH counts AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY user_id
),
tiled AS (
    SELECT cnt,
           ntile({SKEW_TILES}) OVER (ORDER BY cnt DESC, user_id) AS pct
    FROM counts
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(round(max(cnt) * 1.0 / sum(cnt), 6) AS DOUBLE) AS max_share,
       CAST(round(sum(CASE WHEN pct <= 1 THEN cnt ELSE 0 END) * 1.0
                  / sum(cnt), 6) AS DOUBLE) AS top1pct_share,
       CAST(round(sum(CASE WHEN pct <= 10 THEN cnt ELSE 0 END) * 1.0
                  / sum(cnt), 6) AS DOUBLE) AS top10pct_share,
       CAST(round(stddev_pop(cnt) / avg(cnt), 6) AS DOUBLE)
           AS coeff_variation
FROM tiled
""",
)
def q_agg_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-SKEW DIAGNOSTIC report — the measurement that decides
    whether a key needs salting before it hits a join or window
    (the repo's salted sessionize/interval-coverage escape hatches
    exist precisely for keys this report flags): events per user_id
    summarized as max-key share, top-1%/top-10% concentration, and
    the coefficient of variation.

    Scale design: the key-count table comes from one hash aggregate
    (map-side combine); the percentile assignment uses
    ``ranked_ntile`` — the range-partitioned exact ntile from
    operators/ranked.py — NOT ``ntile() OVER (ORDER BY ...)``, whose
    single-task global sort is itself the scale bug this report hunts
    (the oracle states the window form; ranked_ntile is bit-identical
    by its pinned contract).  Everything after is one conditional
    aggregate to a single row."""
    from setup_harvest_action_spark.operators.ranked import ranked_ntile

    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tiled = ranked_ntile(
        counts, SKEW_TILES, "cnt", ["user_id"], descending=True, out="pct"
    )
    return tiled.agg(
        F.sum("cnt").alias("n_events"),
        F.count(F.lit(1)).alias("n_keys"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("max_share"),
        F.round(
            F.sum(F.when(F.col("pct") <= 1, F.col("cnt")).otherwise(0))
            / F.sum("cnt"),
            6,
        ).alias("top1pct_share"),
        F.round(
            F.sum(F.when(F.col("pct") <= 10, F.col("cnt")).otherwise(0))
            / F.sum("cnt"),
            6,
        ).alias("top10pct_share"),
        F.round(F.stddev_pop("cnt") / F.avg("cnt"), 6).alias(
            "coeff_variation"
        ),
    )


@query(
    "q_agg_geomean_udaf",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(exp(avg(ln(o_totalprice))), 4) AS DOUBLE) AS geo_mean
FROM orders
WHERE o_totalprice > 0
GROUP BY o_orderstatus
""",
)
def q_agg_geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom AGGREGATE through a pandas GROUPED_AGG UDF — the one
    Arrow surface the UDF matrix (SURVEY §2.2) did not yet exercise:
    a ``pandas_udf`` whose input is a whole group's column as a
    pandas Series and whose output is one scalar, usable inside
    ``groupBy().agg(...)`` beside built-ins.

    The aggregate itself (geometric mean) is deliberately also
    SQL-expressible as ``exp(avg(ln(x)))`` so the Python path is
    value-verified by the hash gate instead of being rows-only —
    the matrix entry is the POINT, not the math.  Scale: grouped-agg
    UDFs get the group's values Arrow-batched on the reducer —
    per-group memory is the group size, the same bound as
    ``collect_list``; for corpus-scale groups the decomposable
    ``exp(avg(ln))`` spelling (one line below it) is the production
    form, and this entry's docstring is where that trade is
    recorded."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType given explicitly: the module uses deferred
    # annotations, so the hint-based inference cannot see pd.Series
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geo_mean(v):
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Catalyst refuses to mix grouped-agg pandas UDFs with built-in
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the
    # count is a pandas UDAF too — which also pins that multiple
    # grouped-agg UDFs compose in a single pass
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return len(v)

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            n_rows("o_totalprice").alias("n"),
            F.round(geo_mean("o_totalprice"), 4).alias("geo_mean"),
        )
    )


@query(
    "q_agg_corr_matrix",
    oracle="""
SELECT 'quantity~price' AS pair,
       CAST(round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS DOUBLE) AS pearson,
       CAST(round(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS DOUBLE)
           AS covariance
FROM lineitem
UNION ALL
SELECT 'quantity~discount',
       CAST(round(corr(l_quantity, l_discount), 4) + 0.0 AS DOUBLE),
       CAST(round(covar_samp(l_quantity, l_discount), 4) + 0.0 AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'price~discount',
       CAST(round(corr(l_extendedprice, l_discount), 4) + 0.0 AS DOUBLE),
       CAST(round(covar_samp(l_extendedprice, l_discount), 4) + 0.0 AS DOUBLE)
FROM lineitem
""",
)
def q_agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance over the
    lineitem measures — the feature-screening pass a pipeline runs
    before modeling.  ONE corpus scan computes all six aggregates
    (multi-aggregate hash agg with map-side partial combine — the
    oracle's three-scan UNION spelling is for DuckDB readability; the
    Spark plan is pinned to a single scan below via the one-row
    explode), then the single row explodes into the matrix rows.
    4-decimal rounding absorbs the engines' accumulation-order ulps
    on the 6e5-row sums."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("c_qp"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("v_qp"),
        F.corr("l_quantity", "l_discount").alias("c_qd"),
        F.covar_samp("l_quantity", "l_discount").alias("v_qd"),
        F.corr("l_extendedprice", "l_discount").alias("c_pd"),
        F.covar_samp("l_extendedprice", "l_discount").alias("v_pd"),
    )
    cells = F.array(
        F.struct(
            F.lit("quantity~price").alias("pair"),
            (F.round("c_qp", 4) + F.lit(0.0)).alias("pearson"),
            (F.round("v_qp", 4) + F.lit(0.0)).alias("covariance"),
        ),
        F.struct(
            F.lit("quantity~discount").alias("pair"),
            (F.round("c_qd", 4) + F.lit(0.0)).alias("pearson"),
            (F.round("v_qd", 4) + F.lit(0.0)).alias("covariance"),
        ),
        F.struct(
            F.lit("price~discount").alias("pair"),
            (F.round("c_pd", 4) + F.lit(0.0)).alias("pearson"),
            (F.round("v_pd", 4) + F.lit(0.0)).alias("covariance"),
        ),
    )
    return row.select(F.explode(cells).alias("c")).select("c.*")


@query(
    "q_agg_benford",
    oracle="""
WITH digits AS (
    SELECT CAST(floor(l_extendedprice /
                pow(10, floor(log10(l_extendedprice)))) AS INTEGER)
               AS digit
    FROM lineitem WHERE l_extendedprice > 0
),
obs AS (
    SELECT digit, CAST(count(*) AS BIGINT) AS n,
           sum(count(*)) OVER () AS total
    FROM digits GROUP BY digit
)
SELECT digit, n,
       CAST(round(n * 1.0 / total, 6) AS DOUBLE) AS obs_freq,
       CAST(round(log10(1 + 1.0 / digit), 6) AS DOUBLE) AS benford_freq,
       CAST(round(pow(n - total * log10(1 + 1.0 / digit), 2)
                  / (total * log10(1 + 1.0 / digit)), 6) AS DOUBLE)
           AS chi2_term
FROM obs
""",
)
def q_agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit screen over prices — the classic
    fabricated-data / unit-mixup detector (a synthetic or truncated
    amount column drifts from the log-uniform digit law long before
    any range check fires).  Per digit: observed count and frequency,
    the Benford expectation log10(1 + 1/d), and the digit's χ² term
    (callers sum the nine terms against the χ²₈ critical value —
    kept per-digit so the report shows WHICH digits deviate).

    One scan: first-significant-digit extraction is pure per-row
    arithmetic (floor/log10/pow — identical IEEE ops both engines),
    then a 9-group hash aggregate; the total rides a 9-row window.
    TPC-H prices are uniform-ish, NOT Benford — the screen correctly
    reports the deviation, which is the point of having it."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") > 0
    )
    digit = F.floor(
        F.col("l_extendedprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("l_extendedprice")))
    ).cast("int")
    obs = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy()
    total = F.sum("n").over(w)
    benford = F.log10(1 + 1.0 / F.col("digit"))
    return obs.select(
        "digit",
        "n",
        F.round(F.col("n") / total, 6).alias("obs_freq"),
        F.round(benford, 6).alias("benford_freq"),
        F.round(
            F.pow(F.col("n") - total * benford, 2) / (total * benford), 6
        ).alias("chi2_term"),
    )


@query(
    "q_agg_welch_ttest",
    oracle="""
WITH g AS (
    SELECT lang,
           count(*) AS n,
           avg(n_chars * 1.0) AS m,
           var_samp(n_chars * 1.0) AS v
    FROM documents WHERE lang IN ('en', 'de') GROUP BY lang
),
ab AS (
    SELECT max(CASE WHEN lang = 'en' THEN n END) AS na,
           max(CASE WHEN lang = 'en' THEN m END) AS ma,
           max(CASE WHEN lang = 'en' THEN v END) AS va,
           max(CASE WHEN lang = 'de' THEN n END) AS nb,
           max(CASE WHEN lang = 'de' THEN m END) AS mb,
           max(CASE WHEN lang = 'de' THEN v END) AS vb
    FROM g
)
SELECT CAST(na AS BIGINT) AS n_en,
       CAST(nb AS BIGINT) AS n_de,
       CAST(round(ma - mb, 4) + 0.0 AS DOUBLE) AS mean_diff,
       CAST(round((ma - mb) / sqrt(va / na + vb / nb), 4) + 0.0 AS DOUBLE)
           AS t_stat,
       CAST(round(pow(va / na + vb / nb, 2) /
                  (pow(va / na, 2) / (na - 1)
                   + pow(vb / nb, 2) / (nb - 1)), 2) AS DOUBLE)
           AS welch_df
FROM ab
""",
)
def q_agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S two-sample t-test (unequal variances) comparing en vs
    de document lengths — the A/B-test primitive completing the
    evaluation-statistics quartet (χ² independence, exact AUC,
    calibration, and now the mean-difference test with the
    Welch–Satterthwaite degrees of freedom, all public formulas).

    One scan: both samples reduce in a single grouped aggregate
    (count/mean/variance are decomposable — map-side combine), the
    two one-row summaries pivot together, and the statistic is pure
    arithmetic on six scalars.  At 100 TB the cost is the scan,
    full stop — the whole test rides the same partial-aggregate
    machinery as any count."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "de")
    )
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("n_chars") * 1.0).alias("m"),
        F.var_samp(F.col("n_chars") * 1.0).alias("v"),
    )
    ab = g.agg(
        *[
            F.max(F.when(F.col("lang") == lang, F.col(c))).alias(f"{c}{suf}")
            for lang, suf in (("en", "a"), ("de", "b"))
            for c in ("n", "m", "v")
        ]
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    dfw = F.pow(se2, 2) / (
        F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
        + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
    )
    return ab.select(
        F.col("na").alias("n_en"),
        F.col("nb").alias("n_de"),
        (F.round(F.col("ma") - F.col("mb"), 4) + F.lit(0.0)).alias("mean_diff"),
        (F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 4) + F.lit(0.0)).alias("t_stat"),
        F.round(dfw, 2).alias("welch_df"),
    )


@query(
    "q_agg_gini",
    oracle="""
WITH counts AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY user_id
),
ranked AS (
    SELECT cnt,
           CAST(row_number() OVER (ORDER BY cnt, user_id) AS BIGINT) AS rnk,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM counts
)
SELECT CAST(max(n) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(round(sum((2.0 * rnk - n - 1) * cnt)
                  / (max(n) * sum(cnt)), 6) AS DOUBLE) AS gini
FROM ranked
""",
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Gini coefficient of events-per-user — the single-number
    inequality index completing q_agg_skew_report's concentration
    percentiles (0 = uniform load, →1 = one key owns the table; the
    number a capacity planner tracks round over round).

    Gini needs a GLOBAL rank of the key-count table — the classic
    excuse for a single-task ORDER BY window; here the rank comes
    from ``ranked_row_number`` (range-partitioned, the same primitive
    behind negative-pair and systematic sampling), the grand count
    rides out of its offsets table, and the closed form
    Σ(2i−n−1)cᵢ / (nΣc) reduces in ONE aggregate.  Ties in cnt are
    rank-order-invariant in the sum (equal values commute), so the
    user_id tie-break exists only for bitwise determinism."""
    from setup_harvest_action_spark.operators.ranked import (
        ranked_row_number,
    )

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = ranked_row_number(
        counts, "cnt", ["user_id"], out="rnk", total="n"
    )
    return ranked.agg(
        F.max("n").alias("n_keys"),
        F.sum("cnt").alias("n_events"),
        F.round(
            F.sum((2.0 * F.col("rnk") - F.col("n") - 1) * F.col("cnt"))
            / (F.max("n") * F.sum("cnt")),
            6,
        ).alias("gini"),
    )


@query(
    "q_agg_entropy",
    oracle="""
WITH p AS (
    SELECT source, count(*) * 1.0 /
           (SELECT count(*) FROM documents) AS p
    FROM documents GROUP BY source
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(round(-sum(p * log2(p)), 6) AS DOUBLE) AS entropy_bits,
       CAST(round(-sum(p * log2(p)) / log2(count(*)), 6) AS DOUBLE)
           AS normalized,
       CAST(round(1.0 / sum(p * p), 4) AS DOUBLE) AS effective_classes
FROM p
""",
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon ENTROPY of the corpus source mix (+ normalized entropy
    and the inverse-Simpson 'effective class count') — the diversity
    dial a data-mixing recipe is tuned against (temperature sampling
    raises it; its verification is this number moving): Gini says how
    unequal, entropy says how many effective sources the model
    actually sees.

    One grouped count over the corpus; the class-probability table is
    |sources|-sized, the total attaches as a broadcast one-row
    aggregate, and the three indices reduce in a single pass over
    it."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).alias("total"))
    p = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(total))
        .select((F.col("c") / F.col("total")).alias("p"))
    )
    h = -F.sum(F.col("p") * F.log2("p"))
    return p.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.round(h, 6).alias("entropy_bits"),
        F.round(h / F.log2(F.count(F.lit(1))), 6).alias("normalized"),
        F.round(1.0 / F.sum(F.col("p") * F.col("p")), 4).alias(
            "effective_classes"
        ),
    )
