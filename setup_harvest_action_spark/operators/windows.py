"""Window functions: ranking, analytic (lag/lead/first/last), frames, top-k.

The reference has no window functions (SURVEY.md §2.3) — this module is
§2.2 north-star breadth.  Internally the harvest load path already uses
``row_number`` for surrogate ids (harvest/load.py); here the full
surface is exposed as catalog queries.

Scale notes: every window below is PARTITIONED — Spark hash-partitions
on the partition key and sorts within partitions, so work scales out
with key cardinality.  A window with no ``partitionBy`` collapses to a
single task and is the #1 window anti-pattern at 100 TB; none are used
here (the load path's global id window is the documented exception,
bounded by batch novelty).  Ties are always broken by a unique key so
results are deterministic and hash-comparable against the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.operators.ranked import ranked_ntile


@query(
    "q_window_ranking",
    oracle="""
SELECT o_orderkey,
       o_orderstatus,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4)     OVER w AS BIGINT) AS quartile
FROM orders
WHERE o_totalprice > 400000
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile in one partitioned window.
    One shuffle on the partition key serves all four functions."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.filter(F.col("o_totalprice") > 400000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
    )


@query(
    "q_window_lag_lead",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       o_totalprice,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       CAST(round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2) AS DOUBLE) AS delta_vs_prev
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per customer ordered by order date — the classic
    prev/next-row analytic with a null-coalesced delta."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            prev.alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.round(
                F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice")), 2
            ).alias("delta_vs_prev"),
        )
    )


@query(
    "q_window_running_sum",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       CAST(round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
       CAST(count(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_so_far
FROM orders
WHERE o_custkey < 100
""",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) frame — ROWS UNBOUNDED PRECEDING..CURRENT."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_so_far"),
        )
    )


@query(
    "q_window_sliding_frame",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       CAST(round(avg(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS moving_avg_3
FROM orders
WHERE o_custkey < 100
""",
)
def q_window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame — 3-row moving average per customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg_3"),
        )
    )


@query(
    "q_window_range_frame",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       o_totalprice,
       CAST(count(*) OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice
           RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_50k
FROM orders
WHERE o_custkey < 100
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering — peers within a value
    distance, not a row distance."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.count(F.lit(1)).over(w).cast("long").alias("n_within_50k"),
        )
    )


@query(
    "q_window_first_last",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value analytics; last over the full-partition
    frame (the default growing frame would return the current row)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(w_full).alias("last_price"),
        )
    )


@query(
    "q_window_topk_per_group",
    oracle="""
SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (
    SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
           row_number() OVER (PARTITION BY c.c_mktsegment
                              ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
WHERE rn <= 5
""",
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: row_number() <= k — the distributed top-k idiom
    (fills the O6/O7 'no per-group top-k' gap flagged in round 1).

    At scale this is one shuffle on the group key; Spark's
    WindowGroupLimit pushes the k-limit into the sort so each partition
    keeps only k rows per group before the final filter.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "q_window_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
       CAST(round(cume_dist()    OVER w, 6) AS DOUBLE) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank (rank-1)/(n-1) and
    cume_dist — the normalized-position primitives quantile bucketing
    and outlier trimming build on.  Tie-broken on the key so both
    engines see one deterministic ordering."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


PARETO_DECILES = 10  # customer-concentration resolution


@query(
    "q_window_pareto_concentration",
    oracle=f"""
WITH per_cust AS (
  SELECT o_custkey, sum(o_totalprice) AS revenue
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, revenue,
         CAST(ntile({PARETO_DECILES}) OVER (ORDER BY revenue DESC, o_custkey)
              AS BIGINT) AS decile
  FROM per_cust
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(round(sum(revenue), 2) AS DOUBLE) AS revenue,
       CAST(round(sum(revenue) / (SELECT sum(revenue) FROM per_cust), 6)
            AS DOUBLE) AS revenue_share
FROM ranked
GROUP BY decile
""",
)
def q_window_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration analysis: rank customers by revenue, cut
    into {PARETO_DECILES} equal-count deciles, and report each
    decile's share of total revenue — the "top 10% drive X% of
    revenue" curve behind pricing, capacity, and skew decisions (and
    the business-side face of the same hot-key skew the engine salts
    joins for).

    The per-customer aggregate partial-combines map-side (shuffle =
    |customers|); the grand total enters as a broadcast one-row
    aggregate.  The decile cut ranks customer-cardinality rows — an
    entity population, so it uses ranked_ntile's range-partitioned
    rank (operators/ranked.py) rather than an unpartitioned ntile
    window: bit-identical assignment with the sort spread across
    executors, plan pinned in tests/test_plans.py.  Tie ranks break
    on o_custkey so decile membership is deterministic on both
    engines."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("revenue")
    )
    total = per_cust.agg(F.sum("revenue").alias("total"))
    return (
        ranked_ntile(
            per_cust,
            PARETO_DECILES,
            "revenue",
            ["o_custkey"],
            descending=True,
            out="decile",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("revenue").alias("rev"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            F.round("rev", 2).alias("revenue"),
            F.round(F.col("rev") / F.col("total"), 6).alias("revenue_share"),
        )
    )


@query(
    "q_window_running_distinct",
    oracle="""
WITH firsts AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN row_number() OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id
              ) = 1 THEN 1 ELSE 0 END AS is_first
  FROM events
)
SELECT user_id, event_id,
       CAST(sum(is_first) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS distinct_types_so_far
FROM firsts
WHERE user_id < 20
""",
)
def q_window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING DISTINCT COUNT per entity — how many distinct event
    types each user has touched as of each event.  SQL has no
    ``count(DISTINCT x) OVER (... ROWS UNBOUNDED PRECEDING)`` (and the
    naive ``collect_set`` over a running frame materializes a growing
    set PER ROW — O(n²) state); the scalable spelling is
    first-occurrence marking: rank each (user, type) by time, flag
    rank 1, then a plain running SUM of flags over the user timeline.

    Two windows with DIFFERENT partition keys, so two shuffles — the
    honest minimum, since distinctness is per (user, type) while the
    running frame is per user.  Both windows are entity-bounded (no
    global sort); the second shuffle carries one row per event with a
    1-byte flag, not a set.  The user_id < 20 slice bounds the gate
    fixture; the plan is identical unbounded."""
    events = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_first = F.when(
        F.row_number().over(w_first) == 1, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.filter(F.col("user_id") < 20)
        .select("user_id", "ts", "event_id", is_first.alias("is_first"))
        .select(
            "user_id",
            "event_id",
            F.sum("is_first").over(w_run).alias("distinct_types_so_far"),
        )
    )


@query(
    "q_window_sequence_gaps",
    oracle="""
WITH seq AS (
  SELECT o_custkey, o_orderkey,
         lag(o_orderkey) OVER (
           PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_key
  FROM orders
)
SELECT o_custkey AS custkey,
       CAST(prev_key + 1 AS BIGINT) AS gap_start,
       CAST(o_orderkey - 1 AS BIGINT) AS gap_end,
       CAST(o_orderkey - prev_key - 1 AS BIGINT) AS n_missing
FROM seq
WHERE prev_key IS NOT NULL AND o_orderkey - prev_key > 1
  AND o_custkey < 50
""",
)
def q_window_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE-GAP detection per entity — the data-quality dual of
    gaps-and-islands: report every missing run [prev+1, cur−1] in each
    customer's order-key sequence (lost batches, sequence-generator
    holes, partial loads).  One lag window per entity and a row per
    GAP, not per missing value — a gap of a million keys is one output
    row, so the result is bounded by observed rows regardless of how
    much is missing (the naive anti-join against a generated full
    range materializes the missing keys themselves and dies on wide
    gaps at scale).

    One shuffle on the entity key; the window is entity-bounded with
    the usual celebrity-key caveat.  The custkey slice bounds gate
    output; the plan is identical unbounded."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    prev = F.lag("o_orderkey").over(w)
    return (
        orders.filter(F.col("o_custkey") < 50)
        .select(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            prev.alias("prev_key"),
        )
        .filter(
            F.col("prev_key").isNotNull()
            & (F.col("o_orderkey") - F.col("prev_key") > 1)
        )
        .select(
            "custkey",
            (F.col("prev_key") + 1).alias("gap_start"),
            (F.col("o_orderkey") - 1).alias("gap_end"),
            (F.col("o_orderkey") - F.col("prev_key") - 1).alias("n_missing"),
        )
    )


@query(
    "q_window_period_over_period",
    oracle="""
WITH monthly AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(year(o.o_orderdate) AS INTEGER) AS y,
         CAST(month(o.o_orderdate) AS INTEGER) AS m,
         round(sum(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,6))), 2)
             AS revenue
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey, year(o.o_orderdate), month(o.o_orderdate)
)
SELECT nationkey, y, m,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(lag(revenue) OVER w AS DOUBLE) AS prev_revenue,
       CAST(round(100.0 * (revenue - lag(revenue) OVER w)
                  / lag(revenue) OVER w, 4) + 0.0 AS DOUBLE) AS pct_change
FROM monthly
WINDOW w AS (PARTITION BY nationkey ORDER BY y, m)
""",
)
def q_window_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERIOD-OVER-PERIOD comparison — the reporting staple: monthly
    revenue per customer nation with the previous month's figure and
    percent change via ``lag`` over (nation, month-order).

    Scale shape: the window partitions by NATION over MONTH-cardinality
    rows — the input is the monthly aggregate (map-side partial
    combine collapses the order scan to |nations|×|months| rows), so
    the window stage is dimension-sized no matter how large orders
    grows; revenue accumulates in DECIMAL so month totals hash
    identically and the division sees exact operands.  Months with no
    orders are absent (gap-filling is q_events_resample_ffill's job)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    monthly = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.round(
                F.sum(F.round("o_totalprice", 2).cast("decimal(18,6)")), 2
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("nationkey").orderBy("y", "m")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "nationkey",
        "y",
        "m",
        F.col("revenue").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        # signed-zero sweep (r13): `+ 0.0` folds a rounded -0.0 to +0.0
        # on every round()-over-signed-double output — the driver's
        # value hash distinguishes signed zeros (r12 rolling_corr fail).
        (
            F.round(
                F.lit(100.0)
                * (F.col("revenue") - prev).cast("double")
                / prev.cast("double"),
                4,
            )
            + F.lit(0.0)
        ).alias("pct_change"),
    )


ROLL_CORR_FRAME = 10  # trailing rows per supplier


@query(
    "q_window_rolling_corr",
    oracle=f"""
SELECT l_suppkey,
       l_orderkey,
       l_linenumber,
       CAST(round(corr(l_quantity, l_extendedprice) OVER w, 4) + 0.0 AS DOUBLE)
           AS roll_corr
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN {ROLL_CORR_FRAME - 1} PRECEDING AND CURRENT ROW)
""",
)
def q_window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING CORRELATION between quantity and price over each
    supplier's last ROLL_CORR_FRAME shipments — the co-movement
    monitor (features drifting apart inside a window is a standard
    pipeline health/feature-engineering signal).

    One window pass partitioned by supplier (shuffle keyed on
    l_suppkey, per-partition sorted frames — no global sort, no
    single-task window).  Pearson's r over a bounded frame is an
    O(1)-state online aggregate in both engines; the deterministic
    frame order (shipdate, orderkey, linenumber) makes the float
    accumulation order identical, and 4-decimal rounding absorbs the
    engines' last-ulp formula differences.  Spark's native ``corr``
    raises DIVIDE_BY_ZERO under ANSI on a one-row frame, so r is
    spelled from five windowed sums with an explicit positive-
    denominator guard — NULL on degenerate frames exactly like
    DuckDB's corr (n = 1 or zero variance)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-(ROLL_CORR_FRAME - 1), 0)
    )
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    n = F.count(F.lit(1)).over(w).cast("double")
    sx, sy = F.sum(x).over(w), F.sum(y).over(w)
    sxx, syy = F.sum(x * x).over(w), F.sum(y * y).over(w)
    sxy = F.sum(x * y).over(w)
    num = n * sxy - sx * sy
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    c = F.when(den2 > 0, num / F.sqrt(den2))
    # ``+ 0.0`` folds IEEE -0.0 to +0.0 after rounding (r12 driver
    # fail: 3 rows where a tiny-negative r rounded to -0.0 in DuckDB
    # and +0.0 in Spark — numerically equal, hash-distinct).  Same
    # normalization on the oracle side.
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.round(c, 4) + F.lit(0.0)).alias("roll_corr"),
    )


@query(
    "q_window_max_drawdown",
    oracle="""
WITH cums AS (
    SELECT o_custkey, o_orderdate, o_orderkey,
           sum(round(o_totalprice, 2)) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS cum
    FROM orders
),
series AS (
    SELECT o_custkey, cum,
           max(cum) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS peak
    FROM cums
)
SELECT o_custkey AS custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(max(peak - cum), 2) AS DOUBLE) AS max_drawdown,
       CAST(round(max(peak), 2) AS DOUBLE) AS peak_cum
FROM series
GROUP BY o_custkey
HAVING count(*) >= 5
""",
)
def q_window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX DRAWDOWN of each customer's cumulative order value — the
    running-peak-minus-current statistic (finance's risk number; in a
    pipeline it flags entities whose cumulative metric stalls hardest
    against its own history — the windowed twin of the CUSUM
    change-point query, which tracks the mirror-image recurrence).

    One customer-keyed window pass computes the cumulative sum AND
    its running max (a window over a window — both on the same
    partitioning, so ONE shuffle and one sort serve both); the
    drawdown then folds per customer.  The summand is rounded to
    cents BEFORE accumulation so both engines add identical values in
    identical order — accumulation-order parity for running sums
    (ADVICE r02 applied to prefix sums, not just final aggregates)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = F.sum(F.round("o_totalprice", 2)).over(w)
    peak = F.max(cum).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    series = orders.select(
        F.col("o_custkey").alias("custkey"),
        cum.alias("cum"),
        peak.alias("peak"),
    )
    return (
        series.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.max(F.col("peak") - F.col("cum")), 2).alias(
                "max_drawdown"
            ),
            F.round(F.max("peak"), 2).alias("peak_cum"),
        )
        .filter(F.col("n_orders") >= 5)
    )
