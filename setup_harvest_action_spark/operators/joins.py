"""Join catalog: semi/anti/outer/cross/multi-key/range/as-of.

The reference's join surface is three OPTIONAL patterns (= left outer,
reference: harvest.py:77-79) plus the load path's implicit semi/anti
joins (exists-check at :327-328, INSERT OR IGNORE at :363-372).  Those
semantics are surfaced here as first-class operators, extended with the
§2.2 join breadth (full/right/cross/range/as-of).

Scale notes per join type:
  * semi/anti — plan as hash joins carrying only the key column of the
    right side; the cheapest existence checks at 100 TB.
  * full/right outer — shuffle on the key; AQE handles skew splitting.
  * cross — only ever dimension×dimension (region×nation = 125 rows);
    a fact-side cross join is an anti-pattern and deliberately absent.
  * range — expressed as equi-join + range predicate so Catalyst still
    gets a hash/sort-merge join on the equi key and evaluates the range
    as a cheap post-filter; a pure theta-join (no equi key) would be a
    cartesian product.
  * as-of — implemented as union + partitioned window (one shuffle),
    NOT as a pairwise join + per-key max (two shuffles and a fact×fact
    blowup at scale).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table


@query(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi — customers having at least one big order (the
    reference's exists-check, harvest.py:327-328, as an operator).
    The probe side never widens: only customer columns survive."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti — customers with no pending order (the INSERT OR
    IGNORE dedup idiom, harvest.py:363-372 / constraint at :210)."""
    customer = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    )
    return customer.join(
        pending, customer.c_custkey == pending.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_join_full_outer",
    oracle="""
SELECT n.n_name AS nation,
       CAST(count(c.c_custkey) AS BIGINT) AS n_customers,
       CAST(count(s.s_suppkey) AS BIGINT) AS n_suppliers
FROM (SELECT DISTINCT c_nationkey, c_custkey FROM customer) c
FULL JOIN (SELECT DISTINCT s_nationkey, s_suppkey FROM supplier) s
       ON c.c_nationkey = s.s_nationkey AND c.c_custkey = s.s_suppkey
FULL JOIN nation n ON coalesce(c.c_nationkey, s.s_nationkey) = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """full outer — both unmatched sides survive with nulls; the
    coalesce-of-keys pattern is the reference's OPTIONAL null handling
    (harvest.py:360-361) generalized to two-sided optionality."""
    customer = (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey")
        .distinct()
    )
    supplier = (
        load_table(spark, sf_dir, "supplier")
        .select("s_nationkey", "s_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    both = customer.join(
        supplier,
        (customer.c_nationkey == supplier.s_nationkey)
        & (customer.c_custkey == supplier.s_suppkey),
        "full_outer",
    )
    return (
        both.join(
            nation,
            F.coalesce(both.c_nationkey, both.s_nationkey) == nation.n_nationkey,
            "full_outer",
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.count("s_suppkey").alias("n_suppliers"),
        )
    )


@query(
    "q_join_right_outer",
    oracle="""
SELECT n.n_name AS nation, s.s_suppkey, s.s_name
FROM supplier s
RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
""",
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """right outer — every nation survives even with zero suppliers."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return supplier.join(
        nation, supplier.s_nationkey == nation.n_nationkey, "right"
    ).select(F.col("n_name").alias("nation"), "s_suppkey", "s_name")


@query(
    "q_join_cross",
    oracle="""
SELECT r.r_name, n.n_name
FROM region r CROSS JOIN nation n
""",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cross join — dimension×dimension only (5×25 rows).  The only
    safe cardinality class for a cartesian product at any scale."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


@query(
    "q_join_multikey",
    oracle="""
SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
FROM orders o
JOIN (SELECT o_custkey, max(o_orderdate) AS last_date
      FROM orders GROUP BY o_custkey) m
  ON o.o_custkey = m.o_custkey AND o.o_orderdate = m.last_date
""",
)
def q_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key equi join — each customer's order(s) on their most
    recent order date (groupBy-max then 2-key join back).  Both sides
    hash-partition on the same compound key: one co-located shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    last = orders.groupBy(F.col("o_custkey").alias("m_custkey")).agg(
        F.max("o_orderdate").alias("last_date")
    )
    return (
        orders.join(
            last,
            (orders.o_custkey == last.m_custkey)
            & (orders.o_orderdate == last.last_date),
        )
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "q_join_range",
    oracle="""
SELECT o.o_orderkey,
       CAST(count(*) AS BIGINT) AS n_shipped_within_30d,
       CAST(round(sum(l.l_extendedprice), 2) AS DOUBLE) AS value_shipped
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
WHERE o.o_custkey < 200
GROUP BY o.o_orderkey
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join anchored on an equi key: lineitems shipped within 30
    days of their order's date.  The equi key keeps it a hash join;
    the date range is a residual predicate — no cartesian blowup."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate >= orders.o_orderdate)
            & (li.l_shipdate < F.date_add(orders.o_orderdate, 30)),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipped_within_30d"),
            F.round(F.sum("l_extendedprice"), 2).alias("value_shipped"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts, c.value AS last_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent click at-or-before
    it, per user.

    Implemented as union + partitioned window (`last(..., ignorenulls)`
    over user_id ordered by ts): ONE shuffle on user_id, state bounded
    by one row per side.  The naive pairwise join + groupBy-max is two
    shuffles and an O(purchases × clicks per user) intermediate — this
    form is the one that survives 100 TB.  Ties (click.ts == purchase.ts)
    sort clicks first so same-instant clicks are visible, matching
    ASOF's >= semantics.
    """
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    merged = purchases.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_click"),
        F.col("event_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(None).cast("double").alias("click_value"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("click_ts").alias("ts"),
            F.lit(1).alias("is_click"),
            F.lit(None).cast("long").alias("event_id"),
            "click_ts",
            "click_value",
        )
    )
    # At equal ts the click must sort BEFORE the purchase so the
    # purchase row sees it (ASOF >= semantics): ts asc, is_click desc.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_click"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.select(
            "user_id",
            "ts",
            "event_id",
            F.last("click_ts", ignorenulls=True).over(w).alias("last_click_ts"),
            F.last("click_value", ignorenulls=True).over(w).alias("last_click_value"),
        )
        .filter(F.col("event_id").isNotNull())
        .select("event_id", "user_id", "ts", "last_click_ts", "last_click_value")
    )


JOIN_SALT = 8  # fact-side salt fan-out for the skew-safe join


@query(
    "q_join_salted_skew",
    oracle="""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(e.value), 2) AS DOUBLE) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join — the manual skew idiom for when one key holds
    a disproportionate share of the fact rows and AQE's skew-join
    splitting isn't available (e.g. the build side must shuffle too):
    the fact side gets a deterministic salt in [0, S) so a hot key's
    rows spread over S shuffle partitions; the dimension side is
    replicated S× (explode of a salt sequence) so every salted fact
    row still finds its match; the salt never escapes the join, so
    results are bit-identical to the unsalted plan — which is exactly
    what the oracle checks.

    Salt is ``pmod(xxhash64(event_id), S)`` — deterministic, uniform,
    re-runnable (rand() would break retries: a re-executed task would
    re-salt differently).  Replication cost is |dim|×S rows shuffled,
    the price of spreading the hot key; choose S ≈ skew factor.  This
    fixture's user_ids are uniform, so the query proves the mechanics
    and bit-equivalence, not a speedup — at 100 TB with a genuinely
    hot key this shape is the difference between one straggler task
    and S balanced ones."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    salted_fact = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(JOIN_SALT)).cast("int")
    )
    salted_dim = customer.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALT - 1)))
    )
    return (
        salted_fact.join(
            salted_dim,
            (salted_fact.user_id == salted_dim.c_custkey)
            & (salted_fact.salt == salted_dim.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "q_join_asof_forward",
    oracle="""
WITH merged AS (
  SELECT user_id, ts, 0 AS is_err, event_id, CAST(NULL AS TIMESTAMP) AS err_ts
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 1, NULL, ts FROM events WHERE event_type = 'error'
)
SELECT event_id, user_id, ts, next_error_ts FROM (
  SELECT *, first_value(err_ts IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts ASC, is_err ASC
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_error_ts
  FROM merged
) WHERE event_id IS NOT NULL
""",
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each purchase, the first error at-or-
    after it, per user — the mirror of q_join_asof's backward lookup
    (did this purchase precede a failure?).  Same union + ONE
    user-keyed window idiom, with the frame flipped to CURRENT ROW →
    UNBOUNDED FOLLOWING and ``first(..., ignorenulls)``; at equal ts
    the error sorts after the purchase so same-instant errors are
    visible (>= semantics).  Still one Exchange, state bounded by one
    row per side — the pairwise join + per-key min it replaces is two
    shuffles and a per-user cross product."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts")
    )
    merged = purchases.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_err"),
        "event_id",
        F.lit(None).cast("timestamp").alias("err_ts"),
    ).unionByName(
        errors.select(
            "user_id",
            F.col("err_ts").alias("ts"),
            F.lit(1).alias("is_err"),
            F.lit(None).cast("long").alias("event_id"),
            "err_ts",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("is_err"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        merged.select(
            "event_id",
            "user_id",
            "ts",
            F.first("err_ts", ignorenulls=True).over(w).alias("next_error_ts"),
        )
        .filter(F.col("event_id").isNotNull())
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN c.ts >= p.ts - INTERVAL '1 day' THEN c.ts END
           AS last_click_ts,
       CASE WHEN c.ts >= p.ts - INTERVAL '1 day' THEN c.value END
           AS last_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a lookback TOLERANCE (pandas
    ``merge_asof(tolerance=...)``): the most recent click at-or-before
    each purchase counts only if it happened within the last day —
    stale attributions become NULL instead of reaching back
    arbitrarily far.

    Same single-shuffle union+window plan as q_join_asof; the
    tolerance is a pure post-projection on the matched row, sound
    because the as-of match IS the most recent candidate — if it falls
    outside the window, every other candidate does too.  The oracle
    applies the identical cutoff to DuckDB's ASOF result."""
    base = q_join_asof(spark, sf_dir)
    cutoff = F.col("ts") - F.expr("INTERVAL 1 DAY")
    in_tol = F.col("last_click_ts") >= cutoff
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_tol, F.col("last_click_ts")).alias("last_click_ts"),
        F.when(in_tol, F.col("last_click_value")).alias("last_click_value"),
    )


# Coarse key-space for the hand-rolled runtime join filter: small enough
# to broadcast as a bare key list, large enough that a selective dim
# side leaves most fact buckets prunable.
RUNTIME_FILTER_BUCKETS = 4096


@query(
    "q_join_runtime_filter",
    oracle="""
SELECT o.o_orderkey AS orderkey,
       o.o_orderdate AS orderdate,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2)
            AS DOUBLE) AS revenue
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_orderdate >= TIMESTAMP '1999-01-01'
GROUP BY o.o_orderkey, o.o_orderdate
""",
)
def q_join_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime join-key pre-filter: before the fact⋈dim shuffle join,
    the fact side is semi-joined against the BROADCAST set of distinct
    coarse key buckets (xxhash64 % {RUNTIME_FILTER_BUCKETS}) present on
    the filtered dim side — a hand-rolled, plan-visible equivalent of
    Spark's injected runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.enabled), built from
    DataFrame ops so the pruning is explicit and testable.

    Why it matters at 100 TB: a selective dim predicate (urgent
    + recent orders here) means most fact rows will never find a match
    — but a plain shuffle join still pays to shuffle ALL of them.  The
    bucket set is at most {RUNTIME_FILTER_BUCKETS} longs (a few KB
    broadcast regardless of data size), the membership probe is a
    map-side BroadcastHashJoin LeftSemi evaluated BEFORE the fact
    Exchange, and only surviving rows are shuffled.  The filter is
    conservative (hash collisions pass extra rows, never drop real
    ones), so the final joined result — and the oracle, written as the
    plain join — is exactly unchanged.  Plan contract:
    tests/test_plans.py pins the semi-join below the fact-side
    Exchange."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    )
    bucket_of = lambda c: F.pmod(F.xxhash64(c), F.lit(RUNTIME_FILTER_BUCKETS))
    dim_buckets = dim.select(
        bucket_of(F.col("o_orderkey")).alias("rf_bucket")
    ).distinct()
    fact_pruned = lineitem.join(
        F.broadcast(dim_buckets),
        bucket_of(F.col("l_orderkey")) == F.col("rf_bucket"),
        "left_semi",
    )
    # DECIMAL accumulation (r9): per-order double sums hit
    # accumulation-order rounding ties at sf0.1 (9/11k orders differed
    # in the last cent between engines); prices/discounts are exact at
    # <= 4 decimals, so decimal(18,6) arithmetic is exact and
    # order-independent on both engines at any scale
    dec = lambda c: F.col(c).cast("decimal(18,6)")
    return (
        dim.join(fact_pruned, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))),
                2,
            ).cast("double").alias("revenue")
        )
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            "revenue",
        )
    )


@query(
    "q_join_null_safe",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS channel
  FROM events WHERE event_id < 2000
),
d AS (
  SELECT * FROM (VALUES ('view', 'browse'), ('click', 'browse'),
                        ('purchase', 'buy'), ('signup', 'acquire'),
                        (NULL, 'unattributed')) AS t(channel, family)
)
SELECT e.event_id, e.user_id, d.family
FROM e JOIN d ON e.channel IS NOT DISTINCT FROM d.channel
""",
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics
    attribution tables need when "unknown" is itself a category (here:
    error events carry a NULL channel and must land in the
    'unattributed' family, not vanish as a plain equi-join would make
    them).

    `<=>` stays a hash-joinable equality (EqualNullSafe key, broadcast
    here since the dim is 5 rows) — NOT a theta join; the only scale
    caveat is that all NULL keys hash to one partition, so a
    NULL-heavy fact side behaves like any other hot key (same salting
    remedy as q_join_salted_skew).  The event_id slice keeps the
    oracle comparison bounded; semantics are slice-independent."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            "user_id",
            F.when(F.col("event_type") == "error", F.lit(None))
            .otherwise(F.col("event_type"))
            .alias("channel"),
        )
    )
    dim = ev.sparkSession.createDataFrame(
        [
            ("view", "browse"),
            ("click", "browse"),
            ("purchase", "buy"),
            ("signup", "acquire"),
            (None, "unattributed"),
        ],
        "channel string, family string",
    )
    return ev.join(
        F.broadcast(dim), ev["channel"].eqNullSafe(dim["channel"])
    ).select("event_id", "user_id", "family")


@query(
    "q_join_existence",
    oracle="""
SELECT c.c_custkey,
       c.c_mktsegment,
       c.c_custkey IN (
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
       ) AS has_urgent_order
FROM customer c
""",
)
def q_join_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTENCE (mark) join: every customer row survives, annotated
    with a boolean "has at least one urgent order" — the EXISTS-as-a-
    column shape (DuckDB plans it as a MARK JOIN).  Distinct from
    semi/anti joins, which FILTER rows; a mark join keeps both
    populations in one pass, which is what feature engineering wants
    (the flag IS the feature) and what a semi+anti union would need
    two joins to reproduce.

    Spark has no native existence join in the DataFrame API for this
    projection, so the algebra is: distinct urgent custkeys (aggregate
    BEFORE the join, so the probe side never sees duplicate matches —
    a plain left join against raw orders would duplicate customers),
    then LEFT join + null test.  The distinct side is key-only and
    group-cardinality-bounded; AQE broadcasts it while small, shuffles
    at 100 TB.  Spark's own EXISTS-subquery planning compiles to
    ExistenceJoin internally — this query pins the explicit algebra so
    the shape works on any engine without subquery support."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return customer.join(urgent, "c_custkey", "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("_hit"), F.lit(False)).alias("has_urgent_order"),
    )


ASOF_TOPK = 3  # most recent clicks reported per purchase


@query(
    "q_join_asof_topk",
    oracle=f"""
WITH c AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT user_id, ts, 0 AS is_click, event_id,
         CAST(NULL AS BIGINT) AS crn
  FROM p
  UNION ALL
  SELECT user_id, ts, 1, event_id, rn FROM c
),
lastrn AS (
  SELECT user_id, ts, is_click, event_id,
         max(crn) OVER (
           PARTITION BY user_id
           ORDER BY ts, is_click DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_rn
  FROM m
),
pp AS (
  SELECT user_id, event_id, ts, last_rn
  FROM lastrn WHERE is_click = 0 AND last_rn IS NOT NULL
)
SELECT pp.event_id, pp.user_id, pp.ts,
       CAST(k.back + 1 AS INTEGER) AS k_back,
       c.ts AS click_ts,
       CAST(round(c.value, 4) AS DOUBLE) AS click_value
FROM pp
CROSS JOIN (SELECT unnest(generate_series(0, {ASOF_TOPK - 1})) AS back) k
JOIN c ON c.user_id = pp.user_id AND c.rn = pp.last_rn - k.back
WHERE pp.last_rn - k.back >= 1
""",
)
def q_join_asof_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-NEAREST as-of join: for each purchase, the {ASOF_TOPK} most
    recent clicks at-or-before it, per user — the "last K context
    events" feature join (recent-history features, attribution beyond
    last-touch) that single-row as-of joins cannot express.

    The scalable spelling generalizes q_join_asof's union+window
    idiom WITHOUT unbounded window state: clicks are ranked once per
    user, the merged timeline carries each purchase the RANK of its
    most recent click (`max(rank)` over the preceding frame — O(1)
    window state, where a collect_list of the history would hold
    O(user history) per row), and the K nearest then come from a
    plain EQUI-join on (user, rank − k) after a K-element explode.
    Two keyed shuffles + a K× fan-out on the purchase side only.
    Ties at equal ts order clicks before purchases (ASOF >=
    semantics), event_id as the final deterministic tie-break."""
    events = load_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
            "event_id",
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("click_ts", "event_id")
            ),
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    merged = purchases.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_click"),
        "event_id",
        F.lit(None).cast("long").alias("crn"),
    ).unionByName(
        clicks.select(
            "user_id",
            F.col("click_ts").alias("ts"),
            F.lit(1).alias("is_click"),
            "event_id",
            F.col("rn").cast("long").alias("crn"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_click"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pp = (
        merged.select(
            "user_id",
            "ts",
            "is_click",
            "event_id",
            F.max("crn").over(w).alias("last_rn"),
        )
        .filter((F.col("is_click") == 0) & F.col("last_rn").isNotNull())
        .select(
            "user_id",
            "event_id",
            "ts",
            F.explode(
                F.sequence(F.lit(0), F.lit(ASOF_TOPK - 1))
            ).alias("back"),
            "last_rn",
        )
        .filter(F.col("last_rn") - F.col("back") >= 1)
    )
    return (
        pp.join(
            clicks.select(
                F.col("user_id").alias("c_user"),
                "rn",
                "click_ts",
                "click_value",
            ),
            (F.col("c_user") == F.col("user_id"))
            & (F.col("rn") == F.col("last_rn") - F.col("back")),
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            (F.col("back") + 1).cast("int").alias("k_back"),
            "click_ts",
            F.round("click_value", 4).alias("click_value"),
        )
    )


BUCKET_COUNT = 16  # shared by both sides — co-location requires it


@query(
    "q_join_bucketed_colocated",
    oracle="""
SELECT o.o_orderstatus AS status,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE)
           AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
""",
)
def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE-FREE fact-fact join via native bucketed tables — the
    storage-layout half of the join story (the runtime half is AQE).

    Both fact tables are written ``bucketBy(BUCKET_COUNT, key)`` +
    ``sortBy(key)`` into the session warehouse; Spark records the
    bucket spec in the catalog, so the subsequent orderkey equi-join
    reads MATCHING buckets pairwise and plans a sort-merge join with
    NO Exchange on either side — at 100 TB that deletes the two
    largest shuffles in the pipeline (re-shuffling both fact tables
    per query), which is why warehouses bucket their fact tables once
    at ingest and amortize it over every downstream join.  The only
    exchange left in the plan is the final tiny status rollup
    (plan-pinned in tests/test_plans.py: zero orderkey exchanges,
    bucketed scans on both sides).

    The oracle restates the identical join over the raw fixture views
    — bucketing must be pure layout, never semantics."""
    import shutil

    label = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    db = "shas_buckets"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    lt = f"{db}.lineitem_{label}"
    ot = f"{db}.orders_{label}"
    # a managed table written by a PREVIOUS session leaves its
    # warehouse directory behind while the new session's in-memory
    # catalog has never heard of it — saveAsTable then refuses with
    # LOCATION_ALREADY_EXISTS; drop both the entry and the directory
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in (lt, ot):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(
            os.path.join(warehouse, f"{db}.db", t.split(".")[1]),
            ignore_errors=True,
        )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    (
        li.write.bucketBy(BUCKET_COUNT, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(lt)
    )
    (
        orders.write.bucketBy(BUCKET_COUNT, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(ot)
    )
    return (
        spark.table(lt)
        .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
