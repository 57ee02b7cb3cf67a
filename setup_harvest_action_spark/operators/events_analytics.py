"""Event analytics over ``events``: funnel attribution and time-grid
resampling with forward fill.

The batch-side complements of the streaming pack (streaming/events.py):
the same event stream, analyzed with rolling event-time windows and
grid joins — the queries a product-analytics / feature-engineering
pipeline runs over 100 TB of event history.

Both queries quantize event time to epoch SECONDS on both engines
(Spark ``unix_timestamp`` truncates; the oracle floors) so RANGE
window frames and bucket arithmetic agree exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.operators.ranked import ranked_ntile

FUNNEL_WINDOW_SEC = 3600  # max gap between funnel steps
RESAMPLE_BUCKET_SEC = 600  # 10-minute resampling grid
RESAMPLE_USERS = 20  # bounded user slice for the grid query


@query(
    "q_events_funnel",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec
    FROM events
),
w AS (
    SELECT user_id, event_type, sec,
           max(CASE WHEN event_type = 'click' THEN sec END) OVER (
               PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN {FUNNEL_WINDOW_SEC} PRECEDING AND CURRENT ROW)
               AS last_click,
           max(CASE WHEN event_type = 'view' THEN sec END) OVER (
               PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN {FUNNEL_WINDOW_SEC} PRECEDING AND CURRENT ROW)
               AS last_view
    FROM e
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(*) FILTER (
           last_click IS NOT NULL AND last_view IS NOT NULL
           AND last_view <= last_click
           AND last_view >= last_click - {FUNNEL_WINDOW_SEC}) AS BIGINT)
           AS n_attributed
FROM w
WHERE event_type = 'purchase'
GROUP BY user_id
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel attribution (view → click → purchase): a purchase is
    attributed when its most recent click lies within 1 h before it AND
    that click's most recent view lies within 1 h before the click —
    most-recent-step attribution over rolling event-time windows.

    One window pass per user (two conditional-max frames over the same
    RANGE window share one sort), then a per-user aggregate.  No
    self-joins: the rolling-frame form scans the events once, which at
    100 TB is the difference between one shuffle and a purchases ×
    clicks × views join explosion."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-FUNNEL_WINDOW_SEC, 0)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("sec"))
    ).over(w)
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("sec"))
    ).over(w)
    attributed = (
        last_click.isNotNull()
        & last_view.isNotNull()
        & (last_view <= last_click)
        & (last_view >= last_click - FUNNEL_WINDOW_SEC)
    )
    return (
        e.select("user_id", "event_type", attributed.alias("attributed"))
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count_if("attributed").alias("n_attributed"),
        )
    )


@query(
    "q_events_resample_ffill",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id, value,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec
    FROM events
    WHERE user_id < {RESAMPLE_USERS}
),
b AS (
    SELECT user_id,
           (sec // {RESAMPLE_BUCKET_SEC}) * {RESAMPLE_BUCKET_SEC} AS bucket,
           count(*) AS n_events,
           arg_max(value, sec * 10000000 + event_id) AS v_last
    FROM e
    GROUP BY 1, 2
),
bounds AS (
    SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM b GROUP BY 1
),
grid AS (
    SELECT user_id, g AS bucket
    FROM bounds, unnest(generate_series(b0, b1, {RESAMPLE_BUCKET_SEC})) AS u(g)
)
SELECT grid.user_id,
       to_timestamp(grid.bucket)::TIMESTAMP AS bucket_ts,
       CAST(coalesce(b.n_events, 0) AS BIGINT) AS n_events,
       CAST(round(last_value(b.v_last IGNORE NULLS) OVER (
           PARTITION BY grid.user_id ORDER BY grid.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS v_filled,
       CAST(b.bucket IS NULL AS BOOLEAN) AS is_gap
FROM grid LEFT JOIN b USING (user_id, bucket)
""",
)
def q_events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: snap each user's events onto a 10-minute
    grid spanning their activity, carry the latest observed value
    forward through empty buckets (``last`` with ignoreNulls), and mark
    the gaps — the gap-filling shape feature-engineering pipelines run
    before training on event histories.

    The grid is generated per user from aggregated bounds (explode of a
    ``sequence`` — no driver-side loop); the per-bucket representative
    is ``max_by`` with a (sec, event_id) composite key, so ties within
    a bucket resolve identically on both engines.  One aggregate + one
    keyed join + one window pass."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < RESAMPLE_USERS
    ).select(
        "user_id", "event_id", "value", F.unix_timestamp("ts").alias("sec")
    )
    bucket = (F.floor(F.col("sec") / RESAMPLE_BUCKET_SEC) * RESAMPLE_BUCKET_SEC)
    b = e.groupBy("user_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max_by(
            "value", F.col("sec") * 10000000 + F.col("event_id")
        ).alias("v_last"),
    )
    # The bounds aggregate is one tiny row per user and lands in ONE
    # partition; exploding the full time grid from it would then run
    # single-task (measured 15.9s at sf0.1).  Re-spread the per-user
    # bounds at shuffle width BEFORE the explode so grid generation
    # parallelizes; the window/join shuffle downstream is on the same
    # key, so no extra Exchange survives.
    grid = (
        b.groupBy("user_id")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "user_id"
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("b0", "b1", F.lit(RESAMPLE_BUCKET_SEC))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            F.timestamp_seconds("bucket").alias("bucket_ts"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.round(
                F.last("v_last", ignorenulls=True).over(w), 2
            ).alias("v_filled"),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


SESSION_GAP_US = 1_800_000_000  # 30-minute inactivity gap, microseconds


@query(
    "q_events_sessionize",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events
),
m AS (
  SELECT *,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id,
       CAST(sid AS INTEGER) AS session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(value), 4) AS DOUBLE) AS total_value,
       CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_sec
FROM s
GROUP BY user_id, sid
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization — the batch counterpart of
    ``q_stream_session_windows``: a session breaks after 30 minutes of
    user inactivity; per session report bounds, event count, value sum
    and duration.

    Classic lag → flag → running-sum → aggregate: one window shuffle
    keyed by user plus one (user, session) aggregation that
    partial-combines map-side.  Gap arithmetic runs on exact integer
    MICROSECONDS on both engines (Spark ``unix_micros`` truncates ns,
    DuckDB's ns→µs parquet conversion also truncates — verified on the
    fixture), so no float time math anywhere.  Order is
    (us, event_id), making session assignment deterministic under
    same-microsecond events.

    Scale ceiling: the per-user window serializes each user into one
    task — measured 8.7 s at a 1.0M-row hot user vs 3.3 s for the
    salted form (SCALE.md §6 pins the crossover: tie at ~330 k rows,
    salted 2.6× faster at ~1 M); q_events_sessionize_salted is the
    documented escape hatch."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    is_new = (prev.isNull() | (F.col("us") - prev > SESSION_GAP_US)).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = e.withColumn("sid", F.sum(is_new).over(run))
    return (
        s.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            ((F.max("us") - F.min("us")) / F.lit(1000000))
            .cast("long")
            .alias("duration_sec"),
        )
        .select(
            "user_id",
            F.col("sid").cast("int").alias("session_id"),
            "session_start",
            "session_end",
            "n_events",
            "total_value",
            "duration_sec",
        )
    )


SESSION_CHUNK_US = 21_600_000_000  # 6-hour salt chunks (>> the gap)


@query(
    "q_events_sessionize_salted",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events
),
m AS (
  SELECT *,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id,
       CAST(sid AS INTEGER) AS session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(value), 4) AS DOUBLE) AS total_value,
       CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_sec
FROM s
GROUP BY user_id, sid
""",
)
def q_events_sessionize_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization with a TIME-CHUNK SALT — the hot-user escape
    hatch for q_events_sessionize, same oracle, same output.  An exact
    ``PARTITION BY user_id`` window puts each user's entire history in
    one task; a celebrity user (the skew probe's user 7 holds ~27% of
    the 10× log) becomes a single-task ceiling.  Here the window key is
    (user, 6-hour chunk), so no task ever sorts more than one user's
    one-chunk slice, and sessions are reassembled EXACTLY in a second,
    log-compressed pass:

      1. sessionize within (user, chunk) — lag → flag → running sum,
         then collapse to SEGMENTS (bounds, count, value sum).  Within
         a chunk, adjacent segments are > gap apart by construction.
      2. merge segments per user — the same lag → flag → running sum
         shape, but over SEGMENT rows (≈ session-cardinality, orders
         of magnitude below event-cardinality), joining chains whose
         boundary gap ≤ the session gap across chunk edges.  Segment
         intervals are disjoint and ordered, so prev max_us vs cur
         min_us is the exact inter-event gap at the seam.

    The per-user phase-2 window is bounded by segments-per-user ≈
    active-chunks + sessions, not events — the 270k-row hot user
    becomes ~a few hundred segment rows.  MEASURED crossover
    (SCALE.md §6, tools/skew_probe.py --hot): at a 330 k-row hot user
    the salt ties the plain form (per-task overhead hides the win);
    at a 1.0M-row hot user it wins 3.3 s vs 8.7 s — 2.6× — and the
    gap widens with the hot user, since phase 2 stays
    segment-cardinality.  Chunking changes NOTHING semantically: a
    session split by a chunk edge has seam gap ≤ gap and re-merges;
    one never merges spuriously because within-chunk seams are > gap."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value", F.unix_micros("ts").alias("us")
    )
    e = e.withColumn(
        "chunk", F.floor(F.col("us") / F.lit(SESSION_CHUNK_US))
    )
    w1 = Window.partitionBy("user_id", "chunk").orderBy("us", "event_id")
    prev = F.lag("us").over(w1)
    is_new = (prev.isNull() | (F.col("us") - prev > SESSION_GAP_US)).cast(
        "long"
    )
    run1 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    segments = (
        e.withColumn("lsid", F.sum(is_new).over(run1))
        .groupBy("user_id", "chunk", "lsid")
        .agg(
            F.min("us").alias("min_us"),
            F.max("us").alias("max_us"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("min_us")
    prev_max = F.lag("max_us").over(w2)
    is_new2 = (
        prev_max.isNull() | (F.col("min_us") - prev_max > SESSION_GAP_US)
    ).cast("long")
    run2 = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = segments.withColumn("sid", F.sum(is_new2).over(run2))
    return (
        merged.groupBy("user_id", "sid")
        .agg(
            F.min("start_ts").alias("session_start"),
            F.max("end_ts").alias("session_end"),
            F.sum("n").alias("n_events"),
            F.round(F.sum("sv"), 4).alias("total_value"),
            ((F.max("max_us") - F.min("min_us")) / F.lit(1000000))
            .cast("long")
            .alias("duration_sec"),
        )
        .select(
            "user_id",
            F.col("sid").cast("int").alias("session_id"),
            "session_start",
            "session_end",
            "n_events",
            "total_value",
            "duration_sec",
        )
    )


@query(
    "q_events_cohort_retention",
    oracle="""
WITH first AS (
  SELECT user_id, min(ts) AS signup_ts,
         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
active AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_trunc('week', e.ts) AS DATE) AS week
  FROM events e JOIN first f USING (user_id)
  WHERE e.ts >= f.signup_ts
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS INTEGER) AS week_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM active
GROUP BY cohort_week, week_offset
""",
)
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the week of their
    first ``signup`` event, counted as retained in every subsequent
    week they produce any event — the product-analytics staple
    (cohort_week × week_offset × n_users).

    Week truncation is ISO-Monday on both engines; offsets are exact
    integer day-diffs of Monday-aligned dates divided by 7, so no
    float time math.  The cohort table (one row per signed-up user)
    rides the join keyed by user_id; both aggregations
    partial-combine, and the (user, week) distinct collapses the
    corpus-scale side to at most |users| × |weeks| rows before the
    final small matrix aggregation."""
    events = load_table(spark, sf_dir, "events")
    first = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
        .select(
            "user_id",
            "signup_ts",
            F.date_trunc("week", "signup_ts").cast("date").alias("cohort_week"),
        )
    )
    active = (
        events.join(first, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", "ts").cast("date").alias("week"),
        )
        .distinct()
    )
    return (
        active.groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "q_events_transitions",
    oracle="""
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
pairs AS (
  SELECT event_type, next_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type,
       CAST(n AS BIGINT) AS n,
       CAST(round(n * 1.0 / sum(n) OVER (PARTITION BY event_type), 6)
            AS DOUBLE) AS share
FROM pairs
""",
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event transition matrix (first-order Markov chain) per
    user journey: for every ordered in-session pair (event, next
    event), the transition count and its share of the source event's
    outgoing edges — the standard product-analytics "where do users go
    after X" summary, and the input to Markov-chain attribution.

    One Exchange on user_id serves the lead() window; the pair counts
    then aggregate to event-type cardinality² rows (tiny), and the
    share renormalization windows over THAT — so everything after the
    first shuffle is vocabulary-sized.  Ordering ties broken by
    event_id so both engines sequence identically."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    share_w = Window.partitionBy("event_type")
    return pairs.withColumn(
        "share", F.round(F.col("n") / F.sum("n").over(share_w), 6)
    )


ANOMALY_BUCKET_SEC = 600  # 10-minute buckets
ANOMALY_TRAIL = 12  # trailing buckets in the rolling baseline


@query(
    "q_events_anomaly",
    oracle=f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '{ANOMALY_BUCKET_SEC} seconds', ts) AS bucket,
         count(*) AS n
  FROM events GROUP BY 1
),
r AS (
  SELECT bucket, CAST(n AS BIGINT) AS n,
         avg(n) OVER w AS mean_n,
         stddev_samp(n) OVER w AS sd_n
  FROM b
  WINDOW w AS (ORDER BY bucket
               ROWS BETWEEN {ANOMALY_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT bucket, n,
       CAST(round(mean_n, 6) AS DOUBLE) AS mean_n,
       CAST(CASE WHEN sd_n > 0 THEN round((n - mean_n) / sd_n, 6) + 0.0 END
            AS DOUBLE) AS z
FROM r
""",
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: 10-minute traffic buckets scored
    by z-score against a rolling {ANOMALY_TRAIL}-bucket trailing
    baseline (mean/stddev exclude the current bucket) — the standard
    ops-analytics spike/drop detector, batch twin of a streaming
    monitor.

    The bucket aggregate is a corpus-wide partial/final count; the
    rolling window then runs over BUCKET-cardinality rows (minutes of
    history, not events), so the single-partition ordered window has
    the same vocabulary-sized economics as q_text_topk_tokens.  z is
    NULL until the baseline has variance (first buckets / constant
    traffic) — identical CASE guard on both engines."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / ANOMALY_BUCKET_SEC).cast("long")
                * ANOMALY_BUCKET_SEC
            ).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("bucket").rowsBetween(-ANOMALY_TRAIL, -1)
    r = b.select(
        "bucket",
        "n",
        F.avg("n").over(w).alias("mean_n"),
        F.stddev_samp("n").over(w).alias("sd_n"),
    )
    return r.select(
        "bucket",
        "n",
        F.round("mean_n", 6).alias("mean_n"),
        # signed-zero sweep (r13): `+ 0.0` folds rounded -0.0 to +0.0
        # (driver hash distinguishes signed zeros; same on the oracle).
        F.when(
            F.col("sd_n") > 0,
            F.round((F.col("n") - F.col("mean_n")) / F.col("sd_n"), 6)
            + F.lit(0.0),
        ).alias("z"),
    )


TOP_PATHS_K = 20  # trigram paths kept


@query(
    "q_events_top_paths",
    oracle=f"""
WITH seq AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
  FROM seq WHERE e3 IS NOT NULL
  GROUP BY 1
)
SELECT path, CAST(n AS BIGINT) AS n,
       CAST(round(n * 1.0 / sum(n) OVER (), 6) AS DOUBLE) AS share
FROM paths
ORDER BY n DESC, path
LIMIT {TOP_PATHS_K}
""",
)
def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigram paths across user journeys — the
    discovery counterpart of the fixed 3-step funnel: instead of
    checking ONE hypothesised sequence, surface the most-travelled
    3-step paths (the input to funnel design and Markov attribution,
    one order up from q_events_transitions' pair matrix).

    Same shuffle discipline as transitions: ONE Exchange on user_id
    serves both lead() offsets, counts collapse to ≤|vocab|³ rows
    (tiny), the share renormalizes over that vocabulary-sized frame,
    and the final top-k folds into TakeOrderedAndProject — at 100 TB
    nothing after the first shuffle scales with the event log.  Ties
    beyond count break on the path string so both engines cut the
    LIMIT identically."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total_w = Window.partitionBy()
    return (
        paths.withColumn(
            "share", F.round(F.col("n") / F.sum("n").over(total_w), 6)
        )
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(TOP_PATHS_K)
    )


@query(
    "q_events_rfm",
    oracle="""
WITH mx AS (SELECT max(ts) AS now FROM events),
base AS (
  SELECT user_id,
         date_diff('day', max(ts), (SELECT now FROM mx)) AS recency_days,
         count(*) AS frequency,
         round(sum(CASE WHEN event_type = 'purchase' THEN value
                        ELSE 0 END), 2) AS monetary
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(monetary AS DOUBLE) AS monetary,
       CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS BIGINT)
           AS m_quintile
FROM base
""",
)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) — the classic
    customer-value matrix: days since each user's last event relative
    to the corpus horizon, total activity, purchase revenue, and a
    monetary quintile.

    One keyed aggregate over the log; the horizon arrives as a
    broadcast one-row max (never a driver-side collect).  The quintile
    runs over |users| rows — an unbounded ENTITY population (billions
    at 100 TB, not a vocabulary), so it uses ranked_ntile's
    range-partitioned rank instead of an unpartitioned ntile window:
    bit-identical assignment, no single-task global sort
    (operators/ranked.py; plan pinned in tests/test_plans.py).
    Quintile ties break on user_id so both engines cut boundaries
    identically."""
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("now"))
    base = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    ).otherwise(0.0)
                ),
                2,
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.datediff(F.to_date("now"), F.to_date("last_ts"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return ranked_ntile(
        base, 5, "monetary", ["user_id"], descending=True, out="m_quintile"
    )


@query(
    "q_events_cdc_apply",
    oracle="""
SELECT user_id, event_type AS last_op,
       CAST(round(value, 4) AS DOUBLE) AS value, ts
FROM (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1 AND event_type <> 'error'
""",
)
def q_events_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog application: collapse a change stream to its final
    snapshot with latest-wins-per-entity semantics and delete handling
    — the batch form of applying a Debezium/binlog feed to a table.
    The event stream is read as a changelog keyed by user_id ('error'
    = tombstone/delete, anything else = upsert); the snapshot keeps
    each entity's most recent change (ordered by ts, tie-broken on
    event_id so replays are deterministic) unless that change is a
    delete, in which case the entity vanishes.

    One shuffle on the entity key; the rn=1 top-1-per-key compiles to
    WindowGroupLimit (partial per-key top-1 BEFORE the exchange —
    pinned in tests/test_plans.py), so the shuffle carries one
    candidate row per (input partition × entity), not the full
    changelog.  At 100 TB this is the compaction pass that turns a
    day's change feed into a queryable snapshot; the streaming twin is
    q_stream_stateful_user_totals's applyInPandasWithState keyed
    state."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.round("value", 4).alias("value"),
            "ts",
        )
    )


INTERVAL_BAND_US = 600_000_000  # 10-minute coarse bands for the interval join


@query(
    "q_join_interval_banded",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us FROM events
),
m AS (
  SELECT *,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
),
sess AS (
  SELECT user_id, sid, min(us) AS us0, max(us) AS us1
  FROM s GROUP BY user_id, sid
),
err AS (SELECT event_id, ts, us FROM e WHERE event_type = 'error')
SELECT err.event_id, err.ts,
       CAST(count(sess.sid) AS BIGINT) AS n_concurrent
FROM err
LEFT JOIN sess ON err.us BETWEEN sess.us0 AND sess.us1
GROUP BY err.event_id, err.ts
""",
)
def q_join_interval_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key, made scalable by
    COARSE BANDING: for each error event, count the user sessions
    (gap-sessionized, any user) whose [start, end] interval contains
    its timestamp — "how much concurrent activity surrounded this
    failure".

    A containment predicate alone gives Catalyst no hash key, so the
    naive form is a BroadcastNestedLoopJoin — points × intervals, dead
    at 100 TB.  The banded form manufactures the equi key: intervals
    EXPLODE to the 10-min bands they overlap (`sequence()` — cost
    Σ duration/band, bounded because gap-sessionization bounds session
    span), each point maps to exactly ONE band, and the join becomes a
    plain hash equi-join on band with containment as a cheap
    post-filter.  No dedup is needed: a session covers a band at most
    once and a point has one band, so pairs are unique by
    construction.  Band width trades explode factor against per-band
    fan-in exactly like the as-of bucketing in streaming joins; the
    plan contract pins the equi-join (no nested-loop node).  The
    oracle runs the honest theta join — affordable at sf0.01,
    impossible at scale, which is the point."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    is_new = (prev.isNull() | (F.col("us") - prev > SESSION_GAP_US)).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        e.withColumn("sid", F.sum(is_new).over(run))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("us0"), F.max("us").alias("us1"))
    )
    band = lambda c: (c / F.lit(INTERVAL_BAND_US)).cast("long")
    banded = sess.select(
        "sid",
        "us0",
        "us1",
        F.explode(F.sequence(band(F.col("us0")), band(F.col("us1")))).alias(
            "band"
        ),
    )
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "us", band(F.col("us")).alias("band")
    )
    return (
        err.join(
            banded,
            (err["band"] == banded["band"])
            & (F.col("us") >= F.col("us0"))
            & (F.col("us") <= F.col("us1")),
            "left",
        )
        .groupBy("event_id", "ts")
        .agg(F.count("sid").alias("n_concurrent"))
    )


@query(
    "q_events_resample_interp",
    oracle=f"""
WITH e AS (
    SELECT user_id, event_id, value,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec
    FROM events
    WHERE user_id < {RESAMPLE_USERS}
),
b AS (
    SELECT user_id,
           (sec // {RESAMPLE_BUCKET_SEC}) * {RESAMPLE_BUCKET_SEC} AS bucket,
           arg_max(value, sec * 10000000 + event_id) AS v_obs
    FROM e
    GROUP BY 1, 2
),
bounds AS (
    SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM b GROUP BY 1
),
grid AS (
    SELECT user_id, g AS bucket
    FROM bounds, unnest(generate_series(b0, b1, {RESAMPLE_BUCKET_SEC})) AS u(g)
),
j AS (
    SELECT grid.user_id, grid.bucket, b.v_obs,
           CASE WHEN b.v_obs IS NOT NULL THEN grid.bucket END AS obs_bucket
    FROM grid LEFT JOIN b USING (user_id, bucket)
),
f AS (
    SELECT *,
           last_value(v_obs IGNORE NULLS) OVER wp AS pv,
           last_value(obs_bucket IGNORE NULLS) OVER wp AS pb,
           first_value(v_obs IGNORE NULLS) OVER wn AS nv,
           first_value(obs_bucket IGNORE NULLS) OVER wn AS nb
    FROM j
    WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
                  ROWS UNBOUNDED PRECEDING),
           wn AS (PARTITION BY user_id ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       to_timestamp(bucket)::TIMESTAMP AS bucket_ts,
       CAST(floor(CASE
           WHEN pv IS NULL THEN nv
           WHEN nv IS NULL THEN pv
           WHEN nb = pb THEN pv
           ELSE pv + (nv - pv) * (bucket - pb) / (nb - pb)
       END * 10000 + 0.5) / 10000 AS DOUBLE) AS v_interp,
       CAST(v_obs IS NULL AS BOOLEAN) AS is_gap
FROM f
""",
)
def q_events_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling — the second gap-fill policy
    beside ffill (q_events_resample_ffill): empty grid buckets take the
    value linearly interpolated between the nearest observations on
    either side (pandas ``interpolate(method='linear')``), with
    one-sided extrapolation pinned to the nearest edge observation.

    Same grid machinery as ffill; the new piece is the BIDIRECTIONAL
    ignore-nulls window pass — last-observation (value, bucket) over
    the preceding frame and first-observation over the following frame
    in ONE window shuffle (both frames share the user_id+bucket sort,
    so Catalyst evaluates them in a single Window node pair over one
    Exchange), then the lerp is pure per-row arithmetic.  Division is
    bucket-index math (exact integers) and the result rounds to a
    shared scale, so both engines agree bitwise."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < RESAMPLE_USERS
    ).select(
        "user_id", "event_id", "value", F.unix_timestamp("ts").alias("sec")
    )
    bucket = (F.floor(F.col("sec") / RESAMPLE_BUCKET_SEC) * RESAMPLE_BUCKET_SEC)
    b = e.groupBy("user_id", bucket.alias("bucket")).agg(
        F.max_by(
            "value", F.col("sec") * 10000000 + F.col("event_id")
        ).alias("v_obs"),
    )
    # The bounds aggregate is one tiny row per user and lands in ONE
    # partition; exploding the full time grid from it would then run
    # single-task (measured 15.9s at sf0.1).  Re-spread the per-user
    # bounds at shuffle width BEFORE the explode so grid generation
    # parallelizes; the window/join shuffle downstream is on the same
    # key, so no extra Exchange survives.
    grid = (
        b.groupBy("user_id")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "user_id"
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("b0", "b1", F.lit(RESAMPLE_BUCKET_SEC))
            ).alias("bucket"),
        )
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "Next observation" is NOT written as a currentRow..unboundedFollowing
    # frame: Spark evaluates that frame type by re-aggregating from each
    # row to the partition end — O(n²) per partition, measured 22s at
    # sf0.1 on 40k-bucket users.  A RUNNING frame over the DESCENDING
    # sort computes the same value incrementally in O(n): scanning from
    # the highest bucket down, the last non-null seen at the current row
    # is exactly the nearest observation at-or-after it.  (The oracle
    # keeps the following-frame spelling — DuckDB streams it fine.)
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = grid.join(b, ["user_id", "bucket"], "left").withColumn(
        "obs_bucket", F.when(F.col("v_obs").isNotNull(), F.col("bucket"))
    )
    pv = F.last("v_obs", ignorenulls=True).over(wp)
    pb = F.last("obs_bucket", ignorenulls=True).over(wp)
    nv = F.last("v_obs", ignorenulls=True).over(wn)
    nb = F.last("obs_bucket", ignorenulls=True).over(wn)
    lerp = (
        F.when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .when(nb == pb, pv)
        .otherwise(pv + (nv - pv) * (F.col("bucket") - pb) / (nb - pb))
    )
    # deterministic decimal cut: floor(x*1e4 + 0.5)/1e4 is pure IEEE
    # arithmetic, identical on both engines; plain round() differs on
    # the .XXXX5 ties the lerp of low-decimal inputs constantly creates
    # (decimal-wise vs binary-wise tie-breaking)
    return j.select(
        "user_id",
        F.timestamp_seconds("bucket").alias("bucket_ts"),
        (F.floor(lerp * 10000 + 0.5) / 10000).alias("v_interp"),
        F.col("v_obs").isNull().alias("is_gap"),
    )


ROLLING_ACTIVE_DAYS = 7  # WAU window


@query(
    "q_events_rolling_active_users",
    oracle=f"""
WITH daily AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM daily),
rolled AS (
  SELECT d.day,
         count(DISTINCT a.user_id) AS wau
  FROM days d
  JOIN daily a
    ON a.day BETWEEN d.day - INTERVAL '{ROLLING_ACTIVE_DAYS - 1} days' AND d.day
  GROUP BY d.day
),
dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY day)
SELECT r.day, CAST(dau.dau AS BIGINT) AS dau, CAST(r.wau AS BIGINT) AS wau,
       CAST(round(dau.dau * 1.0 / r.wau, 6) AS DOUBLE) AS stickiness
FROM rolled r JOIN dau USING (day)
""",
)
def q_events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling {ROLLING_ACTIVE_DAYS}-day WAU / stickiness — the
    canonical engagement dashboard, computed EXACTLY.  Rolling distinct
    does not decompose as a window aggregate (distinct is not
    subtractable), so the scalable exact form is: collapse to the
    (day, user) grid first — the only corpus-sized shuffle — then
    fan each active day out to the {ROLLING_ACTIVE_DAYS} window ends it
    contributes to (`sequence` explode: bounded, ×{ROLLING_ACTIVE_DAYS})
    and count distinct per window end.  Work after the collapse is
    O(active-pairs × window), independent of raw event volume; the
    approximate-at-scale alternative is per-day HLL sketches unioned
    over the window (q_agg_hll_set_algebra's machinery)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    contrib = daily.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), ROLLING_ACTIVE_DAYS - 1),
            )
        ).alias("wday"),
        "user_id",
    )
    ends = daily.select("day").distinct()
    wau = (
        contrib.join(ends, contrib["wday"] == ends["day"], "left_semi")
        .groupBy(F.col("wday").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    dau = daily.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


OVERLAP_USERS = 30  # bounded user slice for the overlap join


@query(
    "q_join_overlap_intervals",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
  WHERE user_id < {OVERLAP_USERS}
),
m AS (
  SELECT *,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
),
sess AS (
  SELECT user_id, sid, min(us) AS us0, max(us) AS us1
  FROM s GROUP BY user_id, sid
)
SELECT a.user_id AS user_a, CAST(a.sid AS BIGINT) AS sid_a,
       b.user_id AS user_b, CAST(b.sid AS BIGINT) AS sid_b,
       CAST((least(a.us1, b.us1) - greatest(a.us0, b.us0)) // 1000000
            AS BIGINT) AS overlap_sec
FROM sess a
JOIN sess b
  ON (a.user_id, a.sid) < (b.user_id, b.sid)
 AND a.us0 <= b.us1 AND b.us0 <= a.us1
""",
)
def q_join_overlap_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL × INTERVAL overlap join — concurrent session pairs
    across users, with their overlap duration.  The second member of
    the banded-join family: where q_join_interval_banded matched
    points into intervals (a point owns ONE band, so pairs were unique
    for free), two intervals can share MANY bands, and a naive banded
    join emits the pair once per shared band.

    The fix is BAND OWNERSHIP, not a distinct pass: every overlapping
    pair is counted exactly once at the band where the overlap STARTS
    — band(max(a.start, b.start)) — which both sides can compute
    locally, so the equi-key is band and the ownership test
    `band == band(greatest(us0_a, us0_b))` is a cheap post-filter.  A
    DISTINCT over the multi-band join would shuffle the inflated pair
    stream; ownership never materializes the duplicates at all.  The
    oracle runs the honest theta join on the bounded slice."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < OVERLAP_USERS
    ).select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    is_new = (prev.isNull() | (F.col("us") - prev > SESSION_GAP_US)).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        e.withColumn("sid", F.sum(is_new).over(run))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("us0"), F.max("us").alias("us1"))
    )
    band = lambda c: (c / F.lit(INTERVAL_BAND_US)).cast("long")
    expand = sess.select(
        "user_id",
        "sid",
        "us0",
        "us1",
        F.explode(F.sequence(band(F.col("us0")), band(F.col("us1")))).alias(
            "band"
        ),
    )
    a = expand.select(
        F.col("user_id").alias("user_a"),
        F.col("sid").alias("sid_a"),
        F.col("us0").alias("a0"),
        F.col("us1").alias("a1"),
        "band",
    )
    b = expand.select(
        F.col("user_id").alias("user_b"),
        F.col("sid").alias("sid_b"),
        F.col("us0").alias("b0"),
        F.col("us1").alias("b1"),
        "band",
    )
    pair_lt = (F.col("user_a") < F.col("user_b")) | (
        (F.col("user_a") == F.col("user_b")) & (F.col("sid_a") < F.col("sid_b"))
    )
    owns = F.col("band") == band(F.greatest("a0", "b0"))
    return (
        a.join(b, "band")
        .filter(pair_lt)
        .filter((F.col("a0") <= F.col("b1")) & (F.col("b0") <= F.col("a1")))
        .filter(owns)
        .select(
            "user_a",
            "sid_a",
            "user_b",
            "sid_b",
            (
                (F.least("a1", "b1") - F.greatest("a0", "b0"))
                / F.lit(1_000_000)
            )
            .cast("long")
            .alias("overlap_sec"),
        )
    )


EWMA_DECAY = 0.9  # per-event decay factor
EWMA_LAST_N = 20  # decay horizon: only the N most recent events score


@query(
    "q_events_time_decay_score",
    oracle=f"""
WITH ranked AS (
  SELECT user_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       CAST(round(sum(value * power({EWMA_DECAY}, rn - 1)), 4) AS DOUBLE)
           AS decay_score,
       CAST(count(*) AS BIGINT) AS n_scored
FROM ranked WHERE rn <= {EWMA_LAST_N}
GROUP BY user_id
""",
)
def q_events_time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially TIME-DECAYED engagement score per user — the
    recency-weighted feature every ranking / recommendation /
    churn-model feature store computes: the i-th most recent event
    contributes value·λ^i, so yesterday's signal outweighs last
    month's with one tunable knob.  The horizon is bounded at the
    {EWMA_LAST_N} most recent events — which is what makes the
    operator well-posed at 100 TB: an unbounded λ^i recurrence needs
    either a sequential scan per user or λ^(-rank) terms that overflow
    IEEE doubles a few thousand events deep; a bounded horizon is one
    per-user WindowGroupLimit cut (literal bound → partial per-
    partition top-N before the shuffle) and a {EWMA_LAST_N}-term sum.

    Decay weights are exact powers computed identically on both
    engines (λ and rank are exact; pow is correctly-rounded libm on
    both); only the final sum is rounded to a shared scale for
    accumulation-order parity.  Ranks tie-break on event_id so the
    horizon cut is deterministic."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.select("user_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= EWMA_LAST_N)
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.pow(F.lit(EWMA_DECAY), F.col("rn") - 1)),
                4,
            ).alias("decay_score"),
            F.count(F.lit(1)).alias("n_scored"),
        )
    )


@query(
    "q_events_interval_coverage",
    oracle="""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e
  FROM events
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER prev IS NULL
                OR s > max(e) OVER prev THEN 1 ELSE 0 END AS brk
  FROM iv
  WINDOW prev AS (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
islands AS (
  SELECT user_id, s, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM marked
),
per AS (
  SELECT user_id, island, min(s) AS ms, max(e) AS me
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(me - ms) AS BIGINT) AS covered_us
FROM per GROUP BY user_id
""",
)
def q_events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-UNION coverage per user (gaps-and-islands merge): each
    event claims [ts, ts + value minutes]; overlapping claims must
    count once, so the answer is the summed length of MERGED islands —
    the SLA/billing/utilization aggregate a plain SUM(duration)
    over-counts and sessionization (which groups by gap between
    POINTS) cannot express.

    Island detection is the running-max idiom: an interval starts a
    new island iff its start exceeds the max end among all EARLIER
    intervals of the same user (sorted by start — lag(end) alone is
    wrong when a long interval swallows later ones); the island id is
    the running sum of those breaks, then two keyed aggregates fold
    islands to (min start, max end) and users to (count, covered).

    Scale shape: ONE shuffle on user_id; both windows and both
    aggregates share that partitioning (the plan shows a single
    Exchange), and every window is per-user — bounded by an entity's
    own event count, with the same celebrity-user caveat (and salted
    escape hatch) as q_events_sessionize.  All arithmetic runs in
    BIGINT epoch-microseconds with an explicit floor() on the one
    double product, because Spark CASTs double→bigint by truncation
    while DuckDB rounds — floor() first makes both engines exact."""
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * F.lit(60000000.0)).cast("bigint")
        ).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max_e = F.max("e").over(w_prev)
    brk = F.when(
        prev_max_e.isNull() | (F.col("s") > prev_max_e), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        iv.withColumn("island", F.sum(brk).over(w_run))
        .groupBy("user_id", "island")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("me") - F.col("ms")).alias("covered_us"),
        )
    )


@query(
    "q_events_interval_coverage_salted",
    oracle="""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e
  FROM events
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER prev IS NULL
                OR s > max(e) OVER prev THEN 1 ELSE 0 END AS brk
  FROM iv
  WINDOW prev AS (PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
islands AS (
  SELECT user_id, s, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM marked
),
per AS (
  SELECT user_id, island, min(s) AS ms, max(e) AS me
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(me - ms) AS BIGINT) AS covered_us
FROM per GROUP BY user_id
""",
)
def q_events_interval_coverage_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval-union coverage with a TIME-CHUNK SALT — the hot-user
    escape hatch for q_events_interval_coverage, same oracle, same
    output, the pattern proven on q_events_sessionize_salted.  The
    exact per-user window puts a celebrity user's whole history in one
    task; here phase 1 merges islands within (user, 6-hour chunk of
    the interval START) and phase 2 re-merges the ISLAND SUMMARIES per
    user with the identical running-max rule.

    Exactness needs no seam argument at all (unlike sessionization):
    interval UNION is grouping-invariant — merging any subset into
    islands and then merging the island summaries yields the same
    connected components and the same total measure, because an island
    summary [min s, max e] covers exactly its members' union.  An
    interval reaching past its chunk's edge simply makes its island's
    max_e cross the boundary, and phase 2's running max picks it up.
    The phase-2 window is bounded by islands-per-user (≈ active chunks
    + true islands), orders of magnitude below event cardinality —
    the skew probe's 300k-row hot user collapses to its chunk count."""
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * F.lit(60000000.0)).cast("bigint")
        ).alias("e"),
    ).withColumn("chunk", F.floor(F.col("s") / F.lit(SESSION_CHUNK_US)))
    w1_prev = (
        Window.partitionBy("user_id", "chunk")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w1_run = (
        Window.partitionBy("user_id", "chunk")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p1 = F.max("e").over(w1_prev)
    brk1 = F.when(p1.isNull() | (F.col("s") > p1), F.lit(1)).otherwise(
        F.lit(0)
    )
    islands = (
        iv.withColumn("island", F.sum(brk1).over(w1_run))
        .groupBy("user_id", "chunk", "island")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
    )
    w2_prev = (
        Window.partitionBy("user_id")
        .orderBy("ms", "me")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w2_run = (
        Window.partitionBy("user_id")
        .orderBy("ms", "me")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p2 = F.max("me").over(w2_prev)
    brk2 = F.when(p2.isNull() | (F.col("ms") > p2), F.lit(1)).otherwise(
        F.lit(0)
    )
    return (
        islands.withColumn("gid", F.sum(brk2).over(w2_run))
        .groupBy("user_id", "gid")
        .agg(F.min("ms").alias("gms"), F.max("me").alias("gme"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("gme") - F.col("gms")).alias("covered_us"),
        )
    )



ATTRIB_WINDOW_DAYS = 7  # lookback for touch attribution


@query(
    "q_events_attribution",
    oracle=f"""
WITH purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
         round(value, 4) AS amount
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
touched AS (
  SELECT p.purchase_id, p.user_id, p.amount,
         max_by(c.click_id,
                lpad(CAST(epoch_us(c.click_ts) AS VARCHAR), 20, '0') ||
                lpad(CAST(c.click_id AS VARCHAR), 12, '0')) AS last_click_id,
         min_by(c.click_id,
                lpad(CAST(epoch_us(c.click_ts) AS VARCHAR), 20, '0') ||
                lpad(CAST(c.click_id AS VARCHAR), 12, '0')) AS first_click_id,
         CAST(count(c.click_id) AS BIGINT) AS n_touches
  FROM purchases p LEFT JOIN clicks c
    ON c.user_id = p.user_id
   AND c.click_ts <= p.purchase_ts
   AND c.click_ts > p.purchase_ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAY
  GROUP BY p.purchase_id, p.user_id, p.amount
)
SELECT purchase_id, user_id,
       CAST(amount AS DOUBLE) AS amount,
       first_click_id, last_click_id, n_touches
FROM touched
""",
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOUCH ATTRIBUTION — first- and last-click within a
    {ATTRIB_WINDOW_DAYS}-day lookback for every purchase: the
    marketing-analytics join that decides which interaction gets
    credit.  Purchases with no clicks in the window keep NULL touch
    ids (the 'direct' bucket) and n_touches = 0.

    Plan shape: a user-keyed equi-join with a RANGE predicate riding
    it (never a cartesian — the hash join is on user_id, the time
    window filters within the matched user's clicks), then min_by /
    max_by argmin aggregates pick the first/last touch in ONE pass —
    no per-purchase window sort, no self-join to recover the winning
    row.  Ties on click_ts break by click_id via a fixed-width
    digit-string ordering key (lexicographic ≡ numeric), so attribution is deterministic on both engines.
    At 100 TB both sides shuffle once on user_id; a hot user is
    bounded by the lookback window (and the salted-sessionization
    trick applies the same way if one user dominates)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.round("value", 4).alias("amount"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            > F.col("purchase_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS")
        ),
        "left",
    )
    # fixed-width digit string: lexicographic == (ts, id) numeric order,
    # and — unlike a struct key — identical max_by semantics in DuckDB
    order_key = F.concat(
        F.lpad(F.unix_micros("click_ts").cast("string"), 20, "0"),
        F.lpad(F.col("click_id").cast("string"), 12, "0"),
    )
    return (
        joined.groupBy("purchase_id", "user_id", "amount")
        .agg(
            F.max_by("click_id", order_key).alias("last_click_id"),
            F.min_by("click_id", order_key).alias("first_click_id"),
            F.count("click_id").cast("long").alias("n_touches"),
        )
        .select(
            "purchase_id",
            "user_id",
            F.col("amount").cast("double").alias("amount"),
            "first_click_id",
            "last_click_id",
            "n_touches",
        )
    )


MB_MIN_PAIR_SUPPORT = 3  # orders containing the pair (absolute floor)


@query(
    "q_market_basket_rules",
    oracle=f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM baskets),
item AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS item_n
  FROM baskets GROUP BY l_partkey
),
pair AS (
  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
         CAST(count(*) AS BIGINT) AS pair_n
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {MB_MIN_PAIR_SUPPORT}
)
SELECT p.item_a, p.item_b, p.pair_n,
       CAST(round(p.pair_n * 1.0 / n.n_orders, 6) AS DOUBLE) AS support,
       CAST(round(p.pair_n * 1.0 / ia.item_n, 6) AS DOUBLE)
         AS confidence_a_to_b,
       CAST(round(p.pair_n * 1.0 * n.n_orders / (ia.item_n * ib.item_n), 4)
            AS DOUBLE) AS lift
FROM pair p
JOIN item ia ON ia.l_partkey = p.item_a
JOIN item ib ON ib.l_partkey = p.item_b
CROSS JOIN n
""",
)
def q_market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET association rules (support / confidence / lift)
    over order baskets — the co-occurrence-mining family's
    probabilistic reading (the raw pair counts already feed the graph
    operators): for every part pair co-purchased in ≥
    {MB_MIN_PAIR_SUPPORT} orders, emit pair support, the A→B
    confidence, and lift (how much more often the pair occurs than
    independence predicts — the recommender/merchandising signal).

    Scale shape: the self-join runs on the DEDUPLICATED basket table
    keyed by order — per-order pair fan-out is basket_size², the
    classic A-priori candidate step, with the absolute support floor
    applied at the first aggregate so downstream joins carry only
    surviving pairs; item totals and the basket count join back at
    VOCABULARY size (item count), and the basket count rides as a
    broadcast one-row aggregate.  All ratios divide exact BIGINTs —
    engine-identical doubles.  A hot item (in every basket) costs
    O(baskets × its basket sizes) pair rows — the documented cap
    lever is a per-item basket-count ceiling, the MAX_SHINGLE_DF
    analogue (SCALE.md §1)."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = baskets.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    item = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("item_n")
    )
    a = baskets.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item_a")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item_b")
    )
    pair = (
        a.join(b, "ok")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_n"))
        .filter(F.col("pair_n") >= MB_MIN_PAIR_SUPPORT)
    )
    ia = item.select(
        F.col("l_partkey").alias("item_a"), F.col("item_n").alias("a_n")
    )
    ib = item.select(
        F.col("l_partkey").alias("item_b"), F.col("item_n").alias("b_n")
    )
    return (
        pair.join(ia, "item_a")
        .join(ib, "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            "pair_n",
            F.round(F.col("pair_n") / F.col("n_orders"), 6)
            .cast("double")
            .alias("support"),
            F.round(F.col("pair_n") / F.col("a_n"), 6)
            .cast("double")
            .alias("confidence_a_to_b"),
            F.round(
                F.col("pair_n")
                * F.col("n_orders")
                / (F.col("a_n") * F.col("b_n")),
                4,
            )
            .cast("double")
            .alias("lift"),
        )
    )


CUSUM_BUCKET_SEC = 600  # 10-minute traffic buckets (the anomaly grid)


@query(
    "q_events_cusum",
    oracle=f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '{CUSUM_BUCKET_SEC} seconds', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
stats AS (
  SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mu,
         sqrt((sum(n * n) - CAST(sum(n) AS DOUBLE) * sum(n) / count(*))
              / (count(*) - 1)) AS sigma
  FROM b
),
d AS (
  SELECT bucket, n, mu, sigma,
         n - mu - 0.5 * sigma AS dev
  FROM b CROSS JOIN stats
),
p AS (
  SELECT bucket, n, sigma,
         sum(dev) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
  FROM d
),
c AS (
  SELECT bucket, n, sigma, pre,
         pre - least(0, min(pre) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum
  FROM p
)
SELECT bucket, n, CAST(round(cusum, 4) AS DOUBLE) AS cusum_pos
FROM c WHERE cusum > 4 * sigma
""",
)
def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over 10-minute traffic buckets —
    the drift detector beside the z-score spike detector
    (`q_events_anomaly`): a z-score sees one loud bucket, CUSUM
    accumulates many quiet upward deviations and alarms on sustained
    level shifts (the Page 1954 control chart; slack k = σ/2,
    threshold h = 4σ, textbook settings).

    The clamped recurrence S_i = max(0, S_{{i-1}} + d_i) is not a
    window aggregate — but it has a closed form window functions CAN
    express: S_i = P_i − min(0, min_{{j≤i}} P_j) where P is the plain
    prefix sum of deviations.  Both windows run ordered over the
    BUCKET grid (time-bucketed cardinality, not raw events — the
    collapse-then-window discipline), and the ordered prefix sums add
    doubles in the same deterministic order on both engines, so the
    hash oracle holds despite float accumulation.  Corpus-level mean
    and σ derive from exact integer sums (counts and squared counts)
    and ride in as a broadcast one-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        F.window("ts", f"{CUSUM_BUCKET_SEC} seconds")["start"].alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    stats = b.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.sqrt(
            (
                F.sum(F.col("n") * F.col("n"))
                - F.sum("n").cast("double") * F.sum("n") / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("sigma"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    d = b.crossJoin(F.broadcast(stats)).select(
        "bucket",
        "n",
        "sigma",
        (F.col("n") - F.col("mu") - 0.5 * F.col("sigma")).alias("dev"),
    )
    p = d.select(
        "bucket", "n", "sigma", F.sum("dev").over(w).alias("pre")
    )
    c = p.select(
        "bucket",
        "n",
        "sigma",
        (
            F.col("pre")
            - F.least(F.lit(0.0), F.min("pre").over(w))
        ).alias("cusum"),
    )
    return c.filter(F.col("cusum") > 4 * F.col("sigma")).select(
        "bucket", "n", F.round("cusum", 4).cast("double").alias("cusum_pos")
    )


SEASONAL_BUCKET_SEC = 3600  # hourly buckets profiled by hour-of-day
SEASONAL_Z = 2.5


@query(
    "q_events_seasonal_anomaly",
    oracle=f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '{SEASONAL_BUCKET_SEC} seconds', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
r AS (
  SELECT bucket, n,
         CAST(extract(hour FROM bucket) AS INTEGER) AS hod,
         avg(n) OVER w AS mean_hod,
         stddev_samp(n) OVER w AS sd_hod,
         CAST(count(*) OVER w AS BIGINT) AS k_days
  FROM b
  WINDOW w AS (PARTITION BY extract(hour FROM bucket))
)
SELECT bucket, hod, n, k_days,
       CAST(round(mean_hod, 6) AS DOUBLE) AS mean_hod,
       CAST(CASE WHEN sd_hod > 0 THEN round((n - mean_hod) / sd_hod, 6) + 0.0 END
            AS DOUBLE) AS seasonal_z,
       CASE WHEN sd_hod > 0
            THEN abs(n - mean_hod) / sd_hod > {SEASONAL_Z} END AS is_anomaly
FROM r
""",
)
def q_events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL anomaly detection — the complement of
    q_events_anomaly's trailing window: each hourly bucket is scored
    against the profile of the SAME hour-of-day across the whole
    span, so a quiet 3 am is normal even though the trailing-window
    detector would flag the nightly drop, and a quiet 3 PM is an
    anomaly even if traffic declined gradually enough to fool the
    trailing baseline.

    The bucket aggregate is one corpus-wide partial/final count; the
    profile window then runs PARTITIONED BY hour-of-day over
    bucket-cardinality rows (24 partitions of days-of-history rows —
    never a single-task global window, never event-scale data).  z
    and the flag are NULL until an hour's profile has variance —
    identical CASE guard both engines; the flag compares the
    UNROUNDED score (threshold rule, ADVICE r02)."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / SEASONAL_BUCKET_SEC).cast("long")
                * SEASONAL_BUCKET_SEC
            ).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(F.hour("bucket"))
    mean_hod = F.avg("n").over(w)
    sd_hod = F.stddev_samp("n").over(w)
    z = (F.col("n") - mean_hod) / sd_hod
    return b.select(
        "bucket",
        F.hour("bucket").alias("hod"),
        "n",
        F.count(F.lit(1)).over(w).alias("k_days"),
        F.round(mean_hod, 6).alias("mean_hod"),
        F.when(sd_hod > 0, F.round(z, 6) + F.lit(0.0)).alias("seasonal_z"),
        F.when(sd_hod > 0, F.abs(z) > SEASONAL_Z).alias("is_anomaly"),
    )


KM_CENSOR_DAYS = 5  # users active in the final window are censored


@query(
    "q_events_kaplan_meier",
    oracle=f"""
WITH bounds AS (SELECT max(ts) AS tmax FROM events),
pu AS (
    SELECT CAST(date_diff('day', CAST(min(ts) AS DATE),
                          CAST(max(ts) AS DATE)) AS INTEGER) AS dur,
           CAST(max(ts) < (SELECT tmax FROM bounds)
                          - INTERVAL {KM_CENSOR_DAYS} DAY AS INTEGER)
               AS churned
    FROM events GROUP BY user_id
),
km AS (
    SELECT dur,
           CAST(sum(churned) AS BIGINT) AS d,
           CAST(count(*) AS BIGINT) AS c
    FROM pu GROUP BY dur
),
r AS (
    SELECT dur, d, c,
           sum(c) OVER () - coalesce(sum(c) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
    FROM km
)
SELECT dur, d, c, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CASE WHEN max(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END)
                 OVER cum = 1
            THEN 0.0
            ELSE CAST(round(exp(sum(CASE WHEN d < n_at_risk
                                         THEN ln(1 - d * 1.0 / n_at_risk)
                                    END) OVER cum), 6) AS DOUBLE)
       END AS survival
FROM r
WINDOW cum AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)
""",
)
def q_events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN–MEIER survival estimation of user lifetime (time from
    first to last event, right-censored for users still active within
    KM_CENSOR_DAYS of the corpus edge) — the churn/retention curve
    product analytics reads daily, and a genuinely different shape
    from the cohort-retention matrix: censoring means simply averaging
    lifetimes is biased, and the K-M product over at-risk counts is
    the standard unbiased estimator (public method, Kaplan & Meier
    1958).

    The cumulative product is spelled ``exp(sum(ln(1 - d/n)))`` so
    both engines accumulate in the identical order; the zero-survival
    edge (a duration where every remaining user churns) short-circuits
    through a flag instead of ln(0).  Scale shape: one user-keyed
    aggregate over the corpus, a broadcast one-row corpus max, then
    every window runs over DURATION-cardinality rows (days of
    observation, not users) — the q_events_anomaly economics."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.max("ts").alias("tmax"))
    pu = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(bounds))
        .select(
            F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias(
                "dur"
            ),
            (
                F.col("last_ts")
                < F.col("tmax") - F.expr(f"INTERVAL {KM_CENSOR_DAYS} DAY")
            )
            .cast("int")
            .alias("churned"),
        )
    )
    km = pu.groupBy("dur").agg(
        F.sum("churned").alias("d"), F.count(F.lit(1)).alias("c")
    )
    w_prev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_at_risk = F.sum("c").over(w_all) - F.coalesce(
        F.sum("c").over(w_prev), F.lit(0)
    )
    r = km.withColumn("n_at_risk", n_at_risk)
    dead = F.max(
        F.when(F.col("d") >= F.col("n_at_risk"), 1).otherwise(0)
    ).over(w_cum)
    ln_term = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.log(1 - F.col("d") / F.col("n_at_risk")),
    )
    survival = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(ln_term).over(w_cum)), 6)
    )
    return r.select(
        "dur", "d", "c", "n_at_risk", survival.alias("survival")
    )


@query(
    "q_events_longest_streak",
    oracle="""
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
grp AS (
    SELECT user_id, day,
           day - CAST(row_number() OVER (PARTITION BY user_id
                                         ORDER BY day) AS INTEGER)
               AS island
    FROM days
),
streaks AS (
    SELECT user_id, island,
           CAST(count(*) AS BIGINT) AS len,
           min(day) AS streak_start
    FROM grp GROUP BY user_id, island
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       min(streak_start) FILTER (
           WHERE len = (SELECT max(s2.len) FROM streaks s2
                        WHERE s2.user_id = streaks.user_id)
       ) AS first_longest_start,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM streaks
GROUP BY user_id
""",
)
def q_events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity STREAK per user — the
    gaps-and-islands pattern (the complement of
    q_window_sequence_gaps' gap detection): distinct activity days,
    island id = day minus the user-partitioned day rank (constant
    exactly while days are consecutive), then per-island lengths roll
    up to the user's longest streak, its first start date, and streak
    count — the engagement metric behind every 'N-day streak' badge.

    All windows are USER-partitioned over per-user distinct days
    (bounded by the observation span, ~30 rows here) — no global
    window, one shuffle keyed on user_id that every later aggregate
    reuses.  The correlated max in the oracle is spelled as one more
    window on the Spark side — same tie rule (earliest start wins)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("streak_start")
    )
    wu = Window.partitionBy("user_id")
    best = F.max("len").over(wu)
    return (
        streaks.withColumn("best", best)
        .groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.min(
                F.when(F.col("len") == F.col("best"), F.col("streak_start"))
            ).alias("first_longest_start"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
    )


ACF_BUCKET_SEC = 600  # traffic series resolution
ACF_MAX_LAG = 3


@query(
    "q_events_autocorrelation",
    oracle=f"""
WITH b AS (
    SELECT time_bucket(INTERVAL '{ACF_BUCKET_SEC} seconds', ts) AS bucket,
           CAST(count(*) AS DOUBLE) AS n
    FROM events GROUP BY 1
),
lagged AS (
    SELECT n,
           lag(n, 1) OVER w AS n1,
           lag(n, 2) OVER w AS n2,
           lag(n, 3) OVER w AS n3
    FROM b WINDOW w AS (ORDER BY bucket)
)
SELECT 1 AS lag, CAST(round(corr(n, n1), 4) + 0.0 AS DOUBLE) AS acf,
       CAST(count(n1) AS BIGINT) AS n_pairs FROM lagged
UNION ALL
SELECT 2, CAST(round(corr(n, n2), 4) + 0.0 AS DOUBLE),
       CAST(count(n2) AS BIGINT) FROM lagged
UNION ALL
SELECT 3, CAST(round(corr(n, n3), 4) + 0.0 AS DOUBLE),
       CAST(count(n3) AS BIGINT) FROM lagged
""",
)
def q_events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..{ACF_MAX_LAG} AUTOCORRELATION of the event-rate series —
    the seasonality/burstiness fingerprint read before choosing an
    anomaly detector (high lag-k ACF at the daily period says use the
    seasonal profile, near-zero says the trailing window suffices).

    The bucket count is one corpus-wide partial/final aggregate; the
    lag window and the corr aggregates then run over
    BUCKET-cardinality rows (the q_events_anomaly economics — a
    series of minutes, not events).  Pearson corr here is the plain
    corr AGGREGATE over non-null (n, lag) pairs, identical
    definitions both engines, 4-decimal rounding."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / ACF_BUCKET_SEC).cast("long")
                * ACF_BUCKET_SEC
            ).alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    w = Window.orderBy("bucket")
    lagged = b.select(
        "n",
        *[F.lag("n", k).over(w).alias(f"n{k}") for k in range(1, ACF_MAX_LAG + 1)]
    )
    parts = []
    for k in range(1, ACF_MAX_LAG + 1):
        parts.append(
            lagged.agg(
                F.lit(k).alias("lag"),
                (F.round(F.corr("n", f"n{k}"), 4) + F.lit(0.0)).alias("acf"),
                F.count(f"n{k}").alias("n_pairs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


BURST_BUCKET_SEC = 600
BURST_FACTOR = 1.25  # a bucket is HOT when above FACTOR x median rate


@query(
    "q_events_bursts",
    oracle=f"""
WITH b AS (
    SELECT time_bucket(INTERVAL '{BURST_BUCKET_SEC} seconds', ts) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
),
med AS (SELECT quantile_cont(CAST(n AS DOUBLE), 0.5) AS m FROM b),
hot AS (
    SELECT bucket, n,
           CAST(row_number() OVER (ORDER BY bucket) AS BIGINT) AS rn
    FROM b, med WHERE n > {BURST_FACTOR} * med.m
),
islands AS (
    SELECT bucket, n,
           bucket - rn * INTERVAL '{BURST_BUCKET_SEC} seconds' AS island
    FROM hot
)
SELECT min(bucket) AS burst_start,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(max(n) AS BIGINT) AS peak_rate
FROM islands
GROUP BY island
""",
)
def q_events_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURST SEGMENTATION — the complement of the anomaly scorers:
    instead of scoring buckets, SEGMENT contiguous runs of above-
    threshold traffic into burst episodes (start, length, volume,
    peak), the unit an incident review or rate-limiter postmortem
    actually talks about.  Hot = above BURST_FACTOR x the median
    bucket rate (median, not mean — the bursts themselves would drag
    a mean threshold up); contiguity via gaps-and-islands on the
    bucket timeline (bucket minus rank·width is constant exactly
    within a run).

    Scale: one corpus-wide bucket count, a broadcast one-row median,
    then every window runs over bucket-cardinality rows (the
    q_events_anomaly economics)."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / BURST_BUCKET_SEC).cast("long")
                * BURST_BUCKET_SEC
            ).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    med = b.agg(F.median(F.col("n").cast("double")).alias("m"))
    hot = (
        b.crossJoin(F.broadcast(med))
        .filter(F.col("n") > BURST_FACTOR * F.col("m"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy("bucket")).cast("long")
        )
    )
    islands = hot.withColumn(
        "island",
        F.col("bucket")
        - (F.col("rn") * BURST_BUCKET_SEC).cast("interval second"),
    )
    return islands.groupBy("island").agg(
        F.min("bucket").alias("burst_start"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("peak_rate"),
    ).drop("island")


WAU_DAYS = 7  # trailing window for weekly-active


@query(
    "q_events_active_users",
    oracle=f"""
WITH ud AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (
    SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
),
covers AS (
    SELECT day + CAST(off AS INTEGER) AS day, user_id
    FROM ud, (SELECT unnest(range({WAU_DAYS})) AS off)
),
wau AS (
    SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM covers GROUP BY day
)
SELECT d.day, d.dau, w.wau,
       CAST(round(d.dau * 1.0 / w.wau, 6) AS DOUBLE) AS stickiness
FROM dau d JOIN wau w ON w.day = d.day
""",
)
def q_events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-{WAU_DAYS}-day WAU / stickiness (DAU÷WAU) — the
    engagement dashboard row.  Distinct-users-over-a-trailing-window
    is NOT a window aggregate (COUNT DISTINCT has no frame-mergeable
    state), so WAU is computed by the bounded-expansion trick: each
    (user, active-day) pair fans out to the {WAU_DAYS} calendar days
    it keeps the user weekly-active for, then one distinct count per
    day — expansion factor = the window length, a constant, and every
    step is a keyed aggregate with map-side combine.  Days with no
    DAU row (user active only in the preceding week) drop via the
    inner join, matching the oracle.  The same shape scales to MAU
    with factor 30 — the factor, not the corpus, is the knob."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    covers = ud.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(WAU_DAYS - 1)),
                lambda off: F.date_add(F.col("day"), off),
            )
        ).alias("day"),
        "user_id",
    )
    wau = covers.groupBy("day").agg(
        F.count_distinct("user_id").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
    )


@query(
    "q_events_cadence",
    oracle="""
WITH gaps AS (
    SELECT user_id,
           epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)) AS gap_s
    FROM events
)
SELECT user_id,
       CAST(count(gap_s) AS BIGINT) AS n_gaps,
       CAST(round(quantile_cont(gap_s, 0.5), 3) AS DOUBLE) AS median_gap_s,
       CAST(round(quantile_cont(gap_s, 0.9), 3) AS DOUBLE) AS p90_gap_s,
       CAST(round(max(gap_s), 3) AS DOUBLE) AS max_gap_s
FROM gaps
WHERE gap_s IS NOT NULL
GROUP BY user_id
""",
)
def q_events_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ENGAGEMENT CADENCE: median / p90 / max inter-event
    gap — the rhythm metric behind churn-risk scoring (a user whose
    median gap doubles is leaving long before their last event) and
    the empirical input for picking session/watermark widths.

    One lag window per user (shuffle keyed on user_id) computes the
    gap stream; exact grouped percentiles reduce it per user — Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the
    interpolated definition (the q_quality_robust_zscore parity), and
    each user's gap list is bounded by their event count, the same
    bound every grouped exact percentile in the repo carries."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts.cast(double) keeps sub-second precision — epoch seconds with
    # the microsecond fraction, matching DuckDB's epoch(interval)
    ts_s = F.col("ts").cast("double")
    gaps = ev.select(
        "user_id",
        (ts_s - F.lag(ts_s).over(w)).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 3).alias("median_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 3).alias("p90_gap_s"),
        F.round(F.max("gap_s"), 3).alias("max_gap_s"),
    )
