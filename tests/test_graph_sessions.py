"""Exact-value tests for batch sessionization and PageRank
(operators/events_analytics.py, functions/graph.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from setup_harvest_action_spark.functions.graph import pagerank


def test_sessionize_breaks_on_gap(spark, monkeypatch):
    """Events 10 min apart share a session; a 40-min gap (> 30-min
    threshold) starts a new one, and bounds/counts/durations follow."""
    import setup_harvest_action_spark.operators.events_analytics as ea

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)
    events = spark.createDataFrame(
        [
            (1, mins(0), 7, "view", 1.0, "{}"),
            (2, mins(10), 7, "click", 2.0, "{}"),
            (3, mins(50), 7, "view", 4.0, "{}"),  # 40-min gap -> new session
            (4, mins(0), 8, "view", 8.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(ea, "load_table", lambda spark, sf_dir, name: events)
    rows = {
        (r["user_id"], r["session_id"]): r
        for r in ea.q_events_sessionize(spark, "").collect()
    }
    assert set(rows) == {(7, 1), (7, 2), (8, 1)}
    s1 = rows[(7, 1)]
    assert s1["n_events"] == 2
    assert s1["session_start"] == mins(0) and s1["session_end"] == mins(10)
    assert s1["duration_sec"] == 600
    assert s1["total_value"] == pytest.approx(3.0)
    s2 = rows[(7, 2)]
    assert s2["n_events"] == 1 and s2["duration_sec"] == 0


def test_pagerank_mass_and_symmetry(spark):
    """On the symmetric path graph a—b—c: total rank mass stays 1 (no
    dangling nodes), the endpoints tie by symmetry, and the center
    out-ranks them."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")],
        "src string, dst string",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-12)
    assert ranks["a"] == pytest.approx(ranks["c"], abs=1e-12)
    assert ranks["b"] > ranks["a"]


def test_pagerank_uniform_on_regular_graph(spark):
    """On a regular graph (directed 3-cycle) PageRank is exactly
    uniform at every iteration — a closed-form check of the
    recurrence."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    for v in ranks.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_sessionize_single_exchange(spark):
    """The user-id hash partitioning must satisfy the lag window, the
    running-sum window AND the (user, session) aggregation — exactly
    one Exchange in the whole plan."""
    from setup_harvest_action_spark.catalog import load_catalog

    q, _ = load_catalog()
    df = q["q_events_sessionize"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_pagerank_never_rescans_events(spark):
    """The returned plan must read only the materialized pair set: the
    unrolled iterations reference edges/degrees/nodes ~10x each, and
    without the lineage cut each reference re-scans the raw events
    source (28 scans measured)."""
    from setup_harvest_action_spark.catalog import load_catalog

    q, _ = load_catalog()
    df = q["q_graph_pagerank"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in plan
    assert "pagerank_pairs" in plan


def test_iterative_checkpoint_dir_knob(spark, tmp_path):
    """connected_components and PageRank accept an explicit
    checkpoint_dir (a cluster job passes a shared-FS path; a
    driver-local mkdtemp would be unreadable by executors there).
    Each call writes a FRESH version under its tag — a previously
    returned frame keeps reading its own files instead of silently
    aliasing onto newer data — and retention keeps at most two
    versions per tag, so repeated calls don't leak a directory each."""
    from setup_harvest_action_spark.functions.dedup import connected_components
    from setup_harvest_action_spark.functions.graph import pagerank_user_item

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "vec_a long, vec_b long"
    )
    ck = str(tmp_path / "ck")
    labels = connected_components(edges, checkpoint_dir=ck)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert (tmp_path / "ck" / "cc_labels").is_dir()

    ranks = pagerank_user_item(spark, "/root/testdata/sf0.001", checkpoint_dir=ck)
    assert ranks.limit(1).count() == 1
    assert (tmp_path / "ck" / "pagerank_pairs").is_dir()

    # a same-tag call on DIFFERENT edges must not corrupt the earlier
    # result: each call gets its own version directory
    edges2 = spark.createDataFrame([(7, 8)], "vec_a long, vec_b long")
    labels2 = connected_components(edges2, checkpoint_dir=ck)
    assert {r["id"] for r in labels2.collect()} == {7, 8}
    assert {r["id"]: r["label"] for r in labels.collect()} == got

    # bounded retention: at most two versions per tag, ever
    app_root = next((tmp_path / "ck" / "cc_labels").iterdir())
    for _ in range(2):
        connected_components(edges, checkpoint_dir=ck).collect()
    versions = sorted(p.name for p in app_root.iterdir())
    assert len(versions) <= 2
def test_cohort_retention_exact(spark, monkeypatch):
    """Hand-built two-cohort timeline: week-1 signup retained in week
    2; week-2 signup active only in its own week; pre-signup activity
    is excluded."""
    import datetime as dt

    import setup_harvest_action_spark.operators.events_analytics as ea

    d = lambda day, h=12: dt.datetime(2026, 6, day, h)  # June 1 2026 = Monday
    events = spark.createDataFrame(
        [
            (1, d(1), 1, "signup", 0.0, "{}"),
            (2, d(9), 1, "click", 0.0, "{}"),    # week offset 1
            (3, d(8), 2, "signup", 0.0, "{}"),   # second cohort
            (4, d(2), 2, "view", 0.0, "{}"),     # BEFORE signup: excluded
            (5, d(10), 2, "click", 0.0, "{}"),   # own week
            (6, d(3), 3, "view", 0.0, "{}"),     # never signs up: excluded
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(ea, "load_table", lambda spark, sf_dir, name: events)
    rows = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in ea.q_events_cohort_retention(spark, "").collect()
    }
    assert rows == {
        ("2026-06-01", 0): 1,
        ("2026-06-01", 1): 1,
        ("2026-06-08", 0): 1,
    }


def test_interval_coverage_matches_bruteforce_merge(spark):
    """Randomized cross-check of the gaps-and-islands running-max
    merge against a brute-force interval union, covering the edge
    cases the idiom is known to get wrong when misspelled with
    lag(end) instead of max(end): long intervals swallowing later
    ones, exact-touch boundaries (s == prev max e -> SAME island under
    the strict > break rule), duplicates, and zero-length claims."""
    import random

    from setup_harvest_action_spark.catalog import load_catalog

    rng = random.Random(20260814)
    rows = []
    eid = 0
    for user in range(8):
        for _ in range(rng.randint(1, 40)):
            s = rng.randint(0, 1000)
            dur = rng.choice([0, 1, rng.randint(1, 50), rng.randint(1, 300)])
            rows.append((eid, user, s, dur))
            eid += 1
    # brute force: per user, merge [s, e] with touching intervals joined
    expected = {}
    by_user: dict = {}
    for _, u, s, d in rows:
        by_user.setdefault(u, []).append((s, s + d))
    for u, iv in by_user.items():
        iv.sort()
        islands = []
        for s, e in iv:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expected[u] = (len(islands), sum(e - s for s, e in islands))

    # write the fixture with pyarrow (timestamp[us], like the real
    # testdata) — the session's own parquet writer emits a timestamp
    # physical type the canonical events schema refuses
    import datetime as dt
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    epoch = dt.datetime(2024, 1, 1)
    table = pa.table({
        "event_id": pa.array([e for e, _, _, _ in rows], pa.int64()),
        "ts": pa.array(
            [epoch + dt.timedelta(minutes=s) for _, _, s, _ in rows],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([u for _, u, _, _ in rows], pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([float(d) for _, _, _, d in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    tmp = tempfile.mkdtemp(prefix="ivcov-")
    try:
        pq.write_table(table, os.path.join(tmp, "events.parquet"))
        q, _ = load_catalog()
        got = {
            r["user_id"]: (r["n_islands"], r["covered_us"] // 60000000)
            for r in q["q_events_interval_coverage"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == expected
