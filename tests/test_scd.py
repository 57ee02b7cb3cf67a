"""SCD Type 2 merge semantics (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from setup_harvest_action_spark.operators.scd import scd2_merge


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k int, seg string, valid_from date, valid_to date"
    ).select(
        F.col("k"), F.col("seg"), F.col("valid_from"), F.col("valid_to")
    )


def test_scd2_closes_and_opens_versions(spark):
    d0 = dt.date(2024, 1, 1)
    current = _dim(
        spark,
        [(1, "A", d0, None), (2, "B", d0, None), (3, "C", d0, None)],
    )
    updates = spark.createDataFrame(
        [(1, "Z"), (2, "B")], "k int, seg string"  # 1 changes, 2 is same-value
    )
    out = scd2_merge(current, updates, "k", "seg", "2024-06-01").collect()
    by = {}
    for r in out:
        by.setdefault(r["k"], []).append((r["seg"], r["valid_from"], r["valid_to"]))
    # changed key: closed old + open new
    assert sorted(by[1]) == [
        ("A", d0, dt.date(2024, 6, 1)),
        ("Z", dt.date(2024, 6, 1), None),
    ]
    # same-value update and untouched key: single open passthrough
    assert by[2] == [("B", d0, None)]
    assert by[3] == [("C", d0, None)]


def test_scd2_broadcasts_update_batch(spark):
    from setup_harvest_action_spark.catalog import load_catalog

    q, _ = load_catalog()
    df = q["q_scd2_customer_segment"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
