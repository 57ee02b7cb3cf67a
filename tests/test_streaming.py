"""Streaming semantics tests: watermark late-data handling.

The catalog's streaming queries are oracle-checked for batch
equivalence; what the oracle CANNOT show is watermark behavior across
micro-batches — that rows behind the watermark are dropped and that
append mode only emits watermark-closed windows.  This test runs the
same checkpointed query twice (two AvailableNow runs): run 1 ingests
the on-time file and advances the watermark; run 2 ingests a file
containing a late row for an already-closed window and asserts the
drop.
"""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F


def _write_part(spark, flat: str, name: str, rows, order: int) -> None:
    tmp = os.path.join(flat, f"_tmp_{name}")
    df = spark.createDataFrame(rows, "ts timestamp, v long").coalesce(1)
    df.write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = os.path.join(flat, f"{name}.parquet")
    os.rename(os.path.join(tmp, part), dst)
    ts = 1_700_000_000 + order * 60
    os.utime(dst, (ts, ts))


def _run_once(spark, flat: str, checkpoint: str, sink_dir: str) -> dict:
    # Parquet file sink: append-mode, checkpoint-recoverable (the
    # memory sink cannot restart from a checkpoint).  The sink
    # accumulates across runs, so results are CUMULATIVE emissions.
    stream = spark.readStream.schema("ts timestamp, v long").parquet(flat)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .select(F.col("window.start").alias("ws"), "n", "sv")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        r["ws"].hour: (r["n"], r["sv"])
        for r in spark.read.parquet(sink_dir).collect()
    }


def test_watermark_drops_late_rows_and_append_emits_closed_windows(
    spark, tmp_path
):
    flat = str(tmp_path / "src")
    os.makedirs(flat)
    checkpoint = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    t = lambda h, m=0: dt.datetime(2026, 3, 1, h, m)

    # Run 1: one event in the 10:00 window, two in the 12:00 window.
    # Watermark advances to 12:10 - 30min = 11:40; AvailableNow's final
    # no-data batch then flushes the closed 10:00-11:00 window.  The
    # open 12:00 window is withheld (append semantics).
    _write_part(spark, flat, "f1", [(t(10, 0), 1), (t(12, 0), 2), (t(12, 10), 3)], 0)
    out1 = _run_once(spark, flat, checkpoint, sink)
    assert out1 == {10: (1, 1)}, out1

    # Run 2 (same checkpoint -> watermark restored at 11:40): a LATE
    # row for the already-emitted 10:00 window plus a fresh 12:20 row.
    # The late row must be dropped — no re-emission, no new window.
    _write_part(spark, flat, "f2", [(t(10, 30), 4), (t(12, 20), 5)], 1)
    out2 = _run_once(spark, flat, checkpoint, sink)
    assert out2 == {10: (1, 1)}, out2  # sink unchanged

    # Run 3: an on-time 14:30 row pushes the watermark past 13:00,
    # closing the 12:00 window.  Its emitted aggregate contains exactly
    # the three on-time rows (2, 3, 5 -> sum 10): the late 10:30 row
    # never contaminated state.
    _write_part(spark, flat, "f3", [(t(14, 30), 6)], 2)
    out3 = _run_once(spark, flat, checkpoint, sink)
    assert out3 == {10: (1, 1), 12: (3, 10)}, out3


def test_stateful_totals_append_emits_each_user_once(spark):
    """q_stream_stateful_totals_append's contract beyond the oracle:
    EventTimeTimeout emits each user's finalized totals EXACTLY once
    (no per-batch changelog rows), including the tail users whose last
    events sit inside the watermark delay of the fixture end — the
    group that silently vanishes if the sentinel is filtered before
    the stateful operator (the no-data-batch termination trap)."""
    from setup_harvest_action_spark.catalog import load_catalog

    sf = "/root/testdata/sf0.001"
    q, _ = load_catalog()
    out = q["q_stream_stateful_totals_append"](spark, sf)
    per_user = out.groupBy("user_id").count().filter(F.col("count") > 1)
    assert per_user.count() == 0, "duplicate emissions — changelog leak"
    n_users = (
        spark.read.parquet(os.path.join(sf, "events.parquet"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert out.count() == n_users  # nobody withheld, sentinel excluded


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Re-running an availableNow file-sink query against the SAME
    checkpoint with no new input must emit nothing: the checkpoint's
    source offsets make the restart exactly-once (no re-processing, no
    duplicate windows in the sink) — the property that lets a 100 TB
    ingest crash and resume without double-counting."""
    flat = str(tmp_path / "src")
    os.makedirs(flat)
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    _write_part(
        spark, flat, "a",
        [(base + dt.timedelta(minutes=m), 1) for m in range(0, 120, 10)],
        order=0,
    )
    ck = str(tmp_path / "ck")
    sink = str(tmp_path / "sink")
    first = _run_once(spark, flat, ck, sink)
    again = _run_once(spark, flat, ck, sink)
    assert again == first  # cumulative sink unchanged: nothing re-emitted
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == len(set(r["ws"] for r in rows))  # no dup windows


def test_rocksdb_state_store_matches_default_provider(spark, tmp_path):
    """The at-scale state backend: HDFS-backed in-memory state holds
    every key on-heap — fine for fixture cardinalities, an OOM risk at
    100 TB key spaces.  Spark ships a RocksDB provider (spilling,
    incremental checkpointing) as a pure config swap; pin that the
    swap works and emits byte-identical results, so the scale knob is
    a one-line conf, not a code change."""
    rows = [
        (dt.datetime(2024, 3, 1, 10, m), m) for m in (2, 3, 17, 31, 44, 59)
    ] + [(dt.datetime(2024, 3, 1, h, 5), h) for h in (11, 12, 13)]
    flat = str(tmp_path / "src")
    os.makedirs(flat)
    _write_part(spark, flat, "all", rows, 0)

    def run(provider_conf: str | None, tag: str) -> dict:
        key = "spark.sql.streaming.stateStore.providerClass"
        old = spark.conf.get(key, None)
        if provider_conf:
            spark.conf.set(key, provider_conf)
        try:
            return _run_once(
                spark,
                flat,
                str(tmp_path / f"ckpt_{tag}"),
                str(tmp_path / f"sink_{tag}"),
            )
        finally:
            if provider_conf:
                if old is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, old)

    default = run(None, "default")
    rocks = run(
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
        "rocks",
    )
    assert rocks == default and default  # same emissions, non-empty
    # and the checkpoint really used RocksDB (its SST/changelog layout)
    state_root = tmp_path / "ckpt_rocks" / "state"
    names = {
        f for _, _, fs in os.walk(state_root) for f in fs
    }
    assert any(
        n.endswith((".sst", ".zip", ".changelog")) for n in names
    ), sorted(names)[:20]


def test_transform_with_state_totals_or_documented_gap(spark):
    """transformWithStateInPandas (Spark 4 successor stateful API) —
    runs end-to-end and must equal the batch GROUP BY wherever its
    google.protobuf dependency exists; in this container the import
    is absent, so the skip below IS the documented gap (the
    implementation is complete: streaming/events.py
    stateful_totals_tws)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState worker protocol needs protobuf; "
        "not shipped in this container",
    )
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.io.loaders import load_table
    from setup_harvest_action_spark.streaming.events import (
        stateful_totals_tws,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
        for r in stateful_totals_tws(spark, sf).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["tv"], r["mv"])
        for r in load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("tv"),
            F.round(F.max("value"), 2).alias("mv"),
        )
        .collect()
    }
    assert got == want
