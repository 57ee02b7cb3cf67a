"""Fixture-contract guard: the loader's decoded timestamps must equal
pyarrow's own decode of the same parquet file.

The driver regenerates /root/testdata between rounds and has already
changed the on-disk unit of ``events.ts`` once (timestamp[ns] →
timestamp[us]); a loader that assumes a unit silently lands every
event in January 1970 while the rest of the suite stays green.  These
tests pin the contract end-to-end: whatever unit the footer declares,
the Spark-decoded values match the Arrow-decoded values exactly.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from setup_harvest_action_spark.io.loaders import events_ts_unit, load_table

from conftest import SF_SMOKE

EVENTS_PATH = os.path.join(SF_SMOKE, "events.parquet")


def _arrow_ts_bounds():
    """(min, max) of events.ts decoded by pyarrow, as naive µs datetimes."""
    col = pq.read_table(EVENTS_PATH, columns=["ts"])["ts"]
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    else:  # raw int64 epoch nanos (round-1 fixture shape)
        col = col.cast(pa.timestamp("ns")).cast(pa.timestamp("us"))
    return pc.min(col).as_py(), pc.max(col).as_py()


def test_events_ts_unit_matches_footer():
    t = pq.ParquetFile(EVENTS_PATH).schema_arrow.field("ts").type
    expected = t.unit if pa.types.is_timestamp(t) else "ns"
    assert events_ts_unit(EVENTS_PATH) == expected
    assert events_ts_unit(SF_SMOKE) == expected  # directory form


def test_loader_ts_equals_arrow_decode(spark):
    lo, hi = _arrow_ts_bounds()
    row = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    # Session tz is UTC (session.py pins it), so LTZ collect == naive.
    assert row["lo"].replace(tzinfo=None) == lo
    assert row["hi"].replace(tzinfo=None) == hi


def test_events_span_is_2024_not_1970(spark):
    """The regression's signature: a wrong-unit decode lands in 1970
    (µs read as ns) or year ~56k (ns read as µs).  The fixture's events
    span 2024; a near-zero or far-future min is the bug."""
    lo, hi = _arrow_ts_bounds()
    assert lo.year == 2024, f"arrow decode starts {lo} — fixture changed?"
    row = load_table(spark, SF_SMOKE, "events").agg(F.min("ts")).collect()[0]
    assert row[0].year == 2024, f"loader decodes min(ts)={row[0]}"


def test_streaming_read_matches_batch_loader(spark):
    """Batch loader and streaming reader share one unit-detection path;
    assert their decoded bounds agree (this is the pair that diverged
    silently in round 4)."""
    from setup_harvest_action_spark.streaming.events import (
        read_event_stream,
        run_to_completion,
    )

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    streamed = run_to_completion(
        read_event_stream(spark, SF_SMOKE).select("ts"), "append"
    )
    srow = streamed.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert srow["lo"] == batch["lo"]
    assert srow["hi"] == batch["hi"]


def _spark_equiv(t):
    """Expected Spark type for an Arrow physical type, as the loader
    maps it."""
    from pyspark.sql import types as T

    if pa.types.is_int64(t):
        return T.LongType()
    if pa.types.is_int32(t):
        return T.IntegerType()
    if pa.types.is_float64(t):
        return T.DoubleType()
    if pa.types.is_float32(t):
        return T.FloatType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.StringType()
    if pa.types.is_timestamp(t):
        return T.TimestampType()
    if pa.types.is_list(t):
        return T.ArrayType(_spark_equiv(t.value_type), True)
    raise AssertionError(f"unmapped arrow type {t}")


def test_all_fixture_schemas_match_footers():
    """Declared read schemas vs the parquet footers for ALL ten tables
    — the r4 regression class generalized: a driver-side regeneration
    that changes any column's type must fail HERE, not silently
    misdecode.  events.ts is exempt from exact type match (the loader
    adapts by footer unit, tested above)."""
    from setup_harvest_action_spark.schemas import FIXTURE_SCHEMAS

    for name, schema in FIXTURE_SCHEMAS.items():
        fields = pq.ParquetFile(
            os.path.join(SF_SMOKE, f"{name}.parquet")
        ).schema_arrow
        declared = {f.name: f.dataType for f in schema.fields}
        on_disk = {fields.field(i).name: fields.field(i).type
                   for i in range(len(fields))}
        assert set(declared) == set(on_disk), (
            f"{name}: declared columns {sorted(declared)} != "
            f"on-disk {sorted(on_disk)}"
        )
        for col, t in on_disk.items():
            if name == "events" and col == "ts":
                continue
            assert _spark_equiv(t) == declared[col], (
                f"{name}.{col}: on-disk {t} no longer matches declared "
                f"{declared[col]} — fixture regenerated with new types?"
            )


def test_all_tables_load_and_project(spark):
    """Every fixture table loads through load_table with the declared
    column set and survives a 1-row materialization."""
    from setup_harvest_action_spark.schemas import FIXTURE_SCHEMAS
    from setup_harvest_action_spark.io.loaders import load_tables

    for name, df in load_tables(spark, SF_SMOKE).items():
        assert df.columns == [f.name for f in FIXTURE_SCHEMAS[name].fields]
        assert df.limit(1).count() == 1, f"{name} is empty?"


def test_unit_cache_invalidates_on_regeneration(tmp_path):
    """events_ts_unit is cached by (path, mtime, size): rewriting the
    file with a different unit — what the driver did between r3 and r4
    — must change the answer, not serve the stale cached unit."""
    p = str(tmp_path / "events.parquet")
    ts_us = pa.array([1_704_067_200_000_000], type=pa.timestamp("us"))
    pq.write_table(pa.table({"ts": ts_us}), p)
    assert events_ts_unit(p) == "us"
    ts_ns = ts_us.cast(pa.timestamp("ns"))
    pq.write_table(pa.table({"ts": ts_ns}), p)
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 1))
    assert events_ts_unit(p) == "ns"


def test_events_ts_rejects_tz_aware_fixture(tmp_path):
    """loaders reads MICROS/MILLIS events through a TIMESTAMP_NTZ
    schema; that is only sound for wall-clock (tz-naive) on-disk
    values.  A tz-aware regeneration (isAdjustedToUTC=true) must fail
    loudly at unit detection, not silently reinterpret instants."""
    import datetime as dt

    p = str(tmp_path / "events.parquet")
    tbl = pa.table(
        {"ts": pa.array([dt.datetime(2024, 1, 1)], pa.timestamp("us", tz="UTC"))}
    )
    pq.write_table(tbl, p)
    with pytest.raises(TypeError, match="tz-aware"):
        events_ts_unit(p)
    # and the real fixture is (still) tz-naive
    t = pq.ParquetFile(EVENTS_PATH).schema_arrow.field("ts").type
    assert not (pa.types.is_timestamp(t) and t.tz is not None)


def test_hll_partitioned_sketch_contract(spark):
    """q_agg_hll_partitioned (sketch-contract oracle since r9): the
    exact per-key counts must match an independent COUNT(DISTINCT),
    and every approx_ok boolean — including the '__all__' row derived
    by MERGING the per-key sketches — must hold on the gate fixture."""
    from conftest import SF_CORRECT

    ev = load_table(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = ev.select(F.count_distinct("user_id")).collect()[0][0]

    from setup_harvest_action_spark.catalog import load_catalog

    q, _ = load_catalog()
    rows = q["q_agg_hll_partitioned"](spark, SF_CORRECT).collect()
    assert {r["event_type"]: r["n_exact"] for r in rows} == exact
    assert all(r["approx_ok"] for r in rows), rows


def test_hll_set_algebra_sketch_contract(spark):
    """q_agg_hll_set_algebra (sketch-contract oracle since r9): exact
    set arithmetic must match an independent computation and all four
    sketch booleans must hold on the gate fixture."""
    from conftest import SF_CORRECT

    ev = load_table(spark, SF_CORRECT, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    n_c = clicks.distinct().count()
    n_b = buys.distinct().count()
    n_u = clicks.union(buys).distinct().count()

    from setup_harvest_action_spark.catalog import load_catalog

    q, _ = load_catalog()
    row = q["q_agg_hll_set_algebra"](spark, SF_CORRECT).collect()[0]
    assert (row["n_click"], row["n_purchase"], row["n_union"]) == (
        n_c, n_b, n_u)
    assert row["n_intersection"] == n_c + n_b - n_u
    for b in ("click_ok", "purchase_ok", "union_ok", "intersection_ok"):
        assert row[b] is True, (b, row)
