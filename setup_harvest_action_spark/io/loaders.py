"""Fixture-table loaders.

Explicit-schema parquet scans: no inference pass, stable column
contract, and the scan node exposes the full schema to Catalyst so
column pruning / predicate pushdown land in the parquet reader
(check ``.explain``: ``ReadSchema`` should only list used columns,
``PushedFilters`` the filters).

``events.ts`` needs special care: the driver has regenerated the
fixture with a DIFFERENT on-disk unit across rounds (INT64
TIMESTAMP(NANOS) in round 1, TIMESTAMP(MICROS) as of round 4), so the
unit is detected from the parquet footer per path — a one-time
driver-side metadata read, never a data scan — and the read schema is
chosen to match.  All call sites (batch here, streaming in
streaming/events.py) share this detection; nothing hardcodes a unit.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.schemas import (
    EVENTS_NTZ,
    EVENTS_RAW,
    FIXTURE_SCHEMAS,
)


@lru_cache(maxsize=64)
def _events_ts_unit_cached(path: str, mtime_ns: int, size: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.ParquetFile(path).schema_arrow.field("ts").type
    if pa.types.is_timestamp(t):
        # The NTZ read path below assumes wall-clock (no zone) values;
        # a tz-aware regeneration (isAdjustedToUTC=true) read through
        # the NTZ schema would silently reinterpret instants whenever
        # the session timezone moved off UTC — fail loudly instead
        # (tests/test_fixture_contract.py pins this).
        if t.tz is not None:
            raise TypeError(
                f"events.ts in {path} is tz-aware ({t}); the NTZ read "
                "path would silently reinterpret it — teach loaders.py "
                "the instant semantics before accepting this fixture"
            )
        return t.unit  # 'ns' | 'us' | 'ms' | 's'
    if pa.types.is_int64(t):
        # Plain INT64 with no timestamp logical type: the only fixture
        # generation that ever did this carried epoch nanoseconds.
        return "ns"
    raise TypeError(f"unsupported events.ts physical type in {path}: {t}")


def events_ts_unit(path: str) -> str:
    """On-disk unit of ``events.ts`` read from the parquet footer:
    ``'ns' | 'us' | 'ms' | 's'``.  Cached per (path, mtime, size) so a
    driver-side fixture regeneration invalidates the answer."""
    if os.path.isdir(path):
        # A fixture directory holds all ten tables — use events.parquet
        # itself; any other directory (a stream landing dir of event
        # part-files) is sampled by its first file.
        named = os.path.join(path, "events.parquet")
        if os.path.exists(named):
            path = named
        else:
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if not files:
                raise FileNotFoundError(f"no parquet files under {path}")
            path = files[0]
    st = os.stat(path)
    return _events_ts_unit_cached(path, st.st_mtime_ns, st.st_size)


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the events parquet with ``ts`` normalized to a microsecond
    session-local TimestampType, whatever unit the fixture carries."""
    unit = events_ts_unit(path)
    if unit == "ns":
        # TIMESTAMP(NANOS) is illegal as Spark TimestampType: read as
        # long nanos, floor to microseconds.  Integer `div`, not `/`:
        # 2024-epoch nanos (~1.7e18) exceed double's 2^53 mantissa, so
        # float division drifts by ±1 µs.
        raw = spark.read.schema(EVENTS_RAW).parquet(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # MICROS/MILLIS without timezone → read natively as TIMESTAMP_NTZ,
    # then cast to the session-local type every downstream query uses.
    raw = spark.read.schema(EVENTS_NTZ).parquet(path)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table from ``{sf_dir}/{name}.parquet``."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return load_events(spark, path)
    schema = FIXTURE_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several fixture tables at once; defaults to all of them."""
    names = names or tuple(FIXTURE_SCHEMAS)
    return {name: load_table(spark, sf_dir, name) for name in names}
