"""Fixture-table loaders.

Explicit-schema parquet scans: no inference pass, stable column
contract, and the scan node exposes the full schema to Catalyst so
column pruning / predicate pushdown land in the parquet reader
(check ``.explain``: ``ReadSchema`` should only list used columns,
``PushedFilters`` the filters).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.schemas import EVENTS_RAW, FIXTURE_SCHEMAS


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table from ``{sf_dir}/{name}.parquet``."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # ts is INT64 TIMESTAMP(NANOS) on disk (illegal as Spark
        # TimestampType): read as long nanos, floor to microseconds.
        # The conversion is a codegen'd arithmetic cast — pushdown on
        # other columns is unaffected.
        # Integer `div`, not `/`: 2024-epoch nanos (~1.7e18) exceed
        # double's 2^53 mantissa, so float division drifts by ±1 µs.
        raw = spark.read.schema(EVENTS_RAW).parquet(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    schema = FIXTURE_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several fixture tables at once; defaults to all of them."""
    names = names or tuple(FIXTURE_SCHEMAS)
    return {name: load_table(spark, sf_dir, name) for name in names}
