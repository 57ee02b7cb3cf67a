"""Parameterized SQL front door (O10, fixed).

The reference builds query text by f-string interpolation of a
user-supplied URI (reference: harvest.py:54-87) — validated, but
injection-prone by construction.  Spark's named-parameter SQL
(``spark.sql(text, args=...)``) binds values AFTER parsing, which
removes the injection class entirely; this module is that front door
plus the fixture-view registry that makes the whole engine usable as
plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.schemas import FIXTURE_TABLES


def register_fixture_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view named after itself, so
    users can ``spark.sql`` against the same names the DuckDB oracle
    uses."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, text: str, args: dict | None = None) -> DataFrame:
    """Execute SQL with named parameters (``:name`` placeholders).
    Parameters are bound post-parse — structurally injection-safe,
    unlike string interpolation."""
    return spark.sql(text, args=args or {})
