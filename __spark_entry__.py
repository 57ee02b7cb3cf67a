"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's read path,
SURVEY.md §3 EP1) at sf0.001.  ``queries()`` / ``oracle_sql()`` expose
the full operator catalog from
``setup_harvest_action_spark.catalog`` — one entry per implemented
operator from SURVEY.md §2, with a DuckDB oracle wherever the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import load_catalog

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries_by_name, _ = load_catalog()
    return queries_by_name["q_harvest_read_path"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    queries_by_name, _ = load_catalog()
    return dict(queries_by_name)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (where expressible)."""
    _, oracles = load_catalog()
    return dict(oracles)
