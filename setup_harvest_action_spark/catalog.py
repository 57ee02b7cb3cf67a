"""Central query/operator catalog.

Every implemented operator registers here as a named query:

    @query("q_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q_pricing_summary(spark, sf_dir) -> DataFrame: ...

``__spark_entry__.queries()`` / ``oracle_sql()`` read straight from
this registry.  The oracle is ANSI SQL runnable by DuckDB over the
fixture views (region nation customer supplier part orders lineitem
events documents embeddings); queries whose semantics are not
SQL-expressible (LSH, streaming, iterative) register without an
oracle and get the driver's rows-only check.

Contract reminders (driver compare is column-name-sorted value hash):
  * alias every computed column identically in Spark and SQL;
  * keep result types aligned (cast DuckDB HUGEINT sums to BIGINT,
    Spark year()/month() ints vs DuckDB bigints, etc.);
  * round floating aggregates to a fixed scale on BOTH sides so
    accumulation order can't flip the hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Modules that register queries on import.  Every name listed here MUST
# import cleanly — a missing module is only tolerated when it is also in
# _EXPECTED_MISSING (i.e. explicitly not built yet).  Anything else —
# typo'd name, broken transitive import — raises at load_catalog() time
# so the driver sees an error, not a silently smaller catalog.
_OPERATOR_MODULES = (
    "setup_harvest_action_spark.operators.relational",
    "setup_harvest_action_spark.operators.aggregates",
    "setup_harvest_action_spark.operators.windows",
    "setup_harvest_action_spark.operators.joins",
    "setup_harvest_action_spark.operators.setops",
    "setup_harvest_action_spark.operators.scalar_funcs",
    "setup_harvest_action_spark.operators.harvest_queries",
    "setup_harvest_action_spark.sources.files",
    "setup_harvest_action_spark.functions.text",
    "setup_harvest_action_spark.functions.dedup",
    "setup_harvest_action_spark.functions.similarity",
    "setup_harvest_action_spark.functions.multimodal",
    "setup_harvest_action_spark.streaming.events",
)

# Declared-but-not-yet-built modules.  Shrinks to empty as phases land;
# keep in sync or load_catalog() raises on purpose.
_EXPECTED_MISSING: frozenset[str] = frozenset()

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as catalog entry ``name`` with optional DuckDB oracle."""

    def decorate(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate catalog entry: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return decorate


def load_catalog() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import all operator modules (idempotent) and return the registry."""
    global _loaded
    if not _loaded:
        for mod in _OPERATOR_MODULES:
            try:
                importlib.import_module(mod)
            except ModuleNotFoundError as exc:
                # ModuleNotFoundError.name is the exact missing module —
                # only the declared module itself may be absent, and only
                # when explicitly expected; a failing transitive import
                # always raises.
                if exc.name == mod and mod in _EXPECTED_MISSING:
                    continue
                raise
        _loaded = True
    return QUERIES, ORACLES
