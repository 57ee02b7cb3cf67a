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
    "setup_harvest_action_spark.operators.events_analytics",
    "setup_harvest_action_spark.sources.files",
    "setup_harvest_action_spark.functions.text",
    "setup_harvest_action_spark.functions.tokenizer",
    "setup_harvest_action_spark.functions.dedup",
    "setup_harvest_action_spark.functions.similarity",
    "setup_harvest_action_spark.functions.ann_index",
    "setup_harvest_action_spark.functions.multimodal",
    "setup_harvest_action_spark.functions.sampling",
    "setup_harvest_action_spark.functions.quality",
    "setup_harvest_action_spark.functions.graph",
    "setup_harvest_action_spark.operators.scd",
    "setup_harvest_action_spark.functions.html_extract",
    "setup_harvest_action_spark.functions.urls",
    "setup_harvest_action_spark.sources.warc",
    "setup_harvest_action_spark.functions.robots",
    "setup_harvest_action_spark.functions.pdf_codec",
    "setup_harvest_action_spark.operators.sql_surface",
    "setup_harvest_action_spark.operators.tpch_shapes",
    "setup_harvest_action_spark.operators.tpch_shapes2",
    "setup_harvest_action_spark.plans.pipeline",
    "setup_harvest_action_spark.sources.manifest_refs",
    "setup_harvest_action_spark.sources.sparql_datasource",
    "setup_harvest_action_spark.streaming.events",
)

# Declared-but-not-yet-built modules.  Shrinks to empty as phases land;
# keep in sync or load_catalog() raises on purpose.
_EXPECTED_MISSING: frozenset[str] = frozenset()

# The driver's correctness gate records only the FIRST
# ``DRIVER_WINDOW`` catalog entries in iteration order.  The catalog
# fronts an explicit priority list sized to the window, and the window
# ROTATES each round: queries with the stalest (or failed) driver rows
# go first, so every catalog entry accumulates driver-side verification
# over time.  Entries outside the window stay continuously checked by
# tools/verify_oracle.py + pytest; the per-round composition is the
# comment block inside _DRIVER_PRIORITY itself.
DRIVER_WINDOW = 50

_DRIVER_PRIORITY = (
    # ---- r14 rotation ----
    # 50 slots = 4 + 46: the complete staleness queue, exactly one
    # window (the r13 verdict's #1 ask).  (a) the 4 entries whose
    # newest driver row is r06 — the oldest rows in the catalog;
    # (b) the complete 46-entry cohort whose newest driver row is r08.
    # After this window commits, no catalog entry's newest driver row
    # is older than r09.  Entries outside the window stay hash-verified
    # by tools/verify_oracle.py + pytest every session.  The 12 new
    # r14 entries (animation pipelines ×2, HTML extraction ×3, URL
    # canonicalization ×2, WARC ×2, robots, crawl-prep composition,
    # PDF pipeline) register after the priority list and head the r15
    # rotation queue, followed by 38 of the 49-entry r09 cohort.
    # (a) r06-stale:
    "q_text_fingerprint",
    "q_text_token_estimate",
    "q_text_token_stats",
    "q_text_zscore_by_lang",
    # (b) the complete r08 cohort:
    "q_agg_equidepth_histogram",
    "q_agg_heavy_hitters",
    "q_dedup_containment",
    "q_dedup_fuzzy_edit",
    "q_dedup_incremental",
    "q_events_cdc_apply",
    "q_events_resample_interp",
    "q_events_rfm",
    "q_events_rolling_active_users",
    "q_graph_bfs_distance",
    "q_graph_pagerank",
    "q_harvest_bucketed_rerun",
    "q_join_anti",
    "q_join_interval_banded",
    "q_join_null_safe",
    "q_join_overlap_intervals",
    "q_join_salted_skew",
    "q_join_semi",
    "q_local_supplier_volume",
    "q_multimodal_audio_pipeline",
    "q_pipeline_corpus_prep",
    "q_pipeline_entity_resolution",
    "q_sample_balanced_classes",
    "q_sample_exact_k",
    "q_sample_pack_sequences",
    "q_sample_weighted",
    "q_sample_weighted_stratified",
    "q_scalar_date",
    "q_scalar_json",
    "q_scalar_string",
    "q_setop_except_all",
    "q_setop_intersect",
    "q_setop_union_by_name",
    "q_similarity_pairs_threshold",
    "q_source_manifest_stream_roundtrip",
    "q_source_partitioned_roundtrip",
    "q_sparql_datasource",
    "q_stream_cdc_apply",
    "q_stream_stateful_totals_append",
    "q_text_entropy_pandas_udf",
    "q_text_langid",
    "q_text_minmax_scale_arrow",
    "q_window_lag_lead",
    "q_window_pareto_concentration",
    "q_window_ranking",
    "q_window_topk_per_group",
)

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
    """Import all operator modules (idempotent) and return the registry,
    reordered so the ``_DRIVER_PRIORITY`` names iterate first (they fill
    the driver's correctness window) followed by the remaining entries
    in registration order."""
    global _loaded, QUERIES, ORACLES
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
        missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
        if missing:
            raise ValueError(f"_DRIVER_PRIORITY names not registered: {missing}")
        ordered = list(_DRIVER_PRIORITY) + [
            n for n in QUERIES if n not in set(_DRIVER_PRIORITY)
        ]
        QUERIES = {n: QUERIES[n] for n in ordered}
        ORACLES = {n: ORACLES[n] for n in ordered if n in ORACLES}
        _loaded = True
    return QUERIES, ORACLES
