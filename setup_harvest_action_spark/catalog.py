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
    # ---- r12 rotation ----
    # 50 slots = 39 + 11, per the VERDICT r11 done-criterion: give FIRST
    # driver rows to ALL 39 remaining never-driver-sampled entries —
    # the 9 r11 additions first (the stored ANN index family, the
    # streaming-maintained PQ index, progressive-JPEG and WebP decode
    # pipelines, cross-document substring removal, typed PII redaction),
    # then the 30 r10-close stragglers — and fill the remaining 11
    # slots with the stalest r06 cohort (newest driver row r06,
    # alphabetical).  After this window lands, ZERO catalog entries
    # remain never-driver-sampled; subsequent rounds rotate purely by
    # staleness.  Entries outside the window stay hash-verified by
    # tools/verify_oracle.py + pytest every session.
    # (a) r11 additions — stored/streaming ANN lifecycle first:
    "q_similarity_pq_adc_stored",
    "q_similarity_ann_lsh_stored",
    "q_similarity_ann_ivf_stored",
    "q_similarity_ivfpq_stored",
    "q_stream_similarity_pq_index",
    "q_dedup_substring_removal",
    "q_quality_pii_typed_redact",
    "q_multimodal_progressive_jpeg_pipeline",
    "q_multimodal_webp_pipeline",
    # (b) r10-close stragglers — aggregates/statistics (8):
    "q_agg_count_min_sketch",
    "q_agg_skew_report",
    "q_agg_geomean_udaf",
    "q_agg_corr_matrix",
    "q_agg_benford",
    "q_agg_welch_ttest",
    "q_agg_gini",
    "q_agg_entropy",
    # (c) windows + events (9):
    "q_window_rolling_corr",
    "q_window_max_drawdown",
    "q_events_seasonal_anomaly",
    "q_events_kaplan_meier",
    "q_events_longest_streak",
    "q_events_autocorrelation",
    "q_events_bursts",
    "q_events_active_users",
    "q_events_cadence",
    # (d) manifest table format (3):
    "q_source_manifest_clone",
    "q_source_manifest_wap",
    "q_source_manifest_stream_wap",
    # (e) text/multimodal/sampling/quality/sql (10):
    "q_text_novelty",
    "q_multimodal_phash_dedup",
    "q_multimodal_video_pipeline",
    "q_sample_negative_pairs",
    "q_sample_systematic",
    "q_quality_expectations",
    "q_quality_robust_zscore",
    "q_quality_dedup_report",
    "q_sql_recursive_cte",
    "q_join_lateral_topn",
    # (f) stalest r06 cohort (newest driver row r06; alphabetical, 11):
    "q_agg_incremental_rollup",
    "q_count_distinct_members",
    "q_dedup_embedding_cosine",
    "q_distinct_projection",
    "q_events_top_paths",
    "q_filter_project",
    "q_graph_triangle_count",
    "q_join_asof_tolerance",
    "q_join_range",
    "q_join_runtime_filter",
    "q_multimodal_bmp_pipeline",
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
