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
    # ---- r13 rotation ----
    # 50 slots = 3 + 14 + 33.  (a) the 3 entries that postdate the r12
    # window commit and are therefore the only never-driver-sampled
    # queries left; (b) the repaired q_window_rolling_corr (r12 hash
    # fail: signed zero) plus the 13 other queries touched by the r13
    # signed-zero sweep — their outputs changed (-0.0 folded to +0.0),
    # so each needs a fresh driver row computed from the new
    # definition; (c) the complete stalest cohort: all 33 entries whose
    # newest driver row is r06.  After this window, the oldest rows
    # are the r08 cohort.  Entries outside the window stay
    # hash-verified by tools/verify_oracle.py + pytest every session.
    # (a) never-driver-sampled (added after the r12 window committed,
    #     plus this round's own VP8X-alpha pipeline):
    "q_similarity_pq_delete",
    "q_multimodal_webp_lossy_pipeline",
    "q_multimodal_jpeg_arith_pipeline",
    "q_multimodal_webp_alpha_pipeline",
    "q_multimodal_png_palette_pipeline",
    "q_multimodal_tiff_pipeline",
    "q_multimodal_audio_codecs_pipeline",
    # (b) signed-zero sweep — repaired fail first, then the swept set:
    "q_window_rolling_corr",
    "q_window_period_over_period",
    "q_events_anomaly",
    "q_events_seasonal_anomaly",
    "q_events_autocorrelation",
    "q_agg_statistics",
    "q_agg_corr_matrix",
    "q_agg_welch_ttest",
    "q_scalar_array",
    "q_text_zipf_fit",
    "q_text_collocations",
    "q_quality_robust_zscore",
    "q_similarity_exact_topk",
    "q_similarity_hybrid_rerank",
    # (c) stalest cohort — every entry whose newest driver row is r06:
    "q_multimodal_features",
    "q_multimodal_frame_sample",
    "q_multimodal_modality_mix",
    "q_multimodal_thumbnail",
    "q_pagination_keyset",
    "q_parameterized_sql",
    "q_quality_decontaminate",
    "q_regex_filter",
    "q_scalar_map",
    "q_scalar_variant",
    "q_scd2_customer_segment",
    "q_similarity_ann_ivf",
    "q_similarity_ann_lsh",
    "q_source_csv_roundtrip",
    "q_source_json_roundtrip",
    "q_source_manifest_roundtrip",
    "q_sparql_source_sim",
    "q_sparql_stream",
    "q_stream_session_dynamic_gap",
    "q_stream_session_windows_append",
    "q_stream_sliding_avg_append",
    "q_stream_static_join",
    "q_stream_stream_join_outer",
    "q_table_diff",
    "q_text_bm25",
    "q_text_lang_profile",
    "q_text_ngrams_udtf",
    "q_text_quality",
    "q_text_tfidf",
    # q_text_fingerprint + q_text_token_estimate + q_text_token_stats +
    # q_text_zscore_by_lang stay r06-stale; first in line for r14
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
