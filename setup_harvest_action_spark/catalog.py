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
    "setup_harvest_action_spark.functions.charset",
    "setup_harvest_action_spark.functions.webgraph",
    "setup_harvest_action_spark.functions.sitemap",
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
    # ---- r16 rotation ----
    # 50 slots = 9 + 8 + 1 + 11 + 21 (the r15 verdict's #1 ask).
    # (a) the 9 r15-new entries that have never been driver-sampled
    # (crawl loop, quality rule packs, PDF incremental updates);
    # (b) the 8 r16-new entries (multi-round crawl, WET roundtrip,
    # crawl-delay schedule, WAT link extraction, streaming crawl
    # ingest, robots-fetch leg, sitemap-discovery frontier,
    # PageRank-prioritized frontier);
    # (c) q_source_warc_stats re-queued — its r16 schema adds the
    # layout/record-type columns, so the r15 row no longer reflects
    # the query;
    # (d) the 11-entry r09-stale remainder (closes the verdict's
    # "no row predating r10" criterion);
    # (e) the 21 alphabetically-first entries of the 47-entry cohort
    # whose newest driver row is r10 — the stalest after (d); the 26
    # alphabetically-last (q_harvest_unpivot, q_join_asof,
    # q_join_asof_forward, q_large_orders, q_multimodal_metadata,
    # q_pagination_page, q_pricing_summary .. q_text_lm_score) are
    # the r17 queue.  Entries outside the window stay hash-verified
    # by tools/verify_oracle.py + pytest every session.
    # (a) never-sampled r15 entries:
    "q_pipeline_charset_decode",
    "q_graph_crawl_outlinks",
    "q_graph_crawl_pagerank",
    "q_graph_crawl_host_graph",
    "q_pipeline_crawl_frontier",
    "q_pipeline_sitemap_recrawl",
    "q_quality_gopher_rules",
    "q_quality_c4_line_filters",
    "q_multimodal_pdf_update_pipeline",
    # (b) r16-new entries:
    "q_pipeline_crawl_rounds",
    "q_pipeline_wet_roundtrip",
    "q_pipeline_crawl_schedule",
    "q_pipeline_wat_links",
    "q_stream_crawl_ingest",
    "q_pipeline_robots_fetch",
    "q_pipeline_frontier_discovery",
    "q_pipeline_frontier_prioritized",
    # (c) schema-rebased this round:
    "q_source_warc_stats",
    # (d) the r09-stale remainder:
    "q_multimodal_ppm_pipeline",
    "q_quality_compression_ratio",
    "q_text_lm_bigram_score",
    "q_text_topk_tokens",
    "q_window_distribution",
    "q_window_first_last",
    "q_window_range_frame",
    "q_window_running_distinct",
    "q_window_running_sum",
    "q_window_sequence_gaps",
    "q_window_sliding_frame",
    # (e) 21 of the r10-stale cohort:
    "q_agg_minmax_stats",
    "q_agg_percentiles",
    "q_agg_pivot",
    "q_constraint_report",
    "q_cube_lineitem_flags",
    "q_dedup_components",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_semantic",
    "q_embedding_kmeans",
    "q_events_cohort_retention",
    "q_events_funnel",
    "q_events_resample_ffill",
    "q_events_sessionize",
    "q_events_transitions",
    "q_grouping_sets",
    "q_harvest_read_path",
    "q_harvest_rerun_stats",
    "q_harvest_rerun_terms",
    "q_harvest_term_fields",
    "q_harvest_terms",
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
