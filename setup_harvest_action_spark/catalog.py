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
    # ---- r17 rotation ----
    # 50 slots = 12 + 1 + 26 + 11 (the r16 verdict's #1 ask).
    # (a) the 12 r17-new entries, never driver-sampled (HTTP payload
    # codings, WARC revisit/digest dedup, time-budget politeness,
    # the closed streaming crawl loop, the CDX seek index, RFC 9309
    # availability semantics, the budgeted streaming loop, redirect
    # resolution, ETag/304 conditional revalidation, multimodal
    # records in the container, redirect-fed frontier discovery,
    # the streaming loop's WET corpus output);
    # (b) q_source_warc_stats re-queued — its r17 schema adds the
    # payload-digest columns, so the r16 row no longer reflects it;
    # (c) the 26-entry r10-stale remainder (q_harvest_unpivot ..
    # q_text_lm_score — closes the verdict's "no live entry's newest
    # driver row predates r11" criterion);
    # (d) the 11 alphabetically-first entries of the 49-entry cohort
    # whose newest driver row is r11 — the stalest after (c); the 38
    # alphabetically-last (q_graph_hits .. q_top_supplier_revenue)
    # are the r18 queue.  Entries outside the
    # window stay hash-verified by tools/verify_oracle.py + pytest
    # every session.
    # (a) r17-new entries:
    "q_pipeline_warc_content_codings",
    "q_pipeline_warc_revisit",
    "q_pipeline_crawl_budget",
    "q_stream_crawl_loop",
    "q_source_warc_cdx",
    "q_pipeline_robots_unavailable",
    "q_stream_crawl_budget",
    "q_pipeline_redirect_resolution",
    "q_pipeline_warc_conditional",
    "q_pipeline_warc_resources",
    "q_pipeline_frontier_redirects",
    "q_stream_crawl_wet",
    # (b) schema-rebased this round:
    "q_source_warc_stats",
    # (c) the r10-stale remainder:
    "q_harvest_unpivot",
    "q_join_asof",
    "q_join_asof_forward",
    "q_large_orders",
    "q_multimodal_metadata",
    "q_pagination_page",
    "q_pricing_summary",
    "q_quality_boilerplate_segments",
    "q_revenue_by_nation",
    "q_rollup_order_stats",
    "q_sample_source_cap",
    "q_scalar_conditional",
    "q_scalar_math",
    "q_shipping_priority",
    "q_small_quantity_revenue",
    "q_source_manifest_merge",
    "q_stream_dedup",
    "q_stream_dedup_within_watermark",
    "q_stream_session_windows",
    "q_stream_sliding_avg",
    "q_stream_stateful_user_totals",
    "q_stream_stream_join",
    "q_stream_tumbling_append_filesink",
    "q_stream_tumbling_counts",
    "q_text_bytes_mapinarrow",
    "q_text_lm_score",
    # (d) 11 of the r11-stale cohort:
    "q_bilateral_trade",
    "q_customer_order_distribution",
    "q_dedup_minhash",
    "q_dedup_prefix_filter_join",
    "q_dedup_simhash",
    "q_discount_revenue_delta",
    "q_disjunctive_revenue",
    "q_dormant_rich_customers",
    "q_embedding_quantize_int8",
    "q_events_attribution",
    "q_events_cusum",
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
