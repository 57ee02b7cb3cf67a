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
    # ---- r18 rotation ----
    # 50 slots = 3 + 6 + 38 + 3 (the r17 verdict's #1 ask: retire the
    # rotation debt entirely).
    # (a) the 3 r18-new entries, never driver-sampled
    # (Last-Modified/If-Modified-Since revalidation, robots.txt
    # redirect composition, WARC-Truncated length caps);
    # (b) 6 entries re-queued because r18 CHANGED them:
    # q_source_warc_cdx gained layout/addressing columns; the
    # ppm/bmp/audio/tiff/png-palette pipelines graduated from
    # rows-only to full hash oracles (pixel hashes now md5-over-hex)
    # — their old driver rows were rows-only and no longer reflect
    # the output (gif graduated too and rides the (c) cohort);
    # (c) the COMPLETE 38-entry cohort whose newest driver row is
    # r11 (q_graph_hits .. q_top_supplier_revenue, the r17 verdict's
    # declared r18 queue — q_multimodal_png_pipeline rides here and
    # also carries its r18 oracle graduation).  With these, no live
    # entry's newest driver row predates r12;
    # (d) the 3 alphabetically-first entries of the 44-entry cohort
    # whose newest driver row is r12 — the stalest after (c); the
    # remaining 41 (q_agg_geomean_udaf .. alphabetical tail) are the
    # r19 queue.  Entries outside the window stay hash-verified by
    # tools/verify_oracle.py + pytest every session.
    # (a) r18-new entries:
    "q_pipeline_warc_last_modified",
    "q_pipeline_robots_redirects",
    "q_pipeline_warc_truncated",
    # (b) r18-changed entries:
    "q_source_warc_cdx",
    "q_multimodal_ppm_pipeline",
    "q_multimodal_bmp_pipeline",
    "q_multimodal_audio_pipeline",
    "q_multimodal_tiff_pipeline",
    "q_multimodal_png_palette_pipeline",
    # (c) the full r11-stale cohort:
    "q_graph_hits",
    "q_graph_kcore",
    "q_graph_label_propagation",
    "q_harvest_downstream_preserved",
    "q_important_parts_value",
    "q_join_bucketed_colocated",
    "q_lineitem_priority_matrix",
    "q_market_basket_rules",
    "q_multimodal_gif_pipeline",
    "q_multimodal_jpeg_pipeline",
    "q_multimodal_png_pipeline",
    "q_national_market_share",
    "q_part_supplier_diversity",
    "q_pipeline_spec_run",
    "q_priority_late_ship",
    "q_product_type_profit",
    "q_promo_revenue_ratio",
    "q_promotable_suppliers",
    "q_quality_auc",
    "q_quality_calibration",
    "q_quality_k_anonymity",
    "q_returned_items_topk",
    "q_sample_temperature",
    "q_scd2_point_in_time",
    "q_similarity_pq_adc",
    "q_source_manifest_bloom_skipping",
    "q_source_manifest_cdc_rollup",
    "q_source_manifest_evolution",
    "q_source_manifest_stream_merge",
    "q_source_manifest_table_changes",
    "q_source_orc_roundtrip",
    "q_stream_approx_distinct_users",
    "q_stream_stream_join_full_outer",
    "q_text_bpe_encode",
    "q_text_bpe_train",
    "q_text_feature_hashing",
    "q_text_textrank",
    "q_top_supplier_revenue",
    # (d) 3 of the r12-stale cohort:
    "q_agg_benford",
    "q_agg_count_min_sketch",
    "q_agg_entropy",
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
