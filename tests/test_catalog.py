"""Catalog loading contract: missing modules fail loudly."""

from __future__ import annotations

import pytest

import setup_harvest_action_spark.catalog as cat


def test_typod_module_raises():
    bad = "setup_harvest_action_spark.operators.does_not_exist"
    orig_modules, orig_loaded = cat._OPERATOR_MODULES, cat._loaded
    try:
        cat._OPERATOR_MODULES = orig_modules + (bad,)
        cat._loaded = False
        with pytest.raises(ModuleNotFoundError):
            cat.load_catalog()
    finally:
        cat._OPERATOR_MODULES, cat._loaded = orig_modules, orig_loaded


def test_expected_missing_is_tolerated():
    bad = "setup_harvest_action_spark.operators.not_built_yet"
    orig_modules, orig_loaded = cat._OPERATOR_MODULES, cat._loaded
    orig_missing = cat._EXPECTED_MISSING
    try:
        cat._OPERATOR_MODULES = orig_modules + (bad,)
        cat._EXPECTED_MISSING = orig_missing | {bad}
        cat._loaded = False
        queries, oracles = cat.load_catalog()
        assert queries
    finally:
        cat._OPERATOR_MODULES, cat._loaded = orig_modules, orig_loaded
        cat._EXPECTED_MISSING = orig_missing


def test_every_oracle_has_a_query():
    queries, oracles = cat.load_catalog()
    assert set(oracles) <= set(queries)


def test_driver_window_covers_every_component():
    """The first DRIVER_WINDOW catalog entries (all the driver's
    correctness gate ever records) must front the r17 rotation: the
    12 never-driver-sampled r17 entries, the schema-rebased warc
    stats, the 26-entry r10-stale remainder (closes the no-row-
    predating-r11 criterion), and 11 of the r11-stale cohort (the
    r16 verdict's #1 ask)."""
    queries, _ = cat.load_catalog()
    window = list(queries)[: cat.DRIVER_WINDOW]
    assert len(cat._DRIVER_PRIORITY) <= cat.DRIVER_WINDOW
    assert list(cat._DRIVER_PRIORITY) == window[: len(cat._DRIVER_PRIORITY)]
    for name in (
        # the 12 never-sampled r17 entries — all must earn driver rows
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
        # the schema-rebased stats row (digest columns, r17)
        "q_source_warc_stats",
        # representatives of the r10 remainder (the full 26 are pinned
        # by the _DRIVER_PRIORITY == window prefix assertion above)
        "q_harvest_unpivot",
        "q_join_asof",
        "q_pricing_summary",
        "q_stream_tumbling_counts",
        "q_text_lm_score",
        # representatives of the 11-entry r11 tranche
        "q_bilateral_trade",
        "q_dedup_minhash",
        "q_events_cusum",
    ):
        assert name in window, name


def test_no_array_typed_columns_in_oracled_output(spark):
    """The driver's hash canonicalization (pandas sort_values) crashes
    on array/map cells — every oracled query, and every rows-only query
    inside the driver window (the driver may canonicalize those rows
    too), must emit scalar columns only.  Checked on schemas at sf0.001
    without executing the queries beyond plan analysis."""
    from pyspark.sql.types import ArrayType, MapType

    queries, oracles = cat.load_catalog()
    window = set(list(queries)[: cat.DRIVER_WINDOW])
    offenders = []
    for name in queries:
        if name not in oracles and name not in window:
            continue
        df = queries[name](spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType)):
                offenders.append(f"{name}.{f.name}")
    assert not offenders, offenders
