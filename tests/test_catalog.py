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
    correctness gate ever records) must front the r15 rotation: the
    12 r14-new entries that have never been driver-sampled (the whole
    crawl-ingest family + animation + PDF pipelines) plus 38 of the
    49-entry r09-stale cohort (the r14 verdict's #1 ask)."""
    queries, _ = cat.load_catalog()
    window = list(queries)[: cat.DRIVER_WINDOW]
    assert len(cat._DRIVER_PRIORITY) <= cat.DRIVER_WINDOW
    assert list(cat._DRIVER_PRIORITY) == window[: len(cat._DRIVER_PRIORITY)]
    for name in (
        # the 12 never-sampled r14 entries — all must earn driver rows
        "q_multimodal_gif_anim_pipeline",
        "q_multimodal_webp_anim_pipeline",
        "q_text_html_extract",
        "q_text_html_metadata",
        "q_text_html_boilerplate_stats",
        "q_text_url_canonicalize",
        "q_dedup_url_exact",
        "q_text_robots_filter",
        "q_pipeline_warc_to_text",
        "q_source_warc_stats",
        "q_pipeline_crawl_prep",
        "q_multimodal_pdf_pipeline",
        # representatives of the r09 cohort (the full 38 are pinned by
        # the _DRIVER_PRIORITY == window prefix assertion above)
        "q_agg_approx_quantiles",
        "q_dedup_winnowing",
        "q_join_asof_topk",
        "q_quality_pii_redact",
        "q_sample_train_valid_test",
        "q_source_manifest_skipping",
        "q_stream_trending_topk",
        "q_text_kwic_udtf",
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
