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
    correctness gate ever records) must front the r13 rotation: every
    never-driver-sampled entry (the 3 r12-late additions plus this
    round's own codec pipelines), the repaired q_window_rolling_corr
    and the rest of the signed-zero sweep, then the stalest r06
    cohort."""
    queries, _ = cat.load_catalog()
    window = list(queries)[: cat.DRIVER_WINDOW]
    assert len(cat._DRIVER_PRIORITY) <= cat.DRIVER_WINDOW
    assert list(cat._DRIVER_PRIORITY) == window[: len(cat._DRIVER_PRIORITY)]
    for name in (
        # never-driver-sampled (r12-late + r13 additions)
        "q_similarity_pq_delete",
        "q_multimodal_webp_lossy_pipeline",
        "q_multimodal_jpeg_arith_pipeline",
        "q_multimodal_webp_alpha_pipeline",
        "q_multimodal_png_palette_pipeline",
        "q_multimodal_tiff_pipeline",
        "q_multimodal_audio_codecs_pipeline",
        # the signed-zero sweep (repaired fail first)
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
        # representatives of the stalest r06 cohort
        "q_multimodal_features",
        "q_quality_decontaminate",
        "q_scd2_customer_segment",
        "q_similarity_ann_lsh",
        "q_stream_session_dynamic_gap",
        "q_table_diff",
        "q_text_bm25",
        "q_text_tfidf",
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
