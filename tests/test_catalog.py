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
    correctness gate ever records) must front the r12 rotation: ALL 39
    never-driver-sampled entries (the VERDICT r11 #1 done-criterion —
    zero never-sampled entries remain after this window lands) plus
    the 11 stalest r06-cohort entries."""
    queries, _ = cat.load_catalog()
    window = list(queries)[: cat.DRIVER_WINDOW]
    assert len(cat._DRIVER_PRIORITY) <= cat.DRIVER_WINDOW
    assert list(cat._DRIVER_PRIORITY) == window[: len(cat._DRIVER_PRIORITY)]
    for name in (
        # the r11 additions (stored/streaming ANN family first)
        "q_similarity_pq_adc_stored",
        "q_similarity_ann_lsh_stored",
        "q_similarity_ann_ivf_stored",
        "q_similarity_ivfpq_stored",
        "q_stream_similarity_pq_index",
        "q_dedup_substring_removal",
        "q_quality_pii_typed_redact",
        "q_multimodal_progressive_jpeg_pipeline",
        "q_multimodal_webp_pipeline",
        # representatives of the 30 r10-close stragglers
        "q_agg_count_min_sketch",
        "q_agg_benford",
        "q_window_max_drawdown",
        "q_events_kaplan_meier",
        "q_source_manifest_clone",
        "q_source_manifest_wap",
        "q_text_novelty",
        "q_multimodal_video_pipeline",
        "q_sample_negative_pairs",
        "q_quality_expectations",
        "q_sql_recursive_cte",
        "q_join_lateral_topn",
        # representatives of the stalest r06 cohort
        "q_agg_incremental_rollup",
        "q_dedup_embedding_cosine",
        "q_graph_triangle_count",
        "q_join_asof_tolerance",
        "q_multimodal_bmp_pipeline",
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
