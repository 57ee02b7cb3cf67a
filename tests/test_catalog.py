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
    correctness gate ever records) must front the r10 rotation: the 2
    never-driver-checked entries, the round's headline addition
    (manifest MERGE INTO), and the full 47-query r05 cohort — the
    composition the r9 verdict's done-criterion pins."""
    queries, _ = cat.load_catalog()
    window = list(queries)[: cat.DRIVER_WINDOW]
    assert len(cat._DRIVER_PRIORITY) <= cat.DRIVER_WINDOW
    assert list(cat._DRIVER_PRIORITY) == window[: len(cat._DRIVER_PRIORITY)]
    for name in (
        "q_small_quantity_revenue",
        "q_quality_boilerplate_segments",
        "q_source_manifest_merge",
        # representatives of the 47-query r05 cohort
        "q_pricing_summary",
        "q_dedup_exact",
        "q_dedup_ngram_jaccard",
        "q_dedup_components",
        "q_dedup_semantic",
        "q_embedding_kmeans",
        "q_events_funnel",
        "q_events_sessionize",
        "q_events_transitions",
        "q_agg_percentiles",
        "q_agg_pivot",
        "q_grouping_sets",
        "q_cube_lineitem_flags",
        "q_join_asof",
        "q_join_asof_forward",
        "q_scalar_array",
        "q_stream_tumbling_counts",
        "q_harvest_terms",
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
