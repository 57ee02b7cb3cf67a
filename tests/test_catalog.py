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
    correctness gate ever records) must front the r09 rotation: the 9
    never-driver-checked entries, the re-gated sketch oracles, the 24
    stalest (r04) greens, and the r05 fills."""
    queries, _ = cat.load_catalog()
    window = list(queries)[: cat.DRIVER_WINDOW]
    assert len(cat._DRIVER_PRIORITY) <= cat.DRIVER_WINDOW
    assert list(cat._DRIVER_PRIORITY) == window[: len(cat._DRIVER_PRIORITY)]
    # spot-check the r7 verdict's named next-round criteria are inside:
    # the eight r7-late additions, r8's salted sessionization, the two
    # sketch-contract promotions, and representatives of the r04 backlog
    for name in (
        "q_dedup_substring_spans",
        "q_sample_global_shuffle",
        "q_events_time_decay_score",
        "q_quality_winsorize",
        "q_agg_chi_square",
        "q_stream_trending_topk",
        "q_quality_compression_ratio",
        "q_join_existence",
        "q_events_sessionize_salted",
        "q_agg_approx_quantiles",
        "q_approx_count_distinct",
        "q_window_running_sum",
        "q_join_right_outer",
        "q_setop_union_all",
        "q_text_kwic_udtf",
        "q_sample_bernoulli_hash",
        "q_quality_pii_redact",
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
