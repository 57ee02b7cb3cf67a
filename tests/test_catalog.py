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
