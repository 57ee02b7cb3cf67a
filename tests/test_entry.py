"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as ent


def test_entry_returns_rows(spark):
    df = ent.entry(spark)
    assert df.count() > 0
    assert df.columns == ["c_custkey", "c_name", "o_orderkey", "o_orderstatus", "o_totalprice"]


def test_catalog_well_formed(spark):
    queries = ent.queries()
    oracles = ent.oracle_sql()
    assert queries, "catalog must not be empty"
    assert set(oracles) <= set(queries), "every oracle needs a matching query"


def test_each_query_runs_at_smoke_sf(spark, sf_dir):
    for name, fn in ent.queries().items():
        df = fn(spark, sf_dir)
        # count() forces execution end-to-end; rows may legitimately be 0
        # for some filters at sf0.001, so only assert it doesn't blow up.
        assert df.count() >= 0, name
