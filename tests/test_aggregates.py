"""Self-verification for the no-oracle approximate sketch."""

from __future__ import annotations

import pyspark.sql.functions as F

from setup_harvest_action_spark.catalog import load_catalog
from setup_harvest_action_spark.io.loaders import load_table

SF = "/root/testdata/sf0.01"


def test_hll_estimate_within_rsd_of_exact(spark):
    """Since the r8 sketch-contract promotion the query itself carries
    the 3-sigma assertion as the ``approx_ok`` boolean; the test pins
    the contract column and cross-checks ``n_exact`` independently."""
    queries, _ = load_catalog()
    row = queries["q_approx_count_distinct"](spark, SF).first()
    assert row["approx_ok"] is True, row
    exact = (
        load_table(spark, SF, "orders")
        .select(F.count_distinct("o_custkey").alias("n"))
        .first()["n"]
    )
    assert row["n_exact"] == exact, (row, exact)


def test_approx_quantiles_within_rank_window(spark):
    from setup_harvest_action_spark.catalog import load_catalog
    from setup_harvest_action_spark.io.loaders import load_table

    queries, _ = load_catalog()
    rows = {r["l_returnflag"]: r
            for r in queries["q_agg_approx_quantiles"](spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    import pyspark.sql.functions as F

    # Since the r8 sketch-contract promotion the query's *_ok booleans
    # carry the rank-window assertion; pin them, then independently
    # recompute the GK sketch and a LOOSER p±2% window here so a broken
    # sketch fails even if the query's own window logic regressed.
    for flag, row in rows.items():
        for p in (25, 50, 95):
            assert row[f"p{p}_ok"] is True, (flag, p, row)
    for p, lo, hi in ((0.25, 0.23, 0.27), (0.50, 0.48, 0.52), (0.95, 0.93, 0.97)):
        check = {
            r["l_returnflag"]: r
            for r in li.groupBy("l_returnflag")
            .agg(
                F.percentile_approx(
                    "l_extendedprice", F.lit(p), F.lit(10000)
                ).alias("approx"),
                F.percentile("l_extendedprice", F.lit(lo)).alias("lo"),
                F.percentile("l_extendedprice", F.lit(hi)).alias("hi"),
                F.round(
                    F.percentile("l_extendedprice", F.lit(p)), 2
                ).alias("exact"),
            )
            .collect()
        }
        key = f"p{int(p * 100)}_exact"
        for flag, r in check.items():
            assert r["lo"] <= r["approx"] <= r["hi"], (flag, p, r)
            assert rows[flag][key] == r["exact"], (flag, key, r)


def test_hll_sketch_tolerance_beyond_sparse_regime(spark):
    """Past the sparse-exact regime the HLL estimate must stay within
    2% of exact — the operator's honest contract at scale (the oracle
    only covers the sparse regime the gate runs in)."""
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.io.loaders import load_table

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    r = (
        ev.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
            F.count_distinct("user_id").alias("exact"),
        ).collect()[0]
    )
    assert abs(r["est"] - r["exact"]) / r["exact"] < 0.02, r


def test_ranked_ntile_matches_window_ntile_bit_for_bit(spark):
    """ranked_ntile must reproduce `ntile(n) OVER (ORDER BY v [DESC],
    k)` exactly — including the SQL sizing rule (first c%n tiles get
    the extra row), tie values, all-equal degenerate input, and
    fewer-rows-than-tiles — across bucket counts that force multi- and
    single-bucket layouts."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from setup_harvest_action_spark.operators.ranked import ranked_ntile

    cases = [
        # (values, n_tiles, descending, buckets)
        ([float(x % 17) for x in range(100)], 4, False, 8),
        ([float(x % 17) for x in range(100)], 5, True, 8),
        ([1.0] * 25, 4, False, 8),          # all-equal: one bucket
        ([float(x) for x in range(3)], 7, False, 4),  # c < n
        ([float(x * x % 101) for x in range(250)], 10, True, 3),
    ]
    for values, n, desc, buckets in cases:
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)], ["k", "v"]
        )
        got = ranked_ntile(
            df, n, "v", ["k"], descending=desc, buckets=buckets, out="t"
        )
        order = [F.desc("v") if desc else F.asc("v"), F.asc("k")]
        want = df.withColumn(
            "t", F.ntile(n).over(Window.orderBy(*order)).cast("long")
        )
        g = {r["k"]: r["t"] for r in got.collect()}
        w = {r["k"]: r["t"] for r in want.collect()}
        assert g == w, (n, desc, buckets)


def test_ranked_ntile_fails_loudly_on_null_rank_values(spark):
    """A null rank key would silently vanish through the __p equi-join;
    the precondition is enforced with assert_true, so the job must
    FAIL, not drop the row."""
    import pytest
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    from setup_harvest_action_spark.operators.ranked import ranked_ntile

    df = spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 3.0)], ["k", "v"]
    )
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception),
                       match="null in rank column"):
        ranked_ntile(df, 2, "v", ["k"]).collect()


def test_ranked_ntile_rejects_colliding_temp_columns(spark):
    """Inputs already carrying an internal temp name (__rk/__p/...)
    must be refused up front instead of producing ambiguous columns or
    silently wrong buckets."""
    import pytest

    from setup_harvest_action_spark.operators.ranked import ranked_ntile

    df = spark.createDataFrame([(0, 1.0, 9)], ["k", "v", "__p"])
    with pytest.raises(ValueError, match="collide with"):
        ranked_ntile(df, 2, "v", ["k"])
