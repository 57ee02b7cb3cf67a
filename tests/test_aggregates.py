"""Self-verification for the no-oracle approximate sketch."""

from __future__ import annotations

import pyspark.sql.functions as F

from setup_harvest_action_spark.catalog import load_catalog
from setup_harvest_action_spark.io.loaders import load_table

SF = "/root/testdata/sf0.01"


def test_hll_estimate_within_rsd_of_exact(spark):
    queries, _ = load_catalog()
    approx = queries["q_approx_count_distinct"](spark, SF).first()["approx_members"]
    exact = (
        load_table(spark, SF, "orders")
        .select(F.count_distinct("o_custkey").alias("n"))
        .first()["n"]
    )
    # rsd=0.02 requested; allow 3 sigma.
    assert abs(approx - exact) <= 3 * 0.02 * exact, (approx, exact)


def test_approx_quantiles_within_rank_window(spark):
    from setup_harvest_action_spark.catalog import load_catalog
    from setup_harvest_action_spark.io.loaders import load_table

    queries, _ = load_catalog()
    approx = {r["l_returnflag"]: r
              for r in queries["q_agg_approx_quantiles"](spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    import pyspark.sql.functions as F

    # exact p±2% rank window per group — far looser than the sketch's
    # 1/10000 rank bound, tight enough to catch a broken sketch.
    for p, lo, hi in ((0.25, 0.23, 0.27), (0.50, 0.48, 0.52), (0.95, 0.93, 0.97)):
        bounds = {
            r["l_returnflag"]: r
            for r in li.groupBy("l_returnflag")
            .agg(
                F.percentile("l_extendedprice", F.lit(lo)).alias("lo"),
                F.percentile("l_extendedprice", F.lit(hi)).alias("hi"),
            )
            .collect()
        }
        key = f"p{int(p * 100)}"
        for flag, row in approx.items():
            assert bounds[flag]["lo"] <= row[key] <= bounds[flag]["hi"], (
                flag, key, row[key])


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
