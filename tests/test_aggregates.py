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
