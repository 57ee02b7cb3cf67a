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
