"""Phase-split probe for q_pipeline_entity_resolution (r19, guide §1):
times (1) the fuzzy-pair build, (2) the connected-components rounds,
(3) the final label-attach + member-count window — each against the
noop sink — so the optimization targets the phase that actually costs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SKETCH_HASH", "xxhash64")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "3"))

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from setup_harvest_action_spark.functions.dedup import (
        connected_components,
        fuzzy_match_pairs,
    )
    from setup_harvest_action_spark.io.loaders import load_table
    from setup_harvest_action_spark.session import get_spark

    spark = get_spark("er-phase-probe")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, fn):
        ts = []
        group = f"phase-{label}"
        for i in range(runs + 1):  # first run = cold
            sc.setJobGroup(group if i else f"cold-{label}", label)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            if i:
                ts.append(round(dt, 3))
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        med = sorted(ts)[len(ts) // 2]
        print(f"{label}: median {med}s runs={ts} jobs/run={n_jobs/runs:.1f}")
        return med

    docs = load_table(spark, sf_dir, "documents")

    # phase 1: fuzzy pair build alone
    timed("pairs", lambda: noop(
        fuzzy_match_pairs(spark, docs).select("doc_a", "doc_b")))

    # phase 1+2: pairs + CC (CC is stateful/materializing; measure the
    # composition and subtract)
    timed("pairs+cc", lambda: noop(
        connected_components(
            fuzzy_match_pairs(spark, docs).select("doc_a", "doc_b"),
            src="doc_a", dst="doc_b",
        )))

    # full query (adds the label attach + window)
    def full():
        pairs = fuzzy_match_pairs(spark, docs).select("doc_a", "doc_b")
        comp = connected_components(pairs, src="doc_a", dst="doc_b")
        labeled = (
            docs.select("doc_id")
            .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("label"), F.col("doc_id")).alias("entity_id"),
            )
        )
        noop(labeled.withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("entity_id")),
        ))

    timed("full", full)


if __name__ == "__main__":
    main()
