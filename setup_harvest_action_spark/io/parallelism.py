"""Re-spread byte-tiny inputs ahead of CPU-heavy Python map stages.

The fixture slices that feed the decode/codec pipelines are a few
hundred rows — they pack into ONE parquet input split, and AQE's
partition coalescing (correctly, by byte size) folds their keyed
group-map shuffles into ONE post-shuffle partition.  Both are the
small-input/heavy-compute mismatch of guide §2.5: the planner sizes
the stage by bytes, but the stage's cost is per-row Python decode
(synthesize + full codec decode per document), so the whole pipeline
runs single-task on a 32-core session.  Measured at sf0.1:
q_multimodal_webp_lossy_pipeline 2.05 s single-task → 0.9 s spread;
q_pipeline_warc_content_codings 1.24 s coalesced → 0.55 s spread.

The fix is an EXPLICIT repartition at the session's configured
shuffle width — Spark marks user-specified repartitions
(``REPARTITION_BY_NUM``) as non-coalescable, so AQE leaves the stage
wide.  The exchange moves ids and fixture text, never decoded
payloads, and the width tracks ``spark.sql.shuffle.partitions``
(conf-parameterized; on a cluster it is the cluster's own width,
never a local-core constant).  At corpus scale the decode input
already arrives partitioned by the scan, and these stay id-weight
shuffles — the decode itself still adds zero payload shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _width(df: DataFrame) -> int:
    # Non-numeric conf values exist in the wild (e.g. managed platforms
    # set "auto"); fall back to the cluster's default parallelism so a
    # spread-wrapped constructor never raises at planning time.
    raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    try:
        return int(raw)
    except (TypeError, ValueError):
        return df.sparkSession.sparkContext.defaultParallelism


def _narrow(df: DataFrame, width: int) -> bool:
    """True when ``df``'s current partitioning is narrower than the
    session's shuffle width.  SPREAD MUST ONLY WRAP SCAN-ROOTED
    FRAMES: ``df.rdd`` on a plan containing exchanges would, under
    AQE, eagerly execute the upstream stages at query-construction
    time.  For scan-rooted frames partition enumeration is pure
    planning metadata — no job launches (pinned by test_plans.py's
    zero-job constructor tests, including one directly over a spread
    call site: test_spread_construction_launches_no_job).  This is the scale-adaptive guard: on a cluster the scan
    already arrives at ≥width splits and every spread below becomes a
    no-op, so the spreads can never re-shuffle a corpus that is
    already parallel — they only pay (once, input-sized) when the
    source genuinely denies parallelism, e.g. the single-row-group
    fixture parquet here or a one-file gzip dump in the wild."""
    return df.rdd.getNumPartitions() < width


def spread(df: DataFrame) -> DataFrame:
    """Round-robin re-spread before a CPU-heavy row-wise map stage
    (``mapInPandas``/``mapInArrow`` pipelines keyed by nothing)."""
    n = _width(df)
    return df.repartition(n) if _narrow(df, n) else df


def spread_groups(df: DataFrame, *keys: str) -> DataFrame:
    """Keyed re-spread before a CPU-heavy ``groupBy(*keys)`` group-map
    stage (``applyInPandas`` pipelines): the explicit hash repartition
    satisfies the group-map's clustering requirement, so no second
    exchange is added, and AQE cannot coalesce the heavy stage down to
    one task on byte-size grounds."""
    n = _width(df)
    return df.repartition(n, *keys) if _narrow(df, n) else df
