"""Storage layout: Z-order clustering for multi-dimensional pruning.

Parquet pruning works through per-row-group min/max stats (plus
Hive-style partition directories — see
tests/test_plans.py::test_partitioned_write_prunes_partitions).  A
single-column sort gives tight stats on that column only; filters on a
SECOND column still read every row group.  Z-ordering interleaves the
bits of several columns into one sort key so that sorting by it
co-locates rows that are close in EVERY dimension — each row group
then covers a small hyper-rectangle, and min/max stats prune scans for
filters on ANY of the clustered columns.  This is the technique behind
Delta/Databricks `OPTIMIZE ZORDER BY` and Iceberg's z-ordered rewrites,
built here from plain codegen'd bit arithmetic.

At 100 TB this is a write-once cost (one range repartition + sort)
amortized over every subsequent selective scan — the same economics as
bucketing, but for range predicates on multiple dimensions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

ZORDER_BITS = 16  # quantization grid per dimension (65536 cells)


def _scale_to_grid(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale a numeric column onto [0, 2^bits - 1] integers."""
    span = F.when(cmax != cmin, cmax - cmin).otherwise(F.lit(1.0))
    frac = (col.cast("double") - cmin) / span
    return F.least(
        F.greatest(F.round(frac * ((1 << bits) - 1), 0).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def zorder_key(scaled: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of each pre-scaled column into
    one Morton code: bit b of column i lands at position
    b * len(cols) + i.  Pure integer expressions — whole-stage
    codegen, no UDF."""
    n = len(scaled)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, col in enumerate(scaled):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Rewrite ``df`` as parquet clustered by the Z-order of ``cols``.

    Column mins/maxes enter the plan as a broadcast 1-row aggregate
    (no driver-side action); the data is range-partitioned by the
    Morton key and sorted within partitions, so each output file — and
    each row group inside it — covers a tight hyper-rectangle of the
    clustered dimensions."""
    (
        zorder_partitioned(df, cols, n_files, bits)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_partitioned(
    df: DataFrame,
    cols: list[str],
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """The clustering pipeline behind ``write_zordered``, exposed so
    any sink can consume it — in particular the manifest table format:
    ``zorder_partitioned(df, cols).write.format("manifest_parquet")``
    yields manifest entries whose per-file column stats cover tight
    hyper-rectangles, so ``scan_manifest(where=...)`` prunes files for
    predicates on ANY clustered dimension (Delta `OPTIMIZE ZORDER BY`
    + data skipping, end to end; pinned in
    tests/test_manifest_sink.py)."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scale_to_grid(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    keyed = with_stats.withColumn("__zkey", zorder_key(scaled, bits))
    return (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop(
            "__zkey",
            *[f"__min_{c}" for c in cols],
            *[f"__max_{c}" for c in cols],
        )
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_rows_per_file: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite the parquet directory at ``src``
    into ``dst`` with files of ~``target_rows_per_file`` rows each,
    returning the output file count.

    Streaming ingestion (one file per micro-batch per partition) and
    fine-grained upserts leave tables as thousands of KB-sized files;
    at 100 TB the scan's task-scheduling and footer-reading overhead
    then dominates I/O.  Compaction is the standard maintenance
    rewrite (Delta OPTIMIZE / Iceberg rewrite_data_files), built here
    from plain Spark primitives:

      * the file count derives from the SOURCE's own row count — one
        count() maintenance action, the same cost class as the
        rewrite itself (this is a table-maintenance job, not a query);
      * ``repartition(n)`` round-robins rows into equal-sized files;
        with ``sort_cols`` it becomes ``repartitionByRange`` + sort so
        the rewrite also restores clustering (tight min/max stats),
        like OPTIMIZE ZORDER's 1-D little sibling;
      * ``dst`` must differ from ``src``: Spark cannot overwrite a
        directory it is reading, and a separate destination is also
        what makes the swap atomic at the table-catalog layer.
    """
    if src == dst:
        raise ValueError("compact_parquet: dst must differ from src")
    df = spark.read.parquet(src)
    n_files = max(1, -(-df.count() // target_rows_per_file))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    return n_files
