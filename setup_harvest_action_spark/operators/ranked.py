"""Distributed exact ranking primitives.

The reference has no ranking at all (its only ordering is SQLite's
implicit rowid); this module exists for the north-star queries that
need a GLOBAL rank or quantile assignment — RFM quintiles, Pareto
deciles, equi-depth histograms.  The naive Spark spelling,
``ntile(n) OVER (ORDER BY ...)`` with no PARTITION BY, funnels the
whole relation through ONE task (Exchange SinglePartition + global
sort) — fine at sf0.1, a scale-killer over an entity population at
100 TB.  ``ranked_ntile`` below produces bit-identical ntile
assignments with the sort spread across executors; it is the same
range-partitioned-rank pattern already proven for dense surrogate ids
in harvest/load.py (_dense_ids), generalized to an explicit value
range and the exact SQL ntile bucket-size rule.

How it works (three bounded steps, no global sort):

1. **Deterministic range bucketing.**  One exact min/max aggregate
   over the rank key is broadcast back and every row computes its
   coarse bucket ``__p = floor((key - lo) / width)`` map-side.
   Equal-width on the exact extrema is chosen over
   ``percentile_approx`` cut points ON PURPOSE: the bucketed subtree
   feeds two consumers (the offset table and the final join), and a
   recomputation must assign every row the same bucket both times —
   min/max are merge-order-independent, a compressed quantile sketch
   is not.  The price is load balance under value skew (a constant
   hot VALUE collapses buckets), never correctness; worst case (all
   keys equal) degrades to the old single-task sort, never worse.
2. **Offsets.**  Per-bucket counts roll into cumulative offsets and
   the grand total with a window over ≤ ``buckets`` rows — the only
   single-partition step, over a BUCKET-cardinality table (≤ 64
   rows), not the relation.
3. **Rank + exact ntile arithmetic.**  ``row_number`` within each
   bucket (partitioned window) plus the broadcast offset is the exact
   global rank; the SQL ntile rule — with c rows and n tiles, the
   first ``c % n`` tiles hold ``c/n + 1`` rows, the rest ``c/n`` —
   is then pure per-row arithmetic, bit-identical to
   ``ntile(n) OVER (ORDER BY ...)`` on every engine.

Scale: two shuffles (the bucket repartition implied by the
partitioned window, plus the tiny count aggregate) and two broadcast
joins of ≤ ``buckets``-row tables; no stage ever sorts more than one
bucket's rows in one task.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

RANGE_BUCKETS = 32  # matches spark.sql.shuffle.partitions on the test box

# Internal working columns injected into (and dropped from) the
# caller's DataFrame; a caller already using one of these would hit
# ambiguous-column resolution or silently wrong bucketing, so
# ranked_ntile refuses such inputs up front.
_TEMP_COLS = frozenset(
    {"__rk", "__p", "__lo", "__hi", "__off", "__n", "__c", "__rank"}
)


def _global_rank(
    df: DataFrame,
    value: str,
    tiebreakers: Sequence[str],
    *,
    descending: bool,
    buckets: int,
) -> DataFrame:
    """Shared guts of :func:`ranked_ntile` / :func:`ranked_row_number`:
    ``df`` plus the exact global rank as ``__rank`` and the grand row
    count as ``__c`` (both bigint, caller drops them)."""
    taken = set(df.columns) & _TEMP_COLS
    if taken:
        raise ValueError(
            f"ranked rank/ntile: input columns {sorted(taken)} collide with "
            f"internal temp names {sorted(_TEMP_COLS)}; rename them first"
        )
    rkey = (-F.col(value)) if descending else F.col(value)
    null_guard = F.assert_true(
        F.col(value).isNotNull(),
        F.lit(
            f"ranked_ntile: null in rank column {value!r} — ntile-over-"
            "nulls has no distributed equivalent here; filter or "
            "coalesce nulls before calling"
        ),
    )
    # assert_true returns NULL when it passes, so the `when` arm is
    # always taken — it exists only to keep the guard in the projection.
    keyed = df.withColumn(
        "__rk", F.when(null_guard.isNull(), rkey.cast("double"))
    )

    extent = keyed.agg(F.min("__rk").alias("__lo"), F.max("__rk").alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(buckets))
    raw = F.floor((F.col("__rk") - F.col("__lo")) / width)
    bucketed = (
        keyed.join(F.broadcast(extent))
        .withColumn(
            "__p",
            F.when(width <= 0.0, F.lit(0))  # all-equal keys: one bucket
            .otherwise(
                F.least(F.lit(buckets - 1), F.greatest(F.lit(0), raw))
            )
            .cast("int"),
        )
        .drop("__lo", "__hi")
    )

    # Cumulative offsets + grand total over the ≤`buckets`-row count
    # table — the only unpartitioned window, bucket-cardinality by
    # construction (same shape as harvest/load.py:_dense_ids).
    w_off = Window.orderBy("__p").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("__p").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        bucketed.groupBy("__p")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "__p",
            F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
            F.sum("__n").over(w_tot).alias("__c"),
        )
    )

    order: list[Column] = [
        F.col(value).desc() if descending else F.col(value).asc()
    ]
    order += [F.col(t).asc() for t in tiebreakers]
    w_in = Window.partitionBy("__p").orderBy(*order)
    rank = F.row_number().over(w_in).cast("long") + F.col("__off")

    return (
        bucketed.join(F.broadcast(offsets), "__p")
        .withColumn("__rank", rank)
        .drop("__rk", "__p", "__off")
    )


def ranked_ntile(
    df: DataFrame,
    n_tiles: int,
    value: str,
    tiebreakers: Sequence[str],
    *,
    descending: bool = False,
    buckets: int = RANGE_BUCKETS,
    out: str = "ntile",
) -> DataFrame:
    """``ntile(n_tiles) OVER (ORDER BY value [DESC], *tiebreakers)``
    without the single-task global sort.

    ``value`` must be a non-null numeric column (the range key);
    ``tiebreakers`` order ascending within equal values, exactly like
    the trailing ORDER BY columns of the window form, and must make
    the total order unique for deterministic assignment.  Returns
    ``df`` plus a bigint ``out`` column.

    The non-null precondition is ENFORCED, not just documented: a null
    rank key would get a null ``__p``, fail the inner ``__p``
    equi-join, and silently drop the row — where ``ntile() OVER``
    keeps nulls first.  ``assert_true`` in the ``__rk`` projection
    turns that silent loss into a loud job failure (no extra scan —
    it rides the same stage).
    """
    ranked = _global_rank(
        df, value, tiebreakers, descending=descending, buckets=buckets
    )
    # Exact SQL ntile sizing: q = c div n, rem = c mod n; the first
    # rem tiles take q+1 rows.  greatest(q,1) only de-poisons the
    # dead branch under ANSI when q == 0 (fewer rows than tiles, where
    # the `when` arm always wins).
    rank = F.col("__rank")
    c = F.col("__c")
    q = F.floor(c / F.lit(n_tiles)).cast("long")
    rem = c % F.lit(n_tiles)
    big = rem * (q + F.lit(1))
    tile = F.when(rank <= big, F.ceil(rank / (q + F.lit(1)))).otherwise(
        rem + F.ceil((rank - big) / F.greatest(q, F.lit(1)))
    )
    return ranked.withColumn(out, tile.cast("long")).drop("__rank", "__c")


def ranked_row_number(
    df: DataFrame,
    value: str,
    tiebreakers: Sequence[str],
    *,
    descending: bool = False,
    buckets: int = RANGE_BUCKETS,
    out: str = "rank",
    total: str | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY value [DESC], *tiebreakers)``
    without the single-task global sort — the same three-step
    range-bucket machinery as :func:`ranked_ntile` (bit-identical
    window contract), stopping at the exact global rank instead of
    the tile arithmetic.  With ``total``, the grand row count rides
    along as an extra column — it falls out of the offsets table for
    free, so callers doing modular rank arithmetic (negative-pair
    sampling) skip a separate count job."""
    ranked = _global_rank(
        df, value, tiebreakers, descending=descending, buckets=buckets
    ).withColumnRenamed("__rank", out)
    if total is not None:
        return ranked.withColumnRenamed("__c", total)
    return ranked.drop("__c")
