"""Bucket-pruned harvest merge — the load path's 100 TB form.

``harvest_run`` (load.py) ping-pongs the WHOLE ``terms`` /
``term_fields`` state through parquet per batch: correct, but O(table)
I/O per page — quadratic over a long run.  The reference's own commit
unit is one page (reference: harvest.py:374) and its upsert touches
only the page's keys (harvest.py:326-349, :363-372), so the scalable
Spark form is a *partition-pruned merge*:

* state lives hash-partitioned on ``bucket = pmod(xxhash64(uri), N)``
  (``terms/bucket=K/``, ``term_fields/bucket=K/``); a term and all its
  fields share a bucket (the field bucket is derived from the parent
  uri), so FK resolution never crosses buckets;
* per batch, the touched bucket set is collected (≤N small ints — the
  same class of driver-side metadata as Delta's file pruning, and the
  only collect in the package besides the max-id scalar);
* ONLY touched buckets are read (partition pruning at the parquet
  scan: a batch of 1 000 uris over N=64 reads ≤64/64 buckets of *keys
  present*, independent of table size ... with a realistic page the
  expected fraction is ``1 - exp(-pagesize/N)`` of N, and the read is
  bounded by touched-bucket bytes, not table bytes);
* merged buckets are staged to a fresh directory and committed by
  atomic per-bucket directory swap — untouched buckets' files are
  never rewritten (byte-identical, pinned by
  tests/test_harvest_bucketed.py).  On Delta/Iceberg the same algebra
  is ``MERGE INTO`` with partition predicates; this is the plain-
  filesystem analogue with the identical I/O profile.

Surrogate ids use the hash strategy (``xxhash64``) throughout: fully
parallel, stable across reruns, no global max-id scan — density is a
SQLite artifact the bucketed path deliberately drops (SURVEY.md §1.3).

A rerun of the same page inserts nothing, advances ``updated_at`` on
its touched term buckets only, and SKIPS the ``term_fields`` commit
entirely when the anti-join yields zero fresh rows.
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StructField, StructType

from setup_harvest_action_spark.harvest.load import LoadStats
from setup_harvest_action_spark.harvest.normalize import clean_bindings, unpivot_bindings
from setup_harvest_action_spark.schemas import TERM_FIELDS, TERMS


def _with_bucket(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField("bucket", IntegerType(), True)])


TERMS_BUCKETED = _with_bucket(TERMS)
TERM_FIELDS_BUCKETED = _with_bucket(TERM_FIELDS)


def _bucket_of(uri_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(uri_col), F.lit(n_buckets)).cast("int")


class BucketedHarvestState:
    """Parquet state hash-partitioned by uri bucket.

    Layout::

        root/
          _N_BUCKETS            # bucket count, fixed at creation
          terms/bucket=K/...
          term_fields/bucket=K/...
    """

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 64):
        self.spark = spark
        self.root = root
        meta = os.path.join(root, "_N_BUCKETS")
        if os.path.exists(meta):
            with open(meta, encoding="ascii") as fh:
                persisted = int(fh.read().strip())
            if persisted != n_buckets:
                raise ValueError(
                    f"state at {root} has n_buckets={persisted}, got {n_buckets}"
                )
        else:
            os.makedirs(root, exist_ok=True)
            with open(meta, "w", encoding="ascii") as fh:
                fh.write(str(n_buckets))
        self.n_buckets = n_buckets

    # -- reads ---------------------------------------------------------------

    def _read(self, table: str, schema: StructType, buckets: list[int]) -> DataFrame:
        """Partition-pruned scan of ``buckets`` only (empty state → empty
        DataFrame).  The isin filter is on the partition column, so the
        scan lists only the named bucket directories."""
        path = os.path.join(self.root, table)
        if not os.path.isdir(path):
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).option("basePath", path).parquet(path)
        if buckets is not None:
            df = df.filter(F.col("bucket").isin(buckets))
        return df

    def terms(self, buckets: list[int] | None = None) -> DataFrame:
        return self._read("terms", TERMS_BUCKETED, buckets)

    def term_fields(self, buckets: list[int] | None = None) -> DataFrame:
        return self._read("term_fields", TERM_FIELDS_BUCKETED, buckets)

    # -- commit --------------------------------------------------------------

    def _commit(self, table: str, staged: DataFrame) -> None:
        """Stage ``staged`` (touched buckets only) to a fresh directory,
        then swap each staged ``bucket=K`` dir into place.  One data
        pass over touched buckets; untouched bucket directories are
        never listed, read, or rewritten.  On an object store this
        driver-side swap is the table format's job (Delta/Iceberg
        MERGE commit); on a filesystem it is a per-bucket rename."""
        final = os.path.join(self.root, table)
        staging = os.path.join(self.root, f".staging-{table}-{uuid.uuid4().hex[:8]}")
        staged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        os.makedirs(final, exist_ok=True)
        for entry in os.listdir(staging):
            if not entry.startswith("bucket="):
                continue
            dst = os.path.join(final, entry)
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.replace(os.path.join(staging, entry), dst)
        shutil.rmtree(staging, ignore_errors=True)

    # -- maintenance ---------------------------------------------------------

    def vacuum(self, min_age_sec: float = 600.0) -> list[str]:
        """Remove crash-leftover staging directories.  ``_commit``
        deletes its staging dir after a successful swap, but a crash
        between stage and swap leaves an orphan ``.staging-*`` holding
        disk forever.  Only dirs older than ``min_age_sec`` go (a
        concurrent writer's live staging area is younger); the state
        is single-writer by contract (the reference's page loop is
        too), so this is a safety margin, not a locking scheme.
        Returns the removed directory names."""
        import time

        removed = []
        now = time.time()
        for entry in os.listdir(self.root):
            if not entry.startswith(".staging-"):
                continue
            path = os.path.join(self.root, entry)
            try:
                if now - os.path.getmtime(path) < min_age_sec:
                    continue
            except OSError:
                continue
            shutil.rmtree(path, ignore_errors=True)
            removed.append(entry)
        return removed

    # -- merge ---------------------------------------------------------------

    def load_batch(
        self, bindings: DataFrame, batch_ts: _dt.datetime
    ) -> LoadStats:
        """One page's merge, touching only the page's buckets.

        Same algebra as ``harvest_batch`` (upsert + anti-join append,
        reference semantics harvest.py:326-372) restricted to the
        pruned bucket set, with hash surrogate ids.
        """
        n = self.n_buckets
        ts = F.lit(batch_ts).cast("timestamp")

        concepts = (
            clean_bindings(bindings)
            .select(F.col("concept").alias("uri"))
            .distinct()
            .withColumn("bucket", _bucket_of("uri", n))
            .cache()
        )
        touched = sorted(
            r["bucket"] for r in concepts.select("bucket").distinct().collect()
        )

        # ---- terms: keyed merge inside touched buckets ----
        existing = self.terms(touched).cache()
        matched = existing.join(concepts.select("uri"), "uri", "left_semi")
        untouched_rows = existing.join(concepts.select("uri"), "uri", "left_anti")
        updated = matched.withColumn("updated_at", ts)
        inserted = concepts.join(existing.select("uri"), "uri", "left_anti").select(
            F.xxhash64("uri").alias("id"),
            "uri",
            ts.alias("created_at"),
            ts.alias("updated_at"),
            "bucket",
        )
        # Inserted/updated counters ride the staged write itself
        # (transient marker + CollectMetrics, dropped before disk) —
        # no count jobs in the merge, same pattern as
        # load.harvest_batch_observed.
        from pyspark.sql import Observation

        obs = Observation()
        merged_terms = (
            untouched_rows.withColumn("__b", F.lit(0))
            .unionByName(updated.withColumn("__b", F.lit(1)))
            .unionByName(inserted.withColumn("__b", F.lit(2)))
            .observe(
                obs,
                F.sum((F.col("__b") == 2).cast("long")).alias("ins"),
                F.sum((F.col("__b") == 1).cast("long")).alias("upd"),
            )
            .drop("__b")
        )
        self._commit("terms", merged_terms)
        n_ins = int(obs.get["ins"] or 0)
        n_upd = int(obs.get["upd"] or 0)

        # ---- term_fields: FK-resolve + insert-if-absent ----
        new_terms = self.terms(touched)
        long = unpivot_bindings(bindings)
        resolved = (
            long.join(
                new_terms.select(
                    F.col("id").alias("term_id"),
                    F.col("uri").alias("concept"),
                    "bucket",
                ),
                "concept",
            )
            .select("term_id", "field_uri", "field_term", "original_value", "bucket")
        )
        existing_fields = self.term_fields(touched)
        fresh = resolved.join(
            existing_fields.select("term_id", "field_uri", "original_value"),
            ["term_id", "field_uri", "original_value"],
            "left_anti",
        )
        fresh_rows = fresh.select(
            F.xxhash64("term_id", "field_uri", "original_value").alias("id"),
            "term_id",
            "field_uri",
            "field_term",
            "original_value",
            ts.alias("created_at"),
            ts.alias("updated_at"),
            "bucket",
        ).cache()
        n_fields = fresh_rows.count()
        if n_fields:
            # Only buckets that actually gained rows are re-staged; a
            # rerun with nothing fresh skips the commit entirely.
            gained = sorted(
                r["bucket"] for r in fresh_rows.select("bucket").distinct().collect()
            )
            merged_fields = self.term_fields(gained).unionByName(fresh_rows)
            self._commit("term_fields", merged_fields)
        fresh_rows.unpersist()
        existing.unpersist()
        concepts.unpersist()
        return LoadStats(n_ins, n_upd, n_fields)
