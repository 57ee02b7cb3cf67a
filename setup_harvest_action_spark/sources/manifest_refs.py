"""Named refs — TAGS and BRANCHES — on the manifest table format,
plus fast-forward publish: the write-audit-publish (WAP) pattern.

The r9/r10 manifest format has linear history (versioned snapshots +
one latest pointer).  This module adds the Iceberg-style ref layer on
top of those immutable snapshots:

* a **tag** is an immutable name for one committed version — "the
  corpus as evaluated in the June run".  Tags pin their snapshot (and
  its data files) against ``vacuum_manifest`` forever, which is the
  whole point of naming it.
* a **branch** is a mutable head: ``append_to_branch`` commits new
  snapshots that the MAIN pointer never sees, each recording its
  ``parent`` version, advanced under the same ``O_EXCL`` lock +
  expected-head CAS discipline as the main commit path
  (:class:`CommitConflict` on a lost race).
* ``fast_forward`` publishes a branch: the main pointer flips to the
  branch head in one atomic rename, allowed only when main's current
  version is an ANCESTOR of the head (anything else means main moved
  independently and the flip would silently drop commits — refused).

Together these give WAP — the pattern a 100 TB training-data pipeline
actually runs: write tonight's crawl onto ``staging``, audit it there
(row counts, dedup rate, quality gates) while production readers keep
scanning main untouched, then publish with one O(1) pointer flip.
No data files move at any step; every operation here is metadata-only
and corpus-size-independent.

Interop with the core format (``sources/manifest_sink.py``):

* version numbers stay globally unique — branch commits allocate past
  every snapshot on disk, and main commits skip ref-protected versions
  (``_ref_protected_versions``), so neither path can overwrite the
  other's snapshot;
* vacuum retains every snapshot (and data file) reachable from a ref:
  tag targets, branch heads, and branch parent chains;
* crash between a branch snapshot write and the ref advance leaves an
  unprotected orphan — invisible to every reader, reclaimed by vacuum:
  the same crash-before-flip story as the main commit point.

Reference parity: the reference has no table format at all (its state
is a SQLite file, harvest.py:161-289); this extends the repo's
north-star format the way Iceberg refs / Nessie extend a table
catalog — public designs, re-expressed over this repo's manifest.
"""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.sources.manifest_sink import (
    MANIFEST,
    REFS,
    SNAPSHOT_FMT,
    CommitConflict,
    _load_refs,
    _merge_schemas,
    _stage_parts,
    read_manifest,
    scan_manifest,
)


class _ref_lock:
    """The table's commit lock — the SAME file ``_write_versioned``
    uses for its CAS path, so ref mutations serialize against
    optimistic main commits, not just against each other."""

    def __init__(self, path: str):
        self._lock = os.path.join(path, "_commit.lock")
        self._fd: int | None = None

    def __enter__(self):
        for _ in range(200):  # ~2 s of 10 ms retries, then fail loudly
            try:
                self._fd = os.open(
                    self._lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                return self
            except FileExistsError:
                time.sleep(0.01)
        raise TimeoutError(f"commit lock at {self._lock} never released")

    def __exit__(self, *exc):
        if self._fd is not None:
            os.close(self._fd)
            try:
                os.remove(self._lock)
            except OSError:
                pass
        return False


def _snapshot(path: str, version: int) -> dict:
    """Load an immutable snapshot DIRECTLY (no main-latest guard: a
    branch head legitimately exceeds the main pointer)."""
    try:
        fname = os.path.join(path, SNAPSHOT_FMT.format(version))
        with open(fname, encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"snapshot v{version} does not exist at {path} "
            "(never committed, or vacuumed without a protecting ref)"
        ) from None


def _save_refs(path: str, refs: dict) -> None:
    tmp = os.path.join(path, REFS + ".tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(refs, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, REFS))


def _max_version_on_disk(path: str) -> int:
    """Highest snapshot version any writer has ever persisted — the
    allocation floor for branch commits (branch snapshots must never
    collide with main's or each other's)."""
    best = 0
    for entry in os.listdir(path):
        if entry.startswith("_manifest-v") and entry.endswith(".json"):
            best = max(best, int(entry[len("_manifest-v"):-len(".json")]))
    if os.path.exists(os.path.join(path, MANIFEST)):
        best = max(best, read_manifest(path).get("version", 0))
    return best


def _assert_new_name(refs: dict, name: str) -> None:
    if name in refs["tags"] or name in refs["branches"]:
        raise ValueError(f"ref {name!r} already exists (refs are unique; "
                         "tags are immutable — delete first to re-point)")


def create_tag(path: str, name: str, version: int | None = None) -> int:
    """Name a committed version.  Defaults to the current main head;
    immutable once created (re-pointing a tag is a delete + create,
    deliberately loud)."""
    with _ref_lock(path):
        refs = _load_refs(path)
        _assert_new_name(refs, name)
        v = version if version is not None else read_manifest(path)["version"]
        _snapshot(path, v)  # must exist — a tag to nowhere is an error NOW
        refs["tags"][name] = v
        _save_refs(path, refs)
    return v


def create_branch(path: str, name: str, version: int | None = None) -> int:
    """Open a mutable branch at a committed version (default: main
    head).  Subsequent ``append_to_branch`` commits advance only this
    ref; main readers never see them until ``fast_forward``."""
    with _ref_lock(path):
        refs = _load_refs(path)
        _assert_new_name(refs, name)
        v = version if version is not None else read_manifest(path)["version"]
        _snapshot(path, v)
        refs["branches"][name] = v
        _save_refs(path, refs)
    return v


def delete_ref(path: str, name: str) -> None:
    """Drop a tag or branch.  Its snapshots lose protection — the next
    vacuum may reclaim them (exactly like dropping an Iceberg ref)."""
    with _ref_lock(path):
        refs = _load_refs(path)
        for kind in ("tags", "branches"):
            if name in refs[kind]:
                del refs[kind][name]
                _save_refs(path, refs)
                return
    raise ValueError(f"no ref named {name!r} at {path}")


def resolve_ref(path: str, ref: str) -> dict:
    """Snapshot dict for a ref name (``"main"``, a tag, or a branch)."""
    if ref == "main":
        return read_manifest(path)
    refs = _load_refs(path)
    if ref in refs["tags"]:
        return _snapshot(path, refs["tags"][ref])
    if ref in refs["branches"]:
        return _snapshot(path, refs["branches"][ref])
    raise ValueError(f"no ref named {ref!r} at {path}")


def scan_ref(spark, path: str, ref: str = "main", where=()):
    """``scan_manifest`` through a named ref — same data skipping,
    same schema discipline, resolved head."""
    return scan_manifest(
        spark, path, where=where, manifest=resolve_ref(path, ref)
    )


def append_to_branch(
    df,
    path: str,
    branch: str,
    expected_head: int | None = None,
) -> dict:
    """Commit ``df`` as new parts visible ONLY on ``branch``.

    The parquet staging (the slow, corpus-sized half) runs outside the
    lock; the lock covers only the metadata transition: re-read the
    head, CAS against ``expected_head``, allocate a globally fresh
    version, persist the snapshot (recording ``parent``), advance the
    ref.  A crash before the ref advance leaves an unprotected orphan
    snapshot + unreferenced parts — invisible, vacuumed later."""
    head0 = resolve_ref(path, branch)
    entries = _stage_parts(
        df, path, bloom_columns=head0.get("bloom_columns") or ()
    )
    with _ref_lock(path):
        refs = _load_refs(path)
        if branch not in refs["branches"]:
            raise ValueError(f"no branch named {branch!r} at {path}")
        head = refs["branches"][branch]
        if expected_head is not None and head != expected_head:
            raise CommitConflict(
                f"branch {branch!r} is at v{head}, commit was derived "
                f"from v{expected_head} — re-derive and retry"
            )
        base = _snapshot(path, head)
        m = dict(base)
        m["files"] = sorted(base["files"] + entries, key=lambda e: e["file"])
        m["total_rows"] = sum(e["rows"] for e in m["files"])
        m["schema"] = _merge_schemas(base.get("schema"), df.schema)
        m["parent"] = head
        m["branch"] = branch
        m["version"] = _max_version_on_disk(path) + 1
        m["committed_at"] = time.time()
        snap = os.path.join(path, SNAPSHOT_FMT.format(m["version"]))
        tmp = snap + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(m, fh, indent=1, sort_keys=True)
        os.replace(tmp, snap)
        refs["branches"][branch] = m["version"]
        _save_refs(path, refs)
    return m


def stream_append_to_branch(df, path: str, branch: str, checkpoint: str):
    """STREAMING write-audit-publish: every micro-batch commits to
    ``branch`` (never to main), so a continuous ingest can run all day
    against the staging ref while production readers scan main
    untouched; the nightly audit then publishes one ``fast_forward``.

    ``foreachBatch`` + the CAS-advancing ``append_to_branch`` — the
    same composition as ``stream_merge_into``, with the same contract:
    replay idempotence comes from the checkpoint (a replayed batch
    after a crash BEFORE the ref advance re-commits cleanly, because
    the crashed attempt left only an unprotected orphan).  Returns the
    started StreamingQuery."""

    def _apply(batch_df, batch_id: int) -> None:
        append_to_branch(batch_df, path, branch)

    return (
        df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def fast_forward(path: str, branch: str) -> dict:
    """PUBLISH a branch: flip the main pointer to the branch head.

    Allowed only when main's current version is an ancestor of the
    head (walking the head's ``parent`` chain reaches it) — i.e. main
    gained nothing the branch doesn't already contain.  A diverged
    main raises :class:`CommitConflict`; resolving divergence is a
    data decision (rebase the branch), never done silently.  The flip
    itself is one atomic rename — O(1) at any table size."""
    with _ref_lock(path):
        main = read_manifest(path)
        refs = _load_refs(path)
        if branch not in refs["branches"]:
            raise ValueError(f"no branch named {branch!r} at {path}")
        head = refs["branches"][branch]
        if head == main["version"]:
            return main  # nothing to publish
        cur: int | None = head
        while cur is not None and cur != main["version"]:
            cur = _snapshot(path, cur).get("parent")
        if cur is None:
            raise CommitConflict(
                f"main (v{main['version']}) is not an ancestor of "
                f"{branch!r} (v{head}) — it advanced independently; "
                "fast-forward refused"
            )
        head_snap = _snapshot(path, head)
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(head_snap, fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(path, MANIFEST))
    return head_snap


@query(
    "q_source_manifest_wap",
    oracle="""
SELECT c_custkey AS ckey,
       c_mktsegment AS segment,
       CAST(round(c_acctbal, 2) AS DOUBLE) AS acctbal
FROM customer
""",
)
def q_source_manifest_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish end-to-end: three quarters of ``customer``
    are committed to MAIN; the held-out quarter lands on a ``staging``
    branch (main readers cannot see it — pinned in
    tests/test_manifest_refs.py); the branch passes its audit and is
    published by fast-forward; the publish version is tagged.  The
    final main scan must hash-match the WHOLE table — proving no row
    was lost, duplicated, or altered crossing the branch boundary.
    Every ref step is metadata-only: the staged parquet never moves.
    """
    import shutil

    from setup_harvest_action_spark.sources.files import _roundtrip_dir
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    out = _roundtrip_dir(sf_dir, "manifest_wap", "customer")
    shutil.rmtree(out, ignore_errors=True)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    (
        cust.filter(F.col("ckey") % 4 != 0)
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(out)
    )
    create_branch(out, "staging")
    append_to_branch(cust.filter(F.col("ckey") % 4 == 0), out, "staging")
    # audit on the branch: the full row count must reconcile before
    # anything becomes visible on main
    fast_forward(out, "staging")
    create_tag(out, "published")
    return scan_ref(spark, out, "published")


@query(
    "q_source_manifest_stream_wap",
    oracle="""
SELECT c_custkey AS ckey,
       c_mktsegment AS segment,
       CAST(round(c_acctbal, 2) AS DOUBLE) AS acctbal
FROM customer
""",
)
def q_source_manifest_stream_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING write-audit-publish under the hash gate: three
    quarters of ``customer`` seed MAIN; the held-out quarter arrives
    as a FILE STREAM and lands on the ``staging`` branch micro-batch
    by micro-batch (``stream_append_to_branch`` — main readers see
    nothing while the stream runs); after the drain the branch is
    audited and published by fast-forward.  The final main scan must
    hash-match the whole table — the same no-loss/no-dup/no-mutation
    proof as the batch WAP entry, now across the streaming commit
    path and its checkpoint."""
    import shutil

    from setup_harvest_action_spark.sources.files import _roundtrip_dir
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    out = _roundtrip_dir(sf_dir, "manifest_stream_wap", "customer")
    shutil.rmtree(out, ignore_errors=True)
    feed = _roundtrip_dir(sf_dir, "manifest_stream_wap_feed", "customer")
    shutil.rmtree(feed, ignore_errors=True)
    ckpt = _roundtrip_dir(sf_dir, "manifest_stream_wap_ckpt", "customer")
    shutil.rmtree(ckpt, ignore_errors=True)

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    (
        cust.filter(F.col("ckey") % 4 != 0)
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(out)
    )
    create_branch(out, "staging")
    cust.filter(F.col("ckey") % 4 == 0).write.parquet(feed)
    stream = spark.readStream.schema(
        "ckey long, segment string, acctbal double"
    ).option("maxFilesPerTrigger", 1).parquet(feed)
    q = stream_append_to_branch(stream, out, "staging", ckpt)
    q.awaitTermination(300)
    fast_forward(out, "staging")
    return scan_ref(spark, out, "main")
