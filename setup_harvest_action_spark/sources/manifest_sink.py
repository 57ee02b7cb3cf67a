"""Manifest-committed parquet sink — a PySpark 4 Python DataSource
WRITER (the write-side counterpart of sources/sparql_datasource.py's
reader).

Plain ``df.write.parquet`` commits by directory rename + _SUCCESS
marker: readers that list the directory mid-job can see partial
output, and there is no record of WHAT a committed version contains.
Table formats fix this with a manifest commit — tasks write data
files nobody reads yet, and one atomic driver-side manifest write
flips the new version visible.  This sink implements that protocol on
the DataSource writer API:

* each TASK serializes its partition to a uniquely-named parquet part
  under ``<path>/data/`` (pyarrow, Arrow-batched) and returns a
  ``WriterCommitMessage`` carrying (file, row count, byte size) — no
  task ever touches shared state;
* ``commit()`` runs ONCE on the driver with every task's message and
  atomically renames ``_manifest.json.tmp`` → ``_manifest.json``
  listing the committed files + counts; a crashed job leaves data
  files but NO manifest, so readers (``read_manifest`` /
  ``scan_manifest``) see the previous state — exactly the bucketed
  state's staged-swap discipline (harvest/bucketed.py), formalized as
  a reusable sink;
* ``abort()`` best-effort deletes the orphan parts named in the
  received messages.

VERSIONED COMMITS (r9): every commit — batch or micro-batch — bumps a
monotonically increasing ``version`` and persists an IMMUTABLE
snapshot ``_manifest-v{N}.json`` beside the latest pointer, giving the
sink table-format time travel:

* ``read_manifest(path, version=N)`` / ``scan_manifest(spark, path,
  version=N)`` read any retained historical version;
* snapshots are written BEFORE the latest flip, so a crash between the
  two leaves an orphan snapshot with ``version > latest.version`` —
  readers refuse such versions (they were never committed) and the
  next commit's ``os.replace`` supersedes the orphan file;
* ``compact(spark, path, n_parts)`` rewrites the current content into
  ``n_parts`` fresh files through the SAME atomic commit path (new
  version, streaming batch ids carried over), leaving the old parts
  to ``vacuum_manifest(path, keep_last=K)``, which drops snapshots
  older than the last K and every data file no retained version
  references.

Register per-session with ``register_manifest_sink(spark)``; then
``df.write.format("manifest_parquet").mode("append"|"overwrite")
.save(path)``.  Reference parity: the reference commits each page with
``conn.commit()`` (harvest.py:374) — this is the same all-or-nothing
visibility boundary for distributed writers.
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

MANIFEST = "_manifest.json"
SNAPSHOT_FMT = "_manifest-v{}.json"
REFS = "_refs.json"  # named refs (tags/branches) — sources/manifest_refs.py


def _load_refs(path: str) -> dict:
    """The table's named-ref file; an absent file is the empty ref set
    (every pre-refs table stays valid unchanged)."""
    try:
        with open(os.path.join(path, REFS), encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"tags": {}, "branches": {}}


def _ref_protected_versions(path: str) -> set[int]:
    """Every snapshot version reachable from a named ref: tag targets,
    branch heads, and each branch head's parent chain (branch lineage
    must survive vacuum/overwrite so ancestry checks and the branch's
    own history stay valid).  Empty — at the cost of one failed
    ``open`` — when the table has no refs, the common case."""
    refs = _load_refs(path)
    protected: set[int] = {v for v in refs.get("tags", {}).values()}
    for head in refs.get("branches", {}).values():
        v = head
        while isinstance(v, int) and v > 0 and v not in protected:
            protected.add(v)
            try:
                snap = os.path.join(path, SNAPSHOT_FMT.format(v))
                with open(snap, encoding="utf-8") as fh:
                    v = json.load(fh).get("parent")
            except FileNotFoundError:
                break
    return protected


class CommitConflict(RuntimeError):
    """Another writer committed between this writer's read of the
    table state and its commit attempt — the optimistic-concurrency
    failure.  Retry by re-reading, re-deriving the commit against the
    new state, and committing again (the Delta/Iceberg loop)."""


def _write_versioned(
    path: str, manifest: dict, expected_version: int | None = None
) -> None:
    """Stamp the next version, persist the immutable snapshot, then
    atomically flip the latest pointer — in that order, so the flip is
    the single commit point (see module docstring for the
    crash-between analysis).

    ``expected_version`` enables OPTIMISTIC CONCURRENCY: the caller
    names the version its commit was derived FROM, and the write
    raises :class:`CommitConflict` if the table has moved on.  The
    check-then-flip window is closed with an ``O_EXCL`` lock file —
    valid on POSIX filesystems; an object-store deployment swaps this
    one primitive for its CAS/conditional-put (the same slot Delta
    fills with a LogStore and Iceberg with a catalog swap)."""
    # a zero-row commit (CREATE TABLE with no data yet — the streaming
    # bootstrap initializes an empty keyed table and MERGEs every
    # batch) writes no part files, so nothing has created the table
    # directory before the manifest lands
    os.makedirs(path, exist_ok=True)
    mpath = os.path.join(path, MANIFEST)
    lock = os.path.join(path, "_commit.lock")
    fd = None
    if expected_version is not None:
        import time as _time

        for _ in range(200):  # ~2 s of 10 ms retries, then fail loudly
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                _time.sleep(0.01)
        else:
            raise TimeoutError(f"commit lock at {lock} never released")
    try:
        prev_version = 0
        if os.path.exists(mpath):
            with open(mpath, encoding="utf-8") as fh:
                prev_version = json.load(fh).get("version", 0)
        if expected_version is not None and prev_version != expected_version:
            raise CommitConflict(
                f"table at {path} is at v{prev_version}, commit was "
                f"derived from v{expected_version} — re-derive and retry"
            )
        # Branch commits (sources/manifest_refs.py) persist snapshots
        # the main pointer never referenced; a main commit must not
        # reuse — and thereby overwrite — a version that a named ref
        # still reaches.  Versions protected by a ref are skipped; a
        # crash-orphaned snapshot is NOT protected, so the next commit
        # still supersedes it in place (and vacuum reclaims it).
        v = prev_version + 1
        protected = _ref_protected_versions(path)
        while v in protected:
            v += 1
        manifest["version"] = v
        # wall-clock commit stamp: powers time-travel-by-timestamp
        # (version_at_timestamp) exactly as Delta's commit timestamps
        # do; never part of any value-hashed result
        import time as _now

        manifest["committed_at"] = _now.time()
        snap = os.path.join(path, SNAPSHOT_FMT.format(manifest["version"]))
        tmp = snap + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, snap)  # supersedes any crash-orphaned snapshot
        tmp = mpath + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, mpath)
    finally:
        if fd is not None:
            os.close(fd)
            try:
                os.remove(lock)
            except OSError:
                pass


# --- Per-file Bloom filters (point-lookup data skipping) --------------------
#
# Min/max stats skip RANGE predicates but are useless for equality on
# high-entropy keys (every file's [min, max] spans the whole key space
# after a few appends).  A small per-file Bloom filter — built from the
# column's values at WRITE TIME on the executor that wrote the part,
# riding the same _PartMessage → manifest plumbing as the footer stats
# — turns a point lookup on a 100 TB table into opening only the files
# whose filter admits the key.  No false negatives by construction
# (skipping stays a pure optimization); false positives only cost an
# extra file read.  This is the slot Delta fills with bloom-filter
# index files and Iceberg with puffin sidecars; at manifest-JSON scale
# the filters are capped (max_bits) and a production deployment would
# spill them to sidecar files keyed by the same manifest entries.
# Cost model: SCALE.md §10 (bits/key, expected files opened, the
# sidecar spill point).

_BLOOM_MAX_BITS = 1 << 16  # 64 Kbit = 8 KiB per (file, column) cap


def _bloom_key(v):
    """Canonical byte serialization of a value for bloom hashing —
    must be identical at build (pyarrow value) and probe (predicate
    literal) time.  Returns None for unsupported types (floats: both
    equality-on-float and cross-representation canonicalization are
    traps; a None poisons the column's filter so skipping never
    guesses)."""
    import datetime as dt

    if v is None or isinstance(v, float):
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"b:1" if v else b"b:0"
    if isinstance(v, int):
        return b"i:" + str(v).encode()
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    if isinstance(v, (dt.datetime, dt.date)):
        return b"t:" + v.isoformat().encode()
    return None


def _bloom_indexes(key: bytes, m: int, k: int):
    """k bit positions via Kirsch–Mitzenmacher double hashing over the
    two md5 halves — one digest per value, any k."""
    import hashlib

    d = hashlib.md5(key).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(h1 + i * h2) % m for i in range(k)]


def build_bloom(values, fpp: float = 0.01, max_bits: int = _BLOOM_MAX_BITS):
    """Bloom filter over ``values`` → JSON-encodable dict
    ``{"m": bits, "k": hashes, "b64": bitarray}`` or None when any
    value is unsupported (poisoned column) or the set is empty.
    Sized for ``fpp`` at the observed distinct count, capped at
    ``max_bits`` (the cap degrades fpp, never correctness)."""
    import base64
    import math

    keys = set()
    for v in values:
        kb = _bloom_key(v)
        if kb is None:
            return None
        keys.add(kb)
    if not keys:
        return None
    n = len(keys)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, min(m, max_bits))
    k = max(1, min(16, round(m / n * math.log(2))))
    bits = bytearray((m + 7) // 8)
    for kb in keys:
        for idx in _bloom_indexes(kb, m, k):
            bits[idx >> 3] |= 1 << (idx & 7)
    return {"m": m, "k": k, "b64": base64.b64encode(bytes(bits)).decode()}


def bloom_may_contain(bloom: dict, value) -> bool:
    """False ONLY when the filter PROVES the value absent; unsupported
    probe values conservatively keep the file."""
    import base64

    kb = _bloom_key(value)
    if kb is None:
        return True
    bits = base64.b64decode(bloom["b64"])
    for idx in _bloom_indexes(kb, bloom["m"], bloom["k"]):
        if not bits[idx >> 3] & (1 << (idx & 7)):
            return False
    return True


def part_blooms(path: str, columns, fpp: float = 0.01) -> dict:
    """Per-column Bloom filters for one parquet part — reads ONLY the
    named columns of the single file (at write time this runs on the
    executor that just wrote the part, exactly like ``part_stats``;
    the bytes are still in page cache).  Unsupported columns are
    omitted — absence means 'file may contain anything'."""
    import pyarrow.parquet as pq

    cols = [c for c in columns if c]
    if not cols:
        return {}
    schema_names = set(pq.read_schema(path).names)
    out = {}
    for c in cols:
        if c not in schema_names:
            continue
        tbl = pq.read_table(path, columns=[c])
        b = build_bloom(tbl.column(0).to_pylist(), fpp=fpp)
        if b is not None:
            out[c] = b
    return out


@dataclasses.dataclass
class _PartMessage(WriterCommitMessage):
    file: str
    rows: int
    bytes: int
    stats: dict | None = None
    blooms: dict | None = None


def _merge_schemas(prev_json: dict | None, new_schema) -> dict:
    """SCHEMA EVOLUTION merge: union of the table's committed schema
    and an incoming write's schema, as a Spark StructType jsonValue.

    * a column only in the NEW schema is ADDED (forced nullable —
      every pre-evolution file null-fills it at read);
    * a column only in the TABLE schema stays (the incoming write's
      parts simply lack it; readers null-fill those rows);
    * a column in both with a DIFFERENT type is REFUSED — type changes
      rewrite data and must go through an explicit migration, exactly
      Delta's mergeSchema contract.

    The merged schema is versioned WITH the manifest: each snapshot
    carries the schema as of its commit, so time travel reads an old
    version with the old column set."""
    new_json = (
        new_schema.jsonValue()
        if hasattr(new_schema, "jsonValue")
        else new_schema
    )
    if prev_json is None:
        return new_json
    prev_by_name = {f["name"]: f for f in prev_json["fields"]}
    merged = list(prev_json["fields"])
    for f in new_json["fields"]:
        p = prev_by_name.get(f["name"])
        if p is None:
            merged.append({**f, "nullable": True})
        elif p["type"] != f["type"]:
            raise ValueError(
                f"incompatible schema change for column {f['name']!r}: "
                f"table has {p['type']}, write has {f['type']} — type "
                "changes need an explicit rewrite migration"
            )
    return {"type": "struct", "fields": merged}


def _read_entries(spark, path: str, m: dict, entries: list[dict]):
    """Read the named manifest entries WITH the manifest's committed
    schema when one is recorded: parquet reads with an explicit schema
    null-fill columns a (pre-evolution) file lacks, which is the whole
    read-side of add-column evolution.  Legacy manifests without a
    schema fall back to footer-merged inference."""
    paths = [os.path.join(path, e["file"]) for e in entries]
    sj = m.get("schema")
    if sj:
        from pyspark.sql.types import StructType

        return spark.read.schema(StructType.fromJson(sj)).parquet(*paths)
    return spark.read.parquet(*paths)


def _json_stat(v):
    """JSON-encodable, ORDER-PRESERVING image of a parquet stat value:
    numbers/strings pass through, date-likes to ISO strings (ISO-8601
    compares lexicographically in time order), bytes dropped."""
    import datetime as dt

    if isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return None


def part_stats(path: str) -> dict:
    """Per-column [min, max] from the parquet FOOTER (no data read),
    merged across row groups; columns with missing/unencodable stats
    are omitted — readers treat absence as 'file may contain
    anything'."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    agg: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                agg[col.path_in_schema] = None  # poisoned: unknown rg
                continue
            lo, hi = _json_stat(st.min), _json_stat(st.max)
            if lo is None or hi is None:
                agg[col.path_in_schema] = None
                continue
            cur = agg.get(col.path_in_schema)
            if cur is None and col.path_in_schema in agg:
                continue  # stays poisoned
            agg[col.path_in_schema] = (
                [lo, hi]
                if cur is None
                else [min(cur[0], lo), max(cur[1], hi)]
            )
    return {k: v for k, v in agg.items() if v is not None}


class _ManifestWriter(DataSourceWriter):
    def __init__(
        self, path: str, schema, overwrite: bool, bloom_columns=()
    ):
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        self.bloom_columns = tuple(bloom_columns)

    def write(self, iterator) -> _PartMessage:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        rows = [tuple(r) for r in iterator]
        if not rows:
            # empty partition: nothing to commit, no file on disk
            return _PartMessage(file="", rows=0, bytes=0)
        data_dir = os.path.join(self.path, "data")
        os.makedirs(data_dir, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.parquet"
        out = os.path.join(data_dir, name)
        cols = list(zip(*rows)) if rows else [[] for _ in arrow_schema]
        table = pa.table(
            {
                f.name: pa.array(list(col), type=f.type)
                for f, col in zip(arrow_schema, cols)
            },
            schema=arrow_schema,
        )
        pq.write_table(table, out)
        return _PartMessage(
            file=f"data/{name}",
            rows=len(rows),
            bytes=os.path.getsize(out),
            stats=part_stats(out),
            # built HERE, on the executor that wrote the part — the
            # distributed half of the bloom-skipping story
            blooms=part_blooms(out, self.bloom_columns)
            if self.bloom_columns
            else None,
        )

    def commit(self, messages) -> None:
        manifest = {
            "files": sorted(
                [
                    {
                        "file": m.file,
                        "rows": m.rows,
                        "bytes": m.bytes,
                        "stats": getattr(m, "stats", None) or {},
                        **(
                            {"blooms": m.blooms}
                            if getattr(m, "blooms", None)
                            else {}
                        ),
                    }
                    for m in messages
                    if m is not None and m.file
                ],
                key=lambda e: e["file"],
            ),
        }
        manifest["total_rows"] = sum(e["rows"] for e in manifest["files"])
        manifest["schema"] = _merge_schemas(None, self.schema)
        if self.bloom_columns:
            manifest["bloom_columns"] = sorted(self.bloom_columns)
        if not self.overwrite and os.path.exists(
            os.path.join(self.path, MANIFEST)
        ):
            with open(os.path.join(self.path, MANIFEST), encoding="utf-8") as fh:
                prev = json.load(fh)
            manifest["files"] = sorted(
                prev["files"] + manifest["files"], key=lambda e: e["file"]
            )
            manifest["total_rows"] = sum(e["rows"] for e in manifest["files"])
            # append-time schema evolution: add-columns merge in,
            # incompatible type changes refuse the whole commit
            manifest["schema"] = _merge_schemas(prev.get("schema"), self.schema)
            prev_bloom = set(prev.get("bloom_columns") or ())
            both = prev_bloom | set(self.bloom_columns)
            if both:
                manifest["bloom_columns"] = sorted(both)
        _write_versioned(self.path, manifest)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.file:
                try:
                    os.remove(os.path.join(self.path, m.file))
                except OSError:
                    pass


class _ManifestStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the manifest writer: every micro-batch
    commits atomically into the SAME manifest, with the committed
    batchId recorded — a replayed batch (restart after a commit the
    engine didn't record) is detected and SKIPPED, which upgrades the
    sink to exactly-once under Structured Streaming's replay contract
    (the engine guarantees identical batch content for a given
    batchId; the sink only needs commit idempotence).  Task part
    files land under data/ exactly as in batch mode; readers go
    through scan_manifest and never see uncommitted parts."""

    def __init__(self, path: str, schema):
        self._delegate = _ManifestWriter(path, schema, overwrite=False)
        self.path = path

    def write(self, iterator) -> _PartMessage:
        return self._delegate.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        mpath = os.path.join(self.path, MANIFEST)
        manifest = {"files": [], "batches": []}
        if os.path.exists(mpath):
            with open(mpath, encoding="utf-8") as fh:
                manifest = json.load(fh)
            manifest.setdefault("batches", [])
        if batchId in manifest["batches"]:
            # replayed batch: identical content already committed —
            # drop the duplicate part files and keep the manifest as-is
            self.abort(messages, batchId)
            return
        manifest["files"] = sorted(
            manifest["files"]
            + [
                {
                    "file": m.file,
                    "rows": m.rows,
                    "bytes": m.bytes,
                    "stats": getattr(m, "stats", None) or {},
                }
                for m in messages
                if m is not None and m.file
            ],
            key=lambda e: e["file"],
        )
        manifest["batches"] = sorted(manifest["batches"] + [batchId])
        manifest["total_rows"] = sum(e["rows"] for e in manifest["files"])
        manifest["schema"] = _merge_schemas(
            manifest.get("schema"), self._delegate.schema
        )
        _write_versioned(self.path, manifest)

    def abort(self, messages, batchId: int) -> None:
        self._delegate.abort(messages)


@dataclasses.dataclass
class _ManifestFilePartition(InputPartition):
    file: str  # absolute parquet part path, "" for the empty sentinel


class _ManifestChangesStreamReader(DataSourceStreamReader):
    """The manifest table as an INCREMENTAL STREAMING SOURCE — the
    Delta-style "stream from a table" read, with manifest VERSIONS as
    offsets: each micro-batch admits exactly the part files committed
    in versions (start, end], so the checkpoint remembers which
    commits are consumed and a restart resumes at the next commit —
    never re-reading or skipping one.  Completes the sink's API
    square: batch write, stream write, batch read (scan_manifest),
    stream read.

    Append-only contract: a commit that REMOVES files (compaction /
    overwrite) rewrites rows the stream already emitted, so
    ``partitions`` fails loudly on it unless
    ``skipchangecommits=true`` (the Delta option of the same name),
    which skips that commit's files entirely.  Vacuumed-away snapshots
    inside the requested range also fail loudly — retention must
    outlive the slowest consumer, exactly the table-format rule."""

    def __init__(self, path: str, options: dict, col_names=None):
        self.path = path
        # the stream's declared column set: files committed BEFORE an
        # add-column evolution null-fill the newer columns
        self.col_names = list(col_names) if col_names else None
        self.skip_rewrites = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        try:
            return {"version": read_manifest(self.path).get("version", 0)}
        except FileNotFoundError:
            return {"version": 0}

    def _files(self, version: int) -> set[str]:
        if version == 0:
            return set()
        try:
            return {e["file"] for e in read_manifest(self.path, version)["files"]}
        except FileNotFoundError as exc:
            raise ValueError(
                f"snapshot v{version} at {self.path} was vacuumed away "
                "while this stream still needed it — raise keep_last "
                "past the slowest consumer's lag"
            ) from exc

    def partitions(
        self, start: dict, end: dict
    ) -> list[_ManifestFilePartition]:
        added: list[str] = []
        prev = self._files(start["version"])
        for v in range(start["version"] + 1, end["version"] + 1):
            cur = self._files(v)
            if prev - cur:  # files removed: a rewrite commit
                if not self.skip_rewrites:
                    raise ValueError(
                        f"commit v{v} at {self.path} rewrote files "
                        "(compaction/overwrite) — streams over this "
                        "table are append-only; pass "
                        "skipchangecommits=true to skip such commits"
                    )
            else:
                added.extend(sorted(cur - prev))
            prev = cur
        return [
            _ManifestFilePartition(os.path.join(self.path, f)) for f in added
        ] or [_ManifestFilePartition("")]

    def read(self, partition: _ManifestFilePartition):
        if not partition.file:
            return
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.file)
        if self.col_names is None:
            for batch in pf.iter_batches():
                yield from zip(*(c.to_pylist() for c in batch.columns))
            return
        present = set(pf.schema_arrow.names)
        take = [c for c in self.col_names if c in present]
        for batch in pf.iter_batches(columns=take):
            by_name = dict(zip(take, (c.to_pylist() for c in batch.columns)))
            n = batch.num_rows
            cols = [by_name.get(c, [None] * n) for c in self.col_names]
            yield from zip(*cols)

    def commit(self, end: dict) -> None:
        pass  # parts are immutable; nothing to release


class ManifestParquetSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_parquet"

    def schema(self):
        """Read-path schema: the manifest's committed (possibly
        evolved) schema when recorded, else inferred from the first
        committed part (legacy manifests).  The writer never calls
        this — Spark hands it the frame's own schema."""
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_parquet needs a path")
        m = read_manifest(path)
        if m.get("schema"):
            from pyspark.sql.types import StructType

            return StructType.fromJson(m["schema"])
        if not m["files"]:
            raise ValueError(f"empty manifest at {path} — no schema to infer")
        import pyarrow.parquet as pq

        first = os.path.join(path, m["files"][0]["file"])
        return from_arrow_schema(pq.read_schema(first))

    def writer(self, schema, overwrite: bool) -> _ManifestWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_parquet needs a path")
        raw = (
            self.options.get("bloomColumns")
            or self.options.get("bloomcolumns")
            or ""
        )
        cols = tuple(c.strip() for c in raw.split(",") if c.strip())
        return _ManifestWriter(path, schema, overwrite, bloom_columns=cols)

    def streamWriter(self, schema, overwrite: bool) -> _ManifestStreamWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_parquet needs a path")
        return _ManifestStreamWriter(path, schema)

    def streamReader(self, schema) -> _ManifestChangesStreamReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_parquet needs a path")
        return _ManifestChangesStreamReader(
            path, self.options, col_names=schema.fieldNames()
        )


def register_manifest_sink(spark) -> None:
    spark.dataSource.register(ManifestParquetSink)


def read_manifest(path: str, version: int | None = None) -> dict:
    """The committed manifest (raises FileNotFoundError before the
    first successful commit — a crashed job is invisible).  With
    ``version``, the immutable snapshot of that commit — refused when
    it exceeds the latest committed version (such a snapshot can only
    be a crash orphan whose flip never happened) and FileNotFoundError
    once vacuumed."""
    with open(os.path.join(path, MANIFEST), encoding="utf-8") as fh:
        latest = json.load(fh)
    if version is None:
        return latest
    if version > latest.get("version", 0):
        raise ValueError(
            f"version {version} was never committed at {path} "
            f"(latest = {latest.get('version', 0)})"
        )
    with open(
        os.path.join(path, SNAPSHOT_FMT.format(version)), encoding="utf-8"
    ) as fh:
        return json.load(fh)


_SKIP_OPS = ("<", "<=", ">", ">=", "=")


def _file_may_match(entry: dict, triples) -> bool:
    """Conservative stats check: False ONLY when the file's [min, max]
    for the column PROVES no row satisfies every ANDed triple.  A
    missing column stat keeps the file (unknown contents)."""
    for col, op, val in triples:
        rng = (entry.get("stats") or {}).get(col)
        if rng is None:
            continue
        lo, hi = rng
        if (
            (op == "<" and not lo < val)
            or (op == "<=" and not lo <= val)
            or (op == ">" and not hi > val)
            or (op == ">=" and not hi >= val)
            or (op == "=" and not lo <= val <= hi)
        ):
            return False
    for col, op, val in triples:
        if op != "=":
            continue
        bloom = (entry.get("blooms") or {}).get(col)
        if bloom is not None and not bloom_may_contain(bloom, val):
            return False
    return True


def select_files(m: dict, triples) -> list[dict]:
    """Manifest entries surviving stats-based skipping for the ANDed
    ``(column, op, value)`` triples — exposed separately so tests can
    pin WHICH files a predicate prunes."""
    for col, op, val in triples:
        if op not in _SKIP_OPS:
            raise ValueError(f"unsupported skip op {op!r} (use {_SKIP_OPS})")
    return [e for e in m["files"] if _file_may_match(e, triples)]


def scan_manifest(
    spark, path: str, version: int | None = None, where=(), manifest=None
):
    """Read ONLY the files the manifest names — uncommitted/orphan
    parts in data/ are never visible to readers.  ``version`` time-
    travels to a retained historical commit.

    ``where`` is an optional tuple of ANDed ``(column, op, value)``
    triples (op in <, <=, >, >=, =): files whose footer min/max PROVE no
    row can match are never opened — Delta-style data skipping from
    the manifest's per-file column stats, the mechanism that turns a
    selective point query on a 100 TB table into a handful of file
    reads.  The same triples are re-applied as a row filter, so
    skipping is purely an optimization, never a semantics change.

    Reads go through the manifest's COMMITTED schema (when recorded):
    files older than an add-column evolution null-fill the new
    columns, and a time-travel read uses the schema as of THAT
    version.

    ``manifest`` bypasses the main-pointer lookup with an already
    resolved snapshot dict — the hook named refs (tags/branches,
    sources/manifest_refs.py) scan through, since a branch head's
    version can legitimately exceed the main pointer's."""
    m = manifest if manifest is not None else read_manifest(path, version)
    entries = select_files(m, where) if where else m["files"]
    if not m["files"]:
        # a zero-file manifest WITH a committed schema is a legitimate
        # table state (empty-init + merge-every-batch, r17); only a
        # schema-less empty manifest is unreadable
        sj = m.get("schema")
        if sj:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType.fromJson(sj))
        raise ValueError(f"empty manifest at {path}")
    if not entries:
        # every file pruned: an empty frame with the table's schema
        return _read_entries(spark, path, m, m["files"]).filter("false")
    df = _read_entries(spark, path, m, entries)
    from pyspark.sql import functions as _F

    for col, op, val in where:
        c = _F.col(col)
        df = df.filter(
            {"<": c < val, "<=": c <= val, ">": c > val,
             ">=": c >= val, "=": c == val}[op]
        )
    return df


def _stage_parts(df, path: str, bloom_columns=()) -> list[dict]:
    """Write ``df`` into fresh uniquely-named parts under
    ``<path>/data/`` via a staging directory and return their manifest
    entries (rows / bytes / footer stats, plus per-file Bloom filters
    for ``bloom_columns`` so rewrites preserve the table's skipping
    index).  Empty parts are dropped.  Shared by every rewrite commit
    (delete_where / merge_into / compact): the staged parts are
    invisible until the caller's manifest flip names them, so a crash
    mid-stage leaves only unreferenced orphans for vacuum."""
    staging = os.path.join(path, f".stage-{uuid.uuid4().hex}")
    df.write.parquet(staging)
    return _adopt_staged(staging, path, bloom_columns)


def _adopt_staged(staging: str, path: str, bloom_columns=()) -> list[dict]:
    """Rename the parquet parts of an already-written ``staging``
    directory into ``<path>/data/`` and return their manifest entries
    — the second half of :func:`_stage_parts`, split out so a caller
    that staged a frame for OTHER reasons (``merge_into`` stages its
    source once to avoid re-executing the source plan per job) can
    adopt those same bytes as table files without a second write.
    Removes ``staging`` when done."""
    import shutil as _shutil

    import pyarrow.parquet as pq

    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    entries: list[dict] = []
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        src = os.path.join(staging, name)
        if pq.ParquetFile(src).metadata.num_rows == 0:
            continue
        dst_name = f"part-{uuid.uuid4().hex}.parquet"
        dst = os.path.join(data_dir, dst_name)
        os.rename(src, dst)
        entry = {
            "file": f"data/{dst_name}",
            "rows": pq.ParquetFile(dst).metadata.num_rows,
            "bytes": os.path.getsize(dst),
            "stats": part_stats(dst),
        }
        if bloom_columns:
            blooms = part_blooms(dst, bloom_columns)
            if blooms:
                entry["blooms"] = blooms
        entries.append(entry)
    _shutil.rmtree(staging, ignore_errors=True)
    return entries


def delete_where(spark, path: str, where) -> dict:
    """ROW-LEVEL DELETE: remove every row matching the ANDed
    ``(column, op, value)`` triples, rewriting ONLY the files whose
    stats admit a match — untouched files keep their bytes and their
    manifest entries verbatim.  The rewrite lands as one versioned
    commit (old candidates out, filtered parts in), so readers flip
    atomically, time travel still shows the pre-delete versions, and
    vacuum reclaims the superseded parts.  This is a CHANGE commit:
    streams over the table refuse it unless skipchangecommits=true —
    the same contract as compaction.  Returns the new manifest."""
    m = read_manifest(path)
    candidates = select_files(m, where)
    keep_entries = [e for e in m["files"] if e not in candidates]
    new_entries = list(keep_entries)
    if candidates:
        df = _read_entries(spark, path, m, candidates)
        from pyspark.sql import functions as _F

        pred = _F.lit(True)
        for col, op, val in where:
            c = _F.col(col)
            pred = pred & {
                "<": c < val, "<=": c <= val, ">": c > val,
                ">=": c >= val, "=": c == val,
            }[op]
        new_entries.extend(
            _stage_parts(
                df.filter(~pred),
                path,
                bloom_columns=m.get("bloom_columns") or (),
            )
        )
    manifest = {
        "files": sorted(new_entries, key=lambda e: e["file"]),
        "total_rows": sum(e["rows"] for e in new_entries),
    }
    if "batches" in m:
        manifest["batches"] = m["batches"]
    if "schema" in m:
        manifest["schema"] = m["schema"]
    if "bloom_columns" in m:
        manifest["bloom_columns"] = m["bloom_columns"]
    # optimistic concurrency: this commit rewrote files it READ from
    # version m — if another writer landed meanwhile, committing would
    # silently drop that writer's files from the manifest
    _write_versioned(path, manifest, expected_version=m.get("version", 0))
    return read_manifest(path)


def merge_into(
    spark,
    path: str,
    source,
    on: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
    update_cols: list[str] | None = None,
) -> dict:
    """MERGE INTO (Delta-parity upsert) on the manifest table format —
    the table-format promotion of the reference's O13 keyed-merge
    semantics (harvest.py:326-349: INSERT OR REPLACE keyed on term):

    * ``when_matched="update"``: a target row whose ``on`` key appears
      in ``source`` is REPLACED by the source row (full-row update;
      source must carry the table's exact column set);
      ``"delete"`` drops matched target rows instead.  A pure delete
      (``when_matched="delete", when_not_matched="ignore"``) accepts a
      KEY-ONLY source — Delta's ``MERGE ... WHEN MATCHED THEN DELETE``
      with nothing to insert needs no payload columns; this is the
      takedown path (row-level delete by key, e.g. right-to-be-
      forgotten against an index's vec_id).
    * ``update_cols=[...]`` narrows the update to the named columns —
      Delta's ``UPDATE SET col = s.col`` clause: matched target rows
      keep every other column's value.  Semantics differ from the
      full-row form when several TARGET rows share one key: each is
      updated in place (Delta semantics), where the full-row upsert
      collapses them into the one source row.
    * ``when_not_matched="insert"`` appends source rows whose key has
      no target match; ``"ignore"`` drops them.

    100 TB design: only STATS-ADMITTED candidate files are rewritten —
    a file is a candidate iff, for EVERY key column, its footer
    [min, max] overlaps the source's key range (one tiny agg job on
    the source computes the ranges; ``select_files`` does the
    pruning).  Rows in non-candidate files provably cannot match, so
    their bytes and manifest entries survive verbatim — a merge of a
    day's delta into a year-partitioned 100 TB table rewrites the
    overlapping tail, not the table.  The rewrite + inserts land as
    ONE versioned commit under the ``CommitConflict`` CAS
    (``expected_version``), so a concurrent writer forces a re-derive
    instead of being silently dropped.  Multiple source rows per key
    are refused (the Delta ambiguity error) — resolution order would
    otherwise be nondeterministic under shuffle.

    This is a CHANGE commit when any file is rewritten: streams over
    the table refuse it unless skipchangecommits=true.  Returns the
    new manifest.

    Cost model: SCALE.md §9 — rewrite bytes = admitted-file bytes,
    one key Exchange; clustering bounds admission.
    """
    from functools import reduce

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as _F

    import pyarrow.parquet as pq

    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(
            f"when_not_matched must be insert|ignore, got {when_not_matched!r}"
        )
    keys = list(on)
    m = read_manifest(path)
    # pure delete accepts a key-only source: no row is ever inserted or
    # updated from it, so payload columns would be dead weight
    key_only_delete = (
        when_matched == "delete"
        and when_not_matched == "ignore"
        and set(source.columns) == set(keys)
    )
    tgt_cols = source.columns
    if m["files"]:
        table_cols = (
            [f["name"] for f in m["schema"]["fields"]]
            if m.get("schema")
            else pq.read_schema(
                os.path.join(path, m["files"][0]["file"])
            ).names
        )
        if key_only_delete:
            source = source.select(*keys)
            tgt_cols = table_cols
        else:
            if set(source.columns) != set(table_cols):
                raise ValueError(
                    "full-row merge needs the table's exact column set: "
                    f"table={sorted(table_cols)} source={sorted(source.columns)}"
                )
            source = source.select(*table_cols)
            tgt_cols = table_cols
    if update_cols is not None:
        if when_matched != "update":
            raise ValueError("update_cols requires when_matched='update'")
        bad = set(update_cols) - (set(source.columns) - set(keys))
        if bad:
            raise ValueError(f"update_cols not updatable columns: {sorted(bad)}")
    # Stage the source plan ONCE (r19, guide §1.2/§2.4): the previous
    # shape executed the source plan THREE times — the key-ambiguity
    # check, the key-bounds agg, and the rewrite write each re-ran it
    # (for an index append that is a whole encode pass per job).  Now
    # one write lands the source in a private staging dir inside the
    # table, and every later use — the single stats job, the joins,
    # and (on the plain-upsert path) the inserted table files
    # themselves, adopted by rename — reads those bytes instead.
    import shutil as _shutil

    staging = os.path.join(path, f".stage-{uuid.uuid4().hex}")
    source.write.parquet(staging)
    try:
        staged = [
            os.path.join(staging, n)
            for n in sorted(os.listdir(staging))
            if n.endswith(".parquet")
        ]
        if not any(
            pq.ParquetFile(f).metadata.num_rows for f in staged
        ):  # empty source: nothing moves (footer check, no job)
            return m
        # explicit schema: the dot-prefixed staging dir is a hidden
        # path, so schema inference logs a (benign) all-paths-ignored
        # warning; the writer's schema is authoritative anyway
        src = spark.read.schema(source.schema).parquet(staging)
        # ONE stats job: per-key multiplicity (Delta parity: >1 source
        # row per key makes the surviving value shuffle-order
        # nondeterministic — refuse loudly) + the key bounds that feed
        # stats-admitted candidate selection, together.
        per_key = src.groupBy(*keys).agg(_F.count(_F.lit(1)).alias("__n"))
        stats = per_key.agg(
            _F.max("__n").alias("__maxn"),
            *[_F.min(k).alias(f"__lo_{k}") for k in keys],
            *[_F.max(k).alias(f"__hi_{k}") for k in keys],
        ).first()
        if stats["__maxn"] > 1:
            raise ValueError(
                f"source has multiple rows per merge key {keys} — "
                "deduplicate the source first (Delta raises the same error)"
            )
        triples = []
        for k in keys:
            triples.append((k, ">=", stats[f"__lo_{k}"]))
            triples.append((k, "<=", stats[f"__hi_{k}"]))
        candidates = select_files(m, triples)
        keep_entries = [e for e in m["files"] if e not in candidates]
        tgt = (
            _read_entries(spark, path, m, candidates).select(*tgt_cols)
            if candidates
            else None
        )
        # The staged source parts ARE the inserted rows verbatim
        # whenever the merge's output contains the whole source: the
        # plain full-row upsert (target-minus-keys ∪ source), and any
        # insert with zero candidate files (nothing can match).  Adopt
        # them by rename — no second write of the source bytes.
        adopt_source = when_not_matched == "insert" and (
            tgt is None
            or (when_matched == "update" and update_cols is None)
        )
        pieces: list = []
        if tgt is not None:
            if when_matched == "update" and update_cols is not None:
                # column-subset update (Delta's UPDATE SET col = s.col):
                # matched target rows keep non-listed columns in place
                cols = tgt.columns
                upd = (
                    tgt.alias("t")
                    .join(src.alias("s"), keys, "inner")
                    .select(
                        *[
                            _F.col(
                                f"s.{c}" if c in update_cols else f"t.{c}"
                            ).alias(c)
                            for c in cols
                        ]
                    )
                )
                pieces.append(tgt.join(src.select(*keys), keys, "left_anti"))
                pieces.append(upd)
                if when_not_matched == "insert":
                    pieces.append(
                        src.join(tgt.select(*keys), keys, "left_anti")
                    )
            elif adopt_source:
                # the upsert fast path: ONE anti-join write (target
                # minus source keys); the source half is adopted below
                pieces = [tgt.join(src.select(*keys), keys, "left_anti")]
            else:
                pieces.append(tgt.join(src.select(*keys), keys, "left_anti"))
                if when_matched == "update":
                    pieces.append(
                        src.join(tgt.select(*keys), keys, "left_semi")
                    )
                if when_not_matched == "insert":
                    pieces.append(
                        src.join(tgt.select(*keys), keys, "left_anti")
                    )
        new_entries = list(keep_entries)
        if pieces:
            new_entries.extend(
                _stage_parts(
                    reduce(_DF.unionByName, pieces),
                    path,
                    bloom_columns=m.get("bloom_columns") or (),
                )
            )
        if adopt_source:
            # adoption LAST: the anti-join piece above reads the staged
            # files; renaming them into data/ must wait for that write
            new_entries.extend(
                _adopt_staged(
                    staging, path, bloom_columns=m.get("bloom_columns") or ()
                )
            )
    finally:
        _shutil.rmtree(staging, ignore_errors=True)
    manifest = {
        "files": sorted(new_entries, key=lambda e: e["file"]),
        "total_rows": sum(e["rows"] for e in new_entries),
    }
    if "batches" in m:
        manifest["batches"] = m["batches"]
    if "schema" in m:
        manifest["schema"] = m["schema"]
    if "bloom_columns" in m:
        manifest["bloom_columns"] = m["bloom_columns"]
    _write_versioned(path, manifest, expected_version=m.get("version", 0))
    return read_manifest(path)


def stream_merge_into(
    spark,
    path: str,
    stream_df,
    on: list[str],
    checkpoint: str,
    update_cols: list[str] | None = None,
    max_conflict_retries: int = 5,
) -> dict:
    """Streaming UPSERT into the manifest table format: drains
    ``stream_df`` (availableNow) applying ONE ``merge_into`` per
    micro-batch via foreachBatch — the CDC-apply shape (consume a
    change stream, maintain a keyed table) on our own format, closing
    the streaming-CRUD square beside the append stream-writer.

    Delivery contract: CONTENT-idempotent, not commit-idempotent — a
    micro-batch replayed after an unrecorded commit re-merges the same
    rows (updates re-apply to equal values, its inserts now match as
    updates), so the table converges to the same content while the
    version history may carry an extra no-op-shaped commit; the
    batchId-tracking append writer (``_ManifestStreamWriter``) is the
    exactly-once-commits alternative when append semantics suffice.
    Each batch must be key-unique (``merge_into`` refuses ambiguous
    sources — pre-aggregate with max_by/last-by-timestamp upstream,
    as q_stream_cdc_apply does).  ``CommitConflict`` from an
    interleaved external writer is retried with a fresh re-derive (the
    standard optimistic loop) up to ``max_conflict_retries``.
    Returns the final manifest."""

    def _apply(batch_df, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        for attempt in range(max_conflict_retries):
            try:
                merge_into(
                    spark, path, batch_df, on=on, update_cols=update_cols
                )
                return
            except CommitConflict:
                if attempt == max_conflict_retries - 1:
                    raise

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_manifest(path)


def table_changes(
    spark, path: str, from_version: int, to_version: int | None = None
):
    """Batch CDC read (Delta's ``table_changes`` / Change Data Feed):
    row-level inserts and deletes between two committed versions, as a
    DataFrame of the table's columns plus ``_change_type``
    ('insert' | 'delete') and ``_commit_version`` (the version that
    introduced the change).  An UPDATE (merge_into) appears as the
    delete of the old row + the insert of the new one — the standard
    CDF decomposition when the format does not store row ids.

    100 TB design — file-level delta first, row diff second: for each
    version step only the files ADDED and REMOVED by that commit are
    read; files carried over contribute nothing, so a merge that
    rewrote one candidate file scans one old + one new file, not the
    table.  Within a step the row-level change is
    ``added EXCEPT ALL removed`` (inserts) and ``removed EXCEPT ALL
    added`` (deletes) — a rewrite that re-writes a row byte-identical
    (compaction) thus cancels out to no change, which is exactly the
    semantics a consumer wants.  Every referenced snapshot must still
    be retained (same vacuum contract as the changes stream).
    """
    from functools import reduce

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as _F

    latest = read_manifest(path)
    if to_version is None:
        to_version = latest.get("version", 0)
    if from_version < 0 or to_version > latest.get("version", 0):
        raise ValueError(
            f"version range [{from_version}, {to_version}] outside the "
            f"committed range [0, {latest.get('version', 0)}] at {path}"
        )

    def _entries(v: int) -> dict[str, dict]:
        if v == 0:
            return {}
        return {e["file"]: e for e in read_manifest(path, v)["files"]}

    pieces: list = []
    prev = _entries(from_version)
    prev_m = (
        read_manifest(path, from_version) if from_version else {"files": []}
    )
    for v in range(from_version + 1, to_version + 1):
        m = read_manifest(path, v)
        cur = {e["file"]: e for e in m["files"]}
        added = [cur[f] for f in cur.keys() - prev.keys()]
        removed = [prev[f] for f in prev.keys() - cur.keys()]
        add_df = _read_entries(spark, path, m, added) if added else None
        rem_df = (
            _read_entries(spark, path, prev_m, removed) if removed else None
        )
        if add_df is not None and rem_df is not None:
            # align columns across a schema evolution within the step
            for c in add_df.columns:
                if c not in rem_df.columns:
                    rem_df = rem_df.withColumn(c, _F.lit(None))
            rem_df = rem_df.select(*add_df.columns)
            ins = add_df.exceptAll(rem_df)
            del_ = rem_df.exceptAll(add_df)
        else:
            ins, del_ = add_df, rem_df
        for df, kind in ((ins, "insert"), (del_, "delete")):
            if df is not None:
                pieces.append(
                    df.withColumn("_change_type", _F.lit(kind)).withColumn(
                        "_commit_version", _F.lit(v).cast("long")
                    )
                )
        prev, prev_m = cur, m
    if not pieces:
        base = scan_manifest(spark, path, version=to_version or None)
        return (
            base.withColumn("_change_type", _F.lit("insert"))
            .withColumn("_commit_version", _F.lit(0).cast("long"))
            .filter("false")
        )
    # unionByName with null-fill: later commits may carry evolved columns
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), pieces
    )


def evolve_schema(path: str, add_fields) -> dict:
    """ALTER TABLE ... ADD COLUMNS as one versioned metadata-only
    commit: no data file moves, the manifest's schema gains the new
    (forced-nullable) columns, and every existing file null-fills them
    at read.  ``add_fields`` is a StructType or list of StructFields.
    Re-adding an existing column with the same type is a no-op;
    with a different type it is refused (``_merge_schemas``).  Runs
    under the CommitConflict CAS like every commit."""
    from pyspark.sql.types import StructType

    m = read_manifest(path)
    if not m.get("schema"):
        raise ValueError(
            f"manifest at {path} predates schema versioning — rewrite it "
            "(compact) with a current writer first"
        )
    fields = list(add_fields)
    add_json = {
        "type": "struct",
        "fields": [f.jsonValue() for f in fields],
    }
    merged = _merge_schemas(m["schema"], add_json)
    if merged == m["schema"]:
        return m  # pure no-op: don't burn a version
    manifest = {k: v for k, v in m.items() if k != "version"}
    manifest["schema"] = merged
    _write_versioned(path, manifest, expected_version=m.get("version", 0))
    # sanity: the merged schema must round-trip through Spark's types
    StructType.fromJson(merged)
    return read_manifest(path)


def add_bloom_filters(path: str, columns, fpp: float = 0.01) -> dict:
    """Backfill per-file Bloom filters for ``columns`` over every
    committed file that lacks them, and record ``bloom_columns`` so
    every future write (append via the ``bloomColumns`` writer option
    default, rewrite via ``_stage_parts``, compaction) maintains the
    index — Delta's ``delta.bloomFilter`` enablement as one versioned
    METADATA commit (the data files themselves are untouched; time
    travel to pre-index versions still works).

    Runs under the CommitConflict CAS like every commit.  The backfill
    here reads each file's indexed columns in a local loop (one column
    read per file — this is the LOCAL form; on a cluster the same
    backfill is ``compact()``, whose rewriting executors build the
    filters distributed, or any append, which indexes its own parts
    executor-side at write time)."""
    m = read_manifest(path)
    cols = sorted({c for c in columns if c})
    if not cols:
        raise ValueError("add_bloom_filters needs at least one column")
    files = []
    for e in m["files"]:
        have = set((e.get("blooms") or {}))
        missing = [c for c in cols if c not in have]
        entry = dict(e)
        if missing:
            built = part_blooms(os.path.join(path, e["file"]), missing, fpp=fpp)
            if built:
                entry["blooms"] = {**(e.get("blooms") or {}), **built}
        files.append(entry)
    manifest = {k: v for k, v in m.items() if k != "version"}
    manifest["files"] = files
    manifest["bloom_columns"] = sorted(
        set(m.get("bloom_columns") or ()) | set(cols)
    )
    _write_versioned(path, manifest, expected_version=m.get("version", 0))
    return read_manifest(path)


def compact(spark, path: str, n_parts: int) -> dict:
    """Rewrite the CURRENT content into ``n_parts`` fresh files through
    the same atomic commit path (overwrite-mode manifest write), so
    readers switch from many small parts to few large ones in one
    flip.  Streaming batch ids are carried over — a stream restart
    against its checkpoint still recognizes its committed batches.
    Old parts become unreferenced; ``vacuum_manifest`` reclaims them.
    Single-writer discipline is assumed (as for every commit here).
    Returns the post-compaction manifest."""
    before = read_manifest(path)
    register_manifest_sink(spark)
    writer = (
        scan_manifest(spark, path)
        .repartition(n_parts)
        .write.format("manifest_parquet")
        .mode("overwrite")
    )
    if before.get("bloom_columns"):
        # compaction preserves the table's bloom index: the rewriting
        # executors rebuild each new part's filters as they write it
        writer = writer.option(
            "bloomColumns", ",".join(before["bloom_columns"])
        )
    writer.save(path)
    after = read_manifest(path)
    if "batches" in before:
        after["batches"] = before["batches"]
        # read-modify-replace under the single-writer assumption; the
        # version does NOT bump (same logical content, same commit)
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(after, fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(path, MANIFEST))
        snap = os.path.join(path, SNAPSHOT_FMT.format(after["version"]))
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(after, fh, indent=1, sort_keys=True)
        os.replace(tmp, snap)
    return after


def version_at_timestamp(path: str, ts: float) -> int:
    """The MAIN-lineage version that was current at wall-clock ``ts``
    (Delta's timestamp time travel): the newest committed-at-or-before
    snapshot.  Branch snapshots (they carry a ``branch`` marker) are
    not main history and never match; vacuumed snapshots are skipped —
    asking for a time older than retention raises, same as asking for
    a vacuumed version number."""
    latest = read_manifest(path)
    best = None
    for v in range(1, latest.get("version", 0) + 1):
        try:
            snap = read_manifest(path, v)
        except FileNotFoundError:
            continue
        if snap.get("branch") is not None:
            continue
        at = snap.get("committed_at")
        if at is not None and at <= ts and (best is None or v > best):
            best = v
    if best is None:
        raise ValueError(
            f"no retained commit at or before timestamp {ts} at {path}"
        )
    return best


def auto_compact(
    spark,
    path: str,
    small_bytes: int,
    n_parts: int = 1,
    zorder_by: list[str] | str | None = None,
) -> dict:
    """Size-targeted compaction (the OPTIMIZE half of maintenance):
    rewrite ONLY the files smaller than ``small_bytes`` into
    ``n_parts`` fresh files as one versioned commit under the
    CommitConflict CAS; files already at target size are carried over
    BYTE-IDENTICAL (never opened, never rewritten) — at 100 TB that
    is the whole point, since full ``compact()`` re-reads the table
    while the small-file problem lives in the most recent appends.
    No-op (current manifest returned) when fewer than two small files
    exist.  Stats/blooms for the rewritten parts rebuild through the
    same ``_stage_parts`` plumbing as every other rewrite.

    ``zorder_by`` (r11, Delta ``OPTIMIZE ... ZORDER BY`` parity) adds
    re-clustering to the rewrite: the admitted files are written back
    Morton-clustered on the named columns (``io/layout.py``), so their
    fresh footer stats cover tight hyper-rectangles and
    ``scan_manifest(where=...)`` prunes them again.  ``"auto"`` closes
    the maintenance loop with ``table_health``: the rewrite clusters
    on the report's WORST column — the one whose clustering depth says
    point queries open the most files.  Cost is unchanged in bytes
    (same admitted files, one extra range-exchange of only those
    bytes); kept files still move nothing."""
    before = read_manifest(path)
    small = [e for e in before["files"] if e["bytes"] < small_bytes]
    if len(small) < 2:
        return before
    keep = [e for e in before["files"] if e["bytes"] >= small_bytes]
    df = _read_entries(spark, path, before, small)
    zcols: list[str] | None = None
    if zorder_by == "auto":
        depth = table_health(path)["clustering_depth"]
        candidates = {c: d for c, d in depth.items() if d > 1.0}
        if candidates:
            zcols = [max(candidates, key=candidates.get)]
    elif zorder_by:
        zcols = list(zorder_by)
    if zcols:
        from setup_harvest_action_spark.io.layout import zorder_partitioned

        df = zorder_partitioned(df, zcols, n_files=n_parts)
    else:
        df = df.repartition(n_parts)
    entries = _stage_parts(
        df, path, bloom_columns=before.get("bloom_columns") or ()
    )
    after = dict(before)
    after["files"] = sorted(keep + entries, key=lambda e: e["file"])
    after["total_rows"] = sum(e["rows"] for e in after["files"])
    _write_versioned(path, after, expected_version=before["version"])
    return read_manifest(path)


def vacuum_manifest(path: str, keep_last: int = 1) -> list[str]:
    """Drop snapshots older than the last ``keep_last`` committed
    versions and delete every data file that no RETAINED version (nor
    the latest pointer) references.  Returns repo-relative paths
    actually removed.  Crash-orphan snapshots (version > latest) are
    removed too — their flip never happened, so nothing can read
    them."""
    latest = read_manifest(path)
    latest_v = latest.get("version", 0)
    # keep_last < 1 would drop the LATEST version's own snapshot while
    # the latest pointer still references its files — never allowed
    cutoff = latest_v - max(keep_last, 1) + 1
    removed: list[str] = []
    referenced = {e["file"] for e in latest["files"]}
    # A named ref pins its snapshots (and their files) regardless of
    # retention age — dropping a tagged snapshot would silently break
    # the tag, the one thing a tag exists to prevent.
    protected = _ref_protected_versions(path)
    for entry in sorted(os.listdir(path)):
        if entry.endswith(".json.tmp"):
            # a crash between tmp-write and os.replace leaves these;
            # nothing ever reads them back
            os.remove(os.path.join(path, entry))
            removed.append(entry)
            continue
        if not (entry.startswith("_manifest-v") and entry.endswith(".json")):
            continue
        v = int(entry[len("_manifest-v"):-len(".json")])
        if cutoff <= v <= latest_v or v in protected:
            with open(os.path.join(path, entry), encoding="utf-8") as fh:
                referenced |= {e["file"] for e in json.load(fh)["files"]}
        else:
            os.remove(os.path.join(path, entry))
            removed.append(entry)
    data_dir = os.path.join(path, "data")
    if os.path.isdir(data_dir):
        for name in sorted(os.listdir(data_dir)):
            rel = f"data/{name}"
            if rel not in referenced:
                os.remove(os.path.join(data_dir, name))
                removed.append(rel)
    return removed


def table_health(path: str, small_bytes: int = 8 * 1024 * 1024) -> dict:
    """Maintenance-planning report computed from MANIFEST METADATA
    ONLY — no data file is opened, so it costs the same on a 100 TB
    table as on a fixture: file-count/size posture (how urgent is
    auto_compact) and per-column CLUSTERING DEPTH (how urgent is
    Z-order) — for each stats column, the average number of files a
    random point query must open, i.e. the mean overlap count of the
    per-file [min, max] ranges measured by a sweep over range
    endpoints.  Depth ≈ 1 means perfectly clustered (each point hits
    one file); depth ≈ n_files means the column's ranges all overlap
    and min/max skipping is blind on it."""
    m = read_manifest(path)
    files = m["files"]
    sizes = sorted(e["bytes"] for e in files)
    n = len(files)
    health = {
        "version": m.get("version", 0),
        "n_files": n,
        "total_rows": m.get("total_rows"),
        "total_bytes": sum(sizes),
        "small_files": sum(1 for b in sizes if b < small_bytes),
        "median_file_bytes": sizes[n // 2] if n else 0,
        "clustering_depth": {},
    }
    cols = set()
    for e in files:
        cols.update((e.get("stats") or {}).keys())
    for col in sorted(cols):
        ranges = [
            e["stats"][col]
            for e in files
            if (e.get("stats") or {}).get(col) is not None
        ]
        numeric = [
            (lo, hi)
            for lo, hi in ranges
            if isinstance(lo, (int, float)) and not isinstance(lo, bool)
        ]
        if not numeric:
            continue
        # sweep: average overlap depth across the distinct endpoints.
        # O((n+m) log n) via two sorted endpoint arrays — the naive
        # per-point membership scan is O(n·m), which at the 5k-part
        # probe (tools/manifest_scale_probe.py) already cost ~3 s;
        # depth(p) = #(lo ≤ p) − #(hi < p), identical result.
        import bisect

        points = sorted({p for r in numeric for p in r})
        los = sorted(lo for lo, _ in numeric)
        his = sorted(hi for _, hi in numeric)
        depths = [
            bisect.bisect_right(los, p) - bisect.bisect_left(his, p)
            for p in points
        ]
        health["clustering_depth"][col] = round(
            sum(depths) / len(depths), 2
        )
    return health


def shallow_clone(src: str, dst: str, version: int | None = None) -> dict:
    """ZERO-COPY clone (Delta SHALLOW CLONE parity): create a new
    table at ``dst`` whose first commit references the SOURCE's data
    files by absolute path — no byte of data moves, so cloning a
    100 TB table costs one manifest write.  The clone then evolves
    independently: appends stage new parts under ``dst/data/``, and
    any rewrite (delete_where / merge_into / compact) replaces cloned
    references with clone-local files, so divergence is incremental
    and automatic.

    Ownership caveat (same as Delta's): the clone BORROWS the source's
    files — ``vacuum_manifest`` on the clone never touches them (it
    only reclaims under ``dst/data/``), but vacuum on the SOURCE does
    not know about clones; dropping the cloned-from snapshot there can
    orphan the clone.  Pin the source version with a tag for clones
    that must outlive source retention.  ``cloned_from`` records the
    lineage."""
    m = read_manifest(src, version)
    if os.path.exists(os.path.join(dst, MANIFEST)):
        raise ValueError(f"clone target {dst} is already a table")
    os.makedirs(dst, exist_ok=True)
    entries = [
        {**e, "file": os.path.abspath(os.path.join(src, e["file"]))}
        for e in m["files"]
    ]
    new = {
        k: v
        for k, v in m.items()
        # version is re-stamped; stream batch ids, branch markers and
        # parent pointers belong to the source's history, not ours
        if k not in ("version", "committed_at", "batches", "branch",
                     "parent")
    }
    new["files"] = entries
    new["cloned_from"] = {"path": os.path.abspath(src),
                          "version": m["version"]}
    _write_versioned(dst, new)
    return read_manifest(dst)
