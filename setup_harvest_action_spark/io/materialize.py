"""Lineage truncation for iterative operators.

Iterative algorithms (connected components, PageRank) build plans that
reference each round's result multiple times; without a cut, every
caller action re-derives all prior rounds multiplicatively.  The cut
used throughout this repo is parquet ping-pong — write the intermediate
result, return a plain scan of it — because unlike ``cache()`` it needs
no caller-side release and unlike ``localCheckpoint()`` it holds no
unreleasable executor storage.

Where that parquet lands is the scale-critical knob this module owns:

* explicit ``checkpoint_dir`` argument — caller-controlled (tests pass
  ``tmp_path``; a cluster job passes a job-scoped shared-FS path);
* else the session's checkpoint location — ``sc.setCheckpointDir(...)``
  or the ``spark.setupHarvestAction.checkpointDir`` conf — which on a
  real cluster MUST be a shared filesystem (HDFS/object store): a
  driver-local ``/tmp`` is unreadable by executors there;
* else (bare local mode) a per-application directory under the system
  temp root, removed at interpreter exit.

Each call writes a FRESH versioned directory (``<tag>/<app_id>/vNNNNNN``)
rather than overwriting the tag's directory in place: a DataFrame
returned by an earlier same-tag call keeps reading its own files — no
silent aliasing onto newer data, no mid-overwrite read failure — and
the ``app_id`` path segment keeps concurrent applications sharing one
cluster checkpoint dir out of each other's way.  Retention is bounded:
after a successful write, all but the newest two versions are removed
(the one-back version survives so the caller's immediately preceding
result stays readable through a back-to-back re-run; a bench loop
therefore holds at most two directories per tag, not one per call).
A result older than one call back is invalidated on the next call —
persist it elsewhere if it must outlive that.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

CHECKPOINT_DIR_CONF = "spark.setupHarvestAction.checkpointDir"

_local_roots: dict[str, str] = {}


def _session_root(spark) -> str:
    app_id = spark.sparkContext.applicationId
    root = _local_roots.get(app_id)
    if root is None or not os.path.isdir(root):
        root = os.path.join(
            tempfile.gettempdir(), f"shas_materialize_{app_id}"
        )
        os.makedirs(root, exist_ok=True)
        _local_roots[app_id] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def materialization_dir(spark, tag: str, checkpoint_dir: str | None = None) -> str:
    """Resolve where an iterative operator materializes intermediates:
    explicit argument > session conf > Spark checkpoint dir > local
    per-application temp root (cleaned at exit)."""
    base = checkpoint_dir
    if base is None:
        base = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if base is None:
        base = spark.sparkContext.getCheckpointDir()
    if base is None:
        base = _session_root(spark)
    return os.path.join(base, tag)


# Per-(application, tag-root) monotonic version counters.  Process-
# local is sufficient: within one driver process calls are ordered,
# and across applications the app_id path segment already separates
# namespaces.
_versions: dict[tuple[str, str], int] = {}
_KEEP_VERSIONS = 2  # newest + one back (see module docstring)

# Plan-audit hook (r17): materialize() is a lineage CUT, so the stage
# plan it executes is invisible to any explain() of the returned scan
# — tools/plan_audit.py saw q_pipeline_crawl_rounds as "3 scans / 0
# exchanges" because the per-round work hid inside the cut.  When an
# observer is installed, each materialize() call hands it (tag, df)
# BEFORE writing, so the auditor can record the inner stage's plan
# facts alongside the outer plan.  Never set outside auditing.
_observer = None


def set_observer(fn) -> None:
    """Install (or clear, with ``None``) the audit observer called as
    ``fn(tag, df)`` on every :func:`materialize`."""
    global _observer
    _observer = fn


def materialize(
    df: DataFrame, tag: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Write ``df`` to a fresh versioned parquet directory under the
    resolved checkpoint location and return a plain scan of it — the
    lineage cut.  See the module docstring for the aliasing/retention
    contract."""
    if _observer is not None:
        _observer(tag, df)
    spark = df.sparkSession
    root = os.path.join(
        materialization_dir(spark, tag, checkpoint_dir),
        spark.sparkContext.applicationId,
    )
    key = (spark.sparkContext.applicationId, root)
    n = _versions.get(key, -1) + 1
    _versions[key] = n
    out = os.path.join(root, f"v{n:06d}")
    df.write.mode("overwrite").parquet(out)
    # bounded retention: drop everything older than one version back
    try:
        stale = sorted(
            d for d in os.listdir(root) if d.startswith("v") and d < f"v{n:06d}"
        )[: -(_KEEP_VERSIONS - 1) or None]
        for d in stale:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    except OSError:  # non-local FS semantics; retention is best-effort
        pass
    return spark.read.parquet(out)
