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

Repeated calls with the same ``tag`` overwrite one directory instead of
minting new ones, so a bench loop or a long session does not leak a
directory per call.
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


def materialize(
    df: DataFrame, tag: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Write ``df`` to parquet under the resolved checkpoint location
    and return a plain scan of it — the lineage cut."""
    spark = df.sparkSession
    out = materialization_dir(spark, tag, checkpoint_dir)
    df.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)
