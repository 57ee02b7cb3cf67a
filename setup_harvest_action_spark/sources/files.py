"""File-format sources beyond parquet: CSV and JSON scans (SURVEY.md
§2.2 "Scans / sources / sinks").

The engine's canonical storage is parquet (columnar, statistics,
predicate pushdown).  CSV/JSON are interchange formats: each query here
round-trips a fixture table through the format and returns the re-read
content, proving write fidelity, schema-explicit reads, and null
handling against the parquet-backed oracle.

Design rules for 100 TB:
  * ALWAYS pass an explicit schema.  Schema inference is a full extra
    pass over the data before the real scan, and infers unstable types.
  * Uncompressed CSV/JSON are line-splittable so reads parallelize per
    HDFS/S3 block; gzip is NOT splittable (one task per file) — at
    scale, prefer many medium files or a splittable codec.
  * Neither format carries column statistics: no predicate pushdown,
    no column pruning at the reader (JSON prunes fields at parse).
    They are ingest/egress formats — convert to parquet at the
    boundary, which is exactly what these round-trips exercise.

Delta Lake would add ACID MERGE and time travel on top of parquet
(SURVEY.md §2.2 lists it as the sink upgrade path); the package is not
available in this environment, so the transactional story lives in
``harvest.load`` (atomic directory commits) instead.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.schemas import FIXTURE_SCHEMAS


def _roundtrip_dir(sf_dir: str, fmt: str, table: str) -> str:
    label = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(
        tempfile.gettempdir(), "shas_sources", label, f"{table}_{fmt}"
    )


@query(
    "q_source_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source: write ``nation`` as headered CSV, read it back
    with the explicit fixture schema (no inference pass).  Content must
    hash-match the parquet original — proving quoting, header, and type
    round-trip fidelity."""
    out = _roundtrip_dir(sf_dir, "csv", "nation")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", True
    ).csv(out)
    return (
        spark.read.schema(FIXTURE_SCHEMAS["nation"])
        .option("header", True)
        .csv(out)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "q_source_json_roundtrip",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey,
       CAST(round(s_acctbal, 2) AS DOUBLE) AS s_acctbal
FROM supplier
""",
)
def q_source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source: write ``supplier``, read it back with
    the explicit fixture schema.  JSON prunes fields at parse time but
    has no row-group statistics — the docstring above is the scale
    fence; the query proves numeric/string/null fidelity through the
    text representation."""
    out = _roundtrip_dir(sf_dir, "json", "supplier")
    load_table(spark, sf_dir, "supplier").write.mode("overwrite").json(out)
    return (
        spark.read.schema(FIXTURE_SCHEMAS["supplier"])
        .json(out)
        .select(
            "s_suppkey",
            "s_name",
            "s_nationkey",
            F.round("s_acctbal", 2).alias("s_acctbal"),
        )
    )


@query(
    "q_source_orc_roundtrip",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey,
       CAST(round(s_acctbal, 2) AS DOUBLE) AS s_acctbal
FROM supplier
""",
)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source (r10 late) — the second columnar format
    beside parquet, completing the format matrix (parquet / CSV /
    JSON-lines / ORC / manifest): write ``supplier`` as ORC, read it
    back, prove value fidelity against the fixture oracle.  ORC
    carries the same scale affordances as parquet — stripe-level
    min/max statistics for predicate pushdown, column projection,
    optional bloom filters — and Spark's native reader uses them; the
    pushdown contract is the same PushedFilters surface the parquet
    plan tests pin.  (Avro would need the external spark-avro
    package — documented unavailable, like Delta in this module's
    header.)"""
    out = _roundtrip_dir(sf_dir, "orc", "supplier")
    load_table(spark, sf_dir, "supplier").write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round("s_acctbal", 2).alias("s_acctbal"),
    )


@query(
    "q_source_manifest_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_source_manifest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-committed sink + manifest-scanning source
    (sources/manifest_sink.py — the Python DataSource WRITER surface):
    write ``nation`` through the commit protocol, read back ONLY the
    manifest-listed parts, and prove content fidelity against the
    original table.  The driver's hash compare therefore gates the
    whole write path — task part files, commit-message fan-in, atomic
    manifest rename, manifest-pruned scan."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
    )

    register_manifest_sink(spark)
    out = _roundtrip_dir(sf_dir, "manifest", "nation")
    load_table(spark, sf_dir, "nation").write.format("manifest_parquet").mode(
        "overwrite"
    ).save(out)
    return scan_manifest(spark, out).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "q_source_partitioned_roundtrip",
    oracle="""
SELECT event_id, user_id, event_type, CAST(round(value, 4) AS DOUBLE) AS value
FROM events
WHERE event_type IN ('view', 'click')
""",
)
def q_source_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink + source: write ``events`` partitioned by
    event_type, read it back with a partition-column filter.  The read
    must (a) recover the partition column from directory names with its
    value semantics intact — it travels as a PATH STRING, the classic
    silent-corruption spot for typed partition keys — and (b) prune at
    the DIRECTORY level: the filter lands in PartitionFilters, so the
    scan never opens the other event types' files (pinned in
    tests/test_plans.py).  At 100 TB partition-wise layout by a
    low-cardinality routing column is the first storage decision a
    pipeline makes; this query keeps the full write→discover→prune→
    read loop under the driver's hash gate."""
    out = _roundtrip_dir(sf_dir, "parquet_parts", "events")
    load_table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    return (
        spark.read.parquet(out)
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
        )
    )


@query(
    "q_source_manifest_stream_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_source_manifest_stream_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING write through the manifest sink (the DataSource
    streamWriter surface — completing the Python DataSource API
    matrix: batch read, stream read, batch write, stream write):
    replay ``nation`` as a file stream, drain it through the
    per-micro-batch manifest commit (batchId recorded for replay
    idempotence — exactly-once is pinned in
    tests/test_manifest_sink.py), and scan back only manifest-listed
    parts.  The hash gate proves stream-written content equals the
    batch table exactly."""
    import shutil

    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
    )

    register_manifest_sink(spark)
    base = _roundtrip_dir(sf_dir, "manifest_stream", "nation")
    # fresh dirs per call: the append-manifest + checkpoint pair is
    # stateful by design; the roundtrip must re-prove from empty
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/src"
    out = f"{base}/out"
    nation = load_table(spark, sf_dir, "nation")
    nation.write.parquet(src)
    stream = spark.readStream.schema(nation.schema).parquet(src)
    q = (
        stream.writeStream.format("manifest_parquet")
        .option("path", out)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return scan_manifest(spark, out).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "q_source_manifest_changes_stream",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_source_manifest_changes_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM-READ of the manifest table (the DataSource streamReader
    surface on our own table format — the Delta-style incremental
    table read): ``nation`` is committed in TWO manifest versions, a
    stream with version offsets drains both as separate admitted
    ranges, and the drained union must equal the batch table exactly.
    With the r9 versioned commits this closes the sink's API square —
    batch write, stream write, batch read (scan_manifest), stream
    read — and the incremental / append-only / skipchangecommits
    semantics are pinned in tests/test_manifest_sink.py."""
    import shutil

    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
    )
    from setup_harvest_action_spark.streaming.events import run_to_completion

    register_manifest_sink(spark)
    base = _roundtrip_dir(sf_dir, "manifest_changes", "nation")
    shutil.rmtree(base, ignore_errors=True)
    out = f"{base}/t"
    nation = load_table(spark, sf_dir, "nation")
    nation.filter("n_nationkey < 12").write.format("manifest_parquet").mode(
        "overwrite"
    ).save(out)
    nation.filter("n_nationkey >= 12").write.format("manifest_parquet").mode(
        "append"
    ).save(out)
    stream = (
        spark.readStream.format("manifest_parquet").option("path", out).load()
    )
    return run_to_completion(stream, "append").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "q_source_manifest_skipping",
    oracle="""
SELECT event_id, user_id, event_type, CAST(round(value, 4) AS DOUBLE) AS value
FROM events WHERE user_id = 7
""",
)
def q_source_manifest_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA SKIPPING through the manifest's per-file column stats:
    ``events`` is committed range-partitioned on user_id (so part
    footers carry disjoint user_id ranges), and the point read goes
    through ``scan_manifest(where=[("user_id","=",7)])`` — files whose
    [min, max] disprove the predicate are never opened, the manifest-
    level analogue of parquet row-group pruning and the mechanism that
    makes a selective read on a 100 TB table open a handful of files.
    The hash gate proves skipping never changes semantics (the triples
    re-apply as row filters); WHICH files get pruned is pinned in
    tests/test_manifest_sink.py."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
    )

    import shutil

    register_manifest_sink(spark)
    out = _roundtrip_dir(sf_dir, "manifest_skip", "events")
    # fresh table per call: repeated gate/bench runs would otherwise
    # accumulate one snapshot per run in the persistent tmp dir
    shutil.rmtree(out, ignore_errors=True)
    (
        load_table(spark, sf_dir, "events")
        .repartitionByRange(8, "user_id")
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(out)
    )
    return scan_manifest(
        spark, out, where=[("user_id", "=", 7)]
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
    )


@query(
    "q_source_manifest_bloom_skipping",
    oracle="""
SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 123
""",
)
def q_source_manifest_bloom_skipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BLOOM-FILTER data skipping through the manifest (r10 late) —
    the point-lookup case min/max stats cannot serve: ``documents`` is
    committed HASH-partitioned on doc_id (every part's [min, max]
    spans nearly the whole key space, so stats admit every file) with
    ``bloomColumns=doc_id``, and the point read goes through
    ``scan_manifest(where=[("doc_id","=",123)])`` — files whose Bloom
    filter disproves membership are never opened, pruning to ~1 of 8
    parts where stats prune none.  The hash gate proves skipping never
    changes semantics (no false negatives by construction, triples
    re-applied as row filters); filter construction, fp-rate, and CRUD
    maintenance are pinned in tests/test_manifest_bloom.py.  At 100 TB
    the filters are built by the writing executors (one per part,
    riding the commit messages), so indexing costs no extra job."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
    )

    import shutil

    register_manifest_sink(spark)
    out = _roundtrip_dir(sf_dir, "manifest_bloom", "documents")
    shutil.rmtree(out, ignore_errors=True)
    (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .repartition(8, "doc_id")
        .write.format("manifest_parquet")
        .option("bloomColumns", "doc_id")
        .mode("overwrite")
        .save(out)
    )
    return scan_manifest(spark, out, where=[("doc_id", "=", 123)])


@query(
    "q_source_manifest_merge",
    oracle="""
WITH tgt AS (
  SELECT o_orderkey AS okey, o_orderstatus AS status,
         CAST(round(o_totalprice, 2) AS DOUBLE) AS price
  FROM orders
), src AS (
  SELECT o_orderkey AS okey, 'U' AS status,
         CAST(round(o_totalprice, 2) * 2 AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT -o_orderkey AS okey, 'N' AS status,
         CAST(round(o_totalprice, 2) AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 5 = 3
)
SELECT okey, status, price FROM src
UNION ALL
SELECT okey, status, price FROM tgt WHERE okey % 5 <> 0
""",
)
def q_source_manifest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the manifest table format — the table-format
    promotion of the reference's O13 upsert (harvest.py:326-349):
    ``orders`` is committed as the target (range-partitioned on key so
    part footers carry disjoint key ranges), then one merge applies a
    source of UPDATES (every key % 5 == 0, price doubled, status
    'U') and INSERTS (fresh negative keys, status 'N') in a single
    versioned commit.  The oracle replays the same upsert as pure SQL
    (source UNION ALL target-minus-matched), so the hash gate proves
    merge semantics end-to-end: matched rows replaced, unmatched kept
    byte-identical, inserts appended, nothing else disturbed.  WHICH
    files the stats-admitted rewrite touches (and the CommitConflict
    CAS) are pinned in tests/test_manifest_sink.py."""
    import shutil

    from setup_harvest_action_spark.sources.manifest_sink import (
        merge_into,
        register_manifest_sink,
        scan_manifest,
    )

    register_manifest_sink(spark)
    out = _roundtrip_dir(sf_dir, "manifest_merge", "orders")
    # fresh table per call: the merge is stateful; repeated gate/bench
    # runs must re-prove from the same initial commit
    shutil.rmtree(out, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    tgt = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    (
        tgt.repartitionByRange(8, "okey")
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(out)
    )
    updates = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("okey"),
        F.lit("U").alias("status"),
        # exact IEEE doubling (exponent bump): no cross-engine
        # rounding-tie ambiguity, unlike a *1.1 bump
        (F.round("o_totalprice", 2) * 2).alias("price"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 5 == 3).select(
        (-F.col("o_orderkey")).alias("okey"),
        F.lit("N").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    merge_into(
        spark, out, updates.unionByName(inserts), on=["okey"],
        when_matched="update", when_not_matched="insert",
    )
    return scan_manifest(spark, out).select("okey", "status", "price")


@query(
    "q_source_manifest_evolution",
    oracle="""
SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS n_regionkey
FROM nation WHERE n_nationkey < 12
UNION ALL
SELECT n_nationkey, n_name, n_regionkey
FROM nation WHERE n_nationkey >= 12
""",
)
def q_source_manifest_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on the manifest table format (r10): the first
    half of ``nation`` is committed with a NARROW schema (key + name),
    then the second half appends WITH ``n_regionkey`` — the manifest's
    committed schema widens in that commit, and the scan reads both
    cohorts through it, null-filling the added column on pre-evolution
    files (parquet explicit-schema null-fill; no data rewritten).  The
    oracle restates exactly that: old rows carry NULL, new rows their
    real region.  Type-change refusal, time travel on the pre-evolution
    version, the explicit evolve_schema() DDL, and the evolved
    changes-stream are pinned in tests/test_manifest_sink.py."""
    import shutil

    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
    )

    register_manifest_sink(spark)
    out = _roundtrip_dir(sf_dir, "manifest_evolve", "nation")
    shutil.rmtree(out, ignore_errors=True)
    nation = load_table(spark, sf_dir, "nation")
    (
        nation.filter("n_nationkey < 12")
        .select("n_nationkey", "n_name")
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(out)
    )
    (
        nation.filter("n_nationkey >= 12")
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.format("manifest_parquet")
        .mode("append")
        .save(out)
    )
    return scan_manifest(spark, out).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "q_source_manifest_table_changes",
    oracle="""
WITH tgt AS (
  SELECT o_orderkey AS okey, o_orderstatus AS status,
         CAST(round(o_totalprice, 2) AS DOUBLE) AS price
  FROM orders
), src AS (
  SELECT o_orderkey AS okey, 'U' AS status,
         CAST(round(o_totalprice, 2) * 2 AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT -o_orderkey AS okey, 'N' AS status,
         CAST(round(o_totalprice, 2) AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 5 = 3
)
SELECT okey, status, price,
       'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
FROM src
UNION ALL
SELECT okey, status, price,
       'delete' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
FROM tgt WHERE okey % 5 = 0
""",
)
def q_source_manifest_table_changes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch CDC read over the manifest format (Delta's table_changes /
    Change Data Feed): after the same v1-commit + v2-merge sequence as
    ``q_source_manifest_merge``, ``table_changes(1, 2)`` must emit the
    merge's row-level effect — each updated row as a (delete of the
    old value, insert of the new), each fresh key as an insert, and
    NOTHING for rows the merge carried over (file-level delta first,
    ``EXCEPT ALL`` row diff second, so carried-over and byte-identical
    rewritten rows cancel).  The oracle restates the expected change
    set from the raw table.  Completes the format's CDC square: the
    incremental changes STREAM (version offsets) for continuous
    consumers, this batch CDF for ad-hoc diff/backfill."""
    import shutil

    from setup_harvest_action_spark.sources.manifest_sink import (
        merge_into,
        register_manifest_sink,
        table_changes,
    )

    register_manifest_sink(spark)
    out = _roundtrip_dir(sf_dir, "manifest_cdf", "orders")
    shutil.rmtree(out, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    tgt = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    (
        tgt.repartitionByRange(8, "okey")
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(out)
    )
    updates = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("okey"),
        F.lit("U").alias("status"),
        (F.round("o_totalprice", 2) * 2).alias("price"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 5 == 3).select(
        (-F.col("o_orderkey")).alias("okey"),
        F.lit("N").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    merge_into(
        spark, out, updates.unionByName(inserts), on=["okey"],
        when_matched="update", when_not_matched="insert",
    )
    return table_changes(spark, out, 1, 2)


@query(
    "q_source_manifest_stream_merge",
    oracle="""
WITH tgt AS (
  SELECT o_orderkey AS okey, o_orderstatus AS status,
         CAST(round(o_totalprice, 2) AS DOUBLE) AS price
  FROM orders
), src AS (
  SELECT o_orderkey AS okey, 'U' AS status,
         CAST(round(o_totalprice, 2) * 2 AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT -o_orderkey AS okey, 'N' AS status,
         CAST(round(o_totalprice, 2) AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 5 = 3
)
SELECT okey, status, price FROM src
UNION ALL
SELECT okey, status, price FROM tgt WHERE okey % 5 <> 0
""",
)
def q_source_manifest_stream_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING upsert into the manifest table format
    (``stream_merge_into``: foreachBatch → merge_into per micro-batch,
    the CDC-apply shape on our own format): the same change set as
    ``q_source_manifest_merge`` arrives as a file-source STREAM and
    must leave the table in the identical end state — matched rows
    replaced, inserts appended, untouched rows byte-identical — under
    the same full-upsert SQL oracle.  Checkpointed resume, drained-
    checkpoint no-op, and the content-idempotence contract are pinned
    in tests/test_manifest_sink.py."""
    import shutil

    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
        stream_merge_into,
    )

    register_manifest_sink(spark)
    base = _roundtrip_dir(sf_dir, "manifest_stream_merge", "orders")
    shutil.rmtree(base, ignore_errors=True)
    out = f"{base}/t"
    orders = load_table(spark, sf_dir, "orders")
    tgt = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    (
        tgt.repartitionByRange(8, "okey")
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(out)
    )
    changes = (
        orders.filter(F.col("o_orderkey") % 5 == 0).select(
            F.col("o_orderkey").alias("okey"),
            F.lit("U").alias("status"),
            (F.round("o_totalprice", 2) * 2).alias("price"),
        )
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 5 == 3).select(
            (-F.col("o_orderkey")).alias("okey"),
            F.lit("N").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )
    changes.write.parquet(f"{base}/changes")
    stream = spark.readStream.schema(changes.schema).parquet(
        f"{base}/changes"
    )
    stream_merge_into(
        spark, out, stream, on=["okey"], checkpoint=f"{base}/ckpt"
    )
    return scan_manifest(spark, out).select("okey", "status", "price")


@query(
    "q_source_manifest_cdc_rollup",
    oracle="""
WITH tgt AS (
  SELECT o_orderkey AS okey, o_orderstatus AS status,
         CAST(round(o_totalprice, 2) AS DOUBLE) AS price
  FROM orders
), src AS (
  SELECT o_orderkey AS okey, 'U' AS status,
         CAST(round(o_totalprice, 2) * 2 AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT -o_orderkey AS okey, 'N' AS status,
         CAST(round(o_totalprice, 2) AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 5 = 3
), final AS (
  SELECT okey, status, price FROM src
  UNION ALL
  SELECT okey, status, price FROM tgt WHERE okey % 5 <> 0
)
SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(price AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM final GROUP BY status
""",
)
def q_source_manifest_cdc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE from the batch CDC feed: a grouped
    rollup (count + revenue per status) is maintained by combining the
    v1 aggregate with the SIGNED contribution of ``table_changes(1, 2)``
    (insert → +1/+price, delete → −1/−price) — never re-reading the
    post-merge table.  The oracle computes the same rollup from the
    final state directly, so the hash gate proves base ⊎ delta ≡
    recompute: the consumer pattern that keeps a 100 TB table's
    downstream aggregates fresh for the cost of the day's changes
    (count and sum are self-maintainable aggregates; min/max are not —
    they need the recompute path on deletes).  Sums accumulate in
    DECIMAL so the combine order cannot flip the rounded hash."""
    import shutil

    from setup_harvest_action_spark.sources.manifest_sink import (
        merge_into,
        register_manifest_sink,
        scan_manifest,
        table_changes,
    )

    register_manifest_sink(spark)
    out = _roundtrip_dir(sf_dir, "manifest_cdc_rollup", "orders")
    shutil.rmtree(out, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    tgt = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    (
        tgt.repartitionByRange(8, "okey")
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(out)
    )
    updates = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("okey"),
        F.lit("U").alias("status"),
        (F.round("o_totalprice", 2) * 2).alias("price"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 5 == 3).select(
        (-F.col("o_orderkey")).alias("okey"),
        F.lit("N").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    merge_into(
        spark, out, updates.unionByName(inserts), on=["okey"],
        when_matched="update", when_not_matched="insert",
    )
    dec = F.col("price").cast("decimal(18,6)")
    base = (
        scan_manifest(spark, out, version=1)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).alias("total"),
        )
    )
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    delta = (
        table_changes(spark, out, 1, 2)
        .groupBy("status")
        .agg(
            F.sum(sign).alias("n"),
            F.sum(sign.cast("decimal(18,6)") * dec).alias("total"),
        )
    )
    return (
        base.unionByName(delta)
        .groupBy("status")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.round(F.sum("total"), 2).cast("double").alias("total"),
        )
        .filter(F.col("n_orders") > 0)
    )


@query(
    "q_source_manifest_clone",
    oracle="""
SELECT o_orderkey AS okey, o_orderstatus AS status,
       CAST(round(o_totalprice, 2) AS DOUBLE) AS price
FROM orders WHERE o_orderkey % 3 <> 0
""",
)
def q_source_manifest_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-COPY SHALLOW CLONE under the hash gate: commit ``orders``
    as a manifest table, clone it (one manifest write, no data moved —
    the clone starts with no data directory of its own), then
    row-level-delete a third of the rows ON THE CLONE and scan it.
    The oracle restates the post-delete content; a separate assertion
    surface (tests/test_manifest_sink.py) pins that the SOURCE stays
    byte-identical through all of it — the lineage-fork semantics a
    100 TB experimentation workflow needs without a 100 TB copy."""
    import shutil

    from setup_harvest_action_spark.sources.manifest_sink import (
        delete_where,
        register_manifest_sink,
        scan_manifest,
        shallow_clone,
    )

    register_manifest_sink(spark)
    src = _roundtrip_dir(sf_dir, "manifest_clone_src", "orders")
    dst = _roundtrip_dir(sf_dir, "manifest_clone_dst", "orders")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("price"),
        )
        .repartitionByRange(8, "okey")
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(src)
    )
    shallow_clone(src, dst)
    # the deleted class is a modulo, not a range, so it goes through
    # the merge's delete mode rather than delete_where's stats triples
    from setup_harvest_action_spark.sources.manifest_sink import merge_into

    victims = scan_manifest(spark, dst).filter(F.col("okey") % 3 == 0)
    merge_into(
        spark, dst, victims, on=["okey"],
        when_matched="delete", when_not_matched="ignore",
    )
    return scan_manifest(spark, dst).select("okey", "status", "price")
