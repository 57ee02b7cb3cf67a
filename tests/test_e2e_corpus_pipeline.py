"""End-to-end corpus-ingestion pipeline: the pillars composed.

Streaming ingest → quality gate → dedup against the corpus-so-far →
manifest BRANCH append (write-audit-publish) → audit → publish.
Every piece is an operator the catalog verifies in isolation; this
test pins that they compose into the loop a training-data pipeline
actually runs — duplicates never enter the corpus, rejects never
land, production readers see nothing until the audited publish, and
a checkpointed restart is a no-op.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from setup_harvest_action_spark.sources import manifest_refs as refs
from setup_harvest_action_spark.sources.manifest_sink import (
    register_manifest_sink,
    scan_manifest,
)

MIN_TOKENS = 3  # quality gate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fingerprinted(df):
    return df.withColumn(
        "fingerprint", F.md5(F.lower(F.trim(F.col("text"))))
    )


def test_stream_gate_dedup_branch_publish(spark, tmp_path):
    register_manifest_sink(spark)
    table = str(tmp_path / "corpus")
    incoming = tmp_path / "incoming"
    incoming.mkdir()

    # ---- seed corpus on MAIN, tagged -------------------------------
    seed = [(i, f"seed document number {i} body text") for i in range(10)]
    (
        _fingerprinted(_docs(spark, seed))
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(table)
    )
    refs.create_tag(table, "seed")
    refs.create_branch(table, "ingest")

    # ---- incoming batches: new docs, an exact dup of a SEED doc, a
    # dup WITHIN the stream, and a quality reject ---------------------
    batch_a = [
        (10, "fresh crawl page alpha content"),
        (11, "fresh crawl page beta content"),
        (3, "seed document number 3 body text"),  # dup of corpus doc
        (12, "fresh crawl page gamma content"),
    ]
    batch_b = [
        (13, "fresh crawl page gamma content"),  # dup within stream
        (14, "fresh crawl page delta content"),
        (15, "too short"),  # quality reject (< MIN_TOKENS tokens)
    ]
    _docs(spark, batch_a).write.parquet(str(incoming / "a"))
    _docs(spark, batch_b).write.parquet(str(incoming / "b"))

    # ---- the pipeline: gate -> dedup vs corpus-so-far -> branch -----
    def ingest_batch(batch_df, batch_id: int) -> None:
        gated = _fingerprinted(
            batch_df.filter(
                F.size(F.split(F.trim("text"), " +")) >= MIN_TOKENS
            )
        ).dropDuplicates(["fingerprint"])
        corpus = refs.scan_ref(batch_df.sparkSession, table, "ingest")
        novel = gated.join(
            corpus.select("fingerprint"), "fingerprint", "left_anti"
        )
        refs.append_to_branch(
            novel.select("doc_id", "text", "fingerprint"), table, "ingest"
        )

    def run_stream():
        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)  # batches arrive separately
            .parquet(str(incoming / "*"))
            .writeStream.foreachBatch(ingest_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_stream()

    # ---- production readers saw NOTHING during ingest ---------------
    assert scan_manifest(spark, table).count() == 10
    assert refs.scan_ref(spark, table, "seed").count() == 10

    # ---- audit on the branch, then publish --------------------------
    staged = refs.scan_ref(spark, table, "ingest")
    n, n_fp = staged.agg(
        F.count(F.lit(1)), F.count_distinct("fingerprint")
    ).collect()[0]
    assert n == n_fp, "audit: corpus must be duplicate-free"
    refs.fast_forward(table, "ingest")

    # ---- final corpus: exactly the seeds + the novel survivors ------
    final = {r.doc_id for r in scan_manifest(spark, table).collect()}
    assert final == set(range(10)) | {10, 11, 12, 14}
    texts = [
        r.text
        for r in scan_manifest(spark, table).collect()
    ]
    assert len(texts) == len(set(texts)), "no duplicate content"

    # ---- checkpointed restart with no new files is a no-op ----------
    v_before = refs.resolve_ref(table, "ingest")["version"]
    run_stream()
    assert refs.resolve_ref(table, "ingest")["version"] == v_before
    assert scan_manifest(spark, table).count() == 14

    # ---- the tag still reproduces the pre-ingest corpus -------------
    assert refs.scan_ref(spark, table, "seed").count() == 10


def test_late_duplicate_of_published_doc_is_still_rejected(spark, tmp_path):
    """A second ingest cycle must dedup against everything PUBLISHED by
    the first — the corpus-so-far is the branch head, which after a
    publish equals main."""
    register_manifest_sink(spark)
    table = str(tmp_path / "corpus")
    (
        _fingerprinted(_docs(spark, [(0, "one two three four")]))
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(table)
    )
    refs.create_branch(table, "ingest")

    def cycle(rows):
        gated = _fingerprinted(_docs(spark, rows)).dropDuplicates(
            ["fingerprint"]
        )
        corpus = refs.scan_ref(spark, table, "ingest")
        novel = gated.join(
            corpus.select("fingerprint"), "fingerprint", "left_anti"
        )
        refs.append_to_branch(
            novel.select("doc_id", "text", "fingerprint"), table, "ingest"
        )
        refs.fast_forward(table, "ingest")

    cycle([(1, "five six seven eight")])
    cycle([(2, "five six seven eight"), (3, "nine ten eleven twelve")])
    final = {r.doc_id for r in scan_manifest(spark, table).collect()}
    assert final == {0, 1, 3}
