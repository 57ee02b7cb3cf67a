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


def test_publish_decontaminate_redact_scrub_index(spark, tmp_path):
    """The EXPORT side of the pipeline, composed from r11 operators: a
    published corpus table is screened against a benchmark
    (decontaminate), PII-redacted, cross-document boilerplate is CUT
    (substring removal), and the surviving docs' embeddings are built
    into a persisted PQ index that search then serves.  Each stage is
    oracled/pinned in isolation; this pins the composition: flagged
    docs never reach the export, no PII and no shared span survives in
    the exported text, and the index answers only over survivors."""
    import random

    from setup_harvest_action_spark.functions.ann_index import (
        pq_index_build,
        pq_index_search,
    )
    from setup_harvest_action_spark.functions.dedup import (
        contamination_flags,
        remove_shared_substrings,
    )
    from setup_harvest_action_spark.functions.quality import (
        PII_EMAIL,
        redact_pii,
    )

    register_manifest_sink(spark)
    table = str(tmp_path / "corpus")
    boiler = "SHARED LICENSE HEADER " * 3  # 66 chars > SPAN_LEN
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # 0: contaminated (contains a benchmark 5-gram)
        (0, "clean words then alpha beta gamma delta epsilon end"),
        # 1: carries PII
        (1, "write to me at someone@example.com for the data"),
        # 2 + 3: share the boilerplate header
        (2, boiler + "unique tail two two two two two two two two"),
        (3, boiler + "other tail three three three three three three"),
        # 4: plain survivor
        (4, "perfectly ordinary document with enough words to pass"),
    ]
    _docs(spark, rows).write.format("manifest_parquet").mode(
        "overwrite"
    ).save(table)
    corpus = scan_manifest(spark, table)
    bench = _docs(spark, [(1000, bench_text)])

    # stage 1: decontamination screen — flagged docs drop
    flagged = contamination_flags(corpus, bench)
    flagged_ids = {r["doc_id"] for r in flagged.collect()}
    assert flagged_ids == {0}
    surviving = corpus.join(flagged, "doc_id", "left_anti")

    # stage 2: PII redaction (text kept for the next stage)
    redacted = redact_pii(surviving, keep_text=True).select(
        "doc_id", F.col("clean_text").alias("text")
    )

    # stage 3: cross-document boilerplate removal
    cleaned = remove_shared_substrings(redacted)
    out = {r["doc_id"]: r["clean"] for r in cleaned.collect()}
    assert set(out) == {1, 2, 3, 4}
    assert "someone@example.com" not in out[1] and "[EMAIL]" in out[1]
    assert all("SHARED LICENSE HEADER" not in t for t in out.values())
    assert "unique tail" in out[2] and "other tail" in out[3]
    assert out[4] == rows[4][1]  # untouched survivor

    # stage 4: persisted PQ index over the survivors' embeddings
    rng = random.Random(99)
    emb = spark.createDataFrame(
        [
            (d, [round(rng.uniform(-1, 1), 4) for _ in range(64)])
            for d in sorted(out)
        ],
        "vec_id BIGINT, e ARRAY<DOUBLE>",
    )
    idx = str(tmp_path / "idx")
    pq_index_build(spark, emb, idx)
    probe = emb.filter(F.col("vec_id") == 4).select(F.col("e").alias("q"))
    hits = pq_index_search(spark, idx, probe, emb, exclude_vec_id=4).collect()
    assert hits and {r["vec_id"] for r in hits} <= {1, 2, 3}
