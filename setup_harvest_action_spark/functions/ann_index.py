"""Persisted, incrementally-maintained PQ (ANN) index on the manifest
table format.

`q_similarity_pq_adc` (functions/similarity.py) proves the PQ-ADC
*kernel* but refits codebooks and re-encodes the whole corpus inside
every query.  At 100 TB the index IS the asset: this module
materializes it as two manifest tables under one index root —

    <index>/codebooks   (m, cluster, c array<double>)   PQ_M·PQ_K rows
    <index>/codes       (vec_id, codes array<int>)      one row/vector

— and maintains it incrementally, mirroring the reference's
idempotent-rerun contract (harvest.py:292-299: a re-run must not
redo or duplicate work already committed) at index level:

  * ``pq_index_build``  — train codebooks ONCE (on a bootstrap
    sample; frozen thereafter, which is how production PQ systems ship
    — FAISS trains on a sample and never refits on add) and encode +
    commit the initial corpus.
  * ``pq_index_append`` — encode ONLY the new batch with the STORED
    codebooks (map-only, zero shuffle, O(batch) rows read), then
    MERGE INTO the codes table keyed on vec_id.  Stats-admitted
    rewrite means an append whose vec_id range is disjoint from
    existing files rewrites NOTHING: every prior file entry survives
    byte-identical (pinned in tests/test_ann_index.py), so re-index
    cost is O(batch), not O(corpus).  Re-appending the same batch is
    a no-op in content (the upsert replaces rows with themselves).
  * ``pq_index_search`` — the query side starts from a SCAN of the
    stored codes (no fit, no encode): ADC scores the compressed codes
    against the probe via two broadcast one-row attaches (codebook
    maps + probe), takes a PQ_CAND candidate pool, and re-ranks ONLY
    the candidates against raw vectors.  Unlike the inline query, the
    exact-distance math here touches PQ_CAND rows, never the corpus.

100 TB design: the codes table is 64× smaller than the vectors
(PQ_M bytes/vector vs PQ_M·PQ_SUB floats), range-committed on vec_id
so the manifest's footer stats both bound merge admission and let a
point lookup (``where=[("vec_id", ...)]``) skip files; search is one
scan of that compressed table + a TakeOrderedAndProject; codebooks are
O(1) state (PQ_M·PQ_K·PQ_SUB doubles).  An IVF routing layer would
store (centroid_id) as one more codes column and turn the scan into a
stats-pruned partition probe.

Catalog entry `q_similarity_pq_adc_stored` shares
`q_similarity_pq_adc`'s unrolled-Lloyd oracle verbatim: frozen
codebooks trained on the full fixture + encode-on-append produce
exactly the codes a monolithic build would, so the stored path must
hash-match the inline path's oracle — build-vs-append equivalence is
part of the gate, not just a unit test.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.functions.similarity import (
    PQ_CAND,
    PQ_M,
    PQ_PROBE,
    PQ_TOPK,
    _as_double,
    _l2,
    _pq_oracle,
    _slice,
    pq_fit_fused,
)
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.io.parallelism import spread


def _codebooks_path(index_path: str) -> str:
    return os.path.join(index_path, "codebooks")


def _codes_path(index_path: str) -> str:
    return os.path.join(index_path, "codes")


def fit_codebooks(emb: DataFrame) -> DataFrame:
    """All PQ_M sub-codebooks as ONE relation (m, cluster, c) — since
    r18 this is :func:`pq_fit_fused`'s native shape (one fused
    (m, cluster)-keyed Lloyd chain), not a PQ_M-way union of
    independent fits; the build writes one codebook fit instead of
    running four."""
    return pq_fit_fused(emb)


def pq_encode(emb: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Encode (vec_id, e) rows to (vec_id, codes array<int>) with FROZEN
    codebooks — map-only: each sub-codebook collapses to one broadcast
    collect_list row, every vector arg-mins all PQ_K centroids inline.
    Zero shuffles; cost is O(|emb|) regardless of corpus size.

    Arg-min orders on (round(dist, 6), cluster, centroid) — the exact
    struct `q_similarity_pq_adc` compares, so stored codes are
    bit-identical to the inline query's and both share one oracle."""
    # one broadcast of the whole (m, cluster, c) relation (r18): the
    # per-subspace filtered aggs were PQ_M broadcast exchanges over the
    # same table; the per-m scorer now filters its subspace inline
    one = codebooks.agg(
        F.collect_list(F.struct("m", "cluster", "c")).alias("cs")
    )
    df = emb.crossJoin(F.broadcast(one))

    def _scorer(m: int):
        # one-argument lambda: a second parameter would be bound by
        # transform() as the array INDEX, not a closure
        def score(s):
            return F.struct(
                F.round(_l2(_slice(F.col("e"), m), s["c"]), 6).alias("dr"),
                s["cluster"].alias("cluster"),
                s["c"].alias("c"),
            )

        return score

    best = [
        F.array_min(
            F.transform(
                F.filter(F.col("cs"), lambda s: s["m"] == F.lit(m)),
                _scorer(m),
            )
        )
        for m in range(PQ_M)
    ]
    return df.select(
        "vec_id", F.array(*[b["cluster"] for b in best]).alias("codes")
    )


def pq_index_build(
    spark: SparkSession,
    emb: DataFrame,
    index_path: str,
    fit_on: DataFrame | None = None,
    n_parts: int = 8,
) -> None:
    """Create the index: train codebooks (on ``fit_on`` — the bootstrap
    sample, default the initial corpus itself; frozen afterwards) and
    commit codebooks + initial codes as manifest tables.  Codes are
    range-committed on vec_id so file footers carry disjoint key
    ranges — the property that makes later appends rewrite nothing."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
    )

    register_manifest_sink(spark)
    cb = fit_codebooks(fit_on if fit_on is not None else emb)
    (
        cb.coalesce(1)
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(_codebooks_path(index_path))
    )
    # Encode with the codebooks READ BACK from the committed table
    # (r19, guide §1.2): ``cb`` is the lazy fit chain, so using it as
    # the encode's broadcast input re-ran the ENTIRE Lloyd fit a second
    # time inside the codes write.  The committed rows are the same
    # doubles bit-exact (parquet stores IEEE754 verbatim), and the scan
    # is one tiny file.
    #
    # Range-partition the INPUT, not the encoded output (r19):
    # repartitionByRange runs a separate range-bounds sampling job over
    # its child, so ranging the codes executed the encode twice per
    # build.  The encode is row-wise (broadcast crossJoin + projection),
    # so partitioning and the range exchange's local sort survive it —
    # identical disjoint vec_id file ranges, one encode pass, and the
    # sampler now scans only (vec_id, e).
    codes = pq_encode(
        emb.repartitionByRange(n_parts, "vec_id"),
        scan_manifest(spark, _codebooks_path(index_path)),
    )
    (
        codes.write.format("manifest_parquet")
        .mode("overwrite")
        .save(_codes_path(index_path))
    )


def _merge_with_retry(
    spark,
    path: str,
    source: DataFrame,
    on: list[str],
    retries: int = 5,
    when_matched: str = "update",
    when_not_matched: str = "insert",
) -> dict:
    """``merge_into`` under the standard optimistic loop: a
    ``CommitConflict`` from an interleaved writer re-derives against
    the fresh snapshot (the ``stream_merge_into`` discipline), so two
    concurrent index appenders both land instead of one dying."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        CommitConflict,
        merge_into,
    )

    for attempt in range(retries):
        try:
            return merge_into(
                spark,
                path,
                source,
                on=on,
                when_matched=when_matched,
                when_not_matched=when_not_matched,
            )
        except CommitConflict:
            if attempt == retries - 1:
                raise
    raise AssertionError("unreachable")


def _index_delete(spark, table_path: str, vec_ids: DataFrame) -> dict:
    """Row-level DELETE from one index table by vec_id — the takedown /
    right-to-be-forgotten path, mirroring the reference's cascade
    contract (harvest.py:204: ON DELETE CASCADE keeps dependents from
    outliving their parent row) at index level.  ``vec_ids`` carries
    the single key column; the key-only MERGE ... WHEN MATCHED THEN
    DELETE rewrites ONLY stats-admitted files (those whose vec_id
    footer range overlaps the deleted ids) — O(touched files), every
    other file entry survives byte-identical — and lands as one
    versioned commit under the CommitConflict CAS."""
    return _merge_with_retry(
        spark,
        table_path,
        vec_ids.select("vec_id").distinct(),
        on=["vec_id"],
        when_matched="delete",
        when_not_matched="ignore",
    )


def pq_index_delete(spark: SparkSession, vec_ids: DataFrame, index_path: str) -> dict:
    """Delete vectors from the stored PQ index: their code rows leave
    the codes table; codebooks (O(1) frozen state) are untouched.  A
    deleted vec_id can never appear in ``pq_index_search`` again —
    search's first stage scans the committed codes, so the delete is
    visible to every subsequent reader atomically."""
    return _index_delete(spark, _codes_path(index_path), vec_ids)


def lsh_index_delete(spark: SparkSession, vec_ids: DataFrame, index_path: str) -> dict:
    """Delete vectors from the stored LSH index: every (vec_id,
    table_id) bucket row for the ids goes — the key-only merge
    anti-joins on vec_id, so all n_tables posting entries drop in one
    commit (no stale postings, the VERDICT's takedown gap)."""
    return _index_delete(spark, _lsh_codes_path(index_path), vec_ids)


def ivf_index_delete(spark: SparkSession, vec_ids: DataFrame, index_path: str) -> dict:
    """Delete vectors from the stored IVF index (assignment rows);
    centroids stay frozen — FAISS remove_ids semantics."""
    return _index_delete(spark, _ivf_assign_path(index_path), vec_ids)


def ivfpq_index_delete(spark: SparkSession, vec_ids: DataFrame, index_path: str) -> dict:
    """Delete vectors from the composed IVF+PQ inverted file.  Cost
    note: this table is clustered on centroid_id, so per-file vec_id
    ranges are wide and a delete admits more files than on the
    vec_id-clustered single-level tables — still bounded by admission,
    and ``auto_compact(zorder_by=["centroid_id"])`` re-tightens the
    rewritten files' routing stats afterwards (SCALE.md §17)."""
    return _index_delete(spark, _ivfpq_codes_path(index_path), vec_ids)


def pq_index_append(spark: SparkSession, new_emb: DataFrame, index_path: str) -> dict:
    """Incrementally index a batch: encode ONLY ``new_emb`` with the
    STORED codebooks, then MERGE INTO the codes table on vec_id.
    O(batch): the encode scans just the batch, and merge's
    stats-admitted rewrite leaves every file whose vec_id range
    cannot overlap the batch byte-identical.  Idempotent: re-running
    the same batch upserts rows to their existing values (the
    reference's rerun contract, harvest.py:292-299).  Concurrent
    appenders serialize under the CommitConflict retry loop.  Returns
    the new codes manifest."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
    )

    register_manifest_sink(spark)
    cb = scan_manifest(spark, _codebooks_path(index_path))
    codes = pq_encode(new_emb, cb)
    return _merge_with_retry(
        spark, _codes_path(index_path), codes, on=["vec_id"]
    )


def pq_index_search(
    spark: SparkSession,
    index_path: str,
    probe: DataFrame,
    emb: DataFrame,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Two-stage ADC search whose FIRST stage is a scan of the stored
    codes table: join nothing corpus-sized — codebook maps and the
    probe attach as broadcast one-row frames, every code row scores
    inline, a PQ_CAND pool survives TakeOrderedAndProject, and only
    the pool re-ranks against raw vectors (broadcast semi-side join
    of PQ_CAND rows into ``emb``).  Output schema matches
    `q_similarity_pq_adc`: (vec_id, codes, adc_dist, exact_dist)."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        scan_manifest,
    )

    codes = scan_manifest(spark, _codes_path(index_path))
    if exclude_vec_id is not None:
        codes = codes.filter(F.col("vec_id") != exclude_vec_id)
    cb = scan_manifest(spark, _codebooks_path(index_path))
    # ONE broadcast for all PQ_M lookup maps AND the probe (r19, guide
    # §2.4): the per-m filtered aggs were PQ_M separate broadcast
    # exchanges over the same tiny codebook table, plus one more for
    # the probe — each a scheduled job.  collect_list skips nulls, so
    # the when() is the same per-subspace filter.
    maps_row = cb.agg(
        *[
            F.map_from_entries(
                F.collect_list(
                    F.when(F.col("m") == m, F.struct("cluster", "c"))
                )
            ).alias(f"map{m}")
            for m in range(PQ_M)
        ]
    )
    df = codes.crossJoin(F.broadcast(maps_row.crossJoin(probe)))
    adc2 = None
    for m in range(PQ_M):
        cent = F.col(f"map{m}")[F.col("codes")[m]]
        term = F.pow(_l2(_slice(F.col("q"), m), cent), 2)
        adc2 = term if adc2 is None else adc2 + term
    cand = (
        df.select(
            "vec_id",
            F.array_join(F.col("codes"), "-").alias("codes"),
            F.round(F.sqrt(adc2), 6).alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(PQ_CAND)
    )
    # the candidate pool and the probe ride ONE broadcast into the
    # exact re-rank (the pool is PQ_CAND rows; the probe one row)
    return (
        F.broadcast(cand.crossJoin(probe))
        .join(emb, "vec_id")
        .select(
            "vec_id",
            "codes",
            "adc_dist",
            F.round(_l2(F.col("e"), F.col("q")), 6).alias("exact_dist"),
        )
        .orderBy("exact_dist", "vec_id")
        .limit(PQ_TOPK)
    )


def pq_index_stream_append(
    spark: SparkSession,
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str,
    timeout_sec: int = 300,
) -> None:
    """STREAMING index maintenance: drain a (vec_id, e) stream into the
    PQ index via foreachBatch → ``pq_index_append`` per micro-batch —
    the index-level form of ``stream_merge_into``.  Each batch encodes
    with the frozen stored codebooks and merges O(batch); the
    checkpoint makes re-runs resume-exactly-once, and because append
    is content-idempotent a replayed batch upserts rows to their
    existing values (the reference's rerun contract at stream
    granularity)."""

    def _apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pq_index_append(spark, batch_df, index_path)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


@query("q_stream_similarity_pq_index", oracle=_pq_oracle())
def q_stream_similarity_pq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC search against an index maintained by a STREAM: the
    first quarter of the corpus is the initial build (codebooks frozen
    on the full fixture — oracle parity), the remaining three quarters
    arrive as a checkpointed file-source stream in ≥3 micro-batches,
    each encode-batch + MERGE INTO.  After the drain the search scans
    the stored codes and must hash-match the SAME unrolled-Lloyd
    oracle as the inline and stored-batch PQ queries — streaming
    maintenance is inside the correctness gate, not just a pipeline
    demo."""
    import shutil

    base = os.path.join(_index_scratch(sf_dir), os.pardir, "pq_stream")
    shutil.rmtree(base, ignore_errors=True)
    out = os.path.join(base, "index")
    raw = load_table(spark, sf_dir, "embeddings")
    emb = spread(raw).select("vec_id", _as_double().alias("e"))
    hi = raw.agg(F.max("vec_id").alias("hi")).first()["hi"]
    split = int(hi // 4)
    pq_index_build(
        spark, emb.filter(F.col("vec_id") <= split), out, fit_on=emb
    )
    arrivals = os.path.join(base, "arrivals")
    (
        emb.filter(F.col("vec_id") > split)
        .repartitionByRange(3, "vec_id")
        .write.parquet(arrivals)
    )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals)
    )
    pq_index_stream_append(
        spark, stream, out, os.path.join(base, "ckpt")
    )
    probe = emb.filter(F.col("vec_id") == PQ_PROBE).select(
        F.col("e").alias("q")
    )
    return pq_index_search(spark, out, probe, emb, exclude_vec_id=PQ_PROBE)


# --- Stored LSH bucket table --------------------------------------------------
#
# The second index family the VERDICT named: the multi-table
# random-hyperplane bucket table of `q_similarity_ann_lsh` persisted as
# a manifest table.  Hyperplanes are seeded-deterministic constants
# (similarity.hyperplanes_df — xxhash64('hp:t:b:d')), so the BUCKET
# TABLE is the whole index asset; appends code only the new batch with
# the same planes and MERGE on the unique (vec_id, table_id) key.


def _lsh_codes_path(index_path: str) -> str:
    return os.path.join(index_path, "lsh_codes")


def lsh_index_build(
    spark: SparkSession, vecs: DataFrame, index_path: str, n_parts: int = 8
) -> None:
    """Commit the (vec_id, table_id, code) bucket table for ``vecs``
    (columns vec_id, v), range-committed on vec_id so appends with
    fresh ids rewrite nothing."""
    from setup_harvest_action_spark.functions.similarity import (
        hyperplanes_df,
        lsh_codes,
    )
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    # range the INPUT: the coding transform is row-multiplying but
    # per-vector, so the range exchange's vec_id clustering survives it
    # and the range sampler never re-runs the coding (r19, see
    # pq_index_build)
    codes = lsh_codes(
        vecs.repartitionByRange(n_parts, "vec_id"), hyperplanes_df(spark)
    )
    (
        codes.write.format("manifest_parquet")
        .mode("overwrite")
        .save(_lsh_codes_path(index_path))
    )


def lsh_index_append(
    spark: SparkSession, new_vecs: DataFrame, index_path: str
) -> dict:
    """Incrementally index a batch: code ONLY ``new_vecs`` with the
    deterministic hyperplanes and MERGE INTO the bucket table on the
    unique (vec_id, table_id) key — O(batch), idempotent on rerun."""
    from setup_harvest_action_spark.functions.similarity import (
        hyperplanes_df,
        lsh_codes,
    )
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    codes = lsh_codes(new_vecs, hyperplanes_df(spark))
    return _merge_with_retry(
        spark, _lsh_codes_path(index_path), codes, on=["vec_id", "table_id"]
    )


def lsh_index_search(
    spark: SparkSession,
    index_path: str,
    vecs: DataFrame,
    n_query_vecs: int,
    top_k: int,
    max_bucket: int | None = None,
) -> DataFrame:
    """ANN top-k whose candidate generation is a SCAN of the stored
    bucket table: query codes come from a stats-PRUNED point read of
    the same table (``where vec_id < n_query_vecs`` — the manifest
    skips every file whose footer range excludes the query ids),
    candidates from the bucket equi-join, exact cosine only on
    candidates.  Output schema matches `q_similarity_ann_lsh`.

    ``max_bucket`` (r14) bounds the CELEBRITY-BUCKET failure mode the
    hot-corpus probe measured (one bucket holding 60% of the corpus
    grows candidate volume 2.3x, SCALE.md §17): at most ``max_bucket``
    candidates admit per probed (query, table, bucket), deterministic
    by ascending vec_id — the MAX_SHINGLE_DF pattern from the dedup
    family, trading recall tail for a hard per-bucket bound.  The cap
    runs AFTER the bucket equi-join, so it bounds what flows into the
    distinct + exact-cosine stages (the expensive side); default None
    keeps exact parity with `q_similarity_ann_lsh` (pinned)."""
    from pyspark.sql import Window

    from setup_harvest_action_spark.functions.similarity import cosine
    from setup_harvest_action_spark.sources.manifest_sink import (
        scan_manifest,
    )

    codes = scan_manifest(spark, _lsh_codes_path(index_path))
    qcodes = scan_manifest(
        spark,
        _lsh_codes_path(index_path),
        where=[("vec_id", "<", n_query_vecs)],
    ).select(F.col("vec_id").alias("query_id"), "table_id", "code")
    joined = codes.join(F.broadcast(qcodes), ["table_id", "code"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    if max_bucket is not None:
        wb = Window.partitionBy("query_id", "table_id", "code").orderBy(
            "vec_id"
        )
        joined = (
            joined.withColumn("__bn", F.row_number().over(wb))
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    cand_ids = joined.select("query_id", "vec_id").distinct()
    queries = vecs.filter(F.col("vec_id") < n_query_vecs).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        cand_ids.join(vecs, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            "rank",
        )
    )


@query("q_similarity_ann_lsh_stored")
def q_similarity_ann_lsh_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH top-k against a PERSISTED, INCREMENTALLY-BUILT
    bucket table: first 3/4 of the corpus committed, the rest appended
    (coded with the same deterministic hyperplanes + MERGE INTO —
    nothing rewritten), query codes read back via a stats-pruned point
    scan of the stored table.  Deterministic hyperplanes make coding
    path-independent, so this returns EXACTLY `q_similarity_ann_lsh`'s
    rows (pinned in tests/test_ann_index.py).  No oracle (hash-seeded
    hyperplanes aren't SQL-portable); recall rides on the inline
    query's pinned floor."""
    from setup_harvest_action_spark.functions.similarity import (
        N_QUERY_VECS,
        TOP_K,
    )

    out = os.path.join(_index_scratch(sf_dir), os.pardir, "lsh_index")
    shutil.rmtree(out, ignore_errors=True)
    vecs = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", _as_double().alias("v")
    )
    hi = vecs.agg(F.max("vec_id").alias("hi")).first()["hi"]
    split = int(hi * 3 // 4)
    lsh_index_build(spark, vecs.filter(F.col("vec_id") <= split), out)
    lsh_index_append(spark, vecs.filter(F.col("vec_id") > split), out)
    return lsh_index_search(spark, out, vecs, N_QUERY_VECS, TOP_K)


# --- Stored IVF index ----------------------------------------------------------
#
# The third family: the inverted-file assignment of
# `q_similarity_ann_ivf` persisted — a centroids table (the coarse
# quantizer, O(1) state, frozen at build like the PQ codebooks) and an
# assignment table (vec_id → centroid_id).  Appends assign only the
# batch against the stored centroids and MERGE on vec_id.  At 100 TB
# the assignment table IS the partitioning: a probe reads nprobe
# clusters' members, never the corpus.


def _ivf_centroids_path(index_path: str) -> str:
    return os.path.join(index_path, "ivf_centroids")


def _ivf_assign_path(index_path: str) -> str:
    return os.path.join(index_path, "ivf_assignments")


def _ivf_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, centroid_id): nearest stored centroid by cosine —
    map-only (centroids broadcast as one collect_list row, argmax
    inline), ties to the lower centroid_id like the inline query."""
    from setup_harvest_action_spark.functions.similarity import cosine

    one = cents.agg(
        F.collect_list(F.struct("centroid_id", "cv")).alias("cs")
    )
    best = F.array_min(
        F.transform(
            F.col("cs"),
            lambda s: F.struct(
                (-cosine(F.col("v"), s["cv"])).alias("neg"),
                s["centroid_id"].alias("centroid_id"),
            ),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(one))
        .select("vec_id", best["centroid_id"].alias("centroid_id"))
    )


def ivf_index_build(
    spark: SparkSession,
    vecs: DataFrame,
    index_path: str,
    n_centroids: int,
    n_parts: int = 8,
) -> None:
    """Commit centroids (deterministic: the first ``n_centroids``
    vectors, the inline query's stand-in for an offline k-means fit)
    and the initial assignment table, range-committed on vec_id."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    cents = vecs.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("v").alias("cv"),
    )
    (
        cents.coalesce(1)
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(_ivf_centroids_path(index_path))
    )
    # range the INPUT (r19, see pq_index_build): assignment is a
    # row-wise broadcast arg-min, so the vec_id clustering survives it
    # and the range sampler never re-runs the assignment
    assign = _ivf_assign(vecs.repartitionByRange(n_parts, "vec_id"), cents)
    (
        assign.write.format("manifest_parquet")
        .mode("overwrite")
        .save(_ivf_assign_path(index_path))
    )


def ivf_index_append(
    spark: SparkSession, new_vecs: DataFrame, index_path: str
) -> dict:
    """Assign ONLY the batch against the FROZEN stored centroids, then
    MERGE INTO the assignment table on vec_id — O(batch), idempotent."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
    )

    register_manifest_sink(spark)
    cents = scan_manifest(spark, _ivf_centroids_path(index_path))
    assign = _ivf_assign(new_vecs, cents)
    return _merge_with_retry(
        spark, _ivf_assign_path(index_path), assign, on=["vec_id"]
    )


def ivf_index_search(
    spark: SparkSession,
    index_path: str,
    vecs: DataFrame,
    n_query_vecs: int,
    nprobe: int,
    top_k: int,
) -> DataFrame:
    """Probe the stored index: rank stored centroids per query vector
    (tiny broadcast), take ``nprobe``, fetch members from the stored
    assignment table (the corpus never moves — only probed clusters'
    ids join), exact cosine on the candidates.  Output schema matches
    `q_similarity_ann_ivf`."""
    from pyspark.sql import Window

    from setup_harvest_action_spark.functions.similarity import cosine
    from setup_harvest_action_spark.sources.manifest_sink import (
        scan_manifest,
    )

    cents = scan_manifest(spark, _ivf_centroids_path(index_path))
    queries = vecs.filter(F.col("vec_id") < n_query_vecs).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cc"), F.asc("centroid_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "centroid_id",
            cosine(F.col("qv"), F.col("cv")).alias("cc"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    assignment = scan_manifest(spark, _ivf_assign_path(index_path))
    cand_ids = (
        assignment.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        cand_ids.join(vecs, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 6).alias("cosine"),
            "rank",
        )
    )


@query("q_similarity_ann_ivf_stored")
def q_similarity_ann_ivf_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k against a PERSISTED, INCREMENTALLY-BUILT inverted
    file: centroids frozen at build (FAISS semantics — the quantizer
    never refits on add), first 3/4 of the corpus committed, the rest
    assigned batch-only + MERGE INTO.  Assignment depends only on
    (vector, centroids), so the stored index equals a monolithic build
    and this returns EXACTLY `q_similarity_ann_ivf`'s rows (pinned in
    tests/test_ann_index.py).  No oracle (argmax assignment + probing
    isn't reasonably SQL-expressible); recall rides on the inline
    query's pinned floor."""
    from setup_harvest_action_spark.functions.similarity import (
        IVF_CENTROIDS,
        IVF_NPROBE,
        N_QUERY_VECS,
        TOP_K,
    )

    out = os.path.join(_index_scratch(sf_dir), os.pardir, "ivf_index")
    shutil.rmtree(out, ignore_errors=True)
    vecs = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", _as_double().alias("v")
    )
    hi = vecs.agg(F.max("vec_id").alias("hi")).first()["hi"]
    split = int(hi * 3 // 4)
    ivf_index_build(
        spark, vecs.filter(F.col("vec_id") <= split), out, IVF_CENTROIDS
    )
    ivf_index_append(spark, vecs.filter(F.col("vec_id") > split), out)
    return ivf_index_search(
        spark, out, vecs, N_QUERY_VECS, IVF_NPROBE, TOP_K
    )


# --- Composed IVF+PQ index ------------------------------------------------------
#
# The 100 TB ANN architecture the PQ docstring promises: IVF routes,
# PQ-ADC scores.  The asset is ONE inverted-file table
# (vec_id, centroid_id, codes) range-committed on centroid_id, so each
# file's footer covers a tight centroid range and
# ``scan_manifest(where=[("centroid_id", "=", c)])`` opens only that
# cluster's files — the probe IS file-level data skipping, no
# partition layout tricks needed.  After unclustered appends,
# ``auto_compact(zorder_by=["centroid_id"])`` (r11) restores the
# routing selectivity — the maintenance loop this round built.


def _ivfpq_codes_path(index_path: str) -> str:
    return os.path.join(index_path, "ivfpq_codes")


def ivfpq_index_build(
    spark: SparkSession,
    emb: DataFrame,
    index_path: str,
    n_centroids: int,
    n_parts: int = 8,
    fit_on: DataFrame | None = None,
) -> None:
    """Build the composed index: IVF centroids (frozen), PQ codebooks
    (frozen), and the inverted-file codes table clustered by
    centroid_id.  ``emb`` carries (vec_id, e)."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    vecs = emb.select("vec_id", F.col("e").alias("v"))
    cents = vecs.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("v").alias("cv"),
    )
    (
        cents.coalesce(1)
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(_ivf_centroids_path(index_path))
    )
    cb = fit_codebooks(fit_on if fit_on is not None else emb)
    (
        cb.coalesce(1)
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(_codebooks_path(index_path))
    )
    from setup_harvest_action_spark.sources.manifest_sink import (
        scan_manifest,
    )

    # encode with the committed codebooks scanned back — the lazy fit
    # chain otherwise re-runs inside the codes write (r19, see
    # pq_index_build); bit-identical doubles through parquet
    assign = _ivf_assign(vecs, cents)
    codes = pq_encode(
        emb, scan_manifest(spark, _codebooks_path(index_path))
    ).join(assign, "vec_id")
    (
        codes.repartitionByRange(n_parts, "centroid_id")
        .sortWithinPartitions("centroid_id", "vec_id")
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(_ivfpq_codes_path(index_path))
    )


def _leaf_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, centroid_id): nearest LEAF cell, two-level-aware.

    Plain centroids tables (no ``parent_id`` column — every index
    until its first ``ivfpq_cell_refit``) fall through to
    ``_ivf_assign`` unchanged.  After a refit the table carries child
    rows (``parent_id`` = the split cell); assignment then routes
    nearest TOP-LEVEL centroid first and, when that cell is split,
    re-argmins among ITS children — both levels in ONE map-only pass
    (top list + a parent→children map attach as two broadcast one-row
    frames; no row ever shuffles for assignment).  Same metric and
    tie-break as ``_ivf_assign`` (cosine, ties to the lower id) at
    both levels."""
    from setup_harvest_action_spark.functions.similarity import cosine

    if "parent_id" not in cents.columns:
        return _ivf_assign(vecs, cents)
    top = cents.filter(F.col("parent_id").isNull()).select(
        "centroid_id", "cv"
    )
    kids = cents.filter(F.col("parent_id").isNotNull())
    one_top = top.agg(
        F.collect_list(F.struct("centroid_id", "cv")).alias("cs")
    )
    one_kids = (
        kids.groupBy("parent_id")
        .agg(F.collect_list(F.struct("centroid_id", "cv")).alias("ks"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("parent_id", "ks"))
            ).alias("kmap")
        )
    )

    def _argmin(arr):
        return F.array_min(
            F.transform(
                arr,
                lambda s: F.struct(
                    (-cosine(F.col("v"), s["cv"])).alias("neg"),
                    s["centroid_id"].alias("centroid_id"),
                ),
            )
        )["centroid_id"]

    df = vecs.crossJoin(F.broadcast(one_top)).crossJoin(
        F.broadcast(one_kids)
    )
    best_top = _argmin(F.col("cs"))
    ks = F.col("kmap")[best_top]
    leaf = F.when(ks.isNull(), best_top).otherwise(_argmin(ks))
    return df.select("vec_id", leaf.alias("centroid_id"))


def ivfpq_index_append(
    spark: SparkSession,
    new_emb: DataFrame,
    index_path: str,
    maintain: bool = False,
    share_threshold: float = 0.25,
    n_sub: int = 8,
    emb: DataFrame | None = None,
) -> dict:
    """Incrementally index a batch into the composed inverted file:
    PQ-encode AND IVF-assign ONLY ``new_emb`` (columns vec_id, e)
    against the FROZEN stored codebooks + centroids — both map-only,
    zero shuffle — then MERGE INTO the (vec_id, centroid_id, codes)
    table on vec_id.  O(batch): stats admission rewrites nothing when
    the batch's vec_id range is disjoint from committed files (the
    centroid-clustered layout still carries vec_id footer stats).
    Idempotent on rerun (harvest.py:292-299 at index level); concurrent
    appenders serialize under the CommitConflict retry.

    Assignment is leaf-aware (``_leaf_assign``): on an index where a
    celebrity cell has been split by ``ivfpq_cell_refit``, new vectors
    route directly into the split cell's children — still one map-only
    pass.  On never-split indexes this is byte-identical to the
    original single-level assignment.

    The append trades clustering for latency: fresh files span many
    centroids, so probe admission degrades until
    ``auto_compact(zorder_by=["centroid_id"])`` re-clusters them —
    the degrade→compact→restored loop is pinned in
    tests/test_ann_index.py.

    ``maintain=True`` runs ``ivfpq_maintain`` after the merge — the
    stats-only celebrity trigger (r14 verdict #5): a cell whose
    footer-stats row share crossed ``share_threshold`` is refit into
    ``n_sub`` children right here in the ingest path, at most one per
    append, already-split cells structurally skipped (no refit storm —
    churn-pinned in tests).  The maintenance report lands under
    ``"maintenance"`` in the returned stats."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        scan_manifest,
    )

    register_manifest_sink(spark)
    cb = scan_manifest(spark, _codebooks_path(index_path))
    cents = scan_manifest(spark, _ivf_centroids_path(index_path))
    vecs = new_emb.select("vec_id", F.col("e").alias("v"))
    codes = pq_encode(new_emb, cb).join(_leaf_assign(vecs, cents), "vec_id")
    stats = _merge_with_retry(
        spark, _ivfpq_codes_path(index_path), codes, on=["vec_id"]
    )
    if maintain:
        stats = dict(stats)
        stats["maintenance"] = ivfpq_maintain(
            spark,
            index_path,
            share_threshold=share_threshold,
            n_sub=n_sub,
            emb=emb,
        )
    return stats


def ivfpq_index_stream_append(
    spark: SparkSession,
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str,
    timeout_sec: int = 300,
    maintain: bool = False,
    compact_every: int = 0,
    share_threshold: float = 0.25,
    n_sub: int = 8,
    compact_parts: int = 4,
) -> list[dict]:
    """STREAMING maintenance for the composed index: drain a
    (vec_id, e) stream via foreachBatch → ``ivfpq_index_append`` per
    micro-batch.  Same contract as ``pq_index_stream_append``: the
    checkpoint makes re-runs resume-exactly-once and the append's
    content-idempotence makes replays harmless.

    r16 composes BOTH maintenance halves into the loop itself:
    ``maintain=True`` runs the stats-only celebrity trigger after each
    micro-batch merge (≤1 cell refit per batch, split cells
    structurally skipped — the r15 no-storm contract), and
    ``compact_every=N`` runs ``auto_compact(zorder_by=
    ["centroid_id"])`` after every Nth non-empty batch to restore the
    routing selectivity streaming appends dilute.  The two never
    starve each other: refit rewrites only the hot cell's files and
    registers split children; compaction rewrites only small files
    and never merges across the (vec_id-keyed) content — the churn
    test drives both together and pins the concentration band.
    Returns one report per non-empty batch (merge stats, maintenance
    report, compaction version if one ran)."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        auto_compact,
    )

    reports: list[dict] = []

    def _apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stats = ivfpq_index_append(
            spark,
            batch_df,
            index_path,
            maintain=maintain,
            share_threshold=share_threshold,
            n_sub=n_sub,
        )
        report = {"batch_id": batch_id, **stats}
        if compact_every and (len(reports) + 1) % compact_every == 0:
            cm = auto_compact(
                spark,
                _ivfpq_codes_path(index_path),
                small_bytes=1 << 30,
                n_parts=compact_parts,
                zorder_by=["centroid_id"],
            )
            report["compacted"] = {
                "version": cm["version"],
                "n_files": len(cm["files"]),
            }
        reports.append(report)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return reports


def ivfpq_search(
    spark: SparkSession,
    index_path: str,
    probe_vec: DataFrame,
    emb: DataFrame,
    nprobe: int,
    n_cand: int,
    top_k: int,
    exclude_vec_id: int | None = None,
    sub_nprobe: int = 2,
) -> DataFrame:
    """Routed search: rank the stored centroids against the probe
    (tiny — one job over n_centroids rows, the repo's bounded-collect
    class, like the bucket-id lists in harvest/bucketed.py), then ONE
    pruned scan per probed centroid — the manifest's centroid_id
    footer stats open only that cluster's files — ADC-score the
    candidate codes, exact-rerank the top ``n_cand``.

    TWO-LEVEL routing (hot-cell escape, SCALE.md §17): when a probed
    top-level cell has been split by ``ivfpq_cell_refit`` (child rows
    with ``parent_id`` in the centroids table), the probe expands to
    the nearest ``sub_nprobe`` of ITS children instead of the whole
    celebrity mass — admission drops from the split cell's entire row
    share to ~share/n_sub per probed child.  The parent id stays in
    the probe set (its scan is ~empty post-refit; it covers rows
    written by an append that raced the refit's codes rewrite), so
    routing is correct in every intermediate state.  Never-split
    indexes take the single-level path unchanged."""
    from setup_harvest_action_spark.functions.similarity import cosine
    from setup_harvest_action_spark.sources.manifest_sink import (
        scan_manifest,
    )

    cents = scan_manifest(spark, _ivf_centroids_path(index_path))
    two_level = "parent_id" in cents.columns
    top = (
        cents.filter(F.col("parent_id").isNull()) if two_level else cents
    )
    neg = (-cosine(F.col("cv"), F.col("q"))).alias("neg")
    ranked = (
        top.crossJoin(F.broadcast(probe_vec))
        .select("centroid_id", neg)
        .orderBy("neg", "centroid_id")
        .limit(nprobe)
    )
    probe_ids = [r["centroid_id"] for r in ranked.collect()]  # nprobe ints
    if two_level:
        from pyspark.sql import Window as _W

        w_kid = _W.partitionBy("parent_id").orderBy("neg", "centroid_id")
        kid_rows = (  # bounded: ≤ (split cells probed) × n_sub rows
            cents.filter(F.col("parent_id").isin([int(c) for c in probe_ids]))
            .crossJoin(F.broadcast(probe_vec))
            .select("parent_id", "centroid_id", neg)
            .withColumn("rn", F.row_number().over(w_kid))
            .filter(F.col("rn") <= sub_nprobe)
            .select("centroid_id")
            .collect()
        )
        probe_ids = probe_ids + [r["centroid_id"] for r in kid_rows]
    parts = [
        scan_manifest(
            spark,
            _ivfpq_codes_path(index_path),
            where=[("centroid_id", "=", int(c))],
        )
        for c in probe_ids
    ]
    codes = parts[0]
    for p in parts[1:]:
        codes = codes.unionByName(p)
    if exclude_vec_id is not None:
        codes = codes.filter(F.col("vec_id") != exclude_vec_id)
    cb = scan_manifest(spark, _codebooks_path(index_path))
    df = codes
    for m in range(PQ_M):
        one = cb.filter(F.col("m") == m).agg(
            F.map_from_entries(
                F.collect_list(F.struct("cluster", "c"))
            ).alias(f"map{m}")
        )
        df = df.crossJoin(F.broadcast(one))
    df = df.crossJoin(F.broadcast(probe_vec))
    adc2 = None
    for m in range(PQ_M):
        cent = F.col(f"map{m}")[F.col("codes")[m]]
        term = F.pow(_l2(_slice(F.col("q"), m), cent), 2)
        adc2 = term if adc2 is None else adc2 + term
    cand = (
        df.select(
            "vec_id",
            F.array_join(F.col("codes"), "-").alias("codes"),
            F.round(F.sqrt(adc2), 6).alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(n_cand)
    )
    return (
        F.broadcast(cand)
        .join(emb, "vec_id")
        .crossJoin(F.broadcast(probe_vec))
        .select(
            "vec_id",
            "codes",
            "adc_dist",
            F.round(_l2(F.col("e"), F.col("q")), 6).alias("exact_dist"),
        )
        .orderBy("exact_dist", "vec_id")
        .limit(top_k)
    )


# --- Hot-cell local re-fit (two-level IVF) ---------------------------------------
#
# The structural escape SCALE.md §17 names for a persistent celebrity
# cell: when one IVF cell accumulates a disproportionate row share
# (60% in the measured probe — one probe scanned 5,033 of ~20k rows),
# sub-splitting its FILES (z-order / range rewrite) parallelizes the
# scan but every probe still reads the whole mass.  The fix is local:
# k-means over THAT cell's members only, splitting it into
# sub-centroids, rewriting only that cell's files — O(cell), never
# O(index) — and giving routing a two-level lookup for split cells.
# Entirely index-resident: member vectors are RECONSTRUCTED from their
# own PQ codes (codebook lookup, the decode half of ADC), so the refit
# reads zero corpus bytes; the same recurrence accepts raw vectors by
# swapping the reconstruction for a corpus fetch when exactness of the
# sub-centroids matters more than locality.


def _reconstruct(
    codes_df: DataFrame, cb: DataFrame, out_col: str = "e"
) -> DataFrame:
    """Decode PQ codes back to their centroid concatenation as a new
    ``out_col`` beside the input columns — map-only (PQ_M one-row
    codebook-map broadcasts, the exact lookup ADC scoring uses), no
    corpus access, no shuffle."""
    keep = codes_df.columns
    df = codes_df
    for m in range(PQ_M):
        one = cb.filter(F.col("m") == m).agg(
            F.map_from_entries(
                F.collect_list(F.struct("cluster", "c"))
            ).alias(f"rmap{m}")
        )
        df = df.crossJoin(F.broadcast(one))
    rv = F.concat(
        *[F.col(f"rmap{m}")[F.col("codes")[m]] for m in range(PQ_M)]
    )
    return df.select(*keep, rv.alias(out_col))


def ivfpq_cell_shares(index_path: str) -> dict[int, float]:
    """Per-cell row-share LOWER BOUNDS from manifest footer stats
    alone — zero data files opened: a file whose centroid_id min==max
    is cell-pure and its manifest row count attributes wholly to that
    cell.  On a freshly built/compacted (centroid-clustered) table
    nearly every file is pure, so the bound is tight exactly when the
    maintenance decision matters.  This is the split TRIGGER: a cell
    whose share crosses the deployment's threshold (the measured probe
    used 0.25) goes to ``ivfpq_cell_refit``."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        read_manifest,
    )

    m = read_manifest(_ivfpq_codes_path(index_path))
    total = sum(e["rows"] for e in m["files"]) or 1
    shares: dict[int, float] = {}
    for e in m["files"]:
        st = (e.get("stats") or {}).get("centroid_id")  # [min, max]
        if st and st[0] == st[1] and st[0] is not None:
            cid = int(st[0])
            shares[cid] = shares.get(cid, 0.0) + e["rows"] / total
    return shares


def ivfpq_cell_refit(
    spark: SparkSession,
    index_path: str,
    centroid_id: int,
    n_sub: int = 8,
    iters: int = 2,
    n_parts: int = 8,
    retries: int = 5,
    emb: DataFrame | None = None,
) -> dict:
    """LOCAL re-fit of one celebrity cell — the structural hot-cell
    fix (SCALE.md §17): split cell ``centroid_id`` into ``n_sub``
    sub-cells so probes admit ~1/n_sub of its mass instead of all of
    it.  Three bounded steps, none corpus- or index-shaped:

    1. FIT — Lloyd k-means (``_assign``/``_update``, the repo's
       kmeans recurrence) over the CELL's members only, reconstructed
       from their own PQ codes (``_reconstruct`` — the refit never
       reads a raw vector).  Deterministic init: the cell's first
       ``n_sub`` members by vec_id.  O(cell·iters).
    2. COMMIT sub-centroids — child rows (fresh ids above the current
       max, ``parent_id`` = the split cell) append to the centroids
       table; existing rows null-fill ``parent_id``.  The parent row
       STAYS as the router's first-level entry.  Committed BEFORE the
       codes rewrite so searches in the intermediate state probe
       parent (all rows still there) + children (empty) — correct at
       every point.
    3. REWRITE only the cell's files — the ``auto_compact`` commit
       pattern: stats-admitted files (footer centroid range covers the
       cell) re-read, the cell's rows re-argmined against the
       sub-centroids INLINE (broadcast n_sub rows; same cosine /
       ties-to-lower-id rule ``_leaf_assign`` applies to future
       appends), passthrough rows byte-equal, everything else in the
       table carried over BYTE-IDENTICAL.  One versioned commit under
       the CommitConflict CAS (re-derived per retry).

    Routing afterwards: ``ivfpq_search`` expands probed split cells to
    their nearest ``sub_nprobe`` children; ``ivfpq_index_append``
    assigns leaf-aware.  Takedown (``ivfpq_index_delete``) keys on
    vec_id and is split-agnostic.  Placement note: members are
    re-assigned from RECONSTRUCTIONS while future appends assign raw
    vectors — placement near sub-cell boundaries is approximate (IVF
    placement always is); recall is what the floor tests gate.

    RECONSTRUCTION vs RAW (``emb``): the default fits on PQ
    reconstructions — index-only, zero corpus bytes.  That fails on a
    QUANTIZATION POINT-MASS: a celebrity cell of near-duplicate
    vectors (jitter below the PQ step) reconstructs to ONE point and
    no vector-space k-means can spread it (measured in
    tools/skew_probe.py --ann: children [4801, 60, ...]).  Passing
    ``emb`` (vec_id, e — the corpus) escalates to a RAW-vector refit:
    member vectors come from an O(cell) pruned corpus fetch (a keyed
    semi-join; at 100 TB the corpus table's vec_id clustering makes
    this a file-pruned read, not a scan), sub-structure below the
    quantization step becomes visible, and member placement is
    EXACTLY what ``_leaf_assign`` gives future appends (no
    reconstruction approximation).

    By contract TWO-level: refitting a child (or re-splitting an
    already-split parent) raises — a celebrity child is handled by
    raising ``n_sub`` in a fresh refit after a rebuild, keeping the
    router a single parent→children map."""
    from setup_harvest_action_spark.functions.similarity import (
        _assign,
        _update,
        cosine,
    )
    from setup_harvest_action_spark.sources.manifest_sink import (
        CommitConflict,
        _read_entries,
        _stage_parts,
        _write_versioned,
        read_manifest,
        register_manifest_sink,
        scan_manifest,
        select_files,
    )

    register_manifest_sink(spark)
    cid = int(centroid_id)
    cents = scan_manifest(spark, _ivf_centroids_path(index_path))
    if "parent_id" in cents.columns:
        row = cents.filter(F.col("centroid_id") == cid).first()
        if row is None:
            raise ValueError(f"unknown centroid_id {cid}")
        if row["parent_id"] is not None:
            raise ValueError(f"cell {cid} is a child — two-level only")
        if cents.filter(F.col("parent_id") == cid).limit(1).count():
            raise ValueError(f"cell {cid} is already split")
    else:
        cents = cents.withColumn("parent_id", F.lit(None).cast("int"))
    cb = scan_manifest(spark, _codebooks_path(index_path))

    # 1. FIT on the cell's reconstructed members
    from pyspark.sql import Window as _W

    codes_path = _ivfpq_codes_path(index_path)
    members = scan_manifest(
        spark, codes_path, where=[("centroid_id", "=", cid)]
    ).select("vec_id", "codes")
    if emb is not None:
        recon = emb.join(members.select("vec_id"), "vec_id").select(
            "vec_id", "e"
        )
    else:
        recon = _reconstruct(members, cb).select("vec_id", "e")
    # Deterministic MASS-QUANTILE seeding: first-k-by-vec_id seeds
    # collapse when a dominant sub-mass sits far from the first
    # members (measured in the skew probe: one child swallowed
    # 4816/5033 rows — k-means never recovers from one seed near the
    # mass).  Seed one member at each norm QUANTILE of the cell's own
    # distribution instead, so a celebrity sub-mass gets seeds in
    # proportion to its rows — all O(cell): one map for norms, a
    # distributed quantile sketch, one n_sub-keyed min_by agg.  Falls
    # back to first-k when the norm is degenerate (all members
    # equidistant from the origin).
    nrm = F.sqrt(
        F.aggregate(F.col("e"), F.lit(0.0), lambda a, x: a + x * x)
    )
    mem_n = recon.withColumn("nrm", nrm)
    probs = [(2 * i + 1) / (2 * n_sub) for i in range(n_sub)]
    qvals = mem_n.approxQuantile("nrm", probs, 0.001)
    if len(set(qvals)) >= 2:
        one_q = F.array(*[F.lit(float(q)) for q in qvals])
        bucket = F.array_min(
            F.transform(
                one_q,
                lambda q, i: F.struct(
                    F.abs(F.col("nrm") - q).alias("d"), i.alias("i")
                ),
            )
        )["i"]
        seeds = (  # ≤ n_sub rows, the repo's bounded-collect class
            mem_n.withColumn("b", bucket)
            .groupBy("b")
            .agg(
                F.min_by(
                    "e", F.struct(F.col("nrm"), F.col("vec_id"))
                ).alias("c")
            )
            .orderBy("b")
            .collect()
        )
        init = spark.createDataFrame(
            [(i, [float(x) for x in r["c"]]) for i, r in enumerate(seeds)],
            "cluster int, c array<double>",
        )
    else:
        init = (
            recon.orderBy("vec_id")
            .limit(n_sub)
            .select(
                (F.row_number().over(_W.orderBy("vec_id")) - 1).alias(
                    "cluster"
                ),
                F.col("e").alias("c"),
            )
        )
    cent = init
    for _ in range(iters):
        cent = _update(_assign(recon, cent))
    subs = cent.orderBy("cluster").collect()  # ≤ n_sub rows, bounded
    if len(subs) < 2:
        raise ValueError(f"cell {cid} has <2 distinct members; not split")

    # 2. COMMIT sub-centroids (dense fresh ids, parent lineage)
    base = int(cents.agg(F.max("centroid_id")).first()[0]) + 1
    sub_rows = [
        (base + i, [float(x) for x in r["c"]], cid)
        for i, r in enumerate(subs)
    ]
    sub_df = spark.createDataFrame(
        sub_rows, "centroid_id int, cv array<double>, parent_id int"
    )
    (
        cents.unionByName(sub_df)
        .coalesce(1)
        .write.format("manifest_parquet")
        .mode("overwrite")
        .save(_ivf_centroids_path(index_path))
    )

    # 3. REWRITE only the cell's stats-admitted files
    one_sub = sub_df.agg(
        F.collect_list(F.struct("centroid_id", "cv")).alias("subs")
    )
    for attempt in range(retries):
        m = read_manifest(codes_path)
        admitted = select_files(m, [("centroid_id", "=", cid)])
        names = {e["file"] for e in admitted}
        keep = [e for e in m["files"] if e["file"] not in names]
        df = _read_entries(spark, codes_path, m, admitted)
        if emb is not None:
            rdf = df.join(
                emb.select("vec_id", F.col("e").alias("rv")),
                "vec_id",
                "left",
            )
        else:
            rdf = _reconstruct(df, cb, out_col="rv")
        best = F.array_min(
            F.transform(
                F.col("subs"),
                # unrounded cosine, exactly _leaf_assign's metric, so a
                # member placed here and an identical vector appended
                # later land in the same child even near ties
                lambda s: F.struct(
                    (-cosine(F.col("rv"), s["cv"])).alias("neg"),
                    s["centroid_id"].alias("centroid_id"),
                ),
            )
        )["centroid_id"]
        out = (
            rdf.crossJoin(F.broadcast(one_sub))
            .select(
                "vec_id",
                # rv is null only for a raw-mode member missing from
                # the supplied corpus — such a row keeps the parent id
                # (parent stays probed, so it remains reachable)
                F.when(
                    (F.col("centroid_id") == cid)
                    & F.col("rv").isNotNull(),
                    best,
                )
                .otherwise(F.col("centroid_id"))
                .alias("centroid_id"),
                "codes",
            )
            .repartitionByRange(n_parts, "centroid_id", "vec_id")
            .sortWithinPartitions("centroid_id", "vec_id")
        )
        entries = _stage_parts(
            out, codes_path, bloom_columns=m.get("bloom_columns") or ()
        )
        after = dict(m)
        after["files"] = sorted(keep + entries, key=lambda e: e["file"])
        after["total_rows"] = sum(e["rows"] for e in after["files"])
        try:
            _write_versioned(codes_path, after, expected_version=m["version"])
            break
        except CommitConflict:
            if attempt == retries - 1:
                raise
    return {
        "cell": cid,
        "sub_ids": [r[0] for r in sub_rows],
        "files_rewritten": len(admitted),
        "files_kept": len(keep),
    }


def ivfpq_maintain(
    spark: SparkSession,
    index_path: str,
    share_threshold: float = 0.25,
    n_sub: int = 8,
    max_refits: int = 1,
    min_cell_rows: int | None = None,
    emb: DataFrame | None = None,
) -> dict:
    """AUTO-trigger for the celebrity-cell re-fit — the maintenance
    half ``auto_compact`` is for clustering (r14 verdict #5): read
    ``ivfpq_cell_shares`` (manifest footer stats only — zero data
    files opened), refit any TOP-LEVEL cell whose row-share lower
    bound crosses ``share_threshold``, most-loaded first.

    Storm control is structural, not a timer:

    * a split parent can never re-split (``ivfpq_cell_refit`` raises
      by contract and this trigger SKIPS it) — so one cell costs at
      most ONE refit for the index's lifetime, no matter how many
      appends cross the threshold afterwards;
    * children are never refit here (two-level contract); a celebrity
      CHILD is reported in ``hot_children`` as the operator's
      escalation signal (rebuild with higher ``n_sub``), never acted
      on;
    * at most ``max_refits`` per call bounds the latency an append
      can absorb — remaining candidates wait for the next append's
      trigger (they are re-measured then, from fresh stats);
    * ``min_cell_rows`` (default ``4 * n_sub``) keeps tiny-but-
      borderline cells out entirely: a refit that cannot give each
      child a handful of members buys nothing.

    Returns {"refits": [refit results], "skipped_split": [...],
    "hot_children": [...], "shares": {...}} — shares as measured
    BEFORE any refit this call performed."""
    from setup_harvest_action_spark.sources.manifest_sink import (
        register_manifest_sink,
        read_manifest,
        scan_manifest,
    )

    register_manifest_sink(spark)
    if min_cell_rows is None:
        min_cell_rows = 4 * n_sub
    shares = ivfpq_cell_shares(index_path)
    m = read_manifest(_ivfpq_codes_path(index_path))
    total = sum(e["rows"] for e in m["files"]) or 1
    cents = scan_manifest(spark, _ivf_centroids_path(index_path))
    split_parents: set[int] = set()
    children: set[int] = set()
    if "parent_id" in cents.columns:
        for r in cents.filter(F.col("parent_id").isNotNull()).collect():
            split_parents.add(int(r["parent_id"]))
            children.add(int(r["centroid_id"]))
    hot = [
        c
        for c, s in sorted(shares.items(), key=lambda kv: -kv[1])
        if s >= share_threshold and s * total >= min_cell_rows
    ]
    out: dict = {
        "refits": [],
        "skipped_split": [c for c in hot if c in split_parents],
        "hot_children": [c for c in hot if c in children],
        "shares": shares,
    }
    for cid in hot:
        if cid in split_parents or cid in children:
            continue
        if len(out["refits"]) >= max_refits:
            break
        out["refits"].append(
            ivfpq_cell_refit(spark, index_path, cid, n_sub=n_sub, emb=emb)
        )
    return out


@query("q_similarity_ivfpq_stored")
def q_similarity_ivfpq_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ, the production ANN composition, on ONE stored
    inverted-file table: IVF routing happens at the FILE level (the
    probe's pruned scans open only the probed centroids' files —
    pinned via select_files in tests), PQ-ADC scores only those
    clusters' compressed codes, exact re-rank touches just the
    candidate pool.  At 100 TB this reads nprobe/n_centroids of a
    64×-compressed table — the only corpus-shaped cost in the query.
    The query runs the FULL maintenance loop (r12): build on the first
    3/4 of the corpus, ``ivfpq_index_append`` the rest (encode+assign
    batch-only against the frozen codebooks/centroids, MERGE on
    vec_id), then ``auto_compact(zorder_by=["centroid_id"])`` — the
    append dilutes file-level routing (fresh files span many
    centroids) and the z-order rewrite restores it, which is the
    steady-state cadence a 100 TB deployment runs.  Rows-only (IVF
    argmax routing isn't reasonably SQL-expressible); recall floor,
    O(batch) append, and the degrade→compact→restored routing loop are
    pinned in tests/test_ann_index.py."""
    from setup_harvest_action_spark.functions.similarity import (
        IVF_CENTROIDS,
        IVF_NPROBE,
    )
    from setup_harvest_action_spark.sources.manifest_sink import auto_compact

    out = os.path.join(_index_scratch(sf_dir), os.pardir, "ivfpq_index")
    shutil.rmtree(out, ignore_errors=True)
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", _as_double().alias("e")
    )
    hi = emb.agg(F.max("vec_id").alias("hi")).first()["hi"]
    split = int(hi * 3 // 4)
    ivfpq_index_build(
        spark,
        emb.filter(F.col("vec_id") <= split),
        out,
        IVF_CENTROIDS,
        fit_on=emb,
    )
    ivfpq_index_append(spark, emb.filter(F.col("vec_id") > split), out)
    auto_compact(
        spark,
        _ivfpq_codes_path(out),
        small_bytes=1 << 30,
        n_parts=8,
        zorder_by=["centroid_id"],
    )
    probe = emb.filter(F.col("vec_id") == PQ_PROBE).select(
        F.col("e").alias("q")
    )
    return ivfpq_search(
        spark,
        out,
        probe,
        emb,
        nprobe=IVF_NPROBE,
        n_cand=PQ_CAND,
        top_k=PQ_TOPK,
        exclude_vec_id=PQ_PROBE,
    )


def _index_scratch(sf_dir: str) -> str:
    label = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(tempfile.gettempdir(), "shas_ann", label, "pq_index")


@query("q_similarity_pq_adc_stored", oracle=_pq_oracle())
def q_similarity_pq_adc_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC search against a PERSISTED, INCREMENTALLY-BUILT index:
    codebooks are trained once on the fixture (frozen), the first 3/4
    of the corpus (by vec_id) is committed as the initial codes table,
    the remaining 1/4 arrives later as an append batch (encode-only +
    MERGE INTO — no refit, no corpus rewrite), and the search's first
    stage is a manifest SCAN of the stored codes.  Because frozen
    codebooks make encoding path-independent, the stored index is
    bit-identical to a monolithic build and this query hash-matches
    the same unrolled-Lloyd oracle as `q_similarity_pq_adc` — the
    build→append→scan lifecycle itself is inside the gate.  Recall is
    therefore the inline query's pinned floor unchanged
    (tests/test_llm_functions.py; equality of the two queries is
    additionally pinned in tests/test_ann_index.py)."""
    out = _index_scratch(sf_dir)
    # fresh index per call: the build+append lifecycle is stateful;
    # repeated gate/bench runs must re-prove from the same commits
    shutil.rmtree(out, ignore_errors=True)
    base = load_table(spark, sf_dir, "embeddings")
    emb = spread(base).select("vec_id", _as_double().alias("e"))
    # the split scalar scans the RAW table (column-pruned, no spread
    # exchange, no embedding cast — r19): same max, cheaper job
    hi = base.agg(F.max("vec_id").alias("hi")).first()["hi"]
    split = int(hi * 3 // 4)
    pq_index_build(
        spark, emb.filter(F.col("vec_id") <= split), out, fit_on=emb
    )
    pq_index_append(spark, emb.filter(F.col("vec_id") > split), out)
    probe = emb.filter(F.col("vec_id") == PQ_PROBE).select(
        F.col("e").alias("q")
    )
    return pq_index_search(spark, out, probe, emb, exclude_vec_id=PQ_PROBE)


# ids deleted by q_similarity_pq_delete: chosen so the takedown is
# NON-VACUOUS under the gate — 73 sits in the probe's top-10 at BOTH
# sf0.001 and sf0.01, 365 is the sf0.01 #1 neighbor; a delete that
# silently failed would leave them in the result and break the hash
PQ_DELETE = (73, 365)


@query("q_similarity_pq_delete", oracle=_pq_oracle(exclude=PQ_DELETE))
def q_similarity_pq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE inside the correctness gate (r12): build the
    stored PQ index on the full corpus (codebooks frozen), take down
    vec_ids {73, 365} via the key-only MERGE DELETE, then search.  The
    DuckDB oracle is the inline PQ query's unrolled-Lloyd SQL with the
    deleted ids excluded from the CANDIDATE set only — fit-then-delete
    in exactly the lifecycle's order — so a takedown that failed to
    remove a posting (or removed the wrong rows, or leaked the vectors
    back through the exact re-rank) hash-mismatches.  Complements the
    O(touched-files) and search-absence pins in
    tests/test_ann_index.py with a driver-checkable gate, the same
    promotion r11 gave the stored lifecycle."""
    out = os.path.join(_index_scratch(sf_dir), os.pardir, "pq_delete")
    shutil.rmtree(out, ignore_errors=True)
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", _as_double().alias("e")
    )
    pq_index_build(spark, emb, out, fit_on=emb)
    ids = spark.createDataFrame([(int(i),) for i in PQ_DELETE], "vec_id BIGINT")
    pq_index_delete(spark, ids, out)
    probe = emb.filter(F.col("vec_id") == PQ_PROBE).select(
        F.col("e").alias("q")
    )
    return pq_index_search(spark, out, probe, emb, exclude_vec_id=PQ_PROBE)
