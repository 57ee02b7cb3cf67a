"""md5 (oracle) vs xxhash64 (production/bench) sketch spellings must
agree on the fixture (VERDICT r10 #5): the hash choice is a cost knob,
not a semantics knob.  The driver gate replays the md5 spelling against
DuckDB; the bench pays the production cost — this test is the bridge
that keeps the two spellings interchangeable."""

from __future__ import annotations

import pytest

from setup_harvest_action_spark.functions.dedup import (
    SKETCH_HASH_ENV,
    q_dedup_containment,
    q_dedup_incremental,
    q_dedup_minhash,
    q_dedup_ngram_jaccard,
    q_dedup_simhash,
    q_dedup_substring_spans,
    q_dedup_winnowing,
)

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


@pytest.fixture()
def md5_spelling(monkeypatch):
    monkeypatch.delenv(SKETCH_HASH_ENV, raising=False)


def _with_x64(monkeypatch, fn, spark, sf_dir=SF):
    monkeypatch.setenv(SKETCH_HASH_ENV, "xxhash64")
    try:
        return fn(spark, sf_dir)
    finally:
        monkeypatch.delenv(SKETCH_HASH_ENV)


def test_minhash_pair_set_identical_across_spellings(
    spark, monkeypatch, md5_spelling
):
    md5_pairs = _pairs(q_dedup_minhash(spark, SF))
    x64_pairs = _pairs(_with_x64(monkeypatch, q_dedup_minhash, spark))
    assert md5_pairs == x64_pairs
    assert md5_pairs  # non-vacuous: the fixture has near-dup pairs


def test_winnowing_pair_set_identical_across_spellings(
    spark, monkeypatch, md5_spelling
):
    # shared_fps counts legitimately differ (the two hashes select
    # DIFFERENT 1/8 window samples); the reported pair set must not
    md5_pairs = _pairs(q_dedup_winnowing(spark, SF))
    x64_pairs = _pairs(_with_x64(monkeypatch, q_dedup_winnowing, spark))
    assert md5_pairs == x64_pairs
    assert md5_pairs


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_ngram_jaccard_rows_identical_across_spellings(
    spark, monkeypatch, md5_spelling
):
    # r18: the shingle-key explode gained the xxhash64 spelling — the
    # FULL rows (pair + jaccard value, which folds in the per-doc
    # distinct-shingle sizes) must match, not just the pair set
    md5_rows = _rows(q_dedup_ngram_jaccard(spark, SF))
    x64_rows = _rows(_with_x64(monkeypatch, q_dedup_ngram_jaccard, spark))
    assert md5_rows == x64_rows
    assert md5_rows


def test_containment_rows_identical_across_spellings(
    spark, monkeypatch, md5_spelling
):
    md5_rows = _rows(q_dedup_containment(spark, SF))
    x64_rows = _rows(_with_x64(monkeypatch, q_dedup_containment, spark))
    assert md5_rows == x64_rows
    assert md5_rows


def test_substring_spans_rows_identical_across_spellings(
    spark, monkeypatch, md5_spelling
):
    # stride-1 keeps every window in both spellings, so even the
    # shared_spans counts must agree (unlike winnowing's 1/8 samples)
    md5_rows = _rows(q_dedup_substring_spans(spark, SF))
    x64_rows = _rows(_with_x64(monkeypatch, q_dedup_substring_spans, spark))
    assert md5_rows == x64_rows
    assert md5_rows


def test_incremental_rows_identical_across_spellings(
    spark, monkeypatch, md5_spelling
):
    md5_rows = _rows(q_dedup_incremental(spark, SF))
    x64_rows = _rows(_with_x64(monkeypatch, q_dedup_incremental, spark))
    assert md5_rows == x64_rows
    assert md5_rows


def test_simhash_duplicate_groups_collapse_in_both_spellings(
    spark, monkeypatch, md5_spelling
):
    # raw simhash VALUES differ by construction (different token
    # hashes vote), and even the hamming-NEAR pair set is legitimately
    # hash-dependent for near-but-not-identical docs (borderline bit
    # votes flip either way).  The hash-INVARIANT contract is: docs
    # with identical token multisets get identical bit votes, hence
    # one simhash per duplicate group — under ANY hash.
    from setup_harvest_action_spark.io.loaders import load_table

    # sf0.001 has no VERBATIM text duplicates (the planted near-dups
    # differ in case/whitespace), so plant them: a scratch fixture dir
    # where every doc_id >= 10000 repeats doc_id - 10000 exactly.
    import pathlib

    base = load_table(spark, SF, "documents").select("doc_id", "text")
    planted = base.limit(40).selectExpr("doc_id + 10000 AS doc_id", "text")
    scratch = pathlib.Path(spark.conf.get("spark.local.dir", "/tmp"))
    sf_dir = str(scratch / "hash_spelling_fixture")
    base.unionByName(planted).write.mode("overwrite").parquet(
        sf_dir + "/documents.parquet"
    )
    dup_groups = [(i, i + 10000) for i in range(40)]

    for rows in (
        q_dedup_simhash(spark, sf_dir).collect(),
        _with_x64(monkeypatch, q_dedup_simhash, spark, sf_dir).collect(),
    ):
        sig = {r["doc_id"]: r["simhash"] for r in rows}
        for a, b in dup_groups:
            assert sig[a] == sig[b], (a, b)
        # 64-bit spread (nothing collapsed globally)
        assert len(set(sig.values())) > 400
