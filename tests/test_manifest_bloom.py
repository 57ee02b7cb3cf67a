"""Per-file Bloom-filter data skipping on the manifest table format.

The contract under test: NO FALSE NEGATIVES ever (skipping is a pure
optimization — every query answer is identical with and without the
index), real skipping on point lookups that min/max stats cannot serve
(interleaved high-entropy keys), and index maintenance across the
format's whole CRUD surface (append, delete_where, merge_into,
compact, backfill).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from setup_harvest_action_spark.sources.manifest_sink import (
    add_bloom_filters,
    bloom_may_contain,
    build_bloom,
    compact,
    delete_where,
    merge_into,
    read_manifest,
    register_manifest_sink,
    scan_manifest,
    select_files,
)


def _write_interleaved(spark, path: str, n_files: int = 4, rows: int = 400):
    """Append n_files parts whose doc_id ranges all overlap (ids
    interleave mod n_files), so [min, max] stats admit EVERY file for
    any point lookup — the exact workload blooms exist for."""
    register_manifest_sink(spark)
    for i in range(n_files):
        (
            spark.range(rows)
            .repartition(1)  # one part per append: every file's id
            # range spans [i, n_files*rows), so min/max can't skip
            .select(
                (F.col("id") * n_files + i).alias("doc_id"),
                F.concat(F.lit("term_"), F.col("id") * n_files + i).alias(
                    "term"
                ),
            )
            .write.format("manifest_parquet")
            .option("bloomColumns", "doc_id,term")
            .mode("append" if i else "overwrite")
            .save(path)
        )


def test_bloom_primitives_no_false_negatives_and_fpp():
    present = [f"key_{i}" for i in range(500)]
    b = build_bloom(present, fpp=0.01)
    assert b is not None and b["m"] >= 64 and 1 <= b["k"] <= 16
    # no false negatives — the correctness half of the contract
    assert all(bloom_may_contain(b, v) for v in present)
    # false-positive rate near the target — the usefulness half
    absent = [f"other_{i}" for i in range(2000)]
    fp = sum(bloom_may_contain(b, v) for v in absent) / len(absent)
    assert fp < 0.05, fp
    # unsupported values poison the build and keep probes conservative
    assert build_bloom([1.5, 2.5]) is None
    assert build_bloom([None]) is None
    assert build_bloom([]) is None
    assert bloom_may_contain(b, 3.14) is True  # float probe: keep file
    # ints and bools canonicalize distinctly (bool is an int subclass)
    bi = build_bloom([1, 2, 3])
    assert bloom_may_contain(bi, 2)
    assert build_bloom([True, False]) is not None


def test_writer_option_builds_blooms_and_point_lookup_skips(
    spark, tmp_path
):
    path = str(tmp_path / "tbl")
    _write_interleaved(spark, path)
    m = read_manifest(path)
    assert m["bloom_columns"] == ["doc_id", "term"]
    assert len(m["files"]) >= 4
    assert all("doc_id" in (e.get("blooms") or {}) for e in m["files"])

    # min/max admits every file for a point lookup (interleaved keys)…
    by_stats_only = [
        e
        for e in m["files"]
        if (lambda rng: rng and rng[0] <= 42 <= rng[1])(
            e["stats"].get("doc_id")
        )
    ]
    assert len(by_stats_only) == len(m["files"])
    # …but the bloom prunes to (nearly) the one owning file
    kept = select_files(m, [("doc_id", "=", 42)])
    assert 1 <= len(kept) < len(m["files"])

    # semantics unchanged: scan with skipping == full-scan filter
    via_skip = scan_manifest(spark, path, where=[("doc_id", "=", 42)])
    full = scan_manifest(spark, path).filter(F.col("doc_id") == 42)
    assert sorted(map(tuple, via_skip.collect())) == sorted(
        map(tuple, full.collect())
    )

    # string-column lookups skip too
    kept_s = select_files(m, [("term", "=", "term_42")])
    assert 1 <= len(kept_s) < len(m["files"])


def test_never_a_false_negative_across_all_keys(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_interleaved(spark, path, n_files=3, rows=200)
    m = read_manifest(path)
    # every existing key must keep the file that holds it
    owner = {}
    for e in m["files"]:
        lo, hi = e["stats"]["doc_id"]
        for v in range(lo, hi + 1):
            owner.setdefault(v, set()).add(e["file"])
    for doc_id in range(0, 600, 7):
        kept = {e["file"] for e in select_files(m, [("doc_id", "=", doc_id)])}
        assert owner.get(doc_id, set()) & kept or doc_id not in owner, doc_id
        # stronger: a key's actual row count survives the pruned scan
    sample = [0, 1, 299, 463, 599]
    for doc_id in sample:
        got = (
            scan_manifest(spark, path, where=[("doc_id", "=", doc_id)])
            .count()
        )
        assert got == 1, (doc_id, got)


def test_backfill_then_rewrites_preserve_the_index(spark, tmp_path):
    path = str(tmp_path / "tbl")
    register_manifest_sink(spark)
    # write WITHOUT the option — no blooms in v1/v2
    for i in range(2):
        (
            spark.range(300)
            .select((F.col("id") * 2 + i).alias("doc_id"))
            .write.format("manifest_parquet")
            .mode("append" if i else "overwrite")
            .save(path)
        )
    m = read_manifest(path)
    assert not any(e.get("blooms") for e in m["files"])
    v_before = m["version"]

    # backfill: one metadata-only commit, files untouched
    m2 = add_bloom_filters(path, ["doc_id"])
    assert m2["version"] == v_before + 1
    assert m2["bloom_columns"] == ["doc_id"]
    assert all("doc_id" in e["blooms"] for e in m2["files"])
    assert {e["file"] for e in m2["files"]} == {
        e["file"] for e in m["files"]
    }
    assert len(select_files(m2, [("doc_id", "=", 10)])) < len(m2["files"])
    # time travel to the pre-index version still reads
    assert scan_manifest(spark, path, version=v_before).count() == 600

    # delete_where rewrite: new parts carry fresh blooms
    delete_where(spark, path, [("doc_id", "<", 10)])
    m3 = read_manifest(path)
    assert all("doc_id" in (e.get("blooms") or {}) for e in m3["files"])
    assert m3["bloom_columns"] == ["doc_id"]

    # merge_into rewrite: same
    src = spark.range(5).select((F.col("id") + 50).alias("doc_id"))
    merge_into(spark, path, src, on=["doc_id"])
    m4 = read_manifest(path)
    assert m4["bloom_columns"] == ["doc_id"]
    assert all("doc_id" in (e.get("blooms") or {}) for e in m4["files"])

    # compaction rebuilds the index on the compacted files
    compact(spark, path, 1)
    m5 = read_manifest(path)
    assert len(m5["files"]) == 1
    assert "doc_id" in m5["files"][0]["blooms"]
    assert m5["bloom_columns"] == ["doc_id"]


def test_backfill_conflicts_and_validations(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_interleaved(spark, path, n_files=2, rows=50)
    with pytest.raises(ValueError, match="at least one column"):
        add_bloom_filters(path, [])
    # unknown / float columns: silently unsupported (no filter built),
    # probes stay conservative, scan semantics unchanged
    m = add_bloom_filters(path, ["nope"])
    assert all("nope" not in (e.get("blooms") or {}) for e in m["files"])
    kept = select_files(m, [("doc_id", "=", 4)])
    assert kept  # doc_id blooms from the writer option still skip
