"""Named refs (tags/branches/WAP) on the manifest table format:
isolation, CAS, vacuum protection, divergence refusal, crash orphan."""

from __future__ import annotations

import os

import pytest

from setup_harvest_action_spark.sources import manifest_refs as refs
from setup_harvest_action_spark.sources.manifest_sink import (
    CommitConflict,
    read_manifest,
    register_manifest_sink,
    scan_manifest,
    vacuum_manifest,
)


@pytest.fixture(scope="module")
def sink(spark):
    register_manifest_sink(spark)
    return spark


def _write(df, path, mode="append"):
    df.write.format("manifest_parquet").mode(mode).save(str(path))


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 10 AS val")


def test_branch_commits_are_invisible_on_main_until_publish(sink, tmp_path):
    p = str(tmp_path)
    _write(_df(sink, 0, 10), p, "overwrite")
    refs.create_branch(p, "staging")
    refs.append_to_branch(_df(sink, 10, 15), p, "staging")
    assert scan_manifest(sink, p).count() == 10  # main untouched
    assert refs.scan_ref(sink, p, "staging").count() == 15
    refs.fast_forward(p, "staging")
    assert scan_manifest(sink, p).count() == 15
    assert sorted(
        r.id for r in scan_manifest(sink, p).collect()
    ) == list(range(15))


def test_tag_is_immutable_and_pins_through_vacuum(sink, tmp_path):
    p = str(tmp_path)
    _write(_df(sink, 0, 5), p, "overwrite")
    v1 = refs.create_tag(p, "release")
    _write(_df(sink, 5, 9), p)  # v2
    _write(_df(sink, 9, 12), p)  # v3
    with pytest.raises(ValueError, match="immutable"):
        refs.create_tag(p, "release", version=2)
    vacuum_manifest(p, keep_last=1)
    # the tagged snapshot (and its data) survived retention
    tagged = refs.scan_ref(sink, p, "release")
    assert tagged.count() == 5
    assert refs.resolve_ref(p, "release")["version"] == v1
    # dropping the tag releases protection; the next vacuum reclaims
    refs.delete_ref(p, "release")
    removed = vacuum_manifest(p, keep_last=1)
    assert any(e.startswith("_manifest-v1") for e in removed)


def test_branch_append_cas_detects_lost_race(sink, tmp_path):
    p = str(tmp_path)
    _write(_df(sink, 0, 5), p, "overwrite")
    head = refs.create_branch(p, "b")
    refs.append_to_branch(_df(sink, 5, 6), p, "b", expected_head=head)
    with pytest.raises(CommitConflict):
        refs.append_to_branch(_df(sink, 6, 7), p, "b", expected_head=head)


def test_fast_forward_refuses_diverged_main(sink, tmp_path):
    p = str(tmp_path)
    _write(_df(sink, 0, 5), p, "overwrite")
    refs.create_branch(p, "b")
    refs.append_to_branch(_df(sink, 5, 6), p, "b")
    _write(_df(sink, 100, 101), p)  # main advances independently
    with pytest.raises(CommitConflict, match="not an ancestor"):
        refs.fast_forward(p, "b")


def test_main_commit_never_reuses_a_ref_protected_version(sink, tmp_path):
    # branch head allocates v2; a later MAIN append must skip it, not
    # overwrite the branch's snapshot
    p = str(tmp_path)
    _write(_df(sink, 0, 5), p, "overwrite")  # v1
    refs.create_branch(p, "b")
    refs.append_to_branch(_df(sink, 5, 8), p, "b")  # v2 (branch)
    _write(_df(sink, 8, 10), p)  # main: must become v3
    assert read_manifest(p)["version"] == 3
    assert refs.resolve_ref(p, "b")["version"] == 2
    assert refs.scan_ref(sink, p, "b").count() == 8  # branch intact
    assert scan_manifest(sink, p).count() == 7  # 5 base + 2 main


def test_vacuum_reclaims_crashed_branch_commit(sink, tmp_path, monkeypatch):
    # crash between branch snapshot write and ref advance: snapshot is
    # an unprotected orphan, branch stays at its old head, vacuum
    # reclaims the orphan and its staged parts
    p = str(tmp_path)
    _write(_df(sink, 0, 5), p, "overwrite")
    head = refs.create_branch(p, "b")

    def boom(path, r):
        raise RuntimeError("crash before ref advance")

    monkeypatch.setattr(refs, "_save_refs", boom)
    with pytest.raises(RuntimeError, match="crash"):
        refs.append_to_branch(_df(sink, 5, 9), p, "b")
    monkeypatch.undo()
    assert refs.resolve_ref(p, "b")["version"] == head
    assert refs.scan_ref(sink, p, "b").count() == 5
    removed = vacuum_manifest(p, keep_last=5)
    assert any(e.startswith("_manifest-v2") for e in removed)
    assert any(e.startswith("data/") for e in removed)
    # lock was released by the failed commit — later ref ops proceed
    refs.create_tag(p, "ok")


def test_wap_catalog_query_registered(sink, sf_dir):
    from setup_harvest_action_spark.catalog import load_catalog

    queries, oracles = load_catalog()
    assert "q_source_manifest_wap" in oracles
    n = queries["q_source_manifest_wap"](sink, sf_dir).count()
    assert n == 150  # sf0.001 customer rowcount
