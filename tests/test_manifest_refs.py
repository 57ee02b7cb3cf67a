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


def test_refs_protocol_randomized_model_check(sink, tmp_path):
    """Seeded random interleaving of main appends/deletes, tag
    creation, branch creation/append, fast-forward publish (success
    AND divergence refusal), compaction and vacuum: after every op the
    main table, every branch, and every tag must equal their in-memory
    models exactly.  The single-scenario tests above pin each property
    once; this pins their interaction."""
    import random

    from setup_harvest_action_spark.sources.manifest_sink import (
        compact,
        delete_where,
    )

    rng = random.Random(20260815)
    p = str(tmp_path)
    main: list[int] = list(range(5))
    _write(_df(sink, 0, 5), p, "overwrite")
    next_id = 5
    branches: dict[str, list[int]] = {}
    publishable: dict[str, bool] = {}  # False once main advanced past base
    tags: dict[str, list[int]] = {}
    n_refs = 0

    def check():
        assert sorted(
            r.id for r in scan_manifest(sink, p).collect()
        ) == sorted(main)
        for b, ids in branches.items():
            assert sorted(
                r.id for r in refs.scan_ref(sink, p, b).collect()
            ) == sorted(ids), b
        for t, ids in tags.items():
            assert refs.scan_ref(sink, p, t).count() == len(ids), t

    def main_moved():
        for b in publishable:
            publishable[b] = False

    for _ in range(40):
        op = rng.choice(
            ["append", "append", "tag", "branch", "branch_append",
             "branch_append", "publish", "delete", "compact", "vacuum"]
        )
        if op == "append":
            n = rng.randint(1, 8)
            _write(_df(sink, next_id, next_id + n), p)
            main.extend(range(next_id, next_id + n))
            next_id += n
            main_moved()
        elif op == "tag":
            n_refs += 1
            name = f"tag{n_refs}"
            refs.create_tag(p, name)
            tags[name] = list(main)
        elif op == "branch":
            n_refs += 1
            name = f"br{n_refs}"
            refs.create_branch(p, name)
            branches[name] = list(main)
            publishable[name] = True
        elif op == "branch_append" and branches:
            b = rng.choice(sorted(branches))
            n = rng.randint(1, 6)
            refs.append_to_branch(_df(sink, next_id, next_id + n), p, b)
            branches[b].extend(range(next_id, next_id + n))
            next_id += n
        elif op == "publish" and branches:
            b = rng.choice(sorted(branches))
            if publishable[b]:
                before = read_manifest(p)["version"]
                refs.fast_forward(p, b)
                main = list(branches[b])
                if read_manifest(p)["version"] != before:
                    # a real pointer move: every OTHER branch's base is
                    # no longer an ancestor of main — unpublishable
                    for other in publishable:
                        if other != b:
                            publishable[other] = False
            else:
                if branches[b] != main:
                    with pytest.raises(CommitConflict):
                        refs.fast_forward(p, b)
                    refs.delete_ref(p, b)
                    del branches[b], publishable[b]
        elif op == "delete" and main:
            victim = rng.choice(main)
            delete_where(sink, p, [("id", "=", victim)])
            main = [x for x in main if x != victim]
            main_moved()
        elif op == "compact" and main:
            compact(sink, p, rng.randint(1, 3))
            main_moved()
        elif op == "vacuum":
            vacuum_manifest(p, keep_last=rng.randint(1, 3))
        check()
    assert branches or tags, "seed never created a ref; pick another"
    check()


def test_wap_catalog_query_registered(sink, sf_dir):
    from setup_harvest_action_spark.catalog import load_catalog

    queries, oracles = load_catalog()
    assert "q_source_manifest_wap" in oracles
    n = queries["q_source_manifest_wap"](sink, sf_dir).count()
    assert n == 150  # sf0.001 customer rowcount


def test_stream_append_to_branch_is_invisible_until_publish(
    sink, tmp_path
):
    """Streaming WAP: micro-batches land on the branch only; main is
    untouched until fast-forward."""
    import pyspark.sql.functions as F

    p = str(tmp_path / "t")
    src = str(tmp_path / "src")
    _write(_df(sink, 0, 5), p, "overwrite")
    refs.create_branch(p, "stg")
    sink.range(5, 20).selectExpr("id", "id * 10 AS val").write.parquet(src)
    stream = sink.readStream.schema("id long, val long").parquet(src)
    q = refs.stream_append_to_branch(
        stream, p, "stg", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert scan_manifest(sink, p).count() == 5  # main untouched
    assert refs.scan_ref(sink, p, "stg").count() == 20
    refs.fast_forward(p, "stg")
    assert scan_manifest(sink, p).count() == 20


def test_timestamp_time_travel_and_auto_compact(sink, tmp_path):
    import time

    from setup_harvest_action_spark.sources.manifest_sink import (
        auto_compact,
        read_manifest,
        version_at_timestamp,
    )

    p = str(tmp_path / "t")
    _write(_df(sink, 0, 5).coalesce(1), p, "overwrite")  # v1: 1 file
    t_after_v1 = time.time()
    time.sleep(0.05)
    _write(_df(sink, 5, 8).coalesce(1), p)  # v2: 1 file
    _write(_df(sink, 8, 9).coalesce(1), p)  # v3: 1 file
    assert version_at_timestamp(p, t_after_v1) == 1
    assert version_at_timestamp(p, time.time()) == 3
    with pytest.raises(ValueError, match="no retained commit"):
        version_at_timestamp(p, t_after_v1 - 3600)
    v = version_at_timestamp(p, t_after_v1)
    assert scan_manifest(sink, p, version=v).count() == 5

    # auto-compact: only sub-threshold files rewrite; the big file's
    # bytes stay untouched on disk
    import os

    before = read_manifest(p)
    assert len(before["files"]) == 3
    big = max(before["files"], key=lambda e: e["bytes"])
    # threshold placed just above the two smaller files
    others = sorted(e["bytes"] for e in before["files"])[:-1]
    assert all(b < big["bytes"] for b in others)
    after = auto_compact(sink, p, small_bytes=big["bytes"], n_parts=1)
    assert scan_manifest(sink, p).count() == 9
    names = {e["file"] for e in after["files"]}
    assert big["file"] in names  # carried over, not rewritten
    assert len(after["files"]) == 2  # big + one fresh part
    assert os.path.getsize(os.path.join(p, big["file"])) == big["bytes"]
    # idempotent: nothing small left, second call is a no-op
    again = auto_compact(sink, p, small_bytes=big["bytes"])
    assert again["version"] == after["version"]


def test_concurrent_branch_appends_serialize_without_loss(sink, tmp_path):
    """Two ACTUAL threads race append_to_branch on one branch (no
    expected_head, so both must commit): the O_EXCL lock serializes
    the metadata transitions and the final branch content is the
    exact union — no lost update, no duplicate version."""
    import threading

    p = str(tmp_path)
    _write(_df(sink, 0, 5), p, "overwrite")
    refs.create_branch(p, "b")
    errs = []

    def worker(lo, hi):
        try:
            refs.append_to_branch(_df(sink, lo, hi), p, "b")
        except Exception as e:  # noqa: BLE001 — surface in the assert
            errs.append(e)

    ts = [
        threading.Thread(target=worker, args=(5, 12)),
        threading.Thread(target=worker, args=(12, 20)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = sorted(r.id for r in refs.scan_ref(sink, p, "b").collect())
    assert got == list(range(20))
    head = refs.resolve_ref(p, "b")
    assert head["parent"] is not None  # two chained commits, one head
