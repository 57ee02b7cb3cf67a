"""Multi-round crawl loop (functions/webgraph.py, r16): novelty must
actually flow between rounds, the crawled set must be monotone (no URL
is frontier twice), and per-host policies shape every round."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_round2_frontier_differs_and_crawled_is_monotone(spark):
    from setup_harvest_action_spark.functions.webgraph import (
        CRAWL_ROUNDS,
        FRONTIER_PER_HOST,
        crawl_rounds,
    )

    rows = crawl_rounds(spark, SF).collect()
    by_round: dict[int, set[str]] = {}
    for r in rows:
        by_round.setdefault(r["round"], set()).add(r["url"])
    assert set(by_round) == set(range(1, CRAWL_ROUNDS + 1))
    # novelty flows: round 2 fetched different pages than round 1
    assert by_round[2] and by_round[2] != by_round[1]
    # a URL is frontier exactly once across the whole crawl
    all_urls = [r["url"] for r in rows]
    assert len(all_urls) == len(set(all_urls))
    # politeness cap holds per (round, host)
    per = {}
    for r in rows:
        per[(r["round"], r["host"])] = per.get((r["round"], r["host"]), 0) + 1
    assert max(per.values()) <= FRONTIER_PER_HOST
    # host4 blocks everything; host1's own-group rules admit non-/doc/1*
    hosts = {r["host"] for r in rows}
    assert "host4" not in hosts
    assert not any(
        r["host"] == "host1" and "/doc/1" in r["url"] for r in rows
    )


def test_stream_crawl_ingest_rerun_commits_nothing(spark, tmp_path):
    """r16 streaming twin: drain seeds → edge table versions advance;
    a checkpoint re-run with no new seed files commits NOTHING, and
    the stored edges equal the batch extractor over the same seeds."""
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.functions.webgraph import (
        CRAWL_SEED_MOD,
        GRAPH_DOCS,
        crawl_stream_ingest,
        edges_of_pages,
    )
    from setup_harvest_action_spark.io.loaders import load_table
    from setup_harvest_action_spark.sources.manifest_sink import (
        read_manifest,
    )

    base = str(tmp_path / "stream_ingest")
    got = crawl_stream_ingest(spark, SF, base)
    stored = {(r["src"], r["dst"]) for r in got.collect()}
    docs = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < GRAPH_DOCS)
        .filter(F.col("doc_id") % CRAWL_SEED_MOD == 0)
        .select("doc_id", "text", "lang")
    )
    want = {
        (r["src"], r["dst"]) for r in edges_of_pages(docs).collect()
    }
    assert stored == want and stored
    v1 = read_manifest(base + "/edges")["version"]
    assert v1 >= 4  # empty-table init + 3 keyed merges (3 seed files)
    got2 = crawl_stream_ingest(spark, SF, base)
    assert read_manifest(base + "/edges")["version"] == v1  # no commit
    assert {(r["src"], r["dst"]) for r in got2.collect()} == want


def test_budget_caps_diverge_by_delay(spark):
    """r17: the time-budget composition — host5 (Crawl-delay 10s) gets
    at most floor(20/10)=2 fetches per round while host6 (0.5s) may
    take up to 40; host1's decoy '*'-group delay (99s) must NOT leak
    (its own group declares none -> default 1s -> cap 20)."""
    from setup_harvest_action_spark.functions.webgraph import (
        CRAWL_ROUND_BUDGET_SEC,
        budget_caps,
        q_pipeline_crawl_budget,
    )

    caps = budget_caps()
    assert caps["host5"] == 2 and caps["host6"] == 40
    assert caps["host1"] == 20  # decoy delay did not leak
    rows = q_pipeline_crawl_budget(spark, SF).collect()
    per: dict[tuple[int, str], int] = {}
    for r in rows:
        assert r["rank"] <= r["host_cap"]
        per[(r["round"], r["host"])] = per.get((r["round"], r["host"]), 0) + 1
    for (rnd, host), n in per.items():
        assert n <= caps.get(host, int(CRAWL_ROUND_BUDGET_SEC)), (rnd, host)
    # divergence is visible in the data: some host exceeds the old
    # constant cap of 5 while host5 never exceeds 2
    assert any(
        n > 5 for (rnd, h), n in per.items() if h != "host5"
    )
    assert all(n <= 2 for (rnd, h), n in per.items() if h == "host5")


def test_stream_crawl_loop_matches_batch_and_rerun_commits_nothing(
    spark, tmp_path
):
    """r17 (tick re-shaped r18): the closed streaming loop — stored
    frontier table equals the batch loop's output from the same
    seeds; the edge table holds exactly the edges of every page that
    entered the stream; crawled = the self-URLs of exactly those
    pages (seeds ∪ host-matched frontier targets — written only by
    the exactly-once stream side; dangling frontier URLs are excluded
    from admission by their own frontier rows, not by a second
    scheduler commit); and a re-entry over the same checkpoint
    commits NOTHING to any of the three tables."""
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.functions.webgraph import (
        CRAWL_SEED_MOD,
        GRAPH_DOCS,
        _HOSTS,
        crawl_rounds,
        crawl_stream_loop,
        edges_of_pages,
    )
    from setup_harvest_action_spark.io.loaders import load_table
    from setup_harvest_action_spark.sources.manifest_sink import (
        read_manifest,
        scan_manifest,
    )

    base = str(tmp_path / "stream_loop")
    got = crawl_stream_loop(spark, SF, base)
    stream_rows = {
        (r["round"], r["host"], r["url"], r["rank"]) for r in got.collect()
    }
    batch_rows = {
        (r["round"], r["host"], r["url"], r["rank"])
        for r in crawl_rounds(spark, SF).collect()
    }
    assert stream_rows == batch_rows and stream_rows

    docs = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < GRAPH_DOCS)
        .select("doc_id", "text", "lang")
    )
    arrived = spark.read.parquet(base + "/arrivals").select("doc_id")
    fetched = docs.join(arrived, "doc_id", "left_semi")
    want_edges = {
        (r["src"], r["dst"]) for r in edges_of_pages(fetched).collect()
    }
    got_edges = {
        (r["src"], r["dst"])
        for r in scan_manifest(spark, base + "/edges").collect()
    }
    assert got_edges == want_edges

    self_urls = {
        f"https://host{d % _HOSTS}.example/doc/{d}"
        for d in range(0, GRAPH_DOCS, CRAWL_SEED_MOD)
    }
    want_crawled = self_urls | {
        u
        for (rnd, _, u, _) in stream_rows
        # host-matched targets actually fetch; the final round's
        # frontier is never fetched (its targets don't re-enter)
        if rnd < max(r for (r, _, _, _) in stream_rows)
        and u[12] == str(int(u.rsplit("/", 1)[1]) % _HOSTS)
    }
    got_crawled = {
        r["url"] for r in scan_manifest(spark, base + "/crawled").collect()
    }
    assert got_crawled == want_crawled

    versions = {
        t: read_manifest(f"{base}/{t}")["version"]
        for t in ("edges", "crawled", "frontier")
    }
    got2 = crawl_stream_loop(spark, SF, base)
    assert {
        (r["round"], r["host"], r["url"], r["rank"]) for r in got2.collect()
    } == stream_rows
    for t, v in versions.items():
        assert read_manifest(f"{base}/{t}")["version"] == v, t


def test_stream_crawl_loop_resumes_after_crash_at_the_commit_boundary(
    spark, tmp_path
):
    """r18 (the r17 verdict's #5): the scheduler tick is ONE
    versioned commit — the frontier merge — so the worst crash point
    is immediately after it, with that round's arrivals not yet
    written and its fetches not yet merged.  A run bounded at
    rounds=1 halts in EXACTLY that state (round-1 frontier committed,
    nothing else); re-entering with the full bound must reconcile the
    arrivals from the committed frontier and converge to a stored
    state identical to an uninterrupted full run — no repair step, no
    duplicated rows, no renumbered rounds."""
    from setup_harvest_action_spark.functions.webgraph import (
        CRAWL_ROUNDS,
        crawl_stream_loop,
    )
    from setup_harvest_action_spark.sources.manifest_sink import (
        scan_manifest,
    )

    crashed = str(tmp_path / "crashed")
    crawl_stream_loop(spark, SF, crashed, rounds=1)
    # the crash-equivalent state: a committed round-1 frontier whose
    # targets never reached the arrivals directory
    f1 = scan_manifest(spark, crashed + "/frontier")
    assert f1.filter("round = 1").count() > 0
    arrived = {
        r["doc_id"]
        for r in spark.read.parquet(crashed + "/arrivals").collect()
    }
    committed = {
        int(r["url"].rsplit("/", 1)[1])
        for r in f1.filter("round = 1").collect()
        # host-matched targets are the ones a fetch would deliver
        if r["url"][12] == str(int(r["url"].rsplit("/", 1)[1]) % 7)
    }
    assert committed and not (arrived & committed)

    resumed = {
        (r["round"], r["host"], r["url"], r["rank"])
        for r in crawl_stream_loop(
            spark, SF, crashed, rounds=CRAWL_ROUNDS
        ).collect()
    }
    clean_base = str(tmp_path / "clean")
    clean = {
        (r["round"], r["host"], r["url"], r["rank"])
        for r in crawl_stream_loop(
            spark, SF, clean_base, rounds=CRAWL_ROUNDS
        ).collect()
    }
    assert resumed == clean and resumed
    for t in ("edges", "crawled"):
        assert {
            tuple(r) for r in scan_manifest(spark, crashed + "/" + t).collect()
        } == {
            tuple(r)
            for r in scan_manifest(spark, clean_base + "/" + t).collect()
        }, t
