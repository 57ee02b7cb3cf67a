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
