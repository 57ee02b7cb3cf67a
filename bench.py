"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as ent
from setup_harvest_action_spark.session import DEFAULT_SF_DIR, get_spark

# Headline set: the flagship read path plus the heaviest per-category
# operators.  Anything not listed still runs in the driver's t2 gate;
# this set is the perf feedback loop.  The first five are the round-1
# anchor set (comparable across rounds); the rest cover the join,
# window, and LLM-pipeline surfaces added in round 2.
HEADLINE = [
    "q_harvest_read_path",
    "q_pricing_summary",
    "q_revenue_by_nation",
    "q_rollup_order_stats",
    "q_count_distinct_members",
    "q_join_asof",
    "q_window_topk_per_group",
    "q_text_tfidf",
    "q_dedup_ngram_jaccard",
    "q_similarity_exact_topk",
    # round 3: regression numbers for the streaming and LSH paths
    "q_stream_tumbling_counts",
    "q_dedup_minhash",
    # round 3 additions: map-only quality gate, iterative PageRank,
    # batch sessionization
    "q_quality_repetition",
    "q_graph_pagerank",
    "q_events_sessionize",
    "q_events_cohort_retention",
    "q_scd2_customer_segment",
    # round 6: the round-5 additions now carry driver rows — rotate the
    # heaviest per-family representatives into the headline (BENCHNOTES
    # r5 plan): iterative clustering, cluster-bounded semantic dedup,
    # mergeable sketch rollup, the TPC-H Q3/Q18 composite shapes, and
    # the WindowGroupLimit-pinned source cap.
    "q_embedding_kmeans",
    "q_dedup_semantic",
    "q_agg_hll_partitioned",
    "q_shipping_priority",
    "q_large_orders",
    "q_sample_source_cap",
    # round 7: the r6 heavy additions now carry driver rows — rotate in
    # the per-family heavyweights (BENCHNOTES r6 plan): degree-oriented
    # triangle counting, the fuzzy edit-distance pipeline and its
    # entity-resolution composition (both de-broadcast this round — the
    # numbers pin the shuffle-keyed block join), and the O(n)
    # descending-frame linear interpolation.
    "q_graph_triangle_count",
    "q_dedup_fuzzy_edit",
    "q_pipeline_entity_resolution",
    "q_events_resample_interp",
    # round 9: next heavy tier (BENCHNOTES r7 plan #5) — the r7-late
    # additions now carry r9 driver rows: directed containment and the
    # stride-1 substring-span index (the two biggest inverted-index
    # explodes after ngram), the chi-square contingency aggregate, and
    # the streaming trending top-k (agg-then-foreachBatch).
    "q_dedup_containment",
    "q_dedup_substring_spans",
    "q_agg_chi_square",
    "q_stream_trending_topk",
    # round 10: the r9 additions carried driver rows in r9 — rotate in
    # per the BENCHNOTES r10 plan: the winnowing sampled index (benched
    # BESIDE substring_spans to pin the 1/8-shuffle trade round over
    # round) and the bigram LM, the heaviest text query.
    "q_dedup_winnowing",
    "q_text_lm_bigram_score",
    # round 11 (BENCHNOTES r11 plan): label propagation — the graph
    # family's heaviest query after the one-scan co-purchase pair
    # builder rewrite (13.2 → 5.4s solo in r10) — and the national-
    # market-share TPC-H Q8 composite (two-fact join + conditional
    # share aggregate), the heaviest of the 15 shapes that completed
    # the 22-query spec set.
    "q_graph_label_propagation",
    "q_national_market_share",
    # round 12 (VERDICT r11 #6): price the stored-ANN path as a measured
    # number — the inline PQ-ADC (refits + re-encodes the corpus every
    # query) BESIDE the stored index query (build 3/4 + O(batch) append
    # + scan-only search).  The stored row bills the whole lifecycle;
    # the search-only split (the steady-state cost the index exists to
    # buy) is the BENCHNOTES r12 A/B.
    "q_similarity_pq_adc",
    "q_similarity_pq_adc_stored",
    # round 13 (VERDICT r12 #3): price ONE decode pipeline round-over-
    # round so the ~6k-line codec surface shows an Arrow-batching or
    # plan regression as wall-clock, not as a judge's plan-read.  The
    # lossy-VP8 pipeline is the heaviest decode path (full RFC 6386
    # reconstruction per doc).
    "q_multimodal_webp_lossy_pipeline",
    # round 14: price the ANIMATION surface (frame loop + disposal/
    # blend compositing over the existing decoders) the same way —
    # the GIF pipeline decodes 5 frames/doc through LZW + the full
    # GIF89a disposal model.
    "q_multimodal_gif_anim_pipeline",
    # round 15: price the crawl-ingest surface round-over-round —
    # the PDF pipeline now spans BOTH file layouts (1.4 xref tables /
    # 1.5 xref+object streams) plus the ToUnicode composite-font path;
    # the charset funnel adds the bytes→unicode layer (WARC → HTTP
    # headers → WHATWG sniff → legacy-codec decode → extraction); the
    # crawl PageRank prices the extract→resolve→canonicalize→graph
    # composition including its edge-table materialization cut.
    "q_multimodal_pdf_pipeline",
    "q_pipeline_charset_decode",
    "q_graph_crawl_pagerank",
    # round 16: price the crawl LOOP and its output leg — the
    # multi-round frontier (3 rounds of fetch→extract→frontier with
    # per-round materialization cuts, host-keyed robots broadcast
    # join, politeness WindowGroupLimit) and the WET roundtrip
    # (warc.gz → extract → wet.gz → parse back), the two r16 ingest
    # compositions.
    "q_pipeline_crawl_rounds",
    "q_pipeline_wet_roundtrip",
    # round 17: price the archive-realism legs — the four-coding
    # capture (identity/gzip/chunked/composed: dechunk + gunzip before
    # the charset funnel, 4 records per page) and the revisit recrawl
    # (two rounds, digest compute + resolution) are both map-only over
    # the fixed 300-doc WARC fixture; the budgeted crawl loop prices
    # the per-host cap when-chain beside q_pipeline_crawl_rounds'
    # constant cap.  The closed STREAMING loop (q_stream_crawl_loop)
    # stays out of the headline: its wall-clock is 4 availableNow
    # drains + ~14 keyed-merge commits of scheduler fixed cost —
    # pricing the sandbox's streaming overhead, not a plan; its
    # correctness gate is the driver row + the batch-equivalence pin.
    "q_pipeline_warc_content_codings",
    "q_pipeline_warc_revisit",
    "q_pipeline_crawl_budget",
]


RUNS = 3  # timed passes per query; reported figure is the median


def _materialize(df) -> None:
    """Force full evaluation of every output column.

    ``df.count()`` lets Catalyst prune unreferenced aggregate
    expressions (a count over q_pricing_summary can drop the sums), so
    timings would under-measure.  The noop sink consumes every column
    of every row with zero write cost.
    """
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    # The bench runs the PRODUCTION sketch-hash spelling (xxhash64 —
    # pure JVM, no hex round-trip); the md5 spelling exists for the
    # DuckDB oracle path, which the driver gate exercises separately.
    # Spelling equivalence on the fixture is pinned by
    # tests/test_hash_spellings.py.  setdefault so an explicit
    # SPARK_GRAFT_SKETCH_HASH=md5 can still A/B the oracle spelling.
    os.environ.setdefault("SPARK_GRAFT_SKETCH_HASH", "xxhash64")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    queries = ent.queries()
    names = [n for n in HEADLINE if n in queries] or sorted(queries)

    # JVM/codegen warmup on a trivial job so q1 doesn't pay session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    # r14 methodology (VERDICT r13 #4 — tame the instrument, not just
    # report it): timed repeats are INTERLEAVED as whole passes over
    # the query list instead of back-to-back per query, so an external
    # load spike lands in ONE pass (one run per query) rather than in
    # all repeats of whichever queries were executing.  The 1-minute
    # load average is recorded at each pass start; a pass whose load
    # exceeds the quietest pass by more than LOAD_SPIKE_DELTA is
    # dropped from every query's median (raw runs and loads stay in
    # the JSON), and median-of-3 already absorbs a single spiked run
    # even when the load column misses it.
    LOAD_SPIKE_DELTA = 8.0  # 1-min load over quietest pass ⇒ spiked

    # Cold pass (untimed): parquet footer reads, plan compilation,
    # codegen — fixed costs billed once per session, not per query.
    for name in names:
        _materialize(queries[name](spark, sf_dir))

    raw: dict[str, list] = {name: [] for name in names}
    pass_loads: list[float] = []
    for _ in range(RUNS):
        pass_loads.append(round(os.getloadavg()[0], 2))
        for name in names:
            t0 = time.time()
            _materialize(queries[name](spark, sf_dir))
            raw[name].append(round(time.time() - t0, 3))

    quiet = min(pass_loads)
    spiked = [
        i for i, l in enumerate(pass_loads) if l - quiet > LOAD_SPIKE_DELTA
    ]
    keep_idx = [i for i in range(RUNS) if i not in spiked] or list(
        range(RUNS)
    )

    timings: dict[str, float] = {}
    spread_pct: dict[str, float] = {}
    for name in names:
        runs = [raw[name][i] for i in keep_idx]
        med = sorted(runs)[len(runs) // 2]
        timings[name] = med
        # per-query spread makes round-over-round deltas readable:
        # a delta inside the query's own spread is noise, not a plan
        # change (BENCHNOTES r13 methodology; spread is over KEPT runs)
        spread_pct[name] = round(100.0 * (max(runs) - min(runs)) / med, 1)
        print(f"# {name}: median {timings[name]}s over passes {keep_idx} "
              f"(raw: {raw[name]})", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread_pct": spread_pct,
                "raw_runs": raw,
                "load_1m": pass_loads,
                "dropped_passes": spiked,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
