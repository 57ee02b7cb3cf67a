"""BPE tokenizer: hand-checkable merges, non-overlap semantics, and
the map-only-encode plan pin."""

from __future__ import annotations

from setup_harvest_action_spark.functions.tokenizer import (
    bpe_segment,
    train_bpe,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_bpe_hand_checked_merges(spark):
    # Classic BPE example: 'lo' dominates, then 'low'.
    docs = _docs(spark, ["low low low lower lowest", "low lower"])
    merges = [m.collect()[0] for m in train_bpe(spark, docs, n_merges=2)]
    assert (merges[0].p1, merges[0].p2, merges[0].merged) == ("l", "o", "lo")
    assert merges[0].pair_count == 7  # every word starts with 'lo'
    assert (merges[1].p1, merges[1].p2, merges[1].merged) == ("lo", "w", "low")
    assert merges[1].pair_count == 7


def test_merge_replace_is_left_to_right_non_overlapping(spark):
    # 'aaaa' + merge (a,a) must become [aa, aa], never [aa, a, a] or
    # an overlapped [a, aa, a].
    docs = _docs(spark, ["aaaa aaaa"])
    merges = train_bpe(spark, docs, n_merges=1)
    row = merges[0].collect()[0]
    assert (row.p1, row.p2) == ("a", "a")
    seg = bpe_segment(docs, merges).collect()[0]
    assert seg.reprs == ["~aa~~aa~", "~aa~~aa~"]


def test_deterministic_tie_break_smallest_pair_wins(spark):
    # 'ab' and 'cd' both occur once; (a,b) < (c,d) lexicographically.
    docs = _docs(spark, ["ab cd"])
    row = train_bpe(spark, docs, n_merges=1)[0].collect()[0]
    assert (row.p1, row.p2, row.pair_count) == ("a", "b", 1)


def test_encode_preserves_characters_and_compresses(spark, sf_dir):
    from setup_harvest_action_spark.catalog import load_catalog

    queries, _ = load_catalog()
    rows = queries["q_text_bpe_encode"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # merging never splits: words <= bpe tokens <= chars
        assert r.n_words <= r.n_bpe_tokens
        assert r.chars_per_bpe_token >= 1.0


def test_encode_plan_is_map_only(spark, sf_dir):
    """After training (materialized one-row merge scans), encoding a
    corpus must not shuffle: the plan may contain broadcast exchanges
    for the merge rows but no shuffle exchange at any corpus size."""
    from setup_harvest_action_spark.catalog import load_catalog

    queries, _ = load_catalog()
    df = queries["q_text_bpe_encode"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    for line in plan.splitlines():
        assert "ShuffleExchange" not in line and "Exchange hashpartitioning" not in line, line
