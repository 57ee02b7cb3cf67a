"""Gopher quality rules (functions/quality.py): measurement semantics
(bullet stripping, ellipsis detection at line ends and inside words,
stop words under punctuation, threshold boundaries) pinned
independently of the catalog oracle's arithmetic replay."""

from __future__ import annotations

from setup_harvest_action_spark.functions.quality import (
    gopher_metrics,
    gopher_pass,
    synthesize_structured_doc,
)


def test_metrics_on_handcrafted_doc():
    doc = (
        "• the quick brown fox of note\n"
        "plain line with and inside here...\n"
        "- another bullet line a word\n"
        "numbers 101 102 finish"
    )
    m = gopher_metrics(doc)
    assert m["n_lines"] == 4
    assert m["bullet_frac"] == 2 / 4
    assert m["ellipsis_frac"] == 1 / 4
    # bullets stripped before word metrics: '•'/'-' are not words
    assert m["n_words"] == 21
    assert m["symbol_ratio"] == 1 / 21  # the one '...' (inside a word)
    assert m["alpha_frac"] == 19 / 21  # 101, 102 non-alphabetic
    # 'the', 'of', 'and', 'a' count; 'here...' strips to 'here' (no)
    assert m["stop_count"] == 4


def test_stopword_counts_through_trailing_ellipsis():
    m = gopher_metrics("word the...\nmore a… text")
    assert m["stop_count"] == 2  # 'the...' and 'a…' both count


def test_threshold_boundaries():
    base = {
        "n_words": 50, "n_lines": 10, "mean_word_len": 3.0,
        "symbol_ratio": 0.1, "bullet_frac": 0.9, "ellipsis_frac": 0.3,
        "alpha_frac": 0.8, "stop_count": 2,
    }
    assert gopher_pass(base)  # every rule inclusive at its boundary
    for k, bad in [
        ("n_words", 49), ("n_words", 100_001), ("mean_word_len", 2.9),
        ("mean_word_len", 10.1), ("symbol_ratio", 0.11),
        ("bullet_frac", 0.91), ("ellipsis_frac", 0.31),
        ("alpha_frac", 0.79), ("stop_count", 1),
    ]:
        m = dict(base)
        m[k] = bad
        assert not gopher_pass(m), (k, bad)


def test_structured_doc_variants_are_deterministic():
    text = "alpha beta gamma delta " * 20  # 80 raw words
    for d in range(8):
        assert synthesize_structured_doc(d, text) == \
            synthesize_structured_doc(d, text)
    # all-bullet variant bullets EVERY line; some-bullet every 5th
    all_b = synthesize_structured_doc(5, text).split("\n")
    assert all(ln.startswith("• ") for ln in all_b)
    some_b = synthesize_structured_doc(1, text).split("\n")
    assert [i for i, ln in enumerate(some_b) if ln.startswith("• ")] \
        == [0, 5]
    # ellipsis variant marks every 3rd line, appended to the last word
    ell = synthesize_structured_doc(2, text).split("\n")
    assert [i for i, ln in enumerate(ell) if ln.endswith("...")] \
        == [2, 5, 8]
    # numeric variants append ONE extra line
    assert len(synthesize_structured_doc(3, text).split("\n")) == 11
    assert synthesize_structured_doc(7, text).split("\n")[-1] \
        == "100 101 102"


def test_numeric_words_stay_three_chars_beyond_900_words():
    """ADVICE r15 (low): the catalog oracle computes sum_len as
    sum_raw + 3*n_num — every injected numeric word must be exactly
    3 chars for ANY document length, including fixtures longer than
    900 raw words where str(100+i) would reach 4 digits."""
    text = "word " * 1000  # 1000 raw words, doc_id % 8 == 3 appends 1000
    nums = synthesize_structured_doc(3, text).split("\n")[-1].split()
    assert len(nums) == 1000
    assert all(len(w) == 3 and w.isdigit() for w in nums)
    # the wrap is deterministic: 100..999 then 100 again
    assert nums[899] == "999" and nums[900] == "100"


def test_empty_and_degenerate_docs_do_not_raise():
    for doc in ("", "\n", "•", "..."):
        m = gopher_metrics(doc)
        assert isinstance(gopher_pass(m), bool)


# --- C4 cleaning ---------------------------------------------------------------


def test_c4_clean_semantics():
    from setup_harvest_action_spark.functions.quality import c4_clean

    doc = (
        "first full sentence with enough words here.\n"
        "no terminal punctuation on this line\n"
        "second full sentence with enough words too!\n"
        "short line.\n"
        "third full sentence keeps the document alive?\n"
    )
    r = c4_clean(doc)
    assert r["n_lines_in"] == 6  # trailing \n yields an empty line
    assert r["n_lines_kept"] == 3
    assert not r["doc_dropped"]
    assert r["clean_text"].count("\n") == 2

    assert c4_clean("Lorem Ipsum dolor sit amet.")["drop_reason"] == \
        "lorem_ipsum"  # case-insensitive
    assert c4_clean("int main() { return 0; }")["drop_reason"] == "brace"
    two = (
        "one full sentence with enough words here.\n"
        "two full sentence with enough words here."
    )
    assert c4_clean(two)["drop_reason"] == "min_sentences"
    assert c4_clean(two)["clean_text"] is None
    assert c4_clean("")["doc_dropped"]


def test_c4_structured_doc_variants():
    from setup_harvest_action_spark.functions.quality import (
        synthesize_c4_doc,
    )

    text = "alpha beta gamma delta " * 20  # 80 words = 10 base lines
    plain = synthesize_c4_doc(0, text).split("\n")
    assert len(plain) == 10
    # every 4th line lacks terminal punctuation
    assert [i for i, ln in enumerate(plain) if not ln.endswith(".")] \
        == [3, 7]
    assert synthesize_c4_doc(4, text).split("\n")[-1] \
        == "lorem ipsum dolor sit amet."
    assert synthesize_c4_doc(7, text).split("\n")[-1] == "function() {"
    assert synthesize_c4_doc(1, text).split("\n")[-1] == "too short."
