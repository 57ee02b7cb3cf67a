"""Quality/safety operator tests: exact values on hand-built corpora
plus plan-shape checks for the broadcast contracts
(functions/quality.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from setup_harvest_action_spark.catalog import load_catalog
from setup_harvest_action_spark.functions.quality import (
    DECONTAM_MIN_SHARED,
    PII_PATTERN,
    REDACTION,
    ngrams,
)


@pytest.fixture(scope="module")
def queries():
    return load_catalog()[0]


def test_ngrams_counts_and_edges(spark):
    """n-gram construction: len-n+1 grams in order; short arrays give
    an empty list (the sequence() descending-range trap is guarded)."""
    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "d"]), (2, ["x"]), (3, [])],
        "id int, toks array<string>",
    )
    out = {
        r["id"]: r["g"]
        for r in df.select("id", ngrams(F.col("toks"), 3).alias("g")).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []
    assert out[3] == []


def test_repetition_metrics_exact(spark, monkeypatch):
    """dup_token_frac and top_bigram_frac on a document with known
    repetition: 'x y x y x y' has 6 tokens, 2 distinct, 5 bigrams of
    which 'x y' appears 3 times."""
    import setup_harvest_action_spark.functions.quality as qual

    docs = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b c d e f")],
        "doc_id int, text string",
    )
    monkeypatch.setattr(
        qual, "load_table", lambda spark, sf_dir, name: docs
    )
    rows = {r["doc_id"]: r for r in qual.q_quality_repetition(spark, "").collect()}
    r1, r2 = rows[1], rows[2]
    assert r1["n_tokens"] == 6
    assert r1["dup_token_frac"] == pytest.approx(1 - 2 / 6, abs=1e-4)
    assert r1["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-4)
    assert not r1["keep"]
    assert r2["dup_token_frac"] == 0.0
    assert r2["top_bigram_frac"] == pytest.approx(1 / 5, abs=1e-4)


def test_pii_redaction_patterns(spark):
    """Every alternation arm fires: email, phone tail, sensitive term;
    clean text passes through untouched."""
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and call 555-1234 now"),
            (2, "the customer met a supplier"),
            (3, "nothing sensitive here"),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.regexp_count("text", F.lit(PII_PATTERN)).alias("n"),
            F.regexp_replace("text", PII_PATTERN, REDACTION).alias("red"),
        ).collect()
    }
    assert out[1]["n"] == 2
    assert out[1]["red"] == f"mail {REDACTION} and call {REDACTION} now"
    assert out[2]["n"] == 2
    assert out[3]["n"] == 0
    assert out[3]["red"] == "nothing sensitive here"


def test_decontaminate_overlap_exact(spark, monkeypatch):
    """A corpus doc sharing exactly the benchmark's trigrams is
    flagged with the right shared count; disjoint docs don't appear."""
    import setup_harvest_action_spark.functions.quality as qual

    bench_text = "q w e r t y"  # doc_id 0 -> benchmark (0 % 97 == 0)
    docs = spark.createDataFrame(
        [
            (0, bench_text),
            (1, "q w e r zz yy"),  # shares 'q w e' and 'w e r'
            (2, "totally disjoint words here"),
        ],
        "doc_id int, text string",
    )
    monkeypatch.setattr(qual, "load_table", lambda spark, sf_dir, name: docs)
    rows = {r["doc_id"]: r for r in qual.q_quality_decontaminate(spark, "").collect()}
    assert set(rows) == {1}
    assert rows[1]["n_shared"] == 2
    assert rows[1]["contaminated"] == (2 >= DECONTAM_MIN_SHARED)


def test_embedding_outliers_ranks_known_outlier(spark, monkeypatch):
    """The planted far-away vector ranks first in its label and the
    distances follow from the hand-computed centroid."""
    import setup_harvest_action_spark.functions.quality as qual

    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0),
            (2, [2.0, 0.0], 0),
            (3, [10.0, 0.0], 0),  # centroid x = 4.0 -> dist 6.0
            (4, [1.0, 1.0], 1),
        ],
        "vec_id int, embedding array<float>, label int",
    )
    monkeypatch.setattr(qual, "load_table", lambda spark, sf_dir, name: emb)
    out = qual.q_embedding_outliers(spark, "").collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    top0 = sorted(by_label[0], key=lambda r: r["rk"])[0]
    assert top0["vec_id"] == 3
    assert top0["dist"] == pytest.approx(6.0, abs=1e-6)
    # singleton label: centroid is itself, distance 0
    assert by_label[1][0]["dist"] == 0.0


def test_decontaminate_broadcasts_benchmark(spark, queries):
    """The benchmark shingle side must be broadcast — a corpus-scale
    shuffle join here would defeat the design (the eval set is tiny at
    any corpus size)."""
    df = queries["q_quality_decontaminate"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_outliers_broadcasts_centroids(spark, queries):
    """Centroids (labels x dim rows) join the corpus side via
    broadcast; the vector table itself is never exploded for the
    distance computation."""
    df = queries["q_embedding_outliers"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_is_map_only(spark, queries):
    """All repetition metrics are computed inside the row (sorted-run
    counting instead of explode + GROUP BY) — the plan must contain no
    KEYED exchange and no aggregate.  r18: the input gains ONE
    round-robin spread exchange (io/parallelism.py — the per-row
    scoring is the heavy stage and otherwise ran single-task on the
    one-split fixture scan); that exchange moves rows unkeyed and
    unchanged, so the map-only property — nothing is ever grouped,
    joined, or exploded — still holds and is what this pin asserts."""
    df = queries["q_quality_repetition"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "HashAggregate" not in plan
    assert "Generate" not in plan
    assert "Join" not in plan
    # the ONE allowed exchange is the round-robin spread — any second
    # exchange (of any kind) is a regression this pin must catch
    assert plan.count("Exchange") == 1
    assert "roundrobinpartitioning" in plan.lower()


def test_compression_ratio_matches_direct_zlib(spark, queries):
    """The Arrow-optimized scalar UDF must produce exactly
    round(len(zlib.compress(utf8, 6)) / len(utf8), 6) — pinned by
    recomputing the per-(lang, verdict) aggregate from the raw fixture
    rows with direct zlib calls."""
    import zlib

    sf = "/root/testdata/sf0.001"
    got = {
        (r["lang"], r["verdict"]): (
            r["n_docs"],
            r["avg_ratio"],
            r["min_ratio"],
            r["max_ratio"],
        )
        for r in queries["q_quality_compression_ratio"](spark, sf).collect()
    }

    groups: dict = {}
    for row in spark.read.parquet(f"{sf}/documents.parquet").collect():
        raw = (row["text"] or "").encode("utf-8")
        if not raw:
            continue
        ratio = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        verdict = (
            "too_compressible"
            if ratio < 0.25
            else "incompressible" if ratio > 1.05 else "keep"
        )
        groups.setdefault((row["lang"], verdict), []).append(ratio)
    expected = {
        k: (
            len(v),
            round(sum(v) / len(v), 6),
            round(min(v), 6),
            round(max(v), 6),
        )
        for k, v in groups.items()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == expected[k][0], k
        for gi, ei in zip(got[k][1:], expected[k][1:]):
            assert gi == pytest.approx(ei, abs=2e-6), (k, got[k], expected[k])


def test_boilerplate_segments_roundtrip_and_invariants(spark, queries):
    """Untouched documents must round-trip exactly: a doc with zero
    boilerplate segments reassembles to the md5 of its own trimmed
    token-joined text (order restored by seg_idx).  At least one doc
    must actually lose segments on the fixture, and removed counts
    stay within [0, n_segments]."""
    import hashlib

    sf = "/root/testdata/sf0.001"
    rows = queries["q_quality_boilerplate_segments"](spark, sf).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert any(r["n_boilerplate"] > 0 for r in rows)
    clean = [r for r in rows if r["n_boilerplate"] == 0]
    assert clean
    for r in clean:
        toks = [t for t in docs[r["doc_id"]].split(" ") if t]
        expect = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert r["cleaned_md5"] == expect, r["doc_id"]
    for r in rows:
        assert 0 <= r["n_boilerplate"] <= r["n_segments"]


def test_boilerplate_segments_exact_on_handbuilt_corpus(spark, queries, tmp_path, monkeypatch):
    """Hand-built corpus with a known repeated segment: the 8-word
    banner appears in 3 docs (>= BOILERPLATE_MIN_DF) and must be
    stripped from all three; the unique tails survive."""
    import hashlib

    banner = "one two three four five six seven eight"
    rows = [
        (1, banner + " alpha beta"),
        (2, banner + " gamma delta"),
        (3, banner + " epsilon zeta"),
        (4, "totally unique words here nothing repeats at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in queries["q_quality_boilerplate_segments"](
            spark, str(tmp_path)
        ).collect()
    }
    for d, tail in ((1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")):
        assert out[d]["n_segments"] == 2
        assert out[d]["n_boilerplate"] == 1
        assert out[d]["cleaned_md5"] == hashlib.md5(tail.encode()).hexdigest()
    assert out[4]["n_boilerplate"] == 0
    assert out[4]["cleaned_md5"] == hashlib.md5(rows[3][1].encode()).hexdigest()


def test_expectation_suite_catches_each_violation_class(spark):
    """A suite that can only pass is not a check: corrupt one field per
    class and assert exactly the right expectation flips."""
    import datetime

    from setup_harvest_action_spark.functions.quality import (
        expectation_report,
    )

    d = datetime.datetime(2024, 1, 1)
    cols = ("l_orderkey long, l_linenumber int, l_quantity double, "
            "l_extendedprice double, l_discount double, "
            "l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp")
    good = [(1, 1, 5.0, 100.0, 0.05, "A", "O", d),
            (1, 2, 10.0, 200.0, 0.0, "N", "F", d)]
    orders = spark.createDataFrame([(1,)], "o_orderkey long")

    def report(rows, orders_df):
        li = spark.createDataFrame(rows, cols)
        got = expectation_report(li, orders_df).collect()
        return {r.check_name: r.passed for r in got}

    assert all(report(good, orders).values())

    bad = {
        "completeness_l_shipdate": [(1, 1, 5.0, 100.0, 0.0, "A", "O", None)],
        "unique_pk_orderkey_linenumber": good[:1] + good[:1],
        "range_l_quantity_1_50": [(1, 1, 99.0, 100.0, 0.0, "A", "O", d)],
        "domain_l_returnflag": [(1, 1, 5.0, 100.0, 0.0, "X", "O", d)],
        "domain_l_linestatus": [(1, 1, 5.0, 100.0, 0.0, "A", "X", d)],
        "range_l_discount_0_0.1": [(1, 1, 5.0, 100.0, 0.9, "A", "O", d)],
        "positive_l_extendedprice": [(1, 1, 5.0, -1.0, 0.0, "A", "O", d)],
    }
    for should_fail, rows in bad.items():
        got = report(rows, orders)
        assert not got[should_fail], should_fail
        others = {k: v for k, v in got.items() if k != should_fail}
        assert all(others.values()), (should_fail, others)

    # referential: an l_orderkey with no parent order
    got = report(good, spark.createDataFrame([(2,)], "o_orderkey long"))
    assert not got["referential_l_orderkey_in_orders"]
