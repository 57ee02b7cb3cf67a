"""Measured recall contract for the hot-key DF caps of the three
inverted-index dedups (ngram Jaccard, directed containment,
substring spans).

The caps (``MAX_SHINGLE_DF`` / ``MAX_SPAN_DF``) bound posting-list
pair expansion — the anti-blowup guarantee at 100 TB — but they are
recall-affecting by construction: a pair whose ONLY overlap is a
corpus-wide-hot key is never generated.  This file turns the design
claim ("the cap drops exactly the boilerplate-mediated pairs, never
the genuine ones") into pinned numbers, measured two ways:

1. **Gate scale, clean corpus** (sf0.01, 500 docs): the production
   caps do not bite at all — capped and uncapped runs produce the
   IDENTICAL pair set for all three families (recall = 1.0 exactly).

2. **Boilerplate injection**: the same 30-token / ~560-char header is
   prepended to the 124 docs with ``xxhash64(doc_id) % 4 == 0``,
   pushing every header-interior shingle/span to DF = 124 > cap.
   Measured at the time of writing (deterministic fixtures):

   =============  ========  ===========  =============  ======
   family         genuine   capped(mod)  uncapped(mod)  recall
   =============  ========  ===========  =============  ======
   ngram             25          25           41         1.00
   containment       50          50         1042         1.00
   substring         25         217         7649         1.00
   =============  ========  ===========  =============  ======

   Every genuine pair (the uncapped clean-corpus ground truth)
   survives the cap under injection — asserted below as a recall
   floor of 1.0 — while the uncapped runs inflate 1.6× / 20× / 31×
   with pairs mediated purely by the shared header (for substring,
   124·123/2 ≈ 7.6k boilerplate pairs).  The capped substring run
   legitimately grows to 217: the header extends real shared document
   openings past the 44-char run threshold, which IS a verbatim
   shared substring of the modified corpus, not a cap leak.

The floors here are quoted in the three operator docstrings
(functions/dedup.py); if an implementation change lowers recall, this
file is the tripwire.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

import setup_harvest_action_spark.functions.dedup as dd

SF = "/root/testdata/sf0.01"
BOILER = " ".join(f"boilerplate-term-{i}" for i in range(30))

FAMILIES = [
    ("ngram", "q_dedup_ngram_jaccard", "MAX_SHINGLE_DF", ("doc_a", "doc_b")),
    (
        "containment",
        "q_dedup_containment",
        "MAX_SHINGLE_DF",
        ("contained_id", "container_id"),
    ),
    ("substring", "q_dedup_substring_spans", "MAX_SPAN_DF", ("doc_a", "doc_b")),
]


def _pairs(df, cols):
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


@pytest.fixture(scope="module")
def injected_dir(spark):
    """sf0.01 documents with the hot header prepended to ~25% of docs."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    mod = docs.withColumn(
        "text",
        F.when(
            F.abs(F.xxhash64("doc_id")) % 4 == 0,
            F.concat(F.lit(BOILER + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    tmp = tempfile.mkdtemp(prefix="capreel-")
    mod.write.mode("overwrite").parquet(tmp + "/documents.parquet")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.parametrize("name,qname,cap_attr,cols", FAMILIES)
def test_df_cap_recall_floor(spark, injected_dir, name, qname, cap_attr, cols):
    fn = getattr(dd, qname)
    orig = getattr(dd, cap_attr)

    # (1) clean corpus: the production cap must not bite at gate scale
    capped_clean = _pairs(fn(spark, SF), cols)
    setattr(dd, cap_attr, 10**9)
    try:
        uncapped_clean = _pairs(fn(spark, SF), cols)
    finally:
        setattr(dd, cap_attr, orig)
    assert capped_clean == uncapped_clean, (
        f"{name}: production cap {orig} drops pairs on the clean "
        f"sf0.01 corpus — recall floor broken"
    )
    genuine = uncapped_clean
    assert genuine, f"{name}: fixture produced no ground-truth pairs"

    # (2) injected corpus: every genuine pair must survive the cap
    # (recall floor 1.0 — measured, not aspirational: the header only
    # ADDS shared content, so genuine overlap can only grow)
    capped_mod = _pairs(fn(spark, injected_dir), cols)
    missed = genuine - capped_mod
    assert not missed, f"{name}: cap lost genuine pairs {sorted(missed)[:5]}"

    # (3) and the cap must actually be doing its job: the uncapped run
    # on the injected corpus blows up with boilerplate-mediated pairs
    setattr(dd, cap_attr, 10**9)
    try:
        uncapped_mod = _pairs(fn(spark, injected_dir), cols)
    finally:
        setattr(dd, cap_attr, orig)
    assert len(uncapped_mod) > 1.5 * len(capped_mod), (
        f"{name}: injection did not exercise the cap "
        f"({len(capped_mod)} capped vs {len(uncapped_mod)} uncapped)"
    )


def test_prefix_filter_indexes_a_fraction_and_loses_nothing(spark):
    """The prefix index must be an order of magnitude smaller than the
    full posting set (the efficiency claim) while the oracle gate
    separately re-proves zero recall loss.  Pin the reduction so a
    regression to full-set indexing fails here, not in a bench diff."""
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.functions.dedup import (
        PREFIX_JACCARD_T,
        PREFIX_SLICE,
        tokens_col,
    )
    from setup_harvest_action_spark.io.loaders import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.01", "documents")
        .filter(F.col("doc_id") < PREFIX_SLICE)
        .select("doc_id", F.array_distinct(tokens_col()).alias("toks"))
    )
    sizes = docs.select(
        F.sum(F.size("toks")).alias("full"),
        F.sum(
            F.size("toks")
            - F.ceil(F.lit(PREFIX_JACCARD_T) * F.size("toks"))
            + 1
        ).alias("prefix"),
    ).collect()[0]
    assert sizes.prefix * 8 <= sizes.full, sizes


def test_prefix_filter_never_indexes_the_hottest_token(spark):
    """Skew immunity by construction: rarest-first ordering puts a
    celebrity token LAST in every document's sorted set, so it can
    only enter a prefix if the whole document is nearly all prefix —
    with a corpus-wide token present in every doc, no prefix may
    contain it (the inverted-index families need MAX_*_DF caps for
    exactly this row; prefix filtering gets it for free)."""
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.functions.dedup import PREFIX_JACCARD_T

    # every doc shares 'hot'; the rest are distinct-ish tokens
    rows = [
        (i, "hot " + " ".join(f"w{i}_{j}" for j in range(12)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("toks"),
    )
    ex = docs.select("doc_id", F.explode("toks").alias("tok"))
    dfreq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        ex.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("sorted_toks")
        )
    )
    plen = (
        F.size("sorted_toks")
        - F.ceil(F.lit(PREFIX_JACCARD_T) * F.size("sorted_toks"))
        + 1
    ).cast("int")
    prefixes = ordered.select(
        F.explode(F.slice("sorted_toks", 1, plen)).alias("tok")
    )
    assert prefixes.filter(F.col("tok") == "hot").count() == 0
