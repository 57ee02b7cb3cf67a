"""Corpus quality & safety operators over ``documents`` /
``embeddings``: repetition filters, PII redaction, benchmark
decontamination, embedding-outlier scoring.

LLM-pipeline pillar (SURVEY.md §2.2 extension; complements
``functions/text.py`` quality scores and ``functions/sampling.py``
assembly).  A training-data pipeline FILTERS repetitive documents
(Gopher-style repetition signals), REDACTS sensitive spans before the
corpus leaves the trust boundary, DECONTAMINATES against held-out
evaluation sets (n-gram overlap), and DROPS embedding-space outliers
(mislabeled / off-distribution rows).  Design rules:

  * Repetition metrics are one explode + one keyed aggregation with
    map-side partial combine; the per-document token stats ride through
    the explode as carried columns (``any_value``-style ``first``), so
    no join back to the document table is needed.
  * The benchmark shingle set is TINY relative to the corpus (eval
    suites are a few thousand documents even when the corpus is
    100 TB), so decontamination broadcasts it: the corpus side is one
    explode + broadcast-hash semi-join + per-doc count, with NO
    corpus-scale shuffle on the join itself.
  * Redaction is pure per-row regex (map-only, whole-stage codegen,
    zero shuffle at any scale).
  * Outlier scoring never explodes the corpus-scale side twice: the
    per-label centroid is computed once via ``posexplode`` + partial
    avg (rows = labels x dim, trivially small), collected back into an
    array, and BROADCAST; each vector then computes its distance with
    JVM array lambdas (``zip_with`` + ``aggregate``) — the big side
    stays one row per vector.
  * Thresholds are applied to UNROUNDED values; rounding happens only
    in the output projection (oracle-parity rule, ADVICE r02).

No counterpart in the reference (`/root/reference/harvest.py` is a
vocabulary ETL); these are the north-star extension ops (BASELINE.json)
a corpus pipeline needs between harvest and training.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.functions.text import tokens
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.io.parallelism import spread

# Gopher-style repetition gates (Rae et al. 2021, table A1 spirit —
# values tuned to the synthetic fixture's vocabulary so both outcomes
# occur): drop a document when too few of its tokens are distinct or
# when one bigram dominates.
MAX_DUP_TOKEN_FRAC = 0.55
MAX_TOP_BIGRAM_FRAC = 0.10

# One alternation, compiled once per task: email addresses, US-style
# 7-digit phone tails, and a configurable sensitive-term list (the
# fixture text contains no real PII, so the term list is what exercises
# the path end-to-end; real deployments extend the alternation).
PII_PATTERN = (
    r"(?:[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    r"|\b\d{3}[- ]\d{4}\b"
    r"|\b(?:customer|supplier)\b)"
)
REDACTION = "[REDACTED]"

# Benchmark membership for decontamination: a deterministic key
# predicate stands in for "doc_id IN (eval-suite ids)".
BENCH_MOD = 97
DECONTAM_NGRAM = 3  # shingle width for overlap detection
DECONTAM_MIN_SHARED = 3  # >= this many shared shingles -> contaminated

OUTLIER_TOP_K = 10  # reported outliers per label


def _with_tokens(docs: DataFrame) -> DataFrame:
    """Project the token array to a real column FIRST — substituting
    ``tokens()`` into later higher-order-function lambdas re-tokenizes
    per element (Catalyst does not CSE inside lambda bodies; measured
    13x on the shingle explode)."""
    return docs.select("doc_id", tokens().alias("toks"))


def ngrams(toks: Column, n: int) -> Column:
    """Space-joined n-gram strings over a token array column.
    ``sequence`` is guarded: for fewer than ``n`` tokens it yields an
    empty array (Spark's ``sequence(1, 0)`` would DESCEND)."""
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


@query(
    "q_quality_repetition",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
base AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1]) AS bgs
  FROM tok
),
bg AS (
  SELECT doc_id, n_tokens, n_distinct, unnest(bgs) AS bigram FROM base
),
cnt AS (
  SELECT doc_id, bigram,
         count(*) AS c,
         any_value(n_tokens) AS nt,
         any_value(n_distinct) AS nd
  FROM bg GROUP BY doc_id, bigram
)
SELECT doc_id,
       CAST(nt AS INTEGER) AS n_tokens,
       CAST(round(1.0 - nd * 1.0 / nt, 4) AS DOUBLE) AS dup_token_frac,
       CAST(round(max(c) * 1.0 / sum(c), 4) AS DOUBLE) AS top_bigram_frac,
       (1.0 - nd * 1.0 / nt) <= {MAX_DUP_TOKEN_FRAC}
           AND max(c) * 1.0 / sum(c) <= {MAX_TOP_BIGRAM_FRAC} AS keep
FROM cnt
GROUP BY doc_id, nt, nd
""",
)
def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction (1 - distinct/total) and the fraction of bigram
    occurrences claimed by the single most common bigram; ``keep`` is
    the unrounded-threshold filter verdict.

    MAP-ONLY — zero shuffle at any scale.  Every metric is computed
    inside the row: distinct-token count via ``array_distinct``, and
    the most-common-bigram count as the longest run in the SORTED
    bigram array (``array_sort`` + one ``aggregate`` lambda tracking
    run lengths), which equals the max group count without ever
    exploding.  The relational oracle states the same spec as
    explode + GROUP BY; values are identical.  (The exploded Spark
    form measured 4.9s at sf0.1 — two corpus-scale shuffles; this
    form is a single scan.)"""
    toks = _with_tokens(spread(load_table(spark, sf_dir, "documents")))
    base = toks.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.size("toks").alias("nt"),
        F.size(F.array_distinct("toks")).alias("nd"),
        F.array_sort(ngrams(F.col("toks"), 2)).alias("sbgs"),
    )
    run = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(
        F.lit(1)
    )
    top_count = F.aggregate(
        F.col("sbgs"),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    scored = base.select(
        "doc_id",
        "nt",
        "nd",
        (F.lit(1.0) - F.col("nd") / F.col("nt")).alias("dup_frac"),
        (top_count / F.size("sbgs")).alias("top_frac"),
    )
    return scored.select(
        "doc_id",
        F.col("nt").cast("int").alias("n_tokens"),
        F.round("dup_frac", 4).alias("dup_token_frac"),
        F.round("top_frac", 4).alias("top_bigram_frac"),
        (
            (F.col("dup_frac") <= MAX_DUP_TOKEN_FRAC)
            & (F.col("top_frac") <= MAX_TOP_BIGRAM_FRAC)
        ).alias("keep"),
    )


@query(
    "q_quality_pii_redact",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_PATTERN}')) AS INTEGER)
           AS n_pii_hits,
       md5(regexp_replace(text, '{PII_PATTERN}', '{REDACTION}', 'g'))
           AS redacted_md5
FROM documents
""",
)
def q_quality_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-span detection + redaction: per-document match count
    and the md5 of the redacted text (md5 is bit-identical across
    engines, so the oracle value-checks the full redacted string
    without shipping it).

    Pure per-row regex — map-only, whole-stage codegen, zero shuffle
    at any scale.  Spark's ``regexp_replace`` is global by default;
    DuckDB needs the explicit ``'g'`` flag."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_PATTERN))
        .cast("int")
        .alias("n_pii_hits"),
        F.md5(F.regexp_replace(F.col("text"), PII_PATTERN, REDACTION)).alias(
            "redacted_md5"
        ),
    )


@query(
    "q_quality_decontaminate",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
             AS shingle
  FROM tok
),
bench AS (
  SELECT DISTINCT shingle FROM tri WHERE doc_id % {BENCH_MOD} = 0
),
corpus AS (
  SELECT DISTINCT doc_id, shingle FROM tri WHERE doc_id % {BENCH_MOD} <> 0
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_shared,
       count(*) >= {DECONTAM_MIN_SHARED} AS contaminated
FROM corpus c JOIN bench b ON c.shingle = b.shingle
GROUP BY c.doc_id
""",
)
def q_quality_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose
    ``DECONTAM_NGRAM``-gram shingles overlap the held-out benchmark
    set (membership: ``doc_id % BENCH_MOD == 0``), reporting the
    number of distinct shared shingles per document.

    The benchmark shingle set is broadcast (eval suites stay small no
    matter how big the corpus grows), so the corpus side is explode →
    per-doc dedup → broadcast-hash join → per-doc count: the only
    corpus-scale shuffle is the (doc_id, shingle) dedup aggregation,
    which partial-combines map-side."""
    toks = _with_tokens(spread(load_table(spark, sf_dir, "documents")))
    tri = toks.select(
        "doc_id", F.explode(ngrams(F.col("toks"), DECONTAM_NGRAM)).alias("shingle")
    )
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = tri.filter(is_bench).select("shingle").distinct()
    corpus = tri.filter(~is_bench).dropDuplicates(["doc_id", "shingle"])
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .select(
            "doc_id",
            "n_shared",
            (F.col("n_shared") >= DECONTAM_MIN_SHARED).alias("contaminated"),
        )
    )


@query(
    "q_embedding_outliers",
    oracle=f"""
WITH ex AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
cent AS (
  SELECT label, pos, avg(val) AS c FROM ex GROUP BY label, pos
),
dist AS (
  SELECT ex.vec_id, ex.label,
         CAST(round(sqrt(sum((ex.val - cent.c) * (ex.val - cent.c))), 6)
              AS DOUBLE) AS dist
  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
  GROUP BY ex.vec_id, ex.label
)
SELECT vec_id, label, dist, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT vec_id, label, dist,
         row_number() OVER (PARTITION BY label
                            ORDER BY dist DESC, vec_id) AS rk
  FROM dist
)
WHERE rk <= {OUTLIER_TOP_K}
""",
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outliers: Euclidean distance to the label
    centroid, top ``OUTLIER_TOP_K`` per label (mislabeled /
    off-distribution candidates a curation pipeline drops or reviews).

    The corpus-scale side is exploded exactly once — to compute the
    centroids (partial avg map-side; output rows = labels × dim,
    trivially small).  Centroids are collected back into arrays and
    BROADCAST; each vector computes its distance with ``zip_with`` +
    ``aggregate`` JVM lambdas, so the big side stays one row per
    vector and the only corpus shuffle is the final per-label top-k
    window (WindowGroupLimit prunes to k per partition map-side).
    Ranking orders by the ROUNDED distance (ties broken by vec_id) so
    engine-level float noise cannot reorder the cut."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    centroids = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("val").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    diff2 = F.zip_with(
        F.col("embedding").cast("array<double>"),
        F.col("centroid"),
        lambda v, c: (v - c) * (v - c),
    )
    dist = emb.join(F.broadcast(centroids), "label").select(
        "vec_id",
        "label",
        F.round(
            F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)), 6
        ).alias("dist"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("dist"), F.asc("vec_id"))
    return (
        dist.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= OUTLIER_TOP_K)
    )


WINSOR_LO = 0.05  # lower clip percentile
WINSOR_HI = 0.95  # upper clip percentile


@query(
    "q_quality_winsorize",
    oracle=f"""
WITH bounds AS (
  SELECT lang,
         quantile_cont(n_chars, {WINSOR_LO}) AS lo,
         quantile_cont(n_chars, {WINSOR_HI}) AS hi
  FROM documents GROUP BY lang
)
SELECT d.lang,
       CAST(round(b.lo, 4) AS DOUBLE) AS p_lo,
       CAST(round(b.hi, 4) AS DOUBLE) AS p_hi,
       CAST(count(*) FILTER (WHERE d.n_chars < b.lo) AS BIGINT)
           AS n_clipped_low,
       CAST(count(*) FILTER (WHERE d.n_chars > b.hi) AS BIGINT)
           AS n_clipped_high,
       CAST(round(avg(greatest(least(d.n_chars, b.hi), b.lo)), 4) AS DOUBLE)
           AS winsorized_mean
FROM documents d JOIN bounds b USING (lang)
GROUP BY d.lang, b.lo, b.hi
""",
)
def q_quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZATION: clip a numeric feature to its per-group
    [p{int(WINSOR_LO * 100)}, p{int(WINSOR_HI * 100)}] percentile band —
    the outlier treatment statistics pipelines apply before any
    mean/variance-based downstream step (a single 10⁹-char document
    otherwise owns the corpus mean).  Reports each language's clip
    bounds, how many documents each tail clipped, and the winsorized
    mean.

    EXACT percentiles (``F.percentile``), not approx_percentile: the
    bounds table is one row per group — vocabulary-sized — so
    exactness costs one per-group sort of the values, and the oracle's
    ``quantile_cont`` interpolates bitwise-identically (verified on
    the fixtures before this query landed).  The bounds re-enter the
    scan-side aggregate by a group-keyed join that AQE broadcasts
    while small; at 100 TB swap in ``approx_percentile``'s mergeable
    sketch and this query becomes its ground-truth oracle — the same
    sketch-vs-exact contract as q_agg_approx_quantiles."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.groupBy("lang").agg(
        F.expr(f"percentile(n_chars, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(n_chars, {WINSOR_HI})").alias("hi"),
    )
    clipped = F.greatest(F.least(F.col("n_chars"), F.col("hi")), F.col("lo"))
    return (
        docs.join(bounds, "lang")
        .groupBy("lang", "lo", "hi")
        .agg(
            F.sum((F.col("n_chars") < F.col("lo")).cast("long")).alias(
                "n_clipped_low"
            ),
            F.sum((F.col("n_chars") > F.col("hi")).cast("long")).alias(
                "n_clipped_high"
            ),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
        )
        .select(
            "lang",
            F.round("lo", 4).alias("p_lo"),
            F.round("hi", 4).alias("p_hi"),
            "n_clipped_low",
            "n_clipped_high",
            "winsorized_mean",
        )
    )


@query("q_quality_compression_ratio")
def q_quality_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: zlib_bytes / raw_bytes per
    document, aggregated per (lang, verdict) — the entropy proxy
    production corpus filters use alongside the repetition heuristics
    (highly compressible text is boilerplate/repetition; nearly
    incompressible "text" is usually binary junk or ciphertext; both
    tails get dropped).  Thresholds here bracket the
    natural-language band.

    This is also the catalog's SCALAR PYTHON UDF surface entry
    (SURVEY §2.2 UDF row), in its only acceptable form: Spark 4's
    ARROW-OPTIMIZED ``@F.udf(..., useArrow=True)`` — batches cross
    the Python boundary as Arrow vectors (not pickled rows), and the
    per-row body is one C call into zlib, so the Python round trip
    costs serialization it would pay under pandas_udf anyway.  A
    classic pickled row-at-a-time UDF remains banned from this repo's
    hot paths.

    No DuckDB oracle BY DESIGN: the signal is DEFLATE output length,
    which no SQL engine exposes; the driver records the rows-only
    check and tests/test_quality.py pins the UDF against direct
    zlib on golden rows."""
    import zlib

    @F.udf("double", useArrow=True)
    def compression_ratio(text: str) -> float | None:
        if text is None:
            return None
        raw = text.encode("utf-8")
        if not raw:
            return None
        return round(len(zlib.compress(raw, 6)) / len(raw), 6)

    docs = spread(load_table(spark, sf_dir, "documents"))
    ratio = compression_ratio(F.col("text"))
    verdict = (
        F.when(ratio < 0.25, F.lit("too_compressible"))
        .when(ratio > 1.05, F.lit("incompressible"))
        .otherwise(F.lit("keep"))
    )
    return (
        docs.select("lang", ratio.alias("ratio"), verdict.alias("verdict"))
        .groupBy("lang", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ratio"), 6).alias("avg_ratio"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.round(F.max("ratio"), 6).alias("max_ratio"),
        )
    )


SEG_WORDS = 8  # fixed-width segment size (the fixture has no newlines)
BOILERPLATE_MIN_DF = 3  # segment appears in >= this many docs -> boilerplate


def _segments(toks: Column) -> Column:
    """Consecutive ``SEG_WORDS``-word segments of a token array (the
    tail segment may be shorter).  Guarded like :func:`ngrams`: zero
    tokens yields an empty array (``sequence(1, 0)`` would DESCEND)."""
    n_segs = F.ceil(F.size(toks) / F.lit(SEG_WORDS)).cast("int")
    seg = lambda i: F.concat_ws(
        " ", F.slice(toks, (i - 1) * SEG_WORDS + 1, SEG_WORDS)
    )
    return F.when(
        F.size(toks) >= 1,
        F.transform(F.sequence(F.lit(1), n_segs), seg),
    ).otherwise(F.array().cast("array<string>"))


@query(
    "q_quality_boilerplate_segments",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(tk[(i-1)*{SEG_WORDS}+1 : i*{SEG_WORDS}], ' ') AS seg
  FROM toks,
       UNNEST(generate_series(1,
              CAST(ceil(len(tk) * 1.0 / {SEG_WORDS}) AS BIGINT))) t(i)
),
boiler AS (
  SELECT md5(seg) AS seg_key FROM segs
  GROUP BY md5(seg)
  HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DF}
)
SELECT s.doc_id,
       CAST(count(*) AS INTEGER) AS n_segments,
       CAST(count(b.seg_key) AS INTEGER) AS n_boilerplate,
       md5(coalesce(
           string_agg(s.seg, ' ' ORDER BY s.seg_idx)
               FILTER (WHERE b.seg_key IS NULL),
           '')) AS cleaned_md5
FROM segs s
LEFT JOIN boiler b ON b.seg_key = md5(s.seg)
GROUP BY s.doc_id
""",
)
def q_quality_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal — the C4 "discard any
    line that repeats across documents" / CCNet paragraph-hash rule,
    re-expressed over fixed {SEG_WORDS}-word segments (the fixture
    text has no newlines; the algebra is segmentation-agnostic).  A
    segment is boilerplate when it appears in >= {BOILERPLATE_MIN_DF}
    DISTINCT documents; the op strips those segments and emits the
    cleaned document (as an md5 the oracle can hash-compare), plus
    kept/removed counts.  This is a document TRANSFORMATION, distinct
    from the pair-detection dedups in ``functions/dedup.py``.

    100 TB shape: three corpus-scale exchanges, the same economics as
    the inverted-index dedup family — (1) explode to segments and
    partial/final count DISTINCT docs per md5 segment key (the md5
    narrows the shuffle like the r9 shingle-index keys), (2) join the
    exploded segments back to the boilerplate key set on seg_key —
    NO broadcast hint: the boilerplate set is tiny on healthy corpora
    (high-DF survivors only) and AQE promotes the join to broadcast at
    runtime, but on a pathological fully-duplicated corpus it stays a
    safe shuffle join, (3) re-assemble per doc_id.  Per-doc
    ``collect_list`` is bounded by document size, never corpus size.
    Segment order restores via ``array_sort`` on (seg_idx, seg)
    structs, so reassembly is exact; a no-removal document round-trips
    to its original (trimmed) text."""
    toks = _with_tokens(spread(load_table(spark, sf_dir, "documents")))
    segs = (
        toks.filter(F.size("toks") >= 1)
        .select("doc_id", F.posexplode(_segments(F.col("toks"))))
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("seg_idx"),
            "col",
            F.md5("col").alias("seg_key"),
        )
        .withColumnRenamed("col", "seg")
    )
    boiler = (
        segs.groupBy("seg_key")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILERPLATE_MIN_DF)
        .select("seg_key", F.lit(True).alias("is_boiler"))
    )
    flagged = segs.join(boiler, "seg_key", "left")
    kept_pair = F.when(
        F.col("is_boiler").isNull(), F.struct("seg_idx", "seg")
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_segments"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
        .cast("int")
        .alias("n_boilerplate"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_pair)),
                    lambda p: p["seg"],
                ),
            )
        ).alias("cleaned_md5"),
    )


@query(
    "q_quality_auc",
    oracle="""
WITH scored AS (
  SELECT n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
grouped AS (
  SELECT score, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(pos) AS BIGINT) AS n_pos
  FROM scored GROUP BY score
),
ranked AS (
  SELECT n_pos, cnt,
         2 * (sum(cnt) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
           + cnt + 1 AS rank2
  FROM grouped
),
tot AS (
  SELECT CAST(sum(n_pos * rank2) AS BIGINT) AS pos_rank2,
         CAST(sum(n_pos) AS BIGINT) AS p,
         CAST(sum(cnt) - sum(n_pos) AS BIGINT) AS n
  FROM ranked
)
SELECT p AS n_pos, n AS n_neg,
       CAST(round((pos_rank2 - p * (p + 1)) / (2.0 * p * n), 6) AS DOUBLE)
         AS auc
FROM tot
""",
)
def q_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of a score against a binary label (here: does
    document length predict lang = 'en') — the evaluation-metric
    primitive for classifier-driven curation (quality filters, langid
    confidence, toxicity scores): AUC = P(score_pos > score_neg) with
    ties counted half, computed distributed via the Mann–Whitney rank
    statistic with AVERAGE ranks on ties.

    Scale shape: ONE pass collapses the corpus to its distinct-score
    table (vocabulary-sized), the rank window runs over THOSE rows
    (never the raw corpus — the q_events_rolling_active_users
    collapse-then-window discipline), and the statistic is one
    broadcast-free single-row aggregate.  Arithmetic is INTEGER-exact
    end to end: doubled average ranks (2·below + cnt + 1) keep the
    half-ranks integral, so both engines divide the same exact BIGINT
    numerator — no float summation-order drift, hash-stable at any
    scale.  Reference parity: north-star §2.2 quality/aggregation."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    grouped = (
        docs.select(
            F.col("n_chars").alias("score"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        )
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    ranked = grouped.select(
        "n_pos",
        "cnt",
        (
            F.lit(2) * (F.sum("cnt").over(w) - F.col("cnt"))
            + F.col("cnt")
            + F.lit(1)
        ).alias("rank2"),
    )
    return ranked.agg(
        F.sum(F.col("n_pos") * F.col("rank2")).cast("long").alias("pos_rank2"),
        F.sum("n_pos").cast("long").alias("p"),
        (F.sum("cnt") - F.sum("n_pos")).cast("long").alias("n"),
    ).select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        F.round(
            (F.col("pos_rank2") - F.col("p") * (F.col("p") + 1))
            / (F.lit(2.0) * F.col("p") * F.col("n")),
            6,
        )
        .cast("double")
        .alias("auc"),
    )


@query(
    "q_quality_k_anonymity",
    oracle="""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         CAST(count(*) AS BIGINT) AS k
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT CASE WHEN k = 1 THEN '1-unique'
            WHEN k < 5 THEN '2-small'
            WHEN k < 10 THEN '3-medium'
            ELSE '4-anonymous' END AS risk_band,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(k) AS BIGINT) AS n_individuals
FROM cells GROUP BY 1
""",
)
def q_quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY risk report over a quasi-identifier tuple
    (nation, market segment, account-balance band) — the privacy gate
    a training-data pipeline runs beside PII redaction
    (`q_quality_pii_redact`): an individual whose quasi-identifier
    cell has k = 1 is re-identifiable by joining ANY external dataset
    sharing those attributes; the report buckets every cell by its k
    and counts individuals at each risk level (the Sweeney/Samarati
    k-anonymity model).

    Scale shape: one corpus scan → one (quasi-tuple)-keyed partial/
    final count → banding + re-aggregation over CELL-cardinality rows
    (bounded by the attribute-domain product, not the population).
    The balance band floors in exact arithmetic (acctbal has ≤ 2
    decimals; /1000 then floor is engine-identical on the same
    doubles).  Suppression/generalization would act on the k < 5
    cells this report names."""
    customer = load_table(spark, sf_dir, "customer")
    cells = customer.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("long").alias("k"))
    band = (
        F.when(F.col("k") == 1, "1-unique")
        .when(F.col("k") < 5, "2-small")
        .when(F.col("k") < 10, "3-medium")
        .otherwise("4-anonymous")
    )
    return cells.groupBy(band.alias("risk_band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("k").cast("long").alias("n_individuals"),
    )


@query(
    "q_quality_calibration",
    oracle="""
WITH bounds AS (
  SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents
),
banded AS (
  SELECT CAST(floor((n_chars - lo) * 10.0 / (hi - lo + 1)) AS BIGINT)
           AS band,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         n_chars
  FROM documents CROSS JOIN bounds
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(round(sum(pos) * 1.0 / count(*), 6) AS DOUBLE) AS pos_rate,
       CAST(round(sum(n_chars) * 1.0 / count(*), 4) AS DOUBLE)
         AS mean_score
FROM banded GROUP BY band
""",
)
def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION / reliability curve for a score against a binary
    label — AUC's companion (`q_quality_auc`): AUC says whether the
    score RANKS positives above negatives; this says whether its
    LEVELS mean what they claim, by banding the score range into 10
    equal-width bins and reporting each bin's observed positive rate
    beside its mean score (a calibrated score tracks the diagonal).

    Scale shape: the score range enters as a broadcast one-row
    min/max aggregate (never a driver collect), banding is per-row
    integer arithmetic — exact: integer score, integer bounds, one
    float multiply both engines round identically — and the report is
    one partial/final count over ≤ 10 groups.  Two corpus scans total
    (bounds + banding); a single-scan variant would sketch the bounds
    beforehand."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    )
    banded = docs.crossJoin(F.broadcast(bounds)).select(
        F.floor(
            (F.col("n_chars") - F.col("lo"))
            * 10.0
            / (F.col("hi") - F.col("lo") + 1)
        )
        .cast("long")
        .alias("band"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        "n_chars",
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.round(F.sum("pos") / F.count(F.lit(1)), 6)
        .cast("double")
        .alias("pos_rate"),
        F.round(F.sum("n_chars") / F.count(F.lit(1)), 4)
        .cast("double")
        .alias("mean_score"),
    )


@query(
    "q_quality_expectations",
    oracle="""
WITH a AS (
    SELECT count(*) AS n,
           count(l_shipdate) AS n_shipdate,
           count(DISTINCT (l_orderkey, l_linenumber)) AS n_pk,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                    THEN 1 ELSE 0 END) AS bad_flag,
           sum(CASE WHEN l_linestatus NOT IN ('O', 'F')
                    THEN 1 ELSE 0 END) AS bad_status,
           min(l_discount) AS min_disc,
           max(l_discount) AS max_disc,
           min(l_extendedprice) AS min_price
    FROM lineitem
), o AS (
    SELECT count(*) AS n_orphans
    FROM lineitem l LEFT JOIN orders r ON l.l_orderkey = r.o_orderkey
    WHERE r.o_orderkey IS NULL
)
SELECT 'completeness_l_shipdate' AS check_name,
       CAST(round(n_shipdate * 1.0 / n, 6) AS DOUBLE) AS metric,
       n_shipdate = n AS passed FROM a
UNION ALL SELECT 'unique_pk_orderkey_linenumber',
       CAST(round(n_pk * 1.0 / n, 6) AS DOUBLE), n_pk = n FROM a
UNION ALL SELECT 'range_l_quantity_1_50',
       CAST(max_qty AS DOUBLE), min_qty >= 1 AND max_qty <= 50 FROM a
UNION ALL SELECT 'domain_l_returnflag',
       CAST(bad_flag AS DOUBLE), bad_flag = 0 FROM a
UNION ALL SELECT 'domain_l_linestatus',
       CAST(bad_status AS DOUBLE), bad_status = 0 FROM a
UNION ALL SELECT 'range_l_discount_0_0.1',
       CAST(max_disc AS DOUBLE),
       min_disc >= 0 AND max_disc <= 0.1 FROM a
UNION ALL SELECT 'positive_l_extendedprice',
       CAST(min_price AS DOUBLE), min_price > 0 FROM a
UNION ALL SELECT 'referential_l_orderkey_in_orders',
       CAST(n_orphans AS DOUBLE), n_orphans = 0 FROM o, a
""",
)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality EXPECTATION SUITE (the Deequ /
    Great-Expectations pattern, public designs): completeness,
    key uniqueness, numeric ranges, categorical domains, positivity,
    and referential integrity, verified as ONE report.

    Scale design: every row-local check folds into a single
    conditional aggregate over ONE lineitem scan (map-side partial
    combine; the multi-distinct PK check is the only expansion and it
    is keyed on the PK itself, so it shards perfectly).  The one
    cross-table check (referential) is a left-anti join keyed on
    l_orderkey — shuffle-partitioned at scale, never broadcast of a
    data-scale side.  Both reduce to ONE-ROW frames that combine via
    broadcast crossJoin (the repo's scalar-attach shape), then explode
    into the report rows: checks cost one scan + one join regardless
    of how many expectations the suite declares."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return expectation_report(li, orders)


def expectation_report(li: DataFrame, orders: DataFrame) -> DataFrame:
    """The suite body, factored over plain DataFrames so tests can
    verify VIOLATIONS are caught (a suite that can only pass is not a
    check) — see tests/test_quality.py."""
    a = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_shipdate").alias("n_shipdate"),
        F.count_distinct("l_orderkey", "l_linenumber").alias("n_pk"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.sum(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        ).alias("bad_flag"),
        F.sum(
            F.when(~F.col("l_linestatus").isin("O", "F"), 1).otherwise(0)
        ).alias("bad_status"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
        F.min("l_extendedprice").alias("min_price"),
    )
    orphans = (
        li.select("l_orderkey")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    row = a.crossJoin(F.broadcast(orphans))

    def c(name, metric, passed):
        return F.struct(
            F.lit(name).alias("check_name"),
            metric.cast("double").alias("metric"),
            passed.alias("passed"),
        )

    checks = F.array(
        c(
            "completeness_l_shipdate",
            F.round(F.col("n_shipdate") / F.col("n"), 6),
            F.col("n_shipdate") == F.col("n"),
        ),
        c(
            "unique_pk_orderkey_linenumber",
            F.round(F.col("n_pk") / F.col("n"), 6),
            F.col("n_pk") == F.col("n"),
        ),
        c(
            "range_l_quantity_1_50",
            F.col("max_qty"),
            (F.col("min_qty") >= 1) & (F.col("max_qty") <= 50),
        ),
        c("domain_l_returnflag", F.col("bad_flag"), F.col("bad_flag") == 0),
        c(
            "domain_l_linestatus",
            F.col("bad_status"),
            F.col("bad_status") == 0,
        ),
        c(
            "range_l_discount_0_0.1",
            F.col("max_disc"),
            (F.col("min_disc") >= 0) & (F.col("max_disc") <= 0.1),
        ),
        c(
            "positive_l_extendedprice",
            F.col("min_price"),
            F.col("min_price") > 0,
        ),
        c(
            "referential_l_orderkey_in_orders",
            F.col("n_orphans"),
            F.col("n_orphans") == 0,
        ),
    )
    return row.select(F.explode(checks).alias("c")).select("c.*")


MAD_CONSISTENCY = 1.4826  # MAD -> sigma under normality (public constant)
MAD_Z_CUTOFF = 3.0


@query(
    "q_quality_robust_zscore",
    oracle=f"""
WITH med AS (
    SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
    FROM documents
),
mad AS (
    SELECT quantile_cont(abs(CAST(n_chars AS DOUBLE) - med.med), 0.5) AS mad
    FROM documents, med
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(round((n_chars - med.med) / ({MAD_CONSISTENCY} * mad.mad), 6)
            + 0.0 AS DOUBLE) AS robust_z,
       abs(n_chars - med.med) / ({MAD_CONSISTENCY} * mad.mad)
           > {MAD_Z_CUTOFF} AS is_outlier
FROM documents, med, mad
""",
)
def q_quality_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST (median/MAD) outlier scoring of document lengths — the
    quality gate that, unlike the mean/stddev z-score, a handful of
    pathological documents cannot drag: median and MAD have a 50%
    breakdown point, so the fence stays put no matter how extreme the
    outliers are (the winsorize/percentile gates are the clamp
    variants; this is the flag variant).

    Scale shape: two exact medians (Spark ``median`` = exact
    interpolated percentile, the same contract as DuckDB's) attach as
    broadcast one-row aggregates — the repo's scalar-attach pattern —
    and the scoring pass is map-only.  The outlier FLAG compares the
    unrounded score on both engines (threshold rule, ADVICE r02);
    only the reported score is rounded."""
    docs = load_table(spark, sf_dir, "documents")
    med = docs.agg(F.median(F.col("n_chars") * 1.0).alias("med"))
    with_med = docs.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.median(F.abs(F.col("n_chars") - F.col("med"))).alias("mad")
    )
    scored = with_med.crossJoin(F.broadcast(mad))
    sigma = F.lit(MAD_CONSISTENCY) * F.col("mad")
    return scored.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        # signed-zero sweep (r13): z-scores are signed doubles.
        (
            F.round((F.col("n_chars") - F.col("med")) / sigma, 6)
            + F.lit(0.0)
        ).alias("robust_z"),
        (F.abs(F.col("n_chars") - F.col("med")) / sigma > MAD_Z_CUTOFF).alias(
            "is_outlier"
        ),
    )


@query(
    "q_quality_dedup_report",
    oracle="""
WITH groups AS (
    SELECT md5(lower(trim(text))) AS f, CAST(count(*) AS BIGINT) AS sz
    FROM documents GROUP BY 1
)
SELECT CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(sz) - count(*) AS BIGINT) AS n_redundant,
       CAST(round((sum(sz) - count(*)) * 1.0 / sum(sz), 6) AS DOUBLE)
           AS dup_rate,
       CAST(max(sz) AS BIGINT) AS largest_group,
       CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_groups
FROM groups
""",
)
def q_quality_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus DUPLICATION-RATE report — the one-row number every
    ingest run logs before and after dedup (docs, distinct contents,
    redundant rows, dup rate, largest clone group, clone-group
    count), derived from the same normalized-content fingerprint the
    exact-dedup operator keys on.  One scan, one fingerprint-keyed
    aggregate with map-side combine, then a one-row rollup — the
    cheapest honest answer to 'how duplicated is this corpus'."""
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy(
        F.md5(F.lower(F.trim(F.col("text")))).alias("f")
    ).agg(F.count(F.lit(1)).alias("sz"))
    return groups.agg(
        F.sum("sz").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("sz") - F.count(F.lit(1))).alias("n_redundant"),
        F.round(
            (F.sum("sz") - F.count(F.lit(1))) / F.sum("sz"), 6
        ).alias("dup_rate"),
        F.max("sz").alias("largest_group"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).alias(
            "n_dup_groups"
        ),
    )


# --- PII detection & redaction (r11) --------------------------------------------

# RE2-and-Java-compatible patterns (no lookaround).  The generic
# single-pattern scrubber is q_quality_pii_redact above; this family
# adds TYPED per-category counts (email / phone / IPv4) with an
# ordered multi-pass redaction.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


@query(
    "q_quality_pii_typed_redact",
    oracle=f"""
WITH planted AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id ||
                '@example.com or x' || doc_id || '@mail.test now'
           WHEN doc_id % 7 = 1 THEN ' call 555-' ||
                lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
           WHEN doc_id % 7 = 2 THEN ' from 10.0.' ||
                CAST(doc_id % 256 AS VARCHAR) || '.7'
           ELSE ''
         END AS text
  FROM documents
),
redacted AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
         regexp_replace(text, '{PII_EMAIL}', '[EMAIL]', 'g') AS t1,
         text
  FROM planted
),
r2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{PII_IPV4}')) AS n_ips,
         regexp_replace(t1, '{PII_IPV4}', '[IP]', 'g') AS t2
  FROM redacted
)
SELECT doc_id, CAST(n_emails AS INTEGER) AS n_emails,
       CAST(n_ips AS INTEGER) AS n_ips,
       CAST(len(regexp_extract_all(t2, '{PII_PHONE}')) AS INTEGER)
           AS n_phones,
       md5(regexp_replace(t2, '{PII_PHONE}', '[PHONE]', 'g'))
           AS clean_md5
FROM r2
""",
)
def q_quality_pii_typed_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TYPED PII detection + redaction — per-category counts (email,
    phone, IPv4) with ordered multi-pass redaction, as portable regexes
    (no lookaround: the same pattern text compiles under Java regex
    and DuckDB's RE2, so the redacted output can cross-engine
    hash-match).  The fixture contains no PII, so deterministic PII is
    PLANTED first (doc_id-derived emails/phones/IPs on doc_id % 7
    lanes) to make the gate non-vacuous; the oracle replays plant +
    redact + per-type counts + md5(clean text) exactly.

    Redaction order is fixed (email → IPv4 → phone) so a dotted
    address inside an email can't double-count after replacement.

    100 TB design: pure map — regexp_count/regexp_replace are
    JVM-side codegen'd expressions, zero shuffles, no UDF; scales as
    one corpus scan.  The planted CASE is fixture plumbing; production
    use is ``redact_pii`` below on raw text."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or x"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail.test now"),
                ),
            )
            .when(
                F.col("doc_id") % 7 == 1,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-0199"),
                ),
            )
            .when(
                F.col("doc_id") % 7 == 2,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7"),
                ),
            )
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(planted)


def redact_pii(
    docs: DataFrame, text_col: str = "text", keep_text: bool = False
) -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, clean_md5[, clean_text]):
    per-type PII counts and the md5 of the fully redacted text —
    map-only.  ``keep_text=True`` adds the redacted text itself for
    pipeline composition."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL)).cast("int")
    t1 = F.regexp_replace(t, PII_EMAIL, "[EMAIL]")
    n_ips = F.regexp_count(t1, F.lit(PII_IPV4)).cast("int")
    t2 = F.regexp_replace(t1, PII_IPV4, "[IP]")
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE)).cast("int")
    t3 = F.regexp_replace(t2, PII_PHONE, "[PHONE]")
    cols = [
        F.col("doc_id"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        F.md5(t3).alias("clean_md5"),
    ]
    if keep_text:
        cols.append(t3.alias("clean_text"))
    return docs.select(*cols)


# --- Gopher document-quality rules (r15) ---------------------------------------

GOPHER_DOCS = 400
_GOPHER_LINE_WORDS = 8


def synthesize_structured_doc(doc_id: int, text: str) -> str:
    """Deterministic document STRUCTURE over the fixture's bare-word
    text, so the line-level Gopher rules have real pass AND fail cases
    (the raw fixture has no newlines/bullets/punctuation):

      * raw words chunk into {n}-word lines;
      * doc_id % 8 == 5: EVERY line gets a bullet ("• ") — fails the
        bullet rule; % 8 == 1: every 5th line — passes;
      * doc_id % 4 == 2: every 3rd line's last word gains "..." —
        ~33% of lines, fails the 30% ellipsis rule;
      * doc_id % 8 == 3: as many numeric words as raw words append as
        one extra line — fails the 80%-alphabetic rule; % 8 == 7:
        three numeric words — passes.

    The catalog oracle never sees this text: it re-derives every
    metric from the construction ARITHMETIC + raw-token stats, so the
    measurement code below is what's under test.
    """.replace("{n}", str(_GOPHER_LINE_WORDS))
    words = [w for w in text.split() if w]
    n = _GOPHER_LINE_WORDS
    lines = [
        " ".join(words[i : i + n]) for i in range(0, len(words), n)
    ]
    if doc_id % 4 == 2:
        lines = [
            ln + "..." if i % 3 == 2 else ln
            for i, ln in enumerate(lines)
        ]
    if doc_id % 8 == 5:
        lines = ["• " + ln for ln in lines]
    elif doc_id % 8 == 1:
        lines = [
            ("• " + ln if i % 5 == 0 else ln)
            for i, ln in enumerate(lines)
        ]
    n_num = (
        len(words) if doc_id % 8 == 3 else 3 if doc_id % 8 == 7 else 0
    )
    if n_num:
        # i % 900 keeps every numeric word in [100, 999] — exactly 3
        # chars — so the oracle's sum_len arithmetic (sum_raw +
        # 3*n_num) holds for ANY document length, not just the ≤900
        # raw words the small fixtures happen to have (ADVICE r15).
        lines.append(" ".join(str(100 + i % 900) for i in range(n_num)))
    return "\n".join(lines)


def gopher_metrics(doc: str) -> dict:
    """MEASURE the Gopher quality-rule inputs from a structured
    document (Rae et al. 2021, arXiv:2112.11446 §A1.1 — the published
    repetition-free subset): word count, mean word length,
    ellipsis-symbol-to-word ratio, fraction of lines starting with a
    bullet, fraction of lines ending with an ellipsis, fraction of
    words with at least one alphabetic character, and stop-word hits
    (this repo's STOPWORDS list stands in for the paper's 8-word
    list — documented deviation).  Bullet markers are stripped before
    word-level metrics (the marker is layout, not a word)."""
    from setup_harvest_action_spark.functions.text import STOPWORDS

    lines = doc.split("\n") if doc else []
    n_lines = len(lines) or 1
    bullet_lines = sum(
        1 for ln in lines if ln.startswith(("• ", "- ", "* "))
    )
    ellipsis_lines = sum(
        1 for ln in lines if ln.rstrip().endswith(("...", "…"))
    )
    words = [
        w
        for ln in lines
        for w in (
            ln[2:] if ln.startswith(("• ", "- ", "* ")) else ln
        ).split()
        if w
    ]
    n_words = len(words) or 1
    n_alpha = sum(1 for w in words if any(c.isalpha() for c in w))
    n_ellipsis = sum(w.count("...") + w.count("…") for w in words)
    n_hash = sum(w.count("#") for w in words)
    stop_count = sum(1 for w in words if w.rstrip(".…") in STOPWORDS)
    return {
        "n_words": len(words),
        "n_lines": len(lines),
        "mean_word_len": sum(len(w) for w in words) / n_words,
        "symbol_ratio": (n_ellipsis + n_hash) / n_words,
        "bullet_frac": bullet_lines / n_lines,
        "ellipsis_frac": ellipsis_lines / n_lines,
        "alpha_frac": n_alpha / n_words,
        "stop_count": stop_count,
    }


def gopher_pass(m: dict) -> bool:
    """The published rule thresholds: 50..100k words, mean word length
    3..10, symbol-to-word ratio <= 0.1, <= 90% bullet lines, <= 30%
    ellipsis lines, >= 80% alphabetic words, >= 2 stop words."""
    return (
        50 <= m["n_words"] <= 100_000
        and 3 <= m["mean_word_len"] <= 10
        and m["symbol_ratio"] <= 0.1
        and m["bullet_frac"] <= 0.9
        and m["ellipsis_frac"] <= 0.3
        and m["alpha_frac"] >= 0.8
        and m["stop_count"] >= 2
    )


@query(
    "q_quality_gopher_rules",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> t <> ''))
           AS n_raw,
         length(replace(text, ' ', '')) AS sum_raw,
         len(list_filter(string_split(text, ' '),
                         t -> t IN ('the', 'a', 'of', 'and', 'in')))
           AS stop_count
  FROM documents WHERE doc_id < {GOPHER_DOCS}
), derived AS (
  SELECT doc_id, n_raw, sum_raw, stop_count,
         CAST(ceil(n_raw / {_GOPHER_LINE_WORDS}.0) AS INT) AS n_base,
         CASE WHEN doc_id % 8 = 3 THEN n_raw
              WHEN doc_id % 8 = 7 THEN 3 ELSE 0 END AS n_num
  FROM base
), counts AS (
  SELECT doc_id, stop_count,
         n_raw + n_num AS n_words,
         n_base + CASE WHEN n_num > 0 THEN 1 ELSE 0 END AS n_lines,
         CASE WHEN doc_id % 8 = 5 THEN n_base
              WHEN doc_id % 8 = 1
                THEN CAST(floor((n_base - 1) / 5.0) AS INT) + 1
              ELSE 0 END AS n_bullet,
         CASE WHEN doc_id % 4 = 2 AND n_base >= 3
                THEN CAST(floor((n_base - 3) / 3.0) AS INT) + 1
              ELSE 0 END AS n_ell,
         n_raw AS n_alpha,
         sum_raw + 3 * n_num + 3 * CASE WHEN doc_id % 4 = 2
              AND n_base >= 3
              THEN CAST(floor((n_base - 3) / 3.0) AS INT) + 1
              ELSE 0 END AS sum_len
  FROM derived
)
SELECT doc_id,
       CAST(n_words AS INT) AS n_words,
       CAST(n_lines AS INT) AS n_lines,
       CAST(round(sum_len * 1.0 / n_words, 6) AS DOUBLE)
         AS mean_word_len,
       CAST(round(n_ell * 1.0 / n_words, 6) AS DOUBLE) AS symbol_ratio,
       CAST(round(n_bullet * 1.0 / n_lines, 6) AS DOUBLE)
         AS bullet_frac,
       CAST(round(n_ell * 1.0 / n_lines, 6) AS DOUBLE)
         AS ellipsis_frac,
       CAST(round(n_alpha * 1.0 / n_words, 6) AS DOUBLE) AS alpha_frac,
       CAST(stop_count AS INT) AS stop_count,
       CAST(n_words BETWEEN 50 AND 100000
            AND sum_len * 1.0 / n_words BETWEEN 3 AND 10
            AND n_ell * 1.0 / n_words <= 0.1
            AND n_bullet * 1.0 / n_lines <= 0.9
            AND n_ell * 1.0 / n_lines <= 0.3
            AND n_alpha * 1.0 / n_words >= 0.8
            AND stop_count >= 2 AS BOOLEAN) AS passes_gopher
FROM counts
""",
)
def q_quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher document-quality rule pack (Rae et al. 2021,
    arXiv:2112.11446 §A1.1) under the hash gate, the webgraph
    discipline: each document gains deterministic STRUCTURE (lines,
    bullet variants, ellipsis variants, numeric-word variants — every
    rule gets pass AND fail populations), the engine MEASURES the
    rules from the structured text (``gopher_metrics``: line split,
    bullet strip, word classes), and the DuckDB oracle re-derives
    every metric from construction arithmetic + raw-token stats — a
    measurement bug anywhere (a bullet counted as a word, an ellipsis
    missed at a line end, an off-by-one in line chunking) flips the
    hash.  Scale: pure map over Arrow batches; the rule pack is the
    standard cheap pre-filter ahead of dedup/training."""
    from collections.abc import Iterator

    import pandas as pd

    docs = (
        spread(load_table(spark, sf_dir, "documents"))
        .filter(F.col("doc_id") < GOPHER_DOCS)
        .select("doc_id", "text")
    )

    def measure(batches: Iterator):
        for pdf in batches:
            rows = {
                "doc_id": [], "n_words": [], "n_lines": [],
                "mean_word_len": [], "symbol_ratio": [],
                "bullet_frac": [], "ellipsis_frac": [],
                "alpha_frac": [], "stop_count": [],
                "passes_gopher": [],
            }
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                m = gopher_metrics(synthesize_structured_doc(d, t))
                rows["doc_id"].append(d)
                rows["n_words"].append(m["n_words"])
                rows["n_lines"].append(m["n_lines"])
                rows["mean_word_len"].append(round(m["mean_word_len"], 6))
                rows["symbol_ratio"].append(round(m["symbol_ratio"], 6))
                rows["bullet_frac"].append(round(m["bullet_frac"], 6))
                rows["ellipsis_frac"].append(round(m["ellipsis_frac"], 6))
                rows["alpha_frac"].append(round(m["alpha_frac"], 6))
                rows["stop_count"].append(m["stop_count"])
                rows["passes_gopher"].append(gopher_pass(m))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        measure,
        "doc_id long, n_words int, n_lines int, mean_word_len double,"
        " symbol_ratio double, bullet_frac double, ellipsis_frac double,"
        " alpha_frac double, stop_count int, passes_gopher boolean",
    )


# --- C4 line-level cleaning (r15) ----------------------------------------------

C4_DOCS = 400
_C4_LINE_WORDS = 8


def synthesize_c4_doc(doc_id: int, text: str) -> str:
    """Deterministic C4-shaped structure: raw words chunk into
    {n}-word sentences with a terminal period — EXCEPT every 4th line
    (i % 4 == 3), which gets no terminal punctuation (the C4 line
    rule's fail case; a short final chunk additionally fails the
    5-word minimum).  Injections: doc_id % 3 == 1 appends a 2-word
    line; % 9 == 4 appends a 'lorem ipsum' sentence (doc-level drop);
    % 9 == 7 appends a brace line (code marker, doc-level drop).  The
    oracle re-derives cleaning entirely from this arithmetic plus the
    raw word list.""".replace("{n}", str(_C4_LINE_WORDS))
    words = [w for w in text.split() if w]
    n = _C4_LINE_WORDS
    lines = []
    for i in range(0, len(words), n):
        chunk = " ".join(words[i : i + n])
        idx = i // n
        lines.append(chunk if idx % 4 == 3 else chunk + ".")
    if doc_id % 3 == 1:
        lines.append("too short.")
    if doc_id % 9 == 4:
        lines.append("lorem ipsum dolor sit amet.")
    if doc_id % 9 == 7:
        lines.append("function() {")
    return "\n".join(lines)


_C4_TERMINAL = (".", "!", "?", '"')


def c4_clean(doc: str) -> dict:
    """The C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683
    §2.2 — the line- and document-level subset): keep only lines that
    end in terminal punctuation AND have >= 5 words; drop the whole
    document when any line contains the braces-of-code marker '{' or
    the phrase 'lorem ipsum' (case-insensitive), or when fewer than 3
    lines survive ('at least 3 sentences').  Returns the cleaned text
    plus the bookkeeping the catalog oracle replays."""
    lines = doc.split("\n") if doc else []
    kept = [
        ln
        for ln in lines
        if ln.rstrip().endswith(_C4_TERMINAL) and len(ln.split()) >= 5
    ]
    low = doc.lower()
    if "lorem ipsum" in low:
        reason = "lorem_ipsum"
    elif "{" in doc:
        reason = "brace"
    elif len(kept) < 3:
        reason = "min_sentences"
    else:
        reason = ""
    return {
        "n_lines_in": len(lines),
        "n_lines_kept": len(kept),
        "doc_dropped": bool(reason),
        "drop_reason": reason,
        "clean_text": None if reason else "\n".join(kept),
    }


@query(
    "q_quality_c4_line_filters",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS words
  FROM documents WHERE doc_id < {C4_DOCS}
), base AS (
  SELECT doc_id, words, len(words) AS n_raw,
         CAST(ceil(len(words) / {_C4_LINE_WORDS}.0) AS INT) AS n_base
  FROM w
), lines AS (
  -- fixed 0..255 index cross join (DuckDB can't lateral-parameterize
  -- generate_series) filtered to each doc's real line count; 256
  -- lines = 2048 words, far above the fixture (asserted by a guard
  -- row-count: any doc longer would lose lines AND flip the hash)
  SELECT doc_id, n_base, t.i,
         len(words) - {_C4_LINE_WORDS} * t.i AS remaining,
         array_to_string(list_slice(words, t.i * {_C4_LINE_WORDS} + 1,
                                    (t.i + 1) * {_C4_LINE_WORDS}), ' ')
           AS chunk
  FROM base CROSS JOIN generate_series(0, 255) AS t(i)
  WHERE t.i < n_base
), kept AS (
  SELECT doc_id, i, chunk || '.' AS ln
  FROM lines
  WHERE i % 4 <> 3 AND least(remaining, {_C4_LINE_WORDS}) >= 5
), counts AS (
  SELECT b.doc_id, b.n_base,
         b.n_base
           + CASE WHEN b.doc_id % 3 = 1 THEN 1 ELSE 0 END
           + CASE WHEN b.doc_id % 9 = 4 THEN 1 ELSE 0 END
           + CASE WHEN b.doc_id % 9 = 7 THEN 1 ELSE 0 END
           AS n_lines_in,
         coalesce(k.n_kept_base, 0)
           + CASE WHEN b.doc_id % 9 = 4 THEN 1 ELSE 0 END
           AS n_lines_kept,
         k.clean_text
  FROM base b LEFT JOIN (
    SELECT doc_id, count(*) AS n_kept_base,
           string_agg(ln, chr(10) ORDER BY i) AS clean_text
    FROM kept GROUP BY doc_id
  ) k USING (doc_id)
)
SELECT doc_id,
       CAST(n_lines_in AS INT) AS n_lines_in,
       CAST(n_lines_kept AS INT) AS n_lines_kept,
       CAST(doc_id % 9 IN (4, 7) OR n_lines_kept < 3 AS BOOLEAN)
         AS doc_dropped,
       CASE WHEN doc_id % 9 = 4 THEN 'lorem_ipsum'
            WHEN doc_id % 9 = 7 THEN 'brace'
            WHEN n_lines_kept < 3 THEN 'min_sentences'
            ELSE '' END AS drop_reason,
       CASE WHEN doc_id % 9 IN (4, 7) OR n_lines_kept < 3 THEN NULL
            ELSE md5(clean_text) END AS clean_md5
FROM counts
""",
)
def q_quality_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's cleaning pass (Raffel et al. 2020 §2.2) under the hash
    gate — CLEANING, not just scoring: the engine rebuilds each
    document's surviving text (terminal-punctuation + 5-word line
    rules; lorem-ipsum / brace / min-3-sentences document drops) and
    the DuckDB oracle reconstructs the identical cleaned text
    RELATIONALLY (generate_series + list_slice line reconstruction +
    ordered string_agg) — the clean_md5 column means a divergence in
    any kept line, line order, or drop decision flips the hash.
    Scale: pure map; the oracle's relational rebuild is the test rig,
    not the production path."""
    from collections.abc import Iterator

    import hashlib

    import pandas as pd

    docs = (
        spread(load_table(spark, sf_dir, "documents"))
        .filter(F.col("doc_id") < C4_DOCS)
        .select("doc_id", "text")
    )

    def clean(batches: Iterator):
        for pdf in batches:
            rows = {
                "doc_id": [], "n_lines_in": [], "n_lines_kept": [],
                "doc_dropped": [], "drop_reason": [], "clean_md5": [],
            }
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                r = c4_clean(synthesize_c4_doc(d, t))
                rows["doc_id"].append(d)
                rows["n_lines_in"].append(r["n_lines_in"])
                rows["n_lines_kept"].append(r["n_lines_kept"])
                rows["doc_dropped"].append(r["doc_dropped"])
                rows["drop_reason"].append(r["drop_reason"])
                rows["clean_md5"].append(
                    None
                    if r["clean_text"] is None
                    else hashlib.md5(
                        r["clean_text"].encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        clean,
        "doc_id long, n_lines_in int, n_lines_kept int,"
        " doc_dropped boolean, drop_reason string, clean_md5 string",
    )
