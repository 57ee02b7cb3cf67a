"""Text analysis over ``documents``: tokens, quality, TF-IDF,
fingerprints, language-ID.

LLM-pipeline pillar (SURVEY.md §2.2): the per-document statistics a
training-data pipeline computes before filtering/dedup.  Everything is
built-in column expressions + hash aggregates — no Python in the hot
path; the only shuffles are keyed (doc_id / token / lang), so each
query is one or two partial/final aggregate passes at any scale.

Tokenization is whitespace ``split`` (the fixture corpus is
pre-normalized); a BPE-ish regex tokenizer is exposed as
``regex_tokens`` for messier text.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.io.parallelism import spread
from setup_harvest_action_spark.io.materialize import materialize

# Tiny English stopword set shared by quality scoring; the fixture
# vocabulary is lowercase tech word-soup, so 'the'/'a' are the only
# members that occur, which keeps the oracle simple and exact.
STOPWORDS = ("the", "a", "of", "and", "in")


def tokens(col: str = "text") -> Column:
    """Whitespace tokens with empties dropped."""
    return F.filter(F.split(F.col(col), " "), lambda t: t != "")


def regex_tokens(col: str = "text") -> Column:
    """Word/punct tokenizer for corpora that aren't pre-normalized:
    words, numbers, or single punctuation marks, in document order.
    Each match is marked with a trailing \\x01 delimiter
    (regexp_replace keeps the match via $1), the string is split on
    that delimiter, and residual inter-match whitespace is trimmed off
    each cell before empties are dropped."""
    marked = F.regexp_replace(F.col(col), r"(\w+|[^\w\s])", "$1")
    return F.filter(
        F.transform(F.split(marked, ""), lambda t: F.trim(t)),
        lambda t: t != "",
    )


@query(
    "q_text_token_stats",
    oracle="""
SELECT doc_id,
       lang,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INTEGER)
           AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars,
       CAST(round(length(replace(text, ' ', '')) * 1.0 /
             len(list_filter(string_split(text, ' '), t -> t <> '')), 4) AS DOUBLE)
           AS avg_token_len
FROM documents
""",
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting — the unit everything downstream
    (quality filters, cost estimates) is priced in."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


@query(
    "q_text_lang_profile",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(round(avg(len(list_filter(string_split(text, ' '), t -> t <> ''))), 4) AS DOUBLE)
           AS avg_tokens,
       CAST(round(avg(length(text)), 4) AS DOUBLE) AS avg_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
GROUP BY lang
""",
)
def q_text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per language slice — one hash aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.size(tokens())), 4).alias("avg_tokens"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.count_distinct("source").alias("n_sources"),
    )


@query(
    "q_text_quality",
    oracle="""
SELECT doc_id,
       CAST(round(len(list_filter(string_split(text, ' '),
                                  t -> t IN ('the', 'a', 'of', 'and', 'in'))) * 1.0
             / len(list_filter(string_split(text, ' '), t -> t <> '')), 6) AS DOUBLE)
           AS stopword_ratio,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INTEGER)
           AS n_tokens,
       CAST(round(len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) * 1.0
             / len(list_filter(string_split(text, ' '), t -> t <> '')), 6) AS DOUBLE)
           AS distinct_ratio,
       CAST((length(text) BETWEEN 50 AND 5000)
            AND len(list_filter(string_split(text, ' '), t -> t <> '')) >= 10
            AS BOOLEAN) AS passes_length_gate
FROM documents
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, lexical diversity, length gate —
    the standard cheap pre-filters before expensive dedup/training."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_tokens = F.size(toks)
    return docs.select(
        "doc_id",
        F.round(stop_hits / n_tokens, 6).alias("stopword_ratio"),
        n_tokens.alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n_tokens, 6).alias(
            "distinct_ratio"
        ),
        (
            F.length("text").between(50, 5000) & (n_tokens >= 10)
        ).alias("passes_length_gate"),
    )


@query(
    "q_text_tfidf",
    oracle="""
WITH toks AS (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
    FROM documents
),
tf AS (
    SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
),
df AS (
    SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.token,
       CAST(tf.tf AS BIGINT) AS tf,
       CAST(df.df AS BIGINT) AS df,
       CAST(round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS DOUBLE)
           AS tfidf
FROM tf JOIN df USING (token) CROSS JOIN n
WHERE tf.doc_id < 100
""",
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (smoothed idf: ln((N+1)/(df+1))+1) via explode + two hash
    aggregates + a broadcast-sized df join — no MLlib, no UDFs.  The
    token df table is the only shuffled intermediate and is bounded by
    vocabulary size, not corpus size.  Corpus cardinality arrives the
    same way BM25's stats do — a 1-row aggregate broadcast-cross-joined
    into the plan — so constructing the query launches NO Spark job and
    the count is not baked in as a driver-side literal."""
    # NOT spread (io/parallelism.py): the tokenize+explode here is
    # light and `docs` is referenced three times (n, tf-side, df-side)
    # — the r18 A/B measured the spread exchange net-slower (0.62 →
    # 1.04 s at sf0.1), unlike the heavy hash-explode dedup queries.
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs_total"))
    toks = docs.select("doc_id", F.explode(tokens()).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    return (
        tf.join(F.broadcast(df), "token")
        .filter(F.col("doc_id") < 100)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs_total") + 1.0) / (F.col("df") + 1.0)
                    )
                    + 1.0
                ),
                6,
            ).alias("tfidf"),
        )
    )


@query(
    "q_text_fingerprint",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(lower(trim(text)))) AS BIGINT) AS n_distinct_texts,
       min(md5(lower(trim(text)))) AS sample_fingerprint
FROM documents
GROUP BY source
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 over normalized text — the exact-dup
    key; distinct-fingerprint counts per source spot collection-level
    duplication."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(fp).alias("n_distinct_texts"),
        F.min(fp).alias("sample_fingerprint"),
    )


@query(
    "q_text_langid",
    oracle="""
WITH grams AS (
  SELECT doc_id, lang, substring(text, CAST(i AS INTEGER), 3) AS trigram
  FROM documents, UNNEST(generate_series(1, length(text) - 2)) AS t(i)
),
lang_tot AS (SELECT lang, count(*) AS lang_n FROM grams GROUP BY lang),
profile AS (
  SELECT g.lang AS profile_lang, trigram,
         CAST(count(*) AS DOUBLE) / any_value(lt.lang_n) AS p
  FROM grams g JOIN lang_tot lt ON g.lang = lt.lang
  GROUP BY g.lang, trigram
),
doc_grams AS (
  SELECT doc_id, lang, trigram, count(*) AS tf
  FROM grams GROUP BY doc_id, lang, trigram
),
scores AS (
  SELECT doc_id, dg.lang, profile_lang, sum(tf * p) AS score
  FROM doc_grams dg JOIN profile USING (trigram)
  GROUP BY doc_id, dg.lang, profile_lang
),
pred AS (
  SELECT doc_id, lang, profile_lang AS predicted_lang,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY round(score, 6) DESC, profile_lang
         ) AS rn
  FROM scores
)
SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1
GROUP BY lang, predicted_lang
""",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by learned char-trigram profiles: fit a per-language
    trigram frequency profile from the labeled corpus, classify every
    document by cosine against the profiles, report the confusion
    matrix (true lang × predicted lang).

    Two hash-aggregate passes + a broadcast of the profile table
    (vocab-bounded).  The argmax decides on ``(round(score, 6),
    profile_lang)`` — the q_embedding_kmeans shared-precision pattern:
    each engine folds the dot product in its own order, so near-tied
    profiles can differ in the last ulps; rounding to a shared
    precision with an id tie-break makes the winner identical on both
    sides (this fixture's same-vocabulary languages produce exactly
    such near-ties, which kept this query rows-only until r7).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    # substring with a dynamic start needs expr(): build (doc_id, trigram)
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
        ).alias("trigram"),
    )
    # per-language profile: trigram relative frequency
    lang_tot = grams.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_n"))
    profile = (
        grams.groupBy("lang", "trigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(lang_tot, "lang")
        .select(
            F.col("lang").alias("profile_lang"),
            "trigram",
            (F.col("n") / F.col("lang_n")).alias("p"),
        )
    )
    # per-doc trigram counts, scored against every profile via the
    # shared-trigram dot product (profiles broadcast: vocab-bounded)
    doc_grams = grams.groupBy("doc_id", "lang", "trigram").agg(
        F.count(F.lit(1)).alias("tf")
    )
    scores = (
        doc_grams.join(F.broadcast(profile), "trigram")
        .groupBy("doc_id", "lang", "profile_lang")
        .agg(F.sum(F.col("tf") * F.col("p")).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("profile_lang")
    )
    predicted = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("profile_lang").alias("predicted_lang"))
    )
    return (
        predicted.groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "q_text_zscore_by_lang",
    oracle="""
SELECT doc_id, lang,
       CAST(round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                  / stddev_samp(n_chars) OVER (PARTITION BY lang), 6)
            AS DOUBLE) AS z_chars
FROM documents
""",
)
def q_text_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF surface (SURVEY.md §2.2 "UDF surface"):
    per-language z-score of document length via
    ``groupBy.applyInPandas`` — each language slice arrives as ONE
    Arrow-backed pandas DataFrame and returns transformed rows.

    This statistic is deliberately also expressible as a window
    aggregate (that IS the oracle), so the grouped-map path gets an
    exact hash-checked gate — the pattern to copy for genuinely
    non-SQL per-group logic (model scoring, sklearn fits).  Scale
    fence: one group must fit one executor's memory; with ~5 language
    groups this caps parallelism at |groups| and a huge slice OOMs —
    for skewed/huge groups prefer the window form or mapInPandas over
    pre-partitioned data."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )

    def zscore(pdf: "pd.DataFrame") -> "pd.DataFrame":
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)  # sample stddev = stddev_samp
        pdf["z_chars"] = ((pdf["n_chars"] - mu) / sd).round(6)
        return pdf[["doc_id", "lang", "z_chars"]]

    return docs.groupBy("lang").applyInPandas(
        zscore, "doc_id long, lang string, z_chars double"
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("join", "hash", "scan")  # fixed bag-of-words query


def bm25_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, score): BM25 against the fixed BM25_QUERY bag of words
    (k1=1.2, b=0.75, Robertson idf with the +1 floor) — the shared
    scorer behind q_text_bm25 and the hybrid re-rank.  One explode of
    matched terms only, df as a tiny broadcast aggregate, corpus stats
    as a 1-row cross join; all codegen'd arithmetic."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("len").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(*BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("len") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (BM25_K1 + 1) / denom).alias("score"))
    )


@query(
    "q_text_bm25",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
    FROM documents
),
dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, avg(len) AS avgdl FROM dl),
tf AS (
    SELECT doc_id, tok, count(*) AS tf FROM toks
    WHERE tok IN ('join', 'hash', 'scan')
    GROUP BY doc_id, tok
),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
scored AS (
    SELECT tf.doc_id,
           sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.len / stats.avgdl))
           ) AS score
    FROM tf
    JOIN df ON df.tok = tf.tok
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
)
SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS bm25
FROM scored
WHERE round(score, 6) > 1.0
""",
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring against a fixed bag-of-words query — the
    lexical ranking function TF-IDF feeds into.  See ``bm25_scores``
    for the plan shape; at 100 TB the df/avgdl aggregates are the only
    corpus-wide state and they are O(|query terms|) and O(1)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    scored = bm25_scores(docs)
    return scored.select(
        "doc_id", F.round("score", 6).alias("bm25")
    ).filter(F.col("bm25") > 1.0)


# GPT-2-style pre-tokenizer shape without lookarounds, so the Java
# (Spark) and RE2 (DuckDB) engines count identical pieces: contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# residual whitespace.
BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


@query(
    "q_text_token_estimate",
    oracle=f"""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
            AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, $${BPE_ISH}$$)) AS INTEGER)
           AS bpe_ish_tokens,
       CAST(round(length(text) * 1.0 /
                  len(regexp_extract_all(text, $${BPE_ISH}$$)), 4) AS DOUBLE)
           AS chars_per_token
FROM documents
""",
)
def q_text_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token-count estimation: whitespace tokens next to a BPE-ish
    regex piece count (the GPT-2 pre-tokenizer split — what a real BPE
    merges down from, so it upper-bounds and tracks the true token
    count far better than words do).  Pure `regexp_count` — JVM-side,
    no tokenizer library, the standard way to price a 100 TB corpus in
    tokens before committing to a training run."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_count(F.col("text"), F.lit(BPE_ISH))
    return docs.select(
        "doc_id",
        F.size(tokens()).alias("ws_tokens"),
        bpe.cast("int").alias("bpe_ish_tokens"),
        F.round(F.length("text") / bpe, 4).alias("chars_per_token"),
    )


@query(
    "q_text_entropy_pandas_udf",
    oracle="""
WITH chars AS (
    SELECT doc_id, length(text) AS n_chars, unnest(string_split(text, '')) AS c
    FROM documents WHERE doc_id < 300
),
freq AS (SELECT doc_id, n_chars, c, count(*) AS n FROM chars GROUP BY 1, 2, 3)
SELECT doc_id,
       CAST(max(n_chars) AS INTEGER) AS n_chars,
       CAST(round(-sum((n * 1.0 / n_chars) * ln(n * 1.0 / n_chars)), 4)
            AS DOUBLE) AS char_entropy
FROM freq
GROUP BY doc_id
""",
)
def q_text_entropy_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ``@pandas_udf`` surface (SURVEY.md §2.2 "UDF surface"):
    per-document character-level Shannon entropy, computed vectorized
    in numpy over Arrow-batched series — the fourth UDF form beside
    mapInPandas (multimodal), applyInPandas (z-score) and
    applyInPandasWithState (streaming).

    Deliberately also expressible as explode + two hash aggregates
    (that IS the oracle), so the Python batch boundary gets an exact
    value-hash gate.  Entropy is a quality signal LLM pipelines use to
    drop binary junk / repeated-token spam; at 100 TB this runs as one
    map-only pass, no shuffle — but prefer the pure-SQL explode form
    in the hot path when the metric is SQL-expressible (UDFs are the
    slow path; this entry exists to prove the boundary, not to
    recommend it)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them and the UDF type-hint inference can't resolve
    # the function-local `pd` alias; hint-less defaults to SCALAR
    @pandas_udf("double")
    def char_entropy(texts):
        out = []
        for t in texts:
            if not t:
                out.append(0.0)
                continue
            arr = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            # fixture text is ascii; counts per byte == counts per char
            counts = np.bincount(arr)
            p = counts[counts > 0] / len(arr)
            # sort for deterministic summation order
            p.sort()
            out.append(round(float(-(p * np.log(p)).sum()), 4))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        char_entropy(F.col("text")).alias("char_entropy"),
    )


TOPK_TOKENS = 25


@query(
    "q_text_topk_tokens",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
agg AS (
  SELECT token,
         count(*) AS n_occurrences,
         count(DISTINCT doc_id) AS n_docs
  FROM tok GROUP BY token
)
SELECT token,
       CAST(n_occurrences AS BIGINT) AS n_occurrences,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, token) AS rk
  FROM agg
)
WHERE rk <= {TOPK_TOKENS}
""",
)
def q_text_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level heavy hitters: the {TOPK_TOKENS} most frequent
    tokens with occurrence and document-frequency counts — the exact
    ground truth a sketch-based frequent-items pass (count-min,
    space-saving) approximates at stream scale.

    One explode into a token-keyed hash aggregate (partial combine
    map-side shrinks the shuffle to one row per token per task), then
    a global top-k.  The final rank window is a single-partition
    gather, but its input is already vocabulary-sized (one row per
    distinct token), not corpus-sized — the same TakeOrdered economics
    as q_pagination_keyset.  Ties rank deterministically by token."""
    docs = load_table(spark, sf_dir, "documents")
    agg = (
        docs.select("doc_id", F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= TOPK_TOKENS)
    )


KWIC_TERM = "spark"
KWIC_WINDOW = 3  # context tokens on each side


@query(
    "q_text_kwic_udtf",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, toks,
         generate_subscripts(toks, 1) AS i,
         unnest(toks) AS t
  FROM tok
)
SELECT doc_id,
       CAST(i - 1 AS INTEGER) AS pos,
       array_to_string(
           toks[greatest(1, i - {KWIC_WINDOW}):least(len(toks), i + {KWIC_WINDOW})],
           ' ') AS context
FROM pos WHERE t = '{KWIC_TERM}'
""",
)
def q_text_kwic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context via a Python UDTF (Spark 4 ``@udtf``): each
    occurrence of the target term expands to one row carrying its
    token position and a ±{KWIC_WINDOW}-token context window — the
    classic corpus-linguistics concordance, and the catalog's UDTF
    surface entry (completing scalar pandas_udf / mapInPandas /
    applyInPandas / applyInPandasWithState).

    A UDTF is the Python slow path: this exact semantics is also
    expressible natively (posexplode + HOF slice — the oracle states
    it relationally), so the UDTF form exists for the 1→N LATERAL
    surface, not for speed.  It still runs WHERE THE DATA IS: the
    lateral join is per-partition, Arrow-batched, and never collects."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, context string")
    class Kwic:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF protocol
            if text is None:
                return
            toks = [t for t in text.split(" ") if t]
            for i, t in enumerate(toks):
                if t == KWIC_TERM:
                    lo = max(0, i - KWIC_WINDOW)
                    yield doc_id, i, " ".join(toks[lo : i + KWIC_WINDOW + 1])

    spark.udtf.register("kwic_concordance", Kwic)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__kwic_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.context "
        "FROM __kwic_docs, LATERAL kwic_concordance(doc_id, text) t"
    )


@query(
    "q_text_lm_score",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
tf AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM tf)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(round(avg(log10(f.tf / tot.n)), 6) AS DOUBLE) AS avg_logp
FROM tok t JOIN tf f USING (token) CROSS JOIN tot
GROUP BY t.doc_id
""",
)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram language-model score per document — the cheap
    stand-in for the KenLM perplexity filter in CCNet-style corpus
    curation: documents whose tokens are improbable under the corpus
    unigram distribution score low (avg log10 probability) and can be
    filtered or bucketed by fluency.

    Plan: the explode is aggregated ONCE into per-(doc, token) counts;
    the corpus term-frequency table, the corpus total, and the per-doc
    score all derive from that one shuffled aggregate, so Spark's
    exchange reuse keeps it a single documents scan (pinned by
    tests/test_plans contract) instead of re-exploding the corpus per
    branch.  The token->tf join shuffles on token with a
    vocabulary-sized build side; the corpus total enters as a
    broadcast one-row aggregate — never a driver collect.  At 100 TB
    the vocabulary table is exactly the model; a real KenLM swap-in
    would replace the join with a Pandas-UDF scorer against a
    broadcast binary model."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    dt = (
        docs.select("doc_id", F.explode(tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tf = dt.groupBy("token").agg(F.sum("c").alias("tf"))
    total = tf.agg(F.sum("tf").cast("double").alias("n"))
    # weighted mean: avg over token OCCURRENCES == sum(c·logp)/sum(c)
    return (
        dt.join(tf, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(
                F.sum(F.col("c") * F.log10(F.col("tf") / F.col("n")))
                / F.sum("c"),
                6,
            ).alias("avg_logp"),
        )
    )


@query(
    "q_text_bytes_mapinarrow",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
           AS n_spaces
FROM documents
""",
)
def q_text_bytes_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level document stats via ``mapInArrow`` — the last cell of
    the Python-UDF surface matrix (scalar pandas_udf / applyInPandas /
    applyInPandasWithState / mapInPandas / UDTF / mapInArrow): the
    function receives raw Arrow RecordBatches and answers with Arrow,
    skipping the pandas conversion entirely — the lowest-overhead
    Python hook, the right one for byte-oriented work (tokenizer byte
    budgets, encoding audits) where pandas object-dtype strings would
    dominate the cost.

    All three stats recompute in SQL (bytes = strlen, chars = length,
    spaces = length delta), so unlike the other UDF demos this Arrow
    path is value-checked exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def byte_stats(batches):
        for batch in batches:
            txt = batch.column(1)
            n_bytes = pc.binary_length(txt.cast(pa.binary()))
            n_chars = pc.utf8_length(txt)
            n_spaces = pc.count_substring(txt, " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    n_bytes.cast(pa.int64()),
                    n_chars.cast(pa.int64()),
                    n_spaces.cast(pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_chars", "n_spaces"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        byte_stats, "doc_id long, n_bytes long, n_chars long, n_spaces long"
    )


NGRAM_UDTF_N = 3  # trigram instantiation the catalog query pins


@query(
    "q_text_ngrams_udtf",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
)
, pos AS (
  SELECT doc_id, toks, generate_subscripts(toks, 1) AS i FROM tok
)
SELECT doc_id,
       CAST(i - 1 AS INTEGER) AS pos,
       toks[i]     AS g1,
       toks[i + 1] AS g2,
       toks[i + 2] AS g3
FROM pos
WHERE i <= len(toks) - {NGRAM_UDTF_N - 1}
""",
)
def q_text_ngrams_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding n-gram expansion via a POLYMORPHIC Python UDTF: the
    output schema is not declared statically — ``analyze()`` receives
    the constant ``n`` argument at plan time and synthesizes one
    ``g1..gN`` column per gram position.  This completes the UDTF
    surface beyond the static-schema kwic entry: schema-from-arguments
    is the capability that makes a table function reusable across
    n (the catalog instantiates n={NGRAM_UDTF_N} so the oracle can
    state the trigram form relationally).

    Same execution story as every UDTF here: per-partition lateral
    join, Arrow-batched, runs where the data is."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGrams:
        @staticmethod
        def analyze(
            doc_id: AnalyzeArgument, text: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError("ngrams: n must be a constant positive int")
            fields = [
                StructField("doc_id", LongType()),
                StructField("pos", IntegerType()),
            ] + [
                StructField(f"g{i + 1}", StringType()) for i in range(n.value)
            ]
            return AnalyzeResult(StructType(fields))

        def eval(self, doc_id, text, n):  # noqa: ANN001 - UDTF protocol
            if text is None:
                return
            toks = [t for t in text.split(" ") if t]
            for i in range(len(toks) - n + 1):
                yield (doc_id, i, *toks[i : i + n])

    spark.udtf.register("doc_ngrams", udtf(NGrams))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__ngram_docs"
    )
    cols = ", ".join(f"t.g{i + 1}" for i in range(NGRAM_UDTF_N))
    return spark.sql(
        f"SELECT t.doc_id, t.pos, {cols} "
        f"FROM __ngram_docs, "
        f"LATERAL doc_ngrams(doc_id, text, {NGRAM_UDTF_N}) t"
    )


PMI_MIN_COUNT = 5  # bigram support floor
PMI_TOP = 20


@query(
    "q_text_collocations",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, toks, generate_subscripts(toks, 1) AS i FROM tok
),
bi AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2, count(*) AS n_pair
  FROM pos WHERE i < len(toks)
  GROUP BY 1, 2
),
uni AS (
  SELECT unnest(toks) AS w FROM tok
),
uc AS (SELECT w, count(*) AS n FROM uni GROUP BY w),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n_tokens FROM uc)
SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
       CAST(round(
           ln(n_pair * tot.n_tokens / (a.n * CAST(b.n AS DOUBLE))), 6) + 0.0
           AS DOUBLE) AS pmi
FROM bi
JOIN uc a ON a.w = bi.w1
JOIN uc b ON b.w = bi.w2
CROSS JOIN tot
WHERE n_pair >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {PMI_TOP}
""",
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining via pointwise mutual information: adjacent
    token pairs scored by ln(P(ab) / (P(a)·P(b))) — the corpus-
    linguistics detector for phrases that co-occur far above chance
    (and a standard feature in tokenizer/vocab construction).

    Shuffle discipline: bigram and unigram counts are two keyed
    aggregates with map-side combine; everything after them is
    vocabulary-sized — the unigram joins hit |vocab| rows and the
    corpus total arrives as a broadcast one-row sum, so no stage after
    the counts scales with the corpus.  PMI uses the simple n_pair /
    n_tokens estimator on both sides; ties break on the pair so the
    top-{PMI_TOP} is deterministic."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    # project the token array FIRST (HOF CSE trap — see OPERATORS.md):
    # index expressions below reference the column, never re-tokenize
    toks = docs.select(tokens().alias("toks"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.struct(
            F.element_at(F.col("toks"), i).alias("w1"),
            F.element_at(F.col("toks"), i + F.lit(1)).alias("w2"),
        ),
    )
    bi = (
        toks.filter(F.size("toks") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    uc = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = uc.agg(F.sum("n").cast("double").alias("n_tokens"))
    a = uc.select(F.col("w").alias("w1"), F.col("n").alias("na"))
    b = uc.select(F.col("w").alias("w2"), F.col("n").alias("nb"))
    return (
        bi.filter(F.col("n_pair") >= PMI_MIN_COUNT)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_pair",
            (
                F.round(
                    F.log(
                        F.col("n_pair")
                        * F.col("n_tokens")
                        / (F.col("na") * F.col("nb").cast("double"))
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(PMI_TOP)
    )


@query(
    "q_text_minmax_scale_arrow",
    oracle="""
SELECT doc_id, lang,
       CAST(round(CASE WHEN max(n_chars) OVER w = min(n_chars) OVER w THEN 0.0
                       ELSE (n_chars - min(n_chars) OVER w) * 1.0
                            / (max(n_chars) OVER w - min(n_chars) OVER w)
                  END, 6) AS DOUBLE) AS scaled
FROM documents
WINDOW w AS (PARTITION BY lang)
""",
)
def q_text_minmax_scale_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map over RAW ARROW: per-language min-max scaling of
    document length through ``applyInArrow`` — the zero-copy sibling
    of ``q_text_zscore_by_lang``'s applyInPandas, completing the Arrow
    UDF surface (pandas_udf / applyInPandas(±State) / mapInPandas /
    mapInArrow / udtf / applyInArrow).  The whole group arrives as one
    ``pyarrow.Table`` and the math runs in pyarrow.compute kernels —
    no pandas materialization, no Python-object row round-trip, which
    for wide binary/text groups removes the last copy mapInPandas
    still pays.

    Same scale contract as every grouped-map: one shuffle on the group
    key, per-group memory bounded by the largest group (a language IS
    a large group at 100 TB — the production variant pre-aggregates
    min/max per key and broadcasts them, trading the grouped map for
    two scans; kept grouped here because exercising the Arrow grouped
    surface is the point)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def scale(table: pa.Table) -> pa.Table:
        n = table.column("n_chars")
        lo = pc.min(n).as_py()
        hi = pc.max(n).as_py()
        if hi == lo:
            scaled = pa.array([0.0] * table.num_rows, type=pa.float64())
        else:
            # round_mode matters cross-engine: pyarrow defaults to
            # bankers' half-to-even, DuckDB/Spark round half away from
            # zero (pyarrow spells it half_towards_infinity; scaled values
            # here are non-negative, so the two agree) — an exactly-
            # representable tie like 0.4453125 then
            # hashes differently (surfaced by the sf0.1 full-gate run)
            scaled = pc.round(
                pc.divide(
                    pc.cast(pc.subtract(n, lo), pa.float64()),
                    float(hi - lo),
                ),
                ndigits=6,
                round_mode="half_towards_infinity",
            )
        return pa.table(
            {
                "doc_id": table.column("doc_id"),
                "lang": table.column("lang"),
                "scaled": scaled,
            }
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInArrow(
        scale, "doc_id long, lang string, scaled double"
    )


ZIPF_TOP_RANKS = 500  # fit over the head of the rank-frequency curve


@query(
    "q_text_zipf_fit",
    oracle=f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
counts AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
ranked AS (
  SELECT freq,
         row_number() OVER (ORDER BY freq DESC, token) AS rk
  FROM counts
)
SELECT CAST(round(regr_slope(ln(freq), ln(rk)), 4) + 0.0 AS DOUBLE) AS zipf_slope,
       CAST(round(regr_intercept(ln(freq), ln(rk)), 4) + 0.0 AS DOUBLE)
         AS zipf_intercept,
       CAST(round(regr_r2(ln(freq), ln(rk)), 4) AS DOUBLE) AS fit_r2,
       CAST(count(*) AS BIGINT) AS n_ranks
FROM ranked WHERE rk <= {ZIPF_TOP_RANKS}
""",
)
def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus rank-frequency curve: regress
    ln(freq) on ln(rank) over the top {ZIPF_TOP_RANKS} ranks — the
    one-row corpus-health statistic (natural language sits near slope
    −1; a corpus of boilerplate or randomly generated text departs
    sharply, so the slope + R² pair is a cheap corpus-level quality
    gate beside the per-document scores in functions/quality.py).

    Shape: one explode into a token-keyed partial/final aggregate
    (vocabulary-sized output), a rank window over that VOCABULARY —
    single-partition but bounded by |vocab|, never corpus-sized (the
    q_text_topk_tokens economics) — then regr_slope/intercept/r2,
    which both engines define identically as the least-squares co-
    moment forms, rounded to a shared scale.  One corpus pass total."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    ranked = counts.select(
        "freq",
        F.row_number()
        .over(Window.orderBy(F.desc("freq"), "token"))
        .alias("rk"),
    ).filter(F.col("rk") <= ZIPF_TOP_RANKS)
    lf, lr = F.ln("freq"), F.ln("rk")
    return ranked.agg(
        # signed-zero sweep (r13): slope/intercept are signed doubles.
        (F.round(F.regr_slope(lf, lr), 4) + F.lit(0.0)).alias("zipf_slope"),
        (F.round(F.regr_intercept(lf, lr), 4) + F.lit(0.0)).alias(
            "zipf_intercept"
        ),
        F.round(F.regr_r2(lf, lr), 4).alias("fit_r2"),
        F.count("*").cast("bigint").alias("n_ranks"),
    )


LM_LAMBDA = 0.8  # Jelinek-Mercer interpolation weight on the bigram term


@query(
    "q_text_lm_bigram_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
),
big AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, greatest(len(tk) - 1, 0))) t(i)
),
db AS (SELECT doc_id, w1, w2, count(*) AS c FROM big GROUP BY 1, 2, 3),
bt AS (SELECT w1, w2, sum(c) AS cb FROM db GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c) AS cw FROM db GROUP BY 1),
uni AS (SELECT w2, sum(c) AS cu FROM db GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM db)
SELECT d.doc_id,
       CAST(sum(d.c) AS BIGINT) AS n_bigrams,
       CAST(round(sum(d.c * log10(
           {LM_LAMBDA} * bt.cb / ctx.cw
           + {1 - LM_LAMBDA} * uni.cu / tot.n)) / sum(d.c), 6) AS DOUBLE)
         AS avg_logp_bi
FROM db d
JOIN bt ON bt.w1 = d.w1 AND bt.w2 = d.w2
JOIN ctx ON ctx.w1 = d.w1
JOIN uni ON uni.w2 = d.w2
CROSS JOIN tot
GROUP BY d.doc_id
""",
)
def q_text_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated BIGRAM language-model score per document
    (Jelinek-Mercer: λ·P(w₂|w₁) + (1−λ)·P(w₂), λ={LM_LAMBDA}) — one
    step up the n-gram ladder from q_text_lm_score toward the KenLM
    perplexity filter of CCNet-style curation: repetitive or
    template-generated text scores HIGH (its bigrams are corpus-
    frequent), disfluent text scores low, and the unigram backoff
    keeps unseen-context probabilities finite without smoothing
    hyperparameters.

    All four model tables — per-doc bigram counts, corpus bigram
    counts, context marginals, unigram marginals — derive from ONE
    exploded-bigram aggregate over the same event space (positions
    1..n−1), MATERIALIZED once (the repo's parquet lineage cut): five
    consumers re-read the bounded aggregate, and the corpus is
    scanned and exploded exactly once — measured before the cut,
    Catalyst's ReuseExchange only deduplicated one of the four
    marginal branches (4 corpus scans); after it, one (plan-pinned).
    The model joins run at bigram-vocabulary size, never corpus
    size, and the corpus total enters as a broadcast one-row
    aggregate.  At 100 TB the
    bigram table IS the model — the swap-in for a real KenLM binary
    is a Pandas-UDF scorer against a broadcast model file."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    # bind the token array to a real column BEFORE the bigram lambda —
    # an inline filter(split(...)) would re-tokenize per position (the
    # O(len²) CSE trap documented on dedup.shingles)
    toked = docs.select("doc_id", tokens().alias("tk"))
    big = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(tk) - 1, 0)),"
                " i -> struct(tk[i - 1] AS w1, tk[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    db = materialize(
        big.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("c")),
        "lm_bigram_counts",
    )
    bt = db.groupBy("w1", "w2").agg(F.sum("c").alias("cb"))
    ctx = db.groupBy("w1").agg(F.sum("c").alias("cw"))
    uni = db.groupBy("w2").agg(F.sum("c").alias("cu"))
    tot = db.agg(F.sum("c").cast("double").alias("n"))
    p = (
        F.lit(LM_LAMBDA) * F.col("cb") / F.col("cw")
        + F.lit(1 - LM_LAMBDA) * F.col("cu") / F.col("n")
    )
    return (
        db.join(bt, ["w1", "w2"])
        .join(ctx, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(
                F.sum(F.col("c") * F.log10(p)) / F.sum("c"), 6
            ).alias("avg_logp_bi"),
        )
    )


FEATURE_DIM = 256  # hashed feature space (2^8)


@query(
    "q_text_feature_hashing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t.token
  FROM documents,
       UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) t(token)
  WHERE doc_id < 100
),
h AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(token), 1, 8) AS BIGINT)
           % {FEATURE_DIM} AS feature_idx,
         CASE WHEN CAST('0x' || substring(md5(token), 9, 1) AS BIGINT) % 2
                   = 0
              THEN 1 ELSE -1 END AS sign
  FROM toks
)
SELECT doc_id, feature_idx,
       CAST(sum(sign) AS BIGINT) AS weight
FROM h GROUP BY doc_id, feature_idx
HAVING sum(sign) <> 0
""",
)
def q_text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATURE HASHING (the hashing trick, Weinberger et al. 2009) —
    vocabulary-free text vectorization: token → md5-derived index in a
    fixed {FEATURE_DIM}-dim space, with a second hash bit supplying a
    ±1 sign so colliding tokens cancel in expectation instead of
    accumulating bias.  The output is the sparse (doc, feature,
    weight) triple set — the featurizer for linear
    classifiers/regressors over corpora where a vocabulary pass is a
    whole extra corpus scan (TF-IDF's corpus-DF join is exactly what
    this trades away).

    Scale shape: ONE scan, one explode, one (doc, feature) keyed
    partial/final sum — no vocabulary table, no join, no second pass;
    the sparse output is at most min(|tokens|, D) rows per document.
    Index and sign both derive from md5, which both engines share, so
    the whole featurization carries an exact cross-engine hash oracle
    (the winnowing/MinHash precedent); zero-sum features drop on both
    sides (HAVING ≠ 0) since a canceled feature is absent from a
    sparse vector."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("token"),
    )
    m = F.md5(F.col("token"))
    h = toks.select(
        "doc_id",
        (
            F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
            % FEATURE_DIM
        ).alias("feature_idx"),
        F.when(
            F.conv(F.substring(m, 9, 1), 16, 10).cast("long") % 2 == 0, 1
        )
        .otherwise(-1)
        .alias("sign"),
    )
    return (
        h.groupBy("doc_id", "feature_idx")
        .agg(F.sum("sign").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )


_TEXTRANK_D = 0.85


def _textrank_oracle() -> str:
    it = """
s{n} AS (
  SELECT nodes.word,
         {omd} + {d} * coalesce(c{n}.s, 0) AS score
  FROM nodes LEFT JOIN (
    SELECT e.dst AS word, sum(e.w * s{p}.score / wd.wdeg) AS s
    FROM edges e
    JOIN s{p} ON e.src = s{p}.word
    JOIN wdeg wd ON e.src = wd.src
    GROUP BY e.dst
  ) c{n} ON nodes.word = c{n}.word)"""
    its = ",".join(
        it.format(n=i, p=i - 1, d=_TEXTRANK_D, omd=1.0 - _TEXTRANK_D)
        for i in (1, 2)
    )
    return f"""
WITH tl AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents
),
toks AS (
  -- parallel unnests zip in DuckDB: (token, ordinal) pairs
  SELECT doc_id, unnest(l) AS token,
         unnest(range(1, len(l) + 1)) AS ord
  FROM tl
),
adj AS (
  SELECT a.token AS u, b.token AS v, count(*) AS w
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
  WHERE a.token <> b.token
  GROUP BY 1, 2
),
edges AS (
  SELECT u AS src, v AS dst, w FROM adj
  UNION ALL
  SELECT v AS src, u AS dst, w FROM adj
),
wdeg AS (SELECT src, CAST(sum(w) AS DOUBLE) AS wdeg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS word FROM edges),
s0 AS (SELECT word, 1.0 AS score FROM nodes),{its}
SELECT word, CAST(round(score, 8) AS DOUBLE) AS score FROM s2
"""


@query("q_text_textrank", oracle=_textrank_oracle())
def q_text_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEXTRANK keyword scoring (Mihalcea & Tarau 2004) — weighted
    PageRank over the corpus word-adjacency graph: words that co-occur
    next to many well-connected words score high; the unsupervised
    keyword/keyphrase extractor a curation pipeline runs where TF-IDF
    is too local (TF-IDF scores a word per document; TextRank scores
    its centrality in the corpus's co-occurrence structure).  Two
    unrolled weighted-PageRank iterations, damping 0.85, scores
    emitted for the WHOLE vocabulary (no top-k cut, so float drift at
    the boundary cannot flip the result set — the pagerank precedent).

    Spark shape: adjacency from ONE posexplode + a (doc, position)
    self-join; the corpus graph collapses to vocabulary² size at the
    first aggregate, and every downstream join (weighted degree,
    per-iteration contributions) runs at vocabulary scale — the raw
    corpus is scanned once.  Same unrolled-CTE oracle pattern as
    q_graph_pagerank; weighted row-normalization (w/wdeg) replaces
    1/outdeg."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("pos", "token"),
    )
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("token").alias("u"))
    b = toks.select("doc_id", F.col("pos").alias("pb"), F.col("token").alias("v"))
    adj = (
        a.join(b, (a["doc_id"] == b["doc_id"]) & (F.col("pb") == F.col("pa") + 1))
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = adj.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionAll(adj.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w"))
    from setup_harvest_action_spark.io.materialize import materialize

    edges = materialize(edges, "textrank_edges")
    wdeg = edges.groupBy("src").agg(F.sum("w").cast("double").alias("wdeg"))
    nodes = edges.select(F.col("src").alias("word")).distinct()
    scores = nodes.select("word", F.lit(1.0).alias("score"))
    for _ in range(2):
        contrib = (
            edges.join(
                scores.select(F.col("word").alias("src"), "score"), "src"
            )
            .join(wdeg, "src")
            .groupBy(F.col("dst").alias("word"))
            .agg(
                F.sum(F.col("w") * F.col("score") / F.col("wdeg")).alias("s")
            )
        )
        scores = nodes.join(contrib, "word", "left").select(
            "word",
            (
                F.lit(1.0 - _TEXTRANK_D)
                + F.lit(_TEXTRANK_D) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("score"),
        )
    return scores.select("word", F.round("score", 8).alias("score"))


NOVELTY_K = 3  # shingle width for the novelty score


@query(
    "q_text_novelty",
    oracle=f"""
WITH sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(toks) - {NOVELTY_K - 1}, 0) + 1),
               i -> substring(md5(
                   array_to_string(toks[i : i + {NOVELTY_K - 1}], ' ')),
                   1, 16)
           ))) AS s
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS toks
          FROM documents)
),
df AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unique,
       CAST(round(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1.0
                  / count(*), 6) AS DOUBLE) AS novelty
FROM sh JOIN df ON df.s = sh.s
GROUP BY sh.doc_id
""",
)
def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document NOVELTY score: the fraction of a document's
    distinct {NOVELTY_K}-gram shingles that appear NOWHERE else in
    the corpus (corpus document frequency = 1) — high novelty marks
    fresh material worth keeping, low novelty marks boilerplate-
    and-remix territory the dedup family then examines; the same
    signal, inverted, estimates memorization risk for eval-set
    construction.

    One exploded-shingle shuffle builds the df table (shingles hashed
    in place to 16-hex md5 keys — the repo's r9 discipline), one join
    back on the shingle key scores documents: both sides of the join
    are the SAME exploded relation, so AQE reuses the exchange; no
    all-pairs anything, no caps needed (df is a count, not a posting
    list)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.filter(
                        F.transform(
                            F.sequence(
                                F.lit(1),
                                F.greatest(
                                    F.size(tokens()) - (NOVELTY_K - 1),
                                    F.lit(0),
                                ),
                            ),
                            lambda i: F.concat_ws(
                                " ",
                                *[
                                    F.element_at(tokens(), i + j)
                                    for j in range(NOVELTY_K)
                                ],
                            ),
                        ),
                        lambda x: x != "",
                    ),
                    lambda s: F.substring(F.md5(s), 1, 16),
                )
            )
        ).alias("s"),
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias(
                "n_unique"
            ),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
    )
