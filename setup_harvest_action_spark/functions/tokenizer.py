"""BPE tokenizer training and encoding over ``documents``.

LLM-pipeline pillar (SURVEY.md §2.2): the step between raw text and
token-priced corpus assembly is learning a subword vocabulary.  This
module trains a byte-pair-encoding merge table on the corpus and
applies it, both fully cross-engine oracled — the iterative merge loop
is unrolled in the DuckDB oracle exactly like the Lloyd iterations in
``q_embedding_kmeans``.

Algorithm (classic BPE, Sennrich et al. 2016 — public knowledge):

1. one corpus scan reduces ``documents.text`` to the unique-token
   frequency table (the WORD table) — after this scan every training
   round touches vocabulary-sized data only, never the corpus;
2. each round counts adjacent symbol pairs weighted by word frequency
   (one shuffle keyed on the pair — alphabet²-bounded), picks the
   arg-max pair with a deterministic tie-break
   (count DESC, left ASC, right ASC), and rewrites every word's
   symbol sequence with that pair merged;
3. after ``BPE_MERGES`` rounds the learned merge table IS the
   tokenizer; encoding a document is a map-only chain of literal
   ``replace`` calls — no shuffle at any scale.

Symbol sequences are represented as delimiter-wrapped strings
(``"abc"`` → ``~a~~b~~c~``): each symbol owns BOTH its delimiters, so
the pair pattern ``~l~~r~`` never shares characters with an adjacent
match and a plain left-to-right non-overlapping ``replace`` — the same
primitive in Spark (Java ``String.replace``) and DuckDB — implements
one BPE merge pass exactly (``a a a a`` + merge ``(a,a)`` →
``aa aa``, never ``aa a a``).  The fixture alphabet is lowercase
ASCII (TESTDATA.md), so ``~`` cannot occur in a token.

Scale design (100 TB): the corpus is touched exactly twice — once to
build the word-frequency table (hash aggregate, map-side combine) and
once to encode (map-only).  All ``BPE_MERGES`` training rounds run on
the vocabulary table (~10⁶ rows for a 100 TB web corpus — a single
executor's worth of data), and each round's arg-max row is
materialized (lineage cut, ``io/materialize.py``) and re-attached via
``crossJoin(broadcast(one_row))`` — the repo's documented scalar-
attach shape, no driver collect anywhere.

No counterpart in the reference (``harvest.py`` has no tokenizer);
this is north-star LLM-pipeline surface like functions/dedup.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.io.materialize import materialize

BPE_MERGES = 8  # unrolled identically in the DuckDB oracles below

_SEP = "~"  # symbol delimiter; fixture tokens are lowercase ASCII


def _word_repr(col):
    """token → delimiter-wrapped initial symbol sequence (chars)."""
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    return F.concat(F.lit(_SEP), F.array_join(chars, _SEP * 2), F.lit(_SEP))


def _symbols(repr_col):
    """delimiter-wrapped repr → symbol array."""
    return F.split(F.trim(repr_col, F.lit(_SEP)), _SEP * 2)


def _adjacent_pairs(repr_col):
    """repr → array<struct<p1,p2>> of adjacent symbol pairs (each
    position one element, so an in-word repeat counts every time,
    matching classic BPE pair statistics)."""
    syms = _symbols(repr_col)
    return F.filter(
        F.zip_with(
            syms,
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(1))),
            lambda a, b: F.struct(a.alias("p1"), b.alias("p2")),
        ),
        lambda p: p["p2"].isNotNull(),
    )


def train_bpe(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    text_col: str = "text",
) -> list[DataFrame]:
    """Learn ``n_merges`` BPE merges from ``docs[text_col]``.

    Returns the learned merges as a list of ONE-ROW DataFrames
    ``(merge_rank int, p1, p2, merged string, pair_count bigint)``,
    each already materialized (plain parquet scan) so callers can
    ``crossJoin(broadcast(...))`` them in order without re-deriving
    earlier rounds — the same lineage-cut discipline as PageRank/CC.
    """
    tok = F.explode(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    ).alias("word")
    words = (
        docs.select(tok)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(_word_repr(F.col("word")).alias("repr"), "freq")
    )
    # lineage cut: every round's pair aggregate re-references the word
    # table; without the cut each round re-runs the CORPUS scan +
    # reduce.  At fixture scale the wall-clock is per-round scheduler
    # cost either way (~1.6s/round on this box), but at 100 TB the
    # uncut form re-reads the corpus K times — the cut is the scale
    # fix, not a local-bench one.
    words = materialize(words, "bpe_words")
    merges: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        pair = F.explode(_adjacent_pairs(F.col("repr"))).alias("pair")
        best = (
            words.select(pair, "freq")
            .groupBy(F.col("pair.p1").alias("p1"), F.col("pair.p2").alias("p2"))
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "p1", "p2")
            .limit(1)
            .select(
                F.lit(rank).alias("merge_rank"),
                "p1",
                "p2",
                F.concat("p1", "p2").alias("merged"),
                "pair_count",
            )
        )
        best = materialize(best, f"bpe_merge_{rank}")
        if not best.head(1):
            # no adjacent pairs remain (degenerate corpus / exhausted
            # merges): stop — continuing would crossJoin the empty
            # arg-max and silently wipe the word table
            break
        merges.append(best)
        pat = F.concat(
            F.lit(_SEP), F.col("p1"), F.lit(_SEP * 2), F.col("p2"), F.lit(_SEP)
        )
        rep = F.concat(F.lit(_SEP), F.col("merged"), F.lit(_SEP))
        words = (
            words.crossJoin(F.broadcast(best))
            .select(F.replace("repr", pat, rep).alias("repr"), "freq")
        )
    return merges


def bpe_segment(docs: DataFrame, merges: list[DataFrame]) -> DataFrame:
    """Apply a learned merge list to every whitespace token of
    ``docs.text`` — map-only: each one-row merge is broadcast-attached
    and applied inside an array ``transform``, so encoding shuffles
    nothing at any corpus size.  Adds a ``reprs`` array column (one
    delimiter-wrapped symbol string per token)."""
    out = docs
    for i, m in enumerate(merges):
        out = out.crossJoin(
            F.broadcast(
                m.select(
                    F.concat(
                        F.lit(_SEP), "p1", F.lit(_SEP * 2), "p2", F.lit(_SEP)
                    ).alias(f"pat{i}"),
                    F.concat(F.lit(_SEP), "merged", F.lit(_SEP)).alias(
                        f"rep{i}"
                    ),
                )
            )
        )

    def encode_token(t):
        r = _word_repr(t)
        for i in range(len(merges)):
            r = F.replace(r, F.col(f"pat{i}"), F.col(f"rep{i}"))
        return r

    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    return out.withColumn("reprs", F.transform(toks, encode_token))


# --------------------------------------------------------------------
# Oracle construction: the training loop unrolled in plain SQL.  Each
# round i has CTEs p{i} (pair counts), b{i} (arg-max merge) and
# w{i+1} (rewritten words); the SQL is generated by the same loop
# shape as the Spark code so the two stay term-for-term comparable.
# --------------------------------------------------------------------


def _oracle_train_ctes(n_merges: int) -> str:
    parts = [
        """
words AS (
    SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
    WHERE t <> ''
    GROUP BY t
),
w0 AS (
    SELECT '~' || array_to_string(string_split(word, ''), '~~') || '~'
               AS repr,
           freq
    FROM words
)"""
    ]
    for i in range(n_merges):
        parts.append(
            f"""
p{i} AS (
    SELECT l[i] AS p1, l[i + 1] AS p2, CAST(sum(freq) AS BIGINT) AS pair_count
    FROM (
        SELECT unnest(generate_series(1, len(l) - 1)) AS i, l, freq
        FROM (SELECT string_split(trim(repr, '~'), '~~') AS l, freq FROM w{i})
    )
    GROUP BY 1, 2
),
b{i} AS (
    SELECT {i + 1} AS merge_rank, p1, p2, p1 || p2 AS merged, pair_count
    FROM p{i}
    ORDER BY pair_count DESC, p1, p2
    LIMIT 1
),
w{i + 1} AS (
    SELECT replace(repr, '~' || b.p1 || '~~' || b.p2 || '~',
                         '~' || b.merged || '~') AS repr,
           freq
    FROM w{i}, b{i} b
)"""
        )
    return ",".join(parts)


_TRAIN_ORACLE = (
    "WITH "
    + _oracle_train_ctes(BPE_MERGES)
    + "\n"
    + "\nUNION ALL ".join(
        f"SELECT CAST(merge_rank AS INTEGER) AS merge_rank, p1, p2, merged,"
        f" pair_count FROM b{i}"
        for i in range(BPE_MERGES)
    )
)


_ENCODE_ORACLE = (
    "WITH "
    + _oracle_train_ctes(BPE_MERGES)
    + f""",
tok AS (
    SELECT doc_id, t
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
    WHERE t <> ''
),
r0 AS (
    SELECT doc_id,
           '~' || array_to_string(string_split(t, ''), '~~') || '~' AS repr
    FROM tok
),"""
    + ",".join(
        f"""
r{i + 1} AS (
    SELECT doc_id,
           replace(repr, '~' || b.p1 || '~~' || b.p2 || '~',
                         '~' || b.merged || '~') AS repr
    FROM r{i}, b{i} b
)"""
        for i in range(BPE_MERGES)
    )
    + f"""
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(string_split(trim(repr, '~'), '~~'))) AS BIGINT)
           AS n_bpe_tokens,
       CAST(round(sum(length(trim(repr, '~'))
                      - 2 * (len(string_split(trim(repr, '~'), '~~')) - 1))
                  * 1.0
                  / sum(len(string_split(trim(repr, '~'), '~~'))), 4)
            AS DOUBLE) AS chars_per_bpe_token
FROM r{BPE_MERGES}
GROUP BY doc_id
"""
)


@query("q_text_bpe_train", oracle=_TRAIN_ORACLE)
def q_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the corpus BPE merge table (BPE_MERGES rounds).

    Corpus is scanned once (word-frequency reduce); every training
    round is a pair-keyed hash aggregate over the vocabulary table
    plus a TakeOrderedAndProject(1) arg-max — vocabulary-sized work
    regardless of corpus size.  The oracle unrolls the identical loop
    in SQL (same tie-break, same replace semantics)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(spark, docs)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


@query("q_text_bpe_encode", oracle=_ENCODE_ORACLE)
def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the learned merge table and price
    it: words, BPE tokens, and mean characters per BPE token (merges
    learned on the corpus compress it below 1 char/symbol baseline...
    i.e. above 1.0 chars per token).

    Encoding is MAP-ONLY — the merge table arrives as BPE_MERGES
    broadcast one-row joins and the replace chain runs inside an array
    ``transform`` per document; the only shuffle is the final doc_id
    aggregate, and even that collapses to a map-side combine because
    the transform keeps rows intact (one row per doc in = one out)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(spark, docs)
    seg = bpe_segment(docs, merges)
    syms_per = F.transform(F.col("reprs"), lambda r: F.size(_symbols(r)))
    chars_per = F.transform(
        F.col("reprs"),
        lambda r: F.length(F.trim(r, F.lit(_SEP)))
        - 2 * (F.size(_symbols(r)) - 1),
    )
    total_syms = F.aggregate(syms_per, F.lit(0), lambda acc, x: acc + x)
    total_chars = F.aggregate(chars_per, F.lit(0), lambda acc, x: acc + x)
    return seg.select(
        "doc_id",
        F.size("reprs").cast("long").alias("n_words"),
        total_syms.cast("long").alias("n_bpe_tokens"),
        F.round(total_chars / total_syms, 4).alias("chars_per_bpe_token"),
    )
