"""Sampling & corpus assembly over ``documents``: deterministic hash
sampling, train/valid/test splits, stratified draws, mixture design,
context-window chunking.

LLM-pipeline pillar (SURVEY.md §2.2 extension): after filtering and
dedup, a training-data pipeline SAMPLES (to hit a token budget), SPLITS
(held-out sets), BALANCES (per-language / per-source quotas), WEIGHTS
(mixture proportions across sources) and CHUNKS (documents into context
windows).  Design rules:

  * All sampling is DETERMINISTIC-BY-HASH: membership is a pure
    function of the row key (md5 hex-prefix compare), so samples are
    reproducible across runs/engines, stable under re-partitioning,
    and need no state or RNG seeds shipped to executors.  md5 is
    bit-identical in Spark and DuckDB, so every query here carries an
    exact value-hash oracle — rare for sampling operators.
  * Everything is one scan + narrow ops (filter/window/explode); the
    only shuffles are keyed aggregates or per-class windows.  At
    100 TB the Bernoulli/split queries are map-only: they pushdown-
    prune columns and never shuffle at all.
  * Fractions are hex-prefix thresholds over the first 2 md5 chars
    (256 buckets): '1a' = 26/256 ≈ 10.2%, 'cc' = 204/256 ≈ 79.7%.
    Finer grain would use more chars; 2 keep the oracle legible.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table

SAMPLE_THRESHOLD = "1a"  # 26/256 ~ 10.2% Bernoulli sample
TRAIN_THRESHOLD = "cc"  # < cc -> train  (204/256 ~ 79.7%)
VALID_THRESHOLD = "e6"  # < e6 -> valid  (another 26/256 ~ 10.2%)
STRATA_K = 50  # stratified draw size per language
CHUNK_SIZE = 64  # tokens per context window
CHUNK_STRIDE = 48  # window stride (16-token overlap)


def hash_bucket(key: Column) -> Column:
    """First two hex chars of md5(key) — a uniform 256-way bucket that
    is identical in Spark and DuckDB (and any engine with md5), the
    portable primitive under every sampler here."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


@query(
    "q_sample_bernoulli_hash",
    oracle=f"""
SELECT doc_id, lang, source,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{SAMPLE_THRESHOLD}'
""",
)
def q_sample_bernoulli_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample by key hash: membership is a
    pure function of doc_id, so the sample is reproducible, stable
    under repartitioning, and needs no RNG state.  Map-only — no
    shuffle at any scale (contrast ``df.sample()``, which is seeded
    per-partition and changes under repartitioning)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "source", bucket.alias("bucket"))
        .filter(F.col("bucket") < SAMPLE_THRESHOLD)
    )


@query(
    "q_sample_train_valid_test",
    oracle=f"""
SELECT doc_id,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_THRESHOLD}'
                THEN 'train'
            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{VALID_THRESHOLD}'
                THEN 'valid'
            ELSE 'test' END AS split,
       lang
FROM documents
""",
)
def q_sample_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-assigned train/valid/test split (~80/10/10): every document
    lands in exactly one split, forever — re-running the pipeline, on
    any cluster layout, reproduces the same membership, which is the
    property held-out sets must have.  Map-only."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"))
    return docs.select(
        "doc_id",
        F.when(bucket < TRAIN_THRESHOLD, "train")
        .when(bucket < VALID_THRESHOLD, "valid")
        .otherwise("test")
        .alias("split"),
        "lang",
    )


@query(
    "q_sample_stratified",
    oracle=f"""
SELECT doc_id, lang, CAST(rn AS BIGINT) AS draw_rank
FROM (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
)
WHERE rn <= {STRATA_K}
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly K documents per language, drawn in
    deterministic hash order (md5 of the key is the shuffle; rank ≤ K
    is the draw).  One per-class window — WindowGroupLimit keeps only
    K rows per class per partition before the shuffle, so the
    at-scale cost is O(K × classes), not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id", "lang", F.row_number().over(w).cast("long").alias("draw_rank")
        )
        .filter(F.col("draw_rank") <= STRATA_K)
    )


@query(
    "q_sample_mixture_weights",
    oracle="""
WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT count(*) AS total, count(DISTINCT source) AS n_sources
      FROM documents)
SELECT s.source,
       CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(round(s.n_docs * 1.0 / t.total, 6) AS DOUBLE) AS share,
       CAST(round(1.0 / t.n_sources, 6) AS DOUBLE) AS target_share,
       CAST(round(least(1.0,
            (1.0 / t.n_sources) / (s.n_docs * 1.0 / t.total)), 6) AS DOUBLE)
           AS accept_rate
FROM s CROSS JOIN t
""",
)
def q_sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture design: per-source acceptance rates that rebalance the
    corpus toward a target mixture (uniform across sources here) —
    downsample over-represented sources (rate = target/actual, capped
    at 1), keep the rest whole.  The rates then drive the hash sampler
    (``q_sample_bernoulli_hash`` with a per-source threshold).  One
    keyed aggregate + a broadcast 1-row corpus-stats cross join — the
    same no-driver-side-count shape as BM25/TF-IDF."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = docs.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_distinct("source").alias("n_sources"),
    )
    share = F.col("n_docs") / F.col("total")
    target = F.lit(1.0) / F.col("n_sources")
    return per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        F.round(share, 6).alias("share"),
        F.round(target, 6).alias("target_share"),
        F.round(F.least(F.lit(1.0), target / share), 6).alias("accept_rate"),
    )


@query(
    "q_sample_chunk_windows",
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents
    WHERE doc_id < 200
),
n AS (
    SELECT doc_id, toks,
           CAST(ceil(greatest(len(toks) - {CHUNK_SIZE}, 0) / {CHUNK_STRIDE}.0)
                AS BIGINT) + 1 AS n_chunks
    FROM t
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(len(toks[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}])
            AS INTEGER) AS chunk_tokens,
       array_to_string(
           toks[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}], ' ')
           AS chunk_text
FROM n, unnest(range(0, n_chunks)) AS u(i)
""",
)
def q_sample_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into fixed-size
    token windows (64 tokens, stride 48 → 16-token overlap) — the
    corpus-assembly step that turns documents into training sequences.
    Short documents yield one (short) chunk; every token lands in ≥1
    chunk.

    One scan, one explode; the token array is BOUND AS A COLUMN before
    the per-chunk slices (Catalyst does not CSE a tokenizer expression
    substituted into a lambda — re-evaluating it per chunk is O(len²)
    per document, the same trap measured 13x on minhash shingles)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    tk = F.col("toks")
    n_chunks = (
        F.ceil(
            F.greatest(F.size(tk) - CHUNK_SIZE, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
        )
        + 1
    ).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.size(F.slice(tk, i * CHUNK_STRIDE + 1, CHUNK_SIZE)).alias(
                "chunk_tokens"
            ),
            F.concat_ws(" ", F.slice(tk, i * CHUNK_STRIDE + 1, CHUNK_SIZE)).alias(
                "chunk_text"
            ),
        ),
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode(chunk).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_tokens").alias("chunk_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


PACK_BUDGET = 256  # tokens per packed training sequence
PACK_SHARDS = 16  # parallel packing shards (first md5 hex char)


@query(
    "q_sample_pack_sequences",
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents
),
n AS (
    SELECT doc_id, shard, toks,
           CAST(ceil(greatest(len(toks) - {CHUNK_SIZE}, 0) / {CHUNK_STRIDE}.0)
                AS BIGINT) + 1 AS n_chunks
    FROM t
),
chunks AS (
    SELECT doc_id, shard,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(len(toks[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}])
                AS BIGINT) AS chunk_tokens
    FROM n, unnest(range(0, n_chunks)) AS u(i)
),
placed AS (
    SELECT doc_id, shard, chunk_idx, chunk_tokens,
           sum(chunk_tokens) OVER (
               PARTITION BY shard
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)),
                        doc_id, chunk_idx
               ROWS UNBOUNDED PRECEDING) - chunk_tokens AS token_start
    FROM chunks
)
SELECT doc_id, shard, chunk_idx, chunk_tokens,
       CAST(token_start AS BIGINT) AS token_start,
       CAST(token_start // {PACK_BUDGET} AS BIGINT) AS bin_id
FROM placed
""",
)
def q_sample_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the corpus-assembly step after chunking:
    concatenate chunks in a deterministic order and reslice the token
    stream into fixed {PACK_BUDGET}-token training sequences.  Each
    chunk is placed at ``token_start`` (running token sum before it)
    and assigned ``bin_id = token_start // budget`` — the training
    sequence its first token lands in.

    Scale design: packing is SHARDED (first md5 hex char of doc_id, 16
    shards) and the running sum is a per-shard window, so the shards
    pack in parallel and no global single-partition sort exists; at
    100 TB shard count scales with the cluster while per-shard order
    stays deterministic (hash of (doc_id, chunk_idx)).  This greedy
    concat-then-slice is exactly how pretraining pipelines pack — and
    being a window cumsum, it carries an exact DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    tk = F.col("toks")
    n_chunks = (
        F.ceil(
            F.greatest(F.size(tk) - CHUNK_SIZE, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
        )
        + 1
    ).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.size(F.slice(tk, i * CHUNK_STRIDE + 1, CHUNK_SIZE))
            .cast("long")
            .alias("chunk_tokens"),
        ),
    )
    chunks = (
        docs.select(
            "doc_id",
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("shard"),
            toks.alias("toks"),
        )
        .select("doc_id", "shard", F.explode(chunk).alias("c"))
        .select(
            "doc_id",
            "shard",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_tokens").alias("chunk_tokens"),
        )
    )
    order_hash = F.md5(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("chunk_idx").cast("string"),
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(order_hash, "doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    token_start = F.sum("chunk_tokens").over(w) - F.col("chunk_tokens")
    return chunks.select(
        "doc_id",
        "shard",
        "chunk_idx",
        "chunk_tokens",
        token_start.alias("token_start"),
        F.floor(token_start / PACK_BUDGET).alias("bin_id"),
    )


@query(
    "q_pipeline_corpus_prep",
    oracle=f"""
WITH gated AS (
    SELECT doc_id, text,
           list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents
    WHERE length(text) BETWEEN 50 AND 5000
      AND len(list_filter(string_split(text, ' '), t -> t <> '')) >= 10
),
kept AS (
    SELECT doc_id, toks FROM (
        SELECT doc_id, toks,
               row_number() OVER (
                   PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
        FROM gated
    ) WHERE rn = 1
),
train AS (
    SELECT doc_id, toks FROM kept
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_THRESHOLD}'
),
n AS (
    SELECT doc_id, toks,
           CAST(ceil(greatest(len(toks) - {CHUNK_SIZE}, 0) / {CHUNK_STRIDE}.0)
                AS BIGINT) + 1 AS n_chunks
    FROM train
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(len(toks[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_SIZE}])
            AS INTEGER) AS chunk_tokens
FROM n, unnest(range(0, n_chunks)) AS u(i)
""",
)
def q_pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE corpus-prep pipeline as ONE lazy plan: quality gate
    (length bounds + min tokens) → exact dedup (min doc_id per
    normalized fingerprint) → train-split selection (stable hash) →
    context-window chunking.  Each stage is individually oracled
    elsewhere (q_text_quality, q_dedup_exact, q_sample_train_valid_test,
    q_sample_chunk_windows); this entry proves they COMPOSE — one
    Catalyst plan, one pass over the corpus plus one fingerprint
    window, with the same exact value-hash gate end-to-end.  At 100 TB
    this is the actual nightly job: no intermediate materialization,
    pushdown and pruning flow through every stage."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    gated = docs.select("doc_id", "text", toks.alias("toks")).filter(
        F.length("text").between(50, 5000) & (F.size(F.col("toks")) >= 10)
    )
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy(
        "doc_id"
    )
    train = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(hash_bucket(F.col("doc_id")) < TRAIN_THRESHOLD)
        .select("doc_id", "toks")
    )
    tk = F.col("toks")
    n_chunks = (
        F.ceil(
            F.greatest(F.size(tk) - CHUNK_SIZE, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
        )
        + 1
    ).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.size(F.slice(tk, i * CHUNK_STRIDE + 1, CHUNK_SIZE))
            .cast("int")
            .alias("chunk_tokens"),
        ),
    )
    return train.select("doc_id", F.explode(chunk).alias("c")).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_tokens").alias("chunk_tokens"),
    )


SOURCE_CAP = 15  # max documents kept per source


@query(
    "q_sample_source_cap",
    oracle=f"""
SELECT doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(src_rank AS INTEGER) AS src_rank
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS src_rank
  FROM documents
)
WHERE src_rank <= {SOURCE_CAP}
""",
)
def q_sample_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the per-domain cap every web-scale
    corpus applies so a single prolific domain cannot dominate the
    training mix: keep the top {SOURCE_CAP} documents per source
    (longest first, doc_id tie-break), drop the rest.

    One shuffle on source; the rank filter is a WindowGroupLimit, so
    executors push the top-k INTO the sort — per-partition state is
    K rows per source, not the source's full document list.  Skewed
    sources (the usual reason domains get capped at all) therefore
    cost O(K) memory, not O(domain size)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("src_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("src_rank") <= SOURCE_CAP)
    )


EXACT_K = 100  # exact-size deterministic sample


@query(
    "q_sample_exact_k",
    oracle=f"""
SELECT o_orderkey, o_custkey,
       CAST(round(o_totalprice, 2) AS DOUBLE) AS o_totalprice
FROM orders
ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
LIMIT {EXACT_K}
""",
)
def q_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-size uniform sample: order by a cryptographic hash of the
    key and keep the first K.  Bernoulli sampling (q_sample_bernoulli_
    hash) gives a random-sized result; training-data recipes often
    need exactly K rows, reproducibly, regardless of input growth —
    the hash order is a uniform permutation, so the first K are a
    uniform sample, stable across runs and engines (md5 is defined
    identically everywhere, unlike engine-native hash()).

    Plan: ORDER BY + LIMIT folds into TakeOrderedAndProject — each
    partition keeps K candidates, the driver merges; no global sort of
    the table ever materializes.  At 100 TB this is the only sane
    exact-K shape."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy(F.md5(F.col("o_orderkey").cast("string")), "o_orderkey")
        .limit(EXACT_K)
    )


WEIGHTED_K = 50  # weighted-sample size
# 16^8 = 2^32: first 8 md5 hex chars as a uniform integer in [0, 2^32)
_U_DENOM = float(1 << 32)


@query(
    "q_sample_weighted",
    oracle=f"""
SELECT doc_id, n_chars,
       CAST(round(
           pow((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                + 1) / {_U_DENOM:.1f},
               1.0 / n_chars), 6) AS DOUBLE) AS aes_key
FROM documents
WHERE n_chars > 0
ORDER BY aes_key DESC, doc_id
LIMIT {WEIGHTED_K}
""",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement ({WEIGHTED_K} docs, weight
    = n_chars) via the Efraimidis–Spirakis A-ES scheme: each row draws
    u ~ Uniform(0,1] and scores u^(1/w); the top-K scores ARE a
    weighted sample without replacement.  The classic use: sample
    training documents proportionally to length so token mass, not
    document count, drives selection.

    u is derived from md5 of the key (first 8 hex chars → uniform
    32-bit integer, +1 to exclude zero), so the draw is a pure
    function of the row — reproducible across runs, engines, and
    cluster layouts, with no RNG state to coordinate (the same
    portability trick as hash_bucket, extended from bucket membership
    to a full uniform float).  The score is rounded to 6 digits on
    both engines before ranking (libm pow may differ in the last ulp
    between the JVM and DuckDB) with doc_id as the tiebreak, so the
    cut at K is deterministic.  Plan: ORDER BY+LIMIT folds into
    TakeOrderedAndProject — per-partition top-K then a driver merge of
    K-row heaps; map-only otherwise, no shuffle of the corpus at any
    scale."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1
    ) / F.lit(_U_DENOM)
    score = F.round(F.pow(u, 1.0 / F.col("n_chars")), 6)
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "n_chars", score.alias("aes_key"))
        .orderBy(F.desc("aes_key"), "doc_id")
        .limit(WEIGHTED_K)
    )


WEIGHTED_GROUP_K = 20  # weighted sample size per language


@query(
    "q_sample_weighted_stratified",
    oracle=f"""
WITH k AS (
  SELECT doc_id, lang, n_chars,
         CAST(round(
             pow((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  + 1) / {_U_DENOM:.1f},
                 1.0 / n_chars), 6) AS DOUBLE) AS aes_key
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, lang, n_chars, aes_key
FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY aes_key DESC, doc_id) AS rn
  FROM k
)
WHERE rn <= {WEIGHTED_GROUP_K}
""",
)
def q_sample_weighted_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum weighted sampling: the A-ES draw of
    q_sample_weighted run independently inside each language — up to
    {WEIGHTED_GROUP_K} docs per lang, selected proportionally to
    length within their stratum.  This is the corpus-mixing primitive:
    per-language token-mass-weighted quotas in one pass, no RNG state.

    The per-group top-K compiles to WindowGroupLimit (partial top-K
    before the stratum shuffle), so skewed strata cost O(K) memory per
    partition — the same property pinned for q_sample_source_cap.
    Same portable md5-uniform + rounded-score + doc_id tiebreak as the
    global sampler, so both engines cut each stratum identically."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1
    ) / F.lit(_U_DENOM)
    score = F.round(F.pow(u, 1.0 / F.col("n_chars")), 6)
    w = Window.partitionBy("lang").orderBy(F.desc("aes_key"), "doc_id")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "n_chars", score.alias("aes_key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= WEIGHTED_GROUP_K)
        .drop("rn")
    )


@query(
    "q_sample_balanced_classes",
    oracle="""
WITH m AS (
  SELECT min(n) AS k
  FROM (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS rn
  FROM documents
)
SELECT doc_id, lang FROM r, m WHERE rn <= m.k
""",
)
def q_sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class balancing by downsampling every language to the MINORITY
    class size — the cap is DYNAMIC (min per-class count, discovered
    from the data), unlike the fixed-K stratified sampler.  Output is
    perfectly balanced: k docs per lang, selected by the deterministic
    md5 permutation so membership is reproducible across runs and
    engines.

    The cap enters as a broadcast one-row aggregate joined onto the
    per-class ranks — never a collected scalar — and the rank filter
    keeps the per-class window cheap.  Because the cap is not a plan-
    time constant, Spark cannot compile the cut to WindowGroupLimit
    (that optimization needs a literal bound); the full rank is
    computed and filtered, which is the honest cost of a data-driven
    cap — if the minority size is known ahead, prefer the literal-K
    stratified form and its O(K) memory bound."""
    docs = load_table(spark, sf_dir, "documents")
    k = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("k"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .select("doc_id", "lang")
    )


SHUFFLE_SEED = "epoch-0"  # permutation seed: change per training epoch


@query(
    "q_sample_global_shuffle",
    oracle=f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS shuffle_pos
FROM documents
""",
)
def q_sample_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE of the corpus — the epoch
    randomization every training-data pipeline ends with: each doc's
    position is a pure function of (seed, doc_id), so the permutation
    is reproducible across runs, engines, and partial re-materializa-
    tions, and a new epoch is just a new seed — no stored permutation
    table, no RNG state.  The key is md5 over the seeded id (the same
    engine-shared trick as the hash samplers: both Spark and DuckDB
    produce identical digests, so the oracle checks the exact
    permutation, not just its size); ties are impossible but doc_id
    rides the sort for determinism anyway.

    Scale note (the equi-depth histogram caveat, stated plainly): the
    explicit rank needs one global window — fine to ~10⁸ rows, and
    exactly what the oracle can verify.  At 100 TB you drop the rank
    column entirely: ``df.orderBy(hash)`` alone is a RANGE-PARTITIONED
    distributed sort (no single-task stage), and the written file
    order IS the shuffle — the rank exists here because a verifiable
    position column is the point of the catalog entry."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat(F.lit(f"{SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))
    )
    w = Window.orderBy(key, "doc_id")
    return docs.select(
        "doc_id", F.row_number().over(w).cast("long").alias("shuffle_pos")
    )


BOOTSTRAP_REPLICATES = 5
# Poisson(1) CDF cut points P(X <= k), k = 0..6, encoded as 12-hex-char
# string thresholds: u = substring(md5(key), 1, 12) is uniform over
# fixed-width lowercase hex, so LEXICOGRAPHIC comparison against these
# constants IS the numeric comparison u < CDF(k) — pure string ops both
# engines evaluate identically, no hex->int conversion needed anywhere.
_POISSON1_CDF_HEX = (
    "5e2d58d8b3bc",  # P(X<=0) = 0.36788
    "bc5ab1b16779",  # P(X<=1) = 0.73576
    "eb715e1dc158",  # P(X<=2) = 0.91970
    "fb23979734a2",  # P(X<=3) = 0.98101
    "ff1025f59174",  # P(X<=4) = 0.99634
    "ffd90f3ba405",  # P(X<=5) = 0.99941
    "fffa8b71fc72",  # P(X<=6) = 0.99992
)


def _poisson1_case(h_sql: str) -> str:
    """SQL CASE mapping a 12-hex-char uniform to its Poisson(1) draw —
    identical text works in Spark SQL and DuckDB."""
    arms = " ".join(
        f"WHEN {h_sql} < '{t}' THEN {k}"
        for k, t in enumerate(_POISSON1_CDF_HEX)
    )
    return f"CASE {arms} ELSE 7 END"


_BOOTSTRAP_ORACLE = f"""
WITH draws AS (
  SELECT b.b AS replicate, e.value,
         {_poisson1_case(
             "substring(md5(CAST(e.event_id AS VARCHAR) "
             "|| ':' || CAST(b.b AS VARCHAR)), 1, 12)")} AS mult
  FROM events e,
       (SELECT unnest(generate_series(1, {BOOTSTRAP_REPLICATES})) AS b) b
)
SELECT replicate,
       CAST(sum(mult) AS BIGINT) AS n_sampled,
       CAST(round(sum(mult * value) / sum(mult), 4) AS DOUBLE) AS mean_value
FROM draws GROUP BY replicate
"""


@query("q_sample_bootstrap", oracle=_BOOTSTRAP_ORACLE)
def q_sample_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Poisson bootstrap — {BOOTSTRAP_REPLICATES} resampled
    replicates of the corpus in ONE pass, the standard trick for
    confidence intervals at 100 TB where "sample n rows with
    replacement, B times" is unrunnable: each row's multiplicity in
    replicate b is an independent Poisson(1) draw (the B→∞ limit of
    multinomial resampling), so every replicate is a weighted scan,
    never a shuffle of resampled rows.

    Determinism ACROSS ENGINES without sharing an RNG: the uniform is
    the first 12 hex chars of md5(event_id ':' b) — fixed-width hex
    compares lexicographically exactly as it compares numerically, so
    the Poisson inverse-CDF is a CASE over string constants
    (module-level precomputed cut points) and both engines draw the
    SAME multiplicity for every (row, replicate).  The full hash
    oracle pins means per replicate; a broken draw shifts every
    statistic.

    Plan: one events scan, a {BOOTSTRAP_REPLICATES}-element explode
    (B× map-side fan-out, zero extra scans), one partial/final
    aggregate keyed by replicate — B bounded-size result rows."""
    events = load_table(spark, sf_dir, "events")
    h = (
        "substring(md5(CAST(event_id AS STRING) "
        "|| ':' || CAST(b AS STRING)), 1, 12)"
    )
    return (
        events.select(
            "event_id",
            "value",
            F.explode(
                F.sequence(F.lit(1), F.lit(BOOTSTRAP_REPLICATES))
            ).alias("b"),
        )
        .withColumn("mult", F.expr(_poisson1_case(h)))
        .groupBy(F.col("b").alias("replicate"))
        .agg(
            F.sum("mult").cast("bigint").alias("n_sampled"),
            F.round(
                F.sum(F.col("mult") * F.col("value")) / F.sum("mult"), 4
            ).alias("mean_value"),
        )
    )


TEMP_SAMPLE_FRACTION = 0.5  # corpus fraction the tempered sample targets


@query(
    "q_sample_temperature",
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang
),
rates AS (
  SELECT lang,
         least(1.0,
               (sqrt(n) / (SELECT sum(sqrt(n)) FROM counts))
               * (SELECT sum(n) FROM counts) * {TEMP_SAMPLE_FRACTION} / n)
             AS keep_rate
  FROM counts
)
SELECT d.doc_id, d.lang,
       CAST(round(r.keep_rate, 6) AS DOUBLE) AS keep_rate
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) AS BIGINT)
      / 16777216.0 < r.keep_rate
""",
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE SAMPLING (alpha = 0.5) across languages — the
    standard multilingual-LLM corpus rebalance (mT5/XLM-R style):
    target shares q_l ∝ p_l^alpha flatten the language distribution,
    so high-resource languages downsample hard and low-resource ones
    keep (almost) everything; per-row keep probability =
    q_l · (N·{TEMP_SAMPLE_FRACTION}) / n_l, capped at 1.

    Cross-engine exactness: alpha = 0.5 makes the tempering a
    ``sqrt`` — IEEE correctly-rounded in BOTH engines (unlike a
    general ``pow``, whose last-ulp can differ across libms and flip
    threshold rows) — and the per-row uniform is 24 bits of
    md5(doc_id), so the accept/reject decision is bit-reproducible
    and fully SQL-oracled.  Plan: one tiny per-lang count aggregate,
    rates broadcast back onto the corpus, one map-side filter — no
    second corpus shuffle; at 100 TB the only full-scan cost is the
    count pass, which any sampler pays."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    tot = counts.agg(
        F.sum(F.sqrt("n")).alias("sum_sqrt"), F.sum("n").alias("total")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1.0),
            (F.sqrt("n") / F.col("sum_sqrt"))
            * F.col("total")
            * F.lit(TEMP_SAMPLE_FRACTION)
            / F.col("n"),
        ).alias("keep_rate"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
        ).cast("long")
        / F.lit(16777216.0)
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(u < F.col("keep_rate"))
        .select(
            "doc_id", "lang", F.round("keep_rate", 6).alias("keep_rate")
        )
    )


NEG_SHIFTS = (7, 131)  # deterministic ring offsets, one per negative


@query(
    "q_sample_negative_pairs",
    oracle=f"""
WITH keyed AS (
    SELECT doc_id,
           CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                AS BIGINT) AS k
    FROM documents
),
r AS (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS rnk,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM keyed
),
shifts AS (
    SELECT * FROM (VALUES (1, {NEG_SHIFTS[0]}), (2, {NEG_SHIFTS[1]}))
        s(pair_idx, shift)
)
SELECT a.doc_id,
       CAST(s.pair_idx AS INTEGER) AS pair_idx,
       b.doc_id AS neg_doc_id
FROM r a
JOIN shifts s ON TRUE
JOIN r b ON b.rnk = ((a.rnk - 1 + s.shift) % a.n) + 1
""",
)
def q_sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC NEGATIVE SAMPLING for contrastive training pairs:
    every document gets len(NEG_SHIFTS) pseudo-random negatives with
    uniform coverage (each document appears as a negative exactly
    len(NEG_SHIFTS) times — a permutation ring, not a lottery).

    Construction: md5(doc_id) defines a random permutation; the exact
    global position in that permutation comes from
    ``ranked_row_number`` (operators/ranked.py — range-partitioned,
    NO single-task window); negative j of a document is the document
    ``NEG_SHIFTS[j]`` positions further around the ring (mod N, so the
    ring closes).  Everything downstream is rank-keyed equi-joins —
    at 100 TB this is two bounded shuffles for the rank plus one
    shuffle join per negative, and the output is reproducible
    run-to-run, which batch-building for contrastive losses needs
    (the oracle restates the ring with the window form).  The grand
    count N rides out of the rank's own offsets table — no separate
    count job."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    from setup_harvest_action_spark.operators.ranked import (
        ranked_row_number,
    )

    keyed = docs.select(
        "doc_id",
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("k"),
    )
    r = ranked_row_number(
        keyed, "k", ["doc_id"], out="rnk", total="n"
    ).select("doc_id", "rnk", "n")
    shifts = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(NEG_SHIFTS)],
        "pair_idx int, shift int",
    )
    a = r.crossJoin(F.broadcast(shifts)).select(
        "doc_id",
        "pair_idx",
        (((F.col("rnk") - 1 + F.col("shift")) % F.col("n")) + 1).alias(
            "neg_rnk"
        ),
    )
    b = r.select(F.col("rnk").alias("neg_rnk"), F.col("doc_id").alias("neg_doc_id"))
    return a.join(b, "neg_rnk").select("doc_id", "pair_idx", "neg_doc_id")


SYSTEMATIC_K = 7  # keep every K-th document
SYSTEMATIC_OFFSET = 3  # which residue class survives


@query(
    "q_sample_systematic",
    oracle=f"""
WITH keyed AS (
    SELECT doc_id, lang,
           CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                AS BIGINT) AS k
    FROM documents
),
r AS (
    SELECT doc_id, lang,
           CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS rnk
    FROM keyed
)
SELECT doc_id, lang, rnk
FROM r WHERE rnk % {SYSTEMATIC_K} = {SYSTEMATIC_OFFSET}
""",
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEMATIC sampling — every K-th document of a deterministic
    pseudo-random ordering (md5 permutation + exact global rank):
    unlike Bernoulli, the sample size is exact (⌊N/K⌋±1, no variance)
    and the spacing is uniform, which matters when the sample feeds a
    budgeted eval set.  Rank via ``ranked_row_number``
    (range-partitioned, no single-task window — the same primitive as
    negative-pair sampling); the residue filter is map-side after the
    rank."""
    from setup_harvest_action_spark.operators.ranked import (
        ranked_row_number,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    keyed = docs.select(
        "doc_id",
        "lang",
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("k"),
    )
    r = ranked_row_number(keyed, "k", ["doc_id"], out="rnk")
    return r.filter(F.col("rnk") % SYSTEMATIC_K == SYSTEMATIC_OFFSET).select(
        "doc_id", "lang", "rnk"
    )
