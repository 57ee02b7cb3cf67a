"""Similarity search over ``embeddings.embedding`` (array<float>, 64-d).

LLM-pipeline pillar (SURVEY.md §2.2): exact top-k cosine as the
correctness baseline, random-hyperplane LSH as the scale path.

Design for 100 TB:
  * The exact query joins a SMALL query set (broadcast) against the
    full corpus — cost is |queries| × corpus, embarrassingly parallel,
    and the per-group top-k uses WindowGroupLimit so only k rows per
    query survive each partition.  An unbounded corpus × corpus
    cross-join is deliberately not offered.
  * The LSH query buckets vectors by the sign pattern of H fixed
    hyperplane projections; candidates share a bucket → the join is
    bucket-keyed, never all-pairs.  Hyperplanes are deterministic
    (seeded xxhash64 → uniform in [-1,1]) so results are stable and
    testable.
  * All vector math is JVM-side higher-order functions
    (``zip_with``/``aggregate``) — no UDF, no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.io.parallelism import spread

N_QUERY_VECS = 5  # exact top-k query set: vec_id < 5
TOP_K = 3
EMB_DIM = 64  # fixture embedding dimension (= PQ_M * PQ_SUB)
LSH_TABLES = 8  # multi-table LSH: L tables ...
LSH_BITS = 6  # ... of H sign-bits each
IVF_CENTROIDS = 16  # IVF coarse quantizer size
IVF_NPROBE = 4  # clusters probed per query


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns — zip_with + aggregate,
    whole-stage-codegen'd."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: str = "embedding") -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


@query(
    "q_similarity_exact_topk",
    oracle=f"""
WITH vecs AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < {N_QUERY_VECS}),
scored AS (
    SELECT q.query_id, vecs.vec_id AS neighbor_id,
           list_cosine_similarity(q.qv, vecs.v) AS cos
    FROM q JOIN vecs ON q.query_id <> vecs.vec_id
)
SELECT query_id, neighbor_id,
       CAST(round(cos, 6) + 0.0 AS DOUBLE) AS cosine,
       CAST(rn AS BIGINT) AS rank
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rn
    FROM scored
)
WHERE rn <= {TOP_K}
""",
)
def q_similarity_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors against the
    corpus, score with zip_with/aggregate, keep k per query via
    row_number (WindowGroupLimit).  The ground truth the ANN query's
    recall is measured against."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        vecs.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            # signed-zero sweep (r13): cosine is signed.
            (F.round("cos", 6) + F.lit(0.0)).alias("cosine"),
            "rank",
        )
    )


PAIRS_THRESHOLD = 0.42  # yields a small non-empty pair set on the fixtures
PAIRS_SLICE = 300  # bounded slice the oracle ground-truths
# LSH parameters for the pair-candidate generation.  Recall on the
# qualifying (cosine >= 0.42) pairs is MEASURED 1.0 on all three
# fixture SFs with these settings (missing a pair would flip the
# oracle red, so the gate itself re-verifies this every round); the
# planes are hash-seeded and deterministic, so green stays green.
PAIRS_LSH_TABLES = 32
PAIRS_LSH_BITS = 4


@query(
    "q_similarity_pairs_threshold",
    oracle=f"""
WITH vecs AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings WHERE vec_id < 300
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(round(list_cosine_similarity(a.v, b.v), 6) AS DOUBLE) AS cosine,
       CAST(a.label = b.label AS BOOLEAN) AS same_label
FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {PAIRS_THRESHOLD}
""",
)
def q_similarity_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-similarity pairs ≥ PAIRS_THRESHOLD (embedding near-dup
    detection) — candidates come from the LSH BUCKET JOIN, never an
    all-pairs theta join: vectors sharing any of L=32 4-bit sign-pattern
    buckets become candidate pairs, exact cosine is computed only on
    candidates, and the threshold filter matches the oracle's WHERE on
    the unrounded value.

    The oracle stays the exact all-pairs SQL over the bounded slice
    (vec_id < PAIRS_SLICE), so the gate verifies the LSH candidate set
    LOSES NOTHING at this threshold: recall on qualifying pairs is
    measured 1.0 on every fixture SF (pinned locally by
    tests/test_llm_functions.py against an exact recompute).  Pruning
    on these fixtures is modest (~15% of pairs skipped) because 0.42
    sits barely above the random-cosine background of the synthetic
    64-d vectors — at production near-dup thresholds (0.8+) the same
    machinery prunes the bucket join to a tiny fraction of pairs.  At
    100 TB the slice filter drops away and this exact plan — codes,
    bucket self-join, candidate-only scoring — is the scale path; the
    plan contract (tests/test_plans.py) asserts no cartesian or
    theta-only pair join survives.  The scoring joins carry NO
    broadcast hints: the vector table is corpus-derived, so AQE picks
    broadcast while it measures small and shuffles at scale — forcing
    the hint would broadcast the corpus once the slice drops away."""
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < PAIRS_SLICE)
        .select("vec_id", "label", _as_double().alias("v"))
    )
    codes = lsh_codes(
        vecs.select("vec_id", "v"),
        hyperplanes_df(spark, tables=PAIRS_LSH_TABLES, bits=PAIRS_LSH_BITS),
    )
    # Bucket-keyed candidate pairs: equi-join on (table_id, code); the
    # `<` only orients each unordered pair, it is not the join driver.
    cand = (
        codes.select(F.col("vec_id").alias("vec_a"), "table_id", "code")
        .join(
            codes.select(F.col("vec_id").alias("vec_b"), "table_id", "code"),
            ["table_id", "code"],
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    a = vecs.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"), F.col("v").alias("va")
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("v").alias("vb")
    )
    cos = cosine(F.col("va"), F.col("vb"))
    # Filter on the UNROUNDED cosine exactly like the oracle's WHERE;
    # rounding happens only in the projection — filtering on the rounded
    # value would admit pairs just below the threshold that the oracle
    # excludes.
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .filter(cos >= PAIRS_THRESHOLD)
        .select(
            "vec_a",
            "vec_b",
            F.round(cos, 6).alias("cosine"),
            (F.col("la") == F.col("lb")).alias("same_label"),
        )
    )


def hyperplanes_df(
    spark: SparkSession,
    dim: int = 64,
    tables: int = LSH_TABLES,
    bits: int = LSH_BITS,
) -> DataFrame:
    """Deterministic pseudo-random hyperplanes for ``tables`` × ``bits``
    sign tests: component (t, b, d) = xxhash64('hp:t:b:d') scaled to
    [-1, 1].  Seeded, reproducible, tiny — always the broadcast side."""
    rows = [(t, b) for t in range(tables) for b in range(bits)]
    hp = spark.createDataFrame(rows, "table_id int, bit_id int")
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.xxhash64(
                F.concat_ws(
                    ":", F.lit("hp"), F.col("table_id"), F.col("bit_id"), d
                )
            )
            / F.lit(float(2**63))
        ),
    )
    return hp.select("table_id", "bit_id", comps.alias("h"))


def lsh_codes(vecs: DataFrame, planes: DataFrame) -> DataFrame:
    """(vec_id, table_id, code): per-table sign-pattern bucket codes.
    One broadcast of the plane table, one keyed aggregate.

    Scale note: the per-(vec, table, bit) projection partially
    aggregates MAP-SIDE, so the shuffle carries exactly the output —
    tables·N code rows, which the downstream bucket join re-shuffles
    anyway.  A zero-shuffle variant (planes collapsed to one broadcast
    row, codes computed inline via nested higher-order functions) was
    measured 1.5x SLOWER at sf0.1: three-deep lambda nesting falls out
    of whole-stage codegen, and interpreted HOF overhead costs more
    than the tiny-row shuffle saves.  Keep this form."""
    proj = (
        vecs.crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            "table_id",
            "bit_id",
            (dot(F.col("v"), F.col("h")) > 0).cast("long").alias("bit"),
        )
    )
    # shiftleft needs a literal shift; 2^bit_id via pow is exact below 53.
    return proj.groupBy("vec_id", "table_id").agg(
        F.sum(
            (F.col("bit") * F.pow(F.lit(2.0), F.col("bit_id"))).cast("long")
        ).alias("code")
    )


@query("q_similarity_ann_lsh")
def q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH: L=8
    independent tables of H=6 sign-bits; candidates = vectors sharing
    any table's bucket with the query; exact cosine only on candidates;
    top-k among them.

    Bucket-keyed join — never all-pairs.  P(bit agree) = 1 - θ/π, so
    per-table collision is p^H and overall 1-(1-p^H)^L — multiple
    tables trade candidate volume for recall, the standard fix when a
    single wide code (p^12) collides on almost nothing.  On this
    fixture (near-random vectors, best cosines ≈ 0.4) it scans ~19% of
    the corpus for ~40% top-3 recall.  No oracle (hash-seeded
    hyperplanes aren't SQL-portable); recall vs q_similarity_exact_topk
    asserted in tests/test_llm_functions.py."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    codes = lsh_codes(vecs, hyperplanes_df(spark))
    qcodes = codes.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), "table_id", "code"
    )
    cand_ids = (
        codes.join(F.broadcast(qcodes), ["table_id", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand_ids.join(vecs, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank"
        )
    )


@query("q_similarity_ann_ivf")
def q_similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF (inverted-file index, the FAISS-style
    scale path): a coarse quantizer of C=16 deterministic centroids
    partitions the corpus by nearest centroid; each query probes its
    nprobe=4 nearest clusters and scores only those members.

    Cost is (corpus × C) cheap centroid dots for assignment — one
    broadcast — then exact cosine on ~nprobe/C of the corpus.  On this
    fixture it scans ~24% for ~93% top-3 recall (measured; asserted in
    tests).  At 100 TB the assignment is a write-once partitioning
    (cluster id = partition key), so probes prune to nprobe partitions
    — the same pruning story as partitioned parquet.  Centroids here
    are the first C vectors (deterministic stand-in for a k-means fit,
    which would be an offline job at scale).  No oracle: argmax
    assignment + probing isn't reasonably SQL-expressible."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    cents = vecs.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        cosine(F.col("v"), F.col("cv")).alias("cc"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cc"), F.asc("centroid_id")
    )
    ranked = scored.withColumn("rn", F.row_number().over(w_assign))
    assignment = ranked.filter(F.col("rn") == 1).select("vec_id", "centroid_id")
    probes = (
        ranked.filter(
            (F.col("vec_id") < N_QUERY_VECS) & (F.col("rn") <= IVF_NPROBE)
        )
        .select(F.col("vec_id").alias("query_id"), "centroid_id")
    )
    cand_ids = (
        assignment.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand_ids.join(vecs, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rank"
        )
    )


HYBRID_QUERY_VEC = 0  # embedding of doc 0 is the query vector
HYBRID_TOP_K = 10
HYBRID_ALPHA = 0.5  # lexical/vector blend


@query(
    "q_similarity_hybrid_rerank",
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
bm AS (
    SELECT tf.doc_id,
           round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.len / stats.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df ON df.tok = tf.tok
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
),
bmmax AS (SELECT max(bm25) AS mx FROM bm),
vecs AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
),
qv AS (SELECT v AS qvec FROM vecs WHERE vec_id = {HYBRID_QUERY_VEC}),
scored AS (
    SELECT bm.doc_id,
           round(bm.bm25 / bmmax.mx, 6) AS bm25_norm,
           round(list_cosine_similarity(vecs.v, qv.qvec), 6) AS cos
    FROM bm
    JOIN vecs ON vecs.vec_id = bm.doc_id
    CROSS JOIN bmmax CROSS JOIN qv
    WHERE bm.doc_id <> {HYBRID_QUERY_VEC}
),
ranked AS (
    SELECT doc_id, bm25_norm, cos,
           round({HYBRID_ALPHA} * bm25_norm + {1 - HYBRID_ALPHA} * cos, 6)
               AS hybrid,
           row_number() OVER (
               ORDER BY round({HYBRID_ALPHA} * bm25_norm
                              + {1 - HYBRID_ALPHA} * cos, 6) DESC, doc_id)
               AS rank
    FROM scored
)
SELECT doc_id,
       CAST(bm25_norm AS DOUBLE) AS bm25_norm,
       CAST(cos + 0.0 AS DOUBLE) AS cosine,
       CAST(hybrid + 0.0 AS DOUBLE) AS hybrid,
       CAST(rank AS BIGINT) AS rank
FROM ranked
WHERE rank <= {HYBRID_TOP_K}
""",
)
def q_similarity_hybrid_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (the RAG shape): BM25 lexical candidates
    re-ranked by embedding cosine to a query vector —
    score = α·bm25_norm + (1-α)·cosine, top-k overall.

    Plan: the BM25 scorer (one matched-term explode + broadcast stats,
    ``functions.text.bm25_scores``) joins the embedding table on the
    shared id, the query vector and the bm25 max arrive as broadcast
    1-row aggregates, and the final top-k is one global
    TakeOrdered-style window.  Both halves are individually oracled
    elsewhere; this entry gates the BLEND exactly (all components
    rounded before blending so both engines rank identical doubles).
    At 100 TB: candidates are |bm25-matched docs|, not the corpus —
    the vector join touches only them."""
    from setup_harvest_action_spark.functions.text import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    bm = bm25_scores(docs).select(
        "doc_id", F.round("score", 6).alias("bm25")
    )
    bmmax = bm.agg(F.max("bm25").alias("mx"))
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    qv = vecs.filter(F.col("vec_id") == HYBRID_QUERY_VEC).select(
        F.col("v").alias("qvec")
    )
    scored = (
        bm.filter(F.col("doc_id") != HYBRID_QUERY_VEC)
        .join(vecs, bm["doc_id"] == vecs["vec_id"])
        .crossJoin(F.broadcast(bmmax))
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            F.round(F.col("bm25") / F.col("mx"), 6).alias("bm25_norm"),
            (
                F.round(cosine(F.col("v"), F.col("qvec")), 6) + F.lit(0.0)
            ).alias("cosine"),
        )
    )
    hybrid = (
        F.round(
            HYBRID_ALPHA * F.col("bm25_norm")
            + (1 - HYBRID_ALPHA) * F.col("cosine"),
            6,
        )
        + F.lit(0.0)
    )
    w = Window.orderBy(F.desc("hybrid"), F.asc("doc_id"))
    return (
        scored.withColumn("hybrid", hybrid)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= HYBRID_TOP_K)
        .select("doc_id", "bm25_norm", "cosine", "hybrid", "rank")
    )


KMEANS_K = 8  # clusters
KMEANS_ITERS = 2  # Lloyd iterations (unrolled in plan AND oracle)


def _l2(a: Column, b: Column) -> Column:
    """Euclidean distance of two array<double> columns — zip_with +
    aggregate, JVM-side, no UDF."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment — MAP-ONLY: the K centroids collapse
    into one broadcast ``collect_list`` row, each vector scores all K
    inline (higher-order transform) and keeps the lexicographic
    ``array_min`` winner.  No per-assignment shuffle at all: the old
    explode + ``groupBy(vec_id)`` form re-shuffled the corpus once per
    Lloyd iteration; this ships K·dim doubles to every executor and
    touches nothing else — at 100 TB the corpus never moves for
    assignment, only the (cluster, dim) mean update shuffles.

    The arg-min orders on ``(round(dist, 6), cluster)``: Spark and the
    DuckDB oracle each sum the squared deltas in their own fold order,
    so two near-tied centroids can differ bitwise in the last ulps
    between engines — deciding on a shared precision (with the
    cluster-id tie-break breaking exact rounded ties identically on
    both sides) removes that cascade; the oracle CTEs order the same
    way.  The raw distance rides along as a never-compared third field
    so the output still carries full precision."""
    return _assign_row(
        emb, cent.agg(F.collect_list(F.struct("cluster", "c")).alias("cs"))
    )


def _assign_row(emb: DataFrame, cents_row: DataFrame) -> DataFrame:
    """Scoring half of :func:`_assign`: ``cents_row`` is a ONE-ROW
    frame whose ``cs`` column is the array<struct<cluster, c>> centroid
    list; it attaches via broadcast and every vector arg-mins inline."""
    scored = F.transform(
        F.col("cs"),
        lambda s: F.struct(
            _l2(F.col("e"), s["c"]).alias("dist"), s["cluster"].alias("cluster")
        ),
    )
    best = F.array_min(
        F.transform(
            scored,
            lambda t: F.struct(
                F.round(t["dist"], 6).alias("dr"),
                t["cluster"].alias("cluster"),
                t["dist"].alias("dist"),
            ),
        )
    )
    return (
        emb.crossJoin(F.broadcast(cents_row))
        .withColumn("m", best)
        .select(
            "vec_id",
            F.col("m.cluster").alias("cluster"),
            "e",
            F.col("m.dist").alias("dist"),
        )
    )


def _assign_flat(emb: DataFrame, flat_row: DataFrame) -> DataFrame:
    """Assignment against a ONE-ROW frame carrying the FLAT
    (cluster, dim, m) means list (``fm``) — the r19 one-exchange-fewer
    Lloyd round (guide §2.4, VERDICT r18 #6): the per-(cluster, dim)
    means skip the groupBy(cluster) re-assembly exchange and go
    straight into the single-partition collect; the per-cluster
    centroid arrays re-assemble HERE, once, inside the broadcast
    build's projection (a one-row frame — never per corpus row).
    Ordering: the filtered structs sort by (cluster, dim[, m]), so each
    centroid array is in dim order — exactly ``_update``'s
    array_sort(collect_list(struct(dim, m))).  Measured on
    q_embedding_kmeans at sf0.1: 1.11 → 0.97 s median (interleaved
    A/B), identical assignment checksums."""
    cs_expr = F.transform(
        F.array_sort(
            F.array_distinct(F.transform("fm", lambda s: s["cluster"]))
        ),
        lambda cl: F.struct(
            cl.alias("cluster"),
            F.transform(
                F.array_sort(F.filter("fm", lambda s: s["cluster"] == cl)),
                lambda s: s["m"],
            ).alias("c"),
        ),
    )
    return _assign_row(emb, flat_row.select(cs_expr.alias("cs")))


def _update(assigned: DataFrame) -> DataFrame:
    """Per-cluster centroid update: posexplode dims → (cluster, dim)
    mean — one keyed aggregate with map-side partial combine — then
    re-assemble the ordered centroid array.  Empty clusters drop (both
    engines).

    r18 A/B note (guide §1.1): a one-exchange spelling — ``dim``
    per-element ``avg(e[d])`` aggregates keyed on cluster — was tried
    for this function and REVERTED: despite one fewer Exchange it
    measured consistently slower for the kmeans path at sf0.1
    (q_embedding_kmeans ~0.86 s with this spelling vs ~1.1 s with the
    wide-aggregate one; 64 array extractions per input row in the
    partial-agg stage cost more than the skinny explode).  The fused
    PQ fit keeps its own inline wide-aggregate update over PQ_SUB=16
    element slices — validated as part of the fused fit's overall win
    (q_similarity_pq_adc 4.43 → 2.4 s vs r17), not per-spelling."""
    return (
        assigned.select("cluster", F.posexplode("e").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(F.avg("val").alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("c")
        )
    )


# Unrolled-Lloyd CTE prefix shared by the kmeans oracle and the
# within-cluster semantic-dedup oracle (functions/dedup.py): v = cast
# embeddings, c0 = deterministic init, aN/cN = assignment/update per
# iteration, af = final assignment under c2 (with the vector kept for
# downstream pair math).
KMEANS_ORACLE_CTES = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
c0 AS (
  SELECT CAST(vec_id AS INTEGER) AS cluster, e AS c FROM v
  WHERE vec_id < {KMEANS_K}
),
a1 AS (
  SELECT vec_id, e, cluster FROM (
    SELECT v.vec_id, v.e, c0.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(list_distance(v.e, c0.c), 6), c0.cluster) AS rn
    FROM v CROSS JOIN c0
  ) WHERE rn = 1
),
x1 AS (SELECT cluster, generate_subscripts(e, 1) AS dim, unnest(e) AS val FROM a1),
m1 AS (SELECT cluster, dim, avg(val) AS m FROM x1 GROUP BY cluster, dim),
c1 AS (SELECT cluster, list(m ORDER BY dim) AS c FROM m1 GROUP BY cluster),
a2 AS (
  SELECT vec_id, e, cluster FROM (
    SELECT v.vec_id, v.e, c1.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(list_distance(v.e, c1.c), 6), c1.cluster) AS rn
    FROM v CROSS JOIN c1
  ) WHERE rn = 1
),
x2 AS (SELECT cluster, generate_subscripts(e, 1) AS dim, unnest(e) AS val FROM a2),
m2 AS (SELECT cluster, dim, avg(val) AS m FROM x2 GROUP BY cluster, dim),
c2 AS (SELECT cluster, list(m ORDER BY dim) AS c FROM m2 GROUP BY cluster),
af AS (
  SELECT vec_id, e, cluster, dist FROM (
    SELECT v.vec_id, v.e, c2.cluster, list_distance(v.e, c2.c) AS dist,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(list_distance(v.e, c2.c), 6), c2.cluster) AS rn
    FROM v CROSS JOIN c2
  ) WHERE rn = 1
)"""


@query(
    "q_embedding_kmeans",
    oracle=KMEANS_ORACLE_CTES
    + """
SELECT vec_id, cluster, CAST(round(dist, 6) AS DOUBLE) AS dist FROM af
""",
)
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means corpus clustering over embeddings ({KMEANS_K} clusters,
    {KMEANS_ITERS} Lloyd iterations, deterministic init = the first K
    vectors by vec_id) — the clustering step behind SemDeDup-style
    semantic dedup and topic-balanced data mixing: cluster the corpus,
    then dedup/sample WITHIN clusters.

    Each iteration is one broadcast nearest-centroid assignment (K·dim
    doubles to every executor, never a corpus shuffle) plus one keyed
    per-(cluster, dim) mean.  The fixed iteration count keeps the whole
    computation one lazy unrolled plan — same pattern as PageRank — and
    lets the DuckDB oracle unroll the identical recurrence, so the
    iterative geometry is value-checked end to end.  A convergence-
    looping production variant would materialize centroids per round
    via io/materialize.py.  Output: (vec_id, cluster, dist) under the
    final centroids."""
    return kmeans_assignments(spark, sf_dir).select(
        "vec_id", "cluster", F.round("dist", 6).alias("dist")
    )


def kmeans_assignments(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Library form of the k-means fit: returns (vec_id, cluster, e,
    dist) under the final centroids — the shared input for
    q_embedding_kmeans and the within-cluster semantic dedup."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("e").alias("c")
    )
    # r19 (guide §2.4): each Lloyd round's centroid update feeds the
    # flat (cluster, dim) means STRAIGHT into the next assignment's
    # single-partition collect (``_assign_flat``), skipping the
    # groupBy(cluster) re-assembly exchange ``_update`` pays — one
    # exchange fewer per round, same means, same arg-min.  The round
    # algebra the unrolled oracle replays is unchanged:
    # assignment_k = argmin over avg-per-(cluster, dim) of
    # assignment_{k-1}.
    assigned = _assign(emb, cent)
    for _ in range(iters):
        flat = (
            assigned.select("cluster", F.posexplode("e").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .agg(F.collect_list(F.struct("cluster", "dim", "m")).alias("fm"))
        )
        assigned = _assign_flat(emb, flat)
    return assigned


QUANT_BITS_MAX = 127.0  # int8 symmetric quantization range


@query(
    "q_embedding_quantize_int8",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
scaled AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / {QUANT_BITS_MAX} AS scale
  FROM vecs
),
q AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> floor(x / scale + 0.5)) AS qv
  FROM scaled WHERE scale > 0
)
SELECT vec_id,
       CAST(round(scale, 8) AS DOUBLE) AS scale,
       CAST(list_max(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_max,
       CAST(round(list_max(
           list_transform(list_zip(v, qv),
                          p -> abs(p[1] - p[2] * scale))), 8)
            AS DOUBLE) AS max_abs_err
FROM q
""",
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYMMETRIC INT8 QUANTIZATION of the embedding column — the
    storage/bandwidth step every large ANN index applies before
    sharding (4× smaller vectors, SIMD int8 dot products): per-vector
    scale = max|x|/127, quantized q = floor(x/scale + 0.5), and the
    per-vector reconstruction-error bound max|x − q·scale| ≤ scale/2
    reported as data.

    Cross-engine exactness: rounding is floor(x + 0.5) — floor is
    exact in IEEE and identical in both engines, unlike round()'s
    half-way tie-breaking on doubles — so every quantized value and
    error hash-matches.  Map-only over the vectors (no shuffle at
    all beyond the scan); emits the quantization CONTRACT (scale,
    max quantized magnitude ≤ 127, error bound) rather than the int8
    payload, which is what a downstream index build verifies."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    scale = F.array_max(F.transform(F.col("v"), F.abs)) / F.lit(QUANT_BITS_MAX)
    scaled = vecs.withColumn("scale", scale).filter(F.col("scale") > 0)
    qv = F.transform(
        F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5))
    )
    q = scaled.withColumn("qv", qv)
    err = F.array_max(
        F.zip_with(
            F.col("v"), F.col("qv"),
            lambda x, qx: F.abs(x - qx * F.col("scale")),
        )
    )
    # err is materialized BEFORE the select that aliases the rounded
    # scale: Spark's lateral column alias resolution would otherwise
    # bind err's `scale` reference to the ROUNDED alias earlier in the
    # same select list, shifting the error by up to 127·5e-9
    q = q.withColumn("raw_err", err)
    return q.select(
        "vec_id",
        F.round("scale", 8).alias("scale"),
        F.array_max(F.transform(F.col("qv"), F.abs))
        .cast("long")
        .alias("q_max"),
        F.round("raw_err", 8).alias("max_abs_err"),
    )


# --- Product quantization (ADC) ---------------------------------------------

PQ_M = 4  # subspaces
PQ_SUB = 16  # dims per subspace (PQ_M * PQ_SUB = embedding dim)
PQ_K = 16  # codes per subspace codebook
PQ_ITERS = 2  # Lloyd iterations per codebook (unrolled in the oracle)
PQ_PROBE = 0  # query vector id
PQ_CAND = 100  # ADC candidate pool fetched before exact re-rank
PQ_TOPK = 10  # final re-ranked neighbors


def _pq_oracle(exclude: tuple = ()) -> str:
    """Unrolled PQ oracle: PQ_M independent unrolled-Lloyd codebook
    fits on vector slices (same recurrence as KMEANS_ORACLE_CTES),
    then ADC scoring against the probe — generated by the same loop
    shape as the Spark code so they stay term-for-term comparable.

    ``exclude`` drops vec_ids from the CANDIDATE set only (the
    codebook fit still sees the full corpus): the oracle twin of a
    row-level index DELETE executed after build — fit-then-delete is
    exactly the stored index's lifecycle order."""
    parts = [
        """
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
probe AS (SELECT e AS q FROM v WHERE vec_id = """ + str(PQ_PROBE) + ")"
    ]
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        parts.append(f"""
s{m} AS (SELECT vec_id, e[{lo}:{hi}] AS e FROM v),
c{m}_0 AS (
  SELECT CAST(vec_id AS INTEGER) AS cluster, e AS c
  FROM s{m} WHERE vec_id < {PQ_K}
)""")
        prev = f"c{m}_0"
        for it in range(1, PQ_ITERS + 1):
            parts.append(f"""
a{m}_{it} AS (
  SELECT vec_id, e, cluster FROM (
    SELECT s.vec_id, s.e, c.cluster,
           row_number() OVER (PARTITION BY s.vec_id
               ORDER BY round(list_distance(s.e, c.c), 6), c.cluster) AS rn
    FROM s{m} s CROSS JOIN {prev} c
  ) WHERE rn = 1
),
x{m}_{it} AS (SELECT cluster, generate_subscripts(e, 1) AS dim,
                     unnest(e) AS val FROM a{m}_{it}),
c{m}_{it} AS (
  SELECT cluster, list(m ORDER BY dim) AS c
  FROM (SELECT cluster, dim, avg(val) AS m FROM x{m}_{it}
        GROUP BY cluster, dim)
  GROUP BY cluster
)""")
            prev = f"c{m}_{it}"
        parts.append(f"""
enc{m} AS (
  SELECT vec_id, cluster AS code, c FROM (
    SELECT s.vec_id, c.cluster, c.c,
           row_number() OVER (PARTITION BY s.vec_id
               ORDER BY round(list_distance(s.e, c.c), 6), c.cluster) AS rn
    FROM s{m} s CROSS JOIN {prev} c
  ) WHERE rn = 1
)""")
    adc_terms = " + ".join(
        f"pow(list_distance(probe.q[{m * PQ_SUB + 1}:{(m + 1) * PQ_SUB}], "
        f"enc{m}.c), 2)"
        for m in range(PQ_M)
    )
    joins = " ".join(
        f"JOIN enc{m} ON enc{m}.vec_id = v.vec_id" for m in range(1, PQ_M)
    )
    codes = ", ".join(f"enc{m}.code" for m in range(PQ_M))
    not_in = ", ".join(str(i) for i in (PQ_PROBE, *exclude))
    return (
        "WITH " + ",".join(parts) + f"""
SELECT vec_id, codes, adc_dist, exact_dist FROM (
  SELECT v.vec_id AS vec_id,
         array_to_string([{codes}], '-') AS codes,
         CAST(round(sqrt({adc_terms}), 6) AS DOUBLE) AS adc_dist,
         CAST(round(list_distance(v.e, probe.q), 6) AS DOUBLE) AS exact_dist
  FROM v JOIN enc0 ON enc0.vec_id = v.vec_id {joins}
  CROSS JOIN probe
  WHERE v.vec_id NOT IN ({not_in})
  ORDER BY adc_dist, v.vec_id
  LIMIT {PQ_CAND}
)
ORDER BY exact_dist, vec_id
LIMIT {PQ_TOPK}
"""
    )


def _slice(col, m: int):
    return F.slice(col, m * PQ_SUB + 1, PQ_SUB)


def pq_fit_fused(emb: DataFrame) -> DataFrame:
    """Fit all PQ_M sub-codebooks as ONE (m, cluster)-keyed Lloyd
    recurrence and return the fused relation ``(m, cluster, c)``.

    r18 optimization (guide §2.3/§2.4, measured via the plan audit):
    the per-subspace loop ran PQ_M independent fits whose plans shared
    nothing — ``q_similarity_pq_adc`` compiled to 28 Exchanges / 14
    corpus scans with ZERO reuse, because each subspace's slice made
    every subtree unique.  Fused, the corpus slices once into
    (vec_id, m, e) rows (a PQ_M-way inline posexplode — PQ_SUB doubles
    per row, the same bytes the four separate scans each projected),
    every Lloyd iteration is ONE broadcast assignment over all
    PQ_M·PQ_K centroids plus ONE (m, cluster)-keyed per-element-avg
    aggregate, and all PQ_M codebooks fall out of a single chain.
    Per-subspace numbers are unchanged: each (m, cluster, d) group
    averages exactly the rows the separate fit averaged, the arg-min
    orders on the identical (round(dist, 6), cluster) struct within
    each subspace's own centroid list, and the unrolled DuckDB oracle
    is untouched.  At 100 TB this is the difference between PQ_M·
    (PQ_ITERS+1) corpus passes and (PQ_ITERS+1)."""
    sub = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[_slice(F.col("e"), m) for m in range(PQ_M)])
        ).alias("m", "e"),
    )
    cent = sub.filter(F.col("vec_id") < PQ_K).select(
        "m",
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("e").alias("c"),
    )
    for _ in range(PQ_ITERS):
        cents = cent.agg(
            F.collect_list(F.struct("m", "cluster", "c")).alias("cs")
        )
        mine = F.filter(F.col("cs"), lambda s: s["m"] == F.col("m"))
        best = F.array_min(
            F.transform(
                mine,
                lambda s: F.struct(
                    F.round(_l2(F.col("e"), s["c"]), 6).alias("dr"),
                    s["cluster"].alias("cluster"),
                ),
            )
        )
        assigned = (
            sub.crossJoin(F.broadcast(cents))
            .select("m", best["cluster"].alias("cluster"), "e")
        )
        cent = assigned.groupBy("m", "cluster").agg(
            F.array(*[F.avg(F.col("e")[d]) for d in range(PQ_SUB)]).alias(
                "c"
            )
        )
    return cent


def pq_fit(emb: DataFrame) -> list[DataFrame]:
    """Per-subspace view of :func:`pq_fit_fused` — the original
    signature, kept for callers that want one centroid table per
    subspace.  All PQ_M frames filter the SAME fused chain, so a plan
    that consumes several of them reuses one fit (ReusedExchange on
    the fused aggregate) instead of running PQ_M fits."""
    fused = pq_fit_fused(emb)
    return [
        fused.filter(F.col("m") == m).select("cluster", "c")
        for m in range(PQ_M)
    ]


@query("q_similarity_pq_adc", oracle=_pq_oracle())
def q_similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION with asymmetric-distance (ADC) search
    (Jégou et al. 2011) — the compression half of the large-scale ANN
    stack beside the IVF routing half: each vector is encoded as PQ_M
    codebook ids (64 floats → 4 bytes here, 64× smaller), and a query
    scores candidates by distance to each code's CENTROID, never
    touching the raw vectors.

    Scale design: codebook fitting is PQ_M independent kmeans runs on
    slices — per-round cost = map-only broadcast assignment + one
    (cluster, dim) mean keyed aggregate (the repo's kmeans shape), all
    on PQ_SUB-dim projections; state is PQ_M·PQ_K·PQ_SUB doubles, O(1)
    in corpus size.  Encoding and ADC scoring are MAP-ONLY: codebooks
    and the probe attach as broadcast one-row collect_list frames and
    every vector scores inline (higher-order transforms, no UDF); the
    only shuffle in the whole query is the final
    TakeOrderedAndProject(top-k).  At 100 TB an IVF+PQ composition
    routes with q_similarity_ann_ivf's centroid probe and scores with
    this ADC kernel over 64×-compressed codes.

    TWO-STAGE, as production PQ search actually runs: ADC fetches a
    PQ_CAND candidate pool over the compressed codes (cheap — code
    arithmetic only), then ONLY the candidates are re-ranked with true
    distances and the top PQ_TOPK returned.  On these near-random
    synthetic vectors raw ADC@10 ranking is noisy (quantization error
    rivals the neighbor-distance spread — measured 2-4/10 overlap),
    but the candidate pool catches the whole exact top-10 (measured
    10/10 at sf0.01; floor pinned in tests/test_llm_functions.py) —
    which is exactly why real systems re-rank.  The oracle unrolls
    all PQ_M codebook fits and replays both stages identically."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    # ONE broadcast of the fused (m, cluster, c) fit (r18): the four
    # per-subspace collect_list broadcasts each dragged their own copy
    # of the codebook-fit chain into the plan — 4 broadcast exchanges
    # over 4 unshared fits.  A single collect_list over the fused
    # relation ships the identical PQ_M·PQ_K centroids once and the
    # per-m scorer filters its subspace inline (a 64-element array
    # scan, free next to the distance arithmetic).
    fused = pq_fit_fused(emb)
    cents_row = fused.agg(
        F.collect_list(F.struct("m", "cluster", "c")).alias("cs")
    )
    probe = emb.filter(F.col("vec_id") == PQ_PROBE).select(
        F.col("e").alias("q")
    )
    # codebooks and probe ride ONE broadcast (r19): two separate
    # one-row broadcasts were two scheduled build jobs
    df = emb.filter(F.col("vec_id") != PQ_PROBE).crossJoin(
        F.broadcast(cents_row.crossJoin(probe))
    )
    def _scorer(m: int):
        # NB: must be a ONE-argument lambda — a second parameter would
        # be bound by transform() as the array INDEX, not a closure.
        def score(s):
            return F.struct(
                F.round(_l2(_slice(F.col("e"), m), s["c"]), 6).alias("dr"),
                s["cluster"].alias("cluster"),
                s["c"].alias("c"),
            )

        return score

    best = [
        F.array_min(
            F.transform(
                F.filter(F.col("cs"), lambda s: s["m"] == F.lit(m)),
                _scorer(m),
            )
        )
        for m in range(PQ_M)
    ]
    adc2 = None
    for m, b in enumerate(best):
        term = F.pow(_l2(_slice(F.col("q"), m), b["c"]), 2)
        adc2 = term if adc2 is None else adc2 + term
    cand = (
        df.select(
            "vec_id",
            F.array_join(
                F.array(*[b["cluster"] for b in best]), "-"
            ).alias("codes"),
            F.round(F.sqrt(adc2), 6).alias("adc_dist"),
            F.round(_l2(F.col("e"), F.col("q")), 6).alias("exact_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(PQ_CAND)
    )
    return cand.orderBy("exact_dist", "vec_id").limit(PQ_TOPK)
