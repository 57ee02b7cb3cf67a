"""Graph analytics over event-derived graphs: fixed-iteration
PageRank (iterative label propagation / connected components live in
``functions/dedup.py``).

LLM-pipeline pillar extension: corpus curation ranks sources and
documents by link/co-occurrence structure (domain authority for
crawl prioritization, co-visitation importance for dedup-cluster
representative selection).  The graph here is the bipartite
user↔item co-visitation graph extracted from ``events`` (item = the
``props.k`` key), symmetrized so every node has out-degree ≥ 1 —
which also removes the dangling-node mass question from the PageRank
recurrence.

Design rules:

  * The recurrence is the standard simplified PageRank
    ``r' = (1-d)/N + d * Σ_in r/outdeg`` with a FIXED iteration
    count, so the whole computation is one lazy unrolled plan —
    exactly expressible in SQL (the DuckDB oracle unrolls the same
    three iterations as CTEs) and bounded in lineage depth.  A
    production variant with convergence looping would checkpoint per
    iteration like ``functions/dedup.py:connected_components``.
  * The node count enters the plan as a broadcast one-row aggregate
    (``crossJoin(broadcast(...))``), never a driver-side
    ``.count()`` (the q_text_tfidf lesson, ADVICE r02).
  * Per-iteration work is one join edges×ranks + one keyed sum with
    map-side partial combine; the degree table joins on the same key
    so AQE can reuse the exchange.  Nothing corpus-scale is ever
    broadcast.
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table
from setup_harvest_action_spark.io.materialize import materialize

DAMPING = 0.85
ITERATIONS = 3


def copurchase_pairs(li: DataFrame, min_weight: int = 1) -> DataFrame:
    """Co-purchase edges ``(u, v)`` with ``u < v``: parts are adjacent
    when some order contains both, weighted by line-pair count, kept
    when the weight reaches ``min_weight``.

    Built SINGLE-SCAN: group lines by order, sort the in-order part
    list, expand ordered pairs INSIDE the array (map-side lambda —
    strictly-ascending ``y > x`` drops equal-part pairs exactly like
    the equivalent self-join's ``pa < pb``), then one pair-keyed
    count.  Semantically identical to
    ``lineitem a JOIN lineitem b ON same order AND a.pk < b.pk``
    (which is what every oracle states), but the plan is ONE shuffle
    keyed on l_orderkey plus one pair-keyed aggregate, versus the
    join's two exchange+sort legs, join, and aggregate — measured
    10.1s → 2.7s at sf0.1 for the pair build (BENCHNOTES r10 late).

    100 TB: the per-order group is bounded by the data model (an
    order has ≤7 lines), so the collected array is O(1) and the
    expansion O(lines²-per-order) — never a skew surface; the
    pair-keyed aggregate partial-combines map-side."""
    weighted = min_weight > 1
    collect = F.collect_list if weighted else F.collect_set
    ps = li.groupBy("l_orderkey").agg(
        F.array_sort(collect("l_partkey")).alias("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            "ps",
            lambda x, i: F.transform(
                F.filter(
                    F.slice(F.col("ps"), i + 2, F.size("ps")),
                    lambda y: y > x,
                ),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    pairs = ps.select(F.explode(pair_structs).alias("p")).select(
        F.col("p.u").alias("u"), F.col("p.v").alias("v")
    )
    if not weighted:
        # distinct edges: dedup in-order via collect_set (smaller
        # arrays, no duplicate expansion), then one distinct across
        # orders — the y > x filter is then redundant but kept for one
        # code path
        return pairs.distinct()
    return (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_weight)
        .select("u", "v")
    )


def pagerank(edges: DataFrame, iterations: int = ITERATIONS,
             damping: float = DAMPING) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list
    ``(src, dst)``.  Every node must appear as a ``src`` at least once
    (symmetrize the graph first if needed) — that keeps out-degrees
    positive and drops the dangling-mass term from the recurrence.

    Returns ``(node, rank)`` with the UNROUNDED rank; callers round
    for value comparison."""
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_row = nodes.agg(F.count("*").cast("double").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_row))
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


@query(
    "q_graph_pagerank",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS u,
                  'i' || json_extract_string(props, '$.k') AS i
  FROM events
),
edges AS (
  SELECT u AS src, i AS dst FROM pairs
  UNION ALL
  SELECT i AS src, u AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
c1 AS (
  SELECT e.dst AS node, sum(r.rank / d.outdeg) AS s
  FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r1 AS (
  SELECT nodes.node, {1.0 - DAMPING} / nn.n + {DAMPING} * coalesce(c1.s, 0) AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.node = c1.node
),
c2 AS (
  SELECT e.dst AS node, sum(r.rank / d.outdeg) AS s
  FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r2 AS (
  SELECT nodes.node, {1.0 - DAMPING} / nn.n + {DAMPING} * coalesce(c2.s, 0) AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.node = c2.node
),
c3 AS (
  SELECT e.dst AS node, sum(r.rank / d.outdeg) AS s
  FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r3 AS (
  SELECT nodes.node, {1.0 - DAMPING} / nn.n + {DAMPING} * coalesce(c3.s, 0) AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.node = c3.node
)
SELECT node, CAST(round(rank, 8) AS DOUBLE) AS rank FROM r3
""",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized user↔item co-visitation graph
    (item = ``props.k``), {ITERATIONS} iterations, damping {DAMPING}.
    The oracle unrolls the identical recurrence as three SQL CTEs, so
    the iterative algebra is value-checked end to end — same pattern
    as the recursive-CTE oracle for connected components."""
    return pagerank_user_item(spark, sf_dir)


def pagerank_user_item(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Library form of q_graph_pagerank with the materialization
    location exposed (tests pass a tmp_path; cluster jobs a shared-FS
    path — see io/materialize.py)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.concat(F.lit("u"), F.col("user_id")).alias("u"),
        F.concat(F.lit("i"), F.get_json_object("props", "$.k")).alias("i"),
    )
    # Materialize the distinct pair set once (same lineage-truncation
    # pattern as connected_components): the unrolled iterations
    # reference edges/degrees/nodes ~10 times each, and without the
    # cut every reference re-scans the EVENTS source — 28 scans of the
    # raw table in the static plan, which is the difference between a
    # pipeline and a disaster at 100 TB.  The pair set is bounded by
    # |users| x |items|, far smaller than the event log.
    pairs = materialize(ev.distinct(), "pagerank_pairs", checkpoint_dir)
    edges = pairs.select(F.col("u").alias("src"), F.col("i").alias("dst")).unionAll(
        pairs.select(F.col("i").alias("src"), F.col("u").alias("dst"))
    )
    return pagerank(edges).select("node", F.round("rank", 8).alias("rank"))


@query(
    "q_graph_triangle_count",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey)    AS u,
                  greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
  GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS src,
         CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS dst
  FROM pairs p
  JOIN deg du ON du.node = p.u
  JOIN deg dv ON dv.node = p.v
),
wedges AS (
  SELECT e1.dst AS a, e2.dst AS b
  FROM oriented e1
  JOIN oriented e2 ON e1.src = e2.src AND e1.dst < e2.dst
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM wedges w JOIN pairs p ON p.u = w.a AND p.v = w.b
)
SELECT (SELECT count(*) FROM pairs)                          AS n_edges,
       (SELECT count(*) FROM deg)                            AS n_nodes,
       (SELECT sum(d * (d - 1) / 2) FROM deg)                AS n_wedges,
       (SELECT n_triangles FROM tri)                         AS n_triangles,
       CAST(round(3.0 * (SELECT n_triangles FROM tri)
                  / (SELECT sum(d * (d - 1) / 2) FROM deg), 6) AS DOUBLE)
           AS global_clustering
""",
)
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient on the
    part co-purchase graph (parts are adjacent when some order
    contains both), via DEGREE-ORIENTED wedge closure — the
    MapReduce-era Cohen / Suri-Vassilvitskii algorithm, which is the
    only triangle join that survives skew at 100 TB.

    Each undirected edge is oriented from its lower-(degree, id)
    endpoint to the higher, which caps effective out-degree at O(√|E|)
    and counts every triangle exactly once (no /3 correction).  The
    closure (r13 rewrite, measured 2× on the bench graph: 12.0 →
    5.9 s solo at sf0.1) is ADJACENCY-LIST INTERSECTION instead of a
    wedge self-join: build each node's sorted out-neighbor array ONCE
    (total payload = |E| entries), join every oriented edge (u, v) to
    the two arrays, and count |N⁺(u) ∩ N⁺(v)| per edge with the
    codegen'd ``array_intersect`` — the wedge set is never
    MATERIALIZED OR SHUFFLED.  Work stays the Σ-intersection-cost
    O(|E|^{3/2}) optimum, but shuffle volume drops from O(|E|^{3/2})
    wedge rows to O(|E|) adjacency entries — at 100 TB that is the
    difference between shuffling the wedge blow-up and shuffling the
    graph.  Per-row memory is bounded by the orientation's O(√|E|)
    out-degree cap.  The edge list is materialized ONCE (lineage cut,
    same pattern as PageRank's pair set) because degrees, orientation,
    and closure all re-reference it.  Output is a one-row graph
    summary; the oracle spells the same count as the equivalent wedge
    CTE chain (counts are representation-independent).

    Shuffle-volume model at 100 TB: SCALE.md §4.
    """
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    pairs = materialize(copurchase_pairs(li), "triangle_pairs")
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # r19 (guide §1.2/§2.4): the oriented edge list was a LAZY subtree
    # consumed three times (the closure's probe side plus both
    # adjacency builds), each consumer re-running pairs ⋈ deg ⋈ deg —
    # the before-plan carried 21 parquet scans / 14 exchanges with
    # zero reuse.  Materializing oriented once (|E| rows, two ints)
    # turns all three consumers into scans of one bounded table, and
    # n_edges rides the write as an Observation (orientation is a
    # bijection on edges, so count(oriented) IS count(pairs) — the
    # separate pairs-count job disappears).
    obs = Observation()
    oriented = materialize(
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .observe(obs, F.count(F.lit(1)).alias("n_edges")),
        "triangle_oriented",
    )
    n_edges = int(obs.get["n_edges"])
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    a_u = adj.select(F.col("src").alias("e_src"), F.col("nbrs").alias("nbrs_src"))
    a_v = adj.select(F.col("src").alias("e_dst"), F.col("nbrs").alias("nbrs_dst"))
    # node count and wedge count come from ONE aggregation over deg
    # (two scalar jobs fused; same values, same types)
    deg_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("double").alias(
            "n_wedges"
        ),
    )
    n_tri = (
        oriented.select(
            F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
        )
        .join(a_u, "e_src")
        .join(a_v, "e_dst")
        .select(F.size(F.array_intersect("nbrs_src", "nbrs_dst")).alias("c"))
        .agg(F.sum("c").cast("bigint").alias("n_triangles"))
    )
    return (
        n_tri.crossJoin(F.broadcast(deg_stats))
        .select(
            F.lit(n_edges).cast("bigint").alias("n_edges"),
            "n_nodes",
            "n_wedges",
            "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6).alias(
                "global_clustering"
            ),
        )
    )


BFS_MAX_HOPS = 2  # bounded-hop neighborhood expansion


@query(
    "q_graph_bfs_distance",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey)    AS u,
                  greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (
  SELECT u AS node, v AS other FROM pairs
  UNION ALL
  SELECT v AS node, u AS other FROM pairs
),
src AS (SELECT min(u) AS s FROM pairs),
walk AS (
  WITH RECURSIVE w(node, dist) AS (
    SELECT s, 0 FROM src
    UNION ALL
    SELECT e.other, w.dist + 1
    FROM w JOIN edges e ON e.node = w.node
    WHERE w.dist < {BFS_MAX_HOPS}
  )
  SELECT node, min(dist) AS dist FROM w GROUP BY node
)
SELECT node, CAST(dist AS INTEGER) AS dist FROM walk
""",
)
def q_graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS shortest distances from a deterministic source
    (the minimum part key) over the part co-purchase graph — the
    neighborhood-expansion primitive under "related items within k
    hops", contamination blast-radius checks, and graph feature
    generation.

    Iterative frontier expansion, the third member of the repo's
    iterative-graph family (PageRank, connected components): each hop
    is ONE equi-join frontier⋈edges + one min-aggregate against the
    accumulated distance map, materialized per hop (same lineage-cut
    discipline as the others — an unrolled BFS plan re-derives every
    prior frontier exponentially otherwise).  At 100 TB each hop
    shuffles on the vertex key with the same partitioning every
    iteration; the frontier join is dominated by Σ deg(frontier), so
    bounded hops bound the work regardless of graph size.  The source
    enters as a broadcast one-row aggregate — never a collected
    scalar.  The oracle walks the identical expansion as a recursive
    CTE with the same hop bound."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = materialize(
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .distinct(),
        "bfs_pairs",
    )
    edges = pairs.select(F.col("u").alias("node"), F.col("v").alias("other")).unionAll(
        pairs.select(F.col("v").alias("node"), F.col("u").alias("other"))
    )
    src = pairs.agg(F.min("u").alias("node")).select(
        "node", F.lit(0).alias("dist")
    )
    dist = materialize(src, "bfs_dist")
    frontier = dist
    for hop in range(1, BFS_MAX_HOPS + 1):
        expanded = (
            frontier.join(edges, "node")
            .select(F.col("other").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
        )
        merged = (
            dist.unionByName(expanded)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        dist = materialize(merged, "bfs_dist")
        # next frontier: nodes first reached this hop
        frontier = dist.filter(F.col("dist") == hop)
    return dist.select("node", F.col("dist").cast("int").alias("dist"))


KCORE_K = 80  # coreness threshold for the co-purchase graph
KCORE_MAX_ROUNDS = 8  # unrolled-oracle bound (measured: 5 rounds at sf0.01/sf0.1)

_KCORE_ORACLE = """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                  greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS MATERIALIZED (SELECT u AS a, v AS b FROM pairs UNION ALL SELECT v, u FROM pairs),
live0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM und),
live1 AS MATERIALIZED (
  SELECT e.a AS node FROM und e
  JOIN live0 x ON e.a = x.node
  JOIN live0 y ON e.b = y.node
  GROUP BY e.a HAVING count(*) >= 80),
live2 AS MATERIALIZED (
  SELECT e.a AS node FROM und e
  JOIN live1 x ON e.a = x.node
  JOIN live1 y ON e.b = y.node
  GROUP BY e.a HAVING count(*) >= 80),
live3 AS MATERIALIZED (
  SELECT e.a AS node FROM und e
  JOIN live2 x ON e.a = x.node
  JOIN live2 y ON e.b = y.node
  GROUP BY e.a HAVING count(*) >= 80),
live4 AS MATERIALIZED (
  SELECT e.a AS node FROM und e
  JOIN live3 x ON e.a = x.node
  JOIN live3 y ON e.b = y.node
  GROUP BY e.a HAVING count(*) >= 80),
live5 AS MATERIALIZED (
  SELECT e.a AS node FROM und e
  JOIN live4 x ON e.a = x.node
  JOIN live4 y ON e.b = y.node
  GROUP BY e.a HAVING count(*) >= 80),
live6 AS MATERIALIZED (
  SELECT e.a AS node FROM und e
  JOIN live5 x ON e.a = x.node
  JOIN live5 y ON e.b = y.node
  GROUP BY e.a HAVING count(*) >= 80),
live7 AS MATERIALIZED (
  SELECT e.a AS node FROM und e
  JOIN live6 x ON e.a = x.node
  JOIN live6 y ON e.b = y.node
  GROUP BY e.a HAVING count(*) >= 80),
live8 AS MATERIALIZED (
  SELECT e.a AS node FROM und e
  JOIN live7 x ON e.a = x.node
  JOIN live7 y ON e.b = y.node
  GROUP BY e.a HAVING count(*) >= 80)
SELECT e.a AS node, CAST(count(*) AS BIGINT) AS core_degree
FROM und e
JOIN live8 x ON e.a = x.node
JOIN live8 y ON e.b = y.node
GROUP BY e.a
"""


@query("q_graph_kcore", oracle=_KCORE_ORACLE)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE DECOMPOSITION (k = 80) of the co-purchase graph —
    iterative peeling: repeatedly drop every node with fewer than k
    surviving neighbors until a fixpoint; the surviving subgraph is
    the k-core (the standard dense-community / influence primitive
    beside PageRank and CC).  Returns each core member with its
    within-core degree.

    Spark shape: the edge list materializes ONCE (lineage cut, as in
    CC/PageRank); each round is two semi-joins of the undirected edge
    list against the current survivor set + one keyed count — all
    hash-partitioned on node, no driver-side graph.  Convergence is a
    per-round survivor-count action; rounds are bounded by
    KCORE_MAX_ROUNDS and the loop raises if the fixpoint is not
    reached (the ORACLE unrolls exactly that many peel rounds —
    measured convergence is 5 rounds at both gate scales, the bound
    is slack, and extra unrolled rounds are no-ops once the set stops
    shrinking).  At 100 TB each round shuffles |E| rows keyed by
    node; total work = rounds × E, and the peel usually converges in
    O(10) rounds on power-law graphs — the same round-bound argument
    as label-propagation CC (SCALE.md §5)."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE materialize — the peel only reads the symmetrized form; see
    # the interleaved A/B note on q_graph_label_propagation (r19)
    cp = copurchase_pairs(li)
    und = materialize(
        cp.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
            cp.select(F.col("v").alias("a"), F.col("u").alias("b"))
        ),
        "kcore_und",
    )
    live = und.select(F.col("a").alias("node")).distinct()
    n_live = live.count()
    for _ in range(KCORE_MAX_ROUNDS):
        surv = (
            und.join(live.withColumnRenamed("node", "a"), "a")
            .join(live.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select(F.col("a").alias("node"))
        )
        surv = materialize(surv, "kcore_live")
        n_surv = surv.count()
        live = surv
        if n_surv == n_live:
            break
        n_live = n_surv
    else:
        raise RuntimeError(
            f"k-core peel did not converge in {KCORE_MAX_ROUNDS} rounds - "
            "raise KCORE_MAX_ROUNDS (and the oracle unroll) together"
        )
    return (
        und.join(live.withColumnRenamed("node", "a"), "a")
        .join(live.withColumnRenamed("node", "b"), "b")
        .groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


LPA_ROUNDS = 4  # fixed synchronous rounds; the oracle unrolls the same 4

_LPA_ORACLE = """
WITH pairs AS MATERIALIZED (
  SELECT least(a.l_partkey, b.l_partkey) AS u,
         greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
und AS MATERIALIZED (SELECT u AS a, v AS b FROM pairs UNION ALL SELECT v, u FROM pairs),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und),
lp1 AS MATERIALIZED (
  SELECT a AS node, max_by(label, cnt * 1000000000 - label) AS label
  FROM (SELECT e.a, l.label, count(*) AS cnt
        FROM und e JOIN l0 l ON e.b = l.node GROUP BY e.a, l.label)
  GROUP BY a),
lp2 AS MATERIALIZED (
  SELECT a AS node, max_by(label, cnt * 1000000000 - label) AS label
  FROM (SELECT e.a, l.label, count(*) AS cnt
        FROM und e JOIN lp1 l ON e.b = l.node GROUP BY e.a, l.label)
  GROUP BY a),
lp3 AS MATERIALIZED (
  SELECT a AS node, max_by(label, cnt * 1000000000 - label) AS label
  FROM (SELECT e.a, l.label, count(*) AS cnt
        FROM und e JOIN lp2 l ON e.b = l.node GROUP BY e.a, l.label)
  GROUP BY a),
lp4 AS MATERIALIZED (
  SELECT a AS node, max_by(label, cnt * 1000000000 - label) AS label
  FROM (SELECT e.a, l.label, count(*) AS cnt
        FROM und e JOIN lp3 l ON e.b = l.node GROUP BY e.a, l.label)
  GROUP BY a)
SELECT label AS community,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(node) AS BIGINT) AS min_node
FROM lp4 GROUP BY label
"""


@query("q_graph_label_propagation", oracle=_LPA_ORACLE)
def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-PROPAGATION community detection (Raghavan et al. 2007)
    over the co-purchase graph — the near-linear-time community
    primitive beside PageRank/CC/triangles/k-core: every node starts
    as its own label, then each synchronous round adopts the label
    most frequent among neighbors, ties broken DETERMINISTICALLY
    toward the smallest label (the argmax packs ``(count, -label)``
    into one BIGINT score, so both engines pick the identical label —
    plain LPA's random tie-break would be irreproducible and
    un-oracle-able).  Fixed LPA_ROUNDS synchronous rounds (the
    asynchronous variant converges faster but is order-dependent);
    output is the community summary (label, size, smallest member).

    Spark shape: edge list materialized ONCE (lineage cut); each
    round is one edges⋈labels hash join keyed on the neighbor + one
    (node, label) count with map-side combine + one per-node argmax —
    all partitioned by node id, nothing corpus-scale broadcast, no
    driver-side graph.  At 100 TB each round shuffles |E| rows keyed
    by node (SCALE.md §5's round-bound argument); community count
    falls geometrically so later rounds' count tables shrink.
    Hash-verified against the unrolled oracle at sf0.01 AND sf0.1."""
    li = load_table(spark, sf_dir, "lineitem")
    # min_weight=2 — repeated co-purchase: the sparse, community-
    # bearing backbone (the dense 1-hit graph collapses LPA to two
    # giant labels — measured on the fixture)
    #
    # ONE materialize (r19, guide §2.4): LPA only ever reads the
    # symmetrized form, so the intermediate pairs table was a whole
    # write+read job cycle with no reader of its own; both union
    # branches share the pair build's final (u, v) aggregate exchange,
    # which AQE reuses inside the write.  Interleaved A/B at sf0.1
    # (sequential probes drift too much to decide this): two-step
    # 3.056 s median vs folded 2.564 s, jobs 18 → 16, every folded
    # pass faster than its adjacent two-step pass.
    cp = copurchase_pairs(li, min_weight=2)
    und = materialize(
        cp.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
            cp.select(F.col("v").alias("a"), F.col("u").alias("b"))
        ),
        "lpa_und",
    )
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    # r18: the per-round label materialize is GONE (guide §1.2/§2.4).
    # Unlike CC (labels referenced twice per round — union + the
    # convergence join — so the uncut plan is O(2^k)) and k-core (two
    # semi-joins per round), each LPA round references the previous
    # labels exactly ONCE (the neighbor join), so the unrolled
    # LPA_ROUNDS plan grows LINEARLY and runs as one lazy job over the
    # materialized edge table — four parquet write+read hops and four
    # job launches saved per query, zero change to the per-round
    # algebra the oracle unrolls.
    for _ in range(LPA_ROUNDS):
        counts = (
            und.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label")
                ),
                "b",
            )
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = counts.groupBy(F.col("a").alias("node")).agg(
            F.expr(
                "max_by(label, cnt * 1000000000 - label)"
            ).alias("label")
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("node").cast("long").alias("min_node"),
    )


_HITS_ORACLE = """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS u,
                  'i' || json_extract_string(props, '$.k') AS i
  FROM events
),
h0 AS (SELECT DISTINCT u AS node, 1.0 AS h FROM pairs),
a1r AS (
  SELECT p.i AS node, sum(h0.h) AS s
  FROM pairs p JOIN h0 ON p.u = h0.node GROUP BY p.i),
a1 AS (SELECT node, s / (SELECT sum(s) FROM a1r) AS a FROM a1r),
h1r AS (
  SELECT p.u AS node, sum(a1.a) AS s
  FROM pairs p JOIN a1 ON p.i = a1.node GROUP BY p.u),
h1 AS (SELECT node, s / (SELECT sum(s) FROM h1r) AS h FROM h1r),
a2r AS (
  SELECT p.i AS node, sum(h1.h) AS s
  FROM pairs p JOIN h1 ON p.u = h1.node GROUP BY p.i),
a2 AS (SELECT node, s / (SELECT sum(s) FROM a2r) AS a FROM a2r),
h2r AS (
  SELECT p.u AS node, sum(a2.a) AS s
  FROM pairs p JOIN a2 ON p.i = a2.node GROUP BY p.u),
h2 AS (SELECT node, s / (SELECT sum(s) FROM h2r) AS h FROM h2r)
SELECT node, 'hub' AS kind, CAST(round(h, 8) AS DOUBLE) AS score FROM h2
UNION ALL
SELECT node, 'authority' AS kind, CAST(round(a, 8) AS DOUBLE) AS score FROM a2
"""


@query("q_graph_hits", oracle=_HITS_ORACLE)
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg) over the DIRECTED
    user→item co-visitation graph — PageRank's bipartite sibling:
    users score as HUBS (they touch important items), items as
    AUTHORITIES (they are touched by important users); the curation
    reading is crawl-seed quality vs document authority.  Two
    synchronous rounds, L1-normalized each half-step (the classical
    L2 norm needs sqrt; L1 keeps the algebra plain sums and the
    eigenvector direction identical), unrolled in the oracle as the
    same CTE chain.

    Spark shape: the distinct pair set materializes ONCE (the
    pagerank lineage-cut argument — every unrolled reference re-scans
    events otherwise); each half-step is one pairs⋈scores hash join +
    keyed sum with map-side combine; each normalizer is a broadcast
    one-row aggregate attach, never a driver collect.  At 100 TB the
    per-round shuffle is |pairs| rows keyed by node — identical cost
    envelope to PageRank (SCALE.md §5's round argument)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.concat(F.lit("u"), F.col("user_id")).alias("u"),
        F.concat(F.lit("i"), F.get_json_object("props", "$.k")).alias("i"),
    )
    pairs = materialize(ev.distinct(), "hits_pairs")
    hubs = pairs.select(F.col("u").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("score")
    )
    auth = None
    for _ in range(2):
        raw_a = (
            pairs.join(
                hubs.select(F.col("node").alias("u"), "score"), "u"
            )
            .groupBy(F.col("i").alias("node"))
            .agg(F.sum("score").alias("s"))
        )
        auth = (
            raw_a.crossJoin(
                F.broadcast(raw_a.agg(F.sum("s").alias("tot")))
            )
            .select("node", (F.col("s") / F.col("tot")).alias("score"))
        )
        raw_h = (
            pairs.join(
                auth.select(F.col("node").alias("i"), "score"), "i"
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("score").alias("s"))
        )
        hubs = (
            raw_h.crossJoin(
                F.broadcast(raw_h.agg(F.sum("s").alias("tot")))
            )
            .select("node", (F.col("s") / F.col("tot")).alias("score"))
        )
    return hubs.select(
        "node", F.lit("hub").alias("kind"), F.round("score", 8).alias("score")
    ).unionAll(
        auth.select(
            "node",
            F.lit("authority").alias("kind"),
            F.round("score", 8).alias("score"),
        )
    )
