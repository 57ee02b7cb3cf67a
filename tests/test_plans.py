"""Physical-plan contracts — the scale properties VERDICT.md grades.

These tests pin the PLAN, not the result: filters reach the parquet
scan, only true dimensions are broadcast, per-group top-k uses
WindowGroupLimit, aggregates run partial/final.  A regression here
means a query silently degraded to a shape that breaks at 100 TB even
though its sf0.01 results still hash-match.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from setup_harvest_action_spark.catalog import load_catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    q, _ = load_catalog()
    return q


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def tree_of(df) -> str:
    """Just the operator tree of the formatted explain (the node-detail
    section repeats every operator name, which breaks counting)."""
    return plan_of(df).split("\n\n")[0]


@contextlib.contextmanager
def conf(spark, key: str, value: str):
    old = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, old)


def test_filter_and_projection_reach_parquet_scan(spark, queries):
    plan = plan_of(queries["q_filter_project"](spark, SF))
    # predicate pushdown into the parquet reader
    assert "PushedFilters" in plan
    assert "GreaterThan(o_totalprice,1000.0)" in plan
    assert "EqualTo(o_orderstatus,O)" in plan
    # column pruning: unreferenced columns never enter ReadSchema
    assert "o_orderdate" not in plan
    assert "o_comment" not in plan


def test_revenue_broadcasts_only_true_dimensions(spark, queries):
    # Simulate fact-scale inputs: with auto-broadcast off, ONLY the
    # explicit hints may broadcast.  nation+region are hinted (bounded
    # dims); customer and lineitem⋈orders must shuffle (SMJ) — a forced
    # broadcast of a customer-derived side here is the round-1 OOM
    # anti-pattern this test pins down.
    with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        tree = tree_of(queries["q_revenue_by_nation"](spark, SF))
    assert tree.count("BroadcastHashJoin") == 2  # nation, region only
    assert tree.count("SortMergeJoin") == 2  # li⋈orders, fact⋈customer


def test_topk_per_group_uses_window_group_limit(spark, queries):
    # rank<=k over a window must compile to WindowGroupLimit (partial
    # per-partition top-k before the shuffle), not a full sort of every
    # group.
    plan = plan_of(queries["q_window_topk_per_group"](spark, SF))
    assert "WindowGroupLimit" in plan


def test_pricing_summary_aggregates_partially(spark, queries):
    # partial (map-side) + final hash aggregate around one exchange, so
    # the shuffle carries one row per (group × partition), not per row.
    tree = tree_of(queries["q_pricing_summary"](spark, SF))
    assert tree.count("HashAggregate") == 2
    assert "Exchange" in tree
    simple = plan_of(queries["q_pricing_summary"](spark, SF), "simple")
    assert "partial_sum" in simple  # map-side combine is real
    # whole-stage codegen spans (stars) — visible once AQE wrapping is off
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        nonaqe = plan_of(queries["q_pricing_summary"](spark, SF), "simple")
    assert "*(" in nonaqe


def test_read_path_scan_prunes_to_projection(spark, queries):
    # the flagship's customer scan must not read the wide comment /
    # address columns the query never touches.
    plan = plan_of(queries["q_harvest_read_path"](spark, SF))
    assert "c_comment" not in plan
    assert "o_comment" not in plan


def test_bucketed_join_avoids_shuffle(spark, queries):
    # Bucketing is the co-located-join story at 100 TB: both fact
    # tables bucketed+sorted on the join key read straight into a
    # sort-merge join with NO Exchange on either side — the shuffle
    # happened once at write time and is amortized over every
    # subsequent join.
    import shutil

    import pyspark.sql.functions as F

    from setup_harvest_action_spark.io.loaders import load_table

    # the warehouse dir outlives the in-memory catalog: remove stale
    # locations from previous sessions or saveAsTable refuses them
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("orders_bkt")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("lineitem_bkt")
    joined = spark.table("orders_bkt").join(
        spark.table("lineitem_bkt"), F.col("o_orderkey") == F.col("l_orderkey")
    )
    with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        tree = tree_of(joined)
    assert "SortMergeJoin" in tree
    assert "Exchange" not in tree  # bucket layout co-locates both sides
    # sanity: the same join on the unbucketed parquet DOES shuffle
    with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        plain = tree_of(
            orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        )
    assert "Exchange" in plain


def test_partitioned_write_prunes_partitions(spark, queries, tmp_path):
    # Hive-style partitioned layout is the other half of the pruning
    # story (row-group stats being the first): a filter on the
    # partition column must become a PartitionFilters entry so
    # non-matching directories are never opened.
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.io.loaders import load_table

    out = str(tmp_path / "orders_by_status")
    load_table(spark, SF, "orders").write.partitionBy("o_orderstatus").mode(
        "overwrite"
    ).parquet(out)
    df = (
        spark.read.parquet(out)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    plan = plan_of(df)
    import re

    assert re.search(r"PartitionFilters: \[.*o_orderstatus#\d+ = F", plan), plan
    # and the filter is gone from the data-level pushdown (it is a
    # directory decision now, not a row decision)
    n_f = df.count()
    n_all = load_table(spark, SF, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).count()
    assert n_f == n_all


def test_keyset_pagination_takes_ordered(spark, queries):
    # keyset pagination must compile to per-partition top-k
    # (TakeOrderedAndProject) with the cursor predicate pushed to the
    # scan — the two properties that make it the at-scale pagination.
    plan = plan_of(queries["q_pagination_keyset"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "GreaterThan(c_custkey,700)" in plan


def test_asof_join_is_single_exchange(spark, queries):
    """The as-of join's union+window form must stay ONE shuffle: union
    both sides, one Exchange on the partition key, one Window pass.  A
    regression to pairwise join + per-key max would show extra
    Exchanges/Joins here and blow up state at 100 TB."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_join_asof"](spark, SF))
    assert tree.count("Exchange") == 1
    assert tree.count("Window") == 1
    assert "Union" in tree
    assert "Join" not in tree


def test_ngram_jaccard_explodes_documents_once(spark, queries):
    """The inverted-index Jaccard must scan+explode `documents` exactly
    once: posting lists come from one shuffle of the exploded shingles,
    and sizes/pairs re-derive from that SAME exchange (ReusedExchange),
    never from a second scan — the property that beats the naive
    self-join (measured 2.4x slower)."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_dedup_ngram_jaccard"](spark, SF))
    assert tree.count("Scan parquet") == 1
    assert tree.count("ReusedExchange") >= 2


def test_connected_components_truncates_lineage(spark):
    """connected_components must hand back a lineage-truncated frame:
    the iterative DAG references each round's labels twice, so an
    un-truncated plan re-derives all rounds multiplicatively on every
    caller action.  The parquet ping-pong leaves a plain bounded-size
    scan with no joins left to re-run, and releases every cache it
    took (no retained RDDs leak to the caller)."""
    from setup_harvest_action_spark.functions.dedup import connected_components

    retained_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "vec_a long, vec_b long",
    )
    labels = connected_components(edges)
    plan = labels._jdf.queryExecution().toString()
    assert "Join" not in plan
    assert "parquet" in plan
    assert len(plan) < 4000
    retained_after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert retained_after == retained_before
    got = {(r.id, r.label) for r in labels.collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }


def test_tfidf_construction_launches_no_job(spark, queries):
    """q_text_tfidf's corpus cardinality must enter the plan as a
    broadcast 1-row aggregate, not a driver-side count(): constructing
    the query therefore launches ZERO Spark jobs (the r02 version ran a
    full corpus scan per construction)."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    n_before = len(before) if before else 0
    df = queries["q_text_tfidf"](spark, SF)
    after = tracker.getJobIdsForGroup(None)
    n_after = len(after) if after else 0
    assert n_after == n_before, "query construction ran a Spark job"
    # and the plan carries the corpus count as a broadcast join input
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_spread_construction_launches_no_job(spark, queries):
    """spread()/spread_groups() call df.rdd.getNumPartitions() on their
    input; on a SCAN-ROOTED frame that is planning metadata only.  Pin
    it at a real spread call site (q_quality_repetition wraps its scan
    in spread) so a future non-scan-rooted call site — where AQE would
    eagerly execute upstream exchanges at construction time — fails
    this test instead of silently running jobs per constructor call."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    n_before = len(before) if before else 0
    queries["q_quality_repetition"](spark, SF)
    after = tracker.getJobIdsForGroup(None)
    n_after = len(after) if after else 0
    assert n_after == n_before, "spread construction ran a Spark job"


def test_hash_samplers_are_map_only(spark, queries):
    """The Bernoulli sample and split assignment must stay map-only —
    membership is a pure function of the row, so there is NO Exchange
    at any scale (the property that makes hash sampling free at 100 TB
    while df.sample() still rescans and a groupBy-based sampler
    shuffles)."""
    for name in ("q_sample_bernoulli_hash", "q_sample_train_valid_test"):
        tree = tree_of(queries[name](spark, SF))
        assert "Exchange" not in tree, name
        assert "Scan parquet" in tree, name


def test_zorder_write_tightens_stats_on_both_dims(spark, tmp_path):
    """Z-order clustering must shrink per-file min/max spans on EVERY
    clustered dimension — the property parquet stats pruning feeds on.
    A plain single-column sort leaves the second dimension's spans at
    ~the global range (no pruning possible); the Morton layout bounds
    both."""
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.io.layout import write_zordered
    from setup_harvest_action_spark.io.loaders import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    zdir = str(tmp_path / "zorder")
    write_zordered(orders, zdir, ["o_custkey", "o_totalprice"], n_files=8)
    sdir = str(tmp_path / "sorted")
    (
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    def mean_span_ratio(d: str, column: str) -> float:
        lo, hi = float("inf"), float("-inf")
        spans = []
        per_file = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmin, fmax = float("inf"), float("-inf")
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics:
                        fmin = min(fmin, float(col.statistics.min))
                        fmax = max(fmax, float(col.statistics.max))
            per_file.append((fmin, fmax))
            lo, hi = min(lo, fmin), max(hi, fmax)
        return sum(mx - mn for mn, mx in per_file) / len(per_file) / (hi - lo)

    z_price = mean_span_ratio(zdir, "o_totalprice")
    z_cust = mean_span_ratio(zdir, "o_custkey")
    s_price = mean_span_ratio(sdir, "o_totalprice")
    s_cust = mean_span_ratio(sdir, "o_custkey")
    # single-dim sort: first dim tight, second dim ~global
    assert s_cust < 0.35
    assert s_price > 0.85
    # z-order: BOTH dims bounded well below global
    assert z_cust < 0.7, z_cust
    assert z_price < 0.7, z_price
    assert z_price < s_price
    # and the rewrite loses no rows
    assert spark.read.parquet(zdir).count() == orders.count()


def test_constraint_report_construction_launches_no_job(spark, queries):
    """q_constraint_report must be one lazy unioned plan — constructing
    it runs zero Spark jobs (the r02 form ran four serial counts on the
    driver during construction)."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    n_before = len(before) if before else 0
    df = queries["q_constraint_report"](spark, SF)
    after = tracker.getJobIdsForGroup(None)
    n_after = len(after) if after else 0
    assert n_after == n_before
    assert df.count() == 4


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """64 tiny input files compact into ceil(rows/target) outputs with
    identical content; with sort columns the rewrite also restores
    clustering (non-overlapping per-file key ranges)."""
    import glob

    import pyarrow.parquet as pq

    from setup_harvest_action_spark.io.layout import compact_parquet
    from setup_harvest_action_spark.io.loaders import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey"
    )
    src = str(tmp_path / "fragmented")
    orders.repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 64

    dst = str(tmp_path / "compacted")
    total = orders.count()
    n = compact_parquet(spark, src, dst, target_rows_per_file=(total + 3) // 4,
                        sort_cols=["o_orderkey"])
    files = glob.glob(dst + "/*.parquet")
    assert n == 4 and len(files) <= 4
    out = spark.read.parquet(dst)
    assert out.count() == total
    assert out.select("o_orderkey").exceptAll(
        orders.select("o_orderkey")
    ).isEmpty()
    # clustering restored: per-file o_orderkey ranges don't overlap
    spans = sorted(
        (
            pq.read_metadata(f).row_group(0).column(0).statistics.min,
            pq.read_metadata(f).row_group(0).column(0).statistics.max,
        )
        for f in files
    )
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_lm_score_scans_documents_once(spark, queries):
    """The unigram LM scorer derives corpus term frequencies, the
    corpus total, AND the per-doc probe from ONE shuffled per-(doc,
    token) aggregate: with AQE off the whole-plan canonical form must
    expose a single documents scan plus reused exchanges — never a
    re-explode of the corpus per branch."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_text_lm_score"](spark, SF))
    assert tree.count("Scan parquet") == 1
    assert tree.count("ReusedExchange") >= 2


def test_source_cap_pushes_topk_into_sort(spark, queries):
    """The per-source cap must plan one source-keyed Exchange and a
    WindowGroupLimit (running top-k inside the sort): a skewed source
    costs O(cap) memory per partition, not O(domain size)."""
    df = queries["q_sample_source_cap"](spark, SF)
    tree = tree_of(df)
    assert "WindowGroupLimit" in tree
    assert tree.count("Exchange") == 1


def test_kmeans_broadcasts_centroids_never_shuffles_corpus_for_assign(
    spark, queries
):
    """Every nearest-centroid assignment must be a BroadcastNestedLoop/
    BroadcastExchange of the K centroids against the corpus — a
    SortMergeJoin would shuffle the full embedding table once per
    iteration."""
    tree = tree_of(queries["q_embedding_kmeans"](spark, SF))
    assert "SortMergeJoin" not in tree
    assert tree.count("BroadcastExchange") + tree.count(
        "ReusedExchange"
    ) >= 3  # one per assignment (2 iterations + final)


def test_shipping_priority_pushes_all_three_filters(spark, queries):
    """The Q3-shape composite must push each table's predicate into its
    own parquet scan and fold ORDER BY+LIMIT into TakeOrderedAndProject
    — the two properties that keep a selective 3-way join from reading
    or sorting the world."""
    plan = plan_of(queries["q_shipping_priority"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "c_comment" not in plan and "l_comment" not in plan


def test_pairs_threshold_joins_on_buckets_not_all_pairs(spark, queries):
    """The threshold-pairs query must source candidates from the LSH
    bucket equi-join — no CartesianProduct and no theta-only pair join;
    the only nested-loop joins allowed are the two tiny hyperplane
    broadcasts inside lsh_codes (one per side of the code self-join)."""
    import re

    df = queries["q_similarity_pairs_threshold"](spark, SF)
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert tree.count("BroadcastNestedLoopJoin") <= 2
    # candidate pairs come from an equi-join keyed on (table_id, code)
    assert re.search(r"keys \[2\]: \[table_id#\d+, code#\d+", plan)


def test_dynamic_partition_pruning_from_dim_filter(spark, queries, tmp_path):
    """Runtime half of the pruning story: when the fact table is
    partitioned on the join key and the filter sits on the DIMENSION,
    static pruning can't fire — Spark must inject a dynamic pruning
    subquery so the fact scan opens only the partitions the filtered
    dim actually joins to.  At 100 TB this is the difference between
    scanning 5 event-type partitions and one."""
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.io.loaders import load_table

    out = str(tmp_path / "events_by_type")
    load_table(spark, SF, "events").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "buy"),
         ("signup", "acquire"), ("error", "ops")],
        "event_type string, family string",
    )
    with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        # even without broadcast, DPP must fire via the exchange-reuse
        # path (spark.sql.optimizer.dynamicPartitionPruning defaults on)
        df = (
            fact.join(dim.filter(F.col("family") == "browse"), "event_type")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = plan_of(df)
    assert "dynamicpruningexpression" in plan.lower(), plan
    got = {r["event_type"]: r["n"] for r in df.collect()}
    assert set(got) == {"view", "click"}


def test_runtime_bloom_filter_prunes_fact_side(spark, queries):
    """Runtime row-group pruning for non-partitioned join keys: a
    selective filter on the dimension side must inject a bloom-filter
    semi-prune (`might_contain`) into the fact scan, so fact rows that
    cannot join are dropped at the scan instead of surviving to the
    shuffle.  The engine gates this on a 10GB application-side scan —
    automatic at cluster scale; the threshold is lowered here only
    because the fixture is small."""
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.io.loaders import load_table

    with conf(
        spark,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    ), conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_totalprice") > 50000
        )
        li = load_table(spark, SF, "lineitem")
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "might_contain" in plan_of(j)


def test_exact_k_sample_never_global_sorts(spark, queries):
    """The md5-ordered exact-K sample must fold into
    TakeOrderedAndProject (per-partition top-K + driver merge) — a
    global Sort node before the limit would materialize a full-table
    sort at 100 TB."""
    plan = plan_of(queries["q_sample_exact_k"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    tree = plan.split("\n\n")[0]
    assert "Sort" not in tree.replace("TakeOrderedAndProject", "")


def test_containment_explodes_documents_once(spark, queries):
    """The directed containment query reuses the jaccard pipeline and
    must inherit its single-scan property: one documents scan+explode,
    sizes and both pair directions re-deriving from the same exchange."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_dedup_containment"](spark, SF))
    assert tree.count("Scan parquet") == 1
    assert tree.count("ReusedExchange") >= 2


def test_collocations_stages_after_counts_are_vocab_sized(spark, queries):
    """PMI collocations: the corpus total must enter as a broadcast
    one-row aggregate (BroadcastNestedLoopJoin over a 1-row sum), and
    the documents table must be scanned at most twice (bigram pass +
    unigram pass) — never once per downstream join."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        plan = plan_of(queries["q_text_collocations"](spark, SF))
        tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") <= 2
    assert "BroadcastNestedLoopJoin" in tree  # the 1-row total
    assert "TakeOrderedAndProject" in tree  # deterministic top-k


def test_runtime_filter_semi_prunes_before_fact_exchange(spark, queries):
    """q_join_runtime_filter's hand-rolled runtime filter: the coarse
    bucket set must be probed via a hinted BroadcastHashJoin LeftSemi
    that sits BELOW the fact side's Exchange — rows are dropped
    map-side, before they are shuffled for the main join.  Broadcast
    threshold is disabled so the main join is a real shuffle join and
    only the explicit broadcast hint survives (the 100 TB shape)."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"), conf(
        spark, "spark.sql.autoBroadcastJoinThreshold", "-1"
    ):
        tree = tree_of(queries["q_join_runtime_filter"](spark, SF))
    lines = tree.split("\n")
    i_main = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
    i_semi = next(i for i, l in enumerate(lines) if "LeftSemi" in l)
    assert i_main < i_semi, tree  # semi is inside the join's subtree
    # the semi's parent chain crosses an Exchange: prune-then-shuffle
    assert any(
        "Exchange" in l for l in lines[i_main:i_semi]
    ), tree
    assert "CartesianProduct" not in tree


def test_cdc_apply_compiles_to_window_group_limit(spark, queries):
    """Latest-wins CDC compaction must push the rn=1 cut into
    WindowGroupLimit: each input partition forwards one candidate per
    entity to the shuffle instead of the full changelog."""
    plan = plan_of(queries["q_events_cdc_apply"](spark, SF))
    assert "WindowGroupLimit" in plan


def test_incremental_rollup_is_joinless_two_scan_merge(spark, queries):
    """State-merge rollup: two pushed-filter scans (state | delta),
    partial aggregates per side, one union, one final merge aggregate —
    no join anywhere, and both split predicates reach the parquet
    scans so each side reads only its half."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        plan = plan_of(queries["q_agg_incremental_rollup"](spark, SF))
        tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2
    assert "Union" in tree
    assert "Join" not in tree
    assert plan.count("GreaterThanOrEqual(l_shipdate") == 1
    assert plan.count("LessThan(l_shipdate") == 1


def test_heavy_hitters_total_is_broadcast_one_row(spark, queries):
    """The grand total must enter as a broadcast 1-row aggregate
    (BroadcastNestedLoopJoin), never a collected scalar, and the
    events table is scanned exactly twice (total + per-key counts)."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_agg_heavy_hitters"](spark, SF))
    assert tree.count("Scan parquet") == 2
    assert "BroadcastNestedLoopJoin" in tree


def test_triangle_closure_is_equi_join(spark, queries):
    """Degree-oriented triangle counting: the wedge and closure joins
    must be hash/sort-merge EQUI joins (wedges explicitly bounded by
    orientation) — a CartesianProduct anywhere means the theta form
    snuck in.  The one-row summary combines via broadcast loops, which
    is fine (1×1 rows)."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_graph_triangle_count"](spark, SF))
    assert "CartesianProduct" not in tree
    assert ("SortMergeJoin" in tree) or ("ShuffledHashJoin" in tree) or (
        "BroadcastHashJoin" in tree
    )


def test_weighted_sample_folds_topk(spark, queries):
    """A-ES weighted sampling must plan as TakeOrderedAndProject —
    per-partition K-heaps, no global sort of the corpus."""
    plan = plan_of(queries["q_sample_weighted"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    tree = plan.split("\n\n")[0]
    assert "Sort" not in tree.replace("TakeOrderedAndProject", "")


def test_interval_banded_join_is_equi_not_nested_loop(spark, queries):
    """The point-in-interval join must go through the manufactured band
    equi-key (hash/sort-merge join with containment as post-filter) —
    a BroadcastNestedLoopJoin or CartesianProduct means the theta form
    snuck back in, which is points × intervals at 100 TB."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_join_interval_banded"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree
    assert ("SortMergeJoin" in tree) or ("ShuffledHashJoin" in tree) or (
        "BroadcastHashJoin" in tree
    )


def test_resample_interp_shares_one_window_exchange(spark, queries):
    """The bidirectional (preceding + following) ignore-nulls passes
    must share the user_id window partitioning: exactly one Exchange
    feeds the Window nodes after the grid join — a second shuffle of
    the grid would double the job's largest stage for no reason."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_events_resample_interp"](spark, SF))
    lines = tree.split("\n")
    i_first_window = next(i for i, l in enumerate(lines) if "Window" in l)
    # no Exchange between the two Window passes (they appear as
    # consecutive Window nodes over one sort order)
    i_join = next(i for i, l in enumerate(lines) if "Join" in l)
    assert not any(
        "Exchange" in l for l in lines[i_first_window:i_join]
    ), tree


def test_weighted_stratified_uses_window_group_limit(spark, queries):
    """Per-stratum A-ES sampling must push the rn<=K cut into
    WindowGroupLimit so hot strata cost O(K) per partition."""
    plan = plan_of(queries["q_sample_weighted_stratified"](spark, SF))
    assert "WindowGroupLimit" in plan


def test_bfs_source_is_broadcast_not_collected(spark, queries):
    """BFS seeds from min(u) as a broadcast one-row aggregate inside
    the plan — constructing the query must not launch driver jobs
    beyond the per-hop materializations, and the final distance map is
    a plain scan (lineage already cut)."""
    df = queries["q_graph_bfs_distance"](spark, SF)
    tree = tree_of(df)
    # after per-hop materialization the result is a single parquet scan
    assert tree.count("Scan parquet") == 1


def test_partitioned_roundtrip_prunes_partitions(spark, queries):
    """The partitioned roundtrip's event_type filter must prune at the
    directory level (PartitionFilters), not row-filter a full scan."""
    plan = plan_of(queries["q_source_partitioned_roundtrip"](spark, SF))
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan


def test_no_unbounded_driver_collect_in_package(spark):
    """Repo-wide scale contract: no operator materializes data on the
    driver.  `.collect()` / `.toPandas()` may appear ONLY at audited
    BOUNDED sites: harvest/bucketed.py's two calls gather the DISTINCT
    BUCKET ID list (bounded by n_buckets, a config constant — the
    moral equivalent of a partition listing); ann_index.py's FIVE are
    all centroid-cardinality lists: the probed centroid ids (nprobe
    ints), the two-level search's child-cell ids (≤ probed splits ×
    n_sub), the r14 cell re-fit's quantile seeds + fitted
    sub-centroids (≤ n_sub rows each — the re-fit's O(cell) work all
    stays distributed; only the O(1) sub-centroid STATE lands on the
    driver, exactly like the codebooks), and the r15 auto-maintain
    trigger's split-lineage rows (≤ n_centroids children — the same
    centroids table every search already broadcasts); cli.py's three
    are
    user-display/report paths (the ann search output is
    limit(PQ_TOPK)-bounded, the pipeline verb limits to --rows, the
    changes report is one count per (version, change type));
    webgraph.py's ONE (r17) is crawl_stream_loop's scheduler tick
    reading max(round) from the frontier table — a one-row aggregate
    scalar, the moral equivalent of reading a stream's watermark.
    Nowhere else."""
    import pathlib

    pkg = pathlib.Path("setup_harvest_action_spark")
    offenders = []
    for f in pkg.rglob("*.py"):
        text = f.read_text()
        for i, line in enumerate(text.splitlines(), 1):
            code = line.split("#", 1)[0]
            if ".collect()" in code or ".toPandas()" in code:
                offenders.append(f"{f}:{i}")
    allowed = {
        o
        for o in offenders
        if "harvest/bucketed.py" in o
        or "cli.py" in o
        or "functions/ann_index.py" in o
        or "functions/webgraph.py" in o
    }
    by_file = {
        "bucketed": sum("harvest/bucketed.py" in o for o in offenders),
        "cli": sum("cli.py" in o for o in offenders),
        "ann_index": sum("functions/ann_index.py" in o for o in offenders),
        "webgraph": sum("functions/webgraph.py" in o for o in offenders),
    }
    assert set(offenders) == allowed, offenders
    assert by_file == {
        "bucketed": 2, "cli": 3, "ann_index": 5, "webgraph": 1,
    }, offenders


def test_q5_shape_broadcasts_dim_chain(spark, queries):
    """q_local_supplier_volume: with auto-broadcast off, only the true
    dimensions (region, nation) may be broadcast via AQE/hints — the
    fact⋈fact joins must stay shuffle joins, and both orders-date
    filters must reach the orders scan."""
    plan = plan_of(queries["q_local_supplier_volume"](spark, SF))
    assert plan.count("GreaterThanOrEqual(o_orderdate") == 1
    assert plan.count("LessThan(o_orderdate") == 1
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree


def test_fuzzy_match_never_broadcasts_corpus(spark, queries):
    """fuzzy_match_pairs joins two DOCUMENTS-derived sides on the block
    key: with auto-broadcast off, NOTHING may broadcast — every input
    to this plan is corpus-scale, so any BroadcastExchange here is the
    r6 force-broadcast regression (functions/dedup.py fuzzy block join)
    that would OOM at 100 TB.  The block join must be a shuffle
    equi-join on `tok`."""
    with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        df = queries["q_dedup_fuzzy_edit"](spark, SF)
        tree = tree_of(df)
    assert "BroadcastExchange" not in tree, tree
    assert "BroadcastHashJoin" not in tree, tree
    assert "CartesianProduct" not in tree
    assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree, tree
    # and the banded-levenshtein VERIFY must run above the candidate
    # re-spread, not inside the join condition (the single-task
    # collapse): the nondeterministic barrier keeps it out of the join.
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    join_lines = [ln for ln in opt.splitlines() if "Join Inner" in ln]
    assert join_lines and all(
        "levenshtein" not in ln for ln in join_lines
    ), opt


def test_pairs_threshold_scoring_never_forces_corpus_broadcast(
    spark, queries
):
    """The pairs-threshold SCORING joins (candidates ⋈ vectors ×2) ride
    the vector table — corpus-derived, so they carry no broadcast hint;
    with auto-broadcast off they must compile to shuffle equi-joins.
    The only broadcasts left are the tiny hyperplane cross-joins inside
    lsh_codes (BroadcastNestedLoopJoin, pinned ≤2 by the bucket test)."""
    with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        tree = tree_of(queries["q_similarity_pairs_threshold"](spark, SF))
    assert "BroadcastHashJoin" not in tree, tree


def test_time_decay_horizon_compiles_to_window_group_limit(spark, queries):
    """The EWMA_LAST_N horizon cut is a literal rank bound, so Spark
    must compile it to WindowGroupLimit (partial per-partition top-N
    before the shuffle) — the property that bounds per-user cost on a
    hot user at 100 TB."""
    plan = plan_of(queries["q_events_time_decay_score"](spark, SF))
    assert "WindowGroupLimit" in plan


def test_overlap_join_is_equi_with_ownership(spark, queries):
    """Interval×interval overlap must join on the manufactured band
    key (hash/sort-merge equi-join) with band-ownership as a filter —
    no nested-loop node, and no Deduplicate/Distinct operator (the
    ownership test replaces it)."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_join_overlap_intervals"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree
    # no dedup aggregate downstream of the join — ownership dedupes
    after_join = tree.split("Join", 1)[0]
    assert "HashAggregate" not in after_join, tree


def test_ranked_ntile_family_never_sorts_the_relation_globally(
    spark, queries
):
    """The exact-quantile family (RFM quintiles, Pareto deciles,
    equi-depth histogram) must assign tiles via ranked_ntile's
    range-partitioned rank — no `ntile` window at all, and the only
    single-partition exchanges feed from HashAggregate outputs (the
    ≤RANGE_BUCKETS-row extent/offset tables), never from the base
    relation."""
    for name in (
        "q_events_rfm",
        "q_window_pareto_concentration",
        "q_agg_equidepth_histogram",
    ):
        tree = tree_of(queries[name](spark, SF))
        assert "ntile(" not in tree, (name, tree)
        lines = tree.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            below = "\n".join(lines[i + 1 : i + 4])
            assert "HashAggregate" in below, (name, tree)


def test_winnowing_selects_before_explode_and_scans_once(spark, queries):
    """The winnowing fingerprint index must apply the 1/8 md5
    selection INSIDE the per-document array transform (filter before
    explode — the whole point of the sampled index) and scan
    documents exactly once; pair expansion stays in-list (no doc x doc
    join of any kind)."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        plan = plan_of(queries["q_dedup_winnowing"](spark, SF))
        tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    # the lambda filter on the md5 prefix sits in the project that
    # FEEDS Generate (explode), not in a Filter above it
    gen_zone = plan.split("Generate")[0]
    assert "filter(transform" in plan.replace("\n", "")
    assert "SortMergeJoin" not in tree and "BroadcastHashJoin" not in tree


def test_late_supplier_blame_decorrelates_to_semi_and_anti(spark, queries):
    """The Q21 shape must decorrelate: EXISTS -> LeftSemi, NOT EXISTS
    -> LeftAnti (hash joins, never a nested-loop correlated re-scan),
    with ORDER BY+LIMIT folded into TakeOrderedAndProject."""
    df = queries["q_late_supplier_blame"](spark, SF)
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "TakeOrderedAndProject" in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree


def test_interval_coverage_shares_one_user_exchange(spark, queries):
    """The interval-union coverage query must do its windows, island
    aggregate, and user aggregate all on ONE user_id exchange — a
    second shuffle would mean the island/user aggregates lost the
    window's partitioning."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_events_interval_coverage"](spark, SF))
    assert tree.count("Exchange") == 1, tree
    assert tree.count("Window") == 2
    assert tree.count("Scan parquet") == 1


def test_bootstrap_is_one_scan_with_partial_aggregation(spark, queries):
    """The Poisson bootstrap must be ONE events scan with the
    B-replicate fan-out map-side and partial aggregation before the
    shuffle — the exchange carries at most B rows per task, never the
    exploded corpus."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_sample_bootstrap"](spark, SF))
    assert tree.count("Scan parquet") == 1
    assert tree.count("Exchange") == 1
    # partial + final hash aggregates around that one exchange
    assert tree.count("HashAggregate") == 2
    assert "SortMergeJoin" not in tree and "BroadcastHashJoin" not in tree


def test_zipf_fit_windows_only_the_vocabulary(spark, queries):
    """The Zipf regression's rank window must sit ABOVE the token
    aggregate (vocabulary-sized input, the q_text_topk_tokens
    economics) — one corpus scan, token aggregate, then the window and
    the final one-row regression."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_text_zipf_fit"](spark, SF))
    assert tree.count("Scan parquet") == 1
    assert tree.count("Window") == 1
    # the Window consumes the aggregated vocabulary, not raw tokens:
    # operator order in the tree is regression-agg < window < token-agg
    w = tree.index("Window")
    assert tree.index("Generate") > w  # explode below the window


def test_min_cost_supplier_is_one_pass_argmin_no_self_join(spark, queries):
    """The Q2 shape must decorrelate to min_by in ONE fact aggregate —
    exactly one lineitem scan, and never the textbook fact-self-join
    that recovers the argmin row by price equality."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        plan = plan_of(queries["q_min_cost_supplier"](spark, SF))
        tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 3  # lineitem + part + supplier
    assert "min_by" in plan


def test_lm_bigram_reads_corpus_once_via_lineage_cut(spark, queries):
    """The bigram LM materializes the exploded-bigram aggregate once;
    every model marginal must re-read that bounded parquet — the final
    plan may not reference the documents table at all (measured: the
    un-cut form re-scanned the corpus 4x because ReuseExchange only
    deduplicated one marginal branch)."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        plan = plan_of(queries["q_text_lm_bigram_score"](spark, SF))
    assert "documents.parquet" not in plan
    assert "lm_bigram_counts" in plan


def test_asof_topk_has_no_cartesian_and_bounded_window_state(spark, queries):
    """The K-nearest as-of must stay a pair of keyed shuffles + an
    equi-join: no cartesian/broadcast-nested-loop, no collect_list
    history window (the max(rank) carry is the O(1)-state spelling),
    and the K fan-out happens on the purchase side only."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        plan = plan_of(queries["q_join_asof_topk"](spark, SF))
        tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "collect_list" not in plan
    assert "HashJoin" in tree or "SortMergeJoin" in tree  # equi, any impl
    # and in the shuffle regime (no broadcast possible) it must stay a
    # keyed equi-join, never degrade to a nested loop
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
            tree2 = tree_of(queries["q_join_asof_topk"](spark, SF))
    assert "SortMergeJoin" in tree2 or "ShuffledHashJoin" in tree2
    assert "NestedLoop" not in tree2 and "CartesianProduct" not in tree2


def test_sequence_gaps_is_one_window_one_scan(spark, queries):
    """Gap detection must be a single lag window over one orders scan —
    and in particular NOT the generate-missing-keys anti-join."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        tree = tree_of(queries["q_window_sequence_gaps"](spark, SF))
    assert tree.count("Scan parquet") == 1
    assert tree.count("Window") == 1
    assert "Join" not in tree


def test_small_quantity_revenue_decorrelates_and_pushes_brand(spark, queries):
    """The Q17 shape must run DECORRELATED — the per-part average is a
    partial/final aggregate equi-joined back on l_partkey, never a
    correlated per-row re-scan — with the brand prefix pushed into the
    part scan and the fact scans column-pruned."""
    plan = plan_of(queries["q_small_quantity_revenue"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert "StringStartsWith(p_brand,Brand#1)" in plan
    assert "partial_avg(l_quantity" in plan
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    # fact scans read only the join/filter/measure columns
    assert "l_shipdate" not in plan
    assert "l_returnflag" not in plan
    # revenue accumulates in decimal (order-independent at any scale)
    assert "decimal(18,6)" in plan


def test_boilerplate_builds_hashed_df_index_and_reassembles_once(spark, queries):
    """Boilerplate removal must (1) key its corpus-frequency index on
    the md5 SEGMENT HASH — distinct-doc counts, not occurrence counts —
    (2) probe it with an equi-join on that key (no nested loop at any
    scale), and (3) reassemble documents in ONE doc_id aggregate pair
    using the skip-null collect, never a second corpus join."""
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        plan = plan_of(queries["q_quality_boilerplate_segments"](spark, SF))
        tree = plan.split("\n\n")[0]
    # r18: the corpus-spread repartition (io/parallelism.py) is now a
    # shared subtree of BOTH passes, so ReuseExchange serves the probe
    # pass from the index pass's scan — ONE parquet scan total where
    # the pre-spread plan needed two.
    assert tree.count("Scan parquet") == 1
    assert "ReusedExchange" in tree
    assert tree.count("Generate") == 2  # one explode per pass
    assert "count(distinct doc_id" in plan
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    # single partial/final reassembly aggregate keyed on doc_id
    assert tree.count("ObjectHashAggregate") == 2


def test_manifest_merge_upsert_plan_is_one_anti_join(
    spark, tmp_path, monkeypatch
):
    """merge_into's upsert fast path must plan as ONE left-anti hash
    join (target minus source keys) unioned with the source — never a
    broadcast-nested-loop or cartesian, and never a semi/anti pair
    that scans the candidates twice.  Captured at the staging boundary
    so the pinned plan is exactly what the rewrite executes."""
    import setup_harvest_action_spark.sources.manifest_sink as ms

    ms.register_manifest_sink(spark)
    path = str(tmp_path / "t")
    spark.range(0, 1000).selectExpr("id", "id * 2 AS val").repartitionByRange(
        4, "id"
    ).write.format("manifest_parquet").mode("overwrite").save(path)
    src = spark.range(500, 1200).selectExpr("id", "id * -1 AS val")

    captured = {}
    orig = ms._stage_parts

    def capture(df, p, **kw):
        captured["plan"] = plan_of(df)
        captured["tree"] = tree_of(df)
        return orig(df, p, **kw)

    monkeypatch.setattr(ms, "_stage_parts", capture)
    with conf(spark, "spark.sql.adaptive.enabled", "false"):
        ms.merge_into(spark, path, src, on=["id"])
    plan = captured["plan"]
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the fast path: exactly one join in the rewrite plan
    assert captured["tree"].count("Join") == 1


def test_q6_shape_pushes_all_predicates_and_prunes_columns(spark, queries):
    # TPC-H Q6 is the canonical "is pushdown working" probe: all three
    # predicates must reach the parquet scan and only the four
    # referenced columns may survive pruning.
    plan = plan_of(queries["q_discount_revenue_delta"](spark, SF))
    assert "GreaterThanOrEqual(l_shipdate,1997-01-01" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    assert "l_orderkey" not in plan  # pruned
    assert "l_returnflag" not in plan  # pruned


def test_returned_items_topk_is_take_ordered_not_global_sort(
    spark, queries
):
    # TPC-H Q10's top-20 must compile to TakeOrderedAndProject
    # (per-partition heaps, O(k) driver merge) — a global Sort+Limit
    # materializes the whole customer aggregate at one task.
    plan = plan_of(queries["q_returned_items_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_promotable_suppliers_is_semi_join_chain(spark, queries):
    # TPC-H Q20's supplier qualification must stay a LEFT-SEMI join —
    # an inner join multiplies supplier rows by qualifying parts and
    # needs a distinct; a nested-loop means the equi-key was lost.
    plan = plan_of(queries["q_promotable_suppliers"](spark, SF))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_customer_distribution_filter_lives_in_join_not_where(
    spark, queries
):
    # TPC-H Q13: the priority exclusion must act as the outer join's
    # condition (zero-order customers survive with count 0), and the
    # join must remain LeftOuter — a WHERE after the join would
    # silently turn it inner and drop the zero bucket.
    df = queries["q_customer_order_distribution"](spark, SF)
    plan = plan_of(df)
    assert "LeftOuter" in plan
    # outer-join semantics: every customer lands in exactly one bucket
    # (an accidental inner join would drop customers whose orders were
    # all excluded — at this fixture none are, so pin the invariant
    # that generalizes: bucket counts sum to |customer|).
    total = sum(r["custdist"] for r in df.collect())
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert total == n_cust


def test_point_in_time_join_is_equi_with_interval_residual(
    spark, queries
):
    # The SCD2 point-in-time join must key on the business key with
    # the validity interval as a residual — an interval-only join
    # plan (BNLJ/cartesian) blows up as |orders| × |history|.
    plan = plan_of(queries["q_scd2_point_in_time"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_is_shuffle_free(spark, queries):
    """Co-located bucketed tables must join WITHOUT exchanging either
    fact side: no hashpartitioning exchange on the join keys anywhere
    in the plan, bucketed scans on both sides, and a sort-merge join
    (broadcast disabled so the layout, not the optimizer, earns it).
    The only exchange allowed is the final tiny status rollup."""
    with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"), conf(
        spark, "spark.sql.adaptive.enabled", "false"
    ):
        df = queries["q_join_bucketed_colocated"](spark, SF)
        plan = plan_of(df)
        tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" in tree
    assert "hashpartitioning(l_orderkey" not in plan
    assert "hashpartitioning(o_orderkey" not in plan
    assert plan.count("Bucketed: true") == 2
    # exactly the aggregation exchange survives
    assert tree.count("Exchange") == 1


def test_stored_pq_search_has_no_corpus_broadcast_or_refit(spark, queries):
    """The stored-index PQ query's plan: the candidate stage is a scan
    of the stored codes table plus ONE-ROW broadcast attaches (codebook
    maps, probe) — no corpus-sized broadcast, no kmeans re-fit
    subtree (the per-iteration (cluster, dim) mean aggregate would
    show as posexplode), and the final stage is TakeOrderedAndProject,
    never a global sort."""
    df = queries["q_similarity_pq_adc_stored"](spark, SF)
    tree = tree_of(df)
    assert "TakeOrderedAndProject" in tree
    assert "Generate posexplode" not in tree  # no Lloyd refit in-plan
    plan = plan_of(df)
    # every broadcast side is a one-row aggregate (codebooks/probe/cand)
    assert "embeddings.parquet" in plan  # re-rank reads raw vectors...
    assert tree.count("Scan parquet") >= 2  # ...beside the stored codes


def test_stored_lsh_search_prunes_query_code_read(spark, queries):
    """The stored-LSH query's query-code side is a stats-pruned point
    read of the bucket table (the where-triple filter re-applies as a
    row filter), and candidates come from a bucket equi-join — no
    cartesian, no corpus broadcast beside the tiny query side."""
    df = queries["q_similarity_ann_lsh_stored"](spark, SF)
    tree = tree_of(df)
    assert "CartesianProduct" not in tree
    assert "WindowGroupLimit" in tree  # per-query top-k stays capped
    plan = plan_of(df)
    assert "vec_id" in plan


def test_stream_pq_index_search_matches_stored_plan(spark, queries):
    """The streaming-maintained index must be queried by the same scan
    plan as the batch-built one (the maintenance path must not change
    the read path)."""
    a = tree_of(queries["q_similarity_pq_adc_stored"](spark, SF))
    b = tree_of(queries["q_stream_similarity_pq_index"](spark, SF))

    def shape(t):
        return [
            line.split("(")[0].strip("+- :*")
            for line in t.splitlines()
            if line.strip()
        ]

    assert shape(a) == shape(b)


def test_decontaminate_broadcasts_benchmark_grams(spark, queries):
    """Both decontamination spellings broadcast the benchmark gram
    set (an eval suite — tiny at any corpus scale): the oracled
    catalog operator and the composable hashed-key helper the
    declarative pipeline uses.  The corpus side never shuffles for
    the probe; the per-doc count aggregates partial/final."""
    tree = tree_of(queries["q_quality_decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree

    import pyspark.sql.functions as F

    from setup_harvest_action_spark.functions.dedup import (
        contamination_flags,
    )
    from setup_harvest_action_spark.io.loaders import load_table

    docs = load_table(spark, SF, "documents")
    flags = contamination_flags(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20)
    )
    tree = tree_of(flags)
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree
    assert "HashAggregate" in tree


def test_frontier_robots_dimension_is_broadcast(spark, queries):
    """r16: the host-keyed robots dimension must reach the URL table
    as a BroadcastHashJoin (hosts × ~1 KiB vs a corpus-scale URL
    column — shuffling the URL side on host for 7 rows would be the
    100 TB anti-shape), and the politeness cap must stay a
    WindowGroupLimit."""
    plan = plan_of(queries["q_pipeline_crawl_frontier"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree  # robots dim on host
    assert "WindowGroupLimit" in plan  # per-host politeness cap
    assert "CartesianProduct" not in tree


def test_codegen_robots_admission_stays_jvm_side(spark):
    """r16: robots_admission_expr must compile to a plain Filter
    inside WholeStageCodegen — no Python stage in the admission path
    (the dimension-join form pays one broadcast join; this form pays
    nothing but the rlike chain)."""
    import pyspark.sql.functions as F

    from setup_harvest_action_spark.functions.webgraph import (
        robots_admission_expr,
    )

    urls = spark.createDataFrame(
        [("host0", "https://host0.example/doc/7")], "host string, url string"
    )
    df = urls.filter(
        robots_admission_expr(
            F.col("host"),
            F.regexp_extract("url", r"^https://[^/]+(/.*)$", 1),
        )
    )
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "* Filter" in tree  # '*' = inside WholeStageCodegen
    assert "codegen id" in plan
    assert "MapInPandas" not in tree
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree


def test_prioritized_frontier_amortizes_the_parse(spark, queries):
    """r16: q_pipeline_frontier_prioritized references the edge table
    three times (crawled set, candidates, PageRank iterations) — the
    materialization cut must leave ZERO parse stages in the final
    plan (re-parsing the corpus once per consumer is the 100 TB
    disaster the cut buys out), admission must stay codegen'd, and
    the priority cap must be a WindowGroupLimit."""
    plan = plan_of(queries["q_pipeline_frontier_prioritized"](spark, SF))
    tree = plan.split("\n\n")[0]
    assert "MapInPandas" not in tree  # parse amortized into the cut
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert "WindowGroupLimit" in plan  # priority cap pushes down
