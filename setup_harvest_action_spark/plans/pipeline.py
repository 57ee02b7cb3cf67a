"""Declarative pipeline specs: a JSON-able DAG of named datasets
compiled to ONE lazy DataFrame plan.

The reference is itself a config-driven pipeline (a GitHub action
whose inputs select collections and drive harvest → validate → load,
`harvest.py:1-60`); this module re-expresses that shape engine-side
the way Spark 4's Declarative Pipelines / dbt model graphs do
(public designs): a spec names datasets, each dataset is one
relational op over earlier datasets, and the executor topologically
resolves the graph into composed DataFrames.

The crucial property is that the executor NEVER materializes a step:
every op composes lazily, so Catalyst optimizes ACROSS spec
boundaries — a `filter` dataset downstream of a `table` dataset still
lands in the parquet scan as a pushed filter, column pruning sees the
whole graph, and a branch consumed twice is planned once under AQE
exchange reuse.  A step-at-a-time runner (materialize each dataset,
read it back) would silence the optimizer at every boundary and
multiply I/O by the step count at 100 TB; the plan-pin in
tests/test_pipeline_spec.py asserts the pushdown survives the spec
boundary.

Spec shape::

    {"datasets": {
        "docs":  {"op": "table",  "name": "documents"},
        "clean": {"op": "filter", "input": "docs",
                  "where": "n_chars >= 100"},
        "stats": {"op": "aggregate", "input": "clean",
                  "group_by": ["lang"],
                  "aggs": {"n_docs": "count(*)"}}},
     "output": "stats"}

Expressions are Spark SQL fragments (``F.expr``) — the same surface
``sql_api.py`` exposes, kept declarative so the spec stays data, not
code.  Unknown ops, missing datasets, and cycles fail loudly at
compile time, before any job runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from setup_harvest_action_spark.catalog import query
from setup_harvest_action_spark.io.loaders import load_table

PIPELINE_OPS = (
    "table",
    "parquet",
    "query",
    "filter",
    "select",
    "derive",
    "aggregate",
    "join",
    "union",
    "distinct",
    "order_limit",
    # corpus-hygiene stages (r11): the export-side operators as
    # declarable datasets — each delegates to its oracled catalog
    # implementation (functions/dedup.py, functions/quality.py)
    "decontaminate",
    "redact_pii",
    "scrub_substrings",
)


def _inputs(node: dict) -> list[str]:
    if "input" in node:
        return [node["input"]]
    if "inputs" in node:
        return list(node["inputs"])
    return []


def _compile(name: str, node: dict, resolved: dict[str, DataFrame],
             spark: SparkSession, sf_dir: str | None) -> DataFrame:
    op = node.get("op")
    ins = [resolved[i] for i in _inputs(node)]
    if op == "table":
        if sf_dir is None:
            raise ValueError(f"dataset {name!r}: 'table' needs sf_dir")
        return load_table(spark, sf_dir, node["name"])
    if op == "parquet":
        return spark.read.parquet(node["path"])
    if op == "query":
        # compose over the whole operator catalog: any registered
        # q_* query becomes a pipeline dataset (still lazy — catalog
        # queries return undisturbed DataFrames)
        from setup_harvest_action_spark.catalog import load_catalog

        queries, _ = load_catalog()
        if node["name"] not in queries:
            raise ValueError(
                f"dataset {name!r}: no catalog query {node['name']!r}"
            )
        if sf_dir is None:
            raise ValueError(f"dataset {name!r}: 'query' needs sf_dir")
        return queries[node["name"]](spark, sf_dir)
    if op == "filter":
        return ins[0].filter(F.expr(node["where"]))
    if op == "select":
        return ins[0].select(
            *[F.expr(e).alias(a) for a, e in node["columns"].items()]
        )
    if op == "derive":
        out = ins[0]
        for a, e in node["columns"].items():
            out = out.withColumn(a, F.expr(e))
        return out
    if op == "aggregate":
        aggs = [F.expr(e).alias(a) for a, e in node["aggs"].items()]
        keys = node.get("group_by", [])
        return ins[0].groupBy(*keys).agg(*aggs) if keys else ins[0].agg(*aggs)
    if op == "join":
        how = node.get("how", "inner")
        return ins[0].join(ins[1], on=node["on"], how=how)
    if op == "union":
        out = ins[0]
        for nxt in ins[1:]:
            out = out.unionByName(nxt)
        return out
    if op == "distinct":
        return ins[0].distinct()
    if op == "decontaminate":
        # inputs: [corpus, benchmark]; mode "drop" (default) anti-joins
        # the flagged docs away, "flags" returns (doc_id, shared_grams)
        from setup_harvest_action_spark.functions.dedup import (
            DECON_K,
            contamination_flags,
        )

        flags = contamination_flags(
            ins[0], ins[1], k=node.get("k", DECON_K)
        )
        if node.get("mode", "drop") == "flags":
            return flags
        return ins[0].join(flags, "doc_id", "left_anti")
    if op == "redact_pii":
        from setup_harvest_action_spark.functions.quality import redact_pii

        out = redact_pii(ins[0], keep_text=True)
        if node.get("counts_only"):
            return out.drop("clean_text")
        return out.select("doc_id", F.col("clean_text").alias("text"))
    if op == "scrub_substrings":
        from setup_harvest_action_spark.functions.dedup import (
            SPAN_LEN,
            remove_shared_substrings,
        )

        return remove_shared_substrings(
            ins[0], span_len=node.get("span_len", SPAN_LEN)
        ).select("doc_id", F.col("clean").alias("text"))
    if op == "order_limit":
        def _key(e: str):
            # trailing "desc"/"asc" is direction, not expression —
            # F.expr would PARSE "k desc" without error and silently
            # order ascending, so strip it here
            head, _, tail = e.rpartition(" ")
            if tail.lower() == "desc" and head:
                return F.expr(head).desc()
            if tail.lower() == "asc" and head:
                return F.expr(head).asc()
            return F.expr(e)

        out = ins[0].orderBy(*[_key(e) for e in node["order_by"]])
        return out.limit(node["limit"]) if "limit" in node else out
    raise ValueError(
        f"dataset {name!r}: unknown op {op!r} (known: {PIPELINE_OPS})"
    )


def run_pipeline(
    spark: SparkSession, spec: dict, sf_dir: str | None = None
) -> DataFrame:
    """Compile ``spec`` and return the (lazy) output DataFrame.

    Resolution is an explicit-stack DFS with cycle detection; every
    dataset compiles exactly once and is shared by reference, so a
    branch consumed twice appears once in the logical plan."""
    datasets: dict[str, dict] = spec["datasets"]
    out_name = spec["output"]
    resolved: dict[str, DataFrame] = {}
    visiting: set[str] = set()

    def resolve(n: str) -> DataFrame:
        if n in resolved:
            return resolved[n]
        if n in visiting:
            raise ValueError(f"pipeline cycle through dataset {n!r}")
        if n not in datasets:
            raise ValueError(f"dataset {n!r} is not defined in the spec")
        visiting.add(n)
        for dep in _inputs(datasets[n]):
            resolve(dep)
        visiting.discard(n)
        resolved[n] = _compile(n, datasets[n], resolved, spark, sf_dir)
        return resolved[n]

    return resolve(out_name)


# A representative spec: two branches off one documents scan (per-
# (lang, source) stats and per-lang totals) re-joined to compute each
# source's share of its language — the diamond every model graph has.
DEMO_SPEC: dict = {
    "datasets": {
        "docs": {"op": "table", "name": "documents"},
        "tokens": {
            "op": "derive",
            "input": "docs",
            "columns": {
                "n_tokens": "size(filter(split(text, ' '), t -> t != ''))"
            },
        },
        "long_docs": {
            "op": "filter",
            "input": "tokens",
            "where": "n_chars >= 120",
        },
        "by_source": {
            "op": "aggregate",
            "input": "long_docs",
            "group_by": ["lang", "source"],
            "aggs": {
                "n_docs": "count(*)",
                "avg_tokens": "round(avg(n_tokens), 4)",
            },
        },
        "by_lang": {
            "op": "aggregate",
            "input": "long_docs",
            "group_by": ["lang"],
            "aggs": {"lang_docs": "count(*)"},
        },
        "shares": {
            "op": "join",
            "inputs": ["by_source", "by_lang"],
            "on": ["lang"],
        },
        "report": {
            "op": "select",
            "input": "shares",
            "columns": {
                "lang": "lang",
                "source": "source",
                "n_docs": "n_docs",
                "avg_tokens": "avg_tokens",
                "source_share": "round(n_docs / lang_docs, 6)",
            },
        },
    },
    "output": "report",
}


@query(
    "q_pipeline_spec_run",
    oracle="""
WITH long_docs AS (
    SELECT lang, source,
           len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS n_tokens
    FROM documents WHERE n_chars >= 120
),
by_source AS (
    SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(round(avg(n_tokens), 4) AS DOUBLE) AS avg_tokens
    FROM long_docs GROUP BY lang, source
),
by_lang AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS lang_docs
    FROM long_docs GROUP BY lang
)
SELECT s.lang, s.source, s.n_docs, s.avg_tokens,
       CAST(round(s.n_docs * 1.0 / l.lang_docs, 6) AS DOUBLE)
           AS source_share
FROM by_source s JOIN by_lang l ON s.lang = l.lang
""",
)
def q_pipeline_spec_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEMO_SPEC diamond executed through the declarative
    pipeline compiler — the engine-side analogue of the reference's
    config-driven action.  The whole spec compiles to one lazy plan:
    the n_chars filter is pushed into the single documents scan
    (plan-pinned), both aggregate branches hang off it, and the share
    join closes the diamond.  The oracle restates the graph as plain
    CTEs."""
    return run_pipeline(spark, DEMO_SPEC, sf_dir)
