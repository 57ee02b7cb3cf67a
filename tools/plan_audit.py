"""Machine-readable physical-plan audit of the bench headline.

For every headline query this prints one JSON line of plan-shape
facts — parquet scans, exchanges, broadcast exchanges, joins by type,
window nodes (and whether any window/sort runs UNPARTITIONED over a
non-aggregated input, the single-task scale-killer class VERDICT r7
flagged), whole-stage-codegen span count — plus a `suspects` list
naming anything that pattern-matches a known scale hazard.

tests/test_plans.py pins these properties query by query; this tool
is the fleet view: run it per round, diff the JSON, and a silently
degraded plan (a new broadcast of a corpus-scale side, a lost
pushdown, a window collapsing to one partition) shows up as a field
change even before it costs wall-clock.

Usage:  python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import contextlib
import json
import re
import sys

sys.path.insert(0, "/root/repo")


def audit_plan(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]

    facts = {
        "scans": tree.count("Scan parquet"),
        "exchanges": len(re.findall(r"\bExchange\b", tree)),
        "reused_exchanges": tree.count("ReusedExchange"),
        "broadcast_exchanges": tree.count("BroadcastExchange"),
        "joins": {
            k: tree.count(k)
            for k in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if tree.count(k)
        },
        "windows": tree.count("Window"),
        # formatted explain marks codegen'd operators with a leading
        # '*' and per-span "codegen id : N" in the detail section
        "wholestage_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "codegen_operators": len(re.findall(r"^\s*[:+]?-? ?\* ", tree, re.M)),
        "take_ordered": "TakeOrderedAndProject" in tree,
        "window_group_limit": "WindowGroupLimit" in tree,
    }
    suspects = []
    if "CartesianProduct" in tree:
        suspects.append("cartesian_product")
    if "BroadcastNestedLoopJoin" in tree:
        # only suspicious when the build side is not a 1-row aggregate;
        # flag for human review rather than asserting
        suspects.append("broadcast_nested_loop_review")
    # unpartitioned window/global sort over a non-aggregated input:
    # 'Exchange SinglePartition' feeding Sort+Window is the exact-ntile
    # hazard class (ranked_ntile exists to avoid it)
    if re.search(r"Exchange SinglePartition[\s\S]{0,400}?Window", plan) and (
        "HashAggregate" not in plan.split("Exchange SinglePartition")[0]
    ):
        suspects.append("single_partition_window_review")
    facts["suspects"] = suspects
    return facts


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.001"
    only = [a for a in argv if "/" not in a]

    import bench
    from setup_harvest_action_spark.catalog import load_catalog
    from setup_harvest_action_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # audit the COST-BASED plan the bench runs, but with AQE off so the
    # printed plan is the static one (AQE rewrites print as adaptive
    # placeholders); broadcast decisions still reflect size estimates.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    queries, _ = load_catalog()
    names = only or [n for n in bench.HEADLINE if n in queries]
    for name in names:
        try:
            facts = audit_plan(queries[name](spark, sf_dir))
        except Exception as exc:  # keep auditing
            facts = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        print(json.dumps({"query": name, **facts}, sort_keys=True), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
