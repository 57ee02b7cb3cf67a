"""Per-query perf probe for the optimization rounds (guide §1).

Runs each named query isolated against the noop sink (same
materialization as bench.py), records wall-clock per run, the number
of Spark JOBS the query launches (statusTracker over a per-query job
group — a direct proxy for materialize/broadcast/collect fixed costs
that plan-shape stats miss), and dumps ``explain("formatted")`` to
``plans/<plan-dir>/<query>_<label>.txt`` (default ``plans/r19``).

Usage:
    python tools/perf_probe.py [--label before|after] [--runs N]
        [--sf-dir DIR] [--no-plans] query [query ...]
    python tools/perf_probe.py --label before --all-headline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--label", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1")
    )
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--plan-dir", default="r19")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SKETCH_HASH", "xxhash64")
    import __spark_entry__ as ent
    from setup_harvest_action_spark.session import get_spark

    names = list(args.queries)
    if args.all_headline:
        import bench

        names = names or list(bench.HEADLINE)

    spark = get_spark("perf-probe")
    sc = spark.sparkContext
    queries = ent.queries()
    plan_dir = os.path.join(REPO, "plans", args.plan_dir)
    os.makedirs(plan_dir, exist_ok=True)

    # warmup
    spark.range(1000).selectExpr("sum(id)").collect()

    def run_once(name: str, group: str) -> float:
        sc.setJobGroup(group, name)
        sc.setJobDescription(name)
        t0 = time.time()
        (queries[name](spark, args.sf_dir)
         .write.format("noop").mode("overwrite").save())
        dt = time.time() - t0
        sc.setJobDescription(None)
        return dt

    out = {}
    # cold pass (plan compile + codegen, billed once, matches bench.py)
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not in catalog", file=sys.stderr)
            continue
        run_once(name, f"cold-{name}")

    for name in names:
        if name not in queries:
            continue
        times = []
        group = f"probe-{name}"
        for i in range(args.runs):
            times.append(round(run_once(name, group), 3))
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        med = sorted(times)[len(times) // 2]
        out[name] = {
            "median_sec": med,
            "runs": times,
            "jobs_per_run": round(n_jobs / args.runs, 1),
        }
        print(f"# {name}: median {med}s runs={times} "
              f"jobs/run={out[name]['jobs_per_run']}", file=sys.stderr)
        if not args.no_plans:
            import contextlib
            import io

            df = queries[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(plan_dir, f"{name}_{args.label}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())

    print(json.dumps({"label": args.label, "sf_dir": args.sf_dir,
                      "results": out}))


if __name__ == "__main__":
    main()
