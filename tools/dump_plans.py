"""Dump ``explain("formatted")`` for named queries to
``plans/r18/<query>_<label>.txt`` without timing runs.

Usage: python tools/dump_plans.py --label before q1 q2 ...
NB: queries whose construction is stateful (stored-index builds, the
crawl loop's materialize writes) execute that work while the plan is
built; the dumped plan is the FINAL query's, as the audit records it.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--label", required=True)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SKETCH_HASH", "xxhash64")
    import __spark_entry__ as ent
    from setup_harvest_action_spark.session import get_spark

    spark = get_spark("dump-plans")
    queries = ent.queries()
    plan_dir = os.path.join(REPO, "plans", "r18")
    os.makedirs(plan_dir, exist_ok=True)
    for name in args.queries:
        if name not in queries:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        df = queries[name](spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plan_dir, f"{name}_{args.label}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{args.label}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
