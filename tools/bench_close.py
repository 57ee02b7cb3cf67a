"""Close-wave bench aggregator (BENCHNOTES r13 methodology).

Runs bench.py N times (default 3) and reports, per query, the
median-of-medians plus the across-run spread — the figure BENCHNOTES
commits at round close.  One bench.py invocation already medians 3
timed runs per query; aggregating 3 invocations (separate JVMs,
separate page-cache states) is what makes sub-10% round-over-round
deltas readable against the environmental band: a delta inside a
query's own across-run spread is noise, not a plan change.

Usage: python tools/bench_close.py [n_runs] [extra bench.py env via
environment].  Prints a markdown table and a one-line JSON summary.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    per_run: list[dict] = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, "bench.py"],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        per_run.append(rec)
        print(
            f"# run {i + 1}/{n}: total {rec['value']}s",
            file=sys.stderr,
        )

    names = list(per_run[0]["queries"])
    rows = []
    for q in names:
        vals = [r["queries"][q] for r in per_run]
        med = statistics.median(vals)
        spread = 100.0 * (max(vals) - min(vals)) / med if med else 0.0
        rows.append((q, med, min(vals), max(vals), spread))

    print("| query | median (s) | min | max | spread % |")
    print("|---|---|---|---|---|")
    for q, med, lo, hi, sp in rows:
        print(f"| {q} | {med:.3f} | {lo:.3f} | {hi:.3f} | {sp:.1f} |")
    total_meds = [r["value"] for r in per_run]
    total = statistics.median(total_meds)
    print(
        f"| **total** | **{total:.3f}** | {min(total_meds):.3f} "
        f"| {max(total_meds):.3f} | "
        f"{100.0 * (max(total_meds) - min(total_meds)) / total:.1f} |"
    )
    print(
        json.dumps(
            {
                "metric": "headline_total_sec_median_of_runs",
                "value": round(total, 3),
                "runs": total_meds,
                "queries": {q: round(m, 3) for q, m, *_ in rows},
                "spread_pct": {q: round(sp, 1) for q, *_, sp in rows},
                "sf": per_run[0]["sf"],
            }
        )
    )


if __name__ == "__main__":
    main()
