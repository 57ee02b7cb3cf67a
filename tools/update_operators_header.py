"""Regenerate the OPERATORS.md catalog-count header from load_catalog().

The header line ("Catalog: N queries (M with DuckDB hash-checked
oracles, K rows-only...)") drifted once (r10 judge finding #4: the file
said 192/181/11 while the catalog was 273/259/14).  This tool makes the
line a build artifact: it reads the live registry and rewrites the
header in place, so `python tools/update_operators_header.py` after any
catalog change keeps the doc honest.  A pytest
(tests/test_docs_counts.py) asserts the file matches the registry.

Usage:  python tools/update_operators_header.py [--check]
  --check : exit 1 if the file is stale instead of rewriting it.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

OPERATORS_MD = "/root/repo/OPERATORS.md"
HEADER_RE = re.compile(r"^Catalog: \d+ queries \(\d+ with DuckDB hash-checked oracles, \d+ rows-only")


def header_line() -> str:
    from setup_harvest_action_spark.catalog import load_catalog

    queries, oracles = load_catalog()
    n, m = len(queries), len(oracles)
    return (
        f"Catalog: {n} queries ({m} with DuckDB hash-checked oracles, "
        f"{n - m} rows-only with"
    )


def main() -> int:
    check = "--check" in sys.argv
    want = header_line()
    with open(OPERATORS_MD) as f:
        lines = f.read().splitlines(keepends=True)
    hits = [i for i, ln in enumerate(lines) if HEADER_RE.match(ln)]
    if len(hits) != 1:
        print(f"expected exactly one catalog-count header line, found {len(hits)}")
        return 2
    i = hits[0]
    current_prefix = lines[i][: len(want)]
    if current_prefix == want:
        print("OPERATORS.md header up to date")
        return 0
    if check:
        print(f"STALE: {lines[i].strip()!r}\n want: {want!r}")
        return 1
    suffix = lines[i][lines[i].index(" rows-only with") + len(" rows-only with"):]
    lines[i] = want + suffix
    with open(OPERATORS_MD, "w") as f:
        f.writelines(lines)
    print(f"rewrote header: {want!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
