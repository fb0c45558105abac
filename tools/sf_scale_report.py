#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Build the sf0.1 → sf1 scale report from two check_oracle logs.

Usage: python tools/sf_scale_report.py <sf0.1.log> <sf1.log> [ratio_bar]

Parses the per-query ``OK    name: N rows, hash H (T s)`` lines (the
progress-bar prefixes the gate leaves in the log are stripped), prints a
markdown table sorted by time ratio, and exits non-zero if any query's
sf1/sf0.1 wall ratio exceeds ``ratio_bar`` (default 15 — the
"no query grows super-linearly" criterion; the data is 10×).

Caveat printed with the table: the gate times Spark AND its DuckDB
mirror together, so a blown ratio indicts the QUERY PAIR — check
BENCH/last_run_queries.json (Spark-only) before blaming the engine.
"""

from __future__ import annotations

import re
import sys

LINE = re.compile(r"OK    ([a-z_0-9]+): (\d+) rows, hash [0-9a-f]+ \(([\d.]+)s\)")


def parse(path: str) -> dict:
    out = {}
    with open(path) as handle:
        for match in LINE.finditer(handle.read()):
            out[match.group(1)] = (float(match.group(3)), int(match.group(2)))
    return out


def main() -> None:
    base = parse(sys.argv[1])
    big = parse(sys.argv[2])
    bar = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    rows = []
    for name, (t1, n1) in big.items():
        if name in base:
            t0, n0 = base[name]
            rows.append((t1 / max(t0, 0.05), name, t0, t1, n0, n1))
    rows.sort(reverse=True)
    print("| query | sf0.1 s | sf1 s | time ratio | rows sf0.1 → sf1 |")
    print("|---|---|---|---|---|")
    for ratio, name, t0, t1, n0, n1 in rows:
        flag = " ⚠" if ratio > bar else ""
        print(f"| {name}{flag} | {t0:.1f} | {t1:.1f} | {ratio:.1f}× | {n0} → {n1} |")
    blown = [r for r in rows if r[0] > bar]
    missing = sorted(set(base) - set(big))
    if missing:
        print(f"\nmissing at sf1: {missing}")
    print(f"\n{len(rows)} compared; {len(blown)} above {bar}× (data is 10×).")
    sys.exit(1 if blown or missing else 0)


if __name__ == "__main__":
    main()
