"""Compare two bench result files and report per-query drift.

Usage:
    python tools/bench_compare.py BENCH_r05.json BENCH_r06.json [threshold]

Accepts either the driver's wrapper format ({"parsed": {"queries": ...}})
or bench.py's raw JSON line ({"queries": ...}). Prints queries slower than
``threshold``× (default 1.3) and faster than 1/threshold, plus totals over
the common-query set — the number that is comparable across rounds (suite
composition changes round to round; raw totals are not).

Methodology note (SCALE.md §13): suite-level drift is usually contention,
not regression — confirm any flagged query with
``python bench.py --isolate <query>`` in a fresh JVM before tuning.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        text = f.read()
    d = json.loads(text)
    if "parsed" in d:
        d = d["parsed"]
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no queries dict found")
    return {k: float(v) for k, v in q.items()}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    common = sorted(set(a) & set(b))
    if not common:
        raise SystemExit("no common queries")
    ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
    print(
        f"common queries: {len(common)}  "
        f"{sys.argv[1]}: {ta:.2f}s  {sys.argv[2]}: {tb:.2f}s  "
        f"ratio {tb / ta:.2f}x"
    )
    slower = [(b[q] / a[q], q) for q in common if a[q] > 0 and b[q] / a[q] >= thr]
    faster = [(b[q] / a[q], q) for q in common if a[q] > 0 and b[q] / a[q] <= 1 / thr]
    for r, q in sorted(slower, reverse=True):
        print(f"  SLOWER {r:5.2f}x  {q}: {a[q]:.3f} -> {b[q]:.3f}s")
    for r, q in sorted(faster):
        print(f"  faster {r:5.2f}x  {q}: {a[q]:.3f} -> {b[q]:.3f}s")
    only_b = sorted(set(b) - set(a))
    if only_b:
        print(f"new in {sys.argv[2]}: {', '.join(only_b)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
