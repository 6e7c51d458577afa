"""Compare two bench result files and report per-query drift.

Usage:
    python tools/bench_compare.py BENCH_r05.json BENCH_r06.json [threshold] [--floors]
    python tools/bench_compare.py BENCH_r13.json [threshold] [--floors]

Single-file form compares against BASELINE_QUERIES.json — the pinned
honest per-query floors (r12 noop-sink numbers; VERDICT r12 task 3).
Use this for round-over-round triage instead of an arbitrary earlier
BENCH_r*.json: r01-r11 per-query numbers predate the COUNT_ONLY
noop-sink fix and mix phantom (Catalyst-pruned) timings.

Accepts either the driver's wrapper format ({"parsed": {"queries": ...}})
or bench.py's raw JSON line ({"queries": ...}). Prints queries slower than
``threshold``× (default 1.3) and faster than 1/threshold, plus totals over
the common-query set — the number that is comparable across rounds (suite
composition changes round to round; raw totals are not).

Methodology note (SCALE.md §13): suite-level drift is usually contention,
not regression — confirm any flagged query with
``python bench.py --isolate <query>`` in a fresh JVM before tuning.
``--floors`` automates that adjudication (VERDICT r6 #5): every
>=threshold drifter is re-timed via ``bench.py --isolate`` (fresh JVM,
SPARK_GRAFT_BENCH_REPEAT=4 steady-state) and a markdown floor table is
printed for SCALE.md §13 — no drifter ships unadjudicated.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        text = f.read()
    d = json.loads(text)
    raw_tail = d.get("tail") if isinstance(d, dict) else None
    if "parsed" in d:
        d = d["parsed"]
    q = (d or {}).get("queries") if isinstance(d, (dict, type(None))) else None
    if (not isinstance(q, dict) or not q) and raw_tail:
        # Salvage a front-truncated driver record (BENCH_r09: the
        # 80-query line outgrew the tail capture and "parsed" is null):
        # per-query timings that DID survive are regex-recoverable. The
        # first pair may be cut mid-name, so require the b-prefix shape.
        import re

        pairs = re.findall(r'"((?:b|q)[a-z0-9_]+)": ([0-9.]+)', raw_tail)
        q = {k: float(v) for k, v in pairs}
        q.pop("value", None)
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no queries dict found")
    return {k: float(v) for k, v in q.items()}


def isolate_floors(queries: list[str]) -> dict[str, float]:
    """Re-time queries in ONE fresh JVM via bench.py --isolate with a
    4-repeat steady-state floor; returns {query: floor_sec}."""
    import os
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_BENCH_REPEAT="4")
    out = subprocess.run(
        [sys.executable, "bench.py", "--isolate", *queries],
        capture_output=True, text=True, env=env, check=True,
    ).stdout
    # bench.py now prints TWO JSON lines (full payload, then a compact
    # truncation-proof totals line) — take the last line that carries
    # the per-query map.
    recs = [json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]
    rec = [d for d in recs if "queries" in d][-1]
    return {k: float(v) for k, v in rec["queries"].items()}


def main() -> int:
    argv = [x for x in sys.argv[1:] if x != "--floors"]
    floors = "--floors" in sys.argv
    def _is_num(s: str) -> bool:
        try:
            float(s)
            return True
        except ValueError:
            return False

    if len(argv) >= 1 and not _is_num(argv[0]) and (
        len(argv) == 1 or _is_num(argv[1])
    ):
        # Single-file form (optionally + threshold): drift vs the
        # pinned honest floors.
        import os

        base = os.path.join(os.path.dirname(__file__), "..",
                            "BASELINE_QUERIES.json")
        argv = [base] + argv
    if len(argv) < 2:
        print(__doc__)
        return 2
    a, b = load(argv[0]), load(argv[1])
    thr = float(argv[2]) if len(argv) > 2 else 1.3
    common = sorted(set(a) & set(b))
    if not common:
        raise SystemExit("no common queries")
    ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
    print(
        f"common queries: {len(common)}  "
        f"{argv[0]}: {ta:.2f}s  {argv[1]}: {tb:.2f}s  "
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
        print(f"new in {argv[1]}: {', '.join(only_b)}")
    if floors and slower:
        names = [q for _, q in sorted(slower, reverse=True)]
        print(f"\nisolated floors for {len(names)} drifter(s) "
              f"(fresh JVM, repeat=4):")
        fl = isolate_floors(names)
        print(f"| query | {argv[0]} | {argv[1]} suite | isolated floor |")
        print("|---|---|---|---|")
        for q in names:
            print(f"| {q} | {a[q]:.3f} s | {b[q]:.3f} s | {fl[q]:.3f} s |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
