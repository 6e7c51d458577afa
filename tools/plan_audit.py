"""Closing plan audit — scan EVERY registered query's executed plan for
scale red flags and print a census:

- CartesianProduct anywhere (hard fail);
- un-partitioned Window operators (must be the known constant/dimension-
  bounded allowlist, each with a written bound at its definition);
- BroadcastNestedLoopJoin that is not the Cross/BuildRight 1-row-scalar
  shape.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001 — plan
shapes, not timings, so the smallest fixture is enough)

Streaming queries are skipped: their plans only materialize inside a
running query, and their state/watermark shapes are pinned by
tests/test_streaming.py instead.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ddataframeoperation_spark.queries import QUERIES  # noqa: E402
from ddataframeoperation_spark.session import get_spark  # noqa: E402

#: Un-partitioned windows that are allowed because their input is
#: constant- or pre-limit-bounded (bound documented at the definition).
GLOBAL_WINDOW_ALLOWLIST = {
    "b15_sort_null_ordering",   # pre-limited <=2000 keys (queries.py)
    "b16_skyline_2d",           # <=1024-row cross-bucket prefix table
    "b19_abc_classification",   # <=1024-row cross-bucket prefix table (r7)
    "b34_token_ids",            # vocabulary table (min_df-bounded)
    "b34_vocabulary",           # vocabulary ranking (top-k bounded)
    "b33_hybrid_rrf",           # two top-10 candidate lists
    "b12_heavy_hitters",        # sketch output (<= tracked-capacity rows)
    "b22_temperature_mix",      # |distinct sources|-row quota table
    "b11_rank_sum_test",        # <=buckets-row cross-bucket offset table
    "b11_ks_test",              # <=buckets-row cross-bucket offset table
    "b28_auc_exact",            # <=buckets-row cross-bucket offset table
                                # (same rank machinery as rank_sum/ks)
    "b28_pr_auc",               # <=buckets-row cross-bucket offset table
                                # (descending twin of the auc machinery)
    "b11_weighted_percentiles", # <=buckets-row cross-bucket offset table
                                # (weighted twin of the same machinery;
                                # one offset window per requested prob)
}

#: BroadcastNestedLoopJoin shapes beyond the 1-row Cross/BuildRight
#: scalar: allowed only when the build side is a bounded literal table.
BNLJ_ALLOWLIST = {
    "b18_scd2_asof",            # 3-row literal probe-instant dim,
                                # interval-containment condition
    "b12_hll_overlap",          # scalar x scalar: every join input is a
                                # 1-row global sketch/count aggregate
                                # (Spark may pick BuildLeft, which the
                                # textual 1-row-scalar check can't see)
    "b12_bloom_rf",             # scalar x scalar x scalar: the three
                                # crossJoined inputs are 1-row count
                                # aggregates (build keys / key flags /
                                # row flags)
}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    cartesian, bad_bnlj, global_windows, errors = [], [], [], []
    n = 0
    for name, fn in QUERIES.items():
        if "stream" in name:
            continue
        try:
            plan = str(fn(spark, sf)._jdf.queryExecution().executedPlan())
        except Exception as exc:  # noqa: BLE001
            errors.append((name, f"{type(exc).__name__}: {exc}"[:160]))
            continue
        n += 1
        if "CartesianProduct" in plan:
            cartesian.append(name)
        bnlj = plan.count("BroadcastNestedLoopJoin")
        if (
            bnlj != plan.count("BroadcastNestedLoopJoin BuildRight, Cross")
            and name not in BNLJ_ALLOWLIST
        ):
            bad_bnlj.append(name)
        # A window spec whose first element is neither a partition column
        # list ending before ORDER nor the bounded-table _bkt marker:
        # detect un-partitioned specs = spec starts with an order column
        # (contains '#' before any partition separator) — conservative
        # textual check: Spark prints partition cols first; a spec that
        # begins with "windowspecdefinition(<col> ASC|DESC" with no
        # preceding partition list is global. Partitioned specs begin
        # with "windowspecdefinition(<pcol>#id, <ocol># ASC/DESC".
        for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
            first = spec.split(",")[0].strip()
            if first.startswith("specifiedwindowframe"):
                # frame-only spec: un-partitioned AND un-ordered —
                # aggregates over a bounded table (e.g. grand totals).
                if name not in GLOBAL_WINDOW_ALLOWLIST:
                    global_windows.append((name, "frame-only"))
                continue
            if re.match(r"^\S+#\d+L? (ASC|DESC)", first):
                # first element already carries a sort direction => no
                # partition columns => global sort window.
                if name not in GLOBAL_WINDOW_ALLOWLIST:
                    global_windows.append((name, first[:60]))
    print(f"audited {n} batch plans ({len(errors)} errors)")
    print(f"CartesianProduct: {cartesian or 'NONE'}")
    print(f"non-scalar BroadcastNestedLoopJoin: {bad_bnlj or 'NONE'}")
    if global_windows:
        print("un-partitioned windows OUTSIDE allowlist:")
        for name, spec in sorted(set(global_windows)):
            print(f"  {name}: {spec}")
    else:
        print("un-partitioned windows outside allowlist: NONE")
    for name, err in errors:
        print(f"  ERROR {name}: {err}")
    return 1 if (cartesian or global_windows or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
