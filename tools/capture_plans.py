"""Capture .explain("formatted") output for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> <query ...>

Writes plans/<tag>/<query>_<suffix>.txt for each query (suffix is
"before" / "after" per the optimization-round deliverable contract).
Plans are captured at sf0.1 (the bench scale) so Exchange counts and
join strategies match what the bench times; AQE plans print as the
initial plan (isFinalPlan=false), which is the comparable artifact
across edits.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ddataframeoperation_spark.queries import QUERIES  # noqa: E402
from ddataframeoperation_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture_plans")
    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote plans/{tag}/{name}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
