"""Round-close gate — ONE command that runs every closing check, in
sequence, and writes a machine-readable record.

VERDICT r7 task 4: the one real bug of round 7 (a 4dp half-boundary tie
in b36_stream_psi) was caught only by the first-ever sf0.1 sweep, so the
multi-SF sweep + plan audit must be a standing scripted gate, not a
hand-run ritual. Stages (strictly sequential — two heavy Spark JVMs on
this box starve each other and die with bogus py4j connection errors):

  1. full oracle sweep at sf0.001   (fast shape check)
  2. full oracle sweep at sf0.01    (the driver's gate scale)
  3. full oracle sweep at sf0.01 --vanilla (driver-session parity: the
     driver calls queries() with ITS OWN SparkSession)
  4. full oracle sweep at sf0.1     (10x the gate scale: catches
     data-dependent rounding-tie flips sf0.01 can't reach)
  5. plan audit over every registered batch query (cartesians /
     unbounded windows / non-scalar BNLJ)
  6. examples smoke — every examples/*.py main() end-to-end at sf0.001
  7. pytest (optional: --with-pytest)

Usage:
  python tools/round_gate.py [--fast] [--with-pytest] [--out FILE]

--fast drops the sf0.1 sweep (mid-round iteration); the round CLOSE runs
the full ladder. Exit code 0 iff every stage passed. Record written to
ROUND_GATE.json at the repo root (override with --out).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_stage(name: str, cmd: list[str]) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, *cmd],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=False,
    )
    # Spark progress bars write \r — normalize before keeping the tail.
    tail = "\n".join(
        (proc.stdout + "\n" + proc.stderr).replace("\r", "\n").splitlines()[-8:]
    )
    rec = {
        "stage": name,
        "cmd": " ".join(cmd),
        "rc": proc.returncode,
        "secs": round(time.time() - t0, 1),
        "tail": tail,
    }
    status = "PASS" if proc.returncode == 0 else "FAIL"
    print(f"[round_gate] {status} {name} ({rec['secs']}s)")
    if proc.returncode != 0:
        print(tail)
    return rec


def main() -> int:
    args = sys.argv[1:]
    fast = "--fast" in args
    with_pytest = "--with-pytest" in args
    out = "ROUND_GATE.json"
    if "--out" in args:
        out = args[args.index("--out") + 1]

    stages = [
        ("oracles_sf0.001", ["tools/check_oracles.py", "/root/testdata/sf0.001"]),
        ("oracles_sf0.01", ["tools/check_oracles.py", "/root/testdata/sf0.01"]),
        (
            "oracles_sf0.01_vanilla",
            ["tools/check_oracles.py", "--vanilla", "/root/testdata/sf0.01"],
        ),
    ]
    if not fast:
        stages.append(
            ("oracles_sf0.1", ["tools/check_oracles.py", "/root/testdata/sf0.1"])
        )
    stages.append(("plan_audit", ["tools/plan_audit.py"]))
    # The examples are the README's advertised consumer surface — run all
    # seven end-to-end at sf0.001 so an API change can't rot them
    # silently (VERDICT r12 task 6).
    stages.append(("examples", ["tools/examples_smoke.py"]))
    if with_pytest:
        stages.append(("pytest", ["-m", "pytest", "tests/", "-q"]))
    # Regenerate the COVERAGE.md certification ledger from the
    # CORRECTNESS artifacts — strictly LAST (VERDICT r8 #4, r11 #4), so
    # the sealed doc reflects every artifact present at gate time and
    # can't lag a mid-round snapshot.
    stages.append(("cert_ledger", ["tools/cert_ledger.py"]))

    results = [run_stage(name, cmd) for name, cmd in stages]
    ok = all(r["rc"] == 0 for r in results)
    record = {
        "gate": "round_close" if not fast else "mid_round_fast",
        "ok": ok,
        "stages": results,
    }
    (REPO / out).write_text(json.dumps(record, indent=1))
    print(f"[round_gate] {'ALL PASS' if ok else 'FAILURES'} -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
