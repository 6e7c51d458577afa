"""Run every examples/*.py demo end-to-end as a gate stage.

VERDICT r12 task 6: the examples are the README's advertised consumer
surface, and until this stage nothing executed them — an API rename
could rot all seven silently. One process, one shared Spark session
(get_spark is a singleton, so the per-example cost is the work, not a
JVM start), each example's ``main()`` called with the smoke SF dir:

* modules with a module-level ``SF_DIR`` constant get it overridden —
  AFTER the module body runs, so the override reaches values read at
  main()-call time only; a module-level derivation (``X = f"{SF_DIR}/
  docs"``) would silently keep the default, which is why such
  derivations are rejected below;
* modules that read ``sys.argv[1]`` get it passed;
* self-contained demos (media_neardup_phash synthesizes its payloads)
  run as-is.

sf0.001 keeps the stage to seconds; examples exercising aggregates that
need corpus mass still produce rows there (they were all authored
against fixture shapes that exist at every SF).

Usage: python tools/examples_smoke.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = sorted((REPO / "examples").glob("*.py"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    failures: list[str] = []
    for path in EXAMPLES:
        name = path.stem
        t0 = time.time()
        try:
            # The SF_DIR override below lands after the module body has
            # run, so a module-level value DERIVED from SF_DIR would
            # keep the default and the smoke would silently test the
            # wrong fixture — reject that pattern outright.
            src = path.read_text()
            derived = [
                ln.strip()
                for ln in src.splitlines()
                if re.match(r"^[A-Za-z_][\w]*\s*=.*\bSF_DIR\b", ln)
                and not re.match(r"^SF_DIR\s*=", ln)
            ]
            if derived:
                raise RuntimeError(
                    "module-level value derived from SF_DIR (override "
                    f"can't reach it): {derived[0]!r} — read SF_DIR "
                    "inside main() instead"
                )
            spec = importlib.util.spec_from_file_location(f"example_{name}", path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            if hasattr(mod, "SF_DIR"):
                mod.SF_DIR = sf_dir
            old_argv = sys.argv
            sys.argv = [str(path), sf_dir]
            try:
                rc = mod.main()
            finally:
                sys.argv = old_argv
            if rc not in (None, 0):
                raise RuntimeError(f"main() returned {rc}")
        except SystemExit as e:  # examples may sys.exit(main())
            if e.code not in (None, 0):
                failures.append(name)
                print(f"FAIL  {name}: exit code {e.code}")
                continue
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            continue
        print(f"ok    {name} ({time.time() - t0:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL GREEN")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
