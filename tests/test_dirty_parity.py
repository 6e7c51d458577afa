"""Dirty-fixture parity: the NULL/NaN input contracts added in round 13
claim "the registered oracle filters identically" — this test PROVES it
by running the driver-style engine-vs-DuckDB compare (the real
tools/check_oracles.py, as a subprocess) against a COPY of the sf0.001
fixture with NULL/NaN rows injected into events and orders.

The shipped fixtures contain zero NULLs and zero NaNs (verified by
column scan in round 13), so the per-round driver gate can never
exercise these contracts; without this test a cross-engine divergence
on dirty data (e.g. Spark dropping a NULL day that DuckDB counts)
would stay invisible until real data hit it.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
SRC = Path("/root/testdata/sf0.001")

#: Queries whose engine AND oracle carry an explicit NULL/NaN-drop
#: contract on events/orders inputs (round-13 hardening commits).
DIRTY_CONTRACT_QUERIES = [
    "b35_rfm_segments",
    "b24_cusum_changepoint",
    "b24_seasonal_decompose",
    "b24_seasonal_anomaly",
]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _build_dirty_fixture(dst: Path) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        if t not in ("events", "orders"):
            shutil.copy(SRC / f"{t}.parquet", dst / f"{t}.parquet")
    con = duckdb.connect()
    # events: a NULL-ts row (no day), NULL-value rows — including an
    # ENTIRE day whose values are all NULL (the n-vs-T asymmetry that
    # broke cusum's S_n == 0 invariant), attached to a real event_type.
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/events.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES
            (9000001, NULL::TIMESTAMP, 1, 'view', 5.0, NULL),
            (9000002, TIMESTAMP '2024-06-01 10:00:00', 1, 'view',
             NULL::DOUBLE, NULL),
            (9000003, TIMESTAMP '2024-06-01 14:00:00', 2, 'view',
             NULL::DOUBLE, NULL),
            (9000004, NULL::TIMESTAMP, 3, 'click', NULL::DOUBLE, NULL)
          ) AS t(event_id, ts, user_id, event_type, value, props)
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )
    # orders: one row per broken metric — NULL customer, NULL date,
    # NULL amount, and a NaN amount (whose cents cast would raise under
    # ANSI if it ever reached the engine's floor/cast).
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/orders.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES
            (9000001, NULL::BIGINT, 'O', 100.0,
             TIMESTAMP '1996-06-01 00:00:00', '1-URGENT'),
            (9000002, 5, 'O', NULL::DOUBLE,
             TIMESTAMP '1996-06-02 00:00:00', '1-URGENT'),
            (9000003, 5, 'O', 100.0, NULL::TIMESTAMP, '1-URGENT'),
            (9000004, 5, 'O', 'NaN'::DOUBLE,
             TIMESTAMP '1996-06-03 00:00:00', '1-URGENT')
          ) AS t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 o_orderdate, o_orderpriority)
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


def test_null_contract_queries_stay_green_on_dirty_fixture(tmp_path):
    dirty = tmp_path / "sf0.001-dirty"
    _build_dirty_fixture(dirty)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_oracles.py"),
         str(dirty), *DIRTY_CONTRACT_QUERIES],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"checker failed on dirty fixture:\n{out}"
    for q in DIRTY_CONTRACT_QUERIES:
        assert f"ok    {q}:" in out, f"no ok line for {q} (vacuous run?):\n{out}"
    assert "ALL GREEN" in out
