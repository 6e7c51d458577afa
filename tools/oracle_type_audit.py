"""Audit DuckDB oracle OUTPUT TYPES against the Spark query schema.

Round-10 post-mortem (`b31_dedup_token_savings`): the local checker
fetches oracle rows via ``fetchall()`` (DuckDB HUGEINT → Python int,
hash-identical to Spark's long), but the driver materializes through
pandas, where HUGEINT becomes **float64** — so an un-cast
``sum(BIGINT)`` or ``HUGEINT // HUGEINT`` output column renders
``250.0`` against Spark's ``250`` and hash-fails AT THE DRIVER ONLY.
The same class covers DECIMAL (trailing-zero rendering) and any
int-on-one-side / float-on-the-other pairing whose values aren't
integral.

This tool DESCRIBEs every registered oracle on the DuckDB side (no
data scan there) and pairs each output column with the Spark query's
``.dtypes``. Note the Spark side must BUILD each DataFrame, and some
query builders do bounded driver-side work to construct the plan
(e.g. a ``head()`` to fetch a query vector, k-means centroid training,
eager iterative-round materialization) — so a full-registry run costs
minutes, not seconds; scope with query-name arguments when iterating.
Flags:

  HUGEINT   any DuckDB HUGEINT/UHUGEINT output column (always unsafe)
  DECIMAL   any DuckDB DECIMAL output column (trailing-zero rendering)
  INT/FLOAT Spark integral vs DuckDB float (or vice versa) — unsafe
            whenever a value is non-integral; flagged for review

Usage: python tools/oracle_type_audit.py [sf_dir] [query_name ...]
Exit 1 if any HUGEINT/DECIMAL column is found.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ddataframeoperation_spark.queries import ORACLES, QUERIES  # noqa: E402
from ddataframeoperation_spark.session import get_spark  # noqa: E402
from ddataframeoperation_spark.catalog import FIXTURE_TABLES  # noqa: E402

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def duck_types(con, sql: str) -> list[tuple[str, str]]:
    rel = con.sql(sql)
    return list(zip(rel.columns, [str(t) for t in rel.types]))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_type_audit")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    hard, soft = [], []
    for name in QUERIES:
        if only and name not in only:
            continue
        if name not in ORACLES:
            continue
        try:
            dt = dict(duck_types(con, ORACLES[name]))
        except Exception as e:  # noqa: BLE001
            hard.append(name)
            print(f"ERR   {name}: duckdb describe failed: {e}")
            continue
        try:
            st = dict(QUERIES[name](spark, sf_dir).dtypes)
        except Exception as e:  # noqa: BLE001
            hard.append(name)
            print(f"ERR   {name}: spark plan failed: {e}")
            continue
        for col, d in dt.items():
            base = d.split("(")[0].upper()
            s = st.get(col, "?")
            if base in {"HUGEINT", "UHUGEINT"}:
                hard.append(name)
                print(f"HARD  {name}.{col}: duck={d} (pandas→float64) spark={s}")
            elif base == "DECIMAL":
                hard.append(name)
                print(f"HARD  {name}.{col}: duck={d} (trailing-zero render) spark={s}")
            elif base in _DUCK_INT and s in _SPARK_FLOAT:
                soft.append(name)
                print(f"soft  {name}.{col}: duck={d} vs spark={s} (int/float pair)")
            elif base in _DUCK_FLOAT and s in _SPARK_INT:
                soft.append(name)
                print(f"soft  {name}.{col}: duck={d} vs spark={s} (float/int pair)")
    print(
        f"\n{len(set(hard))} hard-flagged, {len(set(soft))} soft-flagged "
        f"of {len(ORACLES)} oracles"
    )
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())
