"""Full-bit-precision float audit: find queries whose float outputs are NOT
bit-identical between Spark and the DuckDB oracle.

The local verify (tools/verify_local.py) formats floats at 6 dp — the same
tolerance hides last-ulp divergence that the external driver's stricter value
hash flips on (observed: events_user_entropy round-4 hash-FAIL). A float
output is certified-safe only when both engines produce the IDENTICAL double:
every divergence comes from order-dependent float sums (Spark partition
partials vs DuckDB's own order), libm differences (ln/exp/pow), or
decimal-rounding implementation differences (BigDecimal vs binary multiply).

This tool re-runs every oracled query and compares each float cell by exact
bits (via repr), pairing rows by the sorted full-precision line. Queries it
flags need the exact-arithmetic treatment (integer-scaled units / DECIMAL /
exact-integer inputs to the one final float op); queries it clears are
bit-stable today — though order-dependent sums can still wander between Spark
RUNS, so clear-today is necessary, not sufficient (see tools/order_audit.py).

Usage: python tools/float_audit.py [sf_dir] [--only a,b,c]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pagila_etl_airflow_assignment_spark.schemas import FIXTURE_TABLES
from pagila_etl_airflow_assignment_spark.session import build_session

_argv = sys.argv[1:]
ONLY: set[str] | None = None
if "--only" in _argv:
    i = _argv.index("--only")
    ONLY = set(_argv[i + 1].split(","))
    _argv = _argv[:i] + _argv[i + 2 :]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.01"


def _exact(v):
    """Full-precision canonical cell: floats by exact repr (bit-faithful)."""
    if v is None:
        return "~"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # shortest repr uniquely identifies the double
    return str(v)


def _lines(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_exact(r[i]) for i in order) for r in rows)


def main() -> int:
    spark = build_session(app_name="float-audit")
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    if ONLY is not None:
        qmap = {k: v for k, v in qmap.items() if k in ONLY}

    flagged: list[str] = []
    for name in sorted(qmap):
        oracle = omap.get(name)
        if oracle is None:
            continue
        try:
            df = qmap[name](spark, SF_DIR)
            s_cols = df.columns
            has_float = any(
                f.dataType.typeName() in ("double", "float") for f in df.schema.fields
            )
            if not has_float:
                print(f"skip  {name}: no float output columns")
                continue
            s_lines = _lines(s_cols, [tuple(r) for r in df.collect()])
            rel = con.sql(oracle)
            d_lines = _lines(list(rel.columns), rel.fetchall())
        except Exception as e:  # noqa: BLE001
            flagged.append(name)
            print(f"ERR   {name}: {e}")
            continue
        if s_lines == d_lines:
            print(f"exact {name}: all float cells bit-identical")
            continue
        diff = [
            (a, b) for a, b in zip(s_lines, d_lines) if a != b
        ][:3]
        flagged.append(name)
        print(f"DRIFT {name}: {sum(1 for a, b in zip(s_lines, d_lines) if a != b)}"
              f"/{len(s_lines)} rows differ at full precision")
        for a, b in diff:
            print(f"        spark: {a}")
            print(f"        duck:  {b}")

    spark.stop()
    print(f"\nflagged {len(flagged)}: {','.join(flagged)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
