"""Local simulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it with
its ``oracle_sql()`` twin in DuckDB: row count, sorted column names, and an
order-insensitive value hash — the same shape the driver records into
CORRECTNESS_r{N}.json. Queries without an oracle get the weaker rows-only
check. Exit code 1 if anything mismatches.

Usage: python tools/verify_local.py [sf_dir] [--bare] [--only a,b,c]

``--bare`` runs the queries on an unconfigured ``SparkSession`` (ANSI on, no
nanosAsLong, machine timezone) — the driver's environment. Every query must
pass under --bare; the engine self-heals required confs at read time.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pagila_etl_airflow_assignment_spark.schemas import FIXTURE_TABLES
from pagila_etl_airflow_assignment_spark.session import build_session

_argv = sys.argv[1:]
BARE = "--bare" in _argv
ONLY: set[str] | None = None
if "--only" in _argv:
    i = _argv.index("--only")
    ONLY = set(_argv[i + 1].split(","))
    _argv = _argv[:i] + _argv[i + 2:]
_args = [a for a in _argv if a != "--bare"]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"


def _norm(v):
    if v is None:
        return "~"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    if BARE:
        from pyspark.sql import SparkSession

        # "Bare" means bare SQL semantics (ANSI on, machine timezone, no
        # nanosAsLong, no AQE/shuffle tuning) — NOT an artificially tiny JVM:
        # the default 1g driver heap dies with Connection-refused near the
        # end of a 441-query sf0.1 sweep (observed twice in r7), which tests
        # the heap size, not the engine. Memory must be set BEFORE the JVM
        # launches, hence here rather than post-hoc.
        spark = (
            SparkSession.builder.master("local[32]")
            .appName("verify-local-bare")
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_VERIFY_DRIVER_MEM", "48g"),
            )
            .getOrCreate()
        )
    else:
        spark = build_session(app_name="verify-local")
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
    failures = []
    for name in sorted(qmap):
        t0 = time.perf_counter()
        try:
            df = qmap[name](spark, SF_DIR)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark raised {e}")
            continue
        took = time.perf_counter() - t0
        oracle = omap.get(name)
        if oracle is None:
            print(f"ok    {name}: rows-only ({len(s_rows)} rows, {took:.2f}s)")
            continue
        try:
            rel = con.sql(oracle)
            d_cols = list(rel.columns)
            d_rows = [tuple(r) for r in rel.fetchall()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        sh, dh = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
        if sh != dh:
            problems.append(f"valuehash spark={sh} duck={dh}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: hash={sh} ({len(s_rows)} rows, {took:.2f}s)")

    spark.stop()
    print(f"\n{len(qmap) - len(failures)}/{len(qmap)} queries match at {SF_DIR}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
