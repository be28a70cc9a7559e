"""Exact-value diff between Spark and the DuckDB oracle for named queries.

Unlike verify_local (6dp float formatting), this compares repr-level values
so last-ulp drift is visible — the driver's stricter hash boundary.

Usage: python tools/diag_exact.py q1,q2 [sf_dir] [--bare]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pagila_etl_airflow_assignment_spark.schemas import FIXTURE_TABLES
from pagila_etl_airflow_assignment_spark.session import build_session

names = sys.argv[1].split(",")
SF_DIR = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf0.01"
BARE = "--bare" in sys.argv

if BARE:
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[32]").appName("diag-bare").getOrCreate()
else:
    spark = build_session(app_name="diag-exact")

con = duckdb.connect()
for t in FIXTURE_TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )

qmap = entrymod.queries()
omap = entrymod.oracle_sql()

for name in names:
    df = qmap[name](spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    rel = con.sql(omap[name])
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]
    print(f"== {name}: spark cols={s_cols} types={[f.dataType.simpleString() for f in df.schema.fields]}")
    print(f"   duck  cols={d_cols} types={[str(t) for t in rel.types]}")
    so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    s_sorted = sorted(tuple(r[i] for i in so) for r in s_rows)
    d_sorted = sorted(tuple(r[i] for i in do) for r in d_rows)
    ndiff = 0
    for a, b in zip(s_sorted, d_sorted):
        ra = tuple(repr(x) for x in a)
        rb = tuple(repr(x) for x in b)
        if ra != rb:
            ndiff += 1
            if ndiff <= 8:
                print(f"   DIFF spark={ra}")
                print(f"        duck ={rb}")
    print(f"   total rows spark={len(s_rows)} duck={len(d_rows)} exact-diff rows={ndiff}")

spark.stop()
