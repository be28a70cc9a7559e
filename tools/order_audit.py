"""Partitioning-order audit: find queries whose float outputs change when the
SAME data is scanned/shuffled with different partitioning.

tools/float_audit.py proves Spark==DuckDB bit-identity for one particular
partitioning; this tool attacks the remaining failure mode — order-dependent
float aggregation (SUM/AVG over doubles folds in partition order, so the
result is a function of the split layout, not just the data). A query that
produces different bits under a different `spark.sql.files.maxPartitionBytes`
/ `spark.sql.shuffle.partitions` is NOT certifiable: the external driver runs
its own partitioning, so agreement on ours proves nothing.

Each flagged query needs the exact-arithmetic treatment: integer-scaled units
(micro/nano), DECIMAL sums, or quantize-then-integer-sum (the
events_user_entropy micro-nats pattern) so the aggregate is order-free and
only bit-identical scalar ops remain.

At fixture scale each parquet table is a single row group, so
``maxPartitionBytes`` alone cannot split the scan — config B therefore ALSO
reads from a fragmented copy of the fixture (each table rewritten as many
small files under /tmp, same logical rows), which gives Spark genuinely
different partition counts and file orders for every scan.

Usage: python tools/order_audit.py [sf_dir] [--only a,b,c]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

_argv = sys.argv[1:]
ONLY: set[str] | None = None
if "--only" in _argv:
    i = _argv.index("--only")
    ONLY = set(_argv[i + 1].split(","))
    _argv = _argv[:i] + _argv[i + 2 :]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.01"

# config B fragments the scan into many small splits and changes the shuffle
# fan-in — any partition-order-dependent fold sees different operand order
PERTURB = {
    "spark.sql.files.maxPartitionBytes": "131072",
    "spark.sql.shuffle.partitions": "7",
}


def _exact(v):
    if v is None:
        return "~"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


def _collect(spark, fn):
    df = fn(spark, SF_DIR)
    has_float = any(
        f.dataType.typeName() in ("double", "float") for f in df.schema.fields
    )
    if not has_float:
        return None
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_exact(r[i]) for i in order) for r in (tuple(r) for r in df.collect())
    )


def _fragment_fixture(spark, sf_dir: str) -> str:
    """Rewrite every fixture table as many small parquet files (same rows) so
    scans in config B have real multi-partition inputs."""
    import tempfile

    from pagila_etl_airflow_assignment_spark.schemas import FIXTURE_TABLES

    frag_root = tempfile.mkdtemp(prefix="order-audit-frag-")
    for name in FIXTURE_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # 13 hash-scattered files: different file count, order, and row layout
        df.repartition(13).write.mode("overwrite").parquet(
            f"{frag_root}/{name}.parquet"
        )
    return frag_root


def main() -> int:
    global SF_DIR
    from pagila_etl_airflow_assignment_spark.session import build_session

    qmap = entrymod.queries()
    if ONLY is not None:
        qmap = {k: v for k, v in qmap.items() if k in ONLY}

    spark = build_session(app_name="order-audit-a")
    base: dict[str, list[str] | None] = {}
    for name in sorted(qmap):
        try:
            base[name] = _collect(spark, qmap[name])
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name} (config A): {e}")
    frag_dir = _fragment_fixture(spark, SF_DIR)
    spark.stop()

    SF_DIR = frag_dir
    spark = build_session(app_name="order-audit-b", extra_conf=PERTURB)
    flagged = []
    for name in sorted(qmap):
        if base.get(name) is None:
            if name in base:
                print(f"skip  {name}: no float output columns")
            continue
        try:
            alt = _collect(spark, qmap[name])
        except Exception as e:  # noqa: BLE001
            flagged.append(name)
            print(f"ERR   {name} (config B): {e}")
            continue
        if alt == base[name]:
            print(f"stable {name}")
            continue
        flagged.append(name)
        n = sum(1 for a, b in zip(base[name], alt) if a != b)
        print(f"ORDER {name}: {n}/{len(alt)} rows change bits under repartitioning")
        for a, b in [(a, b) for a, b in zip(base[name], alt) if a != b][:2]:
            print(f"        A: {a}")
            print(f"        B: {b}")
    spark.stop()

    print(f"\nflagged {len(flagged)}: {','.join(flagged)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
