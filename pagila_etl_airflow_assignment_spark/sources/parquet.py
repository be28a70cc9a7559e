"""Parquet fixture readers.

Declarative `spark.read.parquet` scans so Catalyst gets predicate pushdown,
column pruning, and row-group skipping for free (SURVEY.md O-1/O-2). At 100 TB
the same call reads a partitioned lake path; nothing here assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime-settable confs the engine's reads depend on. The engine must behave
# under ANY caller's session (a bare Spark 4.x `getOrCreate()` has ANSI on, no
# nanos handling, machine-local timezone), so `load_table` self-heals these at
# read time instead of assuming session.build_session() ran:
#   - nanosAsLong: fixture `events.ts` is parquet TIMESTAMP(NANOS), which
#     vanilla Spark rejects with PARQUET_TYPE_ILLEGAL; read as long and let
#     normalize_event_ts truncate to microseconds (DuckDB-identical).
#   - UTC session tz: the engine's timestamps are naive-UTC (reference
#     "Simplified Timezone Handling"); pinning the tz makes TimestampType
#     round-trip through parquet byte-identically to the DuckDB oracle.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_read_confs(spark: SparkSession) -> None:
    """Set the runtime confs reads rely on (idempotent, safe on any session)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # never let a conf probe break a read on an exotic session


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (TESTDATA.md) as a DataFrame."""
    ensure_read_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """`events.ts` arrives as raw nanos (see session.py nanosAsLong); truncate
    to microsecond timestamps — byte-identical to DuckDB's read of the file."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=FIXTURE_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=FIXTURE_TABLES) -> None:
    """Register each fixture as a temp view for `spark.sql` pipelines."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
