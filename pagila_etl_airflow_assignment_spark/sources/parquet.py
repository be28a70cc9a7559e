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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (TESTDATA.md) as a DataFrame."""
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
