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
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=FIXTURE_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=FIXTURE_TABLES) -> None:
    """Register each fixture as a temp view for `spark.sql` pipelines."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
