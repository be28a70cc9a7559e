"""Bucketed table layout: shuffle-free co-located fact-fact joins.

Broadcast handles small-dim joins and AQE handles estimation errors, but a
100 TB fact ⋈ fact equi-join (lineitem ⋈ orders on orderkey) shuffles BOTH
inputs every time it runs. The lake answer is to pay that shuffle ONCE at
write time: hash-bucket both tables into the same number of buckets on the
join key (`DataFrameWriter.bucketBy`). Every later join on that key reads
bucket i of each side into the same task — Catalyst sees the bucketed scan's
hash distribution already satisfies the join's requirement and plans NO
Exchange (pinned by tests/test_sinks.py on the executed plan).

`sortBy` within buckets additionally pre-orders rows on the join key, which
lets the sort-merge join skip its sort when each bucket holds one file, and
gives row-group clustering for key predicates — the same data-skipping
argument as `maintenance.clustered_write`, per bucket.

This is the plain-parquet analogue of Delta/Iceberg's clustered layouts; the
bucket metadata lives in the session catalog (`saveAsTable`), which on a real
deployment is the shared metastore. Mirrors SCALE.md §6's layout story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as an external parquet table hash-bucketed on
    ``bucket_cols`` (optionally sorted within buckets). Overwrites."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: object
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With equal
    bucket counts on the join key, the planned join has no Exchange on
    either side — the write-time shuffle is reused by every query."""
    return spark.table(left_table).join(spark.table(right_table), on)
