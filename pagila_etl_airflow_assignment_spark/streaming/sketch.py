"""Streaming Count-Min sketch maintenance.

The sketch's whole reason to exist is incremental mergeability: cell counts
are a keyed streaming aggregation ((row, col) ← +1 per event), so the same
d×w summary the batch build produces (operators/cmsketch.py) stays current
under a stream with NO extra state machinery — state size is capped at d·w
cells regardless of stream volume, the degenerate-and-ideal case of
streaming-aggregation state. Complete output mode is exactly right here:
the full sketch IS d·w rows.

Differential contract (tests/test_streaming.py): stream result after
availableNow over the fixture == cm_build on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cmsketch import CM_DEPTH, CM_WIDTH, _cells
from ..sources.parquet import events_stream


def streaming_cm_sketch(
    spark: SparkSession,
    events_path: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(row, col, n) cells maintained incrementally over the event stream."""
    sdf = events_stream(spark, events_path)
    return (
        sdf.select(F.explode(_cells(F.col("user_id"), depth, width)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("n"))
    )
