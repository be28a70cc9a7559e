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


def streaming_hll_registers(
    spark: SparkSession, events_path: str
) -> DataFrame:
    """HLL max-rank registers maintained incrementally over the event stream.

    MAX is the ideal streaming aggregate: idempotent (replays are free) and
    mergeable, so the register table stays current with state capped at
    |types|·64 rows forever — the streaming twin of the batch register build
    inside operators/hll.py, and the reason HLL (not exact distinct) is what
    streams carry for cardinality. Differential contract: stream registers
    after availableNow == the batch registers (tests/test_ivm_stats.py)."""
    from ..operators.hll import _bucket, _rank

    sdf = events_stream(spark, events_path)
    hexed = sdf.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("kh")
    )
    return (
        hexed.select(
            "event_type",
            _bucket(F.col("kh")).alias("bucket"),
            _rank(F.col("kh")).alias("r"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("m"))
    )


def streaming_user_bitmaps(spark: SparkSession, events_path: str) -> DataFrame:
    """Per-event-type 63-bit user bitmap words maintained incrementally over
    the event stream — the streaming twin of operators/bitmap.py's batch
    build. BIT_OR is MAX-class streaming state: idempotent under replay and
    mergeable, so exact per-type distinct-user sets stay current with state
    capped at |types|·⌈max_user/63⌉ words (the exact-cardinality analog of
    the HLL registers above; use this while the user space fits words, HLL
    past it). Differential contract: stream words after availableNow ==
    user_bitmaps on the same data (tests/test_streaming_bitmap.py)."""
    from ..operators.bitmap import WORD_BITS

    sdf = events_stream(spark, events_path)
    return (
        sdf.select(
            "event_type",
            F.expr(f"user_id DIV {WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {WORD_BITS} AS INT))"
            ).alias("w"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("w").alias("bits"))
    )
