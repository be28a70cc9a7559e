"""Backfill planning: turn a watermark gap into a bounded work-list.

The ops-side complement of the incremental runner (runner.py executes ONE
delta; this plans MANY): given how far the state table's watermark lags the
source, emit the chunked run list an orchestrator (the reference's Airflow
DAG, reference dag.py) would iterate — bounded chunks so each backfill run
has the same memory/shuffle profile as a normal incremental run, newest-last
so the watermark advances monotonically and a mid-backfill crash resumes
where it stopped (the runner's crash-safety ordering, SURVEY O-8).

Scale shape: one 1-row min/max aggregate over the source; the plan itself is
a narrow explode of that single row. Zero joins, zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_DAYS = 7
WATERMARK_TENTHS = 3  # simulated watermark: min_day + 3/10 of the day span


def backfill_plan(
    events: DataFrame,
    chunk_days: int = CHUNK_DAYS,
    watermark_tenths: int = WATERMARK_TENTHS,
) -> DataFrame:
    """(run_id, start_day, end_day, n_days): ≤``chunk_days``-day chunks
    covering (watermark, max_day], oldest first. The watermark is derived
    deterministically at ``watermark_tenths``/10 of the observed day span so
    the plan is a pure function of the source data."""
    span = events.agg(
        F.min(F.to_date("ts")).alias("lo"),
        F.max(F.to_date("ts")).alias("hi"),
    ).select(
        "hi",
        F.date_add(
            "lo",
            F.expr(f"CAST(datediff(hi, lo) * {watermark_tenths} DIV 10 AS INT)"),
        ).alias("wm"),
    )
    offsets = F.sequence(
        F.lit(1), F.greatest(F.expr("datediff(hi, wm)"), F.lit(0)), F.lit(chunk_days)
    )
    start = F.date_add("wm", F.col("off"))
    end = F.least(F.date_add("wm", F.col("off") + (chunk_days - 1)), F.col("hi"))
    return (
        span.select("hi", "wm", F.posexplode(offsets).alias("i", "off"))
        .select(
            (F.col("i") + 1).cast("long").alias("run_id"),
            start.alias("start_day"),
            end.alias("end_day"),
            (F.datediff(end, start) + 1).cast("long").alias("n_days"),
        )
        .orderBy("run_id")
    )


def backfill_plan_sql(
    chunk_days: int = CHUNK_DAYS, watermark_tenths: int = WATERMARK_TENTHS
) -> str:
    return f"""
    WITH span AS (
        SELECT MAX(CAST(ts AS DATE)) AS hi,
               MIN(CAST(ts AS DATE))
                 + CAST(datediff('day', MIN(CAST(ts AS DATE)),
                                 MAX(CAST(ts AS DATE)))
                        * {watermark_tenths} // 10 AS INT) AS wm
        FROM events
    ),
    offs AS (
        SELECT hi, wm,
               generate_subscripts(os, 1) AS i, unnest(os) AS off
        FROM (
            SELECT hi, wm,
                   generate_series(1, greatest(datediff('day', wm, hi), 0),
                                   {chunk_days}) AS os
            FROM span
        )
    )
    SELECT CAST(i AS BIGINT) AS run_id,
           wm + CAST(off AS INT) AS start_day,
           least(wm + CAST(off AS INT) + {chunk_days - 1}, hi) AS end_day,
           CAST(datediff('day', wm + CAST(off AS INT),
                         least(wm + CAST(off AS INT) + {chunk_days - 1}, hi)) + 1 AS BIGINT)
               AS n_days
    FROM offs
    ORDER BY run_id
    """
