"""Stream-static enrichment join: a streaming fact joined to a slow-changing
dimension.

The canonical streaming pattern the other modules don't cover: stream-static
joins are STATELESS (each microbatch joins against the current static
snapshot — no watermark, no join buffer), and with a small dimension the
join is a broadcast, so enrichment costs zero shuffle on the stream side at
any rate. The batch twin runs the identical join through the batch planner
and is the DuckDB-oracle-checked form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import events_stream

# (event_type, category, weight): the static dimension. Inline constants so
# Spark and the oracle derive from the same literal table.
EVENT_CATEGORIES: tuple[tuple[str, str, float], ...] = (
    ("click", "engagement", 1.0),
    ("view", "engagement", 0.5),
    ("purchase", "conversion", 5.0),
    ("signup", "conversion", 3.0),
    ("error", "ops", 0.0),
)


def category_dim(spark: SparkSession) -> DataFrame:
    # inline VALUES relation, not createDataFrame: the dim is 5 literal rows,
    # and a Python->JVM serialization roundtrip per call was the dominant cost
    # of this otherwise sub-second query (r3->r4 bench regression re-measure)
    rows = ", ".join(
        f"('{t}', '{c}', CAST({w} AS DOUBLE))" for t, c, w in EVENT_CATEGORIES
    )
    return spark.sql(
        f"SELECT * FROM (VALUES {rows}) AS t(event_type, category, weight)"
    )


def enrich_events(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Inner join to the category dim + derived weighted value."""
    return events.join(F.broadcast(dim), "event_type").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "category",
        F.round(F.col("value") * F.col("weight"), 6).alias("weighted_value"),
    )


def enriched_events_batch(events: DataFrame) -> DataFrame:
    return enrich_events(events, category_dim(events.sparkSession)).orderBy(
        "event_id"
    )


def streaming_enriched_events(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming form: stateless stream-static broadcast join, append-safe."""
    return enrich_events(events_stream(spark, events_path), category_dim(spark))


def enriched_events_sql() -> str:
    values = ", ".join(f"('{t}', '{c}', {w})" for t, c, w in EVENT_CATEGORIES)
    return f"""
        WITH dim(event_type, category, weight) AS (VALUES {values})
        SELECT event_id, user_id, ts, e.event_type, category,
               round(value * weight, 6) AS weighted_value
        FROM events e JOIN dim USING (event_type)
        ORDER BY event_id
    """
