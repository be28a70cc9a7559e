"""One-pass table profiling: per-column null/distinct/min/max statistics.

The data-quality surface every warehouse ships (DESCRIBE ... STATISTICS,
dbt-style column profiles): long-format per-column stats computed in a
SINGLE aggregation over the table, not one job per column.

Scale notes: all per-column aggregates ride one scan. The exact
COUNT(DISTINCT) set makes Spark plan an Expand (one input row per distinct
aggregate) before the partial aggregation — a deliberate cost multiplier of
x|columns| on the map side that buys exactness; at 100 TB swap
``approx_count_distinct`` into the same shape for a sketch-sized shuffle
(engine-specific HLL, so the exact form is what the DuckDB oracle checks —
same split as events_approx_sketches). Min/max/null-counts are plain
map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(col_name, n_nulls, n_distinct, min_value, max_value) per column,
    min/max serialized to strings so heterogeneous columns share a schema."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return (
        df.agg(*aggs)
        .select(
            F.expr(
                f"stack({len(cols)}, {stacked}) AS "
                "(col_name, n_nulls, n_distinct, min_value, max_value)"
            )
        )
        .orderBy("col_name")
    )


def profile_table_sql(columns: list[str], rel: str) -> str:
    parts = [
        f"""SELECT '{c}' AS col_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM {rel}"""
        for c in columns
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"
