"""Distributed replacements for the global-window devices.

An unpartitioned Window (``Window.orderBy(...)`` with no partitionBy) puts its
ENTIRE input in one task — fine on a bounded relation (a week spine, a top-k
pool, a per-bucket aggregate), a scale-killer on a data-sized one. Round 7's
mechanical plan gate (tools/plan_audit.py UNBOUNDED_WINDOW) flagged every
operator that ran one over raw rows; these helpers re-express the three global
devices those operators needed so the only unpartitioned windows left run on
aggregates bounded by a value/bucket domain:

* ``kth_smallest``      — exact order-statistic selection (the PSI rank
                          discipline) from per-VALUE counts: the cumulative
                          window runs over the distinct-value aggregate, never
                          the rows.
* ``with_global_row_number`` — exact global row_number via the classic
                          two-level scheme: rank WITHIN a bucket (partitioned
                          window) + the cumulative count of all LOWER buckets
                          (unpartitioned window over the ≤|buckets| aggregate).
                          The bucket expression must be MONOTONE in the leading
                          order key so (bucket, order) == global order.
* ``with_global_running_sum`` — same two-level scheme for cumulative sums
                          (PPS/systematic sampling, Lorenz-style scans).

All three produce values BIT-IDENTICAL to their single-window forms, so
DuckDB oracles written against the naive shape keep certifying them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def kth_smallest(values: DataFrame, value_col: str, k_sql: str) -> DataFrame:
    """1-row relation ``(n, <value_col>)``: the k-th smallest value of
    ``value_col`` (duplicates counted), with ``k`` given as a SQL expression
    over the column ``n`` (the total row count) — e.g. ``"(99 * n + 99) DIV
    100"`` for the ceil-p99 rank. Empty (0 rows) iff k exceeds n, matching
    the row_number() == k selection it replaces.

    Shape: groupBy(value) count (bounded by the value domain, map-side
    combined), ONE cumulative window over that aggregate, broadcast 1-row
    total. No data-sized sort, no single-task window.

    The ``k >= 1`` guard keeps the empty-result contract of the
    ``row_number() == k`` form it replaces: without it, a k_sql evaluating
    to <= 0 would have ``cum >= k`` match every row and return the minimum
    instead of the empty relation."""
    per_v = values.groupBy(value_col).agg(F.count("*").alias("m"))
    cum = per_v.select(
        value_col,
        F.sum("m")
        .over(Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    tot = values.agg(F.count("*").cast("long").alias("n"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .where((F.col("cum") >= F.expr(k_sql)) & (F.expr(k_sql) >= F.lit(1)))
        .groupBy("n")
        .agg(F.min(value_col).alias(value_col))
        .select("n", value_col)
    )


def bucket_prefix(
    df: DataFrame, bucket: Column, agg: Column, alias: str, combine=F.sum
) -> DataFrame:
    """Per-bucket aggregate with the running combination over all STRICTLY
    lower buckets: (bucket_id, <alias>) where alias is NULL for the lowest
    bucket. ``agg`` aggregates within a bucket; ``combine`` (sum for counts /
    running sums, max for skyline dominance) folds the prefix via a window
    over the ≤|buckets| aggregate relation."""
    per_b = df.groupBy(bucket.alias("__bucket")).agg(agg.alias("__b_agg"))
    w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    return per_b.select("__bucket", combine("__b_agg").over(w).alias(alias))


def with_global_row_number(
    df: DataFrame, bucket: Column, order_cols: list[Column], out: str = "rn"
) -> DataFrame:
    """``df`` plus column ``out`` = 1-based row_number over the GLOBAL order
    (bucket, *order_cols) — equal to ``row_number().over(Window.orderBy(
    *order_cols))`` whenever ``bucket`` is monotone in the leading order key.

    Two-level: a partitioned row_number within each bucket plus the total
    count of lower buckets (bounded prefix window + broadcast-able join)."""
    tagged = df.withColumn("__bucket", bucket)
    within = F.row_number().over(
        Window.partitionBy("__bucket").orderBy(*order_cols)
    )
    prefix = bucket_prefix(tagged, F.col("__bucket"), F.count("*"), "__base")
    return (
        tagged.withColumn("__within", within)
        .join(prefix, "__bucket", "left")
        .withColumn(
            out, (F.coalesce(F.col("__base"), F.lit(0)) + F.col("__within"))
        )
        .drop("__bucket", "__within", "__base")
    )


def with_global_running_sum(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    value: Column,
    out: str = "cum",
) -> DataFrame:
    """``df`` plus column ``out`` = inclusive running sum of ``value`` over
    the GLOBAL order (bucket, *order_cols); same two-level scheme as
    with_global_row_number. Exact (integer) as long as ``value`` is."""
    tagged = df.withColumn("__bucket", bucket).withColumn("__v", value)
    within = F.sum("__v").over(
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prefix = bucket_prefix(tagged, F.col("__bucket"), F.sum("__v"), "__base")
    return (
        tagged.withColumn("__within", within)
        .join(prefix, "__bucket", "left")
        .withColumn(
            out, (F.coalesce(F.col("__base"), F.lit(0)) + F.col("__within"))
        )
        .drop("__bucket", "__within", "__v", "__base")
    )


# 60-bit md5_int domain (llm/hashing.md5_int) sharded into 256 monotone
# buckets: the high 8 bits. A shift (not float division — 60-bit values lose
# ulps in a double) keeps bucket order == md5 order.
MD5_BUCKET_SHIFT = 52


def md5_bucket(md5_col: Column) -> Column:
    return F.shiftright(md5_col, MD5_BUCKET_SHIFT)
