"""Deterministic dataset splitting and sampling for training pipelines.

Every training pipeline needs (a) a stable train/val/test assignment that
never changes when the corpus is re-ingested or re-partitioned, and (b)
stratified subsampling that preserves group composition. Both are expressed
here as pure hash arithmetic over the key column — no RNG, no
``df.sample()`` (whose output depends on partitioning and seed plumbing),
so the same row always lands in the same split on any cluster layout, and a
DuckDB oracle can reproduce the assignment exactly.

Scale shape: split assignment is a narrow projection (zero shuffles);
stratified sampling is one window over the stratum key — the standard
per-group top-k shuffle, bounded by the stratum count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_int, md5_int_sql

# (name, cumulative upper bound in percent) — 80/10/10 by default
DEFAULT_SPLITS = (("train", 80), ("val", 90), ("test", 100))
SPLIT_BUCKETS = 100


def split_assign(
    docs: DataFrame,
    key: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
) -> DataFrame:
    """Assign each row to a named split by its key's md5 bucket (0-99).

    Content-stable: the assignment depends only on the key value, so
    re-ingestion, repartitioning, or incremental appends never move a row
    across splits (no training-set contamination of the held-out sets).
    Narrow projection — zero shuffles at any scale."""
    bucket = md5_int(F.col(key).cast("string")) % SPLIT_BUCKETS
    expr = None
    for name, hi in splits:
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.select(
        F.col(key), bucket.cast("int").alias("bucket"), expr.alias("split")
    ).orderBy(key)


def split_assign_sql(
    key: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    rel: str = "documents",
) -> str:
    bucket = f"({md5_int_sql(f'CAST({key} AS VARCHAR)')} % {SPLIT_BUCKETS})"
    cases = "\n                 ".join(
        f"WHEN {bucket} < {hi} THEN '{name}'" for name, hi in splits
    )
    return f"""
        SELECT {key},
               CAST({bucket} AS INT) AS bucket,
               CASE {cases} END AS split
        FROM {rel}
        ORDER BY {key}
    """


def stratified_sample(
    docs: DataFrame,
    stratum: str = "source",
    fraction_pct: int = 10,
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: within each stratum, rows are ranked
    by their key's md5 (a stable pseudo-random order) and the top
    ``ceil(pct% * |stratum|)`` are kept — every stratum contributes its exact
    proportional share, unlike Bernoulli sampling whose per-group counts
    fluctuate. The quota is INTEGER arithmetic ((n*pct + 99) div 100): float
    ceil(n * 0.1) differs between engines at representation boundaries.

    One shuffle on the stratum key (the rank window); the per-stratum count
    rides the same window (count over the unbounded frame), so no second
    aggregation pass."""
    w = Window.partitionBy(stratum)
    wo = w.orderBy(md5_int(F.col(key).cast("string")).asc(), F.col(key).asc())
    return (
        docs.select(
            F.col(key),
            F.col(stratum),
            F.row_number().over(wo).alias("rn"),
            F.count("*").over(w).alias("n_stratum"),
        )
        .where(F.col("rn") <= F.expr(f"(n_stratum * {fraction_pct} + 99) div 100"))
        .select(key, stratum, F.col("rn").cast("int").alias("sample_rank"))
        .orderBy(stratum, "sample_rank")
    )


def stratified_sample_sql(
    stratum: str = "source",
    fraction_pct: int = 10,
    key: str = "doc_id",
    rel: str = "documents",
) -> str:
    h = md5_int_sql(f"CAST({key} AS VARCHAR)")
    return f"""
        SELECT {key}, {stratum}, CAST(rn AS INT) AS sample_rank
        FROM (
            SELECT {key}, {stratum},
                   row_number() OVER (
                       PARTITION BY {stratum} ORDER BY {h} ASC, {key} ASC
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY {stratum}) AS n_stratum
            FROM {rel}
        )
        WHERE rn <= (n_stratum * {fraction_pct} + 99) // 100
        ORDER BY {stratum}, sample_rank
    """
