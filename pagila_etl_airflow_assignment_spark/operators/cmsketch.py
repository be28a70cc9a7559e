"""Count-Min sketch: fixed-size frequency summary with one-sided error.

The mergeable at-scale companion to exact frequency counting: d×w counters
(here 4×256 = 8 KB of longs) absorb any number of increments, cells are
map-side combinable, and sketches from different partitions/days merge by
cell-wise addition — the same reason the engine carries HLL/KLL sketches
(events_approx_sketches). Unlike Spark's opaque built-in sketch blobs, this
sketch is built from the cross-engine md5 universal-hash family
(llm/hashing.py), so every cell — and every point-query estimate — is
deterministic and oracle-checkable in DuckDB.

Scale shape: the build is one explode(×d) + one (row, col)-keyed aggregate
over ≤ d·w cells; the estimate pass joins the d cells per key (broadcast
sketch — it is 8 KB BY CONSTRUCTION) and takes the row-wise MIN. The
one-sided guarantee (estimate ≥ true count) is pinned by a property test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llm.hashing import (
    HASH_P,
    md5_int,
    md5_int_sql,
    universal_hash,
    universal_hash_sql,
    universal_params,
)

CM_DEPTH = 4
CM_WIDTH = 256
CM_TOP_K = 20


def _cells(key_col, depth: int, width: int):
    """Array of (row, col) structs for one key — the d cell coordinates."""
    h = md5_int(key_col.cast("string")) % F.lit(HASH_P)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (universal_hash(h, a, b) % F.lit(width)).alias("col"),
            )
            for i, (a, b) in enumerate(universal_params(depth))
        ]
    )


def cm_build(events: DataFrame, depth: int = CM_DEPTH, width: int = CM_WIDTH) -> DataFrame:
    """The sketch itself in long form: (row, col, n) for every touched cell."""
    return (
        events.select(F.explode(_cells(F.col("user_id"), depth, width)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("n"))
        .orderBy("row", "col")
    )


def cm_build_sql(depth: int = CM_DEPTH, width: int = CM_WIDTH) -> str:
    h = f"({md5_int_sql('CAST(user_id AS VARCHAR)')} % {HASH_P})"
    arms = " UNION ALL ".join(
        f"SELECT {i} AS row, ({universal_hash_sql('h', a, b)} % {width}) AS col "
        f"FROM hashed"
        for i, (a, b) in enumerate(universal_params(depth))
    )
    return f"""
        WITH hashed AS (SELECT {h} AS h FROM events),
        cells AS ({arms})
        SELECT row, col, COUNT(*) AS n
        FROM cells
        GROUP BY row, col
        ORDER BY row, col
    """


def cm_estimate_topk(
    events: DataFrame,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    k: int = CM_TOP_K,
) -> DataFrame:
    """Top-k users by TRUE event count alongside their CM estimate — the
    sketch-accuracy report (estimate ≥ true always; the gap is the collision
    error bounded by e·N/w per row, minimized over d rows)."""
    sketch = cm_build(events, depth, width)
    truth = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("true_n"))
        .orderBy(F.desc("true_n"), "user_id")
        .limit(k)
    )
    probes = truth.select(
        "user_id",
        "true_n",
        F.explode(_cells(F.col("user_id"), depth, width)).alias("c"),
    ).select("user_id", "true_n", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("user_id", "true_n")
        .agg(F.min("n").alias("cm_estimate"))
        .orderBy(F.desc("true_n"), "user_id")
    )


def cm_estimate_topk_sql(
    depth: int = CM_DEPTH, width: int = CM_WIDTH, k: int = CM_TOP_K
) -> str:
    h = f"({md5_int_sql('CAST(user_id AS VARCHAR)')} % {HASH_P})"
    arms = " UNION ALL ".join(
        f"SELECT user_id, true_n, {i} AS row, "
        f"({universal_hash_sql('h', a, b)} % {width}) AS col FROM hashed"
        for i, (a, b) in enumerate(universal_params(depth))
    )
    return f"""
        WITH sketch AS ({cm_build_sql(depth, width)}),
        truth AS (
            SELECT user_id, COUNT(*) AS true_n
            FROM events GROUP BY user_id
            ORDER BY true_n DESC, user_id LIMIT {k}
        ),
        hashed AS (SELECT user_id, true_n, {h} AS h FROM truth),
        probes AS ({arms})
        SELECT user_id, true_n, MIN(n) AS cm_estimate
        FROM probes JOIN sketch USING (row, col)
        GROUP BY user_id, true_n
        ORDER BY true_n DESC, user_id
    """
