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


def cm_join_size_estimate(
    events: DataFrame,
    type_a: str = "click",
    type_b: str = "purchase",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Equi-join cardinality estimation from two Count-Min sketches (the
    AMS-style inner-product estimate): |A ⋈_k B| = Σ_k f_A(k)·f_B(k), and the
    row-wise dot product of two CM rows overestimates exactly that — take the
    MIN over the d rows. The planner-side use: estimate a join's output size
    from two 8 KB summaries without touching either table.

    Both sketches build from one conditional pass over events (shared scan);
    the dot product is a ≤ d·w-row join keyed (row, col); the exact answer —
    a full key-frequency join — rides along for the accuracy report.
    One-sided error (estimate ≥ exact) is pinned by a property test."""
    cells_a = (
        events.where(F.col("event_type") == type_a)
        .select(F.explode(_cells(F.col("user_id"), depth, width)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("n_a"))
    )
    cells_b = (
        events.where(F.col("event_type") == type_b)
        .select(F.explode(_cells(F.col("user_id"), depth, width)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("n_b"))
    )
    est = (
        cells_a.join(cells_b, ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("n_a") * F.col("n_b")).alias("dot"))
        .agg(F.min("dot").alias("cm_join_size"))
    )
    fa = (
        events.where(F.col("event_type") == type_a)
        .groupBy("user_id")
        .agg(F.count("*").alias("fa"))
    )
    fb = (
        events.where(F.col("event_type") == type_b)
        .groupBy("user_id")
        .agg(F.count("*").alias("fb"))
    )
    exact = fa.join(fb, "user_id").agg(
        F.sum(F.col("fa") * F.col("fb")).alias("exact_join_size")
    )
    return est.crossJoin(exact).select("cm_join_size", "exact_join_size")


def cm_join_size_estimate_sql(
    type_a: str = "click",
    type_b: str = "purchase",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> str:
    from ..llm.hashing import HASH_P, md5_int_sql, universal_hash_sql, universal_params

    h = f"({md5_int_sql('CAST(user_id AS VARCHAR)')} % {HASH_P})"

    def cells(tname: str) -> str:
        arms = " UNION ALL ".join(
            f"SELECT {i} AS row, ({universal_hash_sql('h', a, b)} % {width}) AS col "
            f"FROM hashed_{tname}"
            for i, (a, b) in enumerate(universal_params(depth))
        )
        return arms

    return f"""
        WITH hashed_a AS (
            SELECT {h} AS h FROM events WHERE event_type = '{type_a}'
        ), hashed_b AS (
            SELECT {h} AS h FROM events WHERE event_type = '{type_b}'
        ), cells_a AS (
            SELECT row, col, COUNT(*) AS n_a FROM ({cells('a')}) GROUP BY row, col
        ), cells_b AS (
            SELECT row, col, COUNT(*) AS n_b FROM ({cells('b')}) GROUP BY row, col
        ), est AS (
            SELECT CAST(MIN(dot) AS BIGINT) AS cm_join_size FROM (
                SELECT row, SUM(n_a * n_b) AS dot
                FROM cells_a JOIN cells_b USING (row, col)
                GROUP BY row
            )
        ), exact AS (
            SELECT CAST(SUM(fa * fb) AS BIGINT) AS exact_join_size FROM (
                SELECT user_id, COUNT(*) AS fa FROM events
                WHERE event_type = '{type_a}' GROUP BY user_id
            ) a JOIN (
                SELECT user_id, COUNT(*) AS fb FROM events
                WHERE event_type = '{type_b}' GROUP BY user_id
            ) b USING (user_id)
        )
        SELECT cm_join_size, exact_join_size FROM est CROSS JOIN exact
    """
