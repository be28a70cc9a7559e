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

from pyspark.sql import DataFrame, Window
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


# --- AMS F2 (second frequency moment) sketch ------------------------------------------

AMS_SKETCHES = 16
AMS_GROUPS = 4


def ams_f2(events: DataFrame) -> DataFrame:
    """AMS tug-of-war sketch (Alon-Matias-Szegedy, STOC'96) for F₂ — the
    second frequency moment of the per-user event counts, aka the
    self-join size: {AMS_SKETCHES} independent ±1 signings of the
    frequency vector, squared, averaged in {AMS_GROUPS} groups and
    median-combined — the sketch whose 4-wise-independent variance bound
    started the streaming-algorithms literature (the CM sketch (L-84)
    bounds point queries; AMS bounds the quadratic aggregate itself).

    Signs come from the md5 universal family, so every sketch is an exact
    BIGINT sum; the estimate (median of group means) and the exact F₂ sit
    side by side with the relative error in milli. One row: (n_users,
    f2_exact, f2_estimate, rel_err_milli)."""
    per_user = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("f")
    )
    hp = md5_int(F.col("user_id").cast("string")) % F.lit(HASH_P)
    signed = per_user.select(
        "f",
        hp.alias("h"),
        *[
            (F.lit(1) - 2 * (universal_hash(hp, a, b) % 2)).alias(f"s{r}")
            for r, (a, b) in enumerate(universal_params(AMS_SKETCHES))
        ],
    )
    agg = signed.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.col("f") * F.col("f")).alias("f2_exact"),
        *[
            F.sum(F.col(f"s{r}") * F.col("f")).alias(f"z{r}")
            for r in range(AMS_SKETCHES)
        ],
    )
    per_group = AMS_SKETCHES // AMS_GROUPS
    means = [
        F.expr(
            "CAST(("
            + " + ".join(
                f"z{g * per_group + i} * z{g * per_group + i}"
                for i in range(per_group)
            )
            + f") DIV {per_group} AS BIGINT)"
        ).alias(f"m{g}")
        for g in range(AMS_GROUPS)
    ]
    with_means = agg.select("n_users", "f2_exact", *means)
    marr = F.array_sort(F.array(*[F.col(f"m{g}") for g in range(AMS_GROUPS)]))
    # Spark [] is 0-based (DuckDB's is 1-based): middle two of 4 are [1],[2]
    est = F.expr("CAST((sorted_m[1] + sorted_m[2]) DIV 2 AS BIGINT)")
    return (
        with_means.withColumn("sorted_m", marr)
        .select(
            "n_users",
            "f2_exact",
            est.alias("f2_estimate"),
            F.expr(
                "CAST((2 * 1000 * abs(CAST((sorted_m[1] + sorted_m[2]) DIV 2"
                " AS BIGINT) - f2_exact) + f2_exact) DIV (2 * f2_exact)"
                " AS BIGINT)"
            ).alias("rel_err_milli"),
        )
    )


def ams_f2_sql() -> str:
    hp = f"({md5_int_sql('CAST(user_id AS VARCHAR)')} % {HASH_P})"
    params = universal_params(AMS_SKETCHES)
    sign_cols = ", ".join(
        f"(1 - 2 * ({universal_hash_sql('h', a, b)} % 2)) AS s{r}"
        for r, (a, b) in enumerate(params)
    )
    z_cols = ", ".join(
        f"CAST(SUM(s{r} * f) AS BIGINT) AS z{r}" for r in range(AMS_SKETCHES)
    )
    per_group = AMS_SKETCHES // AMS_GROUPS
    mean_cols = ", ".join(
        "CAST(("
        + " + ".join(
            f"z{g * per_group + i} * z{g * per_group + i}"
            for i in range(per_group)
        )
        + f") // {per_group} AS BIGINT) AS m{g}"
        for g in range(AMS_GROUPS)
    )
    mlist = ", ".join(f"m{g}" for g in range(AMS_GROUPS))
    return f"""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
        FROM events GROUP BY user_id
    ),
    hashed AS (
        SELECT f, {hp} AS h FROM per_user
    ),
    signed AS (
        SELECT f, {sign_cols} FROM hashed
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(f * f) AS BIGINT) AS f2_exact,
               {z_cols}
        FROM signed
    ),
    grouped AS (
        SELECT n_users, f2_exact, {mean_cols} FROM agg
    ),
    est AS (
        SELECT n_users, f2_exact,
               list_sort([{mlist}]) AS sorted_m
        FROM grouped
    )
    SELECT n_users, f2_exact,
           CAST((sorted_m[2] + sorted_m[3]) // 2 AS BIGINT) AS f2_estimate,
           CAST((2 * 1000 * abs(CAST((sorted_m[2] + sorted_m[3]) // 2
               AS BIGINT) - f2_exact) + f2_exact) // (2 * f2_exact)
               AS BIGINT) AS rel_err_milli
    FROM est
    """


# --- mergeable heavy-hitter summaries (Misra-Gries style) -----------------------------

MG_K = 8
MG_TOP = 10


def heavy_hitters_mg(
    events: DataFrame, k: int = MG_K, top: int = MG_TOP
) -> DataFrame:
    """Mergeable heavy-hitter summaries with deterministic error bounds:
    each day keeps only its top-``k`` users (the Misra-Gries/SpaceSaving
    memory contract) plus one residual cap — the largest UNTRACKED count
    that day; merging the per-day summaries yields, for every candidate, a
    lower bound (tracked mass) and an upper bound (tracked mass + caps of
    the days that dropped it). The practical distributed frequent-items
    recipe — and because the fixture also has the exact counts, the
    guarantee lb ≤ exact ≤ ub is CERTIFIED per row rather than assumed.

    All counts/caps/bounds are exact BIGINTs; per-day windows partition by
    day. Output: top-``top`` candidates by lower bound (user_id,
    n_days_tracked, lb, ub, exact, within_bounds)."""
    day_counts = events.groupBy(
        F.to_date("ts").alias("day"), "user_id"
    ).agg(F.count("*").cast("long").alias("cnt"))
    w_day = Window.partitionBy("day").orderBy(
        F.col("cnt").desc(), F.col("user_id").asc()
    )
    ranked = day_counts.withColumn("rnk", F.row_number().over(w_day))
    tracked = ranked.where(F.col("rnk") <= k)
    caps = (
        ranked.groupBy("day")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("rnk") == k + 1, F.col("cnt"))),
                F.lit(0),
            ).alias("cap")
        )
    )
    total_caps = caps.agg(F.sum("cap").alias("all_caps"))
    cand = tracked.join(caps, "day").groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_days_tracked"),
        F.sum("cnt").alias("lb"),
        F.sum("cap").alias("caps_while_tracked"),
    )
    exact = day_counts.groupBy("user_id").agg(F.sum("cnt").alias("exact"))
    w_top = Window.orderBy(F.col("lb").desc(), F.col("user_id").asc())
    return (
        cand.crossJoin(F.broadcast(total_caps))
        .join(exact, "user_id")
        .select(
            "user_id",
            "n_days_tracked",
            "lb",
            (
                F.col("lb") + F.col("all_caps") - F.col("caps_while_tracked")
            ).alias("ub"),
            "exact",
        )
        .withColumn(
            "within_bounds",
            (
                (F.col("lb") <= F.col("exact"))
                & (F.col("exact") <= F.col("ub"))
            ).cast("int"),
        )
        .withColumn("rnk", F.row_number().over(w_top).cast("int"))
        .where(F.col("rnk") <= top)
        .select(
            "rnk", "user_id", "n_days_tracked", "lb", "ub", "exact",
            "within_bounds",
        )
        .orderBy("rnk")
    )


def heavy_hitters_mg_sql(k: int = MG_K, top: int = MG_TOP) -> str:
    return f"""
    WITH day_counts AS (
        SELECT CAST(ts AS DATE) AS day, user_id,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY day ORDER BY cnt DESC, user_id ASC
        ) AS rnk
        FROM day_counts
    ),
    tracked AS (SELECT * FROM ranked WHERE rnk <= {k}),
    caps AS (
        SELECT day,
               CAST(COALESCE(MAX(CASE WHEN rnk = {k} + 1 THEN cnt END), 0)
                    AS BIGINT) AS cap
        FROM ranked GROUP BY day
    ),
    total_caps AS (SELECT CAST(SUM(cap) AS BIGINT) AS all_caps FROM caps),
    cand AS (
        SELECT t.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_days_tracked,
               CAST(SUM(t.cnt) AS BIGINT) AS lb,
               CAST(SUM(c.cap) AS BIGINT) AS caps_while_tracked
        FROM tracked t JOIN caps c USING (day)
        GROUP BY t.user_id
    ),
    exact AS (
        SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS exact
        FROM day_counts GROUP BY user_id
    )
    SELECT CAST(row_number() OVER (ORDER BY cd.lb DESC, cd.user_id ASC)
                AS INTEGER) AS rnk,
           cd.user_id, cd.n_days_tracked, cd.lb,
           cd.lb + tc.all_caps - cd.caps_while_tracked AS ub,
           e.exact,
           CAST(CASE WHEN cd.lb <= e.exact
                      AND e.exact <= cd.lb + tc.all_caps
                          - cd.caps_while_tracked
                THEN 1 ELSE 0 END AS INTEGER) AS within_bounds
    FROM cand cd
    CROSS JOIN total_caps tc
    JOIN exact e USING (user_id)
    QUALIFY rnk <= {top}
    ORDER BY rnk
    """
