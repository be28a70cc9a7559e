"""Mergeable quantile sketches with the exact-oracle discipline.

Completes the sketch family (hll.py, cmsketch.py, KMV in analytics) with the
two standard mergeable QUANTILE summaries an observability pipeline ships to
a coordinator instead of raw values:

- a deterministic t-digest (Dunning's asin scale function k1): per-partition
  digests of bounded size merge associatively, and quantile queries read the
  merged centroid CDF. The classic t-digest seeds clusters from arrival
  order; this build replaces that nondeterminism with the value-grid CDF so
  the same data always yields the same digest — bit-stable across engines,
  which is what lets a DuckDB oracle re-derive it exactly.
- a moments sketch (power sums S1..S4): the minimal mergeable state (raw
  power sums add across partitions) from which Chebyshev tail bounds follow
  in closed form; the report checks the bounds against the TRUE exceedance.

Both quantize before summing per the house exactness rules; the only
transcendental is asin inside the scale function, evaluated on exact-integer
rationals and floored far from its integer boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TDIGEST_DELTA = 32  # centroid budget per digest
TDIGEST_PROBES = (1, 5, 25, 50, 75, 95, 99)  # percentiles to query

# scale-function bucket: k1(q) = delta * (asin(2q-1)/pi + 1/2), with
# q_mid = (cum - m/2)/n expressed as the exact rational (2*cum - m - n)/n
_SCALE = (
    "least(greatest(CAST(floor({d} * (asin((2 * {cum} - {m} - {n})"
    " / CAST({n} AS DOUBLE)) / pi() + 0.5)) AS BIGINT), 0), {dm1})"
)


def tdigest_merge_report(events: DataFrame) -> DataFrame:
    """Build one t-digest PER DAY, merge the 30 day-digests into a global
    digest, query it at 7 percentiles, and score each estimate against the
    exact lower weighted quantile: rows (p_pct, n_centroids, est_mcenti,
    exact_mcenti, err_mcenti) ordered by p_pct.

    The merge is the point: day digests are what 1000 executors would emit
    (bounded size, associative merge); the global digest re-runs the SAME
    scale-function clustering over centroid means weighted by centroid
    mass — t-digest's merge rule — so accuracy degrades gracefully instead
    of collapsing. Estimates use the lower-centroid rule (first centroid
    whose cumulative weight reaches p% of N), matching the exact side's
    lower weighted quantile so err measures SKETCH error, not rule skew.

    Exactness: value grid is centi-exact; per-centroid means quantize to
    milli-centi (round(1000*sum_c/w)) before the merge's weighted re-mean;
    cumulative weights are exact BIGINTs; asin operates on exact-integer
    rationals and its floor is taken ~delta/2pi from integer boundaries.

    Scale shape: one (day, value) grid aggregate; cumulative windows only
    over bounded grids (per-day value grid partitioned by day; the <=
    30*delta merged-centroid grid; the global value grid for the exact
    answer — the oracle-side cost a production run would not pay); quantile
    probes are a 7-row literal grid joined against <= delta centroids."""
    d = TDIGEST_DELTA
    grid = (
        events.where(F.col("value").isNotNull())
        .groupBy(
            F.to_date("ts").alias("day"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
        )
        .agg(F.count("*").cast("long").alias("m"))
    )
    wday = Window.partitionBy("day").orderBy("c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    day_cent = (
        grid.select(
            "day",
            "c",
            "m",
            F.sum("m").over(wday).cast("long").alias("cum"),
            F.sum("m").over(Window.partitionBy("day")).cast("long").alias("n"),
        )
        .select(
            "day",
            "c",
            "m",
            F.expr(_SCALE.format(d=d, cum="cum", m="m", n="n", dm1=d - 1)).alias(
                "cid"
            ),
        )
        .groupBy("day", "cid")
        .agg(
            F.sum("m").cast("long").alias("w"),
            F.expr("CAST(round(1000.0 * SUM(m * c) / SUM(m)) AS BIGINT)").alias(
                "mean_mc"
            ),
        )
    )
    # merge: re-cluster centroid means (weighted) through the same scale fn
    wall = Window.orderBy("mean_mc", "day", "cid").rowsBetween(
        Window.unboundedPreceding, 0
    )
    merged = (
        day_cent.select(
            "day",
            "cid",
            "w",
            "mean_mc",
            F.sum("w").over(wall).cast("long").alias("cumw"),
            F.sum("w").over(Window.partitionBy(F.lit(1))).cast("long").alias("tw"),
        )
        .select(
            "w",
            "mean_mc",
            "tw",
            F.expr(
                _SCALE.format(d=d, cum="cumw", m="w", n="tw", dm1=d - 1)
            ).alias("gid"),
        )
        .groupBy("gid")
        .agg(
            F.sum("w").cast("long").alias("w"),
            F.expr(
                "CAST(round(1.0 * SUM(w * mean_mc) / SUM(w)) AS BIGINT)"
            ).alias("mean_mc"),
            F.first("tw").alias("tw"),
        )
    )
    probes = events.sparkSession.createDataFrame(
        [(p,) for p in TDIGEST_PROBES], "p_pct int"
    )
    wg = Window.orderBy("gid").rowsBetween(Window.unboundedPreceding, 0)
    est = (
        merged.select(
            "gid",
            "mean_mc",
            "tw",
            F.sum("w").over(wg).cast("long").alias("cumw"),
            F.count("*").over(Window.partitionBy(F.lit(1))).alias("n_centroids"),
        )
        .crossJoin(F.broadcast(probes))
        .where(100 * F.col("cumw") >= F.col("p_pct") * F.col("tw"))
        .groupBy("p_pct")
        .agg(
            F.min_by("mean_mc", "gid").alias("est_mcenti"),
            F.first("n_centroids").alias("n_centroids"),
        )
    )
    # exact lower weighted quantile on the global value grid
    gall = grid.groupBy("c").agg(F.sum("m").cast("long").alias("m"))
    wc = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    exact = (
        gall.select(
            "c",
            F.sum("m").over(wc).cast("long").alias("cum"),
            F.sum("m").over(Window.partitionBy(F.lit(1))).cast("long").alias("n"),
        )
        .crossJoin(F.broadcast(probes))
        .where(100 * F.col("cum") >= F.col("p_pct") * F.col("n"))
        .groupBy("p_pct")
        .agg((1000 * F.min("c")).alias("exact_mcenti"))
    )
    return (
        est.join(exact, "p_pct")
        .select(
            "p_pct",
            "n_centroids",
            "est_mcenti",
            "exact_mcenti",
            (F.col("est_mcenti") - F.col("exact_mcenti")).alias("err_mcenti"),
        )
        .orderBy("p_pct")
    )


def tdigest_merge_report_sql() -> str:
    d = TDIGEST_DELTA
    scale_day = _SCALE.format(d=d, cum="cum", m="m", n="n", dm1=d - 1)
    scale_merge = _SCALE.format(d=d, cum="cumw", m="w", n="tw", dm1=d - 1)
    probes = ", ".join(f"({p})" for p in TDIGEST_PROBES)
    return f"""
        WITH grid AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        daycum AS (
            SELECT day, c, m,
                   SUM(m) OVER (PARTITION BY day ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   SUM(m) OVER (PARTITION BY day) AS n
            FROM grid
        ),
        day_cent AS (
            SELECT day, {scale_day} AS cid,
                   CAST(SUM(m) AS BIGINT) AS w,
                   CAST(round(1000.0 * SUM(m * c) / SUM(m)) AS BIGINT) AS mean_mc
            FROM daycum
            GROUP BY day, cid
        ),
        mergecum AS (
            SELECT w, mean_mc,
                   SUM(w) OVER (ORDER BY mean_mc, day, cid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
                   SUM(w) OVER () AS tw
            FROM day_cent
        ),
        merged AS (
            SELECT {scale_merge} AS gid,
                   CAST(SUM(w) AS BIGINT) AS w,
                   CAST(round(1.0 * SUM(w * mean_mc) / SUM(w)) AS BIGINT)
                       AS mean_mc,
                   MIN(tw) AS tw
            FROM mergecum
            GROUP BY gid
        ),
        gcum AS (
            SELECT gid, mean_mc, tw,
                   SUM(w) OVER (ORDER BY gid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
                   COUNT(*) OVER () AS n_centroids
            FROM merged
        ),
        probes(p_pct) AS (VALUES {probes}),
        est AS (
            SELECT p_pct,
                   MIN_BY(mean_mc, gid) AS est_mcenti,
                   MIN(n_centroids) AS n_centroids
            FROM gcum CROSS JOIN probes
            WHERE 100 * cumw >= p_pct * tw
            GROUP BY p_pct
        ),
        gall AS (
            SELECT c, CAST(SUM(m) AS BIGINT) AS m FROM grid GROUP BY c
        ),
        exact AS (
            SELECT p_pct, 1000 * MIN(c) AS exact_mcenti
            FROM (
                SELECT c,
                       SUM(m) OVER (ORDER BY c
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS cum,
                       SUM(m) OVER () AS n
                FROM gall
            ) CROSS JOIN probes
            WHERE 100 * cum >= p_pct * n
            GROUP BY p_pct
        )
        SELECT est.p_pct,
               CAST(n_centroids AS BIGINT) AS n_centroids,
               est_mcenti, exact_mcenti,
               est_mcenti - exact_mcenti AS err_mcenti
        FROM est JOIN exact ON est.p_pct = exact.p_pct
        ORDER BY est.p_pct
    """


# --- moments sketch: mergeable power sums + Chebyshev tail bounds -------------

MOMENT_DEVIATIONS = (5000, 10000, 20000)  # centi deviations: 50, 100, 200 units


def moments_tail_bounds(events: DataFrame) -> DataFrame:
    """Moments-sketch tail report per event_type: from the four mergeable
    power sums S1..S4 (the sketch state — raw power sums add across
    partitions, which is the whole trick), compute the 2nd- and 4th-moment
    Chebyshev bounds on P(|X - mu| >= d) at three deviation levels and
    check them against the TRUE exceedance: rows (event_type, d_centi, n,
    cheb2_micro, cheb4_micro, true_micro, bound_holds).

    cheb2 = sigma^2/d^2; cheb4 = mu4/d^4 with the central fourth moment
    mu4 = (S4 - 4*mu*S3 + 6*mu^2*S2 - 3*n*mu^4)/n — tighter in the far tail,
    looser near the shoulder, which the three d levels make visible.

    Exactness: the value grid is centi-exact; S2..S4 accumulate in
    decimal(38,0) (c^4 alone can reach ~5.8e18, past BIGINT under a row
    multiplier); mu and the bounds are one double chain at the bounded
    (type, d) boundary, quantized to micro. The true exceedance re-counts
    the grid against the exact-sum-derived threshold, so both engines
    compare identical doubles.

    Scale shape: one (type, value) grid aggregate feeding both the 5-row
    moments table and (via broadcast of that table) the exceedance
    re-count; the d levels are a 3-row literal grid."""
    grid = (
        events.where(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
        )
        .agg(F.count("*").cast("long").alias("m"))
    )
    dec = "decimal(38,0)"
    stats = grid.groupBy("event_type").agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("m") * F.col("c")).cast(dec).alias("s1"),
        F.sum(F.col("m") * F.col("c").cast(dec) * F.col("c")).cast(dec).alias("s2"),
        F.sum(
            F.col("m") * F.col("c").cast(dec) * F.col("c") * F.col("c")
        )
        .cast(dec)
        .alias("s3"),
        F.sum(
            F.col("m")
            * F.col("c").cast(dec)
            * F.col("c")
            * F.col("c")
            * F.col("c")
        )
        .cast(dec)
        .alias("s4"),
    )
    devs = events.sparkSession.createDataFrame(
        [(d,) for d in MOMENT_DEVIATIONS], "d_centi long"
    )
    bounds = stats.crossJoin(F.broadcast(devs)).select(
        "event_type",
        "d_centi",
        "n",
        F.expr("CAST(s1 AS DOUBLE) / n").alias("mu"),
        F.expr(
            "CAST(round(1e6 * least(1.0,"
            " (CAST(s2 AS DOUBLE) / n - pow(CAST(s1 AS DOUBLE) / n, 2))"
            " / (CAST(d_centi AS DOUBLE) * d_centi))) AS BIGINT)"
        ).alias("cheb2_micro"),
        F.expr(
            "CAST(round(1e6 * least(1.0,"
            " ((CAST(s4 AS DOUBLE)"
            "   - 4 * (CAST(s1 AS DOUBLE) / n) * CAST(s3 AS DOUBLE)"
            "   + 6 * pow(CAST(s1 AS DOUBLE) / n, 2) * CAST(s2 AS DOUBLE)"
            "   - 3 * n * pow(CAST(s1 AS DOUBLE) / n, 4)) / n)"
            " / pow(CAST(d_centi AS DOUBLE), 4))) AS BIGINT)"
        ).alias("cheb4_micro"),
    )
    true_ex = (
        grid.join(F.broadcast(bounds.select("event_type", "d_centi", "mu")), "event_type")
        .groupBy("event_type", "d_centi")
        .agg(
            F.expr(
                "CAST(round(1e6 * SUM(CASE WHEN abs(c - mu) >= d_centi"
                " THEN m ELSE 0 END) / SUM(m)) AS BIGINT)"
            ).alias("true_micro")
        )
    )
    return (
        bounds.join(true_ex, ["event_type", "d_centi"])
        .select(
            "event_type",
            "d_centi",
            "n",
            "cheb2_micro",
            "cheb4_micro",
            "true_micro",
            (
                F.col("true_micro")
                <= F.least(F.col("cheb2_micro"), F.col("cheb4_micro"))
            ).alias("bound_holds"),
        )
        .orderBy("event_type", "d_centi")
    )


def moments_tail_bounds_sql() -> str:
    devs = ", ".join(f"({d})" for d in MOMENT_DEVIATIONS)
    return f"""
        WITH grid AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type, CAST(SUM(m) AS BIGINT) AS n,
                   CAST(SUM(m * c) AS HUGEINT) AS s1,
                   CAST(SUM(m * CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
                   CAST(SUM(m * CAST(c AS HUGEINT) * c * c) AS HUGEINT) AS s3,
                   CAST(SUM(m * CAST(c AS HUGEINT) * c * c * c) AS HUGEINT)
                       AS s4
            FROM grid GROUP BY event_type
        ),
        devs(d_centi) AS (VALUES {devs}),
        bounds AS (
            SELECT event_type, CAST(d_centi AS BIGINT) AS d_centi, n,
                   CAST(s1 AS DOUBLE) / n AS mu,
                   CAST(round(1e6 * least(1.0,
                        (CAST(s2 AS DOUBLE) / n
                         - pow(CAST(s1 AS DOUBLE) / n, 2))
                        / (CAST(d_centi AS DOUBLE) * d_centi))) AS BIGINT)
                       AS cheb2_micro,
                   CAST(round(1e6 * least(1.0,
                        ((CAST(s4 AS DOUBLE)
                          - 4 * (CAST(s1 AS DOUBLE) / n) * CAST(s3 AS DOUBLE)
                          + 6 * pow(CAST(s1 AS DOUBLE) / n, 2)
                              * CAST(s2 AS DOUBLE)
                          - 3 * n * pow(CAST(s1 AS DOUBLE) / n, 4)) / n)
                        / pow(CAST(d_centi AS DOUBLE), 4))) AS BIGINT)
                       AS cheb4_micro
            FROM stats CROSS JOIN devs
        ),
        true_ex AS (
            SELECT g.event_type, b.d_centi,
                   CAST(round(1e6 * SUM(CASE WHEN abs(c - mu) >= b.d_centi
                        THEN m ELSE 0 END) / SUM(m)) AS BIGINT) AS true_micro
            FROM grid g JOIN bounds b ON g.event_type = b.event_type
            GROUP BY g.event_type, b.d_centi
        )
        SELECT b.event_type, b.d_centi, n, cheb2_micro, cheb4_micro,
               true_micro,
               true_micro <= least(cheb2_micro, cheb4_micro) AS bound_holds
        FROM bounds b JOIN true_ex t
            ON b.event_type = t.event_type AND b.d_centi = t.d_centi
        ORDER BY b.event_type, b.d_centi
    """
