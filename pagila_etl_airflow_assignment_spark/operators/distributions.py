"""Distributional analytics: per-segment customer spend deciles and order
fulfillment-latency percentiles.

Both reduce to an entity grain FIRST (customer totals, per-order first-ship)
and only then rank/quantile, so the expensive step runs over |customers| /
|orders| rows, never |lineitem|. Neither uses a global-order window: deciles
partition by market segment (the text_quality_quantile pattern — a global
ntile serializes the whole relation through one partition), and percentiles
are grouped aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 10


def customer_spend_deciles(
    orders: DataFrame, customer: DataFrame, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Per (segment, decile): customer count and avg/total lifetime spend.
    Decile 1 = top spenders within their segment. Customers with no orders
    count as zero spend (left join keeps them)."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    per_cust = (
        customer.join(spend, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("spend"), F.lit(0).cast("decimal(18,2)")).alias(
                "spend"
            ),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("spend"), "c_custkey")
    return (
        per_cust.withColumn("decile", F.ntile(n_buckets).over(w))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count("*").alias("n_customers"),
            # avg = exact-decimal SUM cast to double, then / count, rounded
            # at 6 dp. Rounding at 2 dp hits exact half-cents (sum/2 ends in
            # .425), where Spark (shortest-decimal HALF_UP) and DuckDB (binary
            # value) disagree; a cent-valued sum over n customers never
            # produces an exact half at the 6th digit, so 6 dp is safe in
            # both engines
            F.round(
                F.sum("spend").cast("double") / F.count("*"), 6
            ).alias("avg_spend"),
            F.sum("spend").cast("double").alias("total_spend"),
        )
        .orderBy("c_mktsegment", "decile")
    )


def customer_spend_deciles_sql(n_buckets: int = N_BUCKETS) -> str:
    return f"""
        WITH spend AS (
            SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
            FROM orders GROUP BY o_custkey
        ), per_cust AS (
            SELECT c_custkey, c_mktsegment,
                   COALESCE(spend, CAST(0 AS DECIMAL(18,2))) AS spend
            FROM customer LEFT JOIN spend ON c_custkey = o_custkey
        )
        SELECT c_mktsegment, decile,
               COUNT(*) AS n_customers,
               ROUND(CAST(SUM(spend) AS DOUBLE) / COUNT(*), 6) AS avg_spend,
               CAST(SUM(spend) AS DOUBLE) AS total_spend
        FROM (
            SELECT *, NTILE({n_buckets}) OVER (
                PARTITION BY c_mktsegment ORDER BY spend DESC, c_custkey)
                AS decile
            FROM per_cust
        )
        GROUP BY c_mktsegment, decile
        ORDER BY c_mktsegment, decile
    """


def ship_latency_percentiles(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Per order priority: exact p50/p90/p99 of days from order placement to
    FIRST shipment. Exact interpolated F.percentile matches DuckDB
    quantile_cont bit-for-bit (the events_value_percentiles pattern); at
    100 TB the approx_percentile sketch is the drop-in swap."""
    first_ship = lineitem.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("first_ship")
    )
    latency = orders.join(
        first_ship, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        "o_orderpriority",
        F.datediff("first_ship", F.to_date("o_orderdate")).alias("latency_days"),
    )
    q = F.percentile("latency_days", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        latency.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), q.alias("q"))
        .select(
            "o_orderpriority",
            "n_orders",
            F.round(F.element_at("q", 1), 6).alias("p50_days"),
            F.round(F.element_at("q", 2), 6).alias("p90_days"),
            F.round(F.element_at("q", 3), 6).alias("p99_days"),
        )
        .orderBy("o_orderpriority")
    )


SHIP_LATENCY_SQL = """
    WITH first_ship AS (
        SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
        FROM lineitem GROUP BY l_orderkey
    ), latency AS (
        SELECT o_orderpriority,
               date_diff('day', CAST(o_orderdate AS DATE), first_ship)
                   AS latency_days
        FROM orders JOIN first_ship ON o_orderkey = l_orderkey
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(quantile_cont(latency_days, 0.5), 6) AS p50_days,
           ROUND(quantile_cont(latency_days, 0.9), 6) AS p90_days,
           ROUND(quantile_cont(latency_days, 0.99), 6) AS p99_days
    FROM latency
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


# --- winsorization ------------------------------------------------------------

WINSOR_LO = 0.01
WINSOR_HI = 0.99


def winsorized_stats(
    events: DataFrame, lo: float = WINSOR_LO, hi: float = WINSOR_HI
) -> DataFrame:
    """Per-type robust stats after winsorizing value at the exact [p_lo, p_hi]
    percentiles: n, raw vs winsorized mean, and how many values were clipped.

    Two grouped passes over events, but the percentile relation is |types|
    rows and broadcasts back — no per-row subquery, no global sort. At 100 TB
    the exact percentile swaps for approx_percentile in the same shape."""
    bounds = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(lo)).alias("p_lo"),
        F.percentile("value", F.lit(hi)).alias("p_hi"),
    )
    clipped = events.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi")).alias(
            "wvalue"
        ),
        (
            (F.col("value") < F.col("p_lo")) | (F.col("value") > F.col("p_hi"))
        ).cast("int").alias("is_clipped"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(F.avg("wvalue"), 6).alias("mean_winsorized"),
            F.sum("is_clipped").alias("n_clipped"),
        )
        .orderBy("event_type")
    )


def winsorized_stats_sql(lo: float = WINSOR_LO, hi: float = WINSOR_HI) -> str:
    return f"""
        WITH bounds AS (
            SELECT event_type,
                   quantile_cont(value, {lo}) AS p_lo,
                   quantile_cont(value, {hi}) AS p_hi
            FROM events GROUP BY event_type
        ), clipped AS (
            SELECT e.event_type, value,
                   LEAST(GREATEST(value, p_lo), p_hi) AS wvalue,
                   CAST(value < p_lo OR value > p_hi AS INT) AS is_clipped
            FROM events e JOIN bounds b ON e.event_type = b.event_type
        )
        SELECT event_type,
               COUNT(value) AS n,
               round(AVG(value), 6) AS mean_raw,
               round(AVG(wvalue), 6) AS mean_winsorized,
               CAST(SUM(is_clipped) AS BIGINT) AS n_clipped
        FROM clipped
        GROUP BY event_type
        ORDER BY event_type
    """


# --- MAD robust outliers ------------------------------------------------------

MAD_SCALE = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma for normal data
MAD_CUTOFF = 3.0


def mad_outlier_stats(
    events: DataFrame, cutoff: float = MAD_CUTOFF
) -> DataFrame:
    """Per-type robust dispersion report: median, MAD (median absolute
    deviation), and how many values sit beyond ``cutoff`` robust sigmas
    (MAD·1.4826). The mean/stddev z-score (events_value_anomalies) breaks
    under heavy tails — one fat outlier inflates σ and masks the rest; the
    median/MAD pair has a 50% breakdown point, which is why data-quality
    monitors prefer it.

    Two |types|-row exact-median aggregates (the second over deviations from
    the broadcast first), then one conditional count — three passes over the
    fact but every shuffle is |types|-keyed; at 100 TB the exact medians swap
    for approx_percentile in the same shape (winsorized_stats pattern)."""
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"), F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    flagged = dev.drop("med").join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad_value"),
            # both comparands rounded at 6 dp before the predicate (the
            # cusum_drift contract): adev and cutoff·MAD can be mathematically
            # EQUAL (both derive from the same interpolated medians), and an
            # unrounded > on last-ulp-divergent engines flips boundary rows
            # (observed driver r4 hash-FAIL)
            F.sum(
                (
                    F.round(F.col("adev"), 6)
                    > F.round(F.lit(cutoff * MAD_SCALE) * F.col("mad"), 6)
                ).cast("int")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def mad_outlier_stats_sql(cutoff: float = MAD_CUTOFF) -> str:
    return f"""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ), dev AS (
            SELECT e.event_type, value, med, ABS(value - med) AS adev
            FROM events e JOIN med USING (event_type)
        ), mad AS (
            SELECT event_type, ANY_VALUE(med) AS med,
                   quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               COUNT(value) AS n,
               round(ANY_VALUE(m.med), 6) AS median_value,
               round(ANY_VALUE(m.mad), 6) AS mad_value,
               CAST(SUM(CAST(round(adev, 6) > round({cutoff * MAD_SCALE} * m.mad, 6)
                        AS INT)) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type
        ORDER BY d.event_type
    """


# --- CUSUM drift chart --------------------------------------------------------


def cusum_drift(events: DataFrame, h_sigmas: float = 3.0) -> DataFrame:
    """CUSUM control chart over each type's DAILY mean value: cumulative sum
    of deviations from the type's overall daily-mean level, flagged where it
    exits ±h·σ — catching slow drifts a per-point z-score never sees (each
    individual day looks fine; the accumulated bias does not).

    Day grain makes the chart bounded (|types|·|days| rows): one exact
    integer-cents day aggregate, a |types|-row level/σ aggregate broadcast
    back, one ordered cumulative window per type (days arrive in order —
    both engines fold the same sequence, so the running sum is
    deterministic)."""
    day = F.to_date("ts").alias("day")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy("event_type", day)
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            "day",
            (F.col("cents").cast("double") / F.col("n").cast("double") / 100.0).alias(
                "m"
            ),
        )
    )
    # mu/sigma via ORDERED folds over the day-sorted means: plain AVG/stddev
    # aggregate in parallel-hash order, which varies run to run — measured as
    # an actually-unstable oracle hash when 3σ rounds at a boundary. The
    # day-sorted fold is bit-deterministic and engine-identical.
    packed = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "m"))).alias("dm")
    )
    ms = F.transform(F.col("dm"), lambda x: x["m"])
    ssum = F.aggregate(ms, F.lit(0.0), lambda a, x: a + x)
    ssq = F.aggregate(ms, F.lit(0.0), lambda a, x: a + x * x)
    k = F.size(ms).cast("double")
    mu = ssum / k
    level = packed.select(
        "event_type",
        mu.alias("mu"),
        F.sqrt(ssq / k - mu * mu).alias("sigma"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        daily.join(F.broadcast(level), "event_type")
        .select(
            "event_type",
            "day",
            F.round("m", 6).alias("daily_mean"),
            # + 0.0 canonicalizes IEEE −0.0 (a near-cancelled running sum
            # rounds to NEGATIVE zero on whichever engine's addition order
            # leaves a −1e-17 residual; "%.6f" then prints "-0.000000" and
            # the driver's value hash diverges — observed flakily on the
            # final day, where deviations sum to ~0 by construction)
            (F.round(F.sum(F.col("m") - F.col("mu")).over(w), 6) + 0.0).alias(
                "cusum"
            ),
            # compare ROUNDED magnitudes: a last-ulp σ difference between
            # engines must not flip the flag at the boundary
            (
                F.abs(F.round(F.sum(F.col("m") - F.col("mu")).over(w), 6))
                > F.round(F.lit(h_sigmas) * F.col("sigma"), 6)
            ).alias("is_drift"),
        )
        .orderBy("event_type", "day")
    )


def cusum_drift_sql(h_sigmas: float = 3.0) -> str:
    return f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) / 100.0 AS m
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, CAST(ts AS DATE)
        ), packed AS (
            SELECT event_type, list(m ORDER BY day) AS ms
            FROM daily GROUP BY event_type
        ), level AS (
            SELECT event_type,
                   list_sum(ms) / len(ms) AS mu,
                   sqrt(list_sum(list_transform(ms, x -> x * x)) / len(ms)
                        - (list_sum(ms) / len(ms)) * (list_sum(ms) / len(ms)))
                       AS sigma
            FROM packed
        )
        SELECT d.event_type, day,
               round(m, 6) AS daily_mean,
               round(SUM(m - mu) OVER w, 6) + 0.0 AS cusum,
               ABS(round(SUM(m - mu) OVER w, 6)) > round({h_sigmas} * sigma, 6) AS is_drift
        FROM daily d JOIN level l ON d.event_type = l.event_type
        WINDOW w AS (PARTITION BY d.event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY d.event_type, day
    """


# --- equi-depth histogram -----------------------------------------------------

DEPTH_BUCKETS = 10


def equidepth_histogram(
    events: DataFrame, n_buckets: int = DEPTH_BUCKETS
) -> DataFrame:
    """Per-type equi-DEPTH histogram: ntile buckets of equal population with
    their value ranges — the quantile twin of the equi-width
    events_value_histogram (equal-width bins starve in the tails; equal-depth
    bins ARE the empirical quantile function, what optimizers store as
    statistics). Total order (value, event_id) makes the ntile assignment
    deterministic; the window partitions per type, never globally."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.where(F.col("value").isNotNull())
        .select("event_type", "value", F.ntile(n_buckets).over(w).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


def equidepth_histogram_sql(n_buckets: int = DEPTH_BUCKETS) -> str:
    return f"""
        SELECT event_type, bucket, COUNT(*) AS n,
               round(MIN(value), 6) AS lo, round(MAX(value), 6) AS hi
        FROM (
            SELECT event_type, value, event_id,
                   ntile({n_buckets}) OVER (PARTITION BY event_type
                                            ORDER BY value, event_id) AS bucket
            FROM events WHERE value IS NOT NULL
        )
        GROUP BY event_type, bucket
        ORDER BY event_type, bucket
    """


# --- seasonal decomposition ---------------------------------------------------


def seasonal_decompose_hourly(events: DataFrame) -> DataFrame:
    """Additive seasonal decomposition of each type's hourly value series:
    level (overall mean), per-hour-of-day seasonal offset, and residual
    variance after removing both — the health check that separates "values
    drift" from "it's just 3 AM" before any anomaly alerting.

    Bounded relations all the way down: the series aggregates to
    (type, hour-of-day) grain — ≤ |types|·24 seasonal cells from one exact
    integer-cents pass; level is the |types|-row aggregate OF those cells
    (weighted by cell counts, still exact); residuals need one more fact
    pass against the broadcast seasonal table. Exact sums make level and
    offsets engine-identical; residual variance rounds at 6 dp."""
    cents = F.floor(F.col("value") * 100).cast("long")
    base = events.where(F.col("value").isNotNull()).select(
        "event_type", F.hour("ts").alias("hr"), cents.alias("cents")
    )
    cells = base.groupBy("event_type", "hr").agg(
        F.sum("cents").alias("c_sum"), F.count("*").alias("c_n")
    )
    level = cells.groupBy("event_type").agg(
        (
            F.sum("c_sum").cast("double") / F.sum("c_n").cast("double") / 100.0
        ).alias("level")
    )
    seasonal = (
        cells.join(level, "event_type")
        .select(
            "event_type",
            "hr",
            (
                F.col("c_sum").cast("double") / F.col("c_n").cast("double") / 100.0
                - F.col("level")
            ).alias("seasonal"),
            "level",
        )
    )
    resid = (
        base.join(F.broadcast(seasonal), ["event_type", "hr"])
        .select(
            "event_type",
            "hr",
            "seasonal",
            "level",
            (
                F.col("cents").cast("double") / 100.0
                - F.col("level")
                - F.col("seasonal")
            ).alias("r"),
        )
        .groupBy("event_type", "hr")
        .agg(
            F.first("level").alias("level"),
            F.first("seasonal").alias("seasonal"),
            F.count("*").alias("n"),
            F.sum(F.col("r") * F.col("r")).alias("ss_resid"),
        )
    )
    return resid.select(
        "event_type",
        "hr",
        F.round("level", 6).alias("level"),
        F.round("seasonal", 6).alias("seasonal_offset"),
        "n",
        F.round(F.col("ss_resid") / F.col("n"), 6).alias("resid_var"),
    ).orderBy("event_type", "hr")


SEASONAL_DECOMPOSE_SQL = """
    WITH base AS (
        SELECT event_type, hour(ts) AS hr,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ), cells AS (
        SELECT event_type, hr, SUM(cents) AS c_sum, COUNT(*) AS c_n
        FROM base GROUP BY event_type, hr
    ), level AS (
        SELECT event_type,
               CAST(SUM(c_sum) AS DOUBLE) / CAST(SUM(c_n) AS DOUBLE) / 100.0
                   AS level
        FROM cells GROUP BY event_type
    ), seasonal AS (
        SELECT c.event_type, hr,
               CAST(c_sum AS DOUBLE) / CAST(c_n AS DOUBLE) / 100.0 - level
                   AS seasonal,
               level
        FROM cells c JOIN level l ON c.event_type = l.event_type
    )
    SELECT event_type, hr,
           round(ANY_VALUE(level), 6) AS level,
           round(ANY_VALUE(seasonal), 6) AS seasonal_offset,
           COUNT(*) AS n,
           round(SUM(r * r) / COUNT(*), 6) AS resid_var
    FROM (
        SELECT b.event_type, b.hr, s.level, s.seasonal,
               CAST(cents AS DOUBLE) / 100.0 - s.level - s.seasonal AS r
        FROM base b JOIN seasonal s ON b.event_type = s.event_type AND b.hr = s.hr
    )
    GROUP BY event_type, hr
    ORDER BY event_type, hr
"""


# --- population stability index (drift between periods) -----------------------

PSI_BINS = 10
PSI_SPLIT = "2024-01-15"


def psi_drift(
    events: DataFrame, split: str = PSI_SPLIT, n_bins: int = PSI_BINS
) -> DataFrame:
    """Population Stability Index per event type between the pre-``split``
    reference period and the current period — THE model-monitoring drift
    metric (rule of thumb: <0.1 stable, >0.25 retrain).

    Bin edges are the REFERENCE period's deciles (a drifted current period
    can't move its own goalposts) computed by EXACT integer rank selection
    over the cents-quantized value distribution — edge_j is the smallest
    cents value whose cumulative reference count reaches j/n_bins of the
    total (the weighted-median threshold device). Interpolated percentiles
    were the original form and flipped the certified hash at sf0.1: a
    1-ulp engine difference in an interpolated edge moved an entire tie
    group of cents values across a bin boundary. Laplace add-one smoothing
    keeps empty bins finite; PSI = Σ (q−p)·ln(q/p) over ≤n_bins rows per
    type with p, q built from identical exact integers on both engines.

    Scale shape: the edge relation is (type, j≤n_bins−1) rows built from
    the (type, cents) aggregate; binning is one broadcast join + array
    fold; everything else is (type, bin)-keyed."""
    is_ref = F.to_date("ts") < F.lit(split).cast("date")
    base = events.where(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        is_ref.alias("is_ref"),
    )
    per_v = (
        base.where("is_ref")
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("m"))
    )
    wt = Window.partitionBy("event_type")
    wc = wt.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "event_type",
        "cents",
        F.sum("m").over(wc).alias("cum"),
        F.sum("m").over(wt).alias("t_ref"),
    )
    spark = events.sparkSession
    js = spark.range(1, n_bins).select(F.col("id").alias("j"))
    edges = (
        cum.join(F.broadcast(js))
        .where(F.col("cum") * n_bins >= F.col("j") * F.col("t_ref"))
        .groupBy("event_type", "j")
        .agg(F.min("cents").alias("edge"))
        .groupBy("event_type")
        .agg(F.array_sort(F.collect_list("edge")).alias("edges"))
    )
    binned = base.join(F.broadcast(edges), "event_type").select(
        "event_type",
        "is_ref",
        F.aggregate(
            F.col("edges"),
            F.lit(0),
            lambda acc, e: acc + F.when(F.col("cents") > e, 1).otherwise(0),
        ).alias("bin"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + n_bins).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + n_bins).cast("double")
    return (
        cells.join(totals, "event_type")
        .select("event_type", ((q - p) * F.log(q / p)).alias("term"))
        .groupBy("event_type")
        .agg(F.round(F.sum("term"), 6).alias("psi"), F.count("*").alias("n_bins_hit"))
        .orderBy("event_type")
    )


def psi_drift_sql(split: str = PSI_SPLIT, n_bins: int = PSI_BINS) -> str:
    return f"""
        WITH base AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(ts AS DATE) < DATE '{split}' AS is_ref
            FROM events WHERE value IS NOT NULL
        ), cum AS (
            SELECT event_type, cents,
                   SUM(m) OVER (PARTITION BY event_type ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(m) OVER (PARTITION BY event_type) AS t_ref
            FROM (SELECT event_type, cents, COUNT(*) AS m
                  FROM base WHERE is_ref GROUP BY event_type, cents)
        ), edges AS (
            SELECT event_type, j, MIN(cents) AS edge
            FROM cum CROSS JOIN (SELECT unnest(generate_series(1, {n_bins - 1})) AS j)
            WHERE cum * {n_bins} >= j * t_ref
            GROUP BY event_type, j
        ), edge_lists AS (
            SELECT event_type, list(edge ORDER BY edge) AS edges
            FROM edges GROUP BY event_type
        ), binned AS (
            SELECT b.event_type, b.is_ref,
                   len(list_filter(el.edges, e -> b.cents > e)) AS bin
            FROM base b JOIN edge_lists el USING (event_type)
        ), cells AS (
            SELECT event_type, bin,
                   SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
                   SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur
            FROM binned GROUP BY event_type, bin
        ), totals AS (
            SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
            FROM cells GROUP BY event_type
        )
        SELECT c.event_type,
               round(SUM((CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + {n_bins} AS DOUBLE)
                          - CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + {n_bins} AS DOUBLE))
                         * ln((CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + {n_bins} AS DOUBLE))
                              / (CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + {n_bins} AS DOUBLE)))), 6)
                   AS psi,
               COUNT(*) AS n_bins_hit
        FROM cells c JOIN totals t ON c.event_type = t.event_type
        GROUP BY c.event_type
        ORDER BY c.event_type
    """


# --- daily percentile bands ---------------------------------------------------


def daily_percentile_bands(events: DataFrame) -> DataFrame:
    """p10/p50/p90 value bands per (type, day) — the observability ribbon
    every metrics dashboard draws. One grouped exact-percentile aggregate
    over the bounded day grid (the winsorized_stats percentile contract);
    at lake scale the same shape swaps in approx_percentile."""
    return (
        events.where(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.percentile("value", F.lit(0.1)), 6).alias("p10"),
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        )
        .orderBy("event_type", "day")
    )


DAILY_PERCENTILE_BANDS_SQL = """
    SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
           round(quantile_cont(value, 0.1), 6) AS p10,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, CAST(ts AS DATE)
    ORDER BY event_type, day
"""


# --- single changepoint localization --------------------------------------------


def changepoint_detection(events: DataFrame) -> DataFrame:
    """Best single changepoint per event type: the day split that maximizes
    the absolute difference of the DAILY-MEAN level before vs after —
    binary-segmentation step 1, the localization companion to cusum_drift
    (CUSUM says "something drifted"; this says WHERE).

    Exact arithmetic end to end: daily values aggregate to integer cents and
    row counts; prefix/total sums are window/broadcast integer aggregates;
    the candidate deltas are single divisions of identical exact operands
    (bit-stable), rounded at 6 dp before the argmax with a day tiebreak so
    both engines pick the same split. Everything past the first aggregate
    runs on the bounded |types|·|days| grid."""
    day = F.to_date("ts").alias("day")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy("event_type", day)
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
            F.count("*").alias("n"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cand = daily.select(
        "event_type",
        "day",
        F.sum("cents").over(wcum).alias("c_pre"),
        F.sum("n").over(wcum).alias("n_pre"),
        F.sum("cents").over(wall).alias("c_tot"),
        F.sum("n").over(wall).alias("n_tot"),
        F.count("*").over(wall).alias("days_tot"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")).alias(
            "k"
        ),
    ).where(F.col("k") < F.col("days_tot"))
    mean_pre = F.col("c_pre") / F.col("n_pre") / F.lit(100.0)
    mean_post = (F.col("c_tot") - F.col("c_pre")) / (
        F.col("n_tot") - F.col("n_pre")
    ) / F.lit(100.0)
    scored = cand.select(
        "event_type",
        "day",
        F.round(mean_pre, 6).alias("mean_before"),
        F.round(mean_post, 6).alias("mean_after"),
        F.round(F.abs(mean_post - mean_pre), 6).alias("delta"),
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.col("delta").desc(), F.col("day").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("split_day"),
            "mean_before",
            "mean_after",
            "delta",
        )
        .orderBy("event_type")
    )


CHANGEPOINT_DETECTION_SQL = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents,
               COUNT(*) AS n
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, CAST(ts AS DATE)
    ), cand AS (
        SELECT event_type, day,
               SUM(cents) OVER (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS c_pre,
               SUM(n) OVER (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS n_pre,
               SUM(cents) OVER (PARTITION BY event_type) AS c_tot,
               SUM(n) OVER (PARTITION BY event_type) AS n_tot,
               COUNT(*) OVER (PARTITION BY event_type) AS days_tot,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS k
        FROM daily
    ), scored AS (
        SELECT event_type, day,
               round(CAST(c_pre AS DOUBLE) / n_pre / 100.0, 6) AS mean_before,
               round(CAST(c_tot - c_pre AS DOUBLE) / (n_tot - n_pre) / 100.0, 6)
                   AS mean_after,
               round(ABS(CAST(c_tot - c_pre AS DOUBLE) / (n_tot - n_pre) / 100.0
                         - CAST(c_pre AS DOUBLE) / n_pre / 100.0), 6) AS delta
        FROM cand WHERE k < days_tot
    )
    SELECT event_type, day AS split_day, mean_before, mean_after, delta
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY event_type ORDER BY delta DESC, day ASC
        ) AS rn
        FROM scored
    ) WHERE rn = 1
    ORDER BY event_type
"""

# --- Kolmogorov-Smirnov drift test ---------------------------------------------------

KS_SPLIT = PSI_SPLIT


def ks_drift(events: DataFrame, split: str = KS_SPLIT) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per event type between the
    pre-``split`` reference and current periods: (event_type, n_ref, n_cur,
    d_scaled, ks_milli) — the binning-free nonparametric drift test (PSI's
    twin without the bin-edge degree of freedom).

    D = sup |F_ref − F_cur| evaluated over the merged distinct cents
    values with EVERYTHING cross-multiplied to integers:
    d_scaled = max |cum_ref·n_cur − cum_cur·n_ref|, ks = d_scaled /
    (n_ref·n_cur) emitted half-up at milli. No interpolation, no bins, no
    floats — bit-stable at any scale that keeps n_ref·n_cur inside int64
    (rescale counts per type beyond ~3·10⁹ rows each).

    Scale shape: one (type, cents) aggregate, one cumulative window over
    the distinct-value relation per type (bounded by value cardinality),
    one max."""
    is_ref = F.to_date("ts") < F.lit(split).cast("date")
    per_v = (
        events.where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
            is_ref.alias("is_ref"),
        )
        .groupBy("event_type", "cents")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("m_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("m_cur"),
        )
    )
    wt = Window.partitionBy("event_type")
    wc = wt.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "event_type",
        F.sum("m_ref").over(wc).alias("cum_ref"),
        F.sum("m_cur").over(wc).alias("cum_cur"),
        F.sum("m_ref").over(wt).alias("n_ref"),
        F.sum("m_cur").over(wt).alias("n_cur"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.max(
                F.abs(
                    F.col("cum_ref") * F.col("n_cur")
                    - F.col("cum_cur") * F.col("n_ref")
                )
            ).alias("d_scaled"),
        )
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            "d_scaled",
            F.expr(
                "CAST(CASE WHEN n_ref > 0 AND n_cur > 0 THEN"
                " (2 * 1000 * d_scaled + n_ref * n_cur)"
                " DIV (2 * n_ref * n_cur) ELSE 0 END AS BIGINT)"
            ).alias("ks_milli"),
        )
        .orderBy("event_type")
    )


def ks_drift_sql(split: str = KS_SPLIT) -> str:
    return f"""
        WITH per_v AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{split}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS m_ref,
                   CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{split}'
                            THEN 0 ELSE 1 END) AS BIGINT) AS m_cur
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type, CAST(round(value * 100) AS BIGINT)
        ),
        cum AS (
            SELECT event_type,
                   SUM(m_ref) OVER w AS cum_ref,
                   SUM(m_cur) OVER w AS cum_cur,
                   SUM(m_ref) OVER (PARTITION BY event_type) AS n_ref,
                   SUM(m_cur) OVER (PARTITION BY event_type) AS n_cur
            FROM per_v
            WINDOW w AS (PARTITION BY event_type ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_type,
               CAST(MAX(n_ref) AS BIGINT) AS n_ref,
               CAST(MAX(n_cur) AS BIGINT) AS n_cur,
               CAST(MAX(ABS(cum_ref * n_cur - cum_cur * n_ref)) AS BIGINT)
                   AS d_scaled,
               CAST(CASE WHEN MAX(n_ref) > 0 AND MAX(n_cur) > 0 THEN
                    (2 * 1000 * MAX(ABS(cum_ref * n_cur - cum_cur * n_ref))
                     + MAX(n_ref) * MAX(n_cur))
                    // (2 * MAX(n_ref) * MAX(n_cur)) ELSE 0 END AS BIGINT)
                   AS ks_milli
        FROM cum
        GROUP BY event_type
        ORDER BY event_type
    """


# --- split-conformal prediction interval --------------------------------------------

CONF_ALPHA_PCT = 10  # target 90% coverage


def conformal_interval(events: DataFrame) -> DataFrame:
    """Split-conformal calibration of a per-user purchase-value predictor
    (Vovk et al.; the distribution-free interval recipe every ML serving
    pipeline bolts onto a point model): train (days 1-10) fits the
    predictor — each user's integer mean purchase cents; calibration (days
    11-20) takes the ceil((n+1)·0.9)-th smallest absolute residual as the
    interval half-width q_hat; test (days 21+) reports achieved coverage.
    Output: one panel row (n_users, n_cal, q_hat_cents, n_test, n_covered,
    coverage_milli).

    Exactness: predictions are floor-divided integer cents, residuals exact
    integers, and q_hat is ORDER-STATISTIC SELECTION (the PSI lesson: rank
    selection, never float quantiles) via ranks.kth_smallest. Coverage is
    one milli division at the end.

    Scale shape: predictor and residuals are user-keyed aggregates/joins;
    q_hat selection is per-score counts + one cumulative window over that
    bounded aggregate (ranks.kth_smallest) — no data-sized rank window;
    coverage is a map-side-combined count."""
    p = events.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.dayofmonth("ts").alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    pred = (
        p.where(F.col("day") <= 10)
        .groupBy("user_id")
        .agg(F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("pred"))
    )
    cal = (
        p.where((F.col("day") >= 11) & (F.col("day") <= 20))
        .join(pred, "user_id")
        .select("event_id", F.abs(F.col("cents") - F.col("pred")).alias("score"))
    )
    from ..ranks import kth_smallest

    q_hat = kth_smallest(
        cal.select("score"), "score", "CAST((9 * (n + 1) + 9) DIV 10 AS BIGINT)"
    ).select(F.col("score").alias("q_hat_cents"), F.col("n").alias("n_cal"))
    test = (
        p.where(F.col("day") >= 21)
        .join(pred, "user_id")
        .select(F.abs(F.col("cents") - F.col("pred")).alias("res"))
    )
    return (
        test.crossJoin(F.broadcast(q_hat))
        .agg(
            F.max("n_cal").cast("long").alias("n_cal"),
            F.max("q_hat_cents").alias("q_hat_cents"),
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("res") <= F.col("q_hat_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
        .crossJoin(
            F.broadcast(pred.agg(F.count("*").cast("long").alias("n_users")))
        )
        .select(
            "n_users",
            "n_cal",
            "q_hat_cents",
            "n_test",
            "n_covered",
            F.expr("CAST(1000 * n_covered DIV n_test AS BIGINT)").alias(
                "coverage_milli"
            ),
        )
    )


def conformal_interval_sql() -> str:
    return """
        WITH p AS (
            SELECT event_id, user_id,
                   EXTRACT(day FROM ts) AS day,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        pred AS (
            SELECT user_id, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pred
            FROM p WHERE day <= 10 GROUP BY user_id
        ),
        cal AS (
            SELECT p.event_id, ABS(p.cents - pred.pred) AS score
            FROM p JOIN pred USING (user_id)
            WHERE p.day BETWEEN 11 AND 20
        ),
        ranked AS (
            SELECT score,
                   ROW_NUMBER() OVER (ORDER BY score ASC, event_id ASC) AS rn,
                   COUNT(*) OVER () AS n_cal
            FROM cal
        ),
        q_hat AS (
            SELECT score AS q_hat_cents, n_cal FROM ranked
            WHERE rn = (9 * (n_cal + 1) + 9) // 10
        ),
        test AS (
            SELECT ABS(p.cents - pred.pred) AS res
            FROM p JOIN pred USING (user_id)
            WHERE p.day >= 21
        ),
        cov AS (
            SELECT CAST(MAX(q.n_cal) AS BIGINT) AS n_cal,
                   CAST(MAX(q.q_hat_cents) AS BIGINT) AS q_hat_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN t.res <= q.q_hat_cents THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_covered
            FROM test t CROSS JOIN q_hat q
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pred) AS n_users,
               n_cal, q_hat_cents, n_test, n_covered,
               CAST(1000 * n_covered // n_test AS BIGINT) AS coverage_milli
        FROM cov
    """


# --- distribution-free median confidence interval -----------------------------------


def median_ci(events: DataFrame) -> DataFrame:
    """Distribution-free 95% confidence interval for the median event value
    per type, by ORDER-STATISTIC RANKS (the sign-test inversion: the CI is
    [x_(l), x_(u)] with l,u = n/2 ∓ 0.98·sqrt(n) — no distributional
    assumption, no bootstrap replicates): (event_type, n, median_cents,
    lo_cents, hi_cents).

    The one irrational operand (sqrt n) is quantized ONCE on an
    exactly-agreed integer (the micro-nat discipline); ranks derive from
    it in pure integer arithmetic, and all three reported statistics are
    order-statistic SELECTIONS by row_number — floats never touch values.

    Scale shape: one per-type rank window (two-stage if a type ever grew
    unbounded) and a 4-way selection join on the |types|-row rank spec."""
    vals = events.select(
        "event_type",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    spec = (
        vals.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "n",
            F.round(F.lit(980) * F.sqrt("n")).cast("long").alias("d_milli"),
        )
        .select(
            "event_type",
            "n",
            F.expr("(n + 1) DIV 2").alias("med_rank"),
            F.expr(
                "GREATEST(CAST(1 AS BIGINT), (500 * n - d_milli) DIV 1000)"
            ).alias("lo_rank"),
            F.expr(
                "LEAST(n, (500 * n + d_milli + 999) DIV 1000 + 1)"
            ).alias("hi_rank"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = vals.withColumn("rn", F.row_number().over(w))
    def pick(rank_col: str, out: str):
        return (
            ranked.join(
                spec.select("event_type", F.col(rank_col).alias("__r")),
                "event_type",
            )
            .where(F.col("rn") == F.col("__r"))
            .select("event_type", F.col("cents").alias(out))
        )
    return (
        spec.select("event_type", F.col("n").cast("long").alias("n"))
        .join(pick("med_rank", "median_cents"), "event_type")
        .join(pick("lo_rank", "lo_cents"), "event_type")
        .join(pick("hi_rank", "hi_cents"), "event_type")
        .orderBy("event_type")
    )


MEDIAN_CI_SQL = """
    WITH vals AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    spec AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(round(980 * sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)
                   AS d_milli
        FROM vals GROUP BY event_type
    ),
    ranks AS (
        SELECT event_type, n,
               (n + 1) // 2 AS med_rank,
               GREATEST(CAST(1 AS BIGINT), (500 * n - d_milli) // 1000)
                   AS lo_rank,
               LEAST(n, (500 * n + d_milli + 999) // 1000 + 1) AS hi_rank
        FROM spec
    ),
    ranked AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY cents, event_id) AS rn
        FROM vals
    )
    SELECT r.event_type, r.n,
           med.cents AS median_cents,
           lo.cents AS lo_cents,
           hi.cents AS hi_cents
    FROM ranks r
    JOIN ranked med ON med.event_type = r.event_type AND med.rn = r.med_rank
    JOIN ranked lo ON lo.event_type = r.event_type AND lo.rn = r.lo_rank
    JOIN ranked hi ON hi.event_type = r.event_type AND hi.rn = r.hi_rank
    ORDER BY r.event_type
"""


# --- anomaly-detector ensemble -------------------------------------------------------


def anomaly_ensemble(events: DataFrame) -> DataFrame:
    """Three independent anomaly detectors voting on the daily event-count
    series — the production pattern for alert precision (a single detector
    either floods or sleeps): z-score vs the corpus mean (|c−μ| > 3σ,
    squared into exact integers — no sqrt), MAD (|c − median| > 3·MAD,
    both rank-selected), and day-over-day jump (>50% move). Output per
    day: (day, n_events, z_flag, mad_flag, jump_flag, votes).

    All three tests are exact: the z test compares (n·c − S)² against
    9·(n·Sq − S²), the MAD test is pure rank selection, and the jump test
    cross-multiplies. An alerting policy reads votes >= 2.

    Scale shape: everything after the day-grain aggregate operates on the
    ≤|days| grid — windows and selections on a bounded relation."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("c")
    )
    g = Window.partitionBy()
    w_rank = Window.orderBy("c", "day")
    ranked = daily.select(
        "day",
        "c",
        F.lag("c").over(Window.orderBy("day")).alias("prev"),
        F.count("*").over(g).alias("n"),
        F.sum("c").over(g).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(g).alias("sq"),
        F.row_number().over(w_rank).alias("rn"),
    )
    med = ranked.where(
        F.col("rn") == F.expr("(n + 1) DIV 2")
    ).select(F.col("c").alias("med"))
    with_med = ranked.crossJoin(F.broadcast(med)).withColumn(
        "adev", F.abs(F.col("c") - F.col("med"))
    )
    w_arank = Window.orderBy("adev", "day")
    mad = (
        with_med.select("adev", F.row_number().over(w_arank).alias("arn"), "n")
        .where(F.col("arn") == F.expr("(n + 1) DIV 2"))
        .select(F.col("adev").alias("mad"))
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .select(
            "day",
            F.col("c").cast("long").alias("n_events"),
            F.expr(
                "CAST((n * c - s) * (n * c - s) > 9 * (n * sq - s * s) AS INT)"
            ).alias("z_flag"),
            F.expr("CAST(adev > 3 * mad AS INT)").alias("mad_flag"),
            F.expr(
                "CAST(prev IS NOT NULL AND ABS(c - prev) * 2 > prev AS INT)"
            ).alias("jump_flag"),
        )
        .withColumn(
            "votes",
            (F.col("z_flag") + F.col("mad_flag") + F.col("jump_flag")).cast(
                "int"
            ),
        )
        .orderBy("day")
    )


ANOMALY_ENSEMBLE_SQL = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT day, c,
               LAG(c) OVER (ORDER BY day) AS prev,
               COUNT(*) OVER () AS n,
               SUM(c) OVER () AS s,
               SUM(c * c) OVER () AS sq,
               ROW_NUMBER() OVER (ORDER BY c, day) AS rn
        FROM daily
    ),
    med AS (
        SELECT c AS med FROM ranked WHERE rn = (n + 1) // 2
    ),
    with_med AS (
        SELECT r.*, ABS(r.c - m.med) AS adev
        FROM ranked r CROSS JOIN med m
    ),
    mad AS (
        SELECT adev AS mad FROM (
            SELECT adev, ROW_NUMBER() OVER (ORDER BY adev, day) AS arn, n
            FROM with_med
        ) WHERE arn = (n + 1) // 2
    )
    SELECT day, c AS n_events,
           CAST((n * c - s) * (n * c - s) > 9 * (n * sq - s * s) AS INT)
               AS z_flag,
           CAST(adev > 3 * m.mad AS INT) AS mad_flag,
           CAST(prev IS NOT NULL AND ABS(c - prev) * 2 > prev AS INT)
               AS jump_flag,
           CAST((n * c - s) * (n * c - s) > 9 * (n * sq - s * s) AS INT)
               + CAST(adev > 3 * m.mad AS INT)
               + CAST(prev IS NOT NULL AND ABS(c - prev) * 2 > prev AS INT)
               AS votes
    FROM with_med CROSS JOIN mad m
    ORDER BY day
"""


# --- overdispersion (Fano) index -----------------------------------------------------


def overdispersion(events: DataFrame) -> DataFrame:
    """Fano dispersion index of the hourly arrival counts per event type —
    the Poissonness check (a Poisson stream has variance = mean, D = 1;
    bursty streams overdisperse, throttled ones underdisperse):
    (event_type, n_hours, mean_milli, fano_milli, verdict).

    D = s²/x̄ assembles entirely from exact integer power sums:
    fano_milli = 1000·n·(n·Σc² − S²) DIV ((n−1)·n·S... all one pinned
    floor on positive integers; the verdict thresholds at ±10%.

    Scale shape: one (type, hour) aggregate, one |types| rollup."""
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("c"))
    agg = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    return (
        agg.select(
            "event_type",
            F.col("n").cast("long").alias("n_hours"),
            F.expr("CAST(1000 * s DIV n AS BIGINT)").alias("mean_milli"),
            F.expr(
                "CAST(1000 * (n * sq - s * s) DIV ((n - 1) * s) AS BIGINT)"
            ).alias("fano_milli"),
        )
        .withColumn(
            "verdict",
            F.when(F.col("fano_milli") > 1100, F.lit("overdispersed"))
            .when(F.col("fano_milli") < 900, F.lit("underdispersed"))
            .otherwise(F.lit("poisson-like")),
        )
        .orderBy("event_type")
    )


OVERDISPERSION_SQL = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    agg AS (
        SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS sq
        FROM hourly GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           CAST(1000 * s // n AS BIGINT) AS mean_milli,
           CAST(1000 * (n * sq - s * s) // ((n - 1) * s) AS BIGINT)
               AS fano_milli,
           CASE WHEN 1000 * (n * sq - s * s) // ((n - 1) * s) > 1100
                THEN 'overdispersed'
                WHEN 1000 * (n * sq - s * s) // ((n - 1) * s) < 900
                THEN 'underdispersed'
                ELSE 'poisson-like' END AS verdict
    FROM agg
    ORDER BY event_type
"""
