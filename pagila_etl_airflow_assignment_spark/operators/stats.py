"""Closed-form statistical tests over grouped aggregates: chi-square
independence and Welch's two-sample t.

Both follow the user_value_trend pattern (operators/analytics.py): the test
statistic is an algebraic function of sufficient statistics (counts, means,
variances) that one partial+final aggregate produces — no sampling, no
iteration, no Python. The expensive step is a bounded-key hash aggregate;
the statistic assembly runs over |cells| / |groups| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chi_square_independence(events: DataFrame) -> DataFrame:
    """Chi-square statistic for independence of event_type × hour-of-day.

    One (type, hour) cell aggregate, DENSIFIED to the full types × hours
    grid (a zero cell contributes its full expected count to the statistic —
    dropping structurally-empty cells understates dependence); the grid is a
    broadcast cross join of two ≤24-row margin relations. Marginals are
    window sums over the ≤|types|·24-row cells (no second scan of events);
    output is one row: statistic, degrees of freedom, cell count."""
    observed = events.groupBy(
        "event_type", F.hour("ts").alias("hr")
    ).agg(F.count("*").alias("o"))
    grid = observed.select("event_type").distinct().crossJoin(
        F.broadcast(observed.select("hr").distinct())
    )
    cells = grid.join(observed, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce("o", F.lit(0)).alias("o")
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("hr")
    wall = Window.partitionBy()
    with_margins = cells.select(
        "event_type",
        "hr",
        "o",
        F.sum("o").over(wr).alias("row_tot"),
        F.sum("o").over(wc).alias("col_tot"),
        F.sum("o").over(wall).alias("n"),
    )
    expected = (F.col("row_tot") * F.col("col_tot")) / F.col("n")
    return with_margins.agg(
        F.round(F.sum(F.pow(F.col("o") - expected, 2) / expected), 6).alias("chi2"),
        (
            (F.count_distinct("event_type") - 1) * (F.count_distinct("hr") - 1)
        ).alias("dof"),
        F.count("*").alias("n_cells"),
    )


CHI_SQUARE_INDEPENDENCE_SQL = """
    WITH observed AS (
        SELECT event_type, hour(ts) AS hr, COUNT(*) AS o
        FROM events GROUP BY event_type, hour(ts)
    ), grid AS (
        SELECT t.event_type, h.hr
        FROM (SELECT DISTINCT event_type FROM observed) t
        CROSS JOIN (SELECT DISTINCT hr FROM observed) h
    ), cells AS (
        SELECT g.event_type, g.hr, COALESCE(o.o, 0) AS o
        FROM grid g
        LEFT JOIN observed o
          ON o.event_type = g.event_type AND o.hr = g.hr
    ), m AS (
        SELECT event_type, hr, o,
               SUM(o) OVER (PARTITION BY event_type) AS row_tot,
               SUM(o) OVER (PARTITION BY hr) AS col_tot,
               SUM(o) OVER () AS n
        FROM cells
    )
    SELECT round(SUM(POW(o - (row_tot * col_tot) / n, 2)
                     / ((row_tot * col_tot) / n)), 6) AS chi2,
           (COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT hr) - 1) AS dof,
           COUNT(*) AS n_cells
    FROM m
"""


def welch_ab_test(events: DataFrame) -> DataFrame:
    """Welch's t statistic per event_type between two deterministic user
    cohorts (user_id parity plays the A/B assignment).

    Sufficient statistics (n, mean, sample variance per cohort) come from ONE
    conditional aggregate pass; t and the Welch–Satterthwaite dof are closed
    form. Groups with degenerate variance report NULL t rather than dividing
    by zero — both engines agree on the NULL."""
    g = (F.col("user_id") % 2 == 0).cast("int")
    agg = events.groupBy("event_type").agg(
        F.count(F.when(g == 1, F.col("value"))).alias("n_a"),
        F.avg(F.when(g == 1, F.col("value"))).alias("m_a"),
        F.var_samp(F.when(g == 1, F.col("value"))).alias("v_a"),
        F.count(F.when(g == 0, F.col("value"))).alias("n_b"),
        F.avg(F.when(g == 0, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(g == 0, F.col("value"))).alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2)
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
        + F.pow(F.col("v_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
    )
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(F.col("m_a") - F.col("m_b"), 6).alias("mean_diff"),
        F.round(F.when(ok, t), 6).alias("t_stat"),
        F.round(F.when(ok, dof), 6).alias("welch_dof"),
    ).orderBy("event_type")


WELCH_AB_TEST_SQL = """
    WITH agg AS (
        SELECT event_type,
               COUNT(CASE WHEN user_id % 2 = 0 THEN value END) AS n_a,
               AVG(CASE WHEN user_id % 2 = 0 THEN value END) AS m_a,
               var_samp(CASE WHEN user_id % 2 = 0 THEN value END) AS v_a,
               COUNT(CASE WHEN user_id % 2 <> 0 THEN value END) AS n_b,
               AVG(CASE WHEN user_id % 2 <> 0 THEN value END) AS m_b,
               var_samp(CASE WHEN user_id % 2 <> 0 THEN value END) AS v_b
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           round(m_a - m_b, 6) AS mean_diff,
           round(CASE WHEN n_a >= 2 AND n_b >= 2 AND (v_a/n_a + v_b/n_b) > 0
                 THEN (m_a - m_b) / sqrt(v_a/n_a + v_b/n_b) END, 6) AS t_stat,
           round(CASE WHEN n_a >= 2 AND n_b >= 2 AND (v_a/n_a + v_b/n_b) > 0
                 THEN POW(v_a/n_a + v_b/n_b, 2)
                      / (POW(v_a/n_a, 2) / (n_a - 1)
                         + POW(v_b/n_b, 2) / (n_b - 1)) END, 6) AS welch_dof
    FROM agg
    ORDER BY event_type
"""


def user_type_entropy(events: DataFrame) -> DataFrame:
    """Shannon entropy of each user's event-type mix (behavioral diversity):
    H = ln(n) − Σ c·ln(c)/n from the (user, type) count relation — two
    map-side-combinable aggregates, no per-user arrays, no window.

    Cross-engine exactness: a float Σ c·ln(c) is summation-order-dependent
    (Spark folds partition partials, DuckDB its own order), so last-ulp drift
    near a round(…, 6) boundary flips the certified hash (observed driver
    r4). Instead each ln(c) of an EXACT INTEGER count is quantized once to
    micro-nats (round-to-integer of near-identical libm values — stable),
    and everything after is exact integer arithmetic: the sum is
    order-independent, the one division runs on identical operands, and the
    output is an exact BIGINT in micro-nats."""
    micro = lambda col: F.round(F.log(col) * F.lit(1e6)).cast("long")  # noqa: E731
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count("*").alias("n_types"),
            F.sum(F.col("c") * micro(F.col("c"))).alias("_clogc_micro"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            (
                micro(F.col("n_events"))
                - F.round(F.col("_clogc_micro") / F.col("n_events")).cast("long")
            ).alias("entropy_micro"),
        )
        .orderBy("user_id")
    )


USER_TYPE_ENTROPY_SQL = """
    WITH per_type AS (
        SELECT user_id, event_type, COUNT(*) AS c,
               CAST(round(ln(COUNT(*)) * 1e6) AS BIGINT) AS lc_micro
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           COUNT(*) AS n_types,
           CAST(round(ln(SUM(c)) * 1e6) AS BIGINT)
               - CAST(round(CAST(SUM(c * lc_micro) AS DOUBLE) / SUM(c)) AS BIGINT)
               AS entropy_micro
    FROM per_type
    GROUP BY user_id
    ORDER BY user_id
"""


def segment_spend_gini(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Gini coefficient of customer-spend concentration per market segment:
    G = (2·Σ i·xᵢ)/(n·Σ xᵢ) − (n+1)/n over ascending-sorted spends.

    The rank window partitions by segment over the customer-grain aggregate
    (the deciles rule: no global-order window); zero-spend customers are
    kept — concentration among non-buyers is part of the answer."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend")
    )
    per_cust = customer.join(
        spend, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(
        "c_custkey", "c_mktsegment", F.coalesce("spend", F.lit(0.0)).alias("spend")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("spend", "c_custkey")
    ranked = per_cust.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
            F.round(
                (F.lit(2.0) * F.sum(F.col("i") * F.col("spend")))
                / (F.count("*") * F.sum("spend"))
                - (F.count("*") + F.lit(1.0)) / F.count("*"),
                6,
            ).alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


SEGMENT_SPEND_GINI_SQL = """
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey
    ), per_cust AS (
        SELECT c_custkey, c_mktsegment, COALESCE(spend, 0.0) AS spend
        FROM customer LEFT JOIN spend ON c_custkey = o_custkey
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_mktsegment ORDER BY spend, c_custkey) AS i
        FROM per_cust
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           round(SUM(spend), 2) AS total_spend,
           round((2.0 * SUM(i * spend)) / (COUNT(*) * SUM(spend))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


def cuped_adjustment(events: DataFrame, split: str = "2024-01-15") -> DataFrame:
    """CUPED variance reduction for the A/B read-out (Deng et al., WSDM 2013):
    adjust each user's experiment-period metric by their PRE-period metric,
    y_adj = y − θ·(x − x̄), θ = cov(x,y)/var(x) — same means, far tighter
    intervals, the standard trick for converting historical data into
    experiment power.

    One user-grain conditional aggregate builds exact integer-cent (x, y)
    pairs; θ and x̄ come from one 1-row aggregate over users (broadcast
    back); per-cohort means assemble from per-cohort integer sums. All
    sufficient statistics are exact int64 — the float boundary is a handful
    of identical-expression IEEE ops, so both engines agree bit-for-bit."""
    cents = F.floor(F.col("value") * 100).cast("long")
    is_pre = F.to_date("ts") < F.lit(split).cast("date")
    per_user = (
        events.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(is_pre, cents)), F.lit(0)).alias("x"),
            F.coalesce(F.sum(F.when(~is_pre, cents)), F.lit(0)).alias("y"),
        )
        .withColumn("cohort", (F.col("user_id") % 2).cast("int"))
    )
    glob = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        (
            (F.col("n").cast("double") * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (F.col("n").cast("double") * F.col("sxx").cast("double")
               - F.col("sx").cast("double") * F.col("sx").cast("double"))
        ).alias("theta"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("x_bar"),
    )
    per_cohort = per_user.groupBy("cohort").agg(
        F.count("*").alias("n_users"),
        F.sum("x").alias("cx"),
        F.sum("y").alias("cy"),
    )
    return (
        per_cohort.crossJoin(F.broadcast(glob))
        .select(
            "cohort",
            "n_users",
            F.round(
                F.col("cy").cast("double") / F.col("n_users").cast("double") / 100.0, 6
            ).alias("mean_raw"),
            F.round(
                (
                    F.col("cy").cast("double") / F.col("n_users").cast("double")
                    - F.col("theta")
                    * (
                        F.col("cx").cast("double") / F.col("n_users").cast("double")
                        - F.col("x_bar")
                    )
                )
                / 100.0,
                6,
            ).alias("mean_cuped"),
            F.round("theta", 6).alias("theta"),
        )
        .orderBy("cohort")
    )


def cuped_adjustment_sql(split: str = "2024-01-15") -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   COALESCE(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{split}'
                        THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS x,
                   COALESCE(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{split}'
                        THEN CAST(FLOOR(value * 100) AS BIGINT) END), 0) AS y,
                   CAST(user_id % 2 AS INT) AS cohort
            FROM events WHERE value IS NOT NULL
            GROUP BY user_id
        ), gstats AS (
            SELECT (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
                    - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                   / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * x) AS DOUBLE)
                      - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) AS theta,
                   CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS x_bar
            FROM per_user
        )
        SELECT cohort, COUNT(*) AS n_users,
               round(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0, 6)
                   AS mean_raw,
               round((CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                      - ANY_VALUE(theta)
                        * (CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                           - ANY_VALUE(x_bar))) / 100.0, 6) AS mean_cuped,
               round(ANY_VALUE(theta), 6) AS theta
        FROM per_user CROSS JOIN gstats
        GROUP BY cohort
        ORDER BY cohort
    """


# --- WOE / IV scorecard binning -----------------------------------------------

WOE_BINS = 5


def woe_iv_binning(events: DataFrame, n_bins: int = WOE_BINS) -> DataFrame:
    """Weight-of-evidence bins + information value for "click value predicts
    later purchase" — the credit-scorecard feature screen (IV < 0.02
    useless, > 0.3 strong) applied to behavioral data.

    Label: did the click's user purchase within the dataset AFTER the click
    (a per-user first-purchase MIN joined back — user-keyed, no event×event
    join). Bins are value quintiles with EXACT NTILE semantics computed
    distributed: the global (value, event_id) rank comes from the two-level
    device (ranks.with_global_row_number — within-floor(value)-bucket window
    + bounded bucket-prefix counts, never a single-task sort), then the
    NTILE bucket formula (first n%bins buckets get ceil(n/bins) rows) maps
    rank → bin, bit-identical to ntile() over a global window. Good/bad
    rates use add-one smoothing so empty cells stay finite; WOE =
    ln(good%/bad%), IV = Σ (good%−bad%)·WOE, both rounded at 6 dp on the
    ≤n_bins grid."""
    first_purchase = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp_ts"))
    )
    clicks = (
        events.where(
            (F.col("event_type") == "click") & F.col("value").isNotNull()
        )
        .join(first_purchase, "user_id", "left")
        .select(
            "value",
            "event_id",
            (
                F.col("fp_ts").isNotNull() & (F.col("fp_ts") > F.col("ts"))
            ).cast("int").alias("good"),
        )
    )
    from ..ranks import with_global_row_number

    ranked = with_global_row_number(
        clicks,
        F.floor("value").cast("long"),  # monotone in the leading order key
        [F.col("value"), F.col("event_id")],
        out="rn",
    )
    n_tot = clicks.agg(F.count("*").cast("long").alias("n_tot"))
    # exact NTILE(n_bins): with q = n DIV bins and r = n % bins, buckets
    # 1..r hold q+1 rows, buckets r+1..bins hold q rows (guarded: the ELSE
    # branch only evaluates when q >= 1, i.e. rn > r)
    ntile_expr = F.expr(
        f"CAST(CASE WHEN rn <= (n_tot % {n_bins}) * ((n_tot DIV {n_bins}) + 1)"
        f" THEN (rn - 1) DIV ((n_tot DIV {n_bins}) + 1)"
        f" ELSE (n_tot % {n_bins})"
        f"  + (rn - (n_tot % {n_bins}) * ((n_tot DIV {n_bins}) + 1) - 1)"
        f"    DIV (n_tot DIV {n_bins})"
        f" END + 1 AS INT)"
    )
    binned = ranked.crossJoin(F.broadcast(n_tot)).select(
        ntile_expr.alias("bin"), "good"
    )
    cells = binned.groupBy("bin").agg(
        F.sum("good").alias("n_good"),
        F.sum(1 - F.col("good")).alias("n_bad"),
    )
    totals = cells.agg(
        F.sum("n_good").alias("t_good"), F.sum("n_bad").alias("t_bad")
    )
    gp = (F.col("n_good") + 1).cast("double") / (
        F.col("t_good") + n_bins
    ).cast("double")
    bp = (F.col("n_bad") + 1).cast("double") / (
        F.col("t_bad") + n_bins
    ).cast("double")
    woe = F.log(gp / bp)
    return (
        cells.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_good",
            "n_bad",
            F.round(woe, 6).alias("woe"),
            F.round((gp - bp) * woe, 6).alias("iv_contrib"),
        )
        .orderBy("bin")
    )


def woe_iv_binning_sql(n_bins: int = WOE_BINS) -> str:
    return f"""
        WITH first_purchase AS (
            SELECT user_id, MIN(ts) AS fp_ts
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ), clicks AS (
            SELECT value, event_id,
                   CAST(fp_ts IS NOT NULL AND fp_ts > c.ts AS INT) AS good
            FROM events c LEFT JOIN first_purchase USING (user_id)
            WHERE c.event_type = 'click' AND value IS NOT NULL
        ), binned AS (
            SELECT ntile({n_bins}) OVER (ORDER BY value, event_id) AS bin, good
            FROM clicks
        ), cells AS (
            SELECT bin, CAST(SUM(good) AS BIGINT) AS n_good,
                   CAST(SUM(1 - good) AS BIGINT) AS n_bad
            FROM binned GROUP BY bin
        ), totals AS (
            SELECT SUM(n_good) AS t_good, SUM(n_bad) AS t_bad FROM cells
        )
        SELECT bin, n_good, n_bad,
               round(ln((CAST(n_good + 1 AS DOUBLE) / CAST(t_good + {n_bins} AS DOUBLE))
                        / (CAST(n_bad + 1 AS DOUBLE) / CAST(t_bad + {n_bins} AS DOUBLE))), 6)
                   AS woe,
               round((CAST(n_good + 1 AS DOUBLE) / CAST(t_good + {n_bins} AS DOUBLE)
                      - CAST(n_bad + 1 AS DOUBLE) / CAST(t_bad + {n_bins} AS DOUBLE))
                     * ln((CAST(n_good + 1 AS DOUBLE) / CAST(t_good + {n_bins} AS DOUBLE))
                          / (CAST(n_bad + 1 AS DOUBLE) / CAST(t_bad + {n_bins} AS DOUBLE))), 6)
                   AS iv_contrib
        FROM cells CROSS JOIN totals
        ORDER BY bin
    """


def proportion_ztest(events: DataFrame) -> DataFrame:
    """Two-proportion z-test per event type: does the parity-cohort split
    convert (event carries value > its type median? no — simpler and exact:
    event's user made ANY purchase) at different rates — the COUNT
    companion to welch_ab_test's means. All inputs are integer counts from
    one conditional aggregate; z = (p̂_a − p̂_b)/√(p̂(1−p̂)(1/n_a+1/n_b))
    assembles in identical closed form; degenerate pools report NULL."""
    purchasers = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    marked = events.join(purchasers, "user_id", "left").select(
        "event_type",
        "user_id",
        F.coalesce("converted", F.lit(0)).alias("conv"),
        (F.col("user_id") % 2 == 0).cast("int").alias("in_a"),
    )
    per_user = marked.groupBy("event_type", "user_id").agg(
        F.first("conv").alias("conv"), F.first("in_a").alias("in_a")
    )
    agg = per_user.groupBy("event_type").agg(
        F.sum(F.when(F.col("in_a") == 1, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("in_a") == 1, F.col("conv")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("in_a") == 0, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("in_a") == 0, F.col("conv")).otherwise(0)).alias("c_b"),
    )
    pa = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (1.0 - pool)
        * (
            1.0 / F.col("n_a").cast("double")
            + 1.0 / F.col("n_b").cast("double")
        )
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (pool > 0) & (pool < 1)
    return agg.select(
        "event_type",
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(F.when(ok, (pa - pb) / se), 6).alias("z_stat"),
    ).orderBy("event_type")


PROPORTION_ZTEST_SQL = """
    WITH purchasers AS (
        SELECT DISTINCT user_id, 1 AS converted
        FROM events WHERE event_type = 'purchase'
    ), per_user AS (
        SELECT event_type, e.user_id,
               ANY_VALUE(COALESCE(converted, 0)) AS conv,
               ANY_VALUE(CAST(e.user_id % 2 = 0 AS INT)) AS in_a
        FROM events e LEFT JOIN purchasers p ON e.user_id = p.user_id
        GROUP BY event_type, e.user_id
    ), agg AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN in_a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN in_a = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
               CAST(SUM(CASE WHEN in_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN in_a = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_b
        FROM per_user GROUP BY event_type
    )
    SELECT event_type, n_a, c_a, n_b, c_b,
           round(CASE WHEN n_a > 0 AND n_b > 0
                       AND (c_a + c_b) > 0 AND (c_a + c_b) < (n_a + n_b)
                      THEN (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                            - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                           / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                                  * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
                 END, 6) AS z_stat
    FROM agg
    ORDER BY event_type
"""


# --- bot / automation detection --------------------------------------------------

BOT_MIN_EVENTS = 20
BOT_CV_MILLI_MAX = 100


def bot_regularity_scores(
    events: DataFrame,
    min_events: int = BOT_MIN_EVENTS,
    cv_milli_max: int = BOT_CV_MILLI_MAX,
) -> DataFrame:
    """Per-user automation signal from inter-arrival regularity: humans emit
    bursty, high-variance gaps; schedulers and scripts tick with a clock-like
    cadence. The flag is a low coefficient of variation (std/mean of gaps)
    over enough events — the standard first-pass bot filter a training-data
    pipeline runs before user-generated text is trusted.

    Exact arithmetic: gaps are integer SECONDS (µs-exact timestamps, integer
    division), Σg and Σg² are order-free integer sums, and cv derives as
    round(1000·√(n·Σg²−(Σg)²)/Σg) — one sqrt/division chain on identical
    exact operands per engine. One user-keyed window (the rolling-stats
    shuffle shape) + one user aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "user_id", "ts", "event_id", F.unix_micros("ts").alias("us")
        )
        .select(
            "user_id",
            # explicit FLOOR on both engines: Spark's cast(double→long)
            # truncates while DuckDB's rounds, so a bare cast diverges on
            # fractional-second gaps
            F.floor((F.col("us") - F.lag("us").over(w)) / 1_000_000)
            .cast("long")
            .alias("gap_s"),
        )
        .where(F.col("gap_s").isNotNull())
    )
    agg = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap_s").alias("s"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("ss"),
    )
    cv = F.when(
        F.col("s") > 0,
        F.round(
            F.lit(1000.0)
            * F.sqrt(
                (F.col("n_gaps") * F.col("ss") - F.col("s") * F.col("s")).cast(
                    "double"
                )
            )
            / F.col("s")
        ).cast("long"),
    )
    return (
        agg.select(
            "user_id",
            "n_gaps",
            F.round(F.col("s") / F.col("n_gaps")).cast("long").alias("mean_gap_s"),
            cv.alias("cv_milli"),
        )
        .select(
            "user_id",
            "n_gaps",
            "mean_gap_s",
            "cv_milli",
            (
                (F.col("n_gaps") >= min_events)
                & F.col("cv_milli").isNotNull()
                & (F.col("cv_milli") <= cv_milli_max)
            ).alias("is_bot"),
        )
        .orderBy("user_id")
    )


def bot_regularity_scores_sql(
    min_events: int = BOT_MIN_EVENTS, cv_milli_max: int = BOT_CV_MILLI_MAX
) -> str:
    return f"""
        WITH gaps AS (
            SELECT user_id,
                   CAST(FLOOR((epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) / 1000000) AS BIGINT) AS gap_s
            FROM events
        ), agg AS (
            SELECT user_id, COUNT(*) AS n_gaps,
                   CAST(SUM(gap_s) AS BIGINT) AS s,
                   CAST(SUM(gap_s * gap_s) AS BIGINT) AS ss
            FROM gaps WHERE gap_s IS NOT NULL
            GROUP BY user_id
        ), scored AS (
            SELECT user_id, n_gaps,
                   CAST(round(CAST(s AS DOUBLE) / n_gaps) AS BIGINT)
                       AS mean_gap_s,
                   CASE WHEN s > 0 THEN CAST(round(
                       1000.0 * sqrt(CAST(n_gaps * ss - s * s AS DOUBLE)) / s)
                       AS BIGINT) END AS cv_milli
            FROM agg
        )
        SELECT user_id, n_gaps, mean_gap_s, cv_milli,
               n_gaps >= {min_events}
                   AND cv_milli IS NOT NULL
                   AND cv_milli <= {cv_milli_max} AS is_bot
        FROM scored
        ORDER BY user_id
    """


# --- one-way ANOVA across day-of-week groups ------------------------------------


def dow_anova(events: DataFrame) -> DataFrame:
    """One-way ANOVA F-statistic for event value across day-of-week groups —
    the seasonality significance test completing the stats family
    (chi-square for counts, Welch for two means, ANOVA for k means).

    Sufficient statistics are EXACT integer cents (one rounding per value,
    then order-free integer Σv / Σv² per group — never a distributed float
    sum); SSB/SSW/F are closed-form doubles over those exact integers,
    rounded at 6 dp. Day-of-week is pure date arithmetic
    (days-since-Monday-epoch mod 7) so both engines bucket identically.
    Plan: one 7-group aggregate, one 1-row reduction."""
    vc = F.expr("CAST(round(value * 100) AS BIGINT)")
    dow = F.expr(
        "CAST(datediff(CAST(ts AS DATE), DATE'1970-01-05') % 7 AS INT)"
    )
    per = (
        events.select(dow.alias("dow"), vc.alias("vc"))
        .groupBy("dow")
        .agg(
            F.count("*").alias("n"),
            F.sum("vc").alias("s"),
            F.sum(F.col("vc") * F.col("vc")).alias("q"),
        )
    )
    tot = per.agg(
        F.count("*").cast("long").alias("k_groups"),
        F.sum("n").cast("long").alias("n_events"),
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias("sb"),
        F.sum("s").cast("double").alias("st"),
        F.sum("q").cast("double").alias("qt"),
    )
    ssb = (F.col("sb") - F.col("st") * F.col("st") / F.col("n_events")) / 1e4
    ssw = (F.col("qt") - F.col("sb")) / 1e4
    ok = (F.col("k_groups") > 1) & (F.col("n_events") > F.col("k_groups"))
    f = (ssb / (F.col("k_groups") - 1)) / (
        ssw / (F.col("n_events") - F.col("k_groups"))
    )
    return tot.select(
        "k_groups",
        "n_events",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(F.when(ok & (ssw > 0), f), 6).alias("f_stat"),
    )


DOW_ANOVA_SQL = """
    WITH per AS (
        SELECT CAST(datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7
                    AS INT) AS dow,
               COUNT(*) AS n,
               SUM(CAST(round(value * 100) AS BIGINT)) AS s,
               SUM(CAST(round(value * 100) AS BIGINT)
                   * CAST(round(value * 100) AS BIGINT)) AS q
        FROM events
        GROUP BY 1
    ),
    tot AS (
        SELECT COUNT(*) AS k_groups,
               CAST(SUM(n) AS BIGINT) AS n_events,
               SUM(CAST(s AS DOUBLE) * s / n) AS sb,
               CAST(SUM(s) AS DOUBLE) AS st,
               CAST(SUM(q) AS DOUBLE) AS qt
        FROM per
    )
    SELECT k_groups, n_events,
           round((sb - st * st / n_events) / 1e4, 6) AS ss_between,
           round((qt - sb) / 1e4, 6) AS ss_within,
           round(CASE WHEN k_groups > 1 AND n_events > k_groups
                           AND (qt - sb) > 0
                      THEN ((sb - st * st / n_events) / (k_groups - 1))
                           / ((qt - sb) / (n_events - k_groups))
                 END, 6) AS f_stat
    FROM tot
"""


# --- A/B test power analysis ----------------------------------------------------

POWER_Z_ALPHA_MICRO = 1_959_964  # z_{0.975}, two-sided α = 0.05
POWER_Z_BETA_MICRO = 841_621     # z_{0.80}, power = 80%
POWER_MDE_MILLI = 50             # detect a 5% relative lift


def power_analysis(events: DataFrame) -> DataFrame:
    """Sample-size calculator per event type for the A/B harness (the design
    step welch_ab_test analyzes after the fact): n per arm =
    2σ²(z_α + z_β)² / δ² with δ = 5% of the current mean — how long an
    experiment on this metric must run before the test can see the lift.

    σ² and the mean come from exact-cents integer sums (order-free); the
    closed form evaluates in deterministic doubles and CEILs to a whole
    user count. Degenerate metrics (zero mean or variance) yield NULL."""
    vc = F.expr("CAST(round(value * 100) AS BIGINT)")
    agg = (
        events.select("event_type", vc.alias("vc"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum("vc").alias("s"),
            F.sum(F.col("vc") * F.col("vc")).alias("q"),
        )
    )
    n, s, q = F.col("n_obs"), F.col("s").cast("double"), F.col("q").cast("double")
    mean = s / n
    var = (q - s * s / n) / (n - 1)
    z = (POWER_Z_ALPHA_MICRO + POWER_Z_BETA_MICRO) / 1e6
    delta = mean * (POWER_MDE_MILLI / 1000)
    ok = (n > 1) & (var > 0) & (mean > 0)
    n_req = F.ceil(2.0 * var * z * z / (delta * delta)).cast("long")
    return agg.select(
        "event_type",
        "n_obs",
        F.round(mean / 100, 6).alias("mean_value"),
        F.round(F.when(n > 1, var) / 10000, 6).alias("variance"),
        F.when(ok, n_req).alias("n_per_arm"),
    ).orderBy("event_type")


POWER_ANALYSIS_SQL = f"""
    WITH agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS s,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS q
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, n_obs,
           round(s / n_obs / 100, 6) AS mean_value,
           round(CASE WHEN n_obs > 1
                      THEN (q - s * s / n_obs) / (n_obs - 1) END / 10000, 6)
               AS variance,
           CASE WHEN n_obs > 1 AND (q - s * s / n_obs) / (n_obs - 1) > 0
                     AND s > 0
                THEN CAST(ceil(
                     2.0 * ((q - s * s / n_obs) / (n_obs - 1))
                     * {(POWER_Z_ALPHA_MICRO + POWER_Z_BETA_MICRO) / 1e6!r}
                     * {(POWER_Z_ALPHA_MICRO + POWER_Z_BETA_MICRO) / 1e6!r}
                     / ((s / n_obs * {POWER_MDE_MILLI / 1000!r})
                        * (s / n_obs * {POWER_MDE_MILLI / 1000!r}))
                ) AS BIGINT) END AS n_per_arm
    FROM agg
    ORDER BY event_type
"""


# --- Mann-Whitney U (rank-sum) test ---------------------------------------------

MW_GROUP_A = "click"
MW_GROUP_B = "view"


def mannwhitney_u(
    events: DataFrame, group_a: str = MW_GROUP_A, group_b: str = MW_GROUP_B
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two event types' value
    distributions: (n_a, n_b, u2_a, u2_b, tie_cubes, var_milli).

    The nonparametric twin of the Welch t-test — rank-based, so heavy tails
    and outliers can't dominate. Everything is EXACT integer arithmetic:
    values quantize to cents, tie groups get the textbook average rank as
    2·rank (2b + m + 1, an integer), so u2_* are 2·U. The normal-approx
    variance (with the tie correction) keeps its tie term exact via the
    integer /6 identity and quantizes once through an identically-
    associated double expression; z = (U − n_a·n_b/2)/σ is one sqrt away downstream.

    Scale shape: one value-grain aggregate (cents, group) → one ordered
    window over the DISTINCT-value relation (bounded by value cardinality,
    not row count) → a 1-row summary. No data-sized sort."""
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    base = events.where(
        F.col("event_type").isin(group_a, group_b)
    ).select(
        cents.alias("v"),
        (F.col("event_type") == group_a).cast("long").alias("in_a"),
    )
    per_v = base.groupBy("v").agg(
        F.count("*").alias("m"),
        F.sum("in_a").alias("m_a"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.select(
        "v",
        "m",
        "m_a",
        F.coalesce(F.sum("m").over(wv), F.lit(0)).alias("b"),
    )
    agg = ranked.agg(
        F.sum("m_a").alias("n_a"),
        F.sum(F.col("m") - F.col("m_a")).alias("n_b"),
        F.sum(F.col("m_a") * (2 * F.col("b") + F.col("m") + 1)).alias("r2_a"),
        F.sum(
            F.when(F.col("m") > 1, F.col("m") * F.col("m") * F.col("m") - F.col("m"))
            .otherwise(0)
        ).alias("tie_cubes"),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.expr("CAST(r2_a - n_a * (n_a + 1) AS BIGINT)").alias("u2_a"),
        F.expr("CAST(2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS BIGINT)").alias(
            "u2_b"
        ),
        F.col("tie_cubes").cast("long").alias("tie_cubes"),
        # m6 = ((n^3 - n) - tie_cubes)/6 is exact (t^3 - t is divisible by
        # 6), so the only non-integer step is ONE double expression whose
        # operands and association are written identically in both engines
        # (the entropy-division precedent) - bit-stable without int64-
        # overflowing products.
        F.expr(
            """CAST(CASE WHEN n_a + n_b >= 2 THEN round(((1000.0 * n_a) * n_b)
                    * CAST((((n_a + n_b) * (n_a + n_b) * (n_a + n_b)
                             - (n_a + n_b)) - tie_cubes) DIV 6 AS DOUBLE)
                    / (((2.0 * (n_a + n_b)) * (n_a + n_b - 1))))
                    ELSE 0 END AS BIGINT)"""
        ).alias("var_milli"),
    )


def mannwhitney_u_sql(
    group_a: str = MW_GROUP_A, group_b: str = MW_GROUP_B
) -> str:
    return f"""
        WITH base AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS v,
                   CASE WHEN event_type = '{group_a}' THEN 1 ELSE 0 END AS in_a
            FROM events WHERE event_type IN ('{group_a}', '{group_b}')
        ),
        per_v AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(in_a) AS BIGINT) AS m_a
            FROM base GROUP BY v
        ),
        ranked AS (
            SELECT v, m, m_a,
                   COALESCE(SUM(m) OVER (
                       ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS b
            FROM per_v
        ),
        agg AS (
            SELECT CAST(SUM(m_a) AS BIGINT) AS n_a,
                   CAST(SUM(m - m_a) AS BIGINT) AS n_b,
                   CAST(SUM(m_a * (2 * b + m + 1)) AS BIGINT) AS r2_a,
                   CAST(SUM(CASE WHEN m > 1 THEN m * m * m - m ELSE 0 END)
                        AS BIGINT) AS tie_cubes
            FROM ranked
        )
        SELECT n_a, n_b,
               CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
               CAST(2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS BIGINT) AS u2_b,
               tie_cubes,
               CAST(CASE WHEN n_a + n_b >= 2 THEN round(((1000.0 * n_a) * n_b)
                    * CAST((((n_a + n_b) * (n_a + n_b) * (n_a + n_b)
                             - (n_a + n_b)) - tie_cubes) // 6 AS DOUBLE)
                    / (((2.0 * (n_a + n_b)) * (n_a + n_b - 1))))
                    ELSE 0 END AS BIGINT)
                   AS var_milli
        FROM agg
    """


# --- Kendall tau-a rank correlation ----------------------------------------------

KENDALL_X_TYPE = "click"
KENDALL_Y_TYPE = "error"


def kendall_tau_daily(
    events: DataFrame, x_type: str = KENDALL_X_TYPE, y_type: str = KENDALL_Y_TYPE
) -> DataFrame:
    """Kendall tau-a between two event types' DAILY counts:
    (n_days, concordant, discordant, tied, tau_a_milli).

    The rank correlation that needs NO sqrt and NO rank-tie averaging —
    tau-a is a pure pairwise count ratio, so the whole statistic is exact
    integer arithmetic end to end (the abs/sign half-up emit at milli).
    Use it where Spearman/Pearson would put a float boundary in the plan.

    Scale shape: the day grid is a bounded aggregate (≤|days| rows); the
    pairwise comparison is a self-join on that bounded grid, never on raw
    events."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == x_type).cast("long")).alias("x"),
        F.sum((F.col("event_type") == y_type).cast("long")).alias("y"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        ((F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))).alias(
            "prod"
        )
    )
    agg = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("prod") > 0).cast("long")).alias("concordant"),
        F.sum((F.col("prod") < 0).cast("long")).alias("discordant"),
        F.sum((F.col("prod") == 0).cast("long")).alias("tied"),
    )
    # 1-row scalar rides the plan as a broadcast cross join (the allowlisted
    # scalar-broadcast pattern, same as events_acf_daily/events_xcorr_daily)
    # rather than an eager driver-side count() at plan-construction time.
    day_count = daily.agg(F.count("*").cast("long").alias("n_days"))
    return agg.crossJoin(F.broadcast(day_count)).select(
        "n_days",
        "concordant",
        "discordant",
        "tied",
        # n_pairs = 0 (a one-day grid) must not divide under ANSI
        F.expr(
            "CAST(CASE WHEN n_pairs > 0 THEN SIGN(concordant - discordant) *"
            " ((2 * 1000 * ABS(concordant - discordant) + n_pairs)"
            "  DIV (2 * n_pairs)) ELSE 0 END AS BIGINT)"
        ).alias("tau_a_milli"),
    )


def kendall_tau_daily_sql(
    x_type: str = KENDALL_X_TYPE, y_type: str = KENDALL_Y_TYPE
) -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = '{x_type}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = '{y_type}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        pairs AS (
            SELECT (a.x - b.x) * (a.y - b.y) AS prod
            FROM daily a JOIN daily b ON a.day < b.day
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS concordant,
                   CAST(SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS discordant,
                   CAST(SUM(CASE WHEN prod = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS tied
            FROM pairs
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
               concordant, discordant, tied,
               CAST(CASE WHEN n_pairs > 0 THEN SIGN(concordant - discordant) *
                    ((2 * 1000 * ABS(concordant - discordant) + n_pairs)
                     // (2 * n_pairs)) ELSE 0 END AS BIGINT) AS tau_a_milli
        FROM agg
    """


# --- Poisson bootstrap confidence interval -------------------------------------------

BOOT_B = 32
# P(Poisson(1) <= j) thresholds, written as identical double literals in both
# engines; u below threshold j selects weight j (inverse-CDF lookup, capped 5)
_POIS_CDF = (
    0.36787944117144233,  # w=0
    0.7357588823428847,   # w=1
    0.9196986029286058,   # w=2
    0.9810118431238462,   # w=3
    0.9963401531726563,   # w=4
)


def poisson_bootstrap_ci(events: DataFrame, b: int = BOOT_B) -> DataFrame:
    """Poisson-bootstrap confidence interval for each event type's mean
    value: (event_type, n, mean_cents, ci_lo_cents, ci_hi_cents).

    THE distributed bootstrap: classical resampling needs n draws with
    replacement (global coordination), the Poisson(1) approximation gives
    every row an independent weight — one narrow projection per replicate,
    no shared state, the standard large-scale A/B machinery. Weights come
    from an md5-derived uniform through the inverse Poisson CDF (thresholds
    are identical double literals in both engines), so every replicate is
    deterministic and the whole interval is oracle-checkable. Replicate
    means stay exact (integer-cent numerators / integer weights) until one
    half-up emit; the CI is the 2.5%/97.5% rank of the B replicate means.

    Scale shape: the replicate dimension is a bounded explode (×B rows
    BEFORE the map-side partial agg — the ROLLUP Expand economics); both
    aggregates are (type, rep)- then type-keyed. B=32 replicates cost one
    scan."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep")
    u = (
        F.expr(
            "CAST(conv(substring(md5(concat_ws('_', CAST(event_id AS STRING),"
            " CAST(rep AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        / F.lit(float(1 << 60))
    )
    w = (
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .when(u < _POIS_CDF[4], 4)
        .otherwise(5)
    )
    weighted = events.select(
        "event_type",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        reps,
    ).select("event_type", "rep", w.alias("w"), "cents")
    rep_means = (
        weighted.groupBy("event_type", "rep")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("num"),
            F.sum("w").alias("den"),
        )
        .where(F.col("den") > 0)
        .select(
            "event_type",
            "rep",
            F.expr("CAST((2 * num + den) DIV (2 * den) AS BIGINT)").alias(
                "rep_mean"
            ),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("rep_mean", "rep")
    ranked = rep_means.select(
        "event_type",
        "rep_mean",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(Window.partitionBy("event_type")).alias("nb"),
    )
    lo_rk = F.expr("GREATEST(CAST(nb * 25 DIV 1000 AS INT), 1)")
    hi_rk = F.expr("LEAST(CAST((nb * 975 + 999) DIV 1000 AS INT), nb)")
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rk") == lo_rk, F.col("rep_mean"))).alias(
            "ci_lo_cents"
        ),
        F.min(F.when(F.col("rk") == hi_rk, F.col("rep_mean"))).alias(
            "ci_hi_cents"
        ),
    )
    base = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr(
            "CAST((2 * SUM(CAST(round(value * 100) AS BIGINT)) + COUNT(*))"
            " DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("mean_cents"),
    )
    return (
        base.join(bounds, "event_type")
        .select("event_type", "n", "mean_cents", "ci_lo_cents", "ci_hi_cents")
        .orderBy("event_type")
    )


def poisson_bootstrap_ci_sql(b: int = BOOT_B) -> str:
    u = (
        "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '_' ||"
        " CAST(rep AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT"
        f" / {float(1 << 60)!r}"
    )
    w = f"""CASE WHEN {u} < {_POIS_CDF[0]!r} THEN 0
                 WHEN {u} < {_POIS_CDF[1]!r} THEN 1
                 WHEN {u} < {_POIS_CDF[2]!r} THEN 2
                 WHEN {u} < {_POIS_CDF[3]!r} THEN 3
                 WHEN {u} < {_POIS_CDF[4]!r} THEN 4
                 ELSE 5 END"""
    return f"""
        WITH weighted AS (
            SELECT event_type, rep,
                   {w} AS w,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM (
                SELECT event_type, event_id, value,
                       unnest(generate_series(0, {b - 1})) AS rep
                FROM events
            )
        ),
        rep_means AS (
            SELECT event_type, rep,
                   CAST((2 * SUM(w * cents) + SUM(w)) // (2 * SUM(w))
                        AS BIGINT) AS rep_mean
            FROM weighted GROUP BY event_type, rep
            HAVING SUM(w) > 0
        ),
        ranked AS (
            SELECT event_type, rep_mean,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY rep_mean, rep) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS nb
            FROM rep_means
        ),
        bounds AS (
            SELECT event_type,
                   MIN(CASE WHEN rk = GREATEST(CAST(nb * 25 // 1000 AS INT), 1)
                            THEN rep_mean END) AS ci_lo_cents,
                   MIN(CASE WHEN rk = LEAST(CAST((nb * 975 + 999) // 1000
                                                 AS INT), nb)
                            THEN rep_mean END) AS ci_hi_cents
            FROM ranked GROUP BY event_type
        ),
        base AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST((2 * SUM(CAST(round(value * 100) AS BIGINT))
                         + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
                       AS mean_cents
            FROM events GROUP BY event_type
        )
        SELECT b.event_type, b.n, b.mean_cents, c.ci_lo_cents, c.ci_hi_cents
        FROM base b JOIN bounds c USING (event_type)
        ORDER BY b.event_type
    """


# --- difference-in-differences -------------------------------------------------------

DID_TREAT_TYPE = "signup"


def diff_in_diff(events: DataFrame, treat_type: str = DID_TREAT_TYPE) -> DataFrame:
    """Difference-in-differences estimate of the treatment effect on mean
    event value: (grp, period, n, mean_cents) for the 2×2 panel plus a
    ('did', 'effect') row — the workhorse quasi-experimental estimator.

    Treatment group = users who ever emit ``treat_type`` (the natural
    experiment proxy); periods split at the corpus midpoint timestamp
    (min+max)/2 — both content-derived, so the panel is deterministic.
    Cell means are exact half-up integer cents; the DiD effect
    (T_post − T_pre) − (C_post − C_pre) is plain integer arithmetic on
    them — no float anywhere.

    Scale shape: the treated-user set is one aggregate semi-joined back
    (broadcast at any realistic treated-fraction); the panel is a 4-group
    aggregate; the midpoint is a 1-row broadcast scalar."""
    treated = events.where(F.col("event_type") == treat_type).select(
        "user_id"
    ).distinct()
    span = events.agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    labeled = (
        events.crossJoin(F.broadcast(span))
        .join(
            F.broadcast(treated.withColumn("is_treated", F.lit(True))),
            "user_id",
            "left",
        )
        .select(
            F.when(F.col("is_treated"), "treatment")
            .otherwise("control")
            .alias("grp"),
            F.when(
                F.expr("unix_micros(ts) * 2 >= unix_micros(t0) + unix_micros(t1)"),
                "post",
            )
            .otherwise("pre")
            .alias("period"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    panel = labeled.groupBy("grp", "period").agg(
        F.count("*").alias("n"),
        F.expr(
            "CAST((2 * SUM(cents) + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("mean_cents"),
    )
    # DiD from the four cells without a pivot (engine-identical path):
    eff = panel.agg(
        F.sum(
            F.when(
                (F.col("grp") == "treatment") & (F.col("period") == "post"),
                F.col("mean_cents"),
            )
            .when(
                (F.col("grp") == "treatment") & (F.col("period") == "pre"),
                -F.col("mean_cents"),
            )
            .when(
                (F.col("grp") == "control") & (F.col("period") == "post"),
                -F.col("mean_cents"),
            )
            .when(
                (F.col("grp") == "control") & (F.col("period") == "pre"),
                F.col("mean_cents"),
            )
        ).alias("mean_cents")
    ).select(
        F.lit("did").alias("grp"),
        F.lit("effect").alias("period"),
        F.lit(0).cast("long").alias("n"),
        F.col("mean_cents").cast("long"),
    )
    return panel.select("grp", "period", "n", "mean_cents").unionByName(
        eff
    ).orderBy("grp", "period")


def diff_in_diff_sql(treat_type: str = DID_TREAT_TYPE) -> str:
    return f"""
        WITH treated AS (
            SELECT DISTINCT user_id FROM events
            WHERE event_type = '{treat_type}'
        ),
        span AS (
            SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM events
        ),
        labeled AS (
            SELECT CASE WHEN t.user_id IS NOT NULL
                        THEN 'treatment' ELSE 'control' END AS grp,
                   CASE WHEN epoch_us(e.ts) * 2 >= epoch_us(s.t0) + epoch_us(s.t1)
                        THEN 'post' ELSE 'pre' END AS period,
                   CAST(round(e.value * 100) AS BIGINT) AS cents
            FROM events e
            CROSS JOIN span s
            LEFT JOIN treated t ON e.user_id = t.user_id
        ),
        panel AS (
            SELECT grp, period, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST((2 * SUM(cents) + COUNT(*)) // (2 * COUNT(*))
                        AS BIGINT) AS mean_cents
            FROM labeled GROUP BY grp, period
        )
        SELECT grp, period, n, mean_cents FROM panel
        UNION ALL
        SELECT 'did' AS grp, 'effect' AS period, CAST(0 AS BIGINT) AS n,
               CAST(SUM(CASE
                    WHEN grp = 'treatment' AND period = 'post' THEN mean_cents
                    WHEN grp = 'treatment' AND period = 'pre' THEN -mean_cents
                    WHEN grp = 'control' AND period = 'post' THEN -mean_cents
                    WHEN grp = 'control' AND period = 'pre' THEN mean_cents
                    END) AS BIGINT) AS mean_cents
        FROM panel
        ORDER BY grp, period
    """


# --- person-time incidence rates -----------------------------------------------------


def person_time_rates(events: DataFrame) -> DataFrame:
    """Exposure-adjusted incidence rates per event type: events per 1000
    user-days of observed exposure (the epidemiology denominator — raw
    counts mislead when users are observed for different spans): (event_type,
    n_events, person_days, rate_per_1000_days).

    Person-time is each user's observed span (first..last activity day,
    inclusive) summed over users; every type shares the denominator, so
    rates are comparable. Two map-side-combined aggregates (user grain for
    spans, type grain for counts) and one milli division on exact integers.

    Scale shape: no window, no join against the fact — the span aggregate
    and the type aggregate shuffle once each on their natural keys; the
    final combine is |types| rows against a 1-row broadcast scalar."""
    spans = (
        events.groupBy("user_id")
        .agg(
            (
                F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1
            ).alias("span_days")
        )
        .agg(F.sum("span_days").cast("long").alias("person_days"))
    )
    by_type = events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events")
    )
    return (
        by_type.crossJoin(F.broadcast(spans))
        .select(
            "event_type",
            "n_events",
            "person_days",
            F.expr(
                "CAST(1000 * n_events DIV person_days AS BIGINT)"
            ).alias("rate_per_1000_days"),
        )
        .orderBy("event_type")
    )


PERSON_TIME_RATES_SQL = """
    WITH spans AS (
        SELECT CAST(SUM(span_days) AS BIGINT) AS person_days
        FROM (
            SELECT user_id,
                   date_diff('day', MIN(CAST(ts AS DATE)),
                             MAX(CAST(ts AS DATE))) + 1 AS span_days
            FROM events GROUP BY user_id
        )
    ),
    by_type AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_events, person_days,
           CAST(1000 * n_events // person_days AS BIGINT)
               AS rate_per_1000_days
    FROM by_type CROSS JOIN spans
    ORDER BY event_type
"""


# --- inverse-propensity-weighted treatment effect ------------------------------------

IPW_STRATA = 5


def ipw_ate(events: DataFrame) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect with a KNOWN
    stratified propensity — the estimator that un-biases a naive mean
    difference when treatment assignment depends on activity: users fall
    into {IPW_STRATA} activity strata, the (synthetic) assignment rule
    treats more-active strata more often (p = 200 + 100·stratum milli —
    exactly the confounding that inflates naive comparisons, since active
    users also spend more), and the Hájek estimate reweights each group by
    1/p (treated) or 1/(1−p) (control). Output: one panel row (n_users,
    n_treated, ipw_treated_mean_cents, ipw_control_mean_cents, ate_cents,
    naive_ate_cents).

    Exactness: propensities are milli constants per stratum, weights are
    the pinned integer rule 10^6 DIV p_milli, and both Hájek means are
    single floor divisions of exact BIGINT sums. The naive column sits
    beside the corrected one to show the bias the estimator removes.

    Scale shape: two user-grain aggregates (activity for strata, purchase
    cents for outcomes) and one |strata|-bounded rollup."""
    per_user = events.groupBy("user_id").agg(
        F.count("*").alias("n_ev"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("y_cents"),
    )
    stratum = F.least(
        F.lit(IPW_STRATA - 1), F.expr("n_ev DIV 40")
    ).alias("stratum")
    treated = (
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 1000"
        )
        < (200 + 100 * F.least(F.lit(IPW_STRATA - 1), F.expr("n_ev DIV 40")))
    ).alias("treated")
    assigned = per_user.select(
        "user_id", "y_cents", stratum, treated
    ).withColumn("p_milli", 200 + 100 * F.col("stratum"))
    w_t = F.expr("CAST(1000000 DIV p_milli AS BIGINT)")
    w_c = F.expr("CAST(1000000 DIV (1000 - p_milli) AS BIGINT)")
    agg = assigned.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.when(F.col("treated"), 1).otherwise(0))
        .cast("long")
        .alias("n_treated"),
        F.sum(F.when(F.col("treated"), w_t * F.col("y_cents")).otherwise(0)).alias(
            "t_num"
        ),
        F.sum(F.when(F.col("treated"), w_t).otherwise(0)).alias("t_den"),
        F.sum(
            F.when(~F.col("treated"), w_c * F.col("y_cents")).otherwise(0)
        ).alias("c_num"),
        F.sum(F.when(~F.col("treated"), w_c).otherwise(0)).alias("c_den"),
        F.sum(F.when(F.col("treated"), F.col("y_cents")).otherwise(0)).alias(
            "t_raw"
        ),
        F.sum(F.when(~F.col("treated"), F.col("y_cents")).otherwise(0)).alias(
            "c_raw"
        ),
    )
    return agg.select(
        "n_users",
        "n_treated",
        F.expr("CAST(t_num DIV t_den AS BIGINT)").alias(
            "ipw_treated_mean_cents"
        ),
        F.expr("CAST(c_num DIV c_den AS BIGINT)").alias(
            "ipw_control_mean_cents"
        ),
        F.expr(
            "CAST(t_num DIV t_den AS BIGINT) - CAST(c_num DIV c_den AS BIGINT)"
        ).alias("ate_cents"),
        F.expr(
            "CAST(t_raw DIV n_treated AS BIGINT)"
            " - CAST(c_raw DIV (n_users - n_treated) AS BIGINT)"
        ).alias("naive_ate_cents"),
    )


IPW_ATE_SQL = f"""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n_ev,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y_cents
        FROM events GROUP BY user_id
    ),
    assigned AS (
        SELECT user_id, y_cents,
               LEAST({IPW_STRATA - 1}, n_ev // 40) AS stratum,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 1000
                   < 200 + 100 * LEAST({IPW_STRATA - 1}, n_ev // 40)
                   AS treated,
               200 + 100 * LEAST({IPW_STRATA - 1}, n_ev // 40) AS p_milli
        FROM per_user
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treated,
               SUM(CASE WHEN treated
                   THEN (1000000 // p_milli) * y_cents ELSE 0 END) AS t_num,
               SUM(CASE WHEN treated THEN 1000000 // p_milli ELSE 0 END)
                   AS t_den,
               SUM(CASE WHEN NOT treated
                   THEN (1000000 // (1000 - p_milli)) * y_cents ELSE 0 END)
                   AS c_num,
               SUM(CASE WHEN NOT treated
                   THEN 1000000 // (1000 - p_milli) ELSE 0 END) AS c_den,
               SUM(CASE WHEN treated THEN y_cents ELSE 0 END) AS t_raw,
               SUM(CASE WHEN NOT treated THEN y_cents ELSE 0 END) AS c_raw
        FROM assigned
    )
    SELECT n_users, n_treated,
           CAST(t_num // t_den AS BIGINT) AS ipw_treated_mean_cents,
           CAST(c_num // c_den AS BIGINT) AS ipw_control_mean_cents,
           CAST(t_num // t_den AS BIGINT) - CAST(c_num // c_den AS BIGINT)
               AS ate_cents,
           CAST(t_raw // n_treated AS BIGINT)
               - CAST(c_raw // (n_users - n_treated) AS BIGINT)
               AS naive_ate_cents
    FROM agg
"""


# --- Simpson's paradox detector ------------------------------------------------------

SIMPSON_STRATA = 3


def simpson_check(events: DataFrame) -> DataFrame:
    """Simpson's-paradox audit of the variant comparison: the overall
    conversion-rate difference is compared, SIGN ONLY and fully
    cross-multiplied (no rate ever materializes), against the same
    difference inside each activity stratum. A reversal — every stratum
    agreeing on one sign while the pooled comparison shows the other — is
    the aggregation artifact that has shipped wrong launch decisions;
    this is the gate that catches it. Output: one row per stratum plus
    'overall' (stratum, n_treat, conv_treat, n_ctrl, conv_ctrl,
    diff_sign, reversal_flag — flag repeated on all rows).

    Variants assign by user-id parity (the repo's variant_stats rule);
    strata are activity terciles via integer thresholds.

    Scale shape: one user-grain aggregate, one |strata|-bounded rollup,
    windows over ≤4 rows."""
    per_user = events.groupBy("user_id").agg(
        F.count("*").alias("n_ev"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    assigned = per_user.select(
        F.least(F.lit(SIMPSON_STRATA - 1), F.expr("n_ev DIV 67")).alias(
            "stratum"
        ),
        (F.col("user_id") % 2 == 1).alias("treat"),
        "conv",
    )
    cells = lambda df, label_col: (  # noqa: E731
        df.groupBy(label_col)
        .agg(
            F.sum(F.when(F.col("treat"), 1).otherwise(0)).cast("long").alias("n_treat"),
            F.sum(F.when(F.col("treat"), F.col("conv")).otherwise(0))
            .cast("long")
            .alias("conv_treat"),
            F.sum(F.when(~F.col("treat"), 1).otherwise(0)).cast("long").alias("n_ctrl"),
            F.sum(F.when(~F.col("treat"), F.col("conv")).otherwise(0))
            .cast("long")
            .alias("conv_ctrl"),
        )
    )
    strata = cells(
        assigned.withColumn("label", F.concat(F.lit("stratum_"), F.col("stratum"))),
        "label",
    )
    overall = cells(assigned.withColumn("label", F.lit("overall")), "label")
    panel = strata.unionByName(overall).withColumn(
        "diff_sign",
        F.expr(
            "CAST(SIGN(conv_treat * n_ctrl - conv_ctrl * n_treat) AS BIGINT)"
        ),
    )
    g = Window.partitionBy()
    return (
        panel.withColumn(
            "reversal_flag",
            (
                # all strata share one sign...
                (
                    F.max(
                        F.when(F.col("label") != "overall", F.col("diff_sign"))
                    ).over(g)
                    == F.min(
                        F.when(F.col("label") != "overall", F.col("diff_sign"))
                    ).over(g)
                )
                # ...and the overall sign differs from it
                & (
                    F.max(
                        F.when(F.col("label") == "overall", F.col("diff_sign"))
                    ).over(g)
                    != F.max(
                        F.when(F.col("label") != "overall", F.col("diff_sign"))
                    ).over(g)
                )
            ).cast("int"),
        )
        .orderBy("label")
    )


SIMPSON_CHECK_SQL = f"""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n_ev,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    assigned AS (
        SELECT LEAST({SIMPSON_STRATA - 1}, n_ev // 67) AS stratum,
               user_id % 2 = 1 AS treat, conv
        FROM per_user
    ),
    strata AS (
        SELECT 'stratum_' || CAST(stratum AS VARCHAR) AS label,
               CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
               CAST(SUM(CASE WHEN treat THEN conv ELSE 0 END) AS BIGINT)
                   AS conv_treat,
               CAST(SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ctrl,
               CAST(SUM(CASE WHEN NOT treat THEN conv ELSE 0 END) AS BIGINT)
                   AS conv_ctrl
        FROM assigned GROUP BY stratum
        UNION ALL
        SELECT 'overall',
               CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN treat THEN conv ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT treat THEN conv ELSE 0 END) AS BIGINT)
        FROM assigned
    ),
    signed AS (
        SELECT *,
               CAST(SIGN(conv_treat * n_ctrl - conv_ctrl * n_treat) AS BIGINT)
                   AS diff_sign
        FROM strata
    )
    SELECT label, n_treat, conv_treat, n_ctrl, conv_ctrl, diff_sign,
           CAST(
               MAX(CASE WHEN label <> 'overall' THEN diff_sign END) OVER ()
               = MIN(CASE WHEN label <> 'overall' THEN diff_sign END) OVER ()
               AND MAX(CASE WHEN label = 'overall' THEN diff_sign END) OVER ()
                   <> MAX(CASE WHEN label <> 'overall' THEN diff_sign END)
                      OVER ()
           AS INT) AS reversal_flag
    FROM signed
    ORDER BY label
"""


# --- Bayes-smoothed ranking ----------------------------------------------------------

BAYES_SEGMENTS = 10


def bayes_smoothed_ranking(events: DataFrame) -> DataFrame:
    """Small-sample ranking correction: user segments ranked by raw
    conversion rate NEXT TO the Beta(1,1)-smoothed posterior mean
    (x+1)/(n+2) — the add-one shrinkage that stops a 2-of-3 segment from
    outranking a 400-of-1000 one: (segment, n_users, n_conv, raw_milli,
    smooth_milli, rank_raw, rank_smooth, rank_moved).

    Both rates are floor-milli on exact integers; both rankings tie-break
    on segment id, so the rank_moved flags — the rows where shrinkage
    changes the decision — are bit-stable. The panel IS the lesson: sort
    by raw and by smooth and watch the small-n rows fall.

    Scale shape: one user-grain aggregate, one |segments| rollup, two
    windows over that bounded relation."""
    per_user = events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    seg = per_user.groupBy(
        (F.col("user_id") % BAYES_SEGMENTS).alias("segment")
    ).agg(F.count("*").alias("n"), F.sum("conv").alias("x"))
    rated = seg.select(
        "segment",
        F.col("n").cast("long").alias("n_users"),
        F.col("x").cast("long").alias("n_conv"),
        F.expr("CAST(1000 * x DIV n AS BIGINT)").alias("raw_milli"),
        F.expr("CAST(1000 * (x + 1) DIV (n + 2) AS BIGINT)").alias(
            "smooth_milli"
        ),
    )
    w_raw = Window.orderBy(F.desc("raw_milli"), "segment")
    w_sm = Window.orderBy(F.desc("smooth_milli"), "segment")
    return (
        rated.withColumn("rank_raw", F.row_number().over(w_raw).cast("long"))
        .withColumn("rank_smooth", F.row_number().over(w_sm).cast("long"))
        .withColumn(
            "rank_moved",
            (F.col("rank_raw") != F.col("rank_smooth")).cast("int"),
        )
        .orderBy("segment")
    )


BAYES_SMOOTHED_RANKING_SQL = f"""
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    seg AS (
        SELECT user_id % {BAYES_SEGMENTS} AS segment,
               COUNT(*) AS n, SUM(conv) AS x
        FROM per_user GROUP BY 1
    ),
    rated AS (
        SELECT segment,
               CAST(n AS BIGINT) AS n_users,
               CAST(x AS BIGINT) AS n_conv,
               CAST(1000 * x // n AS BIGINT) AS raw_milli,
               CAST(1000 * (x + 1) // (n + 2) AS BIGINT) AS smooth_milli
        FROM seg
    )
    SELECT segment, n_users, n_conv, raw_milli, smooth_milli,
           CAST(ROW_NUMBER() OVER (ORDER BY raw_milli DESC, segment)
               AS BIGINT) AS rank_raw,
           CAST(ROW_NUMBER() OVER (ORDER BY smooth_milli DESC, segment)
               AS BIGINT) AS rank_smooth,
           CAST(ROW_NUMBER() OVER (ORDER BY raw_milli DESC, segment)
                <> ROW_NUMBER() OVER (ORDER BY smooth_milli DESC, segment)
               AS INT) AS rank_moved
    FROM rated
    ORDER BY segment
"""


# --- mutual information (type x hour) ------------------------------------------------


def mutual_information(events: DataFrame) -> DataFrame:
    """Mutual information between event type and hour-of-day — does WHAT
    happen depend on WHEN (a routing/seasonality signal feature selection
    reads before crossing the two columns): one panel row (n_events,
    h_type_micro, h_hour_micro, mi_micro, nmi_milli).

    MI = Σ p_xy·ln(p_xy·N / (n_x·n_y)) decomposes over exact integer
    counts with ONE micro-nat quantization per ln operand (the
    user_entropy convention, applied to the joint grid): every cell
    contributes c_xy·(μ(c_xy) + μ(N) − μ(n_x) − μ(n_y)), an exact BIGINT
    sum divided once by N. Marginal entropies ride the same quantization;
    NMI = 2·MI/(Hx+Hy) is one milli division.

    Scale shape: one (type, hour) aggregate (the grid is ≤ types·24 rows),
    two marginal rollups joined back on their keys, 1-row combine."""
    micro = lambda col: F.round(F.log(col) * F.lit(1e6)).cast("long")  # noqa: E731
    joint = events.groupBy(
        "event_type", F.hour("ts").alias("hr")
    ).agg(F.count("*").alias("c_xy"))
    mx = joint.groupBy("event_type").agg(F.sum("c_xy").alias("n_x"))
    my = joint.groupBy("hr").agg(F.sum("c_xy").alias("n_y"))
    tot = joint.agg(F.sum("c_xy").alias("n_tot"))
    cells = (
        joint.join(mx, "event_type")
        .join(my, "hr")
        .crossJoin(F.broadcast(tot))
    )
    mi_sum = F.sum(
        F.col("c_xy")
        * (
            micro(F.col("c_xy"))
            + micro(F.col("n_tot"))
            - micro(F.col("n_x"))
            - micro(F.col("n_y"))
        )
    )
    agg = cells.agg(
        F.max("n_tot").cast("long").alias("n_events"),
        mi_sum.alias("mi_raw"),
        F.max("n_tot").alias("nt"),
    )
    # marginal entropies from their own rollups (exact micro convention)
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .agg(
            (
                micro(F.max("n_tot"))
                - F.round(
                    F.sum(F.col("n_x") * micro(F.col("n_x"))) / F.max("n_tot")
                ).cast("long")
            ).alias("h_type_micro")
        )
    )
    hy = (
        my.crossJoin(F.broadcast(tot))
        .agg(
            (
                micro(F.max("n_tot"))
                - F.round(
                    F.sum(F.col("n_y") * micro(F.col("n_y"))) / F.max("n_tot")
                ).cast("long")
            ).alias("h_hour_micro")
        )
    )
    return (
        agg.select(
            "n_events",
            F.round(F.col("mi_raw") / F.col("nt")).cast("long").alias("mi_micro"),
        )
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n_events",
            "h_type_micro",
            "h_hour_micro",
            "mi_micro",
            F.expr(
                "CAST(2000 * mi_micro DIV (h_type_micro + h_hour_micro)"
                " AS BIGINT)"
            ).alias("nmi_milli"),
        )
    )


MUTUAL_INFORMATION_SQL = """
    WITH joint AS (
        SELECT event_type, EXTRACT(hour FROM ts) AS hr, COUNT(*) AS c_xy
        FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT event_type, SUM(c_xy) AS n_x FROM joint GROUP BY event_type),
    my AS (SELECT hr, SUM(c_xy) AS n_y FROM joint GROUP BY hr),
    tot AS (SELECT SUM(c_xy) AS n_tot FROM joint),
    cells AS (
        SELECT j.c_xy, x.n_x, y.n_y, t.n_tot
        FROM joint j
        JOIN mx x USING (event_type)
        JOIN my y USING (hr)
        CROSS JOIN tot t
    ),
    mi AS (
        SELECT CAST(MAX(n_tot) AS BIGINT) AS n_events,
               CAST(round(SUM(c_xy * (
                   CAST(round(ln(c_xy) * 1e6) AS BIGINT)
                   + CAST(round(ln(n_tot) * 1e6) AS BIGINT)
                   - CAST(round(ln(n_x) * 1e6) AS BIGINT)
                   - CAST(round(ln(n_y) * 1e6) AS BIGINT)
               )) / MAX(n_tot)) AS BIGINT) AS mi_micro
        FROM cells
    ),
    hx AS (
        SELECT CAST(round(ln(MAX(t.n_tot)) * 1e6) AS BIGINT)
               - CAST(round(SUM(n_x * CAST(round(ln(n_x) * 1e6) AS BIGINT))
                      / MAX(t.n_tot)) AS BIGINT) AS h_type_micro
        FROM mx CROSS JOIN tot t
    ),
    hy AS (
        SELECT CAST(round(ln(MAX(t.n_tot)) * 1e6) AS BIGINT)
               - CAST(round(SUM(n_y * CAST(round(ln(n_y) * 1e6) AS BIGINT))
                      / MAX(t.n_tot)) AS BIGINT) AS h_hour_micro
        FROM my CROSS JOIN tot t
    )
    SELECT mi.n_events, hx.h_type_micro, hy.h_hour_micro, mi.mi_micro,
           CAST(2000 * mi.mi_micro // (hx.h_type_micro + hy.h_hour_micro)
               AS BIGINT) AS nmi_milli
    FROM mi CROSS JOIN hx CROSS JOIN hy
"""


# --- sample-ratio-mismatch guardrail -----------------------------------------------

SRM_CHI2_CRIT_MICRO = 3_841_459  # chi-square 95% critical value, 1 dof


def srm_check(events: DataFrame) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the FIRST check any experiment
    readout must pass: under a 50/50 md5 assignment the two arms' user
    counts should differ only by chance, and a significant imbalance
    means broken bucketing / differential logging loss, invalidating
    every downstream test (Welch, z, CUPED) before it runs.

    Assignment is the hash the samplers use (md5 of user_id, low bit),
    NOT user-id parity — SRM exists to audit the real assignment path.
    Per event_type over distinct users: chi-square vs the expected even
    split, exact integer micro: chi2 = (n_a − n_b)² / (n_a + n_b), and
    the 95% flag against {SRM_CHI2_CRIT_MICRO} micro.

    Scale shape: one distinct (type, user) projection, one bounded
    type-keyed aggregate."""
    from ..llm.hashing import md5_int

    arm = (md5_int(F.col("user_id").cast("string")) % 2).alias("arm")
    users = events.select("event_type", "user_id", arm).distinct()
    return (
        users.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.expr(
                "CAST(1000000 * (n_a - n_b) * (n_a - n_b)"
                " DIV (n_a + n_b) AS BIGINT)"
            ).alias("srm_chi2_micro"),
        )
        .withColumn(
            "srm_flag",
            (F.col("srm_chi2_micro") > SRM_CHI2_CRIT_MICRO).cast("int"),
        )
        .orderBy("event_type")
    )


def srm_check_sql() -> str:
    from ..llm.hashing import md5_int_sql

    arm = f"({md5_int_sql('CAST(user_id AS VARCHAR)')} % 2)"
    return f"""
        WITH users AS (
            SELECT DISTINCT event_type, user_id, {arm} AS arm
            FROM events
        ),
        counts AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b
            FROM users GROUP BY event_type
        )
        SELECT event_type, n_a, n_b,
               CAST(1000000 * (n_a - n_b) * (n_a - n_b) // (n_a + n_b)
                    AS BIGINT) AS srm_chi2_micro,
               CAST(1000000 * (n_a - n_b) * (n_a - n_b) // (n_a + n_b)
                    > {SRM_CHI2_CRIT_MICRO} AS INT) AS srm_flag
        FROM counts
        ORDER BY event_type
    """


# --- A/A calibration drill -----------------------------------------------------------


def aa_calibration(events: DataFrame) -> DataFrame:
    """A/A calibration drill: run the Welch readout on a NULL split
    (the md5 assignment hash, same as srm_check) where the true effect
    is zero by construction — the experimentation-platform health check
    that catches broken variance estimates, clustered users, or
    assignment leakage BEFORE anyone trusts a real A/B readout. The
    well-calibrated outcome is |t| small for every metric.

    Same sufficient-statistics single pass as welch_ab_test; the
    calibrated flag pins |t| < 3 (comfortably inside any sane null band
    for these n). Output per type: (event_type, n_a, n_b, t_stat,
    calibrated).

    Scale shape: one conditional aggregate pass, bounded panel."""
    from ..llm.hashing import md5_int

    g = (md5_int(F.col("user_id").cast("string")) % 2 == 0).cast("int")
    agg = events.groupBy("event_type").agg(
        F.count(F.when(g == 1, F.col("value"))).alias("n_a"),
        F.avg(F.when(g == 1, F.col("value"))).alias("m_a"),
        F.var_samp(F.when(g == 1, F.col("value"))).alias("v_a"),
        F.count(F.when(g == 0, F.col("value"))).alias("n_b"),
        F.avg(F.when(g == 0, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(g == 0, F.col("value"))).alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2)
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(F.when(ok, t), 6).alias("t_stat"),
        F.when(ok & (F.abs(t) < 3.0), 1).otherwise(0).cast("int").alias(
            "calibrated"
        ),
    ).orderBy("event_type")


def aa_calibration_sql() -> str:
    from ..llm.hashing import md5_int_sql

    g = f"CAST(({md5_int_sql('CAST(user_id AS VARCHAR)')} % 2) = 0 AS INT)"
    return f"""
        WITH agg AS (
            SELECT event_type,
                   COUNT(CASE WHEN {g} = 1 THEN value END) AS n_a,
                   AVG(CASE WHEN {g} = 1 THEN value END) AS m_a,
                   VAR_SAMP(CASE WHEN {g} = 1 THEN value END) AS v_a,
                   COUNT(CASE WHEN {g} = 0 THEN value END) AS n_b,
                   AVG(CASE WHEN {g} = 0 THEN value END) AS m_b,
                   VAR_SAMP(CASE WHEN {g} = 0 THEN value END) AS v_b
            FROM events GROUP BY event_type
        )
        SELECT event_type, n_a, n_b,
               ROUND(CASE WHEN n_a >= 2 AND n_b >= 2
                          AND v_a / n_a + v_b / n_b > 0
                     THEN (m_a - m_b) / sqrt(v_a / n_a + v_b / n_b)
                     END, 6) AS t_stat,
               CAST(CASE WHEN n_a >= 2 AND n_b >= 2
                         AND v_a / n_a + v_b / n_b > 0
                         AND abs((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b)) < 3.0
                    THEN 1 ELSE 0 END AS INT) AS calibrated
        FROM agg
        ORDER BY event_type
    """


# --- Benjamini-Hochberg FDR over the per-hour z panel -------------------------------

# Two-sided z critical values z_crit(m, i) = Phi^-1(1 - (i*q/m)/2) at q = 0.10,
# micro-quantized, for every family size the bounded hour panel can take
# (m <= 24). Computed ONCE at import from the stdlib normal inverse CDF and
# embedded as integer literals in BOTH engines, so the BH decision needs no
# erf/quantile builtin anywhere at runtime — |z| (already 6-dp stable)
# compares against the same integers on both sides.
BH_Q_MILLI = 100
BH_MAX_M = 24


def _bh_crit_rows() -> list[tuple[int, int, int]]:
    from statistics import NormalDist

    nd = NormalDist()
    q = BH_Q_MILLI / 1000.0
    return [
        (m, i, round(nd.inv_cdf(1.0 - (i * q / m) / 2.0) * 1e6))
        for m in range(1, BH_MAX_M + 1)
        for i in range(1, m + 1)
    ]


def bh_fdr_panel(events: DataFrame) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-hour-of-day two-proportion
    z panel: for each of the (up to 24) hour strata, a two-proportion z tests
    whether the parity cohorts convert (user purchased within that hour cell)
    at different rates; when one experiment reads out m strata, the
    0.05-per-stratum habit false-positives at 1-(0.95^m) — BH caps the
    EXPECTED FALSE DISCOVERY RATE at q across the family. Strata rank by |z|
    descending; the largest rank k with |z|_(k) >= z_crit(m, k) and every
    rank <= k is rejected (step-up).

    The z->p boundary needs no quantile function at runtime: z_crit(m, i) is
    a precomputed micro-integer literal table joined on (family size, rank)
    — both engines compare the SAME integers, so the reject set is
    engine-exact even though p-values never materialize.

    Scale shape: one (hour, user, day) aggregate (map-side combined) -> a
    ≤24-row panel; everything after is windows/joins on that panel and the
    ≤300-row literal table (the unpartitioned rank window runs over the
    bounded aggregate — gate-clean)."""
    spark = events.sparkSession
    crit = spark.createDataFrame(
        _bh_crit_rows(), "m int, bh_rank int, z_crit_micro long"
    )
    cells = (
        events.select(
            F.hour("ts").alias("hr"),
            F.to_date("ts").alias("day"),
            "user_id",
            (F.col("event_type") == "purchase").cast("int").alias("pur"),
        )
        .groupBy("hr", "day", "user_id")
        .agg(F.max("pur").alias("conv"))
        .withColumn("in_a", (F.col("user_id") % 2 == 0).cast("int"))
    )
    agg = cells.groupBy("hr").agg(
        F.sum(F.when(F.col("in_a") == 1, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("in_a") == 1, F.col("conv")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("in_a") == 0, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("in_a") == 0, F.col("conv")).otherwise(0)).alias("c_b"),
    )
    pa = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pool
        * (1.0 - pool)
        * (1.0 / F.col("n_a").cast("double") + 1.0 / F.col("n_b").cast("double"))
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (pool > 0) & (pool < 1)
    z = agg.select(
        "hr", F.round(F.when(ok, (pa - pb) / se), 6).alias("z_stat")
    ).where(F.col("z_stat").isNotNull())
    z = z.select(
        "hr",
        "z_stat",
        F.round(F.abs(F.col("z_stat")) * 1e6).cast("long").alias("abs_z_micro"),
    )
    ranked = z.withColumn(
        "bh_rank",
        F.row_number().over(
            Window.orderBy(F.col("abs_z_micro").desc(), F.col("hr"))
        ),
    ).withColumn("m", F.count("*").over(Window.partitionBy()).cast("int"))
    marked = ranked.join(F.broadcast(crit), ["m", "bh_rank"], "left").withColumn(
        "passes", (F.col("abs_z_micro") >= F.col("z_crit_micro")).cast("int")
    )
    cutoff = marked.agg(
        F.max(F.when(F.col("passes") == 1, F.col("bh_rank"))).alias("k_reject")
    )
    return (
        marked.crossJoin(F.broadcast(cutoff))
        .select(
            F.col("hr").cast("int").alias("hr"),
            "z_stat",
            "bh_rank",
            "z_crit_micro",
            F.coalesce(
                (F.col("bh_rank") <= F.col("k_reject")).cast("int"), F.lit(0)
            ).alias("rejected"),
        )
        .orderBy("bh_rank")
    )


def bh_fdr_panel_sql() -> str:
    values = ", ".join(f"({m}, {i}, {c})" for m, i, c in _bh_crit_rows())
    return f"""
        WITH crit(m, bh_rank, z_crit_micro) AS (VALUES {values}),
        cells AS (
            SELECT EXTRACT(hour FROM ts) AS hr, CAST(ts AS DATE) AS day,
                   user_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv,
                   ANY_VALUE(CAST(user_id % 2 = 0 AS INT)) AS in_a
            FROM events GROUP BY 1, 2, 3
        ),
        agg AS (
            SELECT hr,
                   CAST(SUM(CASE WHEN in_a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN in_a = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
                   CAST(SUM(CASE WHEN in_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN in_a = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_b
            FROM cells GROUP BY hr
        ),
        z AS (
            SELECT hr,
                   round(CASE WHEN n_a > 0 AND n_b > 0
                               AND (c_a + c_b) > 0 AND (c_a + c_b) < (n_a + n_b)
                              THEN (CAST(c_a AS DOUBLE) / n_a
                                    - CAST(c_b AS DOUBLE) / n_b)
                                   / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                                          * (1.0 - CAST(c_a + c_b AS DOUBLE)
                                                   / (n_a + n_b))
                                          * (1.0 / n_a + 1.0 / n_b))
                         END, 6) AS z_stat
            FROM agg
        ),
        zz AS (
            SELECT hr, z_stat,
                   CAST(round(abs(z_stat) * 1e6) AS BIGINT) AS abs_z_micro
            FROM z WHERE z_stat IS NOT NULL
        ),
        ranked AS (
            SELECT hr, z_stat, abs_z_micro,
                   CAST(row_number() OVER (
                       ORDER BY abs_z_micro DESC, hr) AS INT) AS bh_rank,
                   CAST(COUNT(*) OVER () AS INT) AS m
            FROM zz
        ),
        marked AS (
            SELECT ranked.*, z_crit_micro,
                   CASE WHEN abs_z_micro >= z_crit_micro THEN 1 ELSE 0 END
                       AS passes
            FROM ranked LEFT JOIN crit USING (m, bh_rank)
        ),
        cutoff AS (
            SELECT MAX(CASE WHEN passes = 1 THEN bh_rank END) AS k_reject
            FROM marked
        )
        SELECT CAST(hr AS INT) AS hr, z_stat, bh_rank,
               CAST(z_crit_micro AS BIGINT) AS z_crit_micro,
               COALESCE(CAST(bh_rank <= k_reject AS INT), 0) AS rejected
        FROM marked CROSS JOIN cutoff
        ORDER BY bh_rank
    """


# --- sequential probability ratio test (SPRT) ---------------------------------------

# H0: daily per-user conversion p = 0.40 vs H1: p = 0.50, alpha = beta = 0.05.
# Log-likelihood increments and Wald thresholds precomputed to micro-nats so
# the cumulative LLR walk is pure integer arithmetic in both engines:
#   L1 = ln(p1/p0)*1e6, L0 = ln((1-p1)/(1-p0))*1e6
#   upper = ln((1-beta)/alpha)*1e6, lower = ln(beta/(1-alpha))*1e6
SPRT_P0_MILLI = 400
SPRT_P1_MILLI = 500
SPRT_L1_MICRO = 223144   # round(ln(0.5/0.4) * 1e6)
SPRT_L0_MICRO = -182322  # round(ln(0.5/0.6) * 1e6)
SPRT_UPPER_MICRO = 2944439   # round(ln(0.95/0.05) * 1e6)
SPRT_LOWER_MICRO = -2944439  # round(ln(0.05/0.95) * 1e6)


def sprt_daily(events: DataFrame) -> DataFrame:
    """Wald's sequential probability ratio test on the daily conversion
    stream — the always-valid alternative to fixed-horizon A/B peeking: a
    trial is an active (user, day), a success is a purchase by that user
    that day; after each day the cumulative log-likelihood ratio
    LLR_t = c_t*ln(p1/p0) + (n_t-c_t)*ln((1-p1)/(1-p0)) either crosses
    ln((1-b)/a) (accept H1), ln(b/(1-a)) (accept H0), or continues.

    All four log constants are micro-nat integer literals (precomputed —
    no runtime ln anywhere), so the LLR walk and both threshold crossings
    are exact integer comparisons; the decision sequence is bit-identical
    across engines. Output per day: (day, trials, conversions, cum_llr
    _micro, decision).

    Scale shape: one (user, day) aggregate (map-side combined) -> one
    bounded day grid; the cumulative window runs over the ≤|days|
    aggregate."""
    ud = (
        events.select(
            F.to_date("ts").alias("day"),
            "user_id",
            (F.col("event_type") == "purchase").cast("int").alias("pur"),
        )
        .groupBy("day", "user_id")
        .agg(F.max("pur").alias("converted"))
    )
    daily = ud.groupBy("day").agg(
        F.count("*").cast("long").alias("trials"),
        F.sum("converted").cast("long").alias("conversions"),
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        "trials",
        "conversions",
        (
            F.sum("conversions").over(wc) * F.lit(SPRT_L1_MICRO)
            + (F.sum("trials").over(wc) - F.sum("conversions").over(wc))
            * F.lit(SPRT_L0_MICRO)
        ).alias("cum_llr_micro"),
    )
    return cum.select(
        "day",
        "trials",
        "conversions",
        "cum_llr_micro",
        F.when(F.col("cum_llr_micro") >= SPRT_UPPER_MICRO, "accept_h1")
        .when(F.col("cum_llr_micro") <= SPRT_LOWER_MICRO, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


SPRT_DAILY_SQL = f"""
    WITH ud AS (
        SELECT CAST(ts AS DATE) AS day, user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY 1, 2
    ),
    daily AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS trials,
               CAST(SUM(converted) AS BIGINT) AS conversions
        FROM ud GROUP BY day
    ),
    cum AS (
        SELECT day, trials, conversions,
               SUM(conversions) OVER w * {SPRT_L1_MICRO}
               + (SUM(trials) OVER w - SUM(conversions) OVER w)
                 * ({SPRT_L0_MICRO}) AS cum_llr_micro
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT day, trials, conversions,
           CAST(cum_llr_micro AS BIGINT) AS cum_llr_micro,
           CASE WHEN cum_llr_micro >= {SPRT_UPPER_MICRO} THEN 'accept_h1'
                WHEN cum_llr_micro <= {SPRT_LOWER_MICRO} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
    ORDER BY day
"""


# --- Spearman rank correlation (daily grid) ------------------------------------------

SPEARMAN_X_TYPE = "click"
SPEARMAN_Y_TYPE = "error"


def spearman_daily(
    events: DataFrame, x_type: str = SPEARMAN_X_TYPE, y_type: str = SPEARMAN_Y_TYPE
) -> DataFrame:
    """Spearman rank correlation between two event types' DAILY counts:
    one row (n_days, var2x, var2y, rho_milli).

    The tie-correct form (Pearson on average ranks) — NOT the 6*sum(d^2)
    shortcut, which is wrong whenever two days tie on a count. Ranks are
    kept exact by working with DOUBLED average ranks (2*avg_rank =
    2*min_rank + ties - 1, always an integer), so every sufficient
    statistic (n, S_x, S_xx, S_xy) is an exact BIGINT and the one float
    boundary is the final sqrt. var2x/var2y = n*S_xx - S_x^2 over the
    doubled ranks (integer dispersion diagnostics; 0 iff all days tie).

    Scale shape: the day grid is a bounded aggregate (<=|days| rows); both
    rank windows run over that aggregate, never raw events — the same
    bounded-window discipline as kendall_tau_daily (complements it: tau-a
    is the pairwise-count form, this is the rank-moment form)."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == x_type).cast("long")).alias("x"),
        F.sum((F.col("event_type") == y_type).cast("long")).alias("y"),
    )
    r2 = lambda c: (  # noqa: E731  doubled average rank: 2*min_rank + ties - 1
        2 * F.rank().over(Window.orderBy(c))
        + F.count("*").over(Window.partitionBy(c))
        - 1
    ).cast("long")
    ranked = daily.select(r2("x").alias("rx"), r2("y").alias("ry"))
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    return agg.select(
        "n_days",
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("var2x"),
        (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")).alias("var2y"),
        F.expr(
            "CAST(CASE WHEN n_days * sxx - sx * sx > 0"
            "           AND n_days * syy - sy * sy > 0"
            " THEN round(1000.0 * (n_days * sxy - sx * sy)"
            "      / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)"
            "             * CAST(n_days * syy - sy * sy AS DOUBLE)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("rho_milli"),
    )


def spearman_daily_sql(
    x_type: str = SPEARMAN_X_TYPE, y_type: str = SPEARMAN_Y_TYPE
) -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = '{x_type}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = '{y_type}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        ranked AS (
            SELECT CAST(2 * RANK() OVER (ORDER BY x)
                        + COUNT(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
                   CAST(2 * RANK() OVER (ORDER BY y)
                        + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
            FROM daily
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
                   CAST(SUM(rx * rx) AS BIGINT) AS sxx,
                   CAST(SUM(ry * ry) AS BIGINT) AS syy,
                   CAST(SUM(rx * ry) AS BIGINT) AS sxy
            FROM ranked
        )
        SELECT n_days,
               CAST(n_days * sxx - sx * sx AS BIGINT) AS var2x,
               CAST(n_days * syy - sy * sy AS BIGINT) AS var2y,
               CAST(CASE WHEN n_days * sxx - sx * sx > 0
                          AND n_days * syy - sy * sy > 0
                    THEN round(1000.0 * (n_days * sxy - sx * sy)
                         / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
                                * CAST(n_days * syy - sy * sy AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS rho_milli
        FROM agg
    """


# --- Wald-Wolfowitz runs test ---------------------------------------------------------


def runs_test_daily(events: DataFrame) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily event-count
    sequence around its median: one row (n_above, n_below, runs, z_milli).

    Too few runs = trend/clustering, too many = oscillation — the
    distribution-free stationarity check that needs no model of the
    counts. Days equal to the median are dropped (the textbook
    convention); the lower median comes from the ranks.kth_smallest
    order-statistic device (k = ceil(n/2)) so no corpus sort enters the
    plan. mu = 2ab/N + 1 and sigma^2 = 2ab(2ab-N)/(N^2 (N-1)) are
    assembled from exact integers; the one float boundary is the final
    z = (R - mu)/sigma emit at milli.

    Scale shape: day-grid aggregate (bounded), the kth_smallest device
    over the <=|days| count relation, one lag window over the bounded
    signed grid."""
    from ..ranks import kth_smallest

    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    med = kth_smallest(daily.select("c"), "c", "(n + 1) DIV 2").select(
        F.col("c").alias("med")
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("c") != F.col("med"))
        .select("day", (F.col("c") > F.col("med")).cast("int").alias("s"))
    )
    w = Window.orderBy("day")
    runs = signed.select(
        "s",
        (F.col("s") != F.coalesce(F.lag("s").over(w), F.col("s") + 1))
        .cast("long")
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").cast("long").alias("n_above"),
        F.sum(F.lit(1) - F.col("s")).cast("long").alias("n_below"),
        F.sum("new_run").cast("long").alias("runs"),
    )
    return agg.select(
        "n_above",
        "n_below",
        "runs",
        F.expr(
            "CAST(CASE WHEN n_above > 0 AND n_below > 0"
            " AND n_above + n_below > 1"
            " AND 2.0 * n_above * n_below * (2.0 * n_above * n_below - n_above - n_below) > 0"
            " THEN round(1000.0 * (runs - (2.0 * n_above * n_below / (n_above + n_below) + 1))"
            "   / sqrt(2.0 * n_above * n_below * (2.0 * n_above * n_below - n_above - n_below)"
            "          / (CAST(n_above + n_below AS DOUBLE) * (n_above + n_below)"
            "             * (n_above + n_below - 1))))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def runs_test_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        med AS (
            SELECT c AS med FROM (
                SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM daily
            ) r
            WHERE rn = (SELECT (COUNT(*) + 1) // 2 FROM daily)
        ),
        signed AS (
            SELECT day, CAST(c > (SELECT med FROM med) AS INT) AS s
            FROM daily WHERE c <> (SELECT med FROM med)
        ),
        runs AS (
            SELECT s,
                   CASE WHEN s <> COALESCE(
                            LAG(s) OVER (ORDER BY day), s + 1)
                        THEN 1 ELSE 0 END AS new_run
            FROM signed
        ),
        agg AS (
            SELECT CAST(SUM(s) AS BIGINT) AS n_above,
                   CAST(SUM(1 - s) AS BIGINT) AS n_below,
                   CAST(SUM(new_run) AS BIGINT) AS runs
            FROM runs
        )
        SELECT n_above, n_below, runs,
               CAST(CASE WHEN n_above > 0 AND n_below > 0
                    AND n_above + n_below > 1
                    AND 2.0 * n_above * n_below * (2.0 * n_above * n_below - n_above - n_below) > 0
                    THEN round(1000.0 * (runs - (2.0 * n_above * n_below / (n_above + n_below) + 1))
                      / sqrt(2.0 * n_above * n_below * (2.0 * n_above * n_below - n_above - n_below)
                             / (CAST(n_above + n_below AS DOUBLE) * (n_above + n_below)
                                * (n_above + n_below - 1))))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM agg
    """


# --- Theil inequality index -----------------------------------------------------------


def theil_index_users(events: DataFrame) -> DataFrame:
    """Theil T inequality index of per-user total spend: one row
    (n_users, total_cents, theil_milli, theil_norm_milli).

    The entropy-based inequality measure that (unlike Gini) decomposes
    additively across subgroups: T = (1/n) * sum_u (x_u/mu) ln(x_u/mu),
    0 = perfect equality, ln(n) = one user holds everything;
    theil_norm_milli = T/ln(n) rescales to [0,1000]. Complements
    warehouse_segment_gini (rank-based) with the decomposable form.

    Exactness: per-row cents quantization, exact integer per-user totals
    and grand total; each user's term is computed from those integers and
    QUANTIZED TO NANO before summing (the events_user_entropy
    quantize-then-integer-sum pattern), so the aggregate is order-free —
    no float sum rides the shuffle, and the per-term quantization error
    (<= 0.5 nano x |users|) sits far below the milli emit.

    Scale shape: one user-keyed partial+final hash aggregate, a broadcast
    1-row total, one final 1-row aggregate. No window, no sort."""
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    per_u = (
        events.select(F.col("user_id"), cents.alias("cents"))
        .groupBy("user_id")
        .agg(F.sum("cents").alias("x"))
        .where(F.col("x") > 0)
    )
    tot = per_u.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("total_cents"),
    )
    terms = per_u.crossJoin(F.broadcast(tot)).select(
        "n_users",
        "total_cents",
        F.round(
            F.lit(1e9)
            * (F.col("x").cast("double") / F.col("total_cents").cast("double"))
            * F.log(
                F.col("x").cast("double")
                * F.col("n_users").cast("double")
                / F.col("total_cents").cast("double")
            )
        )
        .cast("long")
        .alias("t_nano"),
    )
    return (
        terms.groupBy("n_users", "total_cents")
        .agg(F.sum("t_nano").alias("_t_nano"))
        .select(
            "n_users",
            "total_cents",
            F.expr(
                "CAST(round(CAST(_t_nano AS DOUBLE) / 1e6) AS BIGINT)"
            ).alias("theil_milli"),
            F.expr(
                "CAST(CASE WHEN n_users > 1"
                " THEN round(CAST(_t_nano AS DOUBLE) / 1e6"
                "            / ln(CAST(n_users AS DOUBLE)))"
                " ELSE 0 END AS BIGINT)"
            ).alias("theil_norm_milli"),
        )
    )


def theil_index_users_sql() -> str:
    return """
        WITH per_u AS (
            SELECT user_id, CAST(SUM(CAST(round(value * 100) AS BIGINT))
                                 AS BIGINT) AS x
            FROM events GROUP BY user_id
            HAVING SUM(CAST(round(value * 100) AS BIGINT)) > 0
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(x) AS BIGINT) AS total_cents
            FROM per_u
        ),
        terms AS (
            SELECT n_users, total_cents,
                   CAST(round(1e9 * (CAST(x AS DOUBLE) / total_cents)
                        * ln(CAST(x AS DOUBLE) * n_users / total_cents))
                        AS BIGINT) AS t_nano
            FROM per_u, tot
        )
        SELECT n_users, total_cents,
               CAST(round(CAST(SUM(t_nano) AS DOUBLE) / 1e6) AS BIGINT)
                   AS theil_milli,
               CAST(CASE WHEN n_users > 1
                    THEN round(CAST(SUM(t_nano) AS DOUBLE) / 1e6
                               / ln(CAST(n_users AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS theil_norm_milli
        FROM terms
        GROUP BY n_users, total_cents
    """


# --- extreme-value (Gumbel) return level ----------------------------------------------

EVT_RETURN_DAYS = 30
_EULER_GAMMA = 0.5772156649015329
_SQRT6_OVER_PI = 0.7796968012336793  # sqrt(6)/pi as an identical literal


def evt_return_level(events: DataFrame, t_days: int = EVT_RETURN_DAYS) -> DataFrame:
    """Gumbel (EV-I) return level from DAILY MAXIMUM event values: one row
    (n_days, max_mean_centi, max_sd_centi, rl_centi) — the value expected
    to be exceeded once per ``t_days`` days, by method-of-moments fit
    (beta = s*sqrt(6)/pi, mu = m - gamma*beta, RL = mu - beta*ln(-ln(1 - 1/T))).

    The capacity-planning / fraud-threshold statistic that percentiles of
    the pooled distribution cannot give: it models the tail of the DAILY
    EXTREMES, extrapolating beyond the observed range.

    Exactness: daily maxima are exact integer cents; mean and variance come
    from the integer sufficient statistics (n, sum x, sum x^2), so both
    engines evaluate the identical rational-to-double chain and round once
    at centi.

    Scale shape: one day-keyed max aggregate (bounded grid), one 1-row
    final aggregate; no window, no sort."""
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    daily = events.select(F.to_date("ts").alias("day"), cents.alias("c")).groupBy(
        "day"
    ).agg(F.max("c").alias("mx"))
    agg = daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("mx").cast("long").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("s2"),
    )
    m = F.col("s1").cast("double") / F.col("n_days").cast("double")
    var = (
        F.col("n_days").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (
        F.col("n_days").cast("double") * (F.col("n_days").cast("double") - 1)
    )
    beta = F.sqrt(var) * F.lit(_SQRT6_OVER_PI)
    mu = m - F.lit(_EULER_GAMMA) * beta
    rl = mu - beta * F.log(-F.log(F.lit(1.0) - F.lit(1.0) / F.lit(float(t_days))))
    return agg.where(F.col("n_days") > 1).select(
        "n_days",
        F.round(m).cast("long").alias("max_mean_centi"),
        F.round(F.sqrt(var)).cast("long").alias("max_sd_centi"),
        F.round(rl).cast("long").alias("rl_centi"),
    )


def evt_return_level_sql(t_days: int = EVT_RETURN_DAYS) -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   MAX(CAST(round(value * 100) AS BIGINT)) AS mx
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(mx) AS BIGINT) AS s1,
                   CAST(SUM(mx * mx) AS BIGINT) AS s2
            FROM daily
        )
        SELECT n_days,
               CAST(round(CAST(s1 AS DOUBLE) / n_days) AS BIGINT) AS max_mean_centi,
               CAST(round(sqrt((CAST(n_days AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                               / (CAST(n_days AS DOUBLE) * (n_days - 1))))
                    AS BIGINT) AS max_sd_centi,
               CAST(round(
                   (CAST(s1 AS DOUBLE) / n_days
                    - {_EULER_GAMMA} * sqrt((CAST(n_days AS DOUBLE) * s2
                                             - CAST(s1 AS DOUBLE) * s1)
                                            / (CAST(n_days AS DOUBLE) * (n_days - 1)))
                      * {_SQRT6_OVER_PI})
                   - sqrt((CAST(n_days AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                          / (CAST(n_days AS DOUBLE) * (n_days - 1)))
                     * {_SQRT6_OVER_PI}
                     * ln(-ln(1.0e0 - 1.0e0 / {t_days}))
               ) AS BIGINT) AS rl_centi
        FROM agg
        WHERE n_days > 1
    """


# --- Mann-Kendall trend test ----------------------------------------------------------


def mann_kendall_daily(events: DataFrame) -> DataFrame:
    """Mann-Kendall trend test on the daily event-count sequence: one row
    (n_days, s_stat, var18, z_milli).

    The nonparametric monotone-trend test (the runs test's directional
    sibling): S = sum over day pairs i<j of sign(c_j - c_i); the
    tie-corrected variance 18*Var(S) = n(n-1)(2n+5) - sum_t t(t-1)(2t+5)
    stays a single exact BIGINT (var18), and z applies the standard
    continuity correction (S -> S -+ 1). The one float boundary is the
    final sqrt.

    Scale shape: bounded day-grid aggregate, a <=|days|^2 self-join ON THAT
    GRID (never raw events — the kendall_tau_daily economics), tie groups
    from a second count-keyed aggregate of the same grid."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(b, F.col("a.day") < F.col("b.day")).agg(
        F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("long"))
        .alias("s_stat"),
    )
    ties = daily.groupBy("c").agg(F.count("*").cast("long").alias("t")).agg(
        F.sum("t").cast("long").alias("n_days"),
        F.sum(
            F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
        ).cast("long").alias("tie_term"),
    )
    return (
        s.crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            F.coalesce("s_stat", F.lit(0)).alias("s_stat"),
            (
                F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
                - F.col("tie_term")
            ).alias("var18"),
        )
        .select(
            "n_days",
            "s_stat",
            "var18",
            F.expr(
                "CAST(CASE WHEN var18 > 0 AND s_stat <> 0"
                " THEN round(1000.0 * (s_stat - CAST(SIGN(s_stat) AS BIGINT))"
                "      / sqrt(CAST(var18 AS DOUBLE) / 18.0))"
                " ELSE 0 END AS BIGINT)"
            ).alias("z_milli"),
        )
    )


def mann_kendall_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        s AS (
            SELECT CAST(COALESCE(SUM(SIGN(b.c - a.c)), 0) AS BIGINT) AS s_stat
            FROM daily a JOIN daily b ON a.day < b.day
        ),
        ties AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n_days,
                   CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY c)
        )
        SELECT n_days, s_stat,
               CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                    AS BIGINT) AS var18,
               CAST(CASE WHEN n_days * (n_days - 1) * (2 * n_days + 5) - tie_term > 0
                          AND s_stat <> 0
                    THEN round(1000.0 * (s_stat - CAST(SIGN(s_stat) AS BIGINT))
                         / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5)
                                     - tie_term AS DOUBLE) / 18.0))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM s CROSS JOIN ties
    """


# --- Theil-Sen robust slope -----------------------------------------------------------


def sen_slope_daily(events: DataFrame) -> DataFrame:
    """Theil-Sen median slope of the daily event-count series: one row
    (n_pairs, sen_slope_milli) in counts-per-day milli units.

    The robust trend ESTIMATE completing mann_kendall's trend TEST: the
    median over all day-pair slopes (c_j - c_i)/(days between), immune to
    up to ~29% outlier days where an OLS slope is not. Pair slopes
    quantize once to milli (round over exact integers — deterministic in
    both engines); the median is the average of the lower/upper
    kth_smallest order statistics, so no data-sized sort: the pair
    relation is <=|days|^2 rows and the selection device runs on
    per-value counts.

    Scale shape: bounded day-grid self-join + two kth_smallest devices +
    one half-up average emit."""
    from ..ranks import kth_smallest

    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.day") < F.col("b.day")).select(
        F.expr(
            "CAST(round(1000.0 * (b.c - a.c)"
            " / CAST(datediff(b.day, a.day) AS DOUBLE)) AS BIGINT)"
        ).alias("slope_milli")
    )
    lo = kth_smallest(slopes, "slope_milli", "(n + 1) DIV 2").select(
        F.col("n").alias("n_pairs"), F.col("slope_milli").alias("v_lo")
    )
    hi = kth_smallest(slopes, "slope_milli", "n DIV 2 + 1").select(
        F.col("slope_milli").alias("v_hi")
    )
    return lo.crossJoin(F.broadcast(hi)).select(
        "n_pairs",
        F.expr("CAST(round((v_lo + v_hi) / 2.0) AS BIGINT)").alias(
            "sen_slope_milli"
        ),
    )


def sen_slope_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        slopes AS (
            SELECT CAST(round(1000.0 * (b.c - a.c)
                       / CAST(datediff('day', a.day, b.day) AS DOUBLE))
                       AS BIGINT) AS slope_milli
            FROM daily a JOIN daily b ON a.day < b.day
        ),
        ranked AS (
            SELECT slope_milli,
                   ROW_NUMBER() OVER (ORDER BY slope_milli) AS rn,
                   COUNT(*) OVER () AS m
            FROM slopes
        )
        SELECT CAST(MAX(m) AS BIGINT) AS n_pairs,
               CAST(round((MAX(CASE WHEN rn = (m + 1) // 2 THEN slope_milli END)
                           + MAX(CASE WHEN rn = m // 2 + 1 THEN slope_milli END))
                          / 2.0) AS BIGINT) AS sen_slope_milli
        FROM ranked
    """


# --- Poisson-process gap check ----------------------------------------------------------


def poisson_gap_check(events: DataFrame) -> DataFrame:
    """Is each user's event arrival Poisson? Per event type, the
    inter-arrival gaps WITHIN each (user, type) stream are pooled and their
    empirical distribution is compared to Exp(1/mean) at power-of-two gap
    boundaries: (event_type, n_gaps, mean_gap_micros, ks_binned_milli) —
    the max |empirical CDF - exponential CDF| over the <=64 bit-length
    bins. Large KS = bursty / scheduled (bot-like) arrivals, small =
    memoryless.

    The binned KS is the scale-honest form: an exact KS needs a global
    per-type sort of all gaps (single-task at 100 TB); bit-length binning
    bounds the comparison grid at 64 rows per type while pinning the
    statistic exactly (integer bin counts; the exponential CDF at exact
    2^b boundaries from the exact integer mean).

    Scale shape: one (user,type)-partitioned lag window on raw events
    (keyed), a (type, bit)-keyed aggregate (<=64 x |types|), one cumulative
    window over that bounded grid, broadcast per-type 1-row means."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .where(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
            ).alias("gap_us"),
        )
        .where(F.col("gap_us") > 0)
    )
    means = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("sum_us"),
    )
    bins = gaps.groupBy(
        "event_type", F.length(F.bin(F.col("gap_us"))).cast("int").alias("b")
    ).agg(F.count("*").cast("long").alias("m"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bins.select("event_type", "b", F.sum("m").over(wcum).alias("cum"))
    joined = cum.join(means, "event_type")
    # boundary = 2^b - 1 (max value with that bit length); F_exp(x) = 1 - exp(-x/mean)
    dev = joined.select(
        "event_type",
        "n_gaps",
        "sum_us",
        F.expr(
            "abs(CAST(cum AS DOUBLE) / n_gaps"
            " - (1.0 - exp(-(CAST(shiftleft(CAST(1 AS BIGINT), b) - 1 AS DOUBLE))"
            "              * n_gaps / sum_us)))"
        ).alias("dev"),
    )
    return (
        dev.groupBy("event_type", "n_gaps", "sum_us")
        .agg(F.max("dev").alias("_ks"))
        .select(
            "event_type",
            "n_gaps",
            # integer DIV on both sides (Spark's double->BIGINT cast
            # truncates while DuckDB's rounds — the known dtype trap)
            F.expr(
                "CAST(CASE WHEN n_gaps > 0 THEN sum_us DIV n_gaps"
                " ELSE 0 END AS BIGINT)"
            ).alias("mean_gap_micros"),
            F.expr("CAST(round(1000.0 * _ks) AS BIGINT)").alias(
                "ks_binned_milli"
            ),
        )
        .orderBy("event_type")
    )


def poisson_gap_check_sql() -> str:
    return """
        WITH gaps AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id)) AS gap_us
            FROM events
        ),
        pos AS (
            SELECT event_type, CAST(gap_us AS BIGINT) AS gap_us
            FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0
        ),
        means AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(SUM(gap_us) AS BIGINT) AS sum_us
            FROM pos GROUP BY event_type
        ),
        bins AS (
            SELECT event_type, CAST(length(bin(gap_us)) AS INT) AS b,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM pos GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, b,
                   SUM(m) OVER (PARTITION BY event_type ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM bins
        ),
        dev AS (
            SELECT c.event_type, n_gaps, sum_us,
                   abs(CAST(cum AS DOUBLE) / n_gaps
                       - (1.0 - exp(-(CAST((CAST(1 AS BIGINT) << b) - 1 AS DOUBLE))
                                    * n_gaps / sum_us))) AS dev
            FROM cum c JOIN means USING (event_type)
        )
        SELECT event_type, n_gaps,
               CAST(CASE WHEN n_gaps > 0 THEN sum_us // n_gaps
                    ELSE 0 END AS BIGINT) AS mean_gap_micros,
               CAST(round(1000.0 * MAX(dev)) AS BIGINT) AS ks_binned_milli
        FROM dev
        GROUP BY event_type, n_gaps, sum_us
        ORDER BY event_type
    """


# --- Granger-lite lagged predictability test --------------------------------------------


def granger_lite_daily(events: DataFrame) -> DataFrame:
    """Bivariate Granger-style predictability F-test on the daily grid,
    both directions: (direction, n_obs, f_milli) — does yesterday's CLICK
    count predict today's ERROR count beyond yesterday's errors (and vice
    versa)?

    Model A: y_t ~ 1 + y_{t-1}; model B adds x_{t-1};
    F = (RSS_A - RSS_B) / (RSS_B / (m - 3)). Assembled by Frisch-Waugh
    from CENTERED cross-moment sums c_ab = m*sum(ab) - sum(a)*sum(b) —
    all exact BIGINTs off one bounded lagged-day relation — so both
    engines run the identical double chain (the 1/m scale factors cancel
    inside F). Degenerate fits (zero lag variance / zero extra signal /
    zero residual) emit 0.

    Scale shape: day-grid aggregate, ONE lag window over the bounded
    grid, two 1-row moment aggregates (one per direction) unioned."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("y"),
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "x",
        "y",
        F.lag("x").over(w).alias("xl"),
        F.lag("y").over(w).alias("yl"),
    ).where(F.col("xl").isNotNull())

    def one_direction(ycol: str, y1col: str, x1col: str, label: str):
        yv, l1, l2 = F.col(ycol), F.col(y1col), F.col(x1col)
        m = lagged.agg(
            F.count("*").cast("long").alias("m"),
            F.sum(yv).alias("sy"),
            F.sum(l1).alias("s1"),
            F.sum(l2).alias("s2"),
            F.sum(yv * yv).alias("syy"),
            F.sum(l1 * l1).alias("s11"),
            F.sum(l2 * l2).alias("s22"),
            F.sum(l1 * yv).alias("s1y"),
            F.sum(l2 * yv).alias("s2y"),
            F.sum(l1 * l2).alias("s12"),
        )
        centered = m.select(
            "m",
            (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).alias("cyy"),
            (F.col("m") * F.col("s11") - F.col("s1") * F.col("s1")).alias("c11"),
            (F.col("m") * F.col("s22") - F.col("s2") * F.col("s2")).alias("c22"),
            (F.col("m") * F.col("s1y") - F.col("s1") * F.col("sy")).alias("c1y"),
            (F.col("m") * F.col("s2y") - F.col("s2") * F.col("sy")).alias("c2y"),
            (F.col("m") * F.col("s12") - F.col("s1") * F.col("s2")).alias("c12"),
        )
        # Frisch-Waugh: residualize the extra lag on the own lag, then the
        # extra sum of squares is num2^2/den2
        fw = centered.select(
            "m",
            F.expr(
                "CASE WHEN c11 > 0 THEN CAST(cyy AS DOUBLE)"
                " - CAST(c1y AS DOUBLE) * c1y / c11 ELSE 0.0 END"
            ).alias("rss_a"),
            F.expr(
                "CASE WHEN c11 > 0 THEN CAST(c2y AS DOUBLE)"
                " - CAST(c12 AS DOUBLE) * c1y / c11 ELSE 0.0 END"
            ).alias("num2"),
            F.expr(
                "CASE WHEN c11 > 0 THEN CAST(c22 AS DOUBLE)"
                " - CAST(c12 AS DOUBLE) * c12 / c11 ELSE 0.0 END"
            ).alias("den2"),
        ).select(
            "m",
            "rss_a",
            F.expr(
                "CASE WHEN den2 > 1e-9 THEN rss_a - num2 * num2 / den2"
                " ELSE rss_a END"
            ).alias("rss_b"),
            F.expr(
                "CASE WHEN den2 > 1e-9 THEN num2 * num2 / den2 ELSE 0.0 END"
            ).alias("extra_ss"),
        )
        return fw.select(
            F.lit(label).alias("direction"),
            F.col("m").alias("n_obs"),
            F.expr(
                "CAST(round(1000.0 * CASE WHEN m > 3 AND rss_b > 1e-9"
                " THEN extra_ss / (rss_b / (m - 3)) ELSE 0.0 END) AS BIGINT)"
            ).alias("f_milli"),
        )

    fwd = one_direction("y", "yl", "xl", "clicks->errors")
    rev = one_direction("x", "xl", "yl", "errors->clicks")
    return fwd.unionByName(rev).orderBy("direction")


def _granger_direction_sql(ycol: str, y1col: str, x1col: str, label: str) -> str:
    return f"""
        SELECT '{label}' AS direction, m AS n_obs,
               CAST(round(1000.0 * CASE WHEN m > 3 AND rss_b > 1e-9
                    THEN extra_ss / (rss_b / (m - 3)) ELSE 0.0 END)
                    AS BIGINT) AS f_milli
        FROM (
            SELECT m, rss_a,
                   CASE WHEN den2 > 1e-9 THEN rss_a - num2 * num2 / den2
                        ELSE rss_a END AS rss_b,
                   CASE WHEN den2 > 1e-9 THEN num2 * num2 / den2
                        ELSE 0.0 END AS extra_ss
            FROM (
                SELECT m,
                       CASE WHEN c11 > 0 THEN CAST(cyy AS DOUBLE)
                            - CAST(c1y AS DOUBLE) * c1y / c11 ELSE 0.0 END AS rss_a,
                       CASE WHEN c11 > 0 THEN CAST(c2y AS DOUBLE)
                            - CAST(c12 AS DOUBLE) * c1y / c11 ELSE 0.0 END AS num2,
                       CASE WHEN c11 > 0 THEN CAST(c22 AS DOUBLE)
                            - CAST(c12 AS DOUBLE) * c12 / c11 ELSE 0.0 END AS den2
                FROM (
                    SELECT m,
                           m * syy - sy * sy AS cyy,
                           m * s11 - s1 * s1 AS c11,
                           m * s22 - s2 * s2 AS c22,
                           m * s1y - s1 * sy AS c1y,
                           m * s2y - s2 * sy AS c2y,
                           m * s12 - s1 * s2 AS c12
                    FROM (
                        SELECT CAST(COUNT(*) AS BIGINT) AS m,
                               CAST(SUM({ycol}) AS BIGINT) AS sy,
                               CAST(SUM({y1col}) AS BIGINT) AS s1,
                               CAST(SUM({x1col}) AS BIGINT) AS s2,
                               CAST(SUM({ycol} * {ycol}) AS BIGINT) AS syy,
                               CAST(SUM({y1col} * {y1col}) AS BIGINT) AS s11,
                               CAST(SUM({x1col} * {x1col}) AS BIGINT) AS s22,
                               CAST(SUM({y1col} * {ycol}) AS BIGINT) AS s1y,
                               CAST(SUM({x1col} * {ycol}) AS BIGINT) AS s2y,
                               CAST(SUM({y1col} * {x1col}) AS BIGINT) AS s12
                        FROM lagged
                    )
                )
            )
        )"""


def granger_lite_daily_sql() -> str:
    fwd = _granger_direction_sql("y", "yl", "xl", "clicks->errors")
    rev = _granger_direction_sql("x", "xl", "yl", "errors->clicks")
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        lagged AS (
            SELECT x, y,
                   LAG(x) OVER (ORDER BY day) AS xl,
                   LAG(y) OVER (ORDER BY day) AS yl
            FROM daily
            QUALIFY xl IS NOT NULL
        )
        {fwd}
        UNION ALL
        {rev}
        ORDER BY direction
    """


# --- Brown-Forsythe (median-based Levene) variance-equality test --------------------------


def brown_forsythe_test(events: DataFrame) -> DataFrame:
    """Brown-Forsythe test for equal value SPREAD across event types: one
    row (k_groups, n_total, f_milli) — the one-way ANOVA F applied to
    absolute deviations from each group's MEDIAN.

    Welch (events_welch_ab_test) and the dow ANOVA compare MEANS; this is
    the robust scale-equality companion (Levene with the median center —
    the variant that survives skew), the gate before pooling variances or
    trusting a t-test's homoskedasticity assumption.

    Exactness: values quantize to cents; per-type medians come from the
    2*cum >= tot threshold over the (type, cents) aggregate (the
    weighted_median_price device — bounded by the value domain,
    partitioned by type); |x - med| is an exact integer, so every ANOVA
    sufficient statistic (n_g, sum z, sum z^2) is an exact BIGINT and the
    per-group double terms quantize to micro before the <=k-row sums.

    Scale shape: one (type, cents) aggregate, one type-partitioned window
    over it, a broadcast <=|types| median dim, one keyed aggregate."""
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    vals = events.select("event_type", cents.alias("c"))
    per_vc = vals.groupBy("event_type", "c").agg(F.count("*").alias("m"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type")
    med = (
        per_vc.select(
            "event_type",
            "c",
            F.sum("m").over(wcum).alias("cum"),
            F.sum("m").over(wtot).alias("tot"),
        )
        .where(2 * F.col("cum") >= F.col("tot"))
        .groupBy("event_type")
        .agg(F.min("c").alias("med"))
    )
    z = vals.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("c") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
    )
    per_g = g.select(
        "n_g",
        "sz",
        # per-group double terms quantized to micro (order-free k-row sums)
        F.expr(
            "CAST(round(1e6 * CAST(sz AS DOUBLE) * sz / n_g) AS BIGINT)"
        ).alias("bss_micro"),
        F.expr(
            "CAST(round(1e6 * (szz - CAST(sz AS DOUBLE) * sz / n_g)) AS BIGINT)"
        ).alias("wss_micro"),
    )
    agg = per_g.agg(
        F.count("*").cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum("sz").cast("long").alias("sz_all"),
        F.sum("bss_micro").alias("bss_m"),
        F.sum("wss_micro").alias("wss_m"),
    )
    return agg.select(
        "k_groups",
        "n_total",
        F.expr(
            "CAST(round(1000.0 * CASE WHEN k_groups > 1 AND n_total > k_groups"
            " AND wss_m > 0 THEN"
            " ((CAST(bss_m AS DOUBLE) / 1e6"
            "   - CAST(sz_all AS DOUBLE) * sz_all / n_total) / (k_groups - 1))"
            " / ((CAST(wss_m AS DOUBLE) / 1e6) / (n_total - k_groups))"
            " ELSE 0.0 END) AS BIGINT)"
        ).alias("f_milli"),
    )


def brown_forsythe_test_sql() -> str:
    return """
        WITH vals AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        per_vc AS (
            SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS m
            FROM vals GROUP BY event_type, c
        ),
        med AS (
            SELECT event_type, MIN(c) AS med FROM (
                SELECT event_type, c,
                       SUM(m) OVER (PARTITION BY event_type ORDER BY c
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS cum,
                       SUM(m) OVER (PARTITION BY event_type) AS tot
                FROM per_vc
            ) WHERE 2 * cum >= tot
            GROUP BY event_type
        ),
        z AS (
            SELECT vals.event_type, abs(c - med) AS z
            FROM vals JOIN med USING (event_type)
        ),
        g AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(z) AS BIGINT) AS sz,
                   CAST(SUM(z * z) AS BIGINT) AS szz
            FROM z GROUP BY event_type
        ),
        per_g AS (
            SELECT n_g, sz,
                   CAST(round(1e6 * CAST(sz AS DOUBLE) * sz / n_g) AS BIGINT)
                       AS bss_micro,
                   CAST(round(1e6 * (szz - CAST(sz AS DOUBLE) * sz / n_g))
                        AS BIGINT) AS wss_micro
            FROM g
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
                   CAST(SUM(n_g) AS BIGINT) AS n_total,
                   CAST(SUM(sz) AS BIGINT) AS sz_all,
                   CAST(SUM(bss_micro) AS BIGINT) AS bss_m,
                   CAST(SUM(wss_micro) AS BIGINT) AS wss_m
            FROM per_g
        )
        SELECT k_groups, n_total,
               CAST(round(1000.0 * CASE WHEN k_groups > 1 AND n_total > k_groups
                    AND wss_m > 0 THEN
                    ((CAST(bss_m AS DOUBLE) / 1e6
                      - CAST(sz_all AS DOUBLE) * sz_all / n_total) / (k_groups - 1))
                    / ((CAST(wss_m AS DOUBLE) / 1e6) / (n_total - k_groups))
                    ELSE 0.0 END) AS BIGINT) AS f_milli
        FROM agg
    """


# --- Mantel-Haenszel pooled odds ratio ------------------------------------------------


def mantel_haenszel_or(events: DataFrame) -> DataFrame:
    """Mantel-Haenszel stratified odds ratio for the variant->purchase
    effect, controlling for user activity: one row (n_strata,
    or_pooled_milli, or_mh_milli).

    simpson_check flags WHEN pooling flips the comparison's sign; this is
    the standard ESTIMATOR that fixes it — OR_MH = sum(a_i d_i / n_i) /
    sum(b_i c_i / n_i) over the activity strata (same parity-variant and
    tercile-strata rules), vs the naive pooled-table OR. A large gap
    between the two IS the confounding, now in effect-size units.

    Exactness: all 2x2 cells are exact BIGINTs; each stratum's two ratio
    terms quantize to micro before the <=|strata|-row sums; one division
    at the emit.

    Scale shape: one user-grain aggregate, a <=|strata| cell rollup —
    nothing data-sized past the first shuffle."""
    per_user = events.groupBy("user_id").agg(
        F.count("*").alias("n_ev"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    assigned = per_user.select(
        F.least(F.lit(SIMPSON_STRATA - 1), F.expr("n_ev DIV 67")).alias("stratum"),
        (F.col("user_id") % 2 == 1).alias("treat"),
        "conv",
    )
    cells = assigned.groupBy("stratum").agg(
        F.sum(F.when(F.col("treat"), F.col("conv")).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("treat"), 1 - F.col("conv")).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(~F.col("treat"), F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(~F.col("treat"), 1 - F.col("conv")).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    terms = cells.select(
        "a",
        "b",
        "c",
        "d",
        F.expr(
            "CAST(round(1e6 * CAST(a AS DOUBLE) * d / (a + b + c + d)) AS BIGINT)"
        ).alias("ad_micro"),
        F.expr(
            "CAST(round(1e6 * CAST(b AS DOUBLE) * c / (a + b + c + d)) AS BIGINT)"
        ).alias("bc_micro"),
    )
    agg = terms.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("ta"),
        F.sum("b").cast("long").alias("tb"),
        F.sum("c").cast("long").alias("tc"),
        F.sum("d").cast("long").alias("td"),
        F.sum("ad_micro").alias("ad_m"),
        F.sum("bc_micro").alias("bc_m"),
    )
    return agg.select(
        "n_strata",
        F.expr(
            "CAST(CASE WHEN tb * tc > 0 THEN"
            " round(1000.0 * CAST(ta AS DOUBLE) * td / (CAST(tb AS DOUBLE) * tc))"
            " ELSE 0 END AS BIGINT)"
        ).alias("or_pooled_milli"),
        F.expr(
            "CAST(CASE WHEN bc_m > 0 THEN"
            " round(1000.0 * CAST(ad_m AS DOUBLE) / bc_m)"
            " ELSE 0 END AS BIGINT)"
        ).alias("or_mh_milli"),
    )


def mantel_haenszel_or_sql() -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id, COUNT(*) AS n_ev,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id
        ),
        assigned AS (
            SELECT LEAST({SIMPSON_STRATA - 1}, n_ev // 67) AS stratum,
                   (user_id % 2 = 1) AS treat, conv
            FROM per_user
        ),
        cells AS (
            SELECT stratum,
                   CAST(SUM(CASE WHEN treat THEN conv ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN treat THEN 1 - conv ELSE 0 END) AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN NOT treat THEN conv ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN NOT treat THEN 1 - conv ELSE 0 END) AS BIGINT) AS d
            FROM assigned GROUP BY stratum
        ),
        terms AS (
            SELECT a, b, c, d,
                   CAST(round(1e6 * CAST(a AS DOUBLE) * d / (a + b + c + d))
                        AS BIGINT) AS ad_micro,
                   CAST(round(1e6 * CAST(b AS DOUBLE) * c / (a + b + c + d))
                        AS BIGINT) AS bc_micro
            FROM cells
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                   CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(b) AS BIGINT) AS tb,
                   CAST(SUM(c) AS BIGINT) AS tc, CAST(SUM(d) AS BIGINT) AS td,
                   CAST(SUM(ad_micro) AS BIGINT) AS ad_m,
                   CAST(SUM(bc_micro) AS BIGINT) AS bc_m
            FROM terms
        )
        SELECT n_strata,
               CAST(CASE WHEN tb * tc > 0 THEN
                    round(1000.0 * CAST(ta AS DOUBLE) * td / (CAST(tb AS DOUBLE) * tc))
                    ELSE 0 END AS BIGINT) AS or_pooled_milli,
               CAST(CASE WHEN bc_m > 0 THEN
                    round(1000.0 * CAST(ad_m AS DOUBLE) / bc_m)
                    ELSE 0 END AS BIGINT) AS or_mh_milli
        FROM agg
    """


# --- Kruskal-Wallis rank ANOVA -----------------------------------------------------------


def kruskal_wallis_test(events: DataFrame) -> DataFrame:
    """Kruskal-Wallis rank one-way ANOVA of event value across event types:
    one row (k_groups, n_total, h_milli, hc_milli) — the nonparametric
    companion to dow_anova/Welch (means) and brown_forsythe (spreads).

    Exactness: values quantize to cents; pooled average ranks come DOUBLED
    (r2 = 2*cum_before + t + 1, an exact BIGINT off the per-cent-value
    aggregate) so tied groups share an exact integer rank; each group's H
    contribution 3*R2_g^2/(n_g*N*(N+1)) quantizes to micro before the
    <=|types|-row integer sum (order-free); the tie correction
    C = 1 - sum(t^3-t)/(N^3-N) divides once at the end (both engines run
    the identical double chain).

    Scale shape: one (cents) aggregate + ONE cumulative window over it
    (the kth_smallest discipline — never the raw rows), one (type, cents)
    aggregate joined on the cent key, one <=|types|-row reduction."""
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    vals = events.select("event_type", cents.alias("c"))
    per_c = vals.groupBy("c").agg(F.count("*").cast("long").alias("t"))
    wcum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_c.select(
        "c",
        "t",
        (2 * F.sum("t").over(wcum) - F.col("t") + 1).alias("r2"),
    )
    per_tc = vals.groupBy("event_type", "c").agg(
        F.count("*").cast("long").alias("m")
    )
    groups = (
        per_tc.join(ranked.select("c", "r2"), "c")
        .groupBy("event_type")
        .agg(
            F.sum("m").cast("long").alias("n_g"),
            F.sum(F.col("m") * F.col("r2")).cast("long").alias("r2_g"),
        )
    )
    tot = ranked.agg(
        F.sum("t").cast("long").alias("n_tot"),
        F.sum(
            F.col("t").cast("decimal(38,0)")
            * F.col("t") * F.col("t") - F.col("t")
        ).cast("decimal(38,0)").alias("tie3"),
    )
    terms = groups.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_tot",
        "tie3",
        F.expr(
            "CAST(round(1e6 * 3.0 * CAST(r2_g AS DOUBLE) * r2_g"
            " / (CAST(n_g AS DOUBLE) * n_tot * (n_tot + 1))) AS BIGINT)"
        ).alias("h_micro_g"),
    )
    return (
        terms.groupBy("n_tot", "tie3")
        .agg(
            F.count("*").cast("long").alias("k_groups"),
            F.sum("h_micro_g").cast("long").alias("s_micro"),
        )
        .select(
            "k_groups",
            F.col("n_tot").alias("n_total"),
            (F.col("s_micro") - F.expr(
                "CAST(round(1e6 * 3.0 * (n_tot + 1)) AS BIGINT)"
            )).alias("h_micro"),
            F.expr(
                "CASE WHEN n_tot > 1 THEN 1.0 - CAST(tie3 AS DOUBLE)"
                " / (CAST(n_tot AS DOUBLE) * n_tot * n_tot - n_tot)"
                " ELSE 1.0 END"
            ).alias("c_tie"),
        )
        .select(
            "k_groups",
            "n_total",
            F.expr("CAST(round(h_micro / 1000.0) AS BIGINT)").alias("h_milli"),
            F.expr(
                "CAST(CASE WHEN c_tie > 0"
                " THEN round(h_micro / c_tie / 1000.0) ELSE 0 END AS BIGINT)"
            ).alias("hc_milli"),
        )
    )


def kruskal_wallis_test_sql() -> str:
    return """
        WITH vals AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        per_c AS (
            SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM vals GROUP BY c
        ),
        ranked AS (
            SELECT c, t,
                   2 * SUM(t) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - t + 1 AS r2
            FROM per_c
        ),
        per_tc AS (
            SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS m
            FROM vals GROUP BY event_type, c
        ),
        groups AS (
            SELECT event_type, CAST(SUM(m) AS BIGINT) AS n_g,
                   CAST(SUM(m * r2) AS BIGINT) AS r2_g
            FROM per_tc JOIN ranked USING (c)
            GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n_tot,
                   SUM(CAST(t AS HUGEINT) * t * t - t) AS tie3
            FROM ranked
        ),
        terms AS (
            SELECT event_type, n_tot, tie3,
                   CAST(round(1e6 * 3.0 * CAST(r2_g AS DOUBLE) * r2_g
                        / (CAST(n_g AS DOUBLE) * n_tot * (n_tot + 1)))
                        AS BIGINT) AS h_micro_g
            FROM groups CROSS JOIN tot
        ),
        agg AS (
            SELECT n_tot, tie3,
                   CAST(COUNT(*) AS BIGINT) AS k_groups,
                   CAST(SUM(h_micro_g) AS BIGINT)
                   - CAST(round(1e6 * 3.0 * (n_tot + 1)) AS BIGINT) AS h_micro,
                   CASE WHEN n_tot > 1 THEN 1.0 - CAST(tie3 AS DOUBLE)
                        / (CAST(n_tot AS DOUBLE) * n_tot * n_tot - n_tot)
                        ELSE 1.0 END AS c_tie
            FROM terms
            GROUP BY n_tot, tie3
        )
        SELECT k_groups, n_tot AS n_total,
               CAST(round(h_micro / 1000.0) AS BIGINT) AS h_milli,
               CAST(CASE WHEN c_tie > 0
                    THEN round(h_micro / c_tie / 1000.0)
                    ELSE 0 END AS BIGINT) AS hc_milli
        FROM agg
    """


# --- Cramer's V association strength -----------------------------------------------------


def cramers_v_dow(events: DataFrame) -> DataFrame:
    """Cramer's V association between event_type and day-of-week: one row
    (n_total, n_types, n_dows, chi2_milli, v_milli) — chi_square_independence
    measures WHETHER type and time-of-day associate; this is the bounded
    [0,1] effect SIZE on the type x weekday grid (comparable across tables
    of different dimension, unlike raw chi-square).

    Day-of-week is pure date arithmetic (days since the Monday epoch mod 7,
    the dow_anova device) so both engines bucket identically; the grid is
    DENSIFIED (zero cells contribute their full expected count); per-cell
    (o-e)^2/e terms quantize to micro before the <=|types|*7-row integer
    sum; V = sqrt(chi2 / (N * min(r-1, c-1))) runs the identical double
    chain in both engines.

    Scale shape: one (type, dow) aggregate, margins as window sums over the
    bounded cell relation, one broadcast grid cross join, one reduction."""
    dow = F.expr("CAST(datediff(CAST(ts AS DATE), DATE'1970-01-05') % 7 AS INT)")
    observed = events.groupBy(
        "event_type", dow.alias("dow")
    ).agg(F.count("*").cast("long").alias("o"))
    grid = observed.select("event_type").distinct().crossJoin(
        F.broadcast(observed.select("dow").distinct())
    )
    cells = grid.join(observed, ["event_type", "dow"], "left").select(
        "event_type", "dow", F.coalesce("o", F.lit(0)).alias("o")
    )
    wt = Window.partitionBy("event_type")
    wd = Window.partitionBy("dow")
    terms = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(wt).alias("rt"),
        F.sum("o").over(wd).alias("ct"),
    ).select(
        "event_type",
        "dow",
        "o",
        F.expr(
            "CAST(round(1e6 * (o - CAST(rt AS DOUBLE) * ct"
            " / SUM(o) OVER ()) * (o - CAST(rt AS DOUBLE) * ct / SUM(o) OVER ())"
            " / (CAST(rt AS DOUBLE) * ct / SUM(o) OVER ())) AS BIGINT)"
        ).alias("term_micro"),
    )
    return (
        terms.agg(
            F.sum(F.col("o")).cast("long").alias("n_total"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.countDistinct("dow").cast("long").alias("n_dows"),
            F.sum("term_micro").cast("long").alias("chi2_micro"),
        )
        .select(
            "n_total",
            "n_types",
            "n_dows",
            F.expr("CAST(round(chi2_micro / 1000.0) AS BIGINT)").alias(
                "chi2_milli"
            ),
            F.expr(
                "CAST(CASE WHEN n_total > 0 AND least(n_types, n_dows) > 1"
                " THEN round(1000.0 * sqrt(chi2_micro / 1e6"
                "      / (CAST(n_total AS DOUBLE)"
                "         * (least(n_types, n_dows) - 1))))"
                " ELSE 0 END AS BIGINT)"
            ).alias("v_milli"),
        )
    )


def cramers_v_dow_sql() -> str:
    return """
        WITH observed AS (
            SELECT event_type,
                   CAST(datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7
                        AS INT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM events GROUP BY 1, 2
        ),
        grid AS (
            SELECT t.event_type, d.dow
            FROM (SELECT DISTINCT event_type FROM observed) t
            CROSS JOIN (SELECT DISTINCT dow FROM observed) d
        ),
        cells AS (
            SELECT g.event_type, g.dow, COALESCE(o.o, 0) AS o
            FROM grid g LEFT JOIN observed o
              ON g.event_type = o.event_type AND g.dow = o.dow
        ),
        terms AS (
            SELECT event_type, dow, o,
                   CAST(round(1e6 * (o - CAST(rt AS DOUBLE) * ct / n)
                        * (o - CAST(rt AS DOUBLE) * ct / n)
                        / (CAST(rt AS DOUBLE) * ct / n)) AS BIGINT) AS term_micro
            FROM (
                SELECT event_type, dow, o,
                       SUM(o) OVER (PARTITION BY event_type) AS rt,
                       SUM(o) OVER (PARTITION BY dow) AS ct,
                       SUM(o) OVER () AS n
                FROM cells
            )
        ),
        agg AS (
            SELECT CAST(SUM(o) AS BIGINT) AS n_total,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
                   CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_dows,
                   CAST(SUM(term_micro) AS BIGINT) AS chi2_micro
            FROM terms
        )
        SELECT n_total, n_types, n_dows,
               CAST(round(chi2_micro / 1000.0) AS BIGINT) AS chi2_milli,
               CAST(CASE WHEN n_total > 0 AND least(n_types, n_dows) > 1
                    THEN round(1000.0 * sqrt(chi2_micro / 1e6
                         / (CAST(n_total AS DOUBLE)
                            * (least(n_types, n_dows) - 1))))
                    ELSE 0 END AS BIGINT) AS v_milli
        FROM agg
    """


# --- Permutation entropy of the daily sequence --------------------------------------------


def permutation_entropy_daily(events: DataFrame) -> DataFrame:
    """Order-3 permutation entropy of each type's daily-count sequence:
    (event_type, n_windows, pe_milli) — the complexity measure that
    separates trending/periodic series (few ordinal patterns dominate, PE
    near 0) from noise-like ones (all six patterns equally likely, PE near
    1000), complementing text_predictability's symbol-level entropy with an
    ORDINAL, magnitude-free view of the shape.

    The (type, day) grid is densified with a broadcast type x day cross
    join before windowing, so a zero-event day is a real 0 observation
    (ranked lowest by the tie rule) and every triple spans three
    CONSECUTIVE observed-range days — gap days are never spliced into one
    ordinal window. Each consecutive day-count triple maps to one of six
    ordinal patterns via three pairwise comparisons with the standard
    later-index-wins tie rule (>= on the forward pairs), so the pattern
    code is exact integer arithmetic; pattern-share entropy terms -p*ln(p)
    quantize to micro before the <=6-row integer sum, normalized by ln(6).

    Scale shape: bounded (type, day) aggregate densified by a broadcast
    grid, one type-partitioned 2-lead window over it, a <=|types|*6
    pattern aggregate + reduction."""
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    grid = daily.select("event_type").distinct().crossJoin(
        F.broadcast(daily.select("day").distinct())
    )
    cells = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0)).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pats = (
        cells.select(
            "event_type",
            "c",
            F.lead("c", 1).over(w).alias("c1"),
            F.lead("c", 2).over(w).alias("c2"),
        )
        .where(F.col("c2").isNotNull())
        .select(
            "event_type",
            (
                (F.col("c1") >= F.col("c")).cast("int") * 4
                + (F.col("c2") >= F.col("c")).cast("int") * 2
                + (F.col("c2") >= F.col("c1")).cast("int")
            ).alias("code"),
        )
    )
    per_pat = pats.groupBy("event_type", "code").agg(
        F.count("*").cast("long").alias("w")
    )
    wn = Window.partitionBy("event_type")
    terms = per_pat.select(
        "event_type",
        F.sum("w").over(wn).alias("n_windows"),
        F.expr(
            "CAST(round(-1e6 * (CAST(w AS DOUBLE)"
            " / SUM(w) OVER (PARTITION BY event_type))"
            " * ln(CAST(w AS DOUBLE)"
            " / SUM(w) OVER (PARTITION BY event_type))) AS BIGINT)"
        ).alias("term_micro"),
    )
    return (
        terms.groupBy("event_type", "n_windows")
        .agg(F.sum("term_micro").cast("long").alias("h_micro"))
        .select(
            "event_type",
            "n_windows",
            F.expr(
                "CAST(round(h_micro / 1000.0 / ln(6.0)) AS BIGINT)"
            ).alias("pe_milli"),
        )
        .orderBy("event_type")
    )


def permutation_entropy_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        grid AS (
            SELECT t.event_type, d.day
            FROM (SELECT DISTINCT event_type FROM daily) t
            CROSS JOIN (SELECT DISTINCT day FROM daily) d
        ),
        cells AS (
            SELECT g.event_type, g.day, COALESCE(daily.c, 0) AS c
            FROM grid g LEFT JOIN daily
              ON g.event_type = daily.event_type AND g.day = daily.day
        ),
        pats AS (
            SELECT event_type,
                   CAST(c1 >= c AS INT) * 4 + CAST(c2 >= c AS INT) * 2
                   + CAST(c2 >= c1 AS INT) AS code
            FROM (
                SELECT event_type, c,
                       LEAD(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS c1,
                       LEAD(c, 2) OVER (PARTITION BY event_type ORDER BY day) AS c2
                FROM cells
            )
            WHERE c2 IS NOT NULL
        ),
        per_pat AS (
            SELECT event_type, code, CAST(COUNT(*) AS BIGINT) AS w
            FROM pats GROUP BY event_type, code
        ),
        terms AS (
            SELECT event_type,
                   SUM(w) OVER (PARTITION BY event_type) AS n_windows,
                   CAST(round(-1e6
                        * (CAST(w AS DOUBLE)
                           / SUM(w) OVER (PARTITION BY event_type))
                        * ln(CAST(w AS DOUBLE)
                             / SUM(w) OVER (PARTITION BY event_type)))
                        AS BIGINT) AS term_micro
            FROM per_pat
        )
        SELECT event_type, CAST(n_windows AS BIGINT) AS n_windows,
               CAST(round(SUM(term_micro) / 1000.0 / ln(6.0)) AS BIGINT)
                   AS pe_milli
        FROM terms
        GROUP BY event_type, n_windows
        ORDER BY event_type
    """


# --- Page-Hinkley drift detector ---------------------------------------------------------


def page_hinkley_daily(events: DataFrame) -> DataFrame:
    """Page-Hinkley upward-drift statistic over the daily mean value: one
    row (n_days, ph_max_milli, alarm_day) — the sequential change detector
    whose statistic PH_t = g_t - min_{s<=t} g_s (g the cumulative
    deviation-from-running-mean) rises only on SUSTAINED upward shifts,
    complementing cusum_drift (known-target CUSUM) and changepoint (single
    retrospective split) with the classic online-detector semantics;
    alarm_day is the earliest day attaining the maximum.

    Exactness: daily means are exact centi-sum / count doubles; each
    deviation term x_t - mean_{1..t} quantizes to micro BEFORE the
    cumulative integer sum, so prefix minima and the final max compare
    exact BIGINTs; both engines walk the identical ordered double chain
    (cumulative window sums are sequential in day order, not reduction
    trees).

    Scale shape: one (day) aggregate, three cumulative windows over the
    bounded day grid, a bounded-sort limit 1."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("sc"),
        F.count("*").cast("long").alias("cnt"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    m = daily.select(
        "day",
        F.expr("CAST(sc AS DOUBLE) / cnt").alias("x"),
    )
    cum = m.select(
        "day",
        "x",
        F.sum("x").over(w).alias("cx"),
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("long")
        .alias("t"),
    ).select(
        "day",
        F.expr("CAST(round(1e6 * (x - cx / t)) AS BIGINT)").alias(
            "term_micro"
        ),
    )
    g = cum.select(
        "day",
        F.sum("term_micro").over(w).alias("g"),
    ).select(
        "day",
        (F.col("g") - F.min("g").over(w)).alias("ph"),
    )
    tot = g.agg(F.count("*").cast("long").alias("n_days"))
    return (
        g.orderBy(F.col("ph").desc(), F.col("day").asc())
        .limit(1)
        .crossJoin(F.broadcast(tot))
        .select(
            "n_days",
            F.expr("CAST(round(ph / 1000.0) AS BIGINT)").alias(
                "ph_max_milli"
            ),
            F.col("day").alias("alarm_day"),
        )
    )


def page_hinkley_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        m AS (
            SELECT day, CAST(sc AS DOUBLE) / cnt AS x FROM daily
        ),
        cum AS (
            SELECT day,
                   CAST(round(1e6 * (x - SUM(x) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        / ROW_NUMBER() OVER (ORDER BY day))) AS BIGINT)
                       AS term_micro
            FROM m
        ),
        g AS (
            SELECT day,
                   SUM(term_micro) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gv
            FROM cum
        ),
        ph AS (
            SELECT day,
                   gv - MIN(gv) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
            FROM g
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ph) AS n_days,
               CAST(round(ph / 1000.0) AS BIGINT) AS ph_max_milli,
               day AS alarm_day
        FROM ph
        ORDER BY ph DESC, day ASC
        LIMIT 1
    """


# --- Friedman rank test ------------------------------------------------------------------


def friedman_test_daily(events: DataFrame) -> DataFrame:
    """Friedman rank test — do the event types keep the same activity
    ordering across days? One row (n_blocks, k_treatments, q_milli):
    blocks are days, treatments are event types, observations the
    densified daily counts (an absent type is a real 0 that must rank
    lowest, not a dropped cell).

    The repeated-measures companion to kruskal_wallis (independent
    groups): ranking WITHIN each day removes day-level volume shifts, so
    only the ordering signal remains. Uses the tie-general form
    Q = (k-1) * S_t / S_e with doubled within-block average ranks
    (r2 = 2*(rank-1) + ties + 1, exact BIGINTs): S_t = sum_j
    (R2_j - n(k+1))^2 / 4, S_e = (sum r2^2 - n*k*(k+1)^2) / 4 — the /4
    cancels, leaving ONE double division.

    Scale shape: bounded (type, day) aggregate densified by a broadcast
    grid, two day-partitioned windows over it, a <=|types| rollup."""
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    grid = daily.select("event_type").distinct().crossJoin(
        F.broadcast(daily.select("day").distinct())
    )
    cells = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0)).alias("c")
    )
    ranked = cells.select(
        "event_type",
        "day",
        (
            2 * (F.rank().over(Window.partitionBy("day").orderBy("c")) - 1)
            + F.count("*").over(Window.partitionBy("day", "c"))
            + 1
        ).cast("long").alias("r2"),
    )
    per_type = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("r2_j"),
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.col("r2") * F.col("r2")).cast("long").alias("sq"),
    )
    agg = per_type.agg(
        F.max("n_blocks").cast("long").alias("n_blocks"),
        F.count("*").cast("long").alias("k_treatments"),
        F.sum("sq").cast("long").alias("sum_sq"),
    )
    st = (
        per_type.select("r2_j").crossJoin(F.broadcast(agg))
        .groupBy("n_blocks", "k_treatments", "sum_sq")
        .agg(
            F.sum(
                (F.col("r2_j") - F.col("n_blocks") * (F.col("k_treatments") + 1))
                * (F.col("r2_j") - F.col("n_blocks") * (F.col("k_treatments") + 1))
            )
            .cast("long")
            .alias("s_t2")
        )
    )
    return (
        st.select(
            "n_blocks",
            "k_treatments",
            F.expr(
                "CAST(CASE WHEN sum_sq - n_blocks * k_treatments"
                " * (k_treatments + 1) * (k_treatments + 1) > 0"
                " THEN round(1000.0 * (k_treatments - 1) * s_t2"
                " / (sum_sq - n_blocks * k_treatments"
                "    * (k_treatments + 1) * (k_treatments + 1)))"
                " ELSE 0 END AS BIGINT)"
            ).alias("q_milli"),
        )
    )


def friedman_test_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        grid AS (
            SELECT t.event_type, d.day
            FROM (SELECT DISTINCT event_type FROM daily) t
            CROSS JOIN (SELECT DISTINCT day FROM daily) d
        ),
        cells AS (
            SELECT g.event_type, g.day, COALESCE(daily.c, 0) AS c
            FROM grid g LEFT JOIN daily
              ON g.event_type = daily.event_type AND g.day = daily.day
        ),
        ranked AS (
            SELECT event_type, day,
                   CAST(2 * (RANK() OVER (PARTITION BY day ORDER BY c) - 1)
                        + COUNT(*) OVER (PARTITION BY day, c) + 1
                        AS BIGINT) AS r2
            FROM cells
        ),
        per_type AS (
            SELECT event_type,
                   CAST(SUM(r2) AS BIGINT) AS r2_j,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(r2 * r2) AS BIGINT) AS sq
            FROM ranked GROUP BY event_type
        ),
        agg AS (
            SELECT MAX(n_blocks) AS n_blocks,
                   CAST(COUNT(*) AS BIGINT) AS k_treatments,
                   CAST(SUM(sq) AS BIGINT) AS sum_sq
            FROM per_type
        ),
        st AS (
            SELECT a.n_blocks, a.k_treatments, a.sum_sq,
                   CAST(SUM((p.r2_j - a.n_blocks * (a.k_treatments + 1))
                        * (p.r2_j - a.n_blocks * (a.k_treatments + 1)))
                        AS BIGINT) AS s_t2
            FROM per_type p CROSS JOIN agg a
            GROUP BY a.n_blocks, a.k_treatments, a.sum_sq
        )
        SELECT n_blocks, k_treatments,
               CAST(CASE WHEN sum_sq - n_blocks * k_treatments
                         * (k_treatments + 1) * (k_treatments + 1) > 0
                    THEN round(1000.0 * (k_treatments - 1) * s_t2
                         / (sum_sq - n_blocks * k_treatments
                            * (k_treatments + 1) * (k_treatments + 1)))
                    ELSE 0 END AS BIGINT) AS q_milli
        FROM st
    """


# --- Jarque-Bera normality test ---------------------------------------------------------


def jarque_bera_daily(events: DataFrame) -> DataFrame:
    """Jarque-Bera normality test on the daily event-count series: one row
    (n_days, skew_milli, exkurt_milli, jb_milli).

    The moment-based normality gate in front of every device here that
    leans on a normal approximation (welch, prop_ztest, grubbs): JB =
    n/6 * (g1^2 + g2^2/4) from sample skewness g1 = m3/m2^1.5 and excess
    kurtosis g2 = m4/m2^2 - 3; JB >> 5.99 (chi2_2, 5%) says the daily
    counts are NOT normal and the z-device p-values are optimistic.

    Exactness: daily counts are exact BIGINTs; the four raw power sums
    S1..S4 accumulate as DECIMAL(38,0) (a 100 TB day can hold ~1e9 events
    whose 4th power overflows BIGINT), so the reduction is order-free;
    both engines then run one identical double chain (central moments
    from raw moments, then g1/g2/JB) on the single 1-row relation.

    Scale shape: one (day) aggregate, one 1-row moment reduction — no
    window, no join."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast(d38).alias("c")
    )
    m = daily.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.sum(F.col("c") * F.col("c") * F.col("c")).alias("s3"),
        F.sum(F.col("c") * F.col("c") * F.col("c") * F.col("c")).alias("s4"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.expr("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)").alias("mean"),
        F.expr("CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)").alias("r2"),
        F.expr("CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)").alias("r3"),
        F.expr("CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)").alias("r4"),
    ).select(
        "n_days",
        (F.col("r2") - F.col("mean") * F.col("mean")).alias("m2"),
        (
            F.col("r3")
            - 3 * F.col("mean") * F.col("r2")
            + 2 * F.col("mean") * F.col("mean") * F.col("mean")
        ).alias("m3"),
        (
            F.col("r4")
            - 4 * F.col("mean") * F.col("r3")
            + 6 * F.col("mean") * F.col("mean") * F.col("r2")
            - 3 * F.col("mean") * F.col("mean") * F.col("mean") * F.col("mean")
        ).alias("m4"),
    ).select(
        "n_days",
        F.expr(
            "CAST(CASE WHEN m2 > 0"
            " THEN round(1000.0 * m3 / pow(m2, 1.5)) ELSE 0 END AS BIGINT)"
        ).alias("skew_milli"),
        F.expr(
            "CAST(CASE WHEN m2 > 0"
            " THEN round(1000.0 * (m4 / (m2 * m2) - 3.0))"
            " ELSE 0 END AS BIGINT)"
        ).alias("exkurt_milli"),
        F.expr(
            "CAST(CASE WHEN m2 > 0 THEN round("
            " 1000.0 * n_days / 6.0 * (pow(m3 / pow(m2, 1.5), 2)"
            " + pow(m4 / (m2 * m2) - 3.0, 2) / 4.0)) ELSE 0 END AS BIGINT)"
        ).alias("jb_milli"),
    )


def jarque_bera_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS c
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        m AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(c) AS s1,
                   SUM(c * c) AS s2, SUM(c * c * c) AS s3,
                   SUM(c * c * c * c) AS s4
            FROM daily
        ),
        r AS (
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                   CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                   CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                   CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
            FROM m
        ),
        c AS (
            SELECT n_days,
                   r2 - mean * mean AS m2,
                   r3 - 3 * mean * r2 + 2 * mean * mean * mean AS m3,
                   r4 - 4 * mean * r3 + 6 * mean * mean * r2
                       - 3 * mean * mean * mean * mean AS m4
            FROM r
        )
        SELECT n_days,
               CAST(CASE WHEN m2 > 0
                    THEN round(1000.0 * m3 / pow(m2, 1.5))
                    ELSE 0 END AS BIGINT) AS skew_milli,
               CAST(CASE WHEN m2 > 0
                    THEN round(1000.0 * (m4 / (m2 * m2) - 3.0))
                    ELSE 0 END AS BIGINT) AS exkurt_milli,
               CAST(CASE WHEN m2 > 0 THEN round(
                    1000.0 * n_days / 6.0 * (pow(m3 / pow(m2, 1.5), 2)
                    + pow(m4 / (m2 * m2) - 3.0, 2) / 4.0))
                    ELSE 0 END AS BIGINT) AS jb_milli
        FROM c
    """


# --- Durbin-Watson residual autocorrelation ---------------------------------------------


def durbin_watson_daily(events: DataFrame) -> DataFrame:
    """Durbin-Watson statistic on the residuals of the daily value-sum OLS
    trend: one row (n_days, slope_micro, dw_milli).

    dickey_fuller asks "is the LEVEL a random walk"; this asks the
    regression-diagnostics question "after fitting the linear trend, are
    the residuals serially correlated" — DW ~ 2 means clean errors, DW
    << 2 positive autocorrelation (the OLS t-stats on the trend are then
    overconfident and granger_lite/interrupted_ts fits inherit the bias).

    Exactness: daily value sums are exact centi BIGINTs and t is the day
    row-number, so all five regression moments are exact DECIMAL(38,0)
    and slope/intercept form one deterministic double pair; residuals
    quantize to milli-cents BEFORE the lag/square sums, which then
    accumulate as exact DECIMAL(38,0) (order-free).

    Scale shape: one (day) aggregate, one 1-row moment reduction
    broadcast back onto the bounded day grid, one lag window over that
    grid, one final 1-row reduction."""
    d38 = "decimal(38,0)"
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents).cast("long").alias("y")
    )
    t = daily.select(
        "day",
        "y",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    m = t.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.col("t").cast(d38)).alias("st"),
        F.sum((F.col("t") * F.col("t")).cast(d38)).alias("stt"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("t").cast(d38) * F.col("y").cast(d38)).alias("sty"),
    ).select(
        F.col("n").cast("long").alias("n_days"),
        F.expr("CAST(n * stt - st * st AS DOUBLE)").alias("ctt"),
        F.expr("CAST(n * sty - st * sy AS DOUBLE)").alias("cty"),
        F.expr("CAST(st AS DOUBLE) / CAST(n AS DOUBLE)").alias("tbar"),
        F.expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").alias("ybar"),
    )
    resid = t.crossJoin(F.broadcast(m)).select(
        "day",
        "n_days",
        F.expr(
            "CAST(round(1000.0 * (y - (ybar + CASE WHEN ctt > 0"
            " THEN cty / ctt ELSE 0.0 END * (t - tbar)))) AS BIGINT)"
        ).alias("e"),
        F.expr(
            "CAST(CASE WHEN ctt > 0 THEN round(1e6 * cty / ctt)"
            " ELSE 0 END AS BIGINT)"
        ).alias("slope_micro"),
    )
    w = Window.orderBy("day")
    dd = resid.select(
        "n_days",
        "slope_micro",
        F.col("e").cast(d38).alias("e"),
        (F.col("e") - F.lag("e").over(w)).cast(d38).alias("d"),
    )
    return (
        dd.groupBy("n_days", "slope_micro")
        .agg(
            F.sum(F.col("e") * F.col("e")).alias("see"),
            F.sum(F.col("d") * F.col("d")).alias("sdd"),
        )
        .select(
            "n_days",
            "slope_micro",
            F.expr(
                "CAST(CASE WHEN see > 0 THEN round("
                " 1000.0 * CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE))"
                " ELSE 0 END AS BIGINT)"
            ).alias("dw_milli"),
        )
    )


def durbin_watson_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        t AS (
            SELECT day, y,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        m AS (
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(n * stt - st * st AS DOUBLE) AS ctt,
                   CAST(n * sty - st * sy AS DOUBLE) AS cty,
                   CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS tbar,
                   CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
            FROM (
                SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                       SUM(CAST(t AS HUGEINT)) AS st,
                       SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)) AS stt,
                       SUM(CAST(y AS HUGEINT)) AS sy,
                       SUM(CAST(t AS HUGEINT) * CAST(y AS HUGEINT)) AS sty
                FROM t
            )
        ),
        resid AS (
            SELECT day, n_days,
                   CAST(round(1000.0 * (y - (ybar + CASE WHEN ctt > 0
                        THEN cty / ctt ELSE 0.0 END * (t - tbar))))
                        AS BIGINT) AS e,
                   CAST(CASE WHEN ctt > 0 THEN round(1e6 * cty / ctt)
                        ELSE 0 END AS BIGINT) AS slope_micro
            FROM t CROSS JOIN m
        ),
        dd AS (
            SELECT n_days, slope_micro, CAST(e AS HUGEINT) AS e,
                   CAST(e - LAG(e) OVER (ORDER BY day) AS HUGEINT) AS d
            FROM resid
        )
        SELECT n_days, slope_micro,
               CAST(CASE WHEN SUM(e * e) > 0 THEN round(
                    1000.0 * CAST(SUM(d * d) AS DOUBLE)
                    / CAST(SUM(e * e) AS DOUBLE))
                    ELSE 0 END AS BIGINT) AS dw_milli
        FROM dd
        GROUP BY n_days, slope_micro
    """


# --- Grubbs single-outlier test ---------------------------------------------------------


def grubbs_test_daily(events: DataFrame) -> DataFrame:
    """Grubbs test for a single outlier among the daily mean values: one
    row (n_days, g_milli, outlier_day).

    mad_outliers flags EVERY point beyond a robust band; Grubbs is the
    classical single-most-extreme-point TEST — G = max|x_i - mean| / s,
    compared against the t-based critical value, the device for "is the
    worst day a genuine anomaly or just the tail of a normal month".

    Exactness: each daily mean quantizes once to micro (round over the
    exact centi-sum/count double), so S1/S2 accumulate as DECIMAL(38,0)
    and the deviation |n*m_i - S1| is an exact integer comparable without
    division; argmax ties break to the earliest day via a bounded
    (deviation DESC, day ASC) limit-1 sort on the day grid.

    Scale shape: one (day) aggregate, one 1-row moment reduction
    broadcast back onto the bounded day grid, one limit-1 bounded sort."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr(
            "CAST(round(1e6 * CAST(SUM(CAST(round(value * 100) AS BIGINT))"
            " AS DOUBLE) / COUNT(*) / 100.0) AS BIGINT)"
        ).alias("m")
    )
    mom = daily.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.col("m").cast(d38)).alias("s1"),
        F.sum(F.col("m").cast(d38) * F.col("m").cast(d38)).alias("s2"),
    )
    dev = daily.crossJoin(F.broadcast(mom)).select(
        "day",
        F.col("n").cast("long").alias("n_days"),
        F.expr("CAST(abs(n * m - s1) AS DECIMAL(38,0))").alias("dev"),
        F.expr("CAST(n * s2 - s1 * s1 AS DOUBLE)").alias("css_n"),
    )
    return (
        dev.orderBy(F.col("dev").desc(), F.col("day").asc())
        .limit(1)
        .select(
            "n_days",
            F.expr(
                "CAST(CASE WHEN css_n > 0 AND n_days > 1 THEN round("
                " 1000.0 * CAST(dev AS DOUBLE)"
                " / (n_days * sqrt(css_n / n_days / (n_days - 1))))"
                " ELSE 0 END AS BIGINT)"
            ).alias("g_milli"),
            F.col("day").alias("outlier_day"),
        )
    )


def grubbs_test_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(round(1e6 * CAST(SUM(CAST(round(value * 100)
                        AS BIGINT)) AS DOUBLE) / COUNT(*) / 100.0)
                        AS BIGINT) AS m
            FROM events GROUP BY 1
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(CAST(m AS HUGEINT)) AS s1,
                   SUM(CAST(m AS HUGEINT) * CAST(m AS HUGEINT)) AS s2
            FROM daily
        ),
        dev AS (
            SELECT day, CAST(n AS BIGINT) AS n_days,
                   abs(n * m - s1) AS dev,
                   CAST(n * s2 - s1 * s1 AS DOUBLE) AS css_n
            FROM daily CROSS JOIN mom
        )
        SELECT n_days,
               CAST(CASE WHEN css_n > 0 AND n_days > 1 THEN round(
                    1000.0 * CAST(dev AS DOUBLE)
                    / (n_days * sqrt(css_n / n_days / (n_days - 1))))
                    ELSE 0 END AS BIGINT) AS g_milli,
               day AS outlier_day
        FROM dev
        ORDER BY dev DESC, day ASC
        LIMIT 1
    """


# --- Levene mean-centered spread test ---------------------------------------------------


def levene_test(events: DataFrame) -> DataFrame:
    """Levene test (MEAN-centered) for equal value spread across event
    types: one row (k_groups, n_total, w_milli).

    brown_forsythe is the median-centered robust variant; this is the
    original Levene W — more powerful under near-normality, the pair the
    textbooks report side by side. Identical ANOVA skeleton, different
    center.

    Exactness: the per-type center is the exact centi-sum/count double;
    each |x - mean_g| quantizes once to milli-cents, so group sums of z
    and z^2 accumulate as DECIMAL(38,0) (order-free) and the per-group
    double terms quantize to micro before the <=k-row sums, exactly the
    brown_forsythe discipline.

    Scale shape: one (type) mean aggregate broadcast back onto the rows,
    one keyed aggregate, one <=k-row reduction."""
    d38 = "decimal(38,0)"
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    vals = events.select("event_type", cents.alias("c"))
    means = vals.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("sc"),
        F.count("*").cast("long").alias("cnt"),
    )
    z = vals.join(F.broadcast(means), "event_type").select(
        "event_type",
        F.expr(
            "CAST(round(1000.0 * abs(c - CAST(sc AS DOUBLE) / cnt))"
            " AS BIGINT)"
        ).alias("z"),
    )
    g = z.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(F.col("z").cast(d38)).alias("sz"),
        F.sum(F.col("z").cast(d38) * F.col("z").cast(d38)).alias("szz"),
    )
    per_g = g.select(
        "n_g",
        F.col("sz").alias("szd"),
        F.expr(
            "CAST(round(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n_g / 1e6)"
            " AS BIGINT)"
        ).alias("bss_milli2"),
        F.expr(
            "CAST(round((CAST(szz AS DOUBLE)"
            " - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n_g) / 1e6)"
            " AS BIGINT)"
        ).alias("wss_milli2"),
    )
    agg = per_g.agg(
        F.count("*").cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum("szd").cast("double").alias("sz_all"),
        F.sum("bss_milli2").cast("long").alias("bss"),
        F.sum("wss_milli2").cast("long").alias("wss"),
    )
    return agg.select(
        "k_groups",
        "n_total",
        F.expr(
            "CAST(round(1000.0 * CASE WHEN k_groups > 1 AND n_total > k_groups"
            " AND wss > 0 THEN"
            " ((bss - sz_all * sz_all / n_total / 1e6) / (k_groups - 1))"
            " / (CAST(wss AS DOUBLE) / (n_total - k_groups))"
            " ELSE 0.0 END) AS BIGINT)"
        ).alias("w_milli"),
    )


def levene_test_sql() -> str:
    return """
        WITH vals AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        means AS (
            SELECT event_type, CAST(SUM(c) AS BIGINT) AS sc,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM vals GROUP BY event_type
        ),
        z AS (
            SELECT vals.event_type,
                   CAST(round(1000.0 * abs(c - CAST(sc AS DOUBLE) / cnt))
                        AS BIGINT) AS z
            FROM vals JOIN means USING (event_type)
        ),
        g AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
                   SUM(CAST(z AS HUGEINT)) AS sz,
                   SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS szz
            FROM z GROUP BY event_type
        ),
        per_g AS (
            SELECT n_g, sz AS szd,
                   CAST(round(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                        / n_g / 1e6) AS BIGINT) AS bss_milli2,
                   CAST(round((CAST(szz AS DOUBLE)
                        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n_g)
                        / 1e6) AS BIGINT) AS wss_milli2
            FROM g
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
                   CAST(SUM(n_g) AS BIGINT) AS n_total,
                   CAST(SUM(szd) AS DOUBLE) AS sz_all,
                   CAST(SUM(bss_milli2) AS BIGINT) AS bss,
                   CAST(SUM(wss_milli2) AS BIGINT) AS wss
            FROM per_g
        )
        SELECT k_groups, n_total,
               CAST(round(1000.0 * CASE WHEN k_groups > 1
                    AND n_total > k_groups AND wss > 0 THEN
                    ((bss - sz_all * sz_all / n_total / 1e6) / (k_groups - 1))
                    / (CAST(wss AS DOUBLE) / (n_total - k_groups))
                    ELSE 0.0 END) AS BIGINT) AS w_milli
        FROM agg
    """


# --- Bartlett variance-homogeneity test -------------------------------------------------


def bartlett_test(events: DataFrame) -> DataFrame:
    """Bartlett test for equal value VARIANCE across event types: one row
    (k_groups, n_total, chi2_milli).

    The likelihood-ratio member of the spread-test trio (levene mean-
    centered, brown_forsythe median-centered): most powerful when the
    groups really are normal, notoriously fragile otherwise — reporting
    all three is how an analyst reads whether a variance difference is
    real or a tail artifact.

    Exactness: per-type sufficient statistics (n, sum c, sum c^2) are
    exact DECIMAL(38,0) centi sums; each group's double terms
    ((n_g-1)*s2_g, (n_g-1)*ln(s2_g), 1/(n_g-1)) quantize to fixed
    denominators BEFORE the <=k-row integer sums, so the final chi-square
    assembles from exact integers with one double chain.

    Scale shape: one keyed aggregate, one <=k-row reduction — no window,
    no join."""
    d38 = "decimal(38,0)"
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    g = (
        events.select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum(F.col("c").cast(d38)).alias("sc"),
            F.sum(F.col("c").cast(d38) * F.col("c").cast(d38)).alias("scc"),
        )
        .where(F.col("n_g") > 1)
    )
    per_g = g.select(
        "n_g",
        # s2_g in cents^2: (scc - sc^2/n) / (n-1), double from exact ints
        F.expr(
            "CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)"
            " / n_g"
        ).alias("css"),
    ).select(
        "n_g",
        F.expr("CAST(round(1e3 * css) AS DECIMAL(38,0))").alias(
            "pooled_milli"
        ),
        F.expr(
            "CAST(CASE WHEN css > 0 THEN"
            " round(1e6 * (n_g - 1) * ln(css / (n_g - 1)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("lns_micro"),
        F.expr("CAST(round(1e12 / (n_g - 1)) AS BIGINT)").alias(
            "inv_pico"
        ),
    )
    agg = per_g.agg(
        F.count("*").cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum("pooled_milli").alias("pooled_m"),
        F.sum("lns_micro").cast("long").alias("lns_m"),
        F.sum("inv_pico").cast("long").alias("inv_p"),
    )
    return agg.select(
        "k_groups",
        "n_total",
        F.expr(
            "CAST(CASE WHEN k_groups > 1 AND n_total > k_groups"
            " AND pooled_m > 0 THEN round(1000.0 *"
            " ((n_total - k_groups)"
            "  * ln(CAST(pooled_m AS DOUBLE) / 1e3 / (n_total - k_groups))"
            "  - CAST(lns_m AS DOUBLE) / 1e6)"
            " / (1.0 + (CAST(inv_p AS DOUBLE) / 1e12"
            "           - 1.0 / (n_total - k_groups))"
            "          / (3.0 * (k_groups - 1))))"
            " ELSE 0 END AS BIGINT)"
        ).alias("chi2_milli"),
    )


def bartlett_test_sql() -> str:
    return """
        WITH g AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
                   SUM(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
                       AS sc,
                   SUM(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                       * CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
                       AS scc
            FROM events GROUP BY event_type
            HAVING COUNT(*) > 1
        ),
        per_g AS (
            SELECT n_g,
                   CAST(round(1e3 * css) AS HUGEINT) AS pooled_milli,
                   CAST(CASE WHEN css > 0 THEN
                        round(1e6 * (n_g - 1) * ln(css / (n_g - 1)))
                        ELSE 0 END AS BIGINT) AS lns_micro,
                   CAST(round(1e12 / (n_g - 1)) AS BIGINT) AS inv_pico
            FROM (
                SELECT n_g,
                       CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)
                           * CAST(sc AS DOUBLE) / n_g AS css
                FROM g
            )
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
                   CAST(SUM(n_g) AS BIGINT) AS n_total,
                   SUM(pooled_milli) AS pooled_m,
                   CAST(SUM(lns_micro) AS BIGINT) AS lns_m,
                   CAST(SUM(inv_pico) AS BIGINT) AS inv_p
            FROM per_g
        )
        SELECT k_groups, n_total,
               CAST(CASE WHEN k_groups > 1 AND n_total > k_groups
                    AND pooled_m > 0 THEN round(1000.0 *
                    ((n_total - k_groups)
                     * ln(CAST(pooled_m AS DOUBLE) / 1e3 / (n_total - k_groups))
                     - CAST(lns_m AS DOUBLE) / 1e6)
                    / (1.0 + (CAST(inv_p AS DOUBLE) / 1e12
                              - 1.0 / (n_total - k_groups))
                             / (3.0 * (k_groups - 1))))
                    ELSE 0 END AS BIGINT) AS chi2_milli
        FROM agg
    """


# --- Cochran-Armitage trend test --------------------------------------------------------


def cochran_armitage_trend(events: DataFrame) -> DataFrame:
    """Cochran-Armitage trend test for error share across the four
    six-hour day parts: one row (n_groups, n_total, z_milli).

    chi_square asks "is outcome INDEPENDENT of the hour bucket";
    Cochran-Armitage asks the sharper ORDERED question — does the error
    proportion trend monotonically across morning -> night (scores
    w = 0,1,2,3)? The dose-response device: one degree of freedom, so it
    detects gradients chi-square dilutes across cells.

    Exactness: every sufficient statistic (N, R, sum w*r, sum w*n,
    sum w^2*n) is an exact BIGINT count sum over the <=4-row bucket grid;
    the statistic T = sum w*r - (R/N) sum w*n and its variance form one
    deterministic double chain with the final sqrt as the only float
    boundary.

    Scale shape: one (bucket) aggregate, one <=4-row reduction — no
    window, no join."""
    g = events.groupBy(
        F.floor(F.hour("ts") / 6).cast("int").alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(
            (F.col("event_type") == "error").cast("long")
        ).cast("long").alias("r_g"),
    )
    agg = g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum("r_g").cast("long").alias("r_total"),
        F.sum(F.col("bucket") * F.col("r_g")).cast("long").alias("swr"),
        F.sum(F.col("bucket") * F.col("n_g")).cast("long").alias("swn"),
        F.sum(
            F.col("bucket") * F.col("bucket") * F.col("n_g")
        ).cast("long").alias("sw2n"),
    )
    return agg.select(
        "n_groups",
        "n_total",
        F.expr(
            "CAST(CASE WHEN n_total > 0 AND r_total > 0"
            " AND r_total < n_total"
            " AND sw2n - CAST(swn AS DOUBLE) * swn / n_total > 0"
            " THEN round(1000.0 *"
            " (swr - CAST(r_total AS DOUBLE) / n_total * swn)"
            " / sqrt(CAST(r_total AS DOUBLE) / n_total"
            "        * (1.0 - CAST(r_total AS DOUBLE) / n_total)"
            "        * (sw2n - CAST(swn AS DOUBLE) * swn / n_total)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def cochran_armitage_trend_sql() -> str:
    return """
        WITH g AS (
            SELECT CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS INT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS r_g
            FROM events GROUP BY 1
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(n_g) AS BIGINT) AS n_total,
                   CAST(SUM(r_g) AS BIGINT) AS r_total,
                   CAST(SUM(bucket * r_g) AS BIGINT) AS swr,
                   CAST(SUM(bucket * n_g) AS BIGINT) AS swn,
                   CAST(SUM(bucket * bucket * n_g) AS BIGINT) AS sw2n
            FROM g
        )
        SELECT n_groups, n_total,
               CAST(CASE WHEN n_total > 0 AND r_total > 0
                    AND r_total < n_total
                    AND sw2n - CAST(swn AS DOUBLE) * swn / n_total > 0
                    THEN round(1000.0 *
                    (swr - CAST(r_total AS DOUBLE) / n_total * swn)
                    / sqrt(CAST(r_total AS DOUBLE) / n_total
                           * (1.0 - CAST(r_total AS DOUBLE) / n_total)
                           * (sw2n - CAST(swn AS DOUBLE) * swn / n_total)))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM agg
    """


# --- McNemar paired-binary test ---------------------------------------------------------

MCNEMAR_CUTOFF = "2024-01-16"


def mcnemar_test(events: DataFrame, cutoff: str = MCNEMAR_CUTOFF) -> DataFrame:
    """McNemar test of user-activity flips across the mid-window cutoff:
    one row (n_users, n01, n10, chi2_milli).

    prop_ztest compares two INDEPENDENT samples; McNemar is the PAIRED
    companion — each user is their own control, and only the discordant
    cells (active-then-silent n10, silent-then-active n01) carry
    information. chi2 = (|n01 - n10| - 1)^2 / (n01 + n10) with the
    continuity correction; a large value says the active population
    genuinely shifted rather than churned symmetrically.

    Exactness: both cells are exact BIGINT counts from one per-user
    boolean aggregate; the statistic is one integer-fed division.

    Scale shape: one (user) aggregate, one 1-row reduction — no window,
    no join."""
    per_user = events.groupBy("user_id").agg(
        F.max((F.to_date("ts") < F.lit(cutoff)).cast("int")).alias("a"),
        F.max((F.to_date("ts") >= F.lit(cutoff)).cast("int")).alias("b"),
    )
    agg = per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(((F.col("a") == 0) & (F.col("b") == 1)).cast("long"))
        .cast("long")
        .alias("n01"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 0)).cast("long"))
        .cast("long")
        .alias("n10"),
    )
    return agg.select(
        "n_users",
        "n01",
        "n10",
        F.expr(
            "CAST(CASE WHEN n01 + n10 > 0 THEN round(1000.0"
            " * (abs(n01 - n10) - 1) * (abs(n01 - n10) - 1)"
            " / (n01 + n10)) ELSE 0 END AS BIGINT)"
        ).alias("chi2_milli"),
    )


def mcnemar_test_sql(cutoff: str = MCNEMAR_CUTOFF) -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN CAST(ts AS DATE) < DATE '{cutoff}'
                       THEN 1 ELSE 0 END) AS a,
                   MAX(CASE WHEN CAST(ts AS DATE) >= DATE '{cutoff}'
                       THEN 1 ELSE 0 END) AS b
            FROM events GROUP BY user_id
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n01,
                   CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n10
            FROM per_user
        )
        SELECT n_users, n01, n10,
               CAST(CASE WHEN n01 + n10 > 0 THEN round(1000.0
                    * (abs(n01 - n10) - 1) * (abs(n01 - n10) - 1)
                    / (n01 + n10)) ELSE 0 END AS BIGINT) AS chi2_milli
        FROM agg
    """


# --- Cochran's Q repeated-binary test ---------------------------------------------------

COCHRAN_Q_TYPES = ("click", "view", "purchase")


def cochran_q_test(events: DataFrame) -> DataFrame:
    """Cochran's Q test across the click/view/purchase participation
    flags, blocked by user: one row (n_users, q_milli).

    friedman_test ranks CONTINUOUS daily magnitudes; Cochran's Q is its
    BINARY specialisation — did each user touch each funnel surface, and
    do the three participation rates differ once per-user propensity is
    blocked out? Q = (k-1)(k*sum C_j^2 - T^2) / (k*T - sum R_i^2) with
    C_j the per-type column totals, R_i the per-user row totals, T their
    common grand total.

    Exactness: every statistic is an exact BIGINT count sum (R_i <= 3, so
    R_i^2 sums stay tiny); one integer-fed division closes it.

    Scale shape: one (user) aggregate, one 1-row reduction — no window,
    no join."""
    k = len(COCHRAN_Q_TYPES)
    flags = [
        F.max((F.col("event_type") == t).cast("int")).alias(f"x{j}")
        for j, t in enumerate(COCHRAN_Q_TYPES)
    ]
    per_user = events.groupBy("user_id").agg(*flags)
    r = per_user.select(
        (sum(F.col(f"x{j}") for j in range(k))).cast("long").alias("r"),
        *[F.col(f"x{j}").cast("long") for j in range(k)],
    )
    agg = r.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("r").cast("long").alias("t_total"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("srr"),
        *[F.sum(f"x{j}").cast("long").alias(f"c{j}") for j in range(k)],
    )
    c2 = " + ".join(f"c{j} * c{j}" for j in range(k))
    return agg.select(
        "n_users",
        F.expr(
            f"CAST(CASE WHEN {k} * t_total - srr > 0 THEN round(1000.0"
            f" * {k - 1} * ({k} * ({c2}) - t_total * t_total)"
            f" / ({k} * t_total - srr)) ELSE 0 END AS BIGINT)"
        ).alias("q_milli"),
    )


def cochran_q_test_sql() -> str:
    k = len(COCHRAN_Q_TYPES)
    cols = ",\n                   ".join(
        f"MAX(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS x{j}"
        for j, t in enumerate(COCHRAN_Q_TYPES)
    )
    rsum = " + ".join(f"x{j}" for j in range(k))
    csums = ",\n                   ".join(
        f"CAST(SUM(x{j}) AS BIGINT) AS c{j}" for j in range(k)
    )
    c2 = " + ".join(f"c{j} * c{j}" for j in range(k))
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   {cols}
            FROM events GROUP BY user_id
        ),
        r AS (
            SELECT CAST({rsum} AS BIGINT) AS r,
                   {', '.join(f'CAST(x{j} AS BIGINT) AS x{j}' for j in range(k))}
            FROM per_user
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(r) AS BIGINT) AS t_total,
                   CAST(SUM(r * r) AS BIGINT) AS srr,
                   {csums}
            FROM r
        )
        SELECT n_users,
               CAST(CASE WHEN {k} * t_total - srr > 0 THEN round(1000.0
                    * {k - 1} * ({k} * ({c2}) - t_total * t_total)
                    / ({k} * t_total - srr)) ELSE 0 END AS BIGINT) AS q_milli
        FROM agg
    """


# --- KPSS level-stationarity statistic --------------------------------------------------


def kpss_daily(events: DataFrame) -> DataFrame:
    """KPSS level-stationarity statistic (lag-0 long-run variance) on the
    daily event-count series: one row (n_days, kpss_micro).

    dickey_fuller's null is a UNIT ROOT (reject => stationary); KPSS
    flips the burden — its null is stationarity, so the pair brackets the
    series from both sides (both-reject means structural trouble). With
    the lag-0 variance the statistic reduces to sum_t S_t^2 / (n *
    sum_t e_t^2) for demeaned partial sums S_t.

    Exactness: fully integer — n*e_t = n*c_t - S1 is an exact BIGINT, its
    cumulative sum C_t stays integer, and the statistic is the all-integer
    ratio sum C_t^2 / (n * sum (n e_t)^2) with both power sums in
    DECIMAL(38,0); the single division is the only float boundary.

    Scale shape: one (day) aggregate, one 1-row scalar broadcast back,
    one cumulative window over the bounded day grid, one 1-row
    reduction."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
    )
    e = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        (F.col("n") * F.col("c") - F.col("s1")).alias("ne"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = e.select(
        "n",
        F.col("ne").cast(d38).alias("ne"),
        F.sum("ne").over(w).cast(d38).alias("cne"),
    )
    return (
        cum.groupBy("n")
        .agg(
            F.sum(F.col("cne") * F.col("cne")).alias("scc"),
            F.sum(F.col("ne") * F.col("ne")).alias("see"),
        )
        .select(
            F.col("n").alias("n_days"),
            F.expr(
                "CAST(CASE WHEN see > 0 THEN round(1e6"
                " * CAST(scc AS DOUBLE) / (n * CAST(see AS DOUBLE)))"
                " ELSE 0 END AS BIGINT)"
            ).alias("kpss_micro"),
        )
    )


def kpss_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s1
            FROM daily
        ),
        e AS (
            SELECT day, n, CAST(n * c - s1 AS BIGINT) AS ne
            FROM daily CROSS JOIN tot
        ),
        cum AS (
            SELECT n, CAST(ne AS HUGEINT) AS ne,
                   CAST(SUM(ne) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS HUGEINT) AS cne
            FROM e
        )
        SELECT n AS n_days,
               CAST(CASE WHEN SUM(ne * ne) > 0 THEN round(1e6
                    * CAST(SUM(cne * cne) AS DOUBLE)
                    / (n * CAST(SUM(ne * ne) AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS kpss_micro
        FROM cum
        GROUP BY n
    """


# --- Wilcoxon signed-rank paired test ---------------------------------------------------

WILCOXON_X_TYPE = "click"
WILCOXON_Y_TYPE = "error"


def wilcoxon_signed_rank_daily(events: DataFrame) -> DataFrame:
    """Wilcoxon signed-rank test of paired daily click vs error counts:
    one row (n_pairs, w2_plus, z_milli).

    spearman_daily correlates the two series; this TESTS whether their
    per-day DIFFERENCE is symmetric around zero — the nonparametric
    paired-t replacement. Zero differences drop (Wilcoxon's rule); |d|
    gets average ranks; W+ sums the ranks of the positive days, and z
    applies the normal approximation with the tie-corrected variance
    var = n(n+1)(2n+1)/24 - sum(t^3 - t)/48.

    Exactness: doubled average ranks (2*cum_before + t + 1) are exact
    BIGINTs from one cumulative window over the <=|days| distinct-|d|
    grid, so w2_plus = 2*W+ is integer; the tie sum is integer; the one
    float boundary is the final sqrt.

    Scale shape: one (day) conditional aggregate, one (|d|) aggregate,
    one cumulative window over that bounded grid, one 1-row reduction."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == WILCOXON_X_TYPE).cast("long"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == WILCOXON_Y_TYPE).cast("long"))
        .cast("long")
        .alias("y"),
    )
    d = daily.select(
        (F.col("x") - F.col("y")).alias("d")
    ).where(F.col("d") != 0)
    per_ad = d.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.count("*").cast("long").alias("t"),
        F.sum((F.col("d") > 0).cast("long")).cast("long").alias("pos"),
    )
    w = (
        Window.orderBy("ad")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_ad.select(
        "t",
        "pos",
        (F.coalesce(F.sum("t").over(w), F.lit(0))).alias("cum_before"),
    )
    agg = ranked.agg(
        F.coalesce(F.sum("t").cast("long"), F.lit(0).cast("long")).alias(
            "n_pairs"
        ),
        F.sum(
            F.col("pos") * (2 * F.col("cum_before") + F.col("t") + 1)
        ).cast("long").alias("w2_plus"),
        F.coalesce(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("tie3"),
    )
    return agg.select(
        "n_pairs",
        F.coalesce("w2_plus", F.lit(0)).alias("w2_plus"),
        F.expr(
            "CAST(CASE WHEN n_pairs > 0 AND"
            " n_pairs * (n_pairs + 1.0) * (2 * n_pairs + 1) / 24.0"
            " - tie3 / 48.0 > 0"
            " THEN round(1000.0"
            " * (w2_plus / 2.0 - n_pairs * (n_pairs + 1.0) / 4.0)"
            " / sqrt(n_pairs * (n_pairs + 1.0) * (2 * n_pairs + 1) / 24.0"
            "        - tie3 / 48.0))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def wilcoxon_signed_rank_daily_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = '{WILCOXON_X_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = '{WILCOXON_Y_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        d AS (
            SELECT x - y AS d FROM daily WHERE x - y <> 0
        ),
        per_ad AS (
            SELECT abs(d) AS ad, CAST(COUNT(*) AS BIGINT) AS t,
                   CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS pos
            FROM d GROUP BY abs(d)
        ),
        ranked AS (
            SELECT t, pos,
                   COALESCE(SUM(t) OVER (ORDER BY ad
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_before
            FROM per_ad
        ),
        agg AS (
            SELECT CAST(COALESCE(SUM(t), 0) AS BIGINT) AS n_pairs,
                   CAST(COALESCE(SUM(pos * (2 * cum_before + t + 1)), 0)
                        AS BIGINT) AS w2_plus,
                   CAST(COALESCE(SUM(t * t * t - t), 0) AS BIGINT) AS tie3
            FROM ranked
        )
        SELECT n_pairs, w2_plus,
               CAST(CASE WHEN n_pairs > 0 AND
                    n_pairs * (n_pairs + 1.0) * (2 * n_pairs + 1) / 24.0
                    - tie3 / 48.0 > 0
                    THEN round(1000.0
                    * (w2_plus / 2.0 - n_pairs * (n_pairs + 1.0) / 4.0)
                    / sqrt(n_pairs * (n_pairs + 1.0) * (2 * n_pairs + 1)
                           / 24.0 - tie3 / 48.0))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM agg
    """


# --- Periodogram seasonality scan -------------------------------------------------------

SPECTRAL_MIN_PERIOD = 2
SPECTRAL_MAX_PERIOD = 14


def spectral_periodogram_daily(events: DataFrame) -> DataFrame:
    """Discrete periodogram of the daily event-count series at candidate
    periods 2..14 days: rows (period, amp_micro), ordered by period.

    acf_daily measures lag correlation one lag at a time; the
    periodogram projects the demeaned series onto sin/cos pairs so a
    weekly cadence shows as an amplitude SPIKE at period 7 even when
    phase shifts would smear the ACF. amp = sqrt(A^2 + B^2) / n for
    A = sum (c_t - mean) cos(2 pi t / p), B likewise with sin.

    Exactness: the demeaned value (c_t - S1/n) is a deterministic double
    from exact integers; each cos/sin projection term quantizes to micro
    BEFORE the per-period integer sums (the permutation-entropy ln
    discipline applied to trig), so A and B are exact BIGINTs and the
    final sqrt is the one float boundary.

    Scale shape: one (day) aggregate, a bounded 13x|days| explode of the
    day grid, one (period) aggregate — no data-sized shuffle."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
    )
    t = daily.select(
        "c",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    terms = (
        t.crossJoin(F.broadcast(tot))
        .select(
            "c",
            "t",
            "n",
            "s1",
            F.explode(
                F.sequence(
                    F.lit(SPECTRAL_MIN_PERIOD), F.lit(SPECTRAL_MAX_PERIOD)
                )
            ).alias("period"),
        )
        .select(
            "period",
            "n",
            F.expr(
                "CAST(round(1e6 * (c - CAST(s1 AS DOUBLE) / n)"
                " * cos(2 * pi() * t / period)) AS BIGINT)"
            ).alias("ca"),
            F.expr(
                "CAST(round(1e6 * (c - CAST(s1 AS DOUBLE) / n)"
                " * sin(2 * pi() * t / period)) AS BIGINT)"
            ).alias("sb"),
        )
    )
    return (
        terms.groupBy("period", "n")
        .agg(
            F.sum("ca").cast("long").alias("a"),
            F.sum("sb").cast("long").alias("b"),
        )
        .select(
            F.col("period").cast("int").alias("period"),
            F.expr(
                "CAST(round(sqrt(CAST(a AS DOUBLE) * a"
                " + CAST(b AS DOUBLE) * b) / n) AS BIGINT)"
            ).alias("amp_micro"),
        )
        .orderBy("period")
    )


def spectral_periodogram_daily_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s1
            FROM daily
        ),
        t AS (
            SELECT c,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        terms AS (
            SELECT p.period, n,
                   CAST(round(1e6 * (c - CAST(s1 AS DOUBLE) / n)
                        * cos(2 * pi() * t / p.period)) AS BIGINT) AS ca,
                   CAST(round(1e6 * (c - CAST(s1 AS DOUBLE) / n)
                        * sin(2 * pi() * t / p.period)) AS BIGINT) AS sb
            FROM t CROSS JOIN tot
            CROSS JOIN (
                SELECT CAST(generate_series AS BIGINT) AS period
                FROM generate_series({SPECTRAL_MIN_PERIOD},
                                     {SPECTRAL_MAX_PERIOD})
            ) p
        )
        SELECT CAST(period AS INT) AS period,
               CAST(round(sqrt(CAST(SUM(ca) AS DOUBLE) * SUM(ca)
                    + CAST(SUM(sb) AS DOUBLE) * SUM(sb)) / n) AS BIGINT)
                   AS amp_micro
        FROM terms
        GROUP BY period, n
        ORDER BY period
    """


# --- Hurst rescaled-range exponent ------------------------------------------------------

HURST_WINDOWS = (4, 8, 16)


def hurst_rs_daily(events: DataFrame) -> DataFrame:
    """Hurst rescaled-range (R/S) exponent of the daily event-count
    series: one row (n_days, rs4_milli, rs8_milli, rs16_milli,
    hurst_milli).

    acf/ljung_box see short-range correlation; R/S sees LONG-range
    persistence — split the present-day ordinal series into blocks of
    w = 4/8/16 days, take each block's range of demeaned partial sums
    over its standard deviation, and read the growth rate: H ~ 0.5 is a
    random walk, H > 0.5 trending/persistent load, H < 0.5 mean-
    reverting. With log2-spaced windows the 3-point OLS slope of
    ln(R/S) on ln(w) reduces exactly to (ln rs16 - ln rs4)/(2 ln 2).

    Exactness: within a w-day block the scaled partial sum w*C_j =
    w*cumsum(c) - j*S_b is an exact BIGINT, so each block's range and
    variance term (w*sum c^2 - S_b^2) are integers; per-block R/S
    quantizes to milli before the per-w average (exact integer mean
    rounded once), and only complete blocks (n_b = w) count. Gap days do
    NOT densify: t is the ordinal index over PRESENT days (the
    permutation-entropy caveat, stated).

    Scale shape: one (day) aggregate, a bounded 3x|days| explode, two
    windows partitioned by (w, block) over that grid, one (w, block)
    aggregate, one <=3-row reduction."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    t = daily.select(
        "c",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    ex = t.select(
        "c",
        "t",
        F.explode(F.array(*[F.lit(w) for w in HURST_WINDOWS])).alias("w"),
    ).select(
        "c",
        "w",
        F.floor((F.col("t") - 1) / F.col("w")).cast("long").alias("blk"),
        "t",
    )
    win = Window.partitionBy("w", "blk").orderBy("t")
    cums = ex.select(
        "c",
        "w",
        "blk",
        F.sum("c").over(
            win.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.row_number().over(win).cast("long").alias("j"),
        F.sum("c").over(Window.partitionBy("w", "blk")).alias("sb"),
    ).select(
        "c",
        "w",
        "blk",
        (F.col("w") * F.col("cum") - F.col("j") * F.col("sb")).alias("wc"),
    )
    blocks = (
        cums.groupBy("w", "blk")
        .agg(
            F.count("*").cast("long").alias("n_b"),
            (F.max("wc") - F.min("wc")).alias("r_scaled"),
            (
                F.first("w") * F.sum(F.col("c") * F.col("c"))
                - F.sum("c") * F.sum("c")
            ).cast("long").alias("denom2"),
        )
        .where((F.col("n_b") == F.col("w")) & (F.col("denom2") > 0))
        .select(
            "w",
            F.expr(
                "CAST(round(1000.0 * r_scaled / sqrt(CAST(denom2 AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("rs_milli"),
        )
    )
    per_w = blocks.groupBy("w").agg(
        F.expr("CAST(round(AVG(CAST(rs_milli AS DOUBLE))) AS BIGINT)").alias(
            "rs"
        )
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    wide = per_w.groupBy().agg(
        *[
            F.max(
                F.when(F.col("w") == w, F.col("rs"))
            ).alias(f"rs{w}_milli")
            for w in HURST_WINDOWS
        ]
    )
    return (
        n_days.crossJoin(F.broadcast(wide))
        .select(
            "n_days",
            *[
                F.coalesce(f"rs{w}_milli", F.lit(0)).alias(f"rs{w}_milli")
                for w in HURST_WINDOWS
            ],
        )
        .select(
            "n_days",
            *[f"rs{w}_milli" for w in HURST_WINDOWS],
            F.expr(
                "CAST(CASE WHEN rs4_milli > 0 AND rs16_milli > 0"
                " THEN round(1000.0"
                " * (ln(rs16_milli / 1000.0) - ln(rs4_milli / 1000.0))"
                " / (2 * ln(2.0))) ELSE 0 END AS BIGINT)"
            ).alias("hurst_milli"),
        )
    )


def hurst_rs_daily_sql() -> str:
    ws = ", ".join(str(w) for w in HURST_WINDOWS)
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        t AS (
            SELECT c,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        ex AS (
            SELECT c, CAST(wd.w AS BIGINT) AS w,
                   CAST((t - 1) // wd.w AS BIGINT) AS blk, t
            FROM t CROSS JOIN (
                SELECT UNNEST(ARRAY[{ws}]) AS w
            ) wd
        ),
        cums AS (
            SELECT c, w, blk,
                   w * SUM(c) OVER (PARTITION BY w, blk ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - CAST(ROW_NUMBER() OVER (PARTITION BY w, blk ORDER BY t)
                          AS BIGINT)
                     * SUM(c) OVER (PARTITION BY w, blk) AS wc
            FROM ex
        ),
        blocks AS (
            SELECT w,
                   CAST(round(1000.0 * (MAX(wc) - MIN(wc))
                        / sqrt(CAST(MIN(w) * SUM(c * c) - SUM(c) * SUM(c)
                               AS DOUBLE))) AS BIGINT) AS rs_milli
            FROM cums
            GROUP BY w, blk
            HAVING COUNT(*) = MIN(w)
               AND MIN(w) * SUM(c * c) - SUM(c) * SUM(c) > 0
        ),
        per_w AS (
            SELECT w,
                   CAST(round(AVG(CAST(rs_milli AS DOUBLE))) AS BIGINT) AS rs
            FROM blocks GROUP BY w
        ),
        wide AS (
            SELECT {', '.join(
                f"COALESCE(MAX(CASE WHEN w = {w} THEN rs END), 0)"
                f" AS rs{w}_milli" for w in HURST_WINDOWS)}
            FROM per_w
        ),
        nd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
        )
        SELECT n_days, {', '.join(f"rs{w}_milli" for w in HURST_WINDOWS)},
               CAST(CASE WHEN rs4_milli > 0 AND rs16_milli > 0
                    THEN round(1000.0
                    * (ln(rs16_milli / 1000.0) - ln(rs4_milli / 1000.0))
                    / (2 * ln(2.0))) ELSE 0 END AS BIGINT) AS hurst_milli
        FROM nd CROSS JOIN wide
    """


# --- Partial autocorrelation (Durbin-Levinson, lags 1-3) ---------------------------------


def pacf_daily(events: DataFrame) -> DataFrame:
    """Partial autocorrelation of the daily event-count series at lags
    1..3 via the Durbin-Levinson recursion: one row (n_days, pacf1_milli,
    pacf2_milli, pacf3_milli).

    acf_daily reports RAW lag correlation, which smears an AR(1) across
    every lag; PACF removes the shorter-lag pathway so an AR(p) series
    shows exactly p nonzero spikes — the classic order-selection
    diagnostic in front of holt/theta/croston model choices.

    Exactness: the scaled deviations X_t = n*c_t - S1 are exact BIGINTs,
    every lag product sum accumulates as DECIMAL(38,0), so the three ACF
    ratios r_k = sum X_t X_{t-k} / sum X^2 are deterministic doubles from
    exact integers and the Durbin-Levinson chain is one scripted double
    sequence, identical in both engines.

    Scale shape: one (day) aggregate, one 1-row scalar broadcast, three
    lag windows over the bounded day grid, one 1-row reduction."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
    )
    w = Window.orderBy("day")
    x = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        (F.col("n") * F.col("c") - F.col("s1")).alias("x"),
    )
    lagged = x.select(
        "n",
        F.col("x").cast(d38).alias("x"),
        F.lag("x", 1).over(w).cast(d38).alias("x1"),
        F.lag("x", 2).over(w).cast(d38).alias("x2"),
        F.lag("x", 3).over(w).cast(d38).alias("x3"),
    )
    mom = lagged.groupBy("n").agg(
        F.sum(F.col("x") * F.col("x")).alias("s0"),
        F.sum(F.col("x") * F.col("x1")).alias("sl1"),
        F.sum(F.col("x") * F.col("x2")).alias("sl2"),
        F.sum(F.col("x") * F.col("x3")).alias("sl3"),
    )
    return mom.select(
        F.col("n").alias("n_days"),
        F.expr(
            "CASE WHEN s0 > 0 THEN CAST(sl1 AS DOUBLE) / CAST(s0 AS DOUBLE)"
            " ELSE 0.0 END"
        ).alias("r1"),
        F.expr(
            "CASE WHEN s0 > 0 THEN CAST(sl2 AS DOUBLE) / CAST(s0 AS DOUBLE)"
            " ELSE 0.0 END"
        ).alias("r2"),
        F.expr(
            "CASE WHEN s0 > 0 THEN CAST(sl3 AS DOUBLE) / CAST(s0 AS DOUBLE)"
            " ELSE 0.0 END"
        ).alias("r3"),
    ).select(
        "n_days",
        "r1",
        "r2",
        "r3",
        F.expr(
            "CASE WHEN 1 - r1 * r1 <> 0"
            " THEN (r2 - r1 * r1) / (1 - r1 * r1) ELSE 0.0 END"
        ).alias("phi22"),
    ).select(
        "n_days",
        "r1",
        "r2",
        "r3",
        "phi22",
        (F.col("r1") * (1 - F.col("phi22"))).alias("phi21"),
    ).select(
        "n_days",
        F.expr("CAST(round(1000 * r1) AS BIGINT)").alias("pacf1_milli"),
        F.expr("CAST(round(1000 * phi22) AS BIGINT)").alias("pacf2_milli"),
        F.expr(
            "CAST(CASE WHEN 1 - phi21 * r1 - phi22 * r2 <> 0"
            " THEN round(1000 * (r3 - phi21 * r2 - phi22 * r1)"
            "      / (1 - phi21 * r1 - phi22 * r2))"
            " ELSE 0 END AS BIGINT)"
        ).alias("pacf3_milli"),
    )


def pacf_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s1
            FROM daily
        ),
        x AS (
            SELECT day, n, CAST(n * c - s1 AS BIGINT) AS x
            FROM daily CROSS JOIN tot
        ),
        lagged AS (
            SELECT n, CAST(x AS HUGEINT) AS x,
                   CAST(LAG(x, 1) OVER (ORDER BY day) AS HUGEINT) AS x1,
                   CAST(LAG(x, 2) OVER (ORDER BY day) AS HUGEINT) AS x2,
                   CAST(LAG(x, 3) OVER (ORDER BY day) AS HUGEINT) AS x3
            FROM x
        ),
        mom AS (
            SELECT n, SUM(x * x) AS s0, SUM(x * x1) AS sl1,
                   SUM(x * x2) AS sl2, SUM(x * x3) AS sl3
            FROM lagged GROUP BY n
        ),
        r AS (
            SELECT n AS n_days,
                   CASE WHEN s0 > 0 THEN CAST(sl1 AS DOUBLE)
                        / CAST(s0 AS DOUBLE) ELSE 0.0 END AS r1,
                   CASE WHEN s0 > 0 THEN CAST(sl2 AS DOUBLE)
                        / CAST(s0 AS DOUBLE) ELSE 0.0 END AS r2,
                   CASE WHEN s0 > 0 THEN CAST(sl3 AS DOUBLE)
                        / CAST(s0 AS DOUBLE) ELSE 0.0 END AS r3
            FROM mom
        ),
        p2 AS (
            SELECT n_days, r1, r2, r3,
                   CASE WHEN 1 - r1 * r1 <> 0
                        THEN (r2 - r1 * r1) / (1 - r1 * r1)
                        ELSE 0.0 END AS phi22
            FROM r
        ),
        p3 AS (
            SELECT n_days, r1, r2, r3, phi22,
                   r1 * (1 - phi22) AS phi21
            FROM p2
        )
        SELECT n_days,
               CAST(round(1000 * r1) AS BIGINT) AS pacf1_milli,
               CAST(round(1000 * phi22) AS BIGINT) AS pacf2_milli,
               CAST(CASE WHEN 1 - phi21 * r1 - phi22 * r2 <> 0
                    THEN round(1000 * (r3 - phi21 * r2 - phi22 * r1)
                         / (1 - phi21 * r1 - phi22 * r2))
                    ELSE 0 END AS BIGINT) AS pacf3_milli
        FROM p3
    """


# --- Breusch-Pagan heteroscedasticity (Koenker form) ------------------------------------


def breusch_pagan_daily(events: DataFrame) -> DataFrame:
    """Koenker-Breusch-Pagan heteroscedasticity test on the daily
    value-sum OLS residuals: one row (n_days, bp_milli).

    durbin_watson checks the residuals' serial CORRELATION; this checks
    their VARIANCE stability — regress squared residuals on the day
    index, and BP = n * R^2 of that auxiliary fit. BP above ~3.84
    (chi2_1, 5%) says variance trends with time and the trend fit's
    standard errors are unreliable.

    Exactness: residuals quantize to whole dollars (squares then stay
    within DECIMAL(38,0) power sums), the auxiliary R^2 assembles from
    exact integer moments, and both engines share one scripted double
    chain.

    Scale shape: one (day) aggregate, one 1-row OLS scalar broadcast,
    one 1-row auxiliary moment reduction — no data-sized window."""
    d38 = "decimal(38,0)"
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(cents).cast("long").alias("y")
    )
    t = daily.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    m = t.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.col("t").cast(d38)).alias("st"),
        F.sum((F.col("t") * F.col("t")).cast(d38)).alias("stt"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("t").cast(d38) * F.col("y").cast(d38)).alias("sty"),
    ).select(
        F.col("n").cast("long").alias("n_days"),
        F.expr("CAST(n * stt - st * st AS DOUBLE)").alias("ctt"),
        F.expr("CAST(n * sty - st * sy AS DOUBLE)").alias("cty"),
        F.expr("CAST(st AS DOUBLE) / CAST(n AS DOUBLE)").alias("tbar"),
        F.expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").alias("ybar"),
    )
    u = t.crossJoin(F.broadcast(m)).select(
        "t",
        "n_days",
        F.expr(
            "CAST(round((y - (ybar + CASE WHEN ctt > 0"
            " THEN cty / ctt ELSE 0.0 END * (t - tbar))) / 100.0)"
            " AS BIGINT)"
        ).alias("e"),
    ).select(
        "t",
        "n_days",
        (F.col("e").cast(d38) * F.col("e").cast(d38)).alias("u"),
    )
    aux = u.groupBy("n_days").agg(
        F.sum(F.col("t").cast(d38)).alias("st"),
        F.sum((F.col("t") * F.col("t")).cast(d38)).alias("stt"),
        F.sum("u").alias("su"),
        F.sum(F.col("t").cast(d38) * F.col("u")).alias("stu"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
    )
    return aux.select(
        "n_days",
        F.expr(
            "CAST(CASE WHEN (n_days * stt - st * st) > 0"
            " AND (n_days * suu - su * su) > 0"
            " THEN round(1000.0 * n_days"
            "  * pow(CAST(n_days * stu - st * su AS DOUBLE), 2)"
            "  / (CAST(n_days * stt - st * st AS DOUBLE)"
            "     * CAST(n_days * suu - su * su AS DOUBLE)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("bp_milli"),
    )


def breusch_pagan_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        t AS (
            SELECT y,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        m AS (
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(n * stt - st * st AS DOUBLE) AS ctt,
                   CAST(n * sty - st * sy AS DOUBLE) AS cty,
                   CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS tbar,
                   CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
            FROM (
                SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                       SUM(CAST(t AS HUGEINT)) AS st,
                       SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)) AS stt,
                       SUM(CAST(y AS HUGEINT)) AS sy,
                       SUM(CAST(t AS HUGEINT) * CAST(y AS HUGEINT)) AS sty
                FROM t
            )
        ),
        u AS (
            SELECT t, n_days,
                   CAST(e AS HUGEINT) * CAST(e AS HUGEINT) AS u
            FROM (
                SELECT t, n_days,
                       CAST(round((y - (ybar + CASE WHEN ctt > 0
                            THEN cty / ctt ELSE 0.0 END * (t - tbar)))
                            / 100.0) AS BIGINT) AS e
                FROM t CROSS JOIN m
            )
        ),
        aux AS (
            SELECT n_days,
                   SUM(CAST(t AS HUGEINT)) AS st,
                   SUM(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)) AS stt,
                   SUM(u) AS su,
                   SUM(CAST(t AS HUGEINT) * u) AS stu,
                   SUM(u * u) AS suu
            FROM u GROUP BY n_days
        )
        SELECT n_days,
               CAST(CASE WHEN (n_days * stt - st * st) > 0
                    AND (n_days * suu - su * su) > 0
                    THEN round(1000.0 * n_days
                     * pow(CAST(n_days * stu - st * su AS DOUBLE), 2)
                     / (CAST(n_days * stt - st * st AS DOUBLE)
                        * CAST(n_days * suu - su * su AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS bp_milli
        FROM aux
    """


# --- Paired sign test --------------------------------------------------------------------


def sign_test_daily(events: DataFrame) -> DataFrame:
    """Paired sign test of daily click vs error counts: one row
    (m_days, s_plus, z_milli).

    wilcoxon_signed_rank weights each day by the SIZE of its difference;
    the sign test is the assumption-free floor — only the direction
    counts, so it survives any monotone transform of the counts. Zero
    days drop; S+ counts click-heavy days; z applies the continuity
    correction z = (d - sign(d)) / sqrt(m) for d = 2*S+ - m.

    Exactness: all-integer until the final sqrt.

    Scale shape: one (day) conditional aggregate, one 1-row reduction."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == WILCOXON_X_TYPE).cast("long"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == WILCOXON_Y_TYPE).cast("long"))
        .cast("long")
        .alias("y"),
    )
    agg = daily.where(F.col("x") != F.col("y")).agg(
        F.count("*").cast("long").alias("m_days"),
        F.sum((F.col("x") > F.col("y")).cast("long"))
        .cast("long")
        .alias("s_plus"),
    )
    return agg.select(
        F.coalesce("m_days", F.lit(0)).alias("m_days"),
        F.coalesce("s_plus", F.lit(0)).alias("s_plus"),
        F.expr(
            "CAST(CASE WHEN m_days > 0 AND 2 * s_plus - m_days <> 0"
            " THEN round(1000.0 * (2 * s_plus - m_days"
            "      - CAST(SIGN(2 * s_plus - m_days) AS BIGINT))"
            "      / sqrt(CAST(m_days AS DOUBLE)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def sign_test_daily_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = '{WILCOXON_X_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = '{WILCOXON_Y_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m_days,
                   CAST(COALESCE(SUM(CASE WHEN x > y THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS s_plus
            FROM daily WHERE x <> y
        )
        SELECT m_days, s_plus,
               CAST(CASE WHEN m_days > 0 AND 2 * s_plus - m_days <> 0
                    THEN round(1000.0 * (2 * s_plus - m_days
                         - CAST(SIGN(2 * s_plus - m_days) AS BIGINT))
                         / sqrt(CAST(m_days AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM agg
    """


# --- Capture-recapture population estimate ------------------------------------------------


def capture_recapture(events: DataFrame, cutoff: str = MCNEMAR_CUTOFF) -> DataFrame:
    """Chapman capture-recapture estimate of the active population from
    the two month halves: one row (n1, n2, m_both, n_hat).

    DAU/WAU devices count who was SEEN; capture-recapture estimates who
    EXISTS — treat the first half-month as the marking sample and the
    second as the recapture, and the Chapman estimator
    N = (n1+1)(n2+1)/(m+1) - 1 sizes the population including users the
    window never observed (the ecology device, standard for "how many
    real users does this product have").

    Exactness: three exact BIGINT counts from one per-user boolean
    aggregate; one integer-fed division rounded once.

    Scale shape: one (user) aggregate, one 1-row reduction."""
    per_user = events.groupBy("user_id").agg(
        F.max((F.to_date("ts") < F.lit(cutoff)).cast("int")).alias("a"),
        F.max((F.to_date("ts") >= F.lit(cutoff)).cast("int")).alias("b"),
    )
    agg = per_user.agg(
        F.sum(F.col("a").cast("long")).cast("long").alias("n1"),
        F.sum(F.col("b").cast("long")).cast("long").alias("n2"),
        F.sum((F.col("a") * F.col("b")).cast("long"))
        .cast("long")
        .alias("m_both"),
    )
    return agg.select(
        "n1",
        "n2",
        "m_both",
        F.expr(
            "CAST(round(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m_both + 1)"
            " - 1) AS BIGINT)"
        ).alias("n_hat"),
    )


def capture_recapture_sql(cutoff: str = MCNEMAR_CUTOFF) -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN CAST(ts AS DATE) < DATE '{cutoff}'
                       THEN 1 ELSE 0 END) AS a,
                   MAX(CASE WHEN CAST(ts AS DATE) >= DATE '{cutoff}'
                       THEN 1 ELSE 0 END) AS b
            FROM events GROUP BY user_id
        ),
        agg AS (
            SELECT CAST(SUM(a) AS BIGINT) AS n1,
                   CAST(SUM(b) AS BIGINT) AS n2,
                   CAST(SUM(a * b) AS BIGINT) AS m_both
            FROM per_user
        )
        SELECT n1, n2, m_both,
               CAST(round(CAST((n1 + 1) AS DOUBLE) * (n2 + 1) / (m_both + 1)
                    - 1) AS BIGINT) AS n_hat
        FROM agg
    """


# --- Cluster-sampling design effect --------------------------------------------------------


def design_effect_users(events: DataFrame) -> DataFrame:
    """Survey-sampling design effect of clustering by user: one row
    (n_clusters, n_total, icc_milli, deff_milli).

    sampling_* devices pick rows; this prices what user-level clustering
    COSTS — the intraclass correlation of event values within users
    (one-way ANOVA estimator, ANOVA cluster size m0) gives
    DEFF = 1 + (N/k - 1) * ICC, the factor by which a user-clustered
    sample's variance exceeds a true row-level SRS (the number every
    user-sampled A/B readout silently divides its effective n by).

    Exactness: per-user sufficient statistics (n_i, sum c, sum c^2) are
    exact centi integers; each user's two double terms (s_i^2/n_i and
    the within-SS remainder) quantize to micro before the k-row integer
    sums (DECIMAL(38,0)), and Sum n_i^2 stays integer, so MSB/MSW/ICC
    form one deterministic double chain.

    Scale shape: one (user) aggregate, one 1-row reduction."""
    d38 = "decimal(38,0)"
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    per_user = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_i"),
        F.sum(cents).cast("long").alias("s_i"),
        F.sum(cents * cents).cast(d38).alias("ss_i"),
    )
    terms = per_user.select(
        "n_i",
        F.col("s_i").cast(d38).alias("s_i"),
        F.expr(
            "CAST(round(1e6 * CAST(s_i AS DOUBLE) * s_i / n_i) AS DECIMAL(38,0))"
        ).alias("b_micro"),
        F.expr(
            "CAST(round(1e6 * (CAST(ss_i AS DOUBLE)"
            " - CAST(s_i AS DOUBLE) * s_i / n_i)) AS DECIMAL(38,0))"
        ).alias("w_micro"),
        (F.col("n_i") * F.col("n_i")).cast(d38).alias("n2_i"),
    )
    agg = terms.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_i").cast("long").alias("n_total"),
        F.sum("s_i").alias("s_all"),
        F.sum("b_micro").alias("b_m"),
        F.sum("w_micro").alias("w_m"),
        F.sum("n2_i").alias("sn2"),
    )
    return agg.select(
        F.col("k").alias("n_clusters"),
        "n_total",
        F.expr(
            "CASE WHEN k > 1 AND n_total > k THEN"
            " ((CAST(b_m AS DOUBLE) / 1e6"
            "   - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE) / n_total)"
            "  / (k - 1))"
            " ELSE 0.0 END"
        ).alias("msb"),
        F.expr(
            "CASE WHEN n_total > k THEN"
            " (CAST(w_m AS DOUBLE) / 1e6) / (n_total - k) ELSE 0.0 END"
        ).alias("msw"),
        F.expr(
            "CASE WHEN k > 1 THEN"
            " (n_total - CAST(sn2 AS DOUBLE) / n_total) / (k - 1)"
            " ELSE 0.0 END"
        ).alias("m0"),
    ).select(
        "n_clusters",
        "n_total",
        F.expr(
            "CASE WHEN msb + (m0 - 1) * msw > 0"
            " THEN (msb - msw) / (msb + (m0 - 1) * msw) ELSE 0.0 END"
        ).alias("icc"),
    ).select(
        "n_clusters",
        "n_total",
        F.expr("CAST(round(1000 * icc) AS BIGINT)").alias("icc_milli"),
        F.expr(
            "CAST(round(1000 * (1.0 + (CAST(n_total AS DOUBLE) / n_clusters"
            " - 1.0) * icc)) AS BIGINT)"
        ).alias("deff_milli"),
    )


def design_effect_users_sql() -> str:
    return """
        WITH per_user AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_i,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS s_i,
                   SUM(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                       * CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
                       AS ss_i
            FROM events GROUP BY user_id
        ),
        terms AS (
            SELECT n_i, CAST(s_i AS HUGEINT) AS s_i,
                   CAST(round(1e6 * CAST(s_i AS DOUBLE) * s_i / n_i)
                        AS HUGEINT) AS b_micro,
                   CAST(round(1e6 * (CAST(ss_i AS DOUBLE)
                        - CAST(s_i AS DOUBLE) * s_i / n_i)) AS HUGEINT)
                       AS w_micro,
                   CAST(n_i AS HUGEINT) * CAST(n_i AS HUGEINT) AS n2_i
            FROM per_user
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_i) AS BIGINT) AS n_total,
                   SUM(s_i) AS s_all, SUM(b_micro) AS b_m,
                   SUM(w_micro) AS w_m, SUM(n2_i) AS sn2
            FROM terms
        ),
        ms AS (
            SELECT k AS n_clusters, n_total,
                   CASE WHEN k > 1 AND n_total > k THEN
                        ((CAST(b_m AS DOUBLE) / 1e6
                          - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                            / n_total) / (k - 1))
                        ELSE 0.0 END AS msb,
                   CASE WHEN n_total > k THEN
                        (CAST(w_m AS DOUBLE) / 1e6) / (n_total - k)
                        ELSE 0.0 END AS msw,
                   CASE WHEN k > 1 THEN
                        (n_total - CAST(sn2 AS DOUBLE) / n_total) / (k - 1)
                        ELSE 0.0 END AS m0
            FROM agg
        ),
        icc_t AS (
            SELECT n_clusters, n_total,
                   CASE WHEN msb + (m0 - 1) * msw > 0
                        THEN (msb - msw) / (msb + (m0 - 1) * msw)
                        ELSE 0.0 END AS icc
            FROM ms
        )
        SELECT n_clusters, n_total,
               CAST(round(1000 * icc) AS BIGINT) AS icc_milli,
               CAST(round(1000 * (1.0 + (CAST(n_total AS DOUBLE) / n_clusters
                    - 1.0) * icc)) AS BIGINT) AS deff_milli
        FROM icc_t
    """


# --- Tukey fences outlier census ----------------------------------------------------------


def tukey_fences_by_type(events: DataFrame) -> DataFrame:
    """Tukey boxplot fence census per event type: rows (event_type,
    q1_cents, q3_cents, n_low, n_high), ordered by type.

    mad_outliers bands around the median; the Tukey fences are the
    boxplot's quartile rule — flag values beyond [q1 - 1.5*IQR,
    q3 + 1.5*IQR] — the convention every visual outlier readout uses, so
    shipping it keeps the engine's censuses comparable with the chart.

    Exactness: quartiles are exact integer order statistics from the
    (type, cents) aggregate (min c with 4*cum >= tot and >= 3*tot); the
    fences stay integral by working in DOUBLED cents (2*lo = 2*q1 -
    3*IQR), so the outlier census is pure integer comparison.

    Scale shape: one (type, cents) aggregate, one type-partitioned
    cumulative window over the bounded value domain, a broadcast
    <=|types| fence dim back onto the rows, one keyed aggregate."""
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    vals = events.select("event_type", cents.alias("c"))
    per_vc = vals.groupBy("event_type", "c").agg(F.count("*").alias("m"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type")
    cum = per_vc.select(
        "event_type",
        "c",
        F.sum("m").over(wcum).alias("cum"),
        F.sum("m").over(wtot).alias("tot"),
    )
    q1 = (
        cum.where(4 * F.col("cum") >= F.col("tot"))
        .groupBy("event_type")
        .agg(F.min("c").alias("q1"))
    )
    q3 = (
        cum.where(4 * F.col("cum") >= 3 * F.col("tot"))
        .groupBy("event_type")
        .agg(F.min("c").alias("q3"))
    )
    fences = q1.join(q3, "event_type").select(
        "event_type",
        "q1",
        "q3",
        # doubled-cent fences: 2*lo = 5*q1 - 3*q3, 2*hi = 5*q3 - 3*q1
        (5 * F.col("q1") - 3 * F.col("q3")).alias("lo2"),
        (5 * F.col("q3") - 3 * F.col("q1")).alias("hi2"),
    )
    return (
        vals.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.sum((2 * F.col("c") < F.col("lo2")).cast("long"))
            .cast("long")
            .alias("n_low"),
            F.sum((2 * F.col("c") > F.col("hi2")).cast("long"))
            .cast("long")
            .alias("n_high"),
        )
        .select(
            "event_type",
            F.col("q1").alias("q1_cents"),
            F.col("q3").alias("q3_cents"),
            "n_low",
            "n_high",
        )
        .orderBy("event_type")
    )


def tukey_fences_by_type_sql() -> str:
    return """
        WITH vals AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        per_vc AS (
            SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS m
            FROM vals GROUP BY event_type, c
        ),
        cum AS (
            SELECT event_type, c,
                   SUM(m) OVER (PARTITION BY event_type ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                   SUM(m) OVER (PARTITION BY event_type) AS tot
            FROM per_vc
        ),
        q1 AS (
            SELECT event_type, MIN(c) AS q1 FROM cum
            WHERE 4 * cum >= tot GROUP BY event_type
        ),
        q3 AS (
            SELECT event_type, MIN(c) AS q3 FROM cum
            WHERE 4 * cum >= 3 * tot GROUP BY event_type
        ),
        fences AS (
            SELECT q1.event_type, q1, q3,
                   5 * q1 - 3 * q3 AS lo2, 5 * q3 - 3 * q1 AS hi2
            FROM q1 JOIN q3 USING (event_type)
        )
        SELECT vals.event_type, q1 AS q1_cents, q3 AS q3_cents,
               CAST(SUM(CASE WHEN 2 * c < lo2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_low,
               CAST(SUM(CASE WHEN 2 * c > hi2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_high
        FROM vals JOIN fences USING (event_type)
        GROUP BY vals.event_type, q1, q3
        ORDER BY event_type
    """


# --- 2x2 agreement / association devices ---------------------------------------------------

KAPPA_A_TYPE = "click"
KAPPA_B_TYPE = "view"
OR_EXPOSURE_TYPE = "click"
OR_OUTCOME_TYPE = "purchase"


def _user_day_flags(events: DataFrame, t1: str, t2: str) -> DataFrame:
    return events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.max((F.col("event_type") == t1).cast("int")).alias("a"),
        F.max((F.col("event_type") == t2).cast("int")).alias("b"),
    )


_USER_DAY_FLAGS_SQL = """
            SELECT user_id, CAST(ts AS DATE) AS day,
                   MAX(CASE WHEN event_type = '{t1}' THEN 1 ELSE 0 END) AS a,
                   MAX(CASE WHEN event_type = '{t2}' THEN 1 ELSE 0 END) AS b
            FROM events GROUP BY user_id, CAST(ts AS DATE)
"""

_CELLS_SQL = """
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(a * b) AS BIGINT) AS n11,
                   CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
                   CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
                   CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
            FROM flags
"""


def _cells(flags: DataFrame) -> DataFrame:
    return flags.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("a") * F.col("b")).cast("long")).cast("long").alias("n11"),
        F.sum((F.col("a") * (1 - F.col("b"))).cast("long"))
        .cast("long")
        .alias("n10"),
        F.sum(((1 - F.col("a")) * F.col("b")).cast("long"))
        .cast("long")
        .alias("n01"),
        F.sum(((1 - F.col("a")) * (1 - F.col("b"))).cast("long"))
        .cast("long")
        .alias("n00"),
    )


def cohens_kappa_daily(events: DataFrame) -> DataFrame:
    """Cohen's kappa between the click and view participation flags at
    (user, day) grain: one row (n_units, kappa_milli).

    Raw percent agreement rewards imbalance (two raters who always say
    "no" agree perfectly); kappa removes chance agreement
    (po - pe)/(1 - pe) — the standard label-quality device when two
    heuristic annotators (here: two engagement surfaces) tag the same
    units.

    Exactness: the 2x2 cells are exact BIGINT counts; po and pe form one
    deterministic double chain on the 1-row cell relation.

    Scale shape: one (user, day) aggregate, one 1-row reduction."""
    c = _cells(_user_day_flags(events, KAPPA_A_TYPE, KAPPA_B_TYPE))
    return c.select(
        F.col("n").alias("n_units"),
        F.expr(
            "CAST(CASE WHEN n > 0 AND"
            " 1.0 - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)"
            "        + (n01 + n00) * CAST(n10 + n00 AS DOUBLE)) / n / n <> 0"
            " THEN round(1000.0 *"
            " ((CAST(n11 + n00 AS DOUBLE) / n)"
            "  - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)"
            "     + (n01 + n00) * CAST(n10 + n00 AS DOUBLE)) / n / n)"
            " / (1.0 - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)"
            "           + (n01 + n00) * CAST(n10 + n00 AS DOUBLE)) / n / n))"
            " ELSE 0 END AS BIGINT)"
        ).alias("kappa_milli"),
    )


def cohens_kappa_daily_sql() -> str:
    flags = _USER_DAY_FLAGS_SQL.format(t1=KAPPA_A_TYPE, t2=KAPPA_B_TYPE)
    return f"""
        WITH flags AS (
{flags}
        ),
        c AS (
{_CELLS_SQL}
        )
        SELECT n AS n_units,
               CAST(CASE WHEN n > 0 AND
                    1.0 - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
                           + (n01 + n00) * CAST(n10 + n00 AS DOUBLE))
                          / n / n <> 0
                    THEN round(1000.0 *
                    ((CAST(n11 + n00 AS DOUBLE) / n)
                     - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
                        + (n01 + n00) * CAST(n10 + n00 AS DOUBLE)) / n / n)
                    / (1.0 - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
                              + (n01 + n00) * CAST(n10 + n00 AS DOUBLE))
                             / n / n))
                    ELSE 0 END AS BIGINT) AS kappa_milli
        FROM c
    """


def phi_coefficient_daily(events: DataFrame) -> DataFrame:
    """Phi coefficient of click/error co-occurrence at (user, day) grain:
    one row (n_units, phi_milli).

    chi_square tests hour-by-type independence on the whole grid; phi is
    the 2x2 special case read as a CORRELATION (the Pearson r of two
    binary columns): do error days coincide with click days once margins
    are accounted for? Signed, so negative phi means errors cluster on
    the quiet days.

    Exactness: four exact BIGINT cells; one double chain ending in the
    sqrt of the margin product.

    Scale shape: one (user, day) aggregate, one 1-row reduction."""
    c = _cells(_user_day_flags(events, OR_EXPOSURE_TYPE, "error"))
    return c.select(
        F.col("n").alias("n_units"),
        F.expr(
            "CAST(CASE WHEN (n11 + n10) > 0 AND (n01 + n00) > 0"
            " AND (n11 + n01) > 0 AND (n10 + n00) > 0"
            " THEN round(1000.0"
            " * (CAST(n11 AS DOUBLE) * n00 - CAST(n10 AS DOUBLE) * n01)"
            " / sqrt(CAST(n11 + n10 AS DOUBLE) * (n01 + n00)"
            "        * (n11 + n01) * (n10 + n00)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("phi_milli"),
    )


def phi_coefficient_daily_sql() -> str:
    flags = _USER_DAY_FLAGS_SQL.format(t1=OR_EXPOSURE_TYPE, t2="error")
    return f"""
        WITH flags AS (
{flags}
        ),
        c AS (
{_CELLS_SQL}
        )
        SELECT n AS n_units,
               CAST(CASE WHEN (n11 + n10) > 0 AND (n01 + n00) > 0
                    AND (n11 + n01) > 0 AND (n10 + n00) > 0
                    THEN round(1000.0
                    * (CAST(n11 AS DOUBLE) * n00 - CAST(n10 AS DOUBLE) * n01)
                    / sqrt(CAST(n11 + n10 AS DOUBLE) * (n01 + n00)
                           * (n11 + n01) * (n10 + n00)))
                    ELSE 0 END AS BIGINT) AS phi_milli
        FROM c
    """


def odds_ratio_ci_daily(events: DataFrame) -> DataFrame:
    """Haldane-corrected odds ratio of purchase given click at (user,
    day) grain, with the Woolf 95% CI: one row (n_units, or_milli,
    ci_lo_milli, ci_hi_milli).

    mantel_haenszel pools stratified ORs; this is the headline crude OR
    with its log-normal interval — the +0.5 Haldane-Anscombe correction
    keeps every cell positive so the estimate and CI exist even when a
    cell is empty (the small-segment case that breaks the naive ad/bc).

    Exactness: four exact BIGINT cells; the corrected OR and the Woolf
    interval are one deterministic double chain (ln/exp/sqrt at the
    1-row boundary only).

    Scale shape: one (user, day) aggregate, one 1-row reduction."""
    c = _cells(_user_day_flags(events, OR_EXPOSURE_TYPE, OR_OUTCOME_TYPE))
    return c.select(
        F.col("n").alias("n_units"),
        F.expr(
            "CAST(round(1000.0 * (n11 + 0.5) * (n00 + 0.5)"
            " / ((n10 + 0.5) * (n01 + 0.5))) AS BIGINT)"
        ).alias("or_milli"),
        F.expr(
            "CAST(round(1000.0 * exp(ln((n11 + 0.5) * (n00 + 0.5)"
            " / ((n10 + 0.5) * (n01 + 0.5)))"
            " - 1.96 * sqrt(1.0 / (n11 + 0.5) + 1.0 / (n10 + 0.5)"
            " + 1.0 / (n01 + 0.5) + 1.0 / (n00 + 0.5)))) AS BIGINT)"
        ).alias("ci_lo_milli"),
        F.expr(
            "CAST(round(1000.0 * exp(ln((n11 + 0.5) * (n00 + 0.5)"
            " / ((n10 + 0.5) * (n01 + 0.5)))"
            " + 1.96 * sqrt(1.0 / (n11 + 0.5) + 1.0 / (n10 + 0.5)"
            " + 1.0 / (n01 + 0.5) + 1.0 / (n00 + 0.5)))) AS BIGINT)"
        ).alias("ci_hi_milli"),
    )


def odds_ratio_ci_daily_sql() -> str:
    flags = _USER_DAY_FLAGS_SQL.format(
        t1=OR_EXPOSURE_TYPE, t2=OR_OUTCOME_TYPE
    )
    return f"""
        WITH flags AS (
{flags}
        ),
        c AS (
{_CELLS_SQL}
        )
        SELECT n AS n_units,
               CAST(round(1000.0 * (n11 + 0.5) * (n00 + 0.5)
                    / ((n10 + 0.5) * (n01 + 0.5))) AS BIGINT) AS or_milli,
               CAST(round(1000.0 * exp(ln((n11 + 0.5) * (n00 + 0.5)
                    / ((n10 + 0.5) * (n01 + 0.5)))
                    - 1.96 * sqrt(1.0 / (n11 + 0.5) + 1.0 / (n10 + 0.5)
                    + 1.0 / (n01 + 0.5) + 1.0 / (n00 + 0.5))))
                    AS BIGINT) AS ci_lo_milli,
               CAST(round(1000.0 * exp(ln((n11 + 0.5) * (n00 + 0.5)
                    / ((n10 + 0.5) * (n01 + 0.5)))
                    + 1.96 * sqrt(1.0 / (n11 + 0.5) + 1.0 / (n10 + 0.5)
                    + 1.0 / (n01 + 0.5) + 1.0 / (n00 + 0.5))))
                    AS BIGINT) AS ci_hi_milli
        FROM c
    """


# --- Transfer entropy (binary, lag 1) -------------------------------------------------------


def transfer_entropy_daily(events: DataFrame) -> DataFrame:
    """Lag-1 binary transfer entropy between the daily click and error
    count series, both directions: one row (n_obs, te_xy_micro,
    te_yx_micro) with X = click, Y = error.

    granger_lite asks the LINEAR question (does lagged X improve an OLS
    fit of Y); transfer entropy asks it information-theoretically on the
    up/down symbolization — TE(X->Y) = sum p(y_t, y_{t-1}, x_{t-1}) *
    ln[p(y_t|y_{t-1},x_{t-1}) / p(y_t|y_{t-1})] — so nonlinear couplings
    that Granger's F misses still register, and the X->Y / Y->X asymmetry
    reads as direction.

    Exactness: the joint (x_t, x_lag, y_t, y_lag) distribution is a <=16
    -cell exact BIGINT count grid; every margin is a window sum over that
    grid; each cell's ln term quantizes to micro before the <=16-row sum.

    Scale shape: one (day) conditional aggregate, two lag windows over
    the bounded day grid, one <=16-cell aggregate with margin windows."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == WILCOXON_X_TYPE).cast("long"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == WILCOXON_Y_TYPE).cast("long"))
        .cast("long")
        .alias("y"),
    )
    w = Window.orderBy("day")
    sym = daily.select(
        "day",
        (F.col("x") > F.lag("x").over(w)).cast("int").alias("xt"),
        (F.col("y") > F.lag("y").over(w)).cast("int").alias("yt"),
        F.lag((F.col("x") > F.lag("x").over(w)).cast("int")).over(w).alias(
            "xl"
        ),
        F.lag((F.col("y") > F.lag("y").over(w)).cast("int")).over(w).alias(
            "yl"
        ),
    ).where(F.col("xl").isNotNull())
    cells = sym.groupBy("xt", "xl", "yt", "yl").agg(
        F.count("*").cast("long").alias("m")
    )
    wn = Window.partitionBy(F.lit(1))

    def margin(*cols):
        return F.sum("m").over(Window.partitionBy(*cols)).cast("long")

    terms = cells.select(
        "m",
        F.sum("m").over(wn).cast("long").alias("n"),
        # TE(X->Y): a=yt, b=yl, c=xl
        margin("yt", "yl", "xl").alias("xy_abc"),
        margin("yl", "xl").alias("xy_bc"),
        margin("yt", "yl").alias("xy_ab"),
        margin("yl").alias("xy_b"),
        # TE(Y->X): a=xt, b=xl, c=yl
        margin("xt", "xl", "yl").alias("yx_abc"),
        margin("xl", "yl").alias("yx_bc"),
        margin("xt", "xl").alias("yx_ab"),
        margin("xl").alias("yx_b"),
    )
    agg = terms.groupBy("n").agg(
        F.sum(
            F.expr(
                "CAST(round(1e6 * m * ln(CAST(xy_abc AS DOUBLE) * xy_b"
                " / (CAST(xy_bc AS DOUBLE) * xy_ab))) AS BIGINT)"
            )
        ).cast("long").alias("te_xy_n_micro"),
        F.sum(
            F.expr(
                "CAST(round(1e6 * m * ln(CAST(yx_abc AS DOUBLE) * yx_b"
                " / (CAST(yx_bc AS DOUBLE) * yx_ab))) AS BIGINT)"
            )
        ).cast("long").alias("te_yx_n_micro"),
    )
    return agg.select(
        F.col("n").alias("n_obs"),
        F.expr(
            "CAST(round(CAST(te_xy_n_micro AS DOUBLE) / n) AS BIGINT)"
        ).alias("te_xy_micro"),
        F.expr(
            "CAST(round(CAST(te_yx_n_micro AS DOUBLE) / n) AS BIGINT)"
        ).alias("te_yx_micro"),
    )


def transfer_entropy_daily_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = '{WILCOXON_X_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = '{WILCOXON_Y_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        ud AS (
            SELECT day,
                   CASE WHEN x > LAG(x) OVER w THEN 1 ELSE 0 END AS xt,
                   CASE WHEN y > LAG(y) OVER w THEN 1 ELSE 0 END AS yt,
                   LAG(x) OVER w AS px
            FROM daily
            WINDOW w AS (ORDER BY day)
        ),
        sym AS (
            SELECT xt, yt,
                   LAG(xt) OVER w AS xl, LAG(yt) OVER w AS yl
            FROM ud
            WHERE px IS NOT NULL
            WINDOW w AS (ORDER BY day)
        ),
        cells AS (
            SELECT xt, xl, yt, yl, CAST(COUNT(*) AS BIGINT) AS m
            FROM sym WHERE xl IS NOT NULL
            GROUP BY xt, xl, yt, yl
        ),
        terms AS (
            SELECT m,
                   CAST(SUM(m) OVER () AS BIGINT) AS n,
                   CAST(SUM(m) OVER (PARTITION BY yt, yl, xl) AS BIGINT)
                       AS xy_abc,
                   CAST(SUM(m) OVER (PARTITION BY yl, xl) AS BIGINT) AS xy_bc,
                   CAST(SUM(m) OVER (PARTITION BY yt, yl) AS BIGINT) AS xy_ab,
                   CAST(SUM(m) OVER (PARTITION BY yl) AS BIGINT) AS xy_b,
                   CAST(SUM(m) OVER (PARTITION BY xt, xl, yl) AS BIGINT)
                       AS yx_abc,
                   CAST(SUM(m) OVER (PARTITION BY xl, yl) AS BIGINT) AS yx_bc,
                   CAST(SUM(m) OVER (PARTITION BY xt, xl) AS BIGINT) AS yx_ab,
                   CAST(SUM(m) OVER (PARTITION BY xl) AS BIGINT) AS yx_b
            FROM cells
        )
        SELECT n AS n_obs,
               CAST(round(CAST(SUM(CAST(round(1e6 * m
                    * ln(CAST(xy_abc AS DOUBLE) * xy_b
                         / (CAST(xy_bc AS DOUBLE) * xy_ab))) AS BIGINT))
                    AS DOUBLE) / n) AS BIGINT) AS te_xy_micro,
               CAST(round(CAST(SUM(CAST(round(1e6 * m
                    * ln(CAST(yx_abc AS DOUBLE) * yx_b
                         / (CAST(yx_bc AS DOUBLE) * yx_ab))) AS BIGINT))
                    AS DOUBLE) / n) AS BIGINT) AS te_yx_micro
        FROM terms
        GROUP BY n
    """


# --- Bowker symmetry test ------------------------------------------------------------------


def bowker_symmetry_test(events: DataFrame) -> DataFrame:
    """Bowker test of event-type transition symmetry: one row
    (n_transitions, df, bowker_milli).

    mcnemar_test is the 2x2 paired-flip test; Bowker is its kxk
    generalization on the user-sequence TRANSITION matrix — is A->B as
    common as B->A for every unordered type pair? Rejection means the
    funnel has a preferred direction (which events_markov_* then model);
    df counts the informative pairs.

    Exactness: transition counts are exact BIGINTs from one lag pass;
    each pair's (n_ij - n_ji)^2 / (n_ij + n_ji) term quantizes to micro
    before the <=k(k-1)/2-row sum.

    Scale shape: one user-partitioned lag window (data-sized but
    user-keyed), one (from, to) aggregate, a bounded <=k^2 self-join on
    that grid, one 1-row reduction."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select(
            "user_id",
            F.col("event_type").alias("t_to"),
            F.lag("event_type").over(w).alias("t_from"),
        )
        .where(F.col("t_from").isNotNull())
        .groupBy("t_from", "t_to")
        .agg(F.count("*").cast("long").alias("m"))
    )
    a, b = trans.alias("a"), trans.alias("b")
    pairs = a.join(
        b,
        (F.col("a.t_from") == F.col("b.t_to"))
        & (F.col("a.t_to") == F.col("b.t_from"))
        & (F.col("a.t_from") < F.col("a.t_to")),
        "left",
    ).where(F.col("a.t_from") < F.col("a.t_to")).select(
        F.col("a.m").alias("nij"),
        F.coalesce(F.col("b.m"), F.lit(0)).alias("nji"),
    )
    # pairs where only the j>i direction exists are missed by iterating a
    # on i<j cells only when the i<j cell is absent; union the orphans
    orphans = b.join(
        a,
        (F.col("b.t_from") == F.col("a.t_to"))
        & (F.col("b.t_to") == F.col("a.t_from")),
        "left_anti",
    ).where(F.col("b.t_from") > F.col("b.t_to")).select(
        F.lit(0).cast("long").alias("nij"),
        F.col("b.m").alias("nji"),
    )
    allp = pairs.unionByName(orphans)
    total = trans.agg(
        F.coalesce(F.sum("m").cast("long"), F.lit(0).cast("long")).alias(
            "n_transitions"
        )
    )
    agg = allp.agg(
        F.count("*").cast("long").alias("df"),
        F.sum(
            F.expr(
                "CAST(round(1e6 * CAST((nij - nji) AS DOUBLE) * (nij - nji)"
                " / (nij + nji)) AS BIGINT)"
            )
        ).cast("long").alias("b_micro"),
    )
    return total.crossJoin(F.broadcast(agg)).select(
        "n_transitions",
        F.coalesce("df", F.lit(0)).alias("df"),
        F.expr(
            "CAST(round(COALESCE(b_micro, 0) / 1000.0) AS BIGINT)"
        ).alias("bowker_milli"),
    )


def bowker_symmetry_test_sql() -> str:
    return """
        WITH trans AS (
            SELECT t_from, t_to, CAST(COUNT(*) AS BIGINT) AS m
            FROM (
                SELECT event_type AS t_to,
                       LAG(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS t_from
                FROM events
            )
            WHERE t_from IS NOT NULL
            GROUP BY t_from, t_to
        ),
        pairs AS (
            SELECT a.m AS nij, COALESCE(b.m, 0) AS nji
            FROM trans a LEFT JOIN trans b
              ON a.t_from = b.t_to AND a.t_to = b.t_from
            WHERE a.t_from < a.t_to
        ),
        orphans AS (
            SELECT CAST(0 AS BIGINT) AS nij, b.m AS nji
            FROM trans b
            WHERE b.t_from > b.t_to
              AND NOT EXISTS (
                SELECT 1 FROM trans a
                WHERE a.t_from = b.t_to AND a.t_to = b.t_from
              )
        ),
        allp AS (
            SELECT * FROM pairs UNION ALL SELECT * FROM orphans
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(COALESCE(SUM(CAST(round(1e6
                        * CAST((nij - nji) AS DOUBLE) * (nij - nji)
                        / (nij + nji)) AS BIGINT)), 0) AS BIGINT) AS b_micro
            FROM allp
        ),
        total AS (
            SELECT CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_transitions
            FROM trans
        )
        SELECT n_transitions, df,
               CAST(round(b_micro / 1000.0) AS BIGINT) AS bowker_milli
        FROM total CROSS JOIN agg
    """


# --- c-chart on daily error counts ----------------------------------------------------------

C_CHART_TYPE = "error"


def c_chart_daily(events: DataFrame) -> DataFrame:
    """Shewhart c-chart on daily error counts: one row (n_days,
    cbar_milli, ucl_milli, n_above, n_below).

    returns_p_chart monitors a PROPORTION with per-month denominators;
    the c-chart is its Poisson sibling for raw defect COUNTS on a
    constant-exposure window — limits at cbar +- 3*sqrt(cbar), the SPC
    rule every incident dashboard reimplements.

    Exactness: the center line is the exact rational S/n; each day's
    out-of-limit flag compares the integer count against one
    deterministic double limit; counts of breaches are exact.

    Scale shape: one (day) conditional aggregate, one 1-row scalar
    broadcast back onto the bounded day grid, one 1-row reduction."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == C_CHART_TYPE).cast("long"))
        .cast("long")
        .alias("c")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    flagged = daily.crossJoin(F.broadcast(tot)).select(
        "n",
        "s",
        (
            F.col("c")
            > F.expr("CAST(s AS DOUBLE) / n + 3 * sqrt(CAST(s AS DOUBLE) / n)")
        ).cast("long").alias("above"),
        (
            F.col("c")
            < F.expr("CAST(s AS DOUBLE) / n - 3 * sqrt(CAST(s AS DOUBLE) / n)")
        ).cast("long").alias("below"),
    )
    return flagged.groupBy("n", "s").agg(
        F.sum("above").cast("long").alias("n_above"),
        F.sum("below").cast("long").alias("n_below"),
    ).select(
        F.col("n").alias("n_days"),
        F.expr("CAST(round(1000.0 * s / n) AS BIGINT)").alias("cbar_milli"),
        F.expr(
            "CAST(round(1000.0 * (CAST(s AS DOUBLE) / n"
            " + 3 * sqrt(CAST(s AS DOUBLE) / n))) AS BIGINT)"
        ).alias("ucl_milli"),
        "n_above",
        "n_below",
    )


def c_chart_daily_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = '{C_CHART_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
            FROM daily
        ),
        flagged AS (
            SELECT n, s,
                   CASE WHEN c > CAST(s AS DOUBLE) / n
                        + 3 * sqrt(CAST(s AS DOUBLE) / n)
                        THEN 1 ELSE 0 END AS above,
                   CASE WHEN c < CAST(s AS DOUBLE) / n
                        - 3 * sqrt(CAST(s AS DOUBLE) / n)
                        THEN 1 ELSE 0 END AS below
            FROM daily CROSS JOIN tot
        )
        SELECT n AS n_days,
               CAST(round(1000.0 * s / n) AS BIGINT) AS cbar_milli,
               CAST(round(1000.0 * (CAST(s AS DOUBLE) / n
                    + 3 * sqrt(CAST(s AS DOUBLE) / n))) AS BIGINT)
                   AS ucl_milli,
               CAST(SUM(above) AS BIGINT) AS n_above,
               CAST(SUM(below) AS BIGINT) AS n_below
        FROM flagged
        GROUP BY n, s
    """


# --- Turning-point randomness test ----------------------------------------------------------


def turning_points_daily(events: DataFrame) -> DataFrame:
    """Turning-point test for randomness of the daily count series: one
    row (n_days, n_turns, z_milli).

    runs_test checks sign runs around the median; the turning-point test
    checks local WIGGLES — a strict local max or min at t has expected
    rate 2/3 under i.i.d., so too few turns means trend/smoothness and
    too many means oscillation. Strict inequalities only: plateau points
    are not turns (stated).

    Exactness: the turn flag is an integer comparison of three exact
    counts; E[T] = 2(n-2)/3 and Var = (16n-29)/90 feed one final double
    chain.

    Scale shape: one (day) aggregate, two lag/lead windows over the
    bounded day grid, one 1-row reduction."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.orderBy("day")
    t = daily.select(
        "c",
        F.lag("c").over(w).alias("p"),
        F.lead("c").over(w).alias("f"),
    ).where(F.col("p").isNotNull() & F.col("f").isNotNull())
    agg = t.agg(
        F.count("*").cast("long").alias("inner_n"),
        F.sum(
            (
                ((F.col("p") < F.col("c")) & (F.col("c") > F.col("f")))
                | ((F.col("p") > F.col("c")) & (F.col("c") < F.col("f")))
            ).cast("long")
        ).cast("long").alias("n_turns"),
    )
    return agg.select(
        (F.col("inner_n") + 2).alias("n_days"),
        F.coalesce("n_turns", F.lit(0)).alias("n_turns"),
        F.expr(
            "CAST(CASE WHEN inner_n > 0 AND 16.0 * (inner_n + 2) - 29 > 0"
            " THEN round(1000.0 * (n_turns - 2.0 * inner_n / 3.0)"
            " / sqrt((16.0 * (inner_n + 2) - 29) / 90.0))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def turning_points_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        t AS (
            SELECT c, LAG(c) OVER (ORDER BY day) AS p,
                   LEAD(c) OVER (ORDER BY day) AS f
            FROM daily
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS inner_n,
                   CAST(COALESCE(SUM(CASE WHEN (p < c AND c > f)
                        OR (p > c AND c < f) THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_turns
            FROM t WHERE p IS NOT NULL AND f IS NOT NULL
        )
        SELECT CAST(inner_n + 2 AS BIGINT) AS n_days, n_turns,
               CAST(CASE WHEN inner_n > 0 AND 16.0 * (inner_n + 2) - 29 > 0
                    THEN round(1000.0 * (n_turns - 2.0 * inner_n / 3.0)
                    / sqrt((16.0 * (inner_n + 2) - 29) / 90.0))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM agg
    """


# --- Mood's median test ------------------------------------------------------------------


def mood_median_test(events: DataFrame) -> DataFrame:
    """Mood's median test across event types: one row (k_groups, n_total,
    chi2_milli).

    kruskal_wallis compares full rank distributions; Mood's test is the
    blunt-but-robust location check — dichotomize every value at the
    GRAND median and chi-square the above/at-or-below table by type. It
    survives heavy ties and contamination that distort rank sums.

    Exactness: the grand median is the exact lower weighted median over
    the bounded (cents) value-domain grid; cell counts are exact
    BIGINTs; each cell's (o - e)^2 / e term quantizes to micro before
    the <=2k-row sum.

    Scale shape: one (cents) aggregate + global cum window on that
    bounded domain grid, one broadcast scalar back, one (type) aggregate,
    one <=k-row reduction."""
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    vals = events.select("event_type", cents.alias("c"))
    per_c = vals.groupBy("c").agg(F.count("*").alias("m"))
    wcum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    med = (
        per_c.select(
            "c",
            F.sum("m").over(wcum).alias("cum"),
            F.sum("m").over(Window.partitionBy(F.lit(1))).alias("tot"),
        )
        .where(2 * F.col("cum") >= F.col("tot"))
        .agg(F.min("c").alias("gmed"))
    )
    g = (
        vals.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum((F.col("c") > F.col("gmed")).cast("long"))
            .cast("long")
            .alias("a_g"),
        )
    )
    tot = g.agg(
        F.count("*").cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum("a_g").cast("long").alias("a_total"),
    )
    terms = g.crossJoin(F.broadcast(tot)).select(
        "k_groups",
        "n_total",
        F.expr(
            "CAST(round(1e6 * ("
            " pow(a_g - CAST(n_g AS DOUBLE) * a_total / n_total, 2)"
            "   / (CAST(n_g AS DOUBLE) * a_total / n_total)"
            " + pow((n_g - a_g) - CAST(n_g AS DOUBLE) * (n_total - a_total)"
            "       / n_total, 2)"
            "   / (CAST(n_g AS DOUBLE) * (n_total - a_total) / n_total)))"
            " AS BIGINT)"
        ).alias("term_micro"),
        F.col("a_total"),
    )
    return (
        terms.where((F.col("a_total") > 0) & (F.col("a_total") < F.col("n_total")))
        .groupBy("k_groups", "n_total")
        .agg(F.sum("term_micro").cast("long").alias("chi2_micro"))
        .select(
            "k_groups",
            "n_total",
            F.expr("CAST(round(chi2_micro / 1000.0) AS BIGINT)").alias(
                "chi2_milli"
            ),
        )
    )


def mood_median_test_sql() -> str:
    return """
        WITH vals AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        per_c AS (
            SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM vals GROUP BY c
        ),
        med AS (
            SELECT MIN(c) AS gmed FROM (
                SELECT c,
                       SUM(m) OVER (ORDER BY c
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS cum,
                       SUM(m) OVER () AS tot
                FROM per_c
            ) WHERE 2 * cum >= tot
        ),
        g AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(CASE WHEN c > gmed THEN 1 ELSE 0 END) AS BIGINT)
                       AS a_g
            FROM vals CROSS JOIN med
            GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
                   CAST(SUM(n_g) AS BIGINT) AS n_total,
                   CAST(SUM(a_g) AS BIGINT) AS a_total
            FROM g
        ),
        terms AS (
            SELECT k_groups, n_total, a_total,
                   CAST(round(1e6 * (
                        pow(a_g - CAST(n_g AS DOUBLE) * a_total / n_total, 2)
                          / (CAST(n_g AS DOUBLE) * a_total / n_total)
                        + pow((n_g - a_g) - CAST(n_g AS DOUBLE)
                              * (n_total - a_total) / n_total, 2)
                          / (CAST(n_g AS DOUBLE) * (n_total - a_total)
                             / n_total))) AS BIGINT) AS term_micro
            FROM g CROSS JOIN tot
        )
        SELECT k_groups, n_total,
               CAST(round(SUM(term_micro) / 1000.0) AS BIGINT) AS chi2_milli
        FROM terms
        WHERE a_total > 0 AND a_total < n_total
        GROUP BY k_groups, n_total
    """


# --- Binned KS uniformity test --------------------------------------------------------------

KS_BINS = 86400  # second-of-day bins


def ks_uniformity_seconds(events: DataFrame) -> DataFrame:
    """Binned one-sample Kolmogorov-Smirnov test of event second-of-day
    against the uniform law: one row (n_events, d_micro, worst_second).

    ks_drift compares two empirical windows; this asks the ABSOLUTE
    question — is intraday arrival time uniform, or does load pool at
    specific seconds (cron spikes, batch jobs)? The statistic is the sup
    over the FULL 86400-bin grid of |ECDF - (b+1)/B|, the binned KS
    (stated: bins, not the continuous-time statistic). Empty bins need
    no densified spine: inside a gap the ECDF is flat while the uniform
    CDF rises, so the gap's sup sits at the last empty bin before the
    next occupied second s and equals |B*(cum_s - m_s) - N*s| — the
    PRE-JUMP deviation evaluated at s. Each occupied bin therefore
    contributes greatest(post-jump, pre-jump) and the grid sup is exact;
    worst_second reports the occupied bin whose jump bounds the sup
    (the gap-end case points at the bin that ENDS the deficit run).

    Exactness: fully integer — both deviation terms are exact BIGINTs
    (|B*cum - N*(s+1)| and |B*(cum-m) - N*s|), so the argmax and the
    final quantization are deterministic; ties on the max break to the
    earliest second via the bounded (dev DESC, second ASC) limit-1 sort.

    Scale shape: one (second) aggregate over the bounded 86400-bin
    domain, one cumulative window on that grid, one broadcast N scalar,
    one limit-1 bounded sort."""
    sec = F.expr(
        "CAST(hour(ts) * 3600 + minute(ts) * 60 + second(ts) AS BIGINT)"
    )
    per_s = events.groupBy(sec.alias("s")).agg(
        F.count("*").cast("long").alias("m")
    )
    tot = per_s.agg(F.sum("m").cast("long").alias("n"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    dev = (
        per_s.select("s", "m", F.sum("m").over(w).cast("long").alias("cum"))
        .crossJoin(F.broadcast(tot))
        .select(
            "s",
            "n",
            F.greatest(
                F.abs(
                    F.lit(KS_BINS) * F.col("cum")
                    - F.col("n") * (F.col("s") + 1)
                ),
                F.abs(
                    F.lit(KS_BINS) * (F.col("cum") - F.col("m"))
                    - F.col("n") * F.col("s")
                ),
            ).alias("dev"),
        )
    )
    return (
        dev.orderBy(F.col("dev").desc(), F.col("s").asc())
        .limit(1)
        .select(
            F.col("n").alias("n_events"),
            F.expr(
                f"CAST(round(1e6 * CAST(dev AS DOUBLE) / (CAST(n AS DOUBLE)"
                f" * {KS_BINS})) AS BIGINT)"
            ).alias("d_micro"),
            F.col("s").alias("worst_second"),
        )
    )


def ks_uniformity_seconds_sql() -> str:
    return f"""
        WITH per_s AS (
            SELECT CAST(EXTRACT(hour FROM ts) * 3600
                   + EXTRACT(minute FROM ts) * 60
                   + FLOOR(EXTRACT(second FROM ts)) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(m) AS BIGINT) AS n FROM per_s
        ),
        cums AS (
            SELECT s, m, n,
                   SUM(m) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM per_s CROSS JOIN tot
        ),
        dev AS (
            SELECT s, n,
                   greatest(abs({KS_BINS} * cum - n * (s + 1)),
                            abs({KS_BINS} * (cum - m) - n * s)) AS dev
            FROM cums
        )
        SELECT n AS n_events,
               CAST(round(1e6 * CAST(dev AS DOUBLE) / (CAST(n AS DOUBLE)
                    * {KS_BINS})) AS BIGINT) AS d_micro,
               s AS worst_second
        FROM dev
        ORDER BY dev DESC, s ASC
        LIMIT 1
    """


# --- Hellinger distance between hourly profiles ----------------------------------------------

HELLINGER_X_TYPE = "click"
HELLINGER_Y_TYPE = "error"


def hellinger_hourly(events: DataFrame) -> DataFrame:
    """Hellinger distance between the click and error hour-of-day
    profiles: one row (n_x, n_y, bc_micro, hellinger_milli).

    chi_square tests hour-type INDEPENDENCE; the Hellinger distance
    MEASURES how far the two intraday shapes sit apart (0 identical, 1
    disjoint) via the Bhattacharyya coefficient BC = sum sqrt(p_h q_h)
    over the dense 24-hour grid — the bounded-metric companion the
    drift monitors (psi_drift) quote.

    Exactness: hour counts are exact BIGINTs on the densified 24-row
    grid (zero hours are real zeros); each sqrt(p q) term quantizes to
    micro before the 24-row integer sum; H = sqrt(1 - BC) closes it.

    Scale shape: one (hour) conditional aggregate densified against a
    24-row literal spine, one 1-row totals broadcast, one 24-row
    reduction."""
    per_h = events.groupBy(F.hour("ts").alias("h")).agg(
        F.sum((F.col("event_type") == HELLINGER_X_TYPE).cast("long"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == HELLINGER_Y_TYPE).cast("long"))
        .cast("long")
        .alias("y"),
    )
    spine = events.sparkSession.range(24).select(
        F.col("id").cast("int").alias("h")
    )
    dense = spine.join(per_h, "h", "left").select(
        "h",
        F.coalesce("x", F.lit(0)).alias("x"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    tot = dense.agg(
        F.sum("x").cast("long").alias("nx"),
        F.sum("y").cast("long").alias("ny"),
    )
    terms = dense.crossJoin(F.broadcast(tot)).select(
        "nx",
        "ny",
        F.expr(
            "CAST(CASE WHEN nx > 0 AND ny > 0 THEN"
            " round(1e6 * sqrt(CAST(x AS DOUBLE) / nx"
            "                  * CAST(y AS DOUBLE) / ny))"
            " ELSE 0 END AS BIGINT)"
        ).alias("t_micro"),
    )
    return terms.groupBy("nx", "ny").agg(
        F.sum("t_micro").cast("long").alias("bc_micro")
    ).select(
        F.col("nx").alias("n_x"),
        F.col("ny").alias("n_y"),
        "bc_micro",
        F.expr(
            "CAST(round(1000.0 * sqrt(GREATEST(0.0,"
            " 1.0 - bc_micro / 1e6))) AS BIGINT)"
        ).alias("hellinger_milli"),
    )


def hellinger_hourly_sql() -> str:
    return f"""
        WITH per_h AS (
            SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS h,
                   CAST(SUM(CASE WHEN event_type = '{HELLINGER_X_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = '{HELLINGER_Y_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        spine AS (
            SELECT CAST(generate_series AS INT) AS h
            FROM generate_series(0, 23)
        ),
        dense AS (
            SELECT spine.h, COALESCE(x, 0) AS x, COALESCE(y, 0) AS y
            FROM spine LEFT JOIN per_h ON spine.h = per_h.h
        ),
        tot AS (
            SELECT CAST(SUM(x) AS BIGINT) AS nx,
                   CAST(SUM(y) AS BIGINT) AS ny
            FROM dense
        ),
        terms AS (
            SELECT nx, ny,
                   CAST(CASE WHEN nx > 0 AND ny > 0 THEN
                        round(1e6 * sqrt(CAST(x AS DOUBLE) / nx
                                         * CAST(y AS DOUBLE) / ny))
                        ELSE 0 END AS BIGINT) AS t_micro
            FROM dense CROSS JOIN tot
        )
        SELECT nx AS n_x, ny AS n_y,
               CAST(SUM(t_micro) AS BIGINT) AS bc_micro,
               CAST(round(1000.0 * sqrt(GREATEST(0.0,
                    1.0 - SUM(t_micro) / 1e6))) AS BIGINT)
                   AS hellinger_milli
        FROM terms
        GROUP BY nx, ny
    """


# --- Cox-Stuart trend test --------------------------------------------------------------------


def cox_stuart_daily(events: DataFrame) -> DataFrame:
    """Cox-Stuart trend test on the daily count series: one row
    (n_pairs, s_plus, z_milli).

    mann_kendall scores ALL day pairs (O(n^2) evidence); Cox-Stuart is
    the frugal classic — pair day t with day t + n/2 (odd middle day
    drops) and sign-test the halves, trading power for a statistic whose
    null is exactly binomial(1/2). Tied pairs drop (Wilcoxon's rule).

    Exactness: the pairing join is integer index arithmetic with the
    half-offset from a 1-row scalar; counts are exact; the
    continuity-corrected z is the sign-test chain.

    Scale shape: one (day) aggregate, one 1-row offset scalar, one
    bounded equi-join of the day grid onto itself, one 1-row
    reduction."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    t = daily.select(
        "c",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    off = t.agg(
        (F.floor(F.max("t") / 2)).cast("long").alias("m"),
        F.max("t").cast("long").alias("n"),
    )
    # pair day t (t <= m) with day t + (n - m): for even n the offset is
    # exactly m; for odd n it is m + 1, so the middle day joins neither
    # half (the classic drop-the-middle rule)
    a = t.crossJoin(F.broadcast(off)).where(F.col("t") <= F.col("m"))
    b = t.select(F.col("t").alias("t2"), F.col("c").alias("c2"))
    pairs = a.join(
        b, F.col("t") + F.col("n") - F.col("m") == F.col("t2")
    ).select("c", "c2")
    agg = pairs.where(F.col("c") != F.col("c2")).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum((F.col("c2") > F.col("c")).cast("long"))
        .cast("long")
        .alias("s_plus"),
    )
    return agg.select(
        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        F.coalesce("s_plus", F.lit(0)).alias("s_plus"),
        F.expr(
            "CAST(CASE WHEN n_pairs > 0 AND 2 * s_plus - n_pairs <> 0"
            " THEN round(1000.0 * (2 * s_plus - n_pairs"
            "      - CAST(SIGN(2 * s_plus - n_pairs) AS BIGINT))"
            "      / sqrt(CAST(n_pairs AS DOUBLE)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def cox_stuart_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        t AS (
            SELECT c,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        off AS (
            SELECT CAST(FLOOR(MAX(t) / 2) AS BIGINT) AS m,
                   CAST(MAX(t) AS BIGINT) AS n
            FROM t
        ),
        pairs AS (
            SELECT a.c AS c, b.c AS c2
            FROM t a CROSS JOIN off
            JOIN t b ON a.t + n - m = b.t
            WHERE a.t <= m
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(COALESCE(SUM(CASE WHEN c2 > c THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS s_plus
            FROM pairs WHERE c <> c2
        )
        SELECT n_pairs, s_plus,
               CAST(CASE WHEN n_pairs > 0 AND 2 * s_plus - n_pairs <> 0
                    THEN round(1000.0 * (2 * s_plus - n_pairs
                         - CAST(SIGN(2 * s_plus - n_pairs) AS BIGINT))
                         / sqrt(CAST(n_pairs AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM agg
    """


# --- Page's ordered trend test -------------------------------------------------------------


def page_trend_test(events: DataFrame) -> DataFrame:
    """Page's L test for an ORDERED treatment effect across the four
    six-hour day parts, blocked by day: one row (n_days, l2_stat,
    z_milli).

    friedman_test asks "do the treatments differ at all"; Page's L asks
    the sharper monotone question — does activity RANK increase from
    night to evening in the hypothesized order (scores 1..4)? L = sum_j
    j * R_j over within-day ranks; one degree of freedom buys power the
    omnibus test dilutes, exactly the Cochran-Armitage move on ranks.

    Exactness: within-day DOUBLED average ranks (2*cum_before + t + 1)
    are exact BIGINTs over the dense day x 4-bucket grid (absent buckets
    are real zero counts), so l2_stat = 2L is an exact integer; the
    normal approximation uses the tie-free E/Var (stated — ties share
    doubled ranks but the variance keeps the classical form).

    Scale shape: one (day, bucket) aggregate densified against a 4-row
    literal spine, one day-partitioned rank window over that bounded
    grid, one 1-row reduction."""
    k = 4
    per_db = events.groupBy(
        F.to_date("ts").alias("day"),
        F.floor(F.hour("ts") / 6).cast("int").alias("b"),
    ).agg(F.count("*").cast("long").alias("c"))
    spine = (
        per_db.select("day")
        .distinct()
        .crossJoin(
            F.broadcast(
                events.sparkSession.range(k).select(
                    F.col("id").cast("int").alias("b")
                )
            )
        )
    )
    dense = spine.join(per_db, ["day", "b"], "left").select(
        "day", "b", F.coalesce("c", F.lit(0)).alias("c")
    )
    wcum = (
        Window.partitionBy("day")
        .orderBy("c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wtie = Window.partitionBy("day", "c")
    ranked = dense.select(
        "day",
        "b",
        (
            2 * F.coalesce(F.count("*").over(wcum), F.lit(0))
            + F.count("*").over(wtie)
            + 1
        ).cast("long").alias("r2"),
    )
    agg = ranked.agg(
        (F.countDistinct("day")).cast("long").alias("n_days"),
        F.sum((F.col("b") + 1) * F.col("r2")).cast("long").alias("l2"),
    )
    kk = float(k)
    return agg.select(
        "n_days",
        F.coalesce("l2", F.lit(0)).alias("l2_stat"),
        F.expr(
            f"CAST(CASE WHEN n_days > 0 THEN round(1000.0"
            f" * (l2 / 2.0 - n_days * {kk} * ({kk} + 1) * ({kk} + 1) / 4.0)"
            f" / sqrt(n_days * {kk} * {kk} * ({kk} + 1)"
            f"        * ({kk} * {kk} - 1) / 144.0))"
            f" ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def page_trend_test_sql() -> str:
    k = 4
    kk = float(k)
    return f"""
        WITH per_db AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS INT) AS b,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        spine AS (
            SELECT day, CAST(g.generate_series AS INT) AS b
            FROM (SELECT DISTINCT day FROM per_db)
            CROSS JOIN generate_series(0, {k - 1}) g
        ),
        dense AS (
            SELECT spine.day, spine.b, COALESCE(c, 0) AS c
            FROM spine LEFT JOIN per_db
              ON spine.day = per_db.day AND spine.b = per_db.b
        ),
        ranked AS (
            SELECT day, b,
                   CAST(2 * COALESCE(COUNT(*) OVER (PARTITION BY day
                        ORDER BY c
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)
                   + COUNT(*) OVER (PARTITION BY day, c) + 1 AS BIGINT)
                       AS r2
            FROM dense
        ),
        agg AS (
            SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
                   CAST(COALESCE(SUM((b + 1) * r2), 0) AS BIGINT) AS l2
            FROM ranked
        )
        SELECT n_days, l2 AS l2_stat,
               CAST(CASE WHEN n_days > 0 THEN round(1000.0
                    * (l2 / 2.0 - n_days * {kk} * ({kk} + 1) * ({kk} + 1)
                       / 4.0)
                    / sqrt(n_days * {kk} * {kk} * ({kk} + 1)
                           * ({kk} * {kk} - 1) / 144.0))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM agg
    """


# --- Seasonal Mann-Kendall ------------------------------------------------------------------


def seasonal_mann_kendall_daily(events: DataFrame) -> DataFrame:
    """Seasonal Mann-Kendall trend test on daily counts, seasons =
    day-of-week: one row (n_days, s_stat, var18, z_milli).

    Plain mann_kendall confounds a real trend with the weekly cadence
    (every Monday beats every Sunday, and cross-weekday pairs flood S
    with cycle signal); the seasonal variant compares days only WITHIN
    the same weekday and sums the seven S and variance terms — the
    hydrology-standard fix, here sharing the plain device's exact
    integer chain per season.

    Exactness: identical to mann_kendall per weekday — S from a bounded
    same-weekday pair join, tie-corrected 18*Var as exact BIGINTs summed
    over the 7 seasons, continuity-corrected z as the one float
    boundary.

    Scale shape: one (day) aggregate, a <=7x(|days|/7)^2 within-season
    pair join ON THE GRID, one (weekday, count)-keyed tie aggregate, one
    1-row reduction."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    ).select("day", "c", F.dayofweek("day").alias("dw"))
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(
        b,
        (F.col("a.dw") == F.col("b.dw")) & (F.col("a.day") < F.col("b.day")),
    ).agg(
        F.coalesce(
            F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("long")),
            F.lit(0),
        ).alias("s_stat")
    )
    per_season = daily.groupBy("dw", "c").agg(
        F.count("*").cast("long").alias("t")
    )
    var = per_season.groupBy("dw").agg(
        F.sum("t").cast("long").alias("n_s"),
        F.sum(
            F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
        ).cast("long").alias("tie_term"),
    ).agg(
        F.sum("n_s").cast("long").alias("n_days"),
        F.sum(
            F.col("n_s") * (F.col("n_s") - 1) * (2 * F.col("n_s") + 5)
            - F.col("tie_term")
        ).cast("long").alias("var18"),
    )
    return s.crossJoin(F.broadcast(var)).select(
        "n_days",
        "s_stat",
        "var18",
        F.expr(
            "CAST(CASE WHEN var18 > 0 AND s_stat <> 0"
            " THEN round(1000.0 * (s_stat - CAST(SIGN(s_stat) AS BIGINT))"
            "      / sqrt(CAST(var18 AS DOUBLE) / 18.0))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def seasonal_mann_kendall_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT day, c, CAST(EXTRACT(dow FROM day) AS INT) AS dw
            FROM (
                SELECT CAST(ts AS DATE) AS day,
                       CAST(COUNT(*) AS BIGINT) AS c
                FROM events GROUP BY 1
            )
        ),
        s AS (
            SELECT CAST(COALESCE(SUM(SIGN(b.c - a.c)), 0) AS BIGINT) AS s_stat
            FROM daily a JOIN daily b
              ON a.dw = b.dw AND a.day < b.day
        ),
        per_season AS (
            SELECT dw, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY dw, c
        ),
        var AS (
            SELECT CAST(SUM(n_s) AS BIGINT) AS n_days,
                   CAST(SUM(n_s * (n_s - 1) * (2 * n_s + 5) - tie_term)
                        AS BIGINT) AS var18
            FROM (
                SELECT dw, CAST(SUM(t) AS BIGINT) AS n_s,
                       CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                           AS tie_term
                FROM per_season GROUP BY dw
            )
        )
        SELECT n_days, s_stat, var18,
               CAST(CASE WHEN var18 > 0 AND s_stat <> 0
                    THEN round(1000.0 * (s_stat - CAST(SIGN(s_stat) AS BIGINT))
                         / sqrt(CAST(var18 AS DOUBLE) / 18.0))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM s CROSS JOIN var
    """


# --- Up/down runs test ---------------------------------------------------------------------


def updown_runs_daily(events: DataFrame) -> DataFrame:
    """Up/down runs test on the daily count series: one row (n_moves,
    n_runs, z_milli).

    runs_test counts runs around the MEDIAN (level randomness);
    turning_points counts extrema; the up/down runs test counts maximal
    monotone STRETCHES of the first-difference sign — the NIST-handbook
    trio's third member, sensitive to slow drifts the other two smooth
    over. Tied consecutive days drop their move (stated).

    Exactness: signs are exact integer comparisons; a run starts where
    the sign differs from the previous non-tie sign, counted with one
    lag over the bounded move grid; E[R] = (2m+1)/3 and
    Var = (16m-13)/90 on m moves feed the one float boundary.

    Scale shape: one (day) aggregate, two lag windows over the bounded
    day grid, one 1-row reduction."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.orderBy("day")
    moves = daily.select(
        "day",
        F.signum(F.col("c") - F.lag("c").over(w)).cast("int").alias("sg"),
    ).where(F.col("sg").isNotNull() & (F.col("sg") != 0))
    runs = moves.select(
        "sg",
        F.lag("sg").over(Window.orderBy("day")).alias("prev"),
    ).agg(
        F.count("*").cast("long").alias("n_moves"),
        F.sum(
            (F.col("prev").isNull() | (F.col("sg") != F.col("prev"))).cast(
                "long"
            )
        ).cast("long").alias("n_runs"),
    )
    return runs.select(
        F.coalesce("n_moves", F.lit(0)).alias("n_moves"),
        F.coalesce("n_runs", F.lit(0)).alias("n_runs"),
        F.expr(
            "CAST(CASE WHEN n_moves > 1 AND 16.0 * n_moves - 13 > 0"
            " THEN round(1000.0 * (n_runs - (2.0 * n_moves + 1) / 3.0)"
            "      / sqrt((16.0 * n_moves - 13) / 90.0))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def updown_runs_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        moves AS (
            SELECT day, sg FROM (
                SELECT day,
                       CAST(SIGN(c - LAG(c) OVER (ORDER BY day)) AS INT)
                           AS sg
                FROM daily
            ) WHERE sg IS NOT NULL AND sg <> 0
        ),
        runs AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_moves,
                   CAST(COALESCE(SUM(CASE WHEN prev IS NULL OR sg <> prev
                        THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
            FROM (
                SELECT sg, LAG(sg) OVER (ORDER BY day) AS prev FROM moves
            )
        )
        SELECT n_moves, n_runs,
               CAST(CASE WHEN n_moves > 1 AND 16.0 * n_moves - 13 > 0
                    THEN round(1000.0 * (n_runs - (2.0 * n_moves + 1) / 3.0)
                         / sqrt((16.0 * n_moves - 13) / 90.0))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM runs
    """


# --- Bartels rank von Neumann test ------------------------------------------------------------


def bartels_rank_daily(events: DataFrame) -> DataFrame:
    """Bartels rank version of the von Neumann ratio on daily counts: one
    row (n_days, rvn_milli, z_milli).

    The Durbin-Watson device needs a fitted model; Bartels' test asks the
    model-free randomness question on RANKS — RVN = sum (R_t - R_{t+1})^2
    / sum (R_t - Rbar)^2, near 2 under randomness, small under positive
    serial dependence. Using doubled average ranks keeps everything
    integer; E = 2, Var ~ 4/n gives the z.

    Exactness: doubled average ranks (2*cum_less + ties + 1) come from a
    RANGE-frame window over the bounded count-domain grid (deterministic
    under ties), adjacent-difference and deviation sums are exact
    DECIMAL(38,0), and the ratio is the one float boundary.

    Scale shape: one (day) aggregate, one RANGE-frame rank window and
    one lag window over the bounded day grid, one 1-row reduction."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    wr = Window.orderBy("c").rangeBetween(Window.unboundedPreceding, -1)
    wt = Window.partitionBy("c")
    ranked = daily.select(
        "day",
        (
            2 * F.coalesce(F.count("*").over(wr), F.lit(0))
            + F.count("*").over(wt)
            + 1
        ).cast("long").alias("r2"),
    )
    w = Window.orderBy("day")
    t = ranked.select(
        "r2",
        (F.col("r2") - F.lead("r2").over(w)).cast(d38).alias("d"),
    )
    mom = t.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("r2").cast(d38)).alias("sr"),
        F.sum(F.col("r2").cast(d38) * F.col("r2").cast(d38)).alias("srr"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    return mom.select(
        F.col("n").alias("n_days"),
        F.expr(
            "CASE WHEN CAST(srr AS DOUBLE)"
            " - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n > 0"
            " THEN CAST(sdd AS DOUBLE) / (CAST(srr AS DOUBLE)"
            " - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n)"
            " ELSE 0.0 END"
        ).alias("rvn"),
    ).select(
        "n_days",
        F.expr("CAST(round(1000 * rvn) AS BIGINT)").alias("rvn_milli"),
        F.expr(
            "CAST(CASE WHEN n_days > 1 AND rvn > 0"
            " THEN round(1000.0 * (rvn - 2.0) / sqrt(4.0 / n_days))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def bartels_rank_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        ranked AS (
            SELECT day,
                   CAST(2 * COALESCE(COUNT(*) OVER (ORDER BY c
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0)
                   + COUNT(*) OVER (PARTITION BY c) + 1 AS BIGINT) AS r2
            FROM daily
        ),
        t AS (
            SELECT CAST(r2 AS HUGEINT) AS r2,
                   CAST(r2 - LEAD(r2) OVER (ORDER BY day) AS HUGEINT) AS d
            FROM ranked
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(r2) AS sr,
                   SUM(r2 * r2) AS srr, SUM(d * d) AS sdd
            FROM t
        ),
        r AS (
            SELECT n AS n_days,
                   CASE WHEN CAST(srr AS DOUBLE)
                        - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n > 0
                        THEN CAST(sdd AS DOUBLE) / (CAST(srr AS DOUBLE)
                        - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / n)
                        ELSE 0.0 END AS rvn
            FROM mom
        )
        SELECT n_days,
               CAST(round(1000 * rvn) AS BIGINT) AS rvn_milli,
               CAST(CASE WHEN n_days > 1 AND rvn > 0
                    THEN round(1000.0 * (rvn - 2.0) / sqrt(4.0 / n_days))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM r
    """


# --- Log-rank survival test -------------------------------------------------------------------

LOGRANK_HORIZON_DAYS = 14


def logrank_test(
    events: DataFrame, horizon: int = LOGRANK_HORIZON_DAYS
) -> DataFrame:
    """Log-rank test of time-to-first-purchase between signup-day
    clickers and non-clickers: one row (n_users, o_minus_e_milli,
    z_milli).

    kaplan_meier DRAWS the two survival curves; the log-rank test is the
    classic verdict on whether they differ — at every event day compare
    observed group-1 conversions against the at-risk-proportional
    expectation, with hypergeometric variance. Cohort: users with a
    signup event; group 1 clicked on their signup day; follow-up is
    capped at ``horizon`` days (administrative censoring).

    Exactness: per-user times are exact day differences; the risk sets
    are reverse-cumulative integer sums over the bounded (group x
    horizon) grid; each day's O-E and variance term quantizes to micro
    before the <=horizon-row sums; the final z is the one float
    boundary.

    Scale shape: two user-grain aggregates (signup/first-purchase), one
    bounded (group, day) aggregate with a reverse-cumulative window,
    one 1-row reduction."""
    su = events.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.to_date("ts").alias("click_day")
    ).distinct()
    grouped = su.join(
        clicks,
        (F.col("user_id") == F.col("cu"))
        & (F.col("click_day") == F.to_date("signup_ts")),
        "left",
    ).select(
        "user_id",
        "signup_ts",
        F.max((F.col("cu").isNotNull()).cast("int"))
        .over(Window.partitionBy("user_id"))
        .alias("g"),
    ).select("user_id", "signup_ts", "g").distinct()
    purch = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    timed = (
        grouped.join(
            purch,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") > F.col("signup_ts")),
            "left",
        )
        .groupBy("user_id", "g")
        .agg(
            F.min(
                F.datediff(F.to_date("pts"), F.to_date("signup_ts"))
            ).alias("delay")
        )
        .select(
            "g",
            F.expr(
                f"CAST(CASE WHEN delay IS NULL OR delay > {horizon}"
                f" THEN {horizon} ELSE delay END AS BIGINT)"
            ).alias("t"),
            F.expr(
                f"CAST(CASE WHEN delay IS NULL OR delay > {horizon}"
                f" THEN 0 ELSE 1 END AS BIGINT)"
            ).alias("ev"),
        )
    )
    per_gt = timed.groupBy("g", "t").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("ev").cast("long").alias("d"),
    )
    wrev = (
        Window.partitionBy("g")
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = per_gt.select(
        "g",
        "t",
        "d",
        F.sum("m").over(wrev).cast("long").alias("n_at_risk"),
    )
    g1 = risk.where(F.col("g") == 1).select(
        F.col("t").alias("t1"),
        F.col("d").alias("d1"),
        F.col("n_at_risk").alias("n1"),
    )
    g0 = risk.where(F.col("g") == 0).select(
        F.col("t").alias("t0"),
        F.col("d").alias("d0"),
        F.col("n_at_risk").alias("n0"),
    )
    # dense day outer-join on the bounded horizon grid; absent side
    # carries zero deaths and the NEXT-lower at-risk count — approximate
    # by treating absent (g, t) cells as d=0 with at-risk from the same
    # group's later rows; for exactness both engines densify identically:
    spine = events.sparkSession.range(horizon + 1).select(
        F.col("id").cast("long").alias("t")
    )
    def dense(side, tcol, dcol, ncol):
        j = spine.join(side, spine.t == F.col(tcol), "left").select(
            "t",
            F.coalesce(dcol, F.lit(0)).alias(dcol),
            F.col(ncol),
        )
        wfill = (
            Window.orderBy(F.desc("t"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return j.select(
            "t",
            dcol,
            F.coalesce(
                F.max(ncol).over(wfill), F.lit(0)
            ).cast("long").alias(ncol),
        )
    d1 = dense(g1, "t1", "d1", "n1")
    d0 = dense(g0, "t0", "d0", "n0")
    terms = d1.join(d0, "t").select(
        "t",
        (F.col("d1") + F.col("d0")).alias("dt"),
        (F.col("n1") + F.col("n0")).alias("nt"),
        "d1",
        "n1",
        "n0",
    ).where(F.col("dt") > 0).select(
        F.expr(
            "CAST(round(1e6 * (d1 - CAST(n1 AS DOUBLE) * dt / nt))"
            " AS BIGINT)"
        ).alias("oe_micro"),
        F.expr(
            "CAST(CASE WHEN nt > 1 THEN round(1e6"
            " * CAST(dt AS DOUBLE) * (nt - dt) * n1 * n0"
            " / (CAST(nt AS DOUBLE) * nt * (nt - 1)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("v_micro"),
    )
    n_users = timed.agg(F.count("*").cast("long").alias("n_users"))
    agg = terms.agg(
        F.coalesce(F.sum("oe_micro").cast("long"), F.lit(0).cast("long")).alias("oe"),
        F.coalesce(F.sum("v_micro").cast("long"), F.lit(0).cast("long")).alias("v"),
    )
    return n_users.crossJoin(F.broadcast(agg)).select(
        "n_users",
        F.expr("CAST(round(oe / 1000.0) AS BIGINT)").alias("o_minus_e_milli"),
        F.expr(
            "CAST(CASE WHEN v > 0 THEN round(1000.0 * oe / 1e6"
            " / sqrt(v / 1e6)) ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def logrank_test_sql(horizon: int = LOGRANK_HORIZON_DAYS) -> str:
    return f"""
        WITH su AS (
            SELECT user_id, MIN(ts) AS signup_ts
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id
        ),
        clicks AS (
            SELECT DISTINCT user_id AS cu, CAST(ts AS DATE) AS click_day
            FROM events WHERE event_type = 'click'
        ),
        grouped AS (
            SELECT DISTINCT user_id, signup_ts,
                   MAX(CASE WHEN cu IS NOT NULL THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id) AS g
            FROM su LEFT JOIN clicks
              ON user_id = cu AND click_day = CAST(signup_ts AS DATE)
        ),
        timed AS (
            SELECT g,
                   CAST(CASE WHEN delay IS NULL OR delay > {horizon}
                        THEN {horizon} ELSE delay END AS BIGINT) AS t,
                   CAST(CASE WHEN delay IS NULL OR delay > {horizon}
                        THEN 0 ELSE 1 END AS BIGINT) AS ev
            FROM (
                SELECT grouped.user_id, g,
                       MIN(date_diff('day', CAST(signup_ts AS DATE),
                           CAST(pts AS DATE))) AS delay
                FROM grouped LEFT JOIN (
                    SELECT user_id AS pu, ts AS pts
                    FROM events WHERE event_type = 'purchase'
                ) p ON grouped.user_id = pu AND pts > signup_ts
                GROUP BY grouped.user_id, g
            )
        ),
        per_gt AS (
            SELECT g, t, CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(ev) AS BIGINT) AS d
            FROM timed GROUP BY g, t
        ),
        risk AS (
            SELECT g, t, d,
                   CAST(SUM(m) OVER (PARTITION BY g ORDER BY t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS n_at_risk
            FROM per_gt
        ),
        spine AS (
            SELECT CAST(generate_series AS BIGINT) AS t
            FROM generate_series(0, {horizon})
        ),
        d1 AS (
            SELECT t, d1,
                   CAST(COALESCE(MAX(n1) OVER (ORDER BY t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                        0) AS BIGINT) AS n1
            FROM (
                SELECT spine.t, COALESCE(d, 0) AS d1, n_at_risk AS n1
                FROM spine LEFT JOIN (SELECT * FROM risk WHERE g = 1) r
                  ON spine.t = r.t
            )
        ),
        d0 AS (
            SELECT t, d0,
                   CAST(COALESCE(MAX(n0) OVER (ORDER BY t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                        0) AS BIGINT) AS n0
            FROM (
                SELECT spine.t, COALESCE(d, 0) AS d0, n_at_risk AS n0
                FROM spine LEFT JOIN (SELECT * FROM risk WHERE g = 0) r
                  ON spine.t = r.t
            )
        ),
        terms AS (
            SELECT CAST(round(1e6 * (d1 - CAST(n1 AS DOUBLE)
                        * (d1 + d0) / (n1 + n0))) AS BIGINT) AS oe_micro,
                   CAST(CASE WHEN n1 + n0 > 1 THEN round(1e6
                        * CAST(d1 + d0 AS DOUBLE) * ((n1 + n0) - (d1 + d0))
                        * n1 * n0
                        / (CAST(n1 + n0 AS DOUBLE) * (n1 + n0)
                           * ((n1 + n0) - 1)))
                        ELSE 0 END AS BIGINT) AS v_micro
            FROM d1 JOIN d0 USING (t)
            WHERE d1 + d0 > 0
        ),
        agg AS (
            SELECT CAST(COALESCE(SUM(oe_micro), 0) AS BIGINT) AS oe,
                   CAST(COALESCE(SUM(v_micro), 0) AS BIGINT) AS v
            FROM terms
        ),
        nu AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM timed
        )
        SELECT n_users,
               CAST(round(oe / 1000.0) AS BIGINT) AS o_minus_e_milli,
               CAST(CASE WHEN v > 0 THEN round(1000.0 * oe / 1e6
                    / sqrt(v / 1e6)) ELSE 0 END AS BIGINT) AS z_milli
        FROM nu CROSS JOIN agg
    """


# --- AR(2) Yule-Walker forecast ---------------------------------------------------------


def ar2_yule_walker_forecast(events: DataFrame) -> DataFrame:
    """AR(2) fit of the daily event-count series by Yule-Walker, plus the
    1- and 2-step-ahead forecasts: one row (n_days, phi1_micro, phi2_micro,
    f1_milli, f2_milli).

    pacf_daily DIAGNOSES the order; this FITS the model the diagnosis
    points at and emits the numbers a capacity planner actually wants —
    tomorrow's and the day-after's expected load:
        phi1 = r1(1-r2)/(1-r1^2),  phi2 = (r2-r1^2)/(1-r1^2)
        f1 = mu + phi1(c_n - mu) + phi2(c_{n-1} - mu)
        f2 = mu + phi1(f1 - mu)  + phi2(c_n - mu)

    Exactness: scaled deviations X_t = n*c_t - S1 are exact BIGINTs; the
    lag product sums accumulate as DECIMAL(38,0), so r1, r2 are
    deterministic doubles from exact integers; the phi/forecast chain is
    one scripted double sequence identical in both engines, quantized at
    the 1-row boundary.

    Scale shape: one (day) aggregate, one 1-row scalar broadcast, two lag
    windows over the bounded day grid, one bounded last-two-days pivot,
    one 1-row reduction."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
    )
    w = Window.orderBy("day")
    x = daily.crossJoin(F.broadcast(tot)).select(
        "day", "n", "s1", "c", (F.col("n") * F.col("c") - F.col("s1")).alias("x")
    )
    mom = (
        x.select(
            "n",
            F.col("x").cast(d38).alias("x"),
            F.lag("x", 1).over(w).cast(d38).alias("x1"),
            F.lag("x", 2).over(w).cast(d38).alias("x2"),
        )
        .groupBy("n")
        .agg(
            F.sum(F.col("x") * F.col("x")).alias("s0"),
            F.sum(F.col("x") * F.col("x1")).alias("sl1"),
            F.sum(F.col("x") * F.col("x2")).alias("sl2"),
        )
    )
    wd = Window.orderBy(F.col("day").desc())
    last2 = (
        daily.select("c", F.row_number().over(wd).alias("rn"))
        .where(F.col("rn") <= 2)
        .groupBy()
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("cn"),
            F.max(F.when(F.col("rn") == 2, F.col("c"))).alias("cn1"),
        )
    )
    return (
        mom.crossJoin(F.broadcast(last2))
        .crossJoin(F.broadcast(tot.select("s1")))
        .select(
            F.col("n").alias("n_days"),
            F.expr(
                "CASE WHEN s0 > 0 THEN CAST(sl1 AS DOUBLE) / CAST(s0 AS DOUBLE)"
                " ELSE 0.0 END"
            ).alias("r1"),
            F.expr(
                "CASE WHEN s0 > 0 THEN CAST(sl2 AS DOUBLE) / CAST(s0 AS DOUBLE)"
                " ELSE 0.0 END"
            ).alias("r2"),
            F.expr("CAST(s1 AS DOUBLE) / n").alias("mu"),
            F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
            F.coalesce(F.col("cn1"), F.col("cn"), F.lit(0)).alias("cn1"),
        )
        .select(
            "n_days",
            "mu",
            "cn",
            "cn1",
            F.expr(
                "CASE WHEN 1 - r1 * r1 <> 0"
                " THEN r1 * (1 - r2) / (1 - r1 * r1) ELSE 0.0 END"
            ).alias("phi1"),
            F.expr(
                "CASE WHEN 1 - r1 * r1 <> 0"
                " THEN (r2 - r1 * r1) / (1 - r1 * r1) ELSE 0.0 END"
            ).alias("phi2"),
        )
        .select(
            "n_days",
            "mu",
            "cn",
            "phi1",
            "phi2",
            (
                F.col("mu")
                + F.col("phi1") * (F.col("cn") - F.col("mu"))
                + F.col("phi2") * (F.col("cn1") - F.col("mu"))
            ).alias("f1"),
        )
        .select(
            "n_days",
            F.expr("CAST(round(1e6 * phi1) AS BIGINT)").alias("phi1_micro"),
            F.expr("CAST(round(1e6 * phi2) AS BIGINT)").alias("phi2_micro"),
            F.expr("CAST(round(1000 * f1) AS BIGINT)").alias("f1_milli"),
            F.expr(
                "CAST(round(1000 * (mu + phi1 * (f1 - mu)"
                " + phi2 * (cn - mu))) AS BIGINT)"
            ).alias("f2_milli"),
        )
    )


def ar2_yule_walker_forecast_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s1
            FROM daily
        ),
        x AS (
            SELECT day, n, s1, c, CAST(n * c - s1 AS HUGEINT) AS x
            FROM daily CROSS JOIN tot
        ),
        lagged AS (
            SELECT n, x,
                   lag(x, 1) OVER (ORDER BY day) AS x1,
                   lag(x, 2) OVER (ORDER BY day) AS x2
            FROM x
        ),
        mom AS (
            SELECT n, SUM(x * x) AS s0, SUM(x * x1) AS sl1, SUM(x * x2) AS sl2
            FROM lagged GROUP BY n
        ),
        last2 AS (
            SELECT MAX(CASE WHEN rn = 1 THEN c END) AS cn,
                   MAX(CASE WHEN rn = 2 THEN c END) AS cn1
            FROM (
                SELECT c, row_number() OVER (ORDER BY day DESC) AS rn
                FROM daily
            ) WHERE rn <= 2
        ),
        base AS (
            SELECT mom.n AS n_days,
                   CASE WHEN s0 > 0 THEN CAST(sl1 AS DOUBLE) / CAST(s0 AS DOUBLE)
                        ELSE 0.0 END AS r1,
                   CASE WHEN s0 > 0 THEN CAST(sl2 AS DOUBLE) / CAST(s0 AS DOUBLE)
                        ELSE 0.0 END AS r2,
                   CAST(s1 AS DOUBLE) / mom.n AS mu,
                   COALESCE(cn, 0) AS cn,
                   COALESCE(cn1, cn, 0) AS cn1
            FROM mom CROSS JOIN last2 CROSS JOIN tot
        ),
        fit AS (
            SELECT n_days, mu, cn, cn1,
                   CASE WHEN 1 - r1 * r1 <> 0
                        THEN r1 * (1 - r2) / (1 - r1 * r1) ELSE 0.0 END AS phi1,
                   CASE WHEN 1 - r1 * r1 <> 0
                        THEN (r2 - r1 * r1) / (1 - r1 * r1) ELSE 0.0 END AS phi2
            FROM base
        ),
        fc AS (
            SELECT n_days, mu, cn, phi1, phi2,
                   mu + phi1 * (cn - mu) + phi2 * (cn1 - mu) AS f1
            FROM fit
        )
        SELECT n_days,
               CAST(round(1e6 * phi1) AS BIGINT) AS phi1_micro,
               CAST(round(1e6 * phi2) AS BIGINT) AS phi2_micro,
               CAST(round(1000 * f1) AS BIGINT) AS f1_milli,
               CAST(round(1000 * (mu + phi1 * (f1 - mu) + phi2 * (cn - mu)))
                   AS BIGINT) AS f2_milli
        FROM fc
    """


# --- Bartlett's cumulative periodogram white-noise test ---------------------------------


def cumulative_periodogram_test(events: DataFrame) -> DataFrame:
    """Bartlett's cumulative-periodogram white-noise test on the daily
    event-count series: one row (n_days, m_freqs, d_milli, worst_freq).

    spectral_periodogram reports amplitude per candidate PERIOD; Bartlett's
    test asks the global question — is the whole spectrum FLAT (white
    noise)? The normalized cumulative periodogram C_k over the Fourier
    frequencies j=1..m (m = floor((n-1)/2)) should climb the diagonal k/m;
    the KS-style statistic D = max_k |C_k - k/m| flags any spectral
    concentration (a weekly peak shows as a jump at j ~ n/7).

    Exactness: projection terms (c_t - mu)*cos/sin quantize to micro
    BEFORE the per-frequency integer sums (the spectral_periodogram
    discipline); I_j = A_j^2 + B_j^2 accumulates in DECIMAL(38,0), so the
    deviation |m*cum_k - k*tot| is exact and the argmax is deterministic
    with ties breaking to the earliest frequency.

    Scale shape: one (day) aggregate, one bounded m x n explode of the day
    grid, one (frequency) aggregate, one cumulative window over the
    bounded m-row frequency grid, one limit-1 bounded sort."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
    )
    t = daily.select(
        "c", F.row_number().over(Window.orderBy("day")).cast("long").alias("t")
    )
    proj = (
        t.crossJoin(F.broadcast(tot))
        .where(F.col("n") >= 3)
        .select(
            "c",
            "t",
            "n",
            "s1",
            F.explode(
                F.expr("sequence(1, CAST(floor((n - 1) / 2) AS INT))")
            ).alias("j"),
        )
        .select(
            "j",
            "n",
            F.expr(
                "CAST(round(1e6 * (c - CAST(s1 AS DOUBLE) / n)"
                " * cos(2 * pi() * j * t / n)) AS BIGINT)"
            ).alias("a_term"),
            F.expr(
                "CAST(round(1e6 * (c - CAST(s1 AS DOUBLE) / n)"
                " * sin(2 * pi() * j * t / n)) AS BIGINT)"
            ).alias("b_term"),
        )
    )
    per_j = proj.groupBy("j", "n").agg(
        (
            F.sum("a_term").cast(d38) * F.sum("a_term").cast(d38)
            + F.sum("b_term").cast(d38) * F.sum("b_term").cast(d38)
        ).alias("i_j")
    )
    wj = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, 0)
    dev = per_j.select(
        "j",
        "n",
        F.count("*").over(Window.partitionBy(F.lit(1))).cast("long").alias("m"),
        F.sum("i_j").over(wj).alias("cum"),
        F.sum("i_j").over(Window.partitionBy(F.lit(1))).alias("tot_i"),
    ).select(
        "j",
        "n",
        "m",
        F.abs(
            F.col("m").cast(d38) * F.col("cum")
            - F.col("j").cast(d38) * F.col("tot_i")
        ).alias("dev"),
        "tot_i",
    )
    return (
        dev.orderBy(F.col("dev").desc(), F.col("j").asc())
        .limit(1)
        .select(
            F.col("n").alias("n_days"),
            F.col("m").alias("m_freqs"),
            F.expr(
                "CAST(CASE WHEN tot_i > 0 THEN round(1000 * CAST(dev AS DOUBLE)"
                " / (m * CAST(tot_i AS DOUBLE))) ELSE 0 END AS BIGINT)"
            ).alias("d_milli"),
            F.col("j").alias("worst_freq"),
        )
    )


def cumulative_periodogram_test_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s1
            FROM daily
        ),
        t AS (
            SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        proj AS (
            SELECT j, n,
                   CAST(round(1e6 * (c - CAST(s1 AS DOUBLE) / n)
                        * cos(2 * pi() * j * t / n)) AS BIGINT) AS a_term,
                   CAST(round(1e6 * (c - CAST(s1 AS DOUBLE) / n)
                        * sin(2 * pi() * j * t / n)) AS BIGINT) AS b_term
            FROM t CROSS JOIN tot
            CROSS JOIN UNNEST(generate_series(1,
                CAST(floor((n - 1) / 2) AS BIGINT))) AS g(j)
            WHERE n >= 3
        ),
        per_j AS (
            SELECT j, n,
                   CAST(SUM(a_term) AS HUGEINT) * CAST(SUM(a_term) AS HUGEINT)
                   + CAST(SUM(b_term) AS HUGEINT) * CAST(SUM(b_term) AS HUGEINT)
                       AS i_j
            FROM proj GROUP BY j, n
        ),
        dev AS (
            SELECT j, n,
                   COUNT(*) OVER () AS m,
                   abs(CAST(COUNT(*) OVER () AS HUGEINT)
                       * SUM(i_j) OVER (ORDER BY j
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - CAST(j AS HUGEINT) * SUM(i_j) OVER ()) AS dev,
                   SUM(i_j) OVER () AS tot_i
            FROM per_j
        )
        SELECT n AS n_days, CAST(m AS BIGINT) AS m_freqs,
               CAST(CASE WHEN tot_i > 0 THEN round(1000 * CAST(dev AS DOUBLE)
                    / (m * CAST(tot_i AS DOUBLE))) ELSE 0 END AS BIGINT)
                   AS d_milli,
               j AS worst_freq
        FROM dev
        ORDER BY dev DESC, j ASC
        LIMIT 1
    """


# --- Jonckheere-Terpstra ordered-alternative trend test ----------------------------------

JT_BLOCKS = ((0, 7, "night"), (8, 15, "day"), (16, 23, "evening"))


def jonckheere_terpstra_dayparts(events: DataFrame) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED trend of event value across
    the three day-parts night < day < evening: one row (n_total, jt2,
    z_milli).

    kruskal_wallis asks "do the groups differ AT ALL"; JT asks the sharper
    ordered-alternative question — do values RISE along a stated group
    ordering — and buys power by only counting concordant pairs:
    JT = sum_{i<j} [#(x<y) + (1/2)#(x=y)] over group pairs, with the full
    tie-corrected normal approximation
        var = A/72 + B/(36 N(N-1)(N-2)) + C/(8 N(N-1))
        A = N(N-1)(2N+5) - sum_g n(n-1)(2n+5) - sum_v t(t-1)(2t+5)
        B = [sum_g n(n-1)(n-2)] * [sum_v t(t-1)(t-2)]
        C = [sum_g n(n-1)]      * [sum_v t(t-1)]
    (t_v = global tie count at value v).

    The pair counts never enumerate pairs: on the shared centi-value grid
    with per-group counts m_g(c) and cumulative counts cum_g(c),
    2*JT = sum_c sum_{i<j} m_j(c) * (2*cum_i(c) - m_i(c)) — one window set
    over the bounded grid, one reduction. All sums are exact (DECIMAL(38,0)
    past the BIGINT edge); the one float chain is the final z.

    Scale shape: one (value, group) grid aggregate, three cumulative
    windows over the bounded value grid, two bounded reductions (grid +
    3-row group sizes), one 1-row combine."""
    d38 = "decimal(38,0)"
    g = F.when(F.hour("ts") <= 7, F.lit(0)).when(
        F.hour("ts") <= 15, F.lit(1)
    ).otherwise(F.lit(2))
    grid = (
        events.where(F.col("value").isNotNull())
        .groupBy(
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
            g.alias("g"),
        )
        .agg(F.count("*").cast("long").alias("m"))
    )
    wide = grid.groupBy("c").agg(
        F.sum(F.when(F.col("g") == 0, F.col("m")).otherwise(0))
        .cast("long")
        .alias("m0"),
        F.sum(F.when(F.col("g") == 1, F.col("m")).otherwise(0))
        .cast("long")
        .alias("m1"),
        F.sum(F.when(F.col("g") == 2, F.col("m")).otherwise(0))
        .cast("long")
        .alias("m2"),
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = wide.select(
        "c",
        "m0",
        "m1",
        "m2",
        F.sum("m0").over(w).cast("long").alias("c0"),
        F.sum("m1").over(w).cast("long").alias("c1"),
        F.sum("m2").over(w).cast("long").alias("c2"),
    )
    # 2*JT and the global tie sums in one grid reduction
    jt = cum.agg(
        F.sum(
            F.col("m1").cast(d38) * (2 * F.col("c0") - F.col("m0")).cast(d38)
            + F.col("m2").cast(d38) * (2 * F.col("c0") - F.col("m0")).cast(d38)
            + F.col("m2").cast(d38) * (2 * F.col("c1") - F.col("m1")).cast(d38)
        ).alias("jt2"),
        F.sum(
            (F.col("m0") + F.col("m1") + F.col("m2")).cast(d38)
            * (F.col("m0") + F.col("m1") + F.col("m2") - 1).cast(d38)
            * (2 * (F.col("m0") + F.col("m1") + F.col("m2")) + 5).cast(d38)
        ).alias("t25"),
        F.sum(
            (F.col("m0") + F.col("m1") + F.col("m2")).cast(d38)
            * (F.col("m0") + F.col("m1") + F.col("m2") - 1).cast(d38)
        ).alias("t2"),
        F.sum(
            (F.col("m0") + F.col("m1") + F.col("m2")).cast(d38)
            * (F.col("m0") + F.col("m1") + F.col("m2") - 1).cast(d38)
            * (F.col("m0") + F.col("m1") + F.col("m2") - 2).cast(d38)
        ).alias("t3"),
    )
    sizes = grid.groupBy("g").agg(F.sum("m").cast("long").alias("n_g"))
    gs = sizes.agg(
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum(F.col("n_g").cast(d38) * F.col("n_g").cast(d38)).alias("sum_n2"),
        F.sum(
            F.col("n_g").cast(d38)
            * (F.col("n_g") - 1).cast(d38)
            * (2 * F.col("n_g") + 5).cast(d38)
        ).alias("g25"),
        F.sum(F.col("n_g").cast(d38) * (F.col("n_g") - 1).cast(d38)).alias("g2"),
        F.sum(
            F.col("n_g").cast(d38)
            * (F.col("n_g") - 1).cast(d38)
            * (F.col("n_g") - 2).cast(d38)
        ).alias("g3"),
    )
    return (
        jt.crossJoin(F.broadcast(gs))
        .select(
            "n_total",
            F.col("jt2").cast("long").alias("jt2"),
            "sum_n2",
            F.expr(
                "CASE WHEN n_total >= 3 THEN"
                " (CAST(n_total AS DOUBLE) * (n_total - 1) * (2 * n_total + 5)"
                "  - CAST(g25 AS DOUBLE) - CAST(t25 AS DOUBLE)) / 72"
                " + CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE)"
                "   / (36.0 * n_total * (n_total - 1) * (n_total - 2))"
                " + CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE)"
                "   / (8.0 * n_total * (n_total - 1))"
                " ELSE 0.0 END"
            ).alias("var_jt"),
        )
        .select(
            "n_total",
            "jt2",
            F.expr(
                "CAST(CASE WHEN var_jt > 0 THEN round(1000 * "
                " (CAST(jt2 AS DOUBLE) / 2"
                "  - (CAST(n_total AS DOUBLE) * n_total"
                "     - CAST(sum_n2 AS DOUBLE)) / 4)"
                " / sqrt(var_jt)) ELSE 0 END AS BIGINT)"
            ).alias("z_milli"),
        )
    )


def jonckheere_terpstra_dayparts_sql() -> str:
    return """
        WITH grid AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS c,
                   CASE WHEN EXTRACT(hour FROM ts) <= 7 THEN 0
                        WHEN EXTRACT(hour FROM ts) <= 15 THEN 1
                        ELSE 2 END AS g,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        wide AS (
            SELECT c,
                   CAST(SUM(CASE WHEN g = 0 THEN m ELSE 0 END) AS BIGINT) AS m0,
                   CAST(SUM(CASE WHEN g = 1 THEN m ELSE 0 END) AS BIGINT) AS m1,
                   CAST(SUM(CASE WHEN g = 2 THEN m ELSE 0 END) AS BIGINT) AS m2
            FROM grid GROUP BY c
        ),
        cum AS (
            SELECT c, m0, m1, m2,
                   SUM(m0) OVER w AS c0, SUM(m1) OVER w AS c1,
                   SUM(m2) OVER w AS c2
            FROM wide
            WINDOW w AS (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        jt AS (
            SELECT SUM(CAST(m1 AS HUGEINT) * (2 * c0 - m0)
                       + CAST(m2 AS HUGEINT) * (2 * c0 - m0)
                       + CAST(m2 AS HUGEINT) * (2 * c1 - m1)) AS jt2,
                   SUM(CAST(m0 + m1 + m2 AS HUGEINT) * (m0 + m1 + m2 - 1)
                       * (2 * (m0 + m1 + m2) + 5)) AS t25,
                   SUM(CAST(m0 + m1 + m2 AS HUGEINT) * (m0 + m1 + m2 - 1)) AS t2,
                   SUM(CAST(m0 + m1 + m2 AS HUGEINT) * (m0 + m1 + m2 - 1)
                       * (m0 + m1 + m2 - 2)) AS t3
            FROM cum
        ),
        gs AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n_total,
                   SUM(CAST(n_g AS HUGEINT) * n_g) AS sum_n2,
                   SUM(CAST(n_g AS HUGEINT) * (n_g - 1) * (2 * n_g + 5)) AS g25,
                   SUM(CAST(n_g AS HUGEINT) * (n_g - 1)) AS g2,
                   SUM(CAST(n_g AS HUGEINT) * (n_g - 1) * (n_g - 2)) AS g3
            FROM (
                SELECT g, CAST(SUM(m) AS BIGINT) AS n_g FROM grid GROUP BY g
            )
        ),
        v AS (
            SELECT n_total, CAST(jt2 AS BIGINT) AS jt2, sum_n2,
                   CASE WHEN n_total >= 3 THEN
                     (CAST(n_total AS DOUBLE) * (n_total - 1) * (2 * n_total + 5)
                      - CAST(g25 AS DOUBLE) - CAST(t25 AS DOUBLE)) / 72
                     + CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE)
                       / (36.0 * n_total * (n_total - 1) * (n_total - 2))
                     + CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE)
                       / (8.0 * n_total * (n_total - 1))
                   ELSE 0.0 END AS var_jt
            FROM jt CROSS JOIN gs
        )
        SELECT n_total, jt2,
               CAST(CASE WHEN var_jt > 0 THEN round(1000 *
                    (CAST(jt2 AS DOUBLE) / 2
                     - (CAST(n_total AS DOUBLE) * n_total
                        - CAST(sum_n2 AS DOUBLE)) / 4)
                    / sqrt(var_jt)) ELSE 0 END AS BIGINT) AS z_milli
        FROM v
    """


# --- EWMA control chart -------------------------------------------------------------------

EWMA_LAMBDA_MILLI = 200  # lambda = 0.2
EWMA_L = 3  # control-limit width in sigma_z units


def ewma_control_chart(events: DataFrame) -> DataFrame:
    """EWMA control chart on daily event counts: rows (day, c, z_micro,
    lcl_micro, ucl_micro, breach) ordered by day.

    c_chart flags single-day Poisson excursions; the EWMA chart
    accumulates SMALL persistent shifts a Shewhart chart never trips on:
        z_t = (1-l)^t * mu + l * sum_{i<=t} (1-l)^{t-i} c_i,   l = 0.2
    with the exact time-varying limits mu +/- L*sigma*sqrt(l/(2-l) *
    (1-(1-l)^{2t})) — tight at start-up, widening to the asymptote, so
    early drift is not masked by the steady-state band.

    Exactness: each power-weighted term l*(1-l)^(t-i)*c_i and the
    (1-l)^t*mu carry-in quantize to micro BEFORE the integer sum per t (the
    permutation-entropy discipline applied to the geometric kernel); mu
    and sigma come from exact count sums, so the limits are one
    deterministic double chain quantized per row; breach compares
    integers.

    Scale shape: one (day) aggregate, one bounded t x i grid join over the
    <=|days|^2/2 day pairs (30 days -> 465 terms), one 1-row scalar
    broadcast."""
    lam = EWMA_LAMBDA_MILLI / 1000.0
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    t_rel = daily.select(
        "day",
        "c",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    i_rel = t_rel.select(F.col("t").alias("i"), F.col("c").alias("ci"))
    terms = (
        t_rel.join(i_rel, F.col("i") <= F.col("t"))
        .crossJoin(F.broadcast(tot))
        .groupBy("day", "c", "t", "n", "s1", "s2")
        .agg(
            F.sum(
                F.expr(
                    f"CAST(round(1e6 * {lam}e0 * pow({1 - lam}e0, t - i) * ci)"
                    " AS BIGINT)"
                )
            )
            .cast("long")
            .alias("w_sum")
        )
    )
    return (
        terms.select(
            "day",
            "c",
            (
                F.col("w_sum")
                + F.expr(
                    f"CAST(round(1e6 * pow({1 - lam}e0, t)"
                    " * (CAST(s1 AS DOUBLE) / n)) AS BIGINT)"
                )
            ).alias("z_micro"),
            F.expr(
                f"CAST(round(1e6 * (CAST(s1 AS DOUBLE) / n - {EWMA_L}"
                f" * sqrt(CAST(s2 AS DOUBLE) / n"
                f"        - pow(CAST(s1 AS DOUBLE) / n, 2))"
                f" * sqrt({lam}e0 / {2 - lam}e0"
                f"        * (1 - pow({1 - lam}e0, 2 * t))))) AS BIGINT)"
            ).alias("lcl_micro"),
            F.expr(
                f"CAST(round(1e6 * (CAST(s1 AS DOUBLE) / n + {EWMA_L}"
                f" * sqrt(CAST(s2 AS DOUBLE) / n"
                f"        - pow(CAST(s1 AS DOUBLE) / n, 2))"
                f" * sqrt({lam}e0 / {2 - lam}e0"
                f"        * (1 - pow({1 - lam}e0, 2 * t))))) AS BIGINT)"
            ).alias("ucl_micro"),
        )
        .select(
            "day",
            "c",
            "z_micro",
            "lcl_micro",
            "ucl_micro",
            (
                (F.col("z_micro") < F.col("lcl_micro"))
                | (F.col("z_micro") > F.col("ucl_micro"))
            ).alias("breach"),
        )
        .orderBy("day")
    )


def ewma_control_chart_sql() -> str:
    lam = EWMA_LAMBDA_MILLI / 1000.0
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        t_rel AS (
            SELECT day, c,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s1,
                   CAST(SUM(c * c) AS BIGINT) AS s2
            FROM daily
        ),
        terms AS (
            SELECT a.day, a.c, a.t, n, s1, s2,
                   CAST(SUM(CAST(round(1e6 * {lam}e0
                        * pow({1 - lam}e0, a.t - b.t) * b.c) AS BIGINT))
                        AS BIGINT) AS w_sum
            FROM t_rel a
            JOIN t_rel b ON b.t <= a.t
            CROSS JOIN tot
            GROUP BY a.day, a.c, a.t, n, s1, s2
        ),
        z AS (
            SELECT day, c,
                   w_sum + CAST(round(1e6 * pow({1 - lam}e0, t)
                       * (CAST(s1 AS DOUBLE) / n)) AS BIGINT) AS z_micro,
                   CAST(round(1e6 * (CAST(s1 AS DOUBLE) / n - {EWMA_L}
                        * sqrt(CAST(s2 AS DOUBLE) / n
                               - pow(CAST(s1 AS DOUBLE) / n, 2))
                        * sqrt({lam}e0 / {2 - lam}e0
                               * (1 - pow({1 - lam}e0, 2 * t))))) AS BIGINT)
                       AS lcl_micro,
                   CAST(round(1e6 * (CAST(s1 AS DOUBLE) / n + {EWMA_L}
                        * sqrt(CAST(s2 AS DOUBLE) / n
                               - pow(CAST(s1 AS DOUBLE) / n, 2))
                        * sqrt({lam}e0 / {2 - lam}e0
                               * (1 - pow({1 - lam}e0, 2 * t))))) AS BIGINT)
                       AS ucl_micro
            FROM terms
        )
        SELECT day, c, z_micro, lcl_micro, ucl_micro,
               z_micro < lcl_micro OR z_micro > ucl_micro AS breach
        FROM z
        ORDER BY day
    """


# --- Siegel repeated-median slope -----------------------------------------------------------


def siegel_slope_daily(events: DataFrame) -> DataFrame:
    """Siegel repeated-median trend of the daily event-count series: one
    row (n_days, slope_micro, intercept_milli).

    sen_slope takes ONE median over all pairwise slopes (29% breakdown);
    Siegel medians twice — per point over its pairwise slopes, then over
    the per-point medians — reaching the 50% breakdown point, the most
    outlier-proof line available, and still pure relational algebra on the
    bounded day grid.

    Exactness: each pairwise slope quantizes to micro BEFORE any median;
    both median layers are the house lower weighted median (min value with
    2*cum >= tot over a cumulative window on the bounded slope grid);
    the intercept medians the per-point residuals c_i - slope*t_i in exact
    milli.

    Scale shape: one (day) aggregate, one bounded |days|^2 pair join
    (30 days -> 435 pairs), two grid-median window passes, one bounded
    residual median."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    t_rel = daily.select(
        "c", F.row_number().over(Window.orderBy("day")).cast("long").alias("t")
    )
    n_rel = t_rel.agg(F.count("*").cast("long").alias("n"))
    pairs = (
        t_rel.alias("a")
        .join(t_rel.alias("b"), F.expr("a.t <> b.t"))
        .select(
            F.col("a.t").alias("i"),
            F.expr(
                "CAST(round(1e6 * (b.c - a.c) / CAST(b.t - a.t AS DOUBLE))"
                " AS BIGINT)"
            ).alias("s_micro"),
        )
    )
    # median per point i over its slope grid
    gi = pairs.groupBy("i", "s_micro").agg(F.count("*").cast("long").alias("m"))
    wi = Window.partitionBy("i").orderBy("s_micro").rowsBetween(
        Window.unboundedPreceding, 0
    )
    med_i = (
        gi.select(
            "i",
            "s_micro",
            F.sum("m").over(wi).alias("cum"),
            F.sum("m").over(Window.partitionBy("i")).alias("tot"),
        )
        .where(2 * F.col("cum") >= F.col("tot"))
        .groupBy("i")
        .agg(F.min("s_micro").alias("med_i"))
    )
    # global median over the per-point medians
    gm = med_i.groupBy("med_i").agg(F.count("*").cast("long").alias("m"))
    wg = Window.orderBy("med_i").rowsBetween(Window.unboundedPreceding, 0)
    slope = (
        gm.select(
            "med_i",
            F.sum("m").over(wg).alias("cum"),
            F.sum("m").over(Window.partitionBy(F.lit(1))).alias("tot"),
        )
        .where(2 * F.col("cum") >= F.col("tot"))
        .agg(F.min("med_i").alias("slope_micro"))
    )
    resid = t_rel.crossJoin(F.broadcast(slope)).select(
        F.expr("CAST(1000 * c - CAST(round(slope_micro * t / 1000.0) AS BIGINT) AS BIGINT)").alias(
            "r_milli"
        )
    )
    gr = resid.groupBy("r_milli").agg(F.count("*").cast("long").alias("m"))
    wr = Window.orderBy("r_milli").rowsBetween(Window.unboundedPreceding, 0)
    intercept = (
        gr.select(
            "r_milli",
            F.sum("m").over(wr).alias("cum"),
            F.sum("m").over(Window.partitionBy(F.lit(1))).alias("tot"),
        )
        .where(2 * F.col("cum") >= F.col("tot"))
        .agg(F.min("r_milli").alias("intercept_milli"))
    )
    return (
        n_rel.crossJoin(F.broadcast(slope))
        .crossJoin(F.broadcast(intercept))
        .select(
            F.col("n").alias("n_days"), "slope_micro", "intercept_milli"
        )
    )


def siegel_slope_daily_sql() -> str:
    return """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        t_rel AS (
            SELECT c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        n_rel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t_rel),
        pairs AS (
            SELECT a.t AS i,
                   CAST(round(1e6 * (b.c - a.c)
                        / CAST(b.t - a.t AS DOUBLE)) AS BIGINT) AS s_micro
            FROM t_rel a JOIN t_rel b ON a.t <> b.t
        ),
        gi AS (
            SELECT i, s_micro, CAST(COUNT(*) AS BIGINT) AS m
            FROM pairs GROUP BY i, s_micro
        ),
        med_i AS (
            SELECT i, MIN(s_micro) AS med_i FROM (
                SELECT i, s_micro,
                       SUM(m) OVER (PARTITION BY i ORDER BY s_micro
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS cum,
                       SUM(m) OVER (PARTITION BY i) AS tot
                FROM gi
            ) WHERE 2 * cum >= tot GROUP BY i
        ),
        gm AS (
            SELECT med_i, CAST(COUNT(*) AS BIGINT) AS m
            FROM med_i GROUP BY med_i
        ),
        slope AS (
            SELECT MIN(med_i) AS slope_micro FROM (
                SELECT med_i,
                       SUM(m) OVER (ORDER BY med_i
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS cum,
                       SUM(m) OVER () AS tot
                FROM gm
            ) WHERE 2 * cum >= tot
        ),
        resid AS (
            SELECT CAST(1000 * c
                   - CAST(round(slope_micro * t / 1000.0) AS BIGINT)
                   AS BIGINT) AS r_milli
            FROM t_rel CROSS JOIN slope
        ),
        gr AS (
            SELECT r_milli, CAST(COUNT(*) AS BIGINT) AS m
            FROM resid GROUP BY r_milli
        ),
        intercept AS (
            SELECT MIN(r_milli) AS intercept_milli FROM (
                SELECT r_milli,
                       SUM(m) OVER (ORDER BY r_milli
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS cum,
                       SUM(m) OVER () AS tot
                FROM gr
            ) WHERE 2 * cum >= tot
        )
        SELECT n AS n_days, slope_micro, intercept_milli
        FROM n_rel CROSS JOIN slope CROSS JOIN intercept
    """


# --- Cliff's delta ordinal effect size ------------------------------------------------------

CLIFFS_X_TYPE = "click"
CLIFFS_Y_TYPE = "error"


def cliffs_delta(events: DataFrame) -> DataFrame:
    """Cliff's delta between the click and error value distributions: one
    row (n_x, n_y, gt_pairs, lt_pairs, delta_milli).

    mannwhitney_u delivers a p-value; Cliff's delta is the matching
    EFFECT SIZE the test leaves unstated — P(X > Y) - P(X < Y), an ordinal
    measure immune to the variance assumptions Cohen's d smuggles in
    (|delta| < 0.147 is the conventional "negligible" line).

    The pair counts never enumerate pairs: on the shared centi grid with
    per-side counts m_x(c), m_y(c) and cumulative counts,
    gt = sum_c m_x(c) * cumlt_y(c) and lt symmetrically — two cumulative
    windows over the bounded grid (the Jonckheere treatment for two
    groups).

    Scale shape: one (value, side) grid aggregate, two cumulative windows
    on the bounded grid, one 1-row reduction."""
    d38 = "decimal(38,0)"
    grid = (
        events.where(
            F.col("value").isNotNull()
            & F.col("event_type").isin(CLIFFS_X_TYPE, CLIFFS_Y_TYPE)
        )
        .groupBy(F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
        .agg(
            F.sum((F.col("event_type") == CLIFFS_X_TYPE).cast("long"))
            .cast("long")
            .alias("mx"),
            F.sum((F.col("event_type") == CLIFFS_Y_TYPE).cast("long"))
            .cast("long")
            .alias("my"),
        )
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "c",
        "mx",
        "my",
        (F.sum("mx").over(w) - F.col("mx")).cast("long").alias("cxlt"),
        (F.sum("my").over(w) - F.col("my")).cast("long").alias("cylt"),
    )
    agg = cum.agg(
        F.sum("mx").cast("long").alias("n_x"),
        F.sum("my").cast("long").alias("n_y"),
        F.sum(F.col("mx").cast(d38) * F.col("cylt").cast(d38)).alias("gt"),
        F.sum(F.col("my").cast(d38) * F.col("cxlt").cast(d38)).alias("lt"),
    )
    return agg.select(
        "n_x",
        "n_y",
        F.col("gt").cast("long").alias("gt_pairs"),
        F.col("lt").cast("long").alias("lt_pairs"),
        F.expr(
            "CAST(CASE WHEN n_x > 0 AND n_y > 0 THEN"
            " round(1000 * (CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))"
            " / (CAST(n_x AS DOUBLE) * n_y)) ELSE 0 END AS BIGINT)"
        ).alias("delta_milli"),
    )


def cliffs_delta_sql() -> str:
    return f"""
        WITH grid AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN event_type = '{CLIFFS_X_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS mx,
                   CAST(SUM(CASE WHEN event_type = '{CLIFFS_Y_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS my
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('{CLIFFS_X_TYPE}', '{CLIFFS_Y_TYPE}')
            GROUP BY 1
        ),
        cum AS (
            SELECT c, mx, my,
                   SUM(mx) OVER w - mx AS cxlt,
                   SUM(my) OVER w - my AS cylt
            FROM grid
            WINDOW w AS (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        agg AS (
            SELECT CAST(SUM(mx) AS BIGINT) AS n_x,
                   CAST(SUM(my) AS BIGINT) AS n_y,
                   SUM(CAST(mx AS HUGEINT) * cylt) AS gt,
                   SUM(CAST(my AS HUGEINT) * cxlt) AS lt
            FROM cum
        )
        SELECT n_x, n_y,
               CAST(gt AS BIGINT) AS gt_pairs,
               CAST(lt AS BIGINT) AS lt_pairs,
               CAST(CASE WHEN n_x > 0 AND n_y > 0 THEN
                    round(1000 * (CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
                    / (CAST(n_x AS DOUBLE) * n_y)) ELSE 0 END AS BIGINT)
                   AS delta_milli
        FROM agg
    """


# --- James-Stein shrinkage of per-type daily means --------------------------------------


def james_stein_type_means(events: DataFrame) -> DataFrame:
    """James-Stein shrinkage of each event type's daily-count mean toward
    the grand mean: rows (event_type, n_days, raw_milli, shrunk_milli,
    shrink_factor_milli), ordered by type.

    The estimator that made empirical Bayes famous: with k >= 4 parallel
    means, shrinking each toward the pooled center STRICTLY dominates the
    raw means under squared loss. Factor b = max(0, 1 - (k-3) * s^2 /
    sum_i (xbar_i - xbar)^2) with s^2 the (pooled) variance of a daily
    mean, applied as shrunk_i = xbar + b * (xbar_i - xbar) — the ranking
    stabilizer for small-sample per-segment KPIs.

    Exactness: per-type day counts are exact; all means are rationals of
    exact sums evaluated in one double chain over the <=|types|-row grid,
    quantized to milli at the row boundary. Spread and s^2 come from the
    same exact sums.

    Scale shape: one (type, day) aggregate, one |types|-row grid, one
    1-row scalar broadcast."""
    td = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    per_type = td.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    tot = per_type.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("s1").cast("long").alias("g1"),
        F.sum("n_days").cast("long").alias("gd"),
        # pooled within-type variance of a single day count, then of a mean
        F.sum(
            F.expr("CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days")
        ).alias("ss_within"),
    )
    base = per_type.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_days",
        F.expr("CAST(s1 AS DOUBLE) / n_days").alias("xbar_i"),
        F.expr("CAST(g1 AS DOUBLE) / gd").alias("xbar"),
        "k",
        "gd",
        "ss_within",
    )
    spread = base.groupBy().agg(
        F.sum(F.expr("pow(xbar_i - xbar, 2)")).alias("spread"),
    )
    return (
        base.crossJoin(F.broadcast(spread))
        .select(
            "event_type",
            "n_days",
            F.expr("CAST(round(1000 * xbar_i) AS BIGINT)").alias("raw_milli"),
            F.expr(
                "CASE WHEN k >= 4 AND spread > 0 AND gd > k THEN"
                " greatest(0.0, 1 - (k - 3)"
                "   * (ss_within / (gd - k) / n_days) / spread)"
                " ELSE 1.0 END"
            ).alias("b"),
            "xbar",
            "xbar_i",
        )
        .select(
            "event_type",
            "n_days",
            "raw_milli",
            F.expr(
                "CAST(round(1000 * (xbar + b * (xbar_i - xbar))) AS BIGINT)"
            ).alias("shrunk_milli"),
            F.expr("CAST(round(1000 * b) AS BIGINT)").alias(
                "shrink_factor_milli"
            ),
        )
        .orderBy("event_type")
    )


def james_stein_type_means_sql() -> str:
    return """
        WITH td AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        per_type AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(c) AS BIGINT) AS s1,
                   CAST(SUM(c * c) AS BIGINT) AS s2
            FROM td GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(s1) AS BIGINT) AS g1,
                   CAST(SUM(n_days) AS BIGINT) AS gd,
                   SUM(CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * s1 / n_days) AS ss_within
            FROM per_type
        ),
        base AS (
            SELECT event_type, n_days,
                   CAST(s1 AS DOUBLE) / n_days AS xbar_i,
                   CAST(g1 AS DOUBLE) / gd AS xbar,
                   k, gd, ss_within
            FROM per_type CROSS JOIN tot
        ),
        spread AS (
            SELECT SUM(pow(xbar_i - xbar, 2)) AS spread FROM base
        )
        SELECT event_type, n_days,
               CAST(round(1000 * xbar_i) AS BIGINT) AS raw_milli,
               CAST(round(1000 * (xbar
                    + CASE WHEN k >= 4 AND spread > 0 AND gd > k THEN
                        greatest(0.0, 1 - (k - 3)
                          * (ss_within / (gd - k) / n_days) / spread)
                      ELSE 1.0 END * (xbar_i - xbar))) AS BIGINT)
                   AS shrunk_milli,
               CAST(round(1000 * CASE WHEN k >= 4 AND spread > 0 AND gd > k THEN
                        greatest(0.0, 1 - (k - 3)
                          * (ss_within / (gd - k) / n_days) / spread)
                      ELSE 1.0 END) AS BIGINT) AS shrink_factor_milli
        FROM base CROSS JOIN spread
        ORDER BY event_type
    """


# --- Cross-spectrum of the click/error daily series ------------------------------------------

XSPEC_X_TYPE = "click"
XSPEC_Y_TYPE = "error"


def cross_spectrum_daily(events: DataFrame) -> DataFrame:
    """Cross-spectrum between the click and error daily-count series at
    candidate periods 2..14 days: rows (period, co_spectrum, quad_spectrum,
    amp_micro2, phase_milli) ordered by period.

    xcorr_daily measures time-domain lag correlation; the cross-spectrum
    asks WHERE in frequency the two series co-move and by what PHASE —
    co-spectrum C = AxAy + BxBy, quadrature Q = AxBy - AyBx, phase lag
    atan2(Q, C) — a weekly click cadence that errors follow half a cycle
    later shows as amplitude at period 7 with phase ~pi.

    Exactness: the per-series projections Ax, Bx, Ay, By quantize each
    term to micro before their integer sums (the spectral_periodogram
    discipline); C and Q are then exact DECIMAL(38,0) products; amplitude
    and atan2 are the one double chain per bounded period row. atan2 is
    IEEE-identical in both engines on identical exact inputs.

    Scale shape: one (day) conditional aggregate, one bounded 13 x |days|
    explode, one (period) reduction."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == XSPEC_X_TYPE).cast("long"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == XSPEC_Y_TYPE).cast("long"))
        .cast("long")
        .alias("y"),
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    t = daily.select(
        "x", "y", F.row_number().over(Window.orderBy("day")).cast("long").alias("t")
    )
    terms = (
        t.crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            "t",
            "n",
            "sx",
            "sy",
            F.explode(
                F.sequence(F.lit(SPECTRAL_MIN_PERIOD), F.lit(SPECTRAL_MAX_PERIOD))
            ).alias("period"),
        )
        .select(
            "period",
            F.expr(
                "CAST(round(1e6 * (x - CAST(sx AS DOUBLE) / n)"
                " * cos(2 * pi() * t / period)) AS BIGINT)"
            ).alias("ax"),
            F.expr(
                "CAST(round(1e6 * (x - CAST(sx AS DOUBLE) / n)"
                " * sin(2 * pi() * t / period)) AS BIGINT)"
            ).alias("bx"),
            F.expr(
                "CAST(round(1e6 * (y - CAST(sy AS DOUBLE) / n)"
                " * cos(2 * pi() * t / period)) AS BIGINT)"
            ).alias("ay"),
            F.expr(
                "CAST(round(1e6 * (y - CAST(sy AS DOUBLE) / n)"
                " * sin(2 * pi() * t / period)) AS BIGINT)"
            ).alias("by"),
        )
    )
    per_p = terms.groupBy("period").agg(
        F.sum("ax").cast(d38).alias("sax"),
        F.sum("bx").cast(d38).alias("sbx"),
        F.sum("ay").cast(d38).alias("say"),
        F.sum("by").cast(d38).alias("sby"),
    )
    return (
        per_p.select(
            "period",
            (F.col("sax") * F.col("say") + F.col("sbx") * F.col("sby"))
            .cast(d38)
            .alias("c"),
            (F.col("sax") * F.col("sby") - F.col("say") * F.col("sbx"))
            .cast(d38)
            .alias("q"),
        )
        .select(
            F.col("period").cast("long").alias("period"),
            F.expr("CAST(round(CAST(c AS DOUBLE) / 1e12) AS BIGINT)").alias(
                "co_spectrum"
            ),
            F.expr("CAST(round(CAST(q AS DOUBLE) / 1e12) AS BIGINT)").alias(
                "quad_spectrum"
            ),
            F.expr(
                "CAST(round(sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)"
                " + CAST(q AS DOUBLE) * CAST(q AS DOUBLE)) / 1e12) AS BIGINT)"
            ).alias("amp_micro2"),
            F.expr(
                "CAST(CASE WHEN c <> 0 OR q <> 0 THEN"
                " round(1000 * atan2(CAST(q AS DOUBLE), CAST(c AS DOUBLE)))"
                " ELSE 0 END AS BIGINT)"
            ).alias("phase_milli"),
        )
        .orderBy("period")
    )


def cross_spectrum_daily_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = '{XSPEC_X_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = '{XSPEC_Y_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy
            FROM daily
        ),
        t AS (
            SELECT x, y,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily
        ),
        terms AS (
            SELECT period,
                   CAST(round(1e6 * (x - CAST(sx AS DOUBLE) / n)
                        * cos(2 * pi() * t / period)) AS BIGINT) AS ax,
                   CAST(round(1e6 * (x - CAST(sx AS DOUBLE) / n)
                        * sin(2 * pi() * t / period)) AS BIGINT) AS bx,
                   CAST(round(1e6 * (y - CAST(sy AS DOUBLE) / n)
                        * cos(2 * pi() * t / period)) AS BIGINT) AS ay,
                   CAST(round(1e6 * (y - CAST(sy AS DOUBLE) / n)
                        * sin(2 * pi() * t / period)) AS BIGINT) AS by
            FROM t CROSS JOIN tot
            CROSS JOIN UNNEST(generate_series({SPECTRAL_MIN_PERIOD},
                {SPECTRAL_MAX_PERIOD})) AS g(period)
        ),
        per_p AS (
            SELECT period,
                   CAST(SUM(ax) AS HUGEINT) AS sax,
                   CAST(SUM(bx) AS HUGEINT) AS sbx,
                   CAST(SUM(ay) AS HUGEINT) AS say,
                   CAST(SUM(by) AS HUGEINT) AS sby
            FROM terms GROUP BY period
        ),
        cq AS (
            SELECT period, sax * say + sbx * sby AS c,
                   sax * sby - say * sbx AS q
            FROM per_p
        )
        SELECT CAST(period AS BIGINT) AS period,
               CAST(round(CAST(c AS DOUBLE) / 1e12) AS BIGINT) AS co_spectrum,
               CAST(round(CAST(q AS DOUBLE) / 1e12) AS BIGINT) AS quad_spectrum,
               CAST(round(sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
                    + CAST(q AS DOUBLE) * CAST(q AS DOUBLE)) / 1e12)
                   AS BIGINT) AS amp_micro2,
               CAST(CASE WHEN c <> 0 OR q <> 0 THEN
                    round(1000 * atan2(CAST(q AS DOUBLE), CAST(c AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS phase_milli
        FROM cq
        ORDER BY period
    """


# --- Aalen-Johansen competing-risks cumulative incidence ---------------------------------

AJ_HORIZON_DAYS = 14


def aalen_johansen(events: DataFrame, horizon: int = AJ_HORIZON_DAYS) -> DataFrame:
    """Aalen-Johansen cumulative incidence under competing risks after
    signup: cause 1 = first purchase, cause 2 = first error, whichever
    strikes first (ties resolve to purchase), administratively censored
    at ``horizon`` days. One row per event day: (t, n_at_risk,
    d_purchase, d_error, cif_purchase_micro, cif_error_micro).

    kaplan_meier treats conversion as the only exit; with competing
    events, 1-KM per cause OVERSTATES each incidence because it censors
    the competitor as if independent. Aalen-Johansen is the correct
    decomposition: CIF_k(t) = sum_{s<=t} S(s-) * d_k(s)/n(s) with S the
    all-cause product-limit curve, so the causes' CIFs and the overall
    survival partition probability-1 exactly.

    Exactness: day differences and risk sets are exact integers on the
    bounded day grid; S(s-) uses the deterministic exp-of-cumulative-ln
    ladder (the kaplan_meier convention, analytics.py:906); each day's
    CIF increment quantizes to micro before the integer cumulative sum.

    Scale shape: one user-grain signup aggregate, one user-grain
    competing-first aggregate, one bounded day-grid aggregate with three
    sequential windows over the <=horizon+1-row grid."""
    su = events.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    firsts = (
        su.join(
            events.where(F.col("event_type").isin("purchase", "error")).select(
                F.col("user_id").alias("eu"),
                F.col("event_type").alias("etype"),
                F.col("ts").alias("ets"),
            ),
            (F.col("user_id") == F.col("eu")) & (F.col("ets") > F.col("signup_ts")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    F.col("etype") == "purchase",
                    F.datediff(F.to_date("ets"), F.to_date("signup_ts")),
                )
            ).alias("tp"),
            F.min(
                F.when(
                    F.col("etype") == "error",
                    F.datediff(F.to_date("ets"), F.to_date("signup_ts")),
                )
            ).alias("te"),
        )
    )
    timed = firsts.select(
        F.expr(
            f"CAST(CASE WHEN tp IS NOT NULL AND tp <= {horizon}"
            f" AND (te IS NULL OR tp <= te) THEN tp"
            f" WHEN te IS NOT NULL AND te <= {horizon} THEN te"
            f" ELSE {horizon} END AS BIGINT)"
        ).alias("t"),
        F.expr(
            f"CAST(CASE WHEN tp IS NOT NULL AND tp <= {horizon}"
            f" AND (te IS NULL OR tp <= te) THEN 1"
            f" WHEN te IS NOT NULL AND te <= {horizon} THEN 2"
            f" ELSE 0 END AS BIGINT)"
        ).alias("cause"),
    )
    grid = timed.groupBy("t").agg(
        F.count("*").cast("long").alias("m"),
        F.sum((F.col("cause") == 1).cast("long")).cast("long").alias("d1"),
        F.sum((F.col("cause") == 2).cast("long")).cast("long").alias("d2"),
    )
    wrev = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    risk = grid.select(
        "t", "d1", "d2", F.sum("m").over(wrev).cast("long").alias("n")
    )
    d = F.col("d1") + F.col("d2")
    pre = risk.withColumn(
        "lt",
        F.when(
            (F.col("n") > 0) & (d < F.col("n")),
            F.log((F.col("n") - d).cast("double") / F.col("n")),
        ).otherwise(F.lit(0.0e0)),
    ).withColumn("died", ((F.col("n") > 0) & (d == F.col("n"))).cast("int"))
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    curve = pre.select(
        "t",
        "d1",
        "d2",
        "n",
        F.when(F.coalesce(F.max("died").over(wprev), F.lit(0)) == 1, F.lit(0.0e0))
        .otherwise(F.exp(F.coalesce(F.sum("lt").over(wprev), F.lit(0.0e0))))
        .alias("s_prev"),
    )
    incs = curve.select(
        "t",
        F.col("n").alias("n_at_risk"),
        F.col("d1").alias("d_purchase"),
        F.col("d2").alias("d_error"),
        F.expr("CAST(round(1e6 * s_prev * d1 / n) AS BIGINT)").alias("i1"),
        F.expr("CAST(round(1e6 * s_prev * d2 / n) AS BIGINT)").alias("i2"),
    ).where((F.col("d_purchase") + F.col("d_error")) > 0)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return incs.select(
        "t",
        "n_at_risk",
        "d_purchase",
        "d_error",
        F.sum("i1").over(wcum).cast("long").alias("cif_purchase_micro"),
        F.sum("i2").over(wcum).cast("long").alias("cif_error_micro"),
    ).orderBy("t")


def aalen_johansen_sql(horizon: int = AJ_HORIZON_DAYS) -> str:
    return f"""
        WITH su AS (
            SELECT user_id, MIN(ts) AS signup_ts
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id
        ),
        firsts AS (
            SELECT su.user_id,
                   MIN(CASE WHEN etype = 'purchase' THEN
                       date_diff('day', CAST(signup_ts AS DATE),
                                 CAST(ets AS DATE)) END) AS tp,
                   MIN(CASE WHEN etype = 'error' THEN
                       date_diff('day', CAST(signup_ts AS DATE),
                                 CAST(ets AS DATE)) END) AS te
            FROM su LEFT JOIN (
                SELECT user_id AS eu, event_type AS etype, ts AS ets
                FROM events WHERE event_type IN ('purchase', 'error')
            ) e ON su.user_id = eu AND ets > signup_ts
            GROUP BY su.user_id
        ),
        timed AS (
            SELECT CAST(CASE WHEN tp IS NOT NULL AND tp <= {horizon}
                             AND (te IS NULL OR tp <= te) THEN tp
                             WHEN te IS NOT NULL AND te <= {horizon} THEN te
                             ELSE {horizon} END AS BIGINT) AS t,
                   CAST(CASE WHEN tp IS NOT NULL AND tp <= {horizon}
                             AND (te IS NULL OR tp <= te) THEN 1
                             WHEN te IS NOT NULL AND te <= {horizon} THEN 2
                             ELSE 0 END AS BIGINT) AS cause
            FROM firsts
        ),
        grid AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS d1,
                   CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS d2
            FROM timed GROUP BY t
        ),
        risk AS (
            SELECT t, d1, d2,
                   CAST(SUM(m) OVER (ORDER BY t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS n
            FROM grid
        ),
        pre AS (
            SELECT t, d1, d2, n,
                   CASE WHEN n > 0 AND d1 + d2 < n THEN
                        ln(CAST(n - d1 - d2 AS DOUBLE) / n) ELSE 0.0e0 END AS lt,
                   CASE WHEN n > 0 AND d1 + d2 = n THEN 1 ELSE 0 END AS died
            FROM risk
        ),
        curve AS (
            SELECT t, d1, d2, n,
                   CASE WHEN COALESCE(MAX(died) OVER w, 0) = 1 THEN 0.0e0
                        ELSE exp(COALESCE(SUM(lt) OVER w, 0.0e0)) END AS s_prev
            FROM pre
            WINDOW w AS (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        incs AS (
            SELECT t, n AS n_at_risk, d1 AS d_purchase, d2 AS d_error,
                   CAST(round(1e6 * s_prev * d1 / n) AS BIGINT) AS i1,
                   CAST(round(1e6 * s_prev * d2 / n) AS BIGINT) AS i2
            FROM curve
            WHERE d1 + d2 > 0
        )
        SELECT t, n_at_risk, d_purchase, d_error,
               CAST(SUM(i1) OVER wc AS BIGINT) AS cif_purchase_micro,
               CAST(SUM(i2) OVER wc AS BIGINT) AS cif_error_micro
        FROM incs
        WINDOW wc AS (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY t
    """


# --- Gehan-Wilcoxon (generalized Wilcoxon) survival test ---------------------------------

GEHAN_HORIZON_DAYS = 14
GEHAN_GROUP_TYPE = "view"


def gehan_wilcoxon_test(
    events: DataFrame, horizon: int = GEHAN_HORIZON_DAYS
) -> DataFrame:
    """Gehan-Breslow-Wilcoxon test of time-to-first-purchase between
    signup-day viewers and non-viewers: one row (n_users, w_milli,
    z_milli).

    logrank_test weights every event day equally, making it most
    powerful under proportional hazards; Gehan's generalized Wilcoxon
    weights each day by the at-risk count n_t, emphasizing EARLY
    differences — the standard companion verdict when curves cross or
    hazards converge. W = sum_t n_t (d1_t - n1_t d_t / n_t); the n_t^2
    weight cancels one nt^2 in the hypergeometric variance, leaving
    Var = sum_t d_t (n_t - d_t) n1_t n0_t / (n_t - 1).

    Cohort: users with a signup event; group 1 viewed on their signup
    day; follow-up capped at ``horizon`` days (administrative
    censoring), the logrank_test conventions with an independent group
    split so the two tests answer different questions on the fixture.

    Exactness: risk sets are reverse-cumulative integer sums on the
    bounded (group x horizon) grid, densified over the day spine the
    same way in both engines; each day's weighted O-E and variance term
    quantizes to micro (decimal-38 sums) before the <=horizon-row
    reduction; the final z is the one float boundary.

    Scale shape: two user-grain aggregates, one bounded (group, day)
    aggregate with a reverse-cumulative window, one 1-row reduction."""
    d38 = "decimal(38,0)"
    su = events.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    views = (
        events.where(F.col("event_type") == GEHAN_GROUP_TYPE)
        .select(F.col("user_id").alias("vu"), F.to_date("ts").alias("view_day"))
        .distinct()
    )
    grouped = (
        su.join(
            views,
            (F.col("user_id") == F.col("vu"))
            & (F.col("view_day") == F.to_date("signup_ts")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.max((F.col("vu").isNotNull()).cast("int")).alias("g"))
    )
    purch = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    timed = (
        grouped.join(
            purch,
            (F.col("user_id") == F.col("pu")) & (F.col("pts") > F.col("signup_ts")),
            "left",
        )
        .groupBy("user_id", "g")
        .agg(
            F.min(F.datediff(F.to_date("pts"), F.to_date("signup_ts"))).alias(
                "delay"
            )
        )
        .select(
            "g",
            F.expr(
                f"CAST(CASE WHEN delay IS NULL OR delay > {horizon}"
                f" THEN {horizon} ELSE delay END AS BIGINT)"
            ).alias("t"),
            F.expr(
                f"CAST(CASE WHEN delay IS NULL OR delay > {horizon}"
                f" THEN 0 ELSE 1 END AS BIGINT)"
            ).alias("ev"),
        )
    )
    per_gt = timed.groupBy("g", "t").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("ev").cast("long").alias("d"),
    )
    wrev = (
        Window.partitionBy("g")
        .orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = per_gt.select(
        "g", "t", "d", F.sum("m").over(wrev).cast("long").alias("n_at_risk")
    )
    spine = events.sparkSession.range(horizon + 1).select(
        F.col("id").cast("long").alias("t")
    )

    def dense(side, dcol, ncol):
        j = spine.join(side, "t", "left").select(
            "t",
            F.coalesce(dcol, F.lit(0)).cast("long").alias(dcol),
            F.col(ncol),
        )
        wfill = Window.orderBy(F.desc("t")).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return j.select(
            "t",
            dcol,
            F.coalesce(F.max(ncol).over(wfill), F.lit(0))
            .cast("long")
            .alias(ncol),
        )

    g1 = dense(
        risk.where(F.col("g") == 1).select(
            "t", F.col("d").alias("d1"), F.col("n_at_risk").alias("n1")
        ),
        "d1",
        "n1",
    )
    g0 = dense(
        risk.where(F.col("g") == 0).select(
            "t", F.col("d").alias("d0"), F.col("n_at_risk").alias("n0")
        ),
        "d0",
        "n0",
    )
    terms = (
        g1.join(g0, "t")
        .select(
            "t",
            (F.col("d1") + F.col("d0")).alias("dt"),
            (F.col("n1") + F.col("n0")).alias("nt"),
            "d1",
            "n1",
            "n0",
        )
        .where(F.col("dt") > 0)
        .select(
            F.expr(
                "CAST(round(1e6 * nt * (d1 - CAST(n1 AS DOUBLE) * dt / nt))"
                f" AS {d38})"
            ).alias("w_micro"),
            F.expr(
                "CAST(CASE WHEN nt > 1 THEN round(1e6"
                " * CAST(dt AS DOUBLE) * (nt - dt) * n1 * n0 / (nt - 1))"
                f" ELSE 0 END AS {d38})"
            ).alias("v_micro"),
        )
    )
    n_users = timed.agg(F.count("*").cast("long").alias("n_users"))
    agg = terms.agg(
        F.coalesce(F.sum("w_micro"), F.lit(0).cast(d38)).alias("w"),
        F.coalesce(F.sum("v_micro"), F.lit(0).cast(d38)).alias("v"),
    )
    return n_users.crossJoin(F.broadcast(agg)).select(
        "n_users",
        F.expr("CAST(round(CAST(w AS DOUBLE) / 1000.0e0) AS BIGINT)").alias(
            "w_milli"
        ),
        F.expr(
            "CAST(CASE WHEN CAST(v AS DOUBLE) > 0 THEN"
            " round(1000.0e0 * (CAST(w AS DOUBLE) / 1e6)"
            " / sqrt(CAST(v AS DOUBLE) / 1e6)) ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def gehan_wilcoxon_test_sql(horizon: int = GEHAN_HORIZON_DAYS) -> str:
    return f"""
        WITH su AS (
            SELECT user_id, MIN(ts) AS signup_ts
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id
        ),
        views AS (
            SELECT DISTINCT user_id AS vu, CAST(ts AS DATE) AS view_day
            FROM events WHERE event_type = '{GEHAN_GROUP_TYPE}'
        ),
        grouped AS (
            SELECT user_id, signup_ts,
                   MAX(CASE WHEN vu IS NOT NULL THEN 1 ELSE 0 END) AS g
            FROM su LEFT JOIN views
              ON user_id = vu AND view_day = CAST(signup_ts AS DATE)
            GROUP BY user_id, signup_ts
        ),
        timed AS (
            SELECT g,
                   CAST(CASE WHEN delay IS NULL OR delay > {horizon}
                        THEN {horizon} ELSE delay END AS BIGINT) AS t,
                   CAST(CASE WHEN delay IS NULL OR delay > {horizon}
                        THEN 0 ELSE 1 END AS BIGINT) AS ev
            FROM (
                SELECT grouped.user_id, g,
                       MIN(date_diff('day', CAST(signup_ts AS DATE),
                           CAST(pts AS DATE))) AS delay
                FROM grouped LEFT JOIN (
                    SELECT user_id AS pu, ts AS pts
                    FROM events WHERE event_type = 'purchase'
                ) p ON grouped.user_id = pu AND pts > signup_ts
                GROUP BY grouped.user_id, g
            )
        ),
        per_gt AS (
            SELECT g, t, CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(ev) AS BIGINT) AS d
            FROM timed GROUP BY g, t
        ),
        risk AS (
            SELECT g, t, d,
                   CAST(SUM(m) OVER (PARTITION BY g ORDER BY t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS n_at_risk
            FROM per_gt
        ),
        spine AS (
            SELECT CAST(generate_series AS BIGINT) AS t
            FROM generate_series(0, {horizon})
        ),
        d1 AS (
            SELECT t, d1,
                   CAST(COALESCE(MAX(n1) OVER (ORDER BY t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                        0) AS BIGINT) AS n1
            FROM (
                SELECT spine.t, CAST(COALESCE(d, 0) AS BIGINT) AS d1,
                       n_at_risk AS n1
                FROM spine LEFT JOIN (SELECT * FROM risk WHERE g = 1) r
                  ON spine.t = r.t
            )
        ),
        d0 AS (
            SELECT t, d0,
                   CAST(COALESCE(MAX(n0) OVER (ORDER BY t DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                        0) AS BIGINT) AS n0
            FROM (
                SELECT spine.t, CAST(COALESCE(d, 0) AS BIGINT) AS d0,
                       n_at_risk AS n0
                FROM spine LEFT JOIN (SELECT * FROM risk WHERE g = 0) r
                  ON spine.t = r.t
            )
        ),
        terms AS (
            SELECT CAST(round(1e6 * nt * (d1 - CAST(n1 AS DOUBLE) * dt / nt))
                       AS HUGEINT) AS w_micro,
                   CAST(CASE WHEN nt > 1 THEN round(1e6
                        * CAST(dt AS DOUBLE) * (nt - dt) * n1 * n0 / (nt - 1))
                        ELSE 0 END AS HUGEINT) AS v_micro
            FROM (
                SELECT d1.t, d1.d1 + d0.d0 AS dt, d1.n1 + d0.n0 AS nt,
                       d1.d1 AS d1, d1.n1 AS n1, d0.n0 AS n0
                FROM d1 JOIN d0 ON d1.t = d0.t
            )
            WHERE dt > 0
        ),
        agg AS (
            SELECT COALESCE(SUM(w_micro), 0) AS w,
                   COALESCE(SUM(v_micro), 0) AS v
            FROM terms
        ),
        nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM timed)
        SELECT n_users,
               CAST(round(CAST(w AS DOUBLE) / 1000.0e0) AS BIGINT) AS w_milli,
               CAST(CASE WHEN CAST(v AS DOUBLE) > 0 THEN
                    round(1000.0e0 * (CAST(w AS DOUBLE) / 1e6)
                    / sqrt(CAST(v AS DOUBLE) / 1e6)) ELSE 0 END AS BIGINT)
                   AS z_milli
        FROM nu CROSS JOIN agg
    """


# --- Ansari-Bradley rank-based scale test ------------------------------------------------

AB_X_TYPE = "click"
AB_Y_TYPE = "error"


def ansari_bradley_test(events: DataFrame) -> DataFrame:
    """Ansari-Bradley rank test for a SCALE difference between the click
    and error value distributions: one row (n_x, n_y, ab_x2, z_milli).

    levene_test / bartlett_test / brown_forsythe compare variances
    through moments; Ansari-Bradley is the rank-based scale verdict —
    score each observation a(r) = min(r, N+1-r) (the "tent": extremes
    score low, the middle scores high) and sum the scores of sample X.
    A small AB means X occupies the tails (larger scale), immune to the
    moment assumptions the variance tests smuggle in.

    Ties: every observation in a tied block takes the score of the
    block MIDRANK (the documented variant this engine pins; the
    property test's direct reference implements the same rule). Doubled
    scores 2a = min(2r, 2(N+1)-2r) keep everything integer: 2r =
    2*cum_below + block + 1.

    Exactness: scores, the statistic, and the moment sums are exact
    integers (decimal-38) on the centi value grid; the mean/variance
    under the tie-conditional null come from the finite-population
    draw-m-of-N identity Var = m n (N S2 - S1^2) / (N^2 (N-1)) on those
    sums; the final z is the one float boundary.

    Scale shape: one (value) grid aggregate, one cumulative window on
    the bounded grid, one 1-row scalar broadcast, one 1-row reduction."""
    d38 = "decimal(38,0)"
    grid = (
        events.where(
            F.col("value").isNotNull()
            & F.col("event_type").isin(AB_X_TYPE, AB_Y_TYPE)
        )
        .groupBy(F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
        .agg(
            F.sum((F.col("event_type") == AB_X_TYPE).cast("long"))
            .cast("long")
            .alias("mx"),
            F.sum((F.col("event_type") == AB_Y_TYPE).cast("long"))
            .cast("long")
            .alias("my"),
        )
        .withColumn("mt", (F.col("mx") + F.col("my")).cast("long"))
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    cum = grid.withColumn(
        "cumlt", F.coalesce(F.sum("mt").over(w), F.lit(0)).cast("long")
    )
    tot = grid.agg(
        F.sum("mx").cast("long").alias("m"),
        F.sum("my").cast("long").alias("n"),
        F.sum("mt").cast("long").alias("nn"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "mx",
        "my",
        "mt",
        "m",
        "n",
        "nn",
        F.expr(
            "least(2 * cumlt + mt + 1, 2 * (nn + 1) - (2 * cumlt + mt + 1))"
        ).alias("a2"),
    )
    agg = scored.agg(
        F.max("m").alias("m"),
        F.max("n").alias("n"),
        F.max("nn").alias("nn"),
        F.sum(F.col("mx").cast(d38) * F.col("a2").cast(d38)).alias("ab2"),
        F.sum(F.col("mt").cast(d38) * F.col("a2").cast(d38)).alias("s1"),
        F.sum(
            F.col("mt").cast(d38) * F.col("a2").cast(d38) * F.col("a2").cast(d38)
        ).alias("s2"),
    )
    return agg.select(
        F.col("m").alias("n_x"),
        F.col("n").alias("n_y"),
        F.col("ab2").cast("long").alias("ab_x2"),
        F.expr(
            "CAST(CASE WHEN nn > 1 AND m > 0 AND n > 0"
            " AND CAST(nn AS DOUBLE) * CAST(s2 AS DOUBLE)"
            "     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0 THEN"
            " round(1000 * (CAST(ab2 AS DOUBLE)"
            "   - CAST(m AS DOUBLE) * CAST(s1 AS DOUBLE) / nn)"
            " / sqrt(CAST(m AS DOUBLE) * n"
            "   * (CAST(nn AS DOUBLE) * CAST(s2 AS DOUBLE)"
            "      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
            "   / (CAST(nn AS DOUBLE) * nn * (nn - 1))))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def ansari_bradley_test_sql() -> str:
    return f"""
        WITH grid AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN event_type = '{AB_X_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS mx,
                   CAST(SUM(CASE WHEN event_type = '{AB_Y_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS my
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('{AB_X_TYPE}', '{AB_Y_TYPE}')
            GROUP BY 1
        ),
        cum AS (
            SELECT c, mx, my, mx + my AS mt,
                   CAST(COALESCE(SUM(mx + my) OVER (ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS cumlt
            FROM grid
        ),
        tot AS (
            SELECT CAST(SUM(mx) AS BIGINT) AS m,
                   CAST(SUM(my) AS BIGINT) AS n,
                   CAST(SUM(mx + my) AS BIGINT) AS nn
            FROM grid
        ),
        scored AS (
            SELECT mx, my, mt, m, n, nn,
                   LEAST(2 * cumlt + mt + 1,
                         2 * (nn + 1) - (2 * cumlt + mt + 1)) AS a2
            FROM cum CROSS JOIN tot
        ),
        agg AS (
            SELECT MAX(m) AS m, MAX(n) AS n, MAX(nn) AS nn,
                   SUM(CAST(mx AS HUGEINT) * a2) AS ab2,
                   SUM(CAST(mt AS HUGEINT) * a2) AS s1,
                   SUM(CAST(mt AS HUGEINT) * a2 * a2) AS s2
            FROM scored
        )
        SELECT m AS n_x, n AS n_y,
               CAST(ab2 AS BIGINT) AS ab_x2,
               CAST(CASE WHEN nn > 1 AND m > 0 AND n > 0
                    AND CAST(nn AS DOUBLE) * CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0 THEN
                    round(1000 * (CAST(ab2 AS DOUBLE)
                      - CAST(m AS DOUBLE) * CAST(s1 AS DOUBLE) / nn)
                    / sqrt(CAST(m AS DOUBLE) * n
                      * (CAST(nn AS DOUBLE) * CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      / (CAST(nn AS DOUBLE) * nn * (nn - 1))))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM agg
    """


# --- Cramer-von Mises two-sample test ----------------------------------------------------

CVM_X_TYPE = "click"
CVM_Y_TYPE = "error"


def cvm_two_sample_test(events: DataFrame) -> DataFrame:
    """Two-sample Cramer-von Mises test between the click and error value
    distributions: one row (n_x, n_y, t_micro, z_milli).

    ks_drift compares the two ECDFs at their single worst point; the CvM
    statistic integrates the SQUARED ECDF gap over the whole support, so
    diffuse distributional drift that never produces one large gap still
    registers. Rank form (Anderson 1962): with r_i the overall ranks of
    sample X and s_j of sample Y, U = m sum_i (r_i - i)^2 +
    n sum_j (s_j - j)^2 and T = U/(N m n) - (4mn - 1)/(6N).

    Ties: every observation in a tied block takes the block MIDRANK for
    both its overall rank and its within-sample index (the engine's
    pinned variant; the property test's direct reference implements the
    same rule). Doubled ranks keep the squared differences integer:
    (2r - 2i) is even-safe integer arithmetic on the centi grid.

    Exactness: U accumulates as exact decimal-38 integers (4U exactly);
    the null mean E[T] = (N+1)/(6N) and Anderson's variance
    (N+1) (4mnN - 3(m^2+n^2) - 2mn) / (45 N^2 4mn) assemble in one
    double chain at the 1-row boundary.

    Scale shape: one (value) grid aggregate, one cumulative window on
    the bounded grid, one 1-row reduction."""
    d38 = "decimal(38,0)"
    grid = (
        events.where(
            F.col("value").isNotNull()
            & F.col("event_type").isin(CVM_X_TYPE, CVM_Y_TYPE)
        )
        .groupBy(F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
        .agg(
            F.sum((F.col("event_type") == CVM_X_TYPE).cast("long"))
            .cast("long")
            .alias("mx"),
            F.sum((F.col("event_type") == CVM_Y_TYPE).cast("long"))
            .cast("long")
            .alias("my"),
        )
        .withColumn("mt", (F.col("mx") + F.col("my")).cast("long"))
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    cum = grid.select(
        "c",
        "mx",
        "my",
        "mt",
        F.coalesce(F.sum("mt").over(w), F.lit(0)).cast("long").alias("cumt"),
        F.coalesce(F.sum("mx").over(w), F.lit(0)).cast("long").alias("cumx"),
        F.coalesce(F.sum("my").over(w), F.lit(0)).cast("long").alias("cumy"),
    )
    diffs = cum.select(
        "mx",
        "my",
        ((2 * F.col("cumt") + F.col("mt") + 1)
         - (2 * F.col("cumx") + F.col("mx") + 1)).alias("dx"),
        ((2 * F.col("cumt") + F.col("mt") + 1)
         - (2 * F.col("cumy") + F.col("my") + 1)).alias("dy"),
    )
    agg = diffs.agg(
        F.sum("mx").cast("long").alias("m"),
        F.sum("my").cast("long").alias("n"),
        F.sum(
            F.col("mx").cast(d38) * F.col("dx").cast(d38) * F.col("dx").cast(d38)
        ).alias("u4x"),
        F.sum(
            F.col("my").cast(d38) * F.col("dy").cast(d38) * F.col("dy").cast(d38)
        ).alias("u4y"),
    )
    return agg.select(
        F.col("m").alias("n_x"),
        F.col("n").alias("n_y"),
        F.expr(
            "CAST(CASE WHEN m > 0 AND n > 0 THEN round(1e6 * ("
            " (CAST(m AS DOUBLE) * CAST(u4x AS DOUBLE)"
            "  + CAST(n AS DOUBLE) * CAST(u4y AS DOUBLE)) / 4.0e0"
            " / (CAST(m + n AS DOUBLE) * m * n)"
            " - (4.0e0 * m * n - 1) / (6.0e0 * (m + n))))"
            " ELSE 0 END AS BIGINT)"
        ).alias("t_micro"),
        F.expr(
            "CAST(CASE WHEN m > 0 AND n > 0"
            " AND 4.0e0 * m * n * (m + n) - 3.0e0 * (CAST(m AS DOUBLE) * m"
            "     + CAST(n AS DOUBLE) * n) - 2.0e0 * m * n > 0 THEN"
            " round(1000 * (("
            "  (CAST(m AS DOUBLE) * CAST(u4x AS DOUBLE)"
            "   + CAST(n AS DOUBLE) * CAST(u4y AS DOUBLE)) / 4.0e0"
            "  / (CAST(m + n AS DOUBLE) * m * n)"
            "  - (4.0e0 * m * n - 1) / (6.0e0 * (m + n)))"
            "  - (CAST(m + n AS DOUBLE) + 1) / (6.0e0 * (m + n)))"
            " / sqrt((CAST(m + n AS DOUBLE) + 1)"
            "   * (4.0e0 * m * n * (m + n) - 3.0e0 * (CAST(m AS DOUBLE) * m"
            "      + CAST(n AS DOUBLE) * n) - 2.0e0 * m * n)"
            "   / (45.0e0 * CAST(m + n AS DOUBLE) * (m + n) * 4.0e0 * m * n)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("z_milli"),
    )


def cvm_two_sample_test_sql() -> str:
    return f"""
        WITH grid AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN event_type = '{CVM_X_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS mx,
                   CAST(SUM(CASE WHEN event_type = '{CVM_Y_TYPE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS my
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('{CVM_X_TYPE}', '{CVM_Y_TYPE}')
            GROUP BY 1
        ),
        cum AS (
            SELECT c, mx, my, mx + my AS mt,
                   CAST(COALESCE(SUM(mx + my) OVER w, 0) AS BIGINT) AS cumt,
                   CAST(COALESCE(SUM(mx) OVER w, 0) AS BIGINT) AS cumx,
                   CAST(COALESCE(SUM(my) OVER w, 0) AS BIGINT) AS cumy
            FROM grid
            WINDOW w AS (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        diffs AS (
            SELECT mx, my,
                   (2 * cumt + mt + 1) - (2 * cumx + mx + 1) AS dx,
                   (2 * cumt + mt + 1) - (2 * cumy + my + 1) AS dy
            FROM cum
        ),
        agg AS (
            SELECT CAST(SUM(mx) AS BIGINT) AS m,
                   CAST(SUM(my) AS BIGINT) AS n,
                   SUM(CAST(mx AS HUGEINT) * dx * dx) AS u4x,
                   SUM(CAST(my AS HUGEINT) * dy * dy) AS u4y
            FROM diffs
        )
        SELECT m AS n_x, n AS n_y,
               CAST(CASE WHEN m > 0 AND n > 0 THEN round(1e6 * (
                    (CAST(m AS DOUBLE) * CAST(u4x AS DOUBLE)
                     + CAST(n AS DOUBLE) * CAST(u4y AS DOUBLE)) / 4.0e0
                    / (CAST(m + n AS DOUBLE) * m * n)
                    - (4.0e0 * m * n - 1) / (6.0e0 * (m + n))))
                    ELSE 0 END AS BIGINT) AS t_micro,
               CAST(CASE WHEN m > 0 AND n > 0
                    AND 4.0e0 * m * n * (m + n) - 3.0e0 * (CAST(m AS DOUBLE) * m
                        + CAST(n AS DOUBLE) * n) - 2.0e0 * m * n > 0 THEN
                    round(1000 * ((
                     (CAST(m AS DOUBLE) * CAST(u4x AS DOUBLE)
                      + CAST(n AS DOUBLE) * CAST(u4y AS DOUBLE)) / 4.0e0
                     / (CAST(m + n AS DOUBLE) * m * n)
                     - (4.0e0 * m * n - 1) / (6.0e0 * (m + n)))
                     - (CAST(m + n AS DOUBLE) + 1) / (6.0e0 * (m + n)))
                    / sqrt((CAST(m + n AS DOUBLE) + 1)
                      * (4.0e0 * m * n * (m + n) - 3.0e0 * (CAST(m AS DOUBLE) * m
                         + CAST(n AS DOUBLE) * n) - 2.0e0 * m * n)
                      / (45.0e0 * CAST(m + n AS DOUBLE) * (m + n)
                         * 4.0e0 * m * n)))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM agg
    """


# --- Kendall's W (coefficient of concordance) --------------------------------------------


def kendall_w_daily(events: DataFrame) -> DataFrame:
    """Kendall's W — do the event types agree on which days are busy?
    One row (k_judges, n_days, w_micro, chi2_milli).

    spearman_daily correlates TWO series; Kendall's W is the k-judge
    generalization: each event type ranks the days by its daily count,
    and W in [0,1] measures how concordant the k rankings are (W=1:
    every type peaks on the same days; W~0: independent load shapes).
    Tie-corrected form: W = 12 S / (k^2 (n^3 - n) - k sum_j T_j) with
    S = sum_i (R_i - k(n+1)/2)^2 and T_j = sum(t^3 - t) over judge j's
    tie blocks; chi2_r = k (n-1) W is the Friedman-equivalent verdict.

    Ranks are MIDRANKS on the dense (type x day) grid — days a type
    never fired on enter as zero counts (a judge that skips a day still
    ranks it, lowest), densified identically in both engines via the
    distinct-days x distinct-types cross of two tiny post-aggregate
    relations. Doubled ranks 2r = 2 cum_below + block + 1 and doubled
    rank sums keep S exact: 4S = sum_i (R2_i - k(n+1))^2 in decimal-38.

    Scale shape: one (type, day) aggregate, one bounded grid densify
    (broadcast cross of two aggregates), one per-type rank window on
    the (type, count) grid, two bounded reductions."""
    d38 = "decimal(38,0)"
    td = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    types = td.select("event_type").distinct()
    days = td.select("day").distinct()
    dense = (
        types.crossJoin(F.broadcast(days))
        .join(td, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
        )
    )
    cells = dense.groupBy("event_type", "cnt").agg(
        F.count("*").cast("long").alias("tcnt")
    )
    wr = (
        Window.partitionBy("event_type")
        .orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked_cells = cells.select(
        "event_type",
        "cnt",
        "tcnt",
        (
            F.coalesce(F.sum("tcnt").over(wr), F.lit(0)) * 2
            + F.col("tcnt")
            + 1
        )
        .cast("long")
        .alias("r2"),
    )
    ranked = dense.join(ranked_cells, ["event_type", "cnt"]).select("day", "r2")
    rsum = ranked.groupBy("day").agg(F.sum("r2").cast("long").alias("r2sum"))
    kn = dense.agg(
        F.count_distinct("event_type").cast("long").alias("k"),
        F.count_distinct("day").cast("long").alias("n"),
    )
    s4 = (
        rsum.crossJoin(F.broadcast(kn))
        .select(
            (
                (F.col("r2sum") - F.col("k") * (F.col("n") + 1)).cast(d38)
                * (F.col("r2sum") - F.col("k") * (F.col("n") + 1)).cast(d38)
            ).alias("sq")
        )
        .agg(F.sum("sq").alias("s4"))
    )
    ties = ranked_cells.agg(
        F.sum(
            F.col("tcnt").cast(d38) * F.col("tcnt").cast(d38) * F.col("tcnt").cast(d38)
            - F.col("tcnt").cast(d38)
        ).alias("tsum")
    )
    return (
        kn.crossJoin(F.broadcast(s4))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("k").alias("k_judges"),
            F.col("n").alias("n_days"),
            F.expr(
                "CAST(CASE WHEN CAST(k AS DOUBLE) * k"
                " * (CAST(n AS DOUBLE) * n * n - n)"
                " - k * CAST(tsum AS DOUBLE) > 0 THEN"
                " round(1e6 * 3.0e0 * CAST(s4 AS DOUBLE)"
                " / (CAST(k AS DOUBLE) * k * (CAST(n AS DOUBLE) * n * n - n)"
                "    - k * CAST(tsum AS DOUBLE)))"
                " ELSE 0 END AS BIGINT)"
            ).alias("w_micro"),
            F.expr(
                "CAST(CASE WHEN CAST(k AS DOUBLE) * k"
                " * (CAST(n AS DOUBLE) * n * n - n)"
                " - k * CAST(tsum AS DOUBLE) > 0 THEN"
                " round(1000 * k * (n - 1) * 3.0e0 * CAST(s4 AS DOUBLE)"
                " / (CAST(k AS DOUBLE) * k * (CAST(n AS DOUBLE) * n * n - n)"
                "    - k * CAST(tsum AS DOUBLE)))"
                " ELSE 0 END AS BIGINT)"
            ).alias("chi2_milli"),
        )
    )


def kendall_w_daily_sql() -> str:
    return """
        WITH td AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        dense AS (
            SELECT t.event_type, d.day, COALESCE(td.cnt, 0) AS cnt
            FROM (SELECT DISTINCT event_type FROM td) t
            CROSS JOIN (SELECT DISTINCT day FROM td) d
            LEFT JOIN td ON td.event_type = t.event_type AND td.day = d.day
        ),
        cells AS (
            SELECT event_type, cnt, CAST(COUNT(*) AS BIGINT) AS tcnt
            FROM dense GROUP BY 1, 2
        ),
        ranked_cells AS (
            SELECT event_type, cnt, tcnt,
                   CAST(COALESCE(SUM(tcnt) OVER (PARTITION BY event_type
                        ORDER BY cnt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) * 2 + tcnt + 1 AS BIGINT) AS r2
            FROM cells
        ),
        ranked AS (
            SELECT dense.day, r2
            FROM dense JOIN ranked_cells
              ON dense.event_type = ranked_cells.event_type
             AND dense.cnt = ranked_cells.cnt
        ),
        rsum AS (
            SELECT day, CAST(SUM(r2) AS BIGINT) AS r2sum
            FROM ranked GROUP BY day
        ),
        kn AS (
            SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
                   CAST(COUNT(DISTINCT day) AS BIGINT) AS n
            FROM dense
        ),
        s4 AS (
            SELECT SUM(CAST(r2sum - k * (n + 1) AS HUGEINT)
                       * CAST(r2sum - k * (n + 1) AS HUGEINT)) AS s4
            FROM rsum CROSS JOIN kn
        ),
        ties AS (
            SELECT SUM(CAST(tcnt AS HUGEINT) * tcnt * tcnt - tcnt) AS tsum
            FROM ranked_cells
        )
        SELECT k AS k_judges, n AS n_days,
               CAST(CASE WHEN CAST(k AS DOUBLE) * k
                    * (CAST(n AS DOUBLE) * n * n - n)
                    - k * CAST(tsum AS DOUBLE) > 0 THEN
                    round(1e6 * 3.0e0 * CAST(s4 AS DOUBLE)
                    / (CAST(k AS DOUBLE) * k * (CAST(n AS DOUBLE) * n * n - n)
                       - k * CAST(tsum AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS w_micro,
               CAST(CASE WHEN CAST(k AS DOUBLE) * k
                    * (CAST(n AS DOUBLE) * n * n - n)
                    - k * CAST(tsum AS DOUBLE) > 0 THEN
                    round(1000 * k * (n - 1) * 3.0e0 * CAST(s4 AS DOUBLE)
                    / (CAST(k AS DOUBLE) * k * (CAST(n AS DOUBLE) * n * n - n)
                       - k * CAST(tsum AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS chi2_milli
        FROM kn CROSS JOIN s4 CROSS JOIN ties
    """


# --- Quade test (weighted within-block ranks) ---------------------------------------------


def quade_test_daily(events: DataFrame) -> DataFrame:
    """Quade test for treatment differences across blocked observations —
    days are blocks, event types are treatments, daily counts the
    response: one row (n_blocks, k_treatments, f_milli).

    friedman_test ranks within blocks and weighs every block equally;
    Quade additionally weights each block by the RANK OF ITS RANGE, so
    days where the types genuinely diverge dominate — the more powerful
    choice for small k. S_ij = Q_i (r_ij - (k+1)/2), F = (n-1) B /
    (A - B) with A = sum S_ij^2, B = sum_j S_j^2 / n; F is NULL when
    A = B (perfect agreement saturates the statistic).

    Integer form: with doubled midranks 2r and doubled block-range
    ranks 2Q, 4 S_ij = 2Q (2r - (k+1)) is exact; 16A and 16nB
    accumulate in decimal-38, and F = (n-1) sum S4_j^2 /
    (n sum S4_ij^2 - sum S4_j^2) needs no dequantization at all.

    Scale shape: one (type, day) aggregate, the bounded grid densify,
    one per-day range aggregate, two midrank windows on bounded grids,
    two bounded reductions."""
    d38 = "decimal(38,0)"
    td = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    types = td.select("event_type").distinct()
    days = td.select("day").distinct()
    dense = (
        types.crossJoin(F.broadcast(days))
        .join(td, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
        )
    )
    # within-block (per-day) midranks of the k treatments
    bcells = dense.groupBy("day", "cnt").agg(
        F.count("*").cast("long").alias("tcnt")
    )
    wb = (
        Window.partitionBy("day")
        .orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    branks = bcells.select(
        "day",
        "cnt",
        (
            F.coalesce(F.sum("tcnt").over(wb), F.lit(0)) * 2
            + F.col("tcnt")
            + 1
        )
        .cast("long")
        .alias("r2"),
    )
    # block ranges, then midranks of the ranges across blocks
    ranges = dense.groupBy("day").agg(
        (F.max("cnt") - F.min("cnt")).cast("long").alias("rng")
    )
    rcells = ranges.groupBy("rng").agg(F.count("*").cast("long").alias("tcnt"))
    wq = Window.orderBy("rng").rowsBetween(Window.unboundedPreceding, -1)
    qranks = rcells.select(
        "rng",
        (
            F.coalesce(F.sum("tcnt").over(wq), F.lit(0)) * 2
            + F.col("tcnt")
            + 1
        )
        .cast("long")
        .alias("q2"),
    )
    qd = ranges.join(qranks, "rng").select("day", "q2")
    kn = dense.agg(
        F.count_distinct("event_type").cast("long").alias("k"),
        F.count_distinct("day").cast("long").alias("n"),
    )
    sij = (
        dense.join(branks, ["day", "cnt"])
        .join(qd, "day")
        .crossJoin(F.broadcast(kn))
        .select(
            "event_type",
            (F.col("q2").cast(d38)
             * (F.col("r2") - (F.col("k") + 1)).cast(d38)).alias("s4"),
            "k",
            "n",
        )
    )
    a16 = sij.agg(F.sum(F.col("s4") * F.col("s4")).alias("a16"))
    sj = sij.groupBy("event_type").agg(F.sum("s4").alias("s4j"))
    b16n = sj.agg(F.sum(F.col("s4j") * F.col("s4j")).alias("b16n"))
    return (
        kn.crossJoin(F.broadcast(a16))
        .crossJoin(F.broadcast(b16n))
        .select(
            F.col("n").alias("n_blocks"),
            F.col("k").alias("k_treatments"),
            F.expr(
                "CAST(CASE WHEN CAST(n AS DOUBLE) * CAST(a16 AS DOUBLE)"
                " - CAST(b16n AS DOUBLE) > 0 THEN"
                " round(1000 * (n - 1) * CAST(b16n AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * CAST(a16 AS DOUBLE)"
                "    - CAST(b16n AS DOUBLE)))"
                " ELSE NULL END AS BIGINT)"
            ).alias("f_milli"),
        )
    )


def quade_test_daily_sql() -> str:
    return """
        WITH td AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        dense AS (
            SELECT t.event_type, d.day, COALESCE(td.cnt, 0) AS cnt
            FROM (SELECT DISTINCT event_type FROM td) t
            CROSS JOIN (SELECT DISTINCT day FROM td) d
            LEFT JOIN td ON td.event_type = t.event_type AND td.day = d.day
        ),
        bcells AS (
            SELECT day, cnt, CAST(COUNT(*) AS BIGINT) AS tcnt
            FROM dense GROUP BY 1, 2
        ),
        branks AS (
            SELECT day, cnt,
                   CAST(COALESCE(SUM(tcnt) OVER (PARTITION BY day
                        ORDER BY cnt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) * 2 + tcnt + 1 AS BIGINT) AS r2
            FROM bcells
        ),
        ranges AS (
            SELECT day, CAST(MAX(cnt) - MIN(cnt) AS BIGINT) AS rng
            FROM dense GROUP BY day
        ),
        rcells AS (
            SELECT rng, CAST(COUNT(*) AS BIGINT) AS tcnt
            FROM ranges GROUP BY rng
        ),
        qranks AS (
            SELECT rng,
                   CAST(COALESCE(SUM(tcnt) OVER (ORDER BY rng
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) * 2 + tcnt + 1 AS BIGINT) AS q2
            FROM rcells
        ),
        qd AS (
            SELECT day, q2 FROM ranges JOIN qranks ON ranges.rng = qranks.rng
        ),
        kn AS (
            SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
                   CAST(COUNT(DISTINCT day) AS BIGINT) AS n
            FROM dense
        ),
        sij AS (
            SELECT dense.event_type,
                   CAST(q2 AS HUGEINT) * (r2 - (k + 1)) AS s4,
                   k, n
            FROM dense
            JOIN branks ON dense.day = branks.day AND dense.cnt = branks.cnt
            JOIN qd ON dense.day = qd.day
            CROSS JOIN kn
        ),
        a16 AS (SELECT SUM(s4 * s4) AS a16 FROM sij),
        sj AS (
            SELECT event_type, SUM(s4) AS s4j FROM sij GROUP BY event_type
        ),
        b16n AS (SELECT SUM(s4j * s4j) AS b16n FROM sj)
        SELECT n AS n_blocks, k AS k_treatments,
               CAST(CASE WHEN CAST(n AS DOUBLE) * CAST(a16 AS DOUBLE)
                    - CAST(b16n AS DOUBLE) > 0 THEN
                    round(1000 * (n - 1) * CAST(b16n AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(a16 AS DOUBLE)
                       - CAST(b16n AS DOUBLE)))
                    ELSE NULL END AS BIGINT) AS f_milli
        FROM kn CROSS JOIN a16 CROSS JOIN b16n
    """


# --- Lomb-Scargle periodogram (irregular sampling) ----------------------------------------

LOMB_TYPE = "click"
LOMB_MIN_PERIOD = 2
LOMB_MAX_PERIOD = 14


def lomb_scargle_daily(events: DataFrame) -> DataFrame:
    """Lomb-Scargle normalized periodogram of the daily MEAN click value
    at candidate periods 2..14 days: rows (period, n_days, power_micro).

    spectral_periodogram projects onto sin/cos over a row-numbered dense
    grid — correct only for regular sampling. Lomb-Scargle is the
    estimator for IRREGULAR sampling: days without clicks are genuinely
    absent (not zero), t is the real calendar offset, and the per-
    frequency phase shift tau (tan 2wt = S_sin2/S_cos2) restores the
    orthogonality the missing days break. Power is in the classical
    normalization P = [A^2/CC + B^2/SS] / (2 sigma^2).

    Exactness: day offsets are exact integers from the min-day scalar;
    each projection term quantizes to micro before its integer sum (the
    cross_spectrum_daily discipline); tau, the shifted projections, and
    the final power assemble in one double chain per bounded period row.

    Scale shape: one (day) aggregate, one 1-row scalar broadcast, one
    bounded 13 x |days| explode, one (period) reduction."""
    d38 = "decimal(38,0)"
    daily = (
        events.where(
            (F.col("event_type") == LOMB_TYPE) & F.col("value").isNotNull()
        )
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("s"),
            F.count("*").cast("long").alias("c"),
        )
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.min("day").alias("day0"),
        # grand mean of the daily means, micro-quantized per day for an
        # exact scalar both engines share
        F.sum(
            F.expr("CAST(round(1e4 * s / c) AS BIGINT)")
        ).cast("long").alias("ybar_sum_micro"),
    )
    base = daily.crossJoin(F.broadcast(tot)).select(
        F.datediff("day", "day0").cast("long").alias("t"),
        "s",
        "c",
        "n",
        F.expr(
            "CAST(round(1e4 * s / c) AS BIGINT) - ybar_sum_micro / CAST(n AS DOUBLE)"
        ).alias("yc_micro"),
    )
    terms = base.select(
        "n",
        "yc_micro",
        "t",
        F.explode(
            F.sequence(F.lit(LOMB_MIN_PERIOD), F.lit(LOMB_MAX_PERIOD))
        ).alias("period"),
    ).select(
        "period",
        "n",
        F.expr(
            "CAST(round(yc_micro * cos(2 * pi() * t / period)) AS BIGINT)"
        ).alias("yct"),
        F.expr(
            "CAST(round(yc_micro * sin(2 * pi() * t / period)) AS BIGINT)"
        ).alias("yst"),
        F.expr(
            "CAST(round(1e6 * cos(4 * pi() * t / period)) AS BIGINT)"
        ).alias("c2t"),
        F.expr(
            "CAST(round(1e6 * sin(4 * pi() * t / period)) AS BIGINT)"
        ).alias("s2t"),
        F.expr(
            "CAST(round(yc_micro / 1e2) * CAST(round(yc_micro / 1e2) AS BIGINT)"
            " AS BIGINT)"
        ).alias("yy"),
    )
    per_p = terms.groupBy("period").agg(
        F.max("n").alias("n"),
        F.sum(F.col("yct").cast(d38)).alias("syc"),
        F.sum(F.col("yst").cast(d38)).alias("sys"),
        F.sum(F.col("c2t").cast(d38)).alias("sc2"),
        F.sum(F.col("s2t").cast(d38)).alias("ss2"),
        F.sum(F.col("yy").cast(d38)).alias("syy"),
    )
    staged = per_p.select(
        F.col("period").cast("long").alias("period"),
        "n",
        F.expr(
            "cos(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)) / 2)"
            " * CAST(syc AS DOUBLE)"
            " + sin(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)) / 2)"
            " * CAST(sys AS DOUBLE)"
        ).alias("aa"),
        F.expr(
            "cos(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)) / 2)"
            " * CAST(sys AS DOUBLE)"
            " - sin(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)) / 2)"
            " * CAST(syc AS DOUBLE)"
        ).alias("bb"),
        F.expr(
            "(n + cos(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)))"
            " * CAST(sc2 AS DOUBLE) / 1e6"
            " + sin(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)))"
            " * CAST(ss2 AS DOUBLE) / 1e6) / 2"
        ).alias("cc"),
        F.expr(
            "(n - cos(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)))"
            " * CAST(sc2 AS DOUBLE) / 1e6"
            " - sin(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)))"
            " * CAST(ss2 AS DOUBLE) / 1e6) / 2"
        ).alias("ss"),
        F.expr("CAST(syy AS DOUBLE) * 1e4").alias("syy2"),
    )
    # a degenerate component (SS = 0 at the Nyquist period 2 under
    # integer-day sampling) contributes nothing rather than NaN
    return staged.select(
        "period",
        F.col("n").alias("n_days"),
        F.expr(
            "CAST(CASE WHEN n > 1 AND syy2 > 0 THEN round(1e6 *"
            " ((CASE WHEN cc > 1e-9 THEN aa * aa / cc ELSE 0e0 END)"
            "  + (CASE WHEN ss > 1e-9 THEN bb * bb / ss ELSE 0e0 END))"
            " / (2e0 * (syy2 / (n - 1)))) ELSE NULL END AS BIGINT)"
        ).alias("power_micro"),
    ).orderBy("period")


def lomb_scargle_daily_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS s,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events
            WHERE event_type = '{LOMB_TYPE}' AND value IS NOT NULL
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(day) AS day0,
                   CAST(SUM(CAST(round(1e4 * s / c) AS BIGINT)) AS BIGINT)
                       AS ybar_sum_micro
            FROM daily
        ),
        base AS (
            SELECT CAST(date_diff('day', day0, day) AS BIGINT) AS t, n,
                   CAST(round(1e4 * s / c) AS BIGINT)
                       - ybar_sum_micro / CAST(n AS DOUBLE) AS yc_micro
            FROM daily CROSS JOIN tot
        ),
        terms AS (
            SELECT period, n,
                   CAST(round(yc_micro * cos(2 * pi() * t / period))
                       AS BIGINT) AS yct,
                   CAST(round(yc_micro * sin(2 * pi() * t / period))
                       AS BIGINT) AS yst,
                   CAST(round(1e6 * cos(4 * pi() * t / period)) AS BIGINT)
                       AS c2t,
                   CAST(round(1e6 * sin(4 * pi() * t / period)) AS BIGINT)
                       AS s2t,
                   CAST(round(yc_micro / 1e2)
                        * CAST(round(yc_micro / 1e2) AS BIGINT) AS BIGINT)
                       AS yy
            FROM base
            CROSS JOIN (
                SELECT CAST(generate_series AS BIGINT) AS period
                FROM generate_series({LOMB_MIN_PERIOD}, {LOMB_MAX_PERIOD})
            )
        ),
        per_p AS (
            SELECT period, MAX(n) AS n,
                   SUM(CAST(yct AS HUGEINT)) AS syc,
                   SUM(CAST(yst AS HUGEINT)) AS sys,
                   SUM(CAST(c2t AS HUGEINT)) AS sc2,
                   SUM(CAST(s2t AS HUGEINT)) AS ss2,
                   SUM(CAST(yy AS HUGEINT)) AS syy
            FROM terms GROUP BY period
        )
        , staged AS (
            SELECT CAST(period AS BIGINT) AS period, n,
                   cos(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)) / 2)
                     * CAST(syc AS DOUBLE)
                   + sin(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)) / 2)
                     * CAST(sys AS DOUBLE) AS aa,
                   cos(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)) / 2)
                     * CAST(sys AS DOUBLE)
                   - sin(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)) / 2)
                     * CAST(syc AS DOUBLE) AS bb,
                   (n + cos(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)))
                     * CAST(sc2 AS DOUBLE) / 1e6
                   + sin(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)))
                     * CAST(ss2 AS DOUBLE) / 1e6) / 2 AS cc,
                   (n - cos(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)))
                     * CAST(sc2 AS DOUBLE) / 1e6
                   - sin(atan2(CAST(ss2 AS DOUBLE), CAST(sc2 AS DOUBLE)))
                     * CAST(ss2 AS DOUBLE) / 1e6) / 2 AS ss,
                   CAST(syy AS DOUBLE) * 1e4 AS syy2
            FROM per_p
        )
        SELECT period, n AS n_days,
               CAST(CASE WHEN n > 1 AND syy2 > 0 THEN round(1e6 *
                    ((CASE WHEN cc > 1e-9 THEN aa * aa / cc ELSE 0e0 END)
                     + (CASE WHEN ss > 1e-9 THEN bb * bb / ss ELSE 0e0 END))
                    / (2e0 * (syy2 / (n - 1)))) ELSE NULL END AS BIGINT)
                   AS power_micro
        FROM staged
        ORDER BY period
    """


# --- Allan variance of the hourly event rate ----------------------------------------------

ALLAN_TAUS = (1, 2, 4, 8)


def allan_variance_hourly(events: DataFrame) -> DataFrame:
    """Allan variance of the hourly event count at averaging windows tau
    in {1, 2, 4, 8} hours: rows (tau_hours, m_bins, avar_micro).

    events_daily_volatility measures dispersion at ONE timescale; the
    Allan deviation curve is the frequency-stability diagnostic — how
    the variance of adjacent-window averages decays as the window
    grows. White noise falls as 1/tau; a flat or rising tail exposes
    drift/flicker that a single-scale variance cannot see. AVAR(tau) =
    sum (ybar_{i+1} - ybar_i)^2 / (2 (M-1)), non-overlapping bins.

    Exactness: hourly counts live on the dense hour spine (zero hours
    count — absence of traffic IS the signal here, unlike the Lomb
    case); with integer bin sums s_i, AVAR = sum (s_{i+1} - s_i)^2 /
    (2 (M-1) tau^2) is exact integer arithmetic until the one final
    division.

    Scale shape: one (hour) aggregate, one bounded spine densify from a
    1-row min/max scalar, one 4 x |hours| explode, one (tau, bin)
    aggregate with a lead window per tau, one 4-row reduction."""
    d38 = "decimal(38,0)"
    hourly = events.groupBy(
        F.expr("CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT)").alias("h")
    ).agg(F.count("*").cast("long").alias("c"))
    bounds = hourly.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.col("h1") - F.col("h0"))).alias("idx"),
        "h0",
    )
    dense = spine.join(
        hourly, spine.idx + F.col("h0") == hourly.h, "left"
    ).select("idx", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    taus = dense.select(
        "idx",
        "c",
        F.explode(F.array(*[F.lit(t) for t in ALLAN_TAUS])).alias("tau"),
    )
    bins = (
        taus.groupBy("tau", (F.col("idx") / F.col("tau")).cast("long").alias("b"))
        .agg(F.count("*").cast("long").alias("nh"), F.sum("c").cast("long").alias("s"))
        .where(F.col("nh") == F.col("tau"))
    )
    wlead = Window.partitionBy("tau").orderBy("b")
    diffs = bins.select(
        "tau",
        (F.lead("s").over(wlead) - F.col("s")).alias("d"),
    ).where(F.col("d").isNotNull())
    agg = diffs.groupBy("tau").agg(
        F.count("*").cast("long").alias("pairs"),
        F.sum(F.col("d").cast(d38) * F.col("d").cast(d38)).alias("sd2"),
    )
    return agg.select(
        F.col("tau").cast("long").alias("tau_hours"),
        (F.col("pairs") + 1).cast("long").alias("m_bins"),
        F.expr(
            "CAST(CASE WHEN pairs > 0 THEN round(1e6 * CAST(sd2 AS DOUBLE)"
            " / (2e0 * pairs * tau * tau)) ELSE NULL END AS BIGINT)"
        ).alias("avar_micro"),
    ).orderBy("tau_hours")


def allan_variance_hourly_sql() -> str:
    tau_values = ", ".join(f"({t})" for t in ALLAN_TAUS)
    return f"""
        WITH hourly AS (
            SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
        spine AS (
            SELECT CAST(unnest(generate_series(0, h1 - h0)) AS BIGINT) AS idx,
                   h0
            FROM bounds
        ),
        dense AS (
            SELECT idx, COALESCE(c, 0) AS c
            FROM spine LEFT JOIN hourly ON spine.idx + spine.h0 = hourly.h
        ),
        taus AS (
            SELECT idx, c, tau
            FROM dense CROSS JOIN (VALUES {tau_values}) t(tau)
        ),
        bins AS (
            SELECT tau, idx // tau AS b,
                   CAST(COUNT(*) AS BIGINT) AS nh,
                   CAST(SUM(c) AS BIGINT) AS s
            FROM taus GROUP BY 1, 2
            HAVING COUNT(*) = tau
        ),
        diffs AS (
            SELECT tau, d FROM (
                SELECT tau,
                       LEAD(s) OVER (PARTITION BY tau ORDER BY b) - s AS d
                FROM bins
            ) WHERE d IS NOT NULL
        ),
        agg AS (
            SELECT tau, CAST(COUNT(*) AS BIGINT) AS pairs,
                   SUM(CAST(d AS HUGEINT) * d) AS sd2
            FROM diffs GROUP BY tau
        )
        SELECT CAST(tau AS BIGINT) AS tau_hours,
               CAST(pairs + 1 AS BIGINT) AS m_bins,
               CAST(CASE WHEN pairs > 0 THEN round(1e6 * CAST(sd2 AS DOUBLE)
                    / (2e0 * pairs * tau * tau)) ELSE NULL END AS BIGINT)
                   AS avar_micro
        FROM agg
        ORDER BY tau_hours
    """


# --- Engle's ARCH LM test ------------------------------------------------------------------


def arch_lm_daily(events: DataFrame) -> DataFrame:
    """Engle's ARCH LM test (one lag) on the daily log-returns of total
    event value: one row (n_pairs, r2_micro, lm_milli).

    events_daily_volatility reports the MAGNITUDE of return variance;
    the ARCH test asks whether that variance CLUSTERS — regress today's
    squared return on yesterday's; LM = n R^2 ~ chi2(1) under
    homoskedasticity. Volatility clustering is what invalidates every
    iid-variance control band downstream (ewma_chart, daily bands), so
    this is the gate that says whether those bands need a GARCH-style
    widening. Returns follow the present-day convention of the
    volatility device (gaps between active days count as one step);
    zero mean equation, the standard small-sample simplification.

    Exactness: returns quantize to micro before squaring, so all five
    regression sums (n, Sx, Sy, Sxx, Syy, Sxy) are exact decimal-38
    integers over the lag-paired day grid; R^2 = (n Sxy - Sx Sy)^2 /
    ((n Sxx - Sx^2)(n Syy - Sy^2)) is one double chain at the 1-row
    boundary.

    Scale shape: one (day) aggregate, one lag window over the bounded
    day grid, one 1-row reduction."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("v")
    ).where(F.col("v") > 0)
    w = Window.orderBy("day")
    rets2 = daily.select(
        "day",
        F.lag("v").over(w).alias("vp"),
        "v",
    ).where(F.col("vp").isNotNull()).select(
        "day",
        F.expr(
            "CAST(round(1e6 * ln(CAST(v AS DOUBLE) / vp)) AS BIGINT)"
        ).alias("q"),
    )
    u = rets2.select(
        "day", (F.col("q").cast(d38) * F.col("q").cast(d38)).alias("u")
    )
    pairs = u.select(
        "u", F.lag("u").over(Window.orderBy("day")).alias("ulag")
    ).where(F.col("ulag").isNotNull())
    agg = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ulag").alias("sx"),
        F.sum("u").alias("sy"),
        F.sum(F.col("ulag") * F.col("ulag")).alias("sxx"),
        F.sum(F.col("u") * F.col("u")).alias("syy"),
        F.sum(F.col("ulag") * F.col("u")).alias("sxy"),
    )
    r2 = (
        "((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
        " / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    )
    guard = (
        "n > 1 AND (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
        " * CAST(sx AS DOUBLE)) > 0 AND (n * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0"
    )
    return agg.select(
        F.col("n").alias("n_pairs"),
        F.expr(
            f"CAST(CASE WHEN {guard} THEN round(1e6 * {r2})"
            " ELSE NULL END AS BIGINT)"
        ).alias("r2_micro"),
        F.expr(
            f"CAST(CASE WHEN {guard} THEN round(1000 * n * {r2})"
            " ELSE NULL END AS BIGINT)"
        ).alias("lm_milli"),
    )


def arch_lm_daily_sql() -> str:
    r2 = (
        "((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
        " / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    )
    guard = (
        "n > 1 AND (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
        " * CAST(sx AS DOUBLE)) > 0 AND (n * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0"
    )
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS v
            FROM events GROUP BY 1
            HAVING SUM(CAST(round(value * 100) AS BIGINT)) > 0
        ),
        rets2 AS (
            SELECT day,
                   CAST(round(1e6 * ln(CAST(v AS DOUBLE) / vp)) AS BIGINT)
                       AS q
            FROM (
                SELECT day, v, LAG(v) OVER (ORDER BY day) AS vp FROM daily
            ) WHERE vp IS NOT NULL
        ),
        u AS (
            SELECT day, CAST(q AS HUGEINT) * q AS u FROM rets2
        ),
        pairs AS (
            SELECT u, ulag FROM (
                SELECT u, LAG(u) OVER (ORDER BY day) AS ulag FROM u
            ) WHERE ulag IS NOT NULL
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(ulag) AS sx, SUM(u) AS sy,
                   SUM(ulag * ulag) AS sxx, SUM(u * u) AS syy,
                   SUM(ulag * u) AS sxy
            FROM pairs
        )
        SELECT n AS n_pairs,
               CAST(CASE WHEN {guard} THEN round(1e6 * {r2})
                    ELSE NULL END AS BIGINT) AS r2_micro,
               CAST(CASE WHEN {guard} THEN round(1000 * n * {r2})
                    ELSE NULL END AS BIGINT) AS lm_milli
        FROM agg
    """


# --- Detrended fluctuation analysis --------------------------------------------------------

DFA_BOX_SIZES = (4, 8, 16)
DFA_TYPE = "click"


def dfa_daily(events: DataFrame) -> DataFrame:
    """Detrended fluctuation analysis of the daily click-count series:
    one row (n_days, f2_4_pico, f2_8_pico, f2_16_pico, alpha_milli).

    hurst_rs estimates long-range dependence through rescaled ranges,
    which trends contaminate; DFA is the modern counterpart that
    REMOVES a linear trend inside every box before measuring
    fluctuation, so a drifting event rate does not masquerade as
    memory. alpha ~ 0.5 white noise, ~1.0 1/f, >1 nonstationary.

    Integer core: the mean-centered profile is kept exact by scaling by
    n: Z_k = n * prefix_k - k * S (integers), so per-box sums (Sz, Szz,
    Sjz) are exact decimal-38; each complete box's OLS residual sum
    SSR = Szz - Sz^2/s - 12 (Sjz - (s+1)/2 Sz)^2 / (s (s^2-1)) is one
    double chain, normalized by s n^2 and quantized to pico before the
    per-size integer mean. Box sizes 4/8/16 are log-equidistant, so
    alpha = (ln F2(16) - ln F2(4)) / (4 ln 2) exactly — no regression.

    Scale shape: one (day) aggregate, one cumulative window on the
    bounded day grid, one 3 x |days| explode, one (size, box) aggregate,
    one 3-row pivot reduction."""
    d38 = "decimal(38,0)"
    daily = events.where(F.col("event_type") == DFA_TYPE).groupBy(
        F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    w = Window.orderBy("day")
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s_all"),
    )
    prof = daily.select(
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("pref"),
    ).crossJoin(F.broadcast(tot)).select(
        "k",
        "n",
        (F.col("n").cast(d38) * F.col("pref").cast(d38)
         - F.col("k").cast(d38) * F.col("s_all").cast(d38)).alias("z"),
    )
    boxes = prof.select(
        "k",
        "n",
        "z",
        F.explode(F.array(*[F.lit(s) for s in DFA_BOX_SIZES])).alias("s"),
    ).select(
        "s",
        "n",
        "z",
        F.expr("CAST((k - 1) DIV s AS BIGINT)").alias("b"),
        F.expr("CAST((k - 1) % s + 1 AS BIGINT)").alias("j"),
    )
    per_box = (
        boxes.groupBy("s", "b")
        .agg(
            F.max("n").alias("n"),
            F.count("*").cast("long").alias("cnt"),
            F.sum("z").alias("sz"),
            F.sum(F.col("z") * F.col("z")).alias("szz"),
            F.sum(F.col("j").cast(d38) * F.col("z")).alias("sjz"),
        )
        .where(F.col("cnt") == F.col("s"))
    )
    ssr = per_box.select(
        "s",
        F.expr(
            "CAST(round(1e12 * ("
            " CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / s"
            " - 12e0 * (CAST(sjz AS DOUBLE)"
            "     - (s + 1) / 2e0 * CAST(sz AS DOUBLE))"
            "   * (CAST(sjz AS DOUBLE) - (s + 1) / 2e0 * CAST(sz AS DOUBLE))"
            "   / (CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) * s - 1)))"
            " / (CAST(s AS DOUBLE) * CAST(n AS DOUBLE) * n)) AS BIGINT)"
        ).alias("t_pico"),
    )
    per_s = ssr.groupBy("s").agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("t_pico").cast(d38)).alias("tp"),
    )
    flat = per_s.groupBy().agg(
        *[
            F.max(
                F.when(
                    F.col("s") == sz,
                    F.expr("CAST(round(CAST(tp AS DOUBLE) / m) AS BIGINT)"),
                )
            ).alias(f"f2_{sz}_pico")
            for sz in DFA_BOX_SIZES
        ]
    )
    n1 = daily.agg(F.count("*").cast("long").alias("n_days"))
    return n1.crossJoin(F.broadcast(flat)).select(
        "n_days",
        "f2_4_pico",
        "f2_8_pico",
        "f2_16_pico",
        F.expr(
            "CAST(CASE WHEN f2_4_pico > 0 AND f2_16_pico > 0 THEN"
            " round(1000 * (ln(f2_16_pico / 1e12) - ln(f2_4_pico / 1e12))"
            " / (4e0 * ln(2e0))) ELSE NULL END AS BIGINT)"
        ).alias("alpha_milli"),
    )


def dfa_daily_sql() -> str:
    f2_cols = ", ".join(
        f"MAX(CASE WHEN s = {sz} THEN"
        f" CAST(round(CAST(tp AS DOUBLE) / m) AS BIGINT) END) AS f2_{sz}_pico"
        for sz in DFA_BOX_SIZES
    )
    sizes = ", ".join(f"({s})" for s in DFA_BOX_SIZES)
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events WHERE event_type = '{DFA_TYPE}'
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s_all
            FROM daily
        ),
        prof AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
                   n,
                   CAST(n AS HUGEINT)
                     * CAST(SUM(c) OVER (ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS HUGEINT)
                   - CAST(ROW_NUMBER() OVER (ORDER BY day) AS HUGEINT)
                     * s_all AS z
            FROM daily CROSS JOIN tot
        ),
        boxes AS (
            SELECT s, n, z,
                   (k - 1) // s AS b,
                   (k - 1) % s + 1 AS j
            FROM prof CROSS JOIN (VALUES {sizes}) sz(s)
        ),
        per_box AS (
            SELECT s, b, MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS cnt,
                   SUM(z) AS sz, SUM(z * z) AS szz,
                   SUM(CAST(j AS HUGEINT) * z) AS sjz
            FROM boxes GROUP BY 1, 2
            HAVING COUNT(*) = s
        ),
        ssr AS (
            SELECT s,
                   CAST(round(1e12 * (
                     CAST(szz AS DOUBLE)
                     - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / s
                     - 12e0 * (CAST(sjz AS DOUBLE)
                         - (s + 1) / 2e0 * CAST(sz AS DOUBLE))
                       * (CAST(sjz AS DOUBLE)
                         - (s + 1) / 2e0 * CAST(sz AS DOUBLE))
                       / (CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) * s - 1)))
                     / (CAST(s AS DOUBLE) * CAST(n AS DOUBLE) * n))
                       AS BIGINT) AS t_pico
            FROM per_box
        ),
        per_s AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS m,
                   SUM(CAST(t_pico AS HUGEINT)) AS tp
            FROM ssr GROUP BY s
        ),
        flat AS (SELECT {f2_cols} FROM per_s),
        n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
        SELECT n_days, f2_4_pico, f2_8_pico, f2_16_pico,
               CAST(CASE WHEN f2_4_pico > 0 AND f2_16_pico > 0 THEN
                    round(1000 * (ln(f2_16_pico / 1e12)
                          - ln(f2_4_pico / 1e12))
                    / (4e0 * ln(2e0))) ELSE NULL END AS BIGINT)
                   AS alpha_milli
        FROM n1 CROSS JOIN flat
    """


# --- Sample entropy -------------------------------------------------------------------------

SAMPEN_TYPE = "click"
SAMPEN_MAX_DAYS = 256


def sample_entropy_daily(events: DataFrame) -> DataFrame:
    """Sample entropy SampEn(m=2, r=0.2 sigma) of the daily click-count
    series (last ``SAMPEN_MAX_DAYS`` days): one row (n_days, b_pairs,
    a_pairs, sampen_milli).

    permutation_entropy scores ORDINAL pattern diversity; SampEn is the
    amplitude-aware regularity verdict — the negative log conditional
    probability that two length-2 templates matching within tolerance r
    still match when extended to length 3. Low SampEn = self-similar,
    predictable load; high = irregular. Self-matches are excluded by
    construction (i < j), the property that makes SampEn unbiased where
    ApEn is not.

    Exactness: counts are integers, template distances are integer
    Chebyshev diffs compared against the one double tolerance r
    (0.2 * sd from exact sums); B and A are exact pair counts and the
    final -ln(A/B) is the one float boundary.

    Scale shape: one (day) aggregate, one bounded-tail filter (row_number
    window over the day grid), two lead windows, one broadcast self-pair
    join capped at 256 x 256, one 1-row reduction."""
    daily = events.where(F.col("event_type") == SAMPEN_TYPE).groupBy(
        F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    wdesc = Window.orderBy(F.desc("day"))
    tail = daily.select(
        "day", "c", F.row_number().over(wdesc).alias("rdesc")
    ).where(F.col("rdesc") <= SAMPEN_MAX_DAYS)
    w = Window.orderBy("day")
    tmpl = tail.select(
        F.row_number().over(w).cast("long").alias("i"),
        F.col("c").alias("c1"),
        F.lead("c", 1).over(w).alias("c2"),
        F.lead("c", 2).over(w).alias("c3"),
    )
    sd = tail.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    ).select(
        "n",
        F.expr(
            "CASE WHEN n > 1 THEN 0.2e0 * sqrt((CAST(s2 AS DOUBLE)"
            " - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) ELSE 0e0 END"
        ).alias("r"),
    )
    a = tmpl.select(
        F.col("i").alias("ia"),
        F.col("c1").alias("a1"),
        F.col("c2").alias("a2"),
        F.col("c3").alias("a3"),
    )
    b = tmpl.select(
        F.col("i").alias("ib"),
        F.col("c1").alias("b1"),
        F.col("c2").alias("b2"),
        F.col("c3").alias("b3"),
    )
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).crossJoin(
        F.broadcast(sd)
    )
    agg = pairs.agg(
        F.max("n").alias("n"),
        F.sum(
            (
                F.col("a2").isNotNull()
                & F.col("b2").isNotNull()
                & (F.abs(F.col("a1") - F.col("b1")) <= F.col("r"))
                & (F.abs(F.col("a2") - F.col("b2")) <= F.col("r"))
            ).cast("long")
        ).alias("b_pairs"),
        F.sum(
            (
                F.col("a3").isNotNull()
                & F.col("b3").isNotNull()
                & (F.abs(F.col("a1") - F.col("b1")) <= F.col("r"))
                & (F.abs(F.col("a2") - F.col("b2")) <= F.col("r"))
                & (F.abs(F.col("a3") - F.col("b3")) <= F.col("r"))
            ).cast("long")
        ).alias("a_pairs"),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.coalesce("b_pairs", F.lit(0)).cast("long").alias("b_pairs"),
        F.coalesce("a_pairs", F.lit(0)).cast("long").alias("a_pairs"),
        F.expr(
            "CAST(CASE WHEN a_pairs > 0 AND b_pairs > 0 THEN"
            " round(-1000 * ln(CAST(a_pairs AS DOUBLE) / b_pairs))"
            " ELSE NULL END AS BIGINT)"
        ).alias("sampen_milli"),
    )


def sample_entropy_daily_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
            FROM events WHERE event_type = '{SAMPEN_TYPE}'
            GROUP BY 1
        ),
        tail AS (
            SELECT day, c FROM (
                SELECT day, c,
                       ROW_NUMBER() OVER (ORDER BY day DESC) AS rdesc
                FROM daily
            ) WHERE rdesc <= {SAMPEN_MAX_DAYS}
        ),
        tmpl AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
                   c AS c1,
                   LEAD(c, 1) OVER (ORDER BY day) AS c2,
                   LEAD(c, 2) OVER (ORDER BY day) AS c3
            FROM tail
        ),
        sd AS (
            SELECT n,
                   CASE WHEN n > 1 THEN 0.2e0 * sqrt((CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                        ELSE 0e0 END AS r
            FROM (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(c) AS BIGINT) AS s1,
                       CAST(SUM(c * c) AS BIGINT) AS s2
                FROM tail
            )
        ),
        agg AS (
            SELECT MAX(n) AS n,
                   CAST(SUM(CASE WHEN a.c2 IS NOT NULL AND b.c2 IS NOT NULL
                        AND abs(a.c1 - b.c1) <= r AND abs(a.c2 - b.c2) <= r
                        THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs,
                   CAST(SUM(CASE WHEN a.c3 IS NOT NULL AND b.c3 IS NOT NULL
                        AND abs(a.c1 - b.c1) <= r AND abs(a.c2 - b.c2) <= r
                        AND abs(a.c3 - b.c3) <= r
                        THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs
            FROM tmpl a JOIN tmpl b ON a.i < b.i
            CROSS JOIN sd
        )
        SELECT n AS n_days,
               COALESCE(b_pairs, 0) AS b_pairs,
               COALESCE(a_pairs, 0) AS a_pairs,
               CAST(CASE WHEN a_pairs > 0 AND b_pairs > 0 THEN
                    round(-1000 * ln(CAST(a_pairs AS DOUBLE) / b_pairs))
                    ELSE NULL END AS BIGINT) AS sampen_milli
        FROM agg
    """


# --- Engle-Granger cointegration (lite) -----------------------------------------------------

EG_X_TYPE = "click"
EG_Y_TYPE = "purchase"


def engle_granger_daily(events: DataFrame) -> DataFrame:
    """Engle-Granger two-step cointegration check between the daily click
    and purchase value totals: one row (n_days, beta_micro, adf_milli).

    granger_lite asks whether clicks help FORECAST purchases; the
    Engle-Granger question is stronger — do the two levels share a
    common stochastic trend, i.e. is some linear combination
    stationary? Step 1 fits y = a + b x by OLS; step 2 runs the
    no-constant Dickey-Fuller regression on the residuals (delta e_t =
    rho e_{t-1}): adf = rho / se(rho). An adf far below ~-3.3 says the
    spread mean-reverts — the statistical license for pair-level
    monitoring of the two streams.

    Exactness: OLS comes from exact integer cent sums; residuals
    quantize to micro immediately, so the DF sums (Se^2, Se d, Sd^2)
    are exact decimal-38 and SSR = Sd^2 - (Se d)^2 / Se^2 needs no
    per-row float accumulation; rho, se, adf are one double chain.

    Scale shape: one (day) conditional aggregate, two 1-row scalar
    broadcasts, one lag window over the bounded day grid, one 1-row
    reduction."""
    d38 = "decimal(38,0)"
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.when(
                F.col("event_type") == EG_X_TYPE,
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            )
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == EG_Y_TYPE,
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            )
        ).alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    ols = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).alias("sxy"),
    ).select(
        "n",
        F.expr(
            "CASE WHEN n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
            " * CAST(sx AS DOUBLE) > 0 THEN"
            " (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            " ELSE 0e0 END"
        ).alias("beta"),
        F.expr("CAST(sy AS DOUBLE) / n").alias("ybar"),
        F.expr("CAST(sx AS DOUBLE) / n").alias("xbar"),
    )
    resid = daily.crossJoin(F.broadcast(ols)).select(
        "day",
        "n",
        "beta",
        F.expr(
            "CAST(round(1e6 * (y - (ybar - beta * xbar) - beta * x))"
            " AS BIGINT)"
        ).alias("e"),
    )
    w = Window.orderBy("day")
    pairs = resid.select(
        "n",
        "beta",
        F.col("e"),
        F.lag("e").over(w).alias("ep"),
    ).where(F.col("ep").isNotNull())
    agg = pairs.agg(
        F.max("n").alias("n"),
        F.max("beta").alias("beta"),
        F.count("*").cast("long").alias("np"),
        F.sum(F.col("ep").cast(d38) * F.col("ep").cast(d38)).alias("see"),
        F.sum(
            F.col("ep").cast(d38) * (F.col("e") - F.col("ep")).cast(d38)
        ).alias("sed"),
        F.sum(
            (F.col("e") - F.col("ep")).cast(d38)
            * (F.col("e") - F.col("ep")).cast(d38)
        ).alias("sdd"),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.expr("CAST(round(1e6 * beta) AS BIGINT)").alias("beta_micro"),
        F.expr(
            "CAST(CASE WHEN np > 2 AND CAST(see AS DOUBLE) > 0"
            " AND CAST(sdd AS DOUBLE) - CAST(sed AS DOUBLE) * CAST(sed AS DOUBLE)"
            "     / CAST(see AS DOUBLE) > 0 THEN"
            " round(1000 * (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))"
            " / sqrt((CAST(sdd AS DOUBLE) - CAST(sed AS DOUBLE)"
            "         * CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))"
            "        / (np - 1) / CAST(see AS DOUBLE)))"
            " ELSE NULL END AS BIGINT)"
        ).alias("adf_milli"),
    )


def engle_granger_daily_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   SUM(CASE WHEN event_type = '{EG_X_TYPE}' THEN
                       CAST(round(value * 100) AS BIGINT) END) AS x,
                   SUM(CASE WHEN event_type = '{EG_Y_TYPE}' THEN
                       CAST(round(value * 100) AS BIGINT) END) AS y
            FROM events GROUP BY 1
            HAVING SUM(CASE WHEN event_type = '{EG_X_TYPE}' THEN
                       CAST(round(value * 100) AS BIGINT) END) IS NOT NULL
               AND SUM(CASE WHEN event_type = '{EG_Y_TYPE}' THEN
                       CAST(round(value * 100) AS BIGINT) END) IS NOT NULL
        ),
        ols AS (
            SELECT n,
                   CASE WHEN n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                        * CAST(sx AS DOUBLE) > 0 THEN
                        (n * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (n * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        ELSE 0e0 END AS beta,
                   CAST(sy AS DOUBLE) / n AS ybar,
                   CAST(sx AS DOUBLE) / n AS xbar
            FROM (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(x) AS HUGEINT) AS sx,
                       CAST(SUM(y) AS HUGEINT) AS sy,
                       SUM(CAST(x AS HUGEINT) * x) AS sxx,
                       SUM(CAST(x AS HUGEINT) * y) AS sxy
                FROM daily
            )
        ),
        resid AS (
            SELECT day, n, beta,
                   CAST(round(1e6 * (y - (ybar - beta * xbar) - beta * x))
                       AS BIGINT) AS e
            FROM daily CROSS JOIN ols
        ),
        pairs AS (
            SELECT n, beta, e, ep FROM (
                SELECT n, beta, e, LAG(e) OVER (ORDER BY day) AS ep
                FROM resid
            ) WHERE ep IS NOT NULL
        ),
        agg AS (
            SELECT MAX(n) AS n, MAX(beta) AS beta,
                   CAST(COUNT(*) AS BIGINT) AS np,
                   SUM(CAST(ep AS HUGEINT) * ep) AS see,
                   SUM(CAST(ep AS HUGEINT) * (e - ep)) AS sed,
                   SUM(CAST(e - ep AS HUGEINT) * (e - ep)) AS sdd
            FROM pairs
        )
        SELECT n AS n_days,
               CAST(round(1e6 * beta) AS BIGINT) AS beta_micro,
               CAST(CASE WHEN np > 2 AND CAST(see AS DOUBLE) > 0
                    AND CAST(sdd AS DOUBLE) - CAST(sed AS DOUBLE)
                        * CAST(sed AS DOUBLE) / CAST(see AS DOUBLE) > 0 THEN
                    round(1000 * (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
                    / sqrt((CAST(sdd AS DOUBLE) - CAST(sed AS DOUBLE)
                            * CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
                           / (np - 1) / CAST(see AS DOUBLE)))
                    ELSE NULL END AS BIGINT) AS adf_milli
        FROM agg
    """


# --- Isotonic (PAVA) calibration of conversion vs engagement --------------------------------

ISO_MAX_BIN = 10


def isotonic_calibration(events: DataFrame) -> DataFrame:
    """Isotonic regression of the purchase rate on the click-count bin:
    rows (click_bin, n_users, rate_raw_micro, rate_iso_micro) ordered by
    bin, with the isotonic column nondecreasing by construction.

    events_target_encoding hands downstream models a RAW per-bin rate;
    when the business prior says "more engagement never hurts
    conversion", the monotone fit is the right calibrator. This is
    exact isotonic regression — not PAVA's sequential pooling but its
    closed form, fit_i = max_{a<=i} min_{b>=i} weightedMean(y[a..b])
    (they provably coincide) — which IS expressible as bounded
    relational algebra because the bin grid is <= ISO_MAX_BIN rows.

    Exactness: interval means are rationals of exact integer cumulative
    sums; min/max over exact doubles are order-free; the one micro
    quantization happens at the output boundary.

    Scale shape: one user-grain aggregate, a <=10-row bin grid, two
    broadcast grid self-joins (<=10^3 interval-bin rows), two bounded
    reductions."""
    users = events.where(
        F.col("event_type").isin("click", "purchase")
    ).groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("clicks"),
        F.max((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("purchased"),
    ).where(F.col("clicks") > 0)
    bins = users.groupBy(
        F.least(F.col("clicks"), F.lit(ISO_MAX_BIN)).alias("bin")
    ).agg(
        F.count("*").cast("long").alias("w"),
        F.sum("purchased").cast("long").alias("y"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "w",
        "y",
        F.sum("w").over(wc).cast("long").alias("cwi"),
        F.sum("y").over(wc).cast("long").alias("cyi"),
        (F.sum("w").over(wc) - F.col("w")).cast("long").alias("cwe"),
        (F.sum("y").over(wc) - F.col("y")).cast("long").alias("cye"),
    )
    lo = cum.select(
        F.col("bin").alias("a"), F.col("cwe").alias("awe"), F.col("cye").alias("aye")
    )
    hi = cum.select(
        F.col("bin").alias("b"), F.col("cwi").alias("bwi"), F.col("cyi").alias("byi")
    )
    intervals = lo.join(F.broadcast(hi), F.col("a") <= F.col("b")).select(
        "a",
        "b",
        (
            (F.col("byi") - F.col("aye")).cast("double")
            / (F.col("bwi") - F.col("awe")).cast("double")
        ).alias("mean"),
    )
    pts = cum.select(F.col("bin").alias("i"))
    inner = (
        pts.join(
            F.broadcast(intervals),
            (F.col("a") <= F.col("i")) & (F.col("i") <= F.col("b")),
        )
        .groupBy("i", "a")
        .agg(F.min("mean").alias("mn"))
        .groupBy("i")
        .agg(F.max("mn").alias("fit"))
    )
    return (
        cum.join(inner, cum.bin == F.col("i"))
        .select(
            F.col("bin").alias("click_bin"),
            F.col("w").alias("n_users"),
            F.expr("CAST(round(1e6 * y / w) AS BIGINT)").alias("rate_raw_micro"),
            F.expr("CAST(round(1e6 * fit) AS BIGINT)").alias("rate_iso_micro"),
        )
        .orderBy("click_bin")
    )


def isotonic_calibration_sql() -> str:
    return f"""
        WITH users AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS BIGINT) AS clicks,
                   CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS BIGINT) AS purchased
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id
            HAVING SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0
        ),
        bins AS (
            SELECT LEAST(clicks, {ISO_MAX_BIN}) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS w,
                   CAST(SUM(purchased) AS BIGINT) AS y
            FROM users GROUP BY 1
        ),
        cum AS (
            SELECT bin, w, y,
                   CAST(SUM(w) OVER wc AS BIGINT) AS cwi,
                   CAST(SUM(y) OVER wc AS BIGINT) AS cyi,
                   CAST(SUM(w) OVER wc - w AS BIGINT) AS cwe,
                   CAST(SUM(y) OVER wc - y AS BIGINT) AS cye
            FROM bins
            WINDOW wc AS (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        intervals AS (
            SELECT lo.bin AS a, hi.bin AS b,
                   CAST(hi.cyi - lo.cye AS DOUBLE)
                   / CAST(hi.cwi - lo.cwe AS DOUBLE) AS mean
            FROM cum lo JOIN cum hi ON lo.bin <= hi.bin
        ),
        inner_fit AS (
            SELECT i, MAX(mn) AS fit FROM (
                SELECT p.bin AS i, iv.a, MIN(iv.mean) AS mn
                FROM cum p JOIN intervals iv
                  ON iv.a <= p.bin AND p.bin <= iv.b
                GROUP BY p.bin, iv.a
            ) GROUP BY i
        )
        SELECT bin AS click_bin, w AS n_users,
               CAST(round(1e6 * y / w) AS BIGINT) AS rate_raw_micro,
               CAST(round(1e6 * fit) AS BIGINT) AS rate_iso_micro
        FROM cum JOIN inner_fit ON cum.bin = inner_fit.i
        ORDER BY click_bin
    """


# --- Xbar-R control chart -------------------------------------------------------------------

XBAR_SUBGROUP = 5
XBAR_A2 = "0.577e0"   # Shewhart chart constants for n = 5 (public tables)
XBAR_D4 = "2.114e0"
XBAR_TYPE = "click"


def xbar_r_chart(events: DataFrame) -> DataFrame:
    """Shewhart Xbar-R control chart over daily click-value subgroups:
    rows (day, xbar_milli, r_cents, x_ooc, r_ooc) ordered by day.

    ewma_chart tracks a drifting MEAN with memory; the Xbar-R pair is
    the classical subgroup chart — each day's first 5 click values form
    a rational subgroup, the R chart watches WITHIN-day dispersion and
    the Xbar chart watches day-to-day location against A2*Rbar limits
    (the range-based sigma estimate, constants for n=5). A day can be
    out of control on either chart independently, which is the point.

    Determinism: the 5-row subgroup is picked by (ts, event_id) row
    order — a total order, so both engines draw identical subgroups.
    Sums are exact cents; grand means are rationals of exact sums; the
    limit comparison runs in one double chain mirrored on both sides.

    Scale shape: one day-partitioned top-5 window over clicks, one day
    aggregate, one 1-row scalar broadcast."""
    clicks = events.where(
        (F.col("event_type") == XBAR_TYPE) & F.col("value").isNotNull()
    ).select(
        F.to_date("ts").alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        "ts",
        "event_id",
    )
    wday = Window.partitionBy("day").orderBy("ts", "event_id")
    sub = clicks.withColumn("rn", F.row_number().over(wday)).where(
        F.col("rn") <= XBAR_SUBGROUP
    )
    days = sub.groupBy("day").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("v").cast("long").alias("s"),
        (F.max("v") - F.min("v")).cast("long").alias("r"),
    ).where(F.col("cnt") == XBAR_SUBGROUP)
    tot = days.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("s").cast("long").alias("ss"),
        F.sum("r").cast("long").alias("sr"),
    )
    n = XBAR_SUBGROUP
    return (
        days.crossJoin(F.broadcast(tot))
        .select(
            "day",
            F.expr(f"CAST(round(1000e0 * s / {n}) AS BIGINT)").alias(
                "xbar_milli"
            ),
            F.col("r").alias("r_cents"),
            F.expr(
                f"CAST(CASE WHEN CAST(s AS DOUBLE) / {n}"
                f" > CAST(ss AS DOUBLE) / ({n} * m)"
                f"   + {XBAR_A2} * (CAST(sr AS DOUBLE) / m)"
                f" OR CAST(s AS DOUBLE) / {n}"
                f" < CAST(ss AS DOUBLE) / ({n} * m)"
                f"   - {XBAR_A2} * (CAST(sr AS DOUBLE) / m)"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("x_ooc"),
            F.expr(
                f"CAST(CASE WHEN r > {XBAR_D4} * (CAST(sr AS DOUBLE) / m)"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("r_ooc"),
        )
        .orderBy("day")
    )


def xbar_r_chart_sql() -> str:
    n = XBAR_SUBGROUP
    return f"""
        WITH clicks AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(round(value * 100) AS BIGINT) AS v, ts, event_id
            FROM events
            WHERE event_type = '{XBAR_TYPE}' AND value IS NOT NULL
        ),
        sub AS (
            SELECT day, v FROM (
                SELECT day, v,
                       ROW_NUMBER() OVER (PARTITION BY day
                           ORDER BY ts, event_id) AS rn
                FROM clicks
            ) WHERE rn <= {n}
        ),
        days AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(v) AS BIGINT) AS s,
                   CAST(MAX(v) - MIN(v) AS BIGINT) AS r
            FROM sub GROUP BY day
            HAVING COUNT(*) = {n}
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(s) AS BIGINT) AS ss,
                   CAST(SUM(r) AS BIGINT) AS sr
            FROM days
        )
        SELECT day,
               CAST(round(1000e0 * s / {n}) AS BIGINT) AS xbar_milli,
               r AS r_cents,
               CAST(CASE WHEN CAST(s AS DOUBLE) / {n}
                    > CAST(ss AS DOUBLE) / ({n} * m)
                      + {XBAR_A2} * (CAST(sr AS DOUBLE) / m)
                    OR CAST(s AS DOUBLE) / {n}
                    < CAST(ss AS DOUBLE) / ({n} * m)
                      - {XBAR_A2} * (CAST(sr AS DOUBLE) / m)
                    THEN 1 ELSE 0 END AS BIGINT) AS x_ooc,
               CAST(CASE WHEN r > {XBAR_D4} * (CAST(sr AS DOUBLE) / m)
                    THEN 1 ELSE 0 END AS BIGINT) AS r_ooc
        FROM days CROSS JOIN tot
        ORDER BY day
    """


# --- Anderson-Darling uniformity of intraday arrival times ------------------------------------

AD_BINS = 172800  # doubled second-of-day grid: x_s = (2s+1)/172800 is exact-rational
AD_CRIT_5PCT_MILLI = 2492  # asymptotic 5% critical value for a fully specified null


def anderson_darling_uniformity(events: DataFrame) -> DataFrame:
    """Anderson-Darling test of event second-of-day against the uniform
    law: one row (n_events, a2_milli, reject_5pct).

    ks_uniformity_seconds takes the sup-norm view, which is blind to
    tail misfit (the KS weight vanishes near 0 and 1); A-D reweights the
    integrated squared ECDF gap by 1/(F(1-F)), so cron spikes in the
    first/last minutes of the day — exactly where batch jobs land — get
    full power. Statistic on the second-of-day bins at midpoints
    x_s = (2s+1)/172800: A2 = -n - (1/n) * sum over occupied seconds of
    [lo_s * ln(x_s) + hi_s * ln(1-x_s)] where lo_s = t*(2*cum - t) and
    hi_s = t*(2*(n-cum) + t) are the exact block sums of (2i-1) and
    (2(n-i)+1) over that second's tied rank block.

    Exactness: both rank-block coefficients are exact BIGINTs off the
    cumulative second grid; each second's log term divides by n and
    quantizes to micro before the order-free integer sum; x_s and 1-x_s
    are exact rationals divided once (ln of identical doubles in both
    engines).

    Scale shape: one (second) aggregate over the bounded 86400-bin
    domain, one cumulative window on that grid, one 1-row N broadcast,
    one bounded reduction."""
    sec = F.expr(
        "CAST(hour(ts) * 3600 + minute(ts) * 60 + second(ts) AS BIGINT)"
    )
    per_s = events.groupBy(sec.alias("s")).agg(
        F.count("*").cast("long").alias("t")
    )
    tot = per_s.agg(F.sum("t").cast("long").alias("n"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    terms = (
        per_s.select("s", "t", F.sum("t").over(w).cast("long").alias("cum"))
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.expr(
                f"CAST(round(1e6 * ("
                f"  CAST(t * (2 * cum - t) AS DOUBLE)"
                f"    * ln((2 * s + 1) / {AD_BINS}e0)"
                f"  + CAST(t * (2 * (n - cum) + t) AS DOUBLE)"
                f"    * ln(({AD_BINS} - 2 * s - 1) / {AD_BINS}e0)"
                f") / n) AS BIGINT)"
            ).alias("term_micro"),
        )
    )
    return (
        terms.groupBy("n")
        .agg(F.sum("term_micro").cast("long").alias("s_micro"))
        .select(
            F.col("n").alias("n_events"),
            F.expr(
                "CAST(round(1000.0 * (-CAST(n AS DOUBLE)"
                " - s_micro / 1e6)) AS BIGINT)"
            ).alias("a2_milli"),
        )
        .select(
            "n_events",
            "a2_milli",
            F.expr(
                f"CAST(CASE WHEN a2_milli > {AD_CRIT_5PCT_MILLI}"
                f" THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("reject_5pct"),
        )
    )


def anderson_darling_uniformity_sql() -> str:
    return f"""
        WITH per_s AS (
            SELECT CAST(EXTRACT(hour FROM ts) * 3600
                   + EXTRACT(minute FROM ts) * 60
                   + FLOOR(EXTRACT(second FROM ts)) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS t
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n FROM per_s
        ),
        cums AS (
            SELECT s, t, n,
                   SUM(t) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM per_s CROSS JOIN tot
        ),
        terms AS (
            SELECT n,
                   CAST(round(1e6 * (
                     CAST(t * (2 * cum - t) AS DOUBLE)
                       * ln((2 * s + 1) / {AD_BINS}e0)
                     + CAST(t * (2 * (n - cum) + t) AS DOUBLE)
                       * ln(({AD_BINS} - 2 * s - 1) / {AD_BINS}e0)
                   ) / n) AS BIGINT) AS term_micro
            FROM cums
        ),
        agg AS (
            SELECT n, CAST(SUM(term_micro) AS BIGINT) AS s_micro
            FROM terms GROUP BY n
        )
        SELECT n AS n_events,
               CAST(round(1000.0 * (-CAST(n AS DOUBLE) - s_micro / 1e6))
                    AS BIGINT) AS a2_milli,
               CAST(CASE WHEN round(1000.0 * (-CAST(n AS DOUBLE)
                         - s_micro / 1e6)) > {AD_CRIT_5PCT_MILLI}
                    THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
        FROM agg
    """


# --- Hodges-Lehmann pseudomedian of daily click-error differences -----------------------------


def hodges_lehmann_daily(events: DataFrame) -> DataFrame:
    """Hodges-Lehmann estimator of the daily click-error count gap: one
    row (n_days, n_pairs, hl_milli).

    events_wilcoxon_signed_rank answers WHETHER the paired daily gap is
    centered at zero; this is the matching EFFECT-SIZE estimator — the
    median of all Walsh averages (d_i + d_j)/2 over day pairs i <= j —
    the location estimate the signed-rank test actually inverts, robust
    to the outlier days that wreck the plain mean gap.

    Exactness: daily differences are exact BIGINTs; Walsh sums w = d_i +
    d_j stay integer over the bounded <=366-day self-join; the median is
    an exact order statistic off the (w) grid cumulative (doubled form
    w_lo + w_hi handles even pair counts without a float midpoint); one
    division at the emit.

    Scale shape: one (day) aggregate, a bounded <=366x366/2 self-join on
    the day grid, one (w) aggregate + cumulative window, one 1-row
    order-statistic broadcast."""
    per_day = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("clicks"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("errors"),
    ).select("day", (F.col("clicks") - F.col("errors")).alias("d"))
    a = per_day.select(F.col("day").alias("day_a"), F.col("d").alias("da"))
    b = per_day.select(F.col("day").alias("day_b"), F.col("d").alias("db"))
    walsh = (
        a.join(b, F.col("day_a") <= F.col("day_b"))
        .select((F.col("da") + F.col("db")).alias("w"))
    )
    per_w = walsh.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    wcum = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, 0)
    cums = per_w.select("w", F.sum("c").over(wcum).cast("long").alias("cum"))
    tot = cums.agg(F.max("cum").cast("long").alias("m"))
    picked = (
        cums.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(m + 1) DIV 2"), F.col("w"))
            ).alias("w_lo"),
            F.min(
                F.when(F.col("cum") >= F.expr("(m + 2) DIV 2"), F.col("w"))
            ).alias("w_hi"),
            F.max("m").cast("long").alias("n_pairs"),
        )
    )
    n_days = per_day.agg(F.count("*").cast("long").alias("n_days"))
    return (
        n_days.crossJoin(F.broadcast(picked))
        .select(
            "n_days",
            "n_pairs",
            F.expr(
                "CAST(round(1000.0 * (w_lo + w_hi) / 4e0) AS BIGINT)"
            ).alias("hl_milli"),
        )
    )


def hodges_lehmann_daily_sql() -> str:
    return """
        WITH per_day AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) AS BIGINT)
                   - CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                       END) AS BIGINT) AS d
            FROM events GROUP BY 1
        ),
        walsh AS (
            SELECT a.d + b.d AS w
            FROM per_day a JOIN per_day b ON a.day <= b.day
        ),
        per_w AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM walsh GROUP BY w
        ),
        cums AS (
            SELECT w, SUM(c) OVER (ORDER BY w
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM per_w
        ),
        tot AS (
            SELECT CAST(MAX(cum) AS BIGINT) AS m FROM cums
        ),
        picked AS (
            SELECT MIN(CASE WHEN cum >= (m + 1) // 2 THEN w END) AS w_lo,
                   MIN(CASE WHEN cum >= (m + 2) // 2 THEN w END) AS w_hi,
                   CAST(MAX(m) AS BIGINT) AS n_pairs
            FROM cums CROSS JOIN tot
        ),
        nd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM per_day
        )
        SELECT n_days, n_pairs,
               CAST(round(1000.0 * (w_lo + w_hi) / 4e0) AS BIGINT) AS hl_milli
        FROM nd CROSS JOIN picked
    """


# --- Pettitt rank changepoint test -------------------------------------------------------------


def pettitt_daily(events: DataFrame) -> DataFrame:
    """Pettitt rank-based changepoint test on daily click counts: one row
    (n_days, k_stat, change_date, p_micro).

    events_changepoint localizes a mean shift by SSE (moment-based, so a
    single outlier day can pull the split); Pettitt is its rank twin —
    U_t = sum_{i<=t, j>t} sgn(x_i - x_j), K = max|U_t| — invariant to
    any monotone transform of the counts and the standard first test in
    hydrology/telemetry for an undated regime break. With midranks the
    prefix identity stays exact: U_t = sum_{i<=t} r2_i - t(n+1) where r2
    is the DOUBLED pooled midrank (within-prefix pairs cancel by
    antisymmetry), so ties cost nothing.

    Exactness: fully integer — doubled midranks off the (count) grid,
    one cumulative sum per day index, U_t and K exact BIGINTs; the
    argmax tie breaks to the earliest day via the bounded sort; the
    asymptotic p = 2*exp(-6K^2/(n^3+n^2)) is one double at the emit.

    Scale shape: one (day) aggregate, one (count) grid aggregate +
    cumulative window, one bounded <=366-row window + limit-1 sort."""
    per_day = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("x")
    )
    per_c = per_day.groupBy("x").agg(F.count("*").cast("long").alias("t"))
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_c.select(
        "x", (2 * F.sum("t").over(wc) - F.col("t") + 1).alias("r2")
    )
    tot = per_day.agg(F.count("*").cast("long").alias("n"))
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    u = (
        per_day.join(ranked, "x")
        .crossJoin(F.broadcast(tot))
        .select(
            "day",
            "n",
            F.row_number().over(Window.orderBy("day")).alias("tpos"),
            F.sum("r2").over(wd).cast("long").alias("s2"),
        )
        .where(F.col("tpos") < F.col("n"))
        .select(
            "day",
            "n",
            F.abs(F.col("s2") - F.col("tpos") * (F.col("n") + 1)).alias("u"),
        )
    )
    return (
        u.orderBy(F.col("u").desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("n").alias("n_days"),
            F.col("u").alias("k_stat"),
            F.col("day").alias("change_date"),
            F.expr(
                "CAST(round(1e6 * least(1e0, 2e0 * exp("
                " -6e0 * CAST(u AS DOUBLE) * u"
                " / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))))"
                " AS BIGINT)"
            ).alias("p_micro"),
        )
    )


def pettitt_daily_sql() -> str:
    return """
        WITH per_day AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        per_c AS (
            SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM per_day GROUP BY x
        ),
        ranked AS (
            SELECT x, 2 * SUM(t) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - t + 1 AS r2
            FROM per_c
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per_day
        ),
        seq AS (
            SELECT day, n,
                   ROW_NUMBER() OVER (ORDER BY day) AS tpos,
                   SUM(r2) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS s2
            FROM per_day JOIN ranked USING (x) CROSS JOIN tot
        ),
        u AS (
            SELECT day, n,
                   CAST(abs(s2 - tpos * (n + 1)) AS BIGINT) AS u
            FROM seq WHERE tpos < n
        )
        SELECT n AS n_days, u AS k_stat, day AS change_date,
               CAST(round(1e6 * least(1e0, 2e0 * exp(
                   -6e0 * CAST(u AS DOUBLE) * u
                   / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n))))
                   AS BIGINT) AS p_micro
        FROM u
        ORDER BY u DESC, day ASC
        LIMIT 1
    """


# --- Breslow-Day homogeneity of stratified odds ratios -----------------------------------------


def breslow_day_homogeneity(events: DataFrame) -> DataFrame:
    """Breslow-Day test that the variant->purchase odds ratio is COMMON
    across the activity strata: one row (n_strata, or_mh_milli,
    bd_chi2_milli).

    events_mantel_haenszel reports the pooled OR_MH assuming the strata
    share one effect; this tests that assumption — under the common-OR
    null each stratum's expected a-cell E solves the quadratic
    (1-psi)E^2 + [n0-m1+psi(n1+m1)]E - psi*n1*m1 = 0 (root inside the
    margin bounds), and X2 = sum (a-E)^2/V with V = 1/(1/E + 1/(n1-E) +
    1/(m1-E) + 1/(n0-m1+E)) ~ chi2(strata-1). A significant X2 says the
    MH summary hides real effect heterogeneity (report per-stratum ORs
    instead). Same strata and 2x2 cells as events_mantel_haenszel.

    Exactness: cells are exact BIGINTs; OR_MH comes off the same micro
    term sums as the MH device (identical chain both engines); each
    stratum's E/V/term is one bounded double chain quantized to micro
    before the <=|strata|-row sum.

    Scale shape: one user-grain aggregate, a <=|strata| cell rollup, one
    1-row psi broadcast joined back to the bounded cell grid."""
    per_user = events.groupBy("user_id").agg(
        F.count("*").alias("n_ev"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    assigned = per_user.select(
        F.least(F.lit(SIMPSON_STRATA - 1), F.expr("n_ev DIV 67")).alias("stratum"),
        (F.col("user_id") % 2 == 1).alias("treat"),
        "conv",
    )
    cells = assigned.groupBy("stratum").agg(
        F.sum(F.when(F.col("treat"), F.col("conv")).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("treat"), 1 - F.col("conv")).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(~F.col("treat"), F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(~F.col("treat"), 1 - F.col("conv")).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    psi = cells.select(
        F.expr(
            "CAST(round(1e6 * CAST(a AS DOUBLE) * d / (a + b + c + d)) AS BIGINT)"
        ).alias("ad_micro"),
        F.expr(
            "CAST(round(1e6 * CAST(b AS DOUBLE) * c / (a + b + c + d)) AS BIGINT)"
        ).alias("bc_micro"),
    ).agg(
        F.expr(
            "CASE WHEN SUM(bc_micro) > 0 THEN"
            " CAST(SUM(ad_micro) AS DOUBLE) / SUM(bc_micro)"
            " ELSE 1e0 END"
        ).alias("psi")
    )
    ex = (
        cells.crossJoin(F.broadcast(psi))
        .select(
            "a",
            "psi",
            (F.col("a") + F.col("b")).alias("n1"),
            (F.col("c") + F.col("d")).alias("n0"),
            (F.col("a") + F.col("c")).alias("m1"),
        )
        .select(
            "a",
            "psi",
            "n1",
            "n0",
            "m1",
            F.expr(
                "CASE WHEN abs(psi - 1e0) < 1e-12"
                " THEN CAST(n1 AS DOUBLE) * m1 / (n1 + n0)"
                " ELSE ("
                "  -(n0 - m1 + psi * (n1 + m1))"
                "  + CASE WHEN"
                "    greatest(0e0,"
                "      (-(n0 - m1 + psi * (n1 + m1))"
                "       + sqrt(greatest(0e0, (n0 - m1 + psi * (n1 + m1))"
                "              * (n0 - m1 + psi * (n1 + m1))"
                "              + 4e0 * (1e0 - psi) * psi * n1 * m1)))"
                "      / (2e0 * (1e0 - psi))) <= CAST(least(n1, m1) AS DOUBLE)"
                "    AND (-(n0 - m1 + psi * (n1 + m1))"
                "         + sqrt(greatest(0e0, (n0 - m1 + psi * (n1 + m1))"
                "                * (n0 - m1 + psi * (n1 + m1))"
                "                + 4e0 * (1e0 - psi) * psi * n1 * m1)))"
                "        / (2e0 * (1e0 - psi)) >= greatest(0e0, CAST(m1 - n0 AS DOUBLE))"
                "   THEN sqrt(greatest(0e0, (n0 - m1 + psi * (n1 + m1))"
                "             * (n0 - m1 + psi * (n1 + m1))"
                "             + 4e0 * (1e0 - psi) * psi * n1 * m1))"
                "   ELSE -sqrt(greatest(0e0, (n0 - m1 + psi * (n1 + m1))"
                "              * (n0 - m1 + psi * (n1 + m1))"
                "              + 4e0 * (1e0 - psi) * psi * n1 * m1)) END"
                " ) / (2e0 * (1e0 - psi)) END"
            ).alias("e"),
        )
        .select(
            F.expr(
                "CAST(round(1e6 * CASE WHEN e > 1e-9 AND n1 - e > 1e-9"
                " AND m1 - e > 1e-9 AND n0 - m1 + e > 1e-9"
                " THEN (a - e) * (a - e)"
                " * (1e0 / e + 1e0 / (n1 - e) + 1e0 / (m1 - e)"
                "    + 1e0 / (n0 - m1 + e)) ELSE 0e0 END) AS BIGINT)"
            ).alias("term_micro"),
            F.expr("CAST(round(1e6 * psi) AS BIGINT)").alias("psi_micro"),
        )
    )
    return ex.groupBy("psi_micro").agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("term_micro").cast("long").alias("s_micro"),
    ).select(
        "n_strata",
        F.expr("CAST(round(psi_micro / 1000.0) AS BIGINT)").alias(
            "or_mh_milli"
        ),
        F.expr("CAST(round(s_micro / 1000.0) AS BIGINT)").alias(
            "bd_chi2_milli"
        ),
    )


def breslow_day_homogeneity_sql() -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id, COUNT(*) AS n_ev,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id
        ),
        assigned AS (
            SELECT LEAST({SIMPSON_STRATA - 1}, n_ev // 67) AS stratum,
                   (user_id % 2 = 1) AS treat, conv
            FROM per_user
        ),
        cells AS (
            SELECT stratum,
                   CAST(SUM(CASE WHEN treat THEN conv ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN treat THEN 1 - conv ELSE 0 END) AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN NOT treat THEN conv ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN NOT treat THEN 1 - conv ELSE 0 END) AS BIGINT) AS d
            FROM assigned GROUP BY stratum
        ),
        psi AS (
            SELECT CASE WHEN SUM(bc_micro) > 0 THEN
                       CAST(SUM(ad_micro) AS DOUBLE) / SUM(bc_micro)
                   ELSE 1e0 END AS psi
            FROM (
                SELECT CAST(round(1e6 * CAST(a AS DOUBLE) * d
                           / (a + b + c + d)) AS BIGINT) AS ad_micro,
                       CAST(round(1e6 * CAST(b AS DOUBLE) * c
                           / (a + b + c + d)) AS BIGINT) AS bc_micro
                FROM cells
            )
        ),
        marg AS (
            SELECT a, psi, a + b AS n1, c + d AS n0, a + c AS m1
            FROM cells CROSS JOIN psi
        ),
        ex AS (
            SELECT a, psi, n1, n0, m1,
                   CASE WHEN abs(psi - 1e0) < 1e-12
                    THEN CAST(n1 AS DOUBLE) * m1 / (n1 + n0)
                    ELSE (
                     -(n0 - m1 + psi * (n1 + m1))
                     + CASE WHEN
                       greatest(0e0,
                         (-(n0 - m1 + psi * (n1 + m1))
                          + sqrt(greatest(0e0, (n0 - m1 + psi * (n1 + m1))
                                 * (n0 - m1 + psi * (n1 + m1))
                                 + 4e0 * (1e0 - psi) * psi * n1 * m1)))
                         / (2e0 * (1e0 - psi))) <= CAST(least(n1, m1) AS DOUBLE)
                       AND (-(n0 - m1 + psi * (n1 + m1))
                            + sqrt(greatest(0e0, (n0 - m1 + psi * (n1 + m1))
                                   * (n0 - m1 + psi * (n1 + m1))
                                   + 4e0 * (1e0 - psi) * psi * n1 * m1)))
                           / (2e0 * (1e0 - psi)) >= greatest(0e0, CAST(m1 - n0 AS DOUBLE))
                      THEN sqrt(greatest(0e0, (n0 - m1 + psi * (n1 + m1))
                                * (n0 - m1 + psi * (n1 + m1))
                                + 4e0 * (1e0 - psi) * psi * n1 * m1))
                      ELSE -sqrt(greatest(0e0, (n0 - m1 + psi * (n1 + m1))
                                 * (n0 - m1 + psi * (n1 + m1))
                                 + 4e0 * (1e0 - psi) * psi * n1 * m1)) END
                    ) / (2e0 * (1e0 - psi)) END AS e
            FROM marg
        ),
        terms AS (
            SELECT CAST(round(1e6 * CASE WHEN e > 1e-9 AND n1 - e > 1e-9
                        AND m1 - e > 1e-9 AND n0 - m1 + e > 1e-9
                        THEN (a - e) * (a - e)
                        * (1e0 / e + 1e0 / (n1 - e) + 1e0 / (m1 - e)
                           + 1e0 / (n0 - m1 + e)) ELSE 0e0 END)
                        AS BIGINT) AS term_micro,
                   CAST(round(1e6 * psi) AS BIGINT) AS psi_micro
            FROM ex
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
               CAST(round(psi_micro / 1000.0) AS BIGINT) AS or_mh_milli,
               CAST(round(CAST(SUM(term_micro) AS BIGINT) / 1000.0)
                    AS BIGINT) AS bd_chi2_milli
        FROM terms
        GROUP BY psi_micro
    """


# --- Brunner-Munzel generalized Wilcoxon -------------------------------------------------------


def brunner_munzel_weekend(events: DataFrame) -> DataFrame:
    """Brunner-Munzel test of weekend vs weekday event values: one row
    (n_weekday, n_weekend, p_hat_micro, w_milli, df_milli).

    events_mannwhitney_u assumes equal shapes/variances under the null
    (pure exchangeability); Brunner-Munzel drops that — it estimates
    P(X < Y) + P(X = Y)/2 directly and studentizes with per-group rank
    variances, staying valid when the weekend distribution is wider,
    not just shifted (the documented failure mode of WMW under
    heteroscedasticity). W = n_x*n_y*(Rbar_y - Rbar_x) / (N*sqrt(n_x*S_x
    + n_y*S_y)) with S_g the variance of (pooled - within - mean)
    rank deviations; Welch-Satterthwaite df from the same two sums.

    Exactness: values quantize to cents; pooled (r2) and within-group
    (w2) DOUBLED midranks are exact BIGINTs off the cent grids; each
    cell's m*dev^2/(n_g-1) quantizes to micro before the per-group
    integer sum; the final W/p-hat/df chain is one identical double
    chain in both engines.

    Scale shape: one (cents) + one (group, cents) aggregate, cumulative
    windows on those bounded grids only, one 2-row group broadcast."""
    g = (F.dayofweek("ts").isin(1, 7)).cast("int")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    vals = events.select(g.alias("g"), cents.alias("c"))
    per_c = vals.groupBy("c").agg(F.count("*").cast("long").alias("t"))
    wcum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    pooled = per_c.select(
        "c", (2 * F.sum("t").over(wcum) - F.col("t") + 1).alias("r2")
    )
    per_gc = vals.groupBy("g", "c").agg(F.count("*").cast("long").alias("m"))
    wg = (
        Window.partitionBy("g")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = per_gc.select(
        "g", "c", "m", (2 * F.sum("m").over(wg) - F.col("m") + 1).alias("w2")
    )
    cells = within.join(pooled, "c")
    grp = cells.groupBy("g").agg(
        F.sum("m").cast("long").alias("n_g"),
        F.sum(F.col("m") * F.col("r2")).cast("long").alias("sr2"),
    )
    s = (
        cells.join(grp, "g")
        .select(
            "g",
            "n_g",
            "sr2",
            F.expr(
                "CAST(round(1e6 * CASE WHEN n_g > 1 THEN m"
                " * (((r2 - w2) - CAST(sr2 AS DOUBLE) / n_g + (n_g + 1))"
                "    / 2e0)"
                " * (((r2 - w2) - CAST(sr2 AS DOUBLE) / n_g + (n_g + 1))"
                "    / 2e0) / (n_g - 1) ELSE 0e0 END) AS BIGINT)"
            ).alias("cell_micro"),
        )
        .groupBy("g", "n_g", "sr2")
        .agg(F.sum("cell_micro").cast("long").alias("s_micro"))
    )
    one = s.agg(
        F.max(F.when(F.col("g") == 0, F.col("n_g"))).alias("nx"),
        F.max(F.when(F.col("g") == 0, F.col("sr2"))).alias("rx"),
        F.max(F.when(F.col("g") == 0, F.col("s_micro"))).alias("sx"),
        F.max(F.when(F.col("g") == 1, F.col("n_g"))).alias("ny"),
        F.max(F.when(F.col("g") == 1, F.col("sr2"))).alias("ry"),
        F.max(F.when(F.col("g") == 1, F.col("s_micro"))).alias("sy"),
    )
    return one.select(
        F.col("nx").alias("n_weekday"),
        F.col("ny").alias("n_weekend"),
        F.expr(
            "CAST(round(1e6 * (CAST(ry AS DOUBLE) / (2e0 * ny)"
            " - (ny + 1) / 2e0) / nx) AS BIGINT)"
        ).alias("p_hat_micro"),
        F.expr(
            "CAST(CASE WHEN nx * (sx / 1e6) + ny * (sy / 1e6) > 0e0 THEN"
            " round(1000.0 * CAST(nx AS DOUBLE) * ny"
            "  * (CAST(ry AS DOUBLE) / (2e0 * ny)"
            "     - CAST(rx AS DOUBLE) / (2e0 * nx))"
            "  / ((CAST(nx AS DOUBLE) + ny)"
            "     * sqrt(nx * (sx / 1e6) + ny * (sy / 1e6))))"
            " ELSE 0 END AS BIGINT)"
        ).alias("w_milli"),
        F.expr(
            "CAST(CASE WHEN nx > 1 AND ny > 1"
            " AND (nx * (sx / 1e6)) * (nx * (sx / 1e6)) / (nx - 1)"
            "     + (ny * (sy / 1e6)) * (ny * (sy / 1e6)) / (ny - 1) > 0e0"
            " THEN round(1000.0"
            "  * (nx * (sx / 1e6) + ny * (sy / 1e6))"
            "  * (nx * (sx / 1e6) + ny * (sy / 1e6))"
            "  / ((nx * (sx / 1e6)) * (nx * (sx / 1e6)) / (nx - 1)"
            "     + (ny * (sy / 1e6)) * (ny * (sy / 1e6)) / (ny - 1)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("df_milli"),
    )


def brunner_munzel_weekend_sql() -> str:
    return """
        WITH vals AS (
            SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS g,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        per_c AS (
            SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM vals GROUP BY c
        ),
        pooled AS (
            SELECT c, 2 * SUM(t) OVER (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - t + 1 AS r2
            FROM per_c
        ),
        per_gc AS (
            SELECT g, c, CAST(COUNT(*) AS BIGINT) AS m
            FROM vals GROUP BY g, c
        ),
        within AS (
            SELECT g, c, m,
                   2 * SUM(m) OVER (PARTITION BY g ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - m + 1 AS w2
            FROM per_gc
        ),
        cells AS (
            SELECT g, m, w2, r2 FROM within JOIN pooled USING (c)
        ),
        grp AS (
            SELECT g, CAST(SUM(m) AS BIGINT) AS n_g,
                   CAST(SUM(m * r2) AS BIGINT) AS sr2
            FROM cells GROUP BY g
        ),
        s AS (
            SELECT c2.g, n_g, sr2,
                   CAST(SUM(CAST(round(1e6 * CASE WHEN n_g > 1 THEN m
                       * (((r2 - w2) - CAST(sr2 AS DOUBLE) / n_g + (n_g + 1))
                          / 2e0)
                       * (((r2 - w2) - CAST(sr2 AS DOUBLE) / n_g + (n_g + 1))
                          / 2e0) / (n_g - 1) ELSE 0e0 END) AS BIGINT))
                       AS BIGINT) AS s_micro
            FROM cells c2 JOIN grp USING (g)
            GROUP BY c2.g, n_g, sr2
        ),
        one AS (
            SELECT MAX(CASE WHEN g = 0 THEN n_g END) AS nx,
                   MAX(CASE WHEN g = 0 THEN sr2 END) AS rx,
                   MAX(CASE WHEN g = 0 THEN s_micro END) AS sx,
                   MAX(CASE WHEN g = 1 THEN n_g END) AS ny,
                   MAX(CASE WHEN g = 1 THEN sr2 END) AS ry,
                   MAX(CASE WHEN g = 1 THEN s_micro END) AS sy
            FROM s
        )
        SELECT nx AS n_weekday, ny AS n_weekend,
               CAST(round(1e6 * (CAST(ry AS DOUBLE) / (2e0 * ny)
                    - (ny + 1) / 2e0) / nx) AS BIGINT) AS p_hat_micro,
               CAST(CASE WHEN nx * (sx / 1e6) + ny * (sy / 1e6) > 0e0 THEN
                    round(1000.0 * CAST(nx AS DOUBLE) * ny
                     * (CAST(ry AS DOUBLE) / (2e0 * ny)
                        - CAST(rx AS DOUBLE) / (2e0 * nx))
                     / ((CAST(nx AS DOUBLE) + ny)
                        * sqrt(nx * (sx / 1e6) + ny * (sy / 1e6))))
                    ELSE 0 END AS BIGINT) AS w_milli,
               CAST(CASE WHEN nx > 1 AND ny > 1
                    AND (nx * (sx / 1e6)) * (nx * (sx / 1e6)) / (nx - 1)
                        + (ny * (sy / 1e6)) * (ny * (sy / 1e6)) / (ny - 1) > 0e0
                    THEN round(1000.0
                     * (nx * (sx / 1e6) + ny * (sy / 1e6))
                     * (nx * (sx / 1e6) + ny * (sy / 1e6))
                     / ((nx * (sx / 1e6)) * (nx * (sx / 1e6)) / (nx - 1)
                        + (ny * (sy / 1e6)) * (ny * (sy / 1e6)) / (ny - 1)))
                    ELSE 0 END AS BIGINT) AS df_milli
        FROM one
    """


# --- Dunn's post-hoc rank comparisons ----------------------------------------------------------


def dunn_posthoc_types(events: DataFrame) -> DataFrame:
    """Dunn's post-hoc pairwise rank comparisons across event types: rows
    (type_a, type_b, n_a, n_b, z_milli) ordered by (type_a, type_b).

    events_kruskal_wallis says WHETHER the type value distributions
    differ; Dunn's test is the matching post-hoc — which PAIRS differ —
    reusing the pooled midranks (never re-ranking each pair, which
    breaks the KW alignment): z_ab = (Rbar_a - Rbar_b) / sqrt((N(N+1)/12
    - T/(12(N-1))) * (1/n_a + 1/n_b)) with T = sum(t^3 - t) the shared
    tie correction.

    Exactness: the doubled-midrank sums r2_g and the tie cube T are
    exact integers off the cent grid (the KW chain verbatim); each
    pair's z is one identical double chain over the bounded <=|types|^2
    grid.

    Scale shape: one (cents) + one (type, cents) aggregate, a
    <=|types|^2/2 self-join on the group relation, one 1-row totals
    broadcast."""
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    vals = events.select("event_type", cents.alias("c"))
    per_c = vals.groupBy("c").agg(F.count("*").cast("long").alias("t"))
    wcum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_c.select(
        "c",
        "t",
        (2 * F.sum("t").over(wcum) - F.col("t") + 1).alias("r2"),
    )
    per_tc = vals.groupBy("event_type", "c").agg(
        F.count("*").cast("long").alias("m")
    )
    groups = (
        per_tc.join(ranked.select("c", "r2"), "c")
        .groupBy("event_type")
        .agg(
            F.sum("m").cast("long").alias("n_g"),
            F.sum(F.col("m") * F.col("r2")).cast("long").alias("r2_g"),
        )
    )
    tot = ranked.agg(
        F.sum("t").cast("long").alias("n_tot"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        )
        .cast("double")
        .alias("tie3"),
    )
    a = groups.select(
        F.col("event_type").alias("type_a"),
        F.col("n_g").alias("n_a"),
        F.col("r2_g").alias("r2_a"),
    )
    b = groups.select(
        F.col("event_type").alias("type_b"),
        F.col("n_g").alias("n_b"),
        F.col("r2_g").alias("r2_b"),
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.expr(
                "CAST(CASE WHEN n_tot > 1 AND"
                " (CAST(n_tot AS DOUBLE) * (n_tot + 1) / 12e0"
                "  - tie3 / (12e0 * (n_tot - 1)))"
                " * (1e0 / n_a + 1e0 / n_b) > 0e0"
                " THEN round(1000.0"
                "  * (CAST(r2_a AS DOUBLE) / (2e0 * n_a)"
                "     - CAST(r2_b AS DOUBLE) / (2e0 * n_b))"
                "  / sqrt((CAST(n_tot AS DOUBLE) * (n_tot + 1) / 12e0"
                "          - tie3 / (12e0 * (n_tot - 1)))"
                "         * (1e0 / n_a + 1e0 / n_b)))"
                " ELSE 0 END AS BIGINT)"
            ).alias("z_milli"),
        )
        .orderBy("type_a", "type_b")
    )


def dunn_posthoc_types_sql() -> str:
    return """
        WITH vals AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        per_c AS (
            SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM vals GROUP BY c
        ),
        ranked AS (
            SELECT c, t,
                   2 * SUM(t) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - t + 1 AS r2
            FROM per_c
        ),
        per_tc AS (
            SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS m
            FROM vals GROUP BY event_type, c
        ),
        groups AS (
            SELECT event_type, CAST(SUM(m) AS BIGINT) AS n_g,
                   CAST(SUM(m * r2) AS BIGINT) AS r2_g
            FROM per_tc JOIN ranked USING (c)
            GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n_tot,
                   CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS DOUBLE) AS tie3
            FROM ranked
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.n_g AS n_a, b.n_g AS n_b,
               CAST(CASE WHEN n_tot > 1 AND
                    (CAST(n_tot AS DOUBLE) * (n_tot + 1) / 12e0
                     - tie3 / (12e0 * (n_tot - 1)))
                    * (1e0 / a.n_g + 1e0 / b.n_g) > 0e0
                    THEN round(1000.0
                     * (CAST(a.r2_g AS DOUBLE) / (2e0 * a.n_g)
                        - CAST(b.r2_g AS DOUBLE) / (2e0 * b.n_g))
                     / sqrt((CAST(n_tot AS DOUBLE) * (n_tot + 1) / 12e0
                             - tie3 / (12e0 * (n_tot - 1)))
                            * (1e0 / a.n_g + 1e0 / b.n_g)))
                    ELSE 0 END AS BIGINT) AS z_milli
        FROM groups a JOIN groups b ON a.event_type < b.event_type
        CROSS JOIN tot
        ORDER BY type_a, type_b
    """


# --- SAX motif discovery -----------------------------------------------------------------------

SAX_TOP_K = 10
SAX_WORD = 3


def sax_motifs_daily(events: DataFrame) -> DataFrame:
    """SAX motif discovery over the daily click series: top-10 rows
    (word, n_occurrences) by frequency — symbolic 3-day patterns after
    z-normalizing and discretizing each day into a 4-letter Gaussian
    alphabet (breakpoints -0.6745/0/0.6745, the N(0,1) quartiles).

    events_spectral_periodogram finds PERIODIC structure; SAX motifs
    find REPEATED LOCAL SHAPES regardless of phase — the standard
    time-series-mining reduction (Lin et al.'s symbolic representation)
    that turns subsequence matching into exact string counting, which
    is what a relational engine does best. Recurring 'dcd' spikes or
    'aaa' troughs surface as high-count words.

    Exactness: daily counts are exact BIGINTs; mean/variance come off
    integer sums; each day's letter is a CASE over one identical
    z double chain; words concatenate via two bounded LEADs; count
    ties break lexicographically in the bounded top-k sort.

    Scale shape: one (day) aggregate, one 1-row moment broadcast, two
    LEADs on the bounded day grid, one (word) aggregate + limit sort."""
    per_day = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("x")
    )
    mom = per_day.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    lettered = per_day.crossJoin(F.broadcast(mom)).select(
        "day",
        F.expr(
            "CASE WHEN n > 1 AND (CAST(sxx AS DOUBLE)"
            "     - CAST(sx AS DOUBLE) * sx / n) / (n - 1) > 0e0 THEN"
            " CASE WHEN (x - CAST(sx AS DOUBLE) / n)"
            "      / sqrt((CAST(sxx AS DOUBLE)"
            "              - CAST(sx AS DOUBLE) * sx / n) / (n - 1))"
            "      < -0.6745e0 THEN 'a'"
            " WHEN (x - CAST(sx AS DOUBLE) / n)"
            "      / sqrt((CAST(sxx AS DOUBLE)"
            "              - CAST(sx AS DOUBLE) * sx / n) / (n - 1))"
            "      < 0e0 THEN 'b'"
            " WHEN (x - CAST(sx AS DOUBLE) / n)"
            "      / sqrt((CAST(sxx AS DOUBLE)"
            "              - CAST(sx AS DOUBLE) * sx / n) / (n - 1))"
            "      < 0.6745e0 THEN 'c'"
            " ELSE 'd' END ELSE 'b' END"
        ).alias("letter"),
    )
    wd = Window.orderBy("day")
    words = lettered.select(
        F.concat(
            F.col("letter"),
            F.lead("letter", 1).over(wd),
            F.lead("letter", 2).over(wd),
        ).alias("word")
    ).where(F.col("word").isNotNull())
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "word")
        .limit(SAX_TOP_K)
    )


def sax_motifs_daily_sql() -> str:
    return f"""
        WITH per_day AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx
            FROM per_day
        ),
        lettered AS (
            SELECT day,
                   CASE WHEN n > 1 AND (CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * sx / n) / (n - 1) > 0e0 THEN
                    CASE WHEN (x - CAST(sx AS DOUBLE) / n)
                         / sqrt((CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
                         < -0.6745e0 THEN 'a'
                    WHEN (x - CAST(sx AS DOUBLE) / n)
                         / sqrt((CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
                         < 0e0 THEN 'b'
                    WHEN (x - CAST(sx AS DOUBLE) / n)
                         / sqrt((CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
                         < 0.6745e0 THEN 'c'
                    ELSE 'd' END ELSE 'b' END AS letter
            FROM per_day CROSS JOIN mom
        ),
        words AS (
            SELECT letter
                   || LEAD(letter, 1) OVER (ORDER BY day)
                   || LEAD(letter, 2) OVER (ORDER BY day) AS word
            FROM lettered
        )
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM words WHERE word IS NOT NULL
        GROUP BY word
        ORDER BY n_occurrences DESC, word ASC
        LIMIT {SAX_TOP_K}
    """


# --- Zero-inflation score test -----------------------------------------------------------------


def zero_inflation_score(events: DataFrame) -> DataFrame:
    """van den Broek score test for excess zeros in per-user-day purchase
    counts: one row (n_cells, n_zero, lambda_micro, s_milli).

    events_overdispersion flags variance > mean; this asks the sharper
    question — are there MORE ZERO days than a Poisson with the
    observed rate allows (the signature of a dormant-vs-active user
    mixture, which a plain Poisson model of purchase intensity
    silently misfits)? S = (n0 - n*p0)^2 / (n*p0*(1-p0) -
    n*lambda*p0^2) with p0 = exp(-lambda), ~ chi2(1) under the Poisson
    null. Cells are user-days with ANY activity, so the zeros are real
    observed-but-idle exposures, not structural absences.

    Exactness: cell counts and the zero tally are exact BIGINTs off one
    (user, day) aggregate; lambda and the score statistic are one
    identical double chain at the 1-row emit.

    Scale shape: one (user, day) aggregate, one global reduction —
    nothing data-sized past the first shuffle."""
    cells = events.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("y")
    )
    agg = cells.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("y") == 0).cast("long")).cast("long").alias("n0"),
        F.sum("y").cast("long").alias("sy"),
    )
    return agg.select(
        F.col("n").alias("n_cells"),
        F.col("n0").alias("n_zero"),
        F.expr(
            "CAST(round(1e6 * CAST(sy AS DOUBLE) / n) AS BIGINT)"
        ).alias("lambda_micro"),
        F.expr(
            "CAST(CASE WHEN n * exp(-CAST(sy AS DOUBLE) / n)"
            "     * (1e0 - exp(-CAST(sy AS DOUBLE) / n))"
            "     - CAST(sy AS DOUBLE)"
            "       * exp(-CAST(sy AS DOUBLE) / n)"
            "       * exp(-CAST(sy AS DOUBLE) / n) > 0e0"
            " THEN round(1000.0"
            "  * (n0 - n * exp(-CAST(sy AS DOUBLE) / n))"
            "  * (n0 - n * exp(-CAST(sy AS DOUBLE) / n))"
            "  / (n * exp(-CAST(sy AS DOUBLE) / n)"
            "     * (1e0 - exp(-CAST(sy AS DOUBLE) / n))"
            "     - CAST(sy AS DOUBLE)"
            "       * exp(-CAST(sy AS DOUBLE) / n)"
            "       * exp(-CAST(sy AS DOUBLE) / n)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("s_milli"),
    )


def zero_inflation_score_sql() -> str:
    return """
        WITH cells AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n0,
                   CAST(SUM(y) AS BIGINT) AS sy
            FROM cells
        )
        SELECT n AS n_cells, n0 AS n_zero,
               CAST(round(1e6 * CAST(sy AS DOUBLE) / n) AS BIGINT)
                   AS lambda_micro,
               CAST(CASE WHEN n * exp(-CAST(sy AS DOUBLE) / n)
                    * (1e0 - exp(-CAST(sy AS DOUBLE) / n))
                    - CAST(sy AS DOUBLE)
                      * exp(-CAST(sy AS DOUBLE) / n)
                      * exp(-CAST(sy AS DOUBLE) / n) > 0e0
                THEN round(1000.0
                 * (n0 - n * exp(-CAST(sy AS DOUBLE) / n))
                 * (n0 - n * exp(-CAST(sy AS DOUBLE) / n))
                 / (n * exp(-CAST(sy AS DOUBLE) / n)
                    * (1e0 - exp(-CAST(sy AS DOUBLE) / n))
                    - CAST(sy AS DOUBLE)
                      * exp(-CAST(sy AS DOUBLE) / n)
                      * exp(-CAST(sy AS DOUBLE) / n)))
                ELSE 0 END AS BIGINT) AS s_milli
        FROM agg
    """


# --- Harrell's concordance index ---------------------------------------------------------------

CINDEX_HORIZON_DAYS = 14
CINDEX_MAX_USERS = 256


def harrell_c_index(
    events: DataFrame,
    horizon: int = CINDEX_HORIZON_DAYS,
    max_users: int = CINDEX_MAX_USERS,
) -> DataFrame:
    """Harrell's concordance index of click volume as a predictor of
    time-to-first-purchase: one row (n_users, n_pairs, c_index_micro).

    events_kaplan_meier/nelson_aalen DESCRIBE the conversion process;
    the C-index EVALUATES a predictor of it — over every comparable
    user pair (i converts strictly earlier and is uncensored), does the
    higher-risk score (more clicks) belong to the earlier converter?
    C = (#concordant + 0.5 * #score-ties) / #comparable — THE standard
    discrimination metric for survival models, censoring-aware where
    plain rank correlation is not. Duration = days from first activity
    to first purchase, administratively censored at the horizon (the
    discrete_hazard convention).

    Exactness: durations, event flags, and click scores are exact
    integers; concordance counts in DOUBLED units (2 concordant / 1
    tie) so the half-credit never floats; one division at the emit.

    Scale shape: one user-grain aggregate, a deterministic md5-ordered
    cap to <=max_users rows (the sample-entropy discipline), one
    bounded <=max_users^2 pair join, one 1-row reduction."""
    from ..llm.hashing import md5_int

    per_user = (
        events.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("t0"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase", F.to_date("ts")
                )
            ).alias("tp"),
            F.sum((F.col("event_type") == "click").cast("long"))
            .cast("long")
            .alias("score"),
        )
        .select(
            "user_id",
            "score",
            F.expr(
                f"CAST(CASE WHEN tp IS NOT NULL"
                f" AND datediff(tp, t0) <= {horizon}"
                f" THEN datediff(tp, t0) ELSE {horizon} END AS BIGINT)"
            ).alias("t"),
            F.expr(
                f"CAST(CASE WHEN tp IS NOT NULL"
                f" AND datediff(tp, t0) <= {horizon}"
                f" THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("ev"),
        )
    )
    sample = (
        per_user.withColumn("hk", md5_int(F.col("user_id").cast("string")))
        .orderBy("hk", "user_id")
        .limit(max_users)
        .select("user_id", "score", "t", "ev")
    )
    a = sample.select(
        F.col("user_id").alias("ua"),
        F.col("score").alias("sa"),
        F.col("t").alias("ta"),
        F.col("ev").alias("eva"),
    )
    b = sample.select(
        F.col("user_id").alias("ub"),
        F.col("score").alias("sb"),
        F.col("t").alias("tb"),
    )
    pairs = a.join(
        b,
        (F.col("ta") < F.col("tb")) & (F.col("eva") == 1),
    ).select(
        F.when(F.col("sa") > F.col("sb"), F.lit(2))
        .when(F.col("sa") == F.col("sb"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("conc2")
    )
    n_users = sample.agg(F.count("*").cast("long").alias("n_users"))
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.coalesce(F.sum("conc2"), F.lit(0)).cast("long").alias("c2"),
    )
    return n_users.crossJoin(F.broadcast(agg)).select(
        "n_users",
        "n_pairs",
        F.expr(
            "CAST(CASE WHEN n_pairs > 0 THEN round(1e6 * CAST(c2 AS DOUBLE)"
            " / (2e0 * n_pairs)) ELSE 0 END AS BIGINT)"
        ).alias("c_index_micro"),
    )


def harrell_c_index_sql(
    horizon: int = CINDEX_HORIZON_DAYS, max_users: int = CINDEX_MAX_USERS
) -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) AS BIGINT) AS score,
                   CAST(CASE WHEN MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END) IS NOT NULL
                        AND date_diff('day', MIN(CAST(ts AS DATE)),
                            MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END)) <= {horizon}
                        THEN date_diff('day', MIN(CAST(ts AS DATE)),
                            MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END))
                        ELSE {horizon} END AS BIGINT) AS t,
                   CAST(CASE WHEN MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END) IS NOT NULL
                        AND date_diff('day', MIN(CAST(ts AS DATE)),
                            MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END)) <= {horizon}
                        THEN 1 ELSE 0 END AS BIGINT) AS ev
            FROM events GROUP BY user_id
        ),
        sample_u AS (
            SELECT user_id, score, t, ev
            FROM per_user
            ORDER BY CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1,
                15)) AS UBIGINT)::BIGINT, user_id
            LIMIT {max_users}
        ),
        pairs AS (
            SELECT CASE WHEN a.score > b.score THEN 2
                        WHEN a.score = b.score THEN 1 ELSE 0 END AS conc2
            FROM sample_u a JOIN sample_u b
              ON a.t < b.t AND a.ev = 1
        ),
        nu AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM sample_u
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(COALESCE(SUM(conc2), 0) AS BIGINT) AS c2
            FROM pairs
        )
        SELECT n_users, n_pairs,
               CAST(CASE WHEN n_pairs > 0 THEN round(1e6 * CAST(c2 AS DOUBLE)
                    / (2e0 * n_pairs)) ELSE 0 END AS BIGINT) AS c_index_micro
        FROM nu CROSS JOIN agg
    """


# --- Information-gain decision stump -------------------------------------------------------------


def _bent(a: str, m: str) -> str:
    """Binary entropy (nats) of a/m as an engine-identical SQL fragment;
    0 when degenerate so 0*ln(0) never evaluates."""
    return (
        f"CASE WHEN ({m}) > 0 AND ({a}) > 0 AND ({a}) < ({m}) THEN"
        f" -(CAST({a} AS DOUBLE) / ({m})) * ln(CAST({a} AS DOUBLE) / ({m}))"
        f" - (CAST(({m}) - ({a}) AS DOUBLE) / ({m}))"
        f" * ln(CAST(({m}) - ({a}) AS DOUBLE) / ({m}))"
        f" ELSE 0e0 END"
    )


def decision_stump_engagement(events: DataFrame) -> DataFrame:
    """Best information-gain decision stump predicting conversion from
    user activity: one row (n_users, split_value, ig_micro, n_left,
    pos_left, n_right, pos_right).

    events_woe_iv scores FIXED bins; a stump SEARCHES every candidate
    threshold on the activity grid for the split that maximizes
    information gain — the inner loop of every tree learner, expressed
    as one cumulative pass: the (value) grid's running (count, positive)
    prefix gives each threshold's left/right entropy in closed form, so
    "train a depth-1 tree" is a window + argmax, not an iterative
    scanner. The winning split is the natural activation threshold for
    the engagement-based targeting rules downstream devices assume.

    Exactness: grid counts and prefixes are exact BIGINTs; each
    threshold's gain is one identical double chain quantized to micro;
    the argmax breaks ties to the smallest split via the bounded
    (ig DESC, v ASC) limit-1 sort.

    Scale shape: one user-grain aggregate, one (value) grid aggregate +
    cumulative window, one 1-row totals broadcast, one bounded limit
    sort."""
    per_user = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("v"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("conv"),
    )
    grid = per_user.groupBy("v").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("conv").cast("long").alias("pos"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cums = grid.select(
        "v",
        F.sum("cnt").over(wc).cast("long").alias("cl"),
        F.sum("pos").over(wc).cast("long").alias("pl"),
    )
    tot = grid.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    ig = (
        f"{_bent('p', 'n')}"
        f" - (CAST(cl AS DOUBLE) / n) * ({_bent('pl', 'cl')})"
        f" - (CAST(n - cl AS DOUBLE) / n) * ({_bent('p - pl', 'n - cl')})"
    )
    scored = (
        cums.crossJoin(F.broadcast(tot))
        .where(F.col("cl") < F.col("n"))
        .select(
            "v",
            "n",
            "p",
            "cl",
            "pl",
            F.expr(f"CAST(round(1e6 * ({ig})) AS BIGINT)").alias("ig_micro"),
        )
    )
    return (
        scored.orderBy(F.col("ig_micro").desc(), F.col("v").asc())
        .limit(1)
        .select(
            F.col("n").alias("n_users"),
            F.col("v").alias("split_value"),
            "ig_micro",
            F.col("cl").alias("n_left"),
            F.col("pl").alias("pos_left"),
            (F.col("n") - F.col("cl")).alias("n_right"),
            (F.col("p") - F.col("pl")).alias("pos_right"),
        )
    )


def decision_stump_engagement_sql() -> str:
    ig = (
        f"{_bent('p', 'n')}"
        f" - (CAST(cl AS DOUBLE) / n) * ({_bent('pl', 'cl')})"
        f" - (CAST(n - cl AS DOUBLE) / n) * ({_bent('p - pl', 'n - cl')})"
    )
    return f"""
        WITH per_user AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS v,
                   CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS BIGINT) AS conv
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(conv) AS BIGINT) AS pos
            FROM per_user GROUP BY v
        ),
        cums AS (
            SELECT v,
                   CAST(SUM(cnt) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cl,
                   CAST(SUM(pos) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS pl
            FROM grid
        ),
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(SUM(pos) AS BIGINT) AS p
            FROM grid
        ),
        scored AS (
            SELECT v, n, p, cl, pl,
                   CAST(round(1e6 * ({ig})) AS BIGINT) AS ig_micro
            FROM cums CROSS JOIN tot
            WHERE cl < n
        )
        SELECT n AS n_users, v AS split_value, ig_micro,
               cl AS n_left, pl AS pos_left,
               n - cl AS n_right, p - pl AS pos_right
        FROM scored
        ORDER BY ig_micro DESC, v ASC
        LIMIT 1
    """


# --- Regression discontinuity at the median activity cutoff --------------------------------------


def regression_discontinuity(events: DataFrame) -> DataFrame:
    """Sharp regression-discontinuity estimate of the conversion jump at
    the median-activity cutoff: one row (cutoff, bandwidth, n_left,
    n_right, jump_micro, slope_l_micro, slope_r_micro).

    events_diff_in_diff needs a time dimension; RDD is the causal device
    for a THRESHOLD rule (bonus at x >= c, rate limit, loyalty tier):
    fit local linear regressions of conversion on centered activity on
    each side of the cutoff within a bandwidth, and read the jump
    between the two intercepts at the cutoff. Cutoff = exact lower
    median of per-user activity (data-driven, deterministic), bandwidth
    = half the cutoff.

    Exactness: the median comes off the integer activity grid
    cumulative; per-side OLS runs on exact integer sums (y is 0/1, x is
    centered activity); slopes/intercepts are one identical double
    chain; zero-variance sides degrade to the side mean.

    Scale shape: one user-grain aggregate, one (value) grid cumulative
    for the median, one 1-row cutoff broadcast, one bounded per-side
    reduction."""
    per_user = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("v"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )
    grid = per_user.groupBy("v").agg(F.count("*").cast("long").alias("cnt"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cums = grid.select(
        "v", F.sum("cnt").over(wc).cast("long").alias("cum")
    )
    tot = cums.agg(F.max("cum").cast("long").alias("n"))
    cutoff = (
        cums.crossJoin(F.broadcast(tot))
        .where(F.col("cum") >= F.expr("(n + 1) DIV 2"))
        .agg(F.min("v").cast("long").alias("c"))
        .select("c", F.expr("greatest(c DIV 2, 1)").alias("bw"))
    )
    sides = (
        per_user.crossJoin(F.broadcast(cutoff))
        .where(
            (F.col("v") >= F.col("c") - F.col("bw"))
            & (F.col("v") < F.col("c") + F.col("bw"))
        )
        .select(
            "c",
            "bw",
            (F.col("v") >= F.col("c")).cast("int").alias("side"),
            (F.col("v") - F.col("c")).alias("x"),
            "y",
        )
    )
    per_side = sides.groupBy("c", "bw", "side").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    fit = (
        "CASE WHEN CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx <> 0e0"
        " THEN (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        " ELSE 0e0 END"
    )
    icept = f"(CAST(sy AS DOUBLE) - ({fit}) * sx) / m"
    one = per_side.groupBy("c", "bw").agg(
        F.max(F.when(F.col("side") == 0, F.col("m"))).alias("n_left"),
        F.max(F.when(F.col("side") == 1, F.col("m"))).alias("n_right"),
        F.max(
            F.when(F.col("side") == 0, F.expr(f"{icept}"))
        ).alias("al"),
        F.max(
            F.when(F.col("side") == 1, F.expr(f"{icept}"))
        ).alias("ar"),
        F.max(F.when(F.col("side") == 0, F.expr(fit))).alias("bl"),
        F.max(F.when(F.col("side") == 1, F.expr(fit))).alias("br"),
    )
    return one.select(
        F.col("c").alias("cutoff"),
        F.col("bw").alias("bandwidth"),
        "n_left",
        "n_right",
        F.expr("CAST(round(1e6 * (ar - al)) AS BIGINT)").alias("jump_micro"),
        F.expr("CAST(round(1e6 * bl) AS BIGINT)").alias("slope_l_micro"),
        F.expr("CAST(round(1e6 * br) AS BIGINT)").alias("slope_r_micro"),
    )


def regression_discontinuity_sql() -> str:
    fit = (
        "CASE WHEN CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx <> 0e0"
        " THEN (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        " ELSE 0e0 END"
    )
    icept = f"(CAST(sy AS DOUBLE) - ({fit}) * sx) / m"
    return f"""
        WITH per_user AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS v,
                   CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS BIGINT) AS y
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM per_user GROUP BY v
        ),
        cums AS (
            SELECT v, CAST(SUM(cnt) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
            FROM grid
        ),
        tot AS (
            SELECT CAST(MAX(cum) AS BIGINT) AS n FROM cums
        ),
        cutoff AS (
            SELECT CAST(MIN(v) AS BIGINT) AS c,
                   greatest(CAST(MIN(v) AS BIGINT) // 2, 1) AS bw
            FROM cums CROSS JOIN tot
            WHERE cum >= (n + 1) // 2
        ),
        sides AS (
            SELECT c, bw,
                   CASE WHEN v >= c THEN 1 ELSE 0 END AS side,
                   v - c AS x, y
            FROM per_user CROSS JOIN cutoff
            WHERE v >= c - bw AND v < c + bw
        ),
        per_side AS (
            SELECT c, bw, side,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM sides GROUP BY c, bw, side
        ),
        one AS (
            SELECT c, bw,
                   MAX(CASE WHEN side = 0 THEN m END) AS n_left,
                   MAX(CASE WHEN side = 1 THEN m END) AS n_right,
                   MAX(CASE WHEN side = 0 THEN {icept} END) AS al,
                   MAX(CASE WHEN side = 1 THEN {icept} END) AS ar,
                   MAX(CASE WHEN side = 0 THEN {fit} END) AS bl,
                   MAX(CASE WHEN side = 1 THEN {fit} END) AS br
            FROM per_side GROUP BY c, bw
        )
        SELECT c AS cutoff, bw AS bandwidth, n_left, n_right,
               CAST(round(1e6 * (ar - al)) AS BIGINT) AS jump_micro,
               CAST(round(1e6 * bl) AS BIGINT) AS slope_l_micro,
               CAST(round(1e6 * br) AS BIGINT) AS slope_r_micro
        FROM one
    """


# --- Fisher randomization inference --------------------------------------------------------------

RANDINF_REPS = 32


def randomization_inference(
    events: DataFrame, reps: int = RANDINF_REPS
) -> DataFrame:
    """Fisher randomization test of the parity-variant conversion lift:
    one row (n_users, diff_obs_micro, n_reps, n_extreme, p_micro).

    events_welch_ab_test buys its p-value from a normal approximation;
    randomization inference buys it from the DESIGN — re-randomize the
    treatment assignment (md5-derived, deterministic), recompute the
    rate difference under each pseudo-assignment, and count how often
    the sham |diff| reaches the observed one: p = (1 + #extreme) /
    (reps + 1), exact under the sharp null with zero distributional
    assumptions. The 32 replicates explode BEFORE the partial
    aggregate, so the whole test is one shuffle.

    Exactness: per-rep arm counts are exact integers; each rep's rate
    difference quantizes to micro before the exact |diff| comparison;
    the p-value is one integer division at the emit.

    Scale shape: one user-grain aggregate, a x(reps) literal explode on
    the user grain, one (rep, arm) rollup, one bounded reduction."""
    from ..llm.hashing import md5_int

    per_user = events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("conv"),
    )
    obs = per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.when(F.col("user_id") % 2 == 1, F.col("conv"))).alias("ct"),
        F.sum((F.col("user_id") % 2 == 1).cast("long")).alias("nt"),
        F.sum(F.when(F.col("user_id") % 2 == 0, F.col("conv"))).alias("cc"),
        F.sum((F.col("user_id") % 2 == 0).cast("long")).alias("nc"),
    ).select(
        "n_users",
        F.expr(
            "CAST(round(1e6 * (CAST(ct AS DOUBLE) / nt"
            " - CAST(cc AS DOUBLE) / nc)) AS BIGINT)"
        ).alias("diff_obs_micro"),
    )
    reps_df = (
        per_user.select(
            "user_id",
            "conv",
            F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("r"),
        )
        .select(
            "r",
            "conv",
            (
                md5_int(
                    F.concat_ws(
                        "_",
                        F.col("user_id").cast("string"),
                        F.col("r").cast("string"),
                    )
                )
                % 2
                == 1
            ).alias("treat"),
        )
        .groupBy("r")
        .agg(
            F.sum(F.when(F.col("treat"), F.col("conv"))).alias("ct"),
            F.sum(F.col("treat").cast("long")).alias("nt"),
            F.sum(F.when(~F.col("treat"), F.col("conv"))).alias("cc"),
            F.sum((~F.col("treat")).cast("long")).alias("nc"),
        )
        .select(
            F.expr(
                "CAST(CASE WHEN nt > 0 AND nc > 0 THEN"
                " round(1e6 * (CAST(ct AS DOUBLE) / nt"
                " - CAST(cc AS DOUBLE) / nc)) ELSE 0 END AS BIGINT)"
            ).alias("diff_micro")
        )
    )
    reps_agg = reps_df.crossJoin(F.broadcast(obs)).agg(
        F.max("n_users").alias("n_users"),
        F.max("diff_obs_micro").alias("diff_obs_micro"),
        F.count("*").cast("long").alias("n_reps"),
        F.sum(
            (F.abs(F.col("diff_micro")) >= F.abs(F.col("diff_obs_micro")))
            .cast("long")
        )
        .cast("long")
        .alias("n_extreme"),
    )
    return reps_agg.select(
        "n_users",
        "diff_obs_micro",
        "n_reps",
        "n_extreme",
        F.expr(
            "CAST(round(1e6 * (1e0 + n_extreme) / (n_reps + 1)) AS BIGINT)"
        ).alias("p_micro"),
    )


def randomization_inference_sql(reps: int = RANDINF_REPS) -> str:
    from ..llm.hashing import md5_int_sql

    h = md5_int_sql("CAST(user_id AS VARCHAR) || '_' || CAST(r AS VARCHAR)")
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS BIGINT) AS conv
            FROM events GROUP BY user_id
        ),
        obs AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(round(1e6 * (
                       CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv END)
                            AS DOUBLE)
                       / SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                       - CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv END)
                              AS DOUBLE)
                       / SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)))
                       AS BIGINT) AS diff_obs_micro
            FROM per_user
        ),
        expanded AS (
            SELECT user_id, conv,
                   unnest(generate_series(0, {reps - 1})) AS r
            FROM per_user
        ),
        assigned AS (
            SELECT r, conv,
                   ({h}) % 2 = 1 AS treat
            FROM expanded
        ),
        per_rep AS (
            SELECT r,
                   CAST(CASE WHEN SUM(CASE WHEN treat THEN 1 ELSE 0 END) > 0
                        AND SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) > 0
                        THEN round(1e6 * (
                            CAST(SUM(CASE WHEN treat THEN conv END)
                                 AS DOUBLE)
                            / SUM(CASE WHEN treat THEN 1 ELSE 0 END)
                            - CAST(SUM(CASE WHEN NOT treat THEN conv END)
                                   AS DOUBLE)
                            / SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END)))
                        ELSE 0 END AS BIGINT) AS diff_micro
            FROM assigned GROUP BY r
        )
        SELECT MAX(n_users) AS n_users,
               MAX(diff_obs_micro) AS diff_obs_micro,
               CAST(COUNT(*) AS BIGINT) AS n_reps,
               CAST(SUM(CASE WHEN abs(diff_micro) >= abs(diff_obs_micro)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
               CAST(round(1e6 * (1e0 + SUM(CASE WHEN abs(diff_micro)
                    >= abs(diff_obs_micro) THEN 1 ELSE 0 END))
                    / (COUNT(*) + 1)) AS BIGINT) AS p_micro
        FROM per_rep CROSS JOIN obs
    """


# --- Chatterjee's xi dependence coefficient -------------------------------------------------------


def chatterjee_xi_daily(events: DataFrame) -> DataFrame:
    """Chatterjee's xi coefficient of daily error load as a function of
    daily click load: one row (n_days, sum_abs_dr, denom2, xi_milli).

    events_spearman_daily and kendall_tau detect MONOTONE association
    and events_mutual_information needs binning; Chatterjee's xi (2020)
    is the modern assumption-free dependence coefficient — 0 iff
    independent, 1 iff y is a measurable function of x, monotone or
    not (a V-shaped load curve scores high where rho ~ 0). Computed in
    its exact tie-robust form: sort days by (clicks, day), take
    r_i = #{j: y_j <= y_i} and l_i = #{j: y_j >= y_i}; xi = 1 -
    n * sum|r_{i+1} - r_i| / (2 * sum l_i (n - l_i)). The day tiebreak
    makes the sort deterministic (stated: deterministic, not the
    randomized tie treatment of the paper).

    Exactness: fully integer — y-grid cumulatives give r and l exactly,
    the rank-step sum rides one bounded LEAD over the <=366-day grid,
    and xi is one division at the emit.

    Scale shape: one (day) aggregate, one (y) grid cumulative joined
    back, one bounded day-ordered LEAD, one 1-row reduction."""
    per_day = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("y"),
    )
    per_y = per_day.groupBy("y").agg(F.count("*").cast("long").alias("t"))
    wy = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    yrank = per_y.select(
        "y",
        F.sum("t").over(wy).cast("long").alias("r"),
        (F.sum("t").over(wy) - F.col("t")).cast("long").alias("below"),
    )
    tot = per_day.agg(F.count("*").cast("long").alias("n"))
    ranked = (
        per_day.join(yrank, "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "day", "x", "n", "r", (F.col("n") - F.col("below")).alias("l")
        )
    )
    wx = Window.orderBy("x", "day")
    stepped = ranked.select(
        "n",
        "l",
        F.abs(F.lead("r", 1).over(wx) - F.col("r")).alias("dr"),
    )
    agg = stepped.groupBy("n").agg(
        F.coalesce(F.sum("dr"), F.lit(0)).cast("long").alias("sdr"),
        F.sum(F.col("l") * (F.col("n") - F.col("l")))
        .cast("long")
        .alias("den"),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.col("sdr").alias("sum_abs_dr"),
        (2 * F.col("den")).alias("denom2"),
        F.expr(
            "CAST(CASE WHEN den > 0 THEN round(1000.0 * (1e0"
            " - CAST(n AS DOUBLE) * sdr / (2e0 * den))) ELSE 0 END"
            " AS BIGINT)"
        ).alias("xi_milli"),
    )


def chatterjee_xi_daily_sql() -> str:
    return """
        WITH per_day AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                       END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        per_y AS (
            SELECT y, CAST(COUNT(*) AS BIGINT) AS t FROM per_day GROUP BY y
        ),
        yrank AS (
            SELECT y,
                   CAST(SUM(t) OVER (ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS r,
                   CAST(SUM(t) OVER (ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - t AS BIGINT) AS below
            FROM per_y
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per_day
        ),
        ranked AS (
            SELECT day, x, n, r, n - below AS l
            FROM per_day JOIN yrank USING (y) CROSS JOIN tot
        ),
        stepped AS (
            SELECT n, l,
                   abs(LEAD(r, 1) OVER (ORDER BY x, day) - r) AS dr
            FROM ranked
        ),
        agg AS (
            SELECT n,
                   CAST(COALESCE(SUM(dr), 0) AS BIGINT) AS sdr,
                   CAST(SUM(l * (n - l)) AS BIGINT) AS den
            FROM stepped GROUP BY n
        )
        SELECT n AS n_days, sdr AS sum_abs_dr, 2 * den AS denom2,
               CAST(CASE WHEN den > 0 THEN round(1000.0 * (1e0
                    - CAST(n AS DOUBLE) * sdr / (2e0 * den))) ELSE 0 END
                    AS BIGINT) AS xi_milli
        FROM agg
    """


# --- User-level differential privacy release ------------------------------------------------------

DP_USER_CAP = 5
DP_USER_EPSILON_MILLI = 1000  # epsilon = 1.0


def dp_user_level_counts(
    events: DataFrame,
    cap: int = DP_USER_CAP,
    epsilon_milli: int = DP_USER_EPSILON_MILLI,
) -> DataFrame:
    """User-level DP release of per-type event counts: rows (event_type,
    true_n, clamped_n, noise_milli, noisy_n) ordered by event_type.

    text_dp_noisy_counts protects ROWS (sensitivity 1); protecting USERS
    is the guarantee privacy reviews actually demand, and it needs the
    step row-level DP skips: bound each user's contribution FIRST
    (clamp their per-type count at ``cap``), which fixes the user
    sensitivity at cap and prices the Laplace scale b = cap/epsilon.
    The clamped-vs-true gap ships as the visible bias the release
    trades for the stronger unit of protection.

    DETERMINISM NOTE (the dp_noisy_counts convention): the Laplace draw
    is inverse-CDF on the hash-uniform u = (md5(type) + 0.5)/2^60 —
    bit-reproducible in both engines; production swaps only the uniform
    source.

    Scale shape: one (user, type) aggregate, one (type) rollup, narrow
    per-row hash math — nothing data-sized past the first shuffle."""
    from ..llm.hashing import md5_int

    per_ut = events.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    per_t = per_ut.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("true_n"),
        F.sum(F.least(F.col("c"), F.lit(cap))).cast("long").alias("clamped_n"),
    )
    b_milli = (
        F.lit(cap * 1000 * 1000).cast("double")
        / F.lit(epsilon_milli).cast("double")
    )
    u = (
        md5_int(F.col("event_type")).cast("double") + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    centered = u - F.lit(0.5)
    noise_milli = F.round(
        -b_milli
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    ).cast("long")
    return (
        per_t.select(
            "event_type", "true_n", "clamped_n", noise_milli.alias("noise_milli")
        )
        .select(
            "event_type",
            "true_n",
            "clamped_n",
            "noise_milli",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("clamped_n")
                + F.expr(
                    "CAST(CASE WHEN noise_milli < 0 THEN"
                    " -((-noise_milli + 500) DIV 1000)"
                    " ELSE (noise_milli + 500) DIV 1000 END AS BIGINT)"
                ),
            ).alias("noisy_n"),
        )
        .orderBy("event_type")
    )


def dp_user_level_counts_sql(
    cap: int = DP_USER_CAP, epsilon_milli: int = DP_USER_EPSILON_MILLI
) -> str:
    from ..llm.hashing import md5_int_sql

    u = f"(({md5_int_sql('event_type')}) + 0.5) / {float(1 << 60)}"
    return f"""
        WITH per_ut AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY user_id, event_type
        ),
        per_t AS (
            SELECT event_type,
                   CAST(SUM(c) AS BIGINT) AS true_n,
                   CAST(SUM(least(c, {cap})) AS BIGINT) AS clamped_n
            FROM per_ut GROUP BY event_type
        ),
        noised AS (
            SELECT event_type, true_n, clamped_n,
                   CAST(round(-({cap * 1000 * 1000} / {epsilon_milli}.0)
                        * sign(({u}) - 0.5)
                        * ln(1.0 - 2.0 * abs(({u}) - 0.5))) AS BIGINT)
                       AS noise_milli
            FROM per_t
        )
        SELECT event_type, true_n, clamped_n, noise_milli,
               greatest(CAST(0 AS BIGINT), clamped_n
                   + CAST(CASE WHEN noise_milli < 0 THEN
                         -((-noise_milli + 500) // 1000)
                         ELSE (noise_milli + 500) // 1000 END AS BIGINT))
                   AS noisy_n
        FROM noised
        ORDER BY event_type
    """


# --- Qini uplift curve ------------------------------------------------------------------------------

QINI_DECILES = 10


def qini_uplift_curve(events: DataFrame) -> DataFrame:
    """Qini uplift curve of click volume as a targeting score for the
    parity variant: rows (decile, n_t, n_c, conv_t, conv_c, qini_micro)
    ordered by decile.

    events_welch_ab_test prices the AVERAGE effect; uplift modeling asks
    WHO to target — rank users by score, and at each cumulative decile
    compare treated converters against the control converters scaled to
    the treated exposure: Qini(d) = conv_T(d) - conv_C(d) * N_T(d) /
    N_C(d). A curve above the diagonal means the score finds the
    persuadables; the area is the standard uplift-model metric.

    Exactness: the decile assignment is an exact integer rank formula
    ((rank-1)*10 DIV n) on the deterministic (score DESC, user) order;
    all cumulative counts are integers; one micro division per decile
    row.

    Scale shape: one user-grain aggregate, one rank window over the
    user-grain relation, one <=10-row cumulative rollup."""
    per_user = events.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("conv"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("user_id").asc())
    tot = per_user.agg(F.count("*").cast("long").alias("n"))
    ranked = per_user.crossJoin(F.broadcast(tot)).select(
        (F.col("user_id") % 2 == 1).alias("treat"),
        "conv",
        F.expr(
            f"CAST((CAST(ROW_NUMBER() OVER (ORDER BY score DESC, user_id ASC)"
            f" AS BIGINT) - 1) * {QINI_DECILES} AS BIGINT) DIV n + 1"
        ).alias("decile"),
    )
    per_d = ranked.groupBy("decile").agg(
        F.sum(F.col("treat").cast("long")).cast("long").alias("nt"),
        F.sum((~F.col("treat")).cast("long")).cast("long").alias("nc"),
        F.sum(F.when(F.col("treat"), F.col("conv")).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum(F.when(~F.col("treat"), F.col("conv")).otherwise(0))
        .cast("long")
        .alias("cc"),
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_d.select(
            "decile",
            F.sum("nt").over(wd).cast("long").alias("n_t"),
            F.sum("nc").over(wd).cast("long").alias("n_c"),
            F.sum("ct").over(wd).cast("long").alias("conv_t"),
            F.sum("cc").over(wd).cast("long").alias("conv_c"),
        )
        .select(
            "decile",
            "n_t",
            "n_c",
            "conv_t",
            "conv_c",
            F.expr(
                "CAST(CASE WHEN n_c > 0 THEN round(1e6 * (conv_t"
                " - CAST(conv_c AS DOUBLE) * n_t / n_c)) ELSE 0 END"
                " AS BIGINT)"
            ).alias("qini_micro"),
        )
        .orderBy("decile")
    )


def qini_uplift_curve_sql() -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) AS BIGINT) AS score,
                   CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS BIGINT) AS conv
            FROM events GROUP BY user_id
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per_user
        ),
        ranked AS (
            SELECT (user_id % 2 = 1) AS treat, conv,
                   (CAST(ROW_NUMBER() OVER (ORDER BY score DESC, user_id ASC)
                        AS BIGINT) - 1) * {QINI_DECILES} // n + 1 AS decile
            FROM per_user CROSS JOIN tot
        ),
        per_d AS (
            SELECT decile,
                   CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
                       AS nt,
                   CAST(SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT)
                       AS nc,
                   CAST(SUM(CASE WHEN treat THEN conv ELSE 0 END) AS BIGINT)
                       AS ct,
                   CAST(SUM(CASE WHEN NOT treat THEN conv ELSE 0 END)
                       AS BIGINT) AS cc
            FROM ranked GROUP BY decile
        ),
        cums AS (
            SELECT decile,
                   CAST(SUM(nt) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS n_t,
                   CAST(SUM(nc) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS n_c,
                   CAST(SUM(ct) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS conv_t,
                   CAST(SUM(cc) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS conv_c
            FROM per_d
        )
        SELECT decile, n_t, n_c, conv_t, conv_c,
               CAST(CASE WHEN n_c > 0 THEN round(1e6 * (conv_t
                    - CAST(conv_c AS DOUBLE) * n_t / n_c)) ELSE 0 END
                    AS BIGINT) AS qini_micro
        FROM cums
        ORDER BY decile
    """


# --- Yuen's trimmed-mean test -------------------------------------------------------------------


def yuen_trimmed_test(events: DataFrame) -> DataFrame:
    """Yuen's 20%-trimmed-mean test of weekend vs weekday event values:
    one row (n_weekday, n_weekend, h_weekday, h_weekend,
    tdiff_micro, t_milli, df_milli).

    events_welch_ab_test compares raw means (heavy tails wreck both the
    estimate and its SE); events_brunner_munzel abandons means entirely.
    Yuen's test keeps the mean INTERPRETATION but robustifies it: trim
    the top and bottom 20% per group, compare trimmed means, and
    studentize with the WINSORIZED variance (the correct pairing —
    trimmed mean's variance is the winsorized one, not the trimmed
    one). t = (tm1 - tm2)/sqrt(d1 + d2), d_g = (n_g-1)s2w_g/(h_g(h_g-1))
    with h = n - 2g the kept count; Welch-Satterthwaite df.

    Exactness: per-cell rank-block overlaps with the kept window give
    EXACT integer trimmed/winsorized sums off the cents grid (no
    per-row clipping pass); the t/df chain is one identical double
    chain at the 1-row emit.

    Scale shape: one (group, cents) aggregate, one cumulative window
    per group on that grid, one 2-row order-statistic broadcast, one
    bounded reduction."""
    g = (F.dayofweek("ts").isin(1, 7)).cast("int")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    vals = events.select(g.alias("g"), cents.alias("c"))
    per_gc = vals.groupBy("g", "c").agg(F.count("*").cast("long").alias("t"))
    wg = (
        Window.partitionBy("g")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = per_gc.select(
        "g", "c", "t", F.sum("t").over(wg).cast("long").alias("cum")
    )
    grp = per_gc.groupBy("g").agg(F.sum("t").cast("long").alias("n"))
    bounds = (
        cums.join(grp, "g")
        .groupBy("g", "n")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("n DIV 5 + 1"), F.col("c"))
            ).alias("lo"),
            F.min(
                F.when(F.col("cum") >= F.expr("n - n DIV 5"), F.col("c"))
            ).alias("hi"),
        )
        .select("g", "n", F.expr("n DIV 5").alias("gt"), "lo", "hi")
    )
    cells = cums.join(bounds, "g").select(
        "g",
        "n",
        "gt",
        "lo",
        "hi",
        F.expr(
            "greatest(CAST(0 AS BIGINT), least(cum, n - gt)"
            " - greatest(cum - t + 1, gt + 1) + 1)"
        ).alias("ov"),
        "c",
    )
    sums = cells.groupBy("g", "n", "gt", "lo", "hi").agg(
        F.sum(F.col("c") * F.col("ov")).cast("long").alias("ts"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("ov")
        )
        .cast("decimal(38,0)")
        .alias("tsq"),
    )
    dexpr = (
        "CASE WHEN n - 2 * gt > 1 AND n > 1 THEN"
        " (CAST(n AS DOUBLE) - 1)"
        " * ((CAST(tsq AS DOUBLE) + gt * (CAST(lo AS DOUBLE) * lo"
        "     + CAST(hi AS DOUBLE) * hi)"
        "     - (CAST(ts AS DOUBLE) + gt * (CAST(lo AS DOUBLE) + hi))"
        "       * (CAST(ts AS DOUBLE) + gt * (CAST(lo AS DOUBLE) + hi)) / n)"
        "    / (n - 1))"
        " / ((CAST(n AS DOUBLE) - 2 * gt) * (n - 2 * gt - 1))"
        " ELSE 0e0 END"
    )
    one = sums.select(
        "g",
        "n",
        (F.col("n") - 2 * F.col("gt")).alias("h"),
        F.expr(
            "CASE WHEN n - 2 * gt > 0 THEN"
            " CAST(ts AS DOUBLE) / (n - 2 * gt) ELSE 0e0 END"
        ).alias("tm"),
        F.expr(dexpr).alias("d"),
    ).agg(
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 0, F.col("h"))).alias("h0"),
        F.max(F.when(F.col("g") == 1, F.col("h"))).alias("h1"),
        F.max(F.when(F.col("g") == 0, F.col("tm"))).alias("tm0"),
        F.max(F.when(F.col("g") == 1, F.col("tm"))).alias("tm1"),
        F.max(F.when(F.col("g") == 0, F.col("d"))).alias("d0"),
        F.max(F.when(F.col("g") == 1, F.col("d"))).alias("d1"),
    )
    return one.select(
        F.col("n0").alias("n_weekday"),
        F.col("n1").alias("n_weekend"),
        F.col("h0").alias("h_weekday"),
        F.col("h1").alias("h_weekend"),
        F.expr("CAST(round(1e6 * (tm1 - tm0) / 100e0) AS BIGINT)").alias(
            "tdiff_micro"
        ),
        F.expr(
            "CAST(CASE WHEN d0 + d1 > 0e0 THEN"
            " round(1000.0 * (tm1 - tm0) / sqrt(d0 + d1))"
            " ELSE 0 END AS BIGINT)"
        ).alias("t_milli"),
        F.expr(
            "CAST(CASE WHEN h0 > 1 AND h1 > 1"
            " AND d0 * d0 / (h0 - 1) + d1 * d1 / (h1 - 1) > 0e0"
            " THEN round(1000.0 * (d0 + d1) * (d0 + d1)"
            "  / (d0 * d0 / (h0 - 1) + d1 * d1 / (h1 - 1)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("df_milli"),
    )


def yuen_trimmed_test_sql() -> str:
    dexpr = (
        "CASE WHEN n - 2 * gt > 1 AND n > 1 THEN"
        " (CAST(n AS DOUBLE) - 1)"
        " * ((CAST(tsq AS DOUBLE) + gt * (CAST(lo AS DOUBLE) * lo"
        "     + CAST(hi AS DOUBLE) * hi)"
        "     - (CAST(ts AS DOUBLE) + gt * (CAST(lo AS DOUBLE) + hi))"
        "       * (CAST(ts AS DOUBLE) + gt * (CAST(lo AS DOUBLE) + hi)) / n)"
        "    / (n - 1))"
        " / ((CAST(n AS DOUBLE) - 2 * gt) * (n - 2 * gt - 1))"
        " ELSE 0e0 END"
    )
    return f"""
        WITH vals AS (
            SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS g,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM events
        ),
        per_gc AS (
            SELECT g, c, CAST(COUNT(*) AS BIGINT) AS t
            FROM vals GROUP BY g, c
        ),
        cums AS (
            SELECT g, c, t,
                   CAST(SUM(t) OVER (PARTITION BY g ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum
            FROM per_gc
        ),
        grp AS (
            SELECT g, CAST(SUM(t) AS BIGINT) AS n FROM per_gc GROUP BY g
        ),
        bounds AS (
            SELECT g, n, n // 5 AS gt,
                   MIN(CASE WHEN cum >= n // 5 + 1 THEN c END) AS lo,
                   MIN(CASE WHEN cum >= n - n // 5 THEN c END) AS hi
            FROM cums JOIN grp USING (g)
            GROUP BY g, n
        ),
        cells AS (
            SELECT cums.g, n, gt, lo, hi,
                   greatest(CAST(0 AS BIGINT), least(cum, n - gt)
                       - greatest(cum - t + 1, gt + 1) + 1) AS ov,
                   c
            FROM cums JOIN bounds ON cums.g = bounds.g
        ),
        sums AS (
            SELECT g, n, gt, lo, hi,
                   CAST(SUM(c * ov) AS BIGINT) AS ts,
                   SUM(CAST(c AS HUGEINT) * c * ov) AS tsq
            FROM cells GROUP BY g, n, gt, lo, hi
        ),
        one AS (
            SELECT g, n, n - 2 * gt AS h,
                   CASE WHEN n - 2 * gt > 0 THEN
                       CAST(ts AS DOUBLE) / (n - 2 * gt) ELSE 0e0 END AS tm,
                   {dexpr} AS d
            FROM sums
        ),
        piv AS (
            SELECT MAX(CASE WHEN g = 0 THEN n END) AS n0,
                   MAX(CASE WHEN g = 1 THEN n END) AS n1,
                   MAX(CASE WHEN g = 0 THEN h END) AS h0,
                   MAX(CASE WHEN g = 1 THEN h END) AS h1,
                   MAX(CASE WHEN g = 0 THEN tm END) AS tm0,
                   MAX(CASE WHEN g = 1 THEN tm END) AS tm1,
                   MAX(CASE WHEN g = 0 THEN d END) AS d0,
                   MAX(CASE WHEN g = 1 THEN d END) AS d1
            FROM one
        )
        SELECT n0 AS n_weekday, n1 AS n_weekend,
               h0 AS h_weekday, h1 AS h_weekend,
               CAST(round(1e6 * (tm1 - tm0) / 100e0) AS BIGINT)
                   AS tdiff_micro,
               CAST(CASE WHEN d0 + d1 > 0e0 THEN
                    round(1000.0 * (tm1 - tm0) / sqrt(d0 + d1))
                    ELSE 0 END AS BIGINT) AS t_milli,
               CAST(CASE WHEN h0 > 1 AND h1 > 1
                    AND d0 * d0 / (h0 - 1) + d1 * d1 / (h1 - 1) > 0e0
                    THEN round(1000.0 * (d0 + d1) * (d0 + d1)
                     / (d0 * d0 / (h0 - 1) + d1 * d1 / (h1 - 1)))
                    ELSE 0 END AS BIGINT) AS df_milli
        FROM piv
    """


# --- 1-D Wasserstein (earth mover's) distance -----------------------------------------------------


def wasserstein_hourly(events: DataFrame) -> DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between the click and
    error hour-of-day profiles: one row (n_x, n_y, emd_micro).

    events_hellinger_hourly and psi_drift compare bins POINTWISE — they
    cannot tell "shifted by one hour" from "scrambled"; W1 is the
    transport metric that can: on the dense 24-bin grid it is exactly
    sum_h |CDF_x(h) - CDF_y(h)| (in hours of mass-distance), the number
    drift dashboards want when the question is HOW FAR the load moved,
    not just whether it differs.

    Exactness: fully integer until the emit — both CDFs ride the
    densified 24-row grid as cumulative counts, the sum of absolute
    normalized-count differences uses the cross-multiplied form
    |n_y*cum_x - n_x*cum_y| so no per-bin float division happens.

    Scale shape: one (hour) conditional aggregate densified against a
    24-row literal spine, one cumulative window on that grid, one 1-row
    reduction."""
    per_h = events.groupBy(F.hour("ts").alias("h")).agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("y"),
    )
    spine = events.sparkSession.range(24).select(
        F.col("id").cast("int").alias("h")
    )
    dense = spine.join(per_h, "h", "left").select(
        "h",
        F.coalesce("x", F.lit(0)).alias("x"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    wc = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    cums = dense.select(
        "h",
        F.sum("x").over(wc).cast("long").alias("cx"),
        F.sum("y").over(wc).cast("long").alias("cy"),
    )
    tot = dense.agg(
        F.sum("x").cast("long").alias("nx"),
        F.sum("y").cast("long").alias("ny"),
    )
    return (
        cums.crossJoin(F.broadcast(tot))
        .where(F.col("h") < 23)
        .groupBy("nx", "ny")
        .agg(
            F.sum(
                F.abs(
                    F.col("ny").cast("decimal(38,0)") * F.col("cx")
                    - F.col("nx").cast("decimal(38,0)") * F.col("cy")
                )
            )
            .cast("decimal(38,0)")
            .alias("s")
        )
        .select(
            F.col("nx").alias("n_x"),
            F.col("ny").alias("n_y"),
            F.expr(
                "CAST(CASE WHEN nx > 0 AND ny > 0 THEN round(1e6"
                " * CAST(s AS DOUBLE) / (CAST(nx AS DOUBLE) * ny))"
                " ELSE 0 END AS BIGINT)"
            ).alias("emd_micro"),
        )
    )


def wasserstein_hourly_sql() -> str:
    return """
        WITH per_h AS (
            SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS h,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                       END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        spine AS (
            SELECT unnest(generate_series(0, 23)) AS h
        ),
        dense AS (
            SELECT spine.h,
                   CAST(COALESCE(x, 0) AS BIGINT) AS x,
                   CAST(COALESCE(y, 0) AS BIGINT) AS y
            FROM spine LEFT JOIN per_h ON spine.h = per_h.h
        ),
        cums AS (
            SELECT h,
                   CAST(SUM(x) OVER (ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cx,
                   CAST(SUM(y) OVER (ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cy
            FROM dense
        ),
        tot AS (
            SELECT CAST(SUM(x) AS BIGINT) AS nx,
                   CAST(SUM(y) AS BIGINT) AS ny
            FROM dense
        )
        SELECT nx AS n_x, ny AS n_y,
               CAST(CASE WHEN nx > 0 AND ny > 0 THEN round(1e6
                    * CAST(SUM(abs(CAST(ny AS HUGEINT) * cx
                                   - CAST(nx AS HUGEINT) * cy)) AS DOUBLE)
                    / (CAST(nx AS DOUBLE) * ny))
                    ELSE 0 END AS BIGINT) AS emd_micro
        FROM cums CROSS JOIN tot
        WHERE h < 23
        GROUP BY nx, ny
    """


# --- Two-sample energy distance -------------------------------------------------------------------


def energy_distance_weekend(events: DataFrame) -> DataFrame:
    """Szekely's two-sample energy distance between weekend and weekday
    event values: one row (n_x, n_y, exy_micro, exx_micro, eyy_micro,
    energy_micro).

    The rank tests (mannwhitney, brunner_munzel, yuen) compare LOCATION
    (and cvm/ks compare CDFs pointwise); the energy statistic E =
    2E|X-Y| - E|X-X'| - E|Y-Y'| is the metric two-sample test —
    consistent against ANY distributional difference, the basis of
    modern MMD-style checks. Every pairwise-|difference| mean reduces
    to exact order-statistic algebra on the cents grid: sum_ij |x_i -
    y_j| = sum over grid values v of t_y(v) * [v*(2*cx(v) - NX) + SX -
    2*sx(v)] with cx/sx the count/sum of X at-or-below v — so the
    "quadratic" statistic costs one cumulative pass, never a pair join.

    Exactness: all three pair sums are exact integers (HUGEINT/decimal
    guards); three micro divisions at the 1-row emit.

    Scale shape: one (cents) two-sided aggregate, two cumulative
    windows on that grid, one 1-row totals broadcast, one bounded
    reduction."""
    g = (F.dayofweek("ts").isin(1, 7)).cast("int")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    per_c = (
        events.select(g.alias("g"), cents.alias("c"))
        .groupBy("c")
        .agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
            .cast("long")
            .alias("tx"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
            .cast("long")
            .alias("ty"),
        )
    )
    wc = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cums = per_c.select(
        "c",
        "tx",
        "ty",
        F.sum("tx").over(wc).cast("long").alias("cx"),
        F.sum("ty").over(wc).cast("long").alias("cy"),
        F.sum(F.col("tx") * F.col("c")).over(wc).cast("long").alias("sx"),
        F.sum(F.col("ty") * F.col("c")).over(wc).cast("long").alias("sy"),
    )
    tot = per_c.agg(
        F.sum("tx").cast("long").alias("nx"),
        F.sum("ty").cast("long").alias("ny"),
        F.sum(F.col("tx") * F.col("c")).cast("long").alias("sxt"),
        F.sum(F.col("ty") * F.col("c")).cast("long").alias("syt"),
    )
    pair = lambda t, cnt, cum, s, n_, st: (  # noqa: E731
        f"SUM(CAST({t} AS DECIMAL(38,0))"
        f" * (CAST(c AS DECIMAL(38,0)) * (2 * {cum} - {n_})"
        f"    + {st} - 2 * {s}))"
    )
    agg = cums.crossJoin(F.broadcast(tot)).groupBy(
        "nx", "ny", "sxt", "syt"
    ).agg(
        F.expr(pair("ty", "ty", "cx", "sx", "nx", "sxt"))
        .cast("decimal(38,0)")
        .alias("dxy"),
        F.expr(pair("tx", "tx", "cx", "sx", "nx", "sxt"))
        .cast("decimal(38,0)")
        .alias("dxx"),
        F.expr(pair("ty", "ty", "cy", "sy", "ny", "syt"))
        .cast("decimal(38,0)")
        .alias("dyy"),
    )
    return agg.select(
        F.col("nx").alias("n_x"),
        F.col("ny").alias("n_y"),
        F.expr(
            "CAST(CASE WHEN nx > 0 AND ny > 0 THEN round(1e6"
            " * CAST(dxy AS DOUBLE) / (CAST(nx AS DOUBLE) * ny) / 100e0)"
            " ELSE 0 END AS BIGINT)"
        ).alias("exy_micro"),
        F.expr(
            "CAST(CASE WHEN nx > 0 THEN round(1e6"
            " * CAST(dxx AS DOUBLE) / (CAST(nx AS DOUBLE) * nx) / 100e0)"
            " ELSE 0 END AS BIGINT)"
        ).alias("exx_micro"),
        F.expr(
            "CAST(CASE WHEN ny > 0 THEN round(1e6"
            " * CAST(dyy AS DOUBLE) / (CAST(ny AS DOUBLE) * ny) / 100e0)"
            " ELSE 0 END AS BIGINT)"
        ).alias("eyy_micro"),
        F.expr(
            "CAST(CASE WHEN nx > 0 AND ny > 0 THEN round(1e6 * ("
            " 2e0 * CAST(dxy AS DOUBLE) / (CAST(nx AS DOUBLE) * ny)"
            " - CAST(dxx AS DOUBLE) / (CAST(nx AS DOUBLE) * nx)"
            " - CAST(dyy AS DOUBLE) / (CAST(ny AS DOUBLE) * ny)) / 100e0)"
            " ELSE 0 END AS BIGINT)"
        ).alias("energy_micro"),
    )


def energy_distance_weekend_sql() -> str:
    def pair(t, cum, s, n_, st):
        return (
            f"SUM(CAST({t} AS HUGEINT)"
            f" * (CAST(c AS HUGEINT) * (2 * {cum} - {n_})"
            f"    + {st} - 2 * {s}))"
        )

    return f"""
        WITH per_c AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 0 ELSE 1
                       END) AS BIGINT) AS tx,
                   CAST(SUM(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0
                       END) AS BIGINT) AS ty
            FROM events GROUP BY 1
        ),
        cums AS (
            SELECT c, tx, ty,
                   CAST(SUM(tx) OVER w AS BIGINT) AS cx,
                   CAST(SUM(ty) OVER w AS BIGINT) AS cy,
                   CAST(SUM(tx * c) OVER w AS BIGINT) AS sx,
                   CAST(SUM(ty * c) OVER w AS BIGINT) AS sy
            FROM per_c
            WINDOW w AS (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        tot AS (
            SELECT CAST(SUM(tx) AS BIGINT) AS nx,
                   CAST(SUM(ty) AS BIGINT) AS ny,
                   CAST(SUM(tx * c) AS BIGINT) AS sxt,
                   CAST(SUM(ty * c) AS BIGINT) AS syt
            FROM per_c
        ),
        agg AS (
            SELECT nx, ny,
                   {pair('ty', 'cx', 'sx', 'nx', 'sxt')} AS dxy,
                   {pair('tx', 'cx', 'sx', 'nx', 'sxt')} AS dxx,
                   {pair('ty', 'cy', 'sy', 'ny', 'syt')} AS dyy
            FROM cums CROSS JOIN tot
            GROUP BY nx, ny, sxt, syt
        )
        SELECT nx AS n_x, ny AS n_y,
               CAST(CASE WHEN nx > 0 AND ny > 0 THEN round(1e6
                    * CAST(dxy AS DOUBLE) / (CAST(nx AS DOUBLE) * ny) / 100e0)
                    ELSE 0 END AS BIGINT) AS exy_micro,
               CAST(CASE WHEN nx > 0 THEN round(1e6
                    * CAST(dxx AS DOUBLE) / (CAST(nx AS DOUBLE) * nx) / 100e0)
                    ELSE 0 END AS BIGINT) AS exx_micro,
               CAST(CASE WHEN ny > 0 THEN round(1e6
                    * CAST(dyy AS DOUBLE) / (CAST(ny AS DOUBLE) * ny) / 100e0)
                    ELSE 0 END AS BIGINT) AS eyy_micro,
               CAST(CASE WHEN nx > 0 AND ny > 0 THEN round(1e6 * (
                    2e0 * CAST(dxy AS DOUBLE) / (CAST(nx AS DOUBLE) * ny)
                    - CAST(dxx AS DOUBLE) / (CAST(nx AS DOUBLE) * nx)
                    - CAST(dyy AS DOUBLE) / (CAST(ny AS DOUBLE) * ny)) / 100e0)
                    ELSE 0 END AS BIGINT) AS energy_micro
        FROM agg
    """


# --- instrumental-variable Wald estimator ---------------------------------------------


def iv_wald(events: DataFrame) -> DataFrame:
    """Instrumental-variable (Wald) estimate of the effect of engagement on
    purchase spend: instrument Z = user ever saw a 'view' (the exposure
    encouragement), endogenous treatment D = user ever clicked, outcome Y =
    purchase cents. Wald = (E[Y|Z=1] − E[Y|Z=0]) / (E[D|Z=1] − E[D|Z=0]) —
    the reduced form over the first stage, the simplest estimator that
    survives treatment self-selection (naive D-conditioning does not).

    Cell means are exact half-up integers (cents / milli); the ratio is the
    single final division, NULL when the first stage is empty (a weak-to-no
    instrument must surface as NULL, not a fabricated effect).

    Scale: one user-grain aggregate, one 2-cell rollup."""
    per_user = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("z"),
        F.max((F.col("event_type") == "click").cast("int")).alias("d"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("y_cents"),
    )
    cells = per_user.groupBy("z").agg(
        F.count("*").cast("long").alias("n"),
        F.expr(
            "CAST((2 * SUM(y_cents) + COUNT(*)) DIV (2 * COUNT(*))"
            " AS BIGINT)"
        ).alias("mean_y_cents"),
        F.expr(
            "CAST((2 * 1000 * SUM(d) + COUNT(*)) DIV (2 * COUNT(*))"
            " AS BIGINT)"
        ).alias("mean_d_milli"),
    )
    return cells.agg(
        F.sum(F.when(F.col("z") == 1, F.col("n"))).alias("n_z1"),
        F.sum(F.when(F.col("z") == 0, F.col("n"))).alias("n_z0"),
        F.sum(
            F.when(F.col("z") == 1, F.col("mean_y_cents")).otherwise(
                -F.col("mean_y_cents")
            )
        ).alias("itt_cents"),
        F.sum(
            F.when(F.col("z") == 1, F.col("mean_d_milli")).otherwise(
                -F.col("mean_d_milli")
            )
        ).alias("first_stage_milli"),
    ).select(
        "n_z1",
        "n_z0",
        "itt_cents",
        "first_stage_milli",
        F.when(
            F.col("first_stage_milli") != 0,
            F.round(
                1000.0 * F.col("itt_cents") / F.col("first_stage_milli"), 6
            ),
        ).alias("wald_cents"),
    )


def iv_wald_sql() -> str:
    return """
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS z,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS d,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT)
                   ELSE 0 END) AS y_cents
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT z, CAST(COUNT(*) AS BIGINT) AS n,
               CAST((2 * SUM(y_cents) + COUNT(*)) // (2 * COUNT(*))
                    AS BIGINT) AS mean_y_cents,
               CAST((2 * 1000 * SUM(d) + COUNT(*)) // (2 * COUNT(*))
                    AS BIGINT) AS mean_d_milli
        FROM per_user GROUP BY z
    )
    SELECT CAST(SUM(CASE WHEN z = 1 THEN n END) AS BIGINT) AS n_z1,
           CAST(SUM(CASE WHEN z = 0 THEN n END) AS BIGINT) AS n_z0,
           CAST(SUM(CASE WHEN z = 1 THEN mean_y_cents
                         ELSE -mean_y_cents END) AS BIGINT) AS itt_cents,
           CAST(SUM(CASE WHEN z = 1 THEN mean_d_milli
                         ELSE -mean_d_milli END) AS BIGINT)
               AS first_stage_milli,
           CASE WHEN SUM(CASE WHEN z = 1 THEN mean_d_milli
                              ELSE -mean_d_milli END) <> 0 THEN
               round(1000.0 * SUM(CASE WHEN z = 1 THEN mean_y_cents
                                       ELSE -mean_y_cents END)
                     / SUM(CASE WHEN z = 1 THEN mean_d_milli
                                ELSE -mean_d_milli END), 6)
           END AS wald_cents
    FROM cells
    """


# --- mediation analysis (product of coefficients + Sobel) -----------------------------


def mediation_sobel(events: DataFrame) -> DataFrame:
    """Baron-Kenny mediation with the Sobel test: does engagement (X =
    views per user) act on spend (Y = purchase cents) THROUGH clicking
    (M = clicks per user)? Closed-form paths from one user-grain sufficient
    -statistics aggregate: a (X→M), b (M→Y | X), the direct path c′, the
    total path c, the indirect effect a·b, and Sobel z = a·b /
    √(a²·s_b² + b²·s_a²).

    Every cross-user sum is an exact BIGINT (counts and cents); the path
    algebra is scalar double arithmetic on those exact integers — identical
    in any engine and any partitioning. Degenerate designs (zero X variance
    or a collinear X/M) emit NULL paths rather than dividing by zero.

    Scale: one user aggregate + one 10-sum reduction; nothing after the
    first shuffle is data-sized."""
    per_user = events.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "click").cast("long")).alias("m"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("y"),
    )
    sums = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("m").alias("sm"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("m")).alias("sxm"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("m") * F.col("y")).alias("smy"),
    )
    c = sums.select(
        "n",
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")).alias("cxx"),
        (F.col("smm") - F.col("sm") * F.col("sm") / F.col("n")).alias("cmm"),
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("cyy"),
        (F.col("sxm") - F.col("sx") * F.col("sm") / F.col("n")).alias("cxm"),
        (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")).alias("cxy"),
        (F.col("smy") - F.col("sm") * F.col("sy") / F.col("n")).alias("cmy"),
    )
    withdet = c.select(
        "*", (F.col("cmm") * F.col("cxx") - F.col("cxm") * F.col("cxm")).alias("det")
    )
    a = F.col("cxm") / F.col("cxx")
    b = (F.col("cmy") * F.col("cxx") - F.col("cxy") * F.col("cxm")) / F.col("det")
    cprime = (
        F.col("cxy") * F.col("cmm") - F.col("cmy") * F.col("cxm")
    ) / F.col("det")
    ctotal = F.col("cxy") / F.col("cxx")
    sa2 = ((F.col("cmm") - a * F.col("cxm")) / (F.col("n") - 2)) / F.col("cxx")
    sb2 = (
        (F.col("cyy") - b * F.col("cmy") - cprime * F.col("cxy"))
        / (F.col("n") - 3)
    ) * F.col("cxx") / F.col("det")
    ok = (F.col("cxx") > 0) & (F.col("det") > 0) & (F.col("n") > 3)
    return withdet.select(
        "n",
        F.when(ok, F.round(a, 6)).alias("a_path"),
        F.when(ok, F.round(b, 6)).alias("b_path"),
        F.when(ok, F.round(cprime, 6)).alias("c_direct"),
        F.when(F.col("cxx") > 0, F.round(ctotal, 6)).alias("c_total"),
        F.when(ok, F.round(a * b, 6)).alias("indirect"),
        F.when(
            ok & (a * a * sb2 + b * b * sa2 > 0),
            F.round(a * b / F.sqrt(a * a * sb2 + b * b * sa2), 6),
        ).alias("sobel_z"),
    )


def mediation_sobel_sql() -> str:
    return """
    WITH per_user AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS m,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT)
                   ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(m) AS BIGINT) AS sm,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(m * m) AS BIGINT) AS smm,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * m) AS BIGINT) AS sxm,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(m * y) AS BIGINT) AS smy
        FROM per_user
    ),
    c AS (
        SELECT n,
               sxx - CAST(sx AS DOUBLE) * sx / n AS cxx,
               smm - CAST(sm AS DOUBLE) * sm / n AS cmm,
               syy - CAST(sy AS DOUBLE) * sy / n AS cyy,
               sxm - CAST(sx AS DOUBLE) * sm / n AS cxm,
               sxy - CAST(sx AS DOUBLE) * sy / n AS cxy,
               smy - CAST(sm AS DOUBLE) * sy / n AS cmy
        FROM sums
    ),
    paths AS (
        SELECT n, cxx, cmm, cyy, cxm, cxy, cmy,
               cmm * cxx - cxm * cxm AS det,
               cxm / cxx AS a,
               (cmy * cxx - cxy * cxm) / (cmm * cxx - cxm * cxm) AS b,
               (cxy * cmm - cmy * cxm) / (cmm * cxx - cxm * cxm) AS cprime,
               cxy / cxx AS ctotal
        FROM c
    ),
    ses AS (
        SELECT *,
               ((cmm - a * cxm) / (n - 2)) / cxx AS sa2,
               ((cyy - b * cmy - cprime * cxy) / (n - 3)) * cxx / det AS sb2,
               (cxx > 0 AND det > 0 AND n > 3) AS ok
        FROM paths
    )
    SELECT n,
           CASE WHEN ok THEN round(a, 6) END AS a_path,
           CASE WHEN ok THEN round(b, 6) END AS b_path,
           CASE WHEN ok THEN round(cprime, 6) END AS c_direct,
           CASE WHEN cxx > 0 THEN round(ctotal, 6) END AS c_total,
           CASE WHEN ok THEN round(a * b, 6) END AS indirect,
           CASE WHEN ok AND a * a * sb2 + b * b * sa2 > 0 THEN
               round(a * b / sqrt(a * a * sb2 + b * b * sa2), 6)
           END AS sobel_z
    FROM ses
    """


# --- OLS influence diagnostics (Cook's distance) --------------------------------------

COOKS_TOP = 10


def cooks_distance(events: DataFrame, top: int = COOKS_TOP) -> DataFrame:
    """Cook's distance of each day on the daily-revenue OLS trend — which
    days, if deleted, would move the fitted line the most. The regression
    diagnostic behind every "is this trend real or one anomalous day?"
    review: D_i = e_i²·h_i / (p·s²·(1−h_i)²) with leverage h_i = 1/n +
    (x_i−x̄)²/Sxx, p = 2.

    The day panel and all cross-day sums are exact BIGINTs; residuals are
    quantized ONCE to integer cents so SSE is an order-free exact sum; the
    per-day leverage/D assembly is scalar arithmetic on those integers.
    Output: the top-``top`` days by D (day, y_cents, e_cents, leverage,
    cooks_d)."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("y_cents")
    )
    spine = daily.select(
        "day",
        "y_cents",
        F.datediff(
            "day", F.min("day").over(Window.partitionBy())
        ).cast("long").alias("x"),
    )
    sums = spine.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y_cents").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y_cents")).alias("sxy"),
    ).select(
        "n",
        "sx",
        "sy",
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")).alias("cxx"),
        (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")).alias("cxy"),
    )
    fitted = spine.crossJoin(F.broadcast(sums)).select(
        "day",
        "y_cents",
        "x",
        "n",
        "cxx",
        F.col("sx").alias("sx"),
        F.round(
            F.col("y_cents")
            - (
                (F.col("sy") / F.col("n"))
                + (F.col("cxy") / F.col("cxx"))
                * (F.col("x") - F.col("sx") / F.col("n"))
            )
        )
        .cast("long")
        .alias("e_cents"),
    )
    sse = fitted.agg(
        F.sum(F.col("e_cents") * F.col("e_cents")).alias("sse")
    )
    # a zero-SSE (perfectly-fit) panel has no influence to measure: NULL,
    # ordered last explicitly (engine NULL-order defaults differ)
    w = Window.orderBy(F.col("cooks_d").desc_nulls_last(), F.col("day").asc())
    return (
        fitted.crossJoin(F.broadcast(sse))
        .select(
            "day",
            "y_cents",
            "e_cents",
            F.round(
                1.0 / F.col("n")
                + (F.col("x") - F.col("sx") / F.col("n")) ** 2 / F.col("cxx"),
                9,
            ).alias("leverage"),
            F.col("n"),
            F.col("sse"),
        )
        .select(
            "day",
            "y_cents",
            "e_cents",
            "leverage",
            F.when(
                F.col("sse") > 0,
                F.round(
                    (F.col("e_cents") * F.col("e_cents") * F.col("leverage"))
                    / (
                        2.0
                        * (F.col("sse") / (F.col("n") - 2))
                        * (1.0 - F.col("leverage")) ** 2
                    ),
                    6,
                ),
            ).alias("cooks_d"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= top)
        .orderBy("rnk")
    )


def cooks_distance_sql(top: int = COOKS_TOP) -> str:
    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS y_cents
        FROM events GROUP BY 1
    ),
    spine AS (
        SELECT day, y_cents,
               CAST(date_diff('day', MIN(day) OVER (), day) AS BIGINT) AS x
        FROM daily
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y_cents) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) - CAST(SUM(x) AS DOUBLE)
                   * SUM(x) / COUNT(*) AS cxx,
               CAST(SUM(x * y_cents) AS BIGINT) - CAST(SUM(x) AS DOUBLE)
                   * SUM(y_cents) / COUNT(*) AS cxy
        FROM spine
    ),
    fitted AS (
        SELECT day, y_cents, x, n, cxx, sx,
               CAST(round(y_cents - ((CAST(sy AS DOUBLE) / n)
                   + (cxy / cxx) * (x - CAST(sx AS DOUBLE) / n)))
                   AS BIGINT) AS e_cents
        FROM spine CROSS JOIN sums
    ),
    sse AS (
        SELECT CAST(SUM(e_cents * e_cents) AS BIGINT) AS sse FROM fitted
    ),
    scored AS (
        SELECT day, y_cents, e_cents,
               round(1.0 / n + (x - CAST(sx AS DOUBLE) / n)
                     * (x - CAST(sx AS DOUBLE) / n) / cxx, 9) AS leverage,
               n, sse
        FROM fitted CROSS JOIN sse
    )
    SELECT day, y_cents, e_cents, leverage,
           CASE WHEN sse > 0 THEN
               round((CAST(e_cents AS DOUBLE) * e_cents * leverage)
                     / (2.0 * (CAST(sse AS DOUBLE) / (n - 2))
                        * (1.0 - leverage) * (1.0 - leverage)), 6)
           END AS cooks_d,
           CAST(row_number() OVER (
               ORDER BY CASE WHEN sse > 0 THEN
                   round((CAST(e_cents AS DOUBLE) * e_cents * leverage)
                        / (2.0 * (CAST(sse AS DOUBLE) / (n - 2))
                           * (1.0 - leverage) * (1.0 - leverage)), 6)
                   END DESC NULLS LAST,
                        day ASC) AS INTEGER) AS rnk
    FROM scored
    QUALIFY rnk <= {top}
    ORDER BY rnk
    """


# --- entropic optimal transport (Sinkhorn) --------------------------------------------

SINKHORN_EPS = 4.0
SINKHORN_ITERS = 6

# Kernel constants K(c) = exp(-c/eps) precomputed HERE (not in either engine)
# and quantized to nano: circular hour distance c ranges over 0..12 only, so
# inlining 13 literals removes the one libm call whose last-ulp behaviour
# could differ between the JVM and DuckDB.
import math as _math  # noqa: E402

_SINKHORN_K_NANO: dict[int, int] = {
    c: int(round(1e9 * _math.exp(-c / SINKHORN_EPS))) for c in range(13)
}


def _sinkhorn_kernel_case() -> str:
    whens = " ".join(
        f"WHEN {c} THEN CAST({v} AS BIGINT)"
        for c, v in sorted(_SINKHORN_K_NANO.items())
    )
    return f"CASE c {whens} END"


def sinkhorn_ot(events: DataFrame, iters: int = SINKHORN_ITERS) -> DataFrame:
    """Entropic optimal transport (Sinkhorn-Knopp, Cuturi NeurIPS 2013)
    between the weekday and weekend intraday click profiles on the circular
    24-hour cost c(i,j) = min(|i−j|, 24−|i−j|): ``iters`` alternating
    scaling rounds u ← a/(Kv), v ← b/(Kᵀu), then the transport cost
    Σ uᵢK(c)vⱼ·c — the regularized transport distance that, unlike the 1-D
    Wasserstein (L-536), survives arbitrary ground metrics.

    Cross-engine exactness: the 13 kernel values are Python-precomputed nano
    literals (no engine libm); u/v live in integer micro units re-quantized
    every half-round, so each scaling sum Σ k_nano·v_micro is an order-free
    exact BIGINT; the final plan quantizes per-cell to pico before the cost
    and marginal-residual sums.

    Scale shape: two hour aggregates densified on the 24-bin spine; every
    iteration touches only the 576-cell kernel grid (bounded, broadcast);
    cost is iterations × grid, independent of corpus size."""
    per_h = events.where(F.col("event_type") == "click").groupBy(
        F.hour("ts").alias("h")
    ).agg(
        F.sum(
            (~F.dayofweek("ts").isin(1, 7)).cast("long")
        ).alias("na"),
        F.sum(F.dayofweek("ts").isin(1, 7).cast("long")).alias("nb"),
    )
    spine = events.sparkSession.range(24).select(
        F.col("id").cast("int").alias("h")
    )
    dense = (
        spine.join(per_h, "h", "left")
        .select(
            "h",
            F.coalesce("na", F.lit(0)).cast("long").alias("na"),
            F.coalesce("nb", F.lit(0)).cast("long").alias("nb"),
        )
        .localCheckpoint(eager=False)
    )
    tot = dense.agg(
        F.sum("na").cast("long").alias("tot_a"),
        F.sum("nb").cast("long").alias("tot_b"),
    )
    a_rel = dense.crossJoin(F.broadcast(tot)).select(
        F.col("h").alias("i"), "na", "tot_a"
    )
    b_rel = dense.crossJoin(F.broadcast(tot)).select(
        F.col("h").alias("j"), "nb", "tot_b"
    )
    kcase = _sinkhorn_kernel_case()
    grid = (
        spine.select(F.col("h").alias("i"))
        .crossJoin(spine.select(F.col("h").alias("j")))
        .select(
            "i",
            "j",
            F.expr("LEAST(abs(i - j), 24 - abs(i - j))").alias("c"),
        )
        .select("i", "j", "c", F.expr(kcase).alias("k_nano"))
        .localCheckpoint(eager=False)
    )
    v = b_rel.select("j", F.lit(1_000_000).cast("long").alias("v_micro"))
    u = None
    # Per-half-round localCheckpoint is LOAD-BEARING here (round-10 A/B:
    # checkpoint-free measured 6.2s vs 3.7s): the broadcast-hinted scaling
    # vector nests the full prior-round chain inside every BroadcastExchange
    # subplan, and AQE's exchange reuse does not dedupe across those nested
    # stages — the unrolled form re-executes prefix rounds quadratically.
    # Contrast markov_stationary, where the checkpoint-free unroll wins:
    # no broadcast nesting, state referenced once per round.
    for _ in range(iters):
        s_u = grid.join(F.broadcast(v), "j").groupBy("i").agg(
            F.sum(F.col("k_nano") * F.col("v_micro")).alias("s")
        )
        u = (
            a_rel.join(s_u, "i")
            .select(
                "i",
                F.when(
                    (F.col("s") > 0) & (F.col("na") > 0),
                    F.round(
                        1e21 * F.col("na") / F.col("tot_a") / F.col("s")
                    ).cast("long"),
                )
                .otherwise(F.lit(0).cast("long"))
                .alias("u_micro"),
            )
            .localCheckpoint()
        )
        s_v = grid.join(F.broadcast(u), "i").groupBy("j").agg(
            F.sum(F.col("k_nano") * F.col("u_micro")).alias("s")
        )
        v = (
            b_rel.join(s_v, "j")
            .select(
                "j",
                F.when(
                    (F.col("s") > 0) & (F.col("nb") > 0),
                    F.round(
                        1e21 * F.col("nb") / F.col("tot_b") / F.col("s")
                    ).cast("long"),
                )
                .otherwise(F.lit(0).cast("long"))
                .alias("v_micro"),
            )
            .localCheckpoint()
        )
    plan = (
        grid.join(F.broadcast(u), "i")
        .join(F.broadcast(v), "j")
        .select(
            "i",
            "j",
            "c",
            F.round(
                F.col("u_micro")
                * F.col("k_nano").cast("double")
                * F.col("v_micro")
                / 1e9
            )
            .cast("long")
            .alias("p_pico"),
        )
    )
    row_err = (
        plan.groupBy("i")
        .agg(F.sum("p_pico").alias("row_pico"))
        .join(a_rel, "i")
        .select(
            F.abs(
                F.round(F.col("row_pico") / 1e6).cast("long")
                - F.round(1e6 * F.col("na") / F.col("tot_a")).cast("long")
            ).alias("err")
        )
        .agg(F.max("err").alias("max_row_err_micro"))
    )
    col_err = (
        plan.groupBy("j")
        .agg(F.sum("p_pico").alias("col_pico"))
        .join(b_rel, "j")
        .select(
            F.abs(
                F.round(F.col("col_pico") / 1e6).cast("long")
                - F.round(1e6 * F.col("nb") / F.col("tot_b")).cast("long")
            ).alias("err")
        )
        .agg(F.max("err").alias("max_col_err_micro"))
    )
    summary = plan.agg(
        F.round(F.sum(F.col("p_pico") * F.col("c")) / 1e6)
        .cast("long")
        .alias("cost_micro"),
        F.round(F.sum("p_pico") / 1e6).cast("long").alias("mass_micro"),
    )
    return (
        tot.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(row_err))
        .crossJoin(F.broadcast(col_err))
        .select(
            F.col("tot_a").alias("n_weekday"),
            F.col("tot_b").alias("n_weekend"),
            F.lit(iters).cast("int").alias("iterations"),
            "cost_micro",
            "mass_micro",
            "max_row_err_micro",
            "max_col_err_micro",
        )
    )


def sinkhorn_ot_sql(iters: int = SINKHORN_ITERS) -> str:
    kcase = _sinkhorn_kernel_case()
    parts = [
        f"""
    WITH per_h AS (
        SELECT EXTRACT(hour FROM ts) AS h,
               SUM(CASE WHEN isodow(ts) <= 5 THEN 1 ELSE 0 END) AS na,
               SUM(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END) AS nb
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    spine AS (SELECT CAST(i AS INTEGER) AS h FROM range(0, 24) t(i)),
    dense AS (
        SELECT s.h,
               CAST(COALESCE(p.na, 0) AS BIGINT) AS na,
               CAST(COALESCE(p.nb, 0) AS BIGINT) AS nb
        FROM spine s LEFT JOIN per_h p ON p.h = s.h
    ),
    tot AS (
        SELECT CAST(SUM(na) AS BIGINT) AS tot_a,
               CAST(SUM(nb) AS BIGINT) AS tot_b
        FROM dense
    ),
    grid AS (
        SELECT a.h AS i, b.h AS j,
               LEAST(abs(a.h - b.h), 24 - abs(a.h - b.h)) AS c
        FROM spine a CROSS JOIN spine b
    ),
    kgrid AS (SELECT i, j, c, {kcase} AS k_nano FROM grid),
    v0 AS (SELECT h AS j, CAST(1000000 AS BIGINT) AS v_micro FROM spine)"""
    ]
    for r in range(1, iters + 1):
        parts.append(
            f""",
    su{r} AS (
        SELECT g.i, CAST(SUM(g.k_nano * v.v_micro) AS BIGINT) AS s
        FROM kgrid g JOIN v{r - 1} v ON v.j = g.j GROUP BY g.i
    ),
    u{r} AS (
        SELECT d.h AS i,
               CASE WHEN s.s > 0 AND d.na > 0 THEN
                   CAST(round(1e21 * d.na / t.tot_a / s.s) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS u_micro
        FROM dense d JOIN su{r} s ON s.i = d.h CROSS JOIN tot t
    ),
    sv{r} AS (
        SELECT g.j, CAST(SUM(g.k_nano * u.u_micro) AS BIGINT) AS s
        FROM kgrid g JOIN u{r} u ON u.i = g.i GROUP BY g.j
    ),
    v{r} AS (
        SELECT d.h AS j,
               CASE WHEN s.s > 0 AND d.nb > 0 THEN
                   CAST(round(1e21 * d.nb / t.tot_b / s.s) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS v_micro
        FROM dense d JOIN sv{r} s ON s.j = d.h CROSS JOIN tot t
    )"""
        )
    parts.append(
        f""",
    plan AS (
        SELECT g.i, g.j, g.c,
               CAST(round(u.u_micro * CAST(g.k_nano AS DOUBLE) * v.v_micro
                          / 1e9) AS BIGINT) AS p_pico
        FROM kgrid g
        JOIN u{iters} u ON u.i = g.i
        JOIN v{iters} v ON v.j = g.j
    ),
    row_err AS (
        SELECT MAX(abs(CAST(round(r.row_pico / 1e6) AS BIGINT)
                   - CAST(round(1e6 * d.na / t.tot_a) AS BIGINT)))
               AS max_row_err_micro
        FROM (SELECT i, SUM(p_pico) AS row_pico FROM plan GROUP BY i) r
        JOIN dense d ON d.h = r.i CROSS JOIN tot t
    ),
    col_err AS (
        SELECT MAX(abs(CAST(round(cl.col_pico / 1e6) AS BIGINT)
                   - CAST(round(1e6 * d.nb / t.tot_b) AS BIGINT)))
               AS max_col_err_micro
        FROM (SELECT j, SUM(p_pico) AS col_pico FROM plan GROUP BY j) cl
        JOIN dense d ON d.h = cl.j CROSS JOIN tot t
    ),
    summary AS (
        SELECT CAST(round(SUM(p_pico * c) / 1e6) AS BIGINT) AS cost_micro,
               CAST(round(SUM(p_pico) / 1e6) AS BIGINT) AS mass_micro
        FROM plan
    )
    SELECT t.tot_a AS n_weekday, t.tot_b AS n_weekend,
           CAST({iters} AS INTEGER) AS iterations,
           s.cost_micro, s.mass_micro,
           r.max_row_err_micro, c.max_col_err_micro
    FROM tot t CROSS JOIN summary s CROSS JOIN row_err r CROSS JOIN col_err c
    """
    )
    return "".join(parts)


# --- quantile treatment effects -------------------------------------------------------


def qte_deciles(events: DataFrame) -> DataFrame:
    """Quantile treatment effects at the nine deciles: the clicker vs
    non-clicker per-user spend distributions compared quantile-by-quantile
    — the distributional view an average treatment effect flattens (a
    treatment can move the top decile and leave the median alone; the ATE
    reports mush).

    Quantiles are exact type-1 order statistics (value at rank ⌈d·n/10⌉
    under the (cents, user_id) total order), so every number is an exact
    BIGINT and the effect column is plain integer subtraction.

    Scale: one user aggregate, one rank window per group, a 9-row grid
    join."""
    per_user = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("t"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("y"),
    )
    w = Window.partitionBy("t").orderBy(F.col("y").asc(), F.col("user_id").asc())
    ranked = per_user.select(
        "t",
        "y",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(Window.partitionBy("t")).cast("long").alias("n"),
    )
    deciles = events.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("decile")
    )
    qs = (
        ranked.crossJoin(F.broadcast(deciles))
        # ceil via (d*n+9) DIV 10 on POSITIVE operands only: Spark DIV
        # truncates toward zero while DuckDB // floors, so the negated-ceil
        # idiom silently floors on one engine (caught by the property test;
        # the sf0.01 fixture's group sizes are multiples of 10 and masked it)
        .where(F.col("rn") == F.expr("CAST((decile * n + 9) DIV 10 AS BIGINT)"))
        .groupBy("decile")
        .agg(
            F.sum(F.when(F.col("t") == 1, F.col("y"))).alias("q_treated"),
            F.sum(F.when(F.col("t") == 0, F.col("y"))).alias("q_control"),
            F.max(F.when(F.col("t") == 1, F.col("n"))).alias("n_treated"),
            F.max(F.when(F.col("t") == 0, F.col("n"))).alias("n_control"),
        )
    )
    return qs.select(
        "decile",
        "n_treated",
        "n_control",
        "q_treated",
        "q_control",
        (F.col("q_treated") - F.col("q_control")).alias("qte_cents"),
    ).orderBy("decile")


def qte_deciles_sql() -> str:
    return """
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT)
                   ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT t, y,
               CAST(row_number() OVER (
                   PARTITION BY t ORDER BY y ASC, user_id ASC
               ) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY t) AS BIGINT) AS n
        FROM per_user
    ),
    deciles AS (SELECT CAST(d AS INTEGER) AS decile FROM range(1, 10) t(d)),
    qs AS (
        SELECT d.decile,
               SUM(CASE WHEN r.t = 1 THEN r.y END) AS q_treated,
               SUM(CASE WHEN r.t = 0 THEN r.y END) AS q_control,
               MAX(CASE WHEN r.t = 1 THEN r.n END) AS n_treated,
               MAX(CASE WHEN r.t = 0 THEN r.n END) AS n_control
        FROM ranked r
        JOIN deciles d
          ON r.rn = CAST((d.decile * r.n + 9) // 10 AS BIGINT)
        GROUP BY d.decile
    )
    SELECT decile,
           CAST(n_treated AS BIGINT) AS n_treated,
           CAST(n_control AS BIGINT) AS n_control,
           CAST(q_treated AS BIGINT) AS q_treated,
           CAST(q_control AS BIGINT) AS q_control,
           CAST(q_treated - q_control AS BIGINT) AS qte_cents
    FROM qs
    ORDER BY decile
    """


# --- Frisch-Waugh-Lovell partialling-out ----------------------------------------------


def fwl_partial_out(events: DataFrame) -> DataFrame:
    """Frisch-Waugh-Lovell partialling-out: the effect of click volume on
    spend CONTROLLING for view volume, computed twice — once as the direct
    two-regressor OLS coefficient and once the double-ML way (residualize
    Y on X, residualize D on X, regress residual on residual) — with the
    FWL identity gap reported. The partialling-out recipe is the core of
    every modern debiased-ML estimator; the gap column certifies the
    algebra to 1e-6 instead of assuming it.

    All cross-user sums are exact BIGINTs; both routes are scalar double
    algebra over them. Collinear or zero-variance designs emit NULLs."""
    per_user = events.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "click").cast("long")).alias("d"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("y"),
    )
    sums = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("d").alias("sd"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("x") * F.col("d")).alias("sxd"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("d") * F.col("y")).alias("sdy"),
    )
    c = sums.select(
        "n",
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")).alias("cxx"),
        (F.col("sdd") - F.col("sd") * F.col("sd") / F.col("n")).alias("cdd"),
        (F.col("sxd") - F.col("sx") * F.col("sd") / F.col("n")).alias("cxd"),
        (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")).alias("cxy"),
        (F.col("sdy") - F.col("sd") * F.col("sy") / F.col("n")).alias("cdy"),
    )
    det = F.col("cdd") * F.col("cxx") - F.col("cxd") * F.col("cxd")
    direct = (F.col("cdy") * F.col("cxx") - F.col("cxy") * F.col("cxd")) / det
    # residual-on-residual: gamma = cxd/cxx, delta = cxy/cxx;
    # beta = cov(d~ , y~)/var(d~) with d~ = d - gamma x, y~ = y - delta x
    gamma = F.col("cxd") / F.col("cxx")
    res_cov = F.col("cdy") - gamma * F.col("cxy")
    res_var = F.col("cdd") - gamma * F.col("cxd")
    fwl = res_cov / res_var
    ok = (F.col("cxx") > 0) & (det > 0)
    return c.select(
        "n",
        F.when(ok, F.round(direct, 6)).alias("beta_direct"),
        F.when(ok, F.round(fwl, 6)).alias("beta_fwl"),
        F.when(ok, F.round(F.abs(direct - fwl), 9)).alias("identity_gap"),
    )


def fwl_partial_out_sql() -> str:
    return """
    WITH per_user AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS d,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT)
                   ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(d * d) AS BIGINT) AS sdd,
               CAST(SUM(x * d) AS BIGINT) AS sxd,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(d * y) AS BIGINT) AS sdy
        FROM per_user
    ),
    c AS (
        SELECT n,
               sxx - CAST(sx AS DOUBLE) * sx / n AS cxx,
               sdd - CAST(sd AS DOUBLE) * sd / n AS cdd,
               sxd - CAST(sx AS DOUBLE) * sd / n AS cxd,
               sxy - CAST(sx AS DOUBLE) * sy / n AS cxy,
               sdy - CAST(sd AS DOUBLE) * sy / n AS cdy
        FROM sums
    ),
    algebra AS (
        SELECT n, cxx,
               cdd * cxx - cxd * cxd AS det,
               (cdy * cxx - cxy * cxd) / (cdd * cxx - cxd * cxd) AS direct,
               (cdy - (cxd / cxx) * cxy)
                   / (cdd - (cxd / cxx) * cxd) AS fwl
        FROM c
    )
    SELECT n,
           CASE WHEN cxx > 0 AND det > 0 THEN round(direct, 6) END
               AS beta_direct,
           CASE WHEN cxx > 0 AND det > 0 THEN round(fwl, 6) END AS beta_fwl,
           CASE WHEN cxx > 0 AND det > 0 THEN round(abs(direct - fwl), 9) END
               AS identity_gap
    FROM algebra
    """


# --- Kingman VUT waiting-time approximation -------------------------------------------


def kingman_vut(events: DataFrame) -> DataFrame:
    """Kingman's VUT formula for the G/G/1 queue fed by the purchase
    stream: Wq ≈ (ρ/(1−ρ)) · ((ca² + cs²)/2) · τ_s — waiting time as
    Variability × Utilization × Time, the capacity-planning identity that
    explains why 85%-utilized systems melt. Arrivals are the purchase
    timestamps (inter-arrival mean/CV from exact epoch-micro gaps);
    service times are the purchase values read as seconds.

    All moments come from exact BIGINT sums (micros / value-milli); the
    formula is scalar algebra on them, NULL when the queue is unstable
    (ρ ≥ 1) or degenerate (<2 arrivals). One row: (n, lambda_micro_per_s,
    tau_s_milli, ca2, cs2, rho, wq_seconds)."""
    # gaps in MILLIseconds: a micro-gap square overflows int64 on an
    # hours-long gap — DuckDB raises, Spark (ANSI off) silently wraps.
    # The sequence window partitions by DAY (a global ORDER BY over the
    # purchase stream is the unpartitioned-window scale bug plan_audit
    # exists to catch); cross-midnight gaps come from the bounded day-grain
    # first/last relation.
    base = events.where(F.col("event_type") == "purchase").select(
        F.to_date("ts").alias("day"),
        F.expr("unix_micros(ts) DIV 1000").alias("tu"),
        "event_id",
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("svc_milli"),
    )
    w_day = Window.partitionBy("day").orderBy(
        F.col("tu").asc(), F.col("event_id").asc()
    )
    intra = base.select(
        (F.col("tu") - F.lag("tu").over(w_day)).alias("gap_ms")
    ).where(F.col("gap_ms").isNotNull())
    day_ends = base.groupBy("day").agg(
        F.min("tu").alias("first_tu"), F.max("tu").alias("last_tu")
    )
    w_days = Window.orderBy("day")
    cross = day_ends.select(
        (F.col("first_tu") - F.lag("last_tu").over(w_days)).alias("gap_ms")
    ).where(F.col("gap_ms").isNotNull())
    gaps = intra.unionAll(cross)
    gagg = gaps.agg(
        F.sum("gap_ms").alias("sg"),
        F.sum(F.col("gap_ms") * F.col("gap_ms")).alias("sgg"),
        F.count("gap_ms").cast("long").alias("ng"),
    )
    sagg = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("svc_milli").alias("ss"),
        F.sum(F.col("svc_milli") * F.col("svc_milli")).alias("sss"),
    )
    agg = sagg.crossJoin(F.broadcast(gagg))
    mean_gap = F.col("sg") / F.col("ng")
    var_gap = (
        F.col("sgg") - F.col("sg") * F.col("sg") / F.col("ng")
    ) / (F.col("ng") - 1)
    mean_svc = F.col("ss") / F.col("n")
    var_svc = (
        F.col("sss") - F.col("ss") * F.col("ss") / F.col("n")
    ) / (F.col("n") - 1)
    ca2 = var_gap / (mean_gap * mean_gap)
    cs2 = var_svc / (mean_svc * mean_svc)
    rho = mean_svc / mean_gap  # both in milliseconds
    wq = (rho / (1.0 - rho)) * ((ca2 + cs2) / 2.0) * (mean_svc / 1000.0)
    ok = (F.col("ng") > 1) & (mean_gap > 0) & (mean_svc > 0) & (rho < 1)
    return agg.select(
        "n",
        F.round(1e9 / mean_gap).cast("long").alias("lambda_micro_per_s"),
        F.round(mean_svc).cast("long").alias("tau_s_milli"),
        F.when(F.col("ng") > 1, F.round(ca2, 6)).alias("ca2"),
        F.when(F.col("n") > 1, F.round(cs2, 6)).alias("cs2"),
        F.when(mean_gap > 0, F.round(rho, 6)).alias("rho"),
        F.when(ok, F.round(wq, 6)).alias("wq_seconds"),
    )


def kingman_vut_sql() -> str:
    return """
    WITH base AS (
        SELECT CAST(ts AS DATE) AS day,
               epoch_us(ts) // 1000 AS tu,
               event_id,
               CAST(round(value * 1000) AS BIGINT) AS svc_milli
        FROM events WHERE event_type = 'purchase'
    ),
    intra AS (
        SELECT tu - lag(tu) OVER (
                   PARTITION BY day ORDER BY tu ASC, event_id ASC
               ) AS gap_ms
        FROM base
    ),
    day_ends AS (
        SELECT day, MIN(tu) AS first_tu, MAX(tu) AS last_tu
        FROM base GROUP BY day
    ),
    cross_gaps AS (
        SELECT first_tu - lag(last_tu) OVER (ORDER BY day) AS gap_ms
        FROM day_ends
    ),
    gaps AS (
        SELECT gap_ms FROM intra WHERE gap_ms IS NOT NULL
        UNION ALL
        SELECT gap_ms FROM cross_gaps WHERE gap_ms IS NOT NULL
    ),
    agg AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n,
               CAST(SUM(gap_ms) AS BIGINT) AS sg,
               CAST(SUM(gap_ms * gap_ms) AS BIGINT) AS sgg,
               CAST(COUNT(gap_ms) AS BIGINT) AS ng,
               (SELECT CAST(SUM(svc_milli) AS BIGINT) FROM base) AS ss,
               (SELECT CAST(SUM(svc_milli * svc_milli) AS BIGINT)
                FROM base) AS sss
        FROM gaps
    ),
    alg AS (
        SELECT n, ng,
               CAST(sg AS DOUBLE) / ng AS mean_gap,
               (sgg - CAST(sg AS DOUBLE) * sg / ng) / (ng - 1) AS var_gap,
               CAST(ss AS DOUBLE) / n AS mean_svc,
               (sss - CAST(ss AS DOUBLE) * ss / n) / (n - 1) AS var_svc
        FROM agg
    )
    SELECT n,
           CAST(round(1e9 / mean_gap) AS BIGINT) AS lambda_micro_per_s,
           CAST(round(mean_svc) AS BIGINT) AS tau_s_milli,
           CASE WHEN ng > 1 THEN
               round(var_gap / (mean_gap * mean_gap), 6) END AS ca2,
           CASE WHEN n > 1 THEN
               round(var_svc / (mean_svc * mean_svc), 6) END AS cs2,
           CASE WHEN mean_gap > 0 THEN
               round(mean_svc / mean_gap, 6) END AS rho,
           CASE WHEN ng > 1 AND mean_gap > 0 AND mean_svc > 0
                     AND mean_svc / mean_gap < 1 THEN
               round((mean_svc / mean_gap)
                     / (1.0 - mean_svc / mean_gap)
                     * ((var_gap / (mean_gap * mean_gap)
                         + var_svc / (mean_svc * mean_svc)) / 2.0)
                     * (mean_svc / 1000.0), 6)
           END AS wq_seconds
    FROM alg
    """


# --- O'Brien-Fleming group-sequential monitoring --------------------------------------

# Published two-sided alpha=0.05 O'Brien-Fleming z-boundaries for K=5
# equally-spaced looks (classic table; milli units).
OBF_BOUNDS_MILLI = (4877, 3357, 2680, 2290, 2031)


def obrien_fleming(events: DataFrame) -> DataFrame:
    """O'Brien-Fleming group-sequential monitoring of the md5-split A/B on
    per-user purchase spend: five calendar looks (the day spine's quintile
    cutoffs), a Welch-style z at each, compared against the published OBF
    boundaries — the interim-analysis discipline that lets an experiment
    stop early WITHOUT inflating alpha (the SPRT (L-375) is the per-event
    version; OBF is the scheduled-look industry standard).

    All look panels come from exact BIGINT sums; the day spine is the only
    windowed relation (bounded). Output per look: (look, cutoff_day, n_a,
    n_b, z_stat, bound_milli, crossed)."""
    arm = (
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT) % 2"
        )
    ).alias("arm")
    days = events.select(F.to_date("ts").alias("day")).distinct()
    w_day = Window.orderBy("day")
    day_ranked = days.select(
        "day",
        F.row_number().over(w_day).cast("long").alias("r"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("nd"),
    )
    looks = events.sparkSession.range(1, 6).select(
        F.col("id").cast("int").alias("look")
    )
    cutoffs = (
        day_ranked.crossJoin(F.broadcast(looks))
        .where(F.col("r") == F.expr("CAST((look * nd + 4) DIV 5 AS BIGINT)"))
        .select("look", F.col("day").alias("cutoff_day"))
    )
    # reduce to the (user, day) panel FIRST: one corpus pass, then the
    # 5-look explode touches only the panel (and md5 runs once per user-day,
    # not once per event x look — measured 16 s -> ~7 s at sf0.01)
    user_day = events.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.when(
            F.col("event_type") == "purchase",
            F.expr("CAST(round(value * 100) AS BIGINT)"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("cents"),
    ).groupBy("user_id", "day").agg(F.sum("cents").alias("d_cents"))
    per_user = (
        user_day.select("user_id", arm, "day", "d_cents")
        .crossJoin(F.broadcast(cutoffs))
        .where(F.col("day") <= F.col("cutoff_day"))
        .groupBy("look", "cutoff_day", "user_id", "arm")
        .agg(F.sum("d_cents").alias("y"))
    )
    panel = per_user.groupBy("look", "cutoff_day").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("y"))).alias("sa"),
        F.sum(F.when(F.col("arm") == 0, F.col("y") * F.col("y"))).alias("qa"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("y"))).alias("sb"),
        F.sum(F.when(F.col("arm") == 1, F.col("y") * F.col("y"))).alias("qb"),
    )
    va = (F.col("qa") - F.col("sa") * F.col("sa") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    se2 = va / F.col("n_a") + vb / F.col("n_b")
    z = (
        F.col("sa") / F.col("n_a") - F.col("sb") / F.col("n_b")
    ) / F.sqrt(se2)
    bounds = F.array(*[F.lit(b) for b in OBF_BOUNDS_MILLI])
    return (
        panel.select(
            "look",
            "cutoff_day",
            "n_a",
            "n_b",
            F.when(
                (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0),
                F.round(z, 6),
            ).alias("z_stat"),
            F.element_at(bounds, F.col("look")).cast("long").alias(
                "bound_milli"
            ),
        )
        .withColumn(
            "crossed",
            F.when(
                F.col("z_stat").isNotNull()
                & (F.abs(F.col("z_stat")) * 1000 > F.col("bound_milli")),
                1,
            )
            .otherwise(0)
            .cast("int"),
        )
        .orderBy("look")
    )


def obrien_fleming_sql() -> str:
    bounds = ", ".join(str(b) for b in OBF_BOUNDS_MILLI)
    return f"""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    day_ranked AS (
        SELECT day,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS r,
               CAST(COUNT(*) OVER () AS BIGINT) AS nd
        FROM days
    ),
    cutoffs AS (
        SELECT l.look, d.day AS cutoff_day
        FROM day_ranked d
        JOIN (SELECT UNNEST([1, 2, 3, 4, 5]) AS look) l
          ON d.r = CAST((l.look * d.nd + 4) // 5 AS BIGINT)
    ),
    user_day AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT)
                   ELSE 0 END) AS d_cents
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    per_user AS (
        SELECT c.look, c.cutoff_day, u.user_id,
               CAST(('0x' || substring(md5(CAST(u.user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS arm,
               SUM(u.d_cents) AS y
        FROM user_day u
        JOIN cutoffs c ON u.day <= c.cutoff_day
        GROUP BY c.look, c.cutoff_day, u.user_id
    ),
    panel AS (
        SELECT look, cutoff_day,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(SUM(CASE WHEN arm = 0 THEN y END) AS BIGINT) AS sa,
               CAST(SUM(CASE WHEN arm = 0 THEN y * y END) AS BIGINT) AS qa,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
               CAST(SUM(CASE WHEN arm = 1 THEN y END) AS BIGINT) AS sb,
               CAST(SUM(CASE WHEN arm = 1 THEN y * y END) AS BIGINT) AS qb
        FROM per_user GROUP BY look, cutoff_day
    ),
    alg AS (
        SELECT *,
               (qa - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1) / n_a
               + (qb - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1) / n_b
                   AS se2
        FROM panel
    )
    SELECT CAST(look AS INTEGER) AS look, cutoff_day, n_a, n_b,
           CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0 THEN
               round((CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)
                     / sqrt(se2), 6)
           END AS z_stat,
           CAST([{bounds}][look] AS BIGINT) AS bound_milli,
           CAST(CASE WHEN n_a > 1 AND n_b > 1 AND se2 > 0
                     AND abs((CAST(sa AS DOUBLE) / n_a
                              - CAST(sb AS DOUBLE) / n_b) / sqrt(se2))
                         * 1000 > [{bounds}][look]
                THEN 1 ELSE 0 END AS INTEGER) AS crossed
    FROM alg
    ORDER BY look
    """


# --- expected shortfall (CVaR) --------------------------------------------------------

CVAR_LEVELS_MILLI = (50, 100)


def cvar_daily(
    events: DataFrame, levels_milli: tuple[int, ...] = CVAR_LEVELS_MILLI
) -> DataFrame:
    """Value-at-Risk and expected shortfall (CVaR) of daily revenue: at
    tail level α, VaR is the ⌈α·n⌉-th worst day and CVaR the exact mean of
    those worst days — the coherent tail-risk number (CVaR subadditivity
    is why Basel moved to it) applied to the revenue stream's bad days.

    The day panel is the only windowed relation (bounded); the tail mean
    is an exact half-up integer over BIGINT cents. Output per level:
    (alpha_milli, n_days, n_tail, var_cents, cvar_cents)."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("y")
    )
    w = Window.orderBy(F.col("y").asc(), F.col("day").asc())
    ranked = daily.select(
        "y",
        F.row_number().over(w).cast("long").alias("r"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    grid = F.explode(
        F.array(*[F.lit(a) for a in levels_milli])
    ).alias("alpha_milli")
    tail = (
        ranked.select("y", "r", "n", grid)
        .where(
            F.col("r")
            <= F.expr("CAST((alpha_milli * n + 999) DIV 1000 AS BIGINT)")
        )
        .groupBy("alpha_milli")
        .agg(
            F.max("n").alias("n_days"),
            F.count("*").cast("long").alias("n_tail"),
            F.max("y").alias("var_cents"),
            F.expr(
                "CAST(CASE WHEN SUM(y) >= 0"
                " THEN (2 * SUM(y) + COUNT(*)) DIV (2 * COUNT(*))"
                " ELSE -((2 * -SUM(y) + COUNT(*)) DIV (2 * COUNT(*))) END"
                " AS BIGINT)"
            ).alias("cvar_cents"),
        )
    )
    return tail.select(
        F.col("alpha_milli").cast("int").alias("alpha_milli"),
        "n_days",
        "n_tail",
        "var_cents",
        "cvar_cents",
    ).orderBy("alpha_milli")


def cvar_daily_sql(
    levels_milli: tuple[int, ...] = CVAR_LEVELS_MILLI
) -> str:
    grid = ", ".join(str(a) for a in levels_milli)
    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT y,
               CAST(row_number() OVER (ORDER BY y ASC, day ASC)
                    AS BIGINT) AS r,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM daily
    ),
    tail AS (
        SELECT g.alpha_milli, k.y, k.n
        FROM ranked k
        CROSS JOIN (SELECT UNNEST([{grid}]) AS alpha_milli) g
        WHERE k.r <= CAST((g.alpha_milli * k.n + 999) // 1000 AS BIGINT)
    )
    SELECT CAST(alpha_milli AS INTEGER) AS alpha_milli,
           CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_tail,
           CAST(MAX(y) AS BIGINT) AS var_cents,
           CAST(CASE WHEN SUM(y) >= 0
                THEN (2 * SUM(y) + COUNT(*)) // (2 * COUNT(*))
                ELSE -((2 * -SUM(y) + COUNT(*)) // (2 * COUNT(*))) END
                AS BIGINT) AS cvar_cents
    FROM tail
    GROUP BY alpha_milli
    ORDER BY alpha_milli
    """


# --- burstiness and memory of the event stream ----------------------------------------


def burstiness_memory(events: DataFrame) -> DataFrame:
    """Goh-Barabási burstiness and memory of per-user click inter-event
    times: B = (σ−μ)/(σ+μ) (−1 regular clock, 0 Poisson, →1 bursty) and
    M = Pearson correlation of consecutive gaps — the two-number
    fingerprint separating human activity (bursty, weak memory) from
    machine traffic (regular or strongly autocorrelated), sharpening the
    bot-regularity screen (L-157).

    Gaps come from USER-partitioned lag windows (seconds, exact BIGINT).
    First moments are exact integer sums; SECOND moments accumulate in
    double — a year-long gap squares to ~1e15 and a corpus of them
    overflows int64 (the bare ANSI run caught it; non-ANSI Spark would
    wrap silently while DuckDB promotes to HUGEINT) — and the 1e-15
    relative float error sits nine orders below the 6-dp rounding of the
    unit-scale outputs. One row: (n_gaps, n_pairs, mean_gap_s,
    burstiness, memory)."""
    w_u = Window.partitionBy("user_id").orderBy("tu", "event_id")
    gaps = (
        events.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.expr("unix_micros(ts) DIV 1000000").alias("tu"),
            "event_id",
        )
        .select(
            "user_id",
            (F.col("tu") - F.lag("tu").over(w_u)).alias("g"),
            "tu",
            "event_id",
        )
    )
    pairs = gaps.select(
        "g", F.lead("g").over(w_u).alias("g2")
    ).where(F.col("g").isNotNull() & F.col("g2").isNotNull())
    gd = F.col("g").cast("double")
    g2d = F.col("g2").cast("double")
    gagg = gaps.where(F.col("g").isNotNull()).agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("g").alias("sg"),
        F.sum(gd * gd).alias("sgg"),
    )
    pagg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("g").alias("px"),
        F.sum("g2").alias("py"),
        F.sum(gd * gd).alias("pxx"),
        F.sum(g2d * g2d).alias("pyy"),
        F.sum(gd * g2d).alias("pxy"),
    )
    # first-moment squares also widen to double BEFORE the multiply:
    # (sum of gaps)^2 passes 2^63 at corpus scale (ANSI catches it)
    sgd = F.col("sg").cast("double")
    pxd = F.col("px").cast("double")
    pyd = F.col("py").cast("double")
    mu = F.col("sg") / F.col("n_gaps")
    var = (F.col("sgg") - sgd * sgd / F.col("n_gaps")) / (
        F.col("n_gaps") - 1
    )
    sd = F.sqrt(var)
    b = (sd - mu) / (sd + mu)
    cxy = F.col("pxy") - pxd * pyd / F.col("n_pairs")
    cxx = F.col("pxx") - pxd * pxd / F.col("n_pairs")
    cyy = F.col("pyy") - pyd * pyd / F.col("n_pairs")
    m = cxy / F.sqrt(cxx * cyy)
    return (
        gagg.crossJoin(F.broadcast(pagg))
        .select(
            "n_gaps",
            "n_pairs",
            F.when(
                F.col("n_gaps") > 0, F.round(mu, 6)
            ).alias("mean_gap_s"),
            F.when(
                (F.col("n_gaps") > 1) & (sd + mu > 0), F.round(b, 6)
            ).alias("burstiness"),
            F.when(
                (F.col("n_pairs") > 1) & (cxx > 0) & (cyy > 0),
                F.round(m, 6),
            ).alias("memory"),
        )
    )


def burstiness_memory_sql() -> str:
    return """
    WITH ticks AS (
        SELECT user_id, epoch_us(ts) // 1000000 AS tu, event_id
        FROM events WHERE event_type = 'click'
    ),
    g1 AS (
        SELECT user_id, tu, event_id,
               tu - lag(tu) OVER (
                   PARTITION BY user_id ORDER BY tu, event_id) AS g
        FROM ticks
    ),
    gaps AS (
        SELECT g,
               lead(g) OVER (
                   PARTITION BY user_id ORDER BY tu, event_id) AS g2
        FROM g1
    ),
    gagg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(g) AS BIGINT) AS sg,
               SUM(CAST(g AS DOUBLE) * g) AS sgg
        FROM gaps WHERE g IS NOT NULL
    ),
    pagg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(g) AS BIGINT) AS px,
               CAST(SUM(g2) AS BIGINT) AS py,
               SUM(CAST(g AS DOUBLE) * g) AS pxx,
               SUM(CAST(g2 AS DOUBLE) * g2) AS pyy,
               SUM(CAST(g AS DOUBLE) * g2) AS pxy
        FROM gaps WHERE g IS NOT NULL AND g2 IS NOT NULL
    ),
    alg AS (
        SELECT *,
               CAST(sg AS DOUBLE) / n_gaps AS mu,
               sqrt((sgg - CAST(sg AS DOUBLE) * sg / n_gaps)
                    / (n_gaps - 1)) AS sd,
               pxy - CAST(px AS DOUBLE) * py / n_pairs AS cxy,
               pxx - CAST(px AS DOUBLE) * px / n_pairs AS cxx,
               pyy - CAST(py AS DOUBLE) * py / n_pairs AS cyy
        FROM gagg CROSS JOIN pagg
    )
    SELECT n_gaps, n_pairs,
           CASE WHEN n_gaps > 0 THEN round(mu, 6) END AS mean_gap_s,
           CASE WHEN n_gaps > 1 AND sd + mu > 0 THEN
               round((sd - mu) / (sd + mu), 6) END AS burstiness,
           CASE WHEN n_pairs > 1 AND cxx > 0 AND cyy > 0 THEN
               round(cxy / sqrt(cxx * cyy), 6) END AS memory
    FROM alg
    """
