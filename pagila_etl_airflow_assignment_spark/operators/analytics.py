"""Per-entity ordered window analytics over the event stream.

The window-function workload the reference never needed (its one query is a
grouped weekly summary) but any analytics engine must have: per-user event
sequencing, running totals, deltas vs the previous event, and short rolling
means — lag/lead + cumulative + bounded-frame aggregates in one pass.

Scale shape: ONE shuffle, keyed by user_id, then every window function runs
inside the same sort within the partition (Spark plans a single Window node
over (user_id, ts, event_id) sort order). User keys are high-cardinality and
unskewed — no single partition holds more than one user's timeline times the
hash fan-in — so this survives 100× data by adding partitions, not state.
All frames are explicit ROWS frames: identical semantics (and identical
float accumulation order) in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROLLING_N = 3  # trailing window width for the rolling mean


def user_rolling_stats(events: DataFrame) -> DataFrame:
    """(user_id, event_id, ts, seq, cum_value, delta_value, avg3_value):
    event index, running value total, change vs previous event, and trailing
    3-event mean, per user in (ts, event_id) order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    roll = w.rowsBetween(-(ROLLING_N - 1), Window.currentRow)
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.row_number().over(w).cast("long").alias("seq"),
        F.round(F.sum("value").over(cum), 6).alias("cum_value"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 6
        ).alias("delta_value"),
        F.round(F.avg("value").over(roll), 6).alias("avg3_value"),
    )


USER_ROLLING_STATS_SQL = f"""
    SELECT user_id, event_id, ts,
           row_number() OVER w AS seq,
           round(SUM(value) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS cum_value,
           round(value - COALESCE(lag(value) OVER w, 0.0), 6) AS delta_value,
           round(AVG(value) OVER (
               w ROWS BETWEEN {ROLLING_N - 1} PRECEDING AND CURRENT ROW), 6)
             AS avg3_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def scd2_user_state(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: collapse each
    user's event stream into state-validity intervals — (user_id, state,
    valid_from, valid_to, is_current), where consecutive equal states merge
    and ``valid_to`` is the next change (NULL while current).

    The classic warehouse history-table build. Both window passes share the
    (user_id, ts, event_id) partitioning and sort, and the change filter
    preserves partitioning AND order, so Catalyst plans ONE shuffle + ONE
    sort for the whole thing (pinned in tests/test_plans.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = events.select(
        "user_id",
        "event_id",
        "ts",
        F.col("event_type").alias("state"),
        F.lag("event_type").over(w).alias("prev_state"),
    ).where(F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state")))
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


SCD2_USER_STATE_SQL = """
    WITH marked AS (
        SELECT user_id, event_id, ts, event_type AS state,
               lag(event_type) OVER w AS prev_state
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT * FROM marked WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT user_id, state, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- ordered funnel -----------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_user_stages(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered conversion funnel: per user, the timestamp of the FIRST event
    of each step that occurs at-or-after the previous step's first event
    (view -> click -> purchase). A user who clicked before ever viewing has
    that click ignored — order is the funnel's contract.

    Scale shape: each step is a per-user MIN aggregate joined back on
    user_id — every shuffle is keyed by user_id, so all stages co-partition
    (one real exchange under AQE; broadcast when a step's survivor set is
    small). No window over the full event set and no per-user array
    materialization."""
    first_ts = F.min("ts").alias(f"{steps[0]}_ts")
    stage = (
        events.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(first_ts)
    )
    prev_col = f"{steps[0]}_ts"
    for step in steps[1:]:
        nxt = (
            events.where(F.col("event_type") == step)
            .join(stage.select("user_id", prev_col), "user_id")
            .where(F.col("ts") >= F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"{step}_ts"))
        )
        stage = stage.join(nxt, "user_id", "left")
        prev_col = f"{step}_ts"
    return stage.orderBy("user_id")


def funnel_user_stages_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    s0, s1, s2 = steps
    return f"""
        WITH step0 AS (
            SELECT user_id, MIN(ts) AS {s0}_ts FROM events
            WHERE event_type = '{s0}' GROUP BY user_id
        ),
        step1 AS (
            SELECT e.user_id, MIN(e.ts) AS {s1}_ts
            FROM events e JOIN step0 USING (user_id)
            WHERE e.event_type = '{s1}' AND e.ts >= step0.{s0}_ts
            GROUP BY e.user_id
        ),
        step2 AS (
            SELECT e.user_id, MIN(e.ts) AS {s2}_ts
            FROM events e JOIN step1 USING (user_id)
            WHERE e.event_type = '{s2}' AND e.ts >= step1.{s1}_ts
            GROUP BY e.user_id
        )
        SELECT step0.user_id, {s0}_ts, {s1}_ts, {s2}_ts
        FROM step0
        LEFT JOIN step1 USING (user_id)
        LEFT JOIN step2 USING (user_id)
        ORDER BY user_id
    """


# --- cohort retention ---------------------------------------------------------


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-activity week
    (the cohort), counted as retained in every subsequent week they are
    active. Output (cohort_week, week_offset, n_active).

    Scale shape: first-activity is one user_id-keyed aggregate; activity is
    a distinct over (user_id, week) — both map-side combined; the cohort join
    is user_id-keyed and co-partitions with them. The output triangle is
    |weeks|^2 rows — tiny forever."""
    cohorts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = (
        events.select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
        )
        .distinct()
    )
    return (
        active.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_SQL = """
    WITH cohorts AS (
        SELECT user_id,
               CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('week', ts) AS DATE) AS active_week
        FROM events
    )
    SELECT cohort_week,
           CAST((active_week - cohort_week) // 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_active
    FROM active JOIN cohorts USING (user_id)
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
"""


# --- time-RANGE rolling window ------------------------------------------------

RANGE_WINDOW_SECONDS = 3600


def user_trailing_window(
    events: DataFrame, window_seconds: int = RANGE_WINDOW_SECONDS
) -> DataFrame:
    """Per event: count and value-sum of the SAME USER's events in the
    trailing `window_seconds` (inclusive) — a RANGE frame over event-time
    micros, the time-based sibling of the ROWS frames in
    ``user_rolling_stats``. RANGE is the correct frame when event spacing is
    irregular: a ROWS frame of fixed width silently changes meaning with
    event density.

    Same single user_id shuffle + one Window sort as the ROWS form; frame
    evaluation is a sliding two-pointer inside the sorted partition."""
    from ..functions import micros

    w = (
        Window.partitionBy("user_id")
        .orderBy(micros("ts"))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.count("*").over(w).cast("long").alias("n_trailing"),
        F.round(F.sum("value").over(w), 6).alias("value_trailing"),
    ).orderBy("user_id", "ts", "event_id")


def user_trailing_window_sql(window_seconds: int = RANGE_WINDOW_SECONDS) -> str:
    return f"""
        SELECT user_id, event_id, ts,
               COUNT(*) OVER w AS n_trailing,
               round(SUM(value) OVER w, 6) AS value_trailing
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN {window_seconds} * CAST(1000000 AS BIGINT) PRECEDING
                      AND CURRENT ROW
        )
        ORDER BY user_id, ts, event_id
    """


# --- equi-width histogram -----------------------------------------------------

HIST_BIN_WIDTH = 5.0


def value_histogram(events: DataFrame, bin_width: float = HIST_BIN_WIDTH) -> DataFrame:
    """Equi-width histogram of event value per type: one partial+final hash
    aggregate keyed (event_type, bin) — the distribution profile that feeds
    dashboards and drift monitors. Bin count is value-range/width regardless
    of row count, so output stays tiny at any scale."""
    b = F.floor(F.col("value") / bin_width).cast("long")
    return (
        events.where(F.col("value").isNotNull())
        .groupBy("event_type", b.alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("value"), 6).alias("bin_min"),
            F.round(F.max("value"), 6).alias("bin_max"),
        )
        .orderBy("event_type", "bin")
    )


def value_histogram_sql(bin_width: float = HIST_BIN_WIDTH) -> str:
    return f"""
        SELECT event_type,
               CAST(floor(value / {bin_width}) AS BIGINT) AS bin,
               COUNT(*) AS n,
               round(MIN(value), 6) AS bin_min,
               round(MAX(value), 6) AS bin_max
        FROM events
        WHERE value IS NOT NULL
        GROUP BY 1, 2
        ORDER BY event_type, bin
    """


# --- per-entity linear trend --------------------------------------------------


def user_value_trend(events: DataFrame) -> DataFrame:
    """Per-user OLS trend of value over event time — slope/intercept in
    CLOSED FORM from one aggregation pass (covar/var built-ins), no
    iterative fitting and no per-group Python. Time is hours since the
    user's first event (small, well-conditioned regressor). Users with a
    degenerate regressor (single event / zero time spread) report NULL
    slope rather than dividing by zero.

    The trend-detection shape: at any scale this is one user_id-keyed
    partial+final aggregate — the same cost as a COUNT."""
    from ..functions import micros

    w = Window.partitionBy("user_id")
    x = (
        (micros("ts") - F.min(micros("ts")).over(w)) / 3_600_000_000.0
    ).alias("x_hours")
    base = events.where(F.col("value").isNotNull()).select(
        "user_id", x, F.col("value").alias("y")
    )
    agg = base.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_points"),
        F.covar_samp("x_hours", "y").alias("cov_xy"),
        F.var_samp("x_hours").alias("var_x"),
        F.avg("x_hours").alias("mean_x"),
        F.avg("y").alias("mean_y"),
    )
    slope = F.when(F.col("var_x") > 0, F.col("cov_xy") / F.col("var_x"))
    return agg.select(
        "user_id",
        "n_points",
        F.round(slope, 6).alias("slope_per_hour"),
        F.round(F.col("mean_y") - slope * F.col("mean_x"), 6).alias("intercept"),
    ).orderBy("user_id")


USER_VALUE_TREND_SQL = """
    WITH base AS (
        SELECT user_id,
               (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
                 / 3600000000.0 AS x_hours,
               value AS y
        FROM events
        WHERE value IS NOT NULL
    ),
    agg AS (
        SELECT user_id,
               COUNT(*) AS n_points,
               covar_samp(x_hours, y) AS cov_xy,
               var_samp(x_hours) AS var_x,
               AVG(x_hours) AS mean_x,
               AVG(y) AS mean_y
        FROM base GROUP BY user_id
    )
    SELECT user_id, n_points,
           round(CASE WHEN var_x > 0 THEN cov_xy / var_x END, 6)
             AS slope_per_hour,
           round(mean_y - CASE WHEN var_x > 0 THEN cov_xy / var_x END * mean_x, 6)
             AS intercept
    FROM agg
    ORDER BY user_id
"""


# --- mergeable-aggregate maintenance ------------------------------------------

DELTA_SPLIT_MOD = 5  # last 1/5th of events (by id) plays the delta batch


def merge_aggregate_delta(base_agg: DataFrame, delta_agg: DataFrame) -> DataFrame:
    """Merge two partial aggregates of the SAME shape (event_type, n, total)
    into the combined aggregate — the algebraic-aggregate maintenance step: a
    materialized rollup is refreshed from a delta batch by merging partials,
    never by rescanning history. SUM/COUNT merge losslessly; anything
    non-algebraic (exact median, exact distinct) must be recomputed or
    sketched (events_approx_sketches is the mergeable substitute).

    Cost: a union of two aggregate-sized relations + one tiny re-aggregate —
    independent of fact-table size by construction."""
    return (
        base_agg.unionByName(delta_agg)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.round(F.sum("total"), 6).alias("total"),
        )
        .orderBy("event_type")
    )


def _typed_agg(events: DataFrame) -> DataFrame:
    return events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        # keep the partial UNROUNDED: rounding belongs to the final merge
        # output only, otherwise merged totals drift from the full recompute
        F.sum("value").alias("total"),
    )


def delta_agg_merge(events: DataFrame, mod: int = DELTA_SPLIT_MOD) -> DataFrame:
    """Driver-checkable form: base = events with event_id % mod != 0,
    delta = the rest; merging their partials must equal the full aggregate
    (which is the oracle)."""
    base = _typed_agg(events.where(F.col("event_id") % mod != 0))
    delta = _typed_agg(events.where(F.col("event_id") % mod == 0))
    return merge_aggregate_delta(base, delta)


DELTA_AGG_MERGE_SQL = """
    SELECT event_type,
           COUNT(*) AS n,
           round(SUM(value), 6) AS total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""


# --- windowed distinct-count --------------------------------------------------


def hourly_unique_users(events: DataFrame) -> DataFrame:
    """Exact distinct users per tumbling hour — the activity metric behind
    every DAU/WAU board. Spark plans Expand + two-phase aggregate (partial
    distinct per mapper, exact merge); at lake scale the mergeable
    substitute is the HLL sketch (events_approx_sketches), same query
    shape — this exact form is the oracle-checkable twin."""
    return (
        events.groupBy(F.window("ts", "1 hour").start.alias("hour_start"))
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.count("*").cast("long").alias("n_events"),
        )
        .orderBy("hour_start")
    )


HOURLY_UNIQUE_USERS_SQL = """
    SELECT date_trunc('hour', ts) AS hour_start,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    ORDER BY hour_start
"""


# --- time-bound funnel --------------------------------------------------------

FUNNEL_STEP_TIMEOUT_S = 86_400  # next step must land within a day


def funnel_user_stages_timebound(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    timeout_s: int = FUNNEL_STEP_TIMEOUT_S,
) -> DataFrame:
    """The ordered funnel with a per-step DEADLINE: each step counts only if
    it happens within ``timeout_s`` after the previous step's first
    qualifying event (the marketing-attribution form — a purchase a month
    after the click is not conversion). Same all-user_id-keyed join shape as
    funnel_user_stages; the deadline is one extra predicate on the step
    join, so the plan is unchanged."""
    from ..functions import micros

    first_ts = F.min("ts").alias(f"{steps[0]}_ts")
    stage = (
        events.where(F.col("event_type") == steps[0]).groupBy("user_id").agg(first_ts)
    )
    prev_col = f"{steps[0]}_ts"
    for step in steps[1:]:
        nxt = (
            events.where(F.col("event_type") == step)
            .join(stage.select("user_id", prev_col), "user_id")
            .where(
                (F.col("ts") >= F.col(prev_col))
                & (
                    micros("ts") - micros(F.col(prev_col))
                    <= F.lit(timeout_s).cast("long") * 1_000_000
                )
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"{step}_ts"))
        )
        stage = stage.join(nxt, "user_id", "left")
        prev_col = f"{step}_ts"
    counts = [
        F.count(F.col(f"{s}_ts")).alias(f"n_{s}") for s in steps
    ]
    return stage.agg(*counts)


def funnel_timebound_sql(
    steps: tuple[str, ...] = FUNNEL_STEPS, timeout_s: int = FUNNEL_STEP_TIMEOUT_S
) -> str:
    s0, s1, s2 = steps
    us = f"CAST({timeout_s} AS BIGINT) * CAST(1000000 AS BIGINT)"
    return f"""
        WITH st0 AS (
            SELECT user_id, MIN(ts) AS {s0}_ts
            FROM events WHERE event_type = '{s0}' GROUP BY user_id
        ), st1 AS (
            SELECT e.user_id, MIN(e.ts) AS {s1}_ts
            FROM events e JOIN st0 USING (user_id)
            WHERE e.event_type = '{s1}' AND e.ts >= {s0}_ts
              AND epoch_us(e.ts) - epoch_us({s0}_ts) <= {us}
            GROUP BY e.user_id
        ), st2 AS (
            SELECT e.user_id, MIN(e.ts) AS {s2}_ts
            FROM events e JOIN st1 USING (user_id)
            WHERE e.event_type = '{s2}' AND e.ts >= {s1}_ts
              AND epoch_us(e.ts) - epoch_us({s1}_ts) <= {us}
            GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(*) FROM st0) AS n_{s0},
               (SELECT COUNT(*) FROM st1) AS n_{s1},
               (SELECT COUNT(*) FROM st2) AS n_{s2}
    """


# --- RFM segmentation ---------------------------------------------------------

RFM_BUCKETS = 5


def rfm_segments(events: DataFrame, n_buckets: int = RFM_BUCKETS) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation of
    purchasers — the classic CRM grid, scored per user as three independent
    ntile ranks over the purchase history.

    One user-grain aggregate (the only fact shuffle), then three global
    ntile windows over the |users| relation. Global-order windows are
    banned over fact data (sequence-packing rule) but |users| is the
    REDUCED grain — at deployment scale the same three windows partition by
    a coarse hash stripe and quantile boundaries broadcast (the
    customer-deciles treatment); fixture-size keeps the literal grid. Ties
    break on user_id for a total order, so every score is deterministic."""
    per_user = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_purchase"),
            F.count("*").alias("frequency"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("monetary_cents"),
        )
    )
    r_w = Window.orderBy(F.desc("last_purchase"), "user_id")  # most recent -> 1
    f_w = Window.orderBy(F.desc("frequency"), "user_id")
    m_w = Window.orderBy(F.desc("monetary_cents"), "user_id")
    scored = per_user.select(
        "user_id",
        F.ntile(n_buckets).over(r_w).alias("r_score"),
        F.ntile(n_buckets).over(f_w).alias("f_score"),
        F.ntile(n_buckets).over(m_w).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    )


def rfm_segments_sql(n_buckets: int = RFM_BUCKETS) -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id, MAX(ts) AS last_purchase, COUNT(*) AS frequency,
                   SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS monetary_cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ), scored AS (
            SELECT user_id,
                   ntile({n_buckets}) OVER (ORDER BY last_purchase DESC, user_id)
                       AS r_score,
                   ntile({n_buckets}) OVER (ORDER BY frequency DESC, user_id)
                       AS f_score,
                   ntile({n_buckets}) OVER (ORDER BY monetary_cents DESC, user_id)
                       AS m_score
            FROM per_user
        )
        SELECT r_score, f_score, m_score, COUNT(*) AS n_users
        FROM scored
        GROUP BY r_score, f_score, m_score
        ORDER BY r_score, f_score, m_score
    """


def funnel_latency(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Time-to-convert distribution for full-funnel completers: exact
    p50/p90/max seconds from first step to conversion, plus the completer
    count — the "how fast does the funnel flow" companion to the stage
    counts. Latencies derive from the funnel relation (one user-grain row
    each, already user_id-keyed); the percentile aggregate runs over
    |completers| rows. Integer epoch-MICROsecond subtraction keeps every
    latency exact (unix_timestamp would truncate to seconds while the
    oracle's epoch() keeps micros — measured as a real hash divergence);
    percentile interpolation is the winsorized_stats contract."""
    from ..functions import micros

    stage = funnel_user_stages(events, steps)
    first_col, last_col = f"{steps[0]}_ts", f"{steps[-1]}_ts"
    lat = stage.where(F.col(last_col).isNotNull()).select(
        ((micros(last_col) - micros(first_col)).cast("double") / 1e6).alias(
            "latency_s"
        )
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.percentile("latency_s", F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile("latency_s", F.lit(0.9)), 6).alias("p90_s"),
        F.max("latency_s").alias("max_s"),
    )


def funnel_latency_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    first_col, last_col = f"{steps[0]}_ts", f"{steps[-1]}_ts"
    return f"""
        WITH funnel AS ({funnel_user_stages_sql(steps)}),
        lat AS (
            SELECT CAST(epoch_us({last_col}) - epoch_us({first_col}) AS DOUBLE)
                   / 1000000.0 AS latency_s
            FROM funnel WHERE {last_col} IS NOT NULL
        )
        SELECT COUNT(*) AS n_converted,
               round(quantile_cont(latency_s, 0.5), 6) AS p50_s,
               round(quantile_cont(latency_s, 0.9), 6) AS p90_s,
               MAX(latency_s) AS max_s
        FROM lat
    """


def scd3_user_state(events: DataFrame) -> DataFrame:
    """SCD Type 3 snapshot: each user's CURRENT event-type state plus the
    immediately-previous state and when it changed — the fixed-width
    "current + one history column" alternative to the full SCD2 interval
    history (Type 3 is what dimension tables use when only last-change
    context matters and row-count must stay one-per-entity).

    Derives from the SCD2 change relation: one rank window over the
    |state-changes| rows (already user_id-keyed), first/second rows pivot to
    columns via conditional aggregation — no second pass over events."""
    changes = scd2_user_state(events)
    w = Window.partitionBy("user_id").orderBy(F.desc("valid_from"))
    ranked = changes.select(
        "user_id", "state", "valid_from", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 2)
    return (
        ranked.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("state"))).alias("current_state"),
            F.min(F.when(F.col("rn") == 1, F.col("valid_from"))).alias(
                "state_since"
            ),
            F.min(F.when(F.col("rn") == 2, F.col("state"))).alias("previous_state"),
        )
        .orderBy("user_id")
    )


def scd3_user_state_sql() -> str:
    return f"""
        WITH ranked AS (
            SELECT user_id, state, valid_from,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY valid_from DESC) AS rn
            FROM ({SCD2_USER_STATE_SQL}) scd2
        )
        SELECT user_id,
               MIN(CASE WHEN rn = 1 THEN state END) AS current_state,
               MIN(CASE WHEN rn = 1 THEN valid_from END) AS state_since,
               MIN(CASE WHEN rn = 2 THEN state END) AS previous_state
        FROM ranked WHERE rn <= 2
        GROUP BY user_id
        ORDER BY user_id
    """


# --- discrete-time survival ---------------------------------------------------

HAZARD_MAX_DAYS = 14


def discrete_hazard(
    events: DataFrame, max_days: int = HAZARD_MAX_DAYS
) -> DataFrame:
    """Discrete-time survival table for signup→purchase: per day-since-signup,
    who was still at risk, who converted that day, and the hazard rate —
    time-to-event analysis without the float-product ladder (hazards are
    pure integer ratios per row; survival curves multiply them downstream
    if needed).

    Users reduce to one (signup_ts, first_purchase_ts) row each (two
    conditional MIN aggregates, one user shuffle); day offsets land on a
    ≤max_days grid; at-risk counts derive from the offset histogram by a
    reverse cumulative window over that tiny grid. Right-censoring is
    explicit: users who never convert (or convert past the horizon) stay in
    every day's risk set."""
    per_user = (
        events.where(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
                "signup_ts"
            ),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "purchase_ts"
            ),
        )
        .where(F.col("signup_ts").isNotNull())
    )
    offset = F.datediff(F.to_date("purchase_ts"), F.to_date("signup_ts"))
    cohort = per_user.select(
        F.when(
            F.col("purchase_ts").isNotNull()
            & (offset >= 0)
            & (offset <= max_days),
            offset,
        ).alias("conv_day")  # NULL = censored within the horizon
    )
    total = cohort.agg(F.count("*").alias("n_users"))
    conv = cohort.where(F.col("conv_day").isNotNull()).groupBy("conv_day").agg(
        F.count("*").alias("n_converted")
    )
    days = events.sparkSession.range(0, max_days + 1).select(
        F.col("id").cast("int").alias("day")
    )
    grid = (
        days.join(conv, days["day"] == conv["conv_day"], "left")
        .select("day", F.coalesce("n_converted", F.lit(0)).alias("n_converted"))
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = F.col("n_users") - F.coalesce(
        F.sum("n_converted").over(w), F.lit(0)
    )
    return grid.select(
        "day",
        at_risk.alias("n_at_risk"),
        "n_converted",
        F.round(
            F.col("n_converted").cast("double") / at_risk.cast("double"), 6
        ).alias("hazard"),
    ).orderBy("day")


def discrete_hazard_sql(max_days: int = HAZARD_MAX_DAYS) -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS purchase_ts
            FROM events WHERE event_type IN ('signup', 'purchase')
            GROUP BY user_id
            HAVING MIN(CASE WHEN event_type = 'signup' THEN ts END) IS NOT NULL
        ), cohort AS (
            SELECT CASE WHEN purchase_ts IS NOT NULL
                         AND datediff('day', CAST(signup_ts AS DATE),
                                      CAST(purchase_ts AS DATE))
                             BETWEEN 0 AND {max_days}
                        THEN datediff('day', CAST(signup_ts AS DATE),
                                      CAST(purchase_ts AS DATE))
                   END AS conv_day
            FROM per_user
        ), total AS (
            SELECT COUNT(*) AS n_users FROM cohort
        ), conv AS (
            SELECT conv_day, COUNT(*) AS n_converted
            FROM cohort WHERE conv_day IS NOT NULL GROUP BY conv_day
        ), grid AS (
            SELECT d.day, COALESCE(n_converted, 0) AS n_converted, n_users
            FROM (SELECT unnest(range(0, {max_days + 1})) AS day) d
            LEFT JOIN conv ON d.day = conv.conv_day
            CROSS JOIN total
        )
        SELECT day,
               CAST(n_users - COALESCE(SUM(n_converted) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS n_at_risk,
               n_converted,
               round(CAST(n_converted AS DOUBLE)
                     / CAST(n_users - COALESCE(SUM(n_converted) OVER (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS DOUBLE), 6) AS hazard
        FROM grid
        ORDER BY day
    """


def wau_overlap(events: DataFrame) -> DataFrame:
    """Week-over-week active-audience stability: Jaccard overlap of adjacent
    weeks' active-user sets — the "same people or churn-and-replace?" gauge
    a WAU line hides.

    (week, user) distincts once; adjacent weeks join per user (the only
    data-sized shuffle, user-keyed); intersection/union counts are exact
    integers on the ≤weeks-row output grid."""
    wk = events.select(
        F.date_trunc("week", "ts").cast("date").alias("week"), "user_id"
    ).distinct()
    cur = wk.select(F.col("week"), F.col("user_id"))
    prev = wk.select(
        F.date_add(F.col("week"), 7).alias("week"), F.col("user_id")
    )
    inter = cur.join(prev, ["week", "user_id"]).groupBy("week").agg(
        F.count("*").alias("n_inter")
    )
    sizes = wk.groupBy("week").agg(F.count("*").alias("n_cur"))
    prev_sizes = wk.groupBy(F.date_add("week", 7).alias("week")).agg(
        F.count("*").alias("n_prev")
    )
    return (
        sizes.join(prev_sizes, "week")
        .join(inter, "week", "left")
        .select(
            "week",
            "n_cur",
            "n_prev",
            F.coalesce("n_inter", F.lit(0)).alias("n_both"),
            F.round(
                F.coalesce("n_inter", F.lit(0)).cast("double")
                / (
                    F.col("n_cur") + F.col("n_prev") - F.coalesce("n_inter", F.lit(0))
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("week")
    )


WAU_OVERLAP_SQL = """
    WITH wk AS (
        SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week, user_id
        FROM events
    ), inter AS (
        SELECT c.week, COUNT(*) AS n_inter
        FROM wk c JOIN wk p
          ON p.week + 7 = c.week AND p.user_id = c.user_id
        GROUP BY c.week
    ), sizes AS (
        SELECT week, COUNT(*) AS n_cur FROM wk GROUP BY week
    ), prev_sizes AS (
        SELECT week + 7 AS week, COUNT(*) AS n_prev FROM wk GROUP BY week + 7
    )
    SELECT s.week, n_cur, n_prev,
           COALESCE(n_inter, 0) AS n_both,
           round(CAST(COALESCE(n_inter, 0) AS DOUBLE)
                 / CAST(n_cur + n_prev - COALESCE(n_inter, 0) AS DOUBLE), 6)
               AS jaccard
    FROM sizes s
    JOIN prev_sizes p ON s.week = p.week
    LEFT JOIN inter i ON s.week = i.week
    ORDER BY s.week
"""


def cumulative_unique_users(events: DataFrame) -> DataFrame:
    """Cumulative distinct users per day — the growth-accounting curve. A
    running COUNT(DISTINCT) is state the size of the user set, so it
    rewrites to "new users": one user_id-keyed MIN aggregate finds each
    user's first day, a day-keyed count collapses that to the tiny
    |days|-row grid, and the cumulative sum window runs on the grid only —
    never a distinct-over-expanding-window. Output (day, new_users,
    cumulative_users)."""
    firsts = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily = firsts.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("day")


CUMULATIVE_UNIQUE_USERS_SQL = """
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT day, COUNT(*) AS new_users FROM firsts GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM daily
    ORDER BY day
"""


def kaplan_meier(events: DataFrame, max_days: int = HAZARD_MAX_DAYS) -> DataFrame:
    """Kaplan-Meier survival curve over the discrete_hazard table — the
    float-product ladder that docstring defers "downstream": S(t) =
    Π_{s≤t} (1 − d_s/n_s), computed as exp of a CUMULATIVE ln-sum so the
    product is a sequential window over the ≤max_days-row grid (ordered,
    single tiny partition — deterministic double arithmetic over exact
    integer d/n, the engine-stable form of a running product). Days where
    the risk set empties contribute nothing; a day that converts the entire
    remaining risk set pins the curve to exactly 0 thereafter."""
    h = discrete_hazard(events, max_days)
    n, d = F.col("n_at_risk"), F.col("n_converted")
    term = F.when((n > 0) & (d < n), F.log((n - d).cast("double") / n)).otherwise(
        F.lit(0.0)
    )
    died = ((n > 0) & (d == n)).cast("int")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        h.withColumn("t", term)
        .withColumn("z", F.max(died).over(w))
        .select(
            "day",
            "n_at_risk",
            "n_converted",
            F.when(F.col("z") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.sum("t").over(w)), 6))
            .alias("km_survival"),
        )
        .orderBy("day")
    )


def kaplan_meier_sql(max_days: int = HAZARD_MAX_DAYS) -> str:
    return f"""
    WITH h AS ({discrete_hazard_sql(max_days)}),
    t AS (
        SELECT day, n_at_risk, n_converted,
               CASE WHEN n_at_risk > 0 AND n_converted < n_at_risk
                    THEN ln(CAST(n_at_risk - n_converted AS DOUBLE) / n_at_risk)
                    ELSE 0.0 END AS lt,
               CASE WHEN n_at_risk > 0 AND n_converted = n_at_risk
                    THEN 1 ELSE 0 END AS died
        FROM h
    )
    SELECT day, n_at_risk, n_converted,
           CASE WHEN MAX(died) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                THEN 0.0
                ELSE round(exp(SUM(lt) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
           END AS km_survival
    FROM t
    ORDER BY day
    """


def forecast_backtest(events: DataFrame) -> DataFrame:
    """Rolling-origin backtest of the two standard baseline forecasters over
    the daily value series: naive (yesterday's total) and seasonal-naive
    (same weekday last week). Per method: days evaluated, MAE and bias in
    exact cents — the eval harness that decides whether a fancier model
    earns its keep.

    One day-grid aggregate (exact-cents totals), two lag windows over the
    ≤|days|-row grid, one 2-row summary. Signed bias uses the abs/sign
    half-up form so the integer division is engine-stable below zero."""
    daily = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("tot")
        )
    )
    w = Window.orderBy("day")
    g = daily.select(
        "day",
        "tot",
        F.lag("tot", 1).over(w).alias("naive"),
        F.lag("tot", 7).over(w).alias("snaive"),
    )
    rows = []
    for method, col in (("naive", "naive"), ("seasonal_naive", "snaive")):
        e = g.where(F.col(col).isNotNull()).select(
            (F.col(col) - F.col("tot")).alias("err")
        )
        rows.append(
            e.agg(
                F.lit(method).alias("method"),
                F.count("*").cast("long").alias("n_days"),
                F.sum(F.abs("err")).alias("sae"),
                F.sum("err").alias("se"),
            ).select(
                "method",
                "n_days",
                F.expr(
                    "CAST((2 * sae + n_days) DIV (2 * n_days) AS BIGINT)"
                ).alias("mae_cents"),
                F.expr(
                    "CAST(CASE WHEN se < 0 THEN -1 ELSE 1 END"
                    " * ((2 * abs(se) + n_days) DIV (2 * n_days)) AS BIGINT)"
                ).alias("bias_cents"),
            )
        )
    return rows[0].unionByName(rows[1]).orderBy("method")


FORECAST_BACKTEST_SQL = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS tot
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT day, tot,
               LAG(tot, 1) OVER (ORDER BY day) AS naive,
               LAG(tot, 7) OVER (ORDER BY day) AS snaive
        FROM daily
    ),
    e AS (
        SELECT 'naive' AS method, naive - tot AS err FROM g
        WHERE naive IS NOT NULL
        UNION ALL
        SELECT 'seasonal_naive', snaive - tot FROM g WHERE snaive IS NOT NULL
    )
    SELECT method, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST((2 * SUM(abs(err)) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS mae_cents,
           CAST(CASE WHEN SUM(err) < 0 THEN -1 ELSE 1 END
                * ((2 * abs(SUM(err)) + COUNT(*)) // (2 * COUNT(*)))
                AS BIGINT) AS bias_cents
    FROM e
    GROUP BY method
    ORDER BY method
"""


PEAK_PROMINENCE_MILLI = 1200  # a peak must top both neighbors by >= 20%


def daily_peaks(events: DataFrame) -> DataFrame:
    """Local-maxima detection over the daily value series: a day is a peak
    when its exact-cents total tops BOTH neighbors by the prominence factor
    (>= 1.2x) — the alerting primitive behind spike dashboards. One
    day-grid aggregate + two lag/lead comparisons on the tiny grid; the
    prominence test is exact integer cross-multiplication (no ratios)."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("tot")
    )
    w = Window.orderBy("day")
    g = daily.select(
        "day",
        "tot",
        F.lag("tot").over(w).alias("prev"),
        F.lead("tot").over(w).alias("next"),
    )
    is_peak = (
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & (F.lit(1000) * F.col("tot") >= F.lit(PEAK_PROMINENCE_MILLI) * F.col("prev"))
        & (F.lit(1000) * F.col("tot") >= F.lit(PEAK_PROMINENCE_MILLI) * F.col("next"))
    )
    return (
        g.select("day", F.col("tot").alias("total_cents"), is_peak.alias("is_peak"))
        .orderBy("day")
    )


DAILY_PEAKS_SQL = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS tot
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT day, tot,
               LAG(tot) OVER (ORDER BY day) AS prev,
               LEAD(tot) OVER (ORDER BY day) AS next
        FROM daily
    )
    SELECT day, tot AS total_cents,
           (prev IS NOT NULL AND next IS NOT NULL
            AND 1000 * tot >= {PEAK_PROMINENCE_MILLI} * prev
            AND 1000 * tot >= {PEAK_PROMINENCE_MILLI} * next) AS is_peak
    FROM g
    ORDER BY day
"""


HOLT_ALPHA_MILLI = 300  # level smoothing
HOLT_BETA_MILLI = 200   # trend smoothing


def holt_level_trend(events: DataFrame) -> DataFrame:
    """Holt double exponential smoothing over the daily value series — the
    level+trend upgrade over plain EWMA and the model the forecast_backtest
    harness exists to judge: l' = αy + (1−α)(l+t), t' = β(l'−l) + (1−β)t,
    one-step forecast l+t.

    The recursion is inherently sequential, so it runs as ONE JVM array
    fold over the ≤|days|-row grid collected into a single ordered array
    (the events_throttled treatment) — never a driver loop. State stays in
    exact integer cents with SIGNED half-up at each step (trend goes
    negative on declines; the abs/sign form keeps truncating division
    engine-stable), so the fold is bit-identical to the oracle's recursive
    CTE."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("tot")
    )
    ys = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "tot"))),
            lambda s: s["tot"],
        ).alias("ys")
    )
    def hu(num: str) -> str:
        return (
            f"CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
            f" * ((2 * abs({num}) + 1000) DIV 2000) AS BIGINT)"
        )

    a, b = HOLT_ALPHA_MILLI, HOLT_BETA_MILLI
    nl = hu(f"{a} * y + {1000 - a} * (acc.l + acc.t)")
    nt = hu(f"{b} * ({nl} - acc.l) + {1000 - b} * acc.t")
    fold = F.expr(
        "aggregate(slice(ys, 2, size(ys) - 1),"
        " named_struct('l', ys[0], 't', CAST(0 AS BIGINT)),"
        " (acc, y) -> named_struct('l', " + nl + ", 't', " + nt + "),"
        " acc -> acc)"
    )
    return ys.where(F.size("ys") >= 2).select(
        F.size("ys").cast("long").alias("n_days"),
        fold["l"].alias("level_cents"),
        fold["t"].alias("trend_cents"),
        (fold["l"] + fold["t"]).alias("forecast_next_cents"),
    )


def holt_level_trend_sql() -> str:
    a, b = HOLT_ALPHA_MILLI, HOLT_BETA_MILLI

    def hu(num: str) -> str:
        return (
            f"CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
            f" * ((2 * abs({num}) + 1000) // 2000) AS BIGINT)"
        )

    nl = hu(f"{a} * d.y + {1000 - a} * (s.l + s.t)")
    return f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS tot
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, tot AS y FROM daily
    ),
    state(i, l, t) AS (
        SELECT 1, y, CAST(0 AS BIGINT) FROM d WHERE i = 1
        UNION ALL
        SELECT d.i, {nl},
               {hu(f"{b} * ({nl} - s.l) + {1000 - b} * s.t")}
        FROM state s JOIN d ON d.i = s.i + 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
           l AS level_cents, t AS trend_cents,
           l + t AS forecast_next_cents
    FROM state
    WHERE i = (SELECT MAX(i) FROM d) AND (SELECT COUNT(*) FROM d) >= 2
    """

# --- autocorrelation of the daily series -------------------------------------------

ACF_MAX_LAG = 7


def acf_daily(events: DataFrame, max_lag: int = ACF_MAX_LAG) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..max_lag:
    (lag, n_pairs, acf_milli) — the seasonality fingerprint (a weekly cycle
    shows as a spike at lag 7) read before fitting any seasonal model.

    Exactness: with x̄ = S/n rational, r_k's numerator and denominator are
    both multiplied through by n² — Σ(n·x_t − S)(n·x_{t+k} − S) over
    Σ(n·x_t − S)² — keeping EVERYTHING integer until one signed half-up
    milli emit. Counts are exact, so the statistic is bit-stable.

    Scale shape: one day-grain aggregate collapses events; S and the
    denominator ride a broadcast 1-row aggregate; the lag alignment is
    max_lag lead windows over the ≤|days| grid."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("x").alias("s")
    )
    wd = Window.orderBy("day")
    leads = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("x") * F.col("n") - F.col("s")).alias("cx"),
        "n",
        *[
            F.lead("x", k).over(wd).alias(f"x{k}")
            for k in range(1, max_lag + 1)
        ],
        F.col("s"),
    )
    den_rel = leads.agg(F.sum(F.col("cx") * F.col("cx")).alias("den"))
    parts = []
    for k in range(1, max_lag + 1):
        num_k = leads.where(F.col(f"x{k}").isNotNull()).agg(
            F.lit(k).alias("lag"),
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(
                F.col("cx") * (F.col(f"x{k}") * F.col("n") - F.col("s"))
            ).alias("num"),
        )
        parts.append(num_k)
    nums = parts[0]
    for p in parts[1:]:
        nums = nums.unionByName(p)
    return (
        nums.crossJoin(F.broadcast(den_rel))
        .select(
            "lag",
            "n_pairs",
            # den = 0 (a constant daily series) must not divide — ANSI
            # sessions raise where non-ANSI would return NULL
            F.expr(
                "CAST(CASE WHEN den > 0 THEN SIGN(num)"
                " * ((2 * 1000 * ABS(num) + den) DIV (2 * den))"
                " ELSE 0 END AS BIGINT)"
            ).alias("acf_milli"),
        )
        .orderBy("lag")
    )


def acf_daily_sql(max_lag: int = ACF_MAX_LAG) -> str:
    lag_rows = "\n            UNION ALL ".join(
        f"""SELECT {k} AS lag,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(cx * (x{k} * n - s)) AS BIGINT) AS num
            FROM leads WHERE x{k} IS NOT NULL"""
        for k in range(1, max_lag + 1)
    )
    lead_cols = ",\n                   ".join(
        f"LEAD(x, {k}) OVER (ORDER BY day) AS x{k}"
        for k in range(1, max_lag + 1)
    )
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
            FROM daily
        ),
        leads AS (
            SELECT day, x * n - s AS cx, n, s,
                   {lead_cols}
            FROM daily CROSS JOIN tot
        ),
        den_rel AS (
            SELECT CAST(SUM(cx * cx) AS BIGINT) AS den FROM leads
        ),
        nums AS (
            {lag_rows}
        )
        SELECT lag, n_pairs,
               CAST(CASE WHEN den > 0 THEN SIGN(num)
                    * ((2 * 1000 * ABS(num) + den) // (2 * den))
                    ELSE 0 END AS BIGINT) AS acf_milli
        FROM nums CROSS JOIN den_rel
        ORDER BY lag
    """

# --- lead-lag cross-correlation ------------------------------------------------------

XCORR_MAX_LAG = 7


def xcorr_daily(
    events: DataFrame,
    x_type: str = "click",
    y_type: str = "purchase",
    max_lag: int = XCORR_MAX_LAG,
) -> DataFrame:
    """Lead-lag cross-correlation between two event types' daily counts at
    lags −max_lag..max_lag: (lag, n_pairs, num, den_x, den_y, r_milli) —
    positive-lag r answers "do clicks today predict purchases k days
    later?", the causal-direction screen before any attribution model.

    The ACF device generalized: n-scaled centering keeps num/den_x/den_y
    exact integers; the one float step is r = num/√(den_x·den_y) written as
    the identically-associated double expression in both engines (exact
    integer operands → deterministic IEEE result), emitted once at milli.

    Scale shape: one day-grain aggregate; lag alignment via lead/lag
    windows over the bounded day grid; totals ride broadcast 1-row
    aggregates."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == x_type).cast("long")).alias("x"),
        F.sum((F.col("event_type") == y_type).cast("long")).alias("y"),
    )
    tot = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    wd = Window.orderBy("day")
    cols = [
        F.lead("y", k).over(wd).alias(f"y{k}") for k in range(1, max_lag + 1)
    ] + [F.lag("y", k).over(wd).alias(f"y_m{k}") for k in range(1, max_lag + 1)]
    leads = daily.crossJoin(F.broadcast(tot)).select(
        "day", "x", "y", "n", "sx", "sy", *cols
    )
    dens = leads.agg(
        F.sum(
            (F.col("x") * F.col("n") - F.col("sx"))
            * (F.col("x") * F.col("n") - F.col("sx"))
        ).alias("den_x"),
        F.sum(
            (F.col("y") * F.col("n") - F.col("sy"))
            * (F.col("y") * F.col("n") - F.col("sy"))
        ).alias("den_y"),
    )
    parts = []
    for k in range(-max_lag, max_lag + 1):
        ycol = "y" if k == 0 else (f"y{k}" if k > 0 else f"y_m{-k}")
        parts.append(
            leads.where(F.col(ycol).isNotNull()).agg(
                F.lit(k).alias("lag"),
                F.count("*").cast("long").alias("n_pairs"),
                F.sum(
                    (F.col("x") * F.col("n") - F.col("sx"))
                    * (F.col(ycol) * F.col("n") - F.col("sy"))
                ).alias("num"),
            )
        )
    nums = parts[0]
    for p in parts[1:]:
        nums = nums.unionByName(p)
    return (
        nums.crossJoin(F.broadcast(dens))
        .select(
            "lag",
            "n_pairs",
            "num",
            "den_x",
            "den_y",
            F.expr(
                "CAST(CASE WHEN den_x > 0 AND den_y > 0 THEN"
                " round((1000.0 * num)"
                " / sqrt(CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE)))"
                " ELSE 0 END AS BIGINT)"
            ).alias("r_milli"),
        )
        .orderBy("lag")
    )


def xcorr_daily_sql(
    x_type: str = "click", y_type: str = "purchase", max_lag: int = XCORR_MAX_LAG
) -> str:
    lead_cols = ",\n                   ".join(
        [f"LEAD(y, {k}) OVER (ORDER BY day) AS y{k}" for k in range(1, max_lag + 1)]
        + [f"LAG(y, {k}) OVER (ORDER BY day) AS y_m{k}" for k in range(1, max_lag + 1)]
    )

    def one(k: int) -> str:
        ycol = "y" if k == 0 else (f"y{k}" if k > 0 else f"y_m{-k}")
        return f"""SELECT {k} AS lag,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM((x * n - sx) * ({ycol} * n - sy)) AS BIGINT) AS num
            FROM leads WHERE {ycol} IS NOT NULL"""

    lag_rows = "\n            UNION ALL ".join(
        one(k) for k in range(-max_lag, max_lag + 1)
    )
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = '{x_type}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = '{y_type}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy
            FROM daily
        ),
        leads AS (
            SELECT day, x, y, n, sx, sy,
                   {lead_cols}
            FROM daily CROSS JOIN tot
        ),
        dens AS (
            SELECT CAST(SUM((x * n - sx) * (x * n - sx)) AS BIGINT) AS den_x,
                   CAST(SUM((y * n - sy) * (y * n - sy)) AS BIGINT) AS den_y
            FROM leads
        ),
        nums AS (
            {lag_rows}
        )
        SELECT lag, n_pairs, num, den_x, den_y,
               CAST(CASE WHEN den_x > 0 AND den_y > 0 THEN
                    round((1000.0 * num)
                    / sqrt(CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE)))
                    ELSE 0 END AS BIGINT) AS r_milli
        FROM nums CROSS JOIN dens
        ORDER BY lag
    """


# --- Holt-Winters triple exponential smoothing ---------------------------------------

HW_ALPHA_MILLI = 300
HW_BETA_MILLI = 200
HW_GAMMA_MILLI = 200
HW_SEASON = 7


def holt_winters(events: DataFrame) -> DataFrame:
    """Holt-Winters additive triple smoothing over the daily value series —
    the seasonal upgrade of [[holt_level_trend]] (weekly cycle, period 7):
    l' = α(y−s_i) + (1−α)(l+t); t' = β(l'−l) + (1−β)t;
    s_i' = γ(y−l') + (1−γ)s_i; forecast = l' + t' + s_next. Output: one
    panel row (n_days, level_cents, trend_cents, season_next_cents,
    forecast_next_cents).

    Same execution contract as Holt: the inherently-sequential recursion is
    ONE JVM array fold over the ≤|days| ordered grid — the state struct
    additionally carries the 7-slot seasonal array, updated functionally
    (transform with an index CASE), and every step is SIGNED half-up exact
    integer cents, so the fold is bit-identical to the oracle's recursive
    CTE carrying a LIST column."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("tot")
    )
    ys = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "tot"))),
            lambda s: s["tot"],
        ).alias("ys")
    )

    def hu(num: str) -> str:
        return (
            f"CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
            f" * ((2 * abs({num}) + 1000) DIV 2000) AS BIGINT)"
        )

    a, b, g, m = HW_ALPHA_MILLI, HW_BETA_MILLI, HW_GAMMA_MILLI, HW_SEASON
    si = f"element_at(acc.s, CAST((acc.i + 1) % {m} AS INT) + 1)"
    nl = hu(f"{a} * (y - {si}) + {1000 - a} * (acc.l + acc.t)")
    nt = hu(f"{b} * ({nl} - acc.l) + {1000 - b} * acc.t")
    ns = hu(f"{g} * (y - {nl}) + {1000 - g} * {si}")
    upd = (
        f"transform(sequence(0, {m - 1}), j -> CASE"
        f" WHEN j = CAST((acc.i + 1) % {m} AS INT) THEN {ns}"
        f" ELSE element_at(acc.s, j + 1) END)"
    )
    fold = F.expr(
        "aggregate(slice(ys, 2, size(ys) - 1),"
        " named_struct('i', CAST(0 AS BIGINT), 'l', ys[0],"
        " 't', CAST(0 AS BIGINT),"
        f" 's', transform(sequence(0, {m - 1}), j -> CAST(0 AS BIGINT))),"
        f" (acc, y) -> named_struct('i', acc.i + 1, 'l', {nl}, 't', {nt},"
        f" 's', {upd}),"
        " acc -> acc)"
    )
    return (
        ys.where(F.size("ys") >= 2)
        .select(F.size("ys").cast("long").alias("n_days"), fold.alias("st"))
        .select(
            "n_days",
            F.col("st.l").alias("level_cents"),
            F.col("st.t").alias("trend_cents"),
            F.expr(
                f"element_at(st.s, CAST(n_days % {m} AS INT) + 1)"
            ).alias("season_next_cents"),
            (
                F.col("st.l")
                + F.col("st.t")
                + F.expr(f"element_at(st.s, CAST(n_days % {m} AS INT) + 1)")
            ).alias("forecast_next_cents"),
        )
    )


def holt_winters_sql() -> str:
    a, b, g, m = HW_ALPHA_MILLI, HW_BETA_MILLI, HW_GAMMA_MILLI, HW_SEASON

    def hu(num: str) -> str:
        return (
            f"CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
            f" * ((2 * abs({num}) + 1000) // 2000) AS BIGINT)"
        )

    si = f"s.s[CAST((d.i - 1) % {m} AS INT) + 1]"
    nl = hu(f"{a} * (d.y - {si}) + {1000 - a} * (s.l + s.t)")
    nt = hu(f"{b} * ({nl} - s.l) + {1000 - b} * s.t")
    ns = hu(f"{g} * (d.y - {nl}) + {1000 - g} * {si}")
    upd = (
        f"list_transform(range(0, {m}), j -> CASE"
        f" WHEN j = (d.i - 1) % {m} THEN {ns}"
        f" ELSE s.s[CAST(j AS INT) + 1] END)"
    )
    zeros = "[" + ", ".join(["CAST(0 AS BIGINT)"] * m) + "]"
    return f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS tot
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, tot AS y FROM daily
    ),
    state(i, l, t, s) AS (
        SELECT CAST(1 AS BIGINT), y, CAST(0 AS BIGINT), {zeros}
        FROM d WHERE i = 1
        UNION ALL
        SELECT d.i, {nl}, {nt}, {upd}
        FROM state s JOIN d ON d.i = s.i + 1
    ),
    final AS (
        SELECT * FROM state WHERE i = (SELECT MAX(i) FROM d)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
           l AS level_cents, t AS trend_cents,
           s[CAST((SELECT COUNT(*) FROM d) % {m} AS INT) + 1]
               AS season_next_cents,
           l + t + s[CAST((SELECT COUNT(*) FROM d) % {m} AS INT) + 1]
               AS forecast_next_cents
    FROM final
    WHERE (SELECT COUNT(*) FROM d) >= 2
    """


# --- daily volatility (exact-isqrt stddev) ----------------------------------------


def daily_volatility(events: DataFrame) -> DataFrame:
    """Per-type volatility of daily event volume: mean, population
    standard deviation, and coefficient of variation of the observed
    daily counts — the capacity-planning companion to the Fano
    overdispersion panel (which reports var/mean and never needed a
    root). The stddev is an EXACT integer: variance numerator
    V = n·Σc² − (Σc)² in BIGINT, stddev_milli = isqrt(10⁶·V / n²) via
    functions.isqrt — bit-stable cross-engine, no float hash exposure.

    Output per type: (event_type, n_days, mean_milli, stddev_milli,
    cv_milli). BIGINT headroom: 10⁶·V caps at ~10¹⁸ for 10⁵-event days
    over a decade; beyond that the sums move to DECIMAL(38,0) unchanged.

    Scale shape: one (type, day) aggregate then a type-keyed rollup;
    the sqrt is a scalar projection."""
    from ..functions import isqrt

    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("c"))
    rolled = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    return (
        rolled.select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.expr("CAST((2000 * s + n) DIV (2 * n) AS BIGINT)").alias(
                "mean_milli"
            ),
            isqrt(
                F.expr("CAST(1000000 * (n * sq - s * s) DIV (n * n) AS BIGINT)")
            ).alias("stddev_milli"),
        )
        .withColumn(
            "cv_milli",
            F.expr(
                "CASE WHEN mean_milli > 0 THEN"
                " CAST(1000 * stddev_milli DIV mean_milli AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .orderBy("event_type")
    )


def daily_volatility_sql() -> str:
    from ..functions import isqrt_sql

    sd = isqrt_sql("CAST(1000000 * (n * sq - s * s) // (n * n) AS BIGINT)")
    return f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        rolled AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s,
                   CAST(SUM(c * c) AS BIGINT) AS sq
            FROM daily GROUP BY event_type
        ),
        stats AS (
            SELECT event_type, n AS n_days,
                   CAST((2000 * s + n) // (2 * n) AS BIGINT) AS mean_milli,
                   CAST({sd} AS BIGINT) AS stddev_milli
            FROM rolled
        )
        SELECT event_type, n_days, mean_milli, stddev_milli,
               CASE WHEN mean_milli > 0 THEN
                    CAST(1000 * stddev_milli // mean_milli AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS cv_milli
        FROM stats
        ORDER BY event_type
    """


# --- SRE error budget ---------------------------------------------------------------

ERROR_SLO_MILLI = 10  # 1% of events may be errors


def error_budget(events: DataFrame) -> DataFrame:
    """SRE error-budget accounting over the event stream: daily error
    rate against a {ERROR_SLO_MILLI}-milli SLO and the CUMULATIVE budget
    burn — the signal that turns "errors happened" into "we are X% of
    the way to breaching the monthly objective", which a per-day rate
    panel alone can't say.

    burn_milli(d) = cumulative errors / (SLO · cumulative events) in
    milli — 1000 means the budget is exactly spent; the breach flag
    trips above it. Exact integers throughout.

    Scale shape: one day-grain aggregate off the event scan; the
    cumulative window runs over the ≤|days| panel rows, never events."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "err"
        ),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            "day",
            F.col("n").cast("long").alias("n_events"),
            F.col("err").cast("long").alias("n_errors"),
            F.expr("CAST(1000 * err DIV n AS BIGINT)").alias("error_milli"),
            F.sum("n").over(w).alias("cum_n"),
            F.sum("err").over(w).alias("cum_err"),
        )
        .select(
            "day",
            "n_events",
            "n_errors",
            "error_milli",
            F.expr(
                f"CAST(1000000 * cum_err DIV ({ERROR_SLO_MILLI} * cum_n)"
                " AS BIGINT)"
            ).alias("burn_milli"),
        )
        .withColumn("breached", (F.col("burn_milli") > 1000).cast("int"))
        .orderBy("day")
    )


ERROR_BUDGET_SQL = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS err
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT day, n AS n_events, err AS n_errors,
               CAST(1000 * err // n AS BIGINT) AS error_milli,
               SUM(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum_n,
               SUM(err) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum_err
        FROM daily
    )
    SELECT day, n_events, n_errors, error_milli,
           CAST(1000000 * cum_err // ({ERROR_SLO_MILLI} * cum_n) AS BIGINT)
               AS burn_milli,
           CAST(1000000 * cum_err // ({ERROR_SLO_MILLI} * cum_n) > 1000
                AS INT) AS breached
    FROM cum
    ORDER BY day
"""


# --- incident impact ----------------------------------------------------------------


def incident_impact(events: DataFrame) -> DataFrame:
    """Incident blast-radius panel: the day with the most error events
    plays the incident; for every event type, volume on that day vs the
    day before and after — the before/during/after readout an on-call
    writes into the postmortem, computed without hand-picking the date.

    The incident day is a deterministic 1-row argmax scalar (max error
    count, ties to the earlier day), broadcast into one bounded panel.
    Output per type: (event_type, before_n, incident_n, after_n,
    impact_milli) with impact = incident/before in milli (0 when no
    before-baseline).

    Scale shape: one (day) error aggregate for the argmax, one (type,
    day) aggregate filtered to the 3-day window — never a full-history
    panel."""
    err_daily = (
        events.where(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("ne"))
    )
    # ties to the EARLIER day need an inverted tiebreak: max(struct) takes
    # the larger day, so rank explicitly
    incident = (
        err_daily.select(
            "day",
            F.row_number()
            .over(Window.orderBy(F.desc("ne"), F.col("day")))
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(F.col("day").alias("iday"))
    )
    window3 = events.crossJoin(F.broadcast(incident)).where(
        (F.to_date("ts") >= F.date_sub("iday", 1))
        & (F.to_date("ts") <= F.date_add("iday", 1))
    )
    panel = window3.groupBy("event_type").agg(
        F.sum(
            (F.to_date("ts") == F.date_sub("iday", 1)).cast("long")
        ).alias("before_n"),
        F.sum((F.to_date("ts") == F.col("iday")).cast("long")).alias(
            "incident_n"
        ),
        F.sum(
            (F.to_date("ts") == F.date_add("iday", 1)).cast("long")
        ).alias("after_n"),
    )
    return panel.select(
        "event_type",
        "before_n",
        "incident_n",
        "after_n",
        F.expr(
            "CASE WHEN before_n > 0 THEN"
            " CAST(1000 * incident_n DIV before_n AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("impact_milli"),
    ).orderBy("event_type")


INCIDENT_IMPACT_SQL = """
    WITH err_daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS ne
        FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    incident AS (
        SELECT day AS iday FROM (
            SELECT day, row_number() OVER (ORDER BY ne DESC, day) AS rn
            FROM err_daily
        ) WHERE rn = 1
    )
    SELECT e.event_type,
           CAST(SUM(CASE WHEN CAST(e.ts AS DATE) = i.iday - 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS before_n,
           CAST(SUM(CASE WHEN CAST(e.ts AS DATE) = i.iday
                    THEN 1 ELSE 0 END) AS BIGINT) AS incident_n,
           CAST(SUM(CASE WHEN CAST(e.ts AS DATE) = i.iday + 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS after_n,
           CASE WHEN SUM(CASE WHEN CAST(e.ts AS DATE) = i.iday - 1
                         THEN 1 ELSE 0 END) > 0 THEN
                CAST(1000 * SUM(CASE WHEN CAST(e.ts AS DATE) = i.iday
                                THEN 1 ELSE 0 END)
                     // SUM(CASE WHEN CAST(e.ts AS DATE) = i.iday - 1
                            THEN 1 ELSE 0 END) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS impact_milli
    FROM events e CROSS JOIN incident i
    WHERE CAST(e.ts AS DATE) BETWEEN i.iday - 1 AND i.iday + 1
    GROUP BY e.event_type
    ORDER BY e.event_type
"""


# --- metric-tree decomposition ------------------------------------------------------

METRIC_SPLIT_DAY = 16  # period 0 = days 1-15, period 1 = days 16+


def metric_decomposition(events: DataFrame) -> DataFrame:
    """Metric-tree decomposition of total purchase value between two
    periods: total = DAU × purchases/user × value/purchase, so
    Δln(total) = Δln(users) + Δln(freq) + Δln(value) — the growth
    readout that turns "revenue moved 12%" into WHICH lever moved it.
    Periods split at day {METRIC_SPLIT_DAY} of the fixture month.

    Exact integers: each factor's ln quantizes ONCE per period to
    micro-nats (the entropy treatment); contributions are differences
    of those BIGINTs and sum to the total's delta by construction of
    the identity (up to the three independent roundings, ±3 micro).
    Output one row: (users_delta_micro, freq_delta_micro,
    value_delta_micro, total_delta_micro, residual_micro).

    Scale shape: two conditional aggregates over the purchase scan,
    1-row combine."""
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        (F.dayofmonth("ts") >= METRIC_SPLIT_DAY).cast("int").alias("period"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    agg = p.groupBy("period").agg(
        F.count_distinct("user_id").alias("users"),
        F.count("*").alias("n"),
        F.sum("cents").alias("cents"),
    )
    micro = (
        lambda c: F.round(F.log(c) * F.lit(1e6)).cast("long")  # noqa: E731
    )
    lns = agg.select(
        "period",
        micro(F.col("users")).alias("lu"),
        micro(F.col("n") / F.col("users")).alias("lf"),
        micro(F.col("cents") / F.col("n")).alias("lv"),
        micro(F.col("cents")).alias("lt"),
    )
    p0 = lns.where(F.col("period") == 0).select(
        F.col("lu").alias("lu0"), F.col("lf").alias("lf0"),
        F.col("lv").alias("lv0"), F.col("lt").alias("lt0"),
    )
    p1 = lns.where(F.col("period") == 1).select(
        F.col("lu").alias("lu1"), F.col("lf").alias("lf1"),
        F.col("lv").alias("lv1"), F.col("lt").alias("lt1"),
    )
    return p0.crossJoin(F.broadcast(p1)).select(
        (F.col("lu1") - F.col("lu0")).alias("users_delta_micro"),
        (F.col("lf1") - F.col("lf0")).alias("freq_delta_micro"),
        (F.col("lv1") - F.col("lv0")).alias("value_delta_micro"),
        (F.col("lt1") - F.col("lt0")).alias("total_delta_micro"),
        (
            (F.col("lt1") - F.col("lt0"))
            - (F.col("lu1") - F.col("lu0"))
            - (F.col("lf1") - F.col("lf0"))
            - (F.col("lv1") - F.col("lv0"))
        ).alias("residual_micro"),
    )


METRIC_DECOMPOSITION_SQL = f"""
    WITH p AS (
        SELECT user_id,
               CAST(dayofmonth(ts) >= {METRIC_SPLIT_DAY} AS INT) AS period,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    agg AS (
        SELECT period,
               COUNT(DISTINCT user_id) AS users,
               COUNT(*) AS n,
               SUM(cents) AS cents
        FROM p GROUP BY period
    ),
    lns AS (
        SELECT period,
               CAST(round(ln(users) * 1e6) AS BIGINT) AS lu,
               CAST(round(ln(CAST(n AS DOUBLE) / users) * 1e6) AS BIGINT)
                   AS lf,
               CAST(round(ln(CAST(cents AS DOUBLE) / n) * 1e6) AS BIGINT)
                   AS lv,
               CAST(round(ln(cents) * 1e6) AS BIGINT) AS lt
        FROM agg
    )
    SELECT CAST(p1.lu - p0.lu AS BIGINT) AS users_delta_micro,
           CAST(p1.lf - p0.lf AS BIGINT) AS freq_delta_micro,
           CAST(p1.lv - p0.lv AS BIGINT) AS value_delta_micro,
           CAST(p1.lt - p0.lt AS BIGINT) AS total_delta_micro,
           CAST((p1.lt - p0.lt) - (p1.lu - p0.lu)
                - (p1.lf - p0.lf) - (p1.lv - p0.lv) AS BIGINT)
               AS residual_micro
    FROM (SELECT * FROM lns WHERE period = 0) p0
    CROSS JOIN (SELECT * FROM lns WHERE period = 1) p1
"""


# --- 24h load shape -----------------------------------------------------------------


def load_shape(events: DataFrame) -> DataFrame:
    """24-hour load-shape summary per event type: average hourly volume
    at the PEAK hour vs the TROUGH hour and their ratio — the two
    numbers capacity sizing actually uses (provision for peak, autoscale
    floor at trough), condensed from the full hourly heatmap.

    Per (type, hour-of-day): total events and distinct observed days →
    average per occurrence in milli; peak/trough by exact max/min over
    the ≤24-row panel (ties to the earlier hour). Output per type:
    (event_type, peak_hour, peak_avg_milli, trough_hour,
    trough_avg_milli, peak_trough_ratio_milli).

    Scale shape: one (type, hour) aggregate, bounded 24-row rollup."""
    hourly = events.groupBy(
        "event_type", F.hour("ts").alias("hod")
    ).agg(
        F.count("*").alias("n"),
        F.count_distinct(F.to_date("ts")).alias("days"),
    )
    graded = hourly.select(
        "event_type",
        "hod",
        F.expr("CAST((2000 * n + days) DIV (2 * days) AS BIGINT)").alias(
            "avg_milli"
        ),
    )
    w_peak = Window.partitionBy("event_type").orderBy(
        F.desc("avg_milli"), F.col("hod")
    )
    w_trough = Window.partitionBy("event_type").orderBy(
        F.asc("avg_milli"), F.col("hod")
    )
    ranked = graded.select(
        "event_type",
        "hod",
        "avg_milli",
        F.row_number().over(w_peak).alias("rp"),
        F.row_number().over(w_trough).alias("rt"),
    )
    peak = ranked.where(F.col("rp") == 1).select(
        "event_type",
        F.col("hod").cast("long").alias("peak_hour"),
        F.col("avg_milli").alias("peak_avg_milli"),
    )
    trough = ranked.where(F.col("rt") == 1).select(
        "event_type",
        F.col("hod").cast("long").alias("trough_hour"),
        F.col("avg_milli").alias("trough_avg_milli"),
    )
    return (
        peak.join(trough, "event_type")
        .withColumn(
            "peak_trough_ratio_milli",
            F.expr(
                "CASE WHEN trough_avg_milli > 0 THEN"
                " CAST(1000 * peak_avg_milli DIV trough_avg_milli AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .orderBy("event_type")
    )


LOAD_SHAPE_SQL = """
    WITH hourly AS (
        SELECT event_type, hour(ts) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days
        FROM events GROUP BY 1, 2
    ),
    graded AS (
        SELECT event_type, hod,
               CAST((2000 * n + days) // (2 * days) AS BIGINT) AS avg_milli
        FROM hourly
    ),
    ranked AS (
        SELECT event_type, hod, avg_milli,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY avg_milli DESC, hod) AS rp,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY avg_milli ASC, hod) AS rt
        FROM graded
    )
    SELECT p.event_type,
           CAST(p.hod AS BIGINT) AS peak_hour,
           p.avg_milli AS peak_avg_milli,
           CAST(t.hod AS BIGINT) AS trough_hour,
           t.avg_milli AS trough_avg_milli,
           CASE WHEN t.avg_milli > 0 THEN
                CAST(1000 * p.avg_milli // t.avg_milli AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS peak_trough_ratio_milli
    FROM (SELECT * FROM ranked WHERE rp = 1) p
    JOIN (SELECT * FROM ranked WHERE rt = 1) t USING (event_type)
    ORDER BY p.event_type
"""


# --- incident hotspots --------------------------------------------------------------


def incident_hotspots(events: DataFrame) -> DataFrame:
    """Blast-radius drill-down: on the peak-error day (the same argmax
    scalar as incident_impact), which HOURS carried the errors — the
    panel the on-call actually scans to find the trigger window.
    Output per hour of the incident day with ≥1 error: (hour, n_errors,
    n_events, error_share_milli of the day's errors).

    Scale shape: argmax-day scalar broadcast, one filtered (hour)
    rollup."""
    err_daily = (
        events.where(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("ne"))
    )
    incident = (
        err_daily.select(
            "day",
            F.row_number()
            .over(Window.orderBy(F.desc("ne"), F.col("day")))
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(F.col("day").alias("iday"))
    )
    day_events = events.crossJoin(F.broadcast(incident)).where(
        F.to_date("ts") == F.col("iday")
    )
    panel = day_events.groupBy(F.hour("ts").cast("long").alias("hour")).agg(
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("n_errors"),
        F.count("*").cast("long").alias("n_events"),
    )
    return (
        panel.where(F.col("n_errors") > 0)
        .select(
            "hour",
            "n_errors",
            "n_events",
            F.expr(
                "CAST(1000 * n_errors DIV (SUM(n_errors) OVER ()) AS BIGINT)"
            ).alias("error_share_milli"),
        )
        .orderBy("hour")
    )


INCIDENT_HOTSPOTS_SQL = """
    WITH err_daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS ne
        FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    incident AS (
        SELECT day AS iday FROM (
            SELECT day, row_number() OVER (ORDER BY ne DESC, day) AS rn
            FROM err_daily
        ) WHERE rn = 1
    ),
    panel AS (
        SELECT CAST(hour(e.ts) AS BIGINT) AS hour,
               CAST(SUM(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events e CROSS JOIN incident i
        WHERE CAST(e.ts AS DATE) = i.iday
        GROUP BY 1
    )
    SELECT hour, n_errors, n_events,
           CAST(1000 * n_errors // (SUM(n_errors) OVER ()) AS BIGINT)
               AS error_share_milli
    FROM panel
    WHERE n_errors > 0
    ORDER BY hour
"""


# --- maximum drawdown of the daily cumulative net value ------------------------------


def max_drawdown_daily(events: DataFrame) -> DataFrame:
    """Maximum drawdown of the cumulative daily net value series — the
    worst peak-to-trough drop (classic risk/health metric, applied to the
    revenue-minus-errors pulse of the event stream): running peak of the
    cumulative series, drawdown = peak − current, argmax with the peak/
    trough days pinned. One panel row: (n_days, peak_day, trough_day,
    peak_cents, trough_cents, max_drawdown_cents).

    Exact integer cents end to end; the tie policy (earliest trough, then
    its earliest preceding peak) is encoded in the rank ORDER so both
    engines select the identical episode.

    Scale shape: one day-grain aggregate collapses the stream; every window
    (cumsum, running max, rank) runs over the bounded ≤|days| grid."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("net_cents")
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("net_cents").over(wc).alias("cum_cents"),
    )
    run = cum.select(
        "day",
        "cum_cents",
        F.max("cum_cents").over(wc.orderBy("day")).alias("peak_cents"),
    ).withColumn("drawdown", F.col("peak_cents") - F.col("cum_cents"))
    ranked = run.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("drawdown").desc(), F.col("day").asc())
        ),
    )
    worst = ranked.where(F.col("rk") == 1).select(
        F.col("day").alias("trough_day"),
        F.col("cum_cents").alias("trough_cents"),
        F.col("peak_cents"),
        F.col("drawdown").alias("max_drawdown_cents"),
    )
    peak_day = (
        run.join(
            F.broadcast(worst.select("peak_cents", "trough_day")),
            "peak_cents",
        )
        .where(F.col("day") <= F.col("trough_day"))
        .agg(F.min("day").alias("peak_day"))
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    return (
        worst.crossJoin(F.broadcast(peak_day))
        .crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            "peak_day",
            "trough_day",
            "peak_cents",
            "trough_cents",
            "max_drawdown_cents",
        )
    )


MAX_DRAWDOWN_SQL = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS net_cents
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT day,
               SUM(net_cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum_cents
        FROM daily
    ),
    run AS (
        SELECT day, cum_cents,
               MAX(cum_cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS peak_cents
        FROM cum
    ),
    worst AS (
        SELECT day AS trough_day, cum_cents AS trough_cents, peak_cents,
               peak_cents - cum_cents AS max_drawdown_cents
        FROM run
        ORDER BY peak_cents - cum_cents DESC, day ASC
        LIMIT 1
    ),
    pk AS (
        SELECT MIN(r.day) AS peak_day
        FROM run r JOIN worst w ON r.peak_cents = w.peak_cents
        WHERE r.day <= w.trough_day
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
    SELECT n_days, peak_day, trough_day,
           CAST(peak_cents AS BIGINT) AS peak_cents,
           CAST(trough_cents AS BIGINT) AS trough_cents,
           CAST(max_drawdown_cents AS BIGINT) AS max_drawdown_cents
    FROM worst CROSS JOIN pk CROSS JOIN nd
"""


# --- Ljung-Box portmanteau test over the daily ACF -----------------------------------

LJUNG_BOX_H = 7
# chi-square upper 5% critical value with h = 7 dof, micro-quantized
# (14.067140 — the standard table constant; embedding it as a literal keeps
# the decision integer-exact with no runtime chi-square inverse anywhere)
LJUNG_BOX_CRIT_MICRO = 14_067_140


def ljung_box_daily(events: DataFrame, h: int = LJUNG_BOX_H) -> DataFrame:
    """Ljung-Box portmanteau whiteness test on the daily event-count series:
    Q = n(n+2) Σ_{k=1..h} ρ_k²/(n−k) against the χ²(h) 5% critical value —
    the "is there ANY autocorrelation left" gate run on forecast residuals
    and A/A streams before trusting iid-based intervals.

    Composition + exactness: ρ_k are the ALREADY-CERTIFIED integer-milli
    autocorrelations of acf_daily; Q is then a pure integer function of them
    (per-lag term = n(n+2)·ρ_milli² DIV (n−k), summed, in micro units) and
    the decision compares micro integers against the literal critical value
    — bit-identical across engines. The milli quantization of ρ perturbs Q
    by < 0.1% of typical values, far from decision boundaries at any
    realistic n (documented trade for engine-exactness).

    Scale shape: inherits acf_daily's one day-grain aggregate + h lead
    windows over the bounded grid; everything else is ≤h rows."""
    acf = acf_daily(events, h)
    nd = (
        events.select(F.to_date("ts").alias("day"))
        .distinct()
        .agg(F.count("*").cast("long").alias("n_days"))
    )
    terms = acf.crossJoin(F.broadcast(nd)).select(
        "n_days",
        F.expr(
            "CAST(n_days * (n_days + 2) * acf_milli * acf_milli"
            " DIV (n_days - lag) AS BIGINT)"
        ).alias("term_micro"),
    )
    return (
        terms.groupBy("n_days")
        .agg(
            F.count("*").cast("long").alias("h"),
            F.sum("term_micro").cast("long").alias("q_micro"),
        )
        .select(
            "n_days",
            "h",
            "q_micro",
            F.lit(LJUNG_BOX_CRIT_MICRO).cast("long").alias("crit_micro"),
            (F.col("q_micro") > LJUNG_BOX_CRIT_MICRO).cast("int").alias(
                "reject_whiteness"
            ),
        )
    )


def ljung_box_daily_sql(h: int = LJUNG_BOX_H) -> str:
    return f"""
        WITH acf AS ({acf_daily_sql(h)}),
        nd AS (
            SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
            FROM events
        ),
        terms AS (
            SELECT n_days,
                   CAST(n_days * (n_days + 2) * acf_milli * acf_milli
                        // (n_days - lag) AS BIGINT) AS term_micro
            FROM acf CROSS JOIN nd
        )
        SELECT n_days,
               CAST(COUNT(*) AS BIGINT) AS h,
               CAST(SUM(term_micro) AS BIGINT) AS q_micro,
               CAST({LJUNG_BOX_CRIT_MICRO} AS BIGINT) AS crit_micro,
               CAST(SUM(term_micro) > {LJUNG_BOX_CRIT_MICRO} AS INT)
                   AS reject_whiteness
        FROM terms
        GROUP BY n_days
    """


# --- multi-window error-budget burn-rate alerts ---------------------------------------

BURN_BUDGET_PCT = 5          # SLO: 5% error budget
BURN_LONG_HOURS = 6          # long window
BURN_THRESHOLD_MILLI = 4500  # alert when BOTH windows burn > 4.5x budget


def burn_rate_alerts(
    events: DataFrame,
    budget_pct: int = BURN_BUDGET_PCT,
    long_hours: int = BURN_LONG_HOURS,
    threshold_milli: int = BURN_THRESHOLD_MILLI,
) -> DataFrame:
    """Multi-window error-budget burn-rate alerting (the SRE-workbook page
    of events_error_budget): per hour, the 1-hour and trailing long_hours
    burn rates (error share over the 1/budget normalizer), alerting only
    when BOTH exceed the threshold — the short window gives fast detection,
    the long window suppresses blips. Output: the alerting hours with both
    burns.

    Exact integers: burn_milli = 1000 * errors * (100/budget_pct) DIV total
    — no float ratio; window sums are integer counts over the bounded hour
    grid (the cumulative windows run on the hour-grain AGGREGATE).

    Scale shape: one hour-grain aggregate collapses the stream; two range
    windows over the ≤|hours| grid; output is the alert set only."""
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").cast("long").alias("total"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("errors"),
    )
    mult = 100 // budget_pct
    hsec = F.unix_timestamp("hour").cast("long")
    wl = (
        Window.orderBy(hsec)
        .rangeBetween(-(long_hours - 1) * 3600, 0)
    )
    burned = hourly.select(
        "hour",
        "total",
        "errors",
        F.sum("total").over(wl).alias("l_total"),
        F.sum("errors").over(wl).alias("l_errors"),
    ).select(
        "hour",
        F.expr(f"CAST(1000 * errors * {mult} DIV total AS BIGINT)").alias(
            "short_burn_milli"
        ),
        F.expr(f"CAST(1000 * l_errors * {mult} DIV l_total AS BIGINT)").alias(
            "long_burn_milli"
        ),
    )
    return (
        burned.where(
            (F.col("short_burn_milli") > threshold_milli)
            & (F.col("long_burn_milli") > threshold_milli)
        )
        .orderBy("hour")
    )


def burn_rate_alerts_sql(
    budget_pct: int = BURN_BUDGET_PCT,
    long_hours: int = BURN_LONG_HOURS,
    threshold_milli: int = BURN_THRESHOLD_MILLI,
) -> str:
    mult = 100 // budget_pct
    return f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS total,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS errors
            FROM events GROUP BY 1
        ),
        burned AS (
            SELECT hour,
                   CAST(1000 * errors * {mult} // total AS BIGINT)
                       AS short_burn_milli,
                   CAST(1000 * SUM(errors) OVER w * {mult}
                        // SUM(total) OVER w AS BIGINT) AS long_burn_milli
            FROM hourly
            WINDOW w AS (ORDER BY epoch(hour)
                         RANGE BETWEEN {(long_hours - 1) * 3600} PRECEDING
                         AND CURRENT ROW)
        )
        SELECT hour, short_burn_milli, long_burn_milli
        FROM burned
        WHERE short_burn_milli > {threshold_milli}
          AND long_burn_milli > {threshold_milli}
        ORDER BY hour
    """


# --- interrupted time-series (segmented regression around the incident) ---------------


def interrupted_time_series(events: DataFrame) -> DataFrame:
    """Segmented-regression ITS around the worst incident day (the
    quasi-experimental causal read when no control group exists — the
    upgrade over eyeballing a dashboards dip): pick the intervention day T
    as the max-error day (the events_incident_impact device), fit separate
    OLS lines value ~ day_index on the pre and post segments, and report
    the LEVEL change (gap between the two fitted lines AT T) and SLOPE
    change. One panel row: (n_days, incident_day, pre_days, post_days,
    slope_pre, slope_post, slope_change, level_change).

    Arithmetic: daily sums are exact integer cents; the OLS closed form
    then runs in doubles with 6-dp emits (the user_trend discipline — the
    double chain is identical in both engines, so the rounding is
    bit-stable). Degenerate segments (< 2 days) emit NULL slopes.

    Scale shape: one day-grain aggregate; the argmax-day scalar and both
    segment fits are broadcast 1-row aggregates over the bounded grid."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("y"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("errs"),
    )
    wd = Window.orderBy("day")
    idx = daily.withColumn("t", F.row_number().over(wd).cast("double"))
    incident = (
        idx.orderBy(F.col("errs").desc(), F.col("day").asc())
        .limit(1)
        .select(F.col("day").alias("incident_day"), F.col("t").alias("t0"))
    )
    seg = idx.crossJoin(F.broadcast(incident)).withColumn(
        "is_pre", (F.col("t") < F.col("t0")).cast("int")
    )
    stats = seg.groupBy("is_pre").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("t").alias("sx"),
        F.sum(F.col("y").cast("double")).alias("sy"),
        F.sum(F.col("t") * F.col("y").cast("double")).alias("sxy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(den > 0, (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den)
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    fitted = stats.select(
        "is_pre",
        F.col("n").cast("long").alias("seg_days"),
        slope.alias("b"),
        intercept.alias("a"),
    )
    pre = fitted.where("is_pre = 1").select(
        F.col("seg_days").alias("pre_days"),
        F.col("b").alias("b_pre"),
        F.col("a").alias("a_pre"),
    )
    post = fitted.where("is_pre = 0").select(
        F.col("seg_days").alias("post_days"),
        F.col("b").alias("b_post"),
        F.col("a").alias("a_post"),
    )
    nd = daily.agg(F.count("*").cast("long").alias("n_days"))
    return (
        pre.crossJoin(F.broadcast(post))
        .crossJoin(F.broadcast(incident))
        .crossJoin(F.broadcast(nd))
        .select(
            "n_days",
            "incident_day",
            "pre_days",
            "post_days",
            F.round("b_pre", 6).alias("slope_pre"),
            F.round("b_post", 6).alias("slope_post"),
            F.round(F.col("b_post") - F.col("b_pre"), 6).alias("slope_change"),
            F.round(
                (F.col("a_post") + F.col("b_post") * F.col("t0"))
                - (F.col("a_pre") + F.col("b_pre") * F.col("t0")),
                6,
            ).alias("level_change"),
        )
    )


INTERRUPTED_TS_SQL = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errs
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, y, errs,
               CAST(row_number() OVER (ORDER BY day) AS DOUBLE) AS t
        FROM daily
    ),
    incident AS (
        SELECT day AS incident_day, t AS t0
        FROM idx ORDER BY errs DESC, day ASC LIMIT 1
    ),
    seg AS (
        SELECT idx.*, CASE WHEN t < t0 THEN 1 ELSE 0 END AS is_pre
        FROM idx CROSS JOIN incident
    ),
    stats AS (
        SELECT is_pre,
               CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(t) AS sx, SUM(CAST(y AS DOUBLE)) AS sy,
               SUM(t * CAST(y AS DOUBLE)) AS sxy, SUM(t * t) AS sxx
        FROM seg GROUP BY is_pre
    ),
    fitted AS (
        SELECT is_pre, CAST(n AS BIGINT) AS seg_days,
               CASE WHEN n * sxx - sx * sx > 0
                    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS b,
               (sy - CASE WHEN n * sxx - sx * sx > 0
                     THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END * sx)
                   / n AS a
        FROM stats
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
    SELECT n_days, incident_day,
           pre.seg_days AS pre_days, post.seg_days AS post_days,
           round(pre.b, 6) AS slope_pre,
           round(post.b, 6) AS slope_post,
           round(post.b - pre.b, 6) AS slope_change,
           round((post.a + post.b * t0) - (pre.a + pre.b * t0), 6)
               AS level_change
    FROM (SELECT * FROM fitted WHERE is_pre = 1) pre
    CROSS JOIN (SELECT * FROM fitted WHERE is_pre = 0) post
    CROSS JOIN incident CROSS JOIN nd
"""


# --- Little's law audit ---------------------------------------------------------

LITTLES_GAP_MIN = 30


def littles_law_daily(events: DataFrame, gap_min: int = LITTLES_GAP_MIN) -> DataFrame:
    """Little's law audit per day: rows (day, n_started,
    l_obs_micro, l_pred_micro), ordered by day.

    session_concurrency tracks the instantaneous L; this audits the
    queueing identity L = lambda * W against it — l_pred charges each
    session's FULL duration to its start day (lambda * W in day units),
    l_obs integrates actual within-day presence (sessions clipped at
    midnight). The two diverge exactly by cross-midnight mass, so the gap
    is a boundary-effect meter for any daily-grain session KPI.

    Exactness: session bounds are exact microsecond integers
    (unix-epoch), overlaps are integer min/max differences, and both
    outputs quantize once from integer-microsecond sums.

    Scale shape: one user-partitioned session window pass, a bounded
    <=|session-days| explode (sessions span whole days, not rows), two
    (day) aggregates joined on the bounded day grid."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "event_id",
        "ts",
        (
            F.coalesce(
                (
                    F.unix_micros(F.col("ts"))
                    - F.unix_micros(F.lag("ts").over(w))
                )
                > gap_min * 60 * 1000000,
                F.lit(True),
            )
        )
        .cast("int")
        .alias("is_new"),
    )
    sess = marked.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    ).groupBy("user_id", "sid").agg(
        F.unix_micros(F.min("ts")).alias("s_us"),
        F.unix_micros(F.max("ts")).alias("e_us"),
        F.to_date(F.min("ts")).alias("start_day"),
        F.to_date(F.max("ts")).alias("end_day"),
    )
    pred = sess.groupBy(F.col("start_day").alias("day")).agg(
        F.count("*").cast("long").alias("n_started"),
        F.sum(F.col("e_us") - F.col("s_us")).cast("long").alias("dur_us"),
    )
    DAY_US = 86400 * 1000000
    obs = (
        sess.select(
            "s_us",
            "e_us",
            F.explode(
                F.sequence(F.col("start_day"), F.col("end_day"))
            ).alias("day"),
        )
        .select(
            "day",
            (
                F.least(
                    F.col("e_us"),
                    F.unix_micros(
                        F.to_timestamp(F.date_add(F.col("day"), 1))
                    ),
                )
                - F.greatest(
                    F.col("s_us"),
                    F.unix_micros(F.to_timestamp(F.col("day"))),
                )
            ).alias("ov_us"),
        )
        .groupBy("day")
        .agg(F.sum("ov_us").cast("long").alias("ov_us"))
    )
    return (
        pred.join(obs, "day", "outer")
        .select(
            "day",
            F.coalesce("n_started", F.lit(0)).alias("n_started"),
            F.expr(
                f"CAST(round(1e6 * COALESCE(ov_us, 0) / {DAY_US}.0)"
                " AS BIGINT)"
            ).alias("l_obs_micro"),
            F.expr(
                f"CAST(round(1e6 * COALESCE(dur_us, 0) / {DAY_US}.0)"
                " AS BIGINT)"
            ).alias("l_pred_micro"),
        )
        .orderBy("day")
    )


def littles_law_daily_sql(gap_min: int = LITTLES_GAP_MIN) -> str:
    return f"""
        WITH marked AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                        > {gap_min} * 60 * CAST(1000000 AS BIGINT)
                        OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, sid,
                   epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us,
                   CAST(MIN(ts) AS DATE) AS start_day,
                   CAST(MAX(ts) AS DATE) AS end_day
            FROM (
                SELECT user_id, ts,
                       SUM(is_new) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS sid
                FROM marked
            )
            GROUP BY user_id, sid
        ),
        pred AS (
            SELECT start_day AS day, CAST(COUNT(*) AS BIGINT) AS n_started,
                   CAST(SUM(e_us - s_us) AS BIGINT) AS dur_us
            FROM sess GROUP BY start_day
        ),
        obs AS (
            SELECT day,
                   CAST(SUM(LEAST(e_us, epoch_us(CAST(day + 1 AS TIMESTAMP)))
                        - GREATEST(s_us, epoch_us(CAST(day AS TIMESTAMP))))
                        AS BIGINT) AS ov_us
            FROM (
                SELECT s_us, e_us,
                       UNNEST(generate_series(start_day, end_day,
                              INTERVAL 1 DAY))::DATE AS day
                FROM sess
            )
            GROUP BY day
        )
        SELECT COALESCE(pred.day, obs.day) AS day,
               COALESCE(n_started, 0) AS n_started,
               CAST(round(1e6 * COALESCE(ov_us, 0) / 86400000000.0)
                    AS BIGINT) AS l_obs_micro,
               CAST(round(1e6 * COALESCE(dur_us, 0) / 86400000000.0)
                    AS BIGINT) AS l_pred_micro
        FROM pred FULL OUTER JOIN obs ON pred.day = obs.day
        ORDER BY day
    """


RMST_HORIZONS = (7, 14, 30)
RMST_MAX_DAYS = 30  # must cover max(RMST_HORIZONS); hazard's own 14-day
                    # horizon would silently truncate the 30-day integral


def restricted_mean_survival(
    events: DataFrame, max_days: int = RMST_MAX_DAYS
) -> DataFrame:
    """Restricted mean survival time over the discrete_hazard table: for
    each horizon tau, RMST(tau) = sum_{d<tau} S(d) — the expected number of
    conversion-free days out of the first tau, the scalar clinicians and
    retention analysts quote when hazard curves cross and medians mislead:
    rows (tau_days, n_users, rmst_milli).

    kaplan_meier draws the CURVE; RMST integrates it, and on the discrete
    day grid the integral is a plain sum of the survival steps.

    Exactness: survival quantizes per day to micro (round(1e6 * exp of the
    cumulative ln-sum) — the KM ladder's engine-stable form) BEFORE the
    horizon sums, so each RMST is an exact integer sum over <= tau rows and
    the final milli rounding is deterministic.

    Scale shape: rides discrete_hazard (one user-keyed aggregate, bounded
    day grid); adds one cumulative window over that grid and a 3-row
    literal horizon join."""
    h = discrete_hazard(events, max_days)
    n, d = F.col("n_at_risk"), F.col("n_converted")
    term = F.when((n > 0) & (d < n), F.log((n - d).cast("double") / n)).otherwise(
        F.lit(0.0)
    )
    died = ((n > 0) & (d == n)).cast("int")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s_micro = (
        h.withColumn("t", term)
        .withColumn("z", F.max(died).over(w))
        .select(
            "day",
            F.first(n).over(w).alias("n_users"),
            F.when(F.col("z") == 1, F.lit(0))
            .otherwise(F.expr("CAST(round(1e6 * exp(SUM(t) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS BIGINT)"))
            .alias("s_micro"),
        )
    )
    taus = events.sparkSession.createDataFrame(
        [(t,) for t in RMST_HORIZONS], "tau_days int"
    )
    return (
        s_micro.crossJoin(F.broadcast(taus))
        .where(F.col("day") < F.col("tau_days"))
        .groupBy("tau_days")
        .agg(
            F.max("n_users").cast("long").alias("n_users"),
            F.expr("CAST(round(SUM(s_micro) / 1000.0) AS BIGINT)").alias(
                "rmst_milli"
            ),
        )
        .orderBy("tau_days")
    )


def restricted_mean_survival_sql(max_days: int = RMST_MAX_DAYS) -> str:
    taus = ", ".join(f"({t})" for t in RMST_HORIZONS)
    return f"""
    WITH h AS ({discrete_hazard_sql(max_days)}),
    t AS (
        SELECT day, n_at_risk,
               CASE WHEN n_at_risk > 0 AND n_converted < n_at_risk
                    THEN ln(CAST(n_at_risk - n_converted AS DOUBLE) / n_at_risk)
                    ELSE 0.0 END AS lt,
               CASE WHEN n_at_risk > 0 AND n_converted = n_at_risk
                    THEN 1 ELSE 0 END AS died
        FROM h
    ),
    s AS (
        SELECT day,
               FIRST(n_at_risk) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_users,
               CASE WHEN MAX(died) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                    THEN 0
                    ELSE CAST(round(1e6 * exp(SUM(lt) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
                        AS BIGINT)
               END AS s_micro
        FROM t
    ),
    taus(tau_days) AS (VALUES {taus})
    SELECT tau_days, CAST(MAX(n_users) AS BIGINT) AS n_users,
           CAST(round(SUM(s_micro) / 1000.0) AS BIGINT) AS rmst_milli
    FROM s CROSS JOIN taus
    WHERE day < tau_days
    GROUP BY tau_days
    ORDER BY tau_days
    """


ERLANG_SERVICE_PER_HOUR = 50  # declared per-server service rate
ERLANG_GRID = 8  # servers evaluated: c0 .. c0+7
ERLANG_C_CAP = 12  # factorial() stays in BIGINT; see docstring for big-a form


def erlang_c_staffing(
    events: DataFrame, mu: int = ERLANG_SERVICE_PER_HOUR
) -> DataFrame:
    """Erlang-C staffing table from the measured event arrival rate: for 8
    candidate server counts, the probability an arrival waits and its
    expected queue delay — the queueing-theory capacity answer behind
    littles_law's empirical one: rows (servers, rho_micro, p_wait_micro,
    wq_ms) ordered by servers.

    lambda is measured (N events over 24*|days| hours); mu is the declared
    {ERLANG_SERVICE_PER_HOUR}/hour. With offered load a = lambda/mu,
        C(c, a) = (a^c / (c! (1-rho))) / (sum_{{k<c}} a^k/k! + a^c/(c!(1-rho)))
        Wq = C / (c*mu - lambda),  rho = a/c
    The grid starts at ceil(a) (capped at {ERLANG_C_CAP} so factorial()
    stays exact BIGINT — production sizing at hundreds of erlangs uses the
    Horner/lgamma form) and unstable rows (rho >= 1) emit the honest
    sentinel p_wait = 1, wq = 0.

    Exactness: N and the day count are exact; each a^k/k! term quantizes
    to pico before the bounded k-sum, so the C ratio is a deterministic
    double of two exact BIGINTs.

    Scale shape: one 2-scalar aggregate of the events table; everything
    after is an 8 x <=c literal grid."""
    tot = events.agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct(F.to_date("ts")).cast("long").alias("days"),
    )
    base = tot.select(
        "n",
        "days",
        F.expr("CAST(n AS DOUBLE) / (24 * days)").alias("lam"),
    ).select(
        "lam",
        F.expr(f"lam / {mu}").alias("a"),
        F.expr(
            f"CAST(greatest(1, least(CAST(ceil(lam / {mu}) AS BIGINT),"
            f" {ERLANG_C_CAP})) AS BIGINT)"
        ).alias("c0"),
    )
    grid = base.select(
        "lam",
        "a",
        F.explode(
            F.expr(f"sequence(c0, c0 + {ERLANG_GRID - 1})")
        ).alias("c"),
    )
    terms = grid.select(
        "lam",
        "a",
        "c",
        F.explode(F.expr("sequence(0, CAST(c - 1 AS INT))")).alias("k"),
    ).select(
        "lam",
        "a",
        "c",
        F.expr(
            "CASE WHEN a < c THEN CAST(round(1e12 * pow(a, k) / factorial(k))"
            " AS BIGINT) ELSE 0 END"
        ).alias("t_k"),
    )
    summed = terms.groupBy("lam", "a", "c").agg(
        F.sum("t_k").cast("long").alias("s_pico")
    )
    return (
        summed.select(
            "lam",
            "a",
            "c",
            "s_pico",
            F.expr(
                "CASE WHEN a < c THEN CAST(round(1e12 * pow(a, c)"
                " / (factorial(CAST(c AS INT)) * (1 - a / c))) AS BIGINT)"
                " ELSE 0 END"
            ).alias("l_pico"),
        )
        .select(
            F.col("c").cast("long").alias("servers"),
            F.expr("CAST(round(1e6 * a / c) AS BIGINT)").alias("rho_micro"),
            F.expr(
                "CASE WHEN a < c THEN CAST(round(1e6 * l_pico"
                " / CAST(s_pico + l_pico AS DOUBLE)) AS BIGINT)"
                " ELSE 1000000 END"
            ).alias("p_wait_micro"),
            F.expr(
                f"CASE WHEN a < c THEN CAST(round(1000 * 3600"
                f" * (l_pico / CAST(s_pico + l_pico AS DOUBLE))"
                f" / (c * {mu} - lam)) AS BIGINT)"
                " ELSE 0 END"
            ).alias("wq_ms"),
        )
        .orderBy("servers")
    )


def erlang_c_staffing_sql(mu: int = ERLANG_SERVICE_PER_HOUR) -> str:
    return f"""
    WITH tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days
        FROM events
    ),
    base AS (
        SELECT CAST(n AS DOUBLE) / (24 * days) AS lam,
               CAST(n AS DOUBLE) / (24 * days) / {mu} AS a,
               CAST(greatest(1, least(CAST(ceil(CAST(n AS DOUBLE)
                   / (24 * days) / {mu}) AS BIGINT), {ERLANG_C_CAP}))
                   AS BIGINT) AS c0
        FROM tot
    ),
    grid AS (
        SELECT lam, a, c
        FROM base CROSS JOIN UNNEST(generate_series(0, {ERLANG_GRID - 1}))
            AS gi(i)
        CROSS JOIN LATERAL (SELECT c0 + i AS c) g
    ),
    terms AS (
        SELECT lam, a, c,
               CASE WHEN a < c THEN CAST(round(1e12 * pow(a, k)
                    / factorial(CAST(k AS INT))) AS BIGINT)
                    ELSE 0 END AS t_k
        FROM grid CROSS JOIN UNNEST(generate_series(0, 50)) AS gk(k)
        WHERE k < c
    ),
    summed AS (
        SELECT lam, a, c, CAST(SUM(t_k) AS BIGINT) AS s_pico
        FROM terms GROUP BY lam, a, c
    ),
    scored AS (
        SELECT lam, a, c, s_pico,
               CASE WHEN a < c THEN CAST(round(1e12 * pow(a, c)
                    / (factorial(CAST(c AS INT)) * (1 - a / c))) AS BIGINT)
                    ELSE 0 END AS l_pico
        FROM summed
    )
    SELECT CAST(c AS BIGINT) AS servers,
           CAST(round(1e6 * a / c) AS BIGINT) AS rho_micro,
           CASE WHEN a < c THEN CAST(round(1e6 * l_pico
                / CAST(s_pico + l_pico AS DOUBLE)) AS BIGINT)
                ELSE 1000000 END AS p_wait_micro,
           CASE WHEN a < c THEN CAST(round(1000 * 3600
                * (l_pico / CAST(s_pico + l_pico AS DOUBLE))
                / (c * {mu} - lam)) AS BIGINT)
                ELSE 0 END AS wq_ms
    FROM scored
    ORDER BY servers
    """


def nelson_aalen_hazard(
    events: DataFrame, max_days: int = HAZARD_MAX_DAYS
) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the discrete_hazard table with
    its Poisson-type variance: rows (day, n_at_risk, n_converted, h_micro,
    var_pico) ordered by day.

    kaplan_meier multiplies survival; Nelson-Aalen SUMS hazard — the
    estimator of choice when curves must be added or compared (its
    increments are the hazard itself) and the base of the Breslow
    estimator: H(t) = sum_{s<=t} d_s/n_s, var = sum d_s/n_s^2.

    Exactness: each increment d/n and variance term d/n^2 quantizes
    (micro / pico) BEFORE the cumulative integer sums over the bounded
    day grid, so the running totals are exact BIGINTs.

    Scale shape: rides discrete_hazard; adds two cumulative windows over
    the bounded grid."""
    h = discrete_hazard(events, max_days)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    terms = h.select(
        "day",
        "n_at_risk",
        "n_converted",
        F.expr(
            "CASE WHEN n_at_risk > 0 THEN CAST(round(1e6 * n_converted"
            " / CAST(n_at_risk AS DOUBLE)) AS BIGINT) ELSE 0 END"
        ).alias("dh_micro"),
        F.expr(
            "CASE WHEN n_at_risk > 0 THEN CAST(round(1e12 * n_converted"
            " / (CAST(n_at_risk AS DOUBLE) * n_at_risk)) AS BIGINT)"
            " ELSE 0 END"
        ).alias("dv_pico"),
    )
    return terms.select(
        "day",
        "n_at_risk",
        "n_converted",
        F.sum("dh_micro").over(w).cast("long").alias("h_micro"),
        F.sum("dv_pico").over(w).cast("long").alias("var_pico"),
    ).orderBy("day")


def nelson_aalen_hazard_sql(max_days: int = HAZARD_MAX_DAYS) -> str:
    return f"""
    WITH h AS ({discrete_hazard_sql(max_days)}),
    terms AS (
        SELECT day, n_at_risk, n_converted,
               CASE WHEN n_at_risk > 0 THEN CAST(round(1e6 * n_converted
                    / CAST(n_at_risk AS DOUBLE)) AS BIGINT) ELSE 0 END
                   AS dh_micro,
               CASE WHEN n_at_risk > 0 THEN CAST(round(1e12 * n_converted
                    / (CAST(n_at_risk AS DOUBLE) * n_at_risk)) AS BIGINT)
                    ELSE 0 END AS dv_pico
        FROM h
    )
    SELECT day, n_at_risk, n_converted,
           CAST(SUM(dh_micro) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS h_micro,
           CAST(SUM(dv_pico) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS var_pico
    FROM terms
    ORDER BY day
    """
