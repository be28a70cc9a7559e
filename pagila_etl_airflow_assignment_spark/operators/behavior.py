"""User-behavior mining: windowed trend ranking, session journey paths, and
inter-purchase intervals.

Composition layer over the sequence/sessionization primitives: each operator
pre-aggregates to a reduced grain (hour-type, session, purchase pairs) before
any ranking or path assembly, so windows never run over raw fact rows.

- trending_event_types: rank event types per tumbling hour. The rank window
  partitions by hour over the (hour, type) AGGREGATE (≤ hours·|types| rows).
- session_paths: gap-sessionized journeys (lag + running-sum break ids — the
  sessionize_batch formulation from streaming/aggregations.py) reduced to an
  ordered event-type path string per session, then counted. Paths are
  assembled per session via array_sort over (ts, event_id)-keyed structs —
  collect_list alone has no ordering guarantee.
- repurchase_intervals: day-gap histogram between consecutive purchases per
  user. Integer-microsecond gap math (functions.micros) — identical to the
  oracle's epoch_us, no double rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import micros

TREND_TOP_K = 3
PATH_TOP_K = 20
SESSION_GAP_S = 1800


def trending_event_types(events: DataFrame, k: int = TREND_TOP_K) -> DataFrame:
    """Top-k event types per tumbling hour with counts and rank."""
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("hour").orderBy(F.desc("n"), "event_type")
    return (
        hourly.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .orderBy("hour", "rk")
    )


def trending_event_types_sql(k: int = TREND_TOP_K) -> str:
    return f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT hour, event_type, n, rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY hour ORDER BY n DESC, event_type) AS rk
            FROM hourly
        )
        WHERE rk <= {k}
        ORDER BY hour, rk
    """


def session_paths(
    events: DataFrame, gap_s: int = SESSION_GAP_S, k: int = PATH_TOP_K
) -> DataFrame:
    """Top-k session journey paths ('click>view>purchase') by session count.

    One user_id shuffle covers the break-flag window AND the session-id
    cumulative sum; the session grouping then shuffles on (user, session) —
    session grain, already reduced. Ordering inside a path comes from
    array_sort over (ts, event_id, type) structs, not collect_list order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_breaks = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            micros("ts") - micros(F.lag("ts").over(w)) > gap_s * 1_000_000, 1
        )
        .otherwise(0)
        .alias("is_break"),
    )
    with_ids = with_breaks.withColumn(
        "session_id",
        F.sum("is_break").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        with_ids.groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("ordered")
        )
        .select(
            F.concat_ws(
                ">", F.transform("ordered", lambda s: s["event_type"])
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(k)
    )


def session_paths_sql(gap_s: int = SESSION_GAP_S, k: int = PATH_TOP_K) -> str:
    return f"""
        WITH with_breaks AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > {gap_s} * CAST(1000000 AS BIGINT)
                        THEN 1 ELSE 0 END AS is_break
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), with_ids AS (
            SELECT *, SUM(is_break) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM with_breaks
        ), paths AS (
            SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            FROM with_ids
            GROUP BY user_id, session_id
        )
        SELECT path, COUNT(*) AS n_sessions
        FROM paths
        GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT {k}
    """


def repurchase_intervals(events: DataFrame) -> DataFrame:
    """Histogram of whole-day gaps between a user's consecutive purchases.

    The purchase filter is pushed into the scan; the lag window runs over the
    filtered relation (purchase-grain, ~1/|types| of events)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    purchases = events.where(F.col("event_type") == "purchase")
    gaps = purchases.select(
        "user_id",
        (
            (micros("ts") - micros(F.lag("ts").over(w)))
            / F.lit(86_400_000_000).cast("long")
        )
        .cast("long")
        .alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("gap_days")
        .agg(F.count("*").alias("n_intervals"))
        .orderBy("gap_days")
    )


REPURCHASE_INTERVALS_SQL = """
    WITH gaps AS (
        SELECT user_id,
               CAST((epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)))
                   // CAST(86400000000 AS BIGINT) AS BIGINT) AS gap_days
        FROM events
        WHERE event_type = 'purchase'
    )
    SELECT gap_days, COUNT(*) AS n_intervals
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY gap_days
    ORDER BY gap_days
"""


# --- time-weighted average ----------------------------------------------------


def time_weighted_value(events: DataFrame) -> DataFrame:
    """Per-user time-weighted average of value: each reading holds until the
    user's next event (step interpolation), weights = holding micros. The
    user's last event has no duration and is excluded from the weighting —
    the standard left-closed TWA convention.

    One user_id shuffle: the lead() duration and the weighted aggregate share
    the (user_id | ts, event_id) sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = events.select(
        "user_id",
        "value",
        (micros(F.lead("ts").over(w)) - micros("ts")).alias("dur_us"),
    ).where(F.col("dur_us").isNotNull())
    return (
        spans.groupBy("user_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 6
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


TIME_WEIGHTED_VALUE_SQL = """
    WITH spans AS (
        SELECT user_id, value,
               epoch_us(lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id))
                   - epoch_us(ts) AS dur_us
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_spans,
           round(SUM(value * dur_us) / SUM(dur_us), 6) AS twa_value
    FROM spans
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
"""


# --- DAU/MAU stickiness -----------------------------------------------------------


def dau_mau_stickiness(events: DataFrame) -> DataFrame:
    """Per-day product stickiness: DAU / trailing-28-day MAU in milli-units.
    The canonical engagement ratio (how much of the monthly audience shows up
    on a given day); a falling curve with flat MAU is the classic
    drive-by-growth warning.

    Plan: one (day, user) distinct reduction, then DAU is a day aggregate
    and MAU a 28-day RANGE window COUNT DISTINCT — expressed as a
    day-offset-keyed semi-sum (distinct users exploded once per covered day
    would multiply the relation ×28, so instead MAU joins the distinct
    (day, user) grain against the day spine with a range condition bounded
    by 28 — the range-join bin trick on the bounded day grid). Exact
    integers end to end; ratio emitted in milli."""
    du = events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    days = dau.select("day")
    # MAU per day d: distinct users active in [d-27, d] — the (day,user) grain
    # joins the bounded day spine (|days| rows, broadcast), then one distinct
    # per (spine day, user) collapses multi-active users
    mau = (
        du.join(
            F.broadcast(days.withColumnRenamed("day", "d")),
            (F.col("day") <= F.col("d"))
            & (F.col("day") >= F.date_sub(F.col("d"), 27)),
        )
        .select("d", "user_id")
        .distinct()
        .groupBy("d")
        .agg(F.count("*").alias("mau"))
    )
    return (
        dau.join(mau, dau["day"] == mau["d"])
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.lit(1000.0) * F.col("dau") / F.col("mau"))
            .cast("long")
            .alias("stickiness_milli"),
        )
        .orderBy("day")
    )


DAU_MAU_STICKINESS_SQL = """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), dau AS (
        SELECT day, COUNT(*) AS dau FROM du GROUP BY day
    ), mau AS (
        SELECT d.day AS d, COUNT(DISTINCT u.user_id) AS mau
        FROM (SELECT day FROM dau) d
        JOIN du u
          ON u.day <= d.day AND u.day >= d.day - INTERVAL 27 DAY
        GROUP BY d.day
    )
    SELECT dau.day, dau.dau, mau.mau,
           CAST(round(1000.0 * dau.dau / mau.mau) AS BIGINT)
               AS stickiness_milli
    FROM dau JOIN mau ON dau.day = mau.d
    ORDER BY dau.day
"""


# --- churn label generation ----------------------------------------------------------

CHURN_OBS_END_DAY = 20  # observation window: days 1-20
CHURN_HOLDOUT_FROM = 21  # label window: days 21+


def churn_labels(events: DataFrame) -> DataFrame:
    """Training-label generation for churn models: users active in the
    observation window (days 1-{CHURN_OBS_END_DAY}) are labeled CHURNED
    when the label window (days {CHURN_HOLDOUT_FROM}+) shows no activity —
    plus the summary a modeler sanity-checks before training: (cohort,
    n_users, n_churned, churn_milli, avg_obs_events). Cohort is the
    user's first-activity week within the observation window.

    The point-in-time discipline matters more than the arithmetic: only
    observation-window activity defines the population AND the features
    (avg_obs_events), so the label can never leak backward. Two user-grain
    aggregates over disjoint windows, one anti-join-free membership flag
    (max over the label window), exact milli rate.

    Scale shape: user-keyed aggregates with map-side combine; the panel is
    |cohorts| rows."""
    obs = (
        events.where(F.dayofmonth("ts") <= CHURN_OBS_END_DAY)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_obs"),
            F.weekofyear(F.min("ts")).cast("long").alias("cohort"),
        )
    )
    labeled = (
        events.where(F.dayofmonth("ts") >= CHURN_HOLDOUT_FROM)
        .select("user_id")
        .distinct()
        .withColumn("active_later", F.lit(1))
    )
    per_user = obs.join(labeled, "user_id", "left").select(
        "cohort",
        "n_obs",
        F.when(F.col("active_later").isNull(), 1).otherwise(0).alias("churned"),
    )
    return (
        per_user.groupBy("cohort")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("churned").cast("long").alias("n_churned"),
            F.expr(
                "CAST(1000 * SUM(churned) DIV COUNT(*) AS BIGINT)"
            ).alias("churn_milli"),
            F.expr(
                "CAST((2 * SUM(n_obs) + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
            ).alias("avg_obs_events"),
        )
        .orderBy("cohort")
    )


CHURN_LABELS_SQL = f"""
    WITH obs AS (
        SELECT user_id, COUNT(*) AS n_obs,
               CAST(EXTRACT(week FROM MIN(ts)) AS BIGINT) AS cohort
        FROM events WHERE EXTRACT(day FROM ts) <= {CHURN_OBS_END_DAY}
        GROUP BY user_id
    ),
    labeled AS (
        SELECT DISTINCT user_id FROM events
        WHERE EXTRACT(day FROM ts) >= {CHURN_HOLDOUT_FROM}
    ),
    per_user AS (
        SELECT o.cohort, o.n_obs,
               CASE WHEN l.user_id IS NULL THEN 1 ELSE 0 END AS churned
        FROM obs o LEFT JOIN labeled l USING (user_id)
    )
    SELECT cohort,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(churned) AS BIGINT) AS n_churned,
           CAST(1000 * SUM(churned) // COUNT(*) AS BIGINT) AS churn_milli,
           CAST((2 * SUM(n_obs) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS avg_obs_events
    FROM per_user
    GROUP BY cohort
    ORDER BY cohort
"""


# --- dormancy reactivation -----------------------------------------------------------

REACTIVATION_GAP_DAYS = 10


def reactivation_rates(events: DataFrame) -> DataFrame:
    """Dormancy-and-return audit: a user REACTIVATES when consecutive
    active days sit >= {REACTIVATION_GAP_DAYS} days apart — the winback
    population retention curves blur into churn: one panel row per
    longest-gap bucket (gap_bucket, n_users, n_reactivated,
    reactivated_milli, avg_active_days).

    One lag window over each user's distinct active days finds every gap;
    the per-user rollup keeps the max gap and the reactivation flag; the
    panel buckets users by that max gap (0-2, 3-9, 10+ days). All counts
    exact; the rate and average are single half-up divisions.

    Scale shape: distinct (user, day) projection, one user-keyed lag
    window, two bounded rollups."""
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    gaps = days.select(
        "user_id",
        F.datediff(F.col("day"), F.lag("day").over(w)).alias("gap"),
    )
    per_user = gaps.groupBy("user_id").agg(
        (F.count("*")).alias("n_days"),  # rows = active days (first has NULL gap)
        F.max(F.coalesce("gap", F.lit(0))).alias("max_gap"),
    )
    bucket = (
        F.when(F.col("max_gap") >= REACTIVATION_GAP_DAYS, "10+")
        .when(F.col("max_gap") >= 3, "3-9")
        .otherwise("0-2")
    )
    return (
        per_user.groupBy(bucket.alias("gap_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(
                F.when(
                    F.col("max_gap") >= REACTIVATION_GAP_DAYS, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_reactivated"),
            F.expr(
                "CAST((2 * SUM(n_days) + COUNT(*)) DIV (2 * COUNT(*))"
                " AS BIGINT)"
            ).alias("avg_active_days"),
        )
        .withColumn(
            "reactivated_milli",
            F.expr("CAST(1000 * n_reactivated DIV n_users AS BIGINT)"),
        )
        .select(
            "gap_bucket", "n_users", "n_reactivated", "reactivated_milli",
            "avg_active_days",
        )
        .orderBy("gap_bucket")
    )


REACTIVATION_RATES_SQL = f"""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    gaps AS (
        SELECT user_id,
               date_diff('day', LAG(day) OVER (
                   PARTITION BY user_id ORDER BY day), day) AS gap
        FROM days
    ),
    per_user AS (
        SELECT user_id, COUNT(*) AS n_days,
               MAX(COALESCE(gap, 0)) AS max_gap
        FROM gaps GROUP BY user_id
    )
    SELECT CASE WHEN max_gap >= {REACTIVATION_GAP_DAYS} THEN '10+'
                WHEN max_gap >= 3 THEN '3-9' ELSE '0-2' END AS gap_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN max_gap >= {REACTIVATION_GAP_DAYS}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_reactivated,
           CAST(1000 * SUM(CASE WHEN max_gap >= {REACTIVATION_GAP_DAYS}
                    THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT)
               AS reactivated_milli,
           CAST((2 * SUM(n_days) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS avg_active_days
    FROM per_user
    GROUP BY 1
    ORDER BY 1
"""


# --- growth accounting -----------------------------------------------------------

GROWTH_EPOCH_MONDAY = "1970-01-05"  # a Monday: week indices are exact ints


def growth_accounting(events: DataFrame) -> DataFrame:
    """Weekly growth accounting — the canonical active-user decomposition
    (new + retained + resurrected this week; churned counted against the
    week they left): the panel that separates "WAU is flat" into
    acquisition masking churn vs genuine retention, which single-number
    retention curves and the reactivation audit both blur.

    Identity: wau(w) = new(w) + retained(w) + resurrected(w), and
    churned(w) = wau(w−1) − retained(w) — users active last week who
    didn't return. Weeks index as days-since-Monday-epoch DIV 7, so
    "consecutive" is exact integer arithmetic in both engines.

    Scale shape: one distinct (user, week) projection, one per-user lag
    window, one bounded week rollup joined to its own +1 shift."""
    um = events.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("week"),
    ).distinct().select(
        "user_id",
        "week",
        (F.datediff("week", F.lit(GROWTH_EPOCH_MONDAY)) / 7)
        .cast("long")
        .alias("widx"),
    )
    w = Window.partitionBy("user_id").orderBy("widx")
    classified = um.select(
        "week",
        "widx",
        F.lag("widx").over(w).alias("prev_widx"),
    ).select(
        "week",
        "widx",
        F.when(F.col("prev_widx").isNull(), "new")
        .when(F.col("prev_widx") == F.col("widx") - 1, "retained")
        .otherwise("resurrected")
        .alias("cls"),
    )
    weekly = classified.groupBy("week", "widx").agg(
        F.count("*").cast("long").alias("wau"),
        F.sum(F.when(F.col("cls") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("cls") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("cls") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
    )
    prev = weekly.select(
        (F.col("widx") + 1).alias("widx"), F.col("wau").alias("prev_wau")
    )
    return (
        weekly.join(prev, "widx", "left")
        .select(
            "week",
            "wau",
            "n_new",
            "n_retained",
            "n_resurrected",
            (F.coalesce("prev_wau", F.lit(0)) - F.col("n_retained"))
            .cast("long")
            .alias("n_churned"),
        )
        .orderBy("week")
    )


GROWTH_ACCOUNTING_SQL = f"""
    WITH um AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ),
    indexed AS (
        SELECT user_id, week,
               date_diff('day', DATE '{GROWTH_EPOCH_MONDAY}', week) // 7
                   AS widx
        FROM um
    ),
    classified AS (
        SELECT week, widx,
               CASE WHEN LAG(widx) OVER (
                        PARTITION BY user_id ORDER BY widx) IS NULL THEN 'new'
                    WHEN LAG(widx) OVER (
                        PARTITION BY user_id ORDER BY widx) = widx - 1
                        THEN 'retained'
                    ELSE 'resurrected' END AS cls
        FROM indexed
    ),
    weekly AS (
        SELECT week, widx,
               CAST(COUNT(*) AS BIGINT) AS wau,
               CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new,
               CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_resurrected
        FROM classified GROUP BY week, widx
    )
    SELECT m.week, m.wau, m.n_new, m.n_retained, m.n_resurrected,
           CAST(COALESCE(p.wau, 0) - m.n_retained AS BIGINT) AS n_churned
    FROM weekly m
    LEFT JOIN weekly p ON p.widx = m.widx - 1
    ORDER BY m.week
"""


# --- event-type affinity -----------------------------------------------------------


def type_affinity(events: DataFrame) -> DataFrame:
    """Within-day event-type affinity (lift) matrix: for each type pair,
    how much more often they co-occur in the same user-day than
    independence predicts — the behavioral basket analysis
    (association_rules mines PART baskets; this mines the activity mix,
    the input for "users who view also buy?" product questions).

    Baskets are distinct (user, day); lift in exact milli =
    1000·n_ab·N / (n_a·n_b) with N the basket count. The type domain is
    bounded, so the pair relation is a per-basket self-join over ≤|types|
    rows per basket. Output (type_a, type_b, n_ab, lift_milli).

    Scale shape: one distinct (user, day, type) projection; the basket
    self-join fans out ≤ C(|types|, 2) per basket; margins come from
    one bounded rollup joined twice broadcast; the basket total is a
    1-row broadcast scalar."""
    b = events.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    total = (
        b.select("user_id", "day")
        .distinct()
        .agg(F.count("*").cast("long").alias("n_baskets"))
    )
    margins = b.groupBy("event_type").agg(F.count("*").alias("n"))
    pairs = (
        b.alias("x")
        .join(b.alias("y"), ["user_id", "day"])
        .where(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    ma = margins.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    mb = margins.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.expr(
                "CAST(1000 * n_ab * n_baskets DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_milli"),
        )
        .orderBy("type_a", "type_b")
    )


TYPE_AFFINITY_SQL = """
    WITH b AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    ),
    total AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT DISTINCT user_id, day FROM b
        )
    ),
    margins AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM b GROUP BY event_type
    ),
    pairs AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM b x JOIN b y
          ON x.user_id = y.user_id AND x.day = y.day
         AND x.event_type < y.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           CAST(1000 * p.n_ab * (SELECT n FROM total)
                // (ma.n * mb.n) AS BIGINT) AS lift_milli
    FROM pairs p
    JOIN margins ma ON ma.event_type = p.type_a
    JOIN margins mb ON mb.event_type = p.type_b
    ORDER BY p.type_a, p.type_b
"""


# --- value-by-tenure curve ----------------------------------------------------------


def tenure_value_curve(events: DataFrame) -> DataFrame:
    """Monetization-maturity curve: average purchase value as a
    function of user TENURE (days since the user's first event) — do
    users spend more as they mature, independent of calendar time? The
    cohort-LTV readout re-based onto the tenure axis every lifecycle
    model consumes.

    One per-user min-ts window sets tenure; purchases bucket by tenure
    week. Output per bucket: (tenure_week, n_purchases, n_users,
    avg_value_cents) — half-up exact cents.

    Scale shape: one user-keyed window over the event scan, bounded
    tenure rollup."""
    w = Window.partitionBy("user_id")
    graded = (
        events.withColumn("first_ts", F.min("ts").over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            (F.datediff(F.to_date("ts"), F.to_date("first_ts")) / 7)
            .cast("long")
            .alias("tenure_week"),
            "user_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    return (
        graded.groupBy("tenure_week")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.expr(
                "CAST((2 * SUM(cents) + COUNT(*)) DIV (2 * COUNT(*))"
                " AS BIGINT)"
            ).alias("avg_value_cents"),
        )
        .orderBy("tenure_week")
    )


TENURE_VALUE_CURVE_SQL = """
    WITH graded AS (
        SELECT date_diff('day',
                   CAST(MIN(ts) OVER (PARTITION BY user_id) AS DATE),
                   CAST(ts AS DATE)) // 7 AS tenure_week,
               user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               event_type
        FROM events
    )
    SELECT CAST(tenure_week AS BIGINT) AS tenure_week,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST((2 * SUM(cents) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS avg_value_cents
    FROM graded
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY 1
"""


# --- engagement fatigue curve ----------------------------------------------------------

FATIGUE_MAX_POS = 10


def fatigue_curve(events: DataFrame) -> DataFrame:
    """Engagement-fatigue curve: the average gap to the NEXT event as a
    function of the event's position within the user's day — rising
    gaps at higher positions mean sessions decay (fatigue); flat gaps
    mean depth is free and pagination/feed length isn't the binding
    constraint.

    One per-(user, day) window orders events and takes lead(ts);
    positions cap at {FATIGUE_MAX_POS}. Output per position:
    (position, n_gaps, avg_gap_ms) — half-up exact milliseconds.

    Scale shape: one user-day-keyed window over the event scan,
    bounded position rollup."""
    from ..functions import micros

    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    graded = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.least(
                F.row_number().over(w), F.lit(FATIGUE_MAX_POS)
            ).alias("position"),
            (F.lead(micros(F.col("ts"))).over(w) - micros(F.col("ts"))).alias(
                "gap_us"
            ),
        )
        .where(F.col("gap_us").isNotNull())
    )
    return (
        graded.groupBy(F.col("position").cast("long").alias("position"))
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.expr(
                "CAST((SUM(gap_us) DIV 500 + COUNT(*))"
                " DIV (2 * COUNT(*)) AS BIGINT)"
            ).alias("avg_gap_ms"),
        )
        .orderBy("position")
    )


FATIGUE_CURVE_SQL = f"""
    WITH graded AS (
        SELECT LEAST(row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id), {FATIGUE_MAX_POS}) AS position,
               LEAD(epoch_us(ts)) OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id) - epoch_us(ts) AS gap_us
        FROM events
    )
    SELECT CAST(position AS BIGINT) AS position,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST((SUM(gap_us) // 500 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS avg_gap_ms
    FROM graded
    WHERE gap_us IS NOT NULL
    GROUP BY position
    ORDER BY position
"""


# --- activation latency -------------------------------------------------------------


def activation_latency(events: DataFrame) -> DataFrame:
    """Activation-latency panel: time from each user's SIGNUP to their
    FIRST PURCHASE, bucketed in days — the onboarding-funnel number
    ("half of converters buy within N days") that decides trial length
    and nudge timing. Users who signed up but never purchased report in
    the 'never' bucket, so the panel is a complete partition of the
    signup cohort.

    One user-grain aggregate takes min(signup ts) and min(purchase ts);
    the gap buckets as 0 / 1-3 / 4-7 / 8+ days / never. Output per
    bucket: (latency_bucket, n_users, share_milli).

    Scale shape: one conditional user-keyed aggregate, bounded bucket
    rollup; shares via a window over the ≤5-row panel."""
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("signup_ts"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("first_buy_ts"),
        )
        .where(F.col("signup_ts").isNotNull())
    )
    gap_days = F.datediff(
        F.to_date("first_buy_ts"), F.to_date("signup_ts")
    )
    bucket = (
        F.when(
            F.col("first_buy_ts").isNull()
            | (F.col("first_buy_ts") < F.col("signup_ts")),
            "never",
        )
        .when(gap_days <= 0, "0d")
        .when(gap_days <= 3, "1-3d")
        .when(gap_days <= 7, "4-7d")
        .otherwise("8d+")
    )
    return (
        per_user.groupBy(bucket.alias("latency_bucket"))
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(
            "latency_bucket",
            "n_users",
            F.expr(
                "CAST(1000 * n_users DIV (SUM(n_users) OVER ()) AS BIGINT)"
            ).alias("share_milli"),
        )
        .orderBy("latency_bucket")
    )


ACTIVATION_LATENCY_SQL = """
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS first_buy_ts
        FROM events GROUP BY user_id
        HAVING MIN(CASE WHEN event_type = 'signup' THEN ts END) IS NOT NULL
    ),
    graded AS (
        SELECT CASE
                 WHEN first_buy_ts IS NULL OR first_buy_ts < signup_ts
                     THEN 'never'
                 WHEN date_diff('day', CAST(signup_ts AS DATE),
                                CAST(first_buy_ts AS DATE)) <= 0 THEN '0d'
                 WHEN date_diff('day', CAST(signup_ts AS DATE),
                                CAST(first_buy_ts AS DATE)) <= 3 THEN '1-3d'
                 WHEN date_diff('day', CAST(signup_ts AS DATE),
                                CAST(first_buy_ts AS DATE)) <= 7 THEN '4-7d'
                 ELSE '8d+' END AS latency_bucket
        FROM per_user
    ),
    panel AS (
        SELECT latency_bucket, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM graded GROUP BY latency_bucket
    )
    SELECT latency_bucket, n_users,
           CAST(1000 * n_users // (SUM(n_users) OVER ()) AS BIGINT)
               AS share_milli
    FROM panel
    ORDER BY latency_bucket
"""


# --- cohort half-life ---------------------------------------------------------------


def cohort_half_life(events: DataFrame) -> DataFrame:
    """Activity half-life per weekly signup cohort: the first week
    offset at which the cohort's active users fall below HALF of its
    week-0 actives — the single decay number retention matrices bury,
    and the honest comparison axis across cohorts of different sizes.

    Cohort = the user's first-event week; actives per (cohort, offset)
    from the distinct user-week projection; the half-life is the MIN
    offset with actives·2 < cohort_size (NULL-free: cohorts that never
    halve inside the observed window report -1). Output per cohort:
    (cohort_week, cohort_size, half_life_weeks).

    Scale shape: one per-user min window, one (cohort, offset)
    aggregate, bounded cohort rollup."""
    uw = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    w = Window.partitionBy("user_id")
    graded = uw.withColumn("cohort_week", F.min("week").over(w)).select(
        "user_id",
        "cohort_week",
        (F.datediff("week", "cohort_week") / 7).cast("long").alias("offset"),
    )
    panel = graded.groupBy("cohort_week", "offset").agg(
        F.count("*").alias("actives")
    )
    size = panel.where(F.col("offset") == 0).select(
        "cohort_week", F.col("actives").alias("cohort_size")
    )
    halved = (
        panel.join(size, "cohort_week")
        .where((F.col("offset") > 0) & (F.col("actives") * 2 < F.col("cohort_size")))
        .groupBy("cohort_week")
        .agg(F.min("offset").alias("half_life_weeks"))
    )
    return (
        size.join(halved, "cohort_week", "left")
        .select(
            "cohort_week",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.coalesce("half_life_weeks", F.lit(-1))
            .cast("long")
            .alias("half_life_weeks"),
        )
        .orderBy("cohort_week")
    )


COHORT_HALF_LIFE_SQL = """
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ),
    graded AS (
        SELECT user_id,
               MIN(week) OVER (PARTITION BY user_id) AS cohort_week,
               date_diff('day',
                   MIN(week) OVER (PARTITION BY user_id), week) // 7
                   AS woff
        FROM uw
    ),
    panel AS (
        SELECT cohort_week, woff, COUNT(*) AS actives
        FROM graded GROUP BY 1, 2
    ),
    sz AS (
        SELECT cohort_week, actives AS cohort_size
        FROM panel WHERE woff = 0
    ),
    halved AS (
        SELECT p.cohort_week, MIN(p.woff) AS half_life_weeks
        FROM panel p JOIN sz USING (cohort_week)
        WHERE p.woff > 0 AND p.actives * 2 < sz.cohort_size
        GROUP BY p.cohort_week
    )
    SELECT s.cohort_week,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(COALESCE(h.half_life_weeks, -1) AS BIGINT)
               AS half_life_weeks
    FROM sz s LEFT JOIN halved h USING (cohort_week)
    ORDER BY s.cohort_week
"""


# --- conversion by depth ------------------------------------------------------------

DEPTH_CAP = 20


def conversion_by_depth(events: DataFrame) -> DataFrame:
    """Conversion-by-depth curve: at the nth event of a user's
    lifetime, how likely is that event a purchase — the engagement-
    depth monetization curve (does conversion propensity build with
    usage, or are buyers decided early?), the event-count twin of the
    tenure (calendar) curve. Positions cap at {DEPTH_CAP}.

    One per-user lifetime-order window; bounded position rollup.
    Output per position: (position, n_events, n_purchases,
    conversion_milli)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    graded = events.select(
        F.least(F.row_number().over(w), F.lit(DEPTH_CAP)).alias("position"),
        (F.col("event_type") == "purchase").cast("long").alias("is_buy"),
    )
    return (
        graded.groupBy(F.col("position").cast("long").alias("position"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("is_buy").cast("long").alias("n_purchases"),
        )
        .withColumn(
            "conversion_milli",
            F.expr("CAST(1000 * n_purchases DIV n_events AS BIGINT)"),
        )
        .orderBy("position")
    )


CONVERSION_BY_DEPTH_SQL = f"""
    WITH graded AS (
        SELECT LEAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id),
                   {DEPTH_CAP}) AS position,
               CAST(event_type = 'purchase' AS BIGINT) AS is_buy
        FROM events
    )
    SELECT CAST(position AS BIGINT) AS position,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(is_buy) AS BIGINT) AS n_purchases,
           CAST(1000 * SUM(is_buy) // COUNT(*) AS BIGINT)
               AS conversion_milli
    FROM graded
    GROUP BY position
    ORDER BY position
"""


# --- velocity (burst-rate) flags ------------------------------------------------------

VELOCITY_WINDOW_S = 3600
VELOCITY_THRESHOLD = 3


def velocity_flags(
    events: DataFrame,
    window_s: int = VELOCITY_WINDOW_S,
    threshold: int = VELOCITY_THRESHOLD,
) -> DataFrame:
    """Rule-based velocity screen (the first-line fraud/abuse/bot control):
    an event trips the rule when its user produced >= threshold events
    within the trailing window_s seconds (inclusive of itself). Output per
    offending user: (user_id, flagged_events, max_in_window, first_flag_ts)
    — the review queue, not the raw stream.

    Exact by construction: the trailing count is a RANGE frame over integer
    epoch seconds partitioned by user — identical semantics in both engines,
    no session/gap heuristics.

    Scale shape: ONE user-partitioned range window (the per-user rolling
    pattern of events_user_rolling_stats) + a user-grain rollup of the
    flagged subset; no self-join, no event x event fan-out."""
    sec = (micros("ts") / F.lit(1_000_000)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-(window_s - 1), 0)
    )
    counted = events.select("user_id", "ts", sec.alias("sec")).withColumn(
        "in_window", F.count("*").over(w)
    )
    flagged = counted.where(F.col("in_window") >= threshold)
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("flagged_events"),
            F.max("in_window").cast("long").alias("max_in_window"),
            F.min("ts").alias("first_flag_ts"),
        )
        .orderBy("user_id")
    )


def velocity_flags_sql(
    window_s: int = VELOCITY_WINDOW_S, threshold: int = VELOCITY_THRESHOLD
) -> str:
    return f"""
        WITH counted AS (
            SELECT user_id, ts,
                   COUNT(*) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                       RANGE BETWEEN {window_s - 1} PRECEDING AND CURRENT ROW
                   ) AS in_window
            FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS flagged_events,
               CAST(MAX(in_window) AS BIGINT) AS max_in_window,
               MIN(ts) AS first_flag_ts
        FROM counted
        WHERE in_window >= {threshold}
        GROUP BY user_id
        ORDER BY user_id
    """
