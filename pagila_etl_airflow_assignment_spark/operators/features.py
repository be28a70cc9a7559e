"""Point-in-time-correct feature operators — the ML feature-store surface.

Training-data correctness hinges on never letting a feature peek at or past
its label event (leakage). Both operators here make that guarantee by
construction:

- `pit_state_lookup`: for each label event, the dimension state that was
  valid AT that event's time — an as-of join against SCD2 validity
  intervals (the "point-in-time join" every feature store ships). Reuses
  the engine's union/last-value as-of join: single shuffle on the entity
  key, no interval fan-out.
- `leakage_free_click_features`: per label event, aggregates of the user's
  prior activity STRICTLY EARLIER in stream order — one cumulative window
  with an explicit `rows between unbounded preceding and 1 preceding`
  frame. The frame is the leakage proof: the current (label) row and
  everything after it are structurally outside the aggregation.

Scale: both are single-shuffle user_id-keyed plans; the SCD2 build feeding
the lookup shares the same key. Nothing joins event-to-event (no interval
explosion) and no feature is computed twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import temporal
from .analytics import scd2_user_state


def pit_state_lookup(events: DataFrame, label_type: str = "purchase") -> DataFrame:
    """Each `label_type` event joined to the user's SCD2 state valid at its
    timestamp. The state stream excludes label events (a label's own arrival
    is not a feature). Boundary: an event exactly at `valid_from` sees the
    NEW state (as-of inclusive bound == interval half-open [from, to))."""
    states = scd2_user_state(events.where(F.col("event_type") != label_type))
    labels = events.where(F.col("event_type") == label_type).select(
        F.col("event_id").alias("label_id"), "user_id", "ts"
    )
    joined = temporal.asof_join(
        labels,
        states.select("user_id", "valid_from", "state"),
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_cols=("state",),
    )
    return joined.select(
        "label_id",
        "user_id",
        "ts",
        F.col("state").alias("state_at_label"),
    ).orderBy("label_id")


def pit_state_lookup_sql(label_type: str = "purchase") -> str:
    return f"""
        WITH marked AS (
            SELECT user_id, event_id, ts, event_type AS state,
                   lag(event_type) OVER w AS prev_state
            FROM events
            WHERE event_type <> '{label_type}'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, ts AS valid_from, state
            FROM marked
            WHERE prev_state IS NULL OR prev_state <> state
        ),
        labels AS (
            SELECT event_id AS label_id, user_id, ts
            FROM events WHERE event_type = '{label_type}'
        )
        SELECT label_id, l.user_id, l.ts, s.state AS state_at_label
        FROM labels l
        ASOF LEFT JOIN changes s
          ON l.user_id = s.user_id AND l.ts >= s.valid_from
        ORDER BY label_id
    """


def leakage_free_click_features(
    events: DataFrame, label_type: str = "purchase", feature_type: str = "click"
) -> DataFrame:
    """Per label event: count and value-sum of the user's `feature_type`
    events strictly earlier in (ts, event_id) stream order. The
    1-PRECEDING frame bound is the no-leakage guarantee."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_feat = F.col("event_type") == feature_type
    with_cum = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.coalesce(
            F.count(F.when(is_feat, 1)).over(w), F.lit(0)
        ).cast("long").alias("prior_clicks"),
        F.round(
            F.coalesce(F.sum(F.when(is_feat, F.col("value"))).over(w), F.lit(0.0)),
            6,
        ).alias("prior_click_value"),
    )
    return (
        with_cum.where(F.col("event_type") == label_type)
        .select(
            F.col("event_id").alias("label_id"),
            "user_id",
            "ts",
            "prior_clicks",
            "prior_click_value",
        )
        .orderBy("label_id")
    )


def leakage_free_click_features_sql(
    label_type: str = "purchase", feature_type: str = "click"
) -> str:
    return f"""
        WITH cum AS (
            SELECT event_id, user_id, ts, event_type,
                   COALESCE(COUNT(CASE WHEN event_type = '{feature_type}'
                                       THEN 1 END) OVER w, 0) AS prior_clicks,
                   round(COALESCE(SUM(CASE WHEN event_type = '{feature_type}'
                                           THEN value END) OVER w, 0.0), 6)
                     AS prior_click_value
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            )
        )
        SELECT event_id AS label_id, user_id, ts, prior_clicks, prior_click_value
        FROM cum
        WHERE event_type = '{label_type}'
        ORDER BY label_id
    """


# --- gap fill / forward fill --------------------------------------------------

GRID_STEP_SECONDS = 3600


def gap_fill_ffill(
    events: DataFrame, step_seconds: int = GRID_STEP_SECONDS
) -> DataFrame:
    """Resample each user's irregular event stream onto a regular time grid
    with forward-fill — the time-series regularization step before any
    fixed-step model. Grid points span the USER's own [min, max] activity
    (hour-aligned); each point carries the user's most recent value at or
    before it (as-of backward semantics; ties at an exact event time take the
    event).

    Scale: the grid is generated per user by `sequence` (no cross join with a
    global calendar), sized by activity span / step — output is bounded and
    predictable; the fill itself is the engine's union/last-value as-of join
    (single user_id shuffle, no interval fan-out)."""
    from ..functions import micros
    from . import temporal

    spans = events.groupBy("user_id").agg(
        F.min("ts").alias("t_min"), F.max("ts").alias("t_max")
    )
    step = step_seconds * 1_000_000
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence(
                (F.ceil(micros("t_min") / step) * step).cast("long"),
                (F.floor(micros("t_max") / step) * step).cast("long"),
                F.lit(step),
            )
        ).alias("grid_us"),
    ).select("user_id", F.timestamp_micros("grid_us").alias("grid_ts"))
    filled = temporal.asof_join(
        grid,
        events.select("user_id", "ts", "value"),
        on="user_id",
        left_ts="grid_ts",
        right_ts="ts",
        right_cols=("value",),
    )
    return filled.select(
        "user_id",
        "grid_ts",
        F.col("matched_ts").alias("last_event_ts"),
        F.round("value", 6).alias("last_value"),
    ).orderBy("user_id", "grid_ts")


def gap_fill_ffill_sql(step_seconds: int = GRID_STEP_SECONDS) -> str:
    step = step_seconds * 1_000_000
    return f"""
        WITH spans AS (
            SELECT user_id, MIN(ts) AS t_min, MAX(ts) AS t_max
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT user_id,
                   make_timestamp(unnest(generate_series(
                       CAST(ceil(epoch_us(t_min) / {step}) AS BIGINT) * {step},
                       CAST(floor(epoch_us(t_max) / {step}) AS BIGINT) * {step},
                       {step}
                   ))) AS grid_ts
            FROM spans
        )
        SELECT g.user_id, g.grid_ts,
               e.ts AS last_event_ts,
               round(e.value, 6) AS last_value
        FROM grid g
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events) e
          ON g.user_id = e.user_id AND g.grid_ts >= e.ts
        ORDER BY g.user_id, g.grid_ts
    """


# --- EWMA (truncated, exact-arithmetic) --------------------------------------

EWMA_K = 16  # window length; alpha = 0.5 so weights are exact powers of two


def ewma_user_value(events: DataFrame, k: int = EWMA_K) -> DataFrame:
    """Per-event EWMA of the user's last ``k`` values (α = 0.5, normalized —
    pandas ``ewm(alpha=.5).mean()`` truncated to a bounded frame).

    The recursive definition is rewritten as one bounded ROWS frame: the
    frame's values fold JVM-side (collect_list → zip_with weights →
    aggregate), so cost is O(k) per row with a single user_id shuffle and
    no Python. EXACTNESS: values quantize to integer cents (floor — both
    engines agree), α = 1/2 makes every weight 2^(k-1-j) an exact integer
    (newest = 2^15 … oldest = 2^0 in the full frame), so numerator and
    denominator are exact int64 sums and the final result is one IEEE
    division of exactly-agreed operands — no rounding epsilon anywhere.
    At scale this is the feature-store "decayed activity" column: one
    window pass, frame bounded, density-independent state."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(k - 1), 0)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    vals = F.collect_list(cents).over(w)  # frame order = window order (oldest first)
    # Horner folds: newest-first acc·2 + v gives Σ v_j·2^j (j = age from the
    # oldest end, newest carries 2^(n-1)); the same fold with v = 1 gives the
    # matching denominator Σ 2^j = 2^n − 1. All int64, no shiftleft-by-column.
    zero = F.lit(0).cast("long")
    num = F.aggregate(F.reverse(vals), zero, lambda acc, x: acc * 2 + x)
    den = F.aggregate(vals, zero, lambda acc, x: acc * 2 + 1)
    base = events.where(F.col("value").isNotNull())
    return base.select(
        "event_id",
        "user_id",
        "ts",
        (num.cast("double") / den.cast("double") / F.lit(100.0)).alias("ewma_value"),
    ).orderBy("event_id")


def ewma_user_value_sql(k: int = EWMA_K) -> str:
    return f"""
        WITH seq AS (
            SELECT event_id, user_id, ts,
                   CAST(FLOOR(value * 100) AS BIGINT) AS cents,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events WHERE value IS NOT NULL
        )
        -- weights 2^(k-1-age) are the Spark fold's 2^(n-1-age) scaled by the
        -- constant 2^(k-n); numerator and denominator scale together, so the
        -- IEEE quotient is bit-identical to the engine's
        SELECT a.event_id, a.user_id, a.ts,
               CAST(SUM(b.cents * (CAST(1 AS BIGINT) << CAST(({k} - 1) - (a.rn - b.rn) AS INTEGER))) AS DOUBLE)
               / CAST(SUM(CAST(1 AS BIGINT) << CAST(({k} - 1) - (a.rn - b.rn) AS INTEGER)) AS DOUBLE)
               / 100.0 AS ewma_value
        FROM seq a JOIN seq b
          ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - {k} + 1 AND a.rn
        GROUP BY a.event_id, a.user_id, a.ts, a.rn
        ORDER BY a.event_id
    """


# --- leave-one-out target encoding -------------------------------------------


def target_encode_loo(events: DataFrame) -> DataFrame:
    """Leakage-free categorical target encoding: each event's ``event_type``
    encoded as the mean value of OTHER events of that type (leave-one-out —
    the row's own target never leaks into its feature; singleton categories
    encode NULL).

    One tiny |types|-keyed aggregate broadcast back over the fact — no
    window over the raw events, no per-category shuffle of the fact. Exact:
    sums run on integer cents, the LOO mean (sum − own) / (n − 1) is integer
    subtraction then one IEEE division — engine-identical."""
    cents = F.floor(F.col("value") * 100).cast("long")
    base = events.where(F.col("value").isNotNull()).select(
        "event_id", "event_type", cents.alias("cents")
    )
    per_type = base.groupBy("event_type").agg(
        F.sum("cents").alias("type_sum"), F.count("*").alias("type_n")
    )
    loo = F.when(
        F.col("type_n") > 1,
        (F.col("type_sum") - F.col("cents")).cast("double")
        / (F.col("type_n") - 1).cast("double")
        / F.lit(100.0),
    )
    return (
        base.join(F.broadcast(per_type), "event_type")
        .select("event_id", "event_type", loo.alias("loo_mean_value"))
        .orderBy("event_id")
    )


TARGET_ENCODE_LOO_SQL = """
    WITH base AS (
        SELECT event_id, event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ), per_type AS (
        SELECT event_type, SUM(cents) AS type_sum, COUNT(*) AS type_n
        FROM base GROUP BY event_type
    )
    SELECT event_id, base.event_type,
           CASE WHEN type_n > 1
                THEN CAST(type_sum - cents AS DOUBLE) / CAST(type_n - 1 AS DOUBLE) / 100.0
           END AS loo_mean_value
    FROM base JOIN per_type ON base.event_type = per_type.event_type
    ORDER BY event_id
"""

# --- linear-interpolation gap fill ------------------------------------------------


def linear_interp_fill(events: DataFrame) -> DataFrame:
    """Fill missing days of each event type's daily value series by LINEAR
    interpolation between the nearest present neighbors:
    (event_type, day, filled_cents, is_interpolated).

    The interpolation upgrade of ``gap_fill_ffill``: forward-fill carries a
    stale plateau through a gap, linear fill reconstructs the trend — the
    choice every feature-store backfill makes per column. The grid spans
    each type's own [min, max] day, so both neighbors always exist and no
    extrapolation rule is needed. Interpolated values are exact half-up
    integer cents via cross-multiplication — no float ratio.

    Scale shape: per-type day grid by `sequence` (no global calendar cross
    join); neighbor lookup is two IGNORE NULLS window passes over the
    bounded grid; everything keyed by event_type."""
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"))
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d_min"), F.max("day").alias("d_max")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("d_min", "d_max")).alias("day"),
    )
    g = grid.join(daily, ["event_type", "day"], "left")
    w = Window.partitionBy("event_type").orderBy("day")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    wf = w.rowsBetween(0, Window.unboundedFollowing)
    marked = g.select(
        "event_type",
        "day",
        "cents",
        F.last("cents", ignorenulls=True).over(wb).alias("v_prev"),
        F.last(F.when(F.col("cents").isNotNull(), F.col("day")), ignorenulls=True)
        .over(wb)
        .alias("d_prev"),
        F.first("cents", ignorenulls=True).over(wf).alias("v_next"),
        F.first(F.when(F.col("cents").isNotNull(), F.col("day")), ignorenulls=True)
        .over(wf)
        .alias("d_next"),
    )
    span = F.datediff("d_next", "d_prev")
    num = F.col("v_prev") * F.datediff("d_next", "day") + F.col(
        "v_next"
    ) * F.datediff("day", "d_prev")
    interp = ((2 * num + span) / (2 * span)).cast("long")  # half-up, num >= 0
    return marked.select(
        "event_type",
        "day",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .otherwise(F.expr("CAST((2 * (v_prev * datediff(d_next, day)"
                          " + v_next * datediff(day, d_prev))"
                          " + datediff(d_next, d_prev))"
                          " DIV (2 * datediff(d_next, d_prev)) AS BIGINT)"))
        .alias("filled_cents"),
        F.col("cents").isNull().alias("is_interpolated"),
    ).orderBy("event_type", "day")


def linear_interp_fill_sql() -> str:
    return """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        spans AS (
            SELECT event_type, MIN(day) AS d_min, MAX(day) AS d_max
            FROM daily GROUP BY event_type
        ),
        grid AS (
            SELECT event_type,
                   CAST(unnest(generate_series(d_min, d_max, INTERVAL 1 DAY))
                        AS DATE) AS day
            FROM spans
        ),
        marked AS (
            SELECT g.event_type, g.day, d.cents,
                   last_value(d.cents IGNORE NULLS) OVER (
                       PARTITION BY g.event_type ORDER BY g.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS v_prev,
                   last_value(CASE WHEN d.cents IS NOT NULL THEN g.day END
                              IGNORE NULLS) OVER (
                       PARTITION BY g.event_type ORDER BY g.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS d_prev,
                   first_value(d.cents IGNORE NULLS) OVER (
                       PARTITION BY g.event_type ORDER BY g.day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS v_next,
                   first_value(CASE WHEN d.cents IS NOT NULL THEN g.day END
                               IGNORE NULLS) OVER (
                       PARTITION BY g.event_type ORDER BY g.day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS d_next
            FROM grid g LEFT JOIN daily d USING (event_type, day)
        )
        SELECT event_type, day,
               CASE WHEN cents IS NOT NULL THEN cents
                    ELSE CAST((2 * (v_prev * datediff('day', day, d_next)
                                    + v_next * datediff('day', d_prev, day))
                               + datediff('day', d_prev, d_next))
                              // (2 * datediff('day', d_prev, d_next))
                              AS BIGINT)
               END AS filled_cents,
               cents IS NULL AS is_interpolated
        FROM marked
        ORDER BY event_type, day
    """


# --- hashed feature crossing ---------------------------------------------------------

CROSS_DIMS = (1024, 16384)


def hashed_cross_features(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Feature-crossing collision diagnostics: the (customer-segment x
    order-priority) cross hashed into candidate embedding-table sizes D ∈
    {CROSS_DIMS} — the sizing study every CTR-style pipeline runs before
    committing a hash dimension: (dim, n_distinct_crosses, n_buckets_used,
    n_colliding_buckets, collision_milli, max_bucket_crosses).

    Collisions are measured on DISTINCT crosses (weighting by row count
    would conflate popularity with hash quality); the hash is the repo's
    md5 convention so both engines bucket identically.

    Scale shape: one cross-grain distinct aggregate (bounded by the
    attribute-domain product), then per-D bucket rollups on that bounded
    relation — the fact table is touched once."""
    crosses = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == customer.c_custkey,
        )
        .select(
            F.concat_ws(
                "|",
                F.col("c_mktsegment"),
                F.col("o_orderpriority"),
                F.date_format("o_orderdate", "yyyy-MM"),
            ).alias("cross_key")
        )
        .distinct()
    )
    sweeps = []
    for d in CROSS_DIMS:
        bucketed = crosses.select(
            F.expr(
                f"CAST(conv(substring(md5(cross_key), 1, 15), 16, 10)"
                f" AS BIGINT) % {d}"
            ).alias("bucket")
        ).groupBy("bucket").agg(F.count("*").alias("k"))
        sweeps.append(
            bucketed.agg(
                F.lit(d).cast("long").alias("dim"),
                F.sum("k").cast("long").alias("n_distinct_crosses"),
                F.count("*").cast("long").alias("n_buckets_used"),
                F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_colliding_buckets"),
                F.sum(F.when(F.col("k") > 1, F.col("k")).otherwise(0)).alias(
                    "_in_collisions"
                ),
                F.max("k").cast("long").alias("max_bucket_crosses"),
            )
        )
    out = sweeps[0]
    for sdf in sweeps[1:]:
        out = out.unionByName(sdf)
    return out.select(
        "dim",
        "n_distinct_crosses",
        "n_buckets_used",
        "n_colliding_buckets",
        F.expr(
            "CAST(1000 * _in_collisions DIV n_distinct_crosses AS BIGINT)"
        ).alias("collision_milli"),
        "max_bucket_crosses",
    ).orderBy("dim")


def hashed_cross_features_sql() -> str:
    parts = []
    for d in CROSS_DIMS:
        parts.append(
            f"""
            SELECT CAST({d} AS BIGINT) AS dim,
                   CAST(SUM(k) AS BIGINT) AS n_distinct_crosses,
                   CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
                   CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_colliding_buckets,
                   CAST(1000 * SUM(CASE WHEN k > 1 THEN k ELSE 0 END)
                        // SUM(k) AS BIGINT) AS collision_milli,
                   CAST(MAX(k) AS BIGINT) AS max_bucket_crosses
            FROM (
                SELECT CAST(('0x' || substr(md5(cross_key), 1, 15))
                            AS UBIGINT)::BIGINT % {d} AS bucket,
                       COUNT(*) AS k
                FROM crosses GROUP BY 1
            )"""
        )
    union = " UNION ALL ".join(parts)
    return f"""
        WITH crosses AS (
            SELECT DISTINCT c.c_mktsegment || '|' || o.o_orderpriority
                   || '|' || strftime(o.o_orderdate, '%Y-%m') AS cross_key
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        sweeps AS ({union})
        SELECT * FROM sweeps ORDER BY dim
    """
