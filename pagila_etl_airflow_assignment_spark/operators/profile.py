"""One-pass table profiling: per-column null/distinct/min/max statistics.

The data-quality surface every warehouse ships (DESCRIBE ... STATISTICS,
dbt-style column profiles): long-format per-column stats computed in a
SINGLE aggregation over the table, not one job per column.

Scale notes: all per-column aggregates ride one scan. The exact
COUNT(DISTINCT) set makes Spark plan an Expand (one input row per distinct
aggregate) before the partial aggregation — a deliberate cost multiplier of
x|columns| on the map side that buys exactness; at 100 TB swap
``approx_count_distinct`` into the same shape for a sketch-sized shuffle
(engine-specific HLL, so the exact form is what the DuckDB oracle checks —
same split as events_approx_sketches). Min/max/null-counts are plain
map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(col_name, n_nulls, n_distinct, min_value, max_value) per column,
    min/max serialized to strings so heterogeneous columns share a schema."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return (
        df.agg(*aggs)
        .select(
            F.expr(
                f"stack({len(cols)}, {stacked}) AS "
                "(col_name, n_nulls, n_distinct, min_value, max_value)"
            )
        )
        .orderBy("col_name")
    )


def profile_table_sql(columns: list[str], rel: str) -> str:
    parts = [
        f"""SELECT '{c}' AS col_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM {rel}"""
        for c in columns
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


# --- declarative data-quality constraint checks -------------------------------


def constraint_checks(
    orders: DataFrame, customer: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Deequ/dbt-style constraint suite over the warehouse tables, one row per
    constraint: (constraint, n_checked, n_violations, passed). The standard
    gate a pipeline runs before publishing a snapshot.

    Shapes (each the minimal plan for its class — all map-side-combinable):
    - uniqueness      -> one hash agg on the key, violations = rows in groups
                         of >1 (NOT distinct-count arithmetic, so the number
                         is actionable: how many rows to quarantine);
    - not-null / accepted-range / set-membership -> conditional counts
                         sharing ONE scan per table, no shuffle beyond the
                         1-row aggregate;
    - referential     -> LEFT ANTI against the parent key (joins only keys).

    The result is a tiny union of 1-row aggregates; at 100 TB each check
    costs one pass over its table, and the per-table conditional counts
    share that pass. Composes with partition_checksums (cdc.py): checksums
    locate WHERE a snapshot changed, constraints decide whether it may ship.
    """

    def one(name: str, checked, violations):
        return (
            F.lit(name).alias("check_name"),
            checked.cast("long").alias("n_checked"),
            violations.cast("long").alias("n_violations"),
            (violations == 0).alias("passed"),
        )

    uniq = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .agg(
            *one(
                "orders.o_orderkey unique",
                F.sum("n"),
                F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)),
            )
        )
    )
    order_scan = orders.agg(
        F.struct(
            *one(
                "orders.o_custkey not null",
                F.count("*"),
                F.count(F.when(F.col("o_custkey").isNull(), 1)),
            )
        ).alias("c1"),
        F.struct(
            *one(
                "orders.o_totalprice > 0",
                F.count("*"),
                F.count(F.when(~(F.col("o_totalprice") > 0), 1)),
            )
        ).alias("c2"),
        F.struct(
            *one(
                "orders.o_orderstatus in (O,F,P)",
                F.count("*"),
                F.count(
                    F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
                ),
            )
        ).alias("c3"),
    )
    order_checks = order_scan.select(
        F.explode(F.array("c1", "c2", "c3")).alias("s")
    ).select("s.*")
    # SQL FK semantics: NULL child keys are not violations (the not-null
    # check owns those); only non-null orphans count
    fk = (
        orders.select("o_custkey")
        .where(F.col("o_custkey").isNotNull())
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(*one("orders.o_custkey references customer", F.count("*"), F.count("*")))
    )
    # n_checked for the FK row is the orphan count itself (the anti join never
    # sees satisfied rows); restate it against the full child count:
    fk = fk.crossJoin(
        F.broadcast(orders.agg(F.count("*").alias("__total")))
    ).select(
        "check_name",
        F.col("__total").alias("n_checked"),
        "n_violations",
        "passed",
    )
    li = lineitem.agg(
        F.struct(
            *one(
                "lineitem.l_quantity between 1 and 50",
                F.count("*"),
                F.count(F.when(~F.col("l_quantity").between(1, 50), 1)),
            )
        ).alias("c1"),
        F.struct(
            *one(
                "lineitem.l_discount between 0 and 1",
                F.count("*"),
                F.count(F.when(~F.col("l_discount").between(0, 1), 1)),
            )
        ).alias("c2"),
    )
    li_checks = li.select(F.explode(F.array("c1", "c2")).alias("s")).select("s.*")
    return (
        uniq.unionByName(order_checks)
        .unionByName(fk)
        .unionByName(li_checks)
        .orderBy("check_name")
    )


CONSTRAINT_CHECKS_SQL = """
    WITH uniq AS (
        SELECT 'orders.o_orderkey unique' AS check_name,
               SUM(n) AS n_checked,
               COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS n_violations
        FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1)
    ),
    ord AS (
        SELECT * FROM (
            SELECT 'orders.o_custkey not null' AS check_name,
                   COUNT(*) AS n_checked,
                   COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_violations
            FROM orders
            UNION ALL
            SELECT 'orders.o_totalprice > 0',
                   COUNT(*),
                   COUNT(CASE WHEN NOT (o_totalprice > 0) THEN 1 END)
            FROM orders
            UNION ALL
            SELECT 'orders.o_orderstatus in (O,F,P)',
                   COUNT(*),
                   COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END)
            FROM orders
        )
    ),
    fk AS (
        SELECT 'orders.o_custkey references customer' AS check_name,
               (SELECT COUNT(*) FROM orders) AS n_checked,
               COUNT(*) AS n_violations
        FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        )
    ),
    li AS (
        SELECT 'lineitem.l_quantity between 1 and 50' AS check_name,
               COUNT(*) AS n_checked,
               COUNT(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 END) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.l_discount between 0 and 1',
               COUNT(*),
               COUNT(CASE WHEN l_discount NOT BETWEEN 0 AND 1 THEN 1 END)
        FROM lineitem
    )
    SELECT check_name,
           CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM (
        SELECT * FROM uniq
        UNION ALL SELECT * FROM ord
        UNION ALL SELECT * FROM fk
        UNION ALL SELECT * FROM li
    )
    ORDER BY check_name
"""


# --- functional-dependency profiling ------------------------------------------

FD_CANDIDATES = (
    ("p_name", "p_brand"),
    ("p_name", "p_type"),
    ("p_brand", "p_type"),
    ("p_partkey", "p_name"),
)


def fd_profile(
    part: DataFrame, candidates: tuple[tuple[str, str], ...] = FD_CANDIDATES
) -> DataFrame:
    """Functional-dependency discovery report: for each candidate A → B, how
    many A-values map to more than one B (violations). FDs are what schema
    inference, normalization advice, and dedup-key mining read off a
    profile — the constraint suite's (warehouse_constraint_checks) "does the
    data obey the declared rules" complement: "what rules does the data
    actually obey".

    One (A, B) distinct + one A-grain aggregate per candidate — every
    relation is bounded by the attribute domain, and all candidates union
    into one result. At lake scale each candidate is a two-column scan
    (column pruning does the rest)."""
    reports = []
    for lhs, rhs in candidates:
        per_lhs = (
            part.select(lhs, rhs)
            .distinct()
            .groupBy(lhs)
            .agg(F.count("*").alias("n_rhs"))
        )
        reports.append(
            per_lhs.agg(
                F.lit(f"{lhs}->{rhs}").alias("fd"),
                F.count("*").alias("n_lhs_values"),
                F.sum((F.col("n_rhs") > 1).cast("int")).alias("violating_lhs"),
                (F.sum((F.col("n_rhs") > 1).cast("int")) == 0).alias("holds"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("fd")


def fd_profile_sql(
    candidates: tuple[tuple[str, str], ...] = FD_CANDIDATES
) -> str:
    arms = " UNION ALL ".join(
        f"""
        SELECT '{lhs}->{rhs}' AS fd,
               COUNT(*) AS n_lhs_values,
               CAST(SUM(CAST(n_rhs > 1 AS INT)) AS BIGINT) AS violating_lhs,
               SUM(CAST(n_rhs > 1 AS INT)) = 0 AS holds
        FROM (
            SELECT {lhs}, COUNT(*) AS n_rhs
            FROM (SELECT DISTINCT {lhs}, {rhs} FROM part)
            GROUP BY {lhs}
        )"""
        for lhs, rhs in candidates
    )
    return f"SELECT * FROM ({arms}) ORDER BY fd"


# --- Benford first-digit audit ------------------------------------------------


def benford_audit(orders: DataFrame) -> DataFrame:
    """Benford's-law first-digit screen on order totals — the forensic
    data-quality check for fabricated or truncated monetary data: observed
    first-significant-digit shares vs log10(1+1/d), with the chi-square
    distance as the headline.

    The first digit comes from STRING manipulation (strip sign/zeros/dot,
    take the first char) — no float log extraction, so both engines agree
    exactly; expected shares are compile-time Python constants; the 9-row
    grid carries counts, shares, and per-digit chi terms."""
    import math

    digit = F.substring(
        F.regexp_replace(F.format_number(F.abs(F.col("o_totalprice")), 6), "[0.,]", ""),
        1,
        1,
    )
    obs = (
        orders.where(F.col("o_totalprice") != 0)
        .select(digit.cast("int").alias("d"))
        .where(F.col("d").between(1, 9))
        .groupBy("d")
        .agg(F.count("*").alias("n"))
    )
    total = obs.agg(F.sum("n").alias("t"))
    expected = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(math.log10(1 + 1 / d)))
        ]
    )
    share = F.col("n").cast("double") / F.col("t").cast("double")
    exp_p = expected[F.col("d")]
    return (
        obs.crossJoin(F.broadcast(total))
        .select(
            "d",
            "n",
            F.round(share, 6).alias("observed_share"),
            F.round(exp_p, 6).alias("benford_share"),
            F.round(
                (share - exp_p) * (share - exp_p) / exp_p * F.col("t").cast("double"),
                6,
            ).alias("chi_term"),
        )
        .orderBy("d")
    )


def benford_audit_sql() -> str:
    import math

    # CAST each literal: DuckDB types bare decimal literals as DECIMAL, and
    # a DECIMAL share column stringifies differently from Spark's double in
    # the driver's canonicalization
    cases = " ".join(
        f"WHEN {d} THEN CAST({math.log10(1 + 1 / d)!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"""
        WITH obs AS (
            SELECT CAST(substr(regexp_replace(
                       format('{{:.6f}}', ABS(o_totalprice)), '[0.,]', '', 'g'),
                       1, 1) AS INT) AS d,
                   COUNT(*) AS n
            FROM orders WHERE o_totalprice <> 0
            GROUP BY 1
        ), valid AS (
            SELECT * FROM obs WHERE d BETWEEN 1 AND 9
        ), total AS (SELECT SUM(n) AS t FROM valid)
        SELECT d, n,
               round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS observed_share,
               round(CASE d {cases} END, 6) AS benford_share,
               round((CAST(n AS DOUBLE) / CAST(t AS DOUBLE) - CASE d {cases} END)
                     * (CAST(n AS DOUBLE) / CAST(t AS DOUBLE) - CASE d {cases} END)
                     / (CASE d {cases} END) * CAST(t AS DOUBLE), 6) AS chi_term
        FROM valid CROSS JOIN total
        ORDER BY d
    """


# --- join-key skew profiling ----------------------------------------------------

SKEW_TOP_K = 10


def key_skew_profile(
    keyed: list[tuple[str, DataFrame]], top_k: int = SKEW_TOP_K
) -> DataFrame:
    """Skew report for candidate shuffle keys: per key column (key_name,
    n_rows, n_keys, max_count, hottest_key, max_share_milli,
    top{k}_share_milli) — the capacity-planning numbers that decide whether
    a join/agg on that key needs salting, AQE skew handling, or a broadcast
    at 100 TB (max_share_milli is the fraction of ALL rows the single
    hottest reducer would receive).

    ``keyed`` is [(key_name, single-column DataFrame)]. Per key: one
    key-count aggregate (map-side combined), a distributed top-k on the
    counts (TakeOrderedAndProject — never a global sort of the key
    dictionary), and a 1-row total; the per-key reports union into one
    |keys|-row table. All shares are exact integer half-up milli."""
    outs = []
    for key_name, df in keyed:
        col = df.columns[0]
        counts = df.groupBy(F.col(col).alias("k")).agg(
            F.count("*").alias("cnt")
        )
        top = (
            counts.orderBy(F.desc("cnt"), "k")
            .limit(top_k)
            .agg(
                F.max(F.struct("cnt", (-F.col("k")).alias("nk"))).alias("b"),
                F.sum("cnt").alias("top_cnt"),
            )
        )
        tot = counts.agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").alias("n_keys"),
        )
        outs.append(
            tot.crossJoin(F.broadcast(top)).select(
                F.lit(key_name).alias("key_name"),
                "n_rows",
                "n_keys",
                F.col("b.cnt").cast("long").alias("max_count"),
                (-F.col("b.nk")).cast("long").alias("hottest_key"),
                F.expr(
                    "CAST((2000 * b.cnt + n_rows) DIV (2 * n_rows) AS BIGINT)"
                ).alias("max_share_milli"),
                F.expr(
                    "CAST((2000 * top_cnt + n_rows) DIV (2 * n_rows) AS BIGINT)"
                ).alias("topk_share_milli"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("key_name")


def key_skew_profile_sql(
    keys: list[tuple[str, str, str]], top_k: int = SKEW_TOP_K
) -> str:
    """``keys`` is [(key_name, table, column)] mirroring the Spark call."""
    parts = []
    for key_name, table, col in keys:
        parts.append(
            f"""
        SELECT '{key_name}' AS key_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {table}) AS n_rows,
               (SELECT COUNT(DISTINCT {col}) FROM {table}) AS n_keys,
               (SELECT CAST(cnt AS BIGINT) FROM (
                    SELECT {col} AS k, COUNT(*) AS cnt FROM {table} GROUP BY 1
                ) ORDER BY cnt DESC, k LIMIT 1) AS max_count,
               (SELECT CAST(k AS BIGINT) FROM (
                    SELECT {col} AS k, COUNT(*) AS cnt FROM {table} GROUP BY 1
                ) ORDER BY cnt DESC, k LIMIT 1) AS hottest_key,
               CAST((2000 * (SELECT cnt FROM (
                        SELECT COUNT(*) AS cnt FROM {table} GROUP BY {col}
                        ORDER BY cnt DESC, {col} LIMIT 1))
                     + (SELECT COUNT(*) FROM {table}))
                    // (2 * (SELECT COUNT(*) FROM {table})) AS BIGINT)
                   AS max_share_milli,
               CAST((2000 * (SELECT SUM(cnt) FROM (
                        SELECT COUNT(*) AS cnt FROM {table} GROUP BY {col}
                        ORDER BY cnt DESC, {col} LIMIT {top_k}))
                     + (SELECT COUNT(*) FROM {table}))
                    // (2 * (SELECT COUNT(*) FROM {table})) AS BIGINT)
                   AS topk_share_milli
        """
        )
    return " UNION ALL ".join(parts) + " ORDER BY key_name"


# --- columnar encoding advisor --------------------------------------------------

ENC_DICT_MAX_DISTINCT = 1000
ENC_DICT_MAX_PERMILLE = 100


def encoding_advisor(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column encoding recommendation for a columnar rewrite: (col_name,
    n_rows, n_distinct, distinct_milli, avg_width_centi, encoding) — the
    lake-compaction decision (dictionary-encode low-cardinality columns,
    plain-encode high-cardinality ones) made from order-free statistics, so
    the report is deterministic under any partitioning.

    One aggregation carries every column's stats (the profile_table shape:
    the exact distinct set costs an Expand; swap approx_count_distinct in at
    100 TB). avg_width_centi is the exact mean serialized width in
    hundredths of a char (integer half-up on Σlength)."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(c).alias(f"__n_{c}"),
            F.count_distinct(c).alias(f"__d_{c}"),
            F.sum(F.length(F.col(c).cast("string"))).alias(f"__w_{c}"),
        ]
    one = df.agg(*aggs)
    outs = []
    for c in columns:
        n, d, w = f"__n_{c}", f"__d_{c}", f"__w_{c}"
        dist_milli = F.expr(f"CAST((2000 * {d} + {n}) DIV (2 * {n}) AS BIGINT)")
        enc = (
            F.when(
                (F.col(d) <= ENC_DICT_MAX_DISTINCT)
                | (dist_milli <= ENC_DICT_MAX_PERMILLE),
                "DICT",
            ).otherwise("PLAIN")
        )
        outs.append(
            one.select(
                F.lit(c).alias("col_name"),
                F.col(n).cast("long").alias("n_rows"),
                F.col(d).cast("long").alias("n_distinct"),
                dist_milli.alias("distinct_milli"),
                F.expr(f"CAST((200 * {w} + {n}) DIV (2 * {n}) AS BIGINT)").alias(
                    "avg_width_centi"
                ),
                enc.alias("encoding"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("col_name")


def encoding_advisor_sql(table: str, columns: list[str]) -> str:
    parts = []
    for c in columns:
        parts.append(
            f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT({c}) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST((2000 * COUNT(DISTINCT {c}) + COUNT({c}))
                    // (2 * COUNT({c})) AS BIGINT) AS distinct_milli,
               CAST((200 * SUM(len(CAST({c} AS VARCHAR))) + COUNT({c}))
                    // (2 * COUNT({c})) AS BIGINT) AS avg_width_centi,
               CASE WHEN COUNT(DISTINCT {c}) <= {ENC_DICT_MAX_DISTINCT}
                         OR CAST((2000 * COUNT(DISTINCT {c}) + COUNT({c}))
                                 // (2 * COUNT({c})) AS BIGINT)
                            <= {ENC_DICT_MAX_PERMILLE}
                    THEN 'DICT' ELSE 'PLAIN' END AS encoding
        FROM {table}
        """
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


# --- ingest quarantine routing -------------------------------------------------------

QUARANTINE_VALUE_CAP_CENTS = 40000  # value > $400 -> outlier
QUARANTINE_PROPS_MAX_K = 89


def quarantine_audit(events: DataFrame) -> DataFrame:
    """Dead-letter quarantine routing for the ingest edge: every event is
    routed by the FIRST violated rule (priority order — value outlier,
    props schema range, clock skew) or 'clean', and the audit reports each
    route's population: (reason, n_events, n_users, min_event_id,
    max_event_id, share_milli).

    The operational front door of every 100 TB pipeline: bad rows must be
    QUARANTINED WITH A REASON, not dropped (reprocessing needs them) and
    not passed through (they poison aggregates). Routing is one narrow
    CASE over parsed fields (JSON probed with the engine's native path
    extractor); the audit is one reason-keyed aggregate plus a 4-row
    window for the share — in production the same CASE feeds a
    partitionBy('reason') writer.

    Exactness: value parses to integer cents before comparison; shares are
    1000·n DIV total over the tiny grouped relation."""
    routed = events.select(
        "event_id",
        "user_id",
        F.when(
            F.expr("CAST(round(value * 100) AS BIGINT)")
            > QUARANTINE_VALUE_CAP_CENTS,
            F.lit("value_outlier"),
        )
        .when(
            F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)")
            > QUARANTINE_PROPS_MAX_K,
            F.lit("props_range"),
        )
        .when(F.hour("ts") == 0, F.lit("clock_skew"))
        .otherwise(F.lit("clean"))
        .alias("reason"),
    )
    agg = routed.groupBy("reason").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        agg.withColumn("total", F.sum("n_events").over(w_all))
        .select(
            "reason",
            "n_events",
            "n_users",
            "min_event_id",
            "max_event_id",
            F.expr("CAST(1000 * n_events DIV total AS BIGINT)").alias(
                "share_milli"
            ),
        )
        .orderBy("reason")
    )


def quarantine_audit_sql() -> str:
    return f"""
        WITH routed AS (
            SELECT event_id, user_id,
                   CASE WHEN CAST(round(value * 100) AS BIGINT)
                             > {QUARANTINE_VALUE_CAP_CENTS}
                        THEN 'value_outlier'
                        WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                             > {QUARANTINE_PROPS_MAX_K}
                        THEN 'props_range'
                        WHEN EXTRACT(hour FROM ts) = 0 THEN 'clock_skew'
                        ELSE 'clean' END AS reason
            FROM events
        ),
        agg AS (
            SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   MIN(event_id) AS min_event_id,
                   MAX(event_id) AS max_event_id
            FROM routed GROUP BY reason
        )
        SELECT reason, n_events, n_users, min_event_id, max_event_id,
               CAST(1000 * n_events // SUM(n_events) OVER () AS BIGINT)
                   AS share_milli
        FROM agg
        ORDER BY reason
    """


# --- source watermark skew -----------------------------------------------------------


def watermark_skew(events: DataFrame) -> DataFrame:
    """Multi-source ingest watermark audit: treating each event type as an
    independent upstream stream, the SAFE event-time watermark is the
    minimum of the per-source high-water marks — one stalled source holds
    back every downstream window. Output per source: (event_type,
    watermark_ts, lag_s, is_laggard).

    lag_s is how far the source's own watermark runs AHEAD of the safe
    line (0 = this source IS the laggard gating everyone). The operational
    readout behind every 'why is my window not closing' page.

    Scale shape: one type-grain max aggregate; the safe line is the min
    over that bounded relation (window over |sources| rows)."""
    marks = events.groupBy("event_type").agg(F.max("ts").alias("watermark_ts"))
    g = Window.partitionBy()
    return (
        marks.withColumn("safe", F.min("watermark_ts").over(g))
        .select(
            "event_type",
            "watermark_ts",
            (F.unix_micros("watermark_ts") - F.unix_micros("safe"))
            .cast("long")
            .alias("lag_us"),
        )
        .select(
            "event_type",
            "watermark_ts",
            F.expr("CAST(lag_us DIV 1000000 AS BIGINT)").alias("lag_s"),
            (F.col("lag_us") == 0).cast("int").alias("is_laggard"),
        )
        .orderBy("event_type")
    )


WATERMARK_SKEW_SQL = """
    WITH marks AS (
        SELECT event_type, MAX(ts) AS watermark_ts
        FROM events GROUP BY event_type
    ),
    lined AS (
        SELECT event_type, watermark_ts,
               epoch_us(watermark_ts) - epoch_us(MIN(watermark_ts) OVER ())
                   AS lag_us
        FROM marks
    )
    SELECT event_type, watermark_ts,
           CAST(lag_us // 1000000 AS BIGINT) AS lag_s,
           CAST(lag_us = 0 AS INT) AS is_laggard
    FROM lined
    ORDER BY event_type
"""
