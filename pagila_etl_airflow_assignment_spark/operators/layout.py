"""Data-layout optimization: z-order clustering keys and their pruning value.

Multi-dimensional clustering is how 100 TB lake tables make BOTH
``WHERE o_custkey = ?`` and ``WHERE o_orderdate BETWEEN ...`` prune files:
interleave the bits of the two dimensions into one z-value, sort/bucket the
table by it, and every file's min/max range stays narrow on EVERY interleaved
dimension (a date-sorted layout is perfect on date and useless on custkey).
These operators compute the z-value with plain integer arithmetic (identical
expression in both dialects — no engine-specific intrinsics) and quantify the
payoff: per-bucket min/max ranges as the fraction of the global domain a
min/max-pruned scan would have to read.

Scale shape: the z-value is a narrow per-row expression; the quality report
is one bucket-keyed aggregate (|buckets| output rows). Re-clustering a real
table is then just ``repartitionByRange(zvalue)`` + write — the expensive
global sort the report exists to justify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Z_BITS = 10          # bits kept per dimension (1024-cell grid per dim)
Z_BUCKETS_LOG2 = 6   # 64 z-buckets = the simulated file count


def _interleave_expr(x: str, y: str, bits: int, dialect: str) -> str:
    """Bit-interleave expression ``...y1x1y0x0`` from the low ``bits`` bits
    of x and y, as a sum of shifted single-bit terms — the same arithmetic
    string works in both engines modulo shift syntax."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout_quality(orders: DataFrame) -> DataFrame:
    """Assign every order a z-value over (o_custkey, o_orderdate) and report,
    per simulated file bucket (top bits of the z-value), the min/max range
    each dimension would expose to min/max pruning: (bucket, n_rows,
    cust_lo, cust_hi, day_lo, day_hi, cust_width_milli, day_width_milli).

    Both *_width_milli columns are the bucket's span over the GLOBAL span in
    exact milli — the expected fraction of files a single-dimension
    predicate reads under this layout (~sqrt-law for z-order vs 1.0 for the
    unsorted dimension of a linear sort). The global spans ride the same
    aggregate via a 1-row broadcast."""
    cust = f"(o_custkey % {1 << Z_BITS})"
    day = f"(datediff(CAST(o_orderdate AS DATE), DATE'1992-01-01') % {1 << Z_BITS})"
    z = _interleave_expr(cust, day, Z_BITS, "spark")
    rows = orders.select(
        F.expr(cust).cast("long").alias("c"),
        F.expr(day).cast("long").alias("d"),
        F.expr(f"({z}) DIV {1 << (2 * Z_BITS - Z_BUCKETS_LOG2)}")
        .cast("long")
        .alias("bucket"),
    )
    buckets = rows.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("c").alias("cust_lo"),
        F.max("c").alias("cust_hi"),
        F.min("d").alias("day_lo"),
        F.max("d").alias("day_hi"),
    )
    glob = rows.agg(
        (F.max("c") - F.min("c")).alias("gc"),
        (F.max("d") - F.min("d")).alias("gd"),
    )
    width = lambda hi, lo, g: F.expr(
        f"CAST((2000 * ({hi} - {lo}) + {g}) DIV (2 * {g}) AS BIGINT)"
    )
    return (
        buckets.crossJoin(F.broadcast(glob))
        .select(
            "bucket",
            "n_rows",
            "cust_lo",
            "cust_hi",
            "day_lo",
            "day_hi",
            width("cust_hi", "cust_lo", "gc").alias("cust_width_milli"),
            width("day_hi", "day_lo", "gd").alias("day_width_milli"),
        )
        .orderBy("bucket")
    )


def zorder_layout_quality_sql() -> str:
    cust = f"(o_custkey % {1 << Z_BITS})"
    day = f"(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % {1 << Z_BITS})"
    z = _interleave_expr("c", "d", Z_BITS, "duck")
    return f"""
    WITH rows_z AS (
        SELECT CAST({cust} AS BIGINT) AS c,
               CAST({day} AS BIGINT) AS d
        FROM orders
    ),
    zb AS (
        SELECT c, d,
               ({z}) // {1 << (2 * Z_BITS - Z_BUCKETS_LOG2)} AS bucket
        FROM rows_z
    ),
    buckets AS (
        SELECT bucket, COUNT(*) AS n_rows,
               MIN(c) AS cust_lo, MAX(c) AS cust_hi,
               MIN(d) AS day_lo, MAX(d) AS day_hi
        FROM zb GROUP BY bucket
    ),
    gspan AS (
        SELECT MAX(c) - MIN(c) AS gc, MAX(d) - MIN(d) AS gd FROM zb
    )
    SELECT bucket, n_rows, cust_lo, cust_hi, day_lo, day_hi,
           CAST((2000 * (cust_hi - cust_lo) + gc) // (2 * gc) AS BIGINT)
               AS cust_width_milli,
           CAST((2000 * (day_hi - day_lo) + gd) // (2 * gd) AS BIGINT)
               AS day_width_milli
    FROM buckets, gspan
    ORDER BY bucket
    """


# --- compaction (OPTIMIZE) planner ---------------------------------------------------

COMPACT_TARGET_ROWS = 4000


def compaction_plan(
    events: DataFrame, target_rows: int = COMPACT_TARGET_ROWS
) -> DataFrame:
    """Small-file compaction plan over the day-partitioned events layout —
    the planning half of Delta/Iceberg OPTIMIZE: daily "files" (day row
    counts, the stand-in for real file-manifest sizes) coalesce into
    sequential output bins of ~{COMPACT_TARGET_ROWS} rows, preserving day
    order so clustering survives the rewrite: (bin_id, n_files, first_day,
    last_day, bin_rows, fill_milli).

    Bin assignment is the sequential-coalesce rule bin = (cum_rows − rows)
    DIV target — exactly how sorted-compaction binpacks without an
    optimizer loop: one running-sum window in day order, one integer
    division, one bin-grain aggregate. fill_milli shows how close each
    bin lands to target (the fragmentation metric the plan exists to fix).

    Scale shape: the window runs over the |days| file-manifest grain —
    manifests are small by definition; never over the data itself."""
    files = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("rows")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    binned = files.select(
        "day",
        "rows",
        (F.sum("rows").over(w)).alias("cum"),
    ).select(
        "day",
        "rows",
        F.expr(f"CAST((cum - rows) DIV {target_rows} AS BIGINT)").alias("bin_id"),
    )
    return (
        binned.groupBy("bin_id")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
            F.sum("rows").cast("long").alias("bin_rows"),
        )
        .withColumn(
            "fill_milli",
            F.expr(f"CAST(1000 * bin_rows DIV {target_rows} AS BIGINT)"),
        )
        .orderBy("bin_id")
    )


def compaction_plan_sql(target_rows: int = COMPACT_TARGET_ROWS) -> str:
    return f"""
        WITH files AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS rows
            FROM events GROUP BY 1
        ),
        binned AS (
            SELECT day, rows,
                   (SUM(rows) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - rows) // {target_rows} AS bin_id
            FROM files
        )
        SELECT CAST(bin_id AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               MIN(day) AS first_day,
               MAX(day) AS last_day,
               CAST(SUM(rows) AS BIGINT) AS bin_rows,
               CAST(1000 * SUM(rows) // {target_rows} AS BIGINT) AS fill_milli
        FROM binned
        GROUP BY bin_id
        ORDER BY bin_id
    """


# --- snapshot retention plan --------------------------------------------------------

RETAIN_DAILY = 7
RETAIN_WEEKLY = 4
RETAIN_MONTHLY = 12


def snapshot_retention(orders: DataFrame) -> DataFrame:
    """Grandfather-father-son snapshot-retention plan — the lakehouse GC
    policy (keep the last {RETAIN_DAILY} daily snapshots, the first
    snapshot of each of the last {RETAIN_WEEKLY} weeks, the first of
    each of the last {RETAIN_MONTHLY} months; expire the rest) computed
    as a PLAN over the snapshot catalog, the same declarative shape as
    the compaction planner. Distinct order dates stand in for the
    snapshot log.

    Every rule is exact date arithmetic against the max snapshot date
    (1-row broadcast scalar); week/month "first" comes from min-date
    windows over the snapshot relation — no driver loop over snapshots.
    Output per snapshot: (snap_date, reason ∈ daily|weekly|monthly|
    expire, age_days), ordered by date.

    Scale shape: the snapshot catalog is ≤ days-of-history rows; one
    distinct projection, two min windows, one broadcast scalar."""
    snaps = orders.select(
        F.to_date("o_orderdate").alias("snap_date")
    ).distinct()
    mx = snaps.agg(F.max("snap_date").alias("max_date"))
    wk = Window.partitionBy(F.date_trunc("week", "snap_date"))
    mo = Window.partitionBy(F.date_trunc("month", "snap_date"))
    flagged = (
        snaps.crossJoin(F.broadcast(mx))
        .withColumn("age_days", F.datediff("max_date", "snap_date"))
        .withColumn(
            "week_first", F.col("snap_date") == F.min("snap_date").over(wk)
        )
        .withColumn(
            "month_first", F.col("snap_date") == F.min("snap_date").over(mo)
        )
    )
    reason = (
        F.when(F.col("age_days") < RETAIN_DAILY, "daily")
        .when(
            F.col("week_first") & (F.col("age_days") < 7 * RETAIN_WEEKLY),
            "weekly",
        )
        .when(
            F.col("month_first") & (F.col("age_days") < 31 * RETAIN_MONTHLY),
            "monthly",
        )
        .otherwise("expire")
    )
    return (
        flagged.select(
            "snap_date",
            reason.alias("reason"),
            F.col("age_days").cast("long").alias("age_days"),
        )
        .orderBy("snap_date")
    )


SNAPSHOT_RETENTION_SQL = f"""
    WITH snaps AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS snap_date FROM orders
    ),
    mx AS (SELECT MAX(snap_date) AS max_date FROM snaps),
    flagged AS (
        SELECT s.snap_date,
               date_diff('day', s.snap_date, m.max_date) AS age_days,
               s.snap_date = MIN(s.snap_date) OVER (
                   PARTITION BY date_trunc('week', s.snap_date))
                   AS week_first,
               s.snap_date = MIN(s.snap_date) OVER (
                   PARTITION BY date_trunc('month', s.snap_date))
                   AS month_first
        FROM snaps s CROSS JOIN mx m
    )
    SELECT snap_date,
           CASE WHEN age_days < {RETAIN_DAILY} THEN 'daily'
                WHEN week_first AND age_days < {7 * RETAIN_WEEKLY}
                    THEN 'weekly'
                WHEN month_first AND age_days < {31 * RETAIN_MONTHLY}
                    THEN 'monthly'
                ELSE 'expire' END AS reason,
           CAST(age_days AS BIGINT) AS age_days
    FROM flagged
    ORDER BY snap_date
"""


# --- Hilbert-curve layout ------------------------------------------------------

HB_BITS = 6            # 64x64 cell grid
HB_N = 1 << HB_BITS
HB_BUCKETS = 64        # simulated file count (top Hilbert bits)


def _hilbert_rounds():
    """(s, q_expr, x_expr, y_expr) per unrolled xy2d round — identical
    arithmetic string in both dialects (CASE replaces the XOR so no
    engine-specific bit intrinsics appear)."""
    rounds = []
    s = HB_N // 2
    while s > 0:
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        q = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 THEN 1"
            f" WHEN {ry} = 1 THEN 2 ELSE 3 END)"
        )
        x_new = (
            f"(CASE WHEN {ry} = 1 THEN x"
            f" WHEN {rx} = 1 THEN {HB_N - 1} - y ELSE y END)"
        )
        y_new = (
            f"(CASE WHEN {ry} = 1 THEN y"
            f" WHEN {rx} = 1 THEN {HB_N - 1} - x ELSE x END)"
        )
        rounds.append((s, q, x_new, y_new))
        s //= 2
    return rounds


def hilbert_layout_quality(orders: DataFrame) -> DataFrame:
    """The z-order report's Hilbert twin, same schema, directly comparable
    row-for-row: assign each order a Hilbert-curve position over
    (o_custkey, o_orderdate) on the {HB_N}x{HB_N} grid and report per
    simulated file bucket the min/max range each dimension exposes to
    pruning: (bucket, n_rows, cust_lo, cust_hi, day_lo, day_hi,
    cust_width_milli, day_width_milli).

    Why a second curve: z-order's bit interleave has long diagonal jumps
    (bucket boundaries where the curve teleports across the grid), so some
    buckets span a large range on one dimension; the Hilbert curve is
    unit-step everywhere (every consecutive cell is grid-adjacent — pinned
    by the property test), which tightens the worst buckets. Reading this
    report against warehouse_zorder_layout quantifies that textbook claim
    on real keys.

    The xy2d walk is {HB_BITS} unrolled rotation rounds of plain integer
    CASE arithmetic — the same expression string in both dialects, exact
    by construction.

    Scale shape: a narrow per-row expression, one bucket-keyed aggregate,
    one 1-row global-span broadcast — identical economics to the z-order
    report."""
    cust = f"(o_custkey % {HB_N})"
    day = f"(datediff(CAST(o_orderdate AS DATE), DATE'1992-01-01') % {HB_N})"
    base = orders.select(
        F.expr(cust).cast("long").alias("x"),
        F.expr(day).cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )
    cur = base.select(
        F.col("x").alias("c"), F.col("y").alias("dy"), "x", "y", "d"
    )
    for s, q, x_new, y_new in _hilbert_rounds():
        cur = cur.select(
            "c",
            "dy",
            F.expr(x_new).cast("long").alias("x"),
            F.expr(y_new).cast("long").alias("y"),
            (F.col("d") + s * s * F.expr(q)).cast("long").alias("d"),
        )
    rows = cur.select(
        "c",
        F.col("dy").alias("dd"),
        F.expr(f"d DIV {HB_N * HB_N // HB_BUCKETS}").cast("long").alias("bucket"),
    )
    buckets = rows.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("c").alias("cust_lo"),
        F.max("c").alias("cust_hi"),
        F.min("dd").alias("day_lo"),
        F.max("dd").alias("day_hi"),
    )
    glob = rows.agg(
        (F.max("c") - F.min("c")).alias("gc"),
        (F.max("dd") - F.min("dd")).alias("gd"),
    )
    width = lambda hi, lo, g: F.expr(
        f"CAST((2000 * ({hi} - {lo}) + {g}) DIV (2 * {g}) AS BIGINT)"
    )
    return (
        buckets.crossJoin(F.broadcast(glob))
        .select(
            "bucket",
            "n_rows",
            "cust_lo",
            "cust_hi",
            "day_lo",
            "day_hi",
            width("cust_hi", "cust_lo", "gc").alias("cust_width_milli"),
            width("day_hi", "day_lo", "gd").alias("day_width_milli"),
        )
        .orderBy("bucket")
    )


def hilbert_layout_quality_sql() -> str:
    cust = f"(o_custkey % {HB_N})"
    day = f"(CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) % {HB_N})"
    ctes = [
        f"r0 AS (SELECT {cust} AS c, {day} AS dy, {cust} AS x, {day} AS y,"
        f" CAST(0 AS BIGINT) AS d FROM orders)"
    ]
    for i, (s, q, x_new, y_new) in enumerate(_hilbert_rounds(), start=1):
        ctes.append(
            f"r{i} AS (SELECT c, dy, CAST({x_new} AS BIGINT) AS x,"
            f" CAST({y_new} AS BIGINT) AS y,"
            f" d + {s * s} * {q} AS d FROM r{i - 1})"
        )
    chain = ",\n        ".join(ctes)
    last = f"r{HB_BITS}"
    return f"""
        WITH {chain},
        rows_h AS (
            SELECT c, dy AS dd, d // {HB_N * HB_N // HB_BUCKETS} AS bucket
            FROM {last}
        ),
        buckets AS (
            SELECT bucket, COUNT(*) AS n_rows,
                   MIN(c) AS cust_lo, MAX(c) AS cust_hi,
                   MIN(dd) AS day_lo, MAX(dd) AS day_hi
            FROM rows_h GROUP BY bucket
        ),
        gspan AS (
            SELECT MAX(c) - MIN(c) AS gc, MAX(dd) - MIN(dd) AS gd FROM rows_h
        )
        SELECT bucket, n_rows, cust_lo, cust_hi, day_lo, day_hi,
               CAST((2000 * (cust_hi - cust_lo) + gc) // (2 * gc) AS BIGINT)
                   AS cust_width_milli,
               CAST((2000 * (day_hi - day_lo) + gd) // (2 * gd) AS BIGINT)
                   AS day_width_milli
        FROM buckets CROSS JOIN gspan
        ORDER BY bucket
    """
