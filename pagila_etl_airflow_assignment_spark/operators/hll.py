"""HyperLogLog distinct-count sketch, cross-engine deterministic.

The mergeable companion to exact distinct counting (events_hourly_unique_users)
and the white-box twin of Spark's opaque ``approx_count_distinct`` blob
(events_approx_sketches, rows-only checked): m = 64 registers per group, each
the MAX of the leading-zero rank of the hashed key — max() is commutative and
idempotent, so registers merge across partitions/days/streams for free, which
is why 100 TB pipelines carry HLL per partition and fold at read time.

Determinism comes from working on the md5 HEX STRING, never floats:

- bucket  = first 2 hex digits mod 64;
- rank    = leading zeros of the next 13 hex digits (52 bits) + 1, counted
  with ltrim + a 4-way CASE on the first nonzero digit — pure string/CASE
  logic, bit-identical in Spark and DuckDB (no log2/float ladder);
- the harmonic sum Σ 2^-M_j is computed in INTEGER arithmetic scaled by 2^53
  (Σ 1<<(53-M_j) ≤ 64·2^53 = 2^59 fits int64 exactly), so the final estimate
  is a single IEEE division of exactly-agreed operands. No small-range
  ln-correction (log is not cross-engine stable); the raw estimator is the
  contract and the accuracy report carries the true count beside it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HLL_M = 64  # registers per group (2^6); std error ~1.04/sqrt(64) = 13%
_RANK_BITS = 52  # 13 hex digits
_SCALE = 53  # integer scaling exponent for the harmonic sum
_ALPHA_M2 = 0.709 * HLL_M * HLL_M  # bias constant for m >= 64


def _bucket(key_hex: Column) -> Column:
    """First 2 hex digits (8 bits) mod 64."""
    return F.conv(F.substring(key_hex, 1, 2), 16, 10).cast("long") % HLL_M


def _rank(key_hex: Column) -> Column:
    """Leading-zero rank of hex digits 3..15 (52 bits), in [1, 53]."""
    s = F.substring(key_hex, 3, 13)
    stripped = F.regexp_replace(s, "^0+", "")  # ltrim('0'): zeros-only -> ''
    nz_digits = F.lit(13) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(stripped == "", _RANK_BITS + 1).otherwise(
        4 * nz_digits + extra + 1
    )


_RANK_SQL = """
        CASE WHEN stripped = '' THEN 53
             ELSE 4 * (13 - length(stripped))
                  + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
                         WHEN substr(stripped, 1, 1) IN ('2', '3') THEN 2
                         WHEN substr(stripped, 1, 1) IN ('4', '5', '6', '7') THEN 1
                         ELSE 0 END
                  + 1
        END
"""


def hll_distinct_users(events: DataFrame) -> DataFrame:
    """Per event_type: HLL estimate of distinct users vs the exact count.

    Plan shape: one narrow projection computes (bucket, rank) per event; the
    register aggregate is (type, bucket)-keyed with map-side MAX partials
    (≤ |types|·64 result rows); the estimate assembly and the exact
    distinct-count run on reduced relations. At 100 TB the register relation
    IS the stored sketch — this query is build + merge + read in one plan."""
    hexed = events.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("kh")
    )
    regs = (
        hexed.select(
            "event_type", _bucket(F.col("kh")).alias("bucket"), _rank(F.col("kh")).alias("r")
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("m"))
    )
    est = regs.groupBy("event_type").agg(
        F.count("*").alias("n_buckets_set"),
        F.max("m").alias("max_rank"),
        # PySpark's shiftleft() only takes an int bit count — the column-shift
        # form goes through the SQL function, still JVM codegen
        F.expr(f"sum(shiftleft(cast(1 as bigint), cast({_SCALE} - m as int)))").alias(
            "present_sum"
        ),
    )
    # absent buckets contribute 2^0 = 1 each -> 1 << _SCALE scaled
    harmonic_scaled = F.col("present_sum") + (F.lit(HLL_M) - F.col("n_buckets_set")) * F.lit(
        1 << _SCALE
    )
    estimate = F.lit(_ALPHA_M2 * float(1 << _SCALE)) / harmonic_scaled.cast("double")
    truth = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("true_distinct")
    )
    return (
        est.join(truth, "event_type")
        .select(
            "event_type",
            "n_buckets_set",
            "max_rank",
            estimate.alias("hll_estimate"),
            "true_distinct",
        )
        .orderBy("event_type")
    )


HLL_DISTINCT_USERS_SQL = f"""
    WITH hexed AS (
        SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS kh FROM events
    ), ranked AS (
        SELECT event_type,
               CAST(('0x' || substr(kh, 1, 2)) AS BIGINT) % {HLL_M} AS bucket,
               {_RANK_SQL} AS r
        FROM (SELECT event_type, kh, ltrim(substr(kh, 3, 13), '0') AS stripped
              FROM hexed)
    ), regs AS (
        SELECT event_type, bucket, MAX(r) AS m
        FROM ranked GROUP BY event_type, bucket
    ), est AS (
        SELECT event_type,
               COUNT(*) AS n_buckets_set,
               MAX(m) AS max_rank,
               SUM(CAST(1 AS BIGINT) << ({_SCALE} - m)) AS present_sum
        FROM regs GROUP BY event_type
    )
    SELECT est.event_type, n_buckets_set, max_rank,
           {_ALPHA_M2} * CAST(CAST(1 AS BIGINT) << {_SCALE} AS DOUBLE)
               / CAST(present_sum + ({HLL_M} - n_buckets_set)
                      * (CAST(1 AS BIGINT) << {_SCALE}) AS DOUBLE) AS hll_estimate,
           true_distinct
    FROM est
    JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS true_distinct
          FROM events GROUP BY event_type) t ON est.event_type = t.event_type
    ORDER BY est.event_type
"""


# --- KMV (k-minimum-values) distinct sketch -----------------------------------------

KMV_K = 128
KMV_SCALE = 1 << 53  # hash space after the div-128 fold of the 60-bit md5
KMV_SALTS = 64


def kmv_distinct(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """KMV distinct-user sketch per event type (plus a merged 'click+view'
    row): (label, exact_users, kmv_est, err_milli).

    The OTHER mergeable distinct sketch: where HLL keeps max-rank registers,
    KMV keeps the k smallest hash values — union(A, B) is just the k
    smallest of the combined sets (shown by the merged row), and the
    estimator (k−1)·H/kth_min is one exact integer division, so unlike HLL
    the whole sketch + estimate pipeline is DuckDB-oracle-checkable bit for
    bit. Saturated sketches (fewer than k distinct) return the exact count.

    Scale shape: k-mins are collected in two stages — per (label, salt)
    partial top-k (64 salts, so no label ever sorts in one task), then the
    final top-k over the ≤ 64k survivors — the same partial/final shape as
    any distributed top-k. The exact side is one distinct-count aggregate,
    present only because the query IS the sketch-accuracy harness."""
    base = events.select("event_type", "user_id").unionByName(
        events.where(F.col("event_type").isin("click", "view")).select(
            F.lit("click+view").alias("event_type"), "user_id"
        )
    )
    hashed = base.select(
        F.col("event_type").alias("label"),
        F.expr(
            f"CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
            f" AS BIGINT) DIV 128"
        ).alias("h"),
    ).distinct()
    w_salt = Window.partitionBy("label", F.col("h") % KMV_SALTS).orderBy("h")
    partial = hashed.withColumn("rs", F.row_number().over(w_salt)).where(
        F.col("rs") <= k
    )
    w_label = Window.partitionBy("label").orderBy("h")
    sketch = partial.withColumn("rn", F.row_number().over(w_label)).where(
        F.col("rn") <= k
    )
    agg = sketch.groupBy("label").agg(
        F.count("*").alias("n_sk"), F.max("h").alias("kth")
    )
    exact = base.groupBy(F.col("event_type").alias("label")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        agg.join(exact, "label")
        .select(
            "label",
            "exact_users",
            F.expr(
                f"CAST(CASE WHEN n_sk < {k} THEN n_sk"
                f" ELSE ({k} - 1) * {KMV_SCALE} DIV kth END AS BIGINT)"
            ).alias("kmv_est"),
        )
        .select(
            "label",
            "exact_users",
            "kmv_est",
            F.expr(
                "CAST(1000 * ABS(kmv_est - exact_users) DIV exact_users"
                " AS BIGINT)"
            ).alias("err_milli"),
        )
        .orderBy("label")
    )


def kmv_distinct_sql(k: int = KMV_K) -> str:
    h = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT // 128"
    return f"""
        WITH base AS (
            SELECT event_type, user_id FROM events
            UNION ALL
            SELECT 'click+view' AS event_type, user_id FROM events
            WHERE event_type IN ('click', 'view')
        ),
        hashed AS (
            SELECT DISTINCT event_type AS label, {h} AS h FROM base
        ),
        partial AS (
            SELECT label, h FROM (
                SELECT label, h, ROW_NUMBER() OVER (
                    PARTITION BY label, h % {KMV_SALTS} ORDER BY h) AS rs
                FROM hashed
            ) WHERE rs <= {k}
        ),
        sketch AS (
            SELECT label, h FROM (
                SELECT label, h,
                       ROW_NUMBER() OVER (PARTITION BY label ORDER BY h) AS rn
                FROM partial
            ) WHERE rn <= {k}
        ),
        agg AS (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_sk,
                   MAX(h) AS kth
            FROM sketch GROUP BY label
        ),
        exact AS (
            SELECT event_type AS label,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
            FROM base GROUP BY event_type
        )
        SELECT a.label, e.exact_users,
               CAST(CASE WHEN n_sk < {k} THEN n_sk
                    ELSE ({k} - 1) * {KMV_SCALE} // kth END AS BIGINT)
                   AS kmv_est,
               CAST(1000 * ABS(CASE WHEN n_sk < {k} THEN n_sk
                               ELSE ({k} - 1) * {KMV_SCALE} // kth END
                               - e.exact_users) // e.exact_users AS BIGINT)
                   AS err_milli
        FROM agg a JOIN exact e USING (label)
        ORDER BY a.label
    """


# --- KMV set algebra (union / intersection / Jaccard across sketches) ----------------


def kmv_setops(events: DataFrame, k: int = KMV_K) -> DataFrame:
    """KMV sketch SET ALGEBRA across event-type user populations: for each
    unordered pair of types, estimate |A∪B|, |A∩B| and Jaccard from the two
    k-min sketches ALONE, with the exact values alongside:
    (label_a, label_b, exact_union, est_union, exact_inter, est_inter,
    jaccard_milli_est, jaccard_milli_exact).

    This is the operation that makes KMV the audience-overlap sketch of
    choice (Beyer et al., SIGMOD 2007): the union sketch is just the k
    smallest of the merged min-sets, and intersection follows by counting
    union-sketch members present in BOTH input sketches (ρ = n_both/k,
    est_inter = ρ·est_union) — no rescan of either population. All
    estimators are single exact integer divisions, so the whole pipeline is
    DuckDB-checkable bit for bit; saturated unions (< k distinct) fall back
    to the exact merged count.

    Scale shape: the only corpus-sized work is building the per-label
    sketches (same two-stage salted top-k as kmv_distinct — no label sorts
    in one task). Everything after operates on ≤ 5·k rows; the exact panel
    is one distinct-pair aggregate, present because the query IS the
    sketch-accuracy harness."""
    labels = ["click", "purchase", "view"]
    hashed = (
        events.where(F.col("event_type").isin(labels))
        .select(
            F.col("event_type").alias("label"),
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
                " AS BIGINT) DIV 128"
            ).alias("h"),
        )
        .distinct()
    )
    w_salt = Window.partitionBy("label", F.col("h") % KMV_SALTS).orderBy("h")
    partial = hashed.withColumn("rs", F.row_number().over(w_salt)).where(
        F.col("rs") <= k
    )
    w_label = Window.partitionBy("label").orderBy("h")
    sketch = (
        partial.withColumn("rn", F.row_number().over(w_label))
        .where(F.col("rn") <= k)
        .select("label", "h")
    )

    pairs = [(a, b) for i, a in enumerate(labels) for b in labels[i + 1 :]]
    # merged min-set per pair: each sketch row fans out (narrow explode — no
    # Python-built dim relation, no crossJoin) to the two pairs its label
    # belongs to, then dedup h within pair and keep the k smallest
    pair_map = {
        lbl: [(a, b) for (a, b) in pairs if lbl in (a, b)] for lbl in labels
    }
    fanout = F.array(
        *[
            F.when(
                F.col("label") == lbl,
                F.array(
                    *[
                        F.struct(
                            F.lit(a).alias("label_a"), F.lit(b).alias("label_b")
                        )
                        for (a, b) in pair_map[lbl]
                    ]
                ),
            )
            for lbl in labels
        ]
    )
    merged = (
        sketch.select(
            "h", F.explode(F.flatten(F.filter(fanout, lambda x: x.isNotNull()))).alias("p")
        )
        .select(F.col("p.label_a").alias("label_a"), F.col("p.label_b").alias("label_b"), "h")
        .distinct()
    )
    w_pair = Window.partitionBy("label_a", "label_b").orderBy("h")
    union_sketch = merged.withColumn("rn", F.row_number().over(w_pair)).where(
        F.col("rn") <= k
    )
    in_a = sketch.select(F.col("label").alias("label_a"), "h").withColumn(
        "one_a", F.lit(1)
    )
    in_b = sketch.select(F.col("label").alias("label_b"), "h").withColumn(
        "one_b", F.lit(1)
    )
    est = (
        union_sketch.join(in_a, ["label_a", "h"], "left")
        .join(in_b, ["label_b", "h"], "left")
        .groupBy("label_a", "label_b")
        .agg(
            F.count("*").alias("n_sk"),
            F.max("h").alias("kth"),
            F.sum(
                F.when(
                    F.col("one_a").isNotNull() & F.col("one_b").isNotNull(), 1
                ).otherwise(0)
            ).alias("n_both"),
        )
        .withColumn(
            "est_union",
            F.expr(
                f"CAST(CASE WHEN n_sk < {k} THEN n_sk"
                f" ELSE ({k} - 1) * {KMV_SCALE} DIV kth END AS BIGINT)"
            ),
        )
        .withColumn(
            "est_inter",
            F.expr("CAST(n_both * est_union DIV n_sk AS BIGINT)"),
        )
        .withColumn(
            "jaccard_milli_est", F.expr("CAST(1000 * n_both DIV n_sk AS BIGINT)")
        )
    )
    flags = (
        events.where(F.col("event_type").isin(labels))
        .groupBy("user_id")
        .agg(*[
            F.max(F.when(F.col("event_type") == lbl, 1).otherwise(0)).alias(
                f"is_{lbl}"
            )
            for lbl in labels
        ])
    )
    # one events pass: each user row explodes to its 3 pair-membership rows
    exact = (
        flags.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(a).alias("label_a"),
                            F.lit(b).alias("label_b"),
                            F.when(
                                (F.col(f"is_{a}") == 1) | (F.col(f"is_{b}") == 1),
                                1,
                            )
                            .otherwise(0)
                            .alias("in_u"),
                            F.when(
                                (F.col(f"is_{a}") == 1) & (F.col(f"is_{b}") == 1),
                                1,
                            )
                            .otherwise(0)
                            .alias("in_i"),
                        )
                        for (a, b) in pairs
                    ]
                )
            ).alias("x")
        )
        .select("x.*")
        .groupBy("label_a", "label_b")
        .agg(
            F.sum("in_u").cast("long").alias("exact_union"),
            F.sum("in_i").cast("long").alias("exact_inter"),
        )
    )
    return (
        est.join(exact, ["label_a", "label_b"])
        .select(
            "label_a",
            "label_b",
            "exact_union",
            "est_union",
            "exact_inter",
            "est_inter",
            "jaccard_milli_est",
            F.expr(
                "CAST(1000 * exact_inter DIV exact_union AS BIGINT)"
            ).alias("jaccard_milli_exact"),
        )
        .orderBy("label_a", "label_b")
    )


def kmv_setops_sql(k: int = KMV_K) -> str:
    h = (
        "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))"
        " AS UBIGINT)::BIGINT // 128"
    )
    return f"""
        WITH hashed AS (
            SELECT DISTINCT event_type AS label, {h} AS h
            FROM events WHERE event_type IN ('click', 'purchase', 'view')
        ),
        sketch AS (
            SELECT label, h FROM (
                SELECT label, h,
                       ROW_NUMBER() OVER (PARTITION BY label ORDER BY h) AS rn
                FROM hashed
            ) WHERE rn <= {k}
        ),
        pairs(label_a, label_b) AS (
            VALUES ('click', 'purchase'), ('click', 'view'),
                   ('purchase', 'view')
        ),
        merged AS (
            SELECT DISTINCT label_a, label_b, h
            FROM (
                SELECT p.label_a, p.label_b, s.h
                FROM pairs p JOIN sketch s ON s.label = p.label_a
                UNION ALL
                SELECT p.label_a, p.label_b, s.h
                FROM pairs p JOIN sketch s ON s.label = p.label_b
            )
        ),
        union_sketch AS (
            SELECT label_a, label_b, h FROM (
                SELECT label_a, label_b, h, ROW_NUMBER() OVER (
                    PARTITION BY label_a, label_b ORDER BY h) AS rn
                FROM merged
            ) WHERE rn <= {k}
        ),
        est AS (
            SELECT u.label_a, u.label_b,
                   CAST(COUNT(*) AS BIGINT) AS n_sk,
                   MAX(u.h) AS kth,
                   CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_both
            FROM union_sketch u
            LEFT JOIN sketch a ON a.label = u.label_a AND a.h = u.h
            LEFT JOIN sketch b ON b.label = u.label_b AND b.h = u.h
            GROUP BY u.label_a, u.label_b
        ),
        est2 AS (
            SELECT label_a, label_b, n_sk, n_both,
                   CAST(CASE WHEN n_sk < {k} THEN n_sk
                        ELSE ({k} - 1) * {KMV_SCALE} // kth END AS BIGINT)
                       AS est_union
            FROM est
        ),
        flags AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS is_click,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS is_purchase,
                   MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS is_view
            FROM events WHERE event_type IN ('click', 'purchase', 'view')
            GROUP BY user_id
        ),
        exact AS (
            SELECT p.label_a, p.label_b,
                   CAST(SUM(CASE WHEN (CASE p.label_a WHEN 'click' THEN is_click
                                       WHEN 'purchase' THEN is_purchase
                                       ELSE is_view END) = 1
                                  OR (CASE p.label_b WHEN 'click' THEN is_click
                                      WHEN 'purchase' THEN is_purchase
                                      ELSE is_view END) = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS exact_union,
                   CAST(SUM(CASE WHEN (CASE p.label_a WHEN 'click' THEN is_click
                                       WHEN 'purchase' THEN is_purchase
                                       ELSE is_view END) = 1
                                 AND (CASE p.label_b WHEN 'click' THEN is_click
                                      WHEN 'purchase' THEN is_purchase
                                      ELSE is_view END) = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
            FROM pairs p CROSS JOIN flags
            GROUP BY p.label_a, p.label_b
        )
        SELECT e.label_a, e.label_b, x.exact_union, e.est_union,
               x.exact_inter,
               CAST(e.n_both * e.est_union // e.n_sk AS BIGINT) AS est_inter,
               CAST(1000 * e.n_both // e.n_sk AS BIGINT) AS jaccard_milli_est,
               CAST(1000 * x.exact_inter // x.exact_union AS BIGINT)
                   AS jaccard_milli_exact
        FROM est2 e JOIN exact x USING (label_a, label_b)
        ORDER BY e.label_a, e.label_b
    """
