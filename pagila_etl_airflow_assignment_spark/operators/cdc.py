"""Snapshot-diff (CDC derivation) operator: given two snapshots of a keyed
table, emit the row-level change set — inserts, updates, deletes.

The reference's change capture is watermark-column-based (CDC-lite,
etl.py:115-128, SURVEY.md I-3) and explicitly cannot see deletes or edits that
don't touch `last_update`. Snapshot diffing is the lakehouse-native complement:
compare yesterday's table state to today's and derive the full change set,
deletes included — what Delta's Change Data Feed materializes, computed here
from plain snapshots.

Scale design: ONE full-outer shuffle join keyed on the primary key — both
sides partition on the key, so at 100 TB this is the minimal data movement for
the problem (bucketed/co-partitioned snapshots make it shuffle-free). Change
detection compares a null-safe struct of the tracked columns — one vectorized
JVM comparison per row, wide-row-proof, no per-column driver loop beyond
building the expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key as insert / update / delete / (unchanged, dropped).

    Output: key columns + `change_type` + `old_<c>` / `new_<c>` for each
    tracked column. Unchanged keys (null-safe equality on ALL tracked
    columns) are filtered out — the result is the change set only.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = [F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}")) for k in key]
    join_cond = cond[0]
    for c in cond[1:]:
        join_cond = join_cond & c
    joined = o.join(n, on=join_cond, how="full_outer")

    in_old = F.col(f"__ok_{key[0]}").isNotNull()
    in_new = F.col(f"__nk_{key[0]}").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(f"__ok_{k}", f"__nk_{k}").alias(k)
                for k in key
            ],
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


# --- deterministic snapshot derivation over the orders fixture ----------------
# old snapshot: keys ≡ 7 (mod 10) absent (later inserted), keys ≡ 3 carry a
# pre-update price (exact +1.0 — no float rounding ambiguity across engines);
# new snapshot: keys ≡ 5 removed (deletes).

INSERT_MOD, DELETE_MOD, UPDATE_MOD = 7, 5, 3


def orders_old_snapshot(orders: DataFrame) -> DataFrame:
    return orders.where(F.col("o_orderkey") % 10 != INSERT_MOD).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 10 == UPDATE_MOD, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )


def orders_new_snapshot(orders: DataFrame) -> DataFrame:
    return orders.where(F.col("o_orderkey") % 10 != DELETE_MOD).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


def orders_snapshot_diff(orders: DataFrame) -> DataFrame:
    return snapshot_diff(
        orders_old_snapshot(orders),
        orders_new_snapshot(orders),
        key=["o_orderkey"],
        compare_cols=["o_totalprice", "o_orderstatus"],
    ).orderBy("o_orderkey")


ORDERS_SNAPSHOT_DIFF_SQL = f"""
    WITH old AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = {UPDATE_MOD}
                    THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 10 <> {INSERT_MOD}
    ),
    new AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 10 <> {DELETE_MOD}
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.o_totalprice  AS old_o_totalprice,
           o.o_orderstatus AS old_o_orderstatus,
           n.o_totalprice  AS new_o_totalprice,
           n.o_orderstatus AS new_o_orderstatus
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
    ORDER BY o_orderkey
"""


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Apply a `snapshot_diff`-shaped change set to a snapshot, producing the
    next snapshot — the CDC-apply half of the pair (what a downstream mirror
    runs on a replicated change feed). By construction
    ``apply_changes(old, snapshot_diff(old, new)) == new`` (pinned by test).

    One full-outer key join: inserts/updates take the change's new values,
    deletes drop the row, untouched keys pass through. Same single-shuffle,
    co-partitionable shape as snapshot_diff."""
    ch = changes.select(
        *[F.col(k).alias(f"__ck_{k}") for k in key],
        "change_type",
        *[F.col(f"new_{c}").alias(f"__new_{c}") for c in compare_cols],
    )
    cond = [snapshot[k].eqNullSafe(F.col(f"__ck_{k}")) for k in key]
    join_cond = cond[0]
    for c in cond[1:]:
        join_cond = join_cond & c
    joined = snapshot.join(ch, on=join_cond, how="full_outer")
    keep = F.col("change_type").isNull() | (F.col("change_type") != "delete")
    return (
        joined.where(keep)
        .select(
            *[
                F.coalesce(snapshot[k], F.col(f"__ck_{k}")).alias(k)
                for k in key
            ],
            *[
                F.when(
                    F.col("change_type").isin("insert", "update"),
                    F.col(f"__new_{c}"),
                )
                .otherwise(snapshot[c])
                .alias(c)
                for c in compare_cols
            ],
        )
    )


# --- partition checksums (merkle-style divergence localization) ---------------

CHECKSUM_BUCKETS = 10  # o_orderkey % 10: the snapshot mutations live in exactly
# three residue classes (INSERT/UPDATE/DELETE_MOD), so bucketing by the same
# modulus yields a deterministic mix of clean and diverged partitions — the
# localization behavior the operator exists to demonstrate.


def _bucket_checksums(snap: DataFrame, n_buckets: int) -> DataFrame:
    """Per-bucket (row count, order-independent content checksum). The
    checksum is bit_xor of a 60-bit md5 integer over a canonical row string —
    commutative, so it needs NO sort, distributes as one map-side-combined
    aggregate, and matches DuckDB bit-for-bit. o_totalprice is canonicalized
    to DECIMAL(18,2) text so both engines format identically."""
    from ..llm.hashing import md5_int

    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.col("o_orderstatus"),
    )
    return (
        snap.select(
            F.pmod("o_orderkey", F.lit(n_buckets)).alias("bucket"),
            md5_int(row_str).alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h)").alias("checksum"),
        )
    )


def partition_checksum_diff(
    old: DataFrame, new: DataFrame, n_buckets: int = CHECKSUM_BUCKETS
) -> DataFrame:
    """Merkle-style snapshot comparison: instead of full-outer-joining two
    100 TB snapshots row-by-row (snapshot_diff), first compare per-partition
    checksums — each side reduces to n_buckets rows with ONE aggregate scan —
    and only the diverged partitions need the expensive row-level diff. This
    is the standard cheap pre-pass for lake replication / backup validation;
    `diverged` marks the partitions snapshot_diff would then be scoped to.
    """
    o = _bucket_checksums(old, n_buckets).select(
        "bucket",
        F.col("n_rows").alias("old_rows"),
        F.col("checksum").alias("old_checksum"),
    )
    n = _bucket_checksums(new, n_buckets).select(
        "bucket",
        F.col("n_rows").alias("new_rows"),
        F.col("checksum").alias("new_checksum"),
    )
    return (
        o.join(n, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("old_rows", F.lit(0)).alias("old_rows"),
            F.coalesce("new_rows", F.lit(0)).alias("new_rows"),
            "old_checksum",
            "new_checksum",
            (
                ~F.col("old_checksum").eqNullSafe(F.col("new_checksum"))
                | ~F.col("old_rows").eqNullSafe(F.col("new_rows"))
            ).alias("diverged"),
        )
        .orderBy("bucket")
    )


def orders_partition_checksum_diff(orders: DataFrame) -> DataFrame:
    return partition_checksum_diff(
        orders_old_snapshot(orders), orders_new_snapshot(orders)
    )


def _checksum_side_sql(rel: str) -> str:
    from ..llm.hashing import md5_int_sql

    row = (
        "concat_ws('|', CAST(o_orderkey AS VARCHAR), "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), o_orderstatus)"
    )
    return f"""
        SELECT o_orderkey % {CHECKSUM_BUCKETS} AS bucket,
               COUNT(*) AS n_rows,
               bit_xor({md5_int_sql(row)}) AS checksum
        FROM {rel} GROUP BY 1
    """


ORDERS_PARTITION_CHECKSUM_DIFF_SQL_TEMPLATE = """
    WITH old AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = {update_mod}
                    THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 10 <> {insert_mod}
    ),
    new AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 10 <> {delete_mod}
    ),
    oc AS ({old_side}),
    nc AS ({new_side})
    SELECT COALESCE(oc.bucket, nc.bucket) AS bucket,
           COALESCE(oc.n_rows, 0) AS old_rows,
           COALESCE(nc.n_rows, 0) AS new_rows,
           oc.checksum AS old_checksum,
           nc.checksum AS new_checksum,
           (oc.checksum IS DISTINCT FROM nc.checksum
            OR oc.n_rows IS DISTINCT FROM nc.n_rows) AS diverged
    FROM oc FULL OUTER JOIN nc ON oc.bucket = nc.bucket
    ORDER BY bucket
"""


def orders_partition_checksum_diff_sql() -> str:
    return ORDERS_PARTITION_CHECKSUM_DIFF_SQL_TEMPLATE.format(
        update_mod=UPDATE_MOD,
        insert_mod=INSERT_MOD,
        delete_mod=DELETE_MOD,
        old_side=_checksum_side_sql("old"),
        new_side=_checksum_side_sql("new"),
    )


# --- multi-master last-writer-wins reconciliation ------------------------------------

LWW_A_MOD = 1  # keys edited by BOTH regions (conflict class)
LWW_B_MOD = 2  # keys edited by region B only
LWW_A_ONLY_MOD = 3  # keys edited by region A only


def multimaster_lww(orders: DataFrame) -> DataFrame:
    """Multi-master replica reconciliation by last-writer-wins: two regions
    hold replicas of the orders table with region-local edits (derived
    deterministically from the key, the module's synthetic-CDC
    convention); the merged table keeps, per key, the version with the
    LATEST edit timestamp, ties to the lexicographically larger region.
    Output: per winning source (winner, n_keys, n_conflicts,
    sum_price_cents) — 'base' rows survived untouched, region rows won an
    edit; n_conflicts counts keys BOTH regions edited.

    The conflict-resolution operator every active-active ingest needs
    before a golden table exists. Each key's candidate versions
    materialize as a narrow per-row explode (base always; region edits
    when the key matches their mod class — never a join), the winner is
    one min-struct aggregate on (-edit_epoch, region), and the audit is a
    3-row aggregate. Keys-with-2-edits is decided per row (both mod tests
    are on the same key), so conflicts need no second pass.

    Scale shape: one explode (≤3 candidates/row) + one key-grain
    aggregate + one 3-row rollup. Timestamp math in exact epoch seconds."""
    base_cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    epoch = F.unix_timestamp("o_orderdate")
    is_a = (F.col("o_orderkey") % 7 == LWW_A_MOD) | (
        F.col("o_orderkey") % 7 == LWW_A_ONLY_MOD
    )
    is_b = (F.col("o_orderkey") % 7 == LWW_B_MOD) | (
        F.col("o_orderkey") % 7 == LWW_A_MOD
    )
    cand = F.array(
        F.struct(
            F.lit("base").alias("src"),
            epoch.alias("ts"),
            base_cents.alias("cents"),
        ),
        F.when(
            is_a,
            F.struct(
                F.lit("region_a").alias("src"),
                (epoch + 2 * 86400).alias("ts"),
                (base_cents + 100).alias("cents"),
            ),
        ),
        F.when(
            is_b,
            F.struct(
                F.lit("region_b").alias("src"),
                (epoch + F.when(is_a, 3 * 86400).otherwise(86400)).alias("ts"),
                (base_cents + 200).alias("cents"),
            ),
        ),
    )
    per_key = (
        orders.select(
            "o_orderkey",
            (is_a & is_b).cast("int").alias("conflicted"),
            F.explode(F.filter(cand, lambda c: c.isNotNull())).alias("c"),
        )
        .groupBy("o_orderkey", "conflicted")
        .agg(
            F.min(
                F.struct(
                    (-F.col("c.ts")).alias("neg_ts"),
                    # region DESC on ties: larger name wins -> minimize the
                    # reversed string? simpler: minimize negative rank
                    F.when(F.col("c.src") == "region_b", -2)
                    .when(F.col("c.src") == "region_a", -1)
                    .otherwise(0)
                    .alias("pri"),
                    F.col("c.src").alias("src"),
                    F.col("c.cents").alias("cents"),
                )
            ).alias("w")
        )
    )
    return (
        per_key.groupBy(F.col("w.src").alias("winner"))
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("conflicted").cast("long").alias("n_conflicts"),
            F.sum("w.cents").alias("sum_price_cents"),
        )
        .orderBy("winner")
    )


def multimaster_lww_sql() -> str:
    return f"""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   CAST(epoch(o_orderdate) AS BIGINT) AS ts,
                   (o_orderkey % 7 = {LWW_A_MOD}
                    OR o_orderkey % 7 = {LWW_A_ONLY_MOD}) AS is_a,
                   (o_orderkey % 7 = {LWW_B_MOD}
                    OR o_orderkey % 7 = {LWW_A_MOD}) AS is_b
            FROM orders
        ),
        cand AS (
            SELECT o_orderkey, is_a AND is_b AS conflicted,
                   'base' AS src, ts, cents FROM base
            UNION ALL
            SELECT o_orderkey, is_a AND is_b, 'region_a',
                   ts + 2 * 86400, cents + 100 FROM base WHERE is_a
            UNION ALL
            SELECT o_orderkey, is_a AND is_b, 'region_b',
                   ts + CASE WHEN is_a THEN 3 * 86400 ELSE 86400 END,
                   cents + 200
            FROM base WHERE is_b
        ),
        won AS (
            SELECT o_orderkey, conflicted,
                   (MIN(struct_pack(
                        neg_ts := -ts,
                        pri := CASE src WHEN 'region_b' THEN -2
                               WHEN 'region_a' THEN -1 ELSE 0 END,
                        src := src, cents := cents))).src AS winner,
                   (MIN(struct_pack(
                        neg_ts := -ts,
                        pri := CASE src WHEN 'region_b' THEN -2
                               WHEN 'region_a' THEN -1 ELSE 0 END,
                        src := src, cents := cents))).cents AS cents
            FROM cand
            GROUP BY o_orderkey, conflicted
        )
        SELECT winner, CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN conflicted THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_conflicts,
               CAST(SUM(cents) AS BIGINT) AS sum_price_cents
        FROM won
        GROUP BY winner
        ORDER BY winner
    """


# --- change-log compaction audit -----------------------------------------------------

# Deterministic synthetic change log over the orders key space: every key is
# inserted at v1; keys %3 == 0 updated at v2; keys %7 == 0 updated again at
# v3; keys %10 == DELETE_MOD tombstoned at v4 — a realistic mixed history
# with multi-version keys and deletes, derivable identically in both engines.


def log_compaction_audit(orders: DataFrame) -> DataFrame:
    """Compaction economics of a keyed change log (the Kafka-compaction /
    LSM question: how much of the log is dead weight?): per order status,
    the log record count, live keys (latest op is not a delete), tombstones,
    superseded records reclaimable by compaction, and write amplification
    (log records per live key, milli). The planning input for compaction
    scheduling and tombstone-retention sizing.

    Scale shape: the log is synthesized as a narrow union of key projections
    (no join); the audit itself is one (key)-grain latest-op reduction — an
    aggregate, not a window — plus a bounded status rollup."""
    base = orders.select("o_orderkey", "o_orderstatus")
    v1 = base.select("o_orderkey", "o_orderstatus", F.lit(1).alias("v"),
                     F.lit("insert").alias("op"))
    v2 = base.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_orderstatus", F.lit(2).alias("v"), F.lit("update").alias("op")
    )
    v3 = base.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_orderstatus", F.lit(3).alias("v"), F.lit("update").alias("op")
    )
    v4 = base.where(F.col("o_orderkey") % 10 == DELETE_MOD).select(
        "o_orderkey", "o_orderstatus", F.lit(4).alias("v"), F.lit("delete").alias("op")
    )
    log = v1.unionByName(v2).unionByName(v3).unionByName(v4)
    per_key = log.groupBy("o_orderkey", "o_orderstatus").agg(
        F.count("*").cast("long").alias("versions"),
        F.max(F.struct("v", "op")).getField("op").alias("last_op"),
    )
    return (
        per_key.groupBy("o_orderstatus")
        .agg(
            F.sum("versions").cast("long").alias("log_records"),
            F.sum(F.when(F.col("last_op") != "delete", 1).otherwise(0))
            .cast("long")
            .alias("live_keys"),
            F.sum(F.when(F.col("last_op") == "delete", 1).otherwise(0))
            .cast("long")
            .alias("tombstoned_keys"),
            F.sum(F.col("versions") - 1).cast("long").alias("superseded_records"),
        )
        .select(
            "o_orderstatus",
            "log_records",
            "live_keys",
            "tombstoned_keys",
            "superseded_records",
            F.expr(
                "CAST(CASE WHEN live_keys > 0 THEN 1000 * log_records DIV live_keys"
                " ELSE 0 END AS BIGINT)"
            ).alias("write_amp_milli"),
        )
        .orderBy("o_orderstatus")
    )


def log_compaction_audit_sql() -> str:
    return f"""
        WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders),
        log AS (
            SELECT o_orderkey, o_orderstatus, 1 AS v, 'insert' AS op FROM base
            UNION ALL
            SELECT o_orderkey, o_orderstatus, 2, 'update' FROM base
            WHERE o_orderkey % 3 = 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, 3, 'update' FROM base
            WHERE o_orderkey % 7 = 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, 4, 'delete' FROM base
            WHERE o_orderkey % 10 = {DELETE_MOD}
        ),
        per_key AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST(COUNT(*) AS BIGINT) AS versions,
                   arg_max(op, v) AS last_op
            FROM log GROUP BY 1, 2
        )
        SELECT o_orderstatus,
               CAST(SUM(versions) AS BIGINT) AS log_records,
               CAST(SUM(CASE WHEN last_op <> 'delete' THEN 1 ELSE 0 END)
                    AS BIGINT) AS live_keys,
               CAST(SUM(CASE WHEN last_op = 'delete' THEN 1 ELSE 0 END)
                    AS BIGINT) AS tombstoned_keys,
               CAST(SUM(versions - 1) AS BIGINT) AS superseded_records,
               CAST(CASE WHEN SUM(CASE WHEN last_op <> 'delete' THEN 1 ELSE 0 END) > 0
                    THEN 1000 * SUM(versions)
                         // SUM(CASE WHEN last_op <> 'delete' THEN 1 ELSE 0 END)
                    ELSE 0 END AS BIGINT) AS write_amp_milli
        FROM per_key
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """
