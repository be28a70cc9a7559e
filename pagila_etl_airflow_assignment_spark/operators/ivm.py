"""Incremental view maintenance (IVM) for JOIN views, insert-only case.

The join companion to the aggregate delta-merge (operators/analytics.py
merge_aggregate_delta): a materialized join view V = A ⋈ B absorbs inserts
ΔA, ΔB without re-joining the full bases, via the bilinear delta rule

    V' = V ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

Cost scales with the DELTAS (each term joins a delta against a base or a
delta — at 100 TB the bases are bucketed on the join key, so the delta-side
joins shuffle only the delta). The oracle is the DIRECT full join of the
updated bases — the identity the maintenance must preserve — so the
differential test is between two genuinely different computations.

The fixture "deltas" are deterministic key-mod slices of orders/lineitem
(new orders AND new lines for existing orders — both delta directions are
exercised, including the ΔA⋈ΔB corner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDERS_DELTA_MOD = 7
LINES_DELTA_MOD = 5


def _split(df: DataFrame, key: str, mod: int):
    """(base, delta): rows whose key % mod != 0 are 'already materialized',
    the rest play the newly-inserted delta batch."""
    return (
        df.where(F.col(key) % mod != 0),
        df.where(F.col(key) % mod == 0),
    )


def _join_project(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.join(b, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey",
        "l_linenumber",
        "o_orderstatus",
        F.round(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (
                F.lit(1).cast("decimal(18,2)")
                - F.col("l_discount").cast("decimal(18,2)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
    )


def maintained_join_view(
    orders: DataFrame,
    lineitem: DataFrame,
    orders_mod: int = ORDERS_DELTA_MOD,
    lines_mod: int = LINES_DELTA_MOD,
) -> DataFrame:
    """The four-term IVM union for V = orders ⋈ lineitem. Must equal the
    direct join of the full tables (the oracle) row-for-row."""
    a, da = _split(orders, "o_orderkey", orders_mod)
    b, db = _split(lineitem, "l_orderkey", lines_mod)
    v = _join_project(a, b)
    return (
        v.unionByName(_join_project(da, b))
        .unionByName(_join_project(a, db))
        .unionByName(_join_project(da, db))
        .orderBy("o_orderkey", "l_linenumber")
    )


MAINTAINED_JOIN_VIEW_SQL = """
    SELECT o_orderkey, l_linenumber, o_orderstatus,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ORDER BY o_orderkey, l_linenumber
"""


# --- counting IVM: aggregate view under inserts AND deletes -------------------

IVM_INS_MOD = 7
IVM_DEL_MOD = 11


def maintained_agg_view_counting(
    orders: DataFrame, ins_mod: int = IVM_INS_MOD, del_mod: int = IVM_DEL_MOD
) -> DataFrame:
    """Counting-algorithm IVM for an AGGREGATE view under MIXED deltas —
    the general case the insert-only join rule above cannot handle.

    View: per-customer (order count, total spend). Deltas carry a ±1 sign
    (insert/delete); maintenance is one re-aggregate of the view's partials
    unioned with SIGNED delta partials — count absorbs Σ sign, sum absorbs
    Σ sign·price — and groups whose live count reaches 0 are deleted (the
    counting rule: multiplicity, not existence, is what the view stores).
    Exact decimal sums mean a fully-deleted group cancels to exactly 0.

    Fixture roles (deterministic key-mod slices): rows with key%ins_mod = 0
    are the insert batch; of the pre-existing rest, key%del_mod = 0 get
    deleted. The oracle aggregates the FINAL table state directly — the
    identity maintenance must preserve. Cost shape: the view partials never
    rescan history; both delta aggregates are delta-sized."""
    price = F.col("o_totalprice").cast("decimal(18,2)")
    pre = orders.where(F.col("o_orderkey") % ins_mod != 0)
    inserts = orders.where(F.col("o_orderkey") % ins_mod == 0)
    deletes = pre.where(F.col("o_orderkey") % del_mod == 0)

    v0 = pre.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"), F.sum(price).alias("total_spend")
    )
    signed = inserts.withColumn("sign", F.lit(1)).unionByName(
        deletes.withColumn("sign", F.lit(-1))
    )
    delta = signed.groupBy("o_custkey").agg(
        F.sum("sign").cast("long").alias("n_orders"),
        F.sum(F.col("sign") * price).alias("total_spend"),
    )
    return (
        v0.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_spend").alias("total_spend"),
        )
        .where(F.col("n_orders") > 0)
        .select(
            "o_custkey",
            "n_orders",
            F.col("total_spend").cast("double").alias("total_spend"),
        )
        .orderBy("o_custkey")
    )


def maintained_agg_view_counting_sql(
    ins_mod: int = IVM_INS_MOD, del_mod: int = IVM_DEL_MOD
) -> str:
    return f"""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_spend
        FROM orders
        WHERE (o_orderkey % {ins_mod} <> 0 AND o_orderkey % {del_mod} <> 0)
           OR o_orderkey % {ins_mod} = 0
        GROUP BY o_custkey
        HAVING COUNT(*) > 0
        ORDER BY o_custkey
    """


# --- outer-join IVM: LEFT join view under right-side inserts AND deletes ------
#
# The production shape of the reference's summary (etl_script_incremental_
# pandas.py:200-236 LEFT-joins the week spine against rentals): a LEFT join
# view must keep a null-extended row for every unmatched left key, and a
# right-side delta can FLIP that row — the first matching insert retracts the
# null-extended row, and the delete of the last match re-emits it. The
# insert-only bilinear rule above cannot express either flip; this is the
# outer-join delta rule (Griffin & Libkin-style, specialised to LEFT).

OUTER_INS_MOD = 7
OUTER_DEL_MOD = 11
OUTER_VIEW_YEAR = 1995


def _outer_slices(orders: DataFrame, ins_mod: int, del_mod: int):
    """(pre, inserts, deletes) for the 1995-order-book fixture: the year
    scope leaves ~20% of customers unmatched so the view carries REAL
    null-extended rows, and the key-mod deltas populate both flip
    directions (sf0.01: 82 null→matched, 39 matched→null)."""
    b = orders.where(F.year("o_orderdate") == OUTER_VIEW_YEAR)
    pre = b.where(F.col("o_orderkey") % ins_mod != 0)
    inserts = b.where(F.col("o_orderkey") % ins_mod == 0)
    deletes = pre.where(F.col("o_orderkey") % del_mod == 0)
    return pre, inserts, deletes


def _outer_total():
    """decimal(18,2)->double boundary cast both engines share (deferred:
    building a Column at import time needs an active SparkContext)."""
    return F.col("o_totalprice").cast("decimal(18,2)").cast("double")


def maintained_left_join_view(
    customer: DataFrame,
    orders: DataFrame,
    ins_mod: int = OUTER_INS_MOD,
    del_mod: int = OUTER_DEL_MOD,
) -> DataFrame:
    """LEFT-join IVM: V = customer LEFT JOIN orders@1995, maintained under a
    mixed right-side delta batch without re-joining the bases. Must equal
    the oracle's DIRECT left join of the final order book row-for-row.

    Delta rule: with m(k) the per-left-key match count (the auxiliary view
    counting IVM already maintains), the corrections are
      retract: matched rows of deleted orders, PLUS the null-extended row
               of every key flipping m: 0 -> >0 (its first match arrived);
      emit:    customer ⋈ inserts, PLUS a fresh null-extended row for every
               key flipping m: >0 -> 0 (its last match left).
    Both flip sets are DELTA-KEYED — only keys present in the delta batch
    can flip — so every correction join is delta-sized.

    Exactness: pure relational algebra on exact keys; the one cast is the
    decimal(18,2)->double boundary both engines share.

    Scale shape: per-key m0/m1 counts join only the delta key set; the
    retract set is delta-sized and broadcast into one LEFT ANTI pass over
    the materialized view (a production MoR/Delta sink turns that pass into
    keyed deletes); emissions are delta-sized joins. Nothing re-joins the
    full bases — that is the oracle's job."""
    pre, inserts, deletes = _outer_slices(orders, ins_mod, del_mod)

    # materialized state: the view before the delta batch
    v0 = customer.join(
        pre, customer["c_custkey"] == pre["o_custkey"], "left"
    ).select("c_custkey", "c_mktsegment", "o_orderkey", _outer_total().alias("order_total"))

    # per-key match counts — m0 stands for the maintained count auxiliary;
    # the flip computation touches only keys present in the delta batch
    m0 = pre.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("long").alias("m0")
    )
    di = inserts.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("long").alias("n_ins")
    )
    dd = deletes.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("long").alias("n_del")
    )
    flips = (
        di.select("k")
        .unionByName(dd.select("k"))
        .distinct()
        .join(m0, "k", "left")
        .join(di, "k", "left")
        .join(dd, "k", "left")
        .select(
            "k",
            F.coalesce("m0", F.lit(0)).alias("m0"),
            (
                F.coalesce("m0", F.lit(0))
                + F.coalesce("n_ins", F.lit(0))
                - F.coalesce("n_del", F.lit(0))
            ).alias("m1"),
        )
    )
    to_matched = flips.where((F.col("m0") == 0) & (F.col("m1") > 0)).select("k")
    to_null = flips.where((F.col("m0") > 0) & (F.col("m1") == 0)).select("k")

    retract = deletes.select(
        F.col("o_custkey").alias("r_key"), F.col("o_orderkey").alias("r_order")
    ).unionByName(
        to_matched.select(
            F.col("k").alias("r_key"), F.lit(None).cast("long").alias("r_order")
        )
    )
    kept = v0.join(
        F.broadcast(retract),
        (v0["c_custkey"] == retract["r_key"])
        & (v0["o_orderkey"].eqNullSafe(retract["r_order"])),
        "left_anti",
    )
    emit_matched = customer.join(
        inserts, customer["c_custkey"] == inserts["o_custkey"]
    ).select("c_custkey", "c_mktsegment", "o_orderkey", _outer_total().alias("order_total"))
    emit_null = customer.join(
        F.broadcast(to_null), customer["c_custkey"] == to_null["k"]
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("order_total"),
    )
    return (
        kept.unionByName(emit_matched)
        .unionByName(emit_null)
        .orderBy("c_custkey", "o_orderkey")
    )


def maintained_left_join_view_sql(
    ins_mod: int = OUTER_INS_MOD, del_mod: int = OUTER_DEL_MOD
) -> str:
    return f"""
        WITH b_final AS (
            SELECT * FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = {OUTER_VIEW_YEAR}
              AND (o_orderkey % {ins_mod} = 0
                   OR o_orderkey % {del_mod} <> 0)
        )
        SELECT c_custkey, c_mktsegment, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                   AS order_total
        FROM customer LEFT JOIN b_final ON c_custkey = o_custkey
        ORDER BY c_custkey, o_orderkey
    """


def left_join_view_delta_ledger(
    customer: DataFrame,
    orders: DataFrame,
    ins_mod: int = OUTER_INS_MOD,
    del_mod: int = OUTER_DEL_MOD,
) -> DataFrame:
    """The outer-join delta rule's retract/emit ledger — the correction
    stream itself as a relation, so the rule (not just its end state) is
    the tested artifact: rows (action, reason, c_custkey, o_orderkey).

      retract/match_delete   one per deleted matched row
      emit/match_insert      one per inserted matched row
      retract/flip_to_matched the null-extended row of a key whose first
                              match arrived (m: 0 -> >0)
      emit/flip_to_null       a fresh null-extended row for a key whose
                              last match left (m: >0 -> 0)

    A downstream MoR sink applies exactly this ledger; its net effect on
    the materialized view is pinned by warehouse_ivm_outer_join.

    Scale shape: identical to the view maintenance minus the view pass —
    every relation here is delta-sized."""
    pre, inserts, deletes = _outer_slices(orders, ins_mod, del_mod)
    m0 = pre.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("long").alias("m0")
    )
    di = inserts.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("long").alias("n_ins")
    )
    dd = deletes.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("long").alias("n_del")
    )
    flips = (
        di.select("k")
        .unionByName(dd.select("k"))
        .distinct()
        .join(m0, "k", "left")
        .join(di, "k", "left")
        .join(dd, "k", "left")
        .select(
            "k",
            F.coalesce("m0", F.lit(0)).alias("m0"),
            (
                F.coalesce("m0", F.lit(0))
                + F.coalesce("n_ins", F.lit(0))
                - F.coalesce("n_del", F.lit(0))
            ).alias("m1"),
        )
    )
    nullkey = F.lit(None).cast("long")
    ledger = (
        deletes.select(
            F.lit("retract").alias("action"),
            F.lit("match_delete").alias("reason"),
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderkey"),
        )
        .unionByName(
            customer.join(
                inserts, customer["c_custkey"] == inserts["o_custkey"]
            ).select(
                F.lit("emit").alias("action"),
                F.lit("match_insert").alias("reason"),
                F.col("c_custkey"),
                F.col("o_orderkey"),
            )
        )
        .unionByName(
            flips.where((F.col("m0") == 0) & (F.col("m1") > 0)).select(
                F.lit("retract").alias("action"),
                F.lit("flip_to_matched").alias("reason"),
                F.col("k").alias("c_custkey"),
                nullkey.alias("o_orderkey"),
            )
        )
        .unionByName(
            flips.where((F.col("m0") > 0) & (F.col("m1") == 0)).select(
                F.lit("emit").alias("action"),
                F.lit("flip_to_null").alias("reason"),
                F.col("k").alias("c_custkey"),
                nullkey.alias("o_orderkey"),
            )
        )
    )
    return ledger.orderBy("action", "reason", "c_custkey", "o_orderkey")


def left_join_view_delta_ledger_sql(
    ins_mod: int = OUTER_INS_MOD, del_mod: int = OUTER_DEL_MOD
) -> str:
    return f"""
        WITH b AS (
            SELECT * FROM orders
            WHERE EXTRACT(year FROM o_orderdate) = {OUTER_VIEW_YEAR}
        ),
        pre AS (SELECT * FROM b WHERE o_orderkey % {ins_mod} <> 0),
        ins AS (SELECT * FROM b WHERE o_orderkey % {ins_mod} = 0),
        del AS (SELECT * FROM pre WHERE o_orderkey % {del_mod} = 0),
        m AS (
            SELECT k, SUM(m0) AS m0, SUM(m0) + SUM(i) - SUM(d) AS m1
            FROM (
                SELECT o_custkey AS k, COUNT(*) AS m0, 0 AS i, 0 AS d
                FROM pre GROUP BY 1
                UNION ALL
                SELECT o_custkey, 0, COUNT(*), 0 FROM ins GROUP BY 1
                UNION ALL
                SELECT o_custkey, 0, 0, COUNT(*) FROM del GROUP BY 1
            ) GROUP BY k
            HAVING SUM(i) > 0 OR SUM(d) > 0
        )
        SELECT 'retract' AS action, 'match_delete' AS reason,
               o_custkey AS c_custkey, o_orderkey
        FROM del
        UNION ALL
        SELECT 'emit', 'match_insert', c_custkey, o_orderkey
        FROM customer JOIN ins ON c_custkey = o_custkey
        UNION ALL
        SELECT 'retract', 'flip_to_matched', k, CAST(NULL AS BIGINT)
        FROM m WHERE m0 = 0 AND m1 > 0
        UNION ALL
        SELECT 'emit', 'flip_to_null', k, CAST(NULL AS BIGINT)
        FROM m WHERE m0 > 0 AND m1 = 0
        ORDER BY action, reason, c_custkey, o_orderkey
    """


# --- MIN/MAX IVM: non-self-maintainable aggregate under deletes ----------------
#
# COUNT/SUM absorb deletes algebraically (the counting rule above); MAX does
# NOT — deleting the current maximum says nothing about the runner-up, so the
# view must RESCAN exactly the groups whose deleted batch touched their stored
# max. The whole point of the device is that the rescan set is delta-bounded:
# groups untouched by deletes, or whose deleted max sits strictly below the
# stored max, maintain in O(delta); only max-touching groups pay a base read,
# and that read is a semi-join-pruned scan of just those groups.

MINMAX_INS_MOD = 7
MINMAX_DEL_MOD = 11


def maintained_max_view(
    lineitem: DataFrame,
    ins_mod: int = MINMAX_INS_MOD,
    del_mod: int = MINMAX_DEL_MOD,
) -> DataFrame:
    """MAX-view IVM under mixed deltas with rescan-set detection: rows
    (l_suppkey, n_live, max_cents, rescanned) ordered by l_suppkey.

    View: per-supplier max line price (cents). Fixture deltas are the
    module's deterministic key-mod slices: l_orderkey % ins_mod = 0 rows
    are the insert batch; of the pre-existing rest, % del_mod = 0 get
    deleted. Maintenance: deleted-batch max per group vs the stored max
    decides safe (strictly below: subtract counts, keep max) vs rescan
    (equal: re-aggregate ONLY that group from the live base); inserts
    merge with a plain greatest. The oracle aggregates the final table
    state directly and recomputes the rescan flag from first
    principles — the identity maintenance must preserve.

    Exactness: prices quantize to cents; all maxima/counts are exact
    BIGINTs; the insert merge is an explicit null-safe CASE (no engine
    greatest() null-semantics dependence).

    Scale shape: the view partials never rescan history; the delete and
    insert aggregates are delta-sized; the rescan scan is semi-join
    pruned to max-touched groups only."""
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    rows = lineitem.select(
        "l_orderkey", "l_suppkey", cents.alias("c")
    )
    pre = rows.where(F.col("l_orderkey") % ins_mod != 0)
    inserts = rows.where(F.col("l_orderkey") % ins_mod == 0)
    deletes = pre.where(F.col("l_orderkey") % del_mod == 0)
    live = pre.where(F.col("l_orderkey") % del_mod != 0)

    v0 = pre.groupBy("l_suppkey").agg(
        F.max("c").alias("mx"), F.count("*").cast("long").alias("n")
    )
    dd = deletes.groupBy("l_suppkey").agg(
        F.max("c").alias("dmx"), F.count("*").cast("long").alias("dn")
    )
    state = v0.join(dd, "l_suppkey", "left")
    flag = state.select(
        "l_suppkey",
        F.when(F.col("dmx") == F.col("mx"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rescanned"),
    )
    safe = state.where(
        F.col("dmx").isNull() | (F.col("dmx") < F.col("mx"))
    ).select(
        "l_suppkey",
        F.col("mx").alias("m2"),
        (F.col("n") - F.coalesce(F.col("dn"), F.lit(0))).alias("n2"),
    )
    touched = state.where(F.col("dmx") == F.col("mx")).select("l_suppkey")
    resc = (
        live.join(touched, "l_suppkey", "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.max("c").alias("m2"),
            F.count("*").cast("long").alias("n2"),
        )
    )
    maintained = safe.unionByName(resc)
    ins_agg = inserts.groupBy("l_suppkey").agg(
        F.max("c").alias("imx"), F.count("*").cast("long").alias("inn")
    )
    merged = (
        maintained.join(ins_agg, "l_suppkey", "full_outer")
        .select(
            "l_suppkey",
            (
                F.coalesce(F.col("n2"), F.lit(0))
                + F.coalesce(F.col("inn"), F.lit(0))
            ).alias("n_live"),
            F.expr(
                "CASE WHEN m2 IS NULL THEN imx WHEN imx IS NULL THEN m2"
                " WHEN imx > m2 THEN imx ELSE m2 END"
            ).alias("max_cents"),
        )
        .where(F.col("n_live") > 0)
    )
    return (
        merged.join(flag, "l_suppkey", "left")
        .select(
            "l_suppkey",
            "n_live",
            "max_cents",
            F.coalesce(F.col("rescanned"), F.lit(0)).alias("rescanned"),
        )
        .orderBy("l_suppkey")
    )


def maintained_max_view_sql(
    ins_mod: int = MINMAX_INS_MOD, del_mod: int = MINMAX_DEL_MOD
) -> str:
    return f"""
        WITH rows_c AS (
            SELECT l_orderkey, l_suppkey,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS c
            FROM lineitem
        ),
        pre AS (
            SELECT * FROM rows_c WHERE l_orderkey % {ins_mod} <> 0
        ),
        final_state AS (
            SELECT l_suppkey, c FROM pre WHERE l_orderkey % {del_mod} <> 0
            UNION ALL
            SELECT l_suppkey, c FROM rows_c WHERE l_orderkey % {ins_mod} = 0
        ),
        v0 AS (
            SELECT l_suppkey, MAX(c) AS mx FROM pre GROUP BY l_suppkey
        ),
        dd AS (
            SELECT l_suppkey, MAX(c) AS dmx
            FROM pre WHERE l_orderkey % {del_mod} = 0
            GROUP BY l_suppkey
        ),
        flag AS (
            SELECT v0.l_suppkey,
                   CASE WHEN dmx = mx THEN 1 ELSE 0 END AS rescanned
            FROM v0 LEFT JOIN dd USING (l_suppkey)
        ),
        final_agg AS (
            SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_live,
                   MAX(c) AS max_cents
            FROM final_state GROUP BY l_suppkey
        )
        SELECT f.l_suppkey, n_live, max_cents,
               CAST(COALESCE(rescanned, 0) AS BIGINT) AS rescanned
        FROM final_agg f LEFT JOIN flag USING (l_suppkey)
        ORDER BY l_suppkey
    """


# --- top-k view maintenance ------------------------------------------------------------

TOPK_K = 3


def maintained_topk_view(
    lineitem: DataFrame,
    k: int = TOPK_K,
    ins_mod: int = MINMAX_INS_MOD,
    del_mod: int = MINMAX_DEL_MOD,
) -> DataFrame:
    """Top-k-per-group view IVM under mixed deltas: rows (l_suppkey, rnk,
    price_cents, n_live, rescanned) — per-supplier top-``k`` line prices.

    The delete rule generalizes the MAX view (L-522): a delete batch is
    SAFE for a group iff its max deleted price sits strictly below the
    stored k-th price (it cannot have been a member); otherwise ONLY that
    group re-aggregates from the live base (semi-join pruned). Inserts are
    always safe — the new top-k is the top-k of (stored top-k ∪ insert
    batch), a bounded merge; this insert-cheap / delete-fragile asymmetry
    is exactly why leaderboard views keep tombstone counts.

    Deltas are the module's deterministic key-mod slices (MINMAX rules).
    Exactness: cents BIGINTs with the (price DESC, l_orderkey, l_linenumber)
    total order shared by both engines. The oracle re-aggregates the final
    table state and recomputes the rescan flag from first principles."""
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    rows = lineitem.select(
        "l_orderkey", "l_linenumber", "l_suppkey", cents.alias("c")
    )
    pre = rows.where(F.col("l_orderkey") % ins_mod != 0)
    inserts = rows.where(F.col("l_orderkey") % ins_mod == 0)
    deletes = pre.where(F.col("l_orderkey") % del_mod == 0)
    live = pre.where(F.col("l_orderkey") % del_mod != 0)

    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("c").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    v0 = pre.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )
    kth = v0.groupBy("l_suppkey").agg(F.min("c").alias("kth"))
    n0 = pre.groupBy("l_suppkey").agg(F.count("*").cast("long").alias("n0"))
    dd = deletes.groupBy("l_suppkey").agg(
        F.max("c").alias("dmx"), F.count("*").cast("long").alias("dn")
    )
    state = kth.join(dd, "l_suppkey", "left")
    touched = state.where(F.col("dmx") >= F.col("kth")).select("l_suppkey")
    safe_topk = v0.join(touched, "l_suppkey", "left_anti").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "c"
    )
    resc_topk = (
        live.join(touched, "l_suppkey", "left_semi")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "c")
    )
    merged = (
        safe_topk.unionByName(resc_topk)
        .unionByName(
            inserts.select("l_suppkey", "l_orderkey", "l_linenumber", "c")
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
    )
    counts = (
        n0.join(dd.select("l_suppkey", "dn"), "l_suppkey", "left")
        .join(
            inserts.groupBy("l_suppkey").agg(
                F.count("*").cast("long").alias("inn")
            ),
            "l_suppkey",
            "full_outer",
        )
        .select(
            "l_suppkey",
            (
                F.coalesce(F.col("n0"), F.lit(0))
                - F.coalesce(F.col("dn"), F.lit(0))
                + F.coalesce(F.col("inn"), F.lit(0))
            ).alias("n_live"),
        )
    )
    flag = state.select(
        "l_suppkey",
        F.when(F.col("dmx") >= F.col("kth"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rescanned"),
    )
    return (
        merged.join(counts, "l_suppkey")
        .join(flag, "l_suppkey", "left")
        .where(F.col("n_live") > 0)
        .select(
            "l_suppkey",
            "rnk",
            F.col("c").alias("price_cents"),
            "n_live",
            F.coalesce("rescanned", F.lit(0)).alias("rescanned"),
        )
        .orderBy("l_suppkey", "rnk")
    )


def maintained_topk_view_sql(
    k: int = TOPK_K,
    ins_mod: int = MINMAX_INS_MOD,
    del_mod: int = MINMAX_DEL_MOD,
) -> str:
    """First-principles oracle: the final-state top-k plus the recomputed
    rescan flag (deleted max >= k-th of the PRE state)."""
    return f"""
    WITH rows_c AS (
        SELECT l_orderkey, l_linenumber, l_suppkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        FROM lineitem
    ),
    pre AS (SELECT * FROM rows_c WHERE l_orderkey % {ins_mod} <> 0),
    inserts AS (SELECT * FROM rows_c WHERE l_orderkey % {ins_mod} = 0),
    deletes AS (SELECT * FROM pre WHERE l_orderkey % {del_mod} = 0),
    live AS (SELECT * FROM pre WHERE l_orderkey % {del_mod} <> 0),
    final_state AS (
        SELECT * FROM live UNION ALL SELECT * FROM inserts
    ),
    topk AS (
        SELECT l_suppkey, l_orderkey, l_linenumber, c,
               row_number() OVER (
                   PARTITION BY l_suppkey
                   ORDER BY c DESC, l_orderkey ASC, l_linenumber ASC
               ) AS rnk
        FROM final_state
        QUALIFY rnk <= {k}
    ),
    counts AS (
        SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_live
        FROM final_state GROUP BY l_suppkey
    ),
    kth AS (
        SELECT l_suppkey, MIN(c) AS kth FROM (
            SELECT l_suppkey, c,
                   row_number() OVER (
                       PARTITION BY l_suppkey
                       ORDER BY c DESC, l_orderkey ASC, l_linenumber ASC
                   ) AS rnk
            FROM pre
            QUALIFY rnk <= {k}
        ) GROUP BY l_suppkey
    ),
    flag AS (
        SELECT k.l_suppkey,
               CAST(CASE WHEN d.dmx >= k.kth THEN 1 ELSE 0 END AS BIGINT)
                   AS rescanned
        FROM kth k
        LEFT JOIN (
            SELECT l_suppkey, MAX(c) AS dmx FROM deletes GROUP BY l_suppkey
        ) d USING (l_suppkey)
    )
    SELECT t.l_suppkey, CAST(t.rnk AS INTEGER) AS rnk,
           t.c AS price_cents, n.n_live,
           COALESCE(f.rescanned, 0) AS rescanned
    FROM topk t
    JOIN counts n USING (l_suppkey)
    LEFT JOIN flag f USING (l_suppkey)
    ORDER BY t.l_suppkey, t.rnk
    """


# --- join-aggregate (SPJA) view maintenance -------------------------------------------


def maintained_join_agg_view(
    orders: DataFrame,
    customer: DataFrame,
    ins_mod: int = MINMAX_INS_MOD,
    del_mod: int = MINMAX_DEL_MOD,
) -> DataFrame:
    """SPJA view IVM — the textbook composite: a SUM aggregate OVER a join
    (per-nation revenue = γ_nation,SUM(orders ⋈ customer)) maintained under
    mixed fact-side deltas by pushing the deltas THROUGH the join into the
    aggregate: Δview = γ(ΔO ⋈ C) added for inserts, subtracted for
    deletes — no rescan ever, because SUM/COUNT are self-maintainable
    (contrast the delete-fragile MAX (L-522) and top-k (L-556) views).

    Deltas are the module's deterministic key-mod slices on o_orderkey.
    Output per nation: (nation, n_live, revenue_cents, ins_cents,
    del_cents) where revenue = v0 + ins − del; the oracle re-aggregates
    the final state and re-derives the delta columns from first
    principles — the maintenance identity.

    Scale: delta-sized join legs against the broadcast dim; the stored
    view is only ever touched per-group."""
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    dim = F.broadcast(customer.select("c_custkey", "c_nationkey"))
    joined = orders.join(dim, orders.o_custkey == F.col("c_custkey")).select(
        "o_orderkey", F.col("c_nationkey").alias("nation"), cents.alias("c")
    )
    pre = joined.where(F.col("o_orderkey") % ins_mod != 0)
    inserts = joined.where(F.col("o_orderkey") % ins_mod == 0)
    deletes = pre.where(F.col("o_orderkey") % del_mod == 0)

    v0 = pre.groupBy("nation").agg(
        F.sum("c").alias("s0"), F.count("*").cast("long").alias("n0")
    )
    d_ins = inserts.groupBy("nation").agg(
        F.sum("c").alias("si"), F.count("*").cast("long").alias("ni")
    )
    d_del = deletes.groupBy("nation").agg(
        F.sum("c").alias("sd"), F.count("*").cast("long").alias("nd")
    )
    return (
        v0.join(d_ins, "nation", "full_outer")
        .join(d_del, "nation", "full_outer")
        .select(
            "nation",
            (
                F.coalesce("n0", F.lit(0))
                + F.coalesce("ni", F.lit(0))
                - F.coalesce("nd", F.lit(0))
            ).alias("n_live"),
            (
                F.coalesce("s0", F.lit(0))
                + F.coalesce("si", F.lit(0))
                - F.coalesce("sd", F.lit(0))
            ).alias("revenue_cents"),
            F.coalesce("si", F.lit(0)).alias("ins_cents"),
            F.coalesce("sd", F.lit(0)).alias("del_cents"),
        )
        .where(F.col("n_live") > 0)
        .orderBy("nation")
    )


def maintained_join_agg_view_sql(
    ins_mod: int = MINMAX_INS_MOD, del_mod: int = MINMAX_DEL_MOD
) -> str:
    """First-principles oracle: aggregate the FINAL table state over the
    join, and re-derive the delta columns directly from the slices."""
    return f"""
    WITH joined AS (
        SELECT o.o_orderkey, c.c_nationkey AS nation,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cts
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    live AS (
        SELECT * FROM joined
        WHERE o_orderkey % {ins_mod} = 0
           OR (o_orderkey % {ins_mod} <> 0 AND o_orderkey % {del_mod} <> 0)
    ),
    final AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_live,
               CAST(SUM(cts) AS BIGINT) AS revenue_cents
        FROM live GROUP BY nation
    ),
    ins AS (
        SELECT nation, CAST(SUM(cts) AS BIGINT) AS ins_cents
        FROM joined WHERE o_orderkey % {ins_mod} = 0 GROUP BY nation
    ),
    del_ AS (
        SELECT nation, CAST(SUM(cts) AS BIGINT) AS del_cents
        FROM joined
        WHERE o_orderkey % {ins_mod} <> 0 AND o_orderkey % {del_mod} = 0
        GROUP BY nation
    )
    SELECT f.nation, f.n_live, f.revenue_cents,
           COALESCE(i.ins_cents, 0) AS ins_cents,
           COALESCE(d.del_cents, 0) AS del_cents
    FROM final f
    LEFT JOIN ins i USING (nation)
    LEFT JOIN del_ d USING (nation)
    ORDER BY f.nation
    """
