"""Deterministic dataset splitting and sampling for training pipelines.

Every training pipeline needs (a) a stable train/val/test assignment that
never changes when the corpus is re-ingested or re-partitioned, and (b)
stratified subsampling that preserves group composition. Both are expressed
here as pure hash arithmetic over the key column — no RNG, no
``df.sample()`` (whose output depends on partitioning and seed plumbing),
so the same row always lands in the same split on any cluster layout, and a
DuckDB oracle can reproduce the assignment exactly.

Scale shape: split assignment is a narrow projection (zero shuffles);
stratified sampling is one window over the stratum key — the standard
per-group top-k shuffle, bounded by the stratum count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_int, md5_int_sql

# (name, cumulative upper bound in percent) — 80/10/10 by default
DEFAULT_SPLITS = (("train", 80), ("val", 90), ("test", 100))
SPLIT_BUCKETS = 100


def split_assign(
    docs: DataFrame,
    key: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
) -> DataFrame:
    """Assign each row to a named split by its key's md5 bucket (0-99).

    Content-stable: the assignment depends only on the key value, so
    re-ingestion, repartitioning, or incremental appends never move a row
    across splits (no training-set contamination of the held-out sets).
    Narrow projection — zero shuffles at any scale."""
    bucket = md5_int(F.col(key).cast("string")) % SPLIT_BUCKETS
    expr = None
    for name, hi in splits:
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.select(
        F.col(key), bucket.cast("int").alias("bucket"), expr.alias("split")
    ).orderBy(key)


def split_assign_sql(
    key: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    rel: str = "documents",
) -> str:
    bucket = f"({md5_int_sql(f'CAST({key} AS VARCHAR)')} % {SPLIT_BUCKETS})"
    cases = "\n                 ".join(
        f"WHEN {bucket} < {hi} THEN '{name}'" for name, hi in splits
    )
    return f"""
        SELECT {key},
               CAST({bucket} AS INT) AS bucket,
               CASE {cases} END AS split
        FROM {rel}
        ORDER BY {key}
    """


# Target domain mixture for ``mixture_weighted_sample`` (integer percents,
# summing to 100): the training-mix shape every pre-training pipeline tunes
# (e.g. web/wiki/books ratios), mapped onto fixture sources.
DEFAULT_MIXTURE = (("src0", 50), ("src1", 30), ("src2", 20))


def mixture_weighted_sample(
    docs: DataFrame,
    mixture: tuple[tuple[str, int], ...] = DEFAULT_MIXTURE,
    stratum: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Largest deterministic subsample realizing a target domain mixture.

    Given integer percent weights w_s, the output size is maximized subject
    to every domain hitting its exact share: T = min_s(n_s * 100 div w_s)
    rows total, quota_s = w_s * T div 100 per domain (all INTEGER arithmetic
    — float shares diverge between engines at representation boundaries).
    Within a domain, rows are taken in md5(key) order: stable under
    re-ingestion and re-partitioning, like ``split_assign``.

    Scale shape: domain counts are a tiny aggregate (|domains| rows) folded
    into a broadcast quota map; the only data-sized operation is the same
    per-domain rank window ``stratified_sample`` uses. Domains not in the
    target mixture are dropped (weight 0).
    """
    spark = docs.sparkSession
    weights = spark.createDataFrame(
        list(mixture), f"{stratum} string, weight long"
    )
    counts = docs.groupBy(stratum).agg(F.count("*").alias("n_stratum"))
    joined = counts.join(F.broadcast(weights), stratum)
    capacity = joined.agg(
        F.min(F.expr("n_stratum * 100 div weight")).alias("t_total")
    )
    quotas = joined.crossJoin(F.broadcast(capacity)).select(
        stratum, F.expr("weight * t_total div 100").alias("quota")
    )
    w = Window.partitionBy(stratum).orderBy(
        md5_int(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    ranked = docs.select(
        F.col(key), F.col(stratum), F.row_number().over(w).alias("rn")
    )
    return (
        ranked.join(F.broadcast(quotas), stratum)
        .where(F.col("rn") <= F.col("quota"))
        .select(key, stratum, F.col("rn").cast("int").alias("sample_rank"))
        .orderBy(stratum, "sample_rank")
    )


def mixture_weighted_sample_sql(
    mixture: tuple[tuple[str, int], ...] = DEFAULT_MIXTURE,
    stratum: str = "source",
    key: str = "doc_id",
    rel: str = "documents",
) -> str:
    h = md5_int_sql(f"CAST({key} AS VARCHAR)")
    values = ", ".join(f"('{s}', {w})" for s, w in mixture)
    return f"""
        WITH w({stratum}, weight) AS (VALUES {values}),
             c AS (SELECT {stratum}, COUNT(*) AS n_stratum FROM {rel}
                   GROUP BY {stratum}),
             j AS (SELECT c.{stratum}, n_stratum, weight FROM c
                   JOIN w USING ({stratum})),
             cap AS (SELECT MIN(n_stratum * 100 // weight) AS t_total FROM j),
             q AS (SELECT {stratum}, weight * t_total // 100 AS quota
                   FROM j CROSS JOIN cap),
             r AS (SELECT {key}, {stratum},
                          row_number() OVER (
                              PARTITION BY {stratum} ORDER BY {h} ASC, {key} ASC
                          ) AS rn
                   FROM {rel})
        SELECT {key}, {stratum}, CAST(rn AS INT) AS sample_rank
        FROM r JOIN q USING ({stratum})
        WHERE rn <= quota
        ORDER BY {stratum}, sample_rank
    """


def stratified_sample(
    docs: DataFrame,
    stratum: str = "source",
    fraction_pct: int = 10,
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sample: within each stratum, rows are ranked
    by their key's md5 (a stable pseudo-random order) and the top
    ``ceil(pct% * |stratum|)`` are kept — every stratum contributes its exact
    proportional share, unlike Bernoulli sampling whose per-group counts
    fluctuate. The quota is INTEGER arithmetic ((n*pct + 99) div 100): float
    ceil(n * 0.1) differs between engines at representation boundaries.

    One shuffle on the stratum key (the rank window); the per-stratum count
    rides the same window (count over the unbounded frame), so no second
    aggregation pass."""
    w = Window.partitionBy(stratum)
    wo = w.orderBy(md5_int(F.col(key).cast("string")).asc(), F.col(key).asc())
    return (
        docs.select(
            F.col(key),
            F.col(stratum),
            F.row_number().over(wo).alias("rn"),
            F.count("*").over(w).alias("n_stratum"),
        )
        .where(F.col("rn") <= F.expr(f"(n_stratum * {fraction_pct} + 99) div 100"))
        .select(key, stratum, F.col("rn").cast("int").alias("sample_rank"))
        .orderBy(stratum, "sample_rank")
    )


def stratified_sample_sql(
    stratum: str = "source",
    fraction_pct: int = 10,
    key: str = "doc_id",
    rel: str = "documents",
) -> str:
    h = md5_int_sql(f"CAST({key} AS VARCHAR)")
    return f"""
        SELECT {key}, {stratum}, CAST(rn AS INT) AS sample_rank
        FROM (
            SELECT {key}, {stratum},
                   row_number() OVER (
                       PARTITION BY {stratum} ORDER BY {h} ASC, {key} ASC
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY {stratum}) AS n_stratum
            FROM {rel}
        )
        WHERE rn <= (n_stratum * {fraction_pct} + 99) // 100
        ORDER BY {stratum}, sample_rank
    """


# --- weighted sampling without replacement ------------------------------------

WRS_K = 100


def weighted_sample_wor(docs: DataFrame, k: int = WRS_K) -> DataFrame:
    """Weighted random sample WITHOUT replacement of k documents, weight =
    n_chars (longer docs proportionally likelier), via exponential sort keys
    (Efraimidis–Spirakis A-Res): key = ln(u)/w with u ~ U(0,1); the k largest
    keys form an exact weighted sample.

    Deterministic and oracle-checkable: u derives from md5(doc_id) — the
    split-assignment trick — so both engines draw the same "randomness".
    Selection is a distributed top-k (TakeOrderedAndProject), never a global
    sort; the whole operator is one narrow projection + top-k."""
    # u in (0, 1): 60-bit md5 int scaled by 2^60, +0.5 to avoid ln(0)
    u = (md5_int(F.col("doc_id").cast("string")) + F.lit(0.5)) / F.lit(
        float(1 << 60)
    )
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(key, 12).alias("sort_key"),
        )
        .orderBy(F.desc("sort_key"), "doc_id")
        .limit(k)
    )


def weighted_sample_wor_sql(k: int = WRS_K, docs_rel: str = "documents") -> str:
    h = md5_int_sql("CAST(doc_id AS VARCHAR)")
    return f"""
        SELECT doc_id, lang, n_chars,
               round(ln(({h} + 0.5) / {float(1 << 60)})
                     / CAST(n_chars AS DOUBLE), 12) AS sort_key
        FROM {docs_rel}
        WHERE n_chars > 0
        ORDER BY sort_key DESC, doc_id
        LIMIT {k}
    """


# --- DSIR importance weighting --------------------------------------------------

DSIR_DIM = 64
DSIR_TARGET_LANG = "en"


def importance_weights_dsir(
    docs: DataFrame, target_lang: str = DSIR_TARGET_LANG, dim: int = DSIR_DIM
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., 2023): score each
    raw document by how target-like its hashed-unigram distribution is —
    log w(doc) = Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)] with
    add-one smoothing over ``dim`` md5 buckets. The standard cheap way to
    bias a 100 TB crawl toward a small high-quality target domain without
    training a classifier; here the target is the ``target_lang`` slice and
    every non-target document gets a weight.

    Cross-engine exactness (the entropy treatment): each ln() of an EXACT
    INTEGER count is quantized once to micro-nats; the per-document score is
    then a pure integer sum over tokens — order-free — and the output is an
    exact BIGINT. The bucket model is ≤ ``dim`` rows, broadcast; per-doc
    scoring is one doc-keyed aggregate over the token stream."""
    from .text import _norm

    q = lambda col: F.round(F.log(col) * F.lit(1e6)).cast("long")  # noqa: E731
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    toks = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(_norm(F.col("text")), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select("doc_id", "lang", (h % dim).alias("b"))
    )
    tgt = toks.where(F.col("lang") == target_lang).groupBy("b").agg(
        F.count("*").alias("c_t")
    )
    raw = toks.where(F.col("lang") != target_lang).groupBy("b").agg(
        F.count("*").alias("c_r")
    )
    n_t = toks.where(F.col("lang") == target_lang).agg(
        F.count("*").alias("n_t")
    )
    n_r = toks.where(F.col("lang") != target_lang).agg(
        F.count("*").alias("n_r")
    )
    model = (
        tgt.join(raw, "b", "full_outer")
        .select(
            "b",
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("c_r", F.lit(0)).alias("c_r"),
        )
        .crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(n_r))
        .select(
            "b",
            (
                (q(F.col("c_t") + 1) - q(F.col("n_t") + dim))
                - (q(F.col("c_r") + 1) - q(F.col("n_r") + dim))
            ).alias("lr_micro"),
        )
    )
    return (
        toks.where(F.col("lang") != target_lang)
        .join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lr_micro").alias("logratio_micro"),
        )
        .orderBy("doc_id")
    )


def importance_weights_dsir_sql(
    target_lang: str = DSIR_TARGET_LANG, dim: int = DSIR_DIM
) -> str:
    from .text import _norm_sql

    h = "CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)::BIGINT"

    def q(expr: str) -> str:
        return f"CAST(round(ln({expr}) * 1e6) AS BIGINT)"

    return f"""
        WITH toks AS (
            SELECT doc_id, lang, ({h}) % {dim} AS b
            FROM (
                SELECT doc_id, lang,
                       unnest(string_split({_norm_sql('text')}, ' ')) AS tok
                FROM documents
            ) WHERE tok <> ''
        ), tgt AS (
            SELECT b, COUNT(*) AS c_t FROM toks
            WHERE lang = '{target_lang}' GROUP BY b
        ), raw AS (
            SELECT b, COUNT(*) AS c_r FROM toks
            WHERE lang <> '{target_lang}' GROUP BY b
        ), n_t AS (
            SELECT COUNT(*) AS n_t FROM toks WHERE lang = '{target_lang}'
        ), n_r AS (
            SELECT COUNT(*) AS n_r FROM toks WHERE lang <> '{target_lang}'
        ), model AS (
            SELECT COALESCE(t.b, r.b) AS b,
                   ({q("COALESCE(c_t, 0) + 1")} - {q(f"n_t + {dim}")})
                 - ({q("COALESCE(c_r, 0) + 1")} - {q(f"n_r + {dim}")}) AS lr_micro
            FROM tgt t FULL OUTER JOIN raw r ON t.b = r.b
            CROSS JOIN n_t CROSS JOIN n_r
        )
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(lr_micro) AS BIGINT) AS logratio_micro
        FROM toks JOIN model USING (b)
        WHERE lang <> '{target_lang}'
        GROUP BY doc_id
        ORDER BY doc_id
    """


# --- temperature-flattened mixture --------------------------------------------------

TEMP_MIXTURE_T = 2          # weights ∝ n_s^(1/T): T=2 → sqrt flattening
TEMP_MIXTURE_TOTAL = 200    # output budget (rows) to allocate across sources


def temperature_mixture_sample(
    docs: DataFrame,
    total: int = TEMP_MIXTURE_TOTAL,
    stratum: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened mixture (the multilingual-pretraining
    rebalancer, XLM/mT5 style with α = 1/T = 0.5): source quotas follow
    n_s^(1/2) instead of n_s, boosting small sources without letting any
    source dominate. Quotas allocate a fixed ``total`` budget by exact
    integer largest-share arithmetic; rows are taken in md5(key) order
    (stable under re-ingestion, the split_assign rule).

    Cross-engine exactness: √n_s quantizes once to exact micro-units
    (bit-identical sqrt of an identical integer), so the share sum, the
    `div`-based quota, and the ranks are all integer arithmetic."""
    counts = docs.groupBy(stratum).agg(F.count("*").alias("n_stratum"))
    q = F.round(F.sqrt(F.col("n_stratum")) * F.lit(1e6)).cast("long")
    shares = counts.select(stratum, "n_stratum", q.alias("w_micro"))
    tot_w = shares.agg(F.sum("w_micro").alias("tw"))
    quotas = shares.crossJoin(F.broadcast(tot_w)).select(
        stratum,
        F.least(
            F.col("n_stratum"),
            F.expr(f"w_micro * {total} div tw"),
        ).alias("quota"),
    )
    w = Window.partitionBy(stratum).orderBy(
        md5_int(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    ranked = docs.select(
        F.col(key), F.col(stratum), F.row_number().over(w).alias("rn")
    )
    return (
        ranked.join(F.broadcast(quotas), stratum)
        .where(F.col("rn") <= F.col("quota"))
        .select(key, stratum, F.col("rn").cast("int").alias("sample_rank"))
        .orderBy(stratum, "sample_rank")
    )


def temperature_mixture_sample_sql(
    total: int = TEMP_MIXTURE_TOTAL,
    stratum: str = "source",
    key: str = "doc_id",
    docs_rel: str = "documents",
) -> str:
    return f"""
        WITH counts AS (
            SELECT {stratum}, COUNT(*) AS n_stratum
            FROM {docs_rel} GROUP BY {stratum}
        ), shares AS (
            SELECT {stratum}, n_stratum,
                   CAST(round(sqrt(n_stratum) * 1e6) AS BIGINT) AS w_micro
            FROM counts
        ), tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS tw FROM shares),
        quotas AS (
            SELECT {stratum},
                   LEAST(n_stratum, w_micro * {total} // tw) AS quota
            FROM shares CROSS JOIN tot
        ), ranked AS (
            SELECT {key}, {stratum},
                   row_number() OVER (
                       PARTITION BY {stratum}
                       ORDER BY {md5_int_sql(f"CAST({key} AS VARCHAR)")}, {key}
                   ) AS rn
            FROM {docs_rel}
        )
        SELECT {key}, {stratum}, CAST(rn AS INT) AS sample_rank
        FROM ranked JOIN quotas USING ({stratum})
        WHERE rn <= quota
        ORDER BY {stratum}, sample_rank
    """


# --- DoReMi-style domain reweighting --------------------------------------------

DOREMI_ETA_BASE = 1000  # linearized step: factor = max(0, base + excess)


def doremi_step(docs: DataFrame) -> DataFrame:
    """One linearized DoReMi domain-reweighting step: score every source by
    its mean hashed-token weight (the same fixed linear model
    text.classifier_scores runs per document — the stand-in for the proxy
    model's per-domain excess loss), then upweight sources whose score
    exceeds the cross-source average: factor_s = max(0, 1000 + score_s −
    avg), w_s = factor_s / Σfactor. The true DoReMi exponentiated-gradient
    update is this step with exp(); the linearization keeps every quantity
    an exact integer so the oracle is bit-stable, and repeated application
    converges to the same fixed point ordering.

    Plan: one narrow per-doc scoring pass, one source-keyed aggregate, and
    the cross-source normalization as window sums over the ≤|sources|-row
    relation (never the corpus). Output |sources| rows."""
    from .hashing import md5_int
    from .text import WS_RE, _norm

    toks = F.split(_norm(F.col("text")), WS_RE)
    wsum = F.aggregate(
        F.transform(F.col("t"), lambda t: md5_int(t) % 2001),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )
    per_src = (
        docs.select("source", toks.alias("t"))
        .select("source", F.size("t").cast("long").alias("ntok"), wsum.alias("ws"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("tok"),
            F.sum("ws").alias("w"),
        )
        .select(
            "source",
            "n_docs",
            F.expr("CAST((2 * w + tok) DIV (2 * tok) AS BIGINT)").alias(
                "score_milli"
            ),
        )
    )
    g = Window.partitionBy()
    avg = F.expr(
        "CAST((2 * tot + cnt) DIV (2 * cnt) AS BIGINT)"
    )
    out = (
        per_src.withColumn("tot", F.sum("score_milli").over(g))
        .withColumn("cnt", F.count("*").over(g))
        .withColumn("excess_milli", F.col("score_milli") - avg)
        .withColumn(
            "factor",
            F.greatest(F.lit(0), F.lit(DOREMI_ETA_BASE) + F.col("excess_milli")),
        )
        .withColumn("sfac", F.sum("factor").over(g))
    )
    return out.select(
        "source",
        "n_docs",
        "score_milli",
        "excess_milli",
        F.expr(
            "CAST((2000000 * factor + sfac) DIV (2 * sfac) AS BIGINT)"
        ).alias("weight_micro"),
    ).orderBy("source")


def doremi_step_sql(docs_rel: str = "documents") -> str:
    from .hashing import md5_int_sql
    from .text import WS_RE, _norm_sql

    w = f"({md5_int_sql('t')} % 2001)"
    return rf"""
    WITH scored AS (
        SELECT source,
               len(t) AS ntok,
               CAST(list_sum(list_transform(t, t -> {w})) AS BIGINT) AS ws
        FROM (
            SELECT source,
                   string_split_regex({_norm_sql('text')}, '{WS_RE}') AS t
            FROM {docs_rel}
        )
    ),
    per_src AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST((2 * SUM(ws) + SUM(ntok)) // (2 * SUM(ntok)) AS BIGINT)
                   AS score_milli
        FROM scored GROUP BY source
    ),
    ranked AS (
        SELECT *,
               CAST((2 * SUM(score_milli) OVER () + COUNT(*) OVER ())
                    // (2 * COUNT(*) OVER ()) AS BIGINT) AS avg_milli
        FROM per_src
    ),
    fac AS (
        SELECT *, score_milli - avg_milli AS excess_milli,
               greatest(0, {DOREMI_ETA_BASE} + score_milli - avg_milli) AS factor
        FROM ranked
    )
    SELECT source, n_docs, score_milli, excess_milli,
           CAST((2000000 * factor + SUM(factor) OVER ())
                // (2 * SUM(factor) OVER ()) AS BIGINT) AS weight_micro
    FROM fac
    ORDER BY source
    """


# --- group k-fold assignment ---------------------------------------------------------

KFOLD_K = 5


def group_kfold(docs: DataFrame, k: int = KFOLD_K, group: str = "source") -> DataFrame:
    """Group-integrity k-fold assignment: every document of a group lands in
    the SAME fold (fold = md5(group) % k) — (doc_id, source, fold).

    The eval-split discipline near-dup corpora need: random per-row folds
    leak a group's near-identical documents across train and validation;
    group-keyed folds keep whole sources out-of-fold. Content-stable like
    split_assign (survives re-ingestion and repartitioning), and a narrow
    projection — zero shuffles at any scale."""
    fold = (md5_int(F.col(group).cast("string")) % k).cast("int")
    return docs.select("doc_id", group, fold.alias("fold")).orderBy("doc_id")


def group_kfold_sql(
    k: int = KFOLD_K, group: str = "source", rel: str = "documents"
) -> str:
    h = md5_int_sql(f"CAST({group} AS VARCHAR)")
    return f"""
        SELECT doc_id, {group}, CAST({h} % {k} AS INT) AS fold
        FROM {rel}
        ORDER BY doc_id
    """


# --- unigram^0.75 negative-sampling table --------------------------------------------

NEG_VOCAB_K = 100
NEG_POWER_MILLI = 750  # exponent 0.75, the word2vec convention


def negative_sampling_table(docs: DataFrame, k: int = NEG_VOCAB_K) -> DataFrame:
    """word2vec-style negative-sampling distribution over the top-``k``
    vocabulary: (rank, term, cnt, w_milli, p_micro, cum_micro) with
    p ∝ count^0.75 — the smoothed-unigram noise distribution contrastive
    objectives draw from (raising rare words, damping stop words).

    Each pow(count, 0.75) quantizes ONCE to milli on an exact integer
    operand (the micro-nat ln convention — both engines evaluate the same
    double pow and round at a point 1 ulp cannot reach in practice);
    everything after — normalization, cumulative table — is half-up integer
    arithmetic, so the sampler's inversion table is bit-stable.

    Scale shape: one term aggregate + a distributed top-k; the table itself
    is k rows."""
    from .shingles import grams

    counts = (
        grams(docs, 1)
        .groupBy(F.col("gram").alias("term"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(k)
    )
    weighted = counts.select(
        "term",
        "cnt",
        F.expr(
            "CAST(round(pow(CAST(cnt AS DOUBLE), 0.75) * 1000) AS BIGINT)"
        ).alias("w_milli"),
    )
    tot = weighted.agg(F.sum("w_milli").alias("w_tot"))
    wr = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(wr).cast("long").alias("rank"),
            "term",
            "cnt",
            "w_milli",
            F.expr(
                "CAST((2 * 1000000 * w_milli + w_tot) DIV (2 * w_tot)"
                " AS BIGINT)"
            ).alias("p_micro"),
        )
        .withColumn(
            "cum_micro",
            F.sum("p_micro")
            .over(wr.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .orderBy("rank")
    )


def negative_sampling_table_sql(k: int = NEG_VOCAB_K, docs_rel: str = "documents") -> str:
    from .shingles import grams_sql

    return f"""
        WITH counts AS (
            SELECT gram AS term, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM ({grams_sql(1, docs_rel)})
            GROUP BY gram
            ORDER BY COUNT(*) DESC, gram ASC LIMIT {k}
        ),
        weighted AS (
            SELECT term, cnt,
                   CAST(round(pow(CAST(cnt AS DOUBLE), 0.75) * 1000)
                        AS BIGINT) AS w_milli
            FROM counts
        ),
        tot AS (SELECT CAST(SUM(w_milli) AS BIGINT) AS w_tot FROM weighted),
        scored AS (
            SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rank,
                   term, cnt, w_milli,
                   CAST((2 * 1000000 * w_milli + w_tot) // (2 * w_tot)
                        AS BIGINT) AS p_micro
            FROM weighted CROSS JOIN tot
        )
        SELECT CAST(rank AS BIGINT) AS rank, term, cnt, w_milli, p_micro,
               CAST(SUM(p_micro) OVER (ORDER BY rank
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_micro
        FROM scored
        ORDER BY rank
    """


# --- Neyman optimal allocation -------------------------------------------------

NEYMAN_BUDGET = 1000


def neyman_allocation(docs: DataFrame, budget: int = NEYMAN_BUDGET) -> DataFrame:
    """Neyman optimal sample allocation across source strata: the survey-
    design rule n_h ∝ N_h·S_h that spends a fixed QA budget where the
    variance is (Neyman 1934) — here sized on document length: (source,
    n_docs, s_weight, alloc). Rounding is largest-remainder (Hamilton), so
    allocations sum EXACTLY to the budget.

    Exactness: N_h·S_h = sqrt(N_h·Σx² − (Σx)²) on exact integer sums, so
    only ONE sqrt of an exactly-agreed integer happens per stratum,
    quantized once to an integer weight (the micro-nat ln discipline
    applied to sqrt); the Hamilton split is pure integer floor + modulo
    ranking after that.

    Scale shape: one stratum-grain aggregate (map-side combined) and two
    windows over the |strata|-row relation — bounded, never corpus-sized."""
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars")).alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    weighted = per.select(
        "source",
        "n_docs",
        F.round(F.sqrt(F.col("n_docs") * F.col("sxx") - F.col("sx") * F.col("sx")))
        .cast("long")
        .alias("s_weight"),
    )
    g = Window.partitionBy()
    w = Window.orderBy(F.desc("rem"), "source")
    alloc = (
        weighted.withColumn("tot", F.sum("s_weight").over(g))
        .withColumn(
            "base", F.expr(f"CAST({budget} AS BIGINT) * s_weight DIV tot")
        )
        .withColumn("rem", F.expr(f"CAST({budget} AS BIGINT) * s_weight % tot"))
        .withColumn("leftover", F.lit(budget) - F.sum("base").over(g))
        .withColumn("rk", F.row_number().over(w))
    )
    return (
        alloc.select(
            "source",
            "n_docs",
            "s_weight",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
        .orderBy("source")
    )


def neyman_allocation_sql(budget: int = NEYMAN_BUDGET) -> str:
    return f"""
        WITH per AS (
            SELECT source, COUNT(*) AS n_docs,
                   SUM(n_chars) AS sx, SUM(n_chars * n_chars) AS sxx
            FROM documents GROUP BY source
        ),
        weighted AS (
            SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(round(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)))
                       AS BIGINT) AS s_weight
            FROM per
        ),
        alloc AS (
            SELECT *,
                   SUM(s_weight) OVER () AS tot,
                   CAST({budget} AS BIGINT) * s_weight
                       // SUM(s_weight) OVER () AS base,
                   CAST({budget} AS BIGINT) * s_weight
                       % SUM(s_weight) OVER () AS rem
            FROM weighted
        ),
        ranked AS (
            SELECT *,
                   {budget} - SUM(base) OVER () AS leftover,
                   ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
            FROM alloc
        )
        SELECT source, n_docs, s_weight,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                   AS BIGINT) AS alloc
        FROM ranked
        ORDER BY source
    """


# --- PPS systematic sampling ---------------------------------------------------

PPS_SAMPLE_N = 50


def pps_systematic(docs: DataFrame, n: int = PPS_SAMPLE_N) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling (the other
    classical survey design beside [[sampling_neyman_allocation]]): units
    sort deterministically (md5 of doc_id — the randomization stand-in),
    sizes (n_chars) accumulate, and unit i is selected iff its cumulative
    interval (cum−size, cum] contains a threshold t_j = j·W DIV n +
    W DIV (2n) — one pass, exactly n selections, inclusion probability
    ∝ size, zero RNG. Output: (doc_id, n_chars, cum_lo, hit_threshold)
    for the selected units.

    Selection is pure integer arithmetic: a unit is selected iff
    floor((cum − offset)·n/W) > floor((cum_prev − offset)·n/W) — cum is a
    running-sum window, the comparison cross-multiplies, nothing divides
    until the pinned floor.

    Scale shape: the running sum is the TWO-LEVEL distributed scan
    (ranks.with_global_running_sum: per-md5-bucket cumulative window +
    bounded bucket-prefix totals) — bit-identical to the naive global
    window with no single-task sort; the grand total rides a broadcast
    1-row cross join; then a narrow filter."""
    from ..ranks import md5_bucket, with_global_running_sum
    from .hashing import md5_int

    h = md5_int(F.col("doc_id").cast("string"))
    cum = with_global_running_sum(
        docs.select("doc_id", "n_chars", h.alias("__h")),
        md5_bucket(F.col("__h")),
        [F.col("__h"), F.col("doc_id")],
        F.col("n_chars"),
        out="cum",
    ).drop("__h")
    tot = docs.agg(F.sum("n_chars").cast("long").alias("tot"))
    cum = cum.crossJoin(F.broadcast(tot))
    # threshold index below a cumulative point x: floor((2*x*n - tot) / (2*tot))
    # (thresholds at (2j+1)*tot/(2n), j = 0..n-1) — computed with a +2*tot
    # shift so the numerator stays positive and integer DIV is a true floor
    # on both engines (the PSI bin-edge lesson: no float ever nears an edge)
    idx = lambda x: F.expr(
        f"CAST((2 * ({x}) * {n} - tot + 2 * tot) DIV (2 * tot) - 1 AS BIGINT)"
    )  # noqa: E731
    sel = (
        cum.withColumn("i_hi", idx("cum"))
        .withColumn("i_lo", idx("(cum - n_chars)"))
        .where(F.col("i_hi") > F.col("i_lo"))
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            (F.col("cum") - F.col("n_chars")).cast("long").alias("cum_lo"),
            (F.col("i_lo") + 1).cast("long").alias("hit_threshold"),
        )
    )
    return sel.orderBy("hit_threshold", "doc_id")


def pps_systematic_sql(n: int = PPS_SAMPLE_N) -> str:
    from .hashing import md5_int_sql

    h = md5_int_sql("CAST(doc_id AS VARCHAR)")
    return f"""
        WITH cum AS (
            SELECT doc_id, n_chars,
                   SUM(n_chars) OVER (
                       ORDER BY {h}, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(n_chars) OVER () AS tot
            FROM documents
        ),
        marked AS (
            SELECT doc_id, n_chars, cum,
                   CAST((2 * cum * {n} - tot + 2 * tot) // (2 * tot) - 1
                       AS BIGINT) AS i_hi,
                   CAST((2 * (cum - n_chars) * {n} - tot + 2 * tot)
                        // (2 * tot) - 1 AS BIGINT) AS i_lo
            FROM cum
        )
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               CAST(cum - n_chars AS BIGINT) AS cum_lo,
               CAST(i_lo + 1 AS BIGINT) AS hit_threshold
        FROM marked
        WHERE i_hi > i_lo
        ORDER BY hit_threshold, doc_id
    """


# --- hash-sampler calibration ------------------------------------------------------

CALIBRATION_RATES_MILLI = (10, 100, 500)


def hash_calibration(docs: DataFrame) -> DataFrame:
    """Calibration audit of the md5-bucket sampler every split/mixture
    op in this module relies on: for each nominal rate, the measured
    keep-rate per source and its absolute error — the evidence that
    content-stable hash sampling actually delivers the rates it
    promises (a skewed key space or a broken hash shows up here first,
    BEFORE a mixture quietly over-serves one source).

    Keep rule: md5_int(doc_id) % 1000 < rate — the same bucket
    arithmetic as split_assign, audited at rates {CALIBRATION_RATES_MILLI}.
    Output per (source, nominal_milli): n_docs, n_kept, measured_milli
    (half-up), abs_err_milli. Exact integers.

    Scale shape: the rate grid is a ≤3-element literal array exploded
    per row — one narrow pass, one (source, rate) aggregate."""
    rates = F.array(*[F.lit(r) for r in CALIBRATION_RATES_MILLI])
    bucket = md5_int(F.col("doc_id").cast("string")) % 1000
    graded = docs.select(
        "source",
        F.explode(rates).alias("nominal_milli"),
        bucket.alias("bucket"),
    )
    return (
        graded.groupBy("source", "nominal_milli")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("bucket") < F.col("nominal_milli"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
        .select(
            "source",
            F.col("nominal_milli").cast("long").alias("nominal_milli"),
            "n_docs",
            "n_kept",
            F.expr(
                "CAST((2000 * n_kept + n_docs) DIV (2 * n_docs) AS BIGINT)"
            ).alias("measured_milli"),
        )
        .withColumn(
            "abs_err_milli",
            F.abs(F.col("measured_milli") - F.col("nominal_milli"))
            .cast("long"),
        )
        .orderBy("source", "nominal_milli")
    )


def hash_calibration_sql() -> str:
    rates = ", ".join(str(r) for r in CALIBRATION_RATES_MILLI)
    bucket = f"({md5_int_sql('CAST(doc_id AS VARCHAR)')} % 1000)"
    return f"""
        WITH graded AS (
            SELECT source, unnest([{rates}]) AS nominal_milli,
                   {bucket} AS bucket
            FROM documents
        ),
        panel AS (
            SELECT source, CAST(nominal_milli AS BIGINT) AS nominal_milli,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN bucket < nominal_milli THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept
            FROM graded GROUP BY 1, 2
        )
        SELECT source, nominal_milli, n_docs, n_kept,
               CAST((2000 * n_kept + n_docs) // (2 * n_docs) AS BIGINT)
                   AS measured_milli,
               CAST(abs((2000 * n_kept + n_docs) // (2 * n_docs)
                        - nominal_milli) AS BIGINT) AS abs_err_milli
        FROM panel
        ORDER BY source, nominal_milli
    """


# --- class-balanced downsampling -----------------------------------------------------


def class_balance(embeddings: DataFrame) -> DataFrame:
    """Class-balanced downsampling plan over a labeled corpus: every
    label keeps exactly the MINORITY class's count, selected by the
    md5-rank order (content-stable — re-runs and backfills pick the
    same rows, unlike random sampling). The majority-class crush that
    otherwise dominates contrastive/classifier training data.

    Output per vector: (vec_id, label, keep) with keep ∈ {0,1}; every
    label's kept count equals min class count.

    Scale shape: one label-keyed rank window over the labeled corpus,
    one bounded label rollup broadcast back; no self-join."""
    counts = embeddings.groupBy("label").agg(F.count("*").alias("n"))
    target = counts.agg(F.min("n").cast("long").alias("target"))
    w = Window.partitionBy("label").orderBy(
        md5_int(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        embeddings.select("vec_id", "label")
        .withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(target))
        .select(
            "vec_id",
            "label",
            (F.col("rk") <= F.col("target")).cast("int").alias("keep"),
        )
        .orderBy("vec_id")
    )


def class_balance_sql() -> str:
    rk = md5_int_sql("CAST(vec_id AS VARCHAR)")
    return f"""
        WITH target AS (
            SELECT CAST(MIN(n) AS BIGINT) AS target FROM (
                SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
            )
        ),
        ranked AS (
            SELECT vec_id, label,
                   row_number() OVER (
                       PARTITION BY label ORDER BY {rk}, vec_id
                   ) AS rk
            FROM embeddings
        )
        SELECT vec_id, label,
               CAST(rk <= (SELECT target FROM target) AS INT) AS keep
        FROM ranked
        ORDER BY vec_id
    """


# --- training manifest ---------------------------------------------------------------


def training_manifest(docs: DataFrame) -> DataFrame:
    """The end-to-end curation MANIFEST — the single artifact a training
    run actually consumes, composing this module's primitives over each
    document in one plan: exact-dedup keep flag (first-occurrence
    fingerprint), soft cluster weight (10⁶ / copies, so duplicate
    content trains at 1× total instead of n×), and the content-stable
    md5 split (train/val/test).

    Output per doc: (doc_id, source, keep, weight_micro, split). The
    three decisions come from ONE fingerprint window and ONE bucket
    expression — auditable row-by-row against dedup_exact,
    dedup_soft_weights and sampling_split_assign individually.

    Scale shape: one fingerprint-keyed window, narrow projections."""
    from .text import _norm as _norm_text

    fpw = Window.partitionBy(F.md5(_norm_text(F.col("text"))))
    bucket = md5_int(F.col("doc_id").cast("string")) % SPLIT_BUCKETS
    return (
        docs.select("doc_id", "source", "text")
        .withColumn("n_copies", F.count("*").over(fpw))
        .withColumn(
            "keep",
            (F.col("doc_id") == F.min("doc_id").over(fpw)).cast("int"),
        )
        .select(
            "doc_id",
            "source",
            "keep",
            F.expr("CAST(1000000 DIV n_copies AS BIGINT)").alias(
                "weight_micro"
            ),
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


def training_manifest_sql() -> str:
    from .text import _norm_sql as norm_sql

    bucket = f"({md5_int_sql('CAST(doc_id AS VARCHAR)')} % {SPLIT_BUCKETS})"
    return f"""
        WITH fp AS (
            SELECT doc_id, source,
                   COUNT(*) OVER (PARTITION BY md5({norm_sql('text')}))
                       AS n_copies,
                   CAST(doc_id = MIN(doc_id) OVER (
                       PARTITION BY md5({norm_sql('text')})) AS INT) AS keep
            FROM documents
        )
        SELECT doc_id, source, keep,
               CAST(1000000 // n_copies AS BIGINT) AS weight_micro,
               CASE WHEN {bucket} < 80 THEN 'train'
                    WHEN {bucket} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM fp
        ORDER BY doc_id
    """


# --- temporal split audit -----------------------------------------------------------

TEMPORAL_SPLIT_DAY = 21  # train: day < 21; test: day >= 21


def temporal_split(events: DataFrame) -> DataFrame:
    """Temporal train/test split audit over the event stream: counts per
    side and the ENTITY-LEAKAGE rate — users appearing on both sides of
    the time boundary. Hash splits (split_assign) guarantee disjoint
    documents; temporal splits guarantee no future leakage but NOT
    disjoint entities, and a model personalizing on user history needs
    to know exactly how much user overlap the split carries.

    Output per event_type: (event_type, train_n, test_n, train_users,
    test_users, overlap_users, overlap_milli) with overlap over the
    test-side users (the contaminated fraction of evaluation).

    Scale shape: one (type, user, side) distinct projection, bounded
    type rollup."""
    sides = events.select(
        "event_type",
        "user_id",
        (F.dayofmonth("ts") >= TEMPORAL_SPLIT_DAY).cast("int").alias("side"),
    )
    counts = sides.groupBy("event_type").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("long")
        .alias("train_n"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("test_n"),
    )
    per_user = sides.distinct().groupBy("event_type", "user_id").agg(
        F.max(F.when(F.col("side") == 0, 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("side") == 1, 1).otherwise(0)).alias("in_test"),
    )
    users = per_user.groupBy("event_type").agg(
        F.sum("in_train").cast("long").alias("train_users"),
        F.sum("in_test").cast("long").alias("test_users"),
        F.sum(F.col("in_train") * F.col("in_test"))
        .cast("long")
        .alias("overlap_users"),
    )
    return (
        counts.join(users, "event_type")
        .withColumn(
            "overlap_milli",
            F.expr(
                "CASE WHEN test_users > 0 THEN"
                " CAST(1000 * overlap_users DIV test_users AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .orderBy("event_type")
    )


TEMPORAL_SPLIT_SQL = f"""
    WITH sides AS (
        SELECT event_type, user_id,
               CAST(dayofmonth(ts) >= {TEMPORAL_SPLIT_DAY} AS INT) AS side
        FROM events
    ),
    counts AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS train_n,
               CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS test_n
        FROM sides GROUP BY event_type
    ),
    per_user AS (
        SELECT event_type, user_id,
               MAX(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS in_train,
               MAX(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS in_test
        FROM (SELECT DISTINCT * FROM sides) GROUP BY 1, 2
    ),
    users AS (
        SELECT event_type,
               CAST(SUM(in_train) AS BIGINT) AS train_users,
               CAST(SUM(in_test) AS BIGINT) AS test_users,
               CAST(SUM(in_train * in_test) AS BIGINT) AS overlap_users
        FROM per_user GROUP BY event_type
    )
    SELECT c.event_type, c.train_n, c.test_n,
           u.train_users, u.test_users, u.overlap_users,
           CASE WHEN u.test_users > 0 THEN
                CAST(1000 * u.overlap_users // u.test_users AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS overlap_milli
    FROM counts c JOIN users u USING (event_type)
    ORDER BY c.event_type
"""


# --- dedup-aware epoch weighting ------------------------------------------------

TARGET_EPOCHS_MILLI = 2000  # train each unique CONTENT ~2 epochs


def dedup_aware_epochs(
    docs: DataFrame, target_epochs_milli: int = TARGET_EPOCHS_MILLI
) -> DataFrame:
    """Per-document training-epoch weights that neutralize duplication: a
    document whose normalized content appears c times in the corpus gets
    weight target/c, so each unique CONTENT is seen ~target epochs however
    many copies survived ingestion (the data-mixture hygiene step between
    dedup and sampling — drop-all-dups loses coverage, keep-all over-trains
    on boilerplate). Output: the per-source rollup consumers actually
    schedule with — (source, docs, unique_docs, max_copies,
    effective_epochs_milli); the doc-grain weights are the intermediate
    ``weighted`` relation.

    Exact integers: weight = target_milli DIV n_copies (floor; NOT a
    double divide — Spark's double→long cast truncates where DuckDB's
    rounds); the rollup divides total weight by doc count at milli.

    Scale shape: one fingerprint hash-groupBy (map-side combined) + one
    fingerprint-keyed join back — the dedup_exact economics; no windows."""
    from .text import _norm

    fp = docs.select(
        "doc_id", "source", F.md5(_norm(F.col("text"))).alias("fingerprint")
    )
    counts = fp.groupBy("fingerprint").agg(
        F.count("*").cast("long").alias("n_copies")
    )
    weighted = fp.join(counts.hint("shuffle_hash"), "fingerprint").select(
        "doc_id",
        "source",
        "n_copies",
        F.expr(f"CAST({target_epochs_milli} DIV n_copies AS BIGINT)").alias(
            "epoch_weight_milli"
        ),
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("docs"),
            F.sum("epoch_weight_milli").cast("long").alias("weight_sum_milli"),
            F.sum(F.when(F.col("n_copies") == 1, 1).otherwise(0))
            .cast("long")
            .alias("unique_docs"),
            F.max("n_copies").cast("long").alias("max_copies"),
        )
        .select(
            "source",
            "docs",
            "unique_docs",
            "max_copies",
            F.expr("CAST(weight_sum_milli DIV docs AS BIGINT)").alias(
                "effective_epochs_milli"
            ),
        )
        .orderBy("source")
    )


def dedup_aware_epochs_sql(
    target_epochs_milli: int = TARGET_EPOCHS_MILLI,
) -> str:
    from .text import _norm_sql

    return f"""
        WITH fp AS (
            SELECT doc_id, source, md5({_norm_sql('text')}) AS fingerprint
            FROM documents
        ),
        counts AS (
            SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM fp GROUP BY 1
        ),
        weighted AS (
            SELECT doc_id, source, n_copies,
                   CAST({target_epochs_milli} // n_copies AS BIGINT)
                       AS epoch_weight_milli
            FROM fp JOIN counts USING (fingerprint)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS docs,
               CAST(SUM(CASE WHEN n_copies = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS unique_docs,
               CAST(MAX(n_copies) AS BIGINT) AS max_copies,
               CAST(SUM(epoch_weight_milli) // COUNT(*) AS BIGINT)
                   AS effective_epochs_milli
        FROM weighted
        GROUP BY source
        ORDER BY source
    """


# --- purged k-fold with embargo (temporal CV) -----------------------------------------

PURGED_K = 5
PURGED_EMBARGO_DAYS = 2


def purged_kfold(
    events: DataFrame, k: int = PURGED_K, embargo_days: int = PURGED_EMBARGO_DAYS
) -> DataFrame:
    """Purged k-fold cross-validation plan over a time-ordered stream
    (the leakage-safe CV for serially-correlated data, à la combinatorial
    purged CV): days split into k CONTIGUOUS folds; each fold's training
    set excludes the test days PLUS an embargo_days buffer on both sides,
    so label lookahead and autocorrelation bleed cannot leak across the
    split. Output per fold: (fold, test_days, test_rows, train_days,
    train_rows, purged_days) — the audit a training pipeline materializes
    before building fold datasets.

    Exact integers: fold assignment is the contiguous-quantile index
    (idx-1)*k DIV n_days over the bounded day grid; all counts are sums.

    Scale shape: one day-grain aggregate; fold ranges are a ≤k-row
    aggregate; the day x fold membership test is a bounded ≤|days|·k
    broadcast join. Event rows are never re-scanned per fold."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("rows")
    )
    nd = daily.agg(F.count("*").cast("long").alias("n_days"))
    wd = Window.orderBy("day")
    idx = (
        daily.crossJoin(F.broadcast(nd))
        .withColumn("idx", F.row_number().over(wd))
        .withColumn("fold", F.expr(f"CAST((idx - 1) * {k} DIV n_days AS INT)"))
        .select("day", "rows", "idx", "fold")
    )
    ranges = idx.groupBy("fold").agg(
        F.min("idx").alias("lo"), F.max("idx").alias("hi")
    )
    marked = idx.select("idx", "rows").crossJoin(F.broadcast(ranges)).select(
        "fold",
        "rows",
        F.when(
            (F.col("idx") >= F.col("lo")) & (F.col("idx") <= F.col("hi")), "test"
        )
        .when(
            (F.col("idx") >= F.col("lo") - embargo_days)
            & (F.col("idx") <= F.col("hi") + embargo_days),
            "purged",
        )
        .otherwise("train")
        .alias("role"),
    )
    return (
        marked.groupBy("fold")
        .agg(
            F.sum(F.when(F.col("role") == "test", 1).otherwise(0))
            .cast("long")
            .alias("test_days"),
            F.sum(F.when(F.col("role") == "test", F.col("rows")).otherwise(0))
            .cast("long")
            .alias("test_rows"),
            F.sum(F.when(F.col("role") == "train", 1).otherwise(0))
            .cast("long")
            .alias("train_days"),
            F.sum(F.when(F.col("role") == "train", F.col("rows")).otherwise(0))
            .cast("long")
            .alias("train_rows"),
            F.sum(F.when(F.col("role") == "purged", 1).otherwise(0))
            .cast("long")
            .alias("purged_days"),
        )
        .orderBy("fold")
    )


def purged_kfold_sql(
    k: int = PURGED_K, embargo_days: int = PURGED_EMBARGO_DAYS
) -> str:
    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS rows_
            FROM events GROUP BY 1
        ),
        nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
        idx AS (
            SELECT day, rows_,
                   row_number() OVER (ORDER BY day) AS idx,
                   CAST((row_number() OVER (ORDER BY day) - 1) * {k}
                        // n_days AS INT) AS fold
            FROM daily CROSS JOIN nd
        ),
        ranges AS (
            SELECT fold, MIN(idx) AS lo, MAX(idx) AS hi FROM idx GROUP BY fold
        ),
        marked AS (
            SELECT r.fold, i.rows_,
                   CASE WHEN i.idx BETWEEN r.lo AND r.hi THEN 'test'
                        WHEN i.idx BETWEEN r.lo - {embargo_days}
                                       AND r.hi + {embargo_days} THEN 'purged'
                        ELSE 'train' END AS role
            FROM idx i CROSS JOIN ranges r
        )
        SELECT fold,
               CAST(SUM(CASE WHEN role = 'test' THEN 1 ELSE 0 END) AS BIGINT)
                   AS test_days,
               CAST(SUM(CASE WHEN role = 'test' THEN rows_ ELSE 0 END) AS BIGINT)
                   AS test_rows,
               CAST(SUM(CASE WHEN role = 'train' THEN 1 ELSE 0 END) AS BIGINT)
                   AS train_days,
               CAST(SUM(CASE WHEN role = 'train' THEN rows_ ELSE 0 END) AS BIGINT)
                   AS train_rows,
               CAST(SUM(CASE WHEN role = 'purged' THEN 1 ELSE 0 END) AS BIGINT)
                   AS purged_days
        FROM marked
        GROUP BY fold
        ORDER BY fold
    """


# --- Horvitz-Thompson estimation over the PPS systematic sample -----------------------


def ht_estimate(docs: DataFrame, n: int = PPS_SAMPLE_N) -> DataFrame:
    """Horvitz-Thompson ratio estimation riding the pps_systematic design:
    estimate the corpus TOTAL WORD COUNT from only the n size-sampled
    documents, weights tot_chars/(n·chars_i) with multiplicity (a unit whose
    size spans k thresholds contributes k times) — the estimator that makes
    unequal-probability sampling actually usable, and the closure check
    that our PPS design is self-weighting (chars-per-word is stable, so the
    HT error should sit within a few percent).

    Output one row: (n_thresholds, sampled_units, true_total_words,
    ht_estimate_words, err_milli). The estimate is the double chain rounded
    at the end (identical in both engines); truth is an exact integer sum.

    Scale shape: the same two-level running-sum device as pps_systematic,
    one narrow word-count projection on the SAMPLED rows only, broadcast
    1-row totals."""
    from ..ranks import md5_bucket, with_global_running_sum
    from .hashing import md5_int

    h = md5_int(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("words"),
        h.alias("__h"),
    )
    cum = with_global_running_sum(
        base,
        md5_bucket(F.col("__h")),
        [F.col("__h"), F.col("doc_id")],
        F.col("n_chars"),
        out="cum",
    ).drop("__h")
    tot = docs.agg(
        F.sum("n_chars").cast("long").alias("tot"),
    )
    idx = lambda x: F.expr(  # noqa: E731
        f"CAST((2 * ({x}) * {n} - tot + 2 * tot) DIV (2 * tot) - 1 AS BIGINT)"
    )
    hits = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("m", idx("cum") - idx("(cum - n_chars)"))
        .where(F.col("m") > 0)
    )
    est = hits.agg(
        F.count("*").cast("long").alias("sampled_units"),
        F.sum("m").cast("long").alias("n_thresholds"),
        F.sum(
            F.col("m").cast("double")
            * F.col("words").cast("double")
            / F.col("n_chars").cast("double")
        ).alias("_wsum"),
        F.max(F.col("tot")).alias("_tot"),
    )
    truth = docs.select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("w")
    ).agg(F.sum("w").cast("long").alias("true_total_words"))
    ht = F.col("_wsum") * F.col("_tot").cast("double") / F.lit(float(n))
    return (
        est.crossJoin(F.broadcast(truth))
        .select(
            "n_thresholds",
            "sampled_units",
            "true_total_words",
            F.round(ht).cast("long").alias("ht_estimate_words"),
            F.round(
                1000.0
                * (ht - F.col("true_total_words").cast("double"))
                / F.col("true_total_words").cast("double")
            )
            .cast("long")
            .alias("err_milli"),
        )
    )


def ht_estimate_sql(n: int = PPS_SAMPLE_N) -> str:
    from .hashing import md5_int_sql

    h = md5_int_sql("CAST(doc_id AS VARCHAR)")
    words = "CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)"
    return f"""
        WITH base AS (
            SELECT doc_id, n_chars, {words} AS words, {h} AS h
            FROM documents
        ),
        cum AS (
            SELECT doc_id, n_chars, words,
                   SUM(n_chars) OVER (ORDER BY h, doc_id ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM base
        ),
        tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tot FROM documents),
        hits AS (
            SELECT words, n_chars, tot,
                   ((2 * cum * {n} - tot + 2 * tot) // (2 * tot) - 1)
                   - ((2 * (cum - n_chars) * {n} - tot + 2 * tot)
                      // (2 * tot) - 1) AS m
            FROM cum CROSS JOIN tot
        ),
        est AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS sampled_units,
                   CAST(SUM(m) AS BIGINT) AS n_thresholds,
                   SUM(m * CAST(words AS DOUBLE) / n_chars) AS wsum,
                   MAX(tot) AS tot
            FROM hits WHERE m > 0
        ),
        truth AS (
            SELECT CAST(SUM({words}) AS BIGINT) AS true_total_words
            FROM documents
        )
        SELECT n_thresholds, sampled_units, true_total_words,
               CAST(round(wsum * tot / {n}.0) AS BIGINT) AS ht_estimate_words,
               CAST(round(1000.0 * (wsum * tot / {n}.0 - true_total_words)
                    / true_total_words) AS BIGINT) AS err_milli
        FROM est CROSS JOIN truth
    """


# --- Kish effective sample size -------------------------------------------------------


def kish_neff(docs: DataFrame, n: int = PPS_SAMPLE_N) -> DataFrame:
    """Kish effective sample size of the pps_systematic design's HT weights:
    one row (sampled_units, n_draws, neff_milli, deff_milli).

    THE one-number diagnostic for any weighted sample: neff =
    (sum m*w)^2 / (sum m*w^2) over the drawn units (multiplicity m for
    units spanning several thresholds), deff = n/neff >= 1 the variance
    inflation vs equal-probability sampling. Closes the design loop the
    module opened: pps_systematic draws, ht_estimate estimates, this
    says how many "equivalent SRS units" the weighted draw is worth.
    Weights use the scale-free w = 1/n_chars form (neff is invariant
    under constant rescaling, so the tot/n factor cancels).

    Scale shape: identical to ht_estimate — the two-level running-sum
    device over the corpus, then all arithmetic on the <= n sampled rows;
    both emits are one double chain over exact integers."""
    from ..ranks import md5_bucket, with_global_running_sum
    from .hashing import md5_int

    h = md5_int(F.col("doc_id").cast("string"))
    base = docs.select("doc_id", "n_chars", h.alias("__h"))
    cum = with_global_running_sum(
        base,
        md5_bucket(F.col("__h")),
        [F.col("__h"), F.col("doc_id")],
        F.col("n_chars"),
        out="cum",
    ).drop("__h")
    tot = docs.agg(F.sum("n_chars").cast("long").alias("tot"))
    idx = lambda x: F.expr(  # noqa: E731
        f"CAST((2 * ({x}) * {n} - tot + 2 * tot) DIV (2 * tot) - 1 AS BIGINT)"
    )
    hits = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("m", idx("cum") - idx("(cum - n_chars)"))
        .where(F.col("m") > 0)
    )
    return hits.agg(
        F.count("*").cast("long").alias("sampled_units"),
        F.sum("m").cast("long").alias("n_draws"),
        F.sum(F.col("m").cast("double") / F.col("n_chars").cast("double")).alias(
            "_sw"
        ),
        F.sum(
            F.col("m").cast("double")
            / (F.col("n_chars").cast("double") * F.col("n_chars").cast("double"))
        ).alias("_sw2"),
    ).select(
        "sampled_units",
        "n_draws",
        F.expr(
            "CAST(CASE WHEN _sw2 > 0"
            " THEN round(1000.0 * _sw * _sw / _sw2) ELSE 0 END AS BIGINT)"
        ).alias("neff_milli"),
        F.expr(
            "CAST(CASE WHEN _sw > 0"
            " THEN round(1000.0 * n_draws * _sw2 / (_sw * _sw))"
            " ELSE 0 END AS BIGINT)"
        ).alias("deff_milli"),
    )


def kish_neff_sql(n: int = PPS_SAMPLE_N) -> str:
    from .hashing import md5_int_sql

    h = md5_int_sql("CAST(doc_id AS VARCHAR)")
    return f"""
        WITH base AS (
            SELECT doc_id, n_chars, {h} AS h FROM documents
        ),
        cum AS (
            SELECT doc_id, n_chars,
                   SUM(n_chars) OVER (ORDER BY h, doc_id ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM base
        ),
        tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tot FROM documents),
        hits AS (
            SELECT n_chars,
                   ((2 * cum * {n} - tot + 2 * tot) // (2 * tot) - 1)
                   - ((2 * (cum - n_chars) * {n} - tot + 2 * tot)
                      // (2 * tot) - 1) AS m
            FROM cum CROSS JOIN tot
        ),
        est AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS sampled_units,
                   CAST(SUM(m) AS BIGINT) AS n_draws,
                   SUM(m * 1.0 / n_chars) AS sw,
                   SUM(m * 1.0 / (CAST(n_chars AS DOUBLE) * n_chars)) AS sw2
            FROM hits WHERE m > 0
        )
        SELECT sampled_units, n_draws,
               CAST(CASE WHEN sw2 > 0
                    THEN round(1000.0 * sw * sw / sw2) ELSE 0 END AS BIGINT)
                   AS neff_milli,
               CAST(CASE WHEN sw > 0
                    THEN round(1000.0 * n_draws * sw2 / (sw * sw))
                    ELSE 0 END AS BIGINT) AS deff_milli
        FROM est
    """


# --- Raking (iterative proportional fitting) ----------------------------------------------------

RAKE_CHARS_MIN = 500  # the "kept" curation subsample being calibrated
RAKE_CYCLES = 3


def raking_ipf(docs: DataFrame, chars_min: int = RAKE_CHARS_MIN) -> DataFrame:
    """Rake the long-document subsample back to the full corpus margins:
    rows (lang, source, n_kept, weight_micro) ordered by (lang, source).

    A curation cut (n_chars >= chars_min) distorts the corpus mix —
    some (lang, source) cells survive disproportionately. Raking / IPF
    is the standard survey fix: iteratively scale each cell weight so
    the weighted lang margins, then the weighted source margins, match
    the FULL corpus counts; after a few cycles the kept sample
    reweights to the original two-way mix without estimating the full
    joint. Three row+column cycles unrolled (the fast-converging
    regime for near-separable tables); sampling_mixture_weighted
    rebalances ONE margin — this is the two-margin generalization.

    Exactness: cell counts and corpus margins are exact BIGINTs;
    weights re-quantize to integer micro after EVERY scaling step (the
    eigenvector-centrality discipline), so each step is an exact
    integer aggregate in both engines and the result is bit-stable.

    Scale shape: two margin aggregates + one (lang, source) cell
    aggregate; each iteration is a partitioned window re-sum on the
    bounded <=|langs|x|sources| grid — nothing data-sized past the
    first shuffles."""
    kept = (
        docs.where(F.col("n_chars") >= chars_min)
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("n_kept"))
    )
    t_lang = docs.groupBy("lang").agg(F.count("*").cast("long").alias("t_l"))
    t_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("t_s")
    )
    cells = (
        kept.join(F.broadcast(t_lang), "lang")
        .join(F.broadcast(t_src), "source")
        .select(
            "lang",
            "source",
            "n_kept",
            "t_l",
            "t_s",
            F.lit(1000000).cast("long").alias("w"),
        )
    )
    for _ in range(RAKE_CYCLES):
        for margin, target in (("lang", "t_l"), ("source", "t_s")):
            wm = Window.partitionBy(margin)
            cells = (
                cells.withColumn(
                    "__s",
                    F.sum(F.col("w") * F.col("n_kept")).over(wm).cast("long"),
                )
                .withColumn(
                    "w",
                    F.expr(
                        f"CAST(CASE WHEN __s > 0 THEN round(CAST(w AS DOUBLE)"
                        f" * {target} * 1e6 / __s) ELSE w END AS BIGINT)"
                    ),
                )
                .drop("__s")
            )
    return cells.select(
        "lang",
        "source",
        "n_kept",
        F.col("w").alias("weight_micro"),
    ).orderBy("lang", "source")


def raking_ipf_sql(chars_min: int = RAKE_CHARS_MIN) -> str:
    its = [
        """it0 AS (
            SELECT lang, source, n_kept, t_l, t_s,
                   CAST(1000000 AS BIGINT) AS w
            FROM kept JOIN t_lang USING (lang) JOIN t_src USING (source)
        )"""
    ]
    k = 0
    for _ in range(RAKE_CYCLES):
        for margin, target in (("lang", "t_l"), ("source", "t_s")):
            k += 1
            its.append(
                f"""it{k} AS (
            SELECT lang, source, n_kept, t_l, t_s,
                   CAST(CASE WHEN SUM(w * n_kept) OVER (PARTITION BY {margin})
                        > 0 THEN round(CAST(w AS DOUBLE) * {target} * 1e6
                        / SUM(w * n_kept) OVER (PARTITION BY {margin}))
                        ELSE w END AS BIGINT) AS w
            FROM it{k - 1}
        )"""
            )
    chain = ",\n        ".join(its)
    return f"""
        WITH kept AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM documents WHERE n_chars >= {chars_min}
            GROUP BY lang, source
        ),
        t_lang AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS t_l
            FROM documents GROUP BY lang
        ),
        t_src AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS t_s
            FROM documents GROUP BY source
        ),
        {chain}
        SELECT lang, source, n_kept, w AS weight_micro
        FROM it{k}
        ORDER BY lang, source
    """


# --- Delete-one-day jackknife of the ratio estimator --------------------------------------------


def jackknife_ratio_daily(events: DataFrame) -> DataFrame:
    """Delete-one-day jackknife variance of the purchase/click ratio:
    one row (n_days, ratio_micro, se_jack_micro).

    The conversion ratio R = sum(purchases)/sum(clicks) is a RATIO of
    correlated day totals — its naive binomial SE is wrong whenever
    days are the real sampling unit (campaign days shift both counts
    together). The delete-one-group jackknife is the standard
    design-based fix: R_(-j) over each left-out day, var = (n-1)/n *
    sum (R_(-j) - Rbar)^2; sampling_design_effect diagnoses clustering,
    this PRICES it into an honest SE.

    Exactness: day totals and the leave-one-out numerators/denominators
    are exact BIGINTs; each replicate ratio quantizes to micro before
    the integer sum/sum-of-squares (HUGEINT/decimal cube guard); the
    (n-1)/n variance closes in one double chain.

    Scale shape: one (day) aggregate, one 1-row totals broadcast over
    the bounded <=366-day grid, one bounded reduction."""
    per_day = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("c"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("p"),
    )
    tot = per_day.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum("p").cast("long").alias("sp"),
    )
    reps = per_day.crossJoin(F.broadcast(tot)).select(
        "n",
        "sc",
        "sp",
        F.expr(
            "CAST(CASE WHEN sc - c > 0 THEN round(1e6"
            " * CAST(sp - p AS DOUBLE) / (sc - c)) ELSE 0 END AS BIGINT)"
        ).alias("r_micro"),
    )
    agg = reps.groupBy("n", "sc", "sp").agg(
        F.sum("r_micro").cast("long").alias("sr"),
        F.sum(F.col("r_micro").cast("decimal(38,0)") * F.col("r_micro"))
        .cast("decimal(38,0)")
        .alias("srr"),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.expr(
            "CAST(CASE WHEN sc > 0 THEN round(1e6 * CAST(sp AS DOUBLE) / sc)"
            " ELSE 0 END AS BIGINT)"
        ).alias("ratio_micro"),
        F.expr(
            "CAST(CASE WHEN n > 1 AND CAST(srr AS DOUBLE)"
            "     - CAST(sr AS DOUBLE) * sr / n > 0e0"
            " THEN round(sqrt((CAST(n AS DOUBLE) - 1) / n"
            "  * (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n)))"
            " ELSE 0 END AS BIGINT)"
        ).alias("se_jack_micro"),
    )


def jackknife_ratio_daily_sql() -> str:
    return """
        WITH per_day AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END) AS BIGINT) AS p
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS sc,
                   CAST(SUM(p) AS BIGINT) AS sp
            FROM per_day
        ),
        reps AS (
            SELECT n, sc, sp,
                   CAST(CASE WHEN sc - c > 0 THEN round(1e6
                        * CAST(sp - p AS DOUBLE) / (sc - c))
                        ELSE 0 END AS BIGINT) AS r_micro
            FROM per_day CROSS JOIN tot
        ),
        agg AS (
            SELECT n, sc, sp,
                   CAST(SUM(r_micro) AS BIGINT) AS sr,
                   SUM(CAST(r_micro AS HUGEINT) * r_micro) AS srr
            FROM reps GROUP BY n, sc, sp
        )
        SELECT n AS n_days,
               CAST(CASE WHEN sc > 0 THEN round(1e6 * CAST(sp AS DOUBLE) / sc)
                    ELSE 0 END AS BIGINT) AS ratio_micro,
               CAST(CASE WHEN n > 1 AND CAST(srr AS DOUBLE)
                         - CAST(sr AS DOUBLE) * sr / n > 0e0
                    THEN round(sqrt((CAST(n AS DOUBLE) - 1) / n
                     * (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n)))
                    ELSE 0 END AS BIGINT) AS se_jack_micro
        FROM agg
    """


# --- UniMax budget allocation ---------------------------------------------------------

UNIMAX_EPOCH_CAP = 4
UNIMAX_BUDGET_X_MILLI = 2000  # budget = 2x the corpus token count


def unimax_allocation(
    docs: DataFrame,
    epoch_cap: int = UNIMAX_EPOCH_CAP,
    budget_x_milli: int = UNIMAX_BUDGET_X_MILLI,
) -> DataFrame:
    """UniMax multilingual budget allocation (Chung et al., ICLR 2023):
    spread a token budget as uniformly as possible across languages, capping
    each at ``epoch_cap`` epochs of its corpus — the water-filling rule that
    replaced temperature sampling for multilingual pretraining mixes.
    Budget = ``budget_x_milli``/1000 × total corpus tokens.

    Exact waterline: languages sorted by capacity ascending; a language is
    capacity-capped while c_k·(langs remaining) < budget remaining (checked
    in exact integer cross-multiplication — no division), the rest split the
    leftover evenly with the remainder going to the smallest languages first.
    Everything is BIGINT; Σ alloc == min(budget, Σ capacity) by construction.

    Output per language: (lang, n_tokens, capacity, alloc_tokens,
    epochs_milli). Scale: one token-count aggregate; the waterfill runs on
    the |langs|-row relation."""
    per_lang = (
        docs.select(
            "lang",
            F.size(
                F.filter(
                    F.split(F.trim("text"), r"\s+"),
                    lambda w: w != F.lit(""),
                )
            ).cast("long").alias("toks"),
        )
        .groupBy("lang")
        .agg(F.sum("toks").alias("n_tokens"))
        .select(
            "lang",
            "n_tokens",
            (F.col("n_tokens") * epoch_cap).alias("capacity"),
        )
    )
    tot = per_lang.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").cast("long").alias("k"),
    ).select(
        "k",
        F.expr(
            f"CAST((2 * {budget_x_milli} * total_tokens + 1000)"
            " DIV 2000 AS BIGINT)"
        ).alias("budget"),
    )
    w_asc = Window.orderBy(F.col("capacity").asc(), F.col("lang").asc())
    ranked = (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "*",
            F.row_number().over(w_asc).cast("long").alias("rn"),
            F.coalesce(
                F.sum("capacity").over(
                    w_asc.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("cum_before"),
        )
        .withColumn(
            "raw_capped",
            F.col("capacity") * (F.col("k") - F.col("rn") + 1)
            < F.col("budget") - F.col("cum_before"),
        )
    )
    boundary = ranked.agg(
        F.min(F.when(~F.col("raw_capped"), F.col("rn"))).alias("b_rn")
    )
    flagged = ranked.crossJoin(F.broadcast(boundary)).withColumn(
        "capped", F.col("b_rn").isNotNull() & (F.col("rn") < F.col("b_rn"))
    )
    capped_tot = flagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("capacity"))), F.lit(0)
        ).alias("capped_sum"),
        F.sum((~F.col("capped")).cast("long")).alias("n_open"),
    )
    return (
        flagged.crossJoin(F.broadcast(capped_tot))
        .select(
            "lang",
            "n_tokens",
            "capacity",
            F.when(F.col("capped"), F.col("capacity"))
            .when(
                F.col("n_open") > 0,
                F.least(
                    F.col("capacity"),
                    F.expr(
                        "(budget - capped_sum) DIV n_open"
                        " + CASE WHEN rn - (k - n_open) <="
                        " (budget - capped_sum) % n_open THEN 1 ELSE 0 END"
                    ),
                ),
            )
            .otherwise(F.col("capacity"))
            .cast("long")
            .alias("alloc_tokens"),
        )
        .withColumn(
            "epochs_milli",
            F.expr(
                "CASE WHEN n_tokens > 0 THEN CAST((2 * 1000 * alloc_tokens"
                " + n_tokens) DIV (2 * n_tokens) AS BIGINT) ELSE 0 END"
            ),
        )
        .orderBy("lang")
    )


def unimax_allocation_sql(
    epoch_cap: int = UNIMAX_EPOCH_CAP,
    budget_x_milli: int = UNIMAX_BUDGET_X_MILLI,
    docs_rel: str = "documents",
) -> str:
    return f"""
    WITH per_lang AS (
        SELECT lang,
               CAST(SUM(len(list_filter(string_split_regex(trim(text),
                   '\\s+'), w -> w <> ''))) AS BIGINT) AS n_tokens
        FROM {docs_rel} GROUP BY lang
    ),
    caps AS (
        SELECT lang, n_tokens, n_tokens * {epoch_cap} AS capacity
        FROM per_lang
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST((2 * {budget_x_milli} * SUM(n_tokens) + 1000) // 2000
                    AS BIGINT) AS budget
        FROM caps
    ),
    ranked AS (
        SELECT c.*, t.k, t.budget,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(COALESCE(SUM(capacity) OVER (
                   ORDER BY capacity ASC, lang ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
        FROM caps c CROSS JOIN tot t
        WINDOW w AS (ORDER BY capacity ASC, lang ASC)
    ),
    cond AS (
        SELECT *,
               capacity * (k - rn + 1) < budget - cum_before AS raw_capped
        FROM ranked
    ),
    boundary AS (
        SELECT MIN(CASE WHEN NOT raw_capped THEN rn END) AS b_rn FROM cond
    ),
    flagged AS (
        SELECT c.*, (b.b_rn IS NOT NULL AND c.rn < b.b_rn) AS capped
        FROM cond c CROSS JOIN boundary b
    ),
    open_tot AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN capped THEN capacity END), 0)
                    AS BIGINT) AS capped_sum,
               CAST(SUM(CASE WHEN capped THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_open
        FROM flagged
    )
    SELECT f.lang, f.n_tokens, f.capacity,
           CAST(CASE
               WHEN f.capped THEN f.capacity
               WHEN o.n_open > 0 THEN LEAST(f.capacity,
                   (f.budget - o.capped_sum) // o.n_open
                   + CASE WHEN f.rn - (f.k - o.n_open)
                          <= (f.budget - o.capped_sum) % o.n_open
                     THEN 1 ELSE 0 END)
               ELSE f.capacity
           END AS BIGINT) AS alloc_tokens,
           CASE WHEN f.n_tokens > 0 THEN
               CAST((2 * 1000 * (CASE
                   WHEN f.capped THEN f.capacity
                   WHEN o.n_open > 0 THEN LEAST(f.capacity,
                       (f.budget - o.capped_sum) // o.n_open
                       + CASE WHEN f.rn - (f.k - o.n_open)
                              <= (f.budget - o.capped_sum) % o.n_open
                         THEN 1 ELSE 0 END)
                   ELSE f.capacity END) + f.n_tokens)
                   // (2 * f.n_tokens) AS BIGINT)
           ELSE 0 END AS epochs_milli
    FROM flagged f CROSS JOIN open_tot o
    ORDER BY f.lang
    """
