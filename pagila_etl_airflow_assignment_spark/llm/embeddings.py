"""Embedding-column analytics: per-label centroids and distance-to-centroid
outlier detection over the `embeddings` table (`array<float>` columns).

The quality-audit step of an embedding pipeline (and the E-step of IVF/k-means
training): compute each label's mean vector, then score every vector by its
Euclidean distance to its own centroid; the farthest are mislabeled/garbage
candidates.

Scale design — NO vector ever passes through Python and NO driver-side
centroid state:

- `posexplode` flattens vectors to (label, pos, x) rows; centroid = one hash
  aggregate keyed (label, pos). Output is |labels| x dim rows — tiny — so the
  centroid table is BROADCAST back to the exploded fact for the distance sum.
  Two shuffles total ((label,pos) agg, then (vec_id) re-agg), both map-side
  partial-agg'd; 100 TB of vectors stream through without materializing any
  per-label array in one place.
- The alternative — `F.aggregate` over zipped arrays against a collected
  centroid map — puts centroids on the driver; this formulation keeps the
  whole computation declarative and cluster-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUTLIER_TOP_K = 5


def label_centroids_long(embeddings: DataFrame) -> DataFrame:
    """Per-label mean vector in LONG form: (label, pos, c). pos is 1-based to
    match SQL generate_subscripts."""
    exploded = embeddings.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    )
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(F.avg("x").alias("c"))
    )


def centroid_outliers(
    embeddings: DataFrame, top_k: int = OUTLIER_TOP_K
) -> DataFrame:
    """Top-k vectors per label by Euclidean distance to the label centroid."""
    exploded = embeddings.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    ).withColumn("pos", F.col("pos0") + 1)
    cents = label_centroids_long(embeddings)
    dists = (
        exploded.join(F.broadcast(cents), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(F.sum(F.pow(F.col("x") - F.col("c"), F.lit(2)))), 6
            ).alias("dist")
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist").desc(), F.col("vec_id").asc()
    )
    return (
        dists.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= top_k)
        .orderBy("label", "rnk")
    )


def centroid_outliers_sql(top_k: int = OUTLIER_TOP_K) -> str:
    return f"""
    WITH exploded AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    cents AS (
        SELECT label, pos, AVG(x) AS c
        FROM exploded GROUP BY label, pos
    ),
    dists AS (
        SELECT e.vec_id, e.label,
               round(sqrt(SUM(power(e.x - c.c, 2))), 6) AS dist
        FROM exploded e JOIN cents c ON e.label = c.label AND e.pos = c.pos
        GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, dist,
           CAST(rnk AS INT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY label ORDER BY dist DESC, vec_id ASC
        ) AS rnk
        FROM dists
    )
    WHERE rnk <= {top_k}
    ORDER BY label, rnk
    """


# --- k-means refinement step --------------------------------------------------

KMEANS_K = 8


def kmeans_assignment(embeddings: DataFrame, k: int = KMEANS_K) -> DataFrame:
    """Deterministic one-shot k-means assignment: md5-ordered seed centroids
    (no RNG), nearest seed by cosine with a 9-dp round before the argmax so
    both engines resolve near-ties identically. Returns (centroid_id, vec_id,
    embedding) — the shared front half of kmeans_step and the external
    cluster-validation queries."""
    from .dedup import _dot, _l2norm
    from .hashing import md5_int

    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    seeds = (
        corpus.withColumn("ck", md5_int(F.col("vec_id").cast("string")))
        .orderBy("ck", "vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
            F.col("nrm").alias("c_nrm"),
        )
    )
    return (
        corpus.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "embedding",
            "centroid_id",
            # rounded before the argmax: the oracle computes the same cosine
            # with a different engine (list_cosine_similarity), so a near-tie
            # between centroids could otherwise flip assignment between the two
            # forms; at 9 dp both sides see identical values and the
            # centroid_id tiebreak decides ties identically
            F.round(
                _dot(F.col("embedding"), F.col("c_emb"))
                / (F.col("nrm") * F.col("c_nrm")),
                9,
            ).alias("c_sim"),
        )
        .groupBy("vec_id")
        .agg(
            F.max(F.struct("c_sim", "centroid_id")).alias("best"),
            F.first("embedding").alias("embedding"),
        )
        .select(F.col("best.centroid_id").alias("centroid_id"), "vec_id", "embedding")
    )


def kmeans_step(embeddings: DataFrame, k: int = KMEANS_K) -> DataFrame:
    """One Lloyd iteration from the md5-ordered deterministic seed centroids
    (the refinement pass the IVF index's docstring promises): assign every
    vector to its nearest seed by cosine (argmax affinity, ties to larger
    centroid_id — Spark max-struct order), then emit the refined centroids
    as LONG-form (centroid_id, pos, c_new) plus member counts.

    Scale: the seed set is tiny and broadcast; assignment is one narrow pass
    over the corpus; the mean is a (centroid_id, pos) keyed aggregate after
    posexplode — two map-side-combined shuffles total per iteration, no
    driver-side vectors. Long-form output avoids array re-assembly and is
    exactly what the next iteration's broadcast join consumes."""
    assignment = kmeans_assignment(embeddings, k)
    exploded = assignment.select(
        "centroid_id", "vec_id", F.posexplode("embedding").alias("pos0", "x")
    )
    return (
        exploded.groupBy("centroid_id", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.round(F.avg("x"), 6).alias("c_new"),
            F.count_distinct("vec_id").cast("long").alias("n_members"),
        )
        .orderBy("centroid_id", "pos")
    )


def kmeans_assignment_ctes(k: int = KMEANS_K) -> str:
    """The seeds/affinity/assignment CTE chain (no WITH keyword) shared by
    every oracle that consumes the deterministic one-shot assignment."""
    from .hashing import md5_int_sql

    return f"""seeds AS (
        SELECT vec_id AS centroid_id, embedding AS c_emb
        FROM embeddings
        ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
        LIMIT {k}
    ),
    affinity AS (
        SELECT e.vec_id, e.embedding, s.centroid_id,
               round(list_cosine_similarity(
                   e.embedding::DOUBLE[], s.c_emb::DOUBLE[]), 9) AS c_sim
        FROM embeddings e CROSS JOIN seeds s
    ),
    assignment AS (
        SELECT centroid_id, vec_id, embedding
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY c_sim DESC, centroid_id DESC
            ) AS rn
            FROM affinity
        ) WHERE rn = 1
    )"""


def kmeans_step_sql(k: int = KMEANS_K) -> str:
    return f"""
    WITH {kmeans_assignment_ctes(k)},
    exploded AS (
        SELECT centroid_id, vec_id,
               generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM assignment
    )
    SELECT centroid_id, pos,
           round(AVG(x), 6) AS c_new,
           COUNT(DISTINCT vec_id) AS n_members
    FROM exploded
    GROUP BY centroid_id, pos
    ORDER BY centroid_id, pos
    """


# --- scalar int8 quantization -------------------------------------------------


def quantize_int8(vectors: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x| / 127, q_i =
    round(x_i / scale). The 4x storage cut every 100 TB ANN index takes
    before sharding; kept entirely in JVM array expressions (transform /
    aggregate folds), no Python.

    All arithmetic is done in double on both engines (the float4 inputs are
    widened first) so the rounding boundary is computed on identical values.
    Zero vectors emit scale 0 and an all-zero q (guarded division).

    Certified output form: ``q`` is CSV-joined (driver hasher rejects ARRAY
    cells) and ``scale`` is emitted in nano-units as an exact BIGINT —
    round-to-integer of a bit-identical double is engine-stable, while
    ``round(x, 9)`` is not (Spark rounds the shortest-decimal repr via
    BigDecimal, DuckDB multiplies in binary)."""
    xd = F.transform("embedding", lambda x: x.cast("double"))
    amax = F.array_max(F.transform(xd, F.abs))
    scale = (amax / F.lit(127.0)).alias("scale")
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("__xd"), lambda x: F.round(x / F.col("scale")).cast("int")
        ),
    ).otherwise(F.transform(F.col("__xd"), lambda x: F.lit(0)))
    return (
        vectors.select("vec_id", xd.alias("__xd"), scale)
        .select(
            "vec_id",
            F.round(F.col("scale") * F.lit(1e9)).cast("long").alias("scale_nano"),
            q.alias("q"),
        )
        .select(
            "vec_id",
            "scale_nano",
            F.array_join("q", ",").alias("q"),
            F.aggregate(
                "q", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
            ).alias("q_l1"),
        )
        .orderBy("vec_id")
    )


QUANTIZE_INT8_SQL = """
    WITH widened AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
        FROM embeddings
    ), scaled AS (
        SELECT vec_id, xd,
               list_aggregate(list_transform(xd, x -> abs(x)), 'max') / 127.0
                   AS scale
        FROM widened
    )
    SELECT vec_id,
           CAST(round(scale * 1e9) AS BIGINT) AS scale_nano,
           array_to_string(
               CASE WHEN scale > 0
                    THEN list_transform(xd, x -> CAST(round(x / scale) AS INT))
                    ELSE list_transform(xd, x -> 0)
               END, ',') AS q,
           CASE WHEN scale > 0
                THEN CAST(list_sum(list_transform(xd,
                         x -> abs(CAST(round(x / scale) AS INT)))) AS BIGINT)
                ELSE CAST(0 AS BIGINT)
           END AS q_l1
    FROM scaled
    ORDER BY vec_id
"""


# --- random projection (Johnson-Lindenstrauss) --------------------------------

RP_IN_DIM = 64
RP_OUT_DIM = 16


def _rp_sign_matrix(out_dim: int = RP_OUT_DIM, in_dim: int = RP_IN_DIM):
    """Deterministic ±1 projection matrix (Achlioptas 2003 sign variant),
    derived from md5 so both engines embed the SAME constants — the matrix is
    a fixed artifact of the pipeline, never a runtime random draw (a runtime
    draw would make the projection irreproducible across backfills)."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"rp_{i}_{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]


def random_projection(vectors: DataFrame, out_dim: int = RP_OUT_DIM) -> DataFrame:
    """Project 64-dim embeddings to ``out_dim`` via the ±1 sign matrix scaled
    by 1/√out_dim — the Johnson-Lindenstrauss distance-preserving reduction
    that cuts ANN/cosine costs 4× while keeping pairwise geometry to ~1±ε.

    All-JVM narrow plan (zero shuffles): per output coordinate, a left-to-
    right zip_with/aggregate fold over the input array. Determinism: the fold
    multiplies float32 inputs (cast exactly to double) by integer signs and
    adds in ascending index order — the oracle's list_sum walks the same
    order, so every output coordinate is bit-identical; the final scale
    divides by √16 = 4 (exact).

    Certified output form: each coordinate is scaled to micro-units and
    rounded to an exact BIGINT (round-to-integer of bit-identical doubles is
    engine-stable), then CSV-joined — the driver's value-hasher rejects
    ARRAY cells, and float-array stringification differs across engines
    while integer strings do not."""
    mat = _rp_sign_matrix(out_dim)
    rows = F.array(*[F.array(*[F.lit(s) for s in row]) for row in mat])
    proj = F.transform(
        rows,
        lambda row: F.round(
            F.aggregate(
                F.zip_with(F.col("embedding"), row, lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            / F.lit(float(out_dim) ** 0.5)
            * F.lit(1e6)
        ).cast("long"),
    )
    return vectors.select(
        "vec_id", F.array_join(proj, ",").alias("projected_micro")
    ).orderBy("vec_id")


def random_projection_sql(out_dim: int = RP_OUT_DIM) -> str:
    mat = _rp_sign_matrix(out_dim)
    coords = ",\n                   ".join(
        "CAST(round(list_sum(list_transform(range(1, %d), j -> CAST(embedding[j] AS DOUBLE) * ([%s])[j])) / %r * 1e6) AS BIGINT)"
        % (RP_IN_DIM + 1, ", ".join(str(s) for s in row), float(out_dim) ** 0.5)
        for row in mat
    )
    return f"""
        SELECT vec_id, array_to_string([{coords}], ',') AS projected_micro
        FROM embeddings
        ORDER BY vec_id
    """


# --- product quantization -----------------------------------------------------

PQ_SUBSPACES = 8  # 64 dims -> 8 subvectors of 8
PQ_CODEBOOK = 16  # centroids per subspace -> 4-bit codes


def product_quantization(
    vectors: DataFrame, m_sub: int = PQ_SUBSPACES, k_codes: int = PQ_CODEBOOK
) -> DataFrame:
    """Product-quantization codes (Jégou et al., TPAMI 2011): each vector
    compresses to ``m_sub`` 4-bit codebook indices — 64 floats → 8 half-byte
    codes, the 64× memory cut that makes billion-vector ANN indexes fit RAM.

    Codebooks are md5-ordered corpus samples per subspace (the IVF centroid
    treatment — deterministic, no k-means dependency; a Lloyd refinement is
    embedding_kmeans_step's job). The codebook relation is m_sub·k_codes
    rows, broadcast; assignment is one min-struct aggregate per (vector,
    subspace); distances fold sub-slices left-to-right (bit-identical on
    both engines) and are nano-scaled to exact BIGINTs before the argmin so
    both engines pick identical codes; the quantization error is then an
    exact integer sum (order-independent). Certified output form: ``codes``
    CSV-joined (driver hasher rejects ARRAY cells), error in nano-units."""
    from .hashing import md5_int

    codebook = (
        vectors.orderBy(md5_int(F.col("vec_id").cast("string")), "vec_id")
        .limit(k_codes)
        .select(
            F.row_number()
            .over(Window.orderBy(md5_int(F.col("vec_id").cast("string")), "vec_id"))
            .alias("code"),
            "embedding",
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.col("code"),
                            F.slice("embedding", m * 8 + 1, 8).alias("c_sub"),
                        )
                        for m in range(m_sub)
                    ]
                )
            ).alias("cb")
        )
        .select("cb.m", "cb.code", "cb.c_sub")
    )
    subs = vectors.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("embedding", m * 8 + 1, 8).alias("sub"),
                    )
                    for m in range(m_sub)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.m", "s.sub")
    dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("sub"),
                F.col("c_sub"),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        * F.lit(1e9)
    ).cast("long")
    assigned = (
        subs.join(F.broadcast(codebook), "m")
        .select("vec_id", "m", F.struct(dist.alias("d"), F.col("code")).alias("cand"))
        .groupBy("vec_id", "m")
        .agg(F.min("cand").alias("best"))
    )
    return (
        assigned.groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("m", F.col("best.code").alias("code")))
            ).alias("mc"),
            F.array_sort(
                F.collect_list(F.struct("m", F.col("best.d").alias("d")))
            ).alias("md"),
        )
        .select(
            "vec_id",
            F.array_join(
                F.transform(F.col("mc"), lambda s: s["code"]), ","
            ).alias("codes"),
            F.aggregate(
                F.transform(F.col("md"), lambda s: s["d"]),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).alias("quant_error_nano"),
        )
        .orderBy("vec_id")
    )


def product_quantization_sql(
    m_sub: int = PQ_SUBSPACES, k_codes: int = PQ_CODEBOOK
) -> str:
    from .hashing import md5_int_sql

    return f"""
        WITH sampled AS (
            SELECT ROW_NUMBER() OVER (
                       ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
                   ) AS code, embedding
            FROM embeddings
            ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
            LIMIT {k_codes}
        ), codebook AS (
            SELECT m, code, embedding[m * 8 + 1 : m * 8 + 8] AS c_sub
            FROM sampled, (SELECT unnest(range(0, {m_sub})) AS m)
        ), subs AS (
            SELECT vec_id, m, embedding[m * 8 + 1 : m * 8 + 8] AS sub
            FROM embeddings, (SELECT unnest(range(0, {m_sub})) AS m)
        ), scored AS (
            SELECT vec_id, s.m,
                   CAST(round(list_sum(list_transform(range(1, 9),
                       i -> (CAST(sub[i] AS DOUBLE) - CAST(c_sub[i] AS DOUBLE))
                            * (CAST(sub[i] AS DOUBLE) - CAST(c_sub[i] AS DOUBLE)))) * 1e9) AS BIGINT)
                       AS d,
                   code
            FROM subs s JOIN codebook c ON s.m = c.m
        ), best AS (
            SELECT vec_id, m,
                   MIN(struct_pack(d := d, code := code)) AS b
            FROM scored GROUP BY vec_id, m
        )
        SELECT vec_id,
               array_to_string(list(b.code ORDER BY m), ',') AS codes,
               CAST(list_sum(list(b.d ORDER BY m)) AS BIGINT) AS quant_error_nano
        FROM best
        GROUP BY vec_id
        ORDER BY vec_id
    """


# --- embedding-space health profile -------------------------------------------

SIM_PROFILE_BINS = 20


def _md5_pair_sides(vectors: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The deterministic md5-rank pairing used by similarity_profile and
    matryoshka_quality: rank the corpus by (md5(vec_id), vec_id), pair even
    rank with the following odd rank. The rank is computed with the
    two-level device (ranks.with_global_row_number) — within-md5-bucket
    window + bounded bucket prefix — producing the SAME ranks as a global
    Window.orderBy without ever materializing the corpus in one task."""
    from ..ranks import md5_bucket, with_global_row_number
    from .hashing import md5_int

    h = md5_int(F.col("vec_id").cast("string"))
    ranked = with_global_row_number(
        vectors.select("vec_id", "embedding", h.alias("__h")),
        md5_bucket(F.col("__h")),
        [F.col("__h"), F.col("vec_id")],
        out="__rn",
    ).select("vec_id", "embedding", (F.col("__rn") - 1).alias("rk"))
    lo = ranked.where(F.col("rk") % 2 == 0).select(
        (F.col("rk") / 2).cast("long").alias("pair_id"),
        F.col("embedding").alias("emb_a"),
    )
    hi = ranked.where(F.col("rk") % 2 == 1).select(
        ((F.col("rk") - 1) / 2).cast("long").alias("pair_id"),
        F.col("embedding").alias("emb_b"),
    )
    return lo, hi


def similarity_profile(
    vectors: DataFrame, n_bins: int = SIM_PROFILE_BINS
) -> DataFrame:
    """Histogram of cosine similarity over a deterministic pseudo-random
    pairing of the corpus — the embedding-space health check (a collapsed
    encoder shows mass piled at cosine ≈ 1; healthy spaces spread): each
    vector pairs with its md5-rank neighbor (even rank = left, odd = right),
    giving |corpus|/2 disjoint pairs with no self-join fan-out and no
    driver-side count.

    The md5-order rank is the TWO-LEVEL global row_number (ranks.py:
    within-bucket window + bounded bucket-prefix counts), so no single task
    ever holds the corpus — bit-identical to the naive global window; one
    equi-join on the pair index, narrow cosine folds, one ≤n_bins-row
    aggregate. No sampling randomness: backfills reproduce the identical
    profile."""
    lo, hi = _md5_pair_sides(vectors)
    dot = F.aggregate(
        F.zip_with(
            F.col("emb_a"), F.col("emb_b"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )
    cos = F.round(dot / (nrm(F.col("emb_a")) * nrm(F.col("emb_b"))), 9)
    binned = (
        lo.join(hi, "pair_id")
        .select(
            F.least(
                F.floor((cos + 1.0) / 2.0 * n_bins).cast("int"), F.lit(n_bins - 1)
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n_pairs"))
    )
    return binned.select(
        "bin",
        F.round(F.col("bin") * 2.0 / n_bins - 1.0, 6).alias("cos_lo"),
        F.round((F.col("bin") + 1) * 2.0 / n_bins - 1.0, 6).alias("cos_hi"),
        "n_pairs",
    ).orderBy("bin")


def similarity_profile_sql(n_bins: int = SIM_PROFILE_BINS) -> str:
    from .hashing import md5_int_sql

    dot = (
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.emb_a[i] AS DOUBLE) * CAST(b.emb_b[i] AS DOUBLE)))"
    )
    nrm = lambda side, col: (
        f"sqrt(list_sum(list_transform(range(1, 65), "
        f"i -> CAST({side}.{col}[i] AS DOUBLE) * CAST({side}.{col}[i] AS DOUBLE))))"
    )
    return f"""
        WITH ranked AS (
            SELECT vec_id, embedding,
                   ROW_NUMBER() OVER (
                       ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
                   ) - 1 AS rk
            FROM embeddings
        ), lo AS (
            SELECT rk // 2 AS pair_id, embedding AS emb_a
            FROM ranked WHERE rk % 2 = 0
        ), hi AS (
            SELECT (rk - 1) // 2 AS pair_id, embedding AS emb_b
            FROM ranked WHERE rk % 2 = 1
        ), cosined AS (
            SELECT LEAST(CAST(FLOOR((round({dot}
                       / ({nrm('a', 'emb_a')} * {nrm('b', 'emb_b')}), 9) + 1.0)
                       / 2.0 * {n_bins}) AS INT), {n_bins - 1}) AS bin
            FROM lo a JOIN hi b USING (pair_id)
        )
        SELECT bin,
               round(bin * 2.0 / {n_bins} - 1.0, 6) AS cos_lo,
               round((bin + 1) * 2.0 / {n_bins} - 1.0, 6) AS cos_hi,
               COUNT(*) AS n_pairs
        FROM cosined
        GROUP BY bin
        ORDER BY bin
    """


# --- semantic dedup (SemDeDup) --------------------------------------------------

SEMDEDUP_CENTROIDS = 16
SEMDEDUP_TAU = 0.35


def semantic_dedup(
    vectors: DataFrame,
    n_centroids: int = SEMDEDUP_CENTROIDS,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster the embedding space coarsely,
    then WITHIN each cluster drop every vector that is cosine-≥ ``tau`` to a
    better-ranked member — semantic near-duplicates that byte/shingle dedup
    can never see (paraphrases, translations, re-renders).

    Spark shape: the IVF treatment end to end — md5-ordered deterministic
    centroid sample (no RNG; Lloyd refinement is embedding_kmeans_step's
    job), broadcast centroid assignment via max-struct, then a per-cluster
    self-join on the rank-ordered members (quadratic ONLY within a cluster —
    cluster sizes are |corpus|/n_centroids by construction, the same bound
    IVF search rides). Rank = closeness to the assigned centroid (6-dp
    rounded, vec_id tiebreak) so "keep the most central representative" is
    deterministic on both engines.

    Output: one row per vector — its cluster, rank, and kept/pruned verdict.
    ``kept`` is FALSE iff some lower-rank member of the same cluster scores
    cosine ≥ tau against it."""
    from .hashing import md5_int

    corpus = vectors.select(
        "vec_id",
        "embedding",
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        ).alias("nrm"),
    )
    centroids = (
        corpus.withColumn("ck", md5_int(F.col("vec_id").cast("string")))
        .orderBy("ck", "vec_id")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_emb"),
            F.col("nrm").alias("c_nrm"),
        )
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("c_emb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    assigned = (
        corpus.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            "centroid_id",
            # 9-dp rounded before the argmax (the kmeans_step treatment) so a
            # near-tie between centroids resolves identically on both engines
            F.round(dot / (F.col("nrm") * F.col("c_nrm")), 9).alias("c_sim"),
        )
        .groupBy("vec_id")
        .agg(
            F.first("embedding").alias("embedding"),
            F.first("nrm").alias("nrm"),
            F.max(F.struct("c_sim", "centroid_id")).alias("best"),
        )
        .select(
            "vec_id",
            "embedding",
            "nrm",
            F.col("best.centroid_id").alias("centroid_id"),
            F.col("best.c_sim").alias("c_sim"),
        )
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("c_sim").desc(), F.col("vec_id").asc()
    )
    ranked = assigned.withColumn("c_rank", F.row_number().over(w))
    lo = ranked.select(
        "centroid_id",
        F.col("c_rank").alias("rank_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    hi = ranked.select(
        "centroid_id",
        F.col("vec_id").alias("vec_b"),
        F.col("c_rank").alias("rank_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pair_cos = F.round(
        F.aggregate(
            F.zip_with(
                F.col("emb_a"),
                F.col("emb_b"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        / (F.col("nrm_a") * F.col("nrm_b")),
        6,
    )
    pruned = (
        lo.join(hi, "centroid_id")
        .where(F.col("rank_a") < F.col("rank_b"))
        .where(pair_cos >= F.lit(tau))
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        ranked.join(pruned.withColumn("__pruned", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            "c_rank",
            F.coalesce(~F.col("__pruned"), F.lit(True)).alias("kept"),
        )
        .orderBy("vec_id")
    )


def semantic_dedup_sql(
    n_centroids: int = SEMDEDUP_CENTROIDS, tau: float = SEMDEDUP_TAU
) -> str:
    from .hashing import md5_int_sql

    return f"""
        WITH centroids AS (
            SELECT vec_id AS centroid_id, embedding AS c_emb
            FROM embeddings
            ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
            LIMIT {n_centroids}
        ), affinity AS (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                c.c_emb::DOUBLE[]), 9) AS c_sim
            FROM embeddings e CROSS JOIN centroids c
        ), assigned AS (
            SELECT vec_id, embedding, centroid_id, c_sim
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY c_sim DESC, centroid_id DESC
                ) AS rn
                FROM affinity
            ) WHERE rn = 1
        ), ranked AS (
            SELECT vec_id, embedding, centroid_id,
                   CAST(row_number() OVER (
                       PARTITION BY centroid_id
                       ORDER BY c_sim DESC, vec_id ASC
                   ) AS INT) AS c_rank
            FROM assigned
        ), pruned AS (
            SELECT DISTINCT b.vec_id
            FROM ranked a JOIN ranked b USING (centroid_id)
            WHERE a.c_rank < b.c_rank
              AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 6) >= {tau}
        )
        SELECT r.vec_id, r.centroid_id, r.c_rank,
               p.vec_id IS NULL AS kept
        FROM ranked r LEFT JOIN pruned p ON r.vec_id = p.vec_id
        ORDER BY r.vec_id
    """


# --- per-dimension corpus statistics --------------------------------------------


def dimension_stats(vectors: DataFrame) -> DataFrame:
    """Per-dimension corpus statistics (mean / variance in exact micro-units):
    the whitening/normalization diagnostic every embedding pipeline runs
    before indexing — a dead dimension (var ≈ 0) or a runaway one (mean far
    off 0) flags an encoder or ingestion fault.

    Exactness: each float32 component is quantized once to micro-units
    (exact BIGINT), so Σx and Σx² are order-free integer sums; mean and
    variance are then single divisions of identical exact operands,
    round-to-integer emitted. One (pos)-keyed map-side-combined aggregate
    over the posexploded corpus — the label_centroids_long shuffle shape.
    At 10⁹+ vectors the long Σx² upgrades to DECIMAL(38,0) in place."""
    exploded = vectors.select(
        F.posexplode("embedding").alias("pos0", "x")
    ).select(
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * F.lit(1e6)).cast("long").alias("xm"),
    )
    agg = exploded.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.sum("xm").alias("s"),
        F.sum(F.col("xm") * F.col("xm")).alias("ss"),
    )
    return agg.select(
        "pos",
        "n",
        F.round(F.col("s") / F.col("n")).cast("long").alias("mean_micro"),
        # var = (n·Σx² − (Σx)²) / n² in micro² units, integer-rounded
        F.round(
            (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
            / (F.col("n") * F.col("n"))
        )
        .cast("long")
        .alias("var_micro2"),
    ).orderBy("pos")


DIMENSION_STATS_SQL = """
    WITH exploded AS (
        SELECT generate_subscripts(embedding, 1) AS pos,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
                   AS xm
        FROM embeddings
    ), agg AS (
        SELECT pos, COUNT(*) AS n,
               CAST(SUM(xm) AS BIGINT) AS s,
               CAST(SUM(xm * xm) AS BIGINT) AS ss
        FROM exploded GROUP BY pos
    )
    SELECT pos, n,
           CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT) AS mean_micro,
           CAST(round(CAST(n * ss - s * s AS DOUBLE) / (n * n)) AS BIGINT)
               AS var_micro2
    FROM agg
    ORDER BY pos
"""


# --- Matryoshka truncation quality ----------------------------------------------

MRL_WIDTHS = (8, 16, 32)


def matryoshka_quality(
    vectors: DataFrame, widths: tuple[int, ...] = MRL_WIDTHS
) -> DataFrame:
    """Truncation-quality profile for Matryoshka-style dimensionality cuts:
    over the deterministic md5-rank pairing of the corpus (the
    similarity_profile treatment — |corpus|/2 disjoint pairs, no self-join),
    compare each pair's FULL-width cosine with its first-``w``-dims cosine
    and report, per width, the mean/max absolute error in milli-units plus
    the mean retained energy ‖x[:w]‖²/‖x‖². This is the go/no-go table for
    serving a truncated index: if cos₈ tracks cos₆₄ within a few milli, the
    8-dim index is 8× cheaper at negligible recall cost.

    Exactness: per-pair errors quantize to exact integers (round of
    bit-identical double folds), so all aggregates are order-free integer
    sums; per-width output is ≤|widths| rows. Pairing rides the two-level
    rank device (no single-task window), same as similarity_profile."""
    lo, hi = _md5_pair_sides(vectors)

    from .dedup import _cosine as cos  # dot/( ‖a‖·‖b‖ ) — the op order DuckDB's
    # list_cosine_similarity reproduces bit-for-bit (dedup.py:680)

    def energy(v, width):
        full = F.aggregate(
            F.transform(v, lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
        part = F.aggregate(
            F.transform(F.slice(v, 1, width), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
        return part / full

    pairs = lo.join(hi, "pair_id")
    per_width = [
        pairs.select(
            F.lit(width).alias("width"),
            F.round(
                F.abs(
                    cos(F.slice("emb_a", 1, width), F.slice("emb_b", 1, width))
                    - cos(F.col("emb_a"), F.col("emb_b"))
                )
                * 1000
            )
            .cast("long")
            .alias("abs_err_milli"),
            F.round(
                (energy(F.col("emb_a"), width) + energy(F.col("emb_b"), width))
                / 2
                * 1000
            )
            .cast("long")
            .alias("energy_milli"),
        )
        for width in widths
    ]
    union = per_width[0]
    for df in per_width[1:]:
        union = union.unionByName(df)
    return (
        union.groupBy("width")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.sum("abs_err_milli") / F.count("*")).cast("long").alias(
                "mean_abs_err_milli"
            ),
            F.max("abs_err_milli").alias("max_abs_err_milli"),
            F.round(F.sum("energy_milli") / F.count("*")).cast("long").alias(
                "mean_energy_milli"
            ),
        )
        .orderBy("width")
    )


def matryoshka_quality_sql(widths: tuple[int, ...] = MRL_WIDTHS) -> str:
    from .hashing import md5_int_sql

    def one(width: int) -> str:
        return f"""
            SELECT {width} AS width,
                   CAST(round(ABS(
                       list_cosine_similarity(emb_a[1:{width}]::DOUBLE[],
                                              emb_b[1:{width}]::DOUBLE[])
                       - list_cosine_similarity(emb_a::DOUBLE[],
                                                emb_b::DOUBLE[])) * 1000)
                       AS BIGINT) AS abs_err_milli,
                   CAST(round((
                       list_sum(list_transform(emb_a[1:{width}],
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                       / list_sum(list_transform(emb_a,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                     + list_sum(list_transform(emb_b[1:{width}],
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                       / list_sum(list_transform(emb_b,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                   ) / 2 * 1000) AS BIGINT) AS energy_milli
            FROM pairs
        """

    body = "\n            UNION ALL\n".join(one(w) for w in widths)
    return f"""
        WITH ranked AS (
            SELECT vec_id, embedding,
                   row_number() OVER (
                       ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
                   ) - 1 AS rk
            FROM embeddings
        ), lo AS (
            SELECT CAST(rk / 2 AS BIGINT) AS pair_id, embedding AS emb_a
            FROM ranked WHERE rk % 2 = 0
        ), hi AS (
            SELECT CAST((rk - 1) / 2 AS BIGINT) AS pair_id, embedding AS emb_b
            FROM ranked WHERE rk % 2 = 1
        ), pairs AS (
            SELECT emb_a, emb_b FROM lo JOIN hi USING (pair_id)
        ), per_width AS (
            {body}
        )
        SELECT width,
               COUNT(*) AS n_pairs,
               CAST(round(CAST(SUM(abs_err_milli) AS DOUBLE) / COUNT(*))
                   AS BIGINT) AS mean_abs_err_milli,
               MAX(abs_err_milli) AS max_abs_err_milli,
               CAST(round(CAST(SUM(energy_milli) AS DOUBLE) / COUNT(*))
                   AS BIGINT) AS mean_energy_milli
        FROM per_width
        GROUP BY width
        ORDER BY width
    """


# --- multi-iteration Lloyd refinement ---------------------------------------------

KMEANS_ITERS = 3


def kmeans_lloyd(
    embeddings: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """``iters`` chained Lloyd iterations from the md5-ordered seeds — the
    converging refinement loop kmeans_step's docstring promises, as ONE
    declarative plan (fixed iteration count, the pagerank treatment; for
    unbounded convergence swap in the dedup_clusters scalar-probe loop).

    Cross-engine exactness by construction: centroids live in exact integer
    MICRO-units (each float32 component quantizes once; means are
    round(Σ/ n) of integer sums — order-free), and cosine is scale-invariant
    so the integer centroids feed the next assignment without
    rescaling. Every iteration is one broadcast-assignment pass + one
    (centroid, pos)-keyed aggregate; the k-row centroid relation reassembles
    to arrays via a sorted per-centroid collect — no driver-side state."""
    corpus = embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("xd"),
    ).select(
        "vec_id",
        "xd",
        F.sqrt(
            F.aggregate(F.col("xd"), F.lit(0.0), lambda a, x: a + x * x)
        ).alias("nrm"),
    )
    from .hashing import md5_int

    cents = (
        corpus.withColumn("ck", md5_int(F.col("vec_id").cast("string")))
        .orderBy("ck", "vec_id")
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy(md5_int(F.col("vec_id").cast("string")), "vec_id"))
            .alias("centroid_id"),
            F.transform(
                "xd", lambda x: F.round(x * F.lit(1e6)).cast("long")
            ).alias("c_micro"),
        )
    )
    for _ in range(iters):
        cd = F.transform("c_micro", lambda c: c.cast("double"))
        dot = F.aggregate(
            F.zip_with(F.col("xd"), cd, lambda x, c: x * c),
            F.lit(0.0),
            lambda a, t: a + t,
        )
        cnrm = F.sqrt(
            F.aggregate(cd, F.lit(0.0), lambda a, c: a + c * c)
        )
        assigned = (
            corpus.crossJoin(F.broadcast(cents))
            .select(
                "vec_id",
                "xd",
                "centroid_id",
                F.round(dot / (F.col("nrm") * cnrm), 9).alias("c_sim"),
            )
            .groupBy("vec_id")
            .agg(
                F.max(F.struct("c_sim", "centroid_id")).alias("best"),
                F.first("xd").alias("xd"),
            )
            .select(F.col("best.centroid_id").alias("centroid_id"), "vec_id", "xd")
        )
        long_form = assigned.select(
            "centroid_id",
            F.posexplode(
                F.transform("xd", lambda x: F.round(x * F.lit(1e6)).cast("long"))
            ).alias("pos0", "xm"),
        )
        cents = (
            long_form.groupBy("centroid_id", F.col("pos0").alias("pos0"))
            .agg(
                F.round(F.sum("xm") / F.count("*")).cast("long").alias("c"),
                F.count("*").alias("n"),
            )
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos0", F.col("c")))
                    ),
                    lambda s: s["c"],
                ).alias("c_micro"),
                F.first("n").alias("n_members"),
            )
        )
    return (
        cents.select(
            "centroid_id",
            F.posexplode("c_micro").alias("pos0", "c_micro"),
        )
        .select(
            "centroid_id",
            (F.col("pos0") + 1).alias("pos"),
            "c_micro",
        )
        .orderBy("centroid_id", "pos")
    )


def kmeans_lloyd_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    from .hashing import md5_int_sql

    def one_iter(i: int) -> str:
        prev = f"cents{i - 1}"
        return f"""assigned{i} AS (
            SELECT centroid_id, vec_id, xd
            FROM (
                SELECT c.centroid_id, e.vec_id, e.xd,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round(
                               list_dot_product(e.xd,
                                   list_transform(c.c_micro, v -> CAST(v AS DOUBLE)))
                               / (sqrt(list_sum(list_transform(e.xd, x -> x * x)))
                                  * sqrt(list_sum(list_transform(c.c_micro,
                                        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))),
                               9) DESC,
                               c.centroid_id DESC
                       ) AS rn
                FROM corpus e CROSS JOIN {prev} c
            ) WHERE rn = 1
        ), lf{i} AS (
            SELECT centroid_id,
                   generate_subscripts(xd, 1) AS pos,
                   CAST(round(unnest(xd) * 1e6) AS BIGINT) AS xm
            FROM assigned{i}
        ), cl{i} AS (
            SELECT centroid_id, pos,
                   CAST(round(CAST(SUM(xm) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c,
                   COUNT(*) AS n
            FROM lf{i} GROUP BY centroid_id, pos
        ), cents{i} AS (
            SELECT centroid_id,
                   list(c ORDER BY pos) AS c_micro,
                   ANY_VALUE(n) AS n_members
            FROM cl{i} GROUP BY centroid_id
        )"""

    chain = ",\n        ".join(one_iter(i) for i in range(1, iters + 1))
    return f"""
        WITH corpus AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
            FROM embeddings
        ), cents0 AS (
            SELECT row_number() OVER (
                       ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
                   ) AS centroid_id,
                   list_transform(xd, x -> CAST(round(x * 1e6) AS BIGINT))
                       AS c_micro
            FROM (
                SELECT vec_id, xd FROM corpus
                ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
                LIMIT {k}
            )
        ),
        {chain}
        SELECT centroid_id,
               generate_subscripts(c_micro, 1) AS pos,
               unnest(c_micro) AS c_micro
        FROM cents{iters}
        ORDER BY centroid_id, pos
    """


# --- farthest-point (k-center) coreset sampling ---------------------------------

KCENTER_ROUNDS = 5


def kcenter_coreset(
    embeddings: DataFrame, rounds: int = KCENTER_ROUNDS
) -> DataFrame:
    """Farthest-point (greedy k-center) coreset selection: start from the
    smallest vec_id, then ``rounds - 1`` times pick the point farthest (max
    min-distance) from everything selected so far — the classic 2-approx
    k-center rule used for diverse training-data subset selection; each
    selection's ``min_d2`` is the coverage radius the NEXT round improves,
    so the output doubles as the radius-vs-k curve.

    Cross-engine exactness by construction (the kmeans_lloyd treatment):
    coordinates quantize ONCE to integer micro-units, so every squared
    distance is an exact BIGINT (max |diff| ~2e7 -> 64 * 4e14 well inside
    int64) and the argmax has a deterministic (min_d2 DESC, vec_id) total
    order. Each round is one broadcast of the <= ``rounds``-row selected
    relation against the corpus (map-side min combine, so the exchange
    carries one row per vec_id), one top-1, and one broadcast equi-join to
    recover the winner's vector; ``localCheckpoint`` per round keeps the
    unioned selected relation's lineage flat instead of 2^rounds deep."""
    xm_rel = embeddings.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * F.lit(1e6)).cast("long"),
        ).alias("xm"),
    )
    selected = (
        xm_rel.orderBy("vec_id")
        .limit(1)
        .select(
            F.lit(1).alias("sel_round"),
            "vec_id",
            "xm",
            F.lit(0).cast("long").alias("min_d2"),
        )
        .localCheckpoint()
    )
    d2 = F.aggregate(
        F.zip_with(F.col("xm"), F.col("s_xm"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    for r in range(2, rounds + 1):
        winner = (
            xm_rel.crossJoin(F.broadcast(selected.select(F.col("xm").alias("s_xm"))))
            .select("vec_id", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("min_d2"))
            .orderBy(F.desc("min_d2"), "vec_id")
            .limit(1)
        )
        nxt = xm_rel.join(F.broadcast(winner), "vec_id").select(
            F.lit(r).alias("sel_round"), "vec_id", "xm", "min_d2"
        )
        selected = selected.unionAll(nxt).localCheckpoint()
    return selected.select("sel_round", "vec_id", "min_d2").orderBy("sel_round")


def kcenter_coreset_sql(rounds: int = KCENTER_ROUNDS, dim: int = RP_IN_DIM) -> str:
    parts = [
        f"""
    WITH xm AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xm
        FROM embeddings
    ),
    sel1 AS (
        SELECT vec_id, xm FROM xm ORDER BY vec_id LIMIT 1
    )"""
    ]
    for r in range(2, rounds + 1):
        parts.append(
            f""",
    m{r} AS (
        SELECT x.vec_id,
               MIN(list_sum(list_transform(range(1, {dim + 1}),
                   j -> (x.xm[j] - s.xm[j]) * (x.xm[j] - s.xm[j])))) AS min_d2
        FROM xm x CROSS JOIN sel{r - 1} s
        GROUP BY x.vec_id
    ),
    w{r} AS (
        SELECT m.vec_id, x.xm, CAST(m.min_d2 AS BIGINT) AS min_d2
        FROM m{r} m JOIN xm x USING (vec_id)
        ORDER BY m.min_d2 DESC, m.vec_id LIMIT 1
    ),
    sel{r} AS (
        SELECT vec_id, xm FROM sel{r - 1} UNION ALL SELECT vec_id, xm FROM w{r}
    )"""
        )
    finals = " UNION ALL ".join(
        ["SELECT 1 AS sel_round, vec_id, CAST(0 AS BIGINT) AS min_d2 FROM sel1"]
        + [
            f"SELECT {r} AS sel_round, vec_id, min_d2 FROM w{r}"
            for r in range(2, rounds + 1)
        ]
    )
    return "".join(parts) + f"\n    {finals}\n    ORDER BY sel_round"


# --- labeled-clustering silhouette eval -----------------------------------------


def cluster_silhouette(embeddings: DataFrame) -> DataFrame:
    """Centroid-silhouette evaluation of the label partition: every vector's
    margin = cos(v, own centroid) − max cos(v, other centroid); per label
    the mean margin and the count of negative margins (vectors sitting
    closer to a foreign centroid — the misclustering signal). This is the
    clustering-quality harness (simplified silhouette: centroid distances
    instead of the quadratic pairwise form, the standard large-scale
    substitute).

    Exactness: coordinates quantize once to integer micro-units and
    centroids are round(Σ/n) integer means (the kmeans_lloyd contract);
    cosines round at 6 dp then quantize to exact micro ints, so margins,
    sums, and the signed half-up milli means are bit-stable. Plan: one
    long-form centroid aggregate (k×dim rows, broadcast), one pos-keyed
    join with map-side partial dot-product aggregation (the exchange
    carries (vec, label) partials, never the pos fan-out), one label
    aggregate."""
    xm = embeddings.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * F.lit(1e6)).cast("long"),
            )
        ).alias("pos0", "xm"),
    ).withColumn("pos", F.col("pos0") + 1)
    cents = (
        xm.groupBy(F.col("label").alias("label_c"), "pos")
        .agg(
            F.expr("CAST(round(CAST(SUM(xm) AS DOUBLE) / COUNT(*)) AS BIGINT)")
            .alias("cm")
        )
    )
    cnorm = cents.groupBy("label_c").agg(
        F.sqrt(F.sum(F.col("cm") * F.col("cm")).cast("double")).alias("cn")
    )
    vnorm = xm.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("xm") * F.col("xm")).cast("double")).alias("vn")
    )
    cos_micro = F.expr("CAST(round(round(dot / (vn * cn), 6) * 1e6) AS BIGINT)")
    sims = (
        xm.join(F.broadcast(cents), "pos")
        .groupBy("vec_id", "label", "label_c")
        .agg(F.sum(F.col("xm") * F.col("cm")).cast("double").alias("dot"))
        .join(vnorm, "vec_id")
        .join(F.broadcast(cnorm), "label_c")
        .select("vec_id", "label", "label_c", cos_micro.alias("cos_micro"))
    )
    margins = (
        sims.groupBy("vec_id", "label")
        .agg(
            F.max(F.when(F.col("label_c") == F.col("label"), F.col("cos_micro")))
            .alias("own"),
            F.max(F.when(F.col("label_c") != F.col("label"), F.col("cos_micro")))
            .alias("other"),
        )
        .select("label", (F.col("own") - F.col("other")).alias("m"))
    )
    return (
        margins.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("m").alias("sm"),
            F.sum((F.col("m") < 0).cast("int")).cast("long").alias("n_negative"),
        )
        .select(
            "label",
            "n_vecs",
            F.expr(
                "CAST(CASE WHEN sm < 0 THEN -1 ELSE 1 END"
                " * ((2 * abs(sm) + n_vecs) DIV (2 * n_vecs)) AS BIGINT)"
            ).alias("mean_margin_micro"),
            "n_negative",
        )
        .orderBy("label")
    )


CLUSTER_SILHOUETTE_SQL = """
    WITH xm AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
                   AS xm
        FROM embeddings
    ),
    cents AS (
        SELECT label AS label_c, pos,
               CAST(round(CAST(SUM(xm) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cm
        FROM xm GROUP BY label, pos
    ),
    cnorm AS (
        SELECT label_c, sqrt(CAST(SUM(cm * cm) AS DOUBLE)) AS cn
        FROM cents GROUP BY label_c
    ),
    vnorm AS (
        SELECT vec_id, sqrt(CAST(SUM(xm * xm) AS DOUBLE)) AS vn
        FROM xm GROUP BY vec_id
    ),
    sims AS (
        SELECT d.vec_id, d.label, d.label_c,
               CAST(round(round(d.dot / (v.vn * c.cn), 6) * 1e6) AS BIGINT)
                   AS cos_micro
        FROM (
            SELECT x.vec_id, x.label, c.label_c,
                   CAST(SUM(x.xm * c.cm) AS DOUBLE) AS dot
            FROM xm x JOIN cents c USING (pos)
            GROUP BY x.vec_id, x.label, c.label_c
        ) d
        JOIN vnorm v ON v.vec_id = d.vec_id
        JOIN cnorm c ON c.label_c = d.label_c
    ),
    margins AS (
        SELECT label,
               MAX(CASE WHEN label_c = label THEN cos_micro END)
                 - MAX(CASE WHEN label_c <> label THEN cos_micro END) AS m
        FROM sims GROUP BY vec_id, label
    )
    SELECT label, COUNT(*) AS n_vecs,
           CAST(CASE WHEN SUM(m) < 0 THEN -1 ELSE 1 END
                * ((2 * abs(SUM(m)) + COUNT(*)) // (2 * COUNT(*)))
                AS BIGINT) AS mean_margin_micro,
           CAST(SUM(CASE WHEN m < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative
    FROM margins
    GROUP BY label
    ORDER BY label
"""


# --- distributed PCA: top component via power iteration --------------------------

PCA_ITERS = 3


def pca_power_iteration(
    embeddings: DataFrame, iters: int = PCA_ITERS
) -> DataFrame:
    """Top principal direction of the (uncentered) second-moment matrix via
    ``iters`` power iterations WITHOUT materializing the d×d covariance:
    v ← normalize(Σᵢ xᵢ (xᵢ·v)) — each iteration is one corpus pass of
    per-row dot products plus a pos-keyed integer aggregate, the
    map-reduce PCA step that scales to any corpus (covariance assembly is
    the thing you cannot do at 100 TB; matrix-free iteration is the
    standard out).

    Cross-engine exactness: v lives in integer MICRO units; each per-row
    contribution x_ij·(xᵢ·v) rounds ONCE to an exact BIGINT (order-free
    integer sums — never a distributed float sum), and the renormalization
    derives from deterministic scalar doubles over those exact integers.
    Output: (pos, v_micro) for the unit direction (64 rows) plus the
    per-component Rayleigh quotient share."""
    xd = embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("xd"),
    ).localCheckpoint(eager=False)
    dim_rel = xd.select(F.posexplode("xd").alias("pos0", "x")).select(
        (F.col("pos0") + 1).alias("pos")
    ).distinct()
    v = dim_rel.select(
        "pos",
        F.when(F.col("pos") == 1, F.lit(1_000_000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("vm"),
    ).localCheckpoint()
    for _ in range(iters):
        varr = v.orderBy("pos").agg(
            F.collect_list(F.struct("pos", "vm")).alias("s")
        ).select(
            F.transform(F.array_sort("s"), lambda t: t["vm"].cast("double")).alias(
                "va"
            )
        )
        dot = F.aggregate(
            F.zip_with(F.col("xd"), F.col("va"), lambda x, w: x * w),
            F.lit(0.0),
            lambda a, t: a + t,
        )
        # dot is hoisted into its own projection BEFORE the explode: inside
        # the Generate node it would re-evaluate the 64-element fold once per
        # EMITTED row (64x redundant work — measured 21.6 s -> 3.8 s at 10x)
        y = (
            xd.crossJoin(F.broadcast(varr))
            .select("xd", dot.alias("dot"))
            .select(F.posexplode("xd").alias("pos0", "x"), "dot")
            .select(
                (F.col("pos0") + 1).alias("pos"),
                F.round(F.col("x") * F.col("dot")).cast("long").alias("t"),
            )
            .groupBy("pos")
            .agg(F.sum("t").alias("y"))
        )
        nrm = y.agg(
            F.sqrt(F.sum(F.col("y").cast("double") * F.col("y"))).alias("nrm")
        )
        v = (
            y.crossJoin(F.broadcast(nrm))
            .select(
                "pos",
                F.expr("CAST(round(1e6 * CAST(y AS DOUBLE) / nrm) AS BIGINT)")
                .alias("vm"),
            )
            .localCheckpoint()
        )
    return v.select("pos", "vm").orderBy("pos")


def pca_power_iteration_sql(iters: int = PCA_ITERS, dim: int = RP_IN_DIM) -> str:
    parts = [
        f"""
    WITH xd AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
        FROM embeddings
    ),
    v0 AS (
        SELECT i AS pos,
               CAST(CASE WHEN i = 1 THEN 1000000 ELSE 0 END AS BIGINT) AS vm
        FROM range(1, {dim + 1}) t(i)
    )"""
    ]
    for r in range(1, iters + 1):
        parts.append(
            f""",
    va{r} AS (
        SELECT list(CAST(vm AS DOUBLE) ORDER BY pos) AS va FROM v{r - 1}
    ),
    y{r} AS (
        SELECT pos,
               CAST(SUM(CAST(round(x * dot) AS BIGINT)) AS BIGINT) AS y
        FROM (
            SELECT generate_subscripts(d.xd, 1) AS pos,
                   unnest(d.xd) AS x,
                   list_sum(list_transform(range(1, {dim + 1}),
                       j -> d.xd[j] * a.va[j])) AS dot
            FROM xd d CROSS JOIN va{r} a
        )
        GROUP BY pos
    ),
    n{r} AS (
        SELECT sqrt(SUM(CAST(y AS DOUBLE) * y)) AS nrm FROM y{r}
    ),
    v{r} AS (
        SELECT pos, CAST(round(1e6 * CAST(y AS DOUBLE) / nrm) AS BIGINT) AS vm
        FROM y{r}, n{r}
    )"""
        )
    return "".join(parts) + f"""
    SELECT pos, vm FROM v{iters} ORDER BY pos
    """


# --- centroid drift monitoring -------------------------------------------------------


def centroid_drift(embeddings: DataFrame) -> DataFrame:
    """Embedding-distribution drift per label between two content-stable
    halves of the corpus (vec_id parity as the batch proxy): (label, n0, n1,
    l1_drift_micro, max_drift_micro).

    The ML-ops monitor for "did the embedding distribution move?": per
    label, the L1 and max component shift between the halves' centroids.
    Components quantize ONCE to integer micro units, so the sums are
    order-independent and the centroids are exact half-up integers — unlike
    a float mean, bit-stable under any partitioning (and any engine).

    Scale shape: one (label, half, pos) aggregate over the exploded
    components; everything after is |labels|×dim arithmetic."""
    exploded = embeddings.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos0", "x"),
    ).select(
        "label",
        "half",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)").alias("q"),
    )
    cents = exploded.groupBy("label", "half", "pos").agg(
        F.sum("q").alias("s"), F.count("*").alias("n")
    ).select(
        "label",
        "half",
        "pos",
        "n",
        F.expr(
            "CAST(SIGN(s) * ((2 * ABS(s) + n) DIV (2 * n)) AS BIGINT)"
        ).alias("c"),
    )
    c0 = cents.where(F.col("half") == 0).select(
        "label", "pos", F.col("c").alias("c0"), F.col("n").alias("n0")
    )
    c1 = cents.where(F.col("half") == 1).select(
        "label", "pos", F.col("c").alias("c1"), F.col("n").alias("n1")
    )
    return (
        c0.join(c1, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.max("n0").alias("n0"),
            F.max("n1").alias("n1"),
            F.sum(F.abs(F.col("c0") - F.col("c1"))).alias("l1_drift_micro"),
            F.max(F.abs(F.col("c0") - F.col("c1"))).alias("max_drift_micro"),
        )
        .orderBy("label")
    )


def centroid_drift_sql() -> str:
    return """
        WITH exploded AS (
            SELECT label, vec_id % 2 AS half,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                        AS BIGINT) AS q
            FROM embeddings
        ),
        cents AS (
            SELECT label, half, pos, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SIGN(SUM(q)) * ((2 * ABS(SUM(q)) + COUNT(*))
                        // (2 * COUNT(*))) AS BIGINT) AS c
            FROM exploded GROUP BY label, half, pos
        )
        SELECT c0.label,
               CAST(MAX(c0.n) AS BIGINT) AS n0,
               CAST(MAX(c1.n) AS BIGINT) AS n1,
               CAST(SUM(ABS(c0.c - c1.c)) AS BIGINT) AS l1_drift_micro,
               CAST(MAX(ABS(c0.c - c1.c)) AS BIGINT) AS max_drift_micro
        FROM (SELECT * FROM cents WHERE half = 0) c0
        JOIN (SELECT * FROM cents WHERE half = 1) c1 USING (label, pos)
        GROUP BY c0.label
        ORDER BY c0.label
    """


# --- k selection by elbow (WCSS sweep) -----------------------------------------

ELBOW_KS = (4, 8, 16)


def k_selection_elbow(vectors: DataFrame) -> DataFrame:
    """Model-selection sweep for the clustering family: within-cluster sum
    of squares at k ∈ {ELBOW_KS} deterministic codebooks (md5-ordered
    corpus samples, the IVF/PQ centroid treatment), reported as the elbow
    table (k, wcss_nano, drop_nano) where drop is the improvement over the
    previous k — the curve whose flattening picks k.

    Each candidate k is ONE broadcast-centroid argmin pass over the corpus
    (the kmeans-step shape); distances are the repo's nano-quantized exact
    BIGINTs so WCSS is an order-independent integer sum. All sweeps share
    the same scan shape and run as a union of three passes.

    Scale shape: 3 broadcast joins of |corpus|×k rows, three aggregates;
    no iteration, no driver-side model state."""
    from .hashing import md5_int

    sweeps = []
    for k in ELBOW_KS:
        centroids = (
            vectors.orderBy(md5_int(F.col("vec_id").cast("string")), "vec_id")
            .limit(k)
            .select(
                F.row_number()
                .over(
                    Window.orderBy(md5_int(F.col("vec_id").cast("string")), "vec_id")
                )
                .alias("cid"),
                F.col("embedding").alias("c_emb"),
            )
        )
        d_nano = F.round(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.col("c_emb"),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            * F.lit(1e9)
        ).cast("long")
        best = (
            vectors.crossJoin(F.broadcast(centroids))
            .select("vec_id", F.struct(d_nano.alias("d"), F.col("cid")).alias("c"))
            .groupBy("vec_id")
            .agg(F.min("c").alias("b"))
        )
        sweeps.append(
            best.agg(
                F.lit(k).cast("long").alias("k"),
                F.sum("b.d").alias("wcss_nano"),
            )
        )
    out = sweeps[0]
    for s in sweeps[1:]:
        out = out.unionByName(s)
    w = Window.orderBy("k")
    return out.select(
        "k",
        "wcss_nano",
        (F.coalesce(F.lag("wcss_nano").over(w), F.col("wcss_nano")) - F.col("wcss_nano")).alias(
            "drop_nano"
        ),
    ).orderBy("k")


def k_selection_elbow_sql() -> str:
    from .hashing import md5_int_sql

    parts = []
    for k in ELBOW_KS:
        parts.append(
            f"""
            SELECT CAST({k} AS BIGINT) AS k,
                   CAST(SUM(d) AS BIGINT) AS wcss_nano
            FROM (
                SELECT e.vec_id,
                       MIN(CAST(round(list_sum(list_transform(
                           range(1, len(e.embedding) + 1),
                           i -> (CAST(e.embedding[i] AS DOUBLE)
                                 - CAST(c.c_emb[i] AS DOUBLE))
                                * (CAST(e.embedding[i] AS DOUBLE)
                                   - CAST(c.c_emb[i] AS DOUBLE)))) * 1e9)
                           AS BIGINT)) AS d
                FROM embeddings e
                CROSS JOIN (
                    SELECT embedding AS c_emb FROM embeddings
                    ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
                    LIMIT {k}
                ) c
                GROUP BY e.vec_id
            )"""
        )
    union = " UNION ALL ".join(parts)
    return f"""
        WITH sweeps AS ({union})
        SELECT k, wcss_nano,
               COALESCE(LAG(wcss_nano) OVER (ORDER BY k), wcss_nano)
                   - wcss_nano AS drop_nano
        FROM sweeps
        ORDER BY k
    """


# --- isotropy score ------------------------------------------------------------


def isotropy_score(vectors: DataFrame) -> DataFrame:
    """Embedding-space isotropy panel: (n_vectors, dim,
    mean_vector_mass_milli, mean_sq_micro2) — where mean_vector_mass is
    |mean vector|² over mean |x|², the anisotropy diagnostic (Ethayarajh
    2019): a healthy space scores near 0 (directions cancel), a collapsed
    or un-centered one concentrates mass in the mean direction and
    downstream cosine similarities saturate. The companion to
    [[embedding_similarity_profile]] — this is the 1-row number, that is
    the distribution.

    Exactness: every float is quantized ONCE at ingest to micro units
    (the kmeans micro-centroid discipline); per-dimension sums, the
    floor-divided per-dimension means, both squared masses and the final
    milli ratio are then pure BIGINT arithmetic — no cross-engine float
    sum ever happens.

    Scale shape: one narrow dim-explode aggregate (map-side combined,
    64·|corpus| rows in, 64 out) and a 1-row combine."""
    dims = vectors.select(
        "vec_id",
        F.posexplode(
            F.expr("transform(embedding, v -> CAST(round(v * 1e6) AS BIGINT))")
        ).alias("d", "v_micro"),
    )
    per_dim = dims.groupBy("d").agg(
        F.sum("v_micro").alias("sum_d"),
        F.sum(F.col("v_micro") * F.col("v_micro")).alias("sq_d"),
        F.countDistinct("vec_id").alias("n"),
    )
    return per_dim.agg(
        F.max("n").cast("long").alias("n_vectors"),
        F.count("*").cast("long").alias("dim"),
        F.sum(F.expr("(sum_d DIV n) * (sum_d DIV n)")).alias("mean_mass"),
        F.sum("sq_d").alias("total_sq"),
    ).select(
        "n_vectors",
        "dim",
        F.expr(
            "CAST(1000 * mean_mass DIV (total_sq DIV n_vectors) AS BIGINT)"
        ).alias("mean_vector_mass_milli"),
        F.expr("CAST(total_sq DIV (n_vectors * dim) AS BIGINT)").alias(
            "mean_sq_micro2"
        ),
    )


ISOTROPY_SCORE_SQL = """
    WITH dims AS (
        SELECT vec_id, d,
               CAST(round(embedding[d + 1] * 1e6) AS BIGINT) AS v_micro
        FROM (
            SELECT vec_id, embedding,
                   unnest(range(0, len(embedding))) AS d
            FROM embeddings
        )
    ),
    per_dim AS (
        SELECT d, SUM(v_micro) AS sum_d,
               SUM(v_micro * v_micro) AS sq_d,
               COUNT(DISTINCT vec_id) AS n
        FROM dims GROUP BY d
    ),
    agg AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n_vectors,
               CAST(COUNT(*) AS BIGINT) AS dim,
               SUM((sum_d // n) * (sum_d // n)) AS mean_mass,
               SUM(sq_d) AS total_sq
        FROM per_dim
    )
    SELECT n_vectors, dim,
           CAST(1000 * mean_mass // (total_sq // n_vectors) AS BIGINT)
               AS mean_vector_mass_milli,
           CAST(total_sq // (n_vectors * dim) AS BIGINT) AS mean_sq_micro2
    FROM agg
"""


# --- nearest-centroid label confusion ------------------------------------------


def centroid_confusion(vectors: DataFrame) -> DataFrame:
    """Nearest-centroid classifier confusion over the labeled embedding
    corpus: per-label micro-integer centroids (each float quantized ONCE
    at ingest — the kmeans discipline), every vector assigned to its
    nearest centroid, and the (true_label, assigned_label) matrix with
    per-cell share — the linear-separability probe run before training
    anything: (true_label, assigned_label, n, row_share_milli).

    Distances are exact micro² integers (Σ (v−c)² over once-quantized
    operands), argmin by min-struct with centroid-id tiebreak, shares one
    milli division per row.

    Scale shape: one label-grain centroid aggregate (broadcast),
    one argmin pass over the corpus, one bounded matrix rollup."""
    dims = vectors.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.posexplode(
            F.expr("transform(embedding, v -> CAST(round(v * 1e6) AS BIGINT))")
        ).alias("d", "v_micro"),
    )
    cent = dims.groupBy(F.col("label").alias("c_label"), "d").agg(
        F.expr("CAST(SUM(v_micro) DIV COUNT(*) AS BIGINT)").alias("c_micro")
    )
    scored = (
        dims.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.sum(
                (F.col("v_micro") - F.col("c_micro"))
                * (F.col("v_micro") - F.col("c_micro"))
            ).alias("d2")
        )
    )
    assigned = (
        scored.select(
            "vec_id",
            "label",
            F.struct(F.col("d2"), F.col("c_label")).alias("cand"),
        )
        .groupBy("vec_id", "label")
        .agg(F.min("cand").alias("b"))
        .select("label", F.col("b.c_label").alias("assigned_label"))
    )
    cells = assigned.groupBy(
        F.col("label").alias("true_label"), "assigned_label"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("true_label")
    return (
        cells.withColumn("row_n", F.sum("n").over(w))
        .select(
            "true_label",
            "assigned_label",
            F.col("n").cast("long").alias("n"),
            F.expr("CAST(1000 * n DIV row_n AS BIGINT)").alias(
                "row_share_milli"
            ),
        )
        .orderBy("true_label", "assigned_label")
    )


CENTROID_CONFUSION_SQL = """
    WITH dims AS (
        SELECT vec_id, CAST(label AS BIGINT) AS label, d,
               CAST(round(embedding[d + 1] * 1e6) AS BIGINT) AS v_micro
        FROM (
            SELECT vec_id, label, embedding,
                   unnest(range(0, len(embedding))) AS d
            FROM embeddings
        )
    ),
    cent AS (
        SELECT label AS c_label, d,
               CAST(SUM(v_micro) // COUNT(*) AS BIGINT) AS c_micro
        FROM dims GROUP BY label, d
    ),
    scored AS (
        SELECT dims.vec_id, dims.label, cent.c_label,
               SUM((v_micro - c_micro) * (v_micro - c_micro)) AS d2
        FROM dims JOIN cent USING (d)
        GROUP BY dims.vec_id, dims.label, cent.c_label
    ),
    assigned AS (
        SELECT label,
               (MIN(struct_pack(d2 := d2, c := c_label))).c AS assigned_label
        FROM scored GROUP BY vec_id, label
    ),
    cells AS (
        SELECT label AS true_label, assigned_label, COUNT(*) AS n
        FROM assigned GROUP BY 1, 2
    )
    SELECT true_label, assigned_label, CAST(n AS BIGINT) AS n,
           CAST(1000 * n // SUM(n) OVER (PARTITION BY true_label) AS BIGINT)
               AS row_share_milli
    FROM cells
    ORDER BY true_label, assigned_label
"""


# --- norm clipping threshold ----------------------------------------------------------

CLIP_PCT_MILLI = 995  # clip at the p99.5 norm


def norm_clip_threshold(
    vectors: DataFrame, pct_milli: int = CLIP_PCT_MILLI
) -> DataFrame:
    """Embedding-norm clipping plan: the EXACT p99.5 L2-norm order statistic
    (in integer nano units) and the clipping impact — how many vectors
    exceed it and what share of total squared mass they carry. The standard
    pre-index hygiene step (outlier norms dominate IP/cosine scores and
    wreck IVF cell balance); serving pipelines clip to this threshold.

    Exactness: norms quantize once to nano (the module's micro/nano
    discipline); the threshold is rank-selected by ranks.kth_smallest
    (ceil(pct * n) — per-value counts + one cumulative window over that
    bounded aggregate), so threshold, counts, and shares are engine-exact.

    Scale shape: one narrow norm projection + the kth_smallest device +
    one broadcast-threshold aggregate; no sort of the corpus."""
    from ..ranks import kth_smallest

    norm_nano = F.round(
        F.sqrt(
            F.aggregate(
                F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda a, t: a + t,
            )
        )
        * F.lit(1e9)
    ).cast("long")
    normed = vectors.select(norm_nano.alias("norm_nano"))
    thr = kth_smallest(
        normed, "norm_nano", f"CAST(({pct_milli} * n + 999) DIV 1000 AS BIGINT)"
    ).select(F.col("norm_nano").alias("clip_nano"), F.col("n").alias("n_vecs"))
    # group by the broadcast scalars (not a global agg) so empty input emits
    # zero rows on both engines — a global .agg() would emit one all-NULL row
    # while the oracle's GROUP BY n_vecs, clip_nano emits none
    return (
        normed.crossJoin(F.broadcast(thr))
        .groupBy("n_vecs", "clip_nano")
        .agg(
            F.sum((F.col("norm_nano") > F.col("clip_nano")).cast("long")).alias(
                "n_clipped"
            ),
            F.sum(
                F.when(
                    F.col("norm_nano") > F.col("clip_nano"),
                    F.col("norm_nano") / 1e9 * (F.col("norm_nano") / 1e9),
                ).otherwise(0.0)
            ).alias("_clipped_sq"),
            F.sum((F.col("norm_nano") / 1e9) * (F.col("norm_nano") / 1e9)).alias(
                "_total_sq"
            ),
        )
        .select(
            "n_vecs",
            "clip_nano",
            "n_clipped",
            F.expr(
                "CAST(round(1000 * _clipped_sq / _total_sq) AS BIGINT)"
            ).alias("clipped_mass_milli"),
        )
    )


def norm_clip_threshold_sql(pct_milli: int = CLIP_PCT_MILLI) -> str:
    return f"""
        WITH normed AS (
            SELECT CAST(round(sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1e9)
                       AS BIGINT) AS norm_nano
            FROM embeddings
        ),
        per_v AS (SELECT norm_nano, COUNT(*) AS m FROM normed GROUP BY 1),
        cum AS (
            SELECT norm_nano,
                   SUM(m) OVER (ORDER BY norm_nano ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS cum
            FROM per_v
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM normed),
        thr AS (
            SELECT MIN(norm_nano) AS clip_nano, MAX(n) AS n_vecs
            FROM cum CROSS JOIN tot
            WHERE cum >= CAST(({pct_milli} * n + 999) // 1000 AS BIGINT)
        )
        SELECT n_vecs, clip_nano,
               CAST(SUM(CASE WHEN norm_nano > clip_nano THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped,
               CAST(round(1000 * SUM(CASE WHEN norm_nano > clip_nano
                        THEN (norm_nano / 1e9) * (norm_nano / 1e9)
                        ELSE 0.0 END)
                    / SUM((norm_nano / 1e9) * (norm_nano / 1e9))) AS BIGINT)
                   AS clipped_mass_milli
        FROM normed CROSS JOIN thr
        GROUP BY n_vecs, clip_nano
    """


# --- cluster-validity indices ---------------------------------------------------------
#
# The unsupervised model-selection numbers an embedding pipeline reads before
# committing to a clustering: Davies-Bouldin (lower = tighter/better
# separated), Calinski-Harabasz (higher = better), and the Adjusted Rand
# Index against the deterministic one-step k-means assignment (external
# validation of the stored labels). Reference surface: the clustering audit
# of a curation pipeline (cf. ref etl.py:128-141's single GROUP BY summary —
# these are the same "profile the groups" device at embedding scale).
#
# Scale design: everything reduces through (label, pos)-keyed aggregates over
# the posexploded corpus (map-side combined), then bounded |labels|x|labels|
# grids; per-vector distances quantize ONCE to exact integer nano/micro units
# so every cross-row sum is an order-free BIGINT — no distributed float sums
# feed a comparison or a division.


def _own_centroid_dist_nano(embeddings: DataFrame) -> DataFrame:
    """(vec_id, label, d_nano): Euclidean distance of each vector to its own
    label centroid, centroid components rounded to 9 dp first so both engines
    measure against identical centers; the distance itself quantizes to an
    exact BIGINT in nano units."""
    exploded = embeddings.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"),
             F.col("x").cast("double").alias("x"))
    cents = (
        exploded.groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 9).alias("c"))
    )
    return (
        exploded.join(F.broadcast(cents), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.expr(
                "CAST(round(sqrt(SUM((x - c) * (x - c))) * 1e9) AS BIGINT)"
            ).alias("d_nano")
        )
    )


def davies_bouldin(embeddings: DataFrame) -> DataFrame:
    """Davies-Bouldin index over the stored labels: per-label intra scatter
    S_i (mean distance to centroid), pairwise centroid separations M_ij, the
    worst ratio R_i = max_j (S_i+S_j)/M_ij, and the index itself (mean R_i).

    Output: one row per label (label, n_members, s_intra, r_max, db_index) —
    db_index repeated so the relation is self-contained."""
    d = _own_centroid_dist_nano(embeddings)
    s = (
        d.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.round(F.sum("d_nano") / F.count("*") / 1e9, 9).alias("s_intra"),
        )
    )
    exploded = embeddings.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    ).select("label", (F.col("pos0") + 1).alias("pos"),
             F.col("x").cast("double").alias("x"))
    cents = exploded.groupBy("label", "pos").agg(
        F.round(F.avg("x"), 9).alias("c")
    )
    pair_sep = (
        cents.alias("a")
        .join(cents.alias("b"), on="pos")
        .where(F.col("a.label") != F.col("b.label"))
        .groupBy(F.col("a.label").alias("li"), F.col("b.label").alias("lj"))
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("a.c") - F.col("b.c")) ** 2)), 9
            ).alias("m_sep")
        )
    )
    r = (
        pair_sep.join(F.broadcast(s.select(F.col("label").alias("li"),
                                           F.col("s_intra").alias("si"))), "li")
        .join(F.broadcast(s.select(F.col("label").alias("lj"),
                                   F.col("s_intra").alias("sj"))), "lj")
        .groupBy("li")
        .agg(
            F.max(F.round((F.col("si") + F.col("sj")) / F.col("m_sep"), 6))
            .alias("r_max")
        )
    )
    db = r.agg(F.round(F.avg("r_max"), 6).alias("db_index"))
    return (
        s.join(r, s.label == r.li)
        .crossJoin(F.broadcast(db))
        .select("label", "n_members", F.round("s_intra", 6).alias("s_intra"),
                "r_max", "db_index")
        .orderBy("label")
    )


def davies_bouldin_sql() -> str:
    return """
    WITH exploded AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    cents AS (
        SELECT label, pos, round(AVG(x), 9) AS c
        FROM exploded GROUP BY label, pos
    ),
    dists AS (
        SELECT e.vec_id, e.label,
               CAST(round(sqrt(SUM((e.x - c.c) * (e.x - c.c))) * 1e9)
                    AS BIGINT) AS d_nano
        FROM exploded e JOIN cents c ON e.label = c.label AND e.pos = c.pos
        GROUP BY e.vec_id, e.label
    ),
    s AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
               round(SUM(d_nano) / COUNT(*) / 1e9, 9) AS s_intra
        FROM dists GROUP BY label
    ),
    pair_sep AS (
        SELECT a.label AS li, b.label AS lj,
               round(sqrt(SUM((a.c - b.c) * (a.c - b.c))), 9) AS m_sep
        FROM cents a JOIN cents b ON a.pos = b.pos AND a.label <> b.label
        GROUP BY a.label, b.label
    ),
    r AS (
        SELECT p.li, MAX(round((si.s_intra + sj.s_intra) / p.m_sep, 6))
               AS r_max
        FROM pair_sep p
        JOIN s si ON si.label = p.li
        JOIN s sj ON sj.label = p.lj
        GROUP BY p.li
    ),
    db AS (SELECT round(AVG(r_max), 6) AS db_index FROM r)
    SELECT s.label, s.n_members, round(s.s_intra, 6) AS s_intra,
           r.r_max, db.db_index
    FROM s JOIN r ON r.li = s.label CROSS JOIN db
    ORDER BY s.label
    """


def calinski_harabasz(embeddings: DataFrame) -> DataFrame:
    """Calinski-Harabasz (variance-ratio) score of the stored labels: the
    between-cluster dispersion per degree of freedom over the within-cluster
    dispersion per degree of freedom.

    Within sum W quantizes each vector's squared distance to micro BIGINT
    (order-free exact sum over the corpus); between sum B is |labels| exact
    scalar terms. One row: (n_vecs, k, w_within, b_between, ch)."""
    exploded = embeddings.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"),
             F.col("x").cast("double").alias("x"))
    cents = exploded.groupBy("label", "pos").agg(
        F.round(F.avg("x"), 9).alias("c"), F.count("*").alias("n_i")
    )
    w = (
        exploded.join(F.broadcast(cents.select("label", "pos", "c")),
                      ["label", "pos"])
        .groupBy("vec_id")
        .agg(F.expr(
            "CAST(round(SUM((x - c) * (x - c)) * 1e6) AS BIGINT)"
        ).alias("d2_micro"))
        .agg(F.sum("d2_micro").alias("w_micro"),
             F.count("*").cast("long").alias("n_vecs"))
    )
    grand = exploded.groupBy("pos").agg(F.round(F.avg("x"), 9).alias("g"))
    b = (
        cents.join(F.broadcast(grand), "pos")
        .groupBy("label")
        .agg(
            F.first("n_i").alias("n_i"),
            F.round(F.sum((F.col("c") - F.col("g")) ** 2), 9).alias("d2g"),
        )
        .agg(
            F.round(F.sum(F.col("n_i") * F.col("d2g")), 6).alias("b_between"),
            F.count("*").cast("long").alias("k"),
        )
    )
    return (
        w.crossJoin(F.broadcast(b))
        .select(
            "n_vecs",
            "k",
            F.round(F.col("w_micro") / 1e6, 6).alias("w_within"),
            "b_between",
            F.round(
                (F.col("b_between") / (F.col("k") - 1))
                / ((F.col("w_micro") / 1e6) / (F.col("n_vecs") - F.col("k"))),
                6,
            ).alias("ch"),
        )
    )


def calinski_harabasz_sql() -> str:
    return """
    WITH exploded AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    cents AS (
        SELECT label, pos, round(AVG(x), 9) AS c, COUNT(*) AS n_i
        FROM exploded GROUP BY label, pos
    ),
    w AS (
        SELECT CAST(SUM(d2_micro) AS BIGINT) AS w_micro,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM (
            SELECT e.vec_id,
                   CAST(round(SUM((e.x - c.c) * (e.x - c.c)) * 1e6)
                        AS BIGINT) AS d2_micro
            FROM exploded e
            JOIN cents c ON e.label = c.label AND e.pos = c.pos
            GROUP BY e.vec_id
        )
    ),
    grand AS (
        SELECT pos, round(AVG(x), 9) AS g FROM exploded GROUP BY pos
    ),
    b AS (
        SELECT round(SUM(n_i * d2g), 6) AS b_between,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM (
            SELECT c.label, MIN(c.n_i) AS n_i,
                   round(SUM((c.c - g.g) * (c.c - g.g)), 9) AS d2g
            FROM cents c JOIN grand g ON c.pos = g.pos
            GROUP BY c.label
        )
    )
    SELECT n_vecs, k,
           round(w_micro / 1e6, 6) AS w_within,
           b_between,
           round((b_between / (k - 1))
                 / ((w_micro / 1e6) / (n_vecs - k)), 6) AS ch
    FROM w CROSS JOIN b
    """


def ari_vs_kmeans(embeddings: DataFrame, k: int = KMEANS_K) -> DataFrame:
    """Adjusted Rand Index between the stored labels and the deterministic
    one-step k-means assignment — external validation of a clustering by
    pair counting, chance-corrected.

    Everything is integer until the single final division: contingency
    counts n_ij, comb2 sums over cells/rows/cols, n·(n−1)/2 — so the score
    is bit-identical across engines. Degenerate partitions (denominator 0:
    both sides all-singletons or one cluster) emit ARI 1.0 by convention.

    One row: (n_vecs, k_assigned, sum_comb_cells, sum_comb_rows,
    sum_comb_cols, ari)."""
    assign = kmeans_assignment(embeddings, k).select("vec_id", "centroid_id")
    pairs = embeddings.select("vec_id", "label").join(assign, "vec_id")
    comb2 = lambda c: (F.col(c) * (F.col(c) - F.lit(1)) / F.lit(2)).cast("long")  # noqa: E731
    cells = (
        pairs.groupBy("label", "centroid_id").agg(F.count("*").alias("n"))
    )
    sum_cells = cells.agg(
        F.sum(comb2("n")).alias("sum_comb_cells"),
        F.sum("n").cast("long").alias("n_vecs"),
        F.count_distinct("centroid_id").cast("long").alias("k_assigned"),
    )
    sum_rows = (
        cells.groupBy("label").agg(F.sum("n").alias("a"))
        .agg(F.sum(comb2("a")).alias("sum_comb_rows"))
    )
    sum_cols = (
        cells.groupBy("centroid_id").agg(F.sum("n").alias("b"))
        .agg(F.sum(comb2("b")).alias("sum_comb_cols"))
    )
    joined = sum_cells.crossJoin(F.broadcast(sum_rows)).crossJoin(
        F.broadcast(sum_cols)
    )
    comb_n = (F.col("n_vecs") * (F.col("n_vecs") - 1) / 2).cast("long")
    expected = F.col("sum_comb_rows") * F.col("sum_comb_cols") / comb_n
    max_idx = (F.col("sum_comb_rows") + F.col("sum_comb_cols")) / F.lit(2.0)
    return joined.select(
        "n_vecs",
        "k_assigned",
        "sum_comb_cells",
        "sum_comb_rows",
        "sum_comb_cols",
        F.when(max_idx - expected == 0, F.lit(1.0))
        .otherwise(
            F.round((F.col("sum_comb_cells") - expected) / (max_idx - expected), 6)
        )
        .alias("ari"),
    )


def ari_vs_kmeans_sql(k: int = KMEANS_K) -> str:
    return f"""
    WITH {kmeans_assignment_ctes(k)},
    pairs AS (
        SELECT e.vec_id, e.label, a.centroid_id
        FROM embeddings e JOIN assignment a ON a.vec_id = e.vec_id
    ),
    cells AS (
        SELECT label, centroid_id, COUNT(*) AS n
        FROM pairs GROUP BY label, centroid_id
    ),
    sums AS (
        SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS sum_comb_cells,
               CAST(SUM(n) AS BIGINT) AS n_vecs,
               CAST(COUNT(DISTINCT centroid_id) AS BIGINT) AS k_assigned
        FROM cells
    ),
    rowsum AS (
        SELECT CAST(SUM(a * (a - 1) // 2) AS BIGINT) AS sum_comb_rows
        FROM (SELECT SUM(n) AS a FROM cells GROUP BY label)
    ),
    colsum AS (
        SELECT CAST(SUM(b * (b - 1) // 2) AS BIGINT) AS sum_comb_cols
        FROM (SELECT SUM(n) AS b FROM cells GROUP BY centroid_id)
    )
    SELECT n_vecs, k_assigned, sum_comb_cells, sum_comb_rows, sum_comb_cols,
           CASE WHEN (sum_comb_rows + sum_comb_cols) / 2.0
                     - sum_comb_rows * sum_comb_cols
                       / CAST(n_vecs * (n_vecs - 1) // 2 AS DOUBLE) = 0
                THEN 1.0
                ELSE round(
                    (sum_comb_cells - sum_comb_rows * sum_comb_cols
                        / CAST(n_vecs * (n_vecs - 1) // 2 AS DOUBLE))
                    / ((sum_comb_rows + sum_comb_cols) / 2.0
                        - sum_comb_rows * sum_comb_cols
                          / CAST(n_vecs * (n_vecs - 1) // 2 AS DOUBLE)), 6)
           END AS ari
    FROM sums CROSS JOIN rowsum CROSS JOIN colsum
    """


# --- facility-location greedy subset selection ----------------------------------------

FL_ROUNDS = 5
FL_GROUND = 64


def facility_location(
    embeddings: DataFrame, rounds: int = FL_ROUNDS, ground: int = FL_GROUND
) -> DataFrame:
    """Greedy facility-location subset selection: ``rounds`` times pick the
    vector whose addition most increases Σ_g max_{s∈sel} sim(g, s) over the
    md5-sampled ``ground``-point witness set — the submodular coverage
    objective behind representative-subset curation (the 1−1/e greedy
    guarantee is the standard justification), complementing the k-center
    coreset's pure-diversity rule (L-172).

    Exactness by construction: coordinates quantize ONCE to integer micro,
    similarity is the exact BIGINT dot product of micro vectors, and every
    gain is an order-free integer sum with a (gain DESC, vec_id) total
    order — no float enters the argmax. The bounded ground set is the
    documented scale cap: per round one broadcast of the 64-row coverage
    state against the corpus-sized sim relation (computed once), one top-1.

    Output: (sel_round, vec_id, gain, coverage) — coverage is the running
    objective, so the relation doubles as the submodular-returns curve."""
    from .hashing import md5_int

    xm_rel = embeddings.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * F.lit(1e6)).cast("long"),
        ).alias("xm"),
    )
    ground_rel = (
        xm_rel.withColumn("ck", md5_int(F.col("vec_id").cast("string")))
        .orderBy("ck", "vec_id")
        .limit(ground)
        .select(F.col("vec_id").alias("g_id"), F.col("xm").alias("g_xm"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("xm"), F.col("g_xm"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    simgrid = (
        xm_rel.crossJoin(F.broadcast(ground_rel))
        .select(F.col("vec_id").alias("cand_id"), "g_id", dot.alias("sim"))
        .localCheckpoint(eager=False)
    )
    cur = ground_rel.select("g_id", F.lit(0).cast("long").alias("cur_sim"))
    sel = None
    for r in range(1, rounds + 1):
        gains = (
            simgrid.join(F.broadcast(cur), "g_id")
            .select(
                "cand_id",
                F.greatest(F.lit(0).cast("long"), F.col("sim") - F.col("cur_sim")).alias(
                    "g"
                ),
            )
            .groupBy("cand_id")
            .agg(F.sum("g").alias("gain"))
        )
        if sel is not None:
            gains = gains.join(
                sel.select(F.col("vec_id").alias("cand_id")), "cand_id", "left_anti"
            )
        winner = (
            gains.orderBy(F.desc("gain"), "cand_id")
            .limit(1)
            .select(
                F.lit(r).cast("int").alias("sel_round"),
                F.col("cand_id").alias("vec_id"),
                "gain",
            )
            .localCheckpoint()
        )
        # (round-10 A/B: dropping this union checkpoint measured flat within
        # noise — kept, the committed form is the measured baseline)
        sel = winner if sel is None else sel.unionAll(winner).localCheckpoint()
        w_sim = simgrid.join(
            F.broadcast(winner.select(F.col("vec_id").alias("cand_id"))),
            "cand_id",
        ).select("g_id", F.col("sim").alias("w_sim"))
        cur = (
            cur.join(w_sim, "g_id", "left")
            .select(
                "g_id",
                F.greatest(
                    F.col("cur_sim"), F.coalesce(F.col("w_sim"), F.lit(0))
                ).alias("cur_sim"),
            )
            .localCheckpoint()
        )
    w_cum = Window.orderBy("sel_round").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # no-op re-aggregate over the unique key: the checkpointed selection
    # rows read as source leaves, which would flag the cumulative window
    # as unbounded in the plan audit
    sel_b = sel.groupBy("sel_round", "vec_id").agg(
        F.max("gain").alias("gain")
    )
    return sel_b.select(
        "sel_round", "vec_id", "gain", F.sum("gain").over(w_cum).alias("coverage")
    ).orderBy("sel_round")


def facility_location_sql(
    rounds: int = FL_ROUNDS, ground: int = FL_GROUND
) -> str:
    from .hashing import md5_int_sql

    parts = [
        f"""
    WITH xm AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xm
        FROM embeddings
    ),
    ground_rel AS MATERIALIZED (
        SELECT vec_id AS g_id, xm AS g_xm
        FROM xm
        ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
        LIMIT {ground}
    ),
    simgrid AS MATERIALIZED (
        SELECT c.vec_id AS cand_id, g.g_id,
               CAST(list_sum(list_transform(range(1, len(c.xm) + 1),
                   j -> c.xm[j] * g.g_xm[j])) AS BIGINT) AS sim
        FROM xm c CROSS JOIN ground_rel g
    ),
    cur0 AS MATERIALIZED (
        SELECT g_id, CAST(0 AS BIGINT) AS cur_sim FROM ground_rel
    ),
    sel0 AS MATERIALIZED (
        SELECT CAST(0 AS INTEGER) AS sel_round,
               CAST(-1 AS BIGINT) AS vec_id, CAST(0 AS BIGINT) AS gain
        WHERE FALSE
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    win{r} AS MATERIALIZED (
        SELECT CAST({r} AS INTEGER) AS sel_round, s.cand_id AS vec_id,
               CAST(SUM(GREATEST(CAST(0 AS BIGINT), s.sim - c.cur_sim))
                    AS BIGINT) AS gain
        FROM simgrid s JOIN cur{r - 1} c USING (g_id)
        WHERE s.cand_id NOT IN (SELECT vec_id FROM sel{r - 1})
        GROUP BY s.cand_id
        ORDER BY gain DESC, s.cand_id ASC
        LIMIT 1
    ),
    sel{r} AS MATERIALIZED (
        SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM win{r}
    ),
    cur{r} AS MATERIALIZED (
        SELECT c.g_id,
               GREATEST(c.cur_sim, COALESCE(w.sim, CAST(0 AS BIGINT)))
                   AS cur_sim
        FROM cur{r - 1} c
        LEFT JOIN (
            SELECT s.g_id, s.sim
            FROM simgrid s JOIN win{r} w ON w.vec_id = s.cand_id
        ) w ON w.g_id = c.g_id
    )"""
        )
    parts.append(
        f"""
    SELECT sel_round, vec_id, gain,
           CAST(SUM(gain) OVER (ORDER BY sel_round
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS coverage
    FROM sel{rounds}
    ORDER BY sel_round
    """
    )
    return "".join(parts)


# --- local outlier factor -------------------------------------------------------------

LOF_K = 5
LOF_SAMPLE = 256
LOF_TOP = 10


def lof_outliers(
    embeddings: DataFrame,
    k: int = LOF_K,
    sample: int = LOF_SAMPLE,
    top: int = LOF_TOP,
) -> DataFrame:
    """Local Outlier Factor (Breunig et al., SIGMOD 2000) over the
    md5-sampled ``sample``-vector witness set: density-RELATIVE outlier
    scoring — a point is anomalous if its local density is low compared to
    its neighbors' densities, which catches outliers-near-dense-clusters
    that the global centroid-distance audit (L-40) misses entirely.

    Exactness chain: micro-quantized coordinates give exact BIGINT squared
    distances, and each distance becomes the INTEGER micro unit
    round(sqrt(d2)) — sqrt of an exact int is correctly rounded IEEE and
    never lands on .5 (sqrt(n) is integer or irrational), so every engine
    derives the identical BIGINT; kNN membership, reachability sums, lrd
    and the final LOF ratio are then integer arithmetic to the last
    division. (Rounding a 1e6-magnitude double to 9 dp instead sits BELOW
    the double's ulp — the property test caught the resulting last-digit
    engine drift.) The md5 sample cap is the documented scale boundary
    (the full-corpus path plugs the LSH bucket candidates from the dedup
    stack into the same pair relation).

    Output: top-``top`` rows (vec_id, kdist_micro, lrd_micro, lof)."""
    from .hashing import md5_int

    xm_rel = (
        embeddings.withColumn("ck", md5_int(F.col("vec_id").cast("string")))
        .orderBy("ck", "vec_id")
        .limit(sample)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * F.lit(1e6)).cast("long"),
            ).alias("xm"),
        )
        .localCheckpoint(eager=False)
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("a.xm"), F.col("b.xm"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = (
        xm_rel.alias("a")
        .join(xm_rel.alias("b"), F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("i"),
            F.col("b.vec_id").alias("j"),
            F.round(F.sqrt(d2)).cast("long").alias("d"),
        )
    )
    w_nn = Window.partitionBy("i").orderBy(F.col("d").asc(), F.col("j").asc())
    ranked = pairs.select(
        "i", "j", "d", F.row_number().over(w_nn).alias("rnk")
    ).where(F.col("rnk") <= k).localCheckpoint(eager=False)
    kdist = ranked.groupBy("i").agg(F.max("d").alias("kdist_micro"))
    reach = (
        ranked.join(
            kdist.select(
                F.col("i").alias("j"), F.col("kdist_micro").alias("kd_j")
            ),
            "j",
        )
        .select("i", "j", F.greatest("kd_j", "d").alias("reach_micro"))
    )
    # GREATEST(1, sum): an all-duplicate neighborhood has zero total
    # reachability; the floor keeps lrd finite (and maximal) there
    lrd = reach.groupBy("i").agg(
        F.expr(
            f"CAST(round(1e12 * {k} / GREATEST(1, SUM(reach_micro)))"
            " AS BIGINT)"
        ).alias("lrd_micro")
    )
    lof = (
        ranked.select("i", "j")
        .join(lrd.select(F.col("i").alias("j"), F.col("lrd_micro").alias("lrd_j")), "j")
        .groupBy("i")
        .agg(F.sum("lrd_j").alias("sum_lrd_j"))
        .join(lrd, "i")
        .select(
            F.col("i").alias("vec_id"),
            F.round(
                F.col("sum_lrd_j") / (F.lit(k) * F.col("lrd_micro")), 6
            ).alias("lof"),
            "lrd_micro",
        )
        .join(
            kdist.select(F.col("i").alias("vec_id"), "kdist_micro"), "vec_id"
        )
    )
    w_top = Window.orderBy(F.col("lof").desc(), F.col("vec_id").asc())
    return (
        lof.withColumn("rnk", F.row_number().over(w_top).cast("int"))
        .where(F.col("rnk") <= top)
        .select("rnk", "vec_id", "kdist_micro", "lrd_micro", "lof")
        .orderBy("rnk")
    )


def lof_outliers_sql(
    k: int = LOF_K, sample: int = LOF_SAMPLE, top: int = LOF_TOP
) -> str:
    from .hashing import md5_int_sql

    return f"""
    WITH xm AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xm
        FROM embeddings
        ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
        LIMIT {sample}
    ),
    pairs AS MATERIALIZED (
        SELECT a.vec_id AS i, b.vec_id AS j,
               CAST(round(sqrt(list_sum(list_transform(
                   range(1, len(a.xm) + 1),
                   p -> CAST((a.xm[p] - b.xm[p]) * (a.xm[p] - b.xm[p])
                        AS DOUBLE))))) AS BIGINT) AS d
        FROM xm a JOIN xm b ON a.vec_id <> b.vec_id
    ),
    ranked AS MATERIALIZED (
        SELECT i, j, d,
               row_number() OVER (
                   PARTITION BY i ORDER BY d ASC, j ASC
               ) AS rnk
        FROM pairs
        QUALIFY rnk <= {k}
    ),
    kdist AS MATERIALIZED (
        SELECT i, MAX(d) AS kdist_micro FROM ranked GROUP BY i
    ),
    lrd AS MATERIALIZED (
        SELECT r.i,
               CAST(round(1e12 * {k} / GREATEST(1,
                   SUM(GREATEST(kj.kdist_micro, r.d)))) AS BIGINT)
                   AS lrd_micro
        FROM ranked r JOIN kdist kj ON kj.i = r.j
        GROUP BY r.i
    ),
    lof AS (
        SELECT r.i AS vec_id,
               round(SUM(lj.lrd_micro)
                     / ({k} * CAST(li.lrd_micro AS DOUBLE)), 6) AS lof,
               li.lrd_micro
        FROM ranked r
        JOIN lrd lj ON lj.i = r.j
        JOIN lrd li ON li.i = r.i
        GROUP BY r.i, li.lrd_micro
    )
    SELECT CAST(row_number() OVER (ORDER BY l.lof DESC, l.vec_id ASC)
                AS INTEGER) AS rnk,
           l.vec_id, kd.kdist_micro, l.lrd_micro, l.lof
    FROM lof l JOIN kdist kd ON kd.i = l.vec_id
    QUALIFY rnk <= {top}
    ORDER BY rnk
    """


# --- per-dimension quantile normalization ---------------------------------------------


def quantile_normalize(embeddings: DataFrame) -> DataFrame:
    """Per-dimension quantile normalization (the microarray-era recipe that
    generalizes to embedding post-processing): replace every dimension's
    r-th order statistic with the ACROSS-dimension mean of r-th order
    statistics, forcing all dimensions onto one shared marginal — the
    whitening-lite that fixes per-dimension scale pathologies before
    distance-based retrieval (the dimension-stats audit L-153 diagnoses
    them; this repairs them).

    Exact chain: micro coordinates, rank by (value, vec_id) per dimension,
    target per rank = exact half-up integer mean over the |dims| values at
    that rank. Output per dimension: (pos, l1_shift_micro, sum_after,
    sumsq_after) — the after-sums are IDENTICAL for every pos by
    construction, a self-certifying invariant the oracle re-derives.

    Scale: one posexplode, two (pos)-keyed windows/aggregates, one
    rank-keyed mean broadcast back — all map-side combined."""
    exploded = embeddings.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)").alias("xm"),
    )
    w_rank = Window.partitionBy("pos").orderBy(
        F.col("xm").asc(), F.col("vec_id").asc()
    )
    ranked = exploded.select(
        "pos", "xm", F.row_number().over(w_rank).alias("r")
    )
    targets = ranked.groupBy("r").agg(
        F.expr(
            "CAST(CASE WHEN SUM(xm) >= 0"
            " THEN (2 * SUM(xm) + COUNT(*)) DIV (2 * COUNT(*))"
            " ELSE -((2 * -SUM(xm) + COUNT(*)) DIV (2 * COUNT(*))) END"
            " AS BIGINT)"
        ).alias("t")
    )
    return (
        ranked.join(F.broadcast(targets), "r")
        .groupBy("pos")
        .agg(
            F.sum(F.abs(F.col("xm") - F.col("t"))).alias("l1_shift_micro"),
            F.sum("t").alias("sum_after"),
            F.sum(F.col("t") * F.col("t")).alias("sumsq_after"),
        )
        .orderBy("pos")
    )


def quantile_normalize_sql() -> str:
    return """
    WITH exploded AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS pos,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                    AS BIGINT) AS xm
        FROM embeddings
    ),
    ranked AS (
        SELECT pos, xm,
               row_number() OVER (
                   PARTITION BY pos ORDER BY xm ASC, vec_id ASC
               ) AS r
        FROM exploded
    ),
    targets AS (
        SELECT r,
               CAST(CASE WHEN SUM(xm) >= 0
                    THEN (2 * SUM(xm) + COUNT(*)) // (2 * COUNT(*))
                    ELSE -((2 * -SUM(xm) + COUNT(*)) // (2 * COUNT(*))) END
                    AS BIGINT) AS t
        FROM ranked GROUP BY r
    )
    SELECT k.pos,
           CAST(SUM(abs(k.xm - t.t)) AS BIGINT) AS l1_shift_micro,
           CAST(SUM(t.t) AS BIGINT) AS sum_after,
           CAST(SUM(t.t * t.t) AS BIGINT) AS sumsq_after
    FROM ranked k JOIN targets t USING (r)
    GROUP BY k.pos
    ORDER BY k.pos
    """
