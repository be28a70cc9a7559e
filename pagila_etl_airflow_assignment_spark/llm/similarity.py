"""Approximate-nearest-neighbor search over the `embeddings` table.

Baseline: brute-force cosine top-k — a broadcast join of the (small) query set
against the corpus, ranked with a per-query window. Exact, embarrassingly
parallel, no corpus shuffle: the right answer at any scale when the query set
is small.

Scale path: random-hyperplane LSH — deterministic pseudo-random hyperplanes
(md5-derived, no RNG), sign-pattern bucket per vector, candidates restricted to
matching buckets across several hash tables. Trades recall for touching only a
fraction of the corpus per query; the recall-vs-brute-force property is pinned
by a test rather than an oracle (approximation is non-SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _dot, _l2norm

DEFAULT_K = 5


def brute_force_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = DEFAULT_K
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding itself).

    The query side is broadcast (tiny); ranking uses a window partitioned by
    query — no global shuffle of the corpus.
    """
    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    queries = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def brute_force_topk_sql(query_ids: list[int], k: int = DEFAULT_K) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH queries AS (
            SELECT vec_id AS query_id, embedding AS q_emb
            FROM embeddings WHERE vec_id IN ({ids})
        ),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   round(list_cosine_similarity(
                       q.q_emb::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings c CROSS JOIN queries q
            WHERE c.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
               ) AS INT) AS rank
        FROM scored
        QUALIFY rank <= {k}
        ORDER BY query_id, rank
    """


# --- random-hyperplane LSH ----------------------------------------------------

# Near-uniform random embeddings (like this fixture's) need many low-resolution
# tables for recall: 16 tables x 4 planes measured 0.92 recall@5 at sf0.001 vs
# 0.12 for 8x8. Fewer planes = coarser buckets = more candidates per query;
# tune planes up as real embedding clusters get tighter.
LSH_TABLES = 16
LSH_HYPERPLANES = 4  # bits per table


def _hyperplane(dim: int, table: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component c is a
    zero-centered value derived from md5(table|plane|c). No RNG, so plans are
    reproducible and resumable."""
    import hashlib

    return [
        (int(hashlib.md5(f"{table}|{plane}|{c}".encode()).hexdigest()[:8], 16)
         / 0x7FFFFFFF) - 1.0
        for c in range(dim)
    ]


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = DEFAULT_K,
    tables: int = LSH_TABLES,
    planes: int = LSH_HYPERPLANES,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k via random-hyperplane LSH: per table, each vector's bucket is
    the sign pattern of ``planes`` dot products; queries only score candidates
    sharing a bucket in at least one table.

    Hyperplane dots are built-in array expressions (zip_with + fold) evaluated
    JVM-side; the per-table bucket ids are computed in one narrow projection.
    """
    planes_by_table = [
        [_hyperplane(dim, t, p) for p in range(planes)] for t in range(tables)
    ]

    # The bucket expressions are built as ONE SQL string: constructing 4096
    # hyperplane literals through the Column API costs thousands of py4j
    # round-trips (~7 s of driver time measured at sf0.1); a selectExpr parse
    # of the same expression tree is one round-trip.
    def bucket_sql(t: int) -> str:
        bits = []
        for p in range(planes):
            hp = ", ".join(f"{v!r}D" for v in planes_by_table[t][p])
            dot = (
                f"aggregate(zip_with(embedding, array({hp}), "
                f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
            )
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
        return f"concat_ws('_', '{t}', CAST({' + '.join(bits)} AS STRING))"

    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    # Buckets carry only (vec_id, bucket) — candidate dedup then shuffles two
    # narrow ints instead of two 64-float arrays (measured 4x faster at sf0.1);
    # embeddings are joined back only for the surviving candidate pairs.
    bucketed = corpus.selectExpr(
        "vec_id",
        "explode(array({})) AS bucket".format(
            ", ".join(bucket_sql(t) for t in range(tables))
        ),
    )
    q_bucketed = bucketed.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    candidates = (
        bucketed.join(F.broadcast(q_bucketed), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    queries = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        candidates.join(corpus, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def lsh_bucket_topk_sql(
    query_ids: list[int],
    k: int = DEFAULT_K,
    tables: int = LSH_TABLES,
    planes: int = LSH_HYPERPLANES,
    dim: int = 64,
) -> str:
    """Full DuckDB oracle for ``lsh_bucket_topk``. LSH here is
    recall-approximate but DETERMINISTIC: the hyperplanes are md5-derived
    constants (embedded as the same float literals both engines parse to the
    same doubles), and DuckDB's list_dot_product / list_cosine_similarity
    match Spark's ordered fold bit-for-bit on DOUBLE[] (round-1 evidence:
    dedup_embedding_cosine / ann_bruteforce hash-match)."""
    planes_by_table = [
        [_hyperplane(dim, t, p) for p in range(planes)] for t in range(tables)
    ]

    def bucket_sql(t: int) -> str:
        bits = []
        for p in range(planes):
            hp = ", ".join(repr(v) for v in planes_by_table[t][p])
            dot = f"list_dot_product(embedding::DOUBLE[], [{hp}])"
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
        return f"concat_ws('_', '{t}', CAST({' + '.join(bits)} AS VARCHAR))"

    ids = ", ".join(str(i) for i in query_ids)
    buckets = ",\n                ".join(bucket_sql(t) for t in range(tables))
    return f"""
        WITH bucketed AS (
            SELECT vec_id, unnest([
                {buckets}
            ]) AS bucket
            FROM embeddings
        ),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM bucketed c
            JOIN (SELECT * FROM bucketed WHERE vec_id IN ({ids})) q
              USING (bucket)
            WHERE c.vec_id <> q.vec_id
        ),
        scored AS (
            SELECT cand.query_id, cand.vec_id,
                   round(list_cosine_similarity(
                       q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
            FROM cand
            JOIN embeddings c ON c.vec_id = cand.vec_id
            JOIN embeddings q ON q.vec_id = cand.query_id
        )
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
               ) AS INT) AS rank
        FROM scored
        QUALIFY rank <= {k}
        ORDER BY query_id, rank
    """


# --- IVF (inverted-file) ------------------------------------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 4


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = DEFAULT_K,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) index: corpus vectors are assigned
    to their nearest coarse centroid; each query scores only the vectors in its
    ``nprobe`` nearest centroid lists.

    Centroids are a deterministic md5-ordered sample of the corpus (no RNG, no
    iterative k-means — at scale you'd refine with a few Lloyd passes, each of
    which is two keyed aggregations). The centroid set is tiny and broadcast;
    the corpus is touched by one narrow assignment pass plus one keyed join —
    per-query work scales with list size (~corpus/n_centroids x nprobe), not
    corpus size.
    """
    from .hashing import md5_int

    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
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
    # cosine of every vector to every centroid (broadcast nested loop over the
    # tiny centroid set), then per-vector assignment via max-struct — one
    # narrow pass; the only corpus-wide shuffle is the assignment groupBy
    affinity = corpus.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "centroid_id",
        (
            _dot(F.col("embedding"), F.col("c_emb"))
            / (F.col("nrm") * F.col("c_nrm"))
        ).alias("c_sim"),
    )
    assignment = (
        affinity.groupBy("vec_id")
        .agg(F.max(F.struct("c_sim", "centroid_id")).alias("best"))
        .select("vec_id", F.col("best.centroid_id").alias("list_id"))
    )
    # queries probe their nprobe closest centroid lists
    wq = Window.partitionBy("vec_id").orderBy(
        F.col("c_sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        affinity.where(F.col("vec_id").isin(query_ids))
        .withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= nprobe)
        .select(
            F.col("vec_id").alias("query_id"), F.col("centroid_id").alias("list_id")
        )
    )
    candidates = (
        assignment.join(F.broadcast(probes), "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    queries = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        candidates.join(corpus, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )

def ivf_topk_sql(
    query_ids: list[int],
    k: int = DEFAULT_K,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> str:
    """Full DuckDB oracle for ``ivf_topk``: centroid selection (md5-ordered
    sample), list assignment (argmax affinity; ties break to the LARGER
    centroid_id, matching Spark's max-struct ordering) and probe/scoring are
    all deterministic."""
    from .hashing import md5_int_sql

    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH centroids AS (
            SELECT vec_id AS centroid_id, embedding AS c_emb
            FROM embeddings
            ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
            LIMIT {n_centroids}
        ),
        affinity AS (
            SELECT e.vec_id, c.centroid_id,
                   list_cosine_similarity(
                       e.embedding::DOUBLE[], c.c_emb::DOUBLE[]) AS c_sim
            FROM embeddings e CROSS JOIN centroids c
        ),
        assignment AS (
            SELECT vec_id, centroid_id AS list_id
            FROM (
                SELECT vec_id, centroid_id,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY c_sim DESC, centroid_id DESC
                       ) AS rn
                FROM affinity
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS query_id, centroid_id AS list_id
            FROM (
                SELECT vec_id, centroid_id,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY c_sim DESC, centroid_id ASC
                       ) AS pr
                FROM affinity WHERE vec_id IN ({ids})
            ) WHERE pr <= {nprobe}
        ),
        cand AS (
            SELECT p.query_id, a.vec_id
            FROM assignment a JOIN probes p USING (list_id)
            WHERE a.vec_id <> p.query_id
        ),
        scored AS (
            SELECT cand.query_id, cand.vec_id,
                   round(list_cosine_similarity(
                       q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
            FROM cand
            JOIN embeddings c ON c.vec_id = cand.vec_id
            JOIN embeddings q ON q.vec_id = cand.query_id
        )
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
               ) AS INT) AS rank
        FROM scored
        QUALIFY rank <= {k}
        ORDER BY query_id, rank
    """


# --- ANN evaluation: recall@k -------------------------------------------------


def lsh_recall_at_k(
    embeddings: DataFrame, query_ids: list[int], k: int = DEFAULT_K
) -> DataFrame:
    """Recall@k of the LSH index against exact brute force — the evaluation
    every ANN deployment runs before trusting its index: per query, what
    fraction of the TRUE top-k the bucketed search returned.

    Pure composition of the two existing top-k pipelines (both md5-
    deterministic): a left join of truth to candidate on (query, vec) counts
    hits; recall divides exact integers. The report is |queries| rows plus
    a summary mean."""
    truth = brute_force_topk(embeddings, query_ids, k).select(
        "query_id", "vec_id", F.lit(1).alias("is_true")
    )
    got = lsh_bucket_topk(embeddings, query_ids, k).select(
        "query_id", "vec_id", F.lit(1).alias("is_got")
    )
    per_query = (
        truth.join(got, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce("is_got", F.lit(0))).alias("n_hit"),
        )
        .select(
            "query_id",
            "n_true",
            "n_hit",
            (F.col("n_hit").cast("double") / F.col("n_true").cast("double")).alias(
                "recall_at_k"
            ),
        )
    )
    return per_query.orderBy("query_id")


def lsh_recall_at_k_sql(query_ids: list[int], k: int = DEFAULT_K) -> str:
    return f"""
        WITH truth AS (
            SELECT query_id, vec_id FROM ({brute_force_topk_sql(query_ids, k)})
        ), got AS (
            SELECT query_id, vec_id FROM ({lsh_bucket_topk_sql(query_ids, k)})
        )
        SELECT t.query_id,
               COUNT(*) AS n_true,
               CAST(SUM(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               CAST(SUM(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS recall_at_k
        FROM truth t
        LEFT JOIN got g ON t.query_id = g.query_id AND t.vec_id = g.vec_id
        GROUP BY t.query_id
        ORDER BY t.query_id
    """


# --- hard-negative mining -------------------------------------------------------


def hard_negatives_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = DEFAULT_K
) -> DataFrame:
    """Top-k HARD NEGATIVES per query vector: the most cosine-similar corpus
    vectors whose ``label`` DIFFERS from the query's — the contrastive-
    training mining step (high-similarity, wrong-class examples carry the
    gradient signal; random negatives are trivially separable).

    Same plan shape as ``brute_force_topk`` (broadcast query set, per-query
    rank window, no corpus shuffle) plus the one extra label predicate; at
    scale the brute-force scorer swaps for the IVF/LSH candidate generator
    with the identical predicate applied post-candidates."""
    corpus = embeddings.select(
        "vec_id", "label", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    queries = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("label") != F.col("q_label"))
        .select(
            "query_id",
            "q_label",
            "vec_id",
            F.col("label").alias("neg_label"),
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hard_negatives_topk_sql(query_ids: list[int], k: int = DEFAULT_K) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH queries AS (
            SELECT vec_id AS query_id, label AS q_label, embedding AS q_emb
            FROM embeddings WHERE vec_id IN ({ids})
        ),
        scored AS (
            SELECT q.query_id, q.q_label, c.vec_id, c.label AS neg_label,
                   round(list_cosine_similarity(
                       q.q_emb::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings c CROSS JOIN queries q
            WHERE c.label <> q.q_label
        )
        SELECT query_id, q_label, vec_id, neg_label, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
               ) AS INT) AS rank
        FROM scored
        QUALIFY rank <= {k}
        ORDER BY query_id, rank
    """


# --- IVF tuning curve (recall@k vs nprobe) ----------------------------------------

IVF_SWEEP_NPROBES = (1, 2, 4)


def ivf_recall_curve(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = DEFAULT_K,
    n_centroids: int = IVF_CENTROIDS,
    nprobes: tuple[int, ...] = IVF_SWEEP_NPROBES,
) -> DataFrame:
    """Recall@k of the IVF index vs brute force ACROSS the nprobe sweep —
    the tuning table an operator reads before fixing the latency/recall
    trade-off (recall must be monotone in nprobe; where it plateaus is the
    cheapest safe setting).

    Composition of the two existing deterministic pipelines (the
    lsh_recall_at_k treatment), one IVF run per swept nprobe, aggregated to
    a ≤|nprobes|-row curve. Exact integer hit counts; the mean recall is a
    division of identical exact integers emitted in milli."""
    truth = brute_force_topk(embeddings, query_ids, k).select(
        "query_id", "vec_id"
    )
    curves = []
    for np_ in nprobes:
        got = ivf_topk(embeddings, query_ids, k, n_centroids, np_).select(
            "query_id", F.col("vec_id").alias("got_id")
        )
        per_q = (
            truth.join(
                got,
                (truth["query_id"] == got["query_id"])
                & (truth["vec_id"] == got["got_id"]),
                "left",
            )
            .groupBy(truth["query_id"])
            .agg(
                F.count("*").alias("n_true"),
                F.count("got_id").alias("n_hit"),
            )
        )
        curves.append(
            per_q.agg(
                F.lit(np_).alias("nprobe"),
                F.sum("n_true").alias("n_true"),
                F.sum("n_hit").alias("n_hit"),
                F.round(
                    F.lit(1000.0) * F.sum("n_hit") / F.sum("n_true")
                )
                .cast("long")
                .alias("recall_milli"),
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out.orderBy("nprobe")


def ivf_recall_curve_sql(
    query_ids: list[int],
    k: int = DEFAULT_K,
    n_centroids: int = IVF_CENTROIDS,
    nprobes: tuple[int, ...] = IVF_SWEEP_NPROBES,
) -> str:
    def one(np_: int) -> str:
        return f"""
            SELECT {np_} AS nprobe,
                   COUNT(*) AS n_true,
                   CAST(SUM(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
                   CAST(round(1000.0 *
                       SUM(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                       / COUNT(*)) AS BIGINT) AS recall_milli
            FROM ({brute_force_topk_sql(query_ids, k)}) t
            LEFT JOIN ({ivf_topk_sql(query_ids, k, n_centroids, np_)}) g
              ON t.query_id = g.query_id AND t.vec_id = g.vec_id
        """

    body = "\n            UNION ALL\n".join(one(np_) for np_ in nprobes)
    return f"""
        SELECT * FROM (
            {body}
        )
        ORDER BY nprobe
    """


# --- maximal marginal relevance re-ranking --------------------------------------

MMR_POOL = 20
MMR_K = 5
MMR_LAMBDA6 = 700_000  # λ = 0.7 in micro


def mmr_rerank(
    embeddings: DataFrame,
    query_id: int,
    pool: int = MMR_POOL,
    k: int = MMR_K,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: from the exact top-``pool``
    cosine candidates, greedily select ``k`` maximizing
    λ·sim(query, d) − (1−λ)·max_{s∈selected} sim(d, s) — the standard
    diversity-aware retrieval re-rank (RAG context selection, dedup-aware
    search) that plain top-k cannot express.

    The candidate pool is one broadcast-query scan + distributed top-pool
    (the brute_force_topk plan) checkpointed once at ≤``pool`` rows; every
    greedy round then runs on that tiny relation (broadcast selected set,
    max-pair-sim aggregate, top-1) — corpus-scale work happens exactly
    once, the iteration cost is O(pool·k) on 6-dp-rounded similarities with
    vec_id tiebreaks, so the argmax is engine-deterministic (the
    brute_force_topk convention)."""
    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    q = corpus.where(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    cands = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            "embedding",
            "nrm",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("simq"),
        )
        .orderBy(F.desc("simq"), "vec_id")
        .limit(pool)
        .localCheckpoint()
    )
    selected = (
        cands.orderBy(F.desc("simq"), "vec_id")
        .limit(1)
        .select(
            F.lit(1).alias("sel_round"),
            "vec_id",
            "embedding",
            "nrm",
            "simq",
            F.lit(None).cast("double").alias("mmr"),
        )
        .localCheckpoint()
    )
    lam = MMR_LAMBDA6 / 1_000_000
    for r in range(2, k + 1):
        sel = selected.select(
            F.col("vec_id").alias("s_id"),
            F.col("embedding").alias("s_emb"),
            F.col("nrm").alias("s_nrm"),
        )
        pair = F.round(
            _dot(F.col("embedding"), F.col("s_emb"))
            / (F.col("nrm") * F.col("s_nrm")),
            6,
        )
        winner = (
            cands.join(
                selected.select(F.col("vec_id")), "vec_id", "left_anti"
            )
            .crossJoin(F.broadcast(sel))
            .select("vec_id", "embedding", "nrm", "simq", pair.alias("ps"))
            .groupBy("vec_id")
            .agg(
                F.first("embedding").alias("embedding"),
                F.first("nrm").alias("nrm"),
                F.first("simq").alias("simq"),
                F.max("ps").alias("ms"),
            )
            .select(
                "vec_id",
                "embedding",
                "nrm",
                "simq",
                F.round(
                    F.lit(lam) * F.col("simq")
                    - F.lit(1 - lam) * F.col("ms"),
                    6,
                ).alias("mmr"),
            )
            .orderBy(F.desc("mmr"), "vec_id")
            .limit(1)
            .select(
                F.lit(r).alias("sel_round"),
                "vec_id",
                "embedding",
                "nrm",
                "simq",
                "mmr",
            )
        )
        selected = selected.unionAll(winner).localCheckpoint()
    return selected.select("sel_round", "vec_id", "simq", "mmr").orderBy(
        "sel_round"
    )


def mmr_rerank_sql(
    query_id: int, pool: int = MMR_POOL, k: int = MMR_K
) -> str:
    lam = MMR_LAMBDA6 / 1_000_000
    cos = (
        "round(list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[]), 6)"
    )
    parts = [
        f"""
    WITH cand AS (
        SELECT c.vec_id, c.embedding,
               {cos.format(a='q.q_emb', b='c.embedding')} AS simq
        FROM embeddings c CROSS JOIN (
            SELECT embedding AS q_emb FROM embeddings
            WHERE vec_id = {query_id}
        ) q
        WHERE c.vec_id <> {query_id}
        ORDER BY simq DESC, c.vec_id LIMIT {pool}
    ),
    s1 AS (
        SELECT vec_id, embedding, simq FROM cand
        ORDER BY simq DESC, vec_id LIMIT 1
    )"""
    ]
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM s{i}" for i in range(1, r)
        )
        sel_union = " UNION ALL ".join(
            f"SELECT embedding FROM s{i}" for i in range(1, r)
        )
        parts.append(
            f""",
    m{r} AS (
        SELECT c.vec_id, any_value(c.embedding) AS embedding,
               any_value(c.simq) AS simq,
               MAX({cos.format(a='c.embedding', b='s.embedding')}) AS ms
        FROM cand c CROSS JOIN ({sel_union}) s
        WHERE c.vec_id NOT IN ({prev})
        GROUP BY c.vec_id
    ),
    s{r} AS (
        SELECT vec_id, embedding, simq,
               round({lam!r} * simq - {1 - lam!r} * ms, 6) AS mmr
        FROM m{r}
        ORDER BY mmr DESC, vec_id LIMIT 1
    )"""
        )
    finals = " UNION ALL ".join(
        [
            "SELECT 1 AS sel_round, vec_id, simq,"
            " CAST(NULL AS DOUBLE) AS mmr FROM s1"
        ]
        + [
            f"SELECT {r} AS sel_round, vec_id, simq, mmr FROM s{r}"
            for r in range(2, k + 1)
        ]
    )
    return "".join(parts) + f"\n    {finals}\n    ORDER BY sel_round"

# --- sign-projection Hamming near-dup index ------------------------------------------

HAM_BANDS = 3
HAM_BAND_BITS = 8
HAM_MAX = 2


def embedding_hamming_pairs(
    embeddings: DataFrame,
    bands: int = HAM_BANDS,
    band_bits: int = HAM_BAND_BITS,
    max_hamming: int = HAM_MAX,
    dim: int = 64,
) -> DataFrame:
    """SimHash-for-embeddings: 24 sign-projection bits per vector, banded
    8+8+8; pairs sharing any band verify by exact signature Hamming distance
    (≤ ``max_hamming``) and report cosine — (vec_a, vec_b, hamming,
    cos_milli).

    The binary-index twin of MinHash-LSH for the embedding space: two
    vectors within Hamming ``d`` of each other on ``bands`` bands must agree
    on a full band whenever d < bands (pigeonhole), so candidate recall is
    structural, not probabilistic. Signatures are ints — the self-join
    shuffles 2 longs per row, never the float arrays; embeddings re-join
    only for surviving pairs.

    Scale shape: identical to the text SimHash pipeline (banded buckets,
    candidates-only verification); hyperplanes are md5-derived constants so
    the whole index is deterministic and oracle-checkable."""
    planes_by_band = [
        [_hyperplane(dim, t, p) for p in range(band_bits)] for t in range(bands)
    ]

    def band_sig(t: int) -> str:
        bits = []
        for p in range(band_bits):
            hp = ", ".join(f"{v!r}D" for v in planes_by_band[t][p])
            dot = (
                f"aggregate(zip_with(embedding, array({hp}), "
                f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
            )
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
        return f"CAST({' + '.join(bits)} AS BIGINT)"

    sigs = embeddings.selectExpr(
        "vec_id",
        *[f"{band_sig(t)} AS b{t}" for t in range(bands)],
    ).selectExpr(
        "vec_id",
        " + ".join(f"b{t} * {1 << (t * band_bits)}" for t in range(bands))
        + " AS sig",
        *[f"b{t}" for t in range(bands)],
    )
    banded = sigs.selectExpr(
        "vec_id",
        "sig",
        "explode(array({})) AS band".format(
            ", ".join(f"concat_ws('_', '{t}', CAST(b{t} AS STRING))" for t in range(bands))
        ),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), "band")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
        .withColumn("hamming", F.expr("bit_count(sig_a ^ sig_b)"))
        .where(F.col("hamming") <= max_hamming)
    )
    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    return (
        cand.join(
            corpus.selectExpr(
                "vec_id AS vec_a", "embedding AS emb_a", "nrm AS nrm_a"
            ),
            "vec_a",
        )
        .join(
            corpus.selectExpr(
                "vec_id AS vec_b", "embedding AS emb_b", "nrm AS nrm_b"
            ),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            F.col("hamming").cast("long").alias("hamming"),
            F.expr(
                "CAST(round(1000 * aggregate(zip_with(emb_a, emb_b,"
                " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
                " 0.0D, (acc, x) -> acc + x) / (nrm_a * nrm_b)) AS BIGINT)"
            ).alias("cos_milli"),
        )
        .orderBy("vec_a", "vec_b")
    )


def embedding_hamming_pairs_sql(
    bands: int = HAM_BANDS,
    band_bits: int = HAM_BAND_BITS,
    max_hamming: int = HAM_MAX,
    dim: int = 64,
) -> str:
    planes_by_band = [
        [_hyperplane(dim, t, p) for p in range(band_bits)] for t in range(bands)
    ]

    def band_sig(t: int) -> str:
        bits = []
        for p in range(band_bits):
            hp = ", ".join(repr(v) for v in planes_by_band[t][p])
            dot = f"list_dot_product(embedding::DOUBLE[], [{hp}])"
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
        return f"CAST({' + '.join(bits)} AS BIGINT)"

    band_cols = ",\n                   ".join(
        f"{band_sig(t)} AS b{t}" for t in range(bands)
    )
    sig_expr = " + ".join(f"b{t} * {1 << (t * band_bits)}" for t in range(bands))
    band_tags = ", ".join(
        f"concat_ws('_', '{t}', CAST(b{t} AS VARCHAR))" for t in range(bands)
    )
    return f"""
        WITH sigs AS (
            SELECT vec_id, {sig_expr} AS sig, b0, b1, b2
            FROM (
                SELECT vec_id,
                   {band_cols}
                FROM embeddings
            )
        ),
        banded AS (
            SELECT vec_id, sig, unnest([{band_tags}]) AS band FROM sigs
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   a.sig AS sig_a, b.sig AS sig_b
            FROM banded a JOIN banded b USING (band)
            WHERE a.vec_id < b.vec_id
        ),
        verified AS (
            SELECT vec_a, vec_b,
                   CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
            FROM cand
            WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
        )
        SELECT v.vec_a, v.vec_b, v.hamming,
               CAST(round(1000 * list_dot_product(ea.embedding::DOUBLE[],
                                                  eb.embedding::DOUBLE[])
                    / (sqrt(list_dot_product(ea.embedding::DOUBLE[],
                                             ea.embedding::DOUBLE[]))
                       * sqrt(list_dot_product(eb.embedding::DOUBLE[],
                                               eb.embedding::DOUBLE[]))))
                    AS BIGINT) AS cos_milli
        FROM verified v
        JOIN embeddings ea ON ea.vec_id = v.vec_a
        JOIN embeddings eb ON eb.vec_id = v.vec_b
        ORDER BY v.vec_a, v.vec_b
    """

# --- multiprobe LSH ------------------------------------------------------------------

MP_TABLES = 4


def multiprobe_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = DEFAULT_K,
    tables: int = MP_TABLES,
    planes: int = LSH_HYPERPLANES,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k via MULTIPROBE hyperplane LSH: queries probe their own
    bucket AND every one-bit-flipped neighbor bucket per table, so a vector
    that lands just across one hyperplane is still found — the recall of
    ~(planes+1)× more tables at the memory cost of ``tables`` (Lv et al.,
    the standard LSH memory/recall trade).

    The corpus is bucketed ONCE per table (same narrow sign-projection as
    ``lsh_bucket_topk``); only the tiny query side expands ×(planes+1).
    Deterministic md5-derived hyperplanes keep the whole index
    oracle-checkable.

    Scale shape: candidate generation is a broadcast join of the expanded
    query-probe set against the corpus bucket relation; scoring joins
    embeddings only for surviving candidates."""
    planes_by_table = [
        [_hyperplane(dim, t, p) for p in range(planes)] for t in range(tables)
    ]

    def bucket_bits(t: int) -> str:
        bits = []
        for p in range(planes):
            hp = ", ".join(f"{v!r}D" for v in planes_by_table[t][p])
            dot = (
                f"aggregate(zip_with(embedding, array({hp}), "
                f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
            )
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(bits)

    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    bucketed = corpus.selectExpr(
        "vec_id",
        "explode(array({})) AS bucket".format(
            ", ".join(
                f"concat_ws('_', '{t}', CAST({bucket_bits(t)} AS STRING))"
                for t in range(tables)
            )
        ),
    )
    # query probes: exact bucket + every one-bit flip (XOR with 1<<p)
    probe_exprs = []
    for t in range(tables):
        base = f"({bucket_bits(t)})"
        probe_exprs.append(f"concat_ws('_', '{t}', CAST({base} AS STRING))")
        for p in range(planes):
            probe_exprs.append(
                f"concat_ws('_', '{t}', CAST({base} ^ {1 << p} AS STRING))"
            )
    q_probes = (
        corpus.where(F.col("vec_id").isin(query_ids))
        .selectExpr(
            "vec_id AS query_id",
            "explode(array({})) AS bucket".format(", ".join(probe_exprs)),
        )
        .distinct()
    )
    candidates = (
        bucketed.join(F.broadcast(q_probes), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    queries = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        candidates.join(corpus, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def multiprobe_lsh_topk_sql(
    query_ids: list[int],
    k: int = DEFAULT_K,
    tables: int = MP_TABLES,
    planes: int = LSH_HYPERPLANES,
    dim: int = 64,
) -> str:
    planes_by_table = [
        [_hyperplane(dim, t, p) for p in range(planes)] for t in range(tables)
    ]

    def bucket_bits(t: int) -> str:
        bits = []
        for p in range(planes):
            hp = ", ".join(repr(v) for v in planes_by_table[t][p])
            dot = f"list_dot_product(embedding::DOUBLE[], [{hp}])"
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
        return " + ".join(bits)

    ids = ", ".join(str(i) for i in query_ids)
    corpus_buckets = ",\n                ".join(
        f"concat_ws('_', '{t}', CAST({bucket_bits(t)} AS VARCHAR))"
        for t in range(tables)
    )
    probes = []
    for t in range(tables):
        base = f"({bucket_bits(t)})"
        probes.append(f"concat_ws('_', '{t}', CAST({base} AS VARCHAR))")
        for p in range(planes):
            probes.append(
                f"concat_ws('_', '{t}', CAST(xor({base}, {1 << p}) AS VARCHAR))"
            )
    probe_list = ",\n                ".join(probes)
    return f"""
        WITH bucketed AS (
            SELECT vec_id, unnest([
                {corpus_buckets}
            ]) AS bucket
            FROM embeddings
        ),
        q_probes AS (
            SELECT DISTINCT vec_id AS query_id, unnest([
                {probe_list}
            ]) AS bucket
            FROM embeddings WHERE vec_id IN ({ids})
        ),
        candidates AS (
            SELECT DISTINCT q.query_id, b.vec_id
            FROM bucketed b JOIN q_probes q USING (bucket)
            WHERE b.vec_id <> q.query_id
        ),
        scored AS (
            SELECT c.query_id, c.vec_id,
                   round(list_dot_product(eq.embedding::DOUBLE[],
                                          ec.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(eq.embedding::DOUBLE[],
                                                  eq.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(ec.embedding::DOUBLE[],
                                                    ec.embedding::DOUBLE[]))),
                         6) AS cosine
            FROM candidates c
            JOIN embeddings eq ON eq.vec_id = c.query_id
            JOIN embeddings ec ON ec.vec_id = c.vec_id
        )
        SELECT query_id, vec_id, cosine, rank FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
            ) AS rank
            FROM scored
        )
        WHERE rank <= {k}
        ORDER BY query_id, rank
    """


# --- product-quantization ADC search ------------------------------------------------

PQ_ADC_SUB = 8  # 64 dims -> 8 subvectors of 8
PQ_ADC_CODES = 16  # centroids per subspace


def pq_adc_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = DEFAULT_K
) -> DataFrame:
    """Product-quantization asymmetric-distance (ADC) top-k search (Jégou
    et al., TPAMI 2011): the corpus is seen ONLY through its 4-bit PQ codes;
    each query precomputes an 8x16 lookup table of exact subspace distances
    to the codebook, and a vector's approximate distance is the integer sum
    of 8 table lookups — the memory layout that serves billion-vector
    indexes from RAM. Output: (query_id, rank, vec_id, adc_nano, in_exact)
    with in_exact marking membership in the EXACT L2 top-k, so the result
    doubles as the recall report.

    Codebooks are the md5-ordered corpus samples of embedding_product_
    quantization (deterministic, no RNG); every distance is nano-quantized
    ONCE per (pair, subspace) and summed as exact BIGINTs, so ranking ties
    and the oracle hash are bit-stable cross-engine. The exact side reuses
    the identical per-subspace quantization (sum of 8 rounded sub-distances)
    rather than one 64-term fold — same numbers, same certainty.

    Scale shape: corpus encoding is one broadcast-codebook argmin per
    (vector, subspace) — embarrassingly parallel, done once and stored in a
    deployment; the search itself joins codes to the broadcast 640-row LUT
    and takes a per-query partial top-k. No corpus shuffle anywhere."""
    from .hashing import md5_int

    m_sub, k_codes = PQ_ADC_SUB, PQ_ADC_CODES
    codebook = (
        embeddings.orderBy(md5_int(F.col("vec_id").cast("string")), "vec_id")
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
    subs = embeddings.select(
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
    d_nano = F.round(
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
    # corpus -> codes: argmin centroid per (vector, subspace)
    codes = (
        subs.join(F.broadcast(codebook), "m")
        .select("vec_id", "m", F.struct(d_nano.alias("d"), F.col("code")).alias("cand"))
        .groupBy("vec_id", "m")
        .agg(F.min("cand").alias("best"))
        .select("vec_id", "m", F.col("best.code").alias("code"))
    )
    # query -> LUT: exact subspace distance to every centroid
    q_subs = subs.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "m", F.col("sub").alias("q_sub")
    )
    lut = (
        q_subs.join(F.broadcast(codebook), "m")
        .select(
            "query_id",
            "m",
            "code",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("q_sub"),
                        F.col("c_sub"),
                        lambda x, y: (x.cast("double") - y.cast("double"))
                        * (x.cast("double") - y.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("d"),
        )
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc_nano"))
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.col("adc_nano").asc(), F.col("vec_id").asc()
    )
    approx = adc.withColumn("rank", F.row_number().over(w_q)).where(
        F.col("rank") <= k
    )
    # exact L2 top-k under the identical per-subspace nano quantization
    exact_d = (
        subs.join(
            F.broadcast(
                subs.where(F.col("vec_id").isin(query_ids)).select(
                    F.col("vec_id").alias("query_id"),
                    "m",
                    F.col("sub").alias("q_sub"),
                )
            ),
            "m",
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("sub"),
                        F.col("q_sub"),
                        lambda x, y: (x.cast("double") - y.cast("double"))
                        * (x.cast("double") - y.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("d"),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("l2_nano"))
    )
    w_e = Window.partitionBy("query_id").orderBy(
        F.col("l2_nano").asc(), F.col("vec_id").asc()
    )
    exact_topk = (
        exact_d.withColumn("erank", F.row_number().over(w_e))
        .where(F.col("erank") <= k)
        .select("query_id", "vec_id", F.lit(1).alias("in_exact"))
    )
    return (
        approx.join(exact_topk, ["query_id", "vec_id"], "left")
        .select(
            "query_id",
            "rank",
            "vec_id",
            "adc_nano",
            F.coalesce("in_exact", F.lit(0)).cast("int").alias("in_exact"),
        )
        .orderBy("query_id", "rank")
    )


def pq_adc_topk_sql(query_ids: list[int], k: int = DEFAULT_K) -> str:
    from .hashing import md5_int_sql

    ids = ", ".join(str(i) for i in query_ids)
    m_sub, k_codes = PQ_ADC_SUB, PQ_ADC_CODES
    subd = (
        "CAST(round(list_sum(list_transform(range(1, 9),"
        " i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))) * 1e9)"
        " AS BIGINT)"
    )
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
            SELECT vec_id, s.m, {subd.format(a="sub", b="c_sub")} AS d, code
            FROM subs s JOIN codebook c ON s.m = c.m
        ), codes AS (
            SELECT vec_id, m, (MIN(struct_pack(d := d, code := code))).code
                       AS code
            FROM scored GROUP BY vec_id, m
        ), lut AS (
            SELECT q.vec_id AS query_id, q.m, c.code,
                   {subd.format(a="q.sub", b="c.c_sub")} AS d
            FROM subs q JOIN codebook c ON q.m = c.m
            WHERE q.vec_id IN ({ids})
        ), adc AS (
            SELECT l.query_id, co.vec_id, CAST(SUM(l.d) AS BIGINT) AS adc_nano
            FROM codes co JOIN lut l ON co.m = l.m AND co.code = l.code
            WHERE co.vec_id <> l.query_id
            GROUP BY l.query_id, co.vec_id
        ), approx AS (
            SELECT query_id, vec_id, adc_nano,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY adc_nano ASC, vec_id ASC) AS INT) AS rank
            FROM adc
            QUALIFY rank <= {k}
        ), exact_d AS (
            SELECT q.vec_id AS query_id, s.vec_id,
                   CAST(SUM({subd.format(a="s.sub", b="q.sub")}) AS BIGINT)
                       AS l2_nano
            FROM subs s
            JOIN subs q ON s.m = q.m AND q.vec_id IN ({ids})
            WHERE s.vec_id <> q.vec_id
            GROUP BY q.vec_id, s.vec_id
        ), exact_topk AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY l2_nano ASC, vec_id ASC) AS erank
                FROM exact_d
            ) WHERE erank <= {k}
        )
        SELECT a.query_id, a.rank, a.vec_id, a.adc_nano,
               CAST(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
                   AS in_exact
        FROM approx a
        LEFT JOIN exact_topk e
          ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        ORDER BY a.query_id, a.rank
    """


# --- NDCG ranking-quality evaluation ------------------------------------------------

# integer milli-scaled discount weights round(1e6 / log2(r + 1)) for r = 1..5,
# precomputed so no engine ever evaluates a log at runtime
NDCG_W = (1000000, 630930, 500000, 430677, 386853)
NDCG_IDCG = 7323467  # sum of rel (4,3,2,1,0) * NDCG_W — the ideal DCG


def ndcg_eval(
    embeddings: DataFrame, query_ids: list[int], k: int = DEFAULT_K
) -> DataFrame:
    """NDCG@k of the LSH approximate ranking against the exact cosine
    ranking — the GRADED ranking metric recall@k cannot see (it treats
    rank 1 and rank k alike): exact neighbors get graded relevance
    k−rank, the LSH list is scored with precomputed integer discount
    weights, and NDCG = DCG/IDCG where the ideal is the constant
    {NDCG_IDCG}. Output: (query_id, n_hits, dcg_scaled, ndcg_milli).

    Everything is exact-integer: relevance grades, the weight table and
    IDCG are constants, DCG is a Σ rel·w BIGINT, and ndcg_milli is one
    positive floor division — nothing to drift cross-engine.

    Scale shape: both rankings come from the existing broadcast-query
    pipelines (corpus never shuffles); the join aligning them is
    (query, vec)-keyed over ≤ |queries|·k rows."""
    exact = brute_force_topk(embeddings, query_ids, k).select(
        "query_id", "vec_id", (F.lit(k) - F.col("rank")).alias("rel")
    )
    approx = lsh_bucket_topk(embeddings, query_ids, k).select(
        "query_id", "vec_id", F.col("rank").alias("arank")
    )
    w_expr = "CASE arank " + " ".join(
        f"WHEN {r + 1} THEN {w}" for r, w in enumerate(NDCG_W)
    ) + " ELSE 0 END"
    per_q = (
        approx.join(exact, ["query_id", "vec_id"], "left")
        .select(
            "query_id",
            F.coalesce("rel", F.lit(0)).alias("rel"),
            F.expr(w_expr).alias("w"),
        )
        .groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
            F.sum(F.col("rel") * F.col("w")).alias("dcg_scaled"),
        )
    )
    return per_q.select(
        "query_id",
        "n_hits",
        "dcg_scaled",
        F.expr(f"CAST(1000 * dcg_scaled DIV {NDCG_IDCG} AS BIGINT)").alias(
            "ndcg_milli"
        ),
    ).orderBy("query_id")


def ndcg_eval_sql(query_ids: list[int], k: int = DEFAULT_K) -> str:
    w_expr = "CASE a.rank " + " ".join(
        f"WHEN {r + 1} THEN {w}" for r, w in enumerate(NDCG_W)
    ) + " ELSE 0 END"
    return f"""
        WITH exact_r AS ({brute_force_topk_sql(query_ids, k)}),
        approx_r AS ({lsh_bucket_topk_sql(query_ids, k)}),
        aligned AS (
            SELECT a.query_id,
                   COALESCE({k} - e.rank, 0) AS rel,
                   {w_expr} AS w
            FROM approx_r a
            LEFT JOIN exact_r e
              ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        )
        SELECT query_id,
               CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hits,
               CAST(SUM(rel * w) AS BIGINT) AS dcg_scaled,
               CAST(1000 * SUM(rel * w) // {NDCG_IDCG} AS BIGINT)
                   AS ndcg_milli
        FROM aligned
        GROUP BY query_id
        ORDER BY query_id
    """


# --- triplet mining ------------------------------------------------------------------

TRIPLET_MARGIN = 0.05


def triplet_mining(
    embeddings: DataFrame, anchor_ids: list[int], margin: float = TRIPLET_MARGIN
) -> DataFrame:
    """Hard-triplet mining for metric-learning training data: for each
    anchor, the hardest POSITIVE is its most-similar same-label vector and
    the hardest NEGATIVE its most-similar other-label vector; the triplet
    is worth training on when the margin is violated (neg_cos > pos_cos −
    margin — FaceNet's semi-hard criterion, Schroff et al. 2015). Output:
    (anchor_id, label, pos_id, pos_cos, neg_id, neg_cos, margin_violated).

    Cosines follow the repo's certified convention (one round(·,6) per
    score — both engines evaluate the same dot/norm fold); the argmax per
    (anchor, side) is a min-struct aggregate with vec_id tiebreak, and the
    margin test compares two identically-rounded doubles against an exact
    literal.

    Scale shape: anchors broadcast against the corpus (the brute-force-
    topk economics — no corpus shuffle); two aggregates on the anchor key."""
    corpus = embeddings.select(
        "vec_id", "label", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    anchors = corpus.where(F.col("vec_id").isin(anchor_ids)).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "a_label",
            "vec_id",
            "label",
            F.round(
                _dot(F.col("a_emb"), F.col("embedding"))
                / (F.col("a_nrm") * F.col("nrm")),
                6,
            ).alias("cosine"),
        )
    )
    best = lambda df, out_id, out_cos: (  # noqa: E731
        df.select(
            "anchor_id",
            "a_label",
            F.struct(
                (-F.col("cosine")).alias("neg_cos"), F.col("vec_id").alias("v")
            ).alias("cand"),
            "cosine",
        )
        .groupBy("anchor_id", "a_label")
        .agg(F.min("cand").alias("b"))
        .select(
            "anchor_id",
            "a_label",
            F.col("b.v").alias(out_id),
            (-F.col("b.neg_cos")).alias(out_cos),
        )
    )
    pos = best(scored.where(F.col("label") == F.col("a_label")), "pos_id", "pos_cos")
    neg = best(scored.where(F.col("label") != F.col("a_label")), "neg_id", "neg_cos")
    return (
        pos.join(neg, ["anchor_id", "a_label"])
        .select(
            "anchor_id",
            F.col("a_label").alias("label"),
            "pos_id",
            "pos_cos",
            "neg_id",
            "neg_cos",
            (F.col("neg_cos") > F.col("pos_cos") - F.lit(margin)).alias(
                "margin_violated"
            ),
        )
        .orderBy("anchor_id")
    )


def triplet_mining_sql(
    anchor_ids: list[int], margin: float = TRIPLET_MARGIN
) -> str:
    ids = ", ".join(str(i) for i in anchor_ids)
    return f"""
        WITH anchors AS (
            SELECT vec_id AS anchor_id, label AS a_label, embedding AS a_emb
            FROM embeddings WHERE vec_id IN ({ids})
        ),
        scored AS (
            SELECT a.anchor_id, a.a_label, c.vec_id, c.label,
                   round(list_cosine_similarity(
                       a.a_emb::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings c CROSS JOIN anchors a
            WHERE c.vec_id <> a.anchor_id
        ),
        pos AS (
            SELECT anchor_id, a_label,
                   (MIN(struct_pack(nc := -cosine, v := vec_id))).v AS pos_id,
                   -(MIN(struct_pack(nc := -cosine, v := vec_id))).nc AS pos_cos
            FROM scored WHERE label = a_label GROUP BY anchor_id, a_label
        ),
        neg AS (
            SELECT anchor_id, a_label,
                   (MIN(struct_pack(nc := -cosine, v := vec_id))).v AS neg_id,
                   -(MIN(struct_pack(nc := -cosine, v := vec_id))).nc AS neg_cos
            FROM scored WHERE label <> a_label GROUP BY anchor_id, a_label
        )
        SELECT p.anchor_id, p.a_label AS label,
               p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
               n.neg_cos > p.pos_cos - {margin} AS margin_violated
        FROM pos p JOIN neg n USING (anchor_id, a_label)
        ORDER BY p.anchor_id
    """


# --- MIPS-to-L2 reduction ------------------------------------------------------------

MIPS_SCALE_MILLI = 1000  # augmentation scale: vectors pre-scaled to |x| <= ~1


def mips_reduction(embeddings: DataFrame, query_ids: list[int]) -> DataFrame:
    """Maximum-inner-product search via the L2 reduction (Bachrach et al.,
    RecSys 2014): augment every corpus vector with sqrt(M² − |x|²) (M =
    corpus max norm) and queries with 0 — then argmin L2 distance EQUALS
    argmax inner product, so any L2-native ANN index (IVF, PQ, LSH)
    serves MIPS unchanged. Output per query: (query_id, ip_top_id,
    ip_score_nano, l2_top_id, reduction_agrees) — the top-1 by direct
    inner product next to the top-1 by reduced L2, with the agreement
    flag that certifies the transform.

    The augmented coordinate's sqrt is quantized once per vector on the
    exactly-agreed nano |x|² integer (micro-nat discipline); both
    rankings tie-break on vec_id, so agreement is bit-stable. This is the
    bridge operator that lets the repo's PQ/IVF machinery answer
    recommendation-style MIPS queries, not just cosine.

    Scale shape: one corpus pass for norms + the broadcast-query scoring
    economics of brute_force_topk; at deployment the reduced vectors feed
    the existing IVF/PQ indexes."""
    sq_nano = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, t: a + t,
    ) * F.lit(1e9)
    base = embeddings.select(
        "vec_id", "embedding", F.round(sq_nano).cast("long").alias("sq_nano")
    )
    # corpus max-norm scalar rides a broadcast 1-row cross join (not an
    # unpartitioned window, which would single-task the corpus)
    max_sq = base.agg(F.max("sq_nano").alias("max_sq"))
    with_aug = base.crossJoin(F.broadcast(max_sq)).select(
        "vec_id",
        "embedding",
        # augmented coordinate, nano-quantized once: sqrt(M^2 - |x|^2)
        F.round(F.sqrt((F.col("max_sq") - F.col("sq_nano")).cast("double") / 1e9) * 1e9)
        .cast("long")
        .alias("aug_nano"),
        "sq_nano",
    )
    queries = base.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ip_nano = F.round(
        F.aggregate(
            F.zip_with(
                F.col("q_emb"), F.col("embedding"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda a, t: a + t,
        )
        * F.lit(1e9)
    ).cast("long")
    scored = (
        with_aug.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", ip_nano.alias("ip"), "sq_nano", "aug_nano")
        # reduced L2^2 = |x|^2 + aug^2 - 2<q,x> + const(q): rank by
        # (sq + aug^2/1e9 - 2 ip)  -- aug^2 folded to nano once
        .withColumn(
            "l2red",
            F.col("sq_nano")
            + F.expr("CAST(aug_nano * aug_nano DIV 1000000000 AS BIGINT)")
            - 2 * F.col("ip"),
        )
    )
    top_ip = (
        scored.select(
            "query_id",
            F.struct((-F.col("ip")).alias("k"), F.col("vec_id").alias("v"),
                     F.col("ip").alias("s")).alias("c"),
        )
        .groupBy("query_id")
        .agg(F.min("c").alias("b"))
        .select("query_id", F.col("b.v").alias("ip_top_id"),
                F.col("b.s").alias("ip_score_nano"))
    )
    top_l2 = (
        scored.select(
            "query_id",
            F.struct(F.col("l2red").alias("k"), F.col("vec_id").alias("v")).alias("c"),
        )
        .groupBy("query_id")
        .agg(F.min("c").alias("b"))
        .select("query_id", F.col("b.v").alias("l2_top_id"))
    )
    return (
        top_ip.join(top_l2, "query_id")
        .select(
            "query_id",
            "ip_top_id",
            "ip_score_nano",
            "l2_top_id",
            (F.col("ip_top_id") == F.col("l2_top_id")).cast("int").alias(
                "reduction_agrees"
            ),
        )
        .orderBy("query_id")
    )


def mips_reduction_sql(query_ids: list[int]) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    dot = (
        "CAST(round(list_sum(list_transform(range(1, len({a}) + 1),"
        " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) * 1e9)"
        " AS BIGINT)"
    )
    return f"""
        WITH base AS (
            SELECT vec_id, embedding,
                   {dot.format(a="embedding", b="embedding")} AS sq_nano
            FROM embeddings
        ),
        with_aug AS (
            SELECT vec_id, embedding, sq_nano,
                   CAST(round(sqrt(CAST(MAX(sq_nano) OVER () - sq_nano
                        AS DOUBLE) / 1e9) * 1e9) AS BIGINT) AS aug_nano
            FROM base
        ),
        queries AS (
            SELECT vec_id AS query_id, embedding AS q_emb
            FROM base WHERE vec_id IN ({ids})
        ),
        scored AS (
            SELECT q.query_id, w.vec_id,
                   {dot.format(a="q.q_emb", b="w.embedding")} AS ip,
                   w.sq_nano,
                   w.sq_nano + (w.aug_nano * w.aug_nano // 1000000000)
                       - 2 * {dot.format(a="q.q_emb", b="w.embedding")} AS l2red
            FROM with_aug w CROSS JOIN queries q
            WHERE w.vec_id <> q.query_id
        ),
        top_ip AS (
            SELECT query_id,
                   (MIN(struct_pack(k := -ip, v := vec_id, s := ip))).v
                       AS ip_top_id,
                   (MIN(struct_pack(k := -ip, v := vec_id, s := ip))).s
                       AS ip_score_nano
            FROM scored GROUP BY query_id
        ),
        top_l2 AS (
            SELECT query_id,
                   (MIN(struct_pack(k := l2red, v := vec_id))).v AS l2_top_id
            FROM scored GROUP BY query_id
        )
        SELECT i.query_id, i.ip_top_id, i.ip_score_nano, l.l2_top_id,
               CAST(i.ip_top_id = l.l2_top_id AS INT) AS reduction_agrees
        FROM top_ip i JOIN top_l2 l USING (query_id)
        ORDER BY i.query_id
    """


# --- k-NN graph hubness --------------------------------------------------------

HUBNESS_K = 10
# The exact graph is quadratic, so the audit runs on a content-stable
# mod-sample whose modulus ADAPTS to corpus size: mod = smallest power of
# two >= ceil(n / HUBNESS_TARGET), keeping the sampled corpus (and the
# pair volume) bounded at any sf. Exact integer arithmetic (ceil division
# + bit-length), identical in both engines — no float log2 at the
# power-of-two boundaries.
HUBNESS_TARGET = 512


def _hubness_mod(embeddings: DataFrame):
    """1-row (mod) scalar: smallest power of two >= ceil(n / target)."""
    return embeddings.agg(
        F.expr(
            f"CAST(CASE WHEN (COUNT(*) + {HUBNESS_TARGET - 1})"
            f" DIV {HUBNESS_TARGET} <= 1 THEN 1"
            f" ELSE shiftleft(CAST(1 AS BIGINT), length(bin("
            f"(COUNT(*) + {HUBNESS_TARGET - 1}) DIV {HUBNESS_TARGET} - 1)))"
            " END AS BIGINT)"
        ).alias("mod")
    )


HUBNESS_MOD_SQL = f"""
    SELECT CAST(CASE WHEN (COUNT(*) + {HUBNESS_TARGET - 1})
                          // {HUBNESS_TARGET} <= 1 THEN 1
                ELSE (CAST(1 AS BIGINT) << length(bin(
                    (COUNT(*) + {HUBNESS_TARGET - 1}) // {HUBNESS_TARGET} - 1)))
                END AS BIGINT) AS mod
    FROM embeddings
"""


def _sampled_knn(
    embeddings: DataFrame, k: int = HUBNESS_K
) -> tuple[DataFrame, DataFrame]:
    """(corpus, knn): the content-stable adaptive mod-sample and its exact
    top-k cosine graph (vec_id, nbr_id, cosine, rank) — the shared audit
    substrate of knn_hubness / knn_reciprocity (and the same shape the ANN
    indexes emit at corpus scale)."""
    corpus = (
        embeddings.crossJoin(F.broadcast(_hubness_mod(embeddings)))
        .where(F.col("vec_id") % F.col("mod") == 0)
        .select("vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm"))
    )
    right = corpus.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(right))
        .where(F.col("vec_id") != F.col("nbr_id"))
        .select(
            "vec_id",
            "nbr_id",
            F.round(
                _dot(F.col("embedding"), F.col("n_emb"))
                / (F.col("nrm") * F.col("n_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    knn = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    return corpus, knn


def knn_hubness(embeddings: DataFrame, k: int = HUBNESS_K) -> DataFrame:
    """In-degree histogram of the exact k-NN graph — the standard
    embedding-space health check for HUBNESS (Radovanovic et al., JMLR
    2010): in high-dimensional or badly-normalized spaces a few "hub"
    points appear in everyone's neighbor list (in-degree >> k) while
    antihubs appear in none (in-degree 0), and ANN recall, dedup and
    retrieval all degrade. A healthy space has in-degrees concentrated
    near k.

    Graph: each sampled vector's exact top-k cosine neighbors within the
    content-stable adaptive mod-sample (vec_id % mod == 0, mod the smallest power of
    two keeping <= {HUBNESS_TARGET} vectors — content-stable AND bounded
    at any corpus size, so the audit cost never grows quadratically). Output: one row per observed in-degree
    (indeg, n_vecs), exact integers, plus antihubs as indeg = 0.

    Scale shape: the exact graph is quadratic by construction — the
    audit form. At corpus scale the SAME histogram reads off the
    ANN-index neighbor lists (ann_lsh_topk / ann_ivf_topk) instead;
    the brute-force pairing here is the sf-bounded oracle baseline.
    """
    corpus, knn = _sampled_knn(embeddings, k)
    indeg = (
        corpus.select("vec_id")
        .join(
            knn.groupBy("nbr_id").agg(F.count("*").alias("d")),
            corpus.vec_id == F.col("nbr_id"),
            "left",
        )
        .select(F.coalesce("d", F.lit(0)).cast("long").alias("indeg"))
    )
    return (
        indeg.groupBy("indeg")
        .agg(F.count("*").cast("long").alias("n_vecs"))
        .orderBy("indeg")
    )


def knn_hubness_sql(k: int = HUBNESS_K) -> str:
    return f"""
        WITH m AS ({HUBNESS_MOD_SQL}),
        corpus AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id % (SELECT mod FROM m) = 0
        ),
        scored AS (
            SELECT a.vec_id, b.vec_id AS nbr_id,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                       AS cosine
            FROM corpus a CROSS JOIN corpus b
            WHERE a.vec_id <> b.vec_id
        ),
        knn AS (
            SELECT vec_id, nbr_id,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC
                   ) AS rank
            FROM scored
            QUALIFY rank <= {k}
        ),
        indeg AS (
            SELECT c.vec_id, CAST(COALESCE(d.d, 0) AS BIGINT) AS indeg
            FROM corpus c
            LEFT JOIN (
                SELECT nbr_id, COUNT(*) AS d FROM knn GROUP BY nbr_id
            ) d ON d.nbr_id = c.vec_id
        )
        SELECT indeg, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM indeg GROUP BY indeg ORDER BY indeg
    """


# --- k-NN graph reciprocity ---------------------------------------------------------


def knn_reciprocity(embeddings: DataFrame, k: int = HUBNESS_K) -> DataFrame:
    """Per-rank reciprocity curve of the exact k-NN graph: for each neighbor
    rank r, the share of directed edges (x -> its r-th neighbor y) where x
    also appears anywhere in y's own top-k. Low reciprocity at small r is
    the other face of hubness (hubs absorb everyone's edges and return
    none) and predicts poor kNN-graph clustering / NN-descent convergence;
    mutual-kNN filters (the standard semantic-dedup graph cleanup) keep
    exactly the reciprocated edges, so the curve IS that filter's yield.

    Same content-stable adaptive mod-sample and exact top-k graph as
    knn_hubness (shared _sampled_knn); the reciprocation test is one
    self-semi-join of the ≤ sample*k edge list on the reversed key. Output
    per rank: (rank, edges, reciprocal, reciprocity_milli).

    Scale shape: the audit form is sample-bounded at any sf; at corpus
    scale the same curve reads off ANN neighbor lists instead."""
    _, knn = _sampled_knn(embeddings, k)
    edges = knn.select("vec_id", "nbr_id", "rank")
    rev = edges.select(
        F.col("vec_id").alias("nbr_id"), F.col("nbr_id").alias("vec_id")
    ).withColumn("recip", F.lit(1))
    marked = edges.join(rev.distinct(), ["vec_id", "nbr_id"], "left")
    return (
        marked.groupBy("rank")
        .agg(
            F.count("*").cast("long").alias("edges"),
            F.sum(F.coalesce("recip", F.lit(0))).cast("long").alias("reciprocal"),
        )
        .select(
            F.col("rank").cast("int").alias("rank"),
            "edges",
            "reciprocal",
            F.expr("CAST(1000 * reciprocal DIV edges AS BIGINT)").alias(
                "reciprocity_milli"
            ),
        )
        .orderBy("rank")
    )


def knn_reciprocity_sql(k: int = HUBNESS_K) -> str:
    return f"""
        WITH m AS ({HUBNESS_MOD_SQL}),
        corpus AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id % (SELECT mod FROM m) = 0
        ),
        scored AS (
            SELECT a.vec_id, b.vec_id AS nbr_id,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                       AS cosine
            FROM corpus a CROSS JOIN corpus b
            WHERE a.vec_id <> b.vec_id
        ),
        knn AS (
            SELECT vec_id, nbr_id,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC
                   ) AS rank
            FROM scored
            QUALIFY rank <= {k}
        ),
        marked AS (
            SELECT e.rank,
                   CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END AS recip
            FROM knn e
            LEFT JOIN (SELECT DISTINCT nbr_id AS vec_id, vec_id AS nbr_id
                       FROM knn) r
                   ON r.vec_id = e.vec_id AND r.nbr_id = e.nbr_id
        )
        SELECT CAST(rank AS INT) AS rank,
               CAST(COUNT(*) AS BIGINT) AS edges,
               CAST(SUM(recip) AS BIGINT) AS reciprocal,
               CAST(1000 * SUM(recip) // COUNT(*) AS BIGINT)
                   AS reciprocity_milli
        FROM marked
        GROUP BY rank
        ORDER BY rank
    """


# --- k-NN label purity ------------------------------------------------------------


def knn_purity(embeddings: DataFrame, k: int = HUBNESS_K) -> DataFrame:
    """Label purity of the exact k-NN graph: for each sampled vector,
    how many of its k nearest neighbors share its label — the
    classifier-free label-noise / class-overlap audit (low purity for
    one label = that class is entangled in embedding space, and any
    kNN-based curation or pseudo-labeling over it will leak).

    Same graph as ``knn_hubness`` (adaptive mod-sample, top-k by
    rounded cosine, ties to the lower vec_id). Per label:
    (label, n_vecs, sum_matches, sum_k, purity_milli) — purity is the
    exact pooled ratio Σmatches / Σk in milli, not a mean of per-vector
    floats.

    Scale shape: quadratic audit form (see knn_hubness) — the same
    histogram reads off ANN neighbor lists at corpus scale."""
    corpus = (
        embeddings.crossJoin(F.broadcast(_hubness_mod(embeddings)))
        .where(F.col("vec_id") % F.col("mod") == 0)
        .select(
            "vec_id",
            "label",
            "embedding",
            _l2norm(F.col("embedding")).alias("nrm"),
        )
    )
    right = corpus.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("nbr_label"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(right))
        .where(F.col("vec_id") != F.col("nbr_id"))
        .select(
            "vec_id",
            "label",
            "nbr_id",
            "nbr_label",
            F.round(
                _dot(F.col("embedding"), F.col("n_emb"))
                / (F.col("nrm") * F.col("n_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    knn = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    per_vec = knn.groupBy("vec_id", "label").agg(
        F.count("*").alias("kk"),
        F.sum(
            F.when(F.col("label") == F.col("nbr_label"), 1).otherwise(0)
        ).alias("match"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum("match").cast("long").alias("sum_matches"),
            F.sum("kk").cast("long").alias("sum_k"),
        )
        .withColumn(
            "purity_milli",
            F.expr("CAST(1000 * sum_matches DIV sum_k AS BIGINT)"),
        )
        .orderBy("label")
    )


def knn_purity_sql(k: int = HUBNESS_K) -> str:
    return f"""
        WITH m AS ({HUBNESS_MOD_SQL}),
        corpus AS (
            SELECT vec_id, label, embedding FROM embeddings
            WHERE vec_id % (SELECT mod FROM m) = 0
        ),
        scored AS (
            SELECT a.vec_id, a.label, b.vec_id AS nbr_id,
                   b.label AS nbr_label,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                       AS cosine
            FROM corpus a CROSS JOIN corpus b
            WHERE a.vec_id <> b.vec_id
        ),
        knn AS (
            SELECT vec_id, label, nbr_label,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY cosine DESC, nbr_id ASC
                   ) AS rank
            FROM scored
            QUALIFY rank <= {k}
        ),
        per_vec AS (
            SELECT vec_id, label,
                   CAST(COUNT(*) AS BIGINT) AS kk,
                   CAST(SUM(CASE WHEN label = nbr_label THEN 1 ELSE 0 END)
                        AS BIGINT) AS match
            FROM knn GROUP BY vec_id, label
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(match) AS BIGINT) AS sum_matches,
               CAST(SUM(kk) AS BIGINT) AS sum_k,
               CAST(1000 * SUM(match) // SUM(kk) AS BIGINT) AS purity_milli
        FROM per_vec
        GROUP BY label
        ORDER BY label
    """


# --- IVF list-balance audit --------------------------------------------------------


def ivf_balance(
    embeddings: DataFrame, n_centroids: int = IVF_CENTROIDS
) -> DataFrame:
    """Inverted-list balance audit for the IVF index: per-list vector
    counts and each list's load relative to perfect balance — the ANN
    serving concern recall curves don't show (a hot list makes every
    query probing it pay its length in tail latency, and a starved list
    wastes a centroid).

    Same deterministic md5-sampled centroids and argmax assignment as
    ``ann_ivf_topk``. Output per list: (list_id, n_vecs, load_milli)
    where load_milli = 1000·n_vecs·n_centroids / corpus — 1000 is
    perfect balance. Exact integers after the float-cosine argmax that
    defines the index itself.

    Scale shape: one broadcast-centroid affinity pass, one vec-keyed
    argmax aggregate, one bounded list rollup with a 1-row corpus
    scalar."""
    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    from .hashing import md5_int

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
    affinity = corpus.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "centroid_id",
        (
            _dot(F.col("embedding"), F.col("c_emb"))
            / (F.col("nrm") * F.col("c_nrm"))
        ).alias("c_sim"),
    )
    assignment = (
        affinity.groupBy("vec_id")
        .agg(F.max(F.struct("c_sim", "centroid_id")).alias("best"))
        .select("vec_id", F.col("best.centroid_id").alias("list_id"))
    )
    total = assignment.agg(F.count("*").cast("long").alias("n_total"))
    return (
        assignment.groupBy("list_id")
        .agg(F.count("*").cast("long").alias("n_vecs"))
        .crossJoin(F.broadcast(total))
        .select(
            "list_id",
            "n_vecs",
            F.expr(
                f"CAST(1000 * n_vecs * {n_centroids} DIV n_total AS BIGINT)"
            ).alias("load_milli"),
        )
        .orderBy("list_id")
    )


def ivf_balance_sql(n_centroids: int = IVF_CENTROIDS) -> str:
    from .hashing import md5_int_sql

    ck = md5_int_sql("CAST(vec_id AS VARCHAR)")
    return f"""
        WITH corpus AS (
            SELECT vec_id, embedding FROM embeddings
        ),
        centroids AS (
            SELECT vec_id AS centroid_id, embedding AS c_emb
            FROM corpus
            ORDER BY {ck}, vec_id
            LIMIT {n_centroids}
        ),
        affinity AS (
            SELECT v.vec_id, c.centroid_id,
                   list_cosine_similarity(
                       v.embedding::DOUBLE[], c.c_emb::DOUBLE[]) AS c_sim
            FROM corpus v CROSS JOIN centroids c
        ),
        assignment AS (
            -- ties break to the LARGER centroid_id: Spark max(struct)
            SELECT vec_id, centroid_id AS list_id
            FROM (
                SELECT vec_id, centroid_id,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY c_sim DESC, centroid_id DESC
                       ) AS rn
                FROM affinity
            ) WHERE rn = 1
        ),
        total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM assignment)
        SELECT a.list_id,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(1000 * COUNT(*) * {n_centroids}
                    // (SELECT n_total FROM total) AS BIGINT) AS load_milli
        FROM assignment a
        GROUP BY a.list_id
        ORDER BY a.list_id
    """


# --- intrinsic dimension (TwoNN) ----------------------------------------------------


def intrinsic_dimension(embeddings: DataFrame) -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017, Sci.Rep.):
    d ≈ n / Σ ln(r₂/r₁) over each point's two nearest-neighbor
    distances — the honest answer to "how many of these 64 dimensions
    are real?", which prices every downstream choice (PQ code size, JL
    target dim, ANN list count). Estimated on the same adaptive
    mod-sample as the kNN audits; distances are cosine (1 − cos),
    rounded once to 6 dp so both engines rank and ratio identical values.

    Cross-engine exactness: each point's ln(r₂/r₁) quantizes ONCE to
    integer micro-nats (the entropy treatment) and the estimator is a
    single integer-sum division. Points with r₁ = 0 (exact duplicates)
    are excluded, as the estimator requires r₂ > r₁ > 0. Output one
    row: (n_points, sum_lnratio_micro, id_milli).

    Scale shape: the hubness exact-graph audit form — bounded sample,
    ANN lists replace it at corpus scale."""
    corpus = (
        embeddings.crossJoin(F.broadcast(_hubness_mod(embeddings)))
        .where(F.col("vec_id") % F.col("mod") == 0)
        .select("vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm"))
    )
    right = corpus.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(right))
        .where(F.col("vec_id") != F.col("nbr_id"))
        .select(
            "vec_id",
            "nbr_id",
            F.round(
                F.lit(1.0)
                - _dot(F.col("embedding"), F.col("n_emb"))
                / (F.col("nrm") * F.col("n_nrm")),
                6,
            ).alias("dist"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("nbr_id").asc()
    )
    two = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 2)
        .groupBy("vec_id")
        .agg(
            F.min(F.when(F.col("rank") == 1, F.col("dist"))).alias("r1"),
            F.min(F.when(F.col("rank") == 2, F.col("dist"))).alias("r2"),
        )
        .where((F.col("r1") > 0) & (F.col("r2") > F.col("r1")))
        .select(
            F.round(F.log(F.col("r2") / F.col("r1")) * 1e6)
            .cast("long")
            .alias("lnr_micro")
        )
    )
    return two.agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("lnr_micro").cast("long").alias("sum_lnratio_micro"),
    ).select(
        "n_points",
        "sum_lnratio_micro",
        F.expr(
            "CASE WHEN sum_lnratio_micro > 0 THEN"
            " CAST(1000 * n_points * CAST(1000000 AS BIGINT)"
            " DIV sum_lnratio_micro AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("id_milli"),
    )


def intrinsic_dimension_sql() -> str:
    return f"""
        WITH m AS ({HUBNESS_MOD_SQL}),
        corpus AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id % (SELECT mod FROM m) = 0
        ),
        scored AS (
            SELECT a.vec_id, b.vec_id AS nbr_id,
                   round(1.0 - list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                       AS dist
            FROM corpus a CROSS JOIN corpus b
            WHERE a.vec_id <> b.vec_id
        ),
        two AS (
            SELECT vec_id,
                   MIN(CASE WHEN rank = 1 THEN dist END) AS r1,
                   MIN(CASE WHEN rank = 2 THEN dist END) AS r2
            FROM (
                SELECT vec_id, dist,
                       row_number() OVER (
                           PARTITION BY vec_id ORDER BY dist ASC, nbr_id ASC
                       ) AS rank
                FROM scored
            ) WHERE rank <= 2
            GROUP BY vec_id
        ),
        quantized AS (
            SELECT CAST(round(ln(r2 / r1) * 1e6) AS BIGINT) AS lnr_micro
            FROM two WHERE r1 > 0 AND r2 > r1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(lnr_micro) AS BIGINT) AS sum_lnratio_micro,
               CASE WHEN SUM(lnr_micro) > 0 THEN
                    CAST(1000 * COUNT(*) * CAST(1000000 AS BIGINT)
                         // SUM(lnr_micro) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS id_milli
        FROM quantized
    """


# --- centroid assignment margin --------------------------------------------------------

MARGIN_BUCKETS_MILLI = (10, 50, 100, 250)


def assignment_margin(
    embeddings: DataFrame, n_centroids: int = IVF_CENTROIDS
) -> DataFrame:
    """Cluster-assignment confidence audit: the cosine MARGIN between
    each vector's best and second-best IVF centroid, bucketed — a mass
    of near-zero margins means assignments are arbitrary (so nprobe
    must rise and any cluster-based curation is unstable), while fat
    margins justify nprobe=1 serving. The distribution completes the
    confusion/silhouette/balance family with the per-vector confidence
    view.

    Same deterministic centroids and affinity pass as ann_ivf_topk;
    margins quantize ONCE to milli and bucket at
    {MARGIN_BUCKETS_MILLI}. Output per bucket: (margin_bucket, n_vecs,
    share_milli).

    Scale shape: one broadcast-centroid affinity pass, one vec-keyed
    top-2 aggregate, bounded bucket rollup."""
    from .hashing import md5_int

    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
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
    affinity = corpus.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "centroid_id",
        F.round(
            _dot(F.col("embedding"), F.col("c_emb"))
            / (F.col("nrm") * F.col("c_nrm")),
            6,
        ).alias("c_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("c_sim").desc(), F.col("centroid_id").asc()
    )
    two = (
        affinity.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .groupBy("vec_id")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("c_sim"))).alias("s1"),
            F.max(F.when(F.col("rk") == 2, F.col("c_sim"))).alias("s2"),
        )
        .select(
            F.round((F.col("s1") - F.col("s2")) * 1000)
            .cast("long")
            .alias("margin_milli")
        )
    )
    b = MARGIN_BUCKETS_MILLI
    bucket = (
        F.when(F.col("margin_milli") < b[0], f"<{b[0]:03d}")
        .when(F.col("margin_milli") < b[1], f"{b[0]:03d}-{b[1]:03d}")
        .when(F.col("margin_milli") < b[2], f"{b[1]:03d}-{b[2]:03d}")
        .when(F.col("margin_milli") < b[3], f"{b[2]:03d}-{b[3]:03d}")
        .otherwise(f"{b[3]:03d}+")
    )
    return (
        two.groupBy(bucket.alias("margin_bucket"))
        .agg(F.count("*").cast("long").alias("n_vecs"))
        .select(
            "margin_bucket",
            "n_vecs",
            F.expr(
                "CAST(1000 * n_vecs DIV (SUM(n_vecs) OVER ()) AS BIGINT)"
            ).alias("share_milli"),
        )
        .orderBy("margin_bucket")
    )


def assignment_margin_sql(n_centroids: int = IVF_CENTROIDS) -> str:
    from .hashing import md5_int_sql

    ck = md5_int_sql("CAST(vec_id AS VARCHAR)")
    b = MARGIN_BUCKETS_MILLI
    return f"""
        WITH centroids AS (
            SELECT vec_id AS centroid_id, embedding AS c_emb
            FROM embeddings
            ORDER BY {ck}, vec_id
            LIMIT {n_centroids}
        ),
        affinity AS (
            SELECT v.vec_id, c.centroid_id,
                   round(list_cosine_similarity(
                       v.embedding::DOUBLE[], c.c_emb::DOUBLE[]), 6) AS c_sim
            FROM embeddings v CROSS JOIN centroids c
        ),
        two AS (
            SELECT vec_id,
                   CAST(round((MAX(CASE WHEN rk = 1 THEN c_sim END)
                               - MAX(CASE WHEN rk = 2 THEN c_sim END))
                              * 1000) AS BIGINT) AS margin_milli
            FROM (
                SELECT vec_id, c_sim,
                       row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY c_sim DESC, centroid_id ASC
                       ) AS rk
                FROM affinity
            ) WHERE rk <= 2
            GROUP BY vec_id
        ),
        panel AS (
            SELECT CASE WHEN margin_milli < {b[0]} THEN '<{b[0]:03d}'
                        WHEN margin_milli < {b[1]}
                            THEN '{b[0]:03d}-{b[1]:03d}'
                        WHEN margin_milli < {b[2]}
                            THEN '{b[1]:03d}-{b[2]:03d}'
                        WHEN margin_milli < {b[3]}
                            THEN '{b[2]:03d}-{b[3]:03d}'
                        ELSE '{b[3]:03d}+' END AS margin_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_vecs
            FROM two GROUP BY 1
        )
        SELECT margin_bucket, n_vecs,
               CAST(1000 * n_vecs // (SUM(n_vecs) OVER ()) AS BIGINT)
                   AS share_milli
        FROM panel
        ORDER BY margin_bucket
    """


# --- MAP@k of the LSH ranking -----------------------------------------------------------

MAP_LCM = 60  # lcm(1..DEFAULT_K): clears every precision denominator


def map_eval(
    embeddings: DataFrame, query_ids: list[int], k: int = DEFAULT_K
) -> DataFrame:
    """MAP@k of the LSH approximate ranking against the exact cosine top-k
    — the ORDER-sensitive binary metric between recall@k (order-blind) and
    NDCG (graded): AP = (1/k) sum_i hit_i * (cumhits_i / i), so an early
    miss drags every later precision term. Output: (query_id, n_hits,
    ap_scaled, ap_milli) per query, ordered.

    Everything is exact-integer: hits are 0/1 from the (query, vec) join,
    cumulative hits ride a rank window over <= k rows, each precision
    denominator clears through the lcm weight {MAP_LCM}/i, and ap_milli is
    one positive floor division of BIGINTs — nothing to drift cross-engine.

    Scale shape: identical economics to ndcg_eval — both rankings come
    from broadcast-query pipelines, the alignment join is (query,
    vec)-keyed over <= |queries| * k rows, the window partitions per
    query."""
    exact = brute_force_topk(embeddings, query_ids, k).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    approx = lsh_bucket_topk(embeddings, query_ids, k).select(
        "query_id", "vec_id", F.col("rank").alias("arank")
    )
    w_expr = "CASE arank " + " ".join(
        f"WHEN {i} THEN {MAP_LCM // i}" for i in range(1, k + 1)
    ) + " ELSE 0 END"
    wq = Window.partitionBy("query_id").orderBy("arank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    aligned = approx.join(exact, ["query_id", "vec_id"], "left").select(
        "query_id",
        "arank",
        F.coalesce("hit", F.lit(0)).alias("hit"),
    )
    per_q = (
        aligned.select(
            "query_id",
            "hit",
            F.expr(w_expr).alias("w"),
            F.sum("hit").over(wq).cast("long").alias("cumhits"),
        )
        .groupBy("query_id")
        .agg(
            F.sum("hit").cast("long").alias("n_hits"),
            F.sum(F.col("hit") * F.col("cumhits") * F.col("w"))
            .cast("long")
            .alias("ap_scaled"),
        )
    )
    return per_q.select(
        "query_id",
        "n_hits",
        "ap_scaled",
        F.expr(f"CAST(1000 * ap_scaled DIV {MAP_LCM * k} AS BIGINT)").alias(
            "ap_milli"
        ),
    ).orderBy("query_id")


def map_eval_sql(query_ids: list[int], k: int = DEFAULT_K) -> str:
    w_expr = "CASE a.rank " + " ".join(
        f"WHEN {i} THEN {MAP_LCM // i}" for i in range(1, k + 1)
    ) + " ELSE 0 END"
    return f"""
        WITH exact_r AS ({brute_force_topk_sql(query_ids, k)}),
        approx_r AS ({lsh_bucket_topk_sql(query_ids, k)}),
        aligned AS (
            SELECT a.query_id, a.rank AS arank,
                   CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit,
                   {w_expr} AS w
            FROM approx_r a
            LEFT JOIN exact_r e
              ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        ),
        cum AS (
            SELECT query_id, hit, w,
                   SUM(hit) OVER (PARTITION BY query_id ORDER BY arank
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cumhits
            FROM aligned
        )
        SELECT query_id,
               CAST(SUM(hit) AS BIGINT) AS n_hits,
               CAST(SUM(hit * cumhits * w) AS BIGINT) AS ap_scaled,
               CAST(1000 * SUM(hit * cumhits * w) // {MAP_LCM * k} AS BIGINT)
                   AS ap_milli
        FROM cum
        GROUP BY query_id
        ORDER BY query_id
    """


# --- filtered ANN: post-filter recall audit -----------------------------------------


FILTERED_POOL = 20  # unfiltered IVF candidates fetched per query
FILTERED_NPROBE = 4


def filtered_ann_recall(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = DEFAULT_K,
    pool: int = FILTERED_POOL,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = FILTERED_NPROBE,
) -> DataFrame:
    """Recall@k of POST-FILTERED IVF search against the filtered exact
    truth: one row (n_queries, n_true, n_hit, recall_milli).

    Attribute-filtered vector search (label % 2 = 0 plays the tenant /
    language / safety predicate) is where ANN indexes quietly rot: the
    index is built on the FULL corpus, so a query fetches its top-pool
    unfiltered candidates, drops the ones failing the predicate, and
    hopes k survivors remain — recall falls with the filter's
    selectivity (the known post-filter failure mode; the fix is either
    a larger pool or a filter-aware index). This device PRICES that
    loss: IVF pool of ``pool`` (ann_ivf_topk machinery verbatim),
    predicate applied post-candidates, top-k of survivors, judged
    against the exact brute-force top-k over the PRE-filtered corpus.

    Exactness: both sides round cosine to 6dp with vec_id tiebreaks
    (the brute_force_topk convention); hit counts are exact integers,
    one milli division at the emit.

    Scale shape: the IVF plan (broadcast centroids + probes, one
    assignment shuffle) plus one broadcast-query filtered scan for the
    truth; the recall join touches <= |queries| * pool rows."""
    cand_pool = ivf_topk(embeddings, query_ids, pool, n_centroids, nprobe)
    labels = embeddings.select("vec_id", "label")
    surv = cand_pool.join(labels, "vec_id").where(F.col("label") % 2 == 0)
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    approx = (
        surv.withColumn("r2", F.row_number().over(wk))
        .where(F.col("r2") <= k)
        .select("query_id", F.col("vec_id").alias("got_id"))
    )
    corpus = embeddings.select(
        "vec_id", "label", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    queries = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    truth_scored = (
        corpus.where(F.col("label") % 2 == 0)
        .crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                6,
            ).alias("cosine"),
        )
    )
    truth = (
        truth_scored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id")
    )
    per_q = (
        truth.join(
            approx,
            (truth["query_id"] == approx["query_id"])
            & (truth["vec_id"] == approx["got_id"]),
            "left",
        )
        .groupBy(truth["query_id"])
        .agg(
            F.count("*").cast("long").alias("n_true"),
            F.count("got_id").cast("long").alias("n_hit"),
        )
    )
    return per_q.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("n_true").cast("long").alias("n_true"),
        F.sum("n_hit").cast("long").alias("n_hit"),
        F.expr(
            "CAST(round(1000.0 * CAST(SUM(n_hit) AS DOUBLE) / SUM(n_true))"
            " AS BIGINT)"
        ).alias("recall_milli"),
    )


def filtered_ann_recall_sql(
    query_ids: list[int],
    k: int = DEFAULT_K,
    pool: int = FILTERED_POOL,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = FILTERED_NPROBE,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH cand_pool AS ({ivf_topk_sql(query_ids, pool, n_centroids, nprobe)}),
        surv AS (
            SELECT p.query_id, p.vec_id, p.cosine,
                   row_number() OVER (
                       PARTITION BY p.query_id
                       ORDER BY p.cosine DESC, p.vec_id ASC
                   ) AS r2
            FROM cand_pool p JOIN embeddings e ON p.vec_id = e.vec_id
            WHERE e.label % 2 = 0
        ),
        approx AS (
            SELECT query_id, vec_id AS got_id FROM surv WHERE r2 <= {k}
        ),
        queries AS (
            SELECT vec_id AS query_id, embedding AS q_emb
            FROM embeddings WHERE vec_id IN ({ids})
        ),
        truth_scored AS (
            SELECT q.query_id, c.vec_id,
                   round(list_cosine_similarity(
                       q.q_emb::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings c CROSS JOIN queries q
            WHERE c.label % 2 = 0 AND c.vec_id <> q.query_id
        ),
        truth AS (
            SELECT query_id, vec_id
            FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id ASC
                       ) AS rank
                FROM truth_scored
            ) WHERE rank <= {k}
        ),
        per_q AS (
            SELECT t.query_id,
                   CAST(COUNT(*) AS BIGINT) AS n_true,
                   CAST(COUNT(a.got_id) AS BIGINT) AS n_hit
            FROM truth t LEFT JOIN approx a
              ON t.query_id = a.query_id AND t.vec_id = a.got_id
            GROUP BY t.query_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(n_true) AS BIGINT) AS n_true,
               CAST(SUM(n_hit) AS BIGINT) AS n_hit,
               CAST(round(1000.0 * CAST(SUM(n_hit) AS DOUBLE) / SUM(n_true))
                    AS BIGINT) AS recall_milli
        FROM per_q
    """


# --- KNN-Shapley data valuation -------------------------------------------------------

SHAPLEY_TEST_POINTS = 16
SHAPLEY_K = 5


def knn_shapley(
    embeddings: DataFrame,
    n_test: int = SHAPLEY_TEST_POINTS,
    k: int = SHAPLEY_K,
) -> DataFrame:
    """Exact KNN-Shapley value of every training vector (Jia et al., PVLDB
    2019): the Shapley value of each training point for a K-NN classifier
    admits a closed form — sort train points by distance to a test point,
    then the tail recursion s_i = s_{i+1} + (1[y_i=y_t] - 1[y_{i+1}=y_t]) /
    max(K, i) with s_n = 1[y_n=y_t]/n. The data-valuation number a training
    corpus is curated by: negative values are mislabeled/poisonous
    candidates, the top values are the exemplars.

    Spark shape: the test set is the md5-ordered first ``n_test`` vectors
    (deterministic, no RNG) and is BROADCAST; distances are one narrow pass
    over the corpus; the recursion is a suffix window sum per test point
    (each term quantized ONCE to nano BIGINT so the suffix sums and the
    final per-train aggregation are order-free exact integers). Cost is
    O(n_test · corpus) with bounded n_test — the documented scale cap; the
    per-test windows partition by test_id, so the sort parallelizes across
    the test set.

    Output: one row per training vector (vec_id, label, shap_nano_sum,
    shapley) where shapley = shap_nano_sum / (n_test · 1e9)."""
    from .hashing import md5_int

    tests = (
        embeddings.withColumn("ck", md5_int(F.col("vec_id").cast("string")))
        .orderBy("ck", "vec_id")
        .limit(n_test)
        .select(
            F.col("vec_id").alias("test_id"),
            F.col("embedding").alias("t_emb"),
            F.col("label").alias("t_label"),
        )
    )
    train = embeddings.join(
        tests.select(F.col("test_id").alias("vec_id")), "vec_id", "left_anti"
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("t_emb"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = train.crossJoin(F.broadcast(tests)).select(
        "test_id",
        "vec_id",
        "label",
        F.round(d2, 9).alias("d2"),
        (F.col("label") == F.col("t_label")).cast("int").alias("match"),
    )
    w_rank = Window.partitionBy("test_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    ranked = pairs.select(
        "test_id",
        "vec_id",
        "label",
        "match",
        F.row_number().over(w_rank).alias("r"),
        F.count("*").over(Window.partitionBy("test_id")).alias("n_train"),
        F.lead("match").over(w_rank).alias("next_match"),
    )
    term = F.when(
        F.col("next_match").isNull(),
        F.col("match") / F.col("n_train"),
    ).otherwise(
        (F.col("match") - F.col("next_match"))
        / F.greatest(F.lit(k), F.col("r"))
    )
    # suffix sum expressed as a RUNNING cumulative over descending rank:
    # Spark's UNBOUNDED FOLLOWING frame re-scans the partition tail per row
    # (O(n^2) per test point — measured x13 wall at x10 data); the
    # descending running frame is the O(n) streaming aggregator.
    w_suffix = (
        Window.partitionBy("test_id")
        .orderBy(F.col("r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = ranked.select(
        "test_id",
        "vec_id",
        "label",
        F.col("r"),
        F.round(term * 1e9).cast("long").alias("term_nano"),
    ).select(
        "test_id",
        "vec_id",
        "label",
        F.sum("term_nano").over(w_suffix).alias("s_nano"),
    )
    return (
        scored.groupBy("vec_id", "label")
        .agg(F.sum("s_nano").alias("shap_nano_sum"))
        .select(
            "vec_id",
            "label",
            "shap_nano_sum",
            # + 0.0 canonicalizes IEEE -0.0 (an all-negative-rounding-to-zero
            # value would otherwise hash as "-0.000000" on one engine only)
            (F.round(F.col("shap_nano_sum") / (n_test * 1e9), 6) + 0.0).alias(
                "shapley"
            ),
        )
        .orderBy("vec_id")
    )


def knn_shapley_sql(
    n_test: int = SHAPLEY_TEST_POINTS, k: int = SHAPLEY_K
) -> str:
    from .hashing import md5_int_sql

    return f"""
    WITH tests AS (
        SELECT vec_id AS test_id, embedding AS t_emb, label AS t_label
        FROM embeddings
        ORDER BY {md5_int_sql("CAST(vec_id AS VARCHAR)")}, vec_id
        LIMIT {n_test}
    ),
    train AS (
        SELECT * FROM embeddings
        WHERE vec_id NOT IN (SELECT test_id FROM tests)
    ),
    pairs AS (
        SELECT t.test_id, e.vec_id, e.label,
               round(list_sum(list_transform(range(1, len(e.embedding) + 1),
                   j -> (CAST(e.embedding[j] AS DOUBLE)
                         - CAST(t.t_emb[j] AS DOUBLE))
                        * (CAST(e.embedding[j] AS DOUBLE)
                           - CAST(t.t_emb[j] AS DOUBLE)))), 9) AS d2,
               CASE WHEN e.label = t.t_label THEN 1 ELSE 0 END AS match
        FROM train e CROSS JOIN tests t
    ),
    ranked AS (
        SELECT test_id, vec_id, label, match,
               row_number() OVER (
                   PARTITION BY test_id ORDER BY d2 ASC, vec_id ASC
               ) AS r,
               COUNT(*) OVER (PARTITION BY test_id) AS n_train,
               lead(match) OVER (
                   PARTITION BY test_id ORDER BY d2 ASC, vec_id ASC
               ) AS next_match
        FROM pairs
    ),
    terms AS (
        SELECT test_id, vec_id, label,
               CAST(round(1e9 * CASE
                   WHEN next_match IS NULL
                       THEN CAST(match AS DOUBLE) / n_train
                   ELSE CAST(match - next_match AS DOUBLE)
                        / GREATEST({k}, r)
               END) AS BIGINT) AS term_nano,
               r
        FROM ranked
    ),
    suffix AS (
        SELECT test_id, vec_id, label,
               SUM(term_nano) OVER (
                   PARTITION BY test_id ORDER BY r DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS s_nano
        FROM terms
    )
    SELECT vec_id, label,
           CAST(SUM(s_nano) AS BIGINT) AS shap_nano_sum,
           round(SUM(s_nano) / ({n_test} * 1e9), 6) + 0.0 AS shapley
    FROM suffix
    GROUP BY vec_id, label
    ORDER BY vec_id
    """


# --- reciprocal-rank fusion -----------------------------------------------------------

RRF_K = 60
RRF_TOP = 10


def rrf_fusion(
    embeddings: DataFrame,
    query_ids: list[int],
    rrf_k: int = RRF_K,
    top: int = RRF_TOP,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two retrieval
    rankings — cosine similarity and raw inner product (which disagree
    whenever candidate norms vary) — fused as Σ 1/(k + rank_list(d)), the
    standard score-free hybrid-search combiner (lexical ∪ semantic in a RAG
    stack; two vector scorings here, same algebra).

    Both rankings come from one broadcast pass over the corpus; the fused
    score is per-row scalar arithmetic quantized to micro BIGINT, so the
    fused ordering is engine-exact. Output: top-``top`` per query
    (query_id, fused_rank, vec_id, r_cos, r_dot, rrf_micro)."""
    from .dedup import _dot, _l2norm

    corpus = embeddings.select(
        "vec_id", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    queries = corpus.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm")),
                9,
            ).alias("cosine"),
            F.round(_dot(F.col("q_emb"), F.col("embedding")), 9).alias("dot"),
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    w_dot = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("vec_id").asc()
    )
    fused = scored.select(
        "query_id",
        "vec_id",
        F.row_number().over(w_cos).alias("r_cos"),
        F.row_number().over(w_dot).alias("r_dot"),
    ).select(
        "query_id",
        "vec_id",
        "r_cos",
        "r_dot",
        F.round(
            1e6
            * (
                1.0 / (F.lit(rrf_k) + F.col("r_cos"))
                + 1.0 / (F.lit(rrf_k) + F.col("r_dot"))
            )
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    w_fused = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("vec_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_fused).cast("int"))
        .where(F.col("fused_rank") <= top)
        .select("query_id", "fused_rank", "vec_id", "r_cos", "r_dot", "rrf_micro")
        .orderBy("query_id", "fused_rank")
    )


def rrf_fusion_sql(
    query_ids: list[int], rrf_k: int = RRF_K, top: int = RRF_TOP
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH queries AS (
        SELECT vec_id AS query_id, embedding AS q_emb
        FROM embeddings WHERE vec_id IN ({ids})
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               round(list_cosine_similarity(
                   e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 9) AS cosine,
               round(list_sum(list_transform(range(1, len(e.embedding) + 1),
                   j -> CAST(e.embedding[j] AS DOUBLE)
                        * CAST(q.q_emb[j] AS DOUBLE))), 9) AS dot
        FROM embeddings e CROSS JOIN queries q
        WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
               ) AS r_cos,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY dot DESC, vec_id ASC
               ) AS r_dot
        FROM scored
    ),
    fused AS (
        SELECT query_id, vec_id, r_cos, r_dot,
               CAST(round(1e6 * (1.0 / ({rrf_k} + r_cos)
                                 + 1.0 / ({rrf_k} + r_dot))) AS BIGINT)
                   AS rrf_micro
        FROM ranked
    )
    SELECT query_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_micro DESC, vec_id ASC
           ) AS INTEGER) AS fused_rank,
           vec_id, r_cos, r_dot, rrf_micro
    FROM fused
    QUALIFY fused_rank <= {top}
    ORDER BY query_id, fused_rank
    """
