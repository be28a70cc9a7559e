"""Deduplication operators over `documents`: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine.

Scale design notes (the part that matters at 100 TB):

- exact          — one hash-groupBy shuffle on the fingerprint; map-side
                   partial aggregation makes it bandwidth-bound, not CPU-bound.
- ngram Jaccard  — inverted-index self-join on shingle (shuffle on shingle),
                   then a groupBy on the pair. Quadratic only within a shingle's
                   posting list; ``max_df`` caps posting-list length (skew guard).
- MinHash+LSH    — the scale path: k-permutation signatures from the exploded
                   shingle relation (one groupBy), banding to buckets (narrow),
                   bucket self-join (shuffle on small band keys), exact-Jaccard
                   verification of candidates only.
- SimHash        — 32-bit signatures from per-token hashes (one groupBy), then
                   Hamming-distance candidate pairs via banding.
- embedding      — blocked brute-force cosine within `label` blocks; the ANN
                   module (similarity.py) is the unblocked scale path.

Everything is built-in-function Spark (JVM codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import (
    HASH_P,
    md5_int,
    md5_int_sql,
    universal_hash,
    universal_hash_sql,
    universal_params,
)
from .shingles import DEFAULT_N, df_cap_filter_sql, shingles, shingles_sql, with_df_cap
from .text import _norm, _norm_sql

# Default skew-guard caps. Chosen far above any fixture document frequency
# (fixtures have <= ~5k docs) so capped and uncapped results are identical at
# test scale, while at 100 TB they bound the worst posting list / LSH bucket:
# without a cap, one stop-phrase shingle or one degenerate bucket makes the
# candidate self-join quadratic in its posting length. The caps are applied
# IDENTICALLY in the Spark plan and the DuckDB oracle, so the two engines
# compute the same (capped) semantics at every scale.
DEFAULT_MAX_DF = 10_000
DEFAULT_MAX_BUCKET = 10_000


def _bucket_cap(bucketed: DataFrame, max_bucket: int) -> DataFrame:
    """Drop LSH buckets holding more than ``max_bucket`` docs (skew guard):
    broadcast LEFT ANTI against the tiny hot-bucket set, same shape as
    ``shingles.with_df_cap``.

    Callers pass a ``repartition("bucket")``-ed relation: the explicit
    exchange is the reuse point — hot-bucket counting, the anti join, and the
    downstream pair self-join all read that ONE shuffle instead of each
    recomputing the signature pipeline feeding it (a groupBy would otherwise
    put its partial aggregate BELOW the exchange, defeating reuse)."""
    hot = (
        bucketed.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
        .select("bucket")
    )
    return bucketed.join(F.broadcast(hot), "bucket", "left_anti")

# --- exact dedup --------------------------------------------------------------


def dedup_exact(docs: DataFrame) -> DataFrame:
    """One representative (min doc_id) per normalized-text group, with the
    group's duplicate count. Single hash-groupBy; partial agg map-side."""
    return (
        docs.groupBy(F.md5(_norm(F.col("text"))).alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("fingerprint", "keep_doc_id", "n_copies")
    )


DEDUP_EXACT_SQL = f"""
    SELECT md5({_norm_sql('text')}) AS fingerprint,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
"""


CORPUS_SPLIT_ID = 250  # doc_id < split = "existing corpus", rest = "new batch"


def incremental_new_docs(docs: DataFrame, split_id: int = CORPUS_SPLIT_ID) -> DataFrame:
    """Dedupe a new batch against an existing corpus: LEFT ANTI join on the
    normalized-text fingerprint keeps only new docs whose content never
    appeared before (the ingest-time dedup every training pipeline runs).
    At scale the anti join shuffles 16-byte fingerprints, not documents —
    and when the corpus side is a Bloom filter or pre-bucketed fingerprint
    table it degrades gracefully to a broadcast/co-located anti join. Also
    dedups WITHIN the new batch (min doc_id wins) so output is replay-safe."""
    fp = F.md5(_norm(F.col("text"))).alias("fingerprint")
    corpus = docs.where(F.col("doc_id") < split_id).select(fp)
    batch = docs.where(F.col("doc_id") >= split_id).select("doc_id", fp)
    return (
        batch.join(corpus, "fingerprint", "left_anti")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
    )


def incremental_new_docs_sql(split_id: int = CORPUS_SPLIT_ID) -> str:
    fp = f"md5({_norm_sql('text')})"
    return f"""
        SELECT MIN(doc_id) AS doc_id, fingerprint
        FROM (
            SELECT doc_id, {fp} AS fingerprint
            FROM documents WHERE doc_id >= {split_id}
        ) batch
        WHERE NOT EXISTS (
            SELECT 1 FROM documents c
            WHERE c.doc_id < {split_id}
              AND md5({_norm_sql('c.text')}) = fingerprint
        )
        GROUP BY fingerprint
        ORDER BY doc_id
    """


# --- exact n-gram Jaccard pairs ----------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = DEFAULT_N,
    threshold: float = 0.2,
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold (inverted-index join).

    ``max_df`` drops ultra-frequent shingles from the similarity universe
    (both intersections and set sizes — well-defined capped-Jaccard
    semantics, mirrored in the oracle), bounding each posting list at scale.

    Plan shape: the shingle relation is aggregated ONCE into posting lists
    (one shuffle on shingle); pair candidates are expanded NARROWLY from each
    (sorted) posting list, and doc set sizes are derived from the same posts
    relation — so the expensive shingling+aggregation subplan is shared via
    exchange reuse instead of being recomputed by a three-way self-join, and
    df=1 shingles (the vast majority; they can never produce a pair) are
    dropped before any pair work. The cap is then a free WHERE on the posting
    length — the skew guard costs nothing extra."""
    sh = shingles(docs, n)
    posts = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ds")
    )
    if max_df is not None:
        posts = posts.where(F.size("ds") <= max_df)
    # capped-universe doc sizes (df=1 shingles DO count toward |A|)
    sizes = (
        posts.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("sz"))
    )
    # ordered pairs (a < b) from each posting list; lists are tiny (<= max_df,
    # typically 2-5), so the L^2 expansion stays narrow and bounded
    pair_structs = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        posts.where(F.size("ds") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    # shuffle_hash (not broadcast) for the sizes joins: Catalyst's STATIC size
    # estimate undervalues the post-aggregation pair relation and picks IT as
    # the broadcast build side — at 10x fixture scale that collected tens of
    # millions of pairs onto the driver and OOMed (measured). The hinted
    # shuffled hash join builds the genuinely-small per-doc sizes side per
    # partition and streams the pairs; both relations are doc-keyed, so this
    # shape holds at any corpus size.
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").hint("shuffle_hash"), "doc_a"
        )
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").hint("shuffle_hash"), "doc_b"
        )
        .withColumnRenamed("sz", "sz_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_pairs_sql(
    n: int = DEFAULT_N,
    threshold: float = 0.2,
    max_df: int | None = DEFAULT_MAX_DF,
) -> str:
    cap = f"WHERE {df_cap_filter_sql('sh0', max_df)}" if max_df is not None else ""
    return f"""
        WITH sh0 AS ({shingles_sql(n)}),
        sh AS (SELECT * FROM sh0 {cap}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= {threshold}
        ORDER BY doc_a, doc_b
    """


# --- MinHash signatures + LSH -------------------------------------------------

MINHASH_K = 16
LSH_BANDS = 4  # 4 bands x 4 rows


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K, n: int = DEFAULT_N) -> DataFrame:
    """k-permutation MinHash signature per doc as columns mh0..mh{k-1}.

    One explode + one groupBy with k min() aggregates — map-side combinable,
    single shuffle keyed by doc_id.
    """
    sh = shingles(docs, n)
    h = (md5_int(F.col("shingle")) % HASH_P).alias("h")
    base = sh.select("doc_id", h)
    aggs = [
        F.min(universal_hash(F.col("h"), a, b)).alias(f"mh{i}")
        for i, (a, b) in enumerate(universal_params(k))
    ]
    return base.groupBy("doc_id").agg(*aggs)


def minhash_signatures_sql(k: int = MINHASH_K, n: int = DEFAULT_N) -> str:
    h_expr = f"({md5_int_sql('shingle')} % {HASH_P})"
    cols = ",\n               ".join(
        f"MIN({universal_hash_sql('h', a, b)}) AS mh{i}"
        for i, (a, b) in enumerate(universal_params(k))
    )
    return f"""
        WITH sh AS ({shingles_sql(n)}),
        hashed AS (SELECT doc_id, {h_expr} AS h FROM sh)
        SELECT doc_id,
               {cols}
        FROM hashed GROUP BY doc_id
    """


def _lsh_candidate_pairs(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Distinct (doc_a < doc_b) MinHash-LSH band-collision candidates — the
    shared blocking stage of minhash_lsh_pairs (Jaccard verify) and
    edit_distance_pairs (levenshtein verify)."""
    sig = minhash_signatures(docs, k, n)
    rows_per_band = k // bands
    band_cols = [
        F.concat_ws(
            "_",
            F.lit(b),
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    bucketed = banded.select(
        "doc_id",
        F.explode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias("bucket"),
    ).repartition("bucket")  # single exchange shared by cap + self-join
    if max_bucket is not None:
        bucketed = _bucket_cap(bucketed, max_bucket)
    return (
        bucketed.alias("a")
        .join(bucketed.alias("b"), "bucket")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    verify_threshold: float = 0.2,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Banding: signature split into ``bands`` bands of k/bands rows; docs
    colliding on any full band become candidates. Candidates are then verified
    with the exact n-gram Jaccard, so the output has no false positives —
    recall (vs the exact all-pairs join) is what LSH trades away.
    ``max_bucket`` drops degenerate buckets (e.g. the all-empty-docs
    signature) before the self-join — the same skew guard as ``max_df``.
    """
    candidates = _lsh_candidate_pairs(docs, k, bands, n, max_bucket)
    # Exact-Jaccard verification restricted to the candidate pairs — the whole
    # point of LSH at scale. (An earlier form computed the full all-pairs
    # Jaccard and joined, making LSH cost MORE than brute force.) Work is
    # O(candidates x shingles-per-doc), all keyed equi-joins.
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        candidates.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            sh.withColumnRenamed("doc_id", "doc_b"),
            ["doc_b", "shingle"],
            "inner",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    # shuffle_hash on the sizes joins for the same reason as
    # ngram_jaccard_pairs: the statically-underestimated candidate/intersection
    # relation must never become a broadcast build side.
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").hint("shuffle_hash"), "doc_a"
        )
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").hint("shuffle_hash"), "doc_b"
        )
        .withColumnRenamed("sz", "sz_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= verify_threshold)
        .orderBy("doc_a", "doc_b")
    )


def _lsh_candidates_ctes_sql(
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> str:
    """CTE chain (sig → bucketed0 → bucketed → cand) shared by the LSH-blocked
    oracles: ``cand`` is the distinct (doc_a < doc_b) candidate set."""
    rows_per_band = k // bands
    band_exprs = ",\n                ".join(
        "concat_ws('_', "
        + ", ".join([str(b)] + [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)])
        + ")"
        for b in range(bands)
    )
    cap = (
        "WHERE bucket NOT IN (SELECT bucket FROM bucketed0 "
        f"GROUP BY bucket HAVING COUNT(*) > {max_bucket})"
        if max_bucket is not None
        else ""
    )
    return f"""sig AS ({minhash_signatures_sql(k, n)}),
        bucketed0 AS (
            SELECT doc_id, unnest([
                {band_exprs}
            ]) AS bucket
            FROM sig
        ),
        bucketed AS (SELECT * FROM bucketed0 {cap}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bucketed a JOIN bucketed b USING (bucket)
            WHERE a.doc_id < b.doc_id
        )"""


def minhash_lsh_pairs_sql(
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    verify_threshold: float = 0.2,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> str:
    """Full DuckDB oracle for ``minhash_lsh_pairs``: the banding, bucket
    self-join and exact-Jaccard verification are all deterministic given the
    md5-derived hash twins, so the whole pipeline (not just the verify stage)
    is SQL-expressible."""
    return f"""
        WITH {_lsh_candidates_ctes_sql(k, bands, n, max_bucket)},
        sh AS ({shingles_sql(n)}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        inter AS (
            SELECT doc_a, doc_b, COUNT(*) AS inter
            FROM cand
            JOIN sh sa ON sa.doc_id = cand.doc_a
            JOIN sh sb ON sb.doc_id = cand.doc_b AND sb.shingle = sa.shingle
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= {verify_threshold}
        ORDER BY doc_a, doc_b
    """


# --- LSH-blocked exact edit distance -------------------------------------------

EDIT_MAX_DIST = 32


def edit_distance_pairs(
    docs: DataFrame,
    max_dist: int = EDIT_MAX_DIST,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Character-level near-dup pairs: MinHash-LSH band collisions generate
    candidates, exact Levenshtein on the normalized text verifies them —
    (doc_a, doc_b, dist) for dist <= max_dist. The edit-distance layer
    catches in-place token substitutions (dates, names, version strings)
    that shingle-Jaccard under-scores when every affected n-gram changes.

    Precision is exact (every emitted pair IS within max_dist); recall is
    the LSH trade, same as minhash_lsh_pairs. The verify uses Spark's
    THRESHOLDED levenshtein (banded O(max_dist * len) per pair, not the
    full O(len^2) DP) — the candidates-only + banded-DP combination is
    what keeps character-exact dedup affordable at corpus scale.

    Scale shape: the blocking stage is the audited LSH pipeline (hot-bucket
    cap, bucket-keyed self-join); verification joins the candidate pairs
    back to the two text sides by doc key and runs a narrow per-row
    comparison — no all-pairs step anywhere."""
    cand = _lsh_candidate_pairs(docs, k, bands, n, max_bucket)
    norm = docs.select("doc_id", _norm(F.col("text")).alias("norm_text"))
    dist = F.levenshtein("text_a", "text_b", max_dist)
    return (
        cand.join(
            norm.select(
                F.col("doc_id").alias("doc_a"), F.col("norm_text").alias("text_a")
            ).hint("shuffle_hash"),
            "doc_a",
        )
        .join(
            norm.select(
                F.col("doc_id").alias("doc_b"), F.col("norm_text").alias("text_b")
            ).hint("shuffle_hash"),
            "doc_b",
        )
        .select("doc_a", "doc_b", dist.cast("int").alias("dist"))
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .orderBy("doc_a", "doc_b")
    )


def edit_distance_pairs_sql(
    max_dist: int = EDIT_MAX_DIST,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> str:
    """DuckDB twin: same LSH candidate CTEs + unbanded levenshtein filter
    (DuckDB has no threshold arg; the <= filter selects the same set)."""
    return f"""
        WITH {_lsh_candidates_ctes_sql(k, bands, n, max_bucket)},
        norm AS (SELECT doc_id, {_norm_sql('text')} AS norm_text FROM documents)
        SELECT doc_a, doc_b,
               CAST(levenshtein(a.norm_text, b.norm_text) AS INT) AS dist
        FROM cand
        JOIN norm a ON a.doc_id = doc_a
        JOIN norm b ON b.doc_id = doc_b
        WHERE levenshtein(a.norm_text, b.norm_text) <= {max_dist}
        ORDER BY doc_a, doc_b
    """


# --- SimHash ------------------------------------------------------------------

# 48 bits (not 32): md5_int supplies 60 usable bits, and 12-bit band chunks
# give 4096-value buckets — with 32 bits the templated fixture text collapses
# into a handful of 8-bit buckets and the candidate join goes quadratic.
SIMHASH_BITS = 48


def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash over word tokens: bit b is the sign of the sum of (+1/-1) votes
    from each distinct word's hash bit b. One explode + one groupBy."""
    from .text import WS_RE

    # per-doc distinct words narrowly (array_distinct before the explode) —
    # a .distinct() after the explode would shuffle the full token relation
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(_norm(F.col("text")), WS_RE), lambda x: x != "")
            )
        ).alias("w"),
    ).select("doc_id", (md5_int(F.col("w"))).alias("h"))
    # vote/bit expressions as parsed SQL strings — one py4j round-trip per
    # expression instead of ~7 Column-API calls each (plan-build time halves)
    votes = [
        F.expr(f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}")
        for b in range(bits)
    ]
    agg = words.groupBy("doc_id").agg(*votes)
    sig_sql = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return agg.selectExpr("doc_id", f"({sig_sql}) AS simhash")


def simhash_signatures_sql(bits: int = SIMHASH_BITS) -> str:
    from .text import WS_RE

    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    sig = " + ".join(f"(CASE WHEN v{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(bits))
    return f"""
        WITH words AS (
            SELECT DISTINCT doc_id, w
            FROM (
                SELECT doc_id,
                       unnest(string_split_regex({_norm_sql('text')}, '{WS_RE}')) AS w
                FROM documents
            ) WHERE w <> ''
        ),
        hashed AS (SELECT doc_id, {md5_int_sql('w')} AS h FROM words),
        votes AS (
            SELECT doc_id,
               {votes}
            FROM hashed GROUP BY doc_id
        )
        SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes
    """


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, via 4-chunk banding
    (pigeonhole guarantee for distance <= 3 over 4 chunks: at least one chunk
    equal; larger radii are recall-approximate). ``max_bucket`` bounds each
    chunk bucket before the self-join (skew guard; a dropped hot bucket
    weakens the pigeonhole guarantee only for docs inside it)."""
    sig = simhash_signatures(docs, bits)
    width = bits // 4
    mask = (1 << width) - 1
    chunks = [
        (F.shiftright(F.col("simhash"), width * c).bitwiseAND(F.lit(mask))).alias(
            f"c{c}"
        )
        for c in range(4)
    ]
    banded = sig.select("doc_id", "simhash", *chunks)
    bucketed = banded.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws("_", F.lit(c), F.col(f"c{c}").cast("string"))
                    for c in range(4)
                ]
            )
        ).alias("bucket"),
    ).repartition("bucket")  # single exchange shared by cap + self-join
    if max_bucket is not None:
        bucketed = _bucket_cap(bucketed, max_bucket)
    pairs = (
        bucketed.alias("a")
        .join(bucketed.alias("b"), "bucket")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        # filter BEFORE the distinct: a pair colliding in several chunks is
        # deduped after the cheap hamming cut, not shuffled 4x first
        .where(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
    return pairs


def simhash_near_pairs_sql(
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> str:
    """Full DuckDB oracle for ``simhash_near_pairs`` — signatures, chunk
    banding, bucket join and Hamming filter are all deterministic integer
    arithmetic, identical in both engines."""
    width = bits // 4
    mask = (1 << width) - 1
    chunk_exprs = ",\n                ".join(
        f"concat_ws('_', {c}, CAST((simhash >> {width * c}) & {mask} AS VARCHAR))"
        for c in range(4)
    )
    cap = (
        "WHERE bucket NOT IN (SELECT bucket FROM bucketed0 "
        f"GROUP BY bucket HAVING COUNT(*) > {max_bucket})"
        if max_bucket is not None
        else ""
    )
    return f"""
        WITH sig AS ({simhash_signatures_sql(bits)}),
        bucketed0 AS (
            SELECT doc_id, simhash, unnest([
                {chunk_exprs}
            ]) AS bucket
            FROM sig
        ),
        bucketed AS (SELECT * FROM bucketed0 {cap})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM bucketed a JOIN bucketed b USING (bucket)
        WHERE a.doc_id < b.doc_id
          AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
        ORDER BY doc_a, doc_b
    """


# --- cluster resolution (connected components) --------------------------------


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    max_rounds: int = 50,
) -> DataFrame:
    """Resolve near-dup PAIRS into CLUSTERS: each doc labeled with the min
    doc_id of its connected component (the canonical representative a
    training pipeline keeps; everything else in the cluster is dropped).

    Algorithm: iterative min-label propagation — each round every node takes
    the min of its own label and its neighbors' labels; converges in
    graph-diameter rounds (near-dup components are shallow: dup clusters are
    dense, so diameter is small — typically 2-3 rounds). Convergence is
    detected by the global label SUM (monotone non-increasing integer; equal
    sum ⇔ fixpoint), one scalar action per round — no data-sized collect.
    Each round's labels are localCheckpoint-ed to keep lineage flat.

    At extreme diameters (chain-shaped graphs) the alternating small-star/
    large-star variant converges in O(log n) rounds with the same per-round
    join shape; near-dup graphs don't need it.

    ``pairs`` must have (doc_a, doc_b) columns with doc_a < doc_b. Docs in no
    pair form singleton clusters (cluster_id = own doc_id).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        # materialize once: the union references `pairs` twice and every
        # propagation round joins `edges` — without this the (expensive)
        # pair-generation plan re-executes 2x per round
        .localCheckpoint(eager=True)
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    prev_sum = None
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(
                labels.withColumnRenamed("doc_id", "v"), "v"
            )
            .groupBy("u")
            .agg(F.min("cluster_id").alias("nbr_label"))
            .withColumnRenamed("u", "doc_id")
        )
        labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_label", "cluster_id")
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        # decimal(38,0): label ids can be 60-bit (md5-keyed nodes, e.g. the
        # golden-records reuse) and an int64 sum overflows — fatally under
        # the driver's bare ANSI session
        cur_sum = labels.agg(F.sum(F.col("cluster_id").cast("decimal(38,0)"))).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.orderBy("doc_id")


def dedup_clusters_sql(pairs_sql: str, docs_rel: str = "documents") -> str:
    """DuckDB oracle: min label over the transitive closure (recursive CTE
    with UNION dedup for termination)."""
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        reach(src, dst) AS (
            SELECT doc_id, doc_id FROM {docs_rel}
            UNION
            SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst
        )
        SELECT src AS doc_id, MIN(dst) AS cluster_id
        FROM reach GROUP BY src ORDER BY doc_id
    """


# --- embedding-cosine near-dup ------------------------------------------------


def _dot(a, b):
    """Double-precision dot product via zip_with + ordered fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _l2norm(a):
    """Double-precision L2 norm (same ordered fold as ``_dot(a, a)``)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _cosine(a, b):
    """Double-precision cosine via zip_with + ordered fold (matches DuckDB's
    list_cosine_similarity over DOUBLE[] bit-for-bit on the same arrays).

    Prefer precomputing ``_l2norm`` per vector and dividing a ``_dot`` by the
    two norms when scoring many pairs — higher-order folds are interpreted
    (not codegen'd), so three folds per pair costs 3x one."""
    return _dot(a, b) / (_l2norm(a) * _l2norm(b))


def embedding_near_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), blocked by `label`.

    Blocking turns the O(n^2) all-pairs into O(sum of block^2) and shuffles on
    the block key; the unblocked scale path is LSH in similarity.py.
    """
    # Norm precomputed once per vector (identical fold arithmetic to the
    # inline form, so 6-dp-rounded cosines are unchanged); per pair only the
    # dot fold remains — 3x fewer interpreted higher-order evals.
    e = embeddings.select(
        "vec_id", "label", "embedding", _l2norm(F.col("embedding")).alias("nrm")
    )
    return (
        e.alias("a")
        .join(e.alias("b"), "label")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                _dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_pairs_sql(threshold: float = 0.95) -> str:
    return f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(
                   a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.label = b.label
        WHERE a.vec_id < b.vec_id
          AND round(list_cosine_similarity(
                  a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {threshold}
        ORDER BY vec_a, vec_b
    """


def cluster_representatives(docs: DataFrame, labels: DataFrame) -> DataFrame:
    """Pick each near-dup cluster's KEEP document — the longest member,
    ties to the smallest doc_id (the content-retention policy training
    pipelines actually use: keep the most complete copy, drop the rest).

    ``labels`` is ``dedup_clusters`` output (doc_id, cluster_id). One
    doc_id-keyed join + one window over cluster members; cluster sizes are
    bounded by the dedup threshold's true-duplicate density, so the window
    partitions stay small at any corpus size."""
    members = labels.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        members.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count("*").over(Window.partitionBy("cluster_id")).cast("long"),
        )
        .where(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").alias("rep_chars"),
            "n_members",
        )
        .orderBy("cluster_id")
    )


def cluster_representatives_sql(clusters_sql: str, docs_rel: str = "documents") -> str:
    return f"""
        WITH labels AS ({clusters_sql}),
        members AS (
            SELECT l.doc_id, l.cluster_id, d.n_chars
            FROM labels l JOIN {docs_rel} d USING (doc_id)
        )
        SELECT cluster_id,
               doc_id AS rep_doc_id,
               n_chars AS rep_chars,
               n_members
        FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY cluster_id
                       ORDER BY n_chars DESC, doc_id ASC
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
            FROM members
        )
        WHERE rn = 1
        ORDER BY cluster_id
    """


# --- substring-level dedup (common substring spans) ---------------------------

# Skew/boilerplate guard for the positioned-fingerprint posting lists: a hash
# selected in more docs than this is template boilerplate (headers, license
# blurbs) — dropped IDENTICALLY in Spark and the oracle before pairing, exactly
# like DEFAULT_MAX_DF for shingles. 256 keeps every genuine shared-passage hash
# at fixture scale while bounding the pair join at ~max_df^2 per hash.
COMMON_SUB_MAX_DF = 256
# A span needs >= this many aligned selected fingerprints to count. With
# winnowing density ~2/(w+1), 3 aligned selections ≈ a shared run of several
# dozen characters — long enough to be a copied passage, not a stock phrase.
COMMON_SUB_MIN_HITS = 3


def common_substring_spans(
    docs: DataFrame,
    k: int | None = None,
    w: int | None = None,
    min_hits: int = COMMON_SUB_MIN_HITS,
    max_df: int = COMMON_SUB_MAX_DF,
) -> DataFrame:
    """Substring-level dedup: find long substrings SHARED between documents
    (the within-corpus repeated-passage detection of suffix-array substring
    dedup, re-expressed as bounded Spark relational algebra).

    How: positioned winnowing selections (text.winnowing_selected_positions)
    give each doc a sparse set of (hash, position) fingerprints whose
    positions are content-locked. Two docs sharing a substring select the
    same hashes at positions differing by a CONSTANT delta, so grouping the
    fingerprint matches of a doc pair by ``pos_a - pos_b`` and counting
    collapses shared passages into (pair, delta) rows; ``min_hits`` aligned
    selections certify a long shared run and the min/max matched positions
    bound its span in doc_a's normalized text.

    Scale shape (why this survives 100 TB where suffix arrays don't):
    fingerprinting is array-side zero-shuffle; the posting self-join is keyed
    by hash with ``max_df`` capping any posting list (boilerplate guard —
    without it one license-header hash makes the join quadratic in corpus
    size); the span aggregate is keyed (doc_a, doc_b, delta). One
    ``repartition("selected_hash")`` exchange is shared by the hot-hash count,
    the cap anti-join, and both self-join sides.
    """
    from .text import WINNOW_K, WINNOW_W, winnowing_selected_positions

    k = WINNOW_K if k is None else k
    w = WINNOW_W if w is None else w
    sel = winnowing_selected_positions(docs, k, w)
    # Posting-ARRAY expansion (the ngram_jaccard shape) instead of a hash
    # self-join: one groupBy collects each hash's (doc, pos) members; the
    # df-cap and the df>=2 early-drop (a hash held by one doc cannot pair;
    # most content is unique) become free WHEREs on the array; cross-doc
    # ordered pairs expand NARROWLY inside each posting. This computes the
    # fingerprint pipeline ONCE and shuffles it once — the earlier join form
    # paid the whole pipeline per join branch when exchange reuse missed.
    posts = (
        sel.groupBy("selected_hash")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "pos"))
            ).alias("ms")
        )
        .where(
            (F.col("ms")[F.size("ms") - 1]["doc_id"] != F.col("ms")[0]["doc_id"])
            & (
                F.size(F.array_distinct(F.transform("ms", lambda m: m["doc_id"])))
                <= max_df
            )
        )
    )
    # all ordered cross-doc pairs from one posting list; members are sorted by
    # (doc_id, pos) so x.doc_id <= y.doc_id for x before y — keep strict <
    pair_structs = F.expr(
        "flatten(transform(ms, (x, i) -> "
        "  transform(filter(slice(ms, i + 2, size(ms) - i - 1), "
        "                   y -> y.doc_id > x.doc_id), "
        "            y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
        "                        x.pos AS pos_a, x.pos - y.pos AS delta))))"
    )
    pairs = posts.select(F.explode(pair_structs).alias("p")).select("p.*")
    return (
        pairs.groupBy(
            "doc_a", "doc_b", F.col("delta").alias("offset_delta")
        )
        .agg(
            F.count("*").cast("long").alias("n_shared"),
            F.min("pos_a").alias("a_start"),
            (F.max("pos_a") + (k - 1)).alias("a_end"),
        )
        .where(F.col("n_shared") >= min_hits)
        .orderBy("doc_a", "doc_b", "offset_delta")
    )


def common_substring_spans_sql(
    k: int | None = None,
    w: int | None = None,
    min_hits: int = COMMON_SUB_MIN_HITS,
    max_df: int = COMMON_SUB_MAX_DF,
) -> str:
    from .text import WINNOW_B, WINNOW_K, WINNOW_M, WINNOW_W, _norm_sql

    k = WINNOW_K if k is None else k
    w = WINNOW_W if w is None else w
    norm = _norm_sql("text")
    horner = "c.cs[g.p]"
    for d in range(1, k):
        horner = f"(({horner}) * {WINNOW_B} + c.cs[g.p + {d}]) % {WINNOW_M}"
    return f"""
    WITH nt AS (
        SELECT doc_id, {norm} AS nt FROM documents
        WHERE length({norm}) >= {k + w - 1}
    ),
    codes AS (
        SELECT doc_id,
               list_transform(string_split(nt, ''),
                              ch -> CAST(unicode(ch) AS BIGINT)) AS cs
        FROM nt
    ),
    grams AS (
        SELECT doc_id, len(cs) AS L,
               unnest(generate_series(1, len(cs) - {k - 1})) AS p
        FROM codes
    ),
    hashed AS (
        SELECT g.doc_id, g.L, g.p AS p, {horner} AS h
        FROM grams g JOIN codes c USING (doc_id)
    ),
    mins AS (
        SELECT doc_id, p,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m,
               L - {k - 1} - {w - 1} AS n_windows
        FROM hashed
    ),
    runflag AS (
        SELECT doc_id, p, m,
               LAG(m) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        FROM mins WHERE p <= n_windows
    ),
    selected AS (
        SELECT doc_id, m AS selected_hash, p AS pos
        FROM runflag WHERE prev IS NULL OR m <> prev
    ),
    hot AS (
        SELECT selected_hash FROM selected
        GROUP BY selected_hash HAVING COUNT(DISTINCT doc_id) > {max_df}
    ),
    kept AS (
        SELECT * FROM selected
        WHERE selected_hash NOT IN (SELECT selected_hash FROM hot)
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.pos - b.pos AS offset_delta, a.pos AS pos_a
        FROM kept a JOIN kept b
          ON a.selected_hash = b.selected_hash AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, offset_delta,
           COUNT(*) AS n_shared,
           MIN(pos_a) AS a_start,
           MAX(pos_a) + {k - 1} AS a_end
    FROM pairs
    GROUP BY doc_a, doc_b, offset_delta
    HAVING COUNT(*) >= {min_hits}
    ORDER BY doc_a, doc_b, offset_delta
    """


# --- Bloom-filter pre-filter for incremental corpus dedup ---------------------

# 2^15 bits / 5 probes: at fixture corpus sizes the false-positive rate is
# ~1e-9 (the exact-verify branch still covers any FP, so these are throughput
# knobs, not correctness knobs). At 100 TB the corpus build emits the same
# bitmap at a larger m — the probe side is unchanged.
BLOOM_M_BITS = 1 << 15
BLOOM_H = 5


def _bloom_positions(col, i: int, m: int):
    """i-th Bloom probe position via Kirsch-Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m, h2 in [1, m-1] so probes never collapse."""
    h1 = F.pmod(F.xxhash64(col), F.lit(m))
    h2 = F.pmod(F.xxhash64(col, F.lit("bloom-salt-2")), F.lit(m - 1)) + 1
    return F.pmod(h1 + F.lit(i) * h2, F.lit(m))


def bloom_bitmap(
    keys: DataFrame, key_col: str = "fingerprint", m: int = BLOOM_M_BITS, h: int = BLOOM_H
) -> DataFrame:
    """Distributed Bloom-filter build: ONE-row DataFrame holding the filter as
    ``array<long>`` (m/64 words). Each key contributes h bit positions
    (narrow); positions aggregate with map-side-combined ``bit_or`` keyed by
    word index (<= m/64 groups); the word map assembles into a dense array in
    a final 1-row aggregate. The result broadcasts to probes as a few KB/MB
    regardless of corpus row count — this is the pure-DataFrame equivalent of
    Spark's internal (unregistered) ``bloom_filter_agg``."""
    n_words = m // 64
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_positions(F.col(key_col), i, m) for i in range(h)])
        ).alias("pos")
    )
    # F.shiftleft's numBits only takes a Python int; call_function reaches
    # the SQL shiftleft(col, col) overload for a per-row shift amount
    words = pos.select(
        F.expr("pos div 64").alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(F.col("pos"), F.lit(64)).cast("int")
        ).alias("bit"),
    )
    word_bits = words.groupBy("word").agg(F.bit_or("bit").alias("bits"))
    return word_bits.agg(
        F.map_from_arrays(F.collect_list("word"), F.collect_list("bits")).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("wm"), i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )


def bloom_might_contain(col, bloom_col, m: int = BLOOM_M_BITS, h: int = BLOOM_H):
    """Pure-column Bloom membership test (JVM codegen, zero shuffle): all h
    probe bits set in the broadcast bitmap array."""
    test = F.lit(True)
    for i in range(h):
        pos = _bloom_positions(col, i, m)
        word_idx = F.floor(pos / 64).cast("int") + 1  # element_at is 1-based
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        test = test & (F.element_at(bloom_col, word_idx).bitwiseAND(bit) != 0)
    return test


def incremental_new_docs_bloom(
    docs: DataFrame,
    split_id: int = CORPUS_SPLIT_ID,
    m: int = BLOOM_M_BITS,
    h: int = BLOOM_H,
) -> DataFrame:
    """Ingest-time dedup with a Bloom pre-filter: same RESULT as
    incremental_new_docs (the oracle pins them identical), different plan —
    the broadcast bitmap eliminates definitely-new docs with a narrow column
    test, so only Bloom-positive candidates (true dups + rare false
    positives) reach the exact fingerprint anti-join. At 100 TB ingest this
    turns "shuffle every batch fingerprint against the corpus" into "shuffle
    only the ~dup-rate fraction that might match": the anti-join's probe side
    shrinks from |batch| to |candidates| while correctness is preserved
    exactly because every Bloom positive is re-verified against the real
    corpus fingerprint set."""
    fp = F.md5(_norm(F.col("text"))).alias("fingerprint")
    corpus = docs.where(F.col("doc_id") < split_id).select(fp)
    batch = docs.where(F.col("doc_id") >= split_id).select("doc_id", fp)
    bitmap = bloom_bitmap(corpus, m=m, h=h)
    probed = batch.crossJoin(F.broadcast(bitmap)).withColumn(
        "maybe_seen", bloom_might_contain(F.col("fingerprint"), F.col("bloom"), m, h)
    )
    definite_new = probed.where(~F.col("maybe_seen")).select("doc_id", "fingerprint")
    candidates = probed.where(F.col("maybe_seen")).select("doc_id", "fingerprint")
    verified_new = candidates.join(corpus, "fingerprint", "left_anti")
    return (
        definite_new.unionByName(verified_new)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
    )


# --- incremental NEAR-dup ingest dedup (MinHash-LSH batch-vs-corpus) ----------


def incremental_minhash_new_docs(
    docs: DataFrame,
    split_id: int = CORPUS_SPLIT_ID,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    verify_threshold: float = 0.2,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """NEAR-dup ingest dedup: keep the batch docs that are not near-duplicates
    of anything already in the corpus. ``incremental_new_docs`` catches only
    byte-identical content; real ingest also has to drop light edits of
    already-held documents — the batch-vs-corpus twin of
    ``minhash_lsh_pairs``.

    Scale shape: signatures/banding are the existing one-shuffle pipeline; the
    candidate join is batch-buckets x corpus-buckets (NOT a corpus self-join —
    cost tracks batch size, the quantity that matters at ingest), with hot
    CORPUS buckets capped before the join; candidates-only exact-Jaccard
    verification; final LEFT ANTI of the batch against verified matches. In a
    deployed lake the corpus-side bucket relation is materialized once and
    bucket-bucketed on disk, so each ingest batch shuffles only itself.
    """
    sig = minhash_signatures(docs, k, n)
    rows_per_band = k // bands
    band_cols = [
        F.concat_ws(
            "_",
            F.lit(b),
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    bucketed = (
        sig.select("doc_id", *band_cols)
        .select(
            "doc_id",
            F.explode(
                F.array(*[F.col(f"band{b}") for b in range(bands)])
            ).alias("bucket"),
        )
        .repartition("bucket")
    )
    corpus_b = bucketed.where(F.col("doc_id") < split_id)
    batch_b = bucketed.where(F.col("doc_id") >= split_id)
    if max_bucket is not None:
        hot = (
            corpus_b.groupBy("bucket")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > max_bucket)
            .select("bucket")
        )
        corpus_b = corpus_b.join(F.broadcast(hot), "bucket", "left_anti")
        batch_b = batch_b.join(F.broadcast(hot), "bucket", "left_anti")
    candidates = (
        batch_b.select(F.col("doc_id").alias("batch_doc"), "bucket")
        .join(
            corpus_b.select(F.col("doc_id").alias("corpus_doc"), "bucket"),
            "bucket",
        )
        .select("batch_doc", "corpus_doc")
        .distinct()
    )
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        candidates.join(sh.withColumnRenamed("doc_id", "batch_doc"), "batch_doc")
        .join(
            sh.withColumnRenamed("doc_id", "corpus_doc"),
            ["corpus_doc", "shingle"],
            "inner",
        )
        .groupBy("batch_doc", "corpus_doc")
        .agg(F.count("*").alias("inter"))
    )
    # shuffle_hash: see ngram_jaccard_pairs — the candidate-intersection side
    # must not be chosen as a (statically underestimated) broadcast build side
    matched = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "batch_doc")
            .withColumnRenamed("sz", "sz_a")
            .hint("shuffle_hash"),
            "batch_doc",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "corpus_doc")
            .withColumnRenamed("sz", "sz_b")
            .hint("shuffle_hash"),
            "corpus_doc",
        )
        .where(
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            )
            >= verify_threshold
        )
        .select(F.col("batch_doc").alias("doc_id"))
        .distinct()
    )
    batch = docs.where(F.col("doc_id") >= split_id).select("doc_id")
    return batch.join(matched, "doc_id", "left_anti").orderBy("doc_id")


def incremental_minhash_new_docs_sql(
    split_id: int = CORPUS_SPLIT_ID,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    verify_threshold: float = 0.2,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> str:
    rows_per_band = k // bands
    band_exprs = ",\n                ".join(
        "concat_ws('_', "
        + ", ".join(
            [str(b)] + [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        )
        + ")"
        for b in range(bands)
    )
    cap = (
        "WHERE bucket NOT IN (SELECT bucket FROM corpus_b0 "
        f"GROUP BY bucket HAVING COUNT(*) > {max_bucket})"
        if max_bucket is not None
        else ""
    )
    return f"""
        WITH sig AS ({minhash_signatures_sql(k, n)}),
        bucketed0 AS (
            SELECT doc_id, unnest([
                {band_exprs}
            ]) AS bucket
            FROM sig
        ),
        corpus_b0 AS (SELECT * FROM bucketed0 WHERE doc_id < {split_id}),
        batch_b0 AS (SELECT * FROM bucketed0 WHERE doc_id >= {split_id}),
        corpus_b AS (SELECT * FROM corpus_b0 {cap}),
        batch_b AS (SELECT * FROM batch_b0 {cap}),
        cand AS (
            SELECT DISTINCT b.doc_id AS batch_doc, c.doc_id AS corpus_doc
            FROM batch_b b JOIN corpus_b c USING (bucket)
        ),
        sh AS ({shingles_sql(n)}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        inter AS (
            SELECT batch_doc, corpus_doc, COUNT(*) AS inter
            FROM cand
            JOIN sh sa ON sa.doc_id = cand.batch_doc
            JOIN sh sb ON sb.doc_id = cand.corpus_doc AND sb.shingle = sa.shingle
            GROUP BY 1, 2
        ),
        matched AS (
            SELECT DISTINCT batch_doc AS doc_id
            FROM inter
            JOIN sizes sa ON sa.doc_id = batch_doc
            JOIN sizes sb ON sb.doc_id = corpus_doc
            WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= {verify_threshold}
        )
        SELECT doc_id FROM documents
        WHERE doc_id >= {split_id}
          AND doc_id NOT IN (SELECT doc_id FROM matched)
        ORDER BY doc_id
    """


def repeated_span_coverage(
    docs: DataFrame,
    k: int | None = None,
    w: int | None = None,
    min_hits: int = COMMON_SUB_MIN_HITS,
    max_df: int = COMMON_SUB_MAX_DF,
) -> DataFrame:
    """Per-document coverage of CROSS-DOC repeated passages: how much of each
    doc (the doc_b 'later copy' side of common_substring_spans) is covered by
    substrings shared with an earlier doc — the quantity substring-level
    dedup policies threshold on ("drop/trim docs that are >X% copied").

    Overlapping spans from different partners are merged with the classic
    island algebra: per doc, order spans by start, a span opens a new island
    when its start exceeds the running max end, island id = running sum of
    opens, then one aggregate per island and one per doc. Two window passes
    + two aggregates, ALL keyed by doc_id — the span relation is tiny
    relative to the corpus (pairs with >= min_hits aligned fingerprints), so
    this adds nothing to the substring pipeline's scale envelope.
    """
    spans = common_substring_spans(docs, k, w, min_hits, max_df)
    # DISTINCT before the island windows: duplicate (s, e) rows (same span
    # shared with several partners) are redundant for coverage, and their
    # tie-order between the two window sorts is engine/run-nondeterministic —
    # an opens=1 flag can land on a different duplicate in the re-sort and
    # split an island. Unique rows make the (s, e) ordering total.
    b_spans = spans.select(
        F.col("doc_b").alias("doc_id"),
        (F.col("a_start") - F.col("offset_delta")).alias("s"),
        (F.col("a_end") - F.col("offset_delta")).alias("e"),
    ).distinct()
    order = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        b_spans.withColumn(
            "opens",
            F.when(
                prev_max_end.isNull() | (F.col("s") > prev_max_end), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("opens").over(
                order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    return (
        islands.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_islands"),
            F.sum(F.col("e") - F.col("s") + 1).alias("covered_chars"),
        )
        .orderBy("doc_id")
    )


def repeated_span_coverage_sql(
    k: int | None = None,
    w: int | None = None,
    min_hits: int = COMMON_SUB_MIN_HITS,
    max_df: int = COMMON_SUB_MAX_DF,
) -> str:
    return f"""
    WITH spans AS ({common_substring_spans_sql(k, w, min_hits, max_df)}),
    b_spans AS (
        SELECT DISTINCT doc_b AS doc_id,
               a_start - offset_delta AS s,
               a_end - offset_delta AS e
        FROM spans
    ),
    flagged AS (
        SELECT doc_id, s, e,
               CASE WHEN MAX(e) OVER (
                        PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR s > MAX(e) OVER (
                        PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
                    THEN 1 ELSE 0 END AS opens
        FROM b_spans
    ),
    numbered AS (
        SELECT doc_id, s, e,
               SUM(opens) OVER (
                   PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    ),
    islands AS (
        SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e
        FROM numbered GROUP BY doc_id, island
    )
    SELECT doc_id,
           COUNT(*) AS n_islands,
           CAST(SUM(e - s + 1) AS BIGINT) AS covered_chars
    FROM islands
    GROUP BY doc_id
    ORDER BY doc_id
    """


# --- connected components: alternating two-star algorithm ---------------------


def _canonical_edges(e: DataFrame) -> DataFrame:
    """Undirected edge set stored once as (hi, lo), hi > lo, deduplicated."""
    return (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node u links its LARGER neighbors to the min
    of its closed neighborhood. Emits (v, m) for v in N(u), v > u."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node u links its SMALLER-or-equal neighbors
    (and itself) to the min of its closed neighborhood. Operates on the
    (hi, lo) orientation, so the per-u neighbor set is all v < u."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = d.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
    links = d.join(mins, "u")
    return (
        links.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(links.select("u", F.col("m").alias("v")))
    )


def dedup_clusters_twostar(
    docs: DataFrame, pairs: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """Connected components via the alternating large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — same output contract as ``dedup_clusters`` (each doc labeled
    with its component's min doc_id; singletons label themselves), same
    DuckDB oracle.

    Why keep BOTH: min-label propagation (dedup_clusters) converges in
    graph-DIAMETER rounds — ideal for dense near-dup clusters (2-3 rounds),
    linear-round-count on chain-shaped graphs. The star alternation contracts
    any component to a star in O(log n) rounds regardless of diameter: each
    round is two keyed aggregates + joins (same per-round shuffle shape),
    and convergence is detected by a (count, hash-sum) scalar pair — no
    data-sized collect. At 100 TB this is the adversarial-topology insurance
    policy; edge state is localCheckpoint-ed per round to keep lineage flat.
    """
    edges = _canonical_edges(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    ).localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_rounds):
        edges = _canonical_edges(_small_star(_large_star(edges))).localCheckpoint(
            eager=True
        )
        # bit_xor, not sum: order-independent like sum but can never overflow
        # (an ANSI-on caller session would fail a 64-bit hash SUM)
        sig = tuple(
            edges.agg(
                F.count("*"),
                F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)),
            ).first()
        )
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged edges form stars (u -> component min); docs in no pair are
    # their own singleton cluster
    labels = edges.groupBy(F.col("u").alias("doc_id")).agg(
        F.min("v").alias("cluster_id")
    )
    return (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
        .orderBy("doc_id")
    )


# --- prefix-filtered all-pairs similarity join (PPJoin-lite) -------------------

PREFIX_THRESHOLD = 0.5


def prefix_filter_pairs(
    docs: DataFrame, n: int = DEFAULT_N, threshold: float = PREFIX_THRESHOLD
) -> DataFrame:
    """All pairs with n-gram Jaccard ≥ ``threshold`` via PREFIX FILTERING
    (Chaudhuri et al. 2006 / PPJoin, Xiao et al. 2008) — provably the same
    result as the brute-force all-pairs join (the oracle IS brute force;
    the differential test is the filter-correctness theorem).

    Order each doc's shingles by ascending GLOBAL document frequency (rarest
    first, shingle text as tiebreak — a total order both engines agree on).
    Two sets with Jaccard ≥ τ overlap in ≥ ⌈τ·max(|A|,|B|)⌉ elements, so each
    must hit the other's first |s| − ⌈τ·|s|⌉ + 1 tokens: ONLY those prefix
    tokens index candidates. Frequent shingles sort to the ends of docs and
    almost never enter an index list — the skew that forces ``max_df`` caps
    in the plain inverted-index join is filtered OUT by construction, which
    is why this is the standard all-pairs algorithm at corpus scale.

    Plan: df aggregate (shingle-keyed) → per-doc rank window (doc-keyed) →
    prefix-only self-equi-join for candidates → verification on candidates
    only, via array_intersect of the two docs' sorted shingle arrays (the
    per-doc array relation is built once and joined twice)."""
    sh = shingles(docs, n)
    df = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = sh.join(df, "shingle").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "shingle")
        ),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    prefix = (
        ranked.join(sizes, "doc_id")
        # prefix length |s| - ceil(t*|s|) + 1
        .where(F.col("rnk") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
        .select("doc_id", "shingle", "sz")
    )
    # length filter (the other half of PPJoin): J ≥ τ forces τ·max(|A|,|B|)
    # ≤ min(|A|,|B|) — floor() keeps the bound PERMISSIVE under float
    # rounding so no true pair can be cut, only candidates
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .where(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.sz") >= F.floor(F.lit(threshold) * F.col("a.sz")))
            & (F.col("a.sz") >= F.floor(F.lit(threshold) * F.col("b.sz")))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    doc_sets = sh.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("shingle")).alias("set")
    )
    verified = (
        cands.join(
            doc_sets.select(
                F.col("doc_id").alias("doc_a"), F.col("set").alias("set_a")
            ).hint("shuffle_hash"),
            "doc_a",
        )
        .join(
            doc_sets.select(
                F.col("doc_id").alias("doc_b"), F.col("set").alias("set_b")
            ).hint("shuffle_hash"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("inter"),
            F.size("set_a").alias("sz_a"),
            F.size("set_b").alias("sz_b"),
        )
    )
    return (
        verified.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def prefix_filter_pairs_sql(
    n: int = DEFAULT_N, threshold: float = PREFIX_THRESHOLD
) -> str:
    """Brute-force all-pairs Jaccard — deliberately NO prefix logic, so the
    differential test checks the filter loses nothing."""
    return f"""
        WITH sh AS ({shingles_sql(n)}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= {threshold}
        ORDER BY doc_a, doc_b
    """


# --- hybrid lexical + semantic dedup ------------------------------------------


def hybrid_near_pairs(
    docs: DataFrame,
    embeddings: DataFrame,
    jaccard_threshold: float = 0.2,
    cosine_threshold: float = 0.95,
) -> DataFrame:
    """Union of LEXICAL near-dup pairs (n-gram Jaccard) and SEMANTIC pairs
    (embedding cosine, SemDeDup-style) with a provenance flag — the modern
    curation recipe: lexical catches templated boilerplate that embeds far
    apart, embeddings catch paraphrases that share no shingle; production
    pipelines run BOTH and resolve the union's clusters once.

    Pure composition: both inputs are existing capped/blocked pipelines
    (posting-list Jaccard, label-blocked cosine) joined by the shared
    doc_id = vec_id key space; the full-outer merge runs on the two PAIR
    relations (tiny), never the corpora."""
    lex = ngram_jaccard_pairs(docs, threshold=jaccard_threshold).select(
        "doc_a", "doc_b", F.lit(True).alias("lexical")
    )
    sem = embedding_near_pairs(embeddings, threshold=cosine_threshold).select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        F.lit(True).alias("semantic"),
    )
    return (
        lex.join(sem, ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("lexical", F.lit(False)).alias("lexical"),
            F.coalesce("semantic", F.lit(False)).alias("semantic"),
        )
        .orderBy("doc_a", "doc_b")
    )


def hybrid_near_pairs_sql(
    jaccard_threshold: float = 0.2, cosine_threshold: float = 0.95
) -> str:
    return f"""
        WITH lex AS (
            SELECT doc_a, doc_b, TRUE AS lexical
            FROM ({ngram_jaccard_pairs_sql(threshold=jaccard_threshold)})
        ), sem AS (
            SELECT vec_a AS doc_a, vec_b AS doc_b, TRUE AS semantic
            FROM ({embedding_near_pairs_sql(threshold=cosine_threshold)})
        )
        SELECT COALESCE(lex.doc_a, sem.doc_a) AS doc_a,
               COALESCE(lex.doc_b, sem.doc_b) AS doc_b,
               COALESCE(lexical, FALSE) AS lexical,
               COALESCE(semantic, FALSE) AS semantic
        FROM lex FULL OUTER JOIN sem
          ON lex.doc_a = sem.doc_a AND lex.doc_b = sem.doc_b
        ORDER BY doc_a, doc_b
    """


# --- cross-source duplication matrix ------------------------------------------


def cross_source_dup_matrix(docs: DataFrame) -> DataFrame:
    """Exact-duplicate leakage BETWEEN sources: for every source pair, how
    many identical-fingerprint doc pairs span them — the governance view
    that catches one feed republishing another (licensing/consent risk) and
    over-weighted mirror content before training.

    Fingerprint groups aggregate once (16-byte md5 keys); per-group
    (source, count) breakdowns are tiny arrays; the pair expansion runs per
    fingerprint group over its ≤|sources| distinct-source rows — never a
    doc×doc join. Within-source duplicate pairs report on the diagonal."""
    fp = docs.select(
        "source", F.md5(_norm(F.col("text"))).alias("fingerprint")
    )
    per_src = fp.groupBy("fingerprint", "source").agg(F.count("*").alias("n"))
    a = per_src.select(
        "fingerprint", F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    b = per_src.select(
        "fingerprint", F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    pairs = (
        a.join(b, "fingerprint")
        .where(F.col("source_a") <= F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            # cross-source: n_a*n_b pairs; within-source: n*(n-1)/2
            F.when(
                F.col("source_a") == F.col("source_b"),
                (F.col("n_a") * (F.col("n_a") - 1) / 2).cast("long"),
            )
            .otherwise(F.col("n_a") * F.col("n_b"))
            .alias("dup_pairs"),
        )
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(F.sum("dup_pairs").alias("dup_pairs"))
        .where(F.col("dup_pairs") > 0)
        .orderBy("source_a", "source_b")
    )


def cross_source_dup_matrix_sql() -> str:
    return f"""
        WITH fp AS (
            SELECT source, md5({_norm_sql('text')}) AS fingerprint
            FROM documents
        ), per_src AS (
            SELECT fingerprint, source, COUNT(*) AS n
            FROM fp GROUP BY fingerprint, source
        )
        SELECT a.source AS source_a, b.source AS source_b,
               SUM(CASE WHEN a.source = b.source
                        THEN CAST(a.n * (a.n - 1) // 2 AS BIGINT)
                        ELSE a.n * b.n END) :: BIGINT AS dup_pairs
        FROM per_src a JOIN per_src b
          ON a.fingerprint = b.fingerprint AND a.source <= b.source
        GROUP BY a.source, b.source
        HAVING SUM(CASE WHEN a.source = b.source
                        THEN CAST(a.n * (a.n - 1) // 2 AS BIGINT)
                        ELSE a.n * b.n END) > 0
        ORDER BY source_a, source_b
    """


# --- LSH calibration (band-collision estimate vs exact Jaccard) -----------------


def lsh_band_calibration(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Index-quality calibration for the MinHash-LSH dedup path: for every
    candidate pair, how many of the ``bands`` band buckets collided, vs the
    pair's EXACT n-gram Jaccard — grouped into the ≤``bands``-row calibration
    table (collided bands → observed mean/min/max similarity). This is how an
    operator validates the banding configuration before trusting it at
    100 TB: if 1-band collisions average the same Jaccard as 4-band
    collisions, the bands are too coarse.

    Plan: the signature/banding pipeline REUSED from minhash_lsh_pairs (one
    bucket-keyed self-join, hot buckets capped), pair band-hit counts from
    one pair-keyed aggregate, exact Jaccard only for candidates (the verify
    economics), then a ≤``bands``-row aggregate. Jaccard quantizes to
    milli-units per pair (round of identical exact-integer ratios), so every
    statistic is exact integer arithmetic."""
    sig = minhash_signatures(docs, k, n)
    rows_per_band = k // bands
    band_cols = [
        F.concat_ws(
            "_",
            F.lit(b),
            *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    bucketed = banded.select(
        "doc_id",
        F.explode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias("bucket"),
    ).repartition("bucket")
    if max_bucket is not None:
        bucketed = _bucket_cap(bucketed, max_bucket)
    hits = (
        bucketed.alias("a")
        .join(bucketed.alias("b"), "bucket")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("bands_hit"))
    )
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        hits.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    jac_milli = F.round(
        F.lit(1000.0)
        * F.col("inter")
        / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    ).cast("long")
    per_pair = (
        hits.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"inter": 0})
        .join(
            sizes.withColumnRenamed("doc_id", "doc_a").hint("shuffle_hash"), "doc_a"
        )
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").hint("shuffle_hash"), "doc_b"
        )
        .withColumnRenamed("sz", "sz_b")
        .select("bands_hit", jac_milli.alias("jac_milli"))
    )
    return (
        per_pair.groupBy("bands_hit")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.sum("jac_milli") / F.count("*")).cast("long").alias(
                "mean_jaccard_milli"
            ),
            F.min("jac_milli").alias("min_jaccard_milli"),
            F.max("jac_milli").alias("max_jaccard_milli"),
        )
        .withColumn(
            "est_jaccard_milli",
            F.round(F.lit(1000.0) * F.col("bands_hit") / bands).cast("long"),
        )
        .orderBy("bands_hit")
    )


def lsh_band_calibration_sql(
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> str:
    rows_per_band = k // bands
    band_exprs = ", ".join(
        "CAST({b} AS VARCHAR) || '_' || ".format(b=b)
        + " || '_' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        for b in range(bands)
    )
    cap = (
        f"AND bucket NOT IN (SELECT bucket FROM buckets "
        f"GROUP BY bucket HAVING COUNT(*) > {max_bucket})"
        if max_bucket is not None
        else ""
    )
    return f"""
        WITH sig AS ({minhash_signatures_sql(k, n)}),
        buckets AS (
            SELECT doc_id, unnest([{band_exprs}]) AS bucket FROM sig
        ),
        capped AS (
            SELECT * FROM buckets WHERE TRUE {cap}
        ),
        hits AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS bands_hit
            FROM capped a JOIN capped b USING (bucket)
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        sh AS ({shingles_sql(n)}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT h.doc_a, h.doc_b, COUNT(*) AS inter
            FROM hits h
            JOIN sh sa ON sa.doc_id = h.doc_a
            JOIN sh sb ON sb.doc_id = h.doc_b AND sb.shingle = sa.shingle
            GROUP BY h.doc_a, h.doc_b
        ),
        per_pair AS (
            SELECT h.bands_hit,
                   CAST(round(1000.0 * COALESCE(i.inter, 0)
                        / (za.sz + zb.sz - COALESCE(i.inter, 0))) AS BIGINT)
                       AS jac_milli
            FROM hits h
            LEFT JOIN inter i ON i.doc_a = h.doc_a AND i.doc_b = h.doc_b
            JOIN sizes za ON za.doc_id = h.doc_a
            JOIN sizes zb ON zb.doc_id = h.doc_b
        )
        SELECT bands_hit,
               COUNT(*) AS n_pairs,
               CAST(round(CAST(SUM(jac_milli) AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS mean_jaccard_milli,
               MIN(jac_milli) AS min_jaccard_milli,
               MAX(jac_milli) AS max_jaccard_milli,
               CAST(round(1000.0 * bands_hit / {bands}) AS BIGINT)
                   AS est_jaccard_milli
        FROM per_pair
        GROUP BY bands_hit
        ORDER BY bands_hit
    """


# --- asymmetric containment (doc-in-doc) ------------------------------------------

CONTAINMENT_THRESHOLD_MILLI = 800  # |A∩B| / min(|A|,|B|) >= 0.8


def ngram_containment_pairs(
    docs: DataFrame,
    n: int = DEFAULT_N,
    threshold_milli: int = CONTAINMENT_THRESHOLD_MILLI,
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """Near-CONTAINMENT pairs: |A∩B| / min(|A|,|B|) ≥ threshold — the
    asymmetric complement to Jaccard dedup. A quote, excerpt, or doc-inside-
    doc scores near 1.0 here while its Jaccard stays low (the small side is
    swallowed by the big side's union), so symmetric dedup never finds it;
    containment is how quotation farms and wrapper pages get caught.

    Identical plan economics to ngram_jaccard_pairs (ONE posting-list
    aggregate, narrow pair expansion, df=1 early drop, max_df cap, hinted
    shuffle-hash size joins) — only the final normalization differs, and the
    score quantizes to exact milli integers (one division of exact ints)."""
    sh = shingles(docs, n)
    posts = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ds")
    )
    if max_df is not None:
        posts = posts.where(F.size("ds") <= max_df)
    sizes = (
        posts.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("sz"))
    )
    pair_structs = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        posts.where(F.size("ds") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    cont_milli = F.round(
        F.lit(1000.0) * F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b"))
    ).cast("long")
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").hint("shuffle_hash"), "doc_a"
        )
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").hint("shuffle_hash"), "doc_b"
        )
        .withColumnRenamed("sz", "sz_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "sz_a",
            "sz_b",
            cont_milli.alias("containment_milli"),
        )
        .where(F.col("containment_milli") >= threshold_milli)
        .orderBy("doc_a", "doc_b")
    )


def ngram_containment_pairs_sql(
    n: int = DEFAULT_N,
    threshold_milli: int = CONTAINMENT_THRESHOLD_MILLI,
    max_df: int | None = DEFAULT_MAX_DF,
) -> str:
    cap = f"WHERE {df_cap_filter_sql('sh0', max_df)}" if max_df is not None else ""
    return f"""
        WITH sh0 AS ({shingles_sql(n)}),
        sh AS (SELECT * FROM sh0 {cap}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
               CAST(round(1000.0 * inter / LEAST(sa.sz, sb.sz)) AS BIGINT)
                   AS containment_milli
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(round(1000.0 * inter / LEAST(sa.sz, sb.sz)) AS BIGINT)
              >= {threshold_milli}
        ORDER BY doc_a, doc_b
    """


# --- dedup pipeline attrition funnel ----------------------------------------------

FUNNEL_JACCARD = 0.2


def dedup_pipeline_funnel(
    docs: DataFrame,
    n: int = DEFAULT_N,
    threshold: float = FUNNEL_JACCARD,
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """The dedup "onion" as an attrition report: raw corpus → exact dedup
    (keep the min doc_id per normalized-text fingerprint) → near-dup dedup
    (drop any survivor with a smaller-id Jaccard-≥τ neighbor — the greedy
    pair-dominance rule, one LSH-verify pass instead of transitive
    clustering) → Gopher quality gate. One row per stage with docs
    remaining and removed — the report every curation pipeline publishes so
    attrition is attributable to a stage, not discovered at training time.

    Each stage reuses the module's own primitives on the previous stage's
    survivor relation, so the funnel's cost profile is exactly the sum of
    its stages (no new join shapes); the pair stage inherits the max_df
    posting-list cap."""
    from .text import _norm, gopher_rules

    total = docs.count()
    keep1 = (
        docs.select("doc_id", F.md5(_norm(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s1 = docs.join(keep1, "doc_id").localCheckpoint(eager=False)
    n1 = s1.count()
    losers = (
        ngram_jaccard_pairs(s1, n=n, threshold=threshold, max_df=max_df)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s2 = s1.join(losers, "doc_id", "left_anti").localCheckpoint(eager=False)
    n2 = s2.count()
    n3 = (
        gopher_rules(s2.select("doc_id", "text"))
        .where(F.col("gopher_keep"))
        .count()
    )
    spark = docs.sparkSession
    rows = [
        (1, "raw", total, 0),
        (2, "exact_dedup", n1, total - n1),
        (3, "neardup_dedup", n2, n1 - n2),
        (4, "quality_gate", n3, n2 - n3),
    ]
    return spark.createDataFrame(
        rows, "stage int, stage_name string, docs_remaining long, removed long"
    ).orderBy("stage")


def dedup_pipeline_funnel_sql(
    n: int = DEFAULT_N,
    threshold: float = FUNNEL_JACCARD,
    max_df: int | None = DEFAULT_MAX_DF,
) -> str:
    from .shingles import shingles_sql
    from .text import _gopher_rules_sql, _norm_sql

    cap = f"WHERE {df_cap_filter_sql('sh0', max_df)}" if max_df is not None else ""
    gopher = _gopher_rules_sql().replace("FROM documents", "FROM s2d")
    return f"""
    WITH keep1 AS (
        SELECT MIN(doc_id) AS doc_id
        FROM (SELECT doc_id, md5({_norm_sql('text')}) AS fp FROM documents)
        GROUP BY fp
    ),
    s1 AS (
        SELECT d.* FROM documents d JOIN keep1 USING (doc_id)
    ),
    sh0 AS ({shingles_sql(n, 's1')}),
    sh AS (SELECT * FROM sh0 {cap}),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    losers AS (
        SELECT DISTINCT doc_b AS doc_id
        FROM inter
        JOIN sizes sa ON sa.doc_id = inter.doc_a
        JOIN sizes sb ON sb.doc_id = inter.doc_b
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= {threshold}
    ),
    s2 AS (
        SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    ),
    s2d AS (SELECT doc_id, text FROM s2),
    g AS ({gopher}),
    counts AS (
        SELECT (SELECT COUNT(*) FROM documents) AS n0,
               (SELECT COUNT(*) FROM s1) AS n1,
               (SELECT COUNT(*) FROM s2) AS n2,
               (SELECT COUNT(*) FROM g WHERE gopher_keep) AS n3
    )
    SELECT 1 AS stage, 'raw' AS stage_name,
           CAST(n0 AS BIGINT) AS docs_remaining, CAST(0 AS BIGINT) AS removed
    FROM counts
    UNION ALL SELECT 2, 'exact_dedup', CAST(n1 AS BIGINT),
                     CAST(n0 - n1 AS BIGINT) FROM counts
    UNION ALL SELECT 3, 'neardup_dedup', CAST(n2 AS BIGINT),
                     CAST(n1 - n2 AS BIGINT) FROM counts
    UNION ALL SELECT 4, 'quality_gate', CAST(n3 AS BIGINT),
                     CAST(n2 - n3 AS BIGINT) FROM counts
    ORDER BY stage
    """

# --- duplicate-cluster size distribution ------------------------------------------


def cluster_size_hist(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Cluster-size histogram over resolved near-dup clusters:
    (cluster_size, n_clusters, n_docs) — the "how duplicated is this
    corpus" distribution every dedup report leads with (size-1 singletons,
    the long tail of big dup families), and the input to dedup-savings
    estimates (docs removed = n_docs − n_clusters summed over sizes ≥ 2).

    Scale shape: two aggregates ON TOP of the cluster labels — one keyed by
    cluster_id (≤ |docs| rows), one by size (≤ |distinct sizes| rows). The
    cost is the cluster resolution itself, shared with ``dedup_clusters``."""
    sizes = dedup_clusters(docs, pairs).groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


def cluster_size_hist_sql(pairs_sql: str, docs_rel: str = "documents") -> str:
    return f"""
        WITH clusters AS ({dedup_clusters_sql(pairs_sql, docs_rel)}),
        sizes AS (
            SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM clusters GROUP BY cluster_id
        )
        SELECT cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
        FROM sizes
        GROUP BY cluster_size
        ORDER BY cluster_size
    """

# --- b-bit MinHash calibration -------------------------------------------------------

BBIT_B = 4


def bbit_minhash_estimates(docs: DataFrame, b: int = BBIT_B) -> DataFrame:
    """b-bit MinHash (Li & Konig) similarity estimates vs exact Jaccard on
    the LSH-verified pair set: (doc_a, doc_b, bbit_est_milli, jaccard_milli,
    err_milli).

    The storage-optimal dedup signature: keeping only the low ``b`` bits of
    each of k min-hashes shrinks sketches 64/b-fold; a pair's bit-match
    rate m/k estimates J through E[m/k] = J + (1-J)/2^b, inverted here in
    exact integer milli (half-up, clamped at 0). Run against the exact
    Jaccard of the same pairs, the output IS the calibration table that
    says whether b bits suffice at a given dedup threshold.

    Scale shape: two broadcast-size joins of the pair set against the
    signature relation; the signature agg is shared with MinHash-LSH."""
    k = MINHASH_K
    sig = minhash_signatures(docs)
    pairs = minhash_lsh_pairs(docs).select("doc_a", "doc_b", "jaccard")
    sig_a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[(F.col(f"mh{i}") % (1 << b)).alias(f"a{i}") for i in range(k)],
    )
    sig_b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[(F.col(f"mh{i}") % (1 << b)).alias(f"b{i}") for i in range(k)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(k)
    )
    two_b = 1 << b
    return (
        pairs.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            matches.alias("m"),
            F.expr("CAST(round(jaccard * 1000) AS BIGINT)").alias(
                "jaccard_milli"
            ),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                f"CAST(GREATEST((2 * 1000 * ({two_b} * m - {k})"
                f" + ({two_b - 1}) * {k})"
                f" DIV (2 * ({two_b - 1}) * {k}), 0) AS BIGINT)"
            ).alias("bbit_est_milli"),
            "jaccard_milli",
        )
        .select(
            "doc_a",
            "doc_b",
            "bbit_est_milli",
            "jaccard_milli",
            (F.col("bbit_est_milli") - F.col("jaccard_milli"))
            .cast("long")
            .alias("err_milli"),
        )
        .orderBy("doc_a", "doc_b")
    )


def bbit_minhash_estimates_sql(b: int = BBIT_B) -> str:
    k = MINHASH_K
    two_b = 1 << b
    a_cols = ", ".join(f"mh{i} % {two_b} AS a{i}" for i in range(k))
    b_cols = ", ".join(f"mh{i} % {two_b} AS b{i}" for i in range(k))
    m = " + ".join(
        f"CASE WHEN a{i} = b{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    return f"""
        WITH sig AS ({minhash_signatures_sql()}),
        pairs AS ({minhash_lsh_pairs_sql()}),
        scored AS (
            SELECT p.doc_a, p.doc_b, {m} AS m,
                   CAST(round(p.jaccard * 1000) AS BIGINT) AS jaccard_milli
            FROM pairs p
            JOIN (SELECT doc_id, {a_cols} FROM sig) sa ON sa.doc_id = p.doc_a
            JOIN (SELECT doc_id, {b_cols} FROM sig) sb ON sb.doc_id = p.doc_b
        )
        SELECT doc_a, doc_b,
               CAST(GREATEST((2 * 1000 * ({two_b} * m - {k})
                    + ({two_b - 1}) * {k})
                    // (2 * ({two_b - 1}) * {k}), 0) AS BIGINT)
                   AS bbit_est_milli,
               jaccard_milli,
               CAST(CAST(GREATEST((2 * 1000 * ({two_b} * m - {k})
                    + ({two_b - 1}) * {k})
                    // (2 * ({two_b - 1}) * {k}), 0) AS BIGINT)
                    - jaccard_milli AS BIGINT) AS err_milli
        FROM scored
        ORDER BY doc_a, doc_b
    """


# --- B-cubed cluster-quality evaluation ----------------------------------------------

BCUBED_GOLD_PREFIX = 80


def bcubed_eval(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """B-cubed precision/recall/F1 of the resolved near-dup clustering
    against the prefix-replica gold standard (documents sharing their
    first {BCUBED_GOLD_PREFIX} characters are replicas of one origin —
    the generator's dup mechanism): one panel row (n_docs,
    n_pred_clusters, n_gold_clusters, b3_precision_milli, b3_recall_milli,
    b3_f1_milli).

    B³ (Bagga & Baldwin 1998) is the clustering metric that punishes both
    over-merge (precision: how much of my predicted cluster shares my gold
    cluster) and over-split (recall: how much of my gold cluster my
    predicted cluster found) PER ELEMENT — pairwise metrics let giant
    clusters dominate. Per-element scores are rationals n_cg/n_c; the
    pinned integer rule is per-CELL milli flooring (Σ 1000·n_cg² DIV n_c,
    then DIV N) — identical on both engines, and the systematic floor bias
    is < 1 milli per cell.

    Scale shape: clustering is the existing min-label propagation; the
    eval itself is three bounded aggregates on (cluster, gold) cells —
    cells ≤ docs, and the panel is one row."""
    clusters = dedup_clusters(docs, pairs).select("doc_id", "cluster_id")
    gold = docs.select(
        "doc_id",
        F.md5(F.substring("text", 1, BCUBED_GOLD_PREFIX)).alias("gold_id"),
    )
    cells = (
        clusters.join(gold, "doc_id")
        .groupBy("cluster_id", "gold_id")
        .agg(F.count("*").alias("n_cg"))
    )
    c_sizes = cells.groupBy("cluster_id").agg(F.sum("n_cg").alias("n_c"))
    g_sizes = cells.groupBy("gold_id").agg(F.sum("n_cg").alias("n_g"))
    scored = (
        cells.join(c_sizes, "cluster_id")
        .join(g_sizes, "gold_id")
        .agg(
            F.sum("n_cg").cast("long").alias("n_docs"),
            F.countDistinct("cluster_id").cast("long").alias("n_pred_clusters"),
            F.countDistinct("gold_id").cast("long").alias("n_gold_clusters"),
            F.sum(F.expr("1000 * n_cg * n_cg DIV n_c")).alias("p_num"),
            F.sum(F.expr("1000 * n_cg * n_cg DIV n_g")).alias("r_num"),
        )
    )
    return scored.select(
        "n_docs",
        "n_pred_clusters",
        "n_gold_clusters",
        F.expr("CAST(p_num DIV n_docs AS BIGINT)").alias("b3_precision_milli"),
        F.expr("CAST(r_num DIV n_docs AS BIGINT)").alias("b3_recall_milli"),
        F.expr(
            "CAST(CASE WHEN p_num + r_num = 0 THEN 0"
            " ELSE 2 * (p_num DIV n_docs) * (r_num DIV n_docs)"
            " DIV ((p_num DIV n_docs) + (r_num DIV n_docs)) END AS BIGINT)"
        ).alias("b3_f1_milli"),
    )


def bcubed_eval_sql(pairs_sql: str, docs_rel: str = "documents") -> str:
    clusters = dedup_clusters_sql(pairs_sql, docs_rel)
    return f"""
        WITH clusters AS ({clusters}),
        gold AS (
            SELECT doc_id,
                   md5(substr(text, 1, {BCUBED_GOLD_PREFIX})) AS gold_id
            FROM {docs_rel}
        ),
        cells AS (
            SELECT c.cluster_id, g.gold_id, COUNT(*) AS n_cg
            FROM clusters c JOIN gold g USING (doc_id)
            GROUP BY c.cluster_id, g.gold_id
        ),
        c_sizes AS (
            SELECT cluster_id, SUM(n_cg) AS n_c FROM cells GROUP BY cluster_id
        ),
        g_sizes AS (
            SELECT gold_id, SUM(n_cg) AS n_g FROM cells GROUP BY gold_id
        ),
        scored AS (
            SELECT CAST(SUM(n_cg) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT cells.cluster_id) AS BIGINT)
                       AS n_pred_clusters,
                   CAST(COUNT(DISTINCT cells.gold_id) AS BIGINT)
                       AS n_gold_clusters,
                   CAST(SUM(1000 * n_cg * n_cg // n_c) AS BIGINT) AS p_num,
                   CAST(SUM(1000 * n_cg * n_cg // n_g) AS BIGINT) AS r_num
            FROM cells
            JOIN c_sizes USING (cluster_id)
            JOIN g_sizes USING (gold_id)
        )
        SELECT n_docs, n_pred_clusters, n_gold_clusters,
               CAST(p_num // n_docs AS BIGINT) AS b3_precision_milli,
               CAST(r_num // n_docs AS BIGINT) AS b3_recall_milli,
               CAST(CASE WHEN p_num + r_num = 0 THEN 0
                    ELSE 2 * (p_num // n_docs) * (r_num // n_docs)
                         // ((p_num // n_docs) + (r_num // n_docs)) END
                   AS BIGINT) AS b3_f1_milli
        FROM scored
    """


# --- soft deduplication weights ------------------------------------------------------


def soft_dedup_weights(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates, every
    document gets the sampling weight 1/|cluster| in exact micro units —
    repeated content contributes one document's worth of gradient in
    expectation while unique phrasing inside the cluster still surfaces
    (the down-weighting alternative the data-mixing literature prefers
    when clusters are plentiful but not byte-identical). Output:
    (doc_id, cluster_id, cluster_size, weight_micro, is_canonical).

    One aggregate over the resolved clusters attaches sizes; the weight is
    the pinned integer rule 10^6 DIV size. Canonical flag marks the
    min-doc_id representative (what hard dedup would have kept), so a
    pipeline can switch hard/soft by predicate.

    Scale shape: clustering is the existing min-label propagation; this
    adds one cluster-keyed size aggregate and a broadcast-size join."""
    clusters = dedup_clusters(docs, pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        clusters.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.expr("CAST(1000000 DIV cluster_size AS BIGINT)").alias(
                "weight_micro"
            ),
            (F.col("doc_id") == F.col("cluster_id")).cast("int").alias(
                "is_canonical"
            ),
        )
        .orderBy("doc_id")
    )


def soft_dedup_weights_sql(pairs_sql: str, docs_rel: str = "documents") -> str:
    return f"""
        WITH clusters AS ({dedup_clusters_sql(pairs_sql, docs_rel)}),
        sizes AS (
            SELECT cluster_id, COUNT(*) AS cluster_size
            FROM clusters GROUP BY cluster_id
        )
        SELECT c.doc_id, c.cluster_id,
               CAST(s.cluster_size AS BIGINT) AS cluster_size,
               CAST(1000000 // s.cluster_size AS BIGINT) AS weight_micro,
               CAST(c.doc_id = c.cluster_id AS INT) AS is_canonical
        FROM clusters c JOIN sizes s USING (cluster_id)
        ORDER BY c.doc_id
    """


# --- transitivity audit ---------------------------------------------------------

TRANSITIVITY_MAX_DEG = 64  # hub cap: census runs on the induced subgraph


def transitivity_audit(
    docs: DataFrame,
    max_hamming: int = 3,
    max_deg: int = TRANSITIVITY_MAX_DEG,
) -> DataFrame:
    """Data-quality audit of the near-dup pair graph: how transitive is
    "near-duplicate"? Exact dedup is an equivalence relation; similarity
    is not — if A~B and B~C but A!~C, connected-component clustering
    (dedup_clusters) will still merge A and C, silently over-deleting.
    The wedge-closure rate quantifies that risk before committing to
    CC-based dedup: one row (n_pairs, n_capped_nodes, n_wedges,
    n_closed, closure_milli), closure = closed wedges / wedges (the
    global clustering coefficient of the SimHash near-pair graph,
    exact integer milli).

    Hub cap (the square-census discipline): wedge volume is Σ C(deg, 2),
    quadratic in the hottest node, so nodes with degree > ``max_deg``
    are EXCLUDED and counted in ``n_capped_nodes`` — the census runs on
    the induced subgraph, where the measurement is still the question
    being asked (hubs are exactly the mega-cluster cores whose merge
    risk is already known).

    Scale shape: everything downstream of pair generation is keyed by
    node or oriented edge of the REDUCED, degree-capped pair relation —
    never the corpus.
    """
    pairs = simhash_near_pairs(docs, max_hamming=max_hamming).select(
        "doc_a", "doc_b"
    )
    # referenced by degree pass + three census sides: cut the plan once
    pairs = pairs.localCheckpoint(eager=True)
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionAll(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    hot = deg.where(F.col("deg") > max_deg).select("node")
    kept = (
        pairs.join(hot.withColumnRenamed("node", "doc_a"), "doc_a", "anti")
        .join(hot.withColumnRenamed("node", "doc_b"), "doc_b", "anti")
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    kdeg = (
        kept.select(F.col("doc_a").alias("node"))
        .unionAll(kept.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    n_wedges = kdeg.agg(
        F.expr(
            "CAST(SUM(CAST(deg * (deg - 1) AS BIGINT) DIV 2) AS BIGINT)"
        ).alias("n_wedges")
    )
    e1 = kept.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = kept.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    closing = kept.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tris = e1.join(e2, "b").join(closing, ["a", "c"])
    return (
        pairs.agg(F.count("*").cast("long").alias("n_pairs"))
        .crossJoin(hot.agg(F.count("*").cast("long").alias("n_capped_nodes")))
        .crossJoin(n_wedges)
        .crossJoin(tris.agg((F.count("*") * 3).cast("long").alias("n_closed")))
        .select(
            "n_pairs",
            "n_capped_nodes",
            F.coalesce("n_wedges", F.lit(0)).cast("long").alias("n_wedges"),
            "n_closed",
            F.expr(
                "CASE WHEN COALESCE(n_wedges, 0) > 0"
                " THEN CAST(1000 * n_closed DIV n_wedges AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("closure_milli"),
        )
    )


def transitivity_audit_sql(
    max_hamming: int = 3, max_deg: int = TRANSITIVITY_MAX_DEG
) -> str:
    return f"""
        WITH pairs AS (
            SELECT doc_a, doc_b
            FROM ({simhash_near_pairs_sql(max_hamming=max_hamming)})
        ),
        deg AS (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT doc_a AS node FROM pairs
                UNION ALL SELECT doc_b AS node FROM pairs
            ) GROUP BY node
        ),
        hot AS (SELECT node FROM deg WHERE deg > {max_deg}),
        kept AS (
            SELECT doc_a, doc_b FROM pairs
            WHERE doc_a NOT IN (SELECT node FROM hot)
              AND doc_b NOT IN (SELECT node FROM hot)
        ),
        kdeg AS (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT doc_a AS node FROM kept
                UNION ALL SELECT doc_b AS node FROM kept
            ) GROUP BY node
        ),
        wedge_total AS (
            SELECT CAST(SUM(CAST(deg * (deg - 1) AS BIGINT) // 2) AS BIGINT)
                       AS n_wedges
            FROM kdeg
        ),
        tris AS (
            SELECT 1 AS one
            FROM kept e1
            JOIN kept e2 ON e1.doc_b = e2.doc_a
            JOIN kept e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
        )
        SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_pairs,
               CAST((SELECT COUNT(*) FROM hot) AS BIGINT) AS n_capped_nodes,
               COALESCE((SELECT n_wedges FROM wedge_total), 0) AS n_wedges,
               CAST(3 * (SELECT COUNT(*) FROM tris) AS BIGINT) AS n_closed,
               CASE WHEN COALESCE((SELECT n_wedges FROM wedge_total), 0) > 0
                    THEN CAST(1000 * 3 * (SELECT COUNT(*) FROM tris)
                              // (SELECT n_wedges FROM wedge_total) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS closure_milli
    """


# --- dedup mixture-shift audit ---------------------------------------------------


def mixture_shift(docs: DataFrame) -> DataFrame:
    """Dedup bias audit: how exact dedup SHIFTS the source mixture —
    duplicates are never uniform across sources (mirrors, boilerplate
    farms), so "dedup then train" silently retunes the mixture the data
    team thought it had set. Per source: docs before/after the
    first-occurrence keep rule, corpus share before/after (milli), and
    the signed share shift.

    Keep rule is the exact-dedup convention (min doc_id per normalized-
    text fingerprint). Shift uses the abs/sign form (truncating signed
    division is engine-stable). Corpus totals are two 1-row broadcast
    scalars folded into one pass: shares divide by SUM() OVER () window
    totals over the ≤|sources| panel — no data-sized join.

    Scale shape: one fingerprint groupBy (map-side combinable), one
    source rollup; windows run over the bounded source panel."""
    fp = F.md5(_norm(F.col("text"))).alias("fingerprint")
    keep = (
        docs.select("doc_id", "source", fp)
        .withColumn(
            "keep",
            (
                F.col("doc_id")
                == F.min("doc_id").over(
                    Window.partitionBy("fingerprint")
                )
            ).cast("int"),
        )
    )
    panel = keep.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("keep").cast("long").alias("n_kept"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        panel.select(
            "source",
            "n_docs",
            "n_kept",
            F.expr(
                "CAST(1000 * n_docs DIV (SUM(n_docs) OVER ()) AS BIGINT)"
            ).alias("share_before_milli"),
            F.expr(
                "CAST(1000 * n_kept DIV (SUM(n_kept) OVER ()) AS BIGINT)"
            ).alias("share_after_milli"),
        )
        .withColumn(
            "shift_milli",
            F.expr(
                "CAST(share_after_milli - share_before_milli AS BIGINT)"
            ),
        )
        .orderBy("source")
    )


MIXTURE_SHIFT_SQL = f"""
    WITH keep AS (
        SELECT doc_id, source,
               CAST(doc_id = MIN(doc_id) OVER (
                   PARTITION BY md5({_norm_sql('text')})) AS INT) AS keep
        FROM documents
    ),
    panel AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(keep) AS BIGINT) AS n_kept
        FROM keep GROUP BY source
    )
    SELECT source, n_docs, n_kept,
           CAST(1000 * n_docs // (SUM(n_docs) OVER ()) AS BIGINT)
               AS share_before_milli,
           CAST(1000 * n_kept // (SUM(n_kept) OVER ()) AS BIGINT)
               AS share_after_milli,
           CAST(1000 * n_kept // (SUM(n_kept) OVER ())
                - 1000 * n_docs // (SUM(n_docs) OVER ()) AS BIGINT)
               AS shift_milli
    FROM panel
    ORDER BY source
"""


# --- dup-rate-by-length profile ---------------------------------------------------


def length_profile(docs: DataFrame) -> DataFrame:
    """Duplicate propensity vs document length: exact-dup rate per
    length decile — the curation diagnostic that separates "our corpus
    is 20% duplicated" into WHERE (boilerplate snippets duplicate at the
    short end; mirrored articles at the long end), which decides whether
    line-level or document-level dedup pays.

    Deciles come from the LENGTH-VALUE histogram, not a global row
    window: decile(v) = 10·|docs shorter than v| / N, so the only
    cumulative window runs over the ≤|distinct lengths| histogram rows
    (the PSI exact-rank-edge discipline) and equal lengths always share
    a decile. Dup flag is the first-occurrence fingerprint rule. Output
    per occupied decile: (length_decile, n_docs, n_dupes, dup_milli,
    min_chars, max_chars).

    Scale shape: one fingerprint keep window, one (n_chars) histogram
    aggregate with a bounded cumulative window, broadcast value→decile
    map joined back."""
    fp = F.md5(_norm(F.col("text"))).alias("fingerprint")
    keep = docs.select("doc_id", "n_chars", fp).withColumn(
        "dup",
        (
            F.col("doc_id")
            != F.min("doc_id").over(Window.partitionBy("fingerprint"))
        ).cast("int"),
    )
    hist = keep.groupBy("n_chars").agg(F.count("*").alias("c"))
    edges = hist.select(
        "n_chars",
        F.expr(
            "CAST(10 * COALESCE(SUM(c) OVER (ORDER BY n_chars"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
            " DIV SUM(c) OVER () AS BIGINT)"
        ).alias("length_decile"),
    )
    return (
        keep.join(F.broadcast(edges), "n_chars")
        .groupBy("length_decile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dup").cast("long").alias("n_dupes"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .withColumn(
            "dup_milli",
            F.expr("CAST(1000 * n_dupes DIV n_docs AS BIGINT)"),
        )
        .select(
            "length_decile", "n_docs", "n_dupes", "dup_milli",
            "min_chars", "max_chars",
        )
        .orderBy("length_decile")
    )


LENGTH_PROFILE_SQL = f"""
    WITH keep AS (
        SELECT doc_id, n_chars,
               CAST(doc_id <> MIN(doc_id) OVER (
                   PARTITION BY md5({_norm_sql('text')})) AS INT) AS dup
        FROM documents
    ),
    hist AS (
        SELECT n_chars, COUNT(*) AS c FROM keep GROUP BY n_chars
    ),
    edges AS (
        SELECT n_chars,
               CAST(10 * COALESCE(SUM(c) OVER (ORDER BY n_chars
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    // SUM(c) OVER () AS BIGINT) AS length_decile
        FROM hist
    )
    SELECT e.length_decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(k.dup) AS BIGINT) AS n_dupes,
           CAST(1000 * SUM(k.dup) // COUNT(*) AS BIGINT) AS dup_milli,
           CAST(MIN(k.n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(k.n_chars) AS BIGINT) AS max_chars
    FROM keep k JOIN edges e USING (n_chars)
    GROUP BY e.length_decile
    ORDER BY e.length_decile
"""


# --- Jaccard-threshold sweep -------------------------------------------------------

THRESHOLD_SWEEP_MILLI = (200, 500, 700, 900)


def threshold_sweep(
    docs: DataFrame,
    n: int = DEFAULT_N,
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """Dedup-threshold tuning curve: near-pair volume and affected-doc
    count at each candidate Jaccard cutoff {THRESHOLD_SWEEP_MILLI} milli
    — the sweep that picks the ngram_jaccard/LSH threshold from data
    (too low merges topical neighbors, too high misses mirrors; this
    shows the knee) instead of folklore.

    One posting-list pass builds the pair relation ONCE (the
    ngram_jaccard plan, df=1 early drop, max_df cap); the comparison is
    pure integers — j ≥ t ⇔ 1000·inter ≥ t·(|A|+|B|−inter) — so the
    sweep never materializes a float Jaccard. Output per threshold:
    (threshold_milli, n_pairs, n_docs_affected).

    Scale shape: identical to ngram_jaccard_pairs plus a constant-grid
    explode over the REDUCED pair relation."""
    sh = shingles(docs, n)
    posts = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ds")
    )
    if max_df is not None:
        posts = posts.where(F.size("ds") <= max_df)
    sizes = (
        posts.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("sz"))
    )
    pair_structs = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        posts.where(F.size("ds") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    scored = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").hint("shuffle_hash"),
            "doc_a",
        )
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").hint("shuffle_hash"),
            "doc_b",
        )
        .withColumnRenamed("sz", "sz_b")
    )
    grid = F.array(*[F.lit(t) for t in THRESHOLD_SWEEP_MILLI])
    graded = scored.select(
        "doc_a",
        "doc_b",
        "inter",
        (F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias("un"),
        F.explode(grid).alias("t"),
    ).where(F.expr("1000 * inter >= t * un"))
    pairs_panel = graded.groupBy(
        F.col("t").cast("long").alias("threshold_milli")
    ).agg(F.count("*").cast("long").alias("n_pairs"))
    docs_panel = (
        graded.select("t", F.explode(F.array("doc_a", "doc_b")).alias("d"))
        .groupBy(F.col("t").cast("long").alias("threshold_milli"))
        .agg(F.count_distinct("d").cast("long").alias("n_docs_affected"))
    )
    return pairs_panel.join(docs_panel, "threshold_milli").orderBy(
        "threshold_milli"
    )


def threshold_sweep_sql(
    n: int = DEFAULT_N, max_df: int | None = DEFAULT_MAX_DF
) -> str:
    cap = f"WHERE {df_cap_filter_sql('sh0', max_df)}" if max_df is not None else ""
    grid = ", ".join(str(t) for t in THRESHOLD_SWEEP_MILLI)
    return f"""
        WITH sh0 AS ({shingles_sql(n)}),
        sh AS (SELECT * FROM sh0 {cap}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        grid AS (SELECT unnest([{grid}]) AS t),
        graded AS (
            SELECT i.doc_a, i.doc_b, i.inter,
                   sa.sz + sb.sz - i.inter AS un,
                   g.t
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.doc_a
            JOIN sizes sb ON sb.doc_id = i.doc_b
            CROSS JOIN grid g
        ),
        hits AS (SELECT * FROM graded WHERE 1000 * inter >= t * un),
        pairs_panel AS (
            SELECT CAST(t AS BIGINT) AS threshold_milli,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM hits GROUP BY t
        ),
        docs_panel AS (
            SELECT CAST(t AS BIGINT) AS threshold_milli,
                   CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs_affected
            FROM (
                SELECT t, unnest([doc_a, doc_b]) AS d FROM hits
            ) GROUP BY t
        )
        SELECT threshold_milli, n_pairs, n_docs_affected
        FROM pairs_panel JOIN docs_panel USING (threshold_milli)
        ORDER BY threshold_milli
    """


# --- normalization-impact audit -----------------------------------------------------


def normalization_impact(docs: DataFrame) -> DataFrame:
    """How much duplicate mass does TEXT NORMALIZATION unlock? Exact-dup
    doc counts under the raw-bytes hash vs the normalized hash, per
    source — the evidence for (or against) the normalizer every
    fingerprint in this engine shares: a big uplift means near-misses
    (case, whitespace) dominate and normalization pays; zero uplift
    means dups are byte-exact and the normalizer only costs CPU.

    Output per source: (source, n_docs, raw_dup_docs, norm_dup_docs,
    uplift_docs). Exact counts; a doc is a "dup doc" when it is not the
    first occurrence of its hash.

    Scale shape: two fingerprint windows (one per hash), one source
    rollup — both single-key shuffles on 16-byte hashes."""
    raw_w = Window.partitionBy(F.md5(F.col("text")))
    norm_w = Window.partitionBy(F.md5(_norm(F.col("text"))))
    graded = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") != F.min("doc_id").over(raw_w)).cast("long").alias(
            "raw_dup"
        ),
        (F.col("doc_id") != F.min("doc_id").over(norm_w)).cast("long").alias(
            "norm_dup"
        ),
    )
    return (
        graded.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("raw_dup").cast("long").alias("raw_dup_docs"),
            F.sum("norm_dup").cast("long").alias("norm_dup_docs"),
        )
        .withColumn(
            "uplift_docs",
            (F.col("norm_dup_docs") - F.col("raw_dup_docs")).cast("long"),
        )
        .orderBy("source")
    )


NORMALIZATION_IMPACT_SQL = f"""
    WITH graded AS (
        SELECT source,
               CAST(doc_id <> MIN(doc_id) OVER (
                   PARTITION BY md5(text)) AS BIGINT) AS raw_dup,
               CAST(doc_id <> MIN(doc_id) OVER (
                   PARTITION BY md5({_norm_sql('text')})) AS BIGINT)
                   AS norm_dup
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(raw_dup) AS BIGINT) AS raw_dup_docs,
           CAST(SUM(norm_dup) AS BIGINT) AS norm_dup_docs,
           CAST(SUM(norm_dup) - SUM(raw_dup) AS BIGINT) AS uplift_docs
    FROM graded
    GROUP BY source
    ORDER BY source
"""


# --- SimHash bit-balance audit ------------------------------------------------------


def simhash_balance(docs: DataFrame) -> DataFrame:
    """Hash-quality audit of the SimHash signatures this engine's
    near-dup banding rides on: per bit position, the share of corpus
    signatures with that bit set. A healthy signature sits near 500
    milli everywhere; a skewed bit carries almost no information, so k
    skewed bits silently shrink an n-bit signature to (n−k) effective
    bits and inflate band collisions — the first thing to check when
    LSH candidate volume looks wrong.

    Output per bit 0..{SIMHASH_BITS}−1: (bit, ones, n_docs, ones_milli,
    degenerate) with degenerate = outside the [200, 800] milli band.

    Scale shape: one signature pass + a constant {SIMHASH_BITS}-element
    explode, bounded bit rollup."""
    sig = simhash_signatures(docs)
    bits = F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))
    graded = sig.select(
        F.explode(bits).alias("bit"),
        F.col("simhash"),
    ).select(
        "bit",
        F.expr(
            "CAST(shiftright(simhash, CAST(bit AS INT)) & 1 AS BIGINT)"
        ).alias("b"),
    )
    return (
        graded.groupBy(F.col("bit").cast("long").alias("bit"))
        .agg(
            F.sum("b").cast("long").alias("ones"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .withColumn(
            "ones_milli",
            F.expr("CAST(1000 * ones DIV n_docs AS BIGINT)"),
        )
        .withColumn(
            "degenerate",
            ((F.col("ones_milli") < 200) | (F.col("ones_milli") > 800))
            .cast("int"),
        )
        .orderBy("bit")
    )


def simhash_balance_sql() -> str:
    return f"""
        WITH sig AS ({simhash_signatures_sql()}),
        grid AS (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit),
        graded AS (
            SELECT g.bit,
                   CAST((s.simhash >> CAST(g.bit AS INT)) & 1 AS BIGINT) AS b
            FROM sig s CROSS JOIN grid g
        ),
        panel AS (
            SELECT CAST(bit AS BIGINT) AS bit,
                   CAST(SUM(b) AS BIGINT) AS ones,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM graded GROUP BY bit
        )
        SELECT bit, ones, n_docs,
               CAST(1000 * ones // n_docs AS BIGINT) AS ones_milli,
               CAST(1000 * ones // n_docs < 200
                    OR 1000 * ones // n_docs > 800 AS INT) AS degenerate
        FROM panel
        ORDER BY bit
    """


# --- dedup key-policy audit ---------------------------------------------------------


def key_policy(docs: DataFrame) -> DataFrame:
    """Dedup KEY-POLICY audit: duplicate counts under the three common
    fingerprint scopes — global (text only), per-language (text+lang),
    per-source (text+source) — the governance decision behind every
    dedup run ("is the same text in two sources a duplicate or a
    licensing fact?") made with numbers. Scoped keys can only split
    global dup groups, so dup counts are monotone non-increasing down
    the table; the deltas are exactly the cross-lang / cross-source
    duplicate mass at stake.

    Output per policy: (policy, n_dupes, n_groups_with_dupes).

    Scale shape: three fingerprint-keyed aggregates over the normalized
    hash (map-side combinable), 1-row results unioned."""
    fp = F.md5(_norm(F.col("text")))
    out = []
    for policy, keys in (
        ("global", [fp]),
        ("per_lang", [fp, F.col("lang")]),
        ("per_source", [fp, F.col("source")]),
    ):
        g = docs.groupBy(*keys).agg(F.count("*").alias("n"))
        out.append(
            g.agg(
                F.lit(policy).alias("policy"),
                F.sum(F.col("n") - 1).cast("long").alias("n_dupes"),
                F.sum((F.col("n") > 1).cast("long"))
                .cast("long")
                .alias("n_groups_with_dupes"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.orderBy("policy")


KEY_POLICY_SQL = f"""
    WITH g_global AS (
        SELECT COUNT(*) AS n FROM documents
        GROUP BY md5({_norm_sql('text')})
    ),
    g_lang AS (
        SELECT COUNT(*) AS n FROM documents
        GROUP BY md5({_norm_sql('text')}), lang
    ),
    g_source AS (
        SELECT COUNT(*) AS n FROM documents
        GROUP BY md5({_norm_sql('text')}), source
    )
    SELECT * FROM (
        SELECT 'global' AS policy,
               CAST(SUM(n - 1) AS BIGINT) AS n_dupes,
               CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_groups_with_dupes
        FROM g_global
        UNION ALL
        SELECT 'per_lang',
               CAST(SUM(n - 1) AS BIGINT),
               CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM g_lang
        UNION ALL
        SELECT 'per_source',
               CAST(SUM(n - 1) AS BIGINT),
               CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM g_source
    )
    ORDER BY policy
"""


# --- dedup survivor audit -----------------------------------------------------------


def survivor_audit(docs: DataFrame) -> DataFrame:
    """Does first-occurrence dedup keep the RIGHT copy? Documents
    sharing a normalized 64-char PREFIX are truncation/continuation
    variants of one another (the mirror-cut-short case), and the
    min-doc_id keep rule may systematically keep the SHORTER variant
    while dropping the fuller copy. This audit measures that over
    global prefix groups, attributed to the kept copy's source, how often the kept raw length is below the
    longest dropped variant's, and both averages — the evidence for
    switching to a quality-ranked representative
    (dedup_cluster_representatives) when it matters.

    Output per source: (source, n_groups, kept_shorter_groups,
    kept_shorter_milli, avg_kept_chars, avg_max_dropped_chars).

    Scale shape: one fingerprint-grain aggregate (arg-min kept length,
    conditional max dropped length), bounded source rollup."""
    fp = F.md5(F.substring(_norm(F.col("text")), 1, 64)).alias("fp")
    graded = docs.select("doc_id", "source", "n_chars", fp)
    # GLOBAL prefix groups (variants routinely span sources), attributed
    # to the KEPT doc's source — the owner of the surviving copy
    groups = (
        graded.groupBy("fp")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("keep_id"),
            F.min_by("n_chars", "doc_id").alias("kept_chars"),
            F.min_by("source", "doc_id").alias("source"),
        )
        .where(F.col("n") > 1)
    )
    dropped_max = (
        graded.alias("g")
        .join(groups.select("fp", "keep_id").alias("k"), "fp")
        .where(F.col("g.doc_id") != F.col("k.keep_id"))
        .groupBy("fp")
        .agg(F.max("n_chars").alias("max_dropped_chars"))
    )
    dupg = groups.join(dropped_max, "fp").select(
        "source", "kept_chars", "max_dropped_chars"
    )
    return (
        dupg.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum(
                (F.col("kept_chars") < F.col("max_dropped_chars")).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("kept_shorter_groups"),
            F.expr(
                "CAST((2 * SUM(kept_chars) + COUNT(*)) DIV (2 * COUNT(*))"
                " AS BIGINT)"
            ).alias("avg_kept_chars"),
            F.expr(
                "CAST((2 * SUM(max_dropped_chars) + COUNT(*))"
                " DIV (2 * COUNT(*)) AS BIGINT)"
            ).alias("avg_max_dropped_chars"),
        )
        .withColumn(
            "kept_shorter_milli",
            F.expr(
                "CAST(1000 * kept_shorter_groups DIV n_groups AS BIGINT)"
            ),
        )
        .select(
            "source", "n_groups", "kept_shorter_groups",
            "kept_shorter_milli", "avg_kept_chars", "avg_max_dropped_chars",
        )
        .orderBy("source")
    )


SURVIVOR_AUDIT_SQL = f"""
    WITH graded AS (
        SELECT doc_id, source, n_chars,
               md5(substr({_norm_sql('text')}, 1, 64)) AS fp
        FROM documents
    ),
    groups AS (
        SELECT fp,
               COUNT(*) AS n,
               MIN(doc_id) AS keep_id,
               arg_min(n_chars, doc_id) AS kept_chars,
               arg_min(source, doc_id) AS source
        FROM graded
        GROUP BY fp
        HAVING COUNT(*) > 1
    ),
    dropped_max AS (
        SELECT g.fp, MAX(g.n_chars) AS max_dropped_chars
        FROM graded g JOIN groups k USING (fp)
        WHERE g.doc_id <> k.keep_id
        GROUP BY g.fp
    )
    SELECT gr.source,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN gr.kept_chars < dm.max_dropped_chars
                    THEN 1 ELSE 0 END) AS BIGINT) AS kept_shorter_groups,
           CAST(1000 * SUM(CASE WHEN gr.kept_chars < dm.max_dropped_chars
                           THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT)
               AS kept_shorter_milli,
           CAST((2 * SUM(gr.kept_chars) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS avg_kept_chars,
           CAST((2 * SUM(dm.max_dropped_chars) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS avg_max_dropped_chars
    FROM groups gr JOIN dropped_max dm USING (fp)
    GROUP BY gr.source
    ORDER BY gr.source
"""


# --- shingle document-frequency spectrum ----------------------------------------------


def df_spectrum(docs: DataFrame, n: int = DEFAULT_N) -> DataFrame:
    """Document-frequency spectrum of the shingle universe: how many
    shingles live at each df band (1, 2, 3-5, 6-20, 21+) and the share
    of posting-list PAIR WORK each band would generate (Σ C(df,2)) —
    the evidence behind DEFAULT_MAX_DF: df=1 shingles are pure index
    overhead (no pairs), the 21+ band is where quadratic pair cost
    concentrates, and the cap's cost/recall trade reads directly off
    this table.

    Output per band: (df_band, n_shingles, share_milli,
    pair_work_milli) — both shares exact milli of their totals.

    Scale shape: one shingle aggregate (map-side combinable), bounded
    band rollup; the spectrum never materializes pairs."""
    sh = shingles(docs, n)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    band = (
        F.when(F.col("df") == 1, "1")
        .when(F.col("df") == 2, "2")
        .when(F.col("df") <= 5, "3-5")
        .when(F.col("df") <= 20, "6-20")
        .otherwise("21+")
    )
    graded = freq.select(
        band.alias("df_band"),
        F.expr("CAST(df * (df - 1) AS BIGINT) DIV 2").alias("pairs"),
    )
    return (
        graded.groupBy("df_band")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum("pairs").alias("_pairs"),
        )
        .select(
            "df_band",
            "n_shingles",
            F.expr(
                "CAST(1000 * n_shingles DIV (SUM(n_shingles) OVER ())"
                " AS BIGINT)"
            ).alias("share_milli"),
            F.expr(
                "CASE WHEN SUM(_pairs) OVER () > 0 THEN"
                " CAST(1000 * _pairs DIV (SUM(_pairs) OVER ()) AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("pair_work_milli"),
        )
        .orderBy("df_band")
    )


def df_spectrum_sql(n: int = DEFAULT_N) -> str:
    return f"""
        WITH sh AS ({shingles_sql(n)}),
        freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
        graded AS (
            SELECT CASE WHEN df = 1 THEN '1'
                        WHEN df = 2 THEN '2'
                        WHEN df <= 5 THEN '3-5'
                        WHEN df <= 20 THEN '6-20'
                        ELSE '21+' END AS df_band,
                   CAST(df * (df - 1) AS BIGINT) // 2 AS pairs
            FROM freq
        ),
        panel AS (
            SELECT df_band,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(SUM(pairs) AS BIGINT) AS pairs
            FROM graded GROUP BY df_band
        )
        SELECT df_band, n_shingles,
               CAST(1000 * n_shingles // (SUM(n_shingles) OVER ())
                    AS BIGINT) AS share_milli,
               CASE WHEN SUM(pairs) OVER () > 0 THEN
                    CAST(1000 * pairs // (SUM(pairs) OVER ()) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS pair_work_milli
        FROM panel
        ORDER BY df_band
    """


# --- LSH precision/recall scorecard ----------------------------------------------


def lsh_pr_scorecard(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    threshold: float = 0.2,
    max_df: int | None = DEFAULT_MAX_DF,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Precision/recall of the MinHash-LSH CANDIDATE stage against the
    exact n-gram-Jaccard ground truth: one row (n_truth, n_cand, n_hits,
    precision_milli, recall_milli).

    dedup_lsh_calibration predicts band collision rates from theory; this
    MEASURES the end-to-end operating point on the actual corpus —
    precision says how much candidate verification work the banding
    wastes, recall says how many true near-dup pairs it never surfaces
    (the pairs no amount of verification can recover). The pair every
    LSH parameter change must be priced on.

    Exactness: both pair sets are the engine's own deterministic devices
    (md5-derived hashes, capped universes); the scorecard is three exact
    BIGINT counts and two closing divisions.

    Scale shape: reuses the banded/bucketed candidate plan and the
    inverted-index truth plan (never all-pairs), one pair-keyed join of
    the two bounded pair relations, one 1-row reduction."""
    truth = ngram_jaccard_pairs(docs, n, threshold, max_df).select(
        "doc_a", "doc_b"
    )
    cand = _lsh_candidate_pairs(docs, k, bands, n, max_bucket)
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))
    n_cand = cand.agg(F.count("*").cast("long").alias("n_cand"))
    hits = truth.join(cand, ["doc_a", "doc_b"]).agg(
        F.count("*").cast("long").alias("n_hits")
    )
    return (
        n_truth.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(hits))
        .select(
            "n_truth",
            "n_cand",
            "n_hits",
            F.expr(
                "CAST(CASE WHEN n_cand > 0 THEN"
                " round(1000.0 * n_hits / n_cand) ELSE 0 END AS BIGINT)"
            ).alias("precision_milli"),
            F.expr(
                "CAST(CASE WHEN n_truth > 0 THEN"
                " round(1000.0 * n_hits / n_truth) ELSE 0 END AS BIGINT)"
            ).alias("recall_milli"),
        )
    )


def lsh_pr_scorecard_sql(
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = DEFAULT_N,
    threshold: float = 0.2,
    max_df: int | None = DEFAULT_MAX_DF,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> str:
    return f"""
        WITH {_lsh_candidates_ctes_sql(k, bands, n, max_bucket)},
        truth AS (
            SELECT doc_a, doc_b FROM (
                {ngram_jaccard_pairs_sql(n, threshold, max_df)}
            ) t
        ),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
        nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand),
        nh AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM truth JOIN cand USING (doc_a, doc_b)
        )
        SELECT n_truth, n_cand, n_hits,
               CAST(CASE WHEN n_cand > 0 THEN
                    round(1000.0 * n_hits / n_cand) ELSE 0 END AS BIGINT)
                   AS precision_milli,
               CAST(CASE WHEN n_truth > 0 THEN
                    round(1000.0 * n_hits / n_truth) ELSE 0 END AS BIGINT)
                   AS recall_milli
        FROM nt CROSS JOIN nc CROSS JOIN nh
    """
