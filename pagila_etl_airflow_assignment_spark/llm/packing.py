"""Token-offset sequence packing: assign pretraining chunks to fixed-capacity
context windows ("packs") the way GPT-style pipelines do — concatenate the
token stream per shard, then cut every `capacity` tokens; a chunk belongs to
the pack containing its start offset.

Scale design: packing is inherently a running sum, so the ONLY shuffle is the
window partitioning — and the partition key is (lang, shard) where shard is a
deterministic doc_id bucket, NOT a global order. A single global cumsum would
serialize 100 TB through one partition (the classic WindowExec
all-to-one-partition scale killer); sharding bounds every running sum to
1/(langs x shards) of the corpus while preserving the packing contract
(real pipelines pack per input shard for exactly this reason). Chunks are
non-overlapping (stride = size) — packing overlapped chunks would duplicate
tokens across epochs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import WS_RE

PACK_SIZE = 64  # tokens per chunk (non-overlapping)
PACK_CAPACITY = 256  # tokens per pack (context window)
PACK_SHARDS = 8  # doc_id buckets per language


def pack_chunks(
    docs: DataFrame,
    size: int = PACK_SIZE,
    capacity: int = PACK_CAPACITY,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Chunk each document into non-overlapping `size`-token windows, then
    pack chunks into `capacity`-token packs per (lang, shard).

    `offset_in_pack` is the chunk's token start within its pack; a chunk may
    straddle a pack boundary (tokens spill into the next pack) exactly as in
    offset-cut packing — the assignment is by start offset.
    """
    toks = F.split(F.trim("text"), WS_RE)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(size)
    )
    chunk = F.slice("t", F.col("s") + 1, size)
    chunks = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % shards).cast("int").alias("shard"),
        toks.alias("t"),
        F.posexplode(starts).alias("cid", "s"),
    ).select(
        "lang",
        "shard",
        "doc_id",
        F.col("cid").cast("int").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_off = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        chunks.withColumn("start_offset", start_off.cast("long"))
        .select(
            "lang",
            "shard",
            "doc_id",
            "chunk_id",
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / capacity).cast("long").alias("pack_id"),
            (F.col("start_offset") % capacity).cast("long").alias("offset_in_pack"),
        )
        .orderBy("lang", "shard", "doc_id", "chunk_id")
    )


def pack_chunks_sql(
    size: int = PACK_SIZE,
    capacity: int = PACK_CAPACITY,
    shards: int = PACK_SHARDS,
) -> str:
    return rf"""
    WITH toks AS (
        SELECT doc_id, lang, CAST(doc_id % {shards} AS INT) AS shard,
               string_split_regex(trim(text), '{WS_RE}') AS t
        FROM documents
    ),
    chunks AS (
        SELECT lang, shard, doc_id,
               CAST(s // {size} AS INT) AS chunk_id,
               len(t[s + 1 : s + {size}]) AS n_tokens
        FROM (
            SELECT doc_id, lang, shard, t,
                   unnest(generate_series(0, greatest(len(t) - 1, 0), {size})) AS s
            FROM toks
        )
    ),
    offs AS (
        SELECT *,
               SUM(n_tokens) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id, chunk_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS start_offset
        FROM chunks
    )
    SELECT lang, shard, doc_id, chunk_id, n_tokens,
           CAST(start_offset AS BIGINT) AS start_offset,
           CAST(start_offset // {capacity} AS BIGINT) AS pack_id,
           CAST(start_offset % {capacity} AS BIGINT) AS offset_in_pack
    FROM offs
    ORDER BY lang, shard, doc_id, chunk_id
    """

# --- shard manifest (WebDataset-style) ---------------------------------------------

SHARD_BUDGET_BYTES = 4096


def shard_manifest(
    docs: DataFrame, budget: int = SHARD_BUDGET_BYTES
) -> DataFrame:
    """Plan fixed-budget training shards per source: (source, shard_idx,
    n_docs, shard_bytes, first_doc, last_doc) — the WebDataset/tar-shard
    manifest a multimodal loader streams.

    Greedy linear fill: docs scan in doc_id order, a doc's shard is
    cum_bytes_before div budget — deterministic, single-pass, and stable
    under re-partitioning (the order is the data, not the layout). Sharding
    is PER SOURCE so the cumulative window is source-partitioned — no
    global-order window at any scale; a source's shard sequence is
    independent of every other source.

    Byte size uses n_chars (the fixture's payload-size column); swap in the
    binary payload length for real media."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0))
        .cast("long")
        .alias("cum_before"),
    ).select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(f"cum_before DIV {budget}").alias("shard_idx"),
    )
    return (
        assigned.groupBy("source", "shard_idx")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "shard_idx")
    )


def shard_manifest_sql(
    budget: int = SHARD_BUDGET_BYTES, docs_rel: str = "documents"
) -> str:
    return f"""
        WITH assigned AS (
            SELECT source, doc_id, n_chars,
                   COALESCE(SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // {budget} AS shard_idx
            FROM {docs_rel}
        )
        SELECT source, CAST(shard_idx AS BIGINT) AS shard_idx,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(MAX(doc_id) AS BIGINT) AS last_doc
        FROM assigned
        GROUP BY source, shard_idx
        ORDER BY source, shard_idx
    """


# --- padding-waste bucketing curve ----------------------------------------------------

PADDING_BUCKET_COUNTS = (1, 2, 4, 8)


def padding_waste_curve(
    docs: DataFrame, bucket_counts: tuple[int, ...] = PADDING_BUCKET_COUNTS
) -> DataFrame:
    """Length-bucketing padding-waste curve: if documents are batched in
    ``b`` length-quantile buckets and every batch pads to its bucket max,
    how many pad tokens does each choice of ``b`` burn? The
    training-throughput planning number behind length-grouped batching
    (b=1 is naive global padding; the curve shows the marginal win of each
    doubling) — the offline complement of the packing shards (L-39).

    Scale shape: the corpus reduces to the LENGTH HISTOGRAM first (one
    aggregate), and quantile buckets are assigned by exact integer
    rank-interval overlap against the bucket boundaries — no global
    row_number over the corpus (an unpartitioned window over a data-sized
    relation is exactly what plan_audit flags). All BIGINTs.

    Output per bucket count: (n_buckets, n_docs, total_tokens,
    padded_tokens, waste_tokens, waste_milli)."""
    toks = docs.select(
        F.size(
            F.filter(
                F.split(F.trim("text"), WS_RE), lambda w: w != F.lit("")
            )
        ).cast("long").alias("len"),
    )
    hist = toks.groupBy("len").agg(F.count("*").cast("long").alias("cnt"))
    w_cum = Window.orderBy("len").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "len",
        "cnt",
        F.sum("cnt").over(w_cum).alias("hi"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    ).select(
        "len", "cnt", (F.col("hi") - F.col("cnt") + 1).alias("lo"), "hi", "n"
    )
    grid = F.explode(
        F.array(*[F.lit(b) for b in bucket_counts])
    ).alias("n_buckets")
    buckets = (
        cum.select("len", "cnt", "lo", "hi", "n", grid)
        .select(
            "*",
            F.explode(
                F.sequence(F.lit(0), F.col("n_buckets") - 1)
            ).alias("bucket"),
        )
        .select(
            "n_buckets",
            "bucket",
            "len",
            # bucket k covers ranks r with (r-1)*b DIV n = k:
            # r in [ceil(k*n/b)+1, ceil((k+1)*n/b)]
            F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    F.col("hi"),
                    F.expr(
                        "((bucket + 1) * n + n_buckets - 1) DIV n_buckets"
                    ),
                )
                - F.greatest(
                    F.col("lo"),
                    F.expr("(bucket * n + n_buckets - 1) DIV n_buckets + 1"),
                )
                + 1,
            ).alias("overlap"),
        )
        .where(F.col("overlap") > 0)
    )
    per_bucket = buckets.groupBy("n_buckets", "bucket").agg(
        F.sum("overlap").alias("bn"),
        F.max("len").alias("bmax"),
        F.sum(F.col("len") * F.col("overlap")).alias("bsum"),
    )
    return (
        per_bucket.groupBy("n_buckets")
        .agg(
            F.sum("bn").alias("n_docs"),
            F.sum("bsum").alias("total_tokens"),
            F.sum(F.col("bn") * F.col("bmax")).alias("padded_tokens"),
        )
        .select(
            F.col("n_buckets").cast("int").alias("n_buckets"),
            "n_docs",
            "total_tokens",
            "padded_tokens",
            (F.col("padded_tokens") - F.col("total_tokens")).alias(
                "waste_tokens"
            ),
            F.expr(
                "CASE WHEN padded_tokens > 0 THEN CAST((2 * 1000 *"
                " (padded_tokens - total_tokens) + padded_tokens)"
                " DIV (2 * padded_tokens) AS BIGINT) ELSE 0 END"
            ).alias("waste_milli"),
        )
        .orderBy("n_buckets")
    )


def padding_waste_curve_sql(
    bucket_counts: tuple[int, ...] = PADDING_BUCKET_COUNTS,
    docs_rel: str = "documents",
) -> str:
    from .text import WS_RE as _ws

    blist = ", ".join(str(b) for b in bucket_counts)
    return f"""
    WITH toks AS (
        SELECT CAST(len(list_filter(string_split_regex(trim(text),
                   '{_ws}'), w -> w <> '')) AS BIGINT) AS len
        FROM {docs_rel}
    ),
    hist AS (
        SELECT len, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY len
    ),
    cum AS (
        SELECT len, cnt,
               CAST(SUM(cnt) OVER (ORDER BY len
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS hi,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n
        FROM hist
    ),
    buckets AS (
        SELECT g.n_buckets, bk.bucket, c.len,
               GREATEST(CAST(0 AS BIGINT),
                   LEAST(c.hi,
                       ((bk.bucket + 1) * c.n + g.n_buckets - 1)
                           // g.n_buckets)
                   - GREATEST(c.hi - c.cnt + 1,
                       (bk.bucket * c.n + g.n_buckets - 1)
                           // g.n_buckets + 1)
                   + 1) AS overlap
        FROM cum c
        CROSS JOIN (SELECT UNNEST([{blist}]) AS n_buckets) g
        CROSS JOIN LATERAL (
            SELECT UNNEST(range(0, g.n_buckets)) AS bucket
        ) bk
        WHERE GREATEST(CAST(0 AS BIGINT),
                   LEAST(c.hi,
                       ((bk.bucket + 1) * c.n + g.n_buckets - 1)
                           // g.n_buckets)
                   - GREATEST(c.hi - c.cnt + 1,
                       (bk.bucket * c.n + g.n_buckets - 1)
                           // g.n_buckets + 1)
                   + 1) > 0
    ),
    per_bucket AS (
        SELECT n_buckets, bucket,
               CAST(SUM(overlap) AS BIGINT) AS bn,
               CAST(MAX(len) AS BIGINT) AS bmax,
               CAST(SUM(len * overlap) AS BIGINT) AS bsum
        FROM buckets GROUP BY n_buckets, bucket
    )
    SELECT CAST(n_buckets AS INTEGER) AS n_buckets,
           CAST(SUM(bn) AS BIGINT) AS n_docs,
           CAST(SUM(bsum) AS BIGINT) AS total_tokens,
           CAST(SUM(bn * bmax) AS BIGINT) AS padded_tokens,
           CAST(SUM(bn * bmax) - SUM(bsum) AS BIGINT) AS waste_tokens,
           CASE WHEN SUM(bn * bmax) > 0 THEN
               CAST((2 * 1000 * (SUM(bn * bmax) - SUM(bsum))
                     + SUM(bn * bmax)) // (2 * SUM(bn * bmax)) AS BIGINT)
           ELSE 0 END AS waste_milli
    FROM per_bucket
    GROUP BY n_buckets
    ORDER BY n_buckets
    """
