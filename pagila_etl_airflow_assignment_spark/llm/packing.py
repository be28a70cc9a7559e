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
