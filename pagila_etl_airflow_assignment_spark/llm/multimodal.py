"""Multimodal column plumbing: opaque binary payloads with typed metadata,
processed by Arrow-batched pandas iterators.

The container has no image/audio codecs, so the *decode* step is stubbed
(NotImplementedError behind ``require_codecs`` / a deterministic fake), but the
Spark-side plumbing — schema, partitioning, ``mapInPandas`` signature, Arrow
batch shape — is real and tested, which is the part that has to be right at
100 TB:

- payloads travel as `binary` columns; metadata as plain typed columns so
  predicate pushdown / column pruning still work on the scan (never bury
  filterable fields inside the blob);
- per-row work runs in ``mapInPandas`` so Python sees columnar Arrow batches
  (amortized serialization), and `spark.sql.execution.arrow.maxRecordsPerBatch`
  bounds peak memory per batch of large blobs;
- outputs are again typed columns → downstream stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_mean", LongType(), False),
        StructField("header_hex", StringType(), False),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's utf-8 bytes become an
    opaque payload with plausible metadata. Stands in for `spark.read.format
    ("binaryFile")` / a lake table of blobs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("doc_id") % 1920).cast("int").alias("width"),
        (F.col("doc_id") % 1080).cast("int").alias("height"),
        (F.col("n_chars") * 40).cast("int").alias("duration_ms"),
    )


def require_codecs() -> None:
    """Gate for the real decode path. The container ships no codecs; a real
    deployment implements this with PIL/ffmpeg and the same mapInPandas shape."""
    raise NotImplementedError(
        "media decode requires image/audio codecs not present in this "
        "environment; extract_features uses the deterministic byte-level fake"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction over Arrow batches (the deterministic
    stand-in for decode/resize/frame-sample). Shape: mapInPandas over
    (media_id, payload) — exactly what a real decoder would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            # one concatenated uint8 buffer + reduceat: the whole batch's byte
            # sums in a single vectorized pass (a per-payload Python sum() was
            # the hot loop: ~1.5s of the 2.2s query time at sf0.1)
            payloads = [bytes(b) for b in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                               count=len(payloads))
            if len(payloads) and int(lens.sum()) > 0:
                buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                starts = np.cumsum(lens) - lens
                # reduceat needs non-empty segments; empty payloads sum to 0
                nonzero = lens > 0
                sums = np.zeros(len(payloads), dtype=np.int64)
                if nonzero.any():
                    seg = np.add.reduceat(
                        buf.astype(np.int64), starts[nonzero]
                    )
                    sums[nonzero] = seg
            else:
                sums = np.zeros(len(payloads), dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": lens,
                    "byte_mean": sums // np.maximum(lens, 1),
                    "header_hex": [p[:4].hex() for p in payloads],
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image payload to ``width x height`` (1-row-in/1-row-out
    mapInPandas). The pixel resample itself needs a codec (``require_codecs``);
    the deterministic fake scales the payload length proportionally to the
    pixel-count change — byte volume through the Arrow channel behaves like a
    real resize, which is what sizing `maxRecordsPerBatch` against blob width
    is about."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def fake_resample(row):
                src = bytes(row["payload"])
                src_px = max(int(row["width"] or 1) * int(row["height"] or 1), 1)
                dst_len = max(1, len(src) * (width * height) // src_px)
                reps = -(-dst_len // max(len(src), 1))
                return (src * reps)[:dst_len]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf.apply(fake_resample, axis=1),
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "width", "height", "payload")
        .mapInPandas(batches, RESIZED_SCHEMA)
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("frame_payload", BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample one frame per ``every_ms`` from each video (1-row-in/N-rows-out
    mapInPandas — the fan-out Arrow shape a real ffmpeg sampler uses). The
    decode is faked deterministically: frame i is a byte slice of the payload
    at the proportional offset."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            # vectorized 1->N fan-out: per-row frame counts become a repeat
            # index, frame numbers come from a global arange minus each row's
            # start offset — no per-row Python loop; only the final byte
            # slicing stays per-frame (bytes objects aren't vectorizable)
            payloads = [bytes(b) for b in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                               count=len(payloads))
            durs = np.maximum(
                pdf["duration_ms"].fillna(0).astype("int64").to_numpy(), 0
            )
            n_frames = np.maximum(durs // every_ms, 1)
            row_idx = np.repeat(np.arange(len(pdf)), n_frames)
            starts = np.cumsum(n_frames) - n_frames
            fi = np.arange(int(n_frames.sum())) - np.repeat(starts, n_frames)
            ts = fi * every_ms
            offs = lens[row_idx] * ts // np.maximum(durs[row_idx], 1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[row_idx],
                    "frame_idx": fi.astype("int32"),
                    "ts_ms": ts.astype("int32"),
                    "frame_payload": [
                        payloads[i][o : o + 16]
                        for i, o in zip(row_idx.tolist(), offs.tolist())
                    ],
                }
            )

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "duration_ms", "payload")
        .mapInPandas(batches, FRAME_SCHEMA)
    )


def payload_dedup_stats(media: DataFrame) -> DataFrame:
    """Exact binary-payload dedup per modality: content-hash (md5 over the
    raw payload BYTES — codec-free, so it works on images/audio/video alike)
    grouped to duplicate classes, reported per kind. This is the first
    dedup pass every multimodal corpus runs (bit-identical re-crawls /
    re-uploads) before any perceptual or embedding near-dup.

    Two key aggregates — (kind, hash) -> copies, then kind -> stats — both
    map-side combined; the 16-byte hash is the only wide column shuffled,
    never the payload. dup_share_milli is exact integer half-up."""
    per_hash = (
        media.select("kind", F.md5("payload").alias("h"))
        .groupBy("kind", "h")
        .agg(F.count("*").alias("copies"))
    )
    return (
        per_hash.groupBy("kind")
        .agg(
            F.sum("copies").cast("long").alias("n_payloads"),
            F.count("*").alias("n_unique"),
            F.sum((F.col("copies") > 1).cast("int")).cast("long").alias("n_dup_groups"),
            F.sum(F.col("copies") - 1).cast("long").alias("n_redundant"),
        )
        .select(
            "kind",
            "n_payloads",
            "n_unique",
            "n_dup_groups",
            "n_redundant",
            F.expr(
                "CAST((2000 * n_redundant + n_payloads)"
                " DIV (2 * n_payloads) AS BIGINT)"
            ).alias("dup_share_milli"),
        )
        .orderBy("kind")
    )


PAYLOAD_DEDUP_STATS_SQL = """
    WITH media AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               md5(text) AS h
        FROM documents
    ),
    per_hash AS (
        SELECT kind, h, COUNT(*) AS copies FROM media GROUP BY kind, h
    )
    SELECT kind,
           CAST(SUM(copies) AS BIGINT) AS n_payloads,
           COUNT(*) AS n_unique,
           CAST(SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups,
           CAST(SUM(copies - 1) AS BIGINT) AS n_redundant,
           CAST((2000 * SUM(copies - 1) + SUM(copies)) // (2 * SUM(copies))
                AS BIGINT) AS dup_share_milli
    FROM per_hash
    GROUP BY kind
    ORDER BY kind
"""



# --- perceptual-hash near-duplicate pairs --------------------------------------

PHASH_SEGMENTS = 64
PHASH_BANDS = 8  # 8 segments -> one 8-bit band key each
PHASH_MAX_HAMMING = 14
PHASH_MAX_BUCKET = 64


def _segment_sums(docs: DataFrame) -> DataFrame:
    """Equal-segment energy sums of each payload's byte stream:
    (doc_id, s, seg_sum, seg_len, l). Characters explode to (doc, position)
    rows, segment membership is the integer map s = pos·{PHASH_SEGMENTS}
    DIV len, and the sums are one map-side-combined aggregate — no nested
    higher-order folds, so nothing re-evaluates per access and a real
    decoded pixel/PCM stream slots in unchanged."""
    n_seg = PHASH_SEGMENTS
    chars = (
        docs.where(F.length("text") >= n_seg)
        .select(
            "doc_id",
            F.length("text").cast("long").alias("l"),
            F.posexplode(F.split("text", "")).alias("pos", "ch"),
        )
        .where(F.col("ch") != "")  # split('') yields a trailing empty token
        .select(
            "doc_id",
            "l",
            F.expr(f"pos * {n_seg} DIV l").alias("s"),
            F.ascii("ch").cast("long").alias("cp"),
        )
    )
    return chars.groupBy("doc_id", "s").agg(
        F.sum("cp").alias("seg_sum"),
        F.count("*").alias("seg_len"),
        F.max("l").alias("l"),
    )


def phash_keys(docs: DataFrame) -> DataFrame:
    """64-bit perceptual average-hash per payload as 8 eight-bit band
    keys: (doc_id, band, key). The payload (deterministic byte-level decode
    stand-in — see ``media_from_documents``) is split into 64 equal
    segments; bit s is set iff segment s's mean byte exceeds the
    whole-payload mean (the classic 8x8 downsample-and-threshold on the
    1-D stream).

    Fully relational: characters explode to (doc, position) rows, segment
    membership is the integer map s = pos·64 DIV len, and the two grains
    (segment sums, payload total) are map-side-combined aggregates — no
    nested higher-order folds, so nothing re-evaluates per access and the
    same plan shape carries a real decoded-pixel stream unchanged.
    Exactness: the threshold compares seg_sum·L > total·seg_len
    cross-multiplied in BIGINTs — no division, no floats."""
    n_seg, n_band = PHASH_SEGMENTS, PHASH_BANDS
    per_band = n_seg // n_band
    segs = _segment_sums(docs)
    tot = segs.groupBy("doc_id").agg(F.sum("seg_sum").alias("total"))
    bits = segs.join(tot, "doc_id").select(
        "doc_id",
        F.expr(f"s DIV {per_band}").alias("band"),
        F.expr(f"s % {per_band}").alias("j"),
        F.when(
            F.col("seg_sum") * F.col("l") > F.col("total") * F.col("seg_len"), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("bit"),
    )
    return bits.groupBy("doc_id", "band").agg(
        F.sum(F.expr(f"shiftleft(bit, {per_band - 1} - j)")).alias("key")
    )


def phash_pairs(docs: DataFrame) -> DataFrame:
    """Perceptual average-hash near-duplicate pairs over media payloads:
    (doc_a, doc_b, hamming) for every pair within Hamming distance
    {PHASH_MAX_HAMMING} of the 64-bit aHash (``phash_keys``). Candidates
    are found SimHash-style — the 8 eight-bit band keys index buckets,
    a pair must collide on >= 1 band (pigeonhole: d <= 7 guaranteed, d <= 14
    caught with high probability), and only candidates pay the exact
    Hamming verification.

    Scale shape: hashing is two map-side-combined aggregates; the band
    join is bucketed with the repo's hot-bucket cap ({PHASH_MAX_BUCKET}
    md5-capped members), so worst-case candidates are buckets·cap² —
    never corpus². The verify joins the 4-row key relations per side and
    sums bit_count(xor) — candidates only. This is the image-dedup
    plumbing: swap the byte stream for decoded pixels (require_codecs)
    and nothing else changes."""
    keys = phash_keys(docs)
    w_bucket = Window.partitionBy("band", "key").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    capped = keys.withColumn("rk", F.row_number().over(w_bucket)).where(
        F.col("rk") <= PHASH_MAX_BUCKET
    )
    cand = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ka = keys.select(
        F.col("doc_id").alias("doc_a"), "band", F.col("key").alias("key_a")
    )
    kb = keys.select(
        F.col("doc_id").alias("doc_b"), "band", F.col("key").alias("key_b")
    )
    return (
        cand.join(ka, "doc_a")
        .join(kb, ["doc_b", "band"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.expr("bit_count(key_a ^ key_b)")).cast("int").alias("hamming")
        )
        .where(F.col("hamming") <= PHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


def phash_pairs_sql() -> str:
    n_seg, n_band = PHASH_SEGMENTS, PHASH_BANDS
    per_band = n_seg // n_band
    return f"""
        WITH chars AS (
            SELECT doc_id, CAST(len(text) AS BIGINT) AS l,
                   (p * {n_seg}) // CAST(len(text) AS BIGINT) AS s,
                   CAST(unicode(substr(text, CAST(p AS INT) + 1, 1)) AS BIGINT)
                       AS cp
            FROM (
                SELECT doc_id, text, unnest(range(0, len(text))) AS p
                FROM documents WHERE len(text) >= {n_seg}
            )
        ),
        segs AS (
            SELECT doc_id, s, SUM(cp) AS seg_sum, COUNT(*) AS seg_len,
                   MAX(l) AS l
            FROM chars GROUP BY doc_id, s
        ),
        tot AS (
            SELECT doc_id, SUM(seg_sum) AS total FROM segs GROUP BY doc_id
        ),
        bits AS (
            SELECT segs.doc_id, s // {per_band} AS band, s % {per_band} AS j,
                   CASE WHEN seg_sum * l > total * seg_len
                        THEN CAST(1 AS BIGINT) ELSE 0 END AS bit
            FROM segs JOIN tot ON segs.doc_id = tot.doc_id
        ),
        keys AS (
            SELECT doc_id, band,
                   SUM(bit << ({per_band - 1} - j)) AS key
            FROM bits GROUP BY doc_id, band
        ),
        capped AS (
            SELECT doc_id, band, key FROM (
                SELECT doc_id, band, key, ROW_NUMBER() OVER (
                    PARTITION BY band, key
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                FROM keys
            ) WHERE rk <= {PHASH_MAX_BUCKET}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM capped a
            JOIN capped b ON a.band = b.band AND a.key = b.key
                         AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST(SUM(bit_count(xor(ka.key, kb.key))) AS INT) AS hamming
        FROM cand c
        JOIN keys ka ON ka.doc_id = c.doc_a
        JOIN keys kb ON kb.doc_id = c.doc_b AND kb.band = ka.band
        GROUP BY c.doc_a, c.doc_b
        HAVING CAST(SUM(bit_count(xor(ka.key, kb.key))) AS INT)
               <= {PHASH_MAX_HAMMING}
        ORDER BY doc_a, doc_b
    """


# --- energy-envelope activity segments ------------------------------------------

ENERGY_NUM, ENERGY_DEN = 21, 20  # active iff seg mean > 1.05x payload mean


def energy_segments(docs: DataFrame) -> DataFrame:
    """VAD-style activity segmentation of each payload's energy envelope:
    the byte stream (deterministic decode stand-in) splits into
    {PHASH_SEGMENTS} equal segments; a segment is ACTIVE when its mean
    exceeds 1.05x the payload mean (cross-multiplied — 20·seg_sum·L >
    21·total·seg_len, no ratio materializes), and adjacent active segments
    merge into runs by the gaps-and-islands rule (s − row_number() is
    constant within a run). Output per payload: (media_id, n_active,
    n_islands, longest_run, active_energy) — the shape a voice-activity
    detector or scene segmenter feeds downstream, with the byte fold
    standing in for a real energy envelope (require_codecs).

    Scale shape: identical to phash_keys — two map-side-combined
    aggregates for the envelope, one per-doc window over <= 64 segment
    rows for the islands. Nothing is corpus-wide."""
    segs = _segment_sums(docs)
    tot = segs.groupBy("doc_id").agg(F.sum("seg_sum").alias("total"))
    active = (
        segs.join(tot, "doc_id")
        .where(
            F.col("seg_sum") * F.col("l") * ENERGY_DEN
            > F.col("total") * F.col("seg_len") * ENERGY_NUM
        )
        .select("doc_id", "s", "seg_sum")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("s")
    islands = (
        active.withColumn("grp", F.col("s") - F.row_number().over(w_doc))
        .groupBy("doc_id", "grp")
        .agg(F.count("*").alias("run_len"), F.sum("seg_sum").alias("run_energy"))
    )
    per_doc = islands.groupBy("doc_id").agg(
        F.sum("run_len").cast("long").alias("n_active"),
        F.count("*").cast("long").alias("n_islands"),
        F.max("run_len").cast("long").alias("longest_run"),
        F.sum("run_energy").cast("long").alias("active_energy"),
    )
    return (
        docs.where(F.length("text") >= PHASH_SEGMENTS)
        .select(F.col("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            F.col("doc_id").alias("media_id"),
            F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
            F.coalesce("n_islands", F.lit(0)).cast("long").alias("n_islands"),
            F.coalesce("longest_run", F.lit(0)).cast("long").alias("longest_run"),
            F.coalesce("active_energy", F.lit(0)).cast("long").alias(
                "active_energy"
            ),
        )
        .orderBy("media_id")
    )


def energy_segments_sql() -> str:
    n_seg = PHASH_SEGMENTS
    return f"""
        WITH chars AS (
            SELECT doc_id, CAST(len(text) AS BIGINT) AS l,
                   (p * {n_seg}) // CAST(len(text) AS BIGINT) AS s,
                   CAST(unicode(substr(text, CAST(p AS INT) + 1, 1)) AS BIGINT)
                       AS cp
            FROM (
                SELECT doc_id, text, unnest(range(0, len(text))) AS p
                FROM documents WHERE len(text) >= {n_seg}
            )
        ),
        segs AS (
            SELECT doc_id, s, SUM(cp) AS seg_sum, COUNT(*) AS seg_len,
                   MAX(l) AS l
            FROM chars GROUP BY doc_id, s
        ),
        tot AS (
            SELECT doc_id, SUM(seg_sum) AS total FROM segs GROUP BY doc_id
        ),
        active AS (
            SELECT segs.doc_id, s, seg_sum
            FROM segs JOIN tot ON segs.doc_id = tot.doc_id
            WHERE seg_sum * l * {ENERGY_DEN} > total * seg_len * {ENERGY_NUM}
        ),
        islands AS (
            SELECT doc_id,
                   s - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s)
                       AS grp,
                   seg_sum, s
            FROM active
        ),
        runs AS (
            SELECT doc_id, grp, COUNT(*) AS run_len,
                   SUM(seg_sum) AS run_energy
            FROM islands GROUP BY doc_id, grp
        ),
        per_doc AS (
            SELECT doc_id, CAST(SUM(run_len) AS BIGINT) AS n_active,
                   CAST(COUNT(*) AS BIGINT) AS n_islands,
                   CAST(MAX(run_len) AS BIGINT) AS longest_run,
                   CAST(SUM(run_energy) AS BIGINT) AS active_energy
            FROM runs GROUP BY doc_id
        )
        SELECT d.doc_id AS media_id,
               COALESCE(p.n_active, 0) AS n_active,
               COALESCE(p.n_islands, 0) AS n_islands,
               COALESCE(p.longest_run, 0) AS longest_run,
               COALESCE(p.active_energy, 0) AS active_energy
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        WHERE len(d.text) >= {n_seg}
        ORDER BY media_id
    """


# --- bitrate outliers ----------------------------------------------------------


def bitrate_outliers(docs: DataFrame) -> DataFrame:
    """Bitrate sanity audit over the media manifest: per-payload kbps
    (8·bytes·1000 / duration_ms — exact integer kilobits per second) with
    the corpus p99 rank-selected, flagging payloads above it: (media_id,
    kind, kbps, p99_kbps, is_outlier). The codec-misconfiguration catch
    (a '128 kbps' audio file at 9000 kbps is a mislabeled WAV) that runs
    before any expensive decode.

    p99 is ORDER-STATISTIC SELECTION (ceil(0.99·n)-th smallest — the
    PSI/median-CI discipline) via ranks.kth_smallest, so the threshold and
    every flag are engine-exact.

    Scale shape: narrow per-row arithmetic + the kth_smallest device (per-
    kbps counts + one cumulative window over that bounded aggregate — no
    data-sized sort), broadcast back as one scalar."""
    # the DECLARED duration comes from upstream metadata, not the payload —
    # modeled as an id-keyed stand-in so declared and actual can disagree
    # (duration_ms in media_from_documents is derived FROM the byte length,
    # which would make every bitrate identical and the audit vacuous)
    media = media_from_documents(docs).select(
        "media_id",
        "kind",
        "payload",
        (1000 + (F.col("media_id") % 97) * 50).cast("long").alias("decl_ms"),
    )
    rated = media.select(
        "media_id",
        "kind",
        F.expr("CAST(8000 * length(payload) DIV decl_ms AS BIGINT)").alias(
            "kbps"
        ),
    )
    from ..ranks import kth_smallest

    p99 = kth_smallest(
        rated.select("kbps"), "kbps", "CAST((99 * n + 99) DIV 100 AS BIGINT)"
    ).select(F.col("kbps").alias("p99_kbps"))
    return (
        rated.crossJoin(F.broadcast(p99))
        .select(
            "media_id",
            "kind",
            "kbps",
            "p99_kbps",
            (F.col("kbps") > F.col("p99_kbps")).cast("int").alias("is_outlier"),
        )
        .where(F.col("is_outlier") == 1)
        .orderBy("media_id")
    )


def bitrate_outliers_sql() -> str:
    return """
        WITH media AS (
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   CAST(8000 * strlen(text) AS BIGINT) AS kbits,
                   CAST(1000 + (doc_id % 97) * 50 AS BIGINT) AS decl_ms
            FROM documents
        ),
        rated AS (
            SELECT media_id, kind,
                   CAST(kbits // decl_ms AS BIGINT) AS kbps
            FROM media
        ),
        ranked AS (
            SELECT media_id, kind, kbps,
                   ROW_NUMBER() OVER (ORDER BY kbps, media_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM rated
        ),
        p99 AS (
            SELECT kbps AS p99_kbps FROM ranked
            WHERE rn = (99 * n + 99) // 100
        )
        SELECT r.media_id, r.kind, r.kbps, p.p99_kbps,
               CAST(r.kbps > p.p99_kbps AS INT) AS is_outlier
        FROM rated r CROSS JOIN p99 p
        WHERE r.kbps > p.p99_kbps
        ORDER BY r.media_id
    """


# --- aspect-ratio bucketing -------------------------------------------------------

ASPECT_LADDER_MILLI = (333, 500, 750, 1000, 1333, 1500, 2000, 3000)
ASPECT_BATCH = 32


def _aspect_bucket_case(a: str) -> str:
    """Nearest-ladder CASE over 2x-milli aspect (ties snap DOWN): shared
    text between the Spark expr and the DuckDB twin, so the two engines
    cannot drift."""
    L = ASPECT_LADDER_MILLI
    arms = " ".join(
        f"WHEN 2 * ({a}) <= {L[i] + L[i + 1]} THEN {L[i]}"
        for i in range(len(L) - 1)
    )
    return f"CASE {arms} ELSE {L[-1]} END"


def aspect_buckets(docs: DataFrame) -> DataFrame:
    """Aspect-ratio bucketing for resolution-bucketed image training
    batches (the SDXL/NaViT idea): batching mixed aspect ratios forces
    destructive square crops or padding waste, so the loader groups
    images into a fixed ladder of aspect buckets and draws each batch
    from one bucket.

    Images only (the fake media table's kind routing), zero-dimension
    payloads excluded as undecodable. Aspect snaps to the nearest ladder
    step in exact integer milli (ties down, via the doubled comparison —
    no halves materialize). One row per occupied bucket:
    (aspect_milli, n_images, n_batches, sum_pixels) with the batch count
    the ceil division at batch size {ASPECT_BATCH}.

    Scale shape: narrow metadata projection + one bounded-key aggregate;
    payload bytes are never touched."""
    media = media_from_documents(docs)
    sized = media.where(
        (F.col("kind") == "image") & (F.col("width") > 0) & (F.col("height") > 0)
    ).select(
        F.expr(
            _aspect_bucket_case("1000 * width DIV height")
        ).cast("long").alias("aspect_milli"),
        (F.col("width").cast("long") * F.col("height")).alias("pixels"),
    )
    return (
        sized.groupBy("aspect_milli")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.expr(
                f"CAST((COUNT(*) + {ASPECT_BATCH - 1}) DIV {ASPECT_BATCH}"
                " AS BIGINT)"
            ).alias("n_batches"),
            F.sum("pixels").cast("long").alias("sum_pixels"),
        )
        .orderBy("aspect_milli")
    )


def aspect_buckets_sql() -> str:
    bucket = _aspect_bucket_case("1000 * width // height")
    return f"""
        WITH media AS (
            SELECT doc_id % 1920 AS width, doc_id % 1080 AS height
            FROM documents
            WHERE doc_id % 3 = 0
        ),
        sized AS (
            SELECT CAST({bucket} AS BIGINT) AS aspect_milli,
                   CAST(width AS BIGINT) * height AS pixels
            FROM media WHERE width > 0 AND height > 0
        )
        SELECT aspect_milli,
               CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST((COUNT(*) + {ASPECT_BATCH - 1}) // {ASPECT_BATCH}
                    AS BIGINT) AS n_batches,
               CAST(SUM(pixels) AS BIGINT) AS sum_pixels
        FROM sized
        GROUP BY aspect_milli
        ORDER BY aspect_milli
    """


# --- perceptual-hash threshold sweep --------------------------------------------------

PHASH_SWEEP = (2, 6, 10, 14)


def phash_sweep(docs: DataFrame) -> DataFrame:
    """Hamming-radius tuning curve for perceptual-hash image dedup:
    pair volume and affected payloads at each candidate radius
    {PHASH_SWEEP} — the multimodal twin of dedup_threshold_sweep (too
    tight misses re-encodes; too loose merges distinct creatives).

    One banded candidate pass (the phash_pairs plan, bucket-capped);
    the grid explodes over the verified pair relation only. Output per
    radius: (max_hamming, n_pairs, n_payloads).

    Scale shape: identical to phash_pairs plus a ≤4-element explode on
    the REDUCED pair relation."""
    pairs = phash_pairs(docs)
    grid = F.array(*[F.lit(h) for h in PHASH_SWEEP])
    graded = pairs.select(
        "doc_a", "doc_b", "hamming", F.explode(grid).alias("max_hamming")
    ).where(F.col("hamming") <= F.col("max_hamming"))
    p_panel = graded.groupBy(
        F.col("max_hamming").cast("long").alias("max_hamming")
    ).agg(F.count("*").cast("long").alias("n_pairs"))
    d_panel = (
        graded.select(
            "max_hamming", F.explode(F.array("doc_a", "doc_b")).alias("d")
        )
        .groupBy(F.col("max_hamming").cast("long").alias("max_hamming"))
        .agg(F.count_distinct("d").cast("long").alias("n_payloads"))
    )
    return p_panel.join(d_panel, "max_hamming").orderBy("max_hamming")


def phash_sweep_sql() -> str:
    grid = ", ".join(str(h) for h in PHASH_SWEEP)
    return f"""
        WITH pairs AS ({phash_pairs_sql()}),
        grid AS (SELECT unnest([{grid}]) AS max_hamming),
        graded AS (
            SELECT p.doc_a, p.doc_b, g.max_hamming
            FROM pairs p CROSS JOIN grid g
            WHERE p.hamming <= g.max_hamming
        ),
        p_panel AS (
            SELECT CAST(max_hamming AS BIGINT) AS max_hamming,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM graded GROUP BY 1
        ),
        d_panel AS (
            SELECT CAST(max_hamming AS BIGINT) AS max_hamming,
                   CAST(COUNT(DISTINCT d) AS BIGINT) AS n_payloads
            FROM (SELECT max_hamming, unnest([doc_a, doc_b]) AS d FROM graded)
            GROUP BY 1
        )
        SELECT max_hamming, n_pairs, n_payloads
        FROM p_panel JOIN d_panel USING (max_hamming)
        ORDER BY max_hamming
    """


# --- payload size percentiles ---------------------------------------------------------


def payload_percentiles(docs: DataFrame) -> DataFrame:
    """Payload-size distribution per media kind: exact p50/p90/p99 byte
    sizes — the shard-sizing and memory-budget input (row-group sizing,
    Arrow batch caps, decode buffer pools all key off the tail, not the
    mean). Percentiles are EXACT order statistics by rank selection
    (ceil(q·n) rule in pure integers), not approximate sketches — the
    PSI/newsvendor discipline.

    Output per kind: (kind, n_payloads, p50_bytes, p90_bytes,
    p99_bytes, max_bytes).

    Scale shape: one kind-keyed rank window over the metadata
    projection; payload bytes are measured, never moved."""
    media = media_from_documents(docs).select(
        "kind", F.octet_length("payload").cast("long").alias("bytes")
    )
    w = Window.partitionBy("kind").orderBy("bytes")
    n = Window.partitionBy("kind")
    ranked = media.select(
        "kind",
        "bytes",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(n).alias("n"),
    )
    def pick(q_num: int, q_den: int, out: str):
        return (
            ranked.where(
                F.col("rn")
                == F.expr(f"CAST(({q_num} * n + {q_den - 1}) DIV {q_den}"
                          " AS BIGINT)")
            )
            .select("kind", F.col("bytes").alias(out))
        )
    base = ranked.groupBy("kind").agg(
        F.max("n").cast("long").alias("n_payloads"),
        F.max("bytes").cast("long").alias("max_bytes"),
    )
    return (
        base.join(pick(1, 2, "p50_bytes"), "kind")
        .join(pick(9, 10, "p90_bytes"), "kind")
        .join(pick(99, 100, "p99_bytes"), "kind")
        .select(
            "kind", "n_payloads", "p50_bytes", "p90_bytes", "p99_bytes",
            "max_bytes",
        )
        .orderBy("kind")
    )


PAYLOAD_PERCENTILES_SQL = """
    WITH media AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS bytes
        FROM documents
    ),
    ranked AS (
        SELECT kind, bytes,
               row_number() OVER (PARTITION BY kind ORDER BY bytes) AS rn,
               COUNT(*) OVER (PARTITION BY kind) AS n
        FROM media
    )
    SELECT kind,
           CAST(MAX(n) AS BIGINT) AS n_payloads,
           CAST(MAX(CASE WHEN rn = (1 * n + 1) // 2 THEN bytes END)
                AS BIGINT) AS p50_bytes,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN bytes END)
                AS BIGINT) AS p90_bytes,
           CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN bytes END)
                AS BIGINT) AS p99_bytes,
           CAST(MAX(bytes) AS BIGINT) AS max_bytes
    FROM ranked
    GROUP BY kind
    ORDER BY kind
"""


# --- shot-boundary detection ----------------------------------------------------------

SHOT_FRAMES = 16
SHOT_BINS = 8
SHOT_TAU = 3
SHOT_MIN_LEN = SHOT_FRAMES * SHOT_BINS


def shot_boundaries(docs: DataFrame) -> DataFrame:
    """Shot-boundary detection over the byte-stream stand-in: each payload
    splits into {SHOT_FRAMES} frames of {SHOT_BINS} bins, every frame gets
    an average-hash bit signature (bin mean > frame mean), and a CUT is
    declared wherever adjacent frames' signatures differ in >= {SHOT_TAU}
    bits — the classic perceptual-hash shot detector a video curation
    pipeline runs before sampling one frame per shot (a fixed-rate sampler
    oversamples static scenes and misses fast ones).

    Per doc: (doc_id, n_frames, n_cuts, max_hamming, mean_shot_frames_milli).
    Payloads shorter than {SHOT_MIN_LEN} bytes are skipped (no stable
    signature), mirroring the phash length gate.

    All signatures are exact integer comparisons of half-up milli means;
    the adjacent-frame compare is a self-join on (doc, bin) at frame+1 —
    bounded fan-out, no window over the byte stream. A real decoded frame
    luma plugs into the same (doc, frame, bin) aggregate unchanged."""
    nf, nb = SHOT_FRAMES, SHOT_BINS
    g = nf * nb
    chars = (
        docs.where(F.length("text") >= SHOT_MIN_LEN)
        .select(
            "doc_id",
            F.length("text").cast("long").alias("l"),
            F.posexplode(F.split("text", "")).alias("pos", "ch"),
        )
        .where(F.col("ch") != "")
        .select(
            "doc_id",
            F.expr(f"(pos * {g} DIV l) DIV {nb}").alias("frame"),
            F.expr(f"(pos * {g} DIV l) % {nb}").alias("bin"),
            F.ascii("ch").cast("long").alias("cp"),
        )
    )
    bins = chars.groupBy("doc_id", "frame", "bin").agg(
        F.sum("cp").alias("bsum"), F.count("*").cast("long").alias("bcnt")
    )
    frames = bins.groupBy("doc_id", "frame").agg(
        F.sum("bsum").alias("fsum"), F.sum("bcnt").alias("fcnt")
    )
    bits = (
        bins.join(frames, ["doc_id", "frame"])
        .select(
            "doc_id",
            "frame",
            "bin",
            (
                F.expr("(2 * 1000 * bsum + bcnt) DIV (2 * bcnt)")
                > F.expr("(2 * 1000 * fsum + fcnt) DIV (2 * fcnt)")
            ).cast("int").alias("bit"),
        )
    )
    hamming = (
        bits.alias("a")
        .join(
            bits.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.bin") == F.col("b.bin"))
            & (F.col("a.frame") + 1 == F.col("b.frame")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"), F.col("a.frame").alias("frame"))
        .agg(
            F.sum(
                (F.col("a.bit") != F.col("b.bit")).cast("long")
            ).alias("h")
        )
    )
    frame_counts = frames.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_frames")
    )
    return (
        hamming.groupBy("doc_id")
        .agg(
            F.sum((F.col("h") >= SHOT_TAU).cast("long")).alias("n_cuts"),
            F.max("h").alias("max_hamming"),
        )
        .join(frame_counts, "doc_id")
        .select(
            "doc_id",
            "n_frames",
            "n_cuts",
            "max_hamming",
            F.expr(
                "CAST((2 * 1000 * n_frames + (n_cuts + 1))"
                " DIV (2 * (n_cuts + 1)) AS BIGINT)"
            ).alias("mean_shot_frames_milli"),
        )
        .orderBy("doc_id")
    )


def shot_boundaries_sql() -> str:
    nf, nb, g = SHOT_FRAMES, SHOT_BINS, SHOT_FRAMES * SHOT_BINS
    return f"""
    WITH chars AS (
        SELECT doc_id,
               ((pos - 1) * {g} // l) // {nb} AS frame,
               ((pos - 1) * {g} // l) % {nb} AS bin,
               CAST(unicode(ch) AS BIGINT) AS cp
        FROM (
            SELECT doc_id, length(text) AS l,
                   generate_subscripts(string_split(text, ''), 1) AS pos,
                   unnest(string_split(text, '')) AS ch
            FROM documents WHERE length(text) >= {SHOT_MIN_LEN}
        )
        WHERE ch <> ''
    ),
    bins AS (
        SELECT doc_id, frame, bin,
               CAST(SUM(cp) AS BIGINT) AS bsum,
               CAST(COUNT(*) AS BIGINT) AS bcnt
        FROM chars GROUP BY doc_id, frame, bin
    ),
    frames AS (
        SELECT doc_id, frame,
               CAST(SUM(bsum) AS BIGINT) AS fsum,
               CAST(SUM(bcnt) AS BIGINT) AS fcnt
        FROM bins GROUP BY doc_id, frame
    ),
    bits AS (
        SELECT b.doc_id, b.frame, b.bin,
               CASE WHEN (2 * 1000 * b.bsum + b.bcnt) // (2 * b.bcnt)
                    > (2 * 1000 * f.fsum + f.fcnt) // (2 * f.fcnt)
               THEN 1 ELSE 0 END AS bit
        FROM bins b JOIN frames f USING (doc_id, frame)
    ),
    hamming AS (
        SELECT a.doc_id, a.frame,
               CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)
                    AS BIGINT) AS h
        FROM bits a
        JOIN bits b ON b.doc_id = a.doc_id AND b.bin = a.bin
                   AND b.frame = a.frame + 1
        GROUP BY a.doc_id, a.frame
    ),
    frame_counts AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames
        FROM frames GROUP BY doc_id
    )
    SELECT h.doc_id, fc.n_frames,
           CAST(SUM(CASE WHEN h.h >= {SHOT_TAU} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cuts,
           CAST(MAX(h.h) AS BIGINT) AS max_hamming,
           CAST((2 * 1000 * fc.n_frames
                 + (SUM(CASE WHEN h.h >= {SHOT_TAU} THEN 1 ELSE 0 END) + 1))
                // (2 * (SUM(CASE WHEN h.h >= {SHOT_TAU} THEN 1 ELSE 0 END)
                         + 1)) AS BIGINT) AS mean_shot_frames_milli
    FROM hamming h
    JOIN frame_counts fc USING (doc_id)
    GROUP BY h.doc_id, fc.n_frames
    ORDER BY h.doc_id
    """
