"""Text analysis over the `documents` table: language-ID, quality scoring,
token counting, fingerprinting.

All four are pure built-in-function pipelines — JVM-side, whole-stage-codegen,
zero Python UDFs — so they scale linearly with no shuffle at all (narrow
transformations over the scan). Each has an exact DuckDB oracle twin generated
from the same constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lexicons for the n-gram/lexicon heuristic.
# Deterministic and dialect-portable (plain \b word-boundary regexes).
LANG_LEXICONS: dict[str, str] = {
    "de": r"\b(der|die|und|das|ist|nicht|ein|zu|mit|auf)\b",
    "en": r"\b(the|and|of|to|in|is|that|for|with|as)\b",
    "es": r"\b(el|la|y|de|los|que|en|un|por|con)\b",
    "fr": r"\b(le|la|et|les|des|que|en|un|pour|dans)\b",
}
# CJK detection via a literal unicode character-class (identical semantics in
# Java regex and RE2).
CJK_CLASS = "[一-鿿]"

# "BPE-ish" tokenizer regex: word runs or single non-space punctuation — the
# standard pre-tokenization shape; identical in Java regex and RE2.
BPE_TOKEN_RE = r"\w+|[^\w\s]"
WS_RE = r"\s+"

STOPWORDS_EN = "(the|and|of|to|in|is|that|for|with|as|a|an|it|on|at)"


def _norm(col) -> Column:
    """Canonical text normalization: lowercase, collapse whitespace."""
    return F.lower(F.regexp_replace(F.trim(col), WS_RE, " "))


def _norm_sql(expr: str) -> str:
    return f"lower(regexp_replace(trim({expr}), '{WS_RE}', ' ', 'g'))"


# --- token counting -----------------------------------------------------------


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace and BPE-ish regex token counts per document."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), WS_RE)).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).cast("long").alias("re_tokens"),
    )


TOKEN_COUNTS_SQL = rf"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '{WS_RE}')) AS ws_tokens,
           len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS re_tokens
    FROM documents
"""


# --- quality scoring ----------------------------------------------------------


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features plus a
    composite keep/drop flag (the usual pre-training corpus filter shape)."""
    n_chars = F.length("text")
    words = F.split(F.trim("text"), WS_RE)
    n_words = F.size(words)
    n_punct = F.regexp_count(F.col("text"), F.lit(r"[^\w\s]"))
    n_stop = F.regexp_count(_norm(F.col("text")), F.lit(rf"\b{STOPWORDS_EN}\b"))
    mean_wlen = (
        F.length(F.regexp_replace(F.trim("text"), WS_RE, "")) / n_words
    )
    punct_ratio = n_punct / n_chars
    stop_ratio = n_stop / n_words
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_m"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        (
            (n_words >= 5)
            & (mean_wlen >= 2.0)
            & (mean_wlen <= 12.0)
            & (punct_ratio <= 0.2)
        ).alias("keep"),
    )


QUALITY_SCORES_SQL = rf"""
    SELECT doc_id,
           length(text) AS n_chars_m,
           len(string_split_regex(trim(text), '{WS_RE}')) AS n_words,
           round(length(regexp_replace(trim(text), '{WS_RE}', '', 'g'))
                 / len(string_split_regex(trim(text), '{WS_RE}')), 6) AS mean_word_len,
           round(len(regexp_extract_all(text, '[^\w\s]'))
                 / length(text), 6) AS punct_ratio,
           round(len(regexp_extract_all({_norm_sql('text')}, '\b{STOPWORDS_EN}\b'))
                 / len(string_split_regex(trim(text), '{WS_RE}')), 6) AS stopword_ratio,
           (len(string_split_regex(trim(text), '{WS_RE}')) >= 5
            AND length(regexp_replace(trim(text), '{WS_RE}', '', 'g'))
                / len(string_split_regex(trim(text), '{WS_RE}')) >= 2.0
            AND length(regexp_replace(trim(text), '{WS_RE}', '', 'g'))
                / len(string_split_regex(trim(text), '{WS_RE}')) <= 12.0
            AND len(regexp_extract_all(text, '[^\w\s]')) / length(text) <= 0.2
           ) AS keep
    FROM documents
"""


# --- language identification --------------------------------------------------


def lang_id(docs: DataFrame) -> DataFrame:
    """Lexicon/charset heuristic language ID.

    Scores each candidate language by stopword hits per word; CJK wins when CJK
    characters dominate. Deterministic alphabetical tie-break via the
    least-value struct trick (score desc, lang asc) — no UDF.
    """
    norm = _norm(F.col("text"))
    n_words = F.size(F.split(F.trim("text"), WS_RE))
    scores = [
        F.struct(
            (-F.regexp_count(norm, F.lit(pat))).alias("neg_score"),
            F.lit(lang).alias("lang"),
        )
        for lang, pat in sorted(LANG_LEXICONS.items())
    ]
    best = F.least(*scores)
    cjk_count = F.regexp_count(F.col("text"), F.lit(CJK_CLASS))
    return docs.select(
        "doc_id",
        F.when(cjk_count * 2 > F.length("text"), F.lit("zh"))
        .when(best["neg_score"] < 0, best["lang"])
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
        (-best["neg_score"]).cast("long").alias("lexicon_hits"),
        n_words.cast("long").alias("n_words"),
    )


def _lang_id_sql() -> str:
    norm = _norm_sql("text")
    score = lambda pat: f"len(regexp_extract_all({norm}, '{pat}'))"
    structs = ", ".join(
        f"{{'neg_score': -{score(pat)}, 'lang': '{lang}'}}"
        for lang, pat in sorted(LANG_LEXICONS.items())
    )
    return rf"""
    SELECT doc_id,
           CASE WHEN 2 * len(regexp_extract_all(text, '{CJK_CLASS}')) > length(text)
                THEN 'zh'
                WHEN best.neg_score < 0 THEN best.lang
                ELSE 'und' END AS pred_lang,
           -best.neg_score AS lexicon_hits,
           len(string_split_regex(trim(text), '{WS_RE}')) AS n_words
    FROM (
        SELECT *, list_min([{structs}]) AS best FROM documents
    )
    """


LANG_ID_SQL = _lang_id_sql()


# --- fingerprinting -----------------------------------------------------------


def fingerprints(docs: DataFrame) -> DataFrame:
    """Stable document fingerprint: md5 over normalized text (exact-dup key)
    plus a 60-bit integer form for compact joins."""
    from .hashing import md5_int

    norm = _norm(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        md5_int(norm).alias("fingerprint_int"),
    )


def _fingerprints_sql() -> str:
    from .hashing import md5_int_sql

    norm = _norm_sql("text")
    return f"""
    SELECT doc_id,
           md5({norm}) AS fingerprint,
           {md5_int_sql(norm)} AS fingerprint_int
    FROM documents
    """


FINGERPRINTS_SQL = _fingerprints_sql()


# --- sliding-window document chunking -----------------------------------------

CHUNK_SIZE = 64  # tokens per chunk
CHUNK_STRIDE = 32  # tokens between chunk starts (50% overlap)


def chunk_documents(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Split each document into overlapping token windows (size=64, stride=32)
    — the standard LLM-pretraining chunker. Entirely narrow: tokenization,
    window-start generation, and slicing are array expressions per row;
    posexplode fans out to one row per chunk with NO shuffle (the orderBy is
    display-only and the only exchange in the plan). Start positions run
    through ``sequence(0, n_tokens-1, stride)``, so a trailing partial window
    is emitted (slice truncates at the array end) — no token is dropped.
    """
    toks = F.split(F.trim("text"), WS_RE)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    chunk = F.slice("t", F.col("s") + 1, size)
    return (
        docs.select("doc_id", toks.alias("t"), F.posexplode(starts).alias("cid", "s"))
        .select(
            "doc_id",
            F.col("cid").cast("int").alias("chunk_id"),
            F.col("s").cast("long").alias("start_token"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


def chunk_documents_sql(size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> str:
    return rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '{WS_RE}') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t,
               unnest(generate_series(0, greatest(len(t) - 1, 0), {stride})) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST(s // {stride} AS INT) AS chunk_id,
           s AS start_token,
           len(t[s + 1 : s + {size}]) AS n_tokens,
           array_to_string(t[s + 1 : s + {size}], ' ') AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_id
    """


# --- winnowing (rolling-hash) fingerprints ------------------------------------

WINNOW_K = 8  # char k-gram length
WINNOW_W = 4  # winnowing window (k-gram positions per window)
WINNOW_B = 131  # Karp-Rabin polynomial base
WINNOW_M = 1_000_000_007  # prime modulus (Horner steps stay within int64)


def winnowing_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash every
    char k-gram of the normalized text, slide a w-position window over the
    hash sequence, keep each window's minimum — the distinct selected hashes
    are the fingerprint set (robust to local edits, unlike a whole-doc hash).

    K-gram hashes are Karp-Rabin polynomial hashes (the paper's own choice)
    computed by an 8-step Horner chain over a per-doc codepoint array — pure
    int64 arithmetic, no per-gram string allocation. The earlier md5-per-gram
    form measured 2.3× slower at sf0.1 (every gram paid substring + hex +
    conv); codepoints are extracted ONCE per char, then each gram is k
    multiply-adds. The window minimum is ``least(element_at..)`` rather than
    ``array_min(slice(..))`` — no per-window array allocation.

    Entirely array-side per document (split / transform / element_at /
    array_distinct are narrow): the only shuffle in the whole plan is the
    final orderBy on the ~0.01×-sized fingerprint output. An exploded
    row-per-gram formulation with a per-doc ROWS window costs three shuffles
    over the gram set (window sort, distinct, order) — at 100 TB that's the
    difference between a map-only pass and re-materializing ~300× the corpus.

    The code/hash arrays are aliased in their own projections and referenced
    more than once so CollapseProject cannot inline them into downstream
    lambdas (which would re-evaluate per reference).
    """
    # int64 codes: the Horner step h*B + c must not wrap in int32 (Spark would
    # wrap silently with ANSI off; DuckDB raises)
    codes = F.transform(F.split(F.col("nt"), ""), lambda c: F.ascii(c).cast("long"))
    base = (
        docs.select("doc_id", _norm(F.col("text")).alias("nt"))
        # need at least one full window of k-grams: L - (k-1) >= w
        .where(F.length("nt") >= k + w - 1)
        .select("doc_id", codes.alias("cs"))
    )

    def gram_hash(j):
        h = F.element_at("cs", j)
        for d in range(1, k):
            h = (h * WINNOW_B + F.element_at("cs", j + d)) % WINNOW_M
        return h

    hashed = base.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("cs") - (k - 1)), gram_hash
        ).alias("hs"),
    )
    windows = F.sequence(F.lit(1), F.size("hs") - (w - 1))
    return (
        hashed.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        windows,
                        lambda j: F.least(
                            *[F.element_at("hs", j + i) for i in range(w)]
                        ),
                    )
                )
            ).alias("selected_hash"),
        )
        .orderBy("doc_id", "selected_hash")
    )


def winnowing_selected_positions(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Positioned winnowing selection (run-start variant): per window start
    position p, take the window's min gram hash m_p; keep (m_p, p) only where
    the min CHANGES from the previous window (p == 1 or m_p != m_{p-1}).

    This keeps classic winnowing's ~2/(w+1) density (consecutive windows
    sharing a min collapse to one selected point) while retaining a
    DETERMINISTIC position per selection — the ingredient substring-level
    dedup needs: two documents sharing a long substring select the same
    hashes at the same offsets relative to the shared region, so their
    matches align on a constant position delta (dedup.common_substring_spans).

    Same zero-shuffle array-side shape as winnowing_fingerprints: codepoints
    once per char, Karp-Rabin Horner chains, per-window ``least`` — the only
    shuffle anywhere is whatever the caller does with the output.
    """
    codes = F.transform(F.split(F.col("nt"), ""), lambda c: F.ascii(c).cast("long"))
    base = (
        docs.select("doc_id", _norm(F.col("text")).alias("nt"))
        .where(F.length("nt") >= k + w - 1)
        .select("doc_id", codes.alias("cs"))
    )

    def gram_hash(j):
        h = F.element_at("cs", j)
        for d in range(1, k):
            h = (h * WINNOW_B + F.element_at("cs", j + d)) % WINNOW_M
        return h

    hashed = base.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("cs") - (k - 1)), gram_hash
        ).alias("hs"),
    )
    mins = hashed.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - (w - 1)),
            lambda j: F.least(*[F.element_at("hs", j + i) for i in range(w)]),
        ).alias("ms"),
    )
    # run-start filter; the CASE guard keeps element_at from seeing index 0
    sel = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size("ms")),
            lambda j: F.struct(
                F.element_at("ms", j).alias("h"), j.alias("p")
            ),
        ),
        lambda s, i: F.when(i == F.lit(0), F.lit(True)).otherwise(
            s["h"] != F.element_at("ms", i)
        ),
    )
    return mins.select("doc_id", F.explode(sel).alias("s")).select(
        "doc_id",
        F.col("s.h").alias("selected_hash"),
        F.col("s.p").cast("long").alias("pos"),
    )


def winnowing_fingerprints_sql(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
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
        SELECT g.doc_id, g.L, g.p - 1 AS pos,
               {horner} AS h
        FROM grams g JOIN codes c USING (doc_id)
    ),
    selected AS (
        SELECT doc_id, pos,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS sel,
               L - {k - 1} - {w - 1} AS nw
        FROM hashed
    )
    SELECT DISTINCT doc_id, sel AS selected_hash
    FROM selected WHERE pos < nw
    ORDER BY doc_id, selected_hash
    """


# --- PII scrubbing -------------------------------------------------------------

# RE2-safe patterns (no lookahead/backrefs) that Java regex and DuckDB RE2
# interpret identically; '-' escaped inside classes for dialect safety.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Scrub emails/phone numbers from document text (the redaction pass
    every training-data pipeline runs before a corpus ships). The fixture
    text contains no PII, so deterministic synthetic PII is injected first
    (same trick as the h12 bad-timestamp query): doc_id%3==0 gets an email,
    doc_id%4==0 a phone — so the scrubber is provably exercised, and the
    oracle injects identically.

    Pure regexp_replace/regexp_count — JVM codegen, narrow, zero shuffles."""
    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(" call +1 555-01"), (F.col("doc_id") % 100).cast("string")),
        ).otherwise(F.lit("")),
    )
    t = F.col("__t")
    return (
        docs.select("doc_id", injected.alias("__t"))
        .select(
            "doc_id",
            F.regexp_count(t, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
            F.regexp_count(t, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


PII_SCRUB_SQL = f"""
    WITH injected AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 4 = 0
                       THEN ' call +1 555-01' || CAST(doc_id % 100 AS VARCHAR)
                       ELSE '' END AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
    FROM injected
    ORDER BY doc_id
"""


# --- quality-quantile curation filter -----------------------------------------

QUANTILE_KEEP_FRAC = 0.5


def quality_quantile_filter(
    docs: DataFrame, keep_frac: float = QUANTILE_KEEP_FRAC
) -> DataFrame:
    """Keep the top ``keep_frac`` of documents PER LANGUAGE by fluency score
    (stopword ratio) — the FineWeb-style quantile cut. An absolute threshold
    over a multilingual corpus silently biases the mix (stopword lexicon
    coverage varies by language); ranking within language keeps the mixture.

    percent_rank orders by (score desc, doc_id) — the explicit tiebreak makes
    every rank unique, so the cut is deterministic and engine-independent.
    One shuffle keyed by lang; per-language partitions are the corpus/langs,
    so at 100 TB this windows within language shards, never globally.
    """
    words = F.split(F.trim("text"), WS_RE)
    n_stop = F.regexp_count(_norm(F.col("text")), F.lit(rf"\b{STOPWORDS_EN}\b"))
    scored = docs.select(
        "doc_id",
        "lang",
        F.round(n_stop / F.size(words), 6).alias("fluency"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("fluency").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("pct_rank", F.round(F.percent_rank().over(w), 6))
        .where(F.col("pct_rank") <= keep_frac)
        .orderBy("lang", "pct_rank")
    )


def quality_quantile_filter_sql(keep_frac: float = QUANTILE_KEEP_FRAC) -> str:
    return rf"""
    WITH scored AS (
        SELECT doc_id, lang,
               round(len(regexp_extract_all({_norm_sql('text')}, '\b{STOPWORDS_EN}\b'))
                     / len(string_split_regex(trim(text), '{WS_RE}')), 6) AS fluency
        FROM documents
    )
    SELECT doc_id, lang, fluency, pct_rank
    FROM (
        SELECT *, round(percent_rank() OVER (
            PARTITION BY lang ORDER BY fluency DESC, doc_id ASC
        ), 6) AS pct_rank
        FROM scored
    )
    WHERE pct_rank <= {keep_frac}
    ORDER BY lang, pct_rank
    """


# --- feature hashing (hashing trick) -----------------------------------------

FEATHASH_DIM = 32


def feature_hash_vectors(docs: DataFrame, dim: int = FEATHASH_DIM) -> DataFrame:
    """Hashing-trick bag-of-words: each token maps to ``dim`` buckets via md5
    (bucket = h mod dim, sign = ±1 from the next hash bit), giving every
    document a fixed-width integer vector with no vocabulary build, no
    global term dictionary, and no shuffle — the standard way to featurize
    unbounded vocabularies at corpus scale (Weinberger et al., ICML 2009).

    All-JVM narrow plan: split → explode-free transform? No — tokens explode
    to (doc, bucket, sign) and re-aggregate per doc via pivot-free
    conditional sums on the ≤dim-wide key, one doc_id-keyed shuffle. Values
    are exact integers (signed counts), so the vector is hash-comparable
    with zero float tolerance."""
    toks = docs.select(
        "doc_id", F.explode(F.split(_norm(F.col("text")), " ")).alias("tok")
    ).where(F.col("tok") != "")
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    # sign from an INDEPENDENT md5 digit (position 16), not h//dim — integer
    # division of a 60-bit value through double arithmetic is lossy
    sign_bit = F.conv(F.substring(F.md5(F.col("tok")), 16, 1), 16, 10).cast("long")
    hashed = toks.select(
        "doc_id",
        (h % dim).alias("bucket"),
        F.when(sign_bit % 2 == 0, 1).otherwise(-1).alias("sign"),
    )
    per_bucket = hashed.groupBy("doc_id", "bucket").agg(F.sum("sign").alias("s"))
    # The certified output joins the exact-integer vector to one CSV string:
    # the driver's value-hasher rejects ARRAY cells (unhashable), and integer
    # -> string is bit-exact on both engines, so the scalar form loses nothing.
    vec = F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("bucket"), F.col("s")))),
        F.array_repeat(F.lit(0).cast("long"), dim),
        lambda acc, x: F.transform(
            acc,
            lambda v, i: F.when(i == x["bucket"], v + x["s"]).otherwise(v),
        ),
    )
    return (
        per_bucket.groupBy("doc_id")
        .agg(F.array_join(vec, ",").alias("features"))
        .orderBy("doc_id")
    )


def feature_hash_vectors_sql(dim: int = FEATHASH_DIM) -> str:
    h = "CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)::BIGINT"
    sign_bit = "CAST(('0x' || substr(md5(tok), 16, 1)) AS UBIGINT)::BIGINT"
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split({_norm_sql('text')}, ' ')) AS tok
            FROM documents
        ), hashed AS (
            SELECT doc_id, ({h}) % {dim} AS bucket,
                   CASE WHEN ({sign_bit}) % 2 = 0 THEN 1 ELSE -1 END AS sign
            FROM toks WHERE tok <> ''
        ), per_bucket AS (
            SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS s
            FROM hashed GROUP BY doc_id, bucket
        ), packed AS (
            SELECT doc_id,
                   list(bucket ORDER BY bucket) AS buckets,
                   list(s ORDER BY bucket) AS sums
            FROM per_bucket GROUP BY doc_id
        )
        SELECT doc_id,
               array_to_string(list_transform(
                   range(0, {dim}),
                   i -> COALESCE(sums[list_position(buckets, i)], 0)
               ), ',') AS features
        FROM packed
        ORDER BY doc_id
    """


# --- readability scoring ------------------------------------------------------


def readability_scores(docs: DataFrame) -> DataFrame:
    """Flesch-style readability features per document: word/sentence/syllable
    counts and the reading-ease score — a standard pretraining quality signal
    (too-hard and degenerate text both score far from prose).

    Syllables use the vowel-group approximation (runs of [aeiouy] per word);
    sentences count terminal-punctuation runs (min 1 — headlines have no
    period). Pure regexp_count arithmetic: narrow, zero-shuffle, identical
    RE2-safe patterns in both engines; the score is fixed-constant double
    arithmetic on exact integer counts, rounded at 6 dp."""
    norm = _norm(F.col("text"))
    words = F.greatest(F.regexp_count(norm, F.lit(r"[a-z0-9']+")), F.lit(1)).cast(
        "long"
    )
    sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    syllables = F.greatest(F.regexp_count(norm, F.lit(r"[aeiouy]+")), F.lit(1)).cast(
        "long"
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double"))
    )
    return docs.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.round(flesch, 6).alias("flesch_score"),
    ).orderBy("doc_id")


READABILITY_SCORES_SQL = rf"""
    SELECT doc_id,
           GREATEST(len(regexp_extract_all({_norm_sql('text')}, '[a-z0-9'']+')), 1)
               AS n_words,
           GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
           GREATEST(len(regexp_extract_all({_norm_sql('text')}, '[aeiouy]+')), 1)
               AS n_syllables,
           round(206.835
                 - 1.015 * (CAST(GREATEST(len(regexp_extract_all({_norm_sql('text')}, '[a-z0-9'']+')), 1) AS DOUBLE)
                            / CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE))
                 - 84.6 * (CAST(GREATEST(len(regexp_extract_all({_norm_sql('text')}, '[aeiouy]+')), 1) AS DOUBLE)
                           / CAST(GREATEST(len(regexp_extract_all({_norm_sql('text')}, '[a-z0-9'']+')), 1) AS DOUBLE)), 6)
               AS flesch_score
    FROM documents
    ORDER BY doc_id
"""


# --- tokenizer fertility ------------------------------------------------------


def token_fertility(docs: DataFrame) -> DataFrame:
    """Per-language tokenizer-fertility report: characters per regex token
    and tokens per document — the corpus statistic that predicts training
    cost per byte and flags languages a tokenizer fragments (high fertility
    = more tokens per character = worse compression).

    Narrow per-doc counts then one |langs|-row aggregate; ratios divide
    exact integer sums (one IEEE division per cell)."""
    toks = F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).cast("long")
    per_doc = docs.select(
        "lang", F.length("text").cast("long").alias("chars"), toks.alias("toks")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("chars").alias("total_chars"),
            F.sum("toks").alias("total_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            (F.col("total_chars").cast("double") / F.col("total_tokens").cast("double")).alias(
                "chars_per_token"
            ),
            (F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
                "tokens_per_doc"
            ),
        )
        .orderBy("lang")
    )


TOKEN_FERTILITY_SQL = rf"""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS DOUBLE)
               / CAST(SUM(len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))) AS DOUBLE)
               AS chars_per_token,
           CAST(SUM(len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS tokens_per_doc
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""


# --- character-bigram entropy -------------------------------------------------


def char_entropy(docs: DataFrame) -> DataFrame:
    """Per-document character-BIGRAM Shannon entropy — the encoding-damage /
    gibberish detector that catches what word-level stats miss (base64
    blobs, mojibake, key-mashing all have abnormal char-pair structure).

    The pair relation explodes per character ONCE (doc_id-keyed shuffle,
    linear in corpus bytes); H = ln n − Σ c·ln c / n assembles from the
    (doc, pair) counts with the entropy identity (events_user_entropy's
    form — no per-pair probability division). The normalized text
    materializes as a column BEFORE the per-position lambda (the shingles
    rule: expressions inside higher-order-function lambdas get no CSE, so
    an inlined norm would re-run regexp_replace per character); short docs
    guard against sequence()'s descending-when-empty behavior."""
    t = F.col("__t")
    grams = F.when(
        F.length(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 1), lambda i: t.substr(i, F.lit(2))
        ),
    ).otherwise(F.array())
    pairs = (
        docs.select("doc_id", _norm(F.col("text")).alias("__t"))
        .select("doc_id", F.explode(grams).alias("pair"))
    )
    counts = pairs.groupBy("doc_id", "pair").agg(F.count("*").alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
                "clogc"
            ),
        )
        .select(
            "doc_id",
            F.round(
                F.log(F.col("n").cast("double")) - F.col("clogc") / F.col("n"), 6
            ).alias("char_bigram_entropy"),
            F.col("n").alias("n_bigrams"),
        )
        .orderBy("doc_id")
    )


CHAR_ENTROPY_SQL = f"""
    WITH pairs AS (
        SELECT doc_id,
               unnest([t[i : i + 1] FOR i IN generate_series(1, length(t) - 1)])
                   AS pair
        FROM (SELECT doc_id, {_norm_sql('text')} AS t FROM documents)
        WHERE length(t) >= 2
    ), counts AS (
        SELECT doc_id, pair, COUNT(*) AS c FROM pairs GROUP BY doc_id, pair
    )
    SELECT doc_id,
           round(ln(CAST(SUM(c) AS DOUBLE))
                 - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                   / CAST(SUM(c) AS DOUBLE), 6) AS char_bigram_entropy,
           CAST(SUM(c) AS BIGINT) AS n_bigrams
    FROM counts
    GROUP BY doc_id
    ORDER BY doc_id
"""


# --- lang-ID evaluation -------------------------------------------------------


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Confusion matrix of the heuristic language-ID against the fixture's
    labeled ``lang`` — the offline-eval loop every classifier-shaped
    operator needs in-warehouse (per-cell counts; precision/recall/accuracy
    derive downstream from this exact relation).

    Composition: lang_id's prediction relation joins the labels it already
    carries; one ≤|langs|²-key aggregate."""
    pred = lang_id(docs).select("doc_id", "pred_lang")
    return (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


LANGID_CONFUSION_SQL = f"""
    WITH pred AS (
        SELECT doc_id, pred_lang FROM ({{lang_id_sql}})
    )
    SELECT d.lang AS true_lang, pred_lang, COUNT(*) AS n
    FROM documents d JOIN pred USING (doc_id)
    GROUP BY d.lang, pred_lang
    ORDER BY true_lang, pred_lang
""".format(lang_id_sql=LANG_ID_SQL)


# --- code-vs-prose detection ----------------------------------------------------

CODE_SYMBOL_MILLI_MIN = 50   # >=5% symbol chars
CODE_KEYWORD_MIN = 2         # or >=2 code-keyword hits


def code_detection_scores(docs: DataFrame) -> DataFrame:
    """Heuristic code-vs-prose signals per document: symbol-character ratio,
    digit ratio, code-keyword hits (def/return/import/void/etc.), and
    semicolon/brace line endings — the cheap pre-filter a text corpus runs
    before routing documents to a code-specific pipeline (a code classifier
    is expensive; these ratios remove the obvious mass first).

    Zero-shuffle narrow regexp_count arithmetic over the raw text (case
    preserved — code casing is signal); ratios emitted as exact milli
    integers (round of identical integer-ratio doubles). The flag mirrors
    the lang-ID contract: a deterministic heuristic, evaluated offline by
    its own confusion query when labels exist."""
    raw = F.col("text")
    chars = F.greatest(F.length(raw), F.lit(1))
    symbols = F.regexp_count(raw, F.lit(r"[{}()\[\];=<>+*/\\|&^%$#@~`]"))
    digits = F.regexp_count(raw, F.lit(r"[0-9]"))
    keywords = F.regexp_count(
        F.lower(raw),
        F.lit(
            r"\b(def|return|import|class|void|int|const|var|function|"
            r"lambda|printf|include|select|from|where)\b"
        ),
    )
    stmt_ends = F.regexp_count(raw, F.lit(r"[;{}]\s*($|\n)"))
    sym_milli = F.round(F.lit(1000.0) * symbols / chars).cast("long")
    dig_milli = F.round(F.lit(1000.0) * digits / chars).cast("long")
    return docs.select(
        "doc_id",
        F.length(raw).alias("n_chars"),
        sym_milli.alias("symbol_milli"),
        dig_milli.alias("digit_milli"),
        keywords.alias("keyword_hits"),
        stmt_ends.alias("stmt_line_ends"),
        (
            (sym_milli >= CODE_SYMBOL_MILLI_MIN)
            | (keywords >= CODE_KEYWORD_MIN)
        ).alias("looks_like_code"),
    ).orderBy("doc_id")


CODE_DETECTION_SQL = rf"""
    WITH scored AS (
        SELECT doc_id,
               length(text) AS n_chars,
               CAST(round(1000.0 * len(regexp_extract_all(text,
                   '[{{}}()\[\];=<>+*/\\|&^%$#@~`]'))
                   / GREATEST(length(text), 1)) AS BIGINT) AS symbol_milli,
               CAST(round(1000.0 * len(regexp_extract_all(text, '[0-9]'))
                   / GREATEST(length(text), 1)) AS BIGINT) AS digit_milli,
               len(regexp_extract_all(lower(text),
                   '\b(def|return|import|class|void|int|const|var|function|lambda|printf|include|select|from|where)\b'))
                   AS keyword_hits,
               len(regexp_extract_all(text, '[;{{}}]\s*($|\n)')) AS stmt_line_ends
        FROM documents
    )
    SELECT doc_id, n_chars, symbol_milli, digit_milli, keyword_hits,
           stmt_line_ends,
           symbol_milli >= {CODE_SYMBOL_MILLI_MIN}
               OR keyword_hits >= {CODE_KEYWORD_MIN} AS looks_like_code
    FROM scored
    ORDER BY doc_id
"""


# --- Gopher quality rules ---------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MAX_SYMBOL_WORD_MILLI = 100  # symbol-to-word ratio <= 0.1
GOPHER_MIN_ALPHA_WORD_MILLI = 800   # >=80% words contain a letter
GOPHER_MIN_STOPWORDS = 2


def gopher_rules(docs: DataFrame) -> DataFrame:
    """The Gopher repetition-free quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1) as one zero-shuffle pass: word-count window,
    mean-word-length window, symbol-to-word ratio (# and … are the named
    symbols), alphabetic-word fraction, and a minimum count of common English
    stop words — each emitted as its own flag so downstream can ablate rules
    independently, plus the conjunction ``gopher_keep``.

    All ratios are exact milli integers over exact counts; the word list
    derives from the same `_norm`/whitespace convention the rest of the text
    stack uses, so flags compose with quality_scores / lang_id without
    re-tokenizing."""
    norm = _norm(F.col("text"))
    words = F.split(norm, " ")
    n_words = F.size(
        F.filter(words, lambda w: w != F.lit(""))
    ).cast("long")
    nw = F.greatest(n_words, F.lit(1))
    mean_wlen = F.length(F.regexp_replace(norm, F.lit(" "), F.lit(""))) / nw
    n_symbols = F.regexp_count(F.col("text"), F.lit(r"(#|\.\.\.|…)"))
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[a-z]"))
    ).cast("long")
    n_stop = F.regexp_count(norm, F.lit(rf"\b{STOPWORDS_EN}\b"))
    symbol_word_milli = F.round(F.lit(1000.0) * n_symbols / nw).cast("long")
    alpha_word_milli = F.round(F.lit(1000.0) * n_alpha_words / nw).cast("long")
    f_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    f_wlen = (mean_wlen >= GOPHER_MIN_MEAN_WLEN) & (
        mean_wlen <= GOPHER_MAX_MEAN_WLEN
    )
    f_symbol = symbol_word_milli <= GOPHER_MAX_SYMBOL_WORD_MILLI
    f_alpha = alpha_word_milli >= GOPHER_MIN_ALPHA_WORD_MILLI
    f_stop = n_stop >= GOPHER_MIN_STOPWORDS
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        symbol_word_milli.alias("symbol_word_milli"),
        alpha_word_milli.alias("alpha_word_milli"),
        n_stop.cast("long").alias("n_stopwords"),
        f_words.alias("pass_word_count"),
        f_wlen.alias("pass_word_length"),
        f_symbol.alias("pass_symbol_ratio"),
        f_alpha.alias("pass_alpha_words"),
        f_stop.alias("pass_stopwords"),
        (f_words & f_wlen & f_symbol & f_alpha & f_stop).alias("gopher_keep"),
    ).orderBy("doc_id")


def _gopher_rules_sql() -> str:
    norm = _norm_sql("text")
    return rf"""
    WITH scored AS (
        SELECT doc_id,
               len(list_filter(string_split({norm}, ' '), w -> w <> ''))
                   AS n_words,
               length(replace({norm}, ' ', ''))
                   / GREATEST(len(list_filter(string_split({norm}, ' '),
                                              w -> w <> '')), 1) AS mean_word_len,
               CAST(round(1000.0 * len(regexp_extract_all(text, '(#|\.\.\.|…)'))
                   / GREATEST(len(list_filter(string_split({norm}, ' '),
                                              w -> w <> '')), 1)) AS BIGINT)
                   AS symbol_word_milli,
               CAST(round(1000.0 * len(list_filter(string_split({norm}, ' '),
                            w -> regexp_matches(w, '[a-z]')))
                   / GREATEST(len(list_filter(string_split({norm}, ' '),
                                              w -> w <> '')), 1)) AS BIGINT)
                   AS alpha_word_milli,
               CAST(len(regexp_extract_all({norm}, '\b{STOPWORDS_EN}\b'))
                   AS BIGINT) AS n_stopwords
        FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           round(mean_word_len, 6) AS mean_word_len,
           symbol_word_milli, alpha_word_milli, n_stopwords,
           n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
               AS pass_word_count,
           mean_word_len >= {GOPHER_MIN_MEAN_WLEN}
               AND mean_word_len <= {GOPHER_MAX_MEAN_WLEN} AS pass_word_length,
           symbol_word_milli <= {GOPHER_MAX_SYMBOL_WORD_MILLI}
               AS pass_symbol_ratio,
           alpha_word_milli >= {GOPHER_MIN_ALPHA_WORD_MILLI}
               AS pass_alpha_words,
           n_stopwords >= {GOPHER_MIN_STOPWORDS} AS pass_stopwords,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
            AND mean_word_len >= {GOPHER_MIN_MEAN_WLEN}
            AND mean_word_len <= {GOPHER_MAX_MEAN_WLEN}
            AND symbol_word_milli <= {GOPHER_MAX_SYMBOL_WORD_MILLI}
            AND alpha_word_milli >= {GOPHER_MIN_ALPHA_WORD_MILLI}
            AND n_stopwords >= {GOPHER_MIN_STOPWORDS}) AS gopher_keep
    FROM scored
    ORDER BY doc_id
    """


GOPHER_RULES_SQL = _gopher_rules_sql()


# --- corpus-frequency boilerplate filtering (CCNet line-dedup analog) -----------

BOILER_SEG_W = 8   # tokens per non-overlapping segment (the "line" unit)
BOILER_MIN_DF = 3  # a segment seen in >= this many distinct docs is boilerplate


def boilerplate_filter(
    docs: DataFrame, seg_w: int = BOILER_SEG_W, min_df: int = BOILER_MIN_DF
) -> DataFrame:
    """CCNet-style corpus-frequency boilerplate removal, at the segment grain:
    the corpus is cut into NON-overlapping ``seg_w``-token segments (the
    "line" unit for newline-free text), a segment appearing in >= ``min_df``
    distinct documents is template boilerplate (headers, footers, nav,
    license blocks), and each document reports how much of it survives.

    Two shuffles total, both key-aggregates with map-side partial agg:
    (1) segment-hash -> distinct-doc frequency, (2) doc_id re-aggregation
    after the hash-keyed frequency join. The 16-byte md5 segment key keeps
    the exchange narrow at corpus scale; there is NO pair expansion anywhere
    (frequency is aggregate-then-join), so a million-doc boilerplate segment
    costs one hot aggregate key, not a quadratic bucket. boiler_share_milli
    is exact integer half-up arithmetic — bit-stable cross-engine."""
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("t") - 1, F.lit(0)), F.lit(seg_w)
    )
    seg = F.slice("t", F.col("s") + 1, seg_w)
    segs = (
        docs.select("doc_id", F.split(_norm(F.col("text")), WS_RE).alias("t"))
        .select("doc_id", "t", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.md5(F.array_join(seg, " ")).alias("h"),
            F.size(seg).cast("long").alias("w"),
        )
    )
    seg_df = segs.groupBy("h").agg(F.count_distinct("doc_id").alias("df"))
    boiler = F.when(F.col("df") >= min_df, 1).otherwise(0)
    return (
        segs.join(seg_df, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(boiler).cast("long").alias("n_boiler_segments"),
            F.sum(F.when(F.col("df") < min_df, F.col("w")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_boiler_segments",
            "kept_tokens",
            F.expr(
                "CAST((2000 * n_boiler_segments + n_segments)"
                " DIV (2 * n_segments) AS BIGINT)"
            ).alias("boiler_share_milli"),
        )
        .orderBy("doc_id")
    )


def boilerplate_filter_sql(
    seg_w: int = BOILER_SEG_W, min_df: int = BOILER_MIN_DF
) -> str:
    return rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex({_norm_sql('text')}, '{WS_RE}') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t,
               unnest(generate_series(0, greatest(len(t) - 1, 0), {seg_w})) AS s
        FROM toks
    ),
    segs AS (
        SELECT doc_id,
               md5(array_to_string(t[s + 1 : s + {seg_w}], ' ')) AS h,
               len(t[s + 1 : s + {seg_w}]) AS w
        FROM starts
    ),
    seg_df AS (
        SELECT h, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY h
    )
    SELECT s.doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN d.df >= {min_df} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler_segments,
           CAST(SUM(CASE WHEN d.df < {min_df} THEN w ELSE 0 END) AS BIGINT)
               AS kept_tokens,
           CAST((2000 * SUM(CASE WHEN d.df >= {min_df} THEN 1 ELSE 0 END)
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS boiler_share_milli
    FROM segs s JOIN seg_df d USING (h)
    GROUP BY s.doc_id
    ORDER BY doc_id
    """


# --- fixed-weight linear quality classifier -------------------------------------

CLF_W_MOD = 2001  # token weights in [0, 2000] milli, recentred by -1000


def classifier_scores(docs: DataFrame) -> DataFrame:
    """FastText-style linear quality classifier with a FIXED hashed-weight
    table (the fineweb/DCLM shape: a pretrained linear model over hashed
    token features scores every document; training happens offline, scoring
    is the corpus-scale job). The weight of a token is a deterministic
    md5-derived integer in [0, 2000] milli; the document logit is the mean
    token weight recentred by 1000 — exact integer half-up arithmetic on
    NON-NEGATIVE operands (integer div semantics diverge cross-engine below
    zero), so the score is bit-stable.

    Entirely narrow: tokenize, per-element hash->weight lookup, and the
    array-fold sum are zero-shuffle row expressions in whole-stage codegen;
    a real weight table swaps the hash for a broadcast map join without
    changing the plan shape."""
    from .hashing import md5_int

    toks = F.split(_norm(F.col("text")), WS_RE)
    wsum = F.aggregate(
        F.transform(F.col("t"), lambda t: md5_int(t) % CLF_W_MOD),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )
    return (
        docs.select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            wsum.alias("wsum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.expr("CAST((2 * wsum + n_tokens) DIV (2 * n_tokens) AS BIGINT)")
                - F.lit(1000)
            ).alias("logit_milli"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "logit_milli",
            (F.col("logit_milli") > 0).alias("clf_keep"),
        )
        .orderBy("doc_id")
    )


def _classifier_scores_sql() -> str:
    from .hashing import md5_int_sql

    w = f"({md5_int_sql('t')} % {CLF_W_MOD})"
    return rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex({_norm_sql('text')}, '{WS_RE}') AS t
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               len(t) AS n_tokens,
               CAST(list_sum(list_transform(t, t -> {w})) AS BIGINT) AS wsum
        FROM toks
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((2 * wsum + n_tokens) // (2 * n_tokens) AS BIGINT) - 1000
               AS logit_milli,
           (CAST((2 * wsum + n_tokens) // (2 * n_tokens) AS BIGINT) - 1000) > 0
               AS clf_keep
    FROM scored
    ORDER BY doc_id
    """


CLASSIFIER_SCORES_SQL = _classifier_scores_sql()


# --- k-anonymity generalization audit -------------------------------------------

KANON_K = 5


def k_anonymity(docs: DataFrame, k: int = KANON_K) -> DataFrame:
    """k-anonymity audit with one generalization level over the
    (lang, source) quasi-identifier — the release-governance gate a corpus
    passes before distribution: a (lang, source) group smaller than ``k``
    re-identifies its members, so its source generalizes to '*' (level 1);
    if even the lang-level group is small the row is suppress-only
    (level 2).

    Two key aggregates (full grain + lang grain, both map-side combined)
    and one broadcast-sized equi-join between them — the output is
    |lang × source| rows regardless of corpus size."""
    g0 = docs.groupBy("lang", "source").agg(F.count("*").alias("group_n"))
    g1 = docs.groupBy("lang").agg(F.count("*").alias("lang_n"))
    level = (
        F.when(F.col("group_n") >= k, 0)
        .when(F.col("lang_n") >= k, 1)
        .otherwise(2)
        .cast("int")
    )
    return (
        g0.join(F.broadcast(g1), "lang")
        .select(
            "lang",
            "source",
            "group_n",
            level.alias("anonymity_level"),
            F.when(level == 0, F.col("source")).otherwise(F.lit("*")).alias(
                "released_source"
            ),
        )
        .orderBy("lang", "source")
    )


def k_anonymity_sql(k: int = KANON_K) -> str:
    return f"""
    WITH g0 AS (
        SELECT lang, source, COUNT(*) AS group_n
        FROM documents GROUP BY lang, source
    ),
    g1 AS (
        SELECT lang, COUNT(*) AS lang_n FROM documents GROUP BY lang
    ),
    lev AS (
        SELECT g0.lang, g0.source, g0.group_n,
               CAST(CASE WHEN g0.group_n >= {k} THEN 0
                         WHEN g1.lang_n >= {k} THEN 1
                         ELSE 2 END AS INT) AS anonymity_level
        FROM g0 JOIN g1 USING (lang)
    )
    SELECT lang, source, group_n, anonymity_level,
           CASE WHEN anonymity_level = 0 THEN source ELSE '*' END
               AS released_source
    FROM lev
    ORDER BY lang, source
    """


# --- C4-style first-occurrence span dedup ---------------------------------------


def first_occurrence_dedup(
    docs: DataFrame, seg_w: int = BOILER_SEG_W
) -> DataFrame:
    """C4-style span dedup: the corpus keeps only the FIRST occurrence (by
    (doc_id, position) order) of every ``seg_w``-token segment and every
    later copy is dropped — unlike the boilerplate df-threshold filter,
    which removes popular segments from ALL documents, this preserves one
    canonical copy (the C4 three-sentence-span rule re-expressed on the
    segment grain).

    Two shuffles: segment-hash -> min (doc_id, position) struct aggregate
    (an order-free MIN, so map-side partial agg applies), then the hash-
    keyed ownership join and a doc_id re-aggregation. No pair expansion; a
    segment duplicated a million times costs one hot MIN key."""
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("t") - 1, F.lit(0)), F.lit(seg_w)
    )
    seg = F.slice("t", F.col("s") + 1, seg_w)
    segs = (
        docs.select("doc_id", F.split(_norm(F.col("text")), WS_RE).alias("t"))
        .select("doc_id", "t", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.col("s").cast("long").alias("s"),
            F.md5(F.array_join(seg, " ")).alias("h"),
            F.size(seg).cast("long").alias("w"),
        )
    )
    # lexicographic (doc_id, s) min via an exact integer key: positions are
    # segment starts < 1e6 by construction, so doc_id*1e6 + s is collision-free
    key = F.col("doc_id") * F.lit(1_000_000) + F.col("s")
    firsts = segs.groupBy("h").agg(F.min(key).alias("first_key"))
    kept = key == F.col("first_key")
    return (
        segs.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(kept.cast("int")).cast("long").alias("n_kept"),
            F.sum(F.when(kept, F.col("w")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_kept",
            "kept_tokens",
            F.expr(
                "CAST((2000 * n_kept + n_segments)"
                " DIV (2 * n_segments) AS BIGINT)"
            ).alias("retained_milli"),
        )
        .orderBy("doc_id")
    )


def first_occurrence_dedup_sql(seg_w: int = BOILER_SEG_W) -> str:
    return rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex({_norm_sql('text')}, '{WS_RE}') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t,
               unnest(generate_series(0, greatest(len(t) - 1, 0), {seg_w})) AS s
        FROM toks
    ),
    segs AS (
        SELECT doc_id, CAST(s AS BIGINT) AS s,
               md5(array_to_string(t[s + 1 : s + {seg_w}], ' ')) AS h,
               len(t[s + 1 : s + {seg_w}]) AS w
        FROM starts
    ),
    firsts AS (
        SELECT h, MIN(doc_id * 1000000 + s) AS first_key FROM segs GROUP BY h
    )
    SELECT g.doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN g.doc_id * 1000000 + g.s = f.first_key
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN g.doc_id * 1000000 + g.s = f.first_key
                         THEN w ELSE 0 END) AS BIGINT) AS kept_tokens,
           CAST((2000 * SUM(CASE WHEN g.doc_id * 1000000 + g.s = f.first_key
                                 THEN 1 ELSE 0 END)
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS retained_milli
    FROM segs g JOIN firsts f USING (h)
    GROUP BY g.doc_id
    ORDER BY doc_id
    """


# --- filter agreement (Cohen's kappa) -------------------------------------------


def filter_agreement(docs: DataFrame) -> DataFrame:
    """Cohen's kappa between the Gopher rule filter and the linear
    classifier — the judge-agreement / calibration metric every multi-filter
    curation pipeline reports (two keep/drop raters over the same corpus;
    kappa corrects raw agreement for chance). Composes gopher_rules and
    classifier_scores on their shared doc_id grain: one equi-join plus a
    single global 2x2 aggregate.

    kappa = (N·(a+d) − pe) / (N² − pe) with pe = (a+b)(a+c) + (c+d)(b+d),
    all exact integers; the milli rounding is signed half-up away from zero
    built from abs/sign so the truncating integer division agrees
    cross-engine on negative kappas. Degenerate raters (pe = N²) yield
    NULL kappa."""
    g = gopher_rules(docs).select("doc_id", "gopher_keep")
    c = classifier_scores(docs).select("doc_id", "clf_keep")
    cell = lambda gk, ck: F.sum(
        ((F.col("gopher_keep") == gk) & (F.col("clf_keep") == ck)).cast("long")
    )
    counts = (
        g.join(c, "doc_id")
        .agg(
            F.count("*").alias("n_docs"),
            cell(True, True).alias("both_keep"),
            cell(True, False).alias("gopher_only"),
            cell(False, True).alias("clf_only"),
            cell(False, False).alias("both_drop"),
        )
    )
    pe = (F.col("both_keep") + F.col("gopher_only")) * (
        F.col("both_keep") + F.col("clf_only")
    ) + (F.col("clf_only") + F.col("both_drop")) * (
        F.col("gopher_only") + F.col("both_drop")
    )
    num = F.col("n_docs") * (F.col("both_keep") + F.col("both_drop")) - pe
    den = F.col("n_docs") * F.col("n_docs") - pe
    kappa = F.when(
        den > 0,
        F.signum(num).cast("long")
        * F.expr(
            "CAST((2000 * abs(__num) + __den) DIV (2 * __den) AS BIGINT)"
        ),
    )
    return (
        counts.withColumn("__num", num)
        .withColumn("__den", den)
        .select(
            "n_docs",
            "both_keep",
            "gopher_only",
            "clf_only",
            "both_drop",
            F.expr(
                "CAST((2000 * (both_keep + both_drop) + n_docs)"
                " DIV (2 * n_docs) AS BIGINT)"
            ).alias("agreement_milli"),
            kappa.alias("kappa_milli"),
        )
    )


def _filter_agreement_sql() -> str:
    return f"""
    WITH g AS (
        SELECT doc_id, gopher_keep FROM ({_gopher_rules_sql()})
    ),
    c AS (
        SELECT doc_id, clf_keep FROM ({_classifier_scores_sql()})
    ),
    counts AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN gopher_keep AND clf_keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_keep,
               CAST(SUM(CASE WHEN gopher_keep AND NOT clf_keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS gopher_only,
               CAST(SUM(CASE WHEN NOT gopher_keep AND clf_keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS clf_only,
               CAST(SUM(CASE WHEN NOT gopher_keep AND NOT clf_keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_drop
        FROM g JOIN c USING (doc_id)
    ),
    kt AS (
        SELECT *,
               n_docs * (both_keep + both_drop)
                 - ((both_keep + gopher_only) * (both_keep + clf_only)
                    + (clf_only + both_drop) * (gopher_only + both_drop))
                   AS num,
               n_docs * n_docs
                 - ((both_keep + gopher_only) * (both_keep + clf_only)
                    + (clf_only + both_drop) * (gopher_only + both_drop))
                   AS den
        FROM counts
    )
    SELECT n_docs, both_keep, gopher_only, clf_only, both_drop,
           CAST((2000 * (both_keep + both_drop) + n_docs) // (2 * n_docs)
                AS BIGINT) AS agreement_milli,
           CASE WHEN den > 0 THEN
               CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END
                    * ((2000 * abs(num) + den) // (2 * den)) AS BIGINT)
           END AS kappa_milli
    FROM kt
    """


FILTER_AGREEMENT_SQL = _filter_agreement_sql()


# --- l-diversity audit ----------------------------------------------------------

LDIV_L = 3


def l_diversity(docs: DataFrame, l_min: int = LDIV_L) -> DataFrame:
    """l-diversity audit, the k-anonymity companion: a (lang, source) group
    is only safe to release if its SENSITIVE attribute (here the document
    length class — short/medium/long) takes at least ``l_min`` distinct
    values inside the group; a k-large but homogeneous group still leaks
    (everyone in it shares the sensitive value). One grouped
    count-distinct aggregate; output |lang × source| rows."""
    sens = (
        F.when(F.col("n_chars") < 100, "short")
        .when(F.col("n_chars") < 180, "medium")
        .otherwise("long")
    )
    return (
        docs.select("lang", "source", sens.alias("sv"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("group_n"),
            F.count_distinct("sv").alias("n_sensitive_values"),
        )
        .select(
            "lang",
            "source",
            "group_n",
            "n_sensitive_values",
            (F.col("n_sensitive_values") >= l_min).alias("l_diverse"),
        )
        .orderBy("lang", "source")
    )


def l_diversity_sql(l_min: int = LDIV_L) -> str:
    return f"""
    SELECT lang, source, COUNT(*) AS group_n,
           COUNT(DISTINCT CASE WHEN n_chars < 100 THEN 'short'
                               WHEN n_chars < 180 THEN 'medium'
                               ELSE 'long' END) AS n_sensitive_values,
           COUNT(DISTINCT CASE WHEN n_chars < 100 THEN 'short'
                               WHEN n_chars < 180 THEN 'medium'
                               ELSE 'long' END) >= {l_min} AS l_diverse
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """


# --- t-closeness ---------------------------------------------------------------

TCLOSE_T_MILLI = 150


def t_closeness(docs: DataFrame, t_milli: int = TCLOSE_T_MILLI) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third rung of the release-governance ladder after [[k-anonymity]] and
    l-diversity: a quasi-identifier block (``source``) passes only if its
    SENSITIVE-attribute (``lang``) distribution stays within ``t`` of the
    corpus-wide distribution. For a nominal attribute the earth-mover
    distance reduces to total variation: TV = ½·Σ_l |p_bl − p_l|. Output:
    (source, n_docs, tv_milli, meets_t).

    Exactness: with p_bl = c_bl/n_b and p_l = c_l/N both ratios of exact
    integers, ½Σ|p_bl − p_l| = Σ|c_bl·N − c_l·n_b| / (2·n_b·N) — one
    integer numerator (absent (block, lang) cells contribute c_l·n_b via
    the dense grid), one half-up milli division at the end. No float ever
    crosses the engine boundary.

    Scale shape: two bounded aggregates (block grain, lang grain) densified
    into the |blocks|×|langs| grid by a broadcast cross of the tiny lang
    margin — grid size is governance-bounded, never corpus-sized."""
    per_cell = docs.groupBy("source", "lang").agg(F.count("*").alias("c_bl"))
    per_src = docs.groupBy("source").agg(F.count("*").alias("n_b"))
    per_lang = docs.groupBy("lang").agg(F.count("*").alias("c_l"))
    total = docs.agg(F.count("*").alias("n_tot"))
    grid = (
        per_src.crossJoin(F.broadcast(per_lang))
        .crossJoin(F.broadcast(total))
        .join(per_cell, ["source", "lang"], "left")
        .withColumn("c_bl", F.coalesce("c_bl", F.lit(0)))
    )
    return (
        grid.groupBy("source")
        .agg(
            F.max("n_b").alias("n_docs"),
            F.sum(
                F.abs(F.col("c_bl") * F.col("n_tot") - F.col("c_l") * F.col("n_b"))
            ).alias("num"),
            F.max(F.col("n_b") * F.col("n_tot")).alias("den2"),
        )
        .select(
            "source",
            "n_docs",
            F.expr("CAST((1000 * num + den2) DIV (2 * den2) AS BIGINT)").alias(
                "tv_milli"
            ),
        )
        .withColumn(
            "meets_t",
            F.when(F.col("tv_milli") <= t_milli, 1).otherwise(0).cast("int"),
        )
        .orderBy("source")
    )


def t_closeness_sql(t_milli: int = TCLOSE_T_MILLI) -> str:
    return f"""
        WITH per_cell AS (
            SELECT source, lang, COUNT(*) AS c_bl
            FROM documents GROUP BY source, lang
        ),
        per_src AS (
            SELECT source, COUNT(*) AS n_b FROM documents GROUP BY source
        ),
        per_lang AS (
            SELECT lang, COUNT(*) AS c_l FROM documents GROUP BY lang
        ),
        total AS (SELECT COUNT(*) AS n_tot FROM documents),
        grid AS (
            SELECT s.source, l.lang, s.n_b, l.c_l, t.n_tot,
                   COALESCE(c.c_bl, 0) AS c_bl
            FROM per_src s
            CROSS JOIN per_lang l
            CROSS JOIN total t
            LEFT JOIN per_cell c ON c.source = s.source AND c.lang = l.lang
        ),
        agg AS (
            SELECT source, MAX(n_b) AS n_docs,
                   SUM(ABS(c_bl * n_tot - c_l * n_b)) AS num,
                   MAX(n_b * n_tot) AS den2
            FROM grid GROUP BY source
        )
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               CAST((1000 * num + den2) // (2 * den2) AS BIGINT) AS tv_milli,
               CAST(CASE WHEN (1000 * num + den2) // (2 * den2) <= {t_milli}
                    THEN 1 ELSE 0 END AS INT) AS meets_t
        FROM agg
        ORDER BY source
    """


# --- classifier calibration (reliability + ECE) ----------------------------------

CALIB_LABEL_CHARS = 300  # "long-form" outcome the score is judged against


def classifier_calibration(docs: DataFrame) -> DataFrame:
    """Reliability diagram + expected calibration error for the linear
    quality classifier: scores map to a pseudo-probability, documents fall
    into 10 confidence bins, and each bin compares mean predicted
    confidence against the observed rate of the outcome (long-form,
    n_chars >= {CALIB_LABEL_CHARS}): (bin, n_docs, conf_milli, acc_milli,
    gap_milli, ece_milli) — ece_milli is the corpus ECE
    Σ n_b·|acc−conf| / N repeated on every row of the 10-row panel.

    The deploy gate for any learned filter: a quality score can RANK well
    and still lie about its confidence, and ECE is the number that says
    so (Guo et al., ICML 2017). All arithmetic is exact-integer milli with
    half-up division; binning is integer p DIV 100.

    Scale shape: scoring is the zero-shuffle classifier expression; the
    panel is one 10-row aggregate plus windows over those 10 rows."""
    from .hashing import md5_int

    toks = F.split(_norm(F.col("text")), WS_RE)
    wsum = F.aggregate(
        F.transform(F.col("t"), lambda t: md5_int(t) % CLF_W_MOD),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )
    scored = (
        docs.select("doc_id", "n_chars", toks.alias("t"))
        .select(
            "doc_id",
            "n_chars",
            F.size("t").cast("long").alias("n_tokens"),
            wsum.alias("wsum"),
        )
        .select(
            "n_chars",
            (
                F.expr("CAST((2 * wsum + n_tokens) DIV (2 * n_tokens) AS BIGINT)")
                - F.lit(1000)
            ).alias("logit_milli"),
        )
        .select(
            F.expr(
                "LEAST(CAST(1000 AS BIGINT),"
                " GREATEST(CAST(0 AS BIGINT), 500 + logit_milli))"
            ).alias("p_milli"),
            F.when(F.col("n_chars") >= CALIB_LABEL_CHARS, 1)
            .otherwise(0)
            .cast("long")
            .alias("label"),
        )
    )
    binned = scored.groupBy(
        F.expr("LEAST(CAST(9 AS BIGINT), p_milli DIV 100)").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("p_milli").alias("p_sum"),
        F.sum("label").alias("pos"),
    )
    g = Window.partitionBy()
    panel = binned.select(
        "bin",
        "n_docs",
        F.expr("CAST((2 * p_sum + n_docs) DIV (2 * n_docs) AS BIGINT)").alias(
            "conf_milli"
        ),
        F.expr("CAST((2000 * pos + n_docs) DIV (2 * n_docs) AS BIGINT)").alias(
            "acc_milli"
        ),
    ).withColumn("gap_milli", F.abs(F.col("acc_milli") - F.col("conf_milli")))
    return (
        panel.withColumn(
            "ece_milli",
            F.expr(
                "CAST(SUM(n_docs * gap_milli) OVER () DIV SUM(n_docs) OVER ()"
                " AS BIGINT)"
            ),
        )
        .orderBy("bin")
    )


def classifier_calibration_sql() -> str:
    from .hashing import md5_int_sql

    w = f"({md5_int_sql('t')} % {CLF_W_MOD})"
    return rf"""
    WITH toks AS (
        SELECT doc_id, n_chars,
               string_split_regex({_norm_sql('text')}, '{WS_RE}') AS t
        FROM documents
    ),
    raw AS (
        SELECT n_chars, len(t) AS n_tokens,
               CAST(list_sum(list_transform(t, t -> {w})) AS BIGINT) AS wsum
        FROM toks
    ),
    scored AS (
        SELECT LEAST(CAST(1000 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
                   500 + CAST((2 * wsum + n_tokens) // (2 * n_tokens)
                              AS BIGINT) - 1000)) AS p_milli,
               CASE WHEN n_chars >= {CALIB_LABEL_CHARS} THEN 1 ELSE 0 END
                   AS label
        FROM raw
    ),
    binned AS (
        SELECT LEAST(CAST(9 AS BIGINT), p_milli // 100) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               SUM(p_milli) AS p_sum, SUM(label) AS pos
        FROM scored GROUP BY 1
    ),
    panel AS (
        SELECT bin, n_docs,
               CAST((2 * p_sum + n_docs) // (2 * n_docs) AS BIGINT)
                   AS conf_milli,
               CAST((2000 * pos + n_docs) // (2 * n_docs) AS BIGINT)
                   AS acc_milli
        FROM binned
    )
    SELECT bin, n_docs, conf_milli, acc_milli,
           ABS(acc_milli - conf_milli) AS gap_milli,
           CAST(SUM(n_docs * ABS(acc_milli - conf_milli)) OVER ()
                // SUM(n_docs) OVER () AS BIGINT) AS ece_milli
    FROM panel
    ORDER BY bin
    """


# --- encoding profile ---------------------------------------------------------------


def encoding_profile(docs: DataFrame) -> DataFrame:
    """Byte-vs-character encoding audit per language: UTF-8 bytes per
    character and the multibyte density — the ingest check that catches
    mojibake (Latin text suddenly 2 bytes/char), mislabeled languages
    (a "zh" source at 1.0 bytes/char), and the storage-cost input for
    byte-budgeted shards. Output per lang: (lang, n_docs, chars, bytes,
    bytes_per_char_milli, multibyte_milli).

    Exact integers: bytes via octet_length of the UTF-8 encoding, the
    two rates half-up milli.

    Scale shape: narrow per-row projection + bounded lang rollup."""
    graded = docs.select(
        "lang",
        F.length("text").cast("long").alias("chars"),
        F.octet_length("text").cast("long").alias("bytes"),
    )
    return (
        graded.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("chars"),
            F.sum("bytes").cast("long").alias("bytes"),
        )
        .select(
            "lang",
            "n_docs",
            "chars",
            "bytes",
            F.expr(
                "CASE WHEN chars > 0 THEN"
                " CAST((2000 * bytes + chars) DIV (2 * chars) AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("bytes_per_char_milli"),
            F.expr(
                "CASE WHEN chars > 0 THEN"
                " CAST(1000 * (bytes - chars) DIV chars AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("multibyte_milli"),
        )
        .orderBy("lang")
    )


ENCODING_PROFILE_SQL = """
    WITH graded AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS chars,
               CAST(octet_length(encode(text)) AS BIGINT) AS bytes
        FROM documents
    ),
    panel AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(chars) AS BIGINT) AS chars,
               CAST(SUM(bytes) AS BIGINT) AS bytes
        FROM graded GROUP BY lang
    )
    SELECT lang, n_docs, chars, bytes,
           CASE WHEN chars > 0 THEN
                CAST((2000 * bytes + chars) // (2 * chars) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS bytes_per_char_milli,
           CASE WHEN chars > 0 THEN
                CAST(1000 * (bytes - chars) // chars AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS multibyte_milli
    FROM panel
    ORDER BY lang
"""


# --- differential-privacy-style noisy counts ----------------------------------------

DP_EPSILON_MILLI = 1000  # epsilon = 1.0, sensitivity 1 -> Laplace scale b = 1


def dp_noisy_counts(docs: DataFrame, epsilon_milli: int = DP_EPSILON_MILLI) -> DataFrame:
    """Laplace-mechanism release of the per-(lang, source) document counts —
    the governance primitive for publishing corpus composition without
    exposing exact membership (a count's ±1 neighborhood is ε-indistinguishable
    at scale b = sensitivity/ε = 1000/epsilon_milli).

    DETERMINISM NOTE (the testable stand-in): the Laplace draw uses the
    inverse-CDF on a hash-uniform u = (md5(lang||source) + 0.5) / 2^60
    instead of a cryptographic RNG — same magnitude distribution across
    groups, bit-reproducible in both engines, and exactly what the DuckDB
    oracle recomputes. A production release swaps ONLY the uniform source;
    the mechanism, scale, and post-processing are this code.

    Output per group: (lang, source, true_n, noise_milli, noisy_n) — true_n
    ships here for auditability of the fixture release; a real publication
    drops it.

    Scale shape: one bounded (lang, source) aggregate + narrow per-row hash
    math; zero extra shuffles."""
    from .hashing import md5_int

    b_milli = F.lit(1000 * 1000).cast("double") / F.lit(epsilon_milli).cast("double")
    grp = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("true_n")
    )
    u = (
        md5_int(F.concat_ws("|", F.col("lang"), F.col("source"))).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    centered = u - F.lit(0.5)
    noise_milli = F.round(
        -b_milli
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    ).cast("long")
    return (
        grp.select(
            "lang",
            "source",
            "true_n",
            noise_milli.alias("noise_milli"),
        )
        .select(
            "lang",
            "source",
            "true_n",
            "noise_milli",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("true_n")
                + F.expr(
                    "CAST(CASE WHEN noise_milli < 0 THEN -((-noise_milli + 500) DIV 1000)"
                    " ELSE (noise_milli + 500) DIV 1000 END AS BIGINT)"
                ),
            ).alias("noisy_n"),
        )
        .orderBy("lang", "source")
    )


def dp_noisy_counts_sql(epsilon_milli: int = DP_EPSILON_MILLI) -> str:
    from .hashing import md5_int_sql

    h = md5_int_sql("concat_ws('|', lang, source)")
    return f"""
        WITH grp AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS true_n
            FROM documents GROUP BY lang, source
        ),
        noised AS (
            SELECT lang, source, true_n,
                   CAST(round(
                       -(1000.0e0 * 1000.0e0 / {epsilon_milli})
                       * sign(({h} + 0.5e0) / 1152921504606846976.0e0 - 0.5e0)
                       * ln(1.0e0 - 2.0e0 * abs(({h} + 0.5e0) / 1152921504606846976.0e0
                                             - 0.5e0))
                   ) AS BIGINT) AS noise_milli
            FROM grp
        )
        SELECT lang, source, true_n, noise_milli,
               GREATEST(CAST(0 AS BIGINT),
                        true_n + CAST(CASE WHEN noise_milli < 0
                                      THEN -((-noise_milli + 500) // 1000)
                                      ELSE (noise_milli + 500) // 1000 END
                                      AS BIGINT)) AS noisy_n
        FROM noised
        ORDER BY lang, source
    """


def brier_decomposition(docs: DataFrame) -> DataFrame:
    """Murphy decomposition of the quality classifier's Brier score over
    the 10 calibration bins: one row (n_docs, brier_micro, rel_micro,
    res_micro, unc_micro, resid_micro).

    classifier_calibration reports ECE (an L1 story); the Brier
    decomposition is the proper-scoring-rule account: BS = REL - RES + UNC
    where reliability penalizes miscalibrated bins, resolution rewards
    bins that separate the base rate, and uncertainty is the irreducible
    o(1-o). The identity holds exactly only when forecasts are constant
    within bins, so the residual (BS - REL + RES - UNC, the within-bin
    variance term the binning hides) is REPORTED rather than assumed zero.

    Exactness: per-doc squared errors (p_milli - 1000*label)^2 are exact
    BIGINTs; REL's per-bin term (p_sum - 1000*pos)^2 / n_b and RES's
    n_b*(acc - base)^2 quantize per bin before the 10-row sums; half-up
    integer division closes BS; one double chain at the 1-row boundary for
    REL/RES/UNC. Same scorer and binning as classifier_calibration.

    Scale shape: the zero-shuffle classifier expression, one 10-row bin
    aggregate, one 1-row combine."""
    from .hashing import md5_int

    toks = F.split(_norm(F.col("text")), WS_RE)
    wsum = F.aggregate(
        F.transform(F.col("t"), lambda t: md5_int(t) % CLF_W_MOD),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )
    scored = (
        docs.select("doc_id", "n_chars", toks.alias("t"))
        .select(
            "n_chars",
            F.size("t").cast("long").alias("n_tokens"),
            wsum.alias("wsum"),
        )
        .select(
            "n_chars",
            (
                F.expr("CAST((2 * wsum + n_tokens) DIV (2 * n_tokens) AS BIGINT)")
                - F.lit(1000)
            ).alias("logit_milli"),
        )
        .select(
            F.expr(
                "LEAST(CAST(1000 AS BIGINT),"
                " GREATEST(CAST(0 AS BIGINT), 500 + logit_milli))"
            ).alias("p_milli"),
            F.when(F.col("n_chars") >= CALIB_LABEL_CHARS, 1)
            .otherwise(0)
            .cast("long")
            .alias("label"),
        )
    )
    binned = scored.groupBy(
        F.expr("LEAST(CAST(9 AS BIGINT), p_milli DIV 100)").alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("p_milli").cast("long").alias("p_sum"),
        F.sum("label").cast("long").alias("pos"),
        F.sum(
            (F.col("p_milli") - 1000 * F.col("label"))
            * (F.col("p_milli") - 1000 * F.col("label"))
        )
        .cast("long")
        .alias("sq_err"),
    )
    tot = binned.agg(
        F.sum("n_b").cast("long").alias("n_docs"),
        F.sum("pos").cast("long").alias("pos_all"),
        F.sum("sq_err").cast("long").alias("sq_all"),
    )
    terms = binned.crossJoin(F.broadcast(tot)).select(
        "n_docs",
        "pos_all",
        "sq_all",
        # REL term in micro*N units: (p_sum - 1000*pos)^2 / n_b
        F.expr(
            "CAST(round(CAST((p_sum - 1000 * pos) AS DOUBLE)"
            " * (p_sum - 1000 * pos) / n_b) AS BIGINT)"
        ).alias("rel_t"),
        # RES term in micro*N units: n_b * (1000*pos/n_b - 1000*pos_all/n_docs)^2
        F.expr(
            "CAST(round(n_b * pow(1000.0 * pos / n_b"
            " - 1000.0 * pos_all / n_docs, 2)) AS BIGINT)"
        ).alias("res_t"),
    )
    agg = terms.groupBy("n_docs", "pos_all", "sq_all").agg(
        F.sum("rel_t").cast("long").alias("rel_num"),
        F.sum("res_t").cast("long").alias("res_num"),
    )
    return agg.select(
        "n_docs",
        F.expr("CAST((2 * sq_all + n_docs) DIV (2 * n_docs) AS BIGINT)").alias(
            "brier_micro"
        ),
        F.expr("CAST((2 * rel_num + n_docs) DIV (2 * n_docs) AS BIGINT)").alias(
            "rel_micro"
        ),
        F.expr("CAST((2 * res_num + n_docs) DIV (2 * n_docs) AS BIGINT)").alias(
            "res_micro"
        ),
        F.expr(
            "CAST(round(1e6 * (1.0 * pos_all / n_docs)"
            " * (1 - 1.0 * pos_all / n_docs)) AS BIGINT)"
        ).alias("unc_micro"),
    ).select(
        "n_docs",
        "brier_micro",
        "rel_micro",
        "res_micro",
        "unc_micro",
        (
            F.col("brier_micro")
            - F.col("rel_micro")
            + F.col("res_micro")
            - F.col("unc_micro")
        ).alias("resid_micro"),
    )


def brier_decomposition_sql() -> str:
    from .hashing import md5_int_sql

    w = f"({md5_int_sql('t')} % {CLF_W_MOD})"
    return rf"""
    WITH toks AS (
        SELECT doc_id, n_chars,
               string_split_regex({_norm_sql('text')}, '{WS_RE}') AS t
        FROM documents
    ),
    scored0 AS (
        SELECT n_chars,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(t, t -> {w})) AS BIGINT) AS wsum
        FROM toks
    ),
    scored AS (
        SELECT LEAST(CAST(1000 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
                   500 + (2 * wsum + n_tokens) // (2 * n_tokens) - 1000))
                   AS p_milli,
               CASE WHEN n_chars >= {CALIB_LABEL_CHARS} THEN 1 ELSE 0 END
                   AS label
        FROM scored0
    ),
    binned AS (
        SELECT LEAST(CAST(9 AS BIGINT), p_milli // 100) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(p_milli) AS BIGINT) AS p_sum,
               CAST(SUM(label) AS BIGINT) AS pos,
               CAST(SUM((p_milli - 1000 * label) * (p_milli - 1000 * label))
                   AS BIGINT) AS sq_err
        FROM scored GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_b) AS BIGINT) AS n_docs,
               CAST(SUM(pos) AS BIGINT) AS pos_all,
               CAST(SUM(sq_err) AS BIGINT) AS sq_all
        FROM binned
    ),
    terms AS (
        SELECT n_docs, pos_all, sq_all,
               CAST(round(CAST((p_sum - 1000 * pos) AS DOUBLE)
                    * (p_sum - 1000 * pos) / n_b) AS BIGINT) AS rel_t,
               CAST(round(n_b * pow(1000.0 * pos / n_b
                    - 1000.0 * pos_all / n_docs, 2)) AS BIGINT) AS res_t
        FROM binned CROSS JOIN tot
    ),
    agg AS (
        SELECT n_docs, pos_all, sq_all,
               CAST(SUM(rel_t) AS BIGINT) AS rel_num,
               CAST(SUM(res_t) AS BIGINT) AS res_num
        FROM terms GROUP BY n_docs, pos_all, sq_all
    )
    SELECT n_docs,
           CAST((2 * sq_all + n_docs) // (2 * n_docs) AS BIGINT) AS brier_micro,
           CAST((2 * rel_num + n_docs) // (2 * n_docs) AS BIGINT) AS rel_micro,
           CAST((2 * res_num + n_docs) // (2 * n_docs) AS BIGINT) AS res_micro,
           CAST(round(1e6 * (1.0 * pos_all / n_docs)
                * (1 - 1.0 * pos_all / n_docs)) AS BIGINT) AS unc_micro,
           CAST((2 * sq_all + n_docs) // (2 * n_docs)
                - (2 * rel_num + n_docs) // (2 * n_docs)
                + (2 * res_num + n_docs) // (2 * n_docs)
                - round(1e6 * (1.0 * pos_all / n_docs)
                        * (1 - 1.0 * pos_all / n_docs)) AS BIGINT)
               AS resid_micro
    FROM agg
    """


def classifier_auc(docs: DataFrame) -> DataFrame:
    """ROC AUC of the quality classifier against the long-form label: one
    row (n_pos, n_neg, auc_micro, gini_micro).

    classifier_calibration asks "does the score tell the truth about its
    confidence"; AUC asks the other deploy question — "does it RANK
    positives above negatives at all" (discrimination vs calibration; a
    model can ace either and flunk the other). Computed by the rank-sum
    identity AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with
    average ranks for ties, so it never enumerates pairs.

    Exactness: doubled average ranks (2*cum_before + m + 1) on the
    bounded p_milli score grid are exact BIGINTs (the wilcoxon device),
    so 2*R_pos is an exact integer sum and auc_micro is one rounded
    division. gini = 2*AUC - 1 rides the same integers. Same scorer and
    label as classifier_calibration.

    Scale shape: the zero-shuffle classifier expression, one score-grid
    aggregate (<=1001 rows), one cumulative window on that grid, one
    1-row reduction."""
    from .hashing import md5_int

    toks = F.split(_norm(F.col("text")), WS_RE)
    wsum = F.aggregate(
        F.transform(F.col("t"), lambda t: md5_int(t) % CLF_W_MOD),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )
    scored = (
        docs.select("doc_id", "n_chars", toks.alias("t"))
        .select(
            "n_chars",
            F.size("t").cast("long").alias("n_tokens"),
            wsum.alias("wsum"),
        )
        .select(
            F.expr(
                "LEAST(CAST(1000 AS BIGINT), GREATEST(CAST(0 AS BIGINT),"
                " 500 + (2 * wsum + n_tokens) DIV (2 * n_tokens) - 1000))"
            ).alias("p_milli"),
            F.when(F.col("n_chars") >= CALIB_LABEL_CHARS, 1)
            .otherwise(0)
            .cast("long")
            .alias("label"),
        )
    )
    grid = scored.groupBy("p_milli").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("label").cast("long").alias("pos"),
    )
    w = Window.orderBy("p_milli").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grid.select(
        "m",
        "pos",
        F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long").alias("cb"),
    )
    agg = ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("m") - F.col("pos")).cast("long").alias("n_neg"),
        F.sum(F.col("pos") * (2 * F.col("cb") + F.col("m") + 1))
        .cast("long")
        .alias("r2_pos"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN"
            " round(1e6 * (r2_pos - CAST(n_pos AS DOUBLE) * (n_pos + 1))"
            " / (2.0 * n_pos * n_neg)) ELSE 0 END AS BIGINT)"
        ).alias("auc_micro"),
    ).select(
        "n_pos",
        "n_neg",
        "auc_micro",
        (2 * F.col("auc_micro") - 1000000).alias("gini_micro"),
    )


def classifier_auc_sql() -> str:
    from .hashing import md5_int_sql

    w = f"({md5_int_sql('t')} % {CLF_W_MOD})"
    return rf"""
    WITH toks AS (
        SELECT n_chars,
               string_split_regex({_norm_sql('text')}, '{WS_RE}') AS t
        FROM documents
    ),
    scored0 AS (
        SELECT n_chars,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(t, t -> {w})) AS BIGINT) AS wsum
        FROM toks
    ),
    scored AS (
        SELECT LEAST(CAST(1000 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
                   500 + (2 * wsum + n_tokens) // (2 * n_tokens) - 1000))
                   AS p_milli,
               CASE WHEN n_chars >= {CALIB_LABEL_CHARS} THEN 1 ELSE 0 END
                   AS label
        FROM scored0
    ),
    grid AS (
        SELECT p_milli, CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(label) AS BIGINT) AS pos
        FROM scored GROUP BY p_milli
    ),
    ranked AS (
        SELECT m, pos,
               COALESCE(SUM(m) OVER (ORDER BY p_milli
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM grid
    ),
    agg AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(m - pos) AS BIGINT) AS n_neg,
               CAST(SUM(pos * (2 * cb + m + 1)) AS BIGINT) AS r2_pos
        FROM ranked
    )
    SELECT n_pos, n_neg,
           CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                round(1e6 * (r2_pos - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                / (2.0 * n_pos * n_neg)) ELSE 0 END AS BIGINT) AS auc_micro,
           2 * CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                round(1e6 * (r2_pos - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                / (2.0 * n_pos * n_neg)) ELSE 0 END AS BIGINT) - 1000000
               AS gini_micro
    FROM agg
    """


# --- OCR-garbage detection ----------------------------------------------------------------------

OCR_RUN_RE = r"[b-df-hj-np-tv-xz]{4,}"  # 4+ lowercase consonant run
OCR_FLIP_RE = r"[a-z][A-Z]"  # case flip inside a word
OCR_SYM_RE = r"[^A-Za-z0-9 ]"  # anything outside alnum+space
OCR_FLAG_MILLI = 500


def ocr_garbage_scores(docs: DataFrame) -> DataFrame:
    """OCR-junk screening per source: rows (source, n_docs,
    avg_garbage_milli, n_flagged) ordered by source.

    Scanned-document corpora inject a failure mode the fluency scorers
    miss: OCR noise reads as exotic-but-wordlike text (consonant
    smears 'rn'->'m' gone wrong, case flips mid-word, symbol debris).
    Three cheap signals, each the standard OCR-QA heuristic: density of
    4+ consonant runs, lowercase->uppercase flips inside words, and
    non-alphanumeric symbol load; garbage = 0.4*min(1, runs*20/tokens)
    + 0.3*min(1, flips*10/tokens) + 0.3*min(1, 5*symbols/chars).
    text_quality_scores judges fluency; this isolates the SCAN
    artifacts so a cleanup pass (not a quality cut) can be routed.

    Exactness: all three signals are exact integer counts off regexes;
    the bounded [0,1] combination quantizes to milli per doc before the
    per-source integer sum; one division at the emit.

    Scale shape: zero-shuffle regexp counting, one (source)
    aggregate."""
    runs = F.size(F.expr(f"regexp_extract_all(lower(text), '{OCR_RUN_RE}', 0)"))
    flips = F.size(F.expr(f"regexp_extract_all(text, '{OCR_FLIP_RE}', 0)"))
    syms = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), OCR_SYM_RE, "")
    )
    toks = F.size(F.split(_norm(F.col("text")), WS_RE))
    scored = docs.select(
        "source",
        runs.cast("long").alias("runs"),
        flips.cast("long").alias("flips"),
        syms.cast("long").alias("syms"),
        toks.cast("long").alias("toks"),
        F.length("text").cast("long").alias("chars"),
    ).select(
        "source",
        F.expr(
            "CAST(round(1000.0 * ("
            " 0.4e0 * least(1e0, CASE WHEN toks > 0 THEN 20e0 * runs / toks"
            "                         ELSE 0e0 END)"
            " + 0.3e0 * least(1e0, CASE WHEN toks > 0 THEN 10e0 * flips / toks"
            "                           ELSE 0e0 END)"
            " + 0.3e0 * least(1e0, CASE WHEN chars > 0 THEN 5e0 * syms / chars"
            "                           ELSE 0e0 END))) AS BIGINT)"
        ).alias("g_milli"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("g_milli").cast("long").alias("sg"),
            F.sum((F.col("g_milli") > OCR_FLAG_MILLI).cast("long"))
            .cast("long")
            .alias("n_flagged"),
        )
        .select(
            "source",
            "n_docs",
            F.expr(
                "CAST(round(CAST(sg AS DOUBLE) / n_docs) AS BIGINT)"
            ).alias("avg_garbage_milli"),
            "n_flagged",
        )
        .orderBy("source")
    )


def ocr_garbage_scores_sql() -> str:
    return f"""
        WITH scored AS (
            SELECT source,
                   CAST(round(1000.0 * (
                     0.4e0 * least(1e0, CASE WHEN toks > 0
                         THEN 20e0 * runs / toks ELSE 0e0 END)
                     + 0.3e0 * least(1e0, CASE WHEN toks > 0
                         THEN 10e0 * flips / toks ELSE 0e0 END)
                     + 0.3e0 * least(1e0, CASE WHEN chars > 0
                         THEN 5e0 * syms / chars ELSE 0e0 END)))
                     AS BIGINT) AS g_milli
            FROM (
                SELECT source,
                       CAST(len(regexp_extract_all(lower(text),
                           '{OCR_RUN_RE}')) AS BIGINT) AS runs,
                       CAST(len(regexp_extract_all(text,
                           '{OCR_FLIP_RE}')) AS BIGINT) AS flips,
                       CAST(length(text) - length(regexp_replace(text,
                           '{OCR_SYM_RE}', '', 'g')) AS BIGINT) AS syms,
                       CAST(len(string_split_regex({_norm_sql('text')},
                           '{WS_RE}')) AS BIGINT) AS toks,
                       CAST(length(text) AS BIGINT) AS chars
                FROM documents
            )
        )
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(round(CAST(SUM(g_milli) AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS avg_garbage_milli,
               CAST(SUM(CASE WHEN g_milli > {OCR_FLAG_MILLI} THEN 1 ELSE 0
                   END) AS BIGINT) AS n_flagged
        FROM scored
        GROUP BY source
        ORDER BY source
    """


# --- Average precision (PR-AUC) of the quality classifier ---------------------------------------


def classifier_pr_auc(docs: DataFrame) -> DataFrame:
    """Average precision (PR-AUC) of the quality classifier against the
    long-form label: one row (n_pos, n_neg, ap_micro, baseline_micro).

    classifier_auc ranks pairs (ROC), which flatters a scorer on
    imbalanced labels — ROC AUC stays high while precision at the
    actual operating points collapses. Average precision is the
    imbalance-honest summary: AP = sum over descending score levels of
    (recall gain) * (precision at that level), i.e. the step-function
    area under the PR curve (the scikit-learn definition, tie-clean
    because levels — not rows — drive the steps). baseline = n_pos/n is
    the random-classifier AP, the floor to judge lift against. Same
    scorer and label as classifier_auc/classifier_calibration.

    Exactness: the score grid, its descending cumulatives (TP_cum,
    k_cum), and the per-level positives are exact BIGINTs; each level's
    pos_l * TP_cum / (n_pos * k_cum) term quantizes to micro before the
    <=1001-row integer sum.

    Scale shape: the zero-shuffle classifier expression, one score-grid
    aggregate (<=1001 rows), one descending cumulative window on that
    grid, one 1-row reduction."""
    from .hashing import md5_int

    toks = F.split(_norm(F.col("text")), WS_RE)
    wsum = F.aggregate(
        F.transform(F.col("t"), lambda t: md5_int(t) % CLF_W_MOD),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )
    scored = (
        docs.select("doc_id", "n_chars", toks.alias("t"))
        .select(
            "n_chars",
            F.size("t").cast("long").alias("n_tokens"),
            wsum.alias("wsum"),
        )
        .select(
            F.expr(
                "LEAST(CAST(1000 AS BIGINT), GREATEST(CAST(0 AS BIGINT),"
                " 500 + (2 * wsum + n_tokens) DIV (2 * n_tokens) - 1000))"
            ).alias("p_milli"),
            F.when(F.col("n_chars") >= CALIB_LABEL_CHARS, 1)
            .otherwise(0)
            .cast("long")
            .alias("label"),
        )
    )
    grid = scored.groupBy("p_milli").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("label").cast("long").alias("pos"),
    )
    wdesc = Window.orderBy(F.desc("p_milli")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cums = grid.select(
        "m",
        "pos",
        F.sum("m").over(wdesc).cast("long").alias("k_cum"),
        F.sum("pos").over(wdesc).cast("long").alias("tp_cum"),
    )
    tot = grid.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("m") - F.col("pos")).cast("long").alias("n_neg"),
    )
    terms = cums.crossJoin(F.broadcast(tot)).select(
        "n_pos",
        "n_neg",
        F.expr(
            "CAST(CASE WHEN n_pos > 0 THEN round(1e6"
            " * CAST(pos AS DOUBLE) * tp_cum"
            " / (CAST(n_pos AS DOUBLE) * k_cum)) ELSE 0 END AS BIGINT)"
        ).alias("term_micro"),
    )
    return terms.groupBy("n_pos", "n_neg").agg(
        F.sum("term_micro").cast("long").alias("ap_micro")
    ).select(
        "n_pos",
        "n_neg",
        "ap_micro",
        F.expr(
            "CAST(CASE WHEN n_pos + n_neg > 0 THEN round(1e6"
            " * CAST(n_pos AS DOUBLE) / (n_pos + n_neg))"
            " ELSE 0 END AS BIGINT)"
        ).alias("baseline_micro"),
    )


def classifier_pr_auc_sql() -> str:
    from .hashing import md5_int_sql

    w = f"({md5_int_sql('t')} % {CLF_W_MOD})"
    return rf"""
    WITH toks AS (
        SELECT n_chars,
               string_split_regex({_norm_sql('text')}, '{WS_RE}') AS t
        FROM documents
    ),
    scored0 AS (
        SELECT n_chars,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(t, t -> {w})) AS BIGINT) AS wsum
        FROM toks
    ),
    scored AS (
        SELECT LEAST(CAST(1000 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
                   500 + (2 * wsum + n_tokens) // (2 * n_tokens) - 1000))
                   AS p_milli,
               CASE WHEN n_chars >= {CALIB_LABEL_CHARS} THEN 1 ELSE 0 END
                   AS label
        FROM scored0
    ),
    grid AS (
        SELECT p_milli, CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(label) AS BIGINT) AS pos
        FROM scored GROUP BY p_milli
    ),
    cums AS (
        SELECT m, pos,
               CAST(SUM(m) OVER (ORDER BY p_milli DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS k_cum,
               CAST(SUM(pos) OVER (ORDER BY p_milli DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS tp_cum
        FROM grid
    ),
    tot AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(m - pos) AS BIGINT) AS n_neg
        FROM grid
    ),
    terms AS (
        SELECT n_pos, n_neg,
               CAST(CASE WHEN n_pos > 0 THEN round(1e6
                    * CAST(pos AS DOUBLE) * tp_cum
                    / (CAST(n_pos AS DOUBLE) * k_cum)) ELSE 0 END AS BIGINT)
                   AS term_micro
        FROM cums CROSS JOIN tot
    )
    SELECT n_pos, n_neg,
           CAST(SUM(term_micro) AS BIGINT) AS ap_micro,
           CAST(CASE WHEN n_pos + n_neg > 0 THEN round(1e6
                * CAST(n_pos AS DOUBLE) / (n_pos + n_neg))
                ELSE 0 END AS BIGINT) AS baseline_micro
    FROM terms
    GROUP BY n_pos, n_neg
    """


# --- Trained multinomial Naive Bayes language classifier -----------------------------------------

NB_TOP = 20  # confusion cells are bounded by |langs|^2 anyway


def naive_bayes_confusion(docs: DataFrame) -> DataFrame:
    """Train a multinomial Naive Bayes language classifier on the even-md5
    half of the corpus, score the odd half, report the confusion matrix:
    rows (actual_lang, predicted_lang, n_docs) ordered by (actual,
    predicted).

    text_lang_id is a FIXED heuristic and text_classifier_score carries
    FIXED weights; this one is TRAINED from the data — per-(lang, token)
    Laplace-smoothed log-likelihoods ln((c_tc + 1)/(tot_c + V)) plus
    ln priors, the argmax over classes per held-out doc. The entire
    train step is two relational aggregates, which is the point: at
    100 TB "fit a text classifier" is a groupBy, not a GPU job.

    Exactness: every per-token log term and each prior quantizes to
    integer micro BEFORE the per-(doc, class) sum, so the score is an
    exact integer regardless of aggregation order (the float-sum trap
    this repo's discipline exists for); argmax ties break to the
    lexicographically first class.

    Scale shape: one (lang, token) train aggregate, one broadcast of the
    <=|langs| class table + V/prior scalars, one token-keyed join of the
    exploded test side against the trained table, one (doc, class)
    aggregate, one bounded argmax window on the <=|docs|x|langs|
    relation, one confusion rollup."""
    from .hashing import md5_int

    base = docs.select(
        "doc_id",
        "lang",
        F.split(_norm(F.col("text")), WS_RE).alias("t"),
        (md5_int(F.col("doc_id").cast("string")) % 2 == 0).alias("is_train"),
    )
    train_toks = (
        base.where(F.col("is_train"))
        .select("lang", F.explode("t").alias("tok"))
        .where(F.col("tok") != "")
    )
    ctc = train_toks.groupBy("lang", "tok").agg(
        F.count("*").cast("long").alias("c")
    )
    totc = ctc.groupBy("lang").agg(F.sum("c").cast("long").alias("tot"))
    vocab = ctc.select("tok").distinct().agg(
        F.count("*").cast("long").alias("v")
    )
    prior = (
        base.where(F.col("is_train"))
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("nd"))
    )
    prior_tot = prior.agg(F.sum("nd").cast("long").alias("ndt"))
    classes = (
        prior.join(F.broadcast(totc), "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(prior_tot))
        .select(
            F.col("lang").alias("cls"),
            "tot",
            "v",
            F.expr(
                "CAST(round(1e6 * ln(CAST(nd AS DOUBLE) / ndt)) AS BIGINT)"
            ).alias("prior_micro"),
        )
    )
    test_toks = (
        base.where(~F.col("is_train"))
        .select("doc_id", "lang", F.explode("t").alias("tok"))
        .where(F.col("tok") != "")
    )
    terms = (
        test_toks.crossJoin(F.broadcast(classes))
        .join(
            ctc.select(
                F.col("lang").alias("cls"), "tok", F.col("c").alias("ct")
            ),
            ["cls", "tok"],
            "left",
        )
        .select(
            "doc_id",
            "lang",
            "cls",
            "prior_micro",
            F.expr(
                "CAST(round(1e6 * ln((COALESCE(ct, 0) + 1e0) / (tot + v)))"
                " AS BIGINT)"
            ).alias("term_micro"),
        )
    )
    scored = terms.groupBy("doc_id", "lang", "cls", "prior_micro").agg(
        F.sum("term_micro").cast("long").alias("ll")
    ).select(
        "doc_id",
        "lang",
        "cls",
        (F.col("ll") + F.col("prior_micro")).alias("score"),
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    pred = (
        scored.withColumn("rk", F.row_number().over(wd))
        .where(F.col("rk") == 1)
        .select("lang", F.col("cls").alias("predicted_lang"))
    )
    return (
        pred.groupBy(F.col("lang").alias("actual_lang"), "predicted_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("actual_lang", "predicted_lang")
    )


def naive_bayes_confusion_sql() -> str:
    from .hashing import md5_int_sql

    is_train = f"({md5_int_sql('CAST(doc_id AS VARCHAR)')} % 2 = 0)"
    return f"""
        WITH base AS (
            SELECT doc_id, lang,
                   string_split({_norm_sql('text')}, ' ') AS t,
                   {is_train} AS is_train
            FROM documents
        ),
        train_toks AS (
            SELECT lang, unnest(t) AS tok FROM base WHERE is_train
        ),
        ctc AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM train_toks WHERE tok <> '' GROUP BY lang, tok
        ),
        totc AS (
            SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM ctc GROUP BY lang
        ),
        vocab AS (
            SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM ctc
        ),
        prior AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd
            FROM base WHERE is_train GROUP BY lang
        ),
        prior_tot AS (
            SELECT CAST(SUM(nd) AS BIGINT) AS ndt FROM prior
        ),
        classes AS (
            SELECT prior.lang AS cls, tot, v,
                   CAST(round(1e6 * ln(CAST(nd AS DOUBLE) / ndt)) AS BIGINT)
                       AS prior_micro
            FROM prior JOIN totc USING (lang)
            CROSS JOIN vocab CROSS JOIN prior_tot
        ),
        test_toks AS (
            SELECT doc_id, lang, unnest(t) AS tok
            FROM base WHERE NOT is_train
        ),
        terms AS (
            SELECT tt.doc_id, tt.lang, cl.cls, cl.prior_micro,
                   CAST(round(1e6 * ln((COALESCE(ctc.c, 0) + 1e0)
                        / (cl.tot + cl.v))) AS BIGINT) AS term_micro
            FROM test_toks tt
            CROSS JOIN classes cl
            LEFT JOIN ctc ON ctc.lang = cl.cls AND ctc.tok = tt.tok
            WHERE tt.tok <> ''
        ),
        scored AS (
            SELECT doc_id, lang, cls,
                   CAST(SUM(term_micro) AS BIGINT) + prior_micro AS score
            FROM terms GROUP BY doc_id, lang, cls, prior_micro
        ),
        pred AS (
            SELECT lang, cls AS predicted_lang
            FROM (
                SELECT lang, cls, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rk
                FROM scored
            ) WHERE rk = 1
        )
        SELECT lang AS actual_lang, predicted_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred
        GROUP BY lang, predicted_lang
        ORDER BY actual_lang, predicted_lang
    """


# --- Held-out bigram perplexity ------------------------------------------------------------------


def heldout_bigram_perplexity(docs: DataFrame) -> DataFrame:
    """Laplace-smoothed bigram LM trained on the even-md5 half, held-out
    perplexity per language on the odd half: rows (lang, n_bigrams,
    avg_nll_micro, ppl_milli) ordered by lang.

    text_bigram_backoff and text_kneser_ney_bigrams TRAIN smoothers on
    the whole corpus; none of the LM devices yet report THE LM number —
    held-out perplexity. Per test bigram (w1, w2): nll = -ln((c(w1,w2)
    + 1) / (c(w1) + V)) with counts from the train half only and V the
    train unigram vocabulary; ppl = exp(mean nll). Rising ppl per lang
    flags the slice where the corpus under-trains its own language
    model — the data-mix signal DoReMi-style reweighting consumes.

    Exactness: per-bigram nll quantizes to integer micro before the
    per-lang sum (the order-free float-sum discipline); exp of the
    identical mean closes it in both engines.

    Scale shape: one train (w1, w2) + one train (w1) aggregate, the
    exploded test bigrams joined on those keys (one shuffle each), a
    1-row vocab broadcast, one (lang) rollup."""
    from .hashing import md5_int

    base = docs.select(
        "doc_id",
        "lang",
        F.split(_norm(F.col("text")), WS_RE).alias("t"),
        (md5_int(F.col("doc_id").cast("string")) % 2 == 0).alias("is_train"),
    )
    def bigrams(side):
        toks = base.where(side).select(
            "lang",
            F.posexplode("t").alias("p", "w1"),
            F.col("t").alias("t"),
        )
        return (
            toks.where(F.col("p") < F.size("t") - 1)
            .select(
                "lang",
                "w1",
                F.expr("t[p + 1]").alias("w2"),
            )
            .where((F.col("w1") != "") & (F.col("w2") != ""))
        )

    train_bi = bigrams(F.col("is_train"))
    cbi = train_bi.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("cb")
    )
    cuni = train_bi.groupBy("w1").agg(F.count("*").cast("long").alias("cu"))
    vocab = (
        base.where(F.col("is_train"))
        .select(F.explode("t").alias("w"))
        .where(F.col("w") != "")
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    test_bi = bigrams(~F.col("is_train"))
    terms = (
        test_bi.join(cbi, ["w1", "w2"], "left")
        .join(cuni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            F.expr(
                "CAST(round(1e6 * -ln((COALESCE(cb, 0) + 1e0)"
                " / (COALESCE(cu, 0) + v))) AS BIGINT)"
            ).alias("nll_micro"),
        )
    )
    return (
        terms.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("nll_micro").cast("long").alias("snll"),
        )
        .select(
            "lang",
            "n_bigrams",
            F.expr(
                "CAST(round(CAST(snll AS DOUBLE) / n_bigrams) AS BIGINT)"
            ).alias("avg_nll_micro"),
            F.expr(
                "CAST(round(1000.0 * exp(CAST(snll AS DOUBLE)"
                " / n_bigrams / 1e6)) AS BIGINT)"
            ).alias("ppl_milli"),
        )
        .orderBy("lang")
    )


def heldout_bigram_perplexity_sql() -> str:
    from .hashing import md5_int_sql

    is_train = f"({md5_int_sql('CAST(doc_id AS VARCHAR)')} % 2 = 0)"
    return f"""
        WITH base AS (
            SELECT doc_id, lang,
                   string_split({_norm_sql('text')}, ' ') AS t,
                   {is_train} AS is_train
            FROM documents
        ),
        train_bi AS (
            SELECT lang, t[p] AS w1, t[p + 1] AS w2
            FROM (
                SELECT lang, t,
                       unnest(generate_series(1, len(t) - 1)) AS p
                FROM base WHERE is_train
            )
            WHERE t[p] <> '' AND t[p + 1] <> ''
        ),
        cbi AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
            FROM train_bi GROUP BY w1, w2
        ),
        cuni AS (
            SELECT w1, CAST(COUNT(*) AS BIGINT) AS cu
            FROM train_bi GROUP BY w1
        ),
        vocab AS (
            SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
            FROM (
                SELECT unnest(t) AS w FROM base WHERE is_train
            ) WHERE w <> ''
        ),
        test_bi AS (
            SELECT lang, t[p] AS w1, t[p + 1] AS w2
            FROM (
                SELECT lang, t,
                       unnest(generate_series(1, len(t) - 1)) AS p
                FROM base WHERE NOT is_train
            )
            WHERE t[p] <> '' AND t[p + 1] <> ''
        ),
        terms AS (
            SELECT lang,
                   CAST(round(1e6 * -ln((COALESCE(cb, 0) + 1e0)
                        / (COALESCE(cu, 0) + v))) AS BIGINT) AS nll_micro
            FROM test_bi
            LEFT JOIN cbi USING (w1, w2)
            LEFT JOIN cuni USING (w1)
            CROSS JOIN vocab
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(round(CAST(SUM(nll_micro) AS DOUBLE) / COUNT(*))
                    AS BIGINT) AS avg_nll_micro,
               CAST(round(1000.0 * exp(CAST(SUM(nll_micro) AS DOUBLE)
                    / COUNT(*) / 1e6)) AS BIGINT) AS ppl_milli
        FROM terms
        GROUP BY lang
        ORDER BY lang
    """


# --- group-fairness audit of the quality classifier ------------------------------------


def fairness_audit(docs: DataFrame) -> DataFrame:
    """Group-fairness audit of the linear quality classifier across sources:
    demographic parity (per-source selection rate vs overall) and equalized
    odds (per-source TPR/FPR vs overall, truth = the Gopher rule conjunction).
    The pre-deployment review of any learned curation filter — a filter that
    passes aggregate precision but silently zeroes out one source is how a
    training corpus loses a domain.

    All rates are exact milli integers on non-negative operands (half-up
    integer division); gaps are plain integer differences against the 1-row
    broadcast overall. Sources with no true positives (or no true negatives)
    emit NULL TPR (FPR) rather than a fabricated rate.

    Scale: two zero-shuffle scoring passes share the corpus scan, one
    (source) aggregate, one 1-row overall broadcast."""
    pred = classifier_scores(docs).select("doc_id", "clf_keep")
    truth = gopher_rules(docs).select("doc_id", "gopher_keep")
    labeled = (
        docs.select("doc_id", "source")
        .join(pred, "doc_id")
        .join(truth, "doc_id")
        .select(
            "source",
            F.col("clf_keep").cast("int").alias("p"),
            F.col("gopher_keep").cast("int").alias("t"),
        )
    )
    def _rates(grouped: DataFrame) -> DataFrame:
        return grouped.select(
            "*",
            F.expr(
                "CAST((2 * 1000 * n_sel + n) DIV (2 * n) AS BIGINT)"
            ).alias("sel_milli"),
            F.expr(
                "CASE WHEN n_pos > 0 THEN CAST((2 * 1000 * n_tp + n_pos)"
                " DIV (2 * n_pos) AS BIGINT) END"
            ).alias("tpr_milli"),
            F.expr(
                "CASE WHEN n - n_pos > 0 THEN CAST((2 * 1000 * n_fp"
                " + (n - n_pos)) DIV (2 * (n - n_pos)) AS BIGINT) END"
            ).alias("fpr_milli"),
        )

    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum("p").cast("long").alias("n_sel"),
        F.sum("t").cast("long").alias("n_pos"),
        F.sum(F.col("p") * F.col("t")).cast("long").alias("n_tp"),
        F.sum(F.col("p") * (1 - F.col("t"))).cast("long").alias("n_fp"),
    ]
    per_source = _rates(labeled.groupBy("source").agg(*aggs))
    overall = _rates(labeled.groupBy().agg(*aggs)).select(
        F.col("sel_milli").alias("o_sel"),
        F.col("tpr_milli").alias("o_tpr"),
        F.col("fpr_milli").alias("o_fpr"),
    )
    return (
        per_source.crossJoin(F.broadcast(overall))
        .select(
            "source",
            "n",
            "sel_milli",
            "tpr_milli",
            "fpr_milli",
            (F.col("sel_milli") - F.col("o_sel")).alias("dp_gap_milli"),
            (F.col("tpr_milli") - F.col("o_tpr")).alias("tpr_gap_milli"),
            (F.col("fpr_milli") - F.col("o_fpr")).alias("fpr_gap_milli"),
        )
        .orderBy("source")
    )


def fairness_audit_sql() -> str:
    return f"""
    WITH pred AS (
        SELECT doc_id, clf_keep FROM ({_classifier_scores_sql()})
    ),
    truth AS (
        SELECT doc_id, gopher_keep FROM ({_gopher_rules_sql()})
    ),
    labeled AS (
        SELECT d.source,
               CASE WHEN p.clf_keep THEN 1 ELSE 0 END AS p,
               CASE WHEN t.gopher_keep THEN 1 ELSE 0 END AS t
        FROM documents d
        JOIN pred p USING (doc_id)
        JOIN truth t USING (doc_id)
    ),
    per_source AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(p) AS BIGINT) AS n_sel,
               CAST(SUM(t) AS BIGINT) AS n_pos,
               CAST(SUM(p * t) AS BIGINT) AS n_tp,
               CAST(SUM(p * (1 - t)) AS BIGINT) AS n_fp
        FROM labeled GROUP BY source
    ),
    rated AS (
        SELECT source, n,
               CAST((2 * 1000 * n_sel + n) // (2 * n) AS BIGINT) AS sel_milli,
               CASE WHEN n_pos > 0 THEN
                   CAST((2 * 1000 * n_tp + n_pos) // (2 * n_pos) AS BIGINT)
               END AS tpr_milli,
               CASE WHEN n - n_pos > 0 THEN
                   CAST((2 * 1000 * n_fp + (n - n_pos))
                        // (2 * (n - n_pos)) AS BIGINT)
               END AS fpr_milli
        FROM per_source
    ),
    overall AS (
        SELECT CAST((2 * 1000 * SUM(n_sel) + SUM(n))
                    // (2 * SUM(n)) AS BIGINT) AS o_sel,
               CASE WHEN SUM(n_pos) > 0 THEN
                   CAST((2 * 1000 * SUM(n_tp) + SUM(n_pos))
                        // (2 * SUM(n_pos)) AS BIGINT)
               END AS o_tpr,
               CASE WHEN SUM(n) - SUM(n_pos) > 0 THEN
                   CAST((2 * 1000 * SUM(n_fp) + (SUM(n) - SUM(n_pos)))
                        // (2 * (SUM(n) - SUM(n_pos))) AS BIGINT)
               END AS o_fpr
        FROM per_source
    )
    SELECT source, n, sel_milli, tpr_milli, fpr_milli,
           sel_milli - o_sel AS dp_gap_milli,
           tpr_milli - o_tpr AS tpr_gap_milli,
           fpr_milli - o_fpr AS fpr_gap_milli
    FROM rated CROSS JOIN overall
    ORDER BY source
    """


# --- confident-learning label-noise estimate --------------------------------------------


def label_noise_estimate(docs: DataFrame) -> DataFrame:
    """Confident-learning label-noise matrix (Northcutt et al., JAIR 2021,
    simplified to the single-score regime): per-class confidence thresholds
    t_j = mean lexicon confidence of docs PREDICTED as j, then the confident
    joint C[stored_lang][pred_lang] counts only docs whose prediction clears
    its class threshold — the estimated mislabel census a curation pipeline
    reads before trusting its `lang` column.

    Confidence is the exact milli ratio lexicon_hits/n_words; thresholds and
    cell counts are all integer arithmetic. Output: one row per observed
    (lang, pred_lang) cell with the raw and confident counts plus the global
    off-diagonal confident share in milli.

    Scale: one zero-shuffle scoring pass, a |langs|-row threshold aggregate
    broadcast back, one (lang, pred_lang) aggregate."""
    scored = (
        lang_id(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "lang",
            "pred_lang",
            F.expr(
                "CAST((2 * 1000 * lexicon_hits + GREATEST(n_words, 1))"
                " DIV (2 * GREATEST(n_words, 1)) AS BIGINT)"
            ).alias("conf_milli"),
        )
    )
    thresholds = scored.groupBy("pred_lang").agg(
        F.expr(
            "CAST((2 * SUM(conf_milli) + COUNT(*)) DIV (2 * COUNT(*))"
            " AS BIGINT)"
        ).alias("t_milli")
    )
    cells = (
        scored.join(F.broadcast(thresholds), "pred_lang")
        .groupBy("lang", "pred_lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(
                (F.col("conf_milli") >= F.col("t_milli")).cast("long")
            ).alias("n_confident"),
        )
    )
    noise = cells.agg(
        F.expr(
            "CASE WHEN SUM(n_confident) > 0 THEN CAST((2 * 1000 *"
            " SUM(CASE WHEN lang <> pred_lang THEN n_confident ELSE 0 END)"
            " + SUM(n_confident)) DIV (2 * SUM(n_confident)) AS BIGINT)"
            " ELSE 0 END"
        ).alias("noise_milli")
    )
    return (
        cells.crossJoin(F.broadcast(noise))
        .select("lang", "pred_lang", "n_docs", "n_confident", "noise_milli")
        .orderBy("lang", "pred_lang")
    )


def label_noise_estimate_sql() -> str:
    return f"""
    WITH scored AS (
        SELECT d.lang, p.pred_lang,
               CAST((2 * 1000 * p.lexicon_hits + GREATEST(p.n_words, 1))
                    // (2 * GREATEST(p.n_words, 1)) AS BIGINT) AS conf_milli
        FROM documents d
        JOIN ({_lang_id_sql()}) p USING (doc_id)
    ),
    thresholds AS (
        SELECT pred_lang,
               CAST((2 * SUM(conf_milli) + COUNT(*)) // (2 * COUNT(*))
                    AS BIGINT) AS t_milli
        FROM scored GROUP BY pred_lang
    ),
    cells AS (
        SELECT s.lang, s.pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN s.conf_milli >= t.t_milli THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_confident
        FROM scored s JOIN thresholds t USING (pred_lang)
        GROUP BY s.lang, s.pred_lang
    ),
    noise AS (
        SELECT CASE WHEN SUM(n_confident) > 0 THEN
                   CAST((2 * 1000 * SUM(CASE WHEN lang <> pred_lang
                                 THEN n_confident ELSE 0 END)
                         + SUM(n_confident)) // (2 * SUM(n_confident))
                        AS BIGINT)
               ELSE 0 END AS noise_milli
        FROM cells
    )
    SELECT lang, pred_lang, n_docs, n_confident, noise_milli
    FROM cells CROSS JOIN noise
    ORDER BY lang, pred_lang
    """


# --- temperature scaling of the quality classifier --------------------------------------

TEMP_GRID_CENTI = tuple(range(50, 310, 25))  # 0.50 .. 3.00 in 0.25 steps


def temperature_scaling(docs: DataFrame) -> DataFrame:
    """Temperature scaling of the linear quality classifier (Guo et al.,
    ICML 2017): grid-search the single scalar T that minimizes the
    negative log-likelihood of sigmoid(logit/T) against the Gopher-rule
    truth — the one-parameter post-hoc calibration every deployed filter
    gets before its scores are treated as probabilities (the reliability
    diagram L-257 measures the miscalibration; this fixes it).

    Per-doc NLL contributions quantize ONCE to micro-nat (deterministic
    ln/sigmoid over the exact integer logit, the BM25/QL convention), so
    each grid point's total is an order-free integer sum and the argmin has
    a (nll, T) total order. Output: one row per grid temperature
    (t_centi, nll_micro_nat, is_best).

    Scale: two zero-shuffle scorers share the corpus scan; the grid
    explodes x|T| before one partial aggregate."""
    pred = classifier_scores(docs).select("doc_id", "logit_milli")
    truth = gopher_rules(docs).select(
        "doc_id", F.col("gopher_keep").cast("int").alias("y")
    )
    grid = F.explode(
        F.array(*[F.lit(t) for t in TEMP_GRID_CENTI])
    ).alias("t_centi")
    scored = (
        pred.join(truth, "doc_id")
        .select("logit_milli", "y", grid)
        .select(
            "t_centi",
            F.expr(
                "CAST(round(1e6 * ("
                " ln(1.0 + exp(-abs(logit_milli / 1000.0 / (t_centi / 100.0))))"
                " + CASE WHEN (CASE WHEN logit_milli >= 0 THEN 1 ELSE 0 END) <> y"
                "   THEN abs(logit_milli / 1000.0 / (t_centi / 100.0))"
                "   ELSE 0.0 END)) AS BIGINT)"
            ).alias("nll_micro"),
        )
    )
    totals = scored.groupBy("t_centi").agg(
        F.sum("nll_micro").alias("nll_micro_nat")
    )
    w_best = Window.orderBy(
        F.col("nll_micro_nat").asc(), F.col("t_centi").asc()
    )
    return (
        totals.withColumn(
            "is_best", (F.row_number().over(w_best) == 1).cast("int")
        )
        .select("t_centi", "nll_micro_nat", "is_best")
        .orderBy("t_centi")
    )


def temperature_scaling_sql() -> str:
    grid = ", ".join(str(t) for t in TEMP_GRID_CENTI)
    return f"""
    WITH pred AS (
        SELECT doc_id, logit_milli FROM ({_classifier_scores_sql()})
    ),
    truth AS (
        SELECT doc_id,
               CASE WHEN gopher_keep THEN 1 ELSE 0 END AS y
        FROM ({_gopher_rules_sql()})
    ),
    scored AS (
        SELECT t.t_centi,
               CAST(round(1e6 * (
                   ln(1.0 + exp(-abs(p.logit_milli / 1000.0
                                     / (t.t_centi / 100.0))))
                   + CASE WHEN (CASE WHEN p.logit_milli >= 0
                                THEN 1 ELSE 0 END) <> u.y
                     THEN abs(p.logit_milli / 1000.0 / (t.t_centi / 100.0))
                     ELSE 0.0 END)) AS BIGINT) AS nll_micro
        FROM pred p
        JOIN truth u USING (doc_id)
        CROSS JOIN (SELECT UNNEST([{grid}]) AS t_centi) t
    ),
    totals AS (
        SELECT t_centi, CAST(SUM(nll_micro) AS BIGINT) AS nll_micro_nat
        FROM scored GROUP BY t_centi
    )
    SELECT CAST(t_centi AS INTEGER) AS t_centi, nll_micro_nat,
           CAST(CASE WHEN row_number() OVER (
               ORDER BY nll_micro_nat ASC, t_centi ASC) = 1
           THEN 1 ELSE 0 END AS INTEGER) AS is_best
    FROM totals
    ORDER BY t_centi
    """
