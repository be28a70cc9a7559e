"""Corpus-level statistics for training-data curation: Gopher-style
repetition signals, vocabulary building, and benchmark decontamination.

These are the three corpus analyses a pre-training pipeline runs after
per-document quality scoring (text.py) and before/alongside dedup (dedup.py):

- repetition signals — flag documents dominated by repeated words/phrases
  (the Gopher "repetition" filters, Rae et al. 2021, arXiv:2112.11446 §A1.1);
- vocabulary top-n-grams — global term frequencies feeding tokenizer/BPE
  training and mixture diagnostics;
- decontamination — drop training documents sharing long word n-grams with an
  evaluation benchmark (the GPT-3/Lee et al. 13-gram-overlap shape, scaled
  down to the fixtures' synthetic vocabulary).

Scale design notes:

- repetition  — per-document aggregates: every shuffle is keyed by (doc_id[, gram]),
  so cardinality grows linearly with the corpus and no key is hotter than the
  longest document. Three gram sizes = three scans of the two-column
  (doc_id, text) projection; at 100 TB fuse them into one tagged explode if
  the job turns scan-bound (kept separate here for exact SQL twins).
- vocabulary  — groupBy(gram) with map-side partial aggregation, then a
  distributed top-k (TakeOrderedAndProject), NEVER a global sort or a
  single-partition window over the full term set; the rank window runs on the
  k surviving rows only.
- decontamination — inverted-index join on the shingle key. The benchmark
  side is an eval suite (thousands of documents), orders of magnitude smaller
  than the corpus → broadcast. The corpus posting lists are capped with the
  same ``max_df`` guard as dedup so one stop-phrase can't blow up the join.

Everything is built-in-function Spark (JVM codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import DEFAULT_MAX_DF
from .text import WS_RE, _norm as _norm_text, _norm_sql as _norm_text_sql
from .shingles import (
    df_cap_filter_sql,
    grams,
    grams_sql,
    shingles,
    shingles_sql,
    with_df_cap,
)

# Decontamination defaults: every (doc_id % 10 == 7) document plays the role
# of the held-out benchmark; 5-gram overlap flags contamination (long enough
# to be meaningful on the synthetic vocabulary, cf. the 13-gram production
# default). Deterministic, so the DuckDB oracle is exact.
BENCH_MOD = 10
BENCH_REM = 7
DECON_N = 5


# --- repetition signals (Gopher A1.1) ----------------------------------------


def _per_doc_gram_stats(docs: DataFrame, n: int, prefix: str) -> DataFrame:
    """(doc_id, {prefix}_total, {prefix}_distinct, {prefix}_top) for word n-grams."""
    per_gram = grams(docs, n).groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias(f"{prefix}_total"),
        F.count("*").alias(f"{prefix}_distinct"),
        F.max("cnt").alias(f"{prefix}_top"),
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Per-document repetition ratios: top-word fraction and duplicate
    2-/3-gram fractions, the Gopher repetition-filter family.

    ``dup_ngram_frac = 1 - distinct/total`` (count fraction of duplicated
    n-grams); ``top_word_frac`` = occurrences of the most frequent word over
    total words. Documents too short to form an n-gram score 0.0.
    """
    w = _per_doc_gram_stats(docs, 1, "w")
    g2 = _per_doc_gram_stats(docs, 2, "g2")
    g3 = _per_doc_gram_stats(docs, 3, "g3")
    out = (
        docs.select("doc_id")
        .join(w, "doc_id", "left")
        .join(g2, "doc_id", "left")
        .join(g3, "doc_id", "left")
    )
    dup_frac = lambda p: F.round((F.col(f"{p}_total") - F.col(f"{p}_distinct")) / F.col(f"{p}_total"), 6)
    return out.select(
        "doc_id",
        F.coalesce(F.col("w_total"), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(F.round(F.col("w_top") / F.col("w_total"), 6), F.lit(0.0)).alias("top_word_frac"),
        F.coalesce(dup_frac("g2"), F.lit(0.0)).alias("dup_2gram_frac"),
        F.coalesce(dup_frac("g3"), F.lit(0.0)).alias("dup_3gram_frac"),
    )


def repetition_signals_sql(docs_rel: str = "documents") -> str:
    def stats(n: int) -> str:
        return f"""(
            SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS total,
                   COUNT(*) AS "distinct", MAX(cnt) AS top
            FROM (SELECT doc_id, gram, COUNT(*) AS cnt
                  FROM ({grams_sql(n, docs_rel)}) GROUP BY doc_id, gram)
            GROUP BY doc_id
        )"""

    return f"""
        SELECT d.doc_id,
               COALESCE(w.total, 0) AS n_words,
               COALESCE(round(w.top / w.total, 6), 0.0) AS top_word_frac,
               COALESCE(round((g2.total - g2."distinct") / g2.total, 6), 0.0) AS dup_2gram_frac,
               COALESCE(round((g3.total - g3."distinct") / g3.total, 6), 0.0) AS dup_3gram_frac
        FROM {docs_rel} d
        LEFT JOIN {stats(1)} w ON d.doc_id = w.doc_id
        LEFT JOIN {stats(2)} g2 ON d.doc_id = g2.doc_id
        LEFT JOIN {stats(3)} g3 ON d.doc_id = g3.doc_id
    """


# --- vocabulary top-n-grams ---------------------------------------------------


def vocab_top_ngrams(docs: DataFrame, k: int = 25) -> DataFrame:
    """Top-``k`` unigrams and bigrams by corpus frequency with deterministic
    tie-break (count desc, term asc): (n, term, cnt, rank).

    The top-k is ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject
    (per-partition partial top-k, tiny driver merge), so no global sort of
    the term dictionary ever happens; the rank window only sees k rows.
    """
    order = [F.col("cnt").desc(), F.col("term").asc()]
    parts = []
    for n in (1, 2):
        counts = (
            grams(docs, n)
            .groupBy(F.col("gram").alias("term"))
            .agg(F.count("*").alias("cnt"))
        )
        top = counts.orderBy(*order).limit(k)
        parts.append(
            top.select(
                F.lit(n).alias("n"),
                "term",
                "cnt",
                F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
            )
        )
    return parts[0].unionByName(parts[1])


def vocab_top_ngrams_sql(k: int = 25, docs_rel: str = "documents") -> str:
    def one(n: int) -> str:
        return f"""
            SELECT * FROM (
                SELECT {n} AS n, gram AS term, COUNT(*) AS cnt,
                       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, gram) AS rank
                FROM ({grams_sql(n, docs_rel)})
                GROUP BY gram
            ) WHERE rank <= {k}
        """

    return f"{one(1)} UNION ALL {one(2)}"


# --- tokenizer vocabulary coverage (OOV rate) ----------------------------------

OOV_VOCAB_K = 200


def vocab_oov_rate(docs: DataFrame, k: int = OOV_VOCAB_K) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-``k``
    unigram vocabulary: (doc_id, n_tokens, n_oov, oov_milli).

    The tokenizer-coverage evaluation a pipeline runs before committing to a
    vocabulary size: documents with high OOV under the candidate vocab will
    fragment into byte-fallback tokens and train poorly. Deterministic
    tie-break (count desc, term asc) makes the vocab — and therefore the
    rate — reproducible; the rate is integer mills (1000·oov div tokens), so
    no float crosses the engine boundary.

    Scale shape: the vocab is a distributed top-k over the term aggregate
    (TakeOrderedAndProject — never a global term sort) broadcast into the
    token stream; per-doc counts are one doc_id-keyed aggregate. The token
    explode is narrow. No data-sized relation is ever collected or sorted.
    """
    toks = grams(docs, 1)
    vocab = (
        toks.groupBy(F.col("gram").alias("term"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(k)
        .select("term")
    )
    per_doc = (
        toks.join(F.broadcast(vocab), toks["gram"] == vocab["term"], "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum(F.when(F.col("term").isNull(), 1).otherwise(0)).alias("n_oov_raw"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov_raw", F.lit(0)).cast("long").alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.when(
                F.col("n_tokens") > 0, F.expr("n_oov * 1000 div n_tokens")
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("oov_milli"),
        )
        .orderBy("doc_id")
    )


def vocab_oov_rate_sql(k: int = OOV_VOCAB_K, docs_rel: str = "documents") -> str:
    return f"""
        WITH toks AS ({grams_sql(1, docs_rel)}),
             vocab AS (
                 SELECT gram AS term FROM toks GROUP BY gram
                 ORDER BY COUNT(*) DESC, gram ASC LIMIT {k}
             ),
             per_doc AS (
                 SELECT doc_id,
                        CAST(COUNT(*) AS BIGINT) AS n_tokens,
                        CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                             AS BIGINT) AS n_oov
                 FROM toks t LEFT JOIN vocab v ON t.gram = v.term
                 GROUP BY doc_id
             )
        SELECT d.doc_id,
               COALESCE(n_tokens, 0) AS n_tokens,
               COALESCE(n_oov, 0) AS n_oov,
               CASE WHEN COALESCE(n_tokens, 0) > 0
                    THEN n_oov * 1000 // n_tokens
                    ELSE 0 END AS oov_milli
        FROM {docs_rel} d LEFT JOIN per_doc USING (doc_id)
        ORDER BY d.doc_id
    """


# --- TF-IDF keyword extraction ------------------------------------------------


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF: (doc_id, term, tf, df, tfidf, rank).

    Classic keyword extraction / relevance weighting over the corpus. Three
    shuffles, all narrow: tf keyed by (doc_id, term), df keyed by term (on the
    already-aggregated tf relation, one row per posting — never the raw gram
    stream), and the per-doc rank window keyed by doc_id. The corpus size is a
    1-row aggregate broadcast into the scoring join, not a driver collect.

    The rank orders by the ROUNDED score (then term asc): sub-round float
    noise must not be able to flip the order between engines.
    """
    g = grams(docs, 1).withColumnRenamed("gram", "term")
    tf = g.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


def tfidf_topk_sql(k: int = 3, docs_rel: str = "documents") -> str:
    score = "round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)"
    return f"""
        WITH g AS (SELECT doc_id, gram AS term FROM ({grams_sql(1, docs_rel)})),
             tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM g GROUP BY doc_id, term),
             df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
             n AS (SELECT COUNT(*) AS n_docs FROM {docs_rel})
        SELECT doc_id, term, tf, df, tfidf, rank FROM (
            SELECT tf.doc_id, tf.term, tf.tf, df.df, {score} AS tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id ORDER BY {score} DESC, tf.term ASC
                   ) AS rank
            FROM tf JOIN df USING (term) CROSS JOIN n
        ) WHERE rank <= {k}
    """


# --- unigram-LM quality scoring -----------------------------------------------


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    unigram language model: (doc_id, n_words, avg_neg_logprob).

    The CCNet-style fluency proxy (Wenzek et al. 2019, arXiv:1911.00359):
    documents whose words are globally rare score high (gibberish, boilerplate
    hashes); low scores mean in-distribution text. At 100 TB the unigram model
    is the vocab aggregation this module already builds — narrow (term, p)
    rows — joined back to the gram stream on the term key; no driver-side
    model object, no Python in the loop.
    """
    g = grams(docs, 1).withColumnRenamed("gram", "term")
    counts = g.groupBy("term").agg(F.count("*").alias("cnt"))
    total = g.agg(F.count("*").alias("total"))
    probs = counts.crossJoin(F.broadcast(total)).select(
        "term", (F.col("cnt") / F.col("total")).alias("p")
    )
    per_doc = (
        g.join(probs, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.sum(-F.log("p")) / F.count("*"), 6).alias("avg_neg_logprob"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
            F.coalesce(F.col("avg_neg_logprob"), F.lit(0.0)).alias("avg_neg_logprob"),
        )
    )


def unigram_logprob_sql(docs_rel: str = "documents") -> str:
    return f"""
        WITH g AS (SELECT doc_id, gram AS term FROM ({grams_sql(1, docs_rel)})),
             counts AS (SELECT term, COUNT(*) AS cnt FROM g GROUP BY term),
             total AS (SELECT COUNT(*) AS total FROM g),
             probs AS (SELECT term, CAST(cnt AS DOUBLE) / total AS p
                       FROM counts CROSS JOIN total),
             per_doc AS (
                 SELECT doc_id, COUNT(*) AS n_words,
                        round(SUM(-ln(p)) / COUNT(*), 6) AS avg_neg_logprob
                 FROM g JOIN probs USING (term)
                 GROUP BY doc_id
             )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
               COALESCE(p.avg_neg_logprob, 0.0) AS avg_neg_logprob
        FROM {docs_rel} d LEFT JOIN per_doc p USING (doc_id)
    """


# --- benchmark decontamination ------------------------------------------------


def benchmark_overlap(
    docs: DataFrame,
    n: int = DECON_N,
    mod: int = BENCH_MOD,
    rem: int = BENCH_REM,
    max_df: int = DEFAULT_MAX_DF,
) -> DataFrame:
    """Contamination pairs: (doc_id, bench_doc_id, overlap_ngrams) for every
    corpus document sharing at least one word ``n``-gram with a benchmark
    document.

    The benchmark shingle relation is broadcast (eval suites are tiny next to
    the corpus); the corpus side gets the standard ``max_df`` posting-list cap
    before the join so a stop-phrase shared with the benchmark can't make the
    join output quadratic. Downstream, a pipeline drops or flags every
    ``doc_id`` in this result.
    """
    sh = shingles(docs, n)
    is_bench = (F.col("doc_id") % mod) == rem
    bench = sh.where(is_bench).withColumnRenamed("doc_id", "bench_doc_id")
    corpus = with_df_cap(sh.where(~is_bench), max_df)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_doc_id")
        .agg(F.count("*").alias("overlap_ngrams"))
    )


def benchmark_overlap_sql(
    n: int = DECON_N,
    mod: int = BENCH_MOD,
    rem: int = BENCH_REM,
    max_df: int = DEFAULT_MAX_DF,
    docs_rel: str = "documents",
) -> str:
    return f"""
        WITH sh AS ({shingles_sql(n, docs_rel)}),
             bench AS (SELECT doc_id AS bench_doc_id, shingle FROM sh
                       WHERE doc_id % {mod} = {rem}),
             corpus_raw AS (SELECT doc_id, shingle FROM sh
                            WHERE doc_id % {mod} <> {rem}),
             corpus AS (SELECT * FROM corpus_raw
                        WHERE {df_cap_filter_sql('corpus_raw', max_df)})
        SELECT c.doc_id, b.bench_doc_id, COUNT(*) AS overlap_ngrams
        FROM corpus c JOIN bench b USING (shingle)
        GROUP BY c.doc_id, b.bench_doc_id
    """


# --- Zipf fit -----------------------------------------------------------------

ZIPF_TOP_K = 1000


def zipf_slope(docs: DataFrame, k: int = ZIPF_TOP_K) -> DataFrame:
    """Closed-form OLS fit of log(freq) vs log(rank) over the top-``k``
    unigrams — the Zipf-law exponent (a healthy natural corpus sits near −1;
    templated/bot text flattens it).

    Scale shape: one term-keyed aggregate over the exploded grams, a
    distributed top-k (TakeOrderedAndProject) down to ``k`` rows, THEN the
    rank window — the only global-order window runs over the k-row relation,
    never the vocabulary. Slope/intercept in closed form (covar/var) like
    user_value_trend — no iterative fit."""
    freqs = (
        grams(docs, 1)
        .groupBy("gram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "gram")
        .limit(k)
    )
    w = Window.orderBy(F.desc("freq"), "gram")
    pts = freqs.select(
        F.log(F.row_number().over(w).cast("double")).alias("lx"),
        F.log(F.col("freq").cast("double")).alias("ly"),
    )
    slope = F.when(F.var_samp("lx") > 0, F.covar_samp("lx", "ly") / F.var_samp("lx"))
    return pts.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(F.avg("ly") - slope * F.avg("lx"), 6).alias("zipf_intercept"),
    )


def zipf_slope_sql(k: int = ZIPF_TOP_K, docs_rel: str = "documents") -> str:
    return f"""
        WITH g AS ({grams_sql(1, docs_rel)}),
        freqs AS (
            SELECT gram, COUNT(*) AS freq
            FROM g GROUP BY gram
            ORDER BY freq DESC, gram
            LIMIT {k}
        ),
        pts AS (
            SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, gram) AS DOUBLE))
                       AS lx,
                   ln(CAST(freq AS DOUBLE)) AS ly
            FROM freqs
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
               round(CASE WHEN var_samp(lx) > 0
                          THEN covar_samp(lx, ly) / var_samp(lx) END, 6)
                   AS zipf_slope,
               round(AVG(ly) - CASE WHEN var_samp(lx) > 0
                          THEN covar_samp(lx, ly) / var_samp(lx) END * AVG(lx), 6)
                   AS zipf_intercept
        FROM pts
    """


# --- bigram LM with stupid backoff --------------------------------------------

BACKOFF_ALPHA = 0.4
LM_TRAIN_MOD = 2  # doc_id % 2 == 0 trains the model; all docs are scored


def bigram_backoff_logprob(
    docs: DataFrame, alpha: float = BACKOFF_ALPHA, train_mod: int = LM_TRAIN_MOD
) -> DataFrame:
    """Per-document mean negative log-score under a bigram model with Stupid
    Backoff (Brants et al., EMNLP 2007 — the count-ratio backoff that made
    web-scale LMs tractable: no discounting state, just S(w₂|w₁) =
    c(w₁w₂)/c(w₁), backing off to α·c(w₂)/N when the bigram is unseen).

    The model trains on the even-doc_id half and scores EVERY document, so
    the backoff branch genuinely fires on held-out bigrams (a same-corpus
    model would never back off). Model relations are (term, count)
    aggregates joined back on the gram keys — the unigram_logprob shape one
    order up; unseen words floor at c = 1 (out-of-vocabulary words would
    otherwise score -ln(0))."""
    uni = grams(docs, 1).withColumnRenamed("gram", "w")
    big = grams(docs, 2).withColumnRenamed("gram", "bg")
    train_uni = uni.where(F.col("doc_id") % train_mod == 0)
    train_big = big.where(F.col("doc_id") % train_mod == 0)
    cu = train_uni.groupBy("w").agg(F.count("*").alias("cu"))
    cb = train_big.groupBy("bg").agg(F.count("*").alias("cb"))
    total = train_uni.agg(F.count("*").alias("n_train"))
    w1 = F.split(F.col("bg"), " ")[0]
    w2 = F.split(F.col("bg"), " ")[1]
    scored = (
        big.select("doc_id", "bg", w1.alias("w1"), w2.alias("w2"))
        .join(cb.hint("shuffle_hash"), "bg", "left")
        .join(cu.select(F.col("w").alias("w1"), F.col("cu").alias("cu1")), "w1", "left")
        .join(cu.select(F.col("w").alias("w2"), F.col("cu").alias("cu2")), "w2", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.when(
                F.col("cb").isNotNull() & F.col("cu1").isNotNull(),
                F.col("cb").cast("double") / F.col("cu1").cast("double"),
            )
            .otherwise(
                F.lit(alpha)
                * F.coalesce(F.col("cu2"), F.lit(1)).cast("double")
                / F.col("n_train").cast("double")
            )
            .alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum(-F.log("s")) / F.count("*"), 6).alias("avg_neg_logscore"),
        )
        .orderBy("doc_id")
    )


def bigram_backoff_logprob_sql(
    alpha: float = BACKOFF_ALPHA,
    train_mod: int = LM_TRAIN_MOD,
    docs_rel: str = "documents",
) -> str:
    return f"""
        WITH uni AS (SELECT doc_id, gram AS w FROM ({grams_sql(1, docs_rel)})),
        big AS (SELECT doc_id, gram AS bg FROM ({grams_sql(2, docs_rel)})),
        cu AS (SELECT w, COUNT(*) AS cu FROM uni
               WHERE doc_id % {train_mod} = 0 GROUP BY w),
        cb AS (SELECT bg, COUNT(*) AS cb FROM big
               WHERE doc_id % {train_mod} = 0 GROUP BY bg),
        total AS (SELECT COUNT(*) AS n_train FROM uni WHERE doc_id % {train_mod} = 0),
        scored AS (
            SELECT doc_id,
                   CASE WHEN cb IS NOT NULL AND cu1.cu IS NOT NULL
                        THEN CAST(cb AS DOUBLE) / CAST(cu1.cu AS DOUBLE)
                        ELSE {alpha} * CAST(COALESCE(cu2.cu, 1) AS DOUBLE)
                             / CAST(n_train AS DOUBLE)
                   END AS s
            FROM (SELECT doc_id, bg,
                         string_split(bg, ' ')[1] AS w1,
                         string_split(bg, ' ')[2] AS w2
                  FROM big) b
            LEFT JOIN cb USING (bg)
            LEFT JOIN cu cu1 ON b.w1 = cu1.w
            LEFT JOIN cu cu2 ON b.w2 = cu2.w
            CROSS JOIN total
        )
        SELECT doc_id, COUNT(*) AS n_bigrams,
               round(SUM(-ln(s)) / COUNT(*), 6) AS avg_neg_logscore
        FROM scored
        GROUP BY doc_id
        ORDER BY doc_id
    """


# --- LM-score corpus composition -------------------------------------------------

LM_MIX_QUARTILES = (0.25, 0.5, 0.75)


def lm_score_mix(docs: DataFrame) -> DataFrame:
    """Corpus composition by unigram-LM fluency quartile × source: how much
    of each source's mass sits in the most/least in-distribution quarter of
    the corpus — the mixing diagnostic run before quality-weighted sampling
    (a source concentrated in Q4 is mostly out-of-distribution text).

    Exactness (the entropy treatment): per-term −ln p quantizes ONCE to
    exact integer micro-nats (p = cnt/total, both exact integers, so
    L = Q(ln total) − Q(ln cnt)); per-doc scores are integer sums/divisions;
    quartile breakpoints come from one exact-percentile aggregate over the
    integer scores (bit-identical interpolation on identical multisets) and
    bucketing is integer-vs-double comparison. Shuffles: the vocab aggregate,
    the doc aggregate, one 1-row breakpoint broadcast, one (source, bucket)
    aggregate."""
    q = lambda col: F.round(F.log(col) * F.lit(1e6)).cast("long")  # noqa: E731
    g = grams(docs, 1).withColumnRenamed("gram", "term")
    counts = g.groupBy("term").agg(F.count("*").alias("cnt"))
    total = g.agg(F.count("*").alias("total"))
    neglogp_micro = (
        counts.crossJoin(F.broadcast(total))
        .select("term", (q(F.col("total")) - q(F.col("cnt"))).alias("nlp_micro"))
    )
    per_doc = (
        g.join(neglogp_micro, "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("nlp_micro") / F.count("*")).cast("long").alias(
                "score_micro"
            )
        )
    )
    scored = docs.select("doc_id", "source").join(per_doc, "doc_id")
    breaks = scored.agg(
        *[
            F.percentile("score_micro", F.lit(p)).alias(f"b{i}")
            for i, p in enumerate(LM_MIX_QUARTILES, start=1)
        ]
    )
    bucketed = scored.crossJoin(F.broadcast(breaks)).select(
        "source",
        "score_micro",
        F.when(F.col("score_micro") <= F.col("b1"), 1)
        .when(F.col("score_micro") <= F.col("b2"), 2)
        .when(F.col("score_micro") <= F.col("b3"), 3)
        .otherwise(4)
        .alias("quartile"),
    )
    return (
        bucketed.groupBy("source", "quartile")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("score_micro") / F.count("*")).cast("long").alias(
                "mean_score_micro"
            ),
        )
        .orderBy("source", "quartile")
    )


def lm_score_mix_sql(docs_rel: str = "documents") -> str:
    def q(expr: str) -> str:
        return f"CAST(round(ln({expr}) * 1e6) AS BIGINT)"

    qs = ", ".join(
        f"quantile_cont(score_micro, {p}) AS b{i}"
        for i, p in enumerate(LM_MIX_QUARTILES, start=1)
    )
    return f"""
        WITH g AS (SELECT doc_id, gram AS term FROM ({grams_sql(1, docs_rel)})),
        counts AS (SELECT term, COUNT(*) AS cnt FROM g GROUP BY term),
        total AS (SELECT COUNT(*) AS total FROM g),
        nlp AS (
            SELECT term, {q('total')} - {q('cnt')} AS nlp_micro
            FROM counts CROSS JOIN total
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(round(CAST(SUM(nlp_micro) AS DOUBLE) / COUNT(*))
                       AS BIGINT) AS score_micro
            FROM g JOIN nlp USING (term)
            GROUP BY doc_id
        ),
        scored AS (
            SELECT d.source, p.score_micro
            FROM {docs_rel} d JOIN per_doc p USING (doc_id)
        ),
        breaks AS (SELECT {qs} FROM scored)
        SELECT source,
               CASE WHEN score_micro <= b1 THEN 1
                    WHEN score_micro <= b2 THEN 2
                    WHEN score_micro <= b3 THEN 3
                    ELSE 4 END AS quartile,
               COUNT(*) AS n_docs,
               CAST(round(CAST(SUM(score_micro) AS DOUBLE) / COUNT(*))
                   AS BIGINT) AS mean_score_micro
        FROM scored CROSS JOIN breaks
        GROUP BY source, quartile
        ORDER BY source, quartile
    """


# --- per-source distinct-n diversity -------------------------------------------

DIVERSITY_NS = (1, 2, 3)


def ngram_diversity(
    docs: DataFrame, ns: tuple[int, ...] = DIVERSITY_NS
) -> DataFrame:
    """Distinct-n diversity per source: distinct n-grams / total n-grams for
    n = 1, 2, 3 — the standard corpus-diversity / self-repetition signal (a
    source whose ratio collapses is template-generated or over-crawled, a
    memorization risk for training).

    One tagged gram relation (per-n narrow explodes, union — each a
    zero-shuffle array transform carrying the source column), then two
    key-aggregates: (source, n, gram) -> multiplicity, (source, n) ->
    totals; both have map-side partial agg, so the wide exchange carries
    pre-aggregated gram counts, never raw gram instances. The ratio is exact
    integer half-up milli — bit-stable cross-engine. Output <= |sources|*|ns|
    rows."""
    w = F.col("__words")

    def gram_at(n: int):
        return lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(n)]
        )

    tagged = None
    for n in ns:
        g = F.when(
            F.size(w) >= n,
            F.transform(F.sequence(F.lit(1), F.size(w) - (n - 1)), gram_at(n)),
        ).otherwise(F.array())
        rel = docs.select(
            "source", F.split(_norm_text(F.col("text")), WS_RE).alias("__words")
        ).select("source", F.lit(n).alias("n"), F.explode(g).alias("gram"))
        tagged = rel if tagged is None else tagged.unionAll(rel)
    per_gram = tagged.groupBy("source", "n", "gram").agg(F.count("*").alias("c"))
    return (
        per_gram.groupBy("source", "n")
        .agg(
            F.sum("c").cast("long").alias("total_ngrams"),
            F.count("*").alias("distinct_ngrams"),
        )
        .select(
            "source",
            "n",
            "total_ngrams",
            "distinct_ngrams",
            F.expr(
                "CAST((2000 * distinct_ngrams + total_ngrams)"
                " DIV (2 * total_ngrams) AS BIGINT)"
            ).alias("diversity_milli"),
        )
        .orderBy("source", "n")
    )


def ngram_diversity_sql(
    ns: tuple[int, ...] = DIVERSITY_NS, docs_rel: str = "documents"
) -> str:
    def one(n: int) -> str:
        parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
        return f"""
            SELECT source, {n} AS n,
                   unnest([{parts} FOR i IN generate_series(1, len(w) - {n - 1})])
                     AS gram
            FROM (
                SELECT source,
                       string_split_regex({_norm_text_sql('text')}, '{WS_RE}') AS w
                FROM {docs_rel}
            )
            WHERE len(w) >= {n}
        """

    union = " UNION ALL ".join(one(n) for n in ns)
    return f"""
        WITH tagged AS ({union}),
        per_gram AS (
            SELECT source, n, gram, COUNT(*) AS c
            FROM tagged GROUP BY source, n, gram
        )
        SELECT source, n,
               CAST(SUM(c) AS BIGINT) AS total_ngrams,
               COUNT(*) AS distinct_ngrams,
               CAST((2000 * COUNT(*) + SUM(c)) // (2 * SUM(c)) AS BIGINT)
                   AS diversity_milli
        FROM per_gram
        GROUP BY source, n
        ORDER BY source, n
    """


# --- BPE merge-step pair counting ----------------------------------------------

BPE_TOP_K = 20


def bpe_merge_step(docs: DataFrame, k: int = BPE_TOP_K) -> DataFrame:
    """One BPE tokenizer-training iteration: count adjacent character pairs
    over the corpus (each distinct word's pairs weighted by the word's
    corpus frequency) and emit the top-``k`` merge candidates — the
    inner-loop primitive of byte-pair-encoding vocabulary construction,
    which at corpus scale is exactly this weighted pair aggregate repeated
    per merge.

    Two key aggregates: word -> frequency (the corpus's distinct-word
    relation is orders of magnitude smaller than the token stream, so all
    downstream work runs on it, not on raw text), then a narrow per-word
    adjacent-pair expansion and a pair -> Σfreq aggregate with distributed
    top-k (TakeOrderedAndProject, never a global sort)."""
    toks = F.split(_norm_text(F.col("text")), WS_RE)
    words = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .where(F.length("word") >= 2)
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.concat(
            F.col("word").substr(i, F.lit(1)),
            F.lit(" "),
            F.col("word").substr(i + 1, F.lit(1)),
        ),
    )
    return (
        words.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(k)
    )


def bpe_merge_step_sql(k: int = BPE_TOP_K, docs_rel: str = "documents") -> str:
    return f"""
    WITH words AS (
        SELECT word, COUNT(*) AS freq
        FROM (
            SELECT unnest(string_split_regex({_norm_text_sql('text')}, '{WS_RE}'))
                     AS word
            FROM {docs_rel}
        )
        GROUP BY word
        HAVING len(word) >= 2
    ),
    pairs AS (
        SELECT substr(word, i, 1) || ' ' || substr(word, i + 1, 1) AS pair,
               freq
        FROM (
            SELECT word, freq,
                   unnest(generate_series(1, len(word) - 1)) AS i
            FROM words
        )
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM pairs
    GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT {k}
    """


# --- corpus-adaptive stopword discovery -----------------------------------------

STOPWORD_MIN_DF_MILLI = 600  # in >= 60% of the language's documents


def stopword_discovery(
    docs: DataFrame, min_df_milli: int = STOPWORD_MIN_DF_MILLI
) -> DataFrame:
    """Per-language corpus-derived stopword lists: a term present in >=
    ``min_df_milli``/1000 of a language's documents is a stopword for that
    language — how curation pipelines bootstrap lexicons for languages with
    no curated list (the CCNet per-language resource build).

    One distinct (lang, doc, term) explode (array_distinct BEFORE the
    explode — narrow), one (lang, term) document-frequency aggregate, and a
    broadcast join against the tiny per-language doc-count relation. Output
    is the lexicon, ordered by (lang, df desc, term)."""
    terms = docs.select(
        "lang",
        "doc_id",
        F.explode(
            F.array_distinct(F.split(_norm_text(F.col("text")), WS_RE))
        ).alias("term"),
    )
    df_rel = terms.groupBy("lang", "term").agg(F.count("*").alias("df"))
    lang_n = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    dfm = F.expr("CAST((2000 * df + n_docs) DIV (2 * n_docs) AS BIGINT)")
    return (
        df_rel.join(F.broadcast(lang_n), "lang")
        .select("lang", "term", "df", "n_docs", dfm.alias("df_milli"))
        .where(F.col("df_milli") >= min_df_milli)
        .orderBy("lang", F.desc("df"), "term")
    )


def stopword_discovery_sql(
    min_df_milli: int = STOPWORD_MIN_DF_MILLI, docs_rel: str = "documents"
) -> str:
    return rf"""
    WITH terms AS (
        SELECT DISTINCT lang, doc_id,
               unnest(string_split_regex({_norm_text_sql('text')}, '{WS_RE}'))
                   AS term
        FROM {docs_rel}
    ),
    df_rel AS (
        SELECT lang, term, COUNT(*) AS df FROM terms GROUP BY lang, term
    ),
    lang_n AS (
        SELECT lang, COUNT(*) AS n_docs FROM {docs_rel} GROUP BY lang
    )
    SELECT d.lang, d.term, d.df, l.n_docs,
           CAST((2000 * d.df + l.n_docs) // (2 * l.n_docs) AS BIGINT)
               AS df_milli
    FROM df_rel d JOIN lang_n l USING (lang)
    WHERE CAST((2000 * d.df + l.n_docs) // (2 * l.n_docs) AS BIGINT)
          >= {min_df_milli}
    ORDER BY lang, df DESC, term
    """


# --- BM25 retrieval scoring -----------------------------------------------------

BM25_K1_CENTI = 120  # k1 = 1.2
BM25_B_CENTI = 75    # b = 0.75
BM25_QUERY_TERMS = 3
BM25_TOP_K = 20


def bm25_topk(
    docs: DataFrame, n_query_terms: int = BM25_QUERY_TERMS, k: int = BM25_TOP_K
) -> DataFrame:
    """BM25 top-``k`` retrieval for a deterministic query (the corpus's
    ``n_query_terms`` most frequent non-stopword terms, df < 60%) — the
    classic lexical ranking function TF-IDF approximates; doc-length
    normalization (b) and tf saturation (k1) are what make it the retrieval
    baseline every RAG pipeline starts from.

    Exactness: idf and the per-(doc, term) saturation ratio are
    deterministic doubles over exact integer (tf, df, dl, N) statistics,
    each contribution rounds ONCE to micro ints and doc scores are
    order-free integer sums. Plan: the (doc, term) tf relation joins the
    broadcast ≤``n_query_terms``-row query-stats relation — corpus work is
    one tf aggregate; scoring touches only matching postings; distributed
    top-k."""
    k1 = BM25_K1_CENTI / 100
    b = BM25_B_CENTI / 100
    g = grams(docs, 1).withColumnRenamed("gram", "term")
    tf = g.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = g.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dstats = tf.groupBy("term").agg(F.count("*").alias("df"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").cast("long").alias("total_len")
    )
    qterms = (
        g.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .join(dstats, "term")
        .crossJoin(F.broadcast(corpus))
        .where(F.lit(1000) * F.col("df") < F.lit(600) * F.col("n_docs"))
        .orderBy(F.desc("cnt"), "term")
        .limit(n_query_terms)
        .select("term", "df", "n_docs", "total_len")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("total_len") / F.col("n_docs")
    contrib = F.expr(
        f"CAST(round(1e6 * idf * tf * {k1 + 1!r}"
        f" / (tf + {k1!r} * (1 - {b!r} + {b!r} * dl / avgdl))) AS BIGINT)"
    )
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .withColumn("idf", idf)
        .withColumn("avgdl", avgdl)
        .withColumn("c", contrib)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("bm25_micro"),
            F.count("*").alias("n_matched_terms"),
        )
        .orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(k)
    )


def bm25_topk_sql(
    n_query_terms: int = BM25_QUERY_TERMS,
    k: int = BM25_TOP_K,
    docs_rel: str = "documents",
) -> str:
    k1 = BM25_K1_CENTI / 100
    b = BM25_B_CENTI / 100
    return f"""
    WITH g AS (
        SELECT doc_id, gram AS term FROM ({grams_sql(1, docs_rel)})
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM g GROUP BY doc_id, term
    ),
    dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM g GROUP BY doc_id
    ),
    dstats AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    corpus AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len
        FROM dl
    ),
    qterms AS (
        SELECT t.term, d.df, c.n_docs, c.total_len
        FROM (SELECT term, COUNT(*) AS cnt FROM g GROUP BY term) t
        JOIN dstats d USING (term)
        CROSS JOIN corpus c
        WHERE 1000 * d.df < 600 * c.n_docs
        ORDER BY t.cnt DESC, t.term
        LIMIT {n_query_terms}
    )
    SELECT f.doc_id,
           CAST(SUM(CAST(round(
               1e6 * ln((q.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
               * f.tf * {k1 + 1!r}
               / (f.tf + {k1!r} * (1 - {b!r}
                  + {b!r} * l.dl / (CAST(q.total_len AS DOUBLE) / q.n_docs)))
           ) AS BIGINT)) AS BIGINT) AS bm25_micro,
           COUNT(*) AS n_matched_terms
    FROM tf f
    JOIN qterms q USING (term)
    JOIN dl l USING (doc_id)
    GROUP BY f.doc_id
    ORDER BY bm25_micro DESC, f.doc_id
    LIMIT {k}
    """


# --- Jensen-Shannon divergence between source unigram mixes ------------------------

JS_VOCAB_K = 50
JS_REST = "<rest>"


def js_divergence_sources(docs: DataFrame, k: int = JS_VOCAB_K) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions: (source_a, source_b, js_micro) — the corpus-drift /
    mixture-similarity matrix curation reads when deciding whether two
    crawls are interchangeable or a new source shifts the mix.

    Distributions live on the global top-``k`` vocabulary plus one ``<rest>``
    bucket, so the support is identical (and bounded) for every source.
    JS(p,q) = ½KL(p‖m) + ½KL(q‖m), m = (p+q)/2, expanded over exact integer
    counts: with a_t/A and b_t/B the term ratios, ln(p_t/m_t) =
    ln(2·a_t·B) − ln(a_t·B + b_t·A) — each ln of an exact integer quantized
    once to micro-nats, summed exactly, divided by A (resp. B) on
    identically-agreed operands. Zero-count terms contribute zero (the
    0·ln 0 convention). Count products must stay in int64 — at trillion-
    token scale rescale counts per pair (divide both sides by a common
    power of two) before the product; the fixture grain is far inside.

    Scale shape: term counts aggregate per (source, term) on the bounded
    vocab+rest support; the dense grid is a broadcast cross join of two
    bounded dims (|sources| × (k+1)); the pair join is grid × grid on term
    — everything after the one token-stream aggregate is dimension-sized."""
    toks = grams(docs.select("doc_id", "text"), 1).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    vocab = (
        toks.groupBy(F.col("gram").alias("term"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(k)
        .select("term")
    )
    termed = toks.join(
        F.broadcast(vocab), toks["gram"] == vocab["term"], "left"
    ).select(
        "source",
        F.coalesce("term", F.lit(JS_REST)).alias("term"),
    )
    counts = termed.groupBy("source", "term").agg(F.count("*").alias("c"))
    support = vocab.unionByName(
        termed.sparkSession.createDataFrame([(JS_REST,)], "term string")
    )
    sources = counts.select("source").distinct()
    grid = (
        sources.crossJoin(F.broadcast(support))
        .join(counts, ["source", "term"], "left")
        .select("source", "term", F.coalesce("c", F.lit(0)).alias("c"))
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("tot"))
    ga = grid.join(totals, "source").select(
        F.col("source").alias("source_a"),
        "term",
        F.col("c").alias("a"),
        F.col("tot").alias("ta"),
    )
    gb = grid.join(totals, "source").select(
        F.col("source").alias("source_b"),
        "term",
        F.col("c").alias("b"),
        F.col("tot").alias("tb"),
    )
    lnm = lambda c: F.round(F.log(c) * F.lit(1e6)).cast("long")  # noqa: E731
    paired = ga.join(gb, "term").where(F.col("source_a") < F.col("source_b"))
    contrib = paired.select(
        "source_a",
        "source_b",
        "ta",
        "tb",
        F.when(
            F.col("a") > 0,
            F.col("a") * (lnm(2 * F.col("a") * F.col("tb"))
                          - lnm(F.col("a") * F.col("tb") + F.col("b") * F.col("ta"))),
        )
        .otherwise(F.lit(0))
        .alias("na"),
        F.when(
            F.col("b") > 0,
            F.col("b") * (lnm(2 * F.col("b") * F.col("ta"))
                          - lnm(F.col("a") * F.col("tb") + F.col("b") * F.col("ta"))),
        )
        .otherwise(F.lit(0))
        .alias("nb"),
    )
    return (
        contrib.groupBy("source_a", "source_b")
        .agg(
            F.sum("na").alias("num_a"),
            F.sum("nb").alias("num_b"),
            F.max("ta").alias("ta"),
            F.max("tb").alias("tb"),
        )
        .select(
            "source_a",
            "source_b",
            F.round(
                (F.col("num_a") / F.col("ta") + F.col("num_b") / F.col("tb"))
                / F.lit(2.0)
            )
            .cast("long")
            .alias("js_micro"),
        )
        .orderBy("source_a", "source_b")
    )


def js_divergence_sources_sql(k: int = JS_VOCAB_K, docs_rel: str = "documents") -> str:
    lnm = lambda e: f"CAST(round(ln({e}) * 1e6) AS BIGINT)"  # noqa: E731
    return f"""
        WITH toks AS (
            SELECT t.doc_id, t.gram, d.source
            FROM ({grams_sql(1, docs_rel)}) t
            JOIN {docs_rel} d USING (doc_id)
        ),
        vocab AS (
            SELECT gram AS term FROM toks GROUP BY gram
            ORDER BY COUNT(*) DESC, gram ASC LIMIT {k}
        ),
        termed AS (
            SELECT source, COALESCE(v.term, '{JS_REST}') AS term
            FROM toks LEFT JOIN vocab v ON toks.gram = v.term
        ),
        counts AS (
            SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
            FROM termed GROUP BY source, term
        ),
        support AS (
            SELECT term FROM vocab UNION ALL SELECT '{JS_REST}'
        ),
        grid AS (
            SELECT s.source, sup.term, COALESCE(c.c, 0) AS c
            FROM (SELECT DISTINCT source FROM counts) s
            CROSS JOIN support sup
            LEFT JOIN counts c ON c.source = s.source AND c.term = sup.term
        ),
        totals AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS tot
            FROM counts GROUP BY source
        ),
        paired AS (
            SELECT ga.source AS source_a, gb.source AS source_b, ga.term,
                   ga.c AS a, ta.tot AS ta, gb.c AS b, tb.tot AS tb
            FROM grid ga
            JOIN totals ta ON ta.source = ga.source
            JOIN grid gb ON ga.term = gb.term AND ga.source < gb.source
            JOIN totals tb ON tb.source = gb.source
        ),
        contrib AS (
            SELECT source_a, source_b, ta, tb,
                   CASE WHEN a > 0 THEN a * ({lnm('2 * a * tb')}
                                            - {lnm('a * tb + b * ta')})
                        ELSE 0 END AS na,
                   CASE WHEN b > 0 THEN b * ({lnm('2 * b * ta')}
                                             - {lnm('a * tb + b * ta')})
                        ELSE 0 END AS nb
            FROM paired
        )
        SELECT source_a, source_b,
               CAST(round((CAST(SUM(na) AS DOUBLE) / MAX(ta)
                           + CAST(SUM(nb) AS DOUBLE) / MAX(tb)) / 2.0)
                    AS BIGINT) AS js_micro
        FROM contrib
        GROUP BY source_a, source_b
        ORDER BY source_a, source_b
    """


# --- RAKE keyword extraction ---------------------------------------------------------

RAKE_STOP = (
    "the", "and", "of", "to", "in", "is", "that", "for", "with", "as",
    "a", "an", "it", "on", "at",
)
RAKE_TOP_K = 20


def rake_keywords(docs: DataFrame, k: int = RAKE_TOP_K) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are maximal
    stopword-free token runs; a word scores degree/freq (degree = total
    length of phrases it appears in), a phrase scores the sum of its word
    scores — (rank, phrase, n_words, n_occurrences, score_milli).

    The classic unsupervised keyphrase baseline, complementary to TF-IDF
    (which can't score multi-word phrases). All scores are half-up integer
    milli on exact degree/freq counts — no float.

    Scale shape: phrase segmentation is one per-doc cumulative window over
    token positions; degree/freq are word-keyed aggregates; the final
    ranking is a distributed top-k over the phrase aggregate."""
    toks = docs.select(
        "doc_id", F.posexplode(F.split(_norm_text(F.col("text")), WS_RE)).alias("pos", "w")
    ).withColumn("is_stop", F.col("w").isin(*RAKE_STOP) | (F.col("w") == ""))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    seg = toks.withColumn(
        "phrase_id",
        F.sum(F.col("is_stop").cast("int")).over(
            wd.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).where(~F.col("is_stop"))
    plens = seg.groupBy("doc_id", "phrase_id").agg(
        F.count("*").alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda x: x["w"],
            ),
            " ",
        ).alias("phrase"),
    )
    word_stats = (
        seg.join(plens.select("doc_id", "phrase_id", "plen"), ["doc_id", "phrase_id"])
        .groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("degree"))
        .select(
            "w",
            F.expr(
                "CAST((2 * 1000 * degree + freq) DIV (2 * freq) AS BIGINT)"
            ).alias("w_score_milli"),
        )
    )
    phrase_scores = (
        seg.join(F.broadcast(word_stats), "w")
        .groupBy("doc_id", "phrase_id")
        .agg(F.sum("w_score_milli").alias("score_milli"))
        .join(plens, ["doc_id", "phrase_id"])
        .groupBy("phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.max("plen").cast("long").alias("n_words"),
            F.max("score_milli").cast("long").alias("score_milli"),
        )
    )
    wr = Window.orderBy(F.col("score_milli").desc(), F.col("phrase").asc())
    return (
        phrase_scores.orderBy(F.col("score_milli").desc(), F.col("phrase").asc())
        .limit(k)
        .select(
            F.row_number().over(wr).cast("long").alias("rank"),
            "phrase",
            "n_words",
            "n_occurrences",
            "score_milli",
        )
        .orderBy("rank")
    )


def rake_keywords_sql(k: int = RAKE_TOP_K, docs_rel: str = "documents") -> str:
    stop = ", ".join(f"'{w}'" for w in RAKE_STOP)
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   generate_subscripts(w_list, 1) AS pos,
                   unnest(w_list) AS w
            FROM (
                SELECT doc_id,
                       string_split_regex({_norm_text_sql('text')}, '{WS_RE}')
                           AS w_list
                FROM {docs_rel}
            )
        ),
        marked AS (
            SELECT doc_id, pos, w,
                   (w IN ({stop}) OR w = '') AS is_stop
            FROM toks
        ),
        seg AS (
            -- the window must see the stopword rows (they delimit phrases);
            -- WHERE runs before OVER, so filter OUTSIDE the window subquery
            SELECT doc_id, pos, w, phrase_id FROM (
                SELECT doc_id, pos, w, is_stop,
                       SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS phrase_id
                FROM marked
            ) WHERE NOT is_stop
        ),
        plens AS (
            SELECT doc_id, phrase_id, CAST(COUNT(*) AS BIGINT) AS plen,
                   string_agg(w, ' ' ORDER BY pos) AS phrase
            FROM seg GROUP BY doc_id, phrase_id
        ),
        word_stats AS (
            SELECT s.w,
                   CAST((2 * 1000 * SUM(p.plen) + COUNT(*))
                        // (2 * COUNT(*)) AS BIGINT) AS w_score_milli
            FROM seg s JOIN plens p USING (doc_id, phrase_id)
            GROUP BY s.w
        ),
        phrase_scores AS (
            SELECT p.phrase,
                   CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                   CAST(MAX(p.plen) AS BIGINT) AS n_words,
                   CAST(MAX(sc.score) AS BIGINT) AS score_milli
            FROM (
                SELECT doc_id, phrase_id,
                       CAST(SUM(w_score_milli) AS BIGINT) AS score
                FROM seg JOIN word_stats USING (w)
                GROUP BY doc_id, phrase_id
            ) sc
            JOIN plens p USING (doc_id, phrase_id)
            GROUP BY p.phrase
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_milli DESC, phrase ASC)
                    AS BIGINT) AS rank,
               phrase, n_words, n_occurrences, score_milli
        FROM phrase_scores
        ORDER BY score_milli DESC, phrase ASC
        LIMIT {k}
    """


# --- PMI collocations ----------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP_K = 30


def collocations_pmi(
    docs: DataFrame, min_count: int = PMI_MIN_COUNT, k: int = PMI_TOP_K
) -> DataFrame:
    """Top-``k`` word-bigram collocations by pointwise mutual information:
    (bigram, c12, c1, c2, pmi_micro, rank) — the Church & Hanks (1990)
    association measure that surfaces multiword units ("new york") for
    tokenizer/vocabulary decisions, with a ``min_count`` floor because PMI
    is notoriously noisy on rare pairs.

    PMI = ln(p12/(p1·p2)) decomposes over exact integer counts as
    μ(c12) + 2μ(N1) − μ(N2) − μ(c1) − μ(c2), where μ is the micro-nat
    quantization (one round(ln·1e6) per EXACT integer operand — the
    user_entropy convention), so the score, ordering and hash are
    bit-stable cross-engine: every arithmetic step after the single ln per
    operand is BIGINT.

    Scale shape: the unigram model attaches by two term-keyed joins (the
    bigram_backoff discipline — no driver-side dictionary), the corpus
    totals are 1-row broadcast scalars, and the top-k is
    TakeOrderedAndProject — no global sort of the pair dictionary."""
    micro = lambda col: F.round(F.log(col) * F.lit(1e6)).cast("long")  # noqa: E731
    uni = (
        grams(docs, 1)
        .groupBy(F.col("gram").alias("term"))
        .agg(F.count("*").alias("c"))
    )
    bi = (
        grams(docs, 2)
        .groupBy(F.col("gram").alias("bigram"))
        .agg(F.count("*").alias("c12"))
        .where(F.col("c12") >= min_count)
    )
    totals = (
        grams(docs, 1)
        .agg(F.count("*").alias("n1"))
        .crossJoin(F.broadcast(grams(docs, 2).agg(F.count("*").alias("n2"))))
    )
    scored = (
        bi.withColumn("w1", F.split(F.col("bigram"), " ")[0])
        .withColumn("w2", F.split(F.col("bigram"), " ")[1])
        .join(uni.select(F.col("term").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "bigram",
            "c12",
            "c1",
            "c2",
            (
                micro(F.col("c12"))
                + F.lit(2) * micro(F.col("n1"))
                - micro(F.col("n2"))
                - micro(F.col("c1"))
                - micro(F.col("c2"))
            ).alias("pmi_micro"),
        )
    )
    order = [F.col("pmi_micro").desc(), F.col("bigram").asc()]
    return (
        scored.orderBy(*order)
        .limit(k)
        .select(
            "bigram",
            "c12",
            "c1",
            "c2",
            "pmi_micro",
            F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
        )
    )


def collocations_pmi_sql(
    min_count: int = PMI_MIN_COUNT,
    k: int = PMI_TOP_K,
    docs_rel: str = "documents",
) -> str:
    mu = "CAST(round(ln({x}) * 1e6) AS BIGINT)"
    return f"""
        WITH uni AS (
            SELECT gram AS term, COUNT(*) AS c
            FROM ({grams_sql(1, docs_rel)}) GROUP BY gram
        ),
        bi AS (
            SELECT gram AS bigram, COUNT(*) AS c12
            FROM ({grams_sql(2, docs_rel)}) GROUP BY gram
            HAVING COUNT(*) >= {min_count}
        ),
        totals AS (
            SELECT (SELECT COUNT(*) FROM ({grams_sql(1, docs_rel)})) AS n1,
                   (SELECT COUNT(*) FROM ({grams_sql(2, docs_rel)})) AS n2
        ),
        scored AS (
            SELECT b.bigram, b.c12, u1.c AS c1, u2.c AS c2,
                   {mu.format(x="b.c12")} + 2 * {mu.format(x="t.n1")}
                   - {mu.format(x="t.n2")} - {mu.format(x="u1.c")}
                   - {mu.format(x="u2.c")} AS pmi_micro
            FROM bi b
            JOIN uni u1 ON u1.term = string_split(b.bigram, ' ')[1]
            JOIN uni u2 ON u2.term = string_split(b.bigram, ' ')[2]
            CROSS JOIN totals t
        )
        SELECT bigram, c12, c1, c2, pmi_micro,
               CAST(ROW_NUMBER() OVER (ORDER BY pmi_micro DESC, bigram ASC)
                   AS BIGINT) AS rank
        FROM scored
        ORDER BY pmi_micro DESC, bigram ASC
        LIMIT {k}
    """


# --- tokenizer vocabulary budget curve -----------------------------------------

BUDGET_VOCAB_KS = (100, 200, 400)


def vocab_budget_curve(docs: DataFrame) -> DataFrame:
    """Tokenizer budget curve: corpus token count under candidate
    vocabulary sizes k ∈ {BUDGET_VOCAB_KS} with character fallback — a
    word in the top-k unigram vocab costs 1 token, anything else falls
    back to its characters (the byte-fallback cost a too-small vocab
    pays): (vocab_k, n_in_vocab, n_fallback_words, total_tokens,
    tokens_per_100_words). The curve's knee chooses the vocabulary budget;
    this is [[vocab_oov_rate]]'s cost-model completion.

    Vocabularies are deterministic (count desc, term asc); the per-word
    cost is CASE in-vocab THEN 1 ELSE length(word); totals are exact
    BIGINTs and the rate one half-up division.

    Scale shape: one term aggregate reused across the sweep; each k is a
    broadcast top-k membership join against the token stream, unioned —
    the elbow-sweep economics on text."""
    g = grams(docs, 1).withColumnRenamed("gram", "term")
    counts = g.groupBy("term").agg(F.count("*").alias("cnt"))
    sweeps = []
    for k in BUDGET_VOCAB_KS:
        vocab = (
            counts.orderBy(F.col("cnt").desc(), F.col("term").asc())
            .limit(k)
            .select("term", F.lit(1).alias("in_v"))
        )
        sweeps.append(
            g.join(F.broadcast(vocab), "term", "left")
            .agg(
                F.lit(k).cast("long").alias("vocab_k"),
                F.sum(F.when(F.col("in_v").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_in_vocab"),
                F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_fallback_words"),
                F.sum(
                    F.when(F.col("in_v").isNotNull(), 1).otherwise(
                        F.length("term")
                    )
                )
                .cast("long")
                .alias("total_tokens"),
                F.count("*").cast("long").alias("n_words"),
            )
        )
    out = sweeps[0]
    for s in sweeps[1:]:
        out = out.unionByName(s)
    return out.select(
        "vocab_k",
        "n_in_vocab",
        "n_fallback_words",
        "total_tokens",
        F.expr(
            "CAST((200 * total_tokens + n_words) DIV (2 * n_words) AS BIGINT)"
        ).alias("tokens_per_100_words"),
    ).orderBy("vocab_k")


def vocab_budget_curve_sql(docs_rel: str = "documents") -> str:
    parts = []
    for k in BUDGET_VOCAB_KS:
        parts.append(
            f"""
            SELECT CAST({k} AS BIGINT) AS vocab_k,
                   CAST(SUM(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_in_vocab,
                   CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_fallback_words,
                   CAST(SUM(CASE WHEN v.term IS NOT NULL THEN 1
                            ELSE len(g.term) END) AS BIGINT) AS total_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_words
            FROM (SELECT doc_id, gram AS term FROM ({grams_sql(1, docs_rel)})) g
            LEFT JOIN (
                SELECT term FROM (
                    SELECT gram AS term, COUNT(*) AS cnt
                    FROM ({grams_sql(1, docs_rel)}) GROUP BY gram
                ) ORDER BY cnt DESC, term ASC LIMIT {k}
            ) v USING (term)"""
        )
    union = " UNION ALL ".join(parts)
    return f"""
        WITH sweeps AS ({union})
        SELECT vocab_k, n_in_vocab, n_fallback_words, total_tokens,
               CAST((200 * total_tokens + n_words) // (2 * n_words) AS BIGINT)
                   AS tokens_per_100_words
        FROM sweeps
        ORDER BY vocab_k
    """


# --- TextRank keywords ---------------------------------------------------------

TEXTRANK_ITERS = 3
TEXTRANK_DAMPING = 0.85
TEXTRANK_MIN_COOC = 3
TEXTRANK_TOP_K = 25
TEXTRANK_MIN_LEN = 4


def textrank_keywords(docs: DataFrame) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): PageRank
    over the word co-occurrence graph — adjacent words (length >=
    {TEXTRANK_MIN_LEN}, co-count >= {TEXTRANK_MIN_COOC}) form weighted
    edges, {TEXTRANK_ITERS} damped power rounds rank them, top-
    {TEXTRANK_TOP_K} emitted: (term, degree, score, rank). The
    graph-centrality extractor beside RAKE's degree/frequency heuristic.

    Execution is the copurchase_pagerank discipline verbatim: fixed
    unrolled rounds (one weighted-contribution aggregate + rank join per
    round), the oracle chains the same CTEs, scores round(·, 6) at the
    certified emission boundary.

    Scale shape: edges are one bigram aggregate off the gram stream;
    rounds are term-keyed joins on the bounded word-graph relation."""
    bi = (
        grams(docs, 2)
        .select(
            F.split(F.col("gram"), " ")[0].alias("w1"),
            F.split(F.col("gram"), " ")[1].alias("w2"),
        )
        .where(
            (F.length("w1") >= TEXTRANK_MIN_LEN)
            & (F.length("w2") >= TEXTRANK_MIN_LEN)
            & (F.col("w1") != F.col("w2"))
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= TEXTRANK_MIN_COOC)
    )
    edges = (
        bi.select(F.col("w1").alias("src"), F.col("w2").alias("dst"), "cnt")
        .unionByName(
            bi.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "cnt")
        )
        .groupBy("src", "dst")
        .agg(F.sum("cnt").alias("w"))
        .localCheckpoint(eager=False)
    )
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"), F.count("*").alias("degree"))
    contrib_base = edges.join(wdeg.select("src", "wdeg"), "src")
    d = TEXTRANK_DAMPING
    ranks = wdeg.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    for _ in range(TEXTRANK_ITERS):
        ranks = (
            contrib_base.join(ranks, F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("w") / F.col("wdeg")).alias("mass"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(1.0 - d) + F.lit(d) * F.col("mass")).alias("r"),
            )
        )
    order = [F.desc("score"), F.asc("term")]
    return (
        ranks.join(wdeg, ranks["node"] == wdeg["src"])
        .select(
            F.col("node").alias("term"),
            F.col("degree").cast("long").alias("degree"),
            F.round("r", 6).alias("score"),
        )
        .orderBy(*order)
        .limit(TEXTRANK_TOP_K)
        .select(
            "term",
            "degree",
            "score",
            F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
        )
    )


def textrank_keywords_sql(docs_rel: str = "documents") -> str:
    d = TEXTRANK_DAMPING
    its = ["r0 AS (SELECT src AS node, 1.0 AS r FROM wdeg)"]
    for i in range(1, TEXTRANK_ITERS + 1):
        its.append(
            f"""r{i} AS (
            SELECT c.dst AS node,
                   {1 - d} + {d} * SUM(r.r * c.w / c.wdeg) AS r
            FROM contrib c JOIN r{i - 1} r ON c.src = r.node
            GROUP BY c.dst
        )"""
        )
    chain = ",\n        ".join(its)
    return f"""
        WITH bi AS (
            SELECT string_split(gram, ' ')[1] AS w1,
                   string_split(gram, ' ')[2] AS w2,
                   COUNT(*) AS cnt
            FROM ({grams_sql(2, docs_rel)})
            WHERE len(string_split(gram, ' ')[1]) >= {TEXTRANK_MIN_LEN}
              AND len(string_split(gram, ' ')[2]) >= {TEXTRANK_MIN_LEN}
              AND string_split(gram, ' ')[1] <> string_split(gram, ' ')[2]
            GROUP BY 1, 2
            HAVING COUNT(*) >= {TEXTRANK_MIN_COOC}
        ),
        edges AS (
            SELECT src, dst, SUM(cnt) AS w FROM (
                SELECT w1 AS src, w2 AS dst, cnt FROM bi
                UNION ALL SELECT w2, w1, cnt FROM bi
            ) GROUP BY src, dst
        ),
        wdeg AS (
            SELECT src, SUM(w) AS wdeg, COUNT(*) AS degree
            FROM edges GROUP BY src
        ),
        contrib AS (
            SELECT e.src, e.dst, e.w, d.wdeg
            FROM edges e JOIN wdeg d ON d.src = e.src
        ),
        {chain}
        SELECT node AS term, CAST(degree AS BIGINT) AS degree,
               round(r, 6) AS score,
               CAST(ROW_NUMBER() OVER (ORDER BY round(r, 6) DESC, node ASC)
                   AS BIGINT) AS rank
        FROM r{TEXTRANK_ITERS} JOIN wdeg ON wdeg.src = node
        ORDER BY score DESC, term ASC
        LIMIT {TEXTRANK_TOP_K}
    """


# --- term burstiness -----------------------------------------------------------

BURSTINESS_TOP_K = 30


def term_burstiness(docs: DataFrame, k: int = BURSTINESS_TOP_K) -> DataFrame:
    """Church-Gale term burstiness for the top-{BURSTINESS_TOP_K} corpus
    terms: cf/df — mean occurrences per document CONTAINING the term.
    Function words sit near 1 (appear once, everywhere); topical/templated
    terms burst (many repeats in few documents) — the signal separating
    stopword candidates from content words that raw frequency conflates:
    (term, cf, df, burstiness_milli, rank).

    One gram aggregate computes cf and df together (count + distinct-doc
    count per term, map-side combined); the top-k is distributed
    (TakeOrderedAndProject), milli division exact.

    Scale shape: term-keyed aggregate + k-row rank window."""
    stats_df = (
        grams(docs, 1)
        .groupBy(F.col("gram").alias("term"))
        .agg(
            F.count("*").alias("cf"),
            F.countDistinct("doc_id").alias("df"),
        )
    )
    order = [F.col("cf").desc(), F.col("term").asc()]
    return (
        stats_df.orderBy(*order)
        .limit(k)
        .select(
            "term",
            F.col("cf").cast("long").alias("cf"),
            F.col("df").cast("long").alias("df"),
            F.expr("CAST(1000 * cf DIV df AS BIGINT)").alias(
                "burstiness_milli"
            ),
            F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
        )
    )


def term_burstiness_sql(
    k: int = BURSTINESS_TOP_K, docs_rel: str = "documents"
) -> str:
    return f"""
        WITH stats AS (
            SELECT gram AS term, COUNT(*) AS cf,
                   COUNT(DISTINCT doc_id) AS df
            FROM ({grams_sql(1, docs_rel)})
            GROUP BY gram
        )
        SELECT term, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
               CAST(1000 * cf // df AS BIGINT) AS burstiness_milli,
               CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, term ASC) AS BIGINT)
                   AS rank
        FROM stats
        ORDER BY cf DESC, term ASC
        LIMIT {k}
    """


# --- Heaps'-law vocabulary growth ---------------------------------------------


def heaps_law(docs: DataFrame) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: distinct terms vs corpus
    prefix size, the sizing input for tokenizer vocab budgets and the
    sanity check that a "new" data source actually brings new words.

    Prefixes are doc_id ranges at power-of-two boundaries (docs with
    doc_id < 2^k), so the curve needs NO global row-number window:
    each term contributes one row at the bucket of its FIRST doc_id
    (bit-length of the id), each doc contributes its token count at its
    own bucket, and the cumulative curve is a running sum over the ≤64
    bucket rows. One row per occupied bit-length bucket:
    (prefix_limit, n_docs, n_tokens, n_terms) — all exact BIGINTs,
    cumulative.

    Scale shape: one term-keyed aggregate (min doc_id per term) and one
    doc-keyed token count; the window runs over the ≤64-row bucket
    rollup, never the corpus."""
    toks = grams(docs, 1)
    term_first = toks.groupBy("gram").agg(F.min("doc_id").alias("first_id"))
    bl = lambda c: F.length(F.bin(F.col(c))).cast("int")  # noqa: E731
    terms_per = term_first.groupBy(bl("first_id").alias("bucket")).agg(
        F.count("*").cast("long").alias("new_terms")
    )
    docs_per = (
        toks.groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"))
        .groupBy(bl("doc_id").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("new_docs"),
            F.sum("n_tok").cast("long").alias("new_tokens"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        docs_per.join(terms_per, "bucket", "full")
        .select(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), bucket) - 1 AS BIGINT)"
            ).alias("prefix_limit"),
            F.col("bucket"),
            F.coalesce("new_docs", F.lit(0)).alias("nd"),
            F.coalesce("new_tokens", F.lit(0)).alias("nt"),
            F.coalesce("new_terms", F.lit(0)).alias("nv"),
        )
        .select(
            "prefix_limit",
            F.sum("nd").over(w).cast("long").alias("n_docs"),
            F.sum("nt").over(w).cast("long").alias("n_tokens"),
            F.sum("nv").over(w).cast("long").alias("n_terms"),
        )
        .orderBy("prefix_limit")
    )


HEAPS_LAW_SQL = f"""
    WITH toks AS ({grams_sql(1)}),
    term_first AS (
        SELECT gram, MIN(doc_id) AS first_id FROM toks GROUP BY gram
    ),
    terms_per AS (
        SELECT length(bin(first_id)) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS new_terms
        FROM term_first GROUP BY 1
    ),
    docs_per AS (
        SELECT length(bin(doc_id)) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS new_docs,
               CAST(SUM(n_tok) AS BIGINT) AS new_tokens
        FROM (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id)
        GROUP BY 1
    )
    SELECT CAST((CAST(1 AS BIGINT) << bucket) - 1 AS BIGINT) AS prefix_limit,
           CAST(SUM(COALESCE(new_docs, 0)) OVER (
               ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_docs,
           CAST(SUM(COALESCE(new_tokens, 0)) OVER (
               ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_tokens,
           CAST(SUM(COALESCE(new_terms, 0)) OVER (
               ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_terms
    FROM docs_per FULL JOIN terms_per USING (bucket)
    ORDER BY prefix_limit
"""


# --- effective token yield ----------------------------------------------------------


def token_yield(docs: DataFrame) -> DataFrame:
    """Effective token yield per source: raw tokens vs tokens surviving
    the first-occurrence exact-dedup keep rule — the number that turns
    "we have X TB of source S" into "S contributes Y real training
    tokens", which is what mixture budgeting actually spends.

    Output per source: (source, n_docs, raw_tokens, kept_tokens,
    yield_milli). Exact integers; token counts are unigram counts from
    the shared normalizer.

    Scale shape: one fingerprint keep window over (doc, len) grain, one
    source rollup — token counting is a narrow size() projection, never
    an explode."""
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(_norm_text(F.col("text")), WS_RE)).alias("n_tok"),
        F.md5(_norm_text(F.col("text"))).alias("fp"),
    )
    keep = toks.withColumn(
        "keep",
        (
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp"))
        ).cast("long"),
    )
    return (
        keep.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("raw_tokens"),
            F.sum(F.col("keep") * F.col("n_tok")).cast("long").alias(
                "kept_tokens"
            ),
        )
        .withColumn(
            "yield_milli",
            F.expr("CAST(1000 * kept_tokens DIV raw_tokens AS BIGINT)"),
        )
        .orderBy("source")
    )


TOKEN_YIELD_SQL = f"""
    WITH toks AS (
        SELECT doc_id, source,
               len(string_split_regex({_norm_text_sql('text')}, '{WS_RE}'))
                   AS n_tok,
               md5({_norm_text_sql('text')}) AS fp
        FROM documents
    ),
    keep AS (
        SELECT source, n_tok,
               CAST(doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS BIGINT)
                   AS keep
        FROM toks
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS raw_tokens,
           CAST(SUM(keep * n_tok) AS BIGINT) AS kept_tokens,
           CAST(1000 * SUM(keep * n_tok) // SUM(n_tok) AS BIGINT)
               AS yield_milli
    FROM keep
    GROUP BY source
    ORDER BY source
"""


# --- cross-language vocabulary overlap -------------------------------------------------


def lang_overlap(docs: DataFrame) -> DataFrame:
    """Cross-language vocabulary overlap: Jaccard of the distinct-token
    vocabularies for every language pair — high overlap between two
    supposedly-different languages is the smoking gun for lang-ID
    errors, code-switching, or untranslated boilerplate leaking across
    splits. Output per pair: (lang_a, lang_b, vocab_a, vocab_b,
    n_shared, jaccard_milli).

    The (lang, term) relation is the vocab grain (distinct, one
    shuffle); the pair join is term-keyed between bounded-language
    vocabularies, then one bounded pair rollup. Exact integers.

    Scale shape: term-keyed equi-join (the term domain is the join
    key, languages are data) — never a lang × lang Cartesian over
    terms."""
    # grams() keys by doc_id; re-attach lang via the docs projection
    toks = grams(docs, 1).join(
        F.broadcast(docs.select("doc_id", "lang")), "doc_id"
    )
    vocab = toks.select("lang", "gram").distinct()
    margins = vocab.groupBy("lang").agg(F.count("*").alias("v"))
    shared = (
        vocab.alias("a")
        .join(
            vocab.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    ma = margins.select(F.col("lang").alias("lang_a"), F.col("v").alias("vocab_a"))
    mb = margins.select(F.col("lang").alias("lang_b"), F.col("v").alias("vocab_b"))
    return (
        shared.join(F.broadcast(ma), "lang_a")
        .join(F.broadcast(mb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            "n_shared",
            F.expr(
                "CAST(1000 * n_shared DIV (vocab_a + vocab_b - n_shared)"
                " AS BIGINT)"
            ).alias("jaccard_milli"),
        )
        .orderBy("lang_a", "lang_b")
    )


LANG_OVERLAP_SQL = f"""
    WITH toks AS ({grams_sql(1)}),
    vocab AS (
        SELECT DISTINCT d.lang, t.gram
        FROM toks t JOIN documents d USING (doc_id)
    ),
    margins AS (SELECT lang, COUNT(*) AS v FROM vocab GROUP BY lang),
    shared AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM vocab a JOIN vocab b
          ON a.gram = b.gram AND a.lang < b.lang
        GROUP BY 1, 2
    )
    SELECT s.lang_a, s.lang_b,
           CAST(ma.v AS BIGINT) AS vocab_a,
           CAST(mb.v AS BIGINT) AS vocab_b,
           s.n_shared,
           CAST(1000 * s.n_shared // (ma.v + mb.v - s.n_shared) AS BIGINT)
               AS jaccard_milli
    FROM shared s
    JOIN margins ma ON ma.lang = s.lang_a
    JOIN margins mb ON mb.lang = s.lang_b
    ORDER BY s.lang_a, s.lang_b
"""


# --- hapax / vocabulary-richness profile ----------------------------------------------


def hapax_profile(docs: DataFrame) -> DataFrame:
    """Vocabulary-richness profile per source: hapax legomena share
    (terms occurring exactly once) and type-token ratio — the cheap,
    sensitive detectors for OCR noise and machine-generated filler
    (noise inflates hapax; template spam crushes TTR). Output per
    source: (source, n_tokens, n_types, n_hapax, ttr_milli,
    hapax_milli).

    Scale shape: one (source, term) aggregate with map-side combine,
    one bounded source rollup. Exact integers."""
    toks = grams(docs, 1).join(
        F.broadcast(docs.select("doc_id", "source")), "doc_id"
    )
    terms = toks.groupBy("source", "gram").agg(F.count("*").alias("tf"))
    return (
        terms.groupBy("source")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum((F.col("tf") == 1).cast("long")).cast("long").alias(
                "n_hapax"
            ),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr("CAST(1000 * n_types DIV n_tokens AS BIGINT)").alias(
                "ttr_milli"
            ),
            F.expr("CAST(1000 * n_hapax DIV n_types AS BIGINT)").alias(
                "hapax_milli"
            ),
        )
        .orderBy("source")
    )


HAPAX_PROFILE_SQL = f"""
    WITH toks AS ({grams_sql(1)}),
    terms AS (
        SELECT d.source, t.gram, COUNT(*) AS tf
        FROM toks t JOIN documents d USING (doc_id)
        GROUP BY 1, 2
    ),
    panel AS (
        SELECT source,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
        FROM terms GROUP BY source
    )
    SELECT source, n_tokens, n_types, n_hapax,
           CAST(1000 * n_types // n_tokens AS BIGINT) AS ttr_milli,
           CAST(1000 * n_hapax // n_types AS BIGINT) AS hapax_milli
    FROM panel
    ORDER BY source
"""


# --- text predictability (conditional bigram entropy) -----------------------------------


def predictability(docs: DataFrame) -> DataFrame:
    """Per-source text predictability: the conditional word entropy
    H(w₂|w₁) = H(w₁w₂) − H(w₁) over each source's bigram stream, in
    exact micro-nats — low conditional entropy marks templated /
    machine-generated text (the next word is nearly determined),
    high marks diverse natural prose; the per-source companion to the
    document-level repetition signals.

    The entropy identity reduces to (Σ c₁·ln c₁ − Σ c₁₂·ln c₁₂) / N
    — each ln quantizes ONCE per distinct count to micro-nats (the
    events_user_entropy treatment), sums are exact BIGINTs, one signed
    half-up division at the end. Output per source:
    (source, n_bigrams, cond_entropy_micro).

    Scale shape: one (source, bigram) aggregate and its context
    marginal (both map-side combinable), bounded source rollup."""
    micro = lambda col: F.round(F.log(col) * F.lit(1e6)).cast("long")  # noqa: E731
    bg = grams(docs, 2).join(
        F.broadcast(docs.select("doc_id", "source")), "doc_id"
    )
    c12 = bg.groupBy("source", "gram").agg(F.count("*").alias("c"))
    c1 = (
        bg.select("source", F.expr("split_part(gram, ' ', 1)").alias("w1"))
        .groupBy("source", "w1")
        .agg(F.count("*").alias("c"))
    )
    s12 = c12.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * micro(F.col("c"))).alias("s12"),
    )
    s1 = c1.groupBy("source").agg(
        F.sum(F.col("c") * micro(F.col("c"))).alias("s1")
    )
    return (
        s12.join(s1, "source")
        .select(
            "source",
            F.col("n").cast("long").alias("n_bigrams"),
            F.expr(
                "CAST(CASE WHEN s1 < s12 THEN -1 ELSE 1 END"
                " * ((2 * abs(s1 - s12) + n) DIV (2 * n)) AS BIGINT)"
            ).alias("cond_entropy_micro"),
        )
        .orderBy("source")
    )


PREDICTABILITY_SQL = f"""
    WITH bg AS (
        SELECT t.doc_id, d.source, t.gram
        FROM ({grams_sql(2)}) t JOIN documents d USING (doc_id)
    ),
    c12 AS (
        SELECT source, gram, COUNT(*) AS c FROM bg GROUP BY 1, 2
    ),
    c1 AS (
        SELECT source, split_part(gram, ' ', 1) AS w1, COUNT(*) AS c
        FROM bg GROUP BY 1, 2
    ),
    s12 AS (
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * CAST(round(ln(c) * 1e6) AS BIGINT)) AS BIGINT)
                   AS s12
        FROM c12 GROUP BY source
    ),
    s1 AS (
        SELECT source,
               CAST(SUM(c * CAST(round(ln(c) * 1e6) AS BIGINT)) AS BIGINT)
                   AS s1
        FROM c1 GROUP BY source
    )
    SELECT s12.source, s12.n AS n_bigrams,
           CAST((CASE WHEN s1.s1 < s12.s12 THEN -1 ELSE 1 END)
                * ((2 * abs(s1.s1 - s12.s12) + s12.n) // (2 * s12.n))
                AS BIGINT) AS cond_entropy_micro
    FROM s12 JOIN s1 USING (source)
    ORDER BY s12.source
"""


# --- Yule's K lexical richness --------------------------------------------------------


def yule_k(docs: DataFrame) -> DataFrame:
    """Yule's K characteristic per source: (source, n_tokens, n_types,
    yule_k_milli) ordered by source.

    The length-invariant lexical-richness statistic — K = 10^4 *
    (sum_m m^2 V_m - N) / N^2 over the frequency spectrum (V_m = number of
    types occurring m times, N = token count). High K = vocabulary
    concentrated in few repeated types (templated/boilerplate text); low K
    = diverse vocabulary. Complements heaps_law (growth curve) and
    hapax_profile (spectrum head) with the single-number summary, and is
    exactly the repeated-measure curation filters threshold on.

    Exactness: sum_m m^2 V_m = sum over types of freq^2, so the sufficient
    statistics are exact BIGINTs; the milli emit is ONE double division
    chain over those integers (identical literals both engines — an
    all-integer emit would overflow 2^63 at corpus scale, where
    10^7 * sum(f^2) can exceed it).

    Scale shape: one (source, term) hash aggregate with map-side combine,
    one source rollup. No window, no sort, no explode beyond the token
    split."""
    toks = docs.select(
        "source", F.explode(F.split(_norm_text(F.col("text")), WS_RE)).alias("w")
    ).where(F.col("w") != "")
    per_term = toks.groupBy("source", "w").agg(F.count("*").alias("f"))
    return (
        per_term.groupBy("source")
        .agg(
            F.sum("f").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.col("f") * F.col("f")).cast("long").alias("s2"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            # K_milli = round(10^4 * 1000 * (s2 - N) / N^2) via one double
            # chain over the exact integer stats (overflow-free at any N)
            F.expr(
                "CAST(CASE WHEN n_tokens > 0 THEN"
                " round(10000000.0 * CAST(s2 - n_tokens AS DOUBLE)"
                "       / CAST(n_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
                " ELSE 0 END AS BIGINT)"
            ).alias("yule_k_milli"),
        )
        .orderBy("source")
    )


def yule_k_sql() -> str:
    return f"""
        WITH toks AS (
            SELECT source, unnest(string_split_regex(
                       {_norm_text_sql('text')}, '{WS_RE}')) AS w
            FROM documents
        ),
        per_term AS (
            SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f
            FROM toks WHERE w <> '' GROUP BY source, w
        )
        SELECT source,
               CAST(SUM(f) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(CASE WHEN SUM(f) > 0 THEN
                    round(10000000.0 * CAST(SUM(f * f) - SUM(f) AS DOUBLE)
                          / CAST(SUM(f) AS DOUBLE) / CAST(SUM(f) AS DOUBLE))
                    ELSE 0 END AS BIGINT) AS yule_k_milli
        FROM per_term
        GROUP BY source
        ORDER BY source
    """


# --- Burrows' delta (stylometric source distance) ---------------------------------------

DELTA_TOP_K = 30


def burrows_delta(docs: DataFrame, k: int = DELTA_TOP_K) -> DataFrame:
    """Burrows' delta between every source pair: (source_a, source_b,
    n_terms, delta_milli), a < b, ordered.

    THE stylometric distance (Burrows 2002): over the corpus's top-k most
    frequent words, z-score each source's usage rate against the across-
    source distribution of that word, then delta = mean |z_a - z_b|.
    Low delta = stylistically/registrally similar sources — the signal
    mixture audits use to catch one crawl re-labeled as two.

    Exactness: per-source rates quantize once to an integer micro rate
    (round over exact counts); mean/sd per word come from exact integer
    sufficient statistics over the <=|sources| rate rows, so both engines
    evaluate the identical double chain; delta sums run over the bounded
    k x |sources|^2 grid.

    Scale shape: one (source, word) aggregate, a distributed top-k on the
    word rollup (TakeOrderedAndProject), broadcast word-stat rows, a
    bounded pair join. Zero data-sized windows."""
    toks = docs.select(
        "source", F.explode(F.split(_norm_text(F.col("text")), WS_RE)).alias("w")
    ).where(F.col("w") != "")
    sw = toks.groupBy("source", "w").agg(F.count("*").cast("long").alias("f"))
    stot = sw.groupBy("source").agg(F.sum("f").cast("long").alias("tot"))
    topk = (
        sw.groupBy("w")
        .agg(F.sum("f").cast("long").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("w"))
        .limit(k)
        .select("w")
    )
    # dense (source x top-k word) grid so absent words contribute rate 0
    grid = stot.crossJoin(F.broadcast(topk))
    rates = (
        grid.join(sw, ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.expr(
                "CAST(round(1000000.0 * COALESCE(f, 0) / tot) AS BIGINT)"
            ).alias("r"),
        )
    )
    wstats = rates.groupBy("w").agg(
        F.count("*").cast("long").alias("ns"),
        F.sum("r").cast("long").alias("s1"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("s2"),
    )
    z = rates.join(F.broadcast(wstats), "w").select(
        "source",
        "w",
        F.expr(
            "CASE WHEN ns > 1 AND ns * s2 - s1 * s1 > 0 THEN"
            " (r - CAST(s1 AS DOUBLE) / ns)"
            " / sqrt((CAST(ns AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)"
            "        / (CAST(ns AS DOUBLE) * (ns - 1)))"
            " ELSE 0.0 END"
        ).alias("z"),
    )
    za, zb = z.alias("za"), z.alias("zb")
    pairs = za.join(
        zb,
        (F.col("za.w") == F.col("zb.w"))
        & (F.col("za.source") < F.col("zb.source")),
    ).select(
        F.col("za.source").alias("source_a"),
        F.col("zb.source").alias("source_b"),
        # quantize each word's |z_a - z_b| to nano before the integer sum
        # so the per-pair mean is order-free
        F.expr("CAST(round(1e9 * abs(za.z - zb.z)) AS BIGINT)").alias("d_nano"),
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("d_nano").alias("_d"),
        )
        .select(
            "source_a",
            "source_b",
            "n_terms",
            F.expr(
                "CAST(round(CAST(_d AS DOUBLE) / n_terms / 1e6) AS BIGINT)"
            ).alias("delta_milli"),
        )
        .orderBy("source_a", "source_b")
    )


def burrows_delta_sql(k: int = DELTA_TOP_K) -> str:
    return f"""
        WITH toks AS (
            SELECT source, unnest(string_split_regex(
                       {_norm_text_sql('text')}, '{WS_RE}')) AS w
            FROM documents
        ),
        sw AS (
            SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f
            FROM toks WHERE w <> '' GROUP BY source, w
        ),
        stot AS (
            SELECT source, CAST(SUM(f) AS BIGINT) AS tot FROM sw GROUP BY source
        ),
        topk AS (
            SELECT w FROM (
                SELECT w, SUM(f) AS cf FROM sw GROUP BY w
                ORDER BY cf DESC, w ASC LIMIT {k}
            )
        ),
        rates AS (
            SELECT stot.source, topk.w,
                   CAST(round(1000000.0 * COALESCE(sw.f, 0) / stot.tot)
                        AS BIGINT) AS r
            FROM stot CROSS JOIN topk
            LEFT JOIN sw ON sw.source = stot.source AND sw.w = topk.w
        ),
        wstats AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS ns,
                   CAST(SUM(r) AS BIGINT) AS s1,
                   CAST(SUM(r * r) AS BIGINT) AS s2
            FROM rates GROUP BY w
        ),
        z AS (
            SELECT source, rates.w,
                   CASE WHEN ns > 1 AND ns * s2 - s1 * s1 > 0 THEN
                        (r - CAST(s1 AS DOUBLE) / ns)
                        / sqrt((CAST(ns AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                               / (CAST(ns AS DOUBLE) * (ns - 1)))
                        ELSE 0.0 END AS z
            FROM rates JOIN wstats ON rates.w = wstats.w
        ),
        pairs AS (
            SELECT za.source AS source_a, zb.source AS source_b,
                   CAST(round(1e9 * abs(za.z - zb.z)) AS BIGINT) AS d_nano
            FROM z za JOIN z zb
              ON za.w = zb.w AND za.source < zb.source
        )
        SELECT source_a, source_b,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(round(CAST(SUM(d_nano) AS DOUBLE) / COUNT(*) / 1e6)
                    AS BIGINT) AS delta_milli
        FROM pairs
        GROUP BY source_a, source_b
        ORDER BY source_a, source_b
    """


# --- G2 keyness (source vs rest of corpus) ----------------------------------------------

KEYNESS_TOP_N = 10
KEYNESS_MIN_F = 5


def keyness_g2(docs: DataFrame, top_n: int = KEYNESS_TOP_N) -> DataFrame:
    """Log-likelihood (G2) keyness: the ``top_n`` terms most distinctive of
    each source vs the REST of the corpus — (source, term, f_source,
    g2_micro), rank by (g2 desc, term) within source.

    The corpus-linguistics standard (Dunning 1993 / Rayson-Garside): for
    term w in source s, a = freq in s, b = freq elsewhere; expected counts
    split the term's corpus total by token-mass share; G2 = 2*(a ln(a/Ea)
    + b ln(b/Eb)) (zero-count halves contribute 0). Unlike TF-IDF
    (document-frequency based), keyness is frequency-profile based — it
    surfaces over-used common words too. Terms rarer than {KEYNESS_MIN_F}
    corpus-wide are dropped (G2 is chi-square-unstable on tiny counts).

    Exactness: every input to the ln chain is an exact BIGINT; g2
    quantizes once to micro (deterministic double chain both engines).

    Scale shape: (source, term) and term rollup aggregates, broadcast
    1-row corpus total + tiny source-mass dim, rank window partitioned by
    source over the vocabulary-bounded keyed relation."""
    toks = docs.select(
        "source", F.explode(F.split(_norm_text(F.col("text")), WS_RE)).alias("w")
    ).where(F.col("w") != "")
    sw = toks.groupBy("source", "w").agg(F.count("*").cast("long").alias("a"))
    tw = sw.groupBy("w").agg(F.sum("a").cast("long").alias("cw")).where(
        F.col("cw") >= KEYNESS_MIN_F
    )
    stot = sw.groupBy("source").agg(F.sum("a").cast("long").alias("ts"))
    tot = stot.agg(F.sum("ts").cast("long").alias("tc"))
    g2 = (
        sw.join(tw, "w")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("w").alias("term"),
            F.col("a").alias("f_source"),
            F.expr(
                "CAST(round(1000000.0 * 2.0 * ("
                " CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE) * tc"
                "      / (CAST(cw AS DOUBLE) * ts)) ELSE 0.0 END"
                " + CASE WHEN cw - a > 0 THEN (cw - a)"
                "      * ln(CAST(cw - a AS DOUBLE) * tc"
                "           / (CAST(cw AS DOUBLE) * (tc - ts))) ELSE 0.0 END"
                ")) AS BIGINT)"
            ).alias("g2_micro"),
        )
    )
    wrank = Window.partitionBy("source").orderBy(
        F.desc("g2_micro"), F.asc("term")
    )
    return (
        g2.withColumn("rnk", F.row_number().over(wrank))
        .where(F.col("rnk") <= top_n)
        .select("source", "term", "f_source", "g2_micro")
        .orderBy("source", F.desc("g2_micro"), "term")
    )


def keyness_g2_sql(top_n: int = KEYNESS_TOP_N) -> str:
    return f"""
        WITH toks AS (
            SELECT source, unnest(string_split_regex(
                       {_norm_text_sql('text')}, '{WS_RE}')) AS w
            FROM documents
        ),
        sw AS (
            SELECT source, w, CAST(COUNT(*) AS BIGINT) AS a
            FROM toks WHERE w <> '' GROUP BY source, w
        ),
        tw AS (
            SELECT w, CAST(SUM(a) AS BIGINT) AS cw FROM sw GROUP BY w
            HAVING SUM(a) >= {KEYNESS_MIN_F}
        ),
        stot AS (
            SELECT source, CAST(SUM(a) AS BIGINT) AS ts FROM sw GROUP BY source
        ),
        tot AS (SELECT CAST(SUM(ts) AS BIGINT) AS tc FROM stot),
        g2 AS (
            SELECT source, w AS term, a AS f_source,
                   CAST(round(1000000.0 * 2.0 * (
                       CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE) * tc
                            / (CAST(cw AS DOUBLE) * ts)) ELSE 0.0 END
                       + CASE WHEN cw - a > 0 THEN (cw - a)
                            * ln(CAST(cw - a AS DOUBLE) * tc
                                 / (CAST(cw AS DOUBLE) * (tc - ts))) ELSE 0.0 END
                   )) AS BIGINT) AS g2_micro
            FROM sw JOIN tw USING (w) JOIN stot USING (source) CROSS JOIN tot
        )
        SELECT source, term, f_source, g2_micro
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY g2_micro DESC, term ASC) AS rnk
            FROM g2
        )
        WHERE rnk <= {top_n}
        ORDER BY source, g2_micro DESC, term
    """


GOOD_TURING_MAX_R = 10


def good_turing_smoothing(docs: DataFrame) -> DataFrame:
    """Good-Turing smoothed unigram counts over the corpus: rows
    (r, n_r, r_star_milli, prob_mass_micro) for raw counts r = 1..{GOOD_TURING_MAX_R}
    plus the r = 0 unseen-mass row, ordered by r.

    unigram_logprob assigns ML probabilities that give unseen words zero
    mass; Good-Turing is the classical fix the smoothing literature builds
    on (Katz backoff starts here): r* = (r+1) * N_{r+1} / N_r on the
    frequency-of-frequencies table, and the reserved unseen mass is
    P_0 = N_1 / N. Rows where N_{r+1} = 0 report r* = r (no evidence to
    discount — the standard cutoff treatment, which is also why the table
    stops at a small max r).

    Exactness: the frequency-of-frequencies table is exact integers from
    two aggregates; r* and the per-r probability mass N_r * r* / N are
    one rounded division each over the bounded r-grid.

    Scale shape: one (term) aggregate with map-side combine, one (r)
    aggregate over the term table (bounded output), one 1-row totals
    broadcast."""
    terms = (
        grams(docs, 1)
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    fof = (
        terms.where(F.col("tf") <= GOOD_TURING_MAX_R + 1)
        .groupBy("tf")
        .agg(F.count("*").cast("long").alias("n_r"))
    )
    tot = terms.agg(F.sum("tf").cast("long").alias("n_tokens"))
    nxt = fof.select((F.col("tf") - 1).alias("tf"), F.col("n_r").alias("n_r1"))
    grid = docs.sparkSession.range(0, GOOD_TURING_MAX_R + 1).select(
        F.col("id").cast("long").alias("r")
    )
    return (
        grid.join(fof.withColumnRenamed("tf", "r"), "r", "left")
        .join(nxt.withColumnRenamed("tf", "r"), "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            F.coalesce("n_r", F.lit(0)).cast("long").alias("n_r"),
            F.coalesce("n_r1", F.lit(0)).cast("long").alias("n_r1"),
            "n_tokens",
        )
        .select(
            "r",
            "n_r",
            F.expr(
                "CAST(CASE WHEN r = 0 THEN 0"
                " WHEN n_r > 0 AND n_r1 > 0 THEN"
                "   round(1000.0 * (r + 1) * n_r1 / n_r)"
                " ELSE 1000 * r END AS BIGINT)"
            ).alias("r_star_milli"),
            F.expr(
                "CAST(CASE WHEN r = 0 THEN round(1e6 * n_r1"
                "   / CAST(n_tokens AS DOUBLE))"  # P0 = N1 / N
                " WHEN n_r > 0 AND n_r1 > 0 THEN"
                "   round(1e6 * n_r * ((r + 1.0) * n_r1 / n_r)"
                "         / CAST(n_tokens AS DOUBLE))"
                " ELSE round(1e6 * n_r * CAST(r AS DOUBLE)"
                "      / CAST(n_tokens AS DOUBLE)) END AS BIGINT)"
            ).alias("prob_mass_micro"),
        )
        .orderBy("r")
    )


def good_turing_smoothing_sql() -> str:
    return f"""
    WITH toks AS ({grams_sql(1)}),
    terms AS (
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY gram
    ),
    fof AS (
        SELECT tf, CAST(COUNT(*) AS BIGINT) AS n_r
        FROM terms WHERE tf <= {GOOD_TURING_MAX_R + 1} GROUP BY tf
    ),
    tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_tokens FROM terms),
    grid AS (
        SELECT CAST(r AS BIGINT) AS r
        FROM UNNEST(generate_series(0, {GOOD_TURING_MAX_R})) AS g(r)
    ),
    dense AS (
        SELECT grid.r,
               COALESCE(f.n_r, 0) AS n_r,
               COALESCE(f1.n_r, 0) AS n_r1,
               n_tokens
        FROM grid
        LEFT JOIN fof f ON f.tf = grid.r
        LEFT JOIN fof f1 ON f1.tf = grid.r + 1
        CROSS JOIN tot
    )
    SELECT r, n_r,
           CAST(CASE WHEN r = 0 THEN 0
                WHEN n_r > 0 AND n_r1 > 0 THEN
                  round(1000.0 * (r + 1) * n_r1 / n_r)
                ELSE 1000 * r END AS BIGINT) AS r_star_milli,
           CAST(CASE WHEN r = 0 THEN round(1e6 * n_r1
                  / CAST(n_tokens AS DOUBLE))
                WHEN n_r > 0 AND n_r1 > 0 THEN
                  round(1e6 * n_r * ((r + 1.0) * n_r1 / n_r)
                        / CAST(n_tokens AS DOUBLE))
                ELSE round(1e6 * n_r * CAST(r AS DOUBLE)
                     / CAST(n_tokens AS DOUBLE)) END AS BIGINT)
               AS prob_mass_micro
    FROM dense
    ORDER BY r
    """


# --- Interpolated Kneser-Ney bigram probabilities --------------------------------------------

KN_DISCOUNT = "0.75e0"
KN_TOP_K = 20


def kneser_ney_bigrams(docs: DataFrame, k: int = KN_TOP_K) -> DataFrame:
    """Interpolated Kneser-Ney probability for the top-k corpus bigrams:
    rows (w1, w2, cnt, p_kn_micro) ordered by count desc, bigram asc.

    good_turing_smoothing reserves mass by re-estimating COUNTS;
    Kneser-Ney is the stronger idea that made modern n-gram LMs: subtract
    a fixed discount D from every bigram and give the freed mass to a
    CONTINUATION unigram — how many distinct contexts a word completes,
    not how often it occurs ("francisco" is frequent but follows only
    "san", so its continuation probability is tiny). P(w2|w1) =
    max(c12-D,0)/c1 + (D*N1+(w1,.)/c1) * (N1+(.,w2)/N1+(.,.)), the
    Chen-Goodman interpolated form with D = 0.75.

    All four count relations (bigram counts, left-context totals,
    forward/backward continuation fan-outs) are exact integer aggregates
    of the shared gram relation; the probability is one double chain per
    output row, micro-quantized.

    Scale shape: one gram explode, one (gram) aggregate, two fan-out
    aggregates joined back on the gram keys, one scalar broadcast, one
    distributed top-k."""
    big = grams(docs, 2).withColumnRenamed("gram", "bg")
    cb = big.groupBy("bg").agg(F.count("*").cast("long").alias("cnt"))
    parts = cb.select(
        "bg",
        "cnt",
        F.split(F.col("bg"), " ")[0].alias("w1"),
        F.split(F.col("bg"), " ")[1].alias("w2"),
    )
    fw = parts.groupBy("w1").agg(
        F.sum("cnt").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1fw"),
    )
    bw = parts.groupBy("w2").agg(F.count("*").cast("long").alias("n1bw"))
    nbb = cb.agg(F.count("*").cast("long").alias("nbb"))
    scored = (
        parts.join(fw, "w1")
        .join(bw, "w2")
        .crossJoin(F.broadcast(nbb))
        .select(
            "w1",
            "w2",
            "cnt",
            F.expr(
                f"CAST(round(1e6 * ("
                f" greatest(cnt - {KN_DISCOUNT}, 0e0) / c1"
                f" + ({KN_DISCOUNT} * n1fw / c1)"
                f"   * (CAST(n1bw AS DOUBLE) / nbb))) AS BIGINT)"
            ).alias("p_kn_micro"),
        )
    )
    return scored.orderBy(
        F.desc("cnt"), F.asc("w1"), F.asc("w2")
    ).limit(k)


def kneser_ney_bigrams_sql(k: int = KN_TOP_K) -> str:
    return f"""
        WITH big AS ({grams_sql(2)}),
        cb AS (
            SELECT gram AS bg, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM big GROUP BY gram
        ),
        parts AS (
            SELECT bg, cnt,
                   string_split(bg, ' ')[1] AS w1,
                   string_split(bg, ' ')[2] AS w2
            FROM cb
        ),
        fw AS (
            SELECT w1, CAST(SUM(cnt) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n1fw
            FROM parts GROUP BY w1
        ),
        bw AS (
            SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1bw
            FROM parts GROUP BY w2
        ),
        nbb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbb FROM cb)
        SELECT parts.w1, parts.w2, cnt,
               CAST(round(1e6 * (
                   greatest(cnt - {KN_DISCOUNT}, 0e0) / c1
                   + ({KN_DISCOUNT} * n1fw / c1)
                     * (CAST(n1bw AS DOUBLE) / nbb))) AS BIGINT)
                   AS p_kn_micro
        FROM parts
        JOIN fw ON parts.w1 = fw.w1
        JOIN bw ON parts.w2 = bw.w2
        CROSS JOIN nbb
        ORDER BY cnt DESC, parts.w1 ASC, parts.w2 ASC
        LIMIT {k}
    """


# --- Mean segmental type-token ratio ---------------------------------------------------------

MSTTR_SEGMENT = 50


def msttr_by_lang(docs: DataFrame, seg_len: int = MSTTR_SEGMENT) -> DataFrame:
    """Mean segmental type-token ratio per language: rows (lang, n_docs,
    n_segments, msttr_micro) ordered by lang.

    vocab_yule_k and the TTR family score lexical diversity on WHOLE
    documents, which confounds diversity with length (TTR falls as any
    text grows). MSTTR is the standard length-controlled form: chop each
    document into consecutive ``seg_len``-token segments, take the TTR
    of each COMPLETE segment, and average — every segment contributes at
    the same denominator, so corpora of different document lengths
    compare honestly.

    Exactness: per-segment distinct counts are integers; MSTTR =
    sum(distinct) / (seg_len * n_segments) is one exact rational per
    language, micro-quantized at the boundary.

    Scale shape: one token posexplode, one per-doc re-index window, one
    (doc, segment) distinct aggregate, one (lang) reduction."""
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(_norm_text(F.col("text")), WS_RE)).alias(
            "pos", "w"
        ),
    ).where(F.col("w") != "")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    seg = toks.select(
        "doc_id",
        "lang",
        "w",
        ((F.row_number().over(wdoc) - 1) / seg_len)
        .cast("long")
        .alias("seg_id"),
    )
    per_seg = seg.groupBy("doc_id", "lang", "seg_id").agg(
        F.count("*").cast("long").alias("n_tok"),
        F.count_distinct("w").cast("long").alias("n_types"),
    ).where(F.col("n_tok") == seg_len)
    return (
        per_seg.groupBy("lang")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_segments"),
            F.sum("n_types").cast("long").alias("st"),
        )
        .select(
            "lang",
            "n_docs",
            "n_segments",
            F.expr(
                f"CAST(round(1e6 * st / ({seg_len}e0 * n_segments))"
                " AS BIGINT)"
            ).alias("msttr_micro"),
        )
        .orderBy("lang")
    )


def msttr_by_lang_sql(seg_len: int = MSTTR_SEGMENT) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, lang, pos, w FROM (
                SELECT doc_id, lang,
                       generate_subscripts(w_list, 1) AS pos,
                       unnest(w_list) AS w
                FROM (
                    SELECT doc_id, lang,
                           string_split_regex({_norm_text_sql('text')},
                                              '{WS_RE}') AS w_list
                    FROM documents
                )
            ) WHERE w <> ''
        ),
        seg AS (
            SELECT doc_id, lang, w,
                   (ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1)
                       // {seg_len} AS seg_id
            FROM toks
        ),
        per_seg AS (
            SELECT doc_id, lang, seg_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tok,
                   CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types
            FROM seg GROUP BY 1, 2, 3
            HAVING COUNT(*) = {seg_len}
        )
        SELECT lang,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(round(1e6 * SUM(n_types)
                    / ({seg_len}e0 * COUNT(*))) AS BIGINT) AS msttr_micro
        FROM per_seg
        GROUP BY lang
        ORDER BY lang
    """


# --- Beta-binomial empirical-Bayes shrinkage of per-source pass rates ------------------------

BB_CHARS_MIN = 400


def beta_binomial_source_rates(
    docs: DataFrame, chars_min: int = BB_CHARS_MIN
) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of each source's
    long-document rate (n_chars >= ``chars_min``): rows (source, n_docs,
    pass_rate_micro, shrunk_rate_micro) ordered by source.

    events_james_stein shrinks NORMAL means; per-source pass RATES are
    binomial, where the right prior is a Beta fitted by method of
    moments on the observed proportions: common = m(1-m)/v - 1, alpha =
    m*common, beta = (1-m)*common, and every source's posterior mean is
    (k + alpha)/(n + alpha + beta) — small sources move toward the
    corpus-wide rate, large sources barely move. The curation ranking
    this feeds stops whipsawing on 25-doc sources. Falls back to the raw
    rate when the moment fit is undefined (v = 0 or v >= m(1-m)).

    Exactness: per-source proportions quantize to micro before the
    cross-source moment sums (exact integers); the Beta fit and
    posterior means are one double chain per bounded source row.

    Scale shape: one (source) aggregate, one 1-row scalar broadcast over
    the bounded source grid."""
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("n_chars") >= chars_min).cast("long"))
        .cast("long")
        .alias("k"),
    ).withColumn(
        "pm", F.expr("CAST(round(1e6 * k / n) AS BIGINT)")
    )
    mom = per_src.agg(
        F.count("*").cast("long").alias("s"),
        F.sum("pm").cast("long").alias("sp"),
        F.sum(F.col("pm") * F.col("pm")).cast("decimal(38,0)").alias("spp"),
    )
    return (
        per_src.crossJoin(F.broadcast(mom))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.col("pm").alias("pass_rate_micro"),
            F.expr(
                "CAST(round(1e6 * ("
                " CASE WHEN s > 1"
                "  AND (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / s)"
                "      / (s - 1) / 1e12 > 0e0"
                "  AND (CAST(sp AS DOUBLE) / s / 1e6)"
                "      * (1e0 - CAST(sp AS DOUBLE) / s / 1e6)"
                "      > (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / s)"
                "        / (s - 1) / 1e12"
                " THEN (k + (CAST(sp AS DOUBLE) / s / 1e6)"
                "         * ((CAST(sp AS DOUBLE) / s / 1e6)"
                "            * (1e0 - CAST(sp AS DOUBLE) / s / 1e6)"
                "            / ((CAST(spp AS DOUBLE)"
                "                - CAST(sp AS DOUBLE) * sp / s)"
                "               / (s - 1) / 1e12) - 1e0))"
                "      / (n + (CAST(sp AS DOUBLE) / s / 1e6)"
                "           * (1e0 - CAST(sp AS DOUBLE) / s / 1e6)"
                "           / ((CAST(spp AS DOUBLE)"
                "               - CAST(sp AS DOUBLE) * sp / s)"
                "              / (s - 1) / 1e12) - 1e0)"
                " ELSE CAST(k AS DOUBLE) / n END)) AS BIGINT)"
            ).alias("shrunk_rate_micro"),
        )
        .orderBy("source")
    )


def beta_binomial_source_rates_sql(chars_min: int = BB_CHARS_MIN) -> str:
    return f"""
        WITH per_src AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN n_chars >= {chars_min} THEN 1 ELSE 0
                       END) AS BIGINT) AS k,
                   CAST(round(1e6 * SUM(CASE WHEN n_chars >= {chars_min}
                       THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT) AS pm
            FROM documents GROUP BY source
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS s,
                   CAST(SUM(pm) AS BIGINT) AS sp,
                   SUM(CAST(pm AS HUGEINT) * pm) AS spp
            FROM per_src
        )
        SELECT source, n AS n_docs, pm AS pass_rate_micro,
               CAST(round(1e6 * (
                 CASE WHEN s > 1
                  AND (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / s)
                      / (s - 1) / 1e12 > 0e0
                  AND (CAST(sp AS DOUBLE) / s / 1e6)
                      * (1e0 - CAST(sp AS DOUBLE) / s / 1e6)
                      > (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * sp / s)
                        / (s - 1) / 1e12
                 THEN (k + (CAST(sp AS DOUBLE) / s / 1e6)
                         * ((CAST(sp AS DOUBLE) / s / 1e6)
                            * (1e0 - CAST(sp AS DOUBLE) / s / 1e6)
                            / ((CAST(spp AS DOUBLE)
                                - CAST(sp AS DOUBLE) * sp / s)
                               / (s - 1) / 1e12) - 1e0))
                      / (n + (CAST(sp AS DOUBLE) / s / 1e6)
                           * (1e0 - CAST(sp AS DOUBLE) / s / 1e6)
                           / ((CAST(spp AS DOUBLE)
                               - CAST(sp AS DOUBLE) * sp / s)
                              / (s - 1) / 1e12) - 1e0)
                 ELSE CAST(k AS DOUBLE) / n END)) AS BIGINT)
                   AS shrunk_rate_micro
        FROM per_src CROSS JOIN mom
        ORDER BY source
    """


# --- Krippendorff's alpha across curation filters ------------------------------------------------

KRIPP_LEN_CHARS = 300
KRIPP_MIN_TOKENS = 40
KRIPP_MAX_SYM_PER_KCHAR = 80


def krippendorff_alpha_filters(docs: DataFrame) -> DataFrame:
    """Krippendorff's alpha agreement among three binary curation judges
    (length, token-count, symbol-cleanliness): one row (n_units, n_pos,
    n_neg, do_micro, de_micro, alpha_milli).

    text_filter_agreement reports pairwise Cohen's kappa; Krippendorff's
    alpha is the MULTI-RATER generalization reviewers actually ask for —
    one chance-corrected number for the whole judge panel, built from
    the coincidence matrix: with m=3 judges per doc and k_u positive
    votes, Do = sum k_u(m-k_u) / N and De = 2*N1*N0 / (N(N-1)) over the
    N = 3n total votes; alpha = 1 - Do/De. Low alpha says the filters
    measure DIFFERENT things and a majority vote is unstable.

    Exactness: vote counts are exact integers end-to-end; Do and De
    quantize to micro only at the emit, alpha is one double division.

    Scale shape: one zero-shuffle judge expression, one global
    reduction."""
    toks = F.size(F.split(_norm_text(F.col("text")), WS_RE))
    syms = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), r"[^A-Za-z0-9 ]", "")
    )
    k = (
        (F.col("n_chars") >= KRIPP_LEN_CHARS).cast("long")
        + (toks >= KRIPP_MIN_TOKENS).cast("long")
        + (
            syms * 1000
            <= F.lit(KRIPP_MAX_SYM_PER_KCHAR)
            * F.greatest(F.length("text"), F.lit(1))
        ).cast("long")
    )
    per_doc = docs.select(k.alias("k"))
    agg = per_doc.agg(
        F.count("*").cast("long").alias("n_units"),
        F.sum("k").cast("long").alias("n_pos"),
        F.sum(F.col("k") * (3 - F.col("k"))).cast("long").alias("dis"),
    )
    return agg.select(
        "n_units",
        "n_pos",
        (3 * F.col("n_units") - F.col("n_pos")).alias("n_neg"),
        F.expr(
            "CAST(round(1e6 * CAST(dis AS DOUBLE) / (3 * n_units))"
            " AS BIGINT)"
        ).alias("do_micro"),
        F.expr(
            "CAST(round(1e6 * 2e0 * CAST(n_pos AS DOUBLE)"
            " * (3 * n_units - n_pos)"
            " / (CAST(3 * n_units AS DOUBLE) * (3 * n_units - 1)))"
            " AS BIGINT)"
        ).alias("de_micro"),
        F.expr(
            "CAST(CASE WHEN n_pos > 0 AND n_pos < 3 * n_units THEN"
            " round(1000.0 * (1e0 - (CAST(dis AS DOUBLE) / (3 * n_units))"
            "  / (2e0 * CAST(n_pos AS DOUBLE) * (3 * n_units - n_pos)"
            "     / (CAST(3 * n_units AS DOUBLE) * (3 * n_units - 1)))))"
            " ELSE 1000 END AS BIGINT)"
        ).alias("alpha_milli"),
    )


def krippendorff_alpha_filters_sql() -> str:
    return f"""
        WITH judged AS (
            SELECT CAST(CASE WHEN n_chars >= {KRIPP_LEN_CHARS} THEN 1 ELSE 0
                       END AS BIGINT)
                   + CAST(CASE WHEN len(string_split_regex(
                         {_norm_text_sql('text')}, '{WS_RE}'))
                         >= {KRIPP_MIN_TOKENS} THEN 1 ELSE 0 END AS BIGINT)
                   + CAST(CASE WHEN (length(text) - length(regexp_replace(
                         text, '[^A-Za-z0-9 ]', '', 'g'))) * 1000
                         <= {KRIPP_MAX_SYM_PER_KCHAR}
                            * greatest(length(text), 1)
                         THEN 1 ELSE 0 END AS BIGINT) AS k
            FROM documents
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
                   CAST(SUM(k) AS BIGINT) AS n_pos,
                   CAST(SUM(k * (3 - k)) AS BIGINT) AS dis
            FROM judged
        )
        SELECT n_units, n_pos,
               3 * n_units - n_pos AS n_neg,
               CAST(round(1e6 * CAST(dis AS DOUBLE) / (3 * n_units))
                    AS BIGINT) AS do_micro,
               CAST(round(1e6 * 2e0 * CAST(n_pos AS DOUBLE)
                    * (3 * n_units - n_pos)
                    / (CAST(3 * n_units AS DOUBLE) * (3 * n_units - 1)))
                    AS BIGINT) AS de_micro,
               CAST(CASE WHEN n_pos > 0 AND n_pos < 3 * n_units THEN
                    round(1000.0 * (1e0 - (CAST(dis AS DOUBLE) / (3 * n_units))
                     / (2e0 * CAST(n_pos AS DOUBLE) * (3 * n_units - n_pos)
                        / (CAST(3 * n_units AS DOUBLE) * (3 * n_units - 1)))))
                    ELSE 1000 END AS BIGINT) AS alpha_milli
        FROM agg
    """


# --- query-likelihood retrieval (Dirichlet smoothing) -----------------------------------

QL_MU = 2000


def query_likelihood_topk(
    docs: DataFrame,
    n_query_terms: int = BM25_QUERY_TERMS,
    k: int = BM25_TOP_K,
    mu: int = QL_MU,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty, SIGIR
    2001) for the same deterministic corpus query BM25 uses: score(d) =
    Σ_t ln((tf_td + μ·cf_t/|C|)/(|d| + μ)) — the language-modeling ranking
    that, unlike BM25, scores EVERY document (smoothing mass keeps zero-tf
    docs comparable), the second classic lexical scorer a hybrid retrieval
    stack fuses.

    Exactness: per-(doc, term) contributions round ONCE to micro-nat ints
    (deterministic ln over exact integer tf/cf/dl statistics, the
    unigram_logprob convention); doc scores are order-free integer sums.

    Plan: the ≤``n_query_terms``-row query-stats relation broadcasts against
    the doc-length relation (every doc, not just matching postings — the
    smoothing semantics), with tf filled from the postings left join."""
    g = grams(docs, 1).withColumnRenamed("gram", "term")
    tf = g.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = g.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dstats = tf.groupBy("term").agg(F.count("*").alias("df"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    qterms = (
        g.groupBy("term")
        .agg(F.count("*").alias("cf"))
        .join(dstats, "term")
        .crossJoin(F.broadcast(corpus))
        .where(F.lit(1000) * F.col("df") < F.lit(600) * F.col("n_docs"))
        .orderBy(F.desc("cf"), "term")
        .limit(n_query_terms)
        .select("term", "cf", "total_len")
    )
    scored = (
        docs.select("doc_id")
        .join(dl, "doc_id", "left")
        .select("doc_id", F.coalesce("dl", F.lit(0)).alias("dl"))
        .crossJoin(F.broadcast(qterms))
        .join(tf, ["doc_id", "term"], "left")
        .select(
            "doc_id",
            F.expr(
                f"CAST(round(1e6 * ln((COALESCE(tf, 0)"
                f" + {mu} * CAST(cf AS DOUBLE) / total_len)"
                f" / (dl + {mu}))) AS BIGINT)"
            ).alias("c_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("c_micro").cast("long").alias("ql_micro_nat"))
        .orderBy(F.desc("ql_micro_nat"), "doc_id")
        .limit(k)
    )


def query_likelihood_topk_sql(
    n_query_terms: int = BM25_QUERY_TERMS,
    k: int = BM25_TOP_K,
    mu: int = QL_MU,
    docs_rel: str = "documents",
) -> str:
    return f"""
    WITH g AS (
        SELECT doc_id, gram AS term FROM ({grams_sql(1, docs_rel)})
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM g GROUP BY doc_id, term
    ),
    dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM g GROUP BY doc_id
    ),
    dstats AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    corpus AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len
        FROM dl
    ),
    qterms AS (
        SELECT t.term, t.cf, c.total_len
        FROM (SELECT term, COUNT(*) AS cf FROM g GROUP BY term) t
        JOIN dstats d USING (term)
        CROSS JOIN corpus c
        WHERE 1000 * d.df < 600 * c.n_docs
        ORDER BY t.cf DESC, t.term
        LIMIT {n_query_terms}
    ),
    base AS (
        SELECT d.doc_id, COALESCE(l.dl, 0) AS dl
        FROM {docs_rel} d LEFT JOIN dl l USING (doc_id)
    )
    SELECT b.doc_id,
           CAST(SUM(CAST(round(1e6 * ln((COALESCE(f.tf, 0)
               + {mu} * CAST(q.cf AS DOUBLE) / q.total_len)
               / (b.dl + {mu}))) AS BIGINT)) AS BIGINT) AS ql_micro_nat
    FROM base b
    CROSS JOIN qterms q
    LEFT JOIN tf f ON f.doc_id = b.doc_id AND f.term = q.term
    GROUP BY b.doc_id
    ORDER BY ql_micro_nat DESC, b.doc_id
    LIMIT {k}
    """


# --- Bradley-Terry preference strengths -------------------------------------------------

BT_ITERS = 10


def bradley_terry(docs: DataFrame, iters: int = BT_ITERS) -> DataFrame:
    """Bradley-Terry preference strengths per source via ``iters`` MM
    (minorization-maximization) rounds — THE model behind preference-ranked
    training data (RLHF reward modeling ranks completions with exactly this
    likelihood). Matches derive deterministically from the corpus: adjacent
    doc_ids (2k, 2k+1) from different sources play one match, longer text
    wins (tie → even doc). MM update p_i ← W_i / Σ_j n_ij/(p_i+p_j),
    renormalized each round to mean 1.

    Cross-engine exactness: strengths live in integer micro units; each
    pair term n_ij/(p_i+p_j) rounds ONCE to an exact nano int, so both the
    denominator and the normalization are order-free integer sums; a floor
    of 1 micro keeps a winless source's division defined.

    Scale: one self-join on the derived pair key (narrow), then ``iters``
    rounds over the bounded |sources|² match grid — iteration cost is
    independent of corpus size."""
    a = docs.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("pair"),
        F.col("source").alias("src_a"),
        F.col("n_chars").alias("len_a"),
    )
    b = docs.where(F.col("doc_id") % 2 == 1).select(
        ((F.col("doc_id") - 1) / 2).cast("long").alias("pair"),
        F.col("source").alias("src_b"),
        F.col("n_chars").alias("len_b"),
    )
    matches = (
        a.join(b, "pair")
        .where(F.col("src_a") != F.col("src_b"))
        .select(
            F.when(F.col("len_a") >= F.col("len_b"), F.col("src_a"))
            .otherwise(F.col("src_b"))
            .alias("winner"),
            F.when(F.col("len_a") >= F.col("len_b"), F.col("src_b"))
            .otherwise(F.col("src_a"))
            .alias("loser"),
        )
    )
    wins = matches.groupBy(F.col("winner").alias("i"), F.col("loser").alias("j")).agg(
        F.count("*").cast("long").alias("w")
    )
    mat = (
        wins.select("i", "j", "w")
        .unionAll(
            wins.select(
                F.col("j").alias("i"), F.col("i").alias("j"),
                F.lit(0).cast("long").alias("w"),
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("w").alias("w"))
    )
    n_ij = (
        mat.alias("x")
        .join(
            mat.alias("y"),
            (F.col("x.i") == F.col("y.j")) & (F.col("x.j") == F.col("y.i")),
        )
        .select(
            F.col("x.i").alias("i"),
            F.col("x.j").alias("j"),
            F.col("x.w").alias("w"),
            (F.col("x.w") + F.col("y.w")).alias("n"),
        )
        .localCheckpoint(eager=False)
    )
    # NOT checkpointed: the trailing groupBy keeps this relation visibly
    # bounded to the plan auditor (a checkpointed RDD reads as a source
    # leaf, which would flag the final rank window as unbounded)
    items = n_ij.groupBy("i").agg(
        F.sum("w").cast("long").alias("wins"),
        F.sum("n").cast("long").alias("n_matches"),
    )
    n_items = items.agg(F.count("*").cast("long").alias("k"))
    p = items.select("i", F.lit(1_000_000).cast("long").alias("p_micro"))
    # per-round checkpoint is LOAD-BEARING (round-10 A/B: cutting only every
    # third round measured 8.4s vs 3.5s): p is referenced TWICE per MM round
    # through broadcast-hinted joins, and each BroadcastExchange nests the
    # prior rounds' chain as its own subplan — AQE does not dedupe those
    # nested stages, so sparser cuts re-execute prefix segments 2^k-fold.
    for _ in range(iters):
        denom = (
            n_ij.join(
                F.broadcast(p.select(F.col("i"), F.col("p_micro").alias("pi"))),
                "i",
            )
            .join(
                F.broadcast(
                    p.select(F.col("i").alias("j"), F.col("p_micro").alias("pj"))
                ),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum(
                    F.expr(
                        "CAST(round(1e15 * n / (pi + pj)) AS BIGINT)"
                    )
                ).alias("d_nano")
            )
        )
        praw = (
            items.join(denom, "i")
            .select(
                "i",
                F.expr(
                    "CASE WHEN d_nano > 0 THEN"
                    " CAST(round(1e15 * wins / d_nano) AS BIGINT)"
                    " ELSE CAST(0 AS BIGINT) END"
                ).alias("praw_micro"),
            )
        )
        tot = praw.agg(F.sum("praw_micro").alias("tot"))
        p = (
            praw.crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(n_items))
            .select(
                "i",
                F.expr(
                    "GREATEST(CAST(1 AS BIGINT),"
                    " CAST(round(1e6 * k * praw_micro / tot) AS BIGINT))"
                ).alias("p_micro"),
            )
            .localCheckpoint()
        )
    w_rank = Window.orderBy(F.col("p_micro").desc(), F.col("source").asc())
    # the no-op re-aggregate over the unique key restores mechanical
    # boundedness after the checkpointed iteration state
    p_final = p.groupBy("i").agg(F.max("p_micro").alias("p_micro"))
    return (
        items.join(p_final, "i")
        .select(
            F.col("i").alias("source"),
            "n_matches",
            "wins",
            "p_micro",
        )
        .withColumn("rnk", F.row_number().over(w_rank).cast("int"))
        .orderBy("rnk")
    )


def bradley_terry_sql(iters: int = BT_ITERS, docs_rel: str = "documents") -> str:
    parts = [
        f"""
    WITH a AS (
        SELECT doc_id // 2 AS pair, source AS src_a, n_chars AS len_a
        FROM {docs_rel} WHERE doc_id % 2 = 0
    ),
    b AS (
        SELECT (doc_id - 1) // 2 AS pair, source AS src_b, n_chars AS len_b
        FROM {docs_rel} WHERE doc_id % 2 = 1
    ),
    matches AS (
        SELECT CASE WHEN len_a >= len_b THEN src_a ELSE src_b END AS winner,
               CASE WHEN len_a >= len_b THEN src_b ELSE src_a END AS loser
        FROM a JOIN b USING (pair)
        WHERE src_a <> src_b
    ),
    wins AS (
        SELECT winner AS i, loser AS j, CAST(COUNT(*) AS BIGINT) AS w
        FROM matches GROUP BY winner, loser
    ),
    mat AS (
        SELECT i, j, CAST(SUM(w) AS BIGINT) AS w
        FROM (
            SELECT i, j, w FROM wins
            UNION ALL
            SELECT j AS i, i AS j, CAST(0 AS BIGINT) AS w FROM wins
        ) GROUP BY i, j
    ),
    n_ij AS MATERIALIZED (
        SELECT x.i, x.j, x.w, x.w + y.w AS n
        FROM mat x JOIN mat y ON x.i = y.j AND x.j = y.i
    ),
    items AS MATERIALIZED (
        SELECT i, CAST(SUM(w) AS BIGINT) AS wins,
               CAST(SUM(n) AS BIGINT) AS n_matches
        FROM n_ij GROUP BY i
    ),
    n_items AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM items),
    p0 AS MATERIALIZED (SELECT i, CAST(1000000 AS BIGINT) AS p_micro FROM items)"""
    ]
    for r in range(1, iters + 1):
        parts.append(
            f""",
    den{r} AS (
        SELECT m.i,
               CAST(SUM(CAST(round(1e15 * m.n
                   / (pi.p_micro + pj.p_micro)) AS BIGINT)) AS BIGINT)
                   AS d_nano
        FROM n_ij m
        JOIN p{r - 1} pi ON pi.i = m.i
        JOIN p{r - 1} pj ON pj.i = m.j
        GROUP BY m.i
    ),
    praw{r} AS (
        SELECT t.i,
               CASE WHEN d.d_nano > 0 THEN
                   CAST(round(1e15 * t.wins / d.d_nano) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS praw_micro
        FROM items t JOIN den{r} d ON d.i = t.i
    ),
    tot{r} AS (SELECT CAST(SUM(praw_micro) AS BIGINT) AS tot FROM praw{r}),
    p{r} AS MATERIALIZED (
        SELECT pr.i,
               GREATEST(CAST(1 AS BIGINT),
                   CAST(round(1e6 * n.k * pr.praw_micro / t.tot) AS BIGINT))
                   AS p_micro
        FROM praw{r} pr CROSS JOIN tot{r} t CROSS JOIN n_items n
    )"""
        )
    parts.append(
        f"""
    SELECT t.i AS source, t.n_matches, t.wins, p.p_micro,
           CAST(row_number() OVER (ORDER BY p.p_micro DESC, t.i ASC)
                AS INTEGER) AS rnk
    FROM items t JOIN p{iters} p ON p.i = t.i
    ORDER BY rnk
    """
    )
    return "".join(parts)
