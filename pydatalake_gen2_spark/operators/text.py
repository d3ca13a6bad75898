"""Text-analysis operators for training-data pipelines (L05-L08 +
language-ID, quality scoring, token counting, fingerprinting).

Everything is built from JVM-side expressions (split/explode/HOFs) so the
hot path stays in whole-stage codegen; nothing here drops to Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deliberately minimal and deterministic.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "de", "que", "y", "un"],
    "fr": ["le", "la", "et", "les", "des", "un"],
}

EN_STOPWORDS = ["the", "a", "and", "or", "of", "to", "in", "is", "on", "for"]


def tokens(text_col: str = "text") -> Column:
    return F.split(F.lower(F.col(text_col)), " ")


def ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as strings, via sequence+slice (SURVEY.md L06).
    Guarded: Spark's sequence(1, 0) counts DOWN ([1, 0]), so short docs
    must short-circuit to an empty array."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide token counts. explode → partial-agg groupBy: the shuffle
    carries (token, partial_count), not raw tokens."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf: explode + groupBy(doc, term); df: distinct(doc, term) → groupBy(term);
    idf = ln((N+1)/(df+1)); join tf⨝df broadcast (term dictionary is small
    relative to the corpus), rank per doc. Two shuffles + one broadcast —
    no O(n²) anywhere, scales linearly in corpus size.
    Output: (doc_id, term, score, rn)."""
    from pyspark.sql.window import Window

    n_docs = df.count()  # driver-side scalar, one cheap job
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.withColumn(
        "idf", F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0))
    )
    scored = tf.join(F.broadcast(idf), "term").withColumn(
        "score", F.round(F.col("tf") * F.col("idf"), 4)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(id_col, "term", "score", "rn")
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language-ID heuristic: score = |tokens ∩ profile|
    per language, argmax wins ('und' = undetermined when all scores are 0).
    Ties break alphabetically (deterministic). Pure array intrinsics."""
    toks = F.array_distinct(tokens(text_col))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
            f"score_{lang}"
        )
        for lang, words in sorted(LANG_PROFILES.items())
    ]
    scored = df.select(F.col(id_col), *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_PROFILES)])
    pred = F.lit("und")
    for lang in sorted(LANG_PROFILES, reverse=True):
        pred = F.when((best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)).otherwise(pred)
    return scored.withColumn("pred_lang", pred).select(
        id_col, "pred_lang", *[f"score_{lang}" for lang in sorted(LANG_PROFILES)]
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, token stats, stopword ratio,
    alpha ratio, mean token length. All codegen'd string/array expressions.
    Output one row per doc with ROUND(…,4) ratios."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-z]", ""))
    # Ratios of exact ints stay RAW IEEE divisions (bit-identical across
    # engines); ROUND here would hit half-boundaries for nice fractions.
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("n_chars_obs"),
        n_tok.cast("bigint").alias("n_tokens"),
        (alpha / F.length(text_col)).alias("alpha_ratio"),
        (n_stop / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))).alias(
            "stopword_ratio"
        ),
        ((F.length(text_col) - (n_tok - 1)) / F.greatest(n_tok, F.lit(1))).alias(
            "mean_tok_len"
        ),
    )


def token_count_bpe_ish(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token-count estimators: whitespace count + a BPE-ish regex count
    (split on non-alnum, then ceil(chars/4) per word — the classic
    '~4 chars per BPE token' rule)."""
    ws = F.size(F.split(F.col(text_col), " "))
    words = F.filter(F.split(F.col(text_col), "[^a-z0-9]+"), lambda w: F.length(w) > 0)
    bpe = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda s, w: s + F.ceil(F.length(w) / 4.0).cast("bigint"),
    )
    return df.select(
        F.col(id_col),
        ws.cast("bigint").alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1: repetitious documents are low-quality training data):

    - dup_token_frac:  1 - distinct/total tokens
    - top_token_share: occurrences of the most frequent token / total
    - dup_bigram_frac: 1 - distinct/total word 2-grams (0.0 for <2 tokens)

    All row-local higher-order-function expressions — zero shuffle,
    embarrassingly parallel like T01-T04 (the per-row quadratic
    top-token scan is bounded by document length, which a real pipeline
    caps anyway). Ratios are raw IEEE divisions of exact ints."""
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_t"), ngrams(toks, 2).alias("_b"))
    n_tok = F.size("_t")
    n_bg = F.size("_b")
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("_t"),
            lambda x: F.size(F.filter(F.col("_t"), lambda y: y == x)),
        )
    )
    return base.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        (F.lit(1.0) - F.size(F.array_distinct("_t")) / n_tok).alias("dup_token_frac"),
        (top_cnt / n_tok).alias("top_token_share"),
        F.when(n_bg > 0, F.lit(1.0) - F.size(F.array_distinct("_b")) / n_bg)
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


def fingerprint(df: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing-style document fingerprint: md5 each word n-gram (the
    rolling windows), keep the lexicographic min — robust to local edits.
    Output: (doc_id, fp STRING)."""
    grams = ngrams(tokens(text_col), n)
    fp = F.array_min(F.transform(grams, lambda g: F.md5(g)))
    return df.select(F.col(id_col), fp.alias("fp"))
