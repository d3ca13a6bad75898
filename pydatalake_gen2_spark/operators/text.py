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
    """Whitespace tokens; NULL text is treated as empty (total function —
    docs with null text flow through every text op instead of vanishing)."""
    return F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ")


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


def chunk_tokens(
    df: DataFrame,
    size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking: split each document's token stream into
    training samples of ``size`` tokens advancing by ``stride`` (overlap
    = size - stride), the standard packing-adjacent step of an LLM data
    pipeline. Chunk i covers tokens [i*stride+1, i*stride+size]; the
    number of chunks is 1 + ceil(max(0, n - size) / stride), so every
    token is covered and only the last chunk may be short.

    Row-local: one explode per doc into its chunk index range, slices via
    array intrinsics — zero shuffle, embarrassingly parallel, and the
    1→N fan-out is bounded by n/stride per doc (Spark splits oversized
    output partitions via AQE if a corpus has pathological doc lengths).

    Output: (doc_id, chunk_id BIGINT, chunk_text, n_tokens BIGINT).
    """
    if size < 1 or stride < 1 or stride > size:
        raise ValueError(f"need 1 <= stride <= size, got size={size} stride={stride}")
    toks = tokens(text_col)
    n = F.size(toks)
    overflow = F.greatest(n - size, F.lit(0))
    n_chunks = (
        F.lit(1) + F.floor((overflow + F.lit(stride - 1)) / F.lit(stride))
    ).cast("int")
    base = df.select(
        F.col(id_col), toks.alias("_t"), F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i")
    )
    return base.select(
        F.col(id_col),
        F.col("i").cast("bigint").alias("chunk_id"),
        F.array_join(F.slice("_t", F.col("i") * stride + 1, F.lit(size)), " ").alias(
            "chunk_text"
        ),
        F.least(F.size("_t") - F.col("i") * stride, F.lit(size))
        .cast("bigint")
        .alias("n_tokens"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 ranking of every document against a fixed bag of query
    terms (Robertson & Walker SIGIR'94) — the classic lexical-retrieval
    scorer a training-data pipeline uses for quality-targeted selection
    (e.g. DSIR-style proxy retrieval).

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5));
    score  = Σ_t idf · tf·(k1+1) / (tf + k1·(0.25… see below)·dl/avgdl).

    Scale shape: tokens are filtered to the query bag BEFORE the shuffle
    (the exchange carries only (doc, query_term) hits, not the corpus
    vocabulary); per-doc length rides the same groupBy via MIN(dl) so
    there is no second join back to the corpus; term document-frequencies
    and the 1-row (N, avgdl) stats frame are broadcast. One corpus scan,
    one tiny shuffle, no driver-side action.

    Floats: each per-term score and the final sum are ROUND(…,4) — the
    established H-tier discipline (see l07) — and the inner weight is
    written ``0.25 + 0.75·dl/avgdl`` (constant-folded left-to-right the
    same way in Spark and DuckDB) so both engines evaluate bit-identical
    expressions.

    Output: (doc_id, bm25, rn) for docs matching ≥1 term; rn ranks by
    (bm25 DESC, doc_id) — a global window over output-sized data (use
    the O03 top-k pattern instead when only the head is needed).
    """
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(query_terms))
    tf = base.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = df.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size(toks)).alias("avgdl")
    )
    idf = F.log(F.lit(1.0) + ((F.col("n") - F.col("df")).cast("double") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    per_term = F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, 4)
    from pyspark.sql.window import Window

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), per_term.alias("s"))
        .groupBy(id_col)
        .agg(F.round(F.sum("s"), 4).alias("bm25"))
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    return scored.withColumn("rn", F.row_number().over(w).cast("bigint"))


def char_entropy(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy (bits) of the character distribution per document
    — a cheap quality / gibberish signal (near-zero = degenerate repeats,
    ~4.1 = typical English prose; binary junk scores far higher).

    explode chars → partial-agg groupBy(doc, ch) → groupBy(doc) entropy.
    Both shuffles carry (doc, ch, count) tallies, never raw text; per-doc
    cardinality is bounded by the alphabet so the second agg is tiny.
    ROUND(…,4) float discipline (l07 precedent).

    Output: (doc_id, n_chars BIGINT, n_distinct_chars BIGINT, entropy).
    """
    counts = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    p = F.col("c") / n
    return (
        counts.groupBy(id_col)
        .agg(
            n.cast("bigint").alias("n_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
            F.round(-F.sum(F.col("c") * F.log2(F.col("c"))) / n + F.log2(n), 4).alias(
                "entropy"
            ),
        )
    )
