"""Text-analysis extensions (task brief: language-ID, quality scoring,
token counting, document fingerprinting) — tier-H with DuckDB-composition
oracles mirroring each heuristic exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydatalake_gen2_spark.operators import text
from pydatalake_gen2_spark.registry import register, sql_pair


def _profile_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in text.LANG_PROFILES[lang])
    return (
        f"len(list_intersect(list_distinct(string_split(lower(text), ' ')), "
        f"[{words}])) AS score_{lang}"
    )


@register(
    "t01_language_id",
    duck_sql=f"""
    WITH scored AS (
      SELECT doc_id,
             {_profile_sql('de')},
             {_profile_sql('en')},
             {_profile_sql('es')},
             {_profile_sql('fr')}
      FROM documents)
    SELECT doc_id,
           CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
                WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
                WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
                WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
                ELSE 'fr' END AS pred_lang,
           CAST(score_de AS INT) AS score_de,
           CAST(score_en AS INT) AS score_en,
           CAST(score_es AS INT) AS score_es,
           CAST(score_fr AS INT) AS score_fr
    FROM scored
    """,
)
def t01_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (argmax, alphabetical tie-break)."""
    return text.language_id(spark.table("documents"))


@register(
    "t02_quality_score",
    duck_sql="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_obs,
           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
           length(regexp_replace(text, '[^a-z]', '', 'g')) / length(text) AS alpha_ratio,
           len(list_intersect(list_distinct(string_split(lower(text), ' ')),
               ['the','a','and','or','of','to','in','is','on','for'])) /
             greatest(len(list_distinct(string_split(lower(text), ' '))), 1)
               AS stopword_ratio,
           (length(text) - (len(string_split(lower(text), ' ')) - 1)) /
             greatest(len(string_split(lower(text), ' ')), 1) AS mean_tok_len
    FROM documents
    """,
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features: char/token counts, alpha ratio, stopword ratio,
    mean token length (raw IEEE ratios of exact ints)."""
    return text.quality_score(spark.table("documents"))


@register(
    "t03_token_count",
    duck_sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(list_sum(list_transform(
                  list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                              w -> length(w) > 0),
                  w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def t03_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish (ceil(len/4) per word) token count estimates."""
    return text.token_count_bpe_ish(spark.table("documents"))


@register(
    "t04_fingerprint",
    duck_sql="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
    SELECT doc_id,
           list_min(list_transform(generate_series(1, len(t) - 4),
                    i -> md5(array_to_string(t[i:i+4], ' ')))) AS fp
    FROM toks WHERE len(t) >= 5
    """,
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over rolling 5-gram windows."""
    return text.fingerprint(spark.table("documents"), n=5)


sql_pair(
    "t05_quality_filter",
    """
    WITH feats AS (
      SELECT doc_id,
             size(split(text, ' ')) AS n_words,
             length(text) AS n_chars_obs,
             length(regexp_replace(text, '[^a-z ]', '')) / length(text)
               AS alpha_space_ratio
      FROM documents)
    SELECT doc_id,
           (n_words >= 5) AS len_ok,
           (n_chars_obs / n_words <= 12.0) AS wordlen_ok,
           (alpha_space_ratio >= 0.8) AS alpha_ok,
           ((n_words >= 5) AND (n_chars_obs / n_words <= 12.0)
             AND (alpha_space_ratio >= 0.8)) AS keep
    FROM feats
    """,
    duck_sql="""
    WITH feats AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             length(text) AS n_chars_obs,
             length(regexp_replace(text, '[^a-z ]', '', 'g')) / length(text)
               AS alpha_space_ratio
      FROM documents)
    SELECT doc_id,
           (n_words >= 5) AS len_ok,
           (n_chars_obs / n_words <= 12.0) AS wordlen_ok,
           (alpha_space_ratio >= 0.8) AS alpha_ok,
           ((n_words >= 5) AND (n_chars_obs / n_words <= 12.0)
             AND (alpha_space_ratio >= 0.8)) AS keep
    FROM feats
    """,
    doc="""Gopher-style heuristic quality gate: per-rule boolean flags plus
    the conjunction — the shape a corpus-cleaning pipeline materializes so
    rule ablations are one GROUP BY away. Pure per-row codegen, no
    shuffle.""",
)


@register(
    "t06_repetition_metrics",
    duck_sql="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    b AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(generate_series(1, len(toks) - 1),
                                      i -> toks[i] || ' ' || toks[i+1])
                  END AS bgs
      FROM t)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           1.0 - len(list_distinct(toks)) / len(toks) AS dup_token_frac,
           list_max(list_transform(list_distinct(toks),
                                   x -> len(list_filter(toks, y -> y = x))))
             / len(toks) AS top_token_share,
           CASE WHEN len(toks) >= 2
                THEN 1.0 - len(list_distinct(bgs)) / (len(toks) - 1)
                ELSE 0.0 END AS dup_bigram_frac
    FROM b
    """,
)
def t06_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (dup-token / top-token / dup-bigram
    fractions) — the standard repetitious-document gate for training
    corpora. Row-local HOF expressions, zero shuffle."""
    return text.repetition_metrics(spark.table("documents"))


_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "t07_pii_redaction",
    duck_sql=f"""
    WITH s AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail' ||
             CAST(doc_id % 7 AS VARCHAR) || '.example.com or call 555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS synth
      FROM documents),
    r AS (
      SELECT doc_id, synth,
             regexp_replace(regexp_replace(synth, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g') AS red
      FROM s)
    SELECT doc_id,
           CAST(len(regexp_extract_all(synth, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(synth, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(length(red) AS BIGINT) AS redacted_len,
           md5(red) AS redacted_md5
    FROM r
    """,
)
def t07_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (email/phone regex redaction + per-doc match counts).
    The fixture text is PII-free, so a deterministic synthetic email+phone
    is appended per row first — the redaction machinery then provably
    fires (counts >= 1) and the oracle checks the redacted text verbatim
    via md5. Pure per-row JVM regex expressions: no shuffle, scan-pushdown
    projection, scales linearly. Patterns are kept in the common
    Java-regex/RE2 subset so both engines match identically."""
    d = spark.table("documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(synth, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(synth, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(synth, F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.length(red).cast("bigint").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


@register(
    "t08_boilerplate_chunks",
    duck_sql="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) // 3),
               i -> toks[3*i-2] || ' ' || toks[3*i-1] || ' ' || toks[3*i])) AS chunk
      FROM t WHERE len(toks) >= 3),
    f AS (SELECT chunk, COUNT(*) AS freq FROM c GROUP BY chunk),
    j AS (SELECT c.doc_id, f.freq FROM c JOIN f USING (chunk))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN freq >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           SUM(CASE WHEN freq >= 5 THEN 1 ELSE 0 END) / COUNT(*) AS boiler_frac
    FROM j GROUP BY doc_id
    """,
)
def t08_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document boilerplate detection: segment each doc
    into non-overlapping 3-token chunks (production: lines/sentences),
    count each chunk's corpus frequency, and report the per-doc fraction
    of chunks that are corpus-frequent (freq >= 5). Two partial-agg
    shuffles (chunk freq, per-doc rollup); at 100 TB the frequent-chunk
    set is tiny relative to the corpus, so the freq side re-joins as a
    broadcast after a HAVING filter — same plan, smaller exchange."""
    d = spark.table("documents")
    toks = text.tokens()
    chunks_arr = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), (F.size(toks) / 3).cast("int")),
            lambda i: F.array_join(F.slice(toks, (i - 1) * 3 + 1, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    c = d.select("doc_id", F.explode(chunks_arr).alias("chunk"))
    freq = c.groupBy("chunk").agg(F.count(F.lit(1)).alias("freq"))
    is_boiler = F.when(F.col("freq") >= 5, 1).otherwise(0)
    return (
        c.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(is_boiler).alias("n_boiler"),
            (F.sum(is_boiler) / F.count(F.lit(1))).alias("boiler_frac"),
        )
    )


@register(
    "t09_char_entropy",
    duck_sql="""
    WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
    cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           ROUND(-SUM(c * log2(c)) / SUM(c) + log2(SUM(c)), 4) AS entropy
    FROM cnt GROUP BY doc_id
    """,
)
def t09_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy (quality /
    gibberish signal). Two partial-aggregated shuffles carrying only
    (doc, ch, count) tallies; identical -Σc·log2(c)/n + log2(n) form on
    both engines for float determinism."""
    return text.char_entropy(spark.table("documents"))


sql_pair(
    "t10_lexical_density",
    """
    WITH t AS (SELECT doc_id, split(lower(text), ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(size(toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks), 4)
               AS type_token_ratio,
           ROUND(CAST(size(filter(toks, w -> w IN ('a', 'the'))) AS DOUBLE)
                 / size(toks), 4) AS stopword_ratio,
           ROUND(CAST(aggregate(toks, 0L, (s, w) -> s + length(w)) AS DOUBLE)
                 / size(toks), 4) AS avg_word_len
    FROM t ORDER BY doc_id
    """,
    """
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
               AS type_token_ratio,
           ROUND(CAST(len(list_filter(toks, w -> w IN ('a', 'the'))) AS DOUBLE)
                 / len(toks), 4) AS stopword_ratio,
           ROUND(CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
                 / len(toks), 4) AS avg_word_len
    FROM t ORDER BY doc_id
    """,
    doc="Lexical-density quality signals per doc: type-token ratio "
        "(vocabulary diversity — low on templated/spam text), stopword "
        "ratio (natural-language-ness; Gopher uses the same signal), "
        "mean word length. All row-local higher-order functions — ZERO "
        "shuffle, scans only doc_id+text; the division order is fixed "
        "so both engines emit bit-identical doubles before ROUND.",
)


sql_pair(
    "t11_readability_score",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS n_words,
             CAST(length(regexp_replace(lower(text), '[^.!?]', '')) AS BIGINT)
               AS n_sentences,
             CAST(length(regexp_replace(lower(text), '[^aeiou]', '')) AS BIGINT)
               AS n_vowels
      FROM documents)
    SELECT doc_id, n_words, GREATEST(n_sentences, 1) AS n_sentences, n_vowels,
           ROUND(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / GREATEST(n_sentences, 1))
                 - 84.6 * (CAST(n_vowels AS DOUBLE) / n_words), 4) AS flesch_proxy
    FROM m WHERE n_words > 0
    """,
    """
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS n_words,
             CAST(length(regexp_replace(lower(text), '[^.!?]', '', 'g')) AS BIGINT)
               AS n_sentences,
             CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS BIGINT)
               AS n_vowels
      FROM documents)
    SELECT doc_id, n_words, GREATEST(n_sentences, 1) AS n_sentences, n_vowels,
           ROUND(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / GREATEST(n_sentences, 1))
                 - 84.6 * (CAST(n_vowels AS DOUBLE) / n_words), 4) AS flesch_proxy
    FROM m WHERE n_words > 0
    """,
    doc="T11: readability scoring (Flesch reading-ease with a vowel-run "
        "syllable proxy — the classic no-dictionary approximation): the "
        "document-difficulty signal curation pipelines bucket corpora "
        "by. Counts are exact integers from regexp strips; the final "
        "formula is one ROUND(4)ed row-local double expression. "
        "Complements t02/t05 (quality gates) and t10 (lexical density).",
)


# ---------------------------------------------------------------------------
# t12: Zipf-law fit of the corpus token-frequency curve
# ---------------------------------------------------------------------------

_T12_BODY = """
    WITH tok AS (
      SELECT {tok} AS token FROM documents),
    freq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS f
      FROM tok GROUP BY token),
    ranked AS (
      SELECT f,
             CAST(ROW_NUMBER() OVER (ORDER BY f DESC, token) AS BIGINT) AS r
      FROM freq),
    pts AS (
      SELECT CAST(ROUND(LN(CAST(r AS DOUBLE)), 8) AS DECIMAL(20,10)) AS x,
             CAST(ROUND(LN(CAST(f AS DOUBLE)), 8) AS DECIMAL(20,10)) AS y,
             CAST(ROUND(ROUND(LN(CAST(r AS DOUBLE)), 8)
                        * ROUND(LN(CAST(f AS DOUBLE)), 8), 8)
                  AS DECIMAL(20,10)) AS xy,
             CAST(ROUND(ROUND(LN(CAST(r AS DOUBLE)), 8)
                        * ROUND(LN(CAST(r AS DOUBLE)), 8), 8)
                  AS DECIMAL(20,10)) AS xx
      FROM ranked WHERE r <= 200),
    moments AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(xy) AS sxy, SUM(xx) AS sxx
      FROM pts)
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
             AS zipf_slope,
           ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                 - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                   * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4)
             AS ln_intercept
    FROM moments
    """

sql_pair(
    "t12_zipf_fit",
    _T12_BODY.format(tok="explode(split(lower(text), ' '))"),
    _T12_BODY.format(tok="unnest(string_split(lower(text), ' '))"),
    doc="T12: Zipf's-law fit — OLS slope of ln(freq) on ln(rank) over "
        "the top-200 corpus token ranks; natural text runs slope ~ -1, "
        "and deviation is the cheap corpus-health tell (synthetic/"
        "boilerplate-heavy corpora flatten the head, OCR noise fattens "
        "the tail) used as a pretraining-mix sanity gate next to T09's "
        "entropy. Float discipline is G48's: each log is ROUND(8) then "
        "every product re-ROUND(8) and summed as exact DECIMAL(20,10) "
        "— no order-dependent double accumulation anywhere; the slope/"
        "intercept are one final double expression each, ROUND(4). "
        "Scale: token counting is the canonical explode + partial+final "
        "agg; the rank sort is top-200 of the frequency table (a "
        "TakeOrdered at 100 TB, not a global sort). Dialect split: "
        "token explode spelling only.",
)
