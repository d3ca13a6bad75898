"""Text-analysis extensions (task brief: language-ID, quality scoring,
token counting, document fingerprinting) — tier-H with DuckDB-composition
oracles mirroring each heuristic exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
