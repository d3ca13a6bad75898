"""Scalar function surface — SURVEY.md §2B.8 (F01-F25).

Pure dialect pairs: identical text where Spark and DuckDB agree, translated
names otherwise (split↔string_split, sha2↔sha256, date_format↔strftime,
dayofweek↔dow+1, ...). All run JVM-side in whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from pydatalake_gen2_spark.registry import sql_pair

# Spark's legacy two-arg ltrim/rtrim takes (trimStr, str) — reversed vs
# DuckDB's (str, chars). ANSI TRIM(LEADING/TRAILING ... FROM ...) on the
# Spark side avoids the trap.
sql_pair(
    "f01_case_length_trim",
    """
    SELECT doc_id,
           upper(substring(text, 1, 12)) AS up12,
           lower(source) AS lsource,
           CAST(length(text) AS BIGINT) AS n,
           trim('  ' || lang || '  ') AS tlang,
           trim(LEADING 'x' FROM 'xx' || lang) AS ltr,
           trim(TRAILING 'y' FROM lang || 'yy') AS rtr
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id,
           upper(substring(text, 1, 12)) AS up12,
           lower(source) AS lsource,
           CAST(length(text) AS BIGINT) AS n,
           trim('  ' || lang || '  ') AS tlang,
           ltrim('xx' || lang, 'x') AS ltr,
           rtrim(lang || 'yy', 'y') AS rtr
    FROM documents
    """,
)

sql_pair(
    "f02_substring",
    """
    SELECT doc_id,
           substring(text, 1, 20) AS head20,
           substring(text, 25, 10) AS mid10,
           substr(source, 4) AS src_id
    FROM documents
    """,
)

sql_pair(
    "f03_concat_pad_repeat",
    """
    SELECT doc_id,
           concat(lang, ':', source) AS tag,
           concat_ws('-', lang, source, 'x') AS tag2,
           reverse(lang) AS rlang,
           lpad(lang, 6, '.') AS lp,
           rpad(source, 8, '_') AS rp,
           repeat(lang, 3) AS rep
    FROM documents
    """,
)

sql_pair(
    "f04_split",
    """
    SELECT doc_id,
           CAST(size(split(text, ' ')) AS BIGINT) AS n_tok,
           element_at(split(text, ' '), 1) AS first_tok,
           element_at(split(text, ' '), -1) AS last_tok
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           string_split(text, ' ')[1] AS first_tok,
           string_split(text, ' ')[-1] AS last_tok
    FROM documents
    """,
)

sql_pair(
    "f05_regexp",
    """
    SELECT doc_id,
           COALESCE(regexp_extract(text, '(jo[a-z]+)', 1), '') AS first_jo,
           regexp_replace(text, '[aeiou]', '_') AS devoweled
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id,
           COALESCE(regexp_extract(text, '(jo[a-z]+)', 1), '') AS first_jo,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled
    FROM documents
    """,
)

sql_pair(
    "f06_like_contains",
    """
    SELECT doc_id,
           text LIKE '%join%' AS has_join,
           lang ILIKE 'E%' AS is_en_ilike,
           text LIKE 'the%' AS starts_the,
           CAST(instr(text, 'data') AS BIGINT) AS data_pos,
           contains(text, 'stream') AS has_stream
    FROM documents
    """,
)

sql_pair(
    "f07_levenshtein",
    """
    SELECT doc_id,
           CAST(levenshtein(lang, 'en') AS BIGINT) AS lev_lang,
           CAST(levenshtein(source, 'src1') AS BIGINT) AS lev_src
    FROM documents
    """,
)

sql_pair(
    "f08_hashes",
    """
    SELECT doc_id, md5(text) AS h_md5, sha2(text, 256) AS h_sha
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha
    FROM documents
    """,
)

sql_pair(
    "f09_date_parts",
    """
    SELECT event_id,
           CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS mo,
           CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
           CAST(minute(ts) AS INT) AS mi, CAST(second(ts) AS INT) AS s
    FROM events
    """,
)

# DuckDB's date_trunc('month', ts) yields DATE, Spark's yields TIMESTAMP →
# CAST both to DATE.
sql_pair(
    "f10_date_trunc",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
    """,
)

sql_pair(
    "f11_date_arith",
    """
    SELECT o_orderkey,
           date_add(CAST(o_orderdate AS DATE), 30) AS plus30,
           date_add(CAST(o_orderdate AS DATE), -7) AS minus7
    FROM orders
    """,
    duck_sql="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS minus7
    FROM orders
    """,
)

sql_pair(
    "f12_datediff",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(datediff(CAST(l_shipdate AS DATE), DATE '1995-01-01') AS BIGINT) AS days_since
    FROM lineitem
    """,
    duck_sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
               AS days_since
    FROM lineitem
    """,
)

# Spark dayofweek: 1=Sunday; DuckDB dow: 0=Sunday → +1 shim on the oracle side.
sql_pair(
    "f13_extract_fields",
    """
    SELECT event_id,
           CAST(dayofweek(ts) AS INT) AS dow1,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(weekofyear(ts) AS INT) AS wk,
           CAST(quarter(ts) AS INT) AS q,
           CAST(unix_timestamp(ts) AS BIGINT) AS epoch_s
    FROM events
    """,
    duck_sql="""
    SELECT event_id,
           CAST(extract(dow FROM ts) + 1 AS INT) AS dow1,
           CAST(extract(doy FROM ts) AS INT) AS doy,
           CAST(extract(week FROM ts) AS INT) AS wk,
           CAST(extract(quarter FROM ts) AS INT) AS q,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
    FROM events
    """,
)

sql_pair(
    "f14_format_timestamp",
    """
    SELECT event_id,
           date_format(ts, 'yyyy-MM-dd') AS d_str,
           date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_str
    FROM events
    """,
    duck_sql="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d') AS d_str,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    """,
)

sql_pair(
    "f15_parse_date",
    """
    SELECT o_orderkey,
           to_date(date_format(o_orderdate, 'yyyy-MM-dd'), 'yyyy-MM-dd') AS roundtrip,
           to_timestamp(concat(date_format(o_orderdate, 'yyyy-MM-dd'), ' 12:30:00'),
                        'yyyy-MM-dd HH:mm:ss') AS noon
    FROM orders
    """,
    duck_sql="""
    SELECT o_orderkey,
           CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS roundtrip,
           strptime(strftime(o_orderdate, '%Y-%m-%d') || ' 12:30:00',
                    '%Y-%m-%d %H:%M:%S') AS noon
    FROM orders
    """,
)

sql_pair(
    "f16_numeric_basics",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_d,
           CAST(round(l_extendedprice, 0) AS DOUBLE) AS price_r0,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(sign(l_discount - 0.05) AS INT) AS sgn,
           CAST(mod(l_linenumber, 3) AS INT) AS m3
    FROM lineitem
    """,
)

sql_pair(
    "f17_math_fns",
    """
    SELECT p_partkey,
           ROUND(power(p_size, 1.5), 6) AS pw,
           ROUND(sqrt(p_size), 6) AS sq,
           ROUND(exp(p_size * 0.1), 6) AS ex,
           ROUND(ln(p_size + 1), 6) AS lnv,
           ROUND(log10(p_size + 1), 6) AS l10,
           ROUND(log2(p_size + 1), 6) AS l2
    FROM part
    """,
)

sql_pair(
    "f18_explode",
    """
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT explode(split(text, ' ')) AS token FROM documents) t
    WHERE token LIKE 'j%'
    GROUP BY token
    """,
    duck_sql="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    WHERE token LIKE 'j%'
    GROUP BY token
    """,
)

sql_pair(
    "f19_array_size_contains",
    """
    SELECT doc_id,
           CAST(size(split(text, ' ')) AS BIGINT) AS n_tok,
           array_contains(split(text, ' '), 'data') AS has_data,
           array_contains(split(text, ' '), 'zzz') AS has_zzz
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           list_contains(string_split(text, ' '), 'data') AS has_data,
           list_contains(string_split(text, ' '), 'zzz') AS has_zzz
    FROM documents
    """,
)

sql_pair(
    "f20_array_transforms",
    """
    SELECT doc_id,
           array_join(slice(sort_array(array_distinct(split(text, ' '))), 1, 5), ',')
               AS first5_distinct,
           CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_distinct,
           CAST(size(flatten(array(split(lang, 'x'), split(source, 'x')))) AS BIGINT) AS flat_n
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id,
           array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 5),
                           ',') AS first5_distinct,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
           CAST(len(flatten([string_split(lang, 'x'), string_split(source, 'x')])) AS BIGINT)
               AS flat_n
    FROM documents
    """,
)

sql_pair(
    "f21_element_at_literal",
    """
    SELECT doc_id,
           element_at(split(text, ' '), 2) AS tok2,
           element_at(array('a', 'b', 'c'), 3) AS lit3
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id,
           string_split(text, ' ')[2] AS tok2,
           (['a', 'b', 'c'])[3] AS lit3
    FROM documents
    """,
)

sql_pair(
    "f22_sequence",
    """
    SELECT p_partkey,
           CAST(size(sequence(1, p_size)) AS BIGINT) AS seq_n,
           CAST(aggregate(sequence(1, p_size), 0L, (s, x) -> s + x) AS BIGINT) AS seq_sum
    FROM part
    """,
    duck_sql="""
    SELECT p_partkey,
           CAST(len(generate_series(1, p_size)) AS BIGINT) AS seq_n,
           CAST(list_sum(generate_series(1, p_size)) AS BIGINT) AS seq_sum
    FROM part
    """,
)

sql_pair(
    "f23_json_extract",
    """
    SELECT event_id,
           CAST(get_json_object(props, '$.k') AS INT) AS k_val
    FROM events
    """,
    duck_sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val
    FROM events
    """,
)

sql_pair(
    "f24_from_json",
    """
    SELECT event_id,
           from_json(props, 'k INT').k AS k_field,
           array_join(map_keys(from_json(props, 'map<string,int>')), ',') AS keys
    FROM events
    """,
    duck_sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_field,
           array_to_string(json_keys(props), ',') AS keys
    FROM events
    """,
)

# Spark-only conveniences; oracle = equivalent DuckDB compositions.
sql_pair(
    "f25_spark_conveniences",
    """
    SELECT doc_id,
           initcap(substring(text, 1, 30)) AS title30,
           translate(lang, 'aeo', '430') AS leet
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id,
           array_to_string(
             list_transform(string_split(substring(text, 1, 30), ' '),
                            x -> upper(x[1]) || x[2:]), ' ') AS title30,
           replace(replace(replace(lang, 'a', '4'), 'e', '3'), 'o', '0') AS leet
    FROM documents
    """,
)

sql_pair(
    "f25b_posexplode",
    """
    SELECT doc_id, CAST(pos + 1 AS BIGINT) AS pos1, tok
    FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (pos, tok) FROM documents) t
    WHERE doc_id < 50
    """,
    duck_sql="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos1,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
    WHERE doc_id < 50
    """,
)
