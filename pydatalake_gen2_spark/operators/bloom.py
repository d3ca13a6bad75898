"""Distributed Bloom filter build + membership pre-filter.

Spark's own runtime row-level filtering (InjectRuntimeFilter) builds a
bloom from the small join side and probes it in the big side's scan; the
`bloom_filter_agg` / `might_contain` expressions it uses are internal and
not in the public function registry, so this module builds the same shape
from public primitives:

- k hash functions via Kirsch-Mitzenmacher double hashing
  (pos_i = h1 + i*h2 mod m, h1 = xxhash64, h2 = murmur3 hash) — the
  standard trick that gets k independent-enough probes from two hashes.
- The bit array is an array<bigint> of m/64 words, built DISTRIBUTIVELY:
  explode the k positions per key, groupBy word index, bit_or the masks
  (two tiny shuffles bounded by m/64, never by data volume), then
  collapse to a single-row array column that BROADCASTS to the probe side.
- Membership is pure codegen: element_at + shiftright + bitwise AND,
  no Python, no UDF.

False positives are possible (classic bloom contract) — callers that
need exactness follow the bloom pre-filter with an exact confirm join on
the surviving minority (see queries/llm.py::l17b_decontaminate_bloom).
False negatives are impossible: every inserted key sets all k bits.

Reference parity note: the reference repo (a REST client) has no bloom
or membership surface; this implements the published scale path promised
in l17's docstring ("at extreme gram cardinality swap the broadcast for
a bloom filter pre-pass").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """k bit positions for a key: pmod(h1 + i*h2, m) (Kirsch-Mitzenmacher).

    h2 is forced odd so its cycle is coprime with the power-of-two m —
    otherwise even h2 values probe only half the bit space.
    """
    h1 = F.xxhash64(col)
    h2 = F.hash(col).cast("bigint") * 2 + 1
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(n_hashes)]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 18,
    n_hashes: int = 7,
) -> DataFrame:
    """Build a bloom bitmap over ``keys[key_col]`` → one-row DataFrame
    with column ``bloom_words: array<bigint>`` (length m_bits/64).

    Fully distributed: position explode → per-word bit_or (partial-agg
    combines map-side) → sort by word index → single array row. The two
    shuffles move at most m_bits/64 rows regardless of key count.
    m_bits must be a multiple of 64.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    pos = F.explode(F.array(*_positions(F.col(key_col), n_hashes, m_bits))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                F.pmod(F.col("pos"), F.lit(64)).cast("int"),
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
    )
    # Dense array: missing word indexes (no bits set) become 0 via a
    # sequence spine join — keeps element_at addressing O(1) and exact.
    spine = words.sparkSession.range(n_words).select(F.col("id").cast("int").alias("w"))
    return (
        spine.join(words, "w", "left")
        .select("w", F.coalesce("word", F.lit(0).cast("bigint")).alias("word"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("w", "word"))).alias("ws"))
        .select(F.transform("ws", lambda s: s["word"]).alias("bloom_words"))
    )


def might_contain(
    key: Column, bloom_words: Column, m_bits: int = 1 << 18, n_hashes: int = 7
) -> Column:
    """Membership predicate: all k probed bits set. Pure codegen
    (element_at / shiftrightunsigned / bitwise AND) — safe in a scan
    filter; pair with F.broadcast on the bloom's one-row frame."""
    checks = []
    for p in _positions(key, n_hashes, m_bits):
        word = F.element_at(bloom_words, (p / 64).cast("int") + 1)
        # NB: `% 2` keeps the sign of a negative long (Java semantics),
        # so a set bit 0 in a negative word would test as -1 — AND instead.
        bit = F.call_function(
            "shiftrightunsigned", word, F.pmod(p, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1).cast("bigint"))
        checks.append(bit == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
