"""Skew-aware join helpers.

At 100 TB a handful of hot keys (one mega-customer, one default supplier)
can put an entire shuffle partition on one executor. AQE's skew-join split
(`spark.sql.adaptive.skewJoin.enabled`, on in our session) handles most of
this at runtime; `salted_join` is the explicit fallback for the cases AQE
can't rewrite (e.g. skewed aggregation feeding a join, or a build side too
big to split), and it documents the pattern.

Semantics are identical to a plain equi-join — the salt only changes the
physical key distribution — which is why the registry entry for this
operator hash-matches a plain-join DuckDB oracle (SURVEY.md §2B.3).

Replaces nothing in the reference (it has no joins; client.py is a REST
client) — this is part of the declared engine surface, SURVEY.md §2B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left` (large, possibly skewed) to `right` (smaller) on
    ``left_key = right_key``, spreading each hot key over ``n_salt``
    shuffle partitions.

    - left rows get a deterministic salt in [0, n_salt) from a hash of the
      whole row (any value works — the salt never reaches the result);
    - right rows are replicated once per salt value (size × n_salt, so
      keep the right side the smaller one);
    - the join key becomes (key, salt), so one hot key now hashes to
      n_salt distinct shuffle buckets.

    Salt columns are dropped from the result; output columns = left ∪ right
    exactly as a plain ``left.join(right, ...)`` would produce.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (replicating the "
                         "right side is wrong for right/full outer)")
    salt_l = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    lhs = left.withColumn("_salt", salt_l)
    rhs = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    # DataFrame-qualified key refs: with a shared key name (e.g. both
    # sides carrying user_id) unqualified F.col() raises an
    # ambiguous-reference AnalysisException.
    cond = (lhs[left_key] == rhs[right_key]) & (lhs["_salt"] == rhs["_salt"])
    out = lhs.join(rhs, cond, how)
    return out.drop(lhs["_salt"]).drop(rhs["_salt"])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval-overlap join (closed intervals, integer domains — e.g.
    epoch microseconds): all (l, r) pairs sharing the ``on`` keys with
    ``l.start <= r.end AND r.start <= l.end``.

    A naive formulation is a per-key theta join (BroadcastNestedLoop or
    a key-local cross product). This one turns it into a pure EQUI-join:
    each interval explodes to the ``bin_width``-sized bins it covers, the
    join key is (on, bin), and the overlap predicate evaluates inside
    the join stage. A pair overlapping across several shared bins is
    emitted EXACTLY ONCE — only in the bin containing the later of the
    two interval starts (row-local arithmetic, same trick as the
    simhash minimal-band emission) — so there is no distinct shuffle.

    Scale: shuffle volume = Σ interval_length/bin_width + 1 rows per
    side, equi-keyed so AQE skew-split applies; pick bin_width ≈ the
    typical interval length so most intervals hit 1-2 bins. Caller
    guarantees column names don't clash apart from ``on``.
    """
    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bin_width), F.floor(F.col(e) / bin_width)
                )
            ),
        )

    lb = binned(left, left_start, left_end).alias("l")
    rb = binned(right, right_start, right_end).alias("r")
    ls, le = F.col(f"l.{left_start}"), F.col(f"l.{left_end}")
    rs, re_ = F.col(f"r.{right_start}"), F.col(f"r.{right_end}")
    emit_bin = F.floor(F.greatest(ls, rs) / bin_width)
    cond = (
        (ls <= re_) & (rs <= le) & (F.col("l._bin") == emit_bin)
    )
    out = lb.join(
        rb,
        [F.col(f"l.{c}") == F.col(f"r.{c}") for c in on]
        + [F.col("l._bin") == F.col("r._bin"), cond],
    )
    keep = (
        [F.col(f"l.{c}") for c in on]
        + [F.col(f"l.{c}") for c in left.columns if c not in on]
        + [F.col(f"r.{c}") for c in right.columns if c not in on]
    )
    return out.select(*keep)


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    k: int = 3,
) -> DataFrame:
    """All unordered pairs of DISTINCT values of ``col`` within
    Levenshtein distance ``k`` — entity-resolution style fuzzy matching
    without a cross product.

    Blocking: edit distance ≤ k implies length difference ≤ k, so values
    bucket by floor(len / (k+1)); the left side emits to its own and the
    two adjacent buckets (any pair with |Δlen| ≤ k shares one of those),
    the right side stays in its home bucket — each candidate pair meets
    EXACTLY once (the right bucket is unique), so no distinct shuffle.
    The exact levenshtein verify runs inside the join stage.

    Scale: operates on the distinct-value dictionary (groupBy first), so
    the join is dictionary-sized, not row-sized; the 3× emission is the
    only fan-out. For huge dictionaries compose a second block key
    (first char / q-gram prefix) the same way. Output:
    (val_a, val_b, distance BIGINT) with val_a < val_b.
    """
    w = k + 1
    vals = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull()).distinct()
    home = F.floor(F.length("v") / w)
    left = vals.select(
        "v", F.explode(F.array(home - 1, home, home + 1)).alias("b")
    ).alias("l")
    right = vals.select("v", home.alias("b")).alias("r")
    lev = F.levenshtein(F.col("l.v"), F.col("r.v"))
    return (
        left.join(
            right,
            (F.col("l.b") == F.col("r.b")) & (F.col("l.v") < F.col("r.v")),
        )
        .filter(
            (
                F.abs(F.length(F.col("l.v")) - F.length(F.col("r.v"))) <= k
            )
            & (lev <= k)
        )
        .select(
            F.col("l.v").alias("val_a"),
            F.col("r.v").alias("val_b"),
            lev.cast("bigint").alias("distance"),
        )
    )
