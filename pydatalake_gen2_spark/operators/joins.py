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
