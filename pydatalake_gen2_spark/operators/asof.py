"""As-of join (J11) — Spark has no native ASOF JOIN; this is the engine's
library-level implementation (SURVEY.md §4.2: a Catalyst rule is unjustified).

Algorithm (union-sort, the scale path):
    1. Tag left rows 1, right rows 0 and UNION them on (key, ts, tag).
    2. Window per key ordered by (ts, tag, right-unique-id): carry the most
       recent right row forward as ONE struct with last(ignorenulls=True)
       (struct-atomic: NULL right fields can't mix rows).
    3. Keep only left rows → each has the latest right row with
       right.ts <= left.ts (tag ordering makes equal-ts rights visible).

Cost: ONE shuffle on the join key + an in-partition sort — O(n log n),
no range cross-product. At 100 TB this beats the naive
range-join + row_number (which explodes to every (left, right) pair
within the window) by orders of magnitude; skewed keys fall to AQE's
skew-join splitting.

Ties: two right rows with equal (key, ts) resolve to the largest
`right_order` value (deterministic pick).
"""

from __future__ import annotations

import datetime as _dt
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Simple INTERVAL literal body: "<n> <unit>" terms, e.g. "10 minutes",
# "1 hour 30 minutes". Validated before interpolation into F.expr so a
# malformed tolerance fails fast with a clear message instead of an
# opaque parse error (and never injects arbitrary expression text).
_INTERVAL_RE = re.compile(
    r"^\s*\d+\s+(year|month|week|day|hour|minute|second|millisecond|microsecond)s?"
    r"(\s+\d+\s+(year|month|week|day|hour|minute|second|millisecond|microsecond)s?)*\s*$",
    re.IGNORECASE,
)


def _tolerance_interval(tolerance: str | _dt.timedelta) -> "F.Column":
    if isinstance(tolerance, _dt.timedelta):
        micros = int(tolerance.total_seconds() * 1_000_000)
        return F.expr(f"INTERVAL {micros} microseconds")
    if not _INTERVAL_RE.match(str(tolerance)):
        raise ValueError(
            f"tolerance must be a timedelta or an interval body like "
            f"'10 minutes', got: {tolerance!r}"
        )
    return F.expr(f"INTERVAL {tolerance}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_order: str,
    carry: list[str],
    how: str = "left",
    tolerance: str | _dt.timedelta | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right[right_ts] <= left[left_ts], matching on `on`.

    carry: right columns to attach (prefixed ``asof_`` in the output).
    how: 'left' keeps unmatched left rows (carry columns NULL),
         'inner' drops them.
    tolerance: optional max lookback (a datetime.timedelta or an INTERVAL
        literal body, e.g. '10 minutes' — validated): a matched right row
        older than left_ts - tolerance is discarded (carry columns NULL)
        — pandas merge_asof semantics. The right ts rides inside the
        carried struct, so the check is one post-window predicate, not a
        second join.
    """
    if tolerance is not None:
        tol_interval = _tolerance_interval(tolerance)  # validate up front
    lcols = left.columns
    carry_in = list(carry) + (
        [right_ts] if tolerance is not None and right_ts not in carry else []
    )
    carry_t = ", ".join(
        f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in carry_in
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("long").alias("_rord"),
        F.lit(None).cast(f"struct<{carry_t}>").alias("_rrow"),
        *[F.col(c) for c in lcols],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(right_order).cast("long").alias("_rord"),
        F.struct(*[F.col(c) for c in carry_in]).alias("_rrow"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    # Order: ts, then right-before-left at equal ts (inclusive <=), then
    # right_order so the last-seen right row at a tied ts is the max-order one.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_tag"), F.col("_rord"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if tolerance is not None:
        within = F.col("_match").getField(right_ts) >= F.col("_ts") - tol_interval
        matched = matched.withColumn(
            "_match", F.when(within, F.col("_match"))
        )
    out = matched.select(
        *lcols, *[F.col("_match").getField(c).alias(f"asof_{c}") for c in carry]
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{carry[0]}").isNotNull())
    return out


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    carry: list[str],
    how: str = "inner",
) -> DataFrame:
    """Nearest-event join: for each left row, attach the right row whose
    timestamp is CLOSEST to the left timestamp (either direction), per
    key — the bidirectional generalization of asof_join (pandas
    merge_asof(direction='nearest') semantics).

    Ties resolve deterministically: equal |Δts| picks the EARLIER right
    row (the backward candidate); equal (key, ts) right rows pre-reduce
    to the minimum `right_id` row before the join.

    Algorithm: the same union-sort shape as asof_join — ONE shuffle on
    the key, one in-partition sort — with TWO frames over the same sort:
    last(ignorenulls) carries the latest right row at-or-before each left
    row, first(ignorenulls) over the forward frame carries the earliest
    right row after it; a final row-local comparison picks the closer
    side. No range cross-product at any point, so the cost profile is
    identical to asof_join at 100 TB.

    Output: left columns + ``nearest_<carry>`` + ``dist_us`` (abs Δ in
    microseconds). `how='left'` keeps unmatched left rows (NULL carries).
    """
    lcols = left.columns
    carry_in = [right_ts, right_id] + [
        c for c in carry if c not in (right_ts, right_id)
    ]
    # pre-reduce equal-(key, ts) right rows to the min right_id row:
    # min(struct(id, ...)) is ordered by its first field, so the whole
    # row is picked atomically (no column mixing)
    rr = (
        right.groupBy(F.col(on).alias("_k"), F.col(right_ts).alias("_ts"))
        .agg(
            F.min(
                F.struct(F.col(right_id).cast("long").alias("_rid"),
                         *[F.col(c) for c in carry_in])
            ).alias("_rrow")
        )
    )
    carry_t = ", ".join(
        ["`_rid`:bigint"]
        + [f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in carry_in]
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(f"struct<{carry_t}>").alias("_rrow"),
        *[F.col(c) for c in lcols],
    )
    r = rr.select(
        "_k",
        "_ts",
        F.lit(0).alias("_tag"),
        "_rrow",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    order = [F.col("_ts"), F.col("_tag")]  # rights before lefts at equal ts
    w_prev = (
        Window.partitionBy("_k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("_k").orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    u = l.unionByName(r)
    picked = (
        u.withColumn("_prev", F.last("_rrow", ignorenulls=True).over(w_prev))
        .withColumn("_next", F.first("_rrow", ignorenulls=True).over(w_next))
        .filter(F.col("_tag") == 1)
        .withColumn(
            "_dprev",
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_prev").getField(right_ts)),
        )
        .withColumn(
            "_dnext",
            F.unix_micros(F.col("_next").getField(right_ts)) - F.unix_micros(F.col("_ts")),
        )
        .withColumn(
            "_pick",
            F.when(F.col("_prev").isNull(), F.col("_next"))
            .when(F.col("_next").isNull(), F.col("_prev"))
            .when(F.col("_dprev") <= F.col("_dnext"), F.col("_prev"))
            .otherwise(F.col("_next")),
        )
    )
    out = picked.select(
        *lcols,
        *[F.col("_pick").getField(c).alias(f"nearest_{c}") for c in carry],
        F.when(F.col("_pick").isNull(), F.lit(None).cast("bigint"))
        .otherwise(
            F.abs(
                F.unix_micros(F.col("_pick").getField(right_ts))
                - F.unix_micros(F.col("_ts"))
            )
        )
        .alias("dist_us"),
    )
    if how == "inner":
        out = out.filter(F.col(f"nearest_{carry[0]}").isNotNull())
    return out
