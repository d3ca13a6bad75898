"""SCD Type-2 merge/upsert — the MERGE INTO surface of a dimension
pipeline, re-expressed as Spark window + union plans (Kimball slowly-
changing-dimension type 2: every change closes the prior version and
appends a new one with a validity interval).

Reference parity note: the reference (client.py) is a byte-level lake
client with no MERGE surface; this module is part of the beyond-reference
training-pipeline layer the task brief asks for (dimension maintenance
for corpus metadata at 100 TB: per-source licensing states, crawl
versions, document provenance).

Scale shapes:
- ``scd2_history``: ONE shuffle on the business key (the window sort);
  everything else is row-local. Versions per key are bounded by that
  key's change count, so skew equals change-stream skew — AQE handles
  moderate cases, pre-bucketing the change stream by key handles extreme
  ones.
- ``scd2_merge``: the incremental path. The change batch is typically
  tiny next to the accumulated dimension, so the per-key batch summary
  (min change ts, version counts) is BROADCAST against the dimension;
  the dimension itself is never shuffled — only its current rows get
  their ``valid_to`` closed by the broadcast lookup, and the new
  versions arrive via union. At 100 TB dimension scale this is a scan +
  broadcast-join + union write, no exchange of the big side.

Invariant (property-tested): merge(history(earlier), later_batch) ≡
history(earlier ∪ later_batch) whenever every batch timestamp is ≥ every
existing timestamp for its key — the standard append-only CDC contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build the full SCD-2 history from a change stream: one row per
    change with ``valid_from`` = its timestamp, ``valid_to`` = the next
    change's timestamp for the same key (NULL while current),
    ``is_current`` and a 1-based ``version``.

    ``tiebreak_cols`` make the ordering total when timestamps can tie
    (e.g. an event id) — required for deterministic output.

    Output: key_cols + attr_cols + (valid_from, valid_to TIMESTAMP,
    is_current BOOLEAN, version BIGINT).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    lead_ts = F.lead(F.col(ts_col)).over(w)
    return changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        lead_ts.alias("valid_to"),
        lead_ts.isNull().alias("is_current"),
        F.row_number().over(w).cast("bigint").alias("version"),
    )


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE a change batch into an existing SCD-2 dimension (the
    incremental equivalent of rebuilding ``scd2_history`` over the full
    stream, under the append-only contract: every batch ts ≥ the key's
    current ``valid_from``).

    - current rows of keys present in the batch: ``valid_to`` closes at
      the key's FIRST batch timestamp, ``is_current`` drops.
    - batch rows: become new versions numbered after the key's existing
      max version, chained among themselves.
    - everything else passes through untouched.

    The per-key batch summary (first ts, key's first new attrs) and the
    dimension's per-key version offsets are the only things joined; both
    are change-batch-sized → broadcast. The dimension is scanned once.
    """
    new_hist = scd2_history(changes, key_cols, ts_col, attr_cols, tiebreak_cols)
    batch_first = changes.groupBy(*key_cols).agg(F.min(ts_col).alias("_first_ts"))
    offsets = dim.groupBy(*key_cols).agg(F.max("version").alias("_voff"))

    closed = (
        dim.join(F.broadcast(batch_first), key_cols, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("_first_ts").isNotNull(), F.col("_first_ts")
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current", F.col("is_current") & F.col("_first_ts").isNull()
        )
        .drop("_first_ts")
    )
    renumbered = (
        new_hist.join(F.broadcast(offsets), key_cols, "left")
        .withColumn(
            "version", (F.col("version") + F.coalesce(F.col("_voff"), F.lit(0))).cast("bigint")
        )
        .drop("_voff")
    )
    return closed.unionByName(renumbered)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    action_col: str = "action",
    validate_source_keys: bool = False,
    partial_updates: bool = True,
) -> DataFrame:
    """Generic MERGE INTO — WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED
    THEN INSERT (Type-1 overwrite; scd2_merge is the Type-2 sibling).

    Semantics: one output row per distinct key across both inputs.
    Matched keys take the SOURCE's value for every column the source
    carries; source-only keys insert; target-only keys carry through
    unchanged. Columns only the target knows always carry through.
    ``partial_updates`` picks the NULL-cell rule: True (default) reads a
    NULL source cell as "keep the target's value" (per-column COALESCE —
    sparse patch batches); False replaces matched rows with the source
    row VERBATIM, NULLs included (whole-row semantics — what a
    latest-record compaction needs, where NULL is data, not absence).
    ``action_col`` tags each row update/insert/carry for audit sinks.

    PRECONDITION: the source batch must be key-unique (ANSI MERGE raises
    on multiple matches; here a duplicate source key would fan the
    target row out through the join). Compact the batch first (W11
    latest-per-key is the canonical compactor), or pass
    ``validate_source_keys=True`` to pay one aggregation that raises on
    violation instead of producing duplicates.

    Scale shape: expressed as ONE full-outer join on the key. At 100 TB
    target scale the physical plan to want is the Delta/Iceberg MERGE
    rewrite — semi-join source→target partitions first, rewrite only
    touched partitions (see S20 dynamic partition overwrite), leaving
    untouched partitions unread — but the SEMANTICS are exactly this
    join, which is what the oracle certifies. The full-outer shuffles
    both sides on the key; with a small batch AQE turns the exchange
    into a near-local one, and the snapshot-versioned table (S16/ST12)
    makes the result a new committed version rather than an in-place
    mutation.
    """
    if validate_source_keys:
        # collision-proofed tally name: a key column literally named
        # "count" would make groupBy().count()'s output ambiguous
        nname = "_n"
        while nname in key_cols:
            nname += "_"
        dupes = (
            source.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias(nname))
            .filter(F.col(nname) > 1)
            .limit(1)
            .count()
        )
        if dupes:
            raise ValueError(
                "merge_upsert: source batch has duplicate keys — compact it "
                "first (e.g. W11 latest-per-key)"
            )
    # Presence FLAGS, not key-NULL checks, classify each row: a NULL key
    # component is legitimate data under eqNullSafe matching, so
    # "matched" must mean "a row from that side joined", independent of
    # key values or how many key columns there are. Flag names dodge any
    # real column of either input (a user column must pass through
    # untouched, never be clobbered by the marker).
    tflag, sflag = "_t_present", "_s_present"
    taken = set(target.columns) | set(source.columns)
    while tflag in taken:
        tflag += "_"
    while sflag in taken or sflag == tflag:
        sflag += "_"
    t = target.withColumn(tflag, F.lit(True)).alias("t")
    s = source.withColumn(sflag, F.lit(True)).alias("s")
    cond = None
    for k in key_cols:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else cond & c
    joined = t.join(s, cond, "full_outer")
    t_present = F.col(f"t.{tflag}").isNotNull()
    s_present = F.col(f"s.{sflag}").isNotNull()
    cols = []
    for name in target.columns:
        if name in key_cols:
            cols.append(
                F.when(t_present, F.col(f"t.{name}"))
                .otherwise(F.col(f"s.{name}"))
                .alias(name)
            )
        elif name in source.columns:
            if partial_updates:
                cols.append(
                    F.coalesce(F.col(f"s.{name}"), F.col(f"t.{name}")).alias(name)
                )
            else:
                cols.append(
                    F.when(s_present, F.col(f"s.{name}"))
                    .otherwise(F.col(f"t.{name}"))
                    .alias(name)
                )
        else:
            cols.append(F.col(f"t.{name}").alias(name))
    action = (
        F.when(~s_present, F.lit("carry"))
        .when(~t_present, F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias(action_col)
    )
    return joined.select(*cols, action)
