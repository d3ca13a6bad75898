"""Streaming operators, batch forms + streaming runs — SURVEY.md §2B.9.

H entries are the batch-equivalent forms (same SQL over static `events`)
hash-matched against DuckDB (`time_bucket` is epoch-aligned for 10-minute
buckets exactly like Spark's `window()`, both anchored at a midnight
origin). S entries execute the REAL Structured Streaming pipelines via
file-source replay; tests assert stream-result == batch-form equality.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydatalake_gen2_spark.registry import register, sql_pair
from pydatalake_gen2_spark.streaming import replay


def _twin(batch_name: str) -> str:
    """Round-7 S->H upgrade: the *_stream legs now carry their batch
    twin's DuckDB oracle, so the LIVE streaming run itself is
    hash-certified (the ST11/ST17/ST21 recipe generalized). This is
    sound because the file replay is lossless and strictly
    mtime-ordered (streaming/replay.py), so each stream's final append
    output must equal its batch form over the same events — an equality
    the stream==batch pytest suite has asserted since round 2 and the
    oracle now certifies cross-engine every round.

    ORDERING CONTRACT (r7 advice): the twin's oracle text is dereferenced
    at decoration/import time, so the batch pair MUST be registered
    earlier in this module than the ``_twin(...)`` call that names it.
    Moving or reordering a batch registration breaks that; fail with the
    contract spelled out instead of a bare KeyError."""
    from pydatalake_gen2_spark.registry import REGISTRY

    try:
        return REGISTRY[batch_name].duck_sql
    except KeyError:
        raise RuntimeError(
            f"_twin({batch_name!r}): batch twin not registered yet. "
            "_twin resolves the twin's duck_sql at import time, so the "
            "batch pair must be registered ABOVE the *_stream pair that "
            "references it in queries/streaming_batch.py — reordering or "
            "moving the batch registration violates that contract."
        ) from None

sql_pair(
    "st01_tumbling_batch",
    """
    SELECT date_format(window(ts, '10 minutes').start, 'yyyy-MM-dd HH:mm:ss') AS w_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY window(ts, '10 minutes'), event_type
    """,
    duck_sql="""
    SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY time_bucket(INTERVAL '10 minutes', ts), event_type
    """,
)

# Sliding = union of the two 5-minute-phase-shifted tumbling bucketings.
sql_pair(
    "st02_sliding_batch",
    """
    SELECT date_format(window(ts, '10 minutes', '5 minutes').start,
                       'yyyy-MM-dd HH:mm:ss') AS w_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY window(ts, '10 minutes', '5 minutes')
    """,
    duck_sql="""
    WITH shifted AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '10 minutes', ts - INTERVAL 5 MINUTE)
               + INTERVAL 5 MINUTE AS w_start
      FROM events)
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM shifted GROUP BY w_start
    """,
)

# Session windows: Spark session_window ↔ gaps-and-islands SQL
# (lag + cumulative new-session flags). end = last_ts + gap in both.
sql_pair(
    "st03_session_batch",
    """
    SELECT user_id,
           date_format(session_window(ts, '5 minutes').start,
                       'yyyy-MM-dd HH:mm:ss') AS s_start,
           date_format(session_window(ts, '5 minutes').end,
                       'yyyy-MM-dd HH:mm:ss') AS s_end,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY session_window(ts, '5 minutes'), user_id
    """,
    duck_sql="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
           strftime(MAX(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sess GROUP BY user_id, sid
    """,
)

sql_pair(
    "st05_dedup_batch",
    """
    SELECT event_id, user_id, event_type, value FROM (
      SELECT event_id, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    duck_sql="""
    SELECT event_id, user_id, event_type, value FROM (
      SELECT event_id, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)

sql_pair(
    "st06_interval_join_batch",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id AS c_user
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)


def _stream(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(spark, sf_dir)

    return run


@register("st01_tumbling_stream", duck_sql=_twin("st01_tumbling_batch"))
def st01_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real streaming run of the ST01 shape (watermark + complete mode);
    equality with st01_tumbling_batch asserted in tests."""
    return replay.run_tumbling_stream(spark, sf_dir)


@register("st02_sliding_stream", duck_sql=_twin("st02_sliding_batch"))
def st02_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real streaming sliding-window run (ST02); equality with
    st02_sliding_batch asserted in tests."""
    return replay.run_sliding_stream(spark, sf_dir)


@register("st03_session_stream", duck_sql=_twin("st03_session_batch"))
def st03_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real streaming session-window run (ST03)."""
    return replay.run_session_stream(spark, sf_dir)


@register("st05_dedup_stream", duck_sql=_twin("st05_dedup_batch"))
def st05_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real streaming dropDuplicates-with-state run (ST05)."""
    return replay.run_dedup_stream(spark, sf_dir)


@register("st06_join_stream", duck_sql=_twin("st06_interval_join_batch"))
def st06_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real stream-stream interval join (ST06)."""
    return replay.run_stream_stream_join(spark, sf_dir)


@register(
    "st07_foreachbatch_sink",
    duck_sql="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events WHERE event_type = 'error'
    """,
)
def st07_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch → parquet sink → read-back (ST07). Round-7 S->H: the
    sink pipeline is a stateless filter, so the read-back must equal the
    batch filter over the same events (replay is lossless) — the oracle
    states it directly; ts renders as a seconds string on both sides."""
    sunk = replay.run_foreachbatch_sink(spark, sf_dir)
    return sunk.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )


@register(
    "st08_stateful_counter",
    duck_sql="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    """,
    tier="H",
)
def st08_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    counter whose final state must equal the batch GROUP BY — a real
    hash-matched oracle for explicit streaming state."""
    from pydatalake_gen2_spark.streaming import stateful

    return stateful.run_stateful_counter(spark, sf_dir)


@register(
    "st04_late_data",
    duck_sql="""
    WITH m AS (SELECT max(ts) AS mx, CAST(count(*) AS BIGINT) AS n
               FROM events)
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM events, m
        WHERE CAST(floor(epoch_us(ts) / 600000000) AS BIGINT) * 600000000
              + 600000000 <= epoch_us(mx) - 600000000) AS streamed_rows,
      (SELECT n + 2 * CAST(ceil(n / 4.0) AS BIGINT) FROM m) AS batch_rows,
      TRUE AS late_dropped
    """,
)
def st04_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST04: watermark late-drop experiment — replays events as 4
    time-ordered chunk files (1 file/trigger) plus TWO artificially-late
    trailing files (clones of the OLDEST chunk); emits one row
    (streamed_rows, batch_rows, late_dropped). The outcome is fully
    deterministic, so the oracle states it exactly (S→H upgrade, G04
    precedent): the two stat-free trailing batches make the final
    eviction boundary lag-proof (see replay.run_late_data_experiment —
    with ONE late file the boundary raced a trailing no-data flush
    batch), so the last eviction pass always runs at watermark =
    global max ts − 10 min. streamed_rows = rows whose 10-min tumbling
    window end ≤ max(ts) − 10 min: the late clones' rows all fall in
    long-closed windows and are DROPPED by the watermark, and the tail
    windows past the final watermark are withheld (append-mode
    semantics, not loss); batch_rows = n + 2·ceil(n/4) counts the late
    clones the batch read sees. The hash certifies Spark's watermark
    eviction boundary to the row at every scale."""
    streamed, batch_total = replay.run_late_data_experiment(spark, sf_dir)
    return spark.createDataFrame(
        [(streamed, batch_total, streamed < batch_total)],
        "streamed_rows BIGINT, batch_rows BIGINT, late_dropped BOOLEAN",
    )


@register(
    "st09_stream_static_join",
    duck_sql="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def st09_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST09 batch form (the oracle-matched shape): events enriched with the
    customer dim, aggregated per segment. The streaming run of the same
    plan is st09_stream (stream-static joins re-resolve the dim each
    micro-batch — no stream state)."""
    ev = spark.table("events")
    cust = spark.table("customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return ev.join(cust, on="user_id").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


@register("st09_stream", duck_sql=_twin("st09_stream_static_join"))
def st09_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST09 real streaming run (equality with the batch form asserted in
    tests/test_streaming.py)."""
    return replay.run_stream_static_join(spark, sf_dir)


sql_pair(
    "st10_pipeline_batch",
    """
    WITH dedup AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
        FROM events) t WHERE rn = 1)
    SELECT date_format(window(ts, '10 minutes').start, 'yyyy-MM-dd HH:mm:ss') AS w_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM dedup WHERE value >= 1.0
    GROUP BY window(ts, '10 minutes'), event_type
    """,
    duck_sql="""
    WITH dedup AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
        FROM events) t WHERE rn = 1)
    SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM dedup WHERE value >= 1.0
    GROUP BY time_bucket(INTERVAL '10 minutes', ts), event_type
    """,
    doc="""Batch form of the composed streaming pipeline (gate → dedup →
    tumbling agg); the streaming run (st10_pipeline_stream) must produce
    exactly these rows under micro-batch replay.""",
)


@register("st10_pipeline_stream", duck_sql=_twin("st10_pipeline_batch"))
def st10_pipeline_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed continuous query: filter gate + stateful dedup +
    watermarked tumbling agg in ONE stream (ST10)."""
    return replay.run_pipeline_stream(spark, sf_dir)


@register(
    "st11_custom_sessions",
    duck_sql="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
           strftime(MAX(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS s_end,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sess GROUP BY user_id, sid
    """,
)
def st11_custom_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful sessionization (applyInPandasWithState +
    EventTimeTimeout, streaming/stateful.py:sessionize): a real streaming
    run over the chunked replay whose append-mode output — sessions
    closed by in-stream gaps or by watermark-driven state eviction —
    hash-matches DuckDB's batch gaps-and-islands sessions directly. The
    strongest streaming claim in the registry: not a batch stand-in, the
    actual incremental operator produces the oracle-exact result."""
    from pydatalake_gen2_spark.streaming.stateful import run_custom_sessions

    return run_custom_sessions(spark, sf_dir)


@register(
    "st12_snapshot_ingest",
    duck_sql="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def st12_snapshot_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → versioned lakehouse table: the replay commits one
    immutable snapshot per micro-batch (foreachBatch + VersionedTable's
    manifest-log publish); this query reads the LATEST snapshot, which
    must equal the batch GROUP BY over all events — while every
    mid-stream state stays time-travelable (monotonicity asserted in
    tests/test_streaming.py). Composes ST07's sink surface with S16's
    atomic-publish table format."""
    from pydatalake_gen2_spark.streaming.replay import run_snapshot_ingest

    vt = run_snapshot_ingest(spark, sf_dir)
    return (
        vt.read()
        .select("user_id", F.col("n").cast("bigint").alias("n"))
        .orderBy("user_id")
    )


sql_pair(
    "st13_outer_join_batch",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS c_user
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    ORDER BY click_id, purchase_id
    """,
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS c_user
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    ORDER BY click_id, purchase_id
    """,
    doc="ST13 batch form: every click LEFT-joined to purchases within "
        "the following 10 minutes (nulls where none) — the reference "
        "semantics the watermarked stream-stream OUTER join run "
        "(st13_outer_join_stream) must reproduce, including the "
        "null-emission rows the stream can only emit after the "
        "watermark closes each click's wait window.",
)


@register("st13_outer_join_stream", duck_sql=_twin("st13_outer_join_batch"))
def st13_outer_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real watermarked stream-stream LEFT OUTER join run (ST13);
    stream == batch asserted in tests/test_streaming.py."""
    return replay.run_outer_join_stream(spark, sf_dir)


@register(
    "st15_restart_recovery",
    duck_sql="""
    SELECT event_id, event_type, user_id
    FROM events ORDER BY event_id
    """,
)
def st15_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST15: exactly-once through a mid-stream crash — foreachBatch
    writes batch-id-keyed parquet, the first attempt dies AFTER writing
    batch 2 but BEFORE its offsets commit, a second query on the same
    checkpoint reprocesses batch 2, and the idempotent overwrite makes
    the sink exactly-once anyway. The hash-match against the plain
    events table proves no loss AND no duplicates survived a real
    injected failure (streaming/replay.run_restart_recovery)."""
    out = replay.run_restart_recovery(spark, sf_dir)
    return out.select("event_id", "event_type", "user_id").orderBy("event_id")


@register(
    "st16_dedup_within_watermark",
    duck_sql="""
    SELECT event_id, user_id, event_type, value
    FROM events ORDER BY event_id
    """,
)
def st16_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST16: dropDuplicatesWithinWatermark over a replay with injected
    redeliveries (every 10th event arrives twice) — bounded-state
    streaming dedup whose sink must hash-match the duplicate-free events
    table (streaming/replay.run_dedup_within_watermark)."""
    out = replay.run_dedup_within_watermark(spark, sf_dir)
    return out.select("event_id", "user_id", "event_type", "value").orderBy("event_id")


@register(
    "st17_python_stream_source",
    duck_sql="""
    SELECT event_id, user_id, event_type, value
    FROM events ORDER BY event_id
    """,
)
def st17_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST17: custom Python STREAMING data source — the replay served
    through a SimpleDataSourceStreamReader with dict offsets and
    replayable committed ranges, drained by a live micro-batch query
    into the memory sink; hash-matched against the events table
    (streaming/replay.run_python_stream_source)."""
    out = replay.run_python_stream_source(spark, sf_dir)
    return out.select("event_id", "user_id", "event_type", "value").orderBy("event_id")


@register(
    "st18_union_streams",
    duck_sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def st18_union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST18: two independent streaming sources (odd/even event-id halves,
    separate file readers with separate offsets) unioned into one
    continuous aggregation — the multi-topic ingestion shape; the merged
    sink must equal aggregating the whole table
    (streaming/replay.run_union_streams)."""
    out = replay.run_union_streams(spark, sf_dir)
    return out.select("event_type", "n", "sum_value").orderBy("event_type")


# keyed by (session, sf_dir): a VersionedTable is bound to the session that
# created it — serving one from a stopped/other session is a bug. The session
# key is a WEAK reference: a raw id() could be reused by a NEW session after
# the old one is garbage-collected, silently serving a table bound to a dead
# session. Entries die with their session instead.
_ST19_VT: "weakref.WeakKeyDictionary[SparkSession, dict[str, object]]" = (
    weakref.WeakKeyDictionary()
)


@register(
    "st19_streaming_upsert",
    duck_sql="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           value AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 ORDER BY user_id
    """,
)
def st19_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST19: the Delta-style streaming MERGE sink — per micro-batch
    latest-per-key compaction upserted into the snapshot-versioned
    dimension (streaming/replay.run_streaming_upsert); the FINAL version
    must equal the batch latest-per-key over the whole table. The
    version chain additionally records every intermediate dimension
    state, time-travelable via S16."""
    per_session = _ST19_VT.setdefault(spark, {})
    if sf_dir not in per_session:
        per_session[sf_dir] = replay.run_streaming_upsert(spark, sf_dir)
    vt = per_session[sf_dir]
    return vt.read().select(
        "user_id", "last_event_id", "last_type", "last_value"
    ).orderBy("user_id")


@register(
    "st20_transform_with_state",
    duck_sql="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def st20_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST20: transformWithStateInPandas (Spark 4's arbitrary-state
    successor to applyInPandasWithState) — per-user StatefulProcessor
    holding a typed ValueState counter (n, exact integer cents) plus a
    MapState distinct-event-type registry; the final cumulative emission
    per user must hash-match the batch GROUP BY (count + cents sum +
    count DISTINCT). The TWS protocol needs google.protobuf in the
    workers; where it's absent (this container — installs off-limits)
    the same semantics run on applyInPandasWithState, import-gated and
    documented in streaming/stateful.py:run_transform_with_state."""
    from pydatalake_gen2_spark.streaming import stateful

    return stateful.run_transform_with_state(spark, sf_dir)


@register(
    "st20b_rocksdb_state_store",
    duck_sql="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def st20b_rocksdb_state_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST20b (r8 verdict #5): the SAME per-user arbitrary-state semantics
    as ST20, executed under Spark 4's bundled RocksDB state-store
    provider (spark.sql.streaming.stateStore.providerClass ->
    RocksDBStateStoreProvider, rocksdbjni in the distribution) instead
    of the default HDFS-backed heap map. At 100 TB of keyed state the
    default provider IS the scale limit (state must fit in executor
    memory); RocksDB keeps keyed state on local disk with incremental
    checkpointing, so this pair hash-certifies that the provider swap is
    OUTPUT-INVARIANT — the streaming sibling of S21's codec matrix. The
    run fails loud if RocksDB did not actually engage (asserted via the
    rocksdb* custom metrics in the query progress; see
    streaming/stateful.py:run_transform_with_state)."""
    from pydatalake_gen2_spark.streaming import stateful

    return stateful.run_transform_with_state(spark, sf_dir, force_rocksdb=True)


sql_pair(
    "st21_dynamic_session_batch",
    """
    SELECT user_id,
           date_format(session_window(ts,
               CASE WHEN event_type = 'view' THEN '10 minutes'
                    ELSE '5 minutes' END).start,
               'yyyy-MM-dd HH:mm:ss') AS s_start,
           date_format(session_window(ts,
               CASE WHEN event_type = 'view' THEN '10 minutes'
                    ELSE '5 minutes' END).end,
               'yyyy-MM-dd HH:mm:ss') AS s_end,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY session_window(ts,
               CASE WHEN event_type = 'view' THEN '10 minutes'
                    ELSE '5 minutes' END), user_id
    """,
    duck_sql="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             ts + CASE WHEN event_type = 'view' THEN INTERVAL 10 MINUTE
                       ELSE INTERVAL 5 MINUTE END AS ev_end
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id, ev_end,
             CASE WHEN max(ev_end) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) IS NULL
                    OR ts >= max(ev_end) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id
                                               ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_sess
      FROM g),
    sess AS (
      -- (ts, event_id) ordering must match flagged's, or tied timestamps
      -- would make the running sum nondeterministic
      SELECT user_id, ts, ev_end,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
           strftime(MAX(ev_end), '%Y-%m-%d %H:%M:%S') AS s_end,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sess GROUP BY user_id, sid
    """,
    doc="ST21: session_window with a DYNAMIC per-event gap (Spark's gap "
        "expression: 'view' events hold sessions open 10 min, everything "
        "else 5) — the engagement-dependent sessionization shape a fixed "
        "gap can't express. An event merges into the session while it "
        "starts before the running max of prior (ts + own-gap) ends; the "
        "oracle replicates exactly that recurrence with a running-max "
        "frame. Same one-shuffle groupBy plan as ST03's fixed-gap form.",
)


@register("st21_dynamic_session_stream", duck_sql=_twin("st21_dynamic_session_batch"))
def st21_dynamic_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real streaming run of ST21's dynamic-gap session windows; equality
    with st21_dynamic_session_batch asserted in tests (the batch form is
    itself hash-matched vs the DuckDB merge-rule recurrence)."""
    return replay.run_dynamic_session_stream(spark, sf_dir)


_ST22_SQL = """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS c_user, p.user_id AS p_user
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    ORDER BY click_id NULLS FIRST, purchase_id NULLS FIRST
"""

sql_pair(
    "st22_full_outer_batch",
    _ST22_SQL,
    _ST22_SQL,
    doc="ST22 batch form: clicks FULL-OUTER-joined to purchases within "
        "the following 10 minutes — unmatched rows on BOTH sides emit "
        "with nulls. The reference semantics the watermarked full-outer "
        "stream-stream run (st22_full_outer_stream) must reproduce: the "
        "stream's extra obligation over ST13 is the right side's "
        "give-up-waiting decision (a purchase with no preceding click "
        "emits once the watermark proves no click can still arrive).",
)


@register("st22_full_outer_stream", duck_sql=_twin("st22_full_outer_batch"))
def st22_full_outer_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real watermarked stream-stream FULL OUTER join run (ST22);
    stream == batch asserted in tests/test_streaming.py."""
    return replay.run_full_outer_join_stream(spark, sf_dir)


@register(
    "st23_available_now",
    duck_sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def st23_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST23: Trigger.AvailableNow drain (streaming/replay.run_available_now)
    — a REAL streaming query that processes the full backlog in
    rate-limited micro-batches and terminates; its final complete-mode
    state hash-matches the batch aggregate over the whole table. The
    engine-native nightly-incremental pattern (vs ST15's crash-recovery
    and ST12's continuous ingest)."""
    out = replay.run_available_now(spark, sf_dir)
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"),
    ).orderBy("event_type")


@register(
    "st24_state_store_read",
    duck_sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def st24_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST24: streaming state read back AS A TABLE (Spark 4 'statestore'
    data source over the query's checkpoint) — the keyed state of a
    drained windowless aggregation must equal the batch GROUP BY,
    hash-certified. The ops half of the streaming surface: state
    audits and offline inspection without touching the running query
    (streaming/replay.run_state_store_read)."""
    out = replay.run_state_store_read(spark, sf_dir)
    return out.orderBy("event_type")


@register(
    "st25_native_file_sink",
    duck_sql="""
    SELECT event_id, event_type, user_id
    FROM events ORDER BY event_id
    """,
)
def st25_native_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST25: native streaming parquet sink with the _spark_metadata
    transaction log — exactly-once by construction (the log records each
    batch's committed files; readers ignore orphans), in contrast to
    ST07/ST15 where foreachBatch hand-rolls idempotence. The drained
    sink's read-back hash-matches the source table."""
    out = replay.run_file_sink(spark, sf_dir)
    return out.orderBy("event_id")


# ---------------------------------------------------------------------------
# st26: stream-stream LEFT SEMI join (clicks confirmed by a purchase)
# ---------------------------------------------------------------------------

@register(
    "st26_semi_join_batch",
    duck_sql="""
    SELECT c.event_id AS click_id, c.user_id AS c_user
    FROM events c
    WHERE c.event_type = 'click'
      AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND p.ts > c.ts
          AND p.ts <= c.ts + INTERVAL 10 MINUTE)
    ORDER BY click_id
    """,
)
def st26_semi_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST26 batch form (the oracle-matched shape): clicks with a purchase
    in the 10 minutes after them, via LEFT SEMI join — each click emits
    AT MOST ONCE however many purchases match (the dedup-free funnel
    primitive; an inner join would multiply clicks by purchases and need
    a distinct). The oracle states the textbook EXISTS. Streaming run:
    st26_semi_stream (watermarked stream-stream semi — click state
    evicts once the purchase watermark passes click_ts + 10 min, so
    state is bounded by the interval, not the stream). Scale: semi join
    state carries only the CLICK keys in the active window — strictly
    less state than ST06's inner interval join."""
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
            "left_semi",
        )
        .select("click_id", "c_user")
        .orderBy("click_id")
    )


@register("st26_semi_stream", duck_sql=_twin("st26_semi_join_batch"))
def st26_semi_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST26 real streaming run (equality with the batch form asserted in
    tests/test_streaming.py)."""
    return replay.run_stream_stream_semi(spark, sf_dir)


@register(
    "st27_anti_join_batch",
    duck_sql="""
    SELECT c.event_id AS click_id, c.user_id AS c_user
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND p.ts > c.ts
          AND p.ts <= c.ts + INTERVAL 10 MINUTE)
    ORDER BY click_id
    """,
)
def st27_anti_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST27 batch form: clicks with NO purchase in the 10 minutes after
    them — the abandonment/funnel-drop primitive that completes the
    stream-stream join family (inner ST06, outer ST13, full ST22, semi
    ST26, ANTI here). LEFT ANTI join in batch; the oracle states the
    textbook NOT EXISTS. Streaming run: st27_anti_stream."""
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
            "left_anti",
        )
        .select("click_id", "c_user")
        .orderBy("click_id")
    )


@register("st27_anti_stream", duck_sql=_twin("st27_anti_join_batch"))
def st27_anti_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST27 real streaming run. Structured Streaming has NO native
    stream-stream LEFT ANTI join (inner/outer/semi only), so the
    incremental form is the COMPOSITION the engine's own primitives
    provide: the watermark-closed LEFT OUTER interval join (ST13's run —
    a click emits with NULLs exactly when the watermark PROVES no
    matching purchase can still arrive) filtered to the never-matched
    rows. The filter runs on the sink read-back — NEVER pre-sink, where
    Catalyst would push a left-side predicate under the watermark node
    (the documented ST13 pushdown trap). State and eviction are ST13's:
    bounded by watermark delay + join window, and the NULL-emission
    decision IS the anti-join semantics, so stream == batch LEFT ANTI
    exactly; the oracle certifies it cross-engine."""
    out = replay.run_outer_join_stream(spark, sf_dir)
    return (
        out.filter(F.col("purchase_id").isNull())
        .select("click_id", "c_user")
        .orderBy("click_id")
    )


@register(
    "st28_cdf_stream",
    duck_sql="""
    SELECT CAST(event_id % 4 + 1 AS BIGINT) AS commit_version,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def st28_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST28: versioned table consumed AS A STREAMING SOURCE — the read
    direction of ST12's stream→table write (Delta `readChangeFeed`
    shape, r10 verdict Next #4b). Four commits slice events by
    event_id % 4; the `versioned_changes` Python streaming source
    (sources/pyds.py) serves one commit's manifest-diff delta per
    micro-batch in commit order, tagging `_commit_version`. The oracle
    certifies the drained feed: every event exactly once, attributed to
    exactly the commit that inserted it (commit_version = event_id%4+1),
    with per-commit aggregates matching the batch GROUP BY."""
    out = replay.run_cdf_stream(spark, sf_dir)
    return (
        out.groupBy("_commit_version", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("_commit_version").alias("commit_version"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("commit_version", "event_type")
    )
