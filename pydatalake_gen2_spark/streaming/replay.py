"""File-source replay of `events` + the streaming operator suite
(ST01-ST07). Correctness strategy per SURVEY.md §2B.9: each streaming op
has a batch-equivalent form (hash-matched against DuckDB in
queries/streaming_batch.py); the streaming run here must equal its own
batch form (asserted Spark-vs-Spark in tests), which transitively equals
the oracle. Watermark late-data behavior is property-tested (ST04).

The replay splits `events` into time-ordered parquet chunks and drives a
file-source stream with maxFilesPerTrigger=1 — micro-batches arrive in
event-time order, as a well-behaved source would at scale.
"""

from __future__ import annotations

import contextlib
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pydatalake_gen2_spark.tables import load_table

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)

_replay_cache: dict[str, str] = {}


def replay_dir(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> str:
    """Materialize events as n_chunks time-ordered single-file parquets."""
    if sf_dir in _replay_cache:
        return _replay_cache[sf_dir]
    out = tempfile.mkdtemp(prefix="events_replay_")
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    chunk = (n + n_chunks - 1) // n_chunks
    ranked = ev.withColumn(
        "_chunk",
        F.floor((F.row_number().over(Window.orderBy("ts", "event_id")) - 1) / chunk),
    )
    for i in range(n_chunks):
        (
            ranked.filter(F.col("_chunk") == i)
            .drop("_chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"chunk={i:03d}"))
        )
    # Flatten: file source watches one dir of plain parquet files.
    # FileStreamSource orders files by MODIFICATION TIME (ms), not name —
    # writes that land within the same millisecond tie and replay in
    # directory-listing order, scrambling the chunk sequence (observed
    # live: chunk 1 processed after chunk 3 and dropped wholesale as
    # late data in ST04). Stamp strictly increasing mtimes, 2s apart,
    # so the replay order is the chunk order at every scale.
    flat = tempfile.mkdtemp(prefix="events_stream_")
    idx = 0
    t0 = time.time() - 3600.0
    for i in range(n_chunks):
        d = os.path.join(out, f"chunk={i:03d}")
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = os.path.join(flat, f"{idx:03d}.parquet")
                os.rename(os.path.join(d, f), dst)
                os.utime(dst, (t0 + 2.0 * idx, t0 + 2.0 * idx))
                idx += 1
    _replay_cache[sf_dir] = flat
    return flat


def read_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: streaming file source over the replay dir (1 file/trigger)."""
    path = replay_dir(spark, sf_dir)
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


@contextlib.contextmanager
def stream_shuffle_partitions(spark: SparkSession, n: int = 4):
    """Streaming stateful ops use the static shuffle-partition count for
    their state stores (no AQE) — every micro-batch pays one state-store
    task per partition. For the finite local replays a handful of state
    partitions is right; on a cluster this would be sized to executors.
    Restores the session conf afterwards."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _run_to_memory(agg: DataFrame, name: str, mode: str) -> None:
    with stream_shuffle_partitions(agg.sparkSession):
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def tumbling_agg(src: DataFrame) -> DataFrame:
    """ST01 shape: 10-minute tumbling window per event_type."""
    return (
        src.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST01 streaming run: watermarked tumbling agg, complete mode."""
    src = read_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    _run_to_memory(tumbling_agg(src), "st01_out", "complete")
    return spark.table("st01_out")


def sliding_agg(src: DataFrame) -> DataFrame:
    """ST02 shape: 10-minute window sliding every 5 minutes (each event
    lands in two overlapping windows)."""
    return (
        src.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "n",
        )
    )


def run_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST02 streaming run: watermarked sliding-window agg, complete mode."""
    src = read_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    _run_to_memory(sliding_agg(src), "st02_out", "complete")
    return spark.table("st02_out")


def session_agg(src: DataFrame) -> DataFrame:
    """ST03 shape: 5-minute-gap session windows per user."""
    return (
        src.groupBy(F.session_window("ts", "5 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("s_start"),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss").alias("s_end"),
            "n",
        )
    )


def run_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST03 streaming run (session windows require watermark + append)."""
    src = read_stream(spark, sf_dir).withWatermark("ts", "30 days")
    _run_to_memory(session_agg(src), "st03_out", "complete")
    return spark.table("st03_out")


def dynamic_session_agg(src: DataFrame) -> DataFrame:
    """ST21 shape: dynamic-gap session windows per user — 'view' events
    hold the session open 10 minutes, everything else 5 (the gap is a
    per-EVENT expression evaluated row-locally before the merge)."""
    # gap strings (not INTERVAL literals): session_window wants
    # CalendarIntervalType and parses duration strings to it, while typed
    # INTERVAL literals are DayTimeIntervalType and are rejected
    gap = F.when(F.col("event_type") == "view", F.lit("10 minutes")).otherwise(
        F.lit("5 minutes")
    )
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("s_start"),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss").alias("s_end"),
            "n",
        )
    )


def run_dynamic_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST21 streaming run: the same dynamic-gap sessionization as the
    batch form, over the file-source replay (state merges open sessions
    across micro-batches exactly as the batch GROUP BY merges rows)."""
    src = read_stream(spark, sf_dir).withWatermark("ts", "30 days")
    _run_to_memory(dynamic_session_agg(src), "st21_out", "complete")
    return spark.table("st21_out")


def run_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST05: streaming dropDuplicates on event_id with watermark state."""
    src = read_stream(spark, sf_dir).withWatermark("ts", "30 days")
    dedup = src.dropDuplicates(["event_id"]).select(
        "event_id", "user_id", "event_type", "value"
    )
    _run_to_memory(dedup, "st05_out", "append")
    return spark.table("st05_out")


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST06: stream-stream interval join (clicks ⋈ purchases per user,
    purchase within 10 min after click), both sides watermarked."""
    src = read_stream(spark, sf_dir)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        read_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("click_id", "purchase_id", "c_user")
    _run_to_memory(joined, "st06_out", "append")
    return spark.table("st06_out")


def run_stream_stream_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST26: stream-stream LEFT SEMI join — clicks confirmed by a purchase
    within 10 min after them, emitted once per click (never duplicated by
    multiple matching purchases — the semantics that make semi the right
    funnel primitive). Both sides watermarked: the click side's state is
    evicted once the purchase watermark passes click_ts + 10 min."""
    clicks = (
        read_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        read_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left_semi",
    ).select("click_id", "c_user")
    _run_to_memory(joined, "st26_out", "append")
    return spark.table("st26_out")


def run_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST07: foreachBatch → parquet append sink; returns the read-back."""
    out = tempfile.mkdtemp(prefix="st07_sink_")
    src = read_stream(spark, sf_dir)
    counts = src.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    q = counts.writeStream.foreachBatch(write_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(out)


def run_late_data_experiment(
    spark: SparkSession, sf_dir: str, watermark: str = "10 minutes"
) -> tuple[int, int]:
    """ST04 property harness: replay events in ts order, then append a
    final chunk of artificially LATE rows (ts shifted far behind the
    watermark). Returns (n_windows_with_late_counted, n_windows_batch):
    with a strict watermark the late rows must NOT create/extend closed
    windows in append mode."""
    import shutil

    base = replay_dir(spark, sf_dir)
    lab = tempfile.mkdtemp(prefix="st04_late_")
    files = sorted(f for f in os.listdir(base) if f.endswith(".parquet"))
    t0 = time.time() - 3600.0
    for k, f in enumerate(files):
        dst = os.path.join(lab, f)
        shutil.copy(os.path.join(base, f), dst)
        # explicit strictly-increasing mtimes: FileStreamSource replays in
        # MTIME order, and sub-ms copies tie (see replay_dir)
        os.utime(dst, (t0 + 2.0 * k, t0 + 2.0 * k))
    # Late chunks: clone the FIRST chunk's rows (oldest ts) as TWO new
    # last files. Two, not one, so the final eviction boundary is
    # lag-proof: the event-time stats of the last data-bearing batch can
    # reach eviction one batch late, and a trailing no-data flush batch
    # races Trigger.AvailableNow termination — with two stat-free
    # trailing batches every propagation theory evicts the last pass at
    # watermark = global max ts − delay, so the streamed count is
    # deterministic and exactly oracle-able.
    first = spark.read.schema(EVENTS_SCHEMA).parquet(os.path.join(lab, files[0]))
    for i in (1, 2):
        first.withColumn(
            "event_id", F.col("event_id") + 10_000_000 * i
        ).coalesce(1).write.mode("overwrite").parquet(lab + "_late")
        late_files = [f for f in os.listdir(lab + "_late") if f.endswith(".parquet")]
        dst = os.path.join(lab, f"zzz_late{i}.parquet")
        os.rename(os.path.join(lab + "_late", late_files[0]), dst)
        os.utime(dst, (t0 + 1000.0 + 2.0 * i, t0 + 1000.0 + 2.0 * i))

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(lab)
        .withWatermark("ts", watermark)
    )
    agg = src.groupBy(F.window("ts", "10 minutes")).agg(F.count(F.lit(1)).alias("n"))
    _run_to_memory(agg, "st04_out", "append")
    streamed = spark.table("st04_out").agg(F.sum("n")).first()[0] or 0
    batch_total = spark.read.schema(EVENTS_SCHEMA).parquet(lab).count()
    return int(streamed), int(batch_total)


def run_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST09: stream-static enrichment join — the streaming side joins a
    static dim table batch-side per micro-batch (no state, no watermark
    needed for inner joins; the dim is re-resolved each trigger, so a
    slowly-changing dim picks up updates). Aggregates enriched events per
    market segment in complete mode."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    src = read_stream(spark, sf_dir)
    enriched = src.join(cust, on="user_id").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )
    _run_to_memory(enriched, "st09_out", "complete")
    return spark.table("st09_out")


def pipeline_agg(src: DataFrame) -> DataFrame:
    """ST10 shape: gate → windowed count/sum by event_type (applied after
    the stateful dedup in the stream form)."""
    return (
        src.filter(F.col("value") >= 1.0)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_pipeline_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST10 streaming run: the composed micro-batch pipeline — filter
    gate, watermarked dropDuplicates-with-state on event_id, tumbling
    aggregation — one continuous query, complete mode. The batch
    equivalence (st10_pipeline_batch) is asserted in
    tests/test_streaming.py, certifying the COMPOSITION under
    micro-batch replay exactly as l26 does for the batch pipeline."""
    src = (
        read_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .dropDuplicates(["event_id"])
    )
    _run_to_memory(pipeline_agg(src), "st10_out", "complete")
    return spark.table("st10_out")


_session_replay_cache: dict[str, str] = {}


def session_replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """Replay dir for the custom-session operator (stateful.sessionize):
    the ordinary time-ordered chunks plus TWO trailing single-row
    '_flush' sentinel files (max_ts + 2h, + 4h). The sentinels carry no
    session data (the operator filters them) — they exist to advance the
    event-time watermark after the real data, so EventTimeTimeout fires
    for the corpus-tail sessions deterministically: sentinel 1 moves the
    watermark past every real session's (last_ts + gap); the batch
    processing sentinel 2 evaluates timeouts against that watermark and
    closes them. This mirrors production, where the stream simply keeps
    flowing and the watermark sweeps sessions closed."""
    if sf_dir in _session_replay_cache:
        return _session_replay_cache[sf_dir]
    import shutil

    base = replay_dir(spark, sf_dir)
    flat = tempfile.mkdtemp(prefix="events_sess_stream_")
    t0 = 1_000_000_000
    idx = 0
    for f in sorted(os.listdir(base)):
        if f.endswith(".parquet"):
            dst = os.path.join(flat, f"{idx:03d}.parquet")
            shutil.copyfile(os.path.join(base, f), dst)
            os.utime(dst, (t0 + idx, t0 + idx))
            idx += 1
    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    for k, hours in enumerate((2, 4)):
        sent = spark.createDataFrame(
            [(-1 - k, max_ts + __import__("datetime").timedelta(hours=hours),
              -1, "_flush", 0.0, None)],
            schema=EVENTS_SCHEMA,
        )
        d = tempfile.mkdtemp(prefix="sentinel_")
        sent.coalesce(1).write.mode("overwrite").parquet(d)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = os.path.join(flat, f"zz{k}_{idx:03d}.parquet")
                os.rename(os.path.join(d, f), dst)
                os.utime(dst, (t0 + idx, t0 + idx))
                idx += 1
    _session_replay_cache[sf_dir] = flat
    return flat


_snapshot_ingest_cache: dict[str, str] = {}


def run_snapshot_ingest(spark: SparkSession, sf_dir: str) -> "object":
    """Streaming lakehouse ingestion: the events replay streams into a
    snapshot-versioned table (sources/versioned.py) — each micro-batch
    commits the cumulative per-user aggregate (complete mode) as a NEW
    immutable snapshot via foreachBatch. Readers running against any
    already-published version are never torn by in-flight commits, and
    the version history is a queryable record of mid-stream states
    (asserted monotone in tests/test_streaming.py). Returns the
    VersionedTable."""
    from pydatalake_gen2_spark.sources.versioned import VersionedTable

    root = _snapshot_ingest_cache.get(sf_dir)
    if root is not None:
        return VersionedTable(spark, root)
    root = tempfile.mkdtemp(prefix="vt_stream_")
    vt = VersionedTable(spark, root)
    src = read_stream(spark, sf_dir)
    agg = src.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    with stream_shuffle_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(lambda df, _bid: vt.commit(df))
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="vt_stream_ckpt_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _snapshot_ingest_cache[sf_dir] = root
    return vt


def run_outer_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST13: stream-stream LEFT OUTER interval join — every click emits,
    enriched with a purchase that followed within 10 minutes, or with
    NULLs once the watermark proves no such purchase can still arrive.
    The null-emission decision is the stateful part (inner ST06 never
    decides "give up waiting"): Spark holds each unmatched left row
    until the global watermark passes c_ts + 10 min, then emits it with
    nulls in append mode. The sentinel-tailed replay (session_replay_dir)
    advances the watermark past the corpus tail; the engine's trailing
    no-data micro-batches then run the final state evictions, so the
    stream result equals the batch LEFT JOIN exactly — asserted in
    tests/test_streaming.py, nulls included.

    PUSHDOWN TRAP (cost a debugging session; do not reintroduce): the
    '_flush' sentinels must ride BOTH branches to advance BOTH watermark
    nodes, and any post-join filter on left-side columns (e.g.
    c_type == 'click') is legal to push below a LEFT OUTER join — and
    Catalyst pushes it below the left WATERMARK node too, silently
    deleting the sentinels from the click timeline and pinning the
    global (min-policy) watermark at max-click-ts - delay forever, so
    the tail clicks' null rows are withheld. Sentinel rows are instead
    filtered AFTER the sink (user_id is -1), where no pushdown exists.

    Scale: join state is bounded by (watermark delay + join window) x
    per-key arrival rate — eviction is continuous; a day of 100 TB
    stream holds minutes of state per executor.
    """
    flat = session_replay_dir(spark, sf_dir)
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    clicks = (
        src.filter(F.col("event_type").isin("click", "_flush"))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        src.filter(F.col("event_type").isin("purchase", "_flush"))
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    ).select("click_id", "purchase_id", "c_user")
    _run_to_memory(joined, "st13_out", "append")
    # sentinel left rows (user -1) emit as unmatched; drop them here —
    # NOT pre-sink, where the filter would be pushed under the watermark.
    return spark.table("st13_out").filter(F.col("c_user") >= 0)


_recovery_cache: dict[str, str] = {}


def run_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST15: exactly-once across a mid-stream CRASH. The replayed event
    stream is written through foreachBatch into batch-id-keyed parquet
    directories; a poisoned first attempt writes micro-batch 2 and then
    dies BEFORE the checkpoint commits its offsets (the worst-case
    crash window — data out, progress not recorded). A second
    writeStream on the SAME checkpoint resumes, REPROCESSES batch 2
    (foreachBatch is at-least-once by contract), and the idempotent
    overwrite-by-batch-id makes the sink exactly-once anyway: the final
    sink must equal the full events table, no loss, no duplicates.

    This is the committer discipline every production foreachBatch sink
    needs (idempotent writes keyed on batchId, or a transactional
    target); the checkpoint supplies deterministic batch boundaries and
    replay, the SINK supplies idempotence — exactly-once is their
    composition, demonstrated here against a real failure, not claimed.
    """
    if sf_dir in _recovery_cache:
        return spark.read.parquet(_recovery_cache[sf_dir])
    from pyspark.errors import StreamingQueryException

    path = replay_dir(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="st15_sink_")
    ckpt = tempfile.mkdtemp(prefix="st15_ckpt_")

    def make_writer(poison: bool):
        def write_batch(df: DataFrame, bid: int) -> None:
            df.select("event_id", "event_type", "user_id").write.mode(
                "overwrite"
            ).parquet(os.path.join(out, f"batch={bid}"))
            if poison and bid == 2:
                raise RuntimeError("injected crash: batch 2 written, offsets not committed")

        return write_batch

    def start(poison: bool):
        src = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        return (
            src.writeStream.foreachBatch(make_writer(poison))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start(poison=True)
    crashed = False
    try:
        q1.awaitTermination()
    except StreamingQueryException:
        crashed = True
    if not crashed:
        raise AssertionError("injected crash did not fire — recovery untested")
    q2 = start(poison=False)
    q2.awaitTermination()
    _recovery_cache[sf_dir] = out
    return spark.read.parquet(out)


_dup_replay_cache: dict[str, str] = {}


def run_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST16: dropDuplicatesWithinWatermark (Spark 3.5+) over a replay with
    INJECTED duplicates — every event whose id is divisible by 10 arrives
    a second time in a later micro-batch. Unlike ST05's dropDuplicates
    (state grows forever unless the watermark passes the id's event
    time), WithinWatermark keeps an id's state only until the watermark
    moves past its event time + delay: the production contract for
    at-least-once sources (Kafka redeliveries, S3 double-drops) where
    duplicates cluster close in time and state must stay BOUNDED by the
    delay window, not by distinct-key cardinality. Duplicates here share
    the original's event time (a true redelivery), so they land inside
    the window and the sink must equal the duplicate-free table."""
    if sf_dir in _dup_replay_cache:
        out, delay_days = _dup_replay_cache[sf_dir]
    else:
        import shutil

        base = replay_dir(spark, sf_dir)
        out = tempfile.mkdtemp(prefix="events_dup_replay_")
        for f in sorted(os.listdir(base)):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(base, f), os.path.join(out, f"a_{f}"))
        dups = load_table(spark, sf_dir, "events").filter(
            (F.col("event_id") % 10) == 0
        )
        dup_dir = tempfile.mkdtemp(prefix="events_dups_")
        dups.coalesce(1).write.mode("overwrite").parquet(dup_dir)
        idx = 0
        for f in sorted(os.listdir(dup_dir)):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(dup_dir, f), os.path.join(out, f"z_dup{idx}.parquet"))
                idx += 1
        # The hash-match needs every injected duplicate to arrive while
        # its original's state is still live, i.e. delay > the fixture's
        # event span — derive it from the data (a wider fixture would
        # silently outgrow a constant) and cache it with the replay dir
        # so re-runs don't pay the span scan again. In production the
        # delay is the REDELIVERY horizon, far smaller than the stream's
        # lifetime; the replay compresses a whole table into one run.
        span = load_table(spark, sf_dir, "events").agg(
            F.max("ts").alias("hi"), F.min("ts").alias("lo")
        ).first()
        if span["hi"] is None:
            raise ValueError("events table is empty — nothing to replay")
        delay_days = (span["hi"] - span["lo"]).days + 2
        _dup_replay_cache[sf_dir] = (out, delay_days)
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
        .withWatermark("ts", f"{delay_days} days")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "value")
    )
    _run_to_memory(src, "st16_out", "append")
    return spark.table("st16_out")


def run_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST17: a custom PYTHON streaming source (Spark 4
    SimpleDataSourceStreamReader, sources/pyds._ReplayStreamReader)
    feeding a real micro-batch query — offsets are dicts the source
    defines, the engine checkpoints them, and readBetweenOffsets makes
    committed ranges replayable (the recovery contract). The run drains
    the bounded replay, then stops; the sink must hold every event
    exactly once."""
    from pydatalake_gen2_spark.sources.pyds import ensure_stream_source_registered

    if spark.catalog.tableExists("st17_out"):
        return spark.table("st17_out")
    ensure_stream_source_registered(spark)
    path = replay_dir(spark, sf_dir)
    expected = load_table(spark, sf_dir, "events").count()
    src = (
        spark.readStream.format("events_replay_stream")
        .option("path", path)
        .load()
    )
    q = (
        src.writeStream.outputMode("append")
        .format("memory")
        .queryName("st17_out")
        .start()
    )
    deadline = time.time() + 180
    while time.time() < deadline:
        if spark.table("st17_out").count() >= expected:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    n = spark.table("st17_out").count()
    if n < expected:
        # drop the partial memory sink BEFORE raising: the tableExists
        # shortcut above must never serve an incomplete table to a retry
        spark.catalog.dropTempView("st17_out")
        raise AssertionError(f"python stream source drained {n}/{expected} rows")
    return spark.table("st17_out")


def run_union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST18: MULTI-SOURCE ingestion — two independent streaming readers
    over disjoint halves of the replay (odd / even event ids, each its
    own file source with its own offsets) unioned into ONE continuous
    query feeding a single aggregation. This is the multi-topic shape
    (clicks topic + purchases topic → one sessionizer): each leg tracks
    its own progress in the shared checkpoint, and the engine advances
    the query's watermark as the MIN of the legs' watermarks, so one
    slow source correctly holds back event-time results instead of
    dropping the other leg's late data."""
    base = read_stream(spark, sf_dir)
    odd = base.filter(F.col("event_id") % 2 == 1)
    even = read_stream(spark, sf_dir).filter(F.col("event_id") % 2 == 0)
    both = odd.unionByName(even).withWatermark("ts", "10 minutes")
    counts = (
        both.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )
    _run_to_memory(counts, "st18_out", "complete")
    return spark.table("st18_out")


def run_streaming_upsert(spark: SparkSession, sf_dir: str):
    """ST19: streaming MERGE — each micro-batch is compacted to its
    latest row per user (W11's rule: max (ts, event_id)) and UPSERTED
    into a snapshot-versioned dimension via merge_upsert + commit: the
    Delta-style `foreachBatch { merge into }` pattern, composed entirely
    from this engine's own parts (S16 versioned table + J25 merge +
    W11 compaction). Batches arrive in event-time order (the replay is
    time-sorted), so last-batch-wins per key == global latest per key —
    which is exactly the batch oracle. Returns the VersionedTable."""
    from pyspark.sql.window import Window as W

    from pydatalake_gen2_spark.operators.merge import merge_upsert
    from pydatalake_gen2_spark.sources.versioned import VersionedTable

    root = tempfile.mkdtemp(prefix="st19_upsert_")
    vt = VersionedTable(spark, root)

    def apply_batch(batch: DataFrame, bid: int) -> None:
        w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_type"),
                F.col("value").alias("last_value"),
            )
        )
        if vt.versions():
            current = vt.read()
            # partial_updates=False: this is whole-ROW replacement — the
            # batch's latest record wins verbatim, NULL cells included
            # (a NULL value on the newest event is data, not absence;
            # COALESCE semantics would resurrect the superseded value).
            merged = merge_upsert(
                current, latest, ["user_id"], partial_updates=False
            ).drop("action")
        else:
            merged = latest
        vt.commit(merged)

    src = read_stream(spark, sf_dir)
    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="st19_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return vt


def run_full_outer_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST22: stream-stream FULL OUTER interval join — ST13's completion:
    unmatched CLICKS emit null purchases (left-outer semantics) AND
    unmatched PURCHASES emit null clicks (the right side's watermark
    eviction makes that give-up decision too). Both sides hold state
    until the global watermark passes their join window; the sentinel-
    tailed replay advances it past the corpus tail so trailing no-data
    batches flush BOTH eviction queues. All of ST13's pushdown-trap
    rules apply doubly: sentinels ride both branches, and sentinel rows
    are dropped only AFTER the sink — a full-outer join additionally
    emits the sentinels themselves as unmatched rows on each side, so
    the post-sink filter keys on coalesce(c_user, p_user) >= 0 (either
    side may be NULL now)."""
    flat = session_replay_dir(spark, sf_dir)
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    clicks = (
        src.filter(F.col("event_type").isin("click", "_flush"))
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        src.filter(F.col("event_type").isin("purchase", "_flush"))
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        "full_outer",
    ).select("click_id", "purchase_id", "c_user", "p_user")
    _run_to_memory(joined, "st22_out", "append")
    return spark.table("st22_out").filter(
        F.coalesce(F.col("c_user"), F.col("p_user")) >= 0
    )


def run_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST23: Trigger.AvailableNow — the incremental-batch execution mode:
    process EVERYTHING available at start (in rate-limited micro-batches,
    maxFilesPerTrigger still honored), then stop. The canonical nightly
    'catch up on the backlog, then exit' pattern: same checkpointed
    offsets as a continuous query, so alternating availableNow runs and
    continuous runs share one position in the stream. The drained
    complete-mode result must equal the whole-table batch aggregate —
    hash-matched directly (st08 discipline: the final state IS the batch
    answer)."""
    flat = replay_dir(spark, sf_dir)
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    agg = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("st23_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("st23_out")


def run_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST24: the STATE STORE as a table — run a checkpointed streaming
    aggregation to completion (availableNow), then open its checkpoint
    with the Spark 4 state data source (format 'statestore') and read
    the operator's keyed state directly: the debugging/ops capability
    behind 'what does my stream currently believe' (state audits,
    corrupt-key surgery, offline state migrations). The state rows ARE
    the answer — per-key counts that must equal the batch GROUP BY."""
    import tempfile

    flat = replay_dir(spark, sf_dir)
    ckpt = tempfile.mkdtemp(prefix="st24_ckpt_")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    agg = src.groupBy("event_type").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("st24_out")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").cast("bigint").alias("n"),
    )


def run_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST25/S34: the NATIVE streaming file sink — append-mode parquet with
    the sink's _spark_metadata transaction log (vs ST07's foreachBatch,
    where idempotence is hand-rolled): the log records exactly which
    files each batch committed, readers consult it and ignore orphans,
    so the sink is exactly-once BY CONSTRUCTION. Drained with
    availableNow; the read-back must equal the source table."""
    import tempfile

    flat = replay_dir(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="st25_sink_")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    proj = src.select("event_id", "event_type", "user_id")
    q = (
        proj.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="st25_ckpt_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema("event_id BIGINT, event_type STRING, user_id BIGINT").parquet(
        out_dir
    )


# ---------------------------------------------------------------------------
# ST28 — change-data-feed STREAMING SOURCE over a versioned table
# ---------------------------------------------------------------------------

_cdf_table_cache: dict[str, str] = {}


def run_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST28: a VersionedTable consumed AS A STREAM — the read direction
    ST12 is the write direction of (Delta `readChangeFeed` shape). Four
    commits partition the events table by event_id % 4 (one full commit
    + three appends); the `versioned_changes` Python streaming source
    (sources/pyds.py) replays each commit's manifest-diff delta as one
    micro-batch in commit order, tagging rows with `_commit_version`.
    The drained sink must hold every event exactly once with
    _commit_version = event_id % 4 + 1 — proving offsets advance one
    commit at a time and deltas are resolved O(delta) from manifests,
    never O(table)."""
    import re

    from pydatalake_gen2_spark.sources.pyds import (
        ensure_changes_stream_registered,
    )
    from pydatalake_gen2_spark.sources.versioned import VersionedTable

    # sink name carries the scale: the table-root cache is sf_dir-keyed,
    # so a fixed name would serve scale A's drained feed to scale B in a
    # multi-scale session
    sink = "st28_out_" + re.sub(r"[^A-Za-z0-9]", "_", sf_dir).strip("_")
    if spark.catalog.tableExists(sink):
        return spark.table(sink)
    ensure_changes_stream_registered(spark)
    root = _cdf_table_cache.get(sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    if root is None:
        root = tempfile.mkdtemp(prefix="vt_cdf_")
        vt = VersionedTable(spark, root)
        vt.commit(ev.filter(F.col("event_id") % 4 == 0))
        for r in (1, 2, 3):
            vt.append_commit(ev.filter(F.col("event_id") % 4 == r))
        _cdf_table_cache[sf_dir] = root
    expected = ev.count()
    src = (
        spark.readStream.format("versioned_changes")
        .option("path", root)
        .option(
            "dataSchema",
            "event_id long, user_id long, event_type string, value double",
        )
        .load()
    )
    q = (
        src.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .start()
    )
    deadline = time.time() + 180
    while time.time() < deadline:
        if not q.isActive:
            break  # failed/finished — surface q.exception via stop() below
        if spark.table(sink).count() >= expected:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    n = spark.table(sink).count()
    if n < expected:
        # never serve a partial sink to a retry via the tableExists
        # shortcut (the st17 discipline)
        spark.catalog.dropTempView(sink)
        raise AssertionError(f"cdf stream drained {n}/{expected} rows")
    return spark.table(sink)
