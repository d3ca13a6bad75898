"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2B.9 extension; the task-brief's "custom stateful operators"
row).

``running_user_counter`` keeps one state cell per ``user_id`` — (event
count, value sum) — and emits the updated cumulative row for every user
seen in each micro-batch. State is keyed by the groupBy column, so at
100 TB it shards across executors with the shuffle and each cell is two
numbers, not the event history; eviction would be a watermark/timeout
policy (NoTimeout here because the replay is finite).

Correctness: the LAST emitted row per user (= max cumulative count, since
counts are monotone) must equal the batch ``GROUP BY user_id`` aggregate —
registered as an H-tier pair in queries/streaming_batch.py on the count
(exact); the float value-sum is asserted Spark-vs-Spark in tests.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pydatalake_gen2_spark.streaming import replay

OUT_SCHEMA = "user_id BIGINT, n BIGINT, sum_v DOUBLE"
STATE_SCHEMA = "n BIGINT, sum_v DOUBLE"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, sum_v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        sum_v += float(pdf["value"].sum())
    state.update((n, sum_v))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "sum_v": [sum_v]})


def running_user_counter(src: DataFrame) -> DataFrame:
    """Cumulative per-user (count, value-sum) with explicit state."""
    return src.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the stateful counter over the events replay; return the FINAL
    cumulative row per user (counts are monotone → max n is the last
    emission)."""
    src = replay.read_stream(spark, sf_dir)
    with replay.stream_shuffle_partitions(spark):
        q = (
            running_user_counter(src)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("st08_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table("st08_out")
        .groupBy("user_id")
        .agg(F.max("n").alias("n"))
        .select("user_id", "n")
    )


# -- custom event-time sessionization with state eviction (ST11) ----------

SESSION_GAP_US = 5 * 60 * 1_000_000
SESS_OUT_SCHEMA = "user_id BIGINT, s_start STRING, s_end STRING, n BIGINT"
SESS_STATE_SCHEMA = "start_us BIGINT, last_us BIGINT, n BIGINT"


def _fmt_us(us: int) -> str:
    import datetime

    return datetime.datetime.fromtimestamp(
        us // 1_000_000, datetime.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S")


def _ts_us(series: pd.Series) -> pd.Series:
    # normalize any datetime64 resolution to integer microseconds
    return pd.to_datetime(series).astype("datetime64[ns]").astype("int64") // 1000


def _session_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """One open session per user in state (start, last, n — three numbers,
    never the event history). Gaps within a batch close sessions inline;
    the tail session closes when the event-time watermark passes
    last + gap (EventTimeTimeout → hasTimedOut branch). '_flush'
    sentinel rows only advance the watermark and are ignored here."""
    out: list[dict] = []
    if state.hasTimedOut:
        s, last, n = state.get
        out.append(
            {"user_id": key[0], "s_start": _fmt_us(s),
             "s_end": _fmt_us(last + SESSION_GAP_US), "n": n}
        )
        state.remove()
    else:
        cur = list(state.get) if state.exists else None
        ts_parts = []
        for pdf in pdfs:
            pdf = pdf[pdf["event_type"] != "_flush"]
            if len(pdf):
                ts_parts.append(_ts_us(pdf["ts"]))
        if ts_parts:
            for t in pd.concat(ts_parts).sort_values():
                t = int(t)
                if cur is None:
                    cur = [t, t, 1]
                elif t - cur[1] > SESSION_GAP_US:
                    out.append(
                        {"user_id": key[0], "s_start": _fmt_us(cur[0]),
                         "s_end": _fmt_us(cur[1] + SESSION_GAP_US), "n": cur[2]}
                    )
                    cur = [t, t, 1]
                else:
                    cur[1] = t
                    cur[2] += 1
        if cur is not None:
            state.update((int(cur[0]), int(cur[1]), int(cur[2])))
            # close when the watermark passes last+gap; the max() guards
            # against a session already older than the watermark (Spark
            # rejects timeouts at-or-before it) — it then fires next batch
            state.setTimeoutTimestamp(
                max(
                    cur[1] // 1000 + SESSION_GAP_US // 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
    yield pd.DataFrame(out, columns=["user_id", "s_start", "s_end", "n"])


def sessionize(src: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Event-time sessions (5-min gap) as an EXPLICIT stateful operator —
    what session_window compiles to, hand-held: state is 3 numbers per
    open session, sharded by the groupBy shuffle, evicted by watermark
    timeout. The shape for session logic session_window can't express
    (per-session custom accumulators, early emission, side outputs)."""
    return (
        src.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESS_OUT_SCHEMA,
            stateStructType=SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_custom_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive sessionize over the sentinel-tailed replay; every session
    (including corpus-tail ones) is closed by gap or watermark timeout,
    so the append-mode output IS the complete session set."""
    src = (
        spark.readStream.schema(replay.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay.session_replay_dir(spark, sf_dir))
    )
    with replay.stream_shuffle_partitions(spark):
        q = (
            sessionize(src)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("st11_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("st11_out").select("user_id", "s_start", "s_end", "n")
