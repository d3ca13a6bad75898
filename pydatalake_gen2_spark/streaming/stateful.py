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

import contextlib
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


# -- transformWithStateInPandas (ST20): the Spark 4 arbitrary-state API ---

TWS_OUT_SCHEMA = (
    "user_id BIGINT, n BIGINT, cents BIGINT, n_types BIGINT"
)


def _make_user_stats_processor():
    """Per-user running stats via the Spark 4 ``StatefulProcessor`` API —
    the successor to applyInPandasWithState (st08) with TYPED, composable
    state primitives instead of one opaque tuple:

    - ``ValueState`` (n, cents): the running counter — two numbers.
    - ``MapState`` (event_type -> 1): distinct-type registry; entry count
      is bounded by the event-type vocabulary, not the event count.

    Every emission is the updated cumulative row, so the LAST row per user
    (max n — counts are monotone) must equal the batch GROUP BY: count,
    exact integer cents sum, and count(DISTINCT event_type). State shards
    with the groupBy shuffle exactly like st08; at 100 TB each cell is a
    couple of numbers plus a vocabulary-bounded map, with TTL/timers
    available on the handle for eviction policies (unused here — finite
    replay).

    The class is defined inside this factory so cloudpickle serializes it
    BY VALUE: the stateful-processor worker processes unpickle the
    instance without needing this package importable on their sys.path
    (module-level classes pickle by reference and would crash them).
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class UserStatsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, cents BIGINT"
            )
            self._types = handle.getMapState("types", "t STRING", "one TINYINT")

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                # half-up (values are positive) to match round() in Spark
                # SQL and DuckDB — pandas .round() is half-even, diverges
                cents += int((pdf["value"] * 100 + 0.5).astype("int64").sum())
                for t in pdf["event_type"].unique():
                    self._types.updateValue((str(t),), (1,))
            self._totals.update((n, cents))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "cents": [cents],
                 "n_types": [n_types]}
            )

        def close(self) -> None:
            pass

    return UserStatsProcessor()


@contextlib.contextmanager
def rocksdb_state_store(spark: SparkSession):
    """Set the RocksDB state-store provider for the duration of one
    streaming query; restores the prior session value (or unsets) on
    exit so the shared session's other stateful queries are unaffected."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def tws_available() -> bool:
    """transformWithState's state-server protocol needs ``google.protobuf``
    in the Python workers (pyspark's StateMessage proto). This container
    has no protobuf and installs are off-limits, so the TWS path is gated:
    real where the dependency exists, honest fallback here."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


def transform_with_state_stats(src: DataFrame) -> DataFrame:
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_user_stats_processor(),
        outputStructType=TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def _tws_fallback_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Same per-user semantics as UserStatsProcessor, expressed on the
    applyInPandasWithState API: one tuple cell (n, cents, sorted
    comma-joined type set — bounded by the event-type vocabulary)."""
    n, cents, types_csv = state.get if state.exists else (0, 0, "")
    types = set(types_csv.split(",")) - {""}
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100 + 0.5).astype("int64").sum())
        types.update(str(t) for t in pdf["event_type"].unique())
    state.update((n, cents, ",".join(sorted(types))))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "cents": [cents],
         "n_types": [len(types)]}
    )


def transform_with_state_stats_fallback(src: DataFrame) -> DataFrame:
    return src.groupBy("user_id").applyInPandasWithState(
        _tws_fallback_update,
        outputStructType=TWS_OUT_SCHEMA,
        stateStructType="n BIGINT, cents BIGINT, types STRING",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_transform_with_state(
    spark: SparkSession, sf_dir: str, force_rocksdb: bool = False
) -> DataFrame:
    """Drive the per-user stats processor over the events replay; return
    the final cumulative row per user (monotone n → max row is the last
    emission). Uses the Spark 4 transformWithStateInPandas path when the
    protobuf dependency is present (see tws_available), else the
    applyInPandasWithState expression of the IDENTICAL semantics — which
    path ran is auditable via the query name in the Spark UI and the
    tests (test_streaming.py::test_st20 asserts the fallback ≡ batch; a
    skipif-gated twin exercises the TWS path where protobuf exists).

    ``force_rocksdb=True`` (ST20b, r8 verdict #5) runs the stateful leg
    under the RocksDB state-store provider Spark 4 bundles
    (rocksdbjni) instead of the default HDFS-backed in-memory map. At
    100 TB of keyed state the default provider is the scale limit —
    state must fit in executor heap; RocksDB spills keyed state to
    local SSD with incremental-checkpoint semantics, so certifying the
    OUTPUT is provider-invariant is the streaming sibling of S21's
    codec matrix. The run asserts RocksDB actually engaged (rocksdb*
    custom metrics present in the final progress) so a silent fallback
    to the default provider can never masquerade as certification."""
    src = replay.read_stream(spark, sf_dir)
    use_tws = tws_available() and not force_rocksdb
    build = transform_with_state_stats if use_tws else transform_with_state_stats_fallback
    name = ("st20_tws" if use_tws
            else "st20_rocksdb" if force_rocksdb else "st20_fallback")
    with contextlib.ExitStack() as stack:
        if use_tws or force_rocksdb:
            # TWS requires the RocksDB state store provider (and ST20b
            # opts in) — scope it to this query and restore the session
            # conf afterwards (same discipline as
            # stream_shuffle_partitions; other stateful queries in the
            # session keep their configured provider)
            stack.enter_context(
                rocksdb_state_store(spark)
            )
        stack.enter_context(replay.stream_shuffle_partitions(spark))
        q = (
            build(src)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if force_rocksdb:
            ops = (q.lastProgress or {}).get("stateOperators", [])
            engaged = any(
                k.startswith("rocksdb")
                for op in ops
                for k in op.get("customMetrics", {})
            )
            if not engaged:
                raise RuntimeError(
                    "ST20b: RocksDB state store did not engage — no "
                    "rocksdb* custom metrics in the query progress"
                )
    out = spark.table(name)
    # last emission per user = the max-n row (n is monotone per user)
    return out.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.max_by("cents", "n").alias("cents"),
        F.max_by("n_types", "n").alias("n_types"),
    )
