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
