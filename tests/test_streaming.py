"""Streaming equivalences (SURVEY.md §2B.9): each streaming run must equal
its batch form (Spark-vs-Spark), which is itself hash-matched vs DuckDB in
test_correctness. ST04 watermark late-drop is the property test."""

from __future__ import annotations

from pydatalake_gen2_spark.harness import canon_rows
from pydatalake_gen2_spark.registry import load_all
from pydatalake_gen2_spark.streaming import replay


def _multiset(df):
    return canon_rows([c.lower() for c in df.columns], [tuple(r) for r in df.collect()])


def _pair_equal(spark, sf_dir, stream_name, batch_name, batch_cols=None):
    reg = load_all()
    s = reg[stream_name].spark_fn(spark, sf_dir)
    b = reg[batch_name].spark_fn(spark, sf_dir)
    if batch_cols:
        b = b.select(*batch_cols)
        s = s.select(*batch_cols)
    assert _multiset(s) == _multiset(b), f"{stream_name} != {batch_name}"


def test_tumbling_stream_equals_batch(spark, sf_dir):
    _pair_equal(spark, sf_dir, "st01_tumbling_stream", "st01_tumbling_batch")


def test_session_stream_equals_batch(spark, sf_dir):
    _pair_equal(spark, sf_dir, "st03_session_stream", "st03_session_batch")


def test_dedup_stream_equals_batch(spark, sf_dir):
    _pair_equal(spark, sf_dir, "st05_dedup_stream", "st05_dedup_batch")


def test_join_stream_equals_batch(spark, sf_dir):
    _pair_equal(spark, sf_dir, "st06_join_stream", "st06_interval_join_batch")


def test_foreachbatch_sink_rowcount(spark, sf_dir):
    reg = load_all()
    got = reg["st07_foreachbatch_sink"].spark_fn(spark, sf_dir).count()
    from pydatalake_gen2_spark.tables import load_table
    import pyspark.sql.functions as F

    want = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error").count()
    assert got == want


def test_watermark_drops_late_rows(spark, sf_dir):
    """ST04: a strict watermark must drop the re-played old chunk —
    streamed total < batch total (which includes the late duplicates)."""
    streamed, batch_total = replay.run_late_data_experiment(spark, sf_dir, "10 minutes")
    assert streamed < batch_total
    # and the gap is at least the size of the late chunk (~1/8 of events)
    assert batch_total - streamed >= (batch_total // 2) // 8


def test_sliding_stream_equals_batch(spark, sf_dir):
    _pair_equal(spark, sf_dir, "st02_sliding_stream", "st02_sliding_batch")


def test_stateful_counter_equals_batch(spark, sf_dir):
    """Final applyInPandasWithState state (count AND float value-sum) must
    equal the batch GROUP BY; the sum side is Spark-vs-Spark only (float
    accumulation order isn't oracle-safe cross-engine)."""
    import pyspark.sql.functions as F

    from pydatalake_gen2_spark.registry import ensure_views
    from pydatalake_gen2_spark.streaming import stateful

    ensure_views(spark, sf_dir)
    stateful.run_stateful_counter(spark, sf_dir)  # populates st08_out
    got = {
        r["user_id"]: (r["n"], round(r["sum_v"], 4))
        for r in spark.table("st08_out")
        .groupBy("user_id")
        .agg(F.max("n").alias("n"), F.max("sum_v").alias("sum_v"))
        .collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["sum_v"], 4))
        for r in spark.table("events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
        .collect()
    }
    assert got == want


def test_stream_static_join_equals_batch(spark, sf_dir):
    _pair_equal(spark, sf_dir, "st09_stream", "st09_stream_static_join")


def test_pipeline_stream_equals_batch(spark, sf_dir):
    """ST10: composed gate+dedup+window continuous query == batch form."""
    _pair_equal(spark, sf_dir, "st10_pipeline_stream", "st10_pipeline_batch")


def test_snapshot_ingest_versions_are_monotone(spark, sf_dir):
    """st12: every micro-batch published one snapshot; per-user counts
    must be non-decreasing across versions and the final version must
    equal the batch aggregate."""
    from pydatalake_gen2_spark.registry import ensure_views
    from pydatalake_gen2_spark.streaming.replay import run_snapshot_ingest

    ensure_views(spark, sf_dir)
    vt = run_snapshot_ingest(spark, sf_dir)
    vs = vt.versions()
    assert len(vs) >= 2, vs
    prev: dict = {}
    for v in vs:
        cur = {r["user_id"]: r["n"] for r in vt.read(v).collect()}
        for u, n in prev.items():
            assert cur.get(u, 0) >= n, (v, u)
        prev = cur
    batch = {
        r["user_id"]: r["n"]
        for r in spark.table("events").groupBy("user_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert prev == batch


def test_outer_join_stream_equals_batch(spark, sf_dir):
    """ST13: the watermarked stream-stream LEFT OUTER join must emit
    exactly the batch left-join result — matched rows AND the
    null-enriched unmatched clicks (which only exist because the
    watermark closed their windows)."""
    from pydatalake_gen2_spark.registry import load_all

    reg = load_all()
    streamed = sorted(
        map(tuple, reg["st13_outer_join_stream"].spark_fn(spark, sf_dir).collect())
    )
    batch = sorted(
        map(tuple, reg["st13_outer_join_batch"].spark_fn(spark, sf_dir)
            .select("click_id", "purchase_id", "c_user").collect())
    )
    assert streamed == batch
    assert any(p is None for _, p, _ in streamed)  # nulls actually emitted


def test_streaming_upsert_version_history(spark, sf_dir):
    """st19: one committed version per micro-batch (4-chunk replay), and
    the dimension must GROW or persist keys monotonically — a later
    version never loses a user the previous one had (upsert never
    deletes)."""
    from pydatalake_gen2_spark.queries.streaming_batch import _ST19_VT
    from pydatalake_gen2_spark.registry import load_all

    load_all()["st19_streaming_upsert"].spark_fn(spark, sf_dir).collect()
    vt = _ST19_VT[spark][sf_dir]
    versions = vt.versions()
    assert len(versions) == 4, versions
    seen: set[int] = set()
    for v in versions:
        users = {r["user_id"] for r in vt.read(v).select("user_id").collect()}
        assert seen <= users, v
        seen = users


def test_transform_with_state_equals_batch(spark, sf_dir):
    """st20: the per-user stats processor's final emissions must equal the
    batch GROUP BY (count, exact cents, distinct type count), whichever
    path tws_available() selects (here: the applyInPandasWithState
    expression — no protobuf in this container)."""
    import pyspark.sql.functions as F

    from pydatalake_gen2_spark.registry import ensure_views, load_all

    ensure_views(spark, sf_dir)
    got = {
        tuple(r)
        for r in load_all()["st20_transform_with_state"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    want = {
        tuple(r)
        for r in spark.table("events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .collect()
    }
    # which path ran is environment-dependent (tws_available()); the
    # equality must hold on either — the TWS-only twin below covers the
    # real-protocol path where the dependency exists
    assert got == want


def test_transform_with_state_tws_path(spark, sf_dir):
    """The real transformWithStateInPandas path — runs only where
    google.protobuf exists (Spark's TWS state-server protocol needs it)."""
    import pytest

    from pydatalake_gen2_spark.streaming import stateful

    if not stateful.tws_available():
        pytest.skip("google.protobuf unavailable: TWS protocol cannot run")
    from pydatalake_gen2_spark.registry import ensure_views
    from pydatalake_gen2_spark.streaming import replay as _r

    ensure_views(spark, sf_dir)
    src = _r.read_stream(spark, sf_dir)
    with stateful.rocksdb_state_store(spark), _r.stream_shuffle_partitions(spark):
        q = (
            stateful.transform_with_state_stats(src)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("st20_tws_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    assert spark.table("st20_tws_test").count() > 0


def test_rocksdb_state_store_restores_conf(spark, sf_dir):
    """The provider override must be scoped: prior value (or unset state)
    comes back after the context exits, even on error."""
    import pytest

    from pydatalake_gen2_spark.streaming import stateful

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    with stateful.rocksdb_state_store(spark):
        assert "RocksDBStateStoreProvider" in spark.conf.get(key)
    assert spark.conf.get(key, None) == before
    with pytest.raises(RuntimeError):
        with stateful.rocksdb_state_store(spark):
            raise RuntimeError("boom")
    assert spark.conf.get(key, None) == before


def test_dynamic_session_merge_rule_with_tied_timestamps(spark, sf_dir):
    """st21's merge rule on constructed data WITH tied timestamps (the
    case the fixtures never produce): Spark's session_window with a
    dynamic gap vs a literal Python transcription of the recurrence —
    an event joins the open session while it starts strictly before the
    running max of prior (ts + own-gap) ends."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: tie at t=0 (view + click), then a gap-crossing event
    rows += [
        (1, base, "view"), (1, base, "click"),
        (1, base + dt.timedelta(minutes=7), "click"),
        (1, base + dt.timedelta(minutes=30), "view"),
    ]
    # user 2: three-way tie, all one session
    rows += [(2, base, "click"), (2, base, "click"), (2, base, "view")]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, event_type STRING")
    df.createOrReplaceTempView("st21_tie_events")
    got = {
        (r["user_id"], r["s_start"], r["s_end"], r["n"])
        for r in spark.sql(
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
            FROM st21_tie_events
            GROUP BY session_window(ts,
                       CASE WHEN event_type = 'view' THEN '10 minutes'
                            ELSE '5 minutes' END), user_id
            """
        ).collect()
    }

    def gap(t):
        return dt.timedelta(minutes=10 if t == "view" else 5)

    want = set()
    by_user: dict = {}
    for u, ts, t in sorted(rows, key=lambda r: (r[0], r[1])):
        by_user.setdefault(u, []).append((ts, t))
    for u, evs in by_user.items():
        sess = None  # [start, end, n]
        for ts, t in evs:
            if sess is not None and ts < sess[1]:
                sess[1] = max(sess[1], ts + gap(t))
                sess[2] += 1
            else:
                if sess is not None:
                    want.add((u, sess[0].strftime("%Y-%m-%d %H:%M:%S"),
                              sess[1].strftime("%Y-%m-%d %H:%M:%S"), sess[2]))
                sess = [ts, ts + gap(t), 1]
        want.add((u, sess[0].strftime("%Y-%m-%d %H:%M:%S"),
                  sess[1].strftime("%Y-%m-%d %H:%M:%S"), sess[2]))
    assert got == want


def test_dynamic_session_stream_equals_batch(spark, sf_dir):
    _pair_equal(
        spark, sf_dir, "st21_dynamic_session_stream", "st21_dynamic_session_batch"
    )


def test_full_outer_join_stream_equals_batch(spark, sf_dir):
    """ST22: the watermarked stream-stream FULL OUTER join must emit
    exactly the batch full-join result — matched rows, null-enriched
    unmatched clicks, AND null-click unmatched purchases (the right
    side's watermark-eviction decision ST13 never exercises)."""
    from pydatalake_gen2_spark.registry import load_all

    reg = load_all()

    def key(t):
        # None sorts below ints (tuples may hold NULL ids on either side)
        return tuple((x is not None, x if x is not None else 0) for x in t)

    streamed = sorted(
        map(tuple, reg["st22_full_outer_stream"].spark_fn(spark, sf_dir).collect()),
        key=key,
    )
    batch = sorted(
        map(
            tuple,
            reg["st22_full_outer_batch"].spark_fn(spark, sf_dir)
            .select("click_id", "purchase_id", "c_user", "p_user")
            .collect(),
        ),
        key=key,
    )
    assert streamed == batch
    assert any(p is None for _, p, _, _ in streamed)  # unmatched clicks
    assert any(c is None for c, _, _, _ in streamed)  # unmatched purchases


def test_semi_join_stream_equals_batch(spark, sf_dir):
    """ST26: the watermarked stream-stream LEFT SEMI join must emit
    exactly the batch semi join's click set — once per click, however
    many purchases confirm it."""
    _pair_equal(spark, sf_dir, "st26_semi_stream", "st26_semi_join_batch")


def test_socket_source_network_stream_equals_batch(spark, sf_dir):
    """LIVE network-push streaming leg (r9): the container lacks the
    Kafka datasource jar (README test matrix), but Spark's built-in
    TEXT SOCKET source exercises the same shape — an external process
    PUSHES records over TCP, the engine consumes them as an unbounded
    stream. A local server thread serves 300 real events as CSV lines;
    the socket stream parses, aggregates per user (complete mode), and
    the final totals must equal the batch GROUP BY over the same rows
    EXACTLY. This certifies the engine's transformations are genuinely
    source-agnostic (the st01-st27 claim): swap file replay for a live
    TCP push and the same aggregation produces identical results — on
    a real cluster the same swap is `format("kafka")` + from_json.
    """
    import socket
    import socketserver
    import threading
    import time

    from pyspark.sql import functions as F

    from pydatalake_gen2_spark.tables import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .orderBy("event_id")
        .limit(300)
        .collect()
    )
    lines = [f"{r.event_id},{r.user_id}" for r in rows]
    expect = {}
    for r in rows:
        expect[r.user_id] = expect.get(r.user_id, 0) + 1

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            self.request.sendall(("\n".join(lines) + "\n").encode())
            # keep the connection open until the test is done: the socket
            # source treats EOF as source failure, not end-of-stream
            self.server.done.wait(timeout=120)

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    server.done = threading.Event()
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    q = None
    try:
        src = (
            spark.readStream.format("socket")
            .option("host", "127.0.0.1")
            .option("port", port)
            .load()
        )
        parsed = src.select(
            F.split("value", ",").getItem(0).cast("bigint").alias("event_id"),
            F.split("value", ",").getItem(1).cast("bigint").alias("user_id"),
        )
        agg = parsed.groupBy("user_id").agg(F.count("*").alias("n"))
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("socket_agg")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        deadline = time.time() + 90
        total = 0
        while time.time() < deadline:
            got = spark.table("socket_agg").agg(F.sum("n")).collect()[0][0]
            total = got or 0
            if total >= len(lines):
                break
            time.sleep(0.5)
        assert total == len(lines), f"saw {total}/{len(lines)} rows"
        final = {
            r.user_id: r.n for r in spark.table("socket_agg").collect()
        }
        assert final == expect
    finally:
        if q is not None:
            q.stop()
        server.done.set()
        server.shutdown()
        server.server_close()
