"""UDF / UDAF / UDTF surface — SURVEY.md §2B.11 (UD01-UD04).

UDFs are the engine's slow path by design: UD01 is the only row-at-a-time
Python UDF (declared once, as the surface demands); everything else is
Arrow-vectorized (pandas_udf / applyInPandas) or a UDTF. Oracles replicate
the Python logic in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from pydatalake_gen2_spark.registry import register


@register(
    "ud01_scalar_udf",
    duck_sql="""
    SELECT doc_id,
           lower(trim(regexp_replace('  ' || upper(text) || '   ', ' +', ' ', 'g')))
               AS cleaned
    FROM documents
    """,
)
def ud01_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_text as a row-at-a-time Python UDF (lower + strip + collapse
    whitespace) applied to a deliberately dirtied input."""

    @F.udf(returnType=StringType())
    def clean_text(s: str) -> str:
        return " ".join(s.lower().split())

    dirty = F.concat(F.lit("  "), F.upper(F.col("text")), F.lit("   "))
    return spark.table("documents").select("doc_id", clean_text(dirty).alias("cleaned"))


@register(
    "ud02_pandas_cosine",
    duck_sql="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_dot_product(e.embedding::DOUBLE[], q.qv) /
                 (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_to_q
    FROM embeddings e CROSS JOIN q
    """,
)
def ud02_pandas_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized cosine-vs-anchor via pandas_udf + numpy (Arrow batches).
    ROUND(6) absorbs BLAS-vs-sequential summation ULP drift."""
    import numpy as np

    anchor = np.array(
        spark.table("embeddings").filter(F.col("vec_id") == 0).first()["embedding"],
        dtype=np.float64,
    )
    anchor_norm = float(np.sqrt(anchor @ anchor))

    @F.pandas_udf(DoubleType())
    def cos_to_anchor(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)))
        dots = m @ anchor
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * anchor_norm))

    return spark.table("embeddings").select(
        "vec_id", F.round(cos_to_anchor(F.col("embedding")), 6).alias("cos_to_q")
    )


@register(
    "ud03_grouped_zscore",
    duck_sql="""
    SELECT o_orderkey,
           ROUND((o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_orderpriority)) /
                 STDDEV_SAMP(o_totalprice) OVER (PARTITION BY o_orderpriority), 4) AS z
    FROM orders
    """,
)
def ud03_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF-style: per-priority z-score of o_totalprice via
    applyInPandas; oracle is the equivalent window SQL (ROUND(4) absorbs
    pandas-vs-SQL accumulation drift)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["o_totalprice"]
        z = (x - x.mean()) / x.std(ddof=1)
        return pd.DataFrame({"o_orderkey": pdf["o_orderkey"], "z": z.round(4)})

    return (
        spark.table("orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInPandas(zscore, "o_orderkey BIGINT, z DOUBLE")
    )


@register(
    "ud04_udtf_chunks",
    duck_sql="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
    idx AS (SELECT doc_id, t,
                   unnest(generate_series(0, CAST(ceil(len(t) / 10.0) AS INT) - 1))
                       AS chunk_idx
            FROM toks)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(t[(chunk_idx * 10 + 1):(chunk_idx * 10 + 10)], ' ') AS chunk
    FROM idx
    """,
)
def ud04_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF splitting each document into 10-token chunks
    (one input row → N output rows), joined laterally."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx INT, chunk STRING")
    class ChunkDoc:
        def eval(self, text: str):
            toks = text.lower().split(" ")
            for i in range(0, len(toks), 10):
                yield i // 10, " ".join(toks[i : i + 10])

    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk "
        "FROM documents d, LATERAL chunk_doc(d.text) c"
    )


@register(
    "ud05_ewma",
    duck_sql="""
    WITH RECURSIVE s AS (
      SELECT user_id, event_id, CAST(value AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    rec AS (
      SELECT user_id, event_id, rn, x AS ewma FROM s WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn,
             0.7 * rec.ewma + 0.3 * s.x
      FROM rec JOIN s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1)
    SELECT user_id, event_id, ROUND(ewma, 6) AS ewma
    FROM rec ORDER BY user_id, event_id
    """,
)
def ud05_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD05: per-key exponential weighted moving average over event time —
    the canonical sequential-state computation SQL windows cannot
    express without overflow-prone pow() tricks. Runs as Arrow-batched
    ``applyInPandas`` per user_id (the batch analog of
    applyInPandasWithState; one shuffle on the key, sequential scan
    inside each group — group size bounded by per-user event counts).
    P→H upgrade (the c32 Holt precedent): the recursion is written as
    the EXPLICIT IEEE expression y_t = 0.7*y_{t-1} + 0.3*x_t in our own
    loop — NOT pandas' .ewm() whose internal op order is theirs to
    change — and the oracle walks the identical expression order in a
    DuckDB recursive CTE, so every per-event double is bit-identical
    and ROUND(6) is a pure display fence."""
    ev = spark.table("events").select("user_id", "event_id", "ts", "value")

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        def r6(v: float) -> float:  # half-away-from-zero, like SQL ROUND
            return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

        pdf = pdf.sort_values(["ts", "event_id"])
        out = []
        y = 0.0
        for i, x in enumerate(pdf["value"].astype(float)):
            y = x if i == 0 else 0.7 * y + 0.3 * x
            out.append(y)
        pdf = pdf.assign(ewma=[r6(v) for v in out])
        return pdf[["user_id", "event_id", "ewma"]]

    return (
        ev.groupBy("user_id")
        .applyInPandas(ewma, "user_id BIGINT, event_id BIGINT, ewma DOUBLE")
        .orderBy("user_id", "event_id")
    )


@register(
    "ud06_arrow_udf",
    duck_sql="""
    SELECT doc_id,
           upper(substring(trim(text), 1, 12)) AS head_upper,
           CAST(length(text) % 97 AS BIGINT) AS len_mod
    FROM documents ORDER BY doc_id
    """,
    doc="UD06: Arrow-optimized scalar Python UDF (useArrow=True, Spark "
        "3.5+) — the same per-row logic as a classic pickle UDF but "
        "transported in Arrow record batches: one (de)serialization per "
        "batch instead of per row, typically 2-5x faster while keeping "
        "the simple scalar signature (no pandas Series handling). "
        "Completes the declared UDF ladder: ud01 row-pickle scalar -> "
        "ud06 Arrow scalar -> ud02 pandas vectorized -> ud03 grouped "
        "map -> ud04 UDTF -> ud05 stateful applyInPandas. Still Python "
        "(off the codegen fast path) — hot paths use built-ins; the "
        "ladder exists for logic that genuinely needs Python.",
)
def ud06_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("string", useArrow=True)
    def head_upper(s: str) -> str:
        return s.strip()[:12].upper()

    @F.udf("long", useArrow=True)
    def len_mod(s: str) -> int:
        return len(s) % 97

    return (
        spark.table("documents")
        .select(
            "doc_id",
            head_upper("text").alias("head_upper"),
            len_mod("text").alias("len_mod"),
        )
        .orderBy("doc_id")
    )


@register(
    "ud07_map_in_arrow",
    duck_sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty,
           l_quantity > 25.0 AS big_qty,
           upper(l_returnflag) AS flag
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def ud07_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD07: mapInArrow — the zero-copy end of the Python UDF ladder
    (row-pickle UDF -> Arrow scalar UDF -> pandas UDF -> grouped-map ->
    UDTF -> stateful -> RecordBatch-level mapInArrow). The function sees
    raw pyarrow RecordBatches: no pandas materialization, no per-row
    Python, compute stays in Arrow's vectorized kernels — the right
    shape for byte-heavy transforms (tokenizers, codecs) where even
    pandas conversion doubles memory. Arithmetic is kept integer/boolean
    exact (cast, compare, upper) so the pair hash-matches the oracle
    with no float-rounding caveats.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    src = spark.table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )

    def fn(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("l_orderkey"),
                    b.column("l_linenumber"),
                    pc.cast(b.column("l_quantity"), pa.int64()),
                    pc.greater(b.column("l_quantity"), 25.0),
                    pc.utf8_upper(b.column("l_returnflag")),
                ],
                ["l_orderkey", "l_linenumber", "qty", "big_qty", "flag"],
            )

    out = src.mapInArrow(
        fn,
        "l_orderkey long, l_linenumber int, qty long, big_qty boolean, flag string",
    )
    return out.orderBy("l_orderkey", "l_linenumber")


@register(
    "ud08_pandas_iter_udf",
    duck_sql="""
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) % 97 AS price_bucket
    FROM orders ORDER BY o_orderkey
    """,
)
def ud08_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD08: the ITERATOR-of-Series pandas UDF — same Arrow transport as
    UD02's Series->Series flavor, but the function owns the whole batch
    iterator, so expensive one-time setup (loading a tokenizer, an ONNX
    quality model, a codec table) runs ONCE PER TASK instead of once per
    batch. That amortization is why model-scoring pipelines (L27's
    real-world form) use this flavor at scale. The 'model' here is a
    deterministic mod-97 bucketer on integer cents so the pair
    hash-matches."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def bucket(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        modulus = 97  # stand-in for expensive per-task init (model load)
        for s in it:
            # half-AWAY-FROM-ZERO, not pandas .round() (half-even): matches
            # SQL round() in both engines for either sign (astype('int64')
            # truncates toward zero, which is only half-up for positives)
            cents = (np.floor(s.abs().mul(100) + 0.5) * np.sign(s)).astype("int64")
            # np.fmod, not `%`: numpy % is FLOORED modulo (always
            # non-negative) while Spark/DuckDB SQL % TRUNCATES (sign of
            # dividend) — they differ on negative cents.
            yield pd.Series(np.fmod(cents.to_numpy(), modulus))

    return (
        spark.table("orders")
        .select("o_orderkey", bucket(F.col("o_totalprice")).alias("price_bucket"))
        .orderBy("o_orderkey")
    )


@register(
    "ud09_udtf_analyze",
    duck_sql="""
    SELECT doc_id,
           split_part(text, ' ', 1) AS c0,
           split_part(text, ' ', 2) AS c1,
           split_part(text, ' ', 3) AS c2
    FROM documents ORDER BY doc_id
    """,
)
def ud09_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD09: POLYMORPHIC Python UDTF — the static analyze() hook computes
    the OUTPUT SCHEMA from the call's arguments at plan time (here: n
    leading words -> n string columns), so one registered function serves
    any width without a schema literal at the call site. This is the
    Spark 4 UDTF upgrade over UD04's fixed-schema variant — the shape a
    generic 'unpack this column' library function needs. Analysis-time
    schema means Catalyst still sees concrete columns: pruning and
    downstream resolution work exactly as if the schema were written by
    hand."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class LeadingWords:
        @staticmethod
        def analyze(s: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                schema=StructType(
                    [StructField(f"c{i}", StringType()) for i in range(n.value)]
                )
            )

        def eval(self, s, n):
            parts = (s or "").split(" ")
            yield tuple(parts[i] if i < len(parts) else None for i in range(n))

    spark.udtf.register("ud09_leading_words", LeadingWords)
    return spark.sql(
        """
        SELECT d.doc_id, t.c0, t.c1, t.c2
        FROM documents d, LATERAL ud09_leading_words(d.text, 3) t
        ORDER BY d.doc_id
        """
    )


@register(
    "ud10_apply_in_arrow",
    duck_sql="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def ud10_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD10: grouped-map over RAW ARROW TABLES (applyInArrow, Spark 4) —
    ud03's applyInPandas sibling without the pandas materialization:
    each group arrives as a pyarrow.Table and leaves as one, so
    group-wise logic over byte-heavy columns pays one Arrow buffer, not
    an Arrow→pandas copy. Completes the grouped half of the UDF ladder
    (ud03 pandas grouped-map, ud05 stateful, ud10 arrow grouped-map).
    Cents arithmetic keeps the outputs integer-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: pa.Table) -> pa.Table:
        cents = pc.cast(
            # half-up on positives, not Arrow's default half-to-even
            pc.round(pc.multiply(table.column("o_totalprice"), 100), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderpriority": [table.column("o_orderpriority")[0].as_py()],
                "n": [table.num_rows],
                "min_cents": [pc.min(cents).as_py()],
                "max_cents": [pc.max(cents).as_py()],
            }
        )

    return (
        spark.table("orders")
        .select("o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInArrow(
            stats,
            "o_orderpriority STRING, n BIGINT, min_cents BIGINT, max_cents BIGINT",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "ud11_grouped_agg_pandas",
    duck_sql="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                    CAST(l_quantity AS BIGINT)) AS BIGINT) AS wtotal_cents,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def ud11_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD11: GROUPED_AGG pandas UDF (Series... -> scalar) — the custom
    vectorized AGGREGATE flavor of the UDF ladder (ud02 scalar, ud03/ud10
    grouped map, ud05 stateful, ud08 iterator). Unlike built-in
    aggregates there is NO partial/final split: Spark shuffles the raw
    (projected) rows and each whole group's columns arrive as pandas
    Series at the single ArrowAggregatePython stage — the honest cost of
    arbitrary Python aggregation logic, and why the input is pruned to
    the two needed columns before the exchange. Quantity-weighted cents
    keep it integer-exact. The same UDAF also works as a window function
    — the only pandas UDF kind that does."""

    @F.pandas_udf("bigint")
    def wsum_cents(price: pd.Series, qty: pd.Series) -> int:
        # half-away-from-zero matches round() in Spark SQL / DuckDB for
        # either sign (plain astype truncation is half-up only for >= 0)
        cents = (np.floor(price.abs() * 100 + 0.5) * np.sign(price)).astype("int64")
        return int((cents * qty.astype("int64")).sum())

    li = spark.table("lineitem")
    # a grouped-agg pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — run it alone and join the plain
    # aggregate on the (3-value) group key; both sides are one shuffle on
    # the same key, which AQE coalesces
    udaf = (
        li.select("l_returnflag", "l_extendedprice", "l_quantity")
        .groupBy("l_returnflag")
        .agg(wsum_cents("l_extendedprice", "l_quantity").alias("wtotal_cents"))
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_total"),
    )
    return (
        plain.join(udaf, "l_returnflag")
        .select("l_returnflag", "n", "wtotal_cents", "qty_total")
        .orderBy("l_returnflag")
    )


@register(
    "ud12_table_arg_udtf",
    duck_sql="""
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) - epoch_us(lag(ts) OVER
                  (PARTITION BY user_id ORDER BY (ts, event_id)))
                  AS BIGINT) AS gap_us
      FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM g GROUP BY user_id ORDER BY user_id
    """,
)
def ud12_table_arg_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD12: Python UDTF with a TABLE argument (Spark 4: `f(TABLE(...)
    PARTITION BY ... ORDER BY ...)`) — the engine shuffles/sorts each
    partition and streams its rows through one UDTF instance (eval per
    row, terminate at partition end), i.e. a user-defined PARTITIONED
    AGGREGATION declared in SQL, no groupBy wiring at the call site.
    Computes per-user event count + max inter-event gap in integer
    microseconds (order-dependent state — only correct BECAUSE the
    engine honors ORDER BY inside the table argument)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id BIGINT, n BIGINT, max_gap_us BIGINT")
    class GapStats:
        def __init__(self) -> None:
            self._user = None
            self._n = 0
            self._last = None
            self._max_gap = None

        def eval(self, row):
            self._user = row["user_id"]
            ts = row["ts"]
            if self._last is not None:
                # naive-datetime subtraction: timezone-independent, unlike
                # .timestamp(), which reinterprets naive values as local
                d = ts - self._last
                gap = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
                if self._max_gap is None or gap > self._max_gap:
                    self._max_gap = gap
            self._last = ts
            self._n += 1

        def terminate(self):
            if self._user is not None:
                yield self._user, self._n, self._max_gap

    spark.udtf.register("ud12_gap_stats", GapStats)
    return spark.sql(
        """
        SELECT * FROM ud12_gap_stats(
          TABLE(SELECT user_id, ts, event_id FROM events)
          PARTITION BY user_id ORDER BY (ts, event_id))
        ORDER BY user_id
        """
    )


@register(
    "ud13_sql_udf",
    duck_sql="""
    WITH rev AS (
      SELECT l_returnflag,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                      AS DECIMAL(18,4))) AS revenue_dec
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(revenue_dec AS DOUBLE) AS revenue,
           CAST(tile AS INT) AS tile,
           CAST((CAST(revenue_dec * 10000 AS BIGINT) * tile * 2 + 4) // 8
                AS DOUBLE) / 10000 AS fence
    FROM rev CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS tile) t
    ORDER BY l_returnflag, tile
    """,
)
def ud13_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD13: SQL-defined UDFs (Spark 4 CREATE FUNCTION ... RETURN) — the
    declarative end of the UDF ladder: a scalar SQL UDF (discounted
    price) and a TABLE-valued SQL UDF (tile generator) composed in one
    query. Unlike every Python rung (ud01-ud12), SQL UDF bodies INLINE
    into the Catalyst plan — the scalar folds into the scan projection
    and whole-stage codegen, zero serialization boundary: at 100 TB this
    is the flavor to reach for first. Definitions are idempotent
    (CREATE OR REPLACE, deterministic bodies), so re-registration in a
    shared session is safe; the oracle states both bodies inline."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ud13_disc(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN ROUND(p * (1 - d), 4)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ud13_tiles(n INT) "
        "RETURNS TABLE (tile INT) RETURN SELECT explode(sequence(1, n))"
    )
    # fence math is EXACT integer ten-thousandths with explicit HALF_UP
    # ((n*2 + 4) div 8 implements round-half-up of n/4 for positive n):
    # the original ROUND(revenue * tile / 4, 4) on a computed DOUBLE hit
    # a true half-way case at sf0.1 (revenue/2 = ...513.66155 — Spark
    # rounds the decimal shortest-repr HALF_UP to .6616, DuckDB rounds
    # the binary double to .6615), caught by the decade-up oracle sweep.
    # The p02/R5 rule applies: never ROUND a computed double.
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_returnflag,
                 SUM(CAST(ud13_disc(l_extendedprice, l_discount)
                          AS DECIMAL(18,4))) AS revenue_dec
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, CAST(revenue_dec AS DOUBLE) AS revenue, tile,
               CAST((CAST(revenue_dec * 10000 AS BIGINT) * tile * 2 + 4)
                    DIV 8 AS DOUBLE) / 10000 AS fence
        FROM rev CROSS JOIN ud13_tiles(4)
        ORDER BY l_returnflag, tile
        """
    )


@register(
    "ud14_secondary_sort",
    duck_sql="""
    SELECT user_id, event_id,
           CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_id
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events) t
    ORDER BY user_id, event_id
    """,
)
def ud14_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD14: the SECONDARY-SORT pattern — repartition by key +
    sortWithinPartitions + one mapInPandas pass that carries sequential
    state across rows AND Arrow batches: per-user 5-minute-gap session
    ids computed by a running scan, no groupBy (the classic MapReduce
    secondary sort, DataFrame-native). Correctness leans on two engine
    guarantees the pair certifies: hash repartition puts each key wholly
    in ONE partition, and mapInPandas streams that partition's batches
    in its sorted order. vs ud05 (applyInPandas): no per-group
    materialization — a user with a billion events streams through in
    batches instead of one pandas frame, which is why sessionizing a
    100 TB event log uses THIS shape. Oracle: the gaps-and-islands
    window SQL (st03's form)."""
    from collections.abc import Iterator

    ev = spark.table("events").select("user_id", "event_id", "ts")
    part = ev.repartition(32, "user_id").sortWithinPartitions(
        "user_id", "ts", "event_id"
    )
    gap = pd.Timedelta(minutes=5)

    def sessionize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_user, last_ts, sid = None, None, 0
        for pdf in batches:
            sids = []
            for u, t in zip(pdf["user_id"], pdf["ts"]):
                if u != last_user:
                    sid = 1
                elif t - last_ts > gap:
                    sid += 1
                sids.append(sid)
                last_user, last_ts = u, t
            out = pdf[["user_id", "event_id"]].copy()
            out["session_id"] = sids
            yield out

    return part.mapInPandas(
        sessionize, "user_id BIGINT, event_id BIGINT, session_id BIGINT"
    ).orderBy("user_id", "event_id")


@register(
    "ud15_cogrouped_map",
    duck_sql="""
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS click_cents
      FROM events WHERE event_type = 'click' GROUP BY user_id),
    p AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS purch_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(n_clicks, 0) AS n_clicks,
           coalesce(click_cents, 0) AS click_cents,
           coalesce(n_purchases, 0) AS n_purchases,
           coalesce(purch_cents, 0) AS purch_cents
    FROM c FULL JOIN p ON c.user_id = p.user_id
    ORDER BY user_id
    """,
)
def ud15_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD15: COGROUPED applyInPandas — the two-input rung of the UDF
    ladder: clicks and purchases are grouped by user INDEPENDENTLY and
    each key's two pandas frames arrive together in one Python call
    (df1.groupby(k).cogroup(df2.groupby(k)).applyInPandas), the shape
    for custom per-key reconciliation/merge logic over two tables
    (pandas merge_asof across sources, diff-and-patch, feature joins)
    without materializing a joined row set first. Either side may be
    empty for a key — full-outer semantics the oracle mirrors with a
    FULL JOIN of the two aggregates. Cents use the half-up idiom."""
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "value")

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        uid = int(left["user_id"].iloc[0]) if len(left) else int(right["user_id"].iloc[0])

        def cents(s: pd.Series) -> int:
            # sign-correct half-away-from-zero (matches SQL round())
            c = (np.floor(s.abs().mul(100) + 0.5) * np.sign(s)).astype("int64")
            return int(c.sum()) if len(s) else 0

        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_clicks": [len(left)],
                "click_cents": [cents(left["value"])],
                "n_purchases": [len(right)],
                "purch_cents": [cents(right["value"])],
            }
        )

    out = (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id BIGINT, n_clicks BIGINT, click_cents BIGINT, "
            "n_purchases BIGINT, purch_cents BIGINT",
        )
    )
    return out.orderBy("user_id")
