"""Product quantization (PQ) for embedding columns — the compression leg
of the ANN scale story (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

At 100 TB an `array<float>` embedding column dominates storage and scan
bandwidth: 64 floats = 256 B/row. PQ splits the vector into ``m``
subspaces, k-means-codes each subspace separately, and stores one small
code per subspace — ``m=8, k=16`` → 8 codes/row (32x smaller), while
approximate inner products stay computable from the codes alone via a
per-query lookup table (ADC — asymmetric distance computation: the query
stays exact, only the corpus side is quantized).

Distributed shape:
- training: driver k-means per subspace on a bounded seeded-hash sample
  (same pattern as ivf_centroids — the codebook is m*k*(d/m) doubles,
  tiny, shipped in a UDF closure);
- encoding: one Arrow-batched pandas UDF pass, no shuffle;
- ADC scan: mapInPandas over the CODES (8 B/row instead of 256 B), with
  the query LUTs broadcast in the closure — the scan is bandwidth-bound
  on the compressed column, which is the entire point.

Vectors are L2-normalized before training/encoding so approximate inner
product ≈ cosine (the convention the rest of the similarity family uses).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pydatalake_gen2_spark.operators.util import spread
from pydatalake_gen2_spark.operators.vectors import as_double


def _kmeans(x: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Seeded Lloyd k-means (gemm distances), deterministic."""
    rng = np.random.RandomState(seed)
    cent = x[rng.permutation(len(x))[: min(k, len(x))]].copy()
    x_sq = (x * x).sum(axis=1)
    for _ in range(iters):
        d2 = x_sq[:, None] - 2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(axis=0)
    return cent


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 1024,
    corpus_n: int | None = None,
) -> list[list[list[float]]]:
    """Train the PQ codebook: one k-means per subspace over a bounded
    seeded-hash sample (unbiased w.r.t. id order, same sampling contract
    as ivf_centroids). Returns m codebooks of k centroids each
    (shape m × k × d/m) as plain lists — tiny, plan-shippable."""
    two_cols = corpus.select(id_col, as_double(vec_col).alias("_v"))
    if corpus_n and corpus_n > sample_n:
        mod = max(1, corpus_n // sample_n)
        two_cols = two_cols.filter(F.pmod(F.hash(F.col(id_col)), F.lit(mod)) == 0)
    rows = two_cols.orderBy(id_col).limit(sample_n).collect()
    x = _normalize_rows(np.array([r["_v"] for r in rows], dtype=float))
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    return [
        _kmeans(x[:, j * sub : (j + 1) * sub], k, seed + j).tolist()
        for j in range(m)
    ]


def pq_recon_cosine(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector cosine between the normalized vector and its PQ
    reconstruction (encode + centroid gather in ONE Arrow pass) —
    the quantization-quality audit that certifies ADC scores are
    meaningful. Output: (id, recon_cos DOUBLE)."""
    cbs = [np.asarray(cb, dtype=float) for cb in codebooks]
    m = len(cbs)
    sub = cbs[0].shape[1]

    @F.pandas_udf("double")
    def recon_cos(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=float)
        x = _normalize_rows(np.stack(v.to_numpy()))
        recon = np.empty_like(x)
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            c = cbs[j]
            d2 = -2.0 * (xs @ c.T) + (c * c).sum(axis=1)[None, :]
            recon[:, j * sub : (j + 1) * sub] = c[d2.argmin(axis=1)]
        rn = np.linalg.norm(recon, axis=1)
        rn[rn == 0] = 1.0
        return pd.Series((x * recon).sum(axis=1) / rn)

    return spread(df.select(F.col(id_col), as_double(vec_col).alias("_v"))).select(
        id_col, recon_cos("_v").alias("recon_cos")
    )


def _encode_udf(codebooks: list[list[list[float]]]):
    """Arrow pandas-UDF factory for PQ encoding (closure-held codebook) —
    shared by pq_encode and ivfpq_topk so the inverted-file build can
    evaluate it in the SAME projection as the cell assigner."""
    cbs = [np.asarray(cb, dtype=float) for cb in codebooks]
    m = len(cbs)
    sub = cbs[0].shape[1]

    @F.pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = _normalize_rows(np.stack(v.to_numpy()))
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            c = cbs[j]
            d2 = -2.0 * (xs @ c.T) + (c * c).sum(axis=1)[None, :]
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return encode


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: (id, codes ARRAY<INT>), one Arrow pass.
    codes[j] = argmin over codebook j of the subvector distance."""
    return spread(df.select(F.col(id_col), as_double(vec_col).alias("_v"))).select(
        id_col, _encode_udf(codebooks)("_v").alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k per query via ADC over PQ codes.

    The corpus is scanned as codes only (mapInPandas over 8-byte rows);
    each batch computes approx inner products for ALL queries with m
    gather-adds against the broadcast LUTs (LUT[q][j][c] = q_sub_j ·
    centroid_c — queries stay exact). Per-query top-k is then a window
    over the (small) surviving candidate set: each mapInPandas batch
    pre-prunes to its local top-k per query, so the shuffle carries
    ≤ k·|queries| rows per batch, never the full n×Q score matrix.

    Output: (query_id, vec_id, adc_ip DOUBLE, rn) — rn 1..k by
    (adc_ip DESC, vec_id). Scores are approximate; downstream exact
    re-scoring (join vectors by id) is the standard refine step and is
    what the recall property test does implicitly by comparing id sets.
    """
    cbs = [np.asarray(cb, dtype=float) for cb in codebooks]
    m = len(cbs)
    sub = cbs[0].shape[1]
    q_rows = (
        queries.select(F.col(id_col).alias(query_id_col), as_double(vec_col).alias("_qv"))
        .collect()
    )
    q_ids = np.array([r[query_id_col] for r in q_rows], dtype=np.int64)
    qx = _normalize_rows(np.array([r["_qv"] for r in q_rows], dtype=float))
    # LUTs: (Q, m, k) — query subvector dot every centroid of that subspace
    luts = np.stack(
        [np.stack([qx[:, j * sub : (j + 1) * sub] @ cbs[j].T for j in range(m)], axis=1)]
    )[0]

    codes = pq_encode(corpus, [cb.tolist() for cb in cbs], id_col, vec_col)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (b, m)
            # ip[q, i] = sum_j LUT[q, j, c[i, j]]
            ip = np.zeros((len(q_ids), len(ids)))
            for j in range(m):
                ip += luts[:, j, c[:, j]]
            # local per-query top-k prune: the shuffle sees k rows per
            # query per batch, not the whole batch
            kk = min(k + 1, len(ids))  # +1 absorbs a possible self-match
            part = np.argpartition(-ip, kk - 1, axis=1)[:, :kk]
            out_q = np.repeat(q_ids, kk)
            out_i = ids[part].ravel()
            out_s = np.take_along_axis(ip, part, axis=1).ravel()
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_i, "adc_ip": out_s}
            )

    scored = codes.mapInPandas(
        scan, schema=f"{query_id_col} long, {id_col} long, adc_ip double"
    ).filter(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.col("adc_ip").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .withColumn("adc_ip", F.round(F.col("adc_ip"), 4))
    )


def pq_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks: list[list[list[float]]],
    shortlist_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    shortlist: DataFrame | None = None,
) -> DataFrame:
    """ADC shortlist → exact re-rank: the standard two-stage ANN refine.

    ``shortlist`` (optional): a precomputed (query_id, id) candidate
    frame — e.g. a persisted pq_topk(k*mult) the caller also consumes
    for an ADC-recall audit — so the compressed corpus scan runs ONCE
    instead of once per consumer (round-7 bench fix for lx_pq_rerank).

    Stage 1 runs `pq_topk` with a widened k (``shortlist_mult * k``) over
    the compressed codes — the cheap, bandwidth-bound scan. Stage 2
    re-attaches the exact vectors for ONLY the shortlist ids (an equi-join
    on id: |queries|·mult·k rows, not the corpus) and re-scores with exact
    cosine, so the final ordering is exact over the shortlist. Recall loss
    vs brute force is confined to stage-1 misses, which shrink
    geometrically with the multiplier — the knob a 100 TB deployment tunes
    instead of ever touching the full-precision column for the scan.

    Output: (query_id, vec_id, cos DOUBLE, rn) — same shape as
    similarity.cosine_topk, so the recall property test compares id sets
    directly.
    """
    from pydatalake_gen2_spark.operators.vectors import as_double as _ad
    from pydatalake_gen2_spark.operators.vectors import cosine as _cos

    if shortlist is None:
        shortlist = pq_topk(
            corpus, queries, k * shortlist_mult, codebooks,
            id_col, vec_col, query_id_col,
        )
    shortlist = shortlist.select(query_id_col, id_col)
    vec = corpus.select(F.col(id_col), _ad(vec_col).alias("_v"))
    qvec = queries.select(
        F.col(id_col).alias(query_id_col), _ad(vec_col).alias("_qv")
    )
    exact = (
        shortlist.join(F.broadcast(qvec), on=query_id_col)
        .join(vec, on=id_col)
        .select(
            query_id_col, id_col, _cos(F.col("_qv"), F.col("_v")).alias("cos")
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        exact.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .withColumn("cos", F.round(F.col("cos"), 4))
    )


def ivfpq_topk(
    corpus: DataFrame,
    k: int,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred=None,
) -> DataFrame:
    """IVF-PQ: centroid-partitioned inverted file whose postings are PQ
    codes — the canonical billion-scale ANN layout (Jégou et al. 2011,
    the Faiss `IVFx,PQy` index with by_residual=False).

    - The inverted file is (cell, id, codes): 8-byte codes instead of
      256-byte vectors, so each posting list is ~32x smaller than
      IVF-Flat's — the probe join shuffles codes, never vectors.
    - Queries (here: all-pairs over the corpus, like ivf_topk) probe
      their n_probe nearest cells; candidate generation is the equi-join
      on `cell`.
    - Candidates are scored by decoding codes against the closure-held
      codebook and dotting with the exact query — mathematically identical
      to the ADC LUT gather (LUT[j][c] = q_j · centroid_c; summing LUT
      entries IS the dot product of the query with the decoded vector),
      vectorized as one gather + gemm per Arrow batch.

    Output: (query_id, vec_id, adc_ip DOUBLE, rn) — approximate scores;
    pq_rerank is the exact-refine stage when needed.
    """
    from pydatalake_gen2_spark.operators.similarity import _cell_assigner

    cbs = [np.asarray(cb, dtype=float) for cb in codebooks]
    m = len(cbs)
    sub = cbs[0].shape[1]
    assign = _cell_assigner(centroids, n_probe)

    two = spread(corpus.select(F.col(id_col), as_double(vec_col).alias("_v")))
    # Cell assignment AND PQ encoding in ONE projection: Spark evaluates
    # adjacent pandas UDFs in a single ArrowEvalPython pass, so the
    # inverted file is a plain select — the former
    # ``base.select(cell).join(pq_encode(corpus), on=id)`` re-derived the
    # same corpus scan twice and shuffled BOTH corpus-sized sides through
    # an id equi-join for rows that were never apart (r11 finding). At
    # 100 TB that join was a full corpus shuffle of pure bookkeeping.
    base = two.withColumn("_a", assign("_v")).withColumn(
        "codes", _encode_udf(codebooks)("_v")
    )
    # inverted file: postings are PQ codes, not vectors
    inv = base.select(id_col, F.col("_a.cell").alias("cell"), "codes")
    # query_pred restricts the probe side only (audit query sample); the
    # inverted file still covers the whole corpus — and because the
    # predicate is on the id column it pushes below the UDF projection,
    # so the probe side evaluates the UDFs for the sample rows only.
    qbase = base.filter(query_pred) if query_pred is not None else base
    probes = qbase.select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_qv"),
        F.explode("_a.probes").alias("cell"),
    )
    cand = probes.join(inv, on="cell").filter(F.col("query_id") != F.col(id_col))

    @F.pandas_udf("double")
    def adc(qv: pd.Series, c: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype=float)
        q = _normalize_rows(np.stack(qv.to_numpy()))
        codes_m = np.stack(c.to_numpy()).astype(np.int64)  # (b, m)
        ip = np.zeros(len(q))
        for j in range(m):
            # decoded subvector gather + row-wise dot with the query slice
            ip += (q[:, j * sub : (j + 1) * sub] * cbs[j][codes_m[:, j]]).sum(axis=1)
        return pd.Series(ip)

    scored = cand.select(
        "query_id", id_col, adc(F.col("_qv"), F.col("codes")).alias("adc_ip")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_ip").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .withColumn("adc_ip", F.round(F.col("adc_ip"), 4))
    )
