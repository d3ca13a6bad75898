"""Property tests for tier-P operators (SURVEY.md §5.2): approximate /
randomized ops that can't hash-match an oracle get deterministic bounds
and recall assertions instead."""

from __future__ import annotations

import pyspark.sql.functions as F

from pydatalake_gen2_spark.operators import dedup, similarity
from pydatalake_gen2_spark.registry import load_all


def test_approx_count_distinct_bound(spark, sf_dir, duck):
    """g04's registered form folds the 3·rsd accuracy assertion into its
    own output (within_bound booleans + exact anchors); verify the anchors
    against DuckDB and that the folded assertion holds."""
    reg = load_all()
    row = reg["g04_approx_count_distinct"].spark_fn(spark, sf_dir).first()
    exact_parts, exact_orders = duck.execute(
        "SELECT COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()
    assert row["exact_parts"] == exact_parts
    assert row["exact_orders"] == exact_orders
    assert row["parts_within_bound"] and row["orders_within_bound"]


def test_minhash_recall_vs_exact(spark, sf_dir):
    """L02: after exact verification, the LSH candidate set must contain
    every true shingle pair at Jaccard >= tau (100% recall at this
    scale/seed — loose candidates, tight verify)."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    exact = {
        (r["id_a"], r["id_b"]) for r in dedup.exact_jaccard_pairs(docs, tau=0.3).collect()
    }
    mh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_candidate_pairs(docs, tau=0.3).collect()
    }
    assert mh <= exact  # exact-verified: no false positives by construction
    assert exact, "fixture should contain planted near-dup pairs"
    recall = len(mh & exact) / len(exact)
    assert recall == 1.0, f"recall {recall}: missing {exact - mh}"


def test_jaccard_max_df_cap_keeps_planted_recall(spark, sf_dir):
    """Scale guard: dropping ubiquitous shingles (df cap) must not lose
    the planted near-dup pairs — hot shingles carry no dedup signal, they
    only blow up the inverted-index join (d^2 pairs per hot key)."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    exact = {
        (r["id_a"], r["id_b"]) for r in dedup.exact_jaccard_pairs(docs, tau=0.3).collect()
    }
    assert exact, "fixture should contain planted near-dup pairs"
    # Cap at 10% of the corpus: aggressive enough to prune any hot key.
    cap = max(2, int(docs.count() * 0.10))
    capped = {
        (r["id_a"], r["id_b"])
        for r in dedup.exact_jaccard_pairs(docs, tau=0.3, max_df=cap).collect()
    }
    recall = len(capped & exact) / len(exact)
    assert recall == 1.0, f"df-cap lost planted pairs: {exact - capped}"


def test_simhash_identical_and_neardup(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank now"),
        (4, "completely different content about spark query engines and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    assert got[1] == got[2]  # identical text → identical fingerprint
    ham_near = bin(got[1] ^ got[3]).count("1")
    ham_far = bin(got[1] ^ got[4]).count("1")
    assert ham_near < ham_far  # one-token edit closer than unrelated text
    assert ham_near <= 12


def test_simhash_neardup_matches_bruteforce(spark, sf_dir):
    """Banded Hamming join == brute-force pairwise Hamming, exactly:
    recall 1.0 is structural (r+1 disjoint bands → pigeonhole) and
    precision is exact (bit_count verify), so the candidate-join output
    must EQUAL the all-pairs truth at fixture scale."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    r = 6
    fp = dedup.simhash(docs)
    got = {
        (row["id_a"], row["id_b"]): row["hamming"]
        for row in dedup.simhash_neardup_pairs(docs, r=r, fingerprints=fp).collect()
    }
    sigs = {row["doc_id"]: row["simhash"] for row in fp.collect()}
    ids = sorted(sigs)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= r:
                truth[(a, b)] = h
    assert truth, "fixture should contain planted near/exact dups"
    assert got == truth


def test_simhash_neardup_radius_zero_is_exact_equal(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "totally unrelated words about query engines and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           dedup.simhash_neardup_pairs(df, r=0).collect()}
    assert got == {(1, 2, 0)}


def test_lsh_topk_recall(spark, sf_dir):
    """LSH-bucketed ANN must recover a reasonable fraction of the true
    top-5 neighbours (8 planes / 256 buckets on 500 vectors is coarse;
    the property is meaningful-recall + exact-scores-on-candidates)."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    truth = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)
    t = {(r["query_id"], r["vec_id"]) for r in truth.collect()}
    approx = similarity.lsh_topk(emb, k=5).filter(F.col("query_id") < 20)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(a & t) / len(t)
    assert recall >= 0.2, f"LSH recall too low: {recall}"


def test_language_id_accuracy_on_planted(spark):
    rows = [
        (1, "the cat and the dog of a house is in the garden"),
        (2, "der hund und die katze ist ein tier"),
        (3, "el perro y la casa de que un gato"),
        (4, "le chien et les chats des maisons un jour"),
        (5, "xyzzy plugh quux"),
    ]
    from pydatalake_gen2_spark.operators.text import language_id

    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "und"}


def test_ngrams_short_doc_guard(spark):
    from pydatalake_gen2_spark.operators.text import ngrams, tokens

    df = spark.createDataFrame([(1, "one two"), (2, "a")], "doc_id BIGINT, text STRING")
    out = df.select(ngrams(tokens(), 3).alias("g")).collect()
    assert [r["g"] for r in out] == [[], []]


def test_ivf_topk_full_probe_equals_brute_force(spark, sf_dir):
    """With n_probe == n_cells IVF degenerates to exact brute force —
    the result sets must be identical (ids AND scores)."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    truth = {
        (r["query_id"], r["vec_id"], r["cos"])
        for r in similarity.cosine_topk(emb, emb, k=5).collect()
    }
    full = {
        (r["query_id"], r["vec_id"], r["cos"])
        for r in similarity.ivf_topk(emb, k=5, n_cells=4, n_probe=4).collect()
    }
    assert full == truth


def test_ivf_topk_partial_probe_recall(spark, sf_dir):
    """Probing half the cells must still recover a meaningful fraction of
    the true top-5 (scores on survivors stay exact by construction)."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    truth = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)
    t = {(r["query_id"], r["vec_id"]) for r in truth.collect()}
    approx = similarity.ivf_topk(emb, k=5, n_cells=8, n_probe=4).filter(
        F.col("query_id") < 20
    )
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(a & t) / len(t)
    assert recall >= 0.3, f"IVF recall too low: {recall}"


def test_pq_reconstruction_quality(spark, sf_dir):
    """PQ codes must reconstruct normalized vectors to high mean cosine —
    the invariant that makes ADC scores meaningful. Deterministic: seeded
    codebook, exact numpy arithmetic."""
    import numpy as np

    from pydatalake_gen2_spark.operators import pq
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    cbs = [np.asarray(c) for c in pq.pq_train(emb, m=16, k=32)]
    rows = pq.pq_encode(emb, [c.tolist() for c in cbs]).collect()
    orig = {r["vec_id"]: r for r in emb.collect()}
    sub = cbs[0].shape[1]
    cos = []
    for r in rows:
        v = np.array(orig[r["vec_id"]]["embedding"], dtype=float)
        v /= np.linalg.norm(v) or 1.0
        recon = np.concatenate([cbs[j][r["codes"][j]] for j in range(len(cbs))])
        cos.append(float(v @ recon / (np.linalg.norm(recon) or 1.0)))
    assert len(cos) == emb.count()
    assert sum(cos) / len(cos) >= 0.8, sum(cos) / len(cos)
    assert sub * len(cbs) == 64


def test_pq_topk_recall_vs_exact(spark, sf_dir):
    """ADC over 8-code PQ must recover a meaningful fraction of the true
    cosine top-5 (32^16 distinct reconstructions over clustered fixtures)."""
    from pydatalake_gen2_spark.operators import pq
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    cb = pq.pq_train(emb, m=16, k=32)
    approx = {
        (r["query_id"], r["vec_id"])
        for r in pq.pq_topk(emb, q, k=5, codebooks=cb).collect()
    }
    recall = len(approx & truth) / len(truth)
    assert recall >= 0.3, f"PQ/ADC recall too low: {recall}"


def test_pq_rerank_recall_dominates_raw_adc(spark, sf_dir):
    """Two-stage refine (ADC 4k shortlist → exact re-rank) must recall at
    least as much of the true top-5 as the raw ADC top-5, and its scores
    must be exact cosines (spot-checked against cosine_topk on shared
    pairs)."""
    from pydatalake_gen2_spark.operators import pq
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    truth_rows = similarity.cosine_topk(emb, q, k=5).collect()
    truth = {(r["query_id"], r["vec_id"]) for r in truth_rows}
    exact_cos = {(r["query_id"], r["vec_id"]): r["cos"] for r in truth_rows}
    cb = pq.pq_train(emb, m=16, k=32)
    raw = {
        (r["query_id"], r["vec_id"])
        for r in pq.pq_topk(emb, q, k=5, codebooks=cb).collect()
    }
    rr_rows = pq.pq_rerank(emb, q, k=5, codebooks=cb).collect()
    rr = {(r["query_id"], r["vec_id"]) for r in rr_rows}
    raw_recall = len(raw & truth) / len(truth)
    rr_recall = len(rr & truth) / len(truth)
    assert rr_recall >= raw_recall, (rr_recall, raw_recall)
    assert rr_recall >= 0.5, f"rerank recall too low: {rr_recall}"
    for r in rr_rows:
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            assert abs(r["cos"] - exact_cos[key]) < 1e-9, key


def test_ivfpq_topk_recall_vs_exact(spark, sf_dir):
    """IVF-PQ (cells over PQ-coded postings) must recover a meaningful
    fraction of the true top-5; its candidate set is bounded by the
    probed cells so recall <= IVF-Flat's at the same n_probe."""
    from pydatalake_gen2_spark.operators import pq
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    n = emb.count()
    truth = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, emb, k=5).collect()
    }
    cb = pq.pq_train(emb, m=16, k=32, corpus_n=n)
    cents = similarity.ivf_centroids(emb, n_cells=max(8, int(n**0.5)), corpus_n=n)
    approx = {
        (r["query_id"], r["vec_id"])
        for r in pq.ivfpq_topk(emb, k=5, codebooks=cb, centroids=cents, n_probe=6).collect()
    }
    recall = len(approx & truth) / len(truth)
    assert recall >= 0.25, f"IVF-PQ recall too low: {recall}"


def test_approx_percentile_bound(spark, sf_dir, duck):
    """g18's registered form emits exact percentile anchors (round 4) plus
    booleans asserting the sketch lands in the exact ±0.01-rank envelope;
    verify anchors against DuckDB's quantile_cont and the folded bounds."""
    reg = load_all()
    rows = {
        r["l_returnflag"]: r
        for r in reg["g18_approx_percentile"].spark_fn(spark, sf_dir).collect()
    }
    exact = duck.execute(
        """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        FROM lineitem GROUP BY l_returnflag
        """
    ).fetchall()
    for flag, p50, p95 in exact:
        r = rows[flag]
        assert r["p50_exact"] == p50 and r["p95_exact"] == p95, (flag, r)
        assert r["p50_within_bound"] and r["p95_within_bound"], (flag, r)


def test_scd2_merge_equals_rebuild_random_splits(spark):
    """Property: merge(history(prefix), suffix) == history(all) for EVERY
    timestamp split point of a random change stream (the append-only CDC
    contract, j16's invariant at arbitrary cut positions)."""
    import datetime as dt
    import random

    from pydatalake_gen2_spark.operators.merge import scd2_history, scd2_merge

    rng = random.Random(7)
    rows = [
        (rng.randrange(5), dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), f"v{h}")
        for h in rng.sample(range(200), 40)
    ]
    schema = "k BIGINT, ts TIMESTAMP, v STRING"
    full = scd2_history(
        spark.createDataFrame(rows, schema), ["k"], "ts", ["v"], ["v"]
    )
    want = sorted(map(tuple, full.collect()))
    for cut_h in (50, 100, 150):
        cut = dt.datetime(2024, 1, 1) + dt.timedelta(hours=cut_h)
        early = [r for r in rows if r[1] < cut]
        late = [r for r in rows if r[1] >= cut]
        merged = scd2_merge(
            scd2_history(spark.createDataFrame(early, schema), ["k"], "ts", ["v"], ["v"]),
            spark.createDataFrame(late, schema),
            ["k"], "ts", ["v"], ["v"],
        )
        assert sorted(map(tuple, merged.collect())) == want, f"cut={cut_h}"


def test_line_dedup_matches_bruteforce(spark, sf_dir):
    """Exact equivalence with a straight-line Python reference: global
    first-occurrence (min (doc_id, pos)) keeper over 8-word blocks,
    original-order reassembly, per-doc kept/dropped counts."""
    from pydatalake_gen2_spark.operators.dedup import line_dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = {r.doc_id: r.text for r in d.collect()}
    seen: set[str] = set()
    want = {}
    for doc_id in sorted(docs):
        toks = docs[doc_id].lower().split(" ")
        blocks = [" ".join(toks[i : i + 8]) for i in range(0, len(toks), 8)]
        kept = []
        for b in blocks:
            key = b.lower().strip()
            if key not in seen:
                seen.add(key)
                kept.append(b)
        want[doc_id] = (" ".join(kept), len(kept), len(blocks) - len(kept))
    got = {
        r.doc_id: (r.text_clean, r.n_kept, r.n_dropped)
        for r in line_dedup(d, delim=None, block=8).collect()
    }
    assert got == want


def test_simhash_band_cap_composition(spark, sf_dir):
    """band_max_df=inf reproduces the uncapped output exactly; a small
    cap yields a SUBSET of it (never false pairs), and pairs lost are
    exactly those whose every agreeing band is hot."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    d = spark.table("documents").filter("doc_id < 120")
    full = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_neardup_pairs(d, r=4, exact_recall=True).collect()
    }
    uncapped_via_cap = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_neardup_pairs(d, r=4, band_max_df=10**9).collect()
    }
    assert uncapped_via_cap == full
    # r9: the scale-safe cap is now the DEFAULT (band_max_df=1000); at
    # sub-saturation corpus sizes it must be output-identical to the
    # exact_recall contract — that identity is what lets the registered
    # pairs opt out without a hash change.
    default_form = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_neardup_pairs(d, r=4).collect()
    }
    assert default_form == full
    capped = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_neardup_pairs(d, r=4, band_max_df=5).collect()
    }
    assert capped <= full


def test_simhash_dropped_bands_audit(spark, sf_dir):
    """The cap-observability audit (r9 ADVICE): simhash_dropped_bands
    returns EXACTLY the buckets the cap removes. Empty at the default cap
    on this corpus (so capped == exact there, cross-checked against the
    pair sets); at a tiny cap it is non-empty, every listed occupancy
    exceeds the cap, and the pairs lost by capping are exactly those
    whose EVERY agreeing band is a listed hot bucket."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    d = spark.table("documents").filter("doc_id < 120")
    # default cap: audit says "nothing dropped" <=> outputs identical
    assert dedup.simhash_dropped_bands(d, r=4, band_max_df=1000).count() == 0
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_neardup_pairs(d, r=4, exact_recall=True).collect()
    }
    default_form = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_neardup_pairs(d, r=4).collect()
    }
    assert default_form == exact

    cap = 5
    dropped = dedup.simhash_dropped_bands(d, r=4, band_max_df=cap).collect()
    assert dropped and all(row.occupancy > cap for row in dropped)
    hot = {(row.band, row.val) for row in dropped}
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_neardup_pairs(d, r=4, band_max_df=cap).collect()
    }
    # reconstruct the loss prediction from fingerprints: a pair survives
    # iff at least one agreeing band is NOT hot
    sigs = {row.doc_id: row.simhash for row in dedup.simhash(d).collect()}

    def bands(s):
        out = []
        for i in range(5):
            lo, w = i * 9, (48 - 4 * 9) if i == 4 else 9
            out.append((i, (s >> lo) & ((1 << w) - 1)))
        return out

    predicted = set()
    ids = sorted(sigs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if bin(sigs[a] ^ sigs[b]).count("1") > 4:
                continue
            agreeing = [
                bv for bv, bw in zip(bands(sigs[a]), bands(sigs[b])) if bv == bw
            ]
            if any(bv not in hot for bv in agreeing):
                predicted.add((a, b))
    assert capped == predicted


def test_ewma_matches_numpy_recurrence(spark, sf_dir):
    """ud05 must equal the textbook y_t = 0.7*y_{t-1} + 0.3*x_t
    recurrence exactly (same float64 op order and LITERALS — note
    1.0-0.3 is a DIFFERENT double than the 0.7 literal the operator and
    its recursive-CTE oracle both use), with the ROUND(6) display fence
    applied identically."""
    from pydatalake_gen2_spark.registry import ensure_views, load_all

    ensure_views(spark, sf_dir)
    got = {
        r.event_id: r.ewma
        for r in load_all()["ud05_ewma"].spark_fn(spark, sf_dir).collect()
    }
    rows = (
        spark.table("events")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    import math

    def r6(v: float) -> float:  # half-away-from-zero, like the operator
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5), v) / 1e6

    n = 0
    for evs in by_user.values():
        y = None
        for r in evs:
            y = r.value if y is None else 0.7 * y + 0.3 * r.value
            assert got[r.event_id] == r6(y), r.event_id
            n += 1
    assert n == len(got) > 0


def test_semdedup_matches_bruteforce(spark, sf_dir):
    """semdedup's distributed within-cell contraction must equal a
    single-process brute-force replay: same cell assignment (shared
    codebook), same tau-pairs, same union-find groups, same
    least-central keeper."""
    import numpy as np

    from pydatalake_gen2_spark.operators.dedup import semdedup
    from pydatalake_gen2_spark.operators.similarity import ivf_centroids
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings")
    tau, k = 0.9, 8
    got = {
        r.id: (r.cell, r.grp, r.keep)
        for r in semdedup(emb, n_cells=k, tau=tau).collect()
    }

    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    x = np.array([list(map(float, r.embedding)) for r in rows])
    c = np.asarray(ivf_centroids(emb, k), dtype=float)
    d2 = (x * x).sum(1)[:, None] - 2 * x @ c.T + (c * c).sum(1)[None, :]
    cell = d2.argmin(1)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    n_dup_groups = 0
    for cl in np.unique(cell):
        mem = np.where(cell == cl)[0]
        sim = xn[mem] @ xn[mem].T
        parent = list(range(len(mem)))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                if sim[i, j] >= tau:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        cent_sim = xn[mem] @ cn[cl]
        groups: dict = {}
        for i in range(len(mem)):
            groups.setdefault(find(i), []).append(i)
        for root, members in groups.items():
            if len(members) > 1:
                n_dup_groups += 1
            keeper = min(members, key=lambda i: (cent_sim[i], i))
            for i in members:
                vid = int(ids[mem[i]])
                assert got[vid] == (
                    int(cl), int(ids[mem[root]]), i == keeper
                ), vid
    assert len(got) == len(ids)


def test_er_planted_duplicates_resolved(spark, sf_dir):
    """ER01-ER04: every planted dirty variant must block, match, and
    cluster back to its master, and survivorship must follow the declared
    rules (master name; newest balance; newest NON-NULL segment)."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    reg = load_all()
    n_cust = spark.table("customer").count()
    k7 = [k for k in range(n_cust) if k % 7 == 0]
    k21 = [k for k in range(n_cust) if k % 21 == 0]

    pairs = {
        (r["rec_a"], r["rec_b"])
        for r in reg["er02_fuzzy_matches"].spark_fn(spark, sf_dir).collect()
    }
    for k in k7:
        assert (k * 10, k * 10 + 1) in pairs  # master ~ replacement typo
    for k in k21:
        assert (k * 10, k * 10 + 2) in pairs  # master ~ deletion typo
    # at this scale the name suffixes are collision-free: the match set is
    # EXACTLY the planted pairs (plus the v1~v2 pair inside each triple)
    assert len(pairs) == len(k7) + 2 * len(k21)

    ent = {
        r["rec_id"]: r["entity_id"]
        for r in reg["er03_entity_clusters"].spark_fn(spark, sf_dir).collect()
    }
    for k in k21:  # transitivity: master, v1, v2 in ONE entity
        assert ent[k * 10] == ent[k * 10 + 1] == ent[k * 10 + 2] == k * 10

    golden = {
        r["entity_id"]: r
        for r in reg["er04_golden_record"].spark_fn(spark, sf_dir).collect()
    }
    cust = {
        r["c_custkey"]: r for r in spark.table("customer").collect()
    }
    for k in k7:
        g = golden[k * 10]
        c = cust[k]
        assert g["golden_name"] == c["c_name"]  # master name survives
        base = round(c["c_acctbal"] * 100)
        if k % 21 == 0:
            assert g["n_records"] == 3
            assert g["acct_cents"] == base - 125  # v2 (recency 3) wins
        else:
            assert g["n_records"] == 2
            assert g["acct_cents"] == base + 250  # v1 (recency 2) wins
        # v1's NULL segment never survives; master/v2 both carry the
        # customer's segment, so the golden segment is always that value
        assert g["segment"] == c["c_mktsegment"]


def test_s38_rollup_versions_time_travelable(spark, sf_dir):
    """S38: the materialized rollup keeps BOTH versions — v1 (pre-append)
    must remain readable and smaller-or-equal in every day's tally."""
    reg = load_all()
    reg["s38_incremental_agg_refresh"].spark_fn(spark, sf_dir).collect()

    from pydatalake_gen2_spark.queries.scans import _tmp
    from pydatalake_gen2_spark.sources.versioned import VersionedTable

    agg_vt = VersionedTable(spark, _tmp("s38_agg", sf_dir))
    assert agg_vt.versions() == [1, 2]
    v1 = {r["day"]: r["n_orders"] for r in agg_vt.read(1).collect()}
    v2 = {r["day"]: r["n_orders"] for r in agg_vt.read(2).collect()}
    assert set(v1) <= set(v2)
    assert all(v1[d] <= v2[d] for d in v1)
    assert sum(v2.values()) > sum(v1.values())


def test_sq8_quantization_faithful(spark, sf_dir):
    """LX-SQ8: at this scale int8 quantization of 64-dim unit-ish vectors
    must be nearly lossless — every query's top-10 recall is 1.0 (the
    audit's purpose is to MEASURE this; the property pins the expected
    no-degradation regime so a broken quantizer can't silently pass)."""
    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    rows = load_all()["lx_sq8_recall"].spark_fn(spark, sf_dir).collect()
    assert rows and all(r["recall"] == 1.0 for r in rows)


def test_l83_water_filling_invariants(spark, sf_dir):
    """The cap-aware budget plan must (a) hit the budget EXACTLY,
    (b) never allocate past a source's size, (c) be a true water level:
    every fully-taken source is no larger than every uncapped one's
    allocation + 1 (the remainder unit)."""
    from pydatalake_gen2_spark.registry import REGISTRY, load_all

    load_all()
    rows = REGISTRY["l83_token_budget_mix"].spark_fn(spark, sf_dir).collect()
    total = sum(r["toks"] for r in rows)
    budget = total * 9 // 10
    assert sum(r["alloc_tokens"] for r in rows) == budget
    assert all(r["alloc_tokens"] <= r["toks"] for r in rows)
    full = [r for r in rows if r["fully_taken"]]
    part = [r for r in rows if not r["fully_taken"]]
    if full and part:
        assert max(r["toks"] for r in full) <= min(
            r["alloc_tokens"] for r in part
        ) + 1
    # uncapped allocations are equal up to the remainder unit
    if part:
        allocs = sorted(r["alloc_tokens"] for r in part)
        assert allocs[-1] - allocs[0] <= 1


def test_l84_novelty_bounds_and_unique_doc(spark, sf_dir):
    """novelty_ppm is in [0, 1e6]; n_novel <= n_shingles; and the corpus
    must contain at least one fully-novel document (the fixture's texts
    are near-unique) and nonzero sharing overall (sum novel < sum
    shingles would fail only if every doc were fully unique — allow it,
    but the bounds must hold)."""
    from pydatalake_gen2_spark.registry import REGISTRY, load_all

    load_all()
    rows = REGISTRY["l84_ngram_novelty"].spark_fn(spark, sf_dir).collect()
    assert rows, "no documents with >= 5 tokens?"
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0 <= r["novelty_ppm"] <= 1_000_000
        if r["n_novel"] == r["n_shingles"]:
            assert r["novelty_ppm"] == 1_000_000
    assert any(r["novelty_ppm"] == 1_000_000 for r in rows)


def test_lx_embedding_drift_self_is_identity(spark, sf_dir):
    """Drift of a half against itself must be exactly zero shift and
    cosine 1.0 — recomputed through the same fixed-point machinery the
    pair uses (numpy mirror of the integer means)."""
    import numpy as np

    from pydatalake_gen2_spark.registry import ensure_views

    ensure_views(spark, sf_dir)
    emb = spark.table("embeddings").collect()
    qs = {}
    for half in (0, 1):
        vs = np.stack([
            np.asarray(r["embedding"], dtype=float)
            for r in emb if r["vec_id"] % 2 == half
        ])
        s = np.floor(vs * 1e6 + 0.5).astype(np.int64).sum(axis=0)
        n = vs.shape[0]
        mu = np.where(s >= 0, s // n, -((-s) // n))
        qs[half] = mu.astype(np.int64)
    dot = int((qs[0] * qs[1]).sum())
    na, nb = int((qs[0] ** 2).sum()), int((qs[1] ** 2).sum())
    expect_cos = dot / (np.sqrt(float(na)) * np.sqrt(float(nb)))
    from pydatalake_gen2_spark.registry import REGISTRY, load_all

    load_all()
    row = REGISTRY["lx_embedding_drift"].spark_fn(spark, sf_dir).collect()[0]
    assert row["mean_cosine"] == expect_cos
    assert row["max_shift_micro"] == int(np.abs(qs[0] - qs[1]).max())


def test_lsh_plane_prefix_property():
    """The scale-aware lx_lsh oracle (queries/llm.py:_lx_lsh_duck) embeds
    ONE np_max-plane literal set and selects the first np planes; the
    engine draws exactly n_planes planes. Sound only because numpy's
    RandomState(seed).randn(r, dim) fills row-major from a single stream,
    so a smaller draw is bit-identical to the prefix of a larger one.
    Pin that guarantee for every (seed, plane-count) pair the operator
    can reach, so a numpy behavior change can never silently desync the
    oracle's planes from the engine's."""
    import numpy as np

    from pydatalake_gen2_spark.operators.similarity import _hyperplanes

    for t in range(8):  # the 8 tables' seeds: 42..49
        full = np.array(_hyperplanes(64, 16, 42 + t))
        for n_planes in (6, 9, 10, 13, 16):
            small = np.array(_hyperplanes(64, n_planes, 42 + t))
            assert np.array_equal(small, full[:n_planes])


def test_simhash_cap_sweep_loss_accounting(spark):
    """r10 verdict #8: pin the dq08<->join coupling under a CAP SWEEP at
    sf0.01 (500 docs — the driver's gate scale, where real buckets
    exceed the small caps). For band_max_df in {10, 100, 1000}, the
    audit's dropped-bucket set must account for the pair loss EXACTLY:

    - every reported occupancy exceeds the cap and equals the bucket's
      true occupancy,
    - capped pairs == {exact pairs with >=1 agreeing band NOT dropped}
      (the pigeonhole loss prediction, reconstructed from fingerprints),
    - every lost pair's agreeing-band set is a subset of the dropped
      buckets (the 'meeting bands' direction the sf30 ladder's
      volume accounting used).

    Both sides ride the ONE shared ``_band_split`` (operators/dedup.py),
    so this sweep is the regression fence keeping audit and join from
    drifting apart."""
    import os

    import pytest as _pytest

    from pydatalake_gen2_spark.operators import dedup

    sf01 = os.environ.get("SPARK_GRAFT_CAP_SWEEP_DIR", "/root/testdata/sf0.01")
    if not os.path.isdir(sf01):
        _pytest.skip(f"sf0.01 fixture dir {sf01} absent")
    d = spark.read.parquet(f"{sf01}/documents.parquet")
    sigs = {row.doc_id: row.simhash for row in dedup.simhash(d).collect()}
    bits, radius, n_bands, width = 48, 4, 5, 9

    def bands(s):
        return [
            (i, (s >> (i * width))
                & ((1 << (bits - i * width if i == n_bands - 1 else width)) - 1))
            for i in range(n_bands)
        ]

    # true bucket occupancy from the fingerprints (independent tally)
    occ: dict[tuple[int, int], int] = {}
    for s in sigs.values():
        for bv in bands(s):
            occ[bv] = occ.get(bv, 0) + 1
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_neardup_pairs(d, r=radius, exact_recall=True).collect()
    }
    for cap in (10, 100, 1000):
        dropped = dedup.simhash_dropped_bands(d, r=radius, band_max_df=cap).collect()
        hot = {(row.band, row.val) for row in dropped}
        assert all(row.occupancy > cap for row in dropped)
        assert all(occ[(row.band, row.val)] == row.occupancy for row in dropped)
        # the audit reports EVERY over-cap bucket, not a sample
        assert hot == {bv for bv, c in occ.items() if c > cap}
        capped = {
            (r.id_a, r.id_b)
            for r in dedup.simhash_neardup_pairs(d, r=radius, band_max_df=cap).collect()
        }
        assert capped <= exact
        predicted, n_lost = set(), 0
        for a, b in exact:
            agreeing = {
                bva
                for bva, bvb in zip(bands(sigs[a]), bands(sigs[b]))
                if bva == bvb
            }
            if agreeing - hot:
                predicted.add((a, b))
            else:
                n_lost += 1  # every agreeing band dropped -> pair lost
        assert capped == predicted
        assert len(exact) - len(capped) == n_lost  # loss fully accounted
        if not hot:
            assert capped == exact
