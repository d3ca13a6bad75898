"""Iterative graph operators beyond dedup's connected components.

Engine parity note: the reference (client.py) has no graph surface; these
extend the declared engine layer the same way the L* pipeline ops do
(SURVEY.md 2B.14+). All loops follow the plan-truncating checkpoint
discipline established by operators/dedup.connected_components: each
round's state materializes through util.checkpoint_truncate so the
analyzed plan stays constant-size, superseded rounds' blocks are freed
immediately, and the final state's lifecycle belongs to the caller via
util.release_persisted().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """The k-core of an undirected graph: the (unique) maximal subgraph
    in which every node has degree >= k — the standard "dense kernel"
    extractor (community seeds, spam-ring detection, backbone pruning
    one step past GR02's edge thresholding).

    Algorithm: iterative peeling. Each round computes degrees (one
    partial-agg shuffle), keeps nodes with degree >= k, and semi-joins
    the edge list down to edges whose BOTH endpoints survive; the loop
    stops when the edge count reaches a fixpoint. Peeling removes at
    least one node per non-final round, so rounds are bounded by the
    peel depth (the graph's degeneracy ordering length) — small in
    practice; ``max_iter`` is a backstop that RAISES rather than
    returning a non-fixpoint.

    State is one (src, dst) edge frame, checkpoint-truncated per round
    (see module docstring). Output: (node BIGINT, core_degree BIGINT) —
    every node in the k-core with its within-core degree.
    """
    from pydatalake_gen2_spark.operators.util import (
        checkpoint_truncate,
        release_checkpoint,
        track,
    )

    e = edges.select(
        F.col(src_col).cast("bigint").alias("s"),
        F.col(dst_col).cast("bigint").alias("d"),
    )
    alive = checkpoint_truncate(
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    )
    converged = False
    try:
        prev = alive.count()
        for _ in range(max_iter):
            keep = (
                alive.groupBy("s")
                .agg(F.count(F.lit(1)).alias("deg"))
                .filter(F.col("deg") >= k)
                .select(F.col("s").alias("n"))
            )
            new_alive = checkpoint_truncate(
                alive.join(keep, alive.s == keep.n, "left_semi").join(
                    keep.withColumnRenamed("n", "m"),
                    F.col("d") == F.col("m"),
                    "left_semi",
                )
            )
            try:
                cur = new_alive.count()
            except Exception:
                release_checkpoint(new_alive)  # the round that won't be adopted
                raise
            release_checkpoint(alive)
            alive = new_alive
            if cur == prev:
                converged = True
                break
            prev = cur
    except Exception:
        # job failure mid-loop: free the live round's blocks (VERDICT-style
        # leak otherwise — a failing sweep would accumulate dead state)
        release_checkpoint(alive)
        raise
    if not converged:
        release_checkpoint(alive)
        raise RuntimeError(f"k_core did not reach a fixpoint within {max_iter} rounds")
    track(alive)
    return alive.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    seed_col: str = "node",
    max_iter: int = 50,
) -> DataFrame:
    """Multi-source BFS over an undirected graph: hop distance from the
    nearest seed, for every reachable node (unreached nodes are absent).
    The frontier pattern behind impact analysis ("what is within k hops
    of these flagged suppliers/documents"), label spreading, and
    lineage-radius queries.

    Algorithm: distance relaxation to fixpoint — each round every node
    takes min(own dist, neighbor dist + 1); convergence when the
    (count, sum(dist)) signature stops changing (distances only ever
    decrease, so the signature is a monotone certificate). Rounds are
    bounded by the graph's seed-eccentricity (diameter in the worst
    case) — NOT log-compressed like connected components' pointer
    doubling, because path LENGTH is the answer, so shortcuts would
    change the result. State is one (node, dist) row per reached node,
    checkpoint-truncated per round (see module docstring); each round
    is one equi-join + one partial-agg min.
    """
    from pydatalake_gen2_spark.operators.util import (
        checkpoint_truncate,
        release_checkpoint,
        track,
    )

    e = edges.select(
        F.col(src_col).cast("bigint").alias("s"),
        F.col(dst_col).cast("bigint").alias("d"),
    )
    sym = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .persist()
    )
    dist = None
    converged = False
    try:
        dist = checkpoint_truncate(
            seeds.select(F.col(seed_col).cast("bigint").alias("node"))
            .distinct()
            .withColumn("dist", F.lit(0))
        )
        prev = dist.agg(F.count(F.lit(1)), F.coalesce(F.sum("dist"), F.lit(0))).first()
        for _ in range(max_iter):
            relax = sym.join(dist, sym.s == dist.node).select(
                F.col("d").alias("node"), (F.col("dist") + 1).alias("dist")
            )
            new_dist = checkpoint_truncate(
                dist.select("node", "dist")
                .union(relax)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
            try:
                cur = new_dist.agg(
                    F.count(F.lit(1)), F.coalesce(F.sum("dist"), F.lit(0))
                ).first()
            except Exception:
                release_checkpoint(new_dist)  # the round that won't be adopted
                raise
            release_checkpoint(dist)
            dist = new_dist
            if tuple(cur) == tuple(prev):
                converged = True
                break
            prev = cur
    except Exception:
        if dist is not None:
            release_checkpoint(dist)  # free the live round on job failure
        raise
    finally:
        sym.unpersist()
    if not converged:
        release_checkpoint(dist)
        raise RuntimeError(f"bfs_distances did not converge within {max_iter} rounds")
    track(dist)
    return dist.select("node", F.col("dist").cast("bigint").alias("dist"))


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007), run for a FIXED number of rounds: every node starts labeled
    with its own id; each round it adopts the most frequent label among
    its neighbours (ties → smallest label), all nodes updating from the
    SAME previous-round snapshot.

    Fixed rounds — not run-to-convergence — because synchronous LPA can
    oscillate on bipartite structures; a fixed budget makes the result a
    deterministic pure function of the graph, which is what a
    cross-engine oracle can certify (production runs add a stop-when-
    stable check on top of the same recurrence). Each round is one
    join + one partial-agg count + one per-node argmax — the same
    shuffle class as a PageRank round; state is one (node, label) row
    per node, checkpoint-truncated per round (see module docstring).

    Output: (node BIGINT, label BIGINT) — label = community id.
    """
    from pydatalake_gen2_spark.operators.util import (
        checkpoint_truncate,
        release_checkpoint,
        track,
    )

    e = edges.select(
        F.col(src_col).cast("bigint").alias("s"),
        F.col(dst_col).cast("bigint").alias("d"),
    )
    # persist (not checkpoint): a static recomputable plan — executor loss
    # mid-loop recomputes it instead of failing the job (same choice as
    # bfs_distances' `sym`)
    und = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .persist()
    )
    labels = None
    try:
        labels = checkpoint_truncate(
            und.select(F.col("s").alias("node")).distinct()
            .select("node", F.col("node").alias("label"))
        )
        for _ in range(rounds):
            votes = (
                und.join(labels, und.d == labels.node)
                .select(F.col("s").alias("n"), "label")
                .groupBy("n", "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            # argmax by (cnt DESC, label ASC): min of (-cnt, label) struct
            new_labels = checkpoint_truncate(
                votes.groupBy("n")
                .agg(F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label"))).alias("m"))
                .select(F.col("n").alias("node"), F.col("m.label").alias("label"))
            )
            release_checkpoint(labels)
            labels = new_labels
    except Exception:
        if labels is not None:
            release_checkpoint(labels)
        raise
    finally:
        und.unpersist()
    return track(labels)


def landmark_distances(
    edges: DataFrame,
    landmarks: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    lm_col: str = "node",
    max_iter: int = 50,
) -> DataFrame:
    """Per-landmark BFS distances over an undirected graph: one
    (node, lm, dist) row for every (reachable node, landmark) pair —
    bfs_distances with SOURCE TRACKING, i.e. |landmarks| simultaneous
    BFS waves sharing each round's single join + partial-agg min on the
    compound (node, lm) key. The backbone of landmark-based centrality
    and distance-oracle sketches (Potamias et al. 2009): exact APSP is
    quadratic state, but a bounded landmark set (16-64 in practice)
    keeps state at |V|·|L| rows while preserving distance structure.
    Same fixpoint/convergence machinery as bfs_distances (monotone
    (count, sum) certificate, per-round checkpoint truncation).
    """
    from pydatalake_gen2_spark.operators.util import (
        checkpoint_truncate,
        release_checkpoint,
        track,
    )

    e = edges.select(
        F.col(src_col).cast("bigint").alias("s"),
        F.col(dst_col).cast("bigint").alias("d"),
    )
    sym = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .persist()
    )
    dist = None
    converged = False
    try:
        dist = checkpoint_truncate(
            landmarks.select(F.col(lm_col).cast("bigint").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("lm"), F.lit(0).alias("dist"))
        )
        prev = dist.agg(F.count(F.lit(1)), F.coalesce(F.sum("dist"), F.lit(0))).first()
        for _ in range(max_iter):
            relax = sym.join(dist, sym.s == dist.node).select(
                F.col("d").alias("node"), "lm", (F.col("dist") + 1).alias("dist")
            )
            new_dist = checkpoint_truncate(
                dist.select("node", "lm", "dist")
                .union(relax)
                .groupBy("node", "lm")
                .agg(F.min("dist").alias("dist"))
            )
            try:
                cur = new_dist.agg(
                    F.count(F.lit(1)), F.coalesce(F.sum("dist"), F.lit(0))
                ).first()
            except Exception:
                release_checkpoint(new_dist)
                raise
            release_checkpoint(dist)
            dist = new_dist
            if tuple(cur) == tuple(prev):
                converged = True
                break
            prev = cur
    except Exception:
        if dist is not None:
            release_checkpoint(dist)
        raise
    finally:
        sym.unpersist()
    if not converged:
        release_checkpoint(dist)
        raise RuntimeError(
            f"landmark_distances did not converge within {max_iter} rounds"
        )
    track(dist)
    return dist.select("node", "lm", F.col("dist").cast("bigint").alias("dist"))
