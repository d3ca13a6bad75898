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

    Algorithm: BFS by levels. Unit-weight BFS settles a node the round it
    is first reached, so each round relaxes only the FRONTIER (last
    round's new nodes) against the edges, and a candidate reached from a
    depth-(r-1) node has true depth in {r-2, r-1, r} — anti-joining
    candidates against the last TWO levels is exact (r12, same frontier
    rewrite as landmark_distances; the old form joined and re-checkpointed
    the full settled table every round). Rounds are bounded by the
    graph's seed-eccentricity — NOT log-compressed like connected
    components' pointer doubling, because path LENGTH is the answer, so
    shortcuts would change the result. State totals one (node, dist) row
    per reached node across all level checkpoints; convergence = empty
    frontier, read from the job that materializes the level (lazy
    checkpoint + full count — one driver job per round).
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
    levels: list[DataFrame] = []  # levels[r] = nodes first reached at depth r
    converged = False
    try:
        levels.append(
            checkpoint_truncate(
                seeds.select(F.col(seed_col).cast("bigint").alias("node"))
                .distinct()
                .withColumn("dist", F.lit(0))
            )
        )
        for _ in range(max_iter):
            frontier = levels[-1]
            relax = sym.join(frontier, sym.s == frontier.node).select(
                F.col("d").alias("node"), (F.col("dist") + 1).alias("dist")
            )
            seen = levels[-1].select("node")
            if len(levels) >= 2:
                seen = seen.union(levels[-2].select("node"))
            new_level = checkpoint_truncate(
                relax.dropDuplicates(["node"]).join(
                    seen, on=["node"], how="left_anti"
                ),
                eager=False,
            )
            try:
                n_new = new_level.count()
            except Exception:
                release_checkpoint(new_level)  # the round that won't be adopted
                raise
            if n_new == 0:
                release_checkpoint(new_level)
                converged = True
                break
            levels.append(new_level)
    except Exception:
        for lv in levels:
            release_checkpoint(lv)  # free live rounds on job failure
        raise
    finally:
        sym.unpersist()
    if not converged:
        for lv in levels:
            release_checkpoint(lv)
        raise RuntimeError(f"bfs_distances did not converge within {max_iter} rounds")
    dist = levels[0]
    for lv in levels[1:]:
        dist = dist.union(lv)
    for lv in levels:
        track(lv)
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
    BFS waves sharing each round's single join + dedup on the compound
    (node, lm) key. The backbone of landmark-based centrality and
    distance-oracle sketches (Potamias et al. 2009): exact APSP is
    quadratic state, but a bounded landmark set (16-64 in practice)
    keeps state at |V|·|L| rows while preserving distance structure.

    r12 (VERDICT r11 #5; guide §2.3 shuffle fewer bytes): FRONTIER-ONLY
    relaxation. The old form joined the FULL settled table with the edge
    list every round and re-aggregated + re-checkpointed all |V|·|L|
    rows per round — Σ_r |settled_r| checkpoint writes and join shuffles
    (~quadratic in depth; gr11's 198.7 s at sf10 was this). Unit-weight
    BFS settles a pair the round it is first reached, so only the rows
    DISCOVERED last round can relax anything new, and a candidate
    reached from a depth-(r-1) node has true depth in {r-2, r-1, r}:
    anti-joining candidates against just the LAST TWO levels (never the
    whole settled set) is exact. Per round this joins |frontier| rows
    with the edges, checkpoints only the new level, and the total
    materialized volume across the whole run is exactly |V|·|L| rows.
    Convergence = empty frontier, read from the SAME job that
    materializes the level (lazy checkpoint + full count — one driver
    job per round, the same fusion as connected_components).
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
    levels: list[DataFrame] = []  # levels[r] = pairs first reached at depth r
    converged = False
    try:
        levels.append(
            checkpoint_truncate(
                landmarks.select(F.col(lm_col).cast("bigint").alias("node"))
                .distinct()
                .select(
                    "node", F.col("node").alias("lm"), F.lit(0).alias("dist")
                )
            )
        )
        for _ in range(max_iter):
            frontier = levels[-1]
            relax = sym.join(frontier, sym.s == frontier.node).select(
                F.col("d").alias("node"), "lm", (F.col("dist") + 1).alias("dist")
            )
            # Candidates of depth r can only collide with pairs settled at
            # depths r-1 / r-2 (an earlier-settled neighbour would have
            # pulled the frontier node below depth r-1) — anti-join against
            # those two levels only. dropDuplicates first: multiple paths
            # produce identical rows, and keying its exchange on (node, lm)
            # lets the anti-join reuse the partitioning.
            seen = levels[-1].select("node", "lm")
            if len(levels) >= 2:
                seen = seen.union(levels[-2].select("node", "lm"))
            new_level = checkpoint_truncate(
                relax.dropDuplicates(["node", "lm"]).join(
                    seen, on=["node", "lm"], how="left_anti"
                ),
                eager=False,
            )
            try:
                # ONE job: materializes every partition of the lazy
                # checkpoint AND yields the empty-frontier certificate.
                n_new = new_level.count()
            except Exception:
                release_checkpoint(new_level)
                raise
            if n_new == 0:
                release_checkpoint(new_level)
                converged = True
                break
            levels.append(new_level)
    except Exception:
        for lv in levels:
            release_checkpoint(lv)
        raise
    finally:
        sym.unpersist()
    if not converged:
        for lv in levels:
            release_checkpoint(lv)
        raise RuntimeError(
            f"landmark_distances did not converge within {max_iter} rounds"
        )
    dist = levels[0]
    for lv in levels[1:]:
        dist = dist.union(lv)
    for lv in levels:
        track(lv)
    return dist.select("node", "lm", F.col("dist").cast("bigint").alias("dist"))
