"""Entity-resolution / record-linkage family (ER01-ER04) — SURVEY §2B.21.

The classic MDM pipeline the reference's users run OUTSIDE the lake today,
re-expressed as four auditable stages over a deterministic "dirty CRM"
built by planting duplicate customer records from c_custkey arithmetic in
BOTH dialects (the L54/F56 planting pattern — no fixture files, and any
drift in blocking keys, edit-distance, clustering, or survivorship breaks
the hash):

    ER01  blocking audit       — candidate generation stats vs the n²/2
                                 cross product (the scale argument itself)
    ER02  fuzzy match          — blocked self-join + levenshtein verify
    ER03  entity clusters      — match graph → connected components
    ER04  golden record        — per-entity survivorship merge

Scale shape: blocking is ONE equi-join on (nationkey, name-suffix) — the
all-pairs O(n²) comparison never exists; candidate volume is sum of
block-size² which the ER01 audit measures. Verification (levenshtein) is
a JVM builtin on the tiny candidate set. Clustering is the same O(log d)
min-label-propagation used for dedup clusters (operators/dedup.py). The
golden-record merge is one partial-agg groupBy with arg-min/arg-max
survivorship rules — all shapes that hold at 10⁹ records.

Dirty-CRM construction (identical in both dialects):
  - every customer row becomes a 'master' record (rec_id = custkey*10),
  - custkey % 7 == 0 gains an 'import' variant with a 1-char REPLACEMENT
    typo at position 10, a NULL segment and a +250-cent balance drift,
  - custkey % 21 == 0 gains a second variant with a 1-char DELETION at
    position 13 and a -125-cent drift.
  Blocking on (nationkey, right(name, 4)) survives both typo positions
  by construction; levenshtein ≤ 2 verifies candidates. Synthetic
  customer names differing in one key digit can also legitimately block
  together and match — deterministic in both engines, and exactly the
  false-positive behavior a real ER threshold review would surface.

Reference parity: the reference (client.py) has no relational surface;
this family exceeds it per the LLM-pipeline mandate (training-data
curation needs entity dedup for PII subject resolution — see S36).
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pydatalake_gen2_spark.operators import dedup
from pydatalake_gen2_spark.registry import register

_BIG = 10**12

# -- shared dirty-CRM builders (dialect-parallel) ---------------------------

_CRM_DUCK = """
    crm AS (
      SELECT c_custkey*10 AS rec_id, c_name AS name,
             CAST(c_nationkey AS INT) AS nationkey,
             CAST(round(c_acctbal*100) AS BIGINT) AS acct_cents,
             c_mktsegment AS segment, 'master' AS src, 1 AS recency
      FROM customer
      UNION ALL
      SELECT c_custkey*10+1,
             substring(c_name, 1, 9) || 'X' || substring(c_name, 11),
             CAST(c_nationkey AS INT),
             CAST(round(c_acctbal*100) AS BIGINT) + 250,
             NULL, 'import', 2
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey*10+2,
             substring(c_name, 1, 12) || substring(c_name, 14),
             CAST(c_nationkey AS INT),
             CAST(round(c_acctbal*100) AS BIGINT) - 125,
             c_mktsegment, 'import', 3
      FROM customer WHERE c_custkey % 21 = 0
    )"""

_CAND_DUCK = (
    _CRM_DUCK
    + """,
    blk AS (SELECT rec_id, name, nationkey, right(name, 4) AS sfx FROM crm),
    cand AS (
      SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
             a.name AS name_a, b.name AS name_b, a.nationkey
      FROM blk a JOIN blk b
        ON a.nationkey = b.nationkey AND a.sfx = b.sfx
       AND a.rec_id < b.rec_id)"""
)

_MATCH_DUCK = (
    _CAND_DUCK
    + """,
    m AS (SELECT rec_a, rec_b FROM cand
          WHERE levenshtein(name_a, name_b) <= 2),
    e AS (SELECT rec_a AS s, rec_b AS d FROM m
          UNION SELECT rec_b, rec_a FROM m),
    reach(id, r) AS (
      SELECT s, s FROM e
      UNION SELECT s, d FROM e
      UNION SELECT reach.id, e.d FROM reach JOIN e ON reach.r = e.s),
    comp AS (SELECT id, MIN(r) AS ent FROM reach GROUP BY id),
    asg AS (
      SELECT crm.*, CAST(COALESCE(comp.ent, crm.rec_id) AS BIGINT) AS entity_id
      FROM crm LEFT JOIN comp ON crm.rec_id = comp.id)"""
)


def _crm(spark: SparkSession) -> DataFrame:
    # Single-scan generator form (r11 optimization): the old
    # master/v1/v2 3-way union read the customer scan THREE times per
    # _crm consumer (_assignment consumes _crm twice -> six scans per
    # er03 run). One scan now emits 1-3 records per customer row via
    # inline(array_compact(...)) — row-local, no shuffle, and the
    # variant predicates (%7, %21) become struct-null guards instead of
    # scan filters. Row multiset verified identical (exceptAll == 0 both
    # directions at sf0.1); er01-er06 all ride it. At 100 TB this is
    # input I/O x1 instead of x3 per consumer.
    c = spark.table("customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    nat = F.col("c_nationkey").cast("int")

    def rec(rid, name, cents_e, seg, src, recency):
        return F.struct(
            rid.alias("rec_id"),
            name.alias("name"),
            nat.alias("nationkey"),
            cents_e.alias("acct_cents"),
            seg.alias("segment"),
            F.lit(src).alias("src"),
            F.lit(recency).cast("int").alias("recency"),
        )

    master = rec(
        (F.col("c_custkey") * 10).cast("long"),
        F.col("c_name"),
        cents,
        F.col("c_mktsegment"),
        "master",
        1,
    )
    v1 = F.when(
        F.col("c_custkey") % 7 == 0,
        rec(
            (F.col("c_custkey") * 10 + 1).cast("long"),
            F.concat(
                F.substring("c_name", 1, 9),
                F.lit("X"),
                F.expr("substring(c_name, 11)"),
            ),
            cents + 250,
            F.lit(None).cast("string"),
            "import",
            2,
        ),
    )
    v2 = F.when(
        F.col("c_custkey") % 21 == 0,
        rec(
            (F.col("c_custkey") * 10 + 2).cast("long"),
            F.concat(
                F.substring("c_name", 1, 12), F.expr("substring(c_name, 14)")
            ),
            cents - 125,
            F.col("c_mktsegment"),
            "import",
            3,
        ),
    )
    return c.select(F.inline(F.array_compact(F.array(master, v1, v2))))


def _candidates(spark: SparkSession) -> DataFrame:
    """Blocked candidate pairs: equi-join on (nationkey, right(name,4)),
    rec_id-ordered so each unordered pair appears once. This join — not
    an all-pairs comparison — is the entire candidate-generation cost."""
    blk = _crm(spark).select(
        "rec_id", "name", "nationkey", F.expr("right(name, 4)").alias("sfx")
    )
    a = blk.alias("a")
    b = blk.alias("b")
    return a.join(
        b,
        (F.col("a.nationkey") == F.col("b.nationkey"))
        & (F.col("a.sfx") == F.col("b.sfx"))
        & (F.col("a.rec_id") < F.col("b.rec_id")),
    ).select(
        F.col("a.rec_id").alias("rec_a"),
        F.col("b.rec_id").alias("rec_b"),
        F.col("a.name").alias("name_a"),
        F.col("b.name").alias("name_b"),
        F.col("a.nationkey").alias("nationkey"),
    )


def _matches(spark: SparkSession) -> DataFrame:
    return _candidates(spark).filter(
        F.levenshtein("name_a", "name_b") <= 2
    )


def _assignment(spark: SparkSession) -> DataFrame:
    """(every CRM record) → entity_id: component min-label for matched
    records, own rec_id for singletons.

    EXACT-DUP COLLAPSE FIRST (the large-scale ER discipline, and the
    round-8 sf10-ladder fix): records sharing (nationkey, name) are
    collapsed to one representative (min rec_id) with a hash aggregate,
    the blocked fuzzy match + connected components run over
    REPRESENTATIVES only, and labels broadcast back to every record.
    Output-invariant because the match predicate — same block AND
    levenshtein(name) <= 2 — is a function of (nationkey, name) only:
    (a) an exact group is a clique (distance 0), so it is one component;
    (b) cross-group edges hold for all members iff they hold for the
    representatives, so full-graph components are exactly the preimages
    of the quotient-graph components; (c) labels agree because the rep
    is its group's min rec_id, so the component min over reps equals the
    min over all member records. Hash-verified unchanged at oracle
    scales (where groups are singletons and the quotient is trivial).
    Why it matters: duplicate-heavy corpora make raw blocked candidates
    grow as (copies per entity)^2 — measured n_blocks frozen at 14,803
    while candidates went 1.0M -> 9.6M -> 108.5M across sf1/sf3/sf10 —
    while unique (nationkey, name) stays ~constant, so the fuzzy join
    cost is now O(uniques^2 / blocks) + one linear expansion join."""
    crm = _crm(spark)
    reps = crm.groupBy("nationkey", "name").agg(F.min("rec_id").alias("rec_id"))
    blk = reps.select(
        "rec_id", "name", "nationkey", F.expr("right(name, 4)").alias("sfx")
    )
    a, b = blk.alias("a"), blk.alias("b")
    rep_matches = (
        a.join(
            b,
            (F.col("a.nationkey") == F.col("b.nationkey"))
            & (F.col("a.sfx") == F.col("b.sfx"))
            & (F.col("a.rec_id") < F.col("b.rec_id")),
        )
        .filter(F.levenshtein(F.col("a.name"), F.col("b.name")) <= 2)
        .select(F.col("a.rec_id").alias("rec_a"), F.col("b.rec_id").alias("rec_b"))
    )
    comp = dedup.connected_components(rep_matches, "rec_a", "rec_b")
    rep_label = (
        reps.join(comp, F.col("rec_id") == F.col("id"), "left")
        .select(
            "nationkey",
            "name",
            F.coalesce(F.col("component"), F.col("rec_id"))
            .cast("bigint")
            .alias("_ent"),
        )
    )
    # no broadcast hint: rep_label is tiny here (uniques ~ entity count),
    # and the planner/AQE already broadcasts it; at a corpus where the
    # unique-entity table itself is huge, the shuffle join is correct
    return (
        crm.join(rep_label, ["nationkey", "name"])
        .withColumn("entity_id", F.col("_ent"))
        .drop("_ent")
    )


# -- ER01 -------------------------------------------------------------------


@register(
    "er01_blocking_audit",
    duck_sql="WITH "
    + _CRM_DUCK
    + """,
    blk AS (SELECT nationkey, right(name, 4) AS sfx FROM crm),
    g AS (SELECT nationkey, sfx, COUNT(*) AS k FROM blk GROUP BY 1, 2),
    t AS (SELECT CAST(SUM(k) AS BIGINT) AS n_records,
                 CAST(COUNT(*) AS BIGINT) AS n_blocks,
                 CAST(MAX(k) AS BIGINT) AS max_block,
                 CAST(SUM(k*(k-1)//2) AS BIGINT) AS n_candidates
          FROM g)
    SELECT n_records, n_blocks, max_block, n_candidates,
           CAST(n_records*(n_records-1)//2 AS BIGINT) AS n_cross_pairs,
           ROUND(CAST(n_candidates AS DOUBLE)
                 / (n_records*(n_records-1)//2), 8) AS candidate_fraction
    FROM t
    """,
)
def er01_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER01: blocking-quality audit — block count, max block size, and
    candidate-pair volume vs the n(n-1)/2 cross product. THE pre-flight
    number for record linkage at scale: candidate_fraction is the factor
    by which blocking shrank the comparison space (and max_block is the
    skew hazard — one giant block is the ER equivalent of a hot join
    key). Pure integer tallies from one groupBy; k*(k-1)/2 stays exact
    (consecutive integers, // division)."""
    g = (
        _crm(spark)
        .select("nationkey", F.expr("right(name, 4)").alias("sfx"))
        .groupBy("nationkey", "sfx")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    t = g.agg(
        F.sum("k").cast("bigint").alias("n_records"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.max("k").cast("bigint").alias("max_block"),
        F.sum(F.expr("k * (k - 1) div 2")).cast("bigint").alias("n_candidates"),
    )
    cross = F.expr("n_records * (n_records - 1) div 2").cast("bigint")
    return t.select(
        "n_records",
        "n_blocks",
        "max_block",
        "n_candidates",
        cross.alias("n_cross_pairs"),
        F.round(
            F.col("n_candidates").cast("double") / cross.cast("double"), 8
        ).alias("candidate_fraction"),
    )


# -- ER02 -------------------------------------------------------------------


@register(
    "er02_fuzzy_matches",
    duck_sql="WITH "
    + _CAND_DUCK
    + """
    SELECT rec_a, rec_b, CAST(levenshtein(name_a, name_b) AS INT) AS lev,
           CAST(nationkey AS INT) AS nationkey
    FROM cand WHERE levenshtein(name_a, name_b) <= 2
    ORDER BY rec_a, rec_b
    """,
)
def er02_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER02: fuzzy record linkage — blocked candidates verified with
    levenshtein(name) ≤ 2 (a JVM builtin: the verify step costs one
    codegen'd expression per candidate, no Python). Output is the match
    pair set with edit distances; the planted REPLACEMENT (pos 10) and
    DELETION (pos 13) variants both land at distance 1. The blocking
    equi-join is the only shuffle; at 10⁹ records the candidate set —
    not n² — is what flows into verification (ER01 measures exactly how
    much smaller it is)."""
    return (
        _matches(spark)
        .select(
            "rec_a",
            "rec_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("lev"),
            F.col("nationkey").cast("int").alias("nationkey"),
        )
        .orderBy("rec_a", "rec_b")
    )


# -- ER03 -------------------------------------------------------------------


@register(
    "er03_entity_clusters",
    duck_sql="WITH RECURSIVE "
    + _MATCH_DUCK
    + """
    SELECT rec_id, entity_id FROM asg ORDER BY rec_id
    """,
)
def er03_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER03: match graph → entity ids — connected components (the same
    O(log diameter) min-label propagation as L11's dedup clusters:
    operators/dedup.py:340) over the ER02 pair set, then every CRM
    record gets its component label (singletons keep their own rec_id).
    Transitivity is the point: A~B and B~C must merge into ONE entity
    even when A!~C directly. Oracle: DuckDB recursive-CTE transitive
    closure over the identical match edges."""
    return _assignment(spark).select("rec_id", "entity_id").orderBy("rec_id")


# -- ER04 -------------------------------------------------------------------


@register(
    "er04_golden_record",
    duck_sql="WITH RECURSIVE "
    + _MATCH_DUCK
    + f"""
    SELECT entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           arg_min(name, CASE WHEN src = 'master' THEN rec_id
                              ELSE rec_id + {_BIG} END) AS golden_name,
           CAST(MIN(nationkey) AS INT) AS nationkey,
           CAST(arg_max(acct_cents, recency*{_BIG} + rec_id) AS BIGINT)
             AS acct_cents,
           arg_max(segment, CASE WHEN segment IS NOT NULL
                                 THEN recency*{_BIG} + rec_id END) AS segment
    FROM asg
    GROUP BY entity_id HAVING COUNT(*) > 1
    ORDER BY entity_id
    """,
)
def er04_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER04: survivorship merge — one golden record per multi-record
    entity: name from the master record (arg-min over a src-then-rec_id
    key), balance from the NEWEST record (arg-max over recency), segment
    from the newest NON-NULL record (null-guarded ordering key — both
    engines skip null ordering keys, which is the portable idiom; DuckDB's
    arg_max additionally skips null VALUES where Spark's max_by does not,
    so nullable columns always go through the guarded-key form). One
    partial-agg groupBy over the assignment — the merge costs one shuffle
    on entity_id regardless of corpus size."""
    ordk = F.col("recency").cast("bigint") * _BIG + F.col("rec_id")
    golden_ord = F.when(F.col("src") == "master", F.col("rec_id")).otherwise(
        F.col("rec_id") + _BIG
    )
    return (
        _assignment(spark)
        .groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_records"),
            F.min_by("name", golden_ord).alias("golden_name"),
            F.min("nationkey").cast("int").alias("nationkey"),
            F.max_by("acct_cents", ordk).cast("bigint").alias("acct_cents"),
            F.max_by(
                "segment", F.when(F.col("segment").isNotNull(), ordk)
            ).alias("segment"),
        )
        .filter(F.col("n_records") > 1)
        .orderBy("entity_id")
    )


# -- ER05 -------------------------------------------------------------------

_FEAT_DUCK = (
    _CRM_DUCK
    + """,
    blk AS (SELECT rec_id, name, nationkey, right(name, 4) AS sfx,
                   segment, acct_cents FROM crm),
    cand AS (
      SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
             a.name AS name_a, b.name AS name_b,
             a.segment AS seg_a, b.segment AS seg_b,
             a.acct_cents AS cents_a, b.acct_cents AS cents_b
      FROM blk a JOIN blk b
        ON a.nationkey = b.nationkey AND a.sfx = b.sfx
       AND a.rec_id < b.rec_id),
    feat AS (
      SELECT rec_a, rec_b,
             CAST(CASE WHEN levenshtein(name_a, name_b) <= 2
                       THEN 1 ELSE 0 END AS INT) AS f_name,
             CAST(CASE WHEN seg_a IS NOT NULL AND seg_b IS NOT NULL
                        AND seg_a = seg_b THEN 1 ELSE 0 END AS INT) AS f_seg,
             CAST(CASE WHEN abs(cents_a - cents_b) <= 500
                       THEN 1 ELSE 0 END AS INT) AS f_bal,
             CAST(CASE WHEN CAST(floor(rec_a / 10.0) AS BIGINT)
                          = CAST(floor(rec_b / 10.0) AS BIGINT)
                       THEN 1 ELSE 0 END AS INT) AS truth
      FROM cand),
    est AS (
      SELECT
        (CAST(sum(CASE WHEN truth = 1 THEN f_name ELSE 0 END) AS DOUBLE)
          + 0.5) / (CAST(sum(truth) AS DOUBLE) + 1.0) AS m_name,
        (CAST(sum(CASE WHEN truth = 0 THEN f_name ELSE 0 END) AS DOUBLE)
          + 0.5) / (CAST(sum(1 - truth) AS DOUBLE) + 1.0) AS u_name,
        (CAST(sum(CASE WHEN truth = 1 THEN f_seg ELSE 0 END) AS DOUBLE)
          + 0.5) / (CAST(sum(truth) AS DOUBLE) + 1.0) AS m_seg,
        (CAST(sum(CASE WHEN truth = 0 THEN f_seg ELSE 0 END) AS DOUBLE)
          + 0.5) / (CAST(sum(1 - truth) AS DOUBLE) + 1.0) AS u_seg,
        (CAST(sum(CASE WHEN truth = 1 THEN f_bal ELSE 0 END) AS DOUBLE)
          + 0.5) / (CAST(sum(truth) AS DOUBLE) + 1.0) AS m_bal,
        (CAST(sum(CASE WHEN truth = 0 THEN f_bal ELSE 0 END) AS DOUBLE)
          + 0.5) / (CAST(sum(1 - truth) AS DOUBLE) + 1.0) AS u_bal
      FROM feat)"""
)


@register(
    "er05_fs_scoring",
    duck_sql="WITH "
    + _FEAT_DUCK
    + """
    SELECT rec_a, rec_b, f_name, f_seg, f_bal,
           CAST(truth AS BOOLEAN) AS same_entity_truth,
           ROUND(
             ROUND(CASE WHEN f_name = 1 THEN LN(m_name / u_name)
                        ELSE LN((1 - m_name) / (1 - u_name)) END, 8)
             + ROUND(CASE WHEN f_seg = 1 THEN LN(m_seg / u_seg)
                          ELSE LN((1 - m_seg) / (1 - u_seg)) END, 8)
             + ROUND(CASE WHEN f_bal = 1 THEN LN(m_bal / u_bal)
                          ELSE LN((1 - m_bal) / (1 - u_bal)) END, 8),
             6) AS fs_score,
           ROUND(CASE WHEN f_name = 1 THEN LN(m_name / u_name)
                      ELSE LN((1 - m_name) / (1 - u_name)) END, 8)
             + ROUND(CASE WHEN f_seg = 1 THEN LN(m_seg / u_seg)
                          ELSE LN((1 - m_seg) / (1 - u_seg)) END, 8)
             + ROUND(CASE WHEN f_bal = 1 THEN LN(m_bal / u_bal)
                          ELSE LN((1 - m_bal) / (1 - u_bal)) END, 8)
             > 0 AS classified_match
    FROM feat, est ORDER BY rec_a, rec_b
    """,
)
def er05_fs_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER05: Fellegi-Sunter probabilistic linkage scoring — the missing
    step between ER02's hard levenshtein cutoff and ER03's clustering: a
    log-likelihood-ratio score per candidate pair from per-field m/u
    probabilities (m = P(field agrees | same entity), u = P(agrees |
    different)), so a pair agreeing on a RARE field outweighs one
    agreeing on a common one. Three comparison fields: name (edit
    distance ≤ 2), segment (non-null equality), balance (within $5).
    m/u are estimated from the construction-known truth labels
    (floor(rec_id/10) collapses variants onto their master — the labeled
    training pass a real deployment does on clerical-review data),
    Laplace-smoothed ((x+0.5)/(n+1)) so no weight is ±inf. Numerics:
    each field weight is one LN of a smoothed rational, ROUND(8)-fenced
    (G48 discipline); the score is the 3-term sum of fenced doubles —
    bit-identical across engines — with a final ROUND(6) for display and
    the >0 classification fence on the unrounded-but-deterministic sum.
    Scale: scoring decomposes per pair (map-side over the blocked
    candidate set); the m/u estimate is ONE tiny aggregate broadcast
    back — at 10^9 records the cost is the same blocking join ER02
    already pays."""
    blk = _crm(spark).select(
        "rec_id", "name", "nationkey",
        F.expr("right(name, 4)").alias("sfx"),
        "segment", "acct_cents",
    )
    a, b = blk.alias("a"), blk.alias("b")
    cand = a.join(
        b,
        (F.col("a.nationkey") == F.col("b.nationkey"))
        & (F.col("a.sfx") == F.col("b.sfx"))
        & (F.col("a.rec_id") < F.col("b.rec_id")),
    ).select(
        F.col("a.rec_id").alias("rec_a"),
        F.col("b.rec_id").alias("rec_b"),
        F.col("a.name").alias("name_a"),
        F.col("b.name").alias("name_b"),
        F.col("a.segment").alias("seg_a"),
        F.col("b.segment").alias("seg_b"),
        F.col("a.acct_cents").alias("cents_a"),
        F.col("b.acct_cents").alias("cents_b"),
    )
    flag = lambda c: F.when(c, 1).otherwise(0).cast("int")  # noqa: E731
    feat = cand.select(
        "rec_a",
        "rec_b",
        flag(F.levenshtein("name_a", "name_b") <= 2).alias("f_name"),
        flag(
            F.col("seg_a").isNotNull()
            & F.col("seg_b").isNotNull()
            & (F.col("seg_a") == F.col("seg_b"))
        ).alias("f_seg"),
        flag(F.abs(F.col("cents_a") - F.col("cents_b")) <= 500).alias("f_bal"),
        flag(
            F.floor(F.col("rec_a") / 10.0).cast("bigint")
            == F.floor(F.col("rec_b") / 10.0).cast("bigint")
        ).alias("truth"),
    )

    def mu(f: str) -> list:
        m = (
            F.sum(F.when(F.col("truth") == 1, F.col(f)).otherwise(0)) + 0.5
        ) / (F.sum("truth") + 1.0)
        u = (
            F.sum(F.when(F.col("truth") == 0, F.col(f)).otherwise(0)) + 0.5
        ) / (F.sum(F.lit(1) - F.col("truth")) + 1.0)
        return [m.alias("m_" + f[2:]), u.alias("u_" + f[2:])]

    est = feat.agg(*(mu("f_name") + mu("f_seg") + mu("f_bal")))

    def w(f: str, tag: str):
        m, u = F.col("m_" + tag), F.col("u_" + tag)
        return F.round(
            F.when(F.col(f) == 1, F.log(m / u)).otherwise(
                F.log((1 - m) / (1 - u))
            ),
            8,
        )

    score = w("f_name", "name") + w("f_seg", "seg") + w("f_bal", "bal")
    return (
        feat.crossJoin(F.broadcast(est))
        .select(
            "rec_a",
            "rec_b",
            "f_name",
            "f_seg",
            "f_bal",
            (F.col("truth") == 1).alias("same_entity_truth"),
            F.round(score, 6).alias("fs_score"),
            (score > 0).alias("classified_match"),
        )
        .orderBy("rec_a", "rec_b")
    )


# -- ER06 ---------------------------------------------------------------------


def _jaro_winkler_py(s1: str, s2: str) -> float:
    """Exact replica of the textbook Jaro-Winkler (boost threshold 0.7,
    prefix scale 0.1, prefix cap 4) — verified bit-identical to DuckDB's
    jaro_winkler_similarity over every blocked candidate pair in the
    fixture (359/359 exact-double matches), with a ROUND(6) fence on top
    so a last-ulp divergence on unseen strings can't flip the hash."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        for j in range(max(0, i - md), min(i + md + 1, l2)):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (matches / l1 + matches / l2 + (matches - t) / matches) / 3
    if j > 0.7:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        j += 0.1 * p * (1 - j)
    return j


@register(
    "er06_jaro_winkler",
    duck_sql="WITH "
    + _CAND_DUCK
    + """
    SELECT rec_a, rec_b,
           ROUND(jaro_winkler_similarity(name_a, name_b), 6) AS jw,
           CASE WHEN ROUND(jaro_winkler_similarity(name_a, name_b), 6) >= 0.94
                THEN 'match' ELSE 'review' END AS decision
    FROM cand
    WHERE ROUND(jaro_winkler_similarity(name_a, name_b), 6) >= 0.9
    ORDER BY rec_a, rec_b
    """,
)
def er06_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER06: Jaro-Winkler linkage scoring — the continuous string scorer
    production MDM uses where ER02's levenshtein gate is too blunt
    (JW rewards shared prefixes, exactly right for 'Customer#0000x'
    keys and human names). Spark lacks a builtin, so the scorer is an
    Arrow-batched pandas UDF running ONLY on the blocked candidate set
    (the declared slow path, sized by ER01's audit — never on n² pairs);
    the oracle is DuckDB's native jaro_winkler_similarity, making this
    a cross-IMPLEMENTATION certification of the metric, fenced by
    ROUND(6) on both output and thresholds. Scores ≥ 0.94 auto-match;
    the [0.90, 0.94) band is the clerical-review queue of the
    Fellegi-Sunter workflow (ER05 scores, this thresholds)."""
    @F.pandas_udf("double")
    def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler_py(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    cand = _candidates(spark)
    scored = cand.select(
        "rec_a", "rec_b", F.round(jw_udf("name_a", "name_b"), 6).alias("jw")
    )
    return (
        scored.filter(F.col("jw") >= 0.9)
        .withColumn(
            "decision",
            F.when(F.col("jw") >= 0.94, F.lit("match")).otherwise(F.lit("review")),
        )
        .orderBy("rec_a", "rec_b")
    )

