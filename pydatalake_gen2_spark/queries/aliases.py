"""Driver-window aliases + the LakeCatalog round-trip pair (r2 verdict #1/#8).

The external driver's per-round correctness sweep caps at the first 50
registry names taken ALPHABETICALLY. With 174 registered pairs, rounds 1-2
only ever produced driver rows for ``c01..f33`` — every j/l/o/p/s/st/t/u/
ud/w query had zero driver evidence despite the repo-local oracle sweep
(tests/test_correctness.py) hash-matching all of them each session.

Per the r2 verdict's explicit ask, this module re-lists ONE REPRESENTATIVE
QueryPair per operator family under an ``aNN_``-prefixed name so the
50-name window covers every family instead of 33 scalar-function rows.
Each alias is the SAME QueryPair object content (identical spark_fn,
duck_sql, tier — see registry.register_alias); nothing here is a new code
path, and the mapping below is the complete, auditable list.

``a00_lake_roundtrip`` is the one genuinely new entry: a deterministic
smoke of the reference's literal §2A surface (create → set/get properties
→ list → rename → read → stat → delete on a local filesystem root), so the
reference's REST-client semantics (client.py:213-627) also get a driver
row. Its result table is fully deterministic, so it carries a VALUES
oracle and hashes like any H pair.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from pydatalake_gen2_spark.registry import register, register_alias
from pydatalake_gen2_spark.sources.lake import LakeCatalog

_PAYLOAD = b"hello lake"


@register(
    "a00_lake_roundtrip",
    duck_sql="""
    SELECT CAST(step AS INT) AS step, op, ok
    FROM (VALUES
        (0, 'create_filesystem', TRUE),
        (1, 'set_get_properties', TRUE),
        (2, 'list_paths', TRUE),
        (3, 'rename_path', TRUE),
        (4, 'read_bytes', TRUE),
        (5, 'stat_length', TRUE),
        (6, 'delete_path', TRUE),
        (7, 'delete_filesystem', TRUE),
        (8, 'list_filesystems_empty', TRUE)
    ) t(step, op, ok)
    ORDER BY step
    """,
)
def a00_lake_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A reference-surface round-trip (client.py:213-627 equivalents) on a
    throwaway local-fs root; each step's postcondition becomes one
    deterministic (step, op, ok) row."""
    tmp = tempfile.mkdtemp(prefix="lake_rt_")
    try:
        cat = LakeCatalog(spark, f"file://{tmp}")
        checks: list[tuple[str, bool]] = []
        checks.append(("create_filesystem", cat.create_filesystem("fs1")))
        cat.create_path("fs1/dir1", "directory")
        cat.upload_bytes("fs1/dir1/a.bin", _PAYLOAD)
        cat.set_properties("fs1/dir1/a.bin", {"owner": "spark", "tier": "hot"})
        checks.append(
            (
                "set_get_properties",
                cat.get_user_properties("fs1/dir1/a.bin")
                == {"owner": "spark", "tier": "hot"},
            )
        )
        checks.append(
            ("list_paths", [p.name for p in cat.list_paths("fs1/dir1")] == ["a.bin"])
        )
        checks.append(("rename_path", cat.rename_path("fs1/dir1/a.bin", "fs1/dir1/b.bin")))
        checks.append(("read_bytes", cat.read_bytes("fs1/dir1/b.bin") == _PAYLOAD))
        checks.append(("stat_length", cat.get_properties("fs1/dir1/b.bin").length == len(_PAYLOAD)))
        checks.append(("delete_path", cat.delete_path("fs1/dir1", recursive=True)))
        checks.append(("delete_filesystem", cat.delete_filesystem("fs1")))
        checks.append(("list_filesystems_empty", cat.list_filesystems() == []))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    rows = [(i, op, bool(ok)) for i, (op, ok) in enumerate(checks)]
    return spark.createDataFrame(rows, "step INT, op STRING, ok BOOLEAN").orderBy("step")


# One representative head per operator family (r2 verdict ask #1). 49 aliases
# + a00 above = exactly the driver's 50-name window; the c*/f* families they
# displace were driver-verified green in rounds 1-2 (CORRECTNESS_r01/r02).
_ALIASES: dict[str, str] = {
    # joins
    # r9 rotation (r8 verdict #2): j01 holds green driver rows r3-r8 and
    # the join family keeps FOUR other window reps (a05, a08, a18, a31;
    # a07 moves to s44 this same round — see below); the slot goes to F61
    # explode_outer (r8's plan-gated single-Generate NULL-preserving
    # explode), which held no driver row.
    "a01_f61_explode_outer": "f61_explode_outer",
    # r10 rotation (r9 verdict #3): lx_ivf_topk holds green r7-r9 rows
    # and the lx family keeps a15/a34/a47; the slot goes to ST20b — the
    # RocksDB state-store certification (provider-swap output invariance,
    # streaming/stateful.py:330), which held no driver row.
    "a02_st20b_rocksdb_state": "st20b_rocksdb_state_store",
    # r9 repurpose: j05 holds a green r3 driver row and the join family
    # keeps a01/a02/a05/a06/a07/a08/a18; the slot goes to the new
    # entity-resolution class (blocked fuzzy record linkage — first
    # driver evidence for the ER/MDM family, er01-er04).
    "a03_er02_fuzzy_matches": "er02_fuzzy_matches",
    # r7 repurpose: j10's band-join shape holds a green r3 driver row via
    # a04 and stays covered by a05/j21's time-join reps; the slot goes to
    # the new SQL-UDF class (Spark 4 CREATE FUNCTION, scalar + table).
    "a04_ud13_sql_udf": "ud13_sql_udf",
    # r10 repurpose: j11 holds a green r3 driver row (a05) and the time-
    # join family keeps j14/j21 in the local mirror; the slot goes to the
    # new interval-OVERLAP join class (week-bucket candidate equi-join —
    # the theta-join shape no other window row exercises).
    "a05_j36_interval_overlap": "j36_interval_overlap_join",
    # r9 rotation (r8 verdict #2): lx_mmr_rerank earned its green r8 row
    # (a06) and the lx family keeps a02/a15/a34/a47; the slot goes to
    # S45 seeded TABLESAMPLE (r8's reproducible Bernoulli scan sampler),
    # which held no driver row.
    "a06_s45_tablesample_seeded": "s45_tablesample_seeded",
    # r9 rotation (r8 verdict #2): j27 holds green rows r6-r8 and the
    # join family keeps a05/a08/a18/a31; the slot goes to S44 ANALYZE/
    # CBO stats (r8's cost-based-optimizer stats pipeline, plan-gated
    # SMJ->broadcast flip), which held no driver row.
    "a07_s44_analyze_cbo_stats": "s44_analyze_cbo_stats",
    # r11 rotation (r10 verdict #5): jx holds green rows r3-r10 and the
    # join family keeps a05/a31; the slot goes to ST26 — the LIVE
    # stream-static LEFT SEMI join leg (a third real Structured
    # Streaming run in the window), which held no driver row.
    "a08_st26_semi_stream": "st26_semi_stream",
    # aggregate tail (g08+ never sorted into the window)
    # r8 rotation (late-round): g04 holds green driver rows r1-r7 and the
    # sketch family keeps a23/a36; the slot goes to G67, the round's new
    # super-aggregate-empty-input semantics pair (fuzz rule R12 pinned in
    # the registry — Spark's zero-row rollup over an empty input vs the
    # standard's grand-total row, oracle fenced on the empty branch only),
    # so the divergence earns per-round driver evidence from r8 on.
    "a09_g67_super_agg_empty": "g67_super_agg_empty_input",
    # r9 repurpose: g08 holds a green r3 driver row and the g-family
    # keeps a09 plus the statistical slots; the slot goes to the new
    # data-quality class (Deequ-style one-pass expectation suite).
    "a10_dq01_expectations": "dq01_expectation_suite",
    # r11 rotation (r10 verdict #5): l41 holds green rows r6-r10 and the
    # l family keeps a35/a37/a38/a40/a41/a43; the slot goes to L81 — the
    # dedup-induced mixture-shift audit, which held no driver row.
    "a11_l81_dedup_shift": "l81_dedup_mixture_shift",
    # r9 rotation (r8 verdict #2): c30 earned its green r8 row (a12) and
    # the composite family keeps a21/a26; the slot gives the g44-g66
    # stat-test family a second never-evidenced rep — G58 permutation
    # test, whose int64-overflow fix (decade-up sf1 sweep catch, r8) now
    # earns per-round driver evidence.
    "a12_g58_permutation_test": "g58_permutation_test",
    # r11 rotation (r10 verdict #5): g63 holds green rows r7-r10 and the
    # stat-test family keeps a12/a20/a23/a24/a49; the slot goes to G57 —
    # the Kolmogorov-Smirnov two-sample test, which held no driver row.
    "a13_g57_ks_two_sample": "g57_ks_two_sample",
    # r8 repurpose: g18 holds a green r3 driver row; the slot goes to the
    # new metadata-only-scan class (count/min/max answered purely from
    # parquet footer statistics).
    "a14_s34_footer_stats": "s34_footer_stats_scan",
    # r7 repurpose: g19 holds a green r3 driver row and the percentile
    # family keeps a12/a14; the slot goes to the lx/ANN family's FIRST
    # window representative (Matryoshka truncated-dim retrieval audit).
    "a15_lx_mrl_recall": "lx_mrl_recall",
    # r10 rotation (r9 verdict #3): mm_phash_neardup holds green r4-r9
    # rows and a30 keeps the multimodal rep; the slot goes to G70 — the
    # Spark 4 ANSI ordered string aggregation (listagg WITHIN GROUP),
    # which held no driver row.
    "a16_g70_listagg": "g70_listagg_within_group",
    # windows
    # r10 rotation (r9 verdict #3): w31 holds green r4-r9 rows and a19
    # keeps the window family covered; the slot goes to P24 — the lateral
    # column alias (Spark 4 SELECT-list alias reuse, certified against an
    # oracle that spells the expressions out), which held no driver row.
    "a17_p24_lateral_alias": "p24_lateral_column_alias",
    # r11 rotation (r10 verdict #5): j32 holds green rows r7-r10 and the
    # join family keeps a05/a31 (+a08's live semi-join leg); the slot
    # goes to W38 — pairwise rolling correlation over aligned frame
    # windows, which held no driver row (the w family regains a second
    # rep next to a19).
    "a18_w38_rolling_corr": "w38_rolling_correlation",
    # r10 repurpose: w07 holds a green r3 driver row (a19) and the w
    # family keeps a17/a21-adjacent reps; the slot goes to the new
    # seasonal-decomposition class (centered-MA detrend, integer-exact).
    "a19_w36_seasonal_decomp": "w36_seasonal_decomposition",
    # r10 rotation (r9 verdict #3): l59 holds green r4-r9 rows and the l
    # family keeps a11/a35/a37/a38/a40/a41/a43; the slot goes to G44 —
    # the Mann-Whitney U rank-sum test, first driver evidence for the
    # local-only nonparametric stats reps (g44/g57/g65/g66).
    "a20_g44_mann_whitney": "g44_mann_whitney",
    # r10 repurpose: w13 holds a green r3 driver row (a21); the slot
    # goes to the new forecasting class (Holt double-exponential
    # smoothing — applyInPandas recursion vs recursive-CTE oracle).
    # r8 rotation (r7 verdict #1): c32 holds green r6-r7 rows; the
    # forecasting family's slot advances to the round-7 Holt-Winters
    # SEASONAL variant (12-slot seasonal state carried through the
    # recursive CTE) so the new operator earns its first driver row.
    "a21_c33_holt_winters": "c33_holt_winters",
    # sorts / top-k
    # r8 repurpose: o03 holds a green r3 driver row and a23 keeps the
    # top-k rep; the slot goes to WITH-TIES semantics and its two-pass
    # threshold plan (first driver evidence for rank-limit queries).
    "a22_o08_topk_with_ties": "o08_topk_with_ties",
    # r10 rotation (r9 verdict #3): g48 holds green r4-r9 rows and the
    # stats family keeps a12/a13/a20/a24/a49; the slot goes to G66 — the
    # Mann-Kendall trend test (second first-driver-row rep for the
    # local-only nonparametric stats family).
    "a23_g66_mann_kendall": "g66_mann_kendall",
    # set ops
    # r10 repurpose: u01 holds a green r3 driver row (a24) and a25
    # keeps the set-op family; the slot goes to the new resampling class
    # (seeded deterministic bootstrap CI — portable-LCG draws).
    "a24_g54_bootstrap_ci": "g54_bootstrap_ci",
    "a25_u05_intersect_except_all": "u05_intersect_except_all",
    # projection / filter (a27 keeps the family's window rep)
    # r11 rotation (r10 verdict #5): c28 holds green rows r6-r10 and the
    # composite family keeps a21; the slot goes to G65 — the exact
    # Kendall-tau rank correlation, which held no driver row.
    "a26_g65_kendall_tau": "g65_kendall_tau",
    "a27_p07_cast_matrix": "p07_cast_matrix",
    # scans / sources / sinks
    "a28_s01_parquet_scan": "s01_parquet_scan",
    # r11 rotation (r10 verdict #5→#4a): s43 holds green rows r8-r10 and
    # the scan/source family keeps a14/a28 (+a06/a07); the versioned-
    # table slot advances to round-11's TIMESTAMP AS OF time travel
    # (pinned monotone commit timestamps), which held no driver row.
    "a29_s46_time_travel_ts": "s46_time_travel_ts",
    # r5 repurpose: the s-family already held three window slots
    # (a28/a29/a30) while the multimodal family — now a REAL stdlib-PNG
    # decode pipeline with a full SQL oracle (mm_png_decode), no longer a
    # smoke-tier stub — had none; s12 stays oracle-verified in the local
    # mirror like every other out-of-window pair.
    "a30_mm_png_decode": "mm_png_decode",
    # r3 repurpose: f34/f35 already have green driver rows from round 1,
    # so their slots go to round-3's new capability classes instead —
    # the SCD-2 incremental-merge ≡ full-rebuild equivalence and the
    # C4-style line dedup (both first-ever driver evidence).
    "a31_j16_scd2_incremental": "j16_scd2_incremental",
    # r9 rotation (r8 verdict #2): l20 holds green rows r4-r8 AND runs in
    # every bench round; the dedup family keeps a16/a20/a35/a39->moved;
    # the slot goes to G68 GROUP BY ALL (r8's inferred-grouping form),
    # which held no driver row.
    "a32_g68_group_by_all": "g68_group_by_all",
    # r11 rotation (r10 verdict #5): gr01 holds green rows r3-r10 and
    # runs in every bench round; the graph family's slot advances to
    # GR12 — the degree power-law / heavy-tail audit, which held no
    # driver row.
    "a33_gr12_degree_powerlaw": "gr12_degree_powerlaw",
    # LLM-pipeline operators
    # r10 repurposed this slot to l76 isotonic calibration (green r4 row);
    # r11 rotates it again to the round's new capability class:
    # DISTRIBUTED EXACT CLUSTERING (integer-Lloyd k-means, the full-corpus
    # IVF trainer shape) — its recurrence is bit-reproducible, so the
    # driver row certifies a whole iterative-ML family, not one query.
    "a34_lx_kmeans": "lx_kmeans",
    # r7 rotation: l02b holds green rows r4-r6 and the dedup family keeps
    # a16/a20/a32/a39; the slot goes to SemDeDup — newly full-H via the
    # exact integer-Lloyd cells (first driver evidence for embedding-space
    # semantic dedup).
    "a35_l31_semdedup": "l31_semdedup",
    # r9 repurpose: l03 holds a green r3 driver row, runs in every bench
    # round, and stays transitively exercised by a15 (MRL runs
    # cosine_topk on both legs); the slot goes to the new mergeable-
    # sketch class (HLL partial-union rollup with folded error bounds).
    "a36_g49_hll_mergeable": "g49_hll_mergeable",
    # r7 repurpose: l04's vector primitives are exercised transitively by
    # a36 (cosine top-k is built on them) and l04 holds a green r3 row;
    # the slot goes to the new privacy class (PII scan + redaction).
    "a37_l54_pii_scan": "l54_pii_scan",
    # r8 repurpose: l07 holds a green r3 driver row; the slot goes to the
    # new index-planning class (MinHash-LSH (b,r) s-curve audit on the
    # observed pair-similarity distribution).
    "a38_l64_lsh_plan": "l64_lsh_param_plan",
    # r9 rotation (r8 verdict #2): l11 holds green rows r3-r8 and stays
    # transitively exercised by a35 (SemDeDup shares the cluster-keeper
    # machinery); the slot goes to G69 native UNPIVOT (r8's melt form),
    # which held no driver row.
    "a39_g69_unpivot_native": "g69_unpivot_native",
    # r7 rotation: l12 holds green rows r1-r6; the sampling family keeps
    # its window rep via the newly-H exact-k weighted reservoir, whose
    # measured pow-drift fence (see the pair docstring) should earn driver
    # evidence every round.
    "a40_l18b_weighted_reservoir": "l18b_weighted_reservoir",
    # r8 rotation (r7 verdict #1): l15 holds green r3-r7 rows and the
    # LLM-pipeline family keeps nine other window reps; the slot advances
    # to round-7's exact water-filling token-budget mix (L83).
    "a41_l83_token_budget_mix": "l83_token_budget_mix",
    # text analysis
    # r10 rotation: dq06 holds green r4-r9 rows and the dq family keeps
    # a10 (expectation suite) + a48 (observed metrics); the slot goes to
    # the round-10 debut DQ08 — the SimHash band-cap audit (observability
    # pair for the capped near-dup default, r9 ADVICE).
    "a42_dq08_cap_audit": "dq08_simhash_cap_audit",
    # r8 rotation (r7 verdict #1): t02 holds green r1-r7 rows and text
    # quality stays exercised via l27 (bench, every round) and a10's
    # expectation suite; the slot advances to round-7's 5-gram novelty
    # scorer (L84 — inverted-index tally join, text-analysis class).
    "a43_l84_ngram_novelty": "l84_ngram_novelty",
    # streaming (batch-equivalent forms)
    # r7 rotation: the batch form holds green rows r1-r6 and stays
    # oracle-verified locally; the slot now runs the LIVE tumbling-window
    # streaming query (newly hash-certified vs the same oracle) so the
    # driver exercises a real Structured Streaming run each round.
    "a44_st01_tumbling_stream": "st01_tumbling_stream",
    # r11 rotation (r10 verdict #5→#4b): st20 holds green rows r6-r10
    # and the stateful surface keeps a02 (RocksDB provider) + a44/a46
    # (live runs); the slot goes to ST28 — the versioned-table CHANGE
    # DATA FEED streaming source (the read twin of ST12's write
    # direction), which held no driver row.
    "a45_st28_cdf_stream": "st28_cdf_stream",
    # r8 rotation (r7 verdict #1): st08 holds green r3-r7 rows and the
    # streaming family keeps a44 (live tumbling) + a45 (TWS surface);
    # the slot advances to round-7's stream-stream ANTI join — a second
    # LIVE Structured Streaming run in the window, hash-certified via
    # its batch twin's oracle.
    "a46_st27_anti_stream": "st27_anti_stream",
    # r8 rotation (r7 verdict #1): st09 holds green r3-r7 rows; the slot
    # advances to round-7's embedding-drift monitor (LX-DRIFT — fixed-
    # point int64-exact one-pass partial aggregation).
    "a47_lx_embedding_drift": "lx_embedding_drift",
    # r5 repurpose (r4 verdict #9): ud01/ud11 both hold green r4 rows and
    # the UDF family keeps a04_ud13; their slots rotate to the two
    # operators REPAIRED this round (dq07's observe()-legal collect_set
    # rewrite, g51's exact-integer-cents^2 SS path) so the fixes earn
    # fresh driver-green rows.
    "a48_dq07_observed_metrics": "dq07_observed_metrics",
    "a49_g51_anova_f": "g51_anova_f",
}

for _alias, _target in _ALIASES.items():
    register_alias(_alias, _target)
