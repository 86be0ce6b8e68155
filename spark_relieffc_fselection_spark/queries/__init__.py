"""Query registry: every operator from SURVEY.md §2 as a named query
over the driver testdata, each with a DuckDB oracle where SQL can
express it.

Cross-engine determinism conventions (see TESTDATA comparison gate):

* Any SUM/AVG over doubles goes through DECIMAL(38,18) in BOTH engines
  — double addition is order-sensitive and shuffle order is
  nondeterministic, decimal addition is exact.
* Every float output column is ROUND(x, 6) in both engines. CAVEAT
  (learned from q110, round 9): when the EXACT value can land on a
  .5e-6 half boundary (coarse rationals like k/1000 divided by a
  count), ROUND of the nearest double is engine-dependent — Spark's
  BigDecimal HALF_UP vs DuckDB's float rounding disagreed on a real
  doc. Derive the 6dp value from exact integer/decimal arithmetic
  with an explicit tie rule in both engines when that is reachable.
* Every ranking has a total tiebreak (unique key last).
* Bernoulli sampling / randomSplit are engine-seeded, so sampled
  queries use deterministic modulo predicates instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


#: Names promoted to the FRONT of the queries() iteration order. The
#: driver's correctness gate checks only the first 50 entries, so each
#: round the least-recently-driver-validated queries (the ones the cap
#: skipped last round) plus anything new or semantically changed this
#: round go first; long-green queries rotate to the back. Every query
#: keeps its oracle either way — this only chooses which 50 the DRIVER
#: re-verifies this round (the rest stay covered by
#: scripts/compare_oracle.py).
_CURRENT_ROUND = 12

_PRIORITY: tuple[str, ...] = (
    # round 12 rotation (VERDICT r11 #1): the FULL 38-entry r8 cohort
    # leads — age 4 at round 12, the staleness bound forces it in
    # (zero r8 pre-pays happened in round 11: all 5 free slots went
    # to that round's new gates, per the new-gates-outrank-pre-pays
    # rule).
    "q66_unigram_lm_quality",
    "q67_deterministic_split",
    "q68_domain_mix",
    "q82_filter_funnel",
    "q93_quantile_discretize",
    "q94_substring_dedup",
    "q95_substring_contamination",
    "q96_bigram_lm_quality",
    "q97_token_budget_selection",
    "q98_cdc_chunking",
    "q99_pq_ann",
    "q100_weighted_sample",
    "q101_domain_cap",
    "q102_ivfpq_ann",
    "q103_stratified_weighted_sample",
    "q04_window_topk",
    "q05_global_topk",
    "q06_union_distinct",
    "q07_semijoin",
    "q08_antijoin",
    "q36_multimodal_features",
    "q50_streaming_tumbling",
    "q65_embedding_quantization",
    "q69_streaming_sliding",
    "q70_streaming_dedup",
    "q71_streaming_user_totals",
    "q72a_relief_std_ranking",
    "q104_streaming_list_drift",
    "q106_semantic_dedup",
    "q107_dsir_importance_sample",
    "q108_editdist_neardup",
    "q109_bloom_dedup",
    "q111_streaming_bloom_screen",
    "q112_countmin_heavy_hitters",
    "q113_source_overlap",
    "q114_cluster_aware_split",
    "q115_salted_skew_join",
    "q116_snapshot_diff",
    # core sentinels — always in the window. q72 is the PERMANENT
    # engine-seeded-draw witness (VERDICT r8 #6 decision): its rows-only
    # slot is kept deliberately, because it is the one registry entry
    # exercising the reference's own sampling mode (engine-seeded
    # Bernoulli, ReliefFRSelector.scala:223) end-to-end — every other
    # fit mode is hash-gated (q72a/q72b/q72c/q72d/q158), so this slot
    # is the standing proof the DEFAULT reference configuration still
    # runs, not a gap awaiting an oracle.
    "q14_relief_relevance",
    "q72_relief_fit_rankings",
    # 10 free slots: 4 go to this round's new gates (never
    # driver-checked -> a slot each is mandatory, the standing
    # new-gates-outrank-pre-pays rule) — q176 id-space artifact round
    # trip + byte-level mode (VERDICT r11 #2), q177 word-level
    # BPE-dropout (VERDICT r11 #3), q178 string->ids serving bridge
    # and q179 tokenize->detokenize identity (this round's own
    # flagship features, promoted from the round-13 candidate list so
    # they enter the record driver-gated, not tests-only); the
    # remaining 6 pre-pay the 43-entry r9 cohort per VERDICT r11 #1 —
    # the named heavy fit gates (q72c/q72d/q158/q161, q13/q44) so the
    # RELIEF core's evidence stays fresh. q153/q156 were the original
    # 7th/8th pre-pays; q178 supersedes that pick (it exercises the
    # same string trainer + encode machinery END-TO-END against the
    # same generated oracle family, plus the bridge and the rank
    # encoder on top), and both remain all-SF green under
    # scripts/compare_oracle.py this round (SCALE.md).
    # Round-13 math, written out: the r9 remainder is 43 - 6 = 37,
    # forced at age 4 in round 13, + 2 sentinels = 39 forced,
    # 11 free — the 45-forced pinch never recurs. Steady state from
    # there: each round's ~11-15 free slots pre-pay the next cohort
    # (round 13 pre-pays 11 of the 49-entry r10 cohort -> round 14
    # lands at 38 + 2 = 40 forced, 10 free, pre-paying the remaining
    # 38-entry r11 cohort's oldest), which holds every cohort within
    # the staleness bound indefinitely.
    "q72c_relief_fit_hash_batched",
    "q72d_relief_fit_hash_sampled",
    "q158_sparse_fit_hash_batched",
    "q161_sparse_fit_coo_width",
    "q13_knn_join",
    "q44_sparse_relief_relevance",
    "q176_bpe_ids_artifact_bytelevel",
    "q177_bpe_word_dropout",
    "q178_bpe_bridged_serving",
    "q179_bpe_roundtrip_identity",
)

#: Every registered query NOT in this round's driver window, mapped to
#: the CORRECTNESS round it was last driver-green in (0 = never, only
#: permitted with an explicit planned-round comment). This is the
#: machine-readable form of the old deferred-list comments
#: (VERDICT r5 #10): tests/test_registry.py asserts _PRIORITY and
#: _DEFERRED exactly partition the registry, so a new query CANNOT be
#: added without either taking a driver slot or being documented here.
_DEFERRED: dict[str, int] = {
    # r11-green: the round-11 window cohort rotating out (sentinels
    # stay in _PRIORITY). Age 1 at round 12; forced back in by round
    # 15 at the latest.
    "q03_join_revenue_by_nation": 11,
    "q09_minmax_norm": 11,
    "q10_label_priors": 11,
    "q11_mod_sample_agg": 11,
    "q12_mutual_information": 11,
    "q18_dedup_exact": 11,
    "q21_minhash_lsh_neardup": 11,
    "q23_simhash_neardup": 11,
    "q24_ann_bruteforce": 11,
    "q25_ann_lsh": 11,
    "q26_ann_ivf": 11,
    "q28_token_stats": 11,
    "q29_quality_scores": 11,
    "q30_language_id": 11,
    "q31_fingerprints": 11,
    "q32_tumbling_window": 11,
    "q33_sliding_window": 11,
    "q34_session_window": 11,
    "q35_json_extract": 11,
    "q38_rollup": 11,
    "q39_distinct_agg": 11,
    "q40_percentiles": 11,
    "q41_corpus_curation": 11,
    "q42_asof_join": 11,
    "q43_range_join": 11,
    "q45_analytic_windows": 11,
    "q46_cube": 11,
    "q47_pivot": 11,
    "q48_setops": 11,
    "q49_ann_recall": 11,
    "q51_hll_distinct": 11,
    "q52_correlated_subquery": 11,
    "q53_mom_growth": 11,
    "q54_dedup_clusters": 11,
    "q55_tfidf_topterms": 11,
    "q56_grouping_sets": 11,
    "q57_stratified_sample": 11,
    "q58_streaming_sessions": 11,
    "q59_stopword_scrub": 11,
    "q61_contamination": 11,
    "q62_repetition": 11,
    "q63_frame_sample": 11,
    "q64_streaming_interval_join": 11,
    "q171_unigram_train_iterprune": 11,
    "q172_bpe_artifact_encode": 11,
    "q173_unigram_artifact_tokenize": 11,
    "q174_bpe_ids_train": 11,
    "q175_unigram_sampled_tokens": 11,
    # r10-green. Age 2 at round 12; forced by round 14 — round 13's
    # free slots pre-pay this 49-entry cohort (see the _PRIORITY
    # math note).
    "q22_simhash_signatures": 10,
    "q27_embedding_neardup": 10,
    "q37_relief_discrete_collisions": 10,
    "q60_sequence_packing": 10,
    "q72b_relief_greedy_topk": 10,
    "q74_kmeans_step": 10,
    "q75_oov_rate": 10,
    "q76_length_histogram": 10,
    "q77_streaming_enrichment": 10,
    "q78_random_projection": 10,
    "q79_shuffle_shards": 10,
    "q80_hash_uniform_sample": 10,
    "q81_incremental_dedup": 10,
    "q83_pii_scrub": 10,
    "q84_canonical_selection": 10,
    "q85_token_truncation": 10,
    "q86_source_interleave": 10,
    "q87_temperature_mix": 10,
    "q88_embedding_drift": 10,
    "q89_streaming_outer_join": 10,
    "q90_deletion_propagation": 10,
    "q91_doc_chunking": 10,
    "q92_boilerplate_detection": 10,
    "q105_mdlp_discretize": 10,
    "q140_streaming_psi_drift": 10,
    "q141_k_anonymity": 10,
    "q142_pagerank": 10,
    "q143_variant_shred": 10,
    "q144_hybrid_rrf": 10,
    "q145_gram_matrix": 10,
    "q146_schema_evolution": 10,
    "q147_rollup_cascade": 10,
    "q148_kmv_distinct": 10,
    "q149_event_transitions": 10,
    "q150_merge_upsert": 10,
    "q151_negative_sampling": 10,
    "q152_zipf_fit": 10,
    "q154_streaming_upsert_state": 10,
    "q155_recursive_cte": 10,
    "q162_unigram_viterbi": 10,
    "q163_unigram_mstep_counts": 10,
    "q164_unigram_tokenize_corpus": 10,
    "q165_unigram_prune_loss": 10,
    "q166_unigram_em_iteration": 10,
    "q169_unigram_train": 10,
    "q170_bpe_train": 10,
    "q01_pruned_scan": 10,
    "q02_groupby_agg": 10,
    # r9-green (age 3 at round 12; the 37-entry remainder after round
    # 12's 6 pre-pays — q72c/q72d/q158/q161/q13/q44 moved to
    # _PRIORITY — is forced in round 13, see the math note; q153/q156
    # stayed deferred because their slots went to q178/q179, the new
    # gates that exercise the same machinery end-to-end).
    # q157 fold note (VERDICT r9 #8 / r10 #1): folding q157's
    # Hamming-1 evidence into q160 stays pre-approved if a future
    # window pinches; round 12 seats everything without it.
    "q153_bpe_merge_step": 9,
    "q156_bpe_encode": 9,
    "q15_relief_topk": 9,
    "q16_collision_marginal": 9,
    "q17_collision_joint": 9,
    "q19_dedup_jaccard": 9,
    "q20_minhash_signatures": 9,
    "q73_knn_lsh_recall": 9,
    "q110_linear_quality_classifier": 9,
    "q157_knn_lsh_multiprobe_recall": 9,
    "q159_ann_lsh_multiprobe_recall": 9,
    "q160_knn_lsh_hamming2_recall": 9,
    "q167_maxsim_rerank": 9,
    "q168_two_stage_retrieval": 9,
    "q117_source_quality_calibration": 9,
    "q118_zorder_layout": 9,
    "q119_scd2_history": 9,
    "q120_hierarchy_closure": 9,
    "q121_cohort_retention": 9,
    "q122_event_funnel": 9,
    "q123_skyline": 9,
    "q124_outlier_mad": 9,
    "q125_bm25_topk": 9,
    "q126_interval_merge": 9,
    "q127_constraint_audit": 9,
    "q128_winsorize": 9,
    "q129_skew_profile": 9,
    "q130_incremental_agg": 9,
    "q131_streaming_incremental_agg": 9,
    "q132_last_touch_attribution": 9,
    "q133_calendar_gap_fill": 9,
    "q134_psi_drift": 9,
    "q135_rolling_features": 9,
    "q136_ks_drift": 9,
    "q137_compaction_plan": 9,
    "q138_join_cardinality": 9,
    "q139_bucketed_join": 9,
}


def _ordered() -> dict[str, QuerySpec]:
    _load_modules()
    out = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    out.update({n: s for n, s in REGISTRY.items() if n not in out})
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in _ordered().items() if s.oracle is not None}


#: Third-party imports a query module may legitimately lack in a
#: stripped deployment. ONLY a missing module named here is tolerated
#: — any other ImportError (a typo in our own code, a renamed
#: operator) must fail the whole registry, not silently shrink the
#: driver's 50-query gate (VERDICT r4 item #4).
_OPTIONAL_DEPS = frozenset({"PIL", "soundfile"})


def _load_modules() -> None:
    # Import for registration side effects.
    from spark_relieffc_fselection_spark.queries import (  # noqa: F401
        relational,
        relief_q,
    )
    for mod in (
        "dedup_q", "simsearch_q", "text_q", "events_q", "multimodal_q",
        "extras_q", "pipeline_q", "trainprep_q", "warehouse_q",
        "quality_q",
    ):
        try:
            __import__(f"spark_relieffc_fselection_spark.queries.{mod}")
        except ImportError as exc:
            missing = (getattr(exc, "name", "") or "").split(".")[0]
            if missing in _OPTIONAL_DEPS:
                continue
            raise ImportError(
                f"query module '{mod}' failed to import — registry would "
                f"silently lose its queries (cause: {exc})"
            ) from exc


def localize(df: DataFrame) -> DataFrame:
    """Materialize a SMALL result as a LocalRelation (collect + rebuild).

    For memoized tiny results (relief per-feature stats, joint COO —
    tens to ~1k rows), ``.cache()`` is the wrong tool: each live cache
    entry carries its full analyzed plan, and EVERY later action in the
    session pays a canonicalized-plan comparison against every entry
    during cache lookup. A handful of pipeline-sized cached plans
    measurably slows unrelated queries (2-3x on sub-second jobs). A
    LocalRelation has no lineage, occupies no executor storage, and
    costs nothing to compare against.

    Only for driver-sized results — never big distributed data.
    """
    rows = df.collect()
    out = df.sparkSession.createDataFrame(rows, schema=df.schema)
    # free metadata for size-sensitive consumers (e.g. maxsim_rerank's
    # broadcast ceiling reads it instead of paying a probe job) — the
    # count is exact by construction and dies with this Python object
    out._localized_row_count = len(rows)
    return out
