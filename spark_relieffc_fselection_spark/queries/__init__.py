"""Query registry: every operator from SURVEY.md §2 as a named query
over the driver testdata, each with a DuckDB oracle where SQL can
express it.

Cross-engine determinism conventions (see TESTDATA comparison gate):

* Any SUM/AVG over doubles goes through DECIMAL(38,18) in BOTH engines
  — double addition is order-sensitive and shuffle order is
  nondeterministic, decimal addition is exact.
* Every float output column is ROUND(x, 6) in both engines.
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
_PRIORITY: tuple[str, ...] = (
    # round 5, new: the oracle-able single-batch fit (VERDICT r4 #1 —
    # takes the gate to 50/50 green) and the MDLP discretizer
    # (VERDICT r4 #6)
    "q72a_relief_std_ranking",
    "q105_mdlp_discretize",
    # round 5, new LLM-pipeline surface: SemDeDup cluster-scoped
    # semantic dedup, DSIR importance resampling, edit-distance-
    # verified near-dup
    "q106_semantic_dedup",
    "q107_dsir_importance_sample",
    "q108_editdist_neardup",
    "q109_bloom_dedup",
    "q110_linear_quality_classifier",
    "q111_streaming_bloom_screen",
    "q112_countmin_heavy_hitters",
    "q113_source_overlap",
    "q114_cluster_aware_split",
    "q115_salted_skew_join",
    "q116_snapshot_diff",
    "q117_source_quality_calibration",
    "q118_zorder_layout",
    # round 5, late additions: warehouse analytics surface
    # (queries/warehouse_q.py) — never driver-validated, so they
    # displace the 8 oldest r3-green rotation entries below.
    "q119_scd2_history",
    "q120_hierarchy_closure",
    "q121_cohort_retention",
    "q122_event_funnel",
    "q123_skyline",
    "q124_outlier_mad",
    "q125_bm25_topk",
    "q126_interval_merge",
    # round 5, late additions: data-quality surface
    # (queries/quality_q.py)
    "q127_constraint_audit",
    "q128_winsorize",
    "q129_skew_profile",
    "q130_incremental_agg",
    "q131_streaming_incremental_agg",
    "q132_last_touch_attribution",
    "q133_calendar_gap_fill",
    "q134_psi_drift",
    "q135_rolling_features",
    "q136_ks_drift",
    "q137_compaction_plan",
    "q138_join_cardinality",
    "q139_bucketed_join",
    # (q140_streaming_psi_drift and q141_k_anonymity stay OUT of the
    # 50-slot window this round — q140's histogram dataflow is q134's
    # (same oracle, shared psi_report), q141 is a one-groupBy report
    # shape already validated by q127/q129, and the window is full of
    # never-validated entries; rotate both forward in round 6 with the
    # deferred list below. q142_pagerank likewise — its per-round
    # join+sum shape is q120's closure discipline, numpy-oracle-tested
    # locally — and q143_variant_shred, whose aggregate shape is
    # q35's with the variant parse in front, and q144_hybrid_rrf,
    # a pure composition of the in-window q125 + long-green q24, and
    # q145_gram_matrix, one keyed aggregation in the q14 bin-stats
    # shape, q146_schema_evolution, a staged-source groupBy, and
    # q147_rollup_cascade, whose merge math is q130's decimal-sum
    # discipline at another granularity, q148_kmv_distinct, whose
    # md5-uniform machinery is q80/q100's, and q149_event_transitions,
    # one lag-window pass in the q126 gaps-and-islands shape.)
    # changed this round: multimodal tiny-image decode fix (ADVICE
    # r4), q104 assignment-kernel work (VERDICT r4 #5)
    "q36_multimodal_features",
    "q104_streaming_list_drift",
    # core sentinels — always in the window
    "q14_relief_relevance",
    "q72_relief_fit_rankings",
    # r2-stale rotation (VERDICT r4 #2): last driver-green in r2
    "q04_window_topk",
    "q05_global_topk",
    "q06_union_distinct",
    "q07_semijoin",
    "q08_antijoin",
    "q65_embedding_quantization",
    "q50_streaming_tumbling",
    "q69_streaming_sliding",
    "q70_streaming_dedup",
    "q71_streaming_user_totals",
    # (Deferred to round 6 — displaced by q139, r3-green:
    # q44_sparse_relief_relevance.)
    # (Deferred to round 6 — displaced by q135-q138, all r3-green:
    # q73_knn_lsh_recall, q15_relief_topk, q16_collision_marginal,
    # q17_collision_joint.)
    # (Deferred to round 6 — displaced by q131-q134, all r3-green:
    # q19_dedup_jaccard, q20_minhash_signatures, q22_simhash_signatures,
    # q81_incremental_dedup.)
    # (Deferred to round 6 — displaced by the four quality_q
    # additions q127-q130, all r3-green: q84_canonical_selection,
    # q27_embedding_neardup, q74_kmeans_step, q78_random_projection.)
    # (Deferred to round 6 — displaced by the eight warehouse_q
    # additions q119-q126, all r3-green: q76_length_histogram,
    # q83_pii_scrub, q77_streaming_enrichment, q89_streaming_outer_join,
    # q90_deletion_propagation, q37_relief_discrete_collisions,
    # q53_mom_growth, q88_embedding_drift.)
    # (Deferred to round 6 — displaced by the four late-round-5
    # additions q115-q118, all r3-green: q57_stratified_sample,
    # q41_corpus_curation, q59_stopword_scrub, q61_contamination.)
    # (Deferred to round 6 — still r3-green and the most stable pure-
    # Catalyst OLAP shapes in the registry: q38_rollup,
    # q39_distinct_agg, q40_percentiles, q45_analytic_windows,
    # q46_cube, q47_pivot, q48_setops, q51_hll_distinct,
    # q52_correlated_subquery, q56_grouping_sets, plus — displaced by
    # the nine new round-5 queries — q92_boilerplate_detection,
    # q86_source_interleave, q87_temperature_mix, q91_doc_chunking,
    # q85_token_truncation, q79_shuffle_shards, q80_hash_uniform_sample
    # (q80 was r4-green), q75_oov_rate, q60_sequence_packing.
    # Everything r4-green also rotates out; the local oracle sweep
    # still covers all 115.)
)


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
    return df.sparkSession.createDataFrame(rows, schema=df.schema)
