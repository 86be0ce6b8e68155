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
    # new this round
    "q91_doc_chunking",
    "q92_boilerplate_detection",
    # plan-changed late in round 3 (single-execution fixes: joint
    # stats from the pair table, CC adjacency, LSH/SimHash bucket
    # pairs) — the riskiest diffs, validated first
    "q14_relief_relevance",
    "q15_relief_topk",
    "q16_collision_marginal",
    "q17_collision_joint",
    "q19_dedup_jaccard",
    "q20_minhash_signatures",
    "q21_minhash_lsh_neardup",
    "q22_simhash_signatures",
    "q23_simhash_neardup",
    "q37_relief_discrete_collisions",
    "q41_corpus_curation",
    "q44_sparse_relief_relevance",
    "q54_dedup_clusters",
    "q84_canonical_selection",
    "q72_relief_fit_rankings",
    # new or changed earlier in round 3, not yet driver-validated
    "q27_embedding_neardup",
    "q60_sequence_packing",
    "q73_knn_lsh_recall",
    "q74_kmeans_step",
    "q75_oov_rate",
    "q76_length_histogram",
    "q77_streaming_enrichment",
    "q78_random_projection",
    "q79_shuffle_shards",
    "q80_hash_uniform_sample",
    "q81_incremental_dedup",
    "q82_filter_funnel",
    "q83_pii_scrub",
    "q85_token_truncation",
    "q86_source_interleave",
    "q87_temperature_mix",
    "q88_embedding_drift",
    "q89_streaming_outer_join",
    "q90_deletion_propagation",
    # skipped by the 50-entry cap in round 2, still rotating through
    "q38_rollup",
    "q39_distinct_agg",
    "q40_percentiles",
    "q45_analytic_windows",
    "q46_cube",
    "q47_pivot",
    "q48_setops",
    "q51_hll_distinct",
    "q52_correlated_subquery",
    "q53_mom_growth",
    "q56_grouping_sets",
    "q57_stratified_sample",
    "q59_stopword_scrub",
    "q61_contamination",
    "q62_repetition",
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


def _load_modules() -> None:
    # Import for registration side effects.
    from spark_relieffc_fselection_spark.queries import (  # noqa: F401
        relational,
        relief_q,
    )
    for optional in (
        "dedup_q", "simsearch_q", "text_q", "events_q", "multimodal_q",
        "extras_q", "pipeline_q", "trainprep_q",
    ):
        try:
            __import__(f"spark_relieffc_fselection_spark.queries.{optional}")
        except ImportError:
            pass


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
