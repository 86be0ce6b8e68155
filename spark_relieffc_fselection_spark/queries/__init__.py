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


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_modules()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_modules()
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


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
