"""Quantile discretization front end for ``discreteData=True``.

The reference declares sramirez:spark-MDLP-discretization as its
discretization companion (pom.xml:30-35) but never imports it in
src/main — users of ``discreteData=True`` are expected to arrive with
integer-coded features and get no help producing them. This module
closes that workflow gap Spark-first:

  * :func:`fit_quantile_edges` — per-feature quantile bin edges in ONE
    aggregation over the exploded long form. The default ``approx``
    method uses ``percentile_approx`` (a partial-aggregatable KLL-style
    sketch: the shuffle moves d x sketch-size bytes, NOT n x d values —
    the only shape that survives 100 TB). ``exact`` uses the exact
    ``percentile`` aggregate for oracle-grade reproducibility at test
    scales.
  * :func:`apply_bin_edges` — maps every feature value to its bin with
    pure Catalyst array expressions (``transform`` + literal edge
    matrix); no UDF, no shuffle, whole-stage-codegen friendly.
  * :func:`quantile_discretize` — fit + apply convenience.

Bin semantics: ``bin(x) = #{edge e : x > e}`` over the de-duplicated
sorted interior edges, so bins are ``0..num_bins-1`` and a constant
feature lands wholly in bin 0. Bin ids are emitted as doubles because
that is the ``discreteData=True`` contract of the selector (the
reference's discrete path also stores integer codes in double vectors,
ReliefFRSelector.scala:154-164).

At very high dimension (d in the tens of thousands) the literal edge
matrix would bloat the plan; callers there should persist the edges to
a table and map via a broadcast join on (instance, feature) long form
instead — the fit side needs no change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_quantile_edges(
    df: DataFrame,
    num_bins: int = 10,
    features_col: str = "features",
    method: str = "approx",
    relative_error: float = 1e-4,
) -> list[list[float]]:
    """Per-feature interior quantile edges (``num_bins - 1`` cut points
    at probabilities ``i/num_bins``), de-duplicated and sorted.

    Returns ``edges[feature_idx] -> [e1 < e2 < ...]``. One job: explode
    to (feature, value) long form, aggregate a percentile sketch per
    feature. ``method='approx'`` keeps the shuffle at d x sketch-size
    (scale path); ``'exact'`` buffers per-feature values for exact,
    cross-engine-reproducible interpolated percentiles (test scales).
    """
    if num_bins < 2:
        raise ValueError(f"num_bins must be >= 2, got {num_bins}")
    probs = [i / num_bins for i in range(1, num_bins)]
    long = df.select(
        F.posexplode(F.col(features_col).cast("array<double>")).alias(
            "feature", "val"
        )
    )
    probs_sql = ",".join(repr(p) for p in probs)
    if method == "approx":
        accuracy = max(1, int(round(1.0 / relative_error)))
        agg = F.expr(f"percentile_approx(val, array({probs_sql}), {accuracy})")
    elif method == "exact":
        agg = F.expr(f"percentile(val, array({probs_sql}))")
    else:
        raise ValueError(f"unknown method {method!r}")
    rows = long.groupBy("feature").agg(agg.alias("edges")).collect()
    dim = max(r["feature"] for r in rows) + 1 if rows else 0
    out: list[list[float]] = [[] for _ in range(dim)]
    for r in rows:
        seen: list[float] = []
        for e in r["edges"] or []:
            if e is not None and (not seen or e > seen[-1]):
                seen.append(float(e))
        out[r["feature"]] = seen
    return out


def apply_bin_edges(
    df: DataFrame,
    edges: list[list[float]],
    features_col: str = "features",
    output_col: str | None = None,
) -> DataFrame:
    """Replace each feature value with its bin id (as double):
    ``bin(x) = #{e in edges[i] : x > e}``.

    Pure Catalyst: the edge matrix is a 2D array literal indexed inside
    ``transform`` — per-row array arithmetic, zero shuffle, no UDF.
    """
    output_col = output_col or features_col
    edges_lit = F.array(
        *[F.array(*[F.lit(e) for e in row]) for row in edges]
    )
    binned = F.transform(
        F.col(features_col),
        lambda x, i: F.size(
            F.filter(F.element_at(edges_lit, i + F.lit(1)), lambda e: x > e)
        ).cast("double"),
    )
    return df.withColumn(output_col, binned)


def quantile_discretize(
    df: DataFrame,
    num_bins: int = 10,
    features_col: str = "features",
    method: str = "approx",
    relative_error: float = 1e-4,
    output_col: str | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Fit quantile edges on ``df`` and return (binned df, edges) —
    the one-call path from continuous raw features to the selector's
    ``discreteData=True`` contract."""
    edges = fit_quantile_edges(
        df, num_bins, features_col, method, relative_error
    )
    return apply_bin_edges(df, edges, features_col, output_col), edges
