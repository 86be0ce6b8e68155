"""Vector math over ``array<double>`` columns, pure Catalyst expressions.

The reference computes these inside RDD closures with breeze
(ReliefFRSelector.scala:358, 417, 439); here they are ``zip_with`` /
``aggregate`` expressions so they stay inside whole-stage codegen and
work identically in a 1000-executor plan.

The fold in :func:`sqdist` / :func:`dot_product` is a *left-to-right
sequential* fold (``F.aggregate``), which makes the floating-point sum
order deterministic — required for DuckDB-oracle bit-parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sqdist(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance between two array<double> columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    """sqrt(sqdist) — the reference's kNN metric (ReliefFRSelector.scala:358)."""
    return F.sqrt(sqdist(a, b))


def dot_product(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a||b|); 0 when either norm is 0."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)


def abs_diff_array(a: Column | str, b: Column | str) -> Column:
    """Element-wise |a_i - b_i| — the per-feature RELIEF 'diff'."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.zip_with(a, b, lambda x, y: F.abs(x - y))


def collision_vote(d: Column, continuous: bool = True) -> Column:
    """Collision vote for the redundancy estimator.

    Continuous: ``1 - min(6, d)/6`` (Chebyshev 6-sigma rationale,
    ReliefFRSelector.scala:136-141, 417). Discrete: the reference votes
    ``Double.MinPositiveValue`` and later divides it back out
    (ReliefFRSelector.scala:637-640); we vote 1.0 with factor 1.0 —
    identical semantics without denormal-float arithmetic.
    """
    if continuous:
        return F.lit(1.0) - F.least(F.lit(6.0), d) / F.lit(6.0)
    return F.lit(1.0)


def minmax_norm(x: Column, mn: Column, mx: Column) -> Column:
    """(x - min)/(max - min), guarded for max == min (SURVEY §8.5)."""
    return F.when(mx == mn, F.lit(0.0)).otherwise((x - mn) / (mx - mn))
