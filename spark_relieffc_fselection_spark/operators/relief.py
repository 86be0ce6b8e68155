"""RELIEF-F weighting + collision-redundancy as DataFrame aggregations.

This re-expresses the reference's hand-rolled per-partition breeze
accumulation (ReliefFRSelector.scala:377-602 dense/sparse paths) as a
long/exploded table + ``groupBy`` aggregations, so Catalyst's
partial/final hash aggregation does the map-side combine the reference
wrote by hand (SURVEY §4 'map-side combine' row).

Semantics implemented (citations into /root/reference):

* pair enumeration: each sampled query's k = numNeighbors * nClasses
  nearest neighbors *within the batch* (fit passes the batch itself to
  approxNNByPartition, ReliefFRSelector.scala:262 — not the full
  dataset, despite the :104-107 doc).
* relevance bins: per (feature, neighbor_label, same_class) sum of
  |q_f - n_f| (ReliefFRSelector.scala:435-441); class counter per bin
  (:436-437, :469).
* collapse: w(f) = sum over bins of sign * prior(neighbor_label) *
  bin_sum / bin_count, sign = -1 when neighbor shares the query's class
  (aggregateWeightsByFeat, ReliefFRSelector.scala:605-629).
* collisions: feature distance <= threshold votes 1 - min(6,d)/6
  (continuous, :417) or 1.0 (discrete; the reference uses
  Double.MinPositiveValue and divides it back out, :637-640).
  Threshold is the deterministic 6*(1-lowerDistanceThreshold) — the
  reference's randomized threshold goes negative for defaults and is a
  defect (SURVEY §8.3), so we keep the documented intent.
* joint co-occurrence: for a (query, neighbor) pair, every colliding
  feature pair (f1, f2), f1 != f2, with f1 in the previous batch's
  top features, contributes the mean of the two features' *current*
  votes to joint[f1][f2] and joint[f2][f1] (:449-457; the reference's
  stale ``pcounter`` reads are a defect, SURVEY §8.4 — we use
  current-pair votes only).
* MI transform + min-max: computeRedudancy (:632-679).
* greedy selection: selectFeatures (:685-732) — driver-side numpy;
  inherently sequential over a tiny (nFeat) frame.

Scale notes: all wide work is keyed by feature_idx or (f1, f2) — the
shuffle volume is O(sample * k * nFeat) for relevance and
O(sample * k * collisions^2) for the joint COO, independent of total
dataset size. The joint table is COO (absent = zero), fixing the
reference's dense per-feature row-vector memory hazard (SURVEY §7.3).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.functions.vector import minmax_norm
from spark_relieffc_fselection_spark.operators.knn import (
    auto_lsh_tables,
    knn_join,
    resolve_auto_strategy,
)

#: All floating-point SUMs accumulate through this decimal type: double
#: addition is order-sensitive and shuffle arrival order is
#: nondeterministic, so exact decimal accumulation is what makes the
#: engine's weights reproducible run-to-run (and bit-comparable against
#: a DuckDB oracle using the same convention).
#:
#: Full (38,18), deliberately: a narrower precision would make
#: cast(double AS decimal) return NULL for |x| >= 10^(p-18) and the
#: sums would silently DROP those rows (ANSI off). An interleaved
#: post-JIT A/B on the bin-stats aggregation showed no measurable
#: speed difference between (28,18) and (38,18), so the narrow type
#: bought nothing and carried a silent-overflow hazard for
#: non-contractual inputs.
DEC = "decimal(38,18)"


def pair_table(
    batch: DataFrame,
    neighbors: DataFrame,
    id_col: str = "id",
    features_col: str = "features",
    label_col: str = "label",
    instances: DataFrame | None = None,
) -> DataFrame:
    """(query, neighbor) pairs with both feature vectors attached.

    Returns ``(query_id, neighbor_id, n_label, same_class, q_features,
    n_features)``. Replaces the reference's positional (partition,
    offset) lookup (ReliefFRSelector.scala:423-433) with two equi-joins
    (SURVEY J3). This compact (pre-explode) form is the one worth
    caching: it is nFeat times smaller than the exploded long table,
    and re-deriving the explode from it is one in-core pass.

    ``instances`` supplies the NEIGHBOR side; it defaults to ``batch``
    (self-kNN) but MUST be the full corpus whenever ``neighbors`` was
    computed against a superset of the query batch — otherwise
    out-of-batch neighbors silently drop out of the join.
    """
    q = batch.select(
        F.col(id_col).alias("query_id"),
        F.col(features_col).alias("q_features"),
        F.col(label_col).alias("q_label"),
    )
    n = (instances if instances is not None else batch).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(features_col).alias("n_features"),
        F.col(label_col).alias("n_label"),
    )
    return (
        neighbors.select("query_id", "neighbor_id")
        .join(n, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("same_class", F.col("n_label") == F.col("q_label"))
    )


def explode_pairs(pairs: DataFrame) -> DataFrame:
    """Explode a ``pair_table`` result to per-feature rows
    ``(query_id, neighbor_id, n_label, same_class, feature_idx, fdist)``
    — the long form every downstream aggregation groups over."""
    from spark_relieffc_fselection_spark.functions.vector import abs_diff_array

    return pairs.select(
        "query_id",
        "neighbor_id",
        "n_label",
        "same_class",
        F.posexplode(abs_diff_array("q_features", "n_features")).alias(
            "feature_idx", "fdist"
        ),
    )


def pair_feature_table(
    batch: DataFrame,
    neighbors: DataFrame,
    id_col: str = "id",
    features_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """``explode_pairs(pair_table(...))`` — the one-shot convenience."""
    return explode_pairs(pair_table(batch, neighbors, id_col, features_col, label_col))


def relevance_weights(
    long_pairs: DataFrame,
    priors: dict[float, float],
    pair_counts: DataFrame | None = None,
) -> DataFrame:
    """Collapse per-feature class-bin sums into RELIEF relevance.

    ``(feature_idx, relevance)`` per aggregateWeightsByFeat
    (ReliefFRSelector.scala:605-629): bins where the neighbor shares the
    query's class subtract, others add, each weighted by the neighbor
    class's prior and normalized by the bin's pair count.
    """
    spark = long_pairs.sparkSession
    prior_df = F.broadcast(
        spark.createDataFrame(
            [(float(k), float(v)) for k, v in priors.items()],
            "n_label double, prior double",
        )
    )
    # The collapse divisor is the classCounter — the number of (query,
    # neighbor) PAIRS in the bin (ReliefFRSelector.scala:436-437, 469),
    # not the per-feature row count. They coincide for dense long
    # tables (every feature appears for every pair) but diverge for the
    # sparse path, where zero-zero feature slots are absent rows — and
    # a fully-inactive pair has NO rows at all, so sparse callers must
    # pass `pair_counts` (n_label, same_class, bin_cnt) computed from
    # the neighbor table itself.
    if pair_counts is None:
        pair_counts = (
            long_pairs.select("query_id", "neighbor_id", "n_label", "same_class")
            .distinct()
            .groupBy("n_label", "same_class")
            .agg(F.count("*").alias("bin_cnt"))
        )
    bin_sums = long_pairs.groupBy("feature_idx", "n_label", "same_class").agg(
        F.sum(F.col("fdist").cast(DEC)).alias("bin_sum"),
    )
    return _collapse_bins(bin_sums, prior_df, pair_counts)


def relevance_from_bins(
    bin_stats: DataFrame,
    priors: dict[float, float],
    pair_counts: DataFrame,
) -> DataFrame:
    """The A4 collapse applied to a precomputed ``feature_bin_stats``
    frame (any frame with feature_idx, n_label, same_class, bin_sum)."""
    spark = bin_stats.sparkSession
    prior_df = F.broadcast(
        spark.createDataFrame(
            [(float(k), float(v)) for k, v in priors.items()],
            "n_label double, prior double",
        )
    )
    return _collapse_bins(bin_stats, prior_df, pair_counts)


def _collapse_bins(
    bin_sums: DataFrame, prior_df: DataFrame, pair_counts: DataFrame
) -> DataFrame:
    return (
        bin_sums.join(pair_counts, ["n_label", "same_class"])
        .join(prior_df, "n_label")
        .withColumn(
            "contrib",
            F.when(F.col("same_class"), F.lit(-1.0)).otherwise(F.lit(1.0))
            * F.col("prior")
            * F.col("bin_sum").cast("double")
            / F.col("bin_cnt"),
        )
        .groupBy("feature_idx")
        .agg(F.sum(F.col("contrib").cast(DEC)).cast("double").alias("relevance"))
    )


def feature_bin_stats(
    long_pairs: DataFrame,
    continuous: bool,
    lower_distance_threshold: float,
) -> DataFrame:
    """ONE aggregation pass producing the sufficient statistics for
    relevance (A3: per-class-bin distance sums) AND the marginal
    collision mass / counts (A5) — instead of three separate scans of
    the exploded long table.

    Returns ``(feature_idx, n_label, same_class, bin_sum, vote_sum,
    n_collisions)``; ~nFeat x nClasses x 2 rows, tiny at any scale.
    ``relevance_from_bins`` collapses ``bin_sum``; summing ``vote_sum``
    / ``n_collisions`` over bins reproduces ``marginal_counts`` and the
    per-feature collision counts exactly (decimal addition is
    associative, so the two-level sum is bit-identical).
    """
    from spark_relieffc_fselection_spark.functions.vector import collision_vote

    threshold = 6.0 * (1.0 - lower_distance_threshold) if continuous else 0.0
    is_coll = F.col("fdist") <= F.lit(threshold)
    vote = collision_vote(F.col("fdist"), continuous)
    return long_pairs.groupBy("feature_idx", "n_label", "same_class").agg(
        F.sum(F.col("fdist").cast(DEC)).alias("bin_sum"),
        F.sum(F.when(is_coll, vote).otherwise(F.lit(0.0)).cast(DEC)).alias("vote_sum"),
        F.sum(F.when(is_coll, F.lit(1)).otherwise(F.lit(0))).alias("n_collisions"),
        # Per-bin row count == per-bin PAIR count for dense long tables
        # (every pair emits every feature); lets dense callers collapse
        # without a separate pair-count job.
        F.count("*").alias("n_rows"),
    )


def per_feature_stats(
    bin_stats: DataFrame,
    priors: dict[float, float],
) -> DataFrame:
    """ONE job collapsing ``feature_bin_stats`` (dense path) into every
    per-feature statistic the relief pipeline serves: relevance (A4),
    marginal collision mass (A5), and collision counts.

    Returns ``(feature_idx, relevance, marginal, n_collisions)``.
    Decimal-identical to running ``relevance_from_bins`` plus the two
    marginal aggregations separately (the contributions summed are the
    same values in the same decimal type; only the number of Spark jobs
    changes). Dense-only: uses ``n_rows`` as the bin's pair count.
    """
    spark = bin_stats.sparkSession
    prior_df = F.broadcast(
        spark.createDataFrame(
            [(float(k), float(v)) for k, v in priors.items()],
            "n_label double, prior double",
        )
    )
    contrib = (
        F.when(F.col("same_class"), F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.col("prior")
        * F.col("bin_sum").cast("double")
        / F.col("n_rows")
    )
    return (
        bin_stats.join(prior_df, "n_label")
        .groupBy("feature_idx")
        .agg(
            F.sum(contrib.cast(DEC)).cast("double").alias("relevance"),
            F.sum("vote_sum").cast("double").alias("marginal"),
            F.sum("n_collisions").alias("n_collisions"),
        )
    )


def collision_table(
    long_pairs: DataFrame,
    continuous: bool,
    lower_distance_threshold: float,
) -> DataFrame:
    """Per-(pair, feature) collision votes.

    Continuous: collision iff fdist <= 6*(1-lowerDistanceThreshold),
    vote = 1 - min(6, fdist)/6. Discrete: collision iff fdist == 0,
    vote = 1. (ReliefFRSelector.scala:417, 431, 444; deterministic
    threshold per SURVEY §8.3.)
    """
    from spark_relieffc_fselection_spark.functions.vector import collision_vote

    threshold = 6.0 * (1.0 - lower_distance_threshold) if continuous else 0.0
    vote = collision_vote(F.col("fdist"), continuous)
    return (
        long_pairs.filter(F.col("fdist") <= F.lit(threshold))
        .select("query_id", "neighbor_id", "feature_idx", vote.alias("vote"))
    )


def marginal_counts(collisions: DataFrame) -> DataFrame:
    """Per-feature marginal collision mass (SURVEY A5)."""
    return collisions.groupBy("feature_idx").agg(
        F.sum(F.col("vote").cast(DEC)).cast("double").alias("marginal")
    )


#: joint_counts uses the grouped-combos plan (one shuffle, per-pair
#: arrays) when the per-pair collision count is bounded by this many
#: features; wider spaces fall back to the self-join plan whose memory
#: per task is O(1) rows.
_JOINT_COMBOS_MAX_FEATURES = 16_384


def joint_counts(
    collisions: DataFrame,
    top_features: list[int] | None,
    continuous: bool,
    num_features: int | None = None,
) -> DataFrame:
    """Pairwise co-occurrence COO table (SURVEY A6).

    For each (query, neighbor) pair, every colliding feature pair
    (f1, f2), f1 != f2 with f1 in ``top_features``, contributes the
    joint vote to BOTH orientations (the reference's symmetric double
    update, ReliefFRSelector.scala:453-454). Joint vote = mean of the
    two features' current votes (continuous) or the left vote
    (discrete; identical since discrete votes are all 1.0).

    Physical strategy: when the per-pair collision set is provably
    small (``num_features`` <= _JOINT_COMBOS_MAX_FEATURES), group the
    collisions into one array per pair and generate combinations
    in-stage — ONE shuffle of the narrow collision rows, and the
    combination explosion feeds straight into partial aggregation
    (never shuffled). Otherwise self-join on the pair id (two shuffles
    but O(1) memory per row) — the safe plan for millions of features.
    """
    if top_features is not None and len(top_features) == 0:
        spark = collisions.sparkSession
        return spark.createDataFrame([], "f1 int, f2 int, joint double")
    use_combos = (
        num_features is not None and num_features <= _JOINT_COMBOS_MAX_FEATURES
    )
    if use_combos:
        ordered = _joint_combos(collisions, top_features, continuous)
    else:
        ordered = _joint_selfjoin(collisions, top_features, continuous)
    return _mirror_and_sum(ordered, continuous)


def joint_counts_from_pairs(
    pairs: DataFrame,
    top_features: list[int] | None,
    continuous: bool,
    lower_distance_threshold: float,
    num_features: int,
) -> DataFrame:
    """:func:`joint_counts` computed straight from a compact
    :func:`pair_table` frame (``q_features`` / ``n_features`` arrays).

    Decimal-identical to ``joint_counts(collision_table(explode_pairs(
    pairs), ...), ...)`` — the per-element distance (``abs(q - n)``),
    collision test (``fdist <= threshold``), and vote expressions are
    the same IEEE operations, and the aggregation tail is shared — but
    the physical plan is far cheaper: the generic path explodes the
    pair table to per-feature rows only to ``collect_list`` them back
    into per-pair arrays (a full shuffle plus an ObjectHashAggregate
    build), while the pair rows ALREADY hold both vectors. Here the
    per-pair collision array is one narrow higher-order-function
    projection — no exchange at all before the final tiny
    (f1, f2)-keyed aggregation.

    Because there is no exchange, the combination explode inherits
    ``pairs``' partitioning verbatim — pass a frame spread across
    cores (every internal caller feeds a ``repartition``-ed cache); a
    single-partition input would serialize the widest stage.
    """
    if top_features is not None and len(top_features) == 0:
        spark = pairs.sparkSession
        return spark.createDataFrame([], "f1 int, f2 int, joint double")
    threshold = 6.0 * (1.0 - lower_distance_threshold) if continuous else 0.0
    # (f, d) per colliding slot; d kept through the filter so the
    # collision predicate compares the SAME double the generic path
    # filters on (deriving it back from the vote would re-round).
    fd = F.filter(
        F.transform(
            F.zip_with("q_features", "n_features", lambda x, y: F.abs(x - y)),
            lambda d, i: F.struct(i.alias("f"), d.alias("d")),
        ),
        lambda s: s["d"] <= F.lit(threshold),
    )
    if continuous:
        fv = F.transform(
            fd,
            lambda s: F.struct(
                s["f"].alias("f"),
                (
                    F.lit(1.0) - F.least(F.lit(6.0), s["d"]) / F.lit(6.0)
                ).alias("v"),
            ),
        )
    else:
        fv = F.transform(fd, lambda s: s["f"])
    arrays = pairs.select(fv.alias("fv"))
    get_f = (lambda s: s["f"]) if continuous else (lambda s: s)
    if top_features is not None:
        top_lit = F.array(*[F.lit(int(f)) for f in top_features])
        left = F.filter("fv", lambda s: F.array_contains(top_lit, get_f(s)))
    else:
        left = F.col("fv")
    if num_features <= _JOINT_COMBOS_MAX_FEATURES:
        ex = (
            arrays.select(F.explode(left).alias("a"), "fv")
            .select("a", F.explode("fv").alias("b"))
            .filter(get_f(F.col("a")) != get_f(F.col("b")))
        )
        if continuous:
            jv = (F.col("a.v") + F.col("b.v")) / 2.0
            ordered = ex.select(
                F.col("a.f").alias("f1"), F.col("b.f").alias("f2"), jv.alias("jv")
            )
        else:
            ordered = ex.select(
                F.col("a").alias("f1"), F.col("b").alias("f2"), F.lit(1.0).alias("jv")
            )
        return _mirror_and_sum(ordered, continuous)
    # Wide feature spaces: per-pair combination arrays would not be
    # memory-bounded — explode back to long collision rows and take the
    # O(1)-memory self-join plan.
    long_coll = pairs.select(
        "query_id", "neighbor_id", fv.alias("fv")
    ).select(
        "query_id",
        "neighbor_id",
        F.explode("fv").alias("e"),
    )
    if continuous:
        long_coll = long_coll.select(
            "query_id",
            "neighbor_id",
            F.col("e.f").alias("feature_idx"),
            F.col("e.v").alias("vote"),
        )
    else:
        long_coll = long_coll.select(
            "query_id",
            "neighbor_id",
            F.col("e").alias("feature_idx"),
            F.lit(1.0).alias("vote"),
        )
    return _mirror_and_sum(
        _joint_selfjoin(long_coll, top_features, continuous), continuous
    )


def _mirror_and_sum(ordered: DataFrame, continuous: bool) -> DataFrame:
    # Aggregate ONE orientation per ordered (a in scope, b) combo, then
    # mirror the TINY aggregated COO: joint(f1,f2) = agg(f1,f2) +
    # agg(f2,f1) because each unordered collision contributes the same
    # jv to both cells. Halves the rows through the expensive decimal
    # aggregation (the combination explode is the pipeline's widest
    # stage); decimal addition is associative, so regrouping the sum is
    # bit-identical to the orientation-exploded plan.
    #
    # Discrete data: every vote is exactly 1.0 (collision_table), so
    # sum(jv) IS the combo count — a plain long count, no decimal at
    # all, bit-identical to summing ones in any order.
    if continuous:
        agg = ordered.groupBy("f1", "f2").agg(
            F.sum(F.col("jv").cast(DEC)).alias("j_part")
        )
    else:
        agg = ordered.groupBy("f1", "f2").agg(
            F.count("*").cast(DEC).alias("j_part")
        )
    # Mirror in ONE pass over the aggregated rows: a self-union
    # (agg.unionByName(agg.select(...))) would embed the un-cached agg
    # subplan TWICE in the physical plan, and Spark executes both
    # branches — the combination explode (this pipeline's single widest
    # stage) would run twice per batch. Exploding both orientations
    # from each aggregated row keeps the expensive subtree unique;
    # the per-row array covers 2 tiny structs, nothing corpus-sized.
    mirrored = agg.select(
        F.explode(
            F.array(
                F.struct(F.col("f1"), F.col("f2"), F.col("j_part")),
                F.struct(
                    F.col("f2").alias("f1"),
                    F.col("f1").alias("f2"),
                    F.col("j_part"),
                ),
            )
        ).alias("e")
    ).select("e.f1", "e.f2", "e.j_part")
    return mirrored.groupBy("f1", "f2").agg(
        F.sum("j_part").cast("double").alias("joint")
    )


def _joint_combos(
    collisions: DataFrame, top_features: list[int] | None, continuous: bool
) -> DataFrame:
    # The grouped per-pair table is tiny in BYTES, so AQE coalesces it
    # to ~1 partition — but the combination explode below multiplies
    # each row by O(|top| * collisions), so a byte-based coalesce here
    # serializes the whole expensive stage. Spread the compact rows
    # across cores first; the shuffle moves only ~1 array row per pair.
    par = collisions.sparkSession.sparkContext.defaultParallelism
    # Discrete votes are all 1.0 and the downstream aggregation counts
    # rows — collect bare feature indices (half the array bytes, no
    # struct boxing in the explode).
    elem = (
        F.struct(F.col("feature_idx").alias("f"), F.col("vote").alias("v"))
        if continuous
        else F.col("feature_idx")
    )
    fv = (
        collisions.groupBy("query_id", "neighbor_id")
        .agg(F.collect_list(elem).alias("fv"))
        .repartition(par, "query_id", "neighbor_id")
    )
    get_f = (lambda s: s["f"]) if continuous else (lambda s: s)
    if top_features is not None:
        top_lit = F.array(*[F.lit(int(f)) for f in top_features])
        left = F.filter("fv", lambda s: F.array_contains(top_lit, get_f(s)))
    else:
        left = F.col("fv")
    ex = (
        fv.select(F.explode(left).alias("a"), "fv")
        .select("a", F.explode("fv").alias("b"))
        .filter(get_f(F.col("a")) != get_f(F.col("b")))
    )
    if continuous:
        jv = (F.col("a.v") + F.col("b.v")) / 2.0
        return ex.select(
            F.col("a.f").alias("f1"), F.col("b.f").alias("f2"), jv.alias("jv")
        )
    return ex.select(
        F.col("a").alias("f1"), F.col("b").alias("f2"), F.lit(1.0).alias("jv")
    )


def _joint_selfjoin(
    collisions: DataFrame, top_features: list[int] | None, continuous: bool
) -> DataFrame:
    a = collisions.select(
        "query_id", "neighbor_id",
        F.col("feature_idx").alias("fa"), F.col("vote").alias("va"),
    )
    b = collisions.select(
        "query_id", "neighbor_id",
        F.col("feature_idx").alias("fb"), F.col("vote").alias("vb"),
    )
    if top_features is not None:
        a = a.filter(F.col("fa").isin([int(f) for f in top_features]))
    paired = a.join(b, ["query_id", "neighbor_id"]).filter(F.col("fa") != F.col("fb"))
    jv = ((F.col("va") + F.col("vb")) / 2.0) if continuous else F.col("va")
    return paired.select(
        F.col("fa").alias("f1"), F.col("fb").alias("f2"), jv.alias("jv")
    )


def mi_redundancy(
    joint: DataFrame,
    marginal: DataFrame,
    total: float,
    joint_total: float,
) -> DataFrame:
    """MI-style entropy transform + global min-max (SURVEY A10).

    red(f1,f2) = jprob*log2(jprob/(p1*p2)) with NaN/inf -> 0
    (computeRedudancy, ReliefFRSelector.scala:645-661), then min-max
    normalized over all entries (:663-676).
    """
    m = marginal.select(
        "feature_idx", (F.col("marginal") / F.lit(total)).alias("p")
    )
    jp = (
        joint.join(m.withColumnRenamed("feature_idx", "f1").withColumnRenamed("p", "p1"), "f1")
        .join(m.withColumnRenamed("feature_idx", "f2").withColumnRenamed("p", "p2"), "f2")
        .withColumn("jprob", F.col("joint") / F.lit(joint_total))
        .withColumn(
            "red_raw",
            F.col("jprob") * F.log2(F.col("jprob") / (F.col("p1") * F.col("p2"))),
        )
        .withColumn(
            "red_raw",
            F.when(
                F.isnan("red_raw") | F.col("red_raw").isNull() | (F.col("p1") * F.col("p2") == 0),
                F.lit(0.0),
            ).otherwise(F.col("red_raw")),
        )
    )
    # ONE action, not a min/max pass plus a normalize pass (r12
    # optimization): the COO is bounded by the topFeatures scope (every
    # fit caller collects it to a driver dict anyway), but ``jp``'s
    # UPSTREAM is not free — in the single-pass fits the joint
    # aggregation is consumed only here, so a second action re-ran the
    # whole collision self-join/combos subplan (measured: two complete
    # executions in the q44/q158 stage profiles). Collect the raw
    # entries once and apply the min-max on the driver: (x - mn) /
    # (mx - mn) over collected float64s is the same IEEE arithmetic
    # Spark's minmax_norm projection evaluates, so the values are
    # bit-identical; min/max themselves involve no arithmetic at all.
    # The log2 transform deliberately STAYS in Spark (above): JVM and
    # CPython log2 are not guaranteed to round identically.
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            jp.schema["f1"],
            jp.schema["f2"],
            StructField("redundancy", DoubleType(), True),
        ]
    )
    spark = jp.sparkSession
    rows = jp.select("f1", "f2", "red_raw").collect()
    if not rows:
        return spark.createDataFrame([], out_schema)
    mn = min(r["red_raw"] for r in rows)
    mx = max(r["red_raw"] for r in rows)
    span = mx - mn
    return spark.createDataFrame(
        [
            (
                r["f1"],
                r["f2"],
                0.0 if mx == mn else (r["red_raw"] - mn) / span,
            )
            for r in rows
        ],
        out_schema,
    )


def greedy_select(
    relevance: np.ndarray,
    redundancy_coo: dict[tuple[int, int], float],
    num_top_features: int,
) -> list[int]:
    """Greedy relevance-vs-redundancy selection (SURVEY T5).

    Driver-side sequential arg-max over a tiny frame, matching
    selectFeatures (ReliefFRSelector.scala:685-732): each round, the
    last-selected feature's joint entries update the still-valid
    features they touch, incrementing a PER-FEATURE update counter
    (FeatureScore.update, :757-760 — selectedSize is per feature, not
    global); score = relevance - redundance/selectedSize, falling back
    to pure relevance while a feature has received no joint entry
    (FeatureScore.score, :742-747). With a sparse COO — joint entries
    exist only for colliding pairs inside the topFeatures scope — a
    feature updated in only some rounds must NOT have its penalty
    diluted by rounds it sat out. Ties resolve to the lowest feature
    index (the reference's scan uses strict '>').
    """
    n_feat = len(relevance)
    k = min(num_top_features, n_feat)
    red_acc = np.zeros(n_feat)
    upd_cnt = np.zeros(n_feat, dtype=np.int64)
    valid = np.ones(n_feat, dtype=bool)
    # Pre-index the COO by its first key: the loop below touches only
    # the last-selected feature's row each round.
    by_f1: dict[int, list[tuple[int, float]]] = {}
    for (f1, f2), v in redundancy_coo.items():
        by_f1.setdefault(f1, []).append((f2, v))

    first = int(np.lexsort((np.arange(n_feat), -relevance))[0])
    selected = [first]
    valid[first] = False
    while len(selected) < k:
        last = selected[-1]
        for f2, v in by_f1.get(last, ()):
            if valid[f2]:
                red_acc[f2] += v
                upd_cnt[f2] += 1
        score = np.where(
            upd_cnt > 0,
            relevance - red_acc / np.maximum(upd_cnt, 1),
            relevance,
        )
        score = np.where(valid, score, -np.inf)
        best = int(np.argmax(score))  # argmax takes the first max -> lowest idx
        if not np.isfinite(score[best]):
            break
        selected.append(best)
        valid[best] = False
    return selected


def std_ranking(relevance: np.ndarray, num_top_features: int) -> list[int]:
    """Standard RELIEF ranking: by (-relevance, feature_idx)
    (ReliefFRSelector.scala:688-690)."""
    order = np.lexsort((np.arange(len(relevance)), -relevance))
    return [int(i) for i in order[: min(num_top_features, len(relevance))]]


#: Feature-space width beyond which the SPARSE fit keeps its driver
#: state COO (dict keyed by active feature) instead of dense ndarrays:
#: at the reference's own 30M-feature claim (README.md:11, kddb) a
#: np.zeros(n_features) is a ~240 MB allocation PER ARRAY on the
#: driver for a frame that is sparse by construction (VERDICT r8 #7).
#: Below the threshold dense numpy is both faster and simpler.
DENSE_RELEVANCE_MAX_FEATURES = 1 << 18


class SparseRelevance:
    """O(active-features) stand-in for the dense relevance ndarray past
    ``DENSE_RELEVANCE_MAX_FEATURES``: a normalized-value dict plus the
    shared default every absent (never-active) feature takes — absent
    features all carry raw relevance 0.0, which min-max normalizes to
    one common value. Supports the two consumer operations the result
    contract needs (indexing and len); iterating densifies and is only
    for narrow-width consumers."""

    __slots__ = ("data", "default", "n")

    def __init__(self, data: dict[int, float], default: float, n: int) -> None:
        self.data = data
        self.default = default
        self.n = int(n)

    def __getitem__(self, i: int) -> float:
        return self.data.get(int(i), self.default)

    def __len__(self) -> int:
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield self.data.get(i, self.default)


def normalize_relevance_coo(
    present: dict[int, float], n_features: int
) -> tuple[dict[int, float], float]:
    """Min-max normalize raw relevance held as a COO dict — the global
    extrema include the implicit raw 0.0 of absent features whenever
    any exist, exactly like the dense ``relevance.min()/.max()`` over
    an array initialized to zeros. Returns (normalized dict, the
    normalized value of absent features). Degenerate range -> all 0.0
    (dense-path behavior)."""
    has_absent = len(present) < n_features
    vals = present.values()
    mn = min(vals, default=0.0)
    mx = max(vals, default=0.0)
    if has_absent:
        mn, mx = min(mn, 0.0), max(mx, 0.0)
    if mx <= mn:
        return ({f: 0.0 for f in present}, 0.0)
    scale = mx - mn
    return (
        {f: (v - mn) / scale for f, v in present.items()},
        (0.0 - mn) / scale if has_absent else 0.0,
    )


def std_ranking_coo(
    rel: dict[int, float], default: float, n_features: int, num_top_features: int
) -> list[int]:
    """:func:`std_ranking` over COO relevance without densifying:
    absent features all tie at ``default``, so only the k smallest
    absent indices can ever reach the top-k — merge them with the
    present entries and rank by (-value, index)."""
    k = min(num_top_features, n_features)
    absent: list[int] = []
    i = 0
    while len(absent) < k and i < n_features:
        if i not in rel:
            absent.append(i)
        i += 1
    cands = list(rel.items()) + [(f, default) for f in absent]
    cands.sort(key=lambda kv: (-kv[1], kv[0]))
    return [int(f) for f, _ in cands[:k]]


def greedy_select_coo(
    rel: dict[int, float],
    default: float,
    n_features: int,
    redundancy_coo: dict[tuple[int, int], float],
    num_top_features: int,
) -> list[int]:
    """:func:`greedy_select` over COO relevance — identical semantics
    (per-feature update counters, relevance fallback while untouched,
    lowest-index tie break), O(active + |COO|) driver state instead of
    three O(n_features) arrays. The arg-max each round only needs the
    present/penalized features plus ONE representative untouched-absent
    feature: all such features score exactly ``default``, and ties
    resolve to the lowest index."""
    k = min(num_top_features, n_features)
    if k <= 0:
        return []
    by_f1: dict[int, list[tuple[int, float]]] = {}
    for (f1, f2), v in redundancy_coo.items():
        by_f1.setdefault(f1, []).append((f2, v))
    red_acc: dict[int, float] = {}
    upd_cnt: dict[int, int] = {}
    selected: list[int] = []
    selected_set: set[int] = set()

    def score(f: int) -> float:
        c = upd_cnt.get(f, 0)
        base = rel.get(f, default)
        return base - red_acc.get(f, 0.0) / c if c > 0 else base

    def first_clean_absent() -> int | None:
        # smallest index that is unselected, inactive AND unpenalized —
        # the canonical representative of every feature scoring default
        i = 0
        while i < n_features:
            if i not in selected_set and i not in rel and i not in upd_cnt:
                return i
            i += 1
        return None

    def argmax() -> int | None:
        best_f, best_s = None, -math.inf
        for f in rel.keys() | upd_cnt.keys():
            if f in selected_set:
                continue
            s = score(f)
            if s > best_s or (s == best_s and (best_f is None or f < best_f)):
                best_f, best_s = f, s
        fa = first_clean_absent()
        if fa is not None and (
            best_f is None
            or default > best_s
            or (default == best_s and fa < best_f)
        ):
            best_f = fa
        return best_f

    while len(selected) < k:
        best = argmax()
        if best is None:
            break
        selected.append(best)
        selected_set.add(best)
        for f2, v in by_f1.get(best, ()):
            if f2 not in selected_set:
                red_acc[f2] = red_acc.get(f2, 0.0) + v
                upd_cnt[f2] = upd_cnt.get(f2, 0) + 1
    return selected


@dataclass
class ReliefFitResult:
    """Everything fit produces; arrays are indexed by feature_idx.

    ``relevance`` is a dense ndarray except on the sparse path past
    ``DENSE_RELEVANCE_MAX_FEATURES``, where it is a
    :class:`SparseRelevance` (same indexing/len contract, O(active)
    driver memory — VERDICT r8 #7)."""

    relevance: "np.ndarray | SparseRelevance"  # min-max normalized weight
    std_selection: list[int]           # top-k by relevance
    redundancy_selection: list[int]    # greedy relevance-vs-redundancy
    n_features: int
    n_instances: int
    priors: dict[float, float]
    redundancy_coo: dict[tuple[int, int], float] = field(default_factory=dict)
    #: how many batches the sample actually split into — callers that
    #: mirror the dataflow externally (the q72c oracle hard-codes 2)
    #: can fail loudly instead of silently desynchronizing when the
    #: broadcast-memory guard raises it at scale.
    n_batches: int = 1
    #: the kNN strategy the fit ACTUALLY ran (== the requested one
    #: unless 'auto' was requested, in which case it is the escalation
    #: tier resolve_auto_strategy picked). 'lsh' means the neighbor-
    #: hoods — and therefore the weights — are approximate; 'auto'
    #: resolving there also emits a warnings.warn so a 100 TB fit can
    #: never silently degrade exactness (VERDICT r8 #2). The sparse
    #: fit reports 'sparse-inverted/probe' or '/grid' — which
    #: no-overlap route its density heuristic actually took (both
    #: exact; cost-only, VERDICT r9 #5).
    resolved_knn_strategy: str = "numpy"


def _collapse_bins_local(
    bins_rows,
    pair_counts: dict[tuple[float, bool], int],
    priors: dict[float, float],
) -> tuple[dict[int, float], dict[int, float]]:
    """Driver-side replication of :func:`_collapse_bins` plus the
    marginal collapse, over a COLLECTED ``feature_bin_stats`` frame
    (r12 optimization — the per-batch aggregate is nFeat x nClasses x 2
    rows, so collecting it once replaces three cached-DataFrame round
    trips per batch).

    Bit-exact by construction: the contrib expression replays Spark's
    ``((sign * prior) * cast(bin_sum as double)) / bin_cnt`` with the
    same IEEE-754 operation order; the decimal accumulation replays
    ``sum(cast(contrib as DECIMAL(38,18)))`` via
    ``Decimal(repr(x)).quantize(1e-18, HALF_UP)`` — Spark's double->
    decimal cast goes through BigDecimal.valueOf(Double.toString),
    and ``repr``'s shortest round-trip string quantizes identically
    (verified over 1M doubles spanning the engine's magnitude ranges,
    0 mismatches; scripts in OPTIMIZATION_r12.md). The final
    ``cast(.. as double)`` is ``float(Decimal)`` — both correctly
    rounded. The marginal is an exact decimal sum of the collected
    ``vote_sum`` values, matching ``sum(vote_sum).cast('double')``.

    ``bins_rows``: iterable of (feature_idx, n_label, same_class,
    bin_sum Decimal, vote_sum Decimal). Returns (relevance_by_feature,
    marginal_by_feature) as plain float dicts.
    """
    from decimal import ROUND_HALF_UP, Decimal

    q18 = Decimal("1E-18")
    zero = Decimal(0)
    rel_acc: dict[int, Decimal] = {}
    marg_acc: dict[int, Decimal] = {}
    for f, lbl, sc, bin_sum, vote_sum in bins_rows:
        f = int(f)
        # Diagnosable failure instead of a bare KeyError (ADVICE r12):
        # the old Spark _collapse_bins inner-join silently DROPPED bins
        # with no matching pair-count/prior row; that is unreachable
        # when bins and counts derive from the same neighbor table, so
        # a miss here means a caller passed partial inputs — name it.
        bin_cnt_raw = pair_counts.get((lbl, sc))
        prior = priors.get(lbl)
        if bin_cnt_raw is None or prior is None:
            raise ValueError(
                f"_collapse_bins_local: bin (label={lbl!r}, "
                f"same_class={sc!r}) has no matching "
                f"{'pair count' if bin_cnt_raw is None else 'prior'} — "
                "bins and pair_counts/priors must derive from the same "
                "neighbor table"
            )
        bin_cnt = float(bin_cnt_raw)
        sign = -1.0 if sc else 1.0
        contrib = ((sign * prior) * float(bin_sum)) / bin_cnt
        rel_acc[f] = rel_acc.get(f, zero) + Decimal(repr(contrib)).quantize(
            q18, rounding=ROUND_HALF_UP
        )
        if vote_sum is not None:
            marg_acc[f] = marg_acc.get(f, zero) + vote_sum
    return (
        {f: float(v) for f, v in rel_acc.items()},
        {f: float(v) for f, v in marg_acc.items()},
    )


def fit_relief(
    df: DataFrame,
    *,
    id_col: str = "id",
    features_col: str = "features",
    label_col: str = "label",
    num_top_features: int = 10,
    num_neighbors: int = 10,
    estimation_ratio: float = 0.25,
    batch_size: float = 0.25,
    lower_feature_threshold: float = 3.0,
    lower_distance_threshold: float = 0.8,
    redundancy_removal: bool = True,
    discrete_data: bool = False,
    seed: int = 12345,
    knn_strategy: str = "numpy",
    exclude_self: bool = True,
    batching: str = "random",
    sampling: str = "engine",
    lsh_probe_radius: int = 1,
    lsh_tables: int | None = None,
) -> ReliefFitResult:
    """Full fit dataflow (ReliefFRSelector.scala:199-325, DataFrame IR).

    sample -> randomSplit batches -> per batch: kNN within batch ->
    pair table -> relevance bins + collision stats; batch top-N feeds
    the next batch's joint-stat scope -> union-sum -> min-max -> MI ->
    greedy selection.

    DELIBERATE DEVIATION (SURVEY §8.5): per batch this engine scans
    the BATCH for neighbors, while the reference scans the FULL
    dataset per batch (``approxNNByPartition(modelDataset,
    bFullQuery)``, ReliefFRSelector.scala:262) — the two coincide
    exactly at estimationRatio=1.0 with a single batch (every
    oracle-gated config). Under batching, within-batch kNN is
    O(sum batch_i^2) instead of O(sampled x N) — at the reference's
    own headline scale (64M rows, README.md:15-17) scanning the full
    corpus once per batch is the quadratic term that caps scaling,
    and the weights remain unbiased because every batch is a uniform
    subsample. q72c's oracle reproduces THIS engine's semantics
    end-to-end, so the deviation itself is hash-pinned.
    """
    from spark_relieffc_fselection_spark.functions.timing import stage_timer

    _mark = stage_timer("fit")

    if batching not in ("random", "hash"):
        raise ValueError(f"unknown batching mode {batching!r}")
    if sampling not in ("engine", "hash"):
        raise ValueError(f"unknown sampling mode {sampling!r}")
    if knn_strategy not in ("sql", "numpy", "numpy-gemm", "lsh", "auto"):
        raise ValueError(f"unknown knn_strategy {knn_strategy!r}")
    spark = df.sparkSession
    instances = df.select(
        F.col(id_col).alias("id"),
        F.col(features_col).cast("array<double>").alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    # ONE profiling job: per-class counts (-> priors + total) and a
    # feature row (-> dimensionality) — vs count() + first() + a
    # priors collect as three separate scans. In hash-sampling mode
    # the SAMPLED size rides the same job as a conditional count (the
    # draw is a pure function of the id, so the predicate evaluated
    # here and in the filter below selects the identical row set) —
    # one fewer action AND one fewer full pass over the instance set;
    # engine mode can't fuse (Spark's sample draw is partition-seeded,
    # not a column expression) and keeps its count below.
    fuse_sampled = estimation_ratio < 1.0 and sampling == "hash"
    if fuse_sampled:
        from spark_relieffc_fselection_spark.operators.sampling import (
            hash_uniform,
        )
    aggs = [F.count("*").alias("n"), F.first("features").alias("fx")]
    if fuse_sampled:
        aggs.append(
            F.count(
                F.when(hash_uniform(F.col("id")) < estimation_ratio, 1)
            ).alias("ns")
        )
    label_rows = instances.groupBy("label").agg(*aggs).collect()
    if not label_rows:
        raise ValueError(
            "fit_relief requires a non-empty dataset "
            "(the reference would NPE on head(); we fail with intent)"
        )
    _mark("profile")
    n_elems = sum(r["n"] for r in label_rows)
    n_feat = len(label_rows[0]["fx"]) if label_rows else 0
    priors = {float(r["label"]): r["n"] / n_elems for r in label_rows}
    n_classes = len(priors)
    k = num_neighbors * n_classes
    lower_feat = max(num_top_features, round(lower_feature_threshold * num_top_features))

    # sampling='engine': the reference's engine-seeded Bernoulli
    # (ReliefFRSelector.scala:223) — statistically right, but its draw
    # sequence is Spark-internal, so the sampled fit can only be
    # rows-only checked (q72). sampling='hash': the same uniform draw
    # from a portable md5 of the row id (operators/sampling.hash_uniform,
    # DuckDB spelling documented there) — re-run-stable, engine-
    # independent, which puts the SAMPLED fit under the full SQL oracle
    # (q72d). Seed does not participate in hash mode: the draw is a
    # function of the id, the property that makes it replayable.
    if estimation_ratio >= 1.0:
        sample = instances
        sampled_size = n_elems
    elif sampling == "hash":
        sample = instances.filter(hash_uniform(F.col("id")) < estimation_ratio)
        sampled_size = sum(int(r["ns"]) for r in label_rows)
    else:
        sample = instances.sample(fraction=estimation_ratio, seed=seed)
        sampled_size = sample.count()
    # Broadcast-memory guard (ReliefFRSelector.scala:225-228): a batch
    # rides to every executor, so its fraction is capped such that
    # rows x (nFeat + 2) doubles stays under ~2 GiB.
    max_size_allowed = (2**31 - 1) / 8.0 / (n_feat + 2) / max(sampled_size, 1)
    max_batch = min(batch_size, max_size_allowed) if max_size_allowed > 0 else batch_size
    n_batches = max(1, int(1.0 / max_batch))

    batch_rows = max(1, sampled_size // n_batches)
    if knn_strategy == "auto":
        # Escalate numpy -> numpy-gemm -> lsh by the within-batch
        # distance-kernel volume (VERDICT r6 #3). Every batch has the
        # same expected size, so resolve ONCE — all cardinalities come
        # from the single profiling job above, no extra actions. The
        # oracle-gated fits (q72/q72c) pin exact strategies explicitly
        # and never take this branch.
        knn_strategy = resolve_auto_strategy(batch_rows, batch_rows, n_feat)
        if knn_strategy == "lsh":
            # The one resolution that changes RESULTS, not just cost:
            # LSH candidates are approximate (multiprobe recall 1.0 on
            # discrete KAIS regimes, ~0.70 on continuous data at auto-
            # sized tables — SCALE.md). An ops team running 'auto' at
            # 100 TB must see the exactness boundary get crossed, not
            # discover it in the weights (VERDICT r8 #2).
            import warnings

            warnings.warn(
                "fit_relief: knn_strategy='auto' escalated to the "
                "APPROXIMATE 'lsh' tier (~%.1e distance-kernel cells "
                "per batch exceeds the exact-scan budget). Weights are "
                "now approximate; raise lsh_tables / keep multiprobe "
                "for recall, or pin knn_strategy='numpy-gemm' to force "
                "an exact (slower) fit." % (batch_rows * batch_rows * n_feat),
                stacklevel=2,
            )
    # The approximate tier sizes its table count to COVER the feature
    # coordinates — recall rises monotonically with coverage (union of
    # tables), and RELIEF's weights are exactly as good as the
    # neighborhoods feeding them. A caller override (`lsh_tables`) is
    # the second escalation knob next to `lsh_probe_radius`: tables
    # re-hash the SCAN side (corpus-sized cost), so escalate the probe
    # radius first.
    if lsh_tables is None:
        lsh_tables = auto_lsh_tables(batch_rows, n_feat)
    if n_batches <= 1:
        batches = [sample]
    elif batching == "random":
        # the reference's engine-seeded split (ReliefFRSelector.scala:252)
        batches = sample.randomSplit([1.0] * n_batches, seed=seed)
    else:  # batching == "hash" (validated above)
        # Deterministic batching: id modulo n_batches. Same dataflow,
        # same statistical role (disjoint cover of the sample), but
        # reproducible across engines — the mode that lets the FULL
        # batched fit (topFeatures feedback loop included) sit under a
        # cross-engine SQL oracle (q72c). Operationally also the mode
        # a re-run-stable production fit would pick. pmod, NOT %: the
        # sign of Spark's % follows the dividend, so negative caller
        # ids would match no batch and silently fall out of the fit.
        # (Null ids are invalid input on any path — they also break
        # kNN identity joins.)
        batches = [
            sample.filter(F.pmod(F.col("id"), F.lit(n_batches)) == i)
            for i in range(n_batches)
        ]

    top_features: list[int] | None = []  # batch 0 contributes no joint stats
    batch_weights: list[dict[int, float]] = []
    marginals: list[dict[int, float]] = []
    joints: list[DataFrame] = []
    total_interactions = 0

    # Partition count of every batch == partition count of `sample`
    # (filter and randomSplit are narrow); resolve it ONCE here instead
    # of an .rdd plan-analysis round-trip inside knn_join per batch
    # (VERDICT r6 #2).
    sample_parts = sample.rdd.getNumPartitions()

    for batch in batches:
        # No emptiness probe: an empty batch flows through as empty
        # DataFrames everywhere below (empty kNN -> empty pairs ->
        # empty aggregates -> empty top_rows, which keeps the previous
        # ranking) — one fewer job per batch.
        batch = batch.cache()
        neigh = knn_join(
            batch, batch, k,
            id_col="id", features_col="features",
            exclude_self=exclude_self, strategy=knn_strategy,
            # partition-sizing estimate only — saves a count() job
            num_instances=batch_rows,
            # queries == batch here: lets the lsh tier drop its probe-
            # table broadcast hint when the batch is escalation-sized
            num_queries=batch_rows,
            scan_partitions=sample_parts,
            lsh_tables=lsh_tables,
            # Hamming-1 multiprobe: single-probe's ~4-27% neighbor loss
            # measurably breaks planted-signal selection (XOR100 top-2
            # [4,75] vs [4,6]); multiprobe restores kNN recall to 1.000
            # on the KAIS fixtures at broadcast-side-only cost. Callers
            # needing better than the ~0.70 continuous-data recall of
            # radius 1 escalate via lsh_probe_radius=2 (measured 0.96,
            # SCALE.md round-9 row).
            lsh_multiprobe=True,
            lsh_probe_radius=lsh_probe_radius,
        )
        # Cache the COMPACT pair table (nFeat times smaller than the
        # exploded long form) and materialize it eagerly: a lazy cache
        # with multiple downstream consumers computes the whole
        # kNN+join subplan once per consumer concurrently (the cache
        # dedupes storage, not computation). Repartition by the pair
        # key first — AQE coalesces the small join output to few
        # partitions, which would serialize every downstream explode;
        # clustering by pair also makes the joint groupBy exchange-free.
        #
        # Partition COUNT is volume-derived (r12, guide §2.4), not a
        # flat defaultParallelism: the widest consumer of this cache is
        # the joint combination explode (~n_pairs x n_feat x (|top|+1)
        # rows; the bin-stats explode is the n_pairs x n_feat floor), so
        # size for ~256k exploded rows per task, capped at the old
        # defaultParallelism. At bench SFs this collapses dozens of
        # near-empty tasks per consumer stage into a few; at cluster
        # volumes the derived count saturates the same cap as before.
        # Sums downstream are decimal/integer (order-independent), so
        # the layout changes cost, never values.
        par = spark.sparkContext.defaultParallelism
        top_mult = (
            min(lower_feat, n_feat) if redundancy_removal else 0
        )
        pair_vol = max(batch_rows, 1) * k * n_feat * (1 + top_mult)
        pair_parts = max(1, min(par, -(-pair_vol // 262144)))
        pairs = (
            pair_table(batch, neigh)
            .repartition(pair_parts, "query_id", "neighbor_id")
            .cache()
        )
        # classCounter total = number of (query, neighbor) pairs
        # (ReliefFRSelector.scala:469-470 sums the per-bin pair counts);
        # this count is also the action that materializes the cache.
        # r13 NOTE (measured, kept): dropping this count and letting
        # the fused probe materialize the cache was interleaved-A/B'd
        # same-session (plans/r13/fuse_ab.py) — the DENSE loop got
        # SLOWER (q72 min 8.37->8.86, med 8.67->10.03; the probe's
        # unioned legs then plan their joins against an unmaterialized
        # InMemoryRelation without exact stats), while the sparse loop
        # got faster and adopted the fusion (relief_sparse.py).
        n_pairs = pairs.count()
        _mark("batch pairs count")
        total_interactions += n_pairs
        long_pairs = explode_pairs(pairs)

        # ONE fused probe action per batch (r12 optimization; was
        # three): a tagged union collects the per-batch sufficient
        # statistics — the feature_bin_stats aggregate (tag 0, the one
        # explode scan of the long form) and the pair-level bin counts
        # (tag 1) — and, in redundancy mode, pulls the joint COO cache
        # through as tag 2 so j_b is materialized before `pairs` is
        # unpersisted (the VERDICT r6 #2 union trick, now carrying the
        # stats legs too). Every leg reads the ALREADY-materialized
        # pairs cache, so nothing upstream can be computed twice. The
        # collected stats are nFeat x nClasses x 2 rows; the relevance
        # collapse, marginal collapse and batch top-N then run on the
        # driver via _collapse_bins_local (bit-exact, see its
        # docstring) — eliminating the bins/w/m_b caches and the
        # separate TakeOrdered job per batch.
        bins = feature_bin_stats(
            long_pairs, not discrete_data, lower_distance_threshold
        )
        null_dec = F.lit(None).cast(DEC)
        probe = bins.select(
            F.lit(0).alias("tag"),
            F.col("feature_idx").cast("long").alias("f"),
            F.col("n_label").alias("lbl"),
            F.col("same_class").alias("sc"),
            F.col("bin_sum").cast(DEC).alias("d1"),
            F.col("vote_sum").cast(DEC).alias("d2"),
            F.col("n_rows").cast("long").alias("c1"),
        ).unionAll(
            # pair-level bin counts — no distinct over the exploded
            # table
            pairs.groupBy("n_label", "same_class")
            .agg(F.count("*").alias("bin_cnt"))
            .select(
                F.lit(1).alias("tag"),
                F.lit(None).cast("long").alias("f"),
                F.col("n_label").alias("lbl"),
                F.col("same_class").alias("sc"),
                null_dec.alias("d1"),
                null_dec.alias("d2"),
                F.col("bin_cnt").cast("long").alias("c1"),
            )
        )
        j_b = None
        if redundancy_removal:
            # joint stats straight from the cached compact pair table —
            # no explode-then-collect_list round trip (decimal-identical,
            # see joint_counts_from_pairs)
            j_b = joint_counts_from_pairs(
                pairs, top_features, not discrete_data,
                lower_distance_threshold, n_feat,
            ).cache()
            probe = probe.unionAll(
                j_b.select(
                    F.lit(2).alias("tag"),
                    F.col("f1").cast("long").alias("f"),
                    F.lit(None).cast("double").alias("lbl"),
                    F.lit(None).cast("boolean").alias("sc"),
                    null_dec.alias("d1"),
                    null_dec.alias("d2"),
                    F.lit(None).cast("long").alias("c1"),
                )
            )
        probe_rows = probe.collect()
        _mark("batch stats probe")
        pc = {
            (r["lbl"], r["sc"]): int(r["c1"])
            for r in probe_rows
            if r["tag"] == 1
        }
        rel_b, marg_b = _collapse_bins_local(
            (
                (r["f"], r["lbl"], r["sc"], r["d1"], r["d2"])
                for r in probe_rows
                if r["tag"] == 0
            ),
            pc,
            priors,
        )
        batch_weights.append(rel_b)
        if redundancy_removal:
            marginals.append(marg_b)
            joints.append(j_b)

        # batch top-N steers the next batch's joint-stat scope
        # (ReliefFRSelector.scala:281-283). The reference min-max
        # normalizes before takeOrdered (:281, 328-332), but min-max is
        # strictly monotone (order-preserving), so ranking the RAW
        # relevance selects the identical feature set with one fewer
        # min/max job per batch. Sort key mirrors the old
        # orderBy(desc(relevance), asc(feature_idx)).limit(lower_feat).
        top_feat_b = [
            f
            for f, _ in sorted(
                rel_b.items(), key=lambda kv: (-kv[1], kv[0])
            )[:lower_feat]
        ]
        if top_feat_b:
            # empty batches keep the previous ranking — the reference
            # only replaces topFeatures when results are non-empty
            # (ReliefFRSelector.scala:279-283)
            top_features = top_feat_b
        pairs.unpersist()
        batch.unpersist()

    # Merge batches: sum raw weights then global min-max (fit :300-312).
    # Cross-batch sums run on the driver over the per-batch float
    # dicts, added in batch order. Bit-identity to the old Spark
    # union-reduce holds for the <=2-batch configurations every gate
    # and test pins (a two-operand IEEE add is commutative); with 3+
    # batches the driver's fixed batch order may differ at ulp level
    # from the old plan's shuffle order — which was itself
    # nondeterministic, so this is a documented-scope note (ADVICE
    # r12), not a regression.
    from functools import reduce

    _mark("batch loop end")
    relevance = np.zeros(n_feat)
    for rel_b in batch_weights:
        for f, v in rel_b.items():
            relevance[f] += v
    mn, mx = float(relevance.min()), float(relevance.max())
    relevance = (relevance - mn) / (mx - mn) if mx > mn else np.zeros(n_feat)

    _mark("final weights collect")
    std_sel = std_ranking(relevance, num_top_features)

    red_coo: dict[tuple[int, int], float] = {}
    if redundancy_removal and joints:
        joint_all = reduce(DataFrame.unionByName, joints).groupBy("f1", "f2").agg(
            F.sum("joint").alias("joint")
        )
        marg_sum: dict[int, float] = {}
        for marg_b in marginals:
            for f, v in marg_b.items():
                marg_sum[f] = marg_sum.get(f, 0.0) + v
        marg_all = spark.createDataFrame(
            [(int(f), float(v)) for f, v in sorted(marg_sum.items())],
            "feature_idx long, marginal double",
        )
        # jointTotal omits the first batch's share (no joint stats were
        # collected there) — computeRedudancy, ReliefFRSelector.scala:641.
        batch_perc = 1.0 / n_batches
        joint_total = total_interactions * (1.0 - estimation_ratio * batch_perc)
        if joint_total > 0 and total_interactions > 0:
            red_df = mi_redundancy(joint_all, marg_all, float(total_interactions), joint_total)
            for r in red_df.collect():
                red_coo[(int(r["f1"]), int(r["f2"]))] = float(r["redundancy"])

    # Everything is driver-side numpy from here: release the per-batch
    # joint caches so a long-lived session doesn't accumulate dead
    # entries (each live entry also taxes every later cache lookup).
    for cached in joints:
        cached.unpersist()

    _mark("redundancy mi collect")
    red_sel = (
        greedy_select(relevance, red_coo, num_top_features)
        if redundancy_removal
        else list(std_sel)
    )
    return ReliefFitResult(
        relevance=relevance,
        std_selection=std_sel,
        redundancy_selection=red_sel,
        n_features=n_feat,
        n_instances=n_elems,
        priors=priors,
        redundancy_coo=red_coo,
        n_batches=n_batches,
        resolved_knn_strategy=knn_strategy,
    )
