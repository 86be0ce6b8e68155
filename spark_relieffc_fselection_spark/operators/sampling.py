"""Deterministic corpus-sampling operators for training-data curation.

Two ops a 100 TB pipeline needs that plain Bernoulli sampling (q80)
can't provide:

- ``weighted_sample_without_replacement`` — Efraimidis-Spiegelmann
  reservoir keys: draw k rows with inclusion probability proportional
  to a weight column, WITHOUT replacement, in one distributed pass.
  The uniform draw is hash-derived (md5 of the row id), so the sample
  is reproducible across runs, engines, and partitionings — the same
  portability contract as q80's hash-uniform sampler.

- ``cap_per_group`` — per-group frequency cap (e.g. at most N docs
  per web domain, ranked by quality). The naive plan windows EVERY
  group, which at web scale sorts billions of rows inside hot spam
  domains. This implementation splits the input: groups already under
  the cap pass through untouched (no sort), and only the over-cap
  groups — identified by a cheap count aggregate whose result is
  group-cardinality-sized, then broadcast — pay the per-group ranking.

Both are compositions of built-in expressions; no Python kernels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

U24 = 1 << 24  # md5-derived uniforms use 24 bits, as in q80


def hash_uniform_py(key: str) -> float:
    """Driver/UDF-side twin of :func:`hash_uniform` — THE one place
    the portable md5-uniform spelling lives in Python (ADVICE-class
    dedup: sampled_segment and BPE-dropout each re-implemented it,
    which is how engine spellings silently diverge). Identical to the
    Column form and to DuckDB's
    ``(('0x' || substr(md5(key), 4, 6))::BIGINT + 0.5) / 16777216.0``.
    """
    from hashlib import md5

    h = md5(key.encode()).hexdigest()
    return (int(h[3:9], 16) + 0.5) / float(U24)


def hash_uniform(id_col: Column) -> Column:
    """Deterministic uniform in (0, 1) from a row id: 24 bits of the
    row's md5, offset by 0.5 so 0 (whose log diverges) is unreachable.
    Portable: DuckDB spells it
    ``(('0x' || substr(md5(CAST(id AS VARCHAR)), 4, 6))::BIGINT + 0.5)
    / 16777216.0``.
    """
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 4, 6), 16, 10)
    return (h.cast("bigint") + F.lit(0.5)) / F.lit(float(U24))


def weighted_sample_without_replacement(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Efraimidis-Spiegelmann A-ES sampling: each row gets key
    u^(1/w) with u ~ U(0,1); the k largest keys are a weight-
    proportional sample without replacement.

    Computed in log space (``ln(u)/w``, same ordering, numerically
    stable for large weights) and ordered with an id tie-break. The
    global top-k is a rank-k selection — Spark's sort-based TakeOrdered
    keeps only k rows per partition, so no full sort materializes; at
    1000 executors that is k rows/task then a k-row driver merge.

    Rows with non-positive weight are excluded (their inclusion
    probability is 0).

    Returns the input columns plus ``ln_key`` (the selection key) and
    ``rank`` (1 = largest key).
    """
    keyed = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("ln_key", F.log(hash_uniform(F.col(id_col))) / F.col(weight_col))
    )
    w = Window.orderBy(F.desc("ln_key"), F.asc(id_col))
    # Single-partition window is fine HERE because the input to the
    # rank is pre-pruned: orderBy+limit lets Spark push a per-partition
    # top-k before the final merge. For clarity (and to pin that plan)
    # we take the k rows first, then rank the k-row result.
    topk = keyed.orderBy(F.desc("ln_key"), F.asc(id_col)).limit(k)
    return topk.withColumn("rank", F.row_number().over(w))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_by: list[Column],
) -> DataFrame:
    """Keep at most ``cap`` rows per group, by rank under ``order_by``
    (callers must include a unique tie-break column for determinism).

    Skew-aware two-path plan: a count aggregate (map-side combined,
    result is one row per group) finds the over-cap groups; that tiny
    list broadcasts into a semi/anti join that routes rows. Under-cap
    groups bypass ranking entirely — the common case for the long tail
    of domains — so the per-group sort only ever touches the few hot
    groups, and AQE's skew handling sees a far smaller window input.
    """
    over = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > cap)
        .select(group_col)
    )
    under_rows = df.join(F.broadcast(over), group_col, "left_anti")
    w = Window.partitionBy(group_col).orderBy(*order_by)
    capped_rows = (
        df.join(F.broadcast(over), group_col, "left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
    # joins float the key column to the front; restore input order
    return under_rows.unionByName(capped_rows).select(*df.columns)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k_per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Stratified A-ES: an independent weight-proportional sample
    without replacement of size ``k_per_group`` inside EVERY group
    (short groups return whole). The per-group exact-k guarantee is
    what the global sampler can't give a mixture recipe: "5 docs per
    domain, length-weighted" needs rank-k within strata.

    One window over the group key; at scale the rank input can first
    be thinned with ``cap_per_group``-style routing if single groups
    are huge, but unlike the global sampler the sort here is already
    group-local (never a single-partition bottleneck).
    """
    keyed = (
        df.filter(F.col(weight_col) > 0)
        .withColumn(
            "ln_key", F.log(hash_uniform(F.col(id_col))) / F.col(weight_col)
        )
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("ln_key"), F.asc(id_col))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_per_group)
    )


def dsir_importance_weights(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw document by how target-like its hashed-unigram
    distribution is.

    The target/raw language models are bucket-count vectors over a
    feature hash of the tokens (portable md5-prefix hash, so the whole
    dataflow is cross-engine reproducible), Laplace-smoothed. A
    document's log importance weight is::

        logw(d) = sum over token occurrences t in d of
                  [ln p_target(bucket(t)) - ln p_raw(bucket(t))]

    Scale shape: two passes over the exploded token stream — one
    aggregation down to ``n_buckets`` rows (map-side combined), then a
    broadcast join of that tiny lambda table back onto the tokens and a
    per-document sum. Nothing is ever shuffled wider than the token
    explode itself, and the lambda table is O(n_buckets), not O(vocab).

    ``target_pred`` marks the in-domain rows (e.g. ``lang = 'en'``);
    raw statistics use ALL rows, matching the paper's raw-pool setup.
    Returns (``id_col``, logw) for every document with >= 1 token.
    """
    from spark_relieffc_fselection_spark.functions.text import (
        md5_hash64,
        tokens,
    )

    b = docs.select(
        F.col(id_col),
        target_pred.alias("is_t"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select(
        id_col, "is_t", (md5_hash64(F.col("tok")) % n_buckets).alias("bucket")
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    w_all = Window.partitionBy()
    lam = counts.select(
        "bucket",
        (
            F.log(
                (F.col("ct") + 1.0)
                / (F.sum("ct").over(w_all) + float(n_buckets))
            )
            - F.log(
                (F.col("cr") + 1.0)
                / (F.sum("cr").over(w_all) + float(n_buckets))
            )
        ).alias("lam"),
    )
    return (
        b.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lam").alias("logw"))
    )


def gumbel_topk_resample(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "logw",
) -> DataFrame:
    """Gumbel-top-k resampling: ``key = logw - ln(-ln(u))`` with a
    hash-derived uniform; the k largest keys are an exact sample
    without replacement from softmax(logw) (the Gumbel-max trick) —
    DSIR's resampling step, deterministic and engine-portable.

    Same rank-k plan as the A-ES sampler: orderBy+limit pushes a
    per-partition top-k before the k-row merge; no global sort.
    """
    keyed = weighted.withColumn(
        "key", F.col(logw_col) - F.log(-F.log(hash_uniform(F.col(id_col))))
    )
    w = Window.orderBy(F.desc("key"), F.asc(id_col))
    topk = keyed.orderBy(F.desc("key"), F.asc(id_col)).limit(k)
    return topk.withColumn("rank", F.row_number().over(w))
