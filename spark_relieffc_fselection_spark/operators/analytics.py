"""Warehouse analytics operators: skyline, interval merge, robust
outliers, ordered funnels, cohort retention.

The reference engine (sramirez/spark-RELIEFFC-fselection) is a feature
selector; these are the surrounding warehouse shapes a training-data
platform runs on the same tables — event hygiene (outlier scrubbing
before a metric feeds a reward model), user-journey analysis over the
``events`` stream, and Pareto-front source selection. Each one is
expressed as pure Catalyst (window + aggregate) with a documented
scale posture; none drops to Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Consistency constant for MAD -> sigma under normality.
MAD_SIGMA = 1.4826


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    *,
    n_partitions: int = 32,
) -> DataFrame:
    """Pareto front maximizing both ``x`` and ``y``.

    A row p is dominated iff some q has q.x >= p.x and q.y >= p.y with
    at least one strictly greater; ties on BOTH coordinates survive
    together. For the 2-D case the front is a window computation, not
    an all-pairs join:

    1. Collapse to one candidate per distinct ``x`` (its max ``y``) —
       any same-x lower-y row is dominated by that candidate.
    2. LOCAL prune: range-partition candidates by ``x`` descending and
       drop, inside each partition, every candidate whose ``y`` does
       not strictly exceed the running max over higher-``x`` rows.
       Dropping there is safe (the dominator is in the same partition)
       and leaves O(front size) survivors per partition.
    3. GLOBAL pass: the same running-max window over the survivors,
       which now number ~front-size * n_partitions — driver-scale for
       any real distribution — so the single-partition sort the
       unpartitioned window needs is over a tiny input, never the
       corpus. A point survives iff y > max(y) over strictly greater x
       (equal y at greater x dominates via strictness in x).
    4. Join survivors back to recover every original row on the front
       (same-x same-y duplicates all kept).

    At 100 TB: steps 1-2 are one shuffle each (groupBy x, then range
    partition); step 3's global window sees per-partition fronts only.
    A uniform-random corpus has an expected front of O(log n) points —
    the global input stays KB-sized even at 10^12 rows.
    """
    cand = df.groupBy(x).agg(F.max(y).alias("_ymax"))

    local_w = (
        Window.partitionBy("_pid")
        .orderBy(F.desc(x))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        cand.repartitionByRange(n_partitions, F.desc(x))
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_prev", F.max("_ymax").over(local_w))
        .filter(F.col("_prev").isNull() | (F.col("_ymax") > F.col("_prev")))
        .drop("_pid", "_prev")
    )

    global_w = Window.orderBy(F.desc(x)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = (
        local.withColumn("_prev", F.max("_ymax").over(global_w))
        .filter(F.col("_prev").isNull() | (F.col("_ymax") > F.col("_prev")))
        .drop("_prev")
    )

    return df.join(
        F.broadcast(front), on=x, how="inner"
    ).filter(F.col(y) == F.col("_ymax")).drop("_ymax")


def merge_intervals(
    df: DataFrame,
    part: str,
    start: str,
    end: str,
) -> DataFrame:
    """Merge overlapping/touching [start, end) intervals per ``part``.

    Gaps-and-islands: within each partition key, sorted by start, an
    interval opens a new island iff its start exceeds the running max
    end of everything before it; the island id is the running count of
    such opens. One shuffle (partitionBy) + one in-partition sort; no
    self-join, no explode — the classic O(n^2) overlap-join
    formulation is never materialized.

    Intervals that merely touch (start == prev end) merge, matching
    half-open semantics. Returns one row per island:
    ``part, start, end, n_merged``.
    """
    w = Window.partitionBy(part).orderBy(start, end)
    prev_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    island = F.sum(
        F.when(prev_end.isNull() | (F.col(start) > prev_end), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("_island", island)
        .groupBy(part, "_island")
        .agg(
            F.min(start).alias(start),
            F.max(end).alias(end),
            F.count("*").alias("n_merged"),
        )
        .drop("_island")
    )


def mad_outliers(
    df: DataFrame,
    group: str,
    value: str,
    *,
    n_sigma: float = 3.0,
    exact: bool = True,
) -> DataFrame:
    """Robust per-group outlier flags via median/MAD.

    Mean/stddev outlier rules break exactly when outliers exist (the
    outliers inflate sigma); median + MAD (median absolute deviation,
    scaled by 1.4826 to estimate sigma under normality) is the robust
    standard. A row is flagged iff |value - median| > n_sigma * 1.4826
    * MAD; when MAD is 0 (constant group), any deviation flags and the
    score is null.

    Two aggregation passes over the data (median, then MAD of
    residuals) with the per-group statistics broadcast back — group
    cardinality is assumed dimension-sized (event types, sources), so
    the joins never shuffle the fact table; the only wide exchanges
    are the two groupBy passes.

    ``exact=True`` uses Spark's exact ``percentile`` (sort-based
    buffer per group — fine up to ~10^8 rows/group, and required for
    cross-engine oracle parity with DuckDB's ``median``). At 100 TB
    set ``exact=False`` for ``approx_percentile`` (mergeable sketch,
    bounded memory, no oracle parity).
    """
    pct = "percentile" if exact else "approx_percentile"
    med = df.groupBy(group).agg(
        F.expr(f"{pct}({value}, 0.5)").alias("_med")
    )
    with_med = df.join(F.broadcast(med), group)
    mad = with_med.groupBy(group).agg(
        F.expr(f"{pct}(abs({value} - _med), 0.5)").alias("_mad")
    )
    scale = F.lit(float(n_sigma) * MAD_SIGMA) * F.col("_mad")
    dev = F.abs(F.col(value) - F.col("_med"))
    return (
        with_med.join(F.broadcast(mad), group)
        .filter(dev > scale)
        .withColumn(
            "rscore",
            F.when(
                F.col("_mad") > 0,
                F.round(
                    (F.col(value) - F.col("_med"))
                    / (F.lit(MAD_SIGMA) * F.col("_mad")),
                    6,
                ),
            ),
        )
        .drop("_med", "_mad")
    )


def funnel_counts(
    events: DataFrame,
    user: str,
    event_type: str,
    ts: str,
    stages: Sequence[str],
) -> DataFrame:
    """Strictly-ordered funnel: how many users reached stage k having
    done stages 1..k-1 in temporal order (each stage strictly after
    the FIRST occurrence of the previous one — the standard
    first-touch funnel).

    One chained aggregate per stage: stage k's reachers are the users
    with an event of type k strictly after their stage-(k-1) first
    time. Every join and groupBy keys on the user column, so after the
    first exchange the chain stays co-partitioned (Catalyst reuses the
    hash partitioning; no re-shuffle of the events side per stage
    beyond the per-stage filtered scan). Returns
    ``stage_idx, stage, n_users`` with one row per stage.
    """
    ev = events.select(
        F.col(user).alias("_u"),
        F.col(event_type).alias("_t"),
        F.col(ts).alias("_ts"),
    )
    reached: DataFrame | None = None
    out: DataFrame | None = None
    for i, stage in enumerate(stages):
        step = ev.filter(F.col("_t") == stage)
        if reached is None:
            cur = step.groupBy("_u").agg(F.min("_ts").alias("_first"))
        else:
            cur = (
                step.join(
                    reached.select("_u", F.col("_first").alias("_prev")), "_u"
                )
                .filter(F.col("_ts") > F.col("_prev"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_first"))
            )
        row = cur.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
        reached = cur
    assert out is not None
    return out


def cohort_retention(
    events: DataFrame,
    user: str,
    ts: str,
    *,
    bucket_s: int = 7 * 24 * 3600,
) -> DataFrame:
    """Cohort retention matrix over event time.

    Each user's cohort is the bucket (default: week) of their first
    event; a cell (cohort, offset) counts the users of that cohort
    active ``offset`` buckets later. Two aggregations — distinct
    (user, bucket) activity and per-user min bucket — joined on the
    user key; both sides hash-partition on the same key so the join is
    co-located with the aggregations. Output buckets are epoch seconds
    (portable across engines, no timezone formatting).
    """
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts)) / bucket_s) * bucket_s
    ).cast("bigint")
    active = (
        events.select(F.col(user).alias("_u"), bucket.alias("_b")).distinct()
    )
    first = active.groupBy("_u").agg(F.min("_b").alias("_cohort"))
    return (
        active.join(first, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort_week_s"),
            ((F.col("_b") - F.col("_cohort")) / bucket_s)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def rolling_stats(
    df: DataFrame,
    part: str,
    order: Sequence[str],
    value: str,
    *,
    n: int = 5,
) -> DataFrame:
    """Trailing-``n``-row mean and sample stddev of ``value`` per
    ``part``, ordered by ``order`` (pass a unique tiebreak column so
    the frame is total-ordered and cross-engine deterministic).

    The basic time-series feature-engineering shape (lag smoothing
    before a metric feeds a model). One shuffle on the partition key +
    a per-key sort; the frame is ROWS-bounded so state per row is
    O(n). stddev is the sample estimator (matches DuckDB
    ``stddev_samp``); a 1-row frame yields NULL. Adds
    ``{value}_roll_avg`` / ``{value}_roll_std``; other columns pass
    through.
    """
    w = (
        Window.partitionBy(part)
        .orderBy(*[F.asc(c) for c in order])
        .rowsBetween(-(n - 1), 0)
    )
    return df.withColumn(
        f"{value}_roll_avg", F.avg(value).over(w)
    ).withColumn(f"{value}_roll_std", F.stddev_samp(value).over(w))
