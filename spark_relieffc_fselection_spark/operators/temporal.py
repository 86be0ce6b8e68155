"""Temporal joins: as-of join and bounded range (interval) join.

Not present in the reference (it has no time axis at all — SURVEY §2.3
notes the absence of as-of/interval joins), but first-class operators
for the large-scale training-data pipelines this engine targets:
aligning events to the latest snapshot (as-of) and correlating events
within a time band (range join) are the two temporal primitives a
100 TB event log needs.

Scale design:

* ``asof_join`` is the union + ordered-window formulation: tag both
  sides, union, and take the last right-side value at-or-before each
  left row within one ``Window.partitionBy(keys).orderBy(ts, side,
  tiebreak)``. ONE shuffle by key, zero join fan-out, no per-key
  quadratic work — this is the plan that survives a log with billions
  of rows per day. A join-then-max formulation would fan out to
  |left_per_key| x |right_per_key| rows before pruning; the window
  formulation never materializes a pair.

* ``range_join_bucketed`` buckets the time axis at the band width, so
  each left row joins exactly the right rows in its own and the two
  adjacent buckets (band <= bucket width guarantees coverage), then
  applies the exact band predicate. The equi-join on (key, bucket)
  hash-partitions; fan-out is bounded by per-bucket density, never by
  per-key row counts. Spark's own sort-merge join would handle the
  equi-key + range post-filter too, but pairs every left row with every
  same-key right row first — unbounded for hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] = ("value",),
    tiebreak_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before it.

    Returns every ``left`` row with ``{ts_col}{suffix}`` (the matched
    right row's timestamp) and ``{c}{suffix}`` for each of
    ``right_cols`` — all NULL when the key has no right row at or
    before the left timestamp (left-outer as-of semantics).

    Ties: a right row whose timestamp equals the left row's timestamp
    DOES match (inclusive / "backward" as-of). Among right rows with
    equal timestamps the one with the greatest ``tiebreak_col`` wins
    (pass a unique id for full determinism).
    """
    on = list(on)
    lfields = {f.name: f.dataType for f in left.schema.fields}
    rfields = {f.name: f.dataType for f in right.schema.fields}
    carried = [c for c in right_cols]
    lonly = [c for c in left.columns if c not in on and c != ts_col]

    # Union layout: on + ts + left-only columns (NULL on right rows) +
    # carried right columns (NULL on left rows) + side + tiebreak.
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col is not None and tiebreak_col in left.columns
        else F.lit(0)
    )
    l2 = left.select(
        *on,
        F.col(ts_col),
        *[F.col(c) for c in lonly],
        *[F.lit(None).cast(rfields[c]).alias(f"_r_{c}") for c in carried],
        F.lit(None).cast(rfields[ts_col]).alias("_r_ts"),
        F.lit(1).alias("_side"),
        tb.cast("long").alias("_tb"),
    )
    rtb = (
        F.col(tiebreak_col)
        if tiebreak_col is not None and tiebreak_col in right.columns
        else F.lit(0)
    )
    r2 = right.select(
        *on,
        F.col(ts_col),
        *[F.lit(None).cast(lfields[c]).alias(c) for c in lonly],
        *[F.col(c).alias(f"_r_{c}") for c in carried],
        F.col(ts_col).alias("_r_ts"),
        F.lit(0).alias("_side"),
        rtb.cast("long").alias("_tb"),
    )
    # Right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    # equal-timestamp right row is visible to the left row — inclusive
    # as-of. _tb orders equal-ts right rows so `last` is deterministic.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l2.unionByName(r2).select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{ts_col}{suffix}"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in carried
        ],
    )
    return matched.filter(F.col("_side") == 1).drop(
        "_side", "_tb", "_r_ts", *[f"_r_{c}" for c in carried]
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    band_seconds: float,
    ts_col: str = "ts",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with |l.ts − r.ts| <= band, same keys.

    Returns one row per matching pair with every non-key column
    prefixed ``l_`` / ``r_`` (keys and the two timestamps included as
    ``l_{ts_col}`` / ``r_{ts_col}``).

    Physical plan: bucket both sides at the band width; a left row in
    bucket b can only match right rows in buckets {b-1, b, b+1}, so
    the left side explodes 3x (bounded, data-independent) and the join
    is a plain hash equi-join on (keys..., bucket). The exact band
    predicate then prunes the corner cases. Never enumerates per-key
    cross products, so hot keys cost only their per-bucket density.
    """
    on = list(on)
    band_us = int(round(band_seconds * 1_000_000))

    def bucket(c):
        return F.floor(F.unix_micros(F.col(c)) / F.lit(band_us))

    l2 = left.select(
        *on,
        *[
            F.col(c).alias(f"{left_prefix}{c}")
            for c in left.columns
            if c not in on
        ],
        F.explode(
            F.array(bucket(ts_col) - 1, bucket(ts_col), bucket(ts_col) + 1)
        ).alias("_bucket"),
    )
    r2 = right.select(
        *on,
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in on
        ],
        bucket(ts_col).alias("_bucket"),
    )
    lts, rts = f"{left_prefix}{ts_col}", f"{right_prefix}{ts_col}"
    return (
        l2.join(r2, on + ["_bucket"])
        .filter(
            F.abs(F.unix_micros(F.col(lts)) - F.unix_micros(F.col(rts)))
            <= F.lit(band_us)
        )
        .drop("_bucket")
    )
