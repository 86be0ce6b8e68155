"""Partitioning helpers: parallelism floors for tiny inputs and
skew-safe join salting.

Small parquet files arrive as one partition; per-row-expensive
operators (hashing, shingling, regex) then run on one core. At real
scale inputs already carry >= cluster parallelism partitions and
``ensure_parallelism`` is a no-op.

``salted_join`` is the classic hot-key remedy for shuffle joins where
the small side is too big to broadcast but cheap to replicate: salt
the big side deterministically, replicate the small side once per salt
value, and the hot key's rows spread over ``salt`` reducers instead of
one. AQE's skew-join split handles most cases at runtime; the explicit
salt is for the pathological single-key case AQE can't split (one key
bigger than a whole executor) and for engines/configs without AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, rows_per_partition: int = 128) -> DataFrame:
    """Repartition low-partition inputs so per-row work spreads across
    cores, capped so tiny inputs don't over-fan."""
    sc = df.sparkSession.sparkContext
    n_parts = df.rdd.getNumPartitions()
    if n_parts >= sc.defaultParallelism:
        return df
    approx_rows = df.count()
    target = max(1, min(sc.defaultParallelism, approx_rows // rows_per_partition))
    return df.repartition(target) if target > n_parts else df


#: (shift, mask) pairs that spread a 16-bit int's bits to even
#: positions (the classic magic-number interleave). Shared by the
#: Column builder and the SQL twin below so the two engines can't
#: drift.
_SPREAD16 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16_col(c):
    x = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD16:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _spread16_sql(expr: str) -> str:
    x = f"({expr} & 65535)"
    for shift, mask in _SPREAD16:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def morton16(x, y):
    """Z-order (Morton) key interleaving two 16-bit dimensions: bit i
    of ``x`` lands at position 2i, of ``y`` at 2i+1. Rows close in
    BOTH dimensions are close in the 1-D key, so a sort by the key
    packs multi-dimensional neighborhoods into the same output files —
    the layout that makes min/max file statistics prune on either
    dimension (the technique behind Delta/Iceberg Z-ORDER OPTIMIZE).
    Pure integer arithmetic, whole-stage-codegen'd; the identical
    expression in ANSI SQL comes from :func:`morton16_sql`.
    """
    return _spread16_col(x).bitwiseOR(F.shiftleft(_spread16_col(y), 1))


def morton16_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB/ANSI twin of :func:`morton16`, generated from the same
    shift/mask table."""
    return f"({_spread16_sql(x_expr)} | ({_spread16_sql(y_expr)} << 1))"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the ``big`` side.

    The big side gets a deterministic salt from a hash of its whole
    row (so a hot key's rows spread across ``salt`` shuffle
    partitions); the small side is replicated ``salt``x so every
    (key, salt) bucket finds its match. Result rows are identical to
    ``big.join(small, on, how)``; only the physical key distribution
    changes. Replication multiplies the small side's shuffle volume by
    ``salt`` — keep it an order of magnitude below the big side's.
    """
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "cross",
    ):
        # right/full would surface each unmatched small row `salt` times
        raise ValueError(f"salted_join does not support how={how!r}")
    on = list(on)
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, on + ["_salt"], how).drop("_salt")
