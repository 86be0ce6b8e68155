"""Partitioning helpers.

Small parquet files arrive as one partition; per-row-expensive
operators (hashing, shingling, regex) then run on one core. At real
scale inputs already carry >= cluster parallelism partitions and these
helpers are no-ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
