"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship RELIEF-F pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (see
spark_relieffc_fselection_spark/queries/).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: RELIEF-F feature weighting + redundancy-aware
    selection over sf0.001 embeddings; returns the dual ranking."""
    from pyspark.sql import functions as F

    from spark_relieffc_fselection_spark.operators.relief import fit_relief

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
        F.col("label").cast("double").alias("label"),
    )
    res = fit_relief(
        df,
        num_top_features=10,
        num_neighbors=5,
        estimation_ratio=1.0,
        batch_size=0.5,
        redundancy_removal=True,
        seed=42,
    )
    rows = [
        (
            rank + 1,
            int(std_f),
            float(res.relevance[std_f]),
            int(red_f),
            float(res.relevance[red_f]),
        )
        for rank, (std_f, red_f) in enumerate(
            zip(res.std_selection, res.redundancy_selection)
        )
    ]
    return spark.createDataFrame(
        rows,
        "rank int, std_feature int, std_relevance double, "
        "redundancy_feature int, redundancy_relevance double",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_relieffc_fselection_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from spark_relieffc_fselection_spark.queries import all_oracles

    return all_oracles()
