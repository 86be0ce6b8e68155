"""Scalar/vector column functions (SURVEY.md §2.7).

All JVM-side ``pyspark.sql.functions`` compositions — no Python UDFs.
Each maps a scalar helper of the reference to a Catalyst expression:

  * euclidean / sqdist   <- sqrt(Vectors.sqdist) (ReliefFRSelector.scala:358)
  * abs_diff             <- RELIEF "diff" (ReliefFRSelector.scala:439)
  * collision_vote       <- 1 - min(6, d)/6 (ReliefFRSelector.scala:417)
  * minmax_norm          <- (x-min)/(max-min) (ReliefFRSelector.scala:312,331)
  * log2                 <- log(x)/log(2) (ReliefFRSelector.scala:765)
"""

from spark_relieffc_fselection_spark.functions.vector import (
    abs_diff_array,
    collision_vote,
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_norm,
    minmax_norm,
    sqdist,
)

__all__ = [
    "abs_diff_array",
    "collision_vote",
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "l2_norm",
    "minmax_norm",
    "sqdist",
]
