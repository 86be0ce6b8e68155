"""spark.ml Pipeline surface: ReliefFSelector Estimator/Model pair."""

from spark_relieffc_fselection_spark.ml.estimator import (
    ReliefFSelector,
    ReliefFSelectorModel,
)

__all__ = ["ReliefFSelector", "ReliefFSelectorModel"]
