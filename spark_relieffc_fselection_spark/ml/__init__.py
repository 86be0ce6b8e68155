"""spark.ml Pipeline surface: ReliefFSelector Estimator/Model pair,
plus the discretization front ends for ``discreteData=True`` (quantile
sketch and Fayyad-Irani MDLP — the reference's contracted
spark-MDLP-discretization companion, pom.xml:30-35)."""

from spark_relieffc_fselection_spark.ml.discretizer import (
    apply_bin_edges,
    fit_mdlp_edges,
    fit_quantile_edges,
    mdlp_discretize,
    quantile_discretize,
)
from spark_relieffc_fselection_spark.ml.estimator import (
    ReliefFSelector,
    ReliefFSelectorModel,
)

__all__ = [
    "ReliefFSelector",
    "ReliefFSelectorModel",
    "apply_bin_edges",
    "fit_mdlp_edges",
    "fit_quantile_edges",
    "mdlp_discretize",
    "quantile_discretize",
]
