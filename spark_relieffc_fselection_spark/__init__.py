"""spark_relieffc_fselection_spark — PySpark-native analytics engine.

A brand-new DataFrame-first re-expression of the capabilities of the
reference library ``sramirez/spark-RELIEFFC-fselection`` (distributed
RELIEF-F feature weighting + collision-based redundancy + greedy
relevance-vs-redundancy selection), extended with the LLM-data-pipeline
operators a 100 TB training-data pipeline needs: deduplication,
similarity search, multimodal column plumbing, text analysis and
event-stream windowing.

Design rules (vs the reference's RDD/breeze execution engine):
  * Declare logical plans with the DataFrame/SQL API; Catalyst + AQE
    pick the physical strategy (partial aggregation, broadcast joins,
    top-k via TakeOrderedAndProject, predicate pushdown).
  * Per-feature inner loops in the reference
    (ReliefFRSelector.scala:438-459, 542-580) become posexplode long
    tables + groupBy aggregations (Tungsten does the accumulation).
  * Python only at Arrow-batched boundaries (mapInPandas /
    applyInPandas); zero row-at-a-time Python UDFs in hot paths.
"""

from spark_relieffc_fselection_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
