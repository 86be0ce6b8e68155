"""Operator-level + final-adaptive plan capture for the r12 claims the
declared-query explains can't show (localized fits return
LocalRelation; the AQE SMJ->SHJ rewrite only appears in the final
adaptive plan after execution).

Usage: python plans/r12/capture_operator_plans.py <suffix>
Writes, into this directory:
  sparse_pair_table_<suffix>.txt  — explain of the sparse fit's pair
                                    feature table (q44/q158/q161 core)
  q19_final_<suffix>.txt          — q19's FINAL adaptive plan after a
                                    noop-sink execution (shows the
                                    runtime-chosen join strategies)
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path.cwd()))

OUT = Path(__file__).resolve().parent
suffix = sys.argv[1]

from pyspark.sql import functions as F

from spark_relieffc_fselection_spark import get_spark
from spark_relieffc_fselection_spark.operators.relief_sparse import (
    sparse_knn_join,
    sparse_pair_feature_table,
    to_long_form,
)

spark = get_spark(shuffle_partitions=8)
sf_dir = "/root/testdata/sf0.1"

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
inst = emb.select(
    F.col("vec_id").alias("id"),
    F.col("embedding").cast("array<double>").alias("features"),
    F.col("label").cast("double").alias("label"),
)
long_df, labels = to_long_form(inst)
n_elems = labels.count()
# Mirror fit_relief_sparse's call pattern: neigh is ALWAYS cached and
# materialized before the pair table consumes it (it feeds the pair
# explode three times); an uncached composition would inline the whole
# kNN subtree per reference and measure the wrong thing.
neigh = sparse_knn_join(
    long_df, labels, labels.select("id"), 5, num_corpus=n_elems
).cache()
neigh.count()
lp = sparse_pair_feature_table(long_df, labels, neigh)
buf = io.StringIO()
with redirect_stdout(buf):
    lp.explain("formatted")
(OUT / f"sparse_pair_table_{suffix}.txt").write_text(buf.getvalue())
print(f"wrote sparse_pair_table_{suffix}.txt ({len(buf.getvalue())} bytes)")

# Final adaptive plan (exchange strategy AQE actually chose at
# runtime): execute THIS Dataset's own QueryExecution, then print its
# executedPlan — a fresh .explain() would re-plan statically and hide
# the AQE join rewrites.
import time

t0 = time.time()
n_rows = lp.count()
dt = time.time() - t0
final = lp._jdf.queryExecution().executedPlan().toString()
(OUT / f"sparse_pair_final_{suffix}.txt").write_text(
    f"# count() wall: {dt:.2f}s, rows={n_rows}\n{final}"
)
print(f"wrote sparse_pair_final_{suffix}.txt ({len(final)} bytes, {dt:.1f}s)")

import __spark_entry__ as entry

qs = entry.queries()
df = qs["q19_dedup_jaccard"](spark, sf_dir)
df.write.format("noop").mode("overwrite").save()  # guide §1.4
buf = io.StringIO()
with redirect_stdout(buf):
    df.explain("formatted")
(OUT / f"q19_final_{suffix}.txt").write_text(buf.getvalue())
print(f"wrote q19_final_{suffix}.txt ({len(buf.getvalue())} bytes)")
spark.stop()
