"""Dissect q158's per-batch dataflow: time each operator subtree
separately (count actions on fresh, uncached subtrees; guide §1.4)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
import pyspark.sql.functions as F
from spark_relieffc_fselection_spark import get_spark
from spark_relieffc_fselection_spark.operators.relief_sparse import (
    sparse_knn_join, sparse_pair_feature_table, _pair_bin_counts, to_long_form,
)
from spark_relieffc_fselection_spark.operators.relief import (
    feature_bin_stats, collision_table, joint_counts,
)
from spark_relieffc_fselection_spark.queries.relief_q import _embeddings, Q158_PRED

spark = get_spark()
sf = "/root/testdata/sf0.1"
inst = _embeddings(spark, sf).filter(F.expr(Q158_PRED.replace("vec_id", "id")))
long_df, labels = to_long_form(inst)
n_feat = 64
k = 10 * 2  # num_neighbors * n_classes (q158: top=5? neigh from Q72C)
from spark_relieffc_fselection_spark.queries.relief_q import Q72C_TOP, Q72C_NEIGH
labs = labels.groupBy("label").count().collect()
n_classes = len(labs)
k = Q72C_NEIGH * n_classes
b = 0
b_labels = labels.filter(F.pmod(F.col("id"), F.lit(2)) == b).cache()
b_long = long_df.filter(F.pmod(F.col("id"), F.lit(2)) == b).cache()
b_labels.count(); b_long.count()

def t(label, thunk, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time(); thunk(); ts.append(time.time() - t0)
    print(f"DIS {label}: min={min(ts):.2f} all={[round(x,2) for x in ts]}", flush=True)

b_n = b_labels.count()
neigh_fn = lambda: sparse_knn_join(b_long, b_labels, b_labels.select("id"), k, num_corpus=b_n, probe=False)
t("knn alone", lambda: neigh_fn().count())
neigh = neigh_fn().cache(); neigh.count()
t("pair_feature_table (knn cached)", lambda: sparse_pair_feature_table(b_long, b_labels, neigh).count())
lp = sparse_pair_feature_table(b_long, b_labels, neigh).cache(); lp.count()
t("bin_stats (lp cached)", lambda: feature_bin_stats(lp, True, 0.8).count())
t("pair_bin_counts (neigh cached)", lambda: _pair_bin_counts(neigh, b_labels).count())
t("collision+joint tf=5 (lp cached)", lambda: joint_counts(collision_table(lp, True, 0.8), list(range(15)), True).count())
spark.stop()
