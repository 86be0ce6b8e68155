import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
import pyspark.sql.functions as F
from spark_relieffc_fselection_spark import get_spark
from spark_relieffc_fselection_spark.operators.relief_sparse import (
    sparse_knn_join, sparse_pair_feature_table, to_long_form,
)
from spark_relieffc_fselection_spark.operators.relief import (
    collision_table, joint_counts,
)
from spark_relieffc_fselection_spark.queries.relief_q import _embeddings, Q158_PRED, Q72C_NEIGH

spark = get_spark()
sf = "/root/testdata/sf0.1"
inst = _embeddings(spark, sf).filter(F.expr(Q158_PRED.replace("vec_id", "id")))
long_df, labels = to_long_form(inst)
labs = labels.groupBy("label").count().collect()
k = Q72C_NEIGH * len(labs)
b_labels = labels.filter(F.pmod(F.col("id"), F.lit(2)) == 0).cache()
b_long = long_df.filter(F.pmod(F.col("id"), F.lit(2)) == 0).cache()
b_n = b_labels.count()
neigh = sparse_knn_join(b_long, b_labels, b_labels.select("id"), k, num_corpus=b_n, probe=False).cache()
neigh.count()
lp = sparse_pair_feature_table(b_long, b_labels, neigh).cache(); lp.count()
coll = collision_table(lp, True, 0.8)
tf = list(range(15))
def t(label, thunk):
    ts = []
    for _ in range(4):
        t0 = time.time(); thunk(); ts.append(time.time() - t0)
    print(f"JAB {label}: min={min(ts):.2f} all={[round(x,2) for x in ts]}", flush=True)
# warm both
joint_counts(coll, tf, True).count(); joint_counts(coll, tf, True, num_features=64).count()
t("selfjoin (current)", lambda: joint_counts(coll, tf, True).count())
t("combos (num_features=64)", lambda: joint_counts(coll, tf, True, num_features=64).count())
# value parity
a = {(r["f1"], r["f2"]): r["joint"] for r in joint_counts(coll, tf, True).collect()}
b = {(r["f1"], r["f2"]): r["joint"] for r in joint_counts(coll, tf, True, num_features=64).collect()}
print("parity:", a == b, len(a))
spark.stop()
