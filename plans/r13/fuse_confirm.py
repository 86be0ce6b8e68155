"""Confirmation: interleaved A/B of the ADOPTED sparse fusion vs a
re-inserted count (monkeypatch arm), same-session."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from spark_relieffc_fselection_spark import get_spark
from spark_relieffc_fselection_spark.operators import relief_sparse as RS

spark = get_spark()
import __spark_entry__ as e
qs = e.queries(); sf = '/root/testdata/sf0.1'

orig_coalesce = RS._coalesce_for_cache
COUNT_ARM = {"on": False}

def patched(df, est_rows, per_task=65536):
    out = orig_coalesce(df, est_rows, per_task)
    # re-insert the old materializing count on the kNN cache arm:
    # neigh is the only caller coalescing with est b_n*k BEFORE .cache();
    return out

# simpler: patch the module-level sparse_knn_join to count after cache
orig_knn = RS.sparse_knn_join
def knn_arm(*a, **k):
    res = orig_knn(*a, **k)
    return res
# The cleanest count-arm: wrap fit's neigh cache is internal; instead
# monkeypatch DataFrame-level is messy — emulate the old behavior by
# running the batched loop with a count injected via cache hook:
import pyspark.sql.dataframe as D
orig_cache = D.DataFrame.cache
def cache_hook(self):
    out = orig_cache(self)
    if COUNT_ARM["on"] and "rank" in self.columns and "distance" in self.columns:
        out.count()  # the old neigh materializer
    return out

D.DataFrame.cache = cache_hook
for name in sys.argv[1].split(","):
    fn = qs[name]
    for arm in (False, True):
        COUNT_ARM["on"] = arm; fn(spark, sf).count()
    res = {False: [], True: []}
    for rep in range(3):
        for arm in (False, True):
            COUNT_ARM["on"] = arm
            t0 = time.time(); fn(spark, sf).count()
            res[arm].append(time.time() - t0)
    for arm, label in ((True, "count"), (False, "fused")):
        ts = sorted(res[arm])
        print(f"CONF {name} {label}: min={ts[0]:.2f} med={ts[1]:.2f} all={[round(x,2) for x in res[arm]]}", flush=True)
spark.stop()
