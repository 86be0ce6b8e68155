"""Interleaved A/B: AQE coalescing parallelismFirst (default true) vs
honoring advisoryPartitionSizeInBytes (guide §2.2 / §9)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
import __spark_entry__ as e
from spark_relieffc_fselection_spark.queries import dedup_q, relief_q
qs = e.queries(); sf = '/root/testdata/sf0.1'
dedup_q._shingles(spark, sf); dedup_q._kgrams(spark, sf)
ARMS = {"pfirst": "true", "advisory": "false"}
def set_arm(a):
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", ARMS[a])
names = sys.argv[1].split(",")
for name in names:
    full = next(k for k in qs if k == name or k.startswith(name + "_"))
    fn = qs[full]
    for a in ARMS: set_arm(a); fn(spark, sf).count()
    res = {a: [] for a in ARMS}
    for rep in range(5):
        for a in ARMS:
            set_arm(a)
            t0 = time.time(); fn(spark, sf).count()
            res[a].append(time.time() - t0)
    line = " | ".join(f"{a} min={sorted(res[a])[0]:.2f} med={sorted(res[a])[1]:.2f}" for a in ARMS)
    print(f"PF {full}: {line}", flush=True)
spark.stop()
