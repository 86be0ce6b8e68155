"""Interleaved SAME-SESSION A/B of the count-fusion (SPARK_GRAFT_R13_FUSE)."""
import os, sys, time
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
import __spark_entry__ as e
qs = e.queries(); sf = '/root/testdata/sf0.1'
names = sys.argv[1].split(",")
for name in names:
    fn = qs[name]
    # warm BOTH arms (codegen differs slightly)
    for arm in ("0", "1"):
        os.environ["SPARK_GRAFT_R13_FUSE"] = arm
        fn(spark, sf).count()
    res = {"0": [], "1": []}
    for rep in range(3):
        for arm in ("0", "1"):
            os.environ["SPARK_GRAFT_R13_FUSE"] = arm
            t0 = time.time(); fn(spark, sf).count()
            res[arm].append(time.time() - t0)
    for arm in ("0", "1"):
        ts = sorted(res[arm])
        label = "fused" if arm == "1" else "count"
        print(f"AB {name} {label}: min={ts[0]:.2f} med={ts[1]:.2f} all={[round(x,2) for x in res[arm]]}", flush=True)
spark.stop()
