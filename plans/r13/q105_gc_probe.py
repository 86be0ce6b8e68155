"""q105 suite-order GC probe: run the fit heavies then q105 reps,
recording driver GC time deltas per rep (ManagementFactory beans).
Usage: SPARK_GRAFT_JAVA_OPTS='...' python plans/r13/q105_gc_probe.py"""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
import __spark_entry__ as e
qs = e.queries(); sf = '/root/testdata/sf0.1'

def gc_ms():
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    tot = 0
    for i in range(beans.size()):
        tot += beans.get(i).getCollectionTime()
    return tot

def heap_mb():
    mem = spark._jvm.java.lang.management.ManagementFactory.getMemoryMXBean().getHeapMemoryUsage()
    return mem.getUsed() // (1 << 20)

print("JAVA_OPTS:", os.environ.get("SPARK_GRAFT_JAVA_OPTS", "<default ParallelGC>"))
qs["q105_mdlp_discretize"](spark, sf).count()  # warm
for name in ("q158_sparse_fit_hash_batched", "q161_sparse_fit_coo_width",
             "q72_relief_fit_rankings"):
    t0 = time.time(); g0 = gc_ms()
    qs[name](spark, sf).count()
    print(f"{name}: {time.time()-t0:.2f}s gc+={gc_ms()-g0}ms heap={heap_mb()}MB", flush=True)
for rep in range(4):
    t0 = time.time(); g0 = gc_ms()
    qs["q105_mdlp_discretize"](spark, sf).count()
    print(f"q105 rep{rep}: {time.time()-t0:.2f}s gc+={gc_ms()-g0}ms heap={heap_mb()}MB", flush=True)
spark.stop()
