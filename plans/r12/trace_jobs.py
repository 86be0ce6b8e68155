"""Trace per-job stage names/tasks for a query (drift-free evidence)."""
import sys, time
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
sc = spark.sparkContext
import __spark_entry__ as e
qs = e.queries()
sf = '/root/testdata/sf0.1'
t = sc.statusTracker()
for name in sys.argv[1].split(","):
    fn = qs[name]
    fn(spark, sf).count()  # warm
    j0 = t.getJobIdsForGroup(None); before = max(j0) if j0 else -1
    t0 = time.time(); fn(spark, sf).count(); dt = time.time() - t0
    jobs = sorted(j for j in t.getJobIdsForGroup(None) if j > before)
    ntasks = 0
    hist = {}
    for j in jobs:
        ji = t.getJobInfo(j)
        for s in ji.stageIds:
            si = t.getStageInfo(s)
            if si:
                ntasks += si.numTasks
                key = f"{si.name.split(' at ')[0]}:{si.numTasks}"
                hist[key] = hist.get(key, 0) + 1
    print(f"TRACE {name}: {dt:.2f}s jobs={len(jobs)} tasks={ntasks}")
    for k, v in sorted(hist.items(), key=lambda x: -x[1]):
        print(f"   {v:3d} x {k}")
spark.stop()
