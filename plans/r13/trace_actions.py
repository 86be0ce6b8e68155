"""Count driver jobs+tasks for queries, and relief fit actions via the
stage_timer marks (drift-free action evidence)."""
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
    ntasks = sum(
        (t.getStageInfo(s).numTasks if t.getStageInfo(s) else 0)
        for j in jobs for s in t.getJobInfo(j).stageIds
    )
    print(f"TRACE {name}: {dt:.2f}s jobs={len(jobs)} tasks={ntasks}", flush=True)
spark.stop()
