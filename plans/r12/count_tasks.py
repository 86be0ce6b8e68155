import sys, time
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
sc = spark.sparkContext
import __spark_entry__ as e
qs = e.queries()
sf='/root/testdata/sf0.1'
t = sc.statusTracker()
for name in sys.argv[1].split(","):
    fn = qs[name]
    fn(spark, sf).count()  # warm
    j0 = t.getJobIdsForGroup(None); before = max(j0) if j0 else -1
    fn(spark, sf).count()
    jobs = [j for j in t.getJobIdsForGroup(None) if j > before]
    ntasks = sum(si.numTasks for j in jobs for s in t.getJobInfo(j).stageIds if (si := t.getStageInfo(s)))
    print(f"TASKS {name} jobs={len(jobs)} tasks={ntasks}", flush=True)
spark.stop()
