import sys, time
from spark_relieffc_fselection_spark import get_spark
aqe = sys.argv[2] if len(sys.argv) > 2 else "true"
spark = get_spark(extra_conf={"spark.sql.adaptive.enabled": aqe})
sc = spark.sparkContext
import __spark_entry__ as e
qs = e.queries()
sf='/root/testdata/sf0.1'
t = sc.statusTracker()
for name in sys.argv[1].split(","):
    fn = qs[name]
    fn(spark, sf).count()
    j0 = t.getJobIdsForGroup(None); before = max(j0) if j0 else -1
    t0=time.time(); fn(spark, sf).count(); dt=time.time()-t0
    jobs=[j for j in t.getJobIdsForGroup(None) if j > before]
    nt=sum(si.numTasks for j in jobs for s in t.getJobInfo(j).stageIds if (si:=t.getStageInfo(s)))
    print(f"AQE={aqe} {name}: {dt:.2f}s jobs={len(jobs)} tasks={nt}", flush=True)
spark.stop()
