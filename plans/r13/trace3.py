import sys, time
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
sc = spark.sparkContext
import __spark_entry__ as e
qs = e.queries(); sf = '/root/testdata/sf0.1'
t = sc.statusTracker()
for name in sys.argv[1].split(","):
    fn = qs[name]
    fn(spark, sf).count()  # warm
    ts, jobs_n = [], None
    for _ in range(3):
        j0 = t.getJobIdsForGroup(None); before = max(j0) if j0 else -1
        t0 = time.time(); fn(spark, sf).count(); ts.append(time.time() - t0)
        jobs_n = len([j for j in t.getJobIdsForGroup(None) if j > before])
    ts.sort()
    print(f"T3 {name}: min={ts[0]:.2f} med={ts[1]:.2f} jobs={jobs_n}", flush=True)
spark.stop()
