import sys, time
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
import __spark_entry__ as e
qs = e.queries()
sf='/root/testdata/sf0.1'
names = sys.argv[1].split(",")
for name in names:
    fn = qs[name]
    fn(spark, sf).count()  # warm
    ts=[]
    for rep in range(2):
        t0=time.time(); fn(spark, sf).count(); ts.append(round(time.time()-t0,2))
    print(f"RESULT {name} {ts}", flush=True)
spark.stop()
