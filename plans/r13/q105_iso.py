import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
import __spark_entry__ as e
qs = e.queries(); sf = '/root/testdata/sf0.1'
qs["q105_mdlp_discretize"](spark, sf).count()
for rep in range(6):
    t0 = time.time()
    qs["q105_mdlp_discretize"](spark, sf).count()
    print(f"q105 iso rep{rep}: {time.time()-t0:.2f}s", flush=True)
spark.stop()
