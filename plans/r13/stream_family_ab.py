"""Time the full streaming family, 3 suite-passes (bench methodology)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
import __spark_entry__ as e
qs = e.queries(); sf = '/root/testdata/sf0.1'
FAMILY = [k for k in qs if "streaming" in k]
for name in FAMILY:
    qs[name](spark, sf).count()  # warm
res = {n: [] for n in FAMILY}
for rep in range(3):
    for name in FAMILY:
        t0 = time.time(); qs[name](spark, sf).count()
        res[name].append(time.time() - t0)
tot_min = tot_med = 0.0
for name in FAMILY:
    ts = sorted(res[name]); tot_min += ts[0]; tot_med += ts[1]
    print(f"SF {name}: min={ts[0]:.2f} med={ts[1]:.2f}", flush=True)
print(f"SF TOTAL: min={tot_min:.2f} med={tot_med:.2f}")
spark.stop()
