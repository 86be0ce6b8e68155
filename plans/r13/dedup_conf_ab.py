"""Interleaved 3-arm join-config A/B (VERDICT r12 #4 + ADVICE):
  r12   : preferSortMergeJoin=false + AQE SHJ threshold 64m (current)
  old   : preferSortMergeJoin=true  + AQE SHJ threshold 0   (pre-r12)
  aqe   : preferSortMergeJoin=true  + AQE SHJ threshold 64m (ADVICE alt)
Both knobs are runtime SQL confs -> same-session interleaving works."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
import __spark_entry__ as e
from spark_relieffc_fselection_spark.queries import dedup_q
qs = e.queries(); sf = '/root/testdata/sf0.1'
dedup_q._shingles(spark, sf); dedup_q._kgrams(spark, sf)
try: dedup_q._clusters(spark, sf).count()
except Exception: pass
ARMS = {
    "r12": ("false", "64m"),
    "old": ("true", "0"),
    "aqe": ("true", "64m"),
}
def set_arm(a):
    p, t = ARMS[a]
    spark.conf.set("spark.sql.join.preferSortMergeJoin", p)
    spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", t)
names = sys.argv[1].split(",")
for name in names:
    full = next(k for k in qs if k == name or k.startswith(name + "_"))
    fn = qs[full]
    for a in ARMS: set_arm(a); fn(spark, sf).count()  # warm all arms
    res = {a: [] for a in ARMS}
    for rep in range(3):
        for a in ARMS:
            set_arm(a)
            t0 = time.time(); fn(spark, sf).count()
            res[a].append(time.time() - t0)
    line = " | ".join(
        f"{a} min={sorted(res[a])[0]:.2f} med={sorted(res[a])[1]:.2f}" for a in ARMS
    )
    print(f"JC {full}: {line}", flush=True)
spark.stop()
