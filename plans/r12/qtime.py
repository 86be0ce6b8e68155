"""Time selected declared queries at sf0.1 (warm + 3 reps, min+median).

Usage: PYTHONPATH=/root/repo python plans/r12/qtime.py q41,q21[,...]
Mimics bench.py's per-query methodology (count action, warm session,
family caches prebuilt) without running the whole suite.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from spark_relieffc_fselection_spark import get_spark

import __spark_entry__ as e

spark = get_spark()
qs = e.queries()
sf = "/root/testdata/sf0.1"

from spark_relieffc_fselection_spark.queries import dedup_q, relief_q, text_q

for build in (
    lambda: dedup_q._shingles(spark, sf),
    lambda: dedup_q._kgrams(spark, sf),
    lambda: relief_q._pipe(spark, sf),
    lambda: text_q._unigram_base(spark, sf),
    lambda: text_q._bpe_vocab(spark, sf),
):
    try:
        build()
    except Exception as exc:
        print(f"# setup skipped: {exc}")

for name in sys.argv[1].split(","):
    full = next(k for k in qs if k == name or k.startswith(name + "_"))
    fn = qs[full]
    fn(spark, sf).count()  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, sf).count()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"QTIME {full}: min={ts[0]:.2f} med={ts[1]:.2f} max={ts[2]:.2f}")
spark.stop()
