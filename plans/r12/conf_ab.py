"""A/B a Spark conf over selected queries.

Usage: PYTHONPATH=/root/repo python plans/r12/conf_ab.py q21,q23 [key=val ...]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from spark_relieffc_fselection_spark import get_spark

conf = dict(kv.split("=", 1) for kv in sys.argv[2:])
spark = get_spark(extra_conf=conf)

import __spark_entry__ as e

qs = e.queries()
sf = "/root/testdata/sf0.1"
from spark_relieffc_fselection_spark.queries import dedup_q, relief_q

for build in (lambda: dedup_q._shingles(spark, sf), lambda: relief_q._pipe(spark, sf)):
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
    print(f"AB {conf} {full}: min={ts[0]:.2f} med={ts[1]:.2f}", flush=True)
spark.stop()
