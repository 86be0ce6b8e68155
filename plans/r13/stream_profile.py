"""Profile streaming queries: per-micro-batch durationMs breakdown.

Usage: PYTHONPATH=/root/repo python plans/r13/stream_profile.py q64,q71,...
Monkeypatches run_to_memory_sink to capture StreamingQueryProgress, so
the wall of every declared streaming entry decomposes into
addBatch / getBatch / latestOffset / queryPlanning / walCommit /
commitOffsets / triggerExecution + the start/stop residue.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from spark_relieffc_fselection_spark import get_spark
from spark_relieffc_fselection_spark.streaming import windows as W

spark = get_spark()

import __spark_entry__ as e

qs = e.queries()
sf = "/root/testdata/sf0.1"

_orig = W.run_to_memory_sink
LAST: dict = {}


def _patched(stream_df, name, output_mode="complete"):
    t0 = time.time()
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    t_started = time.time()
    q.awaitTermination()
    t_done = time.time()
    LAST["progress"] = [json.loads(p.json) for p in q.recentProgress]
    LAST["start_s"] = t_started - t0
    LAST["drain_s"] = t_done - t_started
    return stream_df.sparkSession.table(name)


W.run_to_memory_sink = _patched
# the queries import run_to_memory_sink by name into their own scope at
# call time (from ... import inside the function body), so patching the
# module attr is enough.

for name in sys.argv[1].split(","):
    full = next(k for k in qs if k == name or k.startswith(name + "_"))
    fn = qs[full]
    fn(spark, sf).count()  # warm
    t0 = time.time()
    n = fn(spark, sf).count()
    dt = time.time() - t0
    print(f"\n=== {full}: {dt:.2f}s total, {n} rows ===")
    if "progress" in LAST:
        print(f"  start(): {LAST['start_s']:.2f}s  drain: {LAST['drain_s']:.2f}s")
        for p in LAST["progress"]:
            d = p.get("durationMs", {})
            print(
                f"  batch {p.get('batchId')}: rows={p.get('numInputRows')} "
                + " ".join(f"{k}={v}" for k, v in sorted(d.items()))
            )
        st = LAST["progress"][-1].get("stateOperators", [])
        for s in st:
            print(
                f"  state: rows={s.get('numRowsTotal')} "
                f"commitMs={s.get('allUpdatesTimeMs')}/{s.get('commitTimeMs')}"
            )
    LAST.clear()
spark.stop()
