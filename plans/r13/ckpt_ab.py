"""Interleaved A/B: temp checkpoint on ext4 (default) vs /dev/shm."""
import os, shutil, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from spark_relieffc_fselection_spark import get_spark
from spark_relieffc_fselection_spark.streaming import windows as W

spark = get_spark()
import __spark_entry__ as e
qs = e.queries(); sf = '/root/testdata/sf0.1'

_orig = W.run_to_memory_sink
MODE = {"v": "default"}
SEQ = [0]

def _patched(stream_df, name, output_mode="complete"):
    SEQ[0] += 1
    w = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True))
    if MODE["v"] == "shm":
        d = f"/dev/shm/ckpt_ab_{SEQ[0]}"
        w = w.option("checkpointLocation", d)
    q = w.start()
    q.awaitTermination()
    return stream_df.sparkSession.table(name)

W.run_to_memory_sink = _patched

names = sys.argv[1].split(",")
for name in names:
    fn = qs[name]
    for m in ("default", "shm"):
        MODE["v"] = m; fn(spark, sf).count()  # warm both
    res = {"default": [], "shm": []}
    for rep in range(3):
        for m in ("default", "shm"):
            MODE["v"] = m
            t0 = time.time(); fn(spark, sf).count()
            res[m].append(time.time() - t0)
    for m in ("default", "shm"):
        ts = sorted(res[m])
        print(f"CKPT {name} {m}: min={ts[0]:.2f} med={ts[1]:.2f} all={[round(x,2) for x in res[m]]}", flush=True)
    shutil.rmtree("/dev/shm", ignore_errors=False) if False else None
for d in Path("/dev/shm").glob("ckpt_ab_*"):
    shutil.rmtree(d, ignore_errors=True)
spark.stop()
