"""Interleaved same-session A/B: HDFS-backed vs RocksDB state store."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from spark_relieffc_fselection_spark import get_spark
spark = get_spark()
import __spark_entry__ as e
qs = e.queries(); sf = '/root/testdata/sf0.1'
ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
KEY = "spark.sql.streaming.stateStore.providerClass"
names = sys.argv[1].split(",")
for name in names:
    fn = qs[name]
    for prov in (HDFS, ROCKS):
        spark.conf.set(KEY, prov); fn(spark, sf).count()  # warm both
    res = {HDFS: [], ROCKS: []}
    for rep in range(3):
        for prov in (HDFS, ROCKS):
            spark.conf.set(KEY, prov)
            t0 = time.time(); fn(spark, sf).count()
            res[prov].append(time.time() - t0)
    for prov, label in ((HDFS, "hdfs"), (ROCKS, "rocksdb")):
        ts = sorted(res[prov])
        print(f"SS {name} {label}: min={ts[0]:.2f} med={ts[1]:.2f} all={[round(x,2) for x in res[prov]]}", flush=True)
spark.stop()
