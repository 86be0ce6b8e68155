"""Capture before/after static plans for the preferSortMergeJoin drop:
'before' arm re-enables the r12 static conf in the same session."""
import io, sys
from contextlib import redirect_stdout
from pathlib import Path
sys.path.insert(0, str(Path.cwd()))
OUT = Path(__file__).resolve().parent
from spark_relieffc_fselection_spark import get_spark
import __spark_entry__ as entry
spark = get_spark()
qs = entry.queries()
sf = "/root/testdata/sf0.01"
names = sys.argv[1:]
for arm, conf in (("before", "false"), ("after", "true")):
    spark.conf.set("spark.sql.join.preferSortMergeJoin", conf)
    for name in names:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (OUT / f"{name.split('_')[0]}_{arm}.txt").write_text(
            f"# {name} @ {sf} — preferSortMergeJoin={'false (r12)' if arm=='before' else 'true (r13, AQE rewrite only)'}\n"
            + buf.getvalue()
        )
        print(arm, name, "captured", flush=True)
spark.stop()
