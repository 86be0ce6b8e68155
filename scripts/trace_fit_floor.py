"""Trace the driver-gap floor of a fit-family query (VERDICT r11 #6):
count Spark JOBS issued by one warm run (UI REST API) and time reps,
so drift adjudications read a stamped floor instead of re-deriving
it. q72a/q158 were stamped in rounds 10-11; this generalizes the
procedure for q72 and q72d.

Usage: python scripts/trace_fit_floor.py [query ...] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    names = []
    for a in args:
        if a.startswith("/"):
            sf_dir = a
        else:
            names.append(a)
    if not names:
        names = ["q72_relief_fit_rankings", "q72d_relief_fit_hash_sampled"]

    os.environ.setdefault("SPARK_UI", "true")
    from spark_relieffc_fselection_spark import get_spark
    from spark_relieffc_fselection_spark.queries import all_queries

    spark = get_spark(app_name="trace-fit-floor")
    reg = all_queries()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def n_jobs() -> int:
        return len(
            json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/jobs"
                )
            )
        )

    for name in names:
        q = reg[name]
        q(spark, "/root/testdata/sf0.01").count()  # JIT + codegen warm
        j0 = n_jobs()
        t0 = time.time()
        q(spark, sf_dir).count()
        first = time.time() - t0
        jobs = n_jobs() - j0
        walls = [first]
        for _ in range(2):
            t0 = time.time()
            q(spark, sf_dir).count()
            walls.append(time.time() - t0)
        print(
            f"{name}: {jobs} jobs in one warm run; walls "
            f"{' / '.join(f'{w:.2f}' for w in walls)} s (floor "
            f"{min(walls):.2f})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
