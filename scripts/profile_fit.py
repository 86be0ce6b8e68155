"""Profile the flagship fit (q72) at sf0.1: run it once warmed, then
dump the slowest stages from the Spark UI REST API so optimization
targets are measured, not guessed.

Usage: SPARK_UI=true python scripts/profile_fit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def ts(s: str) -> float:
    return (
        datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import os

    os.environ.setdefault("SPARK_UI", "true")
    from spark_relieffc_fselection_spark import get_spark
    from spark_relieffc_fselection_spark.queries import all_queries

    spark = get_spark(app_name="profile-fit")
    q = all_queries()["q72_relief_fit_rankings"]
    q(spark, "/root/testdata/sf0.01").count()  # JIT warm
    t0 = time.time()
    q(spark, sf_dir).count()
    wall = time.time() - t0
    print(f"q72 wall: {wall:.2f}s")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    cutoff = t0
    rows = []
    for s in stages:
        try:
            sub = ts(s["firstTaskLaunchedTime"])
            end = ts(s["completionTime"])
        except Exception:
            continue
        if sub < cutoff:
            continue
        rows.append(
            (
                end - sub,
                s["stageId"],
                s["numTasks"],
                s["executorRunTime"] / 1000.0,
                s.get("executorCpuTime", 0) / 1e9,
                s["name"].split("\n")[0][:90],
                s.get("details", "").split("\n")[:6],
            )
        )
    rows.sort(key=lambda r: -r[0])
    for dur, sid, ntask, run, cpu, name, det in rows[:14]:
        print(f"stage {sid:4d}  wall {dur:5.2f}s run {run:6.1f}s cpu {cpu:6.1f}s  tasks {ntask:3d}  {name}")
        for d in det:
            if "spark_relieffc" in d:
                print(f"            {d.strip()[:110]}")
    spark.stop()


if __name__ == "__main__":
    main()
