"""Stage-level hotspot dump for one query (optimization round 12).

Runs the query once warm at the target SF, then prints the top stages
by executorRunTime with task counts and per-task means, plus the
stage's name line (which maps back to the operator).

Usage: SPARK_UI=true python scripts/profile_stages.py q158 [sf_dir] [topN]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    top_n = 25
    prefix = args[0]
    for a in args[1:]:
        if a.startswith("/"):
            sf_dir = a
        else:
            top_n = int(a)

    os.environ.setdefault("SPARK_UI", "true")
    from spark_relieffc_fselection_spark import get_spark
    from spark_relieffc_fselection_spark.queries import all_queries

    spark = get_spark(app_name="profile-stages")
    reg = all_queries()
    name = next(n for n in reg if n == prefix or n.startswith(prefix + "_"))

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def api(path: str):
        return json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}")
        )

    fn = reg[name]
    try:
        fn(spark, "/root/testdata/sf0.01").count()
    except Exception as exc:
        print(f"# warm failed: {exc}", file=sys.stderr)
    before = {(s["stageId"], s["attemptId"]) for s in api("stages")}
    fn(spark, sf_dir).count()
    stages = [
        s
        for s in api("stages?status=complete")
        if (s["stageId"], s["attemptId"]) not in before
    ]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    total = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"# {name}: {len(stages)} stages, executorRunTime total {total/1000:.1f}s")
    for s in stages[:top_n]:
        rt = s.get("executorRunTime", 0)
        nt = s.get("numCompleteTasks", 0) or 1
        nm = s.get("name", "").split("\n")[0][:110]
        print(
            f"  stage {s['stageId']}: {rt/1000:.2f}s exec, {nt} tasks, "
            f"{rt/nt:.0f} ms/task | {nm}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
