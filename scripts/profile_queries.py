"""Per-query wall/job/stage breakdown (optimization round 12).

For each named query: warm once at the warm SF (JIT/codegen), then run
once at the target SF while reading the UI REST API before/after —
job count, number of stages, summed executor task time, and the
implied DRIVER GAP (wall - sum of per-job [submission..completion]
spans).  Separates "the cluster is computing" from "the driver is
planning/scheduling/collecting" so optimizations chase the real term.

Usage: SPARK_UI=true python scripts/profile_queries.py q158 q161 [sf_dir]
Names may be bare prefixes (q158) or full registry names.
"""

from __future__ import annotations

import json
import os
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
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    prefixes = []
    for a in args:
        if a.startswith("/"):
            sf_dir = a
        else:
            prefixes.append(a)

    os.environ.setdefault("SPARK_UI", "true")
    from spark_relieffc_fselection_spark import get_spark
    from spark_relieffc_fselection_spark.queries import all_queries

    spark = get_spark(app_name="profile-queries")
    reg = all_queries()
    names = []
    for p in prefixes:
        hits = [n for n in reg if n == p or n.startswith(p + "_")]
        if not hits:
            print(f"!! no query matches {p}", file=sys.stderr)
        names.extend(hits)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def api(path: str):
        return json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}")
        )

    warm_dir = "/root/testdata/sf0.01"
    for name in names:
        fn = reg[name]
        try:
            fn(spark, warm_dir).count()  # JIT/codegen warm
        except Exception as exc:
            print(f"# warm {name} failed: {exc}", file=sys.stderr)
        jobs_before = {j["jobId"] for j in api("jobs")}
        t0 = time.time()
        fn(spark, sf_dir).count()
        wall = time.time() - t0
        jobs = [j for j in api("jobs") if j["jobId"] not in jobs_before]
        n_stages = sum(len(j["stageIds"]) for j in jobs)
        # per-job spans (driver gap = wall - union of job spans)
        spans = []
        for j in jobs:
            if "submissionTime" in j and "completionTime" in j:
                spans.append((ts(j["submissionTime"]), ts(j["completionTime"])))
        spans.sort()
        covered = 0.0
        cur_lo = cur_hi = None
        for lo, hi in spans:
            if cur_lo is None:
                cur_lo, cur_hi = lo, hi
            elif lo <= cur_hi:
                cur_hi = max(cur_hi, hi)
            else:
                covered += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
        if cur_lo is not None:
            covered += cur_hi - cur_lo
        # executor task time summed over this query's stages
        stage_ids = {sid for j in jobs for sid in j["stageIds"]}
        exec_ms = 0
        n_tasks = 0
        for st in api("stages?status=complete"):
            if st["stageId"] in stage_ids:
                exec_ms += st.get("executorRunTime", 0)
                n_tasks += st.get("numCompleteTasks", 0)
        print(
            json.dumps(
                {
                    "query": name,
                    "wall_s": round(wall, 3),
                    "jobs": len(jobs),
                    "stages": n_stages,
                    "tasks": n_tasks,
                    "job_span_s": round(covered, 3),
                    "driver_gap_s": round(wall - covered, 3),
                    "executor_task_s": round(exec_ms / 1000.0, 3),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
