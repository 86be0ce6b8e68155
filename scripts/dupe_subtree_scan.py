"""Duplicate-subtree plan scan: run every registry query at sf0.01 and
flag SQL executions where an identical (nodeName, output-rows) pair
appears >= 2 times among expensive node types — the signature of an
un-cached subplan embedded (and executed) more than once, the bug
class correctness tests cannot see (same rows, twice the work).

Found in round 3: the joint-COO mirror, the CC adjacency, LSH/SimHash
bucket pairs (all self-unions / self-joins of un-cached frames), and
q44's long-form cache racing four concurrent consumers. Remaining
flags are adjudicated cheap-by-design: parquet scan re-reads
(q12/q52 — scans are the pushdown-cheap currency) and per-row
tokenize explodes feeding two different operators (q41/q66/q107 —
operator composability is worth one extra in-core explode; DSIR's
two token passes are its documented design). Round-5 sweep: the new
q109-q114 produced ZERO flags (the localize discipline for
multiply-referenced small tables is doing its job).

Usage: SPARK_UI=true python scripts/dupe_subtree_scan.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_UI", "true")
    from spark_relieffc_fselection_spark import get_spark
    from spark_relieffc_fselection_spark.queries import all_queries

    spark = get_spark(app_name="dupe-subtree-scan")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def execs():
        return json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/sql?length=3000"
            )
        )

    seen = {e["id"] for e in execs()}
    n_flags = 0
    for name, fn in all_queries().items():
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # keep scanning
            print(f"{name}: ERROR {exc}")
            continue
        new = [e for e in execs() if e["id"] not in seen]
        seen |= {e["id"] for e in new}
        for e in new:
            d = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/sql/{e['id']}?details=true"
                )
            )
            sig: Counter = Counter()
            for node in d.get("nodes", []):
                if node["nodeName"] not in (
                    "Generate", "ObjectHashAggregate", "MapInPandas", "Scan parquet",
                ):
                    continue
                rows = next(
                    (
                        m["value"].replace(",", "")
                        for m in node.get("metrics", [])
                        if m["name"] == "number of output rows"
                    ),
                    None,
                )
                if rows and int(rows) > 20_000:
                    sig[(node["nodeName"], rows)] += 1
            dups = {k: v for k, v in sig.items() if v >= 2}
            if dups:
                n_flags += 1
                print(f"{name}: sqlId {e['id']} {dups}")
    print(f"scan done, {n_flags} flagged executions")
    spark.stop()


if __name__ == "__main__":
    main()
