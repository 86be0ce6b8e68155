"""Idle-box A/B for the r3->r4 q44/q72 bench drift (VERDICT r4 #7).

Runs q44_sparse_relief_relevance and q72_relief_fit_rankings from TWO
repo checkouts INTERLEAVED in one host session (alternating A/B/A/B
within the same minute-scale window), so host-throughput drift — the
documented tens-of-percent hour-scale wander — cancels out of the
comparison. Each checkout gets its own SparkSession (same conf), each
query is warmed once per session, and we report per-round times plus
medians.

Usage: python scripts/drift_ab.py <repo_a> <repo_b> [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time

RUNNER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from spark_relieffc_fselection_spark import get_spark
from spark_relieffc_fselection_spark.queries import all_queries

sf_dir = sys.argv[2]
names = sys.argv[3].split(",")
spark = get_spark(app_name="drift-ab")
qs = all_queries()
out = {}
for name in names:
    qs[name](spark, "/root/testdata/sf0.01").count()  # warm codegen
    ts = []
    for _ in range(int(sys.argv[4])):
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        ts.append(round(time.time() - t0, 2))
    out[name] = ts
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_side(repo: str, sf_dir: str, names: str, reps: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, repo, sf_dir, names, str(reps)],
        capture_output=True, text=True, timeout=1200,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from {repo}:\n{p.stderr[-2000:]}")


def main() -> None:
    repo_a = sys.argv[1]
    repo_b = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    # optional 5th arg: comma-separated query names (default = the
    # original r4 drift pair)
    names = (
        sys.argv[5]
        if len(sys.argv) > 5
        else "q44_sparse_relief_relevance,q72_relief_fit_rankings"
    )

    acc: dict[str, dict[str, list[float]]] = {"A": {}, "B": {}}
    for r in range(rounds):
        # Alternate leg ORDER per round: with a fixed A-then-B order the
        # second leg rides the first's page cache / CPU-governor warmup
        # — observed as the control moving 14% in a change that never
        # touched its code. ABBA cancels the second-runner advantage.
        legs = (("A", repo_a), ("B", repo_b))
        if r % 2 == 1:
            legs = tuple(reversed(legs))
        for side, repo in legs:
            res = run_side(repo, sf_dir, names, reps=1)
            for q, ts in res.items():
                acc[side].setdefault(q, []).extend(ts)
            print(f"round {r} side {side} ({repo}): {res}", flush=True)
    print()
    for q in acc["A"]:
        ma = statistics.median(acc["A"][q])
        mb = statistics.median(acc["B"][q])
        print(
            f"{q}: A(r3) median={ma:.2f}s {acc['A'][q]}  "
            f"B(r4) median={mb:.2f}s {acc['B'][q]}  B/A={mb / ma:.2f}"
        )


if __name__ == "__main__":
    main()
