"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is materialized with a cheap count-style action so the
timing covers the full plan execution, not plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from spark_relieffc_fselection_spark import get_spark
    from spark_relieffc_fselection_spark.queries import all_queries

    spark = get_spark(app_name="bench")
    # Engine warmup so the first query to touch each execution path
    # doesn't absorb one-time session costs (these are NOT per-query
    # costs at any scale — they amortize to zero on a long-lived
    # cluster session): parquet footer reads, whole-stage-codegen
    # compilation, the Python-worker fork pool + numpy import, Arrow
    # serialization init, broadcast machinery, window + decimal
    # aggregate codegen.
    import pandas as _pd
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.count()

    def _warm(batches):
        import numpy as np  # noqa: F401  (worker-side import warmup)

        for b in batches:
            yield _pd.DataFrame({"x": b["n_nationkey"].astype("int64")})

    warm = nation.mapInPandas(_warm, schema="x long")
    (
        warm.join(_F.broadcast(nation), warm.x == nation.n_nationkey)
        .withColumn("r", _F.row_number().over(_W.partitionBy("x").orderBy("n_name")))
        .groupBy("r")
        .agg(_F.sum(_F.col("x").cast("decimal(38,18)")))
        .count()
    )
    # Second warmup tier: run every query once at a smaller sf. Janino
    # caches generated code by source text and the per-operator plans
    # are identical across sf dirs (only the scan path literal
    # differs), so this compiles each query's full codegen/shuffle
    # machinery without touching the timed sf's data or memoized
    # caches (those key on sf_dir). sf0.01, not sf0.001: the heavy
    # stages' generated loops need enough iterations for the JVM's C2
    # tier to compile them — warming at sf0.01 cut the timed totals
    # from ~70s to ~59s (first-run JIT was dominating the big relief
    # queries, not actual work).
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.01")
    # Wall-clock budget for the warmup tier: on a noisy host the warmup
    # must never eat into the timed section's window, so stop warming
    # (but keep benching) once the budget is spent.
    warm_budget = float(os.environ.get("SPARK_GRAFT_WARMUP_BUDGET", "240"))
    if warm_dir != sf_dir and os.path.isdir(warm_dir):
        warm_t0 = time.time()
        for name, fn in all_queries().items():
            if time.time() - warm_t0 > warm_budget:
                print(f"# warmup budget spent, skipping rest", file=sys.stderr)
                break
            try:
                fn(spark, warm_dir).count()
            except Exception as exc:  # warmup must never fail the bench
                print(f"# warmup {name} skipped: {exc}", file=sys.stderr)
        # Leaked cache entries tax every later action's cache lookup
        # with a canonicalized-plan comparison; start the timed runs
        # with a clean CacheManager.
        spark.catalog.clearCache()

    # Family-shared caches are built HERE as named line items, not
    # inside whichever family member happens to run first — r3's
    # registry reorder shifted the shingle-cache build from q21 to q19
    # and made both look regressed/improved when the family total was
    # flat. Timing them explicitly keeps every per-query number a
    # per-query cost.
    shared_setup: dict[str, float] = {}

    def _setup(label: str, thunk) -> None:
        t0 = time.time()
        try:
            thunk()
            shared_setup[label] = round(time.time() - t0, 3)
        except Exception as exc:  # setup must never fail the bench
            print(f"# shared_setup {label} failed: {exc}", file=sys.stderr)

    from spark_relieffc_fselection_spark.queries import dedup_q, relief_q

    _setup("shingle_cache", lambda: dedup_q._shingles(spark, sf_dir))
    _setup("kgram_cache", lambda: dedup_q._kgrams(spark, sf_dir))
    _setup("relief_pipe", lambda: relief_q._pipe(spark, sf_dir))
    # CC over the jaccard pairs feeds q54 AND q114; build it as a named
    # line so neither query's pass-1 number absorbs the family cost
    _setup("cluster_cache", lambda: dedup_q._clusters(spark, sf_dir).count())

    # q139's co-bucketed catalog tables are written once per session —
    # a write-time cost by design (the point of bucketing), so it gets
    # its own line instead of hiding in q139's pass-1 number
    from spark_relieffc_fselection_spark.queries import warehouse_q

    _setup(
        "bucketed_tables",
        lambda: warehouse_q._bucketed_tables(spark, sf_dir),
    )

    # the unigram family's shared vocab + capped piece table
    # (VERDICT r10 #2): q162-q166/q169 consume the same memoized base,
    # so the cap's explode+sort is a named one-time line, not five
    # per-gate re-pays
    from spark_relieffc_fselection_spark.queries import text_q

    _setup("unigram_base", lambda: text_q._unigram_base(spark, sf_dir))
    _setup("bpe_vocab", lambda: text_q._bpe_vocab(spark, sf_dir))

    # Host-speed canary (VERDICT r10 #5): a FIXED tiny control
    # workload — the warmup's broadcast-join/window/decimal-agg shape
    # over nation — timed at bench start AND end, so a record captured
    # at a slow host hour is self-adjudicating: readers normalize any
    # per-query drift claim against the canary ratio instead of
    # needing an ABBA re-run (BENCH_r10 read 1.34x at face value from
    # ambient drift alone; the truth lived only in SCALE.md's
    # narrative). Median of 3 so one scheduler hiccup can't skew the
    # control itself. Runs AFTER warmup, so it measures host speed,
    # not first-run JIT.
    # Two control components, because drift has two shapes: the tiny
    # nation join tracks DRIVER/scheduler latency, and a real orders
    # shuffle aggregation tracks executor/shuffle throughput — the
    # first round-11 drift specimen moved the shuffle-bound queries
    # 1.3x while the driver-latency control moved only 1.04x, so a
    # single tiny control under-reads ambient shifts.
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def _canary() -> float:
        times = []
        for _ in range(3):
            t0 = time.time()
            (
                nation.join(
                    _F.broadcast(
                        nation.select(_F.col("n_nationkey").alias("k"))
                    ),
                    nation.n_nationkey == _F.col("k"),
                )
                .withColumn(
                    "r",
                    _F.row_number().over(
                        _W.partitionBy("k").orderBy("n_name")
                    ),
                )
                .groupBy("r")
                .agg(_F.sum(_F.col("k").cast("decimal(38,18)")))
                .count()
            )
            (
                orders.groupBy("o_custkey")
                .agg(_F.sum(_F.col("o_totalprice").cast("decimal(38,18)")))
                .count()
            )
            times.append(time.time() - t0)
        return round(sorted(times)[1], 3)

    canary_start = _canary()

    # Per-query medians over n>=3 FULL-SUITE passes (not back-to-back
    # reps of one query): suite-level repetition both stabilizes the
    # median and exposes session-state/ordering effects — a query that
    # is slow only on pass 1 is paying someone else's one-time cost,
    # not its own plan. A wall-clock budget bounds the extra passes on
    # a noisy host; pass 1 always completes.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    bench_budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "900"))
    bench_t0 = time.time()
    rep_times: dict[str, list[float]] = {n: [] for n in all_queries()}
    for rep in range(reps):
        if rep > 0 and time.time() - bench_t0 > bench_budget:
            print(f"# bench budget spent after pass {rep}", file=sys.stderr)
            break
        for name, fn in all_queries().items():
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = round(time.time() - t0, 3)
            rep_times[name].append(dt)
            if rep == 0:
                print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    canary_end = _canary()
    timings = {name: round(_median(ts), 3) for name, ts in rep_times.items()}
    setup_total = round(sum(shared_setup.values()), 3)
    total = round(sum(timings.values()) + setup_total, 3)
    canary = {
        "start_s": canary_start,
        "end_s": canary_end,
        "wall_hour": time.localtime().tm_hour,
        "ts": round(time.time(), 1),
    }
    # Full-precision per-query detail (every rep + spread) goes to a
    # sidecar file; the printed line stays compact (short qNN keys,
    # 2-decimal values) so the driver's bounded tail capture never
    # truncates the JSON (BENCH_r02.json came back "parsed": null for
    # exactly that reason).
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(
        json.dumps(
            {
                "sf": sf,
                "total": total,
                "canary": canary,
                "reps": {n: ts for n, ts in rep_times.items()},
                "queries": timings,
                "shared_setup": shared_setup,
                "spread": {
                    n: round(max(ts) - min(ts), 3)
                    for n, ts in rep_times.items()
                    if ts
                },
            },
            indent=1,
        )
    )
    compact = {name.split("_")[0]: round(t, 2) for name, t in timings.items()}
    compact["setup"] = round(setup_total, 2)
    compact["canary"] = round((canary_start + canary_end) / 2, 2)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": compact,
                "shared_setup": {k: round(v, 2) for k, v in shared_setup.items()},
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
