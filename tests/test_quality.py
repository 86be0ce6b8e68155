"""Tests for the data-quality operators (operators/quality.py)."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators import quality as Q


def test_constraint_report_counts_each_kind(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "ok", 100),
            (2, -5.0, "ok", 100),      # range violation (lo)
            (3, 999.0, "bad", 200),    # range violation (hi) + accepted
            (None, 10.0, "ok", 100),   # not_null on id
            (5, None, "ok", 300),      # range counts nulls as violations
            (5, 20.0, "ok", 999),      # dup id + dangling ref
        ],
        "id int, v double, status string, fk int",
    )
    ref = spark.createDataFrame([(100,), (200,), (300,)], "k int")
    got = {
        r.rule: r.violations
        for r in Q.constraint_report(
            df,
            [
                Q.not_null("id"),
                Q.in_range("v", 0.0, 100.0),
                Q.accepted("status", ["ok"]),
                Q.unique("id"),
                Q.ref_integrity("fk", ref, "k"),
            ],
        ).collect()
    }
    assert got == {
        "not_null(id)": 1,
        "range(v)": 3,
        "accepted(status)": 1,
        "unique(id)": 2,   # both rows of the duplicated key count
        "ref(fk)": 1,
    }


def test_constraint_report_clean_data_all_zero(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, v double")
    got = {
        r.rule: r.violations
        for r in Q.constraint_report(
            df, [Q.not_null("id"), Q.in_range("v", 0.0, 10.0), Q.unique("id")]
        ).collect()
    }
    assert got == {"not_null(id)": 0, "range(v)": 0, "unique(id)": 0}


def test_winsorize_matches_numpy_linear_interpolation(spark):
    rng = random.Random(11)
    rows = [("g%d" % (i % 3), i, rng.gauss(0, 10)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {r.id: r.v_clipped for r in (
        Q.winsorize(df, "g", "v", p_lo=0.1, p_hi=0.9)
        .withColumnRenamed("v_clipped", "v_clipped")
        .collect()
    )}
    by_g = {}
    for g, i, v in rows:
        by_g.setdefault(g, []).append((i, v))
    for g, vs in by_g.items():
        arr = np.array([v for _, v in vs])
        lo = np.percentile(arr, 10, method="linear")
        hi = np.percentile(arr, 90, method="linear")
        for i, v in vs:
            assert abs(got[i] - min(max(v, lo), hi)) < 1e-9, (g, i)


def test_skew_profile_ranks_and_shares(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [
        (r.key, r.n_rows, r.share, r.rank)
        for r in Q.skew_profile(df, "k", top_n=3)
        .orderBy("rank")
        .collect()
    ]
    # tie between b and c broken by key ascending
    assert got == [
        ("a", 6, round(6 / 13, 6), 1),
        ("b", 3, round(3 / 13, 6), 2),
        ("c", 3, round(3 / 13, 6), 3),
    ]


def test_merge_aggregates_chain_equals_full_recompute(spark):
    rng = random.Random(5)
    rows = [
        (rng.randint(0, 20), d, rng.uniform(-100, 100))
        for d in range(4)
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "k int, day int, v double")

    state = None
    for d in range(4):
        delta = Q.keyed_partial_agg(
            df.filter(F.col("day") == d), ["k"], sum_specs={"s": "v"}
        )
        state = (
            delta
            if state is None
            else Q.merge_aggregates(state, delta, ["k"], sum_cols=["s"])
        )

    full = Q.keyed_partial_agg(df, ["k"], sum_specs={"s": "v"})
    inc = {r.k: (r.n_rows, r.s) for r in state.collect()}
    ful = {r.k: (r.n_rows, r.s) for r in full.collect()}
    # decimal sums: bit-for-bit equality across the increment chain
    assert inc == ful


def test_rolling_stats_matches_numpy(spark):
    rng = random.Random(7)
    rows = [
        ("u%d" % (i % 4), i, rng.uniform(-50, 50)) for i in range(200)
    ]
    from spark_relieffc_fselection_spark.operators.analytics import (
        rolling_stats,
    )

    df = spark.createDataFrame(rows, "u string, i long, v double")
    got = {
        r.i: (r.v_roll_avg, r.v_roll_std)
        for r in rolling_stats(df, "u", ["i"], "v", n=5).collect()
    }
    by_u = {}
    for u, i, v in sorted(rows, key=lambda t: t[1]):
        by_u.setdefault(u, []).append((i, v))
    for u, seq in by_u.items():
        for j, (i, _) in enumerate(seq):
            window = [v for _, v in seq[max(0, j - 4): j + 1]]
            avg, std = got[i]
            assert abs(avg - np.mean(window)) < 1e-9
            if len(window) == 1:
                assert std is None
            else:
                assert abs(std - np.std(window, ddof=1)) < 1e-9


def _brute_ks(old, new):
    values = sorted(set(old) | set(new))
    so, sn = sorted(old), sorted(new)
    import bisect

    best = 0.0
    for v in values:
        eo = bisect.bisect_right(so, v) / len(so)
        en = bisect.bisect_right(sn, v) / len(sn)
        best = max(best, abs(eo - en))
    return best


def test_ks_statistic_matches_bruteforce(spark):
    rng = random.Random(3)
    old = [rng.gauss(0, 10) for _ in range(400)]
    new = [rng.gauss(2, 12) for _ in range(300)]
    rows = [(v, "o") for v in old] + [(v, "n") for v in new]
    df = spark.createDataFrame(rows, "v double, side string")
    got = Q.ks_statistic(
        df, "v", F.col("side") == "o", F.col("side") == "n", n_buckets=8
    ).first()
    assert got.n_old == 400 and got.n_new == 300
    assert abs(got.ks_stat - round(_brute_ks(old, new), 6)) < 2e-6


def test_ks_statistic_identical_distributions_zero(spark):
    rows = [(float(i % 17), s) for i in range(100) for s in ("o", "n")]
    df = spark.createDataFrame(rows, "v double, side string")
    got = Q.ks_statistic(
        df, "v", F.col("side") == "o", F.col("side") == "n", n_buckets=4
    ).first()
    assert got.ks_stat == 0.0


def test_compaction_plan_math(spark):
    df = spark.createDataFrame(
        [("a", 60), ("a", 60), ("a", 60), ("b", 10), ("c", 250)],
        "src string, b long",
    )
    got = {
        r.grp: (r.n_fragments, r.total_bytes, r.target_files, r.merge_factor)
        for r in Q.compaction_plan(df, "src", "b", target_bytes=100).collect()
    }
    assert got == {
        "a": (3, 180, 2, 1.5),      # 180B -> 2 files of ~90
        "b": (1, 10, 1, 1.0),       # under target: floor of 1 file
        "c": (1, 250, 3, round(1 / 3, 6)),  # splitting is also a plan
    }


def test_join_size_estimate_generic_and_self(spark):
    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k int"
    )
    right = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k int")
    g = Q.join_size_estimate(left, "k", right, "k").first()
    # key 1: 2*1, key 2: 1*2 -> est 4, shared keys {1,2}, max 2
    assert (g.est_rows, g.n_shared_keys, g.max_key_rows) == (4, 2, 2)
    assert left.join(right, "k").count() == g.est_rows
    s = Q.join_size_estimate(left, "k", left, "k").first()
    # self: 4+1+1 = 6 pairs (incl. identity), max key 1 -> 4
    assert (s.est_rows, s.n_shared_keys, s.max_key_rows) == (6, 3, 4)
    assert left.join(left.withColumnRenamed("k", "k2"),
                     F.col("k") == F.col("k2")).count() == s.est_rows


def test_k_anonymity_report_flags_small_and_uniform_groups(spark):
    rows = (
        [("US", "A", 1)] * 12          # big, diverse? sensitive all 1 -> l_risk
        + [("US", "B", 0)] * 6 + [("US", "B", 1)] * 6   # big, diverse -> clean
        + [("DE", "A", 0)] * 3 + [("DE", "A", 1)] * 2   # small -> k_risk
    )
    df = spark.createDataFrame(rows, "nat string, seg string, s int")
    got = {
        (r.nat, r.seg): (r.n_rows, r.n_sensitive, r.k_risk, r.l_risk)
        for r in Q.k_anonymity_report(
            df, ["nat", "seg"], k=10, sensitive=F.col("s"), l=2
        ).collect()
    }
    assert got == {
        ("US", "A"): (12, 1, False, True),   # uniform secret leaks
        ("DE", "A"): (5, 2, True, False),    # small group leaks
    }


def test_k_anonymity_requires_sensitive_for_l(spark):
    df = spark.createDataFrame([("a", 1)], "g string, s int")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        Q.k_anonymity_report(df, ["g"], k=2, l=2)


def test_ks_statistic_invariant_to_bucket_count(spark):
    """The quantile edges are internal ROUTING only — any n_buckets
    must produce the identical KS statistic (the two-level prefix sum
    is exact, not approximate)."""
    rng = random.Random(19)
    rows = [(rng.gauss(0, 5), "o") for _ in range(250)] + [
        (rng.gauss(1, 6), "n") for _ in range(180)
    ]
    df = spark.createDataFrame(rows, "v double, side string")
    stats = [
        Q.ks_statistic(
            df, "v", F.col("side") == "o", F.col("side") == "n",
            n_buckets=nb,
        ).first().ks_stat
        for nb in (1, 4, 64)
    ]
    assert stats[0] == stats[1] == stats[2]


def test_ks_statistic_rejects_empty_side(spark):
    df = spark.createDataFrame([(1.0, "o"), (2.0, "o")], "v double, side string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zero rows"):
        Q.ks_statistic(
            df, "v", F.col("side") == "o", F.col("side") == "n"
        ).first()


def test_join_size_estimate_detects_same_relation_objects(spark, tmp_path):
    """Two DISTINCT DataFrame objects over the same parquet relation
    must take the single-scan self path (sameResult detection), not
    the two-histogram double-scan path."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1,), (1,), (2,)], "k int"
    ).write.parquet(p)
    a, b = spark.read.parquet(p), spark.read.parquet(p)
    est = Q.join_size_estimate(a.select("k"), "k", b.select("k"), "k")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan
    g = est.first()
    assert (g.est_rows, g.n_shared_keys, g.max_key_rows) == (5, 2, 4)


def test_time_rollup_cascade_equals_from_raw(spark):
    rng = random.Random(31)
    rows = [
        ("t%d" % (i % 3), rng.uniform(-10, 10),
         "2024-01-%02d %02d:%02d:00" % (1 + i % 3, i % 24, i % 60))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k string, v double, ts_s string").select(
        "k", "v", F.col("ts_s").cast("timestamp").alias("ts")
    )
    daily_cascade = Q.time_rollup(
        Q.time_rollup(df, "ts", 3600, ["k"], "v"),
        "ts", 86400, ["k"], "v", from_rollup=True,
    )
    daily_raw = Q.time_rollup(df, "ts", 86400, ["k"], "v")
    a = {(r.bucket_s, r.k): (r.n_rows, r.sum_value, r.min_value, r.max_value)
         for r in daily_cascade.collect()}
    b = {(r.bucket_s, r.k): (r.n_rows, r.sum_value, r.min_value, r.max_value)
         for r in daily_raw.collect()}
    assert a == b  # decimal sums: bit-for-bit through the cascade


def test_kmv_merge_equals_rebuild_and_estimates_track_truth(spark):
    from spark_relieffc_fselection_spark.operators.textstats import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    rng = random.Random(41)
    vals = [rng.randint(0, 5000) for _ in range(4000)]
    truth = len(set(vals))
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    k = 64
    whole = kmv_sketch(df, "x", k)
    halves = [
        kmv_sketch(df.filter(F.col("x") % 2 == i), "x", k) for i in (0, 1)
    ]
    merged = kmv_merge(halves, k)
    a = sorted(r.u for r in whole.collect())
    b = sorted(r.u for r in merged.collect())
    assert a == b  # merge == rebuild, bit-for-bit
    est = kmv_estimate(merged, k).first().est_distinct
    assert abs(est - truth) / truth < 0.5  # k=64 -> ~12% expected error
    # small domain: exact passthrough
    tiny = spark.createDataFrame([(i,) for i in range(10)], "x long")
    assert kmv_estimate(kmv_sketch(tiny, "x", k), k).first().est_distinct == 10.0
