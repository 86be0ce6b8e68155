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
