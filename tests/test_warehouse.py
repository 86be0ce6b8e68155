"""Property/brute-force tests for the warehouse analytics operators
(operators/analytics.py, scd.py, graph.py, retrieval.py)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.analytics import (
    cohort_retention,
    funnel_counts,
    mad_outliers,
    merge_intervals,
    skyline_2d,
)
from spark_relieffc_fselection_spark.operators.graph import closure_to_root
from spark_relieffc_fselection_spark.operators.retrieval import bm25_topk
from spark_relieffc_fselection_spark.operators.scd import scd2_delta


# ---------------------------------------------------------------- skyline
def brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_skyline_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    # Small coordinate domain forces duplicates and ties on both axes.
    pts = [(rng.randint(0, 12), rng.randint(0, 12)) for _ in range(200)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id int, x int, y int"
    )
    got = sorted(
        (r.x, r.y) for r in skyline_2d(df, "x", "y", n_partitions=4).collect()
    )
    # Brute force keeps duplicate front points too.
    assert got == brute_skyline(pts)


def test_skyline_keeps_coincident_points(spark):
    df = spark.createDataFrame(
        [(1, 5, 5), (2, 5, 5), (3, 4, 6)], "id int, x int, y int"
    )
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    assert got == [1, 2, 3]


# ---------------------------------------------------------- interval merge
def brute_merge(intervals):
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += 1
        else:
            out.append([s, e, 1])
    return sorted((s, e, n) for s, e, n in out)


@pytest.mark.parametrize("seed", [0, 7])
def test_merge_intervals_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = []
    per_key = {}
    for i in range(300):
        k = rng.randint(0, 4)
        s = rng.randint(0, 500)
        e = s + rng.randint(1, 40)
        rows.append((k, s, e))
        per_key.setdefault(k, []).append((s, e))
    df = spark.createDataFrame(rows, "k int, s int, e int")
    got = {}
    for r in merge_intervals(df, "k", "s", "e").collect():
        got.setdefault(r.k, []).append((r.s, r.e, r.n_merged))
    for k, ivs in per_key.items():
        assert sorted(got[k]) == brute_merge(ivs), f"key {k}"


def test_merge_intervals_touching_merge(spark):
    df = spark.createDataFrame(
        [(1, 0, 10), (1, 10, 20), (1, 21, 30)], "k int, s int, e int"
    )
    got = sorted(
        (r.s, r.e, r.n_merged)
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert got == [(0, 20, 2), (21, 30, 1)]


# ------------------------------------------------------------ MAD outliers
def test_mad_outliers_bruteforce(spark):
    rng = random.Random(3)
    rows = [("a", i, rng.gauss(10, 1)) for i in range(200)]
    rows += [("a", 900 + i, 50.0 + i) for i in range(3)]  # outliers
    rows += [("b", 1000 + i, float(i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, id long, v double")

    def median(xs):
        xs = sorted(xs)
        n = len(xs)
        mid = (n - 1) / 2
        lo, hi = xs[int(math.floor(mid))], xs[int(math.ceil(mid))]
        return (lo + hi) / 2

    expected = set()
    by_g = {}
    for g, i, v in rows:
        by_g.setdefault(g, []).append((i, v))
    for g, vs in by_g.items():
        med = median([v for _, v in vs])
        mad = median([abs(v - med) for _, v in vs])
        for i, v in vs:
            if abs(v - med) > 3 * 1.4826 * mad:
                expected.add(i)

    got = {r.id for r in mad_outliers(df, "g", "v").collect()}
    assert got == expected
    assert got  # the planted outliers actually flag
    for r in mad_outliers(df, "g", "v").collect():
        if r.rscore is not None:
            assert abs(r.rscore) > 3


def test_mad_zero_flags_any_deviation_with_null_score(spark):
    rows = [("c", i, 1.0) for i in range(9)] + [("c", 99, 2.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = mad_outliers(df, "g", "v").collect()
    assert [r.id for r in out] == [99]
    assert out[0].rscore is None


# ----------------------------------------------------------------- funnel
def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes all three in order
        (1, "signup", 10), (1, "view", 20), (1, "purchase", 30),
        # u2 views BEFORE signup only -> stops at signup
        (2, "view", 5), (2, "signup", 10),
        # u3 purchase before view -> reaches view, not purchase
        (3, "signup", 1), (3, "purchase", 2), (3, "view", 3),
        # u4 same-timestamp view (not strictly after) -> stops at signup
        (4, "signup", 7), (4, "view", 7),
        # u5 never signs up
        (5, "view", 1), (5, "purchase", 2),
    ]
    df = spark.createDataFrame(rows, "u int, t string, ts long")
    got = {
        r.stage: r.n_users
        for r in funnel_counts(
            df, "u", "t", "ts", ("signup", "view", "purchase")
        ).collect()
    }
    assert got == {"signup": 4, "view": 2, "purchase": 1}


# ------------------------------------------------------------------ cohort
def test_cohort_retention_hand_case(spark):
    day = 24 * 3600
    rows = [
        (1, 0), (1, 7 * day), (1, 14 * day),   # cohort w0, active w0/w1/w2
        (2, 0), (2, 14 * day),                  # cohort w0, active w0/w2
        (3, 7 * day),                           # cohort w1
    ]
    df = spark.createDataFrame(rows, "user_id int, t long").select(
        "user_id", F.timestamp_seconds("t").alias("ts")
    )
    got = {
        (r.cohort_week_s, r.week_offset): r.n_users
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    week = 7 * day
    assert got == {
        (0, 0): 2, (0, 1): 1, (0, 2): 2,
        (week, 0): 1,
    }


# ----------------------------------------------------------------- closure
def test_closure_matches_python_climb(spark):
    nodes = [(i, None if i < 10 else i // 10) for i in range(1500)]
    df = spark.createDataFrame(nodes, "node long, parent long")
    got = {
        r.node: (r.root, r.depth)
        for r in closure_to_root(df, "node", "parent").collect()
    }
    for i, _ in nodes:
        cur, d = i, 0
        while cur >= 10:
            cur, d = cur // 10, d + 1
        assert got[i] == (cur, d), i
    # depth 3 chains exist, so at least two doubling rounds ran
    assert max(d for _, d in got.values()) == 3


def test_closure_cycle_raises(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (3, None)], "node long, parent long"
    )
    with pytest.raises(RuntimeError, match="cycle"):
        closure_to_root(df, "node", "parent", max_rounds=5)


def test_closure_self_parent_is_root(spark):
    df = spark.createDataFrame([(1, 1), (2, 1)], "node long, parent long")
    got = {
        r.node: (r.root, r.depth)
        for r in closure_to_root(df, "node", "parent").collect()
    }
    assert got == {1: (1, 0), 2: (1, 1)}


# -------------------------------------------------------------------- scd2
def test_scd2_delta_all_transition_kinds(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k int, v string"
    )
    rows = scd2_delta(
        old, new, keys=["k"], compare=["v"], v_old=1, v_new=2
    ).collect()
    hist = sorted(
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in rows
    )
    assert hist == [
        (1, "a", 1, None, True),    # unchanged
        (2, "B", 2, None, True),    # changed: new current
        (2, "b", 1, 2, False),      # changed: closed
        (3, "c", 1, 2, False),      # removed: closed
        (4, "d", 2, None, True),    # added
    ]


def test_scd2_null_payload_and_null_key_handling(spark):
    old = spark.createDataFrame([(1, None), (None, "x")], "k int, v string")
    new = spark.createDataFrame([(1, "y"), (None, "x")], "k int, v string")
    rows = scd2_delta(
        old, new, keys=["k"], compare=["v"], v_old=3, v_new=4
    ).collect()
    hist = sorted(
        (
            ((r.k if r.k is not None else -1), r.v or "", r.valid_from),
            (r.k if r.k is not None else -1, r.v, r.valid_from, r.valid_to),
        )
        for r in rows
    )
    hist = [h[1] for h in hist]
    # null key matches via eqNullSafe (unchanged); null payload digests
    # differently from 'y' (changed).
    assert hist == [
        (-1, "x", 3, None),
        (1, None, 3, 4),
        (1, "y", 4, None),
    ]


# -------------------------------------------------------------------- bm25
def test_bm25_matches_python_reference(spark):
    corpus = {
        10: "spark merge window spark",
        11: "the quick brown fox",
        12: "merge sort merge join merge",
        13: "window functions in spark",
        14: "",
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    terms = ("spark", "merge", "window")
    got = {
        r.doc_id: (r.score, r.rank)
        for r in bm25_topk(df, terms, 3).collect()
    }

    toks = {d: [t for t in txt.lower().split() if t] for d, txt in corpus.items()}
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    df_t = {
        t: sum(1 for ts in toks.values() if t in ts) for t in terms
    }
    scores = {}
    for d, ts in toks.items():
        s = 0.0
        for t in terms:
            tf = ts.count(t)
            if not tf:
                continue
            idf = math.log((n - df_t[t] + 0.5) / (df_t[t] + 0.5) + 1.0)
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
        if s:
            scores[d] = round(s, 6)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    expected = {d: (s, i + 1) for i, (d, s) in enumerate(ranked)}
    assert {d: (round(s, 6), r) for d, (s, r) in got.items()} == expected


def test_recursive_cte_agrees_with_pointer_doubling(spark):
    """q155 (native WITH RECURSIVE) and q120 (pointer doubling) are two
    physical strategies for the same closure — their per-root rollups
    must agree row-for-row."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_DIR

    from spark_relieffc_fselection_spark.queries.warehouse_q import (
        q120_hierarchy_closure,
        q155_recursive_cte,
    )

    rec = {
        r["root_key"]: (r["n_nodes"], r["max_depth"])
        for r in q155_recursive_cte(spark, SF_DIR).collect()
    }
    dbl = {
        r["root_key"]: (r["n"], r["d"])
        for r in q120_hierarchy_closure(spark, SF_DIR)
        .groupBy("root_key")
        .agg(F.count("*").alias("n"), F.max("depth").alias("d"))
        .collect()
    }
    assert rec == dbl
