"""Weighted sampling + per-group cap operators (operators/sampling.py)."""

import math

import pyspark.sql.functions as F
import pytest

from spark_relieffc_fselection_spark.operators.sampling import (
    cap_per_group,
    weighted_sample_without_replacement,
)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .cache()
    )


def test_weighted_sample_exact_k_and_deterministic(spark, docs):
    a = weighted_sample_without_replacement(docs, "n_chars", 30)
    b = weighted_sample_without_replacement(docs, "n_chars", 30)
    ra = sorted((r["doc_id"], r["rank"]) for r in a.collect())
    assert len(ra) == 30
    assert ra == sorted((r["doc_id"], r["rank"]) for r in b.collect())
    assert len({d for d, _ in ra}) == 30  # without replacement


def test_weighted_sample_matches_python_oracle(spark, docs):
    """ES keys recomputed row-by-row in pure Python must select the
    same rows with the same ranks."""
    import hashlib

    rows = docs.filter(F.col("n_chars") > 0).collect()
    keyed = []
    for r in rows:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[3:9], 16)
        u = (h + 0.5) / (1 << 24)
        keyed.append((math.log(u) / r["n_chars"], -r["doc_id"], r["doc_id"]))
    keyed.sort(reverse=True)
    exp = [(doc, i + 1) for i, (_, _, doc) in enumerate(keyed[:30])]
    got = [
        (r["doc_id"], r["rank"])
        for r in weighted_sample_without_replacement(docs, "n_chars", 30)
        .orderBy("rank")
        .collect()
    ]
    assert got == exp


def test_weighted_sample_is_length_biased(spark, docs):
    """Sampling proportional to n_chars must overrepresent long docs:
    the mean length of a 20% ES sample exceeds the corpus mean."""
    n = docs.filter(F.col("n_chars") > 0).count()
    samp = weighted_sample_without_replacement(docs, "n_chars", n // 5)
    mean_s = samp.agg(F.avg("n_chars")).first()[0]
    mean_all = docs.filter(F.col("n_chars") > 0).agg(F.avg("n_chars")).first()[0]
    assert mean_s > mean_all


def test_cap_per_group_matches_window_oracle(spark, docs):
    cap = 10
    got = cap_per_group(docs, "source", cap, [F.desc("n_chars"), F.asc("doc_id")])
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    exp = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    # every group at most cap rows
    mx = got.groupBy("source").count().agg(F.max("count")).first()[0]
    assert mx <= cap


def test_cap_per_group_under_cap_groups_skip_ranking(spark):
    """With no group over the cap, the output equals the input and the
    windowed branch contributes zero rows (the whole point: the long
    tail never pays a sort)."""
    df = spark.range(20).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("v")
    )
    out = cap_per_group(df, "g", 5, [F.asc("v")])
    assert out.count() == 20
    assert sorted(r["v"] for r in out.collect()) == list(range(20))


def test_cap_per_group_routes_only_hot_groups(spark):
    """One hot group over the cap, many small ones: hot group trimmed
    to cap by rank, small groups untouched."""
    hot = spark.range(100).select(F.lit("hot").alias("g"), F.col("id").alias("v"))
    cold = spark.range(30).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("g"),
        (F.col("id") + 1000).alias("v"),
    )
    out = cap_per_group(hot.unionByName(cold), "g", 7, [F.asc("v")]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["v"])
    assert sorted(by_g["hot"]) == list(range(7))  # lowest-v first
    assert sum(len(v) for g, v in by_g.items() if g != "hot") == 30


def test_weighted_sample_per_group_exact_k_and_oracle(spark, docs):
    import hashlib
    import math

    from spark_relieffc_fselection_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    k = 4
    got = weighted_sample_per_group(docs, "source", "n_chars", k)
    rows = got.collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["source"], []).append((r["rank"], r["doc_id"]))
    # exact k per group (groups with >= k eligible rows)
    counts = {
        r["source"]: r["count"]
        for r in docs.filter("n_chars > 0").groupBy("source").count().collect()
    }
    for g, members in per_group.items():
        assert len(members) == min(k, counts[g])
        assert sorted(r for r, _ in members) == list(range(1, len(members) + 1))
    # Python re-derivation of the keys selects the same members
    exp = {}
    for r in docs.filter("n_chars > 0").collect():
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[3:9], 16)
        key = math.log((h + 0.5) / (1 << 24)) / r["n_chars"]
        exp.setdefault(r["source"], []).append((-key, r["doc_id"]))
    for g, members in exp.items():
        members.sort()
        want = [(i + 1, doc) for i, (_, doc) in enumerate(members[:k])]
        assert sorted(per_group[g]) == want, g


# --- DSIR importance resampling -------------------------------------------------


def test_dsir_weights_match_python_oracle(spark):
    """logw recomputed token-by-token in pure Python (same md5 feature
    hash, same Laplace smoothing) must match to 6 decimals."""
    import hashlib
    import re
    from collections import Counter

    from spark_relieffc_fselection_spark.operators.sampling import (
        dsir_importance_weights,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "text")
    )
    B = 16
    got = {
        r["doc_id"]: round(r["logw"], 6)
        for r in dsir_importance_weights(
            docs, F.col("lang") == "en", n_buckets=B
        ).collect()
    }

    def buckets(text):
        norm = re.sub(r"\s+", " ", text.strip().lower())
        return [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % B
            for t in norm.split(" ")
        ]

    rows = docs.collect()
    ct, cr = Counter(), Counter()
    for r in rows:
        for b in buckets(r["text"]):
            cr[b] += 1
            if r["lang"] == "en":
                ct[b] += 1
    tt, tr = sum(ct.values()), sum(cr.values())
    lam = {
        b: math.log((ct[b] + 1.0) / (tt + B)) - math.log((cr[b] + 1.0) / (tr + B))
        for b in cr
    }
    exp = {
        r["doc_id"]: round(sum(lam[b] for b in buckets(r["text"])), 6)
        for r in rows
    }
    assert got == exp


def test_dsir_upweights_target_like_docs(spark):
    """Mean importance weight of in-target (en) docs must exceed the
    out-of-target mean — the defining property of importance weighting."""
    from spark_relieffc_fselection_spark.operators.sampling import (
        dsir_importance_weights,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "text")
    )
    w = dsir_importance_weights(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["t"]: r["m"]
        for r in w.groupBy((F.col("lang") == "en").alias("t"))
        .agg(F.avg("logw").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_gumbel_topk_exact_k_and_deterministic(spark):
    from spark_relieffc_fselection_spark.operators.sampling import (
        dsir_importance_weights,
        gumbel_topk_resample,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "text")
    )
    wts = dsir_importance_weights(docs, F.col("lang") == "en")
    a = gumbel_topk_resample(wts, 25)
    b = gumbel_topk_resample(wts, 25)
    ra = sorted((r["doc_id"], r["rank"]) for r in a.collect())
    assert len(ra) == 25
    assert len({d for d, _ in ra}) == 25  # without replacement
    assert ra == sorted((r["doc_id"], r["rank"]) for r in b.collect())
