import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.simsearch import (
    all_pairs_cosine,
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    lsh_near_duplicates,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 50 == 0)


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_bruteforce_matches_numpy(emb, queries):
    X = np.array([r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in emb.orderBy("vec_id").collect()])
    got = _topk_sets(brute_force_topk(emb, queries, k=5).collect())
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ Xn.T
    for qpos, qid in enumerate(ids):
        if qid % 50 != 0:
            continue
        s = sims[qpos].copy()
        s[qpos] = -np.inf
        expected = set(ids[np.lexsort((ids, -s))[:5]])
        assert got[qid] == expected, qid


def test_lsh_recall_reasonable(emb, queries):
    exact = _topk_sets(brute_force_topk(emb, queries, k=10).collect())
    approx = _topk_sets(
        lsh_bucketed_topk(emb, queries, k=10, n_bits=4, n_tables=4).collect()
    )
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    # 4 tables x 4-bit buckets: per-table match prob ~p^4, unioned over
    # tables; weakly-similar corpus -> expect moderate but real recall
    assert np.mean(recalls) > 0.15


def test_ivf_recall_beats_scan_fraction(emb, queries):
    exact = _topk_sets(brute_force_topk(emb, queries, k=10).collect())
    approx = _topk_sets(
        ivf_topk(emb, queries, k=10, centroid_stride=50, n_probe=4).collect()
    )
    recalls = [len(exact[q] & approx.get(q, set())) / 10 for q in exact]
    # 10 lists, probing 4 -> scanning ~40%; nearest-list probing should
    # recover well over that fraction of true neighbors
    assert np.mean(recalls) > 0.5


def test_all_pairs_cosine_symmetric_bounds(emb):
    pairs = all_pairs_cosine(emb.limit(100), threshold=0.0).collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in pairs)


def test_lsh_near_duplicates_subset_of_exact_with_exact_cosines(emb):
    """The bucketed near-dup must return a SUBSET of the exact all-pairs
    result (it can only miss pairs, never invent or mis-score them)."""
    corpus = emb.limit(150)
    t = 0.2
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in all_pairs_cosine(corpus, threshold=t, strategy="sql").collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in lsh_near_duplicates(corpus, threshold=t).collect()
    }
    assert bucketed  # fixture has pairs above the threshold
    assert set(bucketed) <= set(exact)
    for pair, cos in bucketed.items():
        assert abs(cos - exact[pair]) < 1e-9


def test_lsh_near_duplicates_no_driver_collect(emb):
    """Plan pin (VERDICT r2 #1): the bucketed near-dup never
    materializes the corpus driver-side — building the plan triggers no
    Spark job. The default kernel is the per-bucket Arrow group matmul
    (FlatMapGroupsInPandas, distributed by (table, bucket)); the 'sql'
    kernel stays pure Catalyst with no Python stage at all."""
    tracker = emb.sparkSession.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = lsh_near_duplicates(emb, threshold=0.3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # no collect() during plan construction
    assert "FlatMapGroupsInPandas" in plan  # bucket-keyed, not driver-side
    sql_plan = (
        lsh_near_duplicates(emb, threshold=0.3, kernel="sql")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in sql_plan and "Pandas" not in sql_plan


def test_lsh_near_duplicates_kernels_agree(emb):
    """The Arrow bucket kernel and the Catalyst fold must produce the
    identical pair set and 6-decimal cosines (the oracle gate rides on
    this equivalence)."""
    corpus = emb.limit(200)
    a = sorted(map(tuple, lsh_near_duplicates(corpus, 0.2, kernel="numpy").collect()))
    b = sorted(map(tuple, lsh_near_duplicates(corpus, 0.2, kernel="sql").collect()))
    assert a == b and a


def test_ivf_index_persist_probe_matches_online(spark, tmp_path):
    """write_ivf_index + ivf_probe_read must serve results identical
    to the online ivf_topk, while the probe scan PRUNES partitions
    (directory-level, before any row is read)."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        ivf_probe_read,
        ivf_topk,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id % 250 = 0")
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, centroid_stride=25)

    online = sorted(
        map(
            tuple,
            ivf_topk(emb, queries, k=5, centroid_stride=25, n_probe=2)
            .select("query_id", "neighbor_id", "rank")
            .collect(),
        )
    )
    served_df = ivf_probe_read(spark, path, queries, k=5, n_probe=2)
    served = sorted(
        map(tuple, served_df.select("query_id", "neighbor_id", "rank").collect())
    )
    assert served == online and len(served) > 0

    # pruning: the probed list_ids must reach the scan as
    # PartitionFilters (applied at the file index, BEFORE any row is
    # read) and must be a strict subset of the index's lists.
    # (inputFiles() snapshots the file index pre-pruning, so the plan
    # text is the authoritative check.)
    plan = served_df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan
    assert "list_id IN" in pf[1][:300] or "list_id#" in pf[1][:300]
    n_lists = (
        spark.read.parquet(f"{path}/lists").select("list_id").distinct().count()
    )
    import re

    lids = {
        int(x) for x in re.findall(r"(\d+)", pf[1][: pf[1].index("]")])
    }
    assert 0 < len(lids) < n_lists
