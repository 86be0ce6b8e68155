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
    pairs = all_pairs_cosine(emb.limit(100), threshold=0.0, strategy="numpy").collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in pairs)


def test_all_pairs_cosine_default_is_scale_safe(emb):
    """Plan pin (VERDICT r4 #3): the DEFAULT strategy must be the
    bucketed LSH tier — no corpus collect() to the driver during plan
    construction, no LocalTableScan-from-collect in the plan. The
    driver-collect numpy tier stays available but opt-in only."""
    tracker = emb.sparkSession.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = all_pairs_cosine(emb, threshold=0.3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # default never ran a job at plan time
    assert "LocalTableScan" not in plan
    assert "FlatMapGroupsInPandas" in plan  # bucket-keyed LSH kernel


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


def test_pq_topk_matches_numpy_reconstruction(emb, queries):
    """PQ ADC top-k must equal a numpy re-derivation: stride codebooks,
    first-minimum codes, squared-L2 against reconstructions."""
    from spark_relieffc_fselection_spark.operators.simsearch import pq_topk

    rows = emb.select("vec_id", F.col("embedding").cast("array<double>")).collect()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    m, nc, stride = 4, 8, 50
    sub = V.shape[1] // m
    C = V[(ids % stride == 0) & (ids < stride * nc)]
    recon = np.zeros_like(V)
    for j in range(m):
        sl = slice(j * sub, (j + 1) * sub)
        d = ((V[:, None, sl] - C[None, :, sl]) ** 2).sum(-1)
        recon[:, sl] = C[d.argmin(1)][:, sl]  # argmin = lowest index on ties
    exp = set()
    for qi in ids[ids % 50 == 0]:
        qv = V[ids == qi][0]
        dist = ((qv[None, :] - recon) ** 2).sum(1)
        mask = ids != qi
        cand = sorted(zip(dist[mask], ids[mask]))
        exp |= {(int(qi), int(n), r) for r, (_, n) in enumerate(cand[:5], 1)}
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_topk(emb, queries, k=5, n_centroids=nc,
                         centroid_stride=stride).collect()
    }
    assert got == exp


def test_pq_recall_improves_with_codebook_size(emb, queries):
    """More centroids -> finer quantization -> recall@10 vs exact
    should not degrade (and the tiny codebook must stay above chance)."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        brute_force_topk,
        pq_topk,
    )

    # exact squared-L2 neighbors == cosine ranks only for normalized
    # vectors, so compare within PQ: recall vs the exact-L2 ranking.
    rows = emb.select("vec_id", F.col("embedding").cast("array<double>")).collect()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    exact = {}
    for qi in ids[ids % 50 == 0]:
        qv = V[ids == qi][0]
        dist = ((qv[None, :] - V) ** 2).sum(1)
        mask = ids != qi
        exact[int(qi)] = {int(n) for _, n in sorted(zip(dist[mask], ids[mask]))[:10]}

    def recall(nc):
        got = _topk_sets(
            pq_topk(emb, queries, k=10, n_centroids=nc, centroid_stride=7).collect()
        )
        hits = sum(len(got[q] & exact[q]) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    r_small, r_big = recall(4), recall(32)
    assert r_big >= r_small
    # synthetic embeddings are near-isotropic (worst case for PQ);
    # chance recall@10 is 10/499 ~ 0.02 — require 5x chance
    assert r_big > 0.1


def test_pq_encode_plan_is_scan_only(emb):
    """Encoding must be a pure projection over the scan: no Exchange,
    no Join — the property that lets it run as one map stage at 100 TB."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        pq_codebooks,
        pq_encode,
    )

    cbs = pq_codebooks(emb)
    plan = pq_encode(emb, cbs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_pq_lut_strategy_matches_recon(emb, queries):
    """The LUT scoring path (per-subspace table lookups) must produce
    the same ranking as the recon path; distances may differ by float
    association only."""
    from spark_relieffc_fselection_spark.operators.simsearch import pq_topk

    a = pq_topk(emb, queries, k=10, strategy="recon").collect()
    b = pq_topk(emb, queries, k=10, strategy="lut").collect()
    ka = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in a)
    kb = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in b)
    assert ka == kb
    da = {(r["query_id"], r["neighbor_id"]): r["adc_dist"] for r in a}
    db = {(r["query_id"], r["neighbor_id"]): r["adc_dist"] for r in b}
    for key, v in da.items():
        assert abs(v - db[key]) < 1e-9 * max(1.0, abs(v))


def test_pq_topk_rejects_unknown_strategy(emb, queries):
    from spark_relieffc_fselection_spark.operators.simsearch import pq_topk

    with pytest.raises(ValueError):
        pq_topk(emb, queries, strategy="nope")


def test_pq_codebooks_rejects_indivisible_dim(emb):
    """ADVICE r4: dim % n_subspaces != 0 used to silently drop trailing
    dims from codes and null-pad the ADC reconstruction. Must raise."""
    from spark_relieffc_fselection_spark.operators.simsearch import pq_codebooks

    dim = len(emb.select("embedding").first()["embedding"])
    bad = next(m for m in range(3, dim) if dim % m != 0)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(emb, n_subspaces=bad)


def test_pq_codebooks_rejects_missing_stride_rows(emb):
    """Corpus without the id-stride convention rows -> clear error,
    not a bare IndexError (ADVICE r4)."""
    from spark_relieffc_fselection_spark.operators.simsearch import pq_codebooks

    shifted = emb.select(
        (F.col("vec_id") * 2 + 1).alias("vec_id"), "embedding"
    )  # all ids odd -> no id % 50 == 0 rows
    with pytest.raises(ValueError, match="stride"):
        pq_codebooks(shifted)


def test_ivfpq_matches_numpy_composition(emb, queries):
    """IVF-PQ = (numpy IVF candidate restriction) o (numpy PQ ADC)."""
    from spark_relieffc_fselection_spark.operators.simsearch import ivfpq_topk

    rows = emb.select("vec_id", F.col("embedding").cast("array<double>")).collect()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    m, nc, pq_stride, ivf_stride, n_probe, k = 4, 8, 50, 50, 4, 5
    sub = V.shape[1] // m

    # PQ reconstruction (first-minimum codes, stride codebook)
    C = V[(ids % pq_stride == 0) & (ids < pq_stride * nc)]
    recon = np.zeros_like(V)
    for j in range(m):
        sl = slice(j * sub, (j + 1) * sub)
        d = ((V[:, None, sl] - C[None, :, sl]) ** 2).sum(-1)
        recon[:, sl] = C[d.argmin(1)][:, sl]

    # IVF assignment by cosine to ALL stride centroids (lowest id ties)
    cids = ids[ids % ivf_stride == 0]
    CV = V[ids % ivf_stride == 0]
    nrm = np.linalg.norm(V, axis=1)
    cnrm = np.linalg.norm(CV, axis=1)
    with np.errstate(invalid="ignore"):
        cos = np.where(
            (nrm[:, None] * cnrm[None, :]) == 0,
            0.0,
            (V @ CV.T) / (nrm[:, None] * cnrm[None, :]),
        )
    assign = cids[cos.argmax(1)]  # argmax = lowest index on ties

    exp = set()
    for qi in ids[ids % 50 == 0]:
        qrow = np.flatnonzero(ids == qi)[0]
        probed = cids[np.argsort(-cos[qrow], kind="stable")[:n_probe]]
        cand = np.isin(assign, probed) & (ids != qi)
        dist = ((V[qrow][None, :] - recon[cand]) ** 2).sum(1)
        ranked = sorted(zip(dist, ids[cand]))
        exp |= {(int(qi), int(n), r) for r, (_, n) in enumerate(ranked[:k], 1)}
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivfpq_topk(emb, queries, k=k, n_probe=n_probe).collect()
    }
    assert got == exp


def test_ivfpq_index_persist_probe_matches_online(spark, tmp_path):
    """write_ivfpq_index + ivfpq_probe_read must serve the same ranking
    as the online ivfpq_topk (ADC sums differ only by float
    association), while scanning only probed list partitions of a
    codes-only table."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        ivfpq_probe_read,
        ivfpq_topk,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id % 250 = 0")
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, ivf_stride=25)

    online = sorted(
        map(
            tuple,
            ivfpq_topk(emb, queries, k=5, n_probe=2, ivf_stride=25)
            .select("query_id", "neighbor_id", "rank")
            .collect(),
        )
    )
    served_df = ivfpq_probe_read(spark, path, queries, k=5, n_probe=2)
    served = sorted(
        map(tuple, served_df.select("query_id", "neighbor_id", "rank").collect())
    )
    assert served == online and len(served) > 0

    # stored lists carry codes only (no float vectors)...
    lists_schema = spark.read.parquet(f"{path}/lists").schema
    assert "vec" not in [f.name for f in lists_schema]
    assert any(f.name.startswith("code_") for f in lists_schema)
    # ...and the probe scan partition-prunes on list_id
    plan = served_df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan
    assert "list_id" in pf[1][:300]


def test_ivfpq_index_append_equals_full_build(spark, tmp_path):
    """Building on half the corpus then appending the rest must serve
    the same results as one full build, provided the deterministic
    centroid/codebook rows live in the first half (they do: ids < 400
    at stride 50 x 8 centroids, and the split keeps low ids first)."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        ivfpq_index_append,
        ivfpq_probe_read,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lo = emb.filter("vec_id < 400")
    # the appended batch gets ids = 7 (mod 50) — never a stride-25
    # centroid or stride-50 codebook row — so the deterministic
    # centroid/codebook sets are identical whether the index is built
    # in one shot or built-then-appended
    hi = emb.filter("vec_id >= 400").withColumn(
        "vec_id", F.col("vec_id") * 50 + 7
    )
    assert hi.count() > 0
    corpus = lo.unionByName(hi)
    queries = corpus.filter("vec_id % 250 = 0")

    full_path = str(tmp_path / "full")
    incr_path = str(tmp_path / "incr")
    write_ivfpq_index(corpus, full_path, ivf_stride=25)
    write_ivfpq_index(lo, incr_path, ivf_stride=25)
    ivfpq_index_append(spark, incr_path, hi)

    full = sorted(
        map(
            tuple,
            ivfpq_probe_read(spark, full_path, queries, k=5, n_probe=2)
            .select("query_id", "neighbor_id", "rank")
            .collect(),
        )
    )
    incr = sorted(
        map(
            tuple,
            ivfpq_probe_read(spark, incr_path, queries, k=5, n_probe=2)
            .select("query_id", "neighbor_id", "rank")
            .collect(),
        )
    )
    assert incr == full and len(incr) > 0


def test_centroid_assign_arrow_matches_expr_bitwise(emb):
    """The Arrow assignment kernel accumulates dot/norm dimension-at-a-
    time left-to-right — the Catalyst fold's exact IEEE op sequence —
    so assignments must match the literal-expression tier EXACTLY on
    every row (not just statistically): any divergence means the
    kernel's arithmetic order drifted and oracle ties could flip."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        centroid_assign,
        ivf_assignments,
    )

    centroids, _ = ivf_assignments(emb, 50)
    cent_rows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    vecs = emb.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    arrow = {
        r["vec_id"]: r["list_id"]
        for r in centroid_assign(
            vecs, cent_rows, strategy="arrow", keep_cols=("vec_id",)
        ).collect()
    }
    expr = {
        r["vec_id"]: r["list_id"]
        for r in centroid_assign(
            vecs, cent_rows, strategy="expr", keep_cols=("vec_id",)
        ).collect()
    }
    assert arrow == expr and len(arrow) == vecs.count()


def test_centroid_assign_rejects_unknown_strategy(emb):
    from spark_relieffc_fselection_spark.operators.simsearch import (
        centroid_assign,
        ivf_assignments,
    )

    centroids, _ = ivf_assignments(emb, 50)
    cent_rows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    with pytest.raises(ValueError):
        centroid_assign(emb, cent_rows, strategy="nope")


# --- SemDeDup (semantic_dedup) ------------------------------------------------


def test_semantic_dedup_drops_planted_copies(spark):
    """Near-copies of a base vector must be dropped with dup_of = the
    lowest-id member; unrelated vectors survive."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        semantic_dedup,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),     # centroid (id % 2 == 0 stride)
        (1, [0.99, 0.01, 0.0, 0.0]),   # near-copy of 0
        (3, [0.98, -0.01, 0.0, 0.0]),  # near-copy of 0
        (2, [0.0, 0.0, 1.0, 0.0]),     # centroid, unrelated
        (5, [0.0, 0.1, -1.0, 0.0]),    # near-copy of... opposite sign: kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, threshold=0.95, centroid_stride=2)
    got = {r["vec_id"]: (r["dup_of"], r["list_id"]) for r in out.collect()}
    assert set(got) == {1, 3}
    assert got[1][0] == 0 and got[3][0] == 0
    assert got[1][1] == 0 and got[3][1] == 0  # clustered under centroid 0


def test_semantic_dedup_is_cluster_scoped(spark):
    """A duplicate pair split across clusters is NOT scored: each
    member sits nearest a different centroid."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        semantic_dedup,
    )

    import math

    # centroids at ids 0 ([1,0]) and 2 (the 45-degree diagonal);
    # ids 5 and 7 straddle the 22.5-degree decision boundary: they are
    # 0.2 degrees apart (cos ~ 0.999994, far above threshold) yet 5
    # assigns to centroid 0 and 7 to centroid 2, so the pair is never
    # scored. id 9 sits 0.1 degrees from 5 INSIDE cluster 0 -> dropped.
    def ang(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    rows = [(0, ang(0.0)), (2, ang(45.0)), (5, ang(22.4)), (7, ang(22.6)),
            (9, ang(22.3))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, threshold=0.999, centroid_stride=2)
    got = {r["vec_id"]: (r["dup_of"], r["list_id"]) for r in out.collect()}
    assert got == {9: (5, 0)}, got


def test_semantic_dedup_caps_degenerate_cluster(spark):
    """100k identical vectors form one degenerate cluster; the cap
    drops it (observed) instead of an O(n^2) in-cluster pair task,
    while a distinct duplicate pair elsewhere still reports."""
    from pyspark.sql import Observation

    from spark_relieffc_fselection_spark.operators.simsearch import (
        semantic_dedup,
    )

    n_hot = 100_000
    # centroids (stride 2): id 0 = x-axis, id 2 = y-axis. The hot
    # degenerate cluster is 100k near-copies of the x-axis (odd ids);
    # the surviving pair (5, 7) clusters under the y-axis. At least one
    # cluster must survive for the counters to be readable: if EVERY
    # cluster is capped, AQE's empty-relation propagation can skip the
    # observed branch and obs.get raises instead of reporting.
    base = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0]), (5, [0.01, 1.0]),
         (7, [0.011, 1.0])],
        "vec_id long, embedding array<double>",
    )
    hot = spark.range(n_hot).select(
        (11 + 2 * F.col("id")).alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.001)).alias("embedding"),
    )
    obs = Observation("semdedup_cap")
    out = semantic_dedup(
        base.unionByName(hot),
        threshold=0.99,
        centroid_stride=2,
        observation=obs,
    ).collect()
    got = {r["vec_id"]: r["dup_of"] for r in out}
    m = obs.get
    assert m["dropped_clusters"] >= 1
    assert m["dropped_members"] >= n_hot
    assert got == {5: 2, 7: 2}  # the hot clique contributed nothing


def test_pca_project_matches_numpy(spark):
    import numpy as np

    from spark_relieffc_fselection_spark.operators.simsearch import (
        pca_project,
    )

    rng = np.random.RandomState(23)
    # anisotropic cloud so the top components are well-separated
    base = rng.randn(120, 6) * np.array([10.0, 5.0, 2.0, 1.0, 0.5, 0.1])
    mix = rng.randn(6, 6)
    data = base @ mix
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.id: (r.pc_0, r.pc_1) for r in pca_project(df, k=2).collect()
    }

    mu = data.mean(axis=0)
    cov = np.cov(data, rowvar=False, ddof=1)
    eigval, eigvec = np.linalg.eigh(cov)
    comps = eigvec[:, np.argsort(eigval)[::-1][:2]].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    want = (data - mu) @ comps.T
    for i in range(len(data)):
        assert abs(got[i][0] - want[i, 0]) < 1e-8
        assert abs(got[i][1] - want[i, 1]) < 1e-8


def test_pca_project_plan_no_join_no_python(spark):
    """The transform side must be literal-array Catalyst expressions:
    no join/exchange introduced by the components, no Python in the
    row path (the PQ-codebook discipline)."""
    from spark_relieffc_fselection_spark.operators.simsearch import (
        pca_project,
    )

    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    out = pca_project(df, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan


def test_ann_multiprobe_recall_monotone_in_radius(emb, queries):
    """The ANN tier's probe-radius knob mirrors knn.py's: candidates
    only grow with the radius, so recall@k is monotone non-decreasing
    single-probe -> Hamming-1 -> Hamming-2."""
    exact = _topk_sets(brute_force_topk(emb, queries, k=10).collect())

    def recall(**kw):
        approx = _topk_sets(
            lsh_bucketed_topk(emb, queries, k=10, n_bits=4, n_tables=4, **kw).collect()
        )
        return np.mean([len(exact[q] & approx.get(q, set())) / 10 for q in exact])

    r0 = recall()
    r1 = recall(multiprobe=True, probe_radius=1)
    r2 = recall(multiprobe=True, probe_radius=2)
    assert r0 <= r1 <= r2
    assert r2 > r0  # the knob buys something real on this fixture
    import pytest as _pytest

    with _pytest.raises(ValueError, match="probe_radius"):
        lsh_bucketed_topk(emb, queries, k=10, multiprobe=True, probe_radius=3)


def test_maxsim_rerank_matches_numpy_bruteforce(spark):
    """maxsim_rerank == numpy: score(q, d) = sum over query tokens of
    max over doc tokens of the dot product; ranking ties break by
    doc_id; self-pairs excluded."""
    import numpy as np

    from spark_relieffc_fselection_spark.operators.retrieval import maxsim_rerank

    rng = np.random.default_rng(17)
    n_docs, tpd, dim, k = 7, 3, 4, 3
    vecs = rng.normal(size=(n_docs, tpd, dim)).round(3)
    rows = [
        (d, t, vecs[d, t].tolist())
        for d in range(n_docs)
        for t in range(tpd)
    ]
    tok = spark.createDataFrame(rows, "doc_id long, tok_idx int, vec array<double>")
    queries = tok.filter("doc_id IN (0, 4)")
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in maxsim_rerank(tok, queries, k=k).collect()
    }
    for q in (0, 4):
        scores = []
        for d in range(n_docs):
            if d == q:
                continue
            s = sum(
                max(float(np.dot(vecs[q, t], vecs[d, u])) for u in range(tpd))
                for t in range(tpd)
            )
            scores.append((round(s, 6), d))
        scores.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, d) in enumerate(scores[:k], start=1):
            assert got[(q, rank)][0] == d, (q, rank, got, scores)
            assert abs(got[(q, rank)][1] - s) < 1e-9


def test_maxsim_composes_with_first_stage_candidates(spark):
    """The operator's composition contract: feeding doc_tokens from a
    first-stage candidate set (here: the true top-C by full maxsim,
    standing in for a BM25/ANN cut) reranks identically to slicing the
    full ranking — scores are per-pair, so restricting the doc side
    changes nothing but coverage."""
    import numpy as np

    from spark_relieffc_fselection_spark.operators.retrieval import maxsim_rerank

    rng = np.random.default_rng(23)
    n_docs, tpd, dim = 9, 2, 3
    vecs = rng.normal(size=(n_docs, tpd, dim)).round(3)
    rows = [
        (d, t, vecs[d, t].tolist()) for d in range(n_docs) for t in range(tpd)
    ]
    tok = spark.createDataFrame(rows, "doc_id long, tok_idx int, vec array<double>")
    queries = tok.filter("doc_id = 2")
    full = maxsim_rerank(tok, queries, k=5).collect()
    cand_ids = [r["doc_id"] for r in full]  # the top-5 as the candidate set
    cand_tok = tok.filter(F.col("doc_id").isin(cand_ids + [2]))
    rerank = maxsim_rerank(cand_tok, queries, k=5).collect()
    assert [(r["doc_id"], r["score"], r["rank"]) for r in rerank] == [
        (r["doc_id"], r["score"], r["rank"]) for r in full
    ]


def test_maxsim_is_input_order_invariant_bitwise(spark):
    """Shuffling the input ROW order changes nothing, bit-for-bit: the
    sort_array token assembly pins the fold order, which is the whole
    reason it exists (collect_list has no order contract and fold-left
    float sums are order-sensitive)."""
    import numpy as np

    from spark_relieffc_fselection_spark.operators.retrieval import maxsim_rerank

    rng = np.random.default_rng(31)
    n_docs, tpd, dim = 6, 3, 4
    vecs = rng.normal(size=(n_docs, tpd, dim)).round(3)
    rows = [
        (d, t, vecs[d, t].tolist()) for d in range(n_docs) for t in range(tpd)
    ]
    tok_fwd = spark.createDataFrame(
        rows, "doc_id long, tok_idx int, vec array<double>"
    )
    tok_rev = spark.createDataFrame(
        rows[::-1], "doc_id long, tok_idx int, vec array<double>"
    ).repartition(7)
    q_fwd = tok_fwd.filter("doc_id = 1")
    q_rev = tok_rev.filter("doc_id = 1")
    a = sorted(map(tuple, maxsim_rerank(tok_fwd, q_fwd, k=4).collect()))
    b = sorted(map(tuple, maxsim_rerank(tok_rev, q_rev, k=4).collect()))
    assert a == b  # EXACT equality, scores included


def test_two_stage_maxsim_matches_numpy(spark):
    """two_stage_maxsim == numpy: stage 1 cuts to top-C by centroid
    dot (rounded, doc_id ties), stage 2 is exact MaxSim over the
    candidates only."""
    import numpy as np

    from spark_relieffc_fselection_spark.operators.retrieval import two_stage_maxsim

    rng = np.random.default_rng(41)
    n_docs, tpd, dim, C, k = 12, 3, 4, 4, 3
    vecs = rng.normal(size=(n_docs, tpd, dim)).round(3)
    rows = [
        (d, t, vecs[d, t].tolist()) for d in range(n_docs) for t in range(tpd)
    ]
    tok = spark.createDataFrame(rows, "doc_id long, tok_idx int, vec array<double>")
    queries = tok.filter("doc_id IN (0, 7)")
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in two_stage_maxsim(tok, queries, first_stage_c=C, k=k).collect()
    }
    # mirror the operator: centroid components are fold-left sums over
    # tok_idx order / count, and stage 1 ranks the RAW fold-left dot
    # (deliberately unrounded — the q110 half-boundary lesson)
    def fold_centroid(d):
        c = [0.0] * dim
        for t in range(tpd):
            for i in range(dim):
                c[i] += vecs[d, t, i]
        return [x / tpd for x in c]

    cents = [fold_centroid(d) for d in range(n_docs)]

    def fold_dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    for q in (0, 7):
        s1 = sorted(
            (
                (-fold_dot(cents[q], cents[d]), d)
                for d in range(n_docs)
                if d != q
            ),
        )
        cand = [d for _, d in s1[:C]]
        s2 = []
        for d in cand:
            s = sum(
                max(float(np.dot(vecs[q, t], vecs[d, u])) for u in range(tpd))
                for t in range(tpd)
            )
            s2.append((round(s, 6), d))
        s2.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, d) in enumerate(s2[:k], start=1):
            assert got[(q, rank)][0] == d, (q, rank, got, s2)
            assert abs(got[(q, rank)][1] - s) < 1e-9


def test_maxsim_candidates_mode_dedupes_pairs(spark):
    """A duplicated (query_id, doc_id) candidate row must not double
    the pair's score — the operator dedupes defensively."""
    import numpy as np

    from spark_relieffc_fselection_spark.operators.retrieval import maxsim_rerank

    rng = np.random.default_rng(47)
    vecs = rng.normal(size=(4, 2, 3)).round(3)
    rows = [(d, t, vecs[d, t].tolist()) for d in range(4) for t in range(2)]
    tok = spark.createDataFrame(rows, "doc_id long, tok_idx int, vec array<double>")
    queries = tok.filter("doc_id = 0")
    cand_clean = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id long, doc_id long"
    )
    cand_dup = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2)], "query_id long, doc_id long"
    )
    a = sorted(map(tuple, maxsim_rerank(tok, queries, 3, candidates=cand_clean).collect()))
    b = sorted(map(tuple, maxsim_rerank(tok, queries, 3, candidates=cand_dup).collect()))
    assert a == b


def test_maxsim_broadcast_ceiling_is_self_enforcing(spark, monkeypatch):
    """maxsim_rerank probes the query-token count itself (bounded
    limit+count), so the broadcast ceiling fires without callers
    volunteering num_query_tokens: rerank-ALL past the ceiling raises
    (a non-broadcast cross join is never the right plan); candidates
    mode drops the hint and still computes correct scores."""
    from spark_relieffc_fselection_spark.operators import retrieval

    tok = spark.createDataFrame(
        [(d, t, [float(d + 1), float(t + 1)]) for d in range(6) for t in range(2)],
        "doc_id long, tok_idx int, vec array<double>",
    )
    queries = tok.filter("doc_id = 0")
    monkeypatch.setattr(retrieval, "MAX_BROADCAST_QUERY_TOKENS", 1)
    with pytest.raises(ValueError, match="broadcastable"):
        retrieval.maxsim_rerank(tok, queries, k=3)
    cand = spark.createDataFrame(
        [(0, d) for d in range(1, 6)], "query_id long, doc_id long"
    )
    out = retrieval.maxsim_rerank(tok, queries, k=3, candidates=cand).collect()
    assert len(out) == 3
    monkeypatch.setattr(retrieval, "MAX_BROADCAST_QUERY_TOKENS", 500_000)
    ref = retrieval.maxsim_rerank(tok, queries, k=3, candidates=cand).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, ref))
