import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.knn import knn_join
from tests.oracle_relief import knn_oracle


@pytest.fixture(scope="module")
def small_vectors(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 8)).round(4)
    rows = [(i, X[i].tolist()) for i in range(len(X))]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    return df, X


@pytest.mark.parametrize("strategy", ["sql", "numpy"])
def test_knn_matches_oracle(spark, small_vectors, strategy):
    df, X = small_vectors
    k = 5
    got = (
        knn_join(df, df, k, strategy=strategy)
        .orderBy("query_id", "rank")
        .collect()
    )
    expected = knn_oracle(X, k)
    by_query: dict[int, list[int]] = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert len(by_query) == len(X)
    for qid, ids in by_query.items():
        assert ids == expected[qid], f"query {qid}"


def test_knn_distances_correct(spark, small_vectors):
    df, X = small_vectors
    rows = knn_join(df, df, 3, strategy="sql").collect()
    for r in rows:
        d = np.sqrt(((X[r["query_id"]] - X[r["neighbor_id"]]) ** 2).sum())
        assert abs(r["distance"] - d) < 1e-9


def test_knn_self_inclusion_toggle(spark, small_vectors):
    df, _ = small_vectors
    with_self = knn_join(df, df, 1, exclude_self=False).collect()
    assert all(r["query_id"] == r["neighbor_id"] and r["distance"] == 0.0 for r in with_self)


def test_knn_numpy_excludes_self_without_losing_rank_slots(spark, small_vectors):
    """Regression: the numpy kernel must exclude self *inside* the
    kernel — post-filtering the per-partition top-k left k-1 neighbors
    for self-containing partitions."""
    df, X = small_vectors
    k = 4
    a = knn_join(df, df, k, strategy="sql").orderBy("query_id", "rank").collect()
    b = knn_join(df, df, k, strategy="numpy").orderBy("query_id", "rank").collect()
    assert len(a) == len(b) == len(X) * k
    assert [r["neighbor_id"] for r in a] == [r["neighbor_id"] for r in b]


def test_knn_numpy_no_self_leak_when_k_exceeds_rows(spark):
    """Regression: with fewer rows than k, the inf-masked self slot must
    not surface as a rank-k neighbor."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "id long, features array<double>",
    )
    rows = knn_join(df, df, k=10, strategy="numpy").collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    assert all(np.isfinite(r["distance"]) for r in rows)
    assert len(rows) == 6  # 3 queries x 2 real neighbors


def test_knn_query_subset_broadcast_plan(spark, small_vectors):
    """The SQL-strategy plan must broadcast the query side (SURVEY J1)."""
    df, _ = small_vectors
    queries = df.filter(F.col("id") < 5)
    plan = knn_join(df, queries, 3)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_knn_gemm_matches_diff_kernel_on_integer_grid(spark):
    """numpy-gemm is bit-exact on integer coordinates (products and sums
    stay in float64's exact-integer range), including exact-duplicate
    rows whose distance must clamp to 0, so ranks/distances must equal
    the diff kernel's verbatim."""
    rng = np.random.default_rng(11)
    X = rng.integers(-5, 6, size=(80, 16)).astype(float)
    X[41] = X[7]  # exact duplicate pair
    X[55] = X[7]
    rows = [(i, X[i].tolist()) for i in range(len(X))]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    k = 6
    cols = ["query_id", "rank", "neighbor_id", "distance"]
    base = knn_join(df, df, k, strategy="numpy").select(*cols).collect()
    gemm = knn_join(df, df, k, strategy="numpy-gemm").select(*cols).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, gemm))


@pytest.mark.parametrize("strategy", ["numpy", "numpy-gemm"])
def test_knn_boundary_ties_keep_lowest_ids(spark, strategy):
    """Ties at the k-th distance must resolve to the LOWEST neighbor
    ids, even when the tied candidates land in the same scan partition
    (ADVICE r1: argpartition kept an arbitrary tied subset)."""
    # 40 points all at distance sqrt(2) from the query except id 0
    # (the query itself) -> every neighbor ties; top-5 must be ids 1..5.
    rows = [(0, [0.0, 0.0])] + [
        (i, [1.0, 1.0] if i % 2 else [-1.0, 1.0]) for i in range(1, 40)
    ]
    df = spark.createDataFrame(rows, "id long, features array<double>").repartition(8)
    q = spark.createDataFrame([(0, [0.0, 0.0])], "id long, features array<double>")
    got = (
        knn_join(df, q, 5, strategy=strategy)
        .orderBy("rank")
        .select("neighbor_id")
        .collect()
    )
    assert [r[0] for r in got] == [1, 2, 3, 4, 5]


def test_lsh_strategy_subset_with_exact_distances(spark):
    """strategy='lsh' returns a candidate-pruned approximation: every
    returned pair's distance must equal the exact distance, and recall
    against the exact top-k must clear a floor on this fixture."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    n, d = 400, 32
    X = rng.normal(size=(n, d)).round(3)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)], "id long, features array<double>"
    )
    queries = df.filter(F.col("id") % 20 == 0)
    k = 10
    exact = knn_join(df, queries, k, strategy="sql")
    approx = knn_join(df, queries, k, strategy="lsh")
    ex = {(r["query_id"], r["neighbor_id"]): r["distance"] for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]): r["distance"] for r in approx.collect()}
    # exact distances on whatever pairs LSH surfaced
    full = {
        (r["query_id"], r["neighbor_id"]): r["distance"]
        for r in knn_join(df, queries, n, strategy="sql").collect()
    }
    for pair, dist in ap.items():
        assert abs(dist - full[pair]) < 1e-9
    recall = len(set(ex) & set(ap)) / len(ex)
    assert recall >= 0.7, recall  # deterministic fixture; floor is safe
    # and it actually pruned: the candidate set (pre-rank) must be well
    # below the n_queries x n exhaustive grid
    from spark_relieffc_fselection_spark.operators.knn import _candidates_lsh

    n_cand = _candidates_lsh(df, queries, "id", "features", "query_id").count()
    n_queries = queries.count()
    assert n_cand < 0.5 * n_queries * n, (n_cand, n_queries * n)


def test_lsh_strategy_small_dims_no_ansi_crash(spark):
    """strategy='lsh' must work when dim < n_bits * n_tables: bucket
    coordinates wrap modulo the vector length instead of reading past
    the array end (ANSI element_at throws INVALID_ARRAY_INDEX, ADVICE
    r2). Distances on surfaced pairs stay exact."""
    rng = np.random.default_rng(3)
    n, d = 120, 6  # well below the 32 coordinates 8 tables x 4 bits read
    X = rng.normal(size=(n, d)).round(3)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)], "id long, features array<double>"
    )
    queries = df.filter(F.col("id") % 30 == 0)
    rows = knn_join(df, queries, 5, strategy="lsh").collect()
    assert rows  # produced candidates, no INVALID_ARRAY_INDEX crash
    for r in rows:
        d_exact = np.sqrt(((X[r["query_id"]] - X[r["neighbor_id"]]) ** 2).sum())
        assert abs(r["distance"] - d_exact) < 1e-9


def test_auto_strategy_thresholds():
    """knn_strategy='auto' escalation (VERDICT r6 #3): exact diff-cube
    for small kernels, BLAS expansion for the mid range, LSH pruning
    once exact scans become trillions of FLOPs. The last case is the
    reference's own headline claim (README.md:15-17, 64M x 631 at
    estimationRatio 0.25 -> ~424k-row batches under the broadcast
    guard), unreachable by any exact scan."""
    from spark_relieffc_fselection_spark.operators.knn import (
        resolve_auto_strategy,
    )

    assert resolve_auto_strategy(50, 50, 99) == "numpy"  # KAIS XOR100
    assert resolve_auto_strategy(500, 2000, 64) == "numpy-gemm"
    assert resolve_auto_strategy(424_000, 424_000, 631) == "lsh"
    # degenerate cardinalities never crash the cost model
    assert resolve_auto_strategy(0, 0, 0) == "numpy"


def test_multiprobe_recall_contract_on_continuous_1e6(spark):
    """The escalation tier's CONTINUOUS-data recall contract (VERDICT
    r8 #3), pinned at the regime SCALE.md measures (1e6 x 32 zero-
    centered continuous, auto-sized buckets/tables): Hamming-1
    multiprobe holds the measured ~0.70 band, and the lsh_probe_radius=2
    escalation knob buys the next step (measured 0.96) — recall is
    monotone in the probe radius because candidates only grow."""
    from pyspark.sql import functions as F

    from spark_relieffc_fselection_spark.operators.knn import (
        auto_lsh_tables,
        knn_join,
    )

    n, d, k, nq = 1_000_000, 32, 10, 24
    base = (
        spark.range(n)
        .select(
            "id",
            F.array(*[(F.rand(seed=100 + i) - 0.5) for i in range(d)]).alias(
                "features"
            ),
        )
        .repartition(8)
        .cache()
    )
    base.count()
    q = base.filter(F.col("id") % (n // nq) == 0)

    def topk(df):
        out = {}
        for r in df.select("query_id", "neighbor_id").collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk(knn_join(base, q, k, strategy="numpy-gemm", num_instances=n))

    def recall(radius):
        approx = topk(
            knn_join(
                base, q, k, strategy="lsh", num_instances=n, num_queries=nq,
                lsh_tables=auto_lsh_tables(n, d),
                lsh_multiprobe=True, lsh_probe_radius=radius,
            )
        )
        return sum(
            len(exact[i] & approx.get(i, set())) / len(exact[i]) for i in exact
        ) / len(exact)

    r1, r2 = recall(1), recall(2)
    base.unpersist()
    assert r1 >= 0.60, f"Hamming-1 recall {r1:.3f} fell out of the 0.70 band"
    assert r2 >= r1, f"radius-2 recall {r2:.3f} < radius-1 {r1:.3f} (monotonicity)"
    assert r2 >= 0.85, f"Hamming-2 recall {r2:.3f} below its measured 0.96 band"
