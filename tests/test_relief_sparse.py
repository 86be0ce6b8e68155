import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.knn import knn_join
from spark_relieffc_fselection_spark.operators.relief import (
    pair_feature_table,
    relevance_weights,
)
from spark_relieffc_fselection_spark.operators.relief_sparse import (
    fit_relief_sparse,
    sparse_knn_join,
    sparse_pair_feature_table,
    to_long_form,
)


@pytest.fixture(scope="module")
def sparse_fixture(spark):
    """Gaussian data with ~70% exact zeros (no accidental nonzero==0,
    so dense and sparse paths must agree bit-for-bit on relevance)."""
    rng = np.random.default_rng(21)
    n, d = 60, 10
    X = rng.normal(loc=3.0, size=(n, d))  # offset: no zeros among actives
    mask = rng.random((n, d)) < 0.7
    X[mask] = 0.0
    y = (X[:, 0] > 0).astype(float)
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, features array<double>, label double")
    return df, X, y


def test_sparse_knn_matches_dense(spark, sparse_fixture):
    df, X, y = sparse_fixture
    long_df, labels = to_long_form(df)
    k = 5
    dense = knn_join(df, df, k, strategy="sql").orderBy("query_id", "rank").collect()
    sparse = (
        sparse_knn_join(long_df, labels, labels.select("id"), k)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(r["query_id"], r["neighbor_id"]) for r in dense] == [
        (r["query_id"], r["neighbor_id"]) for r in sparse
    ]
    for a, b in zip(dense, sparse):
        assert abs(a["distance"] - b["distance"]) < 1e-9


def test_sparse_pair_table_matches_dense_relevance(spark, sparse_fixture):
    df, X, y = sparse_fixture
    long_df, labels = to_long_form(df)
    k = 6
    priors = {float(l): float((y == l).mean()) for l in np.unique(y)}

    dense_lp = pair_feature_table(df, knn_join(df, df, k, strategy="sql"))
    dense_w = {
        r["feature_idx"]: r["relevance"]
        for r in relevance_weights(dense_lp, priors).collect()
    }
    from spark_relieffc_fselection_spark.operators.relief_sparse import _pair_bin_counts

    sparse_neigh = sparse_knn_join(long_df, labels, labels.select("id"), k)
    sparse_lp = sparse_pair_feature_table(long_df, labels, sparse_neigh)
    sparse_w = {
        r["feature_idx"]: r["relevance"]
        for r in relevance_weights(
            sparse_lp, priors, pair_counts=_pair_bin_counts(sparse_neigh, labels)
        ).collect()
    }
    # sparse path omits zero-zero feature slots, which contribute 0 to
    # bin sums; the collapse divisor is the per-bin PAIR count (the
    # reference's classCounter), so dense and sparse agree exactly.
    for f in dense_w:
        assert abs(dense_w[f] - sparse_w.get(f, 0.0)) < 1e-9, f


def test_sparse_pair_table_union_matches_full_outer(spark, sparse_fixture):
    """r12 rewrite pin: sparse_pair_feature_table's tagged-union +
    max() aggregate must reproduce the former full_outer-join
    formulation ROW FOR ROW (same pair set, same fdist bits, same
    label columns) — the rewrite's whole claim is plan shape, not
    semantics."""
    df, X, y = sparse_fixture
    long_df, labels = to_long_form(df)
    neigh = sparse_knn_join(long_df, labels, labels.select("id"), 4).cache()
    neigh.count()

    new_rows = sparse_pair_feature_table(long_df, labels, neigh).collect()

    # the pre-r12 formulation, inline: full_outer q-side/n-side merge,
    # labels via the pairs frame referenced three times
    pairs = (
        neigh.select("query_id", "neighbor_id")
        .join(labels.select(F.col("id").alias("query_id"), F.col("label").alias("q_label")), "query_id")
        .join(labels.select(F.col("id").alias("neighbor_id"), F.col("label").alias("n_label")), "neighbor_id")
        .withColumn("same_class", F.col("n_label") == F.col("q_label"))
    )
    q_side = pairs.join(
        long_df.select(F.col("id").alias("query_id"), "feature_idx", F.col("value").alias("q_val")),
        "query_id",
    ).select("query_id", "neighbor_id", "feature_idx", "q_val")
    n_side = pairs.join(
        long_df.select(F.col("id").alias("neighbor_id"), "feature_idx", F.col("value").alias("n_val")),
        "neighbor_id",
    ).select("query_id", "neighbor_id", "feature_idx", "n_val")
    merged = q_side.join(
        n_side, ["query_id", "neighbor_id", "feature_idx"], "full_outer"
    ).select(
        "query_id",
        "neighbor_id",
        "feature_idx",
        F.abs(
            F.coalesce(F.col("q_val"), F.lit(0.0))
            - F.coalesce(F.col("n_val"), F.lit(0.0))
        ).alias("fdist"),
    )
    old_rows = merged.join(
        pairs.select("query_id", "neighbor_id", "n_label", "same_class"),
        ["query_id", "neighbor_id"],
    ).collect()

    key = lambda r: (r["query_id"], r["neighbor_id"], r["feature_idx"])
    new_map = {key(r): r for r in new_rows}
    old_map = {key(r): r for r in old_rows}
    assert set(new_map) == set(old_map)
    for k, old in old_map.items():
        new = new_map[k]
        assert new["fdist"] == old["fdist"], k  # bit-exact, not approx
        assert new["n_label"] == old["n_label"] and new["same_class"] == old["same_class"], k
    neigh.unpersist()


def test_fit_relief_sparse_end_to_end(spark, sparse_fixture):
    df, X, y = sparse_fixture
    long_df, labels = to_long_form(df)
    res = fit_relief_sparse(
        long_df, labels, n_features=X.shape[1],
        num_top_features=3, num_neighbors=4,
        redundancy_removal=True,
    )
    assert len(res.std_selection) == 3
    assert 0 in res.std_selection  # informative feature found
    assert res.n_instances == len(X)


def test_sparse_knn_probe_matches_grid(spark):
    """The bottom-M probe plan and the grid plan must produce identical
    neighbor sets — exercised on genuinely sparse data (2 nnz out of
    50 features per row), where the probe is the intended plan."""
    import numpy as np

    from spark_relieffc_fselection_spark.operators.relief_sparse import (
        sparse_knn_join,
    )

    rng = np.random.default_rng(11)
    rows = []
    for i in range(120):
        f1, f2 = rng.choice(50, size=2, replace=False)
        rows.append((i, int(f1), round(float(rng.normal()), 3)))
        rows.append((i, int(f2), round(float(rng.normal()), 3)))
    # a few all-zero instances: no long rows, norm 0
    long_df = spark.createDataFrame(rows, "id long, feature_idx int, value double")
    labels = spark.createDataFrame(
        [(i, float(i % 3)) for i in range(125)], "id long, label double"
    )
    queries = labels.select("id").filter("id % 5 = 0")
    cols = ["query_id", "neighbor_id", "rank"]
    a = (
        sparse_knn_join(long_df, labels, queries, 7, probe=True)
        .select(*cols).orderBy(*cols).collect()
    )
    b = (
        sparse_knn_join(long_df, labels, queries, 7, probe=False)
        .select(*cols).orderBy(*cols).collect()
    )
    assert a == b
    assert len(a) > 0


def test_compress_long_matches_dense_slice(spark):
    """Long-form transform == dense vector slice on the same data."""
    from spark_relieffc_fselection_spark.operators.relief_sparse import (
        compress_long,
        to_long_form,
    )

    rows = [(i, [float(i), 0.0, float(i * 2), 3.0, 0.0], 0.0) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, features array<double>, label double")
    long_df, _ = to_long_form(df)
    got = compress_long(long_df, [2, 0]).collect()
    # kept features renumber ascending: 0 -> 0, 2 -> 1; zero slots absent
    expect = set()
    for i in range(6):
        if i != 0:
            expect.add((i, 0, float(i)))       # orig f0
            expect.add((i, 1, float(i * 2)))   # orig f2
    assert {(r["id"], r["feature_idx"], r["value"]) for r in got} == expect


def test_sparse_fit_wide_feature_space(spark):
    """The reference claims 'millions of features' (README.md:11, kddb
    ~30M); the engine's sparse path must be indifferent to NOMINAL
    width — cost rides the nonzero count only. 200k-wide rows with
    ~40 actives each: the fit completes through the inverted-index
    kNN + long-form aggregation, and the planted high-contrast
    features (one mid-space, one at the last index) rank top-2 in the
    std selection. num_neighbors is set so k = 160 exceeds the
    same-class population (150): the reference's GLOBAL top-k
    neighborhood (not per-class, SURVEY §7.3) then necessarily
    contains misses, giving the planted features strictly positive
    relevance — with an all-hit neighborhood their relevance is
    exactly 0, indistinguishable from never-active features (which is
    faithful dense-RELIEF behavior, not a sparse-path artifact).
    No dense vector is ever materialized."""
    rng = np.random.default_rng(7)
    n, d = 300, 200_000
    sig_a, sig_b = 123_456, d - 1
    rows = []
    for i in range(n):
        label = float(i % 2)
        active = {int(f): float(v) for f, v in zip(
            rng.choice(d - 2, size=40, replace=False),
            rng.normal(loc=3.0, scale=0.3, size=40),
        )}
        # planted signal: strongly label-separated values, always active
        active[sig_a] = 6.0 if label else 1.0
        active[sig_b] = 6.0 if label else 1.0
        for f, v in active.items():
            rows.append((i, f, v))
    long_df = spark.createDataFrame(
        rows, "id long, feature_idx int, value double"
    )
    labels = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(n)], "id long, label double"
    )
    res = fit_relief_sparse(
        long_df, labels, n_features=d,
        num_top_features=5, num_neighbors=80, redundancy_removal=True,
    )
    assert len(res.relevance) == d
    assert res.relevance[sig_a] > 0 and res.relevance[sig_b] > 0
    assert set(res.std_selection[:2]) == {sig_a, sig_b}
    # the greedy anti-redundancy pass must still surface both planted
    # features (they collide with everything, but nothing beats them)
    assert sig_a in res.redundancy_selection


def test_sparse_batched_fit_matches_dense_hash_batched(spark):
    """batch_size<1.0 wires the sparse path into the reference's batch
    loop (topFeatures feedback, union-reduce, jointTotal discount —
    ReliefFRSelector.scala:273-283, 641). On ZERO-FREE data the long
    form is lossless, sparse kNN ranks identically to dense (proven by
    test_sparse_knn_matches_dense) and every aggregate is decimal-
    exact, so the batched sparse fit must reproduce the batched dense
    fit bit-for-bit: same selections, same weights, same batch count."""
    from spark_relieffc_fselection_spark.operators.relief import fit_relief

    rng = np.random.default_rng(8)
    n, d = 48, 8
    X = rng.normal(loc=3.0, size=(n, d))  # no zeros: long form is total
    y = (X[:, 2] > 3.0).astype(float)
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, features array<double>, label double")
    long_df, labels = to_long_form(df)

    dense = fit_relief(
        df, num_top_features=3, num_neighbors=3,
        estimation_ratio=1.0, batch_size=0.5, batching="hash",
        redundancy_removal=True, knn_strategy="numpy", seed=7,
    )
    sparse = fit_relief_sparse(
        long_df, labels, n_features=d,
        num_top_features=3, num_neighbors=3,
        redundancy_removal=True, batch_size=0.5,
    )
    assert sparse.n_batches == dense.n_batches == 2
    assert sparse.std_selection == dense.std_selection
    assert sparse.redundancy_selection == dense.redundancy_selection
    assert np.allclose(sparse.relevance, dense.relevance, atol=1e-9)
    assert sparse.priors == dense.priors


def test_sparse_batched_fit_on_sparse_data(spark, sparse_fixture):
    """Batched fit on genuinely sparse input: the loop must stay
    sparse-semantics (absent zero-zero slots) end-to-end and still
    recover the informative feature; single-pass remains the default
    and is untouched by the new parameter."""
    df, X, y = sparse_fixture
    long_df, labels = to_long_form(df)
    res = fit_relief_sparse(
        long_df, labels, n_features=X.shape[1],
        num_top_features=3, num_neighbors=4,
        redundancy_removal=True, batch_size=0.5,
    )
    assert res.n_batches == 2
    assert len(res.std_selection) == 3
    assert len(res.redundancy_selection) == 3
    assert 0 in res.std_selection  # informative feature survives batching
    single = fit_relief_sparse(
        long_df, labels, n_features=X.shape[1],
        num_top_features=3, num_neighbors=4,
        redundancy_removal=True,
    )
    assert single.n_batches == 1


def test_sparse_sampled_batched_fit_matches_dense(spark):
    """estimation_ratio threading (ADVICE r8): a sparse fit whose long
    table was hash-sampled upstream at ratio r must discount jointTotal
    by (1 - r * batchPerc) like the reference (ReliefFRSelector.scala:
    642) — on zero-free data the result is then bit-for-bit the dense
    sampled+batched hash fit (the q72d-gated mode).

    The dense fit computes priors PRE-sampling while the sparse caller
    hands in post-sampling labels, so the fixture assigns labels such
    that the md5 draw preserves the exact 50/50 class balance — priors
    coincide by construction and the only ratio-sensitive quantity
    left is the jointTotal discount under test."""
    import hashlib

    from spark_relieffc_fselection_spark.operators.relief import fit_relief
    from spark_relieffc_fselection_spark.operators.sampling import hash_uniform

    ratio = 0.5

    def draw(i: int) -> float:  # hash_uniform's documented law
        return (int(hashlib.md5(str(i).encode()).hexdigest()[3:9], 16) + 0.5) / 16777216.0

    ids = list(range(400))
    sampled_ids = [i for i in ids if draw(i) < ratio]
    unsampled_ids = [i for i in ids if draw(i) >= ratio]
    # 24 ids per (sampled?, class) cell -> pre == post priors == 0.5
    chosen = sampled_ids[:48] + unsampled_ids[:48]
    label = {}
    for pool in (sampled_ids[:48], unsampled_ids[:48]):
        for j, i in enumerate(pool):
            label[i] = float(j % 2)

    rng = np.random.default_rng(13)
    d = 8
    rows = [
        (i, (rng.normal(loc=3.0, size=d) + label[i]).round(3).tolist(), label[i])
        for i in chosen
    ]
    df = spark.createDataFrame(rows, "id long, features array<double>, label double")

    dense = fit_relief(
        df, num_top_features=3, num_neighbors=3,
        estimation_ratio=ratio, sampling="hash",
        batch_size=0.5, batching="hash",
        redundancy_removal=True, knn_strategy="numpy", seed=7,
    )
    sampled = df.filter(hash_uniform(F.col("id")) < ratio)
    long_df, labels = to_long_form(sampled)
    sparse = fit_relief_sparse(
        long_df, labels, n_features=d,
        num_top_features=3, num_neighbors=3,
        redundancy_removal=True, batch_size=0.5,
        estimation_ratio=ratio,
    )
    assert dense.priors == sparse.priors == {0.0: 0.5, 1.0: 0.5}
    assert sparse.n_batches == dense.n_batches == 2
    assert sparse.std_selection == dense.std_selection
    assert sparse.redundancy_selection == dense.redundancy_selection
    assert np.allclose(sparse.relevance, dense.relevance, atol=1e-9)


def test_coo_ranking_and_greedy_match_dense():
    """The COO finalize (VERDICT r8 #7) is semantics-identical to the
    dense ndarray path: normalization (absent features carry raw 0.0),
    std ranking, and the greedy per-feature-counter selection all agree
    on randomized fixtures spanning empty/partial/full activity."""
    from spark_relieffc_fselection_spark.operators.relief import (
        greedy_select,
        greedy_select_coo,
        normalize_relevance_coo,
        std_ranking,
        std_ranking_coo,
    )

    rng = np.random.default_rng(17)
    for _ in range(40):
        n = int(rng.integers(4, 40))
        n_active = int(rng.integers(0, n + 1))
        active = rng.choice(n, size=n_active, replace=False)
        raw = {int(f): float(rng.normal()) for f in active}
        dense_raw = np.zeros(n)
        for f, v in raw.items():
            dense_raw[f] = v
        mn, mx = dense_raw.min(), dense_raw.max()
        dense = (dense_raw - mn) / (mx - mn) if mx > mn else np.zeros(n)
        coo, default = normalize_relevance_coo(raw, n)
        for i in range(n):
            assert abs(dense[i] - coo.get(i, default)) < 1e-12
        k = int(rng.integers(1, n + 1))
        assert std_ranking(dense, k) == std_ranking_coo(coo, default, n, k)
        red = {}
        for _ in range(int(rng.integers(0, 30))):
            f1, f2 = int(rng.integers(0, n)), int(rng.integers(0, n))
            if f1 != f2:
                red[(f1, f2)] = float(rng.random())
        assert greedy_select(dense, red, k) == greedy_select_coo(
            coo, default, n, red, k
        )


def test_sparse_fit_coo_mode_matches_dense_mode(spark, monkeypatch):
    """Past the width threshold the sparse fit's driver state goes COO;
    forcing the threshold to 4 on a small batched fit must reproduce
    the dense-mode result (selections exactly; relevance values to
    cross-run tolerance).

    Tolerance note: the two fits are SEPARATE Spark runs, and partial-
    aggregation merge order varies with task completion order, so their
    float sums can differ at the last few ulps (~1e-13 after min-max
    normalization) — that is run-to-run noise, not a COO/dense
    divergence (bit-exact COO==dense parity on IDENTICAL inputs is
    pinned by test_coo_ranking_and_greedy_match_dense). Selections stay
    exact: this fixture's smallest relevance gap is ~1.1e-2 and its kNN
    boundaries are tie-free (verified with numpy), so ulp noise cannot
    flip them."""
    from spark_relieffc_fselection_spark.operators import relief_sparse as rs
    from spark_relieffc_fselection_spark.operators.relief import SparseRelevance

    rng = np.random.default_rng(23)
    n, d = 40, 8
    X = rng.normal(loc=2.0, size=(n, d)).round(3)
    y = (X[:, 1] > 2.0).astype(float)
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, features array<double>, label double")
    long_df, labels = to_long_form(df)
    kwargs = dict(
        n_features=d, num_top_features=3, num_neighbors=3,
        redundancy_removal=True, batch_size=0.5,
    )
    dense_res = fit_relief_sparse(long_df, labels, **kwargs)
    monkeypatch.setattr(rs, "DENSE_RELEVANCE_MAX_FEATURES", 4)
    coo_res = fit_relief_sparse(long_df, labels, **kwargs)
    assert isinstance(coo_res.relevance, SparseRelevance)
    assert not isinstance(dense_res.relevance, SparseRelevance)
    # rich diagnostics, kept for forensics: the round-9 full-suite
    # flakes here were ROOT-CAUSED to JVM heap OOM in the shared test
    # session (Py4JJavaError: java.lang.OutOfMemoryError during
    # collects, reproducible under concurrent host load; the suite ran
    # in the 1g default heap until conftest sized it) — not a value
    # divergence. The pipeline itself is decimal-accumulated and
    # bit-deterministic; if this ever fails as an ASSERT, the message
    # must say WHERE (values vs selections vs COO)
    diag = (
        f"dense rel={[dense_res.relevance[i] for i in range(d)]} "
        f"coo rel={[coo_res.relevance[i] for i in range(d)]} "
        f"dense red_coo={sorted(dense_res.redundancy_coo.items())} "
        f"coo red_coo={sorted(coo_res.redundancy_coo.items())}"
    )
    assert coo_res.std_selection == dense_res.std_selection, diag
    assert coo_res.redundancy_selection == dense_res.redundancy_selection, diag
    for i in range(d):
        assert abs(coo_res.relevance[i] - dense_res.relevance[i]) < 1e-9, diag


def test_sparse_fit_kddb_width_driver_stays_coo(spark):
    """A declared width of 1M features (the kddb direction) must not
    allocate O(n_features) driver arrays: the result's relevance is the
    COO view, bounded by ACTIVE features."""
    from spark_relieffc_fselection_spark.operators.relief import SparseRelevance

    rng = np.random.default_rng(29)
    n, nnz, D = 120, 5, 1_000_000
    rows = []
    for i in range(n):
        feats = sorted(int(f) for f in rng.choice(D, size=nnz, replace=False))
        vals = rng.normal(loc=1.0, size=nnz).round(3)
        rows.append((i, [(f, float(v)) for f, v in zip(feats, vals)], float(i % 2)))
    long_rows = [(i, f, v) for i, fv, _ in rows for f, v in fv]
    long_df = spark.createDataFrame(
        long_rows, "id long, feature_idx int, value double"
    )
    labels = spark.createDataFrame(
        [(i, lbl) for i, _, lbl in rows], "id long, label double"
    )
    res = fit_relief_sparse(
        long_df, labels, n_features=D,
        num_top_features=5, num_neighbors=2,
        redundancy_removal=True, batch_size=0.5,
    )
    assert isinstance(res.relevance, SparseRelevance)
    assert len(res.relevance) == D
    assert len(res.relevance.data) <= n * nnz  # bounded by active features
    assert len(res.std_selection) == 5
    assert len(res.redundancy_selection) == 5


def test_sparse_route_resolution_is_recorded(spark):
    """VERDICT r9 #5: the fit records WHICH no-overlap route the
    sparse kNN actually took — 'sparse-inverted/probe' when the
    adaptive bottom-M probe covers, 'sparse-inverted/grid' under the
    dense-regime fallback or a caller override — mirroring the dense
    tier's resolved_knn_strategy audit trail (both routes are exact;
    this is a cost audit, not an exactness one)."""
    import numpy as np

    from spark_relieffc_fselection_spark.operators.relief_sparse import (
        sparse_knn_join,
    )

    # genuinely sparse: 2 of 50 features per row -> the probe covers
    rng = np.random.default_rng(7)
    rows = []
    for i in range(120):
        f1, f2 = rng.choice(50, size=2, replace=False)
        rows.append((i, int(f1), round(float(rng.normal()), 3)))
        rows.append((i, int(f2), round(float(rng.normal()), 3)))
    sparse_long = spark.createDataFrame(
        rows, "id long, feature_idx int, value double"
    )
    sparse_labels = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(120)], "id long, label double"
    )
    res = fit_relief_sparse(
        sparse_long, sparse_labels, n_features=50, num_top_features=3,
        num_neighbors=2, redundancy_removal=False,
    )
    assert res.resolved_knn_strategy == "sparse-inverted/probe"

    # the q161 regime: every instance shares feature 0, so no-overlap
    # coverage is impossible and the adaptive loop must fall back;
    # a knn_probe=False override goes straight there
    # corpus must exceed the adaptive cap 8*(k+1), or the probe
    # legally degenerates to full-corpus coverage and records 'probe'
    shared = [(i, 0, 1.0 + (i % 7) / 10.0) for i in range(100)] + [
        (i, 1 + i % 5, 0.5) for i in range(100)
    ]
    shared_long = spark.createDataFrame(
        shared, "id long, feature_idx int, value double"
    )
    shared_labels = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(100)], "id long, label double"
    )
    for override in (None, False):
        res = fit_relief_sparse(
            shared_long, shared_labels, n_features=6, num_top_features=3,
            num_neighbors=2, redundancy_removal=False, knn_probe=override,
        )
        assert res.resolved_knn_strategy == "sparse-inverted/grid", override
    # forcing the probe escalates to full-corpus coverage -> 'probe'
    res = fit_relief_sparse(
        shared_long, shared_labels, n_features=6, num_top_features=3,
        num_neighbors=2, redundancy_removal=False, knn_probe=True,
    )
    assert res.resolved_knn_strategy == "sparse-inverted/probe"
    # the batched loop records batch 0's resolution the same way
    res = fit_relief_sparse(
        sparse_long, sparse_labels, n_features=50, num_top_features=3,
        num_neighbors=2, redundancy_removal=False, batch_size=0.5,
    )
    assert res.resolved_knn_strategy == "sparse-inverted/probe"
