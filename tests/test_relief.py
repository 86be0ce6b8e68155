import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.operators.knn import knn_join
from spark_relieffc_fselection_spark.operators.relief import (
    collision_table,
    fit_relief,
    greedy_select,
    joint_counts,
    marginal_counts,
    pair_feature_table,
    relevance_weights,
    std_ranking,
)
from tests.oracle_relief import (
    collision_stats_oracle,
    relief_relevance_oracle,
)


@pytest.fixture(scope="module")
def labeled(spark):
    rng = np.random.default_rng(11)
    n, d = 80, 6
    X = rng.normal(size=(n, d)).round(3)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)  # features 0,1 informative
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, features array<double>, label double")
    return df, X, y


def _long_pairs(df, k):
    neigh = knn_join(df, df, k)
    return pair_feature_table(df, neigh)


def test_relevance_matches_numpy_oracle(spark, labeled):
    df, X, y = labeled
    num_neighbors = 4
    n_classes = len(np.unique(y))
    lp = _long_pairs(df, num_neighbors * n_classes)
    priors = {float(l): (y == l).mean() for l in np.unique(y)}
    got = relevance_weights(lp, priors).orderBy("feature_idx").collect()
    expected = relief_relevance_oracle(X, y, num_neighbors)
    assert len(got) == X.shape[1]
    for r in got:
        assert abs(r["relevance"] - expected[r["feature_idx"]]) < 1e-9


def test_informative_features_rank_top(spark, labeled):
    df, X, y = labeled
    res = fit_relief(
        df,
        num_top_features=2,
        num_neighbors=5,
        estimation_ratio=1.0,
        batch_size=1.0,
        redundancy_removal=False,
        seed=42,
    )
    assert set(res.std_selection) == {0, 1}


def test_collision_stats_match_oracle(spark, labeled):
    df, X, y = labeled
    num_neighbors, ldt = 3, 0.8
    n_classes = len(np.unique(y))
    lp = _long_pairs(df, num_neighbors * n_classes)
    coll = collision_table(lp, continuous=True, lower_distance_threshold=ldt)
    top = {0, 1, 2}
    marg = {r["feature_idx"]: r["marginal"] for r in marginal_counts(coll).collect()}
    joint = {
        (r["f1"], r["f2"]): r["joint"]
        for r in joint_counts(coll, sorted(top), continuous=True).collect()
    }
    exp_marg, exp_joint, _ = collision_stats_oracle(X, y, num_neighbors, ldt, top)
    for f, v in marg.items():
        assert abs(v - exp_marg[f]) < 1e-9
    assert set(joint) == set(exp_joint)
    for k_, v in joint.items():
        assert abs(v - exp_joint[k_]) < 1e-9


def test_greedy_select_demotes_redundant_copy(spark):
    """A duplicated informative feature must be demoted under
    redundancy removal (SURVEY §5 property-test item 2)."""
    relevance = np.array([1.0, 0.98, 0.5, 0.2])
    # features 0 and 1 are near-duplicates: huge mutual redundancy
    coo = {(0, 1): 1.0, (1, 0): 1.0, (0, 2): 0.01, (2, 0): 0.01}
    sel = greedy_select(relevance, coo, 3)
    assert sel[0] == 0
    assert sel[1] == 2  # not the redundant copy (1)
    assert 1 not in sel[:2]


def test_std_ranking_tiebreak():
    r = np.array([0.5, 0.9, 0.9, 0.1])
    assert std_ranking(r, 3) == [1, 2, 0]


def test_fit_relief_batched_runs(spark, labeled):
    df, X, y = labeled
    res = fit_relief(
        df,
        num_top_features=3,
        num_neighbors=3,
        estimation_ratio=1.0,
        batch_size=0.5,  # 2 batches -> joint stats flow
        redundancy_removal=True,
        seed=7,
    )
    assert len(res.std_selection) == 3
    assert len(res.redundancy_selection) == 3
    assert res.n_features == X.shape[1]
    assert 0 in res.std_selection  # informative feature survives batching


def test_feature_bin_stats_matches_separate_aggregations(spark, labeled):
    """The fused one-pass stats must be bit-identical to the separate
    relevance_weights / marginal_counts / collision-count plans."""
    from spark_relieffc_fselection_spark.operators.relief import (
        feature_bin_stats,
        relevance_from_bins,
    )

    df, X, y = labeled
    lp = _long_pairs(df, 6)
    priors = {float(l): (y == l).mean() for l in np.unique(y)}
    pair_counts = (
        lp.select("query_id", "neighbor_id", "n_label", "same_class")
        .distinct()
        .groupBy("n_label", "same_class")
        .agg(F.count("*").alias("bin_cnt"))
    )
    bins = feature_bin_stats(lp, continuous=True, lower_distance_threshold=0.8)

    w_fused = {
        r["feature_idx"]: r["relevance"]
        for r in relevance_from_bins(bins, priors, pair_counts).collect()
    }
    w_sep = {
        r["feature_idx"]: r["relevance"]
        for r in relevance_weights(lp, priors, pair_counts).collect()
    }
    assert w_fused == w_sep

    coll = collision_table(lp, continuous=True, lower_distance_threshold=0.8)
    m_fused = {
        r["feature_idx"]: r["m"]
        for r in bins.groupBy("feature_idx")
        .agg(F.sum("vote_sum").cast("double").alias("m"))
        .collect()
    }
    m_sep = {r["feature_idx"]: r["marginal"] for r in marginal_counts(coll).collect()}
    assert m_fused == m_sep

    c_fused = {
        r["feature_idx"]: r["n"]
        for r in bins.groupBy("feature_idx")
        .agg(F.sum("n_collisions").alias("n"))
        .collect()
    }
    c_sep = {
        r["feature_idx"]: r["n"]
        for r in coll.groupBy("feature_idx").agg(F.count("*").alias("n")).collect()
    }
    assert c_fused == c_sep


def test_joint_from_pairs_identical_to_generic_path(spark, labeled):
    """joint_counts_from_pairs must be EXACTLY equal (not approximately)
    to joint_counts over collision_table(explode_pairs(...)): same IEEE
    expressions, same decimal aggregation tail, so the faster plan is a
    pure physical substitution. Checked continuous and discrete, with
    and without a top-feature scope."""
    from spark_relieffc_fselection_spark.operators.relief import (
        joint_counts_from_pairs,
    )

    df, X, y = labeled
    k = 3 * len(np.unique(y))
    neigh = knn_join(df, df, k)
    from spark_relieffc_fselection_spark.operators.relief import pair_table

    pairs = pair_table(df, neigh).cache()
    from spark_relieffc_fselection_spark.operators.relief import explode_pairs

    lp = explode_pairs(pairs)
    for continuous, ldt in ((True, 0.8), (True, 0.95), (False, 0.8)):
        for top in (None, [0, 2, 4]):
            coll = collision_table(
                lp, continuous=continuous, lower_distance_threshold=ldt
            )
            generic = {
                (r["f1"], r["f2"]): r["joint"]
                for r in joint_counts(
                    coll, top, continuous=continuous, num_features=X.shape[1]
                ).collect()
            }
            fast = {
                (r["f1"], r["f2"]): r["joint"]
                for r in joint_counts_from_pairs(
                    pairs, top, continuous=continuous,
                    lower_distance_threshold=ldt, num_features=X.shape[1],
                ).collect()
            }
            assert generic == fast, (continuous, ldt, top)
    # and the wide-feature (self-join) physical fallback agrees too
    coll = collision_table(lp, continuous=True, lower_distance_threshold=0.8)
    generic = {
        (r["f1"], r["f2"]): r["joint"]
        for r in joint_counts(coll, [0, 1], continuous=True, num_features=10**6).collect()
    }
    fast = {
        (r["f1"], r["f2"]): r["joint"]
        for r in joint_counts_from_pairs(
            pairs, [0, 1], continuous=True,
            lower_distance_threshold=0.8, num_features=10**6,
        ).collect()
    }
    assert generic == fast
    pairs.unpersist()


def test_fit_relief_empty_input_raises_clearly(spark):
    """An empty dataset must fail with an explicit ValueError, not a
    numpy zero-size-reduction traceback (the reference NPEs on its
    head() sniff, ReliefFRSelector.scala:210)."""
    empty = spark.createDataFrame([], "id long, features array<double>, label double")
    with pytest.raises(ValueError, match="non-empty"):
        fit_relief(empty, num_top_features=3, num_neighbors=2)


def test_fit_relief_lsh_strategy_overlaps_exact(spark):
    """VERDICT r3 #8: the LSH kNN tier driven through the FULL fit —
    its top-k must overlap heavily with the exact numpy kernel's (the
    tier trades exact neighbors for bounded candidate sets; with
    informative features the ranking must survive that)."""
    rng = np.random.default_rng(23)
    n, d = 300, 8
    X = rng.normal(size=(n, d)).round(3)
    y = (X[:, 0] + 0.7 * X[:, 1] - 0.5 * X[:, 2] > 0).astype(float)
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, features array<double>, label double")

    def top(strategy):
        return fit_relief(
            df,
            num_top_features=4,
            num_neighbors=5,
            estimation_ratio=0.5,
            batch_size=1.0,
            redundancy_removal=False,
            seed=5,
            knn_strategy=strategy,
        ).std_selection

    exact = top("numpy")
    lsh = top("lsh")
    assert len(lsh) == 4
    overlap = len(set(exact) & set(lsh))
    assert overlap >= 3, (exact, lsh)
    # the informative trio dominates under both kernels
    assert set(exact[:2]) <= {0, 1, 2}
    assert set(lsh[:2]) <= {0, 1, 2}


def test_fit_relief_hash_batching_mode(spark):
    """batching='hash' splits the sample deterministically (id % n):
    two runs agree exactly, and an unknown mode raises."""
    import numpy as np
    import pytest

    from spark_relieffc_fselection_spark.operators.relief import fit_relief
    from spark_relieffc_fselection_spark.queries.relief_q import _embeddings

    from tests.conftest import SF_DIR

    inst = _embeddings(spark, SF_DIR)
    kwargs = dict(
        num_top_features=5, num_neighbors=3, estimation_ratio=1.0,
        batch_size=0.5, redundancy_removal=True, seed=42,
        knn_strategy="numpy", batching="hash",
    )
    a = fit_relief(inst, **kwargs)
    b = fit_relief(inst, **kwargs)
    assert a.std_selection == b.std_selection
    assert a.redundancy_selection == b.redundancy_selection
    assert np.array_equal(a.relevance, b.relevance)
    with pytest.raises(ValueError, match="batching"):
        fit_relief(inst, batching="nope")


def test_auto_escalation_to_lsh_is_surfaced(spark, labeled, monkeypatch):
    """knn_strategy='auto' resolving to the approximate LSH tier must
    be RECORDED on the result and WARNED about (VERDICT r8 #2): the
    escalation changes answers (recall ~0.70 on continuous data), so a
    100 TB fit may never cross the exactness boundary silently."""
    import warnings

    from spark_relieffc_fselection_spark.operators import knn as knn_mod

    df, _, _ = labeled
    kwargs = dict(
        num_top_features=2, num_neighbors=3, estimation_ratio=1.0,
        batch_size=1.0, redundancy_removal=False, seed=42,
        knn_strategy="auto",
    )
    # tiny data resolves to the exact tier: NO warning, field says so
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        res = fit_relief(df, **kwargs)
    assert res.resolved_knn_strategy == "numpy"

    # collapse the escalation boundaries: 'auto' now lands on 'lsh'
    monkeypatch.setattr(knn_mod, "_AUTO_GEMM_CELLS", 0)
    monkeypatch.setattr(knn_mod, "_AUTO_LSH_CELLS", 0)
    with pytest.warns(UserWarning, match="escalated to the APPROXIMATE 'lsh'"):
        res = fit_relief(df, **kwargs)
    assert res.resolved_knn_strategy == "lsh"


def test_pinned_strategy_is_echoed_back(spark, labeled):
    """A pinned (non-auto) strategy reports itself verbatim — the audit
    field is total, not escalation-only."""
    df, _, _ = labeled
    res = fit_relief(
        df, num_top_features=2, num_neighbors=3, estimation_ratio=1.0,
        batch_size=1.0, redundancy_removal=False, seed=42, knn_strategy="sql",
    )
    assert res.resolved_knn_strategy == "sql"


def test_fit_lsh_probe_radius_escalation(spark, labeled):
    """lsh_probe_radius reaches the fit's approximate tier: radius 2
    still recovers the planted signal on the labeled fixture, and the
    resolved strategy records the approximate tier."""
    df, _, _ = labeled
    res = fit_relief(
        df, num_top_features=2, num_neighbors=5, estimation_ratio=1.0,
        batch_size=1.0, redundancy_removal=False, seed=42,
        knn_strategy="lsh", lsh_probe_radius=2,
    )
    assert set(res.std_selection) == {0, 1}
    assert res.resolved_knn_strategy == "lsh"


def test_fit_lsh_tables_override(spark, labeled):
    """lsh_tables is the second escalation knob (tables re-hash the
    scan side): an override reaches the fit's approximate tier and
    full coverage still recovers the planted signal."""
    df, _, _ = labeled
    res = fit_relief(
        df, num_top_features=2, num_neighbors=5, estimation_ratio=1.0,
        batch_size=1.0, redundancy_removal=False, seed=42,
        knn_strategy="lsh", lsh_tables=2, lsh_probe_radius=2,
    )
    assert len(res.std_selection) == 2  # runs end-to-end at 2 tables
    res_full = fit_relief(
        df, num_top_features=2, num_neighbors=5, estimation_ratio=1.0,
        batch_size=1.0, redundancy_removal=False, seed=42,
        knn_strategy="lsh", lsh_tables=8, lsh_probe_radius=2,
    )
    assert set(res_full.std_selection) == {0, 1}


def test_decimal_cast_replay_parity_probe(spark):
    """CI-resident form of the r12 1M-sample decimal-cast probe
    (VERDICT r12 #8): Decimal(repr(x)).quantize(1E-18, HALF_UP) must
    reproduce Spark's CAST(double AS DECIMAL(38,18)) bit-for-bit on
    THIS platform — the assumption _collapse_bins_local's driver
    replay of sum(cast(contrib as decimal)) rests on. Fixed-seed
    contrib-shaped magnitudes, one Spark job."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    rng = random.Random(20260817)
    xs = []
    for _ in range(50_000):
        # contrib magnitudes span ~1e-12..1e6, both signs, plus exact
        # binary fractions and ties near the 1e-18 quantize boundary
        mag = 10.0 ** rng.uniform(-12, 6)
        xs.append(rng.choice([-1.0, 1.0]) * rng.random() * mag)
    xs.extend([0.0, 1.0, -1.0, 2.0**-60, -(2.0**-60), 1e-19, -1e-19])
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    rows = df.select(
        "x", F.col("x").cast("decimal(38,18)").alias("d")
    ).collect()
    q18 = Decimal("1E-18")
    mismatches = [
        (r["x"], r["d"], Decimal(repr(r["x"])).quantize(q18, ROUND_HALF_UP))
        for r in rows
        if r["d"] != Decimal(repr(r["x"])).quantize(q18, ROUND_HALF_UP)
    ]
    assert not mismatches, mismatches[:5]
