"""Property tests per SURVEY §5: KAIS-style synthetics with known
ground truth, plus the engine's partition-invariance contract (the
reference's results change with parallelism — TestHelper.scala:118;
ours must not)."""

import numpy as np
import pytest

from spark_relieffc_fselection_spark.operators.relief import fit_relief


def _df(spark, X, y):
    rows = [(i, X[i].tolist(), float(y[i])) for i in range(len(X))]
    return spark.createDataFrame(rows, "id long, features array<double>, label double")


@pytest.fixture(scope="module")
def xor_data(spark):
    """XOR100-style: label = f0 XOR f1, 30 noise features (KAIS XOR
    family, FIXTURES.md F3)."""
    rng = np.random.default_rng(1234)
    n, d = 80, 32
    X = rng.integers(0, 2, size=(n, d)).astype(float)
    y = np.logical_xor(X[:, 0] > 0, X[:, 1] > 0).astype(float)
    return _df(spark, X, y), X, y


def test_xor_informative_features_rank_top(spark, xor_data):
    df, X, y = xor_data
    res = fit_relief(
        df, num_top_features=5, num_neighbors=5,
        estimation_ratio=1.0, batch_size=1.0,
        redundancy_removal=False, discrete_data=True, seed=9,
    )
    # RELIEF's signature property: XOR parents (invisible to myopic
    # filters) land in the top ranks.
    assert {0, 1} <= set(res.std_selection)


def test_redundant_copy_demoted(spark):
    """Parity3+3-style redundancy: exact copies of a relevant feature
    must be demoted under redundancyRemoval (FIXTURES.md F3)."""
    rng = np.random.default_rng(5)
    n = 100
    f0 = rng.integers(0, 2, n).astype(float)
    f1 = f0.copy()                      # exact redundant copy
    f2 = rng.integers(0, 2, n).astype(float)  # independent informative
    noise = rng.integers(0, 2, size=(n, 3)).astype(float)
    y = np.logical_xor(f0 > 0, f2 > 0).astype(float)
    X = np.column_stack([f0, f1, f2, noise])
    df = _df(spark, X, y)
    res = fit_relief(
        df, num_top_features=3, num_neighbors=5,
        estimation_ratio=1.0, batch_size=0.5,
        redundancy_removal=True, discrete_data=True, seed=3,
    )
    sel = res.redundancy_selection
    # informative pair {0 or 1} and 2 selected before the duplicate of
    # the already-selected parity feature
    first_two = set(sel[:2])
    assert 2 in first_two
    assert not ({0, 1} <= first_two), f"both duplicates selected early: {sel}"


def test_partition_invariance(spark):
    """Same seed, different partitioning => identical relevance vector
    (decimal accumulation makes sums order-free)."""
    rng = np.random.default_rng(77)
    X = rng.normal(size=(60, 6)).round(3)
    y = (X[:, 0] > 0).astype(float)
    df = _df(spark, X, y)
    results = []
    for parts in (1, 7):
        res = fit_relief(
            df.repartition(parts), num_top_features=3, num_neighbors=4,
            estimation_ratio=1.0, batch_size=1.0,
            redundancy_removal=False, seed=11,
        )
        results.append(res)
    np.testing.assert_array_equal(results[0].relevance, results[1].relevance)
    assert results[0].std_selection == results[1].std_selection
