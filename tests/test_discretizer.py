import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_relieffc_fselection_spark.ml.discretizer import (
    apply_bin_edges,
    fit_quantile_edges,
    quantile_discretize,
)


@pytest.fixture(scope="module")
def cont(spark):
    rng = np.random.default_rng(5)
    rows = [
        (i, [float(rng.normal()), float(rng.uniform(0, 100)), 7.0],
         float(i % 2))
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "id long, features array<double>, label double"
    ).cache()


def test_edges_are_sorted_interior_cuts(cont):
    edges = fit_quantile_edges(cont, num_bins=4, method="exact")
    assert len(edges) == 3
    for row in edges[:2]:
        assert len(row) == 3
        assert row == sorted(row)
    # constant feature: all cut points equal -> deduped to one edge;
    # bin(x) uses strict >, so every value still lands in bin 0
    assert edges[2] == [7.0]


def test_equi_depth_bins_roughly_uniform(cont):
    binned, edges = quantile_discretize(cont, num_bins=4, method="exact")
    counts = (
        binned.select(F.posexplode("features").alias("f", "b"))
        .filter("f < 2")
        .groupBy("f", "b")
        .count()
        .collect()
    )
    by_feat: dict[int, dict[float, int]] = {}
    for r in counts:
        by_feat.setdefault(r["f"], {})[r["b"]] = r["count"]
    for f, bins in by_feat.items():
        assert set(bins) == {0.0, 1.0, 2.0, 3.0}
        for c in bins.values():
            assert 90 <= c <= 110  # 400/4 with interpolation slack

    const_bins = (
        binned.select(F.element_at("features", 3).alias("b"))
        .distinct()
        .collect()
    )
    assert [r["b"] for r in const_bins] == [0.0]


def test_approx_close_to_exact(cont):
    ex = fit_quantile_edges(cont, num_bins=4, method="exact")
    ap = fit_quantile_edges(cont, num_bins=4, method="approx")
    for row_e, row_a in zip(ex[:2], ap[:2]):
        assert len(row_a) == len(row_e)
        for e, a in zip(row_e, row_a):
            assert abs(e - a) < 0.2


def test_apply_is_pure_catalyst(cont):
    edges = [[0.0], [50.0], []]
    plan = apply_bin_edges(cont, edges)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # per-row map, zero shuffle
    row = (
        apply_bin_edges(cont, edges)
        .filter("id = 0")
        .select("features")
        .first()["features"]
    )
    assert all(b in (0.0, 1.0) for b in row[:2]) and row[2] == 0.0


def test_end_to_end_selector_on_raw_continuous(cont):
    """VERDICT r3 #6 done-criterion: raw continuous data -> quantile
    helper -> discreteData=True selector, end to end."""
    from spark_relieffc_fselection_spark.ml.estimator import ReliefFSelector

    binned, _ = quantile_discretize(cont, num_bins=5, method="exact")
    model = (
        ReliefFSelector()
        .setParams(
            numTopFeatures=2, numNeighbors=3, estimationRatio=1.0,
            batchSize=1.0, discreteData=True,
        )
        .fit(binned)
    )
    sel = model.selected_indices()
    assert len(sel) == 2
    assert set(sel) <= {0, 1, 2}
    out = model.transform(binned).first()
    assert len(out["selectedFeatures"]) == 2
