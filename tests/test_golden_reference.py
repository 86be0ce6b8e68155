"""Semantic-fidelity validation on the REFERENCE'S OWN datasets.

The reference suite (ReliefSelectorSuite.scala:25-55) asserts exact
selections on test_lung_s3.csv / test_colon_s3.csv, and ships the 29
KAIS synthetic ground-truth corpora (DatasetsKAIS/, Bolon-Canedo et al.
KAIS 34(3)) whose informative features are known by construction.

Exact-golden parity is intentionally NOT asserted (SURVEY §8.3: the
reference's goldens are partition-locked — batch membership comes from
randomSplit over JVM partitions, so no reimplementation can reproduce
them bit-for-bit). What IS asserted:

* lung/colon — high top-10 overlap with the published goldens, and
  agreement on the #1 feature. Random top-10-of-325 (resp. 2000)
  overlap expectation is ~0.3 (resp. ~0.05), so floors of 5 and 6 are
  far outside chance.
* KAIS XOR100 / Corral / Parity3+3 — the constructed informative
  features land in the top-k, verified against the datasets' generative
  definitions (checked programmatically in this repo: XOR100's class is
  f4 XOR f6; Corral's is (f0&f1)|(f2&f3) with f4 irrelevant and f5 75%-
  correlated; Parity3+3's is parity(f0,f1,f2) with f3,f4,f5 exact
  copies and f6..f11 irrelevant).

These fits are deterministic in THIS engine (de-randomized thresholds,
decimal sums, total tie-breaks — SURVEY §8.3), so the KAIS assertions
are exact, not statistical.
"""

from __future__ import annotations

import csv
from pathlib import Path

import pytest

from spark_relieffc_fselection_spark.operators.relief import fit_relief

DATA = Path("/root/reference/src/test/resources/data")
KAIS = DATA / "DatasetsKAIS"

pytestmark = pytest.mark.skipif(
    not DATA.exists(), reason="reference datasets not present"
)

# ReliefSelectorSuite.scala:36 / :52 (stdSelection, rank order)
LUNG_GOLDEN = [29, 223, 10, 19, 172, 55, 183, 23, 35, 56]
COLON_GOLDEN = [1422, 248, 74, 244, 266, 764, 1413, 1771, 1152, 779]


def _load_kais(spark, name: str):
    """KAIS CSV: no header, last column is the class."""
    rows = []
    with open(KAIS / name) as f:
        for i, line in enumerate(csv.reader(f)):
            vals = [float(x) for x in line]
            rows.append((i, vals[:-1], float(vals[-1])))
    return spark.createDataFrame(rows, "id long, features array<double>, label double")


def _load_labeled_csv(spark, name: str, pad: float = 2.0):
    """Reference microarray CSV: header, class first, pad=2 shifts the
    {-2,0,2} ternary levels non-negative (TestHelper.scala:40 'padded')."""
    rows = []
    with open(DATA / name) as f:
        r = csv.reader(f)
        next(r)
        for i, line in enumerate(r):
            rows.append((i, [float(x) + pad for x in line[1:]], float(line[0])))
    return spark.createDataFrame(rows, "id long, features array<double>, label double")


def _fit(df, n_top, k, batch_size=1.0, exclude_self=True, redundancy=False):
    return fit_relief(
        df,
        num_top_features=n_top,
        num_neighbors=k,
        estimation_ratio=1.0,
        batch_size=batch_size,
        discrete_data=True,
        redundancy_removal=redundancy,
        exclude_self=exclude_self,
        seed=123456789,
    )


def test_xor100_finds_the_planted_xor_pair(spark):
    """99 binary features, 50 rows; class = f4 XOR f6. RELIEF's whole
    point is detecting interacting features no marginal test can see —
    the planted pair must be EXACTLY the top-2."""
    res = _fit(_load_kais(spark, "XOR100.csv"), n_top=2, k=5)
    assert res.std_selection == [4, 6]


def test_corral_rejects_the_irrelevant_feature(spark):
    """class = (f0&f1)|(f2&f3); f4 is irrelevant noise, f5 is 75%-
    correlated. The classic RELIEF outcome: the correlated feature may
    rank high (it is genuinely predictive) but the irrelevant one must
    not crack the top-4."""
    res = _fit(_load_kais(spark, "Corral.csv"), n_top=4, k=3)
    assert 4 not in res.std_selection
    assert set(res.std_selection) <= {0, 1, 2, 3, 5}


def test_parity3_3_top6_is_relevant_plus_copies(spark):
    """class = parity(f0,f1,f2); f3,f4,f5 are exact copies of f0,f1,f2;
    f6..f11 irrelevant. Relevance ranking must put all six informative
    columns (originals + copies) above every irrelevant one."""
    res = _fit(_load_kais(spark, "Parity3+3.csv"), n_top=6, k=3)
    assert set(res.std_selection) == {0, 1, 2, 3, 4, 5}


def test_parity3_3_redundancy_removal_picks_one_per_copy_pair(spark):
    """With redundancy removal ON (and >1 batch so joint collision
    stats exist), the greedy selection must take ONE representative of
    each identical pair {0,3},{1,4},{2,5} before any copy — the exact
    behavior the reference's redundancy term exists for
    (ReliefFRSelector.scala:283-325)."""
    res = _fit(
        _load_kais(spark, "Parity3+3.csv"), n_top=6, k=3,
        batch_size=0.5, redundancy=True,
    )
    first3 = res.redundancy_selection[:3]
    assert {f % 3 for f in first3} == {0, 1, 2}, first3  # one per pair
    # and all six informative features still precede every irrelevant one
    assert set(res.redundancy_selection) == {0, 1, 2, 3, 4, 5}


def test_monk3_finds_the_rule_attributes(spark):
    """Monk-3: class = (a5=3 AND a4=1) OR (a5!=4 AND a2!=3), 5% label
    noise by design (rule matches 95% of this file). The top-3 must be
    exactly the rule's attributes {a2, a4, a5} = indices {1, 3, 4}."""
    res = _fit(_load_kais(spark, "Monk3.csv"), n_top=3, k=3)
    assert set(res.std_selection) == {1, 3, 4}


def test_led25_top7_is_the_seven_segments(spark):
    """LED-25 (noiseless): 10-class digit display; the first 7 features
    are the LED segments and fully determine the class (verified
    programmatically on this file), the other 17 are noise. Top-7 must
    be exactly the segments."""
    res = _fit(_load_kais(spark, "Led25n0.csv"), n_top=7, k=3)
    assert set(res.std_selection) == {0, 1, 2, 3, 4, 5, 6}


def test_lung_overlaps_reference_golden(spark):
    """test_lung_s3.csv (73 rows x 325 ternary features): top-10 must
    overlap the reference's published selection well beyond chance
    (~0.3 expected at random) and agree on the #1 feature."""
    res = _fit(
        _load_labeled_csv(spark, "test_lung_s3.csv"),
        n_top=10, k=10, exclude_self=False,
    )
    overlap = len(set(res.std_selection) & set(LUNG_GOLDEN))
    assert overlap >= 5, (overlap, res.std_selection)
    assert res.std_selection[0] == LUNG_GOLDEN[0] == 29


def test_colon_overlaps_reference_golden(spark):
    """test_colon_s3.csv (62 rows x 2000 ternary features): random
    top-10 overlap expectation is ~0.05, observed is 7 — and the top-2
    agree with the golden in order."""
    res = _fit(
        _load_labeled_csv(spark, "test_colon_s3.csv"),
        n_top=10, k=10, exclude_self=False,
    )
    overlap = len(set(res.std_selection) & set(COLON_GOLDEN))
    assert overlap >= 6, (overlap, res.std_selection)
    assert res.std_selection[:2] == COLON_GOLDEN[:2] == [1422, 248]


def test_led100_finds_every_insample_informative_segment(spark):
    """LED-100 (noiseless): the 7-segment display plus 92 extra noise
    features. In THIS 50-row sample (verified programmatically), f5 is
    nearly constant (47 ones / 3 zeros) and not needed to determine the
    class — so the honest ground truth is the six segments that carry
    in-sample signal, {0,1,2,3,4,6}. All six must make the top-7
    despite 14x more distractors than Led25; f5 legitimately may not.

    (Corral-100 is deliberately NOT pinned: at 32 rows x 99 features
    neighbor distances are noise-dominated and RELIEF's own literature
    reports failure there — asserting any particular outcome would pin
    noise, not semantics.)"""
    res = _fit(_load_kais(spark, "Led100n0.csv"), n_top=7, k=3)
    assert {0, 1, 2, 3, 4, 6} <= set(res.std_selection)


def test_led25_degrades_gracefully_under_label_noise(spark):
    """KAIS ships LED-25 at increasing label-noise levels; the study's
    point is that ReliefF degrades GRACEFULLY — segments leak out of
    the top-7 one at a time, they don't collapse. Pin that curve with
    floors (measured on this engine: 7 at n0, 6 at n6, 5 at n10/n20;
    the fits are deterministic so the floors are exact)."""
    floors = {"Led25n0.csv": 7, "Led25n6.csv": 6, "Led25n20.csv": 5}
    hits = {}
    for name, floor in floors.items():
        res = _fit(_load_kais(spark, name), n_top=7, k=3)
        hits[name] = len(set(res.std_selection) & set(range(7)))
        assert hits[name] >= floor, (name, res.std_selection)
    # and the curve is monotone non-increasing in noise
    assert hits["Led25n0.csv"] >= hits["Led25n6.csv"] >= hits["Led25n20.csv"]


def test_sd1_continuous_signal_block_separates_from_noise(spark):
    """SD1 (KAIS): 75 samples x 4020 genes, 3 classes; the first 20
    features are the relevant block (two internally redundant groups
    of 10), the other 4000 are N(0,1) noise. The source study itself
    reports ReliefF does NOT rank the block top-10 at this sample
    size — 4000 noise dims swamp the neighborhood metric — so this is
    a CHARACTERIZATION, not a recovery test: the engine must
    reproduce the method's actual (documented) behavior. What RELIEF
    does deliver here, and what we pin: every relevant feature scores
    above the 85th percentile of the noise relevance distribution,
    and the whole block ranks within the top ~7% of 4020 features.
    Continuous path, standardized input (the engine's contract)."""
    import numpy as np

    rows = []
    with open(KAIS / "SD1.csv") as f:
        for i, line in enumerate(csv.reader(f)):
            vals = [float(x) for x in line]
            rows.append((i, vals[:-1], float(vals[-1])))
    X = np.array([r[1] for r in rows])
    Xs = (X - X.mean(axis=0)) / np.where(X.std(axis=0) == 0, 1.0, X.std(axis=0))
    df = spark.createDataFrame(
        [(r[0], Xs[i].tolist(), r[2]) for i, r in enumerate(rows)],
        "id long, features array<double>, label double",
    )
    res = fit_relief(
        df,
        num_top_features=10,
        num_neighbors=2,
        estimation_ratio=1.0,
        batch_size=1.0,
        discrete_data=False,
        redundancy_removal=False,
        seed=123456789,
    )
    r = res.relevance
    sig, noise = r[:20], r[20:]
    assert sig.min() > np.percentile(noise, 85)
    worst_rank = max(int((r > s).sum()) for s in sig)
    assert worst_rank < 280, worst_rank  # all 20 inside the top ~7%


def test_xor100_auto_resolves_exact_and_matches_numpy(spark):
    """At KAIS scale (50 x 99 = 247k kernel cells) 'auto' must resolve
    to the bit-exact numpy tier, so its selections are IDENTICAL to the
    pinned-strategy fit — auto never changes small-data results."""
    df = _load_kais(spark, "XOR100.csv")
    pinned = _fit(df, n_top=2, k=5)
    auto = fit_relief(
        df, num_top_features=2, num_neighbors=5, estimation_ratio=1.0,
        batch_size=1.0, discrete_data=True, redundancy_removal=False,
        knn_strategy="auto", seed=123456789,
    )
    assert auto.std_selection == pinned.std_selection == [4, 6]


def test_xor100_survives_the_approximate_knn_tier(spark):
    """Recall property for auto's LSH escalation tier (VERDICT r6 #3):
    forcing the approximate strategy on the KAIS fixtures must not lose
    the planted signal — the XOR pair stays EXACTLY the top-2. (On
    binary features every coordinate-sign bit is deterministic, so LSH
    buckets partition by literal feature values; the planted pair's
    neighborhoods survive the pruning.)"""
    res = fit_relief(
        _load_kais(spark, "XOR100.csv"),
        num_top_features=2, num_neighbors=5, estimation_ratio=1.0,
        batch_size=1.0, discrete_data=True, redundancy_removal=False,
        knn_strategy="lsh", seed=123456789,
    )
    assert res.std_selection == [4, 6]


def test_corral_survives_the_approximate_knn_tier(spark):
    """Same property on Corral: under LSH candidates the irrelevant
    feature still must not crack the top-4."""
    res = fit_relief(
        _load_kais(spark, "Corral.csv"),
        num_top_features=4, num_neighbors=3, estimation_ratio=1.0,
        batch_size=1.0, discrete_data=True, redundancy_removal=False,
        knn_strategy="lsh", seed=123456789,
    )
    assert 4 not in res.std_selection
    assert set(res.std_selection) <= {0, 1, 2, 3, 5}
