"""Single-node numpy RELIEF-F oracle mirroring the engine's semantics.

Independent implementation used only to verify the distributed
DataFrame dataflow on small fixtures (SURVEY §5 test strategy item 1).
Semantics match spark_relieffc_fselection_spark.operators.relief:
within-batch kNN, self excluded, ties by id, class-bin collapse with
priors, deterministic collision threshold, symmetric joint updates.
"""

from __future__ import annotations

import numpy as np


def knn_oracle(X: np.ndarray, k: int, exclude_self: bool = True) -> list[list[int]]:
    """Indices of the k nearest rows for each row, ties by index."""
    n = len(X)
    out = []
    for i in range(n):
        d = np.sqrt(((X - X[i]) ** 2).sum(axis=1))
        order = np.lexsort((np.arange(n), d))
        ids = [j for j in order if not (exclude_self and j == i)][:k]
        out.append(ids)
    return out


def relief_relevance_oracle(
    X: np.ndarray,
    y: np.ndarray,
    num_neighbors: int = 10,
) -> np.ndarray:
    n, n_feat = X.shape
    labels, counts = np.unique(y, return_counts=True)
    priors = {l: c / n for l, c in zip(labels, counts)}
    k = num_neighbors * len(labels)
    neigh = knn_oracle(X, k)

    # bin sums / counts keyed by (n_label, same_class)
    bin_sum: dict[tuple[float, bool], np.ndarray] = {}
    bin_cnt: dict[tuple[float, bool], int] = {}
    for qi in range(n):
        for ni in neigh[qi]:
            key = (float(y[ni]), bool(y[ni] == y[qi]))
            if key not in bin_sum:
                bin_sum[key] = np.zeros(n_feat)
                bin_cnt[key] = 0
            bin_sum[key] += np.abs(X[qi] - X[ni])
            bin_cnt[key] += 1

    w = np.zeros(n_feat)
    for (lbl, same), s in bin_sum.items():
        sign = -1.0 if same else 1.0
        w += sign * priors[lbl] * s / bin_cnt[(lbl, same)]
    return w


def collision_stats_oracle(
    X: np.ndarray,
    y: np.ndarray,
    num_neighbors: int,
    lower_distance_threshold: float,
    top_features: set[int] | None,
    continuous: bool = True,
):
    """(marginal, joint dict, total_pairs) matching the engine."""
    n, n_feat = X.shape
    k = num_neighbors * len(np.unique(y))
    neigh = knn_oracle(X, k)
    thr = 6.0 * (1.0 - lower_distance_threshold) if continuous else 0.0
    marginal = np.zeros(n_feat)
    joint: dict[tuple[int, int], float] = {}
    total = 0
    for qi in range(n):
        for ni in neigh[qi]:
            total += 1
            fd = np.abs(X[qi] - X[ni])
            colliding = np.nonzero(fd <= thr)[0]
            votes = (1.0 - np.minimum(6.0, fd) / 6.0) if continuous else np.ones(n_feat)
            for f in colliding:
                marginal[f] += votes[f]
            for f1 in colliding:
                if top_features is not None and f1 not in top_features:
                    continue
                for f2 in colliding:
                    if f1 == f2:
                        continue
                    jv = (votes[f1] + votes[f2]) / 2.0 if continuous else votes[f1]
                    joint[(f1, f2)] = joint.get((f1, f2), 0.0) + jv
                    joint[(f2, f1)] = joint.get((f2, f1), 0.0) + jv
    return marginal, joint, total
