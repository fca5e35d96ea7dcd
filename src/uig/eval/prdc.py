"""Precision / Recall / Density / Coverage over feature embeddings.

The fidelity-vs-diversity decomposition that complements the scalar FID/KID
(SURVEY.md §2 "Eval / FID" row; no reference code exists —
/root/reference/README.md:1): improved precision/recall (Kynkäänniemi et
al. 2019, k-NN manifold estimate) and density/coverage (Naeem et al. 2020,
the outlier-robust variants). Pure host-side numpy over the same feature
streams FID/KID use; the O(N²) distance matrix is trivial at this
framework's ≤500-image eval splits.

Definitions (k-NN radius r_k(x) = distance to the k-th nearest OTHER point
in x's own set):
  precision = fraction of fakes inside ANY real point's r_k ball
  recall    = fraction of reals inside ANY fake point's r_k ball
  density   = mean over fakes of (#real balls containing it) / k
              (unbounded above; robust to real-set outliers)
  coverage  = fraction of reals whose OWN r_k ball contains >=1 fake
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np


def _pairwise_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Euclidean distances, (len(a), len(b)), float64, numerically safe."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d2 = (np.sum(a * a, 1)[:, None] + np.sum(b * b, 1)[None, :]
          - 2.0 * (a @ b.T))
    return np.sqrt(np.clip(d2, 0.0, None))


def _knn_radii(x: np.ndarray, k: int) -> np.ndarray:
    """Distance from each point to its k-th nearest neighbor (self excluded)."""
    d = _pairwise_dist(x, x)
    np.fill_diagonal(d, np.inf)
    # k-th smallest (1-indexed) along each row.
    return np.partition(d, k - 1, axis=1)[:, k - 1]


def prdc_from_features(real: np.ndarray, fake: np.ndarray,
                       k: int = 5) -> dict[str, float]:
    """Returns {"precision", "recall", "density", "coverage"} floats."""
    real = np.asarray(real, np.float64)
    fake = np.asarray(fake, np.float64)
    for name, f in (("real", real), ("fake", fake)):
        if f.shape[0] <= k:
            raise ValueError(
                f"PRDC needs more than k={k} {name} samples, got {f.shape[0]}"
                " — lower k or add samples")
    r_radii = _knn_radii(real, k)
    f_radii = _knn_radii(fake, k)
    d_rf = _pairwise_dist(real, fake)  # (n_real, n_fake)

    inside_real_balls = d_rf <= r_radii[:, None]  # real i's ball holds fake j
    inside_fake_balls = d_rf <= f_radii[None, :]  # fake j's ball holds real i

    precision = float(inside_real_balls.any(axis=0).mean())
    recall = float(inside_fake_balls.any(axis=1).mean())
    density = float(inside_real_balls.sum(axis=0).mean() / k)
    coverage = float((d_rf.min(axis=1) <= r_radii).mean())
    return {"precision": precision, "recall": recall,
            "density": density, "coverage": coverage}


def compute_prdc(real_batches: Iterable, fake_batches: Iterable,
                 feature_fn: Callable, k: int = 5,
                 feature_dim: int | None = None) -> dict[str, float]:
    """PRDC between two image streams (same interface as compute_kid);
    multi-host shards are gathered before the k-NN estimate."""
    from uig.eval.fid import collect_features

    real, fake = collect_features(real_batches, fake_batches,
                                  feature_fn, feature_dim)
    return prdc_from_features(real, fake, k=k)
