"""Unconstrained-generation metrics: FID, KID, precision/recall, diversity.

Capability parity with the reference unconstrained evaluation
(reference: eval/unconstrained/evaluate.py + metrics/{kid,precision_recall}):
all metrics operate on classifier feature activations.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from regennet_tpu.eval.metrics import (
    calculate_activation_statistics,
    calculate_fid,
)


def polynomial_mmd(feat1: np.ndarray, feat2: np.ndarray, degree=3, gamma=None,
                   coef0=1.0) -> float:
    """Unbiased polynomial-kernel MMD^2 (the KID statistic)."""
    X, Y = np.asarray(feat1, np.float64), np.asarray(feat2, np.float64)
    if gamma is None:
        gamma = 1.0 / X.shape[1]

    def k(a, b):
        return (gamma * a @ b.T + coef0) ** degree

    m, n = len(X), len(Y)
    Kxx, Kyy, Kxy = k(X, X), k(Y, Y), k(X, Y)
    np.fill_diagonal(Kxx, 0)
    np.fill_diagonal(Kyy, 0)
    return float(
        Kxx.sum() / (m * (m - 1)) + Kyy.sum() / (n * (n - 1))
        - 2 * Kxy.mean()
    )


def calculate_kid(feat_gt: np.ndarray, feat_gen: np.ndarray, n_subsets=100,
                  subset_size=None, seed=0) -> Tuple[float, float]:
    """KID mean ± std over random subsets."""
    rng = np.random.default_rng(seed)
    subset_size = subset_size or min(1000, len(feat_gt), len(feat_gen))
    vals = []
    for _ in range(n_subsets):
        i = rng.choice(len(feat_gt), subset_size, replace=False)
        j = rng.choice(len(feat_gen), subset_size, replace=False)
        vals.append(polynomial_mmd(feat_gt[i], feat_gen[j]))
    return float(np.mean(vals)), float(np.std(vals))


def precision_recall(feat_gt: np.ndarray, feat_gen: np.ndarray, k=3
                     ) -> Tuple[float, float]:
    """Improved precision/recall (Kynkäänniemi et al.): manifold membership
    via k-NN radii."""

    def pairwise(a, b):
        return np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)

    def knn_radius(feats):
        d = pairwise(feats, feats)
        np.fill_diagonal(d, np.inf)
        return np.sort(d, axis=1)[:, k - 1]

    r_gt = knn_radius(feat_gt)
    r_gen = knn_radius(feat_gen)
    # precision: generated samples inside the GT manifold
    d_gen_gt = pairwise(feat_gen, feat_gt)
    precision = float(np.mean((d_gen_gt <= r_gt[None, :]).any(axis=1)))
    # recall: GT samples inside the generated manifold
    d_gt_gen = pairwise(feat_gt, feat_gen)
    recall = float(np.mean((d_gt_gen <= r_gen[None, :]).any(axis=1)))
    return precision, recall


def evaluate_unconstrained_metrics(feat_gt: np.ndarray, feat_gen: np.ndarray,
                                   seed=0) -> Dict[str, float]:
    stats_gt = calculate_activation_statistics(feat_gt)
    stats_gen = calculate_activation_statistics(feat_gen)
    kid_mean, kid_std = calculate_kid(feat_gt, feat_gen, seed=seed)
    precision, recall = precision_recall(feat_gt, feat_gen)
    rng = np.random.default_rng(seed)
    first = rng.integers(0, len(feat_gen), 200)
    second = rng.integers(0, len(feat_gen), 200)
    diversity = float(
        np.mean(np.linalg.norm(feat_gen[first] - feat_gen[second], axis=1))
    )
    return {
        "fid_unconstrained": calculate_fid(stats_gt, stats_gen),
        "kid_unconstrained": kid_mean,
        "kid_std_unconstrained": kid_std,
        "precision_unconstrained": precision,
        "recall_unconstrained": recall,
        "diversity_unconstrained": diversity,
    }
