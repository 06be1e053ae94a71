"""FID / Inception Score / KID / precision-recall.

Parity targets:
  - FID: reference diagan-pkg/diagan/trainer/{fid_score,fid_utils}.py —
    real stats cached as .npz (mu/sigma; the same framework-neutral format
    as the shipped precalculated_statistics files), generated images
    min-max normalized to uint8 before featurization
    (fid_score.py:77-101), Frechet distance via scipy sqrtm with an
    eps-jitter retry (fid_utils.py:11-67), NaN/Inf feature rows dropped
    (fid_utils.py:86-88).
  - IS: mimicry convention — softmax KL, 10 splits.
  - KID: polynomial-kernel MMD (degree 3, gamma=1/d, coef 1), block
    estimator.
  - PR: reference compute_pr.py:65-125 — kNN manifold test with SQUARED
    euclidean distances, k=3, radius = (k+1)-th smallest including self;
    plus compute_partial_recall for attribute slices.
"""
from __future__ import annotations

import warnings
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


# ---- FID -----------------------------------------------------------------

def normalize_images(images):
    """Min-max normalize float images to uint8 per the reference
    (_normalize_images, fid_score.py:77-101)."""
    images = np.asarray(images, np.float32)
    axis = tuple(range(1, images.ndim))
    mn = images.min(axis=axis, keepdims=True)
    mx = images.max(axis=axis, keepdims=True)
    return (255 * (images - mn) / (mx - mn + 1e-9)).astype(np.uint8)


def activation_statistics(features):
    """(mu, sigma) with NaN/Inf rows dropped (fid_utils.py:86-88)."""
    feats = np.asarray(features, np.float64)
    keep = np.isfinite(feats).all(axis=1)
    feats = feats[keep]
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """scipy-sqrtm Frechet distance with the reference's jitter fallback
    (fid_utils.py:11-67)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    with warnings.catch_warnings():
        # singular products raise LinAlgWarning under scipy>=1.17; the
        # isfinite check below already handles that case via eps-jitter.
        # Only that category — other warnings (overflow etc.) stay visible.
        warnings.simplefilter("ignore", linalg.LinAlgWarning)
        covmean = linalg.sqrtm(sigma1.dot(sigma2))  # non-finite if singular
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def load_stats(path):
    with np.load(path) as f:
        return f["mu"], f["sigma"]


def save_stats(path, mu, sigma):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, mu=mu, sigma=sigma)


def fid_from_features(real_features=None, fake_features=None, stats_file=None):
    if stats_file is not None:
        mu1, s1 = load_stats(stats_file)
    else:
        mu1, s1 = activation_statistics(real_features)
    mu2, s2 = activation_statistics(fake_features)
    return frechet_distance(mu1, s1, mu2, s2)


# ---- Inception Score -----------------------------------------------------

def inception_score_from_logits(logits, splits=10):
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    n = len(probs)
    scores = []
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        kl = part * (np.log(part + 1e-12) - np.log(part.mean(0, keepdims=True) + 1e-12))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


# ---- KID -----------------------------------------------------------------

def kid_from_features(real_features, fake_features, num_subsets=10,
                      subset_size=1000, seed=0):
    """Block polynomial-kernel MMD^2 estimate (mean, std over subsets)."""
    rng = np.random.default_rng(seed)
    real = np.asarray(real_features, np.float64)
    fake = np.asarray(fake_features, np.float64)
    d = real.shape[1]
    m = min(subset_size, len(real), len(fake))
    scores = []
    for _ in range(num_subsets):
        x = real[rng.choice(len(real), m, replace=False)]
        y = fake[rng.choice(len(fake), m, replace=False)]
        kxx = (x @ x.T / d + 1) ** 3
        kyy = (y @ y.T / d + 1) ** 3
        kxy = (x @ y.T / d + 1) ** 3
        mmd = (
            (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
            + (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
            - 2 * kxy.mean()
        )
        scores.append(mmd)
    return float(np.mean(scores)), float(np.std(scores))


# ---- precision / recall --------------------------------------------------

def _pairwise_sq_dists(x, y):
    """Squared euclidean distances, jnp (matches the reference's
    norm_x - 2xy + norm_y form, compute_pr.py:11-31)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    nx = jnp.sum(x * x, axis=1)[:, None]
    ny = jnp.sum(y * y, axis=1)[None, :]
    return nx - 2 * x @ y.T + ny


def _knn_radii(features, nearest_k):
    d = _pairwise_sq_dists(features, features)
    # (k+1) smallest including the self-distance 0 (compute_pr.py:34-62)
    smallest = jax.lax.top_k(-d, nearest_k + 1)[0]
    return -smallest[:, -1]


def compute_pr(real_features, fake_features, nearest_k=3):
    real_r = _knn_radii(real_features, nearest_k)
    fake_r = _knn_radii(fake_features, nearest_k)
    d = _pairwise_sq_dists(real_features, fake_features)
    precision = float(jnp.mean(jnp.any(d < real_r[:, None], axis=0)))
    recall = float(jnp.mean(jnp.any(d < fake_r[None, :], axis=1)))
    return {"precision": precision, "recall": recall}


def compute_partial_recall(partial_real_features, fake_features, nearest_k=3):
    fake_r = _knn_radii(fake_features, nearest_k)
    d = _pairwise_sq_dists(partial_real_features, fake_features)
    return {"recall": float(jnp.mean(jnp.any(d < fake_r[None, :], axis=1)))}
