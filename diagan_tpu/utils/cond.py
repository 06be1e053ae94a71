"""Otsu-threshold index split.

Parity with reference diagan-pkg/diagan/utils/cond.py:4-12
(`get_index_group`: threshold scores into low/high groups by maximizing
between-class variance).
"""
from __future__ import annotations

import numpy as np


def otsu_threshold(scores, bins=256):
    hist, edges = np.histogram(np.asarray(scores, np.float64), bins=bins)
    p = hist.astype(np.float64) / max(hist.sum(), 1)
    centers = (edges[:-1] + edges[1:]) / 2
    w0 = np.cumsum(p)
    w1 = 1 - w0
    mu = np.cumsum(p * centers)
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        var_between = (mu_t * w0 - mu) ** 2 / (w0 * w1)
    var_between[~np.isfinite(var_between)] = -1
    return centers[int(np.argmax(var_between))]


def get_index_group(scores):
    """Returns (low_index, high_index) split at the Otsu threshold."""
    scores = np.asarray(scores)
    t = otsu_threshold(scores)
    return np.where(scores <= t)[0], np.where(scores > t)[0]
