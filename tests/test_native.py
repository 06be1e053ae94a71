"""Tests for the native host-data runtime (C++ via ctypes)."""
import numpy as np
import pytest

from diagan_tpu.native import (
    NativeLoader,
    NativeWeightedSampler,
    native_available,
    normalize_u8,
)


def test_native_builds():
    assert native_available(), "g++ toolchain expected in this image"


def test_weighted_sampler_distribution():
    w = np.array([1.0, 1.0, 8.0])
    s = NativeWeightedSampler(w, seed=0)
    draws = s.sample(50000)
    frac = (draws == 2).mean()
    assert abs(frac - 0.8) < 0.02, frac
    assert set(np.unique(draws)) <= {0, 1, 2}


def test_weighted_sampler_zero_weight_excluded():
    w = np.array([0.0, 1.0, 1.0])
    s = NativeWeightedSampler(w, seed=1)
    draws = s.sample(10000)
    assert (draws != 0).all()


def test_loader_batches_match_source():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (100, 8, 8, 3), np.uint8)
    loader = NativeLoader(imgs, batch_size=16, n_threads=2, seed=3)
    try:
        for _ in range(5):
            batch, idx = loader.next()
            assert batch.shape == (16, 8, 8, 3) and batch.dtype == np.float32
            want = imgs[idx].astype(np.float32) / 127.5 - 1.0
            np.testing.assert_allclose(batch, want, atol=1e-6)
    finally:
        loader.close()


def test_loader_weighted_stream():
    imgs = np.zeros((4, 2, 2, 1), np.uint8)
    w = np.array([0.0, 0.0, 0.0, 1.0])
    loader = NativeLoader(imgs, batch_size=32, weights=w, n_threads=1, seed=4)
    try:
        _, idx = loader.next()
        assert (idx == 3).all()
    finally:
        loader.close()


def test_normalize_matches_numpy():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (7, 5, 5, 3), np.uint8)
    got = normalize_u8(imgs)
    want = imgs.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)
