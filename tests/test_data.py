"""Tests for the index-aware on-device input pipeline."""
import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.data import DeviceDataSource, get_predefined_dataset
from diagan_tpu.data.pipeline import full_sweep_index_batches
from diagan_tpu.data.sampler import (
    log_weights_from_scores,
    sample_weighted_indices,
)


def test_color_mnist_build(tmp_path):
    ds = get_predefined_dataset(
        "color_mnist", tmp_path, major_ratio=0.9, num_data=200, seed=0
    )
    assert ds.images.shape == (200, 32, 32, 3)
    assert ds.images.dtype == np.uint8
    # bias labels: ~10% minority (green)
    assert ds.labels.sum() == 20
    # majority examples are red-only, minority green-only
    red = ds.images[ds.labels == 0]
    assert red[..., 1].max() == 0 and red[..., 2].max() == 0
    green = ds.images[ds.labels == 1]
    assert green[..., 0].max() == 0 and green[..., 2].max() == 0


def test_color_mnist_cache_roundtrip(tmp_path):
    a = get_predefined_dataset(
        "color_mnist", tmp_path, major_ratio=0.9, num_data=100, seed=0
    )
    b = get_predefined_dataset(
        "color_mnist", tmp_path, major_ratio=0.9, num_data=100, seed=123
    )  # different seed must not matter: loaded from cache
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.labels, b.labels)


def test_mnist_fmnist_build(tmp_path):
    ds = get_predefined_dataset(
        "mnist_fmnist", tmp_path, major_ratio=0.8, num_data=100, seed=0
    )
    assert ds.images.shape == (100, 32, 32, 1)
    assert ds.labels.sum() == 20


def test_25gaussian():
    ds = get_predefined_dataset("25gaussian", root=None, n_samples=1000)
    assert ds.images.shape == (1000, 2)
    # grid extent after /2.828 scaling
    assert abs(float(np.abs(ds.images).max()) - 4 / 2.828) < 0.1


def test_device_source_batch_dequantize(tmp_path):
    ds = get_predefined_dataset(
        "color_mnist", tmp_path, major_ratio=0.9, num_data=64, seed=0
    )
    src = DeviceDataSource(ds)
    imgs, idx = src.batch(jax.random.key(0), (8,))
    assert imgs.shape == (8, 32, 32, 3) and imgs.dtype == jnp.float32
    assert float(imgs.min()) >= -1.0 and float(imgs.max()) <= 1.0
    # gathered batch matches the dataset rows at idx
    want = ds.images[np.asarray(idx)].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(np.asarray(imgs), want, rtol=1e-6)


def test_weighted_sampling_distribution():
    # weights [1, 1, 8]: index 2 should appear ~80% of the time
    lw = log_weights_from_scores(np.array([1.0, 1.0, 8.0]))
    idx = sample_weighted_indices(jax.random.key(1), lw, (20000,))
    frac = float(jnp.mean((idx == 2).astype(jnp.float32)))
    assert abs(frac - 0.8) < 0.02


def test_weighted_sampling_eps_floor():
    # zero weights must be floored, not excluded entirely
    lw = log_weights_from_scores(np.array([0.0, 1.0]), eps=1e-6)
    assert np.isfinite(np.asarray(lw)).all()


def test_full_sweep_index_batches():
    idx, mask = full_sweep_index_batches(10, 4)
    assert idx.shape == (3, 4)
    visited = idx[mask]
    np.testing.assert_array_equal(np.sort(visited), np.arange(10))
    assert mask.sum() == 10
