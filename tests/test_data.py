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


def test_synthetic_celeba_attrs_learnable_and_deterministic():
    from diagan_tpu.data.sources import synthetic_celeba_attrs
    from diagan_tpu.data.synthetic import synthetic_natural

    images, _ = synthetic_natural(400, 64, seed=3)
    a1 = synthetic_celeba_attrs(images, seed=3)
    a2 = synthetic_celeba_attrs(images, seed=3)
    np.testing.assert_array_equal(a1, a2)
    assert a1.shape == (400, 40) and set(np.unique(a1)) <= {-1, 1}
    # balanced attrs ~50% positive; rare ones (e.g. Bald, col 4) ~10%
    pos = (a1 == 1).mean(axis=0)
    assert 0.4 < pos[0] < 0.6
    assert 0.05 < pos[4] < 0.2
    # attrs are a function of image statistics: a linear probe on the same
    # stats family must beat chance by a wide margin
    x = images.astype(np.float32) / 255.0
    feats = np.stack(
        [x.mean(axis=(1, 2, 3)), x[..., 0].mean(axis=(1, 2)),
         x[..., 1].mean(axis=(1, 2)), x[..., 2].mean(axis=(1, 2)),
         x.std(axis=(1, 2, 3))], axis=1)
    y = (a1[:, 0] == 1).astype(np.float32)
    A = np.concatenate([feats, np.ones((len(y), 1))], axis=1)
    w, *_ = np.linalg.lstsq(A, y, rcond=None)
    acc = (((A @ w) > 0.5) == (y > 0.5)).mean()
    assert acc > 0.7


def test_index_loaders():
    """By-index metric loaders (reference image_loader_with_index.py):
    array gather, sequence gather, and the directory variants' synthetic
    fallback + the reference's >=1000-index imagenet guard."""
    import pytest as _pytest

    from diagan_tpu.data.index_loader import (
        get_celeba_images_with_index,
        get_imagenet_images_with_index,
        get_index_images,
        get_lsun_bedroom_images_with_index,
    )

    arr = np.arange(5 * 4 * 4 * 3, dtype=np.uint8).reshape(5, 4, 4, 3)
    got = get_index_images(arr, [3, 1])
    np.testing.assert_array_equal(got, arr[[3, 1]])

    seq = [(arr[i], 0, 1.0, i) for i in range(5)]  # WeightedDataset tuples
    got = get_index_images(seq, [2, 0])
    np.testing.assert_array_equal(got, arr[[2, 0]])

    with _pytest.raises(ValueError):
        get_imagenet_images_with_index(np.arange(10), root="/nonexistent")
    idx = np.arange(1000)
    imgs = get_imagenet_images_with_index(idx, root="/nonexistent", size=8)
    assert imgs.shape == (1000, 8, 8, 3) and imgs.dtype == np.uint8

    imgs = get_lsun_bedroom_images_with_index([4, 2], root="/nonexistent",
                                              size=8)
    assert imgs.shape == (2, 8, 8, 3)
    imgs = get_celeba_images_with_index([0, 1, 2], root="/nonexistent",
                                        size=8)
    assert imgs.shape == (3, 8, 8, 3)
