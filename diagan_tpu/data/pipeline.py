"""Device-resident input pipeline.

TPU-first design decision: the reference streams batches through 8
DataLoader worker processes with pinned host memory and a host->device copy
per batch (reference train_mimicry_phase1.py:18-24). Every dataset family
in this workload except FFHQ-256 fits comfortably in HBM as uint8
(CIFAR-10: 0.15 GB, CelebA-64: 2.4 GB), so the pipeline keeps the whole
dataset on device and a batch is a fused gather + dequantize:

    batch = images[idx].astype(f32) / 127.5 - 1

This removes all host<->device traffic from the hot loop and lets the whole
train loop live inside one jitted scan. Index streams come from
sampler.py; because batches are *gathered by index*, every batch knows its
example indices — the property the reference threads through
`WeightedDataset` 4-tuples (predefined.py:22-24).

For datasets larger than HBM (FFHQ-256) use a host-side stream (see
data/ffhq.py) feeding the same (images, idx) batch contract.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.data.arrays import ArrayDataset
from diagan_tpu.data.sampler import (
    log_weights_from_scores,
    sample_uniform_indices,
    sample_weighted_indices,
)


class DeviceDataSource:
    """Whole-dataset-in-HBM batch source.

    Attributes:
      images: uint8 device array (N, H, W, C) (or float32 (N, D) for the
        25-Gaussians toy set, which skips dequantization).
      log_weights: float32 (N,) or None — when set, batches are drawn from
        the weighted distribution (phase-2 resampling).
    """

    def __init__(self, dataset: ArrayDataset, weights=None, sharding=None, eps=1e-6):
        self.dataset = dataset
        imgs = dataset.images
        self._quantized = imgs.dtype == np.uint8
        self.images = jax.device_put(imgs, sharding)
        self.num_data = len(dataset)
        if weights is not None:
            self.log_weights = log_weights_from_scores(weights, eps=eps)
        else:
            self.log_weights = None

    def sample_indices(self, key, shape):
        if self.log_weights is None:
            return sample_uniform_indices(key, self.num_data, shape)
        return sample_weighted_indices(key, self.log_weights, shape)

    def gather(self, idx):
        """Fused gather + dequantize to [-1, 1] float32. Jit-safe."""
        batch = jnp.take(self.images, idx, axis=0)
        if self._quantized:
            batch = batch.astype(jnp.float32) / 127.5 - 1.0
        return batch

    def batch(self, key, shape):
        """Draw an index tensor and gather it: returns (images, idx)."""
        idx = self.sample_indices(key, shape)
        return self.gather(idx), idx


def epoch_minibatch_indices(rng: np.random.Generator, num_data: int, batch_size: int):
    """Host-side epoch-shuffled minibatch index stream (for eval sweeps that
    must visit every example exactly once, e.g. the logit recorder)."""
    perm = rng.permutation(num_data)
    n_full = num_data // batch_size
    for i in range(n_full):
        yield perm[i * batch_size : (i + 1) * batch_size]
    if num_data % batch_size:
        yield perm[n_full * batch_size :]


def full_sweep_index_batches(num_data: int, batch_size: int) -> np.ndarray:
    """Static-shape index batches covering [0, N) exactly once, padded by
    repeating index 0 with a validity mask. Returns (idx [B, bs], mask [B, bs]).

    Used by the jitted logit sweep: static shapes keep XLA from recompiling
    on the ragged final batch.
    """
    n_batches = -(-num_data // batch_size)
    idx = np.zeros((n_batches, batch_size), np.int32)
    mask = np.zeros((n_batches, batch_size), bool)
    flat = np.arange(num_data, dtype=np.int32)
    for b in range(n_batches):
        chunk = flat[b * batch_size : (b + 1) * batch_size]
        idx[b, : len(chunk)] = chunk
        mask[b, : len(chunk)] = True
    return idx, mask
