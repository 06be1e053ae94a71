"""On-device index samplers.

Replaces `torch.utils.data.WeightedRandomSampler` (reference
train_mimicry_phase2.py:21-34) with jitted `jax.random` draws: weighted
sampling-with-replacement is `jax.random.categorical` over log-weights,
which runs on device and composes with sharding — fixing the reference bug
where `DistributedSampler` silently *dropped* the score weights under DDP
(reference stylegan2/train_ffhq_phase2.py:35-45). Under a device mesh each
(host, step) pair folds its coordinates into the key, so streams are
disjoint by construction.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sample_uniform_indices(key, num_data: int, shape) -> jnp.ndarray:
    """Uniform i.i.d. index draw (the phase-1 shuffle-equivalent stream)."""
    return jax.random.randint(key, shape, 0, num_data, dtype=jnp.int32)


def sample_weighted_indices(key, log_weights: jnp.ndarray, shape) -> jnp.ndarray:
    """Weighted sampling with replacement via Gumbel-argmax (categorical).

    log_weights: float[N], log of (unnormalized) per-example weights.
    """
    flat = math.prod(shape)
    idx = jax.random.categorical(key, log_weights[None, :], axis=-1, shape=(flat,))
    return idx.reshape(shape).astype(jnp.int32)


def log_weights_from_scores(weights, eps=1e-6) -> jnp.ndarray:
    """Convert resampling weights to the log-space form the sampler wants,
    flooring at eps (reference train_mimicry_phase2.py:21-23)."""
    w = jnp.asarray(weights, dtype=jnp.float32)
    w = jnp.where(w < eps, eps, w)
    return jnp.log(w)
