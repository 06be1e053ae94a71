"""Shared Flax building blocks for the GAN zoo. NHWC throughout.

ResNet GAN blocks follow the SNGAN architecture the reference consumes from
the external torch-mimicry package (imported at reference
diagan-pkg/diagan/models/predefined_models.py:14): GBlock/DBlock/
DBlockOptimized with nearest-neighbor up / mean-pool down, spectral
normalization on all discriminator weights (one power iteration per step,
state in the 'spectral' variable collection), Xavier-uniform init with gain
sqrt(2) on block convs and gain 1 on shortcut/output layers.

`dtype` is the compute dtype of the convs/denses (params always stored
fp32, spectral-norm power iteration always fp32); BatchNorm statistics are
forced to fp32 regardless. Same mixed-precision scheme as the StyleGAN2
`--bf16` path (models/stylegan2.py).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

# Xavier-uniform with gain, matching torch nn.init.xavier_uniform_(w, gain).
def xavier_uniform(gain: float = 1.0):
    return nn.initializers.variance_scaling(
        gain * gain, mode="fan_avg", distribution="uniform"
    )


_SQRT2 = math.sqrt(2.0)


def upsample_nearest_2x(x):
    """(N, H, W, C) -> (N, 2H, 2W, C), nearest neighbor."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def avg_pool_2x(x):
    """2x2 mean-pool with stride 2."""
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def global_sum_pool(x):
    """Spatial sum pooling (SNGAN D head)."""
    return jnp.sum(x, axis=(1, 2))


class SNConv(nn.Module):
    """Conv2D with spectral normalization (power-iteration state in the
    'spectral' collection, updated when update_stats=True)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"
    use_bias: bool = True
    gain: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        conv = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform(self.gain),
            dtype=self.dtype,
        )
        return nn.SpectralNorm(conv, collection_name="spectral")(
            x, update_stats=update_stats
        )


class SNDense(nn.Module):
    features: int
    use_bias: bool = True
    gain: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        dense = nn.Dense(
            self.features, use_bias=self.use_bias,
            kernel_init=xavier_uniform(self.gain), dtype=self.dtype,
        )
        return nn.SpectralNorm(dense, collection_name="spectral")(
            x, update_stats=update_stats
        )


class GBlock(nn.Module):
    """Generator residual block: BN-ReLU-(up)-conv3x3-BN-ReLU-conv3x3 with a
    (up + 1x1 conv) learnable shortcut when upsampling or changing width."""

    out_features: int
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_features = x.shape[-1]
        learnable_sc = (in_features != self.out_features) or self.upsample

        # BatchNorm statistics in fp32 even under bf16 compute.
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        h = nn.relu(h)
        if self.upsample:
            h = upsample_nearest_2x(h)
        h = nn.Conv(
            self.out_features, (3, 3), padding="SAME",
            kernel_init=xavier_uniform(_SQRT2), dtype=self.dtype,
        )(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.out_features, (3, 3), padding="SAME",
            kernel_init=xavier_uniform(_SQRT2), dtype=self.dtype,
        )(h)

        sc = x
        if self.upsample:
            sc = upsample_nearest_2x(sc)
        if learnable_sc:
            sc = nn.Conv(
                self.out_features, (1, 1), padding="VALID",
                kernel_init=xavier_uniform(1.0), dtype=self.dtype,
            )(sc)
        return h + sc.astype(h.dtype)


class DBlock(nn.Module):
    """Discriminator residual block (spectral-normed):
    ReLU-conv3x3-ReLU-conv3x3-(down) with (1x1 conv)+down shortcut."""

    out_features: int
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_features = x.shape[-1]
        learnable_sc = (in_features != self.out_features) or self.downsample

        h = nn.relu(x)
        h = SNConv(self.out_features, gain=_SQRT2, dtype=self.dtype)(h, update_stats)
        h = nn.relu(h)
        h = SNConv(self.out_features, gain=_SQRT2, dtype=self.dtype)(h, update_stats)
        if self.downsample:
            h = avg_pool_2x(h)

        sc = x
        if learnable_sc:
            sc = SNConv(self.out_features, (1, 1), padding="VALID", gain=1.0,
                        dtype=self.dtype)(sc, update_stats)
            if self.downsample:
                sc = avg_pool_2x(sc)
        return h + sc.astype(h.dtype)


class DBlockOptimized(nn.Module):
    """First discriminator block: conv3x3-ReLU-conv3x3-down with a
    down+(1x1 conv) shortcut (always learnable)."""

    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        h = SNConv(self.out_features, gain=_SQRT2, dtype=self.dtype)(x, update_stats)
        h = nn.relu(h)
        h = SNConv(self.out_features, gain=_SQRT2, dtype=self.dtype)(h, update_stats)
        h = avg_pool_2x(h)

        sc = avg_pool_2x(x)
        sc = SNConv(self.out_features, (1, 1), padding="VALID", gain=1.0,
                    dtype=self.dtype)(sc, update_stats)
        return h + sc.astype(h.dtype)
