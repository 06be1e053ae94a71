"""SNGAN ResNet generators/discriminators, 32px and 64px variants. NHWC.

Capability parity with the torch-mimicry `sngan` model zoo the reference
trains (reference diagan-pkg/diagan/models/predefined_models.py:17-54):

  Generator32:  z(128) -> dense 4*4*256 -> 3 upsampling GBlocks (256) ->
                BN -> ReLU -> conv3x3 -> tanh
  Discriminator32: DBlockOptimized(128) -> DBlock(128, down) -> 2x
                DBlock(128) -> ReLU -> global sum pool -> SN dense -> 1
  Generator64:  z(128) -> dense 4*4*1024 -> GBlocks 1024/512/256/128/64
                (all up) -> BN -> ReLU -> conv3x3 -> tanh
  Discriminator64: DBlockOptimized(64) -> DBlocks 128/256/512/1024 (down)
                -> ReLU -> global sum pool -> SN dense -> 1

Discriminators return (logits (N,), aux dict) — aux carries the pooled
backbone features for the SSGAN/InfoMax heads and GOLD logging.

`dtype=jnp.bfloat16` (get_gan_model(..., bf16=True)) runs the conv/dense
stack in bfloat16 with fp32 params, BatchNorm statistics, spectral norm,
pooled features, and logit head — the TPU-native mixed-precision mode
(same scheme as models/stylegan2.py). fp32 remains the default.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from diagan_tpu.models.layers import (
    DBlock,
    DBlockOptimized,
    GBlock,
    SNDense,
    global_sum_pool,
    xavier_uniform,
)


class SNGANGenerator32(nn.Module):
    nz: int = 128
    ngf: int = 256
    bottom_width: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        b = self.bottom_width
        h = nn.Dense(b * b * self.ngf, kernel_init=xavier_uniform(1.0),
                     dtype=self.dtype)(z)
        h = h.reshape(-1, b, b, self.ngf)
        for _ in range(3):
            h = GBlock(self.ngf, upsample=True, dtype=self.dtype)(h, train)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(3, (3, 3), padding="SAME", kernel_init=xavier_uniform(1.0),
                    dtype=self.dtype)(h)
        # images leave the generator in fp32 whatever the compute dtype
        return jnp.tanh(h.astype(jnp.float32))


class SNGANDiscriminator32(nn.Module):
    ndf: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False, train: bool = True):
        h = DBlockOptimized(self.ndf, dtype=self.dtype)(x, update_stats)
        h = DBlock(self.ndf, downsample=True, dtype=self.dtype)(h, update_stats)
        h = DBlock(self.ndf, downsample=False, dtype=self.dtype)(h, update_stats)
        local = DBlock(self.ndf, downsample=False, dtype=self.dtype)(h, update_stats)
        # pooled features and the logit head stay fp32 under bf16 compute
        local = nn.relu(local.astype(jnp.float32))
        feat = global_sum_pool(local)
        logits = SNDense(1, gain=1.0)(feat, update_stats)
        return logits.squeeze(-1), {"features": feat, "local": local}


class SNGANGenerator64(nn.Module):
    nz: int = 128
    ngf: int = 1024
    bottom_width: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        b = self.bottom_width
        h = nn.Dense(b * b * self.ngf, kernel_init=xavier_uniform(1.0),
                     dtype=self.dtype)(z)
        h = h.reshape(-1, b, b, self.ngf)
        for width in (self.ngf >> 1, self.ngf >> 2, self.ngf >> 3, self.ngf >> 4):
            h = GBlock(width, upsample=True, dtype=self.dtype)(h, train)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(3, (3, 3), padding="SAME", kernel_init=xavier_uniform(1.0),
                    dtype=self.dtype)(h)
        return jnp.tanh(h.astype(jnp.float32))


class SNGANDiscriminator64(nn.Module):
    ndf: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False, train: bool = True):
        h = DBlockOptimized(self.ndf >> 4, dtype=self.dtype)(x, update_stats)
        h = DBlock(self.ndf >> 3, downsample=True, dtype=self.dtype)(h, update_stats)
        h = DBlock(self.ndf >> 2, downsample=True, dtype=self.dtype)(h, update_stats)
        h = DBlock(self.ndf >> 1, downsample=True, dtype=self.dtype)(h, update_stats)
        local = DBlock(self.ndf, downsample=True, dtype=self.dtype)(h, update_stats)
        local = nn.relu(local.astype(jnp.float32))
        feat = global_sum_pool(local)
        logits = SNDense(1, gain=1.0)(feat, update_stats)
        return logits.squeeze(-1), {"features": feat, "local": local}
