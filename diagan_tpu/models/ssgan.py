"""SSGAN: SNGAN backbone + 4-way rotation self-supervision head.

Capability parity with torch-mimicry `ssgan` (consumed at reference
predefined_models.py:20,40): the discriminator classifies the rotation
(0/90/180/270) of real images (loss scale 1.0); the generator adds the
rotation loss on its fakes (loss scale 0.2). The rotation head is an extra
spectral-normed dense layer over the pooled backbone features.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from diagan_tpu.models.layers import SNDense
from diagan_tpu.models.sngan import (
    SNGANDiscriminator32,
    SNGANDiscriminator64,
    SNGANGenerator32,
    SNGANGenerator64,
)

SS_LOSS_SCALE_D = 1.0
SS_LOSS_SCALE_G = 0.2
NUM_ROTATIONS = 4

# Generators are architecturally identical to SNGAN's.
SSGANGenerator32 = SNGANGenerator32
SSGANGenerator64 = SNGANGenerator64


class _SSHead(nn.Module):
    @nn.compact
    def __call__(self, feat, update_stats: bool = False):
        return SNDense(NUM_ROTATIONS, gain=1.0)(feat, update_stats)


class SSGANDiscriminator32(nn.Module):
    ndf: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False, train: bool = True):
        logits, aux = SNGANDiscriminator32(self.ndf, dtype=self.dtype)(x, update_stats)
        aux["ss_logits"] = _SSHead()(aux["features"], update_stats)
        return logits, aux


class SSGANDiscriminator64(nn.Module):
    ndf: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False, train: bool = True):
        logits, aux = SNGANDiscriminator64(self.ndf, dtype=self.dtype)(x, update_stats)
        aux["ss_logits"] = _SSHead()(aux["features"], update_stats)
        return logits, aux
