"""InfoMaxGAN: SNGAN backbone + local-global mutual-information head.

Capability parity with torch-mimicry `infomax_gan` (consumed at reference
predefined_models.py:19,39): the discriminator maximizes InfoNCE mutual
information between local (spatial) and global backbone features through
two projection MLPs into an RKHS of dim `nrkhs`; both D and G add the
InfoMax term at scale 0.2.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from diagan_tpu.models.layers import SNConv, SNDense
from diagan_tpu.models.sngan import (
    SNGANDiscriminator32,
    SNGANDiscriminator64,
    SNGANGenerator32,
    SNGANGenerator64,
)

INFOMAX_LOSS_SCALE = 0.2

InfoMaxGANGenerator32 = SNGANGenerator32
InfoMaxGANGenerator64 = SNGANGenerator64


class _InfoMaxHeads(nn.Module):
    """Local 1x1-conv projector and global MLP projector into the RKHS."""

    nrkhs: int = 1024

    @nn.compact
    def __call__(self, local, feat, update_stats: bool = False):
        # local: (N, H, W, C) post-ReLU backbone map; feat: (N, C) pooled
        l = SNConv(self.nrkhs, (1, 1), padding="VALID", gain=1.0)(local, update_stats)
        n, h, w, d = l.shape
        local_proj = l.reshape(n, h * w, d)

        g = SNDense(self.nrkhs, gain=1.0)(feat, update_stats)
        g = nn.relu(g)
        g = SNDense(self.nrkhs, gain=1.0)(g, update_stats)

        # L2-normalize both (temperature-free cosine InfoNCE)
        local_proj = local_proj / (
            jnp.linalg.norm(local_proj, axis=-1, keepdims=True) + 1e-8
        )
        g = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-8)
        return local_proj, g


class InfoMaxGANDiscriminator32(nn.Module):
    ndf: int = 128
    nrkhs: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False, train: bool = True):
        logits, aux = SNGANDiscriminator32(self.ndf, dtype=self.dtype)(x, update_stats)
        local_proj, global_proj = _InfoMaxHeads(self.nrkhs)(
            aux["local"], aux["features"], update_stats
        )
        aux["local_proj"] = local_proj
        aux["global_proj"] = global_proj
        return logits, aux


class InfoMaxGANDiscriminator64(nn.Module):
    ndf: int = 1024
    nrkhs: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False, train: bool = True):
        logits, aux = SNGANDiscriminator64(self.ndf, dtype=self.dtype)(x, update_stats)
        local_proj, global_proj = _InfoMaxHeads(self.nrkhs)(
            aux["local"], aux["features"], update_stats
        )
        aux["local_proj"] = local_proj
        aux["global_proj"] = global_proj
        return logits, aux
