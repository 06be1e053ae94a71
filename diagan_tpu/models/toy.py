"""Toy MLP G/D for the 25-Gaussians grid.

Parity with reference diagan-pkg/diagan/models/toy.py:27-66: 4-layer MLPs
of width 256 with ReLU; N(0, 0.02) init; ns loss.
"""
from __future__ import annotations

import flax.linen as nn

_INIT = nn.initializers.normal(0.02)


class ToyGenerator(nn.Module):
    nz: int = 2
    nc: int = 2
    dim: int = 256

    @nn.compact
    def __call__(self, z, train: bool = True):
        h = z
        for _ in range(3):
            h = nn.relu(nn.Dense(self.dim, kernel_init=_INIT)(h))
        return nn.Dense(self.nc, kernel_init=_INIT)(h)


class ToyDiscriminator(nn.Module):
    nc: int = 2
    dim: int = 256
    use_sn: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = False, train: bool = True):
        h = x
        for _ in range(3):
            if self.use_sn:
                from diagan_tpu.models.layers import SNDense

                h = nn.relu(SNDense(self.dim)(h, update_stats))
            else:
                h = nn.relu(nn.Dense(self.dim, kernel_init=_INIT)(h))
        logits = nn.Dense(1, kernel_init=_INIT)(h)
        return logits.squeeze(-1), {"features": h}
