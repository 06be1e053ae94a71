"""Convolutional autoencoders for the reconstruction-error eval protocol.

Parity with reference diagan-pkg/diagan/models/auto_encoder.py: CAE32 has
3 encoder stages (64/128/256, stride 2) to a 256-d tanh bottleneck and a
mirrored decoder; CAE64 adds a fourth stage (512). (The reference defines
CAE64 twice identically — auto_encoder.py:59,125 — a quirk, not replicated.)
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class CAE(nn.Module):
    in_channels: int = 3
    rep_dim: int = 256
    num_stages: int = 3  # 3 -> 32px, 4 -> 64px
    nf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        return self.decode(self.encode(x, train), train)

    @nn.compact_name_scope
    def encode(self, x, train: bool = True):
        h = x
        for s in range(self.num_stages):
            h = nn.Conv(self.nf * (2**s), (3, 3), strides=(2, 2), padding="SAME")(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.relu(h)
        h = h.reshape(h.shape[0], -1)
        return jnp.tanh(nn.Dense(self.rep_dim)(h))

    @nn.compact_name_scope
    def decode(self, rep, train: bool = True):
        top_nf = self.nf * (2 ** (self.num_stages - 1))
        h = nn.Dense(top_nf * 4 * 4)(rep)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = h.reshape(-1, 4, 4, top_nf)
        for s in range(self.num_stages - 2, -1, -1):
            h = nn.ConvTranspose(self.nf * (2**s), (3, 3), strides=(2, 2),
                                 padding="SAME")(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.relu(h)
        h = nn.ConvTranspose(self.in_channels, (3, 3), strides=(2, 2),
                             padding="SAME")(h)
        return jnp.tanh(h)


def CAE32(in_channels=3, rep_dim=256):
    return CAE(in_channels=in_channels, rep_dim=rep_dim, num_stages=3)


def CAE64(in_channels=3, rep_dim=256):
    return CAE(in_channels=in_channels, rep_dim=rep_dim, num_stages=4)


def get_ae_model(dataset_name, in_channels=3):
    """Dataset -> CAE dispatch (reference auto_encoder.py:201-206)."""
    if dataset_name in ("cifar10", "color_mnist", "mnist_fmnist"):
        nc = 1 if dataset_name == "mnist_fmnist" else in_channels
        return CAE32(in_channels=nc)
    if dataset_name == "celeba":
        return CAE64(in_channels=in_channels)
    raise ValueError(dataset_name)
