"""DCGAN for Colored-MNIST / MNIST-FMNIST, with PacGAN packing. NHWC.

Behavioral parity with reference diagan-pkg/diagan/models/mnist.py:47-223:
  Generator: dense nz->384 -> 4 transposed convs 384/192/96/48 -> nc, BN+ReLU
    between, tanh output; N(0, 0.02) init.
  Discriminator: 6 conv blocks 16/32/64/128/256/512 (stride 2,1,2,1,2,1),
    LeakyReLU(0.2) + BN (from block 2) + Dropout(0.5), optional spectral
    norm on convs, dense head over 4*4*512. PacGAN: the batch is split into
    `num_pack` chunks concatenated on channels before conv1
    (mnist.py:213-218).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_INIT = nn.initializers.normal(0.02)


class MNISTDCGANGenerator(nn.Module):
    nz: int = 100
    nc: int = 3
    dtype: jnp.dtype = jnp.float32  # compute dtype; params/BN stats fp32

    @nn.compact
    def __call__(self, z, train: bool = True):
        h = nn.Dense(384, kernel_init=_INIT, dtype=self.dtype)(z)
        h = h.reshape(-1, 1, 1, 384)
        # tconv1: 1x1 -> 4x4 (kernel 4, stride 1, VALID)
        h = nn.ConvTranspose(192, (4, 4), strides=(1, 1), padding="VALID",
                             use_bias=False, kernel_init=_INIT,
                             dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, scale_init=_INIT,
                         dtype=jnp.float32)(h)
        h = nn.relu(h)
        # tconv2-3: exact x2 upsample (torch k4/s2/p1 == SAME here)
        for width in (96, 48):
            h = nn.ConvTranspose(width, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, kernel_init=_INIT,
                                 dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, scale_init=_INIT,
                             dtype=jnp.float32)(h)
            h = nn.relu(h)
        h = nn.ConvTranspose(self.nc, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False, kernel_init=_INIT,
                             dtype=self.dtype)(h)
        return jnp.tanh(h.astype(jnp.float32))


class MNISTDCGANDiscriminator(nn.Module):
    nc: int = 3
    num_pack: int = 1
    use_sn: bool = False
    dtype: jnp.dtype = jnp.float32  # compute dtype; params/BN/head fp32

    @nn.compact
    def __call__(self, x, update_stats: bool = False, train: bool = True):
        if self.num_pack > 1:
            # PacGAN: split batch into num_pack chunks, stack on channels
            n = x.shape[0] // self.num_pack
            x = jnp.concatenate(
                [x[i * n : (i + 1) * n] for i in range(self.num_pack)], axis=-1
            )

        def conv(h, width, stride):
            # Explicit (1,1) padding, not "SAME": torch's k3/s2/p1 samples
            # windows at 2t-1 (pad lo=1), while XLA SAME at stride 2 pads
            # (0,1) — a one-pixel grid shift. (1,1) is bit-identical to
            # SAME for the stride-1 layers and matches torch for stride 2.
            pad = ((1, 1), (1, 1))
            if self.use_sn:
                from diagan_tpu.models.layers import SNConv

                return SNConv(width, (3, 3), strides=(stride, stride),
                              padding=pad, use_bias=False,
                              dtype=self.dtype)(h, update_stats)
            return nn.Conv(width, (3, 3), strides=(stride, stride),
                           padding=pad, use_bias=False, kernel_init=_INIT,
                           dtype=self.dtype)(h)

        specs = [(16, 2), (32, 1), (64, 2), (128, 1), (256, 2), (512, 1)]
        h = x
        for i, (width, stride) in enumerate(specs):
            h = conv(h, width, stride)
            if i > 0:  # conv1 has no BN (reference mnist.py:163-166)
                h = nn.BatchNorm(use_running_average=not train, scale_init=_INIT,
                                 dtype=jnp.float32)(h)
            h = nn.leaky_relu(h, 0.2)
            h = nn.Dropout(0.5, deterministic=not train)(h)
        feat = h.reshape(h.shape[0], -1).astype(jnp.float32)  # (N, 4*4*512)
        logits = nn.Dense(1, kernel_init=_INIT)(feat)
        return logits.squeeze(-1), {"features": feat}
