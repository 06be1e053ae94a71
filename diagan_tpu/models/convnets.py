"""Small classifiers for the bias-probe tooling. NHWC.

Parity with reference diagan-pkg/diagan/models/convnets.py:9-125:
SimpleConvNet (4 conv+BN+ReLU stages, kernel 7, global avg pool, linear
head; returns (logits, l2-normalized features)), SimpleNet MLP, and an
attribute classifier standing in for the vgg16 used by
train_convnet_celeba.py (torchvision is unavailable; a deeper conv stack
with the same train/eval surface).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SimpleConvNet(nn.Module):
    num_labels: int = 10
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = self.kernel_size
        for width in (16, 32, 64, 128):
            x = nn.Conv(width, (k, k), padding="SAME",
                        kernel_init=nn.initializers.kaiming_normal())(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
        feat = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_labels)(feat)
        feat = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-8)
        return logits, feat


class SimpleNet(nn.Module):
    num_labels: int = 10
    dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = x.reshape(x.shape[0], -1)
        for _ in range(3):
            h = nn.relu(nn.Dense(self.dim)(h))
        logits = nn.Dense(self.num_labels)(h)
        return logits, h


class AttrClassifier(nn.Module):
    """CelebA multi-attribute classifier (stands in for the reference's
    torchvision vgg16 at train_convnet_celeba.py:26-63): VGG-style conv
    stages + 2-layer head, sigmoid-per-attribute outputs."""

    num_attrs: int = 40

    @nn.compact
    def __call__(self, x, train: bool = True):
        for width in (64, 128, 256, 512):
            x = nn.Conv(width, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            x = nn.Conv(width, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        feat = jnp.mean(x, axis=(1, 2))
        h = nn.relu(nn.Dense(512)(feat))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.Dense(self.num_attrs)(h), feat


class Simple3DNet(nn.Module):
    """3-channel-aware variant kept for surface parity with the reference's
    convnets module (diagan-pkg/diagan/models/convnets.py); identical
    topology to SimpleConvNet with kernel 3."""

    num_labels: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        return SimpleConvNet(num_labels=self.num_labels, kernel_size=3)(
            x, train=train
        )
