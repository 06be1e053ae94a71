"""LPIPS perceptual distance (Zhang et al. 2018), Flax.

The reference vendors the official LPIPS package with pretrained
alex/vgg/squeeze weights (reference stylegan2/lpips/; present but not
wired into any active loss — Inclusive GAN's LPIPS path is commented out,
inclusive_gan.py:294-295). Provided here for the same capability surface:
a VGG16-topology feature stack with unit-normalized channel differences
and per-layer linear calibration heads.

Weights: pass a torchvision VGG16 state_dict path + the lpips linear
weights (.pth) to `load_torch_weights`; without files on disk the
deterministic random init gives a valid (untrained) perceptual metric for
pipeline testing, flagged via `weights_kind`.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# slice points after which features are tapped (relu1_2 ... relu5_3)
_TAPS = (1, 3, 6, 9, 12)


class _VGGFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        conv_i = 0
        for v in _VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding="SAME")(x))
                if conv_i in _TAPS:
                    feats.append(x)
                conv_i += 1
        return feats


class LPIPS:
    def __init__(self, weights_path=None, lin_path=None, seed=0):
        self.net = _VGGFeatures()
        self.variables = self.net.init(
            jax.random.key(seed), jnp.zeros((1, 64, 64, 3))
        )
        self.weights_kind = "random"
        self.lins = None  # per-layer channel weights; None -> uniform
        if weights_path:
            self._load_vgg(weights_path)
        if lin_path:
            self._load_lins(lin_path)

        # imagenet normalization applied to [-1,1] inputs (lpips shift/scale)
        self._shift = jnp.asarray([-0.030, -0.088, -0.188])
        self._scale = jnp.asarray([0.458, 0.448, 0.450])

        @jax.jit
        def dist(x, y):
            fx = self.net.apply(self.variables, (x - self._shift) / self._scale)
            fy = self.net.apply(self.variables, (y - self._shift) / self._scale)
            total = 0.0
            for i, (a, b) in enumerate(zip(fx, fy)):
                a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
                b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
                d = (a - b) ** 2
                if self.lins is not None:
                    d = d * self.lins[i][None, None, None, :]
                    total = total + jnp.mean(jnp.sum(d, -1), axis=(1, 2))
                else:
                    total = total + jnp.mean(d, axis=(1, 2, 3))
            return total

        self._dist = dist

    def _load_vgg(self, path):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        params = jax.device_get(self.variables)["params"]
        conv_keys = sorted(
            (k for k in params if k.startswith("Conv_")),
            key=lambda k: int(k.split("_")[1]),
        )
        tw = [(k, v) for k, v in sd.items() if k.endswith(".weight") and v.ndim == 4]
        tb = [(k, v) for k, v in sd.items() if k.endswith(".bias") and v.ndim == 1]
        for i, ck in enumerate(conv_keys):
            w = np.asarray(tw[i][1]).transpose(2, 3, 1, 0)
            b = np.asarray(tb[i][1])
            assert params[ck]["kernel"].shape == w.shape, ck
            params[ck]["kernel"] = w
            params[ck]["bias"] = b
        self.variables = {"params": params}
        self.weights_kind = "loaded"

    def _load_lins(self, path):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        lins = [np.asarray(v).reshape(-1)
                for k, v in sorted(sd.items()) if "weight" in k]
        self.lins = [jnp.asarray(l) for l in lins]

    def forward(self, x, y):
        """x, y: (N, H, W, C) in [-1, 1]. Returns per-sample distance (N,)."""
        return self._dist(jnp.asarray(x), jnp.asarray(y))

    __call__ = forward
