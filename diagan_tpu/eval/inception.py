"""InceptionV3 feature extractor for FID/IS/KID/PR, in Flax. NHWC.

The reference computes FID with the TF1-graph FID Inception
(reference diagan-pkg/diagan/trainer/fid_score.py:9,247) and uses a torch
port for Inclusive-GAN embeddings (diagan-pkg/diagan/models/inception.py).
This is a from-scratch Flax implementation of the same InceptionV3
topology (pool3 = 2048-d features, logits head for IS), with:

  - `load_torch_weights(path)`: consume a pytorch-fid / torchvision
    `state_dict` file when one is available on disk (set
    DIAGAN_TPU_INCEPTION_WEIGHTS or pass a path),
  - deterministic seed-0 random init as the zero-egress fallback. Metrics
    computed with random features are valid *relative* quantities for
    pipeline testing but are NOT comparable to published FID numbers —
    every metric dict carries `inception_weights: "random"|"loaded"`.

Input convention: float images in [-1, 1], NHWC, any spatial size
(bilinearly resized to 299 like the reference pipeline).
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: str | tuple = "VALID"
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3)(x)
        return nn.relu(x)


def _pool(x, window, strides, padding="VALID", kind="max"):
    if kind == "max":
        return nn.max_pool(x, window, strides=strides, padding=padding)
    # FID-Inception patch: TF's average pool excludes the padded zeros
    # from the mean (reference diagan-pkg/diagan/models/inception.py:222-223,
    # the pytorch-fid `count_include_pad=False` patch) — required for
    # activation parity with the pt_inception FID weights
    return nn.avg_pool(x, window, strides=strides, padding=padding,
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1))(x)
        b5 = ConvBN(48, (1, 1))(x)
        b5 = ConvBN(64, (5, 5), padding=((2, 2), (2, 2)))(b5)
        b3 = ConvBN(64, (1, 1))(x)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)))(b3)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)))(b3)
        bp = _pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)), kind="avg")
        bp = ConvBN(self.pool_features, (1, 1))(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2))(x)
        bd = ConvBN(64, (1, 1))(x)
        bd = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)))(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2))(bd)
        bp = _pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1))(x)
        b7 = ConvBN(c7, (1, 1))(x)
        b7 = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)))(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)))(b7)
        bd = ConvBN(c7, (1, 1))(x)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)))(bd)
        bd = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)))(bd)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)))(bd)
        bd = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)))(bd)
        bp = _pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)), kind="avg")
        bp = ConvBN(192, (1, 1))(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1))(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2))(b3)
        b7 = ConvBN(192, (1, 1))(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)))(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)))(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2))(b7)
        bp = _pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # The FID Inception's second E block (Mixed_7c) max-pools its pool
    # branch where every other Inception uses avg — a quirk of the TF FID
    # graph the pt_inception weights were trained with (reference
    # diagan-pkg/diagan/models/inception.py:314-318, FIDInceptionE_2)
    pool_kind: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1))(x)
        b3 = ConvBN(384, (1, 1))(x)
        b3a = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)))(b3)
        b3b = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)))(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1))(x)
        bd = ConvBN(384, (3, 3), padding=((1, 1), (1, 1)))(bd)
        bda = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)))(bd)
        bdb = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)))(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
                   kind=self.pool_kind)
        bp = ConvBN(192, (1, 1))(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1008  # TF-Inception logits size (IS convention)

    @nn.compact
    def __call__(self, x):
        """x: [-1,1] NHWC at 299x299. Returns (pool3 [N,2048], logits)."""
        x = ConvBN(32, (3, 3), strides=(2, 2))(x)
        x = ConvBN(32, (3, 3))(x)
        x = ConvBN(64, (3, 3), padding=((1, 1), (1, 1)))(x)
        x = _pool(x, (3, 3), (2, 2))
        x = ConvBN(80, (1, 1))(x)
        x = ConvBN(192, (3, 3))(x)
        x = _pool(x, (3, 3), (2, 2))
        x = InceptionA(32)(x)
        x = InceptionA(64)(x)
        x = InceptionA(64)(x)
        x = InceptionB()(x)
        x = InceptionC(128)(x)
        x = InceptionC(160)(x)
        x = InceptionC(160)(x)
        x = InceptionC(192)(x)
        x = InceptionD()(x)
        x = InceptionE()(x)
        x = InceptionE(pool_kind="max")(x)
        pool3 = jnp.mean(x, axis=(1, 2))  # global average pool -> 2048
        logits = nn.Dense(self.num_classes)(pool3)
        return pool3, logits


class InceptionFeaturizer:
    """Batched, jitted feature extraction with weight management."""

    def __init__(self, weights_path=None, batch_size=100):
        self.model = InceptionV3()
        self.batch_size = batch_size
        weights_path = weights_path or os.environ.get(
            "DIAGAN_TPU_INCEPTION_WEIGHTS"
        )
        if weights_path and os.path.exists(weights_path):
            self.variables = load_torch_weights(self.model, weights_path)
            self.weights_kind = "loaded"
        else:
            self.variables = self.model.init(
                jax.random.key(0), jnp.zeros((1, 299, 299, 3))
            )
            self.weights_kind = "random"

        def fwd_one(x):
            # resize to 299 (reference pipeline resizes before Inception)
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 127.5 - 1.0
            n = x.shape[0]
            x = jax.image.resize(x, (n, 299, 299, x.shape[-1]), "bilinear")
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)
            return self.model.apply(self.variables, x)

        self._fwd = jax.jit(fwd_one)

        @jax.jit
        def fwd_scan(batches):
            # (M, bs, H, W, C) -> stacked features/logits in ONE dispatch;
            # per-batch dispatch costs ~0.8s on the tunneled TPU platform,
            # so the loop grain must be the slab, not the batch
            return jax.lax.scan(
                lambda _, x: (None, fwd_one(x)), None, batches
            )[1]

        self._fwd_scan = fwd_scan

        # A randomly-initialized deep net emits features at a tiny, nearly
        # degenerate scale (activations shrink through ~90 conv+BN layers).
        # They still discriminate, but float precision suffers downstream
        # (cov/sqrtm). For the random fallback, standardize per-dimension
        # with a fixed affine computed once from a deterministic probe so
        # features are O(1); loaded weights pass through unchanged.
        self._feat_shift = None
        self._feat_scale = None
        if self.weights_kind == "random":
            # probe spans noise AND structured content so the affine's scale
            # reflects natural-image feature ranges, not just iid noise
            k1, k2 = jax.random.split(jax.random.key(1))
            noise = jax.random.uniform(k1, (16, 64, 64, 3), minval=-1, maxval=1)
            smooth = jax.image.resize(
                jax.random.uniform(k2, (16, 8, 8, 3), minval=-1, maxval=1),
                (16, 64, 64, 3), "bilinear",
            )
            yy = jnp.linspace(-1, 1, 64)[None, :, None, None]
            ramps = jnp.tile(yy, (8, 1, 64, 3)) * jnp.linspace(
                0.25, 1, 8
            )[:, None, None, None]
            flat = jnp.ones((8, 64, 64, 3)) * jnp.linspace(
                -1, 1, 8
            )[:, None, None, None]
            probe = jnp.concatenate([noise, smooth, ramps, flat])
            pf, _ = self._fwd(probe)
            pf = np.asarray(pf, np.float64)
            self._feat_shift = pf.mean(0)
            self._feat_scale = 1.0 / (pf.std(0) + 1e-12)
            # tame the overall magnitude: unit RMS over the probe set
            z = (pf - self._feat_shift) * self._feat_scale
            self._feat_scale = self._feat_scale / np.sqrt((z**2).mean() + 1e-12)

    def features_and_logits(self, images):
        """images: float [-1,1] NHWC (any size) or uint8 -> (pool3, logits).

        uint8 input stays uint8 across the host->device link (4x less
        traffic; conversion happens on device). Work is sliced into slabs
        of <=~1GB of device-resident images, each featurized as one
        scanned dispatch."""
        if not isinstance(images, jax.Array):
            images = np.asarray(images)
        bs = self.batch_size
        n = len(images)
        img_bytes = int(np.prod(images.shape[1:])) * images.dtype.itemsize
        slab_batches = max(1, (2**30 // img_bytes) // bs)
        feats, logits = [], []
        for s in range(0, n, slab_batches * bs):
            slab = images[s : s + slab_batches * bs]
            k = len(slab)
            pad = (-k) % bs
            cat = jnp.concatenate if isinstance(slab, jax.Array) \
                else np.concatenate
            if pad:
                slab = cat([slab, slab[:1].repeat(pad, axis=0) * 0])
            slab = jnp.asarray(slab).reshape((-1, bs) + slab.shape[1:])
            f, l = self._fwd_scan(slab)
            feats.append(np.asarray(f).reshape(-1, f.shape[-1])[:k])
            logits.append(np.asarray(l).reshape(-1, l.shape[-1])[:k])
        feats = np.concatenate(feats)
        logits = np.concatenate(logits)
        if self._feat_scale is not None:
            feats = (feats - self._feat_shift) * self._feat_scale
        return feats, logits

    def features(self, images):
        return self.features_and_logits(images)[0]


def _walk(d, prefix=()):
    for k, v in d.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _natural_key(path):
    """Sort key where 'ConvBN_10' sorts after 'ConvBN_2' (flax auto-names);
    for this architecture natural-sorted paths == definition order, which is
    also torchvision's state_dict order."""
    key = []
    for comp in path:
        if "_" in comp and comp.rsplit("_", 1)[-1].isdigit():
            stem, num = comp.rsplit("_", 1)
            key.append((stem, int(num)))
        else:
            key.append((comp, -1))
    return key


def load_torch_weights(model, path):
    """Convert a torchvision/pytorch-fid InceptionV3 state_dict into this
    module's variable tree by definition-order matching (shape-checked).
    Requires torch (CPU-only is fine) to deserialize the file."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items() if "AuxLogits" not in k}

    conv_w = [np.asarray(v) for k, v in sd.items() if k.endswith("conv.weight")]
    bn_parts = {
        part: [np.asarray(v) for k, v in sd.items() if k.endswith(f"bn.{part}")]
        for part in ("weight", "bias", "running_mean", "running_var")
    }
    fc_w = [np.asarray(v) for k, v in sd.items() if k in ("fc.weight",)]
    fc_b = [np.asarray(v) for k, v in sd.items() if k in ("fc.bias",)]

    template = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    )
    params, stats = template["params"], template["batch_stats"]

    conv_paths = sorted(
        (p for p, v in _walk(params) if p[-1] == "kernel" and v.ndim == 4),
        key=_natural_key,
    )
    if len(conv_paths) != len(conv_w):
        raise ValueError(
            f"conv count mismatch: {len(conv_paths)} flax vs {len(conv_w)} torch"
        )

    def set_in(tree, path, value):
        for k in path[:-1]:
            tree = tree[k]
        old = tree[path[-1]]
        if old.shape != value.shape:
            raise ValueError(f"shape mismatch at {path}: {old.shape} vs {value.shape}")
        tree[path[-1]] = value.astype(old.dtype)

    for i, p in enumerate(conv_paths):
        set_in(params, p, np.transpose(conv_w[i], (2, 3, 1, 0)))  # OIHW->HWIO
        bn_path = p[:-2] + ("BatchNorm_0",)
        set_in(params, bn_path + ("scale",), bn_parts["weight"][i])
        set_in(params, bn_path + ("bias",), bn_parts["bias"][i])
        set_in(stats, bn_path + ("mean",), bn_parts["running_mean"][i])
        set_in(stats, bn_path + ("var",), bn_parts["running_var"][i])

    if fc_w:
        dense_path = next(p for p, v in _walk(params) if p[-1] == "kernel" and v.ndim == 2)
        if fc_w[0].T.shape == tuple(_get_in(params, dense_path).shape):
            set_in(params, dense_path, fc_w[0].T)
            set_in(params, dense_path[:-1] + ("bias",), fc_b[0])

    return {"params": params, "batch_stats": stats}


def _get_in(tree, path):
    for k in path:
        tree = tree[k]
    return tree
