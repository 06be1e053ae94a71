"""Pixel-space transforms applied at dataset build time.

The reference applies torchvision Resize+CenterCrop+ToTensor+Normalize per
__getitem__ (reference diagan-pkg/diagan/datasets/transform.py:3-52). Here
the resize/crop happens once on the uint8 array at build time (the whole
dataset lives in HBM); the Normalize(0.5, 0.5) -> [-1, 1] step is fused into
the on-device gather (pipeline.DeviceDataSource.gather).
"""
from __future__ import annotations

import numpy as np


def resize_center_crop(images: np.ndarray, size: int) -> np.ndarray:
    """Resize shorter side to `size` (bilinear) then center-crop, batch uint8
    NHWC (or NHW for grayscale)."""
    gray = images.ndim == 3
    if gray:
        images = images[..., None]
    n, h, w, c = images.shape
    if h == size and w == size:
        return images[..., 0] if gray else images
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    x = _bilinear_resize(images, nh, nw)
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top : top + size, left : left + size, :]
    return x[..., 0] if gray else x


def _bilinear_resize(images: np.ndarray, nh: int, nw: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    n, h, w, c = images.shape
    out = jax.image.resize(
        jnp.asarray(images, jnp.float32), (n, nh, nw, c), method="bilinear"
    )
    return np.asarray(jnp.clip(jnp.round(out), 0, 255)).astype(np.uint8)


def grayscale_to_rgb(images: np.ndarray) -> np.ndarray:
    if images.ndim == 3:
        images = images[..., None]
    if images.shape[-1] == 1:
        images = np.repeat(images, 3, axis=-1)
    return images


def remove_outliers(images: np.ndarray, z_thresh: float = 3.0) -> np.ndarray:
    """Drop images whose mean intensity is a z-score outlier — numpy
    equivalent of the reference's unused cv2 helper
    (diagan-pkg/diagan/datasets/utils.py:4-21)."""
    means = images.reshape(len(images), -1).mean(1).astype(np.float64)
    z = np.abs(means - means.mean()) / (means.std() + 1e-12)
    return images[z < z_thresh]
