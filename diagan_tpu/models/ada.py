"""ADA — adaptive discriminator augmentation (non-leaking) for StyleGAN2.

Capability parity with reference stylegan2/non_leaking.py: each image gets,
with probability p per transform,
  geometric: x-flip, 90-degree rotation, integer translation, isotropic
  scaling, arbitrary rotation, anisotropic scaling, fractional translation
  — composed as a single 3x3 matrix (non_leaking.py:188-244) and applied
  in one resampling pass;
  color: brightness, contrast, luma flip, hue rotation, saturation —
  composed 4x4 matrices applied per pixel (non_leaking.py:247-278).
`AdaptiveAugment` drives p toward the r_t=0.6 sign-of-D(real) target
(non_leaking.py:10-43); under a mesh the (sign_sum, count) pair is a psum.

TPU-native: the reference resamples through padded upfirdn2d with sym6
wavelet filters; here the composed affine is applied in a single bilinear
`map_coordinates` gather on a reflect-padded image — one fused XLA gather
instead of the multi-pass wavelet pipeline (antialiasing quality is
slightly lower; the non-leaking property, which depends only on the
transform distribution, is preserved).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _rot2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack([
        jnp.stack([sx, z, z], -1),
        jnp.stack([z, sy, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _translate2d(tx, ty):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack([
        jnp.stack([o, z, tx], -1),
        jnp.stack([z, o, ty], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def sample_affine_matrices(key, n, p, translate=0.125, translate_std=0.125):
    """Per-sample composed 3x3 geometric matrices (image coords in [-1,1]).

    Transform set and parameter ranges follow non_leaking.py:188-244.
    """
    ks = jax.random.split(key, 8)
    G = jnp.tile(jnp.eye(3)[None], (n, 1, 1))

    def apply_if(mask, M, G):
        return jnp.where(mask[:, None, None], M @ G, G)

    # x-flip
    flip = jax.random.bernoulli(ks[0], 0.5, (n,)) & \
        jax.random.bernoulli(ks[0], p, (n,))
    G = apply_if(flip, _scale2d(jnp.where(flip, -1.0, 1.0), jnp.ones(n)), G)
    # 90-degree rotations
    do = jax.random.bernoulli(ks[1], p, (n,))
    quarter = jax.random.randint(ks[1], (n,), 0, 4).astype(jnp.float32)
    G = apply_if(do, _rot2d(jnp.where(do, quarter * (math.pi / 2), 0.0)), G)
    # integer translate (fraction of image size)
    do = jax.random.bernoulli(ks[2], p, (n,))
    t = jax.random.uniform(ks[2], (n, 2), minval=-translate, maxval=translate)
    t = jnp.where(do[:, None], t, 0.0)
    G = _translate2d(t[:, 0] * 2, t[:, 1] * 2) @ G
    # isotropic scale, lognormal(0.2*log2)
    do = jax.random.bernoulli(ks[3], p, (n,))
    s = 2.0 ** (jax.random.normal(ks[3], (n,)) * 0.2)
    s = jnp.where(do, s, 1.0)
    G = _scale2d(s, s) @ G
    # arbitrary rotation
    do = jax.random.bernoulli(ks[4], p, (n,))
    theta = jax.random.uniform(ks[4], (n,), minval=-math.pi, maxval=math.pi)
    G = apply_if(do, _rot2d(jnp.where(do, theta, 0.0)), G)
    # anisotropic scale
    do = jax.random.bernoulli(ks[5], p, (n,))
    sa = 2.0 ** (jax.random.normal(ks[5], (n,)) * 0.2)
    sa = jnp.where(do, sa, 1.0)
    G = _scale2d(sa, 1.0 / sa) @ G
    # fractional translate
    do = jax.random.bernoulli(ks[6], p, (n,))
    t = jax.random.normal(ks[6], (n, 2)) * translate_std
    t = jnp.where(do[:, None], t, 0.0)
    G = _translate2d(t[:, 0] * 2, t[:, 1] * 2) @ G
    return G


def apply_affine(images, G):
    """Apply per-sample inverse-affine resampling, bilinear, reflect pad.
    images: (N, H, W, C); G maps output coords -> input coords directly
    (we invert the composed forward matrix)."""
    n, h, w, c = images.shape
    Ginv = jnp.linalg.inv(G)
    ys = jnp.linspace(-1 + 1 / h, 1 - 1 / h, h)
    xs = jnp.linspace(-1 + 1 / w, 1 - 1 / w, w)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(xx)
    grid = jnp.stack([xx, yy, ones], 0).reshape(3, -1)  # (3, H*W)
    src = jnp.einsum("nij,jk->nik", Ginv, grid)  # (N, 3, H*W)
    sx = (src[:, 0] + 1) * (w / 2) - 0.5
    sy = (src[:, 1] + 1) * (h / 2) - 0.5

    def sample_one(img, sy, sx):
        coords = jnp.stack([sy, sx], 0)

        def chan(cimg):
            return jax.scipy.ndimage.map_coordinates(
                cimg, coords, order=1, mode="reflect"
            )

        return jax.vmap(chan, in_axes=-1, out_axes=-1)(img).reshape(h, w, c)

    return jax.vmap(sample_one)(images, sy, sx)


def sample_color_matrices(key, n, p):
    """Composed 4x4 color matrices (non_leaking.py:247-278)."""
    ks = jax.random.split(key, 5)
    I = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    C = I
    v = jnp.asarray([1, 1, 1, 0], jnp.float32) / math.sqrt(3)

    # brightness
    do = jax.random.bernoulli(ks[0], p, (n,))
    b = jnp.where(do, jax.random.normal(ks[0], (n,)) * 0.2, 0.0)
    M = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    M = M.at[:, :3, 3].set(b[:, None] * jnp.ones((n, 3)))
    C = M @ C
    # contrast
    do = jax.random.bernoulli(ks[1], p, (n,))
    cfac = jnp.where(do, 2.0 ** (jax.random.normal(ks[1], (n,)) * 0.5), 1.0)
    M = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    M = M * cfac[:, None, None]
    M = M.at[:, 3, 3].set(1.0)
    C = M @ C
    # luma flip (householder about v)
    do = jax.random.bernoulli(ks[2], p, (n,))
    flip = jnp.where(do, 1.0, 0.0)
    H = jnp.eye(4) - 2.0 * jnp.outer(v, v)
    M = (1 - flip)[:, None, None] * I + flip[:, None, None] * H[None]
    C = M @ C
    # hue rotation about the luma axis
    do = jax.random.bernoulli(ks[3], p, (n,))
    theta = jnp.where(do, jax.random.uniform(ks[3], (n,), minval=-math.pi,
                                             maxval=math.pi), 0.0)
    axis = v[:3] * math.sqrt(3) / math.sqrt(3)  # (1,1,1)/sqrt3
    K = jnp.asarray([[0, -axis[2], axis[1]],
                     [axis[2], 0, -axis[0]],
                     [-axis[1], axis[0], 0]], jnp.float32)
    ct = jnp.cos(theta)[:, None, None]
    st = jnp.sin(theta)[:, None, None]
    R3 = ct * jnp.eye(3)[None] + st * K[None] + \
        (1 - ct) * jnp.outer(axis, axis)[None]
    M = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    M = M.at[:, :3, :3].set(R3)
    C = M @ C
    # saturation
    do = jax.random.bernoulli(ks[4], p, (n,))
    s = jnp.where(do, 2.0 ** (jax.random.normal(ks[4], (n,)) * 1.0), 1.0)
    vv = jnp.outer(v[:3], v[:3])
    M3 = vv[None] + (jnp.eye(3)[None] - vv[None]) * s[:, None, None]
    M = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    M = M.at[:, :3, :3].set(M3)
    C = M @ C
    return C


def apply_color(images, C):
    n, h, w, c = images.shape
    rgb = jnp.concatenate([images, jnp.ones((n, h, w, 1))], -1)
    out = jnp.einsum("nij,nhwj->nhwi", C, rgb)
    return out[..., :3]


def augment(images, key, p):
    """Full ADA pipeline: geometric then color, each gated by p."""
    kg, kc = jax.random.split(key)
    n = images.shape[0]
    G = sample_affine_matrices(kg, n, p)
    out = apply_affine(images, G)
    if images.shape[-1] == 3:
        C = sample_color_matrices(kc, n, p)
        out = apply_color(out, C)
    return out


class AdaptiveAugment:
    """Drive p toward the r_t target (reference non_leaking.py:10-43)."""

    def __init__(self, ada_aug_target=0.6, ada_aug_len=500_000, update_every=256):
        self.ada_aug_target = ada_aug_target
        self.ada_aug_len = ada_aug_len
        self.update_every = update_every
        self.ada_update = 0
        self.ada_aug_buf = [0.0, 0.0]  # (sign sum, count)
        self.r_t_stat = 0.0
        self.ada_aug_p = 0.0

    def tune(self, real_pred_sign_sum, count):
        """Feed the (sum of sign(D(real)), count) pair — already psum'd
        across the mesh when data-parallel — once per D step."""
        self.ada_aug_buf[0] += float(real_pred_sign_sum)
        self.ada_aug_buf[1] += float(count)
        self.ada_update += 1
        if self.ada_update % self.update_every == 0:
            sign_sum, n = self.ada_aug_buf
            self.r_t_stat = sign_sum / max(n, 1)
            sign = 1 if self.r_t_stat > self.ada_aug_target else -1
            self.ada_aug_p += sign * n / self.ada_aug_len
            self.ada_aug_p = min(1.0, max(0.0, self.ada_aug_p))
            self.ada_aug_buf = [0.0, 0.0]
        return self.ada_aug_p
