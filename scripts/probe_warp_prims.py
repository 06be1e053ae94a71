"""Probe warp primitives on TPU at ADA-256 sizes.

(a) the current 2-D bilinear gather (fwd + autodiff grad = XLA scatter);
(b) a per-row 1-D 2-tap interpolation along the lane axis — the shear
    building block. Its ADJOINT is another shear (the 1-D linear-interp
    shift matrix's transpose is the shift by -t), so a shear-decomposed
    warp needs NO scatter anywhere: bwd cost == fwd cost. What matters
    here is therefore only the 1-D gather FORWARD cost.
Memory note: take_along_axis indices are kept at (B, S, S, 1) — an earlier
broadcast-to-(B,S,S,3) version pushed the compile-time HBM estimate to 26G.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, S = 16, 1304          # upsampled buffer size in the ADA pipeline
W = 524                  # gather window
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(-1, 1, (B, S, S, 3)), jnp.float32)


def timed(f, *args, iters=10):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


# (a) current 2-D bilinear gather at affine coords
from diagan_tpu.models.ada import _bilinear_gather

A = jnp.asarray(rng.normal(0, 0.3, (B, 2, 3)) + np.array([[1, 0, 0], [0, 1, 0]]),
                jnp.float32)
ii, jj = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                      jnp.arange(W, dtype=jnp.float32), indexing="ij")


def warp2d(img4):
    qy = A[:, 0, 0, None, None] * ii + A[:, 0, 1, None, None] * jj + 400.0
    qx = A[:, 1, 0, None, None] * ii + A[:, 1, 1, None, None] * jj + 400.0
    return jax.vmap(_bilinear_gather)(img4, qy, qx)


# (b) per-row 1-D 2-tap interp along x (shear building block)
t_y = jnp.asarray(rng.uniform(-40, 40, (B, S)), jnp.float32)


def shear_rows(img4):
    n, h, w, c = img4.shape
    base = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    q = base + t_y[:, :, None]
    k = jnp.clip(jnp.floor(q), 0, w - 2).astype(jnp.int32)
    f = (q - k)[..., None]
    idx = k[..., None]                      # (B, S, S, 1): no broadcast
    a = jnp.take_along_axis(img4, idx, axis=2)
    b = jnp.take_along_axis(img4, idx + 1, axis=2)
    return a * (1 - f) + b * f


# (c) same shear via one gather + in-register shift (cheaper: reuse a)
def shear_rows_1g(img4):
    n, h, w, c = img4.shape
    base = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    q = base + t_y[:, :, None]
    k = jnp.clip(jnp.floor(q), 0, w - 2).astype(jnp.int32)
    f = (q - k)[..., None]
    a = jnp.take_along_axis(img4, k[..., None], axis=2)
    a1 = jnp.take_along_axis(img4, (k + 1)[..., None], axis=2)
    return a + f * (a1 - a)


if __name__ == "__main__":
    for name, f in (("2d-gather", warp2d),
                    ("1d-shear", shear_rows),
                    ("1d-shear-fma", shear_rows_1g)):
        jf = jax.jit(f)
        ms_f = timed(jf, x)
        print(f"{name:14s} fwd {ms_f:7.1f} ms", flush=True)
    jg = jax.jit(jax.grad(lambda a: warp2d(a).sum()))
    print(f"2d-gather grad {timed(jg, x):7.1f} ms (XLA scatter)", flush=True)
