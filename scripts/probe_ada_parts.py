"""Break down the antialiased ADA pipeline cost at 256px: reflect pad,
sym6 2x up-filter, bilinear affine gather, sym6 2x down-filter — fwd and
grad each — to find where the 286ms/1542ms (batch 16) actually goes."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.models.ada import SYM6, _bilinear_gather, sample_affine_matrices
from diagan_tpu.ops.upfirdn2d import upfirdn2d

B, H = 16, 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3)), jnp.float32)
key = jax.random.key(0)

k1 = np.asarray(SYM6, np.float32)
ky, kx = k1[:, None], k1[None, :]
kyf, kxf = ky[::-1], kx[:, ::-1]
pad_k = 6
P = min(H - 1, (3 * H) // 4 + pad_k)
S = H + 2 * P
win = 2 * H + 2 * pad_k


def timed(f, *args, iters=10):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def pad(img):
    return jnp.pad(img, ((0, 0), (P, P), (P, P), (0, 0)), mode="reflect")


def up(xp):
    t = upfirdn2d(xp, jnp.asarray(kyf), up=(1, 2), pad=(0, 0, pad_k, pad_k - 1))
    return upfirdn2d(t, jnp.asarray(kxf), up=(2, 1), pad=(pad_k, pad_k - 1, 0, 0))


def gather(x2, G):
    Ginv = jnp.linalg.inv(G)
    m0 = 2 * P - pad_k
    m = m0 + jnp.arange(win, dtype=jnp.float32)
    u = (m + 0.5 - 2 * P) / H - 1.0
    uy, ux = jnp.meshgrid(u, u, indexing="ij")
    grid = jnp.stack([ux, uy, jnp.ones_like(ux)], 0).reshape(3, -1)
    src = jnp.einsum("nij,jk->nik", Ginv, grid)
    qx = (src[:, 0] + 1.0) * H + 2 * P - 0.5
    qy = (src[:, 1] + 1.0) * H + 2 * P - 0.5
    return jax.vmap(_bilinear_gather)(x2, qy.reshape(B, win, win),
                                      qx.reshape(B, win, win))


def down(y):
    t = upfirdn2d(y, jnp.asarray(ky), down=(1, 2), pad=(0, 0, pad_k - 1, pad_k - 1))
    return upfirdn2d(t, jnp.asarray(kx), down=(2, 1), pad=(pad_k - 1, pad_k - 1, 0, 0))[:, 3:3 + H, 3:3 + H, :]


G = sample_affine_matrices(key, B, 0.3, H, H)
xp = jax.jit(pad)(x)
x2 = jax.jit(up)(xp)
y = jax.jit(lambda a, b: gather(a, b))(x2, G)

print(f"shapes: xp {xp.shape} x2 {x2.shape} y {y.shape}")
for name, f, args in (
    ("pad", pad, (x,)),
    ("up", up, (xp,)),
    ("gather", lambda a: gather(a, G), (x2,)),
    ("down", down, (y,)),
):
    jf = jax.jit(f)
    ms_f = timed(jf, *args)
    jg = jax.jit(jax.grad(lambda *a: f(*a).sum()))
    ms_g = timed(jg, *args)
    print(f"{name:8s} fwd {ms_f:7.1f} ms   grad {ms_g:7.1f} ms")
