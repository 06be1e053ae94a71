"""Measure the ADA affine-warp backward: Pallas scatter-as-matmul vs XLA.

Round-2 baseline on the v5e (docs/ROADMAP.md 3b): at FFHQ-256 shapes the
2-D bilinear gather forward costs ~398 ms and its XLA autodiff scatter
~2738 ms. This probe times ops/warp_pallas.affine_gather's forward and
backward on both backends at the same shapes, plus the full antialiased
augment gradient, to validate the kernel on hardware.

Run on the real chip (no args): python scripts/probe_warp_kernel.py
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.ops.warp_pallas import affine_gather
from diagan_tpu.models import ada


def bench(fn, *args, iters=5, warmup=2):
    # axon gotcha: block_until_ready is unreliable — sync via a (tiny)
    # device->host transfer; fn must return a scalar so d2h is 4 bytes
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pad_frac", type=float, default=0.75)
    args = ap.parse_args()

    h = args.size
    n = args.batch
    c = 3
    pad_k = 6
    p_pad = min(h - 1, int(args.pad_frac * h) + pad_k)
    s2 = 2 * (h + p_pad)
    win = 2 * h + 2 * pad_k
    print(f"backend={jax.default_backend()} h={h} n={n} s2={s2} win={win}")

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.normal(size=(n, s2, s2, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, win, win, c)), jnp.float32)
    th = 0.5
    row = [1.3 * np.cos(th), -1.3 * np.sin(th), s2 * 0.2,
           1.3 * np.sin(th), 1.3 * np.cos(th), s2 * 0.2]
    coef = jnp.asarray(np.stack([row] * n), jnp.float32)

    for backend in ("xla", "pallas"):
        fwd = jax.jit(
            lambda x, b=backend: jnp.sum(affine_gather(x, coef, win, backend=b)))
        t_f = bench(fwd, x2)
        grad = jax.jit(lambda x, b=backend: jnp.sum(jax.grad(
            lambda y: jnp.sum(affine_gather(y, coef, win, backend=b) * w))(x)))
        t_g = bench(grad, x2)
        print(f"{backend:6s} warp fwd {t_f*1e3:8.1f} ms   fwd+bwd {t_g*1e3:8.1f} ms",
              flush=True)

    # full ADA pipeline gradient (what the G step pays per augment call)
    imgs = jnp.asarray(rng.normal(size=(n, h, h, c)), jnp.float32)
    key = jax.random.PRNGKey(0)
    from diagan_tpu.ops import warp_pallas
    for backend in ("xla", "pallas"):
        warp_pallas.set_backend(backend)
        aug_f = jax.jit(lambda x: jnp.sum(
            ada.augment(x, key, p=0.5, pad_frac=args.pad_frac)))
        t_f = bench(aug_f, imgs, iters=3)
        aug_g = jax.jit(lambda x: jnp.sum(jax.grad(lambda y: jnp.sum(jnp.tanh(
            ada.augment(y, key, p=0.5, pad_frac=args.pad_frac))))(x)))
        t = bench(aug_g, imgs, iters=3)
        print(f"{backend:6s} augment fwd {t_f*1e3:8.1f} ms   "
              f"fwd+bwd {t*1e3:8.1f} ms", flush=True)
    warp_pallas.set_backend("auto")


if __name__ == "__main__":
    main()
