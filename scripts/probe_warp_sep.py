"""A/B the warp kernels' separable fast path: identical shapes, coefs
either all-rotation (generic branch) or all-axis-aligned (separable
branch). The pl.when predication is per grid cell, so the delta is the
pure MXU saving of the factored contraction.

Run on the real chip: python scripts/probe_warp_sep.py [--size 256]
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


def bench(fn, *args, iters=5, warmup=2):
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
    ap.add_argument("--pad_frac", type=float, default=0.25)
    a = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    h, n, c = a.size, a.batch, 3
    pad = min(h - 1, int(a.pad_frac * h) + 6)
    s2 = 2 * (h + pad)
    win = 2 * h + 12
    print(f"h={h} n={n} s2={s2} win={win}", flush=True)

    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.normal(size=(n, s2, s2, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, win, win, c)), jnp.float32)
    th = 0.5
    rows = {
        "generic": [1.1 * np.cos(th), -1.1 * np.sin(th), s2 * 0.2,
                    1.1 * np.sin(th), 1.1 * np.cos(th), s2 * 0.2],
        "separable": [1.1, 0.0, s2 * 0.2, 0.0, 1.1, s2 * 0.2],
    }
    for name, row in rows.items():
        coef = jnp.asarray(np.stack([row] * n), jnp.float32)
        fwd = jax.jit(lambda x, cf: jnp.sum(
            affine_gather(x, cf, win, backend="pallas")))
        t_f = bench(fwd, x2, coef)
        grad = jax.jit(lambda x, cf: jnp.sum(jax.grad(
            lambda y: jnp.sum(affine_gather(y, cf, win,
                                            backend="pallas") * w))(x)))
        t_g = bench(grad, x2, coef)
        print(f"{name:10s} fwd {t_f*1e3:8.1f} ms   fwd+bwd {t_g*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
