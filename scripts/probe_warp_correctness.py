"""On-hardware adjoint check: Pallas warp backward vs XLA autodiff.

The CPU interpret-mode tests (tests/test_warp_pallas.py) pin the math; this
probe repeats the comparison on the real chip at FFHQ-256 shapes, where
Mosaic lowering (DMA alignment, fp32 matmul path) could in principle
diverge from the interpreter.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.ops.warp_pallas import affine_gather


def main():
    h = 256
    pad = min(h - 1, int(0.75 * h) + 6)
    s2 = 2 * (h + pad)
    win = 2 * h + 12
    n, c = 5, 3
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.normal(size=(n, s2, s2, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, win, win, c)), jnp.float32)
    th = 0.6
    rows = [
        [1.0, 0.0, 0.0, 0.0, 1.0, 0.0],                       # identity-ish
        [1.3 * np.cos(th), -1.3 * np.sin(th), s2 * 0.18,
         1.3 * np.sin(th), 1.3 * np.cos(th), s2 * 0.14],      # rot+scale
        [0.45, 0.03, s2 * 0.3, -0.03, 0.45, s2 * 0.3],        # shrink
        [1.0, 0.0, 30.0, 0.0, -1.05, float(s2) - 40.0],       # flip + clip
        [0.45, 0.0, s2 * 0.3, 0.0, 0.45, s2 * 0.31],          # separable
        # fractional scale (exercises the rank-32 fast path with
        # non-trivial hat weights)
    ]
    coef = jnp.asarray(np.stack(rows), jnp.float32)

    grads = {}
    for backend in ("xla", "pallas"):
        f = jax.jit(lambda x, b=backend: jax.grad(
            lambda y: jnp.sum(affine_gather(y, coef, win, backend=b) * w))(x))
        t0 = time.perf_counter()
        grads[backend] = np.asarray(f(x2))
        print(f"{backend}: {time.perf_counter() - t0:.1f}s (incl compile)",
              flush=True)
    gx, gp = grads["xla"], grads["pallas"]
    err = np.abs(gx - gp)
    denom = np.abs(gx).max()
    print(f"max abs diff {err.max():.3e}  rel {err.max() / denom:.3e}  "
          f"norm_x {np.linalg.norm(gx):.4f} norm_p {np.linalg.norm(gp):.4f}")
    ok = err.max() / denom < 1e-4
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
