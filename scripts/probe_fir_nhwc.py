"""Probe: flattened (N,H,W*C) Pallas FIR vs the round-4 NHWC-native
kernel at the StyleGAN2-256 blur shapes (VERDICT r3 item 1).

Measures forward and forward+backward wall time per call over a scanned
loop (sync via device->host transfer; see verify skill). Shapes are the
real call sites logged from a 256px G/D forward at batch 16.

Run: timeout 900 /opt/venv/bin/python scripts/probe_fir_nhwc.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.ops import fir_pallas as FP
from diagan_tpu.ops.upfirdn2d import make_resample_kernel

# (h, w, c, pad) — biggest SG2-256 blur call sites (bf16, batch 16)
SHAPES = [
    (259, 259, 64, (1, 1)),    # G final upsample blur (c=64: pair path)
    (131, 131, 128, (1, 1)),   # G 128px upsample blur
    (256, 256, 128, (2, 2)),   # D 256px blur pre-downsample
    (128, 128, 256, (2, 2)),   # D 128px blur
    (67, 67, 256, (1, 1)),     # G 64px
    (64, 64, 512, (2, 2)),     # D 64px
]
ITERS = 30


def bench(fn, x):
    # iteration-dependent input defeats XLA's loop-invariant hoisting;
    # the extra scale multiply is identical for both paths under A/B
    @jax.jit
    def loop(x):
        def body(c, i):
            y = fn(c * (1.0 + 1e-6 * i.astype(x.dtype)))
            return c, jnp.sum(y[0, 0, :, 0])

        _, s = jax.lax.scan(body, x, jnp.arange(ITERS))
        return s

    s = loop(x)
    np.asarray(s)
    t0 = time.perf_counter()
    s = loop(x)
    np.asarray(s)
    return (time.perf_counter() - t0) / ITERS * 1000


def bench_grad(fn, x):
    @jax.jit
    def loop(x):
        def body(c, i):
            g = jax.grad(lambda z: jnp.sum(fn(z) ** 2))(
                c * (1.0 + 1e-6 * i.astype(x.dtype)))
            return c, jnp.sum(g[0, 0, :, 0])

        _, s = jax.lax.scan(body, x, jnp.arange(ITERS))
        return s

    s = loop(x)
    np.asarray(s)
    t0 = time.perf_counter()
    s = loop(x)
    np.asarray(s)
    return (time.perf_counter() - t0) / ITERS * 1000


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    k = make_resample_kernel([1, 3, 3, 1]) * 1.0
    rng = np.random.default_rng(0)
    for h, w, c, pad in SHAPES:
        x = jnp.asarray(
            rng.normal(size=(16, h, w, c)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def call(z):
            return FP.upfirdn2d_pallas(z, k, up=1, down=1, pad=pad)

        # correctness first (flattened as reference)
        FP.FORCE_FLAT = True
        a = np.asarray(call(x), np.float32)
        FP.FORCE_FLAT = False
        b = np.asarray(call(x), np.float32)
        err = np.abs(a - b).max()
        row = f"({h:3d},{w:3d},{c:3d}) pad{pad}: err {err:.2e}"
        try:
            # distinct closures -> distinct jit cache entries; the global
            # is read at trace time inside each
            FP.FORCE_FLAT = True
            t_old = bench(lambda z: call(z), x)
            g_old = bench_grad(lambda z: call(z), x)
            FP.FORCE_FLAT = False
            t_new = bench(lambda z: call(z), x)
            g_new = bench_grad(lambda z: call(z), x)
            row += (f"  fwd {t_old:7.2f} -> {t_new:7.2f} ms"
                    f"  fwd+bwd {g_old:7.2f} -> {g_new:7.2f} ms")
        except Exception as e:
            row += f"  BENCH FAIL {type(e).__name__}: {str(e)[:120]}"
        finally:
            FP.FORCE_FLAT = False
        print(row, flush=True)


if __name__ == "__main__":
    main()
