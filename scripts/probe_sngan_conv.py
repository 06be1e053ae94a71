"""Probe: per-op conv efficiency for the SNGAN-32 training shapes.

The headline bench runs at ~1.4% of the v5e bf16 peak (BASELINE.md) with a
gap-free device timeline, so the bound is per-op efficiency, not
scheduling. This probe isolates every conv shape the SNGAN-32 fused step
actually executes (fwd and fwd+bwd, fp32 and bf16) and reports achieved
TFLOP/s against XLA's own cost analysis — answering whether a custom
Pallas conv has headroom to win (if XLA already runs these shapes near
the fp32 MXU rate, the workload is op-shape-bound and the 1.4% stands).

Usage: python scripts/probe_sngan_conv.py [--iters 50]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# (name, N, H, W, Cin, Cout, k, stride) — the SNGAN-32 conv inventory
# (models/sngan.py: G = 3 GBlocks at 256ch with nearest-up then 3x3+3x3,
# D = DBlockOptimized(3->128)@32 + DBlock(128)@16/8/8), batch 64.
SHAPES = [
    ("G up8->8  3x3 256",  64,  8,  8, 256, 256, 3, 1),
    ("G up16    3x3 256",  64, 16, 16, 256, 256, 3, 1),
    ("G up32    3x3 256",  64, 32, 32, 256, 256, 3, 1),
    ("G toRGB   3x3 3",    64, 32, 32, 256,   3, 3, 1),
    ("D opt     3x3 128",  64, 32, 32,   3, 128, 3, 1),
    ("D b16     3x3 128",  64, 16, 16, 128, 128, 3, 1),
    ("D b8      3x3 128",  64,  8,  8, 128, 128, 3, 1),
    ("D b8 big  3x3 128x5", 320, 8, 8, 128, 128, 3, 1),  # 5 n_dis batches fused
]


def _conv_xla(x, w, stride, pad):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_im2col(x, w, stride, pad):
    """3x3 SAME conv as 9 shifted slices + one (N*H*W, 9*Cin)x(9*Cin, Cout)
    dot — tests whether XLA's dot lowering beats its conv lowering on
    these small-spatial shapes (the MXU path is the same; only the
    tiling strategy differs)."""
    k = w.shape[0]
    assert stride == 1
    n, h, wd, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    cols = [
        xp[:, dy:dy + h, dx:dx + wd, :]
        for dy in range(k) for dx in range(k)
    ]
    patches = jnp.concatenate(cols, axis=-1)          # (N,H,W,k*k*Cin)
    return jnp.einsum(
        "nhwp,po->nhwo", patches, w.reshape(-1, w.shape[-1]),
        precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )


def bench_conv(N, H, W, Cin, Cout, k, stride, dtype, iters, with_bwd,
               impl="xla"):
    pad = k // 2
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, H, W, Cin)), dtype)
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((k, k, Cin, Cout)) * 0.05,
        dtype)

    base = _conv_xla if impl == "xla" else _conv_im2col

    def conv(x, w):
        return base(x, w, stride, pad)

    # DCE-proofing (v2 — v1 consumed output SLICES and XLA narrowed the
    # conv to the slice, reporting 0.00 GFLOP): reduce the FULL tensors
    # through a square (nonlinear, so reduce(conv) can't be algebraically
    # pushed through the conv), and consume both grads fully.
    if with_bwd:
        def one(x, w):
            def loss(x, w):
                return jnp.sum(conv(x, w) ** 2)

            gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
            return jnp.sum(gx * gx) + jnp.sum(gw * gw)
    else:
        def one(x, w):
            y = conv(x, w)
            return jnp.sum(y * y)

    @jax.jit
    def run(x, w):
        def body(c, _):
            # data-dependent perturbation: without it XLA hoists the
            # loop-invariant conv out of the scan and computes it once
            xi = x.at[0, 0, 0, 0].add(c)
            return one(xi, w).astype(x.dtype), None

        acc, _ = lax.scan(
            body, jnp.zeros((), x.dtype) + jnp.asarray(1e-6, x.dtype),
            None, length=iters,
        )
        return acc

    ca = run.lower(x, w).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca["flops"]) / iters
    # analytic conv MACs as a cross-check (2*N*OH*OW*k*k*Cin*Cout per conv
    # pass; bwd = dgrad + wgrad ~ 3x fwd) — if the cost analysis reports
    # far less, XLA eliminated work and the timing is not a conv timing
    oh, ow = H // stride, W // stride
    conv_flops = 2.0 * N * oh * ow * k * k * Cin * Cout
    analytic = conv_flops * (3.0 if with_bwd else 1.0)
    if flops < 0.5 * analytic:
        print(f"    WARN cost-analysis {flops/1e9:.2f} GFLOP << analytic "
              f"{analytic/1e9:.2f} — DCE suspected", flush=True)
    flops = max(flops, analytic)

    np.asarray(run(x, w))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(x, w))
    dt = (time.perf_counter() - t0) / iters
    return dt, flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default=50, type=int)
    args = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print(f"device: {jax.devices()[0].device_kind}")

    for dtype in (jnp.float32, jnp.bfloat16):
        for with_bwd in (False, True):
            for impl in ("xla", "im2col"):
                tag = (f"{jnp.dtype(dtype).name} "
                       f"{'fwd+bwd' if with_bwd else 'fwd'} [{impl}]")
                print(f"\n== {tag} ==")
                for name, N, H, W, Cin, Cout, k, stride in SHAPES:
                    if impl == "im2col" and stride != 1:
                        continue
                    try:
                        dt, flops = bench_conv(
                            N, H, W, Cin, Cout, k, stride, dtype,
                            args.iters, with_bwd, impl,
                        )
                        print(f"{name:22s} {dt*1e6:8.0f} us  "
                              f"{flops/1e9:7.2f} GFLOP  "
                              f"{flops/dt/1e12:6.2f} TFLOP/s", flush=True)
                    except Exception as e:  # noqa: BLE001
                        print(f"{name:22s} FAILED {type(e).__name__}: "
                              f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
