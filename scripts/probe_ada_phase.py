"""On-hardware validation + timing for the polyphase ADA resample.

1. Correctness: the 2-phase Pallas gather/scatter (ops/ada_phase.py) vs
   the XLA phase oracle, on-device (the Mosaic lowering rules interpret
   mode cannot check — .claude/skills/verify/SKILL.md).
2. Timing: full `apply_affine` fwd and fwd+grad, interleaved (round-2
   path) vs polyphase, at FFHQ-256 shapes (batch 16).

Usage: /opt/venv/bin/python scripts/probe_ada_phase.py [--sizes 256]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.models.ada import apply_affine, sample_affine_matrices
from diagan_tpu.ops.ada_phase import affine_gather_2phase


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)  # block_until_ready is unreliable on axon


def correctness():
    rng = np.random.default_rng(5)
    n, c, s, win = 2, 3, 128, 60
    s2 = 2 * s
    srp, slp = s, -(-s2 // 128) * 128
    v0 = np.zeros((n, c, srp, slp), np.float32)
    v1 = np.zeros((n, c, srp, slp), np.float32)
    v0[:, :, :s, :s2] = rng.normal(size=(n, c, s, s2))
    v1[:, :, :s, :s2] = rng.normal(size=(n, c, s, s2))
    v0, v1 = jnp.asarray(v0), jnp.asarray(v1)
    th = 0.5
    case = [1.2 * np.cos(th), -1.2 * np.sin(th), 40.0,
            1.2 * np.sin(th), 1.2 * np.cos(th), 30.0]
    coef = jnp.asarray(np.stack([case] * n), jnp.float32)
    w = [jnp.asarray(rng.normal(size=(n, win // 2, win // 2, c)),
                     jnp.float32) for _ in range(4)]

    def loss(a, b, backend):
        ys = affine_gather_2phase(a, b, coef, win, s2, backend=backend)
        return sum(jnp.sum(y * wi) for y, wi in zip(ys, w))

    ys_x = affine_gather_2phase(v0, v1, coef, win, s2, backend="xla")
    ys_p = affine_gather_2phase(v0, v1, coef, win, s2, backend="pallas")
    for i, (ax_, ap) in enumerate(zip(ys_x, ys_p)):
        err = float(jnp.max(jnp.abs(ax_ - ap)) / jnp.max(jnp.abs(ax_)))
        print(f"fwd phase {i}: rel err {err:.2e}")
        assert err < 1e-4, "forward mismatch"
    gx = jax.grad(lambda a, b: loss(a, b, "xla"), argnums=(0, 1))(v0, v1)
    gp = jax.grad(lambda a, b: loss(a, b, "pallas"), argnums=(0, 1))(v0, v1)
    for i, (ax_, ap) in enumerate(zip(gx, gp)):
        denom = float(jnp.max(jnp.abs(ax_)))
        err = float(jnp.max(jnp.abs(ax_ - ap))) / max(denom, 1e-30)
        print(f"bwd phase {i}: rel err {err:.2e}")
        assert err < 1e-4, "backward mismatch"
    print("correctness OK")


def timing(h, n=16, iters=20):
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.normal(size=(n, h, h, 3)), jnp.float32)
    G = sample_affine_matrices(jax.random.PRNGKey(2), n, 0.5, h, h)
    w = jnp.asarray(rng.normal(size=(n, h, h, 3)), jnp.float32)

    for poly in (False, True):
        fwd = jax.jit(lambda x: apply_affine(x, G, polyphase=poly))
        grad = jax.jit(jax.grad(
            lambda x: jnp.sum(apply_affine(x, G, polyphase=poly) * w)))
        sync(fwd(imgs))
        sync(grad(imgs))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(imgs)
        sync(out)
        t_f = (time.perf_counter() - t0) / iters * 1e3
        t0 = time.perf_counter()
        for _ in range(iters):
            g = grad(imgs)
        sync(g)
        t_g = (time.perf_counter() - t0) / iters * 1e3
        name = "polyphase" if poly else "interleaved"
        print(f"{name:12s} {h}px: fwd {t_f:7.1f} ms  fwd+grad {t_g:7.1f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[256])
    ap.add_argument("--skip_timing", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    correctness()
    if not args.skip_timing:
        for hh in args.sizes:
            timing(hh)
