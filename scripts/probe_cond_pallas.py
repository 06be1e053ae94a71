"""Isolate the fused-chunk TPU worker crash: ADA augment inside
lax.cond inside lax.scan, with the run branch TAKEN at runtime.

Evidence so far (docs/VALIDATION.md round 3): the fused StyleGAN2-256
chunk ran the augment kernels fine pre-p0-skip (no cond, identity
transforms), and the unfused path runs them fine at p > 0 — but the
fused chunk crashes the worker ("kernel fault") on the first chunk whose
runtime p > 0, with BOTH the interleaved and polyphase warp kernels.

Each case runs the augment at FFHQ-256 shapes (batch as given):
  scan_direct  — scan body calls augment unconditionally
  scan_cond    — scan body wraps augment in lax.cond(p > 0, ...)
  cond_only    — single cond, no scan
  scan_cond_grad — like scan_cond but through jax.grad (the G-step path)

Run ONE case per process (a worker crash poisons the client):
  /opt/venv/bin/python scripts/probe_cond_pallas.py scan_cond --batch 16
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.models.ada import augment


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("case", choices=["scan_direct", "scan_cond", "cond_only",
                                     "scan_cond_grad", "scan_nested"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--p", type=float, default=0.01)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    imgs = jnp.asarray(rng.normal(size=(args.batch, args.size, args.size, 3)),
                       dt)

    def aug_direct(x, key, p):
        # augment() itself owns the cond; bypass it by calling the guts
        from diagan_tpu.models.ada import (apply_affine, apply_color,
                                           sample_affine_matrices,
                                           sample_color_matrices)
        kg, kc = jax.random.split(key)
        n, h, w, _ = x.shape
        G = sample_affine_matrices(kg, n, p, h, w)
        out = apply_affine(x, G)
        C = sample_color_matrices(kc, n, p)
        return apply_color(out, C)

    p = jnp.float32(args.p)

    if args.case == "cond_only":
        f = jax.jit(lambda x, k: augment(x, k, p))
        out = f(imgs, jax.random.key(1))
        print("cond_only sum:", float(jnp.sum(out)))
        return

    def body_direct(c, k):
        return c + 0.0 * jnp.mean(aug_direct(imgs, k, p)), None

    def body_cond(c, k):
        return c + 0.0 * jnp.mean(augment(imgs, k, p)), None

    body = body_direct if args.case == "scan_direct" else body_cond
    keys = jax.random.split(jax.random.key(2), args.steps)

    if args.case == "scan_cond_grad":
        def loss(x):
            def body(c, k):
                return c + jnp.mean(augment(x, k, p)), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
            return out
        g = jax.jit(jax.grad(loss))(imgs)
        print("grad sum:", float(jnp.sum(g)))
        return

    if args.case == "scan_nested":
        # augment's own p>0 cond NESTED inside a lazy-reg-style cond,
        # inside the scan, through grad — the fused chunk's structure
        def body(c, sk):
            i, k = sk

            def with_reg(x):
                return jnp.mean(jax.grad(
                    lambda y: jnp.sum(augment(y, k, p) ** 2))(x))

            def no_reg(x):
                return jnp.float32(0.0)

            r = jax.lax.cond(i % 2 == 0, with_reg, no_reg, imgs)
            return c + r, None

        f = jax.jit(lambda: jax.lax.scan(
            body, jnp.float32(0.0),
            (jnp.arange(args.steps, dtype=jnp.int32), keys))[0])
        print("scan_nested sum:", float(f()))
        return

    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), keys)[0])
    out = f()
    print(f"{args.case} sum:", float(out))


if __name__ == "__main__":
    main()
