"""Probe: decompose the amortized lazy-R1/path-reg cost in the fused
StyleGAN2-256 step (VERDICT r4 weak #6: 26.8 ms/step was attributed to
the in-scan regularizer conditionals; cut it or prove it irreducible).

Three bench-identical fused chunks (size 256, batch 16, bf16, p=0,
25-step dispatch) differing only in the regularizer structure:

  A. reference schedule   — lax.cond R1/16 + path/4 (the shipped step)
  B. conds-never-fire     — same program, reg_every=10**9: the branch is
                            compiled in but never taken. A - B isolates
                            the INTRINSIC reg work (the fires).
  C. conds-absent         — reg_every=0: no cond in the program at all.
                            B - C isolates the DEAD-BRANCH cost of a
                            cond inside lax.scan (scheduling/fusion
                            barriers, branch dispatch).

If B ~ C the 26.8 ms is real regularizer flops (irreducible without
changing the algorithm); if B >> C the cond structure itself is the fat
and a statically-positioned segment restructure pays.

Usage: python scripts/probe_reg_cost.py [--steps 25] [--size 256]
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


def measure(size, batch, steps, d_reg_every, g_reg_every, label):
    from diagan_tpu.models.stylegan2 import (
        StyleGAN2Discriminator,
        StyleGAN2Generator,
    )
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(
        0, 255, (512, size, size, 3), np.uint8)
    tr = StyleGAN2Trainer(
        "/tmp/probe_reg_cost",
        StyleGAN2Generator(size=size, dtype=jnp.bfloat16),
        StyleGAN2Discriminator(size=size, dtype=jnp.bfloat16),
        imgs, num_steps=steps, batch_size=batch,
        log_every=steps, save_every=10**9, seed=0,
        augment_p=0.0, max_chunk=steps,
        d_reg_every=d_reg_every, g_reg_every=g_reg_every,
    )
    chunk = tr._chunk_for(steps)
    args = (tr.g_state, tr.d_state, tr.d_drs_state, tr.g_ema, tr.pl_mean,
            jax.random.key(7), jnp.float32(0.0), jnp.int32(steps),
            tr.images)
    res = chunk(*args)  # compile + warm
    np.asarray(res[-1]["d"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = chunk(*args)
        np.asarray(res[-1]["d"])
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"{label:24s} d_reg={d_reg_every:<10} g_reg={g_reg_every:<10} "
          f"{best * 1000:7.1f} ms/step", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=25)
    a = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    big = 10**9
    t_a = measure(a.size, a.batch, a.steps, 16, 4, "A reference-schedule")
    t_b = measure(a.size, a.batch, a.steps, big, big, "B conds-never-fire")
    t_c = measure(a.size, a.batch, a.steps, 0, 0, "C conds-absent")
    print(f"\nintrinsic reg fires (A-B): {(t_a - t_b) * 1000:6.1f} ms/step")
    print(f"dead-branch cond cost (B-C): {(t_b - t_c) * 1000:6.1f} ms/step")
    print(f"total reg overhead (A-C): {(t_a - t_c) * 1000:6.1f} ms/step")


if __name__ == "__main__":
    main()
