"""Probe: honest amortized FLOPs/step for the StyleGAN2-256 bench.

The fused chunk folds lazy R1 (every 16) and path-reg (every 4) into the
scan body via lax.cond. XLA's cost_analysis picks the HEAVY branch of a
cond (verified: cond(heavy, light) reports heavy's flops), so the chunk
body's flops describe a step where BOTH regularizers fire — an upper
bound, not the amortized average. This probe lowers each UNFUSED program
(d, drs, g, d_r1, drs_r1, path) separately and prints the honest
amortized figure:

    amortized = d + drs + g + (d_r1 + drs_r1)/16 + path/4

Usage: python scripts/probe_sg2_flops_split.py [--size 256] [--batch 16]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def flops_of(jitfn, *args):
    ca = jitfn.lower(*args).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default=256, type=int)
    p.add_argument("--batch", default=16, type=int)
    args = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from diagan_tpu.models.stylegan2 import (
        StyleGAN2Discriminator,
        StyleGAN2Generator,
    )
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(
        0, 255, (64, args.size, args.size, 3), np.uint8)
    tr = StyleGAN2Trainer(
        "/tmp/probe_sg2_split",
        StyleGAN2Generator(size=args.size, dtype=jnp.bfloat16),
        StyleGAN2Discriminator(size=args.size, dtype=jnp.bfloat16),
        imgs, num_steps=1, batch_size=args.batch,
        log_every=1, save_every=10**9, seed=0, fuse_steps=False,
    )
    k = jax.random.key(0)
    f = {}
    f["d"] = flops_of(tr._variant(tr._aug_live())["uf"]["d"], tr.d_state, tr.g_state.params, k,
                      tr.ada_aug_p, tr.images)
    f["drs"] = (flops_of(tr._variant(tr._aug_live())["uf"]["drs"], tr.d_drs_state, tr.g_state.params,
                         k, tr.ada_aug_p, tr.images)
                if tr._variant(tr._aug_live())["uf"]["drs"] is not None else 0.0)
    f["d_r1"] = flops_of(tr._variant(tr._aug_live())["uf"]["d_r1"], tr.d_state, k, tr.ada_aug_p,
                         tr.images)
    f["drs_r1"] = (flops_of(tr._variant(tr._aug_live())["uf"]["drs_r1"], tr.d_drs_state, k,
                            tr.ada_aug_p, tr.images)
                   if tr._variant(tr._aug_live())["uf"]["drs_r1"] is not None else 0.0)
    f["g"] = flops_of(tr._variant(tr._aug_live())["uf"]["g"], tr.g_state, tr.g_ema, tr.d_state.params,
                      k, tr.ada_aug_p)
    f["path"] = flops_of(tr._variant(tr._aug_live())["uf"]["path"], tr.g_state, tr.g_ema, k, tr.pl_mean)

    for n, v in f.items():
        print(f"{n:8s} {v/1e9:10.1f} GFLOP")
    every = f["d"] + f["drs"] + f["g"]
    amort = (every + (f["d_r1"] + f["drs_r1"]) / tr.d_reg_every
             + f["path"] / tr.g_reg_every)
    upper = every + f["d_r1"] + f["drs_r1"] + f["path"]
    print(f"\nevery-step programs:      {every/1e9:10.1f} GFLOP")
    print(f"amortized (r1/16, path/4): {amort/1e9:10.1f} GFLOP/step")
    print(f"both-regs upper bound:     {upper/1e9:10.1f} GFLOP/step "
          f"(what the fused chunk body reports)")
    print(f"amortized/upper ratio:     {amort/upper:.4f}")


if __name__ == "__main__":
    main()
