"""Probe: StyleGAN2 full-step throughput vs batch/size with and without
remat (jax.checkpoint around the G/D applies) on real hardware.

Each config trains a short chunk (log_every steps) twice: the first
timed region includes compile; the second is the steady-state number.

Usage: python scripts/probe_remat.py [--size 256] [--batches 16,32,64]
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


def probe(size, batch, remat, bf16, steps=20):
    from diagan_tpu.models.stylegan2 import (
        StyleGAN2Discriminator,
        StyleGAN2Generator,
    )
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    imgs = np.random.default_rng(0).integers(
        0, 255, (512, size, size, 3), np.uint8
    )
    tr = StyleGAN2Trainer(
        f"/tmp/probe_remat/{size}_{batch}_{remat}",
        StyleGAN2Generator(size=size, dtype=dtype, remat=remat),
        StyleGAN2Discriminator(size=size, dtype=dtype, remat=remat),
        imgs, num_steps=3 * steps, batch_size=batch,
        log_every=steps, save_every=10**9, seed=0,
    )
    try:
        t0 = time.perf_counter()
        tr.train(start_step=0)
        t_total = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001 — OOM probes report and move on
        return None, f"{type(e).__name__}: {str(e)[:120]}"
    # steady state: retime the last chunk-shape program
    key = jax.random.key(7)
    t0 = time.perf_counter()
    out = tr._chunk_for(steps)(
        tr.g_state, tr.d_state, tr.d_drs_state, tr.g_ema, tr.pl_mean,
        key, tr.ada_aug_p, jnp.int32(steps), tr.images,
    )
    np.asarray(out[-1]["d"])
    dt = (time.perf_counter() - t0) / steps
    return dt, f"total(3x{steps} steps incl compile) {t_total:.1f}s"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default=256, type=int)
    p.add_argument("--batches", default="16,32,64", type=str)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--steps", default=20, type=int)
    args = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    for batch in [int(b) for b in args.batches.split(",")]:
        for remat in (False, True):
            dt, note = probe(args.size, batch, remat, not args.fp32,
                             steps=args.steps)
            tag = f"size={args.size} batch={batch} remat={int(remat)}"
            if dt is None:
                print(f"{tag}: FAILED ({note})", flush=True)
            else:
                print(f"{tag}: {dt * 1000:.0f} ms/step "
                      f"({batch / dt:.1f} img/s) [{note}]", flush=True)


if __name__ == "__main__":
    main()
