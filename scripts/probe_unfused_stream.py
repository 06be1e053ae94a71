"""Probe: StyleGAN2 throughput in the unfused per-piece dispatch mode with
host-streamed data, on real hardware — the fallback for the configs whose
fused scan program the remote compile service rejects (256px batch>=64,
1024px batch>=8; docs/VALIDATION.md).

Each config trains 2 chunks through the real train() loop (first includes
compile of the ~4 piece programs), then retimes a steady-state chunk via
_run_unfused directly.

Usage: python scripts/probe_unfused_stream.py --size 256 --batches 64,128
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


def probe(size, batch, bf16, steps, drs, remat=False):
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
        f"/tmp/probe_ufs/{size}_{batch}",
        StyleGAN2Generator(size=size, dtype=dtype, remat=remat),
        StyleGAN2Discriminator(size=size, dtype=dtype, remat=remat),
        imgs, num_steps=2 * steps, batch_size=batch,
        log_every=steps, save_every=10**9, seed=0,
        fuse_steps=False, stream_data=True,
        sample_weights=np.linspace(0.5, 2.0, len(imgs)),
        drs_disc=StyleGAN2Discriminator(size=size, dtype=dtype, remat=remat)
        if drs else None,
    )
    assert tr.stream and not tr.fuse
    try:
        t0 = time.perf_counter()
        tr.train(start_step=0)
        t_total = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001 — boundary probes report and move on
        return None, f"{type(e).__name__}: {str(e)[:160]}"
    key = jax.random.key(7)
    t0 = time.perf_counter()
    ms = tr._run_unfused(key, 2 * steps, steps)
    np.asarray(ms["d"])  # sync point (block_until_ready unreliable on axon)
    dt = (time.perf_counter() - t0) / steps
    return dt, f"total(2x{steps} steps incl compile) {t_total:.1f}s"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default=256, type=int)
    p.add_argument("--batches", default="64", type=str)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--steps", default=8, type=int)
    p.add_argument("--drs", action="store_true")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    for batch in [int(b) for b in args.batches.split(",")]:
        dt, note = probe(args.size, batch, not args.fp32, args.steps,
                         args.drs, args.remat)
        tag = (f"size={args.size} batch={batch} unfused+stream"
               + ("+remat" if args.remat else "")
               + ("+drs" if args.drs else ""))
        if dt is None:
            print(f"{tag}: FAILED ({note})", flush=True)
        else:
            print(f"{tag}: {dt * 1000:.0f} ms/step "
                  f"({batch / dt:.1f} img/s) [{note}]", flush=True)


if __name__ == "__main__":
    main()
