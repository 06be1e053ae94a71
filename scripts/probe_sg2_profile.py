"""Probe: where does the StyleGAN2-256 fused step's time actually go?

Runs the bench-identical fused chunk (size 256, batch 16, bf16, adaptive
ADA at p=0) under jax.profiler, then aggregates the device trace's
complete events by op-name prefix and prints the top buckets. The
amortized step is ~23 TFLOP (scripts/probe_sg2_flops_split.py); at the
measured ~730 ms/step the program runs ~16% MFU, so ~6x of headroom
exists SOMEWHERE — this says where.

Usage: python scripts/probe_sg2_profile.py [--steps 10] [--size 256]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def run_chunk(size, batch, steps, trace_dir, augment_p=0.0, num_data=512):
    from diagan_tpu.models.stylegan2 import (
        StyleGAN2Discriminator,
        StyleGAN2Generator,
    )
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    # 512 images is 1.6 GB of HBM at 1024px (OOMs by ~50 MB next to the
    # model) — scale the synthetic dataset down for the large sizes
    imgs = np.random.default_rng(0).integers(
        0, 255, (num_data, size, size, 3), np.uint8)
    tr = StyleGAN2Trainer(
        "/tmp/probe_sg2_prof", StyleGAN2Generator(size=size, dtype=jnp.bfloat16),
        StyleGAN2Discriminator(size=size, dtype=jnp.bfloat16),
        imgs, num_steps=steps, batch_size=batch,
        log_every=steps, save_every=10**9, seed=0,
        augment_p=augment_p,  # >0 = fixed-p ADA live in the chunk
        max_chunk=steps,  # one fixed-length program (no auto bootstrap)
    )
    tr.train(start_step=0)  # compile + warm
    chunk = tr._chunk_for(steps)
    args = (tr.g_state, tr.d_state, tr.d_drs_state, tr.g_ema, tr.pl_mean,
            jax.random.key(7), tr.ada_aug_p, jnp.int32(steps), tr.images)
    # untraced timing first
    t0 = time.perf_counter()
    res = chunk(*args)
    np.asarray(res[-1]["d"])
    dt = (time.perf_counter() - t0) / steps
    print(f"untraced: {dt*1000:.1f} ms/step over {steps} steps", flush=True)

    jax.profiler.start_trace(trace_dir)
    res = chunk(*args)
    np.asarray(res[-1]["d"])
    jax.profiler.stop_trace()
    return dt


def aggregate(trace_dir, steps):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace.json.gz found under", trace_dir)
        return
    with gzip.open(max(files), "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device pids (track names mentioning TPU/device)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    buckets = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0)  # us
        name = e.get("name", "?")
        # bucket by fusion-name prefix: strip trailing .N / digits
        base = name.split(".")[0]
        buckets[base] += dur
        total += dur
    print(f"\ndevice total: {total/1e3:.1f} ms "
          f"({total/1e3/steps:.1f} ms/step over {steps} steps)")
    print(f"{'bucket':44s} {'ms/step':>9s} {'share':>7s}")
    for name, dur in buckets.most_common(35):
        print(f"{name[:44]:44s} {dur/1e3/steps:9.2f} {dur/total*100:6.1f}%")
    # full event names — shows WHICH fusions dominate inside the
    # stripped-name buckets
    singles = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            singles[e.get("name", "?")] += e.get("dur", 0)
    print(f"\n{'top events':60s} {'ms/step':>9s}")
    for name, dur in singles.most_common(25):
        print(f"{name[:60]:60s} {dur/1e3/steps:9.2f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", default=10, type=int)
    p.add_argument("--size", default=256, type=int)
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--trace_dir", default="/tmp/sg2_trace")
    p.add_argument("--augment_p", default=0.0, type=float)
    p.add_argument("--num_data", default=512, type=int)
    args = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    run_chunk(args.size, args.batch, args.steps, args.trace_dir,
              augment_p=args.augment_p, num_data=args.num_data)
    aggregate(args.trace_dir, args.steps)


if __name__ == "__main__":
    main()
