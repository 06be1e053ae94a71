"""Probe: SNGAN CIFAR-10 fused-step throughput, fp32 vs bf16 compute dtype.

Same measurement harness as bench.py (50-step fused chunks, on-device
data, np.asarray as the sync point). Run on the real TPU:

    timeout 1200 /opt/venv/bin/python scripts/probe_sngan_bf16.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def measure(bf16: bool) -> float:
    from diagan_tpu.data.arrays import ArrayDataset
    from diagan_tpu.data.pipeline import DeviceDataSource
    from diagan_tpu.models import get_gan_model
    from diagan_tpu.train.state import create_net_state
    from diagan_tpu.train.steps import StepConfig, make_fused_step, make_train_chunk
    from diagan_tpu.train.trainer import _make_tx

    n_dis, batch_size, num_steps = 5, 64, 50000
    bundle = get_gan_model("cifar10", model="sngan", loss_type="hinge", bf16=bf16)

    rng = np.random.default_rng(0)
    ds = ArrayDataset.from_images(
        rng.integers(0, 255, (50000, 32, 32, 3), dtype=np.uint8)
    )
    src = DeviceDataSource(ds)

    tx_g = _make_tx(bundle.opt_g.lr, bundle.opt_g.betas, num_steps, "linear", 1)
    tx_d = _make_tx(bundle.opt_d.lr, bundle.opt_d.betas, num_steps, "linear", n_dis)
    cfg = StepConfig(
        n_dis=n_dis, batch_size=batch_size, nz=bundle.nz,
        loss_type="hinge", drs_loss_type="ns", model="sngan",
        gold=False, gold_step=0, topk=False,
        epoch_steps=len(ds) // batch_size, use_drs=False, quantized=True,
    )
    k = jax.random.key(0)
    z0 = jnp.zeros((2, bundle.nz))
    x0 = jnp.zeros((2, 32, 32, 3))
    g_state = create_net_state(bundle.gen, {"params": k}, (z0,), tx_g, train=True)
    d_state = create_net_state(bundle.disc, {"params": k, "dropout": k}, (x0,), tx_d)
    fused = make_fused_step(
        bundle.gen, bundle.disc, None, tx_g, tx_d, None, cfg, len(ds), 1
    )
    CHUNK = 50
    chunk = make_train_chunk(fused, CHUNK, donate=True)

    def run(g, d, start):
        return chunk(g, d, None, src.images, src.images, None,
                     jax.random.fold_in(k, start), jnp.int32(start))

    g_state, d_state, _, m = run(g_state, d_state, 0)
    err0 = float(np.asarray(m["errD"]).ravel()[-1])  # sync + numerics peek

    n_chunks = 4
    t0 = time.perf_counter()
    for i in range(1, n_chunks + 1):
        g_state, d_state, _, m = run(g_state, d_state, i * CHUNK)
    errN = float(np.asarray(m["errD"]).ravel()[-1])
    dt = time.perf_counter() - t0
    sps = n_chunks * CHUNK / dt
    print(f"bf16={bf16}: {sps:.1f} steps/s  (errD warmup {err0:.4f} -> {errN:.4f})",
          flush=True)
    return sps


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    fp32 = measure(False)
    bf16 = measure(True)
    print(f"speedup: {bf16 / fp32:.3f}x")


if __name__ == "__main__":
    main()
