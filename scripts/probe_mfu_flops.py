"""Probe: is bench.py's FLOPs/step derivation correct?

XLA's compiled-program cost_analysis counts a while-loop (lax.scan) BODY
ONCE — it does not multiply by the trip count (verified: scan lengths
1/10/50 of a conv body all report identical flops). bench.py divided the
chunk program's flops by CHUNK, understating FLOPs/step (and MFU) by
~CHUNK x. This probe lowers the same SNGAN fused-step program as
chunk(50), chunk(1), and compares, plus an analytic conv-only count of
one reference-equivalent step (5 D updates + 1 G update, batch 64).

Usage: python scripts/probe_mfu_flops.py
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from diagan_tpu.data.arrays import ArrayDataset
    from diagan_tpu.data.pipeline import DeviceDataSource
    from diagan_tpu.models import get_gan_model
    from diagan_tpu.train.state import create_net_state
    from diagan_tpu.train.steps import StepConfig, make_fused_step, make_train_chunk
    from diagan_tpu.train.trainer import _make_tx

    n_dis, batch_size, num_steps = 5, 64, 50000
    bundle = get_gan_model("cifar10", model="sngan", loss_type="hinge")
    rng = np.random.default_rng(0)
    ds = ArrayDataset.from_images(
        rng.integers(0, 255, (2048, 32, 32, 3), dtype=np.uint8))
    src = DeviceDataSource(ds)
    tx_g = _make_tx(bundle.opt_g.lr, bundle.opt_g.betas, num_steps, "linear", 1)
    tx_d = _make_tx(bundle.opt_d.lr, bundle.opt_d.betas, num_steps, "linear",
                    n_dis)
    cfg = StepConfig(
        n_dis=n_dis, batch_size=batch_size, nz=bundle.nz,
        loss_type="hinge", drs_loss_type="ns", model="sngan",
        gold=False, gold_step=0, topk=False,
        epoch_steps=len(ds) // batch_size, use_drs=False, quantized=True,
    )
    k = jax.random.key(0)
    z0 = jnp.zeros((2, bundle.nz))
    x0 = jnp.zeros((2, 32, 32, 3))
    g_state = create_net_state(bundle.gen, {"params": k}, (z0,), tx_g,
                               train=True)
    d_state = create_net_state(bundle.disc, {"params": k, "dropout": k},
                               (x0,), tx_d)
    fused = make_fused_step(
        bundle.gen, bundle.disc, None, tx_g, tx_d, None, cfg, len(ds), 1)

    def flops_of(chunk_len):
        chunk = make_train_chunk(fused, chunk_len, donate=False)
        ca = chunk.lower(
            g_state, d_state, None, src.images, src.images, None,
            jax.random.fold_in(k, 0), jnp.int32(0),
        ).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"])

    f50 = flops_of(50)
    f1 = flops_of(1)
    print(f"chunk(50) program flops: {f50/1e9:10.2f} GFLOP")
    print(f"chunk(1)  program flops: {f1/1e9:10.2f} GFLOP")
    print(f"ratio (1.0 => body counted once, not x50): {f50/f1:.3f}")

    # analytic conv-only count of one step (SNGAN-32 inventory, fwd MACs;
    # bwd = 2x fwd for weights+inputs; G runs fresh fakes for each of the
    # 5 D updates and again, differentiated, in the G update)
    def conv(nb, hw, cin, cout, kk=3):
        return 2.0 * nb * hw * hw * kk * kk * cin * cout

    B = batch_size
    g_fwd = (2 * B * 128 * 4 * 4 * 256          # dense z->4x4x256
             + conv(B, 8, 256, 256) * 2 + conv(B, 8, 256, 256, 1)
             + conv(B, 16, 256, 256) * 2 + conv(B, 16, 256, 256, 1)
             + conv(B, 32, 256, 256) * 2 + conv(B, 32, 256, 256, 1)
             + conv(B, 32, 256, 3))
    d_fwd = (conv(B, 32, 3, 128) + conv(B, 32, 128, 128)
             + conv(B, 32, 3, 128, 1)
             + conv(B, 16, 128, 128) * 2 + conv(B, 16, 128, 128, 1)
             + conv(B, 8, 128, 128) * 2 + conv(B, 8, 128, 128, 1)
             + conv(B, 8, 128, 128) * 2
             + 2 * B * 128)
    d_step = d_fwd * 2 * 3 + g_fwd              # D(real)+D(fake) fwd+bwd, G fwd
    g_step = (g_fwd + d_fwd) * 3                # G fwd+bwd through D
    step = n_dis * d_step + g_step
    print(f"analytic conv FLOPs/step:  {step/1e9:10.2f} GFLOP")
    print(f"=> at 50.5 steps/s: {step*50.5/1e12:.1f} TFLOP/s "
          f"({step*50.5/197e12*100:.1f}% of v5e bf16 peak)")


if __name__ == "__main__":
    main()
