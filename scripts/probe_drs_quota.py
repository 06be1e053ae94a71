"""Reconcile the DRS throughput numbers (VERDICT r3 weak-3).

Round 3's bench reported 1532.8 samples/s at a 24,576 accepted quota
while docs/VALIDATION.md documents 2171 at the 50k quota. This probe
measures both quotas back-to-back in one process on the same
trained-shape SNGAN-32 G/D (the bench configuration) so the gap can be
attributed: quota amortization (per-dispatch overhead + the final
partial batch), tunnel variance, or a real regression.

Run: timeout 900 /opt/venv/bin/python scripts/probe_drs_quota.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from diagan_tpu.eval.drs import DRS
    from diagan_tpu.eval.evaluate import make_disc_fn, make_gen_fn
    from diagan_tpu.models import get_gan_model
    from diagan_tpu.train.state import create_net_state
    from diagan_tpu.train.trainer import _make_tx
    import jax.numpy as jnp

    bundle = get_gan_model("cifar10", model="sngan", loss_type="hinge")
    k = jax.random.key(0)
    z0 = jnp.zeros((2, bundle.nz))
    x0 = jnp.zeros((2, 32, 32, 3))
    tx = _make_tx(bundle.opt_g.lr, bundle.opt_g.betas, 100, "linear", 1)
    g_state = create_net_state(bundle.gen, {"params": k}, (z0,), tx,
                               train=True)
    d_state = create_net_state(bundle.disc, {"params": k, "dropout": k},
                               (x0,), tx)
    sampler = DRS(
        make_gen_fn(bundle, g_state), make_disc_fn(bundle.disc, d_state),
        bundle.nz, key=jax.random.key(11), batch_size=256,
    )
    sampler.generate_images(2048, return_uint8=True)  # compile + warm

    for trial in range(2):
        for n in (24576, 50000):
            t0 = time.perf_counter()
            imgs = sampler.generate_images(n, return_uint8=True)
            dt = time.perf_counter() - t0
            assert len(imgs) == n
            print(f"trial {trial}: quota {n:>6}: {n / dt:7.1f} samples/s "
                  f"({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
