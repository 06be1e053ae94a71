"""25-Gaussians toy-family smoke on real hardware: train the Toy MLP GAN
(reference diagan-pkg/diagan/models/toy.py:27-66 /
datasets/gaussian.py:7-39) through the generic LogTrainer for a few
thousand steps, then report grid-mode coverage of generated samples.

Usage: python scripts/smoke_toy.py [--num_steps 4000] [--work_dir /tmp/exp_toy]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_steps", default=4000, type=int)
    parser.add_argument("--num_data", default=10000, type=int)
    parser.add_argument("--batch_size", default=256, type=int)
    parser.add_argument("--work_dir", default="/tmp/exp_toy", type=str)
    parser.add_argument("--seed", default=1, type=int)
    args = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from diagan_tpu.data import get_predefined_dataset
    from diagan_tpu.models import get_gan_model
    from diagan_tpu.train import LogTrainer
    from diagan_tpu.utils import set_seed

    set_seed(args.seed)
    out = Path(args.work_dir) / "toy25"
    out.mkdir(parents=True, exist_ok=True)
    bundle = get_gan_model("25gaussian", loss_type="ns")
    ds = get_predefined_dataset("25gaussian", root=None,
                                n_samples=args.num_data)
    trainer = LogTrainer(
        output_path=out, bundle=bundle, dataset=ds,
        num_steps=args.num_steps, n_dis=1, batch_size=args.batch_size,
        print_steps=500, vis_steps=10**9, log_steps=500,
        save_steps=args.num_steps, logit_save_steps=500,
        save_logit_after=args.num_steps // 2,
        stop_save_logit_after=args.num_steps, save_logits=True,
        seed=args.seed,
    )
    trainer.train()

    # mode coverage: generate, snap to the 5x5 grid, count covered modes
    # (standard 25-Gaussians diagnostic; a healthy GAN covers >20 modes)
    import jax.numpy as jnp

    key = jax.random.key(123)
    z = jax.random.normal(key, (5000, bundle.nz))
    pts = np.asarray(
        bundle.gen.apply(
            {"params": trainer.g_state.params, **trainer.g_state.state},
            z, train=False,
        )
    ) * 2.828
    centers = np.array([[2 * x, 2 * y] for x in range(-2, 3)
                        for y in range(-2, 3)], np.float32)
    d2 = ((pts[:, None, :] - centers[None]) ** 2).sum(-1)
    nearest = d2.argmin(1)
    good = d2[np.arange(len(pts)), nearest] < (3 * 0.05 * 2) ** 2
    covered = len(set(nearest[good].tolist()))
    frac_good = float(good.mean())
    print(f"modes covered: {covered}/25; high-quality fraction: "
          f"{frac_good:.3f} (within 3 sigma of a mode)")
    # logit pickle written by the trainer
    assert (out / "logits_netD_eval.pkl").is_file()
    print("artifacts OK:", out)


if __name__ == "__main__":
    main()
