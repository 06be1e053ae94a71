"""25-Gaussians toy-family protocol on real hardware.

Phase 1: train the Toy MLP GAN (reference
diagan-pkg/diagan/models/toy.py:27-66 / datasets/gaussian.py:7-39) through
the generic LogTrainer with logit recording. Phase 2: score-weighted
resampling + dual DRS discriminator, then compare grid-mode coverage of
phase-1 / phase-2 / phase-2+DRS samples — the paper's toy demonstration
(the reference ships the models/dataset but no script for it).

Usage: python scripts/smoke_toy.py [--num_steps 8000] [--work_dir /tmp/exp_toy]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def coverage(pts):
    """(modes covered, fraction of samples within 3 sigma of a mode).

    The dataset (and hence G's output) lives in the /2.828-scaled space;
    rescale back before snapping to the unscaled 5x5 grid.
    """
    pts = np.asarray(pts) * 2.828
    centers = np.array([[2 * x, 2 * y] for x in range(-2, 3)
                        for y in range(-2, 3)], np.float32)
    d2 = ((pts[:, None, :] - centers[None]) ** 2).sum(-1)
    nearest = d2.argmin(1)
    good = d2[np.arange(len(pts)), nearest] < (3 * 0.05 * 2) ** 2
    return len(set(nearest[good].tolist())), float(good.mean())


def sample_plain(bundle, g_state, n, seed=123):
    key = jax.random.key(seed)
    z = jax.random.normal(key, (n, bundle.nz))
    return np.asarray(
        bundle.gen.apply(
            {"params": g_state.params, **g_state.state}, z, train=False
        )
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_steps", default=8000, type=int)
    parser.add_argument("--num_data", default=10000, type=int)
    parser.add_argument("--batch_size", default=256, type=int)
    parser.add_argument("--resample_score", default="ldrv", type=str)
    parser.add_argument("--work_dir", default="/tmp/exp_toy", type=str)
    parser.add_argument("--seed", default=1, type=int)
    args = parser.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from diagan_tpu.cli.common import load_phase1_scores
    from diagan_tpu.data import get_predefined_dataset
    from diagan_tpu.eval.drs import DRS
    from diagan_tpu.models import get_gan_model
    from diagan_tpu.train import LogTrainer
    from diagan_tpu.utils import set_seed

    set_seed(args.seed)
    out = Path(args.work_dir) / "toy25"
    out.mkdir(parents=True, exist_ok=True)
    ds = get_predefined_dataset("25gaussian", root=None,
                                n_samples=args.num_data)
    n1 = args.num_steps
    common = dict(
        n_dis=1, batch_size=args.batch_size, print_steps=1000,
        vis_steps=10**9, log_steps=1000, logit_save_steps=100,
        seed=args.seed,
    )

    # ---- phase 1 ----
    bundle = get_gan_model("25gaussian", loss_type="ns")
    tr1 = LogTrainer(
        output_path=out, bundle=bundle, dataset=ds, num_steps=n1,
        save_steps=n1, save_logit_after=n1 // 2, stop_save_logit_after=n1,
        save_logits=True, **common,
    )
    tr1.train()
    p1_pts = sample_plain(bundle, tr1.g_state, 5000)
    m1, f1 = coverage(p1_pts)

    # ---- phase 2: weighted resampling + dual DRS-D ----
    weights = load_phase1_scores(out, n1, args.resample_score,
                                 window=n1 // 2)
    bundle2 = get_gan_model("25gaussian", loss_type="ns", drs=True)
    n2 = n1 + n1 // 2
    tr2 = LogTrainer(
        output_path=out / "phase2", bundle=bundle2, dataset=ds,
        sample_weights=weights, dataset_drs=ds, num_steps=n2,
        save_steps=n2, save_logit_after=10**9, stop_save_logit_after=10**9,
        save_logits=False,
        netG_ckpt_file=out / f"checkpoints/netG/netG_{n1}_steps.pth",
        netD_ckpt_file=out / f"checkpoints/netD/netD_{n1}_steps.pth",
        netD_drs_ckpt_file=out / f"checkpoints/netD/netD_{n1}_steps.pth",
        **common,
    )
    tr2.train()
    p2_pts = sample_plain(bundle2, tr2.g_state, 5000)
    m2, f2 = coverage(p2_pts)

    # ---- phase 2 + DRS sampling ----
    def gen_fn(z):
        return bundle2.gen.apply(
            {"params": tr2.g_state.params, **tr2.g_state.state}, z,
            train=False,
        )

    def disc_fn(x):
        logits, _ = bundle2.disc_drs.apply(
            {"params": tr2.d_drs_state.params, **tr2.d_drs_state.state}, x,
            update_stats=False, train=False,
        )
        return logits

    drs = DRS(gen_fn, disc_fn, bundle2.nz, batch_size=args.batch_size)
    drs_pts = np.asarray(drs.generate_images(5000))
    m3, f3 = coverage(drs_pts)

    print(f"phase1: {m1}/25 modes, {f1:.3f} high-quality")
    print(f"phase2: {m2}/25 modes, {f2:.3f} high-quality")
    print(f"phase2+DRS: {m3}/25 modes, {f3:.3f} high-quality")


if __name__ == "__main__":
    main()
