"""Shared plumbing for the CLI entry points (reference script surface §2.9).

Keeps flag names and defaults byte-compatible with the reference scripts;
the torch-specific flags (--gpu, --download_dataset) are accepted and
ignored so reference command lines run unmodified.
"""
from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import jax
import numpy as np


def enable_compile_cache():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path(__file__).resolve().parents[2] / ".jax_cache"))
    except Exception:
        pass


def add_common_train_flags(parser: argparse.ArgumentParser):
    parser.add_argument("--work_dir", default="./exp_results", type=str,
                        help="output dir")
    parser.add_argument("--gpu", default="0", type=str,
                        help="accepted for reference CLI compat; unused on TPU")
    parser.add_argument("--batch_size", default=64, type=int)
    parser.add_argument("--seed", default=1, type=int)
    # additive (not in the reference): FusedProp-style merged last D/G
    # iteration — measured +9.1% steps/s on SNGAN CIFAR-10 (TPU v5e);
    # G sees pre-update D params (see train/steps.py StepConfig)
    parser.add_argument("--simultaneous_g", action="store_true")
    # additive: resume this experiment from its own newest checkpoints
    # (lossless restart after a TPU worker crash/preemption; pair with
    # scripts/supervise.py). Phase-2 scripts fall back to the baseline
    # phase-1 checkpoints on a fresh start.
    parser.add_argument("--auto_resume", action="store_true")
    # additive: bfloat16 compute for the SNGAN-family conv/dense stack
    # (fp32 params/BN stats/spectral norm/logit head) — measured +10%
    # steps/s on SNGAN CIFAR-10 (TPU v5e); mirrors the StyleGAN2 --bf16
    parser.add_argument("--bf16", action="store_true")
    # additive: data-parallel training over all visible devices (the
    # reference's DDP/NCCL path, stylegan2/train_ffhq.py:500-585, exists
    # only for StyleGAN2 and needs torch.distributed.launch; here any
    # trainer shards its global batch over a jax.sharding.Mesh in-process).
    parser.add_argument("--data_parallel", action="store_true")
    return parser


def mesh_from_args(args):
    """jax.sharding.Mesh over all visible devices when --data_parallel;
    None (single-device program) otherwise."""
    if not getattr(args, "data_parallel", False):
        return None
    from diagan_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices())
    print(f"data-parallel over {mesh.devices.size} devices: {mesh}")
    return mesh


def step_fusions_from_args(args):
    return {"simultaneous_g": getattr(args, "simultaneous_g", False)}


def load_phase1_scores(baseline_save_path, p1_step, resample_score,
                       window=5000, logit_name="netD_eval",
                       normalize_logits=False):
    """logits pickle -> sample weights for phase 2
    (reference train_mimicry_phase2.py:86-93; window=5000 for all datasets).
    normalize_logits: opt-in median-centering deviation (score/score.py)."""
    from diagan_tpu.score import calculate_scores

    logit_path = Path(baseline_save_path) / f"logits_{logit_name}.pkl"
    print(f"Use logit from: {logit_path}")
    with open(logit_path, "rb") as f:
        logits = pickle.load(f)
    score_dict = calculate_scores(
        logits, start_epoch=p1_step - window, end_epoch=p1_step,
        normalize_logits=normalize_logits,
    )
    w = np.asarray(score_dict[resample_score])
    print(f"sample_weights mean: {w.mean()}, var: {w.var()}, "
          f"max: {w.max()}, min: {w.min()}")
    from diagan_tpu.score import warn_if_degenerate_weights

    warn_if_degenerate_weights(w, resample_score)
    return w


def phase1_ckpt_paths(baseline_save_path, p1_step):
    base = Path(baseline_save_path)
    return (
        base / f"checkpoints/netG/netG_{p1_step}_steps.pth",
        base / f"checkpoints/netD/netD_{p1_step}_steps.pth",
    )


def latest_ckpt_step(save_path):
    """Newest step with a netG checkpoint under save_path/checkpoints
    (filename-parsed, the reference layout netG_{step}_steps.pth), or
    None. The --auto_resume probe for crash/preemption restarts."""
    d = Path(save_path) / "checkpoints" / "netG"
    steps = []
    if d.is_dir():
        for f in d.glob("netG_*_steps.pth"):
            try:
                steps.append(int(f.stem.split("_")[1]))
            except (IndexError, ValueError):
                continue
    return max(steps) if steps else None


def resolve_phase2_resume(args, save_path, netG_ckpt, netD_ckpt,
                          netD_drs_ckpt=None):
    """--auto_resume for phase-2 scripts: if THIS experiment already has
    checkpoints (a previous attempt crashed mid-run), restore all nets
    from its newest step instead of the baseline phase-1 files; D_drs
    comes from its own netD_drs checkpoint rather than the netD clone."""
    if not getattr(args, "auto_resume", False):
        return netG_ckpt, netD_ckpt, netD_drs_ckpt
    own = latest_ckpt_step(save_path)
    if own is None:
        return netG_ckpt, netD_ckpt, netD_drs_ckpt
    base = Path(save_path)
    g, d = phase1_ckpt_paths(base, own)
    drs = netD_drs_ckpt
    if netD_drs_ckpt is not None:
        own_drs = base / f"checkpoints/netD_drs/netD_drs_{own}_steps.pth"
        drs = own_drs if own_drs.is_file() else d
    print(f"auto-resumed from own checkpoints at step {own}")
    return g, d, drs
