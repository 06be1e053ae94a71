"""Diagnostic plot suite — parity with reference diagan-pkg/diagan/utils/plot.py.

Covers the artifacts the reference scripts emit: sorted-score sample grids
(plot.py:94-104), score-vs-index plots colored by majority/minority label
(plot.py:153-174), LDR trajectory plots (plot.py:121-151), color-MNIST
channel diagnostics (plot.py:269-318), 25-Gaussians scatters
(plot.py:56-67,364-406), and intensity histograms (plot.py:251-267).
All matplotlib; the scoring math itself lives in diagan_tpu.score.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from diagan_tpu.train.logger import save_image_grid, to_uint8  # noqa: E402


def print_num_params(netG_params, netD_params):
    import jax

    ng = sum(v.size for v in jax.tree.leaves(netG_params))
    nd = sum(v.size for v in jax.tree.leaves(netD_params))
    print(f"INFO: netG params: {ng / 1e6:.2f}M, netD params: {nd / 1e6:.2f}M")


def show_sorted_score_samples(dataset, score, save_path, score_name="score",
                              plot_name="sorted", num_shown=100):
    """Grids of the lowest- and highest-scored real examples
    (reference plot.py:94-104)."""
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)
    order = np.argsort(np.asarray(score))
    imgs = dataset.images
    lo = imgs[order[:num_shown]].astype(np.float32) / 127.5 - 1.0
    hi = imgs[order[-num_shown:]].astype(np.float32) / 127.5 - 1.0
    save_image_grid(lo, save_path / f"{plot_name}_{score_name}_low.png", nrow=10)
    save_image_grid(hi, save_path / f"{plot_name}_{score_name}_high.png", nrow=10)


def plot_score_sort(dataset, score_dict, save_path, phase="p1",
                    metrics=("ldr", "ldrm", "ldrv", "ldrd")):
    """Sorted per-example score bars colored by bias label
    (reference plot.py:153-174)."""
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)
    labels = np.asarray(dataset.labels)
    for name in metrics:
        metric = np.asarray(score_dict[name])
        order = np.argsort(metric)
        plt.figure(figsize=(12, 5))
        colors = np.where(labels[order] == 1, "red", "blue")
        plt.bar(np.arange(len(metric)), metric[order], color=colors, width=1.0)
        plt.title(f"{phase} {name} (red = minority)")
        plt.savefig(save_path / f"{phase}_{name}_sort.jpg", bbox_inches="tight")
        plt.close()


def plot_logit_trajectories(logits_dict, save_path, indices=None, name="ldr"):
    """Per-example logit time series over the recording window
    (reference plot.py:121-151)."""
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)
    steps = sorted(logits_dict)
    arr = np.stack([logits_dict[s] for s in steps])  # [T, N]
    if indices is None:
        indices = np.arange(min(50, arr.shape[1]))
    plt.figure(figsize=(10, 6))
    for i in indices:
        plt.plot(steps, arr[:, i], alpha=0.4, lw=0.8)
    plt.xlabel("step")
    plt.ylabel("D logit (LDR)")
    plt.savefig(save_path / f"{name}_trajectories.jpg", bbox_inches="tight")
    plt.close()


def plot_color_mnist_generator(generate_images_fn, save_path,
                               file_name="eval", num_images=1000):
    """Channel-dominance diagnostic: fraction of red- vs green-dominant
    samples among generated images (reference plot.py:269-318)."""
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)
    imgs = to_uint8(generate_images_fn(num_images))
    red = (imgs[..., 0].astype(np.int64) - imgs[..., 1]).reshape(len(imgs), -1).mean(1)
    counts = [(red > 0).sum(), (red <= 0).sum()]
    plt.figure(figsize=(5, 5))
    plt.bar(["red (major)", "green (minor)"], counts, color=["red", "green"])
    plt.title(f"{file_name}: generated channel dominance")
    plt.savefig(save_path / f"{file_name}_channel_counts.jpg", bbox_inches="tight")
    plt.close()
    save_image_grid(
        imgs[:100].astype(np.float32) / 127.5 - 1.0,
        save_path / f"{file_name}_samples.png", nrow=10,
    )
    return counts


def plot_gaussian_samples(points, save_path, global_step=0, real_points=None):
    """25-Gaussians scatter (reference plot.py:56-67)."""
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(6, 6))
    if real_points is not None:
        plt.scatter(real_points[:, 0], real_points[:, 1], s=2, c="gray",
                    alpha=0.3, label="real")
    plt.scatter(points[:, 0], points[:, 1], s=2, c="tab:blue", label="fake")
    plt.legend()
    plt.savefig(save_path / f"gaussian_step_{global_step}.jpg",
                bbox_inches="tight")
    plt.close()


def plot_intensity_histogram(sample_weights, dataset, save_path, prefix=""):
    """Pixel-intensity histograms of the 100 lowest/highest scored examples
    (reference plot.py:251-267)."""
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)
    order = np.argsort(np.asarray(sample_weights))
    imgs = dataset.images
    lo = np.bincount(imgs[order[:100]].reshape(-1), minlength=256)
    hi = np.bincount(imgs[order[-100:]].reshape(-1), minlength=256)
    plt.figure(figsize=(10, 7))
    plt.plot(lo, color="blue", label="Low Scored Samples")
    plt.plot(hi, color="red", label="High Scored Samples")
    plt.legend()
    plt.savefig(save_path / f"{prefix}_intensity_hist.jpg", bbox_inches="tight")
    plt.close()
