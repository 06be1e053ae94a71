"""Tests for utility modules (meters, Otsu split, plots, LPIPS)."""
import numpy as np

from diagan_tpu.utils.cond import get_index_group
from diagan_tpu.utils.trainer import AverageMeter, accuracy


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 2)
    assert m.avg == 2.5 and m.count == 4


def test_accuracy():
    logits = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 0]], float)
    target = np.array([0, 1, 2, 2])
    (top1,) = accuracy(logits, target, topk=(1,))
    assert abs(top1 - 75.0) < 1e-6


def test_otsu_split():
    scores = np.concatenate([np.zeros(50) + 0.1, np.ones(50) * 5.0])
    low, high = get_index_group(scores)
    assert len(low) == 50 and len(high) == 50
    assert (scores[low] < 1).all() and (scores[high] > 1).all()


def test_plot_suite_writes_files(tmp_path):
    from diagan_tpu.data.arrays import ArrayDataset
    from diagan_tpu.utils.plot import (
        plot_gaussian_samples,
        plot_intensity_histogram,
        plot_score_sort,
        show_sorted_score_samples,
    )

    rng = np.random.default_rng(0)
    ds = ArrayDataset.from_images(
        rng.integers(0, 255, (50, 8, 8, 3), np.uint8),
        labels=rng.integers(0, 2, 50),
    )
    score = rng.uniform(0.1, 2.0, 50)
    show_sorted_score_samples(ds, score, tmp_path, num_shown=10)
    plot_score_sort(ds, {"ldr": score, "ldrm": score, "ldrv": score,
                         "ldrd": score}, tmp_path)
    plot_intensity_histogram(score, ds, tmp_path, prefix="t")
    plot_gaussian_samples(rng.normal(size=(100, 2)), tmp_path, 5)
    written = list(tmp_path.iterdir())
    assert len(written) >= 7


def test_lpips_orders_distances():
    import jax.numpy as jnp

    from diagan_tpu.eval.lpips import LPIPS

    l = LPIPS()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    near = x + 0.01
    far = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    d_near = np.asarray(l(x, near))
    d_far = np.asarray(l(x, far))
    assert (d_near < d_far).all()
