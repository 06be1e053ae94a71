"""Colored-MNIST (BiasedMNIST): the paper's controlled minority benchmark.

Behavioral parity with reference diagan-pkg/diagan/datasets/color_mnist.py:
take the first `num_data` MNIST digits, binarize (pixel != 0), color a
random `major_ratio` fraction red [255,0,0] (bias label 0) and the rest
green [0,255,0] (bias label 1), shuffle, and cache as pickles under
`{root}/color_mnist-rd{major_ratio}-n{num_data}/{data,targets,biased_targets}.pkl`
— the same cache layout, so datasets built by the reference load here
directly and vice versa.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from diagan_tpu.data.arrays import ArrayDataset
from diagan_tpu.data.sources import load_mnist
from diagan_tpu.data.transform import resize_center_crop

COLOUR_MAP = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)


def build_colored_mnist(
    root, major_ratio=0.99, num_data=10000, size=32, seed=None
) -> ArrayDataset:
    root = Path(root)
    cache = root / f"color_mnist-rd{major_ratio}-n{num_data}"
    if cache.is_dir():
        data = pickle.load(open(cache / "data.pkl", "rb"))
        targets = np.asarray(pickle.load(open(cache / "targets.pkl", "rb")))
        biased = np.asarray(pickle.load(open(cache / "biased_targets.pkl", "rb")))
        data = np.asarray(data, dtype=np.uint8)
    else:
        rng = np.random.default_rng(seed)
        digits, targets_all = load_mnist(root, train=True)
        digits = digits[:num_data]
        targets_all = targets_all[:num_data]

        perm = rng.permutation(num_data)
        num_major = int(num_data * major_ratio)
        bias = np.ones(num_data, np.int64)
        bias[perm[:num_major]] = 0

        binary = (digits != 0).astype(np.uint8)[..., None]  # (N, 28, 28, 1)
        data = binary * COLOUR_MAP[bias][:, None, None, :]  # colorize
        # reference concatenates major-then-minor and shuffles; sampling a
        # random bias assignment then shuffling is distributionally identical
        order = rng.permutation(num_data)
        data, targets, biased = data[order], targets_all[order], bias[order]

        cache.mkdir(parents=True, exist_ok=True)
        pickle.dump(data, open(cache / "data.pkl", "wb"))
        pickle.dump(targets, open(cache / "targets.pkl", "wb"))
        pickle.dump(biased, open(cache / "biased_targets.pkl", "wb"))

    data = resize_center_crop(data, size)
    return ArrayDataset.from_images(
        data, targets=targets, labels=biased, name="color_mnist"
    )
