"""MNIST-FMNIST (MixedMNIST): majority MNIST digits + minority FashionMNIST.

Parity with reference diagan-pkg/diagan/datasets/mnist_fmnist.py:12-116:
`major_ratio` fraction of `num_data` examples come from MNIST (mixed label
0), the rest from FashionMNIST (mixed label 1); shuffled, cached under
`{root}/mnist_fmnist-{major_ratio}-n{num_data}/{data,targets,mixed_targets}.pkl`.
Images stay grayscale (1-channel), transformed to 32x32.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from diagan_tpu.data.arrays import ArrayDataset
from diagan_tpu.data.sources import load_fmnist, load_mnist
from diagan_tpu.data.transform import resize_center_crop


def build_mnist_fmnist(
    root, major_ratio=0.9, num_data=60000, size=32, seed=None, fmnist_root=None
) -> ArrayDataset:
    root = Path(root)
    cache = root / f"mnist_fmnist-{major_ratio}-n{num_data}"
    if cache.is_dir():
        data = np.asarray(pickle.load(open(cache / "data.pkl", "rb")), dtype=np.uint8)
        targets = np.asarray(pickle.load(open(cache / "targets.pkl", "rb")))
        mixed = np.asarray(pickle.load(open(cache / "mixed_targets.pkl", "rb")))
    else:
        rng = np.random.default_rng(seed)
        mnist_imgs, mnist_targets = load_mnist(root, train=True)
        fmnist_imgs, fmnist_targets = load_fmnist(fmnist_root or root, train=True)

        num_major = int(num_data * major_ratio)
        num_minor = num_data - num_major
        data = np.concatenate([mnist_imgs[:num_major], fmnist_imgs[:num_minor]])
        targets = np.concatenate(
            [mnist_targets[:num_major], fmnist_targets[:num_minor]]
        )
        mixed = np.concatenate(
            [np.zeros(num_major, np.int64), np.ones(num_minor, np.int64)]
        )
        order = rng.permutation(num_data)
        data, targets, mixed = data[order], targets[order], mixed[order]

        cache.mkdir(parents=True, exist_ok=True)
        pickle.dump(data, open(cache / "data.pkl", "wb"))
        pickle.dump(targets, open(cache / "targets.pkl", "wb"))
        pickle.dump(mixed, open(cache / "mixed_targets.pkl", "wb"))

    data = resize_center_crop(data, size)
    if data.ndim == 3:
        data = data[..., None]
    return ArrayDataset.from_images(
        data, targets=targets, labels=mixed, name="mnist_fmnist"
    )
