"""Metric-side by-index real-image loaders.

Parity with reference diagan-pkg/diagan/datasets/image_loader_with_index.py
(:14-34 get_index_images, :37-92 imagenet, :95-120 lsun-bedroom, and the
celeba variant below it). These are the "load exactly these real examples"
entry points used for index-sliced FID; the imagenet/lsun variants are dead
code in the reference (no script calls them) but belong to the component
inventory. TPU-native shape: loaders return (N, H, W, 3) uint8 ndarrays
ready for the jitted Inception featurizer; directory readers fall back to
the synthetic generators in this zero-egress container.
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def get_index_images(dataset, index):
    """Gather images at `index` from an array-like dataset into one
    (len(index), H, W, C) uint8 batch (reference :14-34 loops dataset[i][0]
    per index; here datasets are arrays so it is a single take)."""
    index = np.asarray(index)
    if isinstance(dataset, np.ndarray):
        return dataset[index]
    # sequence protocol (e.g. a WeightedDataset-style wrapper yielding
    # (img, ...) tuples) — mirror the reference's per-item loop
    images = []
    for i in index:
        item = dataset[int(i)]
        img = np.asarray(item[0] if isinstance(item, tuple) else item)
        images.append(img[None])
    return np.concatenate(images, axis=0)


def _read_image(path, size, crop=None):
    from PIL import Image

    img = Image.open(path)
    if crop:
        w, h = img.size
        left, top = (w - crop) // 2, (h - crop) // 2
        img = img.crop((left, top, left + crop, top + crop))
    img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img)
    if arr.ndim == 2:  # grayscale -> rgb (reference :72-75)
        arr = np.stack([arr] * 3, axis=2)
    elif arr.shape[2] == 4:  # rgba (reference :77-78)
        arr = arr[:, :, :3]
    return arr


def get_imagenet_images_with_index(index, root="./dataset", size=32):
    """Per-class gather at `index` over the imagenet train directory
    (reference :37-92: for every class dir, read filenames[i] for i in
    index after a CenterCrop(224) + Resize(size); output concatenates over
    classes). Preserves the reference's >=1000-index guard. Synthetic
    fallback when the directory is absent."""
    index = np.asarray(index)
    if len(index) < 1000:
        raise ValueError(
            "length of index {} must be at least 1000 to ensure images are "
            "sampled from each class.".format(len(index))
        )
    data_dir = Path(root) / "imagenet" / "train"
    if not data_dir.is_dir():
        from diagan_tpu.data.synthetic import synthetic_natural

        images, _ = synthetic_natural(int(index.max()) + 1, size, seed=11)
        return images[index]
    images = []
    for class_dir in sorted(os.listdir(data_dir)):
        files = sorted(
            os.path.join(data_dir, class_dir, n)
            for n in os.listdir(data_dir / class_dir)
        )
        for i in index:
            images.append(_read_image(files[int(i)], size, crop=224)[None])
    return np.concatenate(images, axis=0)


def get_lsun_bedroom_images_with_index(index, root="./dataset", size=128,
                                       **kwargs):
    """LSUN-bedroom training images gathered by index (reference :95-120:
    load the dataset untransformed-to-tensor, then get_index_images).
    Directory layout: {root}/lsun/bedroom_train/ image files, or a
    pre-resized lsun_bedroom_{size}.npy cache; synthetic fallback."""
    index = np.asarray(index)
    base = Path(root) / "lsun"
    cache = base / f"lsun_bedroom_{size}.npy"
    if cache.is_file():
        return np.load(cache, mmap_mode="r")[index]
    img_dir = base / "bedroom_train"
    if img_dir.is_dir():
        files = sorted(
            p for p in img_dir.iterdir()
            if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".webp")
        )
        return np.stack([_read_image(files[int(i)], size) for i in index])
    from diagan_tpu.data.synthetic import synthetic_natural

    images, _ = synthetic_natural(int(index.max()) + 1, size, seed=12)
    return images[index]


def get_celeba_images_with_index(index, root="./dataset", size=128, **kwargs):
    """CelebA images gathered by index (reference image_loader_with_index
    celeba variant: load + get_index_images)."""
    from diagan_tpu.data.sources import load_celeba

    index = np.asarray(index)
    images, _ = load_celeba(Path(root) / "celeba", size=size,
                            fallback_n=int(index.max()) + 1)
    return np.asarray(images)[index]
