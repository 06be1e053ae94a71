"""FFHQ storage and loading.

The reference stores FFHQ as LMDB keyed f'{res}-{idx:05d}' with a
hardcoded blacklist of index 40650 (reference stylegan2/dataset.py:10-63,
prepare_data.py). lmdb is not available in this environment, so the
TPU-native store is a flat memory-mappable uint8 .npy per resolution
(`ffhq_{res}.npy`), produced by prepare_data.py from an image directory;
an LMDB reader is provided behind an import guard for parity when the
package exists.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

BLACKLIST = {40650}  # reference stylegan2/dataset.py:29-31


def load_ffhq(root, size=256, fallback_n=2048, seed=7):
    """uint8 (N, size, size, 3). Precedence: ffhq_{size}.npy; LMDB dir (if
    lmdb importable); directory of images; synthetic fallback."""
    root = Path(root)
    cache = root / f"ffhq_{size}.npy"
    if cache.is_file():
        return np.load(cache, mmap_mode="r")
    if (root / "data.mdb").is_file():
        try:
            return _load_lmdb(root, size)
        except ImportError:
            raise RuntimeError(
                f"{root} is an LMDB but the lmdb package is unavailable; "
                f"convert with prepare_data.py --out npy"
            )
    if root.is_dir() and (any(root.glob("*.png")) or any(root.glob("*.jpg"))):
        return prepare_npy(root, root, sizes=(size,))[size]
    from diagan_tpu.data.synthetic import synthetic_natural

    images, _ = synthetic_natural(fallback_n, size, seed=seed)
    return images


def _load_lmdb(root, size):
    import lmdb
    from PIL import Image
    import io

    env = lmdb.open(str(root), readonly=True, lock=False)
    with env.begin(write=False) as txn:
        n = int(txn.get("length".encode("utf-8")).decode("utf-8"))
        out = np.empty((n - len(BLACKLIST), size, size, 3), np.uint8)
        j = 0
        for i in range(n):
            if i in BLACKLIST:
                continue
            key = f"{size}-{i + (1 if i > max(BLACKLIST) else 0):05d}"
            img = Image.open(io.BytesIO(txn.get(key.encode("utf-8"))))
            out[j] = np.asarray(img.convert("RGB"))
            j += 1
    return out


def prepare_npy(img_dir, out_dir, sizes=(128, 256, 512, 1024)):
    """Resize/center-crop an image directory into per-resolution npy caches
    (the prepare_data.py equivalent)."""
    from PIL import Image

    img_dir, out_dir = Path(img_dir), Path(out_dir)
    files = sorted(
        p for p in img_dir.iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".webp")
    )
    out = {}
    for size in sizes:
        arr = np.empty((len(files), size, size, 3), np.uint8)
        for i, f in enumerate(files):
            im = Image.open(f).convert("RGB")
            w, h = im.size
            s = size / min(w, h)
            im = im.resize((round(w * s), round(h * s)), Image.LANCZOS)
            w, h = im.size
            left, top = (w - size) // 2, (h - size) // 2
            arr[i] = np.asarray(im.crop((left, top, left + size, top + size)))
        out_dir.mkdir(parents=True, exist_ok=True)
        np.save(out_dir / f"ffhq_{size}.npy", arr)
        out[size] = arr
    return out
