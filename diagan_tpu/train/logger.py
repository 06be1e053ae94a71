"""Training logger: stdout + JSONL scalars + PNG sample grids (+ optional
TensorBoard when torch's SummaryWriter is importable).

Scalar-name parity with the reference's mimicry Logger usage (errG, errD,
errD_drs, lr_{i}, topk_rate — reference trainer.py:304-316,
scheduler.py:104). Images land under `{log_dir}/images/` like mimicry's
vis_images (trainer.py:318-326).
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


class Logger:
    def __init__(self, log_dir, flush_secs=30, use_tensorboard=True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "scalars.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir / "tb"), flush_secs=flush_secs)
            except Exception:
                self._tb = None

    def write_scalars(self, step: int, scalars: dict):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            rec[k] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def print_log(self, step: int, num_steps: int, scalars: dict, time_taken: float):
        parts = " | ".join(f"{k}: {float(v):.4f}" for k, v in scalars.items())
        print(
            f"INFO: [Step {step}/{num_steps}] {parts} "
            f"({time_taken:.4f} sec/idx)",
            flush=True,
        )

    def vis_images(self, step: int, images, nrow: int = 8, name="fake_samples"):
        """images: float array (N, H, W, C) in [-1, 1] -> PNG grid."""
        path = self.log_dir / "images" / f"{name}_step_{step}.png"
        path.parent.mkdir(parents=True, exist_ok=True)
        save_image_grid(np.asarray(images), path, nrow=nrow)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def to_uint8(images):
    return np.clip((np.asarray(images) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_image_grid(images, path, nrow: int = 8, pad: int = 2):
    """(N, H, W, C) in [-1, 1] -> single PNG grid file."""
    from PIL import Image

    imgs = to_uint8(images)
    n, h, w, c = imgs.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.zeros(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), np.uint8
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y : y + h, x : x + w] = imgs[i]
    if c == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)
    return path
