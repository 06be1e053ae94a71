"""DRS — Discriminator Rejection Sampling, batched and jitted.

Behavioral parity with the reference sampler (reference
diagan-pkg/diagan/models/drs.py:10-69 and the eval-side near-duplicate,
trainer/evaluate.py:26-95):

  - warm-up: 50 batches of `batch_size` G samples through D to estimate the
    max logit (running max, also updated during sampling),
  - per proposal batch: F = (ldr - max) - log(1 - exp(ldr - max - eps)),
    gamma = percentile(F, 80) per batch (or a fixed gamma), accept sample i
    iff sigmoid(F_i - gamma) > U_i,
  - loop until the quota of accepted samples is met (~20% acceptance at
    the 80th percentile).

TPU-native design: proposal generation + D scoring + the accept test are
one jitted function returning (images, accept_mask, batch_max); the host
only concatenates accepted samples until the quota is met (the reference
also loops on host, evaluate.py:70-83). The per-batch percentile is
computed on device via sort.
"""
from __future__ import annotations

import jax
import numpy as np


class DRS:
    def __init__(self, gen_fn, disc_fn, nz, key=None, gamma=None,
                 percentile=80, batch_size=256):
        """gen_fn(z) -> images; disc_fn(images) -> logits. Both jittable,
        eval-mode closures over trained params."""
        self.gen_fn = gen_fn
        self.disc_fn = disc_fn
        self.nz = nz
        self.batch_size = batch_size
        self.percentile = percentile
        self.gamma = gamma
        self.maximum = -1e5
        self.key = key if key is not None else jax.random.key(0)

        @jax.jit
        def propose(key):
            kz, ku = jax.random.split(key)
            z = jax.random.normal(kz, (batch_size, nz))
            imgs = self.gen_fn(z)
            ldr = self.disc_fn(imgs)
            u = jax.random.uniform(ku, (batch_size,))
            return imgs, ldr, u

        self._propose = propose

        @jax.jit
        def ldr_only(key):
            z = jax.random.normal(key, (batch_size, nz))
            return self.disc_fn(self.gen_fn(z))

        self._ldr_only = ldr_only
        self.init_drs()

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def init_drs(self, num_batches=50):
        for _ in range(num_batches):
            ldr = np.asarray(self._ldr_only(self._next_key()))
            self.maximum = max(self.maximum, float(ldr.max()))

    def _accept(self, ldr, u, eps=1e-6):
        tmp_max = float(ldr.max())
        if tmp_max > self.maximum:
            self.maximum = tmp_max
        ldr_max = ldr - self.maximum
        F = ldr_max - np.log(1 - np.exp(ldr_max - eps))
        gamma = (
            np.percentile(F, self.percentile) if self.gamma is None else self.gamma
        )
        F = F - gamma
        return 1.0 / (1.0 + np.exp(-F)) > u

    def generate_images(self, num_images, return_uint8=False):
        """Rejection-sample `num_images` accepted images ([-1,1] float NHWC)."""
        out = []
        n = 0
        while n < num_images:
            imgs, ldr, u = self._propose(self._next_key())
            mask = self._accept(np.asarray(ldr), np.asarray(u))
            acc = np.asarray(imgs)[mask]
            out.append(acc)
            n += len(acc)
        result = np.concatenate(out, axis=0)[:num_images]
        if return_uint8:
            result = np.clip((result + 1) * 127.5, 0, 255).astype(np.uint8)
        return result

    def visualize_images(self, save_path, num_images=64, name="drs_samples"):
        """Grid dump of DRS-accepted samples (reference evaluate.py:85-95)."""
        from pathlib import Path

        from diagan_tpu.train.logger import save_image_grid

        imgs = self.generate_images(num_images)
        path = Path(save_path) / f"{name}.png"
        path.parent.mkdir(parents=True, exist_ok=True)
        save_image_grid(imgs, path, nrow=8)
        return path

    def acceptance_rate_probe(self, num_batches=10):
        """Empirical acceptance fraction (sanity: ~0.2 at percentile 80)."""
        total, acc = 0, 0
        for _ in range(num_batches):
            _, ldr, u = self._propose(self._next_key())
            mask = self._accept(np.asarray(ldr), np.asarray(u))
            total += len(mask)
            acc += int(mask.sum())
        return acc / total
