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

TPU-native design (two levels):
  1. K proposal batches (generation + D scoring + uniform draws + the
     accept test) run as ONE jitted lax.scan dispatch — the per-batch
     torch loop shape (reference evaluate.py:70-83, ~1000 dispatches for
     a 50k quota at 20% acceptance) is the wrong grain when a dispatch
     costs O(10-100ms). K auto-sizes to ~32MB of proposal images.
  2. Acceptance runs ON DEVICE with the running max carried through the
     scan (exactly the reference's update-max-then-test ordering,
     drs.py:38-57), and accepted samples are compacted to the front by a
     stable argsort on the mask — so only the ~20% accepted images ever
     cross the device->host link. Measured on v5e (SNGAN-32, 50k quota):
     601 samples/s host-accept -> see VALIDATION.md for the packed rate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def minmax_uint8(images):
    """Per-image min-max -> uint8, the reference FID input normalization
    (_normalize_images, fid_score.py:77-101) as device math."""
    axis = tuple(range(1, images.ndim))
    mn = jnp.min(images, axis=axis, keepdims=True)
    mx = jnp.max(images, axis=axis, keepdims=True)
    return (255 * (images - mn) / (mx - mn + 1e-9)).astype(jnp.uint8)


class DRS:
    def __init__(self, gen_fn, disc_fn, nz, key=None, gamma=None,
                 percentile=80, batch_size=256, chunk=None):
        """gen_fn(z) -> images; disc_fn(images) -> logits. Both jittable,
        eval-mode closures over trained params. `chunk` = proposal batches
        per dispatch (None: auto-size to ~32MB of images)."""
        self.gen_fn = gen_fn
        self.disc_fn = disc_fn
        self.nz = nz
        self.batch_size = batch_size
        self.percentile = percentile
        self.gamma = gamma
        self.maximum = -1e5
        self.key = key if key is not None else jax.random.key(0)

        if chunk is None:
            # Auto-size K to ~256MB of proposal images in HBM. Dispatch
            # overhead dominates on this platform (~0.8s/dispatch measured
            # through the axon tunnel, payload-independent), and only the
            # accepted ~20% ever transfers, so the grain should be as
            # coarse as memory comfortably allows.
            img = jax.eval_shape(
                gen_fn, jax.ShapeDtypeStruct((batch_size, nz), np.float32)
            )
            batch_bytes = int(np.prod(img.shape)) * img.dtype.itemsize
            chunk = int(np.clip(256 * 2**20 // max(batch_bytes, 1), 1, 128))
        self.chunk = chunk

        def one_batch(k):
            kz, ku = jax.random.split(k)
            z = jax.random.normal(kz, (batch_size, nz))
            imgs = self.gen_fn(z)
            ldr = self.disc_fn(imgs)
            u = jax.random.uniform(ku, (batch_size,))
            return imgs, ldr, u

        @jax.jit
        def propose_chunk(key):
            _, out = jax.lax.scan(
                lambda _, k: (None, one_batch(k)), None,
                jax.random.split(key, self.chunk),
            )
            return out  # (K,B,H,W,C), (K,B), (K,B)

        self._propose_chunk = propose_chunk

        @jax.jit
        def propose_accept_chunk(key, maximum):
            """Scan K batches with the running max as carry; accept on
            device; compact accepted samples to the front."""

            def body(m, k):
                imgs, ldr, u = one_batch(k)
                m = jnp.maximum(m, jnp.max(ldr))
                acc = self._accept_device(ldr, u, m)
                return m, (imgs, acc)

            m, (imgs, acc) = jax.lax.scan(
                body, maximum, jax.random.split(key, self.chunk)
            )
            imgs = imgs.reshape((-1,) + imgs.shape[2:])
            acc = acc.reshape(-1)
            order = jnp.argsort(jnp.logical_not(acc), stable=True)
            return imgs[order], jnp.sum(acc), m

        self._propose_accept_chunk = propose_accept_chunk

        @jax.jit
        def to_uint8(x):
            return jnp.clip((x + 1) * 127.5, 0, 255).astype(jnp.uint8)

        # device-side quantization: the device->host link is the slow path
        # (~40MB/s through the axon tunnel), so uint8 results transfer 4x
        # less than [-1,1] float32
        self._to_uint8 = to_uint8
        # reference FID input normalization (fid_score.py:77-101) on device
        self._to_minmax_uint8 = jax.jit(minmax_uint8)

        @jax.jit
        def ldr_chunk(key):
            def body(_, k):
                z = jax.random.normal(k, (batch_size, nz))
                return None, self.disc_fn(self.gen_fn(z))

            _, ldr = jax.lax.scan(body, None,
                                  jax.random.split(key, self.chunk))
            return ldr

        self._ldr_chunk = ldr_chunk
        self.init_drs()

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def init_drs(self, num_batches=50):
        done = 0
        while done < num_batches:
            ldr = np.asarray(self._ldr_chunk(self._next_key()))
            ldr = ldr[: num_batches - done]
            self.maximum = max(self.maximum, float(ldr.max()))
            done += len(ldr)

    def _accept_device(self, ldr, u, maximum, eps=1e-6):
        """Device-side accept test, same math as the host `_accept`
        (reference drs.py:38-57): F from the log-density-ratio against the
        running max, gamma = per-batch percentile (or fixed), soft accept."""
        ldr_max = ldr - maximum
        F = ldr_max - jnp.log(1 - jnp.exp(ldr_max - eps))
        gamma = (
            jnp.percentile(F, self.percentile)
            if self.gamma is None else self.gamma
        )
        return jax.nn.sigmoid(F - gamma) > u

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

    def generate_images(self, num_images, return_uint8=False,
                        minmax_uint8=False):
        """Rejection-sample `num_images` accepted images ([-1,1] float NHWC,
        or uint8 via fixed 127.5 / per-image min-max quantization).

        Only accepted samples are transferred to host: the chunk returns
        (compacted images, accepted count, new running max) and the host
        slices the accepted prefix off the device array; any quantization
        happens on device BEFORE the transfer."""
        out = []
        n = 0
        while n < num_images:
            packed, n_acc, m = self._propose_accept_chunk(
                self._next_key(), jnp.float32(self.maximum)
            )
            self.maximum = float(m)
            k = int(n_acc)
            if k == 0:
                continue
            if minmax_uint8:
                packed = self._to_minmax_uint8(packed)
            elif return_uint8:
                packed = self._to_uint8(packed)
            out.append(np.asarray(packed[:k]))
            n += k
        return np.concatenate(out, axis=0)[:num_images]

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
        while num_batches > 0:
            _, ldr, u = self._propose_chunk(self._next_key())
            ldr, u = np.asarray(ldr), np.asarray(u)
            for row in range(min(len(ldr), num_batches)):
                mask = self._accept(ldr[row], u[row])
                total += len(mask)
                acc += int(mask.sum())
            num_batches -= len(ldr)
        return acc / total
