"""On-device per-example logit recorder — the phase-1 diagnosis instrument.

The reference sweeps the full train set through D every `logit_save_steps`
steps inside the recording window, with a host<->device sync per batch
(`_get_logit`, reference diagan-pkg/diagan/trainer/trainer.py:142-156), and
accumulates {step: float64[N]} dicts pickled to `logits_{name}.pkl`
(trainer.py:138-140, 328-346).

TPU-native redesign: the whole sweep is ONE jitted lax.scan over
static-shape index batches (ragged tail handled by a validity mask), the
scatter `logit_list[idx] = logits` happens on device into a preallocated
[num_snapshots, N] ring buffer, and only checkpoint-time pickling touches
the host. The buffer + step vector are part of the checkpointed state, so
a mid-window restart loses nothing.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.data.pipeline import full_sweep_index_batches


class LogitRecorder:
    def __init__(self, num_data: int, max_snapshots: int, batch_size: int = 256,
                 mesh=None):
        self.num_data = num_data
        self.max_snapshots = max_snapshots
        self.mesh = mesh
        self.buffer = jnp.zeros((max_snapshots, num_data), jnp.float32)
        self.steps = np.full((max_snapshots,), -1, np.int64)
        self.count = 0
        idx, mask = full_sweep_index_batches(num_data, batch_size)
        if mesh is not None:
            # pad the batch list to a multiple of the mesh size with fully
            # masked batches so each device scans an equal static share
            n_dev = int(np.prod(mesh.devices.shape))
            pad = (-len(idx)) % n_dev
            if pad:
                idx = np.concatenate([idx, np.zeros((pad,) + idx.shape[1:],
                                                    idx.dtype)])
                mask = np.concatenate([mask, np.zeros((pad,) + mask.shape[1:],
                                                      mask.dtype)])
        self._idx = jnp.asarray(idx)
        self._mask = jnp.asarray(mask)
        self._batch_ids = jnp.arange(self._idx.shape[0], dtype=jnp.int32)
        self._sweep = None

    def make_row_fn(self, d_fwd, quantized):
        """(params, state, images, key) -> float32[num_data] sweep row.

        Pure (traceable) — usable standalone (record()) or spliced into a
        larger jitted program (the train chunk folds the sweep in so the
        recording window costs no extra dispatch/sync,
        train/steps.py make_train_chunk_with_sweep). Under a mesh the
        returned callable is the shard_map'd sharded sweep.
        """
        num_data = self.num_data

        def scan_row(params, state, images, key, idx_all, mask_all, batch_ids):
            def body(carry, xs):
                buf = carry
                idx, mask, batch_i = xs
                batch = jnp.take(images, idx, axis=0)
                if quantized:
                    batch = batch.astype(jnp.float32) / 127.5 - 1.0
                # per-batch rng keyed by the GLOBAL batch id: train-mode
                # sweeps resample dropout like the reference's stochastic
                # forwards (a fixed mask shifts logit levels and saturates
                # the ldr_conf clip downstream), and the sharded sweep stays
                # bit-identical to the single-device one
                (logits, _), _ = d_fwd(
                    params, state, batch, jax.random.fold_in(key, batch_i)
                )
                # padding lanes scatter out-of-bounds and are dropped, so a
                # padded duplicate of a real index can never clobber it
                idx_eff = jnp.where(mask, idx, num_data)
                buf = buf.at[idx_eff].set(logits, mode="drop")
                return buf, None

            row, _ = jax.lax.scan(
                body, jnp.zeros((num_data,), jnp.float32),
                (idx_all, mask_all, batch_ids),
            )
            return row

        if self.mesh is None:
            def row_fn(params, state, images, key):
                return scan_row(params, state, images, key,
                                self._idx, self._mask, self._batch_ids)

            return row_fn

        # Sharded sweep: split the batch list over the mesh — each device
        # forwards its share of the dataset and scatters into a local row;
        # rows are disjoint (every real index lives in exactly one batch),
        # so a psum reassembles the full row on every device. This is the
        # TPU form of the reference's distributed logit recording
        # (concat_all_gather of (idx, logit), stylegan2/train_ffhq.py:128-161).
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]

        def local(params, state, images, key, idx, mask, batch_ids):
            row = scan_row(params, state, images, key, idx, mask, batch_ids)
            return jax.lax.psum(row, axis)

        sharded_row = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(axis)),
            out_specs=P(), check_vma=False,
        )

        def row_fn(params, state, images, key):
            return sharded_row(params, state, images, key,
                               self._idx, self._mask, self._batch_ids)

        return row_fn

    def _build_sweep(self, d_fwd, quantized):
        row_fn = self.make_row_fn(d_fwd, quantized)

        @jax.jit
        def sweep(params, state, images, buffer, slot, key):
            return buffer.at[slot].set(row_fn(params, state, images, key))

        return sweep

    def commit_row(self, buffer, global_step: int):
        """Adopt a buffer whose next slot was filled inside an external
        jitted program (the folded train chunk) — no transfer, no sync."""
        if self.count >= self.max_snapshots:
            raise RuntimeError("logit buffer full; raise max_snapshots")
        self.buffer = buffer
        self.steps[self.count] = int(global_step)
        self.count += 1

    def record(self, d_fwd, params, state, images, global_step: int,
               quantized: bool = True, key=None):
        """Run a full-dataset D sweep and store it in the next buffer slot.

        d_fwd(params, state, batch, rng) -> ((logits, aux), new_state) with
        update_stats=False; the recorder never mutates D state — matching
        the reference's sweep (trainer.py:142-148).
        """
        if self.count >= self.max_snapshots:
            raise RuntimeError("logit buffer full; raise max_snapshots")
        if self._sweep is None:
            self._sweep = self._build_sweep(d_fwd, quantized)
        if key is None:
            key = jax.random.key(int(global_step))
        self.buffer = self._sweep(
            params, state, images, self.buffer, self.count, key
        )
        self.steps[self.count] = int(global_step)
        self.count += 1

    def as_dict(self) -> dict:
        """Reference pickle format: {global_step: float64[N]}."""
        buf = np.asarray(self.buffer[: self.count], np.float64)
        return {int(s): buf[i] for i, s in enumerate(self.steps[: self.count])}

    def save(self, path):
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self.as_dict(), f)

    # -- checkpoint support ------------------------------------------------
    def state_dict(self):
        return {
            "buffer": np.asarray(self.buffer),
            "steps": self.steps.copy(),
            "count": self.count,
        }

    def load_state_dict(self, d):
        self.buffer = jnp.asarray(d["buffer"])
        self.steps = np.asarray(d["steps"]).copy()
        self.count = int(d["count"])
