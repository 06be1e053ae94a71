"""Checkpoint IO with the reference's on-disk layout.

Layout parity (reference diagan-pkg/diagan/trainer/trainer.py:124-126,
188-204): per-net files `{ckpt_dir}/{name}/{name}_{step}_steps.pth` saved
every `save_steps`. The payload is a flax-serialization msgpack of the
NetState pytree (params + mutable collections + Adam state + step) instead
of a torch state_dict; logit pickles keep the exact reference format.
Writes are atomic (tmp + rename) for preemption safety.
"""
from __future__ import annotations

import os
from pathlib import Path

import jax
from flax import serialization


def ckpt_path(ckpt_dir, name, step) -> Path:
    return Path(ckpt_dir) / name / f"{name}_{step}_steps.pth"


def save_net(state, ckpt_dir, name, step) -> Path:
    path = ckpt_path(ckpt_dir, name, step)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = serialization.to_bytes(jax.device_get(state))
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path


def restore_net(template_state, path, params_only=False):
    """Restore a NetState from file, using template for pytree structure.

    params_only=True restores params/collections/step and keeps the
    template's optimizer state — for EVAL loads, where the checkpoint's
    optimizer tree (e.g. linear-decay schedule counters from training)
    need not match the throwaway eval-side optimizer."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] == b"PK\x03\x04":
        # A reference-trained torch pickle (zip container) dropped into the
        # ckpt_dir: convert it (params/collections/step; optimizer state
        # keeps the template's, as in params-only restores).
        from diagan_tpu.utils.torch_import import import_torch_net

        return import_torch_net(template_state, path)
    if not params_only:
        return serialization.from_bytes(template_state, data)
    raw = serialization.msgpack_restore(data)
    params = serialization.from_state_dict(template_state.params,
                                           raw["params"])
    state = serialization.from_state_dict(template_state.state,
                                          raw.get("state", {}))
    return template_state.replace(
        params=params, state=state,
        step=jax.numpy.asarray(raw.get("step", template_state.step)),
    )


def latest_step(ckpt_dir, name) -> int | None:
    d = Path(ckpt_dir) / name
    if not d.is_dir():
        return None
    steps = []
    for p in d.glob(f"{name}_*_steps.pth"):
        try:
            steps.append(int(p.stem.split("_")[-2]))
        except (ValueError, IndexError):
            continue
    return max(steps) if steps else None
