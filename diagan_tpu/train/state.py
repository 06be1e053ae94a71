"""Per-network train state: params + mutable collections + optimizer state.

The reference keeps this implicit in torch Modules/Optimizers; here it is
an explicit pytree so the whole (G, D, D_drs) triple threads through one
jitted fused step and checkpoints as a unit.
"""
from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


@struct.dataclass
class NetState:
    params: Any
    state: Any  # mutable collections: {'batch_stats': ..., 'spectral': ...}
    opt_state: Any
    step: jax.Array


def linear_decay_schedule(lr: float, num_steps: int):
    """lr(step) = lr * max(0, 1 - step/num_steps) — parity with the
    reference's SNGAN-style DRS_LRScheduler linear decay to zero
    (diagan-pkg/diagan/trainer/scheduler.py:40-78)."""
    return lambda step: lr * jax.numpy.maximum(0.0, 1.0 - step / num_steps)


def make_optimizer(lr: float, betas: tuple, num_steps: int | None, decay: str):
    if decay == "linear" and num_steps:
        sched = linear_decay_schedule(lr, num_steps)
    else:
        sched = lr
    return optax.adam(sched, b1=betas[0], b2=betas[1], eps=1e-8)


def create_net_state(module, rngs, example_inputs, tx, **apply_kwargs) -> NetState:
    variables = module.init(rngs, *example_inputs, **apply_kwargs)
    params = variables.pop("params")
    return NetState(
        params=params,
        state=variables,  # whatever collections remain (batch_stats/spectral)
        opt_state=tx.init(params),
        step=jax.numpy.zeros((), jax.numpy.int32),
    )
