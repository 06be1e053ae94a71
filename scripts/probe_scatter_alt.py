"""Probe alternatives for the ADA warp backward (scatter-add of 4-tap
bilinear contributions from the (B, W, W) output window into the
(B, S, S, 3) upsampled buffer):

(a) XLA's autodiff scatter (baseline, ~2.7s measured);
(b) jax.ops.segment_sum over flattened linear indices (sort-based);
(c) manual scatter-add via .at[].add with batched 2-D indices.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, S, W = 16, 1304, 524
rng = np.random.default_rng(0)
g = jnp.asarray(rng.uniform(-1, 1, (B, W, W, 3)), jnp.float32)
qy = jnp.asarray(rng.uniform(1, S - 2, (B, W, W)), jnp.float32)
qx = jnp.asarray(rng.uniform(1, S - 2, (B, W, W)), jnp.float32)


def timed(f, *args, iters=8):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def taps(qy, qx):
    y0 = jnp.floor(qy).astype(jnp.int32)
    x0 = jnp.floor(qx).astype(jnp.int32)
    fy = qy - y0
    fx = qx - x0
    return [
        (y0, x0, (1 - fy) * (1 - fx)),
        (y0, x0 + 1, (1 - fy) * fx),
        (y0 + 1, x0, fy * (1 - fx)),
        (y0 + 1, x0 + 1, fy * fx),
    ]


def scatter_at(g):
    out = jnp.zeros((B, S, S, 3), jnp.float32)
    b = jnp.arange(B)[:, None, None]
    for y, x, w in taps(qy, qx):
        out = out.at[b, y, x].add(g * w[..., None])
    return out


def scatter_seg(g):
    # one segment id per (b, y, x): flatten everything, 4 taps concatenated
    ids, vals = [], []
    boff = (jnp.arange(B)[:, None, None] * S * S)
    for y, x, w in taps(qy, qx):
        ids.append((boff + y * S + x).reshape(-1))
        vals.append((g * w[..., None]).reshape(-1, 3))
    ids = jnp.concatenate(ids)
    vals = jnp.concatenate(vals)
    out = jax.ops.segment_sum(vals, ids, num_segments=B * S * S)
    return out.reshape(B, S, S, 3)


if __name__ == "__main__":
    for name, f in (("at-add", scatter_at), ("segment-sum", scatter_seg)):
        jf = jax.jit(f)
        try:
            print(f"{name:12s} {timed(jf, g):8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)
