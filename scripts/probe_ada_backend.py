"""A/B the upfirdn backend (pallas vs xla) and fp32 vs bf16 images for the
full fused ADA augment at 256px, fwd and grad."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.models.ada import augment
import importlib

U = importlib.import_module("diagan_tpu.ops.upfirdn2d")

B, H = 16, 256
rng = np.random.default_rng(0)
x32 = jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3)), jnp.float32)
key = jax.random.key(0)


def timed(f, *args, iters=15):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3


for backend in ("pallas", "xla"):
    U.set_backend(backend)
    for dt in (jnp.float32, jnp.bfloat16):
        x = x32.astype(dt)
        f = jax.jit(lambda img, k: augment(img, k, 0.3))
        g = jax.jit(jax.grad(
            lambda img, k: augment(img, k, 0.3).astype(jnp.float32).sum()
        ))
        ms_f = timed(f, x, key)
        ms_g = timed(g, x, key)
        print(f"{backend:6s} {dt.__name__:9s}: fwd {ms_f:7.1f} ms  "
              f"grad {ms_g:7.1f} ms", flush=True)
U.set_backend("auto")
