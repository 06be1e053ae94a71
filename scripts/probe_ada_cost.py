"""One-off probe: cost of the sym6-antialiased ADA pipeline at 256px.

Times augment() forward and forward+grad (the D step differentiates through
the fake-batch augmentation) at the FFHQ-256 config (batch 16), antialiased
vs plain-bilinear, on the real chip. Informs whether the static worst-case
reflect pad is affordable in the 256px soak.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.models.ada import augment

B, H = 16, 256
x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (B, H, H, 3)),
                jnp.float32)
key = jax.random.key(0)


def timed(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # sync (block_until_ready unreliable)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


for aa in (True, False):
    f = jax.jit(lambda img, k, p, aa=aa: augment(img, k, p, antialias=aa))
    g = jax.jit(jax.grad(
        lambda img, k, p, aa=aa: augment(img, k, p, antialias=aa).sum()
    ))
    ms_f = timed(f, x, key, 0.3)
    ms_g = timed(g, x, key, 0.3)
    print(f"antialias={aa}: fwd {ms_f:.1f} ms  grad {ms_g:.1f} ms "
          f"(batch {B}, {H}px)")
