"""Pin the XLA cost-analysis property bench.py's MFU derivation rests on.

bench.py reports FLOPs/step as the compiled chunk program's cost-analysis
flops WITHOUT dividing by the scan length, because XLA counts a lax.scan
(while-loop) body ONCE — it does not multiply by the trip count. Round 2
assumed per-iteration counting, divided by CHUNK=50, and published an MFU
50x too low (1.37% vs the real ~69%; scripts/probe_mfu_flops.py).

If a jax/XLA upgrade ever starts scaling loop bodies by trip count, this
test fails and bench.py's derivation must be revisited.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest
from jax import lax


def _flops(length):
    x = jnp.ones((128, 128), jnp.float32)

    def body(c, _):
        # tanh keeps the matmul from being algebraically collapsed
        return jnp.tanh(c @ x + c), None

    f = jax.jit(lambda c: lax.scan(body, c, None, length=length)[0])
    ca = f.lower(jnp.ones((128, 128), jnp.float32)).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    if ca is None or "flops" not in ca:
        pytest.skip("backend reports no cost analysis")
    return float(ca["flops"])


def test_scan_body_flops_counted_once():
    f1, f32 = _flops(1), _flops(32)
    # body-once counting: same program flops at any trip count. A 2x
    # tolerance band still catches a switch to per-iteration scaling
    # (which would change the ratio to ~32).
    assert f32 < 2.0 * f1, (
        f"cost_analysis now scales scan bodies by trip count "
        f"({f32 / f1:.1f}x at length 32) — fix bench.py's FLOPs/step "
        f"derivation (it must divide by the scan length again)"
    )
