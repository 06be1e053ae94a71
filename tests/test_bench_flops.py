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


def test_bench_regression_comparator(tmp_path, capsys):
    """bench diffs its fields against the newest BENCH_r*.json and flags
    >10% regressions (orientation-aware: ms_per_step is lower-better)."""
    import json as _json

    import bench

    (tmp_path / "BENCH_r03.json").write_text(_json.dumps({
        "parsed": {"value": 50.0, "drs_samples_per_sec": 2000.0,
                   "sg2_256_ms_per_step": 400.0, "metric": "x"}
    }))
    # regression on two fields, improvement on one
    out = {"value": 40.0, "drs_samples_per_sec": 2100.0,
           "sg2_256_ms_per_step": 500.0}
    bench._compare_with_previous(out, root=tmp_path)
    assert out["prev_bench"] == "BENCH_r03.json"
    assert sorted(r.split(":")[0] for r in out["regressions"]) == [
        "sg2_256_ms_per_step", "value"]
    assert "REGRESSION" in capsys.readouterr().err

    # within threshold -> clean
    out = {"value": 49.0, "drs_samples_per_sec": 1950.0,
           "sg2_256_ms_per_step": 410.0}
    bench._compare_with_previous(out, root=tmp_path)
    assert out["regressions"] == []

    # newest file wins
    (tmp_path / "BENCH_r04.json").write_text(_json.dumps({
        "parsed": {"value": 100.0}
    }))
    out = {"value": 95.0}
    bench._compare_with_previous(out, root=tmp_path)
    assert out["prev_bench"] == "BENCH_r04.json" and out["regressions"] == []
