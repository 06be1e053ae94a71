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
    """bench diffs its fields against the BEST value over the last 3
    BENCH_r*.json artifacts and flags >10% regressions (orientation-aware:
    ms_per_step is lower-better). Best-over-window so one broken artifact
    (BENCH_r04's timed-recompile 6008.7) can't become the baseline."""
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
    assert out["prev_bench"] == ["BENCH_r03.json"]
    assert sorted(r.split(":")[0] for r in out["regressions"]) == [
        "sg2_256_ms_per_step", "value"]
    assert "REGRESSION" in capsys.readouterr().err

    # within threshold -> clean
    out = {"value": 49.0, "drs_samples_per_sec": 1950.0,
           "sg2_256_ms_per_step": 410.0}
    bench._compare_with_previous(out, root=tmp_path)
    assert out["regressions"] == []

    # a newer BROKEN artifact must not mask regressions vs the older good
    # one: best-of-window keeps r03's 400 ms as the bar even though r04
    # recorded 6000
    (tmp_path / "BENCH_r04.json").write_text(_json.dumps({
        "parsed": {"value": 100.0, "sg2_256_ms_per_step": 6000.0}
    }))
    out = {"value": 95.0, "sg2_256_ms_per_step": 500.0}
    bench._compare_with_previous(out, root=tmp_path)
    assert out["prev_bench"] == ["BENCH_r03.json", "BENCH_r04.json"]
    assert [r.split(":")[0] for r in out["regressions"]] == [
        "sg2_256_ms_per_step"]
    assert "BENCH_r03.json" in out["regressions"][0]  # best source named

    # returning to the r03 level reads clean, not as a fake 12x win
    out = {"value": 95.0, "sg2_256_ms_per_step": 401.0}
    bench._compare_with_previous(out, root=tmp_path)
    assert out["regressions"] == []

    # window: only the last 3 files are consulted
    for n, v in ((1, 999.0), (2, 60.0)):
        (tmp_path / f"BENCH_r0{n}.json").write_text(_json.dumps({
            "parsed": {"value": v}
        }))
    out = {"value": 55.0}
    bench._compare_with_previous(out, root=tmp_path)
    assert out["prev_bench"] == [
        "BENCH_r02.json", "BENCH_r03.json", "BENCH_r04.json"]
    # best in-window is r04's 100.0 -> 55 is a regression; r01's 999 aged out
    assert [r.split(":")[0] for r in out["regressions"]] == ["value"]

    # basis fields (flop-count definitions, not measurements) are exempt
    (tmp_path / "BENCH_r05.json").write_text(_json.dumps({
        "parsed": {"sg2_256_gflop_per_step": 22942.8, "flops_per_step": 2672.9}
    }))
    out = {"sg2_256_gflop_per_step": 19148.8, "flops_per_step": 2672.9}
    bench._compare_with_previous(out, root=tmp_path)
    assert out["regressions"] == []


def test_sg2_measure_warms_exact_variant(tmp_path):
    """_sg2_measure must (a) pin ada_aug_p to the requested operating
    point and (b) have the exact (steps, aug_live) chunk variant cached
    before the timed call — the structural guarantee against the round-4
    timed-recompile artifact. Run on a tiny CPU model."""
    import numpy as np

    import bench
    from diagan_tpu.models.stylegan2 import (
        StyleGAN2Discriminator,
        StyleGAN2Generator,
    )
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (16, 16, 16, 3), np.uint8)
    tr = StyleGAN2Trainer(
        str(tmp_path), StyleGAN2Generator(size=16, style_dim=64, n_mlp=2),
        StyleGAN2Discriminator(size=16), imgs, num_steps=2, batch_size=2,
        log_every=2, save_every=10**9, seed=0, augment_p=0.0, max_chunk=2,
    )
    # simulate what broke round 4: adaptive ADA tuning nudged the
    # operating point off 0 before the measurement
    tr.ada_aug_p = 0.0005
    dt = bench._sg2_measure(tr, steps=2, ada_p=0.0)
    assert dt > 0
    assert tr.ada_aug_p == 0.0  # pinned, not inherited
    assert (2, False) in tr._plain_chunks  # the timed variant, cached
    # and the live variant is a distinct program, also warmed when benched
    bench._sg2_measure(tr, steps=2, ada_p=0.05)
    assert (2, True) in tr._plain_chunks
