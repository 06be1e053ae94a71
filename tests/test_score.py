"""Golden tests for LDR scoring parity with the reference formulas."""
import numpy as np
import pytest

from diagan_tpu.score import calculate_scores, prepare_sample_weights


def _reference_scores(logits, start, end):
    """Independent numpy transliteration of the reference math
    (diagan-pkg/diagan/utils/plot.py:220-249) used as oracle."""
    arr = np.array([v for k, v in logits.items() if start <= k < end])
    out = {
        "ldr": arr[-1],
        "ldrd": np.abs(arr[1:] - arr[:-1]).mean(0),
        "ldrv": np.var(arr, axis=0, ddof=1),
        "ldrm": arr.mean(0),
    }
    for t in np.arange(0.1, 10.0, 0.1):
        s = arr.mean(0) + t * np.std(arr, 0, ddof=1)
        s = np.clip(s, 1e-2, None)
        s = np.clip(s, None, s.min() * 50)
        out[f"ldr_conf_{t:.1f}_ratio_50"] = s
    return out


@pytest.fixture
def logits():
    rng = np.random.default_rng(0)
    return {step: rng.standard_normal(64) * 3 for step in range(35000, 40001, 100)}


def test_base_scores_match(logits):
    got = calculate_scores(logits, start_epoch=35000, end_epoch=40000)
    want = _reference_scores(logits, 35000, 40000)
    for key in ("ldr", "ldrd", "ldrv", "ldrm"):
        np.testing.assert_allclose(got[key], want[key], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("t", [0.3, 1.0, 3.0, 5.0, 9.9])
def test_ldr_conf_scores_match(logits, t):
    got = calculate_scores(logits, start_epoch=35000, end_epoch=40000)
    want = _reference_scores(logits, 35000, 40000)
    key = f"ldr_conf_{t:.1f}_ratio_50"
    np.testing.assert_allclose(got[key], want[key], rtol=1e-5, atol=1e-6)


def test_window_excludes_end(logits):
    got = calculate_scores(logits, start_epoch=35000, end_epoch=40000)
    # snapshot at exactly end_epoch=40000 must be excluded; last is 39900
    np.testing.assert_allclose(got["ldr"], logits[39900])


def test_buffer_format_matches_dict_format(logits):
    steps = np.array(sorted(logits))
    buf = np.stack([logits[s] for s in steps])
    # add an unused slot (step = -1) that must be ignored
    steps = np.concatenate([steps, [-1]])
    buf = np.concatenate([buf, np.zeros((1, buf.shape[1]))])
    got = calculate_scores((steps, buf), start_epoch=35000, end_epoch=40000)
    want = calculate_scores(logits, start_epoch=35000, end_epoch=40000)
    for key in ("ldr", "ldrm", "ldrv", "ldr_conf_0.3_ratio_50"):
        np.testing.assert_allclose(got[key], want[key], rtol=1e-6)


def test_score_dict_key_surface(logits):
    got = calculate_scores(logits, start_epoch=35000, end_epoch=40000)
    keys = set(got)
    assert {"ldr", "ldrd", "ldrv", "ldrm"} <= keys
    assert len([k for k in keys if k.startswith("ldr_conf_")]) == 99
    assert "ldr_conf_5.0_ratio_50" in keys


def test_prepare_sample_weights_floor():
    w = np.array([0.0, 1e-9, 0.5, 2.0])
    out = prepare_sample_weights(w, eps=1e-6)
    assert out[0] == 1e-6 and out[1] == 1e-6
    np.testing.assert_allclose(out[2:], [0.5, 2.0])


def test_normalize_logits_restores_conf_dynamic_range():
    """The opt-in median-centering deviation. Saturation mechanism (see
    docs/VALIDATION.md): real logits sit near +7 while one floored example
    pins clip_max_ratio's cap to 1e-2*50=0.5, so EVERY other example caps
    at 0.5 and minority/majority contrast vanishes. Median-centering puts
    the stable majority at the clip_min floor instead, so the cap spreads
    the high-temporal-variance minority away from it."""
    from diagan_tpu.score import calculate_scores

    rng = np.random.default_rng(0)
    n, s = 200, 10
    logits = {}
    for step in range(0, s * 100, 100):
        snap = 7.0 + rng.normal(0, 0.01, n)      # stable majority
        snap[:20] = 7.0 + rng.normal(0, 2.0, 20)  # minority: high temporal var
        snap[-1] = -5.0                           # dead example pins the cap
        logits[step] = snap
    plain = np.asarray(
        calculate_scores(logits, 0, s * 100)["ldr_conf_5.0_ratio_50"])
    normed = np.asarray(
        calculate_scores(logits, 0, s * 100, normalize_logits=True)[
            "ldr_conf_5.0_ratio_50"])

    def contrast(w):
        return w[:20].mean() / w[20:-1].mean()

    assert contrast(plain) < 1.5          # saturated: all capped at 0.5
    assert contrast(normed) > 5.0         # restored dynamic range
    assert plain.min() >= 1e-2            # default path: reference formula


def test_warn_if_degenerate_weights():
    """Near-uniform resample weights (the saturation failure mode) must
    warn loudly before a phase-2 run silently trains unweighted."""
    import warnings

    from diagan_tpu.score import warn_if_degenerate_weights

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # healthy weights: no warning
        assert not warn_if_degenerate_weights(
            np.array([0.5, 1.0, 3.0]), "ldr_conf_0.3_ratio_50")

    with pytest.warns(RuntimeWarning, match="near-uniform"):
        assert warn_if_degenerate_weights(
            np.full(100, 0.5) + np.linspace(0, 1e-3, 100), "ldr_conf")
