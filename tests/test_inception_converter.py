"""Validate the torch->Flax Inception weight converter mechanics.

No pretrained weights exist in this container, so we fabricate a
state_dict with torch conventions (OIHW conv kernels in definition order,
bn weight/bias/running stats, fc) whose shapes mirror the Flax model, and
check order-stable assignment, transposition, and that loaded weights
actually change the forward pass deterministically.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diagan_tpu.eval.inception import InceptionV3, _natural_key, _walk, load_torch_weights


def _fabricate_state_dict(model, seed=0):
    template = jax.device_get(
        model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    )
    params = template["params"]
    conv_paths = sorted(
        (p for p, v in _walk(params) if p[-1] == "kernel" and v.ndim == 4),
        key=_natural_key,
    )
    rng = np.random.default_rng(seed)
    sd = {}
    for i, p in enumerate(conv_paths):
        hwio = _get(params, p).shape
        oihw = (hwio[3], hwio[2], hwio[0], hwio[1])
        c = hwio[3]
        fan_in = hwio[0] * hwio[1] * hwio[2]
        sd[f"m{i:03d}.conv.weight"] = torch.tensor(
            (rng.standard_normal(oihw) / np.sqrt(fan_in)).astype(np.float32)
        )
        sd[f"m{i:03d}.bn.weight"] = torch.tensor(np.full(c, 1.5, np.float32))
        sd[f"m{i:03d}.bn.bias"] = torch.tensor(np.full(c, 0.25, np.float32))
        sd[f"m{i:03d}.bn.running_mean"] = torch.tensor(np.zeros(c, np.float32))
        sd[f"m{i:03d}.bn.running_var"] = torch.tensor(np.ones(c, np.float32))
    dense_path = next(
        p for p, v in _walk(params) if p[-1] == "kernel" and v.ndim == 2
    )
    dk = _get(params, dense_path).shape
    sd["fc.weight"] = torch.tensor(
        rng.standard_normal((dk[1], dk[0])).astype(np.float32)
    )
    sd["fc.bias"] = torch.tensor(np.zeros(dk[1], np.float32))
    return sd, conv_paths


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


@pytest.mark.slow
def test_converter_roundtrip(tmp_path):
    model = InceptionV3()
    sd, conv_paths = _fabricate_state_dict(model)
    f = tmp_path / "weights.pth"
    torch.save(sd, f)
    variables = load_torch_weights(model, str(f))

    # first conv kernel transposed OIHW -> HWIO exactly
    got = np.asarray(_get(variables["params"], conv_paths[0]))
    want = sd["m000.conv.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
    # bn scale landed
    bn_path = conv_paths[0][:-2] + ("BatchNorm_0", "scale")
    assert float(np.asarray(_get(variables["params"], bn_path))[0]) == 1.5

    # loaded model produces different (finite) output than random init
    x = jnp.zeros((1, 299, 299, 3)) + 0.1
    init_vars = model.init(jax.random.key(0), x)
    y_init = model.apply(init_vars, x)[0]
    y_loaded = model.apply(variables, x)[0]
    assert np.isfinite(np.asarray(y_loaded)).all()
    assert float(jnp.abs(y_loaded - y_init).max()) > 1e-6


@pytest.mark.slow
def test_converter_rejects_wrong_count(tmp_path):
    model = InceptionV3()
    sd, _ = _fabricate_state_dict(model)
    del sd["m000.conv.weight"]
    f = tmp_path / "bad.pth"
    torch.save(sd, f)
    with pytest.raises(ValueError, match="conv count mismatch"):
        load_torch_weights(model, str(f))


@pytest.mark.slow
def test_featurizer_scan_matches_per_batch_fwd():
    """The slabbed scan path returns the same features as per-batch _fwd
    calls, including padding of the ragged tail and uint8 device-side
    dequantization."""
    from diagan_tpu.eval.inception import InceptionFeaturizer

    feat = InceptionFeaturizer(batch_size=16)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (37, 16, 16, 3), np.uint8)
    f_scan, l_scan = feat.features_and_logits(imgs)
    assert f_scan.shape[0] == 37 and l_scan.shape[0] == 37
    # oracle: direct batched forward, same batch split
    ref = []
    padded = np.concatenate([imgs, np.zeros_like(imgs[:11])])
    for i in range(0, 48, 16):
        x = jnp.asarray(padded[i : i + 16]).astype(jnp.float32) / 127.5 - 1.0
        f, _ = feat._fwd(x)
        ref.append(np.asarray(f))
    ref = np.concatenate(ref)[:37]
    if feat._feat_scale is not None:
        ref = (ref - feat._feat_shift) * feat._feat_scale
    # raw features agree to ~3e-9; the random-fallback standardization
    # affine (scale up to ~1e5) amplifies that float noise, hence the
    # looser post-affine tolerance
    np.testing.assert_allclose(f_scan, ref, rtol=1e-2, atol=1e-3)
