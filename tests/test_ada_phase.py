"""Polyphase ADA resample: the 2-phase planar pipeline (ops/ada_phase.py +
models/ada._apply_affine_polyphase) must compute the same resample as the
interleaved round-2 path, in both values and gradients, with the Pallas
kernels (interpret mode on CPU) agreeing with the XLA phase oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diagan_tpu.models.ada import SYM6, apply_affine, sample_affine_matrices
from diagan_tpu.ops.ada_phase import affine_gather_2phase, _gather2_xla

_TH = 0.5
CASES = {
    "identity": [1.0, 0.0, 40.0, 0.0, 1.0, 40.0],
    "rot_scale": [1.2 * np.cos(_TH), -1.2 * np.sin(_TH), 40.0,
                  1.2 * np.sin(_TH), 1.2 * np.cos(_TH), 30.0],
    "shrink": [0.5, 0.03, 50.0, -0.03, 0.5, 50.0],
    "clipped": [0.9, 0.1, -4.0, -0.2, 1.1, 150.0],
    "fractional": [1.01, -0.25, 21.25, 0.25, 0.97, 37.75],
}


def _phase_planes(rng, n, c, s):
    """Random planar phase planes padded like the real caller."""
    s2 = 2 * s
    srp = -(-s // 8) * 8
    slp = -(-s2 // 128) * 128
    v0 = np.zeros((n, c, srp, slp), np.float32)
    v1 = np.zeros((n, c, srp, slp), np.float32)
    v0[:, :, :s, :s2] = rng.normal(size=(n, c, s, s2))
    v1[:, :, :s, :s2] = rng.normal(size=(n, c, s, s2))
    return jnp.asarray(v0), jnp.asarray(v1), s2


@pytest.mark.parametrize("case", sorted(CASES))
def test_gather2_pallas_matches_xla_oracle(case):
    rng = np.random.default_rng(5)
    n, c, s, win = 2, 3, 96, 60
    v0, v1, s2 = _phase_planes(rng, n, c, s)
    coef = jnp.asarray(np.stack([CASES[case]] * n), jnp.float32)
    ys_x = affine_gather_2phase(v0, v1, coef, win, s2, backend="xla")
    ys_p = affine_gather_2phase(v0, v1, coef, win, s2, backend="pallas",
                                interpret=True)
    for yx, yp in zip(ys_x, ys_p):
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yx),
                                   rtol=5e-3, atol=1e-4)


@pytest.mark.parametrize("case", ["identity", "rot_scale", "clipped"])
def test_gather2_pallas_backward_matches_xla_adjoint(case):
    rng = np.random.default_rng(9)
    n, c, s, win = 2, 2, 96, 60
    v0, v1, s2 = _phase_planes(rng, n, c, s)
    coef = jnp.asarray(np.stack([CASES[case]] * n), jnp.float32)
    w = [jnp.asarray(rng.normal(size=(n, win // 2, win // 2, c)), jnp.float32)
         for _ in range(4)]

    def loss(a, b, backend):
        ys = affine_gather_2phase(a, b, coef, win, s2, backend=backend,
                                  interpret=(backend == "pallas"))
        return sum(jnp.sum(y * wi) for y, wi in zip(ys, w))

    gx = jax.grad(lambda a, b: loss(a, b, "xla"), argnums=(0, 1))(v0, v1)
    gp = jax.grad(lambda a, b: loss(a, b, "pallas"), argnums=(0, 1))(v0, v1)
    atol = 2e-4 if case == "clipped" else 2e-5
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=atol)


def test_gather2_phase_split_matches_plain_gather():
    """The phase oracle itself must agree with the round-2 single-buffer
    warp on the interleaved reconstruction."""
    from diagan_tpu.ops.warp_pallas import affine_gather

    rng = np.random.default_rng(3)
    n, c, s, win = 2, 3, 80, 52
    v0, v1, s2 = _phase_planes(rng, n, c, s)
    coef = jnp.asarray(np.stack([CASES["rot_scale"]] * n), jnp.float32)
    # interleave the logical region into the plain s-domain buffer
    x2 = jnp.stack([v0[:, :, :s, :s2], v1[:, :, :s, :s2]], axis=3)
    x2 = x2.reshape(n, c, s2, s2).transpose(0, 2, 3, 1)
    y = affine_gather(x2, coef, win, backend="xla")
    ys = _gather2_xla(v0, v1, coef, win, s2)
    for idx, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        np.testing.assert_allclose(np.asarray(ys[idx]),
                                   np.asarray(y[:, a::2, b::2, :]),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "h", [32, pytest.param(64, marks=pytest.mark.slow)])
def test_polyphase_pipeline_matches_interleaved(h):
    """Full apply_affine: polyphase vs the interleaved path on random
    affine draws (values)."""
    rng = np.random.default_rng(11)
    n = 4
    imgs = jnp.asarray(rng.normal(size=(n, h, h, 3)), jnp.float32)
    G = sample_affine_matrices(jax.random.PRNGKey(2), n, 0.9, h, h)
    out_i = apply_affine(imgs, G, polyphase=False)
    out_p = apply_affine(imgs, G, polyphase=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_i),
                               rtol=2e-4, atol=2e-5)


def test_polyphase_identity_reconstructs():
    """Orthonormal sym6 + identity transform must reconstruct the input
    through the polyphase path too."""
    rng = np.random.default_rng(13)
    n, h = 2, 32
    imgs = jnp.asarray(rng.normal(size=(n, h, h, 3)), jnp.float32)
    G = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
    out = apply_affine(imgs, G, polyphase=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs),
                               rtol=1e-4, atol=1e-4)


def test_polyphase_grad_matches_interleaved():
    """G-step-style gradient through the augment (d loss / d images)."""
    rng = np.random.default_rng(17)
    n, h = 2, 32
    imgs = jnp.asarray(rng.normal(size=(n, h, h, 3)), jnp.float32)
    G = sample_affine_matrices(jax.random.PRNGKey(4), n, 0.8, h, h)
    w = jnp.asarray(rng.normal(size=(n, h, h, 3)), jnp.float32)

    def loss(x, poly):
        return jnp.sum(apply_affine(x, G, polyphase=poly) * w)

    gi = jax.grad(lambda x: loss(x, False))(imgs)
    gp = jax.grad(lambda x: loss(x, True))(imgs)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gi),
                               rtol=2e-4, atol=2e-5)


def test_sym6_phase_identities():
    """The tap-split identities the pipeline is built on, checked directly
    against brute-force zero-stuffed convolution in numpy."""
    k = np.asarray(SYM6, np.float64)
    rng = np.random.default_rng(19)
    x = rng.normal(size=32)
    # up: x2[s] = sum_j k[j] * z[s + j], z = stuff2(x) padded by (6, 6)
    z = np.zeros(2 * 32 + 12)
    z[6:6 + 63:2] = x
    x2 = np.asarray([np.dot(k, z[s:s + 12]) for s in range(2 * 32)])
    b0, b1 = k[0::2], k[1::2]
    xpad = np.pad(x, (4, 4))
    up0 = np.asarray([np.dot(b0, xpad[m + 1:m + 7]) for m in range(32)])
    up1 = np.asarray([np.dot(b1, xpad[m + 2:m + 8]) for m in range(32)])
    np.testing.assert_allclose(up0, x2[0::2], atol=1e-12)
    np.testing.assert_allclose(up1, x2[1::2], atol=1e-12)
    # down: d[o] = sum_j k[11-j] y[2o + j - 5]
    y = rng.normal(size=76)
    ypad = np.pad(y, (8, 8))
    d = np.asarray([np.dot(k[::-1], ypad[2 * o + 3:2 * o + 15])
                    for o in range(32)])
    c0, c1 = k[10::-2], k[11::-2]
    y0, y1 = y[0::2], y[1::2]
    y0p, y1p = np.pad(y0, (4, 4)), np.pad(y1, (4, 4))
    dd = np.asarray([np.dot(c0, y0p[o + 2:o + 8]) + np.dot(c1, y1p[o + 1:o + 7])
                     for o in range(32)])
    np.testing.assert_allclose(dd, d, atol=1e-12)
