"""Adjoint-exactness tests for the ADA affine-warp Pallas backward.

The Pallas kernel (ops/warp_pallas.py) computes the bilinear gather's
backward as hat-weight matmuls; these tests pin it against XLA autodiff of
the same forward (the oracle the reference's CUDA grid_sample backward also
satisfies). Runs in interpret mode on the CPU test platform.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diagan_tpu.ops.warp_pallas import affine_gather

# coef rows: [ay, by, cy, ax, bx, cx]; qy = ay*i + by*j + cy
_TH = 0.6
CASES = {
    "identity": [1.0, 0.0, 30.0, 0.0, 1.0, 30.0],
    "rot_scale": [1.3 * np.cos(_TH), -1.3 * np.sin(_TH), 30.0,
                  1.3 * np.sin(_TH), 1.3 * np.cos(_TH), 20.0],
    "flip": [1.0, 0.0, 30.0, 0.0, -1.0, 90.0],
    "shrink": [0.4, 0.02, 40.0, -0.02, 0.4, 40.0],
    "clipped": [0.8, 0.1, -3.0, -0.2, 1.1, 120.0],
    "fractional": [1.01, -0.3, 17.25, 0.3, 0.97, 33.75],
}


def _grads(x2, coef, win, w, backend):
    def loss(x):
        out = affine_gather(x, coef, win, backend=backend,
                            interpret=(backend == "pallas"))
        return jnp.sum(out * w)

    return jax.grad(loss)(x2)


@pytest.mark.parametrize("case", sorted(CASES))
def test_pallas_backward_matches_xla_adjoint(case):
    rng = np.random.default_rng(7)
    n, s2, c, win = 2, 128, 3, 44
    x2 = jnp.asarray(rng.normal(size=(n, s2, s2, c)), jnp.float32)
    coef = jnp.asarray(np.stack([CASES[case]] * n), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, win, win, c)), jnp.float32)
    f_x = affine_gather(x2, coef, win, backend="xla")
    f_p = affine_gather(x2, coef, win, backend="pallas", interpret=True)
    # same bilinear weights, but source coordinates |q| ~ s2 carry ~1 ulp
    # (6e-5 at |q|=1000) of FMA-contraction freedom between the two
    # lowerings, which perturbs the hat weights by that amount
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x),
                               rtol=5e-3, atol=1e-4)
    g_x = _grads(x2, coef, win, w, "xla")
    g_p = _grads(x2, coef, win, w, "pallas")
    # clip-heavy cases pile hundreds of terms onto edge rows; the only
    # difference is fp32 summation order (matmul vs serial scatter)
    atol = 2e-4 if case == "clipped" else 2e-5
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-4, atol=atol)


def test_per_image_matrices_and_single_channel():
    rng = np.random.default_rng(3)
    n, s2, c, win = 3, 128, 1, 64  # win a multiple of the 32-pixel tile
    x2 = jnp.asarray(rng.normal(size=(n, s2, s2, c)), jnp.float32)
    coef = jnp.asarray(np.stack([CASES["identity"], CASES["rot_scale"],
                                 CASES["shrink"]]), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, win, win, c)), jnp.float32)
    g_x = _grads(x2, coef, win, w, "xla")
    g_p = _grads(x2, coef, win, w, "pallas")
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-4, atol=2e-5)


def test_augment_grad_parity_through_full_ada_pipeline():
    """G-step-style gradient through the full antialiased ADA pipeline is
    the same whether the warp backward runs in XLA or Pallas."""
    from diagan_tpu.models.ada import augment
    from diagan_tpu.ops import warp_pallas

    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    key = jax.random.PRNGKey(5)

    def loss(x):
        return jnp.sum(jnp.tanh(augment(x, key, p=1.0)))

    try:
        warp_pallas.set_backend("xla")
        g_x = jax.grad(loss)(imgs)
        # "pallas" on the CPU test platform auto-selects interpret mode
        warp_pallas.set_backend("pallas")
        g_p = jax.grad(loss)(imgs)
    finally:
        warp_pallas.set_backend("auto")

    assert np.isfinite(np.asarray(g_x)).all()
    assert float(jnp.linalg.norm(g_x)) > 0
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-4, atol=5e-5)
