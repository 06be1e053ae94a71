"""Golden tests for the ops layer against the naive oracle implementations."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diagan_tpu.ops import fused_act
from diagan_tpu.ops.upfirdn2d import (
    _upfirdn2d_conv,
    make_resample_kernel,
    upfirdn2d,
    upfirdn2d_ref,
)

# (up, down, pad, k1d) — the configs StyleGAN2 actually exercises, plus
# asymmetric-pad and crop (negative pad) edge cases.
CONFIGS = [
    (1, 1, (1, 1), [1, 3, 3, 1]),        # blur k=4
    (1, 1, (1, 1), [1, 2, 1]),           # blur k=3
    (1, 1, (2, 1), [1, 3, 3, 1]),        # asymmetric pad (pre-conv blur)
    (2, 1, (2, 1), [1, 3, 3, 1]),        # upsample x2
    (1, 2, (1, 1), [1, 3, 3, 1]),        # downsample x2
    (2, 1, (1, 0), [1, 2, 1]),
    (1, 2, (0, 0), [1, 1]),
    (1, 1, (-1, 2), [1, 3, 3, 1]),       # negative pad = crop
    (3, 2, (2, 2), [1, 3, 3, 1]),        # uncommon factors, generality
]


@pytest.mark.parametrize("up,down,pad,k1d", CONFIGS)
def test_upfirdn2d_matches_oracle(up, down, pad, k1d):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 9, 3)).astype(np.float32)
    k = np.asarray(make_resample_kernel(k1d))
    got = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad)
    want = upfirdn2d_ref(x, k, up=up, down=down, pad=pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,pad,k1d", CONFIGS[:6])
def test_upfirdn2d_custom_vjp_matches_autodiff(up, down, pad, k1d):
    """The g_pad backward rule must equal XLA autodiff of the raw conv impl."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 2)).astype(np.float32))
    k = make_resample_kernel(k1d)

    def f_custom(x):
        return jnp.sum(jnp.sin(upfirdn2d(x, k, up=up, down=down, pad=pad)))

    def f_auto(x):
        p0, p1 = pad
        return jnp.sum(
            jnp.sin(_upfirdn2d_conv(x, k, up, up, down, down, p0, p1, p0, p1))
        )

    g_custom = jax.grad(f_custom)(x)
    g_auto = jax.grad(f_auto)(x)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), rtol=1e-5, atol=1e-5
    )


def test_make_resample_kernel_normalized():
    k = make_resample_kernel([1, 3, 3, 1])
    assert k.shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)


def test_fused_leaky_relu_forward():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    y = fused_act.fused_leaky_relu(x, b)
    want = jnp.where(x + b > 0, x + b, (x + b) * 0.2) * math.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_fused_leaky_relu_grad_matches_autodiff():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 5, 5, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))

    def f(x, b):
        return jnp.sum(jnp.cos(fused_act.fused_leaky_relu(x, b)))

    def f_plain(x, b):
        y = x + b.reshape(1, 1, 1, -1)
        return jnp.sum(jnp.cos(jnp.where(y > 0, y, y * 0.2) * math.sqrt(2.0)))

    gx, gb = jax.grad(f, argnums=(0, 1))(x, b)
    gx2, gb2 = jax.grad(f_plain, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb2), rtol=1e-5, atol=1e-5)


def test_fused_leaky_relu_pallas_interpret_matches():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    want = fused_act.fused_leaky_relu(x, b)
    try:
        fused_act.USE_PALLAS = True
        with pltpu.force_tpu_interpret_mode():
            got = fused_act.fused_leaky_relu(x, b)
            gx = jax.grad(lambda x: jnp.sum(fused_act.fused_leaky_relu(x, b)))(x)
    finally:
        fused_act.USE_PALLAS = False
    gx_want = jax.grad(lambda x: jnp.sum(fused_act.fused_leaky_relu(x, b)))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("up,down,pad,k1d", CONFIGS[:5])
def test_upfirdn2d_pallas_matches_oracle(up, down, pad, k1d):
    from diagan_tpu.ops.fir_pallas import upfirdn2d_pallas

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 12, 9, 3)).astype(np.float32))
    k = make_resample_kernel(k1d)
    got = upfirdn2d_pallas(x, k, up=up, down=down, pad=pad, interpret=True)
    want = upfirdn2d_ref(np.asarray(x), np.asarray(k), up=up, down=down, pad=pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_separate_kernel_detection():
    """Rank-1 2D kernels (every reference resample kernel) decompose into
    1-D factors whose outer product reproduces them; rank-2 kernels and
    already-1-D kernels are left alone."""
    from diagan_tpu.ops.upfirdn2d import _separate_kernel

    k = np.asarray(make_resample_kernel([1, 3, 3, 1]))
    sep = _separate_kernel(k)
    assert sep is not None
    ky, kx = sep
    np.testing.assert_allclose(np.outer(ky, kx), k, rtol=1e-6, atol=1e-7)

    assert _separate_kernel(k * 4.0) is not None        # scaled (ToRGB skip)
    assert _separate_kernel(k[:1, :]) is None           # 1-D row
    assert _separate_kernel(k[:, :1]) is None           # 1-D col
    rank2 = k + np.eye(4, dtype=np.float32) * 0.01
    assert _separate_kernel(rank2) is None
