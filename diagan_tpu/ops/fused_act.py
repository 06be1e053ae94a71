"""Fused bias-add + LeakyReLU (+ sqrt(2) gain), NHWC.

Behavioral spec: the reference CUDA `fused_bias_act` op restricted to how
the model zoo actually calls it (reference
`diagan-pkg/diagan/models/op/fused_act.py:87-119`):

    forward (act=3, grad=0):  y = scale * leaky_relu(x + bias, slope)
    backward (grad mode 31):  dx = scale * g * (slope + (1-slope)*[y > 0])
    bias grad:                db = sum(dx, axis=(N, H, W))

On TPU this is a textbook XLA elementwise fusion, so the default path is
plain jnp (XLA fuses it into the producing matmul/conv). A Pallas kernel
(`_pallas_forward`/`_pallas_backward`) is provided as the explicit
TPU-native equivalent of the CUDA kernel and is used when
`diagan_tpu.ops.fused_act.USE_PALLAS` is enabled; both share one
`custom_vjp` implementing the mode-31 semantics (gradient computed from the
*sign of the saved output*, not the input — matching the reference's
save-for-backward choice).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

# Flipped on TPU backends at import of diagan_tpu.ops; pure-jnp fallback
# elsewhere (CPU tests run the Pallas kernels in interpret mode explicitly).
USE_PALLAS = False

_SLOPE = 0.2
_SCALE = math.sqrt(2.0)


def _jnp_forward(x, bias, slope, scale):
    y = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(y > 0, y, y * slope) * scale


def _pallas_forward(x, bias, slope, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    c = orig_shape[-1]
    xm = x.reshape(-1, c)
    m = xm.shape[0]
    tm = min(m, 1024)

    def kernel(x_ref, b_ref, o_ref):
        y = x_ref[:] + b_ref[:]
        o_ref[:] = jnp.where(y > 0, y, y * slope) * scale

    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, tm),),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
    )(xm, bias.reshape(1, c).astype(x.dtype))
    return out.reshape(orig_shape)


def _pallas_backward(g, y, slope, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = g.shape
    c = orig_shape[-1]
    gm = g.reshape(-1, c)
    ym = y.reshape(-1, c)
    m = gm.shape[0]
    tm = min(m, 1024)

    def kernel(g_ref, y_ref, dx_ref):
        mask = y_ref[:] > 0
        dx_ref[:] = jnp.where(mask, g_ref[:], g_ref[:] * slope) * scale

    dx = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, tm),),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), g.dtype),
    )(gm, ym)
    return dx.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu(x, bias, negative_slope=_SLOPE, scale=_SCALE):
    """y = scale * leaky_relu(x + bias) with bias broadcast over the last axis."""
    if USE_PALLAS:
        return _pallas_forward(x, bias, negative_slope, scale)
    return _jnp_forward(x, bias, negative_slope, scale)


def _flr_fwd(x, bias, negative_slope, scale):
    y = fused_leaky_relu(x, bias, negative_slope, scale)
    return y, y


def _flr_bwd(negative_slope, scale, y, g):
    if USE_PALLAS:
        dx = _pallas_backward(g, y, negative_slope, scale)
    else:
        dx = jnp.where(y > 0, g, g * negative_slope) * scale
    db = jnp.sum(dx, axis=tuple(range(dx.ndim - 1)))
    return dx, db


fused_leaky_relu.defvjp(_flr_fwd, _flr_bwd)
