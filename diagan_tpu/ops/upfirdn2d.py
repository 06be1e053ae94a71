"""upfirdn2d: fused upsample -> pad -> 2D FIR filter -> downsample, NHWC.

Behavioral spec (parity target, NOT a port): the reference CUDA op
`upfirdn2d(input, kernel, up, down, pad)` whose semantics are pinned by the
pure-torch oracle at reference
`diagan-pkg/diagan/models/op/upfirdn2d.py:159-200` (`upfirdn2d_native`):

  1. zero-stuff each pixel with (up-1) trailing zeros per axis
     -> size in*up,
  2. pad by (pad0, pad1) per axis (negative pads crop),
  3. cross-correlate with flip(kernel) (= true convolution with `kernel`),
  4. keep every `down`-th output pixel.

  out = (in*up + pad0 + pad1 - k) // down + 1  per spatial axis.

TPU-native design: a single `lax.conv_general_dilated` with
`lhs_dilation=up` does steps 1-4 in one fused XLA convolution. XLA's
lhs_dilation inserts zeros *between* elements ((in-1)*up + 1 instead of
in*up), so the high-side padding is increased by (up-1) to restore the
reference's trailing zeros. Layout is NHWC (TPU-preferred); the FIR kernel
is shared across channels (a depthwise conv, feature_group_count=C).

The gradient of this op is another upfirdn2d with swapped up/down, flipped
kernel, and derived pads (the reference's g_pad trick,
`op/upfirdn2d.py:111-116`); we expose it through `jax.custom_vjp` so the
Pallas forward path and the XLA path share one backward rule.

`upfirdn2d_ref` is an intentionally naive jnp implementation of the same
spec (explicit zero-stuff/pad/correlate) used as the golden test oracle.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_resample_kernel(k: Sequence[float]) -> np.ndarray:
    """Build a normalized 2D FIR kernel from a 1D (separable) or 2D tap list.

    Parity with the reference's `make_kernel`
    (reference stylegan2/model.py:17-26): 1D input k becomes outer(k, k);
    the kernel is normalized to sum 1. Computed in numpy so the taps stay
    CONCRETE even when built inside a traced scope (the Pallas backend
    embeds them as compile-time constants; under jit/scan tracing, jnp ops
    would stage them into tracers).
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / np.sum(k)


def _as_pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        a, b = v
        return int(a), int(b)
    return int(v), int(v)


def _out_size(n: int, up: int, p0: int, p1: int, k: int, down: int) -> int:
    return (n * up + p0 + p1 - k) // down + 1


def _upfirdn2d_conv(x, kernel, up_y, up_x, down_y, down_x, p_y0, p_y1, p_x0, p_x1):
    """Core fused implementation. NHWC.

    Not a conv: XLA's handling of batched depthwise convolutions
    (feature_group_count=C) is a compile-time pathology on TPU (minutes per
    shape), and with 3x3/4x4 shared FIR taps the MXU brings nothing — the
    op is bandwidth-bound. Instead:

      1. `lax.pad` with interior padding (up-1) does the zero-stuffing and
         edge pad/crop in one XLA Pad op (negative edge pads crop, matching
         the reference's negative-pad semantics),
      2. the correlation+downsample is kh*kw strided slices scaled by the
         taps and summed — pure elementwise FMAs that XLA fuses into a
         single bandwidth-optimal loop.
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    # Cross-correlation with the flipped kernel == convolution with `kernel`.
    kflip = jnp.flip(kernel, (0, 1)).astype(jnp.float32)
    zero = jnp.zeros((), x.dtype)
    z = lax.pad(
        x,
        zero,
        (
            (0, 0, 0),
            # +(up-1) on the high side restores the reference's trailing
            # zero-stuffing that interior padding does not produce.
            (p_y0, p_y1 + up_y - 1, up_y - 1),
            (p_x0, p_x1 + up_x - 1, up_x - 1),
            (0, 0, 0),
        ),
    )
    zh, zw = z.shape[1], z.shape[2]
    oh = (zh - kh) // down_y + 1
    ow = (zw - kw) // down_x + 1
    out = None
    for ky in range(kh):
        for kx in range(kw):
            tap = lax.slice(
                z,
                (0, ky, kx, 0),
                (n, ky + (oh - 1) * down_y + 1, kx + (ow - 1) * down_x + 1, c),
                (1, down_y, down_x, 1),
            )
            term = tap * kflip[ky, kx].astype(x.dtype)
            out = term if out is None else out + term
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _upfirdn2d(x, kernel, up, down, pad):
    up_x, up_y = up
    down_x, down_y = down
    p_x0, p_x1, p_y0, p_y1 = pad
    return _upfirdn2d_conv(x, kernel, up_y, up_x, down_y, down_x, p_y0, p_y1, p_x0, p_x1)


def _upfirdn2d_fwd(x, kernel, up, down, pad):
    out = _upfirdn2d(x, kernel, up, down, pad)
    return out, (kernel, x.shape, out.shape)


def _upfirdn2d_bwd(up, down, pad, res, g):
    kernel, in_shape, out_shape = res
    up_x, up_y = up
    down_x, down_y = down
    p_x0, p_x1, p_y0, p_y1 = pad
    kh, kw = kernel.shape
    in_h, in_w = in_shape[1], in_shape[2]
    out_h, out_w = out_shape[1], out_shape[2]
    # g_pad derivation — parity with reference op/upfirdn2d.py:111-116.
    g_px0 = kw - p_x0 - 1
    g_py0 = kh - p_y0 - 1
    g_px1 = in_w * up_x - out_w * down_x + p_x0 - up_x + 1
    g_py1 = in_h * up_y - out_h * down_y + p_y0 - up_y + 1
    kflip = jnp.flip(kernel, (0, 1))
    dx = _upfirdn2d_conv(
        g, kflip, down_y, down_x, up_y, up_x, g_py0, g_py1, g_px0, g_px1
    )
    # FIR taps are treated as non-trainable constants (as in the reference,
    # where the kernel is a registered buffer) -> zero cotangent.
    return dx, jnp.zeros_like(kernel)


_upfirdn2d.defvjp(_upfirdn2d_fwd, _upfirdn2d_bwd)


# Global implementation switch: "auto" (default: Pallas on TPU backends
# when the taps are concrete — measured 2.7x faster for the full
# StyleGAN2-64 train step — XLA elsewhere), "xla" (pad + strided-FMA), or
# "pallas". Set via set_backend — model code is backend-agnostic.
_BACKEND = "auto"


def set_backend(name: str):
    global _BACKEND
    assert name in ("auto", "xla", "pallas"), name
    _BACKEND = name


def _resolve_backend(kernel):
    if _BACKEND != "auto":
        return _BACKEND
    import jax.core

    if isinstance(kernel, jax.core.Tracer):
        return "xla"
    try:
        tpu_like = jax.default_backend() in ("tpu", "axon")
    except Exception:
        tpu_like = False
    return "pallas" if tpu_like else "xla"


def _separate_kernel(kernel):
    """(ky, kx) float32 1-D factors if `kernel` is a CONCRETE rank-1 2D
    kernel with both dims > 1, else None. Factors are balanced
    (ky = u*sqrt(s), kx = v*sqrt(s)) and sign-normalized so
    outer(ky, kx) == kernel to float precision.

    Used by the Pallas FIR core (fir_pallas._fir2d) to run kh+kw tap
    passes instead of kh*kw INSIDE one kernel launch. Decomposing at
    this dispatcher level instead (two full upfirdn2d calls) was
    measured NET-SLOWER on the v5e: the FIR tap work halved (-50 ms on
    the StyleGAN2-256 step) but each extra pass re-pays the zero-stuff
    pad / lane-align / reshape layout round (+115 ms)."""
    import jax.core

    if isinstance(kernel, jax.core.Tracer):
        return None
    k = np.asarray(kernel, dtype=np.float32)
    if k.ndim != 2 or k.shape[0] < 2 or k.shape[1] < 2:
        return None
    u, s, vt = np.linalg.svd(k)
    if s[1] > 1e-6 * max(s[0], 1e-30):
        return None
    r = np.sqrt(s[0])
    ky, kx = u[:, 0] * r, vt[0] * r
    if ky.sum() < 0 and kx.sum() < 0:
        ky, kx = -ky, -kx
    return ky, kx


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """Fused upsample-FIR-downsample on NHWC input.

    Args:
      x: (N, H, W, C) array.
      kernel: (kh, kw) FIR taps (see `make_resample_kernel`).
      up / down: int or (x, y) pair of integer resampling factors.
      pad: (pad0, pad1) applied to both spatial axes (reference API shape,
        `op/upfirdn2d.py:145-156`), or a 4-tuple (x0, x1, y0, y1).

    Returns:
      (N, H', W', C) with H' = (H*up + pad0 + pad1 - kh)//down + 1.
    """
    if _resolve_backend(kernel) == "pallas":
        from diagan_tpu.ops.fir_pallas import upfirdn2d_pallas

        return upfirdn2d_pallas(x, kernel, up=up, down=down, pad=pad)
    up_x, up_y = _as_pair(up)
    down_x, down_y = _as_pair(down)
    if len(pad) == 2:
        p = (int(pad[0]), int(pad[1]), int(pad[0]), int(pad[1]))
    else:
        p = tuple(int(v) for v in pad)
    return _upfirdn2d(x, kernel, (up_x, up_y), (down_x, down_y), p)


def upfirdn2d_ref(x, kernel, up=1, down=1, pad=(0, 0)):
    """Naive golden-oracle implementation (explicit zero-stuff/pad/correlate).

    Matches the semantics of the reference torch oracle
    (`op/upfirdn2d.py:159-200`) but written independently in numpy-style jnp.
    Slow; tests only.
    """
    up_x, up_y = _as_pair(up)
    down_x, down_y = _as_pair(down)
    if len(pad) == 2:
        p_x0, p_x1, p_y0, p_y1 = int(pad[0]), int(pad[1]), int(pad[0]), int(pad[1])
    else:
        p_x0, p_x1, p_y0, p_y1 = (int(v) for v in pad)

    x = np.asarray(x, dtype=np.float64)
    kernel = np.asarray(kernel, dtype=np.float64)
    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # 1. zero-stuff: each pixel followed by (up-1) zeros.
    z = np.zeros((n, h * up_y, w * up_x, c), dtype=x.dtype)
    z[:, ::up_y, ::up_x, :] = x

    # 2. pad (negative -> crop).
    z = np.pad(
        z,
        (
            (0, 0),
            (max(p_y0, 0), max(p_y1, 0)),
            (max(p_x0, 0), max(p_x1, 0)),
            (0, 0),
        ),
    )
    z = z[
        :,
        max(-p_y0, 0) : z.shape[1] - max(-p_y1, 0),
        max(-p_x0, 0) : z.shape[2] - max(-p_x1, 0),
        :,
    ]

    # 3. correlate with flipped kernel.
    kf = kernel[::-1, ::-1]
    oh = z.shape[1] - kh + 1
    ow = z.shape[2] - kw + 1
    out = np.zeros((n, oh, ow, c), dtype=x.dtype)
    for iy in range(kh):
        for ix in range(kw):
            out += kf[iy, ix] * z[:, iy : iy + oh, ix : ix + ow, :]

    # 4. downsample.
    out = out[:, ::down_y, ::down_x, :]
    return jnp.asarray(out, dtype=jnp.result_type(jnp.float32))
