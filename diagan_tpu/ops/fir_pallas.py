"""Pallas TPU kernel for the 2D FIR core of upfirdn2d.

The TPU-native equivalent of the reference CUDA tiled kernel
(reference diagan-pkg/diagan/models/op/upfirdn2d_kernel.cu:108-240).

Kernel design (Mosaic-friendly 2D formulation): the NHWC input is viewed
as (N, H, W*C) so the lane dimension is the W*C flattening — an x-shift of
kx pixels becomes a contiguous lane-slice offset of kx*C, and a y-shift a
sublane offset, so the whole correlation is kh*kw static 2D slices scaled
by the taps and summed on the VPU. Each grid cell DMAs its row slab
(tile + halo) from HBM into VMEM scratch and writes one (tile_h, ow*C)
output block. FIR taps are embedded as compile-time constants (resampling
kernels are static in every call site). Zero-stuffing (up) and stride
(down) are handled around the kernel by XLA pad/slice.

`upfirdn2d_pallas` matches `diagan_tpu.ops.upfirdn2d` semantics exactly
(same oracle tests); opt-in alongside the XLA shifted-add core.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(
    jax.jit,
    static_argnames=("taps", "kh", "kw", "c", "tile_h", "interpret", "sep"),
)
def _fir2d(xp, taps: tuple, kh: int, kw: int, c: int, tile_h: int = 16,
           interpret: bool = False, sep: bool = False):
    """Stride-1 valid correlation. xp: (N, Hp, Wp*C) with C innermost;
    taps: kh*kw python floats (already flipped, row-major) — or, with
    sep=True, kh + kw floats (flipped y-factor then flipped x-factor of a
    rank-1 kernel): the kernel then runs a y-pass followed by an x-pass
    in-registers (kh+kw FMAs per element instead of kh*kw — 2x fewer for
    the 4x4 blur — with no extra HBM round trip). Returns
    (N, Hp-kh+1, (Wp-kw+1)*C)."""
    n, hp, wpc = xp.shape
    wp = wpc // c
    oh = hp - kh + 1
    ow = wp - kw + 1
    owc = ow * c
    # Mosaic alignment: DMA slab row-count must be a sublane multiple (8)
    # and the lane dimension a multiple of 128 — pad rows and lanes; the
    # padding is zeros and sliced away after the kernel.
    owc_p = -(-owc // 128) * 128
    wpc_p = -(-max(wpc, (kw - 1) * c + owc_p) // 128) * 128

    # VMEM budget: scratch slab + double-buffered output block must fit
    # comfortably under the ~16MB scoped limit; shrink tile_h for wide rows.
    def footprint(th):
        slab_rows = -(-(th + kh - 1) // 8) * 8
        return 4 * (slab_rows * wpc_p + 2 * th * owc_p)

    # Mosaic's true scoped-vmem usage runs ~2x this estimate (pipeline
    # buffers + vector temps), so budget conservatively.
    while tile_h > 8 and footprint(tile_h) > 4 * 1024 * 1024:
        tile_h //= 2
    tiles = _cdiv(oh, tile_h)
    slab = -(-(tile_h + kh - 1) // 8) * 8
    need_rows = (tiles - 1) * tile_h + slab
    xp = jnp.pad(
        xp, ((0, 0), (0, max(0, need_rows - hp)), (0, wpc_p - wpc))
    )

    def kernel(x_hbm, o_ref, scratch, sem):
        i = pl.program_id(0)
        t = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(t * tile_h, slab), :], scratch, sem
        )
        cp.start()
        cp.wait()
        if sep:
            taps_y, taps_x = taps[:kh], taps[kh:kh + kw]
            rows = None
            for ky in range(kh):
                term = scratch[ky : ky + tile_h, :] * taps_y[ky]
                rows = term if rows is None else rows + term
            acc = None
            for kx in range(kw):
                term = rows[:, kx * c : kx * c + owc_p] * taps_x[kx]
                acc = term if acc is None else acc + term
        else:
            acc = None
            for ky in range(kh):
                for kx in range(kw):
                    tap = scratch[ky : ky + tile_h, kx * c : kx * c + owc_p]
                    term = tap * taps[ky * kw + kx]
                    acc = term if acc is None else acc + term
        o_ref[0] = acc

    out = pl.pallas_call(
        kernel,
        grid=(n, tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, owc_p), lambda i, t: (i, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, tiles * tile_h, owc_p), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((slab, wpc_p), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return out[:, :oh, :owc]


def upfirdn2d_pallas(x, kernel, up=1, down=1, pad=(0, 0), tile_h=16,
                     interpret=False):
    """upfirdn2d with the Pallas FIR core. NHWC; same semantics as
    diagan_tpu.ops.upfirdn2d.upfirdn2d, differentiable via the g_pad custom
    VJP (backward is another Pallas FIR with swapped up/down and flipped
    taps — reference op/upfirdn2d.py:111-116). `kernel` must be concrete
    (not a jit tracer) — resampling taps are static in every call site."""
    karr = np.asarray(kernel)
    if isinstance(up, (tuple, list)):
        up = tuple(int(v) for v in up)
    else:
        up = (int(up), int(up))
    if isinstance(down, (tuple, list)):
        down = tuple(int(v) for v in down)
    else:
        down = (int(down), int(down))
    if len(pad) == 2:
        pad = (int(pad[0]), int(pad[1]), int(pad[0]), int(pad[1]))
    else:
        pad = tuple(int(v) for v in pad)
    return _upfirdn2d_pallas_vjp(
        x, tuple(map(tuple, karr.tolist())), up, down, pad, tile_h, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _upfirdn2d_pallas_vjp(x, ktup, up, down, pad, tile_h, interpret):
    return _upfirdn2d_pallas_raw(x, np.asarray(ktup), up, down, pad, tile_h,
                                 interpret)


def _vjp_fwd(x, ktup, up, down, pad, tile_h, interpret):
    out = _upfirdn2d_pallas_vjp(x, ktup, up, down, pad, tile_h, interpret)
    return out, (x.shape, out.shape)


def _vjp_bwd(ktup, up, down, pad, tile_h, interpret, res, g):
    in_shape, out_shape = res
    karr = np.asarray(ktup)
    kh, kw = karr.shape
    up_x, up_y = up
    down_x, down_y = down
    p_x0, p_x1, p_y0, p_y1 = pad
    in_h, in_w = in_shape[1], in_shape[2]
    out_h, out_w = out_shape[1], out_shape[2]
    g_px0 = kw - p_x0 - 1
    g_py0 = kh - p_y0 - 1
    g_px1 = in_w * up_x - out_w * down_x + p_x0 - up_x + 1
    g_py1 = in_h * up_y - out_h * down_y + p_y0 - up_y + 1
    # the backward is itself the wrapped op, so higher-order autodiff
    # (R1's grad-of-grad through D) keeps differentiating cleanly
    dx = _upfirdn2d_pallas_vjp(
        g, tuple(map(tuple, karr[::-1, ::-1].tolist())),
        (down_x, down_y), (up_x, up_y),
        (g_px0, g_px1, g_py0, g_py1), tile_h, interpret,
    )
    return (dx,)


_upfirdn2d_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def _upfirdn2d_pallas_raw(x, kernel, up, down, pad, tile_h=16,
                          interpret=False):
    if isinstance(up, (tuple, list)):
        up_x, up_y = up
    else:
        up_x = up_y = int(up)
    if isinstance(down, (tuple, list)):
        down_x, down_y = down
    else:
        down_x = down_y = int(down)
    if len(pad) == 2:
        p_x0, p_x1, p_y0, p_y1 = pad[0], pad[1], pad[0], pad[1]
    else:
        p_x0, p_x1, p_y0, p_y1 = pad

    karr = np.asarray(kernel)
    kh, kw = karr.shape
    from diagan_tpu.ops.upfirdn2d import _separate_kernel

    factors = _separate_kernel(karr)
    if factors is not None:
        ky1, kx1 = factors
        taps = tuple(float(v) for v in np.concatenate(
            [ky1[::-1], kx1[::-1]]))
    else:
        taps = tuple(float(v) for v in karr[::-1, ::-1].reshape(-1))

    n, h, w, c = x.shape
    zero = jnp.zeros((), x.dtype)
    z = lax.pad(
        x, zero,
        (
            (0, 0, 0),
            (p_y0, p_y1 + up_y - 1, up_y - 1),
            (p_x0, p_x1 + up_x - 1, up_x - 1),
            (0, 0, 0),
        ),
    )
    zh, zw = z.shape[1], z.shape[2]
    y = _fir2d(z.reshape(n, zh, zw * c), taps, kh, kw, c, tile_h=tile_h,
               interpret=interpret, sep=factors is not None)
    oh = zh - kh + 1
    ow = zw - kw + 1
    y = y.reshape(n, oh, ow, c)
    if down_y > 1 or down_x > 1:
        y = y[:, ::down_y, ::down_x, :]
    return y
