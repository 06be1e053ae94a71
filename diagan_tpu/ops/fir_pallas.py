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
    static_argnames=("taps", "kh", "kw", "c", "tile_h", "interpret"),
)
def _fir2d(xp, taps: tuple, kh: int, kw: int, c: int, tile_h: int = 16,
           interpret: bool = False):
    """Stride-1 valid correlation. xp: (N, Hp, Wp*C) with C innermost;
    taps: kh*kw python floats (already flipped, row-major). Returns
    (N, Hp-kh+1, (Wp-kw+1)*C)."""
    n, hp, wpc = xp.shape
    wp = wpc // c
    oh = hp - kh + 1
    ow = wp - kw + 1
    owc = ow * c
    tiles = _cdiv(oh, tile_h)
    # Mosaic alignment: DMA slab row-count must be a sublane multiple (8)
    # and the lane dimension a multiple of 128 — pad rows and lanes; the
    # padding is zeros and sliced away after the kernel.
    slab = -(-(tile_h + kh - 1) // 8) * 8
    owc_p = -(-owc // 128) * 128
    wpc_p = max(-(-wpc // 128) * 128, (kw - 1) * c + owc_p)
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
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
    diagan_tpu.ops.upfirdn2d.upfirdn2d. `kernel` must be concrete (not a
    jit tracer) — resampling taps are static in every model call site."""
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
               interpret=interpret)
    oh = zh - kh + 1
    ow = zw - kw + 1
    y = y.reshape(n, oh, ow, c)
    if down_y > 1 or down_x > 1:
        y = y[:, ::down_y, ::down_x, :]
    return y
