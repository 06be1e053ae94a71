"""Pallas TPU kernel for the 2D FIR core of upfirdn2d.

The TPU-native equivalent of the reference CUDA tiled kernel
(reference diagan-pkg/diagan/models/op/upfirdn2d_kernel.cu:108-240): the
input row-slab (tile + kernel halo) is DMA'd from HBM into VMEM scratch,
the correlation is kh*kw unrolled shifted multiply-accumulates on the VPU,
and each grid cell writes one (tile_h, out_w, C) output block. Zero-stuff
(up) and stride (down) are handled around the kernel by XLA pad/slice —
the FIR inner loop is where the memory traffic is.

`upfirdn2d_pallas` matches `diagan_tpu.ops.upfirdn2d` semantics exactly
(same oracle tests); it is opt-in via ops.upfirdn2d.set_backend("pallas").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("kh", "kw", "tile_h", "interpret"))
def _fir2d(xp, kflip, kh: int, kw: int, tile_h: int = 16, interpret: bool = False):
    """Stride-1 valid correlation of pre-padded xp (N, Hp, Wp, C) with the
    (kh, kw) taps in kflip (already flipped). Returns (N, Hp-kh+1, Wp-kw+1, C)."""
    n, hp, wp, c = xp.shape
    oh = hp - kh + 1
    ow = wp - kw + 1
    tiles = _cdiv(oh, tile_h)
    slab = tile_h + kh - 1
    # guarantee in-bounds slab DMA for the last tile
    need_rows = (tiles - 1) * tile_h + slab
    if need_rows > hp:
        xp = jnp.pad(xp, ((0, 0), (0, need_rows - hp), (0, 0), (0, 0)))

    def kernel(k_ref, x_hbm, o_ref, scratch, sem):
        i = pl.program_id(0)
        t = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(t * tile_h, slab)], scratch, sem
        )
        cp.start()
        cp.wait()
        acc = None
        for ky in range(kh):
            for kx in range(kw):
                tap = scratch[ky : ky + tile_h, kx : kx + ow, :]
                term = tap * k_ref[ky, kx]
                acc = term if acc is None else acc + term
        o_ref[0] = acc

    out = pl.pallas_call(
        kernel,
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((kh, kw), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, ow, c), lambda i, t: (i, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, tiles * tile_h, ow, c), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((slab, xp.shape[2], c), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(kflip.astype(xp.dtype), xp)
    return out[:, :oh]


def upfirdn2d_pallas(x, kernel, up=1, down=1, pad=(0, 0), tile_h=16,
                     interpret=False):
    """upfirdn2d with the Pallas FIR core. NHWC; same semantics as
    diagan_tpu.ops.upfirdn2d.upfirdn2d."""
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

    kh, kw = kernel.shape
    kflip = jnp.flip(kernel, (0, 1))
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
    y = _fir2d(z, kflip, kh, kw, tile_h=tile_h, interpret=interpret)
    if down_y > 1 or down_x > 1:
        y = y[:, ::down_y, ::down_x, :]
    return y
