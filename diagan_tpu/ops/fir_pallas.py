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


# Escape hatch for A/B probing (scripts/probe_fir_nhwc.py): force the
# flattened (N, H, W*C) kernel even where the NHWC-native path applies.
FORCE_FLAT = False


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


@functools.partial(
    jax.jit,
    static_argnames=("taps", "kh", "kw", "oh", "ow", "tile_h", "interpret",
                     "sep"),
)
def _fir2d_nhwc(xp, taps: tuple, kh: int, kw: int, oh: int, ow: int,
                tile_h: int = 16, interpret: bool = False, sep: bool = False):
    """Stride-1 valid correlation, 4D-NHWC-native (round-4 keep-padded
    redesign — VERDICT r3 item 1). xp: (N, Hp, Wp, C) already edge-padded
    (ONE lax.pad upstream). Returns (N, oh, ow, C) directly.

    Vs the flattened (N, H, W*C) formulation (_fir2d): no (W, C)->(W*C)
    retile on either side, no 128-lane alignment pad, no output lane
    slice — the measured ~140 ms/step of pad/copy/reshape around the FIR
    calls in the StyleGAN2-256 profile came from exactly those. Layout
    facts that make it work: in a rank-3 VMEM slab (rows, W, C) the rows
    are an OUTER dim, so DMA row origins need no 8-alignment — the slab
    is tile_h + kh - 1 rows exactly (1.1-1.2x read overlap vs 1.5-2x
    after the flattened kernel's 8-row rounding); x-shifts are static
    sublane slices (cheap rotates); C stays in lanes with whatever
    padding the source array already has, so the DMA moves the same
    physical tiles XLA ops would."""
    n, hp, wp, c = xp.shape
    tiles = _cdiv(oh, tile_h)
    slab = tile_h + kh - 1
    need_rows = (tiles - 1) * tile_h + slab
    if need_rows > hp:
        xp = jnp.pad(xp, ((0, 0), (0, need_rows - hp), (0, 0), (0, 0)))

    # flat grid (n*tiles) so the NEXT grid cell's slab can be prefetched
    # into the other half of a double-buffered scratch while this cell
    # computes — a serial start/wait DMA leaves the memory units idle
    # during compute and vice versa (measured ~3x off bandwidth SoL)
    def kernel(x_hbm, o_ref, scratch, sems):
        g = pl.program_id(0)
        i, t = g // tiles, g % tiles
        slot = g % 2
        nxt = (g + 1) % 2

        def src(gi):
            ii, tt = gi // tiles, gi % tiles
            return x_hbm.at[ii, pl.ds(tt * tile_h, slab), :, :]

        @pl.when(g == 0)
        def _():
            pltpu.make_async_copy(src(g), scratch.at[slot],
                                  sems.at[slot]).start()

        @pl.when(g + 1 < n * tiles)
        def _():
            pltpu.make_async_copy(src(g + 1), scratch.at[nxt],
                                  sems.at[nxt]).start()

        pltpu.make_async_copy(src(g), scratch.at[slot],
                              sems.at[slot]).wait()
        buf = scratch.at[slot]  # Ref view: slices below load lazily
        if sep:
            taps_y, taps_x = taps[:kh], taps[kh:kh + kw]
            rows = None
            for ky in range(kh):
                term = buf[ky:ky + tile_h, :, :] * taps_y[ky]
                rows = term if rows is None else rows + term
            acc = None
            for kx in range(kw):
                term = rows[:, kx:kx + ow, :] * taps_x[kx]
                acc = term if acc is None else acc + term
        else:
            acc = None
            for ky in range(kh):
                for kx in range(kw):
                    tap = buf[ky:ky + tile_h, kx:kx + ow, :]
                    term = tap * taps[ky * kw + kx]
                    acc = term if acc is None else acc + term
        o_ref[0] = acc

    out = pl.pallas_call(
        kernel,
        grid=(n * tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, ow, c), lambda g: (g // tiles, g % tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, tiles * tile_h, ow, c), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab, wp, c), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp)
    return out[:, :oh, :, :]


@functools.partial(
    jax.jit,
    static_argnames=("taps_y", "taps_x", "kh", "kw", "oh", "ow2", "tile_h",
                     "interpret"),
)
def _fir2d_pair(zp, taps_y: tuple, taps_x: tuple, kh: int, kw: int, oh: int,
                ow2: int, tile_h: int = 16, interpret: bool = False):
    """Stride-1 valid separable correlation for c == 64 via the PAIR-PHASE
    view: zp is (N, Hp, Wp2, 128) where each 128-lane row holds a pixel
    PAIR [p(2m) | p(2m+1)] of the original c=64 image — for bf16 this
    view is the (2,1)-packed physical layout itself, so the reshape into
    it is (near-)free, and the DMA slice satisfies Mosaic's 128-lane
    alignment that the plain c=64 NHWC slice violates
    (scripts/probe_fir_nhwc.py hardware measurement).

    x-pass identity (A_r := y-passed rows shifted by r pairs, swap :=
    64-lane rotate exchanging the halves of every pair):
      out_pair = sum_r tx[2r] * A_r
               + lanes<64  ? sum_r tx[2r+1] * swap(A_r)
                           : sum_r tx[2r+1] * swap(A_{r+1})
    because an odd-tap contribution reads the OTHER half of a pair: into
    the low half (even output pixel) from the same pair's high half, into
    the high half (odd output pixel) from the NEXT pair's low half.
    Returns (N, oh, ow2, 128) = the pair view of (N, oh, 2*ow2, 64)."""
    n, hp, wp2, c128 = zp.shape
    assert c128 == 128
    tiles = _cdiv(oh, tile_h)
    slab = tile_h + kh - 1
    need_rows = (tiles - 1) * tile_h + slab
    if need_rows > hp:
        zp = jnp.pad(zp, ((0, 0), (0, need_rows - hp), (0, 0), (0, 0)))
    max_shift = kw // 2

    def kernel(x_hbm, o_ref, scratch, sems):
        g = pl.program_id(0)
        slot = g % 2
        nxt = (g + 1) % 2

        def src(gi):
            ii, tt = gi // tiles, gi % tiles
            return x_hbm.at[ii, pl.ds(tt * tile_h, slab), :, :]

        @pl.when(g == 0)
        def _():
            pltpu.make_async_copy(src(g), scratch.at[slot],
                                  sems.at[slot]).start()

        @pl.when(g + 1 < n * tiles)
        def _():
            pltpu.make_async_copy(src(g + 1), scratch.at[nxt],
                                  sems.at[nxt]).start()

        pltpu.make_async_copy(src(g), scratch.at[slot],
                              sems.at[slot]).wait()
        buf = scratch.at[slot]
        rows = None
        for ky in range(kh):
            # fp32 in-kernel: Mosaic's lane rotate (the half-swap below)
            # is 32-bit only; the upcast also buys fp32 accumulation
            term = buf[ky:ky + tile_h, :, :].astype(jnp.float32) \
                * taps_y[ky]
            rows = term if rows is None else rows + term
        A = [rows[:, r:r + ow2, :] for r in range(max_shift + 1)]
        swapA = [pltpu.roll(a, 64, axis=2) for a in A]
        acc = None
        lo = None
        hi = None
        for r in range(max_shift + 1):
            if 2 * r < kw:
                term = A[r] * taps_x[2 * r]
                acc = term if acc is None else acc + term
            if 2 * r + 1 < kw:
                term = swapA[r] * taps_x[2 * r + 1]
                lo = term if lo is None else lo + term
                term = swapA[r + 1] * taps_x[2 * r + 1]
                hi = term if hi is None else hi + term
        if lo is not None:
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (tile_h, ow2, 128), 2)
            acc = acc + jnp.where(lane < 64, lo, hi)
        o_ref[0] = acc.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(n * tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, ow2, 128), lambda g: (g // tiles, g % tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, tiles * tile_h, ow2, 128),
                                       zp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab, wp2, 128), zp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(zp)
    return out[:, :oh, :, :]


def _nhwc_tile_h(wp, c, kh, dtype_bytes=4):
    """Largest tile_h whose double-buffered slab + double-buffered output
    block stay under the VMEM budget. Bigger tiles matter: the per-call
    time at 256px was grid-overhead-bound at tile_h=16 (272 cells x
    fixed per-cell cost); the explicit vmem_limit_bytes on the
    pallas_call covers Mosaic's pipeline/temp overhead on top of this
    estimate."""
    cp = -(-c // 128) * 128  # lanes are physically padded to 128
    # measured in-step (256px fused chunk): tile_h 16 at the big widths
    # beats 32 (79.7 vs 71.2 ms of kernel time) — the finer grid
    # pipelines better against the surrounding fusions; keep the budget
    # that yields 16 there and 32 on narrow layers
    th = 32
    while th > 8 and dtype_bytes * ((th + kh - 1) * wp * cp
                                    + 2 * th * wp * cp) > 4 * 1024 * 1024:
        th //= 2
    return th


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

    if (up_y == up_x == down_y == down_x == 1 and c == 64
            and factors is not None and not FORCE_FLAT):
        # pair-phase keep-padded route (see _fir2d_pair): c=64 is the
        # channel width of the LARGEST StyleGAN2-256 blur buffers
        oh = h + p_y0 + p_y1 - kh + 1
        ow = w + p_x0 + p_x1 - kw + 1
        ow_p = -(-ow // 16) * 16
        ow2 = ow_p // 2
        max_shift = kw // 2
        zw16 = -(-(ow_p + 2 * max_shift) // 16) * 16
        z = lax.pad(
            x, zero,
            ((0, 0, 0), (p_y0, p_y1, 0),
             (p_x0, zw16 - w - p_x0, 0), (0, 0, 0)),
        )
        zp = z.reshape(n, z.shape[1], zw16 // 2, 128)
        th = _nhwc_tile_h(zw16 // 2, 128, kh,
                          dtype_bytes=jnp.dtype(x.dtype).itemsize)
        y2 = _fir2d_pair(zp, taps[:kh], taps[kh:kh + kw], kh, kw, oh, ow2,
                         tile_h=th, interpret=interpret)
        y = y2.reshape(n, oh, ow_p, 64)
        return y[:, :, :ow, :] if ow_p != ow else y

    if (up_y == up_x == down_y == down_x == 1 and c % 128 == 0
            and not FORCE_FLAT):
        # NOTE: c must be a whole number of 128-lane tiles — Mosaic
        # rejects DMA slices whose lane extent isn't a 128-multiple
        # (sub-128 c like 64 is (2,1)-packed in the physical layout and
        # the full-c slice then cuts a packed row in half; measured on
        # hardware, scripts/probe_fir_nhwc.py). c=64 goes through the
        # pair-phase variant below; other c through the flattened path.
        # keep-padded NHWC path (the stride-1 blur shapes that dominate
        # the StyleGAN2 step): ONE edge pad, then the 4D-native kernel —
        # no flatten/retile, no lane-align pad, no output lane slice.
        # c >= 32 keeps lane utilization sane; small-c calls (ToRGB skip
        # C=3) stay on the flattened path where lanes are W*C.
        # Mosaic constraint: sublane (W) slice/DMA sizes must be
        # 8-aligned, so both the kernel's output width and the padded
        # buffer width are rounded up to multiples of 8 — folded into
        # this same pad (the extra columns read pad zeros) and sliced
        # off at the end.
        oh = h + p_y0 + p_y1 - kh + 1
        ow = w + p_x0 + p_x1 - kw + 1
        ow_p = -(-ow // 8) * 8
        zw8 = -(-(ow_p + kw - 1) // 8) * 8
        z = lax.pad(
            x, zero,
            ((0, 0, 0), (p_y0, p_y1, 0),
             (p_x0, zw8 - w - p_x0, 0), (0, 0, 0)),
        )
        th = _nhwc_tile_h(z.shape[2], c, kh,
                          dtype_bytes=jnp.dtype(x.dtype).itemsize)
        y = _fir2d_nhwc(z, taps, kh, kw, oh, ow_p, tile_h=th,
                        interpret=interpret, sep=factors is not None)
        return y[:, :, :ow, :] if ow_p != ow else y

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
