"""Two-phase (polyphase-y) affine bilinear warp for the ADA resample.

The ADA antialiased resample (reference stylegan2/non_leaking.py:353-408)
is up2x-filter -> bilinear warp -> filter-down2x. The round-2 Pallas warp
(ops/warp_pallas.py) removed the scatter bottleneck, but the pipeline
around it still materializes the full 2x-upsampled buffer: a zero-stuffed
(2S, 2S) intermediate per FIR pass plus an NCHW relayout of the (N, 2S,
2S, C) source for the warp's window DMAs — at FFHQ-256 shapes those
layout passes are a large fraction of the remaining augment cost
(docs/VALIDATION.md round-3 profile).

Polyphase identity: the 2x-upsampled image never needs to exist in
interleaved form. With x2 = upfir2x(xp) (12-tap kernel k),

    x2[2m + phi] = sum_t b_phi[t] * xp[m + t - d_phi],
    b_0[t] = k[2t]   (d_0 = 3),   b_1[t] = k[2t+1]  (d_1 = 2),

i.e. each row parity of x2 is a compact stride-1 6-tap FIR of xp. This
module's op consumes the two y-phase planes directly (x stays in the
interleaved s-domain, which keeps the window DMA 128-lane alignment and
the hat-matmul FLOPs identical to the single-buffer kernel) and emits the
warp output split by BOTH output parities — exactly the four quarter-grids
the polyphase downsample

    down[o] = sum_t c_0[t]*Y_0[o+t-2] + c_1[t]*Y_1[o+t-3],
    c_0[t] = k[10-2t],  c_1[t] = k[11-2t],

consumes as four more compact stride-1 FIRs (models/ada.py wires the
whole pipeline). Net effect vs the round-2 path: no (2S, 2S) zero-stuffed
buffers, no big NCHW transposes on either side of the warp, and half the
FIR multiply-adds; the warp kernels themselves keep the same per-tile DMA
volume and matmul shapes (two (1024, 64) x (64, 256) hat matmuls replace
one (1024, 128) x (128, 256)).

Forward and backward are exact adjoints by construction (the backward
builds its hat weights from the same clipped coordinates); the XLA
fallback interleaves the phases and runs the plain gather, and doubles as
the test oracle.

Coverage bound: _origins rounds the source-row window origin onto the
phase grid via (oy // 16) * 8, which can forfeit up to 15 interleaved
source rows of the 128-row window (vs warp_pallas's 7-row slack), so the
worst-case affine coverage at 45-degree rotation is ~2.5x scale (vs the
interleaved kernel's ~2.7x documented in warp_pallas). Draws beyond the
window silently truncate contributions (clamped-edge output, no error) —
the ADA transform distribution at pad_frac 0.75 stays well inside the
bound, and the adjoint tests cover the distribution's support.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 32           # output pixels per tile edge in the s-domain grid
_WIN_M = 64          # phase-row window (= 128 source rows, as before)
_WIN_X = 256         # lane window in the interleaved s-domain (as before)

_BACKEND = "auto"


def set_backend(name: str):
    global _BACKEND
    assert name in ("auto", "xla", "pallas"), name
    _BACKEND = name


def _use_pallas(backend, sr, sl):
    name = _BACKEND if backend is None else backend
    if name == "xla":
        return False
    if name == "pallas":
        return True
    if sr < _WIN_M or sl < 128:  # window would overrun tiny buffers
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# XLA fallback / oracle: interleave phases, plain gather, split output
# ---------------------------------------------------------------------------
def _bilinear_gather(img, qy, qx):
    h, w = img.shape[0], img.shape[1]
    qy = jnp.clip(qy, 0.0, h - 1.0)
    qx = jnp.clip(qx, 0.0, w - 1.0)
    y0 = jnp.floor(qy).astype(jnp.int32)
    x0 = jnp.floor(qx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (qy - y0)[..., None]
    fx = (qx - x0)[..., None]
    top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
    bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def _gather2_xla(v0, v1, coef, win, s2):
    """v0/v1: (N, C, S, S2) planar y-phase planes (possibly padded beyond
    the logical s2: rows >= s2//2, lanes >= s2)."""
    n, c = v0.shape[0], v0.shape[1]
    s = s2 // 2
    # interleave rows back into the s-domain buffer, NHWC
    x2 = jnp.stack([v0[:, :, :s, :s2], v1[:, :, :s, :s2]], axis=3)
    x2 = x2.reshape(n, c, s2, s2).transpose(0, 2, 3, 1)
    idx = jnp.arange(win, dtype=jnp.float32)
    ii, jj = jnp.meshgrid(idx, idx, indexing="ij")
    ay, by, cy, ax, bx, cx = [coef[:, k, None, None] for k in range(6)]
    qy = ay * ii[None] + by * jj[None] + cy
    qx = ax * ii[None] + bx * jj[None] + cx
    y = jax.vmap(_bilinear_gather)(x2, qy, qx)
    return tuple(y[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1))


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------
def _phase_coords(i0, j0, tp, cols):
    """Phase-major pixel enumeration: p = ((phi_y*2 + phi_x)*256) +
    my*16 + mx; output grid coords ii = i0 + 2*my + phi_y, jj = j0 +
    2*mx + phi_x. Built as (tp, cols) 2D iotas (constant along cols) —
    the layout Mosaic handles natively (same pattern as warp_pallas)."""
    p = lax.broadcasted_iota(jnp.int32, (tp, cols), 0)
    phi_y = p // (tp // 2)
    phi_x = (p // (tp // 4)) % 2
    my = (p % (tp // 4)) // (_TILE // 2)
    mx = p % (_TILE // 2)
    ii = i0 + (2 * my + phi_y).astype(jnp.float32)
    jj = j0 + (2 * mx + phi_x).astype(jnp.float32)
    return ii, jj


def _origins(ay, by, cy, ax, bx, cx, i0, j0, s2, srp, slp, wx):
    """Aligned window origins: my0 (phase rows, mult of 8) and bx0
    (s-domain lanes, mult of 128). Same corner-extrema logic as
    warp_pallas, with the row origin halved onto the phase grid."""
    def qmin(a, b, cc):
        q00 = a * i0 + b * j0 + cc
        q = (q00 + jnp.minimum(a * (_TILE - 1.0), 0.0)
             + jnp.minimum(b * (_TILE - 1.0), 0.0))
        return jnp.clip(q, 0.0, s2 - 1.0)

    oy = jnp.clip(jnp.floor(qmin(ay, by, cy)) - 1.0, 0.0,
                  float(2 * srp - _WIN_M * 2))
    my0 = (oy.astype(jnp.int32) // 16) * 8
    my0 = jnp.minimum(my0, srp - _WIN_M)
    ox = jnp.clip(jnp.floor(qmin(ax, bx, cx)) - 1.0, 0.0, float(slp - wx))
    bx0 = (ox.astype(jnp.int32) // 128) * 128
    return pl.multiple_of(my0, 8), pl.multiple_of(bx0, 128)


def _gather2_kernel(s2, srp, slp, c, win, wx):
    tp = _TILE * _TILE

    def kernel(coef_ref, v0_ref, v1_ref, o_ref, w0, w1, sem0, sem1):
        i = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        ay = coef_ref[i, 0]
        by = coef_ref[i, 1]
        cy = coef_ref[i, 2]
        ax = coef_ref[i, 3]
        bx = coef_ref[i, 4]
        cx = coef_ref[i, 5]
        i0 = (ty * _TILE).astype(jnp.float32)
        j0 = (tx * _TILE).astype(jnp.float32)
        my0, bx0 = _origins(ay, by, cy, ax, bx, cx, i0, j0, s2, srp, slp, wx)
        cp0 = pltpu.make_async_copy(
            v0_ref.at[i, :, pl.ds(my0, _WIN_M), pl.ds(bx0, wx)], w0, sem0)
        cp1 = pltpu.make_async_copy(
            v1_ref.at[i, :, pl.ds(my0, _WIN_M), pl.ds(bx0, wx)], w1, sem1)
        cp0.start()
        cp1.start()

        ii, jj = _phase_coords(i0, j0, tp, _WIN_M)
        myo = (2 * my0).astype(jnp.float32)
        bxo = bx0.astype(jnp.float32)
        lane_m = lax.broadcasted_iota(jnp.int32, (tp, _WIN_M), 1).astype(
            jnp.float32)
        lane_x = lax.broadcasted_iota(jnp.int32, (tp, wx), 1).astype(
            jnp.float32)
        qy = jnp.clip(ay * ii + by * jj + cy, 0.0, s2 - 1.0)
        qx = jnp.clip(ax * ii + bx * jj + cx, 0.0, s2 - 1.0)
        # hat weights over each phase's rows: source row = 2*(m + my0) + phi
        u0 = jnp.maximum(0.0, 1.0 - jnp.abs(qy - (2.0 * lane_m + myo)))
        u1 = jnp.maximum(0.0, 1.0 - jnp.abs(qy - (2.0 * lane_m + myo + 1.0)))
        # qx is constant along its lane dim; broadcast one column
        v = jnp.maximum(0.0, 1.0 - jnp.abs(qx[:, :1] - (lane_x + bxo)))

        cp0.wait()
        cp1.wait()
        outs = []
        for ch in range(c):
            tmp = lax.dot_general(u0, w0[ch], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)
            tmp = tmp + lax.dot_general(u1, w1[ch], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=lax.Precision.HIGHEST)
            outs.append(jnp.sum(tmp * v, axis=1))
        o_ref[0, 0] = jnp.stack(outs, axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("win", "s2", "interpret"))
def _gather2_pallas(v0, v1, coef, win, s2, interpret=False):
    n, c, srp, slp = v0.shape
    t = -(-win // _TILE)
    wx = min(_WIN_X, slp)
    out = pl.pallas_call(
        _gather2_kernel(s2, srp, slp, c, win, wx),
        grid=(n, t, t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, _TILE * _TILE, c),
                               lambda i, ty, tx: (i, ty * t + tx, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t * t, _TILE * _TILE, c),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, _WIN_M, wx), jnp.float32),
            pltpu.VMEM((c, _WIN_M, wx), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * t * c * _TILE * _TILE * 2 * _WIN_M * wx,
            bytes_accessed=2 * n * t * t * c * _WIN_M * wx * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coef.astype(jnp.float32), v0, v1)
    # p-major (phi_y, phi_x, my, mx) -> four (N, 16t, 16t, C) quarter grids
    out = out.reshape(n, t, t, 2, 2, _TILE // 2, _TILE // 2, c)
    h2 = win // 2
    res = []
    for a in (0, 1):
        for b in (0, 1):
            y = out[:, :, :, a, b].transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(n, t * (_TILE // 2), t * (_TILE // 2), c)
            res.append(y[:, :h2, :h2])
    return tuple(res)


def _scatter2_kernel(s2, srp, slp, c, win, wx):
    tp = _TILE * _TILE

    def kernel(coef_ref, g_ref, z0_ref, z1_ref, o0_ref, o1_ref,
               a0, a1, sem0, sem1, semo0, semo1):
        del z0_ref, z1_ref  # aliased to o0_ref/o1_ref: storage only
        i = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)

        @pl.when((ty * _TILE < win) & (tx * _TILE < win))
        def _():
            ay = coef_ref[i, 0]
            by = coef_ref[i, 1]
            cy = coef_ref[i, 2]
            ax = coef_ref[i, 3]
            bx = coef_ref[i, 4]
            cx = coef_ref[i, 5]
            i0 = (ty * _TILE).astype(jnp.float32)
            j0 = (tx * _TILE).astype(jnp.float32)
            my0, bx0 = _origins(ay, by, cy, ax, bx, cx, i0, j0, s2, srp,
                                slp, wx)
            cp0 = pltpu.make_async_copy(
                o0_ref.at[i, :, pl.ds(my0, _WIN_M), pl.ds(bx0, wx)], a0, sem0)
            cp1 = pltpu.make_async_copy(
                o1_ref.at[i, :, pl.ds(my0, _WIN_M), pl.ds(bx0, wx)], a1, sem1)
            cp0.start()
            cp1.start()

            ii, jj = _phase_coords(i0, j0, tp, _WIN_M)
            myo = (2 * my0).astype(jnp.float32)
            bxo = bx0.astype(jnp.float32)
            lane_m = lax.broadcasted_iota(jnp.int32, (tp, _WIN_M), 1).astype(
                jnp.float32)
            lane_x = lax.broadcasted_iota(jnp.int32, (tp, wx), 1).astype(
                jnp.float32)
            qy = jnp.clip(ay * ii + by * jj + cy, 0.0, s2 - 1.0)
            qx = jnp.clip(ax * ii + bx * jj + cx, 0.0, s2 - 1.0)
            u0 = jnp.maximum(0.0, 1.0 - jnp.abs(qy - (2.0 * lane_m + myo)))
            u1 = jnp.maximum(
                0.0, 1.0 - jnp.abs(qy - (2.0 * lane_m + myo + 1.0)))
            v = jnp.maximum(0.0, 1.0 - jnp.abs(qx[:, :1] - (lane_x + bxo)))

            g2 = g_ref[0, 0]  # (tp, c)
            cp0.wait()
            cp1.wait()
            for ch in range(c):
                gch = g2[:, ch][:, None]
                a0[ch] = a0[ch] + lax.dot_general(
                    u0 * gch, v, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
                a1[ch] = a1[ch] + lax.dot_general(
                    u1 * gch, v, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
            cpo0 = pltpu.make_async_copy(
                a0, o0_ref.at[i, :, pl.ds(my0, _WIN_M), pl.ds(bx0, wx)],
                semo0)
            cpo1 = pltpu.make_async_copy(
                a1, o1_ref.at[i, :, pl.ds(my0, _WIN_M), pl.ds(bx0, wx)],
                semo1)
            cpo0.start()
            cpo1.start()
            cpo0.wait()
            cpo1.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("win", "s2", "srp", "slp", "interpret"))
def _scatter2_pallas(gs, coef, win, s2, srp, slp, interpret=False):
    """(dv0, dv1) from the four quarter-grid cotangents gs (each
    (N, h2, h2, C))."""
    n, _, _, c = gs[0].shape
    t = -(-win // _TILE)
    q = _TILE // 2
    h2 = win // 2
    # pack the four phase cotangents into the kernel's p-major tile layout
    gp = jnp.stack([jnp.pad(g.astype(jnp.float32),
                            ((0, 0), (0, t * q - h2), (0, t * q - h2),
                             (0, 0)))
                    for g in gs], axis=1)  # (n, 4, tq, tq, c)
    gp = gp.reshape(n, 2, 2, t, q, t, q, c).transpose(0, 3, 5, 1, 2, 4, 6, 7)
    gp = gp.reshape(n, t * t, _TILE * _TILE, c)
    # two DISTINCT zero accumulators (each is donated to its own output
    # via input_output_aliases; sharing one array would make the
    # must-alias sets overlap)
    zeros0 = jnp.zeros((n, c, srp, slp), jnp.float32)
    zeros1 = jnp.zeros((n, c, srp, slp), jnp.float32)

    wx = min(_WIN_X, slp)
    dv0, dv1 = pl.pallas_call(
        _scatter2_kernel(s2, srp, slp, c, win, wx),
        grid=(n, t, t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, _TILE * _TILE, c),
                         lambda i, ty, tx: (i, ty * t + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, srp, slp), jnp.float32),
            jax.ShapeDtypeStruct((n, c, srp, slp), jnp.float32),
        ],
        input_output_aliases={2: 0, 3: 1},
        scratch_shapes=[
            pltpu.VMEM((c, _WIN_M, wx), jnp.float32),
            pltpu.VMEM((c, _WIN_M, wx), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * t * c * _TILE * _TILE * 2 * _WIN_M * wx,
            bytes_accessed=4 * n * t * t * c * _WIN_M * wx * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coef.astype(jnp.float32), gp, zeros0, zeros1)
    return dv0, dv1


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gather2_vjp(v0, v1, coef, win, s2, use_pallas, interpret):
    if use_pallas:
        return _gather2_pallas(v0, v1, coef, win, s2, interpret=interpret)
    return _gather2_xla(v0, v1, coef, win, s2)


def _g2_fwd(v0, v1, coef, win, s2, use_pallas, interpret):
    out = _gather2_vjp(v0, v1, coef, win, s2, use_pallas, interpret)
    return out, (coef, v0.shape)


def _g2_bwd(win, s2, use_pallas, interpret, res, gs):
    coef, vshape = res
    if use_pallas:
        dv0, dv1 = _scatter2_pallas(gs, coef, win, s2, vshape[2], vshape[3],
                                    interpret=interpret)
    else:
        zeros = jnp.zeros(vshape, jnp.float32)
        _, vjp = jax.vjp(
            lambda a, b: _gather2_xla(a, b, coef, win, s2), zeros, zeros)
        dv0, dv1 = vjp(tuple(g.astype(jnp.float32) for g in gs))
    # coef depends only on non-trainable RNG draws; cotangent is dead
    return dv0, dv1, jnp.zeros_like(coef)


_gather2_vjp.defvjp(_g2_fwd, _g2_bwd)


def affine_gather_2phase(v0, v1, coef, win, s2, backend=None,
                         interpret=False):
    """Affine bilinear warp reading two planar y-phase planes of the
    2x-upsampled source and returning the warp output split by output
    parities.

    Args:
      v0, v1: (N, C, Sr, Sl) planar phase planes with v_phi[m, x] =
        x2[2m + phi, x]; rows/lanes may be padded beyond the logical
        (s2//2, s2) extents (padding is never read with nonzero weight).
        On the Pallas path rows must be a multiple of 8 and lanes a
        multiple of 128.
      coef: (N, 6) [ay, by, cy, ax, bx, cx]; source coords in the
        s-domain: qy = ay*i + by*j + cy for output pixel (i, j).
      win: output grid edge (even).
      s2: logical source edge (coordinate clipping bound).

    Returns:
      (Y00, Y01, Y10, Y11), each (N, win//2, win//2, C) NHWC with
      Yab[uy, ux] = warp_output[2*uy + a, 2*ux + b].
    """
    n, c, sr, sl = v0.shape
    assert v1.shape == v0.shape
    assert win % 2 == 0
    use_pallas = _use_pallas(backend, sr, sl)
    if use_pallas and not interpret:
        try:
            interpret = jax.default_backend() not in ("tpu", "axon")
        except Exception:
            interpret = True
    return _gather2_vjp(v0.astype(jnp.float32), v1.astype(jnp.float32),
                        coef.astype(jnp.float32), int(win), int(s2),
                        bool(use_pallas), bool(interpret))
