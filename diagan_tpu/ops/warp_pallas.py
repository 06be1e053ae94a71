"""Affine bilinear warp with a Pallas TPU backward (scatter-as-matmul).

The ADA pipeline's hot op is a per-image affine bilinear gather over the
2x-upsampled padded buffer (reference stylegan2/non_leaking.py:353-408 uses
torch grid_sample; its CUDA backward is a native scatter-add). On TPU, XLA
autodiff turns that gather's backward into a serial scatter-add that costs
~2.7 s at FFHQ-256 shapes — 7x the forward (docs/ROADMAP.md 3b). TPU has no
vector scatter at all, so the TPU-native formulation is to make the MXU do
it: the adjoint of bilinear interpolation is

    dx2[y, x] = sum_p g[p] * hat(qy_p - y) * hat(qx_p - x),

a sum of rank-1 outer products of "hat" (tent) vectors — i.e. for any tile
of output pixels P and any window of the input it touches,

    dx2[window] += (U * g[:, None])^T @ V,
    U[p, y] = hat(qy_p - (y + y0)),  V[p, x] = hat(qx_p - (x + x0)),

two dense one-hot-ish matrices contracted over the pixel dimension. The
kernel walks 32x32 output tiles (P=1024); each tile's source extent under
an affine map is bounded by its corners, so a static 128-row x 256-lane
input window (per-tile dynamic origin from the affine coefficients in
SMEM, rounded down onto the (8, 128) HBM tiling) covers scale factors up
to ~2.7x at worst-case 45-degree rotation — beyond the static
reflect-pad's own coverage (models/ada.py), so the window never truncates
a draw the surrounding pipeline could represent. The window is DMA'd from
HBM, accumulated in VMEM, and written back; TPU grid steps are
sequential, so the read-modify-write over overlapping windows is safe.

The forward runs through the same hat-matmul identity (out = rowsum((U @
window) * V)) — a gather with no gather instruction — and the backward
builds its weights from the *same clipped coordinates*, so the kernel pair
is an exact adjoint (fp-exact up to matmul summation order). An XLA
forward/backward pair is kept as the non-TPU path and oracle.

Like ops.upfirdn2d, a module switch picks the implementation: "auto"
(Pallas backward on TPU backends, XLA elsewhere), "xla", or "pallas".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 32          # output pixels per tile edge (P = _TILE**2 = 1024)
# static input window per tile: DMA origins must sit on the (8, 128) HBM
# tiling, so the y-origin rounds down to a multiple of 8 (window 128 rows,
# 7-row slack) and the x-origin to a multiple of 128 (window 256 lanes,
# 127-lane slack) — see the coverage note in the module docstring
_WIN_Y = 128
_WIN_X = 256

_BACKEND = "auto"


def set_backend(name: str):
    global _BACKEND
    assert name in ("auto", "xla", "pallas"), name
    _BACKEND = name


def _use_pallas(backend, s2):
    name = _BACKEND if backend is None else backend
    if name == "xla":
        return False
    if name == "pallas":
        return True
    if s2 < _WIN_Y:  # window would overrun the buffer; tiny images are cheap
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _bilinear_gather(img, qy, qx):
    """Clamped bilinear sample of one (H, W, C) image at float coords.
    Same weight structure the backward kernel rebuilds as hat functions."""
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


def _coords(coef, win):
    idx = jnp.arange(win, dtype=jnp.float32)
    ii, jj = jnp.meshgrid(idx, idx, indexing="ij")
    ay, by, cy, ax, bx, cx = [coef[:, k, None, None] for k in range(6)]
    qy = ay * ii[None] + by * jj[None] + cy
    qx = ax * ii[None] + bx * jj[None] + cx
    return qy, qx


def _gather_fwd_xla(x2, coef, win):
    qy, qx = _coords(coef, win)
    return jax.vmap(_bilinear_gather)(x2, qy, qx)


def _gather_kernel(s2, s2p, c, win, wx, n, t):
    """Forward as the same hat-matmul: out[p] = sum_y sum_x U[p,y] *
    window[y,x] * V[p,x] = rowsum((U @ window) * V) — one DMA'd input
    window per 32x32 output tile, no gather instruction anywhere.

    FLAT grid (n*t*t) with a double-buffered window scratch: cell g+1's
    window DMA is issued before cell g's compute, hiding the per-cell
    DMA latency that dominated the serial start/wait version (the
    fir_pallas prefetch pattern; pure-read input, so unlike the scatter
    there is no RMW hazard)."""
    tp = _TILE * _TILE
    tt = t * t
    total = n * tt

    def kernel(coef_ref, x_ref, o_ref, wsc2, sems):

        def cell_coef(g):
            i = g // tt
            return [coef_ref[i, k] for k in range(6)]

        def cell_origins(g):
            ay, by, cy, ax, bx, cx = cell_coef(g)
            r = g % tt
            i0 = ((r // t) * _TILE).astype(jnp.float32)
            j0 = ((r % t) * _TILE).astype(jnp.float32)

            def origin(a, b, cc, wwin, align):
                q00 = a * i0 + b * j0 + cc
                qmin = (q00 + jnp.minimum(a * (_TILE - 1.0), 0.0)
                        + jnp.minimum(b * (_TILE - 1.0), 0.0))
                qmin = jnp.clip(qmin, 0.0, s2 - 1.0)
                o = jnp.clip(jnp.floor(qmin) - 1.0, 0.0, float(s2p - wwin))
                oi = (o.astype(jnp.int32) // align) * align
                return pl.multiple_of(oi, align)

            return (origin(ay, by, cy, _WIN_Y, 8),
                    origin(ax, bx, cx, wx, 128))

        def cp(g, slot):
            byi, bxi = cell_origins(g)
            return pltpu.make_async_copy(
                x_ref.at[g // tt, :, pl.ds(byi, _WIN_Y), pl.ds(bxi, wx)],
                wsc2.at[slot], sems.at[slot])

        g = pl.program_id(0)
        slot = g % 2
        nxt = (g + 1) % 2

        @pl.when(g == 0)
        def _():
            cp(g, slot).start()

        @pl.when(g + 1 < total)
        def _():
            cp(g + 1, nxt).start()

        ay, by, cy, ax, bx, cx = cell_coef(g)
        r = g % tt
        i0 = ((r // t) * _TILE).astype(jnp.float32)
        j0 = ((r % t) * _TILE).astype(jnp.float32)
        byi, bxi = cell_origins(g)
        byo = byi.astype(jnp.float32)
        bxo = bxi.astype(jnp.float32)

        p = lax.broadcasted_iota(jnp.int32, (tp, _WIN_Y), 0)
        di = (p // _TILE).astype(jnp.float32)
        dj = (p % _TILE).astype(jnp.float32)
        ii = i0 + di
        jj = j0 + dj
        lane_y = lax.broadcasted_iota(jnp.int32, (tp, _WIN_Y), 1).astype(
            jnp.float32)
        qy = jnp.clip(ay * ii + by * jj + cy, 0.0, s2 - 1.0)
        u = jnp.maximum(0.0, 1.0 - jnp.abs(qy - (lane_y + byo)))

        # Separable fast path: with no rotation/shear (by == ax == 0 —
        # ADA applies rotation with probability p, so at the realized
        # p<=0.1 of real runs ~90% of images qualify) qx depends only on
        # the output COLUMN dj, so the (tp, wx) hat matrix V factors as
        # onehot (tp, 32) @ V_s (32, wx), and contracting x FIRST shrinks
        # the per-channel MXU work from 2*tp*WIN_Y*wx (67 MFLOP) to
        # 2*WIN_Y*wx*32 + 2*tp*WIN_Y*32 (~10.5 MFLOP). Same hat weights,
        # same result up to matmul summation order; grid cells are
        # predicated per image (pl.when). Kept reshape-free — Mosaic
        # rejects (32,32)->(1024,) vector shape casts inside kernels.
        sep = (by == 0.0) & (ax == 0.0)
        cp(g, slot).wait()
        wsc = wsc2.at[slot]

        @pl.when(sep)
        def _sep():
            c32 = lax.broadcasted_iota(jnp.int32, (_TILE, wx), 0)
            lx32 = lax.broadcasted_iota(jnp.int32, (_TILE, wx), 1)
            qx_c = jnp.clip(bx * (j0 + c32.astype(jnp.float32)) + cx,
                            0.0, s2 - 1.0)
            v_s = jnp.maximum(
                0.0, 1.0 - jnp.abs(qx_c - (lx32.astype(jnp.float32) + bxo)))
            lane32 = lax.broadcasted_iota(jnp.int32, (tp, _TILE), 1)
            rowp = lax.broadcasted_iota(jnp.int32, (tp, _TILE), 0)
            onehot = (rowp % _TILE == lane32).astype(jnp.float32)
            outs = []
            for ch in range(c):
                tmp = lax.dot_general(wsc[ch], v_s, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=lax.Precision.HIGHEST)
                big = lax.dot_general(u, tmp, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=lax.Precision.HIGHEST)
                outs.append(jnp.sum(big * onehot, axis=1))
            o_ref[0, 0] = jnp.stack(outs, axis=-1)

        @pl.when(jnp.logical_not(sep))
        def _gen():
            lane_x = lax.broadcasted_iota(jnp.int32, (tp, wx), 1).astype(
                jnp.float32)
            qx = jnp.clip(ax * ii + bx * jj + cx, 0.0, s2 - 1.0)
            v = jnp.maximum(0.0, 1.0 - jnp.abs(qx[:, :1] - (lane_x + bxo)))
            outs = []
            for ch in range(c):
                tmp = lax.dot_general(u, wsc[ch], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=lax.Precision.HIGHEST)
                outs.append(jnp.sum(tmp * v, axis=1))
            o_ref[0, 0] = jnp.stack(outs, axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def _gather_fwd_pallas(x2, coef, win, interpret=False):
    n, s2, _, c = x2.shape
    t = -(-win // _TILE)
    winp = t * _TILE
    s2p = -(-s2 // 128) * 128
    wx = min(_WIN_X, s2p)
    xt = jnp.pad(x2.astype(jnp.float32).transpose(0, 3, 1, 2),
                 ((0, 0), (0, 0), (0, s2p - s2), (0, s2p - s2)))
    out = pl.pallas_call(
        _gather_kernel(s2, s2p, c, win, wx, n, t),
        grid=(n * t * t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coef, whole (N, 6)
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, _TILE * _TILE, c),
                               lambda g: (g // (t * t), g % (t * t), 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t * t, _TILE * _TILE, c),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c, _WIN_Y, wx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * t * c * _TILE * _TILE * _WIN_Y * wx,
            bytes_accessed=n * t * t * c * _WIN_Y * wx * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coef.astype(jnp.float32), xt)
    out = out.reshape(n, t, t, _TILE, _TILE, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(n, winp, winp, c)
    return out[:, :win, :win]


def _scatter_kernel(s2, s2p, c, win, wx):
    """Build the per-tile backward kernel body (all sizes static).
    s2 is the logical source-buffer edge (coordinate clipping); s2p the
    128-padded edge of the gradient buffer (DMA bounds)."""
    tp = _TILE * _TILE

    def kernel(coef_ref, g_ref, z_ref, out_ref, acc, sem_i, sem_o):
        del z_ref  # aliased to out_ref: storage only
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

            def origin(a, b, cc, wwin, align):
                # affine => extrema at tile corners; clip like the forward,
                # then round the origin down onto the HBM tiling so the
                # window DMA start is provably aligned
                q00 = a * i0 + b * j0 + cc
                qmin = (q00 + jnp.minimum(a * (_TILE - 1.0), 0.0)
                        + jnp.minimum(b * (_TILE - 1.0), 0.0))
                qmin = jnp.clip(qmin, 0.0, s2 - 1.0)
                o = jnp.clip(jnp.floor(qmin) - 1.0, 0.0, float(s2p - wwin))
                oi = (o.astype(jnp.int32) // align) * align
                return pl.multiple_of(oi, align)

            byi = origin(ay, by, cy, _WIN_Y, 8)
            bxi = origin(ax, bx, cx, wx, 128)
            byo = byi.astype(jnp.float32)
            bxo = bxi.astype(jnp.float32)
            cp_in = pltpu.make_async_copy(
                out_ref.at[i, :, pl.ds(byi, _WIN_Y), pl.ds(bxi, wx)],
                acc, sem_i,
            )
            cp_in.start()

            g2 = g_ref[0, 0]  # (tp, c)
            # hat-weight U over (pixel, y-window) — shared by both paths
            # (by == 0 makes the separable qy identical by construction)
            p = lax.broadcasted_iota(jnp.int32, (tp, _WIN_Y), 0)
            di = (p // _TILE).astype(jnp.float32)
            dj = (p % _TILE).astype(jnp.float32)
            ii = i0 + di
            jj = j0 + dj
            lane_y = lax.broadcasted_iota(
                jnp.int32, (tp, _WIN_Y), 1).astype(jnp.float32)
            qy = jnp.clip(ay * ii + by * jj + cy, 0.0, s2 - 1.0)
            u = jnp.maximum(0.0, 1.0 - jnp.abs(qy - (lane_y + byo)))
            # separable fast path (see _gather_kernel): V factors through
            # a (tp, 32) one-hot, so the adjoint contracts as
            #     t1 = (U*g)^T (WIN_Y, tp) @ onehot (tp, 32)   [8.4 MFLOP]
            #     dx2[window] += t1 @ V_s (32, wx)             [2.1 MFLOP]
            # vs the generic 67 MFLOP/ch. Reshape-free (Mosaic rejects
            # (1024,)->(32,32) vector shape casts inside kernels).
            sep = (by == 0.0) & (ax == 0.0)
            cp_in.wait()

            @pl.when(sep)
            def _sep():
                c32 = lax.broadcasted_iota(jnp.int32, (_TILE, wx), 0)
                lx32 = lax.broadcasted_iota(jnp.int32, (_TILE, wx), 1)
                qx_c = jnp.clip(bx * (j0 + c32.astype(jnp.float32)) + cx,
                                0.0, s2 - 1.0)
                v_s = jnp.maximum(
                    0.0,
                    1.0 - jnp.abs(qx_c - (lx32.astype(jnp.float32) + bxo)))
                lane32 = lax.broadcasted_iota(jnp.int32, (tp, _TILE), 1)
                rowp = lax.broadcasted_iota(jnp.int32, (tp, _TILE), 0)
                onehot = (rowp % _TILE == lane32).astype(jnp.float32)
                for ch in range(c):
                    a_mat = u * g2[:, ch][:, None]
                    t1 = lax.dot_general(
                        a_mat, onehot, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST,
                    )  # (WIN_Y, 32)
                    contrib = lax.dot_general(
                        t1, v_s, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST,
                    )  # (WIN_Y, wx)
                    acc[ch] = acc[ch] + contrib

            @pl.when(jnp.logical_not(sep))
            def _gen():
                lane_x = lax.broadcasted_iota(
                    jnp.int32, (tp, wx), 1).astype(jnp.float32)
                qx = jnp.clip(ax * ii + bx * jj + cx, 0.0, s2 - 1.0)
                # qx is constant along its (redundant) lane dim; broadcast
                # one column against the wider x window
                v = jnp.maximum(
                    0.0, 1.0 - jnp.abs(qx[:, :1] - (lane_x + bxo)))
                for ch in range(c):
                    a_mat = u * g2[:, ch][:, None]
                    contrib = lax.dot_general(
                        a_mat, v, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST,  # MXU default bf16
                    )
                    acc[ch] = acc[ch] + contrib

            cp_out = pltpu.make_async_copy(
                acc,
                out_ref.at[i, :, pl.ds(byi, _WIN_Y), pl.ds(bxi, wx)],
                sem_o,
            )
            cp_out.start()
            cp_out.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("s2", "win", "interpret"))
def _scatter_grad_pallas(g, coef, s2, win, interpret=False):
    """dx2 (N, s2, s2, C) from upstream g (N, win, win, C)."""
    n, _, _, c = g.shape
    t = -(-win // _TILE)
    winp = t * _TILE
    s2p = -(-s2 // 128) * 128  # aligned DMA bounds (see _scatter_kernel)
    wx = min(_WIN_X, s2p)      # lane window cannot exceed the buffer
    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (0, winp - win), (0, winp - win), (0, 0)))
    # (N, T*T, 1024, C): tile pixels contiguous in the sublane dim so the
    # kernel's (pixel, window) hat matrices broadcast without relayouts
    g_r = gp.reshape(n, t, _TILE, t, _TILE, c).transpose(0, 1, 3, 2, 4, 5)
    g_r = g_r.reshape(n, t * t, _TILE * _TILE, c)
    zeros = jnp.zeros((n, c, s2p, s2p), jnp.float32)

    out = pl.pallas_call(
        _scatter_kernel(s2, s2p, c, win, wx),
        grid=(n, t, t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coef, whole (N, 6)
            pl.BlockSpec((1, 1, _TILE * _TILE, c),
                         lambda i, ty, tx: (i, ty * t + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, c, s2p, s2p), jnp.float32),
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((c, _WIN_Y, wx), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * t * c * _TILE * _TILE * _WIN_Y * wx,
            bytes_accessed=2 * n * t * t * c * _WIN_Y * wx * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coef.astype(jnp.float32), g_r, zeros)
    return out[:, :, :s2, :s2].transpose(0, 2, 3, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _affine_gather_vjp(x2, coef, win, s2, use_pallas, interpret):
    if use_pallas:
        return _gather_fwd_pallas(x2, coef, win, interpret=interpret)
    return _gather_fwd_xla(x2, coef, win)


def _vjp_fwd(x2, coef, win, s2, use_pallas, interpret):
    return (_affine_gather_vjp(x2, coef, win, s2, use_pallas, interpret),
            coef)


def _vjp_bwd(win, s2, use_pallas, interpret, res, g):
    coef = res
    if use_pallas:
        dx2 = _scatter_grad_pallas(g, coef, s2, win, interpret=interpret)
    else:
        n, c = g.shape[0], g.shape[-1]
        qy, qx = _coords(coef, win)
        zeros = jnp.zeros((n, s2, s2, c), jnp.float32)
        _, vjp = jax.vjp(lambda x: jax.vmap(_bilinear_gather)(x, qy, qx),
                         zeros)
        (dx2,) = vjp(g.astype(jnp.float32))
    # coef is a function of non-trainable RNG draws; its cotangent is
    # discarded by every caller (the reference's grid grad is likewise dead)
    return dx2, jnp.zeros_like(coef)


_affine_gather_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def affine_gather(x2, coef, win, backend=None, interpret=False):
    """Per-image affine bilinear warp of x2 (N, S2, S2, C) onto a win x win
    output grid. coef is (N, 6): [ay, by, cy, ax, bx, cx] with source
    coordinates qy = ay*i + by*j + cy, qx = ax*i + bx*j + cx for output
    pixel (i, j). Coordinates are edge-clamped (torch grid_sample
    padding_mode='border' semantics, as the reference relies on after its
    reflect pad). Differentiable in x2; backward runs the Pallas
    scatter-as-matmul kernel on TPU backends ("auto")."""
    n, s2, s2b, c = x2.shape
    assert s2 == s2b, "affine_gather assumes a square source buffer"
    use_pallas = _use_pallas(backend, s2)
    if use_pallas and not interpret:
        try:
            interpret = jax.default_backend() not in ("tpu", "axon")
        except Exception:
            interpret = True
    return _affine_gather_vjp(x2.astype(jnp.float32), coef.astype(jnp.float32),
                              int(win), int(s2), bool(use_pallas),
                              bool(interpret))
