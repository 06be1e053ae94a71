"""ADA — adaptive discriminator augmentation (non-leaking) for StyleGAN2.

Distribution parity with reference stylegan2/non_leaking.py:
  geometric (sample_affine, non_leaking.py:188-244): x-flip, 90-degree
  rotation with the reference's category set {0, 3}, pixel-rounded integer
  translation (one scalar shared by both axes), isotropic log-normal scale,
  a pre-rotate / anisotropic-scale / post-rotate sandwich where both
  rotations fire at p_rot = 1 - sqrt(1 - p), and fractional translation
  (again one scalar for both axes) — each transform gated by an independent
  Bernoulli(p) and composed into one 3x3 matrix;
  color (sample_color, non_leaking.py:247-278): brightness, contrast,
  luma flip, hue rotation, saturation as composed 4x4 matrices.
Every gate and every parameter draws from its own split of the RNG key
(the reference draws them as independent torch RNG calls).

Resampling is antialiased through the same separable sym6 wavelet filter
as the reference (non_leaking.py:46-59,353-408): reflect-pad, 2x upsample
through `upfirdn2d` with the flipped kernel, one bilinear affine gather at
the doubled resolution, then sym6 filter + 2x downsample and crop. Because
sym6 is an orthonormal scaling filter, the identity transform reconstructs
the input exactly — same property as the reference pipeline. TPU-native
deviations (documented in docs/PARITY.md): the reflect pad is a STATIC
3h/4 + 6 (XLA needs static shapes; the reference pads dynamically per
batch and resamples G when torch's reflect pad overflows), and source
coordinates beyond the padded region clamp to its edge instead of
triggering a resample — both only reachable in the far tail of the scale
distribution.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.ops.upfirdn2d import upfirdn2d
from diagan_tpu.ops.warp_pallas import affine_gather

# sym6 wavelet scaling filter, the reference's antialiasing kernel
# (non_leaking.py:46-59). Orthonormal: sum(k^2) == 1, sum(k) == sqrt(2).
SYM6 = (
    0.015404109327027373,
    0.0034907120842174702,
    -0.11799011114819057,
    -0.048311742585633,
    0.4910559419267466,
    0.787641141030194,
    0.3379294217276218,
    -0.07263752278646252,
    -0.021060292512300564,
    0.04472490177066578,
    0.0017677118642428036,
    -0.007800708325034148,
)


def _rot2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack([
        jnp.stack([sx, z, z], -1),
        jnp.stack([z, sy, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _translate2d(tx, ty):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack([
        jnp.stack([o, z, tx], -1),
        jnp.stack([z, o, ty], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _gated(key, prob, M, G):
    """select*M + (1-select)*I, then compose — the reference's
    random_mat_apply (non_leaking.py:180-185), with the gate drawn from its
    OWN key (independent of the parameter draw)."""
    n = M.shape[0]
    sel = jax.random.bernoulli(key, prob, (n,)).astype(M.dtype)[:, None, None]
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)[None]
    return (sel * M + (1.0 - sel) * eye) @ G


def _lognormal2(key, n, std_log2):
    """2 ** Normal(0, std_log2) == reference lognormal_sample(std=std*ln2)."""
    return 2.0 ** (std_log2 * jax.random.normal(key, (n,)))


def sample_affine_matrices(key, n, p, height, width):
    """Per-sample composed 3x3 geometric matrices in [-1,1] image coords.

    Exact transform-distribution parity with sample_affine
    (non_leaking.py:188-244), including its quirks: 90-degree rotation
    categories are {0, 3} (identity or +90), integer/fractional translation
    reuse one scalar for both axes, and integer translation is rounded to
    the pixel grid of each axis.
    """
    ks = jax.random.split(key, 16)
    G = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
    ones = jnp.ones((n,), jnp.float32)

    # x-flip: param in {0,1} -> scale(1-2*param, 1)
    param = jax.random.bernoulli(ks[1], 0.5, (n,)).astype(jnp.float32)
    G = _gated(ks[0], p, _scale2d(1.0 - 2.0 * param, ones), G)

    # 90-degree rotation: category_sample(size, (0, 3)) — identity or
    # -pi/2*3 = +90deg only (non_leaking.py:199-200)
    param = 3.0 * jax.random.bernoulli(ks[3], 0.5, (n,)).astype(jnp.float32)
    G = _gated(ks[2], p, _rot2d(-(math.pi / 2) * param), G)

    # integer translate: ONE U(-1/8, 1/8) scalar, rounded to each axis's
    # pixel grid (non_leaking.py:205-208)
    t = jax.random.uniform(ks[5], (n,), minval=-0.125, maxval=0.125)
    G = _gated(ks[4], p, _translate2d(
        jnp.round(t * width) / width, jnp.round(t * height) / height), G)

    # isotropic scale: lognormal(std = 0.2*ln2)
    s = _lognormal2(ks[7], n, 0.2)
    G = _gated(ks[6], p, _scale2d(s, s), G)

    # pre-rotate / anisotropic scale / post-rotate sandwich: the rotations
    # fire at p_rot = 1 - sqrt(1-p) so that "any rotation applied" has
    # probability ~p (non_leaking.py:218-236)
    p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - p, 0.0, 1.0))
    theta = jax.random.uniform(ks[9], (n,), minval=-math.pi, maxval=math.pi)
    G = _gated(ks[8], p_rot, _rot2d(-theta), G)

    s = _lognormal2(ks[11], n, 0.2)
    G = _gated(ks[10], p, _scale2d(s, 1.0 / s), G)

    theta = jax.random.uniform(ks[13], (n,), minval=-math.pi, maxval=math.pi)
    G = _gated(ks[12], p_rot, _rot2d(-theta), G)

    # fractional translate: ONE N(0, 0.125) scalar for both axes
    t = 0.125 * jax.random.normal(ks[15], (n,))
    G = _gated(ks[14], p, _translate2d(t, t), G)
    return G


def sample_color_matrices(key, n, p):
    """Composed 4x4 color matrices — parity with sample_color
    (non_leaking.py:247-278); every gate/parameter pair on its own key."""
    ks = jax.random.split(key, 10)
    C = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1))
    v = jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32) / math.sqrt(3)
    eye4 = jnp.eye(4, dtype=jnp.float32)

    # brightness: translate3d(b, b, b), b ~ N(0, 0.2)
    b = 0.2 * jax.random.normal(ks[1], (n,))
    M = jnp.tile(eye4[None], (n, 1, 1)).at[:, :3, 3].set(b[:, None])
    C = _gated(ks[0], p, M, C)

    # contrast: scale3d(c, c, c), c ~ 2^N(0, 0.5)
    c = _lognormal2(ks[3], n, 0.5)
    M = jnp.tile(eye4[None], (n, 1, 1))
    M = M.at[:, 0, 0].set(c).at[:, 1, 1].set(c).at[:, 2, 2].set(c)
    C = _gated(ks[2], p, M, C)

    # luma flip: eye - 2*outer(v,v)*i, i in {0,1}
    i = jax.random.bernoulli(ks[5], 0.5, (n,)).astype(jnp.float32)
    M = eye4[None] - 2.0 * jnp.outer(v, v)[None] * i[:, None, None]
    C = _gated(ks[4], p, M, C)

    # hue rotation about the luma axis (Rodrigues)
    theta = jax.random.uniform(ks[7], (n,), minval=-math.pi, maxval=math.pi)
    axis = v[:3] * math.sqrt(3) / math.sqrt(3)  # (1,1,1)/sqrt(3)
    K = jnp.asarray([[0, -axis[2], axis[1]],
                     [axis[2], 0, -axis[0]],
                     [-axis[1], axis[0], 0]], jnp.float32)
    ct = jnp.cos(theta)[:, None, None]
    st = jnp.sin(theta)[:, None, None]
    R3 = ct * jnp.eye(3)[None] + st * K[None] \
        + (1 - ct) * jnp.outer(axis, axis)[None]
    M = jnp.tile(eye4[None], (n, 1, 1)).at[:, :3, :3].set(R3)
    C = _gated(ks[6], p, M, C)

    # saturation: outer4 + (eye4 - outer4)*s over the FULL 4x4 (the
    # reference's saturation_mat also scales the homogeneous corner,
    # non_leaking.py:146-154 — harmless at application, kept for
    # matrix-level parity)
    s = _lognormal2(ks[9], n, 1.0)
    vv4 = jnp.outer(v, v)
    M = vv4[None] + (eye4[None] - vv4[None]) * s[:, None, None]
    C = _gated(ks[8], p, M, C)
    return C


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------
def _bilinear_gather(img, qy, qx):
    """Clamped bilinear sample of one (H, W, C) image at float coords."""
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


def _polyphase_auto():
    import os

    # Opt-in (DIAGAN_TPU_ADA_POLYPHASE=1, TPU backends only): measured
    # SLOWER than the interleaved path at FFHQ-256 on the v5e — 731 vs
    # 649 ms/step inside the ADA-live fused chunk, 117 vs 91 ms
    # standalone fwd — the per-FIR-call pad/slice plumbing (8 launches
    # vs 4) outweighs the structural saving (no zero-stuffed (2S, 2S)
    # buffers, no NCHW relayouts, half the FIR FMAs). Kept as a correct,
    # adjoint-exact alternative (tests/test_ada_phase.py) in case the
    # plumbing is ever fused; docs/ROADMAP.md records the measurement.
    flag = os.environ.get("DIAGAN_TPU_ADA_POLYPHASE", "0")
    if flag != "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _apply_affine_polyphase(images, coef, P, win, k1):
    """Antialiased resample with the 2-phase planar pipeline
    (ops/ada_phase.py module docstring has the identities): the
    2x-upsampled buffer is carried as two compact y-phase planes, the
    warp consumes them directly and emits the four output-parity
    quarter-grids, and the downsample is four stride-1 FIRs over those.
    Same math as the interleaved path (only fp summation order differs:
    x-pass-first up to ~1e-6 rel); avoids the zero-stuffed (2S, 2S)
    intermediates and the NCHW relayouts around the warp that dominate
    the interleaved path's cost at 256px (docs/VALIDATION.md round 3)."""
    from diagan_tpu.ops.ada_phase import affine_gather_2phase

    n, h, w, c = images.shape
    pad_k = (len(k1) + 1) // 2  # 6
    s = h + 2 * P
    s2 = 2 * s

    # planar entry: one small lane-crossing transpose at h (not 2S)
    xp = images.transpose(0, 3, 1, 2)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (P, P), (P, P)), mode="reflect")
    flat = xp.reshape(n * c, s, s, 1)

    # x up-pass (interleaved lanes), then the two compact y-phase FIRs:
    # x2[2m+phi, :] = sum_t b_phi[t] * A[m+t-d_phi, :]
    kxf = k1[None, ::-1]
    a_buf = upfirdn2d(flat, kxf, up=(2, 1), pad=(pad_k, pad_k - 1, 0, 0))
    b0 = k1[0::2][::-1][:, None]   # given kernels are pre-flipped so the
    b1 = k1[1::2][::-1][:, None]   # op's correlation applies b_phi
    v0 = upfirdn2d(a_buf, b0, pad=(0, 0, 3, 2))
    v1 = upfirdn2d(a_buf, b1, pad=(0, 0, 2, 3))

    srp = -(-s // 8) * 8
    slp = -(-s2 // 128) * 128
    v0 = jnp.pad(v0.reshape(n, c, s, s2), ((0, 0), (0, 0), (0, srp - s),
                                           (0, slp - s2)))
    v1 = jnp.pad(v1.reshape(n, c, s, s2), ((0, 0), (0, 0), (0, srp - s),
                                           (0, slp - s2)))
    ys = affine_gather_2phase(v0, v1, coef, win, s2)

    # polyphase downsample: down[o] = sum_t c0[t]*Y0[o+t-2]
    #                                + sum_t c1[t]*Y1[o+t-3]
    c_tap = (k1[10::-2], k1[11::-2])  # c0[t] = k[10-2t], c1[t] = k[11-2t]
    d_off = (2, 3)
    out = None
    for idx, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        k2 = np.outer(c_tap[a][::-1], c_tap[b][::-1])
        py0, px0 = d_off[a], d_off[b]
        term = upfirdn2d(ys[idx], k2, pad=(px0, 5 - px0, py0, 5 - py0))
        out = term if out is None else out + term
    return out[:, 3:3 + h, 3:3 + w, :]


def _antialiased_resample(images, Ginv, P, k1):
    """The sym6 resample pipeline at ONE static reflect pad P: reflect
    pad, 2x up-filter, affine warp, down-filter, crop (reference
    non_leaking.py:353-408; the factored-out tail of apply_affine)."""
    n, h, w, c = images.shape
    ky, kx = k1[:, None], k1[None, :]
    kyf, kxf = ky[::-1], kx[:, ::-1]
    pad_k = (len(k1) + 1) // 2  # 6

    m0 = 2 * P - pad_k
    win = 2 * h + 2 * pad_k
    beta = (m0 + 0.5 - 2 * P) / h - 1.0
    off = 2 * P - 0.5
    ay = Ginv[:, 1, 1]
    by = Ginv[:, 1, 0]
    cy = h * ((Ginv[:, 1, 0] + Ginv[:, 1, 1]) * beta + Ginv[:, 1, 2] + 1.0) \
        + off
    ax = Ginv[:, 0, 1]
    bx = Ginv[:, 0, 0]
    cx = h * ((Ginv[:, 0, 0] + Ginv[:, 0, 1]) * beta + Ginv[:, 0, 2] + 1.0) \
        + off
    coef = jnp.stack([ay, by, cy, ax, bx, cx], -1)

    xp = jnp.pad(images, ((0, 0), (P, P), (P, P), (0, 0)), mode="reflect")
    x2 = upfirdn2d(xp, kyf, up=(1, 2), pad=(0, 0, pad_k, pad_k - 1))
    x2 = upfirdn2d(x2, kxf, up=(2, 1), pad=(pad_k, pad_k - 1, 0, 0))
    y = affine_gather(x2, coef, win)
    out = upfirdn2d(y, ky, down=(1, 2), pad=(0, 0, pad_k - 1, pad_k - 1))
    out = upfirdn2d(out, kx, down=(2, 1), pad=(pad_k - 1, pad_k - 1, 0, 0))
    return out[:, 3:3 + h, 3:3 + w, :]


def _needed_pad(Ginv, h):
    """Smallest reflect pad (pixels) under which the warp's reads stay
    strictly inside the padded buffer AND away from the up-filter's
    support at the buffer edge, for THIS batch of transforms — the
    per-batch quantity the reference's dynamic pad derives implicitly
    (non_leaking.py:371-383). Uses the P=0 warp coefficients: q(P) =
    q(0) + 2P, so the no-clamp condition q >= 0, q <= 2(h+2P)-2 becomes
    P >= max(-qmin, qmax - 2h + 2) / 2; +pad_k keeps a full filter
    support between any read and the small buffer's edge (where the
    up-pass consumes upfirdn zero padding instead of deeper reflect
    content), making bucket outputs fp-identical within coverage."""
    pad_k = 6
    win = 2 * h + 2 * pad_k
    beta = (-pad_k + 0.5) / h - 1.0

    def minmax(a, b, cbase):
        lo = cbase + jnp.minimum(a * (win - 1.0), 0.0) \
            + jnp.minimum(b * (win - 1.0), 0.0)
        hi = cbase + jnp.maximum(a * (win - 1.0), 0.0) \
            + jnp.maximum(b * (win - 1.0), 0.0)
        return lo, hi

    cy = h * ((Ginv[:, 1, 0] + Ginv[:, 1, 1]) * beta + Ginv[:, 1, 2] + 1.0) \
        - 0.5
    cx = h * ((Ginv[:, 0, 0] + Ginv[:, 0, 1]) * beta + Ginv[:, 0, 2] + 1.0) \
        - 0.5
    ylo, yhi = minmax(Ginv[:, 1, 1], Ginv[:, 1, 0], cy)
    xlo, xhi = minmax(Ginv[:, 0, 1], Ginv[:, 0, 0], cx)
    qmin = jnp.minimum(jnp.min(ylo), jnp.min(xlo))
    qmax = jnp.maximum(jnp.max(yhi), jnp.max(xhi))
    need = jnp.maximum(-qmin, qmax - 2.0 * h + 2.0) / 2.0
    return jnp.ceil(jnp.maximum(need, 0.0)) + pad_k + 1


def apply_affine(images, G, antialias=True, pad_frac=0.75, polyphase=None,
                 pad_buckets=None):
    """Apply per-sample affine matrices (output NDC -> input NDC via G^-1).

    antialias=True (default) is the reference pipeline
    (random_apply_affine, non_leaking.py:353-408): reflect pad, sym6 2x
    upsample via upfirdn2d(kernel_flip), bilinear affine gather at 2x,
    sym6 + 2x downsample, crop. The flipped-up / unflipped-down kernel
    pairing cancels sym6's group delay, and orthonormality makes the
    identity transform exact.

    pad_frac sets the STATIC reflect pad as a fraction of the image size.
    The default 0.75 covers the full transform distribution (rotated
    corner at the +3-sigma scale tail); the padded area is the main cost
    driver (the upsampled buffer and its scatter-grad scale with
    (1+2*pad_frac)^2), so speed-sensitive runs can trade tail coverage
    for ~2x step time with pad_frac=0.33 (covers rotation at scale<=1;
    beyond it, corners clamp to the pad edge — see docs/PARITY.md).

    antialias=False is a single bilinear gather at 1x — cheaper, aliased;
    kept for ablation.

    polyphase selects the 2-phase planar implementation of the same
    resample (None = auto: the INTERLEAVED path everywhere unless the
    env opt-in DIAGAN_TPU_ADA_POLYPHASE=1 is set on a TPU backend — the
    planar path measured slower as-built on the v5e, docs/ROADMAP.md
    item 10). It computes the same math with the 2x buffer held as
    compact y-phase planes (ops/ada_phase.py) — no zero-stuffed (2S, 2S)
    intermediates, no NCHW relayouts around the warp; outputs differ
    from the interleaved path only by fp32 summation order (~1e-6 rel).

    pad_buckets (tuple of fractions <= pad_frac, e.g. (0.25, 0.5)):
    extent-bucketed static pad — a lax.switch picks the smallest bucket
    whose pad covers this batch's transforms (computed from G inside the
    program, _needed_pad); the augment cost scales with (1 + 2P/h)^2, so
    mild batches run several-fold cheaper while outputs stay
    fp-identical within coverage. pad_frac remains the largest bucket.
    """
    n, h, w, c = images.shape
    Ginv = jnp.linalg.inv(G)

    if not antialias:
        ys = (2.0 * jnp.arange(h) + 1.0) / h - 1.0
        xs = (2.0 * jnp.arange(w) + 1.0) / w - 1.0
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        grid = jnp.stack([xx, yy, jnp.ones_like(xx)], 0).reshape(3, -1)
        src = jnp.einsum("nij,jk->nik", Ginv, grid)
        qx = (src[:, 0] + 1) * (w / 2) - 0.5
        qy = (src[:, 1] + 1) * (h / 2) - 0.5
        out = jax.vmap(_bilinear_gather)(images, qy.reshape(n, h, w),
                                         qx.reshape(n, h, w))
        return out

    # --- antialiased path ------------------------------------------------
    assert h == w, "ADA antialiased path assumes square images"
    # The reference applies the 2-D outer-product kernel in one 144-tap
    # pass (its CUDA op is 2-D only); sym6 x sym6 is exactly separable, so
    # two 12-tap 1-D passes compute the identical result 6x cheaper.
    k1 = np.asarray(SYM6, np.float32)
    pad_k = (len(SYM6) + 1) // 2    # 6
    P = min(h - 1, int(pad_frac * h) + pad_k)  # static reflect pad (doc above)
    # (warp-coefficient derivation: see _antialiased_resample — the
    # per-image q = (src+1)*h + 2P - 0.5 is affine in output indices and
    # folds into 6 coefficients, so the warp never materializes the grid)

    if polyphase is None:
        polyphase = _polyphase_auto()
    if polyphase:
        m0 = 2 * P - pad_k
        win = 2 * h + 2 * pad_k
        beta = (m0 + 0.5 - 2 * P) / h - 1.0
        off = 2 * P - 0.5
        ay = Ginv[:, 1, 1]
        by = Ginv[:, 1, 0]
        cy = h * ((Ginv[:, 1, 0] + Ginv[:, 1, 1]) * beta
                  + Ginv[:, 1, 2] + 1.0) + off
        ax = Ginv[:, 0, 1]
        bx = Ginv[:, 0, 0]
        cx = h * ((Ginv[:, 0, 0] + Ginv[:, 0, 1]) * beta
                  + Ginv[:, 0, 2] + 1.0) + off
        coef = jnp.stack([ay, by, cy, ax, bx, cx], -1)
        return _apply_affine_polyphase(images, coef, P, win, k1)

    if pad_buckets:
        # extent-bucketed static pad (docs/ROADMAP.md item b, VERDICT r3
        # item 5): the needed pad is computed from THIS batch's matrices
        # inside the program and lax.switch picks the smallest static
        # bucket that covers it — the runtime cost of an augment call
        # scales with (1 + 2P/h)^2, and at typical ada_p most batches
        # need only the smallest bucket (the reference's dynamic
        # per-batch pad does the same selection implicitly,
        # non_leaking.py:371-383). Outputs are fp-identical to the
        # largest bucket within coverage (_needed_pad keeps a full
        # filter support of margin); transforms beyond the largest
        # bucket clamp exactly as the static path does.
        Ps = sorted({min(h - 1, int(f * h) + pad_k) for f in pad_buckets}
                    | {P})
        Ps = [p_ for p_ in Ps if p_ <= P]
        if len(Ps) > 1:
            need = _needed_pad(Ginv, h)
            idx = jnp.sum(jnp.stack(
                [(need > p_) for p_ in Ps[:-1]]).astype(jnp.int32))
            branches = [
                (lambda im, P_=p_: _antialiased_resample(im, Ginv, P_, k1))
                for p_ in Ps
            ]
            return jax.lax.switch(idx, branches, images)

    return _antialiased_resample(images, Ginv, P, k1)


def apply_color(images, C):
    """out[..., i] = sum_j C[i, j] * (r, g, b, 1)[j] — written as explicit
    per-channel FMAs rather than an einsum: in a standalone jit on TPU,
    XLA lowers the j=4 einsum contraction onto the MXU (padded 4 -> 128,
    operands demoted to bf16, ~4e-3 abs error vs fp32). The FMA form is
    fp32-exact in every lowering context and fuses into one VPU
    elementwise pass; inside the fused train chunk the two forms measure
    the same speed (docs/ROADMAP.md item 14)."""
    c0, c1, c2 = (C[:, :, 0][:, :, None, None], C[:, :, 1][:, :, None, None],
                  C[:, :, 2][:, :, None, None])
    c3 = C[:, :, 3][:, :, None, None]
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    cols = [c0[:, i] * r + c1[:, i] * g + c2[:, i] * b + c3[:, i]
            for i in range(3)]
    return jnp.stack(cols, -1)


def augment(images, key, p, antialias=True, pad_frac=0.75,
            static_apply=None, pad_buckets=None):
    """Full ADA pipeline: geometric then color, each internally gated by p
    (reference augment, non_leaking.py:431-435).

    At p == 0 the whole pipeline is skipped: every gate is closed, so the
    reference computes an identity transform the expensive way (pad +
    sym6 up/down resample + warp, which the orthonormal filter
    reconstructs exactly — module docstring). Skipping returns the input
    itself: numerically equal (the warp machinery is the dominant cost of
    a p=0 step — ~360 ms of the 733 ms StyleGAN2-256 fused step, profile
    in docs/VALIDATION.md) and adaptive-ADA runs spend their whole warmup
    there. When p > 0 the pipeline is the exact pre-existing one
    (bit-identical outputs, unchanged key stream).

    static_apply resolves the skip at TRACE time: True always runs the
    pipeline, False always skips — for callers that know p's zero-ness on
    the host per compiled program (the StyleGAN2 trainer selects a chunk
    variant by `ada_aug_p > 0`, which both avoids dead branch code and
    works around a platform fault where the fused 256px chunk crashed the
    TPU worker when a runtime cond first took the augment branch).
    None (default) keeps the runtime lax.cond on p > 0.

    pad_buckets (tuple of pad fractions, e.g. (0.25, 0.5)) turns on the
    extent-bucketed static pad: apply_affine switches per call to the
    smallest bucket covering this batch's transforms (pad_frac stays the
    largest bucket / the tail-clamping boundary)."""
    p = jnp.asarray(p, jnp.float32)

    def run(images):
        kg, kc = jax.random.split(key)
        n, h, w, _ = images.shape
        G = sample_affine_matrices(kg, n, p, h, w)
        out = apply_affine(images, G, antialias=antialias, pad_frac=pad_frac,
                           pad_buckets=pad_buckets)
        if images.shape[-1] == 3:
            C = sample_color_matrices(kc, n, p)
            out = apply_color(out, C)
        # resampling promotes to fp32; return the caller's dtype so both
        # paths (and lax.cond branches) agree for bf16 inputs too
        return out.astype(images.dtype)

    if static_apply is False:
        return images
    if static_apply is True:
        return run(images)
    return jax.lax.cond(p > 0, run, lambda x: x, images)


class AdaptiveAugment:
    """Drive p toward the r_t target (reference non_leaking.py:10-43)."""

    def __init__(self, ada_aug_target=0.6, ada_aug_len=500_000, update_every=256):
        self.ada_aug_target = ada_aug_target
        self.ada_aug_len = ada_aug_len
        self.update_every = update_every
        self.ada_aug_buf = [0.0, 0.0]  # (sign sum, count)
        self.r_t_stat = 0.0
        self.ada_aug_p = 0.0

    def tune(self, real_pred_sign_sum, count):
        """Feed the (sum of sign(D(real)), count) pair — already psum'd
        across the mesh when data-parallel — once per D step. p updates
        whenever the accumulated IMAGE count reaches update_every (the
        reference's count-based trigger, non_leaking.py:28), not every
        update_every calls."""
        self.ada_aug_buf[0] += float(real_pred_sign_sum)
        self.ada_aug_buf[1] += float(count)
        if self.ada_aug_buf[1] > self.update_every - 1:
            sign_sum, n = self.ada_aug_buf
            self.r_t_stat = sign_sum / max(n, 1)
            sign = 1 if self.r_t_stat > self.ada_aug_target else -1
            self.ada_aug_p += sign * n / self.ada_aug_len
            self.ada_aug_p = min(1.0, max(0.0, self.ada_aug_p))
            self.ada_aug_buf = [0.0, 0.0]
        return self.ada_aug_p
