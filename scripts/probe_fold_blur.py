"""Probe: pin the blur-fold composition used by models/stylegan2.py.

StyleGAN2's resample convs are a conv (or conv-transpose) composed with a
static separable 4-tap FIR blur (reference model.py ModulatedConv2d /
ConvLayer: upfirdn2d around every stride-2 conv). On TPU the blur is
VPU/bandwidth work (~71 ms/step of the 256px fused step, round-4
profile) while the convs run on the MXU at ~70% of peak — so folding the
blur INTO the conv kernel (conv of convs: w' = w *full* k) moves the blur
to the MXU where its marginal cost is ~10 ms of extra flops.

This probe verifies, on CPU with an ASYMMETRIC test kernel (to catch
flip-orientation errors the symmetric production kernel would mask):

  up:   blur_{pad0,pad1}(conv_transpose_s2^VALID(x, w)) ==
            conv_transpose_s2^VALID(x, fold(w, k))[:, 2:-2, 2:-2, :]
  down: conv_s2^VALID(blur_{2,2}(x), w) ==
            conv_s2^VALID(pad(x, 2), fold(w, k))

where fold(w, k) is the full 2-D CORRELATION of w's spatial taps with k,
per (cin, cout) pair (upfirdn2d flips its kernel internally, so the
correlation orientation composes; pinned here empirically with the
asymmetric taps — the flipped variant fails at rel err ~0.7).

Run: /opt/venv/bin/python scripts/probe_fold_blur.py
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_platforms", "cpu")

from diagan_tpu.ops import upfirdn2d


def fold_kernel(w, k2):
    """Full 2-D correlation of each (cin, cout) spatial slice of w
    (kh, kw, cin, cout) with the FIR tap matrix k2 (fh, fw)."""
    kh, kw, cin, cout = w.shape
    fh, fw = k2.shape
    wt = w.transpose(2, 3, 0, 1).reshape(cin * cout, 1, kh, kw)
    kr = jnp.asarray(k2).reshape(1, 1, fh, fw)
    out = lax.conv_general_dilated(
        wt, kr, (1, 1), [(fh - 1, fh - 1), (fw - 1, fw - 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(cin, cout, kh + fh - 1, kw + fw - 1).transpose(
        2, 3, 0, 1)


def main():
    rng = np.random.default_rng(0)
    cin, cout, H, k = 5, 7, 8, 3
    x = jnp.asarray(rng.normal(size=(2, H, H, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, cin, cout)), jnp.float32)
    # asymmetric taps so a flipped fold cannot pass by accident
    k1 = np.asarray([1.0, 3.0, 2.0, 0.5])
    k2 = jnp.asarray(np.outer(k1, k1), jnp.float32)

    dn = ("NHWC", "HWIO", "NHWC")

    # --- upsample path (ModulatedConv.upsample) ---
    y = lax.conv_transpose(x, w, (2, 2), "VALID", dimension_numbers=dn)
    p = (len(k1) - 2) - (k - 1)
    pad0 = (p + 1) // 2 + 1
    pad1 = p // 2 + 1
    ref_up = upfirdn2d(y, k2 * 4, pad=(pad0, pad1))

    w6 = fold_kernel(w, k2 * 4)
    y6 = lax.conv_transpose(x, w6, (2, 2), "VALID", dimension_numbers=dn)
    got_up = y6[:, 2:-2, 2:-2, :]
    err_up = float(jnp.max(jnp.abs(ref_up - got_up)) /
                   jnp.max(jnp.abs(ref_up)))
    print(f"up:   ref {ref_up.shape} got {got_up.shape} rel err {err_up:.2e}")

    # --- downsample path (ModulatedConv.downsample / ConvLayer) ---
    p = (len(k1) - 2) + (k - 1)
    b = upfirdn2d(x, k2, pad=((p + 1) // 2, p // 2))
    ref_dn = lax.conv_general_dilated(b, w, (2, 2), "VALID",
                                      dimension_numbers=dn)
    xp = jnp.pad(x, ((0, 0), ((p + 1) // 2, p // 2),
                     ((p + 1) // 2, p // 2), (0, 0)))
    got_dn = lax.conv_general_dilated(xp, fold_kernel(w, k2), (2, 2),
                                      "VALID", dimension_numbers=dn)
    err_dn = float(jnp.max(jnp.abs(ref_dn - got_dn)) /
                   jnp.max(jnp.abs(ref_dn)))
    print(f"down: ref {ref_dn.shape} got {got_dn.shape} rel err {err_dn:.2e}")

    # --- 1x1 downsample skip (ConvLayer kernel_size=1) ---
    kk = 1
    w1 = jnp.asarray(rng.normal(size=(kk, kk, cin, cout)), jnp.float32)
    p = (len(k1) - 2) + (kk - 1)
    b = upfirdn2d(x, k2, pad=((p + 1) // 2, p // 2))
    ref_sk = lax.conv_general_dilated(b, w1, (2, 2), "VALID",
                                      dimension_numbers=dn)
    xp = jnp.pad(x, ((0, 0), ((p + 1) // 2, p // 2),
                     ((p + 1) // 2, p // 2), (0, 0)))
    got_sk = lax.conv_general_dilated(xp, fold_kernel(w1, k2), (2, 2),
                                      "VALID", dimension_numbers=dn)
    err_sk = float(jnp.max(jnp.abs(ref_sk - got_sk)) /
                   jnp.max(jnp.abs(ref_sk)))
    print(f"skip: ref {ref_sk.shape} got {got_sk.shape} rel err {err_sk:.2e}")

    ok = max(err_up, err_dn, err_sk) < 1e-5
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
