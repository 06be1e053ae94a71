"""torch-mimicry SNGAN checkpoint import -> our Flax SNGAN zoo.

The reference trains its SNGAN/SSGAN/InfoMax models through the
torch-mimicry pip package (reference diagan-pkg/diagan/models/
predefined_models.py:17-54); its checkpoints therefore carry mimicry's
state_dict key layout, which is NOT vendored in the reference repo. This
module reconstructs that layout from torch-mimicry's public source
(v0.1.16, torch_mimicry/nets/sngan/sngan_{32,64}.py +
modules/resblocks.py + modules/spectral_norm.py):

  Generator:      l1 (Linear z -> 4*4*ngf), block2..blockK (GBlock with
                  b1/c1/b2/c2 [+ c_sc]), b{K+1} (BN), c{K+1} (Conv to 3ch)
  Discriminator:  block1 (DBlockOptimized: c1/c2/c_sc), block2..blockK
                  (DBlock: c1/c2 [+ c_sc]), l{K+1} (SNLinear head)

mimicry's SpectralNorm stores the RAW `weight` plus a power-iteration
buffer `weight_u` and divides by sigma = u . (W_mat v), v = l2norm(W_mat^T
u) on every forward — so the import keeps the raw kernel and recomputes
that exact sigma into our 'spectral' collection (layers.SNConv stores
kernel raw and divides by the stored sigma at eval, same policy as the
DCGAN import — see utils/torch_import.py module docstring). For safety the
weight key also accepts the torch.nn.utils naming (`weight_orig` +
`weight_u`/`weight_v`) in case a checkpoint was saved through the stock
wrapper.

Block-to-module mapping (shapes checked by serialization.from_state_dict
at restore): torch block{k} -> GBlock_{k-2}/DBlock_{k-2}, b1->BatchNorm_0,
c1->Conv_0/SNConv_0, b2->BatchNorm_1, c2->Conv_1/SNConv_1, c_sc->
Conv_2/SNConv_2, l1->Dense_0, final b/c -> top-level BatchNorm_0/Conv_0,
head l{K+1} -> SNDense_0.

The SSGAN rotation head (`l_y` in ssgan_32.py) maps to our SSGANRotHead's
SNDense_0; InfoMax's local/global RKHS projectors (infomax_gan_base.py:
`local_nn` = SNConv2d 1x1, `global_nn` = Sequential(SNLinear, ReLU,
SNLinear) at indices 0/2) map to _InfoMaxHeads_0's SNConv_0/SNDense_0/
SNDense_1 (torch-oracle parity: tests/test_mimicry_import.py
test_infomax_discriminator_forward_parity). The importer raises listing
any unconsumed keys rather than silently dropping them.
"""
from __future__ import annotations

import re

import numpy as np

from diagan_tpu.utils.torch_import import conv_kernel, dense_kernel


def _l2n(x, eps=1e-12):
    return x / (np.linalg.norm(x) + eps)


def _sn(sd, prefix, consumed):
    """Fetch (kernel_raw_torch, u, bias) for one spectral-normed layer,
    tolerating both mimicry's (`weight` + `weight_u`) and stock torch
    (`weight_orig` + `weight_u` [+ `weight_v`]) namings."""
    for wk in (".weight_orig", ".weight_bar", ".weight"):
        if prefix + wk in sd:
            w = sd[prefix + wk]
            consumed.add(prefix + wk)
            break
    else:
        raise KeyError(f"no weight for spectral layer {prefix!r}")
    u = None
    for uk in (".weight_u", ".u"):
        if prefix + uk in sd:
            u = np.asarray(sd[prefix + uk], np.float32).reshape(-1)
            consumed.add(prefix + uk)
            break
    for vk in (".weight_v", ".v"):
        if prefix + vk in sd:
            consumed.add(prefix + vk)  # superseded by the recomputed v
    b = sd.get(prefix + ".bias")
    if b is not None:
        consumed.add(prefix + ".bias")
    return w, u, b


def _sigma_from(w, u):
    """mimicry's eval-path sigma: v = l2norm(W_mat^T u), sigma = u.(W_mat v).
    With no stored u (fresh net), power-iterate from a fixed vector until
    convergence — sigma is then the true top singular value."""
    w_mat = np.asarray(w, np.float32).reshape(w.shape[0], -1)
    if u is None:
        u = _l2n(np.ones(w_mat.shape[0], np.float32))
        for _ in range(100):
            v = _l2n(w_mat.T @ u)
            u = _l2n(w_mat @ v)
    v = _l2n(w_mat.T @ u)
    return np.float32(float(u @ (w_mat @ v))), u


def _sn_conv(sd, prefix, consumed):
    """One torch SN conv -> (params_subtree, spectral_subtree)."""
    w, u, b = _sn(sd, prefix, consumed)
    sigma, u = _sigma_from(w, u)
    p = {"Conv_0": {"kernel": conv_kernel(w)}}
    if b is not None:
        p["Conv_0"]["bias"] = b
    s = {"SpectralNorm_0": {
        "Conv_0/kernel/sigma": sigma,
        "Conv_0/kernel/u": np.ascontiguousarray(u[None, :]),
    }}
    return p, s


def _sn_dense(sd, prefix, consumed):
    w, u, b = _sn(sd, prefix, consumed)
    sigma, u = _sigma_from(w, u)
    p = {"Dense_0": {"kernel": dense_kernel(w)}}
    if b is not None:
        p["Dense_0"]["bias"] = b
    s = {"SpectralNorm_0": {
        "Dense_0/kernel/sigma": sigma,
        "Dense_0/kernel/u": np.ascontiguousarray(u[None, :]),
    }}
    return p, s


def _bn(sd, prefix, consumed):
    consumed.update({prefix + k for k in
                     (".weight", ".bias", ".running_mean", ".running_var")})
    consumed.add(prefix + ".num_batches_tracked")
    return ({"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
            {"mean": sd[prefix + ".running_mean"],
             "var": sd[prefix + ".running_var"]})


def _block_numbers(sd):
    ns = sorted({int(m.group(1)) for k in sd
                 for m in [re.match(r"block(\d+)\.", k)] if m})
    return ns


def _check_consumed(sd, consumed, what):
    left = sorted(k for k in sd if k not in consumed
                  and not k.endswith("num_batches_tracked"))
    if left:
        raise ValueError(
            f"torch-mimicry {what} import left unmapped keys (unsupported "
            f"head or layout drift): {left[:8]}{'...' if len(left) > 8 else ''}")


def _bottom_dense(w, b, ngf):
    """mimicry reshapes l1's output as (N, ngf, b, b) channels-first; our
    generator reshapes (N, b, b, ngf) — permute the output rows from
    (c, y, x) to (y, x, c) order before the torch->flax transpose."""
    o, nz = w.shape
    bw = int(round((o // ngf) ** 0.5))
    wp = w.reshape(ngf, bw, bw, nz).transpose(1, 2, 0, 3).reshape(o, nz)
    bp = b.reshape(ngf, bw, bw).transpose(1, 2, 0).reshape(-1)
    return np.ascontiguousarray(wp.T), np.ascontiguousarray(bp)


def import_mimicry_generator(sd):
    """torch-mimicry SNGANGenerator{32,64} state_dict -> (params, colls)."""
    consumed = set()
    params, stats = {}, {}
    ngf = sd["block2.c1.weight"].shape[1]  # first block's in-channels
    wk, bk = _bottom_dense(sd["l1.weight"], sd["l1.bias"], ngf)
    params["Dense_0"] = {"kernel": wk, "bias": bk}
    consumed.update({"l1.weight", "l1.bias"})
    blocks = _block_numbers(sd)
    for i, k in enumerate(blocks):
        t = f"block{k}"
        blk, blk_stats = {}, {}
        blk["BatchNorm_0"], blk_stats["BatchNorm_0"] = _bn(sd, f"{t}.b1", consumed)
        blk["BatchNorm_1"], blk_stats["BatchNorm_1"] = _bn(sd, f"{t}.b2", consumed)
        for torch_c, ours in ((f"{t}.c1", "Conv_0"), (f"{t}.c2", "Conv_1")):
            blk[ours] = {"kernel": conv_kernel(sd[torch_c + ".weight"]),
                         "bias": sd[torch_c + ".bias"]}
            consumed.update({torch_c + ".weight", torch_c + ".bias"})
        if f"{t}.c_sc.weight" in sd:
            blk["Conv_2"] = {"kernel": conv_kernel(sd[f"{t}.c_sc.weight"]),
                             "bias": sd[f"{t}.c_sc.bias"]}
            consumed.update({f"{t}.c_sc.weight", f"{t}.c_sc.bias"})
        params[f"GBlock_{i}"] = blk
        stats[f"GBlock_{i}"] = blk_stats
    top = max(blocks) + 1
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, f"b{top}", consumed)
    params["Conv_0"] = {"kernel": conv_kernel(sd[f"c{top}.weight"]),
                        "bias": sd[f"c{top}.bias"]}
    consumed.update({f"c{top}.weight", f"c{top}.bias"})
    _check_consumed(sd, consumed, "generator")
    return params, {"batch_stats": stats}


def import_mimicry_discriminator(sd):
    """torch-mimicry SNGAN/SSGAN Discriminator{32,64} -> (params, colls).

    block1 is DBlockOptimized, later blocks are DBlock. When the SSGAN
    rotation head `l_y` (ssgan_32.py) is present, the backbone nests under
    the SNGANDiscriminator{32,64}_0 submodule and the head under _SSHead_0
    to match models/ssgan.py's wrapper tree."""
    consumed = set()
    params, spectral = {}, {}
    blocks = _block_numbers(sd)
    for i, k in enumerate(blocks):
        t = f"block{k}"
        ours = "DBlockOptimized_0" if i == 0 else f"DBlock_{i - 1}"
        blk_p, blk_s = {}, {}
        pairs = [(f"{t}.c1", "SNConv_0"), (f"{t}.c2", "SNConv_1")]
        if any(key.startswith(f"{t}.c_sc.") for key in sd):
            pairs.append((f"{t}.c_sc", "SNConv_2"))
        for torch_c, name in pairs:
            blk_p[name], blk_s[name] = _sn_conv(sd, torch_c, consumed)
        params[ours] = blk_p
        spectral[ours] = blk_s
    head = f"l{max(blocks) + 1}"
    params["SNDense_0"], spectral["SNDense_0"] = _sn_dense(sd, head, consumed)
    backbone = f"SNGANDiscriminator{32 if len(blocks) == 4 else 64}_0"
    if "l_y.weight" in sd or "l_y.weight_orig" in sd:
        # SSGAN rotation head (ssgan_32.py)
        rot_p, rot_s = _sn_dense(sd, "l_y", consumed)
        params = {backbone: params, "_SSHead_0": {"SNDense_0": rot_p}}
        spectral = {backbone: spectral, "_SSHead_0": {"SNDense_0": rot_s}}
    elif any(k.startswith("local_nn.") for k in sd):
        # InfoMaxGAN RKHS projectors (infomax_gan_base.py): local_nn =
        # SNConv2d 1x1, global_nn = Sequential(SNLinear, ReLU, SNLinear)
        lp, ls = _sn_conv(sd, "local_nn", consumed)
        g0p, g0s = _sn_dense(sd, "global_nn.0", consumed)
        g1p, g1s = _sn_dense(sd, "global_nn.2", consumed)
        heads_p = {"SNConv_0": lp, "SNDense_0": g0p, "SNDense_1": g1p}
        heads_s = {"SNConv_0": ls, "SNDense_0": g0s, "SNDense_1": g1s}
        params = {backbone: params, "_InfoMaxHeads_0": heads_p}
        spectral = {backbone: spectral, "_InfoMaxHeads_0": heads_s}
    _check_consumed(sd, consumed, "discriminator")
    return params, {"spectral": spectral}


def matches_mimicry_generator(sd):
    return "l1.weight" in sd and "block2.b1.weight" in sd


def matches_mimicry_discriminator(sd):
    return (any(k.startswith("block1.c1.weight") for k in sd)
            and any(re.match(r"l\d+\.weight", k) for k in sd))
