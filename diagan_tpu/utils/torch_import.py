"""Import reference torch `.pth` checkpoints into diagan-tpu NetStates.

The reference trains torch models and checkpoints them as torch pickles
(`netG_{step}_steps.pth` written by torch-mimicry's BaseModel, a dict of
{'model_state_dict', 'optimizer_state_dict', 'global_step'}).  This module
converts those payloads into our Flax parameter trees so reference-trained
checkpoints can be evaluated or resumed here directly.  `restore_net`
(train/checkpoint.py) sniffs the torch zip magic and routes through
`import_torch_net`, so a reference checkpoint dropped into a ckpt_dir
just works.

Covered architectures (the ones whose torch module definitions live in the
reference repo and are therefore key-verifiable):

  - MNIST_DCGAN_Generator      (reference diagan-pkg/diagan/models/mnist.py:47-80)
  - MNIST_DCGAN_Discriminator  (reference diagan-pkg/diagan/models/mnist.py:155-223)

The torch-mimicry SNGAN/SSGAN/InfoMax zoo is an external pip dependency of
the reference (predefined_models.py:14) whose state_dict key layout is not
vendored in the reference repo, so those importers are deliberately not
guessed at; `import_torch_net` raises with a clear message for unknown key
sets.  StyleGAN2 `{iter:06d}.pt` dicts are handled by
`load_stylegan2_torch_checkpoint` callers (see stylegan2 docs).

Layout conversions (torch -> flax):
  - Conv2d weight          (O,I,kH,kW)  -> kernel (kH,kW,I,O)
  - ConvTranspose2d weight (I,O,kH,kW)  -> kernel (kH,kW,I,O), spatially
    flipped (torch transposed conv convolves with the un-flipped kernel,
    lax.conv_transpose correlates)
  - Linear weight          (O,I)        -> kernel (I,O)
  - Linear over a CHW flatten -> kernel rows permuted to the HWC flatten
    order our NHWC models produce
  - spectral_norm: weight_orig converted as above; sigma = u . (W_mat v)
    recomputed exactly from the stored power-iteration vectors; flax's
    `u` (right-singular direction of the transposed matrix) = torch's
    `weight_u`.

Note on spectral-norm parity: flax's nn.SpectralNorm re-derives sigma from
the stored `u` with one fresh power iteration at every apply (update_stats
only gates whether u/sigma are written back), while torch's eval mode uses
the stored pair verbatim.  The two agree exactly once u/v have converged —
true of any real checkpoint, since torch iterates once per training
forward.  The imported `sigma` matters only as the stored statistic.
"""
from __future__ import annotations

import numpy as np

TORCH_ZIP_MAGIC = b"PK\x03\x04"


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path):
    """Load a torch .pth/.pt file -> (dict[str, np.ndarray], global_step).

    Accepts both a bare state_dict and torch-mimicry's checkpoint wrapper
    {'model_state_dict', 'optimizer_state_dict', 'global_step'}
    (torch-mimicry BaseModel.save_checkpoint layout, consumed at reference
    diagan-pkg/diagan/trainer/trainer.py:124-126)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    step = 0
    if isinstance(obj, dict) and "model_state_dict" in obj:
        step = int(obj.get("global_step") or 0)
        obj = obj["model_state_dict"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: _to_np(v) for k, v in obj.items()}, step


def conv_kernel(w):
    """torch Conv2d (O,I,kH,kW) -> flax (kH,kW,I,O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def tconv_kernel(w):
    """torch ConvTranspose2d (I,O,kH,kW) -> flax ConvTranspose (kH,kW,I,O).

    Spatial axes are flipped: torch's transposed conv is the gradient of a
    correlation (it convolves), lax.conv_transpose with the default
    transpose_kernel=False correlates."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def dense_kernel(w):
    """torch Linear (O,I) -> flax (I,O)."""
    return np.ascontiguousarray(np.transpose(w))


def chw_dense_kernel(w, chw):
    """torch Linear over a (C,H,W) flatten -> flax kernel over our
    (H,W,C) flatten.  `chw` is the (C,H,W) shape being flattened."""
    c, h, ww = chw
    o = w.shape[0]
    w = w.reshape(o, c, h, ww).transpose(0, 2, 3, 1).reshape(o, c * h * ww)
    return np.ascontiguousarray(w.T)


def sn_sigma(w_orig, u, v):
    """Exact spectral-norm sigma from torch's stored power-iteration pair:
    sigma = u . (W_mat v), W_mat = weight_orig.reshape(O, -1)."""
    w_mat = w_orig.reshape(w_orig.shape[0], -1)
    return np.float32(float(u @ (w_mat @ v)))


def _bn(sd, prefix, params, stats, name):
    params[name] = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats[name] = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def import_mnist_dcgan_generator(sd):
    """MNIST_DCGAN_Generator state_dict -> (params, collections).

    Key layout from reference diagan-pkg/diagan/models/mnist.py:56-73:
    fc (Linear), tconv Sequential [0]=tconv1 [1]=BN [3]=tconv2 [4]=BN
    [6]=tconv3 [7]=BN [9]=tconv4 (all ConvTranspose2d, bias=False)."""
    params, stats = {}, {}
    params["Dense_0"] = {
        "kernel": dense_kernel(sd["fc.weight"]),
        "bias": sd["fc.bias"],
    }
    for i, idx in enumerate((0, 3, 6, 9)):
        params[f"ConvTranspose_{i}"] = {
            "kernel": tconv_kernel(sd[f"tconv.{idx}.weight"])
        }
    for i, idx in enumerate((1, 4, 7)):
        _bn(sd, f"tconv.{idx}", params, stats, f"BatchNorm_{i}")
    return params, {"batch_stats": stats}


def import_mnist_dcgan_discriminator(sd):
    """MNIST_DCGAN_Discriminator state_dict -> (params, collections).

    Key layout from reference diagan-pkg/diagan/models/mnist.py:161-192:
    conv Sequential with Conv2d at [0,3,7,11,15,19] (bias=False, spectral
    norm when use_sn), BatchNorm2d at [4,8,12,16,20], head out_d (Linear
    over the 4*4*512 CHW flatten)."""
    conv_idx = (0, 3, 7, 11, 15, 19)
    use_sn = "conv.0.weight_orig" in sd
    params, stats, spectral = {}, {}, {}
    for i, idx in enumerate(conv_idx):
        if use_sn:
            w_orig = sd[f"conv.{idx}.weight_orig"]
            u = sd[f"conv.{idx}.weight_u"]
            v = sd[f"conv.{idx}.weight_v"]
            params[f"SNConv_{i}"] = {"Conv_0": {"kernel": conv_kernel(w_orig)}}
            spectral[f"SNConv_{i}"] = {
                "SpectralNorm_0": {
                    "Conv_0/kernel/sigma": sn_sigma(w_orig, u, v),
                    "Conv_0/kernel/u": np.ascontiguousarray(u[None, :]),
                }
            }
        else:
            params[f"Conv_{i}"] = {"kernel": conv_kernel(sd[f"conv.{idx}.weight"])}
    for i, idx in enumerate((4, 8, 12, 16, 20)):
        _bn(sd, f"conv.{idx}", params, stats, f"BatchNorm_{i}")
    params["Dense_0"] = {
        "kernel": chw_dense_kernel(sd["out_d.weight"], (512, 4, 4)),
        "bias": sd["out_d.bias"],
    }
    collections = {"batch_stats": stats}
    if use_sn:
        collections["spectral"] = spectral
    return params, collections


def _equal_linear(sd, prefix):
    """rosinality EqualLinear -> EqualDense (identical storage convention:
    unscaled weight, bias scaled by lr_mul at use)."""
    return {
        "kernel": dense_kernel(sd[f"{prefix}.weight"]),
        "bias": sd[f"{prefix}.bias"],
    }


def _modulated_conv(sd, prefix, upsample=False):
    """rosinality ModulatedConv2d -> our ModulatedConv.

    torch stores weight (1, O, I, k, k) (reference stylegan2/model.py:210);
    our kernel is (k, k, I, O).  Upsample layers feed the kernel to a
    transposed conv: torch F.conv_transpose2d convolves (spatially flips)
    while lax.conv_transpose correlates, so those kernels are flipped."""
    w = sd[f"{prefix}.weight"][0]  # (O, I, k, k)
    k = np.transpose(w, (2, 3, 1, 0))  # (k, k, I, O)
    if upsample:
        k = k[::-1, ::-1]
    return {
        "kernel": np.ascontiguousarray(k),
        "modulation": _equal_linear(sd, f"{prefix}.modulation"),
    }


def _styled_conv(sd, prefix, upsample=False):
    return {
        "conv": _modulated_conv(sd, f"{prefix}.conv", upsample=upsample),
        "noise": {"weight": sd[f"{prefix}.noise.weight"].reshape(())},
        "bias": sd[f"{prefix}.activate.bias"],
    }


def _to_rgb(sd, prefix):
    return {
        "conv": _modulated_conv(sd, f"{prefix}.conv"),
        "bias": sd[f"{prefix}.bias"].reshape(-1),
    }


def import_stylegan2_generator(sd, size):
    """rosinality Generator state_dict -> our StyleGAN2Generator params.

    Layer map (reference stylegan2/model.py:354-438): style.1..8 ->
    mapping/EqualDense_0..7 (style.0 is the param-free PixelNorm);
    input.input (1,C,4,4) -> synthesis/input (1,4,4,C); conv1/to_rgb1;
    convs.{2j}/convs.{2j+1}/to_rgbs.{j} -> conv_up_{res}/conv_{res}/
    to_rgb_{res} with res = 2**(j+3).  Blur/upsample FIR kernels are
    recomputed buffers here; noises.noise_* buffers are returned
    separately by import_stylegan2_noises."""
    import math

    mapping = {
        f"EqualDense_{i}": _equal_linear(sd, f"style.{i + 1}")
        for i in range(8)
    }
    synthesis = {
        "input": np.ascontiguousarray(
            np.transpose(sd["input.input"], (0, 2, 3, 1))
        ),
        "conv1": _styled_conv(sd, "conv1"),
        "to_rgb1": _to_rgb(sd, "to_rgb1"),
    }
    log_size = int(math.log2(size))
    for j in range(log_size - 2):
        res = 2 ** (j + 3)
        synthesis[f"conv_up_{res}"] = _styled_conv(
            sd, f"convs.{2 * j}", upsample=True
        )
        synthesis[f"conv_{res}"] = _styled_conv(sd, f"convs.{2 * j + 1}")
        synthesis[f"to_rgb_{res}"] = _to_rgb(sd, f"to_rgbs.{j}")
    return {"mapping": mapping, "synthesis": synthesis}


def import_stylegan2_noises(sd):
    """The generator's fixed per-layer noise buffers (noises.noise_{i}),
    NCHW -> NHWC, for callers that evaluate with frozen noise."""
    out = []
    i = 0
    while f"noises.noise_{i}" in sd:
        out.append(
            np.ascontiguousarray(
                np.transpose(sd[f"noises.noise_{i}"], (0, 2, 3, 1))
            )
        )
        i += 1
    return out


def import_stylegan2_discriminator(sd, size):
    """rosinality Discriminator state_dict -> our StyleGAN2Discriminator
    params (reference stylegan2/model.py:602-640: convs.0 is the 1x1
    ConvLayer, convs.1.. are ResBlocks, then final_conv/final_linear).

    The reference's ResBlock skip conv is bias-free
    (stylegan2/model.py:588); ours carries a bias param — zero-filled,
    which is the identical function."""
    import math

    def conv_layer(prefix, conv_i, flr_i):
        return {
            f"EqualConv_0": {"kernel": conv_kernel(sd[f"{prefix}.{conv_i}.weight"])},
            "bias": sd[f"{prefix}.{flr_i}.bias"],
        }

    params = {"ConvLayer_0": conv_layer("convs.0", 0, 1)}
    log_size = int(math.log2(size))
    n_blocks = log_size - 2
    for b in range(n_blocks):
        p = f"convs.{b + 1}"
        skip_w = conv_kernel(sd[f"{p}.skip.1.weight"])
        params[f"DResBlock_{b}"] = {
            "ConvLayer_0": conv_layer(f"{p}.conv1", 0, 1),
            "ConvLayer_1": conv_layer(f"{p}.conv2", 1, 2),  # blur at .0
            "ConvLayer_2": {
                "EqualConv_0": {
                    "kernel": skip_w,
                    "bias": np.zeros(skip_w.shape[-1], np.float32),
                }
            },
        }
    params["ConvLayer_1"] = conv_layer("final_conv", 0, 1)
    ch4 = sd["final_linear.0.weight"].shape[0]
    params["EqualDense_0"] = {
        "kernel": chw_dense_kernel(sd["final_linear.0.weight"], (ch4, 4, 4)),
        "bias": sd["final_linear.0.bias"],
    }
    params["EqualDense_1"] = _equal_linear(sd, "final_linear.1")
    return params


def import_stylegan2_checkpoint(path, size):
    """Load a reference stylegan2 `{iter:06d}.pt` (train_ffhq.py:368-379:
    {'g','d','g_ema','g_optim','d_optim'}) -> dict of our param trees.
    Optimizer states are torch Adam moments and are not converted."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for key in ("g", "g_ema"):
        if key in obj:
            sd = {k: _to_np(v) for k, v in obj[key].items()}
            out[key] = import_stylegan2_generator(sd, size)
            out.setdefault("noises", import_stylegan2_noises(sd))
    if "d" in obj:
        sd = {k: _to_np(v) for k, v in obj["d"].items()}
        out["d"] = import_stylegan2_discriminator(sd, size)
    if "drs_d" in obj:
        sd = {k: _to_np(v) for k, v in obj["drs_d"].items()}
        out["drs_d"] = import_stylegan2_discriminator(sd, size)
    if "ada_aug_p" in obj:
        out["ada_aug_p"] = float(obj["ada_aug_p"])
    return out


_IMPORTERS = (
    (("fc.weight", "tconv.0.weight"), import_mnist_dcgan_generator),
    (("out_d.weight", "conv.0.weight"), import_mnist_dcgan_discriminator),
    (("out_d.weight", "conv.0.weight_orig"), import_mnist_dcgan_discriminator),
)


def convert_state_dict(sd):
    """Dispatch a torch state_dict to the matching architecture importer."""
    for required, fn in _IMPORTERS:
        if all(k in sd for k in required):
            return fn(sd)
    from diagan_tpu.utils import mimicry_import as mi

    if mi.matches_mimicry_generator(sd):
        return mi.import_mimicry_generator(sd)
    if mi.matches_mimicry_discriminator(sd):
        return mi.import_mimicry_discriminator(sd)
    sample = ", ".join(sorted(sd)[:6])
    raise ValueError(
        "unrecognized torch state_dict (keys: %s...). Importers exist for the "
        "MNIST DCGAN nets whose torch definitions are in the reference repo "
        "and the torch-mimicry SNGAN/SSGAN zoo layout "
        "(utils/mimicry_import.py)." % sample
    )


def import_torch_net(template_state, path):
    """Load a reference torch checkpoint into a NetState built from our
    models.  params/collections/step come from the torch file; optimizer
    state stays at the template's (same policy as params-only restores —
    torch Adam moments are not meaningful to optax trees)."""
    from flax import serialization
    import jax.numpy as jnp

    sd, step = load_torch_state_dict(path)
    params, collections = convert_state_dict(sd)
    params = serialization.from_state_dict(template_state.params, params)
    state = serialization.from_state_dict(template_state.state, collections)
    return template_state.replace(
        params=params, state=state, step=jnp.asarray(step, jnp.int32)
    )


def is_torch_checkpoint_bytes(data: bytes) -> bool:
    return data[: len(TORCH_ZIP_MAGIC)] == TORCH_ZIP_MAGIC
