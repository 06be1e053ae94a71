"""StyleGAN2 generator/discriminator in Flax, NHWC, on the TPU-native ops.

Capability parity with the reference's rosinality-port StyleGAN2
(reference diagan-pkg/diagan/models/stylegan2.py and stylegan2/model.py):
8-layer mapping MLP with lr_mul=0.01 equalized linears; modulated
3x3 convs with demodulation, noise injection, and fused LeakyReLU(sqrt 2);
skip-connection ToRGB path with upfirdn2d blur upsampling; discriminator
with blur-downsampled residual blocks, minibatch-stddev, and a 2-layer
head. Style mixing and truncation supported at sampling time.

TPU-native choices:
  - `upfirdn2d` is the pad+strided-slice XLA core (diagan_tpu.ops) rather
    than a CUDA kernel; `fused_leaky_relu` the XLA/Pallas elementwise op.
  - the per-sample modulated conv is expressed as input-scaling conv +
    output demodulation scaling (the standard grouped-conv-free
    formulation) so XLA sees one ordinary convolution per layer: for
    stylegan2's per-sample weights w'_{n,...} = w * s_n (and demod d_n),
    conv(x_n, w * s_n) == conv(x_n * s_n, w), so we scale activations
    instead of materializing per-sample weight tensors. Equivalent math,
    MXU-friendly.
"""
from __future__ import annotations

import math
import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from diagan_tpu.ops import fused_leaky_relu, make_resample_kernel, upfirdn2d


def _equal_lr_init(lr_mul=1.0):
    return nn.initializers.normal(stddev=1.0 / lr_mul)


def _fold_blur_enabled():
    """Blur-fold switch (default ON; DIAGAN_TPU_FOLD_BLUR=0 restores the
    separate-upfirdn formulation for A/B and debugging).

    The resample convs here are a conv (or conv-transpose) composed with a
    static separable 4-tap FIR blur (reference stylegan2/model.py wraps
    every stride-2 conv in upfirdn2d). Correlations compose, so the blur
    folds into the conv kernel: corr(corr(x, k), w) == corr(x, fold(w, k))
    with fold = full 2-D correlation of the spatial taps (orientation and
    crop offsets pinned by scripts/probe_fold_blur.py with asymmetric
    taps, rel err ~2e-7). On TPU this moves the blur from VPU/bandwidth
    work (~71 ms of the 256px fused step's FIR kernels, round-4 profile)
    onto the MXU, where the 3x3 -> 6x6 kernel growth costs ~10 ms of
    extra flops — the convs run at ~70% of bf16 peak while the standalone
    FIR passes run at ~1/8 of HBM speed-of-light.

    Backend-aware default: the fold is an MXU trade (more matmul flops
    for zero bandwidth passes) and is actively WRONG on XLA-CPU, whose
    conv path runs the grown 6x6 stride-2/transposed kernels ~2x slower
    end-to-end (measured on the 8-device-mesh dryrun: 630 s/step folded
    vs 322 s unfolded for the 16px twin-D fused step) — so it defaults
    ON everywhere except the cpu backend. DIAGAN_TPU_FOLD_BLUR=0/1
    still overrides both ways (A/B and debugging).
    """
    env = os.environ.get("DIAGAN_TPU_FOLD_BLUR")
    if env is not None:
        return env != "0"
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # backend not initializable at trace-definition time
        return True


def _fold_kernel(w, k2):
    """Full 2-D correlation of each (cin, cout) spatial slice of w
    (kh, kw, cin, cout) with the FIR tap matrix k2 (fh, fw): the kernel
    of the fused (blur o conv) operator. fp32 in, fp32 out (callers cast
    to the compute dtype afterwards)."""
    kh, kw, cin, cout = w.shape
    k2 = jnp.asarray(k2, jnp.float32)
    fh, fw = k2.shape
    wt = w.transpose(2, 3, 0, 1).reshape(cin * cout, 1, kh, kw)
    out = jax.lax.conv_general_dilated(
        wt, k2.reshape(1, 1, fh, fw), (1, 1),
        [(fh - 1, fh - 1), (fw - 1, fw - 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(cin, cout, kh + fh - 1, kw + fw - 1).transpose(
        2, 3, 0, 1)


class EqualDense(nn.Module):
    """Equalized-LR dense: weight stored at N(0, 1/lr_mul), scaled by
    (1/sqrt(fan_in)) * lr_mul at use (reference model.py EqualLinear).

    `dtype` is the compute dtype (params always stored fp32; cast at use —
    the standard mixed-precision layout for TPU bf16)."""

    features: int
    lr_mul: float = 1.0
    use_bias: bool = True
    bias_init_val: float = 0.0
    activation: bool = False  # fused leaky relu on output
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        scale = (1.0 / math.sqrt(in_features)) * self.lr_mul
        kernel = self.param("kernel", _equal_lr_init(self.lr_mul),
                            (in_features, self.features))
        x = x.astype(self.dtype)
        y = x @ (kernel * scale).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.constant(self.bias_init_val),
                (self.features,),
            )
            if self.activation:
                return fused_leaky_relu(y, (bias * self.lr_mul).astype(self.dtype))
            y = y + (bias * self.lr_mul).astype(self.dtype)
        return y


class EqualConv(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: str | Sequence = "SAME"
    use_bias: bool = True
    # FIR taps to fold into the conv kernel (blur o conv fusion; the
    # caller pre-pads the input and uses padding="VALID"). Param shape is
    # unchanged — the fold happens at use, so checkpoints are identical.
    fold_fir: tuple | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k = self.kernel_size
        scale = 1.0 / math.sqrt(in_features * k * k)
        kernel = self.param("kernel", nn.initializers.normal(1.0),
                            (k, k, in_features, self.features))
        w_eff = kernel * scale
        if self.fold_fir is not None:
            # the fold grows the effective kernel (3x3 -> 6x6 dilated);
            # it is only correct when the caller pre-pads the input for
            # the blur+conv pair and strides by the resample factor —
            # "SAME" padding here would silently mis-place the taps
            assert self.padding == "VALID" and self.strides == 2, (
                "fold_fir requires pre-padded input with padding='VALID' "
                "and strides=2 (blur o down-conv fusion)"
            )
            w_eff = _fold_kernel(
                w_eff, make_resample_kernel(list(self.fold_fir)))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_eff.astype(self.dtype),
            (self.strides, self.strides), self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Blur(nn.Module):
    kernel: tuple = (1, 3, 3, 1)
    pad: tuple = (2, 1)
    upsample_factor: int = 1

    @nn.compact
    def __call__(self, x):
        k = make_resample_kernel(list(self.kernel))
        if self.upsample_factor > 1:
            k = k * (self.upsample_factor**2)
        return upfirdn2d(x, k, pad=self.pad)


class ModulatedConv(nn.Module):
    """Style-modulated 3x3 (or 1x1) conv with optional demodulation and
    up/down resampling (reference model.py ModulatedConv2d)."""

    features: int
    kernel_size: int = 3
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: tuple = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        n, h, w, c_in = x.shape
        k = self.kernel_size
        scale = 1.0 / math.sqrt(c_in * k * k)
        kernel = self.param("kernel", nn.initializers.normal(1.0),
                            (k, k, c_in, self.features))
        # style -> per-input-channel scale, init to 1 (fp32: tiny compute,
        # and the demod statistics below want full precision)
        s = EqualDense(c_in, bias_init_val=1.0, name="modulation")(style)
        s = s.astype(jnp.float32)

        w_eff = kernel * scale  # (k,k,cin,cout), shared, fp32
        if self.demodulate:
            # d_n = 1/sqrt(sum_{k,cin} (w*s_n)^2), accumulated in fp32
            w2 = jnp.sum(w_eff**2, axis=(0, 1))  # (cin, cout)
            sigma = jnp.einsum("nc,cf->nf", s**2, w2)  # (n, cout)
            demod = jax.lax.rsqrt(sigma + 1e-8).astype(self.dtype)
        # conv(x * s_n, w) == conv(x, w * s_n)
        xs = x.astype(self.dtype) * s[:, None, None, :].astype(self.dtype)
        w_eff = w_eff.astype(self.dtype)

        # fold only maps whose OUTPUT stays <= 512px: at 1024px the
        # folded 6x6 transposed-conv layout pads past HBM (16.05G needed,
        # round-5 probe) while the unfolded form fits and runs 620 ms —
        # mixed folding keeps the <=512 wins and the big maps unfolded
        fold = _fold_blur_enabled() and (2 * h <= 512)
        if self.upsample:
            if fold and k == 3 and len(self.blur_kernel) == 4:
                # blur o conv_transpose fused on the MXU: 6x6 folded
                # kernel, VALID output 2H+4, crop 2 each side == the
                # reference's pad0/pad1 trim (scripts/probe_fold_blur.py)
                kb = make_resample_kernel(list(self.blur_kernel)) * 4
                w6 = _fold_kernel(kernel * scale, kb).astype(self.dtype)
                y = jax.lax.conv_transpose(
                    xs, w6, strides=(2, 2), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )[:, 2:-2, 2:-2, :]
            else:
                # transposed conv x2 (VALID: out = 2*in + k - 2) then
                # blur; pad derivation parity with reference model.py
                # ModulatedConv2d
                y = jax.lax.conv_transpose(
                    xs, w_eff, strides=(2, 2), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                p = (len(self.blur_kernel) - 2) - (k - 1)
                pad0 = (p + 1) // 2 + 1  # + factor - 1
                pad1 = p // 2 + 1
                y = Blur(self.blur_kernel, pad=(pad0, pad1),
                         upsample_factor=2, name="blur")(y)
        elif self.downsample:
            p = (len(self.blur_kernel) - 2) + (k - 1)
            if fold:
                kb = make_resample_kernel(list(self.blur_kernel))
                wf = _fold_kernel(kernel * scale, kb).astype(self.dtype)
                xp = jnp.pad(xs, ((0, 0), ((p + 1) // 2, p // 2),
                                  ((p + 1) // 2, p // 2), (0, 0)))
                y = jax.lax.conv_general_dilated(
                    xp, wf, (2, 2), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            else:
                xs = Blur(self.blur_kernel, pad=((p + 1) // 2, p // 2),
                          name="blur")(xs)
                y = jax.lax.conv_general_dilated(
                    xs, w_eff, (2, 2), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        else:
            y = jax.lax.conv_general_dilated(
                xs, w_eff, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.demodulate:
            y = y * demod[:, None, None, :]
        return y


class NoiseInjection(nn.Module):
    @nn.compact
    def __call__(self, x, noise=None):
        weight = self.param("weight", nn.initializers.zeros, ())
        if noise is None:
            noise = jax.random.normal(
                self.make_rng("noise"), x.shape[:3] + (1,), dtype=x.dtype
            )
        return x + weight.astype(x.dtype) * noise.astype(x.dtype)


class StyledConv(nn.Module):
    features: int
    kernel_size: int = 3
    upsample: bool = False
    blur_kernel: tuple = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, noise=None):
        y = ModulatedConv(
            self.features, self.kernel_size, upsample=self.upsample,
            blur_kernel=self.blur_kernel, dtype=self.dtype, name="conv",
        )(x, style)
        y = NoiseInjection(name="noise")(y, noise)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(y, bias.astype(y.dtype))


class ToRGB(nn.Module):
    upsample: bool = True
    blur_kernel: tuple = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, skip=None):
        y = ModulatedConv(3, 1, demodulate=False, dtype=self.dtype,
                          name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (3,))
        y = y + bias.astype(y.dtype)
        if skip is not None:
            k = make_resample_kernel(list(self.blur_kernel)) * 4
            skip = upfirdn2d(skip, k, up=2, pad=(2, 1))
            y = y + skip
        return y


class MappingNetwork(nn.Module):
    style_dim: int = 512
    n_layers: int = 8
    lr_mul: float = 0.01

    @nn.compact
    def __call__(self, z):
        # PixelNorm
        h = z * jax.lax.rsqrt(jnp.mean(z**2, axis=-1, keepdims=True) + 1e-8)
        for _ in range(self.n_layers):
            h = EqualDense(self.style_dim, lr_mul=self.lr_mul,
                           activation=True)(h)
        return h


def _channels(size, channel_multiplier=2, width_scale=1.0):
    # width_scale < 1 narrows every stage uniformly (floor 8ch) — a
    # test/dryrun knob (the 8-device XLA-CPU dryrun runs 512-wide convs
    # ~300 s/step at full width); reference configs always use 1.0
    base = {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier, 128: 128 * channel_multiplier,
        256: 64 * channel_multiplier, 512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }
    if width_scale != 1.0:
        base = {k: max(8, int(v * width_scale)) for k, v in base.items()}
    return base


class SynthesisNetwork(nn.Module):
    size: int = 256
    style_dim: int = 512
    channel_multiplier: int = 2
    width_scale: float = 1.0
    blur_kernel: tuple = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # per-layer nn.remat: O(layer) activation memory

    @nn.compact
    def __call__(self, styles_per_layer, noises=None):
        """styles_per_layer: (N, n_latent, style_dim) — one w per layer
        (already broadcast/mixed by the Generator). Runs in self.dtype
        (bf16 supported); the RGB output is returned fp32.

        remat wraps each StyledConv/ToRGB in nn.remat: the backward pass
        recomputes the layer's internals (modulated conv, upfirdn blur,
        noise, activation) instead of keeping them resident, so only the
        per-resolution boundary activations stay live. Explicit module
        names keep the param tree IDENTICAL to the plain model (lifted
        transforms rename auto-named modules, which would both re-seed
        init and break checkpoint compatibility)."""
        SC = nn.remat(StyledConv) if self.remat else StyledConv
        TR = nn.remat(ToRGB) if self.remat else ToRGB
        ch = _channels(self.size, self.channel_multiplier, self.width_scale)
        log_size = int(math.log2(self.size))
        num_layers = (log_size - 2) * 2 + 1

        const = self.param("input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        n = styles_per_layer.shape[0]
        x = jnp.tile(const.astype(self.dtype), (n, 1, 1, 1))

        li = 0
        x = SC(ch[4], blur_kernel=self.blur_kernel,
               dtype=self.dtype, name="conv1")(
            x, styles_per_layer[:, li],
            None if noises is None else noises[0],
        )
        skip = TR(upsample=False, dtype=self.dtype, name="to_rgb1")(
            x, styles_per_layer[:, li + 1])
        li += 1

        res = 8
        ni = 1
        while res <= self.size:
            x = SC(
                ch[res], upsample=True, blur_kernel=self.blur_kernel,
                dtype=self.dtype, name=f"conv_up_{res}",
            )(x, styles_per_layer[:, li],
              None if noises is None else noises[ni])
            x = SC(
                ch[res], blur_kernel=self.blur_kernel, dtype=self.dtype,
                name=f"conv_{res}",
            )(x, styles_per_layer[:, li + 1],
              None if noises is None else noises[ni + 1])
            skip = TR(dtype=self.dtype, name=f"to_rgb_{res}")(
                x, styles_per_layer[:, li + 2], skip)
            li += 2
            ni += 2
            res *= 2
        return skip.astype(jnp.float32)


class StyleGAN2Generator(nn.Module):
    """Full generator: mapping + synthesis, with style mixing + truncation.

    __call__(z, train) keeps the zoo-wide generator contract; `sample`
    exposes the full style-mixing interface used by the FFHQ trainer.
    """

    size: int = 256
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    width_scale: float = 1.0  # uniform channel narrowing (test/dryrun knob)
    dtype: jnp.dtype = jnp.float32  # synthesis compute dtype (mapping fp32)
    remat: bool = False  # rematerialize synthesis layers (see SynthesisNetwork)

    def setup(self):
        self.mapping = MappingNetwork(self.style_dim, self.n_mlp)
        self.synthesis = SynthesisNetwork(
            self.size, self.style_dim, self.channel_multiplier,
            width_scale=self.width_scale,
            dtype=self.dtype, remat=self.remat,
        )
        log_size = int(math.log2(self.size))
        self.n_latent = log_size * 2 - 2

    def __call__(self, z, train: bool = True):
        w = self.mapping(z)
        styles = jnp.repeat(w[:, None, :], self.n_latent, axis=1)
        return self.synthesis(styles)

    def sample(self, zs, mixing_cutoff=None, truncation=1.0, w_mean=None):
        """zs: list of 1 or 2 latent batches; mixing_cutoff: layer index at
        which the second style takes over (style mixing p=0.9 in training,
        reference train_ffhq.py:114-119)."""
        ws = [self.mapping(z) for z in zs]
        if truncation < 1.0 and w_mean is not None:
            ws = [w_mean + truncation * (w - w_mean) for w in ws]
        if len(ws) == 1 or mixing_cutoff is None:
            styles = jnp.repeat(ws[0][:, None, :], self.n_latent, axis=1)
        else:
            layer_idx = jnp.arange(self.n_latent)[None, :, None]
            mask = (layer_idx < mixing_cutoff).astype(ws[0].dtype)
            styles = (
                mask * ws[0][:, None, :] + (1 - mask) * ws[1][:, None, :]
            )
        return self.synthesis(styles)

    def mean_latent(self, key, n_latent=4096):
        z = jax.random.normal(key, (n_latent, self.style_dim))
        return jnp.mean(self.mapping(z), axis=0, keepdims=True)


class ConvLayer(nn.Module):
    features: int
    kernel_size: int = 3
    downsample: bool = False
    activate: bool = True
    blur_kernel: tuple = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            # mirror of ModulatedConv's size gate (input map here)
            if _fold_blur_enabled() and x.shape[1] <= 512:
                # blur o strided-conv fused on the MXU (see _fold_kernel);
                # the edge pad is the blur's pad, the conv sees VALID
                x = jnp.pad(x, ((0, 0), ((p + 1) // 2, p // 2),
                                ((p + 1) // 2, p // 2), (0, 0)))
                x = EqualConv(self.features, self.kernel_size, strides=2,
                              padding="VALID", use_bias=not self.activate,
                              fold_fir=self.blur_kernel,
                              dtype=self.dtype)(x)
            else:
                x = Blur(self.blur_kernel, pad=((p + 1) // 2, p // 2))(x)
                x = EqualConv(self.features, self.kernel_size, strides=2,
                              padding="VALID", use_bias=not self.activate,
                              dtype=self.dtype)(x)
        else:
            x = EqualConv(self.features, self.kernel_size,
                          use_bias=not self.activate, dtype=self.dtype)(x)
        if self.activate:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            x = fused_leaky_relu(x, bias.astype(x.dtype))
        return x


class DResBlock(nn.Module):
    features: int
    blur_kernel: tuple = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvLayer(x.shape[-1], 3, dtype=self.dtype)(x)
        out = ConvLayer(self.features, 3, downsample=True,
                        dtype=self.dtype)(out)
        skip = ConvLayer(self.features, 1, downsample=True, activate=False,
                         dtype=self.dtype)(x)
        return ((out + skip) / math.sqrt(2)).astype(self.dtype)


class StyleGAN2Discriminator(nn.Module):
    size: int = 256
    channel_multiplier: int = 2
    width_scale: float = 1.0  # uniform channel narrowing (test/dryrun knob)
    stddev_group: int = 4
    dtype: jnp.dtype = jnp.float32  # backbone compute dtype (head fp32)
    remat: bool = False  # per-ResBlock nn.remat (names pinned to the
    # plain model's auto names so the param tree/checkpoints are identical)

    @nn.compact
    def __call__(self, x, update_stats: bool = False, train: bool = True):
        RB = nn.remat(DResBlock) if self.remat else DResBlock
        ch = _channels(self.size, self.channel_multiplier, self.width_scale)
        log_size = int(math.log2(self.size))
        h = ConvLayer(ch[self.size], 1, dtype=self.dtype)(x)
        for i, res in enumerate([2**j for j in range(log_size, 2, -1)]):
            h = RB(ch[res // 2], dtype=self.dtype, name=f"DResBlock_{i}")(h)
        # minibatch stddev (group 4), statistics in fp32
        n, hh, ww, c = h.shape
        g = min(self.stddev_group, n)
        y = h.astype(jnp.float32).reshape(g, -1, hh, ww, c)
        std = jnp.sqrt(jnp.var(y, axis=0) + 1e-8)
        std = jnp.mean(std, axis=(1, 2, 3), keepdims=True)  # (n/g,1,1,1)
        std = jnp.tile(std, (g, hh, ww, 1)).astype(h.dtype)
        h = jnp.concatenate([h, std], axis=-1)
        h = ConvLayer(ch[4], 3, dtype=self.dtype)(h)
        h = h.reshape(n, -1).astype(jnp.float32)
        h = EqualDense(ch[4], activation=True)(h)
        logits = EqualDense(1)(h)
        return logits.squeeze(-1), {"features": h}
