"""Torch .pth checkpoint import: forward parity against live torch models.

Builds torch replicas of the reference MNIST DCGAN nets (architecture from
reference diagan-pkg/diagan/models/mnist.py:47-223 — same Sequential
indices, so the state_dict keys match reference checkpoints exactly),
checkpoints them with torch.save in the torch-mimicry wrapper layout, then
restores through our `restore_net` torch-sniffing path and asserts the
Flax eval-mode forward reproduces the torch eval-mode forward.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _torch_generator(nz=100, nc=3):
    # Reference mnist.py:56-73: fc + tconv Sequential (ConvTranspose2d at
    # 0/3/6/9, BatchNorm2d at 1/4/7, activations between, bias-free convs).
    class G(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc = tnn.Linear(nz, 384)
            self.tconv = tnn.Sequential(
                tnn.ConvTranspose2d(384, 192, 4, 1, 0, bias=False),
                tnn.BatchNorm2d(192),
                tnn.ReLU(True),
                tnn.ConvTranspose2d(192, 96, 4, 2, 1, bias=False),
                tnn.BatchNorm2d(96),
                tnn.ReLU(True),
                tnn.ConvTranspose2d(96, 48, 4, 2, 1, bias=False),
                tnn.BatchNorm2d(48),
                tnn.ReLU(True),
                tnn.ConvTranspose2d(48, nc, 4, 2, 1, bias=False),
                tnn.Tanh(),
            )

        def forward(self, z):
            h = self.fc(z)
            return self.tconv(h.view(-1, 384, 1, 1))

    return G()


def _torch_discriminator(nc=3, use_sn=False):
    # Reference mnist.py:161-192: Conv2d at Sequential 0/3/7/11/15/19
    # (3x3, strides 2/1/2/1/2/1, bias-free, spectral norm when use_sn),
    # BatchNorm2d at 4/8/12/16/20, Linear head over the 4*4*512 flatten.
    norm = tnn.utils.spectral_norm if use_sn else (lambda m: m)

    class D(tnn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            for j, (ci, co, s) in enumerate(
                [(nc, 16, 2), (16, 32, 1), (32, 64, 2),
                 (64, 128, 1), (128, 256, 2), (256, 512, 1)]
            ):
                layers.append(norm(tnn.Conv2d(ci, co, 3, s, 1, bias=False)))
                if j > 0:
                    layers.append(tnn.BatchNorm2d(co))
                layers.append(tnn.LeakyReLU(0.2, inplace=True))
                layers.append(tnn.Dropout(0.5))
            self.conv = tnn.Sequential(*layers)
            self.out_d = tnn.Linear(4 * 4 * 512, 1)

        def forward(self, x):
            h = self.conv(x).view(-1, 4 * 4 * 512)
            return self.out_d(h)

    return D()


def _save_mimicry_ckpt(tmp_path, net, name, step):
    from diagan_tpu.train.checkpoint import ckpt_path

    path = ckpt_path(tmp_path, name, step)
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(
        {"model_state_dict": net.state_dict(), "global_step": step}, path
    )
    return path


def _eval_template(module, example, rngs=None):
    from diagan_tpu.train.state import create_net_state
    from diagan_tpu.train.trainer import _make_tx

    rngs = rngs or {"params": jax.random.key(0)}
    tx = _make_tx(2e-4, (0.0, 0.9), None, None)
    return create_net_state(module, rngs, example, tx, train=True)


def test_generator_import_forward_parity(tmp_path):
    from diagan_tpu.models.mnist_dcgan import MNISTDCGANGenerator
    from diagan_tpu.train.checkpoint import restore_net

    tg = _torch_generator()
    # Populate BN running stats away from init so the test exercises them.
    tg.train()
    with torch.no_grad():
        for _ in range(3):
            tg(torch.randn(8, 100))
    tg.eval()
    path = _save_mimicry_ckpt(tmp_path, tg, "netG", 1234)

    template = _eval_template(MNISTDCGANGenerator(), (jnp.zeros((2, 100)),))
    state = restore_net(template, path)
    assert int(state.step) == 1234

    z = np.random.RandomState(0).randn(4, 100).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)
    out = MNISTDCGANGenerator().apply(
        {"params": state.params, **state.state}, jnp.asarray(z), train=False
    )
    assert out.shape == ref.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("use_sn", [False, True])
def test_discriminator_import_forward_parity(tmp_path, use_sn):
    from diagan_tpu.models.mnist_dcgan import MNISTDCGANDiscriminator
    from diagan_tpu.train.checkpoint import restore_net

    td = _torch_discriminator(use_sn=use_sn)
    td.train()
    with torch.no_grad():
        # Each train forward runs one spectral-norm power iteration; flax's
        # SpectralNorm re-derives sigma from the stored u with one fresh
        # iteration at apply time, so parity is exact only once u/v have
        # converged — as they have in any real reference checkpoint (one
        # iteration per training step). 300 forwards converges them here.
        for _ in range(300 if use_sn else 3):
            td(torch.randn(4, 3, 32, 32))
    td.eval()
    path = _save_mimicry_ckpt(tmp_path, td, "netD", 777)

    module = MNISTDCGANDiscriminator(use_sn=use_sn)
    template = _eval_template(
        module,
        (jnp.zeros((2, 32, 32, 3)),),
        rngs={"params": jax.random.key(0), "dropout": jax.random.key(1)},
    )
    state = restore_net(template, path)
    assert int(state.step) == 777

    x = np.random.RandomState(1).randn(4, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = td(torch.from_numpy(x)).numpy().squeeze(-1)
    logits, _ = module.apply(
        {"params": state.params, **state.state},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=1e-3)


def _fab(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32) * 0.1


def _fabricate_sg2_g_sd(size=16, style_dim=512):
    """A torch-layout Generator state_dict (key names and shapes from
    reference stylegan2/model.py:354-438) with random values."""
    import math

    sd = {}
    s = 0
    for i in range(1, 9):
        sd[f"style.{i}.weight"] = _fab((style_dim, style_dim), s := s + 1)
        sd[f"style.{i}.bias"] = _fab((style_dim,), s := s + 1)
    sd["input.input"] = _fab((1, 512, 4, 4), s := s + 1)

    def styled(prefix, o, i, k):
        sd[f"{prefix}.conv.weight"] = _fab((1, o, i, k, k), len(sd))
        sd[f"{prefix}.conv.modulation.weight"] = _fab((i, style_dim), len(sd))
        sd[f"{prefix}.conv.modulation.bias"] = 1.0 + _fab((i,), len(sd))
        if k == 3:  # StyledConv (ToRGB has no noise/activate)
            sd[f"{prefix}.noise.weight"] = _fab((1,), len(sd))
            sd[f"{prefix}.activate.bias"] = _fab((o,), len(sd))

    styled("conv1", 512, 512, 3)
    styled("to_rgb1", 3, 512, 1)
    sd["to_rgb1.bias"] = _fab((1, 3, 1, 1), len(sd))
    log_size = int(math.log2(size))
    for j in range(log_size - 2):
        styled(f"convs.{2 * j}", 512, 512, 3)
        styled(f"convs.{2 * j + 1}", 512, 512, 3)
        styled(f"to_rgbs.{j}", 3, 512, 1)
        sd[f"to_rgbs.{j}.bias"] = _fab((1, 3, 1, 1), len(sd))
    for i in range(2 * (log_size - 2) + 1):
        res = 2 ** ((i + 5) // 2)
        sd[f"noises.noise_{i}"] = _fab((1, 1, res, res), len(sd))
    return sd


def _fabricate_sg2_d_sd(size=16):
    """Torch-layout Discriminator state_dict (reference
    stylegan2/model.py:602-640)."""
    import math

    sd = {
        "convs.0.0.weight": _fab((512, 3, 1, 1), 0),
        "convs.0.1.bias": _fab((512,), 1),
    }
    log_size = int(math.log2(size))
    for b in range(1, log_size - 1):
        p = f"convs.{b}"
        sd[f"{p}.conv1.0.weight"] = _fab((512, 512, 3, 3), len(sd))
        sd[f"{p}.conv1.1.bias"] = _fab((512,), len(sd))
        sd[f"{p}.conv2.0.kernel"] = np.ones((4, 4), np.float32) / 16
        sd[f"{p}.conv2.1.weight"] = _fab((512, 512, 3, 3), len(sd))
        sd[f"{p}.conv2.2.bias"] = _fab((512,), len(sd))
        sd[f"{p}.skip.0.kernel"] = np.ones((4, 4), np.float32) / 16
        sd[f"{p}.skip.1.weight"] = _fab((512, 512, 1, 1), len(sd))
    sd["final_conv.0.weight"] = _fab((512, 513, 3, 3), len(sd))
    sd["final_conv.1.bias"] = _fab((512,), len(sd))
    sd["final_linear.0.weight"] = _fab((512, 512 * 16), len(sd))
    sd["final_linear.0.bias"] = _fab((512,), len(sd))
    sd["final_linear.1.weight"] = _fab((1, 512), len(sd))
    sd["final_linear.1.bias"] = _fab((1,), len(sd))
    return sd


def test_stylegan2_generator_import_structure():
    """Converted G tree matches our template exactly (from_state_dict
    raises on any missing/mistyped leaf) and the forward runs."""
    from flax import serialization

    from diagan_tpu.models.stylegan2 import StyleGAN2Generator
    from diagan_tpu.utils.torch_import import (
        import_stylegan2_generator,
        import_stylegan2_noises,
    )

    sd = _fabricate_sg2_g_sd()
    gen = StyleGAN2Generator(size=16)
    template = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((2, 512)),
        train=False,
    )
    params = serialization.from_state_dict(
        template["params"], import_stylegan2_generator(sd, size=16)
    )
    noises = import_stylegan2_noises(sd)
    assert len(noises) == 5 and noises[-1].shape == (1, 16, 16, 1)
    out = gen.apply(
        {"params": params}, jnp.ones((2, 512)), train=False,
        rngs={"noise": jax.random.key(2)},
    )
    assert out.shape == (2, 16, 16, 3) and np.isfinite(np.asarray(out)).all()


def test_stylegan2_modulated_upsample_conv_torch_parity():
    """The upsample ModulatedConv kernel conversion (permute + spatial
    flip) reproduces torch F.conv_transpose2d exactly.  Expected value
    follows reference stylegan2/model.py:216-266: per-sample modulated
    demodulated weights through conv_transpose2d, then the (1,3,3,1) blur
    (via our separately-tested upfirdn2d)."""
    import torch.nn.functional as F

    from diagan_tpu.models.stylegan2 import ModulatedConv
    from diagan_tpu.ops import make_resample_kernel, upfirdn2d
    from diagan_tpu.utils.torch_import import _modulated_conv

    rng = np.random.RandomState(7)
    N, I, O, K, S, H = 2, 8, 6, 3, 4, 5
    w_t = rng.randn(1, O, I, K, K).astype(np.float32)
    mod_w = rng.randn(I, S).astype(np.float32)
    mod_b = 1.0 + 0.1 * rng.randn(I).astype(np.float32)
    x = rng.randn(N, H, H, I).astype(np.float32)
    style = rng.randn(N, S).astype(np.float32)

    # torch-side expected
    s_mod = style @ (mod_w * (1.0 / np.sqrt(S))).T + mod_b  # EqualLinear
    scale = 1.0 / np.sqrt(I * K * K)
    outs = []
    for n in range(N):
        w_n = scale * w_t[0] * s_mod[n][None, :, None, None]  # (O,I,K,K)
        demod = 1.0 / np.sqrt((w_n**2).sum(axis=(1, 2, 3)) + 1e-8)
        w_n = (w_n * demod[:, None, None, None]).astype(np.float32)
        xt = torch.from_numpy(x[n : n + 1].transpose(0, 3, 1, 2))
        y = F.conv_transpose2d(
            xt, torch.from_numpy(w_n).transpose(0, 1), stride=2, padding=0
        )
        outs.append(y.numpy().transpose(0, 2, 3, 1))
    expected = np.concatenate(outs, axis=0)
    blur_k = make_resample_kernel([1, 3, 3, 1]) * 4
    expected = np.asarray(upfirdn2d(jnp.asarray(expected), blur_k, pad=(1, 1)))

    sd = {
        "m.weight": w_t,
        "m.modulation.weight": mod_w,
        "m.modulation.bias": mod_b,
    }
    params = _modulated_conv(sd, "m", upsample=True)
    got = ModulatedConv(features=O, kernel_size=K, upsample=True).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(style)
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5, rtol=1e-4)


def _torch_sg2_discriminator(size=16):
    """Torch replica of the reference StyleGAN2 Discriminator
    (stylegan2/model.py:94-131,536-656) for import-parity checking.  The
    symmetric (1,3,3,1) FIR blur is a depthwise conv (flip-invariant)."""
    import math

    import torch.nn.functional as F

    blur1d = np.array([1.0, 3.0, 3.0, 1.0])
    blur2d = np.outer(blur1d, blur1d)
    blur2d = (blur2d / blur2d.sum()).astype(np.float32)

    def blur(x, pad):
        c = x.shape[1]
        k = torch.from_numpy(blur2d)[None, None].repeat(c, 1, 1, 1)
        x = F.pad(x, (pad[0], pad[1], pad[0], pad[1]))
        return F.conv2d(x, k, groups=c)

    def flr(x, bias):
        return math.sqrt(2.0) * F.leaky_relu(
            x + bias.view(1, -1, 1, 1), 0.2
        )

    class D(tnn.Module):
        def __init__(self):
            super().__init__()
            log_size = int(math.log2(size))
            self.n_blocks = log_size - 2
            self.p = {}
            ps = _fabricate_sg2_d_sd(size)
            for k, v in ps.items():
                self.p[k] = torch.from_numpy(v)

        def equal_conv(self, x, w, stride=0, padding=0):
            scale = 1.0 / math.sqrt(w.shape[1] * w.shape[2] * w.shape[3])
            return F.conv2d(x, w * scale, stride=stride or 1, padding=padding)

        def forward(self, x):
            p = self.p
            h = flr(self.equal_conv(x, p["convs.0.0.weight"]),
                    p["convs.0.1.bias"])
            for b in range(1, self.n_blocks + 1):
                pre = f"convs.{b}"
                out = flr(
                    self.equal_conv(h, p[f"{pre}.conv1.0.weight"], padding=1),
                    p[f"{pre}.conv1.1.bias"],
                )
                out = blur(out, (2, 2))
                out = flr(
                    self.equal_conv(out, p[f"{pre}.conv2.1.weight"], stride=2),
                    p[f"{pre}.conv2.2.bias"],
                )
                skip = blur(h, (1, 1))  # k=1: p=(4-2)+0 -> pads (1,1)
                skip = self.equal_conv(skip, p[f"{pre}.skip.1.weight"],
                                       stride=2)
                h = (out + skip) / math.sqrt(2.0)
            n, c, hh, ww = h.shape
            g = min(4, n)
            y = h.view(g, -1, 1, c, hh, ww)
            std = torch.sqrt(y.var(0, unbiased=False) + 1e-8)
            std = std.mean([2, 3, 4], keepdims=True).squeeze(2)
            std = std.repeat(g, 1, hh, ww)
            h = torch.cat([h, std], 1)
            h = flr(self.equal_conv(h, p["final_conv.0.weight"], padding=1),
                    p["final_conv.1.bias"])
            h = h.view(n, -1)
            w0 = p["final_linear.0.weight"]
            h = h @ (w0 * (1.0 / math.sqrt(w0.shape[1]))).T
            h = math.sqrt(2.0) * F.leaky_relu(
                h + p["final_linear.0.bias"], 0.2
            )
            w1 = p["final_linear.1.weight"]
            return h @ (w1 * (1.0 / math.sqrt(w1.shape[1]))).T \
                + p["final_linear.1.bias"]

    return D()


def test_stylegan2_discriminator_import_forward_parity():
    from flax import serialization

    from diagan_tpu.models.stylegan2 import StyleGAN2Discriminator
    from diagan_tpu.utils.torch_import import import_stylegan2_discriminator

    td = _torch_sg2_discriminator(size=16)
    sd = {k: v.numpy() for k, v in td.p.items()}

    module = StyleGAN2Discriminator(size=16)
    template = module.init(
        {"params": jax.random.key(0)}, jnp.zeros((4, 16, 16, 3)), train=False
    )
    params = serialization.from_state_dict(
        template["params"], import_stylegan2_discriminator(sd, size=16)
    )

    x = np.random.RandomState(3).randn(4, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = td(torch.from_numpy(x)).numpy().squeeze(-1)
    logits, _ = module.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)


def test_stylegan2_trainer_loads_reference_pt(tmp_path):
    """The trainer's load_ckpt sniffs a reference torch {iter:06d}.pt and
    converts g/d/g_ema, taking the step from the filename."""
    from diagan_tpu.models.stylegan2 import (
        StyleGAN2Discriminator,
        StyleGAN2Generator,
    )
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    g_sd = _fabricate_sg2_g_sd()
    d_sd = _fabricate_sg2_d_sd()
    path = tmp_path / "012000.pt"
    torch.save(
        {
            "g": {k: torch.from_numpy(np.array(v)) for k, v in g_sd.items()},
            "d": {k: torch.from_numpy(np.array(v)) for k, v in d_sd.items()},
            "g_ema": {k: torch.from_numpy(np.array(v)) for k, v in g_sd.items()},
            "ada_aug_p": 0.25,
        },
        path,
    )

    imgs = np.random.default_rng(0).integers(0, 255, (8, 16, 16, 3), np.uint8)
    tr = StyleGAN2Trainer(
        tmp_path, StyleGAN2Generator(size=16), StyleGAN2Discriminator(size=16),
        imgs, num_steps=1, batch_size=2, log_every=1, save_every=10000,
    )
    step = tr.load_ckpt(path)
    assert step == 12000
    assert tr.ada_aug_p == pytest.approx(0.25)
    got = np.asarray(tr.g_state.params["mapping"]["EqualDense_0"]["kernel"])
    np.testing.assert_allclose(got, g_sd["style.1.weight"].T, atol=1e-6)
    ema = np.asarray(tr.g_ema["synthesis"]["conv1"]["bias"])
    np.testing.assert_allclose(ema, g_sd["conv1.activate.bias"], atol=1e-6)


def test_unknown_state_dict_raises(tmp_path):
    from diagan_tpu.utils.torch_import import convert_state_dict

    with pytest.raises(ValueError, match="unrecognized torch state_dict"):
        convert_state_dict({"mystery.weight": np.zeros((2, 2))})
