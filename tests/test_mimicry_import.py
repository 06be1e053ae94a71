"""Forward-parity tests for the torch-mimicry SNGAN checkpoint importer.

torch-mimicry itself is not installed (external pip dep of the reference,
not vendored there either), so the oracle is a torch reimplementation of
its architecture semantics built here from the public source layout
(utils/mimicry_import.py module docstring): same module names (l1,
block2.., b5/c5, l5, l_y), same forward order, and mimicry's eval-path
spectral norm sigma = u . (W_mat v), v = l2norm(W_mat^T u). Parity of our
Flax zoo against THAT oracle proves the importer's tensor conversions
(conv layout, bottom-dense CHW->HWC permutation, BN stats, SN sigma) are
self-consistent end to end.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax

jax.config.update("jax_platforms", "cpu")

from diagan_tpu.utils.torch_import import convert_state_dict

NZ, NGF, NDF = 16, 32, 24


def _l2n(x, eps=1e-12):
    return x / (x.norm() + eps)


def _converged_u(weight, out):
    """Real mimicry checkpoints have run one power iteration per training
    forward, so u has converged; flax's SpectralNorm recomputes sigma from
    the stored u each forward (stored sigma is only a statistic — see
    utils/torch_import.py docstring), and the two sigma formulas agree
    exactly at the converged fixed point. Converge u here to model that."""
    w = weight.detach().view(out, -1)
    u = _l2n(torch.randn(out))
    for _ in range(500):
        v = _l2n(torch.mv(w.t(), u))
        u = _l2n(torch.mv(w, v))
    return u


class SNConv2d(tnn.Conv2d):
    """mimicry-style eval-path spectral norm: raw `weight` + buffer
    `weight_u`, divide by sigma recomputed from (W, u) every forward."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.register_buffer("weight_u",
                             _converged_u(self.weight, self.out_channels))

    def forward(self, x):
        w = self.weight.view(self.out_channels, -1)
        v = _l2n(torch.mv(w.t(), self.weight_u))
        sigma = torch.dot(self.weight_u, torch.mv(w, v))
        return F.conv2d(x, self.weight / sigma, self.bias, self.stride,
                        self.padding)


class SNLinear(tnn.Linear):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.register_buffer("weight_u",
                             _converged_u(self.weight, self.out_features))

    def forward(self, x):
        w = self.weight
        v = _l2n(torch.mv(w.t(), self.weight_u))
        sigma = torch.dot(self.weight_u, torch.mv(w, v))
        return F.linear(x, w / sigma, self.bias)


class GBlock(tnn.Module):
    def __init__(self, cin, cout, upsample):
        super().__init__()
        self.upsample = upsample
        self.learnable_sc = cin != cout or upsample
        self.b1 = tnn.BatchNorm2d(cin)
        self.c1 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.b2 = tnn.BatchNorm2d(cout)
        self.c2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        if self.learnable_sc:
            self.c_sc = tnn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        h = F.relu(self.b1(x))
        if self.upsample:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
        h = self.c1(h)
        h = self.c2(F.relu(self.b2(h)))
        sc = x
        if self.upsample:
            sc = F.interpolate(sc, scale_factor=2, mode="nearest")
        if self.learnable_sc:
            sc = self.c_sc(sc)
        return h + sc


class DBlockOptimized(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = SNConv2d(cin, cout, 3, 1, 1)
        self.c2 = SNConv2d(cout, cout, 3, 1, 1)
        self.c_sc = SNConv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        h = F.avg_pool2d(self.c2(F.relu(self.c1(x))), 2)
        return h + self.c_sc(F.avg_pool2d(x, 2))


class DBlock(tnn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        self.downsample = downsample
        self.learnable_sc = cin != cout or downsample
        self.c1 = SNConv2d(cin, cout, 3, 1, 1)
        self.c2 = SNConv2d(cout, cout, 3, 1, 1)
        if self.learnable_sc:
            self.c_sc = SNConv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        h = self.c2(F.relu(self.c1(F.relu(x))))
        if self.downsample:
            h = F.avg_pool2d(h, 2)
        sc = x
        if self.learnable_sc:
            sc = self.c_sc(sc)
            if self.downsample:
                sc = F.avg_pool2d(sc, 2)
        return h + sc


class MimicryG32(tnn.Module):
    def __init__(self):
        super().__init__()
        self.l1 = tnn.Linear(NZ, 4 * 4 * NGF)
        self.block2 = GBlock(NGF, NGF, True)
        self.block3 = GBlock(NGF, NGF, True)
        self.block4 = GBlock(NGF, NGF, True)
        self.b5 = tnn.BatchNorm2d(NGF)
        self.c5 = tnn.Conv2d(NGF, 3, 3, 1, 1)

    def forward(self, z):
        h = self.l1(z).view(z.shape[0], -1, 4, 4)
        h = self.block4(self.block3(self.block2(h)))
        return torch.tanh(self.c5(F.relu(self.b5(h))))


class MimicryD32(tnn.Module):
    def __init__(self, with_ss=False):
        super().__init__()
        self.block1 = DBlockOptimized(3, NDF)
        self.block2 = DBlock(NDF, NDF, True)
        self.block3 = DBlock(NDF, NDF, False)
        self.block4 = DBlock(NDF, NDF, False)
        self.l5 = SNLinear(NDF, 1)
        if with_ss:
            self.l_y = SNLinear(NDF, 4)

    def forward(self, x):
        h = self.block4(self.block3(self.block2(self.block1(x))))
        feat = torch.sum(F.relu(h), dim=(2, 3))
        out = self.l5(feat)
        if hasattr(self, "l_y"):
            return out, self.l_y(feat)
        return out


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.3)
                mod.running_var.copy_(
                    torch.rand_like(mod.running_var) * 0.5 + 0.5)
                mod.weight.copy_(torch.randn_like(mod.weight) * 0.2 + 1.0)
                mod.bias.copy_(torch.randn_like(mod.bias) * 0.1)


def test_generator_forward_parity():
    from diagan_tpu.models.sngan import SNGANGenerator32

    torch.manual_seed(0)
    tg = MimicryG32().eval()
    _randomize_bn(tg)
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}
    params, colls = convert_state_dict(sd)

    z = np.random.default_rng(0).normal(size=(4, NZ)).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)

    g = SNGANGenerator32(nz=NZ, ngf=NGF)
    import jax.numpy as jnp
    got = g.apply({"params": params, **colls}, jnp.asarray(z), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("with_ss", [False, True])
def test_discriminator_forward_parity(with_ss):
    from diagan_tpu.models.sngan import SNGANDiscriminator32
    from diagan_tpu.models.ssgan import SSGANDiscriminator32

    torch.manual_seed(1)
    td = MimicryD32(with_ss=with_ss).eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    params, colls = convert_state_dict(sd)

    x = np.random.default_rng(1).normal(size=(4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = td(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    import jax.numpy as jnp
    if with_ss:
        d = SSGANDiscriminator32(ndf=NDF)
        logits, aux = d.apply({"params": params, **colls}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(logits),
                                   want[0].numpy().squeeze(-1),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(aux["ss_logits"]),
                                   want[1].numpy(), rtol=2e-4, atol=2e-5)
    else:
        d = SNGANDiscriminator32(ndf=NDF)
        logits, _ = d.apply({"params": params, **colls}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(logits),
                                   want.numpy().squeeze(-1),
                                   rtol=2e-4, atol=2e-5)


NRKHS = 20


class MimicryInfoMaxD32(MimicryD32):
    def __init__(self):
        super().__init__()
        self.local_nn = SNConv2d(NDF, NRKHS, 1, 1, 0)
        self.global_nn = tnn.Sequential(
            SNLinear(NDF, NRKHS), tnn.ReLU(), SNLinear(NRKHS, NRKHS))

    def forward(self, x):
        h = self.block4(self.block3(self.block2(self.block1(x))))
        local = F.relu(h)
        feat = torch.sum(local, dim=(2, 3))
        lp = self.local_nn(local)                     # (N, nrkhs, H, W)
        lp = lp.flatten(2).transpose(1, 2)            # (N, H*W, nrkhs)
        gp = self.global_nn(feat)
        lp = lp / (lp.norm(dim=-1, keepdim=True) + 1e-8)
        gp = gp / (gp.norm(dim=-1, keepdim=True) + 1e-8)
        return self.l5(feat), lp, gp


def test_infomax_discriminator_forward_parity():
    from diagan_tpu.models.infomax import InfoMaxGANDiscriminator32

    torch.manual_seed(3)
    td = MimicryInfoMaxD32().eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    params, colls = convert_state_dict(sd)

    x = np.random.default_rng(2).normal(size=(3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want_l, want_lp, want_gp = td(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    import jax.numpy as jnp
    d = InfoMaxGANDiscriminator32(ndf=NDF, nrkhs=NRKHS)
    logits, aux = d.apply({"params": params, **colls}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits),
                               want_l.numpy().squeeze(-1),
                               rtol=2e-4, atol=2e-5)
    # torch flattens (H, W) row-major from NCHW; ours reshapes NHWC — both
    # are (y, x) row-major over positions, so the token order matches
    np.testing.assert_allclose(np.asarray(aux["local_proj"]),
                               want_lp.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux["global_proj"]),
                               want_gp.numpy(), rtol=2e-4, atol=2e-5)


def test_unmapped_keys_raise():
    from diagan_tpu.utils.mimicry_import import import_mimicry_discriminator

    torch.manual_seed(2)
    td = MimicryD32().eval()
    sd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    sd["unexpected_head.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        import_mimicry_discriminator(sd)
