"""Cross-framework parity for the Flax LPIPS (reference stylegan2/lpips/).

The reference vendors the official LPIPS package (VGG16 feature stack,
unit-normalized channel differences, per-layer linear calibration); its
pretrained weights are not downloadable here (zero egress), so — as with
the Inception parity test — a plain-torch oracle with RANDOMIZED weights
exported in the torchvision/lpips state_dict layouts proves the converter
and the distance formula are framework-neutral up to the weights files.
"""
import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from diagan_tpu.eval.lpips import _TAPS, _VGG_CFG, LPIPS


def _torch_vgg_features():
    """torchvision-layout VGG16 `features` Sequential (conv/relu/maxpool)."""
    layers, cin = [], 3
    for v in _VGG_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(cin, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            cin = v
    return tnn.Sequential(*layers)


def _randomize(seq, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in seq:
            if isinstance(m, tnn.Conv2d):
                fan_in = m.weight.shape[1] * 9
                m.weight.copy_(torch.randn(m.weight.shape, generator=g)
                               / np.sqrt(fan_in))
                m.bias.copy_(0.05 * torch.randn(m.bias.shape, generator=g))
    return seq


def _torch_lpips(seq, lins, x, y):
    """Oracle distance: taps after relu1_2/2_2/3_3/4_3/5_3, unit-normalize
    over channels, squared diff, linear head, spatial mean."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(t):
        t = (t - shift) / scale
        out, conv_i = [], 0
        for m in seq:
            t = m(t)
            if isinstance(m, tnn.ReLU):
                if conv_i in _TAPS:
                    out.append(t)
                conv_i += 1
        return out

    total = 0.0
    with torch.no_grad():
        for i, (a, b) in enumerate(zip(feats(x), feats(y))):
            a = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            b = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (a - b) ** 2
            d = d * torch.from_numpy(lins[i]).view(1, -1, 1, 1)
            total = total + d.sum(1).mean(dim=(1, 2))
    return total.numpy()


@pytest.mark.slow
def test_lpips_forward_parity(tmp_path):
    seq = _randomize(_torch_vgg_features()).eval()
    vgg_path = tmp_path / "vgg16_random.pth"
    torch.save({f"features.{i}.{p}": getattr(m, p).detach()
                for i, m in enumerate(seq) if isinstance(m, tnn.Conv2d)
                for p in ("weight", "bias")}, str(vgg_path))

    rng = np.random.default_rng(0)
    tap_channels = []
    conv_i = 0
    for v in _VGG_CFG:
        if v == "M":
            continue
        if conv_i in _TAPS:
            tap_channels.append(v)
        conv_i += 1
    lins = [rng.uniform(0, 1, c).astype(np.float32) for c in tap_channels]
    lin_path = tmp_path / "lins.pth"
    torch.save({f"lin{i}.model.1.weight": torch.from_numpy(l)
                for i, l in enumerate(lins)}, str(lin_path))

    model = LPIPS(weights_path=str(vgg_path), lin_path=str(lin_path))
    assert model.weights_kind == "loaded"
    assert [l.shape[0] for l in model.lins] == tap_channels

    x = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.forward(x, y))
    want = _torch_lpips(
        seq, lins,
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(y).permute(0, 3, 1, 2),
    )
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert rel < 1e-3, (got, want)
    # sanity: identical inputs -> zero
    np.testing.assert_allclose(np.asarray(model.forward(x, x)), 0, atol=1e-5)
