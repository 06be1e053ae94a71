"""Cross-framework forward parity for the Flax InceptionV3.

The reference computes FID through the pt_inception / TF-FID InceptionV3
(reference diagan-pkg/diagan/models/inception.py:16-321, the pytorch-fid
port). The real weights file cannot be downloaded in this container (zero
egress) and torchvision is absent, so the reference module itself cannot be
imported — instead this file carries a plain-torch implementation of the
exact same FID-Inception topology (including the pytorch-fid patches:
count_include_pad=False avg pools in A/C/E1, max pool in Mixed_7c, 1008-way
logits) built from torch.nn primitives only.

With randomized weights AND randomized BatchNorm running stats exported as a
pytorch-fid-shaped state_dict, `load_torch_weights` must reproduce the torch
forward bit-for-float: that proves the whole FID pipeline is
framework-neutral up to the weights file. When a real
pt_inception-2015-12-05 file is available, point
DIAGAN_TPU_INCEPTION_WEIGHTS at it and every metric becomes comparable to
published numbers with no further code changes.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF


# ---------------------------------------------------------------------------
# Test-local torch FID-Inception (oracle). Registration order of submodules
# matches pytorch-fid's state_dict order — the contract load_torch_weights
# relies on.
# ---------------------------------------------------------------------------
class _ConvBN(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


def _avgp(x):
    # the pytorch-fid patch: TF avg pool excludes padded zeros
    return tF.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class _BlockA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = _ConvBN(cin, 64, 1)
        self.branch5x5_1 = _ConvBN(cin, 48, 1)
        self.branch5x5_2 = _ConvBN(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = _ConvBN(cin, 64, 1)
        self.branch3x3dbl_2 = _ConvBN(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = _ConvBN(96, 96, 3, padding=1)
        self.branch_pool = _ConvBN(cin, pool_features, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avgp(x)),
        ], 1)


class _BlockB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _ConvBN(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = _ConvBN(cin, 64, 1)
        self.branch3x3dbl_2 = _ConvBN(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = _ConvBN(96, 96, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            tF.max_pool2d(x, 3, stride=2),
        ], 1)


class _BlockC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = _ConvBN(cin, 192, 1)
        self.branch7x7_1 = _ConvBN(cin, c7, 1)
        self.branch7x7_2 = _ConvBN(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = _ConvBN(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _ConvBN(cin, c7, 1)
        self.branch7x7dbl_2 = _ConvBN(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _ConvBN(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _ConvBN(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _ConvBN(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = _ConvBN(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat(
            [self.branch1x1(x), b7, bd, self.branch_pool(_avgp(x))], 1
        )


class _BlockD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = _ConvBN(cin, 192, 1)
        self.branch3x3_2 = _ConvBN(192, 320, 3, stride=2)
        self.branch7x7x3_1 = _ConvBN(cin, 192, 1)
        self.branch7x7x3_2 = _ConvBN(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _ConvBN(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _ConvBN(192, 192, 3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            b7,
            tF.max_pool2d(x, 3, stride=2),
        ], 1)


class _BlockE(tnn.Module):
    def __init__(self, cin, pool="avg"):
        super().__init__()
        self.branch1x1 = _ConvBN(cin, 320, 1)
        self.branch3x3_1 = _ConvBN(cin, 384, 1)
        self.branch3x3_2a = _ConvBN(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = _ConvBN(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _ConvBN(cin, 448, 1)
        self.branch3x3dbl_2 = _ConvBN(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = _ConvBN(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _ConvBN(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = _ConvBN(cin, 192, 1)
        self._pool = pool

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        # Mixed_7c quirk: the FID graph max-pools here (reference
        # inception.py:314-318); Mixed_7b avg-pools like everything else
        bp = (tF.max_pool2d(x, 3, stride=1, padding=1) if self._pool == "max"
              else _avgp(x))
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class TorchFIDInception(tnn.Module):
    """pytorch-fid `fid_inception_v3` topology (reference
    inception.py:180-202) in plain torch."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _ConvBN(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = _ConvBN(32, 32, 3)
        self.Conv2d_2b_3x3 = _ConvBN(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = _ConvBN(64, 80, 1)
        self.Conv2d_4a_3x3 = _ConvBN(80, 192, 3)
        self.Mixed_5b = _BlockA(192, 32)
        self.Mixed_5c = _BlockA(256, 64)
        self.Mixed_5d = _BlockA(288, 64)
        self.Mixed_6a = _BlockB(288)
        self.Mixed_6b = _BlockC(768, 128)
        self.Mixed_6c = _BlockC(768, 160)
        self.Mixed_6d = _BlockC(768, 160)
        self.Mixed_6e = _BlockC(768, 192)
        self.Mixed_7a = _BlockD(768)
        self.Mixed_7b = _BlockE(1280, pool="avg")
        self.Mixed_7c = _BlockE(2048, pool="max")
        self.fc = tnn.Linear(2048, 1008)

    def forward(self, x):
        """x: [-1,1] NCHW at 299. Returns (pool3 [N,2048], logits)."""
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = tF.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = tF.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        pool3 = x.mean(dim=(2, 3))
        return pool3, self.fc(pool3)


def _randomized(model, seed=0):
    """Randomize every parameter AND BatchNorm running stat so the converter
    is exercised on all four BN parts, with magnitudes that keep ~94 relu
    layers alive without blowing up."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                m.weight.copy_(
                    torch.randn(m.weight.shape, generator=g) / np.sqrt(fan_in)
                )
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(0.8 + 0.4 * torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.1 * torch.randn(m.running_mean.shape, generator=g)
                )
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g)
                )
            elif isinstance(m, tnn.Linear):
                m.weight.copy_(
                    torch.randn(m.weight.shape, generator=g)
                    / np.sqrt(m.weight.shape[1])
                )
                m.bias.copy_(0.01 * torch.randn(m.bias.shape, generator=g))
    return model


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    model = _randomized(TorchFIDInception()).eval()
    path = tmp_path_factory.mktemp("incw") / "fid_inception_random.pth"
    torch.save(model.state_dict(), str(path))
    return model, str(path)


@pytest.mark.slow
def test_forward_parity_full_299(oracle):
    """Raw module parity at the native 299px input: pool3 + logits."""
    from diagan_tpu.eval.inception import InceptionV3, load_torch_weights

    model, path = oracle
    variables = load_torch_weights(InceptionV3(), path)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)

    with torch.no_grad():
        t_pool, t_logits = model(torch.from_numpy(x).permute(0, 3, 1, 2))
    j_pool, j_logits = jax.jit(
        lambda v, y: InceptionV3().apply(v, y)
    )(variables, jnp.asarray(x))

    t_pool, t_logits = t_pool.numpy(), t_logits.numpy()
    j_pool, j_logits = np.asarray(j_pool), np.asarray(j_logits)
    # ~94 conv layers of float32 accumulate real drift; gate on relative
    # error against the feature scale, the quantity FID/IS actually consume
    for t, j in ((t_pool, j_pool), (t_logits, j_logits)):
        denom = np.abs(t).max()
        assert denom > 1e-3  # guard: activations did not die
        rel = np.abs(t - j).max() / denom
        assert rel < 1e-3, f"max relative deviation {rel}"


@pytest.mark.slow
def test_featurizer_end_to_end_parity(oracle):
    """Full pipeline parity including the bilinear 299 resize: the
    InceptionFeaturizer on [-1,1] 64px images vs the reference wrapper
    semantics (resize_input + normalize_input, inception.py:143-150)."""
    from diagan_tpu.eval.inception import InceptionFeaturizer

    model, path = oracle
    feat = InceptionFeaturizer(weights_path=path, batch_size=8)
    assert feat.weights_kind == "loaded"

    rng = np.random.default_rng(2)
    x01 = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        t_in = torch.from_numpy(x01).permute(0, 3, 1, 2)
        # reference wrapper: bilinear resize (align_corners=False) then 2x-1
        t_in = tF.interpolate(t_in, size=(299, 299), mode="bilinear",
                              align_corners=False)
        t_pool, _ = model(2 * t_in - 1)
    j_pool = feat.features(x01 * 2 - 1)

    t_pool = t_pool.numpy()
    rel = np.abs(t_pool - j_pool).max() / np.abs(t_pool).max()
    assert rel < 1e-3, f"max relative deviation {rel}"
