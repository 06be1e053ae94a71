"""End-to-end CelebA attribute tooling chain on a tiny fabricated dataset.

Drives the actual CLI scripts via subprocess (CPU backend):
  train_mimicry_phase1 (short, logit window) -> disc_score_celeba_with_attr
  -> train_convnet_celeba -> count_attr_celeba -> eval_gan_celeba_with_attr.
Reference chain: train_convnet_celeba.py / count_attr_celeba.py /
disc_score_celeba_with_attr.py / eval_gan_celeba_with_attr.py.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def _run(args, cwd, timeout=1800):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(ROOT)  # drop the axon TPU site hook
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    return out


@pytest.fixture(scope="module")
def celeba_root(tmp_path_factory):
    """Tiny celeba_64.npy cache + attr file (96 images, 40 attrs)."""
    from diagan_tpu.data.sources import CELEBA_ATTR_NAMES, synthetic_celeba_attrs

    root = tmp_path_factory.mktemp("celeba")
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (96, 64, 64, 3), dtype=np.uint8)
    np.save(root / "celeba_64.npy", images)
    attrs = synthetic_celeba_attrs(images, seed=0)
    lines = ["96", " ".join(CELEBA_ATTR_NAMES)]
    for i in range(96):
        lines.append(
            f"{i:06d}.jpg " + " ".join(str(int(a)) for a in attrs[i])
        )
    (root / "list_attr_celeba.txt").write_text("\n".join(lines) + "\n")
    return root


@pytest.mark.slow
@pytest.mark.xslow  # SNGAN-64 XLA-CPU compile alone is ~15 min on 1 CPU
def test_attr_tooling_chain(celeba_root, tmp_path):
    work = tmp_path / "exp"
    exp = "celeba_tiny"
    # phase 1: 4 steps with the logit window live (records 2 snapshots)
    _run(
        ["train_mimicry_phase1.py", "--dataset", "celeba", "--root",
         str(celeba_root), "--exp_name", exp, "--model", "sngan",
         "--loss_type", "hinge", "--num_steps", "4", "--n_dis", "1",
         "--batch_size", "8", "--save_logit_after", "2",
         "--stop_save_logit_after", "4", "--logit_save_steps", "1",
         "--no_schedule_override", "--work_dir", str(work)],
        cwd=ROOT,
    )
    exp_dir = work / exp
    assert (exp_dir / "logits_netD_eval.pkl").is_file()

    # mean resample-weight of attr vs not-attr examples
    out = _run(
        ["disc_score_celeba_with_attr.py", "--root", str(celeba_root),
         "--work_dir", str(work), "--exp_name", exp, "--p1_step", "4",
         "--resample_score", "ldr_conf_5.0_ratio_50"],
        cwd=ROOT,
    )
    assert "attr weights mean" in out.stdout

    # attribute classifier (tiny epochs)
    _run(
        ["train_convnet_celeba.py", "--root", str(celeba_root),
         "--work_dir", str(work), "--num_epochs", "1", "--batch_size", "16",
         "--attr", "Male"],
        cwd=ROOT,
    )
    assert (work / "attr_classifier" / "Male.pth").is_file()

    # attribute frequency among generated samples
    _run(
        ["count_attr_celeba.py", "--work_dir", str(work), "--exp_name", exp,
         "--model", "sngan", "--loss_type", "hinge", "--netG_ckpt_step", "4",
         "--attr", "Male", "--num_samples", "32", "--batch_size", "16"],
        cwd=ROOT,
    )
    res = json.loads((exp_dir / "count_attr_Male.json").read_text())
    assert res["total"] == 32 and 0.0 <= res["fraction"] <= 1.0

    # attribute-sliced partial recall + attr-sliced FID
    _run(
        ["eval_gan_celeba_with_attr.py", "--root", str(celeba_root),
         "--work_dir", str(work), "--exp_name", exp, "--model", "sngan",
         "--loss_type", "hinge", "--netG_ckpt_step", "4", "--attr", "Male",
         "--batch_size", "16", "--num_real_samples", "40",
         "--num_fake_samples", "32", "--metric", "all"],
        cwd=ROOT, timeout=1200,
    )
    pr = json.loads(
        (exp_dir / "evaluate" / "step-4" / "partial_recall_Male.json")
        .read_text()
    )
    assert "attr" in pr and "not_attr" in pr
    fid = json.loads(
        (exp_dir / "evaluate" / "step-4" / "fid_Male.json").read_text()
    )
    assert fid["attr"] > 0 and fid["not_attr"] > 0
    # real stats cached in the reference npz layout (compute_fid_with_attr
    # .py:50-80); the sample cap keys the cache so a smoke run can't
    # poison a full evaluation. NB: the synthetic attrs median-threshold
    # to an exact 48/48 Male split on 96 images, so num_real must sit
    # BELOW 48 for the cap tag to (correctly) engage — 48 selects every
    # subset image, which is the canonical, untagged cache.
    stats = (exp_dir / "metrics" / "fid" / "statistics"
             / "fid_stats_sngan_celeba_Male_cap40_run_1.npz")
    assert stats.is_file()
    f = np.load(stats)
    assert set(f.files) == {"attr_mu", "attr_sigma", "not_attr_mu",
                            "not_attr_sigma"}


def test_attr_fid_stats_cache_and_scores(tmp_path):
    """Unit: _attr_fid computes two FIDs from one fake stat set and caches
    real stats in the reference npz layout — stubbed featurizer, no GAN."""
    import types

    from eval_gan_celeba_with_attr import _attr_fid

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (40, 8, 8, 3), dtype=np.uint8)
    ds = types.SimpleNamespace(images=images)

    class StubFeat:
        weights_kind = "stub"

        def features(self, x):
            x = np.asarray(x, np.float64)
            n = x.shape[0]
            flat = x.reshape(n, -1)
            return np.stack([flat.mean(1), flat.std(1), flat.max(1),
                             flat.min(1)], 1)

    args = types.SimpleNamespace(model="sngan", dataset="celeba", attr="Male",
                                 seed=1, netG_ckpt_step=4)
    fake_feats = StubFeat().features(
        rng.integers(0, 255, (24, 8, 8, 3), dtype=np.uint8))
    attr_idx = np.arange(0, 20)
    not_attr_idx = np.arange(20, 40)

    out = _attr_fid(args, ds, StubFeat(), fake_feats, attr_idx, not_attr_idx,
                    tmp_path, num_real=64, use_drs=False)
    assert out["attr"] >= 0 and out["not_attr"] >= 0
    stats = (tmp_path / "metrics" / "fid" / "statistics"
             / "fid_stats_sngan_celeba_Male_run_1.npz")
    assert stats.is_file()
    saved = dict(np.load(stats))
    # second call hits the cache (corrupt the images to prove it's unused)
    ds2 = types.SimpleNamespace(images=np.zeros_like(images))
    out2 = _attr_fid(args, ds2, StubFeat(), fake_feats, attr_idx,
                     not_attr_idx, tmp_path, num_real=64, use_drs=True)
    assert out2["attr"] == pytest.approx(out["attr"])
    assert (tmp_path / "evaluate" / "step-4" / "fid_drs_Male.json").is_file()
    np.testing.assert_array_equal(
        saved["attr_mu"], np.load(stats)["attr_mu"])
