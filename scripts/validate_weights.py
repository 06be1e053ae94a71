"""Weights-readiness gate: the one command to run when real pretrained
weights files land in this (zero-egress) container.

The FID/IS/KID/LPIPS machinery is fully built and oracle-tested against
randomized state dicts (tests/test_inception_parity.py,
tests/test_lpips_parity.py); the only missing link to numbers comparable
with the reference (which used the TF-FID InceptionV3 via pytorch-fid
weights, reference diagan-pkg/diagan/trainer/fid_score.py:247 and
diagan-pkg/diagan/models/inception.py:13) is the weights files
themselves. Given the file paths, this script runs:

  inception:  converter -> torch-oracle forward parity -> smoke FID
              (identical sets ~0, disjoint sets finite & positive)
  lpips:      VGG converter -> distance sanity (d(x,x)=0 < d(x,y))

and prints PASS/FAIL per stage. All stages green means: export
DIAGAN_TPU_INCEPTION_WEIGHTS=<path> and every eval_gan*.py metric is
comparable to published numbers with no further code changes.

Usage:
  python scripts/validate_weights.py --inception pt_inception-2015-12-05-6726825d.pth
  python scripts/validate_weights.py --lpips_vgg vgg.pth --lpips_lin lin.pth
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

RESULTS = []


def check(name, fn):
    try:
        detail = fn()
        RESULTS.append((name, True, detail or ""))
        print(f"PASS  {name}" + (f"  ({detail})" if detail else ""))
    except Exception as e:
        RESULTS.append((name, False, f"{type(e).__name__}: {e}"))
        print(f"FAIL  {name}  {type(e).__name__}: {e}")


def validate_inception(path):
    import jax
    import jax.numpy as jnp

    from diagan_tpu.eval.inception import (
        InceptionFeaturizer, InceptionV3, load_torch_weights,
    )

    model = InceptionV3()
    state = {}

    def _convert():
        state["vars"] = load_torch_weights(model, path)
        n = sum(x.size for x in jax.tree.leaves(state["vars"]))
        return f"{n/1e6:.1f}M values mapped"

    check("inception: torch state_dict -> flax converter", _convert)
    if "vars" not in state:
        return

    def _torch_parity():
        import torch

        sys.path.insert(0, str(ROOT / "tests"))
        from test_inception_parity import TorchFIDInception

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v for k, v in sd.items() if "AuxLogits" not in k}
        oracle = TorchFIDInception().eval()
        missing, unexpected = oracle.load_state_dict(sd, strict=False)
        if missing:
            raise ValueError(f"oracle missing keys: {missing[:4]}...")
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (4, 299, 299, 3)).astype(np.float32)
        with torch.no_grad():
            t_pool, t_logits = oracle(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))
        f_pool, f_logits = model.apply(state["vars"], jnp.asarray(x))
        rel = float(np.max(np.abs(np.asarray(f_pool) - t_pool.numpy()))
                    / (np.abs(t_pool.numpy()).max() + 1e-12))
        if rel > 1e-3:
            raise ValueError(f"pool3 rel err {rel:.2e} > 1e-3")
        lrel = float(np.max(np.abs(np.asarray(f_logits) - t_logits.numpy()))
                     / (np.abs(t_logits.numpy()).max() + 1e-12))
        if lrel > 1e-3:
            raise ValueError(f"logits rel err {lrel:.2e} > 1e-3")
        return f"pool3 rel err {rel:.2e}, logits rel err {lrel:.2e}"

    check("inception: forward parity vs torch oracle", _torch_parity)

    def _smoke_fid():
        from diagan_tpu.eval.metrics import (
            activation_statistics, frechet_distance,
        )

        feat = InceptionFeaturizer(weights_path=path, batch_size=32)
        rng = np.random.default_rng(1)
        a = rng.integers(0, 255, (64, 32, 32, 3), dtype=np.uint8)
        b = rng.integers(0, 255, (64, 32, 32, 3), dtype=np.uint8)
        fa, fb = np.asarray(feat.features(a)), np.asarray(feat.features(b))
        if not (np.isfinite(fa).all() and np.isfinite(fb).all()):
            raise ValueError("non-finite inception features")
        d_self = frechet_distance(*activation_statistics(fa),
                                  *activation_statistics(fa))
        d_ab = frechet_distance(*activation_statistics(fa),
                                *activation_statistics(fb))
        if not (abs(d_self) < 1e-3 and np.isfinite(d_ab) and d_ab > 0):
            raise ValueError(f"fid(a,a)={d_self:.2e}, fid(a,b)={d_ab:.4g}")
        return f"fid(a,a)={d_self:.1e}, fid(a,b)={d_ab:.4g}"

    check("inception: smoke FID through the featurizer", _smoke_fid)


def validate_lpips(vgg_path, lin_path):
    def _run():
        from diagan_tpu.eval.lpips import LPIPS

        lp = LPIPS(weights_path=vgg_path, lin_path=lin_path)
        rng = np.random.default_rng(2)
        x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        d_same = float(np.mean(np.asarray(lp.forward(x, x))))
        d_diff = float(np.mean(np.asarray(lp.forward(x, y))))
        if not (d_same < 1e-6 and d_diff > d_same and np.isfinite(d_diff)):
            raise ValueError(f"d(x,x)={d_same:.2e}, d(x,y)={d_diff:.4f}")
        return f"d(x,x)={d_same:.1e} < d(x,y)={d_diff:.4f}"

    check("lpips: converter + distance sanity", _run)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inception", type=str,
                   help="pt_inception-2015-12-05 .pth path")
    p.add_argument("--lpips_vgg", type=str, help="LPIPS VGG16 weights .pth")
    p.add_argument("--lpips_lin", type=str,
                   help="LPIPS linear-head weights .pth")
    args = p.parse_args()
    if not (args.inception or args.lpips_vgg):
        p.error("pass --inception and/or --lpips_vgg [--lpips_lin]")

    if args.inception:
        validate_inception(args.inception)
    if args.lpips_vgg:
        validate_lpips(args.lpips_vgg, args.lpips_lin)

    ok = all(r[1] for r in RESULTS)
    print()
    if ok and args.inception:
        print("ALL PASS — export "
              f"DIAGAN_TPU_INCEPTION_WEIGHTS={args.inception} and rerun "
              "eval_gan*.py: every FID/IS/KID becomes comparable to the "
              "reference's published protocol.")
    elif ok:
        print("ALL PASS")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
