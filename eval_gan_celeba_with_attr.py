"""CelebA attribute-sliced partial recall (with/without --attr).

CLI parity with reference eval_gan_celeba_with_attr.py: computes partial
recall of generated samples against the attr-positive and attr-negative
real subsets (reference evaluate.py:921-1095, pr_score_with_attr.py).
"""
import argparse
import json
from pathlib import Path

import numpy as np

from diagan_tpu.cli.common import enable_compile_cache
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.data.sources import CELEBA_ATTR_NAMES
from diagan_tpu.eval.evaluate import (
    DRS,
    Sampler,
    load_eval_models,
    make_disc_fn,
    make_gen_fn,
)
from diagan_tpu.eval import metrics as M
from diagan_tpu.eval.inception import InceptionFeaturizer
from diagan_tpu.models import get_gan_model
from diagan_tpu.utils import set_seed


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="celeba", type=str)
    parser.add_argument("--root", "-r", default="./dataset/celeba", type=str)
    parser.add_argument("--attr", default="Bald", type=str)
    parser.add_argument("--work_dir", default="./exp_results", type=str)
    parser.add_argument("--exp_name", default="mimicry_pretrained-seed1", type=str)
    parser.add_argument("--model", default="sngan", type=str)
    parser.add_argument("--loss_type", default="hinge", type=str)
    parser.add_argument("--gpu", default="0", type=str)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--netG_ckpt_step", type=int)
    parser.add_argument("--netG_train_mode", action="store_true")
    # additive (not in the reference, which hardcodes 10k/10k):
    # shrink sample counts for smoke/validation runs
    parser.add_argument("--num_real_samples", default=10000, type=int)
    parser.add_argument("--num_fake_samples", default=10000, type=int)
    # additive: the reference ships attr-sliced FID as a library function
    # (diagan-pkg/diagan/trainer/compute_fid_with_attr.py:173) with no CLI
    # driver; here it rides the same script as partial recall
    parser.add_argument("--metric", default="partial_recall",
                        choices=["partial_recall", "fid", "all"])
    return parser


def _attr_fid(args, ds, featurizer, fake_feats, attr_idx, not_attr_idx,
              save_path, num_real, use_drs):
    """Attr-sliced FID (reference compute_fid_with_attr.py:44-80,173-301):
    one fake stat set, two Frechet distances against the attr-positive and
    attr-negative real stats; real stats cached in the reference npz layout
    (keys attr_mu/attr_sigma/not_attr_mu/not_attr_sigma,
    fid_stats_{name}_{dataset}_{attr}_run_{seed}.npz)."""
    stats_dir = save_path / "metrics" / "fid" / "statistics"
    stats_dir.mkdir(parents=True, exist_ok=True)
    # the reference layout has no sample-count component because it always
    # uses EVERY subset image; when --num_real_samples caps a subset the
    # stats are not the canonical ones, so key the cache by the cap to keep
    # a smoke run from poisoning a later full evaluation
    capped = num_real < max(len(attr_idx), len(not_attr_idx))
    cap_tag = f"_cap{num_real}" if capped else ""
    stats_file = stats_dir / (
        f"fid_stats_{args.model}_{args.dataset}_{args.attr}{cap_tag}"
        f"_run_{args.seed}.npz"
    )
    if stats_file.is_file():
        print("INFO: Loading existing statistics for real images...")
        f = np.load(stats_file)
        stats = {k: f[k][:] for k in
                 ("attr_mu", "attr_sigma", "not_attr_mu", "not_attr_sigma")}
        f.close()
    else:
        rng = np.random.default_rng(args.seed)
        stats = {}
        for name, idx in (("attr", attr_idx), ("not_attr", not_attr_idx)):
            # reference uses every subset image (get_dataset_images_with_attr);
            # --num_real_samples caps it for smoke runs
            sel = idx if len(idx) <= num_real else rng.choice(idx, num_real,
                                                              False)
            mu, sigma = M.activation_statistics(featurizer.features(ds.images[sel]))
            stats[f"{name}_mu"], stats[f"{name}_sigma"] = mu, sigma
        np.savez(stats_file, **stats)

    mu_fake, sigma_fake = M.activation_statistics(fake_feats)
    out = {}
    for name in ("attr", "not_attr"):
        out[name] = float(M.frechet_distance(
            stats[f"{name}_mu"], stats[f"{name}_sigma"], mu_fake, sigma_fake
        ))
        print(f"INFO: FID with {'' if name == 'attr' else 'not '}attribute: "
              f"{out[name]}")

    out_dir = save_path / "evaluate" / f"step-{args.netG_ckpt_step}"
    out_dir.mkdir(parents=True, exist_ok=True)
    tag = "drs_" if use_drs else ""
    out["inception_weights"] = featurizer.weights_kind
    (out_dir / f"fid_{tag}{args.attr}.json").write_text(
        json.dumps(out, indent=2)
    )
    return out


def run(args, use_drs=False, use_original_netD=False, num_fake=None,
        num_real=None):
    enable_compile_cache()
    if num_fake is None:
        num_fake = getattr(args, "num_fake_samples", 10000)
    if num_real is None:
        num_real = getattr(args, "num_real_samples", 10000)
    save_path = Path(f"{args.work_dir}/{args.exp_name}")
    set_seed(args.seed)
    assert args.netG_ckpt_step

    ds = get_predefined_dataset(args.dataset, args.root)
    attrs = getattr(ds, "attrs", None)
    assert attrs is not None and np.abs(attrs).sum() > 0, (
        "CelebA attribute annotations (list_attr_celeba.txt) not found"
    )
    col = CELEBA_ATTR_NAMES.index(args.attr)
    attr_idx = np.where(attrs[:, col] == 1)[0]
    not_attr_idx = np.where(attrs[:, col] != 1)[0]
    print(f"attr {args.attr}: {len(attr_idx)} with / {len(not_attr_idx)} without")

    bundle = get_gan_model(dataset_name=args.dataset, model=args.model,
                           loss_type=args.loss_type, drs=use_drs)
    g_state, d_drs_state = load_eval_models(
        bundle, save_path, args.netG_ckpt_step, use_drs=use_drs,
        use_original_netD=use_original_netD,
    )
    gen_fn = make_gen_fn(bundle, g_state)
    if use_drs:
        disc_fn = make_disc_fn(bundle.disc_drs or bundle.disc, d_drs_state)
        sampler = DRS(gen_fn, disc_fn, bundle.nz, batch_size=256)
    else:
        sampler = Sampler(gen_fn, bundle.nz, batch_size=256)

    featurizer = InceptionFeaturizer(batch_size=args.batch_size)
    fakes = sampler.generate_images(num_fake)
    fake_feats = featurizer.features(M.normalize_images(fakes))
    metric = getattr(args, "metric", "partial_recall")

    out = {}
    if metric in ("partial_recall", "all"):
        rng = np.random.default_rng(args.seed)
        for name, idx in (("attr", attr_idx), ("not_attr", not_attr_idx)):
            sel = idx if len(idx) <= num_real else rng.choice(idx, num_real,
                                                              False)
            feats = featurizer.features(ds.images[sel])
            out[name] = M.compute_partial_recall(feats, fake_feats, nearest_k=3)
            print(f"INFO ({'with' if name == 'attr' else 'without'} attr): "
                  f"partial_recall (step {args.netG_ckpt_step}): {out[name]}")

        out_dir = save_path / "evaluate" / f"step-{args.netG_ckpt_step}"
        out_dir.mkdir(parents=True, exist_ok=True)
        tag = "drs_" if use_drs else ""
        out_file = out_dir / f"partial_recall_{tag}{args.attr}.json"
        out["inception_weights"] = featurizer.weights_kind
        out_file.write_text(json.dumps(out, indent=2))

    if metric in ("fid", "all"):
        out["fid"] = _attr_fid(args, ds, featurizer, fake_feats, attr_idx,
                               not_attr_idx, save_path, num_real, use_drs)
    return out


if __name__ == "__main__":
    run(build_parser().parse_args())
