"""FID restricted to the top-/bottom-scored real examples.

CLI parity with reference eval_gan_with_index.py: recompute LDR scores from
the baseline run's logits, take the --index_num highest- and lowest-scored
real examples, and compute FID of 50k fakes against each slice's
statistics (reference :93-123).
"""
import argparse
from pathlib import Path

import numpy as np

from diagan_tpu.cli.common import enable_compile_cache, load_phase1_scores
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.eval.evaluate import evaluate_checkpoint
from diagan_tpu.eval.inception import InceptionFeaturizer
from diagan_tpu.models import get_gan_model
from diagan_tpu.utils import set_seed


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="cifar10", type=str)
    parser.add_argument("--root", "-r", default="./dataset/cifar10", type=str)
    parser.add_argument("--work_dir", default="./exp_results", type=str)
    parser.add_argument("--exp_name", default="mimicry_pretrained-seed1", type=str)
    parser.add_argument("--baseline_exp_name", type=str)
    parser.add_argument("--p1_step", default=40000, type=int)
    parser.add_argument("--model", default="sngan", type=str)
    parser.add_argument("--loss_type", default="hinge", type=str)
    parser.add_argument("--gpu", default="0", type=str)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--netG_ckpt_step", type=int)
    parser.add_argument("--netG_train_mode", action="store_true")
    parser.add_argument("--resample_score", type=str)
    parser.add_argument("--gold", action="store_true")
    parser.add_argument("--topk", action="store_true")
    parser.add_argument("--index_num", default=100, type=int)
    return parser


def run(args, use_drs=False, use_original_netD=False):
    enable_compile_cache()
    save_path = Path(f"{args.work_dir}/{args.exp_name}")
    baseline_save_path = Path(f"{args.work_dir}/{args.baseline_exp_name}")
    set_seed(args.seed)
    assert args.netG_ckpt_step

    sample_weights = load_phase1_scores(
        baseline_save_path, args.p1_step, args.resample_score, window=5000
    )
    sort_index = np.argsort(sample_weights)
    high_index = sort_index[-args.index_num:]
    low_index = sort_index[: args.index_num]

    bundle = get_gan_model(
        dataset_name=args.dataset, model=args.model, loss_type=args.loss_type,
        topk=args.topk, gold=args.gold, drs=use_drs,
    )
    real_images = get_predefined_dataset(args.dataset, args.root).images
    featurizer = InceptionFeaturizer(batch_size=args.batch_size)
    for name, index in (("high", high_index), ("low", low_index)):
        evaluate_checkpoint(
            "fid", bundle=bundle, log_dir=save_path,
            evaluate_step=args.netG_ckpt_step, real_images=real_images,
            real_subset_index=index, num_real_samples=len(index),
            num_fake_samples=50000, featurizer=featurizer,
            use_drs=use_drs, use_original_netD=use_original_netD,
            name=f"{name}_{args.resample_score}",
        )


if __name__ == "__main__":
    run(build_parser().parse_args())
