"""FID + IS + PR evaluation without DRS.

CLI parity with reference eval_gan.py: same flags; FID uses a
precalculated stats file when present
(./precalculated_statistics/fid_stats_{name}.npz, reference :61-82),
falling back to featurizing the real dataset; then inception_score on 50k
and PR on 10k/10k with k=3.
"""
import argparse
from pathlib import Path

from diagan_tpu.cli.common import enable_compile_cache
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.eval.evaluate import evaluate_checkpoint
from diagan_tpu.eval.inception import InceptionFeaturizer
from diagan_tpu.models import get_gan_model
from diagan_tpu.utils import set_seed

STATS_NAMES = {"celeba": "celeba_64_202k_run_0", "cifar10": "cifar10_train",
               "ffhq": "ffhq_69k_run_0"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="cifar10", type=str)
    parser.add_argument("--root", "-r", default="./dataset/cifar10", type=str)
    parser.add_argument("--work_dir", default="./exp_results", type=str)
    parser.add_argument("--exp_name", default="mimicry_pretrained-seed1", type=str)
    parser.add_argument("--model", default="sngan", type=str)
    parser.add_argument("--loss_type", default="hinge", type=str)
    parser.add_argument("--gpu", default="0", type=str)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--netG_ckpt_step", type=int)
    parser.add_argument("--netG_train_mode", action="store_true")
    args = parser.parse_args()

    enable_compile_cache()
    save_path = Path(f"{args.work_dir}/{args.exp_name}")
    set_seed(args.seed)
    assert args.netG_ckpt_step
    print(f"load model from {save_path} step: {args.netG_ckpt_step}")

    bundle = get_gan_model(dataset_name=args.dataset, model=args.model,
                           loss_type=args.loss_type)
    stats_file = Path(
        f"./precalculated_statistics/fid_stats_{STATS_NAMES.get(args.dataset, args.dataset)}.npz"
    )
    real_images = None
    if not stats_file.is_file():
        stats_file = None
        real_images = get_predefined_dataset(args.dataset, args.root).images

    featurizer = InceptionFeaturizer(batch_size=args.batch_size)
    common = dict(
        bundle=bundle, log_dir=save_path, evaluate_step=args.netG_ckpt_step,
        start_seed=0, num_runs=1, featurizer=featurizer,
        batch_size=args.batch_size,
    )
    evaluate_checkpoint("fid", real_images=real_images,
                        stats_file=stats_file, num_real_samples=50000,
                        num_fake_samples=50000, **common)
    evaluate_checkpoint("inception_score", num_fake_samples=50000, **common)
    evaluate_checkpoint("pr", real_images=real_images,
                        num_real_samples=10000, num_fake_samples=10000,
                        **common)


if __name__ == "__main__":
    main()
