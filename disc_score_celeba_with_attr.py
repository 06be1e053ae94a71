"""Mean resampling weight of attr vs non-attr CelebA training examples
(reference disc_score_celeba_with_attr.py:25-61)."""
import argparse
import pickle
from pathlib import Path

import numpy as np

from diagan_tpu.data.sources import CELEBA_ATTR_NAMES, load_celeba_attrs
from diagan_tpu.score import calculate_scores


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="celeba", type=str)
    parser.add_argument("--root", "-r", default="./dataset/celeba", type=str)
    parser.add_argument("--work_dir", default="./exp_results", type=str)
    parser.add_argument("--exp_name", default="mimicry_pretrained-seed1", type=str)
    parser.add_argument("--p1_step", default=60000, type=int)
    parser.add_argument("--resample_score", type=str)
    parser.add_argument("--attr", default="Bald", type=str)
    args = parser.parse_args()

    save_path = Path(f"{args.work_dir}/{args.exp_name}")
    logit_path = save_path / "logits_netD_eval.pkl"
    print(f"Use logit from: {logit_path}")
    with open(logit_path, "rb") as f:
        logits = pickle.load(f)
    score_dict = calculate_scores(
        logits, start_epoch=args.p1_step - 5000, end_epoch=args.p1_step
    )
    sample_weights = np.asarray(score_dict[args.resample_score])
    print(f"sample_weights mean: {sample_weights.mean()}, "
          f"var: {sample_weights.var()}, max: {sample_weights.max()}, "
          f"min: {sample_weights.min()}")

    # CelebA train split (reference :41); capped to the logit-record length
    # when running on the reduced-N synthetic fallback
    train_num = min(162770, len(sample_weights))
    attr_file = Path(args.root) / "list_attr_celeba.txt"
    if attr_file.is_file():
        attrs = load_celeba_attrs(attr_file, n=train_num + 40000)
    else:
        from diagan_tpu.data.sources import load_celeba

        _, attrs = load_celeba(args.root)
    col = CELEBA_ATTR_NAMES.index(args.attr)
    attr_index = np.where(attrs[:, col] == 1)[0]
    not_attr_index = np.where(attrs[:, col] != 1)[0]
    attr_index = attr_index[attr_index < train_num]
    not_attr_index = not_attr_index[not_attr_index < train_num]
    print(f"attr weights mean: {sample_weights[attr_index].mean()}")
    print(f"not attr weights mean: {sample_weights[not_attr_index].mean()}")


if __name__ == "__main__":
    main()
