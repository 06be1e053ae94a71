"""Compare baseline vs resampled CAE reconstruction errors over all and
minority examples -> CSV.

CLI parity with reference eval_ae_score.py:13-78 (same flags, same CSV
columns ['Ratio','Seed','Type','Baseline','Resample','Difference(%)'],
minority slice = biased/mixed label 1).
"""
import argparse
import csv
import os
import pickle
from pathlib import Path

import numpy as np

from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.score import calculate_scores
from diagan_tpu.utils import set_seed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="color_mnist", type=str)
    parser.add_argument("--root", "-r", default="./dataset/colour_mnist", type=str)
    parser.add_argument("--baseline_exp_path", default="color_mnist", type=str)
    parser.add_argument("--resample_exp_path", default="color_mnist", type=str)
    parser.add_argument("--p1_step", default=15000, type=int)
    parser.add_argument("--p2_step", default=20000, type=int)
    parser.add_argument("--resample_score", type=str)
    parser.add_argument("--use_loss", action="store_true")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--major_ratio", default=0.99, type=float)
    parser.add_argument("--num_data", default=10000, type=int)
    parser.add_argument("--name", type=str)
    args = parser.parse_args()

    set_seed(args.seed)
    baseline_exp_path = Path(args.baseline_exp_path)
    resample_exp_path = Path(args.resample_exp_path)

    assert args.use_loss, "RE comparison reads cae_training_loss.npy (--use_loss)"
    baseline_ae = np.load(
        baseline_exp_path / f"cae_checkpoints/{args.p2_step}_steps_seed{args.seed}/cae_training_loss.npy"
    )[:, -1]
    resample_ae = np.load(
        resample_exp_path / f"cae_checkpoints/{args.p2_step}_steps_seed{args.seed}/cae_training_loss.npy"
    )[:, -1]

    # the reference hardcodes the eval-mode pickle (eval_ae_score.py:38)
    # although the MNIST phase-1 scripts record train-mode logits; fall back
    logit_path = baseline_exp_path / "logits_netD_eval.pkl"
    if not logit_path.is_file():
        logit_path = baseline_exp_path / "logits_netD_train.pkl"
    with open(logit_path, "rb") as f:
        logits = pickle.load(f)
    score_dict = calculate_scores(
        logits, start_epoch=args.p1_step - 5000, end_epoch=args.p1_step
    )
    sample_weights = np.asarray(score_dict[args.resample_score])
    weight_sort_index = np.argsort(sample_weights)

    ds_train = get_predefined_dataset(
        dataset_name=args.dataset, root=args.root,
        major_ratio=args.major_ratio, num_data=args.num_data,
    )

    csv_file = f"./re_{args.dataset}_{args.name}.csv"
    new_file = not os.path.exists(csv_file)
    with open(csv_file, "a" if not new_file else "w", newline="") as f:
        wr = csv.writer(f)
        if new_file:
            wr.writerow(["Ratio", "Seed", "Type", "Baseline", "Resample",
                         "Difference(%)"])
        test_dict = {"all": weight_sort_index}
        minority_name = "green" if args.dataset == "color_mnist" else "fmnist"
        test_dict[minority_name] = np.where(ds_train.labels == 1)
        for idx_name, index in test_dict.items():
            b = baseline_ae[index].mean()
            r = resample_ae[index].mean()
            diff = (r - b) / b * 100
            print(f"{idx_name}, baseline_mean: {b}, resample_mean: {r} diff: {diff}%")
            wr.writerow([args.major_ratio, args.seed, idx_name, b, r, diff])


if __name__ == "__main__":
    main()
