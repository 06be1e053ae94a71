"""Phase-2 Dia-GAN training for CIFAR-10 / CelebA: LDR-score resampling +
dual discriminator for DRS (or --gold / --topk baselines).

CLI parity with reference train_mimicry_phase2.py: loads
`logits_netD_eval.pkl` from the baseline run, scores the last 5000-step
window before --p1_step, resamples with --resample_score, restores G/D
from the phase-1 checkpoints and clones D into D_drs
(reference :86-117), then continues to --num_steps.
"""
import argparse
from pathlib import Path

from diagan_tpu.cli.common import (
    add_common_train_flags,
    enable_compile_cache,
    load_phase1_scores,
    phase1_ckpt_paths,
)
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.models import get_gan_model
from diagan_tpu.train import LogTrainer
from diagan_tpu.utils import set_seed
from diagan_tpu.utils.plot import print_num_params, show_sorted_score_samples


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="cifar10", type=str)
    parser.add_argument("--root", "-r", default="./dataset/cifar10", type=str)
    parser.add_argument("--exp_name", type=str)
    parser.add_argument("--baseline_exp_name", type=str)
    parser.add_argument("--p1_step", default=40000, type=int)
    parser.add_argument("--model", default="sngan", type=str)
    parser.add_argument("--loss_type", default="hinge", type=str)
    parser.add_argument("--num_steps", default=80000, type=int)
    parser.add_argument("--decay", default="linear", type=str)
    parser.add_argument("--n_dis", default=5, type=int)
    parser.add_argument("--resample_score", type=str)
    parser.add_argument("--gold", action="store_true")
    parser.add_argument("--topk", action="store_true")
    # TPU-native addition (not in the reference): median-center each logit
    # snapshot before scoring — counters ldr_conf saturation on easy data
    # (diagan_tpu/score/score.py docstring, docs/VALIDATION.md)
    parser.add_argument("--normalize_logits", action="store_true")
    add_common_train_flags(parser)
    args = parser.parse_args()

    enable_compile_cache()
    output_dir = f"{args.work_dir}/{args.exp_name}"
    save_path = Path(output_dir)
    save_path.mkdir(parents=True, exist_ok=True)
    baseline_save_path = Path(f"{args.work_dir}/{args.baseline_exp_name}")
    set_seed(args.seed)
    prefix = args.exp_name.split("/")[-1]

    window = 5000  # all datasets (reference :78-83)
    if not args.gold:
        sample_weights = load_phase1_scores(
            baseline_save_path, args.p1_step, args.resample_score, window,
            normalize_logits=args.normalize_logits,
        )
    else:
        sample_weights = None

    netG_ckpt_path, netD_ckpt_path = phase1_ckpt_paths(
        baseline_save_path, args.p1_step
    )
    # D_drs starts from netD's phase-1 weights (reference :98-101)
    netD_drs_ckpt_path = netD_ckpt_path
    from diagan_tpu.cli.common import resolve_phase2_resume

    netG_ckpt_path, netD_ckpt_path, netD_drs_ckpt_path = (
        resolve_phase2_resume(args, save_path, netG_ckpt_path,
                              netD_ckpt_path, netD_drs_ckpt_path)
    )

    bundle = get_gan_model(
        dataset_name=args.dataset, model=args.model, loss_type=args.loss_type,
        drs=True, topk=args.topk, gold=args.gold,
        bf16=getattr(args, "bf16", False),
    )
    ds_train = get_predefined_dataset(dataset_name=args.dataset, root=args.root)

    if not args.gold:
        show_sorted_score_samples(
            ds_train, score=sample_weights, save_path=save_path,
            score_name=args.resample_score, plot_name=prefix,
        )
    print(args)

    from diagan_tpu.cli.common import mesh_from_args, step_fusions_from_args

    trainer = LogTrainer(
        output_path=save_path,
        bundle=bundle,
        dataset=ds_train,
        step_fusions=step_fusions_from_args(args),
        mesh=mesh_from_args(args),
        sample_weights=sample_weights,
        dataset_drs=ds_train,
        num_steps=args.num_steps,
        n_dis=args.n_dis,
        lr_decay=args.decay,
        batch_size=args.batch_size,
        netG_ckpt_file=str(netG_ckpt_path),
        netD_ckpt_file=str(netD_ckpt_path),
        netD_drs_ckpt_file=str(netD_drs_ckpt_path),
        log_dir=output_dir,
        print_steps=10,
        save_steps=1000,
        topk=args.topk,
        gold=args.gold,
        gold_step=args.p1_step,
        save_logits=False,
        seed=args.seed,
        weight_eps=1e-6,  # reference get_dataloader eps (:21-23)
    )
    print_num_params(trainer.g_state.params, trainer.d_state.params)
    trainer.train()


if __name__ == "__main__":
    main()
