"""Shared implementation of the Colored-MNIST / MNIST-FMNIST script family.

CLI parity with the six reference scripts
train_mimicry_{color_mnist,mnist_fmnist}_phase{1,2,2_gold}.py: same flags
and defaults (n_dis=1, ns loss, 20k steps, no decay, train-mode logit
recording in phase 1, vis every 100), same artifacts (channel-dominance
plots, sorted-score grids, resampled-batch grids).
"""
from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np

from diagan_tpu.cli.common import (
    add_common_train_flags,
    enable_compile_cache,
    mesh_from_args,
    resolve_phase2_resume,
)
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.models import get_gan_model
from diagan_tpu.score import calculate_scores
from diagan_tpu.train import LogTrainer
from diagan_tpu.train.logger import save_image_grid
from diagan_tpu.utils import set_seed
from diagan_tpu.utils.plot import (
    plot_color_mnist_generator,
    plot_score_sort,
    print_num_params,
)


def _base_parser(dataset, root, exp, num_steps=20000, model="mnistgan",
                 use_clipping=True, quiet=False):
    """Flag composition varies per reference script (verified by
    tests/test_cli_parity.py against the reference ASTs): --use_clipping
    exists in the phase1 and phase2_gold scripts only, --quiet in the
    mnist_fmnist family only, and the fmnist phase-1 --model default is
    'mnist_dcgan'. Both --use_clipping and --quiet are accepted-but-unused
    in the reference too."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default=dataset, type=str)
    parser.add_argument("--root", "-r", default=root, type=str)
    parser.add_argument("--exp_name", default=exp, type=str)
    parser.add_argument("--model", default=model, type=str)
    if quiet:
        parser.add_argument("--quiet", dest="quiet", action="store_true",
                            help="reference CLI compat; unused there too")
    parser.add_argument("--num_pack", default=1, type=int)
    if use_clipping:
        parser.add_argument("--use_clipping", action="store_true")
    parser.add_argument("--num_steps", default=num_steps, type=int)
    parser.add_argument("--logit_save_steps", default=100, type=int)
    parser.add_argument("--decay", default="None", type=str)
    parser.add_argument("--n_dis", default=1, type=int)
    parser.add_argument("--major_ratio", default=0.99, type=float)
    parser.add_argument("--num_data", default=10000, type=int)
    add_common_train_flags(parser)
    return parser


def _decay(args):
    return args.decay if args.decay not in ("None", "none", "") else None


def _gen_fn_from_trainer(trainer, n_batch=250):
    import jax

    def gen(num_images):
        out = []
        key = jax.random.key(123)
        for i in range(-(-num_images // n_batch)):
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, (n_batch, trainer.bundle.nz))
            out.append(np.asarray(trainer.generate_images(z=z)))
        return np.concatenate(out)[:num_images]

    return gen


def phase1(dataset, root, exp):
    fmnist = dataset == "mnist_fmnist"
    parser = _base_parser(
        dataset, root, exp,
        model="mnist_dcgan" if fmnist else "mnistgan", quiet=fmnist,
    )
    parser.add_argument("--loss_type", default="ns", type=str)
    parser.add_argument("--topk", default=0, type=int)
    parser.add_argument("--resample_score", type=str)
    args = parser.parse_args()

    enable_compile_cache()
    output_dir = f"{args.work_dir}/{args.exp_name}"
    save_path = Path(output_dir)
    save_path.mkdir(parents=True, exist_ok=True)
    set_seed(args.seed)

    bundle = get_gan_model(
        dataset_name=args.dataset, model=args.model, num_pack=args.num_pack,
        loss_type=args.loss_type, topk=args.topk == 1,
        bf16=getattr(args, "bf16", False),
    )
    ds_train = get_predefined_dataset(
        dataset_name=args.dataset, root=args.root,
        major_ratio=args.major_ratio, num_data=args.num_data,
    )
    print(args)

    netG_ckpt = netD_ckpt = None
    if getattr(args, "auto_resume", False):
        from diagan_tpu.cli.common import latest_ckpt_step

        own = latest_ckpt_step(save_path)
        if own:
            netG_ckpt = str(save_path / f"checkpoints/netG/netG_{own}_steps.pth")
            netD_ckpt = str(save_path / f"checkpoints/netD/netD_{own}_steps.pth")
            print(f"auto-resuming from step {own}")

    trainer = LogTrainer(
        output_path=save_path,
        mesh=mesh_from_args(args),
        bundle=bundle,
        dataset=ds_train,
        num_steps=args.num_steps,
        n_dis=args.n_dis,
        lr_decay=_decay(args),
        batch_size=args.batch_size,
        netG_ckpt_file=netG_ckpt,
        netD_ckpt_file=netD_ckpt,
        log_dir=output_dir,
        print_steps=10,
        save_steps=1000,
        vis_steps=100,
        logit_save_steps=args.logit_save_steps,
        topk=args.topk == 1,
        # PacGAN runs skip logit recording (reference phase1 :130)
        save_logits=args.num_pack == 1,
        save_eval_logits=False,  # train-mode logits (reference :131)
        seed=args.seed,
    )
    print_num_params(trainer.g_state.params, trainer.d_state.params)
    trainer.train()
    if dataset == "color_mnist":
        plot_color_mnist_generator(
            _gen_fn_from_trainer(trainer), save_path=save_path,
            file_name="eval_p1",
        )
    return trainer


def phase2(dataset, root, exp):
    fmnist = dataset == "mnist_fmnist"
    # --use_clipping exists in the fmnist phase-2 script but not the
    # color_mnist one (reference :54 vs. absent)
    parser = _base_parser(dataset, root, exp, use_clipping=fmnist,
                          quiet=fmnist)
    parser.add_argument(
        "--baseline_exp_name",
        default="mnist_fmnist_baseline" if fmnist else exp, type=str)
    parser.add_argument("--p1_step", default=10000, type=int)
    parser.add_argument("--resample_score", type=str)
    parser.add_argument("--loss_type",
                        default="ns" if fmnist else "hinge", type=str)
    parser.add_argument("--use_eval_logits", type=int)
    if fmnist:
        # reference fmnist phase2 only: trainer-side GOLD activation at
        # p1_step on the (always GOLD-capable) DCGAN D
        # (train_mimicry_mnist_fmnist_phase2.py:65,156-157)
        parser.add_argument("--gold", action="store_true")
    args = parser.parse_args()
    gold = bool(getattr(args, "gold", False))

    enable_compile_cache()
    output_dir = f"{args.work_dir}/{args.exp_name}"
    save_path = Path(output_dir)
    save_path.mkdir(parents=True, exist_ok=True)
    baseline_save_path = Path(f"{args.work_dir}/{args.baseline_exp_name}")
    prefix = args.exp_name.split("/")[-1]
    set_seed(args.seed)

    bundle = get_gan_model(
        dataset_name=args.dataset, model=args.model, drs=True, gold=gold,
        loss_type=args.loss_type, num_pack=args.num_pack,
        bf16=getattr(args, "bf16", False),
    )
    netG_ckpt = baseline_save_path / f"checkpoints/netG/netG_{args.p1_step}_steps.pth"
    netD_ckpt = baseline_save_path / f"checkpoints/netD/netD_{args.p1_step}_steps.pth"
    netG_ckpt, netD_ckpt, netD_drs_ckpt = resolve_phase2_resume(
        args, save_path, netG_ckpt, netD_ckpt, netD_ckpt
    )

    logit_name = "netD_eval" if args.use_eval_logits == 1 else "netD_train"
    logit_path = baseline_save_path / f"logits_{logit_name}.pkl"
    print(f"Use logit from: {logit_path}")
    with open(logit_path, "rb") as f:
        logits = pickle.load(f)
    score_dict = calculate_scores(
        logits, start_epoch=args.p1_step - 5000, end_epoch=args.p1_step
    )
    sample_weights = (
        np.asarray(score_dict[args.resample_score])
        if args.resample_score is not None else None
    )
    if sample_weights is not None:
        print(f"sample_weights mean: {sample_weights.mean()}, "
              f"var: {sample_weights.var()}, max: {sample_weights.max()}, "
              f"min: {sample_weights.min()}")
        from diagan_tpu.score import warn_if_degenerate_weights

        warn_if_degenerate_weights(sample_weights, args.resample_score)

    ds_train = get_predefined_dataset(
        dataset_name=args.dataset, root=args.root,
        major_ratio=args.major_ratio, num_data=args.num_data,
    )
    plot_score_sort(
        ds_train, score_dict, save_path=save_path,
        phase=f"{prefix}_{args.p1_step - 5000}-{args.p1_step}_score",
    )
    print(args, netG_ckpt, netD_ckpt)

    trainer = LogTrainer(
        output_path=save_path,
        mesh=mesh_from_args(args),
        bundle=bundle,
        dataset=ds_train,
        sample_weights=sample_weights,
        dataset_drs=ds_train,
        num_steps=args.num_steps,
        n_dis=args.n_dis,
        lr_decay=_decay(args),
        batch_size=args.batch_size,
        netG_ckpt_file=str(netG_ckpt),
        netD_ckpt_file=str(netD_ckpt),
        netD_drs_ckpt_file=str(netD_drs_ckpt),
        log_dir=output_dir,
        print_steps=10,
        save_steps=1000,
        vis_steps=100,
        logit_save_steps=args.logit_save_steps,
        save_logits=False,
        gold=gold,
        gold_step=args.p1_step if gold else 0,
        seed=args.seed,
    )
    # first resampled batch grid (reference :119-121)
    import jax

    imgs, _ = trainer.source.batch(jax.random.key(0), (64,))
    save_image_grid(np.asarray(imgs),
                    save_path / f"{prefix}_resampled_train_data_p2.png")
    print_num_params(trainer.g_state.params, trainer.d_state.params)
    trainer.train()

    if dataset == "color_mnist":
        plot_color_mnist_generator(
            _gen_fn_from_trainer(trainer), save_path=save_path,
            file_name=f"{prefix}-eval_p2",
        )
        # DRS-filtered generation diagnostic (reference :158-163)
        from diagan_tpu.eval.drs import DRS
        from diagan_tpu.eval.evaluate import make_disc_fn, make_gen_fn

        gen_fn = make_gen_fn(bundle, trainer.g_state)
        disc_fn = make_disc_fn(bundle.disc_drs, trainer.d_drs_state)
        sampler = DRS(gen_fn, disc_fn, bundle.nz, batch_size=250)
        plot_color_mnist_generator(
            lambda n: sampler.generate_images(n), save_path=save_path,
            file_name=f"{prefix}-eval_drs_percent80_p2",
        )
    return trainer


def phase2_gold(dataset, root, exp):
    fmnist = dataset == "mnist_fmnist"
    parser = _base_parser(dataset, root, exp, quiet=fmnist)
    parser.add_argument(
        "--baseline_exp_name",
        default="mnist_fmnist_baseline" if fmnist else exp, type=str)
    parser.add_argument("--p1_step", default=10000, type=int)
    if not fmnist:
        # declared-but-unused in the reference color_mnist gold script
        # (train_mimicry_color_mnist_phase2_gold.py:57,141)
        parser.add_argument("--resample_score", type=str)
    parser.add_argument("--loss_type",
                        default="ns" if fmnist else "hinge", type=str)
    if fmnist:
        # declared-but-unused in the reference
        # (train_mimicry_mnist_fmnist_phase2_gold.py:60)
        parser.add_argument("--use_eval_logits", type=int)
    args = parser.parse_args()

    enable_compile_cache()
    output_dir = f"{args.work_dir}/{args.exp_name}"
    save_path = Path(output_dir)
    save_path.mkdir(parents=True, exist_ok=True)
    baseline_save_path = Path(f"{args.work_dir}/{args.baseline_exp_name}")
    prefix = args.exp_name.split("/")[-1]
    set_seed(args.seed)

    bundle = get_gan_model(
        dataset_name=args.dataset, model=args.model,
        loss_type=args.loss_type, gold=True, num_pack=args.num_pack,
        bf16=getattr(args, "bf16", False),
    )
    netG_ckpt = baseline_save_path / f"checkpoints/netG/netG_{args.p1_step}_steps.pth"
    netD_ckpt = baseline_save_path / f"checkpoints/netD/netD_{args.p1_step}_steps.pth"
    netG_ckpt, netD_ckpt, _ = resolve_phase2_resume(
        args, save_path, netG_ckpt, netD_ckpt
    )
    ds_train = get_predefined_dataset(
        dataset_name=args.dataset, root=args.root,
        major_ratio=args.major_ratio, num_data=args.num_data,
    )
    print(args, netG_ckpt, netD_ckpt)

    trainer = LogTrainer(
        output_path=save_path,
        mesh=mesh_from_args(args),
        bundle=bundle,
        dataset=ds_train,
        num_steps=args.num_steps,
        n_dis=args.n_dis,
        lr_decay=_decay(args),
        batch_size=args.batch_size,
        netG_ckpt_file=str(netG_ckpt),
        netD_ckpt_file=str(netD_ckpt),
        log_dir=output_dir,
        print_steps=10,
        save_steps=1000,
        vis_steps=100,
        logit_save_steps=args.logit_save_steps,
        save_logits=False,
        gold=True,
        gold_step=args.p1_step,
        seed=args.seed,
    )
    print_num_params(trainer.g_state.params, trainer.d_state.params)
    trainer.train()
    if dataset == "color_mnist":
        plot_color_mnist_generator(
            _gen_fn_from_trainer(trainer), save_path=save_path,
            file_name=f"{prefix}-eval_p2",
        )
    return trainer
