"""Phase-1 training for CIFAR-10 / CelebA (SNGAN/SSGAN/InfoMaxGAN).

CLI parity with reference train_mimicry_phase1.py (flags, defaults, and the
dataset-conditional schedule overrides at :82-92: cifar10 -> 50k steps with
logit recording 35k-40k; celeba -> 75k with 55k-60k).
"""
import argparse
from pathlib import Path

from diagan_tpu.cli.common import add_common_train_flags, enable_compile_cache
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.models import get_gan_model
from diagan_tpu.train import LogTrainer
from diagan_tpu.utils import set_seed
from diagan_tpu.utils.plot import print_num_params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="cifar10", type=str)
    parser.add_argument("--root", "-r", default="./dataset/cifar10", type=str,
                        help="dataset dir")
    parser.add_argument("--exp_name", default="cifar10", type=str)
    parser.add_argument("--model", default="sngan", type=str)
    parser.add_argument("--loss_type", default="hinge", type=str)
    parser.add_argument("--num_pack", default=1, type=int)
    parser.add_argument("--download_dataset", action="store_true")
    parser.add_argument("--topk", action="store_true")
    parser.add_argument("--num_steps", default=100000, type=int)
    parser.add_argument("--logit_save_steps", default=100, type=int)
    parser.add_argument("--decay", default="linear", type=str)
    parser.add_argument("--n_dis", default=5, type=int)
    parser.add_argument("--imb_factor", default=0.1, type=float)
    parser.add_argument("--celeba_class_attr", default="glass", type=str)
    parser.add_argument("--ckpt_step", type=int)
    parser.add_argument("--no_save_logits", action="store_true")
    parser.add_argument("--no_schedule_override", action="store_true")
    parser.add_argument("--save_logit_after", default=30000, type=int)
    parser.add_argument("--stop_save_logit_after", default=60000, type=int)
    add_common_train_flags(parser)
    args = parser.parse_args()

    enable_compile_cache()
    output_dir = f"{args.work_dir}/{args.exp_name}"
    save_path = Path(output_dir)
    save_path.mkdir(parents=True, exist_ok=True)
    set_seed(args.seed)

    bundle = get_gan_model(
        dataset_name=args.dataset, model=args.model,
        loss_type=args.loss_type, topk=args.topk, num_pack=args.num_pack,
        bf16=getattr(args, "bf16", False),
    )
    ds_train = get_predefined_dataset(dataset_name=args.dataset, root=args.root)

    # dataset-conditional schedule overrides (reference :82-92);
    # --no_schedule_override is additive (not in the reference): it keeps
    # the user's --num_steps/--save_logit_after for short validation runs
    if args.no_schedule_override:
        pass
    elif args.dataset == "celeba":
        args.num_steps = 75000
        args.logit_save_steps = 100
        args.save_logit_after = 55000
        args.stop_save_logit_after = 60000
    elif args.dataset == "cifar10":
        args.num_steps = 50000
        args.logit_save_steps = 100
        args.save_logit_after = 35000
        args.stop_save_logit_after = 40000
    print(args)

    if not args.ckpt_step and getattr(args, "auto_resume", False):
        from diagan_tpu.cli.common import latest_ckpt_step

        args.ckpt_step = latest_ckpt_step(save_path)
        if args.ckpt_step:
            print(f"auto-resuming from step {args.ckpt_step}")
    if args.ckpt_step:
        netG_ckpt_file = save_path / f"checkpoints/netG/netG_{args.ckpt_step}_steps.pth"
        netD_ckpt_file = save_path / f"checkpoints/netD/netD_{args.ckpt_step}_steps.pth"
    else:
        netG_ckpt_file = netD_ckpt_file = None

    from diagan_tpu.cli.common import mesh_from_args, step_fusions_from_args

    trainer = LogTrainer(
        output_path=save_path,
        bundle=bundle,
        dataset=ds_train,
        step_fusions=step_fusions_from_args(args),
        mesh=mesh_from_args(args),
        num_steps=args.num_steps,
        n_dis=args.n_dis,
        lr_decay=args.decay,
        batch_size=args.batch_size,
        netG_ckpt_file=netG_ckpt_file,
        netD_ckpt_file=netD_ckpt_file,
        log_dir=output_dir,
        print_steps=10,
        save_steps=1000,
        logit_save_steps=args.logit_save_steps,
        topk=args.topk,
        save_logits=not args.no_save_logits,
        save_logit_after=args.save_logit_after,
        stop_save_logit_after=args.stop_save_logit_after,
        seed=args.seed,
    )
    print_num_params(trainer.g_state.params, trainer.d_state.params)
    trainer.train()


if __name__ == "__main__":
    main()
