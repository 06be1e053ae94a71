"""StyleGAN2 FFHQ phase-1 training.

CLI parity with reference stylegan2/train_ffhq.py (flags, defaults,
checkpoint dict layout, logit-recording window 195k-200k). The reference's
DDP/NCCL multi-GPU path is replaced by the jax.sharding data-parallel mesh
(diagan_tpu.parallel); ADA sign statistics are psum'd when data-parallel.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diagan_tpu.cli.common import enable_compile_cache  # noqa: E402
from diagan_tpu.data.ffhq import load_ffhq  # noqa: E402
from diagan_tpu.models.stylegan2 import (  # noqa: E402
    StyleGAN2Discriminator,
    StyleGAN2Generator,
)
from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer  # noqa: E402
from diagan_tpu.utils import set_seed  # noqa: E402


def build_parser():
    parser = argparse.ArgumentParser()
    # the reference defaults really are cifar10 here even in the FFHQ
    # scripts (stylegan2/train_ffhq.py:387-388); README commands pass
    # `-d ffhq -r ./dataset/ffhq` explicitly
    parser.add_argument("--dataset", "-d", default="cifar10", type=str)
    parser.add_argument("--root", "-r", default="./dataset/cifar10", type=str)
    parser.add_argument("--iter", type=int, default=800000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--n_sample", type=int, default=64)
    parser.add_argument("--size", type=int, default=32)
    parser.add_argument("--r1", type=float, default=0.1)
    parser.add_argument("--path_regularize", type=float, default=2)
    parser.add_argument("--path_batch_shrink", type=int, default=2)
    parser.add_argument("--d_reg_every", type=int, default=16)
    parser.add_argument("--g_reg_every", type=int, default=4)
    parser.add_argument("--mixing", type=float, default=0.9)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--lr", type=float, default=0.002)
    parser.add_argument("--channel_multiplier", type=int, default=2)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--local_rank", type=int, default=0)
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--augment_p", type=float, default=0)
    parser.add_argument("--ada_target", type=float, default=0.6)
    # additive: static ADA reflect pad as a fraction of image size; 0.75
    # covers the full transform distribution (reference pads dynamically),
    # smaller values trade far-tail edge clamping for step time
    parser.add_argument("--ada_pad_frac", type=float, default=0.75)
    parser.add_argument("--ada_length", type=int, default=500 * 1000)
    parser.add_argument("--ada_every", type=int, default=256)
    parser.add_argument("--work_dir", default="./exp_results", type=str)
    parser.add_argument("--exp_name", default="test", type=str)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--gpu", type=str)
    parser.add_argument("--logit_save_steps", default=100, type=int)
    parser.add_argument("--save_logit_after", default=195000, type=int)
    parser.add_argument("--stop_save_logit_after", default=200000, type=int)
    # TPU-native addition (not in the reference): bf16 compute dtype for
    # the synthesis network and D backbone (params/optimizer stay fp32).
    # Measured 1.23x per-step at 256px on v5e (675 -> 548 ms).
    parser.add_argument("--bf16", action="store_true")
    # additive: force host-streamed data (auto-enabled when the dataset
    # exceeds the HBM budget; see StyleGAN2Trainer stream_data)
    parser.add_argument("--stream_data", action="store_true")
    # additive: rematerialize G/D activations (per-layer nn.remat) — one
    # extra forward per backward for O(layer) activation memory; use for
    # large batch or >512px sizes that otherwise exceed HBM
    parser.add_argument("--remat", action="store_true")
    # additive: dispatch D/R1/G/path as separate programs instead of one
    # fused scan — for very large configs (256px batch>=64, 1024px
    # batch>=8) whose fused program the compile service rejects
    parser.add_argument("--no_fuse", action="store_true")
    # additive: cap steps per fused dispatch — the axon worker kills
    # device programs running much past ~a minute (docs/VALIDATION.md
    # round 3). Default None = AUTO: the trainer bootstraps with short
    # dispatches, times one, and sizes the cap to ~30s of device time
    # (StyleGAN2Trainer._observe_chunk); pass a value to override.
    parser.add_argument("--max_chunk", default=None, type=int)
    # additive: data-parallel training over all visible devices
    # (jax.sharding mesh; replaces the reference's torch.distributed.launch
    # + DDP/NCCL path, train_ffhq.py:500-585). --batch stays PER-DEVICE,
    # matching the reference's per-GPU --batch semantics. Composes with
    # --stream_data (global host batches split over the data axis).
    parser.add_argument("--data_parallel", action="store_true")
    # additive: checkpoint cadence (the reference hardcodes 5000,
    # train_ffhq.py:365); lower it on preemptible/flaky hardware
    parser.add_argument("--save_every", type=int, default=5000)
    # additive: resume from the latest checkpoint in the experiment dir
    # when --ckpt is not given (lossless restart after a TPU worker crash
    # or preemption; pair with scripts/supervise.py for hands-off runs)
    parser.add_argument("--auto_resume", action="store_true")
    return parser


def make_trainer(args, sample_weights=None, drs=False, r1=None):
    enable_compile_cache()
    set_seed(args.seed)
    output_dir = Path(args.work_dir) / args.exp_name
    import jax.numpy as jnp

    images = load_ffhq(args.root, size=args.size)
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    remat = getattr(args, "remat", False)
    gen = StyleGAN2Generator(size=args.size,
                             channel_multiplier=args.channel_multiplier,
                             dtype=dtype, remat=remat)
    disc = StyleGAN2Discriminator(size=args.size,
                                  channel_multiplier=args.channel_multiplier,
                                  dtype=dtype, remat=remat)
    drs_disc = (
        StyleGAN2Discriminator(size=args.size,
                               channel_multiplier=args.channel_multiplier,
                               dtype=dtype, remat=remat)
        if drs else None
    )
    mesh = None
    if getattr(args, "data_parallel", False):
        from diagan_tpu.parallel import make_mesh

        mesh = make_mesh()
    trainer = StyleGAN2Trainer(
        output_dir, gen, disc, images,
        num_steps=args.iter,
        mesh=mesh,
        save_every=getattr(args, "save_every", 5000),
        drs_disc=drs_disc,
        sample_weights=sample_weights,
        batch_size=args.batch,
        lr=args.lr,
        r1_weight=r1 if r1 is not None else args.r1,
        path_regularize=args.path_regularize,
        d_reg_every=args.d_reg_every,
        g_reg_every=args.g_reg_every,
        path_batch_shrink=args.path_batch_shrink,
        mixing=args.mixing,
        # None -> augmentation statically compiled out (reference --augment
        # absent); 0 -> adaptive ADA; >0 -> fixed p
        augment_p=args.augment_p if args.augment else None,
        ada_target=args.ada_target,
        ada_length=args.ada_length,
        ada_pad_frac=args.ada_pad_frac,
        logit_save_steps=args.logit_save_steps,
        save_logit_after=args.save_logit_after,
        stop_save_logit_after=args.stop_save_logit_after,
        seed=args.seed,
        stream_data=True if args.stream_data else None,
        fuse_steps=not getattr(args, "no_fuse", False),
        max_chunk=getattr(args, "max_chunk", None),
    )
    start = 0
    if args.ckpt:
        start = trainer.load_ckpt(args.ckpt)
        print(f"resumed from {args.ckpt} at step {start}")
    elif getattr(args, "auto_resume", False):
        latest = trainer.find_latest_ckpt()
        if latest is not None:
            start = trainer.load_ckpt(latest)
            print(f"auto-resumed from {latest} at step {start}")
    return trainer, start


def main():
    args = build_parser().parse_args()
    trainer, start = make_trainer(args)
    trainer.train(start_step=start)


if __name__ == "__main__":
    main()
