"""StyleGAN2 FFHQ phase-2 Dia-GAN training: LDR-score weighted resampling +
twin DRS discriminator trained in the same step.

CLI parity with reference stylegan2/train_ffhq_phase2.py: loads the
phase-1 checkpoint (drs_d initialized from d), scores
`logits_netD.pkl` over the 5000-step window before --p1_step with
--resample_score, r1 default 10 (reference :428). Unlike the reference,
the score weights survive data parallelism (the reference's
DistributedSampler silently dropped them, :35-45).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pickle  # noqa: E402

import numpy as np  # noqa: E402

from diagan_tpu.score import calculate_scores  # noqa: E402
from train_ffhq import build_parser, make_trainer  # noqa: E402


def main():
    parser = build_parser()
    parser.add_argument("--p1_step", default=200000, type=int)
    parser.add_argument("--baseline_exp_name", type=str)
    parser.add_argument("--resample_score", type=str)
    # phase-2 surface deviations from the shared phase-1 parser, matching
    # the reference (:428 r1=10; :511 save_logit_after=1000000 — phase 2
    # records no logits unless explicitly asked)
    parser.set_defaults(r1=10.0, save_logit_after=1000000)
    args = parser.parse_args()

    baseline_dir = Path(args.work_dir) / (args.baseline_exp_name or args.exp_name)
    logit_path = baseline_dir / "logits_netD.pkl"
    print(f"Use logit from: {logit_path}")
    with open(logit_path, "rb") as f:
        logits = pickle.load(f)
    window = 5000
    score_dict = calculate_scores(
        logits, start_epoch=args.p1_step - window, end_epoch=args.p1_step
    )
    if args.resample_score is None:
        parser.error("--resample_score is required (the reference crashes "
                     "with KeyError(None) here; see README for the "
                     "shipping score names, e.g. ldr_conf_3.0_ratio_50)")
    sample_weights = np.asarray(score_dict[args.resample_score])
    print(f"sample_weights mean: {sample_weights.mean()}, "
          f"max: {sample_weights.max()}, min: {sample_weights.min()}")
    from diagan_tpu.score import warn_if_degenerate_weights

    warn_if_degenerate_weights(sample_weights, args.resample_score)

    trainer, start = make_trainer(
        args, sample_weights=sample_weights, drs=True, r1=args.r1
    )
    if not args.ckpt and start == 0:
        # start != 0 means --auto_resume already picked up a mid-phase-2
        # checkpoint from this experiment dir (crash/preemption restart)
        ckpt = baseline_dir / "checkpoint" / f"{args.p1_step:06d}.pt"
        start = trainer.load_ckpt(ckpt)
        print(f"loaded phase-1 checkpoint {ckpt} (step {start})")
    trainer.train(start_step=start)


if __name__ == "__main__":
    main()
