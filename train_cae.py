"""CAE reconstruction-error training: generate 50k images from the
(DRS-wrapped) checkpointed G, train a CAE on them, record per-real-example
reconstruction errors each epoch.

CLI parity with reference train_cae.py:112-213: DRS is used iff a
`checkpoints/netD_drs/netD_drs_{step}_steps.pth` exists; artifacts keep the
reference names (generated-dataset pickle, cae_checkpoints/{step}_steps_
seed{seed}/cae_training_loss.npy, ae_score pickle, sorted-score grids).
"""
import argparse
import os
import pickle
from pathlib import Path

import numpy as np

from diagan_tpu.cli.common import enable_compile_cache
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.eval.cae_protocol import generate_dataset, train_cae
from diagan_tpu.eval.drs import DRS
from diagan_tpu.eval.evaluate import (
    Sampler,
    load_eval_models,
    make_disc_fn,
    make_gen_fn,
)
from diagan_tpu.models import get_gan_model
from diagan_tpu.models.cae import get_ae_model
from diagan_tpu.utils import set_seed
from diagan_tpu.utils.plot import show_sorted_score_samples


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="cifar10", type=str)
    parser.add_argument("--root", "-r", default="./dataset/cifar10", type=str)
    parser.add_argument("--work_dir", default="./exp_results", type=str)
    parser.add_argument("--exp_name", default="mimicry_pretrained-seed1", type=str)
    parser.add_argument("--gpu", default="0", type=str)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--epochs", default=50, type=int)
    parser.add_argument("--netG_step", type=int)
    parser.add_argument("--netG_train_mode", action="store_true")
    parser.add_argument("--cae_ckpt_path", type=str)
    parser.add_argument("--model", type=str)
    parser.add_argument("--loss_type", default="ns", type=str)
    parser.add_argument("--generated_dataset_path", type=str)
    parser.add_argument("--major_ratio", default=0.99, type=float)
    parser.add_argument("--num_data", default=10000, type=int)
    parser.add_argument("--num_pack", default=1, type=int)
    parser.add_argument("--topk", action="store_true")
    args = parser.parse_args()

    enable_compile_cache()
    save_path = Path(f"{args.work_dir}/{args.exp_name}")
    save_path.mkdir(parents=True, exist_ok=True)
    set_seed(args.seed)
    assert args.netG_step
    step = args.netG_step

    bundle = get_gan_model(
        args.dataset, model=args.model, drs=True, loss_type=args.loss_type,
        topk=args.topk, num_pack=args.num_pack,
    )
    drs_ckpt = save_path / f"checkpoints/netD_drs/netD_drs_{step}_steps.pth"
    use_drs = os.path.exists(drs_ckpt)
    g_state, d_drs_state = load_eval_models(
        bundle, save_path, step, use_drs=use_drs
    )
    gen_fn = make_gen_fn(bundle, g_state)
    if use_drs:
        disc_fn = make_disc_fn(bundle.disc_drs, d_drs_state)
        sampler = DRS(gen_fn, disc_fn, bundle.nz, batch_size=256)
    else:
        sampler = Sampler(gen_fn, bundle.nz, batch_size=256)
    print(f"use drs: {use_drs}")

    ds_test = get_predefined_dataset(
        dataset_name=args.dataset, root=args.root,
        major_ratio=args.major_ratio, num_data=args.num_data,
    )

    if args.generated_dataset_path:
        print(f"skip data generation, use: {args.generated_dataset_path}")
        with open(args.generated_dataset_path, "rb") as f:
            gen_imgs = np.asarray(pickle.load(f), np.uint8)
    else:
        gen_path = save_path / f"netG_{step}_steps_seed{args.seed}_generated_dataset.pkl"
        gen_imgs = generate_dataset(sampler.generate_images, gen_path)
        print(f"data generated in: {gen_path}")

    cae = get_ae_model(dataset_name=args.dataset, in_channels=bundle.nc)
    cae_ckpt_path = save_path / "cae_checkpoints" / f"{step}_steps_seed{args.seed}"
    re = train_cae(
        cae, gen_imgs, ds_test.images, cae_ckpt_path, epochs=args.epochs,
        batch_size=args.batch_size, seed=args.seed,
    )
    final_score = re[:, -1]
    with open(save_path / f"netG_{step}_steps_seed{args.seed}_epoch{args.epochs}_ae_score.pkl", "wb") as f:
        pickle.dump(final_score, f)
    show_sorted_score_samples(
        dataset=ds_test, score=final_score, save_path=save_path,
        score_name="ae_score",
        plot_name=f"netG_{step}_steps_seed{args.seed}_epoch{args.epochs}_ae_score",
    )


if __name__ == "__main__":
    main()
