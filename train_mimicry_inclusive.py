"""Inclusive-GAN training on Colored-MNIST / MNIST-FMNIST.

CLI parity with reference train_mimicry_inclusive.py: DCGAN generator with
the nearest-latent reconstruction + interpolation losses (advG + 10*recons
+ 4*itp, nearest latents refreshed every num_data/bs*20 steps).
"""
import argparse
from pathlib import Path

from diagan_tpu.cli.common import add_common_train_flags, enable_compile_cache
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.models import get_gan_model
from diagan_tpu.train.inclusive import InclusiveTrainer
from diagan_tpu.utils import set_seed
from diagan_tpu.utils.plot import plot_color_mnist_generator, print_num_params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-d", default="color_mnist", type=str)
    parser.add_argument("--root", "-r", default="./dataset/colour_mnist", type=str)
    parser.add_argument("--exp_name", default="colour_mnist", type=str)
    parser.add_argument("--loss_type", default="ns", type=str)
    parser.add_argument("--model", default="mnist_dcgan", type=str)
    parser.add_argument("--num_pack", default=1, type=int)
    parser.add_argument("--use_clipping", action="store_true")
    parser.add_argument("--num_steps", default=20000, type=int)
    parser.add_argument("--logit_save_steps", default=100, type=int)
    parser.add_argument("--decay", default="None", type=str)
    parser.add_argument("--n_dis", default=1, type=int)
    parser.add_argument("--major_ratio", default=0.99, type=float)
    parser.add_argument("--num_data", default=10000, type=int)
    parser.add_argument("--topk", default=0, type=int)
    parser.add_argument("--resample_score", type=str)
    add_common_train_flags(parser)
    args = parser.parse_args()

    enable_compile_cache()
    output_dir = f"{args.work_dir}/{args.exp_name}"
    save_path = Path(output_dir)
    save_path.mkdir(parents=True, exist_ok=True)
    set_seed(args.seed)

    bundle = get_gan_model(
        dataset_name=args.dataset, model="mnistgan", num_pack=args.num_pack,
        loss_type=args.loss_type, topk=args.topk == 1,
    )
    ds_train = get_predefined_dataset(
        dataset_name=args.dataset, root=args.root,
        major_ratio=args.major_ratio, num_data=args.num_data,
    )
    print(args)

    trainer = InclusiveTrainer(
        output_path=save_path,
        bundle=bundle,
        dataset=ds_train,
        num_steps=args.num_steps,
        n_dis=args.n_dis,
        lr_decay=args.decay if args.decay not in ("None", "") else None,
        batch_size=args.batch_size,
        log_dir=output_dir,
        print_steps=10,
        save_steps=1000,
        vis_steps=100,
        logit_save_steps=args.logit_save_steps,
        save_logits=args.num_pack == 1,
        save_eval_logits=False,
        seed=args.seed,
    )
    print_num_params(trainer.g_state.params, trainer.d_state.params)
    trainer.train()
    if args.dataset == "color_mnist":
        import jax
        import numpy as np

        def gen(num_images):
            out = []
            key = jax.random.key(123)
            for _ in range(-(-num_images // 250)):
                key, sub = jax.random.split(key)
                z = jax.random.normal(sub, (250, bundle.nz))
                out.append(np.asarray(trainer.generate_images(z=z)))
            return np.concatenate(out)[:num_images]

        plot_color_mnist_generator(gen, save_path=save_path,
                                   file_name="eval_inclusive")


if __name__ == "__main__":
    main()
