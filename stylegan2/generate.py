"""Sample image grids from a StyleGAN2 checkpoint with truncation.

CLI parity with reference stylegan2/generate.py: --sample images per grid,
--pics grids, --truncation with mean-latent estimated from
--truncation_mean draws; samples come from g_ema.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diagan_tpu.models.stylegan2 import StyleGAN2Generator  # noqa: E402
from diagan_tpu.train.logger import save_image_grid  # noqa: E402
from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer  # noqa: E402
from diagan_tpu.models.stylegan2 import StyleGAN2Discriminator  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--sample", type=int, default=1)
    parser.add_argument("--pics", type=int, default=20)
    parser.add_argument("--truncation", type=float, default=1.0)
    parser.add_argument("--truncation_mean", type=int, default=4096)
    # reference default points at the NVIDIA release checkpoint
    # (stylegan2/generate.py:53-58); not required there either
    parser.add_argument("--ckpt", type=str,
                        default="stylegan2-ffhq-config-f.pt")
    parser.add_argument("--channel_multiplier", type=int, default=2)
    parser.add_argument("--out_dir", type=str, default="sample")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true")
    args = parser.parse_args()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    gen = StyleGAN2Generator(size=args.size,
                             channel_multiplier=args.channel_multiplier,
                             dtype=dtype)
    disc = StyleGAN2Discriminator(size=args.size,
                                  channel_multiplier=args.channel_multiplier)
    tr = StyleGAN2Trainer("/tmp/_sg2_gen", gen, disc,
                          np.zeros((4, args.size, args.size, 3), np.uint8),
                          num_steps=1, batch_size=2)
    tr.load_ckpt(args.ckpt)
    variables = {"params": tr.g_ema}

    key = jax.random.key(args.seed)
    w_mean = None
    if args.truncation < 1:
        key, sub = jax.random.split(key)
        w_mean = gen.apply(variables, sub, args.truncation_mean,
                           method=StyleGAN2Generator.mean_latent)

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def sample(z, noise_key):
        return gen.apply(
            variables, [z], None, args.truncation, w_mean,
            method=StyleGAN2Generator.sample, rngs={"noise": noise_key},
        )

    for i in range(args.pics):
        key, kz, kn = jax.random.split(key, 3)
        z = jax.random.normal(kz, (args.sample, gen.style_dim))
        imgs = np.asarray(sample(z, kn))
        save_image_grid(imgs, out_dir / f"{i:06d}.png",
                        nrow=int(np.sqrt(args.sample)))
    print(f"wrote {args.pics} grids to {out_dir}")


if __name__ == "__main__":
    main()
