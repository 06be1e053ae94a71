"""Count attribute frequency among generated samples (reference
count_attr_celeba.py): classify --num_samples generated images (optionally
DRS-filtered, optionally using the phase-1 netD via --use_original_netD)
with a trained attribute classifier and report the positive fraction."""
import argparse
import json
from pathlib import Path

import numpy as np

from diagan_tpu.cli.common import enable_compile_cache
from diagan_tpu.eval.evaluate import (
    DRS,
    Sampler,
    load_eval_models,
    make_disc_fn,
    make_gen_fn,
)
from diagan_tpu.models import get_gan_model
from diagan_tpu.models.convnets import AttrClassifier
from diagan_tpu.train.classifier import predict_classifier
from diagan_tpu.utils import set_seed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--work_dir", default="./exp_results", type=str)
    parser.add_argument("--exp_name", default="mimicry_pretrained-seed1", type=str)
    parser.add_argument("--model", default="sngan", type=str)
    parser.add_argument("--loss_type", default="hinge", type=str)
    parser.add_argument("--classifier", default="vgg16", type=str)
    parser.add_argument("--gpu", default="0", type=str)
    parser.add_argument("--batch_size", default=100, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--netG_ckpt_step", type=int)
    parser.add_argument("--netG_train_mode", action="store_true")
    parser.add_argument("--use_original_netD", action="store_true")
    parser.add_argument("--attr", default="Bald", type=str)
    parser.add_argument("--drs", action="store_true")
    parser.add_argument("--num_samples", default=50000, type=int)
    args = parser.parse_args()

    enable_compile_cache()
    set_seed(args.seed)
    save_path = Path(f"{args.work_dir}/{args.exp_name}")
    assert args.netG_ckpt_step

    bundle = get_gan_model("celeba", model=args.model,
                           loss_type=args.loss_type, drs=args.drs)
    g_state, d_drs_state = load_eval_models(
        bundle, save_path, args.netG_ckpt_step, use_drs=args.drs,
        use_original_netD=args.use_original_netD,
    )
    gen_fn = make_gen_fn(bundle, g_state)
    if args.drs:
        disc_fn = make_disc_fn(bundle.disc_drs or bundle.disc, d_drs_state)
        sampler = DRS(gen_fn, disc_fn, bundle.nz, batch_size=256)
    else:
        sampler = Sampler(gen_fn, bundle.nz, batch_size=256)

    clf_path = Path(args.work_dir) / "attr_classifier" / f"{args.attr}.pth"
    assert clf_path.is_file(), f"train the classifier first: {clf_path}"
    import jax
    import jax.numpy as jnp
    from flax import serialization

    model = AttrClassifier(num_attrs=2)
    template = model.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          jnp.zeros((1, 64, 64, 3)), train=False)
    with open(clf_path, "rb") as f:
        variables = serialization.from_bytes(jax.device_get(template), f.read())
    params = variables.pop("params")

    imgs = sampler.generate_images(args.num_samples)
    imgs_u8 = np.clip((imgs + 1) * 127.5, 0, 255).astype(np.uint8)
    logits = predict_classifier(model, params, variables, imgs_u8,
                                batch_size=args.batch_size)
    positive = int((logits.argmax(-1) == 1).sum())
    frac = positive / args.num_samples
    print(f"attr {args.attr}: {positive}/{args.num_samples} = {frac:.4f}")
    out = save_path / f"count_attr_{args.attr}{'_drs' if args.drs else ''}.json"
    out.write_text(json.dumps({"attr": args.attr, "count": positive,
                               "total": args.num_samples, "fraction": frac}))


if __name__ == "__main__":
    main()
