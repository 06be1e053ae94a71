"""Train a CelebA single-attribute classifier (reference
train_convnet_celeba.py): binary attr-vs-not classifier at 64px, CSV of
losses/accuracies, weights saved as {attr}.pth. torchvision's pretrained
vgg16 is unavailable in this environment; AttrClassifier (VGG-style, same
surface) is trained from scratch."""
import argparse
import csv
from pathlib import Path

import numpy as np

from diagan_tpu.cli.common import enable_compile_cache
from diagan_tpu.data.sources import CELEBA_ATTR_NAMES, load_celeba
from diagan_tpu.models.convnets import AttrClassifier
from diagan_tpu.train.classifier import predict_classifier, train_classifier
from diagan_tpu.utils import set_seed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", "-r", default="./dataset/celeba", type=str)
    parser.add_argument("--work_dir", default="./exp_results", type=str)
    parser.add_argument("--model", default="vgg16", type=str)
    parser.add_argument("--gpu", default="0", type=str)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--seed", default=1, type=int)
    parser.add_argument("--num_epochs", default=10, type=int)
    parser.add_argument("--attr", default="Bald", type=str)
    args = parser.parse_args()

    enable_compile_cache()
    set_seed(args.seed)
    images, attrs = load_celeba(args.root, size=64)
    col = CELEBA_ATTR_NAMES.index(args.attr)
    labels = (attrs[:, col] == 1).astype(np.int64)

    # CelebA official split boundaries (train/valid/test); scaled
    # proportionally when running on the reduced-N synthetic fallback
    if len(images) >= 202599:
        tr, va = 162770, 182637
    else:
        tr = int(len(images) * 162770 / 202599)
        va = int(len(images) * 182637 / 202599)
    model = AttrClassifier(num_attrs=2)
    params, state, history = train_classifier(
        model, images[:tr], labels[:tr], epochs=args.num_epochs,
        batch_size=args.batch_size, seed=args.seed,
    )

    def acc(split_imgs, split_labels):
        logits = predict_classifier(model, params, state, split_imgs)
        return float((logits.argmax(-1) == split_labels).mean())

    val_acc = acc(images[tr:va], labels[tr:va])
    test_acc = acc(images[va:], labels[va:])
    print(f"val_acc: {val_acc}, test_acc: {test_acc}")

    save_path = Path(args.work_dir) / "attr_classifier"
    save_path.mkdir(parents=True, exist_ok=True)
    from flax import serialization

    import jax

    with open(save_path / f"{args.attr}.pth", "wb") as f:
        f.write(serialization.to_bytes(
            {"params": jax.device_get(params), **jax.device_get(state)}
        ))
    with open(save_path / f"{args.attr}_results.csv", "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["attr", "train_acc", "val_acc", "test_acc"])
        wr.writerow([args.attr, history[-1]["acc"], val_acc, test_acc])


if __name__ == "__main__":
    main()
