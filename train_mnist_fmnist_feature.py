"""MNIST-FMNIST bias-probe classifier (reference
train_mnist_fmnist_feature.py): SimpleConvNet trained on the mixed labels
of a balanced (major_ratio=0.5) MNIST-FMNIST build."""
import argparse

from diagan_tpu.cli.common import enable_compile_cache
from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.models.convnets import SimpleConvNet
from diagan_tpu.train.classifier import train_classifier
from diagan_tpu.utils import set_seed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gpu", type=int, default=0)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--bs", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=80)
    parser.add_argument("--num_data", type=int, default=10000)
    opt = parser.parse_args()

    enable_compile_cache()
    set_seed(opt.seed)
    ds = get_predefined_dataset(
        dataset_name="mnist_fmnist", root="./dataset/mnist_fmnist",
        major_ratio=0.5, num_data=opt.num_data,
    )
    model = SimpleConvNet(num_labels=20)
    train_classifier(
        model, ds.images, ds.labels, epochs=opt.epochs, batch_size=128,
        seed=opt.seed,
        ckpt_path=f"./exp_results/mnist-fmnist-convnet-{opt.num_data}-seed{opt.seed}",
    )


if __name__ == "__main__":
    main()
