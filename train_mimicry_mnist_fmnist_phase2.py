"""Phase-2 Dia-GAN training for mnist_fmnist (CLI parity with the reference script)."""
from diagan_tpu.cli.mnist_scripts import phase2

if __name__ == "__main__":
    phase2("mnist_fmnist", "./dataset/mnist_fmnist", "mnist_fmnist")
