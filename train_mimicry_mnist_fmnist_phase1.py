"""Phase-1 training for mnist_fmnist (CLI parity with the reference script)."""
from diagan_tpu.cli.mnist_scripts import phase1

if __name__ == "__main__":
    phase1("mnist_fmnist", "./dataset/mnist_fmnist", "mnist_fmnist")
