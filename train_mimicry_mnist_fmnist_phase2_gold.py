"""Phase-2 GOLD baseline for mnist_fmnist (CLI parity with the reference script)."""
from diagan_tpu.cli.mnist_scripts import phase2_gold

if __name__ == "__main__":
    phase2_gold("mnist_fmnist", "./dataset/mnist_fmnist", "mnist_fmnist")
