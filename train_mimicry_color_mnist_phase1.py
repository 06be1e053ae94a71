"""Phase-1 training for color_mnist (CLI parity with the reference script)."""
from diagan_tpu.cli.mnist_scripts import phase1

if __name__ == "__main__":
    phase1("color_mnist", "./dataset/colour_mnist", "colour_mnist")
