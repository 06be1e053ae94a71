"""Phase-2 GOLD baseline for color_mnist (CLI parity with the reference script)."""
from diagan_tpu.cli.mnist_scripts import phase2_gold

if __name__ == "__main__":
    phase2_gold("color_mnist", "./dataset/colour_mnist", "colour_mnist")
