"""Phase-2 Dia-GAN training for color_mnist (CLI parity with the reference script)."""
from diagan_tpu.cli.mnist_scripts import phase2

if __name__ == "__main__":
    phase2("color_mnist", "./dataset/colour_mnist", "colour_mnist")
