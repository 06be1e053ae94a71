"""CAE reconstruction-error eval for an Inclusive-GAN checkpoint.

CLI parity with reference train_cae_inclusive.py: identical to train_cae.py
but the generator checkpoint comes from an Inclusive-GAN run (same DCGAN
architecture — the inclusive losses only affect training), and generation
is never DRS-wrapped unless a netD_drs checkpoint exists.
"""
from train_cae import main

if __name__ == "__main__":
    main()
