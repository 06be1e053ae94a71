"""diagan-tpu: a TPU-native (JAX/Flax/Pallas) rebuild of Self-Diagnosing GAN.

Reference capabilities: grayhong/self-diagnosing-gan (NeurIPS 2021).
This package is a from-scratch redesign for TPU: SPMD over jax.sharding
meshes, fused jitted train steps, on-device logit recording, Pallas kernels
for the StyleGAN2 resampling ops.

Layers (bottom-up):
  ops/      - Pallas kernels + pure-JAX reference implementations
  parallel/ - device mesh, sharding helpers (replaces reference distributed.py)
  data/     - index-aware, on-device input pipeline with weighted resampling
  models/   - Flax model zoo: SNGAN/SSGAN/InfoMaxGAN/DCGAN/Toy/StyleGAN2/CAE
  train/    - fused train loop, logit recorder, schedulers, checkpointing
  score/    - LDR discrepancy scoring (calculate_scores parity)
  eval/     - DRS, FID/IS/KID/PR metrics, CAE reconstruction-error protocol
  cli/      - argparse entry points mirroring the reference script surface
"""

__version__ = "0.1.0"
