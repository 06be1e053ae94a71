"""Model factory — dataset name -> (G, D[, D_drs]) modules + optimizer spec.

Parity target: `get_gan_model` at reference
diagan-pkg/diagan/models/predefined_models.py:175-183 and the per-dataset
getters (:17-162): cifar10 -> {sngan,ssgan,infomax_gan}-32 with Adam(2e-4,
betas=(0.0, 0.9)); celeba -> the 64px variants; color_mnist/mnist_fmnist ->
MNIST DCGAN with Adam(1e-4, (0.5, 0.9)); 25gaussian -> Toy MLPs with
Adam(1e-4, (0.5, 0.999)); ffhq -> StyleGAN2-256 with Adam(2e-4, (0.0, 0.9)).
With drs=True a third discriminator (netD_drs) is built — always with
ns loss regardless of --loss_type, replicating predefined_models.py:180.

GOLD and top-k are loss-level switches here (flags on the bundle consumed
by the trainer) rather than the reference's mixin class matrix.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn

from diagan_tpu.models import infomax, mnist_dcgan, sngan, ssgan, toy


@dataclasses.dataclass
class OptSpec:
    lr: float
    betas: tuple


@dataclasses.dataclass
class GANBundle:
    gen: nn.Module
    disc: nn.Module
    disc_drs: nn.Module | None
    opt_g: OptSpec
    opt_d: OptSpec
    opt_d_drs: OptSpec | None
    nz: int
    loss_type: str
    drs_loss_type: str
    gold: bool
    topk: bool
    model: str
    dataset: str
    image_size: int
    nc: int


_GEN_32 = {
    "sngan": sngan.SNGANGenerator32,
    "ssgan": ssgan.SSGANGenerator32,
    "infomax_gan": infomax.InfoMaxGANGenerator32,
}
_DISC_32 = {
    "sngan": sngan.SNGANDiscriminator32,
    "ssgan": ssgan.SSGANDiscriminator32,
    "infomax_gan": infomax.InfoMaxGANDiscriminator32,
}
_GEN_64 = {
    "sngan": sngan.SNGANGenerator64,
    "ssgan": ssgan.SSGANGenerator64,
    "infomax_gan": infomax.InfoMaxGANGenerator64,
}
_DISC_64 = {
    "sngan": sngan.SNGANDiscriminator64,
    "ssgan": ssgan.SSGANDiscriminator64,
    "infomax_gan": infomax.InfoMaxGANDiscriminator64,
}


def get_gan_model(
    dataset_name,
    model="sngan",
    loss_type="hinge",
    gold=False,
    drs=False,
    topk=False,
    num_pack=1,
    **kwargs,
) -> GANBundle:
    if dataset_name in ("cifar10", "celeba"):
        import jax.numpy as jnp

        # bf16=True runs the conv/dense stack in bfloat16 (fp32 params,
        # BatchNorm stats, spectral norm, and logit head) — TPU-native
        # addition mirroring the StyleGAN2 --bf16 path; see models/layers.py
        sn_dtype = jnp.bfloat16 if kwargs.get("bf16") else jnp.float32
    if dataset_name == "cifar10":
        gen = _GEN_32[model](dtype=sn_dtype)
        disc_cls = lambda: _DISC_32[model](dtype=sn_dtype)  # noqa: E731
        opt = OptSpec(2e-4, (0.0, 0.9))
        nz, size, nc = 128, 32, 3
    elif dataset_name == "celeba":
        gen = _GEN_64[model](dtype=sn_dtype)
        disc_cls = lambda: _DISC_64[model](dtype=sn_dtype)  # noqa: E731
        opt = OptSpec(2e-4, (0.0, 0.9))
        nz, size, nc = 128, 64, 3
    elif dataset_name in ("color_mnist", "mnist_fmnist"):
        import jax.numpy as jnp

        dc_dtype = jnp.bfloat16 if kwargs.get("bf16") else jnp.float32
        nc = 3 if dataset_name == "color_mnist" else 1
        gen = mnist_dcgan.MNISTDCGANGenerator(nc=nc, dtype=dc_dtype)
        disc_cls = lambda: mnist_dcgan.MNISTDCGANDiscriminator(  # noqa: E731
            nc=nc, num_pack=num_pack, use_sn=kwargs.get("use_sn", False),
            dtype=dc_dtype,
        )
        opt = OptSpec(1e-4, (0.5, 0.9))
        nz, size = 100, 32
        model = "dcgan"
    elif dataset_name == "25gaussian":
        gen = toy.ToyGenerator()
        disc_cls = lambda: toy.ToyDiscriminator(  # noqa: E731
            use_sn=kwargs.get("use_sn", False)
        )
        opt = OptSpec(1e-4, (0.5, 0.999))
        nz, size, nc = 2, 0, 2
        model = "toy"
    elif dataset_name == "ffhq":
        import jax.numpy as jnp

        from diagan_tpu.models import stylegan2

        # bf16=True runs synthesis/D-backbone in bfloat16 (fp32 params) —
        # TPU-native addition, see models/stylegan2.py
        dtype = jnp.bfloat16 if kwargs.get("bf16") else jnp.float32
        gen = stylegan2.StyleGAN2Generator(size=kwargs.get("size", 256),
                                           dtype=dtype)
        disc_cls = lambda: stylegan2.StyleGAN2Discriminator(  # noqa: E731
            size=kwargs.get("size", 256), dtype=dtype
        )
        opt = OptSpec(2e-4, (0.0, 0.9))
        nz, size, nc = 512, kwargs.get("size", 256), 3
        model = "stylegan"
    else:
        raise ValueError(f"unknown dataset: {dataset_name}")

    disc = disc_cls()
    disc_drs = disc_cls() if drs else None
    return GANBundle(
        gen=gen,
        disc=disc,
        disc_drs=disc_drs,
        opt_g=opt,
        opt_d=opt,
        opt_d_drs=opt if drs else None,
        nz=nz,
        loss_type=loss_type,
        # netD_drs always trains with ns loss (predefined_models.py:180)
        drs_loss_type="ns",
        gold=gold,
        topk=topk,
        model=model,
        dataset=dataset_name,
        image_size=size,
        nc=nc,
    )
