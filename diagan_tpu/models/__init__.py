from diagan_tpu.models.registry import GANBundle, get_gan_model

__all__ = ["GANBundle", "get_gan_model"]
