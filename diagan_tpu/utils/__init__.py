from diagan_tpu.utils.settings import set_seed

__all__ = ["set_seed"]
