from diagan_tpu.eval.drs import DRS

__all__ = ["DRS"]
