from diagan_tpu.native.io import (
    NativeLoader,
    NativeWeightedSampler,
    native_available,
    normalize_u8,
)

__all__ = [
    "NativeLoader",
    "NativeWeightedSampler",
    "native_available",
    "normalize_u8",
]
